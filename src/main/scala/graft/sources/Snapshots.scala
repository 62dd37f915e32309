package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.Path

/**
 * Versioned snapshot tables — the lakehouse primitive (Iceberg/Delta's
 * core idea, reduced to its sound minimum) that makes training runs
 * REPRODUCIBLE: a run pins a table version, and later appends,
 * overwrites, or compactions can never change what that version reads.
 *
 * Layout under a table root:
 * {{{
 *   data/c_<uuid>/part-*.parquet   — immutable commit directories
 *   manifests/v<N>.txt             — the commit dirs version N reads
 *   VERSION                        — pointer file holding N
 * }}}
 *
 * Commit protocol (object-store friendly — no in-place mutation ever):
 * write the new commit directory, write manifest v(N+1) to a temp name
 * and rename it in, then write the pointer to a temp name and rename it
 * over VERSION. Renames are atomic on local/HDFS filesystems, so a
 * reader sees either the old pointer or the new one, and every manifest
 * a pointer can name references only fully-written immutable data — a
 * crash at ANY step leaves the table readable at its previous version.
 * Single-writer contract (a catalog/lock arbitrates concurrent commits
 * in production; the protocol itself is what this module provides).
 *
 * Time travel is free: `read(spark, root, version = 3)` reads manifest
 * v3 forever, regardless of later commits. `expire` deletes data dirs
 * unreferenced by the kept manifests (vacuum) — the one operation that
 * destroys history, and it says so.
 */
object Snapshots {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Current version; 0 if the table doesn't exist yet. The pointer is
    * the fast path, but the SOURCE OF TRUTH is the manifest set: on
    * filesystems whose rename won't clobber (HDFS), replacing VERSION
    * is delete-then-rename, and a crash in that window leaves the
    * pointer missing while every manifest is intact — so a missing (or
    * behind, since manifests are written before the pointer) pointer
    * falls back to max-manifest discovery instead of reporting an
    * empty table and letting the next commit clobber manifest v1. */
  def currentVersion(spark: SparkSession, root: String): Long = {
    val ptr = new Path(root, "VERSION")
    val f = fs(spark, ptr)
    val pointed =
      if (!f.exists(ptr)) 0L
      else {
        val in = f.open(ptr)
        // a garbled/empty pointer falls back to manifest discovery like
        // a missing one (toLong would throw and make the table unreadable)
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLongOption.getOrElse(0L)
        finally in.close()
      }
    math.max(pointed, versions(spark, root).lastOption.getOrElse(0L))
  }

  private def readManifest(spark: SparkSession, root: String, v: Long): Seq[String] = {
    val mf = new Path(root, s"manifests/v$v.txt")
    val f = fs(spark, mf)
    require(f.exists(mf), s"no manifest for version $v under $root")
    val in = f.open(mf)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    finally in.close()
  }

  private def writeAtomic(spark: SparkSession, target: Path, content: String): Unit = {
    val f = fs(spark, target)
    val tmp = new Path(target.getParent,
      s".${target.getName}.tmp_${java.util.UUID.randomUUID().toString.take(8)}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, target)) {
      // HDFS rename won't clobber: remove the old target first. The
      // pointer is the ONLY file rewritten in place, and a crash between
      // delete and rename is recovered by max-manifest discovery below.
      f.delete(target, false)
      require(f.rename(tmp, target), s"atomic rename to $target failed")
    }
  }

  private def commit(df: DataFrame, root: String, replace: Boolean): Long =
    commitAt(df, root, replace, currentVersion(df.sparkSession, root))

  /** The commit body with the observed head version injected — the
    * production path resolves it immediately before; the two-writer
    * conflict spec resolves it, lets a second writer land, and replays
    * this writer's commit to prove it loses with the retryable error
    * and no lost rows (the branch-CAS discipline applied to MAIN). */
  private[graft] def commitAt(
      df: DataFrame, root: String, replace: Boolean, observedCur: Long): Long = {
    val spark = df.sparkSession
    val prior =
      if (observedCur == 0 || replace) Seq.empty
      else readManifest(spark, root, observedCur)
    val commitDir = s"data/c_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df.write.mode("error").parquet(s"${root.stripSuffix("/")}/$commitDir")
    val next = observedCur + 1
    claimVersion(spark, root, next)
    writeAtomic(spark, new Path(root, s"manifests/v$next.txt"),
      (prior :+ commitDir).mkString("\n") + "\n")
    writeAtomic(spark, new Path(root, "VERSION"), s"$next\n")
    next
  }

  /** The create-exclusive MAIN version claim — the single point where
    * two concurrent main writers (appends, overwrites, deletes, branch
    * publishes) are decided. Without it, both writers compute the same
    * `next` and the second manifest write silently REPLACES the first:
    * a LOST commit whose data dir leaks unreferenced — the worst
    * failure class, because nothing ever reports it. With the claim,
    * exactly one writer wins the slot; the loser throws the retryable
    * conflict error and must re-read the head (its just-written data
    * dir leaks unreferenced — never corrupt state, the losing-branch-
    * writer contract). The claim is decided BEFORE the manifest write,
    * so the winner's manifest can never be replaced; a crash in the
    * milliseconds between claim and manifest leaves a dangling claim
    * that BLOCKS the slot — detectable via [[abandonedClaims]] and
    * repairable via [[releaseClaim]] (commits halted until repair beats
    * commits silently vanishing). */
  private def claimVersion(spark: SparkSession, root: String, v: Long): Unit = {
    val p = new Path(root, s"manifests/v$v.claim")
    val f = fs(spark, p)
    val out =
      try f.create(p, false)
      catch {
        case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                  _: java.nio.file.FileAlreadyExistsException) =>
          throw new java.util.ConcurrentModificationException(
            s"version $v of $root was committed concurrently — re-read the " +
              s"head and retry (if no manifest v$v ever appears, a writer " +
              s"crashed mid-commit: releaseClaim($v) frees the slot): " +
              e.getMessage)
      }
    out.close()
  }

  /** Claimed versions whose manifest never materialized — writers that
    * crashed between claim and manifest. They block their slot (the
    * next commit at that version keeps failing); inspect and
    * [[releaseClaim]] to repair. A LIVE writer is in this state for
    * milliseconds, so only treat a claim as abandoned when it persists
    * across retries. */
  def abandonedClaims(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(root, "manifests")
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".claim") =>
        s.stripPrefix("v").stripSuffix(".claim").toLongOption }
      .flatten.filter(v => !f.exists(new Path(root, s"manifests/v$v.txt")))
      .toSeq.sorted
  }

  /** Free a version slot left blocked by a crashed writer (see
    * [[abandonedClaims]]). Refuses to release a claim whose manifest
    * exists — that is a COMPLETED commit, not a dangler. */
  def releaseClaim(spark: SparkSession, root: String, v: Long): Unit = {
    val f = fs(spark, new Path(root))
    require(!f.exists(new Path(root, s"manifests/v$v.txt")),
      s"version $v of $root committed successfully — its claim is not abandoned")
    f.delete(new Path(root, s"manifests/v$v.claim"), false)
  }

  /** Append a commit: version N+1 reads everything version N read plus
    * the new data. Returns the new version. */
  def append(df: DataFrame, root: String): Long = commit(df, root, replace = false)

  /** Replace the table contents: version N+1 reads ONLY the new data.
    * Prior versions still read their own manifests — nothing is
    * deleted (that's [[expire]]'s job). Returns the new version. */
  def overwrite(df: DataFrame, root: String): Long = commit(df, root, replace = true)

  /** Read the table at a version (default: current). The manifest is
    * resolved once at plan time; the returned frame keeps reading that
    * version's immutable files no matter what commits follow.
    *
    * SCHEMA EVOLUTION: commits may carry different schemas — a column
    * added mid-corpus is the normal life of a training table — and the
    * read unions them BY NAME (`mergeSchema`), older commits returning
    * NULL for columns they predate; incompatible type changes fail
    * loudly at plan time rather than coercing. Time travel keeps each
    * version's own shape: a pre-evolution version never shows the new
    * column. The footer-merge cost is bounded by the manifest's file
    * count, which [[compact]] keeps small. */
  def read(spark: SparkSession, root: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 1) version else currentVersion(spark, root)
    require(v >= 1, s"snapshot table at $root has no committed version")
    resolveEntries(spark, root, readManifest(spark, root, v))
  }

  // --------------------------------------------------- row-level deletes

  private def isDelete(entry: String): Boolean = entry.startsWith("delete:")
  private def entryDir(entry: String): String = entry.stripPrefix("delete:")

  /** Turn an ordered manifest entry list into a frame. Plain entries are
    * data commit dirs; `delete:<dir>` entries are EQUALITY-DELETE files
    * (parquet of distinct key tuples, schema = the key columns) that
    * apply to every data dir BEFORE them in the list and none after —
    * so re-appending a previously deleted key resurrects it, exactly
    * the Iceberg sequence-number rule. A manifest with no delete
    * entries takes the original single merged-footer read (identical
    * plan to pre-delete tables); with deletes, consecutive data dirs
    * are read as one group and each delete applies as a broadcast
    * left_anti join on the delete file's own columns — delete files
    * are key sets (small), the corpus never reshuffles. */
  private def resolveEntries(
      spark: SparkSession, root: String, entries: Seq[String]): DataFrame = {
    val base = root.stripSuffix("/")
    def readDirs(dirs: Seq[String]): DataFrame =
      spark.read.option("mergeSchema", "true")
        .parquet(dirs.map(d => s"$base/$d"): _*)
    if (!entries.exists(isDelete)) return readDirs(entries)
    var cur: DataFrame = null
    var pend = List.empty[String]
    def flush(): Unit = if (pend.nonEmpty) {
      val g = readDirs(pend.reverse)
      cur = if (cur == null) g
        else cur.unionByName(g, allowMissingColumns = true)
      pend = Nil
    }
    entries.foreach { e =>
      if (!isDelete(e)) pend ::= e
      else {
        flush()
        // a delete with no preceding data applies to nothing
        if (cur != null) {
          val del = spark.read.parquet(s"$base/${entryDir(e)}")
          cur = cur.join(org.apache.spark.sql.functions.broadcast(del),
            del.columns.toSeq, "left_anti")
        }
      }
    }
    flush()
    require(cur != null, s"manifest under $root resolves to no data entries")
    cur
  }

  /** Row-level DELETE as a merge-on-read equality delete: the distinct
    * `keyCols` tuples of current rows matching `predicate` are written
    * as a delete file, and the next version's manifest carries a
    * `delete:` entry after every existing data dir — readers of that
    * version (and later, until those dirs are compacted away) anti-join
    * it; earlier versions still read their own manifests and keep the
    * rows (time travel across a DELETE works). Rows appended AFTER the
    * delete are untouched even if they share keys — deletes apply only
    * backwards, so delete-then-reingest behaves like a real table.
    *
    * Merge-on-read is the 100 TB shape: a DELETE touching 0.1% of keys
    * writes kilobytes instead of rewriting the corpus; the read-side
    * cost is one broadcast anti-join until [[compact]] materializes the
    * survivors and drops the delete entries. A predicate matching
    * nothing is a no-op (no new version — an empty delete file would
    * add read-side work for zero effect). Returns the new version (or
    * the current one for the no-op). */
  def deleteWhere(
      spark: SparkSession,
      root: String,
      keyCols: Seq[String],
      predicate: org.apache.spark.sql.Column): Long = {
    require(keyCols.nonEmpty, "deleteWhere needs at least one key column")
    val cur = currentVersion(spark, root)
    require(cur >= 1, s"snapshot table at $root has no committed version")
    val keys = read(spark, root, cur).where(predicate)
      .select(keyCols.map(org.apache.spark.sql.functions.col): _*).distinct()
    if (keys.limit(1).count() == 0L) return cur
    val delDir = s"data/d_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    keys.write.mode("error").parquet(s"${root.stripSuffix("/")}/$delDir")
    val next = cur + 1
    writeAtomic(spark, new Path(root, s"manifests/v$next.txt"),
      (readManifest(spark, root, cur) :+ s"delete:$delDir").mkString("\n") + "\n")
    writeAtomic(spark, new Path(root, "VERSION"), s"$next\n")
    next
  }

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val dir = new Path(root, "manifests")
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).iterator.map(_.getPath.getName)
      .collect { case s if s.startsWith("v") && s.endsWith(".txt") =>
        s.stripPrefix("v").stripSuffix(".txt").toLongOption }
      .flatten.toSeq.sorted
  }

  /** One history row — the Iceberg-style `history`/`snapshots`
    * metadata-table surface for a versioned table. */
  case class HistoryRow(
      version: Long, n_entries: Long, n_data_dirs: Long, n_deletes: Long,
      n_added_entries: Long, n_rows: Long)

  /** Table history as a DataFrame: one row per committed version with
    * its manifest shape (total entries, data dirs vs `delete:` entries,
    * entries ADDED relative to the previous version) and — when
    * `withRowCounts` — the exact row count that version reads as
    * (merge-on-read deletes applied). The metadata columns come from
    * the manifests alone (driver-local, ≤ versions × entries strings);
    * row counts run one bounded count job per version, so leave
    * `withRowCounts` off for dashboards over long histories. Expired
    * versions are absent (their manifests are gone) — history reports
    * what is still readable, by design. */
  def history(
      spark: SparkSession, root: String, withRowCounts: Boolean = true): DataFrame = {
    import spark.implicits._
    val vs = versions(spark, root)
    val rows = vs.foldLeft((Set.empty[String], List.empty[HistoryRow])) {
      case ((prev, acc), v) =>
        val entries = readManifest(spark, root, v)
        val deletes = entries.count(isDelete)
        val added = entries.count(e => !prev.contains(e))
        val nRows = if (withRowCounts) read(spark, root, v).count() else -1L
        (entries.toSet,
          HistoryRow(v, entries.size.toLong, (entries.size - deletes).toLong,
            deletes.toLong, added.toLong, nRows) :: acc)
    }._2.reverse
    rows.toDF()
  }

  /** Compact: rewrite the CURRENT contents as one fresh commit and
    * point a new version at it — the small-file maintenance op for
    * append-heavy tables (every append adds a commit dir; scans
    * eventually pay per-file footer reads and non-contiguous IO).
    * History semantics are unchanged: prior versions still read their
    * own manifests, readers of the new version see identical rows, and
    * the superseded commit dirs stay until [[expire]] reclaims them.
    * Returns the new version. */
  def compact(spark: SparkSession, root: String): Long = {
    val cur = currentVersion(spark, root)
    require(cur >= 1, s"snapshot table at $root has no committed version")
    overwrite(read(spark, root, cur), root)
  }

  /** Vacuum: drop manifests older than the newest `keepLast` and delete
    * data directories no kept manifest references — EXCEPT versions a
    * [[tag]] points at, which survive any horizon (pinning a milestone
    * corpus against routine vacuuming is the whole point of a tag), and
    * data dirs any BRANCH manifest references ([[branchReferencedDirs]];
    * vacuuming branch history is [[dropBranch]]'s job). Destroys
    * time-travel history past the horizon — the only destructive
    * operation here. */
  def expire(spark: SparkSession, root: String, keepLast: Int): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast")
    val vs = versions(spark, root)
    if (vs.size <= keepLast) return
    val tagged = tags(spark, root).values.toSet
    val keepSet = vs.takeRight(keepLast).toSet ++ tagged
    val (drop, keep) = vs.partition(v => !keepSet.contains(v))
    // delete: entries pin (and reclaim) their files like data dirs
    val referenced = keep.flatMap(v => readManifest(spark, root, v))
      .map(entryDir).toSet ++ branchReferencedDirs(spark, root)
    val f = fs(spark, new Path(root))
    drop.foreach { v =>
      val dead = readManifest(spark, root, v).map(entryDir).filterNot(referenced)
      dead.foreach(d => f.delete(new Path(root, d), true))
      f.delete(new Path(root, s"manifests/v$v.txt"), false)
      f.delete(new Path(root, s"manifests/v$v.claim"), false)
    }
  }

  // ------------------------------------------------------------- refs

  private def refName(name: String): String = {
    // ASCII-only (isLetterOrDigit would admit Unicode), and at least one
    // non-dot char — "." / ".." are path navigation, not names, and
    // refs/.. would escape the refs directory entirely.
    def ok(c: Char) = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
      (c >= '0' && c <= '9') || c == '.' || c == '_' || c == '-'
    require(name != null && name.nonEmpty && name.length <= 128 &&
      name.forall(ok) && name.exists(_ != '.'),
      s"tag names are [A-Za-z0-9._-]{1,128} with at least one non-dot char, got '$name'")
    name
  }

  /** Pin a NAME to a committed version (a tag — the named-ref feature
    * over the immutable version history; re-tagging the same name moves
    * it, so a name like `stable` doubles as a branch pointer). Tagged
    * versions survive [[expire]] at any horizon. The write is the same
    * atomic tmp-then-rename as every pointer here. */
  def tag(spark: SparkSession, root: String, name: String, version: Long): Unit = {
    require(versions(spark, root).contains(version),
      s"cannot tag version $version — not a committed version of $root")
    writeAtomic(spark, new Path(root, s"refs/${refName(name)}"), version.toString)
  }

  /** Remove a tag (the versions it pinned become expirable again). */
  def dropTag(spark: SparkSession, root: String, name: String): Unit = {
    val p = new Path(root, s"refs/${refName(name)}")
    fs(spark, p).delete(p, false)
  }

  /** All tags as name → version; garbled ref files are skipped (the
    * [[currentVersion]] pointer discipline). */
  def tags(spark: SparkSession, root: String): Map[String, Long] = {
    val dir = new Path(root, "refs")
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Map.empty
    f.listStatus(dir).iterator.filter(_.isFile).flatMap { st =>
      val in = f.open(st.getPath)
      val v =
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLongOption
        finally in.close()
      v.map(st.getPath.getName -> _)
    }.toMap
  }

  /** Read the table at a tag. */
  def readTag(spark: SparkSession, root: String, name: String): DataFrame = {
    val v = tags(spark, root).getOrElse(refName(name),
      throw new IllegalArgumentException(s"no tag '$name' under $root"))
    read(spark, root, v)
  }

  // ------------------------------------------------------------ branches
  //
  // A branch is a WRITABLE named lineage over the same immutable data
  // dirs (Iceberg's branch concept, reduced the way the rest of this
  // module reduces the lakehouse): per-branch manifests live under
  // manifests/branches/<name>/m_<uuid>.txt (self-contained dir lists,
  // exactly the main-manifest format), and the branch head is a
  // sequence of zero-content-critical pointer files
  // branches/<name>/p%09d whose CONTENT names the manifest uuid.
  //
  // CONCURRENT-WRITER CONFLICT DETECTION rides the pointer flip: a
  // commit (1) resolves the head seq, (2) writes its data dir and its
  // uniquely-named manifest (tmp-then-rename — complete before anything
  // references it), then (3) claims pointer seq+1 with CREATE-EXCLUSIVE
  // (`FileSystem.create(overwrite = false)` — atomic on HDFS; the local
  // FS's weaker exists-then-create is the same primitive every
  // object-store-friendly commit protocol leans on). Two racing writers
  // compute the same seq+1 and collide on the SAME file name: exactly
  // one create succeeds; the loser gets a retryable
  // ConcurrentModificationException and its manifest/data stay
  // unreferenced orphans (never a corrupt manifest — the winner's
  // manifest was complete before its pointer existed, and no file is
  // ever rewritten). A writer crashing between create and content-write
  // leaves a garbled pointer: readers SKIP it (the garbled-VERSION
  // discipline), and the next writer claims past it (a burned seq, like
  // a burned transaction id), so the branch never wedges.

  private def branchPtrDir(root: String, name: String) =
    new Path(root, s"branches/${refName(name)}")
  private def branchManifestPath(root: String, name: String, uuid: String) =
    new Path(root, s"manifests/branches/${refName(name)}/m_$uuid.txt")

  /** (max claimed seq — valid or garbled, for slot selection; head =
    * highest seq whose pointer content names an existing manifest, with
    * that manifest's uuid). (0, None) for a missing branch.
    * private[graft]: the two-writer conflict spec resolves a state,
    * lets another writer commit, then replays the stale state through
    * [[commitToBranchAt]] — the exact interleaving the CAS exists for. */
  private[graft] def branchState(
      spark: SparkSession, root: String, name: String): (Long, Option[(Long, String)]) = {
    val dir = branchPtrDir(root, name)
    val f = fs(spark, dir)
    if (!f.exists(dir)) return (0L, None)
    val entries = f.listStatus(dir).iterator.filter(_.isFile)
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("p") => s.stripPrefix("p").toLongOption }
      .flatten.toSeq.sorted
    val head = entries.reverse.iterator.flatMap { seq =>
      val p = new Path(dir, f"p$seq%09d")
      val uuid =
        try {
          val in = f.open(p)
          try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8).trim).filter(_.nonEmpty)
          finally in.close()
        } catch { case _: java.io.IOException => None }
      uuid.filter(u => f.exists(branchManifestPath(root, name, u)))
        .map(u => (seq, u))
    }.nextOption()
    (entries.lastOption.getOrElse(0L), head)
  }

  /** Create a branch at a committed MAIN version (default: current).
    * The branch's first manifest is a copy of that version's manifest —
    * data dirs are shared, copy-on-write at the manifest level. Fails
    * if the branch already exists. */
  def createBranch(
      spark: SparkSession, root: String, name: String, fromVersion: Long = -1L): Unit = {
    val v = if (fromVersion >= 1) fromVersion else currentVersion(spark, root)
    require(versions(spark, root).contains(v),
      s"cannot branch from version $v — not a committed version of $root")
    require(branchState(spark, root, name)._1 == 0L,
      s"branch '$name' already exists under $root")
    val uuid = java.util.UUID.randomUUID().toString.replace("-", "")
    writeAtomic(spark, branchManifestPath(root, name, uuid),
      readManifest(spark, root, v).mkString("\n") + "\n")
    claimPointer(spark, root, name, 1L, uuid)
  }

  /** The create-exclusive pointer flip — the single point where two
    * concurrent writers are decided. Throws the retryable conflict
    * error when the slot is already taken. */
  private def claimPointer(
      spark: SparkSession, root: String, name: String, seq: Long, uuid: String): Unit = {
    val p = new Path(branchPtrDir(root, name), f"p$seq%09d")
    val f = fs(spark, p)
    val out =
      try f.create(p, false)
      catch {
        case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                  _: java.nio.file.FileAlreadyExistsException) =>
          throw new java.util.ConcurrentModificationException(
            s"branch '$name' advanced concurrently (pointer ${p.getName} " +
              s"already claimed) — re-read the head and retry: ${e.getMessage}")
      }
    try out.write(uuid.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def commitToBranch(
      df: DataFrame, root: String, name: String, replace: Boolean): Long =
    commitToBranchAt(df, root, name, replace,
      branchState(df.sparkSession, root, name))

  /** The commit body with the observed branch state injected — the
    * production path resolves it immediately before; the conflict spec
    * resolves it, lets a second writer land, and proves this writer's
    * pointer flip loses with the retryable error and no corruption. */
  private[graft] def commitToBranchAt(
      df: DataFrame, root: String, name: String, replace: Boolean,
      observed: (Long, Option[(Long, String)])): Long = {
    val spark = df.sparkSession
    val (maxSeq, headOpt) = observed
    val head = headOpt.getOrElse(throw new IllegalArgumentException(
      s"no branch '$name' under $root — createBranch first"))
    val prior =
      if (replace) Seq.empty
      else readBranchManifest(spark, root, name, head._2)
    val commitDir = s"data/c_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df.write.mode("error").parquet(s"${root.stripSuffix("/")}/$commitDir")
    val uuid = java.util.UUID.randomUUID().toString.replace("-", "")
    writeAtomic(spark, branchManifestPath(root, name, uuid),
      (prior :+ commitDir).mkString("\n") + "\n")
    val next = maxSeq + 1
    claimPointer(spark, root, name, next, uuid)
    next
  }

  private def readBranchManifest(
      spark: SparkSession, root: String, name: String, uuid: String): Seq[String] = {
    val mf = branchManifestPath(root, name, uuid)
    val f = fs(spark, mf)
    require(f.exists(mf), s"no branch manifest $uuid for '$name' under $root")
    val in = f.open(mf)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").iterator.map(_.trim).filter(_.nonEmpty).toSeq
    finally in.close()
  }

  /** Append to a branch (the main lineage is untouched). Returns the
    * new head seq; throws ConcurrentModificationException — retryable —
    * if another writer advanced the branch between head-read and the
    * pointer flip. */
  def appendToBranch(df: DataFrame, root: String, name: String): Long =
    commitToBranch(df, root, name, replace = false)

  /** Replace the BRANCH contents (main and other branches untouched). */
  def overwriteBranch(df: DataFrame, root: String, name: String): Long =
    commitToBranch(df, root, name, replace = true)

  /** Read a branch at its head, or at an earlier seq (per-branch time
    * travel; a seq whose commit never completed — garbled pointer — is
    * unreadable and fails loudly). */
  def readBranch(
      spark: SparkSession, root: String, name: String, seq: Long = -1L): DataFrame = {
    val dirs =
      if (seq < 0) {
        val (_, headOpt) = branchState(spark, root, name)
        val head = headOpt.getOrElse(throw new IllegalArgumentException(
          s"no branch '$name' under $root"))
        readBranchManifest(spark, root, name, head._2)
      } else {
        val p = new Path(branchPtrDir(root, name), f"p$seq%09d")
        val f = fs(spark, p)
        require(f.exists(p), s"branch '$name' has no seq $seq under $root")
        val in = f.open(p)
        val uuid =
          try new String(org.apache.commons.io.IOUtils.toByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8).trim
          finally in.close()
        require(uuid.nonEmpty, s"branch '$name' seq $seq never completed (garbled pointer)")
        readBranchManifest(spark, root, name, uuid)
      }
    // branch manifests copy main entries verbatim, so a branch created
    // after a DELETE carries its delete: entries — resolve them the
    // same way
    resolveEntries(spark, root, dirs)
  }

  /** All branches as name → head seq (branches whose every pointer is
    * garbled are omitted, like garbled tags). */
  def branches(spark: SparkSession, root: String): Map[String, Long] = {
    val dir = new Path(root, "branches")
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Map.empty
    f.listStatus(dir).iterator.filter(_.isDirectory).flatMap { st =>
      val name = st.getPath.getName
      branchState(spark, root, name)._2.map(h => name -> h._1)
    }.toMap
  }

  /** PUBLISH a branch to main: the next MAIN version reads exactly what
    * the branch head reads — a manifest-level operation (the branch's
    * manifest contents become main's next manifest; no data moves), the
    * Iceberg fast-forward/publish shape. Prior main versions still read
    * their own manifests; the branch itself is untouched (drop it after
    * publishing, or keep committing to it). Returns the new main
    * version. */
  def publishBranch(spark: SparkSession, root: String, name: String): Long = {
    val (_, headOpt) = branchState(spark, root, name)
    val head = headOpt.getOrElse(throw new IllegalArgumentException(
      s"no branch '$name' under $root"))
    val dirs = readBranchManifest(spark, root, name, head._2)
    val next = currentVersion(spark, root) + 1
    claimVersion(spark, root, next)
    writeAtomic(spark, new Path(root, s"manifests/v$next.txt"),
      dirs.mkString("\n") + "\n")
    writeAtomic(spark, new Path(root, "VERSION"), s"$next\n")
    next
  }

  /** Delete a branch: its pointers and manifests go away; the data dirs
    * it referenced become reclaimable by the next [[expire]] (exactly
    * the dropTag contract). */
  def dropBranch(spark: SparkSession, root: String, name: String): Unit = {
    val f = fs(spark, new Path(root))
    f.delete(branchPtrDir(root, name), true)
    f.delete(new Path(root, s"manifests/branches/${refName(name)}"), true)
  }

  /** Every data dir any branch manifest references — branch lineages
    * are pinned against [[expire]] wholesale (vacuuming branch history
    * is [[dropBranch]]'s job, the tag discipline). */
  private def branchReferencedDirs(spark: SparkSession, root: String): Set[String] = {
    val dir = new Path(root, "manifests/branches")
    val f = fs(spark, dir)
    if (!f.exists(dir)) return Set.empty
    f.listStatus(dir).iterator.filter(_.isDirectory).flatMap { bd =>
      f.listStatus(bd.getPath).iterator.filter(_.isFile).flatMap { mf =>
        val in = f.open(mf.getPath)
        try new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8)
          .split("\n").iterator.map(_.trim).filter(_.nonEmpty)
          .map(entryDir).toSeq
        finally in.close()
      }
    }.toSet
  }
}
