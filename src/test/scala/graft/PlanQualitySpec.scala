package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Plan-shape assertions — the properties that decide 100 TB behavior:
 * column pruning reaching the scan, broadcast joins for small dims,
 * whole-stage codegen covering the json hot path, and shuffle-free joins
 * between co-bucketed tables.
 */
class PlanQualitySpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  val sfDir = "/root/testdata/sf0.001"

  test("inverted index: pruned-read ratio tightens as bucket count grows") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    val terms = Seq("the", "with")
    for (buckets <- Seq(16, 64)) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft-prune-$buckets")
      try {
        operators.TextOps.buildInvertedIndex(docs, "doc_id", "text",
          dir.toString, termBuckets = buckets)
        val wantTbs = terms.map(operators.TextOps.termBucket(_, buckets)).distinct
        // sparkPlan, not executedPlan: AQE wraps the tree in an
        // AdaptiveSparkPlanExec whose collect() does not descend
        val scans = operators.TextOps
          .bm25TopKIndexed(s, dir.toString, terms, k = 10)
          .queryExecution.sparkPlan.collect {
            case f: org.apache.spark.sql.execution.FileSourceScanExec
                if f.relation.location.rootPaths.exists(_.toString.contains("postings")) => f
          }
        assert(scans.nonEmpty, "no postings scan in the plan")
        // directory pruning is REAL and the ratio is bounded by the term
        // count, not the corpus: ≤ |distinct term buckets| of `buckets`
        // partition dirs are touched — 2/16 at 16 buckets, 2/64 at 64 —
        // so growing the bucket count tightens the read fraction with no
        // change to the query
        scans.foreach { f =>
          val touched = f.selectedPartitions.partitionCount
          assert(touched <= wantTbs.size,
            s"buckets=$buckets: read $touched partition dirs, want <= ${wantTbs.size}")
        }
      } finally {
        val walk = java.nio.file.Files.walk(dir)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverseIterator
            .foreach(java.nio.file.Files.deleteIfExists(_))
        } finally walk.close()
      }
    }
  }

  test("json filter+project: scan reads only referenced columns") {
    val df = SparkEntry.queries("q_get_int")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // events has 6 columns; only event_id + props may be read
    assert(plan.contains("ReadSchema: struct<event_id:bigint,props:string>"), plan)
  }

  test("json expressions run inside WholeStageCodegen") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
      .where(JsonFunctions.json_contains(col("props"), lit("k")))
      .select(JsonFunctions.json_get_int(col("props"), lit("k")).as("k"))
    val plan = df.queryExecution.executedPlan.toString
    // the Filter and Project lines carry the codegen-stage star
    assert(plan.contains("*(1) Filter"), plan)
    assert(plan.contains("*(1) Project"), plan)
  }

  test("union trio (from_scalar / display / to_text) runs inside WholeStageCodegen") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
      .select(
        JsonFunctions.json_union_display(
          JsonFunctions.json_get(col("props"), lit("k"))).as("disp"),
        JsonFunctions.json_union_to_text(
          JsonFunctions.json_from_scalar(col("event_id"))).as("txt"))
    val plan = df.queryExecution.executedPlan.toString
    // formerly CodegenFallback: the Project must now carry the codegen star
    assert(plan.contains("*(1) Project"), plan)
    assert(df.where(col("disp").isNotNull && col("txt").isNotNull).count() > 0)
  }

  test("dimension join broadcasts (no shuffle of the fact side)") {
    val df = SparkEntry.queries("q_enrich_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("co-bucketed tables join with zero exchanges") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val li = s.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = s.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    graft.sources.Tables.writeBucketed(li, "li_b", "l_orderkey", 8, Some("l_orderkey"))
    graft.sources.Tables.writeBucketed(ord, "ord_b", "o_orderkey", 8, Some("o_orderkey"))
    try {
      // disable broadcast so the bucketed layout is what avoids the shuffle
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = s.table("li_b")
        .join(s.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(joined.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      s.sql("DROP TABLE IF EXISTS li_b")
      s.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("minhash LSH plan: equi-join on bucket keys, no cartesian") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    val pairs = graft.operators.Dedup.minhashCandidatePairs(docs, "doc_id", "text")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("duplicate spans: equi-join on the gram key, no cartesian, partial agg on grams") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    val spans = graft.operators.Dedup.duplicateSpans(docs, "doc_id", "text", width = 8)
    val plan = spans.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the doc-frequency pass must be a partial-agg groupBy (map-side
    // collapse of hot grams), not a window over partitionBy(gram) —
    // partial_min pins the map-side half specifically; the perDoc
    // groupBys put HashAggregates in the plan regardless, so that
    // string alone would be vacuous here
    assert(plan.contains("partial_min"), plan)
    assert(!plan.toLowerCase.contains("windowspecdefinition(gram"), plan)
  }

  test("containment: prefix-filter plan — equi-joins only, one persisted postings pass, sort-free per-doc prefix") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    val (out, ex) = graft.operators.Dedup.containmentPlan(
      docs, "doc_id", "text", 3, 0.9)
    try {
      val plan = out.queryExecution.executedPlan.toString
      // the round-11 shape this replaced: a rare-gram SELF-join emitting
      // Σ df² pair rows + full shingle arrays carried through two fetch
      // joins. The pinned shape: every join an equi-join, the gram
      // postings computed ONCE into the persisted table every branch
      // reuses (the shingle kernel never re-runs), and prefix selection
      // as a sort-free per-doc aggregate — no cross product anywhere
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("InMemoryTableScan"), plan)
      // the shingle kernel runs only INSIDE the persisted postings
      // relation: the live (non-cached) plan tree's only Generate is the
      // bounded prefix-slice explode — never a re-shingling of the
      // corpus (sparkPlan, not executedPlan: AQE's collect does not
      // descend)
      val gens = out.queryExecution.sparkPlan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }
      assert(gens.forall(!_.generator.toString.toLowerCase.contains("shingle")),
        s"shingling re-ran outside the persisted postings: $gens")
      // r17: prefix selection is collect_list + array_sort + slice in a
      // per-doc aggregate — same rows as the old (df, g) row_number
      // window ((df, g) is total per vid), with NO Window sort anywhere
      assert(!plan.contains("Window"), plan)
      assert(plan.contains("collect_list"), plan)
      // no full-array carry: no shingle ARRAY column survives past the
      // explode (array_intersect was the round-11 per-pair rescan)
      assert(!plan.contains("array_intersect"), plan)
    } finally ex.unpersist()
  }

  test("incremental containment: union postings persisted once; batch-prefix probe; no corpus x corpus") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val (out, ex) = graft.operators.Dedup.incrementalContainmentPlan(
      d.where(col("doc_id") % 4 === 1), d.where(col("doc_id") % 4 =!= 1),
      "doc_id", "text", 3, 0.9)
    try {
      val plan = out.queryExecution.sparkPlan
      val planStr = plan.toString
      // every join is an equi-join: the candidate probe, intersection
      // count, and size attaches all key on gram/id — a cross shape here
      // is the corpus x corpus quadrant this operator exists to avoid
      assert(!planStr.contains("CartesianProduct"), planStr)
      assert(!planStr.contains("BroadcastNestedLoopJoin"), planStr)
      assert(planStr.contains("InMemoryTableScan"), planStr)
      // the shingle kernel runs only inside the persisted union
      // postings: the live tree's only Generate is the bounded
      // prefix-slice explode — every branch (df count, sizes, prefixes,
      // probe, intersection) reads the cache
      val gens = plan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g
      }
      assert(gens.forall(!_.generator.toString.toLowerCase.contains("shingle")),
        s"shingling re-ran outside the postings: $gens")
      // the only corpus re-scan is the final audit-row attach (id
      // column alone — ReadSchema must not drag text back in)
      val scans = plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.forall(!_.schema.fieldNames.contains("text")),
        s"audit attach read more than the id: ${scans.map(_.schema.fieldNames.toSeq)}")
      // r17: prefix selection and the best-match argmax are both
      // sort-free aggregates (collect_list+array_sort+slice; min over
      // the exact (−ov, osrc, oid) key) — no Window, hence no per-key
      // partition sort, anywhere in the plan
      assert(!planStr.contains("Window"), planStr)
      assert(planStr.contains("collect_list"), planStr)
    } finally ex.unpersist()
  }

  test("textRank: pairs from lead() windows — single doc Exchange, no positional self-join, top-k merge") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val out = graft.operators.TextOps.textRank(
      d, "doc_id", "text", window = 2, iterations = 2, topK = 10)
    val planStr = out.queryExecution.executedPlan.toString
    // co-occurrence pairs come from lead() over ONE per-doc sort: a
    // positional self-join would put a Join above two Generates — the
    // live tree must have zero Joins below the first aggregation of the
    // edge list (all PageRank joins key on the node string)
    assert(!planStr.contains("CartesianProduct"), planStr)
    assert(!planStr.contains("BroadcastNestedLoopJoin"), planStr)
    assert(planStr.toLowerCase.contains("windowspecdefinition(__doc"), planStr)
    // final top-k is a TakeOrdered merge, never a global sort
    assert(planStr.contains("TakeOrderedAndProject"), planStr)
  }

  test("rakeKeywords: phrase ids from one per-doc window — no self-join, top-k merge") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val out = graft.operators.TextOps.rakeKeywords(d, "doc_id", "text", topK = 10)
    val planStr = out.queryExecution.executedPlan.toString
    // phrase boundaries come from a running stopword count over ONE
    // per-doc window (plus the sibling per-(doc,pid) length window) — a
    // positional self-join would show as a nested-loop/cartesian
    assert(!planStr.contains("CartesianProduct"), planStr)
    assert(!planStr.contains("BroadcastNestedLoopJoin"), planStr)
    assert(planStr.toLowerCase.contains("windowspecdefinition(__doc"), planStr)
    // the word-score join keys on the vocabulary (tok) — an equi-join,
    // and the final top-k is a TakeOrdered merge, never a global sort
    assert(planStr.contains("TakeOrderedAndProject"), planStr)
  }

  test("editDistancePairs: segment-keyed equi-joins only — no cartesian, verify is map-side") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
      .where(col("text").isNotNull)
      .select(col("doc_id"), substring(col("text"), 1, 200).as("title"))
    val (out, strs) = graft.operators.Dedup.editDistancePlan(
      d, "doc_id", "title", 8)
    try {
      val planStr = out.queryExecution.executedPlan.toString
      // the banded short-string pass and the PassJoin segment pass are
      // BOTH equi-joins (bucket key / (la,i,sub) key) — an all-pairs
      // design would surface as a cartesian or nested-loop join
      assert(!planStr.contains("CartesianProduct"), planStr)
      assert(!planStr.contains("BroadcastNestedLoopJoin"), planStr)
      // the strings frame is persisted once and re-read for the segment
      // pass, the probe pass, the banded pass, and both verify fetches
      assert(planStr.contains("InMemoryTableScan"), planStr)
      // the Levenshtein verify is threshold-bounded (early-exit form),
      // not the unbounded two-arg kernel
      assert(planStr.toLowerCase.contains("levenshtein"), planStr)
    } finally strs.unpersist()
  }

  test("editDistanceScreen: no corpus self-join — only (la,i,sub)/band equi-joins and the batch-id agg") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val titled = s.read.parquet(s"$sfDir/documents.parquet")
      .where(col("text").isNotNull)
      .select(col("doc_id"), substring(col("text"), 1, 120).as("t"))
    val corpus = titled.where(col("doc_id") % 10 =!= 0)
    val batch = titled.where(col("doc_id") % 20 === 1)
      .select((col("doc_id") - 1).as("doc_id"),
        concat(lit("Xy"), substring(col("t"), 3, 118)).as("t"))
    val (out, b, c) = graft.operators.Dedup.editDistanceScreenPlan(
      batch, corpus, "doc_id", "t", maxDist = 4)
    try {
      val plan = out.queryExecution.executedPlan.toString
      // candidates are (la,i,sub)/band equi-joins + id-keyed fetches —
      // an all-pairs screen would surface as a cartesian/nested loop
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      // both inputs persist once; the verify fetches re-read the caches
      assert(plan.contains("InMemoryTableScan"), plan)
      // the verify is the threshold-bounded builtin, map-side
      assert(plan.toLowerCase.contains("levenshtein"), plan)
      // one row per batch row, even for all-novel batches
      assert(out.count() == batch.count(),
        "screen must return exactly one row per batch row")
    } finally { b.unpersist(); c.unpersist() }
  }

  test("tokenEditDistanceScreenIndexed: partition-pruned index read, no cartesian, rows == one-shot screen") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // VARIED prefix lengths (18..24 by doc id) so the length-partitioned
    // index has several lap directories and pruning is observable
    val toked = s.read.parquet(s"$sfDir/documents.parquet")
      .where(col("text").isNotNull)
      .select(col("doc_id"), slice(split(col("text"), " "), lit(1),
        (pmod(col("doc_id"), lit(7)) + 18).cast("int")).as("toks"))
    val corpus = toked.where(col("doc_id") % 10 =!= 0)
    val batch = toked.where(col("doc_id") % 20 === 1)
      .select((col("doc_id") - 1).as("doc_id"),
        transform(col("toks"), (t, i) =>
          when(i === 0, "Xq").otherwise(t)).as("toks"))
    val dir = java.nio.file.Files.createTempDirectory("graft-edidxspec")
    try {
      graft.operators.Dedup.buildTokenScreenIndex(
        corpus, "doc_id", "toks", maxDist = 4, dir.toString)
      val out = graft.operators.Dedup.tokenEditDistanceScreenIndexed(
        batch, "doc_id", "toks", dir.toString)
      // IDENTICAL rows to the one-shot screen — the index changes where
      // the corpus side comes from, never what it says
      val oneShot = graft.operators.Dedup.tokenEditDistanceScreen(
        batch, corpus, "doc_id", "toks", maxDist = 4)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getBoolean(1),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
      assert(rows(out) == rows(oneShot))
      // plan pin: a lap IN-list over the index scan must surface as a
      // PartitionFilters entry (the pruned index read — without it every
      // batch pays the whole index) and skip the unnamed directories
      val pruned = s.read.parquet(s"${dir.toString}/segs")
        .where(col("lap").isin(18, 19))
        .select(col("cid"), col("la"), col("i"), col("sub"))
      val planStr = pruned.queryExecution.executedPlan.toString
      assert(planStr.contains("PartitionFilters") && planStr.contains("lap"),
        planStr)
      // the scan node's own partition listing (post-pruning) vs the
      // layout's directory count — inputFiles reports the base relation
      // PRE-pruning and is useless here
      def scanDirs(df: org.apache.spark.sql.DataFrame): Long = {
        val scans = df.queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec => f
        }
        assert(scans.nonEmpty, df.queryExecution.sparkPlan.toString)
        scans.map(f => f.relation.location
          .listFiles(f.partitionFilters, f.dataFilters).length.toLong).sum
      }
      val prunedCount = scanDirs(pruned)
      val allCount = scanDirs(
        s.read.parquet(s"${dir.toString}/segs").select(col("cid")))
      assert(prunedCount > 0 && prunedCount < allCount,
        s"partition pruning had no effect: $prunedCount vs $allCount dirs")
      // INCREMENTAL ingestion: an index built on half the corpus and
      // appended with the other half answers exactly like the full
      // build (and therefore like the one-shot screen)
      val dir2 = java.nio.file.Files.createTempDirectory("graft-edidxapp")
      try {
        graft.operators.Dedup.buildTokenScreenIndex(
          corpus.where(col("doc_id") % 2 === 0), "doc_id", "toks",
          maxDist = 4, dir2.toString)
        graft.operators.Dedup.appendToTokenScreenIndex(
          corpus.where(col("doc_id") % 2 =!= 0), "doc_id", "toks", dir2.toString)
        val appended = graft.operators.Dedup.tokenEditDistanceScreenIndexed(
          batch, "doc_id", "toks", dir2.toString)
        assert(rows(appended) == rows(oneShot))
      } finally {
        java.nio.file.Files.walk(dir2).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("tokenEditDistancePairs: array-keyed equi-joins only — no cartesian, verify is map-side") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
      .where(col("text").isNotNull)
      .select(col("doc_id"),
        slice(split(col("text"), " "), 1, 24).as("toks"))
    val (out, toks) = graft.operators.Dedup.tokenEditDistancePlan(
      d, "doc_id", "toks", 4)
    try {
      val planStr = out.queryExecution.executedPlan.toString
      // candidates come from equi-joins on the (la, i, token-subarray)
      // key — Spark hashes array<string> join keys natively, so neither
      // pass degrades to a cartesian or nested loop
      assert(!planStr.contains("CartesianProduct"), planStr)
      assert(!planStr.contains("BroadcastNestedLoopJoin"), planStr)
      // the token frame persists once, re-read by every pass
      assert(planStr.contains("InMemoryTableScan"), planStr)
      // verify is the banded token kernel, a map-side expression
      assert(planStr.contains("token_levenshtein"), planStr)
    } finally toks.unpersist()
  }

  test("nearDupScreen: both screens run off ONE shingle pass — no Generate or corpus scan in the live tree") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    val (out, ex) = graft.operators.Dedup.nearDupScreenPlan(
      docs, "doc_id", "text", 3, 16, 4, 0.5, 0.9)
    try {
      val plan = out.queryExecution.sparkPlan
      val planStr = plan.toString
      // the ONLY shingle pass is inside the persisted postings relation:
      // the live tree reads the cache everywhere — its only Generates
      // are the LSH band posexplodes over the tiny sig table and the
      // bounded containment prefix-slice explode (r17: the sort-free
      // prefix aggregate), never a shingle explode; and zero parquet
      // scans of the corpus
      val gens = plan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g.generator.toString
      }
      assert(gens.forall(g =>
          g.contains("band_buckets") || g.contains("array_sort")),
        s"a branch re-ran the shingle explode: $gens")
      assert(plan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.isEmpty, "a branch re-scanned the corpus instead of the postings cache")
      assert(planStr.contains("InMemoryTableScan"), planStr)
      assert(!planStr.contains("CartesianProduct"), planStr)
      assert(!planStr.contains("BroadcastNestedLoopJoin"), planStr)
    } finally ex.unpersist()
  }

  test("decontaminate: benchmark grams broadcast; corpus grams never shuffle") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Curation.decontaminate(
      d.where(col("doc_id") % 20 =!= 0), d.where(col("doc_id") % 20 === 0),
      "doc_id", "text", n = 4)
    val plan = df.queryExecution.executedPlan.toString
    // both joins are broadcast (gram match + id-universe attach); the only
    // Exchanges are the tiny bench-gram distinct and the hit-row groupBy
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("shard assignment is narrow; repetition stats are one-scan narrow") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val shards = graft.operators.Curation.assignShards(
      d.select(col("doc_id")), "doc_id", numShards = 8)
    val shardPlan = shards.queryExecution.executedPlan.toString
    assert(!shardPlan.contains("Exchange"), shardPlan) // no shuffle at all
    val rep = graft.operators.TextOps.repetitionStats(d, "doc_id", "text")
    val repPlan = rep.queryExecution.executedPlan.toString
    assert(!repPlan.contains("Exchange"), repPlan)
    // exactly one corpus scan feeds all repetition signals
    assert("Scan parquet".r.findAllIn(repPlan).size == 1, repPlan)
  }

  test("web ops: URL normalize and HTML extract are zero-Exchange single scans; domain cap is one") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.operators.Web.syntheticUrl(col("doc_id"), col("lang")).as("url"),
        graft.operators.Web.syntheticHtml(col("doc_id"), col("text")).as("html"))
    val urlPlan = graft.operators.Web.normalizeUrls(d, "url")
      .queryExecution.executedPlan.toString
    assert(!urlPlan.contains("Exchange"), urlPlan)
    assert("Scan parquet".r.findAllIn(urlPlan).size == 1, urlPlan)
    assert(urlPlan.contains("*(1) Project"), urlPlan)
    val htmlPlan = graft.operators.Web.htmlExtract(d, "doc_id", "html")
      .queryExecution.executedPlan.toString
    assert(!htmlPlan.contains("Exchange"), htmlPlan)
    assert("Scan parquet".r.findAllIn(htmlPlan).size == 1, htmlPlan)
    // the cap's only wide operation is the per-domain window partitioning
    // (count + row_number share it: one Exchange, however many windows)
    val capPlan = graft.operators.Web.domainCap(d, "doc_id", "url", 300L)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(capPlan).size == 1, capPlan)
    assert(!capPlan.contains("Join"), capPlan)
  }

  test("z-ordered layout: per-file stat boxes are tight on BOTH dimensions; single sort is not") {
    val s = spark
    import s.implicits._
    // uniform 256×256 grid: every (a,b) combination exactly once
    val grid = s.range(65536).select(
      (col("id").bitwiseAND(255L)).as("a"),
      (shiftright(col("id"), 8).bitwiseAND(255L)).as("b"))
    val zDir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val sDir = java.nio.file.Files.createTempDirectory("graft-asort").toString
    graft.sources.Tables.writeZOrdered(grid, zDir,
      Seq(col("a"), col("b")), bits = 8, numFiles = 16)
    grid.repartitionByRange(16, col("a")).sortWithinPartitions(col("a"))
      .write.mode("overwrite").parquet(sDir)
    def spans(dir: String): (Double, Double) = {
      val rows = s.read.parquet(dir)
        .groupBy(input_file_name())
        .agg((max(col("a")) - min(col("a"))).as("sa"),
          (max(col("b")) - min(col("b"))).as("sb"))
        .agg(avg(col("sa")), avg(col("sb"))).head()
      (rows.getDouble(0), rows.getDouble(1))
    }
    val (za, zb) = spans(zDir)
    val (aa, ab) = spans(sDir)
    // z-order: every file is a box covering a fraction of BOTH ranges —
    // a predicate on either column can skip most files by min/max stats
    assert(za <= 110 && zb <= 110, s"z spans $za/$zb")
    // single-column sort: tight on the sort key, useless on the other
    assert(aa <= 40, s"a-sorted span $aa")
    assert(ab >= 240, s"a-sorted layout should span ~all of b, got $ab")
    // Hilbert: tighter still — the curve never jumps, so 16 files over a
    // 256x256 grid tile into near-squares whose combined stat-box AREA
    // beats the z layout's (z seams bleed boxes across quadrants)
    val hDir = java.nio.file.Files.createTempDirectory("graft-hilb").toString
    graft.sources.Tables.writeHilbertOrdered(grid, hDir,
      col("a"), col("b"), bits = 8, numFiles = 16)
    val (ha, hb) = spans(hDir)
    assert(ha <= 110 && hb <= 110, s"hilbert spans $ha/$hb")
    assert(ha * hb < za * zb,
      s"hilbert box area $ha*$hb should beat z-order $za*$zb")
  }

  test("curateWeb: one scan, exactly two Exchanges (domain + url_norm windows), no Join") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val pages = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.operators.Web.syntheticUrl(col("doc_id"), col("lang")).as("url"),
        graft.operators.Web.syntheticHtml(col("doc_id"), col("text")).as("html"))
    val plan = graft.operators.Web.curateWeb(pages, "doc_id", "url", "html")
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
    assert("Exchange".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("quality classifier: one narrow scan, fused kernel, zero Exchange") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val q = graft.operators.TextOps.qualityClassify(d, "doc_id", "text")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
    // the kernel projection carries the codegen-stage star
    assert(plan.contains("*(1) Project"), plan)
  }

  test("nbClassifyAgg: weight table broadcasts to the corpus feature join") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val out = graft.operators.TextOps.nbClassifyAgg(
      d.where(col("doc_id") % 2 =!= 0),
      d.where(col("doc_id") % 2 === 0)
        .withColumn("y", graft.operators.TextOps.stopwordRatio(col("text")) >= 0.06),
      "doc_id", "text", "y")
    val plan = out.queryExecution.executedPlan.toString
    // the ≤B-row weight table reaches the corpus features as a broadcast
    // (never a sort-merge shuffle of the exploded corpus side)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("nbClassify (r16 fused): scoring scan has zero Exchange / Join / Window") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val out = graft.operators.TextOps.nbClassify(
      d.where(col("doc_id") % 2 =!= 0),
      d.where(col("doc_id") % 2 === 0)
        .withColumn("y", graft.operators.TextOps.stopwordRatio(col("text")) >= 0.06),
      "doc_id", "text", "y")
    val plan = out.queryExecution.executedPlan.toString
    // after the (bounded, eager) training collect, scoring is ONE narrow
    // codegen'd dsir_score kernel scan — the dsirScoreFused shape
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("PQ ADC scan: narrow encode+score, top-k merge, no vector shuffle") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val df = graft.operators.Similarity.pqTopK(emb, "vec_id", "embedding", q, 20)
    val plan = df.queryExecution.executedPlan.toString
    // encode + score are projections over one scan; the only wide op is
    // the partition-local top-k merge (no Exchange at all)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
  }

  test("SQ8 scan: fused encode + integer dot, top-k merge, no Exchange") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val df = graft.operators.Similarity.sqTopK(emb, "vec_id", "embedding", q, 20)
    val plan = df.queryExecution.executedPlan.toString
    // encode + code dot are projections over one scan; the only wide op
    // is the partition-local top-k merge — no Exchange, no vector shuffle
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("sq_encode"), plan)
  }

  test("IVF+PQ scan: fused assign+encode projection, pruned filter, no Exchange") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val df = graft.operators.Similarity.ivfPqTopK(emb, "vec_id", "embedding", q, 20)
    val plan = df.queryExecution.executedPlan.toString
    // cell assignment + probe filter + residual encode + ADC score are all
    // projections/filters over ONE scan; the only wide op is the
    // partition-local top-k merge — no Exchange, no vector shuffle
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("ivf_pq_encode"), plan)
  }

  test("bm25TopK: two scans, broadcast stats row, top-k merge, no index shuffle") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.TextOps.bm25TopK(
      d, "doc_id", "text", Seq("spark", "join"), k = 10)
    val plan = df.queryExecution.executedPlan.toString
    // no inverted index: the corpus is scanned exactly twice (stats pass
    // + scoring pass); the 1-row stats side reaches the scorer as a
    // broadcast and the top-k is per-partition heaps merged on the driver
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert("Scan parquet".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("stratifiedSampleSalted: two bounded windows, no single-stratum funnel") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"))
    val df = graft.operators.Curation.stratifiedSampleSalted(
      d, "doc_id", "source", 10, salts = 8)
    val plan = df.queryExecution.executedPlan.toString
    // phase 1 partitions on (source, bucket) — 8 tasks per hot stratum —
    // and phase 2 re-ranks only the pre-capped survivors: two Windows,
    // the first keyed by the salt bucket expression
    assert("Window ".r.findAllIn(plan).size == 2, plan)
    assert(plan.contains("pmod"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("weightedSample: TakeOrdered heaps, zero Exchange, zero Window") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        greatest(coalesce(col("n_chars"), lit(1L)), lit(1L)).as("w"))
    val df = graft.operators.Curation.weightedSample(d, "doc_id", "w", 64)
    val plan = df.queryExecution.executedPlan.toString
    // the race is one codegen projection; the k winners ride per-partition
    // heaps merged on the driver — the corpus is never sorted or shuffled
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("dedupLines: common-line set broadcasts back against the corpus") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), regexp_replace(col("text"), " (\\w+ \\w+ \\w+) ", " $1\n").as("t2"))
    val df = graft.operators.Dedup.dedupLines(d, "doc_id", "t2", minDocs = 2)
    val plan = df.queryExecution.executedPlan.toString
    // the boilerplate set (Zipf head) joins via broadcast — the exploded
    // corpus lines are never shuffled for the tagging join
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("directory-partitioned writes prune at the scan") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val ev = s.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "event_type", "props")
    graft.sources.Tables.writePartitioned(ev, out, "event_type")
    val back = s.read.parquet(out).where(col("event_type") === "click")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    assert(back.count() > 0)
    assert(back.count() == ev.where(col("event_type") === "click").count())
  }

  test("jsonl round trip preserves documents (compressed)") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    val out = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    graft.sources.Tables.writeJsonl(docs, out)
    val back = graft.sources.Tables.readJsonl(s, out, docs.schema)
    assert(back.count() == docs.count())
    // exact content equality both directions
    assert(back.exceptAll(docs).isEmpty)
    assert(docs.exceptAll(back).isEmpty)
    // compressed files actually produced
    val files = new java.io.File(out).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".gz")), files.toSeq)
  }

  test("curation reads the corpus once: every branch consumes the cached slim projection") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    // AQE wraps the tree in AdaptiveSparkPlanExec, which hides children
    // from collect(); the scan-count property is plan-shape, not runtime
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val (slim, plan) = try {
      val (sl, lazyResult) =
        operators.Curation.curatePipeline(docs, "doc_id", "text", 0.2, 0.8, 3, 16, 4)
      (sl, lazyResult.queryExecution.executedPlan) // resolve while AQE is off
    } finally s.conf.set("spark.sql.adaptive.enabled", "true")
    try {
      // every parquet read in the visible plan would be an extra corpus
      // scan; the ONE real scan lives inside the cached slim projection
      val parquetScans = plan.collect { case p: FileSourceScanExec => p }
      assert(parquetScans.isEmpty,
        s"expected all branches to read the cache, found ${parquetScans.size} parquet scans")
      // the dedup branches (window-min + LSH) both read the cache
      val cacheReads = plan.collect { case p: InMemoryTableScanExec => p }
      assert(cacheReads.size >= 2, plan.toString.take(2000))
    } finally slim.unpersist(blocking = false)
    // the public API materializes then releases the cache — no cached
    // copies may linger after the call
    val before = s.sparkContext.getPersistentRDDs.size
    assert(SparkEntry.queries("q_curation")(spark, sfDir).count() > 0)
    System.gc() // checkpointed result blocks are GC-managed; cache must not grow
    val after = s.sparkContext.getPersistentRDDs.size
    assert(after <= before + 1, s"cached RDDs grew from $before to $after")
  }

  test("knnJoin: no join operator anywhere — candidates-only exchange") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    val df = operators.Similarity.knnJoin(emb, "vec_id", "embedding",
      emb.where(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    val plan = df.queryExecution.executedPlan.toString
    // the M×N pairing happens inside the per-partition heap fold; the
    // plan must contain NO join of any kind and the corpus vectors must
    // never shuffle — the only exchange carries the tiny candidate set
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 candidate exchange, got $exchanges:\n$plan")
    assert(df.count() == 50)
  }

  test("hnswTopK: candidate ids broadcast to a left-semi re-rank — no cartesian, bounded exchange") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val df = operators.Similarity.hnswTopK(emb, "vec_id", "embedding", q, 20)
    val plan = df.queryExecution.executedPlan.toString
    // the only join is the broadcast LEFT-SEMI of the bounded candidate
    // id set against the table (raw vectors never shuffle); the graph
    // walks live inside the per-partition flatMapGroups
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(df.count() == 20)
  }

  test("hnswKnnJoin: no join operator — graph walks in flatMapGroups, candidates-only window") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    val df = operators.Similarity.hnswKnnJoin(emb, "vec_id", "embedding",
      emb.where(col("vec_id") < 5), "vec_id", "embedding", k = 10)
    val plan = df.queryExecution.executedPlan.toString
    // the M×N pairing happens inside the per-partition graph walks; the
    // plan has NO join of any kind — one Exchange groups rows into the
    // partition graphs, one partitions the bounded candidate set for the
    // per-query rank window
    assert(!plan.contains("Join") && !plan.contains("CartesianProduct"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges == 2, s"expected 2 exchanges (graph grouping + rank window), got $exchanges:\n$plan")
    assert(df.count() == 50)
  }

  test("IVF+PQ code table: cell-partitioned codes, pruned probe, vectors never read") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    val (cents, cb) = operators.Similarity.trainIvfPq(emb, "vec_id", "embedding",
      nCells = 8)
    val centSeq: Seq[Seq[Float]] = cents.toIndexedSeq.map(_.toIndexedSeq)
    val cbSeq: Seq[Seq[Seq[Float]]] = cb.toIndexedSeq.map(_.toIndexedSeq.map(_.toIndexedSeq))
    val out = java.nio.file.Files.createTempDirectory("graft-ivfpq").toString
    // persist ONCE: the 100 TB float corpus becomes a code table
    // (m bytes-ish per row) laid out by coarse cell
    val withCell = emb.select(col("vec_id"), col("embedding"),
      operators.Similarity.cellAssignment(col("embedding"),
        cents.zipWithIndex.map(_.swap)).as("cell"))
    withCell.select(col("vec_id"), col("cell"),
        operators.ivf_pq_encode(col("embedding"), col("cell"), centSeq, cbSeq)
          .as("pq_codes"))
      .write.partitionBy("cell").mode("overwrite").parquet(out)
    // a query probing 2 of 8 cells: partition-pruned scan of the CODE
    // table only — no float vector column anywhere in the plan
    val probed = s.read.parquet(out).where(col("cell").isin(0, 1))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(!plan.contains("embedding"), plan)
    assert(probed.count() > 0)
    assert(probed.count() < emb.count())
    // the persisted codes are exactly what the live encode computes
    val live = withCell
      .select(col("vec_id"),
        operators.ivf_pq_encode(col("embedding"), col("cell"), centSeq, cbSeq)
          .as("pq_codes"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val persisted = s.read.parquet(out)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(persisted.size == live.size)
    assert(persisted.forall { case (id, codes) => live(id) == codes })
  }

  test("asof join: union-and-carry plan has one Exchange and zero Join operators") {
    val s = spark
    val ev = graft.sources.Tables.readTable(s, s"$sfDir/events.parquet")
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
    val df = graft.operators.Joins.asofJoin(
      ev.where(col("event_type") =!= "click"),
      ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("click_id"), col("value").as("click_value")),
      keyCol = "user_id", timeCol = "ts_us",
      rightIdCol = "click_id", rightValueCols = Seq("click_value"))
    val plan = df.queryExecution.executedPlan.toString
    // the whole operator is one hash partition on the key + one sort —
    // the same price as a single shuffle join, with no pair explosion
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(!plan.contains("Join"), plan)
    assert(df.count() > 0)
    // nearest direction: both windows share the one partitioning — still
    // a single Exchange (one extra in-partition sort), still no Join
    val near = graft.operators.Joins.asofJoinDirected(
      ev.where(col("event_type") =!= "click"),
      ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("click_id"), col("value").as("click_value")),
      keyCol = "user_id", timeCol = "ts_us",
      rightIdCol = "click_id", rightValueCols = Seq("click_value"),
      direction = "nearest")
    val nearPlan = near.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(nearPlan).size == 1, nearPlan)
    assert(!nearPlan.contains("Join"), nearPlan)
    // broadcast variant: the left side never shuffles and never sorts —
    // the ONLY exchange is the broadcast of the small payload side
    val bcast = graft.operators.Joins.asofJoinBroadcast(
      ev.where(col("event_type") =!= "click"),
      ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("click_id"), col("value").as("click_value")),
      keyCol = "user_id", timeCol = "ts_us",
      rightIdCol = "click_id", rightValueCols = Seq("click_value"))
    val bPlan = bcast.queryExecution.executedPlan.toString
    assert(!bPlan.contains("Exchange hashpartitioning"), bPlan)
    assert(bPlan.contains("BroadcastHashJoin"), bPlan)
    assert(!bPlan.contains("SortMergeJoin"), bPlan)
    assert(!bPlan.contains("Window"), bPlan)
  }

  test("salted as-of: carry partitions on (key, bin); big side never re-exchanged or re-sorted") {
    val s = spark
    val ev = graft.sources.Tables.readTable(s, s"$sfDir/events.parquet")
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
    val df = graft.operators.Joins.asofJoinSalted(
      ev.where(col("event_type") =!= "click"),
      ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("click_id"), col("value").as("click_value")),
      keyCol = "user_id", timeCol = "ts_us",
      rightIdCol = "click_id", rightValueCols = Seq("click_value"))
    val plan = df.queryExecution.executedPlan.toString
    // the carry window partitions on (key, bin) — the skew-split claim;
    // the key rides in the struct-wrapped __k (null-safe for the
    // boundary fix-up join)
    assert("windowspecdefinition\\(__k#\\d+, __bin".r.findFirstIn(plan).isDefined, plan)
    // exactly one Exchange moves the full-width union (the window's);
    // its partitioning includes the bin column
    assert("Exchange hashpartitioning\\([^)]*__bin[^)]*\\)[^\n]*\n[\\s:]*\\+- Union".r
      .findAllIn(plan).size == 1, plan)
    // the fix-up join is shuffle-hash: the big carried side streams
    // straight from Window → Filter → Project into the join with NO
    // re-sort and NO second Exchange (SMJ would re-sort it on the keys)
    assert(plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(("ShuffledHashJoin[^\n]*\n[^\n]*:- Project[^\n]*\n[^\n]*\\+- Filter " +
      "\\(__side[^\n]*\n[^\n]*\\+- Window").r.findFirstIn(plan).isDefined, plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(df.count() > 0)
    // and the answer equals the unsalted operator on the same real data
    val want = graft.operators.Joins.asofJoin(
      ev.where(col("event_type") =!= "click"),
      ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("click_id"), col("value").as("click_value")),
      keyCol = "user_id", timeCol = "ts_us",
      rightIdCol = "click_id", rightValueCols = Seq("click_value"))
    assert(df.orderBy("event_id").collect().map(_.toSeq).toSeq ==
      want.orderBy("event_id").collect().map(_.toSeq).toSeq)
  }

  test("range join plans as an equi-join on the bin key — never cartesian") {
    val df = SparkEntry.queries("q_range_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(df.count() > 0)
    val ij = SparkEntry.queries("q_interval_join")(spark, sfDir)
    val ijPlan = ij.queryExecution.executedPlan.toString
    assert(!ijPlan.contains("CartesianProduct"), ijPlan)
    assert(!ijPlan.contains("BroadcastNestedLoopJoin"), ijPlan)
    assert(ij.count() > 0)
  }

  test("bloom decontamination: corpus side is one narrow scan, zero Exchange/Join") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val df = graft.operators.Bloom.decontaminate(
      d.where(col("doc_id") % 20 =!= 0), d.where(col("doc_id") % 20 === 0),
      "doc_id", "text", n = 4, numBits = 1L << 16, numHashes = 7)
    val plan = df.queryExecution.executedPlan.toString
    // the filter bytes are a plan literal (implicit broadcast); per-row
    // token arrays are membership-counted in one fused kernel call — the
    // corpus never explodes grams, never joins, never shuffles
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
    // and the whole scan→filter→project pipeline is codegen'd (the old
    // higher-order-function fold was CodegenFallback)
    assert(plan.contains("*(1)"), plan)
  }

  test("multi-pattern decontamination: corpus side is one narrow scan, zero Exchange/Join") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val pats = Seq("table", "value table part", "zzz")
    // the screen: automaton is plan-literal kernel data, verdict is the
    // hit-array size — no explode, no join, no shuffle, fully codegen'd
    val screen = graft.operators.TextOps.decontaminateExact(d, "doc_id", "text", pats)
    val sp = screen.queryExecution.executedPlan.toString
    assert(!sp.contains("Exchange"), sp)
    assert(!sp.contains("Join"), sp)
    assert("Scan parquet".r.findAllIn(sp).size == 1, sp)
    assert(sp.contains("*(1)"), sp)
    // the per-pattern row surface adds exactly one Generate (the hit
    // explode) on top of the same single scan — still no Exchange
    val rows = graft.operators.TextOps.multiPatternSearch(d, "doc_id", "text", pats)
    val rp = rows.queryExecution.executedPlan.toString
    assert(!rp.contains("Exchange"), rp)
    assert(!rp.contains("Join"), rp)
    assert("Scan parquet".r.findAllIn(rp).size == 1, rp)
    assert("Generate".r.findAllIn(rp).size == 1, rp)
  }

  test("IVF cell-partitioned layout prunes probes at the scan") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    val cents = operators.Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val out = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    emb.withColumn("cell",
        operators.Similarity.cellAssignment(col("embedding"), cents.zipWithIndex.map(_.swap)))
      .write.partitionBy("cell").mode("overwrite").parquet(out)
    // probing 2 of 8 cells must become a partition-pruned read
    val probed = s.read.parquet(out).where(col("cell").isin(0, 1))
    val plan = probed.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: ["), plan)
    assert(plan.contains("cell"), plan)
    assert(probed.count() > 0)
    assert(probed.count() < emb.count()) // genuinely pruned, not a full scan
  }

  test("round-10 operators: funnel one Exchange; KMV agg one; PMI three scans") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // funnel: one aggregation pass — a single Exchange on the key, no Join
    val ev = sources.Tables.readTable(s, s"$sfDir/events.parquet")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
    val fnPlan = operators.Joins.funnel(ev, "user_id", "ts_us", "event_id",
        "event_type", Seq("view", "click", "purchase"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(fnPlan).size == 1, fnPlan)
    assert(!fnPlan.contains("Join"), fnPlan)
    // KMV aggregator sketch: one partial-agg Exchange (ObjectHashAggregate
    // partials combine map-side), no window sort
    val toks = s.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val kvPlan = operators.Curation.kmvAggTable(toks, "source", "tok", 32)
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(kvPlan).size == 1, kvPlan)
    assert(kvPlan.contains("ObjectHashAggregate") && !kvPlan.contains("Window"), kvPlan)
    // PMI: the unigram table is referenced by both sides' joins but
    // computed ONCE (AQE ReusedExchange — the documented three text
    // scans hold at runtime); joins broadcast, never cartesian
    val pmi = operators.TextOps.cooccurrencePmi(
      s.read.parquet(s"$sfDir/documents.parquet"), "text", 3, 2L)
    assert(pmi.collect().nonEmpty) // count() would execute a pruned plan
    val pmiPlan = pmi.queryExecution.executedPlan.toString
    assert(pmiPlan.contains("ReusedExchange"), pmiPlan)
    assert(pmiPlan.contains("BroadcastHashJoin"), pmiPlan)
    assert(!pmiPlan.contains("CartesianProduct"), pmiPlan)
  }

  test("dsirWeightsAgg: broadcast weight table, reused count Exchange, no cartesian blowup") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val df = operators.Curation.dsirWeightsAgg(
      d.where(col("doc_id") % 20 =!= 0),
      d.where(col("doc_id") % 20 === 0), "doc_id", "text")
    assert(df.collect().nonEmpty) // materialize THIS plan so AQE finalizes
    val plan = df.queryExecution.executedPlan.toString
    // the ≤ buckets-row weight table broadcasts to the corpus feature
    // join; the count subtree feeding both the totals row and the join
    // computes once (ReusedExchange — the PMI shape); the 1-row totals
    // attach as a broadcast nested loop, never a CartesianProduct
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("ReusedExchange"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("dsirWeights (r16 fused): scoring scan has zero Exchange / Join / Window") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val df = operators.Curation.dsirWeights(
      d.where(col("doc_id") % 20 =!= 0),
      d.where(col("doc_id") % 20 === 0), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    // after the (bounded, eager) training collect, the scoring plan is
    // ONE narrow codegen'd scan — the dsirScoreFused production shape
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("hamming cross join: (band, chunk) equi-join only — no cartesian, no NL join") {
    val s = spark
    import s.implicits._
    val a = (0L until 50L).map(i => (i, i * 2654435761L)).toDF("doc_id", "code")
    val b = (0L until 50L).map(i => (i, i * 40503L)).toDF("doc_id", "code")
    val plan = operators.Dedup.hammingNearDupPairsCross(a, b, "doc_id", "code", 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("winnowing: fingerprint scan is zero-Exchange; overlap pairs are fp equi-joins only") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val fps = operators.TextOps.winnowFingerprints(d, "doc_id", "text")
    val fplan = fps.queryExecution.executedPlan.toString
    assert(!fplan.contains("Exchange"), fplan) // one narrow kernel scan + explode
    val pairs = operators.TextOps.winnowOverlapPairs(d, "doc_id", "text",
      k = 16, w = 24, minShared = 3, maxDf = 20)
    val pplan = pairs.queryExecution.executedPlan.toString
    assert(!pplan.contains("CartesianProduct"), pplan)
    assert(!pplan.contains("BroadcastNestedLoopJoin"), pplan)
  }

  test("kneser-ney: count equi-joins + 1-row broadcast totals, no cartesian") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val plan = operators.TextOps.kneserNeyBigrams(d, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastExchange"), plan) // the single-row totals
  }

  test("multimodal kernels (phash / scene cuts / resample / wordpiece) shuffle ids only") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet(s"$sfDir/documents.parquet")
    val ids = d.select(col("doc_id"))
    // r16: blob generation spreads the BARE ID column across cores with
    // exactly one hash exchange (the single-row-group inputs otherwise
    // pin synthesis + decode to one task); the generated blobs and the
    // decode itself must still never shuffle — one Exchange, of ids only
    def idOnlyExchange(plan: String, tag: String): Unit = {
      assert("Exchange ".r.findAllIn(plan).size == 1, s"$tag: $plan")
      assert(plan.contains("Exchange hashpartitioning(doc_id"), s"$tag: $plan")
    }
    val ph = operators.Multimodal.perceptualHashes(s,
        operators.Multimodal.syntheticImageBlobs(s, ids)).toDF()
      .queryExecution.executedPlan.toString
    idOnlyExchange(ph, "phash")
    val vc = operators.Multimodal.videoSceneCuts(s,
        operators.Multimodal.syntheticAviBlobs(s, ids), 32000L).toDF()
      .queryExecution.executedPlan.toString
    idOnlyExchange(vc, "scenecuts")
    val ar = operators.Multimodal.audioResample(s,
        operators.Multimodal.syntheticAudioBlobs(s, ids)).toDF()
      .queryExecution.executedPlan.toString
    idOnlyExchange(ar, "resample")
    val wp = operators.TextOps.wordPieceSegmentWith(d, "doc_id", "text",
        Seq(("a", 0), ("a", 1)))
      .queryExecution.executedPlan.toString
    assert(!wp.contains("Exchange"), wp)
  }
}
