package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShim

/**
 * Large-scale deduplication operators for training-data pipelines.
 *
 * All of these are pure declarative DataFrame pipelines: every stage is a
 * map-side expression or a key-partitioned shuffle, so they scale linearly
 * with executors — no driver-side collection anywhere. The LSH design is
 * the standard shingle → minhash → band → bucket-join pipeline (Broder '97;
 * Leskovec/Rajaraman/Ullman "Mining of Massive Datasets" ch.3).
 *
 * Scale notes (100 TB design point):
 *  - exact dedup: one hash-partitioned aggregation; map-side partial
 *    aggregation keeps the shuffle at one row per distinct digest.
 *  - minhash: signatures are computed with ONE xxhash64 pass per shingle;
 *    the k hash family is derived affinely (a_i*h+b_i) from that single
 *    hash, so signature cost is O(shingles), not O(shingles*k).
 *  - candidate pairs: explode to (band, bucket) keys — a self-equi-join on
 *    the bucket key, which AQE can skew-split; no cross join ever happens.
 */
object Dedup {

  /** Exact duplicate groups by content digest. One shuffle on the digest. */
  def exactDuplicates(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.select(md5(col(contentCol).cast("binary")).as("h"), col(idCol))
      .groupBy(col("h"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** Incremental exact dedup for append-style ingestion: of an incoming
    * batch, keep exactly the rows whose content digest is NEW — absent
    * from the already-ingested `seen` corpus AND not claimed by a
    * smaller-id row of the same batch (the [[exactDuplicates]] keeper
    * rule). Returns the surviving `(idCol, digest)` rows — ready to
    * append to the corpus and to the persisted digest side for the next
    * batch.
    *
    * Scale shape: one digest-keyed window over the incoming batch (the
    * small side of ingestion) plus one LEFT ANTI equi-join against the
    * seen digests — the join shuffles one digest row per seen doc,
    * never corpus text. For very large seen sets, prescreen with
    * [[graft.operators.Bloom]] and anti-join only the maybes, or
    * bucket the persisted digest layout by digest so the join
    * co-locates without an Exchange (sources.Tables bucketing). */
  def incrementalDedup(
      incoming: DataFrame,
      seen: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val inc = incoming.select(col(idCol),
      md5(col(textCol).cast("binary")).as("digest"))
    // keep-one-per-digest via hash aggregation: the kept row is exactly
    // (min id, digest), so a partial-agg groupBy replaces the digest
    // window (full sort per partition) — map-side combine shuffles one
    // row per (partition, digest) instead of every batch row (§2.3/§2.4)
    val batchKeep = inc
      .groupBy(col("digest")).agg(min(col(idCol)).as(idCol))
      .select(col(idCol), col("digest"))
    batchKeep.join(
      seen.select(md5(col(textCol).cast("binary")).as("digest")),
      Seq("digest"), "left_anti")
      .select(col(idCol), col("digest"))
  }

  /** Append-batch NEAR-duplicate dedup: the MinHash companion of
    * [[incrementalDedup]] for production ingestion. Each incoming doc is
    * screened against (a) the already-ingested corpus and (b) the
    * smaller-id members of its own batch, via banded-LSH candidates
    * verified with exact shingle Jaccard — the exact/near split every
    * ingestion pipeline runs (byte-identical re-crawls die on the digest
    * anti-join; boilerplate-perturbed re-crawls die here).
    *
    * Output: one row per incoming doc — (id, keep, match_src, match_id,
    * match_jaccard) where the match is the BEST surviving evidence
    * (jaccard desc, then "batch" before "corpus", then smaller id) and
    * keep = no match ≥ `threshold`. A doc is dropped if it matches ANY
    * smaller-id batch doc, even one itself dropped — the transitive
    * min-id-keeper rule of [[incrementalDedup]] generalized.
    *
    * Scale: signatures + shingle sets are one narrow projection per
    * side; candidates come from the banded bucket equi-join (batch
    * buckets against corpus + batch buckets — never all-pairs, and the
    * corpus side can be a PERSISTED signature table so re-crawls don't
    * re-minhash the corpus); only candidate pairs' shingle sets travel
    * to the verify join. Same cost model as [[verifiedNearDupPairs]]
    * with the corpus×corpus quadrant never generated.
    *
    * Recall: LSH candidates are probabilistic. The 8×2 default banding
    * misses a true j=0.8 pair with (1−0.8²)^8 ≈ 2.8e-4 bucket
    * probability (4-row bands were measurably worse — ~12% at the same
    * j — and are deliberately NOT the default), and the est ≥
    * threshold−0.2 prefilter adds a comparable sub-percent miss mode
    * for pairs hovering at the threshold. Verify completeness against a
    * brute-force oracle on your data when the threshold band matters
    * (q_incr_neardup does exactly that). */
  def incrementalNearDup(
      incoming: DataFrame,
      seen: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 8,
      threshold: Double = 0.8): DataFrame = {
    require(bands > 0 && numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val rowsPerBand = numHashes / bands
    def prep(df: DataFrame): DataFrame = df.select(
      col(idCol).as("id"),
      minhashSignature(col(textCol), shingleSize, numHashes).as("sig"),
      shingles(col(textCol), shingleSize).as("sh"))
    val bat = prep(incoming)
    val cor = prep(seen)
    def buckets(df: DataFrame): DataFrame = df.select(col("id"), col("sig"),
      posexplode(bandBuckets(col("sig"), bands, rowsPerBand)).as(Seq("band", "bucket")))
    val bb = buckets(bat)
    val estLow = math.max(0.0, threshold - 0.2)
    // batch × corpus: every bucket collision is a candidate
    val crossCand = bb.as("a").join(buckets(cor).as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket"))
      .where(sigAgreement(col("a.sig"), col("b.sig")) >= estLow)
      .select(col("a.id").as("bid"), lit("corpus").as("src"), col("b.id").as("oid"))
    // batch × batch: only smaller-id partners count as keepers
    val selfCand = bb.as("a").join(bb.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("b.id") < col("a.id"))
      .where(sigAgreement(col("a.sig"), col("b.sig")) >= estLow)
      .select(col("a.id").as("bid"), lit("batch").as("src"), col("b.id").as("oid"))
    val others = cor.select(lit("corpus").as("src"), col("id").as("oid"), col("sh").as("osh"))
      .union(bat.select(lit("batch").as("src"), col("id").as("oid"), col("sh").as("osh")))
    val matches = crossCand.union(selfCand).distinct()
      .join(bat.select(col("id").as("bid"), col("sh").as("bsh")), "bid")
      .join(others, Seq("src", "oid"))
      .select(col("bid"), col("src"), col("oid"),
        jaccard(col("bsh"), col("osh")).as("jac"))
      .where(col("jac") >= threshold)
    // best-evidence argmax as one partial-aggregable min over the exact
    // (−jac, src, oid) key — the (jac desc, src asc, oid asc) tie rule
    // without the per-bid window sort. jac ≥ threshold > 0, so negation
    // is an exact order reversal (no −0.0/NaN edge).
    val best = matches
      .groupBy(col("bid"))
      .agg(min(struct(negate(col("jac")), col("src"), col("oid"),
        col("jac"))).as("__b"))
      .select(col("bid"), col("__b.src").as("src"),
        col("__b.oid").as("oid"), col("__b.jac").as("jac"))
    // sentinel instead of NULL for kept docs: keeps the columns
    // non-nullable end to end (nullable ints degrade to floats in
    // arrow/pandas round-trips, which breaks value-level comparison)
    incoming.select(col(idCol).as("doc_id"))
      .join(best, col("doc_id") === col("bid"), "left")
      .select(col("doc_id"), col("bid").isNull.as("keep"),
        coalesce(col("src"), lit("none")).as("match_src"),
        coalesce(col("oid"), lit(-1L)).as("match_id"),
        coalesce(col("jac"), lit(0.0)).as("match_jaccard"))
  }

  /** Whitespace tokens → n-token shingles (distinct): the fused
    * [[ShingleSet]] kernel, byte-identical to the declarative
    * `array_distinct(transform(sequence(...), concat_ws(slice(...))))`
    * chain it replaced (KernelPropertySpec pins the equivalence) but
    * one pass and one allocation per distinct gram. */
  def shingles(textCol: Column, n: Int): Column =
    GraftSqlShim.column(
      ShingleSet(GraftSqlShim.expression(split(textCol, " ")), n))

  /** MinHash signature (array<long> of length k) over a text column: the
    * fused MinHashSignature kernel shingles, hashes, and min-hashes the
    * token array in one pass (see exprs.scala for why fusion matters). */
  def minhashSignature(textCol: Column, shingleSize: Int, k: Int): Column = {
    GraftSqlShim.column(
      MinHashSignature(GraftSqlShim.expression(split(textCol, " ")), shingleSize, k))
  }

  private[graft] def bandBuckets(sigCol: Column, bands: Int, rowsPerBand: Int): Column = {
    GraftSqlShim.column(
      BandBuckets(GraftSqlShim.expression(sigCol), bands, rowsPerBand))
  }

  private[graft] def sigAgreement(a: Column, b: Column): Column = {
    GraftSqlShim.column(
      SigAgreement(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))
  }

  /** Candidate near-duplicate pairs via banded LSH over minhash signatures.
    *
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b, est_jaccard =
    * fraction of matching signature components. `threshold` filters on the
    * estimate. Input df must have an id column and a text column.
    */
  def minhashCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val sigs = df.select(
      col(idCol).as("id"),
      minhashSignature(col(textCol), shingleSize, numHashes).as("sig"))
    minhashCandidatePairsFromSigs(sigs, numHashes, bands, threshold)
  }

  /** One-permutation MinHash signature (array<long> of length k): ONE
    * hash per shingle instead of [[minhashSignature]]'s k, via the fused
    * [[OphMinHashSignature]] kernel (bucket-min + rotation
    * densification). Same estimator family at 1/k the hash cost — the
    * signature scan is the LSH bottleneck at corpus scale. */
  def ophSignature(textCol: Column, shingleSize: Int, k: Int): Column =
    GraftSqlShim.column(
      OphMinHashSignature(GraftSqlShim.expression(split(textCol, " ")), shingleSize, k))

  /** [[minhashCandidatePairs]] with [[ophSignature]] signatures: the
    * banding, bucket equi-join, and agreement estimate are shared
    * verbatim — only the signature pass changes, from k hashes per
    * shingle to one. */
  def ophCandidatePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val sigs = df.select(
      col(idCol).as("id"),
      ophSignature(col(textCol), shingleSize, numHashes).as("sig"))
    minhashCandidatePairsFromSigs(sigs, numHashes, bands, threshold)
  }

  /** Candidate pairs from a precomputed `(id, sig)` frame — for pipelines
    * that already carry signatures (e.g. Curation.curate's single-scan
    * annotate pass) so banding does not recompute them or rescan the
    * corpus. */
  def minhashCandidatePairsFromSigs(
      sigs: DataFrame,
      numHashes: Int = 16,
      bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    // bands > numHashes would make rowsPerBand = 0 → every bucket constant
    // per band → the self-join silently degenerates into a full cross
    // product; non-divisible numHashes would silently ignore trailing
    // signature components. Both are caller bugs — fail loudly.
    require(bands > 0 && numHashes >= bands && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    val rowsPerBand = numHashes / bands
    val exploded = sigs
      .select(col("id"), col("sig"),
        posexplode(bandBuckets(col("sig"), bands, rowsPerBand)).as(Seq("band", "bucket")))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        sigAgreement(col("a.sig"), col("b.sig")).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
      .distinct()
  }

  /** Exact n-gram (token-shingle) Jaccard similarity between two shingle
    * array columns — the verification stage after LSH candidates, or a
    * direct measure for small joins. */
  def jaccard(aShingles: Column, bShingles: Column): Column =
    (size(array_intersect(aShingles, bShingles)).cast("double") /
      size(array_union(aShingles, bShingles)).cast("double"))

  /** Two-stage near-dup detection: LSH candidates re-checked with EXACT
    * token-set Jaccard (joins the documents back only for the candidate
    * pairs — the join is on ids, and candidates are a tiny fraction of the
    * corpus, so the texts of non-candidates never shuffle). */
  def verifiedNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val candidates = minhashCandidatePairs(df, idCol, textCol,
      shingleSize = shingleSize, threshold = math.max(0.0, threshold - 0.2))
    val sh = df.select(col(idCol).as("vid"),
      shingles(col(textCol), shingleSize).as("sh")) // already distinct
    candidates
      .join(sh.withColumnRenamed("vid", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(sh.withColumnRenamed("vid", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** CONTAINMENT near-dup pairs — the asymmetric-duplication case the
    * Jaccard family is blind to: a short document fully embedded in a
    * longer one (a quoted article inside a page, a chapter inside a
    * book, a README pasted into a repo dump) has Jaccard ≈ |A|/|B|
    * (arbitrarily small) but overlap coefficient
    * `|S(A) ∩ S(B)| / min(|S(A)|, |S(B)|)` ≈ 1 — and minhash-LSH
    * cannot find such pairs either, because banding recall tracks
    * JACCARD. Candidates come from PREFIX FILTERING (the AllPairs /
    * PPJoin candidate scheme adapted to the overlap coefficient): order
    * all shingles globally by (document frequency, shingle) ascending;
    * each doc probes the gram postings with only its
    * `⌊(1−threshold)·n⌋ + 2` RAREST shingles. LOSSLESS by the prefix
    * pigeonhole — for a passing pair with |A| = min, A can have at most
    * `(1−threshold)·|A|` shingles outside B, so at least one of A's
    * prefix shingles is in B and the prefix⋈postings join emits the
    * pair (the +2 covers the ⌊⌋+1 bound plus one slack gram so double
    * rounding of `(1−t)·n` can never under-size a prefix). No maxDf
    * recall cliff: saturated-vocabulary (boilerplate-heavy) corpora
    * stay fully covered — their cost shows up as candidate volume, not
    * silent misses.
    *
    * Returns `(id_a, id_b, n_a, n_b, n_inter, overlap)` for id_a < id_b
    * with overlap ≥ `threshold`; exact integers plus one division.
    * `n_inter` is COUNTED from the gram-postings equi-join (one count
    * per shared shingle of a candidate pair) — no doc carries its full
    * shingle array through a join.
    *
    * Scale shape: one shingle explode + one df count (partial-agg, the
    * Zipf head collapses map-side) + a per-doc top-p window on the doc
    * key + the prefix⋈postings equi-join on the gram. Candidate volume
    * is Σ_doc Σ_{g ∈ prefix(doc)} df(g) — prefixes pick the globally
    * rarest grams, so the sum rides the Zipf TAIL (vs Σ_g df(g)² over
    * all rare grams for a df-windowed self-join). All equi-shapes,
    * AQE-splittable.
    *
    * EAGER: the gram postings feed five plan branches (df count,
    * prefix ranking, the candidate probe, and both sides of the
    * intersection count); left lazy, each branch would re-run the
    * shingling kernel over the corpus. The postings are PERSISTED for
    * the duration of the call (one shingle pass total, spillable
    * MEMORY_AND_DISK — ~tokens×2 columns, the same working set any
    * inverted-index build holds) and released before returning, so the
    * result is materialized eagerly (it is bounded by the true
    * duplicate volume — tiny relative to the corpus). */
  def containmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.9): DataFrame = {
    val (out, ex) = containmentPlan(df, idCol, textCol, shingleSize, threshold)
    try out.localCheckpoint(true) finally ex.unpersist()
  }

  /** The lazy plan behind [[containmentPairs]], plus the persisted
    * postings frame the caller must unpersist after consuming the
    * result — split out so PlanQualitySpec can pin the pre-checkpoint
    * plan shape. */
  private[graft] def containmentPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double): (DataFrame, DataFrame) = {
    val ex = df.select(col(idCol).as("vid"),
        explode(shingles(col(textCol), shingleSize)).as("g"))
      .persist()
    (containmentFromPostings(ex, threshold), ex)
  }

  /** Containment pairs from an already-materialized postings frame
    * `(vid, g)` — the building block [[containmentPlan]] and
    * [[nearDupScreen]] share, so the shingle pass never re-runs. The
    * frame must hold DISTINCT grams per doc (the [[shingles]]
    * contract), and callers own its persist/unpersist lifecycle. */
  private[graft] def containmentFromPostings(
      ex: DataFrame,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    // distinct grams per doc (shingles() is array_distinct, so the
    // posting count IS the set size)
    val sizes = ex.groupBy(col("vid")).agg(count(lit(1)).as("n"))
    val dfs = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // per-doc prefix: the p rarest grams in the GLOBAL (df, g) order,
    // p = ⌊(1−t)·n⌋ + 2 (see the recall argument above). Ties cannot
    // occur within a doc — shingles() is array_distinct, so g is unique
    // per vid, making the (df, g) order total — so the selection is one
    // per-doc aggregate (collect + array_sort + slice) instead of a
    // global-sort row_number window: the same rows, no partition sort,
    // and the doc-size join folds into the same aggregate (the count IS
    // the collected list's length). Per-doc state is bounded by the
    // doc's distinct-gram count — exactly the window's partition buffer.
    val pref = ex.join(dfs, "g")
      .groupBy(col("vid"))
      .agg(count(lit(1)).as("n"),
        collect_list(struct(col("df"), col("g"))).as("gs"))
      .select(col("vid").as("pid"), col("n").as("np"),
        explode(slice(array_sort(col("gs")), 1,
          (floor(lit(1.0 - threshold) * col("n")) + 2).cast("int"))).as("dg"))
      .select(col("pid"), col("np"), col("dg.g").as("g"))
    // probe only small→large: the recall argument needs the SMALLER
    // doc's prefix to hit the container, so a probe row with
    // n_probe > n_other is redundant (the pair re-arises from the other
    // doc's own prefix) — dropping it halves candidate volume. Ties
    // keep both directions; least/greatest + distinct canonicalizes.
    val cand = pref
      .join(ex.join(sizes, "vid")
        .select(col("vid").as("oid"), col("n").as("no"), col("g")), "g")
      .where(col("pid") =!= col("oid") && col("np") <= col("no"))
      .select(least(col("pid"), col("oid")).as("id_a"),
        greatest(col("pid"), col("oid")).as("id_b"))
      .distinct()
    val inter = cand
      .join(ex.select(col("vid").as("id_a"), col("g")), "id_a")
      .join(ex.select(col("vid").as("id_b"), col("g")), Seq("id_b", "g"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("vid").as("id_a"), col("n").as("n_a")), "id_a")
      .join(sizes.select(col("vid").as("id_b"), col("n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"), col("n_inter"),
        (col("n_inter").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("overlap"))
      .where(col("overlap") >= threshold)
  }

  /** Ingestion-time containment screen: is each INCOMING document
    * subset-redundant against the already-ingested corpus or a
    * preferred batch peer? The [[incrementalNearDup]] companion for the
    * asymmetric blind spot — a short doc pasted inside a long seen one
    * has tiny Jaccard but overlap 1.0. A batch doc `b` is dropped when
    * some other doc `o` has overlap ≥ `threshold` AND the drop is
    * one-directional: `n_o > n_b`, or `n_o = n_b` with `o` in the
    * corpus or a smaller-id batch peer (so equal-size mutual
    * containment keeps exactly one). A batch doc strictly CONTAINING a
    * seen doc is kept — it carries new content.
    *
    * Candidates are lossless by the prefix-filter argument restricted
    * to the drop direction: the dropped side is always the SMALLER, so
    * only BATCH prefixes are needed — each incoming doc probes the
    * union postings with its ⌊(1−t)·n⌋+2 globally-rarest grams (a
    * contained doc shares all its grams with its container, so at
    * least 2 prefix grams hit). Gram document frequencies are computed
    * over batch ∪ corpus here; a production deployment maintains the
    * corpus df table incrementally and unions the batch counts in.
    *
    * Returns one audit row per incoming doc:
    * `(doc_id, keep, match_src 'corpus'|'batch'|'none', match_id,
    * match_overlap)` — sentinels (-1 / 0.0) instead of NULLs, the
    * [[incrementalNearDup]] convention. One shingle pass over each
    * side; all joins are gram/id equi-joins; the corpus×corpus
    * quadrant is never generated. */
  def incrementalContainment(
      incoming: DataFrame,
      seen: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.9): DataFrame = {
    val (out, ex) = incrementalContainmentPlan(
      incoming, seen, idCol, textCol, shingleSize, threshold)
    try out.localCheckpoint(true) finally ex.unpersist()
  }

  /** [[incrementalContainment]] minus the eager materialization: returns
    * (result, persisted union postings) so callers — the plan spec —
    * can inspect the LIVE tree; the caller owns the unpersist. */
  private[graft] def incrementalContainmentPlan(
      incoming: DataFrame,
      seen: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double): (DataFrame, DataFrame) = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    def postings(df: DataFrame, src: String): DataFrame =
      df.select(col(idCol).as("vid"),
          explode(shingles(col(textCol), shingleSize)).as("g"))
        .withColumn("src", lit(src))
    val ex = postings(incoming, "batch").unionByName(postings(seen, "corpus"))
      .persist()
    locally {
      val sizes = ex.groupBy(col("src"), col("vid")).agg(count(lit(1)).as("n"))
      val dfs = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
      // same sort-free per-doc prefix selection as
      // [[containmentFromPostings]] — (df, g) is total per vid, so the
      // aggregate replays the window's row_number ≤ p rule exactly
      val prefB = ex.where(col("src") === "batch")
        .join(dfs, "g")
        .groupBy(col("vid"))
        .agg(count(lit(1)).as("n"),
          collect_list(struct(col("df"), col("g"))).as("gs"))
        .select(col("vid").as("bid"), col("n").as("nb"),
          explode(slice(array_sort(col("gs")), 1,
            (floor(lit(1.0 - threshold) * col("n")) + 2).cast("int"))).as("dg"))
        .select(col("bid"), col("nb"), col("dg.g").as("g"))
      val cand = prefB
        .join(ex.select(col("src").as("osrc"), col("vid").as("oid"), col("g")), "g")
        .join(sizes.select(col("src").as("osrc"), col("vid").as("oid"),
          col("n").as("no")), Seq("osrc", "oid"))
        .where(!(col("osrc") === "batch" && col("oid") === col("bid")))
        .where(col("no") > col("nb") ||
          (col("no") === col("nb") &&
            (col("osrc") === "corpus" || col("oid") < col("bid"))))
        .select(col("bid"), col("osrc"), col("oid"))
        .distinct()
      val inter = cand
        .join(ex.where(col("src") === "batch")
          .select(col("vid").as("bid"), col("g")), "bid")
        .join(ex.select(col("src").as("osrc"), col("vid").as("oid"), col("g")),
          Seq("osrc", "oid", "g"))
        .groupBy(col("bid"), col("osrc"), col("oid"))
        .agg(count(lit(1)).as("n_inter"))
      val scored = inter
        .join(sizes.where(col("src") === "batch")
          .select(col("vid").as("bid"), col("n").as("nb")), "bid")
        .join(sizes.select(col("src").as("osrc"), col("vid").as("oid"),
          col("n").as("no")), Seq("osrc", "oid"))
        .select(col("bid"), col("osrc"), col("oid"),
          (col("n_inter").cast("double") /
            least(col("nb"), col("no")).cast("double")).as("ov"))
        .where(col("ov") >= threshold)
      // best-evidence argmax via min over the exact (−ov, osrc, oid)
      // key — ov ≥ threshold > 0, so negation reverses the order
      // exactly; replaces the per-bid window sort with a partial-agg
      // groupBy (§2.4)
      val best = scored
        .groupBy(col("bid"))
        .agg(min(struct(negate(col("ov")), col("osrc"), col("oid"),
          col("ov"))).as("__b"))
        .select(col("bid"), col("__b.osrc").as("osrc"),
          col("__b.oid").as("oid"), col("__b.ov").as("ov"))
      val out = incoming.select(col(idCol).as("doc_id"))
        .join(best, col("doc_id") === col("bid"), "left")
        .select(col("doc_id"), col("bid").isNull.as("keep"),
          coalesce(col("osrc"), lit("none")).as("match_src"),
          coalesce(col("oid"), lit(-1L)).as("match_id"),
          coalesce(col("ov"), lit(0.0)).as("match_overlap"))
      (out, ex)
    }
  }

  /** Containment dedup end-to-end: [[containmentPairs]] (asymmetric
    * subset-duplication pairs) closed transitively into duplicate
    * groups by [[duplicateClusters]], with the keep-one-per-group
    * verdict — the front door a curation pipeline actually calls, since
    * raw pairs still need a consistent survivor choice when A⊂B and
    * B⊂C chain (dropping per-pair can drop ALL of a chain's docs; the
    * component closure keeps exactly one).
    *
    * One row per input document: `(id, cluster_id, keep)` with
    * `cluster_id` = the smallest id in the document's containment
    * component (singletons label themselves) and `keep` ⇔ the document
    * IS that minimum — deterministic, id-stable. NULL/empty-text
    * documents have no shingles, so they are always singleton keepers.
    *
    * Scale: the pair list is materialized once by [[containmentPairs]]
    * (bounded by true duplicate volume), then pointer-doubling CC runs
    * keyed exchanges over ids+pairs only — the corpus text is read
    * exactly once, in the shingle pass. `checkpointDir` as in
    * [[duplicateClusters]] (durable iteration on any FS). */
  def containmentDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.9,
      maxIter: Int = 10,
      checkpointDir: String = null): DataFrame = {
    val pairs = containmentPairs(df, idCol, textCol, shingleSize, threshold)
      .select(col("id_a"), col("id_b"))
    duplicateClusters(df.select(col(idCol)), pairs, maxIter, checkpointDir)
      .select(col(idCol), col("cluster_id"),
        (col(idCol) === col("cluster_id")).as("keep"))
  }

  /** ONE-PASS near-duplication screen: MinHash-LSH (symmetric, Jaccard)
    * AND containment (asymmetric, overlap coefficient) from a single
    * shingle pass over the corpus — the two screens a curation pipeline
    * runs together, which as separate calls would each scan and
    * re-shingle the corpus.
    *
    * The shared working set is the exploded gram postings `(vid, g)`,
    * persisted once. Containment consumes them directly
    * ([[containmentFromPostings]]); the LSH branch RECOVERS the minhash
    * signatures from them — per-gram affine components
    * ([[GramSigComponents]]) min-aggregated per doc — which is
    * bit-identical to the fused [[MinHashSignature]] kernel (a
    * space-joined gram splits back to exactly its tokens, and min over
    * the distinct gram set equals min over the positional multiset;
    * OperatorsSpec pins sig equality and answer parity with the
    * standalone operators).
    *
    * Returns `(id_a, id_b, kind, score)` with `kind` ∈ 'jaccard_est'
    * (score = signature agreement ≥ `jaccardThreshold`) | 'containment'
    * (score = overlap coefficient ≥ `overlapThreshold`); a pair caught
    * by both screens appears twice, once per kind — deduplicate on
    * (id_a, id_b) downstream if only the verdict matters. Eager, like
    * [[containmentPairs]]: the result is materialized so the postings
    * can be released before returning. */
  def nearDupScreen(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4,
      jaccardThreshold: Double = 0.5,
      overlapThreshold: Double = 0.9): DataFrame = {
    val (out, ex) = nearDupScreenPlan(df, idCol, textCol, shingleSize,
      numHashes, bands, jaccardThreshold, overlapThreshold)
    try out.localCheckpoint(true) finally ex.unpersist()
  }

  /** The lazy plan behind [[nearDupScreen]] plus its persisted postings
    * (PlanQualitySpec pins the pre-checkpoint shape). */
  private[graft] def nearDupScreenPlan(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      numHashes: Int,
      bands: Int,
      jaccardThreshold: Double,
      overlapThreshold: Double): (DataFrame, DataFrame) = {
    val ex = df.select(col(idCol).as("vid"),
        explode(shingles(col(textCol), shingleSize)).as("g"))
      .persist()
    val comp = ex.select(col("vid"), GraftSqlShim.column(
      GramSigComponents(GraftSqlShim.expression(col("g")), numHashes)).as("c"))
    val mins = (0 until numHashes).map(j =>
      min(element_at(col("c"), j + 1)).as(s"s$j"))
    val sigs = comp.groupBy(col("vid"))
      .agg(mins.head, mins.tail: _*)
      .select(col("vid").as("id"),
        array((0 until numHashes).map(j => col(s"s$j")): _*).as("sig"))
    val lsh = minhashCandidatePairsFromSigs(sigs, numHashes, bands, jaccardThreshold)
      .select(col("id_a"), col("id_b"),
        lit("jaccard_est").as("kind"), col("est_jaccard").as("score"))
    val cont = containmentFromPostings(ex, overlapThreshold)
      .select(col("id_a"), col("id_b"),
        lit("containment").as("kind"), col("overlap").as("score"))
    (lsh.unionAll(cont), ex)
  }

  /** SimHash near-dup pairs: band the 64-bit simhash into `maxHamming + 1`
    * chunks — two hashes within Hamming distance `maxHamming` must agree on
    * at least one chunk (pigeonhole), so chunk-equality buckets are a
    * COMPLETE candidate set at the requested radius; candidates are then
    * filtered by exact Hamming distance. Same explode + equi-join shape as
    * MinHash LSH: one shuffle on (band, chunk).
    *
    * Scale note: chunk width is 64/(maxHamming+1) bits, so bucket count
    * shrinks as the radius grows — maxHamming = 8 means ~7-bit chunks
    * (128 buckets/band). On a large corpus keep the radius small (≤ 5) or
    * the per-bucket candidate lists grow quadratic; AQE skew-split keeps
    * the join partitions bounded either way. */
  def simhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming must be in 0..63, got $maxHamming")
    val nBands = maxHamming + 1
    // distribute 64 bits over nBands chunks: the first (64 % nBands) chunks
    // get an extra bit — completeness only needs the chunks to partition
    // the 64 bit positions
    val widths = Array.tabulate(nBands)(b => 64 / nBands + (if (b < 64 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val hashed = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sh"))
    val banded = hashed.select(col("id"), col("sh"),
      posexplode(array((0 until nBands).map { b =>
        val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1L
        shiftrightunsigned(col("sh"), offsets(b)).bitwiseAND(lit(mask))
      }: _*))
        .as(Seq("band", "chunk")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Cross-corpus Hamming near-dup join over PRECOMPUTED 64-bit codes
    * (simhash, image dHash, binary-quantized embeddings — any code whose
    * Hamming distance means similarity): every (left, right) pair within
    * `maxHamming` bits, via the same pigeonhole banding as
    * [[simhashNearDupPairs]] — the 64 bits split into `maxHamming + 1`
    * chunks, two codes within the radius must agree on at least one
    * chunk, so chunk-equality buckets are a COMPLETE candidate set;
    * exact `bit_count(xor)` verifies. No `id <` dedup (the corpora are
    * distinct sides); one shuffle on (band, chunk), equi-join (AQE
    * skew-splittable). Inputs are two (idCol, codeCol) frames. */
  /** (id, code, band, chunk) explode of 64-bit codes into the
    * `maxHamming + 1` pigeonhole chunks — the shared banding under
    * [[hammingNearDupPairsCross]] and the streaming image screen. */
  private[graft] def bandedCodes(
      df: DataFrame, idCol: String, codeCol: String, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming must be in 0..63, got $maxHamming")
    val nBands = maxHamming + 1
    val widths = Array.tabulate(nBands)(b => 64 / nBands + (if (b < 64 % nBands) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    df.select(col(idCol).as("id"), col(codeCol).cast("long").as("code"))
      .select(col("id"), col("code"),
        posexplode(array((0 until nBands).map { b =>
          val mask = if (widths(b) == 64) -1L else (1L << widths(b)) - 1L
          shiftrightunsigned(col("code"), offsets(b)).bitwiseAND(lit(mask))
        }: _*))
          .as(Seq("band", "chunk")))
  }

  def hammingNearDupPairsCross(
      left: DataFrame,
      right: DataFrame,
      idCol: String,
      codeCol: String,
      maxHamming: Int = 3): DataFrame = {
    val a = bandedCodes(left, idCol, codeCol, maxHamming).as("a")
    val b = bandedCodes(right, idCol, codeCol, maxHamming).as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.code").bitwiseXOR(col("b.code"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Transitive duplicate clusters from a pair list: iterative min-label
    * propagation with pointer doubling (DataFrame connected components).
    * Returns (id, cluster_id) where cluster_id is the smallest id reachable
    * through pair edges; rows not in any pair keep themselves as cluster_id
    * via the caller's ids frame.
    *
    * Each iteration does one neighbor-min hop plus one label(label)
    * shortcut join — labels reach distance 2^k after k iterations, so
    * `maxIter` = 10 resolves duplicate chains of length ~1000; the loop
    * also exits as soon as a pass changes nothing. Two shuffles on id per
    * iteration. Keep-one-per-cluster = `cluster_id === id`.
    *
    * Iteration state must be MATERIALIZED each pass (an iterative plan
    * otherwise re-executes the whole lineage tree every iteration —
    * exponential). Two modes, identical results (OperatorsSpec pins the
    * equivalence):
    *  - `checkpointDir = null` (default): `localCheckpoint()` —
    *    executor-local blocks, the fast path for local mode and for
    *    clusters where re-running the job on executor loss is acceptable.
    *    NOT fault-tolerant: at 100 TB a lost executor kills the whole
    *    iterative job tree.
    *  - `checkpointDir` set: each iteration's labels are written to
    *    parquet under the dir and read back — any-FS durable, so an
    *    executor loss recomputes at most one iteration from files.
    *    Intermediate iterations are deleted as they are superseded, and
    *    the per-run cc_<uuid> directory is removed before returning:
    *    the final labels are eagerly materialized (localCheckpoint —
    *    one small row per id) so repeated runs leave no orphans.
    */
  def duplicateClusters(
      ids: DataFrame,      // one column: the id universe
      pairs: DataFrame,    // columns id_a, id_b
      maxIter: Int = 10,
      checkpointDir: String = null): DataFrame = {
    val idName = ids.columns.head
    val spark = ids.sparkSession
    val runDir =
      if (checkpointDir == null) null
      else checkpointDir.stripSuffix("/") + "/cc_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
    def materialize(df: DataFrame, name: String): DataFrame =
      if (runDir == null) df.localCheckpoint()
      else {
        val p = s"$runDir/$name"
        df.write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      }
    def drop(name: String): Unit =
      if (runDir != null) {
        val p = new org.apache.hadoop.fs.Path(s"$runDir/$name")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    // undirected edges both ways + self loops; materialized ONCE — the
    // pair list is usually the output of the full LSH pipeline, and every
    // iteration would otherwise re-execute it
    val edges = materialize(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .union(ids.select(col(idName).as("src"), col(idName).as("dst")))
        .distinct(),
      "edges")
    var labels = materialize(
      ids.select(col(idName).as("id"), col(idName).as("label")), "labels_0")
    // in local mode the superseded iteration checkpoints must be
    // unpersisted explicitly (drop() is durable-only; localCheckpoint
    // blocks are invisible to the cache manager) — same discipline as
    // [[graft.operators.Graph.pageRankFixed]]
    var lastMaterialized = labels
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      // hop: each node takes the min label among itself and its neighbors
      val hopped = edges
        .join(labels, edges("dst") === labels("id"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("label"))
      // jump (pointer doubling): label := label(label) — labels only ever
      // decrease, so the mapped label is always <= the current one
      val asMap = hopped.select(col("id").as("m_id"), col("label").as("m_label"))
      val jumped = hopped.join(asMap, hopped("label") === col("m_id"))
        .select(col("id"), col("m_label").as("label"))
      // one materialization covers both the new labels and the
      // convergence flag (aggregate-driven — no collect of the graph)
      val updated = materialize(
        labels.select(col("id").as("p_id"), col("label").as("p_label"))
          .join(jumped, col("p_id") === jumped("id"))
          .select(col("id"), col("label"),
            (col("label") =!= col("p_label")).as("changed")),
        s"labels_${i + 1}")
      converged = updated.where(col("changed")).limit(1).count() == 0
      labels = updated.select(col("id"), col("label"))
      drop(s"labels_$i")
      if (runDir == null) graft.operators.releaseLocalCheckpoint(lastMaterialized)
      lastMaterialized = updated
      i += 1
    }
    drop("edges")
    // local mode: the edge checkpoint is no longer referenced. Durable
    // mode: materialize the final labels off the run dir and delete the
    // whole cc_<uuid> directory — repeated runs must not accumulate
    // orphan checkpoints the caller cannot name.
    if (runDir == null) graft.operators.releaseLocalCheckpoint(edges)
    var out = labels.select(col("id").as(idName), col("label").as("cluster_id"))
    if (runDir != null) {
      out = out.localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(runDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    out
  }

  /** Line-level corpus deduplication (the CCNet / RefinedWeb recipe):
    * a line that occurs in at least `minDocs` DISTINCT documents is
    * boilerplate — navigation bars, cookie banners, license headers — and
    * is removed from EVERY document; the surviving lines keep their
    * original order. Returns one row per input document:
    * `(id, clean, kept_lines, dropped_lines)`, with `clean = ""` when
    * every line was boilerplate (the caller decides whether to drop
    * empties).
    *
    * Scale (100 TB): one scan of the corpus; one aggregation shuffle
    * keyed on the line text (Spark's two-phase distinct-count rewrite
    * gives map-side partials); one join of the exploded lines against the
    * common-line set — which is the Zipf HEAD of the line distribution,
    * orders of magnitude smaller than the corpus, so AQE broadcasts it;
    * one groupBy(id) shuffle to reassemble. No driver-side state.
    */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lineSep: String = "\n",
      minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    // lineSep is a LITERAL separator (it is also the rejoin string), so
    // regex-quote it for the split
    val sepRe = java.util.regex.Pattern.quote(lineSep)
    val exploded = df
      .select(col(idCol).as("id"), posexplode(split(col(textCol), sepRe)).as(Seq("pos", "line")))
    val common = exploded
      .groupBy(col("line"))
      .agg(count_distinct(col("id")).as("n_docs"))
      .where(col("n_docs") >= minDocs)
      .select(col("line"), lit(true).as("is_common"))
    // tag-then-regroup (not an anti-join) so documents whose EVERY line is
    // boilerplate still come back, as empty strings
    exploded
      .join(common, Seq("line"), "left")
      .groupBy(col("id"))
      .agg(collect_list(struct(col("pos"), col("line"),
        coalesce(col("is_common"), lit(false)).as("is_common"))).as("arr"))
      .select(
        col("id").as(idCol),
        concat_ws(lineSep,
          transform(
            filter(array_sort(col("arr")), s => !s.getField("is_common")),
            s => s.getField("line"))).as("clean"),
        size(filter(col("arr"), s => !s.getField("is_common"))).cast("long").as("kept_lines"),
        size(filter(col("arr"), s => s.getField("is_common"))).cast("long").as("dropped_lines"))
  }

  /** SimHash near-dup bucket key per document (see SimHash64): documents
    * whose simhash differs in few bits are near-duplicates. */
  def simhash(textCol: Column): Column =
    graft.operators.simhash64(split(textCol, " "))

  /** Embedding near-duplicate pairs: sign-random-projection LSH buckets,
    * then exact cosine within each bucket. Pure shuffle-join on the bucket
    * key — scales like the minhash pipeline. */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int = 8,
      dim: Int = 64,
      minCosine: Double = 0.95): DataFrame = {
    val bucketed = df.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      Similarity.srpBucket(col(vecCol), planes, dim).as("bucket"))
    val a = bucketed.as("a")
    val b = bucketed.as("b")
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.cosine(col("a.vec"), col("b.vec")).as("cos"))
      .where(col("cos") >= minCosine)
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): k-means-cluster the
    * embedding space, then compare pairs only WITHIN a cluster and mark
    * every vector that has a smaller-id cluster-mate with cosine ≥
    * `threshold` as a semantic duplicate (keep-smallest-id, the same
    * convention as the MinHash/SimHash pipelines). Unlike
    * [[embeddingNearDupPairs]] (SRP buckets — recall depends on random
    * hyperplanes), clustering gives every vector exactly one comparison
    * set and the threshold applies to true cosine within it.
    *
    * Returns one row per input vector: `(idCol, cell, n_similar,
    * is_dup)` — its cluster, how many smaller-id cluster-mates clear the
    * threshold, and the drop flag.
    *
    * Scale shape: centroids are trained on a bounded sample (driver-side
    * Lloyd on ≤ `sampleSize` rows — the exact replayable kernel IVF
    * uses) and ride into [[Similarity.cellAssignment]] as plan literals,
    * so assignment is a narrow scan-speed projection. The only wide op
    * is the self equi-join on `cell`: pair work is bounded per cluster
    * (≈ (N/k)² per cell), never all-pairs — at 100 TB, k grows with N to
    * hold the per-cell quadratic constant (SemDeDup's own recipe), and a
    * hot cell is AQE-skew-splittable because the join key is the cell.
    * Zero-norm vectors have no defined cosine: they join no pairs
    * (NULL comparison) and come back with n_similar = 0. */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int = 16,
      threshold: Double = 0.93,
      sampleSize: Int = 2048,
      iters: Int = 5): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val cents = Similarity
      .trainCentroids(df, idCol, vecCol, k, sampleSize, iters)
      .zipWithIndex.map(_.swap)
    val withCell = df.select(
      col(idCol).as("id"), col(vecCol).as("vec"),
      Similarity.cellAssignment(col(vecCol), cents).as("cell"))
    val a = withCell.as("a")
    val b = withCell.as("b")
    val dupCounts = a
      .join(b, col("a.cell") === col("b.cell") && col("b.id") < col("a.id"))
      .where(Similarity.cosine(col("a.vec"), col("b.vec")) >= threshold)
      .groupBy(col("a.id").as("id"))
      .agg(count(lit(1)).as("n_similar"))
    withCell
      .join(dupCounts, Seq("id"), "left")
      .select(
        col("id").as(idCol), col("cell"),
        coalesce(col("n_similar"), lit(0L)).as("n_similar"),
        (coalesce(col("n_similar"), lit(0L)) > 0).as("is_dup"))
  }

  /** Positional token n-grams for span detection — `(pos, gram)` after a
    * posexplode, unlike [[shingles]] (distinct sets, order-free). */
  def posGrams(textCol: Column, width: Int): Column =
    GraftSqlShim.column(
      TokenGrams(GraftSqlShim.expression(split(textCol, " ")), width))

  /** Cross-document exact duplicate-substring statistics, the
    * suffix-array-style dedup signal of Lee et al. 2021 ("Deduplicating
    * Training Data Makes Language Models Better") re-expressed as a
    * set-oriented pipeline: a token `width`-gram that occurs in more than
    * one document marks every position it covers as duplicated, and
    * maximal runs of consecutive duplicated positions are the duplicate
    * spans (a shared substring of `L ≥ width` tokens appears as a run of
    * `L - width + 1` consecutive duplicated gram starts, so `run_len =
    * last - first + width` recovers the span's token length).
    *
    * Returns one row per input document: `(doc_id, dup_grams, n_runs,
    * max_run)` — the count of duplicated gram positions, the number of
    * maximal duplicate spans, and the longest span's token length (0s for
    * documents with no cross-document duplicate substring).
    *
    * Scale shape: explode is map-side; gram doc-frequency is ONE
    * hash-partitioned aggregation whose map-side partials collapse the
    * Zipf head (a boilerplate gram repeated 10^6× leaves each input
    * partition as one row); the flag join is a shuffle equi-join on the
    * gram key, which AQE skew-splits — this is why the doc-frequency pass
    * is a groupBy + join rather than min/max window functions over
    * `partitionBy(gram)`, which would pin each hot gram to a single
    * reducer that AQE cannot split. The run merge is gaps-and-islands
    * (`pos - row_number()`) inside a per-document window — bounded by
    * document length, never corpus-wide. Within-document repetition is
    * deliberately out of scope (that's `TextOps.repetition`'s job): a
    * gram is duplicated only when two DISTINCT documents share it, which
    * `min(id) <> max(id)` decides without a count-distinct. */
  def duplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      width: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = df.select(
      col(idCol).as("id"),
      posexplode(posGrams(col(textCol), width)).as(Seq("pos", "gram")))
    val flagged = flagDupGrams(grams)
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val runs = flagged
      .withColumn("grp", col("pos") - row_number().over(byDoc))
      .groupBy(col("id"), col("grp"))
      .agg(count(lit(1)).as("c"),
        (max(col("pos")) - min(col("pos")) + width).cast("long").as("run_len"))
    val perDoc = runs
      .groupBy(col("id"))
      .agg(sum(col("c")).as("dup_grams"), count(lit(1)).as("n_runs"),
        max(col("run_len")).as("max_run"))
    df.select(col(idCol).as("doc_id"))
      .join(perDoc, col("doc_id") === col("id"), "left")
      .select(col("doc_id"),
        coalesce(col("dup_grams"), lit(0L)).as("dup_grams"),
        coalesce(col("n_runs"), lit(0L)).as("n_runs"),
        coalesce(col("max_run"), lit(0L)).as("max_run"))
  }

  /** Cross-document duplicated grams with their keeper: `(id, pos, gram)`
    * rows joined to the `(gram, mn)` set of grams seen in 2+ distinct
    * documents (`mn` = the gram's minimum document id). Shared flag pass
    * of [[duplicateSpans]] and [[removeDuplicateSpans]] — a partial-agg
    * groupBy plus an AQE-splittable equi-join on the gram key. */
  private def flagDupGrams(grams: DataFrame): DataFrame = {
    val dupGrams = grams
      .groupBy(col("gram"))
      .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
      .where(col("mn") =!= col("mx"))
      .select(col("gram"), col("mn"))
    grams.join(dupGrams, "gram")
  }

  /** The destructive half of [[duplicateSpans]]: CUT every cross-document
    * duplicate substring out of the corpus (Lee et al. 2021 apply exactly
    * this edit before training). A token is removed when any duplicated
    * gram covers it — i.e. some flagged gram start `p` satisfies
    * `p ≤ i ≤ p + width - 1`. Returns one row per document:
    * `(doc_id, clean_text, kept_tokens, removed_tokens)`; a fully
    * duplicated document keeps an empty string, not a NULL, so sinks can
    * filter on `kept_tokens > 0` without null-handling.
    *
    * Scale shape: the duplicated-gram flag pass is identical to
    * [[duplicateSpans]] (partial-agg groupBy + AQE-splittable equi-join).
    * Coverage expansion is a map-side `sequence(pos, pos+width-1)`
    * explode of FLAGGED positions only (duplicated content is the small
    * fraction in a healthy corpus); the kept-token anti-join and the
    * rebuild aggregation are both keyed by (doc, position) / doc — never
    * corpus-wide. Order is restored with a bounded per-document
    * `array_sort(collect_list(struct(pos, tok)))`, not a window sort, so
    * the rebuild is one aggregation whose state is capped by document
    * length.
    *
    * `keepFirst = true` is the paper's actual edit — AT LEAST one copy
    * of each duplicated substring survives: the lowest-id document
    * sharing a gram is its keeper, and a keeper gram PROTECTS every
    * token position it covers. A position is removed only when it is
    * covered by some duplicated gram and protected by none — so a
    * keeper's occurrence stays intact even when an overlapping
    * duplicated gram has a different (lower-id) keeper. (Removing on
    * mere coverage-by-a-foreign-keeper-gram would let two overlapping
    * grams with different keepers destroy each other's only protected
    * copy.) Extra copies may also survive in non-minimum documents
    * whose positions happen to be protected by keeper grams of
    * overlapping duplicated content — the guarantee is "never zero
    * copies", not "exactly one". `false` (the default) removes every
    * copy — the right choice for decontamination-style scrubbing where
    * the span itself is unwanted. The keeper rule is per-gram min(id),
    * which is deterministic and needs no extra pass: the doc-frequency
    * aggregate already carries min(id). */
  def removeDuplicateSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      width: Int = 8,
      keepFirst: Boolean = false): DataFrame = {
    val toks = df.select(col(idCol).as("id"), split(col(textCol), " ").as("t"))
    val grams = toks.select(
      col("id"),
      posexplode(GraftSqlShim.column(
        TokenGrams(GraftSqlShim.expression(col("t")), width))).as(Seq("pos", "gram")))
    val flaggedPos = flagDupGrams(grams)
    // explicit rename: both sides descend from `toks`, and a same-lineage
    // tokPos("id") === covered("id") degenerates to a trivially-true
    // self-comparison under Spark's ambiguous-self-join resolution
    val coveredAll = flaggedPos.select(
      col("id").as("cid"),
      explode(sequence(col("pos"), col("pos") + width - 1)).as("ci"),
      (col("id") === col("mn")).as("kf"))
    // same shuffle shape either way: one aggregation keyed by (doc, pos)
    val covered =
      if (keepFirst)
        coveredAll.groupBy(col("cid"), col("ci"))
          .agg(max(col("kf")).as("kf"))
          .where(!col("kf"))
          .select(col("cid"), col("ci"))
      else coveredAll.select(col("cid"), col("ci")).distinct()
    val tokPos = toks.select(col("id"), posexplode(col("t")).as(Seq("pos", "tok")))
    val kept = tokPos.join(covered,
        col("id") === col("cid") && col("pos") === col("ci"), "left_anti")
    val rebuilt = kept
      .groupBy(col("id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"),
        count(lit(1)).as("kept_tokens"))
    // explicit null guard: under non-ANSI sessions size(null) is the -1
    // sentinel, which would leak into removed_tokens via the coalesce
    df.select(col(idCol).as("doc_id"),
        when(col(textCol).isNotNull, size(split(col(textCol), " "))).as("n_tokens"))
      .join(rebuilt, col("doc_id") === col("id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("n_tokens") - col("kept_tokens"), col("n_tokens").cast("long"),
          lit(0L)).as("removed_tokens"))
  }

  /** Content-defined chunks of a text column (FastCDC gear-hash
    * boundaries — see [[GearCutpoints]]): one row per chunk with its
    * byte offset, length, and FNV-1a digest. Because boundaries follow
    * CONTENT, a document that shares a region with another (shifted by
    * an insertion, a prefix, a reordering) produces identical chunk
    * digests for the shared region — the primitive behind storage-level
    * dedup and shared-passage detection that fixed windows miss.
    * Narrow: one fused kernel pass + posexplode, zero Exchange. */
  def cdcChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maskBits: Int = 5,
      minLen: Int = 16,
      maxLen: Int = 64): DataFrame =
    docs.select(col(idCol),
        posexplode(GraftSqlShim.column(GearCutpoints(
          GraftSqlShim.expression(col(textCol)), maskBits, minLen, maxLen)))
          .as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx"),
        col("c.start").as("start"),
        col("c.chunk_len").as("chunk_len"),
        col("c.digest").as("digest"))

  /** Incremental chunk-level storage dedup (the restic/borg accounting,
    * done corpus-side): chunk an append batch with [[cdcChunks]] and
    * charge each document only for chunks whose digest the existing
    * store has never seen — the content-defined boundaries make shared
    * regions between a new doc and ANY stored doc (shifted or not)
    * resolve to already-stored digests. Returns per batch doc
    * `(idCol, n_chunks, n_new, bytes_total, bytes_new, dedup_ratio)`
    * where dedup_ratio = 1 − bytes_new/bytes_total (0 for an all-new
    * doc, → 1 for a doc the store already covers).
    *
    * Scale shape: the batch side is one narrow kernel scan + explode;
    * the novelty check is a digest-keyed LEFT join against the store's
    * distinct digest table (equi-join — AQE-splittable; near-uniform
    * digest keys), and the per-doc rollup is a map-side-combinable
    * groupBy. This overload re-chunks `store` (fine for one-off
    * audits); a production ingest loop persists the digest table once
    * and calls [[cdcIncrementalDedupAgainstDigests]] per batch,
    * appending the batch's new digests after ingest. */
  def cdcIncrementalDedup(
      batch: DataFrame,
      store: DataFrame,
      idCol: String,
      textCol: String,
      maskBits: Int = 5,
      minLen: Int = 16,
      maxLen: Int = 64): DataFrame =
    cdcIncrementalDedupAgainstDigests(batch,
      cdcChunks(store, idCol, textCol, maskBits, minLen, maxLen)
        .select(col("digest")),
      idCol, textCol, maskBits, minLen, maxLen)

  /** [[cdcIncrementalDedup]] against a PERSISTED digest table (one
    * `digest` column; duplicates tolerated) — the incremental form: the
    * store is never re-read, only its digests join. */
  def cdcIncrementalDedupAgainstDigests(
      batch: DataFrame,
      storedDigests: DataFrame,
      idCol: String,
      textCol: String,
      maskBits: Int = 5,
      minLen: Int = 16,
      maxLen: Int = 64): DataFrame = {
    val stored = storedDigests.select(col("digest")).distinct()
      .withColumn("__stored", lit(1L))
    cdcChunks(batch, idCol, textCol, maskBits, minLen, maxLen)
      .join(stored, Seq("digest"), "left")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("__stored").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(col("chunk_len")).cast("long").as("bytes_total"),
        sum(when(col("__stored").isNull, col("chunk_len")).otherwise(0L))
          .cast("long").as("bytes_new"))
      .withColumn("dedup_ratio",
        lit(1.0) - col("bytes_new").cast("double") /
          greatest(col("bytes_total"), lit(1L)).cast("double"))
  }

  /** [[cdcChunks]] plus cross-document sharing evidence: how many
    * DISTINCT documents contain each chunk (by digest). One digest-keyed
    * partial-agg exchange over the chunk rows plus the join back — the
    * standard "which regions are duplicated storage" query. */
  def cdcSharedChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maskBits: Int = 5,
      minLen: Int = 16,
      maxLen: Int = 64): DataFrame = {
    val chunks = cdcChunks(docs, idCol, textCol, maskBits, minLen, maxLen)
    val sharing = chunks.select(col("digest"), col(idCol))
      .distinct()
      .groupBy(col("digest"))
      .agg(count(lit(1)).as("n_docs"))
    chunks.join(sharing, Seq("digest"))
      .select(col(idCol), col("chunk_idx"), col("start"),
        col("chunk_len"), col("digest"), col("n_docs"))
  }

  /** The d+1 PassJoin segments of a string as `(la, i, sub)` structs:
    * segment `i` (1-based) of a length-`l` string under the even
    * partition — the first `k − (l mod k)` segments get `⌊l/k⌋` chars,
    * the rest one more — where `la` is the string's own length (the
    * join key that pins partner partitions to the right scheme). */
  private def passJoinSegmentsG(
      sCol: Column, lCol: Column, k: Int,
      extract: (Column, Column, Column) => Column): Column =
    transform(sequence(lit(1L), lit(k.toLong)), { i =>
      val amod = lCol % k
      val base = floor(lCol / k).cast("long")
      val leni = base + when(i > lit(k.toLong) - amod, 1L).otherwise(0L)
      val pi = (i - 1) * base + greatest(lit(0L), i - 1 - (lit(k.toLong) - amod)) + 1
      struct(lCol.as("la"), i.as("i"), extract(sCol, pi, leni).as("sub"))
    })

  private[graft] def passJoinSegments(sCol: Column, lCol: Column, k: Int): Column =
    passJoinSegmentsG(sCol, lCol, k, (s, p, l) => substr(s, p, l))

  /** Every substring of `s` that could match segment `i` of a partner
    * of length `la ∈ [max(k, lb−d), lb]` within edit distance `d`, as
    * `(la, i, sub)` structs. Two lossless prunings shrink the probe
    * set: `lensCol` (a literal array of lengths that actually occur
    * among the indexed strings) drops partner lengths nothing was
    * partitioned at — on length-homogeneous corpora that collapses the
    * d+1-value la range to ~1; and the position window is the
    * INTERSECTION of two valid bounds on the untouched segment's shift
    * δ = p − p_i: the shift bound `|δ| + |Δ − δ| ≤ d` (left edits move
    * the segment by δ, right edits absorb the remaining length change
    * Δ = lb − la), and PassJoin's multi-match-aware bound
    * `δ ∈ [max(−(i−1), Δ−(k−i)), min(i−1, Δ+(k−i))]` (Li, Deng & Feng
    * 2011, Lemma 3: if the first-untouched-segment match falls outside
    * it, a later untouched segment's match falls inside its own
    * window). Probing only `la ≤ lb` halves work again: the canonical
    * pair direction partitions the shorter string. Content duplicates
    * across positions are NOT deduped here — array_distinct over
    * struct arrays is a quadratic comparison loop, far costlier than
    * letting the downstream pair-level distinct absorb them. */
  private def passJoinProbesG(
      sCol: Column, lbCol: Column, d: Int, k: Int, lensCol: Column,
      extract: (Column, Column, Column) => Column): Column =
    flatten(transform(
      filter(sequence(greatest(lit(k.toLong), lbCol - d), lbCol),
        la => array_contains(lensCol, la)), { la =>
        val amod = la % k
        val base = floor(la / k).cast("long")
        val delta = lbCol - la
        val slack = floor((lit(d.toLong) - delta) / 2).cast("long")
        flatten(transform(sequence(lit(1L), lit(k.toLong)), { i =>
          val leni = base + when(i > lit(k.toLong) - amod, 1L).otherwise(0L)
          val pi = (i - 1) * base + greatest(lit(0L), i - 1 - (lit(k.toLong) - amod)) + 1
          val dLo = greatest(lit(0L) - slack, lit(1L) - i, delta - (lit(k.toLong) - i))
          val dHi = least(delta + slack, i - 1, delta + (lit(k.toLong) - i))
          val lo = greatest(lit(1L), pi + dLo)
          val hi = least(lbCol - leni + 1, pi + dHi)
          transform(filter(sequence(lo, greatest(lo, hi)), p => p <= hi),
            p => struct(la.as("la"), i.as("i"), extract(sCol, p, leni).as("sub")))
        }))
      }))

  private[graft] def passJoinProbes(
      sCol: Column, lbCol: Column, d: Int, k: Int, lensCol: Column): Column =
    passJoinProbesG(sCol, lbCol, d, k, lensCol, (s, p, l) => substr(s, p, l))

  /** CROSS-side probes: partner lengths LONGER than the probing string
    * are reachable too (`la ∈ [max(k, lb−d), lb+d]`) — the self-join
    * variant restricts to `la ≤ lb` because the canonical pair
    * direction makes the other half redundant there; a batch-vs-corpus
    * screen has no such symmetry. The per-position window formulas are
    * sign-correct as written: for Δ = lb − la < 0 the shift bound
    * δ ∈ [−slack, Δ+slack] evaluates to exactly the true
    * [−(d+|Δ|)/2, (d−|Δ|)/2] interval, and PassJoin's multi-match
    * bound (Li, Deng & Feng 2011, Lemma 3) is stated for the full
    * [lb−d, lb+d] partner range. */
  private def passJoinProbesCrossG(
      sCol: Column, lbCol: Column, d: Int, k: Int, lensCol: Column,
      extract: (Column, Column, Column) => Column): Column =
    flatten(transform(
      filter(sequence(greatest(lit(k.toLong), lbCol - d), lbCol + d),
        la => array_contains(lensCol, la)), { la =>
        val amod = la % k
        val base = floor(la / k).cast("long")
        val delta = lbCol - la
        val slack = floor((lit(d.toLong) - delta) / 2).cast("long")
        flatten(transform(sequence(lit(1L), lit(k.toLong)), { i =>
          val leni = base + when(i > lit(k.toLong) - amod, 1L).otherwise(0L)
          val pi = (i - 1) * base + greatest(lit(0L), i - 1 - (lit(k.toLong) - amod)) + 1
          val dLo = greatest(lit(0L) - slack, lit(1L) - i, delta - (lit(k.toLong) - i))
          val dHi = least(delta + slack, i - 1, delta + (lit(k.toLong) - i))
          val lo = greatest(lit(1L), pi + dLo)
          val hi = least(lbCol - leni + 1, pi + dHi)
          transform(filter(sequence(lo, greatest(lo, hi)), p => p <= hi),
            p => struct(la.as("la"), i.as("i"), extract(sCol, p, leni).as("sub")))
        }))
      }))

  private def passJoinProbesCross(
      sCol: Column, lbCol: Column, d: Int, k: Int, lensCol: Column): Column =
    passJoinProbesCrossG(sCol, lbCol, d, k, lensCol, (s, p, l) => substr(s, p, l))

  /** Edit-distance similarity self-join: every pair of rows whose
    * strings are within Levenshtein distance `maxDist`, with the exact
    * distance — the string-identity dedup primitive (titles, URLs,
    * product names, OCR variants) that shingle-Jaccard misses because a
    * handful of single-character edits barely moves token-set overlap.
    *
    * Candidate generation is PassJoin partitioning (Li, Deng & Feng,
    * "PASS-JOIN: a partition-based method for similarity joins",
    * VLDB 2011): each string splits into `d+1` disjoint segments; at
    * most `d` edits can touch at most `d` of them, so any partner
    * within distance `d` contains at least one segment VERBATIM, at a
    * position the shift bound confines to `d+1` candidates — candidates
    * are therefore an exact-segment equi-join, lossless by pigeonhole.
    * Segment keys stay selective even on boilerplate-saturated corpora
    * where q-gram prefix filtering collapses (a ⌈len/(d+1)⌉-char
    * verbatim run is far rarer than any q-gram). Strings shorter than
    * `d+1` chars can't donate non-empty segments and are routed through
    * a length-banded pass (buckets of width `d+1`; partners within
    * distance `d` differ by at most one bucket) — exact but all-pairs
    * within a band, the rare-tail contract. Survivors of both passes
    * get a length filter (`||a|−|b|| ≤ d`) and a threshold-bounded
    * Levenshtein verify (early-exits past `maxDist`, so each check is
    * O(d·len), not O(len²)).
    *
    * Returns `(id_a, id_b, dist)`, `id_a < id_b`, one row per verified
    * pair. Scale shape: segments and probe substrings are map-side
    * explodes (≤ (d+1)² probes per string per partner length);
    * candidates are `(la, i, sub)`-keyed equi-joins (AQE
    * skew-splittable, never a cartesian); the pair `distinct` and the
    * two string-fetch joins are id-keyed; verification is a map-side
    * expression. */
  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int): DataFrame = {
    val (out, strs) = editDistancePlan(df, idCol, strCol, maxDist)
    try out.localCheckpoint(true) finally strs.unpersist()
  }

  /** The lazy plan behind [[editDistancePairs]] plus the persisted
    * `(vid, s, len)` frame the caller must unpersist — split out so
    * PlanQualitySpec can pin the pre-checkpoint plan shape. */
  private[graft] def editDistancePlan(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int): (DataFrame, DataFrame) = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val k = maxDist + 1
    // repartition by id before persisting: the segment/probe explodes and
    // the Levenshtein verify are the compute-heavy map stages, and input
    // file layout (locally: ONE small parquet split) must not cap their
    // parallelism — one cheap exchange of the pruned (id, string) pairs
    // buys evenly spread downstream work
    val strs = df
      .select(col(idCol).as("vid"), col(strCol).cast("string").as("s"))
      .where(col("s").isNotNull)
      .withColumn("len", length(col("s")).cast("long"))
      .repartition(col("vid"))
      .persist()
    // PassJoin pass: both endpoints long enough for non-empty segments
    val longs = strs.where(col("len") >= k)
    // distinct lengths of the indexed strings, shipped to the probe
    // generator as a literal: partner lengths nothing was partitioned
    // at produce no probes. The collect is bounded by the string-length
    // DOMAIN (≤ max |s| values), not the row count — safe by
    // construction at any corpus size.
    val lens = longs.select(col("len")).distinct()
      .collect().map(_.getLong(0)).sorted
    val lensLit =
      if (lens.isEmpty) array().cast("array<bigint>") else lit(lens)
    val idx = longs
      .select(col("vid").as("iid"),
        explode(passJoinSegments(col("s"), col("len"), k)).as("seg"))
      .select(col("iid"), col("seg.la"), col("seg.i"), col("seg.sub"))
    val prb = longs
      .select(col("vid").as("pid"),
        explode(passJoinProbes(col("s"), col("len"), maxDist, k, lensLit))
          .as("pr"))
      .select(col("pid"), col("pr.la"), col("pr.i"), col("pr.sub"))
    // the la key pins partner length (and with it the partition scheme),
    // so the length filter is built into the join itself
    val candLong = idx.join(prb, Seq("la", "i", "sub"))
      .where(col("iid") =!= col("pid"))
      .select(least(col("iid"), col("pid")).as("id_a"),
        greatest(col("iid"), col("pid")).as("id_b"))
    // banded pass: everything short enough to pair with a sub-k string
    // (length filter: the longer endpoint is < k + maxDist)
    val shorts = strs.where(col("len") < k + maxDist)
      .select(col("vid"), (col("len") / k).cast("long").as("b"))
    val candShort = shorts
      .join(shorts.select(col("vid").as("ovid"),
          explode(array(col("b") - 1, col("b"), col("b") + 1)).as("b")), "b")
      .where(col("vid") =!= col("ovid"))
      .select(least(col("vid"), col("ovid")).as("id_a"),
        greatest(col("vid"), col("ovid")).as("id_b"))
    val cand = candLong.unionByName(candShort).distinct()
    val out = cand
      .join(strs.select(col("vid").as("id_a"), col("s").as("s_a"),
        col("len").as("len_a")), "id_a")
      .join(strs.select(col("vid").as("id_b"), col("s").as("s_b"),
        col("len").as("len_b")), "id_b")
      .where(abs(col("len_a") - col("len_b")) <= maxDist)
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b"), maxDist).cast("long"))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
    (out, strs)
  }

  /** Cross-corpus edit-distance INGESTION SCREEN: for each batch row,
    * is any CORPUS string within Levenshtein distance `maxDist`, and
    * which is nearest? The shape every incremental dedup pass needs —
    * the corpus is indexed (segments), the batch probes it, and the
    * corpus×corpus quadrant is never generated (the
    * [[incrementalNearDup]] asymmetry, for edit distance).
    *
    * Candidates: corpus rows with ≥ k tokens of length donate PassJoin
    * segments; batch rows probe with substrings for partner lengths
    * `la ∈ [lb−d, lb+d]` ([[passJoinProbesCross]] — both directions,
    * unlike the self-join's canonical `la ≤ lb`). Pairs where either
    * side is shorter than k+d chars ride a length-banded pass (bands of
    * width k; partners within d differ by ≤ 1 band). Both candidate
    * sets verify with the threshold-bounded `levenshtein`, then one
    * groupBy(batch id) keeps the minimum (ties by smallest corpus id).
    *
    * Returns one row PER BATCH ROW: `(id, matched, min_dist, match_id)`
    * — min_dist/match_id NULL when nothing is within range; a batch row
    * with a NULL string matches nothing (matched=false), it is NOT
    * dropped. Scale
    * shape: segment/probe explodes are map-side; candidates are
    * `(la, i, sub)`-keyed equi-joins; the min is one partial-agg
    * exchange on the batch id. The corpus is scanned twice (segments +
    * verify fetch), never self-joined. */
  def editDistanceScreen(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int): DataFrame = {
    val (out, b, c) = editDistanceScreenPlan(batch, corpus, idCol, strCol, maxDist)
    try out.localCheckpoint(true) finally { b.unpersist(); c.unpersist() }
  }

  /** The lazy plan behind [[editDistanceScreen]] plus the two persisted
    * frames the caller must unpersist — split out so PlanQualitySpec
    * can pin the pre-checkpoint plan shape. */
  private[graft] def editDistanceScreenPlan(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int): (DataFrame, DataFrame, DataFrame) =
    screenPlanG(batch, corpus, idCol, strCol, maxDist,
      seqOf = _.cast("string"),
      lenOf = s => length(s).cast("long"),
      extract = (s, p, l) => substr(s, p, l),
      verify = (a, b) => levenshtein(a, b, maxDist).cast("long"))

  /** Token-sequence variant of [[editDistanceScreen]]: the nearest
    * corpus TOKEN sequence within whole-token edit distance `maxDist`
    * per batch row — the ingestion screen for paraphrase-level dedup
    * (same [[tokenEditDistancePairs]] semantics, same batch-vs-corpus
    * asymmetry). `toksCol` must be array<string> on both frames. */
  def tokenEditDistanceScreen(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      toksCol: String,
      maxDist: Int): DataFrame = {
    val (out, b, c) = tokenEditDistanceScreenPlan(batch, corpus, idCol, toksCol, maxDist)
    try out.localCheckpoint(true) finally { b.unpersist(); c.unpersist() }
  }

  private[graft] def tokenEditDistanceScreenPlan(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      toksCol: String,
      maxDist: Int): (DataFrame, DataFrame, DataFrame) =
    screenPlanG(batch, corpus, idCol, toksCol, maxDist,
      seqOf = identity,
      lenOf = s => size(s).cast("long"),
      extract = (s, p, l) => slice(s, p.cast("int"), l.cast("int")),
      verify = (a, b) => GraftSqlShim.column(TokenLevenshtein(
        GraftSqlShim.expression(a), GraftSqlShim.expression(b), maxDist)).cast("long"))

  private def sliceTok(s: Column, p: Column, l: Column): Column =
    slice(s, p.cast("int"), l.cast("int"))

  /** The token-sequence cross-probe explode, exposed for the STREAMING
    * screen ([[graft.streaming.JsonStream.editDistScreenToBatch]]) so
    * both faces share the PassJoin formulas verbatim. */
  private[graft] def tokenScreenProbes(
      bs: Column, blen: Column, maxDist: Int, lensLit: Column): Column =
    passJoinProbesCrossG(bs, blen, maxDist, maxDist + 1, lensLit, sliceTok)

  /** Persist the CORPUS side of [[tokenEditDistanceScreen]] once — the
    * index-anchored form of the ingestion screen: repeated batches stop
    * paying the corpus segment explode, the distinct-length scan, and
    * the short-side band derivation on every call (the
    * [[graft.operators.TextOps.buildInvertedIndex]] discipline applied
    * to the PassJoin segment index). Four tables under `path`:
    *
    *  - `segs`: one row per corpus PassJoin segment
    *    `(cid, la, i, sub)`, PARTITIONED BY `(lap, sbk)` — `lap` = la
    *    as int (a batch only probes partner lengths within
    *    `[blen−d, blen+d]` of its own lengths), `sbk` = a Murmur3
    *    bucket of the segment content (`pmod(hash(sub), subBuckets)`):
    *    the probe side computes the same bucket per probe, so a
    *    TRICKLE batch prunes to the handful of (length, content-bucket)
    *    directories its probes can possibly collide in — on a
    *    length-homogeneous corpus (where lap alone prunes nothing)
    *    this is what keeps a 10-row batch from scanning the index.
    *  - `bands`: the short-sequence band join side (`clen < k+d`), the
    *    ±1 band explode baked in.
    *  - `seqs`: `(cid, cs, clen)` for the id-keyed verify fetch.
    *  - `lens` / `meta`: the distinct segment lengths (probe pruning
    *    literal) and `(max_dist)` — the screen re-derives nothing.
    *
    * `maxDist` is baked into the segment layout (k = d+1 segments), so
    * it is fixed at build time; screening at a different d needs its
    * own index (the IVF-nlist trade). */
  def buildTokenScreenIndex(
      corpus: DataFrame,
      idCol: String,
      toksCol: String,
      maxDist: Int,
      path: String,
      subBuckets: Int = 32): Unit = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(subBuckets > 0, s"subBuckets must be positive, got $subBuckets")
    val k = maxDist + 1
    val spark = corpus.sparkSession
    val c = corpus
      .select(col(idCol).as("cid"), col(toksCol).as("cs"))
      .where(col("cs").isNotNull)
      .withColumn("clen", size(col("cs")).cast("long"))
      .persist()
    try {
      spark.range(1).select(lit(maxDist).as("max_dist"),
          lit(subBuckets).as("sub_buckets"))
        .write.mode("overwrite").parquet(s"$path/meta")
      c.write.mode("overwrite").parquet(s"$path/seqs")
      val cLong = c.where(col("clen") >= k)
      cLong.select(col("clen")).distinct()
        .write.mode("overwrite").parquet(s"$path/lens")
      cLong
        .select(col("cid"),
          explode(passJoinSegmentsG(col("cs"), col("clen"), k, sliceTok)).as("seg"))
        .select(col("cid"), col("seg.la"), col("seg.i"), col("seg.sub"),
          col("seg.la").cast("int").as("lap"),
          pmod(hash(col("seg.sub")), lit(subBuckets)).as("sbk"))
        .repartition(col("lap"), col("sbk"))
        .write.mode("overwrite").partitionBy("lap", "sbk").parquet(s"$path/segs")
      val cBand = (col("clen") / k).cast("long")
      c.where(col("clen") < k + maxDist)
        .select(col("cid"), explode(array(cBand - 1, cBand, cBand + 1)).as("bb"))
        .write.mode("overwrite").parquet(s"$path/bands")
    } finally c.unpersist()
  }

  /** Append a NEW document batch to an existing [[buildTokenScreenIndex]]
    * layout — the ingestion companion ([[graft.operators.TextOps.appendToInvertedIndex]]'s
    * convention): new segments land in the same (lap, sbk) partition
    * directories via parquet append, bands and seqs accumulate rows,
    * and the distinct-lengths table is rewritten with the union through
    * the crash-safe backup-rename swap (it is the one table an append
    * cannot extend blindly — probes prune on it, and a missing new
    * length would silently drop candidates). Batch doc ids MUST be new
    * (screen + filter with [[tokenEditDistanceScreenIndexed]] first —
    * the screen-then-ingest loop this exists for). Screens over an
    * appended index equal a from-scratch build (spec-pinned): every
    * query-time quantity is per-row (segments, bands, sequences) or a
    * distinct set (lens). */
  def appendToTokenScreenIndex(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      path: String): Unit = {
    val spark = df.sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val maxDist = meta.getAs[Int]("max_dist")
    val subBuckets = meta.getAs[Int]("sub_buckets")
    val k = maxDist + 1
    val c = df
      .select(col(idCol).as("cid"), col(toksCol).as("cs"))
      .where(col("cs").isNotNull)
      .withColumn("clen", size(col("cs")).cast("long"))
      .persist()
    try {
      c.write.mode("append").parquet(s"$path/seqs")
      val cLong = c.where(col("clen") >= k)
      cLong
        .select(col("cid"),
          explode(passJoinSegmentsG(col("cs"), col("clen"), k, sliceTok)).as("seg"))
        .select(col("cid"), col("seg.la"), col("seg.i"), col("seg.sub"),
          col("seg.la").cast("int").as("lap"),
          pmod(hash(col("seg.sub")), lit(subBuckets)).as("sbk"))
        .repartition(col("lap"), col("sbk"))
        .write.mode("append").partitionBy("lap", "sbk").parquet(s"$path/segs")
      val cBand = (col("clen") / k).cast("long")
      c.where(col("clen") < k + maxDist)
        .select(col("cid"), explode(array(cBand - 1, cBand, cBand + 1)).as("bb"))
        .write.mode("append").parquet(s"$path/bands")
      val lensTmp = s"$path/lens__append_tmp"
      spark.read.parquet(s"$path/lens")
        .unionByName(cLong.select(col("clen")))
        .distinct()
        .write.mode("overwrite").parquet(lensTmp)
      TextOps.swapDirs(spark, lensTmp, s"$path/lens")
    } finally c.unpersist()
  }

  /** [[tokenEditDistanceScreen]] against a [[buildTokenScreenIndex]]
    * layout: identical rows (shared verify kernel, same candidate
    * coverage argument — the persisted tables are exactly the frames
    * the one-shot plan derives), but the corpus is never re-scanned or
    * re-exploded. The `segs` read is PARTITION-PRUNED on both levels —
    * reachable partner lengths AND the probes' content buckets
    * (collected from the bounded probe set) — so per-batch cost scales
    * with the batch and its matched index partitions rather than the
    * corpus; a large batch whose probes cover every bucket degrades
    * gracefully to one full index-partition join (still cheaper than
    * the one-shot screen's corpus re-derivation). */
  def tokenEditDistanceScreenIndexed(
      batch: DataFrame,
      idCol: String,
      toksCol: String,
      path: String): DataFrame = {
    val spark = batch.sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val maxDist = meta.getAs[Int]("max_dist")
    val subBuckets = meta.getAs[Int]("sub_buckets")
    val k = maxDist + 1
    val b = batch
      .select(col(idCol).as("bid"), col(toksCol).as("bs"))
      .where(col("bs").isNotNull)
      .withColumn("blen", size(col("bs")).cast("long"))
      .repartition(col("bid"))
      .persist()
    val prb = {
      val lens = spark.read.parquet(s"$path/lens")
        .collect().map(_.getLong(0)).sorted
      val lensLit =
        if (lens.isEmpty) array().cast("array<bigint>") else lit(lens)
      b.where(col("blen") >= k)
        .select(col("bid"),
          explode(passJoinProbesCrossG(col("bs"), col("blen"), maxDist, k,
            lensLit, sliceTok)).as("pr"))
        .select(col("bid"), col("pr.la"), col("pr.i"), col("pr.sub"),
          col("pr.la").cast("int").as("lap"),
          pmod(hash(col("pr.sub")), lit(subBuckets)).as("sbk"))
        .persist()
    }
    try {
      // the probes' reachable (length, content-bucket) partition set —
      // bounded by the probe count, collected so BOTH partition levels
      // prune at plan time (a trickle batch touches a handful of dirs
      // even on a length-homogeneous corpus)
      val parts = prb.select(col("lap"), col("sbk")).distinct()
        .collect().map(r => (r.getInt(0), r.getInt(1)))
      val laSet = parts.map(_._1).distinct
      val sbkSet = parts.map(_._2).distinct
      val segs = spark.read.parquet(s"$path/segs")
        .where(
          if (parts.isEmpty) lit(false)
          else col("lap").isin(laSet: _*) && col("sbk").isin(sbkSet: _*))
        .select(col("cid"), col("la"), col("i"), col("sub"),
          col("lap"), col("sbk"))
      val candSeg = segs
        .join(prb, Seq("lap", "sbk", "la", "i", "sub"))
        .select(col("bid"), col("cid"))
      val bShort = b.where(col("blen") < k + maxDist)
        .select(col("bid"), (col("blen") / k).cast("long").as("bb"))
      val candBand = bShort
        .join(spark.read.parquet(s"$path/bands"), "bb")
        .select(col("bid"), col("cid"))
      val cand = candSeg.unionByName(candBand).distinct()
      val verified = cand
        .join(b.select(col("bid"), col("bs"), col("blen")), "bid")
        .join(spark.read.parquet(s"$path/seqs"), "cid")
        .where(abs(col("blen") - col("clen")) <= maxDist)
        .withColumn("dist", GraftSqlShim.column(TokenLevenshtein(
          GraftSqlShim.expression(col("bs")),
          GraftSqlShim.expression(col("cs")), maxDist)).cast("long"))
        .where(col("dist") >= 0 && col("dist") <= maxDist)
        .groupBy(col("bid"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("bid"), col("m.dist").as("min_dist"),
          col("m.cid").as("match_id"))
      // one row PER BATCH ROW including NULL sequences (screenPlanG's
      // contract, verbatim)
      batch.select(col(idCol))
        .join(verified.withColumnRenamed("bid", idCol), Seq(idCol), "left")
        .select(col(idCol), col("min_dist").isNotNull.as("matched"),
          col("min_dist"), col("match_id"))
        .localCheckpoint(true)
    } finally { prb.unpersist(); b.unpersist() }
  }

  /** The shared batch-vs-corpus screen core — sequence type abstracted
    * behind (seqOf, lenOf, extract, verify); see [[editDistanceScreen]]
    * for the candidate/coverage argument, which is type-agnostic. */
  private def screenPlanG(
      batch: DataFrame,
      corpus: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      seqOf: Column => Column,
      lenOf: Column => Column,
      extract: (Column, Column, Column) => Column,
      verify: (Column, Column) => Column): (DataFrame, DataFrame, DataFrame) = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val k = maxDist + 1
    val b = batch
      .select(col(idCol).as("bid"), seqOf(col(strCol)).as("bs"))
      .where(col("bs").isNotNull)
      .withColumn("blen", lenOf(col("bs")))
      .repartition(col("bid"))
      .persist()
    val c = corpus
      .select(col(idCol).as("cid"), seqOf(col(strCol)).as("cs"))
      .where(col("cs").isNotNull)
      .withColumn("clen", lenOf(col("cs")))
      .persist()
    try {
      val cLong = c.where(col("clen") >= k)
      val lens = cLong.select(col("clen")).distinct()
        .collect().map(_.getLong(0)).sorted
      val lensLit =
        if (lens.isEmpty) array().cast("array<bigint>") else lit(lens)
      val idx = cLong
        .select(col("cid"),
          explode(passJoinSegmentsG(col("cs"), col("clen"), k, extract)).as("seg"))
        .select(col("cid"), col("seg.la"), col("seg.i"), col("seg.sub"))
      val prb = b.where(col("blen") >= k)
        .select(col("bid"),
          explode(passJoinProbesCrossG(col("bs"), col("blen"), maxDist, k,
            lensLit, extract)).as("pr"))
        .select(col("bid"), col("pr.la"), col("pr.i"), col("pr.sub"))
      val candSeg = idx.join(prb, Seq("la", "i", "sub"))
        .select(col("bid"), col("cid"))
      // banded pass: covers exactly the pairs the segment pass can't —
      // a side shorter than k donates no segments/probes, and any
      // within-d partner of a sub-k string is itself < k+d, so both
      // endpoints land here; bands of width k differ by at most one
      val bShort = b.where(col("blen") < k + maxDist)
        .select(col("bid"), (col("blen") / k).cast("long").as("bb"))
      val cBand = (col("clen") / k).cast("long")
      val cShort = c.where(col("clen") < k + maxDist)
        .select(col("cid"),
          explode(array(cBand - 1, cBand, cBand + 1)).as("bb"))
      val candBand = bShort.join(cShort, "bb").select(col("bid"), col("cid"))
      val cand = candSeg.unionByName(candBand).distinct()
      val verified = cand
        .join(b.select(col("bid"), col("bs"), col("blen")), "bid")
        .join(c.select(col("cid"), col("cs"), col("clen")), "cid")
        .where(abs(col("blen") - col("clen")) <= maxDist)
        .withColumn("dist", verify(col("bs"), col("cs")))
        .where(col("dist") >= 0 && col("dist") <= maxDist)
        .groupBy(col("bid"))
        .agg(min(struct(col("dist"), col("cid"))).as("m"))
        .select(col("bid"), col("m.dist").as("min_dist"),
          col("m.cid").as("match_id"))
      // one row PER BATCH ROW — including rows whose sequence is NULL,
      // which can match nothing and come back matched=false rather than
      // silently vanishing from the screen's answer
      val out = batch.select(col(idCol))
        .join(verified.withColumnRenamed("bid", idCol), Seq(idCol), "left")
        .select(col(idCol), col("min_dist").isNotNull.as("matched"),
          col("min_dist"), col("match_id"))
      (out, b, c)
    } catch { case t: Throwable => b.unpersist(); c.unpersist(); throw t }
  }

  /** TOKEN-level edit-distance similarity self-join: every pair of rows
    * whose token SEQUENCES are within Levenshtein distance `maxDist`
    * where the unit edit inserts/deletes/substitutes a whole token —
    * the paraphrase-dedup distance between shingle-Jaccard (order-
    * blind: a reshuffled sentence scores 1.0) and char edit distance
    * (a swapped word costs its whole character length): "the quick
    * brown fox" vs "the fast brown fox" is distance 1 here.
    *
    * Same PassJoin partitioning as [[editDistancePairs]] (Li, Deng &
    * Feng, VLDB 2011), applied to token arrays: the sequence splits
    * into d+1 disjoint token SEGMENTS (subarrays), pigeonhole puts one
    * verbatim in any partner within distance d, and candidates come
    * from an exact equi-join on the `(la, i, subarray)` key — Spark
    * hashes/compares array<string> keys natively, so the join is as
    * shuffle-friendly as the char variant's substring key. Sequences
    * shorter than d+1 tokens route through the same length-banded
    * pass. Verification is the banded token DP ([[TokenLevenshtein]],
    * O(d·n) with early exit).
    *
    * `toksCol` must be array<string>. Returns (id_a, id_b, dist),
    * id_a < id_b, one row per verified pair. Scale shape identical to
    * the char variant: map-side segment/probe explodes (≤ (d+1)²
    * probes per row per partner length), fine-grained equi-join keys
    * (AQE skew-splittable, never a cartesian), id-keyed fetch joins,
    * map-side verify. */
  def tokenEditDistancePairs(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      maxDist: Int): DataFrame = {
    val (out, toks) = tokenEditDistancePlan(df, idCol, toksCol, maxDist)
    try out.localCheckpoint(true) finally toks.unpersist()
  }

  /** The lazy plan behind [[tokenEditDistancePairs]] plus the persisted
    * `(vid, s, len)` frame the caller must unpersist. */
  private[graft] def tokenEditDistancePlan(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      maxDist: Int): (DataFrame, DataFrame) = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    val k = maxDist + 1
    val sliceTok = (s: Column, p: Column, l: Column) =>
      slice(s, p.cast("int"), l.cast("int"))
    val toks = df
      .select(col(idCol).as("vid"), col(toksCol).as("s"))
      .where(col("s").isNotNull)
      .withColumn("len", size(col("s")).cast("long"))
      .repartition(col("vid"))
      .persist()
    val longs = toks.where(col("len") >= k)
    // distinct sequence lengths as a probe-pruning literal — bounded by
    // the token-count DOMAIN, not the row count (same argument as the
    // char variant)
    val lens = longs.select(col("len")).distinct()
      .collect().map(_.getLong(0)).sorted
    val lensLit =
      if (lens.isEmpty) array().cast("array<bigint>") else lit(lens)
    val idx = longs
      .select(col("vid").as("iid"),
        explode(passJoinSegmentsG(col("s"), col("len"), k, sliceTok)).as("seg"))
      .select(col("iid"), col("seg.la"), col("seg.i"), col("seg.sub"))
    val prb = longs
      .select(col("vid").as("pid"),
        explode(passJoinProbesG(col("s"), col("len"), maxDist, k, lensLit, sliceTok))
          .as("pr"))
      .select(col("pid"), col("pr.la"), col("pr.i"), col("pr.sub"))
    val candLong = idx.join(prb, Seq("la", "i", "sub"))
      .where(col("iid") =!= col("pid"))
      .select(least(col("iid"), col("pid")).as("id_a"),
        greatest(col("iid"), col("pid")).as("id_b"))
    val shorts = toks.where(col("len") < k + maxDist)
      .select(col("vid"), (col("len") / k).cast("long").as("b"))
    val candShort = shorts
      .join(shorts.select(col("vid").as("ovid"),
          explode(array(col("b") - 1, col("b"), col("b") + 1)).as("b")), "b")
      .where(col("vid") =!= col("ovid"))
      .select(least(col("vid"), col("ovid")).as("id_a"),
        greatest(col("vid"), col("ovid")).as("id_b"))
    val cand = candLong.unionByName(candShort).distinct()
    val out = cand
      .join(toks.select(col("vid").as("id_a"), col("s").as("s_a"),
        col("len").as("len_a")), "id_a")
      .join(toks.select(col("vid").as("id_b"), col("s").as("s_b"),
        col("len").as("len_b")), "id_b")
      .where(abs(col("len_a") - col("len_b")) <= maxDist)
      .withColumn("dist", GraftSqlShim.column(TokenLevenshtein(
        GraftSqlShim.expression(col("s_a")),
        GraftSqlShim.expression(col("s_b")), maxDist)).cast("long"))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
    (out, toks)
  }
}
