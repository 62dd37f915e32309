package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * End-to-end training-data curation: the composition a 100 TB pipeline
 * actually runs, in one declarative flow —
 *
 *   annotate (stats, quality, language, fingerprint)   narrow, scan-speed
 *   → exact dedup        (one shuffle on content digest)
 *   → near dedup         (MinHash LSH; shuffle on band buckets)
 *   → quality filter     (narrow)
 *
 * Every stage is a DataFrame transform: no driver-side loops, no
 * collects; the only shuffles are the two dedup keys and they are both
 * fine-grained hash keys (AQE-splittable).
 */
object Curation {

  /** Per-document annotations used by filtering and audit. Tokenizes once
    * and derives every statistic from the shared columns (see
    * TextOps.stopwordRatioOf). */
  def annotate(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
        col(idCol),
        col(textCol),
        TextOps.charLength(col(textCol)).as("n_chars_calc"),
        TextOps.tokens(col(textCol)).as("toks"),
        TextOps.punctRatio(col(textCol)).as("punct_ratio"),
        TextOps.fingerprint(col(textCol)).as("fp"))
      .select(
        col(idCol),
        col(textCol),
        col("n_chars_calc"),
        size(col("toks")).cast("long").as("n_tokens"),
        TextOps.stopwordRatioOf(col("toks")).as("stopword_ratio"),
        TextOps.qualityScoreOf(col("n_chars_calc"), col("toks"),
          col("punct_ratio")).as("quality"),
        TextOps.langIdOf(col("toks")).as("pred_lang"),
        col("fp"))

  /** Deterministic weighted source mixing for training-data recipes: each
    * document is kept with its source's probability, decided by a
    * multiplicative hash of its id — NOT random sampling, so the mix is
    * bit-reproducible across runs, engines, and partitionings (a property
    * Bernoulli `sample()` cannot give). Weights outside [0,1] clamp.
    *
    * The bucket takes HIGH bits of the product (a low-bits modulus would
    * depend only on id mod 1000, collapsing block-allocated id schemes
    * onto a few buckets). The multiply runs in the MixBucket kernel with
    * mod-2^64 wraparound, so snowflake-scale ids (~10^18) are fine —
    * in-SQL `id * 2654435761` would be an ANSI ARITHMETIC_OVERFLOW at
    * runtime for ids above ~3.5e9 (Knuth multiplier). */
  def mixSources(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      weights: Map[String, Double],
      salt: Long = 9973L,
      maxSources: Int = 256): DataFrame = {
    require(maxSources >= 1, s"maxSources must be >= 1, got $maxSources")
    // the weight map rides the plan as ONE map literal probed with
    // element_at — constant expression depth no matter how many sources
    // (a per-source when-chain overflows the analyzer stack in the
    // hundreds); maxSources still bounds the literal a caller can inline
    // — a genuinely huge rate table belongs in a broadcast join instead
    require(weights.size <= maxSources,
      s"weights has ${weights.size} sources, more than maxSources=" +
        s"$maxSources — inline map literals this large belong in a " +
        "broadcast-joined rate table")
    val bucket = mix_bucket(col(idCol).cast("long"), 2654435761L, salt, 20, 1000)
    val clamped: Map[String, Double] = weights.map { case (src, w) =>
      src -> math.max(0.0, math.min(1.0, w)) * 1000.0
    }
    val keepPerMille =
      if (clamped.isEmpty) lit(0.0)
      else coalesce(element_at(typedlit(clamped), col(sourceCol)), lit(0.0))
    docs.where(bucket < keepPerMille)
  }

  /** Temperature-scaled source mixing (the multilingual/multi-source
    * rebalancing recipe of XLM-R / mT5-style pipelines): sampling
    * probability per source ∝ (n_s/N)^alpha, normalized so the SMALLEST
    * source keeps everything — keep-rate_s = (n_min/n_s)^(1−alpha).
    * alpha = 1 reproduces natural proportions (keep all); alpha → 0
    * approaches uniform over sources. Selection reuses mixSources'
    * deterministic id-hash, so the sampled corpus is bit-reproducible.
    *
    * The per-source counts are a tiny bounded-cardinality aggregate
    * (sources are a dimension, like centroids) collected driver-side —
    * `maxSources` guards the collect, so passing a high-cardinality
    * column (a domain, a URL) fails loudly instead of OOMing the driver;
    * the corpus itself is touched only by mixSources' narrow filter.
    * At alpha = 0.5 (the common T=2 recipe, and the default) the rate is
    * sqrt(n_min/n_s): IEEE sqrt and division are correctly rounded in
    * every engine, so the thresholds — and therefore the kept set — are
    * value-exact against the SQL oracle. Other alphas go through
    * math.pow, whose last-ulp rounding is libm-specific (fine in
    * production, not oracle-pinned). */
  def mixSourcesTemperature(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      alpha: Double = 0.5,
      salt: Long = 9973L,
      maxSources: Int = 256): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(maxSources >= 1, s"maxSources must be >= 1, got $maxSources")
    val rows = docs
      .groupBy(col(sourceCol)).count()
      .limit(maxSources + 1).collect()
    require(rows.length <= maxSources,
      s"source column '$sourceCol' has more than maxSources=$maxSources " +
        "distinct values — temperature mixing collects one count per " +
        "source; group by a coarser source label, or raise maxSources " +
        "only if the counts fit the driver")
    val counts: Map[String, Long] =
      rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "no sources to mix")
    val nMin = counts.values.min
    val weights = counts.map { case (src, n) =>
      val ratio = nMin.toDouble / n.toDouble
      src -> (if (alpha == 0.5) math.sqrt(ratio) else math.pow(ratio, 1.0 - alpha))
    }
    mixSources(docs, idCol, sourceCol, weights, salt, maxSources)
  }

  /** Deterministic stratified sampling: keep up to `perStratum` documents
    * per stratum, chosen by multiplicative-hash order of the id (MixBucket
    * with a wide bucket space) with the id itself as tie-break — a
    * reproducible pseudo-random sample per stratum, independent of
    * partitioning and engine. One window shuffle on the stratum key;
    * rank state is O(1) per partition. The standard "cap each source at
    * N docs" recipe of training-data mixes, without `sample()`'s
    * nondeterminism. */
  def stratifiedSample(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      perStratum: Int,
      salt: Long = 7919L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(perStratum > 0, s"perStratum must be positive, got $perStratum")
    // mix64, NOT MixBucket: multiply-high-bits is monotonic below the
    // wraparound point, so it would pick "the first N ids" for small id
    // ranges instead of a scrambled sample
    val order = mix64(col(idCol).cast("long"), salt)
    // collision-free internal name: a caller's own "graft_rank" column
    // must survive untouched
    val rankCol = s"graft_rank_${java.util.UUID.randomUUID().toString.take(8)}"
    docs
      .withColumn(rankCol,
        row_number().over(Window.partitionBy(col(stratumCol))
          .orderBy(order, col(idCol))))
      .where(col(rankCol) <= perStratum)
      .drop(rankCol)
  }

  /** SKEW-SAFE [[stratifiedSample]]: identical output, but a hot stratum
    * can never serialize into one window task (at 100 TB a single domain
    * holding 20% of the corpus would otherwise hand one task billions of
    * rows). Phase 1 ranks within (stratum, salt-bucket) — an independent
    * hash spreads a hot stratum over `salts` tasks — and keeps at most
    * `perStratum` rows per bucket: the stratum-global top-perStratum by
    * (hash, id) is a subset of the union of per-bucket winners, because
    * any row in the global top is also within the top `perStratum` of
    * its own bucket. Phase 2 re-ranks the ≤ salts·perStratum survivors
    * per stratum — a bounded task no matter how skewed the input. Two
    * Exchanges instead of one; use the plain variant when strata are
    * known to be balanced. */
  def stratifiedSampleSalted(
      docs: DataFrame,
      idCol: String,
      stratumCol: String,
      perStratum: Int,
      salt: Long = 7919L,
      salts: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(perStratum > 0, s"perStratum must be positive, got $perStratum")
    require(salts > 0, s"salts must be positive, got $salts")
    val order = mix64(col(idCol).cast("long"), salt)
    // independent hash for the bucket split: reusing `order`'s hash would
    // correlate bucket membership with rank and starve some buckets
    val bucket = pmod(mix64(col(idCol).cast("long"), salt + 1), lit(salts.toLong))
    val rankCol = s"graft_rank_${java.util.UUID.randomUUID().toString.take(8)}"
    val phase1 = docs
      .withColumn(rankCol,
        row_number().over(Window.partitionBy(col(stratumCol), bucket)
          .orderBy(order, col(idCol))))
      .where(col(rankCol) <= perStratum)
      .drop(rankCol)
    phase1
      .withColumn(rankCol,
        row_number().over(Window.partitionBy(col(stratumCol))
          .orderBy(order, col(idCol))))
      .where(col(rankCol) <= perStratum)
      .drop(rankCol)
  }

  /** Deterministic weighted sampling WITHOUT replacement (the
    * Efraimidis–Spirakis exponential race, 2006), integer-exact: each
    * row draws u = (v+1)/2^40 ∈ (0,1] from the low 40 bits v of
    * splitmix64(id + salt) and takes the quantized race key
    *
    *   key_fp = ((40·1024 − log2fp(v+1)) · 2^20) div w
    *
    * — −log2 u in [[TextOps.log2fp]]'s 10-fractional-bit fixed point,
    * scaled then integer-divided by the weight. The sample is the k
    * smallest (key_fp, id) rows: a larger weight shrinks the key exactly
    * as a smaller Exp(w) draw wins the exponential race, so inclusion
    * probability grows with weight, and every step is integer arithmetic
    * on the id — the draw is reproducible across engines, partitionings,
    * and reruns, and an external engine replays it bit-for-bit.
    *
    * Weights must be integers in [1, 2^20]; NULL, non-positive, or
    * oversized weights RAISE (a broken weight column should fail the
    * job, not silently skew the sample), and a NULL id raises for the
    * same reason — the id is the deterministic seed. Clamp upstream
    * (`least/greatest`) when out-of-range weights are expected.
    *
    * Scale shape: keys are one codegen projection over the corpus; the
    * k winners ride a TakeOrdered (per-partition heaps merged on the
    * driver — no global sort, no corpus shuffle). The k rows land on the
    * driver's merge path, so keep k sample-sized, not corpus-sized. */
  def weightedSample(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      salt: Long = 6151L,
      keyOut: String = "key_fp"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    weightedKeys(docs, idCol, weightCol, salt, keyOut)
      .orderBy(col(keyOut), col(idCol))
      .limit(k)
  }

  /** [[weightedSample]]'s race-key projection alone — the input frame
    * plus `keyOut`, no top-k — for callers that rank themselves (the
    * streaming reservoir aggregates the bottom-k as bounded state
    * instead of sorting). Same integer chain, same loud rejects. */
  def weightedKeys(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      salt: Long = 6151L,
      keyOut: String = "key_fp"): DataFrame = {
    val maxW = 1L << 20
    val sfx = java.util.UUID.randomUUID().toString.take(8)
    val wN = s"graft_w_$sfx"
    val nlN = s"graft_neglog_$sfx"
    val idL = expr(
      s"CASE WHEN `$idCol` IS NULL THEN raise_error(" +
        "'weightedSample: NULL id — the id is the deterministic seed') " +
        s"ELSE CAST(`$idCol` AS BIGINT) END")
    val v = mix64(idL, salt).bitwiseAND(lit((1L << 40) - 1L))
    val neglog = lit(40L * 1024L) - log2fp(v + lit(1L))
    docs
      .withColumn(wN, expr(
        s"CASE WHEN `$weightCol` IS NULL OR `$weightCol` < 1 " +
          s"OR `$weightCol` > $maxW THEN raise_error(concat(" +
          s"'weightedSample: weight must be an integer in [1, $maxW], got ', " +
          s"coalesce(CAST(`$weightCol` AS STRING), 'NULL'))) " +
          s"ELSE CAST(`$weightCol` AS BIGINT) END"))
      .withColumn(nlN, neglog)
      .withColumn(keyOut, expr(s"($nlN * 1048576) div $wN"))
      .drop(wN, nlN)
  }

  /** Per-stratum weighted sampling without replacement:
    * [[weightedSample]]'s quantized Efraimidis–Spirakis race run
    * independently inside every stratum — the budgeted-mix primitive
    * ("keep up to `perStratum` docs per source, drawn by quality
    * weight"). The race key is the same pure function of (id, salt), so
    * a document's draw does not depend on its stratum's size, and the
    * whole sample replays externally.
    *
    * `salts = 1` ranks with one window on the stratum key. For skewed
    * strata pass `salts > 1`: phase 1 ranks within (stratum, hash
    * bucket) and keeps `perStratum` per bucket — any row in a stratum's
    * true bottom-perStratum is also in its own bucket's bottom-
    * perStratum, so phase 2's re-rank over ≤ salts·perStratum
    * survivors returns EXACTLY the unsalted answer while a hot stratum
    * spreads over `salts` tasks (the [[stratifiedSampleSalted]]
    * argument, with the race key as the order). */
  def weightedSampleStratified(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      stratumCol: String,
      perStratum: Int,
      salt: Long = 6151L,
      salts: Int = 1,
      keyOut: String = "key_fp"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(perStratum >= 1, s"perStratum must be >= 1, got $perStratum")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val keyed = weightedKeys(docs, idCol, weightCol, salt, keyOut)
    val rankCol = s"graft_rank_${java.util.UUID.randomUUID().toString.take(8)}"
    val phase1 =
      if (salts == 1) keyed
      else {
        // independent hash for the bucket split (the stratifiedSampleSalted
        // rationale: reusing the race hash would correlate bucket and rank)
        val bucket = pmod(mix64(col(idCol).cast("long"), salt + 1), lit(salts.toLong))
        keyed
          .withColumn(rankCol, row_number().over(
            Window.partitionBy(col(stratumCol), bucket)
              .orderBy(col(keyOut), col(idCol))))
          .where(col(rankCol) <= perStratum)
          .drop(rankCol)
      }
    phase1
      .withColumn(rankCol, row_number().over(
        Window.partitionBy(col(stratumCol)).orderBy(col(keyOut), col(idCol))))
      .where(col(rankCol) <= perStratum)
      .drop(rankCol)
  }

  /** Bounded buffer for [[BottomKAggregator]]: the current k race
    * winners, sorted by (key, id). */
  case class BkBuf(rows: Seq[(Long, Long, Long)])

  /** Bottom-k-by-(key, id) aggregator — the streaming face of
    * [[weightedSample]]'s TakeOrdered. Reduce inserts into a k-capped
    * sorted buffer (rejecting rows that lose to the current worst
    * without re-sorting), merge is a k-capped merge, so the state
    * carried between micro-batches is exactly the k current winners —
    * the classic weighted-reservoir state, independent of stream
    * length. Triples are (key_fp, id, w). */
  class BottomKAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Long, Long), BkBuf, Array[(Long, Long, Long)]] {
    require(k >= 1, s"k must be >= 1, got $k")
    private val ord = Ordering.Tuple2[Long, Long]
    private def cap(rows: Seq[(Long, Long, Long)]) =
      BkBuf(rows.sortBy(t => (t._1, t._2)).take(k))
    override def zero: BkBuf = BkBuf(Nil)
    override def reduce(b: BkBuf, item: (Long, Long, Long)): BkBuf = {
      if (b.rows.size >= k &&
          ord.gteq((item._1, item._2), (b.rows.last._1, b.rows.last._2))) b
      else cap(b.rows :+ item)
    }
    override def merge(a: BkBuf, b: BkBuf): BkBuf =
      if (a.rows.isEmpty) b else if (b.rows.isEmpty) a else cap(a.rows ++ b.rows)
    override def finish(b: BkBuf): Array[(Long, Long, Long)] = b.rows.toArray
    override def bufferEncoder: org.apache.spark.sql.Encoder[BkBuf] =
      org.apache.spark.sql.Encoders.product[BkBuf]
    override def outputEncoder:
        org.apache.spark.sql.Encoder[Array[(Long, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
        Array[(Long, Long, Long)]]()
  }

  /** Deterministic train/val/test split assignment: split =
    * the percent-bucket of splitmix64(id + salt) mod 100 against the
    * cumulative fraction thresholds — reproducible across engines,
    * partitionings, and reruns (the property `randomSplit` lacks), and
    * stable under corpus growth: a document's split NEVER changes when
    * other documents arrive, which is what keeps eval sets
    * uncontaminated across dataset versions. Narrow projection, no
    * shuffle; fractions are integer percents summing to 100 so the
    * thresholds are exact. */
  def assignSplits(
      df: DataFrame,
      idCol: String,
      fractions: Seq[(String, Int)] = Seq(("train", 80), ("val", 10), ("test", 10)),
      salt: Long = 7919L): DataFrame = {
    require(fractions.nonEmpty && fractions.forall(_._2 > 0),
      s"fractions must be positive, got $fractions")
    require(fractions.map(_._2).sum == 100,
      s"fractions must sum to 100, got $fractions")
    val bucket = pmod(mix64(col(idCol).cast("long"), salt), lit(100L))
    val cum = fractions.map(_._2).scanLeft(0)(_ + _).tail
    var c: Column = null
    for (((name, _), hi) <- fractions.zip(cum).dropRight(1))
      c = if (c == null) when(bucket < hi, name) else c.when(bucket < hi, name)
    val split = if (c == null) lit(fractions.last._1) else c.otherwise(fractions.last._1)
    df.select(col(idCol), split.as("split"))
  }

  /** Exact per-column data-quality profile: one row per requested column
    * with (col_name, n_rows, n_nulls, n_distinct) — the pre-flight sanity
    * check every ingestion run wants before heavier curation (a jump in
    * null rate or a distinct-count collapse is the classic upstream-feed
    * breakage signal).
    *
    * ONE pass over the data: Spark rewrites the multi-count(DISTINCT)
    * aggregate into a single Expand + two aggregation rounds (one scan,
    * not one job per column); the single stat row is then unpivoted into
    * per-column rows on the driver. n_distinct counts non-null values,
    * SQL COUNT(DISTINCT) semantics. Exact by design — at 100 TB the
    * Expand multiplies rows by the column count, so profile the columns
    * you actually watch, or switch to approx_count_distinct when ±2%
    * is acceptable (not oracle-comparable, hence not the default). */
  def profileColumns(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "columns must be non-empty")
    val aggs = columns.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"__nn_$c"),
      countDistinct(col(c)).cast("long").as(s"__nd_$c"))) :+
      count(lit(1)).cast("long").as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    columns.map { c =>
      (c, row.getAs[Long]("__n"), row.getAs[Long](s"__nn_$c"),
        row.getAs[Long](s"__nd_$c"))
    }.toDF("col_name", "n_rows", "n_nulls", "n_distinct")
  }

  /** HyperLogLog register table [Flajolet et al. 2007] for the given
    * columns: one row per (col_name, bucket) with the max leading-zero
    * rank observed. This is the SCALE path for cardinality that
    * [[profileColumns]]'s exact `countDistinct` cannot walk: the state is
    * ≤ m = 2^p longs per column however many rows stream through, the
    * groupBy is map-side combinable (max), and two register tables MERGE
    * by per-bucket max — persist one per shard/day and union + re-max for
    * corpus-wide cardinality without ever re-reading data.
    *
    * Hash = splitmix64(FNV-1a of the value cast to string) — the audited
    * kernel pair the oracle replays in HUGEINT SQL. bucket = low p bits;
    * rank = leading-zero count of the remaining 64−p bits + 1, derived
    * from `length(bin(w))` so both engines compute it with identical
    * integer ops (no float log2). NULLs are skipped (countDistinct
    * semantics). All columns sketch in ONE pass via a single explode. */
  def hllRegisters(df: DataFrame, columns: Seq[String], p: Int = 8): DataFrame = {
    require(columns.nonEmpty, "columns must be non-empty")
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val pairs = explode(array(columns.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*))
    val h = mix64(fnv1a64(col("pair.v")), 0L)
    df.select(pairs.as("pair"))
      .where(col("pair.v").isNotNull)
      .select(col("pair.col_name").as("col_name"),
        h.bitwiseAND(lit((m - 1).toLong)).as("bucket"),
        shiftrightunsigned(h, p).as("w"))
      .select(col("col_name"), col("bucket"),
        when(col("w") === 0L, lit((64 - p + 1).toLong))
          .otherwise(lit((64 - p + 1).toLong) - length(bin(col("w"))))
          .as("rho"))
      .groupBy(col("col_name"), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /** Cardinality estimate from a [[hllRegisters]] table (possibly the
    * max-merge of many): the standard HLL estimator with the linear-
    * counting small-range correction. Every float step is deterministic
    * cross-engine: the 2^-rho terms are exact powers of two summed in
    * bucket order, absent buckets add the exact integer m − present, the
    * raw estimate is a fixed sequence of IEEE ops on identical doubles,
    * and the linear-counting arm evaluates ln(m) − ln(V) through the
    * [[MathLn]] kernel — INTEGER ln arguments under Math.log, the form
    * where JVM and libm agree bit-for-bit (the q_bm25 lemma; Spark's
    * built-in ln is StrictMath/fdlibm, which disagrees with libm on ~1%
    * of integers — V = 74 was a live divergence before the kernel).
    * Returns (col_name, m, v_zero, estimate). */
  def hllEstimate(registers: DataFrame, p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 16, s"p must be in [4,16], got $p")
    val m = 1 << p
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(m.toDouble))
    val s = (lit(m.toLong) - count(lit(1))).cast("double") +
      aggregate(
        transform(sort_array(collect_list(struct(col("bucket"), col("rho")))),
          x => x.getField("rho")),
        lit(0.0), (acc, r) => acc + pow(lit(2.0), -r.cast("double")))
    registers
      .groupBy(col("col_name"))
      .agg((lit(m.toLong) - count(lit(1))).as("v_zero"), s.as("s"))
      .select(col("col_name"), lit(m).as("m"), col("v_zero"),
        when(col("v_zero") > 0 &&
            alpha * m * m / col("s") <= lit(2.5 * m),
          lit(m.toDouble) * (math_ln(lit(m.toDouble)) -
            math_ln(col("v_zero").cast("double"))))
          .otherwise(alpha * m * m / col("s"))
          .as("estimate"))
  }

  /** One-call approximate column profile: [[hllRegisters]] →
    * [[hllEstimate]], with the exact distinct count joined back for
    * error visibility (drop the exact side in production — it is the
    * expensive one). */
  def approxDistinct(df: DataFrame, columns: Seq[String], p: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, columns, p), p)
      .join(profileColumns(df, columns).select(col("col_name"), col("n_distinct")),
        Seq("col_name"))
      .select(col("col_name"), col("m"), col("v_zero"),
        col("n_distinct"), col("estimate"))

  /** Count-Min frequency sketch [Cormode & Muthukrishnan 2005]: a d×w
    * counter grid where each value increments one cell per row (cell =
    * splitmix64(fnv1a(v) + r) masked to w). The frequency companion of
    * [[hllRegisters]]: state is ≤ d·w longs however many rows stream
    * through, the cell groupBy is map-side combinable (sum), and two
    * sketches MERGE by cell-wise addition — heavy-hitter monitoring over
    * shards/days without re-reading data. `width` must be a power of two
    * so the mask equals the unsigned modulus on both engines. Returns
    * `(r, c, cnt)`. NULLs are skipped. */
  def cmSketch(
      df: DataFrame,
      valueCol: String,
      depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    val fnv = fnv1a64(col(valueCol).cast("string"))
    val cells = array((0 until depth).map(r =>
      mix64(fnv, r.toLong).bitwiseAND(lit(width - 1L))): _*)
    df.where(col(valueCol).isNotNull)
      .select(posexplode(cells).as(Seq("r", "c")))
      .groupBy(col("r"), col("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[cmSketch]] (possibly the sum-
    * merge of many): est(v) = min over rows of the value's cell counter —
    * never below the true count, above it only through collisions
    * (bounded by εN with ε = e/w). The sketch is ≤ d·w rows, so the
    * lookup join broadcasts it; `items` supplies the values to query
    * (dedup'd here). Returns `(valueCol, est)`. */
  def cmEstimate(
      sketch: DataFrame,
      items: DataFrame,
      valueCol: String,
      depth: Int = 4,
      width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 8, s"depth must be in [1,8], got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two, got $width")
    val fnv = fnv1a64(col(valueCol).cast("string"))
    val cells = array((0 until depth).map(r =>
      mix64(fnv, r.toLong).bitwiseAND(lit(width - 1L))): _*)
    items.where(col(valueCol).isNotNull).select(col(valueCol)).distinct()
      .select(col(valueCol), posexplode(cells).as(Seq("r", "c")))
      .join(broadcast(sketch), Seq("r", "c"), "left")
      .groupBy(col(valueCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** KMV (k-minimum-values / bottom-k) distinct sketch [Bar-Yossef et
    * al. 2002; Beyer et al. 2007]: per group, the `k` smallest DISTINCT
    * hashes of the value. The order-statistics member of the sketch tier
    * — unlike [[hllRegisters]] it also supports set-overlap estimation
    * ([[kmvJaccard]]) because the retained hashes identify elements.
    * Fully deterministic and MERGEABLE: the union's sketch is the
    * bottom-k of the concatenated sketches, so shard sketches combine
    * exactly like HLL registers.
    *
    * Hashes are 63-bit (`splitmix64(fnv1a64(v)) >>> 1`): non-negative
    * longs order identically under signed and unsigned comparison and
    * convert to DOUBLE with the same rounding in both engines, which
    * keeps the [[kmvDistinct]] estimate replayable bit-for-bit.
    *
    * Scale shape: the distinct pre-aggregation is a partial-agg groupBy
    * on (group, hash) — Zipf-heavy duplicates collapse map-side — and
    * the bottom-k rank is a per-group window sort that spills; output is
    * ≤ k rows per group. Returns `(grp, h, rk)` with rk 1-based. */
  def kmvSketch(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k must be >= 2, got $k")
    val h = shiftrightunsigned(
      mix64(fnv1a64(col(valueCol).cast("string")), 0L), 1)
    df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), h.as("h"))
      .distinct()
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("grp")).orderBy(col("h"))))
      .where(col("rk") <= k)
  }

  /** Distinct-count estimate from a [[kmvSketch]]: when the sketch
    * saturates (kept = k), est = (k−1)·2^63 / h_k with h_k the k-th
    * smallest hash [Beyer et al. 2007's unbiased form]; a non-saturated
    * sketch SAW every distinct hash, so the count is exact. Every float
    * op is a division/multiplication of exactly-representable values
    * (2^63, k−1, a 63-bit integer), so the oracle replays it
    * bit-for-bit. Returns `(grp, n_kept, h_k, estimate)`. */
  def kmvDistinct(sketch: DataFrame, k: Int = 128): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    sketch.groupBy(col("grp"))
      .agg(count(lit(1)).cast("long").as("n_kept"), max(col("h")).as("h_k"))
      .select(col("grp"), col("n_kept"), col("h_k"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(9.223372036854775808e18) /
            col("h_k").cast("double"))
          .as("estimate"))
  }

  /** Mergeable bounded buffer for [[KmvAggregator]]: `hs` sorted
    * ascending, distinct, ≤ k elements. */
  case class KmvBuf(hs: Array[Long])

  /** The KMV sketch as a typed Spark `Aggregator` — the mergeability the
    * sketch tier advertises, made literal: partial buffers combine by
    * sorted-merge-take-k in `merge`, so ONE implementation serves batch
    * groupBy (map-side combinable partials, no window sort), shard-merge
    * compaction, and streaming aggregation state
    * ([[graft.streaming.JsonStream.kmvMonitorToBatch]] — the buffer IS
    * the per-group state, bounded at k longs however long the stream).
    * Per-row reduce is an O(log k) membership probe and, once the buffer
    * saturates, an O(1) rejection for any hash above h_k — the common
    * case under Zipf traffic. */
  class KmvAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, KmvBuf, Array[Long]] {
    require(k >= 2, s"k must be >= 2, got $k")
    override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)
    override def reduce(b: KmvBuf, h: Long): KmvBuf = {
      val hs = b.hs
      val idx = java.util.Arrays.binarySearch(hs, h)
      if (idx >= 0) b // already present
      else {
        val ins = -idx - 1
        if (hs.length >= k && ins >= k) b // beyond h_k of a full buffer
        else {
          val n = math.min(hs.length + 1, k)
          val out = new Array[Long](n)
          System.arraycopy(hs, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(hs, ins, out, ins + 1, n - ins - 1)
          KmvBuf(out)
        }
      }
    }
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = {
      val x = a.hs; val y = b.hs
      val out = new Array[Long](math.min(x.length + y.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < x.length || j < y.length)) {
        val take =
          if (j >= y.length || (i < x.length && x(i) <= y(j))) {
            if (j < y.length && x(i) == y(j)) j += 1 // dedup equal heads
            val v = x(i); i += 1; v
          } else { val v = y(j); j += 1; v }
        out(o) = take; o += 1
      }
      KmvBuf(if (o == out.length) out else java.util.Arrays.copyOf(out, o))
    }
    override def finish(b: KmvBuf): Array[Long] = b.hs
    override def bufferEncoder: org.apache.spark.sql.Encoder[KmvBuf] =
      org.apache.spark.sql.Encoders.product[KmvBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Per-group KMV buffers via [[KmvAggregator]]: `(grp, hs)` with `hs`
    * the sorted bottom-k hash array. The streaming monitor aggregates to
    * exactly this shape. */
  def kmvAggTable(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 128): DataFrame = {
    val h = shiftrightunsigned(
      mix64(fnv1a64(col(valueCol).cast("string")), 0L), 1)
    val sk = udaf(new KmvAggregator(k), org.apache.spark.sql.Encoders.scalaLong)
    df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), h.as("h"))
      .groupBy(col("grp"))
      .agg(sk(col("h")).as("hs"))
  }

  /** [[kmvSketch]] computed through the aggregator instead of the window
    * sort — identical rows (spec-pinned). Prefer this form at scale: the
    * bounded buffers combine map-side, so the exchange carries ≤ k longs
    * per (partition, group) instead of every distinct hash. */
  def kmvSketchAgg(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 128): DataFrame =
    kmvAggTable(df, groupCol, valueCol, k)
      .select(col("grp"), posexplode(col("hs")).as(Seq("rk0", "h")))
      .select(col("grp"), col("h"), (col("rk0") + 1).cast("int").as("rk"))

  /** Mergeable Misra–Gries summary buffer: items with estimated
    * residual counts, ≤ k entries. */
  case class MgBuf(m: Map[String, Long])

  /** Misra–Gries frequent-items summary as a typed `Aggregator`
    * [Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
    * Summaries", PODS 2012]: per-row reduce increments or, at capacity,
    * decrements every counter by one; merge sums two summaries and
    * subtracts the (k+1)-th largest count. State is ≤ k entries under
    * ANY partitioning / merge order, and the total decrement is at most
    * n/(k+1) — so every item with true frequency > n/(k+1) survives to
    * the candidate list. The candidate set itself is order-DEPENDENT
    * (which near-threshold items linger varies); only its SUPERSET
    * guarantee is deterministic, which is why [[heavyHitters]] recounts
    * exactly and never exposes the raw summary. */
  class MisraGriesAggregator(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, MgBuf, Array[String]] {
    require(k >= 1, s"k must be >= 1, got $k")
    override def zero: MgBuf = MgBuf(Map.empty)
    override def reduce(b: MgBuf, item: String): MgBuf = {
      val m = b.m
      m.get(item) match {
        case Some(c) => MgBuf(m.updated(item, c + 1))
        case None if m.size < k => MgBuf(m.updated(item, 1L))
        case None =>
          // decrement-all: one "charge" against every stored item AND
          // the arriving one (k+1 charges for k+1 distinct items)
          MgBuf(m.collect { case (i, c) if c > 1 => (i, c - 1) })
      }
    }
    override def merge(a: MgBuf, b: MgBuf): MgBuf = {
      if (a.m.isEmpty) return b
      if (b.m.isEmpty) return a
      val sum = b.m.foldLeft(a.m) { case (acc, (i, c)) =>
        acc.updated(i, acc.getOrElse(i, 0L) + c)
      }
      if (sum.size <= k) MgBuf(sum)
      else {
        // subtract the (k+1)-th largest count from everything — the
        // PODS'12 merge; items at or below it drop out
        val counts = sum.valuesIterator.toArray
        java.util.Arrays.sort(counts)
        val thr = counts(counts.length - (k + 1))
        MgBuf(sum.collect { case (i, c) if c > thr => (i, c - thr) })
      }
    }
    override def finish(b: MgBuf): Array[String] = b.m.keysIterator.toArray.sorted
    override def bufferEncoder: org.apache.spark.sql.Encoder[MgBuf] =
      org.apache.spark.sql.Encoders.product[MgBuf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** EXACT heavy hitters at sketch cost: every item occurring MORE than
    * n/m times, with its exact count — the two-pass candidate/recount
    * scheme. Pass 1 folds the corpus into one [[MisraGriesAggregator]]
    * summary (k = m, so the superset guarantee covers the n/m
    * threshold: total decrement ≤ n/(m+1) < any qualifying count);
    * pass 2 recounts ONLY candidate rows exactly and applies the
    * threshold. Output is therefore exactly `GROUP BY HAVING
    * count > n/m` — deterministic however the data is partitioned,
    * which is what makes it value-level oracle-able.
    *
    * Scale (100 TB): the whole point vs a plain groupBy. A full-vocab
    * count shuffles every distinct item's partials (web-scale corpora:
    * billions of keys); here pass 1 shuffles ≤ m-entry summaries
    * (map-side combined), the ≤ m candidate strings ride the plan as an
    * isin literal, and pass 2's Exchange carries candidate rows only —
    * the Zipf head, a vanishing fraction of rows. Costs a second scan;
    * at 100 TB a scan is cheap next to a billion-key shuffle. Returns
    * `(item, cnt, n_total)`, empty when no item qualifies. */
  def heavyHitters(df: DataFrame, valueCol: String, m: Int): DataFrame = {
    require(m >= 1, s"m must be >= 1, got $m")
    val vals = df.where(col(valueCol).isNotNull)
      .select(col(valueCol).cast("string").as("v"))
    val mg = udaf(new MisraGriesAggregator(m), org.apache.spark.sql.Encoders.STRING)
    val row = vals.agg(mg(col("v")).as("cand"), count(lit(1)).as("n")).head()
    heavyRecount(vals, row.getSeq[String](0), row.getLong(1), m)
  }

  /** Pass 2 of the candidate/recount scheme, shared by [[heavyHitters]]
    * and the streaming monitor (whose pass-1 summary arrives as
    * checkpointed aggregation state instead of a batch fold): exact
    * counts over candidate rows only, thresholded at cnt > n/m. The ≤ m
    * candidate strings ride the plan as an isin literal, so the only
    * Exchange carries candidate rows — identical output whichever path
    * produced the (order-dependent, superset-guaranteed) candidates. */
  private[graft] def heavyRecount(
      vals: DataFrame,
      cand: Seq[String],
      n: Long,
      m: Int): DataFrame = {
    val minCount = n / m + 1 // integer: cnt >= floor(n/m)+1 ⇔ cnt > n/m
    if (cand.isEmpty)
      return vals.where(lit(false))
        .select(col("v").as("item"), lit(0L).as("cnt"), lit(n).as("n_total"))
    vals.where(col("v").isin(cand: _*))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= minCount)
      .select(col("v").as("item"), col("cnt"), lit(n).as("n_total"))
  }

  /** Pairwise set-overlap (Jaccard) estimate between every two groups
    * from their KMV sketches: J ≈ |bottom_k(A∪B) ∩ sk(A) ∩ sk(B)| / kk,
    * where bottom_k(A∪B) is derivable exactly from the two sketches
    * (the KMV closure property) and kk = |bottom_k(A∪B)| ≤ k. The
    * cross-SOURCE contamination/overlap probe: estimates shared content
    * between corpus slices without comparing documents.
    *
    * Scale shape: runs entirely on sketch rows — G·k rows for G groups —
    * so after the ONE sketch pass over the data (the sketch is persisted
    * across its three references, then released) the pairwise stage is
    * broadcast-sized no matter the corpus. The estimate is an exact
    * integer ratio. Returns `(ga, gb, kk, n_inter, jaccard_est)` for
    * ga < gb, as a LOCAL result frame (≤ maxGroups²/2 small rows,
    * collected) — nothing stays pinned in executor memory after the call.
    *
    * The pair grid is quadratic in the number of groups, so `maxGroups`
    * guards it: this operator is for SOURCE-level slices (dozens of
    * groups). For overlap between two specific high-cardinality slices,
    * call it per pair on pre-filtered inputs instead of raising the
    * guard. */
  def kmvJaccard(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Int = 128,
      maxGroups: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k must be >= 2, got $k")
    require(maxGroups >= 2, s"maxGroups must be >= 2, got $maxGroups")
    // the sketch subtree is referenced three times below (groups, left,
    // right) — PERSIST it so the corpus is scanned once, not thrice;
    // computed through the aggregator (map-side-combining partials, no
    // window sort). G·k rows pinned; released before returning.
    val sk = kmvSketchAgg(df, groupCol, valueCol, k)
      .select(col("grp"), col("h")).persist()
    sk.count()
    try {
    val nGroups = sk.select(col("grp")).distinct().limit(maxGroups + 1).count()
    require(nGroups <= maxGroups,
      s"kmvJaccard grouping column has more than maxGroups=$maxGroups " +
        "distinct values — the pair grid is quadratic in groups; group by " +
        "a coarser slice, or invoke per pre-filtered pair of slices")
    val groups = sk.select(col("grp")).distinct()
    val pairs = groups.select(col("grp").as("ga"))
      .crossJoin(groups.select(col("grp").as("gb")))
      .where(col("ga") < col("gb"))
    val left = pairs.join(sk.withColumnRenamed("grp", "ga"), Seq("ga"))
      .select(col("ga"), col("gb"), col("h"),
        lit(1).as("in_a"), lit(0).as("in_b"))
    val right = pairs.join(sk.withColumnRenamed("grp", "gb"), Seq("gb"))
      .select(col("ga"), col("gb"), col("h"),
        lit(0).as("in_a"), lit(1).as("in_b"))
    val result = left.union(right)
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))))
      .where(col("rk") <= k)
      .groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).cast("long").as("kk"),
        sum(col("in_a") * col("in_b")).cast("long").as("n_inter"))
      .select(col("ga"), col("gb"), col("kk"), col("n_inter"),
        (col("n_inter").cast("double") / col("kk").cast("double"))
          .as("jaccard_est"))
    // collect the ≤ maxGroups²/2-row result and rebuild it as a LOCAL
    // frame: returning the persisted plan would pin the cache in executor
    // memory for the caller to (usually never) release
    val rows = result.collect()
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), result.schema)
    } finally sk.unpersist()
  }

  /** Deterministic bottom-k-by-id-hash row sample with per-group
    * quantile estimates — the mergeable-quantile member of the sketch
    * tier. Unlike [[kmvSketch]] (distinct VALUES), this samples ROWS
    * uniformly (hash of the unique id, not the value), so the sample
    * reflects the data distribution and its order statistics estimate
    * the true quantiles; two shards' samples merge by re-taking the k
    * smallest id-hashes. approx_percentile gives one-shot quantiles
    * cheaper, but its state is not mergeable across separately-computed
    * shards and its result is not replayable cross-engine.
    *
    * For each percent p, est(p) = the ceil(p·s/100)-th smallest sample
    * value (s = sample size) — pure integer rank arithmetic, and the
    * value at a rank is tie-order-independent, so the oracle replays it
    * exactly. NULL values are excluded (a quantile of NULL is
    * meaningless); `idCol` must be unique and integral.
    *
    * Scale shape: one narrow scan + one per-group window sort of ≤ data
    * (spills, AQE-splittable), sample is ≤ k rows per group; the rank
    * join runs on sample rows only. Returns `(grp, p, n_sample, est)`. */
  def sampleQuantiles(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      valueCol: String,
      k: Int = 256,
      percents: Seq[Int] = Seq(10, 50, 90, 99)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1,100], got $percents")
    require(percents.distinct.size == percents.size,
      s"percents must be distinct, got $percents")
    val h = shiftrightunsigned(mix64(col(idCol).cast("long"), 0L), 1)
    // id breaks (astronomically unlikely) hash ties so the sampled ROW
    // set is deterministic; the rank-r VALUE below is tie-independent
    val sample = df.where(col(valueCol).isNotNull)
      .select(col(groupCol).as("grp"), h.as("h"),
        col(idCol).cast("long").as("__id"), col(valueCol).as("v"))
      .withColumn("sr", row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("h"), col("__id"))))
      .where(col("sr") <= k)
    val ranked = sample.withColumn("vr",
      row_number().over(
        Window.partitionBy(col("grp")).orderBy(col("v"), col("h"))))
    val want = sample.groupBy(col("grp"))
      .agg(count(lit(1)).cast("long").as("n_sample"))
      .select(col("grp"), col("n_sample"),
        explode(array(percents.map(p => lit(p.toLong)): _*)).as("p"))
      // integer ceil(p·s/100); ≥ 1 whenever s ≥ 1
      .withColumn("rank_p",
        (col("p") * col("n_sample") + lit(99L) - pmod(
          col("p") * col("n_sample") + lit(99L), lit(100L))) / lit(100L))
      .withColumn("rank_p", col("rank_p").cast("long"))
    // rename before the self-join: want and ranked share sample's lineage
    want.join(
        ranked.select(col("grp").as("__rg"), col("vr"), col("v")),
        col("grp") === col("__rg") && col("rank_p") === col("vr"))
      .select(col("grp"), col("p"), col("n_sample"), col("v").as("est"))
  }

  /** Curriculum/difficulty binning: assign every row to one of `nBins`
    * quality buckets split at the [[sampleQuantiles]] thresholds — the
    * composition that makes the quantile sketch load-bearing:
    * curriculum schedules, difficulty-stratified eval sets, and
    * quality-tiered mixing all start from "which quantile bucket is
    * this example in". Thresholds come from the deterministic bottom-k
    * sample (mergeable across shards, replayable cross-engine), so the
    * binning is reproducible bit-for-bit — unlike approx_percentile
    * cuts. `bin = #(thresholds strictly below value)` in 0..nBins−1;
    * NULL values get a NULL bin.
    *
    * Scale shape: the threshold frame is ≤ nBins−1 rows and is
    * collected into a literal when-chain, so the assignment pass is one
    * narrow scan with ZERO additional Exchange — the only shuffles are
    * inside the one-time quantile estimate. Returns input + `bin`. */
  def curriculumBins(
      df: DataFrame,
      idCol: String,
      valueCol: String,
      nBins: Int = 4,
      k: Int = 256): DataFrame = {
    require(nBins >= 2 && nBins <= 20, s"nBins must be in 2..20, got $nBins")
    val pcts = (1 until nBins).map(i => i * 100 / nBins)
    require(pcts.distinct.size == pcts.size,
      s"nBins=$nBins yields duplicate integer percents $pcts")
    // cast to double up front so the collected thresholds read uniformly
    // for any numeric input column
    val th = sampleQuantiles(
        df.select(lit("all").as("__grp"), col(idCol),
          col(valueCol).cast("double").as(valueCol)),
        "__grp", idCol, valueCol, k, pcts)
      .collect().map(r => r.getLong(1) -> r.getDouble(3)).sortBy(_._1).map(_._2)
    val bin = th.foldLeft(lit(0L)) { (acc, t) =>
      acc + when(col(valueCol) > lit(t), 1L).otherwise(0L)
    }
    df.withColumn("bin", when(col(valueCol).isNotNull, bin))
  }

  /** Partition-skew diagnostics: per listed column, the `topK` heaviest
    * values with their counts and row share — the pre-flight check
    * before choosing shuffle keys (a key whose head value carries >
    * a few percent of rows needs salting —
    * [[Dedup]]/[[Web.domainCapSalted]]-style — or AQE skew hints).
    * NULL counts as a value here (a mostly-NULL join key is the classic
    * silent hot partition).
    *
    * Scale shape: ONE Expand pass over the listed columns → one
    * partial-agg count on (column, value) — the Zipf head this measures
    * is exactly what collapses map-side — then a per-column top-K
    * window over the distinct-value counts. The row total is derived
    * INSIDE the same plan (each column's value counts sum to the row
    * count, so `sum(cnt) over (partition by col_name)` on the
    * distinct-value table is the total — no separate count job, no
    * second scan). Shares are exact-integer divisions.
    * Returns `(col_name, value, cnt, share, rk)`. */
  def skewReport(
      df: DataFrame,
      columns: Seq[String],
      topK: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(columns.nonEmpty, "columns must be non-empty")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val pairs = explode(array(columns.map(c =>
      struct(lit(c).as("col_name"), col(c).cast("string").as("value"))): _*))
    val byCol = Window.partitionBy(col("col_name"))
    df.select(pairs.as("p"))
      .select(col("p.col_name").as("col_name"), col("p.value").as("value"))
      .groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("total", sum(col("cnt")).over(byCol))
      .withColumn("rk", row_number().over(
        byCol.orderBy(col("cnt").desc, col("value").asc_nulls_first)))
      .where(col("rk") <= topK)
      .select(col("col_name"), col("value"), col("cnt"),
        (col("cnt").cast("double") / col("total").cast("double")).as("share"),
        col("rk").cast("long").as("rk"))
  }

  /** k-anonymity screen over quasi-identifier columns [Sweeney 2002]:
    * a row is safe only if at least `k` rows share its full
    * quasi-identifier combination — rare combinations are the ones that
    * re-identify individuals even after direct identifiers are redacted,
    * so this is the structured-data companion of the PII regex pass.
    * Returns the input plus `(group_n, k_ok)`; the caller drops or
    * generalizes the `!k_ok` rows. One partial-agg groupBy on the quasi
    * key plus the join back (both AQE-skew-splittable equi-shapes; the
    * group count table is usually far smaller than the data and
    * broadcasts when it fits). */
  def kAnonymize(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "quasiCols must be non-empty")
    require(k >= 1, s"k must be >= 1, got $k")
    // NULL-SAFE join back: a NULL quasi value (a missing identifier) is
    // still a combination that must be screened — a plain equi-join
    // would silently drop those rows from the output entirely
    val counts = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .select(quasiCols.map(c => col(c).as(s"__q_$c")) :+ col("group_n"): _*)
    val cond = quasiCols.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    df.join(counts, cond)
      .drop(quasiCols.map(c => s"__q_$c"): _*)
      .withColumn("k_ok", col("group_n") >= k)
  }

  /** Content diff between two corpus snapshots (dataset versioning —
    * the audit that makes "corpus v2.1" reviewable): per id, whether
    * the document was `added`, `removed`, `changed` (same id, different
    * content digest), or `unchanged`. One FULL OUTER equi-join on the id
    * over slim (id, fnv1a64(text)) projections — both sides shrink to
    * 16 bytes/doc before the shuffle, so diffing 100 TB snapshots moves
    * only digest tables. */
  def corpusDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // presence comes from JOIN-side markers, NOT digest nullability — a
    // NULL-text doc present in both snapshots must read 'unchanged',
    // not 'added' (fnv1a64(NULL) is NULL); digests compare null-safely
    def slim(df: DataFrame, d: String, m: String) = df.select(
      col(idCol), fnv1a64(col(textCol)).as(d), lit(true).as(m))
    slim(oldDf, "old_digest", "__in_old")
      .join(slim(newDf, "new_digest", "__in_new"), Seq(idCol), "full_outer")
      .select(col(idCol), col("old_digest"), col("new_digest"),
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(col("old_digest") <=> col("new_digest"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Deterministic Poisson-bootstrap confidence interval for the mean of
    * an INTEGER column (scale fixed-point metrics up front — exactness
    * is the point): every (row, resample) pair draws a Poisson(1)
    * replication weight from an integer hash against the cumulative
    * e^-1/k! thresholds (the classic distributed bootstrap — multinomial
    * needs the global count, Poisson doesn't), so the resample sums are
    * EXACT integers (order-free across any shuffle), each resample mean
    * is one IEEE division, and the percentile CI rounds to 6. Same
    * draws on every engine, partitioning, and rerun.
    *
    * Scale shape: one narrow explode (×B rows carrying only the metric),
    * a B-row partial-agg groupBy, then a driver-sized percentile over B
    * means. B=64-256 is standard; the corpus is scanned once. */
  def bootstrapMeanCI(
      df: DataFrame,
      idCol: String,
      intCol: String,
      b: Int = 64,
      level: Double = 0.95,
      salt: Long = 1717L): DataFrame = {
    require(b >= 8 && b <= 4096, s"b out of range: $b")
    require(level > 0 && level < 1, s"level out of range: $level")
    // cumulative Poisson(1) thresholds scaled to 1e6 (k = 0..7; the
    // tail beyond 7 has mass < 1e-7 and rounds into the last bucket)
    val cum = Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L, 999917L)
    // (row, b) combine via mix-xor-mix, NOT row*prime+b: the in-SQL
    // multiply is an ANSI ARITHMETIC_OVERFLOW for snowflake-scale ids
    // (the Curation-wide MixBucket lesson), and the kernels wrap mod 2^64
    val u = pmod(
      mix64(mix64(col("__row"), salt).bitwiseXOR(col("__b")), salt + 1L),
      lit(1000000L))
    val w = cum.zipWithIndex.foldRight(lit(7L): Column) {
      case ((t, k), rest) => when(u < t, k.toLong).otherwise(rest)
    }
    val lo = (1.0 - level) / 2.0
    // draws hash the STABLE row id — a partition-dependent id (e.g.
    // monotonically_increasing_id) would change the bootstrap with the
    // layout and be unreplayable by the oracle
    // NULL metric or id rows are EXCLUDED (the CI describes the observed
    // values): leaving them in would count their weights in n_draws while
    // sum skips the NULL products — a silently deflated mean — and a
    // NULL id would fall through every threshold to a constant weight
    val means = df
      .where(col(intCol).isNotNull && col(idCol).isNotNull)
      .select(col(intCol).cast("long").as("__x"),
        col(idCol).cast("long").as("__row"))
      .select(col("__x"), col("__row"),
        explode(sequence(lit(0L), lit(b - 1L))).as("__b"))
      .select(col("__b"), col("__x"), w.as("__w"))
      .groupBy(col("__b"))
      .agg(sum(col("__w")).as("n_draws"),
        sum(col("__w") * col("__x")).as("wsum"))
      .where(col("n_draws") > 0)
      .select(col("__b"),
        (col("wsum").cast("double") / col("n_draws").cast("double")).as("m"))
    means.agg(
      count(lit(1)).as("n_resamples"),
      round(percentile(col("m"), lit(0.5)), 6).as("median"),
      round(percentile(col("m"), lit(lo)), 6).as("ci_lo"),
      round(percentile(col("m"), lit(1.0 - lo)), 6).as("ci_hi"))
  }

  /** Percentile winsorization of a numeric column: values outside the
    * [pLo, pHi] exact percentiles clamp to them — the standard defense
    * against sensor glitches and log corruption skewing normalization
    * statistics before training. Thresholds round to 6 decimals so both
    * engines clamp with identical boundaries (the interpolation
    * arithmetic may differ in the last ulp; data values sit far from
    * mid-interpolation thresholds, so the rounded comparison is stable).
    *
    * Scale note: `percentile` is the EXACT aggregate (sorts the column
    * in the agg buffer) — the oracle-checkable variant; at 100 TB swap
    * in `approx_percentile` with the same plumbing (one agg row
    * broadcast back, narrow clamp). */
  def winsorize(
      df: DataFrame,
      valueCol: String,
      pLo: Double = 0.01,
      pHi: Double = 0.99): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"need 0<=pLo<pHi<=1, got $pLo/$pHi")
    require(!df.columns.contains("lo") && !df.columns.contains("hi"),
      "input already has a lo/hi column — rename it before winsorizing")
    val th = df.agg(
      round(percentile(col(valueCol), lit(pLo)), 6).as("lo"),
      round(percentile(col(valueCol), lit(pHi)), 6).as("hi"))
    df.crossJoin(broadcast(th))
      // NULL passes through: least/greatest SKIP null arguments, so a
      // bare clamp would fabricate `hi` for missing values
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNotNull,
          greatest(col("lo"), least(col("hi"), col(valueCol)))))
  }

  /** Latest-wins upsert materialization (the SCD-1 / CDC-compaction
    * step every incrementally-ingested table needs): one row per key,
    * carrying the values of the highest `(versionCols…)` tuple —
    * lexicographic, so pass a tiebreaker (an id) after the timestamp to
    * make the winner total. Implemented as `max(struct(version…,
    * values…))` — a PARTIAL-AGGREGABLE reduction (Spark plans it as a
    * SortAggregate over the group keys, since struct max has no hash
    * buffer), so superseded versions collapse MAP-SIDE and never cross
    * the shuffle: the one Exchange carries at most one row per
    * (key, input partition). The window-rank formulation computes the
    * same rows but ships and sorts EVERY superseded version through the
    * exchange first — at 100 TB of append history that is the
    * difference between a merge of per-partition winners and a
    * re-shuffle of the whole log. */
  def upsertLatest(
      df: DataFrame,
      keyCols: Seq[String],
      versionCols: Seq[String],
      valueCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty && valueCols.nonEmpty,
      "keyCols, versionCols, and valueCols must be non-empty")
    val packed = struct((versionCols ++ valueCols).map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max(packed).as("__latest"))
      .select(keyCols.map(col) ++
        (versionCols ++ valueCols).map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** Full pipeline; returns surviving documents with annotations.
    *
    * ONE corpus scan: the annotations, the exact-dedup digest, and the
    * minhash signature are all computed in the same projection; `text` is
    * then dropped and the slim result (a few hundred bytes/doc vs the
    * corpus' kilobytes) is persisted, so the dedup branches below re-read
    * the cached projection, not the 100 TB parquet. Exact dedup keeps the
    * smallest id per digest via a window min (one shuffle on the digest,
    * no join); near dedup bands the precomputed signatures. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.25,
      nearDupThreshold: Double = 0.8,
      shingleSize: Int = 3,
      numHashes: Int = 16,
      bands: Int = 4): DataFrame = {
    val (slim, result) = curatePipeline(docs, idCol, textCol, minQuality,
      nearDupThreshold, shingleSize, numHashes, bands)
    // materialize the survivors ONCE (the corpus scan + both dedup
    // branches run here, reading the cached slim projection), then
    // release the cache immediately: a persist() left behind would pin
    // one cached copy per curate() call for the session's lifetime
    // (CacheManager holds strong references); the checkpointed result's
    // blocks are ContextCleaner-managed and freed on GC.
    val out = result.localCheckpoint(true)
    slim.unpersist(blocking = true)
    out
  }

  /** Benchmark decontamination: flag every training document that shares
    * at least one word n-gram with any benchmark (eval-set) document —
    * the standard exact-overlap check run before a pretraining corpus
    * ships (GPT-3 App. C / PaLM-style n-gram collision). Shingling uses
    * Dedup.shingles (distinct, whole-doc degenerate for docs shorter than
    * `n`) so one oracle pattern covers both the LSH and decontamination
    * pipelines. Returns one row per training document:
    * `(id, n_hit_grams, contaminated)`.
    *
    * Scale (100 TB corpus vs ~10⁴-10⁵-doc benchmark suite): the
    * benchmark gram set is tiny — it is DISTINCT-ed and hash-joined with
    * an explicit broadcast, so the corpus side never shuffles its grams;
    * the only corpus shuffle is the groupBy(id) over the HIT rows, a
    * vanishing fraction of the corpus. The id-universe frame is a
    * column-pruned single-column scan. */
  def decontaminate(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val benchGrams = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    val hits = train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      // shingles are distinct within a doc, so plain count = distinct count
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hit_grams"))
    train.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        (coalesce(col("n_hit_grams"), lit(0L)) > 0).as("contaminated"))
  }

  /** Overlap-FRACTION decontamination (the GPT-3/PaLM appendix variant of
    * [[decontaminate]]): instead of a binary any-shared-n-gram flag,
    * report what fraction of a document's distinct n-grams appear in the
    * benchmark set, and drop only documents above `maxOverlap` — a long
    * document that happens to quote one benchmark sentence survives, a
    * near-copy does not. Returns
    * `(idCol, n_grams, n_hit_grams, overlap_frac, keep)`; documents too
    * short to form one n-gram have zero overlap by convention. `idCol`
    * must be unique (the repo-wide id contract): duplicate ids would
    * merge through the per-id aggregate and dilute the fraction.
    *
    * Determinism: counts are exact integers and `overlap_frac` is one
    * IEEE division of exact integers. Scale shape is [[decontaminate]]'s:
    * benchmark grams broadcast (benchmarks are MBs, corpora are TBs), the
    * corpus side is one narrow explode + partial-agg groupBy on the id. */
  def decontaminateOverlap(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      maxOverlap: Double = 0.1): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val benchGrams = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .distinct()
    // ONE corpus scan: the exploded gram rows yield both the total (the
    // shingle list is distinct within a doc, and never empty — short
    // docs degrade to one whole-doc shingle) and, via the broadcast
    // LEFT join, the hit count — no second scan, no id-keyed join back
    val frac = col("n_hit_grams").cast("double") /
      greatest(col("n_grams"), lit(1L)).cast("double")
    train
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams.withColumn("__hit", lit(1L))), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit_grams"))
      .select(col(idCol), col("n_grams"), col("n_hit_grams"),
        frac.as("overlap_frac"),
        (frac <= maxOverlap).as("keep"))
  }

  /** DSIR importance weights — Data Selection via Importance Resampling
    * [Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"]: score every raw-corpus document by how
    * much more likely its hashed-n-gram features are under a small
    * TARGET distribution (the curated/domain slice you want more of)
    * than under the raw corpus itself — the standard
    * "select Wikipedia-like web text" recipe. Features are the library's
    * shared hashed unigram+adjacent-bigram space
    * ([[TextOps.qualityClassify]] / nbClassify); both distributions get
    * add-one smoothing with V = distinct observed buckets (in either
    * corpus) + 1 (the [[TextOps.nbClassify]] convention).
    *
    * log w(doc) = Σ_f [ln(tc(b_f)+1) − ln(sc(b_f)+1)]
    *              − n_feats · [ln(N_t+V) − ln(N_s+V)],
    * where tc/sc are target/corpus bucket counts and N_t/N_s the
    * feature totals. Returns `(idCol, n_feats, w_feat, n_t, n_s, vocab,
    * log_w)` — `w_feat` is the Σ term (rounded to 4, the nbClassify
    * convention), and `log_w` the full weight.
    *
    * Oracle surface (the q_pmi convention): `w_feat`'s ln arguments are
    * per-bucket counts + 1 — inside the verified integer-ln agreement
    * range at oracle scales — and the fold is position-ordered, so it
    * replays bit-for-bit ([[graft.operators.MathLn]]); the normalizer
    * term's arguments (N_s+V) are CORPUS-scale integers where the
    * Math/libm agreement is unverified, so `log_w` is excluded from the
    * compared projection and pinned by spec instead (all its other
    * operands are the verified columns).
    *
    * Scale shape: two bucket-keyed partial-agg counts (one over the
    * small target, one over the corpus — the Zipf head collapses
    * map-side, state ≤ `buckets` rows), the ≤ buckets-row weight table
    * BROADCASTS to the corpus-side feature join, and the only wide
    * corpus operation is the per-document groupBy (AQE-splittable) —
    * the nbClassify plan shape. The count subtree is referenced by both
    * the totals row and the weight join, but the subplans are
    * canonically identical so the runtime computes the count Exchange
    * once and reuses it (the cooccurrencePmi ReusedExchange shape) —
    * two corpus scans total: one for counts, one for scoring.
    *
    * OPTIMIZATION r16: delegates to [[dsirTrain]] + [[dsirScoreFused]] —
    * the production fused-kernel route that was already spec-pinned
    * BIT-IDENTICAL to the aggregation path. The corpus-side explode +
    * broadcast join + per-doc collect_list/sort_array groupBy (the wide
    * stage) is replaced by ONE narrow codegen'd scan with the ≤ buckets
    * weight table riding the plan as literal data; the two training
    * count aggregates are unchanged. Inherits dsirTrain's
    * buckets ≤ 2^20 bound (the collected-table cap). The old
    * aggregation path stays as [[dsirWeightsAgg]] so the bit-identity
    * spec keeps comparing two INDEPENDENT implementations. */
  def dsirWeights(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 1 << 16): DataFrame =
    dsirScoreFused(corpus, idCol, textCol,
      dsirTrain(corpus, target, idCol, textCol, buckets))

  /** The pre-r16 aggregation implementation of [[dsirWeights]] —
    * retained verbatim as the independent reference the
    * fused-vs-aggregation bit-identity spec compares against. */
  private[graft] def dsirWeightsAgg(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 1 << 16): DataFrame = {
    val tCnt = TextOps.featureBuckets(target, idCol, textCol, buckets)
      .groupBy("b").agg(count(lit(1)).as("tc"))
    val sCnt = TextOps.featureBuckets(corpus, idCol, textCol, buckets)
      .groupBy("b").agg(count(lit(1)).as("sc"))
    val cnt = tCnt.join(sCnt, Seq("b"), "full_outer")
      .select(col("b"), coalesce(col("tc"), lit(0L)).as("tc"),
        coalesce(col("sc"), lit(0L)).as("sc"))
    val tot = cnt.agg(sum(col("tc")).as("n_t"), sum(col("sc")).as("n_s"),
      (count(lit(1)) + lit(1L)).as("vocab"))
    val w = math_ln((col("tc") + lit(1L)).cast("double")) -
      math_ln((col("sc") + lit(1L)).cast("double"))
    val wSum = aggregate(transform(col("arr"), x => x.getField("w")),
      lit(0.0), (a, x) => a + x)
    // every corpus feature's bucket is in sc by construction, so the
    // inner join never drops a feature row
    TextOps.featureBuckets(corpus, idCol, textCol, buckets)
      .join(broadcast(cnt), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_feats"),
        sort_array(collect_list(struct(col("pos"), w.as("w")))).as("arr"))
      // the 1-row totals attach AFTER the per-doc aggregate (the
      // nbClassify prior pattern); the O(n_feats) array fold runs ONCE
      // in its own projection — both w_feat and log_w read the result
      // (the fold is a CodegenFallback HOF, outside whole-stage
      // subexpression elimination, so referencing it twice in one
      // select would evaluate it twice per document)
      .crossJoin(broadcast(tot))
      .withColumn("__wsum", wSum)
      .select(col("id").as(idCol), col("n_feats"),
        round(col("__wsum"), 4).as("w_feat"),
        col("n_t"), col("n_s"), col("vocab"),
        (col("__wsum") - col("n_feats").cast("double") *
          (math_ln((col("n_t") + col("vocab")).cast("double")) -
            math_ln((col("n_s") + col("vocab")).cast("double")))).as("log_w"))
  }

  /** Deterministic DSIR selection: the `k` corpus documents with the
    * highest [[dsirWeights]] log-weight, ties broken by id hash then id
    * — a reproducible stand-in for the paper's Gumbel-noise resampling
    * (documented divergence: top-k is the noise-free limit; different
    * salts of a hash-Gumbel variant would restore sampling diversity,
    * but a deterministic selected set is what an oracle-verified
    * pipeline can pin). Top-k is a TakeOrdered (per-partition heaps,
    * driver merges k rows) — right for eval-set/seed-set k; for
    * fraction-scale selection compute a log_w threshold with
    * [[sampleQuantiles]] and filter instead. */
  def dsirSelect(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      buckets: Int = 1 << 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val wts = dsirWeights(corpus, target, idCol, textCol, buckets)
      .select(col(idCol), col("log_w"))
    corpus.join(wts, Seq(idCol))
      .orderBy(col("log_w").desc, mix64(col(idCol).cast("long"), 77L),
        col(idCol))
      .limit(k)
  }

  /** Trained DSIR model: the dense per-bucket weight array
    * (w[b] = ln(tc+1) − ln(sc+1), Math.log, 0.0 for buckets observed in
    * neither corpus — tc = sc = 0 gives exactly ln 1 − ln 1) plus the
    * integer totals. `weights.length` = the training bucket count. */
  case class DsirModel(weights: Array[Double], nT: Long, nS: Long, vocab: Long)

  /** Train [[DsirModel]] once: the two bucket-count aggregates of
    * [[dsirWeights]], collected into a dense driver-side array (bounded
    * by `buckets` — ≤ 2^20 rows of 24 B; the guard keeps a caller from
    * asking for an uncollectable table). Use with [[dsirScoreFused]] to
    * score any corpus — or any STREAM — at scan speed. */
  def dsirTrain(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 1 << 16): DsirModel = {
    require(buckets >= 2 && buckets <= (1 << 20) &&
      (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two in [2, 2^20], got $buckets")
    // r16: the training explode + partial agg runs inside the input's
    // scan stage — spread under-partitioned inputs first (guide §2.5;
    // no-op on well-partitioned corpora). A/B at sf0.1: 2.0 -> 0.8 s.
    val tCnt = TextOps.featureBuckets(
        graft.operators.spreadIfNarrow(target, idCol), idCol, textCol, buckets)
      .groupBy("b").agg(count(lit(1)).as("tc"))
    val sCnt = TextOps.featureBuckets(
        graft.operators.spreadIfNarrow(corpus, idCol), idCol, textCol, buckets)
      .groupBy("b").agg(count(lit(1)).as("sc"))
    val rows = tCnt.join(sCnt, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("tc"), lit(0L)).as("tc"),
        coalesce(col("sc"), lit(0L)).as("sc"))
      .collect()
    val w = new Array[Double](buckets)
    var nT = 0L
    var nS = 0L
    rows.foreach { r =>
      val b = r.getLong(0).toInt
      val tc = r.getLong(1)
      val sc = r.getLong(2)
      w(b) = Math.log((tc + 1L).toDouble) - Math.log((sc + 1L).toDouble)
      nT += tc
      nS += sc
    }
    DsirModel(w, nT, nS, rows.length + 1L)
  }

  /** Score documents against a trained [[DsirModel]] with the fused
    * [[graft.operators.DsirScore]] kernel — IDENTICAL output schema and
    * BIT-IDENTICAL values to [[dsirWeights]] (spec-pinned: the kernel
    * folds weights in featureBuckets' position order and the normalizer
    * constant is the same two Math.log ops), but as ONE narrow
    * codegen'd scan with the weight table riding the plan as literal
    * data: zero Exchange, zero Join, no per-doc groupBy — the
    * production shape for scoring 100 TB, and stateless, so the same
    * expression runs unchanged on a stream
    * ([[graft.streaming.JsonStream.dsirScreenToBatch]]). */
  def dsirScoreFused(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DsirModel): DataFrame = {
    val st = graft.operators.dsir_score(
      TextOps.tokens(coalesce(col(textCol), lit(""))), model.weights)
    val delta = Math.log((model.nT + model.vocab).toDouble) -
      Math.log((model.nS + model.vocab).toDouble)
    docs.select(col(idCol), st.as("st"))
      .select(col(idCol),
        col("st.n_feats").as("n_feats"),
        round(col("st.wsum"), 4).as("w_feat"),
        lit(model.nT).as("n_t"), lit(model.nS).as("n_s"),
        lit(model.vocab).as("vocab"),
        (col("st.wsum") - col("st.n_feats").cast("double") * lit(delta))
          .as("log_w"))
  }

  /** DSIR importance RESAMPLING proper — the paper's Gumbel-max trick
    * made deterministic: sampling k documents without replacement with
    * probability ∝ exp(log_w) is exactly taking the top-k of
    * log_w + G_i with standard Gumbel noise G_i = −ln(−ln(u_i))
    * [Vieira 2014 "Gumbel-max trick"]. Here u_i = (splitmix64(id+salt)
    * >>> 11 + 0.5) / 2^53 — a pure hash of (id, salt), so one salt is
    * one reproducible sample and different salts are independent
    * resampling epochs (the [[graft.operators.TextOps.augmentDropout]]
    * convention; [[dsirSelect]] is the noise-free limit). The Gumbel
    * transform takes ln of fractional arguments, so this variant is
    * spec-pinned (bit-exact against an independent model), not
    * oracle-compared. Same TakeOrdered scale shape as dsirSelect. */
  def dsirSample(
      corpus: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      buckets: Int = 1 << 16,
      salt: Long = 31337L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val wts = dsirWeights(corpus, target, idCol, textCol, buckets)
      .select(col(idCol), col("log_w"))
    // u in (0, 1): top 53 bits of the mixed hash, offset by half an ulp
    // so u = 0 (g = −∞) is unreachable
    val u = (shiftrightunsigned(mix64(col(idCol).cast("long"), salt), 11)
      .cast("double") + lit(0.5)) / lit(9007199254740992.0) // 2^53
    val gumbel = -log(-log(u))
    corpus.join(wts, Seq(idCol))
      .withColumn("gumbel_key", col("log_w") + gumbel)
      .orderBy(col("gumbel_key").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic training-shard assignment: shard = splitmix64(id+salt)
    * mod `numShards`, plus the signed mixed hash itself as the
    * within-shard sort key (`shard_ord`). This is the reproducible
    * "global shuffle" every pretraining run needs — the same corpus
    * always lands in the same shard in the same order, independent of
    * partitioning, cluster size, or engine (Bernoulli `repartition` and
    * `rand()` sorts give neither). Narrow: one kernel evaluation per
    * row, no shuffle until the caller repartitions on `shard`. */
  def assignShards(
      docs: DataFrame,
      idCol: String,
      numShards: Int,
      salt: Long = 4243L): DataFrame = {
    require(numShards > 0, s"numShards must be positive, got $numShards")
    val h = mix64(col(idCol).cast("long"), salt)
    docs.withColumn("shard", pmod(h, lit(numShards.toLong)).cast("int"))
      .withColumn("shard_ord", h)
  }

  /** Materialize the shard layout: one directory per shard
    * (`shard=K/`), rows inside each shard sorted by (shard_ord, id).
    * `repartition(col("shard"))` puts each shard's rows in exactly one
    * task, so each shard directory gets one sorted file per write —
    * at scale, raise `spark.sql.shuffle.partitions` past `numShards`
    * and each shard still maps to a single task (hash on the shard
    * value). Sorting is per-partition (`sortWithinPartitions`), never a
    * global sort. */
  def writeShards(
      docs: DataFrame,
      idCol: String,
      numShards: Int,
      path: String,
      salt: Long = 4243L): Unit =
    shardWriter(docs, idCol, numShards, salt).mode("overwrite").parquet(path)

  /** Incremental variant of [[writeShards]]: APPEND a new batch of docs
    * into an existing shard layout (same salt → the same id always lands
    * in the same shard). Each append adds one file per touched shard —
    * after many appends the small files dominate scan cost; run
    * [[compactShards]] to restore the one-sorted-file-per-shard
    * invariant. */
  def appendShards(
      docs: DataFrame,
      idCol: String,
      numShards: Int,
      path: String,
      salt: Long = 4243L): Unit =
    shardWriter(docs, idCol, numShards, salt).mode("append").parquet(path)

  private def shardWriter(
      docs: DataFrame,
      idCol: String,
      numShards: Int,
      salt: Long) =
    assignShards(docs, idCol, numShards, salt)
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_ord"), col(idCol))
      .write.partitionBy("shard")

  /** Compact an appended shard layout back to ONE globally-sorted file
    * per shard: read the whole layout, re-sort each shard by
    * (shard_ord, id), rewrite, then atomically swap directories. The
    * cost is one shuffle of the layout (hash on the shard value — each
    * shard is exactly one task at any `spark.sql.shuffle.partitions`),
    * the same price as the original write; small-file accumulation from
    * incremental appends otherwise degrades every downstream scan
    * (footer reads + non-contiguous IO dominate at 100 TB). The swap is
    * rename-to-backup, rename-tmp-into-place, delete-backup: the layout
    * is present at either the canonical or the backup path at every
    * instant, so a crash mid-swap never loses the canonical copy (a
    * stale `__compact_bak` from a prior crash is cleared first; recovery
    * = rename it back if the canonical path is missing). Concurrent
    * readers still see a brief window where the canonical path is absent
    * — run it when no reader holds the layout open (object stores:
    * prefer writing to a new versioned path and flipping a pointer). */
  def compactShards(spark: SparkSession, path: String, idCol: String): Unit = {
    val src = spark.read.parquet(path)
    require(src.columns.contains("shard") && src.columns.contains("shard_ord"),
      s"$path is not a shard layout (missing shard/shard_ord)")
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    src.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shard_ord"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(tmp)
    val conf = spark.sparkContext.hadoopConfiguration
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val dstPath = new org.apache.hadoop.fs.Path(path)
    val bakPath = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__compact_bak")
    val fs = tmpPath.getFileSystem(conf)
    fs.delete(bakPath, true)
    require(fs.rename(dstPath, bakPath), s"rename $path -> $bakPath failed")
    require(fs.rename(tmpPath, dstPath), s"rename $tmp -> $path failed")
    fs.delete(bakPath, true)
  }

  /** The lazy curation pipeline; separated so plan-shape tests can
    * inspect the pre-materialization plan. Returns (cached slim
    * projection, lazy result) — callers own the unpersist. */
  private[graft] def curatePipeline(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double,
      nearDupThreshold: Double,
      shingleSize: Int,
      numHashes: Int,
      bands: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val slim = annotate(docs, idCol, textCol)
      .withColumn("digest", md5(col(textCol).cast("binary")))
      .withColumn("sig",
        Dedup.minhashSignature(col(textCol), shingleSize, numHashes))
      .drop(textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // exact dedup: keep the smallest id per content digest
    val exactDeduped = slim
      .withColumn("keep_id", min(col(idCol)).over(Window.partitionBy(col("digest"))))
      .where(col(idCol) === col("keep_id"))
      .drop("keep_id")

    // near dedup: LSH candidate pairs above threshold; drop the larger id
    val losers = Dedup.minhashCandidatePairsFromSigs(
        slim.select(col(idCol).as("id"), col("sig")),
        numHashes = numHashes, bands = bands, threshold = nearDupThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val nearDeduped = exactDeduped.join(losers, Seq(idCol), "left_anti")

    (slim, nearDeduped.where(col("quality") >= minQuality).drop("digest", "sig"))
  }

  /** Isotonic regression calibration by pool-adjacent-violators
    * [Ayer et al. 1955; Barlow et al. 1972] over a DISTINCT-SCORE
    * histogram: fits the least-squares NON-DECREASING map score →
    * label rate — how a raw quality-classifier score becomes a
    * trustworthy acceptance probability (Platt-free, shape-free
    * calibration; the monotone fit is exactly what a threshold sweep
    * needs).
    *
    * Scale shape — the standard calibration trick: the heavy input is
    * reduced to ONE keyed aggregation over the (bounded) distinct-score
    * domain; only the histogram (≤ `maxBins` rows, loudly enforced)
    * reaches the driver, where PAV runs in O(bins). Continuous scores
    * must be bucketed upstream (that IS the practice — calibration on
    * raw floats overfits singleton bins).
    *
    * All arithmetic is exact: pools carry (Σlabel, Σcount) longs,
    * the violation test cross-multiplies (never divides), and each
    * score's calibrated value is returned as the gcd-REDUCED fraction
    * (cal_num, cal_den) — so any engine replaying the minimax
    * characterization max_{j≤i} min_{k≥i} mean(j..k) produces the
    * identical pair (the PAV pool mean equals that minimax value).
    * Returns (score, n, n_pos, cal_num, cal_den) ordered by score;
    * cal_num/cal_den is non-decreasing in score. */
  def isotonicCalibrate(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      maxBins: Int = 10000): DataFrame = {
    val spark = df.sparkSession
    val hist = df
      .where(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).cast("long").as("score"))
      .agg(count(lit(1)).as("n"), sum(col(labelCol).cast("long")).as("n_pos"))
      .orderBy(col("score"))
      .limit(maxBins + 1)
      .collect()
    require(hist.length <= maxBins,
      s"isotonicCalibrate: more than $maxBins distinct scores — bucket the " +
        "score upstream (calibration on unbounded domains overfits anyway)")
    val scores = hist.map(_.getLong(0))
    val ws = hist.map(_.getLong(1))
    val ys = hist.map(_.getLong(2))
    // PAV: stack of pools (sumY, sumW, firstBin); merge while the last
    // two pools VIOLATE monotonicity (prev mean > next mean, exact
    // cross-multiplied). Equal means stay unmerged — the reported
    // reduced fraction is identical either way.
    val py = new Array[Long](scores.length)
    val pw = new Array[Long](scores.length)
    val pfrom = new Array[Int](scores.length)
    var top = 0
    for (i <- scores.indices) {
      var y = ys(i); var w = ws(i); var from = i
      while (top > 0 && BigInt(py(top - 1)) * w > BigInt(y) * pw(top - 1)) {
        top -= 1
        y += py(top); w += pw(top); from = pfrom(top)
      }
      py(top) = y; pw(top) = w; pfrom(top) = from
      top += 1
    }
    val calNum = new Array[Long](scores.length)
    val calDen = new Array[Long](scores.length)
    for (p <- 0 until top) {
      val to = if (p + 1 < top) pfrom(p + 1) else scores.length
      val g = BigInt(py(p)).gcd(BigInt(pw(p))).toLong
      for (i <- pfrom(p) until to) {
        calNum(i) = py(p) / g
        calDen(i) = pw(p) / g
      }
    }
    import spark.implicits._
    scores.indices.map(i => (scores(i), ws(i), ys(i), calNum(i), calDen(i)))
      .toDF("score", "n", "n_pos", "cal_num", "cal_den")
  }
}
