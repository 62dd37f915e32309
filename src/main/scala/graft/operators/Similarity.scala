package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShim

/**
 * Approximate-nearest-neighbor search over embedding columns
 * (`array<float>`).
 *
 * Two tiers:
 *  - `bruteForceTopK`: exact cosine top-k — a single narrow map + TakeOrdered.
 *    On a cluster this is a full scan but NO shuffle of vectors: each
 *    partition computes its local top-k and only k rows per partition reach
 *    the driver-side merge. The baseline and the correctness oracle.
 *  - `lshTopK`: sign-random-projection bucketing; only the query's bucket
 *    (plus optional multi-probe neighbors at Hamming distance 1) is scanned.
 *    The scale path: the bucket column can be precomputed and the table
 *    bucketed/partitioned by it, turning a 100 TB scan into a partition-pruned
 *    lookup.
 */
object Similarity {

  def cosine(a: Column, b: Column): Column = cosine_similarity(a, b)

  /** Deterministic hyperplanes for SRP-LSH (fixed xorshift seed — stable
    * across runs, sessions, and engines). */
  def hyperplanes(planes: Int, dim: Int, seed: Long = 0x5dee_ce66d13L): Seq[Seq[Double]] = {
    var s = seed
    def next(): Double = {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
    Seq.fill(planes)(Seq.fill(dim)(next()))
  }

  def srpBucket(vec: Column, planes: Int, dim: Int): Column =
    GraftSqlShim.column(SrpBucket(GraftSqlShim.expression(vec), hyperplanes(planes, dim)))

  /** The deterministic Johnson–Lindenstrauss projection matrix: the SRP
    * hyperplane family scaled by √(3/k) — entries are uniform[−1,1]
    * with variance 1/3, so this makes each projected coordinate
    * unit-variance per unit input norm and the projection
    * norm-preserving in expectation (Achlioptas 2001 shows such
    * bounded-moment families satisfy the JL bound). Projected inner
    * products estimate the originals; downstream ANN/dedup run on
    * k/d-size vectors. Exposed so oracles inline identical literals. */
  def jlPlanes(outDim: Int, dim: Int, seed: Long = 0x5dee_ce66d13L): Seq[Seq[Double]] = {
    val s = math.sqrt(3.0 / outDim.toDouble)
    hyperplanes(outDim, dim, seed).map(_.map(_ * s))
  }

  /** Project a float-vector column to `outDim` dims through [[jlPlanes]]
    * — embedding compression at scan speed (the matrix rides in the
    * plan; no shuffle, no state). Element-order double accumulation +
    * one float rounding per output dim, so values are oracle-exact. */
  def randomProject(vec: Column, outDim: Int, dim: Int,
      seed: Long = 0x5dee_ce66d13L): Column =
    GraftSqlShim.column(MatVecProject(
      GraftSqlShim.expression(vec), jlPlanes(outDim, dim, seed)))

  /** Exact cosine top-k against a literal query vector. */
  def bruteForceTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int): DataFrame = {
    val qLit = typedlit(query)
    df.select(col(idCol), cosine(col(vecCol), qLit).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Recall@k of an approximate retrieval result against the exact one —
    * the evaluation harness every ANN deployment needs next to the index
    * itself (tune nProbe/shortlists by MEASURED recall, not vibes): the
    * fraction of the exact top-k the approximate top-k recovered.
    * Pure set semantics over the id column (rank-agnostic, the standard
    * recall@k definition); returns ONE row (k, n_hit, recall_bp) with
    * recall in integer basis points, so the result is exactly
    * cross-engine comparable. One left-semi equi-join over two k-row
    * frames — negligible at any scale. */
  def recallAtK(
      approx: DataFrame,
      exact: DataFrame,
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // distinct BEFORE the semi-join count: duplicate ids in the approx
    // frame would otherwise inflate n_hit past k (recall_bp > 10000)
    approx.select(col(idCol)).distinct()
      .join(exact.select(col(idCol)), Seq(idCol), "left_semi")
      .agg(count(lit(1)).as("n_hit"))
      .select(lit(k.toLong).as("k"), col("n_hit"),
        expr(s"(10000 * n_hit) div $k").as("recall_bp"))
  }

  /** Exact k-nearest-neighbor JOIN: for EACH query row, the top-k corpus
    * rows by cosine — the batch-retrieval shape (semantic dedup against a
    * seed set, eval-set retrieval, hard-negative mining) that the
    * single-query ops don't cover.
    *
    * Scale design: the query side is collected to the driver (guarded by
    * `maxQueries` with a loud failure — it is the SMALL side by contract)
    * and broadcast as a dense matrix; the corpus is scanned ONCE with a
    * per-partition bounded heap per query (`mapPartitions` — a cross-row
    * bounded-state fold that no Expression or built-in aggregate
    * expresses), so the only shuffled rows are the candidates:
    * numPartitions × M × k, never the M × N cross product a
    * crossJoin+window plan would exchange. A final window top-k over the
    * tiny candidate set settles ranks. Ranking is (cosine ROUNDED to 6
    * decimals DESC, corpus id ASC) — rounded so the DuckDB oracle's
    * float folds agree bit-for-bit with the JVM's (q_knn_join). The
    * rounding happens BEFORE heap insertion (HALF_UP, same as Spark's
    * `round`): ranking exact values inside the heap but rounded ones in
    * the final window would evict rounded-tied rows in id-DESC order at
    * the k boundary — a partitioning-dependent, oracle-diverging order.
    * Zero-norm and NULL vectors on either side never match (cosine is
    * undefined there; skipped, not NaN-ranked). Output: `qid` (the query
    * id — fixed name so corpus and queries may share an id column name),
    * `idCol`, `cos`, one row per (query, neighbor). */
  def knnJoin(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      maxQueries: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows = queries
      .select(col(qIdCol).cast("long"), col(qVecCol))
      .where(col(qIdCol).isNotNull && col(qVecCol).isNotNull)
      .limit(maxQueries + 1).collect()
    require(qRows.length <= maxQueries,
      s"query side exceeds maxQueries=$maxQueries rows — knnJoin broadcasts " +
        "the queries by design; raise maxQueries only if they fit the driver")
    val qIds = qRows.map(_.getLong(0))
    val qVecs = qRows.map(_.getSeq[Float](1).toArray)
    val qNorms = qVecs.map(v => math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)))
    val bc = spark.sparkContext.broadcast((qIds, qVecs, qNorms))
    val data = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Float])]
    knnTopK(knnCandidateScan(data, bc, k), idCol, k)
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * query, the exact top-k most-similar corpus vectors with a DIFFERENT
    * label — the "closest wrong answers" a contrastive loss learns the
    * most from. Composed from [[knnJoin]] without touching its kernel:
    * one knnJoin per distinct query label, each against the
    * opposite-label corpus slice, unioned into ONE plan. The label
    * filter is applied BEFORE the heaps, so the result is exact (a
    * filter-after-top-k would silently return fewer than k when near
    * neighbors share the query's label — the common case, since that is
    * what embeddings cluster by).
    *
    * Scale contract: the corpus is scanned once per distinct query label
    * (`maxLabels` guards the plan width) — right for class/source/domain
    * label cardinalities in the tens; for high-cardinality labels route
    * through [[knnJoinByCell]] with an over-fetch and post-filter
    * instead. Queries obey [[knnJoin]]'s broadcast contract.
    *
    * NULL-labeled corpus rows are EXCLUDED from every negative pool, by
    * design: an unlabeled vector's class is unknown, so using it as a
    * negative risks pairing the query with a same-class example — the
    * one mistake a contrastive loss cannot absorb. Label the corpus (or
    * bucket unlabeled rows under an explicit sentinel label) to opt
    * them in. */
  def hardNegatives(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      qLabelCol: String,
      k: Int,
      maxQueries: Int = 4096,
      maxLabels: Int = 64): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val labels = queries
      .where(col(qLabelCol).isNotNull)
      .select(col(qLabelCol)).distinct()
      .limit(maxLabels + 1).collect().map(_.get(0))
    require(labels.length <= maxLabels,
      s"query side has more than maxLabels=$maxLabels distinct labels — " +
        "each label adds a corpus scan; use knnJoinByCell + post-filter instead")
    require(labels.nonEmpty, "query side has no labeled rows")
    labels.map { l =>
      knnJoin(corpus.where(col(labelCol) =!= lit(l)), idCol, vecCol,
        queries.where(col(qLabelCol) === lit(l)), qIdCol, qVecCol,
        k, maxQueries)
    }.reduce(_ unionAll _)
  }

  /** head = lowest cos, then highest id — the per-partition bounded-heap
    * eviction order shared by the kNN joins. */
  private val knnWorstFirst = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  /** One corpus pass scoring every row against the broadcast query matrix
    * with per-partition bounded heaps (the [[knnJoin]] kernel, factored so
    * [[knnJoinBatched]] reuses it per batch). Emits (qid, corpus id, cos)
    * candidates: numPartitions × M × k rows, never M × N. */
  private def knnCandidateScan(
      data: org.apache.spark.sql.Dataset[(Long, Array[Float])],
      bc: org.apache.spark.broadcast.Broadcast[(Array[Long], Array[Array[Float]], Array[Double])],
      k: Int): org.apache.spark.sql.Dataset[(Long, Long, Double)] = {
    import data.sparkSession.implicits._
    data.mapPartitions { it =>
      val (ids, vecs, norms) = bc.value
      val m = ids.length
      val heaps = Array.fill(m)(new scala.collection.mutable.PriorityQueue[(Double, Long)]()(knnWorstFirst))
      it.foreach { case (id, v) =>
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
        val norm = math.sqrt(n)
        if (norm > 0.0) {
          var qi = 0
          while (qi < m) {
            if (norms(qi) > 0.0) {
              val qv = vecs(qi)
              val d = math.min(qv.length, v.length)
              var dot = 0.0
              var j = 0
              while (j < d) { dot += qv(j).toDouble * v(j); j += 1 }
              val cos = java.math.BigDecimal.valueOf(dot / (norm * norms(qi)))
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
              val cand = (cos, id)
              val h = heaps(qi)
              if (h.size < k) h.enqueue(cand)
              else if (knnWorstFirst.compare(cand, h.head) < 0) { h.dequeue(); h.enqueue(cand) }
            }
            qi += 1
          }
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (cos, id) => (ids(qi), id, cos) }
      }
    }
  }

  /** Settle final per-query ranks over the tiny candidate set. */
  private def knnTopK(
      cands: org.apache.spark.sql.Dataset[(Long, Long, Double)],
      idCol: String,
      k: Int): DataFrame =
    cands.toDF("qid", idCol, "cos")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(desc("cos"), col(idCol))))
      .where(col("__rn") <= k)
      .select(col("qid"), col(idCol), col("cos"))

  /** [[knnJoin]] without the driver cap: the query side is streamed to the
    * driver ONE PARTITION AT A TIME (`toLocalIterator` — the full query
    * set is never resident) and broadcast in `batchSize`-row batches; each
    * batch is one [[knnCandidateScan]] corpus pass, all batches union into
    * ONE plan with a single final per-qid top-k window. Results are
    * row-identical to [[knnJoin]] at any batchSize (OperatorsSpec pins the
    * equivalence at 20k queries against a raised-cap knnJoin).
    *
    * Cost model at scale: ceil(M / batchSize) corpus scans — cache or
    * co-locate the corpus when M >> batchSize — against per-executor
    * memory of batchSize × (dim × 4 B broadcast + k × 24 B heap state)
    * per concurrently-running scan; the default 65536 at dim = 128,
    * k = 10 is ~34 MB + ~16 MB, comfortable on a stock executor. The
    * corpus side still never shuffles and carries zero Join operators
    * (candidates-only exchange, PlanQualitySpec); for query sets so large
    * that even batched rescans dominate, use [[knnJoinIvf]]'s
    * cell-pruned variant instead. */
  def knnJoinBatched(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      batchSize: Int = 65536): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    val spark = corpus.sparkSession
    import spark.implicits._
    val data = corpus
      .select(col(idCol).cast("long"), col(vecCol))
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Float])]
    val qIt = queries
      .select(col(qIdCol).cast("long"), col(qVecCol))
      .where(col(qIdCol).isNotNull && col(qVecCol).isNotNull)
      .as[(Long, Array[Float])]
      .toLocalIterator()
    var union: org.apache.spark.sql.Dataset[(Long, Long, Double)] = null
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    def flush(): Unit = if (buf.nonEmpty) {
      val qIds = buf.map(_._1).toArray
      val qVecs = buf.map(_._2).toArray
      val qNorms = qVecs.map(v => math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)))
      val bc = spark.sparkContext.broadcast((qIds, qVecs, qNorms))
      val scan = knnCandidateScan(data, bc, k)
      union = if (union == null) scan else union.union(scan)
      buf.clear()
    }
    while (qIt.hasNext) {
      buf += qIt.next()
      if (buf.size >= batchSize) flush()
    }
    flush()
    if (union == null) spark.emptyDataset[(Long, Long, Double)].toDF("qid", idCol, "cos")
    else knnTopK(union, idCol, k)
  }

  /** IVF-pruned batch kNN join — [[knnJoin]]'s scale path: each query
    * scores ONLY the corpus rows in its `nProbe` nearest coarse cells.
    * Conventions mirror the single-query IVF search exactly (q_ann_ivf's
    * oracle replays them value-level): Lloyd training over the capped
    * id-ordered sample, probe ties → smallest cell, assignment ties →
    * largest cell ([[cellAssignment]]), RAW-cosine selection (rounded
    * only for display), zero-norm vectors excluded outright.
    *
    * Scale design: on top of [[knnJoin]]'s candidates-only shuffle, the
    * corpus scan carries a `cell IN (union of probed cells)` filter.
    * With the default (cellCol = null) the cell is recomputed from
    * `vecCol` as an expression — that filter saves SCORING work only; a
    * derived-expression predicate cannot prune a `cell=`-partitioned
    * parquet read. To get a genuinely partition-pruned read (at most
    * nProbe·M/nCells of the data touched on disk), persist the corpus
    * `partitionBy("cell")` with [[cellAssignment]] over the SAME trained
    * centroids and pass that column name as `cellCol`: the `IN` then
    * lands on a partition column and Spark prunes directories before IO.
    * Each surviving row is scored only against the queries that probed
    * its cell. Output: `qid`, `idCol`, `cos`
    * (top-k per query among its probed cells — approximate exactly where
    * IVF is: a true neighbor outside the probed cells is missed;
    * [[knnJoin]] is the exact oracle). */
  def knnJoinIvf(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      sampleSize: Int = 2048,
      iters: Int = 5,
      maxQueries: Int = 4096,
      trainedCentroids: Array[Array[Float]] = null,
      cellCol: String = null): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1 && nProbe <= nCells,
      s"nProbe must be in [1, $nCells], got $nProbe")
    require(cellCol == null || trainedCentroids != null,
      "cellCol requires trainedCentroids: a persisted cell layout is only " +
        "valid for the exact centroids it was assigned with — retraining " +
        "here would silently probe the wrong cells")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents0 =
      if (trainedCentroids != null) trainedCentroids
      else trainCentroids(corpus, idCol, vecCol, nCells, sampleSize, iters)
    val cents = cents0.zipWithIndex.map(_.swap)
    val centNorms = cents0.map(c =>
      math.sqrt(c.foldLeft(0.0)((a, x) => a + x.toDouble * x)))
    val qRows = queries
      .select(col(qIdCol).cast("long"), col(qVecCol))
      .where(col(qIdCol).isNotNull && col(qVecCol).isNotNull)
      .limit(maxQueries + 1).collect()
    require(qRows.length <= maxQueries,
      s"query side exceeds maxQueries=$maxQueries rows — knnJoinIvf broadcasts " +
        "the queries by design; raise maxQueries only if they fit the driver")
    val qIds = qRows.map(_.getLong(0))
    val qVecs = qRows.map(_.getSeq[Float](1).toArray)
    val qNorms = qVecs.map(v => math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)))
    // per-query probe masks: top-nProbe cells by guarded cosine, ties →
    // smallest cell (the oracle's `pr` CTE ordering)
    val probeMask: Array[Array[Boolean]] = qVecs.zip(qNorms).map { case (qv, qn) =>
      val keep = cents.map { case (cell, c) =>
        val cn = centNorms(cell)
        val s = if (qn == 0.0 || cn == 0.0) -2.0 else {
          val d = math.min(qv.length, c.length)
          var dot = 0.0; var i = 0
          while (i < d) { dot += qv(i).toDouble * c(i); i += 1 }
          dot / (qn * cn)
        }
        (s, cell)
      }.sortBy { case (s, cell) => (-s, cell) }.take(nProbe).map(_._2).toSet
      Array.tabulate(nCells)(keep.contains)
    }
    val unionCells = probeMask.flatMap(m => m.indices.filter(m)).distinct.sorted
    val bc = spark.sparkContext.broadcast((qIds, qVecs, qNorms, probeMask))
    val worstFirst = knnWorstFirst // one shared eviction/tie-break order
    val cellExpr =
      if (cellCol != null) col(cellCol).cast("int")
      else cellAssignment(col(vecCol), cents)
    val data = corpus
      .select(col(idCol).cast("long"), col(vecCol), cellExpr.as("__cell"))
      .where(col("__cell").isin(unionCells.toIndexedSeq.map(Integer.valueOf): _*))
      .where(col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Long, Array[Float], Int)]
    val cands = data.mapPartitions { it =>
      val (ids, vecs, norms, masks) = bc.value
      val m = ids.length
      val heaps = Array.fill(m)(new scala.collection.mutable.PriorityQueue[(Double, Long)]()(worstFirst))
      it.foreach { case (id, v, cell) =>
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
        val norm = math.sqrt(n)
        if (norm > 0.0) {
          var qi = 0
          while (qi < m) {
            if (norms(qi) > 0.0 && masks(qi)(cell)) {
              val qv = vecs(qi)
              val d = math.min(qv.length, v.length)
              var dot = 0.0
              var j = 0
              while (j < d) { dot += qv(j).toDouble * v(j); j += 1 }
              val cand = (dot / (norm * norms(qi)), id)
              val h = heaps(qi)
              if (h.size < k) h.enqueue(cand)
              else if (worstFirst.compare(cand, h.head) < 0) { h.dequeue(); h.enqueue(cand) }
            }
            qi += 1
          }
        }
      }
      heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
        h.iterator.map { case (cos, id) => (ids(qi), id, cos) }
      }
    }
    cands.toDF("qid", idCol, "cos_raw")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(desc("cos_raw"), col(idCol))))
      .where(col("__rn") <= k)
      .select(col("qid"), col(idCol), round(col("cos_raw"), 6).as("cos"))
  }

  /** FULLY DISTRIBUTED IVF kNN join — no driver involvement on either
    * data side (only the capped centroid training touches the driver):
    * queries fan out to their `nProbe` probed cells with a narrow
    * flatMap, the corpus maps to its assigned cell, both sides
    * hash-partition ONCE on the cell id, and a `cogroup` scores each
    * cell's corpus rows against only the queries that probed that cell
    * with per-query bounded heaps — candidate rows out are
    * |probes| × k, never a pair explosion. A final window settles global
    * top-k per query. This is the scale path past both driver caps: the
    * broadcast variants ([[knnJoin]], [[knnJoinIvf]], [[knnJoinBatched]])
    * bound the QUERY side by driver/executor memory; here both sides are
    * arbitrarily large (the regime where even batched corpus rescans
    * dominate).
    *
    * Results are ROW-IDENTICAL to [[knnJoinIvf]] for the same
    * `trainedCentroids` (OperatorsSpec pins the equivalence; q_knn_cells
    * shares q_knn_ivf's value-level training-replay oracle verbatim):
    * same probe rule (top-nProbe guarded cosine, ties → smallest cell),
    * same assignment ([[cellAssignment]], ties → largest cell), same
    * RAW-cosine selection with (cos DESC, id ASC) ties, rounded only for
    * display, zero-norm vectors on either side excluded outright.
    *
    * Cost model at 100 TB: one Exchange of each side keyed on cell
    * (corpus rows cross the wire once — cache the assigned corpus to
    * amortize across query batches), cogroup task memory = the queries
    * probing one cell (~M × nProbe / nCells × (dim × 4 + k × 24) B) —
    * size nCells so that holds; a hot cell is a genuine data-skew
    * signal (retrain with more cells). Corpus rows in unprobed cells
    * still shuffle (no IN-pushdown here); with a large query set every
    * cell is probed anyway, and for small query sets use
    * [[knnJoinIvf]]. */
  def knnJoinByCell(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      sampleSize: Int = 2048,
      iters: Int = 5,
      trainedCentroids: Array[Array[Float]] = null,
      cellCol: String = null): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(nProbe >= 1 && nProbe <= nCells,
      s"nProbe must be in [1, $nCells], got $nProbe")
    require(cellCol == null || trainedCentroids != null,
      "cellCol requires trainedCentroids: a persisted cell layout is only " +
        "valid for the exact centroids it was assigned with")
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents0 =
      if (trainedCentroids != null) trainedCentroids
      else trainCentroids(corpus, idCol, vecCol, nCells, sampleSize, iters)
    val cents = cents0.zipWithIndex.map(_.swap)
    val centNorms = cents0.map(c =>
      math.sqrt(c.foldLeft(0.0)((a, x) => a + x.toDouble * x)))
    val bcC = spark.sparkContext.broadcast((cents0, centNorms))
    // query fan-out: (cell, qid, qvec) — the same probe arithmetic
    // knnJoinIvf runs on the driver, here a narrow distributed flatMap
    val qCells = queries
      .select(col(qIdCol).cast("long"), col(qVecCol))
      .where(col(qIdCol).isNotNull && col(qVecCol).isNotNull)
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val (cs, cns) = bcC.value
        it.flatMap { case (qid, qv) =>
          var n = 0.0
          var i = 0
          while (i < qv.length) { n += qv(i).toDouble * qv(i); i += 1 }
          val qn = math.sqrt(n)
          if (qn == 0.0) Iterator.empty // zero-norm query matches nothing
          else {
            val scored = cs.indices.map { cell =>
              val cn = cns(cell)
              val s = if (cn == 0.0) -2.0 else {
                val c = cs(cell)
                val d = math.min(qv.length, c.length)
                var dot = 0.0; var j = 0
                while (j < d) { dot += qv(j).toDouble * c(j); j += 1 }
                dot / (qn * cn)
              }
              (s, cell)
            }
            scored.sortBy { case (s, cell) => (-s, cell) }.take(nProbe)
              .iterator.map { case (_, cell) => (cell, qid, qv) }
          }
        }
      }
    val cellExpr =
      if (cellCol != null) col(cellCol).cast("int")
      else cellAssignment(col(vecCol), cents)
    val data = corpus
      .select(cellExpr.as("__cell"), col(idCol).cast("long"), col(vecCol))
      // __cell can be NULL only on the cellCol path (a persisted layout
      // with missing cells); drop such rows like knnJoinIvf's isin does
      // instead of crashing the non-nullable tuple decode
      .where(col("__cell").isNotNull && col(idCol).isNotNull && col(vecCol).isNotNull)
      .as[(Int, Long, Array[Float])]
    val cands = data.groupByKey(_._1)
      .cogroup(qCells.groupByKey(_._1)) { (_, corpusIt, queryIt) =>
        val qs = queryIt.toArray // queries probing this cell — bounded
        if (qs.isEmpty) Iterator.empty
        else {
          val qNorms = qs.map { case (_, _, qv) =>
            math.sqrt(qv.foldLeft(0.0)((a, x) => a + x.toDouble * x))
          }
          val heaps = Array.fill(qs.length)(
            new scala.collection.mutable.PriorityQueue[(Double, Long)]()(knnWorstFirst))
          corpusIt.foreach { case (_, id, v) =>
            var n = 0.0
            var i = 0
            while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
            val norm = math.sqrt(n)
            if (norm > 0.0) {
              var qi = 0
              while (qi < qs.length) {
                val qv = qs(qi)._3
                val d = math.min(qv.length, v.length)
                var dot = 0.0
                var j = 0
                while (j < d) { dot += qv(j).toDouble * v(j); j += 1 }
                val cand = (dot / (norm * qNorms(qi)), id)
                val h = heaps(qi)
                if (h.size < k) h.enqueue(cand)
                else if (knnWorstFirst.compare(cand, h.head) < 0) { h.dequeue(); h.enqueue(cand) }
                qi += 1
              }
            }
          }
          heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
            h.iterator.map { case (cos, id) => (qs(qi)._2, id, cos) }
          }
        }
      }
    cands.toDF("qid", idCol, "cos_raw")
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("qid")).orderBy(desc("cos_raw"), col(idCol))))
      .where(col("__rn") <= k)
      .select(col("qid"), col(idCol), round(col("cos_raw"), 6).as("cos"))
  }

  /** Train IVF centroids with Lloyd iterations over a bounded,
    * deterministic sample (id-ordered limit — reproducible across runs).
    * The sample is driver-side by design: it is CAPPED, independent of
    * corpus size, and k-means on it is microseconds; the full corpus is
    * only ever touched by the narrow cell-assignment map. */
  def trainCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      sampleSize: Int = 2048,
      iters: Int = 5): Array[Array[Float]] = {
    val sample = sampleVectors(df, idCol, vecCol, sampleSize)
    kmeansCosine(sample, k, iters)
  }

  /** Capped, deterministic (id-ordered) training sample. */
  private def sampleVectors(
      df: DataFrame, idCol: String, vecCol: String, n: Int): Array[Array[Float]] = {
    val sample: Array[Array[Float]] = df
      .orderBy(col(idCol)).limit(n)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(sample.nonEmpty, "empty training sample")
    sample
  }

  /** Lloyd iterations with argmax-cosine assignment (ties → first index),
    * sample-order mean accumulation, float rounding — the exact arithmetic
    * the SQL oracles replay. */
  private def kmeansCosine(
      sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Float]] = {
    val dim = sample(0).length
    var centroids = Array.tabulate(math.min(k, sample.length))(i => sample(i).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      sample.foreach { v =>
        var best = 0
        var bestCos = -2.0
        for (c <- centroids.indices) {
          val cos = cosArr(v, centroids(c))
          if (cos > bestCos) { bestCos = cos; best = c }
        }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }.toArray
    }
    centroids
  }

  private def cosArr(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val m = math.min(a.length, b.length)
    while (i < m) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) -2.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** IVF (inverted-file) approximate top-k: vectors are assigned to their
    * nearest centroid's cell; a query probes only the `nProbe` cells whose
    * centroids are closest to it. Pass `centroids` from `trainCentroids`
    * for refined cells, or omit to use a deterministic data sample
    * (ids 0..C-1) — assignment, probing, and pruning behave identically.
    *
    * Scale path: cell assignment is a narrow map; persisting the table
    * partitioned by cell turns every query into a partition-pruned read of
    * nProbe/C of the data. Centroids are driver-held (C×dim floats — tiny)
    * and ship to executors inside the expression, i.e. an implicit
    * broadcast. */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      trainedCentroids: Array[Array[Float]] = null): DataFrame = {
    val centroids: Array[(Int, Array[Float])] =
      if (trainedCentroids != null) trainedCentroids.zipWithIndex.map(_.swap)
      else df
        .where(col(idCol) < nCells)
        .select(col(idCol).cast("int"), col(vecCol))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val probeCells = centroids.sortBy { case (_, c) => -cosArr(query, c) }
      .take(nProbe).map(_._1)
    val qLit = typedlit(query)
    df.select(col(idCol), col(vecCol), cellAssignment(col(vecCol), centroids).as("cell"))
      .where(col("cell").isin(probeCells.toIndexedSeq.map(Integer.valueOf): _*))
      .select(col(idCol), cosine(col(vecCol), qLit).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** IVF cell id (argmax-cosine centroid index) for a vector column — an
    * expression tree of C cosine kernels; C is small by construction.
    * This is the column to PARTITION (or bucket) a 100 TB embedding table
    * by: `df.withColumn("cell", cellAssignment(...)).write.partitionBy
    * ("cell")` turns every IVF probe into a partition-pruned read of
    * nProbe/C of the data (PlanQualitySpec proves the pruning). */
  def cellAssignment(vec: Column, centroids: Array[(Int, Array[Float])]): Column = {
    val scored = centroids.map { case (id, c) =>
      struct(coalesce(cosine(vec, typedlit(c)), lit(-2.0)).as("score"),
        lit(id).as("cell"))
    }
    if (scored.length == 1) scored.head.getField("cell")
    else greatest(scored.toIndexedSeq: _*).getField("cell")
  }

  /** BUILD the persisted IVF layout — the [[ivfTopK]] scaladoc's
    * "partition by cell" recipe as working code, completing the
    * incremental-index family (inverted, token-screen, HNSW, and now
    * IVF): Lloyd-trained centroids (or caller-supplied ones), one
    * narrow assignment map, `partitionBy("cell")` parquet, centroids
    * serialized in the layout's `_graft_meta` (underscore prefix →
    * invisible to the data read) so append/query never retrain.
    * Returns the centroids for callers that also query in-session. */
  def buildIvfIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nCells: Int = 16,
      sampleSize: Int = 2048,
      iters: Int = 5,
      trainedCentroids: Array[Array[Float]] = null): Array[Array[Float]] = {
    val cents =
      if (trainedCentroids != null) trainedCentroids
      else trainCentroids(df, idCol, vecCol, nCells, sampleSize, iters)
    val pairs = cents.zipWithIndex.map(_.swap)
    val spark = df.sparkSession
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
        cellAssignment(col(vecCol), pairs).as("cell"))
      .where(col("id").isNotNull && col("vec").isNotNull)
      .write.mode("overwrite").partitionBy("cell").parquet(dir)
    import spark.implicits._
    pairs.toSeq.map { case (c, v) => (c, v.toSeq) }
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"${dir.stripSuffix("/")}/_graft_meta")
    cents
  }

  private def readIvfMeta(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Array[(Int, Array[Float])] =
    spark.read.parquet(s"${dir.stripSuffix("/")}/_graft_meta")
      .select(col("cell").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1)

  /** Append rows to a [[buildIvfIndex]] layout — the cheapest append of
    * the index family, and the reason IVF is the 100 TB ingestion shape:
    * the centroids are FROZEN at build time (read from `_graft_meta`),
    * so an append is ONE narrow assignment map + `mode("append")` into
    * the cell partitions — O(new) compute AND O(new) write, no rewrite
    * of existing data (vs [[appendToHnswIndex]]'s full layout rewrite).
    * Cell contents are SETS — assignment is order-independent — so
    * build(base) + append(rest) is query-identical to building over
    * base ∪ rest with the same centroids (spec-pinned), with no id-
    * ordering contract at all. The postings discipline
    * ([[graft.operators.TextOps.appendToInvertedIndex]]) applies:
    * appends accumulate one file batch per call; re-layout with a
    * compaction pass if file counts ever matter. */
  def appendToIvfIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String): Unit = {
    val pairs = readIvfMeta(df.sparkSession, dir)
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
        cellAssignment(col(vecCol), pairs).as("cell"))
      .where(col("id").isNotNull && col("vec").isNotNull)
      .write.mode("append").partitionBy("cell").parquet(dir)
  }

  /** Query a [[buildIvfIndex]] layout: probe the `nProbe` stored cells
    * nearest the query (the [[ivfTopK]] rule exactly — cosine desc,
    * stable tie → smallest cell) with a filter on the PARTITION column,
    * so the scan is a genuinely partition-pruned read of nProbe/C of
    * the data on disk (PlanQualitySpec pins the pruned read) — the
    * claim [[ivfTopK]]'s expression-derived cell filter cannot make.
    * Selection is RAW cosine (rounded only by callers for display),
    * identical answers to [[ivfTopK]] over the same centroids. */
  def ivfTopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      query: Array[Float],
      k: Int,
      nProbe: Int = 4,
      idOut: String = "id"): DataFrame = {
    require(k >= 1 && nProbe >= 1, s"bad budgets: k=$k nProbe=$nProbe")
    val pairs = readIvfMeta(spark, dir)
    val probeCells = pairs.sortBy { case (_, c) => -cosArr(query, c) }
      .take(nProbe).map(_._1)
    val qLit = typedlit(query)
    spark.read.parquet(dir)
      .where(col("cell").isin(probeCells.toIndexedSeq.map(Integer.valueOf): _*))
      .select(col("id").as(idOut), cosine(col("vec"), qLit).as("cos"))
      .orderBy(desc("cos"), col(idOut))
      .limit(k)
  }

  /** Squared L2 distance, double accumulation in element order. */
  private def l2Arr(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0
    var i = 0
    val m = math.min(a.length, b.length)
    while (i < m) {
      val diff = a(i).toDouble - b(i).toDouble
      d += diff * diff
      i += 1
    }
    d
  }

  /** Train product-quantization codebooks: the vector space is split into
    * `m` equal subspaces and each gets its own `k`-entry codebook from
    * Lloyd iterations (L2, ties → smallest code) over the same capped
    * id-ordered sample trainCentroids uses — driver-side by design
    * (sample is bounded; the corpus is only ever touched by the narrow
    * encode map). Returns codebooks(s)(j) = subspace-s centroid j. */
  def trainPqCodebooks(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int = 16,
      k: Int = 16,
      sampleSize: Int = 2048,
      iters: Int = 3): Array[Array[Array[Float]]] = {
    val sample = sampleVectors(df, idCol, vecCol, sampleSize)
    pqCodebooksOf(sample, m, k, iters)
  }

  /** Per-subspace L2 Lloyd iterations over an in-memory sample (ties →
    * smallest code, sample-order mean accumulation, float rounding). */
  private def pqCodebooksOf(
      sample: Array[Array[Float]], m: Int, k: Int, iters: Int): Array[Array[Array[Float]]] = {
    val dim = sample(0).length
    require(m > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    Array.tabulate(m) { s =>
      val svecs = sample.map(v => v.slice(s * sub, (s + 1) * sub))
      var cents = Array.tabulate(math.min(k, svecs.length))(i => svecs(i).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Int](cents.length)
        svecs.foreach { v =>
          var best = 0
          var bestD = Double.MaxValue
          for (c <- cents.indices) {
            val d = l2Arr(v, cents(c))
            if (d < bestD) { bestD = d; best = c }
          }
          counts(best) += 1
          var i = 0
          while (i < sub) { sums(best)(i) += v(i); i += 1 }
        }
        cents = cents.indices.map { c =>
          if (counts(c) == 0) cents(c)
          else Array.tabulate(sub)(i => (sums(c)(i) / counts(c)).toFloat)
        }.toArray
      }
      cents
    }
  }

  /** PQ-compressed approximate top-k by asymmetric distance computation:
    * vectors are encoded to `m` codebook indices (16-32× compression);
    * a query builds an m×k dot-product lookup table driver-side and the
    * scan scores every row with m table lookups — no float vector is
    * read after encoding.
    *
    * Scale path: persist the CODE column once
    * (`df.withColumn("pq_codes", pq_encode(...))` → parquet); a 100 TB
    * float corpus becomes ~3 TB of codes that stay in memory, and every
    * query is a narrow scan of the codes plus a driver-side top-k merge
    * (TakeOrderedAndProject — same no-vector-shuffle property as
    * bruteForceTopK). Recall is tunable via m/k; re-rank the top
    * candidates with exact cosine when the raw vectors are retained. */
  def pqTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      m: Int = 16,
      codesPerSub: Int = 16,
      trainedCodebooks: Array[Array[Array[Float]]] = null,
      sampleSize: Int = 2048,
      iters: Int = 3): DataFrame = {
    val cb =
      if (trainedCodebooks != null) trainedCodebooks
      else trainPqCodebooks(df, idCol, vecCol, m, codesPerSub, sampleSize, iters)
    val sub = query.length / cb.length
    require(query.length == cb.length * sub, "query dim must divide into subspaces")
    // ADC lookup table: t(s)(j) = dot(query subspace s, codebook(s)(j)),
    // double accumulation in element order (oracle-replicable)
    val table: Seq[Seq[Double]] = cb.toIndexedSeq.zipWithIndex.map { case (cents, s) =>
      cents.toIndexedSeq.map { c =>
        var dot = 0.0
        var i = 0
        while (i < sub) { dot += query(s * sub + i).toDouble * c(i).toDouble; i += 1 }
        dot
      }
    }
    val cbSeq: Seq[Seq[Seq[Float]]] = cb.toIndexedSeq.map(_.toIndexedSeq.map(_.toIndexedSeq))
    df.select(col(idCol), pq_encode(col(vecCol), cbSeq).as("pq_codes"))
      .select(col(idCol), pq_adc_score(col("pq_codes"), table).as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** One symmetric scalar-quantized code: clamp(floor(v·127/absmax),
    * −127, 127), every operation in double (float inputs convert
    * exactly). The single shared definition both the [[SqEncode]] kernel
    * and the driver-side query encode use — divergence here would
    * silently skew ranking. absmax ≤ 0 → 0. */
  private[graft] def sqQuantize(v: Float, absmax: Float): Int = {
    if (absmax <= 0f) 0
    else {
      val d = math.floor(v.toDouble * 127.0 / absmax.toDouble)
      if (d < -127.0) -127 else if (d > 127.0) 127 else d.toInt
    }
  }

  /** Train per-tensor symmetric int8 scalar quantization: the one global
    * scale absmax = max |v[i]| over the whole corpus. One narrow scan
    * into a singleton aggregate; the model is a single float. Per-tensor
    * (not per-dimension) on purpose: a shared scale is what lets the
    * integer code dot rank like the true dot — per-dim offsets would
    * require float dequantized scoring. */
  def trainSq(df: DataFrame, vecCol: String): Float = {
    val r = df.select(posexplode(col(vecCol)).as(Seq("__i", "__v")))
      .agg(max(abs(col("__v"))).as("am")).head()
    if (r.isNullAt(0)) 0f else r.getFloat(0)
  }

  /** SQ8 approximate top-k: corpus vectors encode to int8 codes (the
    * fused [[SqEncode]] kernel — 4× smaller than float32, the memory
    * lever when PQ's 16-32× is too lossy), the query encodes driver-side
    * with the SAME arithmetic, and ranking is the INTEGER dot product of
    * code vectors — exact integer accumulation is order-free, so
    * distributed ranking needs no float-order pinning at all (simpler
    * determinism story than PQ's double ADC folds). Narrow scan +
    * TakeOrdered, zero Exchange, same plan shape as [[pqTopK]].
    * Ties break by id. Recall recovery: re-rank the shortlist with exact
    * cosine like [[ivfPqRerankTopK]] when raw vectors are retained. */
  def sqTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      trainedAbsmax: Float = -1f): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val absmax = if (trainedAbsmax >= 0f) trainedAbsmax else trainSq(df, vecCol)
    val qCodes = query.map(v => sqQuantize(v, absmax))
    val enc = GraftSqlShim.column(
      SqEncode(GraftSqlShim.expression(col(vecCol)), absmax))
    val dot = GraftSqlShim.column(IntDot(
      GraftSqlShim.expression(col("__sq_codes")),
      GraftSqlShim.expression(typedlit(qCodes.toSeq))))
    df.select(col(idCol), enc.as("__sq_codes"))
      .select(col(idCol), dot.as("dot"))
      .orderBy(desc("dot"), col(idCol))
      .limit(k)
  }

  /** Binary-quantization ANN: corpus vectors encode to ONE long each
    * (the fused [[BqEncode]] sign-bit kernel — 64× smaller than
    * float32), the query encodes driver-side with the same rule, and
    * the shortlist is the `shortlist` smallest (popcount(code XOR
    * qcode), id) rows — integer Hamming ranking, fully deterministic,
    * no float order anywhere until the final exact-cosine re-rank of
    * the shortlist recovers the quantization loss. Train-free (no
    * codebooks, no sample pass): the index IS the code column.
    *
    * Scale shape: one codegen scan computes codes + Hamming, the
    * shortlist rides a TakeOrdered, and only `shortlist` rows ever
    * carry their raw vectors to the re-rank — at 100 TB the scan
    * touches 8 bytes per vector instead of 256, which is the whole
    * point. Defaults to a 4k shortlist for k. */
  def bqTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      shortlist: Int = -1): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(query.length <= 64,
      s"bqTopK supports at most 64 dims, got ${query.length}")
    val sl = if (shortlist > 0) shortlist else 4 * k
    require(sl >= k, s"shortlist $sl must be >= k $k")
    val qCode = query.zipWithIndex.foldLeft(0L) { case (c, (v, i)) =>
      if (v > 0f) c | (1L << i) else c
    }
    val enc = GraftSqlShim.column(BqEncode(GraftSqlShim.expression(col(vecCol))))
    df.select(col(idCol), col(vecCol), enc.as("__bq"))
      .select(col(idCol), col(vecCol),
        bit_count(col("__bq").bitwiseXOR(lit(qCode))).cast("long").as("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(sl)
      .select(col(idCol), col("hamming"),
        round(cosine(col(vecCol), typedlit(query.toSeq)), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** IVF × binary quantization — the two pruning levers composed: the
    * probe filter prunes WHICH rows are read (the cell column is the
    * partition key at rest, so probes become partition-pruned scans),
    * and the sign-code Hamming shortlist prunes WHICH rows carry their
    * float vectors to the exact-cosine re-rank (8 bytes scanned per
    * probed vector instead of 256). Same contract as [[bqTopK]] with
    * [[ivfTopK]]'s probing; train-free beyond the coarse centroids. */
  def ivfBqTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      shortlist: Int = -1,
      trainedCentroids: Array[Array[Float]] = null): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(query.length <= 64,
      s"ivfBqTopK supports at most 64 dims, got ${query.length}")
    val sl = if (shortlist > 0) shortlist else 4 * k
    require(sl >= k, s"shortlist $sl must be >= k $k")
    val centroids: Array[(Int, Array[Float])] =
      if (trainedCentroids != null) trainedCentroids.zipWithIndex.map(_.swap)
      else df.where(col(idCol) < nCells)
        .select(col(idCol).cast("int"), col(vecCol))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val probeCells = centroids.sortBy { case (_, c) => -cosArr(query, c) }
      .take(nProbe).map(_._1)
    val qCode = query.zipWithIndex.foldLeft(0L) { case (c, (v, i)) =>
      if (v > 0f) c | (1L << i) else c
    }
    val enc = GraftSqlShim.column(BqEncode(GraftSqlShim.expression(col(vecCol))))
    df.select(col(idCol), col(vecCol),
        cellAssignment(col(vecCol), centroids).as("cell"))
      .where(col("cell").isin(probeCells.toIndexedSeq.map(Integer.valueOf): _*))
      .select(col(idCol), col(vecCol),
        bit_count(enc.bitwiseXOR(lit(qCode))).cast("long").as("hamming"))
      .orderBy(col("hamming"), col(idCol))
      .limit(sl)
      .select(col(idCol), col("hamming"),
        round(cosine(col(vecCol), typedlit(query.toSeq)), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Maximal-Marginal-Relevance diversified top-k [Carbonell &
    * Goldstein, SIGIR 1998]: greedily select k results maximizing
    * λ·rel(c) − (1−λ)·max over selected s of sim(c, s) — retrieval that
    * COVERS a topic instead of returning k near-duplicates (prompt
    * context assembly, eval-set retrieval, hard-negative pools).
    *
    * Scale shape: the corpus contributes ONE TakeOrdered pool pass
    * (top-`pool` by rounded exact cosine — the corpus never collects or
    * shuffles); the greedy selection is inherently sequential in k, so
    * it runs driver-side on the BOUNDED pool (`pool` ≤ 4096, loud
    * require — the knnJoin small-side contract). Every compared value
    * is rounded HALF_UP to 6 decimals and every tie breaks by id, so an
    * external engine replays the whole argmax chain bit-for-bit; λ is
    * an integer percent so the score arithmetic is identical
    * everywhere: score = round6(λ·rel − (100−λ)·maxsim), maxsim = the
    * running max of rounded pairwise cosines (0 before anything is
    * selected). Returns (idCol, rank, score), rank = selection order. */
  def mmrTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      lambdaPct: Int = 70,
      pool: Int = 64): DataFrame = {
    require(k >= 1 && k <= pool, s"k=$k must be in [1, pool=$pool]")
    require(lambdaPct >= 0 && lambdaPct <= 100,
      s"lambdaPct must be in [0, 100], got $lambdaPct")
    require(pool <= 4096, s"pool=$pool exceeds the 4096 driver bound")
    val spark = df.sparkSession
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val rows = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"),
        round(cosine(col(vecCol), typedlit(query.toSeq)), 6).as("rel"))
      .where(col("rel").isNotNull)
      .orderBy(desc("rel"), col("id"))
      .limit(pool)
      .collect() // bounded by the pool contract above
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Float](1).toArray)
    val rels = rows.map(_.getDouble(2))
    // the kernel's exact arithmetic: one ordered loop, double accumulators
    def cosR(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; nx += x * x; ny += y * y; i += 1
      }
      if (nx == 0.0 || ny == 0.0) 0.0
      else r6(dot / (math.sqrt(nx) * math.sqrt(ny)))
    }
    val n = ids.length
    val lam = lambdaPct.toDouble
    val mu = (100 - lambdaPct).toDouble
    val maxSim = Array.fill(n)(0.0)
    val chosen = Array.fill(n)(false)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Double)]
    var step = 1
    while (step <= math.min(k, n)) {
      var best = -1
      var bestScore = 0.0
      var i = 0
      while (i < n) {
        if (!chosen(i)) {
          val s = r6(lam * rels(i) - mu * maxSim(i))
          if (best < 0 || s > bestScore ||
              (s == bestScore && ids(i) < ids(best))) {
            best = i; bestScore = s
          }
        }
        i += 1
      }
      out += ((ids(best), step, bestScore))
      chosen(best) = true
      var j = 0
      while (j < n) {
        if (!chosen(j)) {
          val sim = cosR(vecs(j), vecs(best))
          if (sim > maxSim(j)) maxSim(j) = sim
        }
        j += 1
      }
      step += 1
    }
    import spark.implicits._
    out.toSeq.toDF(idCol, "rank", "score")
  }

  /** k-center greedy coreset selection [Gonzalez 1985, "Clustering to
    * minimize the maximum intercluster distance"; the coreset screen of
    * Sener & Savarese 2018]: start from the smallest id, then k−1 times
    * add the point FARTHEST from the selected set (maximin over cosine
    * distance 1 − cos, ties → smallest id) — the classic 2-approximation
    * whose selections cover the embedding space's extremes, the
    * diversity-first complement to [[semDedup]]'s redundancy pruning.
    *
    * Distributed shape: the selected set is tiny (k ids + vectors on
    * the driver), so each round is ONE narrow scan of the persisted
    * pool — per row a least-fold of cosines against the selected
    * centers (plan literals, no join) — ending in TakeOrdered(1). No
    * shuffle anywhere; k rounds = k scans of a cached projection.
    * Determinism: cosines round to 6 decimals before the maximin
    * compare (the [[mmrTopK]] discipline), so the oracle replays every
    * round; zero-norm vectors drop (cosine undefined — the family
    * convention). Returns `(id, center_rank, dist)` with dist = the
    * selection-time distance to the then-selected set (the seed
    * reports 2.0, the cosine-distance diameter bound). */
  def kCenterCoreset(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1 && k <= 256,
      s"k=$k out of [1, 256] — centers are broadcast plan literals")
    val spark = df.sparkSession
    val pool = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("id").isNotNull && cosine(col(vecCol), col(vecCol)).isNotNull)
      .persist()
    try {
      val seedRow = pool.orderBy(col("id")).limit(1).head()
      val centers = scala.collection.mutable.ArrayBuffer(
        (seedRow.getLong(0), seedRow.getSeq[Float](1).toArray))
      val out = scala.collection.mutable.ArrayBuffer(
        (centers(0)._1, 1, 2.0))
      var step = 2
      var exhausted = false
      while (step <= k && !exhausted) {
        val dist = centers.map { case (_, cv) =>
          lit(1.0) - round(cosine(col("v"), typedlit(cv.toSeq)), 6)
        }.reduceLeft(least(_, _))
        val cand = pool
          .where(!col("id").isin(centers.map(c => java.lang.Long.valueOf(c._1)).toIndexedSeq: _*))
          .select(col("id"), col("v"), dist.as("dist"))
          .orderBy(desc("dist"), col("id"))
          .limit(1)
          .collect()
        if (cand.isEmpty) exhausted = true
        else {
          val r = cand(0)
          centers += ((r.getLong(0), r.getSeq[Float](1).toArray))
          out += ((r.getLong(0), step, r.getDouble(2)))
          step += 1
        }
      }
      import spark.implicits._
      out.toSeq.toDF(idCol, "center_rank", "dist")
    } finally pool.unpersist()
  }

  /** Deterministic in-memory HNSW graph [Malkov & Yashunin 2016,
    * "Efficient and robust approximate nearest neighbor search using
    * Hierarchical Navigable Small World graphs"] over ONE partition's
    * vectors. Every source of randomness in the paper is replaced by a
    * deterministic rule so two builds over the same rows are identical:
    *   - node level = geometric draw from splitmix64(id) (the paper's
    *     `-ln(U)·mL`, U derived from the id hash instead of an RNG),
    *   - insertion order = ascending id (the caller sorts),
    *   - every heap/selection tie breaks (cos desc, id asc).
    * Neighbor selection is the paper's "simple" variant (top-M by
    * cosine from the efConstruction beam); level-0 lists keep 2M links,
    * upper levels M (the standard maxM rule). */
  private final class HnswGraph(m: Int, efConstruction: Int) {
    private val mL = 1.0 / math.log(m.toDouble)
    private val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
    private val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    private val levels = scala.collection.mutable.ArrayBuffer.empty[Int]
    // nbrs(node)(level) — adjacency lists, bounded by maxM(level)
    private val nbrs =
      scala.collection.mutable.ArrayBuffer.empty[Array[scala.collection.mutable.ArrayBuffer[Int]]]
    private var entry = -1
    private var maxLevel = -1

    private def splitmix64(x0: Long): Long = {
      var z = x0 + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

    private def levelOf(id: Long): Int = {
      // u in (0, 1]: top 53 hash bits + 1 over 2^53 + 1 — never 0, so
      // ln is finite; the +1 bias is ~1e-16, far under the draw's grain
      val u = ((splitmix64(id) >>> 11).toDouble + 1.0) / 9007199254740993.0
      math.min(30, (-math.log(u) * mL).toInt)
    }

    private def maxM(level: Int): Int = if (level == 0) 2 * m else m

    /** (cos desc, id asc) — the one ordering every comparison uses. */
    private def closer(cosA: Double, idA: Long, cosB: Double, idB: Long): Boolean =
      cosA > cosB || (cosA == cosB && idA < idB)

    /** Greedy hill-climb to the single closest node at `level`. */
    private def greedyClosest(q: Array[Float], ep0: Int, level: Int): Int = {
      var ep = ep0
      var epCos = cosArr(q, vecs(ep))
      var improved = true
      while (improved) {
        improved = false
        val ns = nbrs(ep)(level)
        var i = 0
        while (i < ns.length) {
          val e = ns(i)
          val c = cosArr(q, vecs(e))
          if (closer(c, ids(e), epCos, ids(ep))) {
            ep = e; epCos = c; improved = true
          }
          i += 1
        }
      }
      ep
    }

    /** The paper's SEARCH-LAYER: best-first beam of width `ef` with a
      * visited set; returns the beam sorted (cos desc, id asc). */
    private def searchLayer(
        q: Array[Float], ep: Int, ef: Int, level: Int): Array[(Double, Int)] = {
      val visited = new java.util.BitSet(ids.length)
      // exploration frontier: best (closest) on top
      val cand = new java.util.PriorityQueue[(Double, Int)](16,
        (a: (Double, Int), b: (Double, Int)) =>
          if (closer(a._1, ids(a._2), b._1, ids(b._2))) -1 else 1)
      // current beam: WORST on top (evicted first)
      val beam = new java.util.PriorityQueue[(Double, Int)](16,
        (a: (Double, Int), b: (Double, Int)) =>
          if (closer(a._1, ids(a._2), b._1, ids(b._2))) 1 else -1)
      val c0 = cosArr(q, vecs(ep))
      visited.set(ep)
      cand.add((c0, ep)); beam.add((c0, ep))
      while (!cand.isEmpty) {
        val (cCos, c) = cand.poll()
        val worst = beam.peek()
        if (beam.size >= ef && !closer(cCos, ids(c), worst._1, ids(worst._2))) {
          cand.clear() // every remaining candidate is farther — done
        } else {
          val ns = nbrs(c)(level)
          var i = 0
          while (i < ns.length) {
            val e = ns(i)
            if (!visited.get(e)) {
              visited.set(e)
              val eCos = cosArr(q, vecs(e))
              val w = beam.peek()
              if (beam.size < ef || closer(eCos, ids(e), w._1, ids(w._2))) {
                cand.add((eCos, e)); beam.add((eCos, e))
                if (beam.size > ef) beam.poll()
              }
            }
            i += 1
          }
        }
      }
      val out = new Array[(Double, Int)](beam.size)
      var i = out.length - 1
      while (i >= 0) { out(i) = beam.poll(); i -= 1 }
      out
    }

    /** Bidirectional link with deterministic overflow pruning: a list
      * past maxM keeps its top-maxM by (cos to the owner desc, id asc). */
    private def link(a: Int, b: Int, level: Int): Unit = {
      def add(from: Int, to: Int): Unit = {
        val ls = nbrs(from)(level)
        if (!ls.contains(to)) {
          ls += to
          val cap = maxM(level)
          if (ls.length > cap) {
            val scored = ls.map(e => (cosArr(vecs(from), vecs(e)), e)).toArray
            java.util.Arrays.sort(scored,
              (x: (Double, Int), y: (Double, Int)) =>
                if (closer(x._1, ids(x._2), y._1, ids(y._2))) -1 else 1)
            ls.clear()
            var i = 0
            while (i < cap) { ls += scored(i)._2; i += 1 }
          }
        }
      }
      add(a, b); add(b, a)
    }

    def insert(id: Long, v: Array[Float]): Unit = {
      val lev = levelOf(id)
      val idx = ids.length
      ids += id; vecs += v; levels += lev
      nbrs += Array.fill(lev + 1)(scala.collection.mutable.ArrayBuffer.empty[Int])
      if (entry < 0) { entry = idx; maxLevel = lev; return }
      var ep = entry
      var l = maxLevel
      while (l > lev) { ep = greedyClosest(v, ep, l); l -= 1 }
      l = math.min(maxLevel, lev)
      while (l >= 0) {
        val beam = searchLayer(v, ep, efConstruction, l)
        var i = 0
        val take = math.min(m, beam.length)
        while (i < take) { link(idx, beam(i)._2, l); i += 1 }
        ep = beam(0)._2
        l -= 1
      }
      if (lev > maxLevel) { maxLevel = lev; entry = idx }
    }

    /** Top-`ef` candidate (id, vector) pairs for `q`: greedy descent
      * through the upper layers, one beam search at layer 0. */
    def searchNodes(q: Array[Float], ef: Int): Array[(Long, Array[Float])] = {
      if (entry < 0) return Array.empty
      var ep = entry
      var l = maxLevel
      while (l >= 1) { ep = greedyClosest(q, ep, l); l -= 1 }
      searchLayer(q, ep, ef, 0).map(e => (ids(e._2), vecs(e._2)))
    }

    /** Top-`ef` candidate ids for `q`. */
    def search(q: Array[Float], ef: Int): Array[Long] =
      searchNodes(q, ef).map(_._1)

    /** Serialize the graph: one row per node, neighbors as
      * insertion-order indices per level — the persisted-index format
      * ([[Similarity.buildHnswIndex]]). */
    def exportNodes(): Iterator[(Int, Long, Array[Float], Int, Array[Array[Int]])] =
      ids.indices.iterator.map { i =>
        (i, ids(i), vecs(i), levels(i), nbrs(i).map(_.toArray))
      }

    /** Load a serialized graph verbatim (no re-insertion — the stored
      * adjacency IS the graph). Rows must be the complete export of one
      * partition's graph, any order. The entry point is recomputed
      * deterministically: the FIRST node (insertion = id order) whose
      * level equals the global max — exactly the node the insert loop's
      * strictly-greater update rule left as entry. */
    def loadNodes(rows: Array[(Int, Long, Array[Float], Int, Array[Array[Int]])]): Unit = {
      require(ids.isEmpty, "loadNodes on a non-empty graph")
      val sorted = rows.sortBy(_._1)
      sorted.zipWithIndex.foreach { case ((ord, id, v, lev, ns), i) =>
        require(ord == i, s"node ordinals must be dense 0..n-1, got $ord at $i")
        ids += id; vecs += v; levels += lev
        nbrs += ns.map(a => scala.collection.mutable.ArrayBuffer.from(a))
      }
      if (ids.nonEmpty) {
        maxLevel = levels.max
        entry = levels.indexOf(maxLevel)
      }
    }
  }

  /** HNSW-class graph ANN — the production family the LSH/IVF/PQ/BQ/SQ
    * lineup lacked: per-PARTITION deterministic HNSW graphs, each
    * searched independently for an `efSearch` shortlist, merged, and
    * exact-cosine re-ranked to the final top-k.
    *
    * Determinism (the property the correctness gate needs): rows are
    * grouped by `id mod nParts` (engine-independent, unlike physical
    * partitioning), inserted in ascending id order, levels drawn from
    * splitmix64(id), and every tie anywhere breaks (cos desc, id asc)
    * — so the candidate set, and hence the answer, is a pure function
    * of the data. With the default budgets the merged shortlist covers
    * the exact top-k on all test scales, making the output equal to
    * [[bruteForceTopK]] (which is what the q_ann_hnsw oracle replays —
    * a graph walk is NOT SQL-replayable; a recall miss would surface
    * as a value mismatch, which is exactly the claim being gated).
    * The hnswTopK operator spec additionally measures recall@20 under
    * a CONSTRAINED budget through [[recallAtK]].
    *
    * Scale shape: the groupByKey is the INDEX BUILD — at 100 TB it
    * runs once (write the per-partition graphs next to the data, the
    * IVF cell-partitioning discipline), amortized over every query;
    * each query then costs nParts independent O(ef·M·log n) walks plus
    * an exchange of nParts×efSearch (id, cos) candidate rows — never
    * the corpus. The final re-rank is a broadcast left-semi join of
    * the bounded candidate id set against the table followed by one
    * TakeOrdered; raw vectors never shuffle. */
  def hnswTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      m: Int = 16,
      efConstruction: Int = 64,
      efSearch: Int = 96,
      nParts: Int = 4): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(m >= 2, s"m must be >= 2, got $m")
    require(efConstruction >= m, s"efConstruction $efConstruction must be >= m $m")
    require(efSearch >= k, s"efSearch $efSearch must be >= k $k")
    require(nParts >= 1 && nParts * efSearch <= 65536,
      s"merged shortlist ${nParts}x$efSearch exceeds the 65536 broadcast bound")
    val spark = df.sparkSession
    import spark.implicits._
    val mC = m; val efC = efConstruction; val efS = efSearch
    val cand = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("v").isNotNull)
      .as[(Long, Seq[Float])]
      .groupByKey { case (id, _) => (((id % nParts) + nParts) % nParts).toInt }
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._1) // insertion order = id order
        val g = new HnswGraph(mC, efC)
        rows.foreach { case (id, v) => g.insert(id, v.toArray) }
        g.search(query, efS).iterator
      }
      .toDF(idCol)
    df.join(broadcast(cand), Seq(idCol), "left_semi")
      .select(col(idCol),
        round(cosine(col(vecCol), typedlit(query.toSeq)), 6).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** BUILD the persisted HNSW index — the build-once/query-many shape
    * that makes graph ANN viable at 100 TB (the [[hnswTopK]] scaladoc's
    * amortization claim as working code, the buildTokenScreenIndex /
    * IVF-code-table discipline): the same deterministic per-partition
    * graphs, serialized one row per node (insertion-order ordinal, id,
    * vector, level, per-level neighbor ordinals) and written
    * partitioned by graph partition — so a query reads the adjacency,
    * never re-inserts. Index size is the vectors plus O(M) ints per
    * node; construction is the one corpus shuffle. */
  def buildHnswIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      m: Int = 16,
      efConstruction: Int = 64,
      nParts: Int = 4): Unit = {
    require(m >= 2 && efConstruction >= m,
      s"bad budgets: m=$m efConstruction=$efConstruction")
    val spark = df.sparkSession
    import spark.implicits._
    val mC = m; val efC = efConstruction
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("id").isNotNull && col("v").isNotNull)
      .as[(Long, Seq[Float])]
      .groupByKey { case (id, _) => (((id % nParts) + nParts) % nParts).toInt }
      .flatMapGroups { (part, it) =>
        val rows = it.toArray.sortBy(_._1)
        val g = new HnswGraph(mC, efC)
        rows.foreach { case (id, v) => g.insert(id, v.toArray) }
        g.exportNodes().map { case (ord, id, v, lev, ns) =>
          (part, ord, id, v.toSeq, lev, ns.map(_.toSeq).toSeq)
        }
      }
      .toDF("part", "ord", "id", "vec", "level", "nbrs")
      .write.mode("overwrite").partitionBy("part").parquet(dir)
    // budgets travel with the layout (underscore prefix → invisible to
    // spark.read.parquet(dir)'s file listing): appendToHnswIndex MUST
    // insert with the build-time m/efConstruction or the appended graph
    // diverges from a full rebuild
    writeHnswMeta(spark, dir, m, efConstruction, nParts)
  }

  private def writeHnswMeta(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, m: Int, efConstruction: Int, nParts: Int): Unit =
    spark.range(1).select(
        lit(m).as("m"), lit(efConstruction).as("ef_construction"),
        lit(nParts).as("n_parts"))
      .write.mode("overwrite").parquet(s"${dir.stripSuffix("/")}/_graft_meta")

  /** Append rows to a [[buildHnswIndex]] layout WITHOUT a rebuild — the
    * [[graft.operators.TextOps.appendToInvertedIndex]] ingestion
    * discipline applied to the graph index: each partition LOADS its
    * stored adjacency verbatim (O(n) read, zero re-insertion work) and
    * inserts only the arriving rows with the build-time budgets (read
    * from the layout's meta), so ingestion cost is O(new rows), not
    * O(corpus). The swap is the crash-safe backup-rename ordering of
    * [[TextOps.swapDirs]] — the index is readable at either the
    * canonical or the backup path at every instant.
    *
    * Equality contract (spec-pinned): arriving ids must be STRICTLY
    * GREATER than every stored id in their partition — then the
    * insertion sequence (ascending id) is identical to a full rebuild
    * over old ∪ new, so the appended graph, and hence every
    * [[hnswTopKIndexed]] answer, is bit-identical to the rebuild. The
    * natural ingestion case (new documents get new, larger ids)
    * satisfies this for free; interleaved ids fail LOUDLY (a rebuild is
    * the honest answer there — silently diverging graphs are not). */
  def appendToHnswIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val meta = spark.read.parquet(s"${dir.stripSuffix("/")}/_graft_meta").collect()(0)
    val mC = meta.getAs[Int]("m")
    val efC = meta.getAs[Int]("ef_construction")
    val nParts = meta.getAs[Int]("n_parts")
    val existing = spark.read.parquet(dir)
      .select(col("part").cast("int").as("part"), col("ord"), col("id"),
        col("vec"), col("level"), col("nbrs"))
      .as[(Int, Int, Long, Seq[Float], Int, Seq[Seq[Int]])]
    // incoming rows ride the same 6-tuple with ord = -1 (never a valid
    // stored ordinal) so ONE grouped pass sees a partition's graph and
    // its arrivals together
    val incoming = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("id").isNotNull && col("v").isNotNull)
      .as[(Long, Seq[Float])]
      .map { case (id, v) =>
        ((((id % nParts) + nParts) % nParts).toInt, -1, id, v, -1,
          Seq.empty[Seq[Int]])
      }
    val tmp = dir.stripSuffix("/") + "__append_tmp"
    existing.union(incoming)
      .groupByKey(_._1)
      .flatMapGroups { (part, it) =>
        val (old, fresh) = it.toArray.partition(_._2 >= 0)
        val g = new HnswGraph(mC, efC)
        g.loadNodes(old.map { case (_, ord, id, v, lev, ns) =>
          (ord, id, v.toArray, lev, ns.map(_.toArray).toArray)
        })
        val maxOld = if (old.isEmpty) Long.MinValue
          else old.iterator.map(_._3).max
        val sortedNew = fresh.sortBy(_._3)
        sortedNew.headOption.foreach { h =>
          require(h._3 > maxOld,
            s"appendToHnswIndex: incoming id ${h._3} <= stored max id " +
              s"$maxOld in partition $part — appends require strictly " +
              "increasing ids (the rebuild-equality contract); rebuild " +
              "the index for interleaved ids")
        }
        sortedNew.foreach { case (_, _, id, v, _, _) => g.insert(id, v.toArray) }
        g.exportNodes().map { case (ord, id, v, lev, ns) =>
          (part, ord, id, v.toSeq, lev, ns.map(_.toSeq).toSeq)
        }
      }
      .toDF("part", "ord", "id", "vec", "level", "nbrs")
      .write.mode("overwrite").partitionBy("part").parquet(tmp)
    writeHnswMeta(spark, tmp, mC, efC, nParts)
    TextOps.swapDirs(spark, tmp, dir)
  }

  /** Query a [[buildHnswIndex]] index: each partition's stored graph is
    * LOADED (adjacency read verbatim, zero re-insertion work) and
    * walked for the query; the merged bounded shortlist re-ranks by
    * exact cosine — identical answers to the in-memory [[hnswTopK]] at
    * the same budgets (spec-pinned), which is what makes the persisted
    * index trustworthy. Per query the cluster reads O(index) bytes once
    * and exchanges only nParts × efSearch candidate rows. */
  def hnswTopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      query: Array[Float],
      k: Int,
      efSearch: Int = 96,
      idOut: String = "id"): DataFrame = {
    require(k >= 1 && efSearch >= k, s"bad budgets: k=$k efSearch=$efSearch")
    import spark.implicits._
    val efS = efSearch
    val cand = spark.read.parquet(dir)
      .select(col("part"), col("ord"), col("id"), col("vec"),
        col("level"), col("nbrs"))
      .as[(Int, Int, Long, Seq[Float], Int, Seq[Seq[Int]])]
      .groupByKey(_._1)
      .flatMapGroups { (_, it) =>
        // m/efConstruction only shape INSERTION; loading needs no budgets
        val g = new HnswGraph(2, 2)
        g.loadNodes(it.map { case (_, ord, id, v, lev, ns) =>
          (ord, id, v.toArray, lev, ns.map(_.toArray).toArray)
        }.toArray)
        g.searchNodes(query, efS).iterator.map { case (id, v) =>
          // dimension-ragged rows are DROPPED (NaN → filter), matching
          // the in-memory path's CosineSimilarity kernel which returns
          // NULL on a length mismatch — the 'identical answers' claim
          // must hold on ragged corpora too, not just the fixed-dim
          // test tables
          if (v.length != query.length) (id, Double.NaN)
          else {
            var dot = 0.0; var nv = 0.0; var nq = 0.0
            var i = 0
            while (i < v.length) {
              dot += v(i).toDouble * query(i)
              nv += v(i).toDouble * v(i)
              nq += query(i).toDouble * query(i)
              i += 1
            }
            (id, if (nv == 0.0 || nq == 0.0) Double.NaN
              else dot / (math.sqrt(nv) * math.sqrt(nq)))
          }
        }.filter(!_._2.isNaN)
      }
      .toDF("__cand_id", "__cand_cos")
    // rank on an inline cosine that replays the CosineSimilarity
    // kernel's arithmetic (same drop-on-mismatch, same zero-norm NULL),
    // then 6-decimal HALF_UP rounding before the (cos desc, id) order
    cand.select(round(col("__cand_cos"), 6).as("cos"), col("__cand_id"))
      .orderBy(desc("cos"), col("__cand_id"))
      .limit(k)
      .select(col("__cand_id").as(idOut), col("cos"))
  }

  /** HNSW batch kNN JOIN — the graph-ANN face of the retrieval shape
    * [[knnJoin]] covers exactly: for EACH query row, the top-k corpus
    * rows by cosine, but with per-partition graph WALKS pruning the
    * candidate set instead of a full corpus scan per batch. The same
    * deterministic per-partition graphs as [[hnswTopK]] are built once
    * per partition and then searched for EVERY broadcast query (M walks
    * per partition — each O(ef·M·log n) instead of the scan's O(n)), so
    * at scale the per-query cost is independent of corpus size once the
    * graphs are built/persisted. Candidates (nParts × M × efSearch
    * rows, never M × N) carry exact cosines computed with [[knnJoin]]'s
    * precise arithmetic (dot in element order, HALF_UP 6-decimal
    * rounding BEFORE ranking), and the shared [[knnTopK]] window settles
    * per-query ranks — so when the beams cover the true top-k the
    * output is IDENTICAL to [[knnJoin]], which is what q_knn_hnsw gates
    * against the exact oracle. Zero-norm vectors on either side never
    * match (the knnJoin convention). Output: (qid, idCol, cos). */
  def hnswKnnJoin(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      m: Int = 16,
      efConstruction: Int = 64,
      efSearch: Int = 96,
      nParts: Int = 4,
      maxQueries: Int = 1024): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(m >= 2 && efConstruction >= m && efSearch >= k,
      s"bad budgets: m=$m efConstruction=$efConstruction efSearch=$efSearch k=$k")
    require(maxQueries <= 4096, s"maxQueries=$maxQueries exceeds the 4096 driver bound")
    val spark = corpus.sparkSession
    import spark.implicits._
    val qRows = queries
      .select(col(qIdCol).cast("long"), col(qVecCol))
      .where(col(qIdCol).isNotNull && col(qVecCol).isNotNull)
      .limit(maxQueries + 1).collect()
    require(qRows.length <= maxQueries,
      s"query side exceeds maxQueries=$maxQueries rows — hnswKnnJoin " +
        "broadcasts the queries and walks each per partition graph")
    val qIds = qRows.map(_.getLong(0))
    val qVecs = qRows.map(_.getSeq[Float](1).toArray)
    val qNorms = qVecs.map(v => math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)))
    val bc = spark.sparkContext.broadcast((qIds, qVecs, qNorms))
    val mC = m; val efC = efConstruction; val efS = efSearch
    val cands = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .where(col("id").isNotNull && col("v").isNotNull)
      .as[(Long, Seq[Float])]
      .groupByKey { case (id, _) => (((id % nParts) + nParts) % nParts).toInt }
      .flatMapGroups { (_, it) =>
        val rows = it.toArray.sortBy(_._1)
        val g = new HnswGraph(mC, efC)
        rows.foreach { case (id, v) => g.insert(id, v.toArray) }
        val (ids, vecs, norms) = bc.value
        hnswWalkQueries(g, ids, vecs, norms, efS)
      }
    knnTopK(cands, idCol, k)
  }

  /** Walk ONE partition graph for every broadcast query — the candidate
    * arithmetic [[hnswKnnJoin]] and [[hnswKnnJoinBatched]] share, which
    * is [[knnJoin]]'s exactly (min-length dot in element order, HALF_UP
    * 6-decimal rounding BEFORE ranking, zero-norm rows on either side
    * never match). */
  private def hnswWalkQueries(
      g: HnswGraph,
      ids: Array[Long],
      vecs: Array[Array[Float]],
      norms: Array[Double],
      efS: Int): Iterator[(Long, Long, Double)] =
    ids.indices.iterator.filter(norms(_) > 0.0).flatMap { qi =>
      val qv = vecs(qi)
      g.searchNodes(qv, efS).iterator.flatMap { case (id, v) =>
        var n = 0.0
        var i = 0
        while (i < v.length) { n += v(i).toDouble * v(i); i += 1 }
        val norm = math.sqrt(n)
        if (norm == 0.0) Iterator.empty
        else {
          val d = math.min(qv.length, v.length)
          var dot = 0.0
          var j = 0
          while (j < d) { dot += qv(j).toDouble * v(j); j += 1 }
          val cos = java.math.BigDecimal.valueOf(dot / (norm * norms(qi)))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          Iterator.single((ids(qi), id, cos))
        }
      }
    }

  /** [[hnswKnnJoin]] without the driver cap — the [[knnJoinBatched]]
    * discipline applied to the graph join: the query side is streamed
    * to the driver ONE PARTITION AT A TIME (`toLocalIterator` — the
    * full query set is never resident) and broadcast in
    * `batchSize`-row batches; each batch is one corpus pass of graph
    * walks, all batches union into ONE plan with a single final
    * per-qid top-k window. Results are row-identical to
    * [[hnswKnnJoin]] at any batchSize (OperatorsSpec pins batch-size
    * invariance at 20k queries — the per-partition graphs are
    * deterministic, so every batch walks the SAME graphs).
    *
    * Cost model: with `indexDir = null` each batch REBUILDS the
    * per-partition graphs (one groupByKey pass, O(n·ef·M) insertion
    * work per batch) — fine when ceil(M/batchSize) is small. When
    * M >> batchSize, pass a [[buildHnswIndex]] layout as `indexDir`:
    * each batch then only LOADS the stored adjacency (O(n) read,
    * zero insertion) and the build cost is paid once, ever —
    * the persisted-index amortization claim extended to the join. */
  def hnswKnnJoinBatched(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      m: Int = 16,
      efConstruction: Int = 64,
      efSearch: Int = 96,
      nParts: Int = 4,
      batchSize: Int = 4096,
      indexDir: String = null): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(m >= 2 && efConstruction >= m && efSearch >= k,
      s"bad budgets: m=$m efConstruction=$efConstruction efSearch=$efSearch k=$k")
    val spark = corpus.sparkSession
    import spark.implicits._
    val mC = m; val efC = efConstruction; val efS = efSearch
    val data =
      if (indexDir != null) null
      else corpus
        .select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
        .where(col("id").isNotNull && col("v").isNotNull)
        .as[(Long, Seq[Float])]
    val idx =
      if (indexDir == null) null
      else spark.read.parquet(indexDir)
        .select(col("part").cast("int").as("part"), col("ord"), col("id"),
          col("vec"), col("level"), col("nbrs"))
        .as[(Int, Int, Long, Seq[Float], Int, Seq[Seq[Int]])]
    val qIt = queries
      .select(col(qIdCol).cast("long"), col(qVecCol))
      .where(col(qIdCol).isNotNull && col(qVecCol).isNotNull)
      .as[(Long, Array[Float])]
      .toLocalIterator()
    var union: org.apache.spark.sql.Dataset[(Long, Long, Double)] = null
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
    def flush(): Unit = if (buf.nonEmpty) {
      val qIds = buf.map(_._1).toArray
      val qVecs = buf.map(_._2).toArray
      val qNorms = qVecs.map(v => math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)))
      val bc = spark.sparkContext.broadcast((qIds, qVecs, qNorms))
      val scan =
        if (idx != null)
          idx.groupByKey(_._1).flatMapGroups { (_, it) =>
            // m/efConstruction only shape INSERTION; loading needs no budgets
            val g = new HnswGraph(2, 2)
            g.loadNodes(it.map { case (_, ord, id, v, lev, ns) =>
              (ord, id, v.toArray, lev, ns.map(_.toArray).toArray)
            }.toArray)
            val (ids0, vecs0, norms0) = bc.value
            hnswWalkQueries(g, ids0, vecs0, norms0, efS)
          }
        else
          data.groupByKey { case (id, _) => (((id % nParts) + nParts) % nParts).toInt }
            .flatMapGroups { (_, it) =>
              val rows = it.toArray.sortBy(_._1)
              val g = new HnswGraph(mC, efC)
              rows.foreach { case (id, v) => g.insert(id, v.toArray) }
              val (ids0, vecs0, norms0) = bc.value
              hnswWalkQueries(g, ids0, vecs0, norms0, efS)
            }
      union = if (union == null) scan else union.union(scan)
      buf.clear()
    }
    while (qIt.hasNext) {
      buf += qIt.next()
      if (buf.size >= batchSize) flush()
    }
    flush()
    if (union == null) spark.emptyDataset[(Long, Long, Double)].toDF("qid", idCol, "cos")
    else knnTopK(union, idCol, k)
  }

  /** Train the composed IVF+PQ index (the FAISS IVFPQ shape) from ONE
    * capped id-ordered sample: coarse argmax-cosine centroids via Lloyd
    * iterations, then per-subspace L2 codebooks over the RESIDUALS
    * (sample vector minus its assigned centroid, each component rounded
    * to float — the stored-residual semantics). Residual quantization is
    * what makes the composition beat flat PQ: within a cell the residuals
    * are centered near zero, so the same code budget spends its precision
    * on the local neighborhood instead of the whole space.
    * Driver-side by design — the sample is bounded and independent of
    * corpus size; the corpus is only ever touched by the narrow
    * assign+encode map. */
  def trainIvfPq(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      nCells: Int = 16,
      m: Int = 16,
      codesPerSub: Int = 16,
      sampleSize: Int = 2048,
      coarseIters: Int = 5,
      pqIters: Int = 3): (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    val sample = sampleVectors(df, idCol, vecCol, sampleSize)
    val dim = sample(0).length
    require(m > 0 && dim % m == 0, s"dim $dim must divide into $m subspaces")
    val cents = kmeansCosine(sample, nCells, coarseIters)
    val residuals = sample.map { v =>
      var best = 0
      var bestCos = -2.0
      for (c <- cents.indices) {
        val cos = cosArr(v, cents(c))
        if (cos > bestCos) { bestCos = cos; best = c }
      }
      val cent = cents(best)
      Array.tabulate(dim)(i => (v(i).toDouble - cent(i).toDouble).toFloat)
    }
    (cents, pqCodebooksOf(residuals, m, codesPerSub, pqIters))
  }

  /** IVF+PQ approximate top-k by inner product: probe the `nProbe` cells
    * whose coarse centroids are closest to the query; within a probed
    * cell, score each row as dot(query, centroid) + ADC over the row's
    * residual PQ codes — dot(q,v) = dot(q,c) + dot(q,v−c), with the
    * second term approximated by m table lookups. No float vector is
    * touched after the fused assign+encode projection, and no Exchange
    * appears anywhere (TakeOrderedAndProject merges per-partition top-k).
    *
    * Scale path: persist `cell` + `pq_codes` once (partitionBy(cell) —
    * the same pruned layout ivfTopK uses, plus PQ's 16-32× compression);
    * a query then reads nProbe/nCells of a code-sized corpus. Tune
    * recall with nProbe and m; re-rank the top candidates with exact
    * cosine when the raw vectors are retained. */
  def ivfPqTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      m: Int = 16,
      codesPerSub: Int = 16,
      sampleSize: Int = 2048,
      coarseIters: Int = 5,
      pqIters: Int = 3,
      trained: (Array[Array[Float]], Array[Array[Array[Float]]]) = null): DataFrame = {
    val (cents, cb) =
      if (trained != null) trained
      else trainIvfPq(df, idCol, vecCol, nCells, m, codesPerSub, sampleSize,
        coarseIters, pqIters)
    val (probeCells, score) = ivfPqProbeScore(cents, cb, query, nProbe)
    val centPairs = cents.zipWithIndex.map(_.swap)
    val centSeq: Seq[Seq[Float]] = cents.toIndexedSeq.map(_.toIndexedSeq)
    val cbSeq: Seq[Seq[Seq[Float]]] = cb.toIndexedSeq.map(_.toIndexedSeq.map(_.toIndexedSeq))
    df.select(col(idCol), col(vecCol),
        cellAssignment(col(vecCol), centPairs).as("cell"))
      .where(col("cell").isin(probeCells.map(Integer.valueOf): _*))
      .select(col(idCol), col("cell"),
        ivf_pq_encode(col(vecCol), col("cell"), centSeq, cbSeq).as("pq_codes"))
      .select(col(idCol), score.as("score"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Probe ranking + fused ADC score column shared by [[ivfPqTopK]] and
    * [[ivfPqTopKIndexed]]: cos(query, centroid) desc with stable
    * ascending-cell ties picks the probed cells (the [[ivfTopK]] rule);
    * each probed row then scores dot(query, centroid) + ADC over its
    * residual codes, with the query-side residual kept in full double —
    * only the stored data-side residual is rounded to float. Expects the
    * input frame to expose `cell` and `pq_codes` columns. */
  private def ivfPqProbeScore(
      cents: Array[Array[Float]],
      cb: Array[Array[Array[Float]]],
      query: Array[Float],
      nProbe: Int): (Seq[Int], Column) = {
    val dim = query.length
    require(cb.nonEmpty && dim % cb.length == 0,
      "query dim must divide into subspaces")
    val sub = dim / cb.length
    val probeCells: Seq[Int] = cents.zipWithIndex
      .sortBy { case (c, _) => -cosArr(query, c) }
      .take(nProbe).map(_._2).toIndexedSeq
    def coarseDot(c: Int): Double = {
      val cent = cents(c)
      var d = 0.0
      var i = 0
      while (i < dim) { d += query(i).toDouble * cent(i).toDouble; i += 1 }
      d
    }
    def adcTable(c: Int): Seq[Seq[Double]] = {
      val cent = cents(c)
      val qr = Array.tabulate(dim)(i => query(i).toDouble - cent(i).toDouble)
      cb.toIndexedSeq.zipWithIndex.map { case (codes, s) =>
        codes.toIndexedSeq.map { e =>
          var dot = 0.0
          var i = 0
          while (i < sub) { dot += qr(s * sub + i) * e(i).toDouble; i += 1 }
          dot
        }
      }
    }
    val score = probeCells.foldLeft(lit(null).cast("double")) { (acc, c) =>
      when(col("cell") === c,
        lit(coarseDot(c)) + pq_adc_score(col("pq_codes"), adcTable(c))).otherwise(acc)
    }
    (probeCells, score)
  }

  /** Two-stage IVF+PQ search with exact re-rank — the production
    * recall-recovery pattern: the compressed ADC scan picks a `shortlist`
    * of candidates (typically 5-10× k), then ONLY those rows' raw vectors
    * are fetched (broadcast semi-join on the tiny id list — the corpus
    * never shuffles) and re-scored with exact cosine. Within the probed
    * cells the final ranking is exact; quantization error only affects
    * which candidates make the shortlist.
    *
    * Scale path: codes and raw vectors live in separate tables at 100 TB
    * (codes in memory, vectors on disk); stage 1 reads only codes, stage
    * 2 reads shortlist-many vector rows — pointed lookups if the vector
    * table is bucketed by id. */
  def ivfPqRerankTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      shortlist: Int = 100,
      nCells: Int = 16,
      nProbe: Int = 4,
      m: Int = 16,
      codesPerSub: Int = 16,
      sampleSize: Int = 2048,
      coarseIters: Int = 5,
      pqIters: Int = 3,
      trained: (Array[Array[Float]], Array[Array[Array[Float]]]) = null): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val tr =
      if (trained != null) trained
      else trainIvfPq(df, idCol, vecCol, nCells, m, codesPerSub, sampleSize,
        coarseIters, pqIters)
    val short = ivfPqTopK(df, idCol, vecCol, query, shortlist,
      nCells, nProbe, m, codesPerSub, sampleSize, coarseIters, pqIters, tr)
    val qLit = typedlit(query)
    df.join(broadcast(short.select(col(idCol))), Seq(idCol))
      .select(col(idCol), cosine(col(vecCol), qLit).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** BUILD the persisted IVF+PQ layout — [[buildIvfIndex]]'s pruned
    * cell partitioning plus PQ's compression: what lands on disk per row
    * is the id and m byte-sized residual codes, NOT the vector, so a
    * probe reads nProbe/C of a CODE-sized corpus — the disk-ANN shape a
    * 100 TB embedding store actually wants (raw vectors stay in the
    * source table and are touched only by a re-rank shortlist's
    * broadcast semi-join). Coarse centroids AND residual codebooks are
    * frozen at build time in the layout's underscore-prefixed meta dirs
    * (invisible to the data read), so [[appendToIvfPqIndex]] never
    * retrains: an append is one narrow assign+encode map +
    * mode(append) into the cell partitions — O(new) compute and write,
    * no id-ordering contract (cell contents are sets; build+append ==
    * build-all spec-pinned). Returns the trained pair for callers that
    * also query in-session. */
  def buildIvfPqIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      nCells: Int = 16,
      m: Int = 16,
      codesPerSub: Int = 16,
      sampleSize: Int = 2048,
      coarseIters: Int = 5,
      pqIters: Int = 3,
      trained: (Array[Array[Float]], Array[Array[Array[Float]]]) = null)
      : (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    val tr =
      if (trained != null) trained
      else trainIvfPq(df, idCol, vecCol, nCells, m, codesPerSub, sampleSize,
        coarseIters, pqIters)
    writeIvfPqRows(df, idCol, vecCol, dir, tr, overwrite = true)
    val spark = df.sparkSession
    import spark.implicits._
    tr._1.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"${dir.stripSuffix("/")}/_graft_meta")
    (for ((codes, s) <- tr._2.zipWithIndex.toSeq; (e, c) <- codes.zipWithIndex)
      yield (s, c, e.toSeq))
      .toDF("sub", "code", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(s"${dir.stripSuffix("/")}/_graft_pq")
    tr
  }

  /** The narrow assign+encode map shared by build and append: id, cell
    * (frozen-centroid assignment), and the residual PQ codes — the only
    * way corpus rows ever reach the layout. */
  private def writeIvfPqRows(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String,
      tr: (Array[Array[Float]], Array[Array[Array[Float]]]),
      overwrite: Boolean): Unit = {
    val (cents, cb) = tr
    val centPairs = cents.zipWithIndex.map(_.swap)
    val centSeq: Seq[Seq[Float]] = cents.toIndexedSeq.map(_.toIndexedSeq)
    val cbSeq: Seq[Seq[Seq[Float]]] =
      cb.toIndexedSeq.map(_.toIndexedSeq.map(_.toIndexedSeq))
    df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
        cellAssignment(col(vecCol), centPairs).as("cell"))
      .where(col("id").isNotNull && col("vec").isNotNull)
      .select(col("id"),
        ivf_pq_encode(col("vec"), col("cell"), centSeq, cbSeq).as("pq_codes"),
        col("cell"))
      .write.mode(if (overwrite) "overwrite" else "append")
      .partitionBy("cell").parquet(dir)
  }

  private def readIvfPqMeta(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): (Array[Array[Float]], Array[Array[Array[Float]]]) = {
    val cents = spark.read.parquet(s"${dir.stripSuffix("/")}/_graft_meta")
      .select(col("cell").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
      .sortBy(_._1).map(_._2)
    val cb = spark.read.parquet(s"${dir.stripSuffix("/")}/_graft_pq")
      .select(col("sub").cast("int"), col("code").cast("int"), col("centroid"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2).toArray))
      .groupBy(_._1).toArray.sortBy(_._1)
      .map { case (_, rows) => rows.sortBy(_._2).map(_._3) }
    (cents, cb)
  }

  /** Append rows to a [[buildIvfPqIndex]] layout: centroids and
    * codebooks load frozen from the meta dirs, arrivals take the same
    * assign+encode map with `mode("append")` — O(new), order-free,
    * query-identical to building over the union (spec-pinned). The
    * postings compaction discipline applies if file counts ever
    * matter. */
  def appendToIvfPqIndex(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dir: String): Unit =
    writeIvfPqRows(df, idCol, vecCol, dir,
      readIvfPqMeta(df.sparkSession, dir), overwrite = false)

  /** Query a [[buildIvfPqIndex]] layout: the [[ivfPqTopK]] ADC scan with
    * the probe filter landing on the PARTITION column — a partition-
    * pruned read of nProbe/C of the code-sized layout (PlanQualitySpec
    * pins the pruned read). Scores are identical to [[ivfPqTopK]] over
    * the same trained pair: assignment and encoding are deterministic,
    * so where they run (build time vs query time) cannot change them. */
  def ivfPqTopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      query: Array[Float],
      k: Int,
      nProbe: Int = 4,
      idOut: String = "id"): DataFrame = {
    require(k >= 1 && nProbe >= 1, s"bad budgets: k=$k nProbe=$nProbe")
    val (cents, cb) = readIvfPqMeta(spark, dir)
    val (probeCells, score) = ivfPqProbeScore(cents, cb, query, nProbe)
    spark.read.parquet(dir)
      .where(col("cell").isin(probeCells.toIndexedSeq.map(Integer.valueOf): _*))
      .select(col("id").as(idOut), score.as("score"))
      .orderBy(desc("score"), col(idOut))
      .limit(k)
  }

  /** Two-stage search over the persisted layout — codes on disk,
    * vectors in the source table, the separation [[ivfPqRerankTopK]]'s
    * scaladoc promises at 100 TB: stage 1 reads only the pruned code
    * partitions for a `shortlist`, stage 2 fetches exactly those rows'
    * raw vectors (broadcast semi-join on the tiny id list) and re-scores
    * with exact cosine. Same answers as [[ivfPqRerankTopK]] over the
    * same trained pair. */
  def ivfPqRerankTopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      shortlist: Int = 100,
      nProbe: Int = 4): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    val short = ivfPqTopKIndexed(spark, dir, query, shortlist, nProbe,
      idOut = idCol)
    val qLit = typedlit(query)
    vectors.join(broadcast(short.select(col(idCol))), Seq(idCol))
      .select(col(idCol), cosine(col(vecCol), qLit).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** SRP-LSH-bucketed approximate top-k: scan only rows whose bucket matches
    * the query's bucket or differs by one bit (multi-probe). */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      planes: Int = 8): DataFrame = {
    val dim = query.length
    val hp = hyperplanes(planes, dim)
    // query bucket computed driver-side with the same planes
    var qBucket = 0L
    for (p <- 0 until planes) {
      var dot = 0.0
      for (i <- 0 until dim) dot += query(i) * hp(p)(i)
      if (dot >= 0.0) qBucket |= (1L << p)
    }
    val probes = qBucket +: (0 until planes).map(b => qBucket ^ (1L << b))
    val qLit = typedlit(query)
    df.select(col(idCol), col(vecCol),
        srpBucket(col(vecCol), planes, dim).as("bucket"))
      .where(col("bucket").isin(probes: _*))
      .select(col(idCol), cosine(col(vecCol), qLit).as("cos"))
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Approximate top-k through the JL-projected space with exact
    * rerank: candidates are the `k·rerank` best by projected cosine
    * (the 16-dim kernel costs d/k of the exact one — at 100 TB the
    * projection is precomputed once by [[randomProject]] and the scan
    * reads k/d the bytes), then the survivors alone pay full-dimension
    * exact cosine. The query is projected driver-side with the same
    * double-accumulation arithmetic as the kernel, so candidate cuts
    * are deterministic and oracle-replayable; ties break by id at both
    * stages. Zero-norm vectors drop (cosine undefined — the family
    * convention). */
  def jlTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Array[Float],
      k: Int,
      outDim: Int = 16,
      rerank: Int = 4): DataFrame = {
    require(k >= 1 && rerank >= 1, s"k and rerank must be >= 1")
    val dim = query.length
    val planes = jlPlanes(outDim, dim)
    val pq = new Array[Float](outDim)
    var j = 0
    while (j < outDim) {
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += planes(j)(i) * query(i); i += 1 }
      pq(j) = acc.toFloat
      j += 1
    }
    val cand = df.select(col(idCol), col(vecCol),
        cosine(randomProject(col(vecCol), outDim, dim), typedlit(pq)).as("pcos"))
      .where(col("pcos").isNotNull)
      .orderBy(desc("pcos"), col(idCol))
      .limit(k * rerank)
    cand.select(col(idCol),
        round(cosine(col(vecCol), typedlit(query)), 6).as("cos"))
      .where(col("cos").isNotNull)
      .orderBy(desc("cos"), col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion [Cormack et al. 2009] — the standard way to
    * combine heterogeneous retrievers (BM25 + dense ANN + recency …)
    * without score calibration: fused(d) = Σ_lists 1/(c + rank_list(d)),
    * missing-from-list contributes 0. Each input must carry `idCol` and
    * a 1-based `rank` column (ranks, not scores — that is the point of
    * RRF). Determinism: per doc the reciprocal terms are summed in
    * FIXED list order via pivot slots, and every term is an IEEE
    * division of exact integers, so the fused score replays
    * bit-for-bit cross-engine.
    *
    * Scale shape: inputs are top-k lists (tiny by construction) — one
    * union + one pivot aggregation + a TakeOrdered; nothing here
    * touches a corpus. Returns `(idCol, n_lists, rrf_score)`, the
    * fused top `k`. */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      c: Int = 60,
      k: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "rankings must be non-empty")
    require(c >= 1, s"c must be >= 1, got $c")
    val tagged = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol).cast("long").as("__id"),
        col("rank").cast("long").as("__rk"), lit(i).as("__li"))
    }.reduce(_ unionAll _)
    val pivoted = tagged.groupBy(col("__id"))
      .agg(max(when(col("__li") === 0, col("__rk"))).as("__r0"),
        rankings.indices.drop(1).map(i =>
          max(when(col("__li") === i, col("__rk"))).as(s"__r$i")): _*)
    val score = rankings.indices.map { i =>
      val r = col(s"__r$i")
      when(r.isNull, lit(0.0))
        .otherwise(lit(1.0) / (lit(c.toDouble) + r.cast("double")))
    }.reduce(_ + _)
    val nLists = rankings.indices.map(i =>
      when(col(s"__r$i").isNotNull, 1L).otherwise(0L)).reduce(_ + _)
    pivoted.select(col("__id").as(idCol), nLists.as("n_lists"),
        score.as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(k)
  }
}
