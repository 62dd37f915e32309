package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over interaction edges — the corpus-curation uses are
 * domain-authority weighting (rank hosts by link/interaction structure,
 * then bias source mixing toward authoritative domains) and influence
 * scoring of user/item graphs mined from event logs. The duplicate-graph
 * side (connected components) lives in [[Dedup.duplicateClusters]].
 *
 * PageRank here is FIXED-POINT INTEGER arithmetic end to end: ranks are
 * scaled by 10^6 and every per-edge contribution is the integer division
 * floor(rank·85 / (100·outdeg)). Two reasons. First, integer sums are
 * order-independent, so a distributed aggregation and a single-threaded
 * oracle get bit-identical results — float PageRank cannot be
 * value-verified across engines without pinning every summation order.
 * Second, the quantization error (≤ 1 per edge per iteration, against a
 * 10^6 scale) is far below any ranking decision a pipeline would make.
 * The damping base is floor(0.15·10^6) = 150000 added every iteration.
 */
object Graph {

  /** Fixed-point PageRank over a directed edge list.
    *
    * rank_0(v) = 10^6;
    * rank_{i+1}(v) = 150000 + Σ_{(u,v) ∈ E} (rank_i(u)·85) div (100·outdeg(u))
    *
    * Dangling nodes (no outgoing edges) contribute nothing — callers who
    * need the classic redistribute-to-all behavior should add reverse
    * edges (as [[pageRankEvents]] does), which also guarantees every
    * node is reachable and has outdegree ≥ 1.
    *
    * Scale shape: the edge list is deduplicated once, joined with its
    * outdegree, and PERSISTED pre-partitioned on `src`; every iteration
    * is then one shuffle-hash/sort-merge join ranks⋈edges on src (the
    * edge side reuses its partitioning) plus one aggregation shuffle on
    * dst — the Pregel cost model, 2 exchanges per iteration on the rank
    * table only, never the corpus.
    *
    * Lineage truncation: every `checkpointEvery` iterations the rank
    * table is MATERIALIZED ([[Dedup.duplicateClusters]]'s two modes,
    * identical results — spec-pinned):
    *  - `checkpointDir = null` (default): `localCheckpoint()` —
    *    executor-local blocks; fast, but NOT fault-tolerant: the
    *    checkpoint truncates lineage, so blocks lost with an executor
    *    are unrecoverable and the job fails (re-run it). Superseded
    *    checkpoints are released as soon as the next one materializes.
    *  - `checkpointDir` set: ranks written to parquet under the dir and
    *    read back — any-FS durable, an executor loss recomputes at most
    *    `checkpointEvery` iterations from files. Superseded checkpoints
    *    are deleted as the run proceeds, and the per-run directory is
    *    REMOVED before returning: the final ranks are eagerly
    *    materialized (localCheckpoint — one small row per node) so the
    *    returned frame owes nothing to the deleted files and repeated
    *    runs leave no orphan pr_<uuid> dirs behind.
    * Without truncation a 100-iteration run is a 100-deep chained-join
    * plan whose analysis time alone grows unboundedly; with it, any
    * iteration count is safe (so there is no iteration cap).
    */
  def pageRankFixed(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      checkpointDir: String = null,
      checkpointEvery: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val spark = edges.sparkSession
    val runDir =
      if (checkpointDir == null) null
      else checkpointDir.stripSuffix("/") + "/pr_" +
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
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // (src, dst, outdeg), partitioned by src so each iteration's rank
    // join reuses the layout instead of re-shuffling the edge list
    val ew = e.join(outdeg, "src").repartition(col("src")).persist()
    nodes.persist()
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank"))
    var i = 0
    var lastCp = -1
    var lastLocalCp: DataFrame = null
    while (i < iterations) {
      val contribs = ew
        .join(ranks, ew("src") === ranks("node"))
        .select(col("dst"),
          expr("(rank * 85) div (100 * outdeg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"), (lit(150000L) + coalesce(col("s"), lit(0L))).as("rank"))
      i += 1
      // truncate lineage every checkpointEvery rounds (skip the final
      // round — the tail materialization below covers it); the
      // superseded checkpoint is released in BOTH modes (files dropped /
      // local blocks unpersisted) so long runs hold exactly one — the
      // LAST one stays pinned because the returned frame reads from it
      if (i % checkpointEvery == 0 && i < iterations) {
        val cp = materialize(ranks, s"ranks_$i")
        if (lastCp >= 0) {
          drop(s"ranks_$lastCp")
          if (runDir == null && lastLocalCp != null)
            graft.operators.releaseLocalCheckpoint(lastLocalCp)
        }
        if (runDir == null) lastLocalCp = cp
        ranks = cp
        lastCp = i
      }
    }
    // materialize the final ranks, then release the iteration caches —
    // without this every call would leak the pinned edge/node tables.
    // The returned frame stays persisted (one small row per node);
    // callers running many PageRanks in one session should unpersist it
    // when done. In durable mode the materialization also severs the
    // result's lineage from the run dir, which is then deleted — the
    // caller never has to know the pr_<uuid> name.
    if (runDir == null) {
      ranks.persist()
      ranks.count()
    } else {
      ranks = ranks.localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(runDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    ew.unpersist()
    nodes.unpersist()
    ranks
  }

  /** WEIGHTED fixed-point PageRank — [[pageRankFixed]] with the random
    * surfer following edges in proportion to integer edge weights:
    *
    * rank_{i+1}(v) = 150000 + Σ_{(u,v,w) ∈ E} (rank_i(u)·85·w) div (100·outW(u))
    *
    * where outW(u) is u's total outgoing weight. The unweighted form is
    * the w ≡ 1 special case (spec-pinned equal). On an interaction
    * graph weighted by event counts this ranks by engagement VOLUME,
    * not just link existence — the source-weighting signal a curation
    * pipeline actually wants. Same discipline throughout: weights cast
    * to LONG and required positive LOUDLY (zero/negative weights would
    * silently reshape every division), parallel (src, dst) edges
    * collapse with summed weight, dangling nodes contribute nothing,
    * contributions are exact integer ops so every round replays in the
    * oracle engine. Overflow bound: rank·85·w must fit a long — with
    * ranks bounded by the graph's total injected mass (n·10^6-ish),
    * weights up to ~10^5 are safe at a million nodes; bigger weights
    * should be rescaled (they are RATIOS per source, so dividing all of
    * a node's out-weights by their gcd changes nothing).
    *
    * Scale shape and lineage truncation are [[pageRankFixed]]'s: edges
    * joined with total out-weight, persisted pre-partitioned on src;
    * 2 exchanges per iteration on the rank table; ranks materialized
    * every `checkpointEvery` rounds (local or durable, identical
    * results). */
  def pageRankWeightedFixed(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      iterations: Int = 5,
      checkpointDir: String = null,
      checkpointEvery: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val spark = edges.sparkSession
    val runDir =
      if (checkpointDir == null) null
      else checkpointDir.stripSuffix("/") + "/prw_" +
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
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"),
        col(weightCol).cast("long").as("w"))
      .where(col("src").isNotNull && col("dst").isNotNull && col("w").isNotNull)
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
    val ew = e.join(outw, "src").repartition(col("src")).persist()
    nodes.persist()
    try {
      // positive-weight contract, checked loudly on the collapsed edges
      val minW = ew.agg(min(col("w"))).head()
      require(minW.isNullAt(0) || minW.getLong(0) > 0,
        s"pageRankWeightedFixed: non-positive collapsed edge weight " +
          s"${minW.getLong(0)} — weights must be positive integers")
      var ranks = nodes.select(col("node"), lit(1000000L).as("rank"))
      var i = 0
      var lastCp = -1
      var lastLocalCp: DataFrame = null
      while (i < iterations) {
        val contribs = ew
          .join(ranks, ew("src") === ranks("node"))
          .select(col("dst"),
            expr("(rank * 85 * w) div (100 * outw)").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("s"))
        ranks = nodes
          .join(contribs, nodes("node") === contribs("dst"), "left")
          .select(col("node"),
            (lit(150000L) + coalesce(col("s"), lit(0L))).as("rank"))
        i += 1
        if (i % checkpointEvery == 0 && i < iterations) {
          val cp = materialize(ranks, s"ranks_$i")
          if (lastCp >= 0) {
            drop(s"ranks_$lastCp")
            if (runDir == null && lastLocalCp != null)
              graft.operators.releaseLocalCheckpoint(lastLocalCp)
          }
          if (runDir == null) lastLocalCp = cp
          ranks = cp
          lastCp = i
        }
      }
      if (runDir == null) {
        ranks.persist()
        ranks.count()
      } else {
        ranks = ranks.localCheckpoint(true)
      }
      ranks
    } finally {
      ew.unpersist()
      nodes.unpersist()
      if (runDir != null) {
        val p = new org.apache.hadoop.fs.Path(runDir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
  }

  /** Personalized PageRank [Haveliwala 2002; the random-walk-with-
    * restart form]: identical integer fixed point to [[pageRankFixed]]
    * — rank·85 div (100·outdeg) contributions — except the restart mass
    * lands ONLY on the `seeds` instead of uniformly: seeded nodes add
    * 150000 per round, everyone else 0, so rank concentrates around the
    * seed set's neighbourhood. The curation use: expand a small trusted
    * domain/document seed list through the link graph and keep the
    * high-PPR frontier (seed-anchored quality propagation, the
    * complement to global PageRank's topic-blind authority).
    *
    * The seed set ships as a PLAN-LITERAL `isin` predicate — a seed
    * list is small by nature (that is what "personalized" means), so
    * burning it into the expression avoids one extra join+shuffle per
    * iteration; ≤ 10k seeds enforced loudly (a bigger "seed" set is a
    * node-weight table — join a restart column instead). Same
    * materialization/checkpoint discipline as [[pageRankFixed]];
    * node ids compare as strings (the shared node-domain convention).
    * Unnormalized: scores are comparable WITHIN a run (ranking/
    * thresholding), not across seed sets. */
  def personalizedPageRankFixed(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: Seq[String],
      iterations: Int = 5,
      checkpointDir: String = null,
      checkpointEvery: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    require(seeds.nonEmpty, "personalizedPageRankFixed: empty seed set")
    require(seeds.size <= 10000,
      s"personalizedPageRankFixed: ${seeds.size} seeds — a set this large " +
        "is a node-weight table, not a personalization vector")
    val spark = edges.sparkSession
    val runDir =
      if (checkpointDir == null) null
      else checkpointDir.stripSuffix("/") + "/ppr_" +
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
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ew = e.join(outdeg, "src").repartition(col("src")).persist()
    nodes.persist()
    val restart = when(col("node").isInCollection(seeds), 150000L).otherwise(0L)
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank"))
    var i = 0
    var lastCp = -1
    var lastLocalCp: DataFrame = null
    while (i < iterations) {
      val contribs = ew
        .join(ranks, ew("src") === ranks("node"))
        .select(col("dst"),
          expr("(rank * 85) div (100 * outdeg)").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(contribs, nodes("node") === contribs("dst"), "left")
        .select(col("node"), (restart + coalesce(col("s"), lit(0L))).as("rank"))
      i += 1
      if (i % checkpointEvery == 0 && i < iterations) {
        val cp = materialize(ranks, s"ranks_$i")
        if (lastCp >= 0) {
          drop(s"ranks_$lastCp")
          if (runDir == null && lastLocalCp != null)
            graft.operators.releaseLocalCheckpoint(lastLocalCp)
        }
        if (runDir == null) lastLocalCp = cp
        ranks = cp
        lastCp = i
      }
    }
    if (runDir == null) {
      ranks.persist()
      ranks.count()
    } else {
      ranks = ranks.localCheckpoint(true)
      val p = new org.apache.hadoop.fs.Path(runDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    ew.unpersist()
    nodes.unpersist()
    ranks
  }

  /** The event-log authority graph: one edge user→item per distinct
    * (user, item) interaction — the item key extracted with the
    * library's own `json_get_int` — plus the reverse item→user edge, so
    * the bipartite graph is strongly connected enough for PageRank (no
    * dangling nodes: every node that appears has outdegree ≥ 1).
    * Returns (node, rank) after `iterations` fixed-point rounds. */
  def pageRankEvents(
      events: DataFrame,
      iterations: Int = 5): DataFrame = {
    val pairs = events.select(
        concat(lit("u"), col("user_id").cast("long")).as("u"),
        concat(lit("i"), graft.JsonFunctions.json_get_int(col("props"), lit("k"))).as("it"))
      .where(col("u").isNotNull && col("it").isNotNull)
      .distinct()
    val fwd = pairs.select(col("u").as("src"), col("it").as("dst"))
    val rev = pairs.select(col("it").as("src"), col("u").as("dst"))
    pageRankFixed(fwd.union(rev), "src", "dst", iterations)
  }

  /** Per-node triangle counts over an UNDIRECTED graph (direction and
    * self-loops are dropped here; multi-edges collapse). The classic
    * clustering-coefficient numerator — near-dup graphs with many
    * triangles indicate template families rather than chance collisions.
    *
    * Standard distributed formulation: orient every edge low→high, join
    * wedges (a<b, b<c) with closing edges (a<c) — each triangle a<b<c
    * is found EXACTLY once, so no dedup and no double counting; the
    * per-node count then credits all three corners. Two equi-join
    * shuffles on node keys; the orientation bounds wedge fan-out by
    * HIGH-neighbor degree, the standard mitigation that keeps hub
    * wedges from exploding (a hub's wedge count is over its
    * higher-id neighbors only). Returns `(node, n_triangles)` for
    * every node of the graph (0 for triangle-free nodes). */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val e = canonicalUndirected(edges, srcCol, dstCol)
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
    nodes.join(triangleCorners(e), Seq("node"), "left")
      .select(col("node"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** Canonical undirected simple edges: string-cast, self-loops dropped,
    * low/high oriented, multi-edges collapsed — the representation
    * [[triangleCounts]], [[clusteringCoefficients]], and
    * [[kCoreMembers]] all count on. */
  private def canonicalUndirected(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val raw = edges.select(col(srcCol).cast("string").as("x"),
        col(dstCol).cast("string").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
    raw.select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
  }

  /** Per-node triangle counts over canonical edges — each triangle
    * a<b<c found exactly once by the wedge + closing-edge join, all
    * three corners credited. Nodes with no triangles are absent. */
  private def triangleCorners(e: DataFrame): DataFrame = {
    val e2 = e.select(col("a").as("wa"), col("b").as("wb"))
    val e3 = e.select(col("a").as("ca"), col("b").as("cb"))
    val wedges = e.join(e2, col("b") === col("wa"))
      .select(col("a"), col("b"), col("wb").as("c"))
    val tris = wedges.join(e3,
      col("a") === col("ca") && col("c") === col("cb"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).cast("long").as("n_triangles"))
  }

  /** Degree assortativity [Newman 2002, "Assortative mixing in
    * networks"]: the Pearson correlation of degrees across edges —
    * positive when hubs link to hubs (social-style graphs), negative
    * when hubs link to leaves (web/interaction stars). Over the
    * canonical undirected simple graph with M edges and endpoint
    * degrees (a, b) per edge, the stub-doubled form reduces to FOUR
    * exact integer sums — Σab, Σ(a+b), Σ(a²+b²), M — and
    *
    *   r = (4M·Σab − (Σ(a+b))²) / (2M·Σ(a²+b²) − (Σ(a+b))²)
    *
    * Numerator/denominator are computed on the driver in BigInteger
    * (no overflow at any scale), divided as doubles, rounded to 6.
    * Degenerate graphs (every edge joining equal-degree nodes, e.g. a
    * clique — denominator 0) return NULL r with the sums intact.
    * Returns ONE row `(m_edges, s_ab, s_sum, s_sq, r)`.
    * Scale shape: one degree aggregation + one src- and one dst-keyed
    * join of edges to degrees + a global sum — two shuffles of the
    * edge list, nothing quadratic. */
  def degreeAssortativity(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val spark = edges.sparkSession
    val e = canonicalUndirected(edges, srcCol, dstCol)
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).cast("long").as("d"))
    val da = deg.select(col("node").as("a"), col("d").as("da"))
    val db = deg.select(col("node").as("b"), col("d").as("db"))
    val sums = e.join(da, "a").join(db, "b")
      .agg(count(lit(1)).cast("long").as("m_edges"),
        sum(col("da") * col("db")).as("s_ab"),
        sum(col("da") + col("db")).as("s_sum"),
        sum(col("da") * col("da") + col("db") * col("db")).as("s_sq"))
      .head()
    import spark.implicits._
    if (sums.isNullAt(1)) // empty graph: no edges, r undefined
      return Seq((0L, 0L, 0L, 0L, Option.empty[Double]))
        .toDF("m_edges", "s_ab", "s_sum", "s_sq", "r")
    val m = BigInt(sums.getLong(0))
    val sAb = BigInt(sums.getLong(1))
    val sSum = BigInt(sums.getLong(2))
    val sSq = BigInt(sums.getLong(3))
    val num = 4 * m * sAb - sSum * sSum
    val den = 2 * m * sSq - sSum * sSum
    val r =
      if (den == 0) Option.empty[Double]
      else {
        val raw = num.bigInteger.doubleValue() / den.bigInteger.doubleValue()
        Some(java.math.BigDecimal.valueOf(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
      }
    Seq((sums.getLong(0), sums.getLong(1), sums.getLong(2), sums.getLong(3), r))
      .toDF("m_edges", "s_ab", "s_sum", "s_sq", "r")
  }

  /** Local clustering coefficient [Watts & Strogatz 1998]: for each node,
    * the fraction of its neighbor pairs that are themselves connected —
    * lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)), with T(v) the node's
    * triangle count and deg(v) its degree in the undirected simple
    * graph; degree-<2 nodes get 0 (no neighbor pair exists). The
    * standard local-density score on interaction/near-dup graphs: high
    * lcc marks template families and tight communities, low lcc marks
    * bridges and hubs of unrelated traffic.
    *
    * Both ingredients are exact integers from the same canonical edge
    * set ([[triangleCounts]]'s wedge join + one degree aggregation), so
    * the ratio is deterministic and the oracle replays it value-level.
    * Returns `(node, degree, n_triangles, lcc)` for every node.
    * Scale shape: the wedge join (bounded by high-neighbor degree) +
    * two keyed aggregations — no new shuffle beyond [[triangleCounts]]. */
  def clusteringCoefficients(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val e = canonicalUndirected(edges, srcCol, dstCol)
    val deg = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).cast("long").as("degree"))
    deg.join(triangleCorners(e), Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("lcc",
        when(col("degree") >= 2,
          lit(2.0) * col("n_triangles") /
            (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)))
  }

  /** k-core membership by iterative peeling [Seidman 1983, "Network
    * structure and minimum degree"; distributed formulation as in
    * Montresor et al. 2011]: repeatedly delete every node whose degree
    * in the surviving subgraph is below `k` until none remains. The
    * k-core is the unique maximal subgraph of minimum degree ≥ k — the
    * standard density screen for curation graphs (duplicate-cluster
    * cores, citation/link spam filtering, community scaffolding).
    * Input edges are canonicalized undirected (least/greatest,
    * self-loops dropped, string-cast node ids like [[triangleCounts]]);
    * returns `(node, core_deg)` for every surviving node, where
    * `core_deg` is its degree INSIDE the core (≥ k by definition).
    *
    * Each round is one keyed degree aggregation + two left-semi
    * equi-joins filtering the edge list — no broadcast of the node set,
    * so rounds scale to any graph the shuffle can hold. The surviving
    * edge list is MATERIALIZED per round ([[pageRankFixed]] discipline:
    * executor-local by default, durable parquet under `checkpointDir`),
    * since an un-truncated iterative plan re-executes its whole prefix.
    * Round count is data-dependent — a path graph peels from the ends
    * inward — so `maxIter` bounds it LOUDLY (the fixpoint is detected
    * by edge-count stability: peeling only ever removes edges, and an
    * unchanged edge set fixes every degree). */
  def kCoreMembers(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxIter: Int = 30,
      checkpointDir: String = null): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val spark = edges.sparkSession
    val runDir =
      if (checkpointDir == null) null
      else checkpointDir.stripSuffix("/") + "/kcore_" +
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
    val raw = edges.select(col(srcCol).cast("string").as("x"),
        col(dstCol).cast("string").as("y"))
      .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
    var e = materialize(
      raw.select(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b"))
        .distinct(), "e0")
    var nEdges = e.count()
    var iter = 0
    var converged = nEdges == 0L
    while (!converged) {
      iter += 1
      require(iter <= maxIter,
        s"kCoreMembers: no fixpoint after $maxIter peel rounds (long " +
          "degree cascades — raise maxIter)")
      val keep = e.select(col("a").as("node"))
        .union(e.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select("node")
      val prev = e
      e = materialize(
        prev.join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
          .select("a", "b"), s"e$iter")
      drop(s"e${iter - 1}")
      graft.operators.releaseLocalCheckpoint(prev)
      val n = e.count()
      converged = n == nEdges || n == 0L
      nEdges = n
    }
    val out = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).cast("long").as("core_deg"))
      .where(col("core_deg") >= k) // isolated-after-peel guard: never fires at fixpoint
      .localCheckpoint() // the result outlives the run dir removal below
    if (runDir != null) {
      val p = new org.apache.hadoop.fs.Path(runDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    out
  }

  /** k-truss [Cohen 2008, "Trusses: cohesive subgraphs for social
    * network analysis"]: the maximal subgraph in which every EDGE sits
    * in ≥ k−2 triangles — a strictly stronger cohesion filter than the
    * k-core (every k-truss is inside the (k−1)-core, but a star
    * survives coring and dies trussing), the standard screen for
    * template families and tight communities where node-degree
    * filters pass hub noise. Iterative peeling: compute per-edge
    * triangle support ([[triangleCounts]]'s oriented wedge join, each
    * triangle credited to its three edges), delete edges below k−2,
    * repeat — removals cascade, so rounds run to the fixpoint
    * (edge-count stability; removals-only makes that sound) under a
    * LOUD `maxIter` bound. Returns the surviving edges
    * `(a, b, support)` with support measured INSIDE the truss.
    *
    * Scale shape per round: one wedge equi-join bounded by high-
    * neighbor degree + one keyed count + one left join back — the
    * [[triangleCounts]] shuffle plan iterated; the surviving edge list
    * is MATERIALIZED each round ([[kCoreMembers]] discipline:
    * executor-local, or durable parquet under `checkpointDir`). */
  def kTrussEdges(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      maxIter: Int = 30,
      checkpointDir: String = null): DataFrame = {
    require(k >= 3, s"k must be >= 3 (k-2 triangles per edge), got $k")
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val spark = edges.sparkSession
    val runDir =
      if (checkpointDir == null) null
      else checkpointDir.stripSuffix("/") + "/ktruss_" +
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
    var e = materialize(
      canonicalUndirected(edges, srcCol, dstCol)
        .withColumn("support", lit(0L)), "e0")
    var nEdges = e.count()
    var iter = 0
    var converged = nEdges == 0L
    while (!converged) {
      iter += 1
      require(iter <= maxIter,
        s"kTrussEdges: no fixpoint after $maxIter peel rounds (long " +
          "support cascades — raise maxIter)")
      val e2 = e.select(col("a").as("wa"), col("b").as("wb"))
      val e3 = e.select(col("a").as("ca"), col("b").as("cb"))
      val tris = e.join(e2, col("b") === col("wa"))
        .select(col("a"), col("b"), col("wb").as("c"))
        .join(e3, col("a") === col("ca") && col("c") === col("cb"))
        .select(col("a"), col("b"), col("c"))
      val sup = tris.select(col("a").as("ea"), col("b").as("eb"))
        .unionAll(tris.select(col("b").as("ea"), col("c").as("eb")))
        .unionAll(tris.select(col("a").as("ea"), col("c").as("eb")))
        .groupBy(col("ea"), col("eb"))
        .agg(count(lit(1)).cast("long").as("sup"))
      val prev = e
      e = materialize(
        prev.join(sup,
            prev("a") === sup("ea") && prev("b") === sup("eb"), "left")
          .select(prev("a"), prev("b"),
            coalesce(col("sup"), lit(0L)).as("support"))
          .where(col("support") >= k - 2), s"e$iter")
      drop(s"e${iter - 1}")
      graft.operators.releaseLocalCheckpoint(prev)
      val n = e.count()
      converged = n == nEdges || n == 0L
      nEdges = n
    }
    val out = e.localCheckpoint() // outlives the run dir removal below
    if (runDir != null) {
      val p = new org.apache.hadoop.fs.Path(runDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    out
  }

  /** Deterministic label-propagation community detection (min-label-wins
    * over an undirected graph — the HashMin fixed point [Kang et al.
    * 2009, PEGASUS; Raghavan et al. 2007's LPA with the random tie
    * replaced by min]): every node starts labeled with its own id, and
    * each SYNCHRONOUS round every node takes the minimum of its own
    * label and its neighbors' labels. The fixed point labels every node
    * with the smallest id reachable from it, so communities are the
    * graph's connected components with a canonical (minimum-member)
    * representative — fully deterministic, no tie randomness, integer
    * end to end, hence oracle-replayable round-for-round.
    *
    * Scale shape per round: the label frame joins the (undirected)
    * adjacency on the node key — two co-keyed shuffles — and one
    * min-aggregation; labels MATERIALIZE per round ([[kCoreMembers]]
    * discipline) so the iterative plan never re-executes its prefix.
    * Round count is the maximum distance from any node to its
    * component's minimum — star/hub-shaped graphs converge in 2-3
    * rounds; long paths need their length (bound it with `maxIter`,
    * which fails LOUDLY rather than emitting a non-fixpoint labeling).
    * Returns `(node, community)` with node/community LONG ids. */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 30,
      checkpointDir: String = null): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    val spark = edges.sparkSession
    val runDir =
      if (checkpointDir == null) null
      else checkpointDir.stripSuffix("/") + "/lpa_" +
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
    val e = materialize(
      edges.select(col(srcCol).cast("long").as("x"),
          col(dstCol).cast("long").as("y"))
        .where(col("x").isNotNull && col("y").isNotNull && col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b"))
        .distinct(), "e")
    // both directions once, so each round is a plain equi-join
    val und = materialize(
      e.select(col("a").as("n"), col("b").as("m"))
        .unionAll(e.select(col("b").as("n"), col("a").as("m"))), "und")
    var lab = materialize(
      und.select(col("n").as("node")).distinct()
        .select(col("node"), col("node").as("lbl")), "l0")
    // try/finally: a failed round (or the loud maxIter require) must not
    // leak the lpa_* run directory under checkpointDir — the finally
    // deletes runDir on BOTH paths (DecadeProbe/ScaleProbe discipline)
    try {
      var iter = 0
      var converged = false
      while (!converged) {
        iter += 1
        require(iter <= maxIter,
          s"labelPropagation: no fixpoint after $maxIter rounds (component " +
            "diameter exceeds the bound — raise maxIter)")
        val neigh = und.join(lab.withColumnRenamed("node", "m"), Seq("m"))
          .groupBy(col("n").as("node")).agg(min(col("lbl")).as("nl"))
        val prev = lab
        lab = materialize(
          prev.join(neigh, Seq("node"), "left")
            .select(col("node"),
              least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl")),
          s"l$iter")
        // fixpoint = zero labels changed this round (labels only decrease)
        val changed = lab.join(prev.withColumnRenamed("lbl", "prev_lbl"), Seq("node"))
          .where(col("lbl") =!= col("prev_lbl")).count()
        drop(s"l${iter - 1}")
        graft.operators.releaseLocalCheckpoint(prev)
        converged = changed == 0L
      }
      val out = lab.select(col("node"), col("lbl").as("community"))
        .localCheckpoint() // outlives the run-dir removal in the finally
      graft.operators.releaseLocalCheckpoint(lab)
      graft.operators.releaseLocalCheckpoint(e)
      graft.operators.releaseLocalCheckpoint(und)
      out
    } finally {
      if (runDir != null) {
        val p = new org.apache.hadoop.fs.Path(runDir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
  }

  /** WEIGHTED label-propagation communities (Raghavan et al. 2007 with
    * edge weights, every randomness source removed): each SYNCHRONOUS
    * round every node adopts the label carrying the MAXIMUM total
    * incident edge weight among its neighbors' current labels, ties →
    * smallest label. This is the community detector [[labelPropagation]]
    * (HashMin — connected components) is not: on a CONNECTED graph whose
    * communities are tied together by weak edges, min-label floods
    * everything to one id while the weighted argmax keeps each
    * strongly-coupled block on its own label.
    *
    * Determinism and replayability: weights are cast to LONG (exact
    * integer sums — float argmaxes are summation-order-dependent and
    * unverifiable across engines; the [[hitsFixed]] discipline) and must
    * be positive (checked LOUDLY — a zero/negative weight silently
    * reshapes the argmax). Parallel edges and both orientations of a
    * pair collapse to one undirected edge with SUMMED weight; self-loops
    * drop. Every tie anywhere breaks to the smaller label, so the round-t
    * labeling is a pure function of the data — the q_communities_weighted
    * oracle replays the rounds as unrolled CTEs value-for-value.
    *
    * Synchronous LPA has NO fixpoint guarantee (bipartite structures
    * oscillate two-cycles forever), so the contract is "the labeling
    * after exactly `rounds` rounds" — no convergence claim. A round that
    * changes nothing ends the run early: since each round is a function
    * of the labeling alone, a fixpoint makes all later rounds identical,
    * so the early stop returns exactly the round-`rounds` answer.
    *
    * Scale shape per round ([[labelPropagation]]'s): one equi-join of
    * the label frame against the pre-materialized undirected adjacency,
    * one (node, label) weight-sum aggregation, one per-node top-1 window
    * — two co-keyed shuffles; labels MATERIALIZE per round so the
    * iterative plan never re-executes its prefix. Returns
    * `(node, community)` LONG ids. */
  def labelPropagationWeighted(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      rounds: Int = 4,
      checkpointDir: String = null): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = edges.sparkSession
    val runDir =
      if (checkpointDir == null) null
      else checkpointDir.stripSuffix("/") + "/lpw_" +
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
    val e = materialize(
      edges.select(col(srcCol).cast("long").as("x"),
          col(dstCol).cast("long").as("y"),
          col(weightCol).cast("long").as("w"))
        .where(col("x").isNotNull && col("y").isNotNull &&
          col("w").isNotNull && col("x") =!= col("y"))
        .select(least(col("x"), col("y")).as("a"),
          greatest(col("x"), col("y")).as("b"), col("w"))
        .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w")), "we")
    try {
      // positive-weight contract, checked loudly against the collapsed
      // edge list (one tiny scan of the already-materialized frame)
      val minW = e.agg(min(col("w"))).head()
      require(minW.isNullAt(0) || minW.getLong(0) > 0,
        s"labelPropagationWeighted: non-positive collapsed edge weight " +
          s"${minW.getLong(0)} — weights must be positive integers")
      val und = materialize(
        e.select(col("a").as("n"), col("b").as("m"), col("w"))
          .unionAll(e.select(col("b").as("n"), col("a").as("m"), col("w"))),
        "und")
      var lab = materialize(
        und.select(col("n").as("node")).distinct()
          .select(col("node"), col("node").as("lbl")), "l0")
      var iter = 0
      var converged = false
      while (iter < rounds && !converged) {
        iter += 1
        // every node has >= 1 neighbor (nodes are edge endpoints), so the
        // argmax is total: no keep-own-label fallback branch exists.
        // OPTIMIZATION r16 (guide §2.4): the per-node top-1 was a
        // row_number window over the (node, lbl) aggregate — an extra
        // partition-by-node SORT per round. max_by over the exact
        // integer key (s, −lbl) is the same argmax (max weight, ties →
        // smaller label; labels are non-negative node ids so the
        // negation is overflow-safe and order-reversing) as one
        // partial-agg-friendly aggregation — round-for-round identical
        // (spec-pinned vs the planted fixture and the unrolled oracle).
        val next = und.join(lab.withColumnRenamed("node", "m"), Seq("m"))
          .groupBy(col("n").as("node"), col("lbl"))
          .agg(sum(col("w")).as("s"))
          .groupBy(col("node"))
          .agg(max_by(col("lbl"), struct(col("s"), (-col("lbl")).as("nl")))
            .as("lbl"))
        val prev = lab
        lab = materialize(next, s"l$iter")
        // the last round's labeling is returned whether or not it is a
        // fixpoint, so its changed-count job is pure overhead — skip it
        if (iter < rounds) {
          val changed = lab.join(prev.withColumnRenamed("lbl", "prev_lbl"),
              Seq("node"))
            .where(col("lbl") =!= col("prev_lbl")).count()
          converged = changed == 0L
        }
        drop(s"l${iter - 1}")
        graft.operators.releaseLocalCheckpoint(prev)
      }
      val out = lab.select(col("node"), col("lbl").as("community"))
        .localCheckpoint() // outlives the run-dir removal in the finally
      graft.operators.releaseLocalCheckpoint(lab)
      graft.operators.releaseLocalCheckpoint(e)
      graft.operators.releaseLocalCheckpoint(und)
      out
    } finally {
      if (runDir != null) {
        val p = new org.apache.hadoop.fs.Path(runDir)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
    }
  }

  /** Newman–Girvan MODULARITY of a labeling [Newman & Girvan 2004;
    * the Louvain objective, Blondel et al. 2008]: per community c,
    * Q_c = Σin_c/2m − (Σtot_c/2m)², where Σin_c counts each internal
    * edge's weight TWICE (both directions), Σtot_c is the community's
    * total degree, and 2m is the graph's total degree. Q = Σ_c Q_c ∈
    * [−1/2, 1) scores how much denser the communities are than the
    * degree-preserving random graph — the quality number that turns
    * [[labelPropagationWeighted]]'s labeling into a measurable claim.
    *
    * All mass terms are EXACT integers (the [[hitsFixed]] discipline):
    * weights cast to long, edges canonicalized exactly as the weighted
    * LPA does (self-loops dropped, parallel edges and both orientations
    * collapsed with summed weight), so `in2` (= Σin_c), `tot` and
    * `two_m` replay in any engine; only the final contribution division
    * is floating point (two IEEE divisions, one multiply, one subtract
    * — identical everywhere, rounded to 6 for display). Unlabeled
    * endpoints fail LOUDLY (a silent drop would misstate every term
    * the node touches); `two_m` is bounded so tot² cannot overflow.
    *
    * Returns one row per community: `(community, in2, tot, two_m,
    * contrib)` — Q is `sum(contrib)`. Scale shape: two broadcast-or-
    * shuffle equi-joins of the edge list against the (node → community)
    * frame, then one community-keyed aggregation; no iteration. */
  def modularity(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      labels: DataFrame,
      nodeCol: String,
      communityCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("x"),
        col(dstCol).cast("long").as("y"),
        col(weightCol).cast("long").as("w"))
      .where(col("x").isNotNull && col("y").isNotNull &&
        col("w").isNotNull && col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"), col("w"))
      .groupBy(col("a"), col("b")).agg(sum(col("w")).as("w"))
    val lab = labels.select(col(nodeCol).cast("long").as("node"),
      col(communityCol).cast("long").as("c"))
    // OPTIMIZATION r16 (guide §2.4 / §5): the labeled-edge frame used to
    // be re-executed FOUR times (the two_m driver agg, the in2 agg, and
    // twice via the tot unionAll) — each re-execution replaying the edge
    // canonicalization groupBy and both label joins. It is small
    // (collapsed edges), so materialize it ONCE (eager localCheckpoint —
    // this also fires the loud unlabeled-endpoint raise_error exactly
    // once), then derive every mass from it: per-community in2/tot fold
    // in ONE pass by exploding each edge into its two endpoint rows (an
    // internal edge contributes its weight at BOTH rows of the same
    // community, which is exactly the ×2 in Σin). All sums are exact
    // integer masses — order-free, so values are unchanged.
    val ej = e
      .join(lab.select(col("node").as("a"), col("c").as("ca")), Seq("a"), "left")
      .join(lab.select(col("node").as("b"), col("c").as("cb")), Seq("b"), "left")
      .select(
        // loud labeling contract: every endpoint must carry a community
        when(col("ca").isNull || col("cb").isNull,
          raise_error(concat(lit("modularity: unlabeled endpoint in edge ("),
            col("a").cast("string"), lit(", "), col("b").cast("string"),
            lit(")"))))
          .otherwise(col("ca")).as("ca"),
        col("cb"), col("w"))
      .localCheckpoint(true)
    val stats = ej.agg(coalesce(sum(col("w") * 2), lit(0L)).as("two_m")).head()
    val twoM = stats.getLong(0)
    // tot_c <= two_m, so tot² <= two_m² — keep it inside a long, loudly
    require(twoM < 3037000499L,
      s"modularity: total degree $twoM overflows the exact-integer " +
        "contract (tot² must fit in a long)")
    if (twoM == 0L)
      return lab.sparkSession.emptyDataFrame
        .select(lit(0L).as("community"), lit(0L).as("in2"), lit(0L).as("tot"),
          lit(0L).as("two_m"), lit(0.0).as("contrib")).where(lit(false))
    val internal = (col("ca") === col("cb")).as("int")
    val out = ej.select(explode(array(
        struct(col("ca").as("community"), col("w"), internal),
        struct(col("cb").as("community"), col("w"), internal))).as("t"))
      .select(col("t.community").as("community"), col("t.w").as("w"),
        col("t.int").as("int"))
      .groupBy(col("community"))
      .agg(sum(when(col("int"), col("w")).otherwise(0L)).as("in2"),
        sum(col("w")).as("tot"))
      .select(col("community"),
        col("in2"),
        col("tot"),
        lit(twoM).as("two_m"),
        round(
          col("in2").cast("double") / lit(twoM.toDouble) -
            (col("tot").cast("double") / lit(twoM.toDouble)) *
            (col("tot").cast("double") / lit(twoM.toDouble)), 6).as("contrib"))
      // one tiny row per community — materialize so ej can be released
      .localCheckpoint(true)
    graft.operators.releaseLocalCheckpoint(ej)
    out
  }

  /** HITS hubs & authorities (Kleinberg, JACM 1999) on a directed
    * graph, in the same fixed-point integer discipline as
    * [[pageRankFixed]]: auth(v) = Σ hub(u) over in-edges, hub(v) =
    * Σ auth(w) over out-edges, each half-step rescaled so the maximum
    * score is 10^6 — `(x·10^6) div max(x)` is an exact integer op, so
    * the normalization that float HITS does with an L2 norm (summation-
    * order-dependent, unverifiable across engines) becomes one
    * deterministic global max. On bipartite user→item interaction
    * edges, hubs rank curators/feeders and authorities rank the content
    * they converge on — the complement to PageRank's single authority
    * axis for source weighting.
    *
    * Returns `(node, hub, auth)` for every node. Scale shape: the edge
    * list is pre-partitioned by src and persisted (each round's two
    * joins reuse the layout); each half-step is one equi-join + one
    * keyed aggregation + one single-row max that broadcast-joins back.
    *
    * Lineage truncation — [[pageRankFixed]] parity: every
    * `checkpointEvery` rounds the hub table is MATERIALIZED, either
    * executor-local (`checkpointDir = null`, fast but an executor loss
    * kills the job) or durably to parquet under `checkpointDir` (an
    * executor loss recomputes at most `checkpointEvery` rounds from
    * files; superseded checkpoints are deleted as the run proceeds and
    * the per-run directory is removed before returning). Between
    * checkpoints lineage grows 2 joins per round, so any iteration
    * count is safe at any `checkpointEvery`. The default (1) is also
    * the FAST local setting — each half-step's global max is a
    * broadcast subtree that re-executes the un-checkpointed prefix, so
    * sparser cadences trade fewer materializations for redundant
    * recompute (A/B-measured 2x wall at cadence 2); raise the cadence
    * only in durable mode to cut checkpoint WRITE volume on slow
    * filesystems. All modes are result-identical (mode-equivalence
    * spec, as for pageRank). */
  def hitsFixed(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      checkpointDir: String = null,
      checkpointEvery: Int = 1): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val spark = edges.sparkSession
    val runDir =
      if (checkpointDir == null) null
      else checkpointDir.stripSuffix("/") + "/hits_" +
        java.util.UUID.randomUUID().toString.replace("-", "")
    val e = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(col("src"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val retired = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // mid-iteration score frames are SPARSE — a zero-score node
    // contributes nothing to the next half-step's sums, so the
    // per-round zero-fill join against the node table is pure waste;
    // zeros are restored once, at the end. `raw` feeds both the max and
    // the rescale as identical subtrees, so its shuffle runs once per
    // half-step via ReusedExchange.
    def step(scores: DataFrame, scoreCol: String, joinOn: String,
        groupTo: String, outCol: String): DataFrame = {
      val raw = e.join(scores, e(joinOn) === scores("node"))
        .groupBy(col(groupTo)).agg(sum(col(scoreCol)).as("x"))
      val mx = raw.agg(greatest(lit(1L), max(col("x"))).as("mx"))
      // exact-arithmetic ceiling: x·10^6 must stay inside Long. Scores
      // are ≤ 10^6, so this trips only past ~9.2M in-edges on one node —
      // and it trips LOUDLY instead of wrapping silently (ANSI off)
      raw.crossJoin(broadcast(mx))
        .select(col(groupTo).as("node"),
          expr(s"CASE WHEN x <= ${Long.MaxValue / 1000000L}L " +
            s"THEN (x * 1000000L) div mx " +
            "ELSE raise_error('hitsFixed: half-step sum exceeds the exact " +
            "Long ceiling (a node with >9.2e6 max-score in-edges); cap hub " +
            "degree upstream or shard the hot node') END").as(outCol))
    }
    def materialize(df: DataFrame, name: String): DataFrame =
      if (runDir == null) df.localCheckpoint(true)
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
    var hubs = nodes.select(col("node"), lit(1000000L).as("hub"))
    var auth: DataFrame = null
    var i = 0
    var lastCp = -1
    while (i < iterations) {
      auth = step(hubs, "hub", "src", "dst", "auth")
      hubs = step(auth, "auth", "dst", "src", "hub")
      i += 1
      // materialize every checkpointEvery ROUNDS and ALWAYS after the
      // final one (unlike pageRank, each half-step's global max is a
      // broadcast subtree that re-executes the whole un-checkpointed
      // prefix — measured 2x wall at cadence 2 — so the final round must
      // not ride lazily into the result job); superseded durable
      // checkpoints are deleted as the run proceeds, local ones released
      // after the result severs its lineage
      if (i % checkpointEvery == 0 || i == iterations) {
        hubs = materialize(hubs, s"hubs_$i")
        // the final round's `auth` frame still READS the superseded
        // checkpoint (auth = step(previous hubs)) until the result
        // materializes — defer that last drop to the run-dir cleanup
        if (lastCp >= 0 && i < iterations) drop(s"hubs_$lastCp")
        lastCp = i
        if (runDir == null) retired += hubs
      }
    }
    // r16: materialize the final auth half-step too — the last round's
    // materialize(hubs) already executed its subtree once, and the
    // result join below would re-execute it a second time over the
    // persisted edge list (auth is the one un-checkpointed frame here)
    auth = materialize(auth, "auth_final")
    if (runDir == null) retired += auth
    val res = nodes
      .join(hubs, Seq("node"), "left")
      .join(auth, Seq("node"), "left")
      .select(col("node"), coalesce(col("hub"), lit(0L)).as("hub"),
        coalesce(col("auth"), lit(0L)).as("auth"))
      .localCheckpoint(true)
    e.unpersist(); nodes.unpersist()
    // the last hub checkpoint backs the result only through the final
    // join, which the checkpoint above severed — release/delete them
    retired.foreach(graft.operators.releaseLocalCheckpoint)
    if (runDir != null) {
      val p = new org.apache.hadoop.fs.Path(runDir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    res
  }
}
