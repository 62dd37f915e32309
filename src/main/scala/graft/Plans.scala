package graft

import java.io.PrintWriter
import org.apache.spark.sql.execution.ExplainMode

/**
 * Regenerates PLANS.md: `sbt "runMain graft.Plans"` (optional args:
 * sfDir outFile). One section per headline shape with the property to
 * check noted above each plan.
 */
object Plans {

  /** query → what to look for in its physical plan. */
  val sections: Seq[(String, String)] = Seq(
    "q_filter_agg" ->
      "JSON filter + aggregation: pruned scan, codegen'd filter, partial agg",
    "q_enrich_join" ->
      "broadcast dimension join: the fact side never shuffles",
    "q_minhash_lsh" ->
      "LSH banding: explode to (band,bucket), equi-join on the bucket key — no cartesian anywhere",
    "q_ann_topk" ->
      "brute-force cosine: partition-local top-k (TakeOrderedAndProject), vectors never shuffle",
    "q_dedup_exact" ->
      "exact dedup: map-side partial aggregation before the one digest shuffle",
    "q_seq_pack" ->
      "sequence packing: window partition-local per shard, no global sort",
    "q_mix_sources" ->
      "source mixing: narrow mix_bucket-kernel filter at scan speed",
    "q_curation" ->
      ("single corpus scan: annotate+digest+signature computed in one pass into a " +
        "persisted slim projection (the InMemoryTableScans); exact dedup is a " +
        "window min on the digest, near-dedup bands the cached signatures — " +
        "NO parquet scan appears in this plan because every branch reads the cache"),
    "q_stratified" ->
      ("stratified sampling: one window shuffle on the stratum key, rank over the " +
        "codegen'd mix64 order — no join, no global sort"),
    "q_redact" ->
      "PII scrubbing: narrow regexp chain at scan speed, zero shuffles",
    "q_line_dedup" ->
      ("line-level corpus dedup: the common-line set (Zipf head) is computed by a " +
        "keyed distinct-count and BROADCAST back against the exploded corpus — " +
        "corpus lines shuffle only for the per-document reassembly groupBy"),
    "q_repetition" ->
      "Gopher repetition signals: one pruned scan, narrow project chain, zero shuffles",
    "q_decontam" ->
      ("decontamination: benchmark grams distinct-ed then BROADCAST; the corpus side " +
        "never shuffles its grams — only the hit rows reach the per-doc groupBy"),
    "q_shards" ->
      "shard assignment: narrow mix64 kernel projection — no Exchange until a caller repartitions on shard",
    "q_ann_ivfpq" ->
      ("IVF+PQ composed ANN: cell assignment, probe filter, fused residual " +
        "encode (ivf_pq_encode), and ADC scoring are one narrow projection " +
        "chain over ONE scan — zero Exchanges; TakeOrderedAndProject merges " +
        "the per-partition top-k"),
    "q_mix_temperature" ->
      ("temperature mixing: the per-source count aggregate is a tiny " +
        "bounded-cardinality groupBy; the corpus itself sees only the " +
        "narrow mix_bucket filter"),
    "q_bloom_decontam" ->
      ("Bloom decontamination screen: the benchmark grams fold into a " +
        "bit-array literal (built by the OR-merged bloom_build aggregate " +
        "in a separate tiny job); the corpus side is ONE narrow codegen'd " +
        "scan with the fused bloom_count_contained kernel — zero " +
        "Exchange, zero Join (the verification orderBy is the only sort)"),
    "q_asof_join" ->
      ("backward as-of join: union-and-carry — tag both sides, ONE " +
        "Exchange hash-partitioned on the key, one sort, a running " +
        "last(ignoreNulls) window; no Join operator, no pair explosion " +
        "(the final sort is verification plumbing)"),
    "q_asof_broadcast" ->
      ("broadcast as-of join: per-key sorted right arrays inside one " +
        "narrow asof_pick expression — the left side has NO shuffle " +
        "Exchange and no sort; the only join is the broadcast hash join " +
        "fetching the matched value columns"),
    "q_range_join" ->
      ("range (point-in-interval) join: right intervals explode to the " +
        "bins they overlap, the match is a hash equi-join on the bin " +
        "key + a residual between filter — no CartesianProduct, no " +
        "BroadcastNestedLoopJoin anywhere"),
    "q_asof_salted" ->
      ("SKEW-SAFE salted as-of join: the carry windows partition on " +
        "(key, time-bin) so one hot key spreads over numBins tasks — " +
        "per-task volume is capped at ~1/numBins of the key at ANY " +
        "skew; the boundary fix-up joins the tiny per-(key,bin) " +
        "closing-carry frame back with a shuffle-hash join that REUSES " +
        "the window's (key,bin) partitioning (no re-sort of the big " +
        "side, no SortMergeJoin); same answer as q_asof_join " +
        "(shared oracle verbatim)"),
    "q_knn_join" ->
      ("batch kNN join: every query row retrieves its exact cosine " +
        "top-k in ONE corpus scan — the query matrix is a broadcast, " +
        "the M×N pairing happens inside a per-partition bounded-heap " +
        "fold (MapPartitions), and the only Exchange carries the " +
        "candidate set (numPartitions × M × k rows): NO join operator " +
        "of any kind, the corpus vectors never shuffle"),
    "q_knn_cells" ->
      ("fully distributed IVF kNN join: corpus and queries each " +
        "Exchange ONCE on the cell id into a CoGroup that scores a " +
        "cell's rows against only the queries that probed it — " +
        "neither data side ever visits the driver, no Join operator, " +
        "candidates-only window settles global top-k"),
    "q_editdist_join" ->
      ("PassJoin edit-distance: segment/probe explodes over the persisted strings, " +
        "(la,i,sub)-keyed equi-joins — no cartesian, verify map-side"),
    "q_ann_jl" ->
      ("JL-projected ANN: plan-literal matrix kernel at scan speed, TakeOrdered " +
        "candidate cut, exact rerank only on the survivors"),
    "q_hits" ->
      ("HITS: src-partitioned persisted edges, sparse per-round score joins, " +
        "single-row broadcast max — no node-table join until the final zero-fill"),
    "q_entropy" ->
      "token entropy: two map-side-partial hash aggregations, zero joins",
    "q_video_frames" ->
      ("real GIF frame sampling: partition-local multi-frame decode " +
        "(flatMap — one blob row fans out to its sampled frames); the " +
        "one pre-decode Exchange spreads the BARE ID column (r16 — the " +
        "single-row-group input scans as one task), blobs never shuffle"),
    "q_img_phash" ->
      ("image perceptual hashing: narrow decode+hash mapPartitions — " +
        "two 64-bit codes per image; the one pre-synthesis Exchange " +
        "spreads the bare id column (r16), blobs never shuffle"),
    "q_img_dedup" ->
      ("banded Hamming near-dup join: explode to (band,chunk), " +
        "equi-join on the chunk key — pigeonhole-complete, no cartesian"),
    "q_winnow_pairs" ->
      ("winnowing overlap pairs: one kernel fingerprint scan, df-capped " +
        "postings equi-join on fp, pair-count agg — no cartesian"),
    "q_kn_bigrams" ->
      ("Kneser-Ney model table: bigram/type count aggs (map-side " +
        "partials), w1/w2 equi-joins, 1-row totals broadcast, " +
        "distributed gcd reduction — no collect"),
    "q_hilbert" ->
      ("Hilbert layout key: the HilbertIndex kernel inside one " +
        "codegen'd projection (the unrolled Column form measured 165 s " +
        "— see Tables.hilbertValue)"),
    "q_audio_resample" ->
      ("exact-rational resampling: narrow parse+resample flatMap per " +
        "(doc, channel); the one pre-synthesis Exchange spreads the " +
        "bare id column (r16), blobs never shuffle"),
    "q_ann_hnsw" ->
      ("HNSW graph ANN: per-partition graph walks inside flatMapGroups; " +
        "the only join is the BROADCAST LEFT-SEMI of the bounded " +
        "candidate id set against the table for the exact rerank — " +
        "no cartesian, raw vectors never shuffle"),
    "q_bpe_bytes_tokens" ->
      ("byte-BPE segmentation: broadcast merge table, one narrow " +
        "mapPartitions with a per-task pre-token memo — no shuffle " +
        "before the verification sort"),
    "q_communities" ->
      ("label propagation (final round's plan): co-keyed label/adjacency " +
        "equi-join + min aggregation over the MATERIALIZED previous round " +
        "— the iterative prefix never re-executes"),
    "q_communities_weighted" ->
      ("weighted label propagation (final round's plan): adjacency/label " +
        "equi-join, (node, label) integer weight-sum aggregation, per-node " +
        "argmax as a max_by AGGREGATION over the exact (s, -lbl) key " +
        "(r16 — no per-round partition sort) over the MATERIALIZED " +
        "previous round, no cartesian anywhere"),
    "q_knn_hnsw" ->
      ("HNSW batch kNN join: per-partition graph walks emit a bounded " +
        "candidate frame (nParts x efSearch rows per query, never the " +
        "corpus), one final per-qid rank window — the corpus side carries " +
        "ZERO Join operators"),
    "q_knn_hnsw_batched" ->
      ("uncapped HNSW join: each query batch is one candidate scan over " +
        "the PERSISTED adjacency (parquet read, no re-insertion), batches " +
        "union into one plan with a single rank window — same zero-Join " +
        "corpus shape as q_knn_hnsw at any query count"),
    "q_ann_hnsw_indexed" ->
      ("persisted HNSW query: the stored per-partition adjacency is " +
        "loaded verbatim (one bounded parquet scan), walked per partition, " +
        "and only nParts x efSearch candidate rows reach the final exact " +
        "re-rank — no vector ever shuffles"),
    "q_ann_hnsw_append" ->
      ("incremental HNSW: query plan identical to q_ann_hnsw_indexed — " +
        "the append rewrote the stored graphs (O(new) insertion work), " +
        "the read side cannot tell (the rebuild-equality contract)"),
    "q_bpe_byte_ids" ->
      ("byte-BPE token ids: the learned merge ranks broadcast as one " +
        "literal map into a narrow encode kernel — token-id emission at " +
        "scan speed, zero shuffles before the per-doc aggregation"),
    "q_stream_bpe_bytes" ->
      ("streaming byte-BPE monitor (post-drain batch plan): the bounded " +
        "memory-sink table feeds the same narrow encode kernel — the " +
        "incremental path re-uses the batch kernel, no extra exchange"),
    "q_stream_mmr" ->
      ("streaming MMR twin (post-drain batch plan): the bounded BottomK " +
        "pool (exact integer microrel key) restricts the greedy re-rank " +
        "to pool-sized frames — the corpus-wide scan happened in the " +
        "stream, not here"),
    "q_warc_wet" ->
      ("WET sidecar: distributed segment write then one connector scan — " +
        "the V2 warc source reads records in file order, narrow " +
        "projection, no shuffle until the final presentation sort"),
    "q_warc_wat" ->
      ("WAT sidecar: the connector scan feeds the library's own json_get " +
        "kernels as a narrow codegen'd projection over the envelope " +
        "column — JSON field extraction at scan speed"),
    "q_video_mjpeg" ->
      ("Motion-JPEG frame sampling: narrow per-blob flatMap decode " +
        "(intra-only — unsampled frames never decoded), zero shuffles " +
        "before the presentation sort"),
    "q_ann_ivf_indexed" ->
      ("persisted IVF probe: the cell IN (...) predicate lands on the " +
        "PARTITION column of the stored layout — PartitionFilters at the " +
        "scan, a genuinely pruned disk read of nProbe/C of the data (the " +
        "claim the expression-derived filter in q_ann_ivf cannot make)"),
    "q_pagerank_weighted" ->
      ("weighted PageRank (final round's plan): ranks join the " +
        "pre-partitioned weighted edge list on src + one dst-keyed " +
        "integer-contribution aggregation — 2 exchanges per round on " +
        "the rank table only, never the corpus"),
    "q_video_mjpeg_cuts" ->
      ("MJPEG scene cuts: narrow per-blob flatMap (sequential pairwise " +
        "SAD over independently-decoded frames, two-frame memory); the " +
        "one pre-synthesis Exchange spreads the bare id column (r16)"),
    "q_ann_ivfpq_indexed" ->
      ("persisted IVF+PQ probe: the same PartitionFilters pruning as " +
        "q_ann_ivf_indexed but over a CODE-sized layout — the scan " +
        "reads nProbe/C of residual-code rows, never a float vector; " +
        "the fused ADC score is one projection over the pruned read"),
    "q_clustering" ->
      ("clustering coefficient: ONE wedge equi-join bounded by " +
        "high-neighbor degree (the q_triangles plan) + a degree " +
        "aggregation — no new shuffle beyond the triangle count"),
    "q_ktruss" ->
      ("k-truss final round's plan: wedge join + per-edge support count " +
        "+ left join back, each round on the MATERIALIZED surviving " +
        "edges (lineage truncated, the k-core discipline)"),
    "q_coreset" ->
      ("k-center greedy (one round's plan): the selected centers are " +
        "plan literals folded with least() over ONE narrow scan of the " +
        "persisted pool, ending in TakeOrderedAndProject(1) — no join, " +
        "no shuffle, k rounds = k scans"),
    "q_assortativity" ->
      ("degree assortativity: one degree aggregation + two keyed joins " +
        "of edges to degrees + a single global-sum row — nothing " +
        "quadratic, two exchanges of the edge list"),
    "q_audio_spectral" ->
      ("windowed DFT bins: narrow per-blob flatMap (sample-order folds " +
        "against a driver-built trig table); the one pre-synthesis " +
        "Exchange spreads the bare id column (r16)"),
    "q_audio_segments" ->
      ("VAD islands: narrow decode flatMap emitting loud frames, then " +
        "window + aggregation BOTH keyed by doc_id — one exchange " +
        "closes the segments (plus the r16 id-spread before synthesis)"),
    "q_img_hist" ->
      ("image histograms: narrow per-blob raster recount (48 dense " +
        "rows per doc); the one pre-synthesis Exchange spreads the " +
        "bare id column (r16)"),
    "q_readability" ->
      ("Flesch scoring: three regexp_counts + the double formula in ONE " +
        "WholeStageCodegen scan — no shuffle, no UDF"))

  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = GraftSession.local(4)
    // explicit UTF-8: the JVM default charset mangles the notes' em-dashes
    val w = new PrintWriter(out, "UTF-8")
    try {
      w.println("# PLANS — physical plans of the headline shapes")
      w.println()
      w.println(s"Generated with `sbt \"runMain graft.Plans\"` (explain formatted, $sf;")
      w.println("same plans at any scale factor — AQE adjusts partition counts at")
      w.println("runtime). What to check is noted above each plan.")
      sections.foreach { case (name, note) =>
        val df = SparkEntry.queries(name)(spark, sf)
        df.count() // materializes caches so plan reuse is visible
        w.println()
        w.println(s"## $name")
        w.println()
        w.println(note)
        w.println()
        w.println("```")
        // elide giant binary literals (e.g. the baked-in Bloom filter
        // bytes) — the plan SHAPE is the document, not the constant
        val explained = df.queryExecution
          .explainString(ExplainMode.fromString("formatted"))
          .replaceAll("0x[0-9A-Fa-f]{129,}", "0x<...binary literal elided...>")
        w.print(explained)
        w.println("```")
      }
    } finally w.close()
    spark.stop()
  }
}
