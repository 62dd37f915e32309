package graft

import graft.JsonFunctions._
import graft.operators._
import org.apache.spark.sql.functions._

/**
 * Runnable tour of the engine — living documentation:
 * `sbt "runMain graft.Examples [sfDir]"`.
 */
object Examples {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    import spark.implicits._

    println("== 1. SQL surface (all 13 functions + aliases registered) ==")
    sources.Tables.readTable(spark, s"$sfDir/events.parquet")
      .createOrReplaceTempView("events")
    spark.sql(
      """SELECT event_type, count(*) AS n, sum(json_get_int(props, 'k')) AS sum_k
        |FROM events WHERE json_contains(props, 'k')
        |GROUP BY event_type ORDER BY event_type""".stripMargin).show()

    println("== 2. Column DSL with postgres-style operators ==")
    val df = Seq("""{"user": {"name": "ada", "logins": [1, 2, 3]}}""").toDF("j")
    df.select(
      col("j") ->> "user",
      col("j") ? "user",
      json_get_str(json_get(col("j"), lit("user")), lit("name")).as("name"),
      json_length(col("j"), lit("user"), lit("logins")).as("n_logins")).show(false)

    println("== 2b. Reference-style SQL via the conf-flag parser path ==")
    spark.conf.set(GraftSqlParser.ConfKey, "true")
    spark.sql(
      """select json_data->'user'->>'name' as name from
        | (select '{"user": {"name": "ada"}}' as json_data)""".stripMargin).show()
    // operators bind onto any expression — parens, calls, casts,
    // windowed aggregates — with column or call RHS
    spark.sql(
      """select (json_data->'user')->>'name' as via_parens,
        |  json_data -> concat('us', 'er') ->> 'name' as via_call_rhs,
        |  (json_data->'user'->>'logins')::int + 1 as via_cast
        | from (select '{"user": {"name": "ada", "logins": "41"}}' as json_data)
        |""".stripMargin).show()
    spark.conf.set(GraftSqlParser.ConfKey, "false")
    // the explicit translator works without the flag:
    spark.sql(JsonOperatorSql.rewrite(
      "select json_data->'user'->>'name' as name from " +
        """(select '{"user": {"name": "ada"}}' as json_data)""")).show()

    println("== 3. Cast elision (runs as an analyzer rewrite) ==")
    val cast = spark.sql("""SELECT CAST(json_get('{"pi": 3.14}', 'pi') AS DOUBLE) AS pi""")
    println(cast.queryExecution.analyzed)
    cast.show()

    println("== 4. Dedup: exact digests, LSH candidates, clusters ==")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    Dedup.exactDuplicates(docs, "text", "doc_id").show(3)
    val pairs = Dedup.verifiedNearDupPairs(docs, "doc_id", "text", threshold = 0.7)
    pairs.show(3)
    Dedup.duplicateClusters(docs.select(col("doc_id")), pairs)
      .where(col("cluster_id") =!= col("doc_id")).show(3)

    println("== 5. ANN over embeddings: brute force vs trained IVF ==")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") === 7).select(col("embedding"))
      .head().getSeq[Float](0).toArray
    Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5).show()
    val centroids = Similarity.trainCentroids(emb, "vec_id", "embedding", 16)
    Similarity.ivfTopK(emb, "vec_id", "embedding", q, 5,
      trainedCentroids = centroids).show()
    println("-- PQ-compressed ADC scan (16x compression, approximate dot) --")
    Similarity.pqTopK(emb, "vec_id", "embedding", q, 5).show()
    println("-- composed IVF+PQ: probe-pruned residual-code ADC scan --")
    Similarity.ivfPqTopK(emb, "vec_id", "embedding", q, 5).show()

    println("== 6. Text analysis + curation ==")
    Curation.annotate(docs, "doc_id", "text").drop("text").show(3)
    println(s"curated survivors: ${Curation.curate(docs, "doc_id", "text").count()}" +
      s" of ${docs.count()}")

    println("== 7. Sampling, scrubbing, corpus stats ==")
    Curation.stratifiedSample(docs.select(col("doc_id"), col("source")),
      "doc_id", "source", perStratum = 2).show(6)
    println("-- skew-safe salted variant (identical rows, bounded tasks) --")
    Curation.stratifiedSampleSalted(docs.select(col("doc_id"), col("source")),
      "doc_id", "source", perStratum = 2, salts = 4).show(3)
    println("-- temperature-scaled source mixing (alpha=0.5) --")
    Curation.mixSourcesTemperature(docs, "doc_id", "source")
      .groupBy("source").count().orderBy("source").show()
    println("-- char-n-gram language ID --")
    docs.select(col("doc_id"), TextOps.langIdNgram(col("text")).as("ng_lang")).show(3)
    println("-- fastText-style hashed linear quality classifier --")
    TextOps.qualityClassify(docs, "doc_id", "text").show(3)
    println("-- trained NB: distill the stopword-ratio rule into a model --")
    TextOps.nbClassify(
      docs.where(col("doc_id") % 2 =!= 0),
      docs.where(col("doc_id") % 2 === 0)
        .withColumn("y", TextOps.stopwordRatio(col("text")) >= 0.06),
      "doc_id", "text", "y").show(3)
    spark.sql("""SELECT 'mail me at a@b.io or +1-555 123 4567' AS t""")
      .select(TextOps.redactPii(col("t")).as("clean")).show(false)
    TextOps.corpusStats(docs, "text").show(false)

    println("== 8. Corpus hygiene: line dedup, repetition filters, decontamination, shards ==")
    val lined = spark.createDataFrame(Seq(
      (1L, "shared header\nunique body one\nshared footer"),
      (2L, "shared header\nunique body two\nshared footer"),
      (3L, "shared header\nrep line\nrep line\nshared footer"))).toDF("doc_id", "text")
    Dedup.dedupLines(lined, "doc_id", "text", minDocs = 2).show(false)
    TextOps.repetitionStats(lined, "doc_id", "text").show(false)
    Curation.decontaminate(
      docs.where(col("doc_id") % 20 =!= 0), docs.where(col("doc_id") % 20 === 0),
      "doc_id", "text", n = 4)
      .where(col("contaminated")).show(3)
    Curation.assignShards(docs.select(col("doc_id")), "doc_id", numShards = 4)
      .groupBy("shard").count().orderBy("shard").show()
    println("-- incremental ingestion dedup: new digests only --")
    Dedup.incrementalDedup(
      docs.select(col("doc_id"), col("text")),
      docs.where(col("doc_id") % 3 === 0), "doc_id", "text")
      .orderBy(col("doc_id")).show(3)

    println("== 9. Temporal joins: as-of (backward/forward/nearest/broadcast), range, interval ==")
    val ev = sources.Tables.readTable(spark, s"$sfDir/events.parquet")
      .select(col("event_id"), expr("ts div 1000").as("ts_us"),
        col("user_id"), col("event_type"), col("value"))
    val lefts = ev.where(col("event_type") =!= "click")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    println("-- backward as-of: latest click at or before each event --")
    Joins.asofJoin(lefts, clicks, "user_id", "ts_us", "click_id", Seq("click_value")).show(3)
    println("-- nearest as-of within 1s tolerance --")
    Joins.asofJoinDirected(lefts, clicks, "user_id", "ts_us", "click_id",
      Seq("click_value"), tolerance = 1000000L, direction = "nearest").show(3)
    println("-- broadcast as-of: the event side never shuffles --")
    Joins.asofJoinBroadcast(lefts, clicks, "user_id", "ts_us", "click_id",
      Seq("click_value")).show(3)
    println("-- binned range join: orders into overlapping price bands --")
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val bands = orders.groupBy(col("o_orderpriority").as("band"))
      .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    Joins.rangeJoin(orders.select(col("o_orderkey"), col("o_totalprice")),
      bands, "o_totalprice", "lo", "hi", binWidth = 10000.0).show(3)

    println("-- the one front door: auto-routes broadcast / salted / carry --")
    Joins.asof(lefts, clicks, "user_id", "ts_us", "click_id",
      Seq("click_value")).show(3)

    println("== 10. Bloom decontamination screen (no shuffle, no join) ==")
    Bloom.decontaminate(
        docs.where(col("doc_id") % 20 =!= 0), docs.where(col("doc_id") % 20 === 0),
        "doc_id", "text", n = 4)
      .where(col("maybe_contaminated")).show(3)

    println("== 11. Batch retrieval: kNN join (exact, batched, distributed-by-cell) ==")
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val queries = corpus.where(col("vec_id") < 3)
    println("-- exact: one corpus scan, broadcast query matrix --")
    Similarity.knnJoin(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 3).show(3)
    println("-- distributed-by-cell: neither side visits the driver --")
    Similarity.knnJoinByCell(corpus, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 3, nCells = 8, nProbe = 3).show(3)

    println("== 12. Multimodal: real decode (PNG pixels, WAV samples, GIF frames) ==")
    val ids = docs.select(col("doc_id")).limit(4)
    Multimodal.decodeFeatures(spark,
      Multimodal.syntheticImageBlobs(spark, ids)).toDF()
      .select("doc_id", "width", "height").show(4)
    Multimodal.decodeAudioFeatures(spark,
      Multimodal.syntheticAudioBlobs(spark, ids)).toDF()
      .select("doc_id", "sample_rate", "channels", "n_frames").show(4)
    println("-- G.711 mu-law/A-law expansion and 24-bit PCM --")
    Multimodal.decodeAudioFeatures(spark,
      Multimodal.syntheticLawBlobs(spark, ids)).toDF()
      .select("doc_id", "bits_per_sample", "n_frames").show(2)
    println("-- stereo IMA ADPCM: interleaved per-channel state walks --")
    Multimodal.decodeAudioFeatures(spark,
      Multimodal.syntheticImaStereoBlobs(spark, ids)).toDF()
      .select("doc_id", "channels", "bits_per_sample", "n_frames").show(2)
    Multimodal.decodeAudioFeatures(spark,
      Multimodal.synthetic24Blobs(spark, ids)).toDF()
      .select("doc_id", "bits_per_sample", "n_frames").show(2)
    Multimodal.sampleVideoFrames(spark,
      Multimodal.syntheticVideoBlobs(spark, ids)).toDF()
      .select("doc_id", "frame_idx", "sum_r").show(4)
    println("-- INTER-FRAME video: MS RLE8 deltas carry the previous framebuffer --")
    Multimodal.sampleAviFrames(spark,
      Multimodal.syntheticAviBlobs(spark, ids)).toDF()
      .select("doc_id", "frame_idx", "sum_r").show(4)

    println("== 13. Lexical retrieval + tokenizer training ==")
    TextOps.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join", "vector"), k = 5).show()
    val merges = TextOps.bpeTrain(docs, "text", numMerges = 6)
    println(s"-- learned merges: ${merges.map(m => s"${m.lhs}+${m.rhs}").mkString(", ")} --")
    TextOps.bpeSegment(docs, "doc_id", "text", merges).show(3)

    println("== 14. Graph: fixed-point PageRank over the event graph ==")
    Graph.pageRankEvents(
        sources.Tables.readTable(spark, s"$sfDir/events.parquet"), iterations = 3)
      .orderBy(col("rank").desc).show(5)

    println("== 15. Ingestion screens: exact + near-dup incremental dedup ==")
    val batch = docs.where(col("doc_id") % 7 === 3)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    Dedup.incrementalNearDup(batch, docs.select(col("doc_id"), col("text")),
      "doc_id", "text", bands = 8, threshold = 0.7).show(4)

    println("== 16. Web curation: URL hygiene, domain caps, HTML extraction ==")
    val pages = docs.select(col("doc_id"),
      Web.syntheticUrl(col("doc_id"), col("lang")).as("url"),
      Web.syntheticHtml(col("doc_id"), col("text")).as("html"))
    Web.normalizeUrls(pages.select("doc_id", "url"), "url")
      .select("doc_id", "url", "url_norm").show(3, truncate = false)
    Web.domainCap(pages, "doc_id", "url", maxPerDomain = 50L,
      blocklist = Seq("bad-ads.com")).where(!col("keep")).show(3)
    Web.htmlExtract(pages, "doc_id", "html")
      .select("doc_id", "title", "n_chars").show(3, truncate = false)
    Curation.decontaminateOverlap(
      docs.where(col("doc_id") % 20 =!= 0), docs.where(col("doc_id") % 20 === 0),
      "doc_id", "text", n = 4, maxOverlap = 0.25)
      .where(!col("keep")).show(3)

    println("== 17. Sketches + content-defined chunks ==")
    Curation.approxDistinct(docs, Seq("doc_id", "lang", "source"), p = 8).show()
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
    Curation.cmEstimate(Curation.cmSketch(toks, "tok", 4, 64), toks, "tok", 4, 64)
      .orderBy(col("est").desc, col("tok")).show(5)
    Dedup.cdcSharedChunks(docs, "doc_id", "text")
      .where(col("n_docs") >= 2).orderBy(col("n_docs").desc, col("digest")).show(5)

    println("== 17b. Versioning + noising: snapshot diff, storage dedup, winsorize, dropout ==")
    val v2 = docs.select(col("doc_id"),
      when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
        .otherwise(col("text")).as("text"))
      .where(col("doc_id") % 17 =!= 5)
    Curation.corpusDiff(docs.select("doc_id", "text"), v2, "doc_id", "text")
      .groupBy("status").count().orderBy("status").show()
    val shifted = docs.where(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(lit("PREFIX "), col("text")).as("text"))
    Dedup.cdcIncrementalDedup(shifted, docs.select("doc_id", "text"), "doc_id", "text")
      .agg(avg(col("dedup_ratio")).as("mean_dedup_ratio")).show()
    Curation.winsorize(
      sources.Tables.readTable(spark, s"$sfDir/events.parquet")
        .select(col("event_id"), col("value")), "value")
      .where(col("value") =!= col("value_w")).show(3)
    TextOps.augmentDropout(docs, "doc_id", "text").show(2)
    Curation.bootstrapMeanCI(
      sources.Tables.readTable(spark, s"$sfDir/events.parquet")
        .select(col("event_id"), round(col("value") * 100).cast("long").as("cents")),
      "event_id", "cents").show()
    Web.pageSignals(docs.select(col("doc_id"),
      Web.syntheticPage(col("doc_id"), col("text")).as("html")), "doc_id", "html")
      .where(col("noindex")).show(3)

    println("== 18. Table hygiene: upsert compaction, k-anonymity, hard negatives ==")
    val evLog = sources.Tables.readTable(spark, s"$sfDir/events.parquet")
      .select(col("user_id"), col("event_type"),
        expr("ts div 1000").as("ts_us"), col("event_id"), col("value"))
    Curation.upsertLatest(evLog, Seq("user_id", "event_type"),
      Seq("ts_us", "event_id"), Seq("value")).show(3)
    Curation.kAnonymize(evLog.select("event_id", "user_id", "event_type"),
      Seq("user_id", "event_type"), k = 15).where(!col("k_ok")).show(3)
    val embT = sources.Tables.readTable(spark, s"$sfDir/embeddings.parquet")
    Similarity.hardNegatives(embT, "vec_id", "embedding", "label",
      embT.where(col("vec_id") < 2), "vec_id", "embedding", "label", k = 3).show()

    println("== 19. Indexed retrieval: positional inverted index, phrase search ==")
    val idxDir = java.nio.file.Files.createTempDirectory("graft-ex-invidx")
    try {
      TextOps.buildInvertedIndex(docs, "doc_id", "text", idxDir.toString, 16)
      TextOps.bm25TopKIndexed(spark, idxDir.toString,
        Seq("spark", "join", "vector", "stream"), k = 5).show()
      TextOps.phraseSearch(spark, idxDir.toString, Seq("table", "hash")).show(3)
    } finally {
      val walk = java.nio.file.Files.walk(idxDir)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally walk.close()
    }

    println("== 20. KMV sketches, sample quantiles, PMI, link-graph authority ==")
    val srcToks = docs.select(col("source"), explode(split(col("text"), " ")).as("tok"))
    Curation.kmvDistinct(Curation.kmvSketchAgg(srcToks, "source", "tok", 64), 64)
      .orderBy("grp").show(3)
    Curation.kmvJaccard(srcToks, "source", "tok", 64)
      .orderBy(col("jaccard_est").desc).show(3)
    Curation.sampleQuantiles(
      sources.Tables.readTable(spark, s"$sfDir/events.parquet")
        .select(col("event_type"), col("event_id"), col("value")),
      "event_type", "event_id", "value", k = 128, percents = Seq(50, 99)).show(4)
    TextOps.cooccurrencePmi(docs, "text", window = 3, minCount = 5L)
      .orderBy(col("pmi").desc).show(5)
    val linkPages = docs.select(col("doc_id"),
      Web.syntheticUrl(col("doc_id"), col("lang")).as("url"),
      Web.syntheticLinkPage(col("doc_id"), col("lang")).as("html"))
    Graph.pageRankFixed(Web.domainEdges(linkPages, "doc_id", "url", "html"),
      "src_domain", "dst_domain", 5).orderBy(col("rank").desc).show(5)

    println("== 21. Event analytics: funnel, retention triangle, ROLLUP ==")
    val evA = sources.Tables.readTable(spark, s"$sfDir/events.parquet")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"),
        col("event_id"), col("event_type"))
    Joins.funnel(evA, "user_id", "ts_us", "event_id", "event_type",
        Seq("view", "click", "purchase"))
      .groupBy("steps_reached").count().orderBy("steps_reached").show()
    Joins.retention(evA, "user_id", "ts_us", bucket = 86400000000L, maxOffset = 5L)
      .orderBy("cohort", "offset").show(6)
    sources.Tables.readTable(spark, s"$sfDir/events.parquet")
      .select(col("event_type"), expr("(ts div 1000) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      .rollup(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)
      .show(5)

    println("== 22. DSIR: target-driven selection, fused scoring, sampling ==")
    val dsirCorpus = docs.where(col("doc_id") % 20 =!= 0)
    val dsirTarget = docs.where(col("doc_id") % 20 === 0)
    Curation.dsirWeights(dsirCorpus, dsirTarget, "doc_id", "text")
      .orderBy(col("log_w").desc).show(3)
    // production shape: train once, score at scan speed (zero Exchange)
    val dsirModel = Curation.dsirTrain(dsirCorpus, dsirTarget, "doc_id", "text")
    Curation.dsirScoreFused(dsirCorpus, "doc_id", "text", dsirModel)
      .orderBy(col("log_w").desc).show(3)
    Curation.dsirSelect(dsirCorpus, dsirTarget, "doc_id", "text", k = 3)
      .select(col("doc_id"), col("log_w")).show()
    Curation.dsirSample(dsirCorpus, dsirTarget, "doc_id", "text", k = 3,
      salt = 42L).select(col("doc_id"), col("gumbel_key")).show()

    println("== 23. Text hygiene: normalization, mojibake repair, entropy, keywords ==")
    docs.select(col("doc_id"),
        TextOps.unicodeNormalize(col("text"), "NFKC").as("nfkc"),
        TextOps.fixMojibake(col("text")).as("fixed"))
      .show(2, truncate = 40)
    TextOps.tokenEntropy(docs, "doc_id", "text")
      .orderBy(col("entropy")).show(3) // lowest-entropy docs = most templated
    TextOps.rakeKeywords(docs, "doc_id", "text", topK = 5).show(truncate = false)

    println("== 24. Edit-distance dedup + HITS authority ==")
    Dedup.editDistancePairs(
        docs.select(col("doc_id"), substring(col("text"), 1, 200).as("t")),
        "doc_id", "t", maxDist = 8)
      .orderBy("id_a", "id_b").show(5)
    Graph.hitsFixed(
        sources.Tables.readTable(spark, s"$sfDir/events.parquet")
          .select(concat(lit("u"), col("user_id")).as("src"),
            concat(lit("e"), col("event_type")).as("dst")),
        "src", "dst", iterations = 3)
      .orderBy(col("auth").desc).show(5)

    println("== 25. WARC ingestion + versioned snapshots + FLAC ==")
    val warcDir = java.nio.file.Files.createTempDirectory("graft-ex-warc")
    sources.Warc.writeSegments(
      docs.limit(50).select(sources.Warc.buildWarcResponse(
          concat(lit("https://example.org/"), col("doc_id")),
          lit("2026-01-01T00:00:00Z"), col("text")).as("rec"))
        .coalesce(1), "rec", warcDir.toString)
    spark.read.format("warc").load(warcDir.toString)
      .select("target_uri", "http_status", "content_type").show(3, truncate = 40)
    val snapDir = java.nio.file.Files.createTempDirectory("graft-ex-snap")
    sources.Snapshots.append(docs.limit(10).select("doc_id"), snapDir.toString)
    sources.Snapshots.overwrite(docs.limit(3).select("doc_id"), snapDir.toString)
    println(s"v1 rows: ${sources.Snapshots.read(spark, snapDir.toString, 1).count()}, " +
      s"v2 rows: ${sources.Snapshots.read(spark, snapDir.toString).count()}")
    val flacBytes = Flac.encode(
      Array(Array.tabulate(1000)(i => ((i * 7919) % 4096) - 2048)), 16000)
    val flacBack = Flac.decode(flacBytes).get
    println(s"FLAC: 2000 PCM bytes -> ${flacBytes.length} encoded, " +
      s"decoded ${flacBack.totalSamples} samples, lossless = ${
        java.util.Arrays.equals(flacBack.samples(0),
          Array.tabulate(1000)(i => ((i * 7919) % 4096) - 2048))}")

    println("== 26. Round 13: token edit join, unigram tokens, card scrub, stereo FLAC ==")
    // token-level edit distance: a swapped word costs 1, not its length
    Dedup.tokenEditDistancePairs(
        docs.select(col("doc_id"),
          slice(split(col("text"), " "), 1, 24).as("toks")),
        "doc_id", "toks", maxDist = 4)
      .orderBy("id_a", "id_b").show(5)
    // unigram-LM Viterbi segmentation (quantized-log costs, float-free)
    TextOps.unigramSegment(docs, "doc_id", "text")
      .select("doc_id", "n_words", "n_pieces", "cost_fp", "seg")
      .show(3, truncate = 60)
    // Luhn-gated card scrubbing: the valid PAN is masked, the
    // checksum-failing lookalike survives
    TextOps.redactCards(
        Seq((1L, "pay 4111 1111 1111 1111 or 4111-1111-1111-1112"))
          .toDF("doc_id", "text"), "doc_id", "text")
      .show(truncate = false)
    // stereo decorrelation: correlated channels shrink the stream
    val l = Array.tabulate(2000)(i => ((i * 7919) % 4096) - 2048)
    val r = Array.tabulate(2000)(i => l(i) + ((i * 31) % 7) - 3)
    val dec = Flac.encode(Array(l, r), 16000)
    val ind = Flac.encode(Array(l, r), 16000, stereoDecorrelation = false)
    println(s"stereo FLAC: decorrelated ${dec.length} B vs independent ${ind.length} B " +
      s"(${100 - dec.length * 100 / ind.length}% smaller), lossless = ${
        java.util.Arrays.equals(Flac.decode(dec).get.samples(1), r)}")
    // multi-record WARC captures: warcinfo/request/response/metadata
    val metaBlob = docs.limit(2).select(concat(
      sources.Warc.buildWarcRecord(lit("warcinfo"), lit(null).cast("string"),
        lit("2026-01-01T00:00:00Z"), lit("application/warc-fields"), lit("software: graft")),
      sources.Warc.buildWarcResponse(concat(lit("https://example.org/"), col("doc_id")),
        lit("2026-01-01T00:00:00Z"), col("text"))).as("b"))
    metaBlob.select(explode(sources.Warc.warcRecords(col("b"))).as("r"))
      .select("r.warc_type", "r.target_uri", "r.content_type").show(4, truncate = 40)

    println("== 27. Round 14: weighted sampling, OPH minhash, BQ ANN, deletes, segments ==")
    // weighted sampling without replacement: longer docs win more often,
    // and the draw replays bit-for-bit anywhere (integer race keys)
    val weighted = docs.select(col("doc_id"),
      greatest(coalesce(col("n_chars"), lit(1L)), lit(1L)).as("w"))
    Curation.weightedSample(weighted, "doc_id", "w", k = 5)
      .orderBy("key_fp").show(5)
    // ...and per source with a budget (the mix-construction primitive)
    Curation.weightedSampleStratified(
        docs.select(col("doc_id"), col("source"),
          greatest(coalesce(col("n_chars"), lit(1L)), lit(1L)).as("w")),
        "doc_id", "w", "source", perStratum = 2)
      .groupBy("source").count().orderBy("source").show(3)
    // one-permutation minhash: same LSH banding, 1 hash per shingle
    Dedup.ophCandidatePairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .orderBy("id_a", "id_b").show(3)
    // binary quantization: 64 dims -> one long; Hamming shortlist +
    // exact rerank
    val q26 = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    Similarity.bqTopK(emb, "vec_id", "embedding", q26, 5).show(5)
    // merge-on-read DELETE: kilobytes written, old versions intact
    val delRoot = java.nio.file.Files.createTempDirectory("graft-ex-del")
    sources.Snapshots.append(docs.select("doc_id", "n_chars"), delRoot.toString)
    sources.Snapshots.deleteWhere(spark, delRoot.toString, Seq("doc_id"),
      col("doc_id") % 2 === 0)
    println(s"after DELETE evens: v2 rows = ${
      sources.Snapshots.read(spark, delRoot.toString).count()} " +
      s"(v1 still ${sources.Snapshots.read(spark, delRoot.toString, 1L).count()})")
    // ISO 28500 segmented records: oversized payloads chunked into
    // continuation chains and provably reassembled
    val segs26 = sources.Warc.segmentRecords(docs.limit(3), col("doc_id"),
      lit("resource"), concat(lit("https://example.org/"), col("doc_id")),
      lit("2026-01-01T00:00:00Z"), lit("text/plain"), col("text"), 48)
    sources.Warc.reassembleSegmented(
        segs26.select(explode(sources.Warc.warcRecords(col("rec"))).as("r"))
          .select("r.*"))
      .select("target_uri", "n_segments", "complete").show(3, truncate = 40)

    println("== 28. Round 14 (cont.): image/video/audio ops, tokenizer trio, calibration ==")
    // perceptual hashes + cross-corpus near-dup join (16 bytes/image)
    val ids28 = docs.select(col("doc_id"))
    val baseH = Multimodal.perceptualHashes(spark,
      Multimodal.syntheticImageBlobs(spark, ids28)).toDF()
    val varH = Multimodal.perceptualHashes(spark,
      Multimodal.syntheticVariantBlobs(spark, ids28)).toDF()
    Dedup.hammingNearDupPairsCross(
        baseH.select(col("doc_id"), col("dhash")),
        varH.select(col("doc_id"), col("dhash")), "doc_id", "dhash", 8)
      .orderBy("id_a", "id_b").show(3)
    // winnowing fingerprints -> MOSS overlap pairs
    TextOps.winnowOverlapPairs(docs, "doc_id", "text",
      k = 16, w = 24, minShared = 3, maxDf = 20).orderBy("id_a", "id_b").show(3)
    // video shot boundaries on the decoded AVI streams
    Multimodal.videoSceneCuts(spark,
        Multimodal.syntheticAviBlobs(spark, ids28.limit(5)), 32000L)
      .toDF().orderBy("doc_id", "frame_idx").show(4)
    // exact-rational 3/4 resample of real PCM16 WAVs
    Multimodal.audioResample(spark,
        Multimodal.syntheticAudioBlobs(spark, ids28.limit(4)))
      .toDF().orderBy("doc_id", "channel").show(4)
    // WordPiece MaxMatch (the BERT tokenizer) with [UNK] semantics
    TextOps.wordPieceSegment(docs, "doc_id", "text", topChars = 34)
      .select("doc_id", "n_pieces", "n_unk", "seg").orderBy("doc_id").show(2, truncate = 60)
    // Kneser-Ney bigrams as exact reduced fractions
    TextOps.kneserNeyBigrams(docs.where(col("doc_id") % 7 === 0), "doc_id", "text")
      .orderBy(col("c2").desc, col("w1"), col("w2")).show(3)
    // isotonic calibration of a quality score (gcd-reduced pool means)
    Curation.isotonicCalibrate(
        docs.select(least(floor(col("n_chars") / 20), lit(100)).as("score"),
          (col("doc_id") % 3 === 0).cast("int").as("label")),
        "score", "label").orderBy("score").show(4)
    // k-core of a sparse synthetic graph (the planted clique survives)
    val n28 = ids28.count()
    Graph.kCoreMembers(
        ids28.select(col("doc_id").as("x"), ((col("doc_id") + 1) % n28).as("y"))
          .unionAll(ids28.where(col("doc_id") % 97 === 0).as("l")
            .join(ids28.where(col("doc_id") % 97 === 0).as("r"),
              col("l.doc_id") < col("r.doc_id"))
            .select(col("l.doc_id").as("x"), col("r.doc_id").as("y"))),
        "x", "y", k = 3)
      .orderBy("node").show(4)
    // personalized PageRank: seed-anchored authority
    Graph.personalizedPageRankFixed(
        ids28.select(col("doc_id").as("src"), ((col("doc_id") * 3 + 1) % n28).as("dst")),
        "src", "dst", seeds = Seq("0", "1"), iterations = 3)
      .orderBy(col("rank").desc).show(4)
    // snapshot history: the table's own audit log
    val histRoot = java.nio.file.Files.createTempDirectory("graft-ex-hist")
    sources.Snapshots.append(docs.select("doc_id", "n_chars"), histRoot.toString)
    sources.Snapshots.overwrite(
      docs.where(col("doc_id") % 2 === 0).select("doc_id", "n_chars"), histRoot.toString)
    sources.Snapshots.history(spark, histRoot.toString).show()

    spark.stop()
  }
}
