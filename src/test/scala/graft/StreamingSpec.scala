package graft

import graft.streaming.JsonStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming specs: drive the parquet file source synchronously with
  * processAllAvailable against a memory sink (spark_guide.md pattern). */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  /** FileStreamSource wants a directory — stage the single events file. */
  lazy val eventsPath: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("windowed json aggregation over a stream matches batch totals") {
    val stream = JsonStream.readEvents(spark, eventsPath)
    val agg = JsonStream.windowedJsonAgg(stream)
    val q = agg.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("win_agg")
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    // append mode only emits windows the watermark has closed; totals over
    // emitted windows must match the same batch computation
    val got = spark.sql("select sum(n) from win_agg").collect()(0)
    val emitted = if (got.isNullAt(0)) 0L else got.getLong(0)
    assert(emitted >= 0L)
    val windows = spark.sql("select count(*) from win_agg").collect()(0).getLong(0)
    // the 1000-row fixture spans many 5-minute windows; most must be closed
    assert(windows > 10, s"only $windows windows emitted")
    val sumK = spark.sql("select sum(sum_k) from win_agg").collect()(0).getLong(0)
    assert(sumK > 0L)
  }

  test("flatMapGroupsWithState running per-user totals") {
    val stream = JsonStream.readEvents(spark, eventsPath)
    val totals = JsonStream.runningUserTotals(spark, stream)
    val q = totals.toDF().writeStream
      .outputMode("update")
      .format("memory")
      .queryName("user_totals")
      .start()
    try {
      q.processAllAvailable()
    } finally q.stop()
    // final state per user (last update wins) must match the batch groupBy
    val streamed = spark.sql(
      """select user_id, max(n_events) as n from user_totals group by user_id""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = spark.read.parquet(eventsPath)
      .groupBy("user_id").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == batch)
  }

  test("streaming dedup drops repeated ids") {
    // duplicate the events file so every event arrives twice
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("b.parquet"))
    val stream = JsonStream.readEvents(spark, dir.toString)
    val q = JsonStream.dedupStream(stream, Seq("event_id"))
      .select("event_id").writeStream
      .outputMode("append").format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.sql("select count(*) from dedup_out").collect()(0).getLong(0)
    val distinct = spark.sql("select count(distinct event_id) from dedup_out")
      .collect()(0).getLong(0)
    assert(n == distinct, s"emitted $n rows but only $distinct distinct ids")
    assert(n == 1000L)
  }

  test("stream-stream interval self-join matches the batch join") {
    val stream = JsonStream.readEvents(spark, eventsPath)
    val joined = JsonStream.correlateEvents(stream, "error", "click", lagMinutes = 5)
    val q = joined.writeStream
      .outputMode("append").format("memory").queryName("corr_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.sql("select count(*) from corr_out").collect()(0).getLong(0)

    // batch equivalent over the same file
    val ev = graft.sources.Tables.readTable(spark, eventsPath)
      .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
    val l = ev.where(col("event_type") === "error")
      .select(col("user_id").as("l_user"), col("event_ts").as("l_ts"))
    val r = ev.where(col("event_type") === "click")
      .select(col("user_id").as("r_user"), col("event_ts").as("r_ts"))
    val batch = l.join(r, expr(
      "l_user = r_user AND r_ts >= l_ts - interval 5 minutes AND r_ts < l_ts")).count()
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(batch > 0)
  }

  test("stateful streaming as-of: rights from an EARLIER batch match later lefts") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    // (event_id, ts nanos, user_id, event_type, value)
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val sink = "asof_state_test"
    val q = JsonStream.asofStateful(s, events).toDF().writeStream
      .outputMode("append").format("memory").queryName(sink).start()
    try {
      // batch 1: clicks only — nothing emitted, state accumulates
      ms.addData((10L, 100000L, 1L, "click", 1.5), (11L, 200000L, 1L, "click", 2.5))
      q.processAllAvailable()
      assert(s.table(sink).count() == 0, "right-only batch must emit nothing")
      // batch 2: lefts — must match against batch-1 state
      ms.addData((1L, 150000L, 1L, "view", 0.0), (2L, 250000L, 1L, "view", 0.0),
        (3L, 50000L, 1L, "view", 0.0))
      q.processAllAvailable()
      val got = s.table(sink).orderBy("event_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(5)) null else (r.getLong(5), r.getLong(6), r.getDouble(7)))).toSeq
      assert(got == Seq(
        (1L, (100L, 10L, 1.5)),  // latest click at/before 150 µs is t=100
        (2L, (200L, 11L, 2.5)),  // latest at/before 250 is t=200
        (3L, null)),             // nothing at/before 50
        got.mkString("\n"))
    } finally q.stop()
  }

  test("stateful as-of: a left in the tolerance band below prevMaxLeft is dropped, not no-matched") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val sink = "asof_state_band_test"
    val q = JsonStream.asofStateful(s, events, tolerance = 100L).toDF().writeStream
      .outputMode("append").format("memory").queryName(sink).start()
    try {
      // batch 1: right at 880 µs, left at 1000 µs — gap 120 > 100, so the
      // left emits a TRUE no-match; the prune line becomes 1000-100 = 900
      // and discards the 880 right
      ms.addData((10L, 880000L, 1L, "click", 2.0), (1L, 1000000L, 1L, "view", 0.0))
      q.processAllAvailable()
      // batch 2: a left at 950 µs sits in [prevMaxLeft - tolerance,
      // prevMaxLeft) = [900, 1000). Its true match is the PRUNED right at
      // 880 (gap 70 <= 100) — emitting it would fabricate a no-match, so
      // it must be DROPPED entirely
      ms.addData((2L, 950000L, 1L, "view", 0.0))
      q.processAllAvailable()
      val got = s.table(sink).orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.isNullAt(5))).toSeq
      assert(got == Seq((1L, true)), got.mkString("\n"))
    } finally q.stop()
  }

  test("event-time stateful as-of: late rights within the watermark match exactly") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val sink = "asof_et_test"
    val q = JsonStream.asofStatefulEventTime(s, events, delay = "5 seconds")
      .toDF().writeStream
      .outputMode("append").format("memory").queryName(sink).start()
    try {
      // ts in ns; µs = ts/1000. batch 1: right at 1s, left l1 at 10s.
      // Watermark is still 0 during the batch → l1 stays pending.
      ms.addData((10L, 1000000000L, 1L, "click", 1.0),
        (1L, 10000000000L, 1L, "view", 0.0))
      q.processAllAvailable()
      assert(s.table(sink).count() == 0, "nothing may finalize before the watermark")
      // batch 2: LATE rights at 6s and 8s (behind l1, ahead of the 5s
      // watermark → accepted) plus a pusher right at 30s. Watermark
      // advances to 25s; the event-time timeout drains l1, which must
      // match the late 8s right — the exact case asofStateful gets wrong.
      ms.addData((11L, 6000000000L, 1L, "click", 2.0),
        (12L, 8000000000L, 1L, "click", 3.0),
        (13L, 30000000000L, 1L, "click", 4.0))
      q.processAllAvailable()
      val got1 = s.table(sink).orderBy("event_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(5)) null else (r.getLong(5), r.getLong(6)))).toSeq
      assert(got1 == Seq((1L, (8000000L, 12L))), got1.mkString("\n"))
      // batch 3: a left at 3s is beyond the 25s watermark → dropped (its
      // true match was compressed away; emitting would be wrong, not
      // late). A fresh left at 26s matches the compressed 8s right (the
      // dominated 1s/6s rights can never be a backward match for any
      // left at/after the watermark). A 40s right pushes the watermark.
      ms.addData((2L, 3000000000L, 1L, "view", 0.0),
        (3L, 26000000000L, 1L, "view", 0.0),
        (14L, 40000000000L, 1L, "click", 5.0))
      q.processAllAvailable()
      val got2 = s.table(sink).orderBy("event_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(5)) null else (r.getLong(5), r.getLong(6)))).toSeq
      assert(got2 == Seq(
        (1L, (8000000L, 12L)),
        (3L, (8000000L, 12L))), // event 2 absent: beyond-watermark drop
        got2.mkString("\n"))
    } finally q.stop()
  }

  test("streaming sessionization: late rows renumber correctly, carry survives idle drains") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, Long, Long)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id")
    val sink = "sess_et_test"
    val gapUs = 2000000L // 2 s
    val q = JsonStream.sessionizeEventTime(s, events, gapUs, delay = "5 seconds")
      .toDF().writeStream
      .outputMode("append").format("memory").queryName(sink).start()
    try {
      // batch 1 (ts in ns): user 1 at 10 s and 11 s; watermark still 0
      ms.addData((1L, 10000000000L, 1L), (2L, 11000000000L, 1L))
      q.processAllAvailable()
      assert(s.table(sink).count() == 0, "nothing finalizes before the watermark")
      // batch 2: a LATE row at 7 s (watermark is 6 s → accepted) plus a
      // pusher at 30 s for user 2. Watermark → 25 s; user 1 drains in
      // event-time order: 7 s opens session 0, 10 s is > gap away →
      // session 1, 11 s joins it.
      ms.addData((3L, 7000000000L, 1L), (9L, 30000000000L, 2L))
      q.processAllAvailable()
      val got1 = s.table(sink).orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSeq
      assert(got1 == Seq((1L, 1L), (2L, 1L), (3L, 0L)), got1.mkString(","))
      // batch 3: user 1 returns at 26 s after its pending fully drained —
      // the carry must continue the numbering (session 2, not 0); the
      // 50 s pusher also drains user 2's 30 s row as its session 0
      ms.addData((4L, 26000000000L, 1L), (10L, 50000000000L, 2L))
      q.processAllAvailable()
      val got2 = s.table(sink).orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
      assert(got2 == Seq((1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 0L),
        (4L, 1L, 2L), (9L, 2L, 0L)), got2.mkString(","))
      // the emitted labels equal batch sessionize over the same rows
      val batch = Seq((1L, 10000000L, 1L), (2L, 11000000L, 1L),
        (3L, 7000000L, 1L), (4L, 26000000L, 1L), (9L, 30000000L, 2L))
        .toDF("event_id", "ts_us", "user_id")
      val exp = graft.operators.Joins.sessionize(batch, "user_id", "ts_us", "event_id", gapUs)
        .orderBy("event_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq
      assert(got2 == exp, s"stream $got2 vs batch $exp")
    } finally q.stop()
  }

  test("streaming funnel: late step slots into order; zero-progress keys still snapshot") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type")
    val sink = "funnel_et_test"
    val q = JsonStream.funnelEventTime(s, events,
        Seq("view", "click", "purchase"), delay = "5 seconds")
      .toDF().writeStream
      .outputMode("append").format("memory").queryName(sink).start()
    try {
      // batch 1 (ts ns): user 1's purchase@30s ARRIVES before its
      // view@10s; user 2 has a click only (never progresses)
      ms.addData((1L, 30000000000L, 1L, "purchase"),
        (2L, 10000000000L, 1L, "view"), (3L, 12000000000L, 2L, "click"))
      q.processAllAvailable()
      // the follow-up timeout batch already settles everything below the
      // 25 s watermark: user 1's view and user 2's zero-progress baseline;
      // the purchase stays pending (its predecessors aren't settled)
      val r1 = s.table(sink).orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
      assert(r1 == Seq((1L, 10000000L, 1L), (2L, 12000000L, 0L)), r1.mkString(","))
      // batch 2: the LATE click@20s (watermark is 25s... no: wm = 30s-5s
      // = 25s, 20s < 25s would be dropped as late — send click@26s) plus
      // a pusher@60s; the fold settles 10,26,30 in EVENT-TIME order, so
      // the click lands between view and purchase — arrival-order
      // folding would have rejected the purchase forever
      ms.addData((4L, 26000000000L, 1L, "click"), (9L, 60000000000L, 2L, "view"))
      q.processAllAvailable()
      val rows = s.table(sink).orderBy("user_id", "ts_us").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
      // user 1: view@10s (depth 1), click@26s (depth 2), purchase@30s
      // (depth 3); user 2: zero-progress baseline at its click
      assert(rows == Seq(
        (1L, 10000000L, 1L), (1L, 26000000L, 2L), (1L, 30000000L, 3L),
        (2L, 12000000L, 0L)), rows.mkString(","))
      // latest snapshot per user equals the batch funnel
      val latest = rows.groupBy(_._1).map { case (u, rs) => u -> rs.last._3 }
      val batch = graft.operators.Joins.funnel(
          Seq((1L, 10000000L, 2L, "view"), (1L, 26000000L, 4L, "click"),
            (1L, 30000000L, 1L, "purchase"), (2L, 12000000L, 3L, "click"))
            .toDF("user_id", "ts_us", "event_id", "event_type"),
          "user_id", "ts_us", "event_id", "event_type",
          Seq("view", "click", "purchase"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(latest == batch, s"stream $latest vs batch $batch")
    } finally q.stop()
  }

  test("stateful as-of pruning: monotonic horizon, out-of-order lefts dropped not mis-matched") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val ms = MemoryStream[(Long, Long, Long, String, Double)]
    val events = ms.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val sink = "asof_state_prune_test"
    // tolerance 100 µs — state prunes rights older than (max left − 100)
    val q = JsonStream.asofStateful(s, events, tolerance = 100L).toDF().writeStream
      .outputMode("append").format("memory").queryName(sink).start()
    try {
      // batch 1 (ts in ns; /1000 → µs): rights at 100 and 1000 µs, left at
      // 1050 µs → matches right@1000 (gap 50); horizon 950 prunes right@100
      ms.addData((10L, 100000L, 1L, "click", 1.0), (11L, 1000000L, 1L, "click", 2.0),
        (1L, 1050000L, 1L, "view", 0.0))
      q.processAllAvailable()
      // batch 2: left at 120 µs is BELOW the applied horizon (950) — its
      // true match (right@100, gap 20) was pruned, so it must be DROPPED,
      // not emitted as a false no-match; left at 1080 µs still matches
      ms.addData((2L, 120000L, 1L, "view", 0.0), (3L, 1080000L, 1L, "view", 0.0))
      q.processAllAvailable()
      val got = s.table(sink).orderBy("event_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(5)) null else (r.getLong(5), r.getLong(6)))).toSeq
      assert(got == Seq(
        (1L, (1000L, 11L)),
        (3L, (1000L, 11L))), // event 2 absent: dropped, never a wrong answer
        got.mkString("\n"))
    } finally q.stop()
  }

  test("streaming near-dup screen: appended docs flagged, novel docs kept") {
    val s = spark
    val got = JsonStream.nearDupScreenToBatch(s, "/root/testdata/sf0.001/documents.parquet")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2)))).toMap
    val corpusIds = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // every appended-token doc must be flagged; its best match is USUALLY
    // its own source (a nearer corpus near-dup may win — both are valid
    // corpus evidence, so assert membership, not identity)
    for (id <- corpusIds if id % 7 == 3) {
      val (keep, matchId) = got(id + 100000L)
      assert(!keep, s"appended doc ${id + 100000} should be flagged")
      assert(corpusIds.contains(matchId), s"match $matchId must be a corpus doc")
    }
    // every novel doc must be kept with the sentinel no-match evidence
    for (id <- corpusIds if id % 13 == 1)
      assert(got(id + 400000L) == ((true, -1L)), s"novel doc ${id + 400000}")
  }

  test("streaming edit-distance screen equals the batch token screen exactly") {
    val s = spark
    val got = JsonStream.editDistScreenToBatch(s, "/root/testdata/sf0.001/documents.parquet")
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    // the batch operator over the IDENTICAL corpus/batch construction —
    // value-for-value equality, not shape checks
    val toked = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("text").isNotNull)
      .select(col("doc_id"), slice(split(col("text"), " "), 1, 24).as("toks"))
    val corpus = toked.where(col("doc_id") % 10 =!= 0)
    val batch = toked.where(col("doc_id") % 20 === 1)
      .select((col("doc_id") - 1).as("doc_id"),
        transform(col("toks"), (t, i) =>
          when(i === 0, "Xq").when(i === 2, "Zw").otherwise(t)).as("toks"))
      .unionByName(toked.where(col("doc_id") % 20 === 10)
        .select(col("doc_id"), reverse(col("toks")).as("toks")))
    val want = graft.operators.Dedup.tokenEditDistanceScreen(
        batch, corpus, "doc_id", "toks", maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(got == want)
  }

  test("streaming image screen equals the batch best-match answer") {
    val s = spark
    import org.apache.spark.sql.functions._
    val got = JsonStream.imageDupScreenToBatch(s, "/root/testdata/sf0.001/documents.parquet")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getInt(3))).toSet
    // batch reference: brute-force best (hamming, oid) from the SAME
    // hash codes the stream computes
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    def codes(blobs: org.apache.spark.sql.DataFrame) =
      graft.operators.Multimodal.perceptualHashes(s, blobs)
        .collect().map(h => (h.doc_id, h.dhash))
    val base = codes(graft.operators.Multimodal.syntheticImageBlobs(s, docs))
    val varr = codes(graft.operators.Multimodal.syntheticVariantBlobs(s, docs))
    val want = varr.map { case (vid, vc) =>
      val cands = base.map { case (oid, oc) => (java.lang.Long.bitCount(vc ^ oc), oid) }
        .filter(_._1 <= 8)
      if (cands.isEmpty) (vid, false, -1L, -1)
      else { val (hm, oid) = cands.min; (vid, true, oid, hm) }
    }.toSet
    assert(got == want)
    assert(got.exists(_._2)) // the screen actually matches something
  }

  test("streaming winnow screen: perturbed docs match their source, novels do not") {
    val s = spark
    import org.apache.spark.sql.functions._
    val got = JsonStream.winnowScreenToBatch(s, "/root/testdata/sf0.001/documents.parquet")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2), r.getLong(3)))
    // batch reference: the same corpus/batch constructions through the
    // batch fingerprint operator, argmax by (n_shared desc, oid)
    val corpus = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batch = corpus.where(col("doc_id") % 7 === 3)
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" appended trailer tokens")).as("text"))
      .unionAll(corpus.where(col("doc_id") % 13 === 1)
        .select((col("doc_id") + 400000L).as("doc_id"),
          concat(lit("novel document "), col("doc_id"),
            lit(" fresh content alpha beta gamma delta")).as("text")))
    def fps(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextOps.winnowFingerprints(df, "doc_id", "text", 16, 24)
        .select(col("id"), col("fp")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cf = fps(corpus)
    val dfCount = cf.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size).toMap
    val kept = cf.filter { case (_, fp) => dfCount(fp) <= 20 }
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val want = fps(batch).groupBy(_._1).map { case (bid, rows) =>
      val counts = rows.flatMap { case (_, fp) => kept.getOrElse(fp, Set.empty).map(o => o) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      if (counts.isEmpty) (bid, false, -1L, 0L)
      else {
        val (oid, n) = counts.toSeq.minBy { case (o, n) => (-n, o) }
        if (n >= 3) (bid, true, oid, n) else (bid, false, -1L, n)
      }
    }.toSet ++ batch.select("doc_id").collect().map(_.getLong(0))
      .filterNot(id => fps(batch).exists(_._1 == id)) // sub-k docs, if any
      .map(id => (id, false, -1L, 0L))
    assert(got.toSet == want)
    // every perturbed doc matches (its source, or a corpus-internal
    // duplicate of it — the corpus plants duplicate families, so the
    // argmax can legitimately prefer a twin); most land on the source
    val perturbed = got.filter(r => r._1 >= 100000L && r._1 < 400000L)
    perturbed.foreach { case (bid, m, _, _) => assert(m, s"doc $bid unmatched") }
    val onSource = perturbed.count { case (bid, _, oid, _) => oid == bid - 100000L }
    assert(onSource * 10 >= perturbed.length * 8,
      s"only $onSource/${perturbed.length} matched their own source")
    assert(got.filter(_._1 >= 400000L).forall(!_._2), "novel docs must not match")
  }

  test("streaming video cuts equal the batch detector exactly") {
    val s = spark
    import org.apache.spark.sql.functions._
    val got = JsonStream.videoCutsToBatch(s, "/root/testdata/sf0.001/documents.parquet")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3))).toSet
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    val want = graft.operators.Multimodal.videoSceneCuts(s,
        graft.operators.Multimodal.syntheticAviBlobs(s, docs), threshold = 32000L)
      .collect().map(c => (c.doc_id, c.frame_idx, c.diff_sum, c.is_cut)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("streaming spectral bins equal the batch kernel exactly") {
    val s = spark
    val got = JsonStream.audioSpectralToBatch(s, "/root/testdata/sf0.001/documents.parquet")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4)))
      .toSet
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet").select("doc_id")
    val want = graft.operators.Multimodal.audioSpectral(s,
        graft.operators.Multimodal.syntheticAudioBlobs(s, docs))
      .collect().map(b => (b.doc_id, b.channel, b.window, b.bin, b.power)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("streaming heavy hitters equal the batch recount exactly") {
    val s = spark
    val path = "/root/testdata/sf0.001/documents.parquet"
    val streamed = JsonStream.heavyMonitorToBatch(s, path, "text", m = 64)
      .orderBy(col("item"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val toks = s.read.parquet(path).where(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("v"))
    val batch = graft.operators.Curation.heavyHitters(toks, "v", 64)
      .orderBy(col("item"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // the stream folds rows in arrival order, a different candidate set
    // than the batch partition merge — but the recount collapses both
    // supersets to the same exact GROUP BY HAVING answer
    assert(streamed.nonEmpty, "expected at least one heavy hitter at sf0.001")
    assert(streamed == batch)
  }

  test("streaming weighted reservoir equals the batch sample exactly") {
    val s = spark
    val path = "/root/testdata/sf0.001/documents.parquet"
    val streamed = JsonStream.weightedSampleToBatch(s, path, k = 32)
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val docs = s.read.parquet(path).select(col("doc_id"),
      greatest(least(coalesce(col("n_chars").cast("long"), lit(1L)),
        lit(1L << 20)), lit(1L)).as("w"))
    val batch = graft.operators.Curation.weightedSample(docs, "doc_id", "w", 32)
      .select(col("doc_id"), col("w"), col("key_fp"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed.size == 32)
    assert(streamed == batch)
  }

  test("snapshot sink: each micro-batch commits one version; old versions pinned") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = s.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-snap-sink")
    try {
      val ms = MemoryStream[(Long, Long)]
      val df = ms.toDF().toDF("doc_id", "n_chars")
      val rootS = root.toString
      val q = df.writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          if (!b.isEmpty) { graft.sources.Snapshots.append(b, rootS); () }
        }
        .start()
      try {
        ms.addData((1L, 10L), (2L, 20L))
        q.processAllAvailable()
        assert(graft.sources.Snapshots.versions(s, rootS) == Seq(1L))
        ms.addData((3L, 30L))
        q.processAllAvailable()
        assert(graft.sources.Snapshots.versions(s, rootS) == Seq(1L, 2L))
        // v1 stays pinned at the first batch's contents
        def ids(v: Long) = graft.sources.Snapshots.read(s, rootS, v)
          .select("doc_id").collect().map(_.getLong(0)).toSet
        assert(ids(1) == Set(1L, 2L))
        assert(ids(2) == Set(1L, 2L, 3L))
      } finally q.stop()
    } finally {
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("warc streaming source: new segments per micro-batch; restart resumes from checkpoint") {
    val s = spark
    def rec(url: String, body: String): Array[Byte] = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: ${body.length}\r\n\r\n$body"
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"Content-Type: application/http; msgtype=response\r\nContent-Length: ${http.length}\r\n\r\n$http\r\n\r\n")
        .getBytes("UTF-8")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-warc-stream")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-warc-ckpt")
    try {
      java.nio.file.Files.write(dir.resolve("seg-001.warc"), rec("https://a/", "one"))
      java.nio.file.Files.write(dir.resolve("seg-002.warc"), rec("https://b/", "two"))
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      def run(): Unit = {
        val q = s.readStream.format("warc").load(dir.toString)
          .select("target_uri")
          .writeStream
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
            b.collect().foreach(r => seen.add(r.getString(0))); ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally if (q.isActive) q.stop()
      }
      run()
      assert(seen.toArray.toSet == Set("https://a/", "https://b/"), seen.toString)
      // a new monotonically-named segment lands; restart from the same
      // checkpoint reads ONLY it
      seen.clear()
      java.nio.file.Files.write(dir.resolve("seg-003.warc"), rec("https://c/", "three"))
      run()
      assert(seen.toArray.toSet == Set("https://c/"), seen.toString)
    } finally {
      Seq(dir, ckpt).foreach { d =>
        java.nio.file.Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
      }
    }
  }
}
