package graft

import org.apache.spark.sql.functions._

/**
 * Sustained streaming throughput: each operator runs as ONE long-lived
 * query over a MemoryStream fed in `batches` micro-batches of
 * `rowsPerBatch` rows, state carried across batches — the number is
 * rows/s through the running query. This complements the extended
 * Bench tier, which times the bounded *ToBatch replays (stream setup +
 * replay + teardown per sample) rather than steady-state throughput.
 * `sbt "runMain graft.StreamBench [rowsPerBatch] [batches] [threads]
 * [rocksdb]"` — the optional 4th arg flips the state store to RocksDB
 * (the production choice once per-key state exceeds executor heap; the
 * default HDFS-backed store keeps every version in memory).
 *
 * A 5th arg `statescale[-sessionize|-funnel]` runs the BEYOND-HEAP
 * probe instead: a watermark-correct stateful operator with a delay the
 * replay never reaches, so every row pends in state — state grows
 * linearly with input and the probe is meant to be run in a heap-capped
 * JVM (`spark-submit --driver-memory 700m --class graft.StreamBench
 * <jar> 500000 20 8 [rocksdb|hdfs] statescale[-sessionize|-funnel]`):
 * the in-memory HDFS store dies of OOM once serialized state + its
 * version retention outgrow the heap, RocksDB (off-heap block cache +
 * disk) keeps going — the measured crossover behind SURVEY §8.2's
 * RocksDB claim. The bare kind is the as-of (one pending list per key
 * of left rows); `-sessionize` pends (ts, id) pairs plus the two-long
 * numbering carry; `-funnel` pends (ts, id, type) triples plus the
 * k-slot accumulator. Input comes from `rate-micro-batch` (MemoryStream
 * would retain every fed batch on the same heap and OOM both configs)
 * and lands in a `noop` sink. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val rowsPer = args.headOption.map(_.toInt).getOrElse(200000)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(10)
    val threads = args.lift(2).map(_.toInt).getOrElse(8)
    val rocks = args.lift(3).contains("rocksdb")
    val b0 = GraftSession.builder(threads)
      .master(s"local[$threads]")
      .config("spark.ui.enabled", "false")
    val spark = (if (rocks)
      b0.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    else b0).getOrCreate()
    if (rocks) println("STREAMBENCH state store: RocksDB")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

    if (args.lift(4).exists(_.startsWith("statescale"))) {
      // Beyond-heap state probe: delay = 100 days, so the watermark never
      // passes any row — everything pends per key forever. As-of pends
      // the ~75% non-click rows (~40 B each); sessionize pends every row
      // as a (ts, id) pair; funnel pends every step row as a (ts, id,
      // type) triple. One state value per user_id (1000 keys), rewritten
      // each batch.
      val kind = args(4).stripPrefix("statescale").stripPrefix("-")
      val events = spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rowsPer).load()
        .select(col("value").as("event_id"),
          (col("value") * 1000000L).as("ts"), // nanos, 1 ms apart
          (col("value") % 1000).as("user_id"),
          when(col("value") % 4 === 0, "click").otherwise("view").as("event_type"),
          (col("value") % 100).cast("double").as("value"))
      val out = kind match {
        case "" => streaming.JsonStream
          .asofStatefulEventTime(spark, events, delay = "100 days").toDF()
        case "sessionize" => streaming.JsonStream
          .sessionizeEventTime(spark, events, gap = 1000000L, delay = "100 days").toDF()
        case "funnel" => streaming.JsonStream
          .funnelEventTime(spark, events, Seq("view", "click"), delay = "100 days").toDF()
        case other => sys.error(s"unknown statescale kind '$other' " +
          "(use statescale, statescale-sessionize, or statescale-funnel)")
      }
      val t0 = System.nanoTime()
      val q = out.writeStream.outputMode("append").format("noop").start()
      try {
        while (Option(q.lastProgress).forall(_.batchId < nBatches)) {
          if (!q.isActive) q.awaitTermination() // surface the failure loudly
          Thread.sleep(200)
        }
        val s = (System.nanoTime() - t0) / 1e9
        val p = q.lastProgress
        val st = p.stateOperators
        val heapMb = (Runtime.getRuntime.totalMemory -
          Runtime.getRuntime.freeMemory) / 1e6
        val tag = if (kind.isEmpty) "statescale" else s"statescale-$kind"
        println(f"STREAMBENCH $tag[${if (rocks) "rocksdb" else "hdfs"}]: " +
          f"${(p.batchId + 1) * rowsPer / s / 1e6}%.3f M rows/s over ${p.batchId + 1} batches x $rowsPer, " +
          f"stateRows=${st.map(_.numRowsTotal).sum}, " +
          f"stateMem=${st.map(_.memoryUsedBytes).sum / 1e6}%.0f MB, " +
          f"jvmHeapUsed=$heapMb%.0f MB")
      } finally q.stop()
      spark.stop()
      return
    }

    // synthetic events shaped like the events table: ts in NANOS,
    // event-time mostly increasing across batches, 1000 keys, 1-in-4
    // rights ("click"), 1-in-10 ids are redeliveries (dedup fodder)
    def batch(b: Int): Seq[(Long, Long, Long, String, Double, String)] =
      (0 until rowsPer).map { i =>
        val id = b.toLong * rowsPer + i
        val dupId = if (i % 10 == 9) id - 1 else id
        val tsNs = id * 1000000L // 1 ms apart
        val et = if (id % 4 == 0) "click" else "view"
        (dupId, tsNs, id % 1000, et, (id % 100).toDouble,
          s"""{"k": ${id % 128}}""")
      }

    val total = rowsPer.toLong * nBatches
    def bench(name: String)(mk: org.apache.spark.sql.DataFrame =>
        (org.apache.spark.sql.DataFrame, String)): Unit = {
      val ms = MemoryStream[(Long, Long, Long, String, Double, String)]
      val events = ms.toDF()
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
      val (out, mode) = mk(events)
      val sink = s"sb_${name.replaceAll("[^a-zA-Z0-9]", "")}"
      val q = out.writeStream.outputMode(mode)
        .format("memory").queryName(sink).start()
      try {
        // batch 0 primes state-store/codegen paths; timed from batch 1
        ms.addData(batch(0)); q.processAllAvailable()
        val t0 = System.nanoTime()
        (1 to nBatches).foreach { b =>
          ms.addData(batch(b)); q.processAllAvailable()
        }
        val s = (System.nanoTime() - t0) / 1e9
        println(f"STREAMBENCH $name: ${total / s / 1e6}%.2f M rows/s sustained ($nBatches batches x $rowsPer rows, $threads threads)")
      } finally {
        q.stop()
        spark.catalog.dropTempView(sink)
      }
    }

    bench("asofStateful (arrival-order)") { ev =>
      (streaming.JsonStream.asofStateful(spark, ev.drop("event_ts")).toDF(), "append")
    }
    bench("asofStatefulEventTime (watermark-correct)") { ev =>
      (streaming.JsonStream.asofStatefulEventTime(spark, ev.drop("event_ts"),
        delay = "1 second").toDF(), "append")
    }
    bench("dedupStream (watermark dedup)") { ev =>
      (streaming.JsonStream.dedupStream(ev, Seq("event_id"), "10 seconds"), "append")
    }
    bench("windowedJsonAgg (json windowed agg)") { ev =>
      (streaming.JsonStream.windowedJsonAgg(ev, "10 seconds", "5 seconds"), "update")
    }
    spark.stop()
  }
}
