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
 */
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
