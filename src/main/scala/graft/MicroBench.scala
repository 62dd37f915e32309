package graft

import graft.JsonFunctions._
import org.apache.spark.sql.functions._

/**
 * Kernel throughput micro-benchmark (single-threaded by default, so the
 * number is per-core): generates ~90-byte JSON documents in memory and
 * times the hot function shapes end-to-end through compiled Spark plans.
 * `sbt "runMain graft.MicroBench [rows] [threads]"`.
 *
 * Mirrors the shapes of the reference's criterion benches
 * (reference benches/main.rs): contains with a 1-key path, get_str, and a
 * 2-key nested get.
 */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val threads = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = GraftSession.builder(threads)
      .master(s"local[$threads]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val df = spark.range(n).select(
      concat(lit("{\"name\": \"user"), col("id"),
        lit("\", \"tags\": [\"a\", \"b\"], \"meta\": {\"score\": "), col("id") % 100,
        lit(", \"active\": true}, \"k\": "), col("id") % 7, lit("}")).as("j"))
      .cache()
    df.count()

    def bench(name: String, rounds: Int = 3)(f: => Unit): Unit = {
      f // warmup
      val times = (1 to rounds).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"MICROBENCH $name: ${n / best / 1e6}%.2f M rows/s (best of $rounds, $threads thread(s))")
    }

    bench("json_contains(j,'k')") {
      df.where(json_contains(col("j"), lit("k"))).count()
    }
    bench("json_get_str(j,'name')") {
      df.select(json_get_str(col("j"), lit("name")).as("s"))
        .selectExpr("max(length(s))").collect()
    }
    bench("json_get_int(j,'meta','score')") {
      df.select(json_get_int(col("j"), lit("meta"), lit("score")).as("v"))
        .selectExpr("max(v)").collect()
    }
    bench("json_get_json(j,'meta')") {
      df.select(json_get_json(col("j"), lit("meta")).as("r"))
        .selectExpr("max(length(r))").collect()
    }
    // fused union-text path (JsonUnionTextFusion rule output)
    bench("json_union_to_text(json_get(j,'meta')) [fused]") {
      df.select(json_union_to_text(json_get(col("j"), lit("meta"))).as("r"))
        .selectExpr("max(length(r))").collect()
    }
    bench("mix64(id) sampling order") {
      spark.range(n).select(operators.mix64(col("id"), 7919L).as("h"))
        .selectExpr("max(h)").collect()
    }
    spark.stop()
  }
}
