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

    def bench(name: String, rows: Long = n, rounds: Int = 3)(f: => Unit): Unit = {
      f // warmup
      val times = (1 to rounds).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"MICROBENCH $name: ${rows / best / 1e6}%.2f M rows/s (best of $rounds, $threads thread(s))")
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
    // union struct build + display / canonical text — the formerly
    // CodegenFallback arms (round 7 moved them onto real doGenCode)
    bench("json_union_display(json_get(j,'meta'))") {
      df.select(json_union_display(json_get(col("j"), lit("meta"))).as("r"))
        .selectExpr("max(length(r))").collect()
    }
    bench("json_union_to_text(json_from_scalar(id))") {
      spark.range(n)
        .select(json_union_to_text(json_from_scalar(col("id"))).as("r"))
        .selectExpr("max(length(r))").collect()
    }
    bench("mix64(id) sampling order") {
      spark.range(n).select(operators.mix64(col("id"), 7919L).as("h"))
        .selectExpr("max(h)").collect()
    }

    // bloom membership over 12-token docs (4-gram shingles): the fused
    // kernel vs the declarative higher-order fold it replaced — the HOF
    // path is CodegenFallback, so this pair quantifies the fusion win
    val words = (0 until 256).map(i => s"w$i")
    val nT = n / 4
    val text = spark.range(nT).select(col("id"),
        concat_ws(" ", (0 until 12).map(j =>
          element_at(typedlit(words),
            (pmod(operators.mix64(col("id") * 13 + j, 5L), lit(256)) + 1).cast("int"))): _*)
          .as("t"))
      .cache()
    text.count()
    val filt = operators.Bloom.buildFilter(
      text.where(col("id") % 16 === 0)
        .select(explode(operators.Dedup.shingles(col("t"), 4)).as("g")),
      col("g"), numBits = 1L << 22, numHashes = 7)
    bench("bloom_count_contained(split(t),filter,4) [fused kernel]", nT) {
      text.select(operators.Bloom.bloomCountContained(
          split(col("t"), " "), lit(filt), 4).as("c"))
        .selectExpr("max(c)").collect()
    }
    bench("aggregate(shingles(t,4), might_contain) [declarative HOF]", nT) {
      text.select(aggregate(operators.Dedup.shingles(col("t"), 4), lit(0L),
          (acc, g) => acc +
            when(operators.Bloom.bloomMightContain(g, lit(filt)), 1L).otherwise(0L)).as("c"))
        .selectExpr("max(c)").collect()
    }
    // hashed linear classifier over the same 12-token docs: 23 features
    // (12 unigrams + 11 bigrams), each FNV-1a + 2 splitmix rounds
    bench("hashed_linear_score(split(t)) [fused kernel]", nT) {
      text.select(operators.hashed_linear_score(split(col("t"), " "), 1 << 20).as("s"))
        .selectExpr("max(s.wsum)").collect()
    }
    // CDC gear kernel over the same ~70-byte docs: one table lookup +
    // shift-add per byte, FNV fold per emitted chunk
    bench("gear_cutpoints(t, 5, 16, 64) [fused kernel]", nT) {
      text.selectExpr("gear_cutpoints(t, 5, 16, 64) AS cs")
        .selectExpr("max(size(cs))").collect()
    }
    // unicode hygiene kernels: ASCII short-circuit path (the common
    // case at corpus scale — a byte scan, no allocation)
    bench("unicode_normalize(t, 'NFKC') [ascii fast path]", nT) {
      text.selectExpr("unicode_normalize(t, 'NFKC') AS s")
        .selectExpr("max(length(s))").collect()
    }
    bench("fix_mojibake(t) [ascii fast path]", nT) {
      text.selectExpr("fix_mojibake(t) AS s")
        .selectExpr("max(length(s))").collect()
    }
    spark.stop()
  }
}
