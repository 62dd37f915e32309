package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {

  /** Force FULL evaluation of every output column. A bare `count()` lets
    * the optimizer prune unused projections — for projection-only queries
    * (the 13 json scalar getters, q_asof_join's carried columns, the
    * bloom membership count) that collapsed the measurement to a bare
    * parquet scan count. Hashing all columns into one aggregated value
    * makes every operator column load-bearing at ~ns/row overhead, while
    * the order-agnostic aggregate still lets the optimizer drop the
    * verification-only global `orderBy` each query carries for the
    * driver's hash compare (measuring the operator, not the test
    * plumbing). */
  private def force(df: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    // bit_xor, not sum: a sum of 2^63-scale hashes overflows under ANSI
    df.select(xxhash64(df.columns.map(col): _*).as("h"))
      .agg(expr("bit_xor(h)")).head()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // date-literal comparisons against the (timestamp-typed) TPC-H date
      // columns must not shift with the machine timezone
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup at the smallest scale factor: JIT-compiles the generated code
    // and the kernel paths once so measured numbers reflect steady-state
    // throughput, not first-call compilation (standard criterion-style
    // methodology; the reference's benches warm up the same way).
    // Fixed headline set (SparkEntry.headlineQueries) so the metric stays
    // comparable across rounds as the full query map grows.
    val bench: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] =
      SparkEntry.headlineQueries.flatMap(n => SparkEntry.queries.get(n).map(n -> _))
    // Extended tier: every query NOT in the fixed headline set (streaming,
    // forward/nearest/salted as-of, sessionize, chunk/seq-pack, IVF+PQ, …).
    // Timed under a separate JSON key so the headline total stays
    // round-over-round comparable while regressions in the long tail are
    // still visible. Computed as the complement so new queries are benched
    // automatically.
    val extended: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)] = {
      val head = SparkEntry.headlineQueries.toSet
      SparkEntry.queries.toSeq.filterNot { case (n, _) => head(n) }.sortBy(_._1)
    }
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir) {
      (bench ++ extended).foreach { case (_, fn) =>
        try { force(fn(spark, warmDir)) } catch { case _: Throwable => () }
      }
    }
    // ADAPTIVE min-of-N sampling (the documented rule BenchGuard gates
    // on). Every query starts at its tier's base sample count (core 3 /
    // extended 2 / iterative 3 — criterion-style steady-state timing
    // after the warmup pass), then KEEPS sampling, up to
    // SPARK_GRAFT_BENCH_MAX_SAMPLES (default 6), while the measurement
    // is noise-prone:
    //   - the running min is SUB-SECOND (sub-second queries inside a
    //     181-query serial session sit in a ±2-12x JIT/GC/load noise
    //     band — the round-12 close measured q_decontam_frac at 0.38 s
    //     and 4.63 s across two runs of byte-identical code), or
    //   - the observed spread max/min exceeds 1.3 while the min is
    //     under 5 s (two samples that disagree are exactly the case
    //     where two are not enough; >5 s queries are relatively stable
    //     and too expensive to resample on spread alone).
    // The reported number is the min — the reproducible floor.
    val samplesEnv = sys.env.get("SPARK_GRAFT_BENCH_SAMPLES").flatMap(_.toIntOption)
    val samples = math.max(1, samplesEnv.getOrElse(3))
    // When SPARK_GRAFT_BENCH_SAMPLES is set explicitly it CAPS the adaptive
    // growth too (SAMPLES=1 means one sample, full stop) — unless the
    // caller also sets MAX_SAMPLES, which then wins. Unset, the adaptive
    // rule may grow any query to 6.
    val maxSamples = math.max(samples,
      sys.env.get("SPARK_GRAFT_BENCH_MAX_SAMPLES").flatMap(_.toIntOption)
        .orElse(samplesEnv).getOrElse(6))
    // Per-query evidence beyond the reported min: (min, max, n) lets a
    // reader distinguish "noisy" (wide spread across honest samples) from
    // "slow" (tight spread, high floor) from the committed artifact alone —
    // the driver's environment and the builder's disagree up to 11x on
    // sub-second queries, and the min alone can't show which one lied.
    final case class Stat(min: Double, max: Double, n: Int)
    val stats = scala.collection.mutable.LinkedHashMap.empty[String, Stat]
    def time(qs: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)], base: Int): Map[String, Double] =
      qs.map { case (name, fn) =>
        val ts = scala.collection.mutable.ArrayBuffer.empty[Double]
        def sample(): Boolean = {
          val t0 = System.nanoTime()
          // a crashed query must read as broken (-1), not as a fast run
          val ok = try { force(fn(spark, sfDir)); true } catch { case _: Throwable => false }
          if (ok) ts += (System.nanoTime() - t0) / 1e9
          ok
        }
        var broken = false
        var i = 0
        while (i < base && !broken) { broken = !sample(); i += 1 }
        while (!broken && ts.length < maxSamples &&
            (ts.min < 1.0 || (ts.min < 5.0 && ts.max / ts.min > 1.3)))
          broken = !sample()
        stats(name) =
          if (broken) Stat(-1.0, -1.0, ts.length)
          else Stat(ts.min, ts.max, ts.length)
        name -> (if (broken) -1.0 else ts.min)
      }.toMap
    // Machine-load snapshot: a loadavg far above the core count explains a
    // slow sample better than any per-query number can.
    def loadAvg(): Double =
      try java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .getSystemLoadAverage
      catch { case _: Throwable => -1.0 }
    val loadBefore = loadAvg()
    val results: Map[String, Double] = time(bench, samples)
    // Extended tier starts at min-of-2: regression visibility, not a
    // headline number — the adaptive rule above adds samples exactly
    // where two are not enough. EXCEPT the iterative queries
    // (driver-loop rounds with checkpoint/persist churn): they are the
    // bench's most variance-prone measurements — the round-11 close
    // recorded 2-3x run-to-run swings on exactly these — so they keep
    // the full min-of-3 base.
    val iterative = Set("q_bpe_merges", "q_dedup_clusters", "q_pagerank", "q_link_graph")
    val (extIter, extRest) = extended.partition { case (n, _) => iterative(n) }
    val extResults: Map[String, Double] =
      time(extRest, math.min(2, samples)) ++ time(extIter, samples)
    def json(m: Map[String, Double]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // Compact per-query encoding: 0.1 ms resolution. The driver captures
    // only a fixed-size TAIL of stdout (~3 KB — BENCH_r08 recorded
    // parsed:null because the full-precision line with the 40-query
    // extended map grew past the window and lost its front). The final
    // printed line must stay well under that budget; full precision and
    // the extended map live in BENCH_LAST.json.
    // Locale.ROOT: the f"" interpolator is default-locale-dependent — a
    // comma-decimal locale (de_DE, fr_FR) would print 12,3456 and break
    // the JSON the driver parses
    def fmt4(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    def jsonCompact(m: Map[String, Double]): String =
      m.map { case (k, v) =>
        s"\"" + k + "\":" + (if (v < 0) "-1" else fmt4(v))
      }.mkString("{", ",", "}")
    val loadAfter = loadAvg()
    val total = results.values.filter(_ >= 0).sum
    val extTotal = extResults.values.filter(_ >= 0).sum
    val statsJson = stats.map { case (k, s) =>
      s"\"" + k + s"\":[${fmt4(s.min)},${fmt4(s.max)},${s.n}]"
    }.mkString("{", ",", "}")
    val full = s"""{"metric":"total","value":$total,"unit":"sec","queries":${json(results)},"extended_total":$extTotal,"extended":${json(extResults)},"samples":$statsJson,"loadavg_before":${fmt4(loadBefore)},"loadavg_after":${fmt4(loadAfter)},"sf":"$sfDir"}"""
    val compact = s"""{"metric":"total","value":${fmt4(total)},"unit":"sec","queries":${jsonCompact(results)},"extended_total":${fmt4(extTotal)},"sf":"$sfDir"}"""
    // Full detail to a fixed file: survives any stdout decoration or
    // truncation by the build tool / driver capture.
    try {
      val w = new java.io.PrintWriter("BENCH_LAST.json")
      try w.println(full) finally w.close()
    } catch { case _: Throwable => () }
    // Durable bench history: the same payload stamped with the git sha
    // and wall-clock time, so bench provenance survives even when the
    // driver-side artifact is lost or truncated (BENCH_r08 parsed null,
    // BENCH_r09 never materialized). Commit BENCH_SUMMARY.json with the
    // round; graft.BenchGuard diffs it against BENCH_BASELINE_EXT.json.
    try {
      val sha = GitInfo.headSha()
      val stamped = full.stripSuffix("}") +
        s""","git_sha":"$sha","written_at":"${java.time.Instant.now()}"}"""
      val w = new java.io.PrintWriter("BENCH_SUMMARY.json")
      try w.println(stamped) finally w.close()
    } catch { case _: Throwable => () }
    // Also print the full line EARLY (before Spark shutdown logging) for
    // anyone reading complete stdout; the driver's tail-window parse uses
    // the compact final line below.
    println(full)
    spark.stop()
    // Print last, after Spark's shutdown logging, so the final stdout
    // line of the run is a bare JSON object small enough to survive a
    // tail-window capture whole.
    println(compact)
    System.out.flush()
  }
}
