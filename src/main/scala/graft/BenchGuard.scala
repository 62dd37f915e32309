package graft

/**
 * Round-over-round bench regression gate: compares the latest bench run
 * (`BENCH_SUMMARY.json`, falling back to `BENCH_LAST.json`) against the
 * recorded baseline (`BENCH_BASELINE_EXT.json` — the full round-10
 * per-query numbers at sf0.1, core + extended tiers) and exits nonzero
 * if any query regressed.
 *
 * Regression = new > ratio × old AND new − old > slack seconds. Both
 * bounds are needed: the ratio alone flags 0.05 s → 0.09 s timer noise
 * on trivial queries, the slack alone would let a 10 s query double.
 * Defaults ratio = 1.5 (the VERDICT contract), slack = 0.3 s; override
 * with SPARK_GRAFT_GUARD_RATIO / SPARK_GRAFT_GUARD_SLACK. Queries new
 * since the baseline are reported informationally, never failed — they
 * become binding when the baseline is re-recorded at a round close.
 *
 * No JSON library in the dependency set, so parsing is a small regex
 * over the known flat shape Bench emits ("name":number pairs inside the
 * `queries`/`extended` objects).
 */
object BenchGuard {

  private def queryMap(json: String, key: String): Map[String, Double] = {
    val obj = ("\"" + key + "\":\\{([^}]*)\\}").r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    "\"([^\"]+)\":(-?[0-9.eE+-]+)".r.findAllMatchIn(obj)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  def main(args: Array[String]): Unit = {
    def read(p: String): Option[String] =
      try Some(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)))) catch { case _: Throwable => None }
    val latest = read("BENCH_SUMMARY.json").orElse(read("BENCH_LAST.json"))
      .getOrElse(sys.error("no BENCH_SUMMARY.json / BENCH_LAST.json — run graft.Bench first"))
    val baseline = read("BENCH_BASELINE_EXT.json")
      .getOrElse(sys.error("no BENCH_BASELINE_EXT.json baseline"))
    // BENCH_SUMMARY.json is committed per round, so on a fresh checkout
    // it describes a PAST build — gating against it would pass any
    // regression in the current one. The stamp makes staleness
    // detectable: refuse to gate unless the recorded sha is this HEAD.
    val headSha =
      (try {
        val head = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(".git/HEAD"))).trim
        if (head.startsWith("ref: "))
          new String(java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(".git/" + head.stripPrefix("ref: ")))).trim
        else head
      } catch { case _: Throwable => "unknown" })
    val runSha = "\"git_sha\":\"([0-9a-f]+)\"".r
      .findFirstMatchIn(latest).map(_.group(1))
    runSha.foreach { s =>
      if (headSha != "unknown" && s != headSha)
        sys.error(s"BENCH_SUMMARY.json records a run of $s but HEAD is " +
          s"$headSha — a stale summary would gate nothing; run graft.Bench " +
          "on this build first")
    }
    val ratio = sys.env.get("SPARK_GRAFT_GUARD_RATIO")
      .flatMap(_.toDoubleOption).getOrElse(1.5)
    val slack = sys.env.get("SPARK_GRAFT_GUARD_SLACK")
      .flatMap(_.toDoubleOption).getOrElse(0.3)
    val newQ = queryMap(latest, "queries") ++ queryMap(latest, "extended")
    val oldQ = queryMap(baseline, "queries") ++ queryMap(baseline, "extended")
    var failed = 0
    oldQ.toSeq.sortBy(_._1).foreach { case (name, old) =>
      newQ.get(name) match {
        case None =>
          println(f"MISSING $name (baseline ${old}%.3f s — dropped from the bench?)")
          failed += 1
        case Some(v) if v < 0 =>
          println(f"BROKEN  $name (crashed in the latest run)")
          failed += 1
        case Some(v) if old >= 0 && v > ratio * old && v - old > slack =>
          println(f"REGRESS $name ${old}%.3f s -> ${v}%.3f s (${v / old}%.2fx)")
          failed += 1
        case _ => ()
      }
    }
    val added = (newQ.keySet -- oldQ.keySet).toSeq.sorted
    if (added.nonEmpty)
      println(s"INFO new queries not in baseline (unguarded): ${added.mkString(", ")}")
    println(s"BenchGuard: ${oldQ.size} guarded, $failed failing " +
      s"(ratio=$ratio slack=${slack}s)")
    if (failed > 0) sys.exit(1)
  }
}
