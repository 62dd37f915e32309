package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench gate must fail what it exists to fail: regressions against
  * the recorded baseline, and — since round 12 — NEW queries over the
  * absolute ceiling (the "informational" exemption was the loophole a
  * 28 s query once entered the suite through). */
class BenchGuardSpec extends AnyFunSuite {

  private def payload(queries: Map[String, Double], extended: Map[String, Double]): String = {
    def obj(m: Map[String, Double]) =
      m.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{"metric":"total","value":1.0,"unit":"sec","queries":${obj(queries)},""" +
      s""""extended_total":1.0,"extended":${obj(extended)},"sf":"x"}"""
  }

  private val baseline = payload(
    Map("q1" -> 1.0, "q2" -> 0.05), Map("q_ext" -> 2.0))

  test("a new query over the ceiling fails the gate; under it, informational only") {
    val latest = payload(
      Map("q1" -> 1.0, "q2" -> 0.05),
      Map("q_ext" -> 2.0, "q_slow_new" -> 6.0, "q_fast_new" -> 0.4))
    val (lines, failed) = BenchGuard.evaluate(latest, baseline, 1.5, 0.3, 5.0)
    assert(failed == 1, lines.mkString("\n"))
    assert(lines.exists(_.startsWith("NEWSLOW q_slow_new")), lines.mkString("\n"))
    assert(lines.exists(l => l.startsWith("INFO") && l.contains("q_fast_new")),
      lines.mkString("\n"))
  }

  test("an allowlisted new query over the ceiling passes, visibly") {
    val latest = payload(Map("q1" -> 1.0, "q2" -> 0.05),
      Map("q_ext" -> 2.0, "q_slow_new" -> 6.0))
    val (lines, failed) = BenchGuard.evaluate(latest, baseline, 1.5, 0.3, 5.0,
      allow = Map("q_slow_new" -> "deliberately exhaustive; documented in NEXT.md"))
    assert(failed == 0, lines.mkString("\n"))
    assert(lines.exists(_.startsWith("ALLOWED q_slow_new")), lines.mkString("\n"))
  }

  test("regression rule: ratio AND slack must both trip; missing and crashed fail") {
    // 2x on a trivial query (under slack) passes; 2x on a real one fails
    val latest = payload(Map("q1" -> 2.0, "q2" -> 0.1), Map.empty)
    val (lines, failed) = BenchGuard.evaluate(latest, baseline, 1.5, 0.3, 5.0)
    assert(lines.exists(_.startsWith("REGRESS q1")), lines.mkString("\n"))
    assert(!lines.exists(_.contains("REGRESS q2")), lines.mkString("\n"))
    assert(lines.exists(_.startsWith("MISSING q_ext")), lines.mkString("\n"))
    assert(failed == 2, lines.mkString("\n"))
    val (lines2, failed2) = BenchGuard.evaluate(
      payload(Map("q1" -> -1.0, "q2" -> 0.05), Map("q_ext" -> 2.0)),
      baseline, 1.5, 0.3, 5.0)
    assert(failed2 == 1 && lines2.exists(_.startsWith("BROKEN  q1")), lines2.mkString("\n"))
  }

  test("sub-second baselines gate with the wider additive slack; >=1 s keep the tight one") {
    val base = payload(Map("q_small" -> 0.4, "q_big" -> 1.2), Map.empty)
    // 3x noise wobble on a 0.4 s baseline (+0.8 s, under the 1.2 s
    // sub-second slack) must NOT fail — this is exactly the round-12
    // false-positive band
    val wobble = payload(Map("q_small" -> 1.2, "q_big" -> 1.2), Map.empty)
    val (l1, f1) = BenchGuard.evaluate(wobble, base, 1.5, 0.3, 5.0)
    assert(f1 == 0, l1.mkString("\n"))
    // a genuine blow-up (0.4 -> 2.0 s = 5x and +1.6 s) still trips
    val blowup = payload(Map("q_small" -> 2.0, "q_big" -> 1.2), Map.empty)
    val (l2, f2) = BenchGuard.evaluate(blowup, base, 1.5, 0.3, 5.0)
    assert(f2 == 1 && l2.exists(_.startsWith("REGRESS q_small")), l2.mkString("\n"))
    // a >=1 s baseline does NOT get the wide slack: 1.2 -> 2.4 s fails
    val bigRegress = payload(Map("q_small" -> 0.4, "q_big" -> 2.4), Map.empty)
    val (l3, f3) = BenchGuard.evaluate(bigRegress, base, 1.5, 0.3, 5.0)
    assert(f3 == 1 && l3.exists(_.startsWith("REGRESS q_big")), l3.mkString("\n"))
  }

  test("a crashed NEW query fails the gate too") {
    val latest = payload(Map("q1" -> 1.0, "q2" -> 0.05),
      Map("q_ext" -> 2.0, "q_new" -> -1.0))
    val (lines, failed) = BenchGuard.evaluate(latest, baseline, 1.5, 0.3, 5.0)
    assert(failed == 1 && lines.exists(_.contains("q_new")), lines.mkString("\n"))
  }

  test("samples evidence: parsed from the payload and printed on flagged lines") {
    val latest = payload(Map("q1" -> 2.5, "q2" -> 0.05), Map("q_ext" -> 2.0))
      .stripSuffix("}") +
      ""","samples":{"q1":[2.5000,9.1000,6],"q2":[0.0500,0.0600,3]},""" +
      """"loadavg_before":1.2,"loadavg_after":30.5}"""
    val sm = BenchGuard.sampleMap(latest)
    assert(sm == Map("q1" -> ((2.5, 9.1, 6)), "q2" -> ((0.05, 0.06, 3))))
    val (lines, failed) = BenchGuard.evaluate(latest, baseline, 1.5, 0.3, 5.0)
    assert(failed == 1, lines.mkString("\n"))
    // the REGRESS line carries the spread the gate saw — a reviewer can
    // tell "noisy" (wide max) from "slow" (tight spread) without a rerun
    val reg = lines.find(_.startsWith("REGRESS q1")).get
    assert(reg.contains("n=6") && reg.contains("min=2.500") && reg.contains("max=9.100"), reg)
    // a pre-round-14 payload (no samples object) still gates, spread-less
    val (lines2, failed2) = BenchGuard.evaluate(
      payload(Map("q1" -> 2.5, "q2" -> 0.05), Map("q_ext" -> 2.0)),
      baseline, 1.5, 0.3, 5.0)
    assert(failed2 == 1 && lines2.exists(l =>
      l.startsWith("REGRESS q1") && !l.contains("samples")), lines2.mkString("\n"))
  }

  test("calibration evidence: ratio printed on flagged lines, env-vs-code hint correct") {
    def withCalib(p: String, before: Double, after: Double): String =
      p.stripSuffix("}") +
        s""","calib_ms_before":$before,"calib_ms_after":$after,"procs":32}"""
    val base = withCalib(payload(Map("q1" -> 1.0), Map.empty), 200.0, 210.0)
    // probe 2.5x slower on identical work -> ENVIRONMENT hint
    val envSlow = withCalib(payload(Map("q1" -> 3.0), Map.empty), 500.0, 520.0)
    val (l1, f1) = BenchGuard.evaluate(envSlow, base, 1.5, 0.3, 5.0)
    assert(f1 == 1, l1.mkString("\n"))
    val r1 = l1.find(_.startsWith("REGRESS q1")).get
    assert(r1.contains("calib 2.50x") && r1.contains("ENVIRONMENT"), r1)
    // probe flat -> CODE hint
    val codeSlow = withCalib(payload(Map("q1" -> 3.0), Map.empty), 205.0, 199.0)
    val (l2, _) = BenchGuard.evaluate(codeSlow, base, 1.5, 0.3, 5.0)
    val r2 = l2.find(_.startsWith("REGRESS q1")).get
    assert(r2.contains("suspect CODE"), r2)
    // calibOf takes the min of the before/after pair
    assert(BenchGuard.calibOf(envSlow).contains(500.0))
    // pre-round-15 baseline (no calib) -> flagged line says so, still gates
    val (l3, f3) = BenchGuard.evaluate(codeSlow,
      payload(Map("q1" -> 1.0), Map.empty), 1.5, 0.3, 5.0)
    assert(f3 == 1 && l3.exists(l => l.startsWith("REGRESS q1") &&
      l.contains("no calib in baseline")), l3.mkString("\n"))
  }

  test("per-query calibration: a flagged line prefers the probe at that query's moment") {
    def withQcalib(p: String, qc: Map[String, Double],
        before: Double, after: Double): String =
      p.stripSuffix("}") +
        s""","qcalib":${qc.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")}""" +
        s""","calib_ms_before":$before,"calib_ms_after":$after}"""
    val base = withQcalib(payload(Map("q1" -> 2.0), Map.empty),
      Map("q1" -> 200.0), 200.0, 210.0)
    // global pair FLAT (200 -> 205) but q1's own probe 3x slower: the
    // stall hit q1's moment — the line must say ENVIRONMENT via qcalib,
    // exactly the round-15 17x case the global pair could not classify
    val midStall = withQcalib(payload(Map("q1" -> 7.0), Map.empty),
      Map("q1" -> 600.0), 205.0, 207.0)
    val (l1, f1) = BenchGuard.evaluate(midStall, base, 1.5, 0.3, 5.0)
    assert(f1 == 1, l1.mkString("\n"))
    val r1 = l1.find(_.startsWith("REGRESS q1")).get
    assert(r1.contains("qcalib 3.00x") && r1.contains("ENVIRONMENT"), r1)
    // per-query probe flat -> CODE, even if the global pair moved
    val codeSlow = withQcalib(payload(Map("q1" -> 7.0), Map.empty),
      Map("q1" -> 205.0), 500.0, 520.0)
    val (l2, _) = BenchGuard.evaluate(codeSlow, base, 1.5, 0.3, 5.0)
    val r2 = l2.find(_.startsWith("REGRESS q1")).get
    assert(r2.contains("qcalib 1.03x") && r2.contains("suspect CODE"), r2)
    // baseline without a per-query value falls back to its global calib
    val oldBase = payload(Map("q1" -> 2.0), Map.empty).stripSuffix("}") +
      ""","calib_ms_before":200.0,"calib_ms_after":210.0}"""
    val (l3, _) = BenchGuard.evaluate(midStall, oldBase, 1.5, 0.3, 5.0)
    assert(l3.find(_.startsWith("REGRESS q1")).get.contains("qcalib 3.00x"),
      l3.mkString("\n"))
    // no per-query probe on either side -> the run-bracketing hint
    val plain = payload(Map("q1" -> 7.0), Map.empty).stripSuffix("}") +
      ""","calib_ms_before":500.0,"calib_ms_after":520.0}"""
    val (l4, _) = BenchGuard.evaluate(plain, oldBase, 1.5, 0.3, 5.0)
    val r4 = l4.find(_.startsWith("REGRESS q1")).get
    assert(r4.contains("calib 2.50x") && r4.contains("ENVIRONMENT"), r4)
  }

  test("queryMap refuses a non-flat payload instead of silently ungating the tail") {
    val nested = """{"queries":{"q1":1.0,"sub":{"q2":2.0}},"extended":{}}"""
    intercept[IllegalArgumentException] {
      BenchGuard.queryMap(nested, "queries")
    }
  }

  test("artifactOnly: bench-record/doc commits don't invalidate a run; source changes do") {
    assert(BenchGuard.artifactOnly(Seq("BENCH_SUMMARY.json", "BENCH_BASELINE_EXT.json")))
    assert(BenchGuard.artifactOnly(Seq("NEXT.md", "PROGRESS.jsonl", "CORRECTNESS_r12.json")))
    assert(!BenchGuard.artifactOnly(Seq("BENCH_SUMMARY.json",
      "src/main/scala/graft/Bench.scala")))
    assert(!BenchGuard.artifactOnly(Nil)) // same-sha case is handled upstream
    assert(!BenchGuard.artifactOnly(Seq("build.sbt")))
  }

  test("GitInfo resolves HEAD through loose refs AND packed-refs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gitinfo")
    try {
      val git = dir.resolve(".git")
      java.nio.file.Files.createDirectories(git.resolve("refs/heads"))
      java.nio.file.Files.writeString(git.resolve("HEAD"), "ref: refs/heads/main\n")
      // loose ref present
      java.nio.file.Files.writeString(git.resolve("refs/heads/main"), "aaaa1111\n")
      assert(GitInfo.headSha(git.toString) == "aaaa1111")
      // after `git gc`: loose ref gone, sha only in packed-refs
      java.nio.file.Files.delete(git.resolve("refs/heads/main"))
      java.nio.file.Files.writeString(git.resolve("packed-refs"),
        "# pack-refs with: peeled fully-peeled sorted \n" +
          "bbbb2222 refs/heads/other\n" +
          "cccc3333 refs/heads/main\n" +
          "^dddd4444\n")
      assert(GitInfo.headSha(git.toString) == "cccc3333")
      // detached HEAD
      java.nio.file.Files.writeString(git.resolve("HEAD"), "eeee5555\n")
      assert(GitInfo.headSha(git.toString) == "eeee5555")
      // nothing resolvable
      java.nio.file.Files.writeString(git.resolve("HEAD"), "ref: refs/heads/gone\n")
      java.nio.file.Files.delete(git.resolve("packed-refs"))
      assert(GitInfo.headSha(git.toString) == "unknown")
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
