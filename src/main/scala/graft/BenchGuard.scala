package graft

/**
 * Round-over-round bench regression gate: compares the latest bench run
 * (`BENCH_SUMMARY.json`, falling back to `BENCH_LAST.json`) against the
 * recorded baseline (`BENCH_BASELINE_EXT.json` — the full per-query
 * numbers at sf0.1, core + extended tiers) and exits nonzero if any
 * query regressed.
 *
 * Regression = new > ratio × old AND new − old > slack seconds. Both
 * bounds are needed: the ratio alone flags 0.05 s → 0.09 s timer noise
 * on trivial queries, the slack alone would let a 10 s query double.
 * Defaults ratio = 1.5 (the VERDICT contract), slack = 0.3 s; override
 * with SPARK_GRAFT_GUARD_RATIO / SPARK_GRAFT_GUARD_SLACK.
 *
 * SAMPLING RULE this gate assumes (implemented in [[Bench]]): every
 * query is timed min-of-N with ADAPTIVE N — base 3 (core/iterative) or
 * 2 (extended), growing to 6 while the running min is sub-second or the
 * sample spread exceeds 1.3× under 5 s. Even so, sub-second queries
 * inside a 181-query serial session keep a residual noise band the
 * 0.3 s slack sits inside (round-12 measured 0.38 s ↔ 4.63 s swings on
 * byte-identical code before the adaptive rule; afterwards the band is
 * narrower but not zero) — so SUB-SECOND baselines (< 1 s) gate with a
 * wider additive slack, default 1.2 s
 * (SPARK_GRAFT_GUARD_SUBSEC_SLACK). A genuine blow-up of a 0.4 s query
 * still trips (0.4 → 2 s = 5× and +1.6 s); a 2-3× noise wobble does
 * not. Queries at or above 1 s keep the tight 0.3 s slack.
 *
 * Queries new since the baseline get an ABSOLUTE ceiling instead
 * (default 5 s, SPARK_GRAFT_GUARD_NEW_CEILING): a brand-new query has
 * no old number to ratio against, and "reported informationally" was
 * the loophole a 28 s query once walked through — now it fails the
 * gate unless [[newQueryAllow]] carries an explicit justification.
 * They become ratio-gated when the baseline is re-recorded at a round
 * close.
 *
 * No JSON library in the dependency set, so parsing is a small regex
 * over the known flat shape Bench emits ("name":number pairs inside the
 * `queries`/`extended` objects); [[queryMap]] fails loudly if the shape
 * ever stops being flat, rather than silently ungating the tail.
 */
object BenchGuard {

  /** New-since-baseline queries allowed over the ceiling, with the
    * justification the exemption must carry — the single place such
    * exemptions can live so they are code-reviewed. Empty since round
    * 13: q_hits (the one round-12 entry) entered the recorded baseline
    * and is ratio-gated like everything else (~4.3 s vs its 3.66 s
    * baseline). */
  val newQueryAllow: Map[String, String] = Map.empty

  /** Files whose changes do NOT invalidate a bench run: committing the
    * bench record itself (or round docs) moves HEAD without changing
    * the build, which is exactly how every round close works — the
    * round-11 close was flagged because the gate had no way to say
    * "HEAD moved but only by artifacts". Used by the staleness check:
    * a recorded-sha≠HEAD summary still gates when `git diff
    * --name-only` between them touches only these. */
  private[graft] def artifactOnly(changedFiles: Seq[String]): Boolean =
    changedFiles.nonEmpty && changedFiles.forall { f =>
      val name = f.substring(f.lastIndexOf('/') + 1)
      name.startsWith("BENCH_") || name.endsWith(".md") ||
        name == "PROGRESS.jsonl" || name.startsWith("CORRECTNESS_") ||
        name.startsWith("VERDICT") || name.startsWith("ADVICE") ||
        name.startsWith("COPYCHECK") || name.startsWith("LEAKCHECK")
    }

  /** `git diff --name-only a..b`, or None when git is unavailable. */
  private def gitChangedFiles(a: String, b: String): Option[Seq[String]] =
    try {
      val p = new ProcessBuilder("git", "diff", "--name-only", s"$a..$b")
        .redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      if (p.waitFor() != 0) None
      else Some(out.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq)
    } catch { case _: Exception => None }

  private[graft] def queryMap(json: String, key: String): Map[String, Double] = {
    val obj = ("\"" + key + "\":\\{([^}]*)\\}").r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    // the extraction above assumes queries/extended stay FLAT objects;
    // a nested object would truncate the map at its first '{' and the
    // dropped queries would silently become "new/unguarded"
    require(!obj.contains("{"),
      s"bench payload '$key' object is not flat — fix BenchGuard.queryMap " +
        "before trusting the gate")
    "\"([^\"]+)\":(-?[0-9.eE+-]+)".r.findAllMatchIn(obj)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** The `samples` evidence object Bench emits since round 14:
    * name → (min, max, n_samples). Absent in pre-round-14 payloads →
    * empty map (the gate still works; the report just lacks spreads). */
  private[graft] def sampleMap(json: String): Map[String, (Double, Double, Int)] = {
    val obj = "\"samples\":\\{([^}]*)\\}".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    "\"([^\"]+)\":\\[(-?[0-9.eE+-]+),(-?[0-9.eE+-]+),([0-9]+)\\]".r
      .findAllMatchIn(obj)
      .map(m => m.group(1) -> ((m.group(2).toDouble, m.group(3).toDouble,
        m.group(4).toInt))).toMap
  }

  /** The per-query calibration probes ([[Bench]]'s `qcalib`, round 16):
    * for every >= 1 s query the fixed-work probe ran right after its
    * samples, so the value is the machine's demonstrated speed AT THAT
    * QUERY'S MOMENT — the evidence the run-bracketing pair cannot give
    * for a mid-session stall. Absent in older payloads → empty map. */
  private[graft] def qcalibMap(json: String): Map[String, Double] = {
    val obj = "\"qcalib\":\\{([^}]*)\\}".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    "\"([^\"]+)\":(-?[0-9.eE+-]+)".r.findAllMatchIn(obj)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
  }

  /** The single-thread CPU calibration probe value ([[Bench.calibrateMs]])
    * recorded in a bench payload: min of the before/after pair (the
    * machine's best demonstrated speed during the run). None for
    * pre-round-15 payloads. */
  private[graft] def calibOf(json: String): Option[Double] = {
    def f(key: String) = ("\"" + key + "\":(-?[0-9.eE+-]+)").r
      .findFirstMatchIn(json).map(_.group(1).toDouble).filter(_ > 0)
    (f("calib_ms_before"), f("calib_ms_after")) match {
      case (Some(a), Some(b)) => Some(math.min(a, b))
      case (a, b)             => a.orElse(b)
    }
  }

  /** Pure gate logic: (report lines, failure count). Split from main so
    * BenchGuardSpec can prove the gate fails what it must fail. */
  private[graft] def evaluate(
      latest: String,
      baseline: String,
      ratio: Double,
      slack: Double,
      newCeiling: Double,
      allow: Map[String, String] = newQueryAllow,
      subSecSlack: Double = 1.2): (Seq[String], Int) = {
    val newQ = queryMap(latest, "queries") ++ queryMap(latest, "extended")
    val oldQ = queryMap(baseline, "queries") ++ queryMap(baseline, "extended")
    val spreads = sampleMap(latest)
    // Cross-environment normalizer: the fixed-work probe ran in BOTH
    // payloads, so its ratio measures how much slower THE MACHINE was
    // in the latest run on byte-identical work. Printed on every
    // flagged line (plus a code-vs-env hint) so the classification the
    // round-14 judge had to rerun queries for is readable from the
    // report alone. Evidence only — the gate thresholds are unchanged.
    val calibRatio: Option[Double] = for {
      nc <- calibOf(latest)
      oc <- calibOf(baseline)
    } yield nc / oc
    // Per-query probes beat the run-bracketing pair when present: a
    // stall that hits ONE query mid-session shows in ITS probe while
    // the global pair stays flat (the round-15 17x q_bm25 reading that
    // needed a judge rerun to classify — now each flagged line
    // self-adjudicates from the probe taken at that query's moment).
    val qcalLatest = qcalibMap(latest)
    val qcalBase = qcalibMap(baseline)
    def envHint(name: String): String = {
      val perQuery = for {
        n <- qcalLatest.get(name)
        o <- qcalBase.get(name).orElse(calibOf(baseline))
      } yield {
        val r = n / o
        if (r > 1.3)
          f" [qcalib ${r}%.2fx at this query's moment -> likely ENVIRONMENT: identical probe work ran ${r}%.2fx slower]"
        else
          f" [qcalib ${r}%.2fx -> probe flat at this query's moment, suspect CODE]"
      }
      perQuery.orElse(calibRatio.map { r =>
        if (r > 1.3)
          f" [calib ${r}%.2fx -> likely ENVIRONMENT: identical probe work ran ${r}%.2fx slower]"
        else
          f" [calib ${r}%.2fx -> probe flat: machine speed unchanged, suspect CODE]"
      }).getOrElse(" [no calib in baseline — pre-round-15 payload]")
    }
    // The spread the gate actually saw: "noisy" (max/min wide) and
    // "slow" (tight spread, high floor) read differently in a review —
    // print it on every flagged line so the judgment is possible from
    // the report alone.
    def spreadOf(name: String): String = spreads.get(name).map {
      case (mn, mx, n) => f" [samples n=$n min=${mn}%.3f max=${mx}%.3f]"
    }.getOrElse("")
    val out = Seq.newBuilder[String]
    var failed = 0
    oldQ.toSeq.sortBy(_._1).foreach { case (name, old) =>
      // sub-second baselines sit in the serial-session noise band even
      // under adaptive min-of-N sampling — they gate with the wider
      // additive slack (see the class doc for the measured evidence)
      val effSlack = if (old >= 0 && old < 1.0) math.max(slack, subSecSlack) else slack
      newQ.get(name) match {
        case None =>
          out += f"MISSING $name (baseline ${old}%.3f s — dropped from the bench?)"
          failed += 1
        case Some(v) if v < 0 =>
          out += f"BROKEN  $name (crashed in the latest run)"
          failed += 1
        case Some(v) if old >= 0 && v > ratio * old && v - old > effSlack =>
          out += f"REGRESS $name ${old}%.3f s -> ${v}%.3f s (${v / old}%.2fx)" +
            spreadOf(name) + envHint(name)
          failed += 1
        case _ => ()
      }
    }
    (newQ.keySet -- oldQ.keySet).toSeq.sorted.foreach { name =>
      val v = newQ(name)
      if (v < 0) {
        out += f"BROKEN  $name (new query crashed in the latest run)"
        failed += 1
      } else if (v > newCeiling) {
        allow.get(name) match {
          case Some(reason) =>
            out += f"ALLOWED $name ${v}%.3f s over the ${newCeiling}%.1f s new-query ceiling: $reason"
          case None =>
            out += f"NEWSLOW $name ${v}%.3f s (new query over the ${newCeiling}%.1f s ceiling " +
              "— fix it or allowlist it with a justification)" + spreadOf(name) + envHint(name)
            failed += 1
        }
      } else {
        out += f"INFO    new query $name ${v}%.3f s (under the ${newCeiling}%.1f s ceiling; " +
          "ratio-gated once the baseline is re-recorded)"
      }
    }
    (out.result(), failed)
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
    val headSha = GitInfo.headSha()
    val runSha = "\"git_sha\":\"([0-9a-f]+)\"".r
      .findFirstMatchIn(latest).map(_.group(1))
    if (headSha == "unknown")
      // the staleness gate cannot run — say so loudly instead of
      // silently skipping (an unresolvable HEAD after git gc was
      // exactly how a stale summary could slip through)
      println("WARNING: cannot resolve .git HEAD — the stale-summary " +
        "check is NOT running; verify BENCH_SUMMARY.json matches this build")
    runSha.foreach { s =>
      if (headSha != "unknown" && s != headSha) {
        gitChangedFiles(s, headSha) match {
          case Some(files) if artifactOnly(files) =>
            println(s"INFO: summary recorded at ${s.take(12)}; HEAD " +
              s"${headSha.take(12)} differs only by bench artifacts/docs " +
              s"(${files.mkString(", ")}) — build identical, gating proceeds")
          case _ =>
            sys.error(s"BENCH_SUMMARY.json records a run of $s but HEAD is " +
              s"$headSha with source changes between them — a stale summary " +
              "would gate nothing; run graft.Bench on this build first")
        }
      }
    }
    val ratio = sys.env.get("SPARK_GRAFT_GUARD_RATIO")
      .flatMap(_.toDoubleOption).getOrElse(1.5)
    val slack = sys.env.get("SPARK_GRAFT_GUARD_SLACK")
      .flatMap(_.toDoubleOption).getOrElse(0.3)
    val newCeiling = sys.env.get("SPARK_GRAFT_GUARD_NEW_CEILING")
      .flatMap(_.toDoubleOption).getOrElse(5.0)
    val subSecSlack = sys.env.get("SPARK_GRAFT_GUARD_SUBSEC_SLACK")
      .flatMap(_.toDoubleOption).getOrElse(1.2)
    val (lines, failed) = evaluate(latest, baseline, ratio, slack, newCeiling,
      subSecSlack = subSecSlack)
    lines.foreach(println)
    val guarded = queryMap(baseline, "queries").size +
      queryMap(baseline, "extended").size
    // machine-load context of the run being gated (round-14 evidence
    // fields; absent in older payloads)
    val load = "\"loadavg_before\":(-?[0-9.eE+-]+),\"loadavg_after\":(-?[0-9.eE+-]+)".r
      .findFirstMatchIn(latest)
      .map(m => s" loadavg=${m.group(1)}->${m.group(2)}").getOrElse("")
    // round-15 environment evidence: the probe ratio + the CPU count
    // the bench JVM actually saw (a container cap shows up here)
    val env = {
      val procs = "\"procs\":([0-9]+)".r.findFirstMatchIn(latest)
        .map(m => s" procs=${m.group(1)}").getOrElse("")
      val calib = (calibOf(latest), calibOf(baseline)) match {
        case (Some(n), Some(o)) =>
          f" calib=${n}%.0fms/baseline ${o}%.0fms (${n / o}%.2fx)"
        case (Some(n), None) => f" calib=${n}%.0fms (no baseline calib)"
        case _               => ""
      }
      procs + calib
    }
    println(s"BenchGuard: $guarded guarded, $failed failing " +
      s"(ratio=$ratio slack=${slack}s subSecSlack=${subSecSlack}s newCeiling=${newCeiling}s)" +
      load + env)
    if (failed > 0) sys.exit(1)
  }
}
