package graft

import org.apache.spark.sql.functions._

/**
 * Reproducible scale probes behind SURVEY §8.2: synthetic data at 20-200×
 * the bench scale factor, timing the operator families whose behavior at
 * 100 TB depends on shuffle shape rather than kernel speed.
 * `sbt "runMain graft.ScaleProbe [docs]"` (default 100k documents).
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = GraftSession.local(32)
    import spark.implicits._

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // synthetic corpus: 1-in-20 documents are near-duplicates (3 words
    // changed out of ~60) of the preceding doc — the planted signal the
    // LSH pipeline must find
    val words = (0 until 500).map(i => s"w$i")
    val docs = spark.range(nDocs).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 60).map(j =>
          element_at(typedlit(words),
            (pmod(operators.mix64(col("id") * 61 + j, 17L), lit(500)) + 1).cast("int"))): _*)
          .as("text"),
        concat(lit("src"), pmod(col("id"), lit(20))).as("source"))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(20)) === 1,
          // near-dup of doc_id-1: same word choices except the last 3 slots
          concat_ws(" ", (0 until 57).map(j =>
            element_at(typedlit(words),
              (pmod(operators.mix64((col("doc_id") - 1) * 61 + j, 17L), lit(500)) + 1).cast("int"))) ++
            Seq(lit("x"), lit("y"), lit("z")): _*))
          .otherwise(col("text")))
      .cache()
    println(s"corpus: ${docs.count()} docs")

    val pairs = time(s"minhash LSH candidate pairs, $nDocs docs") {
      operators.Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5).count()
    }
    println(s"  pairs found: $pairs (planted: ~${nDocs / 20})")

    time(s"verified near-dup + clusters, $nDocs docs") {
      val p = operators.Dedup.verifiedNearDupPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.7)
      operators.Dedup.duplicateClusters(docs.select(col("doc_id")), p).count()
    }

    time(s"single-scan curation, $nDocs docs") {
      operators.Curation.curate(docs, "doc_id", "text").count()
    }

    time(s"PII redaction, $nDocs docs") {
      docs.select(operators.TextOps.redactPii(
          concat(col("text"), lit(" user"), col("doc_id"), lit("@example.com"))).as("c"))
        .selectExpr("max(length(c))").collect()
    }

    // line dedup probe: re-line every 8 tokens; the planted near-dups
    // share 7 of 8 aligned lines with their source doc, so the common-line
    // set is ~nDocs/20 * 7 lines — the broadcast side the plan relies on
    val toksP = split(col("text"), " ")
    val relinedDocs = docs.select(col("doc_id"),
      concat_ws("\n",
        transform(sequence(lit(0), floor((size(toksP) - 1) / lit(8)).cast("int")),
          i => concat_ws(" ", slice(toksP, i * 8 + 1, lit(8))))).as("t2"))
    time(s"line-level corpus dedup, $nDocs docs") {
      operators.Dedup.dedupLines(relinedDocs, "doc_id", "t2", minDocs = 2)
        .selectExpr("sum(dropped_lines)", "sum(kept_lines)").collect()
    }

    time(s"Gopher repetition stats, $nDocs docs") {
      operators.TextOps.repetitionStats(relinedDocs, "doc_id", "t2")
        .where(col("gopher_ok")).count()
    }

    time(s"decontamination vs ${nDocs / 50}-doc benchmark, $nDocs docs") {
      operators.Curation.decontaminate(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "doc_id", "text", n = 8)
        .where(col("contaminated")).count()
    }

    // Bloom vs exact decontamination on the SAME input, with a benchmark
    // side big enough to matter (20% of the corpus ≈ nDocs/5 × ~53 grams,
    // >1M grams at the default size): the exact path must distinct +
    // broadcast that gram set; the Bloom path folds it into a 2 MiB
    // filter with no shuffle and scans the corpus with no join
    val bigBenchTrain = docs.where(col("doc_id") % 5 =!= 0)
    val bigBench = docs.where(col("doc_id") % 5 === 0)
    time(s"exact decontamination vs ${nDocs / 5}-doc benchmark (distinct+broadcast)") {
      operators.Curation.decontaminate(bigBenchTrain, bigBench, "doc_id", "text", n = 8)
        .where(col("contaminated")).count()
    }
    time(s"bloom decontamination vs ${nDocs / 5}-doc benchmark (filter screen)") {
      operators.Bloom.decontaminate(bigBenchTrain, bigBench, "doc_id", "text",
          n = 8, numBits = 1L << 24, numHashes = 7)
        .where(col("maybe_contaminated")).count()
    }

    // as-of join at 10× the doc count per side: union-and-carry = one
    // Exchange + one sort regardless of key distribution
    val nEv = nDocs.toLong * 10
    val asofLeft = spark.range(nEv).select(
      col("id").as("event_id"),
      pmod(operators.mix64(col("id"), 31L), lit(1000)).as("user_id"),
      operators.mix64(col("id"), 7L).as("t"))
    val asofRight = spark.range(nEv).select(
      pmod(operators.mix64(col("id"), 57L), lit(1000)).as("user_id"),
      operators.mix64(col("id"), 11L).as("t"),
      col("id").as("quote_id"))
    // aggregate OVER the matched column: a bare count() would let the
    // optimizer prune the unused Window and measure only the union scan
    time(s"asof join, $nEv x $nEv rows, 1000 uniform keys") {
      operators.Joins.asofJoin(asofLeft, asofRight, "user_id", "t", "quote_id")
        .agg(count(col("asof_t")), sum(col("quote_id"))).collect()
    }
    // skew probe: one key holds 50% of BOTH sides. The operator's cost
    // model is sort-dominated; a hot key concentrates one sorted run in
    // one task (windows cannot split a partition), so this measures the
    // realistic worst case rather than hiding it
    time(s"asof join, $nEv x $nEv rows, one key holding 50% of rows") {
      operators.Joins.asofJoin(
        asofLeft.withColumn("user_id",
          when(col("event_id") % 2 === 0, lit(0L)).otherwise(col("user_id"))),
        asofRight.withColumn("user_id",
          when(col("quote_id") % 2 === 0, lit(0L)).otherwise(col("user_id"))),
        "user_id", "t", "quote_id")
        .agg(count(col("asof_t")), sum(col("quote_id"))).collect()
    }

    // extreme-skew probe: 90% of BOTH sides on one key. The unsalted
    // carry concentrates that key's entire left+right run in ONE window
    // task (windows cannot split a partition — at 100 TB that task IS
    // the job); the salted variant caps per-task volume at ~1/64 of the
    // key via (key, time-bin) partitioning + a tiny boundary fix-up.
    // Both answers are identical (OperatorsSpec sweeps them).
    val skew90L = asofLeft.withColumn("user_id",
      when(pmod(col("event_id"), lit(10)) < 9, lit(0L)).otherwise(col("user_id")))
    val skew90R = asofRight.withColumn("user_id",
      when(pmod(col("quote_id"), lit(10)) < 9, lit(0L)).otherwise(col("user_id")))
    time(s"asof join UNSALTED, $nEv x $nEv rows, one key holding 90%") {
      operators.Joins.asofJoin(skew90L, skew90R, "user_id", "t", "quote_id")
        .agg(count(col("asof_t")), sum(col("quote_id"))).collect()
    }
    time(s"asof join SALTED(64 bins), $nEv x $nEv rows, one key holding 90%") {
      operators.Joins.asofJoinSalted(skew90L, skew90R, "user_id", "t", "quote_id")
        .agg(count(col("asof_t")), sum(col("quote_id"))).collect()
    }

    // broadcast as-of vs union-and-carry on the SAME input: a big left
    // (10× docs) against a SMALL right (docs/10 quotes over 1000 keys).
    // union-and-carry must exchange + sort left+right on the key; the
    // broadcast path binary-searches per-key sorted arrays in a narrow
    // expression — the left side never shuffles
    val bigLeft = spark.range(nEv).select(
      col("id").as("event_id"),
      pmod(operators.mix64(col("id"), 31L), lit(1000)).as("user_id"),
      operators.mix64(col("id"), 7L).as("t"))
    val smallRight = spark.range(nDocs.toLong / 10).select(
      pmod(operators.mix64(col("id"), 57L), lit(1000)).as("user_id"),
      operators.mix64(col("id"), 11L).as("t"),
      col("id").as("quote_id"))
    time(s"asof union-and-carry, $nEv left x ${nDocs / 10} right") {
      operators.Joins.asofJoin(bigLeft, smallRight, "user_id", "t", "quote_id")
        .agg(count(col("asof_t")), sum(col("quote_id"))).collect()
    }
    time(s"asof broadcast, $nEv left x ${nDocs / 10} right (left never shuffles)") {
      operators.Joins.asofJoinBroadcast(bigLeft, smallRight, "user_id", "t", "quote_id")
        .agg(count(col("asof_t")), sum(col("quote_id"))).collect()
    }

    // range join: binned equi-join vs the naive theta-join Spark would
    // otherwise plan (BroadcastNestedLoopJoin — O(points × ranges), so
    // the naive side gets 100× fewer ranges and still loses)
    val nRange = nDocs // 100k ranges at default size
    val rangePts = spark.range(nEv).select(col("id").as("pt_id"),
      pmod(operators.mix64(col("id"), 3L), lit(1000000)).cast("double").as("p"))
    val ranges = spark.range(nRange).select(col("id").as("range_id"),
      pmod(operators.mix64(col("id"), 5L), lit(1000000)).cast("double").as("lo"))
      .withColumn("hi", col("lo") + lit(50.0) +
        pmod(operators.mix64(col("range_id"), 7L), lit(100)).cast("double"))
    time(s"range join binned, $nEv points x $nRange ranges (width 50-150, bin 100)") {
      operators.Joins.rangeJoin(rangePts, ranges, "p", "lo", "hi", binWidth = 100.0)
        .count()
    }
    time(s"range join naive theta, $nEv points x ${nRange / 100} ranges (nested loop)") {
      rangePts.join(ranges.limit(nRange / 100),
        col("p") >= col("lo") && col("p") <= col("hi")).count()
    }

    time(s"char-n-gram langid, $nDocs docs") {
      docs.groupBy(operators.TextOps.langIdNgram(col("text")).as("l"))
        .count().collect()
    }

    time(s"temperature mixing (alpha=0.5), $nDocs docs x 20 sources") {
      operators.Curation.mixSourcesTemperature(docs, "doc_id", "source").count()
    }

    // ANN probes: 10× the doc count in synthetic 64-dim vectors (mix64-
    // derived, deterministic); train + encode + scan end-to-end
    val nVec = nDocs.toLong * 10
    val emb = spark.range(nVec).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (operators.mix64(col("id") * 64 + j, 23L).cast("double") /
          lit(9.223372036854776e18)).cast("float")).as("embedding"))
    val qv = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    time(s"PQ ADC train+encode+scan, $nVec synthetic 64-dim vectors") {
      operators.Similarity.pqTopK(emb, "vec_id", "embedding", qv, 20).count()
    }

    time(s"IVF+PQ train+assign+encode+scan, $nVec synthetic 64-dim vectors") {
      operators.Similarity.ivfPqTopK(emb, "vec_id", "embedding", qv, 20).count()
    }

    val big = nDocs.toLong * 100
    time(s"stratified sample, $big ids x 20 strata") {
      operators.Curation.stratifiedSample(
        spark.range(big).select(col("id").as("doc_id"),
          concat(lit("s"), pmod(col("id"), lit(20))).as("source")),
        "doc_id", "source", perStratum = 1000).count()
    }

    spark.stop()
  }
}
