package graft

import org.apache.spark.sql.functions._

/**
 * Reproducible scale probes behind SURVEY §8.2: synthetic data at 20-200×
 * the bench scale factor, timing the operator families whose behavior at
 * 100 TB depends on shuffle shape rather than kernel speed.
 * `sbt "runMain graft.ScaleProbe [docs] [filter]"` (default 100k
 * documents; the optional second arg runs only probes whose name contains
 * the substring — e.g. `ScaleProbe 1000000 curation` for the 1M-doc
 * curation memory-cliff probe without the unrelated families).
 */
object ScaleProbe {

  /** Synthetic probe corpus (shared with [[DecadeProbe]]): ~60-word
    * docs over a 500-word vocabulary; 1-in-20 documents are
    * near-duplicates (3 trailing words changed) of the preceding doc —
    * the planted signal the LSH/PassJoin pipelines must find. */
  private[graft] def syntheticCorpus(
      spark: org.apache.spark.sql.SparkSession, nDocs: Int): org.apache.spark.sql.DataFrame = {
    val words = (0 until 500).map(i => s"w$i")
    spark.range(nDocs).select(
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
  }

  /** Deterministic synthetic 64-dim vectors (shared with
    * [[DecadeProbe]]): mix64-derived components in [−1, 1). */
  private[graft] def syntheticVectors(
      spark: org.apache.spark.sql.SparkSession, nVec: Long): org.apache.spark.sql.DataFrame =
    spark.range(nVec).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => (operators.mix64(col("id") * 64 + j, 23L).cast("double") /
          lit(9.223372036854776e18)).cast("float")).as("embedding"))

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(100000)
    val only = args.lift(1)
    val spark = GraftSession.local(32)
    import spark.implicits._

    def time[T](name: String)(f: => T): Option[T] = {
      if (only.exists(s => !name.contains(s))) None
      else {
        val t0 = System.nanoTime()
        val r = f
        println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
        Some(r)
      }
    }

    val docs = syntheticCorpus(spark, nDocs).cache()
    println(s"corpus: ${docs.count()} docs")

    val pairs = time(s"minhash LSH candidate pairs, $nDocs docs") {
      operators.Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5).count()
    }
    pairs.foreach(p => println(s"  pairs found: $p (planted: ~${nDocs / 20})"))

    time(s"verified near-dup + clusters, $nDocs docs") {
      val p = operators.Dedup.verifiedNearDupPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.7)
      operators.Dedup.duplicateClusters(docs.select(col("doc_id")), p).count()
    }

    // OPH vs k-hash signature scan: the claim is the SIGNATURE pass
    // shrinks (one hash per shingle instead of 16), and recall on the
    // planted near-dups survives densification. Both passes are forced
    // through the same count-over-sig-array so only the kernel differs.
    val ophPairs = time(s"oph LSH candidate pairs, $nDocs docs") {
      operators.Dedup.ophCandidatePairs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5).count()
    }
    ophPairs.foreach(p => println(s"  oph pairs found: $p (planted: ~${nDocs / 20})"))
    time(s"minhash signature scan alone (16-hash), $nDocs docs") {
      docs.select(operators.Dedup.minhashSignature(col("text"), 3, 16).as("sig"))
        .agg(max(element_at(col("sig"), 1))).head()
    }
    time(s"oph signature scan alone (1-hash), $nDocs docs") {
      docs.select(operators.Dedup.ophSignature(col("text"), 3, 16).as("sig"))
        .agg(max(element_at(col("sig"), 1))).head()
    }

    // containment growth curve: candidate volume is Σ prefix-gram dfs,
    // so wall time should track the corpus near-linearly (run at 1× and
    // 4× docs to see the curve); 1-in-20 planted truncations are the
    // contained pairs the probe must find
    time(s"containment pairs (prefix filter), $nDocs docs") {
      val aug = docs.select(col("doc_id"), col("text"))
        .unionAll(docs.where(pmod(col("doc_id"), lit(20)) === 2)
          .select((col("doc_id") + 100000000L).as("doc_id"),
            concat_ws(" ", slice(split(col("text"), " "), 1, 15)).as("text")))
      val n = operators.Dedup.containmentPairs(aug, "doc_id", "text",
        shingleSize = 3, threshold = 0.9).count()
      println(s"  containment pairs: $n (planted: ~${nDocs / 20})")
      n
    }

    // edit-distance growth curve: probe volume is ~(d+1)² substrings per
    // string per OCCURRING partner length, candidates are exact-segment
    // key collisions — wall time should track the corpus near-linearly
    // while the planted 1-in-20 single-word edits stay found (the
    // near-dup docs differ in 3 trailing words ≈ well within d on the
    // 120-char prefix)
    time(s"edit-distance pairs (PassJoin), $nDocs docs") {
      val titled = docs.select(col("doc_id"),
        substring(col("text"), 1, 120).as("t"))
      val n = operators.Dedup.editDistancePairs(titled, "doc_id", "t",
        maxDist = 8).count()
      println(s"  edit-distance pairs: $n")
      n
    }

    // token-level edit-distance growth curve: whole 60-token sequences,
    // d=4 — the planted 1-in-20 partners differ in their 3 trailing
    // tokens (token distance exactly 3), so segments 1..4 of the 5-way
    // token partition match verbatim and the pairs must all be found;
    // candidate volume is token-subarray key collisions, near-linear
    val tokPairs = time(s"token edit-distance pairs (PassJoin over tokens), $nDocs docs") {
      val toked = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      val n = operators.Dedup.tokenEditDistancePairs(toked, "doc_id", "toks",
        maxDist = 4).count()
      n
    }
    tokPairs.foreach(n =>
      println(s"  token edit-distance pairs: $n (planted: ~${nDocs / 20})"))

    // index-anchored token screen: the corpus segment index is built
    // ONCE (cost scales with the corpus), then a FIXED 500-row batch
    // screens against it — the probed claim is that the per-batch cost
    // is driven by the batch and its pruned index partitions, not by a
    // corpus re-scan (compare the batch time across 1x/4x/16x corpus
    // runs: build grows, screen should stay near-flat)
    time(s"token screen INDEX BUILD, $nDocs docs") {
      val toked = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      operators.Dedup.buildTokenScreenIndex(toked, "doc_id", "toks",
        maxDist = 4, "/tmp/graft_probe_tokidx")
    }
    val idxScreen = time(s"token screen INDEXED BATCH (500 rows), $nDocs docs") {
      val batch = docs.where(col("doc_id") < 500)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          concat(split(col("text"), " "),
            typedlit(Seq("qq", "ww"))).as("toks"))
      operators.Dedup.tokenEditDistanceScreenIndexed(
        batch, "doc_id", "toks", "/tmp/graft_probe_tokidx")
        .where(col("matched")).count()
    }
    idxScreen.foreach(n =>
      println(s"  indexed-screen matches: $n (planted: 500 within d=2 of their source)"))
    // the trickle case: 10 rows — the (lap, sbk) partition pruning must
    // keep this near-constant in corpus size
    val idxTrickle = time(s"token screen INDEXED TRICKLE (10 rows), $nDocs docs") {
      val batch = docs.where(col("doc_id") < 10)
        .select((col("doc_id") + 900000000L).as("doc_id"),
          concat(split(col("text"), " "),
            typedlit(Seq("qq", "ww"))).as("toks"))
      operators.Dedup.tokenEditDistanceScreenIndexed(
        batch, "doc_id", "toks", "/tmp/graft_probe_tokidx")
        .where(col("matched")).count()
    }
    idxTrickle.foreach(n => println(s"  trickle matches: $n (planted: 10)"))

    // unigram segmentation: vocab derivation runs on the DISTINCT-word
    // domain (500 words here regardless of nDocs), segmentation is one
    // narrow scan with the vocab as plan-literal — cost must be
    // corpus-scan-plus-constant, the bpeTrain contract
    time(s"unigram vocab+segment, $nDocs docs") {
      operators.TextOps.unigramSegment(docs, "doc_id", "text")
        .agg(sum(col("n_pieces")), sum(col("cost_fp"))).collect()
    }

    time(s"single-scan curation, $nDocs docs") {
      operators.Curation.curate(docs, "doc_id", "text").count()
    }

    time(s"PII redaction, $nDocs docs") {
      docs.select(operators.TextOps.redactPii(
          concat(col("text"), lit(" user"), col("doc_id"), lit("@example.com"))).as("c"))
        .selectExpr("max(length(c))").collect()
    }

    // hashed linear classifier: 60-token docs → 119 features each, one
    // narrow scan — the probe pins scan-speed (linear) scaling
    time(s"quality classifier, $nDocs docs") {
      operators.TextOps.qualityClassify(docs, "doc_id", "text")
        .selectExpr("sum(CASE WHEN keep THEN 1 ELSE 0 END)", "avg(score)").collect()
    }

    // trained NB: corpus-side feature explode + broadcast weight join +
    // per-doc ordered fold (the lmPerplexity plan shape); the label here
    // is metadata — the probe times the plan, not model quality
    time(s"trained NB classifier, $nDocs docs") {
      operators.TextOps.nbClassify(
          docs.where(col("doc_id") % 2 =!= 0),
          docs.where(col("doc_id") % 2 === 0)
            .withColumn("y", col("doc_id") % 3 === 0),
          "doc_id", "text", "y")
        .selectExpr("sum(CASE WHEN keep THEN 1 ELSE 0 END)", "avg(score)").collect()
    }

    // BM25: two scans + singleton stats broadcast + TakeOrdered heap
    // merge — the probe pins scan-dominated (linear) scaling
    time(s"BM25 top-k retrieval, $nDocs docs") {
      operators.TextOps.bm25TopK(docs, "doc_id", "text",
        Seq("w11", "w42", "w123", "w321"), k = 50).count()
    }

    // BPE: ONE corpus scan to word counts, then every round runs on the
    // distinct-word vocab (fixed 500 words here regardless of nDocs) —
    // training cost must be corpus-scan-plus-constant, and segmentation
    // a second narrow scan with the per-task word memo
    time(s"BPE train (8 merges) + segment, $nDocs docs") {
      val m = operators.TextOps.bpeTrain(docs, "text", numMerges = 8)
      operators.TextOps.bpeSegment(docs, "doc_id", "text", m)
        .selectExpr("sum(bpe_tokens)").collect()
    }

    // the PRODUCTION route past the one-job-per-merge wall: ONE
    // histogram job, then the merge loop runs driver-local over the
    // pair->words index — ≥1k merges must land in bounded wall
    // (the distributed learner's 8 merges above already cost ~8 jobs;
    // 1000 merges through it would be ~1000)
    // (the shared 500-word corpus exhausts at ~500 merges, so the 1k-
    // merge probe gets a vocab-rich input: 200k distinct alphanumeric
    // words — the Heaps-law shape a real corpus histogram has)
    val bigMerges = time(s"BPE train LOCAL (1000 merges), $nDocs docs") {
      val rich = spark.range(200000).select(
        concat(lit("tok"),
          operators.mix64(col("id"), 7L).cast("string")).as("text"))
      operators.TextOps.bpeTrainLocal(rich, "text", numMerges = 1000)
    }
    bigMerges.foreach(m =>
      println(s"  local learner merges: ${m.length} of 1000 requested"))

    // inter-frame video: every frame decodes (delta carry), every 2nd
    // emits — narrow flatMap, scales with executors
    time(s"AVI RLE8 inter-frame decode, ${nDocs / 10} clips") {
      operators.Multimodal.sampleAviFrames(spark,
        operators.Multimodal.syntheticAviBlobs(spark,
          docs.where(col("doc_id") % 10 === 0).select(col("doc_id"))),
        stride = 2).count()
    }

    // incremental near-dup screen: a 10% batch (half perturbed near-dups
    // of corpus docs, half novel) against the other 90% as corpus — the
    // ingestion-shaped asymmetry the operator is designed for
    time(s"incremental near-dup screen, ${nDocs / 10}-doc batch vs ${nDocs * 9 / 10}-doc corpus") {
      val corpus = docs.where(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"), col("text"))
      val batch = docs.where(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 10000000L).as("doc_id"),
          concat(col("text"), lit(" tail")).as("text"))
        .unionAll(docs.where(col("doc_id") % 20 === 10)
          .select((col("doc_id") + 20000000L).as("doc_id"),
            concat(lit("novel "), col("doc_id"), lit(" "), reverse(col("text"))).as("text")))
      operators.Dedup.incrementalNearDup(batch, corpus, "doc_id", "text",
          threshold = 0.7)
        .selectExpr("sum(CASE WHEN keep THEN 1 ELSE 0 END)").collect()
    }

    // fixed-point PageRank: synthetic edges from the doc graph (each doc
    // links to 3 hash-derived peers); 5 Pregel rounds, rank table only
    time(s"PageRank (5 rounds), $nDocs nodes x 3 edges") {
      val edges = docs.select(col("doc_id").as("src"),
          explode(array((1 to 3).map(j =>
            pmod(operators.mix64(col("doc_id") * 7 + j, 99L), lit(nDocs.toLong))): _*))
            .as("dst"))
      operators.Graph.pageRankFixed(edges, "src", "dst", iterations = 5)
        .selectExpr("sum(rank)").collect()
    }

    // DSIR: train-once cost vs the two scoring paths — the fused kernel
    // (weights as plan literals, zero Exchange) should approach scan
    // speed while the aggregation path pays the feature explode +
    // per-doc groupBy; both scans score the full corpus
    {
      val dsirCorpus = docs.where(col("doc_id") % 20 =!= 0)
      val dsirTarget = docs.where(col("doc_id") % 20 === 0)
      val trainName = s"DSIR train, $nDocs docs vs 1-in-20 target"
      val fusedName = s"DSIR FUSED scoring, $nDocs docs (kernel weight table)"
      def selected(n: String) = !only.exists(s => !n.contains(s))
      // the fused probe depends on the trained model; when the filter
      // selects the fused probe but not the train probe, train UNTIMED
      // so the requested probe still runs (the invidx-family contract,
      // without its silent-skip failure mode)
      val model = time(trainName) {
        operators.Curation.dsirTrain(dsirCorpus, dsirTarget, "doc_id", "text")
      }.orElse(if (selected(fusedName))
        Some(operators.Curation.dsirTrain(dsirCorpus, dsirTarget, "doc_id", "text"))
      else None)
      model.foreach { m =>
        time(fusedName) {
          operators.Curation.dsirScoreFused(dsirCorpus, "doc_id", "text", m)
            .agg(sum(col("n_feats")), sum(col("w_feat"))).collect()
        }
      }
      time(s"DSIR AGGREGATION path, same input (explode + groupBy)") {
        operators.Curation.dsirWeights(dsirCorpus, dsirTarget, "doc_id", "text")
          .agg(sum(col("n_feats")), sum(col("w_feat"))).collect()
      }
    }

    // full crawl link-graph chain (the q_link_graph shape at probe
    // scale): synthetic pages → regex anchor extraction → registered-
    // domain edges → 5 integer PageRank rounds. Distinct from the
    // PageRank probe above: this one is dominated by the page-side
    // regex scan + the edge distinct, the costs that grow with corpus
    // size while the rank iterations stay domain-bounded
    time(s"linkgraph end-to-end, $nDocs pages -> domain PageRank (5 rounds)") {
      val pages = docs.select(col("doc_id"),
        operators.Web.syntheticUrl(col("doc_id"), col("source")).as("url"),
        operators.Web.syntheticLinkPage(col("doc_id"), col("source")).as("html"))
      operators.Graph.pageRankFixed(
          operators.Web.domainEdges(pages, "doc_id", "url", "html"),
          "src_domain", "dst_domain", iterations = 5)
        .selectExpr("count(*)", "sum(rank)").collect()
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

    // duplicate spans: each planted near-dup shares its first 57 tokens
    // with its source, a 57-token span → 50 duplicated 8-gram starts in
    // BOTH partners, so ~nDocs/10 docs must report max_run >= 50
    val spanHits = time(s"duplicate spans (8-gram), $nDocs docs") {
      operators.Dedup.duplicateSpans(docs, "doc_id", "text", width = 8)
        .where(col("max_run") >= 50).count()
    }
    spanHits.foreach(h => println(s"  docs with a >=50-token span: $h (planted: ~${nDocs / 10})"))

    time(s"duplicate span removal, $nDocs docs") {
      operators.Dedup.removeDuplicateSpans(docs, "doc_id", "text", width = 8)
        .selectExpr("sum(removed_tokens)", "sum(kept_tokens)").collect()
    }

    // keepFirst swaps the coverage distinct for a groupBy(doc,pos)
    // max(protected) — same single (doc,pos)-keyed exchange, so the
    // keep-one mode must cost ~the same as remove-all
    time(s"duplicate span removal keepFirst, $nDocs docs") {
      operators.Dedup.removeDuplicateSpans(docs, "doc_id", "text", width = 8,
          keepFirst = true)
        .selectExpr("sum(removed_tokens)", "sum(kept_tokens)").collect()
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
    val emb = syntheticVectors(spark, nVec)
    lazy val qv = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    time(s"PQ ADC train+encode+scan, $nVec synthetic 64-dim vectors") {
      operators.Similarity.pqTopK(emb, "vec_id", "embedding", qv, 20).count()
    }

    time(s"IVF+PQ train+assign+encode+scan, $nVec synthetic 64-dim vectors") {
      operators.Similarity.ivfPqTopK(emb, "vec_id", "embedding", qv, 20).count()
    }

    // HNSW: per-partition graph build dominates (O(n·ef·M) inserts);
    // search + rerank are candidate-bounded. More partitions = smaller
    // graphs built in parallel — the knob a 1000-executor cluster turns.
    time(s"HNSW build+search+rerank, $nVec synthetic 64-dim vectors, 32 partition graphs") {
      val r = operators.Similarity.hnswTopK(emb, "vec_id", "embedding", qv, 20,
        m = 16, efConstruction = 64, efSearch = 96, nParts = 32)
        .collect()
      require(r.length == 20 && r.head.getLong(0) == 0L, "self-retrieval failed")
      r.length
    }

    // persisted HNSW: the amortization claim measured — one build pays
    // for arbitrarily many queries that only load + walk the stored
    // graphs (compare the two numbers: query << build)
    if (only.forall(s => "HNSW indexed".contains(s))) {
      val idxDir = java.nio.file.Files.createTempDirectory("graft-probe-hnswidx")
      try {
        time(s"HNSW indexed BUILD, $nVec vectors, 32 partition graphs") {
          operators.Similarity.buildHnswIndex(emb, "vec_id", "embedding",
            idxDir.toString, m = 16, efConstruction = 64, nParts = 32)
        }
        time(s"HNSW indexed QUERY (load + walk stored graphs), $nVec vectors") {
          val r = operators.Similarity.hnswTopKIndexed(spark, idxDir.toString,
            qv, 20, efSearch = 96, idOut = "vec_id").collect()
          require(r.length == 20 && r.head.getLong(0) == 0L, "self-retrieval failed")
        }
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(idxDir)
        try walk.iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }

    // incremental appends: the O(new) ingestion claim measured — build
    // the index over 90% of the ids, append the top 10%, and compare
    // against the full rebuild (append should cost FAR less; by the
    // strictly-increasing-id contract the layouts are bit-identical)
    if (only.forall(s => "HNSW append".contains(s))) {
      val idxDir = java.nio.file.Files.createTempDirectory("graft-probe-hnswapp")
      try {
        val cut = (nVec * 9L) / 10L
        time(s"HNSW append BASE build, ${cut} vectors, 32 partition graphs") {
          operators.Similarity.buildHnswIndex(emb.where(col("vec_id") < cut),
            "vec_id", "embedding", idxDir.toString,
            m = 16, efConstruction = 64, nParts = 32)
        }
        time(s"HNSW append of ${nVec - cut} arrivals (load + insert only the new)") {
          operators.Similarity.appendToHnswIndex(emb.where(col("vec_id") >= cut),
            "vec_id", "embedding", idxDir.toString)
        }
        time(s"HNSW append baseline: FULL rebuild of all $nVec (the cost avoided)") {
          operators.Similarity.buildHnswIndex(emb, "vec_id", "embedding",
            idxDir.toString, m = 16, efConstruction = 64, nParts = 32)
        }
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(idxDir)
        try walk.iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }

    // persisted IVF+PQ: the cheapest-append claim measured — frozen
    // centroids + codebooks make an append ONE assign+encode map with
    // mode(append), so append cost should track arrivals, not the
    // corpus (compare against the full re-encode), and the pruned
    // ADC query reads nProbe/nCells of a CODE-sized layout
    if (only.forall(s => "IVFPQ append".contains(s))) {
      val idxDir = java.nio.file.Files.createTempDirectory("graft-probe-ivfpqapp")
      try {
        val cut = (nVec * 9L) / 10L
        val tr = time(s"IVFPQ append BASE build+encode, ${cut} vectors") {
          operators.Similarity.buildIvfPqIndex(emb.where(col("vec_id") < cut),
            "vec_id", "embedding", idxDir.toString)
        }
        time(s"IVFPQ append of ${nVec - cut} arrivals (one assign+encode map)") {
          operators.Similarity.appendToIvfPqIndex(emb.where(col("vec_id") >= cut),
            "vec_id", "embedding", idxDir.toString)
        }
        time(s"IVFPQ appended-index QUERY (pruned ADC scan of the code layout)") {
          val r = operators.Similarity.ivfPqTopKIndexed(spark, idxDir.toString,
            qv, 20, idOut = "vec_id").collect()
          require(r.length == 20, s"expected 20 rows, got ${r.length}")
        }
        time(s"IVFPQ append baseline: FULL re-encode of all $nVec (the cost avoided)") {
          operators.Similarity.buildIvfPqIndex(emb, "vec_id", "embedding",
            idxDir.toString, trained = tr.orNull)
        }
      } finally {
        import scala.jdk.CollectionConverters._
        val walk = java.nio.file.Files.walk(idxDir)
        try walk.iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }

    // batch retrieval at eval-set scale: a query SET of nDocs/5 against
    // the nVec corpus — the regime the driver-capped single-batch shape
    // cannot reach. Batched = ceil(M/batchSize) corpus scans; by-cell =
    // one Exchange of each side on the cell id, driver never touches data
    val knnQueries = emb.where(col("vec_id") % 50 === 0) // nVec/50 = nDocs/5
    time(s"kNN join batched, ${nVec / 50} queries x $nVec corpus, k=10 (bs=8192)") {
      operators.Similarity.knnJoinBatched(emb, "vec_id", "embedding",
        knnQueries, "vec_id", "embedding", k = 10, batchSize = 8192)
        .agg(count(lit(1)), sum(col("cos"))).collect()
    }
    time(s"kNN join by-cell (IVF, nCells=64, nProbe=8), ${nVec / 50} queries x $nVec corpus, k=10") {
      operators.Similarity.knnJoinByCell(emb, "vec_id", "embedding",
        knnQueries, "vec_id", "embedding", k = 10, nCells = 64, nProbe = 8)
        .agg(count(lit(1)), sum(col("cos"))).collect()
    }

    // IVF+PQ recall sweep (SURVEY §8.2 parameter table): recall@20 of the
    // ADC scan (vs the exact inner-product top-20 — ADC approximates the
    // dot) and of the exact re-rank (vs the exact COSINE top-20 — the
    // re-rank ranks by cosine), across nProbe and m at fixed nCells=16.
    // The corpus is CLUSTERED — 2048 latent centroids × ~25 members, the
    // regime real embeddings live in and the one PQ is built for: the
    // true top-20 is essentially the query's own small cluster, separated
    // from the rest by far more than the quantization error. Two regimes
    // that make recall@20 meaningless were probed and rejected: uniform
    // random vectors (no structure — recall pinned at 0.45/0.70 even
    // probing ALL cells: pure quantization noise) and few big clusters
    // (ranking WITHIN ~800 near-identical members is decided by noise
    // below the quantization floor — recall ~0 by construction).
    if (only.forall(s => "ivfpq recall sweep".contains(s))) {
      val nSweep = math.max(nDocs / 2, 10000).toLong
      val sweepEmb = spark.range(nSweep).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          j => ((operators.mix64(pmod(col("id"), lit(2048)) * 64 + j, 101L).cast("double") /
              lit(9.223372036854776e18)) +
            (operators.mix64(col("id") * 64 + j, 23L).cast("double") /
              lit(9.223372036854776e18)) * lit(0.15)).cast("float")).as("embedding")).cache()
      sweepEmb.count()
      val q = sweepEmb.where(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val qNorm = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
      val scored = sweepEmb.select(col("vec_id"), col("embedding")).collect()
        .map { r =>
          val v = r.getSeq[Float](1)
          var d = 0.0; var n = 0.0; var i = 0
          while (i < q.length) {
            d += q(i).toDouble * v(i).toDouble
            n += v(i).toDouble * v(i).toDouble
            i += 1
          }
          (r.getLong(0), d, d / (qNorm * math.sqrt(n)))
        }
      val exactDot = scored.sortBy { case (id, d, _) => (-d, id) }.take(20).map(_._1).toSet
      val exactCos = scored.sortBy { case (id, _, c) => (-c, id) }.take(20).map(_._1).toSet
      println(s"IVFPQ RECALL SWEEP ($nSweep vectors, 64-dim, 2048 clusters, nCells=16, k=20, shortlist=100)")
      println("  m  nProbe  recall@20(ADC vs dot)  recall@20(rerank vs cosine)")
      for (m <- Seq(8, 16)) {
        val trained = operators.Similarity.trainIvfPq(
          sweepEmb, "vec_id", "embedding", nCells = 16, m = m)
        for (nProbe <- Seq(1, 2, 4, 8, 16)) {
          val adc = operators.Similarity.ivfPqTopK(sweepEmb, "vec_id", "embedding",
              q, 20, nCells = 16, nProbe = nProbe, m = m, trained = trained)
            .collect().map(_.getLong(0))
          val rr = operators.Similarity.ivfPqRerankTopK(sweepEmb, "vec_id", "embedding",
              q, 20, nCells = 16, nProbe = nProbe, m = m, trained = trained)
            .collect().map(_.getLong(0))
          println(f"  $m%2d  $nProbe%6d  ${adc.count(exactDot.contains) / 20.0}%21.2f  ${rr.count(exactCos.contains) / 20.0}%27.2f")
        }
      }
      sweepEmb.unpersist()
    }

    // sessionize (two window passes over one sort) vs Spark's native
    // session_window aggregate on the SAME input, per-session counts both
    // ways. Both merge on diff <= gap (the native merge is inclusive:
    // probed with a planted diff of exactly 3601 under a "3601 seconds"
    // gap — it merged), so identical gaps must agree exactly.
    val sessEv = spark.range(nEv).select(
      col("id").as("event_id"),
      pmod(operators.mix64(col("id"), 31L), lit(1000)).as("user_id"),
      pmod(operators.mix64(col("id"), 13L), lit(100000000L)).as("t"))
    val nSessLabeled = time(s"sessionize two-pass window → per-session counts, $nEv rows") {
      operators.Joins.sessionize(sessEv, "user_id", "t", "event_id", gap = 3600L)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n"))
        .agg(count(lit(1)), sum(col("n"))).collect()(0).getLong(0)
    }
    val nSessNative = time(s"native session_window aggregate → per-session counts, $nEv rows") {
      sessEv
        .groupBy(col("user_id"),
          session_window(timestamp_seconds(col("t")), "3600 seconds"))
        .agg(count(lit(1)).as("n"))
        .agg(count(lit(1)), sum(col("n"))).collect()(0).getLong(0)
    }
    for (a <- nSessLabeled; b <- nSessNative)
      println(s"  sessions: two-pass=$a native=$b ${if (a == b) "EQUAL" else "MISMATCH"}")

    // event analytics over the same synthetic log: funnel is ONE
    // aggregation pass, retention three bounded-key shuffles, triangles
    // two wedge joins over the (user mod) co-interaction edges
    val funEv = sessEv.withColumn("step",
      element_at(typedlit(Seq("view", "click", "purchase")),
        (pmod(operators.mix64(col("event_id"), 91L), lit(3)) + 1).cast("int")))
    time(s"funnel 3 steps, $nEv rows x 1000 users (one agg pass)") {
      operators.Joins.funnel(funEv, "user_id", "t", "event_id", "step",
          Seq("view", "click", "purchase"))
        .agg(sum(col("steps_reached")), count(lit(1))).collect()
    }
    time(s"retention, $nEv rows, 3600-bucket, offsets<=30") {
      operators.Joins.retention(sessEv, "user_id", "t", bucket = 3600L)
        .agg(sum(col("n_active")), count(lit(1))).collect()
    }
    time(s"triangle counts, ${nEv / 10} edges over 2000 nodes") {
      val ed = spark.range(nEv / 10).select(
        pmod(operators.mix64(col("id"), 3L), lit(2000)).as("s"),
        pmod(operators.mix64(col("id"), 5L), lit(2000)).as("d"))
      operators.Graph.triangleCounts(ed, "s", "d")
        .agg(sum(col("n_triangles")), count(lit(1))).collect()
    }

    val big = nDocs.toLong * 100
    time(s"stratified sample, $big ids x 20 strata") {
      operators.Curation.stratifiedSample(
        spark.range(big).select(col("id").as("doc_id"),
          concat(lit("s"), pmod(col("id"), lit(20))).as("source")),
        "doc_id", "source", perStratum = 1000).count()
    }

    // SemDeDup at scale: 1-in-20 planted near-identical vectors (the
    // pair members share a direction up to a 1e-4 perturbation, so they
    // land in the same cell and clear any high threshold); pair work is
    // bounded per cell (k=256 → ~(n/256)² cosines per cell), never n²
    val nSem = nDocs.toLong
    val semBase = when(pmod(col("id"), lit(20)) === 1, col("id") - 1)
      .otherwise(col("id"))
    val semEmb = spark.range(nSem).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(31)),
        j => ((operators.mix64(semBase * 32 + j, 23L).cast("double") /
            lit(9.223372036854776e18)) +
          when(pmod(col("id"), lit(20)) === 1,
            (operators.mix64(col("id") * 32 + j, 29L).cast("double") /
              lit(9.223372036854776e18)) * lit(1e-4)).otherwise(lit(0.0)))
          .cast("float")).as("embedding"))
    val semDups = time(s"SemDeDup, $nSem 32-dim vectors, k=256, threshold 0.99") {
      operators.Dedup.semDedup(semEmb, "vec_id", "embedding",
          k = 256, threshold = 0.99)
        .where(col("is_dup")).count()
    }
    semDups.foreach(d => println(s"  semantic dups: $d (planted: ~${nSem / 20})"))

    // bigram-LM perplexity: model counts over the 1-in-50 reference
    // slice, the rest scored — token-keyed shuffle joins (Zipf head
    // collapses in the count partials) + per-doc ordered log folds
    time(s"LM perplexity, ${nDocs - nDocs / 50} docs scored vs ${nDocs / 50}-doc reference") {
      operators.TextOps.lmPerplexity(
          docs.where(col("doc_id") % 50 =!= 0),
          docs.where(col("doc_id") % 50 === 0),
          "doc_id", "text")
        .agg(count(lit(1)), avg(col("xent")), sum(col("n_unseen"))).collect()
    }

    // web curation: narrow kernels (URL normalize + HTML extract) should
    // scale linearly at scan speed; the domain cap is probed with a
    // PLANTED 80%-hot domain — the plain window serializes that domain
    // into one task, the salted variant bounds every task
    val pages = docs.select(col("doc_id"),
        operators.Web.syntheticUrl(col("doc_id"), lit("en")).as("url"),
        operators.Web.syntheticHtml(col("doc_id"), col("text")).as("html"))
      .withColumn("url", when(pmod(col("doc_id"), lit(5)) =!= 0,
        concat(lit("http://h"), col("doc_id"), lit(".hotdomain.com/p")))
        .otherwise(col("url")))
      .cache()
    pages.count()
    time(s"URL normalize, $nDocs urls (narrow)") {
      operators.Web.normalizeUrls(pages, "url")
        .agg(count(col("url_norm")), min(length(col("url_norm")))).collect()
    }
    time(s"HTML extract, $nDocs pages (narrow regex chain)") {
      operators.Web.htmlExtract(pages, "doc_id", "html")
        .agg(count(lit(1)), sum(col("n_chars"))).collect()
    }
    time(s"domain cap PLAIN, $nDocs urls, 80%-hot domain (one-task window)") {
      operators.Web.domainCap(pages, "doc_id", "url", 1000L)
        .agg(sum(when(col("keep"), 1L).otherwise(0L))).collect()
    }
    time(s"domain cap SALTED, $nDocs urls, 80%-hot domain (bounded tasks)") {
      operators.Web.domainCapSalted(pages, "doc_id", "url", 1000L)
        .agg(sum(when(col("keep"), 1L).otherwise(0L))).collect()
    }
    pages.unpersist()

    // inverted index: one-time build cost vs per-query cost — the
    // amortization argument in buildInvertedIndex's scaladoc, measured
    val idxDir = java.nio.file.Files.createTempDirectory("graft-probe-invidx")
    try {
      // the three query probes depend on the build, so all four share the
      // "invidx" name prefix (the substring filter either runs the whole
      // family or none of it) AND guard on the build having run
      val built = time(s"invidx BUILD, $nDocs docs (positional, 64 buckets)") {
        operators.TextOps.buildInvertedIndex(docs, "doc_id", "text",
          idxDir.toString, termBuckets = 64)
      }
      val terms = Seq("w1", "w17", "w333", "w499")
      time(s"invidx BM25 SCAN path, $nDocs docs, 4 terms") {
        operators.TextOps.bm25TopK(docs, "doc_id", "text", terms, k = 20).count()
      }
      if (built.isDefined) {
        time(s"invidx BM25 INDEXED path, same query (pruned posting reads)") {
          operators.TextOps.bm25TopKIndexed(spark, idxDir.toString, terms, k = 20).count()
        }
        time(s"invidx phrase search, 2-term phrase") {
          operators.TextOps.phraseSearch(spark, idxDir.toString,
            Seq("w1", "w17")).count()
        }
      }
    } finally {
      val walk = java.nio.file.Files.walk(idxDir)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
      } finally walk.close()
    }

    // KMV: window-sort sketch vs mergeable-aggregator sketch — the
    // exchange carries every distinct hash vs ≤ k per (partition, group)
    time(s"KMV sketch WINDOW path, $nDocs docs x 20 sources, k=128") {
      operators.Curation.kmvDistinct(
        operators.Curation.kmvSketch(
          docs.select(col("source"), explode(split(col("text"), " ")).as("tok")),
          "source", "tok", 128), 128).count()
    }
    time(s"KMV sketch AGGREGATOR path, same input") {
      operators.Curation.kmvDistinct(
        operators.Curation.kmvSketchAgg(
          docs.select(col("source"), explode(split(col("text"), " ")).as("tok")),
          "source", "tok", 128), 128).count()
    }

    spark.stop()
  }
}
