package graft

import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Tests for the training-pipeline operators: dedup family, similarity
  * search, text analysis, multimodal plumbing. */
class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  test("exact dedup groups identical content") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val got = Dedup.exactDuplicates(df, "text", "doc_id")
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.toSeq == Seq((1L, 3L), (2L, 1L))) // keep_id → dup_cnt
  }

  test("duplicate spans: planted shared substrings, runs merge, short docs zero") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"),   // shares "c d e f" with 2 and "a b c" with 4
      (2L, "x y c d e f z w"),
      (3L, "p q r s t u v"),     // nothing shared
      (4L, "a b c q q q a b c"), // same gram twice (two 1-gram runs)
      (5L, "t u")                // shorter than width → no grams at all
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(df, "doc_id", "text", width = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: dup gram starts {0, 2, 3} → runs [0] (3 toks) + [2,3] (4 toks)
    assert(got(1L) == ((3L, 2L, 4L)))
    assert(got(2L) == ((2L, 1L, 4L)))
    assert(got(3L) == ((0L, 0L, 0L)))
    // doc 4: "a b c" at 0 and 6 — two separate runs of the same gram
    assert(got(4L) == ((2L, 2L, 3L)))
    assert(got(5L) == ((0L, 0L, 0L)))
    assert(got.size == 5)
  }

  test("duplicate span removal: covered tokens cut, order kept, full-dup doc empties") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"),   // "c d e" + "d e f" dup with 2; "a b c" with 4
      (2L, "x y c d e f z w"),
      (3L, "p q r s t u v"),
      (4L, "a b c"),             // every token covered → fully removed
      (5L, "t u")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(df, "doc_id", "text", width = 3)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: covered = {0,1,2} ∪ {2..5} = 0..5 → keeps "g h"
    assert(got(1L) == (("g h", 2L, 6L)))
    // doc 2: covered = 2..5 → keeps "x y z w" (order preserved across the gap)
    assert(got(2L) == (("x y z w", 4L, 4L)))
    assert(got(3L) == (("p q r s t u v", 7L, 0L)))
    assert(got(4L) == (("", 0L, 3L)))
    assert(got(5L) == (("t u", 2L, 0L)))
  }

  test("duplicate span removal keepFirst: min-id doc keeps its copy, others shed") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y c d e f z w"),
      (3L, "p q r s t u v"),
      (4L, "a b c"),
      (5L, "t u")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(df, "doc_id", "text", width = 3, keepFirst = true)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1 is min-id for every gram it shares → keeps everything
    assert(got(1L) == (("a b c d e f g h", 8L, 0L)))
    assert(got(2L) == (("x y z w", 4L, 4L)))
    assert(got(3L) == (("p q r s t u v", 7L, 0L)))
    // doc 4 sheds its copy of "a b c" — doc 1 already carries it
    assert(got(4L) == (("", 0L, 3L)))
    assert(got(5L) == (("t u", 2L, 0L)))
  }

  test("keepFirst: overlapping grams with different keepers never destroy all copies") {
    val s = spark
    import s.implicits._
    // gram "a b" has keeper doc 1, gram "b y" has keeper doc 2; the two
    // overlap on doc 2's token "b". A naive covered-by-a-foreign-keeper
    // rule would shed doc 2's {0,1} for "a b" and destroy the only kept
    // copy of "b y" — the protected-position rule must keep it intact
    val df = Seq(
      (1L, "x a b"),
      (2L, "a b y"),
      (3L, "x a b y"),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(df, "doc_id", "text", width = 2, keepFirst = true)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1 is keeper of "x a" and "a b" → fully protected
    assert(got(1L) == (("x a b", 3L, 0L)))
    // doc 2: pos 0 ("a") covered only by foreign-keeper "a b" → shed;
    // pos 1 ("b") covered by both, protected by its own "b y" → kept
    assert(got(2L) == (("b y", 2L, 1L)))
    // doc 3 keeps nothing — every position is foreign-keeper covered
    assert(got(3L) == (("", 0L, 4L)))
    // a null-text doc reports 0 removed (not the non-ANSI size() -1)
    assert(got(4L) == (("", 0L, 0L)))
    // every duplicated substring still exists somewhere in the corpus
    val texts = got.values.map(_._1).toSeq
    for (gram <- Seq("x a", "a b", "b y"))
      assert(texts.exists(_.contains(gram)), s"gram '$gram' destroyed")
  }

  test("token_grams: positional grams, empty-token parity with split, width edge") {
    val s = spark
    import s.implicits._
    val df = Seq(("a  b c", 0)).toDF("text", "i")
    // split("a  b c", " ") = ["a", "", "b", "c"] — grams keep the empties
    val grams = df.select(Dedup.posGrams(col("text"), 2).as("g"))
      .collect()(0).getSeq[String](0)
    assert(grams == Seq("a ", " b", "b c"))
    val exact = df.select(Dedup.posGrams(col("text"), 4).as("g"))
      .collect()(0).getSeq[String](0)
    assert(exact == Seq("a  b c"))
    val none = df.select(Dedup.posGrams(col("text"), 5).as("g"))
      .collect()(0).getSeq[String](0)
    assert(none.isEmpty)
    val nul = df.select(Dedup.posGrams(lit(null).cast("string"), 2).as("g"))
      .collect()(0)
    assert(nul.isNullAt(0))
  }

  test("cosine_similarity exact on known vectors") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (Array(1.0f, 2.0f), Array(2.0f, 4.0f))
    ).toDF("a", "b")
    val got = df.select(cosine_similarity(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
    // zero vector and length mismatch → NULL
    val nulls = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f)))
      .toDF("a", "b")
      .select(cosine_similarity(col("a"), col("b"))).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("fnv1a64 known test vectors") {
    val s = spark
    import s.implicits._
    val got = Seq("", "a", "hello").toDF("t")
      .select(fnv1a64(col("t"))).collect().map(_.getLong(0))
    // published FNV-1a 64 vectors
    assert(got(0) == 0xcbf29ce484222325L)
    assert(got(1) == 0xaf63dc4c8601ec8cL)
    assert(got(2) == 0xa430d84680aabd0bL)
  }

  test("simhash: identical docs equal, near docs close, far docs far") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val near = base.replace("dog", "cat")
    val far = "completely different words appear here nothing shared at all today"
    val got = Seq(base, base, near, far).toDF("text")
      .select(Dedup.simhash(col("text"))).collect().map(_.getLong(0))
    assert(got(0) == got(1))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(got(0), got(2)) < hamming(got(0), got(3)))
  }

  test("minhash signature estimates jaccard") {
    val s = spark
    import s.implicits._
    val a = (1 to 40).map(i => s"tok$i").mkString(" ")
    val b = (1 to 30).map(i => s"tok$i").mkString(" ") + " " +
      (100 to 109).map(i => s"tok$i").mkString(" ") // true J = 30/50 = 0.6
    val df = Seq(a, b).toDF("text")
      .select(Dedup.minhashSignature(col("text"), 1, 64).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs(0).length == 64)
    val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y } / 64.0
    assert(est > 0.3 && est < 0.9, s"estimate $est")
    // determinism across evaluations
    val again = df.collect().map(_.getSeq[Long](0))
    assert(again(0) == sigs(0))
  }

  test("minhash LSH candidate pairs find planted near-dups") {
    val s = spark
    import s.implicits._
    val doc = (1 to 50).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 48).map(i => s"w$i").mkString(" ") + " x y"
    val other = (200 to 250).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, doc), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(df, "doc_id", "text",
      shingleSize = 2, numHashes = 16, bands = 4, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), pairs.toSeq)
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L), pairs.toSeq)
  }

  test("jaccard exact") {
    val s = spark
    import s.implicits._
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccard(col("x"), col("y"))).collect()(0).getDouble(0)
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("brute force and LSH topk agree on the top hit") {
    val s = spark
    import s.implicits._
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.sin(i * 31 + d * 7).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = vecs(7)._2
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 5).collect()
    assert(bf(0).getLong(0) == 7L) // self is nearest
    assert(math.abs(bf(0).getDouble(1) - 1.0) < 1e-9)
    val lsh = Similarity.lshTopK(df, "vec_id", "embedding", q, 5, planes = 6).collect()
    assert(lsh(0).getLong(0) == 7L)
  }

  test("text stats + quality + langid") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "the cat sat on the mat and it is nice",
      "der hund und die katze sind nicht da",
      "le chat est dans la maison pour une heure",
      "el perro y la casa es una cosa que")
      .toDF("text")
    val langs = df.select(TextOps.langId(col("text"))).collect().map(_.getString(0))
    assert(langs.toSeq == Seq("en", "de", "fr", "es"), langs.toSeq)

    val stats = df.limit(1).select(
      TextOps.tokenCount(col("text")),
      TextOps.stopwordRatio(col("text")),
      TextOps.qualityScore(col("text"))).collect()(0)
    assert(stats.getLong(0) == 10L)
    assert(stats.getDouble(1) > 0.3)
    assert(stats.getDouble(2) > 0.5)
  }

  test("marker langid kernel: equals the HOF formulation on corpus + edge cases") {
    val s = spark
    import s.implicits._
    // the exact declarative formulation the fused kernel replaced — kept
    // here as the semantic reference (argmax of per-language isin-filter
    // counts via greatest(struct), all-zero → und)
    val markers = Seq(
      "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "with", "for"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
      "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"),
      "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "en", "que", "por"))
    def hofLangId(toks: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val scores = markers.map { case (lang, ms) =>
        struct(size(filter(toks, t => t.isin(ms: _*))).as("score"),
          lit(lang).as("lang"))
      }
      val best = greatest(scores: _*)
      when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
    }
    val edge = Seq(
      null.asInstanceOf[String],              // NULL text → und
      "",                                     // no markers → und
      "la la la",                             // es/fr shared marker, tie → fr
      "que est",                              // fr 2 vs es 1 → fr
      "en y",                                 // es-only markers
      "the und le el",                        // 4-way tie → fr (largest code)
      "zzz qqq").toDF("text")
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").select(col("text"))
    for (df <- Seq(edge, corpus)) {
      val both = df.select(
        TextOps.langId(col("text")).as("fused"),
        hofLangId(TextOps.tokens(col("text"))).as("hof"))
      assert(both.where(not(col("fused") <=> col("hof"))).count() == 0,
        both.where(not(col("fused") <=> col("hof"))).collect().mkString(", "))
    }
    // the fused path stays inside WholeStageCodegen (the HOF chain was
    // CodegenFallback — the whole point of the kernel)
    val plan = corpus.select(TextOps.langId(col("text")).as("l"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }

  test("char-n-gram langid: classifies samples, und on no signal") {
    val s = spark
    import s.implicits._
    val df = Seq(
      "The weather is changing and the evening brings things to the garden",
      "Der Hund und die Katze gingen durch einen schoenen deutschen Wald",
      "Le chat est dans le jardin et les fleurs sont pour les enfants",
      "Los perros estaban en la casa y que los gatos hacen cosas de ellos",
      "zzz qqq xxx",
      "")
      .toDF("text")
    val langs = df.select(TextOps.langIdNgram(col("text"))).collect().map(_.getString(0))
    assert(langs.toSeq == Seq("en", "de", "fr", "es", "und", "und"), langs.toSeq)
    // case-insensitive: uppercase text classifies identically
    val upper = Seq("THE WEATHER IS CHANGING AND THE EVENING BRINGS THINGS")
      .toDF("text").select(TextOps.langIdNgram(col("text"))).head().getString(0)
    assert(upper == "en")
  }

  test("temperature mixing: smallest source kept whole, big ones at sqrt rate") {
    val s = spark
    import s.implicits._
    // 1000 docs in src_big, 40 in src_small → keep rates 0.2 and 1.0
    val df = (0 until 1040).map { i =>
      (i.toLong, if (i < 1000) "src_big" else "src_small")
    }.toDF("doc_id", "source")
    val kept = Curation.mixSourcesTemperature(df, "doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySource = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // alpha=0.5: rate_small = 1.0 (all 40), rate_big = sqrt(40/1000) ≈ 0.2
    assert(bySource("src_small") == 40, bySource)
    val bigRate = bySource("src_big") / 1000.0
    assert(bigRate > 0.12 && bigRate < 0.28, s"big-source keep rate $bigRate")
    // alpha=1 → natural proportions: keep everything
    val all = Curation.mixSourcesTemperature(df, "doc_id", "source", alpha = 1.0)
    assert(all.count() == 1040)
    // deterministic across partitionings
    val again = Curation.mixSourcesTemperature(df.repartition(13), "doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("source mixing: high-cardinality source columns fail loudly, not OOM") {
    val s = spark
    import s.implicits._
    // doc_id AS the source column: one "source" per row — the misuse the
    // guard exists for (the collect would otherwise scale with the data)
    val df = s.range(0, 500).select(
      col("id").as("doc_id"), concat(lit("d"), col("id")).as("source"))
    val eTemp = intercept[IllegalArgumentException] {
      Curation.mixSourcesTemperature(df, "doc_id", "source", maxSources = 100)
    }
    assert(eTemp.getMessage.contains("maxSources"), eTemp.getMessage)
    // raising the guard past the cardinality works
    assert(Curation.mixSourcesTemperature(
      df, "doc_id", "source", maxSources = 600).count() == 500)
    // mixSources guards the per-source expression-branch count the same way
    val wide = (0 until 500).map(i => s"d$i" -> 1.0).toMap
    val eMix = intercept[IllegalArgumentException] {
      Curation.mixSources(df, "doc_id", "source", wide, maxSources = 100)
    }
    assert(eMix.getMessage.contains("maxSources"), eMix.getMessage)
  }

  test("kmvJaccard: high-cardinality grouping fails loudly; no cache escapes") {
    val s = spark
    import s.implicits._
    val df = s.range(0, 400).select(
      concat(lit("g"), col("id") % 100).as("src"),
      concat(lit("v"), col("id")).as("v"))
    val e = intercept[IllegalArgumentException] {
      Curation.kmvJaccard(df, "src", "v", k = 16, maxGroups = 8)
    }
    assert(e.getMessage.contains("maxGroups"), e.getMessage)
    // success AND failure paths both release the pinned sketch
    val before = s.sparkContext.getPersistentRDDs.keySet
    val ok = Curation.kmvJaccard(
      df.where(col("src").isin("g0", "g1", "g2")), "src", "v", k = 16)
    assert(ok.count() == 3) // 3 groups -> 3 pairs
    assert(s.sparkContext.getPersistentRDDs.keySet == before,
      "kmvJaccard leaked a persisted RDD")
  }

  test("multimodal decode stub: schema, determinism, metadata") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "hello world this is a blob"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.decodeFeatures(s, Multimodal.documentBlobs(df))
      .collect().sortBy(_.doc_id)
    assert(out.length == 2)
    assert(out(0).n_bytes == 26L)
    assert(out(0).features.length == Multimodal.FeatureDim)
    assert(out(0).width == 16 + ('h' & 0x3f))
    assert(out(1).n_bytes == 0L)
    // deterministic
    val again = Multimodal.decodeFeatures(s, Multimodal.documentBlobs(df))
      .collect().sortBy(_.doc_id)
    assert(again(0).features.toSeq == out(0).features.toSeq)
    // text bytes are NOT a recognized image: the decode must be the
    // stub's answer exactly (the image path returned None)
    assert(out(0).width == 16 + ('h' & 0x3f)) // stub "header", not a real one
  }

  test("real image decode: PNG round-trip matches the pixel formula exactly") {
    val s = spark
    import s.implicits._
    // expected features computed straight from the generator formula —
    // independent of any decode path
    def expected(id: Long): (Int, Int, Array[Float]) = {
      val w = 16 + java.lang.Math.floorMod(id, 17L).toInt
      val h = 16 + java.lang.Math.floorMod(id * 7, 13L).toInt
      val n = w.toLong * h
      var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
      val q = new Array[Long](4)
      for (y <- 0 until h; x <- 0 until w) {
        val r = java.lang.Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt
        val g = java.lang.Math.floorMod(id * 17 + x * 11 + y * 3, 256L).toInt
        val b = java.lang.Math.floorMod(id * 13 + x * 5 + y * 29, 256L).toInt
        sr += r; sg += g; sb += b
        sl += (299 * r + 587 * g + 114 * b) / 1000
        q((y * 2 / h) * 2 + x * 2 / w) += r + g + b
      }
      val f = new Array[Float](8)
      f(0) = (sr.toDouble / 255.0 / n.toDouble).toFloat
      f(1) = (sg.toDouble / 255.0 / n.toDouble).toFloat
      f(2) = (sb.toDouble / 255.0 / n.toDouble).toFloat
      for (i <- 0 until 4) f(3 + i) = (q(i).toDouble / 765.0 / n.toDouble).toFloat
      f(7) = (sl.toDouble / 255.0 / n.toDouble).toFloat
      (w, h, f)
    }
    val ids = Seq(0L, 1L, 7L, 123L, 9999L)
    val got = Multimodal.decodeFeatures(s,
        Multimodal.syntheticImageBlobs(s, ids.toDF("doc_id")))
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- ids) {
      val (w, h, f) = expected(id)
      val m = got(id)
      assert(m.width == w && m.height == h, s"id=$id got ${m.width}x${m.height}, want ${w}x$h")
      assert(m.features.toSeq == f.toSeq, s"id=$id features diverged from formula")
    }
  }

  test("BMP/TGA decode: hand-coded containers round-trip the formula pixels exactly") {
    // BMP: hand-rolled encoder (bottom-up, padded, BGR) through the
    // JVM's real BMP reader must equal the PNG decode of the SAME
    // pixels at the SAME dims — cross-codec pixel agreement
    for (id <- Seq(0L, 1L, 2L, 3L, 6L, 123L, 9999L)) {
      val bmp = Multimodal.decodeImage(id, Multimodal.syntheticBmp(id))
      assert(bmp.isDefined, s"ImageIO rejected the hand-written BMP for id=$id")
      val w = 16 + java.lang.Math.floorMod(id, 19L).toInt
      val h = 16 + java.lang.Math.floorMod(id * 5, 11L).toInt
      assert(bmp.get.width == w && bmp.get.height == h)
      // TGA: both encodings (even id → type 2, odd → type 10 RLE) and
      // both origins (id % 3 == 0 → bottom-left) through the hand-
      // written parser; feature floats must be the shared fold's
      val tga = Multimodal.decodeTga(id, Multimodal.syntheticTga(id))
      assert(tga.isDefined, s"TGA parser rejected its own encoder for id=$id")
      assert(tga.get.width == 16 + java.lang.Math.floorMod(id, 23L).toInt)
      assert(tga.get.height == 16 + java.lang.Math.floorMod(id * 3, 15L).toInt)
      assert(tga.get.features.forall(f => !f.isNaN && f >= 0f && f <= 2f))
    }
    // RLE and uncompressed encodings of the SAME pixels must decode
    // identically: re-encode id=4's pixels under both types by flipping
    // the parity-switch via neighboring even/odd ids is not possible
    // (dims differ), so assert directly that a solid-color RLE image
    // (maximal runs) matches its uncompressed twin
    val tgaE = Multimodal.decodeTga(4L, Multimodal.syntheticTga(4L)).get
    assert(tgaE.features.length == Multimodal.FeatureDim)
    // sniffing: no footer → not TGA (falls through to the stub path)
    val noFooter = Multimodal.syntheticTga(7L).dropRight(26)
    assert(Multimodal.decodeTga(7L, noFooter).isEmpty)
    assert(Multimodal.decodeTga(7L, null).isEmpty)
    // truncated body with intact footer must not throw
    val t = Multimodal.syntheticTga(9L)
    val cut = java.util.Arrays.copyOf(t, 30) ++ t.takeRight(26)
    assert(Multimodal.decodeTga(9L, cut).isEmpty)
    // forged 16-bit dims (65535x65535 overflows w*h to a negative Int)
    // must refuse instead of throwing NegativeArraySizeException
    val forged = Multimodal.syntheticTga(9L)
    forged(12) = 0xff.toByte; forged(13) = 0xff.toByte
    forged(14) = 0xff.toByte; forged(15) = 0xff.toByte
    assert(Multimodal.decodeTga(9L, forged).isEmpty)
  }

  test("randomProject: hand-fold agreement, JL geometry preservation, error->NULL") {
    val s = spark
    import s.implicits._
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planes = Similarity.jlPlanes(16, 64)
    val got = emb.where(col("vec_id") === 3)
      .select(Similarity.randomProject(col("embedding"), 16, 64))
      .head().getSeq[Float](0)
    val x = emb.where(col("vec_id") === 3)
      .select(col("embedding")).head().getSeq[Float](0)
    val exp = planes.map { row =>
      var acc = 0.0
      var i = 0
      while (i < 64) { acc += row(i) * x(i); i += 1 }
      acc.toFloat
    }
    assert(got == exp, s"got=$got exp=$exp")
    // JL property: projected squared norms concentrate around the
    // originals (loose statistical bound at k=16 — median within 2×)
    val ratios = emb.limit(100).select(col("embedding"),
        Similarity.randomProject(col("embedding"), 16, 64).as("p"))
      .collect().map { r =>
        val a = r.getSeq[Float](0); val p = r.getSeq[Float](1)
        val na = a.map(v => v.toDouble * v).sum
        val np = p.map(v => v.toDouble * v).sum
        np / na
      }.sorted
    val med = ratios(ratios.length / 2)
    assert(med > 0.5 && med < 2.0, s"median norm ratio $med out of band")
    // length mismatch and NULL → NULL
    val bad = Seq((1L, Array(1.0f, 2.0f))).toDF("id", "v")
    assert(bad.select(Similarity.randomProject(col("v"), 16, 64))
      .head().isNullAt(0))
    // a NULL ELEMENT would read back as 0.0 and silently corrupt the
    // projection — must be NULL out, the CosineSimilarity convention
    val withNullElem = s.sql(
      "SELECT transform(sequence(1, 64), i -> " +
        "CASE WHEN i = 7 THEN CAST(NULL AS FLOAT) ELSE CAST(i AS FLOAT) END) AS v")
    assert(withNullElem.select(Similarity.randomProject(col("v"), 16, 64))
      .head().isNullAt(0))
  }

  test("ivfBqTopK: composed probe + Hamming pruning still recovers neighbors") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 16)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfBqTopK(emb, "vec_id", "embedding", q, 20,
        nCells = 16, nProbe = 4, shortlist = 80, trainedCentroids = cents)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size
    // two composed lossy levers (4/16 probes, then 1-bit codes): the
    // floor is loose but a broken composition scores random ≈ 0-2
    assert(recall >= 7, s"recall $recall/20 too low — composition broken?")
    // the query's own cell is its top probe, so it must survive both
    // levers and re-rank first
    assert(approx.contains(0L))
  }

  test("mmrTopK: diversifies planted clusters; lambda=100 reduces to plain top-k") {
    val s = spark
    import s.implicits._
    // two near-orthogonal tight clusters; the query leans A but has a
    // real B component: plain top-4 is all-A (within-A sim ≈ 1 beats
    // rel_B), while MMR's diversity penalty kills the 2nd/3rd A pick
    def aVec(j: Float): Seq[Float] =
      Seq.tabulate(8)(i => if (i == 0) 1f else if (i == 2) j else 0f)
    def bVec(j: Float): Seq[Float] =
      Seq.tabulate(8)(i => if (i == 1) 1f else if (i == 3) j else 0f)
    val rows =
      (1L to 4L).map(i => (i, aVec(0.01f * i))) ++ // cluster A
      (11L to 14L).map(i => (i, bVec(0.01f * (i - 10)))) // cluster B
    val qSeq = Seq.tabulate(8)(i =>
      if (i == 0) 0.9f else if (i == 1) 0.45f else 0f)
    val df = (rows :+ ((0L, qSeq))).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val q = qSeq.toArray
    val mmr = Similarity.mmrTopK(df, "vec_id", "embedding", q,
        k = 4, lambdaPct = 50, pool = 9)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(mmr.head == 0L, s"first pick must be the max-rel item, got $mmr")
    assert(mmr.exists(id => id >= 11L),
      s"MMR at lambda=50 must reach cluster B, got $mmr")
    // lambda=100: no diversity term — exactly the rel-ordered prefix
    val plain = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 4)
      .collect().map(_.getLong(0)).toSeq
    val lam100 = Similarity.mmrTopK(df, "vec_id", "embedding", q,
        k = 4, lambdaPct = 100, pool = 9)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(lam100 == plain, s"lambda=100 $lam100 != plain top-k $plain")
    // guards
    intercept[IllegalArgumentException] {
      Similarity.mmrTopK(df, "vec_id", "embedding", q, 5, 70, pool = 4)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrTopK(df, "vec_id", "embedding", q, 2, 101)
    }
  }

  test("bqTopK: sign-bit codes + Hamming shortlist + exact rerank; >64 dims raise") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.bqTopK(emb, "vec_id", "embedding", q, 20, shortlist = 80)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size
    // 1 bit/dim is the lossiest rung of the ladder; the 4x-k rerank
    // still recovers most exact neighbors on the real embeddings (a
    // broken code would score random ≈ 0-2)
    assert(recall >= 10, s"recall $recall/20 too low — sign codes broken?")
    // the query is Hamming-0 from itself: always in the shortlist and
    // cosine-1 at the top
    assert(approx.contains(0L))
    // the kernel equals the driver-side sign fold on real vectors
    val got = emb.limit(50).select(col("vec_id"),
        org.apache.spark.sql.graft.GraftSqlShim.column(
          graft.operators.BqEncode(org.apache.spark.sql.graft.GraftSqlShim
            .expression(col("embedding")))).as("c"),
        col("embedding"))
      .collect()
    got.foreach { r =>
      val vec = r.getSeq[Float](2)
      val want = vec.zipWithIndex.foldLeft(0L) { case (c, (v, i)) =>
        if (v > 0f) c | (1L << i) else c
      }
      assert(r.getLong(1) == want, s"vec ${r.getLong(0)} code mismatch")
    }
    // 65 dims must raise, not silently rank on a prefix
    val wide = s.sql("SELECT transform(sequence(1, 65), i -> CAST(i AS FLOAT)) AS v")
    intercept[Exception] {
      wide.select(org.apache.spark.sql.graft.GraftSqlShim.column(
        graft.operators.BqEncode(org.apache.spark.sql.graft.GraftSqlShim
          .expression(col("v"))))).collect()
    }
  }

  test("jlTopK: projected-space candidates + exact rerank recover most exact neighbors") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.jlTopK(emb, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size
    // 16-of-64 dims with 4x rerank recovers most of the exact top-20 on
    // the real embeddings; the floor is deliberately loose (JL is
    // approximate) but catches a broken projection (random ≈ 0-2)
    assert(recall >= 12, s"recall $recall/20 too low — projection broken?")
    // the query itself is its own nearest neighbor through any projection
    assert(approx.contains(0L))
  }

  test("PCX decode: RLE planes round-trip the formula; runs spill across planes; sniff rejects") {
    // the formula constants are the documented generator contract
    // (syntheticPng's scaladoc) — an independent replication here means
    // encoder AND decoder must both be right for the fold to agree
    def pix(id: Long, x: Int, y: Int): (Int, Int, Int) = (
      java.lang.Math.floorMod(31 * id + 7 * x + 13 * y, 256L).toInt,
      java.lang.Math.floorMod(17 * id + 11 * x + 3 * y, 256L).toInt,
      java.lang.Math.floorMod(13 * id + 5 * x + 29 * y, 256L).toInt)
    for (id <- Seq(0L, 1L, 5L, 42L, 9999L)) {
      val got = Multimodal.decodePcx(id, Multimodal.syntheticPcx(id))
      assert(got.isDefined, s"PCX parser rejected its own encoder for id=$id")
      val w = 16 + java.lang.Math.floorMod(id, 21L).toInt
      val h = 16 + java.lang.Math.floorMod(id * 7, 13L).toInt
      assert(got.get.width == w && got.get.height == h)
      // independent fold over the formula: f0/f1/f2 are channel means
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = pix(id, x, y); sr += r; sg += g; sb += b
      }
      val n = w.toLong * h
      assert(got.get.features(0) == (sr.toDouble / 255.0 / n).toFloat)
      assert(got.get.features(1) == (sg.toDouble / 255.0 / n).toFloat)
      assert(got.get.features(2) == (sb.toDouble / 255.0 / n).toFloat)
    }
    // a run that SPILLS across a plane boundary decodes per spec: 2x1
    // image (bpl=2), one 6-byte run of value 9 fills all three planes
    val hdr = Multimodal.syntheticPcx(0L).take(128).clone()
    def le(o: Int, v: Int): Unit = { hdr(o) = (v & 0xff).toByte; hdr(o + 1) = (v >> 8).toByte }
    le(8, 1); le(10, 0) // xmax=1, ymax=0 → 2x1
    le(66, 2)           // bytesPerLine 2
    val spill = hdr ++ Array[Byte](0xC6.toByte, 9)
    val s2 = Multimodal.decodePcx(77L, spill)
    assert(s2.isDefined && s2.get.width == 2 && s2.get.height == 1)
    assert(s2.get.features(0) == (18.0 / 255.0 / 2.0).toFloat) // both pixels r=9
    // sniffing: wrong manufacturer/encoding/planes fall through
    assert(Multimodal.decodePcx(1L, Array[Byte](1, 2, 3)).isEmpty)
    val badPlanes = Multimodal.syntheticPcx(1L).clone(); badPlanes(65) = 1
    assert(Multimodal.decodePcx(1L, badPlanes).isEmpty)
    // truncated body must not throw
    assert(Multimodal.decodePcx(1L, Multimodal.syntheticPcx(1L).take(140)).isEmpty)
  }

  test("QOI decode: hand-built chunks decode per spec; codec round-trips; all ops exercised") {
    // known-answer stream exercising every chunk op against the spec's
    // documented semantics (RGB, DIFF, LUMA, RUN, INDEX, RGBA), 8x1 px
    val bos = new java.io.ByteArrayOutputStream()
    def wr(bs: Int*): Unit = bs.foreach(bos.write)
    wr('q', 'o', 'i', 'f', 0, 0, 0, 8, 0, 0, 0, 1, 3, 0)
    wr(0xfe, 10, 20, 30)   // RGB       -> (10,20,30), index slot 9
    wr(0x7f)               // DIFF +1+1+1 -> (11,21,31), slot 24
    wr(0xaa, 0x6b)         // LUMA dg=10, dr-dg=-2, db-dg=3 -> (19,31,44)
    wr(0xc2)               // RUN 3     -> (19,31,44) x3
    wr(0x18)               // INDEX 24  -> (11,21,31)
    wr(0xff, 5, 6, 7, 255) // RGBA      -> (5,6,7)
    wr(0, 0, 0, 0, 0, 0, 0, 1)
    val known = Multimodal.decodeQoi(42L, bos.toByteArray)
    assert(known.isDefined, "spec stream rejected")
    assert(known.get.width == 8 && known.get.height == 1)
    val pix = Seq((10, 20, 30), (11, 21, 31), (19, 31, 44), (19, 31, 44),
      (19, 31, 44), (19, 31, 44), (11, 21, 31), (5, 6, 7))
    val sr = pix.map(_._1).sum; val sg = pix.map(_._2).sum; val sb = pix.map(_._3).sum
    val sl = pix.map { case (r, g, b) => (299 * r + 587 * g + 114 * b) / 1000 }.sum
    val q0 = pix.take(4).map { case (r, g, b) => r + g + b }.sum
    val q1 = pix.drop(4).map { case (r, g, b) => r + g + b }.sum
    val n = 8.0
    val want = Seq(sr / 255.0 / n, sg / 255.0 / n, sb / 255.0 / n,
      q0 / 765.0 / n, q1 / 765.0 / n, 0.0, 0.0, sl / 255.0 / n).map(_.toFloat)
    assert(known.get.features.toSeq == want, "feature fold diverged from spec pixels")

    // round-trip + cross-codec: the QOI decode of the synthetic image
    // must equal a PNG decode of the SAME pixels (run rows included)
    for (id <- Seq(0L, 1L, 2L, 5L, 123L, 9999L)) {
      val qoi = Multimodal.decodeQoi(id, Multimodal.syntheticQoi(id))
      assert(qoi.isDefined, s"QOI decoder rejected its own encoder for id=$id")
      val w = 16 + java.lang.Math.floorMod(id, 21L).toInt
      val h = 16 + java.lang.Math.floorMod(id * 9, 13L).toInt
      assert(qoi.get.width == w && qoi.get.height == h)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val d = java.lang.Math.floorMod(id, 256L).toInt
      for (y <- 0 until h; x <- 0 until w) {
        val rgb =
          if (java.lang.Math.floorMod(id + y, 5L) == 0L) {
            val r = if ((x / 2) % 2 == 0) d else (d + 1) % 256
            (r << 16) | (d << 8) | d
          } else {
            val r = java.lang.Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt
            val g = java.lang.Math.floorMod(id * 17 + x * 11 + y * 3, 256L).toInt
            val b = java.lang.Math.floorMod(id * 13 + x * 5 + y * 29, 256L).toInt
            (r << 16) | (g << 8) | b
          }
        img.setRGB(x, y, rgb)
      }
      val pbos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", pbos)
      val png = Multimodal.decodeImage(id, pbos.toByteArray).get
      assert(qoi.get.features.toSeq == png.features.toSeq,
        s"QOI and PNG decodes of the same pixels diverged for id=$id")
      // the encode must actually use the whole op vocabulary: walk the
      // chunk stream and count tags (run rows guarantee RUN + INDEX;
      // the formula gradient guarantees LUMA; row seams produce RGB)
      val bytes = Multimodal.syntheticQoi(id)
      var pos = 14; var nRun = 0; var nIdx = 0; var nLuma = 0
      while (pos < bytes.length - 8) {
        val b1 = bytes(pos) & 0xff; pos += 1
        if (b1 == 0xfe) pos += 3
        else if (b1 == 0xff) pos += 4
        else (b1 >> 6) match {
          case 0 => nIdx += 1
          case 2 => nLuma += 1; pos += 1
          case 3 => nRun += 1
          case _ => ()
        }
      }
      assert(nRun > 0 && nIdx > 0 && nLuma > 0,
        s"id=$id ops not all exercised: run=$nRun idx=$nIdx luma=$nLuma")
    }
    // sniffing: wrong magic / truncated body must fall through, not throw
    val ok = Multimodal.syntheticQoi(3L)
    val badMagic = ok.clone(); badMagic(0) = 'x'.toByte
    assert(Multimodal.decodeQoi(3L, badMagic).isEmpty)
    assert(Multimodal.decodeQoi(3L, java.util.Arrays.copyOf(ok, 40)).isEmpty)
    assert(Multimodal.decodeQoi(3L, null).isEmpty)
  }

  test("ICO decode: multi-entry container, AND mask drives the opaque-pixel fold") {
    for (id <- Seq(0L, 1L, 2L, 5L, 123L, 9999L)) {
      val got = Multimodal.decodeIco(id, Multimodal.syntheticIco(id))
      assert(got.isDefined, s"ICO parser rejected its own encoder for id=$id")
      val entries = got.get
      assert(entries.length == 2)
      // dims per the generator formulas, entry-indexed
      assert(entries(0).width == 8 + java.lang.Math.floorMod(id, 9L).toInt)
      assert(entries(0).height == 8 + java.lang.Math.floorMod(id * 3, 7L).toInt)
      assert(entries(1).width == 8 + java.lang.Math.floorMod(id * 5, 11L).toInt)
      assert(entries(1).height == 8 + java.lang.Math.floorMod(id * 7, 5L).toInt)
      entries.foreach { en =>
        // the mask removes ~1/7 of pixels; the fold must count the rest
        val n = en.width.toLong * en.height
        val wantOpaque = (0 until en.width).flatMap(x => (0 until en.height).map(y =>
          java.lang.Math.floorMod(id + x + y + en.entry_idx, 7L) != 0L)).count(identity)
        assert(en.n_opaque == wantOpaque && en.n_opaque < n,
          s"id=$id e=${en.entry_idx}: n_opaque=${en.n_opaque} want $wantOpaque of $n")
        assert(en.features.forall(f => !f.isNaN && f >= 0f && f <= 2f))
      }
      // the mask is LOAD-BEARING: brute-force the opaque-pixel mean-R
      // from the formula and require bit-equality with the decoder
      val e0 = entries(0)
      var sr = 0L; var nOp = 0L
      for (y <- 0 until e0.height; x <- 0 until e0.width)
        if (java.lang.Math.floorMod(id + x + y, 7L) != 0L) {
          sr += java.lang.Math.floorMod((2 * id) * 31 + x * 7 + y * 13, 256L)
          nOp += 1
        }
      assert(e0.features(0) == (sr.toDouble / 255.0 / nOp.toDouble).toFloat)
    }
    // truncation and not-an-icon bytes refuse instead of throwing
    val ico = Multimodal.syntheticIco(3L)
    assert(Multimodal.decodeIco(3L, java.util.Arrays.copyOf(ico, 40)).isEmpty)
    assert(Multimodal.decodeIco(3L, "not an icon".getBytes).isEmpty)
    assert(Multimodal.decodeIco(3L, null).isEmpty)
    // forged dims (negative w*h after Int overflow, or a multi-GB demand)
    // refuse instead of throwing NegativeArraySizeException / allocating
    val forged = ico.clone()
    // entry-0 BITMAPINFOHEADER starts at 6 + 2*16 = 38; biWidth at +4
    forged(38 + 4) = 0xff.toByte; forged(38 + 5) = 0xff.toByte
    forged(38 + 6) = 0x7f.toByte; forged(38 + 7) = 0x00.toByte
    assert(Multimodal.decodeIco(3L, forged).isEmpty)
    val base = Multimodal.decodeIco(3L, ico).get
    // a flipped ALPHA byte leaves the answer unchanged — when the AND
    // mask has any bit set, the mask (not alpha) drives opacity
    val alphaTampered = ico.clone()
    alphaTampered(6 + 32 + 40 + 3) = (alphaTampered(6 + 32 + 40 + 3) ^ 0xff).toByte
    val gotAlpha = Multimodal.decodeIco(3L, alphaTampered).get
    assert(gotAlpha(0).n_opaque == base(0).n_opaque &&
      gotAlpha(0).features.sameElements(base(0).features))
    // a flipped MASK byte changes n_opaque — the mask plane is read,
    // provably load-bearing (entry-0: 11x10 → 440 XOR bytes, mask at
    // 78 + 440 = 518)
    val maskTampered = ico.clone()
    maskTampered(518) = (maskTampered(518) ^ 0xff).toByte
    val gotMask = Multimodal.decodeIco(3L, maskTampered).get
    assert(gotMask(0).n_opaque != base(0).n_opaque)
    // an ALL-ZERO AND mask (the common real-world 32bpp shape) falls
    // back to alpha-driven opacity; the generator keeps the planes
    // consistent, so the answer is bit-identical
    val zeroMask = ico.clone()
    java.util.Arrays.fill(zeroMask, 518, 518 + 40, 0.toByte)
    val gotZero = Multimodal.decodeIco(3L, zeroMask).get
    assert(gotZero(0).n_opaque == base(0).n_opaque &&
      gotZero(0).features.sameElements(base(0).features))
  }

  test("real image decode: JPEG header is read; unrecognized bytes fall back to stub") {
    // JPEG: real width/height from the header (pixel values are lossy, so
    // only the header is asserted — oracle queries stick to lossless PNG)
    val img = new java.awt.image.BufferedImage(37, 23, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 23; x <- 0 until 37) img.setRGB(x, y, (x * 7 % 256 << 16) | (y * 11 % 256))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val m = Multimodal.decodeImage(42L, bos.toByteArray)
    assert(m.isDefined)
    assert(m.get.width == 37 && m.get.height == 23)
    assert(m.get.features.forall(f => !f.isNaN && f >= 0f && f <= 2f))
    // arbitrary bytes: no reader claims them → None → decodeFeatures stubs
    assert(Multimodal.decodeImage(1L, Array[Byte](1, 2, 3, 4, 5)).isEmpty)
    assert(Multimodal.decodeImage(1L, null).isEmpty)
    assert(Multimodal.decodeImage(1L, "plain text".getBytes).isEmpty)
    // truncated PNG (valid magic, cut body) must not throw — stub path
    val png = Multimodal.syntheticPng(5L)
    assert(Multimodal.decodeImage(5L, java.util.Arrays.copyOf(png, 20)).isEmpty)
  }

  test("real image resize: nearest-neighbor pixels match the formula; junk falls back") {
    val s = spark
    import s.implicits._
    val ids = Seq(0L, 3L, 123L)
    val got = Multimodal.resizeImages(s,
        Multimodal.syntheticImageBlobs(s, ids.toDF("doc_id")), 12, 9)
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- ids) {
      val w = 16 + java.lang.Math.floorMod(id, 17L).toInt
      val h = 16 + java.lang.Math.floorMod(id * 7, 13L).toInt
      val m = got(id)
      assert(m.width == 12 && m.height == 9)
      assert(m.payload.length == 12 * 9 * 3)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (yo <- 0 until 9; xo <- 0 until 12) {
        val x = xo * w / 12
        val y = yo * h / 9
        val r = java.lang.Math.floorMod(id * 31 + x * 7 + y * 13, 256L).toInt
        val g = java.lang.Math.floorMod(id * 17 + x * 11 + y * 3, 256L).toInt
        val b = java.lang.Math.floorMod(id * 13 + x * 5 + y * 29, 256L).toInt
        val o = (yo * 12 + xo) * 3
        assert((m.payload(o) & 0xff) == r && (m.payload(o + 1) & 0xff) == g &&
          (m.payload(o + 2) & 0xff) == b, s"id=$id pixel ($xo,$yo)")
        sr += r; sg += g; sb += b
      }
      assert(m.sum_r == sr && m.sum_g == sg && m.sum_b == sb)
    }
    // unrecognized bytes: stub payload shape, zeroed sums
    val junk = Multimodal.resizeImages(s,
        Seq((7L, "not an image".getBytes)).toDF("doc_id", "blob"), 16, 16)
      .collect()(0)
    assert(junk.payload.length == 16 * 16 / 16 && junk.sum_r == 0L)
  }

  test("real GIF frame sampling: decoded frames match the palette formula") {
    val s = spark
    import s.implicits._
    val ids = Seq(0L, 2L, 11L)
    val got = Multimodal.sampleVideoFrames(s,
        Multimodal.syntheticVideoBlobs(s, ids.toDF("doc_id")), stride = 2)
      .collect().groupBy(_.doc_id)
    for (id <- ids) {
      val nf = 4 + java.lang.Math.floorMod(id, 5L).toInt
      val frames = got(id).sortBy(_.frame_idx)
      assert(frames.map(_.frame_idx).toSeq == (0 until nf by 2).toSeq)
      for (fr <- frames) {
        assert(fr.width == Multimodal.GifW && fr.height == Multimodal.GifH)
        var sr = 0L; var sg = 0L; var sb = 0L
        for (y <- 0 until Multimodal.GifH; x <- 0 until Multimodal.GifW) {
          val idx = java.lang.Math.floorMod(
            id * 31 + fr.frame_idx * 97 + x * 7 + y * 13, 64L).toInt
          sr += 85 * (idx % 4); sg += 85 * (idx / 4 % 4); sb += 85 * (idx / 16 % 4)
        }
        assert(fr.sum_r == sr && fr.sum_g == sg && fr.sum_b == sb,
          s"id=$id frame=${fr.frame_idx} sums diverged from formula")
      }
    }
    // non-GIF and truncated blobs yield no frames, not garbage
    val junk = Multimodal.sampleVideoFrames(s,
      Seq((7L, "not a gif".getBytes),
        (8L, java.util.Arrays.copyOf(Multimodal.syntheticGif(1L), 40)))
        .toDF("doc_id", "blob"))
    assert(junk.count() == 0L)
  }

  test("bpeTrain: merges match a sequential reference; greedy run fusing") {
    val s = spark
    import s.implicits._
    // greedy run semantics: a,a,a,a,a under (a,a) → (aa),(aa),a
    assert(TextOps.applyMerge("aaaaa".map(_.toString).toIndexedSeq, "a", "a") ==
      IndexedSeq("aa", "aa", "a"))
    assert(TextOps.applyMerge(IndexedSeq("x", "y", "x", "y"), "x", "y") ==
      IndexedSeq("xy", "xy"))
    val corpus = Seq(
      "low low low lower lower newest newest newest newest widest widest",
      "aaaaa aaaaa aaa low")
    // sequential in-memory reference (Sennrich et al. alg. 1 shape)
    def ref(k: Int): Seq[(Int, String, String, Long)] = {
      var vocab: Map[IndexedSeq[String], Long] = corpus.flatMap(_.split(" "))
        .filter(_.nonEmpty).groupBy(identity)
        .map { case (w, ws) => (w.map(_.toString).toIndexedSeq, ws.size.toLong) }
      val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
      var i = 0
      var go = true
      while (i < k && go) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((syms, c) <- vocab; j <- 0 until syms.length - 1)
          counts((syms(j), syms(j + 1))) =
            counts.getOrElse((syms(j), syms(j + 1)), 0L) + c
        if (counts.isEmpty) go = false
        else {
          val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
          out += ((i, l, r, c))
          vocab = vocab.map { case (sy, cn) => (TextOps.applyMerge(sy, l, r), cn) }
          i += 1
        }
      }
      out.toSeq
    }
    val got = TextOps.bpeTrain(corpus.toDF("text"), "text", numMerges = 6)
      .map(m => (m.merge_idx, m.lhs, m.rhs, m.pair_count))
    assert(got == ref(6), s"got $got expected ${ref(6)}")
    // merge learning exhausts gracefully when every word is one symbol
    val tiny = TextOps.bpeTrain(Seq("ab ab").toDF("text"), "text", numMerges = 10)
    assert(tiny.map(m => (m.lhs, m.rhs)) == Seq(("a", "b")))
    // the PRODUCTION driver-local learner is merge-for-merge identical —
    // same tie rule, same overlap counting, same greedy applyMerge —
    // including the exhaustion edge
    val gotLocal = TextOps.bpeTrainLocal(corpus.toDF("text"), "text", numMerges = 6)
      .map(m => (m.merge_idx, m.lhs, m.rhs, m.pair_count))
    assert(gotLocal == ref(6), s"got $gotLocal expected ${ref(6)}")
    val tinyLocal = TextOps.bpeTrainLocal(Seq("ab ab").toDF("text"), "text", 10)
    assert(tinyLocal.map(m => (m.lhs, m.rhs)) == Seq(("a", "b")))
    // and on real corpus text, against the DISTRIBUTED learner
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("text").isNotNull).select(col("text"))
    val a = TextOps.bpeTrain(docs, "text", numMerges = 12)
    val b = TextOps.bpeTrainLocal(docs, "text", numMerges = 12)
    assert(a == b, s"distributed $a\nlocal $b")
    // the maxVocab guard fails loudly instead of collecting unbounded
    intercept[IllegalArgumentException] {
      TextOps.bpeTrainLocal(docs, "text", numMerges = 2, maxVocab = 3)
    }
  }

  test("byte-level BPE: pre-token partition, round trip, no UNK ever, segment counts") {
    val s = spark
    import s.implicits._
    // the pre-tokenizer PARTITIONS the text: concatenating the matches
    // reproduces the input byte-for-byte, including multi-space runs,
    // leading/trailing whitespace, contractions, and punctuation
    val tricky = Seq(
      "it's can't we're I'll you've o'clock",
      "  leading and   multi  spaces\ttab\nnewline trailing  ",
      "mixed42digits 1234 !@#$ punct-runs... end",
      "café naïve 中文 emoji 😀 bytes", // non-ASCII: byte fallback
      "")
    val re = java.util.regex.Pattern.compile(TextOps.ByteBpePattern)
    tricky.foreach { t =>
      val m = re.matcher(t)
      val sb = new StringBuilder
      while (m.find()) sb.append(m.group())
      assert(sb.toString == t, s"pre-tokens do not partition: '$t'")
    }
    // train on real corpus text; every learned symbol is a byte string
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("text").isNotNull).select(col("text"))
    val merges = TextOps.bpeTrainBytes(docs, "text", numMerges = 20)
    assert(merges.length == 20 && merges.map(_.merge_idx) == (0 until 20))
    // round trip through encode/decode: EVERY input — ASCII corpus rows
    // and the non-ASCII fixtures — reconstructs exactly; no UNK exists
    // because any byte is a base symbol
    val sampleTexts = docs.limit(20).collect().map(_.getString(0)).toSeq ++ tricky
    sampleTexts.foreach { t =>
      val toks = TextOps.bpeEncodeBytes(t, merges)
      assert(TextOps.byteSymsDecode(toks) == t, s"round trip broke on '${t.take(40)}'")
    }
    // byte fallback concretely: a string far outside the training
    // distribution still encodes (to single bytes) and decodes
    val alien = "üßç жи ☃"
    val atoks = TextOps.bpeEncodeBytes(alien, merges)
    assert(atoks.nonEmpty && TextOps.byteSymsDecode(atoks) == alien)
    // segment counts agree with a per-doc naive encode
    val small = Seq((1L, "it's a test it's a test"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val seg = TextOps.bpeSegmentBytes(small, "doc_id", "text", merges)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def naiveCounts(t: String): (Long, Long) = {
      val m = re.matcher(t)
      var pre = 0L; var tot = 0L
      while (m.find()) { pre += 1; tot += {
        var sy = m.group().getBytes("UTF-8").map(b => (b & 0xFF).toChar.toString).toIndexedSeq
        merges.sortBy(_.merge_idx).foreach(mm => sy = TextOps.applyMerge(sy, mm.lhs, mm.rhs))
        sy.length.toLong } }
      (pre, tot)
    }
    val (p1, t1) = naiveCounts("it's a test it's a test")
    assert(seg.toSeq == Seq((1L, p1, t1), (2L, 0L, 0L), (3L, 0L, 0L)))
    // training determinism: a second run learns the identical table
    assert(TextOps.bpeTrainBytes(docs, "text", numMerges = 20) == merges)
    // token-ID encoding round-trips: ids < 256 are bytes, 256+i is
    // merge i's fused string — decoding the id stream reconstructs the
    // exact input text
    val withIds = Seq((1L, "it's a test it's a test"), (2L, ""),
        (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val gotIds = TextOps.bpeEncodeIdsDf(withIds, "doc_id", "text", merges)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byIdx = merges.sortBy(_.merge_idx).toIndexedSeq
    def decodeIds(ids: String): String =
      if (ids.isEmpty) ""
      else TextOps.byteSymsDecode(ids.split(" ").toSeq.map { s =>
        val id = s.toInt
        if (id < 256) id.toChar.toString
        else byIdx(id - 256).lhs + byIdx(id - 256).rhs
      })
    assert(decodeIds(gotIds(0)._3) == "it's a test it's a test")
    assert(gotIds(0)._2 == gotIds(0)._3.split(" ").length.toLong)
    assert(gotIds(1) == ((2L, 0L, "")) && gotIds(2) == ((3L, 0L, "")))
  }

  test("incrementalNearDup: corpus screen, in-batch keeper, best-match rule") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "entirely different corpus content about spark query planning"))
      .toDF("doc_id", "text")
    val batch = Seq(
      // near-dup of corpus doc 1 (last token changed → 1 of 10 shingles
      // differs on each side, exact Jaccard 9/11 ≈ 0.82)
      (10L, "the quick brown fox jumps over the lazy dog again and more"),
      // exact duplicate pair WITHIN the batch: 11 keeps (no smaller match),
      // 12 drops against 11 — and 11 itself matches nothing in the corpus
      (11L, "fresh unseen material alpha beta gamma delta epsilon zeta eta"),
      (12L, "fresh unseen material alpha beta gamma delta epsilon zeta eta"),
      // novel doc: kept
      (13L, "completely novel text nothing shares shingles with this one"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalNearDup(batch, corpus, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 8, threshold = 0.7)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getString(2), r.getLong(3)))).toMap
    assert(got(10L) == ((false, "corpus", 1L)), got(10L).toString)
    assert(got(11L) == ((true, "none", -1L)), got(11L).toString)
    assert(got(12L) == ((false, "batch", 11L)), got(12L).toString)
    assert(got(13L) == ((true, "none", -1L)), got(13L).toString)
  }

  test("vocabGrowth: exact prefix counts; Heaps' law on the real corpus") {
    val s = spark
    import s.implicits._
    // hand fixture: ids 1..3 with overlapping vocab; cp=0 below all ids
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c d e")).toDF("doc_id", "text")
    val got = TextOps.vocabGrowth(docs, "doc_id", "text", Seq(0L, 1L, 2L, 3L, 99L))
      .orderBy("cp").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (0L, 0L, 0L, 0L),
      (1L, 1L, 3L, 2L),   // {a, b}
      (2L, 2L, 5L, 3L),   // + {c}
      (3L, 3L, 8L, 5L),   // + {d, e}
      (99L, 3L, 8L, 5L)), got.toString)
    // Heaps on real data: vocab growth is SUBLINEAR in token growth at
    // every checkpoint doubling (the synthetic corpus's generator vocab
    // saturates almost immediately — ~31 distinct tokens — which is the
    // extreme sublinear case: the diagnostic exists to expose exactly
    // this kind of vocabulary shape before a tokenizer is sized for it)
    val real = TextOps.vocabGrowth(
        s.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "doc_id", "text", Seq(60L, 125L, 250L, 500L))
      .orderBy("cp").collect().map(r => (r.getLong(2), r.getLong(3)))
    real.sliding(2).foreach { case Array((t1, v1), (t2, v2)) =>
      assert(t2 > t1 && v2 >= v1, "prefix counts must be monotone")
      assert(v2.toDouble / v1 < t2.toDouble / t1,
        s"vocab grew superlinearly: tokens $t1->$t2, vocab $v1->$v2")
    }
  }

  test("containmentPairs: finds subset duplication the Jaccard family misses") {
    val s = spark
    import s.implicits._
    val long = (1 to 60).map(i => s"tok$i").mkString(" ")
    val short = (1 to 12).map(i => s"tok$i").mkString(" ")          // prefix of long
    val other = (100 to 160).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, long),                 // container
      (2L, short),                // fully contained in 1 — overlap 1.0
      (3L, other),                // unrelated
      (4L, other + " tail9 tail8") // near-dup of 3 (high jaccard)
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // (1,2): 10 shingles of the short doc, all present in the long one
    assert(got.contains((1L, 2L)), got.keySet.toString)
    val (na, nb, ni, ov) = got((1L, 2L))
    assert(na == 58L && nb == 10L && ni == 10L && ov == 1.0, got((1L, 2L)).toString)
    // (3,4) is ordinary near-dup: also caught (overlap subsumes jaccard)
    assert(got.contains((3L, 4L)))
    // the blind spot is real: the pair (1,2) has tiny JACCARD, so the
    // minhash pipeline at its own threshold never reports it
    val jac = Dedup.jaccard(
      Dedup.shingles(lit(long), 3), Dedup.shingles(lit(short), 3))
    val j = docs.limit(1).select(jac).head().getDouble(0)
    assert(j < 0.2, s"jaccard of the contained pair is $j")
    val lshPairs = Dedup.verifiedNearDupPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!lshPairs.contains((1L, 2L)), "jaccard pipeline unexpectedly found the contained pair")
    // saturated-vocabulary recall (the round-11 scheme's documented
    // blind spot, closed by prefix filtering): docs made ENTIRELY of
    // boilerplate grams (every shingle df = 12) are still found — all
    // 12·11/2 identical pairs at overlap 1.0, no df cliff
    val boiler = (0 until 12).map(i => (10L + i, "the same boilerplate line repeated"))
      .toDF("doc_id", "text")
    val all = Dedup.containmentPairs(boiler, "doc_id", "text",
      shingleSize = 3, threshold = 0.9)
    assert(all.count() == 66L, "prefix filtering must cover saturated-vocab corpora")
    assert(all.where(col("overlap") =!= 1.0).count() == 0L)
    // losslessness on real data: prefix-filter candidates reproduce the
    // brute-force all-pairs answer exactly (500-doc fixture is small
    // enough to cross-join)
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).where(col("text").isNotNull)
    val fast = Dedup.containmentPairs(real, "doc_id", "text",
        shingleSize = 3, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(4)).toMap
    val rsh = real.select(col("doc_id").as("vid"),
      Dedup.shingles(col("text"), 3).as("sh"))
    val brute = rsh.as("a").crossJoin(rsh.as("b"))
      .where(col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("long").as("ni"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          least(size(col("a.sh")), size(col("b.sh"))).cast("double")).as("ov"))
      .where(col("ov") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fast == brute,
      s"prefix-filter answer diverged from brute force: " +
        s"missing=${(brute.keySet -- fast.keySet).take(5)} " +
        s"extra=${(fast.keySet -- brute.keySet).take(5)}")
  }

  test("heavyHitters: Misra-Gries candidates are a provable superset; recount is exact") {
    val s = spark
    import s.implicits._
    // summary-level guarantee, checked directly on the aggregator over
    // many random orderings and split points: every item with
    // freq > n/(k+1) survives reduce+merge in ANY arrangement
    val rnd = new scala.util.Random(7)
    val agg = new Curation.MisraGriesAggregator(5)
    for (trial <- 0 until 50) {
      val items = Seq.fill(400)(s"t${rnd.nextInt(40)}") ++
        Seq.fill(120)("hot1") ++ Seq.fill(90)("hot2")
      val shuffled = rnd.shuffle(items)
      val cut = 1 + rnd.nextInt(shuffled.length - 1)
      val (l, r) = shuffled.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(merged.m.size <= 5, s"trial $trial: state exceeded k")
      val n = items.length
      val exact = items.groupBy(identity).view.mapValues(_.size).toMap
      val mustSurvive = exact.collect { case (i, c) if c > n / 6 => i }
      mustSurvive.foreach(i => assert(merged.m.contains(i),
        s"trial $trial: item $i (freq ${exact(i)}) > n/(k+1) dropped"))
    }
    // operator-level: exact equality with brute force, with m small
    // enough that the summary MUST prune (forcing the guarantee to
    // carry the answer), invariant under repartitioning
    // evens → 4 hot keys at 250 each (well over 2000/16+1 = 126); odds
    // → 1000 distinct tails, so the 16-entry summary must prune hard
    val data = (0 until 2000).map { i =>
      if (i % 2 == 0) s"hh${i % 8}" else s"tail${i}"
    }.toDF("v")
    val brute = data.groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= lit(2000L / 16 + 1))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 7)) {
      val got = Curation.heavyHitters(data.repartition(parts), "v", 16)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(got.map(t => t._1 -> t._2).toMap == brute,
        s"parts=$parts: ${got.toSeq} vs $brute")
      assert(got.forall(_._3 == 2000L))
    }
    // no qualifying item → empty frame, schema intact
    val flat = (0 until 100).map(i => s"u$i").toDF("v")
    val none = Curation.heavyHitters(flat, "v", 8)
    assert(none.columns.toSeq == Seq("item", "cnt", "n_total") && none.count() == 0)
  }

  test("incrementalContainment: one-directional drops against corpus and batch peers") {
    val s = spark
    import s.implicits._
    val long = (1 to 40).map(i => s"tok$i").mkString(" ")
    val mid = (1 to 20).map(i => s"tok$i").mkString(" ")
    val corpus = Seq((1L, mid), (2L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, (1 to 10).map(i => s"tok$i").mkString(" ")), // ⊂ corpus doc 1 → drop
      (11L, long),          // strictly CONTAINS corpus doc 1 → keep (new content)
      (12L, mid),           // equal-size copy of corpus doc 1 → drop (corpus wins ties)
      (13L, "x1 x2 x3 x4 x5 x6 x7 x8"),
      (14L, "x1 x2 x3 x4 x5"), // ⊂ batch peer 13 (smaller id) → drop, src=batch
      (15L, "unrelated brand new content entirely here")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalContainment(batch, corpus, "doc_id", "text",
        shingleSize = 3, threshold = 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getString(2), r.getLong(3)))).toMap
    // ties at overlap 1.0 attribute to the batch container first (the
    // incrementalNearDup ordering: score desc, src asc, id asc) — doc
    // 11 contains docs 10 and 12 just like corpus doc 1 does
    assert(got(10L) == ((false, "batch", 11L)), got(10L).toString)
    assert(got(11L)._1, "a strict superset of a seen doc must be KEPT: " + got(11L))
    assert(got(12L) == ((false, "batch", 11L)), got(12L).toString)
    assert(got(13L)._1, got(13L).toString)
    assert(got(14L) == ((false, "batch", 13L)), got(14L).toString)
    assert(got(15L) == ((true, "none", -1L)), got(15L).toString)
  }

  test("textRank: hub token ranks first; window bounds edges; partition-invariant") {
    val s = spark
    import s.implicits._
    // "hub" co-occurs with every filler inside window 2 (degree 6);
    // doc 2's best-connected token (far2) only reaches degree 4 — hub
    // must dominate the ranking, not just win a tiebreak
    val docs = Seq(
      (1L, "hub a hub b hub c hub d hub e hub f"),
      (2L, "x far1 far2 far3 y")
    ).toDF("doc_id", "text")
    val got = TextOps.textRank(docs, "doc_id", "text",
      window = 2, iterations = 5, topK = 50).collect()
    val nodes = got.map(_.getString(0)).toSet
    assert(nodes ==
      Set("hub", "a", "b", "c", "d", "e", "f", "x", "far1", "far2", "far3", "y"))
    assert(got.head.getString(0) == "hub", got.head.toString)
    // window check through the degree structure: x (pos 0) reaches only
    // far1/far2, never far3 (distance 3) or y (distance 4) — so doc 2's
    // graph is a path-like band and every doc-2 token ranks below hub
    val ranks = got.map(r => r.getString(0) -> r.getLong(1)).toMap
    for (t <- Seq("x", "far1", "far2", "far3", "y"))
      assert(ranks(t) < ranks("hub"), s"$t should rank below hub")
    // integer fixed-point rounds are order-free: any partitioning of the
    // input produces the identical ranked list
    val re = TextOps.textRank(docs.repartition(7), "doc_id", "text",
      window = 2, iterations = 5, topK = 50).collect()
    assert(re.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      got.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("rakeKeywords: hand-computed deg/freq scores; phrase boundaries at stopwords") {
    val s = spark
    import s.implicits._
    // phrases: [deep learning] [deep networks] [practice] — "of"/"the"/
    // "in" split. freq: deep 2, learning/networks/practice 1.
    // deg: deep 2+2=4, learning 2, networks 2, practice 1.
    // wscore(⌊1e6·deg/freq⌋): deep 2e6, learning 2e6, networks 2e6,
    // practice 1e6 → "deep learning" 4e6, "deep networks" 4e6,
    // "practice" 1e6
    val docs = Seq((1L, "deep learning of the deep networks in practice"))
      .toDF("doc_id", "text")
    val got = TextOps.rakeKeywords(docs, "doc_id", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("deep learning", 1L, 4000000L),
      ("deep networks", 1L, 4000000L),
      ("practice", 1L, 1000000L)), got.toString)
    // repeated phrase across docs: one output row, n_occ counts both,
    // and the corpus-global word stats shift every score
    val two = docs.unionAll(Seq((2L, "deep learning")).toDF("doc_id", "text"))
    val got2 = TextOps.rakeKeywords(two, "doc_id", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // freq: deep 3, learning 2; deg: deep 2+2+2=6, learning 2+2=4 →
    // deep 2e6, learning 2e6, networks (deg 2, freq 1) 2e6, practice 1e6
    assert(got2 == Seq(
      ("deep learning", 2L, 4000000L),
      ("deep networks", 1L, 4000000L),
      ("practice", 1L, 1000000L)), got2.toString)
  }

  test("snapshots: schema evolution — added columns union by name, old versions keep their shape") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-snap-evo")
    try {
      val r = root.toString
      graft.sources.Snapshots.append(Seq((1L, 10L)).toDF("id", "n"), r)
      // the corpus grows a column mid-life — the normal event
      graft.sources.Snapshots.append(
        Seq((2L, 20L, "en")).toDF("id", "n", "lang"), r)
      val v2 = graft.sources.Snapshots.read(s, r, 2)
      assert(v2.columns.sorted.toSeq == Seq("id", "lang", "n"))
      val rows = v2.orderBy("id").collect()
        .map(x => (x.getLong(0), x.getLong(1),
          if (x.isNullAt(2)) null else x.getString(2))).toSeq
      assert(rows == Seq((1L, 10L, null), (2L, 20L, "en")), rows.toString)
      // time travel: the pre-evolution version never shows the column
      assert(graft.sources.Snapshots.read(s, r, 1).columns.sorted.toSeq ==
        Seq("id", "n"))
      // an incompatible type change fails loudly at plan time
      graft.sources.Snapshots.append(
        Seq((3L, "not a number")).toDF("id", "n"), r)
      intercept[Exception] {
        graft.sources.Snapshots.read(s, r, 3).collect()
      }
      // ...and the earlier versions still read fine
      assert(graft.sources.Snapshots.read(s, r, 2).count() == 2)
    } finally {
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("warc V2 connector: format(\"warc\") reads records; column pruning reaches the scan") {
    val s = spark
    def rec(url: String, body: String): Array[Byte] = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: ${body.length}\r\n\r\n$body"
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\nWARC-Date: 2026-01-01T00:00:00Z\r\n" +
        s"Content-Type: application/http; msgtype=response\r\nContent-Length: ${http.length}\r\n\r\n$http\r\n\r\n")
        .getBytes("UTF-8")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-warcv2")
    try {
      java.nio.file.Files.write(dir.resolve("a.warc"),
        rec("https://a.example/", "hello") ++ rec("https://b.example/", "world"))
      java.nio.file.Files.write(dir.resolve("b.warc"), rec("https://c.example/", "third"))
      val df = s.read.format("warc").load(dir.toString)
      // full read agrees with the binaryFile route record-for-record
      val viaV2 = df.select("target_uri", "http_status")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      val viaBin = graft.sources.Warc.readWarc(s, dir.toString)
        .select("target_uri", "http_status")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSet
      assert(viaV2 == viaBin && viaV2.size == 3, s"v2=$viaV2 bin=$viaBin")
      assert(df.count() == 3)
      // body bytes decode
      val bodies = df.select("body").collect()
        .map(r => new String(r.getAs[Array[Byte]](0), "UTF-8")).toSet
      assert(bodies == Set("hello", "world", "third"))
      // pruning pin: a narrow projection's scan reads ONLY that column —
      // the scan description carries its pushed read schema
      val plan = df.select("target_uri").queryExecution.executedPlan.toString
      assert(plan.contains("[target_uri]"), plan)
      assert(!plan.contains("[path,warc_type"), plan)
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("snapshots: append/overwrite/time-travel/expire; crash recovery via max-manifest discovery") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-snapspec")
    try {
      val r = root.toString
      assert(graft.sources.Snapshots.currentVersion(s, r) == 0L)
      val v1 = graft.sources.Snapshots.append(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), r)
      val v2 = graft.sources.Snapshots.append(Seq((3L, "c")).toDF("id", "x"), r)
      val v3 = graft.sources.Snapshots.overwrite(Seq((9L, "z")).toDF("id", "x"), r)
      assert((v1, v2, v3) == (1L, 2L, 3L))
      def ids(v: Long): Set[Long] =
        graft.sources.Snapshots.read(s, r, v).select("id").collect().map(_.getLong(0)).toSet
      // time travel after the overwrite: earlier versions are untouched
      assert(ids(1) == Set(1L, 2L))
      assert(ids(2) == Set(1L, 2L, 3L))
      assert(ids(3) == Set(9L))
      assert(ids(-1) == Set(9L)) // default = current
      assert(graft.sources.Snapshots.versions(s, r) == Seq(1L, 2L, 3L))
      // crash between the two renames: manifest v4 landed (its data dirs
      // were written before it), pointer still says 3 — the manifest set
      // is the source of truth, so the table resumes at v4 and the next
      // commit CANNOT clobber it (the round-12 review found the old
      // behavior reported an empty table here, and the next append then
      // overwrote manifest v1)
      java.nio.file.Files.copy(root.resolve("manifests/v3.txt"),
        root.resolve("manifests/v4.txt"))
      assert(graft.sources.Snapshots.currentVersion(s, r) == 4L)
      assert(ids(-1) == Set(9L)) // v4 duplicates v3's contents
      val v5 = graft.sources.Snapshots.append(Seq((20L, "w")).toDF("id", "x"), r)
      assert(v5 == 5L)
      assert(ids(5) == Set(9L, 20L))
      assert(ids(1) == Set(1L, 2L)) // v1 untouched by the recovery
      // a pointer that is AHEAD of any manifest (corrupt) cannot resolve
      // a read, but versions() still reports the truth
      assert(graft.sources.Snapshots.versions(s, r) == Seq(1L, 2L, 3L, 4L, 5L))
      // vacuum to the latest version only: older history gone, v5 reads
      graft.sources.Snapshots.expire(s, r, keepLast = 1)
      assert(graft.sources.Snapshots.versions(s, r) == Seq(5L))
      assert(ids(5) == Set(9L, 20L))
      intercept[IllegalArgumentException] { ids(1) }
      // v5 reads v3's dir + its own append dir; v1/v2's dirs are gone
      val dataDirs = java.nio.file.Files.list(root.resolve("data")).count()
      assert(dataDirs == 2L, s"expected 2 surviving commit dirs, got $dataDirs")
      // compaction: appends fragment the manifest; compact collapses the
      // CURRENT version to one commit dir with identical rows, and
      // expire then reclaims the fragments
      graft.sources.Snapshots.append(Seq((10L, "p"), (11L, "q")).toDF("id", "x"), r)
      graft.sources.Snapshots.append(Seq((12L, "r")).toDF("id", "x"), r)
      val pre = graft.sources.Snapshots.read(s, r)
        .select("id").collect().map(_.getLong(0)).toSet
      val vc = graft.sources.Snapshots.compact(s, r)
      assert(graft.sources.Snapshots.currentVersion(s, r) == vc)
      assert(ids(vc) == pre && pre == Set(9L, 20L, 10L, 11L, 12L))
      graft.sources.Snapshots.expire(s, r, keepLast = 1)
      val afterCompact = java.nio.file.Files.list(root.resolve("data")).count()
      assert(afterCompact == 1L, s"compact+expire left $afterCompact commit dirs")
      assert(ids(vc) == pre)
      // a GARBLED pointer file (not just a missing one) also falls back
      // to max-manifest discovery instead of throwing NumberFormatException
      java.nio.file.Files.write(root.resolve("VERSION"),
        "not a number".getBytes("UTF-8"))
      // the local Hadoop fs keeps a checksum sidecar; an out-of-band NIO
      // write invalidates it, which is not the failure mode under test
      java.nio.file.Files.deleteIfExists(root.resolve(".VERSION.crc"))
      assert(graft.sources.Snapshots.currentVersion(s, r) == vc)
      assert(ids(vc) == pre)
    } finally {
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("snapshot row-level deletes: merge-on-read, backwards-only, compact materializes, expire reclaims") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-snapdel")
    try {
      val r = root.toString
      def ids(v: Long = -1L): Set[Long] =
        graft.sources.Snapshots.read(s, r, v).select("id")
          .collect().map(_.getLong(0)).toSet
      graft.sources.Snapshots.append(
        (1L to 6L).map(i => (i, s"x$i")).toDF("id", "x"), r) // v1
      val v2 = graft.sources.Snapshots.deleteWhere(s, r, Seq("id"),
        col("id") % 2 === 0) // deletes 2, 4, 6
      assert(v2 == 2L)
      assert(ids() == Set(1L, 3L, 5L))
      assert(ids(1) == (1L to 6L).toSet) // time travel across the DELETE
      // deletes apply only BACKWARDS: re-appending a deleted key
      // resurrects it, and the resurrected row is the new one
      graft.sources.Snapshots.append(Seq((4L, "resurrected")).toDF("id", "x"), r) // v3
      assert(ids() == Set(1L, 3L, 4L, 5L))
      val x4 = graft.sources.Snapshots.read(s, r).where(col("id") === 4L)
        .select("x").collect().map(_.getString(0)).toSeq
      assert(x4 == Seq("resurrected"))
      // a second delete hits both the v1 remnant and the v3 append
      graft.sources.Snapshots.deleteWhere(s, r, Seq("id"), col("id") >= 4L) // v4
      assert(ids() == Set(1L, 3L))
      // a branch created after the deletes carries the delete entries
      graft.sources.Snapshots.createBranch(s, r, "exp")
      val br = graft.sources.Snapshots.readBranch(s, r, "exp")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(br == Set(1L, 3L))
      // DELETE matching nothing is a no-op: no version advance
      val v = graft.sources.Snapshots.currentVersion(s, r)
      assert(graft.sources.Snapshots.deleteWhere(s, r, Seq("id"),
        col("id") === 999L) == v)
      assert(graft.sources.Snapshots.currentVersion(s, r) == v)
      // compact materializes the survivors (manifest drops its delete
      // entries); expire then reclaims the delete files alongside the
      // superseded data dirs — only branch-pinned dirs survive
      val vc = graft.sources.Snapshots.compact(s, r)
      assert(ids(vc) == Set(1L, 3L))
      graft.sources.Snapshots.dropBranch(s, r, "exp")
      graft.sources.Snapshots.expire(s, r, keepLast = 1)
      assert(ids() == Set(1L, 3L))
      val names = {
        val it = java.nio.file.Files.list(root.resolve("data")).iterator()
        val b = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) b += it.next().getFileName.toString
        b.toSeq
      }
      assert(names.size == 1 && names.forall(_.startsWith("c_")),
        s"expected one compacted commit dir after expire, got $names")
    } finally {
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("main-lineage two-writer race: loser retryable, nothing lost; abandoned claims repairable") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-snaprace")
    try {
      val r = root.toString
      def ids(v: Long = -1L): Set[Long] =
        graft.sources.Snapshots.read(s, r, v).select("id")
          .collect().map(_.getLong(0)).toSet
      graft.sources.Snapshots.append(Seq((1L, "a")).toDF("id", "x"), r) // v1
      // writer A observes v1; before A's commit lands, writer B commits v2
      val observed = graft.sources.Snapshots.currentVersion(s, r)
      graft.sources.Snapshots.append(Seq((2L, "b")).toDF("id", "x"), r) // B: v2
      // A replays its commit at the stale observation: exactly one writer
      // owns v2 — A must lose LOUDLY, never silently replace B's manifest
      intercept[java.util.ConcurrentModificationException] {
        graft.sources.Snapshots.commitAt(Seq((3L, "c")).toDF("id", "x"), r,
          replace = false, observedCur = observed)
      }
      assert(ids(2L) == Set(1L, 2L)) // B's commit intact
      // A retries from fresh state: every writer's rows present
      graft.sources.Snapshots.append(Seq((3L, "c")).toDF("id", "x"), r) // v3
      assert(ids() == Set(1L, 2L, 3L))
      // crash between claim and manifest: the slot blocks (commits fail
      // loudly instead of commits vanishing), shows up as abandoned, and
      // releaseClaim repairs it
      java.nio.file.Files.createFile(root.resolve("manifests/v4.claim"))
      intercept[java.util.ConcurrentModificationException] {
        graft.sources.Snapshots.append(Seq((9L, "z")).toDF("id", "x"), r)
      }
      assert(graft.sources.Snapshots.abandonedClaims(s, r) == Seq(4L))
      graft.sources.Snapshots.releaseClaim(s, r, 4L)
      graft.sources.Snapshots.append(Seq((9L, "z")).toDF("id", "x"), r) // v4
      assert(ids() == Set(1L, 2L, 3L, 9L))
      // a completed commit's claim is NOT releasable
      intercept[IllegalArgumentException] {
        graft.sources.Snapshots.releaseClaim(s, r, 4L)
      }
      assert(graft.sources.Snapshots.abandonedClaims(s, r).isEmpty)
    } finally {
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("warc segmented records: chains round-trip, incomplete chains flagged, orphans dropped") {
    val s = spark
    import s.implicits._
    // bodies straddling the chunk size in both directions + non-ASCII
    // (byte framing must hold when chars != bytes) + an exact-multiple
    val docs = Seq(
      (1L, "a" * 25),            // 3 segments of chunk 10
      (2L, "b" * 10),            // exactly one chunk -> unsegmented
      (3L, "cafeéü " * 4), // multibyte: 28 chars, 3 segments
      (4L, "short")              // unsegmented
    ).toDF("doc_id", "text")
    val segs = graft.sources.Warc.segmentRecords(docs,
      col("doc_id"), lit("resource"),
      concat(lit("https://x.org/d/"), col("doc_id")),
      lit("2026-01-01T00:00:00Z"), lit("text/plain"), col("text"),
      chunkChars = 10)
    // parse the concatenated segment stream through the kernel route
    val blob = segs.orderBy(col("doc_id"), col("rec")).select("rec")
      .collect().map(_.getAs[Array[Byte]](0)).reduce(_ ++ _)
    val parsed = s.createDataset(Seq(blob))(org.apache.spark.sql.Encoders.BINARY)
      .toDF("bytes")
      .select(inline(graft.sources.Warc.warcRecords(col("bytes"))))
    assert(parsed.count() == 3 + 1 + 3 + 1)
    val out = graft.sources.Warc.reassembleSegmented(parsed)
      .select(col("target_uri"), decode(col("body"), "UTF-8").as("t"),
        col("n_segments"), col("complete"))
      .collect().map(r => (r.getString(0), (r.getString(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(out.size == 4)
    assert(out("https://x.org/d/1") == (("a" * 25, 3L, true)))
    assert(out("https://x.org/d/2") == (("b" * 10, 1L, true)))
    assert(out("https://x.org/d/3") == (("cafeéü " * 4, 3L, true)))
    assert(out("https://x.org/d/4") == (("short", 1L, true)))
    // drop doc 1's MIDDLE continuation: chain incomplete, never a
    // silently short body claimed complete; orphan continuations
    // (first segment gone entirely) vanish
    val broken = parsed.where(!(col("segment_origin_id") === "<urn:graft:1>" &&
        col("segment_number") === 2L) || col("segment_origin_id").isNull)
      .where(!(col("record_id") === "<urn:graft:3>") || col("record_id").isNull)
    val out2 = graft.sources.Warc.reassembleSegmented(broken)
      .select(col("target_uri"), col("complete"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(out2("https://x.org/d/1") == false) // middle segment missing
    assert(!out2.contains("https://x.org/d/3")) // orphaned continuations dropped
    assert(out2("https://x.org/d/2") && out2("https://x.org/d/4"))
  }

  test("warc gzip writer: record-per-member .warc.gz round-trips through both read routes") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "hello"), (2L, "wörld — utf8"), (3L, "third"))
      .toDF("doc_id", "text")
    val recs = docs.select(graft.sources.Warc.buildWarcResponse(
      concat(lit("https://g.example/"), col("doc_id").cast("string")),
      lit("2026-01-01T00:00:00Z"), col("text")).as("rec"))
    val dir = java.nio.file.Files.createTempDirectory("graft-warcgzspec")
    try {
      graft.sources.Warc.writeSegments(recs.repartition(2), "rec",
        dir.toString, gzipPerRecord = true)
      val files = java.nio.file.Files.list(dir).iterator()
      var gzCount = 0
      while (files.hasNext) {
        val f = files.next()
        assert(f.getFileName.toString.endsWith(".warc.gz"), f.toString)
        // each member is an independent gzip stream: the FIRST member
        // alone must inflate to exactly one well-formed record
        val bytes = java.nio.file.Files.readAllBytes(f)
        assert((bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b)
        gzCount += 1
      }
      assert(gzCount == 2, s"expected 2 segments, got $gzCount")
      // route 1: binaryFile + kernel
      val viaKernel = graft.sources.Warc.readWarc(s, dir.toString)
        .select(col("target_uri"), col("body").cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      // route 2: the V2 connector
      val viaConn = s.read.format("warc").load(dir.toString)
        .select(col("target_uri"), col("body").cast("string"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val want = Set(
        ("https://g.example/1", "hello"),
        ("https://g.example/2", "wörld — utf8"),
        ("https://g.example/3", "third"))
      assert(viaKernel == want, viaKernel.toString)
      assert(viaConn == want, viaConn.toString)
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("buildWarcRecord: warcinfo omits Target-URI; request body is kept verbatim") {
    val s = spark
    import s.implicits._
    val one = Seq(1L).toDF("id")
    val reqHttp = "GET /x HTTP/1.1\r\nHost: h\r\n\r\n"
    val blob = one.select(concat(
      graft.sources.Warc.buildWarcRecord(lit("warcinfo"),
        lit(null).cast("string"), lit("2026-01-01T00:00:00Z"),
        lit("application/warc-fields"), lit("k: v")),
      graft.sources.Warc.buildWarcRecord(lit("request"),
        lit("https://h/x"), lit("2026-01-01T00:00:00Z"),
        lit("application/http; msgtype=request"), lit(reqHttp))).as("b"))
    val got = blob.select(explode(graft.sources.Warc.warcRecords(col("b"))).as("r"))
      .select(col("r.warc_type"), col("r.target_uri"),
        col("r.http_status"), col("r.content_type"), col("r.body").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getString(3), r.getString(4))).toSeq
    assert(got == Seq(
      ("warcinfo", null, -1, "application/warc-fields", "k: v"),
      ("request", "https://h/x", -1, "application/http; msgtype=request", reqHttp)),
      got.toString)
    // the raw warcinfo header block really has no Target-URI line
    val raw = new String(blob.head().getAs[Array[Byte]](0), "UTF-8")
    assert(!raw.substring(0, raw.indexOf("request")).contains("WARC-Target-URI"))
  }

  test("WET/WAT sidecars: conversion + metadata records round-trip; non-ASCII byte framing; htmlExtract parity") {
    val s = spark
    import s.implicits._
    // non-ASCII body: Content-Length is the UTF-8 BYTE length, so a
    // multi-byte payload must round-trip without truncating or
    // derailing the record that follows it
    val wetText = "café résumé — 中文 text ✓"
    val watJson = """{"Envelope":{"WARC-Header-Metadata":{"WARC-Target-URI":"https://h/1"},"Payload-Metadata":{"Actual-Content-Length":7}}}"""
    val blob = Seq(1L).toDF("id").select(concat(
      graft.sources.Warc.buildWetConversion(lit("https://h/1"),
        lit("2026-03-01T00:00:00Z"), lit("<urn:uuid:w1>"), lit(wetText)),
      graft.sources.Warc.buildWatMetadata(lit("https://h/1"),
        lit("2026-03-01T00:00:00Z"), lit("<urn:uuid:w1>"), lit(watJson))).as("b"))
    val got = blob.select(explode(graft.sources.Warc.warcRecords(col("b"))).as("r"))
      .select(col("r.warc_type"), col("r.content_type"), col("r.refers_to"),
        col("r.body").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSeq
    assert(got == Seq(
      ("conversion", "text/plain", "<urn:uuid:w1>", wetText),
      ("metadata", "application/json", "<urn:uuid:w1>", watJson)), got.toString)
    // WET payload equals the builder's own htmlExtract output (the
    // sidecar IS the extracted text, nothing re-derived): frame the
    // extraction of a synthetic page and parse it back
    val docs = Seq((7L, "plain body text with & ampersand")).toDF("doc_id", "text")
    val ext = operators.Web.htmlExtract(
      docs.select(col("doc_id"),
        operators.Web.syntheticHtml(col("doc_id"), col("text")).as("html")),
      "doc_id", "html")
    val extText = ext.head().getAs[String]("text")
    val roundTrip = ext.select(graft.sources.Warc.buildWetConversion(
        lit("https://h/7"), lit("2026-03-01T00:00:00Z"), lit("<urn:uuid:w7>"),
        col("text")).as("b"))
      .select(explode(graft.sources.Warc.warcRecords(col("b"))).as("r"))
      .select(col("r.body").cast("string")).head().getString(0)
    assert(roundTrip == extText, s"'$roundTrip' != '$extText'")
    // and the JSON engine reads the WAT envelope fields back out
    val uri = blob.select(explode(graft.sources.Warc.warcRecords(col("b"))).as("r"))
      .where(col("r.warc_type") === "metadata")
      .select(JsonFunctions.json_get_str(col("r.body").cast("string"),
        lit("Envelope"), lit("WARC-Header-Metadata"), lit("WARC-Target-URI")))
      .head().getString(0)
    assert(uri == "https://h/1")
  }

  test("buildWarcRevisit: profile + refers-to round-trip through kernel AND connector; NULL on other types") {
    val s = spark
    import s.implicits._
    val hdrBody = "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
    val profile = "http://netpreserve.org/warc/1.0/revisit/identical-payload-digest"
    val one = Seq(1L).toDF("id")
    val blob = one.select(concat(
      graft.sources.Warc.buildWarcResponse(lit("https://h/x"),
        lit("2026-01-01T00:00:00Z"), lit("payload")),
      graft.sources.Warc.buildWarcRevisit(lit("https://h/x"),
        lit("2026-02-01T00:00:00Z"), lit("<urn:uuid:abc>"), lit(hdrBody))).as("b"))
    // kernel route
    val got = blob.select(explode(graft.sources.Warc.warcRecords(col("b"))).as("r"))
      .select(col("r.warc_type"), col("r.warc_date"), col("r.warc_profile"),
        col("r.refers_to"), col("r.body").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4))).toSeq
    assert(got == Seq(
      ("response", "2026-01-01T00:00:00Z", null, null, "payload"),
      // the revisit body is the truncated HTTP block VERBATIM — the
      // envelope strip applies only to response records
      ("revisit", "2026-02-01T00:00:00Z", profile, "<urn:uuid:abc>", hdrBody)),
      got.toString)
    // connector route: same fields through format("warc")
    val dir = java.nio.file.Files.createTempDirectory("graft-warcrevspec")
    try {
      graft.sources.Warc.writeSegments(blob.withColumnRenamed("b", "rec"),
        "rec", dir.toString)
      val viaConn = s.read.format("warc").load(dir.toString)
        .select(col("warc_type"), col("warc_profile"), col("refers_to"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
        .sortBy(_._1)
      assert(viaConn == Seq(
        ("response", null, null),
        ("revisit", profile, "<urn:uuid:abc>")), viaConn.toString)
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("snapshot tags: pin versions across expire, move, drop; garbled refs skipped") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-snaptagspec")
    try {
      val r = root.toString
      graft.sources.Snapshots.append(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), r)
      graft.sources.Snapshots.append(Seq((3L, "c")).toDF("id", "x"), r)
      graft.sources.Snapshots.overwrite(Seq((9L, "z")).toDF("id", "x"), r)
      graft.sources.Snapshots.tag(s, r, "gold", 1L)
      assert(graft.sources.Snapshots.tags(s, r) == Map("gold" -> 1L))
      // tagging a non-version or a bad name fails loudly
      intercept[IllegalArgumentException] {
        graft.sources.Snapshots.tag(s, r, "oops", 99L)
      }
      intercept[IllegalArgumentException] {
        graft.sources.Snapshots.tag(s, r, "../escape", 1L)
      }
      // all-dot names are path navigation, not names: refs/.. would
      // escape the refs directory (and dropTag("..") would target the
      // table root); Unicode letters fail the ASCII contract too
      intercept[IllegalArgumentException] {
        graft.sources.Snapshots.tag(s, r, "..", 1L)
      }
      intercept[IllegalArgumentException] {
        graft.sources.Snapshots.tag(s, r, ".", 1L)
      }
      intercept[IllegalArgumentException] {
        graft.sources.Snapshots.tag(s, r, "café", 1L)
      }
      // expire keeps the tagged v1 plus the keepLast horizon
      graft.sources.Snapshots.expire(s, r, keepLast = 1)
      assert(graft.sources.Snapshots.versions(s, r) == Seq(1L, 3L))
      assert(graft.sources.Snapshots.readTag(s, r, "gold")
        .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
      // a moved ref reads the new target; readTag resolves at plan time
      graft.sources.Snapshots.tag(s, r, "gold", 3L)
      assert(graft.sources.Snapshots.readTag(s, r, "gold")
        .select("id").collect().map(_.getLong(0)).toSet == Set(9L))
      // garbled ref files are skipped, not fatal
      java.nio.file.Files.write(root.resolve("refs/junk"),
        "not a number".getBytes("UTF-8"))
      java.nio.file.Files.deleteIfExists(root.resolve("refs/.junk.crc"))
      assert(graft.sources.Snapshots.tags(s, r) == Map("gold" -> 3L))
      // dropping the tag makes v1... the tag is gone; reads fail loudly
      graft.sources.Snapshots.dropTag(s, r, "gold")
      intercept[IllegalArgumentException] {
        graft.sources.Snapshots.readTag(s, r, "gold")
      }
      // and the untagged old version is now expirable
      graft.sources.Snapshots.expire(s, r, keepLast = 1)
      assert(graft.sources.Snapshots.versions(s, r) == Seq(3L))
    } finally {
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("snapshot branches: writable lineages, two-writer conflict, expire protection, garbled-pointer skip") {
    val s = spark
    import s.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-snapbranch")
    try {
      val r = root.toString
      import graft.sources.Snapshots
      Snapshots.append(Seq((1L, "a"), (2L, "b")).toDF("id", "x"), r)
      Snapshots.append(Seq((3L, "c")).toDF("id", "x"), r)
      // branch from v1; main keeps moving independently
      Snapshots.createBranch(s, r, "exp", fromVersion = 1L)
      intercept[IllegalArgumentException] { Snapshots.createBranch(s, r, "exp") }
      intercept[IllegalArgumentException] {
        Snapshots.createBranch(s, r, "bad", fromVersion = 99L)
      }
      assert(Snapshots.branches(s, r) == Map("exp" -> 1L))
      assert(Snapshots.readBranch(s, r, "exp")
        .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
      val s2 = Snapshots.appendToBranch(Seq((10L, "z")).toDF("id", "x"), r, "exp")
      assert(s2 == 2L)
      assert(Snapshots.readBranch(s, r, "exp")
        .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 10L))
      // per-branch time travel; main NEVER saw the branch commit
      assert(Snapshots.readBranch(s, r, "exp", seq = 1L)
        .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
      assert(Snapshots.read(s, r)
        .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
      assert(Snapshots.currentVersion(s, r) == 2L)
      // TWO-WRITER RACE on the pointer flip: writer A reads the head,
      // writer B commits (wins seq 3), then A's commit replays with its
      // STALE observed state — A must get the retryable conflict error,
      // B's commit must be intact, and A's orphan manifest must never
      // become readable (no corruption)
      val staleA = Snapshots.branchState(s, r, "exp")
      val s3 = Snapshots.appendToBranch(Seq((12L, "B")).toDF("id", "x"), r, "exp")
      assert(s3 == 3L)
      intercept[java.util.ConcurrentModificationException] {
        Snapshots.commitToBranchAt(Seq((11L, "A")).toDF("id", "x"), r, "exp",
          replace = false, observed = staleA)
      }
      assert(Snapshots.branches(s, r) == Map("exp" -> 3L))
      assert(Snapshots.readBranch(s, r, "exp")
        .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 10L, 12L))
      // the loser retries through the public path: head re-read, commit
      // lands at seq 4 ON TOP of B's
      val s4 = Snapshots.appendToBranch(Seq((11L, "A")).toDF("id", "x"), r, "exp")
      assert(s4 == 4L)
      assert(Snapshots.branches(s, r) == Map("exp" -> 4L))
      assert(Snapshots.readBranch(s, r, "exp")
        .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 10L, 11L, 12L))
      // a garbled pointer (writer crashed between create and content
      // write — manifest never referenced) is SKIPPED by readers and
      // the slot burned by the next writer
      val ptr = root.resolve("branches/exp/p000000005")
      java.nio.file.Files.write(ptr, "doesnotexist".getBytes("UTF-8"))
      assert(Snapshots.branches(s, r) == Map("exp" -> 4L))
      val s6 = Snapshots.appendToBranch(Seq((13L, "c")).toDF("id", "x"), r, "exp")
      assert(s6 == 6L)
      assert(Snapshots.readBranch(s, r, "exp")
        .select("id").collect().map(_.getLong(0)).toSet ==
          Set(1L, 2L, 10L, 11L, 12L, 13L))
      // overwriteBranch replaces branch contents only
      Snapshots.overwriteBranch(Seq((20L, "q")).toDF("id", "x"), r, "exp")
      assert(Snapshots.readBranch(s, r, "exp")
        .select("id").collect().map(_.getLong(0)).toSet == Set(20L))
      assert(Snapshots.read(s, r)
        .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
      // expire protects every data dir a branch manifest references:
      // v1's dir is branch-referenced even after main expires past it
      Snapshots.overwrite(Seq((30L, "m")).toDF("id", "x"), r)
      Snapshots.expire(s, r, keepLast = 1)
      assert(Snapshots.readBranch(s, r, "exp", seq = 2L)
        .select("id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 10L))
      // PUBLISH: the next MAIN version reads exactly the branch head —
      // a manifest-level fast-forward, no data moved
      val pv = Snapshots.publishBranch(s, r, "exp")
      assert(Snapshots.currentVersion(s, r) == pv)
      assert(Snapshots.read(s, r)
        .select("id").collect().map(_.getLong(0)).toSet == Set(20L))
      // dropBranch releases the pins; the published main version keeps
      // the branch's dirs alive through its own manifest
      Snapshots.dropBranch(s, r, "exp")
      assert(Snapshots.branches(s, r) == Map.empty)
      Snapshots.expire(s, r, keepLast = 1)
      assert(Snapshots.read(s, r)
        .select("id").collect().map(_.getLong(0)).toSet == Set(20L))
      intercept[Exception] {
        Snapshots.readBranch(s, r, "exp").collect()
      }
    } finally {
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("hitsFixed: hand-computed hub/authority rounds on a tiny bipartite graph") {
    val s = spark
    import s.implicits._
    // a→x, b→x, b→y: b feeds more content (bigger hub), x is endorsed
    // by more hubs (bigger authority)
    val edges = Seq(("a", "x"), ("b", "x"), ("b", "y")).toDF("src", "dst")
    def run(iters: Int): Map[String, (Long, Long)] =
      Graph.hitsFixed(edges, "src", "dst", iters).collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // round 1: auth raw x=2e6, y=1e6 → rescale: x=1e6, y=5e5;
    // hub raw a=1e6, b=1.5e6 → a=⌊1e12/1.5e6⌋=666666, b=1e6
    assert(run(1) == Map(
      "a" -> (666666L, 0L), "b" -> (1000000L, 0L),
      "x" -> (0L, 1000000L), "y" -> (0L, 500000L)), run(1).toString)
    // round 2: auth raw x=1666666, y=1e6 → x=1e6, y=⌊1e12/1666666⌋=600000;
    // hub raw a=1e6, b=1.6e6 → a=625000, b=1e6
    assert(run(2) == Map(
      "a" -> (625000L, 0L), "b" -> (1000000L, 0L),
      "x" -> (0L, 1000000L), "y" -> (0L, 600000L)), run(2).toString)
  }

  test("hitsFixed: checkpoint modes (local/durable, any cadence) are result-identical; run dir removed") {
    val s = spark
    import s.implicits._
    val edges = Seq(("a", "x"), ("b", "x"), ("b", "y"), ("c", "y"),
      ("c", "z"), ("a", "z")).toDF("src", "dst")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("node").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val everyRound = rows(Graph.hitsFixed(edges, "src", "dst", 7))
    val sparse = rows(Graph.hitsFixed(edges, "src", "dst", 7, checkpointEvery = 3))
    val cpRoot = java.nio.file.Files.createTempDirectory("graft-hitscp")
    try {
      val durable = rows(Graph.hitsFixed(edges, "src", "dst", 7,
        checkpointDir = cpRoot.toString, checkpointEvery = 2))
      assert(everyRound == sparse && sparse == durable,
        s"modes diverged:\n$everyRound\n$sparse\n$durable")
      // per-run hits_<uuid> dir deleted before returning
      val leftovers = java.nio.file.Files.list(cpRoot).count()
      assert(leftovers == 0L, s"run dir leaked: $leftovers entries under $cpRoot")
    } finally {
      java.nio.file.Files.walk(cpRoot).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("tokenEntropy: hand-computed fold; uniform beats repeated at equal length") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a a b"),          // c = {a:2, b:1}
      (2L, "x x x x"),        // degenerate: one token repeated
      (3L, "p q r s")).toDF("doc_id", "text") // uniform: max entropy
    val got = TextOps.tokenEntropy(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSeq
    val f1 = math.floor(1e6 * 2.0 * Math.log(2.0)).toLong // a:2 term
    assert(got(0) == (1L, 3L, 2L, f1,
      Math.log(3.0) - (f1.toDouble / 1e6) / 3.0), got(0).toString)
    val f2 = math.floor(1e6 * 4.0 * Math.log(4.0)).toLong
    assert(got(1) == (2L, 4L, 1L, f2,
      Math.log(4.0) - (f2.toDouble / 1e6) / 4.0), got(1).toString)
    assert(got(2) == (3L, 4L, 4L, 0L, Math.log(4.0)), got(2).toString)
    // the signal orders as theory says: uniform > mixed > degenerate
    assert(got(2)._5 > got(0)._5 && got(0)._5 > got(1)._5)
    // degenerate entropy is ~0 (exact up to the 1e-6/n quantization)
    assert(math.abs(got(1)._5) < 1e-6)
  }

  test("warcRecords: multi-record split, gzip members, HTTP envelope strip, truncated tail") {
    val s = spark
    import s.implicits._
    def rec(url: String, body: String, date: String = "2026-01-01T00:00:00Z"): Array[Byte] = {
      val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: ${body.length}\r\n\r\n$body"
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $url\r\nWARC-Date: $date\r\n" +
        s"Content-Type: application/http; msgtype=response\r\nContent-Length: ${http.length}\r\n\r\n$http\r\n\r\n")
        .getBytes("UTF-8")
    }
    val info = ("WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n" +
      "Content-Length: 10\r\n\r\nrobots: ok\r\n\r\n").getBytes("UTF-8")
    val blob = info ++ rec("https://a.example/", "hello world") ++
      rec("https://b.example/", "second doc")
    val rows = Seq((1L, blob)).toDF("id", "bin")
    val got = rows.select(explode(graft.sources.Warc.warcRecords(col("bin"))).as("r"))
      .select(col("r.warc_type"), col("r.target_uri"), col("r.http_status"),
        col("r.content_type"), col("r.body").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getString(3), r.getString(4))).toSeq
    assert(got == Seq(
      ("warcinfo", null, -1, "application/warc-fields", "robots: ok"),
      ("response", "https://a.example/", 200, "text/html", "hello world"),
      ("response", "https://b.example/", 200, "text/html", "second doc")), got.toString)
    // non-ASCII body: Content-Length must be BYTES — a char-counted
    // frame would truncate the record and derail everything after it
    val uni = rows.sparkSession.sql("SELECT 'café — ok' AS b, 'https://u.example/' AS u")
    val uniRec = uni.select(graft.sources.Warc.buildWarcResponse(
        col("u"), lit("2026-01-01T00:00:00Z"), col("b")).as("r"))
      .head().getAs[Array[Byte]](0)
    val gotUni = Seq((1L, uniRec ++ rec("https://after.example/", "tail")))
      .toDF("id", "bin")
      .select(explode(graft.sources.Warc.warcRecords(col("bin"))).as("r"))
      .select(col("r.target_uri"), col("r.body").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(gotUni == Seq(
      ("https://u.example/", "café — ok"),
      ("https://after.example/", "tail")), gotUni.toString)

    // a malformed HTTP envelope whose CRLFCRLF terminator sits exactly at
    // the payload edge (headers, no body) must NOT compute a negative
    // body slice — the record parses with an empty body
    val hdrOnly = "HTTP/1.1 204 No Content\r\nContent-Type: text/x\r\n\r\n"
    val edge = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://e.example/\r\n" +
      s"Content-Length: ${hdrOnly.length}\r\n\r\n$hdrOnly\r\n\r\n").getBytes("UTF-8")
    val gotEdge = Seq((1L, edge)).toDF("id", "bin")
      .select(explode(graft.sources.Warc.warcRecords(col("bin"))).as("r"))
      .select(col("r.http_status"), length(col("r.body")))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(gotEdge == Seq((204, 0)), gotEdge.toString)
    // and one whose terminator is TRUNCATED by the declared length keeps
    // the raw payload as the body instead of throwing
    val cutHttp = "HTTP/1.1 200 OK\r\nContent-Type: text/x\r\n\r"
    val mal = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://m.example/\r\n" +
      s"Content-Length: ${cutHttp.length}\r\n\r\n$cutHttp\r\n\r\n").getBytes("UTF-8")
    val gotMal = Seq((1L, mal)).toDF("id", "bin")
      .select(explode(graft.sources.Warc.warcRecords(col("bin"))).as("r"))
      .select(col("r.body").cast("string"))
      .collect().map(_.getString(0)).toSeq
    assert(gotMal == Seq(cutHttp), gotMal.toString)

    // a Content-Length near Int.MaxValue must not wrap the bounds check
    // negative (Int overflow) and crash the copy — the record is simply
    // an incomplete tail; the valid prefix before it survives
    val bomb = (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x.example/\r\n" +
      "Content-Length: 2147483647\r\n\r\nbody\r\n\r\n").getBytes("UTF-8")
    val gotBomb = Seq((1L, rec("https://ok.example/", "fine") ++ bomb)).toDF("id", "bin")
      .select(explode(graft.sources.Warc.warcRecords(col("bin"))).as("r"))
      .select(col("r.target_uri")).collect().map(_.getString(0)).toSeq
    assert(gotBomb == Seq("https://ok.example/"), gotBomb.toString)

    // a truncated tail keeps the valid prefix
    val cut = blob.dropRight(30) // slices into the last record's payload
    val gotCut = Seq((1L, cut)).toDF("id", "bin")
      .select(size(graft.sources.Warc.warcRecords(col("bin"))))
      .head().getInt(0)
    assert(gotCut == 2, s"expected 2 surviving records, got $gotCut")
    // Common Crawl layout: one gzip MEMBER per record, concatenated
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val gzBlob = gz(info) ++ gz(rec("https://a.example/", "hello world")) ++
      gz(rec("https://b.example/", "second doc"))
    val gotGz = Seq((1L, gzBlob)).toDF("id", "bin")
      .select(explode(graft.sources.Warc.warcRecords(col("bin"))).as("r"))
      .select(col("r.target_uri")).collect().map(_.getString(0)).toSeq
    assert(gotGz == Seq(null, "https://a.example/", "https://b.example/"), gotGz.toString)
    // the file-reader path end to end
    val dir = java.nio.file.Files.createTempDirectory("graft-warc")
    try {
      java.nio.file.Files.write(dir.resolve("part0.warc"), blob)
      java.nio.file.Files.write(dir.resolve("part1.warc.gz"), gzBlob)
      val df = graft.sources.Warc.readWarc(s, dir.toString)
      assert(df.count() == 6)
      assert(df.where(col("warc_type") === "response").count() == 4)
    } finally {
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  test("unicodeNormalize: NFC composes, NFKC folds compatibility chars, ASCII passes through") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "cafe\u0301"),              // e + combining acute (decomposed)
      (2L, "\uFB01sh \u00B2 \u2460"),  // fi ligature, superscript 2, circled 1
      (3L, "plain ascii"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val got = rows.select(col("id"),
        TextOps.unicodeNormalize(col("t"), "NFC").as("nfc"),
        TextOps.unicodeNormalize(col("t"), "NFKC").as("nfkc"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, "caf\u00E9", "caf\u00E9"),
      (2L, "\uFB01sh \u00B2 \u2460", "fish 2 1"),
      (3L, "plain ascii", "plain ascii"),
      (4L, null, null)), got.toString)
    // NFD decomposes the precomposed form back
    val nfd = rows.where(col("id") === 1)
      .select(TextOps.unicodeNormalize(
        TextOps.unicodeNormalize(col("t"), "NFC"), "NFD"))
      .head().getString(0)
    assert(nfd == "cafe\u0301", nfd)
    intercept[IllegalArgumentException] {
      graft.operators.UnicodeNormalize(null, "NFX")
    }
  }

  test("fixMojibake: inverts Latin-1 and cp1252 mangles, leaves genuine text alone") {
    val s = spark
    import s.implicits._
    def mangle(t: String): String = // UTF-8 bytes re-read as Latin-1
      new String(t.getBytes("UTF-8"), "ISO-8859-1")
    val clean = "caf\u00E9 \u2014 it\u2019s \u20AC5" // e-acute, em dash, curly quote, euro
    val rows = Seq(
      (1L, mangle(clean)),          // single mangle
      (2L, mangle(mangle(clean))),  // double mangle unwinds via fixpoint
      (3L, "caf\u00E9"),            // genuine Latin-1-range text: a lone
                                    // \u00E9 is invalid UTF-8 -> untouched
      (4L, "plain ascii"),          // ASCII short-circuit
      (5L, "\u4F60\u597D"),          // chars unmappable to bytes -> untouched
      (6L, null.asInstanceOf[String]),
      // cp1252-decoded mangle: the curly quote arrives as \u00E2\u20AC\u2122
      // (with a REAL euro sign), exercising the cp1252 inverse table
      (7L, new String("it\u2019s".getBytes("UTF-8"), "windows-1252"))).toDF("id", "t")
    // the single mangle of the curly quote really does route through the
    // cp1252 C1 range (0x80-0x9F), so the inverse table is exercised
    assert(mangle("\u2019") == "\u00E2\u0080\u0099", mangle("\u2019"))
    val got = rows.select(col("id"), TextOps.fixMojibake(col("t")).as("f"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq(
      (1L, clean), (2L, clean), (3L, "caf\u00E9"),
      (4L, "plain ascii"), (5L, "\u4F60\u597D"), (6L, null),
      (7L, "it\u2019s")), got.toString)
  }

  test("editDistancePairs: hand-computed distances; threshold excludes far pairs") {
    val s = spark
    import s.implicits._
    // lengths >= k = d+1 = 3 → all through the PassJoin segment path
    val rows = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fax"),   // 1 substitution from #1
      (3L, "the quick brown foxes"), // 2 insertions from #1, 3 edits from #2
      (4L, "a completely different")).toDF("id", "s")
    val got = Dedup.editDistancePairs(rows, "id", "s", maxDist = 2)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 2L)), got.toString)
  }

  test("editDistancePairs: brute-force parity, short strings through the banded path") {
    val s = spark
    import s.implicits._
    // deterministic mix of short (< k = d+1 = 3 chars) and long strings;
    // shorts exercise the length-banded pass, the short/long boundary
    // pairs exercise the union, empties exercise the degenerate segment
    val base = Seq("abcd", "abed", "ab", "", "x", "abcdefgh", "abcdefghij",
      "abcdefghijk", "zbcdefghij", "the quick brown fox jumps",
      "the quick brown fox jump", "completely unrelated words here")
    val rows = base.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "s")
    val d = 2
    val got = Dedup.editDistancePairs(rows, "id", "s", maxDist = d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force via the same builtin (oracle independence for the
    // DISTANCE comes from the DuckDB verify query; this spec proves the
    // candidate scheme loses nothing)
    val a = rows.select(col("id").as("id_a"), col("s").as("s_a"))
    val b = rows.select(col("id").as("id_b"), col("s").as("s_b"))
    val brute = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("dist") <= d)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "degenerate fixture: brute force found no pairs")
    assert(got == brute, s"got=$got brute=$brute")
  }

  test("redactCards: Luhn decides — valid cards masked, invalid/short/long digit runs survive") {
    val s = spark
    import s.implicits._
    // 4111111111111111 is the canonical Luhn-valid test PAN;
    // 4111111111111112 fails the checksum by one
    val rows = Seq(
      (1L, "pay with 4111111111111111 now"),               // valid, bare
      (2L, "pay with 4111 1111 1111 1111 now"),            // valid, grouped
      (3L, "pay with 4111-1111-1111-1112 now"),            // INVALID checksum
      (4L, "order 123456789012 shipped"),                  // 12 digits: not a candidate
      (5L, "id 41111111111111110000 tracked"),             // 20 digits: not a candidate
      (6L, "4111111111111111 and 5500005555555559 twice"), // two valid cards
      (7L, "no digits at all")).toDF("doc_id", "text")
    val got = TextOps.redactCards(rows, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got(0) == (1L, "pay with [CARD] now", 1L, 1L, 16L), got(0).toString)
    assert(got(1) == (2L, "pay with [CARD] now", 1L, 1L, 16L), got(1).toString)
    assert(got(2) == (3L, "pay with 4111-1111-1111-1112 now", 1L, 0L, 0L), got(2).toString)
    assert(got(3) == (4L, "order 123456789012 shipped", 0L, 0L, 0L), got(3).toString)
    assert(got(4) == (5L, "id 41111111111111110000 tracked", 0L, 0L, 0L), got(4).toString)
    assert(got(5) == (6L, "[CARD] and [CARD] twice", 2L, 2L, 32L), got(5).toString)
    assert(got(6) == (7L, "no digits at all", 0L, 0L, 0L), got(6).toString)
  }

  test("redactIbans: mod-97 decides — valid IBANs masked, SKUs and off-by-one checks survive") {
    val s = spark
    import s.implicits._
    // GB82WEST12345698765432 is the ISO 13616 specification's own
    // example IBAN; bumping one check digit breaks the mod-97 residue
    val rows = Seq(
      (1L, "wire to GB82WEST12345698765432 today"),      // valid
      (2L, "wire to GB83WEST12345698765432 today"),      // invalid check
      (3L, "sku AB12XYZ9 restocked"),                    // too short: not a candidate
      (4L, "DE75512108001245126199 arrived"),            // valid DE example
      (5L, "ref 1234567890123456789 pending"),           // digits-only: shape fails
      (6L, "no account here")).toDF("doc_id", "text")
    val got = TextOps.redactIbans(rows, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got(0) == (1L, "wire to [IBAN] today", 1L, 1L, 22L), got(0).toString)
    assert(got(1) == (2L, "wire to GB83WEST12345698765432 today", 1L, 0L, 0L), got(1).toString)
    assert(got(2) == (3L, "sku AB12XYZ9 restocked", 0L, 0L, 0L), got(2).toString)
    assert(got(3) == (4L, "[IBAN] arrived", 1L, 1L, 22L), got(3).toString)
    assert(got(4) == (5L, "ref 1234567890123456789 pending", 0L, 0L, 0L), got(4).toString)
    assert(got(5) == (6L, "no account here", 0L, 0L, 0L), got(5).toString)
  }

  test("unigramSegment: optimal cost/pieces vs exhaustive enumeration; seg reconstructs; tie-break longest-last") {
    val s = spark
    import s.implicits._
    // vocabulary dynamics on purpose: 'aa' is a frequent bigram piece,
    // but two 'a' singles are CHEAPER (a occurs 3x more) — greedy
    // longest-match would pick 'aa'; the Viterbi optimum must not
    val docs = Seq(
      (1L, "aa aa ab"),
      (2L, "aa b"),
      (3L, "abab baba"),
      (4L, "zz")).toDF("doc_id", "text")
    val vocab = TextOps.unigramVocab(docs, "doc_id", "text",
        maxPieceLen = 4, topPieces = 40)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // every single char of the corpus is in the vocab by construction
    assert(Set("a", "b", "z").subsetOf(vocab.keySet))
    val segd = TextOps.unigramSegment(docs, "doc_id", "text",
        maxPieceLen = 4, topPieces = 40)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    // exhaustive reference: enumerate EVERY segmentation of each word,
    // minimize (cost, pieces) lexicographically — algorithm-ignorant
    def allSegs(word: String): Seq[Seq[String]] =
      if (word.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, word.length)).flatMap { l =>
        val (h, t) = word.splitAt(l)
        if (vocab.contains(h)) allSegs(t).map(h +: _) else Seq.empty
      }
    def bestOf(word: String): (Long, Long) =
      allSegs(word).map(ps => (ps.map(vocab).sum, ps.length.toLong))
        .minBy { case (c, n) => (c, n) }
    for ((id, nWords, nPieces, costFp, seg) <- segd) {
      val text = docs.where(col("doc_id") === id).head().getString(1)
      val words = text.split(" ", -1).filter(_.nonEmpty)
      assert(nWords == words.length)
      val want = words.map(bestOf)
      assert(costFp == want.map(_._1).sum, s"doc $id cost: got $costFp want ${want.map(_._1).sum}")
      assert(nPieces == want.map(_._2).sum, s"doc $id pieces: got $nPieces want ${want.map(_._2).sum}")
      // the seg string reconstructs the text and uses only vocab pieces
      // whose costs sum to the reported optimum
      val segWords = seg.split(" ", -1)
      assert(segWords.map(_.replace("·", "")).mkString(" ") == text)
      val pieces = segWords.filter(_.nonEmpty).flatMap(_.split('·'))
      assert(pieces.forall(vocab.contains), pieces.mkString(","))
      assert(pieces.map(vocab).sum == costFp && pieces.length == nPieces)
    }
    // the non-greedy case is real on this fixture: 'aa' splits to a·a
    val seg1 = segd.find(_._1 == 1L).get._5
    assert(seg1.startsWith("a·a "), seg1)
    // tie-break: among (cost, pieces)-equal segmentations the LONGER
    // last piece wins — craft a vocab where 'ab'+'ab' ties any other
    // 2-piece split of 'abab' and check the emitted string is the
    // kernel's documented choice
    val segAbab = segd.find(_._1 == 3L).get._5.split(" ").head
    val abOptions = allSegs("abab")
      .map(ps => (ps.map(vocab).sum, ps.length.toLong, ps))
      .sortBy { case (c, n, _) => (c, n) }
    val (bc, bn, _) = abOptions.head
    val minimal = abOptions.takeWhile { case (c, n, _) => c == bc && n == bn }
    assert(minimal.exists(_._3.mkString("·") == segAbab),
      s"emitted '$segAbab' is not among the minimal segmentations $minimal")
  }

  test("unigramTrainEm: counts match the emitted segmentations; pruning keeps singles; trained vocab beats the seed objective") {
    val s = spark
    import s.implicits._
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .where(col("text").isNotNull).select(col("doc_id"), col("text"))
    val seed = TextOps.unigramVocab(docs, "doc_id", "text",
        maxPieceLen = 4, topPieces = 40)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toSeq.sortBy(_._1)
    val trainedRows = TextOps.unigramTrainEm(docs, "doc_id", "text",
        maxPieceLen = 4, topPieces = 40, emRounds = 2, pruneTo = 32)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val trained = trainedRows.map(t => t._1 -> t._3).toSeq.sortBy(_._1)
    // structural contract: every seed single char survives pruning, at
    // most 32 multi-char pieces remain, em_count >= 1 (add-one floor)
    val seedSingles = seed.map(_._1).filter(_.length == 1).toSet
    val trainedPieces = trainedRows.map(_._1).toSet
    assert(seedSingles.subsetOf(trainedPieces))
    assert(trainedRows.count(_._1.length > 1) <= 32)
    assert(trainedRows.forall(_._2 >= 1L))
    // E-step counts are EXACTLY what the emitted segmentations use:
    // segment the distinct-word table with the seed vocab and re-count
    // (kernel-consistency; the DuckDB oracle separately re-derives the
    // same counts from an independent SQL backtrack)
    val words = docs.select(explode(split(col("text"), " ")).as("wrd"))
      .where(length(col("wrd")) > 0)
      .groupBy("wrd").agg(count(lit(1)).as("wc"))
      .withColumn("doc_id", col("wrd"))
    val round1 = TextOps.unigramSegmentWith(
        words.select(col("doc_id"), col("wrd").as("text"), col("wc")),
        "doc_id", "text", seed, maxPieceLen = 4)
      .join(words.select(col("doc_id"), col("wc")), "doc_id")
      .select(col("wc"), explode(split(col("seg"), "·")).as("piece"))
      .groupBy("piece").agg(sum("wc").as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val step1 = TextOps.unigramEmStepPlan(words, seed, 4, 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    step1.foreach { case (p, smoothed) =>
      assert(smoothed == round1.getOrElse(p, 0L) + 1L,
        s"piece '$p': em_count $smoothed vs segmentation count ${round1.get(p)}")
    }
    // the trained vocab BEATS the seed on the corpus-level Viterbi
    // objective (total quantized -log2 likelihood): EM reweights pieces
    // by how the segmenter actually uses them, while seed costs
    // overcount overlapping substring occurrences
    def objective(vocab: Seq[(String, Long)]): Long =
      TextOps.unigramSegmentWith(docs, "doc_id", "text", vocab, 4)
        .agg(sum("cost_fp")).head().getLong(0)
    val seedObj = objective(seed)
    val trainedObj = objective(trained)
    assert(trainedObj < seedObj,
      s"EM did not improve the objective: seed=$seedObj trained=$trainedObj")
  }

  test("tokenEditDistancePairs: hand-computed distances; a swapped word costs 1") {
    val s = spark
    import s.implicits._
    val rows = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the fast brown fox jumps"),      // 1 substitution from #1
      (3L, "the quick brown fox"),           // 1 deletion from #1, 2 edits from #2
      (4L, "entirely different words here now")).toDF("id", "t")
      .select(col("id"), split(col("t"), " ").as("toks"))
    val got = Dedup.tokenEditDistancePairs(rows, "id", "toks", maxDist = 2)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 2L)), got.toString)
  }

  test("tokenEditDistancePairs: brute-force parity, short sequences through the banded path") {
    val s = spark
    import s.implicits._
    // deterministic mix: sequences shorter than k = d+1 = 3 tokens ride
    // the banded pass, boundary pairs the union, empties the degenerate
    // segment; longer near-duplicates the PassJoin path
    def seq(n: Int, f: Int => String) = (1 to n).map(f).mkString(" ")
    val base = Seq(
      "", "a", "a b",
      seq(8, i => s"t$i"), seq(8, i => if (i == 3) "X" else s"t$i"),
      seq(10, i => s"t$i"), seq(11, i => s"t$i"),
      seq(10, i => if (i == 9) "Y" else s"t$i"),
      "the quick brown fox jumps over the lazy dog",
      "the quick brown fox leaps over the lazy dog",
      "completely unrelated words in this row")
    val rows = base.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), split(col("t"), " ").as("toks"))
    val d = 2
    val got = Dedup.tokenEditDistancePairs(rows, "id", "toks", maxDist = d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force through the SAME kernel (candidate-scheme parity; the
    // kernel itself is pinned against the quadratic DP in
    // KernelPropertySpec, and the DuckDB oracle is engine-independent)
    val a = rows.select(col("id").as("id_a"), col("toks").as("s_a"))
    val b = rows.select(col("id").as("id_b"), col("toks").as("s_b"))
    val brute = a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("dist", org.apache.spark.sql.graft.GraftSqlShim.column(
        graft.operators.TokenLevenshtein(
          org.apache.spark.sql.graft.GraftSqlShim.expression(col("s_a")),
          org.apache.spark.sql.graft.GraftSqlShim.expression(col("s_b")),
          d)).cast("long"))
      .where(col("dist") >= 0 && col("dist") <= d)
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(brute.nonEmpty, "degenerate fixture: brute force found no pairs")
    assert(got == brute, s"got=$got brute=$brute")
  }

  test("editDistanceScreen: brute-force parity incl. batch-shorter-than-match (cross probes) and band edges") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox"),
      (101L, "the quick brown foxes"),  // longer partner for batch probes
      (102L, "ab"),                     // sub-k corpus string (banded)
      (103L, "completely different words entirely"),
      (104L, "x")).toDF("id", "t")
    val batch = Seq(
      (1L, "the quick brown fo"),       // SHORTER than both matches: la > lb probes
      (2L, "the quick brown foxes!!"),  // longer than both
      (3L, "abc"),                      // banded: near 102
      (4L, ""),                         // empty: near 102/104 within d=2
      (5L, "nothing like any of them"),
      (6L, "x z"),
      (7L, null.asInstanceOf[String])).toDF("id", "t") // NULL: one row back, matched=false
    val d = 2
    val got = Dedup.editDistanceScreen(batch, corpus, "id", "t", maxDist = d)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    // brute force: full cross with the SAME builtin + tiebreak; a NULL
    // batch string matches nothing but still yields its row
    val brute = batch.collect().map { br =>
      val (bid, bt) = (br.getLong(0), br.getString(1))
      val hits = if (bt == null) Array.empty[(Long, Long)]
      else corpus.collect().map { cr =>
        val (cid, ct) = (cr.getLong(0), cr.getString(1))
        val lev = {
          val a = bt; val b2 = ct
          val dp = Array.tabulate(a.length + 1, b2.length + 1) { (i, j) =>
            if (i == 0) j else if (j == 0) i else 0
          }
          for (i <- 1 to a.length; j <- 1 to b2.length)
            dp(i)(j) = math.min(
              dp(i - 1)(j - 1) + (if (a(i - 1) == b2(j - 1)) 0 else 1),
              math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
          dp(a.length)(b2.length)
        }
        (lev.toLong, cid)
      }.filter(_._1 <= d)
      if (hits.isEmpty) bid -> ((false, -1L, -1L))
      else { val m = hits.min; bid -> ((true, m._1, m._2)) }
    }.toMap
    assert(got == brute, s"got=$got\nbrute=$brute")
    // the cross-direction case really fired: batch 1 matched a LONGER string
    assert(got(1L)._1 && got(2L)._1 && got(3L)._1 && got(4L)._1 && !got(5L)._1)
    // NULL batch row came back, unmatched — not silently dropped
    assert(got(7L) == ((false, -1L, -1L)))
  }

  test("tokenEditDistanceScreen: brute-force parity over token sequences, both length directions") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps"),
      (101L, "the quick brown fox jumps over things"), // longer partner
      (102L, "a b"),                                   // sub-k (banded)
      (103L, "entirely different content here")).toDF("id", "t")
      .select(col("id"), split(col("t"), " ").as("toks"))
    val batch = Seq(
      (1L, "the quick brown fox"),          // shorter than both matches
      (2L, "the quick brown fox jumps over things wildly today"), // longer
      (3L, "a b c"),                        // banded near 102
      (4L, "totally unrelated words appear in this row")).toDF("id", "t")
      .select(col("id"), split(col("t"), " ").as("toks"))
    val d = 2
    val got = Dedup.tokenEditDistanceScreen(batch, corpus, "id", "toks", maxDist = d)
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    def tokLev(a: Seq[String], b: Seq[String]): Long = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1),
          math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
      dp(a.length)(b.length).toLong
    }
    val cRows = corpus.collect().map(r => (r.getLong(0), r.getSeq[String](1)))
    val brute = batch.collect().map { br =>
      val hits = cRows.map { case (cid, ct) =>
        (tokLev(br.getSeq[String](1), ct), cid)
      }.filter(_._1 <= d)
      if (hits.isEmpty) br.getLong(0) -> ((false, -1L, -1L))
      else { val m = hits.min; br.getLong(0) -> ((true, m._1, m._2)) }
    }.toMap
    assert(got == brute, s"got=$got\nbrute=$brute")
    assert(got(1L)._1 && got(2L)._1 && got(3L)._1 && !got(4L)._1)
  }

  test("containmentDedup: transitive chains collapse to one keeper per component") {
    val s = spark
    import s.implicits._
    val long = (1 to 40).map(i => s"tok$i").mkString(" ")
    val mid = (1 to 20).map(i => s"tok$i").mkString(" ")   // ⊂ long
    val short = (1 to 8).map(i => s"tok$i").mkString(" ")  // ⊂ mid ⊂ long
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, long), (2L, mid), (3L, short),   // one chain component
      (4L, other),                          // singleton
      (5L, null.asInstanceOf[String]),      // no shingles → singleton keeper
      (6L, "a b")                           // too short to shingle → singleton
    ).toDF("doc_id", "text")
    val got = Dedup.containmentDedup(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // per-pair dropping could keep 2 (drop vs 1) yet also keep 3 only
    // vs 2 — the component closure keeps exactly the minimum
    assert(got == Map(
      1L -> ((1L, true)), 2L -> ((1L, false)), 3L -> ((1L, false)),
      4L -> ((4L, true)), 5L -> ((5L, true)), 6L -> ((6L, true))), got.toString)
    // parity with a test-side union-find over the operator's own pairs,
    // on real data (pins the composition, not just the hand case)
    val real = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val pairs = Dedup.containmentPairs(real, "doc_id", "text", 3, 0.8)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = real.select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => id -> find(id)).toMap
    val full = Dedup.containmentDedup(real, "doc_id", "text", 3, 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == want, "cluster labels diverged from union-find over the same pairs")
  }

  test("multiPatternSearch / decontaminateExact: NULL contract and screen parity") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the table value table table table end"),
      (2L, "nothing relevant here"),
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val pats = Seq("table", "table table", "zzz")
    val rows = TextOps.multiPatternSearch(docs, "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    // doc 1: "table" at 5,17,23,29 (4 hits); "table table" at 17 and 23
    // (overlapping run of three tables); "zzz" absent; docs 2/3 no rows
    assert(rows == Set((1L, 0, 4, 5), (1L, 1, 2, 17)), rows.toString)
    val screen = TextOps.decontaminateExact(docs, "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSet
    assert(screen == Set((1L, 2, true), (2L, 0, false), (3L, 0, false)),
      screen.toString)
  }

  test("nearDupScreen: one shingle pass reproduces BOTH standalone screens exactly") {
    val s = spark
    val docs = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // signature recovery: per-gram affine components min-aggregated over
    // the postings == the fused MinHashSignature kernel, bit-for-bit
    val fused = docs.where(col("text").isNotNull)
      .select(col("doc_id"), Dedup.minhashSignature(col("text"), 3, 16).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val ex = docs.select(col("doc_id").as("vid"),
      explode(Dedup.shingles(col("text"), 3)).as("g"))
    val shim = org.apache.spark.sql.graft.GraftSqlShim
    val comp = ex.select(col("vid"), shim.column(
      operators.GramSigComponents(shim.expression(col("g")), 16)).as("c"))
    val mins = (0 until 16).map(j => min(element_at(col("c"), j + 1)).as(s"s$j"))
    val recovered = comp.groupBy(col("vid")).agg(mins.head, mins.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 16).map(r.getLong).toList).toMap
    assert(recovered == fused, "postings-recovered signatures diverged from the fused kernel")
    // answer parity: the one-pass screen == the two standalone operators
    val screen = Dedup.nearDupScreen(docs, "doc_id", "text",
      shingleSize = 3, numHashes = 16, bands = 4,
      jaccardThreshold = 0.5, overlapThreshold = 0.9)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val gotLsh = pairs(screen.where(col("kind") === "jaccard_est")
      .select(col("id_a"), col("id_b"), col("score")))
    val wantLsh = pairs(Dedup.minhashCandidatePairs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5)
      .select(col("id_a"), col("id_b"), col("est_jaccard")))
    assert(gotLsh == wantLsh, s"LSH branch diverged: ${gotLsh.size} vs ${wantLsh.size}")
    val gotCont = pairs(screen.where(col("kind") === "containment")
      .select(col("id_a"), col("id_b"), col("score")))
    val wantCont = pairs(Dedup.containmentPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.9)
      .select(col("id_a"), col("id_b"), col("overlap")))
    assert(gotCont == wantCont, s"containment branch diverged: ${gotCont.size} vs ${wantCont.size}")
  }

  test("incrementalNearDup: recall vs brute force stays bounded (the screen's miss budget)") {
    // q_incr_neardup's oracle now replays the LSH screen itself (so the
    // value comparison holds at any scale); THIS is where recall against
    // ground truth lives. Planted pairs sweep j from ~0.65 to 1.0 by
    // appending doc_id % 25 junk tokens to every corpus doc.
    val s = spark
    val corpus = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .where(col("text").isNotNull && length(col("text")) > 0)
    val junk = concat_ws(" ", (0 until 24).map(i =>
      when(pmod(col("doc_id"), lit(25)) > i, concat(lit(s"zz$i"), col("doc_id")))): _*)
    val batch = corpus.select((col("doc_id") + 100000L).as("doc_id"),
      concat(col("text"), lit(" "), junk).as("text"))
    // ground truth: brute-force exact Jaccard over the FULL screened pair
    // space — batch × (corpus ∪ smaller-id batch) — small enough to
    // cross-join at this fixture size
    val bsh = batch.select(col("doc_id").as("bid"),
      operators.Dedup.shingles(col("text"), 3).as("bs"))
    val osh = corpus.select(col("doc_id").as("oid"),
        operators.Dedup.shingles(col("text"), 3).as("os"))
      .unionAll(batch.select(col("doc_id").as("oid"),
        operators.Dedup.shingles(col("text"), 3).as("os")))
    val truth = bsh.crossJoin(osh)
      .where(col("oid") < lit(100000L) || col("oid") < col("bid"))
      .select(col("bid"),
        operators.Dedup.jaccard(col("bs"), col("os")).as("jac"))
      .where(col("jac") >= 0.7)
      .groupBy(col("bid")).agg(max(col("jac")).as("jac"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val qualifying = truth
    assert(qualifying.size > 200, s"fixture degenerate: ${qualifying.size} qualifying pairs")
    assert(qualifying.values.exists(_ < 0.8) && qualifying.values.exists(_ > 0.9),
      "fixture should sweep the threshold band")
    val found = operators.Dedup.incrementalNearDup(batch, corpus,
        "doc_id", "text", shingleSize = 3, numHashes = 16, bands = 8,
        threshold = 0.7)
      .where(!col("keep"))
      .collect().map(_.getLong(0)).toSet
    val missed = qualifying.keySet -- found
    val recall = 1.0 - missed.size.toDouble / qualifying.size
    // the documented miss modes: ~0.3% bucket miss + ~1% est-prefilter
    // miss near the threshold — a change that degrades the screen (4-row
    // bands lose ~12% at j≈0.85) fails here
    assert(recall >= 0.97, f"recall $recall%.4f (missed ${missed.size} of ${qualifying.size})")
    val missedHighJ = missed.filter(truth(_) >= 0.85)
    assert(missedHighJ.isEmpty,
      s"high-similarity pairs missed: ${missedHighJ.map(b => b -> truth(b))}")
    // precision is exact by construction (every candidate is verified
    // with exact Jaccard before dropping): no doc without a qualifying
    // partner may be dropped
    val overDropped = found -- qualifying.keySet
    assert(overDropped.isEmpty, s"dropped without a qualifying pair: $overDropped")
  }

  test("pageRankFixed: matches a sequential fixed-point reference") {
    val s = spark
    import s.implicits._
    // a small directed graph with a hub, a chain, and a reverse edge
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("d", "c"), ("c", "d")).toDF("src", "dst")
    val got = Graph.pageRankFixed(edges, "src", "dst", iterations = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // independent reference: same recurrence, plain Scala maps
    val e = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("d", "c"), ("c", "d"))
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    var rank = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 4) {
      val in = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => rank(u) * 85L / (100L * deg(u)) }.sum
      }
      rank = nodes.map(n => n -> (150000L + in.getOrElse(n, 0L))).toMap
    }
    assert(got == rank, s"got $got expected $rank")
    // duplicate edges collapse; the hub outranks the leaf
    assert(got("c") > got("b"))
  }

  test("pageRankFixed: checkpoint modes equal the plain run; plan depth stays bounded") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val edges = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
      ("d", "c"), ("c", "d"), ("b", "d")).toDF("src", "dst")
    def ranksOf(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def joinDepth(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case j: Join => j }.size
    // 20 rounds, well past the old 100-cap-era comfort zone for lineage
    val plain = Graph.pageRankFixed(edges, "src", "dst", iterations = 20,
      checkpointEvery = 1000) // never fires — the unbounded-lineage shape
    val local = Graph.pageRankFixed(edges, "src", "dst", iterations = 20,
      checkpointEvery = 5)
    val dir = java.nio.file.Files.createTempDirectory("graft-pr-ckpt").toString
    val durable = Graph.pageRankFixed(edges, "src", "dst", iterations = 20,
      checkpointDir = dir, checkpointEvery = 5)
    val want = ranksOf(plain)
    assert(ranksOf(local) == want, "localCheckpoint mode diverged")
    assert(ranksOf(durable) == want, "durable checkpoint mode diverged")
    // lineage truncation is real: the checkpointed plan carries at most
    // checkpointEvery iterations of joins, the plain one all 20
    assert(joinDepth(local) < joinDepth(plain),
      s"local=${joinDepth(local)} plain=${joinDepth(plain)}")
    assert(joinDepth(durable) < joinDepth(plain))
    // the per-run directory is deleted before returning — the final
    // ranks were materialized off it, so repeated runs leave no orphans
    val run = new java.io.File(dir).listFiles().filter(_.getName.startsWith("pr_"))
    assert(run.isEmpty, run.mkString(", "))
    Seq(plain, local, durable).foreach(_.unpersist())
  }

  test("stratifiedSampleSalted: identical to the plain rank at any salts") {
    val s = spark
    import s.implicits._
    // 80% of rows land in one hot stratum — the shape the salt exists for
    val docs = s.range(0, 3000).select(
      col("id").as("doc_id"),
      when(col("id") % 10 < 8, lit("hot"))
        .otherwise(concat(lit("s"), col("id") % 7)).as("source"))
    val plain = Curation.stratifiedSample(docs, "doc_id", "source", 25)
      .collect().map(_.getLong(0)).sorted.toSeq
    for (salts <- Seq(1, 3, 32)) {
      val salted = Curation.stratifiedSampleSalted(
          docs, "doc_id", "source", 25, salts = salts)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(salted == plain, s"salts=$salts diverged from the plain rank")
    }
  }

  test("tfidfTopTerms: scores and tie order match a naive reference") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "apple apple banana cherry"),
      (2L, "banana banana banana cherry"),
      (3L, "cherry date date date")).toDF("doc_id", "text")
    val got = TextOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    // cherry is in every doc → idf 0 → never outranks a rarer term;
    // rank-2 of doc 3 IS cherry (only two distinct terms scoreable)
    val n = 3.0
    def score(tf: Long, df: Long): Double =
      tf.toDouble * (math.log(n) - math.log(df.toDouble))
    assert(score(1, 3) == 0.0)
    assert(got == Seq(
      (1L, 1, "apple"), (1L, 2, "banana"),
      (2L, 1, "banana"), (2L, 2, "cherry"),
      (3L, 1, "date"), (3L, 2, "cherry")), got.toString)
  }

  test("assignSplits: deterministic, growth-stable, distribution-sane") {
    val s = spark
    import s.implicits._
    val small = s.range(0, 1000).toDF("id")
    val a = Curation.assignSplits(small, "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // growth stability: adding rows never reassigns existing ids
    val big = Curation.assignSplits(s.range(0, 5000).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.forall { case (id, sp) => big(id) == sp })
    // distribution tracks the 80/10/10 request (hash noise tolerated)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(math.abs(frac("train") - 0.8) < 0.05, frac.toString)
    assert(math.abs(frac("val") - 0.1) < 0.04, frac.toString)
    assert(math.abs(frac("test") - 0.1) < 0.04, frac.toString)
    // guards: fractions must be positive and sum to 100
    intercept[IllegalArgumentException] {
      Curation.assignSplits(small, "id", Seq(("a", 50), ("b", 40)))
    }
    // single-split degenerate case works
    val one = Curation.assignSplits(small, "id", Seq(("all", 100)))
      .select(col("split")).distinct().collect().map(_.getString(0)).toSeq
    assert(one == Seq("all"))
  }

  test("profileColumns: exact nulls + distincts in one pass") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None), (4L, Some("b")))
      .toDF("id", "v")
    val got = Curation.profileColumns(df, Seq("id", "v"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("id") == ((4L, 0L, 4L)))
    // n_distinct excludes the NULL, COUNT(DISTINCT) semantics
    assert(got("v") == ((4L, 1L, 2L)))
  }

  test("bpeSegment: trained merges tokenize docs; null/empty text → 0") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "low lower low"), (2L, "newest"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val merges = Seq(
      TextOps.BpeMerge(0, "l", "o", 3L), TextOps.BpeMerge(1, "lo", "w", 3L))
    val got = TextOps.bpeSegment(docs, "doc_id", "text", merges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // low → l,o,w → lo,w → low = 1 symbol; lower → low,e,r = 3;
    // newest → 6 chars untouched
    assert(got == Map(1L -> 5L, 2L -> 6L, 3L -> 0L, 4L -> 0L), got.toString)
  }

  test("bm25TopK: exact top-k matches a naive per-doc reference scorer") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "spark join join stream alpha beta"),
      (2L, "vector vector vector gamma"),
      (3L, "alpha beta gamma delta"), // no query term → excluded
      (4L, "spark spark spark spark join vector stream stream"),
      (5L, "stream"),
      (6L, "spark join vector stream"),
      (7L, "join join join join join join join join join join"))
    val terms = Seq("spark", "join", "vector", "stream")
    val k1 = 1.2; val b = 0.75
    // independent reference: naive in-memory BM25 over the same tokens
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
    val n = corpus.size.toDouble
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def score(id: Long): Double = terms.map { t =>
      val tf = toks(id).count(_ == t).toDouble
      val df = toks.values.count(_.contains(t)).toDouble
      val idf = math.log(n * 2.0 + 2.0) - math.log(df * 2.0 + 1.0)
      idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * toks(id).size / avgdl))
    }.reduce(_ + _)
    val expected = corpus.map(_._1).map(id => (id, score(id)))
      .filter(_._2 > 0).sortBy { case (id, sc) => (-sc, id) }.take(4)
    val got = TextOps.bm25TopK(corpus.toDF("doc_id", "text"),
        "doc_id", "text", terms, k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expected, s"got $got expected $expected")
    // zero-match docs never appear even when k exceeds the match count
    val all = TextOps.bm25TopK(corpus.toDF("doc_id", "text"),
        "doc_id", "text", terms, k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(1L, 2L, 4L, 5L, 6L, 7L))
  }

  test("KMV sketch: bottom-k hashes, distinct estimate, pairwise Jaccard") {
    val s = spark
    import s.implicits._
    def h63(v: String): Long =
      HashKernelsAccess.mix(HashKernelsAccess.fnv1a(v)) >>> 1
    // two sources sharing tokens 150..449 of each's 450; one duplicate row
    val rows = (0 until 450).map(i => ("a", s"tok$i")) ++
      (150 until 600).map(i => ("b", s"tok$i")) ++ Seq(("a", "tok5"))
    val df = rows.toDF("src", "v")
    val k = 32
    val model = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.map(h63).sorted.take(k)
    }
    val sk = Curation.kmvSketch(df, "src", "v", k).collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) => g -> rs.sortBy(_.getInt(2)).map(_.getLong(1)).toSeq }
    assert(sk == model.map { case (g, hs) => g -> hs.toSeq }, "sketch != model")
    // saturated estimate: the Beyer et al. form, computed independently
    val est = Curation.kmvDistinct(Curation.kmvSketch(df, "src", "v", k), k)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    for ((g, hs) <- model) {
      val (nk, hk, e) = est(g)
      assert(nk == k && hk == hs.last)
      assert(java.lang.Double.doubleToLongBits(e) ==
        java.lang.Double.doubleToLongBits((k - 1).toDouble * 9.223372036854775808e18 / hs.last.toDouble))
      assert(math.abs(e - 450.0) / 450.0 < 0.5, s"estimate $e far from 450")
    }
    // non-saturated sketch counts exactly
    val exact = Curation.kmvDistinct(Curation.kmvSketch(df, "src", "v", 1024), 1024)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(exact == Map("a" -> 450.0, "b" -> 450.0), exact.toString)
    // Jaccard: replay the estimator on the model sketches; true J = 300/750
    val uni = (model("a") ++ model("b")).distinct.sorted.take(k)
    val expInter = uni.count(h => model("a").contains(h) && model("b").contains(h))
    val jac = Curation.kmvJaccard(df, "src", "v", k).collect()
    assert(jac.length == 1)
    val r = jac.head
    assert((r.getString(0), r.getString(1)) == ("a", "b"))
    assert(r.getLong(2) == uni.size && r.getLong(3) == expInter.toLong)
    assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ==
      java.lang.Double.doubleToLongBits(expInter.toDouble / uni.size.toDouble))
    assert(math.abs(r.getDouble(4) - 300.0 / 750.0) < 0.25)
  }

  test("KmvAggregator: identical rows to the window-sort sketch; merge dedups and bounds") {
    val s = spark
    import s.implicits._
    val rows = (0 until 450).map(i => ("a", s"tok$i")) ++
      (150 until 600).map(i => ("b", s"tok$i")) ++ Seq(("a", "tok5"))
    val df = rows.toDF("src", "v").repartition(7) // force partial merges
    for (k <- Seq(32, 1024)) {
      val a = Curation.kmvSketchAgg(df, "src", "v", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      val w = Curation.kmvSketch(df, "src", "v", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
      assert(a == w, s"k=$k: aggregator vs window sketch differ")
    }
    // direct unit check of the merge path: overlap dedup + k bound
    val agg = new Curation.KmvAggregator(4)
    val m = agg.merge(Curation.KmvBuf(Array(1L, 3L, 5L, 7L)),
      Curation.KmvBuf(Array(2L, 3L, 6L, 9L)))
    assert(m.hs.toSeq == Seq(1L, 2L, 3L, 5L))
    assert(agg.reduce(m, 0L).hs.toSeq == Seq(0L, 1L, 2L, 3L))
    assert(agg.reduce(m, 9L).hs.toSeq == m.hs.toSeq) // beyond h_k: rejected
  }

  test("sampleQuantiles: exact order statistics when unsaturated; deterministic sample") {
    val s = spark
    import s.implicits._
    val data = (1L to 100L).map(i => ("g", i, Some((i * 7 % 101).toDouble))) ++
      Seq(("g", 101L, Option.empty[Double])) // NULL value excluded
    val df = data.toDF("src", "id", "v")
    // k ≥ n: the sample IS the data, so est(p) = the ceil(p·100/100)-th
    // = p-th smallest value exactly
    val sorted = (1L to 100L).map(i => (i * 7 % 101).toDouble).sorted
    val got = Curation.sampleQuantiles(df, "src", "id", "v",
        k = 1000, percents = Seq(1, 50, 99, 100))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got == Map(1L -> (100L, sorted(0)), 50L -> (100L, sorted(49)),
      99L -> (100L, sorted(98)), 100L -> (100L, sorted(99))), got.toString)
    // k < n: sample = rows with the 16 smallest id-hashes (model replay)
    val k = 16
    val sampleIds = (1L to 100L).sortBy(i => HashKernelsAccess.mix(i) >>> 1).take(k)
    val sVals = sampleIds.map(i => (i * 7 % 101).toDouble).sorted
    val got2 = Curation.sampleQuantiles(df, "src", "id", "v",
        k = k, percents = Seq(50))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got2.toSeq == Seq((50L, k.toLong, sVals((50 * k + 99) / 100 - 1))), got2.mkString)
  }

  test("bm25TopKIndexed: bit-identical to the scan path; index read is pruned") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "spark join join stream alpha beta"),
      (2L, "vector vector vector gamma"),
      (3L, "alpha beta gamma delta"),
      (4L, "spark spark spark spark join vector stream stream"),
      (5L, "stream"),
      (6L, ""), // single empty token
      (7L, null.asInstanceOf[String]), // dl = -1, no postings
      (8L, "join join join join join alpha"))
    val docs = corpus.toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-invidx-test")
    try {
      TextOps.buildInvertedIndex(docs, "doc_id", "text", tmp.toString,
        termBuckets = 8)
      // meta replicates the scan path's stats: NULL text → NULL dl,
      // skipped by the sum (not −1 — size(NULL) is NULL in Spark 4)
      val meta = s.read.parquet(s"$tmp/meta").collect()(0)
      assert(meta.getAs[Long]("n") == 8L)
      assert(meta.getAs[Long]("sdl") ==
        corpus.flatMap { case (_, t) =>
          Option(t).map(_.split(" ", -1).length.toLong) }.sum)
      for (terms <- Seq(Seq("spark", "join", "vector", "stream"),
          Seq("absentterm", "spark"), Seq("alpha"), Seq("absentterm"))) {
        val scan = TextOps.bm25TopK(docs, "doc_id", "text", terms, k = 10)
          .collect().map(r => (r.getLong(0),
            java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq
        val idx = TextOps.bm25TopKIndexed(s, tmp.toString, terms, k = 10)
          .collect().map(r => (r.getLong(0),
            java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq
        assert(idx == scan, s"terms=$terms: indexed $idx vs scan $scan")
      }
      // plan shape: the postings scan carries a tb partition filter
      // (directory pruning) and a pushed term filter (row-group skipping);
      // the raw documents table is never scanned
      val plan = TextOps.bm25TopKIndexed(s, tmp.toString, Seq("spark"), 5)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("tb#"),
        s"no tb partition filter:\n$plan")
      assert(plan.contains("In(term") || plan.contains("EqualTo(term"),
        s"term filter not pushed:\n$plan")
      // only the one matching bucket directory is actually read
      val tb = TextOps.termBucket("spark", 8)
      val files = s.read.parquet(s"$tmp/postings")
        .where(col("tb") === tb && col("term") === "spark")
        .queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.totalNumberOfFiles
        }.sum
      val allFiles = s.read.parquet(s"$tmp/postings")
        .queryExecution.executedPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.selectedPartitions.totalNumberOfFiles
        }.sum
      assert(files < allFiles, s"pruning read $files of $allFiles files")
    } finally {
      val walk = java.nio.file.Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("curriculumBins: exact quartile thresholds when sample covers all; null-safe") {
    val s = spark
    import s.implicits._
    val df = ((1L to 100L).map(i => (i, Some(i.toDouble))) :+ (101L, Option.empty[Double]))
      .toDF("id", "v")
    val got = Curation.curriculumBins(df, "id", "v", nBins = 4, k = 1000)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // thresholds = 25/50/75th order stats = 25,50,75; bin = # strictly below
    assert(got(25L) == Some(0L) && got(26L) == Some(1L))
    assert(got(50L) == Some(1L) && got(51L) == Some(2L))
    assert(got(75L) == Some(2L) && got(76L) == Some(3L) && got(100L) == Some(3L))
    assert(got(1L) == Some(0L) && got(101L).isEmpty)
  }

  test("triangleCounts: orientation finds each triangle once; dedup, loops, isolates") {
    val s = spark
    import s.implicits._
    // K4 on 1-4 minus edge (3,4), plus: a duplicate edge, a reversed
    // edge, a self-loop, and a triangle-free pendant 5
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (2L, 2L), (1L, 2L), (4L, 5L))
      .toDF("s", "d")
    val got = Graph.triangleCounts(edges, "s", "d")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // triangles: (1,2,3) and (1,2,4)
    assert(got == Map("1" -> 2L, "2" -> 2L, "3" -> 1L, "4" -> 1L, "5" -> 0L),
      got.toString)
  }

  test("clusteringCoefficients: hand graph, degree-1 convention, triangleCounts consistency") {
    val s = spark
    import s.implicits._
    // triangle 1-2-3 with pendant 4 on 1 (noise: dup + reversed edges)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (2L, 1L), (1L, 2L))
      .toDF("s", "d")
    val got = Graph.clusteringCoefficients(edges, "s", "d")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // lcc(1) = 2·1/(3·2) = 1/3; 2 and 3 close their only pair; 4 has none
    assert(got == Map(
      "1" -> ((3L, 1L, 1.0 / 3.0)), "2" -> ((2L, 1L, 1.0)),
      "3" -> ((2L, 1L, 1.0)), "4" -> ((1L, 0L, 0.0))), got.toString)
    // same node set and triangle numerators as triangleCounts
    val tc = Graph.triangleCounts(edges, "s", "d")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._2).toMap == tc)
  }

  test("kTrussEdges: clique survives, star dies, diamond cascades, durable mode, loud maxIter") {
    val s = spark
    import s.implicits._
    // 5-clique (support 3 everywhere) + diamond (two triangles sharing
    // an edge) + a star (triangle-free hub noise)
    val clique = for (i <- 1 to 5; j <- (i + 1) to 5) yield (i.toLong, j.toLong)
    val diamond = Seq((10L, 11L), (10L, 12L), (11L, 12L), (11L, 13L), (12L, 13L))
    val star = (30 to 35).map(l => (20L, l.toLong))
    val edges = (clique ++ diamond ++ star).toDF("s", "d")
    def run(k: Int, dir: String = null) =
      Graph.kTrussEdges(edges, "s", "d", k, checkpointDir = dir).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // 4-truss: only the clique survives (the diamond's shared edge has
    // support 2 in round 1, then its wings peel and it cascades out)
    val got = run(4)
    assert(got == clique.map { case (a, b) => (a.toString, b.toString, 3L) }.toSet,
      got.toString)
    // 3-truss: clique + the whole diamond (every edge in >= 1 triangle)
    assert(run(3).map(e => (e._1, e._2)) ==
      (clique ++ diamond).map { case (a, b) => (a.toString, b.toString) }.toSet)
    // durable-checkpoint mode is result-identical and leaves no orphans
    val dir = java.nio.file.Files.createTempDirectory("graft-ktruss-spec").toString
    assert(run(4, dir) == got)
    val leftovers = new java.io.File(dir).listFiles()
    assert(leftovers == null || leftovers.isEmpty,
      leftovers.map(_.getName).mkString(", "))
    // an under-sized maxIter fails LOUDLY, never returns a non-fixpoint
    intercept[IllegalArgumentException] {
      Graph.kTrussEdges(edges, "s", "d", k = 4, maxIter = 1).collect()
    }
  }

  test("degreeAssortativity: hand values, degenerate NULL, disassortative star") {
    val s = spark
    import s.implicits._
    def run(pairs: Seq[(Long, Long)]) = {
      val r = Graph.degreeAssortativity(pairs.toDF("s", "d"), "s", "d").head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))
    }
    // triangle 1-2-3 + pendant 4 on 1: r = -20/28 (hand-computed sums)
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L))) ==
      ((4L, 19L, 18L, 44L, Some(-0.714286))))
    // a clique has equal degrees everywhere: denominator 0 -> NULL r
    assert(run(Seq((1L, 2L), (2L, 3L), (3L, 1L)))._5.isEmpty)
    // a star is perfectly disassortative
    assert(run(Seq((0L, 1L), (0L, 2L), (0L, 3L)))._5 == Some(-1.0))
  }

  test("retention: cohort by first bucket, distinct activity, offset cap") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 5L), (1L, 15L), (1L, 35L), (1L, 205L), // b0,1,3 + capped b20
      (2L, 25L), (2L, 28L),                       // same bucket: one row
      (3L, 101L))
      .toDF("user_id", "ts_us")
    val got = Joins.retention(ev, "user_id", "ts_us", bucket = 10L, maxOffset = 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L,
      (2L, 0L) -> 1L, (10L, 0L) -> 1L), got.toString)
  }

  test("funnel: greedy ordered steps, strict-after rule, chained-min parity") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, 2L, 5L, "click"),    // click before any view: never step 1
      (1L, 1L, 10L, "view"),
      (2L, 3L, 1L, "view"), (2L, 4L, 2L, "click"), (2L, 5L, 3L, "purchase"),
      (3L, 6L, 1L, "view"), (3L, 7L, 1L, "click"),  // same ts: NOT after
      (3L, 8L, 4L, "click"), (3L, 9L, 2L, "purchase"), // purchase < t1
      (4L, 10L, 7L, "purchase"), // step-2 type only → 0 steps
      (5L, 11L, 1L, "error"))   // never in steps → no output row
      .toDF("user_id", "event_id", "ts_us", "event_type")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
    val got = Joins.funnel(ev, "user_id", "ts_us", "event_id", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), (2 to 4).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))))).toMap
    assert(got == Map(
      1L -> ((1L, Seq(Some(10L), None, None))),
      2L -> ((3L, Seq(Some(1L), Some(2L), Some(3L)))),
      3L -> ((2L, Seq(Some(1L), Some(4L), None))),
      4L -> ((0L, Seq(None, None, None)))), got.toString)
    // chained-min model parity over a pseudo-random event soup
    val steps = Seq("view", "click", "purchase")
    val rnd = (0 until 400).map { i =>
      val u = i % 7L
      val h = graft.operators.HashKernelsAccess.mix(i.toLong)
      (u, i.toLong, math.floorMod(h, 50L), steps((math.floorMod(h >> 8, 3L)).toInt))
    }
    val rndDf = rnd.toDF("user_id", "event_id", "ts_us", "event_type")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
    val gotR = Joins.funnel(rndDf, "user_id", "ts_us", "event_id", "event_type", steps)
      .collect().map(r => r.getLong(0) ->
        (2 to 4).map(i => if (r.isNullAt(i)) None else Some(r.getLong(i)))).toMap
    val model = rnd.groupBy(_._1).map { case (u, es) =>
      var prev = Option.empty[Long]
      var stopped = false
      u -> steps.map { st =>
        if (stopped) Option.empty[Long]
        else {
          val t = es.filter(e => e._4 == st && prev.forall(e._3 > _))
            .map(_._3).minOption
          if (t.isEmpty) stopped = true else prev = t
          t
        }
      }
    }
    assert(gotR == model, s"random-soup parity failed:\n$gotR\nvs\n$model")
  }

  test("cooccurrencePmi: hand-computed window pairs and integer-ln scores") {
    val s = spark
    import s.implicits._
    val docs = Seq("a b a", "b c", null.asInstanceOf[String]).toDF("text")
    val got = TextOps.cooccurrencePmi(docs, "text", window = 2, minCount = 1L)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), java.lang.Double.doubleToLongBits(r.getDouble(6)))))
      .toMap
    // pairs: doc1 [a,b,a] → (a,b) d1, (a,a) d2, (a,b) d1; doc2 [b,c] →
    // (b,c). S=4; unigrams a:2 b:2 c:1
    def bits(d: Double) = java.lang.Double.doubleToLongBits(d)
    assert(got == Map(
      ("a", "b") -> ((2L, bits(math.log(2.0 * 4.0) - math.log(2.0 * 2.0)))),
      ("a", "a") -> ((1L, bits(math.log(1.0 * 4.0) - math.log(2.0 * 2.0)))),
      ("b", "c") -> ((1L, bits(math.log(1.0 * 4.0) - math.log(2.0 * 1.0))))),
      got.toString)
    // minCount cuts before scoring
    val cut = TextOps.cooccurrencePmi(docs, "text", window = 2, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(cut == Seq(("a", "b")), cut.toString)
  }

  test("appendToInvertedIndex: incremental build equals from-scratch build") {
    val s = spark
    import s.implicits._
    val all = Seq(
      (1L, "spark join stream"), (2L, "vector vector gamma"),
      (3L, "table hash spark"), (4L, "spark spark join table hash"),
      (5L, null.asInstanceOf[String]), (6L, "hash table"))
    val full = java.nio.file.Files.createTempDirectory("graft-invidx-full")
    val incr = java.nio.file.Files.createTempDirectory("graft-invidx-incr")
    try {
      TextOps.buildInvertedIndex(all.toDF("doc_id", "text"),
        "doc_id", "text", full.toString, termBuckets = 8)
      TextOps.buildInvertedIndex(all.take(3).toDF("doc_id", "text"),
        "doc_id", "text", incr.toString, termBuckets = 8)
      TextOps.appendToInvertedIndex(all.drop(3).toDF("doc_id", "text"),
        "doc_id", "text", incr.toString)
      val mf = s.read.parquet(s"$full/meta").collect()(0)
      val mi = s.read.parquet(s"$incr/meta").collect()(0)
      assert(mf.getAs[Long]("n") == mi.getAs[Long]("n") &&
        mf.getAs[Long]("sdl") == mi.getAs[Long]("sdl"))
      val terms = Seq("spark", "join", "vector", "stream")
      def rows(p: java.nio.file.Path) =
        TextOps.bm25TopKIndexed(s, p.toString, terms, k = 10)
          .collect().map(r => (r.getLong(0),
            java.lang.Double.doubleToLongBits(r.getDouble(1)))).toSeq
      assert(rows(incr) == rows(full), "BM25 over appended index diverges")
      def ph(p: java.nio.file.Path) =
        TextOps.phraseSearch(s, p.toString, Seq("table", "hash"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(ph(incr) == ph(full) && ph(full).map(_._1) == Seq(3L, 4L),
        "phrase over appended index diverges")
      // compaction restores one sorted file batch per bucket without
      // changing any answer
      val filesBefore = s.read.parquet(s"$incr/postings").inputFiles.length
      TextOps.compactInvertedIndex(s, incr.toString)
      val filesAfter = s.read.parquet(s"$incr/postings").inputFiles.length
      assert(filesAfter < filesBefore,
        s"compaction did not reduce files: $filesBefore -> $filesAfter")
      assert(rows(incr) == rows(full) && ph(incr) == ph(full),
        "compaction changed query answers")
    } finally {
      for (tmp <- Seq(full, incr)) {
        val walk = java.nio.file.Files.walk(tmp)
        try walk.iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
  }

  test("phraseSearch: adjacent-token matches, repeated-term phrases, brute-force parity") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "x table hash y table hash"), // two occurrences
      (2L, "table y hash"),              // both terms, never adjacent
      (3L, "a a a b a a"),               // repeated-term phrase fodder
      (4L, "table hash"),                // exact-length doc
      (5L, "hash table"),                // reversed order only
      (6L, null.asInstanceOf[String]))
    val docs = corpus.toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-phrase-test")
    try {
      TextOps.buildInvertedIndex(docs, "doc_id", "text", tmp.toString, termBuckets = 8)
      def brute(phrase: Seq[String]): Seq[(Long, Long, Long)] =
        corpus.flatMap { case (id, t) =>
          Option(t).map(_.split(" ", -1).toSeq).flatMap { toks =>
            val occ = (0 to toks.size - phrase.size)
              .filter(i => phrase.indices.forall(j => toks(i + j) == phrase(j)))
            if (occ.isEmpty) None
            else Some((id, occ.size.toLong, occ.min.toLong))
          }
        }.sortBy(_._1)
      for (phrase <- Seq(Seq("table", "hash"), Seq("a", "a"), Seq("a", "a", "b"),
          Seq("hash"), Seq("absent", "hash"))) {
        val got = TextOps.phraseSearch(s, tmp.toString, phrase)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got == brute(phrase), s"phrase=$phrase: got $got expected ${brute(phrase)}")
      }
    } finally {
      val walk = java.nio.file.Files.walk(tmp)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("real AVI RLE8 decode: inter-frame deltas match the carry formula") {
    val s = spark
    import s.implicits._
    val ids = Seq(0L, 3L, 11L)
    val got = Multimodal.sampleAviFrames(s,
        Multimodal.syntheticAviBlobs(s, ids.toDF("doc_id")), stride = 2)
      .collect().groupBy(_.doc_id)
    for (id <- ids) {
      val nf = 4 + java.lang.Math.floorMod(id, 5L).toInt
      val frames = got(id).sortBy(_.frame_idx)
      assert(frames.map(_.frame_idx).toSeq == (0 until nf by 2).toSeq)
      for (fr <- frames) {
        assert(fr.width == Multimodal.AviW && fr.height == Multimodal.AviH)
        var sr = 0L; var sg = 0L; var sb = 0L
        for (y <- 0 until Multimodal.AviH; x <- 0 until Multimodal.AviW) {
          // independent carry re-derivation: the latest frame <= f whose
          // 4-row band covered y wrote this pixel (frame 0 covers all)
          val g = (1 to fr.frame_idx)
            .filter(fp => y >= (5 * fp) % 13 && y <= (5 * fp) % 13 + 3)
            .lastOption.getOrElse(0)
          val idx = java.lang.Math.floorMod(
            id * 31 + g * 97 + (if (y % 4 == 3) 0 else x * 7) + y * 13, 64L).toInt
          sr += 85 * (idx % 4); sg += 85 * (idx / 4 % 4); sb += 85 * (idx / 16 % 4)
        }
        assert(fr.sum_r == sr && fr.sum_g == sg && fr.sum_b == sb,
          s"id=$id frame=${fr.frame_idx} sums diverged from the carry formula")
      }
      // delta frames really differ from a keyframe-only read: frame 2's
      // sums must NOT equal a full re-render of frame 2 alone (the carry
      // keeps older rows), unless no band ever overlapped — guard with
      // one spot check on id=3 frame 2, y outside band(1) and band(2)
      if (id == 3L) {
        val fr2 = frames.find(_.frame_idx == 2).get
        var full = 0L
        for (y <- 0 until Multimodal.AviH; x <- 0 until Multimodal.AviW) {
          val idx = java.lang.Math.floorMod(
            id * 31 + 2 * 97 + (if (y % 4 == 3) 0 else x * 7) + y * 13, 64L).toInt
          full += 85 * (idx % 4)
        }
        assert(fr2.sum_r != full,
          "frame 2 should carry frame-0/1 rows, not be a full re-render")
      }
    }
    // non-AVI and truncated blobs yield no frames, not garbage
    val junk = Multimodal.sampleAviFrames(s,
      Seq((7L, "not an avi".getBytes),
        (8L, java.util.Arrays.copyOf(Multimodal.syntheticAviRle(1L), 60)))
        .toDF("doc_id", "blob"))
    assert(junk.count() == 0L)
  }

  test("AVI decoder is crash-proof on random and bit-flipped blobs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    // random garbage of assorted sizes, including RIFF-prefixed garbage
    val garbage = (0 until 40).map { i =>
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      if (i % 3 == 0 && b.length >= 12) {
        "RIFF".getBytes.copyToArray(b, 0); "AVI ".getBytes.copyToArray(b, 8)
      }
      (i.toLong, b)
    }
    // valid AVIs with bytes flipped at random offsets (hits chunk sizes,
    // palette, RLE escapes, frame payloads)
    val mutated = (0 until 40).map { i =>
      val b = Multimodal.syntheticAviRle(i.toLong)
      for (_ <- 0 until 5) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      (100L + i, b)
    }
    // decode must complete; each doc yields either frames or nothing,
    // never an exception (the executor-survival contract)
    val n = Multimodal.sampleAviFrames(s,
      (garbage ++ mutated).toDF("doc_id", "blob")).count()
    assert(n >= 0L)
  }

  test("MJPEG-in-AVI: real javax.imageio decode matches the block formula exactly") {
    val s = spark
    import s.implicits._
    val ids = (0L until 20L).toDF("doc_id")
    val blobs = Multimodal.syntheticMjpegBlobs(s, ids)
    // the blobs are REAL JPEGs in a REAL AVI container: every sampled
    // frame decodes through ImageIO and its sums equal 64x the 8x8
    // block-formula sum — the DC-only bit-exactness claim, per frame
    val got = Multimodal.sampleMjpegFrames(s, blobs, stride = 2)
      .collect().map(t => ((t.doc_id, t.frame_idx), t)).toMap
    var checked = 0
    for (id <- 0L until 20L; f <- 0 until (4 + (id % 5).toInt) by 2) {
      val t = got((id, f))
      assert((t.width, t.height) == ((Multimodal.AviW, Multimodal.AviH)))
      val sum = (for (bx <- 0 until 3; by <- 0 until 2)
        yield 64L * Multimodal.mjpegBlock(id, f, bx, by)).sum
      assert(t.sum_r == sum && t.sum_g == sum && t.sum_b == sum,
        s"doc $id frame $f: got ${t.sum_r}, formula $sum")
      checked += 1
    }
    assert(checked == got.size, s"extra frames: ${got.size} vs $checked")
    // stride 1 emits every frame; stride larger than the clip emits
    // only the keyframe index 0
    assert(Multimodal.sampleMjpegFrames(s, blobs, stride = 1).count() ==
      (0L until 20L).map(id => 4 + (id % 5)).sum)
    assert(Multimodal.sampleMjpegFrames(s, blobs, stride = 100).count() == 20L)
    // the RLE8 walkers skip MJPEG streams instead of palette-crashing,
    // and the MJPEG walker skips RLE8 streams
    assert(Multimodal.sampleAviFrames(s, blobs).count() == 0L)
    assert(Multimodal.videoSceneCuts(s, blobs, 1L).count() == 0L)
    assert(Multimodal.sampleMjpegFrames(s,
      Multimodal.syntheticAviBlobs(s, ids)).count() == 0L)
    // crash-proof on mutated MJPEG blobs (the executor-survival contract)
    val rnd = new scala.util.Random(7)
    val mutated = (0 until 30).map { i =>
      val b = Multimodal.syntheticAviMjpeg(i.toLong)
      for (_ <- 0 until 5) b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      (500L + i, b)
    }
    assert(Multimodal.sampleMjpegFrames(s,
      mutated.toDF("doc_id", "blob")).count() >= 0L)
    // scene cuts: SAD between adjacent decoded frames equals the
    // pairwise block-formula deltas (192 = gray x3 RGB scale x 64 px)
    val cuts = Multimodal.mjpegSceneCuts(s, blobs, threshold = 150000L)
      .collect().map(c => ((c.doc_id, c.frame_idx), (c.diff_sum, c.is_cut))).toMap
    var nCut = 0; var nKeep = 0
    for (id <- 0L until 20L; f <- 1 until (4 + (id % 5).toInt)) {
      val want = (for (bx <- 0 until 3; by <- 0 until 2) yield
        192L * math.abs(Multimodal.mjpegBlock(id, f, bx, by) -
          Multimodal.mjpegBlock(id, f - 1, bx, by))).sum
      assert(cuts((id, f)) == ((want, want > 150000L)), s"doc $id pair $f")
      if (want > 150000L) nCut += 1 else nKeep += 1
    }
    assert(nCut > 0 && nKeep > 0, s"threshold must split: $nCut/$nKeep")
    assert(cuts.size == (0L until 20L).map(id => 3 + (id % 5)).sum)
    // crash-proof + codec cross-skip for the cuts walker too
    assert(Multimodal.mjpegSceneCuts(s,
      mutated.toDF("doc_id", "blob"), 1L).count() >= 0L)
    assert(Multimodal.mjpegSceneCuts(s,
      Multimodal.syntheticAviBlobs(s, ids), 1L).count() == 0L)
  }

  test("imageHistogram: formula recount, dense zeros, grayscale replication, junk skip") {
    val s = spark
    import s.implicits._
    val ids = Seq(0L, 5L, 123L)
    val got = Multimodal.imageHistogram(s,
        Multimodal.syntheticImageBlobs(s, ids.toDF("doc_id")))
      .collect().map(h => (h.doc_id, h.channel, h.bin) -> h.n).toMap
    for (id <- ids) {
      val w = 16 + (id % 17).toInt
      val h = 16 + ((id * 7) % 13).toInt
      val want = Array.ofDim[Long](3, 16)
      for (y <- 0 until h; x <- 0 until w) {
        want(0)(((id * 31 + x * 7 + y * 13) % 256).toInt / 16) += 1
        want(1)(((id * 17 + x * 11 + y * 3) % 256).toInt / 16) += 1
        want(2)(((id * 13 + x * 5 + y * 29) % 256).toInt / 16) += 1
      }
      for (c <- 0 until 3; b <- 0 until 16)
        assert(got((id, c, b)) == want(c)(b), s"id=$id c=$c b=$b")
    }
    // DENSE: all 48 cells per doc present, zero bins included
    assert(got.size == ids.size * 48, got.size.toString)
    // single-band grayscale replicates into all three channels
    val g = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 2; x <- 0 until 4) g.getRaster.setSample(x, y, 0, 16 * x + y)
    val bos = new java.io.ByteArrayOutputStream
    javax.imageio.ImageIO.write(g, "png", bos)
    val gh = Multimodal.imageHistogram(s,
        Seq((7L, bos.toByteArray)).toDF("doc_id", "blob"))
      .collect().map(h => (h.channel, h.bin) -> h.n).toMap
    for (b <- 0 until 16)
      assert(gh((0, b)) == gh((1, b)) && gh((1, b)) == gh((2, b)))
    assert((0 until 16).map(b => gh((0, b))).sum == 8L)
    // undecodable blobs skip, never throw
    assert(Multimodal.imageHistogram(s,
      Seq((1L, Array[Byte](9, 9))).toDF("doc_id", "blob")).count() == 0L)
  }

  test("readability: hand counts, sentence floor, wordless NULL") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "Hello world."),          // 2 words, 1 sentence, 3 vowel runs
      (2L, "no markers here"),       // sentence count floors at 1
      (3L, "A?! B.. C"),             // two [.!?] runs
      (4L, ""))                      // wordless -> NULL score
      .toDF("doc_id", "text")
    val got = TextOps.readability(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got(1L)._1 == 2L && got(1L)._2 == 1L && got(1L)._3 == 3L)
    assert(math.abs(got(1L)._4.get - (206.835 - 1.015 * 2.0 - 84.6 * 1.5)) < 1e-12)
    assert(got(2L)._2 == 1L, got(2L).toString)
    assert(got(3L) == ((3L, 2L, 1L, got(3L)._4)) && got(3L)._4.isDefined)
    assert(got(4L)._1 == 0L && got(4L)._4.isEmpty)
  }

  test("audioLoudSegments: islands close right, any-channel rule, junk skip") {
    val s = spark
    import s.implicits._
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def wav(ch: Int, samples: Seq[Int]): Array[Byte] = {
      val data = samples.flatMap(le16).toArray
      "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(8000) ++
        le32(8000 * ch * 2) ++ le16(ch * 2) ++ le16(16) ++
        "data".getBytes ++ le32(data.length) ++ data
    }
    // mono: runs at frames 2-4, 6, 9 (negatives count via abs)
    val mono = wav(1, Seq(0, 0, 1000, -1000, 1000, 0, 950, 0, 0, 1000))
    // stereo: only ch1 is loud at frames 1-2 — the ANY-channel rule
    val stereo = wav(2, Seq(0, 0, /*f1*/ 0, 999, /*f2*/ 0, -999, /*f3*/ 0, 0))
    val got = Multimodal.audioLoudSegments(s,
        Seq((1L, mono), (2L, stereo), (3L, Array[Byte](1))).toDF("doc_id", "blob"),
        threshold = 900)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(got == Set(
      (1L, 1, 2L, 4L, 3L), (1L, 2, 6L, 6L, 1L), (1L, 3, 9L, 9L, 1L),
      (2L, 1, 1L, 2L, 2L)), got.toString)
  }

  test("audioSpectral: pure tone lands in its bin, silence is zero, window/channel indexing") {
    val s = spark
    import s.implicits._
    // hand-built stereo PCM16 WAV: ch0 = bin-2 cosine, ch1 = silence;
    // 100 frames -> exactly ONE full 64-frame window (trailing dropped)
    val nf = 100
    val ch = 2
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val data = scala.collection.mutable.ArrayBuffer.empty[Byte]
    for (f <- 0 until nf; c <- 0 until ch) {
      val v = if (c == 0)
        math.round(8192.0 * math.cos(2.0 * math.Pi * 2 * f / 64)).toInt
      else 0
      data ++= le16(v)
    }
    val bytes = "RIFF".getBytes ++ le32(36 + data.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(8000) ++
      le32(8000 * ch * 2) ++ le16(ch * 2) ++ le16(16) ++
      "data".getBytes ++ le32(data.length) ++ data.toArray
    val got = Multimodal.audioSpectral(s, Seq((5L, bytes)).toDF("doc_id", "blob"))
      .collect().map(b => (b.channel, b.window, b.bin) -> b.power).toMap
    assert(got.keySet ==
      (for (c <- 0 until 2; k <- 1 to 4) yield (c, 0, k)).toSet, got.keySet)
    // the tone concentrates in bin 2, orders beyond the rounding leakage
    assert(got((0, 0, 2)) > 100 * (got((0, 0, 1))
      .max(got((0, 0, 3))).max(got((0, 0, 4)))), got.toString)
    // |X_2|^2 ~= (N/2 * A)^2 with A = 8192/32768
    val expect = math.pow(32 * 8192.0 / 32768.0, 2)
    assert(math.abs(got((0, 0, 2)) - expect) / expect < 0.01,
      s"${got((0, 0, 2))} vs $expect")
    // silence channel: folds of exact zeros are exactly zero
    for (k <- 1 to 4) assert(got((1, 0, k)) == 0.0)
    // non-PCM16 input skips, never throws
    assert(Multimodal.audioSpectral(s,
      Seq((1L, Array[Byte](1, 2, 3))).toDF("doc_id", "blob")).count() == 0L)
  }

  test("real WAV decode: header and features match the generator formula") {
    val s = spark
    import s.implicits._
    // independent re-derivation of the sample stats from the formula
    def expected(id: Long): (Int, Int, Long, Seq[Float]) = {
      val ch = 1 + java.lang.Math.floorMod(id, 2L).toInt
      val sr = 8000 + java.lang.Math.floorMod(id, 5L).toInt * 2000
      val nf = 256 + java.lang.Math.floorMod(id * 3, 200L).toInt
      def samp(f: Int, c: Int): Int =
        (java.lang.Math.floorMod(id * 7919 + f * 31 + c * 17, 2048L) - 1024L).toInt
      val n = nf * ch
      var sv = 0L; var sa = 0L; var ma = 0L; var sq = 0L
      val ta = new Array[Long](3); val tc = new Array[Long](3)
      for (f <- 0 until nf; c <- 0 until ch) {
        val i = f * ch + c
        val v = samp(f, c); val a = math.abs(v).toLong
        sv += v; sa += a; sq += v.toLong * v
        if (a > ma) ma = a
        val t = (i.toLong * 3 / n).toInt
        ta(t) += a; tc(t) += 1
      }
      var zc = 0L
      for (f <- 1 until nf)
        if ((samp(f, 0) < 0) != (samp(f - 1, 0) < 0)) zc += 1
      val F = 32768.0
      (sr, ch, nf.toLong, Seq(
        (sv / F / n).toFloat, (sa / F / n).toFloat, (ma / F).toFloat,
        (zc.toDouble / nf).toFloat, (sq / F / F / n).toFloat,
        (ta(0) / F / tc(0)).toFloat, (ta(1) / F / tc(1)).toFloat,
        (ta(2) / F / tc(2)).toFloat))
    }
    val ids = Seq(0L, 1L, 7L, 123L, 9999L)
    val got = Multimodal.decodeAudioFeatures(s,
        Multimodal.syntheticAudioBlobs(s, ids.toDF("doc_id")))
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- ids) {
      val (sr, ch, nf, feats) = expected(id)
      val m = got(id)
      assert(m.sample_rate == sr && m.channels == ch && m.n_frames == nf,
        s"id=$id header ${(m.sample_rate, m.channels, m.n_frames)}, want ${(sr, ch, nf)}")
      assert(m.bits_per_sample == 16)
      assert(m.n_bytes == 44 + nf * ch * 2, s"id=$id n_bytes=${m.n_bytes}")
      assert(m.features.toSeq == feats, s"id=$id features diverged from formula")
    }
  }

  test("WAV parser: chunk walk skips unknown chunks; 8-bit path; junk falls back") {
    // an inserted odd-size LIST chunk before fmt must be skipped
    // (word-aligned walk) and change nothing about the parse
    val base = Multimodal.syntheticWav(7L)
    val want = Multimodal.decodeWav(7L, base).get
    val spliced = new java.io.ByteArrayOutputStream()
    spliced.write(base, 0, 12)
    spliced.write("LIST".getBytes("US-ASCII"))
    spliced.write(Array[Byte](5, 0, 0, 0)) // chunk size 5 (odd → 1 pad byte)
    spliced.write(Array[Byte](1, 2, 3, 4, 5, 0))
    spliced.write(base, 12, base.length - 12)
    val viaList = Multimodal.decodeWav(7L, spliced.toByteArray).get
    assert(viaList.sample_rate == want.sample_rate &&
      viaList.n_frames == want.n_frames &&
      viaList.features.toSeq == want.features.toSeq)
    // hand-built 8-bit mono clip: samples 128,255,0,128 → v = 0,127,-128,0
    val b8 = java.nio.ByteBuffer.allocate(48).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b8.put("RIFF".getBytes("US-ASCII")).putInt(40).put("WAVE".getBytes("US-ASCII"))
    b8.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(8000).putShort(1).putShort(8)
    b8.put("data".getBytes("US-ASCII")).putInt(4)
    b8.put(Array[Byte](128.toByte, 255.toByte, 0, 128.toByte))
    val m8 = Multimodal.decodeWav(3L, b8.array()).get
    assert(m8.bits_per_sample == 8 && m8.channels == 1 &&
      m8.sample_rate == 8000 && m8.n_frames == 4L)
    assert(m8.features(2) == 1.0f)  // peak |−128| / 128
    assert(m8.features(3) == 0.5f)  // two sign changes over four frames
    // junk: wrong magic, nulls, truncation, float-format WAV → None
    assert(Multimodal.decodeWav(1L, "not audio at all, just text".getBytes).isEmpty)
    assert(Multimodal.decodeWav(1L, null).isEmpty)
    assert(Multimodal.decodeWav(1L, java.util.Arrays.copyOf(base, 30)).isEmpty)
    val bf = java.util.Arrays.copyOf(base, base.length)
    bf(20) = 3 // fmt tag: IEEE-float WAV — unsupported, must reject not garble
    assert(Multimodal.decodeWav(1L, bf).isEmpty)
    // adversarial chunk sizes: 0xFFFFFFF8 steps 0 after .toInt (would
    // spin forever), 0x7FFFFFFF overflows the offset (would index
    // negatively) — both must terminate with None
    for (sz <- Seq(0xFFFFFFF8, 0x7FFFFFFF, 0x80000000)) {
      val adv = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      adv.put("RIFF".getBytes("US-ASCII")).putInt(56).put("WAVE".getBytes("US-ASCII"))
      adv.put("JUNK".getBytes("US-ASCII")).putInt(sz)
      assert(Multimodal.decodeWav(1L, adv.array()).isEmpty, s"size=$sz")
    }
    // a fmt chunk DECLARING size < 16 must reject, not read its header
    // fields out of the following chunk's bytes: here the 2-byte fmt
    // payload is followed by a data chunk whose tag/size bytes would
    // parse as a plausible PCM header if the bound were ignored
    val small = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    small.put("RIFF".getBytes("US-ASCII")).putInt(56).put("WAVE".getBytes("US-ASCII"))
    small.put("fmt ".getBytes("US-ASCII")).putInt(2).putShort(1)
    // payload bytes chosen so the spill-read lands on fmtCode=1/bits=16
    small.put("data".getBytes("US-ASCII")).putInt(8).putLong(0x0000001000010001L)
    assert(Multimodal.decodeWav(1L, small.array()).isEmpty)
  }

  test("WAV parser: G.711 law expansion, 24-bit PCM, extensible headers") {
    // G.711 endpoints from the published tables: ±0 codes and full scale
    assert(Multimodal.muLawExpand(0xFF.toByte) == 0)
    assert(Multimodal.muLawExpand(0x7F.toByte) == 0)
    assert(Multimodal.muLawExpand(0x80.toByte) == 32124)
    assert(Multimodal.muLawExpand(0x00.toByte) == -32124)
    assert(Multimodal.aLawExpand(0xD5.toByte) == 8)
    assert(Multimodal.aLawExpand(0x55.toByte) == -8)
    assert(Multimodal.aLawExpand(0xAA.toByte) == 32256)
    assert(Multimodal.aLawExpand(0x2A.toByte) == -32256)
    // expansion is odd-symmetric: flipping the sign bit negates
    for (c <- 0 until 256) {
      assert(Multimodal.muLawExpand(c.toByte) ==
        -Multimodal.muLawExpand((c ^ 0x80).toByte), s"mu $c")
      assert(Multimodal.aLawExpand(c.toByte) ==
        -Multimodal.aLawExpand((c ^ 0x80).toByte), s"a $c")
    }
    // law clips decode with the expanded samples = formula ∘ expansion
    for (id <- Seq(4L, 7L)) {
      val m = Multimodal.decodeWav(id, Multimodal.syntheticWavLaw(id)).get
      val nf = 256 + ((id * 3) % 200).toInt
      assert(m.bits_per_sample == 8 && m.channels == 1 && m.n_frames == nf)
      val expand: Byte => Int =
        if (id % 2 == 0) Multimodal.muLawExpand else Multimodal.aLawExpand
      val vs = (0 until nf).map(f =>
        expand(java.lang.Math.floorMod(id * 7919 + f * 31, 256L).toByte))
      assert(m.features(2) == (vs.map(v => math.abs(v)).max / 32768.0).toFloat)
      assert(m.features(0) == (vs.map(_.toLong).sum.toDouble / 32768.0 / nf).toFloat)
      assert(m.features(4) ==
        (vs.map(v => v.toDouble * v).sum / 32768.0 / 32768.0 / nf).toFloat)
    }
    // 24-bit clip: wide samples decode exactly
    val m24 = Multimodal.decodeWav(9L, Multimodal.syntheticWav24(9L)).get
    val nf24 = 256 + ((9L * 3) % 200).toInt
    assert(m24.bits_per_sample == 24 && m24.n_frames == nf24)
    val vs24 = (0 until nf24).map(f =>
      (java.lang.Math.floorMod(9L * 7919 + f * 131, 1L << 23) - (1L << 22)).toInt)
    assert(m24.features(2) == (vs24.map(v => math.abs(v.toLong)).max / 8388608.0).toFloat)
    assert(m24.features(4) ==
      (vs24.map(v => v.toDouble * v).sum / 8388608.0 / 8388608.0 / nf24).toFloat)
    // 128-bit sum-of-squares: 200k full-scale 24-bit samples overflow a
    // Long (200000 · 2^46 > 2^63) — energy must still come out exactly 1
    val big = java.nio.ByteBuffer.allocate(44 + 200000 * 3)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    big.put("RIFF".getBytes("US-ASCII")).putInt(36 + 200000 * 3).put("WAVE".getBytes("US-ASCII"))
    big.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(24000).putShort(3).putShort(24)
    big.put("data".getBytes("US-ASCII")).putInt(200000 * 3)
    for (_ <- 0 until 200000) big.put(0.toByte).put(0.toByte).put(0x80.toByte)
    val mBig = Multimodal.decodeWav(1L, big.array()).get
    assert(mBig.features(4) == 1.0f, s"energy ${mBig.features(4)}")
    assert(mBig.features(0) == -1.0f)
    // WAVE_FORMAT_EXTENSIBLE wrapping 16-bit PCM decodes like plain PCM
    val plain = Multimodal.syntheticWav(5L)
    val want5 = Multimodal.decodeWav(5L, plain).get
    val nData = plain.length - 44
    val ext = java.nio.ByteBuffer.allocate(44 + 24 + nData)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    ext.put("RIFF".getBytes("US-ASCII")).putInt(36 + 24 + nData).put("WAVE".getBytes("US-ASCII"))
    ext.put("fmt ".getBytes("US-ASCII")).putInt(40)
      .putShort(0xFFFE.toShort).putShort(want5.channels.toShort)
      .putInt(want5.sample_rate).putInt(want5.sample_rate * want5.channels * 2)
      .putShort((want5.channels * 2).toShort).putShort(16)
      .putShort(22).putShort(16).putInt(0)
      .putShort(1) // SubFormat GUID: first two bytes = PCM format code
      .put(Array[Byte](0, 0, 0, 0, 0x10, 0, 0x80.toByte, 0, 0,
        0xAA.toByte, 0, 0x38, 0x9B.toByte, 0x71))
    ext.put("data".getBytes("US-ASCII")).putInt(nData)
    ext.put(plain, 44, nData)
    val mExt = Multimodal.decodeWav(5L, ext.array()).get
    assert(mExt.features.toSeq == want5.features.toSeq)
    assert(mExt.sample_rate == want5.sample_rate &&
      mExt.n_frames == want5.n_frames && mExt.channels == want5.channels)
    // an extensible header naming an unsupported codec still rejects
    val extBad = java.util.Arrays.copyOf(ext.array(), ext.array().length)
    extBad(44) = 3 // SubFormat first byte: IEEE float
    assert(Multimodal.decodeWav(5L, extBad).isEmpty)
  }

  test("WAV parser: IMA ADPCM blocks decode by the published state walk") {
    // hand-built mono ADPCM file: header + `blocks` of `ba` bytes each
    def adpcmWav(ba: Int, blocks: Seq[(Int, Int, Seq[Int])], dataLen: Int = -1,
        channels: Int = 1): Array[Byte] = {
      val dl = if (dataLen >= 0) dataLen else ba * blocks.length
      val buf = java.nio.ByteBuffer.allocate(44 + ba * blocks.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dl).put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(0x11).putShort(channels.toShort).putInt(8000)
        .putInt(4055).putShort(ba.toShort).putShort(4)
      buf.put("data".getBytes("US-ASCII")).putInt(dl)
      for ((pred, idx, nibs) <- blocks) {
        buf.putShort(pred.toShort).put(idx.toByte).put(0.toByte)
        nibs.grouped(2).foreach(p => buf.put((p(0) | (p(1) << 4)).toByte))
      }
      java.util.Arrays.copyOf(buf.array(), 44 + dl) // truncation case
    }
    // step 7, all-8 nibbles: diff = 7>>3 = 0 subtracted — predictor never
    // moves, so every sample is the header predictor exactly
    val flat = Multimodal.decodeWav(1L, adpcmWav(6, Seq((1000, 0, Seq(8, 8, 8, 8))))).get
    assert(flat.bits_per_sample == 4 && flat.channels == 1 && flat.n_frames == 5L)
    assert(flat.features(0) == (1000.0 / 32768).toFloat) // mean = predictor
    assert(flat.features(2) == (1000.0 / 32768).toFloat) // peak = predictor
    assert(flat.features(3) == 0.0f)
    // one hand-walked transition pair from step index 24 (step 73):
    // d=4 → diff = 73>>3 + 73 = 82, pred 0→82, index 24+2=26 (step 88);
    // d=8 → diff = 88>>3 = 11, subtract: 82−11 = 71. Samples 0, 82, 71.
    val walk = Multimodal.decodeWav(1L, adpcmWav(5, Seq((0, 24, Seq(4, 8))))).get
    assert(walk.n_frames == 3L)
    assert(walk.features(2) == (82.0 / 32768).toFloat)
    assert(walk.features(0) == ((0.0 + 82 + 71) / 32768 / 3).toFloat)
    // positive clamp: start at 32000, max step (index 88 → 32767), all-7
    // nibbles push +61436 per sample — every decoded sample is 32767
    val hi = Multimodal.decodeWav(1L, adpcmWav(6, Seq((32000, 88, Seq(7, 7, 7, 7))))).get
    assert(hi.features(2) == (32767.0 / 32768).toFloat)
    assert(hi.features(0) == ((32000.0 + 4 * 32767) / 32768 / 5).toFloat)
    // negative clamp: all-15 nibbles from 0 at max step floor at -32768
    val lo = Multimodal.decodeWav(1L, adpcmWav(6, Seq((0, 88, Seq(15, 15, 15, 15))))).get
    assert(lo.features(2) == 1.0f)
    // a step-index byte past 88 clamps instead of indexing out of bounds
    assert(Multimodal.decodeWav(1L, adpcmWav(6, Seq((5, 120, Seq(8, 8, 8, 8))))).isDefined)
    // two blocks: the second block's header predictor resets the state
    // (blocks are self-contained); frames = 2 · (1 + (ba−4)·2)
    val two = Multimodal.decodeWav(1L,
      adpcmWav(6, Seq((1000, 0, Seq(8, 8, 8, 8)), (-2000, 0, Seq(8, 8, 8, 8))))).get
    assert(two.n_frames == 10L)
    assert(two.features(2) == (2000.0 / 32768).toFloat)
    assert(two.features(0) == ((5 * 1000.0 - 5 * 2000.0) / 32768 / 10).toFloat)
    // a trailing partial block is ignored, not decoded as garbage
    val cut = Multimodal.decodeWav(1L,
      adpcmWav(6, Seq((1000, 0, Seq(8, 8, 8, 8)), (-2000, 0, Seq(8, 8, 8, 8))),
        dataLen = 9)).get
    assert(cut.n_frames == 5L && cut.features(2) == (1000.0 / 32768).toFloat)
    // a stereo flag with a mono-sized blockAlign (6 < 2 headers + any
    // data) is malformed and must reject, not garble
    assert(Multimodal.decodeWav(1L,
      adpcmWav(6, Seq((0, 0, Seq(8, 8, 8, 8))), channels = 2)).isEmpty)
    // fixture round-trip: header fields come from the generator formulas
    for (id <- Seq(0L, 1L, 2L, 5L)) {
      val m = Multimodal.decodeWav(id, Multimodal.syntheticWavAdpcm(id)).get
      val ba = 100 + (id % 3).toInt * 32
      assert(m.n_frames == 1L + (ba - 4) * 2, s"id=$id")
      assert(m.sample_rate == 8000 + (id % 4).toInt * 2000 && m.bits_per_sample == 4)
    }
  }

  test("WAV parser: stereo IMA ADPCM interleaves per-channel word groups") {
    // two channel headers then alternating 4-byte words (8 nibbles per
    // word, low-first), one group here
    def stereoWav(preds: (Int, Int), idxs: (Int, Int),
        nibsL: Seq[Int], nibsR: Seq[Int]): Array[Byte] = {
      val groups = nibsL.length / 8
      val ba = 8 + groups * 8
      val buf = java.nio.ByteBuffer.allocate(44 + ba)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + ba).put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(0x11).putShort(2).putInt(8000)
        .putInt(4055).putShort(ba.toShort).putShort(4)
      buf.put("data".getBytes("US-ASCII")).putInt(ba)
      buf.putShort(preds._1.toShort).put(idxs._1.toByte).put(0.toByte)
      buf.putShort(preds._2.toShort).put(idxs._2.toByte).put(0.toByte)
      for (g <- 0 until groups; ch <- 0 until 2) {
        val nibs = if (ch == 0) nibsL else nibsR
        for (w <- 0 until 4)
          buf.put((nibs(g * 8 + 2 * w) | (nibs(g * 8 + 2 * w + 1) << 4)).toByte)
      }
      buf.array()
    }
    // step-7 all-8 nibbles freeze both predictors at their headers:
    // frames = 1 + 8 per channel, 18 interleaved samples
    val froze = Multimodal.decodeWav(1L,
      stereoWav((1000, -500), (0, 0), Seq.fill(8)(8), Seq.fill(8)(8))).get
    assert(froze.channels == 2 && froze.n_frames == 9L && froze.bits_per_sample == 4)
    assert(froze.features(0) == ((9 * 1000.0 - 9 * 500) / 32768 / 18).toFloat)
    assert(froze.features(2) == (1000.0 / 32768).toFloat)
    assert(froze.features(3) == 0.0f) // channel-0 frames never cross zero
    // each interleaved third holds 3 L + 3 R samples
    assert(froze.features(5) == ((3 * 1000.0 + 3 * 500) / 6 / 32768).toFloat)
    // independent per-channel state: the left walk moves (hand-walked
    // 0→82→71→61→52→44→37→31→25 from step index 24), the right freezes
    // at 100 — the peak must be the right's 100, not a cross-wired mix
    val walk = Multimodal.decodeWav(1L,
      stereoWav((0, 100), (24, 0), Seq(4, 8, 8, 8, 8, 8, 8, 8), Seq.fill(8)(8))).get
    assert(walk.features(2) == (100.0 / 32768).toFloat)
    val sumL = 0 + 82 + 71 + 61 + 52 + 44 + 37 + 31 + 25
    assert(walk.features(0) == ((sumL + 9 * 100.0) / 32768 / 18).toFloat)
    // fixture round-trip against the generator formulas
    for (id <- Seq(0L, 1L, 2L, 4L)) {
      val m = Multimodal.decodeWav(id, Multimodal.syntheticWavImaStereo(id)).get
      val ba = 8 + 8 * (4 + (id % 3).toInt)
      assert(m.channels == 2 && m.n_frames == (ba - 7).toLong, s"id=$id")
      assert(m.sample_rate == 8000 + (id % 4).toInt * 2000)
    }
  }

  test("curation pipeline: exact dup, near dup, and junk removed") {
    val s = spark
    import s.implicits._
    val good = (1 to 30).map(i => s"w$i the of and is it").mkString(" ")
    val nearGood = (1 to 29).map(i => s"w$i the of and is it").mkString(" ") + " z1 z2"
    val junk = "%%% !!! ###"
    val df = Seq(
      (1L, good), (2L, good),       // exact dup: keep 1, drop 2
      (3L, nearGood),               // near dup of 1: dropped
      (4L, junk),                   // low quality: dropped
      (5L, "the sun and the moon rise over it all and this is a calm evening of light")
    ).toDF("doc_id", "text")
    val kept = Curation.curate(df, "doc_id", "text",
      minQuality = 0.3, nearDupThreshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 5L), kept.toSeq)
  }

  test("trained IVF centroids improve recall vs brute force") {
    val s = spark
    import s.implicits._
    // clustered data: 4 latent groups with noise
    val vecs = (0 until 200).map { i =>
      val g = i % 4
      (i.toLong, Array.tabulate(8)(d =>
        (math.cos(g * 17 + d) + 0.15 * math.sin(i * 13 + d * 7)).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val trained = Similarity.trainCentroids(df, "vec_id", "embedding", 8, 128, 5)
    assert(trained.length == 8)
    val q = vecs(42)._2
    val bf = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", q, 10,
      nCells = 8, nProbe = 3, trainedCentroids = trained)
      .collect().map(_.getLong(0)).toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall $recall")
    assert(ivf.contains(42L))
    // determinism: same training input -> identical centroids
    val again = Similarity.trainCentroids(df, "vec_id", "embedding", 8, 128, 5)
    assert(trained.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("semDedup: within-cluster cosine pruning keeps the smallest id") {
    val s = spark
    import s.implicits._
    // two well-separated groups; ids 10/11/12 share one direction (cos=1
    // up to float noise), id 30 is a lone member of the other group
    def unit(base: Int, i: Int): Array[Float] =
      Array.tabulate(8)(d => (math.cos(base * 29 + d) + 0.001 * i).toFloat)
    val rows = Seq(
      (10L, unit(1, 0)), (11L, unit(1, 1)), (12L, unit(1, 2)),
      (30L, unit(2, 0)),
      (40L, Array.fill(8)(0f))) // zero-norm: no defined cosine
    val df = rows.toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding",
        k = 2, threshold = 0.99, sampleSize = 16, iters = 3)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3)))
    // 10 is the group's keeper; 11 and 12 each see smaller-id mates
    assert(out.map(t => (t._1, t._3)).toSeq ==
      Seq((10L, false), (11L, true), (12L, true), (30L, false), (40L, false)), out.toSeq)
    assert(out(1)._2 == 1L && out(2)._2 == 2L) // n_similar counts the mates
    // the cell join is an equi-join: never cartesian
    val plan = Dedup.semDedup(df, "vec_id", "embedding", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("IVF topk probes nearest cells and finds the neighbor") {
    val s = spark
    import s.implicits._
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(d => math.cos(i * 13 + d * 5).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = vecs(23)._2
    val ivf = Similarity.ivfTopK(df, "vec_id", "embedding", q, 5, nCells = 8, nProbe = 4)
      .collect()
    assert(ivf(0).getLong(0) == 23L) // self is nearest and must be probed
    assert(math.abs(ivf(0).getDouble(1) - 1.0) < 1e-9)
  }

  test("kernel expressions usable from SQL") {
    JsonFunctions.registerAll(spark)
    val r = spark.sql(
      """select cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) c,
        |       fnv1a64('hello') f,
        |       simhash64(array('a', 'b')) s,
        |       sig_agreement(minhash_signature(array('a','b','c'), 1, 16),
        |                     minhash_signature(array('a','b','c'), 1, 16)) j
        |""".stripMargin.replaceAll("\n", " ")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getLong(1) == 0xa430d84680aabd0bL)
    assert(r.getDouble(3) == 1.0)
    // hashed_linear_score from SQL equals the Column-API kernel
    val h = spark.sql(
      "select hashed_linear_score(array('a', 'b'), 1048576) st").collect()(0)
      .getStruct(0)
    val viaCol = spark.range(1)
      .select(operators.hashed_linear_score(
        typedlit(Seq("a", "b")), 1 << 20).as("st"))
      .collect()(0).getStruct(0)
    assert(h.getLong(0) == 3L && h == viaCol)
  }

  test("multimodal resize + frame sampling plumbing") {
    val s = spark
    import s.implicits._
    val blob = ("x" * 256)
    val df = Seq((1L, blob)).toDF("doc_id", "text")
    val resized = Multimodal.resize(s, Multimodal.documentBlobs(df), 16, 16).collect()
    assert(resized.length == 1)
    assert(resized(0).payload.length == 16 * 16 / 16)
    val frames = Multimodal.sampleFrames(s, Multimodal.documentBlobs(df),
      frameBytes = 32, stride = 2).collect()
    assert(frames.length == 4) // 256/32 = 8 frames, stride 2 -> 0,2,4,6
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2, 4, 6))
    assert(frames.forall(_.frame.length == 32))
  }

  test("verified near-dup pairs: exact jaccard confirms LSH candidates") {
    val s = spark
    import s.implicits._
    val doc = (1 to 50).map(i => s"w$i").mkString(" ")
    val near = (1 to 47).map(i => s"w$i").mkString(" ") + " x y z"
    val borderline = (1 to 30).map(i => s"w$i").mkString(" ") +
      " " + (300 to 319).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, doc), (2L, near), (3L, borderline)).toDF("doc_id", "text")
    val verified = Dedup.verifiedNearDupPairs(df, "doc_id", "text",
      shingleSize = 2, threshold = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(verified.toSeq == Seq((1L, 2L)), verified.toSeq)
  }

  test("duplicate clusters: transitive closure via label propagation") {
    val s = spark
    import s.implicits._
    val ids = (1L to 8L).toDF("doc_id")
    // chain 1-2-3, pair 5-6, singletons 4,7,8
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val clusters = Dedup.duplicateClusters(ids, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L), clusters)

    // long chain: pointer doubling must resolve diameter >> iteration count
    val longIds = (1L to 40L).toDF("doc_id")
    val chain = (1L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val longClusters = Dedup.duplicateClusters(longIds, chain, maxIter = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(longClusters.forall(_._2 == 1L),
      longClusters.filter(_._2 != 1L).toSeq.toString)
  }

  test("sequence packing: bins respect the budget up to one straddling doc") {
    val s = spark
    import s.implicits._
    val docs = (0L until 100L).map(i => (i, ("tok " * (10 + (i % 37).toInt)).trim))
      .toDF("doc_id", "text")
    val packed = TextOps.packSequences(docs, "doc_id", "text", tokenBudget = 100, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // every doc assigned; shard is id mod 4
    assert(packed.length == 100)
    assert(packed.forall { case (id, _, shard, _) => shard == (id % 4) })
    // bin token totals: at most budget + one straddling document
    val byBin = packed.groupBy(p => (p._3, p._4)).map { case (_, ds) =>
      (ds.map(_._2).sum, ds.map(_._2).max)
    }
    byBin.foreach { case (total, maxDoc) =>
      assert(total <= 100 + maxDoc, s"bin total $total exceeds budget+maxdoc")
    }
    // bins are contiguous per shard (0,1,2,... no gaps)
    packed.groupBy(_._3).foreach { case (_, ds) =>
      val bins = ds.map(_._4).distinct.sorted
      assert(bins.toSeq == (bins.min to bins.max).toSeq, bins.toSeq)
    }
  }

  test("deterministic source mixing keeps weighted fractions, reproducibly") {
    val s = spark
    import s.implicits._
    val docs = (0L until 1000L).map(i => (i, s"src${i % 2}", "text")).toDF("doc_id", "source", "text")
    val mixed = Curation.mixSources(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.5))
    val counts = mixed.groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts("src0") == 500L) // weight 1.0 keeps everything
    assert(counts("src1") > 150L && counts("src1") < 350L, counts) // ~0.5 of 500
    // bit-reproducible
    val again = Curation.mixSources(docs, "doc_id", "source",
      Map("src0" -> 1.0, "src1" -> 0.5)).count()
    assert(again == mixed.count())
    // unknown sources default to dropped
    val none = Curation.mixSources(docs, "doc_id", "source", Map("srcX" -> 1.0))
    assert(none.count() == 0L)
  }

  test("curation and dedup tolerate empty inputs") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Curation.curate(empty, "doc_id", "text").count() == 0L)
    assert(Dedup.minhashCandidatePairs(empty, "doc_id", "text").count() == 0L)
    assert(Dedup.duplicateClusters(empty.select(col("doc_id")),
      Seq.empty[(Long, Long)].toDF("id_a", "id_b")).count() == 0L)
  }

  test("redactPii scrubs emails and phone numbers, leaves prose alone") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "write to ada.lovelace+x@mail.example.org today"),
      (2L, "call +1-555 123 4567 or 44 555 000 1234 now"),
      (3L, "plain text with numbers 12 34 and an @ sign alone"))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      TextOps.redactPii(col("text")).as("clean"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(out(1L) == "write to [PII] today")
    assert(out(2L) == "call [PII] or [PII] now")
    assert(out(3L) == "plain text with numbers 12 34 and an @ sign alone")
  }

  test("stratified sample caps every stratum, reproducibly, by hash order") {
    val s = spark
    import s.implicits._
    val docs = (0L until 300L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val sampled = Curation.stratifiedSample(docs, "doc_id", "source", perStratum = 7)
    val bySrc = sampled.groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySrc.values.toSet == Set(7L), bySrc)
    // deterministic: identical ids chosen on a rerun
    val ids1 = sampled.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Curation.stratifiedSample(docs, "doc_id", "source", 7)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
    // not just "first 7 per source": the hash order shuffles the pick
    assert(ids1 != (0L until 21L).toSeq, ids1)
    // a stratum smaller than the cap survives whole
    val tiny = Seq((1L, "only")).toDF("doc_id", "source")
    assert(Curation.stratifiedSample(tiny, "doc_id", "source", 10).count() == 1L)
  }

  test("ophCandidatePairs: planted near-dups found, novels unpaired, 1 hash/shingle") {
    val s = spark
    import s.implicits._
    // 30 base docs of 40 distinct-ish tokens; each base gets a near-dup
    // with one token substituted (Jaccard ≈ 37/43 per shingle set) and
    // the novels share no shingles across bases
    val base = (0 until 30).map { b =>
      (0 until 40).map(t => s"w${b}_$t").mkString(" ")
    }
    val dups = base.zipWithIndex.map { case (txt, b) =>
      val toks = txt.split(" "); toks(20) = "SUBST"; toks.mkString(" ")
    }
    val docs = (base ++ dups).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val pairs = Dedup.ophCandidatePairs(docs, "doc_id", "text",
        shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until 30).map(b => (b.toLong, (b + 30).toLong)).toSet
    // every planted pair recovered; nothing else paired (novel bases
    // share no shingles, so any extra pair would be a densification bug)
    assert(pairs == want, s"got ${pairs.size} pairs, want ${want.size}")
    // agreement estimates come from the SAME banding machinery as the
    // 16-hash kernel — cross-check one pair against exact Jaccard
    val est = Dedup.ophCandidatePairs(docs, "doc_id", "text", 3, 16, 4, 0.5)
      .where(col("id_a") === 0L).select("est_jaccard").head().getDouble(0)
    assert(est >= 0.5 && est <= 1.0, s"est_jaccard $est")
  }

  test("weightedSample: quantized Efraimidis–Spirakis race, replayed exactly") {
    val s = spark
    import s.implicits._
    val docs = (0L until 400L).map(i => (i, (i % 97) + 1L)).toDF("doc_id", "w")
    val got = Curation.weightedSample(docs, "doc_id", "w", k = 25)
      .select("doc_id", "key_fp").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    // driver model of the exact integer chain the operator promises
    def key(id: Long, w: Long): Long = {
      val v = HashKernelsAccess.mix(id + 6151L) & ((1L << 40) - 1L)
      val neglog = 40L * 1024L - TextOps.log2fp(v + 1L)
      neglog * 1048576L / w
    }
    val want = (0L until 400L).map(i => (i, key(i, (i % 97) + 1L)))
      .sortBy { case (id, k0) => (k0, id) }.take(25).sortBy(_._1)
    assert(got == want)
    // the draw is a pure function of (id, w, salt): partitioning-free
    val got2 = Curation.weightedSample(docs.repartition(7), "doc_id", "w", 25)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got2 == want.map(_._1).toSet)
  }

  test("weightedSampleStratified: caps per stratum; salted == plain at any salts") {
    val s = spark
    import s.implicits._
    val docs = (0L until 600L)
      .map(i => (i, s"src${i % 5}", (i % 97) + 1L)).toDF("doc_id", "source", "w")
    val plain = Curation.weightedSampleStratified(
        docs, "doc_id", "w", "source", perStratum = 9)
      .select("doc_id", "source", "key_fp")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // every stratum capped exactly (all 5 sources have >= 9 docs)
    assert(plain.groupBy(_._2).view.mapValues(_.size).toMap.values.toSet == Set(9))
    // the per-stratum winners are the stratum-local bottom-9 of the SAME
    // race keys the global sampler draws
    val keys = Curation.weightedKeys(docs, "doc_id", "w")
      .select("doc_id", "source", "key_fp")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val want = keys.groupBy(_._2).iterator.flatMap { case (_, rows) =>
      rows.sortBy(t => (t._3, t._1)).take(9)
    }.toSet
    assert(plain == want)
    // the salted two-phase returns exactly the unsalted answer
    for (salts <- Seq(2, 8, 32)) {
      val salted = Curation.weightedSampleStratified(
          docs, "doc_id", "w", "source", perStratum = 9, salts = salts)
        .select("doc_id", "source", "key_fp")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(salted == plain, s"salts=$salts diverged")
    }
  }

  test("weightedSample: inclusion tracks weight; bad weights and ids raise") {
    val s = spark
    import s.implicits._
    // one heavy doc (w=4096) among 200 light (w=1): in the exponential
    // race the heavy key is ~4096x smaller, so across 40 salted draws of
    // k=10 the heavy doc must appear in nearly all of them while any
    // fixed light doc appears in ~2
    val docs = (0L until 200L)
      .map(i => (i, if (i == 123L) 4096L else 1L)).toDF("doc_id", "w")
    val wins = (0 until 40).map { t =>
      Curation.weightedSample(docs, "doc_id", "w", 10, salt = 1000L + t)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val heavyWins = wins.count(_.contains(123L))
    assert(heavyWins >= 36, s"heavy doc won only $heavyWins/40 draws")
    val lightWinsMax = (0L until 200L).filter(_ != 123L)
      .map(i => wins.count(_.contains(i))).max
    assert(heavyWins > lightWinsMax,
      s"heavy $heavyWins <= busiest light $lightWinsMax")
    // loud rejects: zero, oversized, NULL weight; NULL id
    def boom(df: org.apache.spark.sql.DataFrame): Unit =
      intercept[Exception] {
        Curation.weightedSample(df, "doc_id", "w", 1).collect()
      }
    boom(Seq((1L, 0L)).toDF("doc_id", "w"))
    boom(Seq((1L, (1L << 20) + 1L)).toDF("doc_id", "w"))
    boom(docs.selectExpr("doc_id", "CAST(NULL AS BIGINT) AS w").limit(1))
    boom(docs.selectExpr("CAST(NULL AS BIGINT) AS doc_id", "w").limit(1))
  }

  test("corpusStats: exact percentiles over a known distribution") {
    val s = spark
    import s.implicits._
    // token counts 1..100 → p50 = 50.5, p90 = 90.1, mean chars exact
    val docs = (1 to 100).map(n => (n.toLong, Seq.fill(n)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val r = TextOps.corpusStats(docs, "text").head()
    assert(r.getLong(r.fieldIndex("n_docs")) == 100L)
    assert(r.getLong(r.fieldIndex("total_tokens")) == 5050L)
    assert(math.abs(r.getDouble(r.fieldIndex("p50_tokens")) - 50.5) < 1e-9)
    assert(math.abs(r.getDouble(r.fieldIndex("p90_tokens")) - 90.1) < 1e-9)
  }

  test("dedupLines removes cross-doc boilerplate, keeps order, keeps empties") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, "header\nunique one\nfooter"),
      (2L, "header\nunique two\nfooter"),
      (3L, "header\nfooter"), // all lines boilerplate → empty doc survives
      (4L, "solo line\nanother solo")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupLines(df, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got(0) == ((1L, "unique one", 1L, 2L)))
    assert(got(1) == ((2L, "unique two", 1L, 2L)))
    assert(got(2) == ((3L, "", 0L, 2L)))
    assert(got(3) == ((4L, "solo line\nanother solo", 2L, 0L)))
    // a line repeated WITHIN one doc is not boilerplate (distinct-doc count)
    val within = Seq((1L, "rep\nrep\nbody"), (2L, "other")).toDF("doc_id", "text")
    val kept = Dedup.dedupLines(within, "doc_id", "text", minDocs = 2)
      .where(col("doc_id") === 1L).head()
    assert(kept.getString(1) == "rep\nrep\nbody")
    // regex-special separators are treated literally
    val piped = Seq((1L, "common|keep one"), (2L, "common|keep two")).toDF("doc_id", "text")
    val p = Dedup.dedupLines(piped, "doc_id", "text", lineSep = "|", minDocs = 2)
      .orderBy("doc_id").collect()
    assert(p(0).getString(1) == "keep one" && p(1).getString(1) == "keep two")
  }

  test("WAV parser: MS ADPCM decodes by the coefficient/delta state walk") {
    // hand-built mono MS-ADPCM file: 7-byte header then high-first nibbles
    def msWav(ba: Int, pred: Int, delta: Int, s1: Int, s2: Int,
        nibs: Seq[Int], channels: Int = 1): Array[Byte] = {
      val buf = java.nio.ByteBuffer.allocate(44 + ba)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + ba).put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(2).putShort(channels.toShort).putInt(8000)
        .putInt(4055).putShort(ba.toShort).putShort(4)
      buf.put("data".getBytes("US-ASCII")).putInt(ba)
      buf.put(pred.toByte).putShort(delta.toShort).putShort(s1.toShort).putShort(s2.toShort)
      nibs.grouped(2).foreach(p => buf.put(((p(0) << 4) | p(1)).toByte))
      buf.array()
    }
    // predictor 0 (c1=256, c2=0 → base prediction = s1), delta=20:
    // n=1 (s=+1): 100 + 20 = 120, delta' = (230·20)>>8 = 17;
    // n=15 (s=−1): 120 − 17 = 103. Samples: 50, 100, 120, 103.
    val m = Multimodal.decodeWav(1L, msWav(8, 0, 20, 100, 50, Seq(1, 15))).get
    assert(m.bits_per_sample == 4 && m.channels == 1 && m.n_frames == 4L)
    assert(m.features(2) == (120.0 / 32768).toFloat)
    assert(m.features(0) == ((50.0 + 100 + 120 + 103) / 32768 / 4).toFloat)
    assert(m.features(3) == 0.0f)
    // adversarial repeated high-adaptation nibbles: the running delta
    // clamps at 32767 instead of wrapping Int; samples floor at -32768
    val clamp = Multimodal.decodeWav(1L,
      msWav(57, 0, 30000, 0, 0, Seq.fill(100)(8))).get
    assert(clamp.features(2) == 1.0f, clamp.features.toSeq)
    // negative coefficient sum pins TRUNCATING division (spec/ffmpeg)
    // over arithmetic shift: predictor 5 (c1=460, c2=-208), s1=1, s2=3,
    // zero nibbles → predictions -164/256 = 0 then -208/256 = 0
    // (a floor shift would give -1, -1 → mean 2/4 and one sign change)
    val neg = Multimodal.decodeWav(1L, msWav(8, 5, 16, 1, 3, Seq(0, 0))).get
    assert(neg.features(0) == (4.0 / 32768 / 4).toFloat, neg.features.toSeq)
    assert(neg.features(3) == 0.0f)
    // a predictor index past 6 invalidates the block → nothing decodes
    assert(Multimodal.decodeWav(1L, msWav(8, 7, 20, 100, 50, Seq(1, 15))).isEmpty)
    // stereo MS ADPCM is out of scope and must reject
    assert(Multimodal.decodeWav(1L,
      msWav(8, 0, 20, 100, 50, Seq(1, 15), channels = 2)).isEmpty)
    // fixture round-trip: header fields come from the generator formulas
    for (id <- Seq(0L, 1L, 2L, 3L, 6L)) {
      val f = Multimodal.decodeWav(id, Multimodal.syntheticWavMsAdpcm(id)).get
      val ba = 96 + (id % 4).toInt * 24
      assert(f.n_frames == 2L + (ba - 7) * 2, s"id=$id")
      assert(f.sample_rate == 8000 + (id % 3).toInt * 4000 && f.bits_per_sample == 4)
    }
  }

  test("qualityClassify: feature counts, score arithmetic, null-text handling") {
    val s = spark
    import s.implicits._
    import graft.operators.HashKernelsAccess.{fnv1a, mix}
    val docs = Seq((0L, "alpha beta gamma"), (1L, "alpha"), (2L, null: String))
      .toDF("doc_id", "text")
    val out = TextOps.qualityClassify(docs, "doc_id", "text", buckets = 1 << 20)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    def w(f: String): Long = {
      val b = java.lang.Long.remainderUnsigned(mix(fnv1a(f)), 1L << 20)
      java.lang.Long.remainderUnsigned(mix(b), 2001L) - 1000L
    }
    // 3 tokens → 3 unigrams + 2 bigrams; bigram features are the
    // space-joined strings (the kernel's byte-continued fold must equal
    // hashing the concatenation)
    val ws0 = Seq("alpha", "beta", "gamma", "alpha beta", "beta gamma").map(w).sum
    assert(out(0) == ((0L, 5L, ws0, ws0 / 1000.0 / 5.0, ws0 > 0)))
    // single token → 1 feature, no bigram
    assert(out(1)._2 == 1L && out(1)._3 == w("alpha"))
    // NULL text coalesces to "" → one empty-string token, never a NULL row
    assert(out(2)._2 == 1L && out(2)._3 == w(""))
  }

  test("incrementalDedup keeps only new digests, smallest id within batch") {
    val s = spark
    import s.implicits._
    val incoming = Seq((2L, "a"), (1L, "a"), (3L, "x"), (4L, "b"))
      .toDF("doc_id", "text")
    val seen = Seq((100L, "x")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(incoming, seen, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    // "a" keeps the smaller id 1; "x" is already seen; "b" is new
    assert(out.map(_._1).toSeq == Seq(1L, 4L))
    assert(out(0)._2 == java.security.MessageDigest.getInstance("MD5")
      .digest("a".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("nbClassify matches hand-computed add-one log-odds") {
    val s = spark
    import s.implicits._
    // training: "good good" (pos) has features {good×2, 'good good'},
    // "bad bad" (neg) {bad×2, 'bad bad'} → pn = nn = 3, V = 4+1,
    // prior = ln(2) − ln(2) = 0
    val ref = Seq((1L, "good good", true), (2L, "bad bad", false))
      .toDF("doc_id", "text", "y")
    val docs = Seq((10L, "good"), (11L, "bad"), (12L, "new"))
      .toDF("doc_id", "text")
    val out = TextOps.nbClassify(docs, ref, "doc_id", "text", "y")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // "good": w = (ln 3 − ln 8) − (ln 1 − ln 8) = ln 3
    val ln3 = BigDecimal(math.log(3.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    assert(out(0) == ((10L, 1L, ln3.toDouble, true)))
    // "bad": the mirror image — −ln 3, filtered
    assert(out(1) == ((11L, 1L, -ln3.toDouble, false)))
    // unseen feature: w = 0, round(0) > 0 is false
    assert(out(2) == ((12L, 1L, 0.0, false)))
  }

  test("nbClassify (r16 fused): bit-identical to the aggregation path") {
    val s = spark
    val d = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = d.where(col("doc_id") % 2 =!= 0)
    val ref = d.where(col("doc_id") % 2 === 0)
      .withColumn("y", TextOps.stopwordRatio(col("text")) >= 0.06)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), java.lang.Double.doubleToLongBits(r.getDouble(2)),
          r.getBoolean(3)))).toMap
    val fused = rowsOf(TextOps.nbClassify(corpus, ref, "doc_id", "text", "y"))
    val agg = rowsOf(TextOps.nbClassifyAgg(corpus, ref, "doc_id", "text", "y"))
    assert(fused.keySet == agg.keySet)
    val bad = fused.keySet.filter(k => fused(k) != agg(k))
    assert(bad.isEmpty, s"diverging docs: ${bad.take(5).map(k =>
      s"$k fused=${fused(k)} agg=${agg(k)}")}")
  }

  test("lmPerplexity matches hand-computed add-one bigram probabilities") {
    val s = spark
    import s.implicits._
    // reference "a b a b": uni a:2 b:2, N=4, V = 2+1 = 3;
    // bigrams (a,b):2, (b,a):1
    val ref = Seq((0L, "a b a b")).toDF("doc_id", "text")
    val docs = Seq((1L, "a b"), (2L, "z z")).toDF("doc_id", "text")
    val out = TextOps.lmPerplexity(docs, ref, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val ln = (x: Double) => math.log(x)
    // "a b": P(a) = 3/7 (unigram, N+V), P(b|a) = 3/5 (c(a,b)+1 / c(a)+V)
    val x1 = -((ln(3) - ln(7)) + (ln(3) - ln(5))) / 2
    // "z z": P(z) = 1/7, P(z|z) = 1/3 — the (z,z) transition is unseen
    val x2 = -((ln(1) - ln(7)) + (ln(1) - ln(3))) / 2
    assert(out(0)._1 == 1L && out(0)._2 == 2L && out(0)._3 == 0L)
    assert(math.abs(out(0)._4 - x1) < 1e-12, s"${out(0)._4} vs $x1")
    assert(out(1)._1 == 2L && out(1)._2 == 2L && out(1)._3 == 1L)
    assert(math.abs(out(1)._4 - x2) < 1e-12, s"${out(1)._4} vs $x2")
    // model fingerprint (q_lm_ppl's oracle surface): xor-of-mix64 over
    // the exact integer (pos, num, den) stream, hand-replayed here —
    // together with the exact xent checks above, this pins that xent is
    // the ln fold of exactly the integers the oracle verifies
    val mix = operators.HashKernelsAccess.mix _
    def fpOf(rows: Seq[(Long, Long, Long)]): Long =
      rows.map { case (pos, num, den) =>
        mix(pos + 1L) ^ mix(num + 2L) ^ mix(den + 3L)
      }.reduce(_ ^ _)
    val fps = TextOps.lmPerplexity(docs, ref, "doc_id", "text",
        withModelFingerprint = true)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("model_fp"))).toMap
    // "a b": P(a)=3/7, P(b|a)=3/5; "z z": P(z)=1/7, P(z|z)=1/3
    assert(fps(1L) == fpOf(Seq((0L, 3L, 7L), (1L, 3L, 5L))), fps.toString)
    assert(fps(2L) == fpOf(Seq((0L, 1L, 7L), (1L, 1L, 3L))), fps.toString)
    // common fluent text scores lower than shuffled/gibberish text
    val ref2 = (0 until 40).map(i =>
      (i.toLong, "the cat sat on the mat and the dog ran off")).toDF("doc_id", "text")
    val probe = Seq(
      (100L, "the cat sat on the mat"),
      (101L, "mat the on sat cat the"),
      (102L, "qq ww ee rr tt yy")).toDF("doc_id", "text")
    val sc = TextOps.lmPerplexity(probe, ref2, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getDouble(3))
    // fluent text scores far below both; note shuffled-but-seen words can
    // score WORSE than all-OOV gibberish in a backoff-free add-one bigram
    // model (unseen transition after a frequent word divides by
    // c(prev) + V, not just V) — so only the fluent-vs-rest order is pinned
    assert(sc(0) < sc(1) && sc(0) < sc(2), sc.toSeq)
  }

  test("dsirWeights/dsirSelect: match an independent hashed-feature model") {
    val s = spark
    import s.implicits._
    val buckets = 1 << 16
    val target = Seq(
      (100L, "good clean prose text"),
      (101L, "clean prose text flows well")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "good clean prose text here"),   // target-like → high weight
      (2L, "zz qq ww ee rr"),               // target-alien → low weight
      (3L, "clean prose"),
      (4L, null.asInstanceOf[String]))      // NULL text → "" → 1 feature
      .toDF("doc_id", "text")
    // independent model: unigrams + adjacent bigrams, bucket =
    // splitmix64(fnv1a64(f)) & (buckets-1), add-one ln ratios in
    // feature-position order, Math.log throughout
    def feats(t: String): Seq[String] = {
      val tk = Option(t).getOrElse("").split(" ", -1).toSeq
      tk ++ tk.sliding(2).filter(_.size == 2).map(_.mkString(" "))
    }
    def bucket(f: String): Long =
      operators.HashKernelsAccess.mix(operators.HashKernelsAccess.fnv1a(f)) &
        (buckets - 1L)
    val tCnt = Seq((100L, "good clean prose text"), (101L, "clean prose text flows well"))
      .flatMap { case (_, t) => feats(t) }.groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val corpusRows = Seq((1L, "good clean prose text here"), (2L, "zz qq ww ee rr"),
      (3L, "clean prose"), (4L, null.asInstanceOf[String]))
    val sCnt = corpusRows.flatMap { case (_, t) => feats(t) }
      .groupBy(bucket).view.mapValues(_.size.toLong).toMap
    val nT = tCnt.values.sum
    val nS = sCnt.values.sum
    val vocab = (tCnt.keySet ++ sCnt.keySet).size + 1L
    def model(t: String): (Long, Double, Double) = {
      val fs = feats(t)
      val wf = fs.map { f =>
        val b = bucket(f)
        Math.log((tCnt.getOrElse(b, 0L) + 1L).toDouble) -
          Math.log((sCnt.getOrElse(b, 0L) + 1L).toDouble)
      }.foldLeft(0.0)(_ + _)
      val lw = wf - fs.size.toDouble *
        (Math.log((nT + vocab).toDouble) - Math.log((nS + vocab).toDouble))
      (fs.size.toLong, wf, lw)
    }
    val got = operators.Curation.dsirWeights(corpus, target, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getDouble(6)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    for ((id, t) <- corpusRows) {
      val (nf, wf, lw) = model(Option(t).getOrElse(""))
      val (gnf, gwf, gnt, gns, gv, glw) = got(id)
      assert(gnf == nf, s"doc $id n_feats")
      assert(gwf == BigDecimal(wf).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble, s"doc $id w_feat $gwf vs $wf")
      assert((gnt, gns, gv) == ((nT, nS, vocab)), s"doc $id totals")
      // log_w is the spec-pinned surface (corpus-scale ln args keep it
      // out of the oracle projection): exact bit equality with the model
      assert(java.lang.Double.doubleToLongBits(glw) ==
        java.lang.Double.doubleToLongBits(lw), s"doc $id log_w $glw vs $lw")
    }
    // the target-like doc outranks the alien one; selection respects log_w
    assert(got(1L)._6 > got(2L)._6)
    val sel = operators.Curation.dsirSelect(corpus, target, "doc_id", "text", k = 2)
      .collect().map(_.getLong(0)).toSet
    val wantTop = corpusRows.map { case (id, t) =>
      id -> model(Option(t).getOrElse(""))._3 }.sortBy(-_._2).take(2).map(_._1).toSet
    assert(sel == wantTop, s"$sel vs $wantTop")
  }

  test("dsirScoreFused: bit-identical to dsirWeights; zero-Exchange codegen scan") {
    val s = spark
    val d = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val corpus = d.where(col("doc_id") % 20 =!= 0)
    val target = d.where(col("doc_id") % 20 === 0)
    def rowsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        ((r.getLong(1), java.lang.Double.doubleToLongBits(r.getDouble(2)),
          r.getLong(3), r.getLong(4), r.getLong(5),
          java.lang.Double.doubleToLongBits(r.getDouble(6))))).toMap
    // dsirWeightsAgg = the retained aggregation path, so this spec keeps
    // comparing two INDEPENDENT implementations (dsirWeights itself now
    // delegates to the fused route)
    val agg = rowsOf(operators.Curation.dsirWeightsAgg(corpus, target, "doc_id", "text"))
    val model = operators.Curation.dsirTrain(corpus, target, "doc_id", "text")
    val fusedDf = operators.Curation.dsirScoreFused(corpus, "doc_id", "text", model)
    val fused = rowsOf(fusedDf)
    assert(fused.keySet == agg.keySet)
    val bad = fused.keySet.filter(k => fused(k) != agg(k))
    assert(bad.isEmpty, s"diverging docs: ${bad.take(5).map(k =>
      s"$k fused=${fused(k)} agg=${agg(k)}")}")
    // the production scale shape: ONE narrow codegen'd scan — the weight
    // table is kernel literal data, so no Exchange, no Join, no groupBy
    val plan = fusedDf.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert("Scan parquet".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("*(1)"), plan)
    // unseen-bucket behavior for NEW (non-training) docs: every feature
    // unobserved in training scores exactly ln1 − ln1 = 0, so w_feat = 0
    // and log_w is pure normalizer
    import s.implicits._
    val novel = Seq((999000L, "xqzy wvut")).toDF("doc_id", "text")
    val nr = operators.Curation.dsirScoreFused(novel, "doc_id", "text", model).head()
    assert(nr.getDouble(2) == 0.0, nr.toString)
  }

  test("dsirSample: Gumbel-max keys match the model; weight biases selection across salts") {
    val s = spark
    import s.implicits._
    val target = Seq((100L, "good clean prose text")).toDF("doc_id", "text")
    val corpus = (1L to 20L).map(i =>
      (i, if (i <= 4) "good clean prose text" else "zz qq ww ee rr"))
      .toDF("doc_id", "text")
    // model: log_w from the dsirWeights output itself (already pinned
    // bit-exactly by the dsirWeights spec) + the Gumbel transform with
    // StrictMath.log — Spark's built-in log, which this non-oracle path
    // deliberately uses (fractional args; MathLn buys nothing here)
    val lw = operators.Curation.dsirWeights(corpus, target, "doc_id", "text")
      .select(col("doc_id"), col("log_w"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def key(id: Long, salt: Long): Double = {
      val u = ((operators.HashKernelsAccess.mix(id + salt) >>> 11).toDouble + 0.5) /
        9007199254740992.0
      lw(id) + -StrictMath.log(-StrictMath.log(u))
    }
    val got = operators.Curation.dsirSample(
        corpus, target, "doc_id", "text", k = 5, salt = 7L)
      .select(col("doc_id"), col("gumbel_key"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = (1L to 20L).map(i => i -> key(i, 7L)).sortBy(-_._2).take(5).toMap
    assert(got.keySet == want.keySet, s"$got vs $want")
    got.foreach { case (id, k0) =>
      assert(java.lang.Double.doubleToLongBits(k0) ==
        java.lang.Double.doubleToLongBits(want(id)), s"doc $id key")
    }
    // across salts, target-like docs (1..4) are sampled far above their
    // 4/20 base rate — the weights genuinely bias the sampling
    val hits = (0 until 30).map { e =>
      operators.Curation.dsirSample(corpus, target, "doc_id", "text",
          k = 5, salt = 1000L + e)
        .collect().map(_.getLong(0)).count(_ <= 4L)
    }.sum
    assert(hits > 60, s"target-like hits $hits of 150 slots (base rate would be 30)")
  }

  test("repetitionStats matches a hand-computed doc; ties break smallest") {
    val s = spark
    import s.implicits._
    // tokens: a b a b a c  → 2-grams: (a b)x2 (b a)x2 (a c)x1
    // top gram by count, tie (a b)/(b a) → lexicographic "a b", len 3
    // lines: "a b a" and "b a c" distinct → no dup lines
    val df = Seq((1L, "a b a\nb a c")).toDF("doc_id", "text")
    val r = TextOps.repetitionStats(df, "doc_id", "text").head()
    assert(r.getLong(r.fieldIndex("n_lines")) == 2L)
    assert(r.getDouble(r.fieldIndex("dup_line_frac")) == 0.0)
    // n_chars = 11 → top2 = 2*3/11
    assert(math.abs(r.getDouble(r.fieldIndex("top2gram_char_frac")) - 6.0 / 11.0) < 1e-12)
    assert(r.getDouble(r.fieldIndex("dup5gram_char_frac")) == 0.0)
    // duplicated lines + duplicated 5-grams in one doc
    val rep = Seq((1L, "x y z w v\nx y z w v\nx y z w v")).toDF("doc_id", "text")
    val r2 = TextOps.repetitionStats(rep, "doc_id", "text").head()
    assert(math.abs(r2.getDouble(r2.fieldIndex("dup_line_frac")) - 2.0 / 3.0) < 1e-12)
    assert(math.abs(r2.getDouble(r2.fieldIndex("dup_line_char_frac")) - 2.0 / 3.0) < 1e-12)
    assert(!r2.getBoolean(r2.fieldIndex("gopher_ok")))
    // doc shorter than the gram width → zero fractions, no crash
    val short = Seq((1L, "one")).toDF("doc_id", "text")
    val r3 = TextOps.repetitionStats(short, "doc_id", "text").head()
    assert(r3.getDouble(r3.fieldIndex("top2gram_char_frac")) == 0.0)
    assert(r3.getBoolean(r3.fieldIndex("gopher_ok")))
  }

  test("decontaminate flags n-gram overlap with the benchmark set only") {
    val s = spark
    import s.implicits._
    val bench = Seq((100L, "the secret eval answer is here")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "totally unrelated training document text"),
      (2L, "prefix words the secret eval answer is here suffix"), // contains a bench 4-gram
      (3L, "secret answer eval the")                              // same words, no shared 4-gram
    ).toDF("doc_id", "text")
    val got = Curation.decontaminate(train, bench, "doc_id", "text", n = 4)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got(0) == ((1L, 0L, false)))
    assert(got(1)._1 == 2L && got(1)._2 >= 1L && got(1)._3)
    assert(got(2) == ((3L, 0L, false)))
  }

  test("assignShards is deterministic, covers all shards, and writes sorted layout") {
    val s = spark
    import s.implicits._
    val docs = (0L until 256L).toDF("doc_id")
    val a = Curation.assignShards(docs, "doc_id", numShards = 8)
    val b = Curation.assignShards(docs.repartition(7), "doc_id", numShards = 8)
    // partitioning-independent and reproducible
    assert(a.orderBy("doc_id").collect().toSeq == b.orderBy("doc_id").collect().toSeq)
    val byShard = a.groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byShard.keySet == (0 until 8).toSet) // every shard populated
    assert(byShard.values.min > 8) // roughly balanced (256/8 = 32 expected)
    // write path: one directory per shard, rows sorted by shard_ord within
    val tmp = java.nio.file.Files.createTempDirectory("graft_shards_").toString
    try {
      Curation.writeShards(docs, "doc_id", numShards = 8, path = tmp)
      val dirs = new java.io.File(tmp).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("shard=")).sorted
      assert(dirs.toSeq == (0 until 8).map(i => s"shard=$i").sorted)
      val back = s.read.parquet(tmp)
      assert(back.count() == 256L)
      for (d <- dirs.take(2)) {
        val ords = s.read.parquet(s"$tmp/$d").select("shard_ord")
          .collect().map(_.getLong(0)).toSeq
        assert(ords == ords.sorted, s"$d not sorted")
      }
      // incremental append: a second batch lands in the same shards (same
      // salt), adding files; compaction restores one sorted file per shard
      // with all rows intact
      Curation.appendShards((256L until 512L).toDF("doc_id"), "doc_id",
        numShards = 8, path = tmp)
      assert(s.read.parquet(tmp).count() == 512L)
      def filesIn(d: String): Int = new java.io.File(s"$tmp/$d").listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(dirs.exists(d => filesIn(d) > 1), "append should add files")
      Curation.compactShards(s, tmp, "doc_id")
      val dirs2 = new java.io.File(tmp).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("shard=")).sorted
      assert(dirs2.toSeq == (0 until 8).map(i => s"shard=$i").sorted)
      assert(dirs2.forall(d => filesIn(d) == 1), "compaction must leave one file per shard")
      assert(s.read.parquet(tmp).count() == 512L)
      // the per-shard sort invariant holds over the merged data
      for (d <- dirs2) {
        val ords = s.read.parquet(s"$tmp/$d").select("shard_ord")
          .collect().map(_.getLong(0)).toSeq
        assert(ords == ords.sorted, s"$d not sorted after compaction")
      }
      // assignment unchanged: every row still in its deterministic shard
      val reassigned = Curation.assignShards(
        s.read.parquet(tmp).select("doc_id"), "doc_id", numShards = 8)
        .withColumnRenamed("shard", "expected_shard").select("doc_id", "expected_shard")
      val moved = s.read.parquet(tmp).select(col("doc_id"), col("shard"))
        .join(reassigned, "doc_id")
        .where(col("shard") =!= col("expected_shard")).count()
      assert(moved == 0L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("PQ ADC top-k approximates brute-force cosine ranking") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    // ADC approximates the DOT product — compare against the exact dot
    // ranking (cosine differs on unnormalized vectors by design)
    val exactDot = emb.select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        var d = 0.0
        var i = 0
        while (i < q.length) { d += q(i).toDouble * v(i).toDouble; i += 1 }
        (r.getLong(0), d)
      }
      .sortBy { case (id, d) => (-d, id) }.take(20).map(_._1).toSet
    val pq = Similarity.pqTopK(emb, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0))
    // the query vector itself must rank first (its codes reconstruct it
    // best), and recall vs the exact-dot top-20 should be well above chance
    assert(pq.head == 0L, pq.toSeq)
    val recall = pq.count(exactDot.contains) / 20.0
    assert(recall >= 0.5, s"PQ recall vs exact dot: $recall")
    // deterministic across partitioning
    val again = Similarity.pqTopK(emb.repartition(7), "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0))
    assert(pq.toSeq == again.toSeq)
  }

  test("SQ8 top-k: integer code dot approximates exact dot; deterministic") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val exactDot = emb.select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        var d = 0.0
        var i = 0
        while (i < q.length) { d += q(i).toDouble * v(i).toDouble; i += 1 }
        (r.getLong(0), d)
      }
      .sortBy { case (id, d) => (-d, id) }.take(20).map(_._1).toSet
    val sq = Similarity.sqTopK(emb, "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0))
    // 8-bit/dim quantization is much finer than PQ's subspace codes —
    // the query ranks first and recall should be near-exact
    assert(sq.head == 0L, sq.toSeq)
    val recall = sq.count(exactDot.contains) / 20.0
    assert(recall >= 0.8, s"SQ8 recall vs exact dot: $recall")
    // deterministic across partitioning (integer scores are order-free)
    val again = Similarity.sqTopK(emb.repartition(7), "vec_id", "embedding", q, 20)
      .collect().map(_.getLong(0))
    assert(sq.toSeq == again.toSeq)
    // trained scale round-trip: passing it explicitly changes nothing
    val trained = Similarity.trainSq(emb, "embedding")
    val withTrained = Similarity
      .sqTopK(emb, "vec_id", "embedding", q, 20, trainedAbsmax = trained)
      .collect().map(_.getLong(0))
    assert(sq.toSeq == withTrained.toSeq)
  }

  test("IVF+PQ composed top-k: probed residual codes approximate exact dot") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val exactDot = emb.select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        var d = 0.0
        var i = 0
        while (i < q.length) { d += q(i).toDouble * v(i).toDouble; i += 1 }
        (r.getLong(0), d)
      }
      .sortBy { case (id, d) => (-d, id) }.take(20).map(_._1).toSet
    val trained = Similarity.trainIvfPq(emb, "vec_id", "embedding")
    val res = Similarity.ivfPqTopK(emb, "vec_id", "embedding", q, 20,
      trained = trained).collect()
    val ids = res.map(_.getLong(0))
    // the query's own cell is always the top probe and its codes
    // reconstruct it best -> self ranks first
    assert(ids.head == 0L, ids.toSeq)
    val recall = ids.count(exactDot.contains) / 20.0
    assert(recall >= 0.4, s"IVF+PQ recall vs exact dot: $recall")
    // deterministic across partitioning (trained index fixed)
    val again = Similarity.ivfPqTopK(emb.repartition(7), "vec_id", "embedding",
      q, 20, trained = trained).collect().map(_.getLong(0))
    assert(ids.toSeq == again.toSeq)
  }

  test("IVF+PQ exact re-rank recovers recall lost to quantization") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val exactDot = emb.select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val v = r.getSeq[Float](1)
        var d = 0.0
        var i = 0
        while (i < q.length) { d += q(i).toDouble * v(i).toDouble; i += 1 }
        (r.getLong(0), d)
      }
      .sortBy { case (id, d) => (-d, id) }.take(20).map(_._1).toSet
    val trained = Similarity.trainIvfPq(emb, "vec_id", "embedding")
    val adc = Similarity.ivfPqTopK(emb, "vec_id", "embedding", q, 20,
      trained = trained).collect().map(_.getLong(0))
    val rr = Similarity.ivfPqRerankTopK(emb, "vec_id", "embedding", q, 20,
      trained = trained).collect()
    val rrIds = rr.map(_.getLong(0))
    assert(rrIds.head == 0L, rrIds.toSeq)
    assert(math.abs(rr.head.getDouble(1) - 1.0) < 1e-9) // exact self-cosine
    // the exact pass can only improve on the ADC-only ranking (same
    // probed cells, shortlist ⊇ any top-20 the ADC scan would return)
    val adcRecall = adc.count(exactDot.contains) / 20.0
    val rrRecall = rrIds.count(exactDot.contains) / 20.0
    assert(rrRecall >= adcRecall, s"rerank $rrRecall < adc $adcRecall")
    // shortlist fetch must broadcast, never shuffle the corpus
    val plan = Similarity.ivfPqRerankTopK(emb, "vec_id", "embedding", q, 20,
      trained = trained).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("knnJoin: batch top-k equals per-query brute force, deterministic, guarded") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 3)
    val got = Similarity.knnJoin(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .orderBy(col("qid"), desc("cos"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got.size == 15, s"3 queries x k=5, got ${got.size}")
    // each query's block equals the single-query brute force (same
    // rounded-cos ranking the oracle uses)
    for (qid <- 0L to 2L) {
      val q = emb.where(col("vec_id") === qid)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val bf = emb.select(col("vec_id"),
          round(Similarity.cosine(col("embedding"), typedlit(q)), 6).as("cos"))
        .orderBy(desc("cos"), col("vec_id")).limit(5)
        .collect().map(_.getLong(0)).toSeq
      assert(got.filter(_._1 == qid).map(_._2) == bf, s"query $qid")
      // self is its own nearest neighbor
      assert(got.filter(_._1 == qid).head._2 == qid)
    }
    // deterministic across partitioning
    val again = Similarity.knnJoin(emb.repartition(7), "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .orderBy(col("qid"), desc("cos"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == again)
    // the query side is broadcast by contract — a too-big side fails loudly
    val e = intercept[IllegalArgumentException] {
      Similarity.knnJoin(emb, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5, maxQueries = 10)
    }
    assert(e.getMessage.contains("maxQueries"))
  }

  test("knnJoinIvf: probed-cell pruning, high recall vs exact knnJoin, deterministic") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 3)
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 8)
    val exact = Similarity.knnJoin(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing ALL cells = the same candidate set as exact; selection only
    // differs at raw-vs-rounded boundary ties, so recall must be ~total
    val allCells = Similarity.knnJoinIvf(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5,
        nCells = 8, nProbe = 8, trainedCentroids = cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((exact intersect allCells).size >= 13,
      s"all-cell probe should nearly match exact: ${(exact diff allCells)}")
    // the default pruned probe keeps most of the true neighbors
    val pruned = Similarity.knnJoinIvf(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5,
        nCells = 8, nProbe = 3, trainedCentroids = cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect pruned).size.toDouble / exact.size
    assert(recall >= 0.6, s"pruned recall $recall")
    // each query's own vector is its top hit (it lives in a probed cell
    // by construction — the cell it is nearest to is probed first)
    val top = Similarity.knnJoinIvf(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5,
        nCells = 8, nProbe = 3, trainedCentroids = cents)
      .orderBy(col("qid"), desc("cos"), col("vec_id"))
      .collect().groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.head.getLong(1) }
    assert(top == Map(0L -> 0L, 1L -> 1L, 2L -> 2L), top.toString)
    // deterministic across partitioning (trained index fixed)
    val again = Similarity.knnJoinIvf(emb.repartition(7), "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5,
        nCells = 8, nProbe = 3, trainedCentroids = cents)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == again)
  }

  test("IVF+PQ re-rank at DEFAULT parameters recovers >=0.95 recall@20 on clustered vectors") {
    // the ScaleProbe sweep corpus at spec scale: 2048 latent centroids ×
    // 20 members in 64-dim, noise 0.15 — the regime real embeddings live
    // in; the true cosine top-20 is essentially the query's own cluster,
    // separated from the rest by far more than the quantization error.
    // (On uniform random vectors recall is quantization-bound ~0.7 even
    // probing all cells — structureless data is not the operator's
    // contract; the sweep table in SURVEY §8.2 documents both regimes.)
    val s = spark
    val n = 40960L
    val emb = s.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        j => ((graft.operators.mix64(pmod(col("id"), lit(2048)) * 64 + j, 101L).cast("double") /
            lit(9.223372036854776e18)) +
          (graft.operators.mix64(col("id") * 64 + j, 23L).cast("double") /
            lit(9.223372036854776e18)) * lit(0.15)).cast("float")).as("embedding"))
      .cache()
    try {
      val q = emb.where(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      val qn = math.sqrt(q.map(x => x.toDouble * x.toDouble).sum)
      val exactCos = emb.select(col("vec_id"), col("embedding")).collect()
        .map { r =>
          val v = r.getSeq[Float](1)
          var d = 0.0; var nn = 0.0; var i = 0
          while (i < q.length) {
            d += q(i).toDouble * v(i).toDouble; nn += v(i).toDouble * v(i).toDouble
            i += 1
          }
          (r.getLong(0), d / (qn * math.sqrt(nn)))
        }.sortBy { case (id, c) => (-c, id) }.take(20).map(_._1).toSet
      val rr = Similarity.ivfPqRerankTopK(emb, "vec_id", "embedding", q, 20)
        .collect().map(_.getLong(0))
      val recall = rr.count(exactCos.contains) / 20.0
      assert(recall >= 0.95, s"default-config rerank recall@20 = $recall")
    } finally emb.unpersist()
  }

  test("residual PQ beats flat PQ on clustered data at equal code budget") {
    val s = spark
    import s.implicits._
    // 8 well-separated latent clusters in 32-dim with small noise — the
    // regime residual quantization is built for
    val vecs = (0 until 512).map { i =>
      val g = i % 8
      (i.toLong, Array.tabulate(32)(d =>
        (2.0 * math.cos(g * 23 + d * 3) + 0.1 * math.sin(i * 13 + d * 7)).toFloat))
    }
    val df = vecs.toDF("vec_id", "embedding")
    val q = vecs(42)._2
    val exactDot = vecs.map { case (id, v) =>
      var d = 0.0
      var i = 0
      while (i < q.length) { d += q(i).toDouble * v(i).toDouble; i += 1 }
      (id, d)
    }.sortBy { case (id, d) => (-d, id) }.take(20).map(_._1).toSet
    val flat = Similarity.pqTopK(df, "vec_id", "embedding", q, 20, m = 8)
      .collect().map(_.getLong(0)).count(exactDot.contains) / 20.0
    val composed = Similarity.ivfPqTopK(df, "vec_id", "embedding", q, 20,
      nCells = 8, nProbe = 8, m = 8).collect()
      .map(_.getLong(0)).count(exactDot.contains) / 20.0
    assert(composed >= flat,
      s"residual coding should not lose to flat PQ here: flat=$flat composed=$composed")
    assert(composed >= 0.5, s"IVF+PQ recall on clustered data: $composed")
  }

  test("asofJoin: backward match, equal-ts inclusive, ties pick greatest right id") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "k1", 100L), // equal-ts right exists → matches it ("at or before")
      (2L, "k1", 205L), // two rights tie at t=200 → greatest rid wins
      (3L, "k1", 50L),  // nothing at or before → nulls
      (4L, "k2", 100L), // only right is AFTER → nulls
      (5L, "k3", 10L)   // key has no right rows at all → nulls
    ).toDF("event_id", "key", "t")
    val right = Seq(
      ("k1", 100L, 10L, "a"),
      ("k1", 200L, 11L, "b"),
      ("k1", 200L, 12L, "c"),
      ("k2", 150L, 13L, "d")
    ).toDF("key", "t", "rid", "rv")
    val got = Joins.asofJoin(left, right, "key", "t", "rid", Seq("rv"))
      .orderBy("event_id").collect()
    def m(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(3)) null else (r.getLong(3), r.getLong(4), r.getString(5)))
    assert(got.map(m).toSeq == Seq(
      (1L, (100L, 10L, "a")),
      (2L, (200L, 12L, "c")),
      (3L, null), (4L, null), (5L, null)), got.mkString("\n"))
  }

  test("asofJoin: tolerance boundary is inclusive; NULL times never match; empty right") {
    val s = spark
    import s.implicits._
    val left = Seq((1L, "k1", Some(205L)), (2L, "k1", None))
      .toDF("event_id", "key", "t")
    val right = Seq(("k1", Some(200L), 10L), ("k1", None: Option[Long], 99L))
      .toDF("key", "t", "rid")
    // gap is exactly 5: tolerance 5 keeps the match, 4 drops it
    // output layout: (event_id, key, t, asof_t, rid)
    val at5 = Joins.asofJoin(left, right, "key", "t", "rid", tolerance = 5L)
      .orderBy("event_id").collect()
    assert(at5(0).getLong(3) == 200L && at5(0).getLong(4) == 10L, at5.toSeq)
    assert(at5(1).isNullAt(3), "NULL left time must not match")
    val at4 = Joins.asofJoin(left, right, "key", "t", "rid", tolerance = 4L)
      .orderBy("event_id").collect()
    assert(at4(0).isNullAt(3), "tolerance 4 must drop a gap of 5")
    // a NULL-time right row never carries (rid 99 appears nowhere)
    val unbounded = Joins.asofJoin(left, right, "key", "t", "rid")
      .orderBy("event_id").collect()
    assert(unbounded(0).getLong(4) == 10L && unbounded(1).isNullAt(3))
    // empty right side: every left row comes back with NULL right fields
    val none = Joins.asofJoin(left, right.where(lit(false)), "key", "t", "rid")
      .orderBy("event_id").collect()
    assert(none.length == 2 && none.forall(_.isNullAt(3)))
    // clashing right column names are rejected up front
    val clash = intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right.withColumnRenamed("rid", "event_id"),
        "key", "t", "event_id")
    }
    assert(clash.getMessage.contains("clash"))
  }

  test("asofJoin forward: earliest at-or-after, equal-ts inclusive, tie → greatest rid") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "k1", 100L), // equal-ts right → matches it ("at or after")
      (2L, "k1", 205L), // nothing at or after → nulls
      (3L, "k1", 50L),  // earliest after is t=100
      (4L, "k2", 100L), // right at 150 qualifies forward
      (5L, "k3", 10L),  // no right rows for the key
      (6L, "k1", 150L)  // two rights tie at t=200 → greatest rid wins
    ).toDF("event_id", "key", "t")
    val right = Seq(
      ("k1", 100L, 10L, "a"),
      ("k1", 200L, 11L, "b"),
      ("k1", 200L, 12L, "c"),
      ("k2", 150L, 13L, "d")
    ).toDF("key", "t", "rid", "rv")
    val got = Joins.asofJoinDirected(left, right, "key", "t", "rid", Seq("rv"),
        direction = "forward")
      .orderBy("event_id").collect()
    def m(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(3)) null else (r.getLong(3), r.getLong(4), r.getString(5)))
    assert(got.map(m).toSeq == Seq(
      (1L, (100L, 10L, "a")),
      (2L, null),
      (3L, (100L, 10L, "a")),
      (4L, (150L, 13L, "d")),
      (5L, null),
      (6L, (200L, 12L, "c"))), got.mkString("\n"))
  }

  test("asofJoin nearest: closer side wins, equal distance → backward, tolerance masks both") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "k1", 100L), // backward at distance 0 wins
      (2L, "k1", 205L), // only backward (d=5) exists
      (3L, "k1", 50L),  // only forward (d=50) exists
      (4L, "k2", 100L), // only forward (d=50) exists
      (5L, "k3", 10L),  // no rights
      (6L, "k1", 150L)  // backward d=50 vs forward d=50 → backward
    ).toDF("event_id", "key", "t")
    val right = Seq(
      ("k1", 100L, 10L, "a"),
      ("k1", 200L, 11L, "b"),
      ("k1", 200L, 12L, "c"),
      ("k2", 150L, 13L, "d")
    ).toDF("key", "t", "rid", "rv")
    def run(tol: Long) =
      Joins.asofJoinDirected(left, right, "key", "t", "rid", Seq("rv"),
          tolerance = tol, direction = "nearest")
        .orderBy("event_id").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(3)) null else (r.getLong(3), r.getLong(4), r.getString(5)))).toSeq
    assert(run(-1L) == Seq(
      (1L, (100L, 10L, "a")),
      (2L, (200L, 12L, "c")),
      (3L, (100L, 10L, "a")),
      (4L, (150L, 13L, "d")),
      (5L, null),
      (6L, (100L, 10L, "a"))), run(-1L).mkString("\n")) // tie → backward
    // tolerance 49 keeps only the distance-5 backward match
    assert(run(49L) == Seq(
      (1L, (100L, 10L, "a")),
      (2L, (200L, 12L, "c")),
      (3L, null), (4L, null), (5L, null), (6L, null)), run(49L).mkString("\n"))
  }

  test("asofJoinBroadcast agrees with union-and-carry on every edge case") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "k1", Some(100L)), (2L, "k1", Some(205L)), (3L, "k1", Some(50L)),
      (4L, "k2", Some(100L)), (5L, "k3", Some(10L)), (6L, "k1", Some(150L)),
      (7L, "k1", None: Option[Long]) // NULL left time → no match on both paths
    ).toDF("event_id", "key", "t")
    val right = Seq(
      ("k1", Some(100L), 10L, "a"),
      ("k1", Some(200L), 11L, "b"),
      ("k1", Some(200L), 12L, "c"),
      ("k2", Some(150L), 13L, "d"),
      ("k1", None: Option[Long], 99L, "z") // NULL right time never matches
    ).toDF("key", "t", "rid", "rv")
    for (tol <- Seq(-1L, 0L, 5L, 49L, 1000L)) {
      val window = Joins.asofJoin(left, right, "key", "t", "rid", Seq("rv"), tol)
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      val bcast = Joins.asofJoinBroadcast(left, right, "key", "t", "rid", Seq("rv"), tol)
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      assert(bcast == window, s"tolerance=$tol:\n$bcast\nvs\n$window")
    }
    // right side over the cap is rejected up front, pointing at asofJoin
    val tooBig = intercept[IllegalArgumentException] {
      Joins.asofJoinBroadcast(left, right, "key", "t", "rid", maxRightRows = 2)
    }
    assert(tooBig.getMessage.contains("maxRightRows"))
    // duplicate right ids are rejected (the tie rule needs unique ids)
    val dup = intercept[IllegalArgumentException] {
      Joins.asofJoinBroadcast(left,
        right.withColumn("rid", lit(7L)), "key", "t", "rid")
    }
    assert(dup.getMessage.contains("unique"))
    // a rid duplicated ONLY by an invalid (NULL-time) row must neither
    // trip the uniqueness check nor fan out matched lefts via the
    // value-payload join — the payload reads the same filtered right
    val dupInvalid = right.unionByName(
      Seq(("k1", None: Option[Long], 10L, "ghost")).toDF("key", "t", "rid", "rv"))
    val fanned = Joins.asofJoinBroadcast(left, dupInvalid, "key", "t", "rid", Seq("rv"))
      .orderBy("event_id").collect()
    assert(fanned.length == left.count(),
      s"payload join fanned out rows: ${fanned.length}")
    assert(!fanned.exists(r => !r.isNullAt(5) && r.getString(5) == "ghost"))
    // non-integral time/id columns fail loudly instead of truncating
    val badTime = intercept[IllegalArgumentException] {
      Joins.asofJoinBroadcast(left.withColumn("t", col("t").cast("double")),
        right.withColumn("t", col("t").cast("double")), "key", "t", "rid")
    }
    assert(badTime.getMessage.contains("integral"))
    val badId = intercept[IllegalArgumentException] {
      Joins.asofJoinBroadcast(left, right.withColumn("rid", col("rid").cast("decimal(10,0)")),
        "key", "t", "rid")
    }
    assert(badId.getMessage.contains("integral"))
  }

  test("asof front door: auto routing lands each regime on the pinned variant") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "k1", Some(100L)), (2L, "k1", Some(205L)), (3L, "k2", Some(50L)),
      (4L, "k2", None: Option[Long])).toDF("event_id", "key", "t")
    val right = Seq(
      ("k1", Some(100L), 10L, "a"), ("k1", Some(200L), 11L, "b"),
      ("k2", Some(40L), 12L, "c")).toDF("key", "t", "rid", "rv")
    def route(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
        direction: String = "backward", maxB: Int = 1000000,
        frac: Double = 1.0): String =
      Joins.chooseAsofRoute(l, r, "key", "t", "rid", direction, maxB,
        skewThreshold = 0.25, skewProbeFraction = frac)
    // small integral right with unique rid → broadcast
    assert(route(left, right) == "broadcast")
    // broadcast is backward-only → falls through (tiny sample → carry)
    assert(route(left, right, direction = "forward") == "carry")
    // right over the cap → falls through
    assert(route(left, right, maxB = 2) == "carry")
    // duplicate right ids would make asofJoinBroadcast throw → falls through
    assert(route(left, right.withColumn("rid", lit(7L))) == "carry")
    // non-integral time → statically ineligible
    assert(route(left.withColumn("t", col("t").cast("double")),
      right.withColumn("t", col("t").cast("double"))) == "carry")
    // skew: one key holds 90% of 2000 rows; right side forced past the
    // broadcast gate with a duplicate rid so the skew probe decides
    val skewLeft = (0L until 2000L)
      .map(i => (i, if (i < 1800) "hot" else s"k${i % 50}", Some(i)))
      .toDF("event_id", "key", "t")
    val dupRight = Seq(("hot", Some(1L), 1L, "x"), ("hot", Some(2L), 1L, "y"))
      .toDF("key", "t", "rid", "rv")
    assert(route(skewLeft, dupRight) == "salted")
    // same shape below the probe's minimum sample → the safe carry default
    val smallSkew = (0L until 100L).map(i => (i, "hot", Some(i)))
      .toDF("event_id", "key", "t")
    assert(route(smallSkew, dupRight) == "carry")
    // the front door's answer matches the direct variant on every route
    val want = Joins.asofJoin(left, right, "key", "t", "rid", Seq("rv"))
      .orderBy("event_id").collect().map(_.toSeq).toSeq
    for (strategy <- Seq("auto", "broadcast", "salted", "carry")) {
      val got = Joins.asof(left, right, "key", "t", "rid", Seq("rv"),
          strategy = strategy)
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      assert(got == want, s"strategy=$strategy:\n$got\nvs\n$want")
    }
    val bad = intercept[IllegalArgumentException] {
      Joins.asof(left, right, "key", "t", "rid", strategy = "sorted")
    }
    assert(bad.getMessage.contains("strategy"))
  }

  test("duplicateClusters: reliable checkpoint mode equals localCheckpoint mode") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val ids = (1L to 40L).toDF("doc_id")
    // chain 1..20 plus pair 30-31: exercises multiple iterations
    val chain = (1L until 20L).map(i => (i, i + 1)) :+ (30L, 31L)
    val pairs = chain.toDF("id_a", "id_b")
    val local = Dedup.duplicateClusters(ids, pairs, maxIter = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val reliable = Dedup.duplicateClusters(ids, pairs, maxIter = 8,
      checkpointDir = dir)
    val got = reliable.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == local, s"$got\nvs\n$local")
    assert(got(20L) == 1L && got(31L) == 30L && got(25L) == 25L)
    // the whole cc_<uuid> run dir is deleted before returning — the
    // final labels were materialized off it, so no orphans accumulate
    val run = new java.io.File(dir).listFiles().filter(_.getName.startsWith("cc_"))
    assert(run.isEmpty, run.mkString(", "))
  }

  test("knnJoinBatched equals knnJoin at 20k queries, across batch boundaries") {
    val s = spark
    import s.implicits._
    val dim = 4
    def vec(seed: Long): Array[Float] =
      Array.tabulate(dim)(j => (((seed * 2654435761L + j * 40503L) % 1000L).toFloat - 500f) / 100f)
    val corpus = (0L until 500L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val queries = (0L until 20000L).map(i => (i, vec(i + 777L))).toDF("qid0", "qv")
    val exact = Similarity.knnJoin(corpus, "vec_id", "embedding",
        queries, "qid0", "qv", k = 5, maxQueries = 20000)
      .collect().map(_.toSeq).toSet
    // batchSize far below the query count: 14 batches, no driver-resident
    // full query set, results identical including rank tie-breaks
    val batched = Similarity.knnJoinBatched(corpus, "vec_id", "embedding",
      queries, "qid0", "qv", k = 5, batchSize = 1536)
    assert(batched.collect().map(_.toSeq).toSet == exact)
    // corpus side never joins: candidates-only exchange into the final
    // per-qid window, zero Join operators anywhere in the plan
    val plan = batched.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // batch composition is partitioning-dependent; results must not be
    val reparted = Similarity.knnJoinBatched(corpus, "vec_id", "embedding",
      queries.repartition(7), "qid0", "qv", k = 5, batchSize = 1536)
    assert(reparted.collect().map(_.toSeq).toSet == exact)
    // empty query side → empty frame with the contract schema
    val none = Similarity.knnJoinBatched(corpus, "vec_id", "embedding",
      queries.where(lit(false)), "qid0", "qv", k = 5)
    assert(none.columns.toSeq == Seq("qid", "vec_id", "cos"))
    assert(none.count() == 0L)
  }

  test("knnJoinByCell equals knnJoinIvf: distributed cogroup, no driver, no Join") {
    val s = spark
    import s.implicits._
    val dim = 8
    def vec(seed: Long): Array[Float] =
      Array.tabulate(dim)(j => (((seed * 2654435761L + j * 40503L) % 1000L).toFloat - 500f) / 100f)
    val corpus = (0L until 600L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val queries = (0L until 2000L).map(i => (i, vec(i + 333L))).toDF("qid0", "qv")
    val cents = Similarity.trainCentroids(corpus, "vec_id", "embedding", 8, 256, 4)
    val ivf = Similarity.knnJoinIvf(corpus, "vec_id", "embedding",
        queries, "qid0", "qv", k = 5, nCells = 8, nProbe = 3,
        maxQueries = 4096, trainedCentroids = cents)
      .collect().map(_.toSeq).toSet
    val byCell = Similarity.knnJoinByCell(corpus, "vec_id", "embedding",
      queries, "qid0", "qv", k = 5, nCells = 8, nProbe = 3,
      trainedCentroids = cents)
    assert(byCell.collect().map(_.toSeq).toSet == ivf)
    // plan: a CoGroup over the two cell-keyed shuffles, zero Join
    // operators, no pair explosion anywhere
    val plan = byCell.queryExecution.executedPlan.toString
    assert(plan.contains("CoGroup"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // partitioning of either input must not change the answer
    val reparted = Similarity.knnJoinByCell(corpus.repartition(7), "vec_id",
      "embedding", queries.repartition(5), "qid0", "qv", k = 5, nCells = 8,
      nProbe = 3, trainedCentroids = cents)
    assert(reparted.collect().map(_.toSeq).toSet == ivf)
    // zero-norm queries and corpus rows are excluded, not NaN-ranked
    val zq = queries.unionByName(Seq((9999L, Array.fill(dim)(0f))).toDF("qid0", "qv"))
    val zc = corpus.unionByName(Seq((9998L, Array.fill(dim)(0f))).toDF("vec_id", "embedding"))
    val withZeros = Similarity.knnJoinByCell(zc, "vec_id", "embedding",
      zq, "qid0", "qv", k = 5, nCells = 8, nProbe = 3, trainedCentroids = cents)
      .collect()
    assert(!withZeros.exists(r => r.getLong(0) == 9999L || r.getLong(1) == 9998L))
    assert(withZeros.map(_.toSeq).toSet == ivf)
    // a NULL cell in a precomputed layout drops that row, never crashes
    // the non-nullable tuple decode
    val centsIdx = cents.zipWithIndex.map(_.swap)
    val layout = corpus
      .withColumn("cell", Similarity.cellAssignment(col("embedding"), centsIdx))
      .withColumn("cell", when(col("vec_id") === 599L, lit(null)).otherwise(col("cell")))
    val viaCol = Similarity.knnJoinByCell(layout, "vec_id", "embedding",
      queries, "qid0", "qv", k = 5, nCells = 8, nProbe = 3,
      trainedCentroids = cents, cellCol = "cell")
    val without599 = Similarity.knnJoinByCell(
      corpus.where(col("vec_id") =!= 599L), "vec_id", "embedding",
      queries, "qid0", "qv", k = 5, nCells = 8, nProbe = 3,
      trainedCentroids = cents)
    assert(viaCol.collect().map(_.toSeq).toSet ==
      without599.collect().map(_.toSeq).toSet)
  }

  test("asofJoinSalted agrees with asofJoinDirected: directions x tolerances x bin counts") {
    val s = spark
    import s.implicits._
    val left = Seq(
      (1L, "k1", Some(100L)), (2L, "k1", Some(205L)), (3L, "k1", Some(50L)),
      (4L, "k2", Some(100L)), (5L, "k3", Some(10L)), (6L, "k1", Some(150L)),
      (7L, "k1", None: Option[Long]) // NULL left time → no match
    ).toDF("event_id", "key", "t")
    val right = Seq(
      ("k1", Some(100L), 10L, "a"),
      ("k1", Some(200L), 11L, "b"),
      ("k1", Some(200L), 12L, "c"), // equal-ts tie → greatest rid
      ("k2", Some(150L), 13L, "d"),
      ("k1", None: Option[Long], 99L, "z") // NULL right time never matches
    ).toDF("key", "t", "rid", "rv")
    for (dir <- Seq("backward", "forward", "nearest");
         tol <- Seq(-1L, 0L, 5L, 49L, 1000L);
         bins <- Seq(1, 2, 3, 64)) {
      val want = Joins.asofJoinDirected(left, right, "key", "t", "rid", Seq("rv"), tol, dir)
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      val got = Joins.asofJoinSalted(left, right, "key", "t", "rid", Seq("rv"), tol, dir, bins)
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      assert(got == want, s"direction=$dir tolerance=$tol numBins=$bins:\n$got\nvs\n$want")
    }
    // randomized sweep: hot-key distribution (70% of rows on one key) with
    // duplicated timestamps, so bin boundaries land INSIDE runs of equal
    // times and between left/right rows of the same instant
    val rnd = new scala.util.Random(7)
    val rl = (0 until 400).map { i =>
      (i.toLong, if (rnd.nextInt(10) < 7) "hot" else s"k${rnd.nextInt(5)}",
        Some(rnd.nextInt(50).toLong * 10))
    }.toDF("event_id", "key", "t")
    val rr = (0 until 300).map { i =>
      (if (rnd.nextInt(10) < 7) "hot" else s"k${rnd.nextInt(5)}",
        Some(rnd.nextInt(50).toLong * 10), i.toLong + 1000L, s"v$i")
    }.toDF("key", "t", "rid", "rv")
    for (dir <- Seq("backward", "forward", "nearest"); bins <- Seq(1, 5, 64)) {
      val want = Joins.asofJoinDirected(rl, rr, "key", "t", "rid", Seq("rv"), 70L, dir)
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      val got = Joins.asofJoinSalted(rl, rr, "key", "t", "rid", Seq("rv"), 70L, dir, bins)
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      assert(got == want, s"sweep direction=$dir numBins=$bins diverged")
    }
  }

  test("asofJoinSalted: NULL keys carry across bins like asofJoinDirected") {
    val s = spark
    import s.implicits._
    // the window partitioning groups NULL keys, so the boundary fix-up
    // join must too (struct-wrapped key: NULLs inside complex types are
    // equal in equi-joins) — a bare-key join would drop the carry
    val left = Seq(
      (1L, Option.empty[String], Some(1000L)),
      (2L, Some("k1"), Some(1000L))
    ).toDF("event_id", "key", "t")
    val right = Seq(
      (Option.empty[String], Some(10L), 50L, "n"),
      (Some("k1"), Some(10L), 60L, "k")
    ).toDF("key", "t", "rid", "rv")
    for (dir <- Seq("backward", "forward", "nearest"); bins <- Seq(4, 64)) {
      val want = Joins.asofJoinDirected(left, right, "key", "t", "rid", Seq("rv"), -1L, dir)
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      val got = Joins.asofJoinSalted(left, right, "key", "t", "rid", Seq("rv"), -1L, dir, bins)
        .orderBy("event_id").collect().map(_.toSeq).toSeq
      assert(got == want, s"direction=$dir numBins=$bins:\n$got\nvs\n$want")
    }
    // and the NULL-key match is REAL, not a vacuous both-sides-missing
    // agreement: right@10 and left@1000 land in different bins at 64
    // bins, so this exercises the cross-bin incoming carry
    val got = Joins.asofJoinSalted(left, right, "key", "t", "rid", Seq("rv"),
        -1L, "backward", 64)
      .where(col("event_id") === 1L).collect()(0)
    assert(got.getLong(got.fieldIndex("rid")) == 50L, got.toString)
  }

  test("rangeJoin: inclusive boundaries, bin edges, keys, degenerate intervals") {
    val s = spark
    import s.implicits._
    val points = Seq(
      (1L, "a", 10.0),  // on lo boundary of [10,20] AND a bin edge
      (2L, "a", 20.0),  // on hi boundary
      (3L, "a", 9.999), // just outside
      (4L, "a", 15.0),  // interior; also inside the overlapping [12,30]
      (5L, "b", 15.0),  // same value, other key — must NOT match key 'a' ranges
      (6L, "a", -5.0),  // negative point inside [-10,-1] (floor-negative bins)
      (7L, "a", 35.0)   // matches nothing
    ).toDF("id", "k", "p")
    val ranges = Seq(
      ("a", 10.0, 20.0, "r1"),
      ("a", 12.0, 30.0, "r2"),
      ("a", -10.0, -1.0, "rneg"),
      ("b", 14.0, 16.0, "rb"),
      ("a", 50.0, 40.0, "rinv"), // inverted — never matches
      ("a", Double.NaN, 60.0, "rnan") // NaN lo: lo<=hi false → dropped
    ).toDF("k", "lo", "hi", "name")
    val got = Joins.rangeJoin(points, ranges, "p", "lo", "hi",
        binWidth = 10.0, keyCols = Seq("k"))
      .select(col("id"), col("name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(
      (1L, "r1"), (2L, "r1"), (2L, "r2"), (4L, "r1"), (4L, "r2"),
      (5L, "rb"), (6L, "rneg")), got)
    // unkeyed: the same value matches ranges regardless of key column
    val unkeyed = Joins.rangeJoin(
        points.select(col("id"), col("p")),
        ranges.select(col("lo"), col("hi"), col("name")),
        "p", "lo", "hi", binWidth = 10.0)
      .select(col("id"), col("name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(unkeyed.contains((5L, "r1")) && unkeyed.contains((4L, "rb")), unkeyed)
  }

  test("intervalJoin: one row per overlapping pair even across many shared bins") {
    val s = spark
    import s.implicits._
    val left = Seq(
      ("L1", 5.0, 35.0),   // spans bins 0-3
      ("L2", 100.0, 105.0),
      ("L3", 0.0, 2.0)
    ).toDF("lname", "lo", "hi")
    val right = Seq(
      ("R1", 15.0, 28.0), // overlaps L1 with TWO shared bins → exactly one row
      ("R2", 34.0, 50.0), // overlaps L1 only at [34,35]
      ("R3", 36.0, 40.0), // shares bin 3 with L1 but does NOT overlap
      ("R4", 2.0, 3.0),   // overlaps L3 at [2,2]; not L1
      ("R5", 35.0, 40.0)  // touches L1 exactly at 35 (inclusive)
    ).toDF("rname", "lo2", "hi2")
    val got = Joins.intervalJoin(left, right, "lo", "hi", "lo2", "hi2", binWidth = 10.0)
      .select(col("lname"), col("rname")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(got.length == got.distinct.length, s"duplicate pairs: ${got.toSeq}")
    assert(got.toSet == Set(
      ("L1", "R1"), ("L1", "R2"), ("L1", "R5"), ("L3", "R4")), got.toSeq)
    // equivalence sweep vs the naive overlap theta-join on denser data
    val la = (0 until 60).map(i => (i.toLong, (i * 7 % 90).toDouble, (i * 7 % 90 + i % 13).toDouble))
      .toDF("lid", "lo", "hi")
    val ra = (0 until 60).map(i => (i.toLong, (i * 11 % 95).toDouble, (i * 11 % 95 + i % 9).toDouble))
      .toDF("rid", "lo2", "hi2")
    val binned = Joins.intervalJoin(la, ra, "lo", "hi", "lo2", "hi2", binWidth = 8.0)
      .select(col("lid"), col("rid")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = la.join(ra, col("lo") <= col("hi2") && col("lo2") <= col("hi"))
      .select(col("lid"), col("rid")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.length == binned.distinct.length)
    assert(binned.toSet == naive.toSet,
      s"missing=${(naive.toSet -- binned.toSet).take(5)} extra=${(binned.toSet -- naive.toSet).take(5)}")
  }

  test("sessionize: gap breaks, equal-to-gap continues, per-key indices, tie order") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, "u1", 100L),  // session 0
      (2L, "u1", 150L),  // gap 50 <= 50 → continues session 0
      (3L, "u1", 201L),  // gap 51 > 50 → session 1
      (4L, "u1", 201L),  // equal ts, higher id → same instant, session 1
      (5L, "u2", 100L),  // separate key → its own session 0
      (6L, "u2", 1000L)  // gap 900 → session 1
    ).toDF("event_id", "key", "t")
    val got = Joins.sessionize(ev, "key", "t", "event_id", gap = 50L)
      .orderBy("event_id").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L),
      (5L, 0L), (6L, 1L)), got)
  }

  test("sessionize agrees with Spark's native session_window (inclusive gap)") {
    val s = spark
    import s.implicits._
    // planted boundaries: diff == gap (merges, BOTH rules are inclusive)
    // and diff == gap+1 (breaks); plus a pseudo-random tail
    val planted = Seq((1L, "u1", 100L), (2L, "u1", 150L), (3L, "u1", 201L))
    val rnd = (10 to 200).map(i =>
      (i.toLong, s"u${i % 5}", ((i * 2654435761L) % 5000L)))
    val ev = (planted ++ rnd).toDF("event_id", "key", "t")
    val ours = Joins.sessionize(ev, "key", "t", "event_id", gap = 50L)
      .groupBy(col("key"), col("session_idx"))
      .agg(count(lit(1)).as("n"), min(col("t")).as("t0"), max(col("t")).as("t1"))
      .select(col("key"), col("t0"), col("t1"), col("n"))
      .orderBy(col("key"), col("t0")).collect().toSeq
    val native = ev
      .groupBy(col("key"), session_window(timestamp_seconds(col("t")), "50 seconds"))
      .agg(count(lit(1)).as("n"), min(col("t")).as("t0"), max(col("t")).as("t1"))
      .select(col("key"), col("t0"), col("t1"), col("n"))
      .orderBy(col("key"), col("t0")).collect().toSeq
    assert(ours == native, s"ours=$ours native=$native")
  }

  test("chunkDocs: full coverage with overlap, short tail, short-doc identity") {
    val s = spark
    import s.implicits._
    val ten = (1 to 10).map(i => s"t$i").mkString(" ")
    val eleven = (1 to 11).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, Some(ten)), (2L, Some(eleven)), (3L, Some("a b")),
      (4L, Some("")), (5L, None: Option[String])).toDF("doc_id", "text")
    val got = TextOps.chunkDocs(df, "doc_id", "text", chunkSize = 4, overlap = 1)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      // stride 3: [1-4], [4-7], [7-10] — covers all 10, boundaries shared
      (1L, 0L, "t1 t2 t3 t4", 4L),
      (1L, 1L, "t4 t5 t6 t7", 4L),
      (1L, 2L, "t7 t8 t9 t10", 4L),
      // 11 tokens → 4th short tail chunk of 2
      (2L, 0L, "t1 t2 t3 t4", 4L),
      (2L, 1L, "t4 t5 t6 t7", 4L),
      (2L, 2L, "t7 t8 t9 t10", 4L),
      (2L, 3L, "t10 t11", 2L),
      // shorter than one chunk → the doc itself
      (3L, 0L, "a b", 2L),
      (4L, 0L, "", 1L)), got.mkString("\n")) // split("") = [""] — one empty token
    // NULL text → zero chunks (doc_id 5 absent), matching the oracle's
    // range(NULL) behavior — never a phantom full-size chunk
    // invalid configs rejected
    intercept[IllegalArgumentException](TextOps.chunkDocs(df, "doc_id", "text", 4, 4))
    intercept[IllegalArgumentException](TextOps.chunkDocs(df, "doc_id", "text", 0))
  }

  test("bloom filter: build+membership end-to-end, no false negatives, SQL path") {
    val s = spark
    import s.implicits._
    val items = (0 until 200).map(i => s"item$i")
    val bytes = Bloom.buildFilter(
      items.toDF("g"), col("g"), numBits = 1L << 16, numHashes = 7)
    val probes = (items ++ (0 until 1000).map(i => s"absent$i")).toDF("g")
    val got = probes
      .select(col("g"), Bloom.bloomMightContain(col("g"), lit(bytes)).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(items.forall(got(_)), "false negatives must never occur")
    // m=65536, n=200, k=7 → theoretical fp rate ~1e-15; allow a hair
    val fps = (0 until 1000).count(i => got(s"absent$i"))
    assert(fps <= 2, s"$fps false positives out of 1000 disjoint probes")
    // SQL-registered names work end-to-end (scalar subquery carries the
    // built filter into the membership call)
    JsonFunctions.registerAll(s)
    items.toDF("g").createOrReplaceTempView("bloom_items")
    probes.createOrReplaceTempView("bloom_probes")
    val viaSql = s.sql(
      """SELECT g, bloom_might_contain(
        |  g, (SELECT bloom_build(g, 65536, 7) FROM bloom_items)) AS hit
        |FROM bloom_probes""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(viaSql == got, "SQL path must agree with the Column path")
  }

  test("bloom_count_contained equals the declarative shingles fold it replaced") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val filter = Bloom.buildFilter(
      d.where(col("doc_id") % 20 === 0)
        .select(explode(Dedup.shingles(col("text"), 4)).as("g")),
      col("g"), numBits = 1L << 20, numHashes = 7)
    val both = d.select(
        Bloom.bloomCountContained(split(col("text"), " "), lit(filter), 4).as("fused"),
        aggregate(Dedup.shingles(col("text"), 4), lit(0L),
          (acc, g) => acc +
            when(Bloom.bloomMightContain(g, lit(filter)), 1L).otherwise(0L)).as("folded"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }

  test("bloom decontaminate flags a superset of exact decontamination") {
    val s = spark
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val d = s.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = d.where(col("doc_id") % 20 =!= 0)
    val bench = d.where(col("doc_id") % 20 === 0)
    val exact = Curation.decontaminate(train, bench, "doc_id", "text", n = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val screened = Bloom.decontaminate(train, bench, "doc_id", "text", n = 4,
        numBits = 1L << 20, numHashes = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(screened.keySet == exact.keySet, "one row per training doc on both paths")
    // a Bloom filter can overcount (false positives) but NEVER undercount
    assert(exact.forall { case (id, n) => screened(id) >= n },
      "bloom must flag at least every exactly-hit gram")
    // at 2^20 bits over ~25k benchmark grams the fp inflation is tiny:
    // the screen is usable, not just sound
    assert(screened.values.sum <= exact.values.sum + 5,
      s"fp inflation too high: exact=${exact.values.sum} bloom=${screened.values.sum}")
  }

  test("simhash banded pairs find close documents, not distant ones") {
    val s = spark
    import s.implicits._
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (1 to 58).map(i => s"w$i").mkString(" ") + " x y" // tiny edit
    val far = (200 to 260).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDupPairs(df, "doc_id", "text", maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), pairs.toSeq)
    assert(!pairs.exists(t => t._1 == 3L || t._2 == 3L), pairs.toSeq)
  }

  test("HLL sketch: accurate at 20k ids, mergeable by register max, exact linear-counting arm") {
    val s = spark
    import s.implicits._
    val df = s.range(20000).select(col("id"), (col("id") % 37).as("small"))
    val est = Curation.approxDistinct(df, Seq("id", "small"), p = 10)
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // raw-estimator arm: 20k >> 2.5m, expect ~3% stderr at m=1024
    val (_, exactId, estId) = est("id")
    assert(exactId == 20000L)
    assert(math.abs(estId - 20000.0) / 20000.0 < 0.1, estId)
    // linear-counting arm: 37 distinct values, most buckets empty
    val (vz, exactSmall, estSmall) = est("small")
    assert(exactSmall == 37L && vz > 900L)
    assert(math.abs(estSmall - 37.0) < 3.0, estSmall)

    // MERGE = per-bucket max: sketch(A union B) == merge(sketch A, sketch B)
    val a = s.range(0, 12000).select(col("id"))
    val b = s.range(8000, 20000).select(col("id")) // overlaps A
    val whole = Curation.hllRegisters(a.union(b), Seq("id"), p = 10)
    val merged = Curation.hllRegisters(a, Seq("id"), p = 10)
      .union(Curation.hllRegisters(b, Seq("id"), p = 10))
      .groupBy("col_name", "bucket").agg(max("rho").as("rho"))
    val eWhole = Curation.hllEstimate(whole, p = 10).collect().head.getDouble(3)
    val eMerged = Curation.hllEstimate(merged, p = 10).collect().head.getDouble(3)
    assert(eWhole == eMerged) // bit-identical, not just close
  }

  test("bootstrap CI: snowflake-scale ids and NULL rows don't break the draws") {
    val s = spark
    import s.implicits._
    // ids near Long.MaxValue: the draw hash must wrap, not ANSI-overflow
    val big = (0 until 500).map(i =>
      (Long.MaxValue - i * 1001L, Some((i % 100).toLong))) :+ (7L, None)
    val r = Curation.bootstrapMeanCI(big.toDF("id", "x"), "id", "x")
      .collect().head
    assert(r.getLong(0) == 64L)
    // the NULL metric row is excluded — CI still brackets the non-null mean
    assert(r.getDouble(2) < 49.5 && 49.5 < r.getDouble(3), r)
  }

  test("bootstrap CI: identical under repartition, brackets the true mean") {
    val s = spark
    import s.implicits._
    val df = s.range(5000).select(col("id"), (col("id") % 100).as("x"))
    val a = Curation.bootstrapMeanCI(df, "id", "x").collect().head
    val b = Curation.bootstrapMeanCI(df.repartition(17), "id", "x").collect().head
    assert(a == b) // draws hash the stable id — layout cannot move the CI
    val (lo, hi) = (a.getDouble(2), a.getDouble(3))
    assert(lo < 49.5 && 49.5 < hi && hi - lo < 5.0, s"[$lo, $hi]")
  }

  test("winsorize: clamps tails, passes NULL through instead of fabricating hi") {
    val s = spark
    import s.implicits._
    val df = ((1 to 99).map(i => (i.toLong, Some(i.toDouble))) :+ (100L, None))
      .toDF("id", "v")
    val got = Curation.winsorize(df, "v", pLo = 0.1, pHi = 0.9)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(got(100L).isEmpty) // NULL stays NULL — no fabricated p99 value
    assert(got(1L).exists(_ > 1.0) && got(99L).exists(_ < 99.0)) // tails clamp
    assert(got(50L).contains(50.0)) // interior untouched
  }

  test("corpusDiff: presence from join sides, NULL-text docs compare null-safely") {
    val s = spark
    import s.implicits._
    val old = Seq((1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("gone")))
      .toDF("doc_id", "text")
    val nw = Seq((1L, Some("a")), (2L, Some("B2")), (3L, Option.empty[String]),
      (5L, Some("new"))).toDF("doc_id", "text")
    val got = Curation.corpusDiff(old, nw, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", // present in both with NULL text — NOT "added"
      4L -> "removed", 5L -> "added"))
  }

  test("zValue round-trips: de-interleaving the Morton key recovers both coordinates") {
    val s = spark
    import s.implicits._
    val df = s.range(4096).select(
      (col("id").bitwiseAND(63L)).as("a"),
      (shiftright(col("id"), 6).bitwiseAND(63L)).as("b"))
    val got = df.select(col("a"), col("b"),
        graft.sources.Tables.zValue(Seq(col("a"), col("b")), bits = 6).as("z"))
      .collect()
    assert(got.length == 4096)
    got.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      // bit j of a sits at z bit 2j, bit j of b at 2j+1
      val da = (0 until 6).map(j => ((z >> (2 * j)) & 1L) << j).sum
      val db = (0 until 6).map(j => ((z >> (2 * j + 1)) & 1L) << j).sum
      assert(da == a && db == b, s"z=$z a=$a b=$b")
    }
    // distinct inputs → distinct keys (interleave is a bijection)
    assert(got.map(_.getLong(2)).distinct.length == 4096)
  }

  test("upsertLatest equals the window-rank formulation on random logs") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    val log = (1 to 2000).map { i =>
      (rnd.nextInt(40).toLong, s"t${rnd.nextInt(3)}",
        rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(1000).toDouble)
    }.toDF("k", "t", "ts", "id", "v")
    val agg = Curation.upsertLatest(log, Seq("k", "t"), Seq("ts", "id"), Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k", "t").orderBy(desc("ts"), desc("id"))
    val win = log.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(agg == win)
  }

  test("kAnonymize: NULL quasi values form a screened group, not silently dropped rows") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1L, Some("a")), (2L, Some("a")), (3L, Some("a")),
      (4L, Some("b")),                   // rare combination
      (5L, None), (6L, None)             // missing identifier — still a group
    ).toDF("id", "qi")
    val got = Curation.kAnonymize(df, Seq("qi"), k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.size == 6) // no row vanishes through the join-back
    assert(got(1L) == ((3L, true)) && got(4L) == ((1L, false)))
    assert(got(5L) == ((2L, true)) && got(6L) == ((2L, true)))
  }

  test("hardNegatives: same-label near neighbors excluded BEFORE the top-k, k always filled") {
    val s = spark
    import s.implicits._
    // query (label 0) at (1,0); nearest overall is same-label (0.99,0.1)
    // and must NOT appear; the k=2 negatives are the nearest label-1/2 rows
    val corpus = Seq(
      (10L, Array(0.99f, 0.10f), 0), // same label, closest — excluded
      (11L, Array(0.95f, 0.05f), 1), // best negative
      (12L, Array(0.80f, 0.60f), 2), // second negative
      (13L, Array(-1.0f, 0.0f), 1),  // far negative
      (14L, Array(1.0f, 0.01f), 0)   // same label again
    ).toDF("vec_id", "embedding", "label")
    val queries = Seq((1L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(corpus, "vec_id", "embedding", "label",
        queries, "vec_id", "embedding", "label", k = 2)
      .orderBy(desc("cos")).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(11L, 12L), got.mkString(","))
    // a filter-after-top-2 over all labels would have returned only 11
    // (10 and 11 are the global top-2) — the pre-heap filter fills k
  }

  test("upsertLatest: latest version wins with id tiebreak; superseded rows collapse map-side") {
    val s = spark
    import s.implicits._
    val log = Seq(
      (1L, "a", 10L, 100L, 1.0), // superseded by ts 20
      (1L, "a", 20L, 101L, 2.0),
      (1L, "a", 20L, 99L, 9.0),  // same ts, lower id → loses
      (2L, "b", 5L, 200L, 3.0)
    ).toDF("k", "t", "ts", "id", "v")
    val got = Curation.upsertLatest(log, Seq("k", "t"), Seq("ts", "id"), Seq("v"))
    // read the plan BEFORE executing: post-collect AQE prints Final+Initial
    // sections and every operator would count twice
    val plan = got.queryExecution.executedPlan.toString
    val rows = got.collect().map(r =>
      (r.getLong(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(rows((1L, "a")) == ((20L, 101L, 2.0)))
    assert(rows((2L, "b")) == ((5L, 200L, 3.0)))
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    // partial max BEFORE the exchange: superseded versions never shuffle
    // (a window formulation would ship and sort the whole log first)
    assert(plan.contains("partial_max"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("Count-Min sketch: never underestimates, exact for heavy hitters, merges by sum") {
    val s = spark
    import s.implicits._
    // Zipf-ish: value v appears 1000/v times
    val rows = (1 to 50).flatMap(v => Seq.fill(1000 / v)(s"tok$v"))
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val exact = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = Curation.cmSketch(df, "v", depth = 4, width = 64)
    val est = Curation.cmEstimate(sk, df, "v", depth = 4, width = 64)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = rows.size
    exact.foreach { case (v, c) =>
      assert(est(v) >= c, s"$v underestimated: ${est(v)} < $c")
      assert(est(v) <= c + n / 8, s"$v overestimate too large") // loose eps bound
    }
    // the heaviest value dominates any collision partner in all 4 rows
    assert(est("tok1") < 1000L + 300L)

    // MERGE = cell-wise sum: sketch(A ++ B) == sum-merge(sketch A, sketch B)
    val (a, b) = (df.where(col("id") % 2 === 0), df.where(col("id") % 2 =!= 0))
    val merged = Curation.cmSketch(a, "v", 4, 64)
      .union(Curation.cmSketch(b, "v", 4, 64))
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
    val whole = Curation.cmSketch(df, "v", 4, 64)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    merged.collect().foreach { r =>
      assert(whole((r.getInt(0), r.getLong(1))) == r.getLong(2))
    }
  }

  test("CDC chunks: tile the doc, respect min/max, and survive a prefix shift") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val base = (1 to 400).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shifted = "PREFIX-INSERTED-AHEAD " + base
    val df = Seq((1L, base), (2L, shifted), (3L, "")).toDF("doc_id", "text")
    val rows = Dedup.cdcChunks(df, "doc_id", "text", maskBits = 4, minLen = 8, maxLen = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    val byDoc = rows.groupBy(_._1)
    assert(!byDoc.contains(3L)) // empty text → no chunks
    Seq(1L, 2L).foreach { id =>
      val cs = byDoc(id).sortBy(_._2)
      // chunks tile the document exactly
      assert(cs.head._3 == 0)
      cs.sliding(2).foreach { case Array(a, b) => assert(a._3 + a._4 == b._3); case _ => }
      val text = if (id == 1L) base else shifted
      assert(cs.last._3 + cs.last._4 == text.length)
      // every chunk but the last within [minLen, maxLen]
      cs.init.foreach(c => assert(c._4 >= 8 && c._4 <= 32, c))
      assert(cs.last._4 <= 32)
    }
    // THE content-defined property: after an arbitrary-length prefix
    // insertion, boundaries resynchronize and the shared content yields
    // mostly identical chunk digests (fixed windows would share ~none)
    val d1 = byDoc(1L).map(_._5).toSet
    val d2 = byDoc(2L).map(_._5).toSet
    val overlap = d1.intersect(d2).size.toDouble / d1.size
    assert(overlap >= 0.7, s"resync overlap $overlap")

    // sharing counts: the duplicated chunks are visible cross-document
    val shared = Dedup.cdcSharedChunks(df, "doc_id", "text",
        maskBits = 4, minLen = 8, maxLen = 32)
      .where(col("n_docs") >= 2).select("digest").distinct().count()
    assert(shared >= (d1.intersect(d2).size - 1).toLong, s"shared=$shared")
  }

  // deterministic test image: every channel bounded to [0, 199] so a +8
  // uniform brightness shift never clamps
  private def testArgb(seed: Long, w: Int, h: Int): Array[Int] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      val r = ((seed * 31 + x * 7 + y * 13) % 200).toInt
      val g = ((seed * 17 + x * 11 + y * 3) % 200).toInt
      val b = ((seed * 13 + x * 5 + y * 29) % 200).toInt
      (r << 16) | (g << 8) | b
    }

  test("perceptual hashes: brightness-shift invariant, kernels match a naive model") {
    for (seed <- 1L to 8L) {
      val (w, h) = (16 + (seed % 7).toInt, 16 + (seed % 5).toInt)
      val base = testArgb(seed, w, h)
      val bright = base.map { p =>
        ((((p >> 16) & 0xff) + 8) << 16) | ((((p >> 8) & 0xff) + 8) << 8) | ((p & 0xff) + 8)
      }
      // uniform shift moves every cell and the floor mean by exactly +8
      assert(Multimodal.dHash64(base, w, h) == Multimodal.dHash64(bright, w, h))
      assert(Multimodal.aHash64(base, w, h) == Multimodal.aHash64(bright, w, h))

      // naive grid model: double-free, straight from the definition
      def lum(p: Int) =
        (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) + 29 * (p & 0xff)) >> 8
      def grid(gw: Int, gh: Int): Array[Long] = {
        val cells = Array.fill(gw * gh)(Vector.empty[Long])
        for (y <- 0 until h; x <- 0 until w)
          cells(y * gh / h * gw + x * gw / w) :+= lum(base(y * w + x)).toLong
        cells.map(c => c.sum / c.length)
      }
      val g9 = grid(9, 8)
      var dExp = 0L
      for (cy <- 0 until 8; cx <- 0 until 8)
        if (g9(cy * 9 + cx + 1) > g9(cy * 9 + cx)) dExp |= 1L << (cy * 8 + cx)
      assert(Multimodal.dHash64(base, w, h) == dExp)
      val g8 = grid(8, 8)
      val mean = g8.sum / 64
      var aExp = 0L
      for (i <- 0 until 64) if (g8(i) > mean) aExp |= 1L << i
      assert(Multimodal.aHash64(base, w, h) == aExp)
    }
  }

  test("audio silence trim: matches the frame-loudness model, all-quiet path") {
    val s = spark
    import s.implicits._
    val ids = (0L until 9L).toDF("doc_id")
    val blobs = Multimodal.syntheticAudioBlobs(s, ids)
    def sample(id: Long, f: Int, c: Int): Long =
      java.lang.Math.floorMod(id * 7919 + f * 31 + c * 17, 2048L) - 1024L
    val got = Multimodal.audioTrimSilence(s, blobs, threshold = 1000)
      .collect().map(t => ((t.doc_id, t.channel), t)).toMap
    for (id <- 0L until 9L) {
      val ch = (1 + id % 2).toInt
      val nf = 256 + (id * 3 % 200).toInt
      def loud(f: Int) = (0 until ch).exists(c => math.abs(sample(id, f, c)) >= 1000)
      val loudF = (0 until nf).filter(loud)
      for (c <- 0 until ch) {
        val t = got((id, c))
        if (loudF.isEmpty) assert((t.trim_start, t.n_out) == ((-1L, 0L)))
        else {
          val (st, en) = (loudF.head, loudF.last)
          val vs = (st to en).map(f => sample(id, f, c))
          assert(t.trim_start == st.toLong && t.n_out == (en - st + 1).toLong)
          assert(t.wsum == vs.zipWithIndex.map { case (v, j) => (j + 1) * v }.sum)
          assert(t.smin == vs.min && t.smax == vs.max)
          assert(t.n_in == nf.toLong)
        }
      }
    }
    // max |sample| is 1024, so threshold 2000 makes every clip all-quiet
    val quiet = Multimodal.audioTrimSilence(s, blobs, threshold = 2000).collect()
    assert(quiet.nonEmpty &&
      quiet.forall(t => t.trim_start == -1L && t.n_out == 0L && t.wsum == 0L))
  }

  test("recall@k harness: set semantics, basis points, live IVF measurement") {
    val s = spark
    import s.implicits._
    def ids(xs: Long*) = xs.toDF("vec_id")
    def run(a: Seq[Long], b: Seq[Long], k: Int) =
      Similarity.recallAtK(ids(a: _*), ids(b: _*), "vec_id", k)
        .head() match { case r => (r.getLong(0), r.getLong(1), r.getLong(2)) }
    assert(run(Seq(1, 2, 3), Seq(1, 2, 3), 3) == ((3L, 3L, 10000L)))
    assert(run(Seq(1, 2, 3), Seq(4, 5, 6), 3) == ((3L, 0L, 0L)))
    assert(run(Seq(1, 2, 3, 4), Seq(3, 4, 5, 6), 4) == ((4L, 2L, 5000L)))
    // live: trained IVF on the real embeddings recovers most of the
    // exact top-20 (the q_ann_recall surface measured 85% at sf0.01)
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val cents = Similarity.trainCentroids(emb, "vec_id", "embedding", k = 16)
    val (_, hit, bp) = Similarity.recallAtK(
        Similarity.ivfTopK(emb, "vec_id", "embedding", q, 20,
          nCells = 16, nProbe = 4, trainedCentroids = cents),
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20),
        "vec_id", 20)
      .head() match { case r => (r.getLong(0), r.getLong(1), r.getLong(2)) }
    assert(bp == (10000L * hit) / 20L)
    assert(hit >= 10L, s"IVF recall collapsed: $hit/20")
  }

  test("persisted HNSW index: loaded graphs answer EXACTLY like in-memory builds") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val dir = java.nio.file.Files.createTempDirectory("graft-hnswidx-spec")
    try {
      // CONSTRAINED budgets on purpose: with m=4/efC=8/ef=12 the walk's
      // answer is a function of the GRAPH, not just of the data (full
      // coverage would mask a wrong adjacency) — byte-identical results
      // prove the stored graph loads verbatim
      Similarity.buildHnswIndex(emb, "vec_id", "embedding", dir.toString,
        m = 4, efConstruction = 8, nParts = 4)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val viaIndex = rows(Similarity.hnswTopKIndexed(s, dir.toString, q, 10,
        efSearch = 12, idOut = "vec_id"))
      val inMemory = rows(Similarity.hnswTopK(emb, "vec_id", "embedding", q, 10,
        m = 4, efConstruction = 8, efSearch = 12, nParts = 4))
      assert(viaIndex == inMemory, s"$viaIndex\n$inMemory")
      assert(viaIndex.nonEmpty && viaIndex.head._1 == 7L && viaIndex.head._2 == 1.0)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
  }

  test("hnswKnnJoin: equals the exact kNN join, zero-norm conventions, loud query cap") {
    val s = spark
    import s.implicits._
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.where(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("qid"), desc("cos"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val exact = rows(Similarity.knnJoin(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10))
    val viaGraph = rows(Similarity.hnswKnnJoin(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 10))
    assert(viaGraph == exact, s"graph join diverged from exact scan join")
    // zero-norm query contributes no rows (the knnJoin convention)
    val zq = Seq((99L, Array.fill(64)(0f).toSeq)).toDF("vec_id", "embedding")
    assert(Similarity.hnswKnnJoin(emb, "vec_id", "embedding",
      zq, "vec_id", "embedding", k = 5).count() == 0)
    // the query-side driver bound fails loudly
    intercept[IllegalArgumentException] {
      Similarity.hnswKnnJoin(emb, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5, maxQueries = 10)
    }
  }

  test("persisted IVF index: pruned probes equal ivfTopK; appends are order-free and O(new)") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val base = java.nio.file.Files.createTempDirectory("graft-ivfidx-base")
    val full = java.nio.file.Files.createTempDirectory("graft-ivfidx-full")
    try {
      // frozen centroids trained on the base half, shared everywhere
      val cents = Similarity.trainCentroids(
        emb.where(col("vec_id") < 400), "vec_id", "embedding", 16)
      Similarity.buildIvfIndex(emb.where(col("vec_id") < 400),
        "vec_id", "embedding", base.toString, trainedCentroids = cents)
      Similarity.appendToIvfIndex(emb.where(col("vec_id") >= 400),
        "vec_id", "embedding", base.toString)
      Similarity.buildIvfIndex(emb, "vec_id", "embedding", full.toString,
        trainedCentroids = cents)
      // cell contents are SETS: append(base)+rest == build(all) exactly
      val a = s.read.parquet(base.toString).select("id", "vec", "cell")
      val b = s.read.parquet(full.toString).select("id", "vec", "cell")
      assert(a.count() == 500L)
      assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val viaAppend = Similarity.ivfTopKIndexed(s, base.toString, q, 10,
        nProbe = 4, idOut = "vec_id")
      val viaFull = Similarity.ivfTopKIndexed(s, full.toString, q, 10,
        nProbe = 4, idOut = "vec_id")
      // ...and both equal the in-session ivfTopK over the same centroids
      val inSession = Similarity.ivfTopK(emb, "vec_id", "embedding", q, 10,
        nCells = 16, nProbe = 4, trainedCentroids = cents)
      assert(rows(viaAppend) == rows(viaFull))
      assert(rows(viaAppend) == rows(inSession))
      assert(rows(viaAppend).nonEmpty && rows(viaAppend).head._1 == 7L)
      // the probe filter lands on the PARTITION column: the scan is a
      // partition-pruned disk read, not a post-scan filter
      val plan = viaFull.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        plan.take(2000))
    } finally {
      import scala.jdk.CollectionConverters._
      for (d <- Seq(base, full)) if (java.nio.file.Files.exists(d)) {
        val walk = java.nio.file.Files.walk(d)
        try walk.iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
  }

  test("kCenterCoreset: maximin hand geometry, zero-norm drop, early exhaustion") {
    val s = spark
    import s.implicits._
    // unit-circle fixture: 0 = east (seed), 2 = west (farthest), 3 =
    // north (maximin winner over near-east 1); 9 = zero vector (drops)
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.99f, 0.1f)),
      (2L, Seq(-1.0f, 0.0f)), (3L, Seq(0.0f, 1.0f)),
      (9L, Seq(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kCenterCoreset(vecs, "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      .sortBy(_._2)
    assert(got.map(_._1) == Seq(0L, 2L, 3L), got.toString)
    assert(got(0)._3 == 2.0 && got(1)._3 == 2.0 && got(2)._3 == 1.0,
      got.toString)
    // k beyond the (non-zero-norm) pool stops at the pool, no throw
    val all = Similarity.kCenterCoreset(vecs, "vec_id", "embedding", k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(all == Set(0L, 1L, 2L, 3L), all.toString)
  }

  test("persisted IVF+PQ index: pruned ADC probes equal ivfPqTopK; appends order-free; rerank matches") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val base = java.nio.file.Files.createTempDirectory("graft-ivfpq-base")
    val full = java.nio.file.Files.createTempDirectory("graft-ivfpq-full")
    try {
      // coarse + residual codebooks trained once, frozen everywhere
      val tr = Similarity.trainIvfPq(
        emb.where(col("vec_id") < 400), "vec_id", "embedding")
      Similarity.buildIvfPqIndex(emb.where(col("vec_id") < 400),
        "vec_id", "embedding", base.toString, trained = tr)
      Similarity.appendToIvfPqIndex(emb.where(col("vec_id") >= 400),
        "vec_id", "embedding", base.toString)
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", full.toString,
        trained = tr)
      // cell contents are SETS: build(base)+append(rest) == build(all)
      val a = s.read.parquet(base.toString).select("id", "pq_codes", "cell")
      val b = s.read.parquet(full.toString).select("id", "pq_codes", "cell")
      assert(a.count() == 500L)
      assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val viaAppend = Similarity.ivfPqTopKIndexed(s, base.toString, q, 10,
        idOut = "vec_id")
      val viaFull = Similarity.ivfPqTopKIndexed(s, full.toString, q, 10,
        idOut = "vec_id")
      // ...and both equal the in-session ADC scan over the same training
      val inSession = Similarity.ivfPqTopK(emb, "vec_id", "embedding", q, 10,
        trained = tr)
      assert(rows(viaAppend) == rows(viaFull))
      assert(rows(viaAppend) == rows(inSession))
      // the probe filter lands on the PARTITION column of the code layout
      val plan = viaFull.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell"),
        plan.take(2000))
      // two-stage re-rank over the layout == the in-session re-rank
      val rrIdx = Similarity.ivfPqRerankTopKIndexed(s, full.toString, emb,
        "vec_id", "embedding", q, 10, shortlist = 50)
      val rrMem = Similarity.ivfPqRerankTopK(emb, "vec_id", "embedding", q, 10,
        shortlist = 50, trained = tr)
      assert(rows(rrIdx) == rows(rrMem))
      assert(rows(rrIdx).nonEmpty && rows(rrIdx).head._1 == 7L)
    } finally {
      import scala.jdk.CollectionConverters._
      for (d <- Seq(base, full)) if (java.nio.file.Files.exists(d)) {
        val walk = java.nio.file.Files.walk(d)
        try walk.iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
  }

  test("hnswKnnJoinBatched: batch-size invariant at 20k queries, equals hnswKnnJoin, index path identical") {
    val s = spark
    import s.implicits._
    val dim = 4
    def vec(seed: Long): Array[Float] =
      Array.tabulate(dim)(j => (((seed * 2654435761L + j * 40503L) % 1000L).toFloat - 500f) / 100f)
    val corpus = (0L until 500L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val queries = (0L until 20000L).map(i => (i, vec(i + 777L))).toDF("qid0", "qv")
    def run(q: org.apache.spark.sql.DataFrame, bs: Int, idxDir: String = null) =
      Similarity.hnswKnnJoinBatched(corpus, "vec_id", "embedding",
        q, "qid0", "qv", k = 5, m = 8, efConstruction = 16, efSearch = 24,
        batchSize = bs, indexDir = idxDir)
    // one 20k-row batch vs 14 batches: the per-partition graphs are
    // deterministic, so every batch walks the SAME graphs — results
    // identical including rank tie-breaks
    val oneBatch = run(queries, 30000).collect().map(_.toSeq).toSet
    assert(run(queries, 1536).collect().map(_.toSeq).toSet == oneBatch)
    // batch composition is partitioning-dependent; results must not be
    assert(run(queries.repartition(7), 1536).collect().map(_.toSeq).toSet == oneBatch)
    // under the cap, the batched join IS hnswKnnJoin (shared walk kernel)
    val sub = queries.where(col("qid0") < 100)
    val capped = Similarity.hnswKnnJoin(corpus, "vec_id", "embedding",
        sub, "qid0", "qv", k = 5, m = 8, efConstruction = 16, efSearch = 24)
      .collect().map(_.toSeq).toSet
    assert(run(sub, 37).collect().map(_.toSeq).toSet == capped)
    // persisted-index path: batches LOAD the stored adjacency instead of
    // rebuilding — same graphs, identical rows
    val dir = java.nio.file.Files.createTempDirectory("graft-hnswjoin-idx")
    try {
      Similarity.buildHnswIndex(corpus, "vec_id", "embedding", dir.toString,
        m = 8, efConstruction = 16, nParts = 4)
      assert(run(queries, 1536, dir.toString).collect().map(_.toSeq).toSet == oneBatch)
    } finally {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(java.nio.file.Files.deleteIfExists(_))
      finally walk.close()
    }
    // empty query side → empty frame with the contract schema
    val none = run(queries.where(lit(false)), 100)
    assert(none.columns.toSeq == Seq("qid", "vec_id", "cos"))
    assert(none.count() == 0L)
  }

  test("appendToHnswIndex: append equals full rebuild bit-for-bit; interleaved ids fail loudly") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val base = java.nio.file.Files.createTempDirectory("graft-hnswapp-base")
    val full = java.nio.file.Files.createTempDirectory("graft-hnswapp-full")
    try {
      // CONSTRAINED budgets (the persisted-index spec's reasoning): the
      // answer is a function of the GRAPH, so bit-identical layouts and
      // answers prove append replays the rebuild's insertion sequence
      Similarity.buildHnswIndex(emb.where(col("vec_id") < 400),
        "vec_id", "embedding", base.toString, m = 4, efConstruction = 8, nParts = 4)
      Similarity.appendToHnswIndex(emb.where(col("vec_id") >= 400),
        "vec_id", "embedding", base.toString)
      Similarity.buildHnswIndex(emb, "vec_id", "embedding", full.toString,
        m = 4, efConstruction = 8, nParts = 4)
      val a = s.read.parquet(base.toString)
      val b = s.read.parquet(full.toString)
      assert(a.count() == 500L)
      assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L,
        "appended layout diverged from the full rebuild")
      def top(dir: String) = Similarity.hnswTopKIndexed(s, dir, q, 10,
        efSearch = 12, idOut = "vec_id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(top(base.toString) == top(full.toString))
      // interleaved ids (vec_id < 400 already stored) fail LOUDLY inside
      // the grouped pass, and the failed append leaves the index intact
      val ex = intercept[Exception] {
        Similarity.appendToHnswIndex(emb.where(col("vec_id") < 10),
          "vec_id", "embedding", base.toString)
      }
      def msgChain(t: Throwable): String =
        if (t == null) "" else t.getMessage + " | " + msgChain(t.getCause)
      assert(msgChain(ex).contains("strictly increasing"), msgChain(ex))
      assert(top(base.toString) == top(full.toString),
        "failed append must leave the canonical layout readable and unchanged")
    } finally {
      import scala.jdk.CollectionConverters._
      val tmpLeft = java.nio.file.Paths.get(base.toString + "__append_tmp")
      for (d <- Seq(base, full, tmpLeft)) if (java.nio.file.Files.exists(d)) {
        val walk = java.nio.file.Files.walk(d)
        try walk.iterator().asScala.toSeq.reverseIterator
          .foreach(java.nio.file.Files.deleteIfExists(_))
        finally walk.close()
      }
    }
  }

  test("hnswTopK: equals exact brute force at default budgets, deterministic, recall under constraint") {
    val s = spark
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.where(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the oracle-gated claim: the merged per-partition shortlists cover
    // the exact top-20, so the re-ranked answer EQUALS brute force —
    // ids AND values, in order
    val exact = rows(emb.select(col("vec_id"),
        round(Similarity.cosine(col("embedding"), typedlit(q.toSeq)), 6).as("cos"))
      .orderBy(desc("cos"), col("vec_id")).limit(20))
    val got = rows(Similarity.hnswTopK(emb, "vec_id", "embedding", q, 20))
    assert(got == exact, s"hnsw diverged from exact:\n$got\n$exact")
    // deterministic: an independent second build answers identically
    assert(rows(Similarity.hnswTopK(emb, "vec_id", "embedding", q, 20)) == got)
    // CONSTRAINED budget (small beam, small degree): recall@20 must
    // still beat the trained IVF's 85% bar — the graph walk finds the
    // neighborhood even when it can only keep 24 candidates
    val (_, hit, bp) = Similarity.recallAtK(
        Similarity.hnswTopK(emb, "vec_id", "embedding", q, 20,
          m = 8, efConstruction = 32, efSearch = 24, nParts = 4),
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 20),
        "vec_id", 20)
      .head() match { case r => (r.getLong(0), r.getLong(1), r.getLong(2)) }
    assert(bp >= 8500L, s"constrained-budget HNSW recall $hit/20 ($bp bp) under the 85% bar")
    // a query vector present in the corpus retrieves itself first
    assert(got.head._1 == 0L && got.head._2 == 1.0)
    // guards
    intercept[IllegalArgumentException] {
      Similarity.hnswTopK(emb, "vec_id", "embedding", q, 20, efSearch = 10)
    }
    intercept[IllegalArgumentException] {
      Similarity.hnswTopK(emb, "vec_id", "embedding", q, 20, m = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.hnswTopK(emb, "vec_id", "embedding", q, 20,
        nParts = 1024, efSearch = 96)
    }
  }

  test("hilbert curve: bijection, unit-step adjacency, tighter locality than z-order") {
    val s = spark
    import s.implicits._
    val bits = 4
    val n = 1 << bits // 16x16 grid
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val rows = grid.select(col("x"), col("y"),
        sources.Tables.hilbertValue(col("x"), col("y"), bits).as("h"),
        sources.Tables.zValue(Seq(col("x"), col("y")), bits).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // bijection onto 0..n^2-1
    assert(rows.map(_._3).sorted.toSeq == (0L until (n.toLong * n)).toSeq)
    // THE Hilbert property: consecutive codes are unit Manhattan steps
    val byH = rows.sortBy(_._3)
    byH.sliding(2).foreach { case Array(a, b) =>
      assert(math.abs(a._1 - b._1) + math.abs(a._2 - b._2) == 1L,
        s"jump between h=${a._3} and h=${b._3}")
    case _ => }
    // ...which the Z curve violates (its average successive step is
    // strictly larger — the seam teleports)
    val byZ = rows.sortBy(_._4)
    val zJump = byZ.sliding(2).collect { case Array(a, b) =>
      math.abs(a._1 - b._1) + math.abs(a._2 - b._2) }.sum
    assert(zJump > (n.toLong * n - 1), s"z total step $zJump")
    // spot-check the canonical order-1 curve: (0,0)->0 (0,1)->1 (1,1)->2 (1,0)->3
    val h1 = Seq((0, 0), (0, 1), (1, 1), (1, 0)).toDF("x", "y")
      .select(sources.Tables.hilbertValue(col("x"), col("y"), 1))
      .collect().map(_.getLong(0)).toSeq
    assert(h1 == Seq(0L, 1L, 2L, 3L))
  }

  test("personalized pagerank: matches the integer model, rank concentrates at seeds") {
    val s = spark
    import s.implicits._
    // two disjoint 4-cycles; seed only in the first
    def cyc(base: Long) = (0L until 4L).map(i => (base + i, base + (i + 1) % 4))
    val edges = (cyc(0) ++ cyc(100)).toDF("src", "dst")
    val got = Graph.personalizedPageRankFixed(edges, "src", "dst",
        seeds = Seq("0"), iterations = 5)
      .collect().map(r => (r.getString(0).toLong, r.getLong(1))).toMap
    // naive integer recurrence
    val adj = (cyc(0) ++ cyc(100)).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodesAll = (cyc(0) ++ cyc(100)).flatMap(e => Seq(e._1, e._2)).distinct
    var r = nodesAll.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, vs) <- adj; v <- vs) contrib(v) += r(u) * 85 / (100 * vs.size)
      r = nodesAll.map(n => n -> ((if (n == 0L) 150000L else 0L) + contrib(n))).toMap
    }
    assert(got == r)
    // seeded community holds rank; the unseeded cycle decays below every
    // seeded-community node
    val seededMin = (0L until 4L).map(got).min
    val otherMax = (100L until 104L).map(got).max
    assert(seededMin > otherMax)
    // loud guards
    assert(intercept[IllegalArgumentException] {
      Graph.personalizedPageRankFixed(edges, "src", "dst", Nil)
    }.getMessage.contains("empty seed set"))
  }

  test("snapshot history: manifest shape per version, expire drops rows, counts optional") {
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-hist-spec")
    val d = (1L to 20L).map(i => (i, i * 10)).toDF("doc_id", "n_chars")
    sources.Snapshots.append(d.where(col("doc_id") <= 10), tmp.toString)
    sources.Snapshots.append(d.where(col("doc_id") > 10), tmp.toString)
    sources.Snapshots.deleteWhere(s, tmp.toString, Seq("doc_id"), col("doc_id") % 5 === 0)
    sources.Snapshots.compact(s, tmp.toString) // v4: one fresh dir
    val h = sources.Snapshots.history(s, tmp.toString).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(h.toSeq == Seq(
      (1L, 1L, 1L, 0L, 1L, 10L),
      (2L, 2L, 2L, 0L, 1L, 20L),
      (3L, 3L, 2L, 1L, 1L, 16L),
      (4L, 1L, 1L, 0L, 1L, 16L)))
    // metadata-only mode skips the count jobs
    val meta = sources.Snapshots.history(s, tmp.toString, withRowCounts = false)
      .collect().map(_.getLong(5)).toSet
    assert(meta == Set(-1L))
    // expire removes dropped versions from history
    sources.Snapshots.expire(s, tmp.toString, keepLast = 1)
    assert(sources.Snapshots.history(s, tmp.toString).collect()
      .map(_.getLong(0)).toSeq == Seq(4L))
    java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.deleteIfExists(p))
  }

  test("audio resample: matches the rational-interpolation model, identity at 1/1, stereo") {
    val s = spark
    import s.implicits._
    val ids = (0L until 10L).toDF("doc_id")
    val blobs = Multimodal.syntheticAudioBlobs(s, ids)
    def run(l: Int, m: Int) = Multimodal.audioResample(s, blobs, l, m)
      .collect().map(r => ((r.doc_id, r.channel), r)).toMap
    // naive model from the WAV sample formula
    def sample(id: Long, f: Int, c: Int): Long =
      java.lang.Math.floorMod(id * 7919 + f * 31 + c * 17, 2048L) - 1024L
    val got = run(3, 4)
    for (id <- 0L until 10L; c <- 0 until (1 + id % 2).toInt) {
      val nf = 256 + (id * 3 % 200).toInt
      val nOut = (nf - 1) * 3 / 4 + 1
      var wsum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
      for (j <- 0 until nOut) {
        val p = j * 4; val i = p / 3; val r = p % 3
        val y = if (r == 0) sample(id, i, c)
        else sample(id, i, c) + (sample(id, i + 1, c) - sample(id, i, c)) * r / 3
        wsum += (j + 1) * y; mn = math.min(mn, y); mx = math.max(mx, y)
      }
      val g = got((id, c))
      assert((g.n_in, g.n_out, g.wsum, g.smin, g.smax) ==
        ((nf.toLong, nOut.toLong, wsum, mn, mx)), s"doc $id ch $c")
      assert(g.sr_out == g.sr_in * 3 / 4 && g.sr_in * 3 % 4 == 0)
    }
    // identity ratio returns the input stream verbatim
    val id1 = run(1, 1)
    for (((id, c), g) <- id1) {
      val nf = 256 + (id * 3 % 200).toInt
      val wsum = (0 until nf).map(j => (j + 1).toLong * sample(id, j, c)).sum
      assert(g.n_out == nf.toLong && g.wsum == wsum, s"identity doc $id ch $c")
    }
    // stereo docs emit both channels, mono docs one
    assert(id1.keySet.count(_._1 == 1L) == 2 && id1.keySet.count(_._1 == 0L) == 1)
  }

  test("video scene cuts: SAD equals the band-formula model, threshold splits") {
    val s = spark
    import s.implicits._
    val ids = (0L until 12L).toDF("doc_id")
    val got = Multimodal.videoSceneCuts(s,
        Multimodal.syntheticAviBlobs(s, ids), threshold = 32000L)
      .collect().map(c => ((c.doc_id, c.frame_idx), (c.diff_sum, c.is_cut))).toMap
    // model: palette-resolved frames straight from aviIdx/aviBand
    def chans(idx: Int) = (85 * (idx % 4), 85 * ((idx / 4) % 4), 85 * ((idx / 16) % 4))
    for (id <- 0L until 12L) {
      val nf = (4 + id % 5).toInt
      def frame(f: Int): Array[Int] = Array.tabulate(24 * 16) { i =>
        val x = i % 24; val y = i / 24
        // last generation g <= f whose band covers y (0 = the key frame)
        val g = (f to 0 by -1).find(gg =>
          gg == 0 || (y >= Multimodal.aviBand(gg) && y < Multimodal.aviBand(gg) + 4)).get
        Multimodal.aviIdx(id, g, x, y)
      }
      for (f <- 1 until nf) {
        val (a, b) = (frame(f), frame(f - 1))
        val sad = a.zip(b).map { case (ia, ib) =>
          val (r1, g1, b1) = chans(ia); val (r2, g2, b2) = chans(ib)
          math.abs(r1 - r2) + math.abs(g1 - g2) + math.abs(b1 - b2)
        }.map(_.toLong).sum
        assert(got((id, f)) == ((sad, sad > 32000L)), s"doc $id frame $f")
      }
      assert(!got.contains((id, 0))) // no transition into the key frame
    }
    // the threshold genuinely splits this corpus slice
    val flags = got.values.map(_._2).toSet
    assert(flags == Set(true, false))
  }

  test("kneser-ney: mass sums to exactly 1, continuation beats raw frequency, hand example") {
    val s = spark
    import s.implicits._
    // "francisco" is FREQUENT but only ever follows "san"; "cat" is
    // rarer overall but follows many contexts
    val docs = Seq(
      (1L, "san francisco is big san francisco is far"),
      (2L, "the cat and a cat saw my cat in san francisco"),
      (3L, "a dog and the dog met one cat near san francisco")).toDF("doc_id", "text")
    val rowsDf = TextOps.kneserNeyBigrams(docs, "doc_id", "text")
    val rows = rowsDf.collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    // recompute the count model naively
    val bigrams = docs.collect().flatMap { r =>
      val t = r.getString(1).split(" ")
      t.zip(t.drop(1))
    }
    val c2 = bigrams.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cv = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val n1v = c2.keys.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n1w = c2.keys.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n1all = c2.size.toLong
    // every emitted fraction equals the definition, reduced
    assert(rows.keySet == c2.keySet)
    for (((v, w), (gc2, num, den)) <- rows) {
      assert(gc2 == c2((v, w)))
      val rn = BigInt((4 * c2((v, w)) - 3) * n1all + 3 * n1v(v) * n1w(w))
      val rd = BigInt(4 * cv(v) * n1all)
      val g = rn.gcd(rd)
      assert((BigInt(num), BigInt(den)) == (rn / g, rd / g), s"($v,$w)")
    }
    // TOTAL MASS: for every context v, sum over observed w of P(w|v)
    // plus lambda(v) * (continuation mass of unseen w) == exactly 1
    case class Frac(n: BigInt, d: BigInt) {
      def +(o: Frac) = Frac(n * o.d + o.n * d, d * o.d)
      def *(o: Frac) = Frac(n * o.n, d * o.d)
      def norm: (BigInt, BigInt) = { val g = n.gcd(d); (n / g, d / g) }
    }
    val vocabW = n1w.keySet // words that END at least one bigram
    for (v <- cv.keys) {
      val seen = c2.keys.filter(_._1 == v).map(_._2).toSet
      val observedMass = seen.toSeq.map { w =>
        val (_, num, den) = rows((v, w)); Frac(BigInt(num), BigInt(den))
      }.foldLeft(Frac(0, 1))(_ + _)
      val lambda = Frac(BigInt(3) * n1v(v), BigInt(4) * cv(v))
      val unseenCont = (vocabW -- seen).toSeq
        .map(w => Frac(BigInt(n1w(w)), BigInt(n1all)))
        .foldLeft(Frac(0, 1))(_ + _)
      assert((observedMass + lambda * unseenCont).norm == (BigInt(1), BigInt(1)),
        s"context $v mass != 1")
    }
    // the KN point: P(francisco | unseen-ish context) back-off weight is
    // driven by continuation count 1, so despite c(francisco) = 4 its
    // continuation probability is the MINIMUM 1/n1all — while "cat"
    // (4 contexts: the/a/my/one) carries 4x that
    assert(n1w("francisco") == 1L && n1w("cat") == 4L)
  }

  test("isotonic calibration: equals the minimax definition, monotone, exact fractions, loud cap") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-noisy monotone data over 12 score bins
    val rows = for {
      b <- 0 until 12
      r <- 0 until (3 + b % 4)
    } yield (b.toLong, if ((b * 7 + r * 13) % 12 < b) 1 else 0)
    val got = Curation.isotonicCalibrate(rows.toDF("score", "label"), "score", "label")
      .orderBy(col("score")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // brute-force minimax reference: cal(i) = max_{j<=i} min_{k>=i} mean(j..k)
    val hist = rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (sc, g) => (sc, g.size.toLong, g.map(_._2).sum.toLong) }
    def frac(j: Int, k: Int): (Long, Long) =
      ((j to k).map(hist(_)._3).sum, (j to k).map(hist(_)._2).sum)
    val m = hist.size
    for (i <- 0 until m) {
      val cal = (0 to i).map { j =>
        (i until m).map(k => frac(j, k)).minBy { case (n, d) => n.toDouble / d }
      }.maxBy { case (n, d) => n.toDouble / d }
      val g = BigInt(cal._1).gcd(BigInt(cal._2)).toLong
      val exp = (hist(i)._1, hist(i)._2, hist(i)._3, cal._1 / g, cal._2 / g)
      assert(got(i) == exp, s"bin $i")
    }
    // non-decreasing calibrated values
    got.sliding(2).foreach { case Array(a, b) =>
      assert(BigInt(a._4) * b._5 <= BigInt(b._4) * a._5, s"$a -> $b not monotone")
    case _ => }
    // decreasing raw rates pool into one flat segment
    val dec = Seq((0L, 1), (0L, 1), (1L, 1), (1L, 0), (2L, 0), (2L, 0))
    val pooled = Curation.isotonicCalibrate(dec.toDF("score", "label"), "score", "label")
      .collect().map(r => (r.getLong(3), r.getLong(4))).toSet
    assert(pooled == Set((1L, 2L))) // global mean 3/6 reduced
    // bin cap is loud
    val many = (0L until 50L).map(i => (i, (i % 2).toInt))
    val ex = intercept[IllegalArgumentException] {
      Curation.isotonicCalibrate(many.toDF("score", "label"), "score", "label", maxBins = 10)
    }
    assert(ex.getMessage.contains("distinct scores"))
  }

  test("wordpiece: greedy MaxMatch semantics, ## forms, UNK, naive-model equality") {
    val s = spark
    import s.implicits._
    // handcrafted vocab: init pieces {a, ab, abc-less}, cont {##b, ##c, ##bcd}
    val vocab = Seq(("a", 0), ("ab", 0), ("x", 0), ("b", 1), ("c", 1), ("bcd", 1), ("d", 1))
    def seg(texts: String*): Seq[(String, Long, Long)] =
      TextOps.wordPieceSegmentWith(
          texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
          "doc_id", "text", vocab)
        .orderBy(col("doc_id"))
        .collect().map(r => (r.getString(4), r.getLong(2), r.getLong(3))).toSeq
    // longest-match-first: "abcd" takes ab (not a), then ##c ##d — NOT
    // a + ##bcd even though that uses fewer pieces (greedy, not optimal)
    assert(seg("abcd") == Seq(("ab·##c·##d", 3L, 0L)))
    // dead end -> whole word is [UNK]: "ba" cannot START (no form-0 b)
    assert(seg("ba") == Seq(("[UNK]", 1L, 1L)))
    // mid-word dead end also UNKs: "ax" fails at ##x (x is init-only)
    assert(seg("ax") == Seq(("[UNK]", 1L, 1L)))
    // multiple words mix forms and UNKs independently
    assert(seg("abcd ba x a") == Seq(("ab·##c·##d [UNK] x a", 6L, 1L)))
    // doubled/leading/trailing spaces: empty split slots render as
    // NOTHING — non-empty word segs join with single spaces (the same
    // convention the DuckDB oracle uses, which drops empty words)
    assert(seg("  abcd  ba  ") == Seq(("ab·##c·##d [UNK]", 4L, 1L)))

    // naive reference on real corpus-ish text with a derived vocab
    val docs = Seq(
      (1L, "the cat sat on the mat"), (2L, "the cats sat on mats"),
      (3L, "unusual zebra words qqq")).toDF("doc_id", "text")
    val dv = TextOps.wordPieceVocab(docs, "doc_id", "text",
        maxPieceLen = 4, topPieces = 10, topChars = 12)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    val init = dv.filter(_._2 == 0).map(_._1).toSet
    val cont = dv.filter(_._2 == 1).map(_._1).toSet
    def naiveWord(word: String): (String, Long, Long) = {
      val sb = new StringBuilder
      var ofs = 0; var np = 0L
      while (ofs < word.length) {
        val set = if (ofs == 0) init else cont
        val hit = (math.min(4, word.length - ofs) to 1 by -1)
          .find(l => set.contains(word.substring(ofs, ofs + l)))
        hit match {
          case None => return ("[UNK]", 1L, 1L)
          case Some(l) =>
            if (ofs > 0) sb.append("·##")
            sb.append(word.substring(ofs, ofs + l)); ofs += l; np += 1
        }
      }
      (sb.toString, np, 0L)
    }
    val got = TextOps.wordPieceSegmentWith(docs, "doc_id", "text", dv.sorted)
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(4), r.getLong(2), r.getLong(3)))
    for ((id, gseg, gnp, gunk) <- got) {
      val words = docs.where(col("doc_id") === id).head().getString(1).split(" ")
      val parts = words.map(naiveWord)
      assert(gseg == parts.map(_._1).mkString(" "), s"doc $id")
      assert(gnp == parts.map(_._2).sum && gunk == parts.map(_._3).sum, s"doc $id")
    }
  }

  test("label propagation: planted partition recovered, min-label fixpoint, loud maxIter") {
    val s = spark
    import s.implicits._
    // two planted communities — a triangle {1,2,3} and a star {10;11,12,13}
    // — plus an isolated edge pair {20,21}
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L)).toDF("x", "y")
    def run(df: org.apache.spark.sql.DataFrame, maxIter: Int = 30) =
      Graph.labelPropagation(df, "x", "y", maxIter)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L), got.toString)
    // deterministic: a second run is identical
    assert(run(edges) == got)
    // direction/duplicates/self-loops are canonicalized away
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 2L), (1L, 3L), (1L, 1L))
      .toDF("x", "y")
    assert(run(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // a long path needs its length in rounds: maxIter fails LOUDLY
    // instead of emitting a non-fixpoint labeling
    val path = (0L until 12L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("x", "y")
    intercept[IllegalArgumentException] { run(path, maxIter = 3) }
    assert(run(path, maxIter = 15).values.toSet == Set(0L))
  }

  test("weighted label propagation: weak bridge keeps blocks apart, argmax ties, loud weights") {
    val s = spark
    import s.implicits._
    // two 4-cliques (in-block weight 10) tied by ONE weight-1 bridge:
    // a single connected component, so min-label LPA floods it to 1 —
    // the weighted argmax must keep each clique on its own label
    def clique(ids: Seq[Long], w: Long) =
      for (i <- ids; j <- ids if i < j) yield (i, j, w)
    val edges = (clique(Seq(1L, 2L, 3L, 4L), 10L) ++
      clique(Seq(11L, 12L, 13L, 14L), 10L) :+ ((4L, 11L, 1L)))
      .toDF("x", "y", "w")
    def run(df: org.apache.spark.sql.DataFrame, rounds: Int = 4) =
      Graph.labelPropagationWeighted(df, "x", "y", "w", rounds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = run(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      11L -> 11L, 12L -> 11L, 13L -> 11L, 14L -> 11L), got.toString)
    // ...and HashMin on the same graph floods to one community
    assert(Graph.labelPropagation(edges, "x", "y")
      .collect().map(_.getLong(1)).toSet == Set(1L))
    // deterministic: a second run is identical
    assert(run(edges) == got)
    // a DOMINANT bridge (weight 100 vs in-clique 10) rips node 4 out of
    // clique A on round 1 — the two bridge endpoints then two-cycle
    // (synchronous LPA's known oscillation; no fixpoint is claimed), but
    // the round-4 labeling is deterministic and node 4 is no longer in
    // clique A's community
    val heavy = (clique(Seq(1L, 2L, 3L, 4L), 10L) ++
      clique(Seq(11L, 12L, 13L, 14L), 10L) :+ ((4L, 11L, 100L)))
      .toDF("x", "y", "w")
    val hv = run(heavy)
    assert(hv(4L) != hv(1L), hv.toString)
    assert(run(heavy) == hv)
    // duplicate pairs and both orientations collapse with SUMMED weight:
    // (1,2,6)+(2,1,4) == one (1,2,10) edge — same answer as the plain run
    val dup = (clique(Seq(1L, 2L, 3L, 4L), 10L)
      .filterNot(e => e._1 == 1L && e._2 == 2L) ++
      Seq((1L, 2L, 6L), (2L, 1L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L), 10L) :+ ((4L, 11L, 1L)))
      .toDF("x", "y", "w")
    assert(run(dup) == got)
    // non-positive weights fail LOUDLY (they would silently reshape the
    // argmax), and rounds must be >= 1
    intercept[IllegalArgumentException] {
      run(Seq((1L, 2L, 0L)).toDF("x", "y", "w"))
    }
    intercept[IllegalArgumentException] { run(edges, rounds = 0) }
    // synchronous LPA on a bipartite star two-cycles forever — no
    // fixpoint claim is made, but the round-`rounds` labeling is still
    // a deterministic function of the data
    val star = Seq((0L, 1L, 1L), (0L, 2L, 1L), (0L, 3L, 1L)).toDF("x", "y", "w")
    assert(run(star, rounds = 5) == run(star, rounds = 5))
  }

  test("weighted PageRank: w=1 equals unweighted, volume shifts rank, loud weights, modes agree") {
    val s = spark
    import s.implicits._
    // star with one heavy spoke: a->c carries 9x the weight of b->c'
    val edges = Seq(
      ("a", "hub", 1L), ("b", "hub", 1L),
      ("hub", "heavy", 9L), ("hub", "light", 1L)).toDF("s", "d", "w")
    def ranks(df: org.apache.spark.sql.DataFrame) =
      Graph.pageRankWeightedFixed(df, "s", "d", "w", iterations = 5)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = ranks(edges)
    // the heavy target receives 9x the hub's contribution of the light one
    assert(got("heavy") > got("light"), got.toString)
    // w = 1 everywhere IS pageRankFixed (the unweighted special case)
    val ones = Seq(("a", "hub"), ("b", "hub"), ("hub", "heavy"), ("hub", "light"))
      .toDF("s", "d")
    val unweighted = Graph.pageRankFixed(ones, "s", "d", iterations = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(ranks(ones.withColumn("w", lit(1L))) == unweighted)
    // parallel (src, dst) edges collapse with summed weight
    val par = Seq(("a", "hub", 1L), ("b", "hub", 1L),
      ("hub", "heavy", 4L), ("hub", "heavy", 5L), ("hub", "light", 1L))
      .toDF("s", "d", "w")
    assert(ranks(par) == got)
    // non-positive weights fail LOUDLY
    intercept[IllegalArgumentException] {
      ranks(Seq(("a", "b", 0L)).toDF("s", "d", "w"))
    }
    // durable-checkpoint mode is result-identical and leaves no orphans
    val dir = java.nio.file.Files.createTempDirectory("graft-prw-spec").toString
    val durable = Graph.pageRankWeightedFixed(edges, "s", "d", "w",
        iterations = 5, checkpointDir = dir, checkpointEvery = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(durable == got)
    val leftovers = new java.io.File(dir).listFiles()
    assert(leftovers == null || leftovers.isEmpty,
      leftovers.map(_.getName).mkString(", "))
  }

  test("modularity: exact integer masses match the hand calculation, loud contracts") {
    val s = spark
    import s.implicits._
    def clique(ids: Seq[Long], w: Long) =
      for (i <- ids; j <- ids if i < j) yield (i, j, w)
    val edges = (clique(Seq(1L, 2L, 3L, 4L), 10L) ++
      clique(Seq(11L, 12L, 13L, 14L), 10L) :+ ((4L, 11L, 1L)))
      .toDF("x", "y", "w")
    def labelsOf(pairs: (Long, Long)*) = pairs.toSeq.toDF("node", "community")
    val planted = labelsOf((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (11L, 11L), (12L, 11L), (13L, 11L), (14L, 11L))
    val got = Graph.modularity(edges, "x", "y", "w", planted, "node", "community")
      .collect().map(r => (r.getLong(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // hand calculation: per clique in2 = 2*60, tot = 121, 2m = 242;
    // contrib = 120/242 - (121/242)^2 = 0.245868 (6-dp); Q = 0.491736
    assert(got == Map(
      1L -> ((120L, 121L, 242L, 0.245868)),
      11L -> ((120L, 121L, 242L, 0.245868))), got.toString)
    // the labeling labelPropagationWeighted finds IS the planted one,
    // so its modularity is the same Q — detection and score compose
    val lpa = Graph.labelPropagationWeighted(edges, "x", "y", "w", rounds = 4)
    val qLpa = Graph.modularity(edges, "x", "y", "w", lpa, "node", "community")
      .agg(org.apache.spark.sql.functions.sum(col("contrib"))).head().getDouble(0)
    assert(math.abs(qLpa - 0.491736) < 1e-9, qLpa.toString)
    // everything in one community -> Q = 0 (in2 = tot = 2m)
    val one = labelsOf((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
      (11L, 0L), (12L, 0L), (13L, 0L), (14L, 0L))
    val oneRow = Graph.modularity(edges, "x", "y", "w", one, "node", "community")
      .collect()
    assert(oneRow.length == 1 &&
      oneRow(0).getLong(1) == 242L && oneRow(0).getLong(2) == 242L &&
      oneRow(0).getDouble(4) == 0.0)
    // duplicate pairs / reversed orientations collapse before the masses
    val dup = (Seq((2L, 1L, 6L), (1L, 2L, 4L)) ++
      clique(Seq(1L, 2L, 3L, 4L), 10L).filterNot(e => e._1 == 1L && e._2 == 2L) ++
      clique(Seq(11L, 12L, 13L, 14L), 10L) :+ ((4L, 11L, 1L))).toDF("x", "y", "w")
    assert(Graph.modularity(dup, "x", "y", "w", planted, "node", "community")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap ==
      Map(1L -> 120L, 11L -> 120L))
    // an unlabeled endpoint fails LOUDLY instead of silently dropping
    val partial = labelsOf((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L),
      (11L, 11L), (12L, 11L), (13L, 11L))
    val ex = intercept[Exception] {
      Graph.modularity(edges, "x", "y", "w", partial, "node", "community").collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(ex).contains("unlabeled endpoint"), chain(ex))
    // empty edge set -> empty frame with the contract schema
    val none = Graph.modularity(edges.where(lit(false)), "x", "y", "w",
      planted, "node", "community")
    assert(none.columns.toSeq ==
      Seq("community", "in2", "tot", "two_m", "contrib"))
    assert(none.count() == 0L)
  }

  test("k-core: peeling equals the naive model, cascades peel fully, loud maxIter") {
    val s = spark
    import s.implicits._
    // path 0-1-2-3 (2-core empty), 4-clique {10,11,12,13},
    // a tail 20-10 hanging off the clique, and a triangle {30,31,32}
    val edges = Seq(
      (0L, 1L), (1L, 2L), (2L, 3L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L),
      (20L, 10L),
      (30L, 31L), (31L, 32L), (32L, 30L)).toDF("x", "y")
    def run(k: Int) = Graph.kCoreMembers(edges, "x", "y", k)
      .collect().map(r => (r.getString(0).toLong, r.getLong(1))).toMap
    // naive reference peel
    def naive(k: Int): Map[Long, Long] = {
      var adj = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
        .flatMap(e => Seq(e, e.swap)).groupBy(_._1).view
        .mapValues(_.map(_._2).toSet).toMap
      var changed = true
      while (changed) {
        val dead = adj.collect { case (n, s) if s.size < k => n }.toSet
        changed = dead.nonEmpty
        adj = (adj -- dead).view.mapValues(_ -- dead).toMap
      }
      adj.map { case (n, s) => (n, s.size.toLong) }
    }
    for (k <- 1 to 4) assert(run(k) == naive(k), s"k=$k")
    // spot-check semantics: 3-core is exactly the 4-clique (tail node 20
    // peels, which is precisely what a degree filter WITHOUT iteration
    // would get wrong: node 10 keeps degree 4 but 20 must still go)
    assert(run(3).keySet == Set(10L, 11L, 12L, 13L))
    assert(run(3).values.toSet == Set(3L))
    // 2-core keeps clique + triangle, drops the path and tail
    assert(run(2).keySet == Set(10L, 11L, 12L, 13L, 30L, 31L, 32L))
    // 4-core is empty
    assert(run(4).isEmpty)
    // a long path peels from the ends inward — maxIter must raise loudly
    val path = (0L until 20L).map(i => (i, i + 1)).toDF("x", "y")
    val ex = intercept[Exception] {
      Graph.kCoreMembers(path, "x", "y", k = 2, maxIter = 3).collect()
    }
    assert(ex.getMessage.contains("no fixpoint"))
    // ...and enough rounds converge to the empty 2-core
    assert(Graph.kCoreMembers(path, "x", "y", k = 2, maxIter = 30).count() == 0L)
  }

  // naive winnowing reference: explicit windows, argmin by (hash asc,
  // pos desc), consecutive re-selections collapse — straight from the
  // SIGMOD 2003 definition, no key packing
  private def winnowNaive(text: String, k: Int, w: Int): Seq[(Int, Long)] = {
    val bytes = text.getBytes("UTF-8")
    val n = bytes.length - k + 1
    if (n <= 0) return Nil
    val h40 = Array.tabulate(n) { p =>
      var h = 0xcbf29ce484222325L
      for (i <- 0 until k) h = (h ^ (bytes(p + i) & 0xffL)) * 0x100000001b3L
      HashKernelsAccess.mix(h) & 0xffffffffffL
    }
    val wEff = math.min(w, n)
    val sels = for (e <- (wEff - 1) until n) yield {
      val window = (e - wEff + 1) to e
      window.minBy(p => (h40(p), -p))
    }
    sels.distinct.map(p => (p, h40(p)))
  }

  test("winnowing: kernel equals the naive definition, guarantee holds on planted overlap") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again today",
      "completely different words appear here nothing shared at all now",
      "x", "", "short one",
      (1 to 60).map(i => s"tok$i").mkString(" "))
    val got = TextOps.winnowFingerprints(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"),
        "doc_id", "text", k = 8, w = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(x => (x._2, x._3)).toSeq.sortBy(_._1)).toMap
    for ((t, i) <- texts.zipWithIndex) {
      val exp = winnowNaive(t, 8, 16)
      assert(got.getOrElse(i.toLong, Nil) == exp, s"doc $i")
    }
    // sub-window doc still yields exactly one fingerprint (global min)
    assert(got.getOrElse(2L, Nil).isEmpty && got.getOrElse(3L, Nil).isEmpty) // shorter than k
    assert(got(4L).size == 1)

    // THE guarantee: a shared run of w + k - 1 = 23 chars in otherwise
    // unrelated documents must share a fingerprint
    val shared = "abcdefghijklmnopqrstuvw" // 23 chars
    val docA = "left padding words here " + shared + " and unrelated tail alpha"
    val docB = "totally other beginning " + shared + " plus a different ending"
    val pairs = TextOps.winnowOverlapPairs(
        Seq((1L, docA), (2L, docB),
          (3L, "no overlap with anything else whatsoever in this row")).toDF("doc_id", "text"),
        "doc_id", "text", k = 8, w = 16, minShared = 1, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("image near-dup: variant within radius of its base, banding complete vs brute force") {
    val s = spark
    import s.implicits._
    val ids = (0L until 40L).toDF("doc_id")
    def hashes(blobs: org.apache.spark.sql.DataFrame) =
      Multimodal.perceptualHashes(s, blobs).toDF().select(col("doc_id"), col("dhash"))
    val base = hashes(Multimodal.syntheticImageBlobs(s, ids)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val varr = hashes(Multimodal.syntheticVariantBlobs(s, ids)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // the perturbation (+8 clamp + 4x4 patch) stays inside radius 8 for
    // every fixture id — the near-dup join must pair each base with its
    // own variant
    for (id <- 0L until 40L) {
      val d = java.lang.Long.bitCount(base(id) ^ varr(id))
      assert(d <= 8, s"doc $id drifted to hamming $d")
    }
    val got = Dedup.hammingNearDupPairsCross(
        hashes(Multimodal.syntheticImageBlobs(s, ids)),
        hashes(Multimodal.syntheticVariantBlobs(s, ids)),
        "doc_id", "dhash", maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force from the collected codes — pigeonhole banding is
    // complete at the radius, so the sets must be EQUAL
    val brute = (for {
      (ia, ca) <- base.toSeq
      (ib, cb) <- varr.toSeq
      d = java.lang.Long.bitCount(ca ^ cb)
      if d <= 8
    } yield (ia, ib, d)).toSet
    assert(got == brute)
    assert((0L until 40L).forall(id => got.exists(p => p._1 == id && p._2 == id)))
  }
}
