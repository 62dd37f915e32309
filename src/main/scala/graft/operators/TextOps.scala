package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShim

/**
 * Text-analysis operators for training-data curation: token statistics,
 * quality scoring, n-gram language identification, and fingerprinting.
 * Everything is a narrow per-row expression — no shuffles except where an
 * aggregation is explicitly requested — so these run at scan speed on
 * arbitrary data sizes.
 */
object TextOps {

  def tokens(textCol: Column): Column = split(textCol, " ")

  def tokenCount(textCol: Column): Column = size(tokens(textCol)).cast("long")

  def charLength(textCol: Column): Column = length(textCol).cast("long")

  /** Fraction of characters that are punctuation. */
  def punctRatio(textCol: Column): Column =
    (charLength(textCol) -
      length(regexp_replace(textCol, "[\\p{Punct}]", "")).cast("long"))
      .cast("double") / greatest(charLength(textCol), lit(1L)).cast("double")

  private val stopwords =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** The stopword lexicon, exposed so value-level oracles can embed the
    * identical list (stopwordRatio, RAKE phrase boundaries). */
  private[graft] def stopwordList: Seq[String] = stopwords

  /** Fraction of tokens that are (English) stopwords — a classic quality
    * signal: natural prose has ~0.3+, keyword soup near 0. */
  def stopwordRatio(textCol: Column): Column = stopwordRatioOf(tokens(textCol))

  /** Token-column variant: callers that derive several statistics should
    * tokenize once and reuse the column (multi-referenced non-trivial
    * expressions are not inlined by CollapseProject, so the regex split
    * runs once per row instead of once per statistic). */
  def stopwordRatioOf(toks: Column): Column =
    size(filter(toks, t => t.isin(stopwords: _*))).cast("double") /
      greatest(size(toks), lit(1)).cast("double")

  /** Mean token length — detects tokenization breakage / binary junk. */
  def meanTokenLen(textCol: Column): Column =
    meanTokenLenOf(charLength(textCol), tokens(textCol))

  def meanTokenLenOf(charLen: Column, toks: Column): Column =
    (charLen - size(toks).cast("long") + 1L).cast("double") /
      greatest(size(toks).cast("long"), lit(1L)).cast("double")

  /** Composite quality score in [0,1]: length in a sane band, some
    * stopwords, plausible mean token length, low punctuation noise. */
  def qualityScore(textCol: Column): Column =
    qualityScoreOf(charLength(textCol), tokens(textCol), punctRatio(textCol))

  /** Precomputed-column variant (see stopwordRatioOf). */
  def qualityScoreOf(charLen: Column, toks: Column, punct: Column): Column = {
    val lenOk = when(charLen.between(20, 100000), 1.0).otherwise(0.0)
    val stopOk = least(stopwordRatioOf(toks) * lit(5.0), lit(1.0))
    val tokOk = when(meanTokenLenOf(charLen, toks).between(2.0, 12.0), 1.0).otherwise(0.0)
    val punctOk = lit(1.0) - least(punct * lit(4.0), lit(1.0))
    (lenOk + stopOk + tokOk + punctOk) / lit(4.0)
  }

  /** Tiny per-language marker lexicons (public-knowledge function words).
    * An n-gram-free heuristic language ID: score = matching tokens per
    * language, argmax wins, ties → "und". */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "en", "que", "por"))

  def langId(textCol: Column): Column = langIdOf(tokens(textCol))

  /** One fused-kernel pass over the token array (marker→language-bitmask
    * probe per token) — the per-language `filter(toks, isin(...))` HOF
    * chain this replaces was CodegenFallback and re-walked the array
    * once per language (the [[graft.operators.Bloom]] lesson again).
    * Identical semantics, spec- and oracle-pinned: argmax of marker
    * counts, ties to the larger language code, zero matches → "und",
    * NULL tokens → "und". */
  def langIdOf(toks: Column): Column =
    coalesce(graft.operators.marker_lang_id(toks, langMarkers), lit("und"))

  /** Per-language weighted character-n-gram profiles (Cavnar–Trenkle 1994
    * style: the public-knowledge most-frequent char trigrams of each
    * language, space-padded for word boundaries, rank-weighted). ASCII
    * only so the literals survive every transport identically. Shared
    * with the verify oracle, which inlines these rows as a VALUES table. */
  val LangNgramProfiles: Seq[(String, Seq[(String, Int)])] = Seq(
    "de" -> Seq("der" -> 12, " de" -> 11, "ie " -> 10, "ein" -> 9, "ich" -> 8,
      "sch" -> 7, "und" -> 6, "che" -> 5, "ung" -> 4, "nde" -> 3, "die" -> 2, " un" -> 1),
    "en" -> Seq("the" -> 12, " th" -> 11, "he " -> 10, "ing" -> 9, "and" -> 8,
      " an" -> 7, " of" -> 6, "of " -> 5, "ion" -> 4, "ed " -> 3, " to" -> 2, "to " -> 1),
    "es" -> Seq(" de" -> 12, "de " -> 11, "os " -> 10, " la" -> 9, "la " -> 8,
      "el " -> 7, " el" -> 6, "que" -> 5, " qu" -> 4, "cion" -> 3, "ado" -> 2, "ent" -> 1),
    "fr" -> Seq(" de" -> 12, "es " -> 11, "de " -> 10, "ent" -> 9, "le " -> 8,
      " le" -> 7, "nt " -> 6, " la" -> 5, "la " -> 4, "que" -> 3, " qu" -> 2, "eur" -> 1))

  /** Character-n-gram language ID: score(lang) = Σ over profile grams of
    * (non-overlapping occurrence count × rank weight) in the space-padded
    * lowercased text; argmax wins (score ties → later language string —
    * greatest(struct) semantics), all-zero → "und". Counting is the
    * replace-shrinkage identity count(g) = (len(t) − len(replace(t,g,'')))
    * / len(g) — pure integer arithmetic over codegen'd string built-ins,
    * so the whole classifier is a narrow scan-speed expression with a
    * value-exact SQL replica (DuckDB `replace` removes the same
    * left-to-right non-overlapping occurrences). Catches what the marker
    * lexicon (langId) misses: inflected forms, subword signals, and text
    * where function words are rare. */
  def langIdNgram(textCol: Column): Column = {
    val padded = concat(lit(" "), lower(textCol), lit(" "))
    val scores = LangNgramProfiles.map { case (lang, grams) =>
      val score = grams.map { case (g, w) =>
        ((length(padded) - length(replace(padded, lit(g), lit("")))) / lit(g.length))
          .cast("int") * lit(w)
      }.reduce(_ + _)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best.getField("score") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** GPT-2-style pre-tokenizer pattern (contractions, space-prefixed
    * letter/digit runs, punctuation runs). Deliberately lookahead-free AND
    * \s-free so the same pattern behaves identically under java.util.regex
    * and RE2 (the DuckDB oracle): Java's \s includes U+000B, RE2's does
    * not, so the whitespace set is spelled out explicitly. */
  val BpeTokenPattern: String =
    "'(?:[sdmt]|ll|ve|re)| ?\\p{L}+| ?\\p{N}+| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+"

  /** Token count under the BPE-ish pre-tokenizer — the number an LLM data
    * pipeline budgets by, vs the whitespace count quality heuristics use.
    * regexp_count counts in one pass without materializing the matches. */
  def bpeTokenCount(textCol: Column): Column =
    regexp_count(textCol, lit(BpeTokenPattern)).cast("long")

  /** Flesch reading-ease scoring [Flesch 1948; Kincaid et al. 1975 for
    * the grade form] — the readability screen an edu-quality curation
    * pass runs (textbook-style corpora select HIGH ease at fixed topic).
    * Every ingredient is a deterministic one-pass regexp_count over the
    * raw text (no NLP model, replayable in any regex engine on the
    * ASCII corpus): words = non-space runs, sentences = [.!?] runs
    * (floored at 1 so fragments score instead of dividing by zero),
    * syllables ≈ [aeiouy]+ vowel GROUPS — the standard counting proxy,
    * documented as such; no per-word 1-clamp, so the count is a pure
    * corpus statistic. Score = 206.835 − 1.015·(W/S) − 84.6·(V/W) in
    * fixed double op order, NULL for wordless rows. Returns
    * `(idCol, n_words, n_sentences, n_vowel_runs, flesch)` — one
    * narrow codegen scan, no shuffle. */
  def readability(
      df: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    val w = regexp_count(col(textCol), lit("[^ ]+")).cast("long")
    val sRaw = regexp_count(col(textCol), lit("[.!?]+")).cast("long")
    val v = regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long")
    df.where(col(textCol).isNotNull)
      .select(col(idCol), w.as("n_words"),
        greatest(sRaw, lit(1L)).as("n_sentences"), v.as("n_vowel_runs"))
      .withColumn("flesch",
        when(col("n_words") > 0,
          lit(206.835) -
            lit(1.015) * (col("n_words").cast("double") /
              col("n_sentences").cast("double")) -
            lit(84.6) * (col("n_vowel_runs").cast("double") /
              col("n_words").cast("double")))
          .otherwise(lit(null).cast("double")))
  }

  /** One learned BPE merge: rank, the fused pair, and its corpus-weighted
    * adjacency count at the time it was chosen. */
  case class BpeMerge(merge_idx: Int, lhs: String, rhs: String, pair_count: Long)

  /** Greedy left-to-right application of one merge to a symbol sequence:
    * scan once, fuse (l, r) whenever the current two symbols match, then
    * continue AFTER the fused pair — so a run like a,a,a under merge
    * (a,a) becomes (aa),a, and a,a,a,a,a becomes (aa),(aa),a. This is the
    * published BPE semantics (Sennrich et al. 2016) and the oracle
    * replays it as even-offset selection within consecutive-match
    * islands. */
  private[graft] def applyMerge(
      syms: IndexedSeq[String], l: String, r: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** DISTRIBUTED BPE tokenizer training (byte-pair encoding merge
    * learning, Sennrich et al. 2016 re-expressed Spark-first): learn
    * `numMerges` merges from the corpus and return the merge table.
    *
    * The published algorithm's key scale property is that after ONE
    * corpus scan (word → count), every iteration runs on the DISTINCT
    * word vocabulary, which is orders of magnitude smaller than the
    * corpus (Heaps' law: ~millions of distinct words for 100 TB of
    * text). Each iteration: (1) adjacent-pair counts over the vocab,
    * weighted by word frequency — a flatMap + one small shuffle on the
    * pair key; (2) argmax pair, ties broken (count desc, lhs asc, rhs
    * asc) so the learned table is deterministic; (3) greedy merge applied
    * to each word's symbol sequence — a narrow distributed map. The
    * corpus itself is touched exactly once; driver traffic is one
    * (pair, count) row per iteration.
    *
    * Iterations chain `numMerges` narrow maps onto the vocab lineage —
    * fine for the hundreds-of-merges range; production 32k-merge runs
    * should periodically checkpoint the vocab like
    * [[graft.operators.Dedup.duplicateClusters]] does. */
  def bpeTrain(
      df: DataFrame,
      textCol: String,
      numMerges: Int): Seq[BpeMerge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val spark = df.sparkSession
    import spark.implicits._
    var vocab: org.apache.spark.sql.Dataset[(IndexedSeq[String], Long)] =
      df.select(explode(split(col(textCol), " ")).as("__w"))
        .where(length(col("__w")) > 0)
        .groupBy(col("__w")).agg(count(lit(1)).cast("long").as("__c"))
        .as[(String, Long)]
        .map { case (w, c) => (w.map(_.toString).toIndexedSeq, c) }
    vocab.persist()
    val merges = scala.collection.mutable.ArrayBuffer[BpeMerge]()
    var it = 0
    var exhausted = false
    while (it < numMerges && !exhausted) {
      val top = vocab.flatMap { case (syms, c) =>
          if (syms.length < 2) Iterator.empty
          else syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, c))
        }
        .toDF("l", "r", "c")
        .groupBy(col("l"), col("r")).agg(sum(col("c")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true // every word fused to one symbol
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += BpeMerge(it, l, r, c)
        val prev = vocab
        vocab = vocab.map { case (syms, cnt) => (applyMerge(syms, l, r), cnt) }
        vocab.persist()
        vocab.count() // materialize before dropping the parent's cache
        prev.unpersist()
        it += 1
      }
    }
    vocab.unpersist()
    merges.toSeq
  }

  /** PRODUCTION-SCALE BPE training: collect the DISTINCT-WORD histogram
    * once (bounded: Heaps' law puts it in the low millions for 100 TB of
    * text — `maxVocab` guards the collect loudly) and run the merge loop
    * DRIVER-LOCAL with an incremental pair→words index, so learning 32k
    * merges costs one Spark job plus local compute instead of
    * [[bpeTrain]]'s one-cluster-job-per-merge (30k sequential jobs is a
    * latency wall no executor count shrinks — the round-13 VERDICT's
    * diagnosis). Per merge: argmax over live pair counts with the SAME
    * deterministic tie rule (count desc, lhs asc, rhs asc), then only
    * the words CONTAINING the winning pair are re-segmented (the
    * pair→words index makes that lookup O(1)) with their old/new
    * adjacent-pair multisets diffed into the counts — exact bookkeeping,
    * no decay heuristics.
    *
    * EXACTLY equivalent to [[bpeTrain]] (spec-pinned merge-table
    * equality, including overlap counting — "aaa" contributes (a,a)
    * twice — and the greedy left-to-right [[applyMerge]], which is
    * shared). Use bpeTrain when the distinct vocabulary itself cannot
    * fit one machine; use this everywhere else. */
  def bpeTrainLocal(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 5000000): Seq[BpeMerge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val hist = df.select(explode(split(col(textCol), " ")).as("__w"))
      .where(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).cast("long").as("__c"))
      .limit(maxVocab + 1)
      .collect()
    require(hist.length <= maxVocab,
      s"distinct vocabulary exceeds maxVocab=$maxVocab — raise the bound " +
        "or fall back to the distributed bpeTrain")
    bpeMergeLoop(
      hist.map(r => r.getString(0).map(_.toString).toIndexedSeq),
      hist.map(_.getLong(1)), numMerges)
  }

  /** The driver-local incremental merge loop shared by [[bpeTrainLocal]]
    * (char symbols over whitespace words) and [[bpeTrainBytes]] (byte
    * symbols over regex pre-tokens): exact pair→count bookkeeping with a
    * pair→words occurrence index, argmax by live-map scan, deterministic
    * (count desc, lhs asc, rhs asc) tie rule. */
  private def bpeMergeLoop(
      words0: Array[IndexedSeq[String]],
      wc: Array[Long],
      numMerges: Int): Seq[BpeMerge] = {
    val words = words0.clone()
    def pairsOf(syms: IndexedSeq[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else syms.iterator.zip(syms.iterator.drop(1))
    val pc = new java.util.HashMap[(String, String), Long]()
    val occ = new java.util.HashMap[(String, String), java.util.BitSet]()
    def bump(p: (String, String), delta: Long): Long = {
      val v = pc.merge(p, delta, (a, b) => a + b)
      if (v <= 0L) { pc.remove(p); occ.remove(p) }
      v
    }
    var wi = 0
    while (wi < words.length) {
      pairsOf(words(wi)).foreach { p =>
        bump(p, wc(wi))
        occ.computeIfAbsent(p, _ => new java.util.BitSet()).set(wi)
      }
      wi += 1
    }
    val merges = scala.collection.mutable.ArrayBuffer[BpeMerge]()
    var it = 0
    var exhausted = false
    while (it < numMerges && !exhausted) {
      // argmax by full scan of the live pair map — measured FASTER here
      // than a lazy-deletion heap: big early merges re-pair every word
      // they touch, and the heap pays log-cost per re-paired occurrence
      // (hundreds of millions of pushes) while the scan pays |pc| per
      // merge (1k merges over a 200k-word histogram: 47 s scan vs 390 s
      // heap, measured)
      var best: (String, String) = null
      var bestC = -1L
      val e = pc.entrySet().iterator()
      while (e.hasNext) {
        val kv = e.next()
        val c = kv.getValue
        if (c > bestC || (c == bestC && {
          val p = kv.getKey
          val cmp = p._1.compareTo(best._1)
          cmp < 0 || (cmp == 0 && p._2.compareTo(best._2) < 0)
        })) { best = kv.getKey; bestC = c }
      }
      if (best == null) exhausted = true
      else {
        merges += BpeMerge(it, best._1, best._2, bestC)
        val members = occ.get(best)
        var w = members.nextSetBit(0)
        while (w >= 0) {
          val before = words(w)
          val after = applyMerge(before, best._1, best._2)
          words(w) = after
          val c = wc(w)
          // exact diff of the word's adjacent-pair multiset
          pairsOf(before).foreach(bump(_, -c))
          pairsOf(after).foreach { p =>
            bump(p, c)
            occ.computeIfAbsent(p, _ => new java.util.BitSet()).set(w)
          }
          w = members.nextSetBit(w + 1)
        }
        it += 1
      }
    }
    merges.toSeq
  }

  /** Tokenize the corpus with a LEARNED merge table ([[bpeTrain]]'s
    * output): per document, each whitespace word is split to characters
    * and the merges are applied in rank order (the standard BPE encode),
    * and the document's total post-merge symbol count is emitted — the
    * number a pipeline budgets with once the real tokenizer is trained,
    * vs [[bpeTokenCount]]'s pre-tokenizer estimate.
    *
    * Scale shape: the merge table is tiny (≤ vocab size) and rides as a
    * broadcast; segmentation is a narrow mapPartitions with a per-task
    * word → count memo (Zipf: a few thousand distinct words cover almost
    * every token, so the merge loop runs once per distinct word per
    * task, not once per occurrence). No shuffle. */
  def bpeSegment(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.merge_idx).map(m => (m.lhs, m.rhs)).toArray
    val bc = spark.sparkContext.broadcast(ordered)
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Long]()
        def wordTokens(w: String): Long = {
          val hit = memo.get(w)
          if (hit != 0L) hit
          else {
            var syms: IndexedSeq[String] = w.map(_.toString).toIndexedSeq
            var i = 0
            val ms = bc.value
            while (i < ms.length) {
              syms = applyMerge(syms, ms(i)._1, ms(i)._2); i += 1
            }
            val n = syms.length.toLong
            memo.put(w, n)
            n
          }
        }
        it.map { case (id, t) =>
          var total = 0L
          if (t != null) {
            for (w <- t.split(" ")) if (w.nonEmpty) total += wordTokens(w)
          }
          (id, total)
        }
      }
      .toDF("doc_id", "bpe_tokens")
  }

  /** Byte-level BPE pre-tokenizer (the GPT-2/tiktoken shape):
    * [[BpeTokenPattern]]'s contraction / space-prefixed letter / digit /
    * punctuation branches PLUS a whitespace-run branch, so the matches
    * form a PARTITION of the text — every byte lands in exactly one
    * pre-token, which is what makes decode(encode(x)) == x exact with no
    * normalization step. GPT-2's published pattern differs only in using
    * `\s+(?!\S)` to split a multi-space run one space earlier — a
    * boundary choice, not a coverage one — and that lookahead does not
    * exist in RE2, so the oracle could never replay it; this variant
    * behaves identically under java.util.regex and RE2. */
  val ByteBpePattern: String = BpeTokenPattern + "|[ \\t\\n\\x0B\\f\\r]+"

  /** UTF-8 bytes of a pre-token as one symbol per BYTE (char 0x00–0xFF
    * carries the byte value — the latin-1 trick GPT-2's byte encoder
    * plays with a printable alphabet; symbol CONCATENATION is then byte
    * concatenation, so [[applyMerge]] works unchanged). */
  private[graft] def byteSyms(w: String): IndexedSeq[String] =
    w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => (b & 0xFF).toChar.toString).toIndexedSeq

  /** Inverse of [[byteSyms]] concatenation: symbols → bytes → UTF-8
    * string. decode(encode(x)) == x for EVERY x because the pre-token
    * matches partition the text and merges only ever concatenate. */
  private[graft] def byteSymsDecode(tokens: Seq[String]): String = {
    val out = new java.io.ByteArrayOutputStream()
    tokens.foreach(_.foreach(c => out.write(c.toInt & 0xFF)))
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** BYTE-LEVEL BPE training (the tokenizer family GPT-2/tiktoken-style
    * LLM pipelines actually run): pre-tokenize with [[ByteBpePattern]],
    * split each distinct pre-token into 256-alphabet byte symbols, learn
    * merges over byte pairs with the [[bpeTrainLocal]] production loop.
    * No UNK is possible by construction — any input byte is a base
    * symbol. Same scale shape as bpeTrainLocal: ONE distributed
    * histogram job (regexp_extract_all + groupBy — the corpus never
    * collects), then driver-local exact merge bookkeeping over the
    * bounded distinct-pre-token vocabulary. */
  def bpeTrainBytes(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxVocab: Int = 5000000): Seq[BpeMerge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val hist = df
      .select(explode(regexp_extract_all(col(textCol),
        lit(ByteBpePattern), lit(0))).as("__w"))
      .where(length(col("__w")) > 0)
      .groupBy(col("__w")).agg(count(lit(1)).cast("long").as("__c"))
      .limit(maxVocab + 1)
      .collect()
    require(hist.length <= maxVocab,
      s"distinct pre-token vocabulary exceeds maxVocab=$maxVocab")
    bpeMergeLoop(hist.map(r => byteSyms(r.getString(0))),
      hist.map(_.getLong(1)), numMerges)
  }

  /** Encode ONE string with a learned byte-merge table: pre-tokenize,
    * byte symbols, merges in rank order. The returned tokens concatenate
    * back to the input ([[byteSymsDecode]]) — spec-pinned. */
  private[graft] def bpeEncodeBytes(
      text: String, merges: Seq[BpeMerge]): Seq[String] = {
    val ordered = merges.sortBy(_.merge_idx).map(m => (m.lhs, m.rhs))
    val mm = java.util.regex.Pattern.compile(ByteBpePattern).matcher(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (mm.find()) {
      var syms = byteSyms(mm.group())
      ordered.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
      out ++= syms
    }
    out.toSeq
  }

  /** Tokenize the corpus with a learned BYTE-merge table: per document,
    * each [[ByteBpePattern]] pre-token encodes through the rank-ordered
    * merges; emits `(doc_id, pre_tokens, bpe_tokens)` — the byte-level
    * budget numbers. Same scale shape as [[bpeSegment]]: broadcast merge
    * table, narrow mapPartitions with a per-task pre-token memo, no
    * shuffle. */
  def bpeSegmentBytes(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.merge_idx).map(m => (m.lhs, m.rhs)).toArray
    val bc = spark.sparkContext.broadcast(ordered)
    val pat = ByteBpePattern
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val re = java.util.regex.Pattern.compile(pat)
        val memo = new java.util.HashMap[String, Long]()
        def tokensOf(w: String): Long = {
          val hit = memo.get(w)
          if (hit != 0L) hit
          else {
            var syms = byteSyms(w)
            val ms = bc.value
            var i = 0
            while (i < ms.length) {
              syms = applyMerge(syms, ms(i)._1, ms(i)._2); i += 1
            }
            val n = syms.length.toLong
            memo.put(w, n)
            n
          }
        }
        it.map { case (id, t) =>
          var pre = 0L
          var total = 0L
          if (t != null) {
            val m = re.matcher(t)
            while (m.find()) { pre += 1; total += tokensOf(m.group()) }
          }
          (id, pre, total)
        }
      }
      .toDF("doc_id", "pre_tokens", "bpe_tokens")
  }

  /** TOKEN-ID encoding with a learned byte-merge table — the artifact a
    * training pipeline actually materializes before sequence packing:
    * ids 0..255 are the byte alphabet, id 256+i is merge i's fused
    * symbol (first-wins when two merges concat to the same string — the
    * symbol IS the string post-merge, so the id must be a function of
    * it). Emits `(doc_id, n_tokens, ids_str)` with ids space-joined in
    * document order; NULL/empty text → (0, ""). Same scale shape as
    * [[bpeSegmentBytes]]: broadcast table, narrow memoized
    * mapPartitions, no shuffle. */
  def bpeEncodeIdsDf(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[BpeMerge]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ordered = merges.sortBy(_.merge_idx).map(m => (m.lhs, m.rhs, m.merge_idx)).toArray
    val bc = spark.sparkContext.broadcast(ordered)
    val pat = ByteBpePattern
    df.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("__t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val re = java.util.regex.Pattern.compile(pat)
        val ms = bc.value
        val symId = new java.util.HashMap[String, Integer]()
        ms.foreach { case (l, r, i) => symId.putIfAbsent(l + r, 256 + i) }
        val memo = new java.util.HashMap[String, Array[Int]]()
        def idsOf(w: String): Array[Int] = {
          val hit = memo.get(w)
          if (hit != null) hit
          else {
            var syms = byteSyms(w)
            var i = 0
            while (i < ms.length) {
              syms = applyMerge(syms, ms(i)._1, ms(i)._2); i += 1
            }
            val out = syms.map { s =>
              if (s.length == 1) s.charAt(0).toInt
              else symId.get(s).intValue() // every multi-char symbol is a merge result
            }.toArray
            memo.put(w, out)
            out
          }
        }
        it.map { case (id, t) =>
          val sb = new java.lang.StringBuilder()
          var n = 0L
          if (t != null) {
            val m = re.matcher(t)
            while (m.find()) {
              idsOf(m.group()).foreach { tid =>
                if (sb.length > 0) sb.append(' ')
                sb.append(tid)
                n += 1
              }
            }
          }
          (id, n, sb.toString)
        }
      }
      .toDF("doc_id", "n_tokens", "ids_str")
  }

  /** Per-document TF-IDF keyword extraction: the top `k` terms of every
    * document by tf·idf — the classic corpus-keyword / topic-tagging
    * step (and the per-document complement of [[bm25TopK]]'s per-query
    * retrieval). idf = ln(N) − ln(df): integer ln arguments, the same
    * cross-engine-exact evaluation [[bm25TopK]] uses (exact through
    * df, N < 9170 per the verified libm agreement range — far above any
    * oracle scale).
    *
    * Scale shape: explode to (doc, term) pairs → one aggregation
    * exchange keyed (doc, term) for tf → a term-keyed join against the
    * document-frequency table (co-keyed shuffle; the df table is
    * vocab-sized) → a per-doc window for the top-k. The corpus text
    * itself travels once, into the first aggregation. Ties break
    * (score desc, term asc) so the kept set is deterministic. */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"k must be >= 1, got $k")
    val pairs = df.select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .where(length(col("term")) > 0)
    val tf = pairs.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).cast("long").as("tf"))
    val dfT = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
    val n = df.select(count(lit(1)).cast("long").as("n"))
    val scored = tf.join(dfT, "term").crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"), col("tf"),
        (col("tf").cast("double") *
          (graft.operators.math_ln(col("n").cast("double")) -
            graft.operators.math_ln(col("df").cast("double"))))
          .as("score"))
    scored
      .withColumn("__rn", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term"))))
      .where(col("__rn") <= k)
      .select(col("doc_id"), col("__rn").cast("int").as("rank"),
        col("term"), col("tf"), col("score"))
  }

  /** 64-bit FNV-1a content fingerprint (see Fnv1a64). */
  def fingerprint(textCol: Column): Column = fnv1a64(textCol)

  /** Winnowing fingerprint table (see [[WinnowFingerprints]]): one row
    * per SELECTED k-gram — (id, pos, fp) — ~2/(w+1) of the grams, with
    * the guarantee that any cross-document substring match of
    * ≥ w + k − 1 bytes shares at least one fp. Narrow one-pass kernel
    * scan: the 100 TB shape is "fingerprint once, persist, join many". */
  def winnowFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 16): DataFrame = {
    val fps = GraftSqlShim.column(
      WinnowFingerprints(GraftSqlShim.expression(col(textCol)), k, w))
    df.where(col(textCol).isNotNull)
      .select(col(idCol).as("id"), explode(fps).as("s"))
      .select(col("id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
  }

  /** Substring-overlap candidate pairs from shared winnowing
    * fingerprints (the MOSS report shape): documents are paired when
    * they share ≥ `minShared` DISTINCT selected fingerprints, counted
    * over fingerprints whose document frequency is ≤ `maxDf` —
    * boilerplate grams selected by half the corpus carry no overlap
    * signal and would otherwise make the fp-join quadratic (the
    * standard MOSS noise-gram drop; lossy by design, documented).
    * Returns (id_a, id_b, n_shared), id_a < id_b. One shuffle on fp for
    * the postings join, one on the pair for the count — both equi-joins
    * with df-bounded postings, so the pair stage is AQE-splittable. */
  def winnowOverlapPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 16,
      minShared: Int = 2,
      maxDf: Int = 100): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 2, s"maxDf must be >= 2 (a df-1 fp can never pair), got $maxDf")
    val fps = winnowFingerprints(df, idCol, textCol, k, w)
      .select(col("id"), col("fp")).distinct()
    val kept = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf).select("fp")
    val posting = fps.join(kept, "fp")
    val a = posting.as("a")
    val b = posting.as("b")
    a.join(b, col("a.fp") === col("b.fp") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** PII patterns usable under BOTH java.util.regex and RE2 (the DuckDB
    * oracle): no lookaround, no backreferences, explicit classes. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\+?[0-9]{1,3}[- ]?\\(?[0-9]{3}\\)?[- ][0-9]{3}[- ][0-9]{4}"

  /** Deterministic PII scrubbing — emails then phone numbers replaced with
    * a marker. A narrow regexp_replace chain: codegen'd, scan-speed, no
    * shuffle; the building block every compliance-scrub stage needs
    * before text lands in a training corpus. */
  def redactPii(textCol: Column, marker: String = "[PII]"): Column =
    regexp_replace(
      regexp_replace(textCol, EmailPattern, marker),
      PhonePattern, marker)

  /** Credit-card scrubbing with LUHN VALIDATION ([[LuhnRedact]]): digit
    * runs (optionally space/dash-grouped) of 13-19 digits are redacted
    * ONLY when the checksum validates — order ids, timestamps, and
    * phone numbers survive; card numbers don't. One stateless kernel
    * scan. Returns (id, redacted, n_spans, n_valid, digits_masked). */
  def redactCards(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      marker: String = "[CARD]"): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol), GraftSqlShim.column(LuhnRedact(
        GraftSqlShim.expression(col(textCol)), marker)).as("r"))
      .select(col(idCol), col("r.redacted").as("redacted"),
        col("r.n_spans").as("n_spans"), col("r.n_valid").as("n_valid"),
        col("r.digits_masked").as("digits_masked"))

  /** IBAN scrubbing with ISO-13616 mod-97 validation ([[IbanRedact]]):
    * uppercase-alphanumeric runs shaped like an IBAN (2 letters,
    * 2 check digits, 11-30 more) are redacted ONLY when the rearranged
    * letter-expanded digit stream folds to remainder 1 mod 97 — SKUs
    * and invoice codes survive. One stateless kernel scan. */
  def redactIbans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      marker: String = "[IBAN]"): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(col(idCol), GraftSqlShim.column(IbanRedact(
        GraftSqlShim.expression(col(textCol)), marker)).as("r"))
      .select(col(idCol), col("r.redacted").as("redacted"),
        col("r.n_spans").as("n_spans"), col("r.n_valid").as("n_valid"),
        col("r.chars_masked").as("chars_masked"))

  /** Okapi BM25 keyword retrieval: the exact top-k corpus documents for a
    * small bag of query terms — the lexical-search complement to the
    * embedding ANN family (quality-targeted corpus selection, eval-set
    * mining, "find me docs about X" curation queries).
    *
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    * idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)), summed in query-term
    * order. The idf is EVALUATED as ln(2N+2) − ln(2df+1) — the same
    * quantity, but with exact-INTEGER ln arguments, through the
    * [[graft.operators.MathLn]] kernel (`Math.log`): JVM Math.log and
    * libm ln agree bit-for-bit on integer arguments in the corpus-count
    * range (verified over 1..200000; the four disagreeing values 9170 /
    * 136837 / 141614 / 147674 are unreachable as 2N+2 or odd 2df+1 at
    * any oracle scale). Spark's BUILT-IN `ln` would not do: it evaluates
    * StrictMath.log (fdlibm), which diverges from libm on ~1% of
    * integers (first at x = 3) — and a fractional argument like
    * 1 + 106.5/394.5 diverges in the last ulp regardless. Every other
    * operand is an exact integer (tf, dl) or a fully-specified IEEE op,
    * so the DuckDB oracle replays scores bit-for-bit.
    *
    * Scale shape: NO inverted index is materialized — one narrow
    * codegen'd scan computes per-doc (dl, tf_t) via `array_remove` size
    * deltas (the term list is tiny and rides in the plan), one partial
    * aggregate reduces to a single corpus-stats row (N, Σdl, df_t) that
    * broadcast-joins back, and the top-k is a TakeOrdered (per-partition
    * heaps, driver merges k rows). Two passes over the corpus, zero wide
    * shuffles — at 100 TB the cost is two scans, not an index build.
    * Ties break by doc id, so the returned set is deterministic. */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size,
      s"queryTerms must be distinct, got $queryTerms")
    val terms = queryTerms.indices
    val tk = tokens(col(textCol))
    val withTf = df.select(
      col(idCol).cast("long").as("doc_id") +:
        size(tk).cast("long").as("__dl") +:
        queryTerms.zipWithIndex.map { case (t, i) =>
          // occurrences of t = length drop when every copy is removed —
          // ArrayRemove is codegen'd, unlike the higher-order filter()
          (size(tk) - size(array_remove(tk, lit(t)))).cast("long").as(s"__tf$i")
        }: _*)
    val stats = withTf.agg(
      count(lit(1)).cast("long").as("__n"),
      sum(col("__dl")).cast("long").as("__sdl") +:
        terms.map(i =>
          sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).cast("long")
            .as(s"__df$i")): _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val nD = col("__n").cast("double")
    val avgdl = col("__sdl").cast("double") / nD
    val dlD = col("__dl").cast("double")
    def contrib(i: Int): Column = {
      val tf = col(s"__tf$i").cast("double")
      val dfT = col(s"__df$i").cast("double")
      val idf = graft.operators.math_ln(nD * lit(2.0) + lit(2.0)) -
        graft.operators.math_ln(dfT * lit(2.0) + lit(1.0))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dlD / avgdl))
    }
    scored.select(col("doc_id"),
        terms.map(contrib).reduce(_ + _).as("score"))
      .where(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Sequence packing for pretraining: assign documents to fixed
    * token-budget bins, the offset way (a running token count per shard;
    * bin = floor(offset / budget)), which is how packed sample files are
    * actually laid out — a document may straddle a bin boundary, so a bin
    * can overflow by at most one document.
    *
    * Scale: deterministic shards (id mod shards) keep the running-sum
    * window partition-local — shards pack in parallel, no global sort.
    * Output: (id, n_tokens, shard, bin). */
  def packSequences(
      df: DataFrame,
      idCol: String,
      textCol: String,
      tokenBudget: Long,
      shards: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol), tokenCount(col(textCol)).as("n_tokens"),
        pmod(col(idCol), lit(shards)).cast("int").as("shard"))
      .withColumn("bin",
        floor(coalesce(sum(col("n_tokens")).over(w), lit(0L)) / tokenBudget))
  }

  /** Split documents into overlapping token-window chunks — the standard
    * pretraining/RAG prep step (context-length windows with an overlap so
    * no boundary information is lost). Windows start every
    * `chunkSize - overlap` tokens; the last window may be shorter; a doc
    * shorter than one chunk yields itself as its only chunk. The chunk
    * count is pure integer arithmetic
    * (`max(1, (n_tokens - overlap + stride - 1) div stride)`), so the
    * DuckDB oracle replays the exact chunk set. Narrow explode: output
    * size is corpus size × (1 + overlap fraction), no shuffle.
    * NULL-text docs yield no chunks (matching the oracle, whose
    * range(NULL) unnests to zero rows — there is nothing to chunk).
    * Output: (id, chunk_idx, chunk_text, chunk_tokens). */
  def chunkDocs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int,
      overlap: Int = 0): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val stride = chunkSize - overlap
    val toks = tokens(col(textCol))
    val n = size(toks)
    val nChunks = greatest(lit(1L),
      ((n - lit(overlap) + lit(stride) - lit(1)) / lit(stride)).cast("long"))
    df.where(col(textCol).isNotNull)
      .select(col(idCol), toks.as("__toks"), n.as("__n"), nChunks.as("__nc"))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(sequence(lit(0L), col("__nc") - lit(1L))).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx"),
        concat_ws(" ",
          slice(col("__toks"), (col("chunk_idx") * stride + 1).cast("int"), lit(chunkSize)))
          .as("chunk_text"),
        least(lit(chunkSize.toLong), col("__n") - col("chunk_idx") * stride)
          .cast("long").as("chunk_tokens"))
  }

  /** One-row corpus summary: counts, exact token-count percentiles
    * (linear interpolation — Spark `percentile`, not the approximate
    * sketch, so the numbers are oracle-comparable), and mean length.
    * One partial-aggregated pass; the percentile state is the only
    * per-group buffer and the group count is 1 — fine at any corpus
    * size where a single executor can hold the token-count column for
    * the final merge (use approx_percentile for a sketch-only variant
    * when even that is too much). */
  def corpusStats(df: DataFrame, textCol: String): DataFrame =
    df.select(tokenCount(col(textCol)).as("n_tokens"),
        charLength(col(textCol)).as("n_chars"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        expr("percentile(n_tokens, 0.5)").as("p50_tokens"),
        expr("percentile(n_tokens, 0.9)").as("p90_tokens"),
        expr("percentile(n_tokens, 0.99)").as("p99_tokens"),
        avg(col("n_chars")).as("mean_chars"))

  /** Vocabulary-growth checkpoints — the Heaps-law diagnostic behind
    * tokenizer/vocab sizing and "how much more data until the vocab
    * saturates" decisions [Heaps 1978]: for each id-order prefix
    * `doc_id <= cp`, the exact `(n_docs, n_tokens, n_vocab)` triple.
    * Sublinear vocab growth against token growth is the law itself;
    * emitting the exact integer curve (rather than a fitted exponent,
    * whose regression floats are not cross-engine-pinnable) keeps every
    * value oracle-comparable and lets the caller fit downstream.
    *
    * Scale shape: ONE token explode feeding a groupBy(token)
    * first-occurrence aggregate (the Zipf head collapses map-side;
    * state = vocabulary size, the thing being measured) plus a narrow
    * per-doc token count; each side then theta-joins against the
    * K-row checkpoint table (broadcast nested loop over K ≤ dozens —
    * each row evaluated against K thresholds, the K-fold work IS the
    * K-checkpoint ask). Checkpoints past the max id just repeat the
    * corpus totals. Returns `(cp, n_docs, n_tokens, n_vocab)`. */
  def vocabGrowth(
      df: DataFrame,
      idCol: String,
      textCol: String,
      checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty, "checkpoints must be non-empty")
    require(checkpoints.distinct.size == checkpoints.size,
      s"checkpoints must be distinct, got $checkpoints")
    val spark = df.sparkSession
    import spark.implicits._
    val cps = checkpoints.toDF("cp")
    val toks = df.select(col(idCol).cast("long").as("id"),
      explode(tokens(coalesce(col(textCol), lit("")))).as("tok"))
    val firsts = toks.groupBy(col("tok")).agg(min(col("id")).as("first_id"))
    val perDoc = df.select(col(idCol).cast("long").as("id"),
      size(tokens(coalesce(col(textCol), lit("")))).cast("long").as("n_toks"))
    // INNER theta-joins with the checkpoint table as the broadcast build
    // side (a left-outer from cps would force broadcasting the CORPUS
    // side — the preserved side of an outer BNL join cannot be the
    // build side); empty checkpoints reattach from the K-row cps table
    val docsSide = perDoc.join(broadcast(cps), col("id") <= col("cp"))
      .groupBy(col("cp"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
    val vocabSide = firsts.join(broadcast(cps), col("first_id") <= col("cp"))
      .groupBy(col("cp"))
      .agg(count(lit(1)).as("n_vocab"))
    cps.join(docsSide, Seq("cp"), "left").join(vocabSide, Seq("cp"), "left")
      .select(col("cp"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_vocab"), lit(0L)).as("n_vocab"))
  }

  /** Strict sliding word n-grams (every window of exactly `n` tokens;
    * docs shorter than `n` yield an empty list — unlike Dedup.shingles,
    * which degrades to one whole-doc shingle, matching its LSH role). */
  def slidingGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))

  // gram statistics run in the native GramRepStats kernel (exprs.scala):
  // the declarative equivalent (transform → array_sort → aggregate fold)
  // interprets three lambdas per gram and measured ~60× slower at 100k
  // docs. Semantics pinned by the repetitionStats spec: occurrence count
  // of the most frequent gram, ties → binary-smallest gram.

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models" §A1.1 — the public repetition-filter family): per document,
    *  - dup_line_frac: fraction of lines that are repeats of an earlier
    *    line in the same document,
    *  - dup_line_char_frac: fraction of line characters inside those
    *    repeated occurrences,
    *  - top2gram_char_frac: chars covered by the most frequent word
    *    2-gram / total text chars,
    *  - dup5gram_char_frac: chars inside beyond-first occurrences of
    *    duplicated word 5-grams / total text chars,
    *  - gopher_ok: all four under the paper's thresholds (0.30 / 0.20 /
    *    0.20 / 0.15).
    * Lines split on `lineSep`, words on space-or-`lineSep`. Every signal
    * is a narrow per-row expression over one tokenization — scan speed,
    * zero shuffles, and every division is exact-int / exact-int so the
    * doubles are bit-reproducible across engines. */
  def repetitionStats(
      df: DataFrame, idCol: String, textCol: String,
      lineSep: String = "\n"): DataFrame = {
    // lineSep is a literal separator — regex-quote it (words split on
    // space OR the separator)
    val sepRe = java.util.regex.Pattern.quote(lineSep)
    val base = df.select(
      col(idCol),
      length(col(textCol)).as("n_chars_rep"),
      split(col(textCol), sepRe).as("ls"),
      split(col(textCol), s"(?: |$sepRe)").as("toks"))
    val sorted = base.select(
      col(idCol), col("n_chars_rep"), col("ls"), col("toks"),
      array_distinct(col("ls")).as("dls"))
    val folded = sorted.select(
      col(idCol), col("n_chars_rep"),
      size(col("ls")).as("n_lines_i"),
      (size(col("ls")) - size(col("dls"))).as("dup_lines_i"),
      length(array_join(col("ls"), "")).as("line_chars_i"),
      (length(array_join(col("ls"), "")) - length(array_join(col("dls"), ""))).as("dup_line_chars_i"),
      gram_rep_stats(col("toks"), 2).as("st2"),
      gram_rep_stats(col("toks"), 5).as("st5"))
    val stats = folded.select(
      col(idCol),
      col("n_lines_i").cast("long").as("n_lines"),
      (col("dup_lines_i").cast("double") /
        greatest(col("n_lines_i"), lit(1)).cast("double")).as("dup_line_frac"),
      (col("dup_line_chars_i").cast("double") /
        greatest(col("line_chars_i"), lit(1)).cast("double")).as("dup_line_char_frac"),
      ((col("st2").getField("bestrun") * col("st2").getField("bestlen")).cast("double") /
        greatest(col("n_chars_rep"), lit(1)).cast("double")).as("top2gram_char_frac"),
      (col("st5").getField("dupchars").cast("double") /
        greatest(col("n_chars_rep"), lit(1)).cast("double")).as("dup5gram_char_frac"))
    stats.withColumn("gopher_ok",
      col("dup_line_frac") <= 0.30 && col("dup_line_char_frac") <= 0.20 &&
        col("top2gram_char_frac") <= 0.20 && col("dup5gram_char_frac") <= 0.15)
  }

  /** CCNet-style LM perplexity scoring (Wenzek et al. 2020, "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    * train a BIGRAM language model with add-one smoothing on a REFERENCE
    * corpus, then score every document by the average negative
    * log-likelihood (nats) of its token stream — improbable text
    * (gibberish, boilerplate, wrong-language) scores high and gets
    * filtered upstream of training. The first token scores against the
    * unigram distribution, every later token against
    * P(w | prev) = (c(prev, w) + 1) / (c(prev) + V), with V = distinct
    * reference unigrams + 1 (the unseen class).
    *
    * Returns `(idCol, n_scored, n_unseen, xent)` — scored positions
    * (= token count), transitions unseen in the reference (an exact
    * integer quality signal on its own), and the raw cross-entropy.
    * With `withModelFingerprint` a `model_fp` column is appended: the
    * per-doc xor-of-mix64 digest of the exact integer (pos, num, den)
    * stream xent is computed from — the cross-engine-verifiable surface
    * (integer ln arguments here can exceed the range where JVM and libm
    * `ln` agree bit-for-bit, so the oracle pins the integers and the ln
    * fold is spec-pinned instead).
    *
    * Determinism across engines: every smoothed numerator/denominator is
    * an exact INTEGER (add-one), so both engines take `ln` of identical
    * doubles, and the per-document sum folds in token-position order
    * (sort_array + the sequential `aggregate` HOF — the same
    * ordered-fold convention as the ANN oracles), never in shuffle
    * order.
    *
    * Scale shape: the count tables are partial-agg groupBys (the Zipf
    * head collapses map-side); scoring joins are shuffle equi-joins on
    * token keys (AQE skew-splits the hot stopword keys); the totals row
    * is a broadcast; the per-doc fold carries a document-bounded array.
    * CCNet trains the LM on a small curated reference — `ref` models
    * exactly that, so at 100 TB the model side of each join is the
    * smaller relation and broadcastable when the reference is. */
  def lmPerplexity(
      corpus: DataFrame,
      ref: DataFrame,
      idCol: String,
      textCol: String,
      withModelFingerprint: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val refToks = ref.select(col(idCol).as("rid"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val uni = refToks.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val totals = uni.agg(sum(col("c1")).as("n_total"),
      (count(lit(1)) + 1L).as("vocab"))
    val wRef = Window.partitionBy("rid").orderBy("pos")
    val big = refToks.withColumn("w1", lag("tok", 1).over(wRef))
      .where(col("w1").isNotNull)
      .groupBy(col("w1"), col("tok").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val docToks = corpus.select(col(idCol).as("id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
    val wDoc = Window.partitionBy("id").orderBy("pos")
    val scored = docToks
      .withColumn("prev", lag("tok", 1).over(wDoc))
      .join(uni.select(col("tok").as("prev"), col("c1").as("cp")), Seq("prev"), "left")
      .join(big.select(col("w1").as("prev"), col("w2").as("tok"), col("c2")),
        Seq("prev", "tok"), "left")
      .join(uni.select(col("tok"), col("c1").as("cu")), Seq("tok"), "left")
      .crossJoin(broadcast(totals))
    val num = when(col("pos") === 0, coalesce(col("cu"), lit(0L)) + 1L)
      .otherwise(coalesce(col("c2"), lit(0L)) + 1L)
    val den = when(col("pos") === 0, col("n_total") + col("vocab"))
      .otherwise(coalesce(col("cp"), lit(0L)) + col("vocab"))
    val lp = graft.operators.math_ln(num.cast("double")) -
      graft.operators.math_ln(den.cast("double"))
    // model fingerprint: xor-of-mix64 over the exact INTEGER (pos, num,
    // den) stream xent is a pure function of — an order-free per-doc
    // digest both engines compute identically, so the oracle can pin the
    // full model surface without taking ln of large arguments (where
    // JVM/libm diverge in the last ulp — the q_pmi lesson; the ln fold
    // itself is spec-pinned on exact hand-computed probabilities)
    val fpH = graft.operators.mix64(col("pos").cast("long"), 1L)
      .bitwiseXOR(graft.operators.mix64(num, 2L))
      .bitwiseXOR(graft.operators.mix64(den, 3L))
    val aggs = Seq(
      count(lit(1)).as("n_scored"),
      sum(when(col("pos") > 0 && col("c2").isNull, 1L).otherwise(0L)).as("n_unseen"),
      sort_array(collect_list(struct(col("pos"), lp.as("lp")))).as("arr")) ++
      (if (withModelFingerprint) Seq(expr("bit_xor(__fph)").as("model_fp"))
       else Nil)
    val outCols = Seq(col("id").as(idCol), col("n_scored"), col("n_unseen"),
      (-aggregate(transform(col("arr"), x => x.getField("lp")),
        lit(0.0), (a, x) => a + x) / col("n_scored")).as("xent")) ++
      (if (withModelFingerprint) Seq(col("model_fp")) else Nil)
    scored
      .withColumn("__fph", fpH)
      .groupBy(col("id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(outCols: _*)
  }

  /** Interpolated Kneser-Ney bigram model [Kneser & Ney 1995; Chen &
    * Goodman 1999] as an EXACT-RATIONAL probability table — the
    * state-of-the-art n-gram smoothing that add-one ([[lmPerplexity]],
    * CCNet-style) approximates from below: absolute discounting plus a
    * CONTINUATION-count back-off ("how many distinct contexts does w
    * follow?" — so "Francisco", frequent but only ever after "San",
    * gets a tiny back-off weight).
    *
    *   P(w|v) = (c(vw) − D)/c(v·) + D·N1+(v·)/c(v·) · N1+(·w)/N1+(··)
    *
    * with discount D = `discountNum`/`discountDen` (default 3/4, the
    * Chen-Goodman fixed discount), c(v·) = bigram tokens starting v,
    * N1+(v·)/N1+(·w) = distinct right/left neighbour types, N1+(··) =
    * total bigram types. Over one common denominator everything is
    * integer:
    *   num = (dd·c(vw) − dn)·N1+(··) + dn·N1+(v·)·N1+(·w)
    *   den = dd·c(v·)·N1+(··)
    * and the row is emitted gcd-REDUCED ([[LongGcd]] — distributed, no
    * collect), so any engine replaying the counts produces the
    * identical pair; no floats anywhere. Rows cover OBSERVED bigrams
    * (c ≥ 1 makes the discounted term positive); unseen-pair mass is
    * λ(v)·Pcont(w) with λ(v) = dn·N1+(v·)/(dd·c(v·)) — the spec proves
    * total mass sums to exactly 1 in rationals.
    *
    * Returns (w1, w2, c2, p_num, p_den). Scale shape: two keyed
    * aggregations over bigram/type keys (Zipf head collapses map-side),
    * equi-joins on w1/w2 (AQE-splittable), one broadcast single-row
    * total; the model rows never leave the cluster. */
  def kneserNeyBigrams(
      ref: DataFrame,
      idCol: String,
      textCol: String,
      discountNum: Int = 3,
      discountDen: Int = 4): DataFrame = {
    require(discountDen >= 1 && discountNum >= 1 && discountNum < discountDen,
      s"discount must be a rational in (0, 1), got $discountNum/$discountDen")
    import org.apache.spark.sql.expressions.Window
    val toks = ref.select(col(idCol).as("rid"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .where(length(col("tok")) > 0)
    val w = Window.partitionBy("rid").orderBy("pos")
    val big = toks.withColumn("w1", lag("tok", 1).over(w))
      .where(col("w1").isNotNull)
      .groupBy(col("w1"), col("tok").as("w2"))
      .agg(count(lit(1)).as("c2"))
    val left = big.groupBy(col("w1"))
      .agg(sum(col("c2")).as("cv"), count(lit(1)).as("n1v"))
    val right = big.groupBy(col("w2")).agg(count(lit(1)).as("n1w"))
    val total = big.agg(count(lit(1)).as("n1all"))
    val dn = lit(discountNum.toLong)
    val dd = lit(discountDen.toLong)
    // 64-bit ceiling, loud and COMPLETE: the products are computed in
    // decimal(38,0) — wide enough that no intermediate wraps — and each
    // result is range-checked BEFORE the long cast. A long-arithmetic
    // wrap that happens to land positive (or a wrapped numerator with a
    // healthy denominator) can therefore never emit a silently-wrong
    // fraction; corpora past ~2^31 bigram types need a wider variant.
    def dec(c: String) = col(c).cast("decimal(38,0)")
    val numD = (dd * dec("c2") - dn) * dec("n1all") + dn * dec("n1v") * dec("n1w")
    val denD = dd * dec("cv") * dec("n1all")
    val maxLong = lit(Long.MaxValue).cast("decimal(38,0)")
    def checkedLong(e: Column, what: String): Column =
      // decimal overflow surfaces as NULL under non-ANSI folding — treat
      // it identically to an out-of-range value (the inputs are NOT NULL
      // by construction: counts from groupBy over non-null tokens)
      when(e.isNull || e <= lit(0) || e > maxLong,
        raise_error(lit(s"kneserNeyBigrams: 64-bit overflow in the $what " +
          "product"))).otherwise(e.cast("long"))
    big.join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c2").cast("long").as("c2"),
        checkedLong(numD, "numerator").as("__num"),
        checkedLong(denD, "common-denominator").as("__den"))
      .withColumn("__g", GraftSqlShim.column(LongGcd(
        GraftSqlShim.expression(col("__num")),
        GraftSqlShim.expression(col("__den")))))
      .select(col("w1"), col("w2"), col("c2"),
        expr("__num div __g").as("p_num"),
        expr("__den div __g").as("p_den"))
  }

  /** Model-based quality filtering, fastText-style [Joulin et al. 2016]:
    * a hashed-n-gram LINEAR classifier over unigram + adjacent-bigram
    * features (see [[graft.operators.HashedLinearScore]]), the shape
    * CCNet/LLaMA-style pipelines use to keep "Wikipedia-like" pages.
    * The bucket→weight table here is a deterministic stand-in derived
    * from splitmix64 of the bucket id — production swaps in trained
    * weights (a broadcast array) without changing the plumbing.
    *
    * Returns `(idCol, n_feats, wsum, score, keep)`: the exact integer
    * feature count and weight sum, `score = wsum / 1000.0 / n_feats`
    * (two IEEE divisions of exact integers — bit-comparable across
    * engines, and the integer sum is shuffle-order-free), and
    * `keep = score > threshold`.
    *
    * Scale shape: one narrow scan, one fused codegen kernel per row, no
    * Exchange — scan-speed over any corpus size; the weight table is
    * O(1) state (or one broadcast when trained weights replace it). */
  def qualityClassify(
      df: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 1 << 20,
      threshold: Double = 0.0): DataFrame = {
    val score =
      col("st.wsum").cast("double") / lit(1000.0) / col("st.n_feats").cast("double")
    df.select(col(idCol),
        graft.operators.hashed_linear_score(
          tokens(coalesce(col(textCol), lit(""))), buckets).as("st"))
      .select(col(idCol),
        col("st.n_feats").as("n_feats"),
        col("st.wsum").as("wsum"),
        score.as("score"),
        (score > lit(threshold)).as("keep"))
  }

  /** Hashed unigram + adjacent-bigram feature buckets of a text column:
    * `(id, pos, b)` rows where pos enumerates the features in document
    * order (n unigrams then n−1 bigrams) and
    * b = splitmix64(fnv1a64(feature)) & (buckets−1) — the SAME feature
    * space as [[qualityClassify]]'s fused kernel, exposed row-wise for
    * operators that need per-feature access (training counts, scoring
    * joins). `buckets` must be a power of two. */
  private[operators] def featureBuckets(
      df: DataFrame, idCol: String, textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    val toks = tokens(coalesce(col(textCol), lit("")))
    df.select(col(idCol).as("id"),
        posexplode(concat(toks, slidingGrams(toks, 2))).as(Seq("pos", "f")))
      .select(col("id"), col("pos"),
        graft.operators.mix64(graft.operators.fnv1a64(col("f")), 0L)
          .bitwiseAND(lit(buckets.toLong - 1)).as("b"))
  }

  /** TRAINED model-based filtering: multinomial Naive Bayes with
    * add-one smoothing over the hashed unigram+bigram bucket space,
    * trained on a labeled reference slice (`labelCol`: boolean on
    * `ref`) and applied to the corpus — the classical fastText/CCNet
    * companion where [[qualityClassify]]'s fixed weights are replaced
    * by weights LEARNED from data. With V = distinct observed training
    * buckets + 1 (the unseen class — the same smoothing convention as
    * [[lmPerplexity]]; smoothing by the full bucket count B would
    * drown small-corpus counts and degenerate to the prior), per
    * bucket b:
    * w(b) = (ln(pos_b+1) − ln(posN+V)) − (ln(neg_b+1) − ln(negN+V)),
    * score = Σ_features w(bucket) + ln(nPos+1) − ln(nNeg+1),
    * keep = round(score, 4) > 0.
    *
    * Determinism across engines: every ln argument is an exact integer
    * (add-one counts), the per-document sum folds in feature-position
    * order (sort_array + sequential `aggregate` — the q_lm_ppl
    * convention), and the reported score rounds to 4 decimals.
    *
    * Scale shape (OPTIMIZATION r16 — the [[graft.operators.Curation.dsirScoreFused]]
    * discipline): training counts are one bucket-keyed partial-agg
    * groupBy over the (small) reference, COLLECTED into a dense
    * ≤ 2^20-entry weight array (bounded by `buckets` — same cap as
    * dsirTrain); scoring is then ONE narrow codegen'd
    * [[graft.operators.DsirScore]] kernel scan with the weights as
    * plan-literal data — zero Exchange, zero Join, no per-doc groupBy
    * over the corpus. The kernel folds w in featureBuckets' position
    * order and every per-bucket weight is computed with the identical
    * Math.log expression tree, so values are BIT-IDENTICAL to the
    * pre-r16 aggregation path (retained as [[nbClassifyAgg]];
    * spec-pinned). */
  def nbClassify(
      corpus: DataFrame,
      ref: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      buckets: Int = 1 << 16): DataFrame = {
    require(buckets >= 2 && buckets <= (1 << 20) &&
      (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two in [2, 2^20], got $buckets")
    val labels = ref.select(col(idCol).as("id"), col(labelCol).cast("boolean").as("y"))
    // training: the same (pc, nc) bucket counts as the aggregation path,
    // collected (≤ buckets rows of 24 B — the dsirTrain contract); the
    // ref side spreads first if under-partitioned (guide §2.5)
    val cntRows = featureBuckets(
        graft.operators.spreadIfNarrow(ref, idCol), idCol, textCol, buckets)
      .join(labels, "id")
      .groupBy("b")
      .agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("pc"),
        sum(when(col("y"), 0L).otherwise(1L)).as("nc"))
      .collect()
    var pn = 0L
    var nn = 0L
    cntRows.foreach { r => pn += r.getLong(1); nn += r.getLong(2) }
    val vocab = cntRows.length + 1L
    // per-bucket weights, replicating the aggregation path's expression
    // tree op-for-op (math_ln == Math.log; unseen buckets get the
    // pc = nc = 0 value — exactly what the LEFT join + coalesce yields)
    val lnPnV = Math.log((pn + vocab).toDouble)
    val lnNnV = Math.log((nn + vocab).toDouble)
    val wDefault = (Math.log(1.0) - lnPnV) - (Math.log(1.0) - lnNnV)
    val wArr = Array.fill(buckets)(wDefault)
    cntRows.foreach { r =>
      wArr(r.getLong(0).toInt) =
        (Math.log((r.getLong(1) + 1L).toDouble) - lnPnV) -
          (Math.log((r.getLong(2) + 1L).toDouble) - lnNnV)
    }
    // prior from the exact label counts (same ln args as the agg path)
    val lc = labels.agg(
      sum(when(col("y"), 1L).otherwise(0L)).as("np"),
      sum(when(col("y"), 0L).otherwise(1L)).as("nn")).head()
    val prior =
      Math.log(((if (lc.isNullAt(0)) 0L else lc.getLong(0)) + 1L).toDouble) -
        Math.log(((if (lc.isNullAt(1)) 0L else lc.getLong(1)) + 1L).toDouble)
    val st = graft.operators.dsir_score(
      tokens(coalesce(col(textCol), lit(""))), wArr)
    val score = col("st.wsum") + lit(prior)
    corpus.select(col(idCol), st.as("st"))
      .select(col(idCol), col("st.n_feats").as("n_feats"),
        round(score, 4).as("score"),
        (round(score, 4) > lit(0.0)).as("keep"))
  }

  /** The pre-r16 aggregation implementation of [[nbClassify]] —
    * retained verbatim as the independent reference the fused-vs-
    * aggregation bit-identity spec compares against. */
  private[graft] def nbClassifyAgg(
      corpus: DataFrame,
      ref: DataFrame,
      idCol: String,
      textCol: String,
      labelCol: String,
      buckets: Int = 1 << 16): DataFrame = {
    val labels = ref.select(col(idCol).as("id"), col(labelCol).cast("boolean").as("y"))
    val cnt = featureBuckets(ref, idCol, textCol, buckets)
      .join(labels, "id")
      .groupBy("b")
      .agg(
        sum(when(col("y"), 1L).otherwise(0L)).as("pc"),
        sum(when(col("y"), 0L).otherwise(1L)).as("nc"))
    val tot = cnt.agg(sum(col("pc")).as("pn"), sum(col("nc")).as("nn"),
      (count(lit(1)) + lit(1L)).as("vocab"))
    val pri = labels.agg(
      (graft.operators.math_ln((sum(when(col("y"), 1L).otherwise(0L)) + lit(1L)).cast("double")) -
        graft.operators.math_ln((sum(when(col("y"), 0L).otherwise(1L)) + lit(1L)).cast("double"))).as("prior"))
    val w =
      (graft.operators.math_ln((coalesce(col("pc"), lit(0L)) + lit(1L)).cast("double")) -
        graft.operators.math_ln((col("pn") + col("vocab")).cast("double"))) -
      (graft.operators.math_ln((coalesce(col("nc"), lit(0L)) + lit(1L)).cast("double")) -
        graft.operators.math_ln((col("nn") + col("vocab")).cast("double")))
    val score =
      aggregate(transform(col("arr"), x => x.getField("w")),
        lit(0.0), (a, x) => a + x) + col("prior")
    featureBuckets(corpus, idCol, textCol, buckets)
      .join(broadcast(cnt), Seq("b"), "left")
      .crossJoin(broadcast(tot))
      .groupBy(col("id"))
      .agg(
        count(lit(1)).as("n_feats"),
        sort_array(collect_list(struct(col("pos"), w.as("w")))).as("arr"))
      // the 1-row prior attaches AFTER the per-doc aggregate — carrying
      // it through the exploded feature rows would add a column to the
      // corpus-wide wide stage for a scalar
      .crossJoin(broadcast(pri))
      .select(col("id").as(idCol), col("n_feats"),
        round(score, 4).as("score"),
        (round(score, 4) > lit(0.0)).as("keep"))
  }

  /** Deterministic token-dropout augmentation (the word-dropout noising
    * of denoising/robustness objectives): token j of document i drops
    * when splitmix64(i·131071 + j + salt) mod 100 < ratePct — a pure
    * function of (doc, position, salt), so the SAME augmented corpus
    * reproduces on any engine, partitioning, or rerun, and different
    * salts give independent augmentation epochs without storing any of
    * them. The prime stride decorrelates position streams across docs.
    * All tokens of a short doc may drop (empty aug_text) — callers
    * filter on n_tokens if that matters. Narrow positional-lambda
    * filter, zero Exchange; the per-token lambda is interpreted, which
    * at ~100 ns/token is noise next to the scan. */
  def augmentDropout(
      df: DataFrame,
      idCol: String,
      textCol: String,
      ratePct: Int = 10,
      salt: Long = 4242L): DataFrame = {
    require(ratePct >= 0 && ratePct <= 100, s"ratePct out of range: $ratePct")
    // NULL text reads as "" (the qualityClassify convention): both
    // engines then see the single empty token, instead of Spark emitting
    // a size(NULL) = -1 row the oracle's unnest(NULL) would drop
    val toks = tokens(coalesce(col(textCol), lit("")))
    val kept = filter(toks, (_, i) =>
      pmod(graft.operators.mix64(
        col(idCol).cast("long") * 131071L + i.cast("long"), salt), lit(100L))
        >= ratePct)
    df.select(col(idCol),
        array_join(kept, " ").as("aug_text"),
        size(toks).cast("long").as("n_tokens"),
        (size(toks) - size(kept)).cast("long").as("n_dropped"))
  }

  /** Persisted inverted-index layout for repeated keyword retrieval: the
    * scale path [[bm25TopK]]'s scaladoc promises does not exist there.
    * Two tables under `path`:
    *
    *  - `postings`: one row per (term, doc) —
    *    `(term, doc_id, dl, tf, positions)` —
    *    PARTITIONED BY `tb = pmod(splitmix64(fnv1a64(term)), termBuckets)`
    *    and sorted by `(term, doc_id)` within each partition file, so a
    *    term lookup prunes to ONE directory (a physical partition column,
    *    not a derived expression — the knnJoinIvf lesson) and the term
    *    equality predicate row-group-skips inside it via min/max stats.
    *  - `meta`: one row `(n, sdl, term_buckets)` — the corpus stats
    *    [[bm25TopK]] recomputes per query with a full scan.
    *
    * `dl` uses the same `size(tokens(text))` convention as [[bm25TopK]]
    * (NULL text → NULL, skipped by the sum) and `n` counts ALL docs, so
    * `meta.(n, sdl)` equal the scan-based stats exactly and indexed
    * scores replay bit-for-bit.
    *
    * Scale shape: build = a narrow stats pass (meta) plus one explode +
    * one (term, doc) partial-agg shuffle + one write clustered by
    * bucket — O(corpus tokens) once,
    * amortized over every subsequent query; Zipf-head terms spread over
    * doc-id file splits (a posting list is splittable — it is rows, not
    * a blob). Query cost then scales with the MATCHED posting lists,
    * not the corpus ([[bm25TopKIndexed]]). */
  def buildInvertedIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      path: String,
      termBuckets: Int = 64): Unit = {
    require(termBuckets > 0, s"termBuckets must be positive, got $termBuckets")
    val tk = tokens(col(textCol))
    val docs = df.select(col(idCol).cast("long").as("doc_id"),
      tk.as("__tk"), size(tk).cast("long").as("dl"))
    docs.agg(count(lit(1)).cast("long").as("n"),
        coalesce(sum(col("dl")), lit(0L)).cast("long").as("sdl"))
      .withColumn("term_buckets", lit(termBuckets))
      .write.mode("overwrite").parquet(s"$path/meta")
    docs.select(col("doc_id"), col("dl"),
        posexplode(col("__tk")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("long").as("tf"),
        // POSITIONAL index: 0-based token offsets, sorted — phrase and
        // proximity queries ([[phraseSearch]]) need them; BM25 scoring
        // never reads the column (parquet prunes it from ReadSchema)
        sort_array(collect_list(col("pos").cast("long"))).as("positions"))
      .withColumn("tb",
        pmod(graft.operators.mix64(graft.operators.fnv1a64(col("term")), 0L),
          lit(termBuckets.toLong)).cast("int"))
      .repartition(col("tb"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")
  }

  /** Append a NEW document batch to an existing [[buildInvertedIndex]]
    * layout — the ingestion companion ([[graft.operators.Dedup.incrementalDedup]]'s
    * convention): batch postings land in the same bucket directories via
    * parquet append (a posting list is rows, so per-bucket files just
    * accumulate; re-sort/compact per bucket when file counts grow, the
    * compactShards pattern), and `meta` is rewritten with the additive
    * (n, sdl). Batch doc ids MUST be new — a re-ingested id would
    * duplicate its postings (screen with incrementalDedup first).
    *
    * Queries over an appended index equal a from-scratch build
    * (spec-pinned) because every query-time quantity is additive or
    * per-doc: n and sdl are sums, df is a postings count, tf/dl/
    * positions live on the doc's own rows.
    *
    * Crash safety: the meta rewrite is a [[compactInvertedIndex]]-style
    * backup-rename swap (write to a temp dir, rename meta → backup,
    * rename temp → meta, delete backup), so a crash at any point leaves
    * a readable meta at either the canonical or the backup path — never
    * a deleted-but-unwritten one. The remaining window is BETWEEN the
    * postings append committing and the meta swap: a crash there leaves
    * the old (n, sdl) alongside the new postings, silently skewing BM25
    * idf/avgdl until the append is re-run or meta is rebuilt from the
    * postings (`SELECT count(distinct doc_id), sum-of-per-doc dl`) —
    * closing it fully needs a transactional table format, out of scope
    * for a plain-parquet layout. */
  def appendToInvertedIndex(
      df: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit = {
    val spark = df.sparkSession
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val termBuckets = meta.getAs[Int]("term_buckets")
    val tk = tokens(col(textCol))
    val docs = df.select(col(idCol).cast("long").as("doc_id"),
      tk.as("__tk"), size(tk).cast("long").as("dl"))
    val delta = docs.agg(count(lit(1)).cast("long").as("n"),
      coalesce(sum(col("dl")), lit(0L)).cast("long").as("sdl")).collect()(0)
    docs.select(col("doc_id"), col("dl"),
        posexplode(col("__tk")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).cast("long").as("tf"),
        sort_array(collect_list(col("pos").cast("long"))).as("positions"))
      .withColumn("tb",
        pmod(graft.operators.mix64(graft.operators.fnv1a64(col("term")), 0L),
          lit(termBuckets.toLong)).cast("int"))
      .repartition(col("tb"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("append").partitionBy("tb").parquet(s"$path/postings")
    // crash-safe meta swap (mode("overwrite") deletes before writing — a
    // crash mid-rewrite would leave the index with no meta at all)
    val metaTmp = s"$path/meta__append_tmp"
    spark.range(1).select(
        lit(meta.getAs[Long]("n") + delta.getAs[Long]("n")).as("n"),
        lit(meta.getAs[Long]("sdl") + delta.getAs[Long]("sdl")).as("sdl"),
        lit(termBuckets).as("term_buckets"))
      .write.mode("overwrite").parquet(metaTmp)
    swapDirs(spark, metaTmp, s"$path/meta")
  }

  /** Backup-rename directory swap shared by the index maintenance ops
    * (here and [[graft.operators.Dedup.appendToTokenScreenIndex]]):
    * dst → dst__bak, tmp → dst, delete backup — the layout is readable at
    * either the canonical or the backup path at every instant. */
  private[graft] def swapDirs(
      spark: org.apache.spark.sql.SparkSession, tmp: String, dst: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    val bakPath = new org.apache.hadoop.fs.Path(dst + "__bak")
    val fs = tmpPath.getFileSystem(conf)
    fs.delete(bakPath, true)
    require(fs.rename(dstPath, bakPath), s"rename $dst -> $bakPath failed")
    require(fs.rename(tmpPath, dstPath), s"rename $tmp -> $dst failed")
    fs.delete(bakPath, true)
  }

  /** Compact the postings of an [[buildInvertedIndex]] layout after a
    * run of [[appendToInvertedIndex]] calls: rewrite every bucket with
    * its rows re-sorted by (term, doc_id) — appends leave each bucket
    * with one file batch per append whose term ranges overlap, which
    * erodes the min/max row-group skipping that term lookups rely on.
    * Postings content (and so every query answer) is unchanged; only
    * the file layout is. The swap is the crash-safe backup-rename
    * ordering of [[Curation.compactShards]]: the layout is always
    * present at either the canonical or the backup path. `meta` is not
    * touched. */
  def compactInvertedIndex(
      spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val postings = path.stripSuffix("/") + "/postings"
    val src = spark.read.parquet(postings)
    require(src.columns.contains("tb") && src.columns.contains("term"),
      s"$postings is not an inverted-index layout (missing tb/term)")
    val tmp = postings + "__compact_tmp"
    src.repartition(col("tb"))
      .sortWithinPartitions(col("term"), col("doc_id"))
      .write.mode("overwrite").partitionBy("tb").parquet(tmp)
    swapDirs(spark, tmp, postings)
  }

  /** Driver-side replica of the index's bucket assignment (the same
    * fnv1a64 → splitmix64 kernels, evaluated on a literal), so the query
    * can name the partition directories to prune to. */
  private[graft] def termBucket(term: String, buckets: Int): Int = {
    val h = Mix64(Fnv1a64(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(term))), 0L)
      .eval(null).asInstanceOf[Long]
    (((h % buckets) + buckets) % buckets).toInt
  }

  /** BM25 top-k over a [[buildInvertedIndex]] layout: reads ONLY the
    * query terms' posting lists — partition pruning on `tb` (literal
    * bucket set computed driver-side with the same hash kernels) plus a
    * pushed `term IN (...)` row-group filter — then scores candidates
    * (docs containing ≥ 1 query term; every other doc scores exactly 0
    * and is filtered by both paths) with the IDENTICAL IEEE op sequence
    * as [[bm25TopK]]: per-term contributions pivot into fixed term-index
    * slots (absent term → the same +0.0 the scan path computes for
    * tf = 0) and fold in term order, idf as ln(2N+2) − ln(2df+1) with
    * integer ln arguments. Equality with [[bm25TopK]] is spec-pinned.
    *
    * Scale shape: ZERO corpus scans — cost is the matched posting lists
    * (each splittable across executors) + a driver-row meta read + a
    * broadcast of T df-counts + TakeOrdered(k). At 100 TB the scan path
    * pays two full passes per query; this pays the index build once. */
  def bm25TopKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      queryTerms: Seq[String],
      k: Int = 20,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.distinct.size == queryTerms.size,
      s"queryTerms must be distinct, got $queryTerms")
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val n = meta.getAs[Long]("n")
    val sdl = meta.getAs[Long]("sdl")
    val buckets = meta.getAs[Int]("term_buckets")
    val tbs = queryTerms.map(termBucket(_, buckets)).distinct
    val posts = spark.read.parquet(s"$path/postings")
      .where(col("tb").isin(tbs: _*) && col("term").isin(queryTerms: _*))
    val dfs = posts.groupBy(col("term")).agg(count(lit(1)).cast("long").as("df"))
    val ti = queryTerms.zipWithIndex.foldLeft(lit(-1)) { case (acc, (t, i)) =>
      when(col("term") === lit(t), lit(i)).otherwise(acc)
    }
    val pivoted = posts.join(broadcast(dfs), Seq("term"))
      .select(col("doc_id"), col("dl"), ti.as("__ti"), col("tf"), col("df"))
      .groupBy(col("doc_id"), col("dl"))
      .agg(
        max(when(col("__ti") === 0, struct(col("tf"), col("df")))).as("__t0"),
        queryTerms.indices.drop(1).map(i =>
          max(when(col("__ti") === i, struct(col("tf"), col("df"))))
            .as(s"__t$i")): _*)
    val nD = lit(n).cast("double")
    val avgdl = lit(sdl).cast("double") / nD
    val dlD = col("dl").cast("double")
    def contrib(i: Int): Column = {
      val s = col(s"__t$i")
      val tf = s.getField("tf").cast("double")
      val dfT = s.getField("df").cast("double")
      val idf = graft.operators.math_ln(nD * lit(2.0) + lit(2.0)) -
        graft.operators.math_ln(dfT * lit(2.0) + lit(1.0))
      // absent term: the scan path's tf = 0 contribution is exactly +0.0
      when(s.isNull, lit(0.0)).otherwise(
        idf * (tf * lit(k1 + 1.0)) /
          (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * dlD / avgdl)))
    }
    pivoted.select(col("doc_id"),
        queryTerms.indices.map(contrib).reduce(_ + _).as("score"))
      .where(col("score") > 0.0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** Exact phrase search over a [[buildInvertedIndex]] layout: documents
    * containing `phrase` as ADJACENT tokens, with occurrence count and
    * the first occurrence's 0-based start offset. The classic positional
    * postings algorithm: read only the phrase terms' posting lists
    * (pruned exactly like [[bm25TopKIndexed]]), pivot each doc's per-term
    * position arrays, then fold
    * `occ_i = intersect(occ_{i-1} + 1, positions_i)` — after the fold,
    * `occ` holds the LAST term's offsets of complete matches. Duplicate
    * terms in the phrase ("the cat the") share one posting list.
    *
    * Scale shape: zero corpus scans; cost is the matched posting lists +
    * one partial-agg pivot per candidate doc; the intersect chain is
    * per-row array arithmetic over position arrays (bounded by tf).
    * Returns `(doc_id, n_occ, first_pos)`, doc order. */
  def phraseSearch(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val terms = phrase.distinct
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val buckets = meta.getAs[Int]("term_buckets")
    val tbs = terms.map(termBucket(_, buckets)).distinct
    val posts = spark.read.parquet(s"$path/postings")
      .where(col("tb").isin(tbs: _*) && col("term").isin(terms: _*))
    val pivoted = posts
      .groupBy(col("doc_id"))
      .agg(
        max(when(col("term") === terms.head, col("positions"))).as("__q0"),
        terms.drop(1).zipWithIndex.map { case (t, i) =>
          max(when(col("term") === t, col("positions"))).as(s"__q${i + 1}")
        }: _*)
      .where(terms.indices.map(i => col(s"__q$i").isNotNull).reduce(_ && _))
    val termIdx = terms.zipWithIndex.toMap
    val occ = phrase.zipWithIndex.tail.foldLeft(
        col(s"__q${termIdx(phrase.head)}")) { case (acc, (t, _)) =>
      array_intersect(transform(acc, _ + 1L), col(s"__q${termIdx(t)}"))
    }
    pivoted
      .select(col("doc_id"), size(occ).cast("long").as("n_occ"),
        (array_min(occ) - lit((phrase.size - 1).toLong)).as("first_pos"))
      .where(col("n_occ") > 0)
      .orderBy(col("doc_id"))
  }

  /** Windowed co-occurrence counts with PMI scores [Church & Hanks
    * 1990] — the word-association analysis embedding pipelines run over
    * a corpus before/alongside training. A pair (a, b) co-occurs when b
    * follows a within `window` tokens (direction-collapsed: the pair is
    * stored with a <= b, the word2vec convention). PMI evaluates as
    * `ln(c_ab · S) − ln(c_a · c_b)` with exact-integer ln arguments
    * (both products stay below 2^53 at oracle scales, so the DOUBLE
    * inputs are exact), where S = Σ c_ab (total windowed pair slots) so
    * the distribution is a true probability.
    * Rare pairs are cut at `minCount` BEFORE scoring (the standard PMI
    * noise guard).
    *
    * Cross-engine honesty: the integer-ln agreement lemma is VERIFIED
    * only to 2·10^5 — PMI's arguments (c_ab·S, c_a·c_b) reach 10^9 at
    * sf0.01 already, where JVM Math.log and libm diverge in the last
    * ulp on a few percent of values (measured: 30/471 rows). So the
    * DuckDB oracle (q_pmi) verifies the exact integer association table
    * (w_a, w_b, c_ab, c_a, c_b) — the distributed part — and the scalar
    * ln step is pinned by the OperatorsSpec hand-computed fixture.
    *
    * Scale shape: the pair explode inflates the corpus by ≤ `window`
    * per token (window is 2-5 in practice) and immediately partial-aggs
    * on the pair key — the Zipf head collapses map-side, one Exchange;
    * the unigram table is a second partial agg; the totals row is a
    * closed-form narrow agg over doc lengths (no second pair explode)
    * and broadcasts. The corpus text column is scanned three times
    * (pairs, unigrams, totals) — at petabyte scale cache/persist the
    * tokenized projection before calling. Returns
    * `(w_a, w_b, c_ab, c_a, c_b, s_tot, pmi)`. */
  def cooccurrencePmi(
      df: DataFrame,
      textCol: String,
      window: Int = 3,
      minCount: Long = 2L): DataFrame = {
    require(window >= 1 && window <= 16, s"window must be in 1..16, got $window")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = df.select(tokens(col(textCol)).as("__tk"))
      .where(col("__tk").isNotNull)
    // pair slots: (t[i], t[i+d]) for d in 1..window, collapsed to
    // (min, max) — flatten's codegen beats a posexplode self-join
    val pairs = toks.select(explode(flatten(transform(col("__tk"),
        (t, i) => transform(
          slice(col("__tk"), i + 2, lit(window)),
          u => struct(least(t, u).as("a"), greatest(t, u).as("b"))))))
      .as("p"))
      .select(col("p.a").as("w_a"), col("p.b").as("w_b"))
    val cab = pairs.groupBy(col("w_a"), col("w_b"))
      .agg(count(lit(1)).cast("long").as("c_ab"))
      .where(col("c_ab") >= minCount)
    val uni = toks.select(explode(col("__tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).cast("long").as("c"))
    // S has a closed form over doc lengths — Σ_d min-bounded slots =
    // w·L − w(w+1)/2 for L > w, else L(L−1)/2 — so the totals row costs
    // one narrow scan instead of re-exploding every pair
    val L = size(col("__tk")).cast("long")
    val slots = when(L > window,
        L * window - lit(window.toLong * (window + 1) / 2))
      .otherwise(shiftright(L * (L - 1), 1)) // exact integer L(L−1)/2
    val tot = toks.agg(coalesce(sum(slots), lit(0L)).cast("long").as("s_tot"))
    cab
      .join(uni.select(col("w").as("w_a"), col("c").as("c_a")), Seq("w_a"))
      .join(uni.select(col("w").as("w_b"), col("c").as("c_b")), Seq("w_b"))
      .crossJoin(broadcast(tot))
      .select(col("w_a"), col("w_b"), col("c_ab"), col("c_a"), col("c_b"),
        col("s_tot"),
        (graft.operators.math_ln((col("c_ab") * col("s_tot")).cast("double")) -
          graft.operators.math_ln((col("c_a") * col("c_b")).cast("double"))).as("pmi"))
  }

  /** Exact substring search / character-level overlap against a fixed
    * set of patterns (decontamination-grade): one row per
    * (document, pattern) with the LONGEST-common-substring length,
    * computed by the pattern's suffix automaton riding the plan as
    * literal kernel data ([[SubstringLcs]]) — each document is one
    * O(bytes) pass per pattern, no tokenization, no alignment
    * assumptions. Complements [[phraseSearch]] (token-aligned) and the
    * n-gram decontamination screens (fixed-width): a benchmark string
    * pasted mid-token or partially quoted still surfaces as a long
    * character overlap. `full_match` ⇔ the pattern occurs verbatim.
    *
    * Scale: a zero-Exchange narrow scan — patterns are plan literals
    * (benchmark suites are small; broadcast semantics for free), the
    * corpus never shuffles. NULL text scores 0, like the SQL replica. */
  def substringSearch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "need at least one pattern")
    require(patterns.forall(_.nonEmpty), "patterns must be non-empty")
    val rows = patterns.zipWithIndex.map { case (p, i) =>
      struct(
        lit(i).as("query_idx"),
        coalesce(GraftSqlShim.column(SubstringLcs(
          GraftSqlShim.expression(col(textCol)), p)), lit(0)).as("lcs_len"),
        lit(p.getBytes("UTF-8").length).as("pat_len"))
    }
    df.select(col(idCol), explode(array(rows: _*)).as("m"))
      .select(col(idCol),
        col("m.query_idx"),
        col("m.lcs_len"),
        (col("m.lcs_len") === col("m.pat_len")).as("full_match"))
  }

  /** Multi-pattern exact-occurrence search: every document scanned ONCE
    * against the whole fixed pattern set via a single Aho–Corasick
    * automaton ([[MultiPatternHits]]) riding the plan as literal kernel
    * data — the decontamination matcher for the thousands-of-patterns
    * regime, where per-pattern passes ([[substringSearch]], `strpos`)
    * cost K corpus scans and this costs one. Overlapping occurrences
    * all count, and nested patterns each count at their own positions
    * (character-granular — a benchmark string pasted mid-token still
    * hits).
    *
    * One row per (document, pattern) WITH at least one occurrence:
    * `(id, pat_idx, n_hits, first_pos)` — `first_pos` 1-based, the
    * `strpos` convention (byte == character offsets for ASCII).
    * NULL-text documents yield no rows.
    *
    * Scale: a zero-Exchange narrow scan — the automaton is built once
    * per executor from the plan-literal patterns (benchmark suites are
    * small next to the corpus; broadcast semantics for free), the
    * corpus never shuffles, and output is bounded by true hit volume. */
  def multiPatternSearch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[String]): DataFrame =
    df.select(col(idCol),
        explode(GraftSqlShim.column(MultiPatternHits(
          GraftSqlShim.expression(col(textCol)), patterns))).as("m"))
      .select(col(idCol), col("m.pat_idx"), col("m.n_hits"), col("m.first_pos"))

  /** Exact-match decontamination screen on [[multiPatternSearch]]'s
    * kernel: one row per input document with the number of DISTINCT
    * benchmark patterns it contains and the verdict — zero extra plan
    * nodes beyond the narrow scan (no explode, no join-back: the hit
    * array's size IS the count). NULL text carries `n_patterns = 0`,
    * `contaminated = false` (nothing can match an absent document —
    * the caller's length/quality filters own NULL policy). The
    * STATELESS shape: runs unchanged on a stream
    * ([[graft.streaming.JsonStream.multiPatternScreenToBatch]]). */
  def decontaminateExact(
      df: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[String]): DataFrame =
    df.select(col(idCol),
        coalesce(size(GraftSqlShim.column(MultiPatternHits(
          GraftSqlShim.expression(col(textCol)), patterns))), lit(0))
          .as("n_patterns"))
      .select(col(idCol), col("n_patterns"),
        (col("n_patterns") > 0).as("contaminated"))

  /** Decontamination by EXCISION: every matched benchmark span is cut
    * out of the text (union-merged coverage — overlapping and nested
    * matches become one cut), keeping the document. The remedy for
    * long documents quoting one benchmark item, where dropping the
    * whole doc ([[decontaminateExact]]) wastes the other 99% of it.
    * Returns `(id, clean, n_cut)` with `n_cut` the removed character
    * count; NULL text passes through as NULL clean / NULL n_cut. Same
    * scale shape as the other automaton ops: one zero-Exchange narrow
    * scan, patterns as plan literals. */
  def excisePatterns(
      df: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[String]): DataFrame =
    df.select(col(idCol),
        GraftSqlShim.column(MultiPatternExcise(
          GraftSqlShim.expression(col(textCol)), patterns)).as("clean"),
        col(textCol).as("__t"))
      .select(col(idCol), col("clean"),
        (length(col("__t")) - length(col("clean"))).as("n_cut"))

  /** TextRank corpus keyword salience [Mihalcea & Tarau, EMNLP 2004]:
    * PageRank over the token co-occurrence graph. Nodes are tokens;
    * an (undirected) edge connects two DISTINCT tokens that co-occur
    * within `window` positions in some document; ranks come from the
    * same fixed-point integer [[Graph.pageRankFixed]] recurrence as the
    * link graph, so the distributed sums replay order-independently in
    * a value-level oracle. Output: the `topK` most salient tokens —
    * corpus topic signatures for curation dashboards and source mixing
    * (the classic per-document variant is this operator applied to a
    * one-document frame).
    *
    * Scale shape: co-occurrence pairs come from `window` `lead()`
    * columns over ONE per-document sort (a single Exchange on the doc
    * id, no self-join — per-doc state is bounded by doc length), the
    * graph is then deduplicated token-pair rows (vocabulary-sized, not
    * corpus-sized), and each PageRank round is the pre-partitioned
    * Pregel join+agg. The final top-k is a TakeOrdered, never a full
    * sort. */
  def textRank(
      df: DataFrame,
      idCol: String,
      textCol: String,
      window: Int = 2,
      iterations: Int = 5,
      topK: Int = 20): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("__doc")).orderBy(col("__pos"))
    val toks = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "tok")))
    val pairs = toks
      .select(col("tok").as("src"),
        array((1 to window).map(d => lead(col("tok"), d).over(w)): _*).as("ls"))
      .select(col("src"), explode(col("ls")).as("dst"))
      .where(col("dst").isNotNull && col("src") =!= col("dst"))
    val edges = pairs.unionAll(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    Graph.pageRankFixed(edges, "src", "dst", iterations)
      .orderBy(col("rank").desc, col("node")).limit(topK)
      .select(col("node").as("token"), col("rank"))
  }

  /** RAKE keyword extraction [Rose, Engel, Cramer & Cowley, "Automatic
    * Keyword Extraction from Individual Documents", 2010] lifted to the
    * corpus: candidate phrases are maximal stopword-free token runs;
    * each word scores deg(w)/freq(w) — deg summing the lengths of every
    * phrase instance containing it, freq its occurrence count — and a
    * phrase scores the sum of its member-word scores. The ratio runs in
    * FIXED-POINT integer arithmetic (⌊10^6·deg/freq⌋, the PageRank
    * discipline): sums stay order-free, so a distributed aggregation
    * and a single-threaded SQL oracle agree bit-for-bit, and the 1e-6
    * quantization is far below any ranking decision. Multi-word
    * phrases beat TextRank's unigram salience for topic signatures —
    * the two are complementary diagnostics over the same tokens.
    *
    * Scale shape: phrase ids are a running stopword count over one
    * per-document window (single Exchange on the doc id), phrase
    * reassembly sorts each group's (pos, tok) structs locally, word
    * stats are one vocabulary-sized aggregation, the score join is
    * vocabulary-keyed, and the final top-k is a TakeOrdered. Returns
    * `(phrase, n_occ, score)`, score descending with phrase tiebreak. */
  def rakeKeywords(
      df: DataFrame,
      idCol: String,
      textCol: String,
      topK: Int = 20): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val toks = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"),
        posexplode(tokens(col(textCol))).as(Seq("__pos", "tok")))
    val words = toks
      .withColumn("__stop", col("tok").isin(stopwords: _*))
      .withColumn("__pid", sum(col("__stop").cast("long")).over(
        Window.partitionBy(col("__doc")).orderBy(col("__pos"))))
      .where(!col("__stop"))
      .withColumn("__plen", count(lit(1)).over(
        Window.partitionBy(col("__doc"), col("__pid"))))
    val wscore = words.groupBy(col("tok"))
      .agg(count(lit(1)).as("freq"), sum(col("__plen")).as("deg"))
      // deg·10^6 must stay inside Long — fails loudly past ~9.2e12
      // aggregate phrase length for one word instead of wrapping
      .select(col("tok"), expr(
        s"CASE WHEN deg <= ${Long.MaxValue / 1000000L}L " +
          "THEN (deg * 1000000) div freq " +
          "ELSE raise_error('rakeKeywords: word degree exceeds the exact " +
          "Long ceiling; shard the corpus or pre-filter stopword-like " +
          "tokens') END").as("wscore"))
    val phraseInstances = words.join(wscore, "tok")
      .groupBy(col("__doc"), col("__pid"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("tok")))),
          _.getField("tok")), " ").as("phrase"),
        sum(col("wscore")).as("score"))
    phraseInstances.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occ"), max(col("score")).as("score"))
      .orderBy(col("score").desc, col("phrase")).limit(topK)
  }

  /** Per-document token-distribution Shannon entropy — the
    * information-theoretic quality signal the ratio heuristics miss:
    * keyword-stuffed or template-spun pages have low entropy at normal
    * length, and it complements [[repetition]]'s n-gram view with a
    * whole-distribution one.
    *
    * H = ln(n) − (Σ_t c_t·ln(c_t))/n over token counts c_t. The fold is
    * carried as `Σ ⌊10^6·c·ln(c)⌋` — each term an exact integer (ln on
    * INTEGER args through [[graft.operators.MathLn]], where JVM
    * Math.log and libm agree bit-for-bit in the corpus-count range), so
    * the distributed sum is order-free and the final entropy double is
    * a fully-specified IEEE expression over (n, that sum) — the same
    * oracle discipline as PMI/BM25. The 1e-6/n quantization is far
    * below any filtering decision.
    *
    * Returns `(id, n_tokens, n_distinct, sum_c_ln_c_e6, entropy)`.
    * Scale shape: one (doc, token) aggregation, one per-doc aggregation
    * — both map-side-partial hash aggregates, no joins. */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = df.where(col(textCol).isNotNull)
      .select(col(idCol).as("__doc"), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("__doc"), col("tok")).agg(count(lit(1)).as("c"))
    tf.groupBy(col("__doc"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(floor(lit(1e6) * col("c").cast("double") *
          math_ln(col("c").cast("double"))).cast("long")).as("sum_c_ln_c_e6"))
      .select(col("__doc").as(idCol), col("n_tokens"), col("n_distinct"),
        col("sum_c_ln_c_e6"),
        (math_ln(col("n_tokens").cast("double")) -
          (col("sum_c_ln_c_e6").cast("double") / 1e6) /
            col("n_tokens").cast("double")).as("entropy"))
  }

  /** Unicode-normalize a string column (NFC/NFD/NFKC/NFKD) — see
    * [[UnicodeNormalize]]. The hygiene step BEFORE any hash/dedup pass:
    * é-as-two-codepoints and é-precomposed must collide. */
  def unicodeNormalize(textCol: Column, form: String = "NFC"): Column =
    GraftSqlShim.column(UnicodeNormalize(
      GraftSqlShim.expression(textCol), form))

  /** Repair UTF-8-decoded-as-Latin-1/Windows-1252 mojibake ("Ã©" → "é")
    * — see [[FixMojibake]]. Strings a strict decoder can't validate
    * come back unchanged. */
  def fixMojibake(textCol: Column): Column =
    GraftSqlShim.column(FixMojibake(GraftSqlShim.expression(textCol)))

  /** Per-document stats frame used by the pipeline queries; tokenizes
    * once (see stopwordRatioOf). */
  def documentStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
        col(idCol),
        charLength(col(textCol)).as("n_chars_calc"),
        tokens(col(textCol)).as("toks"),
        punctRatio(col(textCol)).as("punct_ratio"))
      .select(
        col(idCol),
        col("n_chars_calc"),
        size(col("toks")).cast("long").as("n_tokens"),
        stopwordRatioOf(col("toks")).as("stopword_ratio"),
        col("punct_ratio"))

  // ---------------------------------------------------------------
  // Unigram-LM (SentencePiece-style) Viterbi segmentation
  // ---------------------------------------------------------------

  /** Fixed-point log2 with 10 fractional bits over POSITIVE integers,
    * computed with the classic integer shift-square recurrence — every
    * step is exact integer arithmetic (the mantissa squaring peaks at
    * 2^102, inside int128), so any engine with 128-bit integers replays
    * it bit-for-bit (the DuckDB oracle does, as 10 unrolled HUGEINT
    * steps):
    *   e = floor(log2 f);  M = f << (50 - e)   // in [2^50, 2^51)
    *   10 times: M = (M*M) >> 50; if M >= 2^51 { M >>= 1; bit 1 } else bit 0
    *   log2fp(f) = 1024*e + collected bits
    * This is the quantized-log building block that makes unigram-LM
    * costs oracle-comparable without touching float ln (the MathLn
    * last-ulp lesson, avoided entirely). Requires f >= 1 and f < 2^50. */
  private[graft] def log2fp(f: Long): Long = {
    require(f >= 1 && f < (1L << 50), s"log2fp domain is [1, 2^50), got $f")
    val e = 63 - java.lang.Long.numberOfLeadingZeros(f)
    var m = java.math.BigInteger.valueOf(f).shiftLeft(50 - e)
    val lim = java.math.BigInteger.ONE.shiftLeft(51)
    var frac = 0L
    var i = 0
    while (i < 10) {
      m = m.multiply(m).shiftRight(50)
      if (m.compareTo(lim) >= 0) { m = m.shiftRight(1); frac = frac * 2 + 1 }
      else frac = frac * 2
      i += 1
    }
    e.toLong * 1024L + frac
  }

  /** The unigram piece vocabulary with quantized-log costs, derived
    * deterministically from the corpus: every substring of length
    * 1..`maxPieceLen` of every word (weighted by word occurrence count)
    * is a candidate; the vocab keeps ALL single characters (so every
    * word is always segmentable) plus the `topPieces` multi-char pieces
    * by (freq desc, piece asc). cost_fp(piece) = log2fp(total) −
    * log2fp(freq) with total = Σ freq over the SELECTED vocab — the
    * quantized −log2 of the piece's unigram probability.
    *
    * Scale shape: one explode of bounded fan-out (≤ maxPieceLen·|word|
    * pieces per word) over the DISTINCT-word table (domain-bounded, not
    * corpus-bounded), one partial-agg exchange on the piece key, one
    * window over the multi-char slice. Returns (piece, freq, cost_fp). */
  def unigramVocab(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPieceLen: Int = 4,
      topPieces: Int = 40): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(topPieces >= 0, s"topPieces must be >= 0, got $topPieces")
    val words = docs
      .select(explode(split(col(textCol), " ")).as("wrd"))
      .where(col("wrd").isNotNull && length(col("wrd")) > 0)
      .groupBy(col("wrd")).agg(count(lit(1)).as("wc"))
    val piecesReal = words
      .select(col("wc"), explode(flatten(transform(
          sequence(lit(1), length(col("wrd"))), p =>
            transform(
              sequence(lit(1), least(lit(maxPieceLen),
                length(col("wrd")) - p + 1)),
              l => substr(col("wrd"), p, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).cast("long").as("freq"))
    val multi = piecesReal.where(length(col("piece")) > 1)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("freq").desc, col("piece"))))
      .where(col("rn") <= topPieces)
      .drop("rn")
    val vocab = piecesReal.where(length(col("piece")) === 1)
      .unionByName(multi)
    val totalRow = vocab.agg(sum(col("freq")).cast("long")).head()
    val total = if (totalRow.isNullAt(0)) 1L else math.max(1L, totalRow.getLong(0))
    val logTotal = log2fp(total)
    val logFreq = GraftSqlShim.column(Log2Fp(
      GraftSqlShim.expression(col("freq"))))
    vocab.select(col("piece"), col("freq"),
      (lit(logTotal) - logFreq).as("cost_fp"))
  }

  /** Unigram-LM Viterbi segmentation over the [[unigramVocab]] pieces:
    * per word, the DP minimizes the COMBINED integer objective
    * 1024·cost_fp + 1 per piece — lexicographically (total cost, then
    * piece count), both components tie-free integers any engine
    * replays; among objective-equal segmentations the emitted STRING
    * prefers the longer last piece (spec-pinned, not oracle-compared).
    * The vocab ships to executors as plan-literal kernel data (bounded:
    * topPieces + the corpus alphabet), so segmentation is one
    * zero-shuffle scan. Returns (id, n_words, n_pieces, cost_fp, seg)
    * where seg joins pieces with U+00B7 inside words, words with ' '. */
  def unigramSegment(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPieceLen: Int = 4,
      topPieces: Int = 40): DataFrame = {
    val vocab = unigramVocab(docs, idCol, textCol, maxPieceLen, topPieces)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toSeq
      .sortBy(_._1)
    unigramSegmentWith(docs, idCol, textCol, vocab, maxPieceLen)
  }

  /** Apply-only half of [[unigramSegment]]: segment with an ALREADY
    * derived (piece, cost_fp) vocab — one stateless kernel scan, so it
    * runs unchanged on a STREAMING frame (the dsirScoreFused shape:
    * train in batch, screen at ingestion). */
  def unigramSegmentWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[(String, Long)],
      maxPieceLen: Int = 4): DataFrame = {
    val segCol = GraftSqlShim.column(UnigramSegmentText(
      GraftSqlShim.expression(col(textCol)), vocab, maxPieceLen))
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        size(filter(split(col(textCol), " "), w => length(w) > 0))
          .cast("long").as("n_words"),
        segCol.as("u"))
      .select(col(idCol), col("n_words"),
        col("u.n_pieces").as("n_pieces"),
        col("u.cost_fp").as("cost_fp"),
        col("u.seg").as("seg"))
  }

  /** WordPiece vocabulary derivation — position-split by BERT's `##`
    * convention: a word-INITIAL substring and the same characters
    * mid-word are DISTINCT vocab entries (form 0 / form 1), since
    * MaxMatch may only start a word with form 0. Pieces are weighted by
    * word occurrence; kept are the top `topChars` single-character
    * entries and top `topPieces` multi-character entries, each ranked
    * (freq desc, form asc, piece asc). Capping the CHARACTER vocab is
    * what gives WordPiece its `[UNK]` semantics — a word touching a
    * dropped (form, char) that no longer multi-char piece covers cannot
    * be segmented (real WordPiece vocabs are size-capped the same way).
    * Same scale shape as [[unigramVocab]]: distinct-word domain, one
    * bounded-fan-out explode, one keyed agg. Returns (piece, form, freq). */
  def wordPieceVocab(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPieceLen: Int = 4,
      topPieces: Int = 40,
      topChars: Int = 44): DataFrame = {
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    val words = docs
      .select(explode(split(col(textCol), " ")).as("wrd"))
      .where(col("wrd").isNotNull && length(col("wrd")) > 0)
      .groupBy(col("wrd")).agg(count(lit(1)).as("wc"))
    val pieces = words
      .select(col("wc"), explode(flatten(transform(
          sequence(lit(1), length(col("wrd"))), p =>
            transform(
              sequence(lit(1), least(lit(maxPieceLen),
                length(col("wrd")) - p + 1)),
              l => struct(substr(col("wrd"), p, l).as("piece"),
                when(p === 1, 0).otherwise(1).as("form")))))).as("pf"))
      .groupBy(col("pf.piece").as("piece"), col("pf.form").as("form"))
      .agg(sum(col("wc")).cast("long").as("freq"))
    def top(df: DataFrame, n: Int): DataFrame =
      df.withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("freq").desc, col("form"), col("piece"))))
        .where(col("rn") <= n).drop("rn")
    top(pieces.where(length(col("piece")) === 1), topChars)
      .unionByName(top(pieces.where(length(col("piece")) > 1), topPieces))
  }

  /** Apply-only WordPiece segmentation with an ALREADY derived
    * (piece, form) vocab — one stateless kernel scan (streaming-safe,
    * the [[unigramSegmentWith]] shape). Returns
    * (id, n_words, n_pieces, n_unk, seg). */
  def wordPieceSegmentWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: Seq[(String, Int)]): DataFrame = {
    val segCol = GraftSqlShim.column(WordPieceSegmentText(
      GraftSqlShim.expression(col(textCol)), vocab))
    docs
      .where(col(textCol).isNotNull)
      .select(col(idCol),
        size(filter(split(col(textCol), " "), w => length(w) > 0))
          .cast("long").as("n_words"),
        segCol.as("u"))
      .select(col(idCol), col("n_words"),
        col("u.n_pieces").as("n_pieces"),
        col("u.n_unk").as("n_unk"),
        col("u.seg").as("seg"))
  }

  /** [[wordPieceVocab]] + [[wordPieceSegmentWith]]: derive the vocab
    * from the corpus (bounded: topChars + topPieces rows, collected to
    * the driver and shipped as plan-literal kernel data), then MaxMatch
    * every document in one scan. */
  def wordPieceSegment(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPieceLen: Int = 4,
      topPieces: Int = 40,
      topChars: Int = 44): DataFrame = {
    val vocab = wordPieceVocab(docs, idCol, textCol, maxPieceLen, topPieces, topChars)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq.sorted
    wordPieceSegmentWith(docs, idCol, textCol, vocab)
  }

  /** ONE hard-EM round over a (wrd, wc) distinct-word frame with the
    * current (piece, cost_fp) vocab: E-step = Viterbi-segment every
    * distinct word with the [[UnigramSegmentText]] kernel and count
    * piece usage weighted by word occurrence count (the segmentation's
    * tie rule — largest piece length achieving the combined-objective
    * minimum at every cut — makes the counts fully deterministic);
    * M-step = add-one smoothing (so pruned-in single chars that the
    * Viterbi never used keep a valid, tiny probability and [[log2fp]]'s
    * f ≥ 1 domain holds by construction), prune to all single chars +
    * the top `pruneTo` multi-char pieces by (em_count desc, piece asc).
    * The caller re-derives cost_fp = log2fp(total) − log2fp(em_count)
    * over the KEPT vocab's total (driver-local: ≤ |vocab| values).
    *
    * Returns (piece, em_count) as a lazy plan. The E-step is
    * one distributed kernel scan + one partial-agg Exchange on the
    * piece key over the DISTINCT-WORD domain (bounded by vocabulary
    * size, not corpus size); the M-step window orders ≤ |vocab| rows.
    * Texts must not contain U+00B7 (the piece joiner) — the split
    * would miscount; [[unigramVocab]]'s whitespace word model shares
    * the limitation and the oracle replays the identical rule. */
  private[graft] def unigramEmStepPlan(
      words: DataFrame,
      vocab: Seq[(String, Long)],
      maxPieceLen: Int,
      pruneTo: Int): DataFrame = {
    require(pruneTo >= 0, s"pruneTo must be >= 0, got $pruneTo")
    val spark = words.sparkSession
    import spark.implicits._
    val segCol = GraftSqlShim.column(UnigramSegmentText(
      GraftSqlShim.expression(col("wrd")), vocab, maxPieceLen))
    val counts = words
      .select(col("wc"), explode(split(segCol.getField("seg"), "·")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("wc")).cast("long").as("vcount"))
    val candidates = vocab.map(_._1).toDF("piece")
    val smoothed = candidates.join(counts, Seq("piece"), "left")
      .select(col("piece"),
        (coalesce(col("vcount"), lit(0L)) + 1L).as("em_count"))
    val multi = smoothed.where(length(col("piece")) > 1)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("em_count").desc, col("piece"))))
      .where(col("rn") <= pruneTo)
      .drop("rn")
    val kept = smoothed.where(length(col("piece")) === 1).unionByName(multi)
    kept
  }

  /** SentencePiece-style unigram-LM TRAINING: seed vocab from substring
    * frequencies ([[unigramVocab]]), then `emRounds` hard-EM rounds of
    * [[unigramEmStepPlan]] (Viterbi counts → smooth → prune → re-cost).
    * Hard EM (counts from the single best segmentation) instead of the
    * paper's forward-backward soft EM: the E-step stays exact-integer
    * end to end, so every iteration — counts, pruning, and the
    * quantized-log costs — replays value-level in the DuckDB oracle;
    * soft EM's fractional expected counts would reintroduce the float
    * folds this whole tier exists to avoid.
    *
    * Returns the TRAINED vocab (piece, em_count, cost_fp) as a LOCAL
    * frame (bounded: alphabet + pruneTo rows — nothing persisted
    * escapes). Driver coordination is `emRounds` sequential jobs, each
    * collecting ≤ |vocab| rows + ONE total — unlike BPE's per-merge
    * loop this does not grow with vocab size (SentencePiece trains in
    * a handful of EM rounds regardless of vocab), so the shape holds
    * at production scale. Segment a corpus or a stream with the result
    * via [[unigramSegmentWith]]. */
  def unigramTrainEm(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPieceLen: Int = 4,
      topPieces: Int = 40,
      emRounds: Int = 2,
      pruneTo: Int = 32): DataFrame = {
    require(emRounds >= 1, s"emRounds must be >= 1, got $emRounds")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(split(col(textCol), " ")).as("wrd"))
      .where(col("wrd").isNotNull && length(col("wrd")) > 0)
      .groupBy(col("wrd")).agg(count(lit(1)).as("wc"))
      .persist()
    try {
      var vocab: Seq[(String, Long)] =
        unigramVocab(docs, idCol, textCol, maxPieceLen, topPieces)
          .collect().map(r => r.getString(0) -> r.getLong(2)).toSeq
          .sortBy(_._1)
      var trained: Array[(String, Long, Long)] = Array.empty
      var r = 0
      while (r < emRounds) {
        val kept = unigramEmStepPlan(words, vocab, maxPieceLen, pruneTo)
          .collect().map(x => (x.getString(0), x.getLong(1)))
        val total = kept.map(_._2).sum
        val logTotal = log2fp(total)
        trained = kept.map { case (p, c) => (p, c, logTotal - log2fp(c)) }
        vocab = trained.map(t => t._1 -> t._3).toSeq.sortBy(_._1)
        r += 1
      }
      import spark.implicits._
      trained.toSeq.toDF("piece", "em_count", "cost_fp")
    } finally words.unpersist()
  }
}
