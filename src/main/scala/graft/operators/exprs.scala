package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.GraftSqlShim
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the vector/text kernels where composing
 * built-ins would either lose numeric determinism (float summation order)
 * or do O(k·n) work for an O(n) job. All are single-pass, allocation-free
 * per row, and deterministic — the properties that matter when the same
 * kernel runs on 10^11 rows.
 */

/** Cosine similarity between two float/double array columns, accumulated in
  * double in element order (deterministic, oracle-comparable). NULL if
  * either side is NULL, lengths differ, or a norm is zero. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any =
    nullSafeEval(args(0), args(1))

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_similarity expects array<float|double> arguments, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }

  @transient private lazy val leftIsFloat = elemType(left).contains(FloatType)
  @transient private lazy val rightIsFloat = elemType(right).contains(FloatType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      // a NULL element would silently read as 0.0 from ArrayData — honor
      // the "any NULL argument → NULL" kernel contract instead
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (leftIsFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rightIsFloat) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv
      nx += xv * xv
      ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-bit SimHash over a token array: hash each token (FNV-1a 64), then
  * per bit position sum +1/-1 across tokens and keep the sign bit.
  * Near-duplicate documents have small Hamming distance. Token hashing is
  * fused in (same interpreted-child rationale as MinHashSignature).
  * Empty/NULL input → NULL. */
case class SimHash64(child: Expression) extends UnaryExpression with KernelCodegen {
  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string> of tokens, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n == 0) return null
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = if (toks.isNullAt(i)) 0L
        else HashKernels.mix(HashKernels.fnv1a(toks.getUTF8String(i)))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Test access to the private hash kernels (property specs pin them
  * against BigInt models — they carry cross-engine oracle parity). */
object HashKernelsAccess {
  def fnv1a(s: String): Long =
    HashKernels.fnv1a(org.apache.spark.unsafe.types.UTF8String.fromString(s))
  def mix(x: Long): Long = HashKernels.mix(x)
}

/** fastText-style hashed-n-gram linear classifier kernel [Joulin et al.
  * 2016, "Bag of Tricks for Efficient Text Classification"]: the
  * features of a token array are its unigrams and adjacent bigrams
  * (joined with one space); each feature hashes
  * FNV-1a 64 → splitmix64 → one of `buckets` buckets; each bucket
  * carries a deterministic integer weight in [-1000, 1000] derived
  * from splitmix64 of the bucket id — a fixed stand-in for a
  * pretrained weight table (swap the derivation for a broadcast
  * array lookup and the plumbing is unchanged). Returns the exact
  * integers (n_feats, wsum): keeping the sum integral makes it
  * shuffle-order-free and the derived double score a fixed two-IEEE-op
  * function, so results compare bit-exactly across engines. Bigram
  * hashing CONTINUES the FNV fold of the previous token through a
  * space byte — one pass, no concatenated strings. Empty/NULL array →
  * NULL; NULL tokens hash as empty strings. */
case class HashedLinearScore(child: Expression, buckets: Int)
    extends UnaryExpression with KernelCodegen {
  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("wsum", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "hashed_linear_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_linear_score expects array<string> of tokens, got ${other.sql}")
  }

  private def weightOf(rawFnv: Long): Long = {
    val b = java.lang.Long.remainderUnsigned(HashKernels.mix(rawFnv), buckets.toLong)
    java.lang.Long.remainderUnsigned(HashKernels.mix(b), 2001L) - 1000L
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val nt = toks.numElements()
    if (nt == 0) return null
    var wsum = 0L
    var prevFnv = 0L
    var i = 0
    while (i < nt) {
      val bytes = if (toks.isNullAt(i)) Array.emptyByteArray
        else toks.getUTF8String(i).getBytes
      val hu = HashKernels.fnv1aCont(HashKernels.FnvBasis, bytes)
      wsum += weightOf(hu)
      if (i > 0)
        wsum += weightOf(
          HashKernels.fnv1aCont(HashKernels.fnv1aByte(prevFnv, ' '.toByte), bytes))
      prevFnv = hu
      i += 1
    }
    val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    out.setLong(0, 2L * nt - 1L)
    out.setLong(1, wsum)
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused DSIR scorer: hashed unigram+adjacent-bigram features of a token
  * array (the [[HashedLinearScore]] feature space), each looked up in a
  * TRAINED per-bucket weight array baked into the expression as literal
  * data (the [[PqAdcScore]] convention — rides the plan, implicit
  * broadcast). Weights fold in the SAME order as
  * `TextOps.featureBuckets` materializes features (all unigrams in token
  * order, then all adjacent bigrams), so the summed double is
  * bit-identical to the aggregation-based scorer's position-ordered fold
  * — spec-pinned. Returns struct(n_feats, wsum). Empty/NULL array →
  * NULL; NULL tokens hash as empty strings (the HashedLinearScore
  * convention; featureBuckets never produces them — its input coalesces
  * text to ""). One narrow pass per row, no Exchange anywhere — the
  * scan-speed production shape for scoring 100 TB (or a stream) against
  * weights trained once. */
case class DsirScore(child: Expression, weights: Array[Double])
    extends UnaryExpression with KernelCodegen {
  require(weights.nonEmpty && (weights.length & (weights.length - 1)) == 0,
    s"weights length must be a power of two, got ${weights.length}")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = StructType(Seq(
    StructField("n_feats", LongType, nullable = false),
    StructField("wsum", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "dsir_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dsir_score expects array<string> of tokens, got ${other.sql}")
  }

  @transient private lazy val mask = weights.length - 1L

  private def bucketOf(rawFnv: Long): Int =
    (HashKernels.mix(rawFnv) & mask).toInt

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val nt = toks.numElements()
    if (nt == 0) return null
    val fnv = new Array[Long](nt)
    var i = 0
    var wsum = 0.0
    while (i < nt) { // unigrams, token order
      val bytes = if (toks.isNullAt(i)) Array.emptyByteArray
        else toks.getUTF8String(i).getBytes
      fnv(i) = HashKernels.fnv1aCont(HashKernels.FnvBasis, bytes)
      wsum += weights(bucketOf(fnv(i)))
      i += 1
    }
    i = 1
    while (i < nt) { // adjacent bigrams, token order (after ALL unigrams)
      val bytes = if (toks.isNullAt(i)) Array.emptyByteArray
        else toks.getUTF8String(i).getBytes
      wsum += weights(bucketOf(
        HashKernels.fnv1aCont(HashKernels.fnv1aByte(fnv(i - 1), ' '.toByte), bytes)))
      i += 1
    }
    val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(2)
    out.setLong(0, 2L * nt - 1L)
    out.setDouble(1, wsum)
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Natural log via `java.lang.Math.log` — NOT Spark's built-in `ln`,
  * which evaluates `StrictMath.log` (fdlibm). The distinction is load-
  * bearing for every oracle-verified score: DuckDB's `ln` (platform
  * libm, correctly rounded on this toolchain) agrees bit-for-bit with
  * `Math.log` on integer arguments except 4 values in 1..200000
  * (9170 / 136837 / 141614 / 147674), but disagrees with fdlibm on
  * ~1% of integers starting at x = 3 (3, 48, 74, 185, 196, ...) —
  * measured, 3845 diffs in 1..400000. Scores built on the built-in
  * `ln` therefore hash-match the oracle only while their argument sets
  * dodge a 1%-density minefield; this kernel shrinks that to the
  * 2e-5-density documented one. Matches the built-in's NULL semantics:
  * non-positive input → NULL. */
case class MathLn(child: Expression) extends UnaryExpression with KernelCodegen {
  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "math_ln"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"math_ln expects a double argument, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    if (x <= 0.0) null else Math.log(x)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Marker-lexicon language ID, fused: count per language how many tokens
  * appear in that language's marker list, then argmax with ties broken
  * toward the LARGER language code (exactly `greatest(struct(score,
  * lang))` semantics, which the DuckDB oracle replays as
  * `max_by(lang, score*10 + rank)` with rank in language-string order);
  * all-zero scores → "und". One pass over the token array with a
  * marker→language-bitmask hash probe per token — replaces a
  * per-language `filter(toks, isin(...))` HOF chain, which is
  * CodegenFallback and re-walks the array once per language. NULL
  * tokens match nothing (the HOF's NULL-predicate-drops semantics);
  * NULL array → NULL (callers coalesce to "und"). */
case class MarkerLangId(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression with KernelCodegen {
  require(profiles.nonEmpty && profiles.size <= 64,
    s"profiles must have 1..64 languages, got ${profiles.size}")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "marker_lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"marker_lang_id expects array<string> of tokens, got ${other.sql}")
  }

  @transient private lazy val langs: Array[String] = profiles.map(_._1).toArray
  // marker → bitmask of the languages listing it (a marker may belong to
  // several languages — "la" is both Spanish and French)
  @transient private lazy val markerMask
      : java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
    profiles.zipWithIndex.foreach { case ((_, markers), i) =>
      markers.foreach { mk =>
        val k = org.apache.spark.unsafe.types.UTF8String.fromString(mk)
        val prev = m.get(k)
        m.put(k, java.lang.Long.valueOf(
          (if (prev == null) 0L else prev.longValue()) | (1L << i)))
      }
    }
    m
  }
  @transient private lazy val und =
    org.apache.spark.unsafe.types.UTF8String.fromString("und")
  @transient private lazy val langUtf8 =
    langs.map(org.apache.spark.unsafe.types.UTF8String.fromString)

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val mask = markerMask.get(toks.getUTF8String(i))
        if (mask != null) {
          var m = mask.longValue()
          while (m != 0L) {
            val j = java.lang.Long.numberOfTrailingZeros(m)
            counts(j) += 1
            m &= m - 1L
          }
        }
      }
      i += 1
    }
    var best = 0
    var j = 1
    while (j < counts.length) {
      if (counts(j) > counts(best) ||
        (counts(j) == counts(best) && langs(j).compareTo(langs(best)) > 0)) best = j
      j += 1
    }
    if (counts(best) > 0) langUtf8(best) else und
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

private[operators] object HashKernels {
  val FnvBasis = 0xcbf29ce484222325L

  /** One FNV-1a 64 byte step from state `h`. */
  def fnv1aByte(h: Long, b: Byte): Long = (h ^ (b & 0xffL)) * 0x100000001b3L

  /** Continue an FNV-1a 64 fold from state `h` over `bytes` — hashing a
    * concatenation without building the concatenated string. */
  def fnv1aCont(h0: Long, bytes: Array[Byte]): Long = {
    var h = h0
    var i = 0
    while (i < bytes.length) {
      h = fnv1aByte(h, bytes(i))
      i += 1
    }
    h
  }

  /** FNV-1a 64 over a UTF8String's bytes. */
  def fnv1a(s: org.apache.spark.unsafe.types.UTF8String): Long =
    fnv1aCont(FnvBasis, s.getBytes)

  /** splitmix64 finalizer — decorrelates combined hashes. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }
}

/** Fused MinHash-signature kernel: token array → n-token shingle hashes →
  * k-component signature, all in one JVM pass (no intermediate shingle
  * strings, no per-component array traversals). The k hash family is
  * affine with Java wraparound arithmetic (a_j odd → bijective over
  * Z/2^64) — done natively partly BECAUSE ANSI SQL forbids overflowing
  * multiply. Duplicate shingles need no dedup: min over a multiset equals
  * min over its set. Empty/NULL input → NULL.
  *
  * Fusing matters: a CodegenFallback parent forces its child tree into
  * interpreted eval, so a compositional transform()/slice()/concat_ws()
  * shingle pipeline underneath pays per-element lambda-binding costs —
  * measured ~20× slower than this kernel at sf0.1. */
case class MinHashSignature(child: Expression, shingleSize: Int, k: Int)
    extends UnaryExpression with KernelCodegen {
  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string> of tokens, got ${other.sql}")
  }

  @transient private lazy val family: (Array[Long], Array[Long]) =
    MinHashSignature.family(k)

  override def nullSafeEval(v: Any): Any = {
    val (as, bs) = family
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n == 0) return null
    // rolling window of token hashes → combined shingle hash
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (toks.isNullAt(i)) 0L else HashKernels.fnv1a(toks.getUTF8String(i))
      i += 1
    }
    val sig = Array.fill(k)(Long.MaxValue)
    val nShingles = math.max(1, n - shingleSize + 1)
    i = 0
    while (i < nShingles) {
      var h = 0L
      var w = 0
      while (w < shingleSize && i + w < n) {
        h = h * 0x100000001b3L + th(i + w)
        w += 1
      }
      h = HashKernels.mix(h)
      var j = 0
      while (j < k) {
        val m = as(j) * h + bs(j)
        if (m < sig(j)) sig(j) = m
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSignature {
  /** Deterministic affine family, seeded with a fixed LCG so signatures
    * are reproducible across runs, sessions, AND engines (the DuckDB
    * oracle regenerates the same constants — SparkEntry.minhashCtes). */
  def family(k: Int): (Array[Long], Array[Long]) = {
    var s = 0x9e3779b97f4a7c15L
    def next(): Long = { s = s * 6364136223846793005L + 1442695040888963407L; s }
    (Array.fill(k)(next() | 1L), Array.fill(k)(next()))
  }
}

/** One-permutation MinHash signature [Li, Owen & Zhang, NIPS 2012] with
  * rotation densification [Shrivastava & Li, ICML 2014]: ONE hash per
  * shingle instead of [[MinHashSignature]]'s k. The mixed shingle hash
  * lands in bucket h mod k; each bucket keeps its UNSIGNED-min hash;
  * an empty bucket borrows the nearest non-empty bucket to its right
  * (circular), offset by t·C so borrows at different distances never
  * alias. Estimator quality matches k-hash MinHash under the uniform-
  * hash assumption (each bucket min is an independent permutation
  * sample; densified positions collide across two docs iff both borrow
  * the same source bucket at the same distance) at 1/k the hash cost —
  * at 100 TB the signature scan IS the MinHash-LSH bottleneck, and this
  * kernel does ~k× less hashing per shingle. Token and shingle hashing
  * are byte-identical to [[MinHashSignature]] (same fnv1a, same rolling
  * fold, same splitmix64 finisher), so one oracle shingle-hash chain
  * replays both kernels. */
case class OphMinHashSignature(child: Expression, shingleSize: Int, k: Int)
    extends UnaryExpression with KernelCodegen {
  require(shingleSize >= 1, s"shingleSize must be >= 1, got $shingleSize")
  require(k >= 2, s"k must be >= 2, got $k")
  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "oph_minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"oph_minhash_signature expects array<string> of tokens, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n == 0) return null
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      th(i) = if (toks.isNullAt(i)) 0L else HashKernels.fnv1a(toks.getUTF8String(i))
      i += 1
    }
    val raw = new Array[Long](k)
    val has = new Array[Boolean](k)
    val nShingles = math.max(1, n - shingleSize + 1)
    i = 0
    while (i < nShingles) {
      var h = 0L
      var w = 0
      while (w < shingleSize && i + w < n) {
        h = h * 0x100000001b3L + th(i + w)
        w += 1
      }
      h = HashKernels.mix(h)
      val j = java.lang.Long.remainderUnsigned(h, k.toLong).toInt
      if (!has(j) || java.lang.Long.compareUnsigned(h, raw(j)) < 0) {
        raw(j) = h; has(j) = true
      }
      i += 1
    }
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      if (has(j)) sig(j) = raw(j)
      else {
        var t = 1
        while (!has((j + t) % k)) t += 1
        sig(j) = raw((j + t) % k) + t.toLong * OphMinHashSignature.C
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object OphMinHashSignature {
  /** Densification offset: a large odd constant, so borrowed values at
    * distinct distances never alias mod 2^64 (t·C is injective in t for
    * t < 2^63). */
  val C: Long = 0x9e3779b97f4a7c15L
}

/** Binary (1-bit) quantization code: bit i of the result is set iff
  * vec[i] > 0, so a 64-dim embedding packs into ONE long — 64× smaller
  * than float32, the most aggressive memory lever in the quantization
  * ladder (SQ8 4×, PQ 16-32×, BQ 64×). Hamming distance between codes
  * ranks like angular distance for roughly mean-centered embeddings
  * (each bit is the sign-hyperplane test of [Charikar 2002]'s SimHash
  * with axis-aligned planes); exact-cosine re-ranking of a Hamming
  * shortlist recovers the quantization loss — the modern BQ recipe.
  * Inputs longer than 64 dims raise loudly (a silent truncation would
  * rank on a prefix); NULL elements contribute an unset bit. */
case class BqEncode(child: Expression) extends UnaryExpression with KernelCodegen {
  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bq_encode expects array<float>, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n > 64) throw new IllegalArgumentException(
      s"bq_encode supports at most 64 dimensions, got $n — slice or " +
        "project the vector first (a silent prefix would mis-rank)")
    var code = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && arr.getFloat(i) > 0f) code |= (1L << i)
      i += 1
    }
    code
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Longest-common-substring length between a text column and a FIXED
  * pattern, via the pattern's suffix automaton [Blumer et al. 1985;
  * the standard online construction] — built once per executor from
  * the plan-literal pattern, then each document is matched in one
  * O(bytes) pass (follow transitions; on a miss, chase suffix links).
  * This is decontamination-grade EXACT matching at character
  * granularity: phrase search is token-aligned and n-gram screens are
  * fixed-width, but a benchmark string pasted mid-token, re-wrapped,
  * or partially quoted still yields a long character-level common
  * substring, which this measures exactly (lcs == pattern length ⇔
  * the full pattern occurs verbatim). Operates on UTF-8 bytes, which
  * equals character semantics for ASCII patterns; a multi-byte LCS is
  * measured in bytes (documented, deterministic). */
case class SubstringLcs(child: Expression, pattern: String)
    extends UnaryExpression with KernelCodegen {
  require(pattern != null && pattern.nonEmpty, "pattern must be non-empty")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "substring_lcs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"substring_lcs expects a string column, got ${other.sql}")
  }

  @transient private lazy val auto: SubstringLcs.Automaton =
    SubstringLcs.build(pattern.getBytes("UTF-8"))

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val a = auto
    var cur = 0
    var curLen = 0
    var best = 0
    var i = 0
    while (i < bytes.length) {
      val c = bytes(i) & 0xff
      while (cur != 0 && a.trans(cur)(c) < 0) {
        cur = a.link(cur)
        curLen = a.len(cur)
      }
      if (a.trans(cur)(c) >= 0) {
        cur = a.trans(cur)(c)
        curLen += 1
        if (curLen > best) best = curLen
      } else curLen = 0 // at the root with no edge: restart
      i += 1
    }
    best
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SubstringLcs {
  /** trans: state × byte → state (−1 = none); link: suffix links;
    * len: longest string length per state. */
  final case class Automaton(trans: Array[Array[Int]], link: Array[Int], len: Array[Int])

  private[operators] def build(p: Array[Byte]): Automaton = {
    val cap = 2 * p.length + 5
    val trans = Array.fill(cap)(Array.fill(256)(-1))
    val link = new Array[Int](cap)
    val len = new Array[Int](cap)
    link(0) = -1
    var size = 1
    var last = 0
    var i = 0
    while (i < p.length) {
      val c = p(i) & 0xff
      val cur = size; size += 1
      len(cur) = len(last) + 1
      link(cur) = -1
      var q = last
      while (q != -1 && trans(q)(c) == -1) {
        trans(q)(c) = cur
        q = link(q)
      }
      if (q == -1) link(cur) = 0
      else {
        val t = trans(q)(c)
        if (len(q) + 1 == len(t)) link(cur) = t
        else {
          val clone = size; size += 1
          len(clone) = len(q) + 1
          link(clone) = link(t)
          trans(clone) = trans(t).clone()
          while (q != -1 && trans(q)(c) == t) {
            trans(q)(c) = clone
            q = link(q)
          }
          link(t) = clone
          link(cur) = clone
        }
      }
      last = cur
      i += 1
    }
    Automaton(trans, link, len)
  }
}

/** Per-gram minhash components: a shingle STRING (space-joined tokens,
  * the [[ShingleSet]] output) → the k affine-family values
  * `a_j · mix(fold(fnv1a(token))) + b_j` that [[MinHashSignature]]
  * minimizes per document. Exists for the shared-postings path
  * ([[graft.operators.Dedup.nearDupScreen]]): when the exploded shingle
  * postings are already materialized for containment, the signature is
  * recovered as k element-wise MIN aggregates over these components —
  * bit-identical to the fused kernel (OperatorsSpec pins it), because a
  * space-joined gram splits back to exactly its source tokens (tokens
  * cannot contain the separator) and min over the distinct gram set
  * equals min over the positional multiset. Same wraparound-multiply
  * rationale for being native as MinHashSignature. */
case class GramSigComponents(child: Expression, k: Int)
    extends UnaryExpression with KernelCodegen {
  require(k >= 1, s"k must be >= 1, got $k")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_sig_components"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_sig_components expects a shingle string, got ${other.sql}")
  }

  @transient private lazy val family: (Array[Long], Array[Long]) =
    MinHashSignature.family(k)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    // split on 0x20 keeping empties (the exact inverse of the gram's
    // space join), fnv1a per token, MinHashSignature's rolling fold
    var h = 0L
    var tok = HashKernels.FnvBasis
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        h = h * 0x100000001b3L + tok
        tok = HashKernels.FnvBasis
      } else tok = HashKernels.fnv1aByte(tok, bytes(i))
      i += 1
    }
    h = HashKernels.mix(h)
    val (as, bs) = family
    val out = new Array[Long](k)
    var j = 0
    while (j < k) { out(j) = as(j) * h + bs(j); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LSH band buckets from a minhash signature: bucket b = hash of signature
  * components [b*rowsPerBand, (b+1)*rowsPerBand). Output array<long> of
  * length `bands`, position = band index (pair with posexplode). */
case class BandBuckets(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with KernelCodegen {
  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "band_buckets"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"band_buckets expects array<bigint> signature, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val sig = v.asInstanceOf[ArrayData]
    if (sig.numElements() < bands * rowsPerBand) return null
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong // band id folded in: same values in different bands ≠ same bucket
      var r = 0
      while (r < rowsPerBand) {
        h = h * 0x100000001b3L + sig.getLong(b * rowsPerBand + r)
        r += 1
      }
      out(b) = HashKernels.mix(h)
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fraction of equal components between two equal-length signatures — the
  * MinHash Jaccard estimate. */
case class SigAgreement(left: Expression, right: Expression)
    extends BinaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any =
    nullSafeEval(args(0), args(1))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "sig_agreement"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_agreement expects two array<bigint> signatures, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n == 0 || n != y.numElements()) return null
    var eq = 0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (x.getLong(i) == y.getLong(i)) eq += 1
      i += 1
    }
    eq.toDouble / n
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** FNV-1a 64-bit rolling hash over a string's UTF-8 bytes — a cheap,
  * deterministic document fingerprint. */
case class Fnv1a64(child: Expression) extends UnaryExpression with KernelCodegen {
  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "fnv1a64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fnv1a64 expects a string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    HashKernels.fnv1a(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Positional token n-grams: array<string> tokens → array<string> of the
  * space-joined grams starting at every position (length `n - width + 1`;
  * empty when the doc has fewer than `width` tokens). Pairs with
  * posexplode so downstream operators see `(pos, gram)` — the input to
  * duplicate-substring detection, where positions matter (contiguous
  * duplicated grams merge into spans), unlike the distinct shingle sets
  * the minhash path uses. One pass, single output allocation per gram;
  * byte-identical to DuckDB's `array_to_string(t[i:i+width-1], ' ')` so
  * the whole span pipeline replays value-level in the oracle. NULL tokens
  * (which `split` never produces) render as empty strings. */
case class TokenGrams(child: Expression, width: Int)
    extends UnaryExpression with KernelCodegen {
  require(width > 0, s"width must be positive, got $width")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_grams"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_grams expects array<string> of tokens, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    if (n < width)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - width + 1)
    val parts = new Array[UTF8String](2 * width - 1)
    var w = 1
    while (w < parts.length) { parts(w) = TokenGrams.Space; w += 2 }
    var i = 0
    while (i <= n - width) {
      var k = 0
      while (k < width) {
        parts(2 * k) =
          if (toks.isNullAt(i + k)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i + k)
        k += 1
      }
      out(i) = UTF8String.concat(parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TokenGrams {
  private val Space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
  private[operators] def SpaceSep = Space
}

/** DISTINCT token shingles, fused: array<string> tokens → the first-
  * occurrence-ordered distinct set of space-joined `width`-token grams
  * starting at positions 0..max(n−width, 0). Byte-identical to the
  * declarative chain `array_distinct(transform(sequence(0,
  * greatest(size(t)−w, 0)), i → concat_ws(' ', slice(t, i+1, w))))`
  * (including the short-doc case — a doc with fewer than `width` tokens
  * yields its single all-tokens gram — and concat_ws's skip-null join),
  * which is also DuckDB `list_distinct(list_transform(...))`, so every
  * shingle-replaying oracle keeps holding value-level. Exists because
  * that chain is the hot kernel of the whole dedup family (minhash
  * verify, containment, decontamination, KMV): the builtin form
  * allocates the position sequence, the transform array, and per-gram
  * concat_ws argument lists before array_distinct rescans the result —
  * one fused pass builds each gram once and dedupes inline. */
case class ShingleSet(child: Expression, width: Int)
    extends UnaryExpression with KernelCodegen {
  require(width > 0, s"width must be positive, got $width")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_set"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_set expects array<string> of tokens, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val toks = v.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val last = math.max(n - width, 0) // inclusive final start position
    val seen = new java.util.HashSet[UTF8String](Math.min(last + 1, 1 << 10) * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Any](last + 1)
    val parts = new scala.collection.mutable.ArrayBuffer[UTF8String](2 * width - 1)
    var i = 0
    while (i <= last) {
      // slice(t, i+1, width) ∩ non-null, joined by ' ' with concat_ws's
      // skip-null semantics (null elements vanish, no doubled separator)
      parts.clear()
      var k = i
      val end = math.min(i + width, n)
      while (k < end) {
        if (!toks.isNullAt(k)) {
          if (parts.nonEmpty) parts += TokenGrams.SpaceSep
          parts += toks.getUTF8String(k)
        }
        k += 1
      }
      val gram =
        if (parts.isEmpty) UTF8String.EMPTY_UTF8
        else UTF8String.concat(parts.toSeq: _*)
      if (seen.add(gram)) out += gram
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Deterministic weighted-sampling bucket over an integral id:
  * `((id * multiplier + salt) mod 2^64) >>> shift, mod buckets` — the Knuth
  * multiplicative-hash construction taking HIGH bits of the product. Lives
  * in a native kernel because the multiply must WRAP: under Spark 4's
  * default ANSI mode an overflowing long multiply in SQL is a runtime
  * error, and snowflake-style ids (~10^18) overflow for any useful
  * multiplier. Java long arithmetic wraps silently, which IS mod-2^64
  * semantics; `>>>` keeps the result non-negative so the final `%` needs
  * no pmod. Bit-reproducible at any id magnitude (oracle: HUGEINT mod-2^64
  * arithmetic). */
case class MixBucket(child: Expression, multiplier: Long, salt: Long, shift: Int, buckets: Int)
    extends UnaryExpression with KernelCodegen {
  require(shift > 0 && shift < 64, s"shift must be in 1..63, got $shift")
  require(buckets > 0, s"buckets must be positive, got $buckets")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "mix_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mix_bucket expects an integral id, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val id = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
    }
    ((id * multiplier + salt) >>> shift) % buckets
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** splitmix64 of (id + salt): a full-avalanche deterministic permutation
  * of Z/2^64 — unlike MixBucket's multiply-and-take-high-bits (which is
  * MONOTONIC below the wraparound point, so it cannot scramble small id
  * ranges), every input bit affects every output bit. The ordering
  * primitive for reproducible pseudo-random sampling. Wrapping arithmetic
  * lives here for the same ANSI reason as MixBucket. */
case class Mix64(child: Expression, salt: Long) extends UnaryExpression with KernelCodegen {
  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "mix64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mix64 expects an integral id, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val id = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
    }
    HashKernels.mix(id + salt)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sign-random-projection LSH bucket: one bit per hyperplane = sign of
  * dot(vec, plane); the packed bits are the bucket key. Planes are passed
  * as literal data baked into the expression (deterministic across runs). */
case class SrpBucket(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with KernelCodegen {
  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "srp_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_bucket expects array<float|double>, got ${other.sql}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    var bits = 0L
    var p = 0
    while (p < planeArr.length) {
      val plane = planeArr(p)
      var dot = 0.0
      var i = 0
      val m = math.min(n, plane.length)
      while (i < m) {
        if (vec.isNullAt(i)) return null
        val xv = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        dot += xv * plane(i)
        i += 1
      }
      if (dot >= 0.0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Gram repetition statistics — the Gopher repetition-filter kernel
  * (TextOps.repetitionStats): build every sliding word n-gram of the
  * token array, count occurrences, and return
  * struct(bestrun, bestlen, dupchars) where `bestrun` is the occurrence
  * count of the most frequent gram (ties → binary-smallest gram, i.e.
  * the first of a sorted list), `bestlen` that gram's char length, and
  * `dupchars` the total chars of beyond-first occurrences of all
  * duplicated grams. One hash-map pass per row — the declarative
  * equivalent (transform → array_sort → aggregate fold) interprets three
  * lambdas per gram and measured ~60× slower at 100k docs.
  * Gram text uses concat_ws(" ") semantics (null tokens skipped).
  * Fewer than n tokens → all-zero struct; NULL input → NULL. */
case class GramRepStats(child: Expression, n: Int)
    extends UnaryExpression with KernelCodegen {
  require(n >= 1, s"gram size must be >= 1, got $n")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = StructType(Seq(
    StructField("bestrun", IntegerType, nullable = false),
    StructField("bestlen", IntegerType, nullable = false),
    StructField("dupchars", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "gram_rep_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gram_rep_stats expects array<string> of tokens, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    import org.apache.spark.unsafe.types.UTF8String
    val toks = v.asInstanceOf[ArrayData]
    val nt = toks.numElements()
    val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    out.setInt(0, 0); out.setInt(1, 0); out.setInt(2, 0)
    if (nt < n) return out
    val sep = UTF8String.fromString(" ")
    val counts = new java.util.HashMap[UTF8String, Integer]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= nt - n) {
      var j = 0
      while (j < n) {
        // concatWs skips nulls — identical to concat_ws(" ", slice(...))
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      val gram = UTF8String.concatWs(sep, parts: _*) // fresh copy — safe map key
      counts.merge(gram, 1, (a, b) => a + b)
      i += 1
    }
    var bestrun = 0
    var best: UTF8String = null
    var dupchars = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      val g = e.getKey
      if (c > bestrun || (c == bestrun && g.compareTo(best) < 0)) {
        bestrun = c
        best = g
      }
      if (c > 1) dupchars += (c - 1) * g.numChars()
    }
    out.setInt(0, bestrun)
    out.setInt(1, if (best == null) 0 else best.numChars())
    out.setInt(2, dupchars)
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Product-quantization encoder: split the vector into `m` equal
  * subspaces and emit, per subspace, the index of the L2-nearest codebook
  * entry (ties → smallest index). Codebooks are trained driver-side on a
  * capped sample (Similarity.trainPqCodebooks) and baked into the
  * expression — an implicit broadcast, like SrpBucket's planes. The
  * output is `m` small ints per vector: at 100 TB this is the 16-32×
  * compression that lets an embedding corpus live in executor memory for
  * ADC scans. Codebook values are kept as the trained floats so the
  * distance arithmetic is bit-identical to the trainer and the oracle. */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression with KernelCodegen {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "codebooks must have at least one subspace with at least one code")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float|double>, got ${other.sql}")
  }

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val cb: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val sub = cb(0)(0).length

  override def nullSafeEval(v: Any): Any = {
    val vec = v.asInstanceOf[ArrayData]
    val m = cb.length
    if (vec.numElements() < m * sub) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * sub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb(s).length) {
        val c = cb(s)(j)
        var d = 0.0
        var i = 0
        while (i < sub) {
          if (vec.isNullAt(off + i)) return null
          val xv = if (isFloat) vec.getFloat(off + i).toDouble else vec.getDouble(off + i)
          val diff = xv - c(i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Asymmetric-distance-computation score: given a PQ code array and the
  * per-subspace lookup table t(s)(j) = dot(query_subspace, codebook(s)(j)),
  * the approximate dot(query, vector) is the sum of m table lookups in
  * subspace order — no vector access, no multiply. The table (m×k doubles)
  * is baked into the expression; the scan touches only the tiny code
  * column. */
case class PqAdcScore(child: Expression, table: Seq[Seq[Double]])
    extends UnaryExpression with KernelCodegen {
  require(table.nonEmpty, "lookup table must have at least one subspace")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_score expects array<int> of PQ codes, got ${other.sql}")
  }

  @transient private lazy val tab: Array[Array[Double]] = table.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val codes = v.asInstanceOf[ArrayData]
    if (codes.numElements() != tab.length) return null
    var score = 0.0
    var s = 0
    while (s < tab.length) {
      if (codes.isNullAt(s)) return null
      val j = codes.getInt(s)
      if (j < 0 || j >= tab(s).length) return null
      score += tab(s)(j)
      s += 1
    }
    score
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused IVF-residual PQ encoder (the FAISS IVFPQ data path): subtracts
  * the row's coarse centroid `centroids(cell)` element-wise — each
  * residual component rounded to float, the stored-residual semantics the
  * oracle replicates with `CAST(x - c AS REAL)` — and emits the
  * per-subspace L2-argmin codebook index (ties → smallest code) in one
  * pass with no intermediate residual column. Centroids and codebooks are
  * trained driver-side (Similarity.trainIvfPq) and baked in — an implicit
  * broadcast, like PqEncode's codebooks. Out-of-range cell, short vector,
  * or a NULL element → NULL. */
case class IvfPqEncode(
    vec: Expression,
    cell: Expression,
    centroids: Seq[Seq[Float]],
    codebooks: Seq[Seq[Seq[Float]]])
    extends BinaryExpression with KernelCodegen {
  require(centroids.nonEmpty, "centroids must be non-empty")
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "codebooks must have at least one subspace with at least one code")

  override def left: Expression = vec
  override def right: Expression = cell
  override protected def kernelEval(args: Array[Any]): Any =
    nullSafeEval(args(0), args(1))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ivf_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cell.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, c) => TypeCheckResult.TypeCheckFailure(
        s"ivf_pq_encode expects (array<float|double>, int), got ${v.sql} and ${c.sql}")
    }

  @transient private lazy val isFloat = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val cents: Array[Array[Float]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val cb: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val sub = cb(0)(0).length

  override def nullSafeEval(v: Any, c: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val cellId = c.asInstanceOf[Int]
    if (cellId < 0 || cellId >= cents.length) return null
    val cent = cents(cellId)
    val m = cb.length
    val dim = m * sub
    if (arr.numElements() < dim || cent.length < dim) return null
    // residual, each component rounded to float (stored-residual semantics)
    val resid = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      if (arr.isNullAt(i)) return null
      val xv = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      resid(i) = (xv - cent(i).toDouble).toFloat
      i += 1
    }
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val off = s * sub
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cb(s).length) {
        val e = cb(s)(j)
        var d = 0.0
        var k = 0
        while (k < sub) {
          val diff = resid(off + k).toDouble - e(k).toDouble
          d += diff * diff
          k += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(vec = l, cell = r)
}

/** int8 scalar quantization encode, PER-TENSOR SYMMETRIC (the int8 GEMM
  * convention): code[i] = clamp(floor(v[i] · 127 / absmax), −127, 127)
  * with one global scale, all arithmetic in double (float inputs
  * convert exactly, so the DuckDB oracle replays every code). The
  * single shared scale is what keeps the INTEGER dot of codes monotone
  * with the true float dot — per-dimension offsets/scales would distort
  * the ranking and force float dequantized scoring. Output array<int>
  * (1 byte/dim in practice, 4× smaller than float32). NULL for NULL
  * input or a NULL element; absmax ≤ 0 encodes all-zero. */
case class SqEncode(child: Expression, absmax: Float)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sq_encode expects array<float>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return null
      out(i) = Similarity.sqQuantize(v.getFloat(i), absmax)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Integer dot product of two array<int> code vectors — the SQ8 ADC
  * scoring primitive. Exact integer accumulation in a long: associative
  * and order-free, so distributed ranking and a single-threaded oracle
  * agree bit-for-bit with no float-order pinning. NULL on NULL input,
  * NULL element, or length mismatch. */
case class IntDot(left: Expression, right: Expression)
    extends BinaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any =
    nullSafeEval(args(0), args(1))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "int_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"int_dot expects two array<int> code vectors, got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getInt(i).toLong * y.getInt(i).toLong
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** FastCDC-style content-defined chunk boundaries [Xia et al. 2016,
  * "FastCDC: a Fast and Efficient Content-Defined Chunking Approach for
  * Data Deduplication"; gear hash from Ddelta]: walk the text's UTF-8
  * bytes with the gear rolling hash h = (h << 1) + gear(byte) (the shift
  * ages a byte out of the hash after 64 steps, so h at any position
  * depends only on the last 64 bytes — content, not offset), and cut
  * where the low `maskBits` bits of h are zero, subject to `minLen` /
  * `maxLen` chunk bounds: after a cut, candidate boundaries closer than
  * minLen are skipped, and maxLen forces a cut when no candidate
  * appears (the final chunk may be shorter than minLen by convention).
  * Because boundaries are chosen by CONTENT, inserting a prefix into a
  * document shifts every byte offset but re-synchronizes the cut points
  * within ~one chunk — so shared content between shifted documents
  * yields identical chunks, which fixed-size chunking can never do.
  *
  * gear(b) = splitmix64(b) over the byte value — the same audited mix
  * kernel the oracle replays in HUGEINT SQL; the per-chunk digest is the
  * FNV-1a 64 of the chunk's bytes (the q_fingerprint kernel). One pass,
  * no allocation beyond the output; returns
  * array<struct<start:int, chunk_len:int, digest:long>> in document
  * order. Empty string → empty array; NULL → NULL. Positions are BYTE
  * offsets (the published algorithms are byte-oriented); on ASCII text
  * they coincide with character offsets, which is what lets the DuckDB
  * oracle re-derive digests with substr(). */
case class GearCutpoints(child: Expression, maskBits: Int, minLen: Int, maxLen: Int)
    extends UnaryExpression with KernelCodegen {
  require(maskBits >= 1 && maskBits <= 48, s"maskBits out of range: $maskBits")
  require(minLen >= 1 && maxLen >= minLen,
    s"need 1 <= minLen <= maxLen, got $minLen..$maxLen")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("chunk_len", IntegerType, nullable = false),
      StructField("digest", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gear_cutpoints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gear_cutpoints expects a string, got ${other.sql}")
  }

  @transient private lazy val gear: Array[Long] =
    Array.tabulate(256)(b => HashKernels.mix(b.toLong))

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val n = bytes.length
    val mask = (1L << maskBits) - 1L
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var lastCut = 0
    var i = 0
    while (i < n) {
      h = (h << 1) + gear(bytes(i) & 0xff)
      val len = i + 1 - lastCut
      if ((len >= minLen && (h & mask) == 0L) || len == maxLen) {
        out += chunkRow(bytes, lastCut, i + 1)
        lastCut = i + 1
      }
      i += 1
    }
    if (lastCut < n) out += chunkRow(bytes, lastCut, n)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  private def chunkRow(bytes: Array[Byte], start: Int, end: Int): Any = {
    var h = HashKernels.FnvBasis
    var i = start
    while (i < end) {
      h = HashKernels.fnv1aByte(h, bytes(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](start, end - start, h))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hilbert-curve index of a 2-D point (classic xy2d recurrence —
  * per level s = 2^(bits−1)..1 the quadrant digit (3·rx) XOR ry scaled
  * by s², then reflect-and-transpose when ry = 0). A KERNEL rather
  * than unrolled Column `when`-chains deliberately: the pure-Column
  * form triples its expression tree per level (x and y each feed three
  * consumers), which at 8 levels left whole-stage codegen and measured
  * 165 s where this kernel measures sub-second — the one case where
  * "compose existing ops" loses to a 15-line Expression. Inputs must
  * lie in [0, 2^bits); out-of-range raises loudly (a silently masked
  * coordinate would corrupt the layout order). */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression with KernelCodegen {
  require(bits >= 1 && bits <= 31, s"bits out of range: $bits")

  override protected def kernelEval(args: Array[Any]): Any =
    nullSafeEval(args(0), args(1))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_index expects (bigint, bigint), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    var x = l.asInstanceOf[Long]
    var y = r.asInstanceOf[Long]
    val n = 1L << bits
    require(x >= 0L && x < n && y >= 0L && y < n,
      s"hilbert_index: ($x, $y) outside [0, $n) — mask coordinates upstream")
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Euclidean gcd of two non-negative longs — the fraction-reduction
  * primitive for exact-rational model surfaces (Kneser-Ney, isotonic):
  * Spark ships no gcd function, and reducing driver-side would force a
  * collect. gcd(0, b) = b, gcd(a, 0) = a, gcd(0, 0) = 0. Negative
  * input raises (reduced fractions here are always non-negative). */
case class LongGcd(left: Expression, right: Expression)
    extends BinaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any =
    nullSafeEval(args(0), args(1))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "long_gcd"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_gcd expects (bigint, bigint), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    var a = l.asInstanceOf[Long]
    var b = r.asInstanceOf[Long]
    require(a >= 0L && b >= 0L, s"long_gcd expects non-negative inputs, got ($a, $b)")
    while (b != 0L) { val t = a % b; a = b; b = t }
    a
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Winnowing document fingerprints [Schleimer, Wilkerson & Aiken,
  * SIGMOD 2003, "Winnowing: Local Algorithms for Document
  * Fingerprinting" — the MOSS algorithm]: hash every k-byte gram
  * (FNV-1a → splitmix64, masked to 40 bits), slide a window of `w`
  * consecutive grams, and in each window select the MINIMUM hash,
  * breaking ties by the RIGHTMOST position; consecutive windows
  * re-selecting the same gram record it once. Guarantee: two documents
  * sharing any substring of ≥ w + k − 1 bytes share at least one
  * selected fingerprint, while only ~2/(w+1) of grams are kept — the
  * local, position-robust substring-overlap index (exact-duplicate
  * hashing breaks on any edit; shingle Jaccard loses positions).
  *
  * The (min-hash, rightmost-pos) objective is packed into ONE integer
  * so a SQL oracle replays selection with a single windowed `min`:
  *   key(pos) = (h40 << 20) | (2^20 − 1 − pos)
  * — ascending key order == (hash asc, pos desc). Documents with more
  * than 2^20 grams raise loudly (the position field would wrap).
  * Documents shorter than k grams-wise yield an empty array; documents
  * with 1 ≤ #grams < w select over the single full-document window.
  *
  * Returns array<struct<pos int, fp long>> in ascending position order
  * (selection position strictly increases as the window slides: a
  * selection change either follows the old minimum falling out — every
  * survivor sits to its right — or a new rightmost minimum entering).
  * 40-bit fingerprints keep collisions negligible at corpus scale while
  * leaving 20 bits for the position pack; fp is always non-negative. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with KernelCodegen {
  require(k >= 1 && k <= 255, s"gram width out of range: $k")
  require(w >= 1 && w <= (1 << 16), s"window out of range: $w")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("pos", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "winnow_fingerprints"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects a string, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val nGrams = bytes.length - k + 1
    if (nGrams <= 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    require(nGrams <= (1 << 20),
      s"winnow_fingerprints: $nGrams grams exceed the 2^20 position pack")
    val keys = new Array[Long](nGrams)
    var p = 0
    while (p < nGrams) {
      var h = HashKernels.FnvBasis
      var i = 0
      while (i < k) { h = HashKernels.fnv1aByte(h, bytes(p + i)); i += 1 }
      val h40 = HashKernels.mix(h) & 0xffffffffffL
      keys(p) = (h40 << 20) | (0xfffffL - p)
      p += 1
    }
    // monotonic deque sliding minimum: O(nGrams) total
    val deque = new Array[Int](nGrams)
    var head = 0; var tail = 0 // [head, tail) holds candidate positions
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var lastSel = -1
    val wEff = math.min(w, nGrams)
    var e = 0
    while (e < nGrams) {
      while (tail > head && keys(deque(tail - 1)) >= keys(e)) tail -= 1
      deque(tail) = e; tail += 1
      if (deque(head) <= e - wEff) head += 1
      if (e >= wEff - 1) {
        val kmin = keys(deque(head))
        val selPos = (0xfffffL - (kmin & 0xfffffL)).toInt
        if (selPos != lastSel) {
          out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](selPos, kmin >>> 20))
          lastSel = selPos
        }
      }
      e += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Multi-pattern exact-occurrence search: ONE Aho–Corasick automaton
  * [Aho & Corasick, CACM 1975] over ALL fixed patterns, walked once per
  * document — O(bytes + matches) regardless of how many patterns the
  * benchmark suite holds. This is the decontamination matcher for the
  * thousands-of-patterns regime where K independent [[SubstringLcs]] /
  * `strpos` passes would cost K corpus scans: the automaton is built
  * once per executor from the plan-literal pattern list (broadcast
  * semantics for free) and the corpus never shuffles.
  *
  * The trie is fail-link-resolved into a dense DFA (goto covers every
  * byte at every state), and each state carries the FLATTENED list of
  * pattern ids ending there (own ids ++ the fail chain's — the
  * standard dictionary-suffix closure), so matching is a plain
  * state-transition walk with no link-chasing in the hot loop.
  * OVERLAPPING occurrences all count ("aa" occurs 3× in "aaaa"), and
  * nested patterns each count at their own end positions ("an" hits
  * inside every "scan" hit).
  *
  * Returns array<struct(pat_idx int, n_hits int, first_pos int)> with
  * one entry per pattern that occurs at least once, in pattern order;
  * `first_pos` is the 1-BASED byte offset of the first occurrence
  * (== character offset for ASCII patterns+text, the `strpos`
  * convention the oracle replays; a multi-byte corpus measures byte
  * offsets — documented, deterministic). NULL text → NULL (exploded
  * consumers drop the row); no-hit documents return an empty array. */
case class MultiPatternHits(child: Expression, patterns: Seq[String])
    extends UnaryExpression with KernelCodegen {
  require(patterns.nonEmpty, "need at least one pattern")
  require(patterns.forall(p => p != null && p.nonEmpty),
    "patterns must be non-empty")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pat_idx", IntegerType, nullable = false),
    StructField("n_hits", IntegerType, nullable = false),
    StructField("first_pos", IntegerType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "multi_pattern_hits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_hits expects a string column, got ${other.sql}")
  }

  @transient private lazy val auto: MultiPatternHits.Dfa =
    MultiPatternHits.build(patterns.map(_.getBytes("UTF-8")))
  @transient private lazy val patLens: Array[Int] =
    patterns.map(_.getBytes("UTF-8").length).toArray

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val a = auto
    val k = patterns.length
    val counts = new Array[Int](k)
    val firstEnd = new Array[Int](k)
    java.util.Arrays.fill(firstEnd, -1)
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = a.goto(s)(bytes(i) & 0xff)
      val out = a.out(s)
      var j = 0
      while (j < out.length) {
        val pid = out(j)
        if (counts(pid) == 0) firstEnd(pid) = i
        counts(pid) += 1
        j += 1
      }
      i += 1
    }
    val hits = scala.collection.mutable.ArrayBuffer.empty[Any]
    var p = 0
    while (p < k) {
      if (counts(p) > 0)
        hits += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](p, counts(p), firstEnd(p) - patLens(p) + 2))
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hits.toArray)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MultiPatternHits {
  /** goto: state × byte → state (fail-resolved, total); out: flattened
    * pattern ids ending at each state (dictionary-suffix closure). */
  final case class Dfa(goto: Array[Array[Int]], out: Array[Array[Int]])

  private[operators] def build(pats: Seq[Array[Byte]]): Dfa = {
    val cap = pats.map(_.length).sum + 1
    val goto = Array.fill(cap)(Array.fill(256)(-1))
    val own = Array.fill(cap)(List.empty[Int])
    var size = 1
    // trie
    pats.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      var i = 0
      while (i < p.length) {
        val c = p(i) & 0xff
        if (goto(s)(c) == -1) { goto(s)(c) = size; size += 1 }
        s = goto(s)(c)
        i += 1
      }
      own(s) = pid :: own(s)
    }
    // BFS fail links; resolve goto into a total DFA and close outputs
    // over the fail chain (out(s) = own(s) ++ out(fail(s)) — fail(s) is
    // always processed before s in BFS order)
    val fail = new Array[Int](size)
    val out = new Array[Array[Int]](size)
    out(0) = own(0).reverse.toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    var c = 0
    while (c < 256) {
      val t = goto(0)(c)
      if (t == -1) goto(0)(c) = 0
      else { fail(t) = 0; queue.enqueue(t) }
      c += 1
    }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      out(s) = (own(s).reverse ++ out(fail(s))).toArray
      var c2 = 0
      while (c2 < 256) {
        val t = goto(s)(c2)
        if (t == -1) goto(s)(c2) = goto(fail(s))(c2)
        else { fail(t) = goto(fail(s))(c2); queue.enqueue(t) }
        c2 += 1
      }
    }
    Dfa(goto.take(size), out)
  }
}

/** Surgical multi-pattern excision: the [[MultiPatternHits]] automaton
  * walk, but instead of counting, every matched span is UNION-marked
  * and the uncovered bytes are reassembled — decontamination by
  * excision (cut the benchmark string, keep the document) rather than
  * by dropping, the remedy of choice when a long document embeds one
  * quoted benchmark item. Overlapping and nested matches merge into
  * one cut (coverage is a set union, so excision is idempotent and
  * pattern-order-independent by construction). ASCII patterns can
  * never match inside a UTF-8 multi-byte sequence (continuation bytes
  * have the high bit set), so byte-level cuts keep multi-byte text
  * valid. NULL text → NULL. */
case class MultiPatternExcise(child: Expression, patterns: Seq[String])
    extends UnaryExpression with KernelCodegen {
  require(patterns.nonEmpty, "need at least one pattern")
  require(patterns.forall(p => p != null && p.nonEmpty),
    "patterns must be non-empty")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "multi_pattern_excise"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"multi_pattern_excise expects a string column, got ${other.sql}")
  }

  @transient private lazy val auto: MultiPatternHits.Dfa =
    MultiPatternHits.build(patterns.map(_.getBytes("UTF-8")))
  @transient private lazy val patLens: Array[Int] =
    patterns.map(_.getBytes("UTF-8").length).toArray

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val a = auto
    val covered = new Array[Boolean](bytes.length)
    var any = false
    var s = 0
    var i = 0
    while (i < bytes.length) {
      s = a.goto(s)(bytes(i) & 0xff)
      val out = a.out(s)
      var j = 0
      while (j < out.length) {
        var p = i - patLens(out(j)) + 1
        while (p <= i) { covered(p) = true; p += 1 }
        any = true
        j += 1
      }
      i += 1
    }
    if (!any) return v // common case: nothing matched, zero-copy
    val kept = new Array[Byte](bytes.length)
    var o = 0
    i = 0
    while (i < bytes.length) {
      if (!covered(i)) { kept(o) = bytes(i); o += 1 }
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(
      java.util.Arrays.copyOf(kept, o))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) via the JDK's
  * `java.text.Normalizer` — the canonical text-hygiene step before any
  * hashing/dedup/tokenization pass, since visually identical strings
  * with different codepoint sequences (é vs e+U+0301; ﬁ vs fi under
  * the K forms) otherwise land in different hash buckets. Pure-ASCII
  * inputs short-circuit without allocating (a byte scan — ASCII is
  * normalized under every form), so the kernel runs at scan speed on
  * the common case. NULL in → NULL out. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with KernelCodegen {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"form must be one of NFC/NFD/NFKC/NFKD, got $form")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "unicode_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects a string argument, got ${other.sql}")
  }

  @transient private lazy val jform = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val bytes = u.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) return u
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, jform)) u
    else org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s, jform))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Mojibake repair: invert the classic UTF-8-bytes-decoded-as-
  * Latin-1/Windows-1252 corruption ("é" shipped as "Ã©", "—" as
  * "â€”") that web crawls accumulate when an origin lies about its
  * charset. The ftfy recipe (Speer, "fixes text for you"), reduced to
  * its sound core: map each char back to the byte it mis-decoded from
  * (identity for U+0000–U+00FF, the Windows-1252 table for the
  * € ‚ ƒ „ …-range punctuation that Latin-1 maps to C1 controls),
  * STRICTLY re-decode as UTF-8, and accept only if the decode is valid
  * and actually changed something; iterate to a fixpoint (bounded) so
  * double-mangled text also unwinds. Untouchable strings — genuine
  * Latin-1 text, anything with chars outside the byte-mappable range —
  * return unchanged, because a strict decoder rejects them; the
  * residual ambiguity (text that IS meant to read "Ã©") is inherent to
  * the problem and documented here rather than hidden. Pure-ASCII
  * inputs short-circuit on a byte scan. NULL in → NULL out. */
case class FixMojibake(child: Expression)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "fix_mojibake"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fix_mojibake expects a string argument, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val u = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val bytes = u.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    if (ascii) return u
    var cur = u.toString
    var rounds = 0
    var changed = true
    while (changed && rounds < 4) {
      changed = false
      FixMojibake.unmangle(cur) match {
        case Some(fixed) if fixed != cur => cur = fixed; changed = true
        case _ => ()
      }
      rounds += 1
    }
    if (cur == u.toString) u
    else org.apache.spark.unsafe.types.UTF8String.fromString(cur)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object FixMojibake {
  /** Windows-1252 0x80–0x9F mappings (the printable subset); Latin-1
    * leaves these as C1 controls, real-world mojibake mixes both. */
  private val cp1252Inverse: Map[Char, Byte] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F
  ).map { case (c, b) => c -> b.toByte }

  /** One unmangle round: chars → the bytes they mis-decoded from,
    * then a STRICT UTF-8 decode. None when any char is unmappable, the
    * byte stream isn't valid UTF-8, or nothing would change (no byte
    * ≥ 0x80 — pure ASCII can't be mojibake). */
  private[operators] def unmangle(s: String): Option[String] = {
    val out = new Array[Byte](s.length)
    var i = 0
    var hasHigh = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c <= 'ÿ') out(i) = c.toByte
      else cp1252Inverse.get(c) match {
        case Some(b) => out(i) = b
        case None => return None
      }
      if ((out(i) & 0x80) != 0) hasHigh = true
      i += 1
    }
    if (!hasHigh) return None
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try Some(dec.decode(java.nio.ByteBuffer.wrap(out)).toString)
    catch { case _: java.nio.charset.CharacterCodingException => None }
  }
}

/** Dense matrix–vector projection with the matrix as a plan literal —
  * the Johnson–Lindenstrauss embedding-compression kernel (project
  * d-dim float vectors to k ≪ d dims through a deterministic random
  * matrix; pairwise geometry is preserved within the JL bound, and
  * downstream ANN/dedup run on vectors k/d the size). Per output dim
  * the accumulation is double in ELEMENT ORDER then one float rounding
  * — the [[CosineSimilarity]] determinism discipline, so an oracle
  * replays values bit-for-bit from the same literal matrix. NULL in →
  * NULL out; length mismatch → NULL (the error→NULL discipline). */
case class MatVecProject(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression with KernelCodegen {
  require(planes.nonEmpty && planes.map(_.size).distinct.size == 1,
    "planes must be a non-empty rectangular matrix")

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mat_vec_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec_project expects array<float|double>, got ${other.sql}")
  }

  @transient private lazy val m: Array[Array[Double]] = planes.map(_.toArray).toArray
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val d = m(0).length
    if (arr.numElements() != d) return null
    val x = new Array[Double](d)
    var i = 0
    while (i < d) {
      // a NULL element would read back as 0.0 and silently corrupt the
      // projection — the CosineSimilarity convention is NULL out
      if (arr.isNullAt(i)) return null
      x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val out = new Array[Float](m.length)
    var j = 0
    while (j < m.length) {
      val row = m(j)
      var acc = 0.0
      i = 0
      while (i < d) { acc += row(i) * x(i); i += 1 }
      out(j) = acc.toFloat
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Threshold-bounded Levenshtein distance between two TOKEN sequences
  * (insert/delete/substitute whole tokens) — the paraphrase-dedup
  * distance between shingle-Jaccard (order-blind) and char edit
  * distance (a swapped word costs its whole length there; one unit
  * here). Banded two-row DP confined to the |i−j| ≤ maxDist diagonal
  * with an early exit once a whole row exceeds the threshold — O(d·n)
  * per pair, the same discipline as Spark's own bounded `levenshtein`,
  * whose contract this mirrors: returns −1 when the distance exceeds
  * `maxDist`. Token equality is byte equality of the UTF8 payloads.
  * NULL argument or NULL element → NULL (kernel contract). */
case class TokenLevenshtein(left: Expression, right: Expression, maxDist: Int)
    extends BinaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any =
    nullSafeEval(args(0), args(1))

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "token_levenshtein"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), ArrayType(_: StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"token_levenshtein expects two array<string> arguments, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    if (math.abs(n - m) > maxDist) return -1
    val xs = new Array[org.apache.spark.unsafe.types.UTF8String](n)
    val ys = new Array[org.apache.spark.unsafe.types.UTF8String](m)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      xs(i) = x.getUTF8String(i); i += 1
    }
    i = 0
    while (i < m) {
      if (y.isNullAt(i)) return null
      ys(i) = y.getUTF8String(i); i += 1
    }
    // `big` marks cells outside the band / past the threshold; any
    // value > maxDist is equivalent, so saturating at maxDist + 1
    // keeps the arithmetic overflow-free
    val big = maxDist + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= maxDist) j else big; j += 1 }
    i = 1
    while (i <= n) {
      val lo = math.max(1, i - maxDist)
      val hi = math.min(m, i + maxDist)
      cur(0) = if (i <= maxDist) i else big
      if (lo > 1) cur(lo - 1) = big // stale cell left of the band
      var rowMin = if (lo == 1) cur(0) else big
      j = lo
      while (j <= hi) {
        val sub = math.min(big,
          prev(j - 1) + (if (xs(i - 1).equals(ys(j - 1))) 0 else 1))
        val del = math.min(big, prev(j) + 1)
        val ins = math.min(big, cur(j - 1) + 1)
        val v = math.min(sub, math.min(del, ins))
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = big // stale cell right of the band
      if (rowMin > maxDist) return -1
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) > maxDist) -1 else prev(m)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** [[TextOps.log2fp]] as a kernel expression — quantized log2 with 10
  * fractional bits, exact integer shift-square arithmetic the DuckDB
  * oracle replays as 10 unrolled HUGEINT steps. NULL/non-positive →
  * NULL. */
case class Log2Fp(child: Expression) extends UnaryExpression with KernelCodegen {
  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "log2fp"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"log2fp expects an integer argument, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val f = v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    }
    if (f < 1 || f >= (1L << 50)) null else TextOps.log2fp(f)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SentencePiece-style unigram-LM Viterbi segmentation of whitespace
  * words over a GIVEN piece vocabulary with integer costs (plan-literal
  * kernel data, the [[SubstringLcs]] discipline). Per word the DP
  * minimizes the COMBINED integer objective `1024·cost_fp + 1` per
  * piece — lexicographically (summed cost, then piece count), and the
  * per-word optimum decomposes exactly back into those two components
  * (piece count ≤ word length < 1024 by the guard below): both are
  * tie-free values an oracle replays without knowing the backtrack.
  * Among objective-equal segmentations the emitted STRING prefers the
  * longer last piece at every cut (l scanned descending with strict
  * improvement), applied recursively — fully deterministic.
  *
  * The caller guarantees every single character of the input occurs in
  * the vocab ([[TextOps.unigramVocab]] constructs it that way); a
  * missing character raises loudly instead of silently skipping.
  * Returns struct(seg, n_pieces, cost_fp); NULL in → NULL out. */
case class UnigramSegmentText(
    child: Expression,
    vocab: Seq[(String, Long)],
    maxPieceLen: Int)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def nullable: Boolean = true
  override def prettyName: String = "unigram_segment"

  override def dataType: DataType = StructType(Seq(
    StructField("seg", StringType),
    StructField("n_pieces", LongType),
    StructField("cost_fp", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment expects a string argument, got ${other.sql}")
  }

  @transient private lazy val combined: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c * 1024L + 1L)) }
    m
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val words = text.split(" ", -1)
    val seg = new java.lang.StringBuilder(text.length * 2)
    var nPieces = 0L
    var costTotal = 0L
    var w = 0
    while (w < words.length) {
      val word = words(w)
      val n = word.length
      // empty split slots (doubled/leading/trailing spaces) render as
      // nothing: non-empty word segs join with SINGLE spaces, matching
      // the oracle convention (DuckDB replicas drop empty words too)
      if (n > 0) {
        if (seg.length > 0) seg.append(' ')
        require(n < 1024,
          s"unigram_segment: word of length $n breaks the 1024-scale " +
            "piece-count decomposition; split such tokens upstream")
        val INF = Long.MaxValue / 4
        val best = new Array[Long](n + 1)
        val ptr = new Array[Int](n + 1)
        var j = 1
        while (j <= n) {
          best(j) = INF
          var l = math.min(maxPieceLen, j)
          while (l >= 1) {
            if (best(j - l) < INF) {
              val c = combined.get(word.substring(j - l, j))
              if (c != null) {
                val cand = best(j - l) + c.longValue()
                // strict <: l runs DESCENDING, so the longest minimal
                // last piece wins ties of the combined objective
                if (cand < best(j)) { best(j) = cand; ptr(j) = l }
              }
            }
            l -= 1
          }
          if (best(j) == INF)
            throw new IllegalStateException(
              s"unigram_segment: no vocab piece covers '${word.charAt(j - 1)}' — " +
                "the vocab must contain every single character " +
                "(TextOps.unigramVocab constructs it that way)")
          j += 1
        }
        val cuts = new Array[Int](n)
        var k = 0
        var p = n
        while (p > 0) { cuts(k) = p; k += 1; p -= ptr(p) }
        var q = k - 1
        var start = 0
        while (q >= 0) {
          val end = cuts(q)
          if (start > 0) seg.append('·')
          seg.append(word, start, end)
          start = end
          q -= 1
        }
        nPieces += best(n) % 1024L
        costTotal += best(n) / 1024L
      }
      w += 1
    }
    InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(seg.toString),
      nPieces, costTotal)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** WordPiece greedy longest-match-first segmentation [Wu et al. 2016,
  * "Google's Neural Machine Translation System"; the BERT tokenizer's
  * MaxMatch]: per word, repeatedly take the LONGEST vocab piece
  * matching at the cursor — word-initial pieces and mid-word
  * continuation pieces are distinct vocab entries (form 0 / form 1,
  * BERT's `##` convention) — and emit `[UNK]` for the whole word if any
  * position has no match. Completes the tokenizer trio next to BPE
  * (merge-rule) and unigram-LM (Viterbi): greedy MaxMatch is fully
  * deterministic given the vocab, so unlike the unigram segmentation
  * string (tie-ruled, spec-pinned) the WordPiece OUTPUT STRING itself
  * is oracle-comparable.
  *
  * `vocab` is (piece-characters, form); the rendering adds `##` to
  * continuation pieces and joins pieces with U+00B7 inside a word,
  * words with ' ' (the [[UnigramSegmentText]] display convention).
  * Returns struct(seg, n_pieces long, n_unk long) — an UNK word counts
  * one piece and one unk. NULL in → NULL out. */
case class WordPieceSegmentText(child: Expression, vocab: Seq[(String, Int)])
    extends UnaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def nullable: Boolean = true
  override def prettyName: String = "wordpiece_segment"

  override def dataType: DataType = StructType(Seq(
    StructField("seg", StringType),
    StructField("n_pieces", LongType),
    StructField("n_unk", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wordpiece_segment expects a string argument, got ${other.sql}")
  }

  @transient private lazy val (initSet, contSet, maxLen) = {
    val init = new java.util.HashSet[String]()
    val cont = new java.util.HashSet[String]()
    var ml = 1
    vocab.foreach { case (p, f) =>
      require(f == 0 || f == 1, s"wordpiece form must be 0 or 1, got $f")
      require(p.nonEmpty, "empty wordpiece")
      (if (f == 0) init else cont).add(p)
      ml = math.max(ml, p.length)
    }
    (init, cont, ml)
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val words = text.split(" ", -1)
    val seg = new java.lang.StringBuilder(text.length * 2)
    var nPieces = 0L
    var nUnk = 0L
    var w = 0
    while (w < words.length) {
      val word = words(w)
      val n = word.length
      // empty split slots (doubled/leading/trailing spaces) render as
      // nothing: non-empty word segs join with SINGLE spaces, the
      // convention the q_wordpiece oracle replays (it drops empty
      // split slots and joins with ' ')
      if (n > 0) {
        if (seg.length > 0) seg.append(' ')
        val mark = seg.length
        var pieces = 0L
        var ofs = 0
        var unk = false
        while (ofs < n && !unk) {
          val set = if (ofs == 0) initSet else contSet
          var l = math.min(maxLen, n - ofs)
          var hit = 0
          while (l >= 1 && hit == 0) {
            if (set.contains(word.substring(ofs, ofs + l))) hit = l
            l -= 1
          }
          if (hit == 0) unk = true
          else {
            if (ofs > 0) { seg.append('·'); seg.append("##") }
            seg.append(word, ofs, ofs + hit)
            ofs += hit
            pieces += 1
          }
        }
        if (unk) {
          seg.setLength(mark)
          seg.append("[UNK]")
          nPieces += 1
          nUnk += 1
        } else nPieces += pieces
      }
      w += 1
    }
    InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(seg.toString),
      nPieces, nUnk)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Credit-card redaction with LUHN VALIDATION — the compliance-scrub
  * sharp edge a plain regexp_replace cannot express: a 16-digit run is
  * only a card number if its checksum validates, and redacting every
  * digit run would destroy order ids, timestamps, and phone numbers.
  *
  * Candidate spans are maximal `[0-9]([0-9 -]*[0-9])?` runs (digits
  * optionally grouped by spaces/dashes — "4111 1111 1111 1111"),
  * exactly the leftmost-greedy matches of that pattern in BOTH
  * java.util.regex and RE2 (no lookaround), so a DuckDB oracle replays
  * the extraction verbatim with regexp_extract_all. A span whose digit
  * count is 13..19 is a candidate; a candidate passing the Luhn check
  * (double every second digit from the right, subtract 9 over 9, sum
  * divisible by 10) is replaced by the marker, everything else is kept
  * byte-for-byte.
  *
  * Returns struct(redacted, n_spans, n_valid, digits_masked) — the
  * three counters are the oracle-compared surface; the redacted string
  * itself is spec-pinned. NULL in → NULL out. */
case class LuhnRedact(child: Expression, marker: String)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def nullable: Boolean = true
  override def prettyName: String = "luhn_redact"

  override def dataType: DataType = StructType(Seq(
    StructField("redacted", StringType),
    StructField("n_spans", LongType),
    StructField("n_valid", LongType),
    StructField("digits_masked", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"luhn_redact expects a string argument, got ${other.sql}")
  }

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val out = new java.lang.StringBuilder(text.length)
    var nSpans = 0L
    var nValid = 0L
    var masked = 0L
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c < '0' || c > '9') { out.append(c); i += 1 }
      else {
        // maximal [0-9 -] run from the first digit, trimmed back to the
        // last digit — identical to the pattern's leftmost-greedy match
        var k = i
        while (k < n && { val ch = text.charAt(k)
          (ch >= '0' && ch <= '9') || ch == ' ' || ch == '-' }) k += 1
        while ({ val ch = text.charAt(k - 1); ch < '0' || ch > '9' }) k -= 1
        var digits = 0
        var j = i
        while (j < k) {
          val ch = text.charAt(j)
          if (ch >= '0' && ch <= '9') digits += 1
          j += 1
        }
        val isCandidate = digits >= 13 && digits <= 19
        var valid = false
        if (isCandidate) {
          nSpans += 1L
          // Luhn: rightmost digit undoubled, every second from there on
          // doubled (minus 9 over 9)
          var sum = 0
          var pos = 0
          j = k - 1
          while (j >= i) {
            val ch = text.charAt(j)
            if (ch >= '0' && ch <= '9') {
              var d = ch - '0'
              if (pos % 2 == 1) { d *= 2; if (d > 9) d -= 9 }
              sum += d
              pos += 1
            }
            j -= 1
          }
          valid = sum % 10 == 0
        }
        if (valid) {
          nValid += 1L
          masked += digits
          out.append(marker)
        } else out.append(text, i, k)
        i = k
      }
    }
    InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(out.toString),
      nSpans, nValid, masked)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IBAN redaction with MOD-97 VALIDATION (ISO 13616) — [[LuhnRedact]]'s
  * companion for bank account numbers: a candidate is only an IBAN if
  * the check passes, so invoice codes and uppercase product SKUs
  * survive.
  *
  * Candidate spans are maximal `[A-Z0-9]+` runs (replayable as
  * regexp_extract_all in RE2 and Java alike) whose shape is
  * 2 letters + 2 digits + 11..30 alphanumerics (total 15..34).
  * Validation rearranges (body + first 4 chars), expands letters to
  * two-digit codes (A=10..Z=35), and folds the digit stream through
  * `acc = (acc*10 + d) mod 97` (letters: `acc*100 + code`) — valid iff
  * the remainder is 1. The fold form keeps every intermediate below
  * 10^4, so the oracle replays it with plain integer arithmetic (no
  * big-number type needed at any IBAN length).
  *
  * Returns struct(redacted, n_spans, n_valid, chars_masked); the
  * counters are oracle-compared, the string spec-pinned. NULL in →
  * NULL out. */
case class IbanRedact(child: Expression, marker: String)
    extends UnaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any = nullSafeEval(args(0))
  override def nullable: Boolean = true
  override def prettyName: String = "iban_redact"

  override def dataType: DataType = StructType(Seq(
    StructField("redacted", StringType),
    StructField("n_spans", LongType),
    StructField("n_valid", LongType),
    StructField("chars_masked", LongType)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"iban_redact expects a string argument, got ${other.sql}")
  }

  private def isAlnum(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val out = new java.lang.StringBuilder(text.length)
    var nSpans = 0L
    var nValid = 0L
    var masked = 0L
    val n = text.length
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (!isAlnum(c)) { out.append(c); i += 1 }
      else {
        var k = i
        while (k < n && isAlnum(text.charAt(k))) k += 1
        val len = k - i
        val shapeOk = len >= 15 && len <= 34 &&
          text.charAt(i).isLetter && text.charAt(i + 1).isLetter &&
          text.charAt(i + 2).isDigit && text.charAt(i + 3).isDigit
        var valid = false
        if (shapeOk) {
          nSpans += 1L
          // rearranged = body + first 4; fold mod 97
          var acc = 0L
          def feed(ch: Char): Unit =
            if (ch.isDigit) acc = (acc * 10 + (ch - '0')) % 97
            else acc = (acc * 100 + (ch - 'A' + 10)) % 97
          var j = i + 4
          while (j < k) { feed(text.charAt(j)); j += 1 }
          j = i
          while (j < i + 4) { feed(text.charAt(j)); j += 1 }
          valid = acc == 1L
        }
        if (valid) {
          nValid += 1L
          masked += len
          out.append(marker)
        } else out.append(text, i, k)
        i = k
      }
    }
    InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString(out.toString),
      nSpans, nValid, masked)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
