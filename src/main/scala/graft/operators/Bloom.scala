package graft.operators

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Deterministic Bloom filter: a distributed build aggregate plus a narrow
 * membership kernel. The design point is benchmark decontamination and
 * URL/id blocklists at 100 TB: the small side (benchmark grams, blocked
 * domains) folds into a few-MB bit array with NO shuffle — partial filters
 * are OR-merged map-side like any partial aggregate — and the corpus side
 * then tests membership in a narrow, codegen'd filter with NO join at all.
 * Compare `Curation.decontaminate`, which must distinct + broadcast the
 * gram SET (tens of GB at 10^9 grams, and a shuffle to distinct it);
 * the Bloom path trades a deterministic, tunable false-positive rate for
 * a corpus scan that never touches an Exchange.
 *
 * Hashing is the repo's oracle-replicable kernel family (FNV-1a 64 →
 * splitmix64), double-hashed Kirsch–Mitzenmacher style:
 *   h1 = splitmix64(fnv1a64(bytes)),  h2 = splitmix64(h1) | 1  (odd)
 *   bit_i = (h1 + i·h2)  mod 2^64  mod numBits,  i = 0..k−1
 * Every step is mod-2^64 integer arithmetic, so DuckDB replays the exact
 * bit positions with HUGEINT (see SparkEntry's q_bloom_decontam oracle) —
 * even the false positives are value-pinned.
 */
object BloomKernel {

  /** Self-describing filter layout (big-endian):
    * [int32 numHashes][int64 numBits][int64 words...] */
  def toBytes(numHashes: Int, numBits: Long, words: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * words.length)
    bb.putInt(numHashes)
    bb.putLong(numBits)
    words.foreach(bb.putLong)
    bb.array()
  }

  def parse(bytes: Array[Byte]): (Int, Long, Array[Long]) = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt()
    val m = bb.getLong()
    val words = new Array[Long]((bytes.length - 12) / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    (k, m, words)
  }

  def h1Of(s: UTF8String): Long = HashKernels.mix(HashKernels.fnv1a(s))

  def h2Of(h1: Long): Long = HashKernels.mix(h1) | 1L

  /** Bit index of probe i — unsigned mod keeps parity with the HUGEINT
    * oracle at any hash value. */
  def position(h1: Long, h2: Long, i: Int, numBits: Long): Long =
    java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, numBits)

  def set(words: Array[Long], bit: Long): Unit =
    words((bit >>> 6).toInt) |= (1L << (bit & 63L))

  def get(words: Array[Long], bit: Long): Boolean =
    (words((bit >>> 6).toInt) & (1L << (bit & 63L))) != 0L
}

/** Distributed Bloom build over a string column. Each task folds its rows
  * into a local bit array; partials are OR-merged (map-side combine, then
  * one tiny final merge) — the inserted values themselves never shuffle.
  * Output is the self-describing binary of BloomKernel.toBytes. NULL
  * inputs are skipped (a filter over the non-null domain). */
case class BloomBuildAgg(
    child: Expression,
    numBits: Long,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  require(numBits <= (1L << 33),
    s"numBits must be <= 2^33 (1 GiB filter), got $numBits")
  require(numHashes > 0 && numHashes <= 32,
    s"numHashes must be in 1..32, got $numHashes")

  override def prettyName: String = "bloom_build"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_build expects a string column, got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long]((numBits / 64).toInt)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h1 = BloomKernel.h1Of(v.asInstanceOf[UTF8String])
      val h2 = BloomKernel.h2Of(h1)
      var i = 0
      while (i < numHashes) {
        BloomKernel.set(buffer, BloomKernel.position(h1, h2, i, numBits))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    BloomKernel.toBytes(numHashes, numBits, buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    BloomKernel.toBytes(numHashes, numBits, buffer)

  override def deserialize(storageFormat: Array[Byte]): Array[Long] =
    BloomKernel.parse(storageFormat)._3

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Membership test against a built filter. The filter side is typically a
  * Literal (the collected build result baked into the plan — an implicit
  * broadcast, like the ANN centroids); the parsed words are cached once
  * per expression instance, so the per-row cost is k bit probes. A
  * non-foldable filter column is parsed per row (correct, slower). Never
  * NULL for non-NULL inputs; false positives possible at the configured
  * rate, false negatives never. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with KernelCodegen {

  override protected def kernelEval(args: Array[Any]): Any =
    nullSafeEval(args(0), args(1))
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects (string, binary filter), got ${l.sql}, ${r.sql}")
    }

  @transient private lazy val staticFilter: (Int, Long, Array[Long]) =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) null else BloomKernel.parse(v.asInstanceOf[Array[Byte]])
    } else null

  override def nullSafeEval(item: Any, filter: Any): Any = {
    val (k, m, words) =
      if (staticFilter != null) staticFilter
      else BloomKernel.parse(filter.asInstanceOf[Array[Byte]])
    val h1 = BloomKernel.h1Of(item.asInstanceOf[UTF8String])
    val h2 = BloomKernel.h2Of(h1)
    var i = 0
    while (i < k) {
      if (!BloomKernel.get(words, BloomKernel.position(h1, h2, i, m))) return false
      i += 1
    }
    true
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused membership count: whitespace tokens → distinct n-token shingles →
  * Bloom probes, one kernel call per row. Replaces the declarative
  * `aggregate(shingles(...), ...)` fold in the decontamination scan:
  * higher-order functions are CodegenFallback in Spark, so the fold paid
  * per-element lambda binding AND pushed the whole projection out of
  * WholeStageCodegen (the MinHashSignature lesson, exprs.scala:160-163).
  * Shingle semantics are exactly `Dedup.shingles` (slice caps at the end,
  * concat_ws skips NULL tokens, distinct by string content), so the
  * HUGEINT oracle for q_bloom_decontam replays unchanged. Input is the
  * token array (`split(text, " ")` — codegen'd); NULL array → NULL. */
case class BloomCountContained(left: Expression, right: Expression, n: Int)
    extends BinaryExpression with KernelCodegen {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override protected def kernelEval(args: Array[Any]): Any =
    nullSafeEval(args(0), args(1))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_count_contained"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(_: StringType, _), BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_count_contained expects (array<string> tokens, binary filter), " +
          s"got ${l.sql}, ${r.sql}")
    }

  @transient private lazy val staticFilter: (Int, Long, Array[Long]) =
    if (right.foldable) {
      val v = right.eval(null)
      if (v == null) null else BloomKernel.parse(v.asInstanceOf[Array[Byte]])
    } else null

  override def nullSafeEval(toksAny: Any, filterAny: Any): Any = {
    val (k, m, words) =
      if (staticFilter != null) staticFilter
      else BloomKernel.parse(filterAny.asInstanceOf[Array[Byte]])
    val toks = toksAny.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val sz = toks.numElements()
    if (sz == 0) return 0L
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.HashSet[UTF8String]()
    var count = 0L
    val nPos = math.max(sz - n, 0) + 1
    var i = 0
    while (i < nPos) {
      val end = math.min(i + n, sz)
      val parts = new java.util.ArrayList[UTF8String](n)
      var j = i
      while (j < end) {
        if (!toks.isNullAt(j)) parts.add(toks.getUTF8String(j))
        j += 1
      }
      val gram = UTF8String.concatWs(sep, parts.toArray(new Array[UTF8String](parts.size())): _*)
      if (seen.add(gram)) {
        val h1 = BloomKernel.h1Of(gram)
        val h2 = BloomKernel.h2Of(h1)
        var p = 0
        var all = true
        while (all && p < k) {
          all = BloomKernel.get(words, BloomKernel.position(h1, h2, p, m))
          p += 1
        }
        if (all) count += 1
      }
      i += 1
    }
    count
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Column API + pipeline entry points for the Bloom path (SQL names
  * `bloom_build` / `bloom_might_contain` / `bloom_count_contained` are
  * registered by `JsonFunctions.registerAll` / the extension path
  * alongside the other kernels). */
object Bloom {

  /** Aggregate Column: build a filter over a string column. */
  def bloomBuild(c: Column, numBits: Long, numHashes: Int): Column =
    GraftSqlShim.column(
      BloomBuildAgg(GraftSqlShim.expression(c), numBits, numHashes)
        .toAggregateExpression())

  /** Membership test Column; `filter` is typically `lit(bytes)` of a
    * built filter. */
  def bloomMightContain(c: Column, filter: Column): Column =
    GraftSqlShim.column(
      BloomMightContain(GraftSqlShim.expression(c), GraftSqlShim.expression(filter)))

  /** Fused count of distinct n-token shingles of `tokens` present in the
    * filter (see BloomCountContained). */
  def bloomCountContained(tokens: Column, filter: Column, n: Int): Column =
    GraftSqlShim.column(BloomCountContained(
      GraftSqlShim.expression(tokens), GraftSqlShim.expression(filter), n))

  /** Run the build aggregate and return the filter bytes (numBits/8 + 12
    * bytes on the driver — a few MB at most by the numBits cap; the
    * inserted values never leave their tasks). */
  def buildFilter(df: DataFrame, c: Column, numBits: Long, numHashes: Int): Array[Byte] =
    df.select(bloomBuild(c, numBits, numHashes).as("filter"))
      .head().getAs[Array[Byte]](0)

  /** Bloom-filter benchmark decontamination: same contract as
    * `Curation.decontaminate` (word n-gram overlap against an eval set,
    * shingling via `Dedup.shingles`) but the benchmark gram SET never
    * materializes — it folds into a `numBits`-bit filter with no shuffle,
    * and the corpus side is then a single narrow projection: the per-row
    * gram array is membership-tested in place (`aggregate` over the
    * array), so the corpus never explodes its grams, never joins, and
    * never touches an Exchange (PlanQualitySpec pins zero Exchange/Join).
    * The price is a tunable false-positive rate on `n_flagged_grams` —
    * hence `maybe_contaminated`: a screening pass; route the flagged
    * sliver through `Curation.decontaminate` when exactness matters.
    * Returns `(id, n_flagged_grams, maybe_contaminated)` per train row. */
  def decontaminate(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      numBits: Long = 1L << 27,
      numHashes: Int = 7): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val filter = buildFilter(
      benchmark.select(explode(Dedup.shingles(col(textCol), n)).as("gram")),
      col("gram"), numBits, numHashes)
    // fused kernel: tokenize (codegen'd split) → in-kernel distinct
    // shingles → k probes each; one call per row, no per-gram lambdas
    val flagged = bloomCountContained(split(col(textCol), " "), lit(filter), n)
    // two-step select: the count is multi-referenced, so CollapseProject
    // keeps one evaluation of the membership kernel per row
    train.select(col(idCol), flagged.as("n_flagged_grams"))
      .select(col(idCol), col("n_flagged_grams"),
        (col("n_flagged_grams") > 0).as("maybe_contaminated"))
  }
}
