package graft

import graft.operators.{HashKernelsAccess, Mix64, MixBucket}
import org.scalacheck.Prop
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property tests pinning the wraparound hash kernels against BigInt
 * mod-2^64 models for ARBITRARY 64-bit inputs — these kernels carry the
 * cross-engine oracle parity (the DuckDB replicas implement exactly the
 * model asserted here), so a divergence at any id magnitude would break
 * verification silently.
 */
class KernelPropertySpec extends AnyFunSuite {

  /** Plain-ScalaCheck runner (the scalatest bridge artifact is not on
    * the offline classpath). */
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  private val M = BigInt(1) << 64
  private def u(l: Long): BigInt = BigInt(l) & (M - 1)

  private def splitmixModel(x0: Long): Long = {
    var x = (u(x0) + BigInt("9e3779b97f4a7c15", 16)).mod(M)
    x = ((x ^ (x >> 30)) * BigInt("bf58476d1ce4e5b9", 16)).mod(M)
    x = ((x ^ (x >> 27)) * BigInt("94d049bb133111eb", 16)).mod(M)
    (x ^ (x >> 31)).longValue
  }

  test("Mix64 equals the splitmix64 BigInt model for arbitrary ids and salts") {
    check(forAll { (id: Long, salt: Long) =>
      val got = Mix64(org.apache.spark.sql.catalyst.expressions.Literal(id), salt)
        .eval(null).asInstanceOf[Long]
      got == splitmixModel((u(id) + u(salt)).mod(M).longValue)
    })
  }

  test("MixBucket equals ((id*m + salt) mod 2^64 >>> shift) % buckets for arbitrary ids") {
    check(forAll { (id: Long) =>
      val got = MixBucket(
        org.apache.spark.sql.catalyst.expressions.Literal(id),
        2654435761L, 9973L, 20, 1000).eval(null).asInstanceOf[Long]
      val expect = (((u(id) * 2654435761L + 9973L).mod(M)) >> 20).longValue % 1000
      got == expect
    })
  }

  test("fnv1a64 equals the byte-fold BigInt model for arbitrary ASCII strings") {
    val gen = org.scalacheck.Gen.listOf(org.scalacheck.Gen.choose(32.toChar, 126.toChar))
      .map(_.mkString)
    check(forAll(gen) { s =>
      val got = HashKernelsAccess.fnv1a(s)
      var h = BigInt("cbf29ce484222325", 16)
      s.getBytes("UTF-8").foreach { b =>
        h = ((h ^ BigInt(b & 0xff)) * BigInt("100000001b3", 16)).mod(M)
      }
      got == h.longValue
    })
  }

  test("HashedLinearScore equals the concat-and-hash BigInt model for arbitrary token lists") {
    val tokGen = org.scalacheck.Gen.listOf(
      org.scalacheck.Gen.listOf(org.scalacheck.Gen.choose(32.toChar, 126.toChar))
        .map(_.mkString))
    def fnvModel(s: String): BigInt = {
      var h = BigInt("cbf29ce484222325", 16)
      s.getBytes("UTF-8").foreach { b =>
        h = ((h ^ BigInt(b & 0xff)) * BigInt("100000001b3", 16)).mod(M)
      }
      h
    }
    val B = 1 << 20
    // the model hashes each bigram as the CONCATENATED string — the
    // kernel must match even though it continues the fold byte-wise
    def weightModel(f: String): Long = {
      val b = u(splitmixModel(fnvModel(f).longValue)).mod(BigInt(B))
      (u(splitmixModel(b.longValue)).mod(BigInt(2001)) - 1000).longValue
    }
    check(forAll(tokGen) { toks =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        toks.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
      val got = graft.operators.HashedLinearScore(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          arr, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType)),
        B).eval(null)
      if (toks.isEmpty) got == null
      else {
        val row = got.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
        val feats = toks ++ toks.sliding(2).collect { case Seq(a, b) => s"$a $b" }
        row.getLong(0) == 2L * toks.length - 1 &&
          row.getLong(1) == feats.map(weightModel).sum
      }
    })
  }

  test("Bloom probe positions equal the HUGEINT double-hash model for arbitrary strings") {
    import graft.operators.BloomKernel
    import org.apache.spark.unsafe.types.UTF8String
    val strGen = org.scalacheck.Gen.listOf(
      org.scalacheck.Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val mGen = org.scalacheck.Gen.oneOf(64L, 1L << 10, 1L << 20)
    check(forAll(strGen, mGen) { (s, m) =>
      // model: h1 = splitmix64(fnv1a64(s)), h2 = splitmix64(h1) | 1,
      // bit_i = (h1 + i*h2) mod 2^64 mod m — exactly what the DuckDB
      // oracle for q_bloom_decontam replays in HUGEINT SQL
      var h = BigInt("cbf29ce484222325", 16)
      s.getBytes("UTF-8").foreach { b =>
        h = ((h ^ BigInt(b & 0xff)) * BigInt("100000001b3", 16)).mod(M)
      }
      val mh1 = splitmixModel(h.longValue)
      val mh2 = splitmixModel(mh1) | 1L
      val h1 = BloomKernel.h1Of(UTF8String.fromString(s))
      val h2 = BloomKernel.h2Of(h1)
      h1 == mh1 && h2 == mh2 && (0 until 7).forall { i =>
        BloomKernel.position(h1, h2, i, m) ==
          (u(mh1) + BigInt(i) * u(mh2)).mod(M).mod(BigInt(m)).longValue
      }
    })
  }

  test("Bloom filter: split-build OR-merges to the whole-build; no false negatives") {
    import graft.operators.BloomKernel
    import org.apache.spark.unsafe.types.UTF8String
    val m = 1L << 12
    val k = 5
    def insert(words: Array[Long], s: String): Unit = {
      val h1 = BloomKernel.h1Of(UTF8String.fromString(s))
      val h2 = BloomKernel.h2Of(h1)
      (0 until k).foreach(i => BloomKernel.set(words, BloomKernel.position(h1, h2, i, m)))
    }
    def contains(words: Array[Long], s: String): Boolean = {
      val h1 = BloomKernel.h1Of(UTF8String.fromString(s))
      val h2 = BloomKernel.h2Of(h1)
      (0 until k).forall(i => BloomKernel.get(words, BloomKernel.position(h1, h2, i, m)))
    }
    def build(items: Seq[String]): Array[Long] = {
      val w = new Array[Long]((m / 64).toInt)
      items.foreach(insert(w, _))
      w
    }
    val strGen = org.scalacheck.Gen.listOf(
      org.scalacheck.Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    val itemsGen = org.scalacheck.Gen.listOf(strGen)
    check(forAll(itemsGen, itemsGen) { (as, bs) =>
      // partial-aggregate correctness: building per-partition filters and
      // OR-merging them (BloomBuildAgg.merge) equals one whole build
      val merged = build(as).zip(build(bs)).map { case (x, y) => x | y }
      val whole = build(as ++ bs)
      // serialization roundtrip preserves layout and words exactly
      val (pk, pm, pw) = BloomKernel.parse(BloomKernel.toBytes(k, m, whole))
      java.util.Arrays.equals(whole, merged) &&
        pk == k && pm == m && java.util.Arrays.equals(pw, whole) &&
        (as ++ bs).forall(contains(whole, _)) // false negatives never
    })
  }

  test("MathLn: Math.log bit-for-bit, NULL on non-positive, and the StrictMath gap is real") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    def ln(x: Double): Any =
      graft.operators.MathLn(Literal(x)).eval(null)
    // the kernel IS Math.log (bit equality) on integer and fractional args
    (1 to 5000).foreach { i =>
      val x = i.toDouble
      assert(java.lang.Double.doubleToRawLongBits(ln(x).asInstanceOf[Double]) ==
        java.lang.Double.doubleToRawLongBits(Math.log(x)), s"x=$x")
      val f = i / 7.0
      assert(java.lang.Double.doubleToRawLongBits(ln(f).asInstanceOf[Double]) ==
        java.lang.Double.doubleToRawLongBits(Math.log(f)), s"x=$f")
    }
    // built-in-ln NULL semantics preserved
    assert(ln(0.0) == null && ln(-1.0) == null)
    // why the kernel exists: Spark's built-in ln evaluates StrictMath.log,
    // which disagrees with Math.log (= libm/DuckDB here) on ~1% of
    // integers — x = 74 is the one that flipped the HLL estimate
    assert(java.lang.Double.doubleToRawLongBits(Math.log(74.0)) !=
      java.lang.Double.doubleToRawLongBits(StrictMath.log(74.0)),
      "StrictMath/Math log divergence at 74 vanished on this platform — " +
        "re-evaluate whether MathLn is still needed")
  }

  test("GramRepStats equals the count-map model for arbitrary token lists") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    // small vocab so repeats actually occur; include multi-char tokens
    val tokGen = org.scalacheck.Gen.oneOf("a", "b", "cc", "ddd", "e f")
    val docGen = org.scalacheck.Gen.listOf(tokGen)
    val nGen = org.scalacheck.Gen.choose(1, 4)
    check(forAll(docGen, nGen) { (toks, n) =>
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val row = graft.operators.GramRepStats(
          Literal.create(arr, ArrayType(StringType)), n)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      val grams = toks.sliding(n).filter(_.size == n).map(_.mkString(" ")).toList
      val counts = grams.groupBy(identity).view.mapValues(_.size).toMap
      val (bestrun, bestlen) =
        if (counts.isEmpty) (0, 0)
        else {
          val mx = counts.values.max
          // tie → binary-smallest gram (ASCII vocab: String order == UTF8 order)
          val g = counts.filter(_._2 == mx).keys.min
          (mx, g.length)
        }
      val dupchars = counts.collect { case (g, c) if c > 1 => (c - 1) * g.length }.sum
      row.getInt(0) == bestrun && row.getInt(1) == bestlen && row.getInt(2) == dupchars
    })
  }

  test("OphMinHashSignature equals the bucket-min + rotation-densify model") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val tokGen = org.scalacheck.Gen.oneOf(
      "alpha", "beta", "gamma", "delta", "x", "yy", "zzz")
    val docGen = org.scalacheck.Gen.nonEmptyListOf(tokGen)
    val kGen = org.scalacheck.Gen.oneOf(4, 8, 16)
    check(forAll(docGen, kGen) { (toks, k) =>
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = graft.operators.OphMinHashSignature(
          Literal.create(arr, ArrayType(StringType)), 3, k)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
      // driver model: shingle hashes exactly as MinHashSignature folds
      // them, unsigned bucket-min, rightward circular borrow + t*C
      val th = toks.map(HashKernelsAccess.fnv1a)
      val nSh = math.max(1, toks.size - 3 + 1)
      val hs = (0 until nSh).map { i =>
        val h = (i until math.min(i + 3, toks.size))
          .foldLeft(0L)((acc, x) => acc * 0x100000001b3L + th(x))
        HashKernelsAccess.mix(h)
      }
      val raw = scala.collection.mutable.Map[Int, Long]()
      for (h <- hs) {
        val j = java.lang.Long.remainderUnsigned(h, k.toLong).toInt
        raw.get(j) match {
          case Some(m) if java.lang.Long.compareUnsigned(h, m) >= 0 => ()
          case _ => raw(j) = h
        }
      }
      val want = (0 until k).map { j =>
        raw.get(j) match {
          case Some(m) => m
          case None =>
            val t = (1 until k).find(t => raw.contains((j + t) % k)).get
            raw((j + t) % k) + t.toLong * graft.operators.OphMinHashSignature.C
        }
      }
      got == want
    })
    // identical token lists → identical signatures (dedup soundness)
    val a = new GenericArrayData(
      Seq("p", "q", "r", "s").map(UTF8String.fromString).toArray[Any])
    val lit = Literal.create(a, ArrayType(StringType))
    val s1 = graft.operators.OphMinHashSignature(lit, 3, 16).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    val s2 = graft.operators.OphMinHashSignature(lit, 3, 16).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    assert(s1 == s2)
  }

  test("ShingleSet equals the distinct-sliding-gram model for arbitrary token lists") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val tokGen = org.scalacheck.Gen.oneOf("a", "b", "cc", "ddd", "", "xy")
    val docGen = org.scalacheck.Gen.listOf(tokGen)
    val wGen = org.scalacheck.Gen.choose(1, 4)
    check(forAll(docGen, wGen) { (toks, w) =>
      val arr = new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
      val got = graft.operators.ShingleSet(
          Literal.create(arr, ArrayType(StringType)), w)
        .eval(null).asInstanceOf[ArrayData]
        .toArray[UTF8String](StringType).map(_.toString).toList
      // the declarative chain it replaced: positions 0..max(n−w, 0),
      // grams = up-to-w tokens joined by ' ', first-occurrence distinct
      val n = toks.size
      val want = (0 to math.max(n - w, 0)).map(i =>
        toks.slice(i, math.min(i + w, n)).mkString(" ")).distinct.toList
      got == want
    })
  }

  test("SubstringLcs equals the quadratic-DP longest-common-substring for arbitrary strings") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    def dpLcs(text: String, pat: String): Int = {
      // classic O(n·m) table over BYTES (the kernel's unit)
      val t = text.getBytes("UTF-8"); val p = pat.getBytes("UTF-8")
      var best = 0
      val row = new Array[Int](p.length + 1)
      for (i <- 1 to t.length) {
        var prev = 0
        for (j <- 1 to p.length) {
          val cur = row(j)
          row(j) = if (t(i - 1) == p(j - 1)) prev + 1 else 0
          if (row(j) > best) best = row(j)
          prev = cur
        }
      }
      best
    }
    val charGen = org.scalacheck.Gen.oneOf('a', 'b', 'c', ' ')
    val strGen = org.scalacheck.Gen.listOf(charGen).map(_.mkString)
    val patGen = org.scalacheck.Gen.nonEmptyListOf(charGen).map(_.mkString)
    check(forAll(strGen, patGen) { (text, pat) =>
      val got = graft.operators.SubstringLcs(
        Literal.create(text, StringType), pat).eval(null).asInstanceOf[Int]
      got == dpLcs(text, pat)
    })
    // a handful of adversarial fixed cases (repeats force automaton clones)
    for ((t, p) <- Seq(
        ("abcabcabc", "cabca"), ("aaaa", "aa"), ("", "abc"),
        ("xyz", "abc"), ("the table value", "value table part"),
        ("ababab", "babab"), ("mississippi", "issip"))) {
      val got = graft.operators.SubstringLcs(
        Literal.create(t, StringType), p).eval(null).asInstanceOf[Int]
      assert(got == dpLcs(t, p), s"text='$t' pat='$p': got $got want ${dpLcs(t, p)}")
    }
  }

  test("MultiPatternHits equals brute-force overlapping occurrence counts") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.StringType
    // the definition: every start offset, overlaps and nesting included
    def brute(text: String, pats: Seq[String]): Seq[(Int, Int, Int)] = {
      val t = text.getBytes("UTF-8")
      pats.zipWithIndex.flatMap { case (p, pi) =>
        val pb = p.getBytes("UTF-8")
        val starts = (0 to t.length - pb.length)
          .filter(s => pb.indices.forall(j => t(s + j) == pb(j)))
        if (starts.isEmpty) Nil else Seq((pi, starts.size, starts.head + 1))
      }
    }
    def run(text: String, pats: Seq[String]): Seq[(Int, Int, Int)] = {
      val r = graft.operators.MultiPatternHits(
          Literal.create(text, StringType), pats)
        .eval(null).asInstanceOf[ArrayData]
      (0 until r.numElements()).map { i =>
        val row = r.getStruct(i, 3)
        (row.getInt(0), row.getInt(1), row.getInt(2))
      }
    }
    // tiny alphabet so overlapping and nested matches occur constantly;
    // duplicate patterns are legal (each id reports independently)
    val charGen = org.scalacheck.Gen.oneOf('a', 'b', ' ')
    val strGen = org.scalacheck.Gen.listOf(charGen).map(_.mkString)
    val patGen = org.scalacheck.Gen.nonEmptyListOf(charGen).map(_.mkString)
    val patsGen = org.scalacheck.Gen.nonEmptyListOf(patGen)
    check(forAll(strGen, patsGen) { (text, pats) =>
      run(text, pats) == brute(text, pats)
    })
    // the automaton shapes, pinned by hand:
    // self-overlap counts every offset
    assert(run("aaaa", Seq("aa")) == Seq((0, 3, 1)))
    // nested patterns both fire at the same end position
    assert(run("the scan plan", Seq("an", "scan")) ==
      Seq((0, 2, 7), (1, 1, 5)))
    // a pattern spanning a fail-link transition ("ab" fails into "ba")
    assert(run("ababab", Seq("aba", "bab")) == Seq((0, 2, 1), (1, 2, 2)))
    // no-hit and empty-text documents return empty arrays
    assert(run("xyz", Seq("aa")).isEmpty)
    assert(run("", Seq("aa")).isEmpty)
  }

  test("MultiPatternExcise equals the union-of-spans coverage rebuild") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.StringType
    def brute(text: String, pats: Seq[String]): String = {
      val t = text.getBytes("UTF-8")
      val covered = new Array[Boolean](t.length)
      for (p <- pats; pb = p.getBytes("UTF-8");
           s <- 0 to t.length - pb.length
           if pb.indices.forall(j => t(s + j) == pb(j));
           k <- s until s + pb.length) covered(k) = true
      new String(t.indices.filterNot(covered).map(t(_)).toArray, "UTF-8")
    }
    def run(text: String, pats: Seq[String]): String =
      graft.operators.MultiPatternExcise(
          Literal.create(text, StringType), pats)
        .eval(null).asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val charGen = org.scalacheck.Gen.oneOf('a', 'b', ' ')
    val strGen = org.scalacheck.Gen.listOf(charGen).map(_.mkString)
    val patGen = org.scalacheck.Gen.nonEmptyListOf(charGen).map(_.mkString)
    check(forAll(strGen, org.scalacheck.Gen.nonEmptyListOf(patGen)) { (text, pats) =>
      run(text, pats) == brute(text, pats)
    })
    // overlapping matches merge into ONE cut ("aa" covers all of "aaa")
    assert(run("xaaay", Seq("aa")) == "xy")
    // nested matches don't double-cut; order of patterns is irrelevant
    assert(run("the scan end", Seq("an", "scan")) == "the  end")
    assert(run("the scan end", Seq("scan", "an")) == "the  end")
    // idempotent: excising the excised text changes nothing
    val once = run("ababab keep aba", Seq("aba"))
    assert(run(once, Seq("aba")) == once)
    // no match → the input comes back untouched
    assert(run("clean text", Seq("zzz")) == "clean text")
  }

  test("SqEncode: kernel == driver quantizer; range, monotonicity, zero-at-zero") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val vGen = org.scalacheck.Gen.listOfN(8,
      org.scalacheck.Gen.choose(-100.0f, 100.0f))
    val amGen = org.scalacheck.Gen.choose(0.1f, 100.0f)
    check(forAll(vGen, amGen) { (vs, am) =>
      val arr = new GenericArrayData(vs.map(Float.box).toArray[Any])
      val got = graft.operators.SqEncode(
          Literal.create(arr, ArrayType(FloatType)), am)
        .eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      // the kernel and the driver-side query encode MUST be the same
      // function — a divergence silently skews every SQ ranking
      val viaDriver = vs.map(v => graft.operators.Similarity.sqQuantize(v, am))
      val inRange = got.forall(c => c >= -127 && c <= 127)
      // monotone in v at fixed scale (floor of an increasing function)
      val mono = vs.sorted.map(v => graft.operators.Similarity.sqQuantize(v, am))
        .sliding(2).forall(p => p.size < 2 || p(0) <= p(1))
      got == viaDriver && inRange && mono &&
        graft.operators.Similarity.sqQuantize(0f, am) == 0
    })
  }

  test("IntDot equals the BigInt dot model in the int8 code range") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    val cGen = org.scalacheck.Gen.listOfN(16,
      org.scalacheck.Gen.choose(-127, 127))
    check(forAll(cGen, cGen) { (a, b) =>
      val la = new GenericArrayData(a.map(Int.box).toArray[Any])
      val lb = new GenericArrayData(b.map(Int.box).toArray[Any])
      val got = graft.operators.IntDot(
          Literal.create(la, ArrayType(IntegerType)),
          Literal.create(lb, ArrayType(IntegerType)))
        .eval(null).asInstanceOf[Long]
      val model = a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      BigInt(got) == model
    })
  }

  test("GearCutpoints matches the BigInt closed-form window-sum model (the oracle's replay form)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val (maskBits, minLen, maxLen) = (4, 8, 32)
    val txtGen = org.scalacheck.Gen.listOfN(120,
      org.scalacheck.Gen.frequency(
        9 -> org.scalacheck.Gen.alphaNumChar, 3 -> org.scalacheck.Gen.const(' ')))
      .map(_.mkString)
    check(forAll(txtGen) { txt =>
      val bytes = txt.getBytes("UTF-8")
      val n = bytes.length
      // closed form: h_i = sum_{j=max(1,i-63)}^{i} 2^(i-j)*gear(b_j) mod 2^64
      // — only the last 64 bytes matter because 2^64 == 0 (mod 2^64).
      // This is EXACTLY how the DuckDB oracle re-derives h without a
      // sequential fold, so this property carries the oracle's parity.
      def hAt(i: Int): BigInt = // i is 1-based
        (math.max(1, i - 63) to i).map { j =>
          (BigInt(1) << (i - j)) * u(splitmixModel0(bytes(j - 1) & 0xff))
        }.sum.mod(M)
      val mask = BigInt((1L << maskBits) - 1)
      // greedy walk over the closed-form candidates
      var cuts = List.empty[Int]
      var last = 0
      var i = 1
      while (i <= n) {
        if (((i - last) >= minLen && (hAt(i) & mask) == 0) || (i - last) == maxLen) {
          cuts ::= i; last = i
        }
        i += 1
      }
      if (last < n) cuts ::= n
      val expect = cuts.reverse
      val got = graft.operators.GearCutpoints(
          Literal.create(UTF8String.fromString(txt),
            org.apache.spark.sql.types.StringType), maskBits, minLen, maxLen)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val ends = (0 until got.numElements()).map { k =>
        val r = got.getStruct(k, 3)
        r.getInt(0) + r.getInt(1) // start + len = cut end
      }
      // cut ends match the model; chunks tile the string; digests are the
      // FNV of each chunk's bytes
      ends.toList == expect &&
        (0 until got.numElements()).forall { k =>
          val r = got.getStruct(k, 3)
          val start = if (k == 0) 0 else ends(k - 1)
          r.getInt(0) == start &&
            r.getLong(2) == HashKernelsAccess.fnv1a(txt.substring(start, ends(k)))
        }
    })
  }

  /** splitmix64 of a small nonneg int (gear-table entry) via the BigInt
    * model — same as splitmixModel but taking the raw value. */
  private def splitmixModel0(x: Int): Long = splitmixModel(x.toLong)

  test("GearCutpoints on multi-byte UTF-8: chunks tile the BYTE length, digests match byte slices") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    // mixed ASCII / 2-byte / 3-byte / 4-byte code points — cuts land at
    // byte offsets (the documented contract), possibly inside a char's
    // byte run; tiling and per-chunk FNV must still hold exactly
    val charGen = org.scalacheck.Gen.frequency(
      5 -> org.scalacheck.Gen.alphaNumChar.map(_.toString),
      2 -> org.scalacheck.Gen.oneOf("é", "ü", "ßß"),
      2 -> org.scalacheck.Gen.oneOf("语", "言", "データ"),
      1 -> org.scalacheck.Gen.oneOf("🎉", "𝕏"))
    val txtGen = org.scalacheck.Gen.listOfN(60, charGen).map(_.mkString)
    check(forAll(txtGen) { txt =>
      val bytes = txt.getBytes("UTF-8")
      val got = graft.operators.GearCutpoints(
          Literal.create(UTF8String.fromString(txt),
            org.apache.spark.sql.types.StringType), 4, 8, 32)
        .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = got.numElements()
      var prevEnd = 0
      var ok = bytes.isEmpty == (n == 0)
      (0 until n).foreach { k =>
        val r = got.getStruct(k, 3)
        val (start, len, digest) = (r.getInt(0), r.getInt(1), r.getLong(2))
        ok &&= start == prevEnd && len >= 1 && len <= 32
        var h = BigInt("cbf29ce484222325", 16).longValue
        (start until start + len).foreach { i =>
          h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
        }
        ok &&= digest == h
        prevEnd = start + len
      }
      ok && prevEnd == bytes.length
    })
  }

  test("TokenLevenshtein equals the full quadratic DP; -1 past the threshold") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def fullDp(a: Seq[String], b: Seq[String]): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1),
          math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1))
      dp(a.length)(b.length)
    }
    def kernel(a: Seq[String], b: Seq[String], d: Int): Int = {
      def lit(x: Seq[String]) = Literal(
        new GenericArrayData(x.map(UTF8String.fromString).toArray),
        ArrayType(StringType))
      graft.operators.TokenLevenshtein(lit(a), lit(b), d)
        .eval(null).asInstanceOf[Int]
    }
    // small alphabet forces matches/near-misses; lengths 0..12 cover
    // band edges (lo>1, hi<m) and both early-exit directions
    val toks = Vector("a", "b", "c", "ab")
    check(forAll(
      org.scalacheck.Gen.listOfN(12, org.scalacheck.Gen.oneOf(0 to 3)),
      org.scalacheck.Gen.listOfN(12, org.scalacheck.Gen.oneOf(0 to 3)),
      org.scalacheck.Gen.choose(0, 13),
      org.scalacheck.Gen.choose(0, 12),
      org.scalacheck.Gen.choose(0, 5)) { (xi, yi, la, lb, d) =>
      val a = xi.take(la).map(toks)
      val b = yi.take(lb).map(toks)
      val want = fullDp(a, b)
      val got = kernel(a, b, d)
      if (want <= d) got == want else got == -1
    })
  }

  test("log2fp: known values, powers-of-two exact, monotone, within 2/1024 of log2") {
    import graft.operators.TextOps.log2fp
    // values computed independently (Python bit-level prototype)
    val known = Seq(1L -> 0L, 2L -> 1024L, 3L -> 1623L, 5L -> 2377L,
      7L -> 2874L, 100L -> 6803L, 12345L -> 13917L, 999983L -> 20409L)
    known.foreach { case (f, want) => assert(log2fp(f) == want, s"log2fp($f)") }
    (0 to 49).foreach(k => assert(log2fp(1L << k) == 1024L * k))
    check(forAll(
      org.scalacheck.Gen.choose(1L, (1L << 50) - 1),
      org.scalacheck.Gen.choose(1L, (1L << 50) - 1)) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val mono = log2fp(lo) <= log2fp(hi)
      val close = math.abs(1024.0 * (math.log(hi.toDouble) / math.log(2.0)) -
        log2fp(hi).toDouble) <= 2.0
      mono && close
    })
    intercept[IllegalArgumentException](log2fp(0L))
    intercept[IllegalArgumentException](log2fp(1L << 50))
  }
}
