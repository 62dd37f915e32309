package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Flac

/** FLAC codec: encoder→decoder roundtrips across signal shapes, plus
  * hand-built streams exercising the decoder-only surface (LPC,
  * mid/left/right-side stereo, wasted bits, 5-bit Rice, partition
  * orders, escape partitions) and the CRC rejection paths. The
  * hand-built frames use an independent test-local bit writer, so the
  * production BitWriter is cross-checked, not trusted. */
class FlacSpec extends AnyFunSuite {

  private def rt(samples: Array[Array[Int]], sr: Int = 8000,
      bits: Int = 16, block: Int = 192): Unit = {
    val enc = Flac.encode(samples, sr, bits, block)
    val dec = Flac.decode(enc).getOrElse(fail(s"decode failed (${enc.length} bytes)"))
    assert(dec.sampleRate == sr && dec.channels == samples.length &&
      dec.bitsPerSample == bits && dec.totalSamples == samples(0).length)
    samples.indices.foreach { c =>
      assert(java.util.Arrays.equals(dec.samples(c), samples(c)),
        s"channel $c mismatch")
    }
  }

  test("roundtrip: constant, ramp, noise, full-scale, multi-frame, stereo, 8-bit") {
    rt(Array(Array.fill(500)(1234)))                    // constant, short last frame
    rt(Array(Array.tabulate(500)(i => -1000 + 3 * i)))  // linear: order-2 zeros
    rt(Array(Array.tabulate(500)(i =>
      ((i * 7919 + 13) % 4096) - 2048)))                // pseudo-noise
    rt(Array(Array.tabulate(300)(i =>
      if (i % 2 == 0) 32767 else -32768)))              // full-scale alternation
    rt(Array(
      Array.tabulate(777)(i => ((i * 31) % 2048) - 1024),
      Array.tabulate(777)(i => ((i * 17 + 5) % 2048) - 1024))) // stereo
    rt(Array(Array.tabulate(100)(i => (i % 256) - 128)), bits = 8)
    rt(Array(Array(42)))                                // single sample
  }

  test("stereo decorrelation: exact-cost mode choice, smaller files, exact roundtrip") {
    // first frame's channel-assignment nibble: stream layout is 4 magic
    // + 4 metadata header + 34 STREAMINFO = byte 42 starts the frame;
    // byte 45 = chAssign(4) | sampleSizeCode(3) | 0
    def firstMode(enc: Array[Byte]): Int = (enc(45) >> 4) & 0xF
    // identical channels: side is constant zero — a side mode must win
    // (tie order picks left-side, 8)
    val l1 = Array.tabulate(600)(i => ((i * 7919 + 13) % 4096) - 2048)
    val dup = Array(l1, l1.clone())
    val encDup = Flac.encode(dup, 8000, 16, 192)
    assert(firstMode(encDup) == 8, s"mode ${firstMode(encDup)}")
    rtBytes(dup, encDup)
    // anti-correlated channels: mid is constant — mid-side must win
    val neg = Array(l1, l1.map(-_))
    val encNeg = Flac.encode(neg, 8000, 16, 192)
    assert(firstMode(encNeg) == 10, s"mode ${firstMode(encNeg)}")
    rtBytes(neg, encNeg)
    // realistic correlation (R = L + small noise): decorrelated strictly
    // smaller than the forced-independent encoding, both exact
    val r2 = Array.tabulate(600)(i => l1(i) + ((i * 31) % 7) - 3)
    val corr = Array(l1, r2)
    val on = Flac.encode(corr, 8000, 16, 192)
    val off = Flac.encode(corr, 8000, 16, 192, stereoDecorrelation = false)
    assert(on.length < off.length,
      s"no size win: decorrelated ${on.length} vs independent ${off.length}")
    assert(firstMode(off) == 1, s"forced-independent wrote mode ${firstMode(off)}")
    rtBytes(corr, on); rtBytes(corr, off)
    // uncorrelated channels: independent must remain chosen (the mode
    // search never pessimizes) and byte size equals the old encoder's
    val u2 = Array.tabulate(600)(i => ((i * 104729 + 7) % 4096) - 2048)
    val unc = Array(l1, u2)
    val encU = Flac.encode(unc, 8000, 16, 192)
    assert(encU.length == Flac.encode(unc, 8000, 16, 192,
      stereoDecorrelation = false).length)
    rtBytes(unc, encU)
    // mono and >2 channels are untouched by the stereo path
    rt(Array(l1))
    rt(Array(l1, u2, l1.map(_ / 2)))
  }

  test("lpc encode: resonant signals strictly shrink vs fixed predictors; exact roundtrip; fixed-friendly signals byte-identical") {
    // AR(2) resonator: x[i] = 1.9·x[i−1] − 0.95·x[i−2] + dither — a slow
    // oscillation fixed polynomial predictors (orders 0..4, integer
    // differences) fit poorly but a quantized 2-tap LPC models almost
    // exactly. LPC must strictly shrink the stream AND round-trip: the
    // residual chain inverts the decoder's (acc >> shift) reconstruction
    // regardless of coefficient quality.
    val n = 8192
    val ar = new Array[Int](n)
    var x1 = 0.0; var x2 = 0.0
    for (i <- 0 until n) {
      val x = 1.9 * x1 - 0.95 * x2 + (((i * 7919 + 31) % 17) - 8).toDouble
      ar(i) = math.max(-30000, math.min(30000, math.round(x).toInt))
      x2 = x1; x1 = ar(i).toDouble
    }
    val withLpc = Flac.encode(Array(ar), 16000, 16, 4096)
    val noLpc = Flac.encode(Array(ar), 16000, 16, 4096, maxLpcOrder = 0)
    assert(withLpc.length < noLpc.length,
      s"LPC did not shrink the resonator: ${withLpc.length} vs ${noLpc.length}")
    rtBytes(Array(ar), withLpc); rtBytes(Array(ar), noLpc)
    // signals fixed predictors already encode with zero residuals
    // (constant, linear ramp): LPC cannot STRICTLY improve, so the
    // stream is byte-identical with LPC on or off
    val ramp = Array(Array.tabulate(4096)(i => i - 2048))
    assert(java.util.Arrays.equals(
      Flac.encode(ramp, 8000, 16, 4096),
      Flac.encode(ramp, 8000, 16, 4096, maxLpcOrder = 0)))
    val const = Array(Array.fill(4096)(137))
    assert(java.util.Arrays.equals(
      Flac.encode(const, 8000, 16, 4096),
      Flac.encode(const, 8000, 16, 4096, maxLpcOrder = 0)))
    // LPC composes with stereo decorrelation and 8-bit depth: exact
    // round-trips through the shared planner
    val l = Array.tabulate(5000)(i =>
      math.max(-120, math.min(120, (60.0 * math.sin(i / 9.0)).toInt)))
    val r = Array.tabulate(5000)(i => math.max(-120, math.min(120, l(i) + (i % 3) - 1)))
    val enc = Flac.encode(Array(l, r), 8000, 8, 4096)
    val dec = Flac.decode(enc).get
    assert(dec.samples(0).sameElements(l) && dec.samples(1).sameElements(r))
  }

  test("rice partitions: variance-shifting blocks strictly shrink; stationary blocks byte-identical to order 0; exact roundtrip") {
    // one block whose residual variance jumps mid-block: quiet dither in
    // the first half, loud noise in the second — a single compromise k
    // overpays one half, so per-partition parameters must strictly win
    val shifting = Array(Array.tabulate(4096)(i =>
      if (i < 2048) ((i * 7) % 5) - 2
      else (((i * 7919 + 13) % 4096) - 2048)))
    val partitioned = Flac.encode(shifting, 8000, 16, 4096)
    val flat = Flac.encode(shifting, 8000, 16, 4096, maxPartitionOrder = 0)
    assert(partitioned.length < flat.length,
      s"no partition win: $partitioned.length vs ${flat.length}")
    rtBytes(shifting, partitioned); rtBytes(shifting, flat)
    // stationary noise: one k is already optimal, a partition order > 0
    // costs 4 extra bits per extra partition with the same k — the tie/
    // strict-improvement rule must emit the order-0 encoding VERBATIM
    val stationary = Array(Array.tabulate(4096)(i =>
      ((i * 7919 + 13) % 4096) - 2048))
    assert(java.util.Arrays.equals(
      Flac.encode(stationary, 8000, 16, 4096),
      Flac.encode(stationary, 8000, 16, 4096, maxPartitionOrder = 0)))
    // stereo path plans with partitions too (shared planner) and
    // round-trips; odd block sizes fall back to feasible orders only
    val l = Array.tabulate(3000)(i =>
      if (i % 1000 < 500) ((i * 3) % 7) - 3 else ((i * 104729) % 2048) - 1024)
    val r = Array.tabulate(3000)(i => l(i) + ((i * 31) % 5) - 2)
    rt(Array(l, r))
    rt(Array(Array.tabulate(777)(i =>
      if (i < 388) ((i * 3) % 5) - 2 else ((i * 7919) % 1024) - 512)))
  }

  private def rtBytes(samples: Array[Array[Int]], enc: Array[Byte]): Unit = {
    val dec = Flac.decode(enc).getOrElse(fail(s"decode failed (${enc.length} bytes)"))
    samples.indices.foreach { c =>
      assert(java.util.Arrays.equals(dec.samples(c), samples(c)),
        s"channel $c mismatch")
    }
  }

  test("roundtrip: STREAMINFO MD5 matches an independent digest of the raw PCM") {
    val s = Array(Array.tabulate(200)(i => ((i * 7919) % 4096) - 2048))
    val enc = Flac.encode(s, 8000, 16, 192)
    // STREAMINFO md5 lives at bytes 26..42 of the stream
    // (4 magic + 4 block header + 18 fixed fields)
    val stored = enc.slice(26, 42)
    val md = java.security.MessageDigest.getInstance("MD5")
    s(0).foreach { v => md.update((v & 0xff).toByte); md.update(((v >> 8) & 0xff).toByte) }
    assert(java.util.Arrays.equals(stored, md.digest()), "MD5 mismatch")
  }

  // ---- independent bit writer for hand-built decoder-only streams ----
  private class TW {
    private val bb = scala.collection.mutable.ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def put(v: Long, n: Int): this.type = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1).toInt
        nbits += 1
        if (nbits == 8) { bb += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
      this
    }
    def unary(q: Int): this.type = { (0 until q).foreach(_ => put(0, 1)); put(1, 1) }
    def align(): this.type = { while (nbits != 0) put(0, 1); this }
    def bytes: Array[Byte] = bb.toArray
    def size: Int = bb.size
  }

  private def streamInfo(w: TW, block: Int, sr: Int, ch: Int, bits: Int, total: Long): Unit = {
    w.put(0x664C6143L, 32)
    w.put(0x80, 8).put(34, 24)
    w.put(block, 16).put(block, 16).put(0, 24).put(0, 24)
    w.put(sr, 20).put(ch - 1, 3).put(bits - 1, 5).put(total, 36)
    (0 until 16).foreach(_ => w.put(0, 8)) // md5 unset (decoder doesn't require it)
  }

  /** Open a frame header (fixed-blocking, explicit 16-bit blocksize,
    * sr from streaminfo, explicit 16-bit sample size) and return the
    * byte offset where it starts. */
  private def frameHeader(w: TW, blockLen: Int, chAssign: Int): Int = {
    val start = w.size
    w.put(0x3FFE, 14).put(0, 1).put(0, 1)
    w.put(7, 4).put(0, 4).put(chAssign, 4).put(4, 3).put(0, 1)
    w.put(0, 8) // frame number 0 (utf8 single byte)
    w.put(blockLen - 1, 16)
    val hdr = w.bytes
    w.put(Flac.crc8(hdr, start, hdr.length), 8)
    start
  }

  private def closeFrame(w: TW, start: Int): Unit = {
    w.align()
    val b = w.bytes
    w.put(Flac.crc16(b, start, b.length), 16)
  }

  private def verbatim(w: TW, vals: Seq[Int], bits: Int): Unit = {
    w.put(0, 1).put(1, 6).put(0, 1)
    vals.foreach(v => w.put(v.toLong & ((1L << bits) - 1), bits))
  }

  test("decoder-only: LPC subframe reconstructs through the shifted predictor") {
    // order-2 LPC, coefs (2, -1) with shift 1: s[i] = r[i] + (2*s[i-1] - s[i-2]) >> 1
    val warm = Seq(100, 110)
    val res = Seq(3, -2, 5, 0, -7, 1)
    val bl = warm.size + res.size
    val w = new TW
    streamInfo(w, 192, 8000, 1, 16, bl)
    val st = frameHeader(w, bl, 0)
    w.put(0, 1).put(32 + 1, 6).put(0, 1) // LPC order 2 → type 100001
    warm.foreach(v => w.put(v.toLong & 0xffff, 16))
    w.put(14, 4)       // precision 15 bits
    w.put(1, 5)        // shift 1
    w.put(2L & 0x7fff, 15).put((-1L) & 0x7fff, 15)
    w.put(0, 2).put(0, 4).put(1, 4) // rice method 0, 1 partition, k=1
    res.foreach { r =>
      val u = if (r >= 0) r.toLong << 1 else ((-r).toLong << 1) - 1
      w.unary((u >>> 1).toInt); w.put(u & 1, 1)
    }
    closeFrame(w, st)
    val dec = Flac.decode(w.bytes).getOrElse(fail("LPC decode failed"))
    val exp = new Array[Int](bl)
    exp(0) = 100; exp(1) = 110
    res.zipWithIndex.foreach { case (r, j) =>
      val i = j + 2
      exp(i) = r + ((2 * exp(i - 1) - exp(i - 2)) >> 1)
    }
    assert(dec.samples(0).toSeq == exp.toSeq, dec.samples(0).toSeq.toString)
  }

  test("decoder-only: mid/side, left/side, right/side stereo reconstruct exactly") {
    val left = Seq(100, -50, 32767, -32768, 7, 0)
    val right = Seq(90, -60, 32760, -32761, -8, 1)
    val bl = left.size
    def build(assign: Int): Array[Byte] = {
      val w = new TW
      streamInfo(w, 192, 8000, 2, 16, bl)
      val st = frameHeader(w, bl, assign)
      assign match {
        case 8 => // left(16) + side(17)
          verbatim(w, left, 16)
          verbatim(w, left.zip(right).map { case (l, r) => l - r }, 17)
        case 9 => // side(17) + right(16)
          verbatim(w, left.zip(right).map { case (l, r) => l - r }, 17)
          verbatim(w, right, 16)
        case 10 => // mid(16) + side(17)
          verbatim(w, left.zip(right).map { case (l, r) => (l + r) >> 1 }, 16)
          verbatim(w, left.zip(right).map { case (l, r) => l - r }, 17)
      }
      closeFrame(w, st)
      w.bytes
    }
    Seq(8, 9, 10).foreach { a =>
      val dec = Flac.decode(build(a)).getOrElse(fail(s"assign $a failed"))
      assert(dec.samples(0).toSeq == left, s"assign $a left: ${dec.samples(0).toSeq}")
      assert(dec.samples(1).toSeq == right, s"assign $a right: ${dec.samples(1).toSeq}")
    }
  }

  test("decoder-only: wasted bits, 5-bit rice, partition order, escape partitions") {
    // wasted=1: all samples even, stored >> 1 in bits-1
    val vals = Seq(2, -4, 6, 100, -32768, 0, 8, 22)
    val bl = vals.size
    val w = new TW
    streamInfo(w, 192, 8000, 1, 16, bl)
    val st = frameHeader(w, bl, 0)
    w.put(0, 1).put(1, 6).put(1, 1) // verbatim, wasted flag
    w.unary(0)                       // wasted = unary(0)+1 = 1
    vals.foreach(v => w.put((v >> 1).toLong & 0x7fff, 15))
    closeFrame(w, st)
    val dec = Flac.decode(w.bytes).getOrElse(fail("wasted decode failed"))
    assert(dec.samples(0).toSeq == vals, dec.samples(0).toSeq.toString)

    // 5-bit rice (method 1), partition order 1, second partition escaped
    val res2 = Seq(1, -2, 3, -4, 1000, -2000, 1500, -900)
    val w2 = new TW
    streamInfo(w2, 192, 8000, 1, 16, res2.size)
    val st2 = frameHeader(w2, res2.size, 0)
    w2.put(0, 1).put(8, 6).put(0, 1) // fixed order 0
    w2.put(1, 2)  // method 1: 5-bit params
    w2.put(1, 4)  // partition order 1 → 2 partitions of 4
    w2.put(2, 5)  // partition 1: k=2
    res2.take(4).foreach { r =>
      val u = if (r >= 0) r.toLong << 1 else ((-r).toLong << 1) - 1
      w2.unary((u >>> 2).toInt); w2.put(u & 3, 2)
    }
    w2.put(31, 5) // partition 2: escape
    w2.put(13, 5) // 13 raw bits
    res2.drop(4).foreach(r => w2.put(r.toLong & 0x1fff, 13))
    closeFrame(w2, st2)
    val dec2 = Flac.decode(w2.bytes).getOrElse(fail("rice2 decode failed"))
    assert(dec2.samples(0).toSeq == res2, dec2.samples(0).toSeq.toString)
  }

  test("corrupt CRCs and garbage are rejected, never mis-decoded") {
    val s = Array(Array.tabulate(300)(i => ((i * 7919) % 4096) - 2048))
    val enc = Flac.encode(s, 8000, 16, 192)
    assert(Flac.decode(enc).isDefined)
    // flip a bit inside the first frame's payload → frame CRC16 must trip
    val bad = enc.clone()
    bad(60) = (bad(60) ^ 0x10).toByte
    assert(Flac.decode(bad).isEmpty, "corrupted payload accepted")
    // flip a header bit → header CRC8 must trip
    val bad2 = enc.clone()
    bad2(45) = (bad2(45) ^ 0x01).toByte
    assert(Flac.decode(bad2).isEmpty, "corrupted header accepted")
    assert(Flac.decode(Array[Byte](1, 2, 3, 4)).isEmpty)
    assert(Flac.decode("not a flac stream at all".getBytes).isEmpty)
    assert(Flac.decode(enc.take(50)).isEmpty, "truncated stream accepted")
  }

  test("reserved channel assignments (11-15) are rejected, not decoded as stereo") {
    val bl = 4
    val w = new TW
    streamInfo(w, 192, 8000, 2, 16, bl)
    val st = frameHeader(w, bl, 11) // reserved per RFC 9639
    verbatim(w, Seq(1, 2, 3, 4), 16)
    verbatim(w, Seq(5, 6, 7, 8), 16)
    closeFrame(w, st)
    assert(Flac.decode(w.bytes).isEmpty, "reserved chAssign accepted")
  }
}
