package graft.operators

/**
 * FLAC (Free Lossless Audio Codec, RFC 9639) — a pure-JVM encoder and
 * decoder for the real compressed-audio format, written against the
 * published bitstream spec. This closes the standing "no compressed
 * audio codec in the JVM" gap honestly: unlike MP3/AAC (patent-era DSP
 * with float filterbanks), FLAC is an integer-exact format a data
 * engine can implement completely and verify bit-for-bit.
 *
 * Encoder subset (always spec-valid output): fixed blocksize streams,
 * CONSTANT / VERBATIM / FIXED-order-0..4 / LPC subframes chosen per
 * block by exact cost (LPC via Levinson-Durbin with an estimate-pruned
 * order pick; the LPC-vs-fixed decision is exact and strict-improvement
 * only), stereo decorrelation over all four channel assignments, Rice
 * residuals (4-bit parameters, partition orders 0..6 with per-partition
 * exact-cost parameter selection), CRC-8/CRC-16 framing, STREAMINFO
 * with the raw-PCM MD5.
 *
 * Decoder superset (reads files our encoder never writes): LPC
 * subframes of ANY order up to 32, wasted-bits shifts, both Rice
 * methods (4- and 5-bit parameters) with any partition order plus
 * escape partitions, all blocksize/sample-rate/sample-size header
 * codes, and CRC verification of every frame — failures → None, the
 * error→NULL discipline.
 *
 * Everything is per-row integer arithmetic (no driver involvement), so
 * decode parallelism is row parallelism, the multimodal-column design
 * point.
 */
object Flac {

  // ---------------------------------------------------------------- bit IO

  private final class BitWriter {
    private var buf = new Array[Byte](1024)
    private var bytePos = 0
    private var bitPos = 0 // bits already used in buf(bytePos), MSB-first

    private def ensure(n: Int): Unit =
      if (bytePos + n + 8 > buf.length)
        buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, bytePos + n + 64))

    def writeBits(v: Long, n: Int): Unit = {
      ensure(n / 8 + 2)
      var left = n
      while (left > 0) {
        val take = math.min(8 - bitPos, left)
        val shift = left - take
        val bits = ((v >>> shift) & ((1L << take) - 1)).toInt
        buf(bytePos) = (buf(bytePos) | (bits << (8 - bitPos - take))).toByte
        bitPos += take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        left -= take
      }
    }

    def writeUnary(q: Int): Unit = { // q zero bits then a one
      var i = 0
      while (i < q) { writeBits(0, 1); i += 1 }
      writeBits(1, 1)
    }

    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1; ensure(1) }

    def position: Int = bytePos // valid when aligned
    def byteAt(i: Int): Byte = buf(i)
    def toArray: Array[Byte] = java.util.Arrays.copyOf(buf, bytePos + (if (bitPos > 0) 1 else 0))
  }

  private final class BitReader(bytes: Array[Byte]) {
    var bytePos = 0
    private var bitPos = 0
    var failed = false

    def readBits(n: Int): Long = {
      var v = 0L
      var left = n
      while (left > 0) {
        if (bytePos >= bytes.length) { failed = true; return 0L }
        val take = math.min(8 - bitPos, left)
        val bits = (bytes(bytePos) >> (8 - bitPos - take)) & ((1 << take) - 1)
        v = (v << take) | bits
        bitPos += take
        if (bitPos == 8) { bitPos = 0; bytePos += 1 }
        left -= take
      }
      v
    }

    def readSigned(n: Int): Int = {
      val v = readBits(n)
      (v << (64 - n) >> (64 - n)).toInt
    }

    def readUnary(): Int = {
      var q = 0
      while (!failed && readBits(1) == 0) {
        q += 1
        if (q > (1 << 24)) { failed = true; return 0 }
      }
      q
    }

    def alignByte(): Unit = if (bitPos != 0) { bitPos = 0; bytePos += 1 }
    def atByteBoundary: Boolean = bitPos == 0
  }

  // ------------------------------------------------------------------ CRCs

  /** CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC. */
  private[graft] def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        j += 1
      }
      i += 1
    }
    crc
  }

  /** CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — the frame CRC. */
  private[graft] def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var j = 0
      while (j < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
          else (crc << 1) & 0xffff
        j += 1
      }
      i += 1
    }
    crc
  }

  // --------------------------------------------------------------- encoder

  /** Encode planar integer samples (`samples(channel)(frame)`) as a
    * spec-valid FLAC stream. Fixed blocksize (last frame may be short),
    * best-of CONSTANT/VERBATIM/FIXED per subframe. 4..24 bits per
    * sample, 1..8 channels.
    *
    * STEREO DECORRELATION (2-channel input, on by default): per frame
    * the encoder plans all four channel assignments the spec defines —
    * independent, left-side, right-side, mid-side (side = L−R at
    * bits+1; mid = (L+R)>>1, the floor the decoder's `(m<<1)|(s&1)`
    * reconstruction inverts exactly) — and emits the one with the
    * smallest EXACT bit cost (the subframe planner returns the true
    * encoded size, so the choice is measured, not heuristic; ties keep
    * the earliest candidate in spec order, independent first).
    * Correlated stereo typically shrinks 5-15%; the decoder side has
    * supported all four assignments since round 12. */
  def encode(
      samples: Array[Array[Int]],
      sampleRate: Int,
      bitsPerSample: Int = 16,
      blockSize: Int = 4096,
      stereoDecorrelation: Boolean = true,
      maxPartitionOrder: Int = 6,
      maxLpcOrder: Int = 8): Array[Byte] = {
    val ch = samples.length
    require(ch >= 1 && ch <= 8, s"channels must be 1..8, got $ch")
    require(maxPartitionOrder >= 0 && maxPartitionOrder <= maxPartOrder,
      s"maxPartitionOrder must be 0..$maxPartOrder, got $maxPartitionOrder")
    require(maxLpcOrder >= 0 && maxLpcOrder <= 16,
      s"maxLpcOrder must be 0..16, got $maxLpcOrder")
    require(bitsPerSample >= 4 && bitsPerSample <= 24,
      s"bitsPerSample must be 4..24, got $bitsPerSample")
    require(blockSize >= 16 && blockSize <= 65535,
      s"blockSize must be 16..65535, got $blockSize")
    val total = samples(0).length
    require(samples.forall(_.length == total), "channels must be equal length")

    val w = new BitWriter
    // fLaC magic + STREAMINFO (last-metadata flag set, type 0, length 34)
    w.writeBits(0x664C6143L, 32)
    w.writeBits(0x80, 8); w.writeBits(34, 24)
    w.writeBits(blockSize, 16); w.writeBits(blockSize, 16)
    w.writeBits(0, 24); w.writeBits(0, 24) // min/max frame size unknown
    w.writeBits(sampleRate, 20)
    w.writeBits(ch - 1, 3); w.writeBits(bitsPerSample - 1, 5)
    w.writeBits(total.toLong, 36)
    val md5 = rawPcmMd5(samples, bitsPerSample)
    var i = 0
    while (i < 16) { w.writeBits(md5(i) & 0xffL, 8); i += 1 }

    var frameIdx = 0L
    var off = 0
    while (off < total || (total == 0 && frameIdx == 0)) {
      val bl = math.min(blockSize, total - off)
      if (bl <= 0) return w.toArray
      // stereo: plan all four channel assignments at exact cost
      var chAssign = ch - 1
      var stereoPlan: ((Array[Int], Int, Int, SubPlan), (Array[Int], Int, Int, SubPlan)) = null
      if (ch == 2 && stereoDecorrelation) {
        val l = samples(0); val r = samples(1)
        val side = new Array[Int](bl)
        val mid = new Array[Int](bl)
        var i2 = 0
        while (i2 < bl) {
          val lv = l(off + i2); val rv = r(off + i2)
          side(i2) = lv - rv
          mid(i2) = (lv + rv) >> 1
          i2 += 1
        }
        val b = bitsPerSample
        val pL = planSubframe(l, off, bl, b, maxPartitionOrder, maxLpcOrder)
        val pR = planSubframe(r, off, bl, b, maxPartitionOrder, maxLpcOrder)
        val pS = planSubframe(side, 0, bl, b + 1, maxPartitionOrder, maxLpcOrder)
        val pM = planSubframe(mid, 0, bl, b, maxPartitionOrder, maxLpcOrder)
        // strict < keeps the EARLIEST minimal candidate — independent
        // wins ties, then left-side, right-side, mid-side (spec order)
        val cands = Array(
          (ch - 1, ((l, off, b, pL), (r, off, b, pR)), pL.cost + pR.cost),
          (8, ((l, off, b, pL), (side, 0, b + 1, pS)), pL.cost + pS.cost),
          (9, ((side, 0, b + 1, pS), (r, off, b, pR)), pS.cost + pR.cost),
          (10, ((mid, 0, b, pM), (side, 0, b + 1, pS)), pM.cost + pS.cost))
        var bestCost = Long.MaxValue
        cands.foreach { case (code, plan, cost) =>
          if (cost < bestCost) { bestCost = cost; chAssign = code; stereoPlan = plan }
        }
      }
      val hStart = w.position
      // header: sync(14) 0 blocking(0) bs-code 0b0111 (16-bit follows)
      // sr-code 0 (STREAMINFO), channel assignment, size code, 0
      w.writeBits(0x3FFE, 14); w.writeBits(0, 1); w.writeBits(0, 1)
      w.writeBits(7, 4); w.writeBits(0, 4)
      w.writeBits(chAssign, 4)
      w.writeBits(sampleSizeCode(bitsPerSample), 3); w.writeBits(0, 1)
      writeUtf8Number(w, frameIdx)
      w.writeBits(bl - 1, 16)
      w.writeBits(crc8FromWriter(w, hStart), 8)
      if (stereoPlan != null) {
        val ((s0, o0, b0, p0), (s1, o1, b1, p1)) = stereoPlan
        writeSubframe(w, s0, o0, bl, b0, p0)
        writeSubframe(w, s1, o1, bl, b1, p1)
      } else {
        var c = 0
        while (c < ch) {
          encodeSubframe(w, samples(c), off, bl, bitsPerSample, maxPartitionOrder, maxLpcOrder)
          c += 1
        }
      }
      w.alignByte()
      w.writeBits(crc16FromWriter(w, hStart), 16)
      off += bl
      frameIdx += 1
    }
    w.toArray
  }

  private def crc8FromWriter(w: BitWriter, from: Int): Int = {
    val until = w.position
    val tmp = new Array[Byte](until - from)
    var i = 0
    while (i < tmp.length) { tmp(i) = w.byteAt(from + i); i += 1 }
    crc8(tmp, 0, tmp.length)
  }

  private def crc16FromWriter(w: BitWriter, from: Int): Int = {
    val until = w.position
    val tmp = new Array[Byte](until - from)
    var i = 0
    while (i < tmp.length) { tmp(i) = w.byteAt(from + i); i += 1 }
    crc16(tmp, 0, tmp.length)
  }

  private def sampleSizeCode(bits: Int): Int = bits match {
    case 8 => 1; case 12 => 2; case 16 => 4; case 20 => 5; case 24 => 6
    case _ => 0 // from STREAMINFO
  }

  /** The spec's UTF-8-style varint for frame/sample numbers. */
  private def writeUtf8Number(w: BitWriter, v: Long): Unit = {
    if (v < 0x80) { w.writeBits(v, 8); return }
    // smallest n in 2..7 with v < 2^((7-n)+6(n-1)) — the payload
    // capacity of an n-byte sequence
    var n = 2
    while (n < 7 && v >= (1L << ((7 - n) + 6 * (n - 1)))) n += 1
    val lead = (0xFF << (8 - n)) & 0xFF | ((v >> (6 * (n - 1))) & ((1 << (7 - n)) - 1)).toInt
    w.writeBits(lead, 8)
    var k = n - 2
    while (k >= 0) {
      w.writeBits(0x80L | ((v >> (6 * k)) & 0x3F), 8)
      k -= 1
    }
  }

  private def rawPcmMd5(samples: Array[Array[Int]], bits: Int): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytesPer = (bits + 7) / 8
    val total = samples(0).length
    val ch = samples.length
    val row = new Array[Byte](ch * bytesPer)
    var f = 0
    while (f < total) {
      var c = 0
      while (c < ch) {
        val v = samples(c)(f)
        var b = 0
        while (b < bytesPer) { row(c * bytesPer + b) = ((v >> (8 * b)) & 0xff).toByte; b += 1 }
        c += 1
      }
      md.update(row)
      f += 1
    }
    md.digest()
  }

  /** A chosen subframe encoding and its EXACT total bit cost (incl. the
    * 8-bit subframe header) — the unit the stereo-mode chooser sums.
    * kind: 0 constant, 1 verbatim, 2 fixed(order, partition order po,
    * per-partition rice ks). */
  private final case class SubPlan(
      kind: Int, order: Int, po: Int, ks: Array[Int], cost: Long,
      prec: Int = 0, shift: Int = 0, coefs: Array[Int] = Array.empty)

  private val maxPartOrder = 6

  /** Select the cheapest of CONSTANT / VERBATIM / FIXED(0..4) for one
    * subframe at exact rice cost, now over Rice PARTITION orders 0..6
    * too: the residual section splits into 2^po partitions (first one
    * short by the predictor order, per the spec), each with its own
    * 4-bit parameter — a block whose residual variance shifts (attack
    * transients, quiet→loud) pays one k per region instead of one
    * compromise k. Selection is exact-bit greedy per level: per-k
    * partition costs are computed once at the FINEST feasible level and
    * merged pairwise upward, so coarser orders reuse the fine sums
    * (O(15·n + 15·2^po) per predictor order, not O(15·n·po)). Ties keep
    * spec order — order asc, then po asc, then k asc, all strict
    * improvement — so a subframe partitioning can't strictly shrink is
    * emitted byte-identically to the order-0 encoder. The returned cost
    * is the true encoded size: [[writeSubframe]] emits exactly `cost`
    * bits from this plan. */
  private def planSubframe(
      s: Array[Int], off: Int, bl: Int, bits: Int, maxPo: Int,
      maxLpc: Int = 8): SubPlan = {
    var const = true
    var i = 1
    while (const && i < bl) { const = s(off + i) == s(off); i += 1 }
    if (const) return SubPlan(0, 0, 0, Array.empty, 8L + bits)
    var bestOrder = 0
    var bestPo = 0
    var bestKs: Array[Int] = Array(0)
    var bestBits = Long.MaxValue
    val res = new Array[Long](bl)
    var order = 0
    val maxOrder = math.min(4, bl - 1)
    while (order <= maxOrder) {
      residuals(s, off, bl, order, res)
      val nRes = bl - order
      // finest feasible level: bl divisible by 2^po and the first
      // partition non-empty ((bl >> po) > order)
      var fpo = 0
      while (fpo < maxPo && (bl & ((1 << (fpo + 1)) - 1)) == 0 &&
        (bl >> (fpo + 1)) > order) fpo += 1
      // per-k bit sums for each finest partition: sums(p)(k) =
      // Σ ((u >>> k) + 1 + k) over the partition's residuals
      val nParts = 1 << fpo
      val sums = Array.ofDim[Long](nParts, 15)
      val span = bl >> fpo
      var p = 0
      while (p < nParts) {
        val from = if (p == 0) 0 else p * span - order
        val to = (p + 1) * span - order
        var j = from
        while (j < to) {
          val u = zigzag(res(j))
          var k = 0
          while (k <= 14) { sums(p)(k) += (u >>> k) + 1 + k; k += 1 }
          j += 1
        }
        p += 1
      }
      // walk levels from FINEST to 0, merging pairwise; evaluate each po
      var level = fpo
      var cur = sums
      while (level >= 0) {
        val parts = 1 << level
        var total = order.toLong * bits + 2 + 4 // warmup + method + po field
        val ks = new Array[Int](parts)
        p = 0
        while (p < parts) {
          var bk = 0
          var bc = Long.MaxValue
          var k = 0
          while (k <= 14) {
            if (cur(p)(k) < bc) { bc = cur(p)(k); bk = k }
            k += 1
          }
          ks(p) = bk
          total += 4 + bc
          p += 1
        }
        // strict <, levels walked fine→coarse: record coarser (lower po)
        // plans on TIES so spec order (po asc) wins overall
        if (total <= bestBits && (total < bestBits || order == bestOrder)) {
          // same-order tie → lower po replaces; cross-order tie → keep
          // the earlier (lower) order
          if (total < bestBits || level < bestPo) {
            bestBits = total; bestOrder = order; bestPo = level; bestKs = ks
          }
        }
        if (level > 0) {
          val merged = Array.ofDim[Long](parts >> 1, 15)
          p = 0
          while (p < (parts >> 1)) {
            var k = 0
            while (k <= 14) {
              merged(p)(k) = cur(2 * p)(k) + cur(2 * p + 1)(k)
              k += 1
            }
            p += 1
          }
          cur = merged
        }
        level -= 1
      }
      order += 1
    }
    // LPC orders 1..min(maxLpc, bl−1) [Levinson-Durbin on the
    // rectangular-window autocorrelation; coefficients quantized to 12
    // bits with an exact-fit shift]: the residual chain r[i] = s[i] −
    // ((Σ qj·s[i−1−j]) >> shift) matches the decoder bit-for-bit, so
    // coefficient quality only affects SIZE, never correctness. Each
    // order is costed EXACTLY (true integer residuals through the same
    // Rice partition search) and replaces the fixed-predictor plan only
    // on STRICT improvement — every pre-LPC output stays byte-identical
    // unless LPC genuinely shrinks the subframe.
    var bestKind = 2
    var bestPrec = 0
    var bestShift = 0
    var bestCoefs: Array[Int] = Array.empty
    val maxL = math.min(maxLpc, bl - 1)
    if (maxL >= 1) {
      val prec = 12
      val ac = new Array[Double](maxL + 1)
      var lag = 0
      while (lag <= maxL) {
        var acc = 0.0
        var t = lag
        while (t < bl) {
          acc += s(off + t).toDouble * s(off + t - lag); t += 1
        }
        ac(lag) = acc
        lag += 1
      }
      if (ac(0) > 0.0) {
        // Levinson-Durbin with per-order coefficient snapshots; the
        // prediction-error curve then picks ONE candidate order by the
        // standard bits estimate (header + warmup + ~0.5·log2(residual
        // variance) per sample) — estimation only PRUNES the order
        // search; whether LPC replaces the fixed plan stays an EXACT
        // bit-count comparison, so the cost claim is never estimated.
        var err = ac(0)
        val a = new Array[Double](maxL)
        val snaps = Array.ofDim[Double](maxL + 1, maxL)
        val errs = new Array[Double](maxL + 1)
        var m = 1
        var mMax = 0
        while (m <= maxL && err > 0.0) {
          var acc = ac(m)
          var j = 1
          while (j < m) { acc -= a(j - 1) * ac(m - j); j += 1 }
          val k = acc / err
          val prev = java.util.Arrays.copyOf(a, math.max(m - 1, 0))
          j = 1
          while (j < m) { a(j - 1) = prev(j - 1) - k * prev(m - j - 1); j += 1 }
          a(m - 1) = k
          err *= 1.0 - k * k
          System.arraycopy(a, 0, snaps(m), 0, m)
          errs(m) = err
          mMax = m
          m += 1
        }
        var mBest = 0
        var estBest = Double.MaxValue
        m = 1
        while (m <= mMax) {
          val nRes = (bl - m).toDouble
          val v = math.max(errs(m), 1e-9) / math.max(nRes, 1.0)
          val est = m.toDouble * (bits + prec) +
            nRes * math.max(0.5 * math.log(v) / math.log(2.0), 0.0)
          if (est < estBest) { estBest = est; mBest = m }
          m += 1
        }
        if (mBest >= 1) {
          val cand = snaps(mBest)
          var maxAbs = 0.0
          var j = 0
          while (j < mBest) { maxAbs = math.max(maxAbs, math.abs(cand(j))); j += 1 }
          if (maxAbs > 0.0) {
            var sh = 15
            while (sh > 0 && maxAbs * (1L << sh).toDouble > 2047.0) sh -= 1
            val q = new Array[Int](mBest)
            var anyNonZero = false
            j = 0
            while (j < mBest) {
              q(j) = math.max(-2048L, math.min(2047L,
                math.round(cand(j) * (1L << sh).toDouble))).toInt
              anyNonZero ||= q(j) != 0
              j += 1
            }
            if (anyNonZero) {
              lpcResiduals(s, off, bl, q, sh, res)
              val (po, ks, sec) = ricePlanFor(res, bl, mBest, maxPo)
              val total = mBest.toLong * bits + 9L + mBest.toLong * prec + sec
              if (total < bestBits) {
                bestBits = total; bestKind = 3; bestOrder = mBest
                bestPo = po; bestKs = ks
                bestPrec = prec; bestShift = sh; bestCoefs = q
              }
            }
          }
        }
      }
    }
    val verbatimBits = bl.toLong * bits
    if (bestBits >= verbatimBits) SubPlan(1, 0, 0, Array.empty, 8L + verbatimBits)
    else SubPlan(bestKind, bestOrder, bestPo, bestKs, 8L + bestBits,
      bestPrec, bestShift, bestCoefs)
  }

  /** LPC residual chain — the decoder's reconstruction inverted exactly:
    * out(i−order) = s[i] − ((Σ coefs(j)·s[i−1−j]) >> shift). */
  private def lpcResiduals(s: Array[Int], off: Int, bl: Int,
      coefs: Array[Int], shift: Int, out: Array[Long]): Unit = {
    val order = coefs.length
    var i = order
    while (i < bl) {
      var acc = 0L
      var j = 0
      while (j < order) { acc += coefs(j).toLong * s(off + i - 1 - j); j += 1 }
      out(i - order) = s(off + i).toLong - (acc >> shift)
      i += 1
    }
  }

  /** Exact-cost Rice partition plan for one residual set: per-k sums at
    * the finest feasible level merged pairwise upward (the planSubframe
    * machinery for a single predictor); ties keep the LOWEST po.
    * Returns (po, ks, section bits = method + po field + per-partition
    * params + codes). */
  private def ricePlanFor(
      res: Array[Long], bl: Int, order: Int, maxPo: Int): (Int, Array[Int], Long) = {
    var fpo = 0
    while (fpo < maxPo && (bl & ((1 << (fpo + 1)) - 1)) == 0 &&
      (bl >> (fpo + 1)) > order) fpo += 1
    val nParts = 1 << fpo
    val sums = Array.ofDim[Long](nParts, 15)
    val span = bl >> fpo
    var p = 0
    while (p < nParts) {
      val from = if (p == 0) 0 else p * span - order
      val to = (p + 1) * span - order
      var j = from
      while (j < to) {
        val u = zigzag(res(j))
        var k = 0
        while (k <= 14) { sums(p)(k) += (u >>> k) + 1 + k; k += 1 }
        j += 1
      }
      p += 1
    }
    var bestPo = 0
    var bestKs: Array[Int] = null
    var best = Long.MaxValue
    var level = fpo
    var cur = sums
    while (level >= 0) {
      val parts = 1 << level
      var sec = 2L + 4L
      val ks = new Array[Int](parts)
      p = 0
      while (p < parts) {
        var bk = 0
        var bc = Long.MaxValue
        var k = 0
        while (k <= 14) {
          if (cur(p)(k) < bc) { bc = cur(p)(k); bk = k }
          k += 1
        }
        ks(p) = bk
        sec += 4 + bc
        p += 1
      }
      // fine→coarse walk: replacing on == keeps the LOWEST po on ties
      if (sec <= best) { best = sec; bestPo = level; bestKs = ks }
      if (level > 0) {
        val merged = Array.ofDim[Long](parts >> 1, 15)
        p = 0
        while (p < (parts >> 1)) {
          var k = 0
          while (k <= 14) {
            merged(p)(k) = cur(2 * p)(k) + cur(2 * p + 1)(k)
            k += 1
          }
          p += 1
        }
        cur = merged
      }
      level -= 1
    }
    (bestPo, bestKs, best)
  }

  /** Emit one subframe from its plan — exactly `plan.cost` bits. */
  private def writeSubframe(
      w: BitWriter, s: Array[Int], off: Int, bl: Int, bits: Int,
      plan: SubPlan): Unit = plan.kind match {
    case 0 =>
      w.writeBits(0, 1); w.writeBits(0, 6); w.writeBits(0, 1)
      w.writeBits(s(off).toLong & ((1L << bits) - 1), bits)
    case 1 =>
      w.writeBits(0, 1); w.writeBits(1, 6); w.writeBits(0, 1)
      var j = 0
      while (j < bl) {
        w.writeBits(s(off + j).toLong & ((1L << bits) - 1), bits)
        j += 1
      }
    case _ =>
      val lpc = plan.kind == 3
      w.writeBits(0, 1)
      w.writeBits(if (lpc) 32 + plan.order - 1 else 8 + plan.order, 6)
      w.writeBits(0, 1)
      var j = 0
      while (j < plan.order) {
        w.writeBits(s(off + j).toLong & ((1L << bits) - 1), bits)
        j += 1
      }
      val res = new Array[Long](bl)
      if (lpc) {
        w.writeBits(plan.prec - 1, 4)
        w.writeBits(plan.shift.toLong, 5)
        j = 0
        while (j < plan.order) {
          w.writeBits(plan.coefs(j).toLong & ((1L << plan.prec) - 1), plan.prec)
          j += 1
        }
        lpcResiduals(s, off, bl, plan.coefs, plan.shift, res)
      } else residuals(s, off, bl, plan.order, res)
      w.writeBits(0, 2) // rice method 0 (4-bit params)
      w.writeBits(plan.po, 4)
      val parts = 1 << plan.po
      val span = bl >> plan.po
      var p = 0
      while (p < parts) {
        val k = plan.ks(p)
        w.writeBits(k, 4)
        var j2 = if (p == 0) 0 else p * span - plan.order
        val to = (p + 1) * span - plan.order
        while (j2 < to) {
          val u = zigzag(res(j2))
          w.writeUnary((u >>> k).toInt)
          if (k > 0) w.writeBits(u & ((1L << k) - 1), k)
          j2 += 1
        }
        p += 1
      }
  }

  private def encodeSubframe(
      w: BitWriter, s: Array[Int], off: Int, bl: Int, bits: Int,
      maxPo: Int, maxLpc: Int): Unit =
    writeSubframe(w, s, off, bl, bits,
      planSubframe(s, off, bl, bits, maxPo, maxLpc))

  private def zigzag(r: Long): Long = if (r >= 0) r << 1 else ((-r) << 1) - 1

  /** Fixed-predictor residuals of the given order into `out(0..bl-order)`. */
  private def residuals(s: Array[Int], off: Int, bl: Int, order: Int, out: Array[Long]): Unit = {
    var i = order
    while (i < bl) {
      val p = off + i
      val r: Long = order match {
        case 0 => s(p)
        case 1 => s(p).toLong - s(p - 1)
        case 2 => s(p).toLong - 2L * s(p - 1) + s(p - 2)
        case 3 => s(p).toLong - 3L * s(p - 1) + 3L * s(p - 2) - s(p - 3)
        case _ => s(p).toLong - 4L * s(p - 1) + 6L * s(p - 2) - 4L * s(p - 3) + s(p - 4)
      }
      out(i - order) = r
      i += 1
    }
  }

  // --------------------------------------------------------------- decoder

  final case class FlacAudio(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      totalSamples: Long,
      samples: Array[Array[Int]])

  /** Decode a FLAC stream; None on any structural or CRC failure. */
  def decode(bytes: Array[Byte]): Option[FlacAudio] = {
    if (bytes == null || bytes.length < 42) return None
    val r = new BitReader(bytes)
    if (r.readBits(32) != 0x664C6143L) return None
    // metadata blocks
    var last = false
    var sampleRate = 0; var ch = 0; var bits = 0; var total = 0L
    var sawStreamInfo = false
    while (!last && !r.failed) {
      last = r.readBits(1) == 1
      val btype = r.readBits(7).toInt
      val blen = r.readBits(24).toInt
      if (btype == 0) {
        sawStreamInfo = true
        r.readBits(16); r.readBits(16); r.readBits(24); r.readBits(24)
        sampleRate = r.readBits(20).toInt
        ch = r.readBits(3).toInt + 1
        bits = r.readBits(5).toInt + 1
        total = r.readBits(36)
        var i = 0
        while (i < 16) { r.readBits(8); i += 1 }
      } else {
        var i = 0
        while (i < blen) { r.readBits(8); i += 1 }
      }
    }
    if (r.failed || !sawStreamInfo || ch < 1 || ch > 8 || bits < 4 || bits > 32)
      return None
    if (total > (1L << 31)) return None
    decodeFrames(bytes, r, sampleRate, ch, bits, total)
  }

  private def decodeFrames(
      bytes: Array[Byte], r: BitReader,
      sampleRate: Int, ch: Int, bits: Int, total: Long): Option[FlacAudio] = {
    val bufs = Array.fill(ch)(new scala.collection.mutable.ArrayBuilder.ofInt)
    var got = 0L
    while (got < total) {
      if (!r.atByteBoundary || r.failed) return None
      val frameStart = r.bytePos
      if (r.readBits(14) != 0x3FFE) return None
      r.readBits(1) // reserved
      r.readBits(1) // blocking strategy (frame vs sample number — parsed either way)
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chAssign = r.readBits(4).toInt
      val ssCode = r.readBits(3).toInt
      r.readBits(1)
      readUtf8Number(r)
      val blockLen = bsCode match {
        case 0 => return None
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match {
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => return None
        case _ => ()
      }
      val frameBits = ssCode match {
        case 0 => bits
        case 1 => 8; case 2 => 12; case 4 => 16; case 5 => 20; case 6 => 24
        case _ => return None
      }
      if (chAssign > 10) return None // 11-15 are reserved per the spec
      val nCh = if (chAssign <= 7) chAssign + 1 else 2
      if (nCh != ch) return None
      // CRC-8 of the header INCLUDING its crc byte is 0
      r.readBits(8)
      if (!r.atByteBoundary) return None
      if (crc8(bytes, frameStart, r.bytePos) != 0) return None
      // frames past the declared total are decoded at their stated
      // blockLen but only the declared remainder is kept
      val chans = new Array[Array[Int]](nCh)
      var c = 0
      var ok = true
      while (ok && c < nCh) {
        val extra = chAssign match {
          case 8 => if (c == 1) 1 else 0  // left/side
          case 9 => if (c == 0) 1 else 0  // side/right
          case 10 => if (c == 1) 1 else 0 // mid/side
          case _ => 0
        }
        decodeSubframe(r, blockLen, frameBits + extra) match {
          case Some(arr) => chans(c) = arr
          case None => ok = false
        }
        c += 1
      }
      if (!ok || r.failed) return None
      r.alignByte()
      r.readBits(16)
      if (r.failed || crc16(bytes, frameStart, r.bytePos) != 0) return None
      // undo decorrelation
      val decoded: Array[Array[Int]] = chAssign match {
        case 8 => // left/side: right = left - side
          val l = chans(0); val s = chans(1)
          Array(l, Array.tabulate(blockLen)(i => l(i) - s(i)))
        case 9 => // side/right: left = right + side
          val s = chans(0); val rr = chans(1)
          Array(Array.tabulate(blockLen)(i => rr(i) + s(i)), rr)
        case 10 => // mid/side
          val m = chans(0); val s = chans(1)
          val l = new Array[Int](blockLen); val rr = new Array[Int](blockLen)
          var i = 0
          while (i < blockLen) {
            val mm = (m(i) << 1) | (s(i) & 1)
            l(i) = (mm + s(i)) >> 1
            rr(i) = (mm - s(i)) >> 1
            i += 1
          }
          Array(l, rr)
        case _ => chans
      }
      val keep = math.min(blockLen.toLong, total - got).toInt
      c = 0
      while (c < nCh) {
        var i = 0
        while (i < keep) { bufs(c) += decoded(c)(i); i += 1 }
        c += 1
      }
      got += keep
    }
    Some(FlacAudio(sampleRate, ch, bits, total, bufs.map(_.result())))
  }

  private def readUtf8Number(r: BitReader): Long = {
    val first = r.readBits(8).toInt
    if ((first & 0x80) == 0) return first
    var n = 0
    var mask = 0x40
    while ((first & mask) != 0 && n < 7) { n += 1; mask >>= 1 }
    var v = (first & (mask - 1)).toLong
    var i = 0
    while (i < n) {
      val b = r.readBits(8).toInt
      if ((b & 0xC0) != 0x80) { r.failed = true; return 0 }
      v = (v << 6) | (b & 0x3F)
      i += 1
    }
    v
  }

  private def decodeSubframe(r: BitReader, bl: Int, bits: Int): Option[Array[Int]] = {
    if (r.readBits(1) != 0) return None
    val tpe = r.readBits(6).toInt
    val wastedFlag = r.readBits(1) == 1
    val wasted = if (wastedFlag) r.readUnary() + 1 else 0
    if (r.failed) return None
    val eBits = bits - wasted
    if (eBits < 1 || eBits > 32) return None
    val out: Array[Int] = tpe match {
      case 0 =>
        val v = r.readSigned(eBits)
        Array.fill(bl)(v)
      case 1 =>
        Array.fill(bl)(r.readSigned(eBits))
      case t if t >= 8 && t <= 12 =>
        val order = t - 8
        if (order > bl) return None
        val s = new Array[Int](bl)
        var i = 0
        while (i < order) { s(i) = r.readSigned(eBits); i += 1 }
        if (!decodeResiduals(r, bl, order, s)) return None
        i = order
        while (i < bl) {
          val p: Long = order match {
            case 0 => 0L
            case 1 => s(i - 1)
            case 2 => 2L * s(i - 1) - s(i - 2)
            case 3 => 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
            case _ => 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
          }
          s(i) = (s(i) + p).toInt
          i += 1
        }
        s
      case t if t >= 32 =>
        val order = (t & 31) + 1
        if (order > bl) return None
        val s = new Array[Int](bl)
        var i = 0
        while (i < order) { s(i) = r.readSigned(eBits); i += 1 }
        val precM1 = r.readBits(4).toInt
        if (precM1 == 15) return None
        val prec = precM1 + 1
        val shift = r.readSigned(5)
        if (shift < 0) return None
        val coefs = new Array[Int](order)
        i = 0
        while (i < order) { coefs(i) = r.readSigned(prec); i += 1 }
        if (!decodeResiduals(r, bl, order, s)) return None
        i = order
        while (i < bl) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coefs(j).toLong * s(i - 1 - j); j += 1 }
          s(i) = (s(i) + (acc >> shift)).toInt
          i += 1
        }
        s
      case _ => return None // reserved types
    }
    if (r.failed) None
    else if (wasted > 0) Some(out.map(_ << wasted))
    else Some(out)
  }

  /** Rice-coded residuals into s(order..bl); true on success. */
  private def decodeResiduals(r: BitReader, bl: Int, order: Int, s: Array[Int]): Boolean = {
    val method = r.readBits(2).toInt
    if (method > 1) return false
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.readBits(4).toInt
    val parts = 1 << partOrder
    if (bl % parts != 0) return false
    var idx = order
    var p = 0
    while (p < parts) {
      val count = (bl >> partOrder) - (if (p == 0) order else 0)
      if (count < 0) return false
      val param = r.readBits(paramBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < count) {
          s(idx) = if (raw == 0) 0 else r.readSigned(raw)
          idx += 1; i += 1
        }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val u = (q << param) | (if (param > 0) r.readBits(param) else 0L)
          val v = if ((u & 1) == 0) u >>> 1 else -((u + 1) >>> 1)
          s(idx) = v.toInt
          idx += 1; i += 1
        }
      }
      if (r.failed) return false
      p += 1
    }
    true
  }
}
