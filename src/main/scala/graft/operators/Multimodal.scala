package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns with typed metadata, and decode / feature-extraction
 * runs as a partition-local batch kernel (`mapPartitions`) — the Scala
 * analogue of a vectorized Python `mapInPandas` stage.
 *
 * IMAGE decode is REAL: `decodeImage` runs `javax.imageio` (PNG, JPEG,
 * GIF, BMP — pure JVM, no external codec libraries), reads width/height
 * from the actual header and features from the actual pixels. The
 * feature math is exact-integer channel sums followed by fully-specified
 * IEEE divisions, so the DuckDB oracle replays the floats bit-for-bit
 * from the known pixel content of [[syntheticPng]] images (PNG is
 * lossless — decoded pixels ARE the generator formula).
 *
 * AUDIO decode is REAL for WAV/PCM (`decodeWav`: pure-JVM RIFF walk +
 * integer-PCM 8/16/24-bit, μ-law/A-law, IMA & MS ADPCM) and for FLAC
 * ([[graft.operators.Flac]]: full decoder incl. LPC and stereo
 * decorrelation), with the same exact-integer-then-IEEE feature
 * discipline replayed by the oracle from the synthetic generators.
 * VIDEO decode is real for GIF frame extraction and AVI/MS-RLE8
 * inter-frame streams. Only codecs with no pure-JVM implementation
 * (MP3/AAC) fall back to `decodeStub`, a deterministic fake with the
 * same record shape: swap it for a JNI codec call and the pipeline is
 * unchanged.
 *
 * Scale note: decode is the classic CPU-heavy narrow stage — no shuffle,
 * scales with executors; `repartition(n)` upstream only to even out skewed
 * blob sizes.
 */
object Multimodal {

  /** One decoded media record: metadata + fixed-width feature vector. */
  case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      width: Int,
      height: Int,
      features: Array[Float])

  val FeatureDim = 8

  /** STUB decoder — the fallback for blobs no image reader recognizes
    * (audio/video stand-in; the JVM ships no audio/video codecs).
    * Deterministic in the input bytes so tests and oracles are stable:
    * each feature is an exact integer byte-sum per residue class followed
    * by two IEEE double divisions and one float rounding — all fully
    * specified operations, so any engine (the DuckDB oracle included)
    * reproduces the floats bit-for-bit. */
  private[operators] def decodeStub(docId: Long, bytes: Array[Byte]): MediaFeatures = {
    val n = bytes.length
    // fake "header parse": dimensions derived from content
    val width = 16 + (if (n > 0) (bytes(0) & 0x3f) else 0)
    val height = 16 + (if (n > 1) (bytes(1) & 0x3f) else 0)
    val sums = new Array[Long](FeatureDim)
    var i = 0
    while (i < n) {
      sums(i % FeatureDim) += (bytes(i) & 0xff)
      i += 1
    }
    val feats = new Array[Float](FeatureDim)
    var f = 0
    while (f < FeatureDim) {
      feats(f) = (sums(f).toDouble / 255.0 / math.max(1, n / FeatureDim).toDouble).toFloat
      f += 1
    }
    MediaFeatures(docId, n.toLong, width, height, feats)
  }

  /** REAL image decode via `javax.imageio`: None when no registered
    * reader recognizes the bytes (not an image). Width/height come from
    * the decoded header; the 8 features are exact-integer pixel sums
    * followed by IEEE double divisions and one float32 rounding — fully
    * specified, so any engine replays them from known pixel content:
    *  - f0/f1/f2: mean R/G/B           = sum(c) / 255 / n
    *  - f3..f6: quadrant mass (r+g+b) / 765 / n, quadrant index
    *    (y*2 div h)*2 + (x*2 div w) — row-major TL,TR,BL,BR
    *  - f7: mean integer luma          = sum((299r+587g+114b) div 1000) / 255 / n
    */
  def decodeImage(docId: Long, bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 4) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null } // truncated/corrupt image → stub path
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val px = img.getRGB(0, 0, w, h, null, 0, w) // one bulk fetch, any source format
    Some(featuresFromArgb(docId, bytes.length, px, w, h))
  }

  /** The shared feature fold over row-major 0xRRGGBB pixels — one
    * definition so every decoder (ImageIO, the TGA parser, frame
    * decoders) produces identical floats for identical pixels. */
  private def featuresFromArgb(
      docId: Long, nBytes: Long, px: Array[Int], w: Int, h: Int): MediaFeatures = {
    val n = w.toLong * h
    var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
    val quad = new Array[Long](4)
    var y = 0
    while (y < h) {
      val qRow = (y * 2 / h) * 2
      var x = 0
      while (x < w) {
        val rgb = px(y * w + x)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val b = rgb & 0xff
        sr += r; sg += g; sb += b
        sl += (299 * r + 587 * g + 114 * b) / 1000
        quad(qRow + x * 2 / w) += r + g + b
        x += 1
      }
      y += 1
    }
    val feats = new Array[Float](FeatureDim)
    feats(0) = (sr.toDouble / 255.0 / n.toDouble).toFloat
    feats(1) = (sg.toDouble / 255.0 / n.toDouble).toFloat
    feats(2) = (sb.toDouble / 255.0 / n.toDouble).toFloat
    var qi = 0
    while (qi < 4) {
      feats(3 + qi) = (quad(qi).toDouble / 765.0 / n.toDouble).toFloat
      qi += 1
    }
    feats(7) = (sl.toDouble / 255.0 / n.toDouble).toFloat
    MediaFeatures(docId, nBytes, w, h, feats)
  }

  /** Batched partition-local decode over (id, blob) rows: real image
    * decode where the bytes are a recognized image, stub otherwise. */
  def decodeFeatures(spark: SparkSession, blobs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // partition-local batch loop — reader instances are per-call, and
        // the ImageIO disk cache is off so decode never touches /tmp
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          decodeImage(id, bytes)
            .orElse(decodeTga(id, bytes)) // ImageIO has no TGA reader
            .orElse(decodeQoi(id, bytes)) // ...nor a QOI one
            .orElse(decodePcx(id, bytes)) // ...nor a PCX one
            .getOrElse(
              decodeStub(id, if (bytes == null) Array.emptyByteArray else bytes))
        }
      }
  }

  /** One histogram cell: pixel count of `channel` (0=r 1=g 2=b) whose
    * intensity falls in `bin`. */
  case class ChannelHistogram(doc_id: Long, channel: Int, bin: Int, n: Long)

  /** Per-channel intensity histograms over decoded images — the
    * color-distribution screen an image-curation pass runs before
    * training (flat-histogram synthetic screenshots, blown-highlight
    * detection, palette fingerprints for near-dup blocking). `nBins`
    * equal-width bins per channel (256 must divide evenly — loud),
    * DENSE output: every (channel, bin) row emitted, zero counts
    * included, so downstream L1/χ² distances never misalign sparse
    * rows. Single-band (grayscale) rasters replicate into all three
    * channels (r = g = b — the [[decodeImage]] convention); undecodable
    * blobs skip. Exact integer counts from a narrow partition-local
    * decode — no shuffle, oracle-replayable value-level. */
  def imageHistogram(
      spark: SparkSession,
      blobs: DataFrame,
      nBins: Int = 16): Dataset[ChannelHistogram] = {
    require(nBins >= 1 && 256 % nBins == 0,
      s"nBins must divide 256 evenly, got $nBins")
    val width = 256 / nBins
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        javax.imageio.ImageIO.setUseCache(false)
        val img =
          try {
            if (bytes == null) null
            else javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
          } catch { case _: Exception => null }
        if (img == null) Iterator.empty
        else {
          val raster = img.getRaster
          val bands = raster.getNumBands
          val counts = Array.ofDim[Long](3, nBins)
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              var c = 0
              while (c < 3) {
                val v = raster.getSample(x, y, if (bands >= 3) c else 0)
                counts(c)(v / width) += 1
                c += 1
              }
              x += 1
            }
            y += 1
          }
          for {
            c <- (0 until 3).iterator
            b <- (0 until nBins).iterator
          } yield ChannelHistogram(id, c, b, counts(c)(b))
        }
      }
  }

  /** Deterministic synthetic PNG: dimensions and every pixel are a pure
    * integer formula of `docId`, encoded losslessly — so a decoder-side
    * oracle can recompute the decoded pixels WITHOUT decoding PNG:
    *   w = 16 + docId mod 17, h = 16 + (7*docId) mod 13
    *   r = (31*docId + 7x + 13y) mod 256
    *   g = (17*docId + 11x + 3y) mod 256
    *   b = (13*docId + 5x + 29y) mod 256
    * (PNG byte size is encoder-dependent and deliberately excluded from
    * oracle-checked outputs.) */
  def syntheticPng(docId: Long): Array[Byte] = {
    val w = 16 + java.lang.Math.floorMod(docId, 17L).toInt
    val h = 16 + java.lang.Math.floorMod(docId * 7, 13L).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = java.lang.Math.floorMod(docId * 31 + x * 7 + y * 13, 256L).toInt
        val g = java.lang.Math.floorMod(docId * 17 + x * 11 + y * 3, 256L).toInt
        val b = java.lang.Math.floorMod(docId * 13 + x * 5 + y * 29, 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (doc_id, blob) table of [[syntheticPng]] images for the given ids —
    * the deterministic image corpus the img queries decode. Narrow
    * mapPartitions; blob generation is partition-local CPU. */
  def syntheticImageBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticPng)

  /** The shared synthetic pixel formula ([[syntheticPng]]'s scaladoc):
    * 0xRRGGBB at (x, y) for a given doc id. */
  private def formulaPixel(docId: Long, x: Int, y: Int): Int = {
    val r = java.lang.Math.floorMod(docId * 31 + x * 7 + y * 13, 256L).toInt
    val g = java.lang.Math.floorMod(docId * 17 + x * 11 + y * 3, 256L).toInt
    val b = java.lang.Math.floorMod(docId * 13 + x * 5 + y * 29, 256L).toInt
    (r << 16) | (g << 8) | b
  }

  /** One perceptual-hash record: 64-bit average hash + difference hash
    * over the decoded pixels. */
  case class ImageHashes(doc_id: Long, width: Int, height: Int, ahash: Long, dhash: Long)

  /** Integer box-downsample of row-major 0xRRGGBB pixels to a gw×gh
    * grid of average lumas. Pixel (x, y) lands in cell
    * (⌊x·gw/w⌋, ⌊y·gh/h⌋); per-pixel luma is the pure-integer
    * (77·r + 150·g + 29·b) >> 8 (77+150+29 = 256, so luma ∈ [0, 255]);
    * each cell is the FLOOR average of its lumas. Everything is exact
    * integer arithmetic, so a SQL oracle replays the grid bit-for-bit
    * from a pixel formula. Requires w ≥ gw and h ≥ gh (every cell
    * non-empty) — callers guard. Returned row-major: cell(cx, cy) =
    * grid(cy·gw + cx). */
  private[graft] def lumaGrid(
      px: Array[Int], w: Int, h: Int, gw: Int, gh: Int): Array[Long] = {
    val sum = new Array[Long](gw * gh)
    val cnt = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val cy = y * gh / h
      var x = 0
      while (x < w) {
        val cx = x * gw / w
        val p = px(y * w + x)
        val lum = (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) +
          29 * (p & 0xff)) >> 8
        sum(cy * gw + cx) += lum
        cnt(cy * gw + cx) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(gw * gh)(i => sum(i) / cnt(i))
  }

  /** 64-bit difference hash (dHash): 9×8 luma grid, bit cy·8+cx set iff
    * cell(cx+1, cy) > cell(cx, cy) — each bit is a horizontal gradient
    * sign, so the code is invariant under uniform brightness shifts and
    * approximately invariant under rescaling (the classic near-duplicate
    * image fingerprint). Requires w ≥ 9, h ≥ 8. */
  private[graft] def dHash64(px: Array[Int], w: Int, h: Int): Long = {
    val g = lumaGrid(px, w, h, 9, 8)
    var bits = 0L
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 8) {
        if (g(cy * 9 + cx + 1) > g(cy * 9 + cx)) bits |= 1L << (cy * 8 + cx)
        cx += 1
      }
      cy += 1
    }
    bits
  }

  /** 64-bit average hash (aHash): 8×8 luma grid, bit cy·8+cx set iff the
    * cell STRICTLY exceeds the floor mean of the 64 cells. Also
    * brightness-shift invariant (a uniform +k moves every cell and the
    * floor mean by exactly k). Requires w ≥ 8, h ≥ 8. */
  private[graft] def aHash64(px: Array[Int], w: Int, h: Int): Long = {
    val g = lumaGrid(px, w, h, 8, 8)
    var s = 0L
    var i = 0
    while (i < 64) { s += g(i); i += 1 }
    val mean = s / 64
    var bits = 0L
    i = 0
    while (i < 64) {
      if (g(i) > mean) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** Perceptual hashes over (doc_id, blob) rows via the JVM's real image
    * decoders (`ImageIO` — PNG/JPEG/GIF/BMP; compose with the hand
    * parsers' pixel paths for TGA/QOI/PCX if needed). Narrow
    * partition-local decode, two 64-bit codes per image — the scan that
    * turns a 100 TB image corpus into a 16-byte-per-row near-dup index.
    * Images smaller than the 9×8 grid raise loudly (an empty grid cell
    * would silently divide by zero). */
  def perceptualHashes(spark: SparkSession, blobs: DataFrame): Dataset[ImageHashes] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          require(img != null, s"perceptualHashes: undecodable blob for doc $id")
          val w = img.getWidth
          val h = img.getHeight
          require(w >= 9 && h >= 8,
            s"perceptualHashes: image ${w}x$h below the 9x8 hash grid (doc $id)")
          val px = img.getRGB(0, 0, w, h, null, 0, w)
          ImageHashes(id, w, h, aHash64(px, w, h), dHash64(px, w, h))
        }
      }
  }

  /** Deterministic NEAR-DUPLICATE variant of [[syntheticPng]]: same
    * dimensions, every channel brightened by +8 with a 255 clamp
    * (dHash/aHash are invariant to the shift except where the clamp
    * bites), plus a 4×4 crimson patch at the origin (x < 4 ∧ y < 4 →
    * (230, 10, 60)) that flips a handful of gradient bits — so
    * base↔variant pairs sit at a small but non-zero Hamming distance.
    * Both perturbations are exact-integer CASE/least formulas the DuckDB
    * oracle replays per pixel. */
  def syntheticVariantPng(docId: Long): Array[Byte] = {
    val w = 16 + java.lang.Math.floorMod(docId, 17L).toInt
    val h = 16 + java.lang.Math.floorMod(docId * 7, 13L).toInt
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb =
          if (x < 4 && y < 4) (230 << 16) | (10 << 8) | 60
          else {
            val p = formulaPixel(docId, x, y)
            val r = math.min(((p >> 16) & 0xff) + 8, 255)
            val g = math.min(((p >> 8) & 0xff) + 8, 255)
            val b = math.min((p & 0xff) + 8, 255)
            (r << 16) | (g << 8) | b
          }
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.setUseCache(false)
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (doc_id, blob) table of [[syntheticVariantPng]] images. */
  def syntheticVariantBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticVariantPng)

  /** Deterministic synthetic BMP — the same pixel formula as
    * [[syntheticPng]] at w = 16 + docId mod 19, h = 16 + 5·docId mod 11 —
    * encoded by HAND as a 24-bit uncompressed BI_RGB / BITMAPINFOHEADER
    * file (bottom-up rows, 4-byte row padding, BGR byte order). The
    * encoder is independent of `javax.imageio`, so decoding it through
    * [[decodeImage]] exercises the JVM's real BMP codec end-to-end
    * against bytes we fully control — a second container format on the
    * real-decode path, not another trip through the PNG writer. */
  def syntheticBmp(docId: Long): Array[Byte] = {
    val w = 16 + java.lang.Math.floorMod(docId, 19L).toInt
    val h = 16 + java.lang.Math.floorMod(docId * 5, 11L).toInt
    val rowBytes = (w * 3 + 3) & ~3
    val dataSize = rowBytes * h
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
      .putInt(54 + dataSize).putInt(0).putInt(54) // file size, reserved, pixel offset
      .putInt(40).putInt(w).putInt(h)             // BITMAPINFOHEADER, +h = bottom-up
      .putShort(1).putShort(24)                   // planes, bpp
      .putInt(0).putInt(dataSize)                 // BI_RGB, image size
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 72 dpi, palette fields
    var y = h - 1 // bottom-up: last image row first in the file
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = formulaPixel(docId, x, y)
        buf.put((p & 0xff).toByte)          // B
          .put(((p >> 8) & 0xff).toByte)    // G
          .put(((p >> 16) & 0xff).toByte)   // R
        x += 1
      }
      var pad = rowBytes - w * 3
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      y -= 1
    }
    buf.array()
  }

  /** (doc_id, blob) table of [[syntheticBmp]] images. */
  def syntheticBmpBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticBmp)

  // 18-byte TGA 2.0 footer tail: "TRUEVISION-XFILE" + '.' + NUL
  private val TgaFooterSig: Array[Byte] =
    "TRUEVISION-XFILE.".getBytes("US-ASCII") :+ 0.toByte

  /** Deterministic synthetic TGA — same pixel formula, w = 16 + docId
    * mod 23, h = 16 + 3·docId mod 15. Alternates the two truecolor
    * encodings (even doc id → type 2 uncompressed, odd → type 10
    * run-length) and both row origins (docId mod 3 = 0 → bottom-left,
    * else top-left), and appends the TGA 2.0 footer signature — TGA has
    * no magic number, so the footer is what makes sniffing exact. */
  def syntheticTga(docId: Long): Array[Byte] = {
    val w = 16 + java.lang.Math.floorMod(docId, 23L).toInt
    val h = 16 + java.lang.Math.floorMod(docId * 3, 15L).toInt
    val rle = (docId & 1L) == 1L
    val bottomUp = java.lang.Math.floorMod(docId, 3L) == 0L
    val out = new java.io.ByteArrayOutputStream()
    out.write(0); out.write(0)                   // id length, no color map
    out.write(if (rle) 10 else 2)                // image type
    (0 until 5).foreach(_ => out.write(0))       // color map spec
    out.write(0); out.write(0); out.write(0); out.write(0) // x/y origin
    out.write(w & 0xff); out.write(w >> 8)
    out.write(h & 0xff); out.write(h >> 8)
    out.write(24)                                // bpp
    out.write(if (bottomUp) 0x00 else 0x20)      // descriptor: origin bit 5
    def putPixel(x: Int, y: Int): Unit = {
      val p = formulaPixel(docId, x, y)
      out.write(p & 0xff); out.write((p >> 8) & 0xff); out.write((p >> 16) & 0xff)
    }
    val rows = if (bottomUp) (h - 1) to 0 by -1 else 0 until h
    rows.foreach { y =>
      if (!rle) (0 until w).foreach(x => putPixel(x, y))
      else {
        // per-row RLE: split into runs of equal pixels (capped at 128),
        // emit run packets for length >= 2, raw packets otherwise
        var x = 0
        while (x < w) {
          val p0 = formulaPixel(docId, x, y)
          var run = 1
          while (x + run < w && run < 128 && formulaPixel(docId, x + run, y) == p0) run += 1
          if (run >= 2) {
            out.write(0x80 | (run - 1)); putPixel(x, y)
            x += run
          } else {
            // raw packet: extend until the next 2+ run or 128 pixels
            var len = 1
            while (x + len < w && len < 128 &&
              !(x + len + 1 < w &&
                formulaPixel(docId, x + len, y) == formulaPixel(docId, x + len + 1, y)))
              len += 1
            out.write(len - 1)
            (0 until len).foreach(i => putPixel(x + i, y))
            x += len
          }
        }
      }
    }
    out.write(new Array[Byte](8)) // footer: extension + developer offsets
    out.write(TgaFooterSig)
    out.toByteArray
  }

  /** (doc_id, blob) table of [[syntheticTga]] images. */
  def syntheticTgaBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticTga)

  /** REAL TGA decode — `javax.imageio` ships no TGA reader, so this is a
    * hand-written parser for the two truecolor encodings (type 2
    * uncompressed, type 10 run-length), 24/32-bit, both row origins.
    * Sniffing: TGA has NO magic number, so only files carrying the TGA
    * 2.0 footer signature are accepted (guaranteed by [[syntheticTga]];
    * legacy footer-less files are indistinguishable from noise and fall
    * through to the caller's next decoder). Feature math is the shared
    * [[featuresFromArgb]] fold — identical floats for identical pixels
    * across every decoder. */
  def decodeTga(docId: Long, bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 18 + 26) return None
    val sig = java.util.Arrays.copyOfRange(bytes, bytes.length - 18, bytes.length)
    if (!java.util.Arrays.equals(sig, TgaFooterSig)) return None
    try {
      val idLen = bytes(0) & 0xff
      val imageType = bytes(2) & 0xff
      if ((bytes(1) & 0xff) != 0) return None // color-mapped: not truecolor
      if (imageType != 2 && imageType != 10) return None
      val w = (bytes(12) & 0xff) | ((bytes(13) & 0xff) << 8)
      val h = (bytes(14) & 0xff) | ((bytes(15) & 0xff) << 8)
      val bpp = bytes(16) & 0xff
      if (w <= 0 || h <= 0 || (bpp != 24 && bpp != 32)) return None
      // pixel-budget cap (matches decodeQoi/decodePcx): forged 16-bit dims
      // can overflow w*h to a negative Int (NegativeArraySizeException is
      // not in the catch list) or demand a multi-GB allocation
      if (w.toLong * h > (1L << 26)) return None
      val topDown = (bytes(17) & 0x20) != 0
      val bytesPerPx = bpp / 8
      var pos = 18 + idLen
      val px = new Array[Int](w * h)
      def rowIndex(fileRow: Int): Int = if (topDown) fileRow else h - 1 - fileRow
      def readPixel(): Int = {
        val b = bytes(pos) & 0xff
        val g = bytes(pos + 1) & 0xff
        val r = bytes(pos + 2) & 0xff
        pos += bytesPerPx // alpha byte (if any) ignored
        (r << 16) | (g << 8) | b
      }
      if (imageType == 2) {
        var fr = 0
        while (fr < h) {
          val base = rowIndex(fr) * w
          var x = 0
          while (x < w) { px(base + x) = readPixel(); x += 1 }
          fr += 1
        }
      } else {
        // RLE packets run row-major over the stored order; packets do
        // not cross the image boundary (crossing rows is legal)
        var i = 0
        val n = w * h
        while (i < n) {
          val head = bytes(pos) & 0xff; pos += 1
          val count = (head & 0x7f) + 1
          if ((head & 0x80) != 0) {
            val p = readPixel()
            var c = 0
            while (c < count) {
              val fr = (i + c) / w; val x = (i + c) % w
              px(rowIndex(fr) * w + x) = p
              c += 1
            }
          } else {
            var c = 0
            while (c < count) {
              val fr = (i + c) / w; val x = (i + c) % w
              px(rowIndex(fr) * w + x) = readPixel()
              c += 1
            }
          }
          i += count
        }
      }
      Some(featuresFromArgb(docId, bytes.length, px, w, h))
    } catch { case _: ArrayIndexOutOfBoundsException => None } // truncated
  }

  /** Deterministic synthetic QOI ["Quite OK Image" format v1.0,
    * qoiformat.org — public-domain spec]: w = 16 + docId mod 21,
    * h = 16 + 9·docId mod 13, 3-channel. Pixels are the shared formula
    * EXCEPT run rows ((docId + y) mod 5 = 0), which alternate pair
    * blocks of two greys — C1 = (d,d,d), C2 = (d+1 mod 256, d, d) with
    * d = docId mod 256, pixel = C1 iff (x div 2) even. The formula's
    * fixed per-x gradient (Δr,Δg,Δb = 7,11,5 → always a LUMA delta)
    * would never emit QOI_OP_RUN, and re-seen colors get evicted from
    * the 64-slot index by the ~20 fresh colors per row before they
    * recur — the C1 C1 C2 C2 blocks force BOTH: every pair is a RUN,
    * and every return to the other grey is an INDEX hit (a ±1 change
    * in r moves the color hash by exactly 3 mod 64, so C1 and C2
    * occupy different slots and can't evict each other). The encoder
    * is the spec's greedy chunk selection: run → index → diff → luma →
    * rgb, wrapping deltas mod 256. */
  def syntheticQoi(docId: Long): Array[Byte] = {
    val w = 16 + java.lang.Math.floorMod(docId, 21L).toInt
    val h = 16 + java.lang.Math.floorMod(docId * 9, 13L).toInt
    val d = java.lang.Math.floorMod(docId, 256L).toInt
    val out = new java.io.ByteArrayOutputStream()
    out.write('q'); out.write('o'); out.write('i'); out.write('f')
    def be32(v: Int): Unit = {
      out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
      out.write((v >>> 8) & 0xff); out.write(v & 0xff)
    }
    be32(w); be32(h)
    out.write(3) // channels: RGB
    out.write(0) // colorspace: sRGB with linear alpha
    val index = new Array[Int](64) // packed 0xAARRGGBB, zero-initialized
    var prev = 0xff000000 // r=g=b=0, a=255
    var run = 0
    var y = 0
    while (y < h) {
      val runRow = java.lang.Math.floorMod(docId + y, 5L) == 0L
      var x = 0
      while (x < w) {
        val rgb =
          if (runRow) {
            val r = if ((x / 2) % 2 == 0) d else (d + 1) % 256
            (r << 16) | (d << 8) | d
          } else formulaPixel(docId, x, y)
        val px = 0xff000000 | rgb
        if (px == prev) {
          run += 1
          if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
        } else {
          if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
          val r = (px >> 16) & 0xff; val g = (px >> 8) & 0xff; val b = px & 0xff
          val idx = (r * 3 + g * 5 + b * 7 + 255 * 11) % 64
          if (index(idx) == px) out.write(idx)
          else {
            index(idx) = px
            // wraparound deltas, interpreted as signed bytes
            val dr = ((r - ((prev >> 16) & 0xff)) << 24) >> 24
            val dg = ((g - ((prev >> 8) & 0xff)) << 24) >> 24
            val db = ((b - (prev & 0xff)) << 24) >> 24
            if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1)
              out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            else if (dg >= -32 && dg <= 31 &&
              dr - dg >= -8 && dr - dg <= 7 && db - dg >= -8 && db - dg <= 7) {
              out.write(0x80 | (dg + 32))
              out.write(((dr - dg + 8) << 4) | (db - dg + 8))
            } else {
              out.write(0xfe); out.write(r); out.write(g); out.write(b)
            }
          }
          prev = px
        }
        x += 1
      }
      y += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    (0 until 7).foreach(_ => out.write(0)) // end marker
    out.write(1)
    out.toByteArray
  }

  /** (doc_id, blob) table of [[syntheticQoi]] images. */
  def syntheticQoiBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticQoi)

  /** QOI decoder (full v1.0 spec: both channel counts, all six chunk
    * ops, the 64-slot running index updated after every decoded chunk,
    * run carry across rows). Sniffed by the "qoif" magic; None on
    * malformed/truncated input (falls through to the caller's next
    * decoder). Features are the shared [[featuresFromArgb]] fold. */
  def decodeQoi(docId: Long, bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 14 + 8) return None
    if (bytes(0) != 'q' || bytes(1) != 'o' || bytes(2) != 'i' || bytes(3) != 'f')
      return None
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    val w = be32(4); val h = be32(8)
    val channels = bytes(12) & 0xff
    if (w <= 0 || h <= 0 || (channels != 3 && channels != 4)) return None
    // header dims are attacker-controlled 32-bit values: cap the pixel
    // buffer (64 Mpx ≈ 256 MB) so a forged header can neither overflow
    // w*h nor force a multi-GB allocation before the walk fails
    if (w.toLong * h > (1L << 26)) return None
    try {
      val n = w * h
      val px = new Array[Int](n)
      val index = new Array[Int](64)
      var cur = 0xff000000
      var pos = 14
      var i = 0
      var run = 0
      while (i < n) {
        if (run > 0) run -= 1
        else {
          val b1 = bytes(pos) & 0xff; pos += 1
          if (b1 == 0xfe) { // QOI_OP_RGB
            cur = (cur & 0xff000000) | ((bytes(pos) & 0xff) << 16) |
              ((bytes(pos + 1) & 0xff) << 8) | (bytes(pos + 2) & 0xff)
            pos += 3
          } else if (b1 == 0xff) { // QOI_OP_RGBA
            cur = ((bytes(pos + 3) & 0xff) << 24) | ((bytes(pos) & 0xff) << 16) |
              ((bytes(pos + 1) & 0xff) << 8) | (bytes(pos + 2) & 0xff)
            pos += 4
          } else (b1 >> 6) match {
            case 0 => cur = index(b1) // QOI_OP_INDEX
            case 1 => // QOI_OP_DIFF: 2-bit deltas biased by 2, mod-256 wrap
              val r = (((cur >> 16) & 0xff) + ((b1 >> 4) & 3) - 2) & 0xff
              val g = (((cur >> 8) & 0xff) + ((b1 >> 2) & 3) - 2) & 0xff
              val b = ((cur & 0xff) + (b1 & 3) - 2) & 0xff
              cur = (cur & 0xff000000) | (r << 16) | (g << 8) | b
            case 2 => // QOI_OP_LUMA
              val b2 = bytes(pos) & 0xff; pos += 1
              val dg = (b1 & 0x3f) - 32
              val r = (((cur >> 16) & 0xff) + dg + ((b2 >> 4) & 0xf) - 8) & 0xff
              val g = (((cur >> 8) & 0xff) + dg) & 0xff
              val b = ((cur & 0xff) + dg + (b2 & 0xf) - 8) & 0xff
              cur = (cur & 0xff000000) | (r << 16) | (g << 8) | b
            case _ => run = (b1 & 0x3f) // QOI_OP_RUN, bias -1 → run-1 more pixels
          }
          index((((cur >> 16) & 0xff) * 3 + ((cur >> 8) & 0xff) * 5 +
            (cur & 0xff) * 7 + ((cur >>> 24) & 0xff) * 11) % 64) = cur
        }
        px(i) = cur & 0xffffff
        i += 1
      }
      Some(featuresFromArgb(docId, bytes.length, px, w, h))
    } catch { case _: ArrayIndexOutOfBoundsException => None } // truncated
  }

  /** One decoded ICO directory entry: per-icon dims + the opaque-pixel
    * feature fold (the AND mask excludes transparent pixels, so the
    * denominators are `n_opaque`, not w·h). */
  case class IconFeatures(
      doc_id: Long,
      entry_idx: Int,
      width: Int,
      height: Int,
      n_opaque: Long,
      features: Array[Float])

  /** Deterministic synthetic ICO — a MULTI-image container (2 icon
    * entries per file), each a 32-bpp BITMAPINFOHEADER icon: the header
    * declares DOUBLE height (XOR color bitmap + 1-bit AND mask stacked,
    * the ICO quirk), rows bottom-up, BGRA order, mask rows padded to
    * 32-bit boundaries MSB-first. Entry `e` draws the shared pixel
    * formula at id 2·docId+e; pixel (x,y) is TRANSPARENT (mask bit 1,
    * alpha 0) iff (docId + x + y + e) mod 7 = 0 — so the mask is
    * load-bearing: a decoder that skips it computes different features.
    *   e=0: w = 8 + docId mod 9,    h = 8 + 3·docId mod 7
    *   e=1: w = 8 + 5·docId mod 11, h = 8 + 7·docId mod 5 */
  def syntheticIco(docId: Long): Array[Byte] = {
    val dims = icoDims(docId)
    def maskRowBytes(w: Int) = ((w + 31) / 32) * 4
    val sizes = dims.map { case (w, h) => 40 + h * w * 4 + h * maskRowBytes(w) }
    val total = 6 + 16 * dims.length + sizes.sum
    val buf = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putShort(0).putShort(1).putShort(dims.length.toShort) // ICONDIR, type 1 = icon
    var off = 6 + 16 * dims.length
    dims.zip(sizes).foreach { case ((w, h), sz) =>
      buf.put(w.toByte).put(h.toByte)       // bWidth/bHeight (0 would mean 256)
        .put(0.toByte).put(0.toByte)        // colorCount, reserved
        .putShort(1).putShort(32)           // planes, bitcount
        .putInt(sz).putInt(off)             // bytes in resource, file offset
      off += sz
    }
    dims.zipWithIndex.foreach { case ((w, h), e) =>
      buf.putInt(40).putInt(w).putInt(2 * h) // biHeight = XOR + AND stacked
        .putShort(1).putShort(32)
        .putInt(0).putInt(0)                 // BI_RGB, size-image 0 (legal for BI_RGB)
        .putInt(0).putInt(0).putInt(0).putInt(0)
      val eid = 2 * docId + e
      var y = h - 1                          // bottom-up
      while (y >= 0) {
        var x = 0
        while (x < w) {
          val p = formulaPixel(eid, x, y)
          val opaque = java.lang.Math.floorMod(docId + x + y + e, 7L) != 0L
          buf.put((p & 0xff).toByte)         // B
            .put(((p >> 8) & 0xff).toByte)   // G
            .put(((p >> 16) & 0xff).toByte)  // R
            .put((if (opaque) 0xff else 0x00).toByte)
          x += 1
        }
        y -= 1
      }
      y = h - 1
      while (y >= 0) {
        val row = new Array[Byte](maskRowBytes(w))
        var x = 0
        while (x < w) {
          if (java.lang.Math.floorMod(docId + x + y + e, 7L) == 0L)
            row(x / 8) = (row(x / 8) | (0x80 >> (x % 8))).toByte
          x += 1
        }
        buf.put(row)
        y -= 1
      }
    }
    buf.array()
  }

  /** The two entry dims of [[syntheticIco]]. */
  private def icoDims(docId: Long): Seq[(Int, Int)] = Seq(
    (8 + java.lang.Math.floorMod(docId, 9L).toInt,
      8 + java.lang.Math.floorMod(docId * 3, 7L).toInt),
    (8 + java.lang.Math.floorMod(docId * 5, 11L).toInt,
      8 + java.lang.Math.floorMod(docId * 7, 5L).toInt))

  /** (doc_id, blob) table of [[syntheticIco]] containers. */
  def syntheticIcoBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticIco)

  /** REAL ICO parse (no JVM reader exists for .ico): ICONDIR walk, then
    * per entry a 32-bpp BITMAPINFOHEADER icon — double-height header
    * un-stacked into the XOR bitmap and the 1-bit AND mask (rows padded
    * to 32 bits, MSB-first, bottom-up like the color rows). Features
    * are the [[featuresFromArgb]] arithmetic restricted to OPAQUE
    * pixels — mask bit 0 when any mask bit is set anywhere, else the
    * alpha channel (real-world icons often carry an all-zero AND mask
    * with alpha-only transparency): exact-integer sums, denominators `n_opaque`,
    * quadrant index unchanged — the fully-specified fold any engine
    * replays from known pixel content. Returns one record per entry;
    * None for unrecognized/truncated bytes (caller decides the stub). */
  def decodeIco(docId: Long, bytes: Array[Byte]): Option[Seq[IconFeatures]] = {
    if (bytes == null || bytes.length < 6) return None
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def i32(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    if (u16(0) != 0 || u16(2) != 1) return None // reserved, type = icon
    val count = u16(4)
    if (count <= 0 || bytes.length < 6 + 16 * count) return None
    try {
      Some((0 until count).map { e =>
        val off = i32(6 + 16 * e + 12)
        if (i32(off) != 40) throw new IllegalArgumentException("not BITMAPINFOHEADER")
        val w = i32(off + 4)
        val h2 = i32(off + 8)
        val bpp = u16(off + 14)
        if (i32(off + 16) != 0 || bpp != 32 || w <= 0 || h2 <= 0 || (h2 & 1) != 0)
          throw new IllegalArgumentException("unsupported icon encoding")
        val h = h2 / 2
        // pixel-budget cap (matches decodeQoi/decodePcx/decodeTga): w and
        // h2 are attacker-controlled 32-bit fields — w*h can overflow to a
        // negative Int (NegativeArraySizeException is uncaught) or demand
        // an arbitrary allocation before any bounds check fails
        if (w.toLong * h > (1L << 26))
          throw new IllegalArgumentException("icon dims exceed pixel budget")
        val px = new Array[Int](w * h)
        val alpha = new Array[Boolean](w * h)
        var pos = off + 40
        var y = h - 1
        while (y >= 0) {
          var x = 0
          while (x < w) {
            val b = bytes(pos) & 0xff
            val g = bytes(pos + 1) & 0xff
            val r = bytes(pos + 2) & 0xff
            alpha(y * w + x) = (bytes(pos + 3) & 0xff) != 0
            px(y * w + x) = (r << 16) | (g << 8) | b
            pos += 4
            x += 1
          }
          y -= 1
        }
        val maskRowBytes = ((w + 31) / 32) * 4
        // the AND mask drives opacity (mask bit set → transparent); real
        // 32bpp icons routinely ship an ALL-ZERO mask with alpha-only
        // transparency, so when no mask bit is set anywhere the alpha
        // channel decides instead — the complement is NOT asserted (alpha
        // is advisory when a non-trivial mask is present)
        val mask = new Array[Boolean](w * h)
        var anyMaskBit = false
        y = h - 1
        while (y >= 0) {
          var x = 0
          while (x < w) {
            val bit = (bytes(pos + x / 8) & (0x80 >> (x % 8))) != 0
            mask(y * w + x) = bit
            anyMaskBit ||= bit
            x += 1
          }
          pos += maskRowBytes
          y -= 1
        }
        var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L; var nOp = 0L
        val quad = new Array[Long](4)
        y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val opaque =
              if (anyMaskBit) !mask(y * w + x) else alpha(y * w + x)
            if (opaque) {
              val p = px(y * w + x)
              val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
              sr += r; sg += g; sb += b
              sl += (299 * r + 587 * g + 114 * b) / 1000
              quad((y * 2 / h) * 2 + x * 2 / w) += r + g + b
              nOp += 1L
            }
            x += 1
          }
          y += 1
        }
        val feats = new Array[Float](FeatureDim)
        val d = math.max(nOp, 1L).toDouble
        feats(0) = (sr.toDouble / 255.0 / d).toFloat
        feats(1) = (sg.toDouble / 255.0 / d).toFloat
        feats(2) = (sb.toDouble / 255.0 / d).toFloat
        var qi = 0
        while (qi < 4) {
          feats(3 + qi) = (quad(qi).toDouble / 765.0 / d).toFloat
          qi += 1
        }
        feats(7) = (sl.toDouble / 255.0 / d).toFloat
        IconFeatures(docId, e, w, h, nOp, feats)
      })
    } catch {
      case _: IllegalArgumentException => None
      case _: ArrayIndexOutOfBoundsException => None // truncated
    }
  }

  /** Batched partition-local ICO decode over (id, blob) rows — one
    * output row per icon entry (a container yields its whole directory;
    * undecodable blobs yield nothing, the caller screens with an
    * anti-join if it needs the reject list). */
  def decodeIcoFeatures(spark: SparkSession, blobs: DataFrame): Dataset[IconFeatures] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeIco(id, bytes).getOrElse(Nil)
      })
  }

  /** documents.text reinterpreted as a blob column — the stand-in media
    * table for this container (no real image data ships with the tests). */
  def documentBlobs(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("text").cast("binary").as("blob"))

  /** One decoded audio record: RIFF/WAV header metadata + sample-stat
    * feature vector. `n_frames` counts per-channel sample frames. */
  case class AudioFeatures(
      doc_id: Long,
      n_bytes: Long,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_frames: Long,
      features: Array[Float])

  /** REAL audio decode: a pure-JVM RIFF/WAV parser (container walk +
    * PCM sample decode — public spec, no codec library). None unless the
    * bytes are a well-formed RIFF/WAVE with a supported `fmt ` chunk and
    * a `data` chunk; unknown chunks (LIST, fact, …) are skipped by the
    * standard word-aligned chunk walk. Supported formats: integer PCM
    * (format 1; 8-, 16-, or 24-bit), ITU-T G.711 A-law / μ-law
    * (formats 6/7; 8-bit stored, expanded to 13/14-bit-magnitude
    * integers by the standard arithmetic, full scale 32768), mono IMA
    * ADPCM (format 0x11; 4-bit nibbles decoded by [[decodeImaAdpcm]])
    * and mono MS ADPCM (format 2; [[decodeMsAdpcm]]) — both full scale
    * 32768 — and WAVE_FORMAT_EXTENSIBLE (0xFFFE) headers whose
    * SubFormat GUID names one of those codecs.
    *
    * The 8 features are exact-integer sample sums followed by IEEE double
    * divisions and one float32 rounding — fully specified, so the DuckDB
    * oracle replays them from [[syntheticWav]]'s generator formula
    * without parsing WAV (PCM is raw: decoded samples ARE the formula).
    * With v = the signed sample value, F = full scale (32768 at 16-bit
    * and for G.711-expanded samples, 8388608 at 24-bit, 128 at 8-bit
    * where stored bytes are unsigned, v = byte - 128), n = total
    * samples across channels, flat index i in data order:
    *  - f0: mean            = sum(v) / F / n
    *  - f1: mean magnitude  = sum(|v|) / F / n
    *  - f2: peak            = max(|v|) / F
    *  - f3: zero-crossing rate on channel 0: count of sign(v_f) !=
    *        sign(v_{f-1}) over frames (negative vs non-negative) / frames
    *  - f4: energy          = sum(v*v) / F / F / n
    *  - f5/f6/f7: mean magnitude per time third, t = i*3 div n
    */
  def decodeWav(docId: Long, bytes: Array[Byte]): Option[AudioFeatures] = {
    if (bytes == null || bytes.length < 44) return None
    def u16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def tag(o: Int): String =
      new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var fmtOk = false
    var channels = 0; var sr = 0; var bits = 0; var fmtCode = 0
    var blockAlign = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length) {
      val id = tag(off)
      val size = u32(off + 4)
      // a spec-conformant fmt chunk is ≥ 16 bytes; a smaller declared
      // size would make the reads below spill into the NEXT chunk's
      // bytes (garbage header fields that might still pass fmtOk) —
      // reject the chunk instead of parsing past its bound
      if (id == "fmt " && size >= 16 && off + 24 <= bytes.length) {
        var audioFormat = u16(off + 8)
        channels = u16(off + 10)
        sr = u32(off + 12).toInt
        blockAlign = u16(off + 20)
        bits = u16(off + 22)
        // WAVE_FORMAT_EXTENSIBLE: the real codec is the first two bytes
        // of the 16-byte SubFormat GUID at fmt offset 24 (fmt size ≥ 40)
        if (audioFormat == 0xFFFE && size >= 40 && off + 8 + 26 <= bytes.length)
          audioFormat = u16(off + 8 + 24)
        fmtCode = audioFormat
        fmtOk = (audioFormat match {
          case 1 => bits == 8 || bits == 16 || bits == 24 // integer PCM
          case 6 | 7 => bits == 8 // G.711 A-law / μ-law
          // IMA ADPCM: 4-bit nibbles in self-contained blocks; mono
          // (flat nibble stream) or stereo (4-byte words per channel)
          case 0x11 => bits == 4 && channels >= 1 && channels <= 2 &&
            blockAlign > 4 * channels
          // MS ADPCM: mono only (stereo interleaves per-nibble, a
          // different layout — not needed here)
          case 2    => bits == 4 && channels == 1 && blockAlign > 7
          case _ => false
        }) && channels >= 1 && sr > 0
      } else if (id == "data" && dataOff < 0) {
        dataOff = off + 8
        dataLen = math.min(size, (bytes.length - dataOff).toLong).toInt
      }
      // a declared size past the end of the blob (truncated file or an
      // adversarial 0xFFFFFFxx that would step 0 or negative after
      // .toInt) means no further chunk can follow — stop the walk
      // instead of spinning or indexing negatively
      if (size > bytes.length - off - 8) off = bytes.length
      else off += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (!fmtOk || dataOff < 0) return None
    // ADPCM is block-sequential (each sample's value depends on the
    // running predictor/delta state), so it decodes eagerly to an array;
    // every other supported format stays on the O(1) lazy accessor
    val adpcm: Array[Int] =
      if (fmtCode == 0x11) decodeImaAdpcm(bytes, dataOff, dataLen, blockAlign, channels)
      else if (fmtCode == 2) decodeMsAdpcm(bytes, dataOff, dataLen, blockAlign)
      else null
    val nFrames =
      if (adpcm != null) adpcm.length / channels
      else dataLen / (bits / 8) / channels
    val n = nFrames * channels // ignore a trailing partial frame
    if (nFrames == 0) return None
    def sample(i: Int): Int = if (adpcm != null) adpcm(i) else fmtCode match {
      case 1 if bits == 16 =>
        ((bytes(dataOff + 2 * i) & 0xff) |
          (bytes(dataOff + 2 * i + 1) << 8)).toShort.toInt
      case 1 if bits == 24 =>
        // signed little-endian 3-byte: sign-extend via the int shift
        ((bytes(dataOff + 3 * i) & 0xff) |
          ((bytes(dataOff + 3 * i + 1) & 0xff) << 8) |
          (bytes(dataOff + 3 * i + 2) << 16))
      case 1 => (bytes(dataOff + i) & 0xff) - 128
      case 7 => muLawExpand(bytes(dataOff + i))
      case _ => aLawExpand(bytes(dataOff + i))
    }
    val fullScale =
      if (fmtCode != 1) 32768.0 // G.711 expands onto the 16-bit scale
      else if (bits == 24) 8388608.0
      else if (bits == 16) 32768.0
      else 128.0
    // sum of squares needs 128 bits for 24-bit audio: v² ≤ 2^46, so a
    // Long overflows after ~2^17 samples (3 s at 44.1 kHz). Unsigned
    // lo/hi carry keeps every format exact on one code path.
    var sumV = 0L; var sumAbs = 0L; var maxAbs = 0L
    var sqLo = 0L; var sqHi = 0L
    val thirdAbs = new Array[Long](3)
    val thirdCnt = new Array[Long](3)
    var i = 0
    while (i < n) {
      val v = sample(i)
      val a = math.abs(v).toLong
      sumV += v; sumAbs += a
      val sq = v.toLong * v
      val nl = sqLo + sq
      if (java.lang.Long.compareUnsigned(nl, sqLo) < 0) sqHi += 1
      sqLo = nl
      if (a > maxAbs) maxAbs = a
      val t = (i.toLong * 3 / n).toInt
      thirdAbs(t) += a; thirdCnt(t) += 1
      i += 1
    }
    // exact-integer u128 → double (the value then only feeds a float32)
    val sumSqD = sqHi.toDouble * 1.8446744073709552e19 +
      (if (sqLo >= 0) sqLo.toDouble
       else (sqLo >>> 1).toDouble * 2.0 + (sqLo & 1L))
    var crossings = 0L
    var f = 1
    while (f < nFrames) {
      if ((sample(f * channels) < 0) != (sample((f - 1) * channels) < 0))
        crossings += 1
      f += 1
    }
    val feats = new Array[Float](FeatureDim)
    feats(0) = (sumV.toDouble / fullScale / n.toDouble).toFloat
    feats(1) = (sumAbs.toDouble / fullScale / n.toDouble).toFloat
    feats(2) = (maxAbs.toDouble / fullScale).toFloat
    feats(3) = (crossings.toDouble / nFrames.toDouble).toFloat
    feats(4) = (sumSqD / fullScale / fullScale / n.toDouble).toFloat
    var t = 0
    while (t < 3) {
      feats(5 + t) =
        if (thirdCnt(t) == 0) 0f
        else (thirdAbs(t).toDouble / fullScale / thirdCnt(t).toDouble).toFloat
      t += 1
    }
    Some(AudioFeatures(docId, bytes.length.toLong, sr, channels, bits,
      nFrames.toLong, feats))
  }

  /** ITU-T G.711 μ-law expansion (integer arithmetic from the spec, not
    * a table): code byte → linear sample in [-32124, 32124]. With
    * u = ~b, exponent e = bits 4-6 of u, mantissa m = bits 0-3:
    * magnitude = ((m·8 + 132) << e) − 132, negative when bit 7 of u is
    * set. Pure integer — the DuckDB oracle replays it verbatim. */
  def muLawExpand(b: Byte): Int = {
    val u = ~b & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** ITU-T G.711 A-law expansion: code byte → linear sample in
    * [-32256, 32256]. With a = b XOR 0x55, exponent e = bits 4-6,
    * mantissa m = bits 0-3: magnitude = m·16 + 8 when e = 0, else
    * (m·16 + 264) << (e−1); POSITIVE when bit 7 of a is set (A-law's
    * sign convention is inverted relative to μ-law). */
  def aLawExpand(b: Byte): Int = {
    val a = (b ^ 0x55) & 0xff
    val e = (a >> 4) & 7
    val t = (a & 0x0f) << 4
    val mag = if (e == 0) t + 8 else (t + 0x108) << (e - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** IMA ADPCM step-size table (89 entries) and step-index adjustment
    * table — the published IMA/DVI reference values (also in RFC 3551's
    * DVI4 description). Both are part of the format, not tuning. */
  private val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndexTable: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** IMA ADPCM payload → linear 16-bit samples, interleaved by channel.
    * Each `blockAlign` bytes is a self-contained block: one 4-byte
    * header PER CHANNEL (int16 initial predictor, uint8 step index,
    * reserved byte) emitting that channel's first sample, then the data
    * bytes. Mono data is a flat nibble stream (low nibble of each byte
    * first); stereo data alternates 4-byte words per channel (4 bytes
    * left = 8 left samples, 4 bytes right, …— the layout in the IMA/DVI
    * WAVE registration and every mainstream decoder). Per nibble d with
    * step s: diff = s/8 + d₀·s/4 + d₁·s/2 + d₂·s (bit dᵢ of d),
    * subtracted when bit 3 is set; predictor clamps to int16 and the
    * step index moves by the adjustment table, clamped to [0, 88]. A
    * trailing partial block — and, for stereo, a trailing partial
    * 8-byte word group — is ignored (blocks are self-contained, so a
    * truncated tail decodes to nothing rather than garbage). */
  private[operators] def decodeImaAdpcm(
      bytes: Array[Byte], dataOff: Int, dataLen: Int, blockAlign: Int,
      channels: Int = 1): Array[Int] = {
    val nBlocks = dataLen / blockAlign
    // packed (pred << 32 | idx) return — a Tuple2 here would allocate
    // once per decoded nibble in the hot loop
    def step(pred0: Int, idx0: Int, d: Int): Long = {
      val s = ImaStepTable(idx0)
      var diff = s >> 3
      if ((d & 1) != 0) diff += s >> 2
      if ((d & 2) != 0) diff += s >> 1
      if ((d & 4) != 0) diff += s
      var pred = if ((d & 8) != 0) pred0 - diff else pred0 + diff
      if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
      var idx = idx0 + ImaIndexTable(d)
      if (idx < 0) idx = 0 else if (idx > 88) idx = 88
      (pred.toLong << 32) | idx.toLong
    }
    if (channels == 1) {
      val perBlock = 1 + (blockAlign - 4) * 2
      val out = new Array[Int](nBlocks * perBlock)
      var o = 0
      var b = 0
      while (b < nBlocks) {
        val base = dataOff + b * blockAlign
        var pred = ((bytes(base) & 0xff) | (bytes(base + 1) << 8)).toShort.toInt
        var idx = math.max(0, math.min(88, bytes(base + 2) & 0xff))
        out(o) = pred; o += 1
        val nNibbles = (blockAlign - 4) * 2
        var k = 0
        while (k < nNibbles) {
          val packed = bytes(base + 4 + (k >> 1)) & 0xff
          val d = if ((k & 1) == 0) packed & 0x0f else (packed >> 4) & 0x0f
          val r = step(pred, idx, d)
          pred = (r >> 32).toInt; idx = r.toInt
          out(o) = pred; o += 1
          k += 1
        }
        b += 1
      }
      out
    } else {
      val groups = (blockAlign - 4 * channels) / (4 * channels)
      val perChan = 1 + groups * 8
      val out = new Array[Int](nBlocks * perChan * channels)
      val pred = new Array[Int](channels)
      val idx = new Array[Int](channels)
      var b = 0
      while (b < nBlocks) {
        val base = dataOff + b * blockAlign
        val fo = b * perChan * channels // this block's first output frame
        var c = 0
        while (c < channels) {
          val h = base + 4 * c
          pred(c) = ((bytes(h) & 0xff) | (bytes(h + 1) << 8)).toShort.toInt
          idx(c) = math.max(0, math.min(88, bytes(h + 2) & 0xff))
          out(fo + c) = pred(c)
          c += 1
        }
        var g = 0
        while (g < groups) {
          c = 0
          while (c < channels) {
            val wb = base + 4 * channels + (g * channels + c) * 4
            var k = 0
            while (k < 8) {
              val packed = bytes(wb + (k >> 1)) & 0xff
              val d = if ((k & 1) == 0) packed & 0x0f else (packed >> 4) & 0x0f
              val r = step(pred(c), idx(c), d)
              pred(c) = (r >> 32).toInt; idx(c) = r.toInt
              // frame g*8 + k + 1 of channel c, interleaved
              out(fo + (g * 8 + k + 1) * channels + c) = pred(c)
              k += 1
            }
            c += 1
          }
          g += 1
        }
        b += 1
      }
      out
    }
  }

  /** MS ADPCM adaptation table (indexed by the unsigned nibble) and the
    * 7 fixed predictor coefficient pairs — format constants from the
    * published WAVE format spec. */
  private val MsAdaptTable: Array[Int] = Array(
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)
  private val MsCoeff1: Array[Int] = Array(256, 512, 0, 192, 240, 460, 392)
  private val MsCoeff2: Array[Int] = Array(0, -256, 0, 64, 0, -208, -232)

  /** Mono MS ADPCM (format 2) payload → linear 16-bit samples. Each
    * `blockAlign` bytes is self-contained: a 7-byte header (uint8
    * predictor index 0..6, int16 initial delta, int16 sample1, int16
    * sample2 — sample2 is the OLDER sample and plays first), then 4-bit
    * nibbles HIGH nibble first (the opposite packing of IMA). Per
    * signed nibble s (two's complement of the unsigned 4-bit value n):
    * predicted = ((sample1·coeff1 + sample2·coeff2) / 256) + s·delta
    * (TRUNCATING integer division toward zero, per the published
    * MSADPCM spec pseudocode — NOT an arithmetic shift; the two differ
    * on negative coefficient sums), clamped to int16; then
    * delta = clamp((AdaptTable[n]·delta) >> 8, 16, 32767) — shift vs
    * division is immaterial here because a negative intermediate
    * clamps to 16 under either convention — the upper
    * clamp keeps the state in the int16 range its header encoding
    * implies (see the inline note). A header predictor index past 6
    * invalidates the block (skipped, decodes to nothing); a trailing
    * partial block is ignored. */
  private[operators] def decodeMsAdpcm(
      bytes: Array[Byte], dataOff: Int, dataLen: Int, blockAlign: Int): Array[Int] = {
    val nBlocks = dataLen / blockAlign
    val perBlock = (blockAlign - 7) * 2 + 2
    val out = new Array[Int](nBlocks * perBlock)
    var o = 0
    var b = 0
    while (b < nBlocks) {
      val base = dataOff + b * blockAlign
      val predIdx = bytes(base) & 0xff
      if (predIdx <= 6) {
        val c1 = MsCoeff1(predIdx)
        val c2 = MsCoeff2(predIdx)
        var delta = ((bytes(base + 1) & 0xff) | (bytes(base + 2) << 8)).toShort.toInt
        var s1 = ((bytes(base + 3) & 0xff) | (bytes(base + 4) << 8)).toShort.toInt
        var s2 = ((bytes(base + 5) & 0xff) | (bytes(base + 6) << 8)).toShort.toInt
        out(o) = s2; out(o + 1) = s1; o += 2
        val nNibbles = (blockAlign - 7) * 2
        var k = 0
        while (k < nNibbles) {
          val packed = bytes(base + 7 + (k >> 1)) & 0xff
          val n = if ((k & 1) == 0) (packed >> 4) & 0x0f else packed & 0x0f
          val s = if (n >= 8) n - 16 else n
          var pred = (s1 * c1 + s2 * c2) / 256 + s * delta
          if (pred > 32767) pred = 32767 else if (pred < -32768) pred = -32768
          s2 = s1; s1 = pred
          // clamp the running delta to the int16 range its header
          // encoding implies: an adversarial nibble stream (repeated
          // high-adaptation codes) would otherwise grow it ~3× per
          // sample and silently wrap Int — decoded garbage. Real
          // encoder output never approaches the bound.
          delta = (MsAdaptTable(n) * delta) >> 8
          if (delta < 16) delta = 16 else if (delta > 32767) delta = 32767
          out(o) = pred; o += 1
          k += 1
        }
      }
      b += 1
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  /** Batched partition-local audio decode over (id, blob) rows: real WAV
    * parse where the bytes are RIFF/WAVE PCM, G.711, or IMA/MS ADPCM;
    * otherwise the deterministic [[decodeStub]] features with zeroed
    * audio metadata (same record shape — swap in a JNI codec for other
    * compressed formats and the pipeline is unchanged). */
  def decodeAudioFeatures(spark: SparkSession, blobs: DataFrame): Dataset[AudioFeatures] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // belt-and-braces: a parser bug on one adversarial blob must
          // degrade to the stub record, never kill the corpus job
          (try decodeWav(id, bytes) catch { case _: Exception => None })
            .getOrElse {
              val in = if (bytes == null) Array.emptyByteArray else bytes
              AudioFeatures(id, in.length.toLong, 0, 0, 0, 0L,
                decodeStub(id, in).features)
            }
        }
      }
  }

  /** Deterministic synthetic 16-bit PCM WAV: header fields and every
    * sample are a pure integer formula of `docId`, written canonically
    * (44-byte header, no extra chunks) — so a decoder-side oracle
    * recomputes everything WITHOUT parsing WAV:
    *   channels ch = 1 + docId mod 2
    *   sample_rate = 8000 + (docId mod 5) * 2000
    *   frames nf   = 256 + (3*docId) mod 200
    *   sample(frame f, channel c) = ((7919*docId + 31*f + 17*c) mod 2048) - 1024
    *   n_bytes     = 44 + nf*ch*2
    */
  def syntheticWav(docId: Long): Array[Byte] = {
    val ch = 1 + java.lang.Math.floorMod(docId, 2L).toInt
    val sr = 8000 + java.lang.Math.floorMod(docId, 5L).toInt * 2000
    val nf = 256 + java.lang.Math.floorMod(docId * 3, 200L).toInt
    val dataLen = nf * ch * 2
    val buf = wavHeader(fmt = 1, ch = ch, sr = sr, bits = 16, dataLen = dataLen)
    var f = 0
    while (f < nf) {
      var c = 0
      while (c < ch) {
        buf.putShort((java.lang.Math.floorMod(
          docId * 7919 + f * 31 + c * 17, 2048L) - 1024L).toShort)
        c += 1
      }
      f += 1
    }
    buf.array()
  }

  /** A little-endian buffer with the canonical 44-byte RIFF/WAVE header
    * (fmt chunk size 16) written, positioned at the start of `data`.
    * Block-based codecs (ADPCM) pass their block size explicitly —
    * ch·bits/8 is only the PCM frame stride. */
  private def wavHeader(fmt: Int, ch: Int, sr: Int, bits: Int,
      dataLen: Int, blockAlignOverride: Int = -1): java.nio.ByteBuffer = {
    val blockAlign = if (blockAlignOverride > 0) blockAlignOverride else ch * bits / 8
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    buf.put("RIFF".getBytes(ascii)).putInt(36 + dataLen).put("WAVE".getBytes(ascii))
    buf.put("fmt ".getBytes(ascii)).putInt(16)
      .putShort(fmt.toShort).putShort(ch.toShort).putInt(sr)
      .putInt(sr * blockAlign).putShort(blockAlign.toShort).putShort(bits.toShort)
    buf.put("data".getBytes(ascii)).putInt(dataLen)
    buf
  }

  /** (doc_id, blob) table of one generated clip per id.
    *
    * OPTIMIZATION r16 (guide §2.5 input skew / §8 "decide with small
    * rows, move big rows once"): the verify corpora are single-row-group
    * parquet files, so the id scan is ONE task and blob synthesis plus
    * every downstream narrow decode kernel ran single-threaded on a
    * 32-core box. Hash-repartitioning the 8-byte id column across the
    * session's default parallelism costs a trivial shuffle of bare ids
    * and parallelizes synthesis AND decode; the heavy blob bytes
    * themselves still never shuffle. Scale-adaptive by construction —
    * `defaultParallelism` = total executor cores, no local constant;
    * on a real many-file corpus the exchange is the same one a
    * skew-evening `repartition(n)` would be. */
  private def blobTable(spark: SparkSession, df: DataFrame,
      gen: Long => Array[Byte]): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .as[Long]
      .mapPartitions(it => it.map(id => (id, gen(id))))
      .toDF("doc_id", "blob")
  }

  /** [[syntheticWav]] clips for the given ids — the deterministic audio
    * corpus the audio queries decode. */
  def syntheticAudioBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticWav)

  /** A deterministic G.711 clip: mono 8 kHz, μ-law (format 7) for even
    * doc ids, A-law (format 6) for odd; nf = 256 + (3·docId) mod 200
    * frames; stored code byte(f) = (7919·docId + 31·f) mod 256. The
    * expansion formulas are pure integer arithmetic, so the oracle
    * regenerates the decoded samples from this formula in SQL. */
  def syntheticWavLaw(docId: Long): Array[Byte] = {
    val fmt = if (java.lang.Math.floorMod(docId, 2L) == 0L) 7 else 6
    val nf = 256 + java.lang.Math.floorMod(docId * 3, 200L).toInt
    val buf = wavHeader(fmt = fmt, ch = 1, sr = 8000, bits = 8, dataLen = nf)
    var f = 0
    while (f < nf) {
      buf.put(java.lang.Math.floorMod(docId * 7919 + f * 31, 256L).toByte)
      f += 1
    }
    buf.array()
  }

  def syntheticLawBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticWavLaw)

  /** A deterministic 24-bit PCM clip: mono 12 kHz,
    * nf = 256 + (3·docId) mod 200 frames,
    * sample(f) = ((7919·docId + 131·f) mod 2^23) − 2^22 — signed 3-byte
    * little-endian. Exercises the wide-sample decode and the 128-bit
    * sum-of-squares path with a formula the oracle replays. */
  def syntheticWav24(docId: Long): Array[Byte] = {
    val nf = 256 + java.lang.Math.floorMod(docId * 3, 200L).toInt
    val buf = wavHeader(fmt = 1, ch = 1, sr = 12000, bits = 24, dataLen = nf * 3)
    var f = 0
    while (f < nf) {
      val v = (java.lang.Math.floorMod(docId * 7919 + f * 131, 1L << 23) -
        (1L << 22)).toInt
      buf.put((v & 0xff).toByte).put(((v >> 8) & 0xff).toByte)
        .put(((v >> 16) & 0xff).toByte)
      f += 1
    }
    buf.array()
  }

  def synthetic24Blobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticWav24)

  /** A deterministic IMA ADPCM clip (format 0x11): mono,
    * sr = 8000 + (docId mod 4)·2000, ONE block of
    * ba = 100 + (docId mod 3)·32 bytes → n = 1 + (ba−4)·2 samples.
    * Block header: predictor p0 = (2731·docId mod 4096) − 2048, step
    * index i0 = 13·docId mod 89; nibble j = (7·docId + 13·j) mod 16
    * (low nibble of each byte first). The decode walk is pure integer
    * arithmetic over the published tables, so the oracle replays it as
    * a recursive SQL fold over the same nibble formula. */
  def syntheticWavAdpcm(docId: Long): Array[Byte] = {
    val ba = 100 + java.lang.Math.floorMod(docId, 3L).toInt * 32
    val sr = 8000 + java.lang.Math.floorMod(docId, 4L).toInt * 2000
    val buf = wavHeader(fmt = 0x11, ch = 1, sr = sr, bits = 4,
      dataLen = ba, blockAlignOverride = ba)
    val p0 = (java.lang.Math.floorMod(docId * 2731, 4096L) - 2048L).toInt
    buf.putShort(p0.toShort)
      .put(java.lang.Math.floorMod(docId * 13, 89L).toByte)
      .put(0.toByte)
    val nNib = (ba - 4) * 2 // ba is even, so nibbles pack in full bytes
    var k = 0
    while (k < nNib) {
      val lo = java.lang.Math.floorMod(docId * 7 + k * 13, 16L).toInt
      val hi = java.lang.Math.floorMod(docId * 7 + (k + 1) * 13, 16L).toInt
      buf.put((lo | (hi << 4)).toByte)
      k += 2
    }
    buf.array()
  }

  def syntheticAdpcmBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticWavAdpcm)

  /** A deterministic STEREO IMA ADPCM clip: one block of
    * ba = 8 + 8·(4 + docId mod 3) bytes (two 4-byte channel headers +
    * (ba−8)/8 word groups → perChan = 1 + (ba−8) samples per channel).
    * Channel c header: predictor = ((2731·docId + 911·c) mod 4096) −
    * 2048, step index = (13·docId + 7·c) mod 89; per-channel nibble
    * k = (7·docId + 3·c + 13·k) mod 16, packed low-first into that
    * channel's alternating 4-byte words. Pure-integer walk — the oracle
    * replays both channels as one recursive SQL fold keyed by (doc,
    * channel) and interleaves by global frame index. */
  def syntheticWavImaStereo(docId: Long): Array[Byte] = {
    val ba = 8 + 8 * (4 + java.lang.Math.floorMod(docId, 3L).toInt)
    val sr = 8000 + java.lang.Math.floorMod(docId, 4L).toInt * 2000
    val buf = wavHeader(fmt = 0x11, ch = 2, sr = sr, bits = 4,
      dataLen = ba, blockAlignOverride = ba)
    for (c <- 0 until 2) {
      buf.putShort((java.lang.Math.floorMod(docId * 2731 + c * 911, 4096L) - 2048L).toShort)
      buf.put(java.lang.Math.floorMod(docId * 13 + c * 7, 89L).toByte)
      buf.put(0.toByte)
    }
    val groups = (ba - 8) / 8
    for (g <- 0 until groups; c <- 0 until 2; w <- 0 until 4) {
      val k = g * 8 + 2 * w
      val lo = java.lang.Math.floorMod(docId * 7 + c * 3 + k * 13, 16L).toInt
      val hi = java.lang.Math.floorMod(docId * 7 + c * 3 + (k + 1) * 13, 16L).toInt
      buf.put((lo | (hi << 4)).toByte)
    }
    buf.array()
  }

  def syntheticImaStereoBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticWavImaStereo)

  /** A deterministic MS ADPCM clip (format 2): mono,
    * sr = 8000 + (docId mod 3)·4000, ONE block of
    * ba = 96 + (docId mod 4)·24 bytes → n = 2 + (ba−7)·2 samples.
    * Header: predictor index docId mod 7, delta₀ = 16 + (7·docId mod
    * 500), sample1 = (2731·docId mod 4096) − 2048, sample2 =
    * (1013·docId mod 4096) − 2048; nibble j = (11·docId + 5·j) mod 16,
    * HIGH nibble of each byte first. Pure-integer state walk — the
    * oracle replays it as a recursive SQL fold like the IMA one. */
  def syntheticWavMsAdpcm(docId: Long): Array[Byte] = {
    val ba = 96 + java.lang.Math.floorMod(docId, 4L).toInt * 24
    val sr = 8000 + java.lang.Math.floorMod(docId, 3L).toInt * 4000
    val buf = wavHeader(fmt = 2, ch = 1, sr = sr, bits = 4,
      dataLen = ba, blockAlignOverride = ba)
    buf.put(java.lang.Math.floorMod(docId, 7L).toByte)
    buf.putShort((16 + java.lang.Math.floorMod(docId * 7, 500L)).toShort)
    buf.putShort((java.lang.Math.floorMod(docId * 2731, 4096L) - 2048L).toShort)
    buf.putShort((java.lang.Math.floorMod(docId * 1013, 4096L) - 2048L).toShort)
    val nNib = (ba - 7) * 2
    var k = 0
    while (k < nNib) {
      val hi = java.lang.Math.floorMod(docId * 11 + k * 5, 16L).toInt
      val lo = java.lang.Math.floorMod(docId * 11 + (k + 1) * 5, 16L).toInt
      buf.put(((hi << 4) | lo).toByte)
      k += 2
    }
    buf.array()
  }

  def syntheticMsAdpcmBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticWavMsAdpcm)

  /** Deterministic synthetic PCX (ZSoft PC Paintbrush, the RLE-planar
    * format half the legacy clipart web still carries): 24-bit RGB as
    * three 8-bit planes per row, each plane RLE-coded (0xC0|len runs,
    * literals < 0xC0, 0xC0..0xFF literals forced into run-of-1 packets),
    * bytesPerLine padded even per spec. Dims w = 16 + docId mod 21,
    * h = 16 + (7·docId) mod 13; pixels are [[formulaPixel]], so the
    * oracle replays the decoded image without parsing PCX. */
  def syntheticPcx(docId: Long): Array[Byte] = {
    val w = 16 + java.lang.Math.floorMod(docId, 21L).toInt
    val h = 16 + java.lang.Math.floorMod(docId * 7, 13L).toInt
    val bpl = w + (w & 1)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0x0A); out.write(5); out.write(1); out.write(8) // mfr/ver/rle/bpp
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write(v >> 8) }
    le16(0); le16(0); le16(w - 1); le16(h - 1) // xmin ymin xmax ymax
    le16(72); le16(72)                         // dpi
    out.write(new Array[Byte](48))             // EGA palette
    out.write(0); out.write(3)                 // reserved, 3 planes
    le16(bpl); le16(1)                         // bytesPerLine, palette info
    out.write(new Array[Byte](128 - 70))       // filler to 128
    val row = new Array[Int](bpl)
    def writeRlePlane(): Unit = {
      var x = 0
      while (x < bpl) {
        val v = row(x)
        var run = 1
        while (x + run < bpl && run < 63 && row(x + run) == v) run += 1
        if (run > 1 || v >= 0xC0) { out.write(0xC0 | run); out.write(v) }
        else out.write(v)
        x += run
      }
    }
    var y = 0
    while (y < h) {
      var plane = 0
      while (plane < 3) {
        var x = 0
        while (x < bpl) {
          val p = if (x < w) formulaPixel(docId, x, y) else 0
          row(x) = (p >> (16 - 8 * plane)) & 0xff // planes are R, G, B
          x += 1
        }
        writeRlePlane()
        plane += 1
      }
      y += 1
    }
    out.toByteArray
  }

  /** (doc_id, blob) table of [[syntheticPcx]] images. */
  def syntheticPcxBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticPcx)

  /** REAL PCX decode (javax.imageio ships no PCX reader): version-5
    * 8-bit 3-plane RLE truecolor — the dominant surviving variant.
    * Sniffing: manufacturer 0x0A + encoding 1 + bpp 8 + 3 planes (PCX
    * has no magic string; anything else falls through to the caller's
    * next decoder). Runs may legally spill across plane boundaries
    * within a row buffer, which the streaming decode handles; feature
    * math is the shared [[featuresFromArgb]] fold. */
  def decodePcx(docId: Long, bytes: Array[Byte]): Option[MediaFeatures] = {
    if (bytes == null || bytes.length < 129) return None
    if ((bytes(0) & 0xff) != 0x0A || (bytes(2) & 0xff) != 1 ||
      (bytes(3) & 0xff) != 8 || (bytes(65) & 0xff) != 3) return None
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    try {
      val w = le16(8) - le16(4) + 1
      val h = le16(10) - le16(6) + 1
      val bpl = le16(66)
      // w*h is bounded BEFORE the allocation: 65536×65536 would overflow
      // Int and throw NegativeArraySize past the AIOOBE handler below
      if (w <= 0 || h <= 0 || bpl < w || w.toLong * h > (1L << 26)) return None
      val px = new Array[Int](w * h)
      var pos = 128
      val rowBuf = new Array[Int](3 * bpl)
      var y = 0
      while (y < h) {
        var filled = 0
        while (filled < rowBuf.length) {
          if (pos >= bytes.length) return None
          val b = bytes(pos) & 0xff; pos += 1
          if (b >= 0xC0) {
            if (pos >= bytes.length) return None
            val v = bytes(pos) & 0xff; pos += 1
            var k = b & 0x3F
            while (k > 0 && filled < rowBuf.length) {
              rowBuf(filled) = v; filled += 1; k -= 1
            }
          } else { rowBuf(filled) = b; filled += 1 }
        }
        var x = 0
        while (x < w) {
          px(y * w + x) = 0xFF000000 |
            (rowBuf(x) << 16) | (rowBuf(bpl + x) << 8) | rowBuf(2 * bpl + x)
          x += 1
        }
        y += 1
      }
      Some(featuresFromArgb(docId, bytes.length.toLong, px, w, h))
    } catch { case _: ArrayIndexOutOfBoundsException => None }
  }

  /** One PCM sample of the deterministic FLAC test corpus. Three signal
    * families by `doc_id % 4` — constant (CONSTANT subframes), linear
    * ramp (FIXED order-2 zero residuals), pseudo-noise (dense Rice /
    * VERBATIM) — so the encoder's whole subframe menu is exercised at
    * corpus scale; every branch is %-arithmetic on non-negatives, so
    * the oracle replays it verbatim in SQL. */
  private[operators] def flacSample(docId: Long, f: Int, c: Int): Int = {
    val kind = java.lang.Math.floorMod(docId, 4L).toInt
    kind match {
      case 0 => (java.lang.Math.floorMod(docId * 7919 + c * 17, 4096L) - 2048L).toInt
      case 1 => (-1024L + java.lang.Math.floorMod(docId + c * 17, 777L) + 3L * f).toInt
      case _ => (java.lang.Math.floorMod(docId * 7919 + f * 31L + c * 17, 4096L) - 2048L).toInt
    }
  }

  /** A deterministic FLAC clip per id: ch = 1 + id%2, sr = 8000 +
    * (id%5)·2000, nf = 256 + (3·id)%200 frames of [[flacSample]],
    * encoded at blocksize 192 (≥2 frames per clip plus a short last
    * frame). */
  def syntheticFlac(docId: Long): Array[Byte] = {
    val ch = 1 + java.lang.Math.floorMod(docId, 2L).toInt
    val sr = 8000 + java.lang.Math.floorMod(docId, 5L).toInt * 2000
    val nf = 256 + java.lang.Math.floorMod(docId * 3, 200L).toInt
    val chans = Array.tabulate(ch)(c => Array.tabulate(nf)(f => flacSample(docId, f, c)))
    Flac.encode(chans, sr, bitsPerSample = 16, blockSize = 192)
  }

  /** [[syntheticFlac]] clips for the given ids. */
  def syntheticFlacBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticFlac)

  /** Integer decode surface of a FLAC clip: stream metadata plus exact
    * whole-clip sample aggregates (order-free integer sums across all
    * channels) and the first/last samples — everything an oracle can
    * recompute from the generator formula without touching the
    * bitstream, so a hash match proves decode(encode(pcm)) = pcm. */
  case class FlacStats(
      doc_id: Long,
      n_bytes: Long,
      sample_rate: Int,
      channels: Int,
      bits_per_sample: Int,
      n_frames: Long,
      sum_v: Long,
      sum_abs: Long,
      sum_sq: Long,
      v_first: Int,
      v_last: Int)

  /** Decode FLAC blobs `(doc_id, blob)` to [[FlacStats]]; rows that
    * fail to decode (bad magic, CRC, truncation) are dropped — the
    * error→NULL discipline at record granularity. */
  def decodeFlacStats(spark: SparkSession, blobs: DataFrame): Dataset[FlacStats] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        Flac.decode(bytes).map { a =>
          var sv = 0L; var sa = 0L; var sq = 0L
          var c = 0
          while (c < a.channels) {
            val arr = a.samples(c)
            var i = 0
            while (i < arr.length) {
              val v = arr(i)
              sv += v; sa += math.abs(v); sq += v.toLong * v
              i += 1
            }
            c += 1
          }
          val nf = a.samples(0).length
          FlacStats(id, bytes.length.toLong, a.sampleRate, a.channels,
            a.bitsPerSample, nf.toLong, sv, sa, sq,
            if (nf > 0) a.samples(0)(0) else 0,
            if (nf > 0) a.samples(a.channels - 1)(nf - 1) else 0)
        }
      })
  }

  /** One resized "image": same record shape, target dimensions, and a
    * deterministic resampled payload digest standing in for pixel data. */
  case class ResizedMedia(
      doc_id: Long,
      width: Int,
      height: Int,
      payload: Array[Byte])

  /** STUB resize — stands in for a real resampling kernel. Deterministic:
    * strided byte selection down to (targetW*targetH/16) bytes. The
    * partition-local batching, fixed output shape, and binary payload are
    * the production plumbing. */
  def resize(spark: SparkSession, blobs: DataFrame, targetW: Int, targetH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val outLen = math.max(1, targetW * targetH / 16)
        it.map { case (id, bytes) =>
          val in = if (bytes == null) Array.emptyByteArray else bytes
          val out = new Array[Byte](outLen)
          if (in.nonEmpty) {
            var i = 0
            while (i < outLen) {
              out(i) = in((i.toLong * in.length / outLen).toInt)
              i += 1
            }
          }
          ResizedMedia(id, targetW, targetH, out)
        }
      }
  }

  /** One REALLY resized image: decoded pixels resampled to the target
    * dims, payload = raw RGB24 row-major, plus exact-integer channel
    * sums over the resized pixels (the oracle-checked surface). */
  case class ResizedImage(
      doc_id: Long,
      width: Int,
      height: Int,
      payload: Array[Byte],
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** REAL image resize: decode via `javax.imageio`, NEAREST-NEIGHBOR
    * resample to (targetW, targetH) with pure integer source indexing —
    * output pixel (X, Y) reads source (x, y) = (X*w div W, Y*h div H) —
    * and emit the raw RGB24 payload plus exact-integer channel sums.
    * Every step is fully specified (header-true dims, integer index
    * math, lossless PNG pixels), so the DuckDB oracle replays the sums
    * from [[syntheticPng]]'s generator formula without decoding
    * (q_img_resize). Blobs no reader recognizes fall back to the
    * [[resize]] stub payload with zeroed sums — same record shape.
    * Nearest-neighbor is the deliberate choice for a verifiable
    * baseline: area/bilinear kernels blend pixels in float arithmetic
    * whose rounding is library-defined; swap the sampler for a JNI
    * kernel and the plumbing is unchanged. */
  def resizeImages(
      spark: SparkSession,
      blobs: DataFrame,
      targetW: Int,
      targetH: Int): Dataset[ResizedImage] = {
    require(targetW >= 1 && targetH >= 1, s"bad target ${targetW}x$targetH")
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, bytes) =>
          val img =
            if (bytes == null || bytes.length < 4) null
            else
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: Exception => null }
          if (img == null) {
            val in = if (bytes == null) Array.emptyByteArray else bytes
            val outLen = math.max(1, targetW * targetH / 16)
            val out = new Array[Byte](outLen)
            if (in.nonEmpty) {
              var i = 0
              while (i < outLen) {
                out(i) = in((i.toLong * in.length / outLen).toInt)
                i += 1
              }
            }
            ResizedImage(id, targetW, targetH, out, 0L, 0L, 0L)
          } else {
            val w = img.getWidth
            val h = img.getHeight
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            val out = new Array[Byte](targetW * targetH * 3)
            var sr = 0L; var sg = 0L; var sb = 0L
            var yy = 0
            while (yy < targetH) {
              val sy = yy * h / targetH
              var xx = 0
              while (xx < targetW) {
                val sx = xx * w / targetW
                val rgb = px(sy * w + sx)
                val r = (rgb >> 16) & 0xff
                val g = (rgb >> 8) & 0xff
                val b = rgb & 0xff
                val o = (yy * targetW + xx) * 3
                out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte
                sr += r; sg += g; sb += b
                xx += 1
              }
              yy += 1
            }
            ResizedImage(id, targetW, targetH, out, sr, sg, sb)
          }
        }
      }
  }

  /** One REALLY decoded video frame: header-true dims + exact-integer
    * channel sums over the frame's decoded pixels. */
  case class VideoFrame(
      doc_id: Long,
      frame_idx: Int,
      width: Int,
      height: Int,
      sum_r: Long,
      sum_g: Long,
      sum_b: Long)

  /** The 64-color palette shared by [[syntheticGif]] and its oracle:
    * index i → (r, g, b) = (85·(i mod 4), 85·(i div 4 mod 4),
    * 85·(i div 16 mod 4)). GIF stores palettes verbatim and LZW is
    * lossless over indices, so decoded pixels ARE this formula. */
  private def gifPalette(): java.awt.image.IndexColorModel = {
    val r = new Array[Byte](64); val g = new Array[Byte](64); val b = new Array[Byte](64)
    var i = 0
    while (i < 64) {
      r(i) = (85 * (i % 4)).toByte
      g(i) = (85 * (i / 4 % 4)).toByte
      b(i) = (85 * (i / 16 % 4)).toByte
      i += 1
    }
    new java.awt.image.IndexColorModel(8, 64, r, g, b)
  }

  val GifW = 24
  val GifH = 16

  /** Deterministic synthetic animated GIF: 4 + docId mod 5 frames of
    * [[GifW]]×[[GifH]] indexed pixels, palette [[gifPalette]], pixel
    * index(f, x, y) = (31·docId + 97·f + 7·x + 13·y) mod 64 — a real
    * multi-frame container whose decoded pixels replay from the formula
    * (the video analogue of [[syntheticPng]]/[[syntheticWav]]). */
  def syntheticGif(docId: Long): Array[Byte] = {
    val nFrames = 4 + java.lang.Math.floorMod(docId, 5L).toInt
    val icm = gifPalette()
    val bos = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(GifW, GifH,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        val raster = img.getRaster
        var y = 0
        while (y < GifH) {
          var x = 0
          while (x < GifW) {
            raster.setSample(x, y, 0,
              java.lang.Math.floorMod(docId * 31 + f * 97 + x * 7 + y * 13, 64L).toInt)
            x += 1
          }
          y += 1
        }
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, null), writer.getDefaultWriteParam)
        f += 1
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  /** (doc_id, blob) table of [[syntheticGif]] clips. */
  def syntheticVideoBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticGif)

  /** REAL video frame sampling: decode every `stride`-th frame of an
    * animated GIF via `javax.imageio` (pure JVM — the one multi-frame
    * container the JDK ships a codec for) and emit header-true dims plus
    * exact-integer channel sums per sampled frame. One input row → many
    * frame rows (flatMap — the true cardinality shape of video decode);
    * non-GIF blobs yield no frames. Swap the reader for a JNI codec and
    * the plumbing (partitioning, flatMap shape, record schema) is
    * unchanged. */
  def sampleVideoFrames(
      spark: SparkSession,
      blobs: DataFrame,
      stride: Int = 2): Dataset[VideoFrame] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null || bytes.length < 6 ||
          !(bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F')) Iterator.empty
        else {
          val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          javax.imageio.ImageIO.setUseCache(false)
          // reader.dispose() does NOT close the input stream per the
          // javax.imageio contract — hold it and close it explicitly,
          // or every decoded row leaks a MemoryCacheImageInputStream
          // until GC finalization
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            reader.setInput(iis, false)
            val n = reader.getNumImages(true)
            (0 until n by stride).iterator.map { f =>
              val img = reader.read(f)
              val w = img.getWidth
              val h = img.getHeight
              val px = img.getRGB(0, 0, w, h, null, 0, w)
              var sr = 0L; var sg = 0L; var sb = 0L
              var i = 0
              while (i < px.length) {
                sr += (px(i) >> 16) & 0xff
                sg += (px(i) >> 8) & 0xff
                sb += px(i) & 0xff
                i += 1
              }
              VideoFrame(id, f, w, h, sr, sg, sb)
            }.toVector.iterator // materialize before the reader is disposed
          } catch {
            case _: Exception => Iterator.empty // truncated/corrupt GIF
          } finally {
            reader.dispose()
            try iis.close() catch { case _: Exception => () }
          }
        }
      }
  }

  // --------------------------------------------------------------------
  // INTER-FRAME video: Microsoft RLE8 (BI_RLE8) inside an AVI/RIFF
  // container — both formats fully published (Windows GDI bitmap
  // compression + the AVI RIFF form). Unlike GIF (every frame decoded
  // independently by javax.imageio), MS RLE8 delta frames SKIP unchanged
  // pixels via escape codes, and skipped pixels retain the PREVIOUS
  // frame's content — decoding frame f requires the framebuffer state
  // left by frames 0..f-1. That inter-frame dependency is the shape of
  // every real video codec (H.264 P-frames etc.); the RLE8 arithmetic is
  // the one instance of it expressible with public knowledge and zero
  // codec libraries.
  // --------------------------------------------------------------------

  val AviW = 24
  val AviH = 16

  /** Palette index at (x, y) as written by frame `g` of doc `docId` —
    * rows with y mod 4 == 3 are constant runs (exercising RLE run mode),
    * other rows vary per pixel (exercising absolute mode). */
  private[graft] def aviIdx(docId: Long, g: Int, x: Int, y: Int): Int =
    java.lang.Math.floorMod(
      docId * 31 + g * 97 + (if (y % 4 == 3) 0 else x * 7) + y * 13, 64L).toInt

  /** First visual row of the 4-row band that delta frame f (f >= 1)
    * rewrites; rows outside the band are carried from frame f-1. */
  private[graft] def aviBand(f: Int): Int = (5 * f) % (AviH - 3)

  /** MS-RLE8-encode one visual row `y` holding values `v` into `out`,
    * using the encoding mode cycle that exercises every RLE8 arm:
    * y%4==0 → one absolute block of 24 (even, no pad); y%4==1 → absolute
    * 13 + absolute 11 (both odd → each word-pad-aligned); y%4==2 →
    * twenty-four 1-pixel runs; y%4==3 → a single 24-pixel run (the row
    * is constant by [[aviIdx]]'s formula). */
  private def rleEncodeRow(out: java.io.ByteArrayOutputStream, y: Int,
      v: Array[Int]): Unit = (y % 4) match {
    case 0 =>
      out.write(0); out.write(AviW)
      var x = 0; while (x < AviW) { out.write(v(x)); x += 1 }
    case 1 =>
      out.write(0); out.write(13)
      var x = 0; while (x < 13) { out.write(v(x)); x += 1 }
      out.write(0) // 13 is odd: pad the absolute block to a word boundary
      out.write(0); out.write(11)
      while (x < AviW) { out.write(v(x)); x += 1 }
      out.write(0) // 11 is odd: pad again
    case 2 =>
      var x = 0; while (x < AviW) { out.write(1); out.write(v(x)); x += 1 }
    case _ =>
      out.write(AviW); out.write(v(0))
  }

  /** Deterministic synthetic AVI clip: one RLE8 keyframe (frame 0 covers
    * every row) + delta frames that encode ONLY their 4-row [[aviBand]]
    * (a delta escape jumps over the retained rows, end-of-bitmap cuts the
    * rest), nFrames = 4 + docId mod 5, [[AviW]]×[[AviH]] indexed pixels
    * over the same 64-color palette as [[syntheticGif]]. The pixel seen
    * at (x, y) in frame f is [[aviIdx]](docId, g, x, y) where g is the
    * LATEST frame ≤ f whose band covered y (0 if none) — the oracle
    * replays that carry rule in SQL, no AVI parsing needed. */
  def syntheticAviRle(docId: Long): Array[Byte] = {
    val nFrames = 4 + java.lang.Math.floorMod(docId, 5L).toInt
    val frames = new Array[Array[Byte]](nFrames)
    var f = 0
    while (f < nFrames) {
      val out = new java.io.ByteArrayOutputStream()
      val row = new Array[Int](AviW)
      if (f == 0) {
        // keyframe: all rows, encoded bottom-up (biHeight > 0 per the
        // BI_RLE8 spec means the first encoded row is the bottom one)
        var r = 0
        while (r < AviH) {
          val y = AviH - 1 - r
          var x = 0; while (x < AviW) { row(x) = aviIdx(docId, 0, x, y); x += 1 }
          rleEncodeRow(out, y, row)
          if (r < AviH - 1) { out.write(0); out.write(0) } // EOL
          r += 1
        }
      } else {
        val yb = aviBand(f)
        val rStart = AviH - 4 - yb // bottom-up row of the band's lowest row
        if (rStart > 0) { // delta escape: skip rStart retained rows
          out.write(0); out.write(2); out.write(0); out.write(rStart)
        }
        var k = 0
        while (k < 4) {
          val y = AviH - 1 - (rStart + k)
          var x = 0; while (x < AviW) { row(x) = aviIdx(docId, f, x, y); x += 1 }
          rleEncodeRow(out, y, row)
          if (k < 3) { out.write(0); out.write(0) } // EOL
          k += 1
        }
      }
      out.write(0); out.write(1) // end of bitmap: all later rows retained
      frames(f) = out.toByteArray
      f += 1
    }
    buildAvi(frames)
  }

  /** 'MJPG' as the little-endian BITMAPINFOHEADER biCompression int. */
  private[graft] val MjpgFourcc: Int =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  /** Assemble a minimal standards-shaped AVI RIFF around frame payloads:
    * hdrl (avih + one vids stream whose BITMAPINFOHEADER carries the
    * given handler/bits/compression — BI_RLE8 with the 256-entry BGRX
    * palette for the RLE family, 'MJPG'/24-bit with no palette for
    * Motion-JPEG) and a movi list of `00dc` chunks, each word-aligned. */
  private def buildAvi(
      frames: Array[Array[Byte]],
      handler: String = "MRLE",
      bits: Short = 8,
      comp: Int = 1,
      withPalette: Boolean = true): Array[Byte] = {
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    def chunk(fcc: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2
      val b = java.nio.ByteBuffer.allocate(8 + body.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put(fcc.getBytes(ascii)).putInt(body.length).put(body)
      b.array()
    }
    def list(listType: String, bodies: Array[Byte]*): Array[Byte] = {
      val inner = bodies.map(_.length).sum
      val b = java.nio.ByteBuffer.allocate(12 + inner)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes(ascii)).putInt(4 + inner).put(listType.getBytes(ascii))
      bodies.foreach(b.put)
      b.array()
    }
    val avih = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    avih.putInt(100000).putInt(0).putInt(0).putInt(0) // usec/frame, maxBps, pad, flags
      .putInt(frames.length).putInt(0).putInt(1).putInt(0) // totalFrames, initial, streams, bufSize
      .putInt(AviW).putInt(AviH).putInt(0).putInt(0).putInt(0).putInt(0)
    val strh = java.nio.ByteBuffer.allocate(56).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strh.put("vids".getBytes(ascii)).put(handler.getBytes(ascii))
      .putInt(0).putShort(0).putShort(0).putInt(0) // flags, priority, language, initialFrames
      .putInt(1).putInt(10).putInt(0).putInt(frames.length) // scale, rate, start, length
      .putInt(0).putInt(0).putInt(0) // bufSize, quality, sampleSize
      .putShort(0).putShort(0).putShort(AviW.toShort).putShort(AviH.toShort)
    val strf = java.nio.ByteBuffer.allocate(40 + (if (withPalette) 256 * 4 else 0))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(AviW).putInt(AviH).putShort(1).putShort(bits)
      .putInt(comp).putInt(0).putInt(0).putInt(0)
      .putInt(if (withPalette) 256 else 0).putInt(0)
    var i = 0
    while (withPalette && i < 256) { // RGBQUAD order is B, G, R, reserved
      if (i < 64) {
        strf.put((85 * (i / 16 % 4)).toByte).put((85 * (i / 4 % 4)).toByte)
          .put((85 * (i % 4)).toByte).put(0.toByte)
      } else strf.putInt(0)
      i += 1
    }
    val hdrl = list("hdrl", chunk("avih", avih.array()),
      list("strl", chunk("strh", strh.array()), chunk("strf", strf.array())))
    val movi = list("movi", frames.map(fr => chunk("00dc", fr)): _*)
    val inner = hdrl.length + movi.length
    val out = java.nio.ByteBuffer.allocate(12 + inner)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes(ascii)).putInt(4 + inner).put("AVI ".getBytes(ascii))
      .put(hdrl).put(movi)
    out.array()
  }

  /** [[syntheticAviRle]] clips for the given ids. */
  def syntheticAviBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticAviRle)

  /** Gray value of the 8×8 block (bx, by) in frame f of doc `docId` —
    * the formula the q_video_mjpeg oracle replays per block. */
  private[graft] def mjpegBlock(docId: Long, f: Int, bx: Int, by: Int): Int =
    ((docId * 31 + f * 97 + bx * 7 + by * 13) % 256).toInt

  /** Deterministic synthetic Motion-JPEG AVI: nFrames = 4 + docId mod 5
    * REAL JPEGs (javax.imageio, grayscale, quality 1.0) of [[AviW]]×
    * [[AviH]] pixels whose 8×8 blocks are CONSTANT [[mjpegBlock]] values
    * — a DC-only JPEG: with the quality-1.0 all-ones quantization table
    * every block round-trips bit-exactly (spec-verified across all 256
    * gray values), so the decoded sums are formula-checkable by the SQL
    * oracle even though the codec is a real lossy-format encoder. */
  def syntheticAviMjpeg(docId: Long): Array[Byte] = {
    val nf = 4 + (docId % 5).toInt
    javax.imageio.ImageIO.setUseCache(false)
    val frames = Array.tabulate(nf) { f =>
      val img = new java.awt.image.BufferedImage(AviW, AviH,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var x = 0
      while (x < AviW) {
        var y = 0
        while (y < AviH) {
          img.getRaster.setSample(x, y, 0, mjpegBlock(docId, f, x / 8, y / 8))
          y += 1
        }
        x += 1
      }
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
      val p = w.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(1.0f)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try {
        w.setOutput(ios)
        w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { ios.close(); w.dispose() }
      bos.toByteArray
    }
    buildAvi(frames, handler = "MJPG", bits = 24, comp = MjpgFourcc,
      withPalette = false)
  }

  /** [[syntheticAviMjpeg]] clips for the given ids. */
  def syntheticMjpegBlobs(spark: SparkSession, df: DataFrame): DataFrame =
    blobTable(spark, df, syntheticAviMjpeg)

  /** REAL Motion-JPEG video decode: walk the AVI RIFF ([[parseAvi]] —
    * the same container code the RLE8 family uses), then decode every
    * `stride`-th `00dc` payload as a standalone JPEG through
    * `javax.imageio` (the same registered reader `decodeImage` uses)
    * and emit header-true dims + exact-integer channel sums. MJPEG
    * frames are INTRA-ONLY, so — unlike [[sampleAviFrames]]'s
    * decode-all-emit-some inter-frame walk — unsampled frames are never
    * decoded: sampling cost is proportional to frames EMITTED, the cost
    * model that makes MJPEG the archival/ingest-friendly codec. For
    * single-band (grayscale) JPEGs the raster sample IS each channel
    * (r = g = b); multi-band frames sum bands 0/1/2 directly from the
    * raster — no color-space round trip that would break exactness.
    * Narrow flatMap, no shuffle; scales with executors. */
  /** Scene-cut detection over REAL-decoded Motion-JPEG streams — the
    * [[videoSceneCuts]] SAD metric on the intra-only codec: every frame
    * decodes independently through `javax.imageio`, adjacent pairs diff
    * per raster band (single-band grayscale counts ×3, matching the
    * RGB convention Σ|Δr|+|Δg|+|Δb| so thresholds transfer between the
    * codecs), memory is two frames regardless of clip length. Unlike
    * the RLE8 walk nothing forces sequential decode except the pairing
    * itself. Narrow flatMap, no shuffle. frame_idx is the LATER frame
    * of the pair (1-based transitions); an undecodable frame drops its
    * two adjacent transitions rather than fabricating a diff. */
  def mjpegSceneCuts(
      spark: SparkSession,
      blobs: DataFrame,
      threshold: Long): Dataset[SceneCut] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (try parseAvi(bytes) catch { case _: Exception => None }) match {
          case Some(av) if av.compression == MjpgFourcc =>
            javax.imageio.ImageIO.setUseCache(false)
            var prevPix: Array[Int] = null
            var prevBands = 0
            val out = Vector.newBuilder[SceneCut]
            av.frames.iterator.zipWithIndex.foreach { case (data, f) =>
              val img =
                try javax.imageio.ImageIO.read(
                  new java.io.ByteArrayInputStream(data))
                catch { case _: Exception => null }
              if (img == null) { prevPix = null } // drop adjacent pairs
              else {
                val raster = img.getRaster
                val bands = raster.getNumBands
                val n = img.getWidth * img.getHeight * bands
                val cur = new Array[Int](n)
                var idx = 0
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    var b = 0
                    while (b < bands) {
                      cur(idx) = raster.getSample(x, y, b); idx += 1; b += 1
                    }
                    x += 1
                  }
                  y += 1
                }
                if (prevPix != null && prevPix.length == n && prevBands == bands) {
                  var diff = 0L
                  var i = 0
                  while (i < n) {
                    diff += math.abs(cur(i) - prevPix(i)); i += 1
                  }
                  if (bands == 1) diff *= 3 // gray ×3 == the RGB SAD scale
                  out += SceneCut(id, f, diff, diff > threshold)
                }
                prevPix = cur; prevBands = bands
              }
            }
            out.result()
          case _ => Iterator.empty
        }
      }
  }

  def sampleMjpegFrames(
      spark: SparkSession,
      blobs: DataFrame,
      stride: Int = 2): Dataset[VideoFrame] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (try parseAvi(bytes) catch { case _: Exception => None }) match {
          case Some(av) if av.compression == MjpgFourcc =>
            javax.imageio.ImageIO.setUseCache(false)
            av.frames.iterator.zipWithIndex
              .filter { case (_, f) => f % stride == 0 }
              .flatMap { case (data, f) =>
                val img =
                  try javax.imageio.ImageIO.read(
                    new java.io.ByteArrayInputStream(data))
                  catch { case _: Exception => null }
                if (img == null) Iterator.empty
                else {
                  val raster = img.getRaster
                  val bands = raster.getNumBands
                  var sr = 0L; var sg = 0L; var sb = 0L
                  var y = 0
                  while (y < img.getHeight) {
                    var x = 0
                    while (x < img.getWidth) {
                      if (bands == 1) {
                        val v = raster.getSample(x, y, 0).toLong
                        sr += v; sg += v; sb += v
                      } else {
                        sr += raster.getSample(x, y, 0)
                        sg += raster.getSample(x, y, 1)
                        sb += raster.getSample(x, y, 2)
                      }
                      x += 1
                    }
                    y += 1
                  }
                  Iterator.single(
                    VideoFrame(id, f, img.getWidth, img.getHeight, sr, sg, sb))
                }
              }.toVector
          case _ => Iterator.empty
        }
      }
  }

  /** Parsed AVI essentials: dims, compression (1 = BI_RLE8, [[MjpgFourcc]]
    * = Motion-JPEG), BGRX palette (RLE8 only — null for MJPEG), raw frame
    * payloads. */
  private case class AviStream(width: Int, height: Int, compression: Int,
      palette: Array[Int], frames: Vector[Array[Byte]])

  /** Walk the RIFF tree of an AVI blob: capture the first video `strf`
    * (BITMAPINFOHEADER + palette for BI_RLE8; bare header for 'MJPG')
    * and every `##dc`/`##db` chunk inside `movi` (in file order — AVI
    * frame order). Returns None for anything malformed rather than
    * throwing. */
  private def parseAvi(bytes: Array[Byte]): Option[AviStream] = {
    if (bytes == null || bytes.length < 24) return None
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fcc(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
    if (fcc(0) != "RIFF" || fcc(8) != "AVI ") return None
    var width = 0; var height = 0
    var compression = 0
    var palette: Array[Int] = null
    var frames = Vector.newBuilder[Array[Byte]]
    var nFrames = 0
    // iterative walk with an explicit stack of (pos, end) regions
    var stack = List((12, math.min(12 + b.getInt(4) - 4, bytes.length)))
    while (stack.nonEmpty) {
      val (pos, end) = stack.head
      if (pos + 8 > end) stack = stack.tail
      else {
        val id = fcc(pos)
        val size = b.getInt(pos + 4)
        // overflow-safe form of pos+8+size > end: an adversarial size
        // near Int.MaxValue must not wrap negative past the guard
        if (size < 0 || size > end - pos - 8) stack = stack.tail // malformed: stop this region
        else {
          val next = pos + 8 + size + (size % 2)
          stack = (next, end) :: stack.tail
          if (id == "LIST" && size >= 4) {
            // descend into hdrl/strl/movi (any list — harmless elsewhere)
            stack = (pos + 12, pos + 8 + size) :: stack
          } else if (id == "strf" && size >= 40 && width == 0) {
            val bi = b.duplicate().order(java.nio.ByteOrder.LITTLE_ENDIAN)
            bi.position(pos + 8)
            val biSize = bi.getInt(); val w = bi.getInt(); val h = bi.getInt()
            bi.getShort(); val bits = bi.getShort()
            val comp = bi.getInt()
            if (biSize >= 40 && bits == 8 && comp == 1 && w > 0 && h > 0 &&
              w * h <= (1 << 24)) {
              width = w; height = h; compression = 1
              val palBytes = size - biSize
              val nPal = math.min(256, palBytes / 4)
              palette = new Array[Int](256)
              var i = 0
              while (i < nPal) {
                val o = pos + 8 + biSize + i * 4
                palette(i) = ((bytes(o + 2) & 0xff) << 16) |
                  ((bytes(o + 1) & 0xff) << 8) | (bytes(o) & 0xff)
                i += 1
              }
            } else if (biSize >= 40 && comp == MjpgFourcc && w > 0 && h > 0 &&
              w * h <= (1 << 24)) {
              // Motion-JPEG: frame payloads are standalone JPEGs, no
              // palette to capture
              width = w; height = h; compression = MjpgFourcc
            }
          } else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
            (id.substring(2) == "dc" || id.substring(2) == "db")) {
            frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size)
            nFrames += 1
          }
        }
      }
    }
    if (width == 0 || nFrames == 0) None
    else if (compression == 1 && palette == null) None
    else Some(AviStream(width, height, compression, palette, frames.result()))
  }

  /** Decode one MS-RLE8 frame INTO `fb` (palette indices, visual row
    * order, length w*h) — the previous frame's content stays wherever
    * the stream skips (EOL/EOB/delta escapes and short rows), which is
    * exactly the inter-frame carry. Bottom-up per BI_RLE8: encoded row r
    * is visual row h-1-r. Out-of-bounds writes are clipped (defensive —
    * a hostile blob must not crash the executor). */
  private def rleDecodeFrame(data: Array[Byte], fb: Array[Byte],
      w: Int, h: Int): Unit = {
    var i = 0; var x = 0; var r = 0
    var done = false
    while (!done && i + 1 < data.length && r < h) {
      val b1 = data(i) & 0xff; val b2 = data(i + 1) & 0xff
      i += 2
      if (b1 > 0) { // run mode: b1 copies of index b2
        val y = h - 1 - r
        var k = 0
        while (k < b1) {
          if (x < w) fb(y * w + x) = b2.toByte
          x += 1; k += 1
        }
      } else b2 match {
        case 0 => x = 0; r += 1 // end of line
        case 1 => done = true // end of bitmap
        case 2 => // delta: skip (dx, dy) pixels — previous frame shows through
          if (i + 1 < data.length) { x += data(i) & 0xff; r += data(i + 1) & 0xff }
          i += 2
        case n => // absolute mode: n literal indices, word-aligned
          val y = h - 1 - r
          var k = 0
          while (k < n && i < data.length) {
            if (x < w) fb(y * w + x) = data(i)
            x += 1; i += 1; k += 1
          }
          if (n % 2 == 1) i += 1 // pad byte
      }
    }
  }

  /** REAL inter-frame video decode: walk the AVI RIFF, then decode EVERY
    * RLE8 frame in order — delta frames mutate the persistent framebuffer
    * the previous frames left — and emit header-true dims + exact-integer
    * channel sums for every `stride`-th frame. Sampling cannot skip the
    * decode of unsampled frames (their deltas feed later frames): that
    * decode-all-emit-some shape is the honest cost model of inter-frame
    * codecs, vs [[sampleVideoFrames]]'s independently-decodable GIF
    * frames. Narrow flatMap, no shuffle; scales with executors. */
  def sampleAviFrames(
      spark: SparkSession,
      blobs: DataFrame,
      stride: Int = 2): Dataset[VideoFrame] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (try parseAvi(bytes) catch { case _: Exception => None }) match {
          case None => Iterator.empty
          case Some(av) if av.compression != 1 => Iterator.empty // MJPEG -> sampleMjpegFrames
          case Some(av) =>
            val fb = new Array[Byte](av.width * av.height) // index 0 until written
            av.frames.iterator.zipWithIndex.flatMap { case (data, f) =>
              rleDecodeFrame(data, fb, av.width, av.height)
              if (f % stride != 0) Iterator.empty
              else {
                var sr = 0L; var sg = 0L; var sb = 0L
                var i = 0
                while (i < fb.length) {
                  val rgb = av.palette(fb(i) & 0xff)
                  sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
                  i += 1
                }
                Iterator.single(VideoFrame(id, f, av.width, av.height, sr, sg, sb))
              }
            }.toVector
        }
      }
  }

  /** One resampled channel: rates, lengths, and the position-weighted
    * integer summary of the resampled signal. */
  case class ResampledAudio(
      doc_id: Long, channel: Int, sr_in: Int, sr_out: Int,
      n_in: Long, n_out: Long, wsum: Long, smin: Long, smax: Long)

  /** Sample-rate conversion by EXACT-rational linear interpolation:
    * output index j reads input position j·downM/upL — integer part
    * i = (j·downM) div upL, fractional numerator r = (j·downM) mod upL —
    * and interpolates y = x[i] + ((x[i+1] − x[i])·r) div upL with
    * TRUNCATING integer division (the SQL `//`/Java `/` convention —
    * positions are non-negative so only the interpolation delta ever
    * sees a sign), making every output sample a pure integer function
    * of the input: an engine-independent resampler, no float phase
    * accumulator to drift. n_out = (n_in−1)·upL div downM + 1 — the
    * last output lands exactly on the last input (r = 0 there, proven
    * by the bound, so x[i+1] is never read out of range). Requires
    * upL ≤ downM (downsampling; for upsampling swap the reconstruction
    * filter, not this kernel) and that every input rate·upL is
    * divisible by downM (integer output rate, loudly checked).
    *
    * Input blobs are REAL RIFF/WAVE PCM16 files (chunk-walked: fmt +
    * data, other chunks skipped); per-channel resampling over the
    * deinterleaved stream. Narrow partition-local decode+resample —
    * one flatMap row per (doc, channel), no shuffle. The emitted
    * summary (wsum = Σ(j+1)·y[j], min, max) pins every sample's value
    * AND position without dumping the waveform. */
  def audioResample(
      spark: SparkSession,
      blobs: DataFrame,
      upL: Int = 3,
      downM: Int = 4): Dataset[ResampledAudio] = {
    require(upL >= 1 && downM >= 1 && upL <= downM,
      s"audioResample is a downsampler: need 1 <= upL <= downM, got $upL/$downM")
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        pcm16Samples(bytes) match {
          case None => Iterator.empty
          case Some((sr, ch, x)) =>
            require(sr.toLong * upL % downM == 0,
              s"audioResample: rate $sr * $upL/$downM is not an integer (doc $id)")
            val nIn = x.length / ch
            val nOut = if (nIn == 0) 0L else (nIn - 1).toLong * upL / downM + 1
            (0 until ch).iterator.map { c =>
              var wsum = 0L
              var smin = Long.MaxValue
              var smax = Long.MinValue
              var j = 0L
              while (j < nOut) {
                val p = j * downM
                val i = (p / upL).toInt
                val r = p % upL
                val x0 = x((i * ch + c).toInt).toLong
                val y =
                  if (r == 0L) x0
                  else x0 + (x((i + 1) * ch + c).toLong - x0) * r / upL
                wsum += (j + 1) * y
                if (y < smin) smin = y
                if (y > smax) smax = y
                j += 1
              }
              ResampledAudio(id, c, sr, sr * upL / downM, nIn.toLong, nOut,
                wsum, if (nOut == 0) 0L else smin, if (nOut == 0) 0L else smax)
            }.toVector
        }
      }
  }

  /** One trimmed channel: where the loud region sits and its summary. */
  case class TrimmedAudio(
      doc_id: Long, channel: Int, n_in: Long, trim_start: Long, n_out: Long,
      wsum: Long, smin: Long, smax: Long)

  /** Leading/trailing silence trim (the VAD-lite preprocessing step
    * before transcription or feature windows): a FRAME is loud when ANY
    * channel's |sample| ≥ `threshold`; the kept region spans the first
    * through last loud frame (interior quiet passages stay — this trims
    * edges, it does not gate). Frame-level decision so channels stay
    * aligned. Per channel, emits the kept region's position-weighted
    * integer summary (wsum = Σ(j+1)·x[start+j], min, max — the
    * [[audioResample]] discipline: pins every value AND position
    * without dumping waveforms). All-quiet clips emit n_out = 0 with
    * trim_start = −1. Narrow partition-local decode, no shuffle. */
  def audioTrimSilence(
      spark: SparkSession,
      blobs: DataFrame,
      threshold: Int): Dataset[TrimmedAudio] = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        pcm16Samples(bytes) match {
          case None => Iterator.empty
          case Some((_, ch, x)) =>
            val nIn = x.length / ch
            def loud(f: Int): Boolean = {
              var c = 0
              while (c < ch) {
                if (math.abs(x(f * ch + c).toInt) >= threshold) return true
                c += 1
              }
              false
            }
            var start = 0
            while (start < nIn && !loud(start)) start += 1
            var end = nIn - 1
            while (end >= start && !loud(end)) end -= 1
            val nOut = if (start > end) 0L else (end - start + 1).toLong
            (0 until ch).iterator.map { c =>
              if (nOut == 0L) TrimmedAudio(id, c, nIn.toLong, -1L, 0L, 0L, 0L, 0L)
              else {
                var wsum = 0L
                var smin = Long.MaxValue
                var smax = Long.MinValue
                var f = start
                while (f <= end) {
                  val v = x(f * ch + c).toLong
                  wsum += (f - start + 1).toLong * v
                  if (v < smin) smin = v
                  if (v > smax) smax = v
                  f += 1
                }
                TrimmedAudio(id, c, nIn.toLong, start.toLong, nOut, wsum, smin, smax)
              }
            }.toVector
        }
      }
  }

  /** VAD-lite segmentation — the islands the trim step
    * ([[audioTrimSilence]]) deliberately keeps interior: every maximal
    * run of consecutive LOUD frames (any channel |sample| ≥ threshold,
    * the frame-level rule that keeps channels aligned) becomes one
    * segment row `(doc_id, seg_idx, start_f, end_f, n_frames)` —
    * the speech/music spans a transcription or windowed-feature pass
    * would process, with the silence between them skipped. Decode is a
    * narrow per-blob flatMap emitting only the loud frames; the runs
    * are the classic gaps-and-islands: frame − row_number() is
    * constant within a run, so one window + one keyed aggregation
    * (both on the doc key — a single exchange) close the segments.
    * All integers, oracle-replayable value-level. */
  def audioLoudSegments(
      spark: SparkSession,
      blobs: DataFrame,
      threshold: Int): DataFrame = {
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val loud = blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        pcm16Samples(bytes) match {
          case None => Iterator.empty
          case Some((_, ch, x)) =>
            val nIn = x.length / ch
            (0 until nIn).iterator.filter { f =>
              var c = 0
              var isLoud = false
              while (c < ch && !isLoud) {
                if (math.abs(x(f * ch + c).toInt) >= threshold) isLoud = true
                c += 1
              }
              isLoud
            }.map(f => (id, f.toLong))
        }
      }
      .toDF("doc_id", "f")
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("f"))
    loud
      .withColumn("g", col("f") - row_number().over(byDoc))
      .groupBy(col("doc_id"), col("g"))
      .agg(min(col("f")).as("start_f"), max(col("f")).as("end_f"),
        count(lit(1)).cast("long").as("n_frames"))
      .withColumn("seg_idx",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("start_f"))))
      .select(col("doc_id"), col("seg_idx"), col("start_f"), col("end_f"),
        col("n_frames"))
  }

  /** One DFT bin of one analysis window: `power` = |X_k|² of the
    * normalized (÷32768) samples. */
  case class SpectralBin(
      doc_id: Long, channel: Int, window: Int, bin: Int, power: Double)

  /** Windowed DFT bin powers — the spectral front-end a speech/music
    * curation pass runs before any model (tone detection, bandwidth
    * checks, energy-band fingerprints): per channel, consecutive
    * rectangular windows of `windowSize` frames (trailing partial
    * window dropped), and for bins k = 1..nBins the direct DFT power
    * |X_k|² = (Σ x_i·cos(2πki/N))² + (Σ x_i·sin(2πki/N))² over samples
    * normalized to ÷32768. No FFT: the direct form keeps the float
    * accumulation a strict sample-order left fold (one multiply-add
    * per term, trig from one driver-built table), so every power is
    * oracle-replayable bit-level; at N = 64 the direct cost is 2N per
    * bin — the kernel is scan-bound, not flop-bound. DC (k = 0) is
    * excluded: it is the mean the feature family already reports.
    * Narrow partition-local decode, no shuffle; non-PCM16 blobs skip. */
  def audioSpectral(
      spark: SparkSession,
      blobs: DataFrame,
      windowSize: Int = 64,
      nBins: Int = 4): Dataset[SpectralBin] = {
    require(windowSize >= 2, s"windowSize must be >= 2, got $windowSize")
    require(nBins >= 1 && nBins <= windowSize / 2,
      s"need 1 <= nBins <= windowSize/2, got $nBins")
    import spark.implicits._
    val cosT = Array.tabulate(nBins, windowSize)((k, i) =>
      math.cos(2.0 * math.Pi * (k + 1) * i / windowSize))
    val sinT = Array.tabulate(nBins, windowSize)((k, i) =>
      math.sin(2.0 * math.Pi * (k + 1) * i / windowSize))
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        pcm16Samples(bytes) match {
          case None => Iterator.empty
          case Some((_, ch, x)) =>
            val nWin = (x.length / ch) / windowSize
            for {
              c <- (0 until ch).iterator
              w <- (0 until nWin).iterator
              k <- (0 until nBins).iterator
            } yield {
              val ct = cosT(k)
              val st = sinT(k)
              var re = 0.0
              var im = 0.0
              var i = 0
              while (i < windowSize) {
                val v = x((w * windowSize + i) * ch + c).toDouble / 32768.0
                re += v * ct(i)
                im += v * st(i)
                i += 1
              }
              SpectralBin(id, c, w, k + 1, re * re + im * im)
            }
        }
      }
  }

  /** RIFF/WAVE chunk walk for PCM16: (sampleRate, channels, interleaved
    * samples) — None for anything that is not an uncompressed 16-bit
    * WAV (fmt code 1, 16 bits). */
  private[graft] def pcm16Samples(bytes: Array[Byte]): Option[(Int, Int, Array[Short])] = {
    if (bytes == null || bytes.length < 44) return None
    def tag(o: Int) = new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    def u16(o: Int) = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def u32(o: Int) = (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
      ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var o = 12
    var sr = -1; var ch = -1; var bits = -1; var fmt = -1
    var dataOff = -1; var dataLen = -1
    while (o + 8 <= bytes.length && (sr < 0 || dataOff < 0)) {
      val ct = tag(o)
      val cl = u32(o + 4)
      if (cl < 0 || cl > bytes.length.toLong) return None
      val len = cl.toInt
      if (ct == "fmt " && o + 8 + 16 <= bytes.length) {
        fmt = u16(o + 8); ch = u16(o + 10)
        sr = u32(o + 12).toInt; bits = u16(o + 22)
      } else if (ct == "data") {
        dataOff = o + 8
        dataLen = math.min(len.toLong, (bytes.length - dataOff).toLong).toInt
      }
      o += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (fmt != 1 || bits != 16 || ch < 1 || sr <= 0 || dataOff < 0) return None
    val n = dataLen / 2
    val out = new Array[Short](n)
    var i = 0
    while (i < n) {
      out(i) = ((bytes(dataOff + 2 * i) & 0xff) |
        ((bytes(dataOff + 2 * i + 1) & 0xff) << 8)).toShort
      i += 1
    }
    Some((sr, ch, out))
  }

  /** One frame-to-frame transition: SAD (sum of absolute per-pixel RGB
    * differences) and the thresholded cut flag. */
  case class SceneCut(doc_id: Long, frame_idx: Int, diff_sum: Long, is_cut: Boolean)

  /** Scene-cut detection over REAL-decoded video frames: per adjacent
    * frame pair, the SAD metric Σ|Δr|+|Δg|+|Δb| over all pixels, with a
    * transition flagged `is_cut` when it exceeds `threshold` — the
    * standard shot-boundary screen a video training pipeline runs before
    * keyframe sampling (sample AROUND cuts, not blindly every Nth
    * frame). The AVI/MS-RLE8 stream is decoded ONCE sequentially per
    * blob (delta frames need the running framebuffer anyway); the
    * previous frame's palette-resolved RGB rows are kept in a single
    * reused buffer, so memory is two frames regardless of video length.
    * Partition-local flatMap — the narrow CPU-decode shape, no shuffle.
    * frame_idx is the LATER frame of the pair (1-based transitions). */
  def videoSceneCuts(
      spark: SparkSession,
      blobs: DataFrame,
      threshold: Long): Dataset[SceneCut] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        (try parseAvi(bytes) catch { case _: Exception => None }) match {
          case None => Iterator.empty
          case Some(av) if av.compression != 1 => Iterator.empty // MJPEG frames are intra-only
          case Some(av) =>
            val n = av.width * av.height
            val fb = new Array[Byte](n)
            val prev = new Array[Int](n) // previous frame, palette-resolved
            av.frames.iterator.zipWithIndex.flatMap { case (data, f) =>
              rleDecodeFrame(data, fb, av.width, av.height)
              val out =
                if (f == 0) Iterator.empty
                else {
                  var diff = 0L
                  var i = 0
                  while (i < n) {
                    val a = av.palette(fb(i) & 0xff)
                    val b = prev(i)
                    diff += math.abs(((a >> 16) & 0xff) - ((b >> 16) & 0xff)) +
                      math.abs(((a >> 8) & 0xff) - ((b >> 8) & 0xff)) +
                      math.abs((a & 0xff) - (b & 0xff))
                    i += 1
                  }
                  Iterator.single(SceneCut(id, f, diff, diff > threshold))
                }
              var i = 0
              while (i < n) { prev(i) = av.palette(fb(i) & 0xff); i += 1 }
              out
            }.toVector
        }
      }
  }

  /** One sampled "frame" of a pseudo-video blob. */
  case class Frame(doc_id: Long, frame_idx: Int, offset: Long, frame: Array[Byte])

  /** STUB frame sampler — treats the blob as a fixed-rate byte stream and
    * emits every `stride`-th chunk (flatMap: one input row → many frames,
    * the real cardinality shape of video decode). */
  def sampleFrames(
      spark: SparkSession,
      blobs: DataFrame,
      frameBytes: Int = 32,
      stride: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val in = if (bytes == null) Array.emptyByteArray else bytes
        val nFrames = in.length / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          val off = f * frameBytes
          Frame(id, f, off.toLong, java.util.Arrays.copyOfRange(in, off, off + frameBytes))
        }
      }
  }
}
