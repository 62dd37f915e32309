package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads travel as opaque
 * `binary` columns with typed metadata, and decode / feature-extraction
 * runs as a partition-local batch kernel (`mapPartitions`) — the Scala
 * analogue of a vectorized Python `mapInPandas` stage.
 *
 * The actual codec step is STUBBED: this container has no image/audio
 * libraries, so `decodeStub` derives a deterministic fake header + feature
 * vector from the bytes. Everything around it — the binary schema, the
 * batched per-partition execution, the fixed-width feature output — is the
 * real production shape: swap `decodeStub` for a JNI/codec call and the
 * pipeline is unchanged.
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

  /** STUB decoder — stands in for e.g. JPEG decode + CNN featurizer.
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

  /** Batched partition-local decode over (id, blob) rows. */
  def decodeFeatures(spark: SparkSession, blobs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // partition-local batch loop — codec state would be reused here
        it.map { case (id, bytes) =>
          decodeStub(id, if (bytes == null) Array.emptyByteArray else bytes)
        }
      }
  }

  /** documents.text reinterpreted as a blob column — the stand-in media
    * table for this container (no real image data ships with the tests). */
  def documentBlobs(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("text").cast("binary").as("blob"))

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
