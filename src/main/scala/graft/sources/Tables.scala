package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/**
 * Source/sink helpers for the scale path. The reference library has no
 * sources of its own (SURVEY.md §2.3) — Spark supplies them — but at the
 * 100 TB design point HOW a table is laid out decides whether every join
 * shuffles:
 *
 *  - `writeBucketed`: hash-bucket a table by its join key at write time.
 *    Two tables bucketed on the same key with the same bucket count join
 *    with ZERO exchanges (verified in PlanQualitySpec) — on a cluster this
 *    turns the nightly fact-to-fact join from a full-network shuffle into
 *    a local merge per bucket.
 *  - `writePartitioned`: directory-partition by a low-cardinality column
 *    so predicates prune whole directories (PartitionFilters at the scan).
 *
 * Bucket counts should be sized so one bucket of the LARGER table fits an
 * executor's memory at the target scale (e.g. 100 TB / 4096 buckets ≈
 * 25 GB per bucket before column pruning).
 */
object Tables {

  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int,
      sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCol: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(path)

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Morton (Z-order) value of k pre-bucketed nonneg int columns: bit j
    * of column i lands at output bit j·k + i, so files sorted by the
    * z-value cover axis-aligned boxes in ALL dimensions at once. Inputs
    * are masked to the low `bits` bits (caller buckets raw values —
    * ranks, floors, hashes — into that range). Pure codegen arithmetic
    * (unrolled shift/and/or), replayed bit-for-bit in integer SQL. */
  def zValue(cols: Seq[Column], bits: Int = 8): Column = {
    require(cols.nonEmpty && cols.size <= 4, s"1..4 z columns, got ${cols.size}")
    require(bits >= 1 && cols.size * bits <= 60, s"bits out of range: $bits")
    val k = cols.size
    val terms = for {
      j <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), j).bitwiseAND(lit(1L)),
      j * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Z-ORDERED parquet layout (the Delta/Iceberg OPTIMIZE ZORDER idea,
    * done with plain Spark): range-partition on the interleaved z-value
    * and sort within partitions, so each output file's parquet min/max
    * stats are TIGHT on every z-dimension — a filter on ANY of the
    * dimensions then skips most files/row-groups at the scan, where a
    * single-column sort gives selective stats on that column only. The
    * exchange is one range partition (sampled bounds); file count =
    * `numFiles`. At 100 TB this is the difference between "fast queries
    * on time" and "fast queries on time AND user AND value". */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      zCols: Seq[Column],
      bits: Int = 8,
      numFiles: Int = 32): Unit = {
    val zv = zValue(zCols, bits)
    df.withColumn("__z", zv)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Hilbert-curve index of a 2-D point — the locality-preserving
    * alternative to [[zValue]]: consecutive Hilbert codes are ALWAYS
    * unit Manhattan steps (the curve never jumps), where the Z curve
    * teleports across seams every power-of-two boundary — so
    * range-partitioning on the Hilbert code packs each file into a
    * tighter 2-D box (Delta OPTIMIZE added Hilbert after Z-order for
    * exactly this). Classic xy2d recurrence [Hilbert 1891; bitwise form
    * as in Warren, Hacker's Delight §16] via the
    * [[graft.operators.HilbertIndex]] kernel — the unrolled pure-Column
    * form was tried first and MEASURED 165 s at sf0.1 (the when-chain
    * tree triples per level and falls out of codegen; the kernel is
    * sub-second). Inputs must sit in [0, 2^bits) — callers mask like
    * the z path; out-of-range raises loudly. */
  def hilbertValue(xc: Column, yc: Column, bits: Int = 8): Column =
    org.apache.spark.sql.graft.GraftSqlShim.column(
      graft.operators.HilbertIndex(
        org.apache.spark.sql.graft.GraftSqlShim.expression(xc.cast("long")),
        org.apache.spark.sql.graft.GraftSqlShim.expression(yc.cast("long")),
        bits))

  /** Hilbert-ordered parquet layout — [[writeZOrdered]] with the
    * tighter curve: one range partition on the Hilbert code + in-file
    * sort, so every file's min/max stats box is a near-square 2-D tile
    * (Z-order tiles bleed across seams). Two dimensions by design —
    * the Hilbert recurrence is 2-D; for 3+ dims fall back to z-order. */
  def writeHilbertOrdered(
      df: DataFrame,
      path: String,
      xc: Column,
      yc: Column,
      bits: Int = 8,
      numFiles: Int = 32): Unit = {
    df.withColumn("__h", hilbertValue(xc, yc, bits))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** JSON-lines interchange — the lingua franca of LLM data pipelines.
    * Write compressed (prefer "zstd" on clusters with native Hadoop
    * codecs — faster at similar ratios; gzip default here since text
    * zstd needs the native library) and read back with an explicit
    * schema — schema inference re-reads the whole dataset, which at the
    * 100 TB design point is a full extra scan. */
  def writeJsonl(
      df: DataFrame,
      path: String,
      compression: String = "gzip"): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", compression)
      .json(path)

  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  // --------------------------------------------------------------------
  // Schema-tolerant test-table loading. The driver has shipped events.ts
  // under two physical parquet types across rounds:
  //
  //   - TIMESTAMP(NANOS) — readable only with the
  //     `spark.sql.legacy.parquet.nanosAsLong` conf, arriving as a raw
  //     epoch-nanos LongType;
  //   - TIMESTAMP(MICROS, isAdjustedToUTC=false) — a plain parquet
  //     timestamp, which Spark reads as TIMESTAMP_NTZ by default (or
  //     TIMESTAMP_LTZ with NTZ inference disabled, in which case the
  //     internal value IS the file's raw micros, no timezone applied).
  //
  // Everything downstream (as-of carries, window floors, the DuckDB
  // oracles' `epoch_ns(ts)`) does integer arithmetic on epoch NANOS, so
  // reads funnel through here and `ts` is normalized to an epoch-nanos
  // LongType whichever physical type the file carries. The DuckDB side
  // needs no switch: `epoch_ns` on a naive timestamp interprets the wall
  // time as UTC, which is exactly what the normalization produces.
  // --------------------------------------------------------------------

  /** Read confs under which BOTH historical events schemas produce a
    * session-timezone-independent value: nanos files arrive as raw
    * epoch-nanos longs, micros files as TIMESTAMP_LTZ whose internal
    * value is the raw stored micros (NTZ inference off restores the
    * pre-3.4 read path, which applies no timezone conversion to
    * non-UTC-adjusted parquet timestamps). */
  def prepare(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
  }

  /** Epoch-nanos long from whatever type a `ts` read produced. The NTZ
    * arm is field-wise (date + h/m/s + fractional seconds) so it never
    * consults the session timezone — the naive wall time is interpreted
    * as UTC, matching DuckDB's `epoch_ns`. */
  private def tsNanosExpr(tsType: DataType, ts: Column): Column = tsType match {
    case LongType      => ts
    case TimestampType => unix_micros(ts) * 1000L
    case TimestampNTZType =>
      (unix_date(ts.cast("date")).cast(LongType) * 86400000000L
        + hour(ts).cast(LongType) * 3600000000L
        + minute(ts).cast(LongType) * 60000000L
        + (date_part(lit("SECOND"), ts) * 1000000).cast(LongType)) * 1000L
    case other =>
      throw new IllegalArgumentException(
        s"events.ts has unsupported type $other — expected LONG, TIMESTAMP or TIMESTAMP_NTZ")
  }

  /** `ts` → epoch-nanos LongType if the frame has a `ts` column (works
    * on batch and streaming frames alike); no-op otherwise. */
  def tsToNanos(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts") match {
      case Some(f) if f.dataType != LongType =>
        df.withColumn("ts", tsNanosExpr(f.dataType, col("ts")))
      case _ => df
    }

  /** A literal `ts` value (given as epoch nanos) rendered in the same
    * physical type as `tsType` — for writing rows back NEXT TO existing
    * files (schema must match what a re-read of the directory sees). */
  def tsLiteral(tsType: DataType, nanos: Long): Column = tsType match {
    case LongType      => lit(nanos)
    case TimestampType => timestamp_micros(lit(nanos / 1000L))
    case TimestampNTZType =>
      // string→NTZ casts are timezone-free; an LTZ→NTZ cast would
      // consult the session timezone, so format the UTC wall time here
      val micros = nanos / 1000L
      val wall = java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
      lit(wall.toString).cast(TimestampNTZType)
    case other =>
      throw new IllegalArgumentException(s"unsupported ts type $other")
  }

  /** Batch read with the compat confs set and `ts` normalized. */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    prepare(spark)
    tsToNanos(spark.read.parquet(path))
  }
}
