package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
