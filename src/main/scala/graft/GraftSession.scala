package graft

import org.apache.spark.sql.SparkSession

/**
 * Recommended session configuration for running graft at scale. Everything
 * here is advisory — the library works on any session — but these are the
 * knobs that decide behavior at the 100 TB design point:
 *
 *  - AQE + skew-join: LSH bucket joins and groupBys on content digests have
 *    long-tailed key distributions; AQE splits the hot partitions at
 *    runtime instead of requiring manual salting.
 *  - `spark.sql.shuffle.partitions` must track cluster parallelism (2-3×
 *    total cores). The 32 default here matches local[32]; a 1000-executor
 *    cluster wants ~8k-16k, or rely on AQE coalescing from a high initial
 *    value.
 *  - `spark.sql.files.maxPartitionBytes` (default 128 MB) bounds scan-task
 *    memory; with wide JSON payload columns keep it there or lower so a
 *    task's batch fits executor memory after decompression.
 *  - nanosAsLong + NTZ inference off: the test tables have shipped ts as
 *    TIMESTAMP(NANOS) and TIMESTAMP(MICROS); both confs together make
 *    either readable with a timezone-independent value (see
 *    sources.Tables.prepare / tsToNanos).
 */
object GraftSession {

  def builder(parallelism: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", parallelism.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // plain parquet timestamps read as LTZ carrying the raw stored
      // micros (no tz conversion) — see sources.Tables.prepare
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")

  /** Local session for tools/examples. */
  def local(cores: Int = 32): SparkSession = {
    val s = builder(cores).master(s"local[$cores]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    JsonFunctions.registerAll(s)
    s
  }
}
