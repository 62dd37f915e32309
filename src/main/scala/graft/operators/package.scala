package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.GraftSqlShim

package object operators {
  /** Column wrappers for the native kernel expressions. */
  def cosine_similarity(a: Column, b: Column): Column =
    GraftSqlShim.column(CosineSimilarity(GraftSqlShim.expression(a), GraftSqlShim.expression(b)))

  def simhash64(tokens: Column): Column =
    GraftSqlShim.column(SimHash64(GraftSqlShim.expression(tokens)))

  def fnv1a64(s: Column): Column =
    GraftSqlShim.column(Fnv1a64(GraftSqlShim.expression(s)))

  def mix_bucket(id: Column, multiplier: Long, salt: Long, shift: Int, buckets: Int): Column =
    GraftSqlShim.column(
      MixBucket(GraftSqlShim.expression(id), multiplier, salt, shift, buckets))

  def mix64(id: Column, salt: Long): Column =
    GraftSqlShim.column(Mix64(GraftSqlShim.expression(id), salt))

  def gram_rep_stats(tokens: Column, n: Int): Column =
    GraftSqlShim.column(GramRepStats(GraftSqlShim.expression(tokens), n))

  def hashed_linear_score(tokens: Column, buckets: Int): Column =
    GraftSqlShim.column(HashedLinearScore(GraftSqlShim.expression(tokens), buckets))

  def marker_lang_id(tokens: Column, profiles: Seq[(String, Seq[String])]): Column =
    GraftSqlShim.column(MarkerLangId(GraftSqlShim.expression(tokens), profiles))

  def math_ln(x: Column): Column =
    GraftSqlShim.column(MathLn(GraftSqlShim.expression(x)))

  def log2fp(f: Column): Column =
    GraftSqlShim.column(Log2Fp(GraftSqlShim.expression(f)))

  def tokenLevenshtein(a: Column, b: Column, maxDist: Int): Column =
    GraftSqlShim.column(TokenLevenshtein(
      GraftSqlShim.expression(a), GraftSqlShim.expression(b), maxDist))

  def dsir_score(tokens: Column, weights: Array[Double]): Column =
    GraftSqlShim.column(DsirScore(GraftSqlShim.expression(tokens), weights))

  def pq_encode(vec: Column, codebooks: Seq[Seq[Seq[Float]]]): Column =
    GraftSqlShim.column(PqEncode(GraftSqlShim.expression(vec), codebooks))

  def pq_adc_score(codes: Column, table: Seq[Seq[Double]]): Column =
    GraftSqlShim.column(PqAdcScore(GraftSqlShim.expression(codes), table))

  def ivf_pq_encode(vec: Column, cell: Column,
      centroids: Seq[Seq[Float]], codebooks: Seq[Seq[Seq[Float]]]): Column =
    GraftSqlShim.column(IvfPqEncode(
      GraftSqlShim.expression(vec), GraftSqlShim.expression(cell), centroids, codebooks))

  /** OPTIMIZATION r16 — unsplittable-input skew fix (guide §2.5): if a
    * frame is planned with fewer partitions than half the session's
    * default parallelism (the single-row-group verify parquet files
    * scan as ONE task), hash-repartition it on `key` so a CPU-heavy
    * per-row stage downstream (token explode, training counts) can use
    * every core; otherwise return it unchanged, so well-partitioned
    * production scans never pay the extra exchange. */
  private[graft] def spreadIfNarrow(
      df: org.apache.spark.sql.DataFrame, key: String): org.apache.spark.sql.DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= n) df
    else df.repartition(n, org.apache.spark.sql.functions.col(key))
  }

  /** Release the executor blocks behind a `localCheckpoint()`'d frame.
    * A local checkpoint pins its RDD at MEMORY_AND_DISK and the cache
    * manager never sees it, so superseded iteration checkpoints in the
    * Pregel-style loops would otherwise accumulate until driver GC gets
    * around to them — unbounded pinned storage at high iteration counts.
    * No-op for frames that are not local checkpoints. */
  private[graft] def releaseLocalCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
