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
}
