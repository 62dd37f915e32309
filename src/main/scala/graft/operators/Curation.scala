package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end training-data curation: the composition a 100 TB pipeline
 * actually runs, in one declarative flow —
 *
 *   annotate (stats, quality, language, fingerprint)   narrow, scan-speed
 *   → exact dedup        (one shuffle on content digest)
 *   → near dedup         (MinHash LSH; shuffle on band buckets)
 *   → quality filter     (narrow)
 *
 * Every stage is a DataFrame transform: no driver-side loops, no
 * collects; the only shuffles are the two dedup keys and they are both
 * fine-grained hash keys (AQE-splittable).
 */
object Curation {

  /** Per-document annotations used by filtering and audit. */
  def annotate(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol),
      col(textCol),
      TextOps.charLength(col(textCol)).as("n_chars_calc"),
      TextOps.tokenCount(col(textCol)).as("n_tokens"),
      TextOps.stopwordRatio(col(textCol)).as("stopword_ratio"),
      TextOps.qualityScore(col(textCol)).as("quality"),
      TextOps.langId(col(textCol)).as("pred_lang"),
      TextOps.fingerprint(col(textCol)).as("fp"))

  /** Full pipeline; returns surviving documents with annotations. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.25,
      nearDupThreshold: Double = 0.8): DataFrame = {
    val annotated = annotate(docs, idCol, textCol)

    // exact dedup: keep the smallest id per content digest
    val keepers = Dedup.exactDuplicates(docs, textCol, idCol)
      .select(col("keep_id").as(idCol))
    val exactDeduped = annotated.join(keepers, idCol)

    // near dedup: LSH candidate pairs above threshold; drop the larger id
    val losers = Dedup.minhashCandidatePairs(
        docs, idCol, textCol, threshold = nearDupThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val nearDeduped = exactDeduped.join(losers, Seq(idCol), "left_anti")

    nearDeduped.where(col("quality") >= minQuality)
  }
}
