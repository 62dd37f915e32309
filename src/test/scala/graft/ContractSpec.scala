package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the driver contract (SparkEntry/Verify/Bench) — these
  * failing silently would zero a round's correctness or bench score. */
class ContractSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query has a value-level oracle — no rows-only rows") {
    // Round-2 invariant: every kernel family has a DuckDB replica. A new
    // query without an oracle silently downgrades to a rows-only check —
    // make that a deliberate decision, not an omission.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  test("every headline bench query exists") {
    val missing = SparkEntry.headlineQueries.toSet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"headline names without queries: $missing")
    assert(SparkEntry.headlineQueries.distinct.size == SparkEntry.headlineQueries.size)
  }

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query builds; all but the sparse near-dup ones return rows at sf0.001") {
    // near-dup pair queries can be legitimately empty on 500 tiny docs
    val mayBeEmpty = Set("q_minhash_lsh", "q_embed_neardup")
    val failures = SparkEntry.queries.flatMap { case (name, fn) =>
      try {
        val n = fn(spark, "/root/testdata/sf0.001").count()
        if (n == 0 && !mayBeEmpty(name)) Some(s"$name: returned 0 rows") else None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("documents corpus is ASCII — the byte-fold oracles assume it") {
    // fnvSql/simhash/mm_* oracles index DuckDB VARCHARs by CHARACTER while
    // the Scala kernels fold BYTES; those agree only for ASCII. The test
    // corpora are ASCII by construction — if a future regen ever isn't,
    // fail HERE loudly instead of as a mysterious oracle hash mismatch.
    for (sf <- Seq("sf0.001", "sf0.01")) {
      val docs = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
      val nonAscii = docs
        .where(org.apache.spark.sql.functions.length(org.apache.spark.sql.functions.col("text")) !==
          org.apache.spark.sql.functions.octet_length(org.apache.spark.sql.functions.col("text")))
        .count()
      assert(nonAscii == 0, s"$sf has $nonAscii non-ASCII documents")
    }
  }

  test("oracle SQL is single-line and DuckDB-parseable punctuation-wise") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\n"), s"$name oracle contains a newline")
      assert(sql.count(_ == '(') == sql.count(_ == ')'), s"$name unbalanced parens")
    }
  }
}
