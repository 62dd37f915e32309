package graft

import graft.JsonFunctions._
import org.apache.spark.sql.functions.{col, lit, split, typedlit}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins round-2 additions and the DELIBERATE divergences from the
 * reference, so they are asserted behavior rather than prose notes:
 *
 *  - multi-COLUMN path arguments are an error in the reference
 *    (reference src/common.rs:106-141, tests/main.rs:1095-1103
 *    "More than 1 path element is not supported when querying JSON using
 *    an array") but are ALLOWED here — Spark's row-expression model
 *    evaluates column paths per row at no extra cost, so refusing them
 *    would be artificial;
 *  - ints that overflow i64 degrade to double (the reference's Rust
 *    parser errors the whole document);
 *  - a missing key and an explicit JSON null collapse to one SQL NULL
 *    (observable behavior identical to the union's null member —
 *    SURVEY §1.4).
 */
class DivergenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("divergence: multiple column path args are allowed (reference errors)") {
    val df = Seq(
      ("""{"a":{"b":1}}""", "a", "b"),
      ("""{"a":{"b":2}}""", "a", "b"),
      ("""{"x":{"y":3}}""", "x", "y"))
      .toDF("j", "k1", "k2")
    val out = df.select(
      json_get_int(col("j"), col("k1"), col("k2")).as("v")).as[Long].collect()
    assert(out.toSeq == Seq(1L, 2L, 3L))
    // reference behavior for the SAME query shape: execution error
    // ("More than 1 path element is not supported ... using an array") —
    // this suite documents that we intentionally return values instead
  }

  test("divergence: i64-overflow integers degrade to double, not error") {
    val big = "92233720368547758079" // > Long.MaxValue
    val df = Seq(s"""{"n":$big}""").toDF("j")
    // typed int lookup: no long representation → NULL (reference panics the
    // whole document; we keep the row and return NULL for the typed getter)
    assert(df.select(json_get_int(col("j"), lit("n"))).head().isNullAt(0))
    // float lookup sees the double approximation
    val d = df.select(json_get_float(col("j"), lit("n"))).head().getDouble(0)
    assert(math.abs(d - 9.2233720368547758e19) / 9.2233720368547758e19 < 1e-12)
  }

  test("divergence: missing key and JSON null collapse to one SQL NULL") {
    val df = Seq("""{"a":null}""").toDF("j")
    assert(df.select(json_get_str(col("j"), lit("a"))).head().isNullAt(0))
    assert(df.select(json_get_str(col("j"), lit("b"))).head().isNullAt(0))
    // but json_contains still distinguishes presence (reference semantics)
    assert(df.select(json_contains(col("j"), lit("a"))).head().getBoolean(0))
    assert(!df.select(json_contains(col("j"), lit("b"))).head().getBoolean(0))
  }

  test("raw-JSON outputs carry the reference's arrow.json field metadata") {
    // reference src/json_get_json.rs:49-55 + src/common_union.rs:27-34:
    // canonical ARROW:extension:name=arrow.json (+ legacy is_json)
    val df = Seq("""{"a":{"b":1}}""").toDF("j")
    for (c <- Seq(
        json_get_json(col("j"), lit("a")).as("out"),
        json_union_to_text(json_get(col("j"), lit("a"))).as("out"))) {
      val field = df.select(c).schema.fields.head
      assert(field.metadata.getString("ARROW:extension:name") == "arrow.json")
      assert(field.metadata.getString("ARROW:extension:metadata") == "{}")
      assert(field.metadata.getString("is_json") == "true")
    }
  }

  test("SQL-text operators run through plain spark.sql behind the conf flag") {
    spark.conf.set(GraftSqlParser.ConfKey, "true")
    try {
      val rows = spark.sql(
        """SELECT j -> 'a' IS NOT NULL AS has, j ->> 'a' AS txt, j ? 'a' AS c
          |FROM (SELECT '{"a":42}' AS j)""".stripMargin).head()
      assert(rows.getBoolean(0) && rows.getString(1) == "42" && rows.getBoolean(2))
    } finally spark.conf.set(GraftSqlParser.ConfKey, "false")
    // flag off: the operator text is NOT intercepted (j -> 'a' is a lambda
    // to Spark's parser and fails to resolve — proving we didn't rewrite)
    intercept[Exception] {
      spark.sql("SELECT j -> 'a' FROM (SELECT '{\"a\":1}' AS j)").collect()
    }
  }

  test("mix_bucket matches mod-2^64 semantics at snowflake-scale ids (ANSI-safe)") {
    val M = BigInt(1) << 64
    def expected(id: Long): Long =
      (((BigInt(id) * 2654435761L + 9973L).mod(M)) >> 20).toLong % 1000
    val ids = Seq(0L, 1L, 3500000000L, 912345678901234567L,
      Long.MaxValue, 1234567890123456789L)
    val got = ids.toDF("id")
      .select(operators.mix_bucket(col("id"), 2654435761L, 9973L, 20, 1000))
      .as[Long].collect()
    assert(got.toSeq == ids.map(expected))

    // the whole mixSources operator runs on huge ids under default ANSI
    val docs = Seq((912345678901234567L, "srcA"), (Long.MaxValue - 7, "srcB"))
      .toDF("doc_id", "source")
    val kept = operators.Curation.mixSources(
      docs, "doc_id", "source", Map("srcA" -> 1.0, "srcB" -> 1.0))
    assert(kept.count() == 2) // weight 1.0 keeps everything; no overflow error
  }

  test("vector kernels return NULL on NULL array elements") {
    import org.apache.spark.sql.functions.array
    val df = Seq(1).toDF("one")
    val aNull = array(lit(1.0), lit(null).cast("double"), lit(3.0))
    val b = array(lit(1.0), lit(2.0), lit(3.0))
    assert(df.select(operators.cosine_similarity(aNull, b)).head().isNullAt(0))
    assert(df.select(operators.Similarity.srpBucket(aNull, 4, 3)).head().isNullAt(0))
    val xNull = array(lit(1L), lit(null).cast("bigint"))
    val y = array(lit(1L), lit(2L))
    val agree = org.apache.spark.sql.graft.GraftSqlShim.column(
      operators.SigAgreement(
        org.apache.spark.sql.graft.GraftSqlShim.expression(xNull),
        org.apache.spark.sql.graft.GraftSqlShim.expression(y)))
    assert(df.select(agree).head().isNullAt(0))
  }

  test("LSH banding parameters are validated loudly") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      operators.Dedup.minhashCandidatePairs(df, "doc_id", "text",
        numHashes = 16, bands = 32) // bands > numHashes → rowsPerBand 0
    }
    intercept[IllegalArgumentException] {
      operators.Dedup.minhashCandidatePairs(df, "doc_id", "text",
        numHashes = 16, bands = 3) // non-divisible → dropped components
    }
    intercept[IllegalArgumentException] {
      operators.Dedup.simhashNearDupPairs(df, "doc_id", "text", maxHamming = 64)
    }
  }
}
