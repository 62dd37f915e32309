package graft

import graft.JsonFunctions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The remaining reference fixtures (FIXTURES.md §3-5): two-level
  * column-valued paths (`more_nested`, `dicts` — dictionary encoding
  * collapses to plain strings in Spark) and nullable inputs (`data`). */
class JsonFixturesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  test("more_nested: two-level column paths (tests/utils/mod.rs:109-149)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (""" {"foo": {"bar": [0]}} """, "foo", "bar", 0L),
      (""" {"foo": {"bar": [1]}} """, "foo", "spam", 0L),
      (""" {"foo": {"bar": null}} """, "foo", "bar", 0L)
    ).toDF("json_data", "str_key1", "str_key2", "int_key")
    val got = df.select(
      json_get_int(col("json_data"), col("str_key1"), col("str_key2"), col("int_key")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    assert(got == Seq(0L, null, null))
  }

  test("dicts rows as plain strings (tests/utils/mod.rs:151-235)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (""" {"foo": {"bar": [0]}} """, "foo", "bar", 0L),
      (""" {"bar": "snap"} """, "foo", "spam", 0L),
      (""" {"spam": 1, "snap": 2} """, "foo", "spam", 0L),
      (""" {"spam": 1, "snap": 2} """, "foo", "snap", 0L)
    ).toDF("json_data", "str_key1", "str_key2", "int_key")
    // single-level lookup with the second key column
    val got = df.select(json_get_int(col("json_data"), col("str_key2")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    assert(got == Seq(null, null, 1L, 2L))
  }

  test("nullable json column (tests/main.rs:1970-2001 data fixture)") {
    val s = spark
    import s.implicits._
    val rows: Seq[Option[String]] = Seq(
      Some("""{"foo": "bar"}"""), Some("""{"baz": "fizz"}"""), Some("nah"),
      Some("""{"baz": "abcd"}"""), None, Some("""{"baz": "fizz"}"""),
      Some("""{"baz": "fizz"}"""), Some("""{"baz": "fizz"}"""),
      Some("""{"baz": "fizz"}"""), None)
    val df = rows.toDF("x")
    val got = df.select(json_get_str(col("x"), org.apache.spark.sql.functions.lit("baz")))
      .collect().map(r => Option(r.getString(0))).toSeq
    assert(got == Seq(None, Some("fizz"), None, Some("abcd"), None,
      Some("fizz"), Some("fizz"), Some("fizz"), Some("fizz"), None))
    // contains over nullable input: never NULL
    val c = df.select(json_contains(col("x"), org.apache.spark.sql.functions.lit("baz")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(c == Seq(false, true, false, true, false, true, true, true, true, false))
  }

  test("json_contains with the json column as its own path arg (tests/main.rs:598-616)") {
    val s = spark
    import s.implicits._
    val df = Seq("""{"foo": 1}""").toDF("j")
    // path arg is a whole JSON doc string — just a key that doesn't exist
    assert(!df.select(json_contains(col("j"), col("j"))).collect()(0).getBoolean(0))
  }
}
