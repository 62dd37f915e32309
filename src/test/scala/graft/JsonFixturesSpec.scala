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

  test("json_get with no path + cast elision (tests/main.rs test_json_get_no_path)") {
    def one(sql: String): Any = spark.sql(sql).collect()(0).get(0)
    assert(one("""select cast(json_get('"foo"') as string)""") == "foo")
    assert(one("""select cast(json_get('123') as bigint)""") == 123L)
    assert(one("""select cast(json_get('true') as bigint)""") == null)
  }

  test("comparing a union to a scalar fails analysis (test_json_get_equals)") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("""select json_get('{"a": "abc"}', 'a') = 'abc'""").collect()
    }
    assert(e.getMessage.toLowerCase.contains("data type mismatch") ||
      e.getMessage.toLowerCase.contains("cannot resolve"), e.getMessage)
  }

  test("double-nested chain with column keys (test_json_get_union_array_skip_double_nested)") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (""" {"foo": {"bar": [0]}} """, "foo", "bar", 0L),
      (""" {"foo": {"bar": [1]}} """, "foo", "spam", 0L),
      (""" {"foo": {"bar": null}} """, "foo", "bar", 0L)
    ).toDF("json_data", "str_key1", "str_key2", "int_key")
    val got = df.select(
      json_get_int(
        json_get(json_get(col("json_data"), col("str_key1")), col("str_key2")),
        col("int_key")))
      .collect().map(r => if (r.isNullAt(0)) null else r.getLong(0)).toSeq
    assert(got == Seq(0L, null, null))
  }

  test("multiple column path args are supported (superset of the reference)") {
    // the reference ERRORS on >1 array path arg (tests/main.rs:1095-1103,
    // a kernel-dispatch limitation); row-at-a-time evaluation has no such
    // restriction, so this engine deliberately accepts it
    val s = spark
    import s.implicits._
    val df = Seq((""" {"a": {"b": 7}} """, "a", "b")).toDF("j", "k1", "k2")
    val got = df.select(json_get_int(col("j"), col("k1"), col("k2"))).collect()(0)
    assert(got.getLong(0) == 7L)
  }

  test("json_get_array variants (tests/main.rs array family)") {
    def one(sql: String): Any = spark.sql(sql).collect()(0).get(0)
    def arr(sql: String): Seq[String] =
      one(sql).asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(arr("""select json_get_array('[1, 2, 3]')""") == Seq("1", "2", "3"))
    assert(arr("""select json_get_array('["hello", 42, true, null, 3.14]')""")
      == Seq("\"hello\"", "42", "true", "null", "3.14"))
    assert(arr("""select json_get_array('[{"a": 1}, {"b": 2}]')""")
      == Seq("{\"a\": 1}", "{\"b\": 2}"))
    assert(arr("""select json_get_array('[[1, 2], [3]]')""")
      == Seq("[1, 2]", "[3]"))
    assert(one("select json_get_array('is not json')") == null)
    assert(one("select json_get_array('42')") == null)
  }

  test("nested collapsed + CTE chains over the fixture (tests/main.rs:2150+)") {
    testDfFixture.createOrReplaceTempView("test_fixture")
    // direct chain: json_get(json_get(j,'foo'), 0) — display forms
    val direct = spark.sql(
      """select name, json_union_display(json_get(json_get(json_data, 'foo'), 0)) v
        |from test_fixture""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(direct("object_foo") == "{null=}")     // "abc" has no index 0
    assert(direct("object_foo_array") == "{int=1}")
    assert(direct("object_foo_obj") == "{null=}")
    assert(direct("invalid_json") == "{null=}")
    // CTE breaks the unnest rewrite; semantics must be identical
    val cte = spark.sql(
      """with t as (select name, json_get(json_data, 'foo') j from test_fixture)
        |select name, json_union_display(json_get(j, 0)) v from t""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(cte == direct)
  }

  lazy val testDfFixture: org.apache.spark.sql.DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      ("object_foo", " {\"foo\": \"abc\"} "),
      ("object_foo_array", " {\"foo\": [1]} "),
      ("object_foo_obj", " {\"foo\": {}} "),
      ("object_foo_null", " {\"foo\": null} "),
      ("object_bar", " {\"bar\": true} "),
      ("list_foo", " [\"foo\"] "),
      ("invalid_json", "is not json")
    ).toDF("name", "json_data")
  }

  test("the reference README examples run verbatim (README.md:19-82)") {
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW readme_table AS SELECT * FROM VALUES
        |(1, '{}'), (2, '{ "a": 1 }'), (3, '{ "a": 2 }'),
        |(4, '{ "a": 1, "b": 2 }'), (5, '{ "a": 1, "b": 2, "c": 3 }')
        |AS t(id, json_col)""".stripMargin)
    val contains = spark.sql(
      "SELECT id, json_contains(json_col, 'b') as json_contains FROM readme_table")
      .collect().map(r => (r.getInt(0), r.getBoolean(1))).toMap
    assert(contains == Map(1 -> false, 2 -> false, 3 -> false, 4 -> true, 5 -> true))

    // the `->` form through PLAIN spark.sql — one conf flag turns on the
    // parser-level translation (no manual rewrite() call)
    spark.conf.set(GraftSqlParser.ConfKey, "true")
    val gets = try {
      spark.sql(
        "SELECT id, json_union_display(json_col->'a') as json_col_a FROM readme_table")
        .collect().map(r => (r.getInt(0), r.getString(1))).toMap
    } finally spark.conf.set(GraftSqlParser.ConfKey, "false")
    assert(gets == Map(1 -> "{null=}", 2 -> "{int=1}", 3 -> "{int=2}",
      4 -> "{int=1}", 5 -> "{int=1}"))

    // the cast-rewrite example: json_get(..)::string = 'ham'
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW readme_foo AS SELECT * FROM VALUES
        |('{"bar": "ham"}'), ('{"bar": "spam"}'), ('nope')
        |AS t(attributes)""".stripMargin)
    val filtered = spark.sql(
      "select * from readme_foo where cast(json_get(attributes, 'bar') as string)='ham'")
    assert(filtered.count() == 1)
    // and the rewrite actually produced json_get_str, as the README promises
    assert(filtered.queryExecution.analyzed.toString.contains("json_get_str"))
  }
}
