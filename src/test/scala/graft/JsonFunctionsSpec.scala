package graft

import graft.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Semantics tests ported from the reference's integration suite
 * (reference tests/main.rs, 164 cases; the dictionary/Utf8View encoding
 * matrix collapses to plain strings per FIXTURES.md).
 */
class JsonFunctionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  import JsonFunctions._

  /** The reference's 7-row core fixture (tests/utils/mod.rs:32-40),
    * whitespace padding preserved. */
  lazy val testDf: DataFrame = {
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

  private def one(sql: String): Any = spark.sql(sql).collect()(0).get(0)

  // ---- json_contains (tests/main.rs:20-66) ----

  test("json_contains over fixture") {
    val rows = testDf
      .select(col("name"), json_contains(col("json_data"), lit("foo")).as("c"))
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(rows("object_foo"))
    assert(rows("object_foo_array"))
    assert(rows("object_foo_obj"))
    assert(rows("object_foo_null")) // key with null value still contains
    assert(!rows("object_bar"))
    assert(!rows("list_foo"))
    assert(!rows("invalid_json"))
  }

  test("json_contains array + nested") {
    assert(one("select json_contains('[1, 2, 3]', 2)") == true)
    assert(one("select json_contains('[1, 2, 3]', 3)") == false)
    assert(one("""select json_contains('[1, 2, {"foo": null}]', 2)""") == true)
    assert(one("""select json_contains('[1, 2, {"foo": null}]', 2, 'foo')""") == true)
    assert(one("""select json_contains('[1, 2, {"foo": null}]', 2, 'bar')""") == false)
    assert(one("select json_contains(NULL, 'a')") == false)
  }

  // ---- json_get_str ----

  test("json_get_str over fixture") {
    val rows = testDf
      .select(col("name"), json_get_str(col("json_data"), lit("foo")).as("v"))
      .collect().map(r => (r.getString(0), r.get(1))).toMap
    assert(rows("object_foo") == "abc")
    assert(rows("object_foo_array") == null) // array is not a string
    assert(rows("object_foo_null") == null)
    assert(rows("invalid_json") == null)
  }

  test("json_get_str literals and escapes") {
    assert(one("""select json_get_str('["a", "b"]', 1)""") == "b")
    assert(one("""select json_get_str('{"a": 1}', 'a')""") == null) // int not str
    assert(one("""select json_get_str('{"a": "x\\ny"}', 'a')""") == "x\ny")
    assert(one("""select json_get_str('{"a": "\\u00e9"}', 'a')""") == "é")
  }

  // ---- json_get_int / float / bool: string coercions
  //      (src/json_get_int.rs:102-105, src/json_get_bool.rs:76-79) ----

  test("json_get_int semantics") {
    assert(one("select json_get_int('[1, 2, 3]', 1)") == 2L)
    assert(one("""select json_get_int('{"a": 123}', 'a')""") == 123L)
    assert(one("""select json_get_int('{"a": "123"}', 'a')""") == 123L) // string parse
    assert(one("""select json_get_int('{"a": "1.5"}', 'a')""") == null)
    assert(one("""select json_get_int('{"a": 1.5}', 'a')""") == null) // float → null
    assert(one("""select json_get_int('{"a": true}', 'a')""") == null)
    assert(one("""select json_get_int('{"a": 1}', 'b')""") == null)
    assert(one("""select json_get_int('[1]', -1)""") == null) // negative index
  }

  test("json_get_float semantics") {
    assert(one("""select json_get_float('{"a": 1.5}', 'a')""") == 1.5)
    assert(one("""select json_get_float('{"a": 1}', 'a')""") == 1.0) // int coerced
    assert(one("""select json_get_float('{"a": "2.5"}', 'a')""") == 2.5)
    assert(one("""select json_get_float('{"a": true}', 'a')""") == null)
    assert(one("""select json_get_float('{"a": 4.2e-1}', 'a')""") == 0.42)
  }

  test("json_get_bool semantics") {
    assert(one("""select json_get_bool('{"a": true}', 'a')""") == true)
    assert(one("""select json_get_bool('{"a": false}', 'a')""") == false)
    assert(one("""select json_get_bool('{"a": "true"}', 'a')""") == true)
    assert(one("""select json_get_bool('{"a": "True"}', 'a')""") == null) // exact match only
    assert(one("""select json_get_bool('{"a": 1}', 'a')""") == null)
  }

  // ---- json_as_text vs json_get_json null/verbatim split
  //      (tests/main.rs:491-512) ----

  test("json_as_text semantics") {
    assert(one("""select json_as_text('{"a": "abc"}', 'a')""") == "abc")
    assert(one("""select json_as_text('{"a": null}', 'a')""") == null) // JSON null → SQL NULL
    assert(one("""select json_as_text('{"a": 42}', 'a')""") == "42")
    assert(one("""select json_as_text('{"a": true}', 'a')""") == "true")
    assert(one("""select json_as_text('{"a": [1, 2]}', 'a')""") == "[1, 2]") // raw slice
    assert(one("""select json_as_text('{"a": {"b": 1}}', 'a')""") == "{\"b\": 1}")
  }

  test("json_get_json verbatim semantics") {
    assert(one("""select json_get_json('{"a": null}', 'a')""") == "null") // literal text
    assert(one("""select json_get_json('{"a": 4.2e-1}', 'a')""") == "4.2e-1") // notation kept
    assert(one("""select json_get_json('{"a": "abc"}', 'a')""") == "\"abc\"") // quoted
    assert(one("""select json_get_json('{"a": {"b":  1}}', 'a')""") == "{\"b\":  1}")
    assert(one("""select json_get_json('{"a": 1}', 'b')""") == null)
  }

  // ---- json_get_array / json_object_keys / json_length ----

  test("json_get_array raw elements") {
    val got = one("""select json_get_array('[1, "hello", {"a": 1}]')""")
      .asInstanceOf[scala.collection.Seq[String]]
    assert(got == Seq("1", "\"hello\"", "{\"a\": 1}"))
    assert(one("""select json_get_array('{"a": 1}')""") == null)
    assert(one("""select json_get_array('{"a": [1, 2]}', 'a')""")
      .asInstanceOf[scala.collection.Seq[String]] == Seq("1", "2"))
    assert(one("""select json_get_array('[]')""")
      .asInstanceOf[scala.collection.Seq[String]] == Seq())
  }

  test("json_object_keys document order + alias") {
    assert(one("""select json_object_keys('{"b": 1, "a": 2, "b": 3}')""")
      .asInstanceOf[scala.collection.Seq[String]] == Seq("b", "a", "b"))
    assert(one("""select json_keys('{"x": {"y": 1}}', 'x')""")
      .asInstanceOf[scala.collection.Seq[String]] == Seq("y"))
    assert(one("select json_object_keys('[1]')") == null)
  }

  test("json_length semantics + alias") {
    assert(one("select json_length('[1, 2, 3]')") == 3L)
    assert(one("""select json_length('{"a": 1, "b": 2}')""") == 2L)
    assert(one("""select json_len('{"a": [1, 2, 3]}', 'a')""") == 3L)
    assert(one("""select json_length('"abc"')""") == null) // strings have no length
    assert(one("select json_length('42')") == null)
    assert(one("select json_length('[]')") == 0L)
  }

  // ---- duplicate keys: first match wins (src/common.rs:531-539) ----

  test("duplicate keys first match wins") {
    assert(one("""select json_get_int('{"a": 1, "a": 2}', 'a')""") == 1L)
  }

  // ---- json_get union + json_union_to_text ----

  test("json_get union struct members") {
    val r = one("""select json_get('{"a": [1, {"b": 2}]}', 'a')""").asInstanceOf[Row]
    assert(r.getByte(0) == 5) // array member
    assert(r.getString(5) == "[1, {\"b\": 2}]")
    val i = one("""select json_get('{"a": 7}', 'a')""").asInstanceOf[Row]
    assert(i.getByte(0) == 2 && i.getLong(2) == 7L)
    // missing key AND JSON null both collapse to SQL NULL (SURVEY.md §1.4)
    assert(one("""select json_get('{"a": null}', 'a')""") == null)
    assert(one("""select json_get('{"a": 1}', 'b')""") == null)
    assert(one("""select json_get('{"a": null}', 'a') is null""") == true)
  }

  test("json_union_to_text arms (src/json_union_to_text.rs:120-176)") {
    assert(one("""select json_union_to_text(json_get('{"a": "x\\"y"}', 'a'))""") == "\"x\\\"y\"")
    assert(one("""select json_union_to_text(json_get('{"a": 42}', 'a'))""") == "42")
    assert(one("""select json_union_to_text(json_get('{"a": true}', 'a'))""") == "true")
    assert(one("""select json_union_to_text(json_get('{"a": [1,2]}', 'a'))""") == "[1,2]")
    assert(one("""select json_union_to_text(json_get('{"a": null}', 'a'))""") == null)
    assert(one("""select json_union_to_text(json_get('{"a": 1.5}', 'a'))""") == "1.5")
    // whole floats print Rust-style, without the trailing ".0"
    assert(one("""select json_union_to_text(json_get('{"a": 2.0}', 'a'))""") == "2")
  }

  test("json_union_display reference golden form (tests/main.rs:77-91)") {
    assert(one("""select json_union_display(json_get('{"a": "abc"}', 'a'))""") == "{str=abc}")
    assert(one("""select json_union_display(json_get('{"a": 5}', 'a'))""") == "{int=5}")
    assert(one("""select json_union_display(json_get('{"a": 1.5}', 'a'))""") == "{float=1.5}")
    assert(one("""select json_union_display(json_get('{"a": true}', 'a'))""") == "{bool=true}")
    assert(one("""select json_union_display(json_get('{"a": [1]}', 'a'))""") == "{array=[1]}")
    // both JSON-null and missing display as {null=} in the non-dict form
    assert(one("""select json_union_display(json_get('{"a": null}', 'a'))""") == "{null=}")
    assert(one("""select json_union_display(json_get('{"a": 1}', 'b'))""") == "{null=}")
  }

  test("json_from_scalar sweep (tests/main.rs:2261-2906)") {
    assert(one("select json_union_to_text(json_from_scalar(42))") == "42")
    assert(one("select json_union_to_text(json_from_scalar(true))") == "true")
    assert(one("select json_union_to_text(json_from_scalar(1.5))") == "1.5")
    assert(one("select json_union_to_text(scalar_to_json('ab'))") == "\"ab\"")
    assert(one("select json_union_to_text(json_from_scalar(cast(null as int)))") == null)
  }

  test("json_get union display over the 7-row fixture (tests/main.rs:77-91)") {
    val got = testDf
      .select(col("name"), json_union_display(json_get(col("json_data"), lit("foo"))).as("d"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got("object_foo") == "{str=abc}")
    assert(got("object_foo_array") == "{array=[1]}")
    assert(got("object_foo_obj") == "{object={}}")
    assert(got("object_foo_null") == "{null=}")
    assert(got("object_bar") == "{null=}")
    assert(got("list_foo") == "{null=}")
    assert(got("invalid_json") == "{null=}")
  }

  test("json_from_scalar infinity/NaN display + arity errors") {
    assert(one("select json_union_display(json_from_scalar(cast('Infinity' as double)))")
      == "{float=inf}")
    assert(one("select json_union_display(json_from_scalar(cast('-Infinity' as double)))")
      == "{float=-inf}")
    assert(one("select json_union_display(json_from_scalar(cast('NaN' as double)))")
      == "{float=NaN}")
    // exactly-one-argument contract (tests/main.rs test_json_from_scalar_no_args)
    intercept[Exception] { spark.sql("select json_from_scalar()").collect() }
    intercept[Exception] { spark.sql("select json_from_scalar(1, 2)").collect() }
  }

  // ---- chained calls + union input ----

  test("nested json_get chain (column path → no unnest, union input path)") {
    // column-valued path defeats the unnest rule, exercising union input
    val s = spark
    import s.implicits._
    val df = Seq(("""{"foo": {"bar": 7}}""", "foo")).toDF("j", "k")
    val got = df.select(
      json_get_int(json_get(col("j"), col("k")), lit("bar")).as("v")).collect()
    assert(got(0).getLong(0) == 7L)
  }

  // ---- plan rewrites ----

  test("unnest rewrite flattens literal-path chains (src/rewrite.rs:57-91)") {
    val df = spark.sql(
      """select json_get_str(json_get(json_get('{"a": {"b": {"c": "d"}}}', 'a'), 'b'), 'c') as v""")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("json_get(json_get"), plan)
    assert(df.collect()(0).getString(0) == "d")
  }

  test("unnest does not cross json_as_text") {
    // column input so constant folding can't erase the plan shape
    val s = spark
    import s.implicits._
    val df = Seq("""{"a": "{\"b\": \"c\"}"}""").toDF("j")
      .select(json_get_str(json_as_text(col("j"), lit("a")), lit("b")).as("v"))
    // as_text returns the embedded JSON text, which the outer get parses
    assert(df.collect()(0).getString(0) == "c")
    // apply the rule directly (the full optimizer constant-folds local
    // relations away before the plan shape can be observed)
    val after = graft.plans.JsonCallUnnest(df.queryExecution.analyzed).toString
    assert(after.contains("json_as_text"), after)

    // whereas a json_get chain DOES flatten
    val df2 = Seq("""{"a": {"b": 1}}""").toDF("j")
      .select(json_get_int(json_get(col("j"), lit("a")), lit("b")).as("v"))
    assert(df2.collect()(0).getLong(0) == 1L)
    val after2 = graft.plans.JsonCallUnnest(df2.queryExecution.analyzed).toString
    assert(!after2.contains("json_get("), after2)
  }

  test("cast elision rewrites to typed getters (src/rewrite.rs:36-54)") {
    val df = spark.sql("""select cast(json_get('{"a": 1}', 'a') as bigint) as v""")
    // the elision happens during analysis (constant folding erases it from
    // the optimized plan for literal inputs)
    val plan = df.queryExecution.analyzed.toString
    assert(plan.contains("json_get_int"), plan)
    assert(!plan.contains("cast"), plan)
    assert(df.collect()(0).getLong(0) == 1L)

    // ::int of a float value → NULL via json_get_int (tests/main.rs:399-403)
    assert(one("""select cast(json_get('{"a": 1.5}', 'a') as bigint)""") == null)
    assert(one("""select cast(json_get('{"a": 1.5}', 'a') as double)""") == 1.5)
    assert(one("""select cast(json_get('{"a": "x"}', 'a') as string)""") == "x")
    assert(one("""select cast(json_get('{"a": true}', 'a') as boolean)""") == true)
    assert(one("""select cast(json_get('{"a": 1.5}', 'a') as int)""") == null)
    assert(one("""select cast(json_get('{"a": 3}', 'a') as int)""") == 3)
    assert(one("""select cast(json_get('{"a": 2.5}', 'a') as decimal(5,2))""")
      .asInstanceOf[java.math.BigDecimal].doubleValue() == 2.5)
  }

  // ---- operator DSL ----

  test("postgres operator DSL -> ->> ?") {
    val s = spark
    import s.implicits._
    val df = Seq(("""{"foo": {"bar": 7}}""", 1)).toDF("j", "x")
    val r1 = df.select((col("j") -> "foo").jsonGet("bar")).collect()(0).get(0)
    assert(r1.asInstanceOf[Row].getLong(2) == 7L)
    assert(df.select(col("j") ->> "foo").collect()(0).getString(0) == """{"bar": 7}""")
    assert(df.select(col("j") ? "foo").collect()(0).getBoolean(0))
    assert(df.select(col("j") ? "nope").collect()(0).getBoolean(0) == false)
  }

  // ---- column-valued lookup keys (tests/main.rs:2178-2259; fixture `other`) ----

  test("column-valued path args") {
    val s = spark
    import s.implicits._
    val other = Seq(
      (""" {"foo": 42} """, "foo", 0L),
      (""" {"foo": 42} """, "bar", 1L),
      (""" [42] """, "foo", 0L),
      (""" [42] """, "bar", 1L)
    ).toDF("json_data", "str_key", "int_key")
    val byStr = other.select(json_get_int(col("json_data"), col("str_key")))
      .collect().map(_.get(0)).toSeq
    assert(byStr == Seq(42L, null, null, null))
    val byInt = other.select(json_get_int(col("json_data"), col("int_key")))
      .collect().map(_.get(0)).toSeq
    assert(byInt == Seq(null, null, 42L, null))
  }

  test("json_get_array composes with explode (tests/main.rs:2181 unnest)") {
    val got = spark.sql(
      """select explode(json_get_array('[1, "two", {"three": 3}]')) as el""")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("1", "\"two\"", "{\"three\": 3}"))
  }

  test("union_to_text over json_get fuses into one codegen'd kernel") {
    import graft.JsonFunctions.{json_get, json_union_to_text}
    import spark.implicits._
    val df = Seq("""{"s":"a\"b","i":7,"f":1.5,"b":true,"n":null,"o":{"x":1},"a":[1, 2]}""")
      .toDF("j")
    def fused(key: String) =
      df.select(json_union_to_text(json_get(col("j"), lit(key))).as("v"))
    // the optimizer replaces the CodegenFallback pair with the fused kernel
    // (asserted on a parquet-backed plan — local relations constant-fold)
    assert(SparkEntry.queries("q_union_text")(spark, "/root/testdata/sf0.001")
      .queryExecution.optimizedPlan.toString.contains("json_get_union_text"))
    // semantics identical to JsonUnionType.toJsonText: strings re-quoted +
    // escaped, scalars canonical, array/object raw slices, null → NULL
    assert(fused("s").head().getString(0) == "\"a\\\"b\"")
    assert(fused("i").head().getString(0) == "7")
    assert(fused("f").head().getString(0) == "1.5")
    assert(fused("b").head().getString(0) == "true")
    assert(fused("n").head().isNullAt(0))
    assert(fused("o").head().getString(0) == "{\"x\":1}")
    assert(fused("a").head().getString(0) == "[1, 2]") // raw: spacing kept
    assert(fused("missing").head().isNullAt(0))
  }

  // ---- whitespace / invalid / null inputs ----

  test("null and invalid inputs never error") {
    assert(one("select json_get_str(NULL, 'a')") == null)
    assert(one("select json_get_int('', 'a')") == null)
    assert(one("select json_get_str('{\"a\": ', 'a')") == null)
    assert(one("select json_length('[1, 2', 0)") == null)
    assert(one("select json_get_int('{\"a\": 01}', 'a')") == null) // leading zero invalid
  }
}
