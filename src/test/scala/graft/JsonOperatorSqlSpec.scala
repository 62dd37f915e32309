package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The opt-in SQL operator translator: reference-style `->`/`->>`/`?`
  * SQL runs verbatim through rewrite + spark.sql. */
class JsonOperatorSqlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark
  import JsonOperatorSql.rewrite

  test("basic rewrites") {
    assert(rewrite("select j->'a' from t") == "select json_get(j, 'a') from t")
    assert(rewrite("select j->>'a' from t") == "select json_as_text(j, 'a') from t")
    assert(rewrite("select j?'a' from t") == "select json_contains(j, 'a') from t")
    assert(rewrite("select t.j -> 'a' from t") == "select json_get(t.j, 'a') from t")
    assert(rewrite("select `my col` ->> 'a' from t")
      == "select json_as_text(`my col`, 'a') from t")
    // a leading integer RHS is ambiguous with a Spark lambda — never touched
    assert(rewrite("select j -> 0 from t") == "select j -> 0 from t")
    assert(rewrite("select transform(arr, x -> 0) from t")
      == "select transform(arr, x -> 0) from t")
  }

  test("chains left-fold like postgres") {
    assert(rewrite("select j->'a'->>'b' from t")
      == "select json_as_text(json_get(j, 'a'), 'b') from t")
    // integer indices allowed from the second chain step on
    assert(rewrite("select j->'a'->0->'c' from t")
      == "select json_get(json_get(json_get(j, 'a'), 0), 'c') from t")
  }

  test("operators inside string literals are untouched") {
    assert(rewrite("select '-> not an op' , j->'a' from t")
      == "select '-> not an op' , json_get(j, 'a') from t")
    assert(rewrite("select 'it''s ? quoted' from t")
      == "select 'it''s ? quoted' from t")
    // apostrophes in comments must not desync the scanner
    assert(rewrite("select j->'a' from t -- don't\nwhere j ? 'k'")
      == "select json_get(j, 'a') from t -- don't\nwhere json_contains(j, 'k')")
    assert(rewrite("select /* j->'x' */ j->'a' from t")
      == "select /* j->'x' */ json_get(j, 'a') from t")
  }

  test("parameter markers and unknown shapes are left alone") {
    assert(rewrite("select * from t where x = ?") == "select * from t where x = ?")
    assert(rewrite("select f(x) -> 'a' from t") == "select f(x) -> 'a' from t") // call LHS unsupported
    assert(rewrite("select j ? x from t") == "select j ? x from t") // non-literal RHS
  }

  test("reference-style SQL runs end-to-end") {
    val s = spark
    import s.implicits._
    Seq(("""{"foo": {"bar": 7}}""")).toDF("json_data")
      .createOrReplaceTempView("optest")
    val r1 = spark.sql(rewrite(
      "select json_data->'foo'->>'bar' as v, json_data?'foo' as c from optest"))
      .collect()(0)
    assert(r1.getString(0) == "7")
    assert(r1.getBoolean(1))
    // the rewritten chain also goes through the unnest rule
    val r2 = spark.sql(rewrite(
      "select cast(json_data->'foo'->'bar' as bigint) as v from optest")).collect()(0)
    assert(r2.getLong(0) == 7L)
  }
}
