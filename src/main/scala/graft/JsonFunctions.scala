package graft

import graft.functions._
import graft.plans.{JsonCallUnnest, JsonCastElision}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graft.GraftSqlShim

/**
 * Public façade of the engine: the 13 JSON functions as a typed Column API,
 * SQL registration (all names + aliases, mirroring the reference's
 * `register_all` in src/lib.rs:69-96), the two optimizer rewrites, and the
 * PostgreSQL-operator DSL (`->`, `->>`, `?` — reference src/rewrite.rs:105-144;
 * Spark SQL has no such operators, so they're Scala Column methods).
 */
object JsonFunctions {

  /** name → expression builder, including aliases json_len / json_keys /
    * scalar_to_json (reference src/json_length.rs:29,
    * src/json_object_keys.rs:29, src/json_from_scalar.rs:31). */
  val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "json_get" -> (JsonGet(_)),
    "json_get_str" -> (JsonGetStr(_)),
    "json_get_int" -> (JsonGetInt(_)),
    "json_get_float" -> (JsonGetFloat(_)),
    "json_get_bool" -> (JsonGetBool(_)),
    "json_get_json" -> (JsonGetJson(_)),
    "json_get_array" -> (JsonGetArray(_)),
    "json_as_text" -> (JsonAsText(_)),
    "json_contains" -> (JsonContains(_)),
    "json_length" -> (JsonLength(_)),
    "json_len" -> (JsonLength(_)),
    "json_object_keys" -> (JsonObjectKeys(_)),
    "json_keys" -> (JsonObjectKeys(_)),
    "json_from_scalar" -> (es => JsonFromScalar(exactlyOne("json_from_scalar", es))),
    "scalar_to_json" -> (es => JsonFromScalar(exactlyOne("scalar_to_json", es))),
    "json_union_to_text" -> (es => JsonUnionToText(exactlyOne("json_union_to_text", es))),
    "json_union_display" -> (es => JsonUnionDisplay(exactlyOne("json_union_display", es))))

  /** Reference: json_from_scalar takes exactly one argument — zero or many
    * is a planning error (tests/main.rs test_json_from_scalar_no_args /
    * _too_many_args). */
  private def exactlyOne(name: String, es: Seq[Expression]): Expression = {
    if (es.length != 1) {
      throw new IllegalArgumentException(
        s"$name requires exactly 1 argument, got ${es.length}")
    }
    es.head
  }

  /** Kernel expressions from the pipeline-operator layer, exposed to SQL
    * as well (int parameters must be literals). */
  val operatorRegistry: Seq[(String, Seq[Expression] => Expression)] = {
    import graft.operators._
    import org.apache.spark.sql.catalyst.expressions.Literal
    def litInt(e: Expression, what: String): Int = e match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    def litLong(e: Expression, what: String): Long = e match {
      case Literal(v: Long, _) => v
      case Literal(v: Int, _) => v.toLong
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    Seq(
      "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
      "simhash64" -> (es => SimHash64(es.head)),
      "fnv1a64" -> (es => Fnv1a64(es.head)),
      "minhash_signature" -> (es => MinHashSignature(es(0),
        litInt(es(1), "shingle size"), litInt(es(2), "num hashes"))),
      "sig_agreement" -> (es => SigAgreement(es(0), es(1))),
      "mix_bucket" -> (es => MixBucket(es(0), litLong(es(1), "multiplier"),
        litLong(es(2), "salt"), litInt(es(3), "shift"), litInt(es(4), "buckets"))),
      "mix64" -> (es => Mix64(es(0), litLong(es(1), "salt"))),
      "gram_rep_stats" -> (es => GramRepStats(es(0), litInt(es(1), "gram size"))),
      "hashed_linear_score" -> (es => HashedLinearScore(es(0), litInt(es(1), "buckets"))),
      "sq_encode" -> (es => SqEncode(es(0), es(1) match {
        case Literal(v: Float, _) => v
        case Literal(v: Double, _) => v.toFloat
        case Literal(v: Int, _) => v.toFloat
        // SQL decimal literals (2.0) arrive as Decimal, not Double
        case Literal(v: org.apache.spark.sql.types.Decimal, _) => v.toFloat
        case other => throw new IllegalArgumentException(
          s"absmax must be a numeric literal, got $other")
      })),
      "int_dot" -> (es => IntDot(es(0), es(1))),
      "unicode_normalize" -> (es => UnicodeNormalize(es(0), es(1) match {
        case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => v.toString
        case other => throw new IllegalArgumentException(
          s"form must be a string literal, got $other")
      })),
      "fix_mojibake" -> (es => FixMojibake(es(0))),
      "gear_cutpoints" -> (es => GearCutpoints(es(0), litInt(es(1), "maskBits"),
        litInt(es(2), "minLen"), litInt(es(3), "maxLen"))),
      // aggregate: the analyzer wraps a bare AggregateFunction from the
      // registry in an AggregateExpression during function resolution
      "bloom_build" -> (es => BloomBuildAgg(es(0),
        litLong(es(1), "numBits"), litInt(es(2), "numHashes"))),
      "bloom_might_contain" -> (es => BloomMightContain(es(0), es(1))),
      "bloom_count_contained" -> (es => BloomCountContained(es(0), es(1),
        litInt(es(2), "shingle size"))))
  }

  val optimizerRules = Seq(JsonCallUnnest, graft.plans.JsonUnionTextFusion)

  /** Register everything on a live session (idempotent).
    *
    * LIMITATION of this path: `CAST(json_get(...) AS T)` elision is an
    * ANALYZER rule (CheckAnalysis rejects struct casts before any
    * optimizer rule runs) and analyzer rules cannot be injected into a
    * live session — SQL casts of json_get require the config path
    * `spark.sql.extensions=graft.GraftExtensions`. The typed getters
    * (json_get_int & co) work identically on both paths. */
  def registerAll(spark: SparkSession): Unit = {
    (registry ++ operatorRegistry).foreach { case (name, builder) =>
      GraftSqlShim.register(spark, name, builder)
    }
    val existing = spark.experimental.extraOptimizations
    val missing = optimizerRules.filterNot(existing.contains)
    if (missing.nonEmpty) {
      spark.experimental.extraOptimizations = existing ++ missing
    }
  }

  // ---- typed Column API (entry point 2 of the reference, src/lib.rs:28-42) ----

  /** Field metadata the reference attaches to raw-JSON output columns
    * (src/common_union.rs:27-34 `json_field_metadata`): the canonical
    * `arrow.json` extension-type keys plus the legacy `is_json` marker.
    * Spark's StructField metadata is the analogous channel; the Column API
    * carries it (the SQL-function path cannot — Spark function registries
    * return bare expressions, not named fields; a known divergence). */
  val jsonFieldMetadata: org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putString("ARROW:extension:name", "arrow.json")
      .putString("ARROW:extension:metadata", "{}")
      .putString("is_json", "true")
      .build()

  private def ex(c: Column): Expression = GraftSqlShim.expression(c)
  private def col(e: Expression): Column = GraftSqlShim.column(e)
  private def build(json: Column, path: Seq[Column])(
      f: Seq[Expression] => Expression): Column =
    col(f(ex(json) +: path.map(ex)))

  def json_get(json: Column, path: Column*): Column = build(json, path)(JsonGet(_))
  def json_get_str(json: Column, path: Column*): Column = build(json, path)(JsonGetStr(_))
  def json_get_int(json: Column, path: Column*): Column = build(json, path)(JsonGetInt(_))
  def json_get_float(json: Column, path: Column*): Column = build(json, path)(JsonGetFloat(_))
  def json_get_bool(json: Column, path: Column*): Column = build(json, path)(JsonGetBool(_))
  def json_get_json(json: Column, path: Column*): Column =
    GraftSqlShim.columnWithMetadata(
      JsonGetJson(ex(json) +: path.map(ex)), jsonFieldMetadata)
  def json_get_array(json: Column, path: Column*): Column = build(json, path)(JsonGetArray(_))
  def json_as_text(json: Column, path: Column*): Column = build(json, path)(JsonAsText(_))
  def json_contains(json: Column, path: Column*): Column = build(json, path)(JsonContains(_))
  def json_length(json: Column, path: Column*): Column = build(json, path)(JsonLength(_))
  def json_object_keys(json: Column, path: Column*): Column =
    build(json, path)(JsonObjectKeys(_))
  def json_from_scalar(v: Column): Column = col(JsonFromScalar(ex(v)))
  def json_union_to_text(v: Column): Column =
    GraftSqlShim.columnWithMetadata(JsonUnionToText(ex(v)), jsonFieldMetadata)
  def json_union_display(v: Column): Column = col(JsonUnionDisplay(ex(v)))

  // ---- operator DSL ----

  /** Literal-ish path argument: Int/Long indices and String keys, or a
    * Column for column-valued lookups. */
  private def pathCol(p: Any): Column = p match {
    case c: Column => c
    case s: String => org.apache.spark.sql.functions.lit(s)
    case i: Int    => org.apache.spark.sql.functions.lit(i)
    case l: Long   => org.apache.spark.sql.functions.lit(l)
    case other     => org.apache.spark.sql.functions.lit(other)
  }

  /** Pretty operator-style output naming, mirroring the reference's alias
    * rule for `a -> 'b'` headers (src/rewrite.rs:146-171). */
  private def opAlias(op: String, json: Column, p: Any): String = {
    val rhs = p match {
      case s: String => s"'$s'"
      case other     => other.toString
    }
    s"$json $op $rhs"
  }

  implicit class JsonColumnOps(private val c: Column) extends AnyVal {

    /** Postgres `json -> path`: json_get. */
    def ->(p: Any): Column =
      json_get(c, pathCol(p)).alias(opAlias("->", c, p))

    /** Postgres `json ->> path`: json_as_text. */
    def ->>(p: Any): Column =
      json_as_text(c, pathCol(p)).alias(opAlias("->>", c, p))

    /** Postgres `json ? key`: json_contains. */
    def ?(p: Any): Column =
      json_contains(c, pathCol(p)).alias(opAlias("?", c, p))

    def jsonGet(path: Any*): Column = json_get(c, path.map(pathCol): _*)
    def jsonAsText(path: Any*): Column = json_as_text(c, path.map(pathCol): _*)
    def jsonContains(path: Any*): Column = json_contains(c, path.map(pathCol): _*)
  }
}
