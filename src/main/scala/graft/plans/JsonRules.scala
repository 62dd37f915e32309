package graft.plans

import graft.functions._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/**
 * Cast elision: `CAST(json_get(x, p) AS T)` → the typed getter, so the
 * union struct is never materialized. Mirrors the reference's
 * `optimise_json_get_cast` type map exactly (reference src/rewrite.rs:36-54):
 * bool → json_get_bool; float32/64 + decimals → json_get_float;
 * int32/64 → json_get_int; utf8s → json_get_str. Unlike the reference we
 * must preserve the cast's result type (Catalyst optimizer rules may not
 * change a plan's schema), so narrower numeric targets keep a cheap
 * numeric cast on top of the typed getter.
 *
 * Note the deliberate semantic shift inherited from the reference: e.g.
 * `::int` of a float-valued path is NULL via json_get_int, not a
 * float→int cast (reference tests/main.rs:399-403).
 */
object JsonCastElision extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case c @ Cast(jg: JsonGet, dt, _, _) =>
      dt match {
        case BooleanType     => JsonGetBool(jg.children)
        case DoubleType      => JsonGetFloat(jg.children)
        case FloatType       => c.withNewChildren(Seq(JsonGetFloat(jg.children)))
        case _: DecimalType  => c.withNewChildren(Seq(JsonGetFloat(jg.children)))
        case LongType        => JsonGetInt(jg.children)
        case IntegerType     => c.withNewChildren(Seq(JsonGetInt(jg.children)))
        case ShortType       => c.withNewChildren(Seq(JsonGetInt(jg.children)))
        case ByteType        => c.withNewChildren(Seq(JsonGetInt(jg.children)))
        case _: StringType   => JsonGetStr(jg.children)
        case _               => c
      }
  }
}

/**
 * Call unnesting: `json_get_str(json_get(col, 'a'), 'b')` →
 * `json_get_str(col, 'a', 'b')` — one parse instead of
 * parse→reserialize→parse. Applies when the outer function is one of
 * {json_get, json_get_bool/float/int/json/str, json_as_text}, the inner is
 * `json_get`, and every path argument is a literal (reference
 * src/rewrite.rs:57-91 and its issue #23 guard). `json_as_text` as the
 * INNER call is never flattened — it returns SQL text, not JSON.
 */
object JsonCallUnnest extends Rule[LogicalPlan] {

  private def literalPaths(e: JsonPathExpression): Boolean =
    e.children.tail.forall(_.isInstanceOf[Literal])

  private def flatten[T <: JsonPathExpression](
      outer: T,
      rebuild: Seq[Expression] => Expression): Expression =
    outer.children.head match {
      case inner: JsonGet if literalPaths(inner) && literalPaths(outer) =>
        rebuild(inner.children ++ outer.children.tail)
      case _ => outer
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case e: JsonGet      => flatten(e, JsonGet)
    case e: JsonGetBool  => flatten(e, JsonGetBool)
    case e: JsonGetFloat => flatten(e, JsonGetFloat)
    case e: JsonGetInt   => flatten(e, JsonGetInt)
    case e: JsonGetJson  => flatten(e, JsonGetJson)
    case e: JsonGetStr   => flatten(e, JsonGetStr)
    case e: JsonAsText   => flatten(e, JsonAsText)
  }
}

/**
 * Union-text fusion: `json_union_to_text(json_get(j, p…))` →
 * `JsonGetUnionText(j, p…)`. The unfused pair navigates once to BUILD
 * the sparse-union struct and then re-reads it to format text; the fused
 * navigation kernel does both in one pass with no intermediate struct
 * (output formatting is identical — JsonUnionType.toJsonText semantics,
 * asserted by JsonFunctionsSpec).
 * No literal-path guard needed: only the output encoding changes.
 */
object JsonUnionTextFusion extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case JsonUnionToText(jg: JsonGet) => JsonGetUnionText(jg.children)
  }
}
