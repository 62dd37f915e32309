package graft

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.{ParameterContext, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Parser wrapper injected by GraftExtensions: when
 * `spark.graft.sqlOperators` is `true`, SQL text is pre-translated with
 * [[JsonOperatorSql.rewrite]] before Spark's parser sees it, so the
 * PostgreSQL JSON operators the reference plans natively
 * (`j -> 'k'`, `j ->> 'k'`, `j ? 'k'` — reference src/rewrite.rs:105-198)
 * run through plain `spark.sql(...)`:
 *
 * {{{
 * spark.conf.set("spark.graft.sqlOperators", "true")
 * spark.sql("SELECT payload -> 'name' FROM events")
 * }}}
 *
 * OFF by default and gated per-statement on the session conf: Spark
 * reserves bare `?` for positional parameter markers, so a session must
 * opt in knowingly (the translator is conservative — literal and
 * column-identifier paths on column chains, lambda positions excluded —
 * but `col ? 'text'` is genuinely ambiguous with a marker compared
 * against a string). Only whole-statement entry points rewrite;
 * identifier/schema parsing passes through untouched.
 */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  private def maybeRewrite(sqlText: String): String = {
    // tolerant parse: only a case-insensitive "true" enables the rewrite.
    // String.toBoolean would THROW for any other value, bricking every
    // subsequent spark.sql() call in the session over a typo'd conf.
    val v = SQLConf.get.getConfString(GraftSqlParser.ConfKey, "false")
    if (v != null && v.trim.equalsIgnoreCase("true")) JsonOperatorSql.rewrite(sqlText)
    else sqlText
  }

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(maybeRewrite(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(maybeRewrite(sqlText))

  override def parsePlanWithParameters(
      sqlText: String, context: ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(maybeRewrite(sqlText), context)

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)

  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)

  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
}

object GraftSqlParser {
  /** Session conf enabling the SQL-text operator translation. */
  val ConfKey = "spark.graft.sqlOperators"
}
