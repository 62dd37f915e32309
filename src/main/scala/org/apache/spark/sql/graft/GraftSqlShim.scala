package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge into `private[sql]` Spark internals: building a classic
 * `Column` directly from a Catalyst `Expression`, and registering expression
 * builders on an already-running session (the extension-free path; the
 * extension path is `graft.GraftExtensions`). Lives in the
 * org.apache.spark.sql namespace for access, the standard pattern for Spark
 * extension libraries.
 */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)

  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Column carrying explicit field metadata (Spark's analogue of Arrow
    * field metadata): an Alias with `explicitMetadata`, named like the
    * auto-generated column so the wrapper is invisible. Re-aliasing with
    * `.as(name)` keeps the metadata — Alias.metadata delegates to a
    * NamedExpression child when no explicit metadata is set. */
  def columnWithMetadata(
      e: Expression,
      metadata: org.apache.spark.sql.types.Metadata): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.Alias(
        e, org.apache.spark.sql.catalyst.util.toPrettySQL(e))(
        explicitMetadata = Some(metadata)))

  def register(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
