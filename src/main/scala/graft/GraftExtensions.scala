package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * `SparkSessionExtensions` entry point — enable with
 * `spark.sql.extensions=graft.GraftExtensions` (or
 * `.withExtensions(new GraftExtensions)`). Injects the 13 JSON functions
 * (+ aliases) and the two plan rewrites; equivalent to the reference's
 * `register_all(registry)` (src/lib.rs:69-96).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    (JsonFunctions.registry ++ JsonFunctions.operatorRegistry).foreach {
      case (name, builder) =>
        e.injectFunction(
          (FunctionIdentifier(name),
            new ExpressionInfo("graft", name),
            builder))
    }
    // Cast elision must run during analysis: Spark's CheckAnalysis would
    // reject CAST(<union struct> AS INT) before an optimizer rule could
    // rewrite it (DataFusion runs FunctionRewrites at the analogous stage,
    // reference src/rewrite.rs:19-32).
    e.injectResolutionRule(_ => graft.plans.JsonCastElision)
    JsonFunctions.optimizerRules.foreach { rule =>
      e.injectOptimizerRule(_ => rule)
    }
    // SQL-text operator support (`j -> 'k'` through plain spark.sql),
    // one conf flag away: spark.graft.sqlOperators=true
    e.injectParser((_, delegate) => new GraftSqlParser(delegate))
  }
}
