package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators. The headline is the backward as-of join — "for
 * each left row, the latest right row at or before it, per key" — the
 * point-in-time lookup every feature/label pipeline needs (join each
 * purchase to the last click before it, each prediction to the freshest
 * feature row, each trade to the prevailing quote).
 *
 * Spark has no ASOF JOIN operator, and the naive encoding
 * (equi-join on the key + `r.t <= l.t` + window argmax) materializes every
 * (left, right) pair per key before the filter — O(n_l · n_r) per key,
 * a blow-up at 100 TB for any hot key. This implementation is the
 * union-and-carry shape instead: tag both sides, hash-partition ONCE on
 * the key, sort each partition by (time, side), and carry the last-seen
 * right payload forward with a running window — `last(payload,
 * ignoreNulls)` over rows unbounded-preceding..current. Cost is one
 * Exchange of (left + right) and one sort — the same price as one
 * sort-merge join — with NO pair explosion, no Join operator at all, and
 * O(1) window state per partition (PlanQualitySpec pins the plan: a
 * single Exchange, zero Joins).
 */
object Joins {

  /** Backward as-of join.
    *
    * For each `left` row: the single `right` row with the greatest
    * `timeCol <= left.timeCol` and equal `keyCol` (ties on time → the
    * greatest `rightIdCol`, so results are deterministic at any
    * parallelism). Both inputs must carry `keyCol` and `timeCol` under
    * the same names; `rightIdCol` and `rightValueCols` are appended to
    * the left row (NULL when no right row qualifies), plus the matched
    * right time as `asof_<timeCol>`. Right-side names must not clash
    * with left columns.
    *
    * `toleranceNs >= 0` additionally requires
    * `left.time - right.time <= tolerance` (numeric time columns; pass a
    * negative tolerance for unbounded). Right rows with NULL time never
    * match; left rows with NULL time get no match.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightIdCol: String,
      rightValueCols: Seq[String] = Seq.empty,
      tolerance: Long = -1L): DataFrame = {
    val carry = (rightIdCol +: rightValueCols).distinct
    val leftCols = left.columns.toSeq
    val clash = carry.filter(leftCols.contains)
    require(clash.isEmpty,
      s"right columns ${clash.mkString(", ")} clash with left columns — rename them first")
    val matchedTime = s"asof_$timeCol"
    require(!leftCols.contains(matchedTime) && !carry.contains(matchedTime),
      s"$matchedTime is reserved for the matched right time")

    // right payload: matched time first, then the carried columns
    val rv = struct((col(timeCol).as(matchedTime) +: carry.map(col)): _*)
    val rvType = right.select(rv.as("__rv")).schema("__rv").dataType
    val leftSchema = left.schema

    val lTagged = left.select(
      leftCols.map(col) ++ Seq(lit(1).as("__side"), lit(null).cast(rvType).as("__rv")): _*)
    val rTagged = right
      .where(col(timeCol).isNotNull) // a NULL-time right row must never carry
      .select(
        leftCols.map(c =>
          if (c == keyCol || c == timeCol) col(c)
          else lit(null).cast(leftSchema(c).dataType).as(c)) ++
          Seq(lit(0).as("__side"), rv.as("__rv")): _*)

    // right rows sort BEFORE left rows at equal time ("at or before"
    // includes equal ts); among equal-time right rows the carry window
    // ends on the greatest rightIdCol. Left rows have a NULL sort tail
    // (nulls-first keeps them adjacent; their carried value is identical
    // so relative order is immaterial).
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc_nulls_first, col("__side").asc,
        col("__rv").getField(rightIdCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = lTagged.unionByName(rTagged)
      .withColumn("__carried", last(col("__rv"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)

    val withinTol =
      if (tolerance < 0) col("__carried").isNotNull
      else col("__carried").isNotNull &&
        col("__carried").getField(matchedTime) >= col(timeCol) - lit(tolerance)
    val outFields = (matchedTime +: carry).map(c =>
      when(withinTol, col("__carried").getField(c)).as(c))

    carried.select(leftCols.map(col) ++ outFields: _*)
  }
}
