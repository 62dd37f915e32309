package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftSqlShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Temporal operators: the as-of join family, range/interval joins, and
 * gap-based sessionization. The headline is the as-of join — "for each
 * left row, the single right row nearest it in time, per key" — the
 * point-in-time lookup every feature/label pipeline needs (join each
 * purchase to the last click before it, each prediction to the freshest
 * feature row, each trade to the prevailing quote). Three directions:
 * backward (latest right at or before; the default), forward (earliest
 * right at or after), nearest (the closer of the two; ties → backward).
 *
 * Spark has no ASOF JOIN operator, and the naive encoding
 * (equi-join on the key + `r.t <= l.t` + window argmax) materializes every
 * (left, right) pair per key before the filter — O(n_l · n_r) per key,
 * a blow-up at 100 TB for any hot key. This implementation is the
 * union-and-carry shape instead: tag both sides, hash-partition ONCE on
 * the key, sort each partition by (time, side), and carry the last-seen
 * right payload forward with a running window — `last(payload,
 * ignoreNulls)` over rows unbounded-preceding..current. Cost is one
 * Exchange of (left + right) and one sort per direction — backward/
 * forward pay the same price as one sort-merge join, nearest pays one
 * extra in-partition sort (still ONE Exchange) — with NO pair explosion
 * and no Join operator at all (PlanQualitySpec pins the plans: a single
 * Exchange, zero Joins).
 */
object Joins {

  /** Backward as-of join (see [[asofJoinDirected]] with
    * direction = "backward").
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
    * `tolerance >= 0` additionally requires
    * `|left.time - right.time| <= tolerance` (numeric time columns; pass
    * a negative tolerance for unbounded). Right rows with NULL time
    * never match; left rows with NULL time get no match.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightIdCol: String,
      rightValueCols: Seq[String] = Seq.empty,
      tolerance: Long = -1L): DataFrame =
    asofJoinDirected(left, right, keyCol, timeCol, rightIdCol,
      rightValueCols, tolerance, "backward")

  /** As-of join with an explicit direction: "backward" (latest right at
    * or before), "forward" (earliest right at or after), or "nearest"
    * (the closer of the two; equal distance → the backward match).
    * Contract otherwise identical to [[asofJoin]]. */
  def asofJoinDirected(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightIdCol: String,
      rightValueCols: Seq[String] = Seq.empty,
      tolerance: Long = -1L,
      direction: String = "backward"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
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
    val unioned = lTagged.unionByName(rTagged)

    // Windows share ONE hash partitioning on the key (one Exchange);
    // each direction is an in-partition sort. Right rows sort BEFORE
    // left rows at equal time in both directions ("at or before" /
    // "at or after" include equal ts); among equal-time right rows the
    // carry ends on the greatest rightIdCol. Left rows carry a NULL
    // sort tail (their relative order is immaterial — the carried value
    // is identical), and NULL left times are masked below.
    def w(timeOrder: Column) = Window.partitionBy(col(keyCol))
      .orderBy(timeOrder, col("__side").asc,
        col("__rv").getField(rightIdCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // backward: ascending time — last-seen right = greatest time <= t.
    // forward: descending time — last-seen right = smallest time >= t.
    val wBack = w(col(timeCol).asc_nulls_first)
    val wFwd = w(col(timeCol).desc_nulls_last)

    val carried = direction match {
      case "backward" =>
        unioned.withColumn("__cb", last(col("__rv"), ignoreNulls = true).over(wBack))
      case "forward" =>
        unioned.withColumn("__cf", last(col("__rv"), ignoreNulls = true).over(wFwd))
      case "nearest" =>
        unioned
          .withColumn("__cb", last(col("__rv"), ignoreNulls = true).over(wBack))
          .withColumn("__cf", last(col("__rv"), ignoreNulls = true).over(wFwd))
    }
    val onlyLeft = carried.where(col("__side") === 1)
    val chosen = asofChoose(direction, timeCol, matchedTime, tolerance,
      col("__cb"), col("__cf"))
    val outFields = (matchedTime +: carry).map(c => chosen.getField(c).as(c))
    onlyLeft.select(leftCols.map(col) ++ outFields: _*)
  }

  /** The direction/tolerance chooser shared by the carry-based as-of
    * variants: a candidate matches if it exists, the left time is
    * non-NULL, and the (direction-signed, always >= 0) gap is within
    * tolerance; nearest ties at equal distance go backward. */
  private def asofChoose(
      direction: String, timeCol: String, matchedTime: String,
      tolerance: Long, cb: => Column, cf: => Column): Column = {
    def ok(c: Column, gap: Column): Column = {
      val base = c.isNotNull && col(timeCol).isNotNull
      if (tolerance < 0) base else base && gap <= lit(tolerance)
    }
    direction match {
      case "backward" =>
        when(ok(cb, col(timeCol) - cb.getField(matchedTime)), cb)
      case "forward" =>
        when(ok(cf, cf.getField(matchedTime) - col(timeCol)), cf)
      case "nearest" =>
        val dB = col(timeCol) - cb.getField(matchedTime)
        val dF = cf.getField(matchedTime) - col(timeCol)
        val bOk = ok(cb, dB)
        val fOk = ok(cf, dF)
        // equal distance → backward (the conventional tie rule)
        when(bOk && (!fOk || dB <= dF), cb).when(fOk, cf)
    }
  }

  /** Skew-safe as-of join: semantics IDENTICAL to [[asofJoinDirected]]
    * (all three directions, same tie rule, same tolerance contract —
    * the spec sweeps them against each other), but the carry window is
    * partitioned by (key, time-bin) instead of key alone, so one
    * pathological hot key can no longer concentrate its entire
    * left+right volume in a single task (Spark windows cannot split a
    * partition; at 100 TB a 50%-hot key makes the unsalted shape a
    * single-task straggler). Two passes:
    *
    *  1. WITHIN-BIN: the same union-and-carry window over (key, bin),
    *     where bin = the left/right row's time clamped into `numBins`
    *     equal-width slices of the observed time range — a monotone
    *     function of time, so earlier bins hold strictly-not-later
    *     rows. The hot key's volume splits across numBins tasks,
    *     bounding per-task volume at ~1/numBins of the key.
    *  2. BOUNDARY FIX-UP: a per-(key, bin) aggregate (≤ numBins rows
    *     per key, partial-aggregated before its Exchange) computes each
    *     bin's closing carry — latest right of the bin (backward) /
    *     earliest right (forward) — and a per-key running window over
    *     that TINY frame derives the carry ENTERING each bin, coalesced
    *     wherever the within-bin carry found nothing.
    *
    * The full-width data crosses the wire ONCE (the window Exchange on
    * (key, bin)); the fix-up join is hinted shuffle-hash so the big
    * side REUSES that partitioning — no re-sort, no second big-side
    * Exchange (PlanQualitySpec pins exactly one full-data Exchange and
    * zero SortMergeJoins). Extra costs vs the unsalted shape: one
    * min/max scan for the bin boundaries, a distinct-(key, bin) scan,
    * and the small-frame machinery — worth it exactly when a key is hot
    * enough to straggle (ScaleProbe measures the 90%-hot-key case);
    * prefer [[asofJoinDirected]] for well-distributed keys and
    * [[asofJoinBroadcast]] for small right sides. Numeric time columns
    * only; times near Long.MinValue unsupported (negation in the
    * forward boundary aggregate). */
  def asofJoinSalted(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightIdCol: String,
      rightValueCols: Seq[String] = Seq.empty,
      tolerance: Long = -1L,
      direction: String = "backward",
      numBins: Int = 64): DataFrame = {
    require(numBins >= 1, s"numBins must be >= 1, got $numBins")
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be backward|forward|nearest, got $direction")
    val carry = (rightIdCol +: rightValueCols).distinct
    val leftCols = left.columns.toSeq
    val clash = carry.filter(leftCols.contains)
    require(clash.isEmpty,
      s"right columns ${clash.mkString(", ")} clash with left columns — rename them first")
    val matchedTime = s"asof_$timeCol"
    require(!leftCols.contains(matchedTime) && !carry.contains(matchedTime),
      s"$matchedTime is reserved for the matched right time")
    val reserved = Seq("__bin", "__k", "__side", "__rv", "__wb", "__wf",
      "__incB", "__incF")
    val reservedClash = reserved.filter(c =>
      leftCols.contains(c) || right.columns.contains(c))
    require(reservedClash.isEmpty,
      s"${reservedClash.mkString(", ")} reserved by asofJoinSalted — rename first")

    // bin boundaries: min/max time over both sides — a partial-aggregated
    // scan collapsing to one driver row (bounded at any scale). Bins only
    // steer PARTITIONING; every correctness decision still reads the raw
    // time column, so double precision at the edges is harmless (the bin
    // function just has to be monotone in time, and floor of a monotone
    // affine map clamped to [0, numBins) is).
    val range = left.select(col(timeCol).cast("double").as("__t"))
      .unionByName(right.select(col(timeCol).cast("double").as("__t")))
      .agg(min(col("__t")).as("lo"), max(col("__t")).as("hi")).head()
    if (range.isNullAt(0)) // no non-NULL time anywhere: nothing can match
      return asofJoinDirected(left, right, keyCol, timeCol, rightIdCol,
        rightValueCols, tolerance, direction)
    val loT = range.getDouble(0)
    val width0 = (range.getDouble(1) - loT) / numBins
    val width = if (width0 > 0) width0 else 1.0
    def binOf(t: Column): Column = least(lit(numBins - 1L),
      greatest(lit(0L), floor((t.cast("double") - lit(loT)) / lit(width)).cast("long")))

    val rv = struct((col(timeCol).as(matchedTime) +: carry.map(col)): _*)
    val rvType = right.select(rv.as("__rv")).schema("__rv").dataType
    val leftSchema = left.schema
    // `__k` wraps the key in a single-field struct: Spark treats NULLs
    // inside complex types as EQUAL in grouping, distinct, and equi-joins,
    // so NULL keys flow through the boundary fix-up join exactly as they
    // flow through the windows — a bare-key equi-join would drop them
    // (null != null) and silently lose cross-bin carries for the NULL key
    val lBin = left.select(
      leftCols.map(col) ++ Seq(lit(1).as("__side"), lit(null).cast(rvType).as("__rv"),
        binOf(col(timeCol)).as("__bin")): _*)
      .withColumn("__k", struct(col(keyCol)))
    val rBin = right
      .where(col(timeCol).isNotNull)
      .select(
        leftCols.map(c =>
          if (c == keyCol || c == timeCol) col(c)
          else lit(null).cast(leftSchema(c).dataType).as(c)) ++
          Seq(lit(0).as("__side"), rv.as("__rv"), binOf(col(timeCol)).as("__bin")): _*)
      .withColumn("__k", struct(col(keyCol)))
    val unioned = lBin.unionByName(rBin)

    // pass 1: the union-and-carry windows, per (key, bin) — same ordering
    // contract as asofJoinDirected, partition volume capped by the binning
    def w(timeOrder: Column) = Window.partitionBy(col("__k"), col("__bin"))
      .orderBy(timeOrder, col("__side").asc,
        col("__rv").getField(rightIdCol).asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBack = w(col(timeCol).asc_nulls_first)
    val wFwd = w(col(timeCol).desc_nulls_last)
    val needB = direction != "forward"
    val needF = direction != "backward"
    var carried = unioned
    if (needB) carried = carried.withColumn("__wb",
      last(col("__rv"), ignoreNulls = true).over(wBack))
    if (needF) carried = carried.withColumn("__wf",
      last(col("__rv"), ignoreNulls = true).over(wFwd))

    // pass 2: per-(key, bin) closing/opening rights (partial-aggregated,
    // ≤ numBins rows per key), then the carry entering each bin — the
    // latest closing among EARLIER bins / earliest opening among LATER
    // bins — via a per-key running window over the tiny frame. The frame
    // covers every (key, bin) present on either side, so a bin holding
    // only rights still relays its carry to later left-only bins.
    val ridIn = col("__rv").getField(rightIdCol)
    val closingAggs =
      (if (needB) Seq(max_by(col("__rv"), struct(col(timeCol), ridIn)).as("__closeB"))
       else Nil) ++
      (if (needF) Seq(max_by(col("__rv"), struct(col(timeCol) * -1, ridIn)).as("__openF"))
       else Nil)
    val closing = rBin.groupBy(col("__k"), col("__bin"))
      .agg(closingAggs.head, closingAggs.tail: _*)
    val pairs = lBin.select(col("__k"), col("__bin"))
      .unionByName(rBin.select(col("__k"), col("__bin")))
      .distinct()
    val wIncB = Window.partitionBy(col("__k")).orderBy(col("__bin").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wIncF = Window.partitionBy(col("__k")).orderBy(col("__bin").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    var incoming = pairs.join(closing, Seq("__k", "__bin"), "left")
    if (needB) incoming = incoming.withColumn("__incB",
      last(col("__closeB"), ignoreNulls = true).over(wIncB))
    if (needF) incoming = incoming.withColumn("__incF",
      last(col("__openF"), ignoreNulls = true).over(wIncF))
    incoming = incoming.select(
      Seq(col("__k"), col("__bin")) ++
        (if (needB) Seq(col("__incB")) else Nil) ++
        (if (needF) Seq(col("__incF")) else Nil): _*)

    // shuffle-hash (not SMJ): the big carried side reuses the window's
    // (key, bin) partitioning and is never re-sorted; only the tiny
    // incoming frame builds hash tables
    val fixed = carried.join(incoming.hint("shuffle_hash"), Seq("__k", "__bin"), "left")
    val onlyLeft = fixed.where(col("__side") === 1)
    val chosen = asofChoose(direction, timeCol, matchedTime, tolerance,
      coalesce(col("__wb"), col("__incB")), coalesce(col("__wf"), col("__incF")))
    val outFields = (matchedTime +: carry).map(c => chosen.getField(c).as(c))
    onlyLeft.select(leftCols.map(col) ++ outFields: _*)
  }

  /** Gap-based sessionization: assign each row a per-key session index —
    * a new session starts whenever the time since the key's previous row
    * exceeds `gap` (strictly greater; equal-to-gap continues the
    * session). The classic event-log shape (user sessions, device
    * activity bursts, trade bursts). `idCol` breaks equal-timestamp ties
    * so the assignment is deterministic at any parallelism. One Exchange
    * on the key + one in-partition sort — the same price as any grouped
    * window; AQE handles key skew by splitting reducers, and the output
    * adds one long column. NULL times sort first and join the first
    * session of their key. Output: input columns + `session_idx`
    * (0-based per key).
    *
    * vs Spark's native `session_window` aggregate: the native operator
    * merges on the same INCLUSIVE rule (diff <= gap — probed with a
    * planted diff of exactly gap+1 under a gap+1 window, which merged)
    * but produces per-SESSION rows, not per-row labels — it cannot tag
    * each event with its session without a join back. For pure
    * per-session aggregates it is the better plan (~12% faster at 10M
    * rows: 7.2 s vs 8.1 s, ScaleProbe `session` section, identical
    * session counts); for per-row labeling (the shape this operator
    * serves — dedup keys, feature joins, downstream grouping) the
    * two-window form is the one that exists. OperatorsSpec pins the
    * boundary-rule agreement against the native aggregate. */
  def sessionize(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      idCol: String,
      gap: Long): DataFrame = {
    require(gap >= 0, s"gap must be >= 0, got $gap")
    require(!df.columns.contains("session_idx"), "session_idx is reserved")
    val order = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc_nulls_first, col(idCol).asc)
    val prev = lag(col(timeCol), 1).over(order)
    val isBreak = when(prev.isNull || col(timeCol) - prev > lit(gap), 1L).otherwise(0L)
    val running = Window.partitionBy(col(keyCol))
      .orderBy(col(timeCol).asc_nulls_first, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__brk", isBreak)
      .withColumn("session_idx", sum(col("__brk")).over(running) - lit(1L))
      .drop("__brk")
  }

  /** Range (point-in-interval) join: each left row pairs with every right
    * row whose `[loCol, hiCol]` interval contains `left.pointCol`
    * (boundaries inclusive), optionally also matching on `keyCols`.
    *
    * The naive encoding is a non-equi theta-join — Spark plans it as
    * BroadcastNestedLoopJoin or a cartesian product, O(n_l · n_r): a
    * blow-up at scale. This implementation bins the number line at
    * `binWidth`: each right interval explodes to the bins it overlaps,
    * each left point lands in exactly ONE bin, and the match becomes a
    * plain hash equi-join on (keyCols, bin) + a residual between-filter.
    * Every qualifying (left, right) pair meets in exactly the left
    * point's bin, so no dedup is needed. Cost: right side inflates by
    * (span/binWidth + 1) per interval — pick binWidth near the TYPICAL
    * interval length so the inflation is a small constant; the join
    * itself is shuffle-hash/SMJ on the bin key, AQE-skew-splittable,
    * never cartesian (PlanQualitySpec pins it).
    *
    * NULL point or NULL/inverted interval never matches. Right columns
    * must not clash with left columns (keyCols excepted). */
  /** Ordered funnel analysis over an event log: per key, the furthest
    * step of `steps` reached and each step's chosen time, under the
    * standard ordered-funnel rule — step i+1 must occur STRICTLY after
    * the chosen step-i time. Greedy-earliest (each step takes its first
    * qualifying event) is depth-optimal: any chain t1<…<tk can be
    * shifted step-by-step onto the greedy times without breaking order,
    * so no other strategy reaches deeper.
    *
    * ONE aggregation pass: events fold per key in (time, id) order
    * through an array accumulator (a higher-order `aggregate`, the
    * ordered-fold convention the ANN oracles use) — equivalent to the
    * K-chained-min formulation the DuckDB oracle replays (greedy takes
    * the min qualifying time at every step, by induction), but costing
    * one Exchange instead of K self-join rounds.
    *
    * Scale shape: one partial-agg collect per key + a per-key fold
    * bounded by that key's event count; AQE splits skewed keys. Events
    * not matching any step still ride the collect — pre-filter
    * `typeCol isin steps` upstream when the log is dominated by other
    * types (done here). Returns `(keyCol, steps_reached, t_step0..K-1)`.
    */
  def funnel(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      idCol: String,
      typeCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.size <= 8,
      s"steps must have 1..8 entries, got ${steps.size}")
    require(steps.distinct.size == steps.size,
      s"steps must be distinct, got $steps")
    val k = steps.size
    val evs = sort_array(collect_list(struct(
      col(timeCol).cast("long").as("ts"),
      col(idCol).cast("long").as("id"),
      col(typeCol).as("tp"))))
    val zero = array_repeat(lit(null).cast("long"), k)
    val stepArr = typedlit(steps)
    val folded = aggregate(evs, zero, (acc, e) => {
      val j = size(filter(acc, a => a.isNotNull)) // completed steps
      // greatest(j, 1) keeps the index valid under ANSI when j = 0 (the
      // Or's left arm decides then) — never rely on Or evaluation order
      // to dodge element_at's invalid-index-0 error
      // both element_at indexes are clamped into range rather than relying
      // on And/Or short-circuit order under ANSI: the stepArr clamp's
      // j = k arm is unreachable (the j < k conjunct decides first), and
      // the acc clamp's j = 0 arm is decided by the Or's left arm
      val qualifies = j < k &&
        e.getField("tp") === element_at(stepArr, least(j + 1, lit(k))) &&
        (j === 0 || e.getField("ts") > element_at(acc, greatest(j, lit(1))))
      when(qualifies,
        transform(acc, (a, i) =>
          when(i === j, e.getField("ts")).otherwise(a)))
        .otherwise(acc)
    })
    df.where(col(typeCol).isin(steps: _*) && col(timeCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(folded.as("__acc"))
      .select(
        col(keyCol) +:
          size(filter(col("__acc"), a => a.isNotNull)).cast("long")
            .as("steps_reached") +:
          steps.indices.map(i =>
            element_at(col("__acc"), i + 1).as(s"t_step$i")): _*)
  }

  /** Cohort retention over an event log: users cohort by their FIRST
    * activity bucket (`floor(ts / bucket)`), and the matrix counts how
    * many of each cohort were active again `offset` buckets later —
    * the table every training-data/product dashboard draws as the
    * retention triangle. Offsets beyond `maxOffset` are dropped
    * (bounds the output; offset 0 row = cohort size).
    *
    * Scale shape: first-activity is one partial-agg min per key; the
    * join back is a key equi-join (broadcastable when the key table
    * fits, AQE otherwise); the (user, bucket) distinct and the final
    * (cohort, offset) count are both partial-agg shuffles on bounded
    * keys. Returns `(cohort, offset, n_active)`. */
  def retention(
      df: DataFrame,
      keyCol: String,
      timeCol: String,
      bucket: Long,
      maxOffset: Long = 30L): DataFrame = {
    require(bucket > 0, s"bucket must be positive, got $bucket")
    require(maxOffset >= 0, s"maxOffset must be >= 0, got $maxOffset")
    // exact integer floor-div: subtracting pmod makes the numerator
    // exactly divisible, so the double division is exact — a bare
    // floor(ts / bucket) can round across the boundary at 1e15-scale
    // timestamps (double quotient ulp vs 1/bucket margin)
    val t = col(timeCol).cast("long")
    val b = ((t - pmod(t, lit(bucket))) / lit(bucket)).cast("long")
    val act = df.where(col(timeCol).isNotNull)
      .select(col(keyCol).as("__k"), b.as("__b")).distinct()
    val first = act.groupBy(col("__k")).agg(min(col("__b")).as("__cohort"))
    act.join(first, Seq("__k"))
      .select(col("__cohort").as("cohort"),
        (col("__b") - col("__cohort")).as("offset"))
      .where(col("offset") <= maxOffset)
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).cast("long").as("n_active"))
  }

  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      loCol: String,
      hiCol: String,
      binWidth: Double,
      keyCols: Seq[String] = Seq.empty): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val clash = right.columns.filter(c => left.columns.contains(c) && !keyCols.contains(c))
    require(clash.isEmpty,
      s"right columns ${clash.mkString(", ")} clash with left columns — rename them first")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "__bin is reserved")
    def binOf(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val rBinned = right
      .where(col(loCol).isNotNull && col(hiCol).isNotNull && col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(binOf(col(loCol)), binOf(col(hiCol)))))
    val lBinned = left
      .where(col(pointCol).isNotNull)
      .withColumn("__bin", binOf(col(pointCol)))
    lBinned.join(rBinned, (keyCols :+ "__bin").toSeq)
      .where(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval-overlap join (range × range): each left interval
    * `[lLoCol, lHiCol]` pairs with every right interval `[rLoCol, rHiCol]`
    * it overlaps — `lLo <= rHi AND rLo <= lHi`, boundaries inclusive —
    * optionally also matching on `keyCols`. Same binning frame as
    * [[rangeJoin]]: both sides explode to the bins they cover and meet in
    * a hash equi-join on (keyCols, bin). An overlapping pair shares
    * SEVERAL bins, so it is kept only where the overlap STARTS — the bin
    * of `greatest(lLo, rLo)`, which both sides necessarily cover — making
    * the output exactly one row per qualifying pair with no distinct.
    * Inflation is (span/binWidth + 1) per row on BOTH sides; never a
    * cartesian. NULL or inverted intervals never match. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      lLoCol: String,
      lHiCol: String,
      rLoCol: String,
      rHiCol: String,
      binWidth: Double,
      keyCols: Seq[String] = Seq.empty): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val clash = right.columns.filter(c => left.columns.contains(c) && !keyCols.contains(c))
    require(clash.isEmpty,
      s"right columns ${clash.mkString(", ")} clash with left columns — rename them first")
    require(!left.columns.contains("__bin") && !right.columns.contains("__bin"),
      "__bin is reserved")
    def binOf(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    def binned(df: DataFrame, lo: String, hi: String): DataFrame = df
      .where(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .withColumn("__bin", explode(sequence(binOf(col(lo)), binOf(col(hi)))))
    binned(left, lLoCol, lHiCol)
      .join(binned(right, rLoCol, rHiCol), (keyCols :+ "__bin").toSeq)
      .where(col(lLoCol) <= col(rHiCol) && col(rLoCol) <= col(lHiCol))
      .where(col("__bin") === binOf(greatest(col(lLoCol), col(rLoCol))))
      .drop("__bin")
  }

  /** Broadcast backward as-of join for a SMALL right side: the right
    * (key, time, id) triples collapse into per-key sorted arrays carried
    * inside one narrow expression (an implicit broadcast, like the ANN
    * centroids), so each left row is a binary search — the left side
    * NEVER shuffles and NEVER sorts. At 100 TB this inverts the cost
    * model of [[asofJoin]]: union-and-carry must Exchange the full
    * left + right on the key; here the fact stream stays narrow and only
    * the value columns arrive via a broadcast hash join on the matched
    * right id (PlanQualitySpec pins: zero shuffle Exchanges, no
    * SortMergeJoin). The same expression is stateless, so it composes
    * with Structured Streaming (stream-side point-in-time enrichment —
    * JsonStream.asofEnrichToBatch), where the window-based shape cannot
    * run at all.
    *
    * Semantics are IDENTICAL to backward [[asofJoin]] (equal-ts
    * inclusive, ties → greatest rightIdCol, NULL times never match,
    * inclusive tolerance) — q_asof_broadcast shares q_asof_join's
    * oracle text verbatim. Key must be string/int/long; time and
    * rightIdCol must be long. `maxRightRows` guards the driver collect.
    * Memory math for the default 1M: the collected triples are GenericRows
    * (~80-100 B each with object headers + boxed fields) → ~100 MB
    * transient on the driver, and the broadcast table itself is three
    * long/ref arrays per key ≈ 24 B/row ≈ 24 MB resident per executor —
    * safe on a stock 4 GiB driver. Raise it only after sizing BOTH the
    * driver (100 B/row during collect) and the executors (24 B/row
    * resident, one copy per JVM); past ~10M rows use [[asofJoin]]
    * (union-and-carry) or [[asofJoinSalted]] instead. */
  def asofJoinBroadcast(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightIdCol: String,
      rightValueCols: Seq[String] = Seq.empty,
      tolerance: Long = -1L,
      maxRightRows: Int = 1000000): DataFrame = {
    val carry = (rightIdCol +: rightValueCols).distinct
    val leftCols = left.columns.toSeq
    val clash = carry.filter(leftCols.contains)
    require(clash.isEmpty,
      s"right columns ${clash.mkString(", ")} clash with left columns — rename them first")
    val matchedTime = s"asof_$timeCol"
    require(!leftCols.contains(matchedTime) && !carry.contains(matchedTime),
      s"$matchedTime is reserved for the matched right time")
    // asofJoin's semantics never truncate times — fail loudly on a
    // double/decimal/timestamp time or id instead of silently casting
    def requireIntegral(df: DataFrame, c: String, side: String): Unit = {
      val dt = df.schema(c).dataType
      require(dt == ByteType || dt == ShortType || dt == IntegerType || dt == LongType,
        s"asofJoinBroadcast needs an integral $side.$c, got ${dt.simpleString}")
    }
    requireIntegral(left, timeCol, "left")
    requireIntegral(right, timeCol, "right")
    requireIntegral(right, rightIdCol, "right")

    // the SAME filtered right feeds both the triples and the value
    // payload, so a rightIdCol duplicated only by an invalid (NULL
    // key/time/id) row can neither dodge the uniqueness check nor
    // fan out matched left rows in the payload join below
    val rightValid = right
      .where(col(timeCol).isNotNull && col(keyCol).isNotNull && col(rightIdCol).isNotNull)
    val triples = rightValid
      .select(col(keyCol), col(timeCol).cast("long"), col(rightIdCol).cast("long"))
      .limit(maxRightRows + 1)
      .collect()
    require(triples.length <= maxRightRows,
      s"right side exceeds maxRightRows=$maxRightRows — use asofJoin (union-and-carry) instead")
    val rids = triples.map(_.getLong(2))
    require(rids.distinct.length == rids.length,
      s"$rightIdCol must be unique on the right side")
    val table: Map[Any, (Array[Long], Array[Long])] = triples
      .groupBy(r => AsofPickBroadcast.internalKey(r.get(0)))
      .map { case (k, rows) =>
        val sorted = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(identity)
        k -> (sorted.map(_._1), sorted.map(_._2))
      }
    val pick = GraftSqlShim.column(AsofPickBroadcast(
      GraftSqlShim.expression(col(keyCol)),
      GraftSqlShim.expression(col(timeCol).cast("long")),
      table, tolerance))

    // two-step select: the pick is multi-referenced, so CollapseProject
    // keeps one evaluation (and one copy of the broadcast table) per row
    val picked = left
      .select(leftCols.map(col) :+ pick.as("__pick"): _*)
      .select(leftCols.map(col) ++ Seq(
        col("__pick").getField("t").as(matchedTime),
        col("__pick").getField("rid").as(rightIdCol)): _*)
    if (rightValueCols.isEmpty) picked
    else {
      // value columns arrive via an explicit broadcast on the matched id:
      // the left side still never shuffles
      val payload = rightValid.select((rightIdCol +: rightValueCols).distinct.map(col): _*)
      picked.join(broadcast(payload), Seq(rightIdCol), "left")
        .select((leftCols :+ matchedTime).map(col) ++ carry.map(col): _*)
    }
  }

  /** Minimum sampled rows before the skew probe trusts its estimate: below
    * this the top-key share is statistical noise and [[asof]] routes to
    * the unsalted carry (the safe default — salting only ever costs the
    * small-frame machinery, but routing on noise would flap). */
  val AsofSkewProbeMinSample = 1000L

  /** The one front door for the as-of family: routes to the cheapest
    * variant whose preconditions hold, so callers no longer need the cost
    * model spread across three scaladocs.
    *
    * `strategy` = `"broadcast"` | `"salted"` | `"carry"` forces that
    * variant ([[asofJoinBroadcast]] / [[asofJoinSalted]] /
    * [[asofJoinDirected]]); `"auto"` (the default) decides:
    *
    *  1. BROADCAST when it is statically eligible (backward direction;
    *     integral time and right-id; string/integral key) and a
    *     limit-bounded probe shows the valid right side fits
    *     `maxBroadcastRightRows` with a unique `rightIdCol` — the probe
    *     reads at most `maxBroadcastRightRows + 1` right rows, never the
    *     full side. Cheapest by far: the big left NEVER shuffles.
    *  2. SALTED when a sampled top-key frequency probe (fraction
    *     `skewProbeFraction` over both sides' keys, trusted only past
    *     [[AsofSkewProbeMinSample]] sampled rows) shows one key holding
    *     >= `skewThreshold` of the data — the regime where the unsalted
    *     window's single-task hot key straggles. Callers who already know
    *     their skew should pass strategy = "salted" and skip the probe.
    *  3. CARRY (union-and-carry, one Exchange) otherwise — the
    *     well-distributed default.
    *
    * Probe costs in auto mode: one ≤(maxBroadcastRightRows+1)-row agg on
    * the right (skipped when statically ineligible) and one sampled
    * key-frequency agg (skipped when broadcast already won). Both are
    * driver-bounded jobs; on a 100 TB input the sample scan is the only
    * full-data touch and is a narrow single-column read. Semantics of the
    * result are identical across all three routes (the variant specs
    * sweep them against each other). */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightIdCol: String,
      rightValueCols: Seq[String] = Seq.empty,
      tolerance: Long = -1L,
      direction: String = "backward",
      strategy: String = "auto",
      maxBroadcastRightRows: Int = 1000000,
      skewThreshold: Double = 0.25,
      skewProbeFraction: Double = 0.001,
      numBins: Int = 64): DataFrame = {
    val route = strategy match {
      case "auto" =>
        chooseAsofRoute(left, right, keyCol, timeCol, rightIdCol, direction,
          maxBroadcastRightRows, skewThreshold, skewProbeFraction)
      case s @ ("broadcast" | "salted" | "carry") => s
      case other =>
        throw new IllegalArgumentException(
          s"strategy must be auto|broadcast|salted|carry, got $other")
    }
    route match {
      case "broadcast" =>
        require(direction == "backward",
          s"asofJoinBroadcast is backward-only, got direction=$direction")
        asofJoinBroadcast(left, right, keyCol, timeCol, rightIdCol,
          rightValueCols, tolerance, maxBroadcastRightRows)
      case "salted" =>
        asofJoinSalted(left, right, keyCol, timeCol, rightIdCol,
          rightValueCols, tolerance, direction, numBins)
      case _ =>
        asofJoinDirected(left, right, keyCol, timeCol, rightIdCol,
          rightValueCols, tolerance, direction)
    }
  }

  /** [[asof]]'s auto routing decision, separated so the routing spec can
    * pin each regime without materializing the joined result. */
  private[graft] def chooseAsofRoute(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      timeCol: String,
      rightIdCol: String,
      direction: String,
      maxBroadcastRightRows: Int,
      skewThreshold: Double,
      skewProbeFraction: Double): String = {
    def integral(df: DataFrame, c: String): Boolean = df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val keyOk = left.schema(keyCol).dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val bcastEligible = direction == "backward" && keyOk &&
      integral(left, timeCol) && integral(right, timeCol) &&
      integral(right, rightIdCol)
    if (bcastEligible) {
      // limit-bounded: reads at most maxBroadcastRightRows + 1 rows however
      // large the right side is, and checks rightIdCol uniqueness on the
      // same bounded slice (a duplicate id would make asofJoinBroadcast
      // throw where carry succeeds — auto must not route into a failure)
      val probe = right
        .where(col(timeCol).isNotNull && col(keyCol).isNotNull &&
          col(rightIdCol).isNotNull)
        .select(col(rightIdCol))
        .limit(maxBroadcastRightRows + 1)
        .agg(count(lit(1)).as("n"), countDistinct(col(rightIdCol)).as("d"))
        .head()
      if (probe.getLong(0) <= maxBroadcastRightRows &&
        probe.getLong(1) == probe.getLong(0)) return "broadcast"
    }
    val sampled = left.select(col(keyCol).as("__key"))
      .unionByName(right.select(col(keyCol).as("__key")))
      .sample(withReplacement = false, skewProbeFraction, seed = 7L)
      .groupBy(col("__key")).count()
      .agg(max(col("count")).as("m"), sum(col("count")).as("n"))
      .head()
    val skewed = !sampled.isNullAt(0) &&
      sampled.getLong(1) >= AsofSkewProbeMinSample &&
      sampled.getLong(0).toDouble / sampled.getLong(1) >= skewThreshold
    if (skewed) "salted" else "carry"
  }
}

/** Per-row backward as-of lookup against broadcast per-key sorted arrays:
  * rightmost right time <= left time (ties pre-resolved to the greatest
  * right id by the (time, id) sort), inclusive tolerance. NULL key or
  * time → NULL (KernelCodegen is null-intolerant). Output struct
  * (t: matched right time, rid: matched right id); the lookup table is
  * deliberately excluded from toString so plans stay readable. */
case class AsofPickBroadcast(
    left: Expression,
    right: Expression,
    table: Map[Any, (Array[Long], Array[Long])],
    tolerance: Long)
  extends BinaryExpression with KernelCodegen {

  override def prettyName: String = "asof_pick"
  override def toString: String = s"asof_pick($left, $right)"
  override def dataType: DataType = StructType(Seq(
    StructField("t", LongType, nullable = false),
    StructField("rid", LongType, nullable = false)))
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType | IntegerType | LongType, LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"asof_pick expects (string|int|long key, long time), got ${l.sql}, ${r.sql}")
    }

  override protected def kernelEval(args: Array[Any]): Any = {
    val t = args(1).asInstanceOf[Long]
    table.get(args(0)) match {
      case None => null
      case Some((times, ids)) =>
        // rightmost index with times(i) <= t
        var lo = 0
        var hi = times.length - 1
        var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (times(mid) <= t) { ans = mid; lo = mid + 1 } else hi = mid - 1
        }
        if (ans < 0) null
        else if (tolerance >= 0 && t - times(ans) > tolerance) null
        else InternalRow(times(ans), ids(ans))
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object AsofPickBroadcast {
  /** External collected value → the internal form `eval` will see
    * (strings arrive as UTF8String at runtime). */
  def internalKey(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }
}
