package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators the reference approximates with lead/lag windows
  * and orchestration-level partition mappings (SURVEY §2.4 J10, §1.1
  * LastPartitionMapping) — provided here as first-class, scale-safe
  * compositions of built-in operators (preference (a) of the custom-operator
  * ladder: no custom Catalyst needed).
  */
object Temporal {

  /** Backward as-of join: for each left row, attach the newest right row
    * with `rightTs <= leftTs` within the same key group.
    *
    * Implementation is the union + sort + last-non-null forward-fill trick:
    * both sides are tagged and unioned, ONE shuffle sorts (key, ts, side),
    * a running `last(ignoreNulls)` window carries every right value onto
    * subsequent left rows, and the output filters back to left rows. No
    * range predicate ever reaches a join — at any scale this is one
    * hash-shuffle of |left| + |right| rows, versus the quadratic blowup a
    * naive `left.ts >= right.ts` theta-join produces.
    *
    * `tolerance`: optional max allowed `leftTs - rightTs` (same units as
    * the ts columns); matches older than it are nulled out.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                       leftTs: String, rightTs: String, valueCols: Seq[String],
                       tolerance: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    // right rows sort BEFORE left rows at equal ts so an exact-ts right row
    // is visible to the left row (<= semantics)
    val taggedRight = right.select(
      (keyCols.map(col) :+ col(rightTs).cast("long").as("__ts") :+ lit(0).as("__side")) ++
        valueCols.map(c => col(c).as(s"__v_$c")): _*)
    val taggedLeft = left.select(
      (keyCols.map(col) :+ col(leftTs).cast("long").as("__ts") :+ lit(1).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val unioned = Relational.unionPadded(Seq(taggedRight, taggedLeft), lit(null))
    // Final order keys: the right-side values themselves. When several right
    // rows share (key, ts), the carried value is then the greatest value
    // tuple — deterministic across runs/partitionings (byte-identical rerun
    // gate) instead of partition-order dependent. Left rows all have null
    // __v_* so their relative order can't affect any fill.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts").asc +: col("__side").asc +:
        valueCols.map(c => col(s"__v_$c").asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the matched ROW as a struct, not each value column separately:
    // a per-column last(ignoreNulls) would skip a right row whose value IS
    // null and silently substitute an OLDER row's value — conflating "no
    // match yet" with "matched row carries null" (surfaced by the round-12
    // null-corpus campaign: j10/j14 returned a previous purchase's value
    // where the true latest purchase had value NULL). The struct is
    // non-null whenever ANY right row preceded, so the fill tracks row
    // presence; its fields stay exactly the matched row's values.
    val rowStruct = when(col("__side") === 0,
      struct(valueCols.map(c => col(s"__v_$c").as(c)): _*))
    val filled = unioned
      .withColumn("__match_ts",
        last(when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w))
      .withColumn("__vrow", last(rowStruct, ignoreNulls = true).over(w))
    val withinTol = tolerance match {
      case Some(t) => col("__match_ts").isNotNull && (col("__ts") - col("__match_ts")) <= t
      case None    => col("__match_ts").isNotNull
    }
    filled
      .filter(col("__side") === 1)
      .select(
        leftCols.map(col) ++
          valueCols.map(c => when(withinTol, col("__vrow").getField(c)).as(c)) :+
          when(withinTol, col("__match_ts")).as("asof_match_ts"): _*)
  }

  /** Forward as-of join: for each left row, the EARLIEST right row with
    * `rightTs >= leftTs` per key (the "next quote/next fill" lookup —
    * backward's mirror). Implemented by delegation: forward-asof on ts is
    * backward-asof on −ts, so it inherits the single-shuffle union+ffill
    * plan and the tolerance semantics (max allowed `rightTs − leftTs`)
    * for free. `asof_match_ts` is reported in the original time domain.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      leftTs: String, rightTs: String, valueCols: Seq[String],
                      tolerance: Option[Long] = None): DataFrame = {
    val negL = s"__neg_$leftTs"
    val l2 = left.withColumn(negL, -col(leftTs).cast("long"))
    val r2 = right.withColumn("__neg_rts", -col(rightTs).cast("long"))
    asofJoinBackward(l2, r2, keyCols, negL, "__neg_rts", valueCols, tolerance)
      .drop(negL)
      .withColumn("asof_match_ts", -col("asof_match_ts"))
  }

  /** Daily resample + gap-fill: expand each key's sparse day series onto a
    * continuous calendar spine ([min, max] day per key, `sequence` +
    * `explode`) and forward-fill the measure columns across the generated
    * gaps — the pandas `resample('D').ffill()` / date-spine idiom the
    * reference's day-grain models assume implicitly (every day present).
    *
    * Scale shape: the bounds aggregate and the ffill window both key on
    * `keys` (one shuffle each); the spine join keys on (keys, day). Spine
    * size is Σ per-key day-spans — generated, never read; a key's span of
    * N days costs N rows regardless of how sparse its data is.
    */
  def resampleDaily(df: DataFrame, keys: Seq[String], dayCol: String,
                    fillCols: Seq[String]): DataFrame = {
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
    val spine = bounds.select(keys.map(col) :+
      explode(sequence(col("__lo"), col("__hi"), expr("interval 1 day"))).as(dayCol): _*)
    val joined = spine.join(df, keys :+ dayCol, "left")
    Relational.ffill(joined, keys, Seq(dayCol), fillCols)
  }

  /** Point-in-interval range join via bucketing: join `points` to the
    * `intervals` containing them (`start <= point < end`, same key group).
    *
    * Each interval is exploded to the fixed-size bins it covers; points
    * compute their bin; the join is a plain equi-join on (keys, bin) with
    * a residual filter. Shuffle volume is |points| + Σ interval-spans/bin —
    * bounded and hash-partitioned, never the cross product AND never a
    * broadcast-only strategy (works when both sides are huge). Pick
    * `binSize` near the median interval length so most intervals explode
    * to ~1-2 bins.
    */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                        pointCol: String, startCol: String, endCol: String,
                        binSize: Long): DataFrame = {
    require(binSize > 0, "binSize must be positive")
    // Guard malformed intervals (end <= start): Spark's `sequence` would
    // auto-step BACKWARDS for them — a single corrupt row with end far below
    // start explodes into a huge descending bin array before the residual
    // filter can discard it. Emit no bins instead (explode drops the row).
    val binned = intervals.withColumn("__bin",
      explode(when(col(endCol) > col(startCol),
        sequence(
          floor(col(startCol).cast("long") / binSize),
          floor((col(endCol).cast("long") - 1) / binSize)))
        .otherwise(array().cast("array<long>"))))
    val pointBinned = points.withColumn("__bin",
      floor(col(pointCol).cast("long") / binSize))
    pointBinned
      .join(binned, keyCols :+ "__bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /** Time-weighted average (TWAP shape): each observation is weighted by
    * its HOLDING duration — the time until the key's next observation —
    * so irregularly-sampled series average correctly (a price held for an
    * hour counts 60× one held for a minute; a plain avg() overweights
    * bursts). The final open-ended observation carries no weight; keys
    * whose observations all share one timestamp (zero total duration)
    * are dropped rather than returning 0/0.
    *
    * One window (single exchange on the key) for the durations, then a
    * key-grouped partial-sum aggregate — same single-shuffle shape as
    * the W-family lead/lag ops. `tieCols` break equal-timestamp ordering
    * deterministically.
    */
  def timeWeightedAvg(df: DataFrame, keys: Seq[String], tsCol: String,
                      valueCol: String, tieCols: Seq[String] = Nil): DataFrame =
    withHoldingDur(df, keys, tsCol, tieCols)(
        (col("__nxt") - col(tsCol)).cast("double"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol) * col("__dur")).as("__num"),
        sum(col("__dur")).as("__den"))
      .filter(col("__den") > 0)
      .select(keys.map(col) :+ round(col("__num") / col("__den"), 6).as("twap"): _*)

  /** [[timeWeightedAvg]] with EXACT integer durations: the ts column must be
    * an integral epoch value, and each holding duration is `(next - ts) div
    * durDiv` in integral arithmetic — never double, so the weights and their
    * sum are bit-exact at any magnitude (`/` on longs evaluates in double
    * and loses integer exactness past 2^53 ≈ 104 days of nanos). Emits the
    * audit columns a warehouse TWAP serves alongside the average: interval
    * count and exact total duration. Same single-shuffle window + partial-agg
    * shape as [[timeWeightedAvg]]; zero-total-duration keys are dropped, not
    * 0/0.
    */
  def timeWeightedAvgExact(df: DataFrame, keys: Seq[String], tsCol: String,
                           valueCol: String, tieCols: Seq[String] = Nil,
                           durDiv: Long = 1L, scale: Int = 4): DataFrame =
    withHoldingDur(df, keys, tsCol, tieCols)(
        expr(s"(__nxt - `$tsCol`) div $durDiv"))
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("__dur")).as("total_dur"),
        round(sum(col(valueCol) * col("__dur")) / sum(col("__dur")), scale)
          .as("twap"))
      .filter(col("total_dur") > 0)

  /** ORDERED FUNNEL progression per user — the product-analytics
    * primitive ("reached view → click → purchase, in order"): returns
    * one row per user with `max_stage` = how many steps of `steps` were
    * completed in strict temporal order (each event advances at most one
    * stage, and a stage only advances on an event STRICTLY later than
    * the previous advance — so the result is exactly the classic
    * min-ts-chain form `t1 = min ts(step1), t2 = min ts(step2) > t1, …`,
    * which an external SQL engine can recompute with k chained
    * aggregates; the w17 gate cross-checks the two).
    *
    * BOUNDED-STATE hybrid. The fast path is a single shuffle: events
    * collect per user (sorted in the aggregation buffer) and the stage
    * scan is a Catalyst `aggregate` lambda over the sorted array. That
    * buffer is per-user-event-count sized — fine for humans, an OOM for
    * a bot holding 10⁷ events on one key — so users above
    * `maxBufferedPerUser` funnel-type events are routed to
    * [[funnelStagesChained]] instead (k aggregates, O(1) state per user,
    * no array ever materialized; the two forms are provably equal — see
    * the property spec). The routing census is one map-side-combinable
    * count on the same user key; the heavy side is, by construction, a
    * handful of skewed actors, so its k passes touch a sliver of the
    * data. Works for any orderable ts type (long epoch, timestamp, date).
    */
  def funnelStages(df: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String],
                   maxBufferedPerUser: Long = 1L << 16): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = df.filter(col(typeCol).isin(steps: _*)) // pushed to the scan
      .select(col(userCol), col(tsCol), col(typeCol))
    val heavy = ev.groupBy(col(userCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBufferedPerUser).select(col(userCol))
    funnelFold(ev.join(heavy, Seq(userCol), "left_anti"),
        userCol, tsCol, typeCol, steps)
      .unionByName(funnelChain(ev.join(heavy, Seq(userCol), "left_semi"),
        userCol, tsCol, typeCol, steps))
  }

  /** The single-shuffle sorted-array fold. The fold zero's `last` is a
    * NULL of the ts column's own type (any orderable type works —
    * `isNull` stands in for "no advance yet", so no sentinel value and
    * no bigint-only restriction).
    */
  private def funnelFold(ev: DataFrame, userCol: String, tsCol: String,
                         typeCol: String, steps: Seq[String]): DataFrame = {
    val k = steps.length
    val stepsArr = array(steps.map(lit): _*)
    val tsType = ev.schema(tsCol).dataType
    ev.groupBy(col(userCol))
      .agg(sort_array(collect_list(struct(col(tsCol).as("ts"),
        col(typeCol).as("tp")))).as("__evs"))
      .select(col(userCol),
        aggregate(col("__evs"),
          struct(lit(0).as("stage"), lit(null).cast(tsType).as("last")),
          (acc, ev) => {
            val advance = acc.getField("stage") < k &&
              ev.getField("tp") === element_at(stepsArr, acc.getField("stage") + 1) &&
              (acc.getField("last").isNull ||
                ev.getField("ts") > acc.getField("last"))
            when(advance, struct((acc.getField("stage") + 1).as("stage"),
                ev.getField("ts").as("last")))
              .otherwise(acc)
          }).getField("stage").as("max_stage"))
  }

  /** O(1)-state funnel: the chained min-ts form computed directly —
    * tᵢ = min(ts | type = stepᵢ ∧ ts > tᵢ₋₁), each a plain min aggregate
    * (k aggregates + k−1 left joins, all keyed on the user), `max_stage`
    * = count of non-null tᵢ. No per-user array exists at any point, so a
    * user with 10⁷ events costs the same aggregation buffer as one with
    * 10 — this is the scale path [[funnelStages]] selects above its
    * threshold, and it is usable directly when every user is suspect.
    * Equal to the fold for every input (including same-ts ties: both
    * forms advance only on STRICTLY greater ts, so tie order between
    * same-ts events can never matter — pinned by the property spec).
    */
  def funnelStagesChained(df: DataFrame, userCol: String, tsCol: String,
                          typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val ev = df.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(tsCol), col(typeCol))
    funnelChain(ev, userCol, tsCol, typeCol, steps)
  }

  private def funnelChain(ev: DataFrame, userCol: String, tsCol: String,
                          typeCol: String, steps: Seq[String]): DataFrame = {
    val k = steps.length
    // t1 over ALL funnel-type events (not just step-1) so every user with
    // any funnel event gets a row — the fold's output domain
    var acc = ev.groupBy(col(userCol))
      .agg(min(when(col(typeCol) === steps.head, col(tsCol))).as("__t1"))
    for (i <- 2 to k) {
      val prior = (1 until i).map(j => s"__t$j")
      acc = acc.join(
          ev.filter(col(typeCol) === steps(i - 1))
            .select(col(userCol), col(tsCol)),
          Seq(userCol), "left")
        .groupBy((userCol +: prior).map(col): _*)
        .agg(min(when(col(tsCol) > col(s"__t${i - 1}"), col(tsCol)))
          .as(s"__t$i"))
    }
    acc.select(col(userCol),
      (1 to k).map(j => when(col(s"__t$j").isNotNull, 1).otherwise(0))
        .reduce(_ + _).cast("int").as("max_stage"))
  }

  /** Shared TWAP-core: holding duration of each observation = the gap to
    * the key's NEXT observation (`durExpr` may reference the lead-ts as
    * `__nxt`); open-ended final observations (NULL duration) are dropped.
    * One window = one exchange on the key columns.
    */
  private def withHoldingDur(df: DataFrame, keys: Seq[String], tsCol: String,
                             tieCols: Seq[String])
                            (durExpr: => Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy((col(tsCol) +: tieCols.map(col)).map(_.asc): _*)
    df.withColumn("__nxt", lead(col(tsCol), 1).over(w))
      .withColumn("__dur", durExpr)
      .filter(col("__dur").isNotNull)
      .drop("__nxt")
  }
}
