package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Advanced analytics query families: exact percentiles, multi-level
  * aggregation (ROLLUP with grouping flags), cardinality sketches, the
  * full rank-function family, cumulative/moving windows, and null-safe
  * joins. These extend SURVEY §2.5/§2.6 coverage with the OLAP shapes a
  * warehouse engine is expected to serve alongside the reference's own
  * models (the reference pins its percentile/distro needs in
  * sm_token_holder_distro.sql:8-19 bucket form; these are the general
  * operators).
  *
  * Determinism: every float aggregate is round(4-6); rank functions ride
  * a total order (unique tie-break key); window sums run in frame order
  * on both engines so sequential rounding agrees.
  */
object AnalyticsQueries {

  /** Shared batch twin + verdict for the sessionization gates (w19
    * declarative session_window, w21 event-time timers — both face the
    * SAME DuckDB oracle): the lag/cumsum gap split over raw events in
    * the millisecond domain, sessions keyed by (user_id, start), a
    * full-outer equality verdict, the shared 30-minute gap. One
    * implementation so the gap semantics and the 2e-4 double-sum
    * tolerance can never drift between the gates.
    * `live` must carry (user_id, session_start_ms, n_events,
    * total_value). (user_id, session_start_ms) is unique on both sides
    * by construction — a session set keyed by start — so the count
    * full-outer is not dup-blind here. */
  private def sessionGapVerdict(s: SparkSession, dir: String,
                                live: DataFrame): DataFrame = {
    import s.implicits._
    val gapMs = 30L * 60 * 1000
    val w = Window.partitionBy($"user_id").orderBy($"ts_ms", $"event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val batch = t(s, dir, "events")
      .select($"user_id", expr("CAST(ts AS BIGINT) div 1000000").as("ts_ms"),
        $"event_id", coalesce($"value", lit(0.0)).as("value"))
      .withColumn("__prev", lag($"ts_ms", 1).over(w))
      .withColumn("__new",
        when($"__prev".isNull || ($"ts_ms" - $"__prev") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("__sid", sum($"__new").over(cum))
      .groupBy($"user_id", $"__sid")
      .agg(min($"ts_ms").as("session_start_ms"),
        count(lit(1)).as("n_events"),
        round(sum($"value"), 4).as("total_value"))
    val eq = live.select($"user_id", $"session_start_ms",
        $"n_events".as("__ne_l"), $"total_value".as("__tv_l"))
      .withColumn("__l", lit(1))
      .join(batch.select($"user_id", $"session_start_ms",
          $"n_events".as("__ne_b"), $"total_value".as("__tv_b"))
          .withColumn("__b", lit(1)),
        Seq("user_id", "session_start_ms"), "full")
      .agg(count($"__l").as("__nl"), count($"__b").as("__nb"),
        count(when($"__ne_l" === $"__ne_b" &&
          abs($"__tv_l" - $"__tv_b") <= 2e-4, 1)).as("__neq"))
    live.crossJoin(broadcast(eq))
      .select($"user_id", $"session_start_ms", $"n_events", $"total_value",
        ($"__nl" === $"__nb" && $"__neq" === $"__nl")
          .as("streaming_equals_batch"))
  }

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A11: exact interpolated percentiles per group, in the FEW-HUGE-
    // GROUPS scale shape: one range sort of the frame + per-group rank
    // arithmetic (Stats.exactQuantilesByGroup) instead of the built-in
    // percentile aggregate, whose per-group value→count map merges on the
    // single reducer owning the group — 3 return flags over 60 M rows put
    // ALL the work on 3 tasks (62 s at sf10; the sort form spreads the
    // same exact computation across every core). Values are identical:
    // order statistics + linear interpolation at rank p·(n−1). (At 100 TB
    // prefer a13's sketch path when approximation is acceptable; this is
    // the exact twin.)
    "a11_percentiles" -> ((s, dir) => {
      import s.implicits._
      graft.functions.Stats.exactQuantilesByGroup(
          t(s, dir, "lineitem"), "l_extendedprice", Seq("l_returnflag"),
          Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95),
          countCol = Some("n_rows"))
        .select($"l_returnflag",
          round($"p25", 4).as("p25"), round($"p50", 4).as("p50"),
          round($"p75", 4).as("p75"), round($"p95", 4).as("p95"),
          $"n_rows")
    }),

    // A12: ROLLUP multi-level aggregation with grouping flags — subtotal +
    // grand-total rows in ONE pass (Spark expands grouping sets before the
    // shuffle; map-side partial aggregation still applies).
    "a12_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(grouping($"l_returnflag").cast("int").as("g_rf"),
             grouping($"l_linestatus").cast("int").as("g_ls"),
             count(lit(1)).as("n_rows"),
             round(sum($"l_quantity"), 4).as("sum_qty"))
        .select(
          coalesce($"l_returnflag", lit("(all)")).as("returnflag"),
          coalesce($"l_linestatus", lit("(all)")).as("linestatus"),
          $"g_rf", $"g_ls", $"n_rows", $"sum_qty")
    }),

    // A13: HLL cardinality sketch vs exact — the 100 TB distinct-count
    // path: approx_count_distinct is a fixed-size mergeable sketch (no
    // per-key state explosion, single map-side-combinable aggregate),
    // where countDistinct shuffles every distinct key. The raw estimate
    // is engine-specific, so the DRIVER-CHECKED output is the exact twin
    // plus the error-bound VERDICT (|approx − exact| ≤ 3·rsd·exact,
    // computed in-plan): the oracle emits `true`, so any out-of-bound
    // estimate fails the hash compare — the sketch's accuracy contract
    // itself is what's gate-verified (upgraded from rows-only, round 8).
    "a13_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      // approx and exact as SEPARATE aggregations joined on the 3-row
      // group table: mixing countDistinct with another aggregate makes
      // Catalyst Expand every input row once per aggregate class — the
      // 60 M-row scan shuffled 120 M expanded rows (160 s at sf10).
      // Split, the HLL side is a pure map-side-combined sketch and the
      // exact side is the plain two-phase distinct (sf10: 160 -> 6.5 s).
      val li = t(s, dir, "lineitem").select($"l_returnflag", $"l_orderkey")
      val approx = li.groupBy($"l_returnflag")
        .agg(approx_count_distinct($"l_orderkey", rsd = 0.02).as("approx_orders"))
      val exact = li.distinct()
        .groupBy($"l_returnflag").agg(count(lit(1)).as("exact_orders"))
      approx.join(exact, Seq("l_returnflag"))
        .select($"l_returnflag", $"exact_orders",
          (abs($"approx_orders" - $"exact_orders") <=
            $"exact_orders" * lit(0.06)).as("within_bound"))
    }),

    // A20: count-min sketch probe — the frequency twin of a13's HLL: one
    // sublinear mergeable sketch over the full fact table, then the
    // heavy-hitter keys are estimated from the sketch and checked against
    // their exact counts. The estimates are sketch-internal, so the
    // DRIVER-CHECKED output carries the exact counts plus both contract
    // VERDICTS in-plan — never_undercount (structural: CMS can only
    // overcount) and within_eps (overcount ≤ eps·N, N derived in-plan) —
    // against an oracle that emits `true`/`true`: a violated bound fails
    // the hash compare (upgraded from rows-only, round 8; merge linearity
    // stays in AnalyticsSpec).
    "a20_countmin_probe" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      val sk = li.agg(graft.functions.Stats.countMinSketchAgg($"l_suppkey").as("sk"))
        .head().getAs[Array[Byte]](0)
      val bc = s.sparkContext.broadcast(sk)
      // deserialize the sketch ONCE per executor (transient lazy val in
      // the closure), not per probed row — readCountMin re-materializes
      // the full depth×width table (~1 MB at these params), which a
      // per-invocation call would pay on every row of an unlimited column
      val est = udf(new (Long => Long) with Serializable {
        @transient private lazy val cms = graft.functions.Stats.readCountMin(bc.value)
        def apply(key: Long): Long = cms.estimateCount(key)
      })
      li.groupBy($"l_suppkey").agg(count(lit(1)).as("exact"))
        .orderBy($"exact".desc, $"l_suppkey".asc).limit(20)
        .withColumn("cms_est", est($"l_suppkey"))
        .crossJoin(broadcast(li.agg(count(lit(1)).as("__n"))))
        .select($"l_suppkey", $"exact",
          ($"cms_est" >= $"exact").as("never_undercount"),
          ($"cms_est" - $"exact" <= ceil($"__n" * lit(1e-4))).as("within_eps"))
    }),

    // W8: cumulative running aggregates + 3-row moving average (the
    // running-balance / smoothing shape; frames are ROWS so sequential
    // float accumulation matches across engines).
    "w8_cumulative" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = w.rowsBetween(-2, 0)
      // decimal cumulative sum (skew-sf1): the hot customer's running
      // spend crosses 1e10 where double ulps exceed the round(4) quantum.
      // NO round after the double cast (skew-sf10): the decimal is exactly
      // 2dp, and at 3.6e11 running spend, x*1e4 > 2^51 — Spark's
      // BigDecimal round and DuckDB's numeric round disagree on the last
      // ulp there (64k diff rows in the hot partition).
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          sum($"o_totalprice".cast("decimal(18,2)")).over(cum)
            .cast("double").as("running_spend"),
          count(lit(1)).over(cum).as("n_so_far"),
          round(avg($"o_totalprice").over(mov), 4).as("moving_avg3"))
    }),

    // W9: the rank-function family over a total order (unique tie-break →
    // deterministic cross-engine): rank, dense_rank, ntile, percent_rank,
    // cume_dist.
    "w9_rank_family" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_orderpriority")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      t(s, dir, "orders")
        .select($"o_orderpriority", $"o_orderkey",
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cum_dist"))
    }),

    // A14: statistical aggregates — correlation, sample covariance,
    // sample stddev per group (one shuffle; Spark's streaming moment
    // formulas match DuckDB's at round precision).
    "a14_stats_aggs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          round(corr($"l_quantity", $"l_extendedprice"), 6).as("qty_price_corr"),
          round(covar_samp($"l_quantity", $"l_extendedprice"), 4).as("qty_price_covar"),
          round(stddev_samp($"l_discount"), 6).as("discount_stddev"),
          count(lit(1)).as("n_rows"))
    }),

    // A15: np.interp port (protocol_data_warehouse.py:379) — per-user
    // linear interpolation of purchase values at fixed query points, with
    // numpy's clamp-outside-range semantics. The knot arrays live inside
    // one collect_list row per user (bounded per-entity grids, the
    // reference's shape); evaluation is the pure Catalyst expression
    // Interp.linearInterp — no UDF.
    "a15_linear_interp" -> ((s, dir) => {
      import s.implicits._
      val knots = t(s, dir, "events")
        .filter($"event_type" === "purchase" && $"value".isNotNull)
        .groupBy($"user_id")
        .agg(sort_array(collect_list(struct(
          $"event_id".cast("double").as("x"), $"value".as("y")))).as("k"))
        .select($"user_id", $"k.x".as("xs"), $"k.y".as("ys"))
      knots.select($"user_id",
          posexplode(graft.functions.Interp.linearInterp(
            array(lit(2500.0), lit(5000.0), lit(7500.0)), $"xs", $"ys"))
            .as(Seq("pos0", "v")))
        .select($"user_id", ($"pos0" + 1).cast("long").as("qi"),
          round($"v", 6).as("v"))
    }),

    // W10: BATCH sessionization — gap-flag + running-sum session ids,
    // then per-session rollup (the SQL twin of the streaming
    // session_window operator; ts stays in integer nanos end-to-end so
    // the gap arithmetic is exact cross-engine).
    "w10_sessionize" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
      val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapNs = 30L * 60 * 1000 * 1000000L // 30 min in ns
      t(s, dir, "events")
        .withColumn("__prev", lag($"ts", 1).over(w))
        .withColumn("__new",
          when($"__prev".isNull || ($"ts" - $"__prev") > gapNs, 1L).otherwise(0L))
        .withColumn("session_id", sum($"__new").over(cum))
        .groupBy($"user_id", $"session_id")
        .agg(count(lit(1)).as("n_events"),
             min($"event_id").as("first_event"),
             max($"event_id").as("last_event"),
             // exact decimal session sums: the Zipf user's single 1.6M-event
             // session leaves double sum-order noise near the round(4) grid
             round(sum(coalesce($"value", lit(0.0)).cast("decimal(18,2)"))
               .cast("double"), 4).as("total_value"))
    }),

    // W11: per-group z-score outlier flagging — the statistical quality
    // gate of a data pipeline (drop events > 2σ from the user's mean).
    // Two window aggregates over one shuffle; the filter runs on the
    // ROUNDED z so the cutoff is stable across engines' sum-order ulps.
    // stddev guarded against 0/NULL (ANSI division) via when().
    "w11_zscore_outliers" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
      t(s, dir, "events")
        .withColumn("__mu", avg($"value").over(w))
        .withColumn("__sd", stddev_samp($"value").over(w))
        .withColumn("zscore",
          round(when($"__sd" =!= 0, ($"value" - $"__mu") / $"__sd"), 4))
        .filter(abs($"zscore") > 2.0)
        .select($"event_id", $"user_id", $"zscore")
    }),

    // O9: INTERSECT — set-distinct intersection (nation keys serving both
    // customers and suppliers). Planned as a left-semi over distincts.
    "o9_intersect" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_nationkey".cast("long").as("nationkey"))
        .intersect(
          t(s, dir, "supplier").select($"s_nationkey".cast("long").as("nationkey")))
    }),

    // O10: EXCEPT — set-distinct difference (customer nations with no
    // supplier). Planned as a left-anti over distincts.
    "o10_except" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_nationkey".cast("long").as("nationkey"))
        .except(
          t(s, dir, "supplier").select($"s_nationkey".cast("long").as("nationkey")))
    }),

    // O11: row-level upsert (MERGE emulation) — every 5th order re-lands
    // with a corrected price; merged view = update wins, others unchanged.
    "o11_upsert" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      val updates = base.filter($"o_orderkey" % 5 === 0)
        .select($"o_orderkey", lit("U").as("o_orderstatus"),
          round($"o_totalprice" * 1.1, 4).as("o_totalprice"))
      graft.operators.Relational.upsert(base, updates, Seq("o_orderkey"))
    }),

    // J11: null-safe equality join (<=> / IS NOT DISTINCT FROM) — nulls
    // match nulls, the semantics pandas merge gives on NaN keys and the
    // reference relies on for optional-key dims. Planned as a regular
    // hash join (null-safe equality is still a shuffle-hashable key).
    "j11_nullsafe_join" -> ((s, dir) => {
      import s.implicits._
      val withKey = t(s, dir, "orders").select($"o_orderkey",
        when($"o_orderstatus" === "O", lit(null).cast("string"))
          .otherwise($"o_orderstatus").as("k"),
        $"o_totalprice")
      val dim = withKey.groupBy($"k".as("k2"))
        .agg(round(sum($"o_totalprice".cast("decimal(18,2)")).cast("double") /
          count($"o_totalprice"), 4).as("avg_price_k"),
             count(lit(1)).as("n_k"))
      withKey.join(dim, $"k" <=> $"k2")
        .select($"o_orderkey", $"k", $"avg_price_k", $"n_k")
    }),

    // W13: exponentially-weighted moving average — pandas ewm(adjust=True)
    // semantics truncated to a 20-row window: y_i = Σ (1-α)^k x_{i-k} /
    // Σ (1-α)^k. The frame-bounded collect_list preserves frame order, so
    // the weighted fold is deterministic cross-engine; truncation keeps
    // the weights exactly representable on both sides (no recursive state,
    // no numeric blow-up of the closed-form 1/(1-α)^i trick).
    "w13_ewma" -> ((s, dir) => {
      import s.implicits._
      val alpha = 0.3
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey").rowsBetween(-19, 0)
      val xs = collect_list($"o_totalprice").over(w) // oldest..newest
      // HORNER fold, no pow (skew-sf1 fix): Σ xᵢ(1−α)^(n−1−i) computed as
      // acc·(1−α) + x left-to-right — the oracle folds the same list in
      // the same order with the same two IEEE ops, so the result is
      // BIT-identical across engines. pow(0.7, k) is NOT: Java and C libm
      // differ by an ulp for some k, and on the skew corpus's 150k-row
      // hot customer one of those ulps landed exactly on a round(4)
      // boundary (1-in-300k observed).
      val decay = lit(1.0 - alpha)
      t(s, dir, "orders")
        .withColumn("__xs", xs)
        .select($"o_custkey", $"o_orderkey",
          round(
            aggregate($"__xs", lit(0.0), (acc, x) => acc * decay + x) /
            aggregate($"__xs", lit(0.0), (acc, _) => acc * decay + lit(1.0)),
            4).as("ewma"))
    }),

    // W14: robust (median/MAD) outlier screen — the heavy-tail-safe twin
    // of w11's z-score gate: mean/σ move with the outliers they're meant
    // to find, median/MAD don't. Stats.robustOutliers supplies the
    // per-group median + MAD (two exact grouped percentiles, broadcast
    // back); the flag recomputes the robust z from the 4dp-ROUNDED
    // med/mad and compares at 6dp, so the cutoff is identical across
    // engines' percentile-interpolation ulps.
    // W15: time-weighted average — holding-duration weights for
    // irregularly-sampled series (ts is the parquet-nanos long; durations
    // are ns deltas to the next observation). One key-window + one
    // key-grouped aggregate: the single-shuffle W-family shape.
    "w15_twap" -> ((s, dir) => {
      graft.operators.Temporal.timeWeightedAvg(t(s, dir, "events"),
        Seq("user_id"), "ts", "value", tieCols = Seq("event_id"))
    }),

    "w14_mad_outliers" -> ((s, dir) => {
      import s.implicits._
      val scored = graft.functions.Stats.robustOutliers(
        t(s, dir, "lineitem").select($"l_returnflag", $"l_extendedprice"),
        Seq("l_returnflag"), "l_extendedprice", k = 1.2)
      scored
        .withColumn("__z", round(
          abs($"l_extendedprice" - round($"med", 4)) /
            (lit(1.4826) * round($"mad", 4)), 6))
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
             count(when($"__z" > 1.2, 1)).as("n_outliers"),
             round(max($"med"), 4).as("med"),
             round(max($"mad"), 4).as("mad"))
    }),

    // A18: quantile feature binning — bucket each row by which quartile of the
    // GLOBAL value distribution it falls in (the ML feature discretizer).
    // Edges come from one exact-quantile pass (sort+rank form — the
    // built-in percentile aggregate merged a 60 M-value map on one
    // reducer, 200 s at sf10; campaign find #3) broadcast as 1 row;
    // rounded to 4dp on both engines so the edge comparison is identical.
    "a18_quantile_bucket" -> ((s, dir) => {
      import s.implicits._
      val edges = graft.functions.Stats.exactQuantiles(
          t(s, dir, "lineitem"), "l_extendedprice",
          Seq("q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75))
        .select(round($"q1", 4).as("q1"), round($"q2", 4).as("q2"),
          round($"q3", 4).as("q3"))
      t(s, dir, "lineitem")
        .crossJoin(broadcast(edges))
        .select($"l_orderkey", $"l_partkey", $"l_suppkey",
          when($"l_extendedprice" <= $"q1", 1)
            .when($"l_extendedprice" <= $"q2", 2)
            .when($"l_extendedprice" <= $"q3", 3)
            .otherwise(4).cast("int").as("bucket"))
    }),

    // A19: custom typed Aggregator (UDAF rung of the custom-op ladder) —
    // Welford/Chan streaming mean+stddev with associative partial-state
    // merge (map-side combine like any built-in agg). Oracle = the
    // built-in avg/stddev_samp, which the stable form must reproduce.
    "a19_welford_udaf" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(graft.functions.Stats.welford($"l_extendedprice").as("w"),
             count(lit(1)).as("n_rows"))
        .select($"l_returnflag",
          round($"w.mean", 4).as("mean_price"),
          round($"w.stddev", 4).as("stddev_price"),
          $"n_rows")
    }),

    // A16: arbitrary GROUPING SETS (not just the ROLLUP chain of A12) —
    // mixed-level subtotals in one pass; Spark expands the sets before the
    // shuffle so map-side partial aggregation still applies to every set.
    "a16_grouping_sets" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("l_gs")
      s.sql("""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
                      coalesce(l_linestatus, '(all)') AS linestatus,
                      CAST(grouping(l_returnflag) AS INT) AS g_rf,
                      CAST(grouping(l_linestatus) AS INT) AS g_ls2,
                      count(1) AS n_rows,
                      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                           AS DOUBLE) AS sum_price
               FROM l_gs
               GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""")
    }),

    // A17: heavy-hitter profile — the skew DIAGNOSTIC for choosing salting
    // / broadcast strategies: top-20 keys by row count with share and
    // cumulative share. The global window runs over the already-aggregated
    // key table (|keys| rows, not |rows|), so the single-partition sort is
    // bounded by key cardinality — and the groupBy beneath it combines
    // map-side.
    "a17_heavy_hitters" -> ((s, dir) => {
      import s.implicits._
      val counts = t(s, dir, "lineitem")
        .groupBy($"l_suppkey").agg(count(lit(1)).as("cnt"))
      // onePartKey = the same single partition, minus the WindowExec
      // no-partition warning (keeps logs clean so a REAL full-table
      // global window would stand out; plain lit(0) gets optimized away)
      val one = graft.operators.Relational.onePartKey($"cnt")
      val wOrd = Window.partitionBy(one).orderBy($"cnt".desc, $"l_suppkey".asc)
      counts
        .withColumn("total", sum($"cnt").over(Window.partitionBy(one)))
        .withColumn("rank", row_number().over(wOrd))
        .withColumn("cum", sum($"cnt").over(
          wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter($"rank" <= 20)
        .select($"l_suppkey", $"cnt", $"rank",
          round($"cnt" / $"total", 6).as("share"),
          round($"cum" / $"total", 6).as("cum_share"))
    }),

    // A21: per-group closed-form OLS (slope / intercept / r²) — the
    // regression-in-SQL every warehouse serves without ML machinery.
    // TWO-PASS CENTERED moments, not the one-pass raw-moment identity:
    // `Σxy/n − x̄·ȳ` subtracts near-equal large moments, so any
    // accumulation-order ulp (Spark partial-agg vs DuckDB) is AMPLIFIED
    // by the cancellation and can flip a round(4) boundary. Centered
    // sums Σ(x−x̄)(y−ȳ) have no cancellation (relative error stays
    // ~1e-15 regardless of data magnitude), and the result is smooth in
    // x̄ itself, so sub-ulp mean differences can't move it. Cost: a
    // second scan plus a BROADCAST of the |groups|-row means table —
    // the robust default for a gate query; use the one-pass form only
    // when a second scan is genuinely unaffordable. Both engines
    // evaluate the identical centered algebra (the oracle spells it out
    // rather than using DuckDB's regr_*).
    "a21_group_ols" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select($"l_returnflag", $"l_quantity".as("x"), $"l_extendedprice".as("y"))
      // mx: quantity is integer-valued, its double sum is exact; my: price
      // is fractional, so the mean routes through an exact decimal sum —
      // both engines then center on bit-identical means (skew-sf10
      // decimal discipline; the centered product sums stay double and
      // carry a documented sub-boundary ulp risk)
      val means = li.groupBy($"l_returnflag")
        .agg(avg($"x").as("mx"),
          (sum($"y".cast("decimal(18,2)")).cast("double") / count($"y"))
            .as("my"),
          count(lit(1)).as("n"))
      li.join(broadcast(means), "l_returnflag")
        .groupBy($"l_returnflag")
        .agg(first($"n").as("n"), first($"mx").as("mx"), first($"my").as("my"),
          sum(($"x" - $"mx") * ($"y" - $"my")).as("sxy"),
          sum(($"x" - $"mx") * ($"x" - $"mx")).as("sxx"),
          sum(($"y" - $"my") * ($"y" - $"my")).as("syy"))
        .select($"l_returnflag", $"n".as("n_rows"),
          round($"sxy" / $"sxx", 4).as("slope"),
          round($"my" - ($"sxy" / $"sxx") * $"mx", 4).as("intercept"),
          round($"sxy" * $"sxy" / ($"sxx" * $"syy"), 6).as("r2"))
    }),

    // W16: time-weighted average (TWAP) per event type — irregular ticks
    // weighted by the exact integer-microsecond interval to the NEXT tick
    // of the same type (last tick carries no forward interval). The
    // weights are INTEGERS on both engines: Tables.t normalizes events.ts
    // to an epoch-NANOS long at the read point (Tables.scala:20-48; the
    // DuckDB twin reads the same value via epoch_ns), and the µs interval
    // is integral `div` — never double `/`, which loses exactness past
    // 2^53 ns — so the only float is the value itself; round(4). Built on
    // Temporal.timeWeightedAvgExact (the audited-TWAP form of w15's
    // Temporal.timeWeightedAvg: same single-window shape, exact integral
    // durations plus interval-count/total-duration audit columns).
    "w16_twap" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_type", $"event_id", $"ts".as("ts_ns"), $"value")
      graft.operators.Temporal.timeWeightedAvgExact(ev, Seq("event_type"),
          "ts_ns", "value", tieCols = Seq("event_id"), durDiv = 1000L)
        .withColumnRenamed("total_dur", "total_us")
    }),

    // W17: ORDERED FUNNEL (view → click → purchase) — per-user strict
    // temporal progression via Temporal.funnelStages (ONE shuffle: sorted
    // per-user scan in a Catalyst aggregate lambda), reported as per-step
    // reach counts/rates over the funnel-eligible users. The oracle
    // recomputes with the equivalent k-chained min-ts form (t1 = first
    // view, t2 = first click AFTER t1, t3 = first purchase AFTER t2) —
    // two independent implementations of the same semantics, hash-matched.
    "w17_funnel_steps" -> ((s, dir) => {
      import s.implicits._
      val steps = Seq("view", "click", "purchase")
      val ev = t(s, dir, "events")
        .select($"user_id", expr("CAST(ts AS BIGINT) div 1000").as("ts_us"),
          $"event_type")
      // census threshold 8192: a no-op on the uniform corpus (~67
      // events/user) but LOW enough that the planted-Zipf skew corpus
      // (top user ≈ 16% of all events) actually routes its heavy users
      // through the O(1)-state chained form — the gate then exercises
      // BOTH sides of the hybrid on real data, not just in the property
      // spec (fold ≡ chain is provably equal, so the oracle is unchanged)
      val stages = graft.operators.Temporal.funnelStages(ev, "user_id",
        "ts_us", "event_type", steps, maxBufferedPerUser = 8192L)
      val aggs = count(lit(1)).as("__n") +:
        steps.indices.map(i =>
          sum(when($"max_stage" >= i + 1, 1L).otherwise(0L)).as(s"__s$i"))
      val one = stages.agg(aggs.head, aggs.tail: _*)
      val rows = steps.zipWithIndex.map { case (name, i) =>
        struct(lit(i + 1).as("step"), lit(name).as("step_name"),
          col(s"__s$i").as("n_users"),
          round(col(s"__s$i") / col("__n"), 6).as("reach_rate"))
      }
      one.select(explode(array(rows: _*)).as("r")).select("r.*")
    }),

    // W18: the STREAMING funnel surfaced through the driver gate — an
    // availableNow pass of Streams.funnelTws (transformWithState on the
    // RocksDB state store, buffer-until-watermark event-time fold) over
    // the SAME events the batch operator reads, gated on exact equality
    // with Temporal.funnelStages. Mechanics: run 1 ingests every real
    // event (no watermark yet → all buffer in ListState); two far-future
    // flush rows in two separate files then drive run 2 as two
    // micro-batches (maxFilesPerTrigger=1) — the first advances the
    // watermark past every real event, the second's batch folds them (a
    // batch sees the watermark the PREVIOUS batch set, and the per-key
    // event-time timers fire keys with no new input). Both sides fold in
    // the MILLISECOND domain (the processor keys on Timestamp.getTime).
    // Payload = w17-style reach rows computed from the STREAMED stages
    // (a divergence breaks the hash, not just the verdict); verdict =
    // per-user equality with the batch fold, oracle rides `true`.
    "w18_live_funnel" -> ((s, dir) => {
      import s.implicits._
      val steps = Seq("view", "click", "purchase")
      val tmp = TrainingQueries.Scratch.dir(s, "w18_stream")
      // fresh stream state every invocation — bench times each query
      // twice in one JVM, and a reused checkpoint would make run 2 a
      // no-data no-op reading run 1's output
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val ev = t(s, dir, "events").select($"user_id",
        expr("timestamp_millis(CAST(ts AS BIGINT) div 1000000)").as("ts"),
        $"event_type".as("step"))
      ev.filter($"step".isin(steps: _*)).coalesce(1)
        .write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      def flush(tsStr: String): Unit =
        Seq((-1L, java.sql.Timestamp.valueOf(tsStr), "view"))
          .toDF("user_id", "ts", "step").coalesce(1)
          .write.mode("append").parquet(src)
      graft.streaming.Streams.withGateStreamConfs(s) {
        def run(): Unit = graft.streaming.Streams.runAvailableNow(
          graft.streaming.Streams.funnelTws(
            graft.streaming.Streams.parquetStream(s, src, schema,
              maxFilesPerTrigger = 1).as[graft.streaming.Streams.FunnelEv],
            steps).toDF(), out, ckpt)
        run()
        flush("2099-01-01 00:00:00")
        flush("2099-01-02 00:00:00")
        run()
      }
      // current state per user = the max-n_seen row (each fold advance
      // appends one running row); flush user excluded
      val live = s.read.parquet(out).filter($"user_id" =!= -1L)
        .groupBy($"user_id").agg(max_by($"max_stage", $"n_seen").as("max_stage"))
      val batch = graft.operators.Temporal.funnelStages(
        t(s, dir, "events").select($"user_id",
          expr("CAST(ts AS BIGINT) div 1000000").as("ts_ms"), $"event_type"),
        "user_id", "ts_ms", "event_type", steps)
      val eq = live.select($"user_id", $"max_stage".as("s_live"))
        .withColumn("__l", lit(1))
        .join(batch.select($"user_id", $"max_stage".as("s_batch"))
            .withColumn("__b", lit(1)), Seq("user_id"), "full")
        .agg(count($"__l").as("__nl"), count($"__b").as("__nb"),
          count(when($"s_live" === $"s_batch", 1)).as("__neq"))
      val aggs = count(lit(1)).as("__n") +:
        steps.indices.map(i =>
          sum(when($"max_stage" >= i + 1, 1L).otherwise(0L)).as(s"__s$i"))
      val one = live.agg(aggs.head, aggs.tail: _*)
      val rows = steps.zipWithIndex.map { case (name, i) =>
        struct(lit(i + 1).as("step"), lit(name).as("step_name"),
          col(s"__s$i").as("n_users"),
          round(col(s"__s$i") / col("__n"), 6).as("reach_rate"))
      }
      one.select(explode(array(rows: _*)).as("r")).select("r.*")
        .crossJoin(broadcast(eq))
        .select($"step", $"step_name", $"n_users", $"reach_rate",
          ($"__nl" === $"__nb" && $"__neq" === $"__nl")
            .as("streaming_equals_batch"))
    }),

    // W19: LIVE SESSIONIZATION in the gate (round 12) — the fourth
    // gate-checked streaming path, and the first through the DECLARATIVE
    // stateful engine: `session_window` gap-merge windowed aggregation
    // (Streams.sessionWindowCounts) — no custom state processor at all,
    // unlike w18/c2 (transformWithState) and o17 (foreachBatch fold).
    // Append-mode discipline: a session row is emitted exactly once, when
    // the watermark passes its close — so the w18 flush trick (two
    // far-future rows in two files, maxFilesPerTrigger=1) seals every
    // real session before the drain ends. Both sides work in the
    // MILLISECOND domain. Session-boundary semantics pinned by the spec:
    // events exactly `gap` apart MERGE (session extent is [ts, ts+gap],
    // closed end) — so the batch twin and the DuckDB oracle split on
    // `diff > gap`, same as w10's batch operator. Payload = the streamed
    // per-session rows themselves (user, start_ms, n_events, value sum) —
    // DuckDB recomputes every session from raw events, so a streaming
    // divergence breaks the hash, not just the verdict; verdict =
    // full-outer equality with the batch gap-split twin.
    "w19_live_sessions" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "w19_stream")
      // fresh stream state every invocation (bench runs each query twice
      // in one JVM; a reused checkpoint would no-op run 2)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val ev = t(s, dir, "events").select($"user_id",
        expr("timestamp_millis(CAST(ts AS BIGINT) div 1000000)").as("ts"),
        coalesce($"value", lit(0.0)).as("value"))
      // ONE CORPUS BATCH is the load-bearing property under the 0-second
      // watermark delay (an intermediate advance would drop later-file
      // rows as late), not one corpus FILE — w21's 8-file/run-matched
      // maxFilesPerTrigger treatment, see there for the mechanics.
      ev.coalesce(8).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      def flush(tsStr: String): Unit =
        Seq((-1L, java.sql.Timestamp.valueOf(tsStr), 0.0))
          .toDF("user_id", "ts", "value").coalesce(1)
          .write.mode("append").parquet(src)
      graft.streaming.Streams.withGateStreamConfs(s,
        Streams.gateStatePartitions(t(s, dir, "events").count())) {
        def run(mfpt: Int): Unit = Streams.runAvailableNow(
          Streams.sessionWindowCounts(
            Streams.parquetStream(s, src, schema, maxFilesPerTrigger = mfpt),
            "ts", "user_id"),
          out, ckpt)
        run(8) // ingests all real events in ONE batch; nothing sealed yet
        flush("2099-01-01 00:00:00")
        flush("2099-01-02 00:00:00")
        run(1) // flush 1 advances the watermark, flush 2's batch seals all
      }
      val live = s.read.parquet(out).filter($"user_id" =!= -1L)
        .select($"user_id", unix_millis($"session_start").as("session_start_ms"),
          $"n_events", round($"total_value", 4).as("total_value"))
      // batch twin: w10's gap-split sessionization in the same ms domain
      // (split on diff > gap — the merge-at-exactly-gap semantics above)
      sessionGapVerdict(s, dir, live)
    }),

    // W20: LIVE WATERMARKED WINDOW ROLLUP in the gate (round 12) — the
    // bread-and-butter streaming aggregation (Streams.windowedCounts:
    // tumbling 1-hour windows per event_type, declarative windowed-agg
    // state, Append mode) was the LAST basic streaming shape with no
    // gate check. Unlike w19's single-file ingest, the source here is
    // FOUR parquet files drained one per micro-batch, so every window
    // accumulates across batches from out-of-order slices of the month;
    // the watermark delay (800 h) exceeds the corpus's 30-day span, so
    // no real row can ever be late — cross-batch folding is exercised
    // while determinism is preserved — and the two far-future flush
    // rows (w19's trick: flush 1 advances the watermark, flush 2's
    // batch seals) emit every real window before the drain ends.
    // Payload = every sealed (window, event_type) row; DuckDB
    // recomputes all of them from raw events via an epoch-ms floor-div
    // tumble, so a streaming divergence breaks the hash, not just the
    // verdict. Verdict = full-outer equality vs the batch floor-div
    // twin. Both sides work in the MILLISECOND domain (the parquet
    // nanos truncate identically on write).
    "w20_live_windowed_counts" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "w20_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val ev = t(s, dir, "events").select($"event_type",
        expr("timestamp_millis(CAST(ts AS BIGINT) div 1000000)").as("ts"),
        coalesce($"value", lit(0.0)).as("value"))
      ev.repartition(4).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      def flush(tsStr: String): Unit =
        Seq(("___flush", java.sql.Timestamp.valueOf(tsStr), 0.0))
          .toDF("event_type", "ts", "value").coalesce(1)
          .write.mode("append").parquet(src)
      graft.streaming.Streams.withGateStreamConfs(s) {
        def run(): Unit = Streams.runAvailableNow(
          Streams.windowedCounts(
            Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 1),
            "ts", "1 hour", "800 hours"),
          out, ckpt)
        run() // four batches ingest the month; nothing sealed yet
        flush("2099-01-01 00:00:00")
        flush("2099-01-02 00:00:00")
        run() // flush 1 advances the watermark, flush 2's batch seals
      }
      val live = s.read.parquet(out).filter($"event_type" =!= "___flush")
        .select(unix_millis($"window_start").as("window_start_ms"),
          $"event_type", $"n_events",
          round($"total_value", 4).as("total_value"))
      val batch = t(s, dir, "events")
        .select($"event_type",
          expr("CAST(ts AS BIGINT) div 1000000").as("ts_ms"),
          coalesce($"value", lit(0.0)).as("value"))
        .groupBy(($"ts_ms" - pmod($"ts_ms", lit(3600000L))).as("window_start_ms"),
          $"event_type")
        .agg(count(lit(1)).as("__ne_b"),
          round(sum($"value"), 4).as("__tv_b"))
      val eq = live.select($"window_start_ms", $"event_type",
          $"n_events".as("__ne_l"), $"total_value".as("__tv_l"))
        .withColumn("__l", lit(1))
        .join(batch.withColumn("__b", lit(1)),
          Seq("window_start_ms", "event_type"), "full")
        .agg(count($"__l").as("__nl"), count($"__b").as("__nb"),
          count(when($"__ne_l" === $"__ne_b" &&
            abs($"__tv_l" - $"__tv_b") <= 2e-4, 1)).as("__neq"))
      live.crossJoin(broadcast(eq))
        .select($"window_start_ms", $"event_type", $"n_events", $"total_value",
          ($"__nl" === $"__nb" && $"__neq" === $"__nl")
            .as("streaming_equals_batch"))
    }),

    // J15: LIVE STREAM-STREAM INTERVAL JOIN in the gate (round 12) —
    // the one streaming JOIN shape (Streams.intervalJoin: view→purchase
    // attribution, same user, purchase within [view, view+30 min]) had
    // no gate check. Both sides are independent file streams (two files
    // each, one per micro-batch), so matches must pair rows that arrive
    // in DIFFERENT batches out of order — exactly the buffered-state
    // behavior the operator exists for; the watermark delay (800 h)
    // exceeds the data span so no buffered row is evicted before its
    // partner arrives, keeping the pair set deterministic (production
    // tightens the watermark to bound state; the gate widens it to pin
    // semantics). Inner join ⇒ Append-mode emits each pair exactly
    // once, no flush rows needed. Everything is compared in the
    // MILLISECOND domain on both engines (the ns→ms truncation happens
    // before the range test, so a pair within 1 ms of the 30-min
    // boundary cannot flip between Spark and DuckDB). Payload = every
    // (view, purchase) pair with its lag; verdict = full-outer equality
    // vs the batch range-join twin.
    "j15_live_interval_join" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "j15_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val srcL = s"$tmp/view"; val srcR = s"$tmp/purchase"
      val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val ev = t(s, dir, "events").select($"user_id", $"event_id",
        expr("timestamp_millis(CAST(ts AS BIGINT) div 1000000)").as("ts"),
        $"event_type")
      ev.filter($"event_type" === "view").drop("event_type")
        .repartition(2).write.mode("overwrite").parquet(srcL)
      ev.filter($"event_type" === "purchase").drop("event_type")
        .repartition(2).write.mode("overwrite").parquet(srcR)
      graft.streaming.Streams.withGateStreamConfs(s) {
        // the BUCKETED form is the one the gate runs: the plain
        // intervalJoin's per-key state probe is quadratic on a hot key
        // (skew-sf1's Zipf user pinned one task for 30+ min — see
        // intervalJoinBucketed's Scaladoc); bucketing by 30-min windows
        // bounds the probe and the result set is IDENTICAL (same oracle)
        val joined = Streams.intervalJoinBucketed(
          Streams.parquetStream(s, srcL, s.read.parquet(srcL).schema,
            maxFilesPerTrigger = 1),
          Streams.parquetStream(s, srcR, s.read.parquet(srcR).schema,
            maxFilesPerTrigger = 1),
          "user_id", "ts", beforeMs = 0L, afterMs = 1800000L,
          bucketMs = 1800000L, watermark = "800 hours")
        Streams.runAvailableNow(
          joined.select($"user_id", $"event_id".as("view_id"),
            $"r_event_id".as("purchase_id"),
            (unix_millis($"r_ts") - unix_millis($"ts")).as("lag_ms")),
          out, ckpt)
      }
      val live = s.read.parquet(out)
      val evB = t(s, dir, "events").select($"user_id", $"event_id",
        expr("CAST(ts AS BIGINT) div 1000000").as("ts_ms"), $"event_type")
      val v = evB.filter($"event_type" === "view")
        .select($"user_id", $"event_id".as("view_id"), $"ts_ms".as("__vms"))
      val p = evB.filter($"event_type" === "purchase")
        .select($"user_id".as("__puid"), $"event_id".as("purchase_id"),
          $"ts_ms".as("__pms"))
      val batch = v.join(p, $"user_id" === $"__puid" &&
          $"__pms" >= $"__vms" && $"__pms" <= $"__vms" + lit(1800000L))
        .select($"view_id", $"purchase_id", ($"__pms" - $"__vms").as("__lag_b"))
      // grouped-live verdict (o20's discipline): "every pair found
      // EXACTLY once" is this gate's core claim — a raw full-outer's
      // counts stay equal when a pair is emitted twice
      val eq = live.groupBy($"view_id", $"purchase_id")
        .agg(count(lit(1)).as("__c"), min($"lag_ms").as("__lag_l"))
        .join(batch, Seq("view_id", "purchase_id"), "full")
        .agg((count(when($"__c".isNull || $"__lag_b".isNull ||
          $"__c" =!= 1 || $"__lag_l" =!= $"__lag_b", 1)) === 0).as("__ok"))
      live.crossJoin(broadcast(eq))
        .select($"user_id", $"view_id", $"purchase_id", $"lag_ms",
          $"__ok".as("streaming_equals_batch"))
    }),

    // T29: LIVE DETERMINISTIC BOTTOM-K SAMPLE in the gate (round 12) —
    // the transformWithState LISTSTATE sampler (Streams.
    // bottomKSampleStream: keep the k smallest md5(doc_id) per language,
    // O(k) state, no RNG — so the live sample IS the batch bottom-k over
    // all history at every point). Ingest is three files, one per
    // micro-batch; each batch emits the running sample per language and
    // the CONVERGED row (max n_seen per language — n_seen strictly
    // increases per emission, so it is unique) must equal the
    // single-shot batch sample over the whole corpus — which DuckDB
    // recomputes independently from its own md5() (both engines hash
    // the decimal string of doc_id, so the hex ranks agree exactly).
    // This pins the merge property hash-rank sampling is chosen FOR at
    // 100 TB: the sample of a union is computable from samples of the
    // parts, no matter how the stream batches them. Verdict = per-lang
    // equality (count + exact sample string) vs the batch window twin.
    "t29_live_bottomk_sample" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "t29_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      t(s, dir, "documents").select($"lang", $"doc_id")
        .repartition(3).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      graft.streaming.Streams.withGateStreamConfs(s) {
        val docs = Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 1)
          .as[Streams.SampleDoc]
        Streams.runAvailableNow(
          Streams.bottomKSampleStream(docs, 8).toDF(), out, ckpt)
      }
      val wLast = Window.partitionBy($"lang").orderBy($"n_seen".desc)
      val live = s.read.parquet(out)
        .withColumn("__rn", row_number().over(wLast)).filter($"__rn" === 1)
        .select($"lang", $"n_seen", $"sample_ids")
      val wB = Window.partitionBy($"lang").orderBy($"__h", $"doc_id")
      val ranked = t(s, dir, "documents").select($"lang", $"doc_id")
        .withColumn("__h", md5($"doc_id".cast("string")))
        .withColumn("__bn", row_number().over(wB))
      val bSample = ranked.filter($"__bn" <= 8)
        .groupBy($"lang")
        .agg(concat_ws(",",
          transform(array_sort(collect_list(struct($"__bn", $"doc_id"))),
            x => x("doc_id").cast("string"))).as("__sample_b"))
      val bN = t(s, dir, "documents").groupBy($"lang")
        .agg(count(lit(1)).as("__n_b"))
      val eq = live.withColumn("__l", lit(1))
        .join(bSample.join(bN, Seq("lang")).withColumn("__b", lit(1)),
          Seq("lang"), "full")
        .agg(count($"__l").as("__nl"), count($"__b").as("__nb"),
          count(when($"n_seen" === $"__n_b" &&
            $"sample_ids" === $"__sample_b", 1)).as("__neq"))
      live.crossJoin(broadcast(eq))
        .select($"lang", $"n_seen", $"sample_ids",
          ($"__nl" === $"__nb" && $"__neq" === $"__nl")
            .as("streaming_equals_batch"))
    }),

    // C2: LIVE CORPUS PREP in the gate (round 11) — the second streaming
    // path the driver binary checks (after w18): the whole stateful tail
    // of corpus prep (permanent-state dedup CHAINED into per-language
    // packing — two transformWithState operators in ONE query, RocksDB
    // store) runs availableNow over the documents table streamed from
    // parquet; payload = the per-(lang, pack) manifest the oracle
    // recomputes from raw text (filters → min-doc-id dedup → prefix-scan
    // packing), verdict = per-doc pack assignment ≡ the BATCH
    // packSequences over the same survivors (full outer join, zero
    // mismatches).
    "c2_live_corpus_prep" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "c2_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      t(s, dir, "documents").select($"doc_id", $"text")
        .write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      graft.streaming.Streams.withGateStreamConfs(s) {
        val kept = Streams.corpusPrepStream(
            Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 100000))
          .as[Streams.FpMeta]
        Streams.runAvailableNow(Streams.corpusPrepTws(kept, 2048L).toDF(), out, ckpt)
      }
      val streamed = s.read.parquet(out)
      // batch twin: same stateless front (one implementation), window
      // dedup, prefix-scan packing
      val keptB = Streams.corpusPrepStream(t(s, dir, "documents"))
      val wFp = org.apache.spark.sql.expressions.Window
        .partitionBy($"fingerprint").orderBy($"doc_id")
      val dedupB = keptB.withColumn("rn", row_number().over(wFp))
        .filter($"rn" === 1).select($"doc_id", $"lang", $"n_tokens")
      val packB = graft.functions.Text
        .packSequences(dedupB, "lang", "doc_id", "n_tokens", 2048L)
        .select($"doc_id", $"pack_id".as("__bp"))
      val eq = streamed.select($"doc_id", $"pack_id").withColumn("__s", lit(1))
        .join(packB.withColumn("__b", lit(1)), Seq("doc_id"), "full")
        .agg((count(when($"__s".isNull || $"__b".isNull ||
          $"pack_id" =!= $"__bp", 1)) === 0).as("__ok"))
      streamed.groupBy($"lang", $"pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").cast("long").as("pack_tokens"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
        .crossJoin(broadcast(eq))
        .select($"lang", $"pack_id", $"n_docs", $"pack_tokens",
          $"first_doc", $"last_doc", $"__ok".as("stream_matches_batch"))
    }),

    // W21: EVENT-TIME TIMER SESSIONIZATION in the gate (round 12) —
    // the transformWithState TIMER path (Streams.sessionizeTws /
    // handleExpiredTimer): sessions close exactly when the WATERMARK
    // passes lastSeen + gap — never wall-clock-early — so unlike w19's
    // declarative session_window (sealed by the engine's windowed-agg
    // state), every emitted row here comes out of a first-class
    // per-key timer firing. Same ingest discipline as w19 (single real
    // file so nothing is late under the 0-second watermark delay; two
    // far-future flush rows fire all timers before the drain ends),
    // same MILLISECOND domain, and deliberately the SAME ORACLE as
    // w19: two independent stateful engines (timer merge vs gap-merge
    // window) must land on the identical session set DuckDB recomputes
    // from raw events. Verdict = full-outer equality vs the batch
    // gap-split twin.
    "w21_live_timer_sessions" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "w21_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val ev = t(s, dir, "events").select($"user_id",
        expr("timestamp_millis(CAST(ts AS BIGINT) div 1000000)").as("ts"),
        coalesce($"value", lit(0.0)).as("value"))
      // The load-bearing ingest property is ONE CORPUS BATCH (an
      // intermediate watermark advance would fire session timers early
      // for users whose remaining events sit in a later, unordered
      // file), not one corpus FILE: 8 files + run-1 maxFilesPerTrigger=8
      // keep the single-batch semantics while the write and scan
      // parallelize (the coalesce(1) form pushed 10 M rows through one
      // task at sf10). Run 2 keeps mFPT=1 so the two flush files stay
      // SEPARATE batches — Spark derives batch N+1's watermark from
      // batch N's data, so the timers fire during the second flush batch.
      ev.coalesce(8).write.mode("overwrite").parquet(src)
      val schema = s.read.parquet(src).schema
      def flush(tsStr: String): Unit =
        Seq((-1L, java.sql.Timestamp.valueOf(tsStr), 0.0))
          .toDF("user_id", "ts", "value").coalesce(1)
          .write.mode("append").parquet(src)
      graft.streaming.Streams.withGateStreamConfs(s,
        Streams.gateStatePartitions(t(s, dir, "events").count())) {
        def run(mfpt: Int): Unit = Streams.runAvailableNow(
          Streams.sessionizeTws(
            Streams.parquetStream(s, src, schema, maxFilesPerTrigger = mfpt)
              .as[Streams.TwsEvent],
            gapMs = 30L * 60 * 1000).toDF(),
          out, ckpt)
        run(8) // ingests the month in ONE batch; timers armed, not fired
        flush("2099-01-01 00:00:00")
        flush("2099-01-02 00:00:00")
        run(1) // flush batches advance the watermark; timers fire
      }
      val live = s.read.parquet(out).filter($"user_id" =!= -1L)
        .select($"user_id", unix_millis($"session_start").as("session_start_ms"),
          $"n_events", round($"total_value", 4).as("total_value"))
      sessionGapVerdict(s, dir, live)
    }),

    // C3: BATCH→STREAMING MIGRATION in the gate (round 12) — the
    // transformWithState INITIAL-STATE path (Streams.
    // dedupIncrementalSeeded / handleInitialState): the permanent
    // fingerprint state is BOOTSTRAPPED from the existing corpus (here:
    // the first half by doc_id, standing in for the warehouse's d12
    // index table) and the live tail re-delivers the WHOLE corpus — so
    // the query proves seeded fingerprints never re-emit while novel
    // ones emit exactly once with the min-doc_id winner. The source is
    // sharded by hash(fingerprint) into three files (one per
    // micro-batch), so every fingerprint's docs land in ONE batch and
    // the winner rule is batch-order invariant — the o17 determinism
    // trick, making stream ≡ batch an exact contract, not luck. DuckDB
    // recomputes the whole thing from raw text (same md5-normalized
    // fingerprint as c2's oracle); verdict = per-fingerprint winner
    // equality vs the batch anti-join twin.
    "c3_seeded_migration" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      import graft.functions.Text
      val tmp = TrainingQueries.Scratch.dir(s, "c3_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      // persisted: the md5+token-count projection over full text is the
      // expensive part and feeds maxId, the seed set, the source write,
      // and the batch twin — one materialization instead of five
      // (the k14 discipline; at sf10 the recomputes were ~2/3 of c3)
      val meta = t(s, dir, "documents").select(
        $"doc_id".cast("long").as("doc_id"), $"lang",
        Text.tokenCountWs($"text").cast("long").as("n_tokens"),
        Text.fingerprintMd5($"text").as("fingerprint"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val maxId = meta.agg(max($"doc_id")).as[Long].first()
      val seedFps = meta.filter($"doc_id" * 2 <= maxId)
        .select($"fingerprint").as[String]
      // one parallel job, 3 files, every fingerprint's docs entirely
      // inside one file — the o17 key-hash form of the shard invariant
      meta.repartition(3, $"fingerprint").write.mode("append").parquet(src)
      val schema = s.read.parquet(src).schema
      graft.streaming.Streams.withGateStreamConfs(s) {
        val docs = Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 1)
          .as[Streams.FpMeta]
        Streams.runAvailableNow(
          Streams.dedupIncrementalSeeded(docs, seedFps).toDF(), out, ckpt)
      }
      val live = s.read.parquet(out)
        .select($"doc_id", $"lang", $"n_tokens", $"fingerprint")
      val wFp = Window.partitionBy($"fingerprint").orderBy($"doc_id")
      val batch = meta
        .join(seedFps.toDF("fingerprint").distinct(),
          Seq("fingerprint"), "left_anti")
        .withColumn("__rn", row_number().over(wFp)).filter($"__rn" === 1)
        .select($"fingerprint", $"doc_id".as("__id_b"))
      val eq = live.select($"fingerprint", $"doc_id".as("__id_l"))
        .withColumn("__l", lit(1))
        .join(batch.withColumn("__b", lit(1)), Seq("fingerprint"), "full")
        .agg(count($"__l").as("__nl"), count($"__b").as("__nb"),
          count(when($"__id_l" === $"__id_b", 1)).as("__neq"))
      live.crossJoin(broadcast(eq))
        .select($"doc_id", $"lang", $"n_tokens", $"fingerprint",
          ($"__nl" === $"__nb" && $"__neq" === $"__nl")
            .as("streaming_equals_batch"))
    }),

    // T30: LIVE PER-(LANG, DOMAIN) DOCUMENT CAP in the gate (round 12)
    // — the transformWithState MAPSTATE operator (Streams.
    // domainCapStream: admit the first `cap` docs of each domain within
    // each language, doc_id order, corpus-lifetime — the live twin of
    // t18's WindowGroupLimit cap). Admission is inherently
    // arrival-order dependent, so the source is sharded by
    // hash(domain) into three files (one per micro-batch): every
    // domain's docs land in ONE batch, where the processor sorts by
    // doc_id — making stream ≡ batch exact by construction (the same
    // order-invariance discipline as o17/c3) while still exercising
    // the permanent MapState across three real batches (other domains'
    // counts persist across them). Payload = every admitted doc; DuckDB
    // recomputes the cap as a rank filter; verdict = full-outer
    // equality vs the batch WindowGroupLimit twin.
    "t30_live_domain_cap" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "t30_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val docs = t(s, dir, "documents").select($"lang",
        $"source".as("domain"), $"doc_id".cast("long").as("doc_id"))
      for (i <- 0 until 3)
        docs.filter(pmod(hash($"domain"), lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(src)
      val schema = s.read.parquet(src).schema
      graft.streaming.Streams.withGateStreamConfs(s) {
        val in = Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 1)
          .as[Streams.DomainDoc]
        Streams.runAvailableNow(
          Streams.domainCapStream(in, 3L).toDF(), out, ckpt)
      }
      val live = s.read.parquet(out).select($"lang", $"domain", $"doc_id")
      val wCap = Window.partitionBy($"lang", $"domain").orderBy($"doc_id")
      // the verdict join must be NULL-SAFE on domain (<=>): a plain
      // equi-join drops null-domain rows from both sides and the verdict
      // would report a phantom mismatch (round-12 null campaign)
      val batch = docs.withColumn("__rn", row_number().over(wCap))
        .filter($"__rn" <= 3).select($"lang".as("__lang_b"),
          $"domain".as("__dom_b"), $"doc_id".as("__id_b"))
      val eq = live.withColumn("__l", lit(1))
        .join(batch.withColumn("__b", lit(1)),
          $"lang" === $"__lang_b" && $"domain" <=> $"__dom_b" &&
            $"doc_id" === $"__id_b", "full")
        .agg(count($"__l").as("__nl"), count($"__b").as("__nb"),
          count(when($"__l" === 1 && $"__b" === 1, 1)).as("__neq"))
      live.crossJoin(broadcast(eq))
        .select($"lang", $"domain", $"doc_id",
          ($"__nl" === $"__nb" && $"__neq" === $"__nl")
            .as("streaming_equals_batch"))
    }),

    // O18: LIVE DIM REFRESH in the gate (round 12) — the per-batch
    // dim-re-read runner (Streams.runRefreshedAvailableNow +
    // enrichWithDim): the static side of a stream-static enrichment is
    // re-CREATED from its path for every micro-batch, so a dimension
    // table rewritten BETWEEN batches is seen live — the semantics a
    // plain file-backed broadcast join cannot give (its
    // InMemoryFileIndex freezes the listing; see enrichWithDim's
    // Scaladoc). The gate drives exactly that scenario: wave 1 of facts
    // (even orderkeys) enriches against dim v1, then the dim directory
    // is OVERWRITTEN with v2 (names prefixed "v2_") and wave 2 (odd
    // orderkeys) streams through the same checkpoint — so each row's
    // enriched name proves which dim version its batch read. DuckDB
    // recomputes the expected union with a parity CASE; verdict =
    // full-outer equality vs the batch CASE twin. Each batch writes its
    // own batch_id=<n> partition (exactly-once under replay).
    "o18_live_dim_refresh" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "o18_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val dimPath = s"$tmp/dim"
      val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val facts = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey".as("c_custkey"))
      val dimV1 = t(s, dir, "customer").select($"c_custkey", $"c_name")
      // wave membership is by RUN (each availableNow drain processes all
      // pending files in one batch — mFPT below exceeds any file count),
      // so a wave needn't be one file; coalesce(1) was a 7.5M-row
      // single-task write per wave at sf10
      facts.filter($"o_orderkey" % 2 === 0).coalesce(8)
        .write.mode("append").parquet(src)
      dimV1.write.mode("overwrite").parquet(dimPath)
      val schema = s.read.parquet(src).schema
      def run(): Unit = graft.streaming.Streams.withGateStreamConfs(s) {
        Streams.runRefreshedAvailableNow(
          Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 100000),
          () => s.read.parquet(dimPath),
          (batch, dim) => Streams.enrichWithDim(batch, dim, Seq("c_custkey")),
          out, ckpt)
      }
      run() // wave 1 enriches against dim v1
      dimV1.select($"c_custkey", concat(lit("v2_"), $"c_name").as("c_name"))
        .write.mode("overwrite").parquet(dimPath)
      facts.filter($"o_orderkey" % 2 === 1).coalesce(8)
        .write.mode("append").parquet(src)
      run() // wave 2's batch re-reads the dim: sees v2
      val live = s.read.parquet(out)
        .select($"o_orderkey", $"c_custkey", $"c_name")
      val batch = facts.join(
          t(s, dir, "customer").select($"c_custkey", $"c_name"),
          Seq("c_custkey"))
        .select($"o_orderkey", $"c_custkey",
          when($"o_orderkey" % 2 === 0, $"c_name")
            .otherwise(concat(lit("v2_"), $"c_name")).as("__name_b"))
      // grouped-live verdict (o20's discipline): exactly ONE enriched
      // row per fact — a replayed batch appending duplicates would slip
      // past raw full-outer counts
      val eq = live.groupBy($"o_orderkey")
        .agg(count(lit(1)).as("__c"), min($"c_name").as("__name_l"))
        .join(batch.select($"o_orderkey", $"__name_b"),
          Seq("o_orderkey"), "full")
        .agg((count(when($"__c".isNull || $"__name_b".isNull ||
          $"__c" =!= 1 || $"__name_l" =!= $"__name_b", 1)) === 0).as("__ok"))
      live.crossJoin(broadcast(eq))
        .select($"o_orderkey", $"c_custkey", $"c_name",
          $"__ok".as("dim_refresh_seen"))
    }),

    // W22: LIVE DATA-CONTRACT MONITOR in the gate (round 12) — the
    // streaming twin of k9's Quality.expect (Streams.contractStream):
    // the three scalar dbt-vocabulary rules ride ONE streaming global
    // aggregate in Complete mode, so the final emission is the RUNNING
    // report over everything ingested — which, after a full drain, must
    // equal the batch expect over the same rows exactly (every counter
    // is an algebraic integer sum, so streaming state merges are exact
    // regardless of how the two source files batch). DuckDB recomputes
    // each counter independently (k9's scalar blocks); verdict =
    // per-rule equality vs batch Quality.expect.
    "w22_live_contract_monitor" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      import graft.functions.Quality
      val tmp = TrainingQueries.Scratch.dir(s, "w22_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_returnflag", $"l_quantity")
      li.repartition(2).write.mode("overwrite").parquet(src)
      val rules: Seq[Quality.Rule] = Seq(
        Quality.NotNull("l_orderkey"),
        Quality.AcceptedValues("l_returnflag", Seq("A", "N", "R")),
        Quality.InRange("l_quantity", 1, 50))
      val schema = s.read.parquet(src).schema
      s.catalog.dropTempView("w22_contract_live")
      graft.streaming.Streams.withGateStreamConfs(s) {
        val q = Streams.contractStream(
            Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 1), rules)
          .writeStream.outputMode("complete").format("memory")
          .queryName("w22_contract_live")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      val live = s.table("w22_contract_live")
        .select($"rule", $"n_checked", $"n_violations", $"passed")
      val batch = Quality.expect(li, rules)
        .select($"rule", $"n_checked".as("__nc_b"),
          $"n_violations".as("__nv_b"))
      val eq = live.select($"rule", $"n_checked".as("__nc_l"),
          $"n_violations".as("__nv_l")).withColumn("__l", lit(1))
        .join(batch.withColumn("__b", lit(1)), Seq("rule"), "full")
        .agg(count($"__l").as("__nl"), count($"__b").as("__nb"),
          count(when($"__nc_l" === $"__nc_b" &&
            $"__nv_l" === $"__nv_b", 1)).as("__neq"))
      live.crossJoin(broadcast(eq))
        .select($"rule", $"n_checked", $"n_violations", $"passed",
          ($"__nl" === $"__nb" && $"__neq" === $"__nl")
            .as("streaming_equals_batch"))
    }),

    // O19: LIVE INGEST GUARD in the gate (round 12) — the per-batch
    // anti-join against the existing corpus (Streams.excludeKnown): the
    // live tail redelivers the WHOLE corpus, the known set is the first
    // half by doc_id, and only the novel half may reach the sink. The
    // guard is stateless per batch (the known side broadcasts into
    // every micro-batch), so the result is batching-invariant by
    // construction — the gate streams two files to prove the guard
    // re-applies per batch. DuckDB recomputes the surviving half
    // directly; verdict = full-outer equality vs the batch anti-join.
    "o19_live_exclude_known" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "o19_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val docs = t(s, dir, "documents")
        .select($"doc_id".cast("long").as("doc_id"), $"lang", $"source")
      docs.repartition(2).write.mode("overwrite").parquet(src)
      val maxId = docs.agg(max($"doc_id")).as[Long].first()
      val known = docs.filter($"doc_id" * 2 <= maxId)
      val schema = s.read.parquet(src).schema
      graft.streaming.Streams.withGateStreamConfs(s) {
        Streams.runAvailableNow(
          Streams.excludeKnown(
            Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 1),
            known, Seq("doc_id")),
          out, ckpt)
      }
      val live = s.read.parquet(out).select($"doc_id", $"lang", $"source")
      val batch = docs.filter($"doc_id" * 2 > maxId)
        .select($"doc_id".as("__id_b"))
      // group the LIVE side by key first: a full outer against raw live
      // rows is blind to DUPLICATE emissions (each dup matches the one
      // batch row and the counts still agree) — the exact failure this
      // gate exists to catch. One row per key with __c = 1 is the
      // contract; any dup (__c > 1) or miss (null side) fails.
      val eq = live.groupBy($"doc_id").agg(count(lit(1)).as("__c"))
        .join(batch, $"doc_id" === $"__id_b", "full")
        .agg((count(when($"doc_id".isNull || $"__id_b".isNull ||
          $"__c" =!= 1, 1)) === 0).as("__ok"))
      live.crossJoin(broadcast(eq))
        .select($"doc_id", $"lang", $"source",
          $"__ok".as("streaming_equals_batch"))
    }),

    // O20: LIVE EXACTLY-ONCE DEDUP in the gate (round 12) — the
    // watermark-bounded streaming dedup (Streams.dedupStream /
    // dropDuplicates): the source delivers the ENTIRE events table
    // TWICE (two identical files — the at-least-once upstream scenario
    // the operator exists for), and the sink must see every event
    // exactly once. The watermark delay (800 h) exceeds the corpus
    // span so no dedup key is evicted between the two deliveries —
    // which is precisely the state-retention contract: a redelivery
    // inside the horizon drops, and the emitted set equals the
    // distinct corpus no matter how the files batch (first-seen wins;
    // every column of both copies is identical, so the winner is
    // indistinguishable). DuckDB recomputes the expected set as the
    // plain table; verdict = full-outer equality vs the batch
    // distinct.
    "o20_live_stream_dedup" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "o20_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val ev = t(s, dir, "events").select($"event_id", $"user_id",
        expr("timestamp_millis(CAST(ts AS BIGINT) div 1000000)").as("ts"),
        $"event_type")
      // 8-file deliveries, 8-file triggers: the emitted set equals the
      // distinct corpus no matter how files group into batches (the
      // comment above — this gate's contract is batching-invariant), so
      // the delivery needn't be ONE file, and a coalesce(1) write pushed
      // 10 M rows through a single task twice at sf10. State partitions
      // scale with the 2N-row ingest (8 RocksDB instances serialized the
      // sf10 drain).
      ev.coalesce(8).write.mode("append").parquet(src) // delivery 1
      ev.coalesce(8).write.mode("append").parquet(src) // delivery 2
      val schema = s.read.parquet(src).schema
      graft.streaming.Streams.withGateStreamConfs(s,
        Streams.gateStatePartitions(2L * t(s, dir, "events").count())) {
        Streams.runAvailableNow(
          Streams.dedupStream(
            Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 8),
            "ts", Seq("event_id"), watermark = "800 hours"),
          out, ckpt)
      }
      val live = s.read.parquet(out).select($"event_id", $"user_id",
        unix_millis($"ts").as("ts_ms"), $"event_type")
      val batch = t(s, dir, "events").select($"event_id".as("__id_b"))
      // grouped-live verdict (not raw full-outer): duplicate emissions —
      // the failure mode a dedup gate exists to catch — would each match
      // the one batch row and leave raw counts equal; __c = 1 per key is
      // the real exactly-once contract
      val eq = live.groupBy($"event_id").agg(count(lit(1)).as("__c"))
        .join(batch, $"event_id" === $"__id_b", "full")
        .agg((count(when($"event_id".isNull || $"__id_b".isNull ||
          $"__c" =!= 1, 1)) === 0).as("__ok"))
      live.crossJoin(broadcast(eq))
        .select($"event_id", $"user_id", $"ts_ms", $"event_type",
          $"__ok".as("streaming_equals_batch"))
    }),

    // T31: LIVE DRIFT MONITOR in the gate (round 12) — the per-batch
    // PSI scorer (Streams.runDriftMonitorAvailableNow): every
    // micro-batch is scored against the reference snapshot with
    // Stats.psiByCategory and writes its own per-category report — the
    // ingestion-gate semantics ("is the batch that just landed
    // off-mix?"), distinct from t24's one-shot corpus drift. The
    // source is two shards (doc_id%4==1 and ==3, one file each, one
    // per batch) scored against the even-doc reference; which shard
    // becomes batch 0 depends on file listing order, so the payload
    // DROPS batch_id and compares the two reports as a multiset —
    // order-invariant by construction. DuckDB recomputes both reports
    // independently (the t24 formula per shard); verdict = multiset
    // equality vs the batch psiByCategory run per shard (bit-identical
    // doubles: same longs through the same arithmetic).
    "t31_live_drift_monitor" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      import graft.functions.Stats
      val tmp = TrainingQueries.Scratch.dir(s, "t31_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val refPath = s"$tmp/ref"
      val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val docs = t(s, dir, "documents")
        .select($"doc_id".cast("long").as("doc_id"), $"lang")
      val ref = docs.filter($"doc_id" % 2 === 0)
      ref.write.mode("overwrite").parquet(refPath)
      docs.filter($"doc_id" % 4 === 1).coalesce(1)
        .write.mode("append").parquet(src)
      docs.filter($"doc_id" % 4 === 3).coalesce(1)
        .write.mode("append").parquet(src)
      val schema = s.read.parquet(src).schema
      graft.streaming.Streams.withGateStreamConfs(s) {
        Streams.runDriftMonitorAvailableNow(
          Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 1),
          () => s.read.parquet(refPath), "lang", out, ckpt)
      }
      def shape(df: DataFrame): DataFrame =
        df.select($"lang", $"n_ref", $"n_cand",
          round($"share_ref", 6).as("share_ref"),
          round($"share_cand", 6).as("share_cand"),
          round($"psi_contrib", 8).as("psi_contrib"))
      val live = shape(s.read.parquet(out))
      val batchBoth = shape(Stats.psiByCategory(ref,
          docs.filter($"doc_id" % 4 === 1), "lang"))
        .union(shape(Stats.psiByCategory(ref,
          docs.filter($"doc_id" % 4 === 3), "lang")))
      val keyCols = Seq("lang", "n_ref", "n_cand", "share_ref",
        "share_cand", "psi_contrib")
      val lg = live.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__nl"))
      val bg = batchBoth.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__nb"))
      val eq = lg.join(bg, keyCols, "full")
        .agg((count(when($"__nl".isNull || $"__nb".isNull ||
          $"__nl" =!= $"__nb", 1)) === 0).as("__ok"))
      live.crossJoin(broadcast(eq))
        .select($"lang", $"n_ref", $"n_cand", $"share_ref",
          $"share_cand", $"psi_contrib",
          $"__ok".as("streaming_equals_batch"))
    }),

    // O21: LIVE RE-STAMPED-DUPLICATE DEDUP in the gate (round 12) —
    // dropDuplicatesWithinWatermark (Streams.dedupWithinWatermark), the
    // case o20's exact-key dedup misses: a redelivered event whose
    // upstream RE-STAMPED the event time (+2 s here) is a NEW
    // (key, ts) pair, so only the within-watermark key-only dedup
    // drops it. WHICH copy wins is genuinely order-dependent (that is
    // the operator's contract — first arrival), so the payload excludes
    // the re-stamped ts entirely: the surviving (event_id, user_id,
    // event_type) set is identical whichever copy won, making the
    // query deterministic while still proving each key emits exactly
    // once. Two deliveries, one file each, one per micro-batch — the
    // duplicate arrives a batch later and must still drop (state
    // retained: watermark delay exceeds the span + shift). DuckDB
    // recomputes the expected set as the plain distinct corpus; verdict
    // = full-outer equality vs the batch distinct.
    "o21_live_restamped_dedup" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "o21_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val ev = t(s, dir, "events").select($"event_id", $"user_id",
        expr("timestamp_millis(CAST(ts AS BIGINT) div 1000000)").as("ts"),
        $"event_type")
      // 8-file deliveries + 8-file triggers: the payload excludes ts, so
      // the surviving set is delivery-order-invariant (comment above) and
      // the key-only dedup drops the restamp within OR across batches —
      // same batching-invariance argument as o20, same coalesce(1)
      // single-task-write and 8-instance RocksDB costs removed.
      ev.coalesce(8).write.mode("append").parquet(src) // delivery 1
      ev.withColumn("ts", expr("ts + INTERVAL 2 seconds")) // re-stamped
        .coalesce(8).write.mode("append").parquet(src)     // delivery 2
      val schema = s.read.parquet(src).schema
      graft.streaming.Streams.withGateStreamConfs(s,
        Streams.gateStatePartitions(2L * t(s, dir, "events").count())) {
        Streams.runAvailableNow(
          Streams.dedupWithinWatermark(
            Streams.parquetStream(s, src, schema, maxFilesPerTrigger = 8),
            "ts", Seq("event_id"), watermark = "800 hours"),
          out, ckpt)
      }
      val live = s.read.parquet(out)
        .select($"event_id", $"user_id", $"event_type")
      val batch = t(s, dir, "events").select($"event_id".as("__id_b"))
      // grouped-live verdict: see o20 — raw full-outer counts cannot see
      // a duplicate emission, which is precisely what this gate guards
      val eq = live.groupBy($"event_id").agg(count(lit(1)).as("__c"))
        .join(batch, $"event_id" === $"__id_b", "full")
        .agg((count(when($"event_id".isNull || $"__id_b".isNull ||
          $"__c" =!= 1, 1)) === 0).as("__ok"))
      live.crossJoin(broadcast(eq))
        .select($"event_id", $"user_id", $"event_type",
          $"__ok".as("streaming_equals_batch"))
    }),

    // O22: CHECKPOINT RESTART-RESUME in the gate (round 12) — the one
    // streaming contract no other gate exercises: a NEW query object
    // started on an EXISTING checkpoint must (a) skip the files the
    // previous run committed and (b) RESTORE its RocksDB state. The
    // permanent-state dedup (Streams.dedupIncrementalBy, the d12
    // streaming twin) runs TWICE against one checkpoint: run 1 ingests
    // the corpus and stops (availableNow drain == a clean shutdown);
    // then the WHOLE corpus is redelivered and run 2 — a fresh query,
    // the restart — must emit ZERO rows: every key is a duplicate, but
    // only if the first run's state actually came back from the
    // checkpoint. A lost state store would re-emit all of them (hash
    // fails on doubled rows); a re-read of run 1's file would do the
    // same. Driver-side counts after each run pin it explicitly:
    // n_after_restart == n_after_run1 == |corpus|. This is the
    // crash-recovery story at ingest scale — state outlives the query
    // process. DuckDB recomputes the expected set as the plain corpus;
    // verdict = full-outer equality vs the batch distinct.
    "o22_live_checkpoint_restart" -> ((s, dir) => {
      import s.implicits._
      import graft.streaming.Streams
      val tmp = TrainingQueries.Scratch.dir(s, "o22_stream")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val out = s"$tmp/out"; val ckpt = s"$tmp/ckpt"
      val ev = t(s, dir, "events").select($"event_id", $"user_id", $"event_type")
      // permanent-state dedup has no watermark, so any batching of the
      // 8-file deliveries preserves the contract (o20's argument); the
      // state-partition width must be the SAME for both runs — the
      // checkpoint freezes it at creation and run 2 reuses it
      ev.coalesce(8).write.mode("append").parquet(src) // delivery 1
      val schema = s.read.parquet(src).schema
      val stateParts = Streams.gateStatePartitions(t(s, dir, "events").count())
      def runOnce(): Unit =
        graft.streaming.Streams.withGateStreamConfs(s, stateParts) {
        val stream = Streams.parquetStream(s, src, schema,
          maxFilesPerTrigger = 8).as[(Long, Long, String)]
        Streams.runAvailableNow(
          Streams.dedupIncrementalBy[(Long, Long, String)](
            stream, _._1.toString, _._1)
            .toDF("event_id", "user_id", "event_type"),
          out, ckpt)
      }
      runOnce() // run 1: fresh state, emits the whole corpus, stops
      val n1 = s.read.parquet(out).count()
      ev.coalesce(8).write.mode("append").parquet(src) // redelivery
      runOnce() // run 2: the RESTART — state must come back
      val n2 = s.read.parquet(out).count()
      val live = s.read.parquet(out)
        .select($"event_id", $"user_id", $"event_type")
      val batch = t(s, dir, "events").select($"event_id".as("__id_b"))
      // grouped-live verdict: see o20 — a lost-state re-emission would
      // leave raw full-outer counts equal; __c = 1 per key is the contract
      val eq = live.groupBy($"event_id").agg(count(lit(1)).as("__c"))
        .join(batch, $"event_id" === $"__id_b", "full")
        .agg((count(when($"event_id".isNull || $"__id_b".isNull ||
          $"__c" =!= 1, 1)) === 0).as("__ok"))
      live.crossJoin(broadcast(eq))
        .select($"event_id", $"user_id", $"event_type",
          lit(n2 == n1 && n1 > 0).as("state_survived_restart"),
          $"__ok".as("streaming_equals_batch"))
    }),

    // O17: LIVE CDC SNAPSHOT in the gate (round 12, r11 verdict "do
    // this" #5) — the third gate-checked streaming path (after w18/c2):
    // Streams.runCdcSnapshotAvailableNow maintains the o14 keyed
    // snapshot INCREMENTALLY from a change stream — each micro-batch
    // folds its I/U/D rows into the persisted parquet snapshot with the
    // same Relational.applyCdc plan and atomically swaps directories.
    // The change log is sharded into one FILE PER KEY GROUP
    // (c_custkey % 3) and streamed with maxFilesPerTrigger=1, so the
    // query exercises three successive read-fold-swap cycles against
    // the snapshot it itself wrote, while each key's changes land in
    // exactly one batch (the fold is batch-order invariant by
    // construction, so stream ≡ batch is an exact contract, not luck).
    // Payload = the final snapshot READ FROM DISK (DuckDB recomputes it
    // from customer+orders — the o14 oracle); verdict = full-outer
    // equality with the single-shot batch applyCdc fold.
    "o17_live_cdc_snapshot" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Relational
      val tmp = TrainingQueries.Scratch.dir(s, "o17_cdc")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      val src = s"$tmp/src"; val snap = s"$tmp/snap"; val ckpt = s"$tmp/ckpt"
      val base = t(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
      val changes = t(s, dir, "orders").select(
        $"o_custkey".as("c_custkey"),
        concat(lit("upd_"), $"o_custkey").as("c_name"),
        round($"o_totalprice", 2).as("c_acctbal"),
        ($"o_custkey" % 25).cast("int").as("c_nationkey"),
        when($"o_orderkey" % 10 === 0, "D").otherwise("U").as("op"),
        $"o_orderkey".as("seq"))
      base.write.mode("overwrite").parquet(snap)
      // one parallel job, 3 files, each key's changes entirely inside one
      // file (hash partitioning by the key itself — the same one-batch-
      // per-key invariant the old 3 sequential coalesce(1) shard writes
      // bought with 3 scans + 3 single-task writes)
      changes.repartition(3, $"c_custkey").write.mode("append").parquet(src)
      val schema = s.read.parquet(src).schema
      graft.streaming.Streams.withGateStreamConfs(s) {
        graft.streaming.Streams.runCdcSnapshotAvailableNow(
          graft.streaming.Streams.parquetStream(s, src, schema,
            maxFilesPerTrigger = 1),
          Seq("c_custkey"), "seq", "op", snap, ckpt)
      }
      val live = s.read.parquet(snap)
      val batch = Relational.applyCdc(base, changes, Seq("c_custkey"), "seq", "op")
      // exact equality: every value either passed through parquet
      // unchanged or is the same deterministic projection on both sides
      val eq = live.select($"c_custkey", $"c_name".as("__nl"),
          $"c_acctbal".as("__al"), $"c_nationkey".as("__kl"))
        .join(batch.select($"c_custkey", $"c_name".as("__nb"),
          $"c_acctbal".as("__ab"), $"c_nationkey".as("__kb")),
          Seq("c_custkey"), "full")
        .agg((count(when($"__nl".isNull || $"__nb".isNull ||
          $"__nl" =!= $"__nb" || $"__al" =!= $"__ab" ||
          $"__kl" =!= $"__kb", 1)) === 0).as("__eq"))
      live.crossJoin(broadcast(eq))
        .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey",
          $"__eq".as("streaming_equals_batch"))
    }),

    // A22: RETENTION COHORTS — the signup-week × activity-week matrix:
    // each user joins the cohort of their first `signup` week; retention
    // at offset k = share of the cohort active (any event) k weeks later.
    // Two key-partitioned aggregates + one broadcast join of the tiny
    // cohort-size table; day/week arithmetic is integral µs div (exact on
    // both engines).
    "a22_retention_cohorts" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_type",
          expr("CAST(ts AS BIGINT) div 1000 div 86400000000 div 7").as("week"))
      val cohorts = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"week").as("cohort_week"))
      val sizes = cohorts.groupBy($"cohort_week")
        .agg(count(lit(1)).as("n_cohort")) // cohorts is one row per user
      ev.join(cohorts, "user_id")
        .filter($"week" >= $"cohort_week")
        .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
        .agg(countDistinct($"user_id").as("n_active"))
        .join(broadcast(sizes), "cohort_week")
        .select($"cohort_week", $"week_offset", $"n_active", $"n_cohort",
          round($"n_active" / $"n_cohort", 6).as("retention"))
    }),

    // K9: data-contract expectation checks — the reference's declared dbt
    // test vocabulary (unique / not_null / accepted_values / relationships,
    // aave_dbt/models/datamart/schema.yml:6-11, shipped there as comments)
    // plus dbt-utils accepted_range, evaluated at runtime by
    // Quality.expect: the three scalar rules share ONE scan (a single
    // conditional-count aggregate), unique adds one key-bounded groupBy,
    // relationships one broadcast anti-join against the dim's keys. The
    // oracle recomputes every count independently in SQL.
    "k9_expectation_checks" -> ((s, dir) => {
      import graft.functions.Quality
      val li = t(s, dir, "lineitem")
      Quality.expect(li, Seq(
        Quality.NotNull("l_orderkey"),
        Quality.AcceptedValues("l_returnflag", Seq("A", "N", "R")),
        Quality.InRange("l_quantity", 1, 50),
        Quality.Unique(Seq("l_orderkey", "l_linenumber")),
        Quality.References(Seq("l_orderkey"),
          () => t(s, dir, "orders"), Seq("o_orderkey"))))
    }),

    // O16: keyed snapshot reconciliation — rebuild the per-(user, day)
    // activity rollup from events up to a mid-corpus cutoff, diff it
    // against the full rebuild (Relational.snapshotDiff: one full-outer
    // join on the key), and publish the report every warehouse rebuild
    // ships: per diff-status key counts with per-column change
    // attribution. The (user, day) grain exercises three branches in one
    // corpus: days fully before the cutoff are byte-identical in both
    // snapshots (`unchanged`), the day straddling the cutoff gains late
    // events (`changed`), days after exist only in the rebuild (`added`);
    // `removed` can't occur on an append-only log — RelationalSpec pins
    // that branch. Compare columns are EXACT integer aggregates (count,
    // max id) — a double sum would make the changed/unchanged boundary
    // hinge on accumulation-order ulps and flake the cross-engine hash.
    // The cutoff is (min+max) div 2 of the integer-µs event time.
    "o16_snapshot_diff" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.Relational
      val ev = t(s, dir, "events")
        .select($"user_id", $"event_id",
          expr("CAST(ts AS BIGINT) div 1000").as("ts_us"))
        .withColumn("day", expr("ts_us div 86400000000"))
      // snap the raw midpoint to NOON of its day: a cutoff near a day
      // boundary would leave the straddling day's "before" side empty and
      // the changed branch unexercised
      val mid = ev.agg(expr(
        "((min(ts_us) + max(ts_us)) div 2 div 86400000000) * 86400000000" +
          " + 43200000000").as("mid"))
      val rollup = (d: DataFrame) => d.groupBy($"user_id", $"day")
        .agg(count(lit(1)).as("n_events"), max($"event_id").as("last_event_id"))
      val before = rollup(ev.crossJoin(broadcast(mid)).filter($"ts_us" <= $"mid"))
      val after = rollup(ev)
      Relational.snapshotDiff(before, after, Seq("user_id", "day"),
          Seq("n_events", "last_event_id"))
        .groupBy($"diff_status")
        .agg(count(lit(1)).as("n_keys"),
          count(when($"chg_n_events", 1)).as("n_chg_n_events"),
          count(when($"chg_last_event_id", 1)).as("n_chg_last_event_id"))
    }),

    // O15: SCD TYPE-2 history build — collapse a per-user event stream
    // into effective-dated attribute versions (the dim-history shape
    // every warehouse derives from snapshot/CDC feeds): a change row
    // starts whenever the attribute differs from its lag; its validity
    // ends at the next change (null = current). Timestamps are emitted
    // as integer microseconds (exact on both engines, see w16).
    "o15_scd2_history" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        // integral `div`, NOT `/`: absolute epoch-ns values (~1.7e18)
        // exceed double's 2^53 exact-integer range, and Spark's `/`
        // evaluates in double
        .select($"user_id", $"event_id",
          expr("CAST(ts AS BIGINT) div 1000").as("ts_us"), $"event_type")
      // Change detection + validity ranges come from Relational.scd2 —
      // the spec-pinned operator (RelationalSpec "scd2 collapses...") with
      // NULL-SAFE comparison semantics: lag() returns NULL both for "no
      // previous row" and "previous attr was NULL", so plain <> would
      // silently drop X→NULL transitions while versioning every row of a
      // NULL run; scd2 disambiguates via a lag-over-constant first-row
      // probe + <=> . This query only adds the per-key version number
      // (same window spec = same single exchange/sort) and the warehouse
      // column names.
      val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      graft.operators.Relational
        .scd2(ev, keyCols = Seq("user_id"),
          orderCols = Seq("ts_us", "event_id"), trackCols = Seq("event_type"))
        .withColumn("version", row_number().over(w))
        .select($"user_id", $"version", $"event_type".as("attr"),
          $"valid_from".as("effective_from_us"),
          $"valid_to".as("effective_to_us"), $"is_current")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "a13_approx_distinct" ->
      """SELECT l_returnflag,
                count(DISTINCT l_orderkey) AS exact_orders,
                true AS within_bound
         FROM lineitem GROUP BY l_returnflag""",
    "a20_countmin_probe" ->
      """SELECT l_suppkey, exact,
                true AS never_undercount,
                true AS within_eps
         FROM (SELECT l_suppkey, count(*) AS exact
               FROM lineitem GROUP BY l_suppkey
               ORDER BY exact DESC, l_suppkey ASC LIMIT 20)""",
    "a19_welford_udaf" ->
      """SELECT l_returnflag,
                round(avg(l_extendedprice), 4) AS mean_price,
                round(stddev_samp(l_extendedprice), 4) AS stddev_price,
                count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "a18_quantile_bucket" ->
      """WITH e AS (
           SELECT round(quantile_cont(l_extendedprice, 0.25), 4) AS q1,
                  round(quantile_cont(l_extendedprice, 0.50), 4) AS q2,
                  round(quantile_cont(l_extendedprice, 0.75), 4) AS q3
           FROM lineitem)
         SELECT l_orderkey, l_partkey, l_suppkey,
                CAST(CASE WHEN l_extendedprice <= q1 THEN 1
                          WHEN l_extendedprice <= q2 THEN 2
                          WHEN l_extendedprice <= q3 THEN 3
                          ELSE 4 END AS INTEGER) AS bucket
         FROM lineitem, e""",
    "w13_ewma" ->
      """WITH b AS (
           SELECT o_custkey, o_orderkey,
                  list(o_totalprice) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
           FROM orders)
         SELECT o_custkey, o_orderkey,
                round(
                  list_reduce(xs, (acc, x) -> acc * CAST(0.7 AS DOUBLE) + x) /
                  list_reduce(list_transform(xs, x -> CAST(1.0 AS DOUBLE)),
                    (acc, x) -> acc * CAST(0.7 AS DOUBLE) + x), 4) AS ewma
         FROM b""",
    "a16_grouping_sets" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
                coalesce(l_linestatus, '(all)') AS linestatus,
                CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
                CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls2,
                count(*) AS n_rows,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS DOUBLE) AS sum_price
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())""",
    "a17_heavy_hitters" ->
      """WITH c AS (SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY l_suppkey),
         r AS (SELECT l_suppkey, cnt,
                      CAST(SUM(cnt) OVER () AS DOUBLE) AS total,
                      CAST(row_number() OVER (ORDER BY cnt DESC, l_suppkey ASC) AS INTEGER) AS rank,
                      CAST(SUM(cnt) OVER (ORDER BY cnt DESC, l_suppkey ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum
               FROM c)
         SELECT l_suppkey, cnt, rank,
                round(cnt / total, 6) AS share,
                round(cum / total, 6) AS cum_share
         FROM r WHERE rank <= 20""",
    "a11_percentiles" ->
      """SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
         round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
         round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
         round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "a12_rollup" ->
      """SELECT coalesce(l_returnflag, '(all)') AS returnflag,
                coalesce(l_linestatus, '(all)') AS linestatus,
                CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
                CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
                count(*) AS n_rows,
                round(sum(l_quantity), 4) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
    "w8_cumulative" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
         count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far,
         round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
         FROM orders""",
    "w9_rank_family" ->
      """SELECT o_orderpriority, o_orderkey,
         CAST(rank() OVER w AS BIGINT) AS rnk,
         CAST(dense_rank() OVER w AS BIGINT) AS drnk,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cum_dist
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)""",
    "a14_stats_aggs" ->
      """SELECT l_returnflag,
         round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
         round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
         round(stddev_samp(l_discount), 6) AS discount_stddev,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "a15_linear_interp" ->
      """WITH k AS (
           SELECT user_id, CAST(event_id AS DOUBLE) AS x, value AS y FROM events
           WHERE event_type = 'purchase' AND value IS NOT NULL),
         q AS (SELECT * FROM (VALUES (1, 2500.0), (2, 5000.0), (3, 7500.0)) t(qi, q)),
         p AS (SELECT u.user_id, q.qi, q.q
               FROM (SELECT DISTINCT user_id FROM k) u CROSS JOIN q),
         lo AS (SELECT p.user_id, p.qi, max(k.x) AS x0, max_by(k.y, k.x) AS y0
                FROM p JOIN k ON k.user_id = p.user_id AND k.x <= p.q GROUP BY 1, 2),
         hi AS (SELECT p.user_id, p.qi, min(k.x) AS x1, min_by(k.y, k.x) AS y1
                FROM p JOIN k ON k.user_id = p.user_id AND k.x >= p.q GROUP BY 1, 2)
         SELECT p.user_id, CAST(p.qi AS BIGINT) AS qi,
                round(CASE WHEN lo.x0 IS NULL THEN hi.y1
                           WHEN hi.x1 IS NULL THEN lo.y0
                           WHEN hi.x1 = lo.x0 THEN hi.y1
                           ELSE lo.y0 + (hi.y1 - lo.y0) * (p.q - lo.x0) / (hi.x1 - lo.x0)
                      END, 6) AS v
         FROM p LEFT JOIN lo USING (user_id, qi) LEFT JOIN hi USING (user_id, qi)""",
    "w10_sessionize" ->
      """WITH o AS (
           SELECT user_id, event_id, epoch_ns(ts) AS tns, value FROM events),
         g AS (
           SELECT *, CASE WHEN lag(tns) OVER w IS NULL
                            OR tns - lag(tns) OVER w > 1800000000000
                          THEN 1 ELSE 0 END AS new_sess
           FROM o WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
         s AS (
           SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM g)
         SELECT user_id, session_id, count(*) AS n_events,
                min(event_id) AS first_event, max(event_id) AS last_event,
                round(CAST(sum(CAST(coalesce(value, 0) AS DECIMAL(18,2)))
                      AS DOUBLE), 4) AS total_value
         FROM s GROUP BY user_id, session_id""",
    "w11_zscore_outliers" ->
      """WITH z AS (
           SELECT event_id, user_id,
                  round((value - avg(value) OVER (PARTITION BY user_id)) /
                        NULLIF(stddev_samp(value) OVER (PARTITION BY user_id), 0),
                        4) AS zscore
           FROM events)
         SELECT event_id, user_id, zscore FROM z WHERE abs(zscore) > 2.0""",
    "w15_twap" ->
      """WITH x AS (
           SELECT user_id, epoch_ns(ts) AS tn, value, event_id FROM events),
         d AS (
           SELECT user_id, value,
                  CAST(lead(tn) OVER (PARTITION BY user_id
                         ORDER BY tn, event_id) - tn AS DOUBLE) AS dur
           FROM x),
         g AS (
           SELECT user_id, sum(value * dur) AS num, sum(dur) AS den
           FROM d WHERE dur IS NOT NULL GROUP BY user_id)
         SELECT user_id, round(num / den, 6) AS twap FROM g WHERE den > 0""",
    "w14_mad_outliers" ->
      """WITH med AS (
           SELECT l_returnflag, quantile_cont(l_extendedprice, 0.5) AS med
           FROM lineitem GROUP BY 1),
         j AS (
           SELECT l.l_returnflag, l.l_extendedprice, m.med
           FROM lineitem l JOIN med m USING (l_returnflag)),
         mad AS (
           SELECT l_returnflag, quantile_cont(abs(l_extendedprice - med), 0.5) AS mad
           FROM j GROUP BY 1)
         SELECT j.l_returnflag,
                count(*) AS n_rows,
                count(CASE WHEN round(abs(j.l_extendedprice - round(j.med, 4)) /
                                      (1.4826 * round(d.mad, 4)), 6) > 1.2
                           THEN 1 END) AS n_outliers,
                round(max(j.med), 4) AS med,
                round(max(d.mad), 4) AS mad
         FROM j JOIN mad d USING (l_returnflag)
         GROUP BY 1""",
    "o9_intersect" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
         INTERSECT
         SELECT CAST(s_nationkey AS BIGINT) FROM supplier""",
    "o10_except" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
         EXCEPT
         SELECT CAST(s_nationkey AS BIGINT) FROM supplier""",
    "o11_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         upd AS (SELECT o_orderkey, 'U' AS o_orderstatus,
                        round(o_totalprice * 1.1, 4) AS o_totalprice
                 FROM base WHERE o_orderkey % 5 = 0)
         SELECT b.* FROM base b
         WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = b.o_orderkey)
         UNION ALL
         SELECT * FROM upd""",
    "j11_nullsafe_join" ->
      """WITH wk AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_orderstatus END AS k,
                  o_totalprice
           FROM orders),
         dim AS (
           SELECT k AS k2,
                  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                        / count(o_totalprice), 4) AS avg_price_k,
                  CAST(count(*) AS BIGINT) AS n_k
           FROM wk GROUP BY k)
         SELECT o_orderkey, k, avg_price_k, n_k
         FROM wk JOIN dim ON k IS NOT DISTINCT FROM k2""",
    "a21_group_ols" ->
      """WITH m AS (
           SELECT l_returnflag, avg(l_quantity) AS mx,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                    / count(l_extendedprice) AS my, count(*) AS n
           FROM lineitem GROUP BY l_returnflag),
         c AS (
           SELECT l.l_returnflag,
                  any_value(m.n) AS n, any_value(m.mx) AS mx, any_value(m.my) AS my,
                  sum((l_quantity - m.mx) * (l_extendedprice - m.my)) AS sxy,
                  sum((l_quantity - m.mx) * (l_quantity - m.mx)) AS sxx,
                  sum((l_extendedprice - m.my) * (l_extendedprice - m.my)) AS syy
           FROM lineitem l JOIN m USING (l_returnflag)
           GROUP BY l.l_returnflag)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
                round(sxy / sxx, 4) AS slope,
                round(my - (sxy / sxx) * mx, 4) AS intercept,
                round(sxy * sxy / (sxx * syy), 6) AS r2
         FROM c""",
    "w17_funnel_steps" ->
      """WITH e AS (
           SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_type
           FROM events),
         base AS (
           SELECT DISTINCT user_id FROM e
           WHERE event_type IN ('view', 'click', 'purchase')),
         u1 AS (
           SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts_us END) AS t1
           FROM e GROUP BY user_id),
         u2 AS (
           SELECT e.user_id,
                  min(CASE WHEN e.event_type = 'click' AND e.ts_us > u1.t1
                      THEN e.ts_us END) AS t2
           FROM e JOIN u1 ON e.user_id = u1.user_id GROUP BY e.user_id),
         u3 AS (
           SELECT e.user_id,
                  min(CASE WHEN e.event_type = 'purchase' AND e.ts_us > u2.t2
                      THEN e.ts_us END) AS t3
           FROM e JOIN u2 ON e.user_id = u2.user_id GROUP BY e.user_id),
         j AS (
           SELECT b.user_id, t1, t2, t3 FROM base b
           LEFT JOIN u1 ON b.user_id = u1.user_id
           LEFT JOIN u2 ON b.user_id = u2.user_id
           LEFT JOIN u3 ON b.user_id = u3.user_id),
         s AS (SELECT count(*) AS n, count(t1) AS s1, count(t2) AS s2,
                      count(t3) AS s3 FROM j)
         SELECT 1 AS step, 'view' AS step_name, CAST(s1 AS BIGINT) AS n_users,
                round(s1 * 1.0 / n, 6) AS reach_rate FROM s
         UNION ALL
         SELECT 2, 'click', CAST(s2 AS BIGINT), round(s2 * 1.0 / n, 6) FROM s
         UNION ALL
         SELECT 3, 'purchase', CAST(s3 AS BIGINT), round(s3 * 1.0 / n, 6) FROM s""",
    // o17: the o14 batch-fold semantics recomputed from customer+orders;
    // the streaming path must land on exactly this snapshot
    "o17_live_cdc_snapshot" ->
      """WITH ch AS (
           SELECT o_custkey AS c_custkey,
                  'upd_' || CAST(o_custkey AS VARCHAR) AS c_name,
                  round(o_totalprice, 2) AS c_acctbal,
                  CAST(o_custkey % 25 AS INTEGER) AS c_nationkey,
                  CASE WHEN o_orderkey % 10 = 0 THEN 'D' ELSE 'U' END AS op,
                  o_orderkey AS seq
           FROM orders),
         latest AS (
           SELECT * FROM (
             SELECT ch.*, row_number() OVER (PARTITION BY c_custkey
                          ORDER BY seq DESC) AS rn FROM ch)
           WHERE rn = 1)
         SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_nationkey,
                TRUE AS streaming_equals_batch
         FROM customer c
         WHERE c.c_custkey NOT IN (SELECT c_custkey FROM latest)
         UNION ALL
         SELECT c_custkey, c_name, c_acctbal, c_nationkey,
                TRUE AS streaming_equals_batch
         FROM latest WHERE op <> 'D'""",
    "c2_live_corpus_prep" ->
      """WITH w AS (
           SELECT doc_id, text,
                  string_split(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')), ' ') AS words,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+')) END AS BIGINT) AS n_tokens
           FROM documents),
         sc AS (SELECT doc_id, text, words, n_tokens,
           len(list_filter(words, x -> list_contains(['the','and','of','to','is','that','for','with'], x))) AS s_en,
           len(list_filter(words, x -> list_contains(['le','la','les','des','est','une','dans','pour','que'], x))) AS s_fr,
           len(list_filter(words, x -> list_contains(['el','los','las','es','una','para','como','por','del'], x))) AS s_es,
           len(list_filter(words, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit','für'], x))) AS s_de,
           len(list_filter(words, x -> list_contains(['的','是','了','在','我','有','他','这'], x))) AS s_zh
           FROM w),
         l AS (SELECT doc_id, text, words, n_tokens,
           CASE WHEN s_en = 0 AND s_fr = 0 AND s_es = 0 AND s_de = 0 AND s_zh = 0 THEN 'und'
                WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh THEN 'en'
                WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
                WHEN s_es >= s_de AND s_es >= s_zh THEN 'es'
                WHEN s_de >= s_zh THEN 'de'
                ELSE 'zh' END AS pred_lang
           FROM sc),
         q AS (SELECT doc_id, text, pred_lang, n_tokens,
           CASE WHEN len(words) = 0 THEN 0.0
                ELSE CAST(len(list_filter(words, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','at','by','it','this','that','be'], x))) AS DOUBLE)
                     / len(words) END AS stop_ratio,
           CASE WHEN len(words) = 0 THEN 0.0
                ELSE CAST(list_sum(list_transform(words, x -> length(x))) AS DOUBLE)
                     / len(words) END AS mean_wl
           FROM l),
         kept AS (SELECT doc_id, text, pred_lang, n_tokens FROM q
                  WHERE pred_lang <> 'und' AND n_tokens >= 20
                    AND mean_wl <= 4.75 AND stop_ratio >= 0.05),
         dd AS (SELECT doc_id, pred_lang, n_tokens FROM kept
                QUALIFY row_number() OVER (
                  PARTITION BY md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')))
                  ORDER BY doc_id) = 1),
         p AS (SELECT pred_lang, doc_id, n_tokens,
                 CAST(floor(CAST(coalesce(sum(n_tokens) OVER (
                        PARTITION BY pred_lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
                      / 2048) AS BIGINT) AS pack_id
               FROM dd)
         SELECT pred_lang AS lang, pack_id, count(*) AS n_docs,
                CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
                min(doc_id) AS first_doc, max(doc_id) AS last_doc,
                TRUE AS stream_matches_batch
         FROM p GROUP BY pred_lang, pack_id""",
    "w18_live_funnel" ->
      """WITH e AS (
           SELECT user_id, epoch_ns(ts) // 1000000 AS ts_ms, event_type
           FROM events),
         base AS (
           SELECT DISTINCT user_id FROM e
           WHERE event_type IN ('view', 'click', 'purchase')),
         u1 AS (
           SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts_ms END) AS t1
           FROM e GROUP BY user_id),
         u2 AS (
           SELECT e.user_id,
                  min(CASE WHEN e.event_type = 'click' AND e.ts_ms > u1.t1
                      THEN e.ts_ms END) AS t2
           FROM e JOIN u1 ON e.user_id = u1.user_id GROUP BY e.user_id),
         u3 AS (
           SELECT e.user_id,
                  min(CASE WHEN e.event_type = 'purchase' AND e.ts_ms > u2.t2
                      THEN e.ts_ms END) AS t3
           FROM e JOIN u2 ON e.user_id = u2.user_id GROUP BY e.user_id),
         j AS (
           SELECT b.user_id, t1, t2, t3 FROM base b
           LEFT JOIN u1 ON b.user_id = u1.user_id
           LEFT JOIN u2 ON b.user_id = u2.user_id
           LEFT JOIN u3 ON b.user_id = u3.user_id),
         s AS (SELECT count(*) AS n, count(t1) AS s1, count(t2) AS s2,
                      count(t3) AS s3 FROM j)
         SELECT 1 AS step, 'view' AS step_name, CAST(s1 AS BIGINT) AS n_users,
                round(s1 * 1.0 / n, 6) AS reach_rate,
                true AS streaming_equals_batch FROM s
         UNION ALL
         SELECT 2, 'click', CAST(s2 AS BIGINT), round(s2 * 1.0 / n, 6), true FROM s
         UNION ALL
         SELECT 3, 'purchase', CAST(s3 AS BIGINT), round(s3 * 1.0 / n, 6), true FROM s""",
    "w19_live_sessions" ->
      """WITH o AS (
           SELECT user_id, epoch_ns(ts) // 1000000 AS tms, event_id,
                  coalesce(value, 0) AS value FROM events),
         g AS (
           SELECT *, CASE WHEN lag(tms) OVER w IS NULL
                            OR tms - lag(tms) OVER w > 1800000
                          THEN 1 ELSE 0 END AS new_sess
           FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
         s AS (
           SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
                     ORDER BY tms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS sid
           FROM g)
         SELECT user_id, min(tms) AS session_start_ms, count(*) AS n_events,
                round(sum(value), 4) AS total_value,
                true AS streaming_equals_batch
         FROM s GROUP BY user_id, sid""",
    "w20_live_windowed_counts" ->
      """SELECT (epoch_ns(ts) // 1000000) // 3600000 * 3600000 AS window_start_ms,
                event_type, count(*) AS n_events,
                round(sum(coalesce(value, 0)), 4) AS total_value,
                true AS streaming_equals_batch
         FROM events GROUP BY 1, 2""",
    "j15_live_interval_join" ->
      """SELECT l.user_id, l.event_id AS view_id, r.event_id AS purchase_id,
                (epoch_ns(r.ts) // 1000000) - (epoch_ns(l.ts) // 1000000)
                  AS lag_ms,
                true AS streaming_equals_batch
         FROM events l JOIN events r
           ON l.user_id = r.user_id
          AND l.event_type = 'view' AND r.event_type = 'purchase'
          AND (epoch_ns(r.ts) // 1000000) >= (epoch_ns(l.ts) // 1000000)
          AND (epoch_ns(r.ts) // 1000000)
              <= (epoch_ns(l.ts) // 1000000) + 1800000""",
    "t29_live_bottomk_sample" ->
      """WITH d AS (
           SELECT lang, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
         r AS (
           SELECT lang, doc_id,
                  row_number() OVER (PARTITION BY lang ORDER BY h, doc_id)
                    AS rn
           FROM d),
         n AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_seen
           FROM d GROUP BY lang),
         sm AS (
           SELECT lang,
                  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn)
                    AS sample_ids
           FROM r WHERE rn <= 8 GROUP BY lang)
         SELECT n.lang, n.n_seen, sm.sample_ids,
                true AS streaming_equals_batch
         FROM n JOIN sm USING (lang)""",
    "c3_seeded_migration" ->
      """WITH f AS (
           SELECT doc_id, lang,
                  CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                       ELSE len(string_split_regex(trim(text), '\s+'))
                       END AS BIGINT) AS n_tokens,
                  md5(trim(regexp_replace(regexp_replace(lower(text),
                      '[^a-z0-9]+', ' ', 'g'), '\s+', ' ', 'g')))
                    AS fingerprint
           FROM documents),
         mx AS (SELECT max(doc_id) AS m FROM f),
         novel AS (
           SELECT f.* FROM f
           WHERE fingerprint NOT IN
             (SELECT DISTINCT fingerprint FROM f, mx WHERE doc_id * 2 <= m))
         SELECT doc_id, lang, n_tokens, fingerprint,
                true AS streaming_equals_batch
         FROM novel
         QUALIFY row_number() OVER (PARTITION BY fingerprint
                                    ORDER BY doc_id) = 1""",
    "t30_live_domain_cap" ->
      """SELECT lang, source AS domain, doc_id,
                true AS streaming_equals_batch
         FROM documents
         QUALIFY row_number() OVER (PARTITION BY lang, source
                                    ORDER BY doc_id) <= 3""",
    // deliberately identical to w19's oracle: two independent stateful
    // engines (event-time timers vs session_window) against one recompute
    "w21_live_timer_sessions" ->
      """WITH o AS (
           SELECT user_id, epoch_ns(ts) // 1000000 AS tms, event_id,
                  coalesce(value, 0) AS value FROM events),
         g AS (
           SELECT *, CASE WHEN lag(tms) OVER w IS NULL
                            OR tms - lag(tms) OVER w > 1800000
                          THEN 1 ELSE 0 END AS new_sess
           FROM o WINDOW w AS (PARTITION BY user_id ORDER BY tms, event_id)),
         s AS (
           SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
                     ORDER BY tms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS sid
           FROM g)
         SELECT user_id, min(tms) AS session_start_ms, count(*) AS n_events,
                round(sum(value), 4) AS total_value,
                true AS streaming_equals_batch
         FROM s GROUP BY user_id, sid""",
    "o18_live_dim_refresh" ->
      """SELECT o.o_orderkey, o.o_custkey AS c_custkey,
                CASE WHEN o.o_orderkey % 2 = 0 THEN c.c_name
                     ELSE 'v2_' || c.c_name END AS c_name,
                true AS dim_refresh_seen
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""",
    "w22_live_contract_monitor" ->
      """SELECT 'not_null(l_orderkey)' AS rule,
                CAST(count(*) AS BIGINT) AS n_checked,
                CAST(count(CASE WHEN l_orderkey IS NULL THEN 1 END)
                     AS BIGINT) AS n_violations,
                count(CASE WHEN l_orderkey IS NULL THEN 1 END) = 0 AS passed,
                true AS streaming_equals_batch
         FROM lineitem
         UNION ALL
         SELECT 'accepted_values(l_returnflag)',
                CAST(count(l_returnflag) AS BIGINT),
                CAST(count(CASE WHEN l_returnflag IS NOT NULL
                       AND l_returnflag NOT IN ('A','N','R') THEN 1 END)
                     AS BIGINT),
                count(CASE WHEN l_returnflag IS NOT NULL
                  AND l_returnflag NOT IN ('A','N','R') THEN 1 END) = 0,
                true
         FROM lineitem
         UNION ALL
         SELECT 'accepted_range(l_quantity)',
                CAST(count(l_quantity) AS BIGINT),
                CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50
                       THEN 1 END) AS BIGINT),
                count(CASE WHEN l_quantity < 1 OR l_quantity > 50
                  THEN 1 END) = 0,
                true
         FROM lineitem""",
    "o19_live_exclude_known" ->
      """SELECT doc_id, lang, source, true AS streaming_equals_batch
         FROM documents
         WHERE doc_id * 2 > (SELECT max(doc_id) FROM documents)""",
    "o20_live_stream_dedup" ->
      """SELECT event_id, user_id, epoch_ns(ts) // 1000000 AS ts_ms,
                event_type, true AS streaming_equals_batch
         FROM events""",
    "o21_live_restamped_dedup" ->
      """SELECT event_id, user_id, event_type,
                true AS streaming_equals_batch
         FROM events""",
    "o22_live_checkpoint_restart" ->
      """SELECT event_id, user_id, event_type,
                true AS state_survived_restart,
                true AS streaming_equals_batch
         FROM events""",
    "t31_live_drift_monitor" ->
      """WITH ref AS (SELECT lang, count(*) AS n_ref FROM documents
                      WHERE doc_id % 2 = 0 GROUP BY lang),
         c1 AS (SELECT lang, count(*) AS n_cand FROM documents
                WHERE doc_id % 4 = 1 GROUP BY lang),
         c3 AS (SELECT lang, count(*) AS n_cand FROM documents
                WHERE doc_id % 4 = 3 GROUP BY lang),
         j1 AS (SELECT coalesce(r.lang, c.lang) AS lang,
                       CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
                       CAST(coalesce(n_cand, 0) AS BIGINT) AS n_cand
                FROM ref r FULL JOIN c1 c ON r.lang IS NOT DISTINCT FROM c.lang),
         t1 AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS tr,
                       CAST(sum(n_cand) AS DOUBLE) AS tc,
                       CAST(count(*) AS DOUBLE) AS k FROM j1),
         j3 AS (SELECT coalesce(r.lang, c.lang) AS lang,
                       CAST(coalesce(n_ref, 0) AS BIGINT) AS n_ref,
                       CAST(coalesce(n_cand, 0) AS BIGINT) AS n_cand
                FROM ref r FULL JOIN c3 c ON r.lang IS NOT DISTINCT FROM c.lang),
         t3 AS (SELECT CAST(sum(n_ref) AS DOUBLE) AS tr,
                       CAST(sum(n_cand) AS DOUBLE) AS tc,
                       CAST(count(*) AS DOUBLE) AS k FROM j3)
         SELECT lang, n_ref, n_cand,
                round((n_ref + 0.5) / (tr + 0.5 * k), 6) AS share_ref,
                round((n_cand + 0.5) / (tc + 0.5 * k), 6) AS share_cand,
                round(((n_cand + 0.5) / (tc + 0.5 * k) - (n_ref + 0.5) / (tr + 0.5 * k))
                      * ln(((n_cand + 0.5) / (tc + 0.5 * k)) / ((n_ref + 0.5) / (tr + 0.5 * k))), 8)
                  AS psi_contrib,
                true AS streaming_equals_batch
         FROM j1, t1
         UNION ALL
         SELECT lang, n_ref, n_cand,
                round((n_ref + 0.5) / (tr + 0.5 * k), 6),
                round((n_cand + 0.5) / (tc + 0.5 * k), 6),
                round(((n_cand + 0.5) / (tc + 0.5 * k) - (n_ref + 0.5) / (tr + 0.5 * k))
                      * ln(((n_cand + 0.5) / (tc + 0.5 * k)) / ((n_ref + 0.5) / (tr + 0.5 * k))), 8),
                true
         FROM j3, t3""",
    "a22_retention_cohorts" ->
      """WITH e AS (
           SELECT user_id, event_type,
                  epoch_ns(ts) // 1000 // 86400000000 // 7 AS week
           FROM events),
         c AS (
           SELECT user_id, min(week) AS cohort_week FROM e
           WHERE event_type = 'signup' GROUP BY user_id),
         sz AS (
           SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
           FROM c GROUP BY cohort_week),
         act AS (
           SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
                  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
           FROM e JOIN c ON e.user_id = c.user_id
           WHERE e.week >= c.cohort_week
           GROUP BY c.cohort_week, e.week - c.cohort_week)
         SELECT a.cohort_week, a.week_offset, a.n_active, sz.n_cohort,
                round(a.n_active * 1.0 / sz.n_cohort, 6) AS retention
         FROM act a JOIN sz ON a.cohort_week = sz.cohort_week""",
    "k9_expectation_checks" ->
      """SELECT 'not_null(l_orderkey)' AS rule,
                CAST(count(*) AS BIGINT) AS n_checked,
                CAST(count(CASE WHEN l_orderkey IS NULL THEN 1 END) AS BIGINT) AS n_violations,
                count(CASE WHEN l_orderkey IS NULL THEN 1 END) = 0 AS passed
         FROM lineitem
         UNION ALL
         SELECT 'accepted_values(l_returnflag)',
                CAST(count(l_returnflag) AS BIGINT),
                CAST(count(CASE WHEN l_returnflag IS NOT NULL
                       AND l_returnflag NOT IN ('A','N','R') THEN 1 END) AS BIGINT),
                count(CASE WHEN l_returnflag IS NOT NULL
                  AND l_returnflag NOT IN ('A','N','R') THEN 1 END) = 0
         FROM lineitem
         UNION ALL
         SELECT 'accepted_range(l_quantity)',
                CAST(count(l_quantity) AS BIGINT),
                CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) AS BIGINT),
                count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END) = 0
         FROM lineitem
         UNION ALL
         SELECT 'unique(l_orderkey,l_linenumber)',
                CAST(count(*) AS BIGINT),
                CAST(count(CASE WHEN n > 1 THEN 1 END) AS BIGINT),
                count(CASE WHEN n > 1 THEN 1 END) = 0
         FROM (SELECT count(*) AS n FROM lineitem
               GROUP BY l_orderkey, l_linenumber)
         UNION ALL
         SELECT 'relationships(l_orderkey)',
                CAST(count(*) AS BIGINT),
                CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT),
                count(CASE WHEN o_orderkey IS NULL THEN 1 END) = 0
         FROM (SELECT o.o_orderkey FROM lineitem l
               LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
               WHERE l.l_orderkey IS NOT NULL)""",
    "o16_snapshot_diff" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
                  event_type, value
           FROM events),
         m AS (SELECT ((min(ts_us) + max(ts_us)) // 2 // 86400000000)
                        * 86400000000 + 43200000000 AS mid FROM e),
         bf AS (
           SELECT user_id, ts_us // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n_events,
                  max(event_id) AS last_event_id
           FROM e, m WHERE ts_us <= mid GROUP BY 1, 2),
         af AS (
           SELECT user_id, ts_us // 86400000000 AS day,
                  CAST(count(*) AS BIGINT) AS n_events,
                  max(event_id) AS last_event_id
           FROM e GROUP BY 1, 2),
         d AS (
           SELECT CASE WHEN bf.user_id IS NULL THEN 'added'
                       WHEN af.user_id IS NULL THEN 'removed'
                       WHEN bf.n_events IS DISTINCT FROM af.n_events
                         OR bf.last_event_id IS DISTINCT FROM af.last_event_id
                       THEN 'changed'
                       ELSE 'unchanged' END AS diff_status,
                  bf.n_events IS DISTINCT FROM af.n_events AS cn,
                  bf.last_event_id IS DISTINCT FROM af.last_event_id AS cl
           FROM bf FULL JOIN af ON bf.user_id = af.user_id
             AND bf.day = af.day)
         SELECT diff_status, CAST(count(*) AS BIGINT) AS n_keys,
                CAST(count(CASE WHEN diff_status = 'changed' AND cn THEN 1 END) AS BIGINT) AS n_chg_n_events,
                CAST(count(CASE WHEN diff_status = 'changed' AND cl THEN 1 END) AS BIGINT) AS n_chg_last_event_id
         FROM d GROUP BY diff_status""",
    "w16_twap" ->
      """WITH e AS (
           SELECT event_type, event_id, epoch_ns(ts) AS ts_ns, value
           FROM events),
         d AS (
           SELECT event_type, value,
                  (lead(ts_ns) OVER (PARTITION BY event_type
                     ORDER BY ts_ns, event_id) - ts_ns) // 1000 AS dur_us
           FROM e)
         SELECT event_type,
                CAST(count(*) AS BIGINT) AS n_intervals,
                CAST(sum(dur_us) AS BIGINT) AS total_us,
                round(sum(value * dur_us) / sum(dur_us), 4) AS twap
         FROM d WHERE dur_us IS NOT NULL GROUP BY event_type
         HAVING sum(dur_us) > 0""",
    "o15_scd2_history" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us, event_type
           FROM events),
         ch AS (
           SELECT user_id, event_id, ts_us, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS prev,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id) AS rn
           FROM e)
         SELECT user_id,
                CAST(row_number() OVER (PARTITION BY user_id
                  ORDER BY ts_us, event_id) AS INT) AS version,
                event_type AS attr,
                ts_us AS effective_from_us,
                lead(ts_us) OVER (PARTITION BY user_id
                  ORDER BY ts_us, event_id) AS effective_to_us,
                lead(ts_us) OVER (PARTITION BY user_id
                  ORDER BY ts_us, event_id) IS NULL AS is_current
         FROM ch WHERE rn = 1 OR prev IS DISTINCT FROM event_type"""
  )
}
