package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in `queries` demonstrates one operator family from SURVEY.md §2
  * (key prefix = §2 id) over the TESTDATA.md corpus; `oracleSql` carries the
  * DuckDB-equivalent SQL for the hash-match correctness gate.
  *
  * Determinism rules applied throughout:
  *   - every floating-point AGGREGATE is `round(x, 4)` on both sides (sum order
  *     differs between engines; raw column values are passed through exact);
  *   - integer sums are `count`-style or cast to BIGINT in the oracle (DuckDB
  *     sums integers into HUGEINT);
  *   - `events.ts` is never output raw (parquet ns vs Spark µs truncation) —
  *     windows order by `event_id` which is equivalent and exact.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Financial-mart shape: multiway dim join → lead-window pairing → measure
    * unpivot (the all_financials.sql:124-143,419-424 pattern on TPC-H data).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    import spark.implicits._
    val orders   = t(spark, dir, "orders")
    val customer = t(spark, dir, "customer")
    val nation   = t(spark, dir, "nation")

    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val paired = orders
      .join(broadcast(customer), $"o_custkey" === $"c_custkey")
      .join(broadcast(nation), $"c_nationkey" === $"n_nationkey")
      .withColumn("next_totalprice", lead($"o_totalprice", 1).over(w))
      .withColumn("price_delta", $"next_totalprice" - $"o_totalprice")
      .filter($"next_totalprice".isNotNull)
    Relational.melt(
      paired.select("n_name", "o_orderkey", "o_totalprice", "next_totalprice", "price_delta"),
      idCols = Seq("n_name", "o_orderkey"),
      measureCols = Seq("o_totalprice", "next_totalprice", "price_delta"))
  }

  /** One entry per implemented operator from SURVEY.md §2 (this object holds
    * the §2.4-§2.7 core; ExprQueries adds §2.3/§2.8 + remaining joins/aggs/
    * windows; TrainingQueries adds dedup/text/similarity/multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++ ExprQueries.queries ++ TrainingQueries.queries ++
      AnalyticsQueries.queries

  def oracleSql: Map[String, String] =
    coreOracleSql ++ ExprQueries.oracleSql ++ TrainingQueries.oracleSql ++
      AnalyticsQueries.oracleSql

  /** Per-module query/oracle name sets — spec-only surface for the
    * no-shadowing contract: `++` silently overrides duplicate keys, so a
    * name reused across modules would drop a query from the gate without
    * any error (ContractSpec pins pairwise disjointness). */
  private[graft] def queryGroups: Map[String, Set[String]] = Map(
    "core" -> coreQueries.keySet,
    "expr" -> ExprQueries.queries.keySet,
    "training" -> TrainingQueries.queries.keySet,
    "analytics" -> AnalyticsQueries.queries.keySet)

  private[graft] def oracleGroups: Map[String, Set[String]] = Map(
    "core" -> coreOracleSql.keySet,
    "expr" -> ExprQueries.oracleSql.keySet,
    "training" -> TrainingQueries.oracleSql.keySet,
    "analytics" -> AnalyticsQueries.oracleSql.keySet)

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.5 aggregations -------------------------------------------------

    // A1: multi-key group-by sums (helpers.py:239-248; data_warehouse.py:179)
    "a1_group_sum" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        // EXACT-DECIMAL SUMS (sf1 lesson): double sums over millions of rows
        // differ between engines in the last ulps (summation order), and at
        // sum magnitudes ≥ 1e10 that error reaches the round(.,4) boundary —
        // a1 flaked by one ulp of the 4th decimal at sf1. The corpus's money
        // columns carry exactly 2 decimals, so casting per element to
        // DECIMAL(18,2) makes the sum EXACT and engine-identical at any SF
        // (integer-cents totals stay < 2^53, so the final double is exact
        // too). Same treatment in the oracle SQL. Applies to every ≥100k-row
        // group money sum: a1/a2/a9/a10/j5/j12.
        .agg(
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum($"l_extendedprice".cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    // A2: named agg mixtures sum/avg/min/max/count (protocol_data_warehouse.py:296-318)
    "a2_named_aggs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("sum_price"),
          // decimal-sum mean (skew-sf10): 3M-row-group double avgs are
          // summation-order-dependent at the round(4) grid
          round(sum($"o_totalprice".cast("decimal(18,2)")).cast("double") /
            count($"o_totalprice"), 4).as("avg_price"),
          min($"o_totalprice").as("min_price"),
          max($"o_totalprice").as("max_price"),
          count(lit(1)).as("n_orders"))
    }),

    // A3: count / count distinct (sm_token_holders_by_day.sql:6)
    "a3_count_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          countDistinct($"l_orderkey").as("n_orders"),
          countDistinct($"l_suppkey").as("n_suppliers"),
          count(lit(1)).as("n_rows"))
    }),

    // A7: ratio-of-sums (sm_cost_of_cover_by_day.sql:5-6)
    "a7_ratio_of_sums" -> ((s, dir) => {
      import s.implicits._
      // price(2dp) x discount(2dp) is exactly 4dp: DECIMAL products make
      // both sums exact, so the ratio divides identical doubles (skew-sf10
      // decimal discipline)
      t(s, dir, "lineitem")
        .groupBy($"l_linestatus")
        .agg(round(
          sum($"l_extendedprice".cast("decimal(18,2)") *
            $"l_discount".cast("decimal(18,2)")).cast("double") /
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double"), 6)
          .as("effective_discount"))
    }),

    // A8: conditional (pivoted-by-CASE) aggregation (data_lake.py:1308-1361)
    "a8_conditional_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id")
        .agg(
          round(sum(when($"event_type" === "purchase", $"value").otherwise(0.0)
            .cast("decimal(18,2)")).cast("double"), 4)
            .as("purchase_value"),
          count(when($"event_type" === "error", lit(1))).as("n_errors"),
          count(when($"event_type" === "click", lit(1))).as("n_clicks"))
    }),

    // A10: bucketed histogram agg (sm_token_holder_distro.sql:8-19,31-44)
    "a10_bucket_histogram" -> ((s, dir) => {
      import s.implicits._
      val bucket = when($"c_acctbal" < 0, "negative")
        .when($"c_acctbal" < 2500, "small")
        .when($"c_acctbal" < 7500, "medium")
        .otherwise("large")
      t(s, dir, "customer")
        .withColumn("balance_bucket", bucket)
        .groupBy($"balance_bucket")
        .agg(count(lit(1)).as("n_customers"),
             sum($"c_acctbal".cast("decimal(18,2)")).cast("double").as("total_balance"))
    }),

    // ---- §2.4 joins --------------------------------------------------------

    // J1: left equi-join on natural keys (data_warehouse.py:119,182)
    "j1_left_join" -> ((s, dir) => {
      import s.implicits._
      // decimal money sum (skew-sf1 campaign): the planted hot customer
      // concentrates ~10% of orders on one key, so per-GROUP sums reach
      // 1e10 — double sum-order ulps cross the round(4) boundary there
      // (the same a1 defect the sf1 campaign fixed at table grain)
      val orderAgg = t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("cnt"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("spend"))
      t(s, dir, "customer")
        .join(orderAgg, $"c_custkey" === $"o_custkey", "left")
        .select(
          $"c_custkey", $"c_name",
          coalesce($"cnt", lit(0L)).as("n_orders"),
          // NO round after the double cast: the decimal sum is exactly
          // 2dp, and at the hot customer's ~3.6e11 spend, spend*1e4 is
          // past 2^51 where Spark's BigDecimal round and DuckDB's
          // numeric round disagree on the last ulp (skew-sf10 w8 find)
          coalesce($"spend", lit(0.0)).as("total_spend"))
    }),

    // J5: multi-way join with small-dim broadcast (all_financials.sql:437-445)
    "j5_multiway_join" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
        .join(broadcast(t(s, dir, "customer")), $"o_custkey" === $"c_custkey")
        .join(broadcast(t(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
               (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
               .cast("double").as("revenue"),
             count(lit(1)).as("n_lines"))
    }),

    // J8: greatest-1-per-group (price-rank dedup, data_warehouse.py:509-518)
    "j8_top_per_group" -> ((s, dir) => {
      import s.implicits._
      Relational.topPerGroup(
        t(s, dir, "orders"), Seq("o_custkey"),
        Seq($"o_totalprice".desc, $"o_orderkey".asc))
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    }),

    // J9a: left-semi join (data_lake.py:1029 isin form)
    "j9_semi_join" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
    }),

    // J9b: left-anti join (data_lake.py:1030 isna-after-merge form)
    "j9_anti_join" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name", $"c_mktsegment")
    }),

    // ---- §2.6 windows ------------------------------------------------------

    // W1: lead() start/end pairing (all_financials.sql:124-143)
    "w1_lead_pairing" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("next_totalprice", lead($"o_totalprice", 1).over(w))
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice", $"next_totalprice")
    }),

    // W2: lag() daily delta (balancer_bpt_by_day.sql:15)
    "w2_lag_delta" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("prev_totalprice", lag($"o_totalprice", 1).over(w))
        .withColumn("price_change", round($"o_totalprice" - $"prev_totalprice", 4))
        .select($"o_custkey", $"o_orderkey", $"prev_totalprice", $"price_change")
    }),

    // W3: last_value ignore-nulls forward-fill, ROWS frame
    // (market_config_by_hour.sql:27-30; SURVEY §7.4(5))
    "w3_ffill_last_ignore_nulls" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("last_purchase_value",
          last(when($"event_type" === "purchase", $"value"), ignoreNulls = true).over(w))
        .select($"event_id", $"user_id", $"event_type", $"last_purchase_value")
    }),

    // ---- §2.7 sort / dedup / set ops ---------------------------------------

    // O2: dedup keep-last after sort (data_warehouse.py:706,751)
    "o2_dedup_keep_last" -> ((s, dir) => {
      import s.implicits._
      Relational.dedupKeepLast(
        t(s, dir, "events").select($"user_id", $"event_type", $"event_id", $"value"),
        keyCols = Seq("user_id", "event_type"),
        orderCols = Seq("event_id"))
    }),

    // O3: distinct projection (aave_atokens.sql:4-7)
    "o3_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").select($"o_orderstatus", $"o_orderpriority").distinct()
    }),

    // O4: latest-only snapshot (treasury_totals_latest.sql:10; P10 scalar subquery)
    "o4_latest_only" -> ((s, dir) => {
      import s.implicits._
      Relational.latestOnly(t(s, dir, "events"), "event_id")
        .select($"event_id", $"user_id", $"event_type", $"value")
    }),

    // O5: schema-aligned union-all with padded literals (all_financials.sql:17-82)
    "o5_union_all_padded" -> ((s, dir) => {
      import s.implicits._
      val c = t(s, dir, "customer")
        .select($"c_custkey".as("entity_id"), lit("customer").as("kind"),
                $"c_acctbal".as("balance"), $"c_nationkey".cast("long").as("nationkey"))
      val sup = t(s, dir, "supplier")
        .select($"s_suppkey".as("entity_id"), lit("supplier").as("kind"),
                $"s_acctbal".as("balance"), $"s_nationkey".cast("long").as("nationkey"))
      c.unionByName(sup)
    }),

    // O6: union then distinct (market_state_by_time.sql:58-60)
    "o6_union_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer").select($"c_nationkey".cast("long").as("nationkey"))
        .union(t(s, dir, "supplier").select($"s_nationkey".cast("long").as("nationkey")))
        .distinct()
    }),

    // J12: salted join for skewed keys — the hot-key mitigation AQE can't
    // always apply (Relational.saltedJoin). Result is provably identical to
    // the plain join, so the oracle is the unsalted SQL; the aggregation
    // after the join makes the equivalence hash-checkable.
    "j12_salted_join" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").select($"l_suppkey", $"l_orderkey", $"l_quantity")
      val supp = t(s, dir, "supplier")
        .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
      Relational.saltedJoin(li, supp, keys = Seq("l_suppkey"),
          saltFrom = "l_orderkey", nSalts = 8)
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_items"),
             sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
    }),

    // J13: bloom-filter semi-join pruning (functions.Prune over Spark's own
    // sketch machinery) — the big side is pre-filtered by a KB-sized inlined
    // bloom of the small side's keys BEFORE the join shuffle; the exact
    // semi-join then drops the false positives, so the result is provably
    // the plain semi join (which is the oracle).
    "j13_bloom_prune" -> ((s, dir) => {
      import s.implicits._
      val hot = t(s, dir, "customer").filter($"c_acctbal" > 9000)
        .select($"c_custkey")
      val bf = graft.functions.Prune.bloomLiteral(hot, $"c_custkey",
        nItems = 2000L, nBits = 32768L)
      t(s, dir, "orders")
        .filter(graft.functions.Prune.mightContain(bf, $"o_custkey"))
        .join(hot, $"o_custkey" === $"c_custkey", "left_semi")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    }),

    // O12: SCD TYPE-2 interval build (Relational.scd2) — collapse a change
    // log into versioned dimension rows with validity ranges; one shuffle
    // on the entity key, both window passes share the Exchange.
    "o12_scd2" -> ((s, dir) => {
      import s.implicits._
      val log = t(s, dir, "orders")
        .select($"o_custkey", $"o_orderdate", $"o_orderkey", $"o_orderstatus")
      Relational.scd2(log, keyCols = Seq("o_custkey"),
          orderCols = Seq("o_orderdate", "o_orderkey"),
          trackCols = Seq("o_orderstatus"))
        .select($"o_custkey", $"o_orderkey", $"o_orderstatus",
          date_format($"valid_from", "yyyy-MM-dd").as("valid_from"),
          date_format($"valid_to", "yyyy-MM-dd").as("valid_to"),
          $"is_current")
    }),

    // O14: CDC changelog apply (Relational.applyCdc) — o11's MERGE
    // generalized to a log with DELETES and multiple changes per key:
    // each order is a change event for its customer (every 10th order a
    // delete), the highest order key per customer wins, untouched
    // customers pass through. Window-latest on the (small) changelog +
    // one anti-join on the base.
    "o14_cdc_apply" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "customer")
        .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
      val changes = t(s, dir, "orders").select(
        $"o_custkey".as("c_custkey"),
        concat(lit("upd_"), $"o_custkey").as("c_name"),
        round($"o_totalprice", 2).as("c_acctbal"),
        ($"o_custkey" % 25).cast("int").as("c_nationkey"),
        when($"o_orderkey" % 10 === 0, "D").otherwise("U").as("op"),
        $"o_orderkey".as("seq"))
      Relational.applyCdc(base, changes, Seq("c_custkey"), "seq", "op")
    }),

    // O13: global dense row ids in a total order — zipWithIndex over a
    // range-partitioned parallel sort (per-partition offsets, stamped
    // map-side), NOT a single-partition row_number window. The oracle IS
    // that window — results must be identical.
    "o13_global_row_ids" -> ((s, dir) => {
      import s.implicits._
      Relational.globalRowIds(
        t(s, dir, "orders").select($"o_orderkey", $"o_custkey", $"o_totalprice"),
        orderCols = Seq($"o_totalprice".desc, $"o_orderkey".asc))
        .select($"o_orderkey", $"o_custkey", $"row_id")
    }),

    // O23: RETRY-DETERMINISM gate — o13's zipWithIndex row ids computed
    // UNDER injected task failures (every even partition's first attempt
    // throws; the ",2" in Verify/Bench masters makes that retryable).
    // At 1000 executors retries are routine, so attempt-order-dependent
    // output is the scale bug a clean small-SF run can never catch. The
    // oracle recomputes the same ids in DuckDB with zero failures — any
    // retry-order dependence hash-mismatches. `retries_fired` proves the
    // injection actually happened (max attempt over surviving rows >= 1,
    // raise_error otherwise — a vacuous-pass guard).
    "o23_retry_rowids" -> ((s, dir) => {
      import s.implicits._
      // repartition(8) BEFORE injection: the corpus tables can be a
      // single parquet row group, so file-splitting puts every row in ONE
      // split of arbitrary parity (the other splits are empty) — and the
      // split count follows defaultParallelism, which on a cluster tracks
      // the LIVE executor count at planning time. The chaos campaign
      // caught exactly that: with an executor down, the row-bearing split
      // landed on an odd partition, empty even partitions threw+retried
      // invisibly, and the vacuous-pass guard fired on a run whose
      // injection had in fact happened. A round-robin shuffle guarantees
      // rows in every partition, making the attempt stamp observable.
      val base = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity")
        .repartition(8)
      val injected = graft.functions.Chaos.injectTaskRetries(base)
      // The order MUST be total over every emitted column: (l_orderkey,
      // l_linenumber) alone has duplicate pairs in EVERY corpus (14k at
      // the driver's sf0.01, 16M at skew-sf10 where 5% of rows share one
      // orderkey), and Spark's spill-merge does not preserve tie order —
      // the skew-sf10 gate caught the row_id↔qty pairing diverging from
      // DuckDB's stable sort. Adding l_quantity makes ties FULL-ROW
      // identical, so any intra-tie row_id permutation yields the same
      // output multiset. asc_nulls_first is Spark's asc default, stated
      // explicitly because the oracle must pin NULLS FIRST (DuckDB
      // defaults ASC to NULLS LAST).
      val ids = Relational.globalRowIds(injected,
        orderCols = Seq($"l_orderkey".asc, $"l_linenumber".asc,
          $"l_quantity".asc_nulls_first))
      val fired = ids.agg(max($"__attempt").as("__mx"))
        .select(when($"__mx" >= 1, lit(true))
          .otherwise(raise_error(lit(
            "o23: retry injection never fired — gate is vacuous"))).as("retries_fired"))
      ids.filter($"row_id" % 97 === 0)
        .select($"row_id", $"l_orderkey", $"l_linenumber",
          $"l_quantity".cast("double").as("qty"))
        .crossJoin(broadcast(fired))
    }),

    // W12: interval-overlap concurrency via sweep line — peak simultaneous
    // open orders per priority class. The ±1 deltas aggregate per (key,
    // day) BEFORE the running sum, so the window sorts |distinct days|
    // rows per key, not |intervals| — and simultaneous open/close at the
    // same day nets out (half-open [start, end) semantics).
    "w12_interval_overlap" -> ((s, dir) => {
      import s.implicits._
      val iv = t(s, dir, "orders").select(
        $"o_orderpriority".as("prio"),
        $"o_orderdate".cast("date").as("s"),
        date_add($"o_orderdate".cast("date"),
          (($"o_orderkey" % 60) + 1).cast("int")).as("e"))
      val pts = iv.select($"prio", $"s".as("t"), lit(1).as("delta"))
        .unionAll(iv.select($"prio", $"e".as("t"), lit(-1).as("delta")))
      val net = pts.groupBy($"prio", $"t").agg(sum($"delta").as("net"))
      val w = Window.partitionBy($"prio").orderBy($"t".asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      net.withColumn("active", sum($"net").over(w))
        .groupBy($"prio")
        .agg(max($"active").as("peak_concurrency"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  private def coreOracleSql: Map[String, String] = Map(
    "o12_scd2" ->
      """WITH pts AS (
           SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
                  lag(o_orderstatus) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey) AS prev
           FROM orders),
         chg AS (
           SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus FROM pts
           WHERE prev IS DISTINCT FROM o_orderstatus)
         SELECT o_custkey, o_orderkey, o_orderstatus,
                strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
                strftime(lead(o_orderdate) OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d') AS valid_to,
                (lead(o_orderdate) OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)) IS NULL AS is_current
         FROM chg""",
    "o13_global_row_ids" ->
      """SELECT o_orderkey, o_custkey,
                row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS row_id
         FROM orders""",
    "o23_retry_rowids" ->
      """WITH ids AS (
           SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS qty,
                  row_number() OVER (ORDER BY l_orderkey ASC, l_linenumber ASC,
                                     l_quantity ASC NULLS FIRST) AS row_id
           FROM lineitem)
         SELECT row_id, l_orderkey, l_linenumber, qty, true AS retries_fired
         FROM ids WHERE row_id % 97 = 0""",
    "o14_cdc_apply" ->
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
         SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_nationkey
         FROM customer c
         WHERE c.c_custkey NOT IN (SELECT c_custkey FROM latest)
         UNION ALL
         SELECT c_custkey, c_name, c_acctbal, c_nationkey
         FROM latest WHERE op <> 'D'""",
    "w12_interval_overlap" ->
      """WITH iv AS (
           SELECT o_orderpriority AS prio,
                  CAST(o_orderdate AS DATE) AS s,
                  CAST(o_orderdate AS DATE) + CAST((o_orderkey % 60) + 1 AS INTEGER) AS e
           FROM orders),
         pts AS (
           SELECT prio, s AS t, 1 AS delta FROM iv
           UNION ALL SELECT prio, e, -1 FROM iv),
         net AS (SELECT prio, t, CAST(SUM(delta) AS BIGINT) AS net
                 FROM pts GROUP BY prio, t),
         run AS (SELECT prio,
                        SUM(net) OVER (PARTITION BY prio ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
                 FROM net)
         SELECT prio, CAST(max(active) AS BIGINT) AS peak_concurrency
         FROM run GROUP BY prio""",
    "a1_group_sum" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         round(avg(l_quantity),4) AS avg_qty,
         count(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus""",
    "a2_named_aggs" ->
      """SELECT o_orderpriority,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / count(o_totalprice),4) AS avg_price,
         min(o_totalprice) AS min_price,
         max(o_totalprice) AS max_price,
         count(*) AS n_orders
         FROM orders GROUP BY o_orderpriority""",
    "a3_count_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_orderkey) AS n_orders,
         count(DISTINCT l_suppkey) AS n_suppliers,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",
    "a7_ratio_of_sums" ->
      """SELECT l_linestatus,
         round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                        CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
               / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),
               6) AS effective_discount
         FROM lineitem GROUP BY l_linestatus""",
    "a8_conditional_agg" ->
      """SELECT user_id,
         round(CAST(sum(CAST(CASE WHEN event_type='purchase' THEN value ELSE 0 END
                   AS DECIMAL(18,2))) AS DOUBLE),4) AS purchase_value,
         count(CASE WHEN event_type='error' THEN 1 END) AS n_errors,
         count(CASE WHEN event_type='click' THEN 1 END) AS n_clicks
         FROM events GROUP BY user_id""",
    "a10_bucket_histogram" ->
      """SELECT CASE WHEN c_acctbal < 0 THEN 'negative'
                     WHEN c_acctbal < 2500 THEN 'small'
                     WHEN c_acctbal < 7500 THEN 'medium'
                     ELSE 'large' END AS balance_bucket,
         count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
         FROM customer GROUP BY 1""",
    "j1_left_join" ->
      """SELECT c_custkey, c_name,
         coalesce(o.cnt, 0) AS n_orders,
         coalesce(o.spend, 0) AS total_spend
         FROM customer
         LEFT JOIN (SELECT o_custkey, count(*) AS cnt,
                           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
                    FROM orders GROUP BY o_custkey) o
         ON c_custkey = o.o_custkey""",
    "j5_multiway_join" ->
      """SELECT r_name, n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
         count(*) AS n_lines
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",
    "j8_top_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders) WHERE rn = 1""",
    "j9_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "j9_anti_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
    "w1_lead_pairing" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
         lead(o_totalprice) OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS next_totalprice
         FROM orders""",
    "w2_lag_delta" ->
      """SELECT o_custkey, o_orderkey, prev_totalprice,
         round(o_totalprice - prev_totalprice, 4) AS price_change FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  lag(o_totalprice) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) AS prev_totalprice
           FROM orders)""",
    "w3_ffill_last_ignore_nulls" ->
      """SELECT event_id, user_id, event_type,
         last_value(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
         FROM events""",
    "o2_dedup_keep_last" ->
      """SELECT user_id, event_type, event_id, value FROM (
           SELECT user_id, event_type, event_id, value,
                  row_number() OVER (PARTITION BY user_id, event_type
                                     ORDER BY event_id DESC) AS rn
           FROM events) WHERE rn = 1""",
    "o3_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "o4_latest_only" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE event_id = (SELECT max(event_id) FROM events)""",
    "o5_union_all_padded" ->
      """SELECT c_custkey AS entity_id, 'customer' AS kind, c_acctbal AS balance,
                CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
         UNION ALL
         SELECT s_suppkey, 'supplier', s_acctbal, CAST(s_nationkey AS BIGINT) FROM supplier""",
    "o6_union_distinct" ->
      """SELECT DISTINCT nationkey FROM (
           SELECT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
           UNION ALL
           SELECT CAST(s_nationkey AS BIGINT) FROM supplier)""",
    "j12_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_items,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY s_nationkey""",
    "j13_bloom_prune" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)"""
  )
}
