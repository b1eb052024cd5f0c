package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Abi, Finance, Interp}
import graft.operators.Relational

/** SURVEY.md §2.3 (projection/filter), remaining §2.4 joins, §2.5 aggs,
  * §2.6 windows, §2.7 sorts and the §2.8 scalar-expression families —
  * each key has a DuckDB oracle twin in `oracleSql`.
  */
object ExprQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- §2.3 projection / filter / predicates -----------------------------

    // P1+P4+P6: column subset, boolean-mask filter, isin membership
    // (helpers.py:215-224; data_warehouse.py:709; data_lake.py:1029)
    "p1_project_filter_isin" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_returnflag", $"l_discount")
        .filter($"l_discount" > 0.05 && $"l_returnflag".isin("A", "R"))
    }),

    // P2+P3: column rename + drop (helpers.py:68-77; data_lake.py:1055)
    "p2_rename_drop" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "nation")
        .withColumnRenamed("n_name", "nation_name")
        .drop("n_comment")
        .select($"n_nationkey", $"nation_name", $"n_regionkey")
    }),

    // P5: string-expression predicate (protocol_data_lake.py:649 query())
    "p5_expr_filter" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .filter(expr("l_quantity > 45 AND l_discount <= 0.02"))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_discount")
    }),

    // P9: date-range + IN-list WHERE (sm_covered_markets_tvl_by_day.sql:8-64)
    "p9_range_inlist" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_orderdate".between(lit("1996-01-01").cast("timestamp"),
                                       lit("1996-12-31").cast("timestamp")) &&
          $"o_orderpriority".isin("1-URGENT", "2-HIGH"))
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
    }),

    // P7: null creation + na.fill (data_lake.py:978,1030; helpers.py:232)
    "p7_null_handling" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .withColumn("pos_bal", when($"c_acctbal" >= 0, $"c_acctbal"))
        .na.fill(Map("pos_bal" -> -1.0))
        .withColumn("is_missing", $"pos_bal" === -1.0)
        .select($"c_custkey", $"pos_bal", $"is_missing")
    }),

    // P8: conditional cell overwrite (data_lake.py:189,342 WETH patch)
    "p8_conditional_overwrite" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "nation")
        .withColumn("n_name",
          when($"n_nationkey" === 0, lit("PATCHED_NATION")).otherwise($"n_name"))
        .select($"n_nationkey", $"n_name", $"n_regionkey")
    }),

    // P10: scalar-subquery predicate — rows above global average
    // (aave_atokens.sql:25 pattern generalized)
    "p10_scalar_subquery" -> ((s, dir) => {
      import s.implicits._
      val avgPrice = t(s, dir, "orders").agg(avg($"o_totalprice").as("__avg"))
      t(s, dir, "orders")
        .crossJoin(broadcast(avgPrice))
        .filter($"o_totalprice" > $"__avg")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    }),

    // P11: column profiling — the data-quality screen an ETL runs before
    // trusting a feed (row/null counts, range, mean per column). ONE scan:
    // all 15 aggregates ride a single map-side-combinable aggregation, and
    // the wide 1-row result pivots to long form driver-free with an
    // inline-table cross join (3 rows × 1).
    "p11_column_profile" -> ((s, dir) => {
      import s.implicits._
      val agg = t(s, dir, "lineitem").agg(
        count(lit(1)).as("n"),
        count($"l_quantity").as("nn_qty"), round(min($"l_quantity"), 4).as("mn_qty"),
        round(max($"l_quantity"), 4).as("mx_qty"), round(avg($"l_quantity"), 4).as("av_qty"),
        // fractional-money avgs via exact decimal sums (skew-sf10 j2
        // lesson): a 60M-row double avg's summation-order ulps land the
        // mean anywhere relative to the round(4) grid; sum(DECIMAL)/count
        // gives both engines the identical double to round
        count($"l_extendedprice").as("nn_prc"), round(min($"l_extendedprice"), 4).as("mn_prc"),
        round(max($"l_extendedprice"), 4).as("mx_prc"),
        round(sum($"l_extendedprice".cast("decimal(18,2)")).cast("double") /
          count($"l_extendedprice"), 4).as("av_prc"),
        count($"l_discount").as("nn_dsc"), round(min($"l_discount"), 4).as("mn_dsc"),
        round(max($"l_discount"), 4).as("mx_dsc"),
        round(sum($"l_discount".cast("decimal(18,2)")).cast("double") /
          count($"l_discount"), 4).as("av_dsc"))
      agg.select(explode(array(
          struct(lit("l_quantity").as("column"), $"n".as("n_rows"),
            ($"n" - $"nn_qty").as("n_nulls"), $"mn_qty".as("min_v"),
            $"mx_qty".as("max_v"), $"av_qty".as("mean_v")),
          struct(lit("l_extendedprice").as("column"), $"n".as("n_rows"),
            ($"n" - $"nn_prc").as("n_nulls"), $"mn_prc".as("min_v"),
            $"mx_prc".as("max_v"), $"av_prc".as("mean_v")),
          struct(lit("l_discount").as("column"), $"n".as("n_rows"),
            ($"n" - $"nn_dsc").as("n_nulls"), $"mn_dsc".as("min_v"),
            $"mx_dsc".as("max_v"), $"av_dsc".as("mean_v")))).as("p"))
        .select($"p.*")
    }),

    // ---- §2.4 remaining joins ----------------------------------------------

    // J2: inner equi-join on composite key (data_lake.py:1045-1050)
    "j2_composite_key_join" -> ((s, dir) => {
      import s.implicits._
      // decimal-exact avg, emitted UNROUNDED (skew-sf10 campaign):
      // sum(DECIMAL(18,2)) is exact and engine-identical, and the double
      // division by the non-null count is then IEEE-identical — but a
      // round(6) on top is NOT: when the quotient's shortest decimal repr
      // is a true half-way point (32.3159375 in this corpus), Spark
      // rounds that decimal string HALF_UP while DuckDB rounds the binary
      // value sitting an ulp below it. With 7.5M groups one such quotient
      // is guaranteed; only the unrounded identical double is safe.
      val dim = t(s, dir, "events")
        .groupBy($"user_id", $"event_type")
        .agg((sum($"value".cast("decimal(18,2)")).cast("double") /
          count($"value")).as("avg_value"))
      t(s, dir, "events")
        .join(dim, Seq("user_id", "event_type"), "inner")
        .filter($"value" > $"avg_value" * 2)
        .select($"event_id", $"user_id", $"event_type",
                $"value", $"avg_value")
    }),

    // J3: positional (row-index) join (data_lake.py:2072-2073) — stable
    // row_number over an explicit total order on both sides, then join.
    // Distributed top-k FIRST (orderBy+limit plans TakeOrderedAndProject:
    // per-partition heaps + driver merge), THEN rank the 50 survivors — a
    // global row_number window over the full table would funnel every row
    // through one partition.
    "j3_positional_join" -> ((s, dir) => {
      import s.implicits._
      val wo = Window.partitionBy(Relational.onePartKey($"o_orderkey"))
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      val wc = Window.partitionBy(Relational.onePartKey($"c_custkey"))
        .orderBy($"c_acctbal".desc, $"c_custkey".asc)
      val topOrders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc).limit(50)
        .withColumn("pos", row_number().over(wo))
      val topCust = t(s, dir, "customer")
        .select($"c_custkey", $"c_acctbal")
        .orderBy($"c_acctbal".desc, $"c_custkey".asc).limit(50)
        .withColumn("pos", row_number().over(wc))
      topOrders.join(topCust, "pos")
        .select($"pos", $"o_orderkey", $"o_totalprice", $"c_custkey", $"c_acctbal")
    }),

    // J4: cross join (protocol_data_warehouse.py:560 sweep grid)
    "j4_cross_join" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "nation").crossJoin(t(s, dir, "region"))
        .select($"n_nationkey", $"n_name", $"r_regionkey", $"r_name")
    }),

    // J6: left join against filtered derived subquery (asset_tvl_by_day.sql:38-43)
    "j6_join_derived_subquery" -> ((s, dir) => {
      import s.implicits._
      // decimal-exact sum (skew-sf10): the hot customer's F-order spend
      // reaches 1e11, past the magnitude where double sum order is
      // round(4)-stable (j1's skew-sf1 lesson, unapplied here until the
      // skew-sf10 gate caught it)
      val finished = t(s, dir, "orders")
        .filter($"o_orderstatus" === "F")
        .groupBy($"o_custkey")
        .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
          .as("finished_spend"))
      t(s, dir, "customer")
        .join(finished, $"c_custkey" === $"o_custkey", "left")
        .select($"c_custkey", coalesce($"finished_spend", lit(0.0)).as("finished_spend"))
    }),

    // J7: multi-candidate resolution — coalesce over repeated left joins
    // (safety_module_totals_by_day.sql:24-46)
    "j7_coalesce_multi_join" -> ((s, dir) => {
      import s.implicits._
      val custAvg = t(s, dir, "customer").filter($"c_acctbal" > 5000)
        .groupBy($"c_nationkey".cast("long").as("nk"))
        .agg(round(sum($"c_acctbal".cast("decimal(18,2)")).cast("double") /
          count($"c_acctbal"), 4).as("cust_avg"))
      val suppAvg = t(s, dir, "supplier")
        .groupBy($"s_nationkey".cast("long").as("nk"))
        .agg(round(sum($"s_acctbal".cast("decimal(18,2)")).cast("double") /
          count($"s_acctbal"), 4).as("supp_avg"))
      t(s, dir, "nation")
        .join(custAvg, $"n_nationkey" === custAvg("nk"), "left")
        .join(suppAvg, $"n_nationkey" === suppAvg("nk"), "left")
        .select($"n_nationkey", $"n_name",
                round(coalesce($"cust_avg", $"supp_avg", lit(0.0)), 4).as("resolved_balance"))
    }),

    // J10a: backward as-of join (union+ffill composition — operators.Temporal;
    // oracle = DuckDB's native ASOF LEFT JOIN)
    "j10_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("p_event_id"), $"value")
      graft.operators.Temporal.asofJoinBackward(
        clicks, purchases, Seq("user_id"), "event_id", "p_event_id", Seq("value"))
        .select($"event_id", $"user_id", round($"value", 4).as("last_purchase_value"))
    }),

    // J14: FORWARD as-of join — for each click, the NEXT purchase (the
    // "next fill/next quote" mirror of J10's last-known lookup); same
    // single-shuffle union+ffill plan via time negation.
    "j14_asof_forward" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"event_id", $"user_id")
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("p_event_id"), $"value")
      graft.operators.Temporal.asofJoinForward(
        clicks, purchases, Seq("user_id"), "event_id", "p_event_id", Seq("value"))
        .select($"event_id", $"user_id", round($"value", 4).as("next_purchase_value"))
    }),

    // J10b: point-in-interval range join via bucketing (operators.Temporal;
    // oracle = plain inequality join, feasible in DuckDB at oracle scale)
    "j10_range_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
      val intervals = ev.filter($"event_type" === "signup")
        .select($"user_id", $"event_id".as("session_start"),
          ($"event_id" + 2000L).as("session_end"))
      val points = ev.filter($"event_type" === "error")
        .select($"user_id", $"event_id")
      graft.operators.Temporal.rangeJoinBucketed(
        points, intervals, Seq("user_id"), "event_id", "session_start", "session_end",
        binSize = 1024)
        .select($"user_id", $"event_id", $"session_start")
    }),

    // ---- §2.5 remaining aggregations ---------------------------------------

    // A4: aggregate-to-list (protocol_data_warehouse.py:368-374) — sorted for
    // determinism, emitted as CSV string for the cross-engine hash compare
    "a4_collect_list" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .filter($"o_totalprice" > 400000)
        .groupBy($"o_custkey")
        .agg(concat_ws(",", sort_array(collect_list($"o_orderkey"))).as("order_keys"),
             count(lit(1)).as("n"))
    }),

    // A6: global max/min scalar (data_warehouse.py:700; aave_atokens.sql:25)
    "a6_global_minmax" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .agg(max($"l_shipdate").as("max_shipdate"),
             min($"l_shipdate").as("min_shipdate"),
             round(max($"l_extendedprice"), 4).as("max_price"),
             count(lit(1)).as("n_rows"))
    }),

    // A9: grouped sum of all numeric columns (protocol_data_warehouse.py:509)
    "a9_sum_all_numerics" -> ((s, dir) => {
      import s.implicits._
      val numerics = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
      // Exact-decimal sums (sf1 lesson, see a1): 2M-row groups of money
      // doubles flake at the round boundary; DECIMAL(18,2) per-element cast
      // makes the sum exact and engine-identical at any SF.
      def dsum(c: String) = sum(col(c).cast("decimal(18,2)")).cast("double")
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag")
        .agg(dsum(numerics.head).as(s"sum_${numerics.head}"),
             numerics.tail.map(c => dsum(c).as(s"sum_$c")): _*)
    }),

    // ---- §2.6 remaining windows --------------------------------------------

    // W4: last_value ignore nulls, RANGE frame (inv_defi_ref_rates_by_day.sql:27)
    "w4_range_ffill" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "events")
        .withColumn("ref_rate",
          last(when($"event_type" === "signup", $"value"), ignoreNulls = true).over(w))
        .select($"event_id", $"user_id", $"ref_rate")
    }),

    // W5: shift+diff monotonic filter (protocol_data_warehouse.py:529-534)
    "w5_monotonic_filter" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .filter($"prev_price".isNull || $"o_totalprice" >= $"prev_price")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    }),

    // W7: calendar-spine resample + gap-fill (pandas resample('D').ffill()):
    // per-user daily sums expanded onto each user's continuous [min, max]
    // day range, gaps forward-filled. Day emitted as a string (DATE dtype
    // mismatches the oracle's pandas bridge).
    "w7_resample_gapfill" -> ((s, dir) => {
      import s.implicits._
      val base = t(s, dir, "events")
        .withColumn("day",
          date_trunc("day", timestamp_micros(($"ts" / 1000).cast("long"))))
        .groupBy($"user_id", $"day")
        // exact decimal day sums: the Zipf user's ~52k-value days leave a
        // double sum's order-ulps within reach of the round(6) grid
        .agg(round(sum($"value".cast("decimal(18,2)")).cast("double"), 6)
          .as("day_value"))
      graft.operators.Temporal.resampleDaily(base, Seq("user_id"), "day", Seq("day_value"))
        .select($"user_id", date_format($"day", "yyyy-MM-dd").as("day"), $"day_value")
    }),

    // ---- §2.7 sorted top-k -------------------------------------------------

    // O1: multi-key sort + limit (data_warehouse.py:706; all_financials.sql:447)
    "o1_topk_sorted" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    }),

    // ---- §2.8 scalar expression families -----------------------------------

    // E1: date/time family — trunc, add days/months, datediff, extract, epoch
    "e1_datetime_ops" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select(
          $"o_orderkey",
          date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM-dd").as("order_month"),
          date_format(date_add($"o_orderdate".cast("date"), 30), "yyyy-MM-dd").as("due_date"),
          date_format(add_months($"o_orderdate".cast("date"), -6), "yyyy-MM-dd").as("six_months_back"),
          datediff(lit("1998-12-31").cast("date"), $"o_orderdate".cast("date")).as("days_to_eoy"),
          year($"o_orderdate").cast("long").as("order_year"),
          month($"o_orderdate").cast("long").as("order_month_num"),
          unix_timestamp($"o_orderdate").as("epoch_s"))
    }),

    // E2: string family — concat, substring, right, lower/upper, regexp,
    // startswith, replace (SURVEY §2.8 strings)
    "e2_string_ops" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "part")
        .select(
          $"p_partkey",
          concat($"p_brand", lit("|"), $"p_type").as("brand_type"),
          substring($"p_name", 1, 8).as("name_prefix"),
          substring($"p_type", -4, 4).as("type_suffix"),
          lower($"p_name").as("name_lower"),
          upper($"p_brand").as("brand_upper"),
          regexp_replace($"p_type", "[aeiou]", "").as("type_novowel"),
          $"p_name".startsWith("a").as("starts_a"),
          length($"p_name").cast("long").as("name_len"))
    }),

    // E3: math/conditional family — APY compounding, safe div, clamp,
    // case ladder, round, price impact (SURVEY §2.8 math)
    "e3_math_conditional" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
      li.select(
        $"l_orderkey", $"l_linenumber",
        round(Finance.apyCompounded($"l_discount", lit(365.0)), 8).as("apy"),
        // floor(x·1e4+0.5)/1e4 instead of round(): identical double math in
        // both engines — round() tie-handling differs at .xxxx5 boundaries
        (floor(Relational.safeDiv($"l_extendedprice", $"l_quantity") * 1e4 + 0.5) / 1e4).as("unit_price"),
        round(greatest(least($"l_quantity", lit(40.0)) - lit(10.0), lit(0.0)), 4).as("clamped"),
        when($"l_quantity" < 10, "low").when($"l_quantity" < 30, "mid").otherwise("high").as("qty_band"),
        round(lit(1.0) - (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax"), 6).as("price_impact"))
    }),

    // E4: unpivot/melt — 37-column UNPIVOT pattern (all_financials.sql:419-424)
    "e4_unpivot" -> ((s, dir) => {
      import s.implicits._
      Relational.melt(
        t(s, dir, "lineitem")
          .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice", $"l_discount", $"l_tax"),
        idCols = Seq("l_orderkey", "l_linenumber"),
        measureCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
    }),

    // E5: pivot with multiple aggregations + deterministic names
    // (streaming_payments_summary.sql:60-68)
    "e5_pivot_multi_agg" -> ((s, dir) => {
      import s.implicits._
      // na.fill(0): Spark pivot (SQL semantics) leaves an EMPTY cell —
      // a user with no 'click' rows — NULL, while the oracle's
      // CASE-pivot folds it to 0. Uniform data never exposes the
      // difference (every user has every type); the planted-Zipf skew
      // corpus does (tail users have 1-2 events), which is where this
      // fill was first forced. pandas pivot_table(fill_value=0) parity.
      Relational.pivotAgg(
        t(s, dir, "events"),
        groupCols = Seq("user_id"),
        pivotCol = "event_type",
        values = Seq("click", "purchase", "view"),
        aggs = Seq(
          "total" -> round(sum(coalesce($"value", lit(0.0))
            .cast("decimal(18,2)")).cast("double"), 4),
          "n" -> count(lit(1))))
        .na.fill(0)
    }),

    // E6: grid generation — sequence + explode sweep amounts
    // (protocol_data_lake.py:893-896 `[10**i for i in range(3,10)]`)
    "e6_explode_grid" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "region")
        .select($"r_regionkey", $"r_name", explode(sequence(lit(3), lit(9))).as("exp"))
        .select($"r_regionkey", $"r_name", $"exp".cast("long").as("exp"),
                pow(lit(10.0), $"exp").as("amount"))
    }),

    // E7: ABI hex decode roundtrip — build a 32-byte word from an integer,
    // decode uint256 + address back (data_lake.py:979-984,1031-1034)
    "e7_abi_decode" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders").filter($"o_orderkey" < 2000)
        .withColumn("blob", concat(lit("0x"), lpad(lower(hex($"o_orderkey")), 64, "0")))
        .select(
          $"o_orderkey",
          $"blob",
          Abi.decodeUint256($"blob").as("decoded_uint"),
          Abi.decodeAddress($"blob").as("decoded_address"))
    }),

    // E8: JSON extraction (helpers.py:326 json_normalize; Snowflake
    // decoded_log:amount::int — data_lake.py:1323)
    "e8_json_extract" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .select(
          $"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"))
    }),

    // E9: inline constant table + join (sm_token_holder_distro.sql:56-69
    // unnest-of-structs → Seq.toDF / stack)
    "e9_inline_table" -> ((s, dir) => {
      import s.implicits._
      val bands = Seq(
        ("AMERICA", 1.1), ("ASIA", 1.25), ("EUROPE", 1.0),
        ("AFRICA", 1.3), ("MIDDLE EAST", 1.2)).toDF("r_name", "weight")
      t(s, dir, "region")
        .join(broadcast(bands), Seq("r_name"), "left")
        .select($"r_regionkey", $"r_name", coalesce($"weight", lit(1.0)).as("weight"))
    }),

    // E10: typed-struct JSON roundtrip — to_json(struct)/from_json(schema)
    // (helpers.py:326 json_normalize → from_json + select("a.*"))
    "e10_json_roundtrip" -> ((s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(
        StructField("key", LongType), StructField("status", StringType)))
      t(s, dir, "orders")
        .withColumn("j", to_json(struct($"o_orderkey".as("key"), $"o_orderstatus".as("status"))))
        .withColumn("parsed", from_json($"j", schema))
        .select($"o_orderkey", $"parsed.key".as("rt_key"), $"parsed.status".as("rt_status"))
    }),

    // E14: Spark 4 VARIANT semi-structured path — parse_json into the
    // shredded binary VariantType ONCE, then typed variant_get path
    // extraction (incl. a nested path), versus e8's get_json_object which
    // re-parses the JSON string per path. The contract pinned by the
    // oracle: the construct → parse → typed-extract → aggregate loop
    // reproduces the source values exactly (DuckDB computes the same
    // aggregate straight from the columns), and probing a NONEXISTENT
    // path with try_variant_get yields NULL, never an error or value
    // (missing_path_ok, oracle `true`).
    "e14_variant_json" -> ((s, dir) => {
      import s.implicits._
      val parsed = t(s, dir, "orders")
        .withColumn("j", to_json(struct($"o_custkey".as("cust"),
          $"o_totalprice".as("price"),
          struct($"o_orderpriority".as("prio"),
            $"o_orderdate".cast("string").as("d")).as("meta"))))
        .select(parse_json($"j").as("v"))
      parsed.select(
          expr("variant_get(v, '$.meta.prio', 'string')").as("prio"),
          expr("variant_get(v, '$.cust', 'bigint')").as("cust"),
          expr("variant_get(v, '$.price', 'double')").as("price"),
          expr("variant_get(v, '$.meta.d', 'string')").as("d"),
          expr("try_variant_get(v, '$.nope.deep', 'string')").as("missing"))
        .groupBy($"prio")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct($"cust").as("n_custs"),
          // exact decimal-sum mean (skew-sf10 j2 lesson): a multi-million-
          // row double avg's summation-order ulps can land the mean on a
          // round(4) boundary; sum(DECIMAL)/count is engine-identical
          round(sum($"price".cast("decimal(18,2)")).cast("double") /
            count($"price"), 4).as("avg_price"),
          min($"d").as("min_date"),
          (count($"missing") === 0L).as("missing_path_ok"))
    }),

    // E12: array higher-order functions — collect + sort + lambda filter /
    // transform / fold per group. Everything after the collect_list is
    // map-side codegen'd array arithmetic; the fold walks the SORTED array
    // so float accumulation order is deterministic cross-engine.
    "e12_array_ops" -> ((s, dir) => {
      import s.implicits._
      // observed values only: Spark's collect_list DROPS null elements while
      // DuckDB's list() KEEPS them, so the null filter must be explicit on
      // both sides — and an order whose every quantity is null produces no
      // row at all (element_at(…, 1) on the empty array throws; surfaced by
      // the round-12 null-corpus campaign)
      t(s, dir, "lineitem")
        .filter($"l_quantity".isNotNull)
        .groupBy($"l_orderkey")
        .agg(sort_array(collect_list($"l_quantity")).as("qtys"))
        .select($"l_orderkey",
          size($"qtys").cast("long").as("n_items"),
          size(filter($"qtys", q => q > 25)).cast("long").as("n_big"),
          round(aggregate($"qtys", lit(0.0), (acc, q) => acc + q), 4).as("total_qty"),
          round(aggregate(transform($"qtys", q => q * q), lit(0.0),
            (acc, q) => acc + q), 4).as("total_sq"),
          element_at($"qtys", 1).as("min_qty"),
          element_at($"qtys", -1).as("max_qty"))
    }),

    // A5: aggregate-to-model — not-a-knot cubic spline per group, evaluated on
    // a fixed grid (protocol_data_warehouse.py:537-564). Knots: avg value
    // per quantity bucket; eval at midpoints. HASH-GATED (round 9, the
    // a13/a20 pattern — the model fit itself is not SQL-expressible):
    // payload = the deterministic knot table (x, round-6 y — DuckDB
    // recomputes it as a plain group-avg), verdicts = at_knot_ok (the
    // fitted spline INTERPOLATES its knots: max |spline(x_i) − y_i| ≤
    // 1e-6 — an interpolating-spline identity, measured exactly 0.0; any
    // solver/eval regression breaks it) and finite_on_grid (every grid
    // eval is a finite double). The grid evaluation stays in-plan — the
    // verdicts are functions of it.
    "a5_spline_eval" -> ((s, dir) => {
      import s.implicits._
      // an observation with no x cannot be a knot (null-corpus campaign:
      // a null quantity group made xs carry null and killed the solver)
      val knots = t(s, dir, "lineitem")
        .filter($"l_quantity".isNotNull)
        .groupBy($"l_returnflag", $"l_quantity".cast("int").as("x"))
        .agg(avg($"l_extendedprice").as("y"))
        .groupBy($"l_returnflag")
        .agg(sort_array(collect_list(struct($"x".cast("double").as("x"), $"y"))).as("pts"))
        .select($"l_returnflag",
          $"pts.x".as("xs"), $"pts.y".as("ys"),
          transform(sequence(lit(5), lit(45), lit(5)), i => i.cast("double") + 0.5).as("qs"))
      knots
        .withColumn("atKnots", Interp.splineUdf($"xs", $"ys", $"xs"))
        .withColumn("fitted", Interp.splineUdf($"xs", $"ys", $"qs"))
        .withColumn("maxResid",
          aggregate(zip_with($"ys", $"atKnots", (a, b) => abs(a - b)),
            lit(0.0), (acc, r) => greatest(acc, r)))
        .withColumn("gridFinite",
          forall($"fitted", v => !isnan(v) && abs(v) < lit(Double.MaxValue)))
        .select($"l_returnflag", explode(arrays_zip($"xs", $"ys")).as("z"),
          $"maxResid", $"gridFinite")
        .select($"l_returnflag", $"z.xs".as("x"), round($"z.ys", 6).as("y"),
          ($"maxResid" <= 1e-6).as("at_knot_ok"), $"gridFinite".as("finite_on_grid"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "a5_spline_eval" ->
      """SELECT l_returnflag,
                CAST(CAST(l_quantity AS INT) AS DOUBLE) AS x,
                round(avg(l_extendedprice), 6) AS y,
                true AS at_knot_ok, true AS finite_on_grid
         FROM lineitem
         WHERE l_quantity IS NOT NULL
         GROUP BY l_returnflag, CAST(l_quantity AS INT)""",
    "p1_project_filter_isin" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_discount
         FROM lineitem WHERE l_discount > 0.05 AND l_returnflag IN ('A','R')""",
    "p2_rename_drop" ->
      """SELECT n_nationkey, n_name AS nation_name, n_regionkey FROM nation""",
    "p5_expr_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
         WHERE l_quantity > 45 AND l_discount <= 0.02""",
    "p9_range_inlist" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
         WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
           AND o_orderpriority IN ('1-URGENT', '2-HIGH')""",
    "e9_inline_table" ->
      """SELECT r_regionkey, r_name, coalesce(b.weight, 1.0) AS weight
         FROM region
         LEFT JOIN (VALUES ('AMERICA', 1.1), ('ASIA', 1.25), ('EUROPE', 1.0),
                           ('AFRICA', 1.3), ('MIDDLE EAST', 1.2)) b(r_name, weight)
         USING (r_name)""",
    "p7_null_handling" ->
      """SELECT c_custkey,
         CASE WHEN c_acctbal >= 0 THEN c_acctbal ELSE -1.0 END AS pos_bal,
         (CASE WHEN c_acctbal >= 0 THEN c_acctbal ELSE -1.0 END) = -1.0 AS is_missing
         FROM customer""",
    "p8_conditional_overwrite" ->
      """SELECT n_nationkey,
         CASE WHEN n_nationkey = 0 THEN 'PATCHED_NATION' ELSE n_name END AS n_name,
         n_regionkey FROM nation""",
    "p10_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""",
    "j2_composite_key_join" ->
      """SELECT e.event_id, e.user_id, e.event_type, e.value, d.avg_value
         FROM events e
         JOIN (SELECT user_id, event_type,
                      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                        / count(value) AS avg_value
               FROM events GROUP BY user_id, event_type) d
         USING (user_id, event_type)
         WHERE e.value > d.avg_value * 2""",
    "j3_positional_join" ->
      """WITH o AS (SELECT o_orderkey, o_totalprice,
                    row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS pos
                    FROM orders QUALIFY pos <= 50),
             c AS (SELECT c_custkey, c_acctbal,
                    row_number() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS pos
                    FROM customer QUALIFY pos <= 50)
         SELECT pos, o_orderkey, o_totalprice, c_custkey, c_acctbal
         FROM o JOIN c USING (pos)""",
    "j4_cross_join" ->
      """SELECT n_nationkey, n_name, r_regionkey, r_name FROM nation CROSS JOIN region""",
    "j6_join_derived_subquery" ->
      """SELECT c_custkey, coalesce(f.finished_spend, 0) AS finished_spend
         FROM customer
         LEFT JOIN (SELECT o_custkey,
                           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                                AS DOUBLE) AS finished_spend
                    FROM orders WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
         ON c_custkey = f.o_custkey""",
    "j7_coalesce_multi_join" ->
      """SELECT n_nationkey, n_name,
         round(coalesce(ca.cust_avg, sa.supp_avg, 0), 4) AS resolved_balance
         FROM nation
         LEFT JOIN (SELECT CAST(c_nationkey AS BIGINT) AS nk,
                           round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                 / count(c_acctbal), 4) AS cust_avg
                    FROM customer WHERE c_acctbal > 5000 GROUP BY 1) ca ON n_nationkey = ca.nk
         LEFT JOIN (SELECT CAST(s_nationkey AS BIGINT) AS nk,
                           round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                 / count(s_acctbal), 4) AS supp_avg
                    FROM supplier GROUP BY 1) sa ON n_nationkey = sa.nk""",
    "j10_asof_join" ->
      """SELECT c.event_id, c.user_id, round(p.value, 4) AS last_purchase_value
         FROM (SELECT event_id, user_id FROM events WHERE event_type = 'click') c
         ASOF LEFT JOIN
              (SELECT user_id, event_id AS p_event_id, value FROM events
               WHERE event_type = 'purchase') p
         ON c.user_id = p.user_id AND c.event_id >= p.p_event_id""",
    "j14_asof_forward" ->
      """SELECT c.event_id, c.user_id, round(p.value, 4) AS next_purchase_value
         FROM (SELECT event_id, user_id FROM events WHERE event_type = 'click') c
         ASOF LEFT JOIN
              (SELECT user_id, event_id AS p_event_id, value FROM events
               WHERE event_type = 'purchase') p
         ON c.user_id = p.user_id AND c.event_id <= p.p_event_id""",
    "j10_range_join" ->
      """SELECT p.user_id, p.event_id, i.session_start
         FROM (SELECT user_id, event_id FROM events WHERE event_type = 'error') p
         JOIN (SELECT user_id, event_id AS session_start, event_id + 2000 AS session_end
               FROM events WHERE event_type = 'signup') i
         ON p.user_id = i.user_id
          AND p.event_id >= i.session_start AND p.event_id < i.session_end""",
    "a4_collect_list" ->
      """SELECT o_custkey,
         array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys,
         count(*) AS n
         FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey""",
    "a6_global_minmax" ->
      """SELECT max(l_shipdate) AS max_shipdate, min(l_shipdate) AS min_shipdate,
         round(max(l_extendedprice),4) AS max_price, count(*) AS n_rows
         FROM lineitem""",
    "a9_sum_all_numerics" ->
      """SELECT l_returnflag,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_l_quantity,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_l_extendedprice,
         CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_l_discount,
         CAST(sum(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS sum_l_tax
         FROM lineitem GROUP BY l_returnflag""",
    "w4_range_ffill" ->
      """SELECT event_id, user_id,
         last_value(CASE WHEN event_type='signup' THEN value END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY event_id
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ref_rate
         FROM events""",
    "w5_monotonic_filter" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  lag(o_totalprice) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey) AS prev_price
           FROM orders)
         WHERE prev_price IS NULL OR o_totalprice >= prev_price""",
    "w7_resample_gapfill" ->
      """WITH base AS (
           SELECT user_id, date_trunc('day', ts)::TIMESTAMP AS day,
                  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6)
                    AS day_value
           FROM events GROUP BY 1, 2),
         b AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM base GROUP BY 1),
         spine AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b),
         j AS (SELECT s.user_id, s.day, base.day_value
               FROM spine s LEFT JOIN base ON s.user_id = base.user_id AND s.day = base.day)
         SELECT user_id, strftime(day, '%Y-%m-%d') AS day,
                last_value(day_value IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS day_value
         FROM j""",
    "o1_topk_sorted" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""",
    "e1_datetime_ops" ->
      """SELECT o_orderkey,
         strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS order_month,
         strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS due_date,
         strftime(CAST(CAST(o_orderdate AS DATE) - INTERVAL 6 MONTH AS DATE), '%Y-%m-%d') AS six_months_back,
         datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_eoy,
         CAST(year(o_orderdate) AS BIGINT) AS order_year,
         CAST(month(o_orderdate) AS BIGINT) AS order_month_num,
         CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
         FROM orders""",
    "e2_string_ops" ->
      """SELECT p_partkey,
         p_brand || '|' || p_type AS brand_type,
         substring(p_name, 1, 8) AS name_prefix,
         right(p_type, 4) AS type_suffix,
         lower(p_name) AS name_lower,
         upper(p_brand) AS brand_upper,
         regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
         starts_with(p_name, 'a') AS starts_a,
         CAST(length(p_name) AS BIGINT) AS name_len
         FROM part""",
    "e3_math_conditional" ->
      """SELECT l_orderkey, l_linenumber,
         round(pow(1 + l_discount/365.0, 365.0) - 1, 8) AS apy,
         floor((CASE WHEN l_quantity <> 0 THEN l_extendedprice/l_quantity ELSE 0 END) * 1e4 + 0.5) / 1e4 AS unit_price,
         round(greatest(least(l_quantity, 40.0) - 10.0, 0.0), 4) AS clamped,
         CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 30 THEN 'mid'
              ELSE 'high' END AS qty_band,
         round(1.0 - (1.0 - l_discount) * (1.0 + l_tax), 6) AS price_impact
         FROM lineitem""",
    "e4_unpivot" ->
      """SELECT l_orderkey, l_linenumber, measure, value FROM (
           SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
           UNION ALL
           SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)""",
    "e5_pivot_multi_agg" ->
      """SELECT user_id,
         round(CAST(sum(CASE WHEN event_type='click'
           THEN CAST(coalesce(value,0) AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE),4) AS click_total,
         count(CASE WHEN event_type='click' THEN 1 END) AS click_n,
         round(CAST(sum(CASE WHEN event_type='purchase'
           THEN CAST(coalesce(value,0) AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE),4) AS purchase_total,
         count(CASE WHEN event_type='purchase' THEN 1 END) AS purchase_n,
         round(CAST(sum(CASE WHEN event_type='view'
           THEN CAST(coalesce(value,0) AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE),4) AS view_total,
         count(CASE WHEN event_type='view' THEN 1 END) AS view_n
         FROM events GROUP BY user_id""",
    "e6_explode_grid" ->
      """SELECT r_regionkey, r_name, CAST(exp AS BIGINT) AS exp, pow(10.0, exp) AS amount
         FROM region CROSS JOIN (SELECT unnest(generate_series(3, 9)) AS exp)""",
    "e7_abi_decode" ->
      """SELECT o_orderkey,
         '0x' || lpad(lower(to_hex(o_orderkey)), 64, '0') AS blob,
         CAST(o_orderkey AS DOUBLE) AS decoded_uint,
         '0x' || right(lpad(lower(to_hex(o_orderkey)), 64, '0'), 40) AS decoded_address
         FROM orders WHERE o_orderkey < 2000""",
    "e8_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events""",
    "e10_json_roundtrip" ->
      """SELECT o_orderkey, o_orderkey AS rt_key, o_orderstatus AS rt_status FROM orders""",
    "e14_variant_json" ->
      """SELECT o_orderpriority AS prio,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custs,
                round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                      / count(o_totalprice), 4) AS avg_price,
                min(CAST(o_orderdate AS VARCHAR)) AS min_date,
                true AS missing_path_ok
         FROM orders GROUP BY o_orderpriority""",
    "p11_column_profile" ->
      """SELECT 'l_quantity' AS "column", count(*) AS n_rows,
                count(*) - count(l_quantity) AS n_nulls,
                round(min(l_quantity), 4) AS min_v, round(max(l_quantity), 4) AS max_v,
                round(avg(l_quantity), 4) AS mean_v
         FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice', count(*), count(*) - count(l_extendedprice),
                round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
                round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                      / count(l_extendedprice), 4)
         FROM lineitem
         UNION ALL
         SELECT 'l_discount', count(*), count(*) - count(l_discount),
                round(min(l_discount), 4), round(max(l_discount), 4),
                round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
                      / count(l_discount), 4)
         FROM lineitem""",
    "e12_array_ops" ->
      """WITH g AS (
           SELECT l_orderkey, list_sort(list(l_quantity)) AS qtys
           FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY l_orderkey)
         SELECT l_orderkey,
                CAST(len(qtys) AS BIGINT) AS n_items,
                CAST(len(list_filter(qtys, q -> q > 25)) AS BIGINT) AS n_big,
                round(list_sum(qtys), 4) AS total_qty,
                round(list_sum(list_transform(qtys, q -> q * q)), 4) AS total_sq,
                qtys[1] AS min_qty,
                qtys[-1] AS max_qty
         FROM g"""
  )
}
