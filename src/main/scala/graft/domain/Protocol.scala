package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Finance, Interp}
import graft.operators.Relational

/** Protocol-side warehouse + datamart ports: market state/config marts,
  * token price resolution, reserve-factor income, the safety-module
  * shortfall simulation, and streaming-payments summaries.
  */
object Protocol {

  private val SecondsPerYear = 60L * 60 * 24 * 365

  /** Port of `token_prices_by_day` (data_warehouse.py:500-524): multiple
    * markets can price the same (chain, reserve, symbol, day); keep the one
    * whose market has the lowest configured price_rank.
    *
    * The reference aggregates min(rank) then self-joins; here a single
    * window min on the group key does it in one shuffle (SURVEY §2.4 J8).
    */
  def tokenPricesByDay(prices: DataFrame, marketChainRank: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("chain"), col("reserve"), col("symbol"), col("block_day"))
    prices
      .join(broadcast(marketChainRank), Seq("market"), "left")
      .withColumn("__min_rank", min(col("price_rank")).over(w))
      .filter(col("price_rank") === col("__min_rank"))
      .select(col("block_day"), col("chain"), col("reserve"), col("symbol"),
        col("usd_price"), col("pricing_source"))
      .distinct()
  }

  private def withApys(df: DataFrame): DataFrame = {
    val n = lit(SecondsPerYear.toDouble)
    df
      .withColumn("deposit_apy", Finance.apyCompounded(col("liquidity_rate"), n))
      .withColumn("variable_borrow_apy", Finance.apyCompounded(col("variable_borrow_rate"), n))
      .withColumn("stable_borrow_apy", Finance.apyCompounded(col("stable_borrow_rate"), n))
      .withColumn("av_stable_borrow_apy", Finance.apyCompounded(col("average_stable_rate"), n))
  }

  /** Port of `market_state_by_hour.sql` / `market_state_by_day.sql`: pass
    * through the reserve state snapshot and derive the four APY columns
    * from per-second rates (docs.aave.com compounding formula,
    * market_state_by_hour.sql:21-24). `timeCol` is block_hour or block_day.
    */
  def marketState(protocolData: DataFrame, timeCol: String): DataFrame =
    withApys(protocolData.withColumnRenamed("symbol", "atoken_symbol"))

  /** Port of `market_config_by_hour.sql`: config snapshot per hour with the
    * daily emode config carried onto hourly rows by a forward-fill window
    * (`last_value ignore nulls`, ROWS frame — SURVEY §7.4(5)). */
  def marketConfigByHour(protocolData: DataFrame, emodeConfig: DataFrame): DataFrame = {
    val emode = emodeConfig.select(
      col("block_day").as("e_day"), col("market").as("e_market"),
      col("reserve_emode_category").as("e_cat"),
      col("emode_category_name"), col("emode_ltv"),
      col("emode_liquidation_bonus"), col("emode_liquidation_threshold"))
    val joined = protocolData
      .withColumn("block_day", date_trunc("day", col("block_hour")))
      .join(broadcast(emode),
        date_trunc("day", col("block_hour")) === col("e_day") &&
          col("market") === col("e_market") &&
          col("reserve_emode_category") === col("e_cat"), "left")
      .drop("e_day", "e_market", "e_cat")
      .withColumnRenamed("symbol", "atoken_symbol")
    Relational.ffill(joined,
      partitionCols = Seq("market", "atoken_symbol"),
      orderCols = Seq("block_hour"),
      fillCols = Seq("emode_category_name", "emode_ltv",
        "emode_liquidation_bonus", "emode_liquidation_threshold"))
  }

  /** Port of `market_state_by_time.sql`: union the hourly and daily grains
    * into one time axis, dedup exact overlaps, attach chain/reserve dims
    * and day-grain USD prices. */
  def marketStateByTime(stateByHour: DataFrame, stateByDay: DataFrame,
                        chainsMarkets: DataFrame, atokens: DataFrame,
                        oraclePrices: DataFrame): DataFrame = {
    val hourly = stateByHour.withColumnRenamed("block_hour", "block_time")
    val daily = stateByDay.withColumnRenamed("block_day", "block_time")
    val unioned = hourly.unionByName(daily, allowMissingColumns = true).distinct()
    val cm = broadcast(chainsMarkets
      .select(col("market").as("c_market"), col("chain"), col("display_chain"),
        col("display_market")))
    val at = broadcast(atokens
      .select(col("market").as("a_market"), col("reserve").as("a_reserve"),
        col("reserve_symbol")))
    val p = oraclePrices.select(col("market").as("p_market"),
      col("reserve").as("p_reserve"), col("block_day").as("p_day"), col("usd_price"))
    unioned
      .join(cm, col("market") === col("c_market"), "left").drop("c_market")
      .join(at, col("market") === col("a_market") &&
        col("reserve") === col("a_reserve"), "left").drop("a_market", "a_reserve")
      .join(p, date_trunc("day", col("block_time")) === col("p_day") &&
        col("reserve") === col("p_reserve") && col("market") === col("p_market"), "left")
      .drop("p_market", "p_reserve", "p_day")
      .withColumn("deposits_usd", col("atoken_supply") * col("usd_price"))
      .withColumn("stable_debt_usd", col("stable_debt") * col("usd_price"))
      .withColumn("variable_debt_usd", col("variable_debt") * col("usd_price"))
  }

  /** Port of `reserve_factor_income_by_day.sql`: daily protocol income from
    * borrow interest × reserve factor. */
  def reserveFactorIncomeByDay(configByDay: DataFrame, stateByDay: DataFrame,
                               chainsMarkets: DataFrame, oraclePrices: DataFrame): DataFrame = {
    val state = stateByDay.select(
      col("block_day").as("s_day"), col("market").as("s_market"),
      col("atoken_symbol").as("s_symbol"),
      col("variable_borrow_rate"), col("variable_debt"),
      col("stable_borrow_rate"), col("stable_debt"))
    val cm = broadcast(chainsMarkets
      .select(col("market").as("c_market"), col("chain"), col("display_chain"),
        col("display_market")))
    val p = oraclePrices.select(col("market").as("p_market"),
      col("reserve").as("p_reserve"), col("block_day").as("p_day"), col("usd_price"))
    configByDay
      .join(state, col("block_day") === col("s_day") &&
        col("market") === col("s_market") &&
        col("atoken_symbol") === col("s_symbol"), "inner")
      .drop("s_day", "s_market", "s_symbol")
      .join(cm, col("market") === col("c_market"), "left").drop("c_market")
      .join(p, col("market") === col("p_market") && col("reserve") === col("p_reserve") &&
        col("block_day") === col("p_day"), "left")
      .drop("p_market", "p_reserve", "p_day")
      .withColumn("variable_debt_protocol_income",
        col("variable_debt") * col("variable_borrow_rate") / 365 * col("reserve_factor"))
      .withColumn("stable_debt_protocol_income",
        col("stable_debt") * col("stable_borrow_rate") / 365 * col("reserve_factor"))
      .withColumn("total_income_usd",
        (col("variable_debt_protocol_income") + col("stable_debt_protocol_income")) *
          col("usd_price"))
  }

  /** Port of `shortfall_simulation` (protocol_data_warehouse.py:484-571):
    * the one aggregate-to-model asset. Per day:
    *   1. dedup the append-only liquidity-depth feed to its first fetch
    *      (min fetch_time per day — the K2 append-sink's downstream half);
    *   2. keep only rows where the implied to-amount is monotonically
    *      increasing (lag + diff filter);
    *   3. fit not-a-knot cubic splines (from→to, to→from, from→impact) on the
    *      collected curve;
    *   4. cross-join a bad-debt sweep grid and evaluate the splines.
    *
    * Spline fitting runs on `collect_list`-per-day arrays — group sizes are
    * bounded by the sweep grid (~100 points) regardless of corpus size, so
    * this stays distributed-safe at any scale (SURVEY §7.4(7)).
    */
  def shortfallSimulation(liquidityDepth: DataFrame, smStakedValue: DataFrame,
                          badDebtGrid: Seq[Double] =
                            (1 to 99).map(_ * 1e6) ++ (1 to 5).map(_ * 1e8)): DataFrame = {
    val spark = liquidityDepth.sparkSession
    import spark.implicits._

    val smTotals = smStakedValue
      .groupBy(col("block_day"))
      .agg(sum(col("staked_value_usd")).as("staked_value_usd"))
      .withColumn("sm_coverage", col("staked_value_usd") * 0.3)

    // 1. first-fetch dedup (protocol_data_warehouse.py:514-518)
    val byDay = liquidityDepth.withColumn("block_day", date_trunc("day", col("fetch_time")))
    val wDay = Window.partitionBy(col("block_day"))
    val firstFetch = byDay
      .withColumn("__min_fetch", min(col("fetch_time")).over(wDay))
      .filter(col("fetch_time") === col("__min_fetch"))
      .select(col("block_day"), col("from_amount_usd"), col("to_amount_usd"),
        col("price_impact"))
      .withColumn("to_amount_aaveweth",
        col("from_amount_usd") * (lit(1.0) - col("price_impact")) * 0.9 +
          col("from_amount_usd") * 0.1)

    // 2. monotonic filter (protocol_data_warehouse.py:529-534)
    val wCurve = Window.partitionBy(col("block_day")).orderBy(col("from_amount_usd"))
    val monotonic = firstFetch
      .withColumn("__prev", coalesce(lag(col("to_amount_aaveweth"), 1).over(wCurve), lit(0.0)))
      .filter(col("to_amount_aaveweth") - col("__prev") >= 0)
      .drop("__prev")

    // 3. collect the curve per day (sorted by x), fit splines lazily at eval
    val curves = monotonic
      .groupBy(col("block_day"))
      .agg(sort_array(collect_list(struct(
        col("from_amount_usd"), col("to_amount_aaveweth"), col("price_impact")))).as("pts"))
      .select(col("block_day"),
        col("pts.from_amount_usd").as("xs_from"),
        col("pts.to_amount_aaveweth").as("ys_to"),
        col("pts.price_impact").as("ys_impact"))

    // 4. sweep grid cross join + spline evaluation
    val grid = badDebtGrid.toDF("bad_debt")
    val evalOne = udf((xs: Seq[Double], ys: Seq[Double], q: Double) =>
      Interp.splineEval(xs.toArray, ys.toArray, Array(q))(0))

    curves
      .join(smTotals, Seq("block_day"), "left")
      .withColumn("max_cap", evalOne(col("xs_from"), col("ys_to"), col("sm_coverage")))
      .crossJoin(broadcast(grid))
      .withColumn("naive_sales", evalOne(col("xs_from"), col("ys_to"), col("bad_debt")))
      .withColumn("sale_required_for_bad_debt",
        evalOne(col("ys_to"), col("xs_from"), col("bad_debt")))
      .withColumn("aave_sold_usd", col("bad_debt") * 0.9)
      .withColumn("aave_price_impact",
        evalOne(col("xs_from"), col("ys_impact"), col("aave_sold_usd")))
      .withColumn("overhang",
        when(col("bad_debt") < col("max_cap"), lit(0.0))
          .otherwise(col("bad_debt") - col("max_cap")))
      .select(col("block_day"), col("staked_value_usd"), col("sm_coverage"),
        col("max_cap"), col("bad_debt"), col("naive_sales"),
        col("sale_required_for_bad_debt"), col("aave_sold_usd"),
        col("aave_price_impact"), col("overhang"))
  }

  /** Port of `streaming_payments_detail.sql`: vesting-stream metadata
    * joined to on-chain stream state (deposit/vested/unvested/claims from
    * the lake's vesting arithmetic — `Finance.vestedAmount`), priced at the
    * latest day with an atoken→reserve fallback (coalesce over two left
    * joins). Missing streams coalesce to zeros/epoch like the reference. */
  def streamingPaymentsDetail(streamsMetadata: DataFrame, paymentsState: DataFrame,
                              tokenPrices: DataFrame, atokens: DataFrame): DataFrame = {
    val latestPrices = Relational.latestOnly(
      tokenPrices.filter(col("chain") === "ethereum"), "block_day")
    val atokenPrices = broadcast(latestPrices.as("p")
      .join(atokens.filter(col("chain") === "ethereum")
        .select(col("atoken"), col("reserve").as("a_reserve")).as("a"),
        col("p.reserve") === col("a.a_reserve"), "inner")
      .select(col("atoken").as("pa_token"), col("usd_price").as("pa_price"))
      .distinct())
    val reservePrices = broadcast(latestPrices
      .select(col("reserve").as("pr_token"), col("usd_price").as("pr_price"))
      .distinct())
    val state = paymentsState.select(
      col("contract_address").as("s_contract"), col("token_address").as("s_token"),
      col("stream_id").as("s_stream_id"), col("deposit_day"), col("start_time"),
      col("stop_time"), col("deposit"), col("vested"), col("unvested"),
      col("claims"), col("unclaimed"))
    val epoch = lit("1970-01-01").cast("timestamp")
    streamsMetadata
      .join(state, col("stream_contract") === col("s_contract") &&
        col("token") === col("s_token") && col("stream_id") === col("s_stream_id"), "left")
      .join(atokenPrices, col("token") === col("pa_token"), "left")
      .join(reservePrices, col("token") === col("pr_token"), "left")
      .withColumn("usd_price", coalesce(col("pa_price"), col("pr_price")))
      .select(
        col("vendor_label"), col("stream_label"), col("proposal_id"),
        col("stream_contract"), col("token"), col("stream_id"), col("symbol"), col("term"),
        concat(lit("https://app.aave.com/governance/proposal/?proposalId="),
          col("proposal_id")).as("proposal_url"),
        coalesce(col("deposit_day"), epoch).as("stream_create_date"),
        coalesce(col("start_time"), epoch).as("stream_start_time"),
        coalesce(col("stop_time"), epoch).as("stream_stop_time"),
        coalesce(col("deposit"), lit(0.0)).as("total_payment_native"),
        coalesce(col("vested"), lit(0.0)).as("vested_native"),
        coalesce(col("unvested"), lit(0.0)).as("unvested_native"),
        coalesce(col("claims"), lit(0.0)).as("claimed_native"),
        coalesce(col("unclaimed"), lit(0.0)).as("unclaimed_native"),
        col("upfront_native"),
        (col("bonus_usd") / col("usd_price")).as("bonus_native"),
        col("usd_price"))
  }

  /** Port of `streaming_payments_summary.sql`'s PIVOT block: per-stream
    * rollup pivoted by symbol with five aggregations and deterministic
    * `<symbol>_<agg>` column names (SURVEY §7.4(4) naming fix). */
  def streamingPaymentsSummary(detail: DataFrame,
                               symbols: Seq[String] = Seq("AAVE", "aDAI", "aUSDC", "aUSDT")): DataFrame = {
    val keys = Seq("vendor_label", "stream_label", "term", "proposal_id",
      "proposal_url", "stream_create_date", "stream_start_time", "stream_stop_time")
    val rolled = detail.groupBy((keys :+ "symbol").map(col): _*)
      .agg(
        sum(col("total_payment_native")).as("stream_amount"),
        sum(col("unvested_native")).as("remaining_amount"),
        sum(col("upfront_native")).as("upfront_native"),
        sum(col("bonus_native")).as("bonus_native"),
        avg(col("usd_price")).as("usd_price"))
    val pivoted = Relational.pivotAgg(rolled, keys, "symbol", symbols,
      Seq(
        "stream_amount" -> sum(col("stream_amount")),
        "remaining_amount" -> sum(col("remaining_amount")),
        "upfront_native" -> sum(col("upfront_native")),
        "bonus_native" -> sum(col("bonus_native")),
        "usd_price" -> avg(col("usd_price"))))
    symbols.foldLeft(pivoted) { (d, s) =>
      d.na.fill(0.0, Seq(s"${s}_stream_amount", s"${s}_remaining_amount",
          s"${s}_upfront_native", s"${s}_bonus_native", s"${s}_usd_price"))
        .withColumn(s"${s}_total_contract_amount",
          col(s"${s}_stream_amount") + col(s"${s}_upfront_native") + col(s"${s}_bonus_native"))
    }
  }

  /** Port of `incentives_by_day` (protocol_data_warehouse.py:200-320):
    * per-reserve liquidity-mining rewards — emission scaled by reward
    * decimals and zeroed after the emission end date, split into supply/
    * variable/stable quadrants by token_type (the reference's 9-way
    * np.where row lambda becomes 9 conditional columns), APRs via guarded
    * division, then the 9-sum rollup per reserve × reward token (A2). */
  def incentivesByDay(rawIncentives: DataFrame, protocolData: DataFrame,
                      oraclePrices: DataFrame): DataFrame = {
    val SecondsInDay = 86400.0
    val emission = rawIncentives
      .withColumn("end_date", timestamp_seconds(col("emission_end_timestamp")))
      .withColumn("emission_per_day",
        when(col("block_day") > col("end_date"), lit(0.0)).otherwise(
          col("emission_per_second") * SecondsInDay /
            pow(lit(10.0), col("reward_token_decimals"))))
      .withColumn("emission_per_day_usd",
        col("emission_per_day") * col("reward_price_feed") /
          pow(lit(10.0), col("price_feed_decimals")))
      .withColumnRenamed("underlying_asset", "reserve")
      .filter(col("emission_per_day_usd") > 0)
    val pd = protocolData.select(col("block_day"), col("block_height"), col("market"),
      col("reserve"), col("atoken_supply"), col("stable_debt"), col("variable_debt"))
    val joined = emission
      .join(pd, Seq("block_day", "block_height", "market", "reserve"), "left")
      // The reference's keyless pandas merge (protocol_data_warehouse.py:
      // 247) would also include block_height, because ITS price frame
      // carries one; our canonical price feed (Schemas.oraclePrices) drops
      // the height — equivalent here since prices and protocol data are
      // snapshotted at the same per-partition height by construction, and
      // every SQL model joins prices on (day, market, reserve) only.
      .join(oraclePrices.select(col("block_day"), col("market"), col("reserve"),
        col("usd_price")), Seq("block_day", "market", "reserve"), "left")
    def quadrant(tt: String, value: org.apache.spark.sql.Column) =
      when(col("token_type") === tt, value).otherwise(lit(0.0))
    val apr = Relational.safeDiv(col("emission_per_day_usd"),
      col("atoken_supply") * col("usd_price")) * 365
    joined
      .withColumn("supply_rewards_apr", quadrant("atoken", apr))
      .withColumn("variable_borrow_rewards_apr", quadrant("vtoken", apr))
      .withColumn("stable_borrow_rewards_apr", quadrant("stoken", apr))
      .withColumn("supply_rewards", quadrant("atoken", col("emission_per_day")))
      .withColumn("variable_debt_rewards", quadrant("vtoken", col("emission_per_day")))
      .withColumn("stable_debt_rewards", quadrant("stoken", col("emission_per_day")))
      .withColumn("supply_rewards_usd", quadrant("atoken", col("emission_per_day_usd")))
      .withColumn("variable_debt_rewards_usd", quadrant("vtoken", col("emission_per_day_usd")))
      .withColumn("stable_debt_rewards_usd", quadrant("stoken", col("emission_per_day_usd")))
      .groupBy(col("block_day"), col("block_height"), col("market"), col("reserve"),
        col("symbol"), col("reward_token_symbol"), col("reward_token_address"))
      .agg(
        sum(col("supply_rewards_apr")).as("supply_rewards_apr"),
        sum(col("variable_borrow_rewards_apr")).as("variable_borrow_rewards_apr"),
        sum(col("stable_borrow_rewards_apr")).as("stable_borrow_rewards_apr"),
        sum(col("supply_rewards")).as("supply_rewards"),
        sum(col("variable_debt_rewards")).as("variable_debt_rewards"),
        sum(col("stable_debt_rewards")).as("stable_debt_rewards"),
        sum(col("supply_rewards_usd")).as("supply_rewards_usd"),
        sum(col("variable_debt_rewards_usd")).as("variable_debt_rewards_usd"),
        sum(col("stable_debt_rewards_usd")).as("stable_debt_rewards_usd"))
  }

  /** Port of `liquidity_depth` (protocol_data_warehouse.py:332-425): the
    * raw quote-sweep feed densified by piecewise-linear interpolation at a
    * fixed grid of target price impacts (default 1%..5% step 0.25%, the
    * reference's range arithmetic at :363-366) and unioned back onto the
    * raw rows, tagged `is_interpolated`.
    *
    * Shape: one groupBy per (market_key, to_asset, from_asset,
    * fetch_time) sweep collecting the knot arrays — each group is one
    * quote sweep (~tens of points), so the collected arrays are bounded
    * regardless of corpus size and the interpolation is the codegen'd
    * [[graft.functions.Interp.linearInterp]] (np.interp semantics,
    * clamped ends), evaluated map-side. Group-constant metadata columns
    * ride the same aggregate as first() — replacing the reference's
    * positional ffill (:408-410), which relies on exactly that
    * within-group constancy after its global sort. Native amounts are
    * recalculated from the USD amounts and asset prices for ALL rows
    * (:413-415).
    */
  def liquidityDepth(raw: DataFrame,
                     startImpact: Double = 0.01, endImpact: Double = 0.05,
                     incrementImpact: Double = 0.0025): DataFrame = {
    val keys = Seq("market_key", "to_asset", "from_asset", "fetch_time")
    val valueCols = Set("from_amount_usd", "price_impact", "to_amount_usd",
      "from_amount_native", "to_amount_native")
    val metaCols = raw.columns.filterNot(c => keys.contains(c) || valueCols.contains(c))
    val targets = {
      val s = math.round(startImpact * 10000).toInt
      val e = math.round(endImpact * 10000).toInt
      val inc = math.round(incrementImpact * 10000).toInt
      (s to e by inc).map(_ / 10000.0)
    }
    val qs = array(targets.map(lit): _*)
    // sort_array on struct(price_impact, from_amount_usd) gives the
    // ascending-xp knot order np.interp requires (the raw sweep is already
    // monotone in impact, so this is a guard, not a reorder)
    val aggs = sort_array(collect_list(struct(col("price_impact"), col("from_amount_usd"))))
      .as("__pts") +: metaCols.map(c => first(col(c)).as(c))
    val interped = raw.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
      .withColumn("__fa", Interp.linearInterp(qs,
        col("__pts.price_impact"), col("__pts.from_amount_usd")))
      .select((keys ++ metaCols).map(col) :+ col("__fa") :+
        posexplode(qs).as(Seq("__i", "price_impact")): _*)
      .withColumn("from_amount_usd", element_at(col("__fa"), col("__i") + 1))
      .withColumn("to_amount_usd",
        (lit(1.0) - col("price_impact")) * col("from_amount_usd"))
      .withColumn("is_interpolated", lit(true))
      .drop("__fa", "__i")
    raw.withColumn("is_interpolated", lit(false))
      .unionByName(interped, allowMissingColumns = true)
      .withColumn("from_amount_native",
        col("from_amount_usd") / col("from_asset_price"))
      .withColumn("to_amount_native",
        col("to_amount_usd") / col("to_asset_price"))
  }

  /** Port of `inv_defi_ref_stable_rate_base.sql`: cross-protocol stablecoin
    * deposit comparison — Aave + Compound v2/v3 day/hour grains unioned and
    * averaged to daily, priced, lead-paired for price change, per-day
    * earnings. `sources` is any number of (block_time, market, symbol,
    * deposits_native, deposit_apy) feeds (the reference unions 5). */
  def defiRefStableRateBase(sources: Seq[DataFrame], prices: DataFrame,
                            stableSymbols: Seq[String] = Seq("USDT", "USDC", "DAI")): DataFrame = {
    val combined = sources
      .map(_.select(col("block_time"), col("market"), col("symbol"),
        col("deposits_native"), col("deposit_apy")))
      .reduce(_.unionByName(_))
      .filter(col("symbol").isin(stableSymbols: _*))
      .groupBy(date_trunc("day", col("block_time")).as("block_day"),
        col("market"), col("symbol"))
      .agg(avg(col("deposits_native")).as("deposits_native"),
        avg(col("deposit_apy")).as("deposit_apy"))
    val p = broadcast(prices.select(col("block_day").as("p_day"),
      col("symbol").as("p_symbol"), col("usd_price").as("price_usd")))
    val w = Window.partitionBy(col("market"), col("symbol")).orderBy(col("block_day"))
    combined
      .join(p, col("block_day") === col("p_day") && col("symbol") === col("p_symbol"), "left")
      .drop("p_day", "p_symbol")
      .withColumn("end_price_usd",
        coalesce(lead(col("price_usd"), 1).over(w), col("price_usd")))
      .withColumn("deposits_usd", col("deposits_native") * col("price_usd"))
      .withColumn("earnings_native", col("deposits_native") * col("deposit_apy") / 365)
      .withColumn("earnings_usd", col("earnings_native") * col("price_usd"))
      .withColumn("price_change_usd",
        col("deposits_native") * (lit(1.0) + col("deposit_apy") / 365) *
          (col("end_price_usd") - col("price_usd")))
  }

  /** Port of `inv_defi_ref_rates_by_day.sql`: daily stable reference rate
    * (deposit-weighted yield across protocols) with the ETH staking rate
    * forward-filled over gaps (W4 RANGE-frame last_value ignore nulls). */
  def defiRefRatesByDay(stableRateBase: DataFrame, ethStakingRates: DataFrame): DataFrame = {
    val stables = stableRateBase
      .groupBy(col("block_day"))
      .agg(
        (sum(col("earnings_usd")) / sum(col("deposits_usd")) * 365)
          .as("stable_reference_rate_ex_price"),
        (sum(col("earnings_usd") + col("price_change_usd")) / sum(col("deposits_usd")) * 365)
          .as("stable_reference_rate"))
    val eth = ethStakingRates.select(col("partition_date").as("e_day"),
      col("apr").as("eth_rate_raw"))
    // Global (unpartitioned) window is safe HERE: the input is one row per
    // calendar day (a daily reference-rate table, thousands of rows over
    // the protocol's lifetime), bounded by the calendar — not by the corpus.
    val w = Window.partitionBy(
        graft.operators.Relational.onePartKey(col("block_day")))
      .orderBy(col("block_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stables
      .join(eth, col("block_day") === col("e_day"), "left").drop("e_day")
      .withColumn("eth_reference_rate",
        last(col("eth_rate_raw"), ignoreNulls = true).over(w))
      .drop("eth_rate_raw")
  }

  /** Port of `balancer_bpt_by_day.sql`: BPT pool snapshot with daily APR
    * from the rate ratio vs the previous day (SURVEY §2.6 W2 lag). */
  def balancerBptByDay(bpt: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("chain"), col("pool")).orderBy(col("block_day"))
    bpt
      .withColumnRenamed("denom", "bpt_underlying_asset")
      .withColumnRenamed("bpt_usd_price", "bpt_price_usd")
      .withColumn("daily_apr",
        (col("rate") / coalesce(lag(col("rate"), 1).over(w), col("rate")) - 1) * 365)
  }

  /** The safety-module coverage epochs (sm_covered_markets_tvl_by_day.sql:
    * 8-64). The reference hardcodes four UNION branches of market-list ×
    * date-range; encoded as one rule table (SURVEY §7.4(3)) — null bounds
    * are open-ended, both bounds inclusive. */
  val smCoverageEras: Seq[(String, Option[String], Option[String])] = Seq(
    ("ethereum_v1", None, None),
    ("ethereum_v2", None, None),
    ("aave_arc",    Some("2022-08-01"), None),
    ("avax_v2",     Some("2022-08-01"), None),
    ("polygon_v2",  Some("2022-08-01"), None),
    ("ethereum_v3", Some("2023-02-18"), None),
    ("polygon_v3",  Some("2023-03-16"), None))

  /** Port of `sm_covered_markets_tvl_by_day.sql`: TVL of the markets the
    * safety module covered on each day — the epoch logic is a broadcast
    * era-table range join instead of a 4-branch union re-scan. */
  def smCoveredMarketsTvlByDay(assetTvl: DataFrame,
                               eras: Seq[(String, Option[String], Option[String])] = smCoverageEras
                              ): DataFrame = {
    val spark = assetTvl.sparkSession
    import spark.implicits._
    val eraDf = broadcast(eras.toDF("era_market", "covered_from", "covered_to")
      .withColumn("covered_from", col("covered_from").cast("timestamp"))
      .withColumn("covered_to", col("covered_to").cast("timestamp")))
    assetTvl
      .join(eraDf, col("market") === col("era_market") &&
        (col("covered_from").isNull || col("block_day") >= col("covered_from")) &&
        (col("covered_to").isNull || col("block_day") <= col("covered_to")), "inner")
      .select(col("block_day"),
        concat(col("display_name"), lit(" "), col("display_chain")).as("aave_market"),
        col("tvl_usd"))
  }

  /** Port of `chains_markets.sql`: the (chain, market, display) dim. */
  def chainsMarkets(displayNames: DataFrame,
                    excludedDisplayNames: Seq[String] = Seq(
                      "Ecosystem Reserve", "Incentives Controller V2", "Paraswap Fee Claimer")
                   ): DataFrame =
    displayNames
      .filter(!col("display_name").isin(excludedDisplayNames: _*))
      .select(col("chain"), col("market"), col("display_chain"),
        col("display_name").as("display_market"))
      .distinct()

  /** Port of `safety_module_totals_by_day.sql`: staking totals with the
    * multi-candidate price resolution (coalesce over three left joins to
    * the price table + a coingecko fallback — SURVEY §2.4 J7), emission
    * APR, and the 0.3x shortfall-cover measures. */
  def safetyModuleTotalsByDay(smRpc: DataFrame, tokenPrices: DataFrame,
                              coingecko: DataFrame): DataFrame = {
    def priceAs(alias: String) = tokenPrices.select(
      col("block_day").as(s"${alias}_day"), col("reserve").as(s"${alias}_reserve"),
      col("usd_price").as(s"${alias}_price"))
    val cg = coingecko.select(col("block_day").as("cg_day"),
      col("address").as("cg_address"), col("price_usd").as("cg_price"))
    val resolvedPrice = coalesce(col("ps_price"), col("pu_price"), col("cg_price"))
    val stakedUsd = col("stk_token_supply") * resolvedPrice
    val emissionUsd = col("emission_per_day") * col("pr_price")
    smRpc
      .join(priceAs("pr"), col("block_day") === col("pr_day") &&
        col("reward_token_address") === col("pr_reserve"), "left")
      .join(priceAs("ps"), col("block_day") === col("ps_day") &&
        col("stk_token_address") === col("ps_reserve"), "left")
      .join(priceAs("pu"), col("block_day") === col("pu_day") &&
        col("unstaked_token_address") === col("pu_reserve"), "left")
      .join(cg, col("block_day") === col("cg_day") &&
        col("stk_token_address") === col("cg_address"), "left")
      .select(
        col("block_day"), col("stk_token_address"), col("stk_token_symbol"),
        resolvedPrice.as("stk_token_price"),
        col("stk_token_supply"), col("unstaked_token_supply"),
        (col("stk_token_supply") / col("unstaked_token_supply")).as("staked_proportion"),
        col("emission_per_day"), col("reward_token_address"), col("reward_token_symbol"),
        col("pr_price").as("reward_token_price"),
        stakedUsd.as("staked_amt_usd"),
        emissionUsd.as("emission_usd_per_day"),
        (emissionUsd * 365 / stakedUsd).as("emission_apr"),
        (stakedUsd * 0.3).as("safety_module_cover"),
        (emissionUsd * 365 / (stakedUsd * 0.3)).as("cost_of_cover_apr"))
  }

  /** Port of `asset_tvl_by_day.sql`: per-reserve deposits/loans/TVL with
    * USD conversion — a filtered-subquery price join (SURVEY §2.4 J6: gas
    * pseudo-tokens are excluded from the price feed before joining) over
    * the market-state mart. */
  def assetTvlByDay(stateByDay: DataFrame, displayNames: DataFrame,
                    tokenPrices: DataFrame,
                    excludedSymbols: Seq[String] = Seq("ETH", "MATIC", "AVAX", "ONE", "FTM"),
                    excludedDisplayNames: Seq[String] = Seq(
                      "Ecosystem Reserve", "Incentives Controller V2", "Paraswap Fee Claimer")
                   ): DataFrame = {
    val names = broadcast(displayNames
      .filter(!col("display_name").isin(excludedDisplayNames: _*))
      .select(col("market").as("n_market"), col("chain"), col("display_name"),
        col("display_chain")).distinct())
    val p = tokenPrices
      .filter(!col("symbol").isin(excludedSymbols: _*))
      .select(col("chain").as("p_chain"), col("reserve").as("p_reserve"),
        col("block_day").as("p_day"), col("symbol").as("reserve_symbol"), col("usd_price"))
    stateByDay
      .join(names, col("market") === col("n_market"), "left").drop("n_market")
      .join(p, col("chain") === col("p_chain") && col("reserve") === col("p_reserve") &&
        col("block_day") === col("p_day"), "left")
      .drop("p_chain", "p_reserve", "p_day")
      .withColumn("loans", col("stable_debt") + col("variable_debt"))
      .withColumn("deposits_usd", col("atoken_supply") * col("usd_price"))
      .withColumn("stable_loans_usd", col("stable_debt") * col("usd_price"))
      .withColumn("variable_loans_usd", col("variable_debt") * col("usd_price"))
      .withColumn("loans_usd", col("loans") * col("usd_price"))
      .withColumn("tvl_usd", col("available_liquidity") * col("usd_price"))
      .withColumnRenamed("atoken_supply", "deposits")
      .withColumnRenamed("available_liquidity", "tvl")
  }

  /** Port of `inv_lst_performance_base.sql`: liquid-staking-token treasury
    * performance — balances joined to liquidity rates and prices (own +
    * ETH numeraire), lead-paired per (market, symbol), daily earnings in
    * native/USD/ETH units. */
  def lstPerformanceBase(balances: DataFrame, rates: DataFrame,
                         prices: DataFrame, ethPrices: DataFrame): DataFrame = {
    val r = rates.select(col("block_day").as("r_day"), col("market").as("r_market"),
      col("symbol").as("r_symbol"), col("liquidity_rate"))
    val p = prices.select(col("block_day").as("p_day"), col("market").as("p_market"),
      col("reserve").as("p_reserve"), col("usd_price"))
    val e = broadcast(ethPrices.select(col("block_day").as("e_day"),
      col("usd_price").as("eth_usd")))
    val w = Window.partitionBy(col("market"), col("symbol")).orderBy(col("block_day"))
    balances
      .join(r, col("block_day") === col("r_day") && col("market") === col("r_market") &&
        col("symbol") === col("r_symbol"), "left")
      .join(p, col("block_day") === col("p_day") && col("market") === col("p_market") &&
        col("reserve") === col("p_reserve"), "left")
      .join(e, col("block_day") === col("e_day"), "left")
      .drop("r_day", "r_market", "r_symbol", "p_day", "p_market", "p_reserve", "e_day")
      .withColumn("liquidity_rate", coalesce(col("liquidity_rate"), lit(0.0)))
      .withColumn("end_balance_native", lead(col("balance"), 1).over(w))
      .withColumn("end_usd_price", lead(col("usd_price"), 1).over(w))
      .withColumn("end_eth_usd", lead(col("eth_usd"), 1).over(w))
      .withColumn("balance_usd", col("balance") * col("usd_price"))
      .withColumn("balance_eth", col("balance") * col("usd_price") / col("eth_usd"))
      .withColumn("earnings_native", col("balance") * col("liquidity_rate") / 365)
      .withColumn("earnings_usd", col("earnings_native") * col("usd_price"))
      .withColumn("earnings_eth", col("earnings_usd") / col("eth_usd"))
      .withColumnRenamed("balance", "balance_native")
  }

  /** Final derived columns shared by the `inv_*_performance_base` family —
    * the three models (inv_lst / inv_bal / inv_treasury_atoken) end in an
    * identical SELECT computing period price-change and receipts in
    * native/USD/ETH units (inv_bal_performance_base.sql:115-135,
    * inv_treasury_atoken_performance_base.sql:100-120). Input must carry
    * the calcs-level columns (balance_native, earnings_native, usd_price,
    * eth_usd and their `end_` lead pairs). */
  def performanceDerived(calcs: DataFrame): DataFrame =
    calcs
      .withColumn("eth_price", col("usd_price") / col("eth_usd"))
      .withColumn("price_change_usd",
        (col("balance_native") + col("earnings_native")) *
          (col("end_usd_price") - col("usd_price")))
      .withColumn("price_change_eth",
        (col("balance_native") + col("earnings_native")) *
          (col("end_usd_price") / col("end_eth_usd") -
            col("usd_price") / col("eth_usd")))
      .withColumn("receipts_native",
        col("end_balance_native") - col("earnings_native") - col("balance_native"))
      .withColumn("receipts_usd", col("receipts_native") * col("usd_price"))
      .withColumn("receipts_eth", col("receipts_usd") / col("eth_usd"))

  private val invExcludedMarkets = Seq("ethereum_v1", "fantom_v3", "harmony_v3")

  /** Port of `inv_bal_performance_base.sql`: BAL / B-80BAL-20WETH treasury
    * positions (since 2022-07-20 — inv_bal_performance_base.sql:18-30) with
    * liquidity-rate earnings and a price coalesce: aave oracle
    * (ethereum_v2 BAL, :33-45) → coingecko (B-80BAL-20WETH, :47-58). The
    * lstPerformanceBase join/lead/earnings shape (calcs CTE :71-113) with a
    * two-feed price fallback and balance-group dim attach. */
  def invBalPerformanceBase(nonAtokenBalances: DataFrame, rates: DataFrame,
                            oraclePrices: DataFrame, coingeckoPrices: DataFrame,
                            ethPrices: DataFrame, balanceGroups: DataFrame): DataFrame = {
    val b = nonAtokenBalances
      .filter(col("symbol").isin("BAL", "B-80BAL-20WETH") &&
        col("block_day") >= to_timestamp(lit("2022-07-20")))
      .select(col("block_day"), col("market"), col("token").as("reserve"),
        col("symbol"), col("balance"))
    val r = rates
      .filter(!col("market").isin(invExcludedMarkets: _*))
      .select(col("block_day").as("r_day"), col("market").as("r_market"),
        col("symbol").as("r_symbol"), col("liquidity_rate"))
    val p = oraclePrices
      .filter(col("market") === "ethereum_v2" && col("symbol") === "BAL")
      .select(col("block_day").as("p_day"), col("market").as("p_market"),
        col("reserve").as("p_reserve"), col("usd_price").as("oracle_price"))
    val cg = coingeckoPrices
      .filter(col("symbol") === "B-80BAL-20WETH")
      .select(col("block_day").as("c_day"), lit("ethereum_v2").as("c_market"),
        col("address").as("c_reserve"), col("price_usd").as("cg_price"))
    val e = broadcast(ethPrices.select(col("block_day").as("e_day"),
      col("usd_price").as("eth_usd")))
    val l = broadcast(balanceGroups.select(col("market").as("l_market"),
      col("atoken_symbol").as("l_symbol"), col("balance_group"), col("stable_class")))
    val w = Window.partitionBy(col("market"), col("symbol")).orderBy(col("block_day"))
    val calcs = b
      .join(r, col("block_day") === col("r_day") && col("market") === col("r_market") &&
        col("symbol") === col("r_symbol"), "left")
      .join(p, col("block_day") === col("p_day") && col("market") === col("p_market") &&
        col("reserve") === col("p_reserve"), "left")
      .join(cg, col("block_day") === col("c_day") && col("market") === col("c_market") &&
        col("reserve") === col("c_reserve"), "left")
      .join(e, col("block_day") === col("e_day"), "left")
      .join(l, col("market") === col("l_market") && col("symbol") === col("l_symbol"), "left")
      .drop("r_day", "r_market", "r_symbol", "p_day", "p_market", "p_reserve",
        "c_day", "c_market", "c_reserve", "e_day", "l_market", "l_symbol")
      .withColumn("usd_price", coalesce(col("oracle_price"), col("cg_price")))
      .withColumn("liquidity_rate", coalesce(col("liquidity_rate"), lit(0.0)))
      .withColumnRenamed("balance", "balance_native")
      .withColumn("end_balance_native", lead(col("balance_native"), 1).over(w))
      .withColumn("end_usd_price", lead(col("usd_price"), 1).over(w))
      .withColumn("end_eth_usd", lead(col("eth_usd"), 1).over(w))
      .withColumn("balance_usd", col("balance_native") * col("usd_price"))
      .withColumn("balance_eth", col("balance_usd") / col("eth_usd"))
      .withColumn("earnings_native", col("balance_native") * col("liquidity_rate") / 365)
      .withColumn("earnings_usd", col("earnings_native") * col("usd_price"))
      .withColumn("earnings_eth", col("earnings_usd") / col("eth_usd"))
    performanceDerived(calcs).select(
      col("block_day"), col("market"), col("symbol"),
      col("balance_group"), col("stable_class"),
      col("balance_native"), col("balance_usd"), col("balance_eth"),
      col("usd_price"), col("eth_price"),
      col("earnings_native"), col("earnings_usd"), col("earnings_eth"),
      col("price_change_usd"), col("price_change_eth"),
      col("receipts_native"), col("receipts_usd"), col("receipts_eth"))
  }

  /** Port of `inv_treasury_atoken_performance_base.sql`: collector-held
    * atoken positions (excluded markets dropped, :14,31) joined to the
    * atoken dim for the underlying reserve (:29), priced by the reserve's
    * oracle price (:35-45), lead-paired per (market, symbol) (:60-98);
    * only rows with balance_native > 0 survive (:119-121). */
  def invTreasuryAtokenPerformanceBase(collectorAtokenBalances: DataFrame,
                                       rates: DataFrame, oraclePrices: DataFrame,
                                       ethPrices: DataFrame, atokens: DataFrame,
                                       balanceGroups: DataFrame): DataFrame = {
    val b = collectorAtokenBalances
      .filter(!col("market").isin(invExcludedMarkets: _*))
      .join(broadcast(atokens.select(col("atoken").as("a_token"),
        col("market").as("a_market"), col("reserve"), col("reserve_symbol"))),
        col("token") === col("a_token") && col("market") === col("a_market"), "left")
      .select(col("block_day"), col("market"), col("symbol"), col("reserve"),
        col("reserve_symbol"), col("balance"))
    val r = rates
      .filter(!col("market").isin(invExcludedMarkets: _*))
      .select(col("block_day").as("r_day"), col("market").as("r_market"),
        col("symbol").as("r_symbol"), col("liquidity_rate"))
    val p = oraclePrices
      .filter(!col("market").isin(invExcludedMarkets: _*))
      .select(col("block_day").as("p_day"), col("market").as("p_market"),
        col("reserve").as("p_reserve"), col("usd_price"))
    val e = broadcast(ethPrices.select(col("block_day").as("e_day"),
      col("usd_price").as("eth_usd")))
    val l = broadcast(balanceGroups.select(col("market").as("l_market"),
      col("atoken_symbol").as("l_symbol"), col("balance_group"), col("stable_class")))
    val w = Window.partitionBy(col("market"), col("symbol")).orderBy(col("block_day"))
    val calcs = b
      .join(r, col("block_day") === col("r_day") && col("market") === col("r_market") &&
        col("symbol") === col("r_symbol"), "left")
      .join(p, col("block_day") === col("p_day") && col("market") === col("p_market") &&
        col("reserve") === col("p_reserve"), "left")
      .join(e, col("block_day") === col("e_day"), "left")
      .join(l, col("market") === col("l_market") && col("symbol") === col("l_symbol"), "left")
      .drop("r_day", "r_market", "r_symbol", "p_day", "p_market", "p_reserve",
        "e_day", "l_market", "l_symbol")
      .withColumnRenamed("balance", "balance_native")
      .withColumn("end_balance_native", lead(col("balance_native"), 1).over(w))
      .withColumn("end_usd_price", lead(col("usd_price"), 1).over(w))
      .withColumn("end_eth_usd", lead(col("eth_usd"), 1).over(w))
      .withColumn("balance_usd", col("balance_native") * col("usd_price"))
      .withColumn("balance_eth", col("balance_usd") / col("eth_usd"))
      .withColumn("earnings_native", col("balance_native") * col("liquidity_rate") / 365)
      .withColumn("earnings_usd", col("earnings_native") * col("usd_price"))
      .withColumn("earnings_eth", col("earnings_usd") / col("eth_usd"))
    performanceDerived(calcs)
      .filter(col("balance_native") > 0)
      .select(
        col("block_day"), col("market"), col("symbol"),
        col("balance_group"), col("stable_class"),
        col("balance_native"), col("balance_usd"), col("balance_eth"),
        col("usd_price"), col("eth_price"),
        col("earnings_native"), col("earnings_usd"), col("earnings_eth"),
        col("price_change_usd"), col("price_change_eth"),
        col("receipts_native"), col("receipts_usd"), col("receipts_eth"))
  }

  /** Port of `reserve_factor_income_by_hour.sql`: hourly protocol income —
    * config ⋈ state on (block_hour, reserve, market)
    * (reserve_factor_income_by_hour.sql:19-24), chain dims broadcast
    * (:26-28), priced at the containing day's token price (:30-34). */
  def reserveFactorIncomeByHour(configByHour: DataFrame, stateByHour: DataFrame,
                                chainsMarkets: DataFrame, tokenPricesByDay: DataFrame): DataFrame = {
    val state = stateByHour.select(
      col("block_hour").as("s_hour"), col("reserve").as("s_reserve"),
      col("market").as("s_market"),
      col("variable_borrow_rate"), col("variable_debt"),
      col("stable_borrow_rate"), col("stable_debt"))
    val cm = broadcast(chainsMarkets
      .select(col("market").as("c_market"), col("chain"), col("display_chain"),
        col("display_market")))
    val p = tokenPricesByDay.select(col("block_day").as("p_day"),
      col("reserve").as("p_reserve"), col("chain").as("p_chain"), col("usd_price"))
    configByHour
      .join(state, col("block_hour") === col("s_hour") &&
        col("reserve") === col("s_reserve") && col("market") === col("s_market"), "left")
      .drop("s_hour", "s_reserve", "s_market")
      .join(cm, col("market") === col("c_market"), "left").drop("c_market")
      .join(p, date_trunc("day", col("block_hour")) === col("p_day") &&
        col("reserve") === col("p_reserve") && col("chain") === col("p_chain"), "left")
      .drop("p_day", "p_reserve", "p_chain")
      .withColumn("variable_debt_protocol_income",
        col("variable_debt") * col("variable_borrow_rate") / 365 * col("reserve_factor"))
      .withColumn("stable_debt_protocol_income",
        col("stable_debt") * col("stable_borrow_rate") / 365 * col("reserve_factor"))
      .withColumn("daily_income_usd",
        (col("variable_debt") * col("variable_borrow_rate") +
          col("stable_debt") * col("stable_borrow_rate")) / 365 *
          col("reserve_factor") * col("usd_price"))
      .select(col("block_hour"), col("market"), col("chain"), col("display_chain"),
        col("display_market"), col("atoken_symbol"), col("reserve_factor"),
        col("variable_borrow_rate"), col("variable_debt"),
        col("stable_borrow_rate"), col("stable_debt"),
        col("variable_debt_protocol_income"), col("stable_debt_protocol_income"),
        col("usd_price"), col("daily_income_usd"))
  }

  /** Port of `sm_cost_of_cover_by_day.sql`: annualized emission cost over
    * total cover, a ratio-of-sums aggregate (SURVEY §2.5 A7). */
  def smCostOfCoverByDay(smTotals: DataFrame): DataFrame =
    smTotals.groupBy(col("block_day"))
      .agg((sum(col("emission_usd_per_day")) * 365 / sum(col("safety_module_cover")))
        .as("annual_cost_of_cover_percent"))

  /** Port of `sm_cost_of_cover_by_token_by_day.sql`: the per-token variant —
    * a row-wise ratio on safety_module_totals_by_day, no aggregation
    * (sm_cost_of_cover_by_token_by_day.sql:3-8). */
  def smCostOfCoverByTokenByDay(smTotals: DataFrame): DataFrame =
    smTotals.select(col("block_day"), col("stk_token_symbol"),
      (col("emission_usd_per_day") * 365 / col("safety_module_cover"))
        .as("annual_cost_of_cover_percent"))

  /** Ports of the small safety-module rollup models over
    * `safetyModuleTotalsByDay` output:
    * sm_staked_value_by_day, sm_emissions_usd_by_day,
    * sm_protocol_cover_by_day, sm_staking_apr_by_day. */
  def smStakedValueByDay(smTotals: DataFrame): DataFrame =
    smTotals.select(col("block_day"), col("stk_token_symbol"),
      col("staked_amt_usd").as("staked_value_usd"))

  def smEmissionsUsdByDay(smTotals: DataFrame): DataFrame =
    smTotals.select(col("block_day"), col("stk_token_symbol"),
      col("emission_usd_per_day"))

  def smProtocolCoverByDay(smTotals: DataFrame): DataFrame =
    smTotals.groupBy(col("block_day"))
      .agg(sum(col("safety_module_cover")).as("protocol_cover"))

  def smStakingAprByDay(smTotals: DataFrame): DataFrame =
    smTotals.select(col("block_day"), col("stk_token_symbol"),
      col("emission_apr").as("staking_apr"))

  /** Port of `sm_percentage_tvl_coverage_by_day.sql`: protocol cover over
    * covered-markets TVL. */
  def smPercentageTvlCoverageByDay(coveredTvl: DataFrame, protocolCover: DataFrame): DataFrame = {
    val tvl = coveredTvl.groupBy(col("block_day")).agg(sum(col("tvl_usd")).as("tvl"))
    tvl.join(protocolCover, Seq("block_day"), "left")
      .filter(col("tvl").isNotNull && col("protocol_cover").isNotNull)
      .select(col("block_day"), (col("protocol_cover") / col("tvl")).as("percentage_covered"))
  }

  /** Port of the `sm_token_holder_distro.sql` bucket histogram: holders
    * bucketed into balance bands, count + sum per band (SURVEY §2.5 A10). */
  def tokenHolderDistro(holders: DataFrame,
                        bands: Seq[(String, Double)] = Seq(
                          "0_to_1" -> 1.0, "1_to_10" -> 10.0, "10_to_100" -> 100.0,
                          "100_to_1k" -> 1000.0, "1k_to_10k" -> 10000.0)): DataFrame = {
    // (a, b] bands: the reference's CASE chains `balance > threshold`
    // (sm_token_holder_distro.sql:9-15), so an exact boundary balance
    // (e.g. a round 100.0 airdrop) belongs to the LOWER bucket — `<=`
    // here, not `<`.
    val bucket = bands.foldRight(lit("over_" + bands.last._2.toLong): org.apache.spark.sql.Column) {
      case ((name, ub), acc) => when(col("balance") <= ub, name).otherwise(acc)
    }
    holders
      .withColumn("balance_band", bucket)
      .groupBy(col("block_day"), col("balance_band"))
      .agg(count(lit(1)).as("n_holders"), sum(col("balance")).as("total_balance"))
  }
}
