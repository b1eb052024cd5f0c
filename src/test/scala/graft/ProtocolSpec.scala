package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.domain.Protocol

class ProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = Timestamp.valueOf(f"2024-01-0$d%d 00:00:00")
  private def hour(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-0$d%d $h%02d:00:00")

  test("tokenPricesByDay keeps the lowest-rank market per (chain,reserve,day)") {
    val prices = Seq(
      ("ethereum_v2", "0xres1", "USDC", day(1), 1.00, "chainlink"),
      ("ethereum_v3", "0xres1", "USDC", day(1), 1.01, "chainlink"),
      ("polygon_v3", "0xres2", "WMATIC", day(1), 0.80, "chainlink")
    ).toDF("market", "reserve", "symbol", "block_day", "usd_price", "pricing_source")
    val ranks = Seq(
      ("ethereum_v2", "ethereum", 2L), ("ethereum_v3", "ethereum", 1L),
      ("polygon_v3", "polygon", 1L)
    ).toDF("market", "chain", "price_rank")
    val got = Protocol.tokenPricesByDay(prices, ranks)
    assert(got.count() == 2)
    val usdc = got.filter($"symbol" === "USDC").head()
    assert(usdc.getAs[Double]("usd_price") == 1.01) // v3 has rank 1 < v2's 2
  }

  test("marketState derives the four APYs from per-second rates") {
    val n = 60.0 * 60 * 24 * 365
    val state = Seq(("ethereum_v3", "0xr", "aWETH", day(1), 0.05, 0.07, 0.09, 0.08))
      .toDF("market", "reserve", "symbol", "block_day",
        "liquidity_rate", "variable_borrow_rate", "stable_borrow_rate", "average_stable_rate")
    val got = Protocol.marketState(state, "block_day").head()
    assert(math.abs(got.getAs[Double]("deposit_apy") -
      (math.pow(1 + 0.05 / n, n) - 1)) < 1e-12)
    assert(math.abs(got.getAs[Double]("variable_borrow_apy") -
      (math.pow(1 + 0.07 / n, n) - 1)) < 1e-12)
  }

  test("marketConfigByHour forward-fills daily emode config onto hourly rows") {
    val pd = Seq(
      ("ethereum_v3", "aWETH", hour(1, 0), 1L),
      ("ethereum_v3", "aWETH", hour(1, 1), 1L),
      ("ethereum_v3", "aWETH", hour(2, 0), 1L)
    ).toDF("market", "symbol", "block_hour", "reserve_emode_category")
    // emode config exists only for day 1 → hours on day 2 carry it forward
    val emode = Seq((day(1), "ethereum_v3", 1L, "ETH correlated", 0.93, 1.01, 0.95))
      .toDF("block_day", "market", "reserve_emode_category",
        "emode_category_name", "emode_ltv", "emode_liquidation_bonus",
        "emode_liquidation_threshold")
    val got = Protocol.marketConfigByHour(pd, emode).orderBy("block_hour")
      .select($"block_hour", $"emode_category_name").collect()
    assert(got.forall(_.getString(1) == "ETH correlated"),
      got.map(r => s"${r.get(0)}=${r.get(1)}").mkString(", "))
  }

  test("shortfallSimulation: dedup to first fetch, monotonic filter, spline sweep") {
    // two fetches on day1; only the 10:00 one must survive
    def depth(ts: Timestamp, scale: Double) = Seq(
      (ts, 1e6 * scale, 0.99e6 * scale, 0.01),
      (ts, 2e6 * scale, 1.90e6 * scale, 0.05),
      (ts, 4e6 * scale, 3.40e6 * scale, 0.15),
      (ts, 8e6 * scale, 5.60e6 * scale, 0.30)
    )
    val liq = (depth(Timestamp.valueOf("2024-01-01 10:00:00"), 1.0) ++
      depth(Timestamp.valueOf("2024-01-01 22:00:00"), 999.0))
      .toDF("fetch_time", "from_amount_usd", "to_amount_usd", "price_impact")
    val sm = Seq((day(1), 2e6)).toDF("block_day", "staked_value_usd")
    val got = Protocol.shortfallSimulation(liq, sm, badDebtGrid = Seq(1e6, 3e6))
    val rows = got.orderBy("bad_debt").collect()
    assert(rows.length == 2)
    val r = rows.head
    assert(r.getAs[Double]("sm_coverage") == 6e5)
    // spline(from→to) at 1e6 must hit the knot exactly: to = 0.9*0.99e6*... no:
    // to_amount_aaveweth = 1e6*(1-0.01)*0.9 + 1e6*0.1 = 0.991e6
    assert(math.abs(r.getAs[Double]("naive_sales") - 0.991e6) < 1e-6,
      s"naive_sales=${r.getAs[Double]("naive_sales")}")
    // the 22:00 fetch (scale 999) must not leak in: values stay ~1e6-scale
    assert(r.getAs[Double]("naive_sales") < 1e8)
    assert(r.getAs[Double]("overhang") >= 0.0)
  }

  test("streamingPaymentsDetail: state join, atoken->reserve price fallback, zero coalesce") {
    val meta = Seq(
      ("V1", "s1", 1L, "0xsablier", "0xadai", 7L, "aDAI", "12m", 10.0, 50.0),
      ("V2", "s2", 2L, "0xsablier", "0xaave", 8L, "AAVE", "6m", 0.0, 90.0)) // no state row
      .toDF("vendor_label", "stream_label", "proposal_id", "stream_contract",
        "token", "stream_id", "symbol", "term", "upfront_native", "bonus_usd")
    val state = Seq(
      ("0xsablier", "0xadai", 7L, day(1), day(1), day(3), 1000.0, 400.0, 600.0, 300.0, 100.0))
      .toDF("contract_address", "token_address", "stream_id", "deposit_day",
        "start_time", "stop_time", "deposit", "vested", "unvested", "claims", "unclaimed")
    val prices = Seq(
      (day(2), "ethereum", "0xdai", 1.0),   // reserve price for aDAI via atokens dim
      (day(2), "ethereum", "0xaave", 90.0)) // direct reserve price for AAVE
      .toDF("block_day", "chain", "reserve", "usd_price")
    val atokens = Seq(("ethereum", "0xadai", "0xdai")).toDF("chain", "atoken", "reserve")
    val got = Protocol.streamingPaymentsDetail(meta, state, prices, atokens)
    assert(got.count() == 2)
    val s1 = got.filter($"stream_label" === "s1").head()
    assert(s1.getAs[Double]("usd_price") == 1.0)   // atoken price path
    assert(s1.getAs[Double]("vested_native") == 400.0)
    assert(s1.getAs[Double]("bonus_native") == 50.0)
    val s2 = got.filter($"stream_label" === "s2").head()
    assert(s2.getAs[Double]("usd_price") == 90.0)  // reserve fallback
    assert(s2.getAs[Double]("total_payment_native") == 0.0) // missing state → 0
    assert(s2.getAs[Timestamp]("stream_start_time").toString.startsWith("1970-01-01"))
    assert(math.abs(s2.getAs[Double]("bonus_native") - 1.0) < 1e-12)
  }

  test("streamingPaymentsSummary pivots with deterministic names + totals") {
    val detail = Seq(
      ("V1", "s1", "12m", 1L, "url", day(1), day(1), day(3), "AAVE", 100.0, 40.0, 10.0, 5.0, 90.0),
      ("V1", "s1", "12m", 1L, "url", day(1), day(1), day(3), "aUSDC", 200.0, 80.0, 0.0, 0.0, 1.0)
    ).toDF("vendor_label", "stream_label", "term", "proposal_id", "proposal_url",
      "stream_create_date", "stream_start_time", "stream_stop_time", "symbol",
      "total_payment_native", "unvested_native", "upfront_native", "bonus_native", "usd_price")
    val got = Protocol.streamingPaymentsSummary(detail)
    assert(got.count() == 1)
    val r = got.head()
    assert(r.getAs[Double]("AAVE_stream_amount") == 100.0)
    assert(r.getAs[Double]("AAVE_total_contract_amount") == 115.0)
    assert(r.getAs[Double]("aUSDC_total_contract_amount") == 200.0)
    assert(r.getAs[Double]("aUSDT_stream_amount") == 0.0) // absent symbol zero-filled
  }

  test("lstPerformanceBase: earnings math + lead pairing") {
    val bal = Seq((day(1), "ethereum_v2", "0xwsteth", "wstETH", 100.0),
                  (day(2), "ethereum_v2", "0xwsteth", "wstETH", 101.0))
      .toDF("block_day", "market", "reserve", "symbol", "balance")
    val rates = Seq((day(1), "ethereum_v2", "wstETH", 0.0365))
      .toDF("block_day", "market", "symbol", "liquidity_rate")
    val prices = Seq((day(1), "ethereum_v2", "0xwsteth", 2000.0),
                     (day(2), "ethereum_v2", "0xwsteth", 2100.0))
      .toDF("block_day", "market", "reserve", "usd_price")
    val eth = Seq((day(1), 1800.0), (day(2), 1850.0)).toDF("block_day", "usd_price")
    val got = Protocol.lstPerformanceBase(bal, rates, prices, eth)
      .filter($"block_day" === day(1)).head()
    assert(math.abs(got.getAs[Double]("earnings_native") - 100.0 * 0.0365 / 365) < 1e-12)
    assert(got.getAs[Double]("end_balance_native") == 101.0)
    assert(got.getAs[Double]("end_usd_price") == 2100.0)
    assert(math.abs(got.getAs[Double]("balance_eth") - 100.0 * 2000.0 / 1800.0) < 1e-9)
    // day2 has no rate row → coalesced to 0
    val d2 = Protocol.lstPerformanceBase(bal, rates, prices, eth)
      .filter($"block_day" === day(2)).head()
    assert(d2.getAs[Double]("earnings_native") == 0.0)
  }

  test("balancerBptByDay: lag-based daily APR, first day zero") {
    val bpt = Seq(
      (day(1), "ethereum", "B-80AAVE-20WETH", "pool1", 1.000),
      (day(2), "ethereum", "B-80AAVE-20WETH", "pool1", 1.001))
      .toDF("block_day", "chain", "symbol", "pool", "rate")
      .withColumn("denom", lit("AAVE")).withColumn("bpt_usd_price", lit(100.0))
    val got = Protocol.balancerBptByDay(bpt).orderBy("block_day").collect()
    assert(got(0).getAs[Double]("daily_apr") == 0.0) // lag null → rate/rate - 1
    assert(math.abs(got(1).getAs[Double]("daily_apr") - (1.001 / 1.000 - 1) * 365) < 1e-9)
  }

  test("smCoveredMarketsTvlByDay: era rule table reproduces the epoch branches") {
    def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val tvl = Seq(
      (ts("2022-07-01"), "ethereum_v2", "Ethereum V2", "Ethereum", 10.0),
      (ts("2022-07-01"), "avax_v2", "Avalanche V2", "Avalanche", 20.0),    // pre-epoch → out
      (ts("2022-08-01"), "avax_v2", "Avalanche V2", "Avalanche", 30.0),    // epoch start → in
      (ts("2023-03-15"), "polygon_v3", "Polygon V3", "Polygon", 40.0),     // day before → out
      (ts("2023-03-16"), "polygon_v3", "Polygon V3", "Polygon", 50.0),     // in
      (ts("2023-03-16"), "fantom_v3", "Fantom V3", "Fantom", 60.0))        // never covered
      .toDF("block_day", "market", "display_name", "display_chain", "tvl_usd")
    val got = Protocol.smCoveredMarketsTvlByDay(tvl)
      .select($"tvl_usd").as[Double].collect().toSet
    assert(got == Set(10.0, 30.0, 50.0))
  }

  test("incentivesByDay: emission scaling, end-date zeroing, quadrant split, 9-sum rollup") {
    val raw = Seq(
      // atoken incentive, active: 0.01/s, 18 decimals
      (day(1), 100L, "polygon_v3", "0xres", "aUSDC", "atoken", "0xrw", "MATIC",
        18L, 1e16, 4102444800L, 8e7, 8L),
      // vtoken incentive on same reserve
      (day(1), 100L, "polygon_v3", "0xres", "aUSDC", "vtoken", "0xrw", "MATIC",
        18L, 2e16, 4102444800L, 8e7, 8L),
      // expired incentive → dropped (emission 0 fails the >0 filter)
      (day(1), 100L, "polygon_v3", "0xres", "aUSDC", "atoken", "0xrw2", "OLD",
        18L, 1e16, 100L, 8e7, 8L))
      .toDF("block_day", "block_height", "market", "underlying_asset", "symbol",
        "token_type", "reward_token_address", "reward_token_symbol",
        "reward_token_decimals", "emission_per_second", "emission_end_timestamp",
        "reward_price_feed", "price_feed_decimals")
    val pd = Seq((day(1), 100L, "polygon_v3", "0xres", 1e6, 1e5, 4e5))
      .toDF("block_day", "block_height", "market", "reserve",
        "atoken_supply", "stable_debt", "variable_debt")
    val prices = Seq((day(1), "polygon_v3", "0xres", 1.0))
      .toDF("block_day", "market", "reserve", "usd_price")
    val got = Protocol.incentivesByDay(raw, pd, prices)
    assert(got.count() == 1) // rolled to one (reserve, reward token) row
    val r = got.head()
    val emissionA = 1e16 * 86400 / 1e18            // 864 MATIC/day
    val priceUsd = 8e7 / 1e8                       // 0.8 USD
    assert(math.abs(r.getAs[Double]("supply_rewards") - emissionA) < 1e-9)
    assert(math.abs(r.getAs[Double]("variable_debt_rewards") - 2 * emissionA) < 1e-9)
    assert(r.getAs[Double]("stable_debt_rewards") == 0.0)
    assert(math.abs(r.getAs[Double]("supply_rewards_usd") - emissionA * priceUsd) < 1e-9)
    assert(math.abs(r.getAs[Double]("supply_rewards_apr") -
      emissionA * priceUsd / 1e6 * 365) < 1e-9)
  }

  test("liquidityDepth: np.interp at impact grid, raw+interp union, native recalc") {
    // one quote sweep: impact 1% → $100, 3% → $300, 5% → $500 (linear, so
    // every interpolated point is exactly 10000·impact)
    val raw = Seq(
      ("eth_wsteth", "WETH", "wstETH", day(1), 0.01, 100.0, 2.0, 1.0, 0.05, 49.5),
      ("eth_wsteth", "WETH", "wstETH", day(1), 0.03, 300.0, 2.0, 1.0, 0.15, 145.5),
      ("eth_wsteth", "WETH", "wstETH", day(1), 0.05, 500.0, 2.0, 1.0, 0.25, 237.5)
    ).toDF("market_key", "to_asset", "from_asset", "fetch_time",
      "price_impact", "from_amount_usd", "from_asset_price", "to_asset_price",
      "from_amount_native", "to_amount_native")
    val got = Protocol.liquidityDepth(raw)
    // 3 raw rows + 17 targets (0.01..0.05 step 0.0025)
    assert(got.count() == 20)
    assert(got.filter($"is_interpolated").count() == 17)
    val at2pct = got.filter($"is_interpolated" && abs($"price_impact" - 0.02) < 1e-12).head()
    assert(math.abs(at2pct.getAs[Double]("from_amount_usd") - 200.0) < 1e-9)
    // to_amount_usd = (1 - impact) · from_amount_usd
    assert(math.abs(at2pct.getAs[Double]("to_amount_usd") - 0.98 * 200.0) < 1e-9)
    // metadata rode the group aggregate; native amounts recalc from prices
    assert(at2pct.getAs[Double]("from_asset_price") == 2.0)
    assert(math.abs(at2pct.getAs[Double]("from_amount_native") - 100.0) < 1e-9)
    assert(math.abs(at2pct.getAs[Double]("to_amount_native") - 196.0) < 1e-9)
    // raw rows survive untagged with native amounts recalculated too
    val rawRow = got.filter(!$"is_interpolated" && $"price_impact" === 0.01).head()
    assert(math.abs(rawRow.getAs[Double]("from_amount_native") - 50.0) < 1e-9)
    // grid endpoints clamp to the knot values (np.interp semantics)
    val at5 = got.filter($"is_interpolated" && abs($"price_impact" - 0.05) < 1e-12).head()
    assert(math.abs(at5.getAs[Double]("from_amount_usd") - 500.0) < 1e-9)
  }

  test("defiRefStableRateBase + defiRefRatesByDay: multi-source union, weighted rate, eth ffill") {
    val aave = Seq((day(1), "aave_v3", "USDC", 1000.0, 0.0365),
                   (day(2), "aave_v3", "USDC", 1000.0, 0.0365))
      .toDF("block_time", "market", "symbol", "deposits_native", "deposit_apy")
    val compound = Seq((day(1), "compound_v3", "USDC", 3000.0, 0.073),
                       (day(2), "compound_v3", "USDC", 3000.0, 0.073),
                       (day(1), "compound_v3", "WETH", 999.0, 0.01)) // non-stable dropped
      .toDF("block_time", "market", "symbol", "deposits_native", "deposit_apy")
    val prices = Seq((day(1), "USDC", 1.0), (day(2), "USDC", 1.0))
      .toDF("block_day", "symbol", "usd_price")
    val base = Protocol.defiRefStableRateBase(Seq(aave, compound), prices)
    assert(base.count() == 4) // 2 markets × 2 days, WETH excluded
    val d1 = base.filter($"market" === "aave_v3" && $"block_day" === day(1)).head()
    assert(math.abs(d1.getAs[Double]("earnings_usd") - 1000.0 * 0.0365 / 365) < 1e-12)

    // eth rate only on day1 → day2 forward-filled
    val eth = Seq((day(1), 0.04)).toDF("partition_date", "apr")
    val rates = Protocol.defiRefRatesByDay(base, eth).orderBy("block_day").collect()
    assert(rates.length == 2)
    // weighted: (1000*.0365 + 3000*.073)/365 per day over 4000 deposits * 365
    val expected = (1000.0 * 0.0365 / 365 + 3000.0 * 0.073 / 365) / 4000.0 * 365
    rates.foreach { r =>
      assert(math.abs(r.getAs[Double]("stable_reference_rate_ex_price") - expected) < 1e-12)
      assert(r.getAs[Double]("eth_reference_rate") == 0.04)
    }
  }

  test("safetyModuleTotalsByDay: J7 price coalesce chain + APR math") {
    val rpc = Seq((day(1), "0xstk", "stkAAVE", "0xaave", "0xaave", 3e6, 16e6, 1000.0, "AAVE"))
      .toDF("block_day", "stk_token_address", "stk_token_symbol",
        "unstaked_token_address", "reward_token_address",
        "stk_token_supply", "unstaked_token_supply", "emission_per_day",
        "reward_token_symbol")
    // no direct stk price; unstaked token priced at 100 → pu fallback wins
    val prices = Seq((day(1), "0xaave", 100.0)).toDF("block_day", "reserve", "usd_price")
    val cg = Seq((day(1), "0xstk", 95.0)).toDF("block_day", "address", "price_usd")
    val got = Protocol.safetyModuleTotalsByDay(rpc, prices, cg).head()
    assert(got.getAs[Double]("stk_token_price") == 100.0) // pu beats coingecko
    assert(got.getAs[Double]("staked_amt_usd") == 3e8)
    assert(got.getAs[Double]("emission_usd_per_day") == 1e5)
    assert(math.abs(got.getAs[Double]("emission_apr") - 1e5 * 365 / 3e8) < 1e-12)
    assert(got.getAs[Double]("safety_module_cover") == 9e7)
    // chains to the cost-of-cover rollup (A7)
    val cover = Protocol.smCostOfCoverByDay(
      Protocol.safetyModuleTotalsByDay(rpc, prices, cg)).head()
    assert(math.abs(cover.getAs[Double]("annual_cost_of_cover_percent") -
      1e5 * 365 / 9e7) < 1e-12)
  }

  test("assetTvlByDay: USD conversion + gas-symbol price exclusion") {
    val state = Seq((day(1), "ethereum_v3", "0xres", "aWETH", 1000.0, 100.0, 400.0, 500.0))
      .toDF("block_day", "market", "reserve", "atoken_symbol",
        "atoken_supply", "stable_debt", "variable_debt", "available_liquidity")
    val names = Seq(("ethereum_v3", "ethereum", "Ethereum V3", "Ethereum"))
      .toDF("market", "chain", "display_name", "display_chain")
    val prices = Seq(
      ("ethereum", "0xres", day(1), "WETH", 2000.0),
      ("ethereum", "0xres", day(1), "ETH", 9999.0)) // gas symbol — excluded
      .toDF("chain", "reserve", "block_day", "symbol", "usd_price")
    val got = Protocol.assetTvlByDay(state, names, prices)
    assert(got.count() == 1) // excluded gas-price row must not fan out the join
    val r = got.head()
    assert(r.getAs[Double]("loans") == 500.0)
    assert(r.getAs[Double]("tvl_usd") == 1000000.0)
    assert(r.getAs[String]("reserve_symbol") == "WETH")
  }

  test("stablecoinTotals rolls up stable-class balances per group") {
    val bal = Seq(
      (day(1), "Stablecoin", "stablecoin", 100.0),
      (day(1), "Stablecoin", "stablecoin", 50.0),
      (day(1), "Other Token", "unstablecoin", 999.0))
      .toDF("block_day", "balance_group", "stable_class", "value_usd")
    val got = graft.domain.Datamart.stablecoinTotals(bal).head()
    assert(got.getAs[Double]("value_usd") == 150.0)
    assert(got.getAs[String]("stablecoin_group") == "Stablecoin")
  }

  test("smCostOfCoverByDay: ratio of sums") {
    val totals = Seq((day(1), 100.0, 365000.0), (day(1), 50.0, 365000.0))
      .toDF("block_day", "emission_usd_per_day", "safety_module_cover")
    val got = Protocol.smCostOfCoverByDay(totals).head()
    assert(math.abs(got.getAs[Double]("annual_cost_of_cover_percent") -
      150.0 * 365 / 730000.0) < 1e-12)
  }

  test("tokenHolderDistro buckets balances into bands") {
    val holders = Seq(
      (day(1), "0xa", 0.5), (day(1), "0xb", 5.0), (day(1), "0xc", 50.0),
      (day(1), "0xd", 20000.0)
    ).toDF("block_day", "holder", "balance")
    val got = Protocol.tokenHolderDistro(holders)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("0_to_1" -> 1L, "1_to_10" -> 1L, "10_to_100" -> 1L,
      "over_10000" -> 1L))
  }

  test("tokenHolderDistro: exact boundary balances land in the LOWER band") {
    // Reference CASE chains `balance > threshold`
    // (sm_token_holder_distro.sql:9-15): 100.0 is NOT > 100 → lower band.
    val holders = Seq(
      (day(1), "0xa", 1.0), (day(1), "0xb", 10.0),
      (day(1), "0xc", 100.0), (day(1), "0xd", 10000.0)
    ).toDF("block_day", "holder", "balance")
    val got = Protocol.tokenHolderDistro(holders)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got == Map("0_to_1" -> 1L, "1_to_10" -> 1L, "10_to_100" -> 1L,
      "1k_to_10k" -> 1L))
  }
}
