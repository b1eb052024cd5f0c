package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.domain.Datamart

class DatamartExtraSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = Timestamp.valueOf(f"2022-07-$d%02d 00:00:00")

  test("proposalMarketImpact: base measures, window filter, aggregate rollup") {
    val state = Seq(
      // in-window rows for the two proposal reserves
      (day(10), "ethereum_v2", "0xweth", "aWETH", 1000.0, 300.0, 100.0, 0.01, 0.03),
      (day(10), "ethereum_v2", "0xdai", "aDAI", 500.0, 100.0, 0.0, 0.02, 0.04),
      // other reserve / other market / pre-window rows must drop
      (day(10), "ethereum_v2", "0xusdc", "aUSDC", 1.0, 0.0, 0.0, 0.0, 0.0),
      (day(10), "polygon_v3", "0xweth", "aWETH", 1.0, 0.0, 0.0, 0.0, 0.0),
      (Timestamp.valueOf("2021-01-01 00:00:00"), "ethereum_v2", "0xweth", "aWETH",
        1.0, 0.0, 0.0, 0.0, 0.0))
      .toDF("block_day", "market", "reserve", "atoken_symbol",
        "atoken_supply", "variable_debt", "stable_debt",
        "liquidity_rate", "variable_borrow_rate")
    val revenue = Seq(
      (day(10), "ethereum_v2", "0xweth", "0xaweth", "native", 2.0),
      (day(10), "ethereum_v2", "0xweth", "0xaweth", "usd", 4000.0),
      (day(10), "ethereum_v2", "0xweth", "0xother", "native", 99.0)) // wrong token
      .toDF("block_day", "market", "underlying_reserve", "token", "currency", "revenue")
    val prices = Seq(
      (day(10), "ethereum_v2", "0xweth", 2000.0),
      (day(10), "ethereum_v2", "0xdai", 1.0))
      .toDF("block_day", "market", "reserve", "usd_price")
    val got = Datamart.proposalMarketImpact(state, revenue, prices,
      market = "ethereum_v2", reserves = Seq("0xweth", "0xdai"),
      revenueTokens = Seq("0xaweth"), proposalDate = "2022-12-19",
      aggregateMeasures = Seq("revenue_usd"))
    // weth: all 9 measures; dai: 7 (no revenue row → revenue/revenue_usd
    // null-valued rows are EXCLUDED, matching BigQuery UNPIVOT's default);
    // + 1 aggregate (revenue_usd) day-row
    assert(got.count() == 17, s"got ${got.count()}")
    def v(reserve: String, measure: String) =
      got.filter($"reserve" === reserve && $"measure" === measure)
        .head().getAs[Double]("value")
    assert(v("0xweth", "tvl") == 600.0)            // 1000 - 300 - 100
    assert(v("0xweth", "tvl_usd") == 1200000.0)
    assert(v("0xweth", "revenue_usd") == 4000.0)
    assert(v("0xdai", "borrows") == 100.0)
    assert(v("aggregate", "revenue_usd") == 4000.0) // dai leg null-revenue
    assert(got.filter($"reserve" === "0xusdc").count() == 0)
  }

  test("proposalMarketImpact with reward feeds adds APR + emissions measures (130 shape)") {
    val state = Seq(
      (day(10), "polygon_v3", "0xwmatic", "aWMATIC", 100.0, 40.0, 10.0, 0.01, 0.03))
      .toDF("block_day", "market", "reserve", "atoken_symbol",
        "atoken_supply", "variable_debt", "stable_debt",
        "liquidity_rate", "variable_borrow_rate")
    val revenue = Seq((day(10), "polygon_v3", "0xwmatic", "0xt", "usd", 7.0))
      .toDF("block_day", "market", "underlying_reserve", "token", "currency", "revenue")
    val prices = Seq((day(10), "polygon_v3", "0xwmatic", 0.5))
      .toDF("block_day", "market", "reserve", "usd_price")
    val sd = Seq(
      (day(10), "polygon_v3", "0xwmatic", "SD", 1.0, 2.0, 3.0, 0.002, 0.005),
      (day(10), "polygon_v3", "0xwmatic", "LDO", 9.0, 9.0, 9.0, 9.0, 9.0)) // other symbol
      .toDF("block_day", "market", "reserve", "reward_token_symbol",
        "supply_rewards", "variable_debt_rewards", "stable_debt_rewards",
        "supply_rewards_apr", "variable_borrow_rewards_apr")
    val got = Datamart.proposalMarketImpact(state, revenue, prices,
      market = "polygon_v3", reserves = Seq("0xwmatic"),
      revenueTokens = Seq("0xt"), proposalDate = "2022-12-19", // fixture day in window
      rewardFeeds = Seq("SD" -> sd))
    // 8 base (native revenue leg absent → null row excluded) + 6 APR/apy
    // + 1 emissions measure
    assert(got.count() == 15, s"got ${got.count()}")
    def v(measure: String) =
      got.filter($"measure" === measure).head().getAs[Double]("value")
    assert(v("SD_emissions_paid") == 6.0)
    assert(math.abs(v("deposit_apy_inc_rewards") - 0.012) < 1e-12)
    assert(math.abs(v("variable_borrow_apy_inc_rewards") - 0.035) < 1e-12)
  }

  test("treasuryValueByAsset: per-token rollup with start-of-day shift") {
    val bal = Seq(
      (day(18), "Ethereum", "Ethereum V2", "Collector", "0xtok", "BAL", "0xtok", "BAL", 100.0, 10.0),
      (day(18), "Ethereum", "Ethereum V2", "Collector", "0xtok", "BAL", "0xtok", "BAL", 50.0, 5.0))
      .toDF("block_day", "display_chain", "display_market", "collector_label",
        "token", "symbol", "underlying_reserve", "underlying_reserve_symbol",
        "value_usd", "value_native")
    val got = Datamart.treasuryValueByAsset(bal)
    assert(got.count() == 1)
    val r = got.head()
    assert(r.getAs[java.sql.Date]("block_day").toString == "2022-07-19")
    assert(r.getAs[Double]("value_usd") == 150.0)
    assert(r.getAs[Double]("value_native") == 15.0)
  }

  test("treasury rollup variants + SM coverage chain") {
    import graft.domain.Protocol
    val bal = Seq(
      (day(18), "Ethereum", "Ethereum V2", "Collector", "Stablecoin", "stablecoin", "0xa", "aDAI", "0xd", "DAI", 100.0, 100.0),
      (day(18), "Ethereum", "Ethereum V2", "Ecosystem Reserve", "Other Token", "unstablecoin", "0xb", "AAVE", "0xv", "AAVE", 900.0, 10.0))
      .toDF("block_day", "display_chain", "display_market", "collector_label",
        "balance_group", "stable_class", "token", "symbol", "underlying_reserve",
        "underlying_reserve_symbol", "value_usd", "value_native")
    assert(Datamart.treasuryValueByBalanceGroup(bal).count() == 2)
    assert(Datamart.treasuryValueByMarket(bal).count() == 1)
    val exRes = Datamart.treasuryValueByChainExReserve(bal).head()
    assert(exRes.getAs[Double]("value_usd") == 100.0)

    val totals = Seq((day(1), "total_treasury_value", 10.0),
                     (day(2), "total_treasury_value", 20.0))
      .toDF("block_day", "measure", "value_usd")
    val latest = Datamart.treasuryTotalsLatest(totals).collect()
    assert(latest.length == 1 && latest.head.getAs[Double]("value_usd") == 20.0)

    // SM chain: totals → cover rollup → percentage of covered TVL
    val smTotals = Seq((day(1), "stkAAVE", 3e8, 1e5, 0.12, 9e7))
      .toDF("block_day", "stk_token_symbol", "staked_amt_usd",
        "emission_usd_per_day", "emission_apr", "safety_module_cover")
    assert(Protocol.smStakedValueByDay(smTotals).head()
      .getAs[Double]("staked_value_usd") == 3e8)
    val cover = Protocol.smProtocolCoverByDay(smTotals)
    val coveredTvl = Seq((day(1), "Ethereum V2 Ethereum", 4.5e8))
      .toDF("block_day", "aave_market", "tvl_usd")
    val pct = Protocol.smPercentageTvlCoverageByDay(coveredTvl, cover).head()
    assert(math.abs(pct.getAs[Double]("percentage_covered") - 0.2) < 1e-12)
  }

  test("proposalImpact: windowed purchases, avg price, mark-to-latest") {
    val COLLECTOR = "0x464c71f6c2f760dda6093dcb91c24c39e5d6e18c"
    val BAL = "0xba100000625a3754423978a60c9317c58a424e3d"
    val measures = Seq(
      (day(18), COLLECTOR, BAL, "BAL", 100.0),
      (day(19), COLLECTOR, BAL, "BAL", 200.0),
      (day(25), COLLECTOR, BAL, "BAL", 999.0),   // outside window
      (day(19), "0xother", BAL, "BAL", 999.0))   // other collector
      .toDF("block_day", "contract_address", "token", "symbol", "tokens_in_external")
    val prices = Seq(
      (day(18), "ethereum", BAL, 5.0),
      (day(19), "ethereum", BAL, 6.0),
      (day(30), "ethereum", BAL, 8.0)) // latest → current price
      .toDF("block_day", "chain", "reserve", "usd_price")
    val got = Datamart.proposalImpact(measures, prices,
      COLLECTOR, BAL, "ethereum", "2022-07-18", "2022-07-20").head()
    assert(got.getAs[Double]("purchase_amount") == 300.0)
    assert(got.getAs[Double]("purchase_amount_usd") == 100.0 * 5 + 200.0 * 6)
    assert(math.abs(got.getAs[Double]("av_purchase_price") - 1700.0 / 300.0) < 1e-12)
    assert(got.getAs[Double]("current_price") == 8.0)
    assert(math.abs(got.getAs[Double]("net_value_change") - (300.0 * 8 - 1700.0)) < 1e-9)
  }
}
