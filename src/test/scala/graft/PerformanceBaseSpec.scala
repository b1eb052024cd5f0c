package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.domain.{Marts, Protocol}

/** Golden tests for the inv_*_performance_base family and the remaining
  * hourly/per-token datamart ports added in round 2. */
class PerformanceBaseSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = Timestamp.valueOf(f"2022-08-$d%02d 00:00:00")
  private def hour(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-0$d%d $h%02d:00:00")

  private val ethPrices =
    Seq((day(1), 2000.0), (day(2), 2500.0)).toDF("block_day", "usd_price")
  private val balanceGroups =
    Seq(("ethereum_v2", "BAL", "Other", "volatile"),
        ("ethereum_v2", "aUSDC", "Stablecoin", "stable"))
      .toDF("market", "atoken_symbol", "balance_group", "stable_class")

  test("invBalPerformanceBase: oracle→coingecko price coalesce, date filter, derived goldens") {
    val balances = Seq(
      // BAL: oracle-priced; two days → one lead pair
      (day(1), "ethereum_v2", "0xbal", "BAL", 100.0),
      (day(2), "ethereum_v2", "0xbal", "BAL", 113.0),
      // B-80BAL-20WETH: only the coingecko feed has it
      (day(1), "ethereum_v2", "0xbpt", "B-80BAL-20WETH", 10.0),
      // pre-2022-07-20 row must be filtered out
      (Timestamp.valueOf("2022-07-01 00:00:00"), "ethereum_v2", "0xbal", "BAL", 999.0),
      // non-BAL symbol must be filtered out
      (day(1), "ethereum_v2", "0xweth", "WETH", 5.0))
      .toDF("block_day", "market", "token", "symbol", "balance")
    val rates = Seq(
      (day(1), "ethereum_v2", "BAL", "0xbal", 0.365), // earnings = bal * rate/365 = 0.1/unit
      (day(1), "fantom_v3", "BAL", "0xbal", 9.9))     // excluded market
      .toDF("block_day", "market", "symbol", "reserve", "liquidity_rate")
    val oracle = Seq(
      (day(1), "ethereum_v2", "0xbal", "BAL", 6.0),
      (day(2), "ethereum_v2", "0xbal", "BAL", 7.0),
      (day(1), "ethereum_v2", "0xweth", "WETH", 2000.0))
      .toDF("block_day", "market", "reserve", "symbol", "usd_price")
    val cg = Seq(
      (day(1), "0xbpt", "B-80BAL-20WETH", 12.0),
      (day(1), "0xother", "OTHER", 1.0))
      .toDF("block_day", "address", "symbol", "price_usd")
    val got = Protocol.invBalPerformanceBase(
      balances, rates, oracle, cg, ethPrices, balanceGroups)
    assert(got.count() == 3) // 2 BAL days + 1 BPT day
    val b1 = got.filter($"symbol" === "BAL" && $"block_day" === day(1)).head()
    assert(b1.getAs[Double]("usd_price") == 6.0)          // oracle path
    assert(b1.getAs[String]("balance_group") == "Other")  // dim attach
    assert(math.abs(b1.getAs[Double]("earnings_native") - 0.1) < 1e-12) // 100*0.365/365
    assert(math.abs(b1.getAs[Double]("earnings_usd") - 0.6) < 1e-12)
    assert(math.abs(b1.getAs[Double]("earnings_eth") - 0.0003) < 1e-15)
    // price_change_usd = (100 + 0.1) * (7 - 6) = 100.1
    assert(math.abs(b1.getAs[Double]("price_change_usd") - 100.1) < 1e-9)
    // receipts_native = 113 - 0.1 - 100 = 12.9; usd = *6
    assert(math.abs(b1.getAs[Double]("receipts_native") - 12.9) < 1e-9)
    assert(math.abs(b1.getAs[Double]("receipts_usd") - 77.4) < 1e-9)
    val bpt = got.filter($"symbol" === "B-80BAL-20WETH").head()
    assert(bpt.getAs[Double]("usd_price") == 12.0)        // coingecko fallback
    assert(bpt.getAs[Double]("earnings_native") == 0.0)   // no rate row → coalesce 0
    assert(bpt.isNullAt(bpt.fieldIndex("price_change_usd"))) // no lead day → null
  }

  test("invTreasuryAtokenPerformanceBase: atoken→reserve pricing, balance>0 filter") {
    val balances = Seq(
      (day(1), "ethereum_v2", "0xausdc", "aUSDC", 1000.0),
      (day(2), "ethereum_v2", "0xausdc", "aUSDC", 1001.0),
      (day(1), "ethereum_v2", "0xadai", "aDAI", 0.0),       // balance 0 → dropped
      (day(1), "fantom_v3", "0xausdc", "aUSDC", 50.0))      // excluded market
      .toDF("block_day", "market", "token", "symbol", "balance")
    val atokens = Seq(
      ("ethereum_v2", "0xausdc", "0xusdc", "USDC"),
      ("ethereum_v2", "0xadai", "0xdai", "DAI"))
      .toDF("market", "atoken", "reserve", "reserve_symbol")
    val rates = Seq((day(1), "ethereum_v2", "aUSDC", 0.0365))
      .toDF("block_day", "market", "symbol", "liquidity_rate")
    val oracle = Seq(
      (day(1), "ethereum_v2", "0xusdc", 1.0),
      (day(2), "ethereum_v2", "0xusdc", 1.0))
      .toDF("block_day", "market", "reserve", "usd_price")
    val got = Protocol.invTreasuryAtokenPerformanceBase(
      balances, rates, oracle, ethPrices, atokens, balanceGroups)
    assert(got.count() == 2) // the two ethereum_v2 aUSDC days
    val r1 = got.filter($"block_day" === day(1)).head()
    assert(r1.getAs[String]("balance_group") == "Stablecoin")
    assert(math.abs(r1.getAs[Double]("earnings_native") - 0.1) < 1e-12) // 1000*0.0365/365
    assert(math.abs(r1.getAs[Double]("balance_usd") - 1000.0) < 1e-12)
    // receipts = 1001 - 0.1 - 1000 = 0.9
    assert(math.abs(r1.getAs[Double]("receipts_native") - 0.9) < 1e-9)
    // eth_price = 1 / 2000
    assert(math.abs(r1.getAs[Double]("eth_price") - 0.0005) < 1e-15)
  }

  test("reserveFactorIncomeByHour: state join on reserve, day-truncated price join") {
    val config = Seq(
      (hour(1, 10), "ethereum_v3", "0xusdc", "aUSDC", 0.10))
      .toDF("block_hour", "market", "reserve", "atoken_symbol", "reserve_factor")
    val state = Seq(
      (hour(1, 10), "ethereum_v3", "0xusdc", 0.05, 730.0, 0.08, 365.0))
      .toDF("block_hour", "market", "reserve",
        "variable_borrow_rate", "variable_debt", "stable_borrow_rate", "stable_debt")
    val cm = Seq(("ethereum_v3", "ethereum", "Ethereum", "Ethereum V3"))
      .toDF("market", "chain", "display_chain", "display_market")
    val prices = Seq(
      (Timestamp.valueOf("2024-01-01 00:00:00"), "0xusdc", "ethereum", 1.0))
      .toDF("block_day", "reserve", "chain", "usd_price")
    val got = Protocol.reserveFactorIncomeByHour(config, state, cm, prices)
    assert(got.count() == 1)
    val r = got.head()
    assert(r.getAs[String]("display_market") == "Ethereum V3")
    // variable: 730 * 0.05 / 365 * 0.1 = 0.01 ; stable: 365 * 0.08 / 365 * 0.1 = 0.008
    assert(math.abs(r.getAs[Double]("variable_debt_protocol_income") - 0.01) < 1e-12)
    assert(math.abs(r.getAs[Double]("stable_debt_protocol_income") - 0.008) < 1e-12)
    assert(math.abs(r.getAs[Double]("daily_income_usd") - 0.018) < 1e-12)
  }

  test("smCostOfCoverByTokenByDay: per-token row-wise ratio (no aggregation)") {
    val sm = Seq(
      (day(1), "stkAAVE", 100.0, 365000.0),
      (day(1), "stkABPT", 73.0, 73000.0))
      .toDF("block_day", "stk_token_symbol", "emission_usd_per_day", "safety_module_cover")
    val got = Protocol.smCostOfCoverByTokenByDay(sm).orderBy("stk_token_symbol").collect()
    assert(got.length == 2)
    assert(math.abs(got(0).getAs[Double]("annual_cost_of_cover_percent") - 0.1) < 1e-12)
    assert(math.abs(got(1).getAs[Double]("annual_cost_of_cover_percent") - 0.365) < 1e-12)
  }

  test("smBalPoolContents + marketStateByDay named entry points") {
    val pool = Seq((day(1), "stkABPT", "BAL", 0.8, 1000.0, "extra"))
      .toDF("block_day", "safety_module_token", "symbol", "weight", "balance", "junk")
    val gotPool = Marts.smBalPoolContents(pool)
    assert(gotPool.columns.toSeq ==
      Seq("block_day", "safety_module_token", "symbol", "weight", "balance"))
    val n = 60.0 * 60 * 24 * 365
    val pd = Seq((day(1), "ethereum_v3", "USDC", 0.05 / n, 0.06 / n, 0.07 / n, 0.08 / n))
      .toDF("block_day", "market", "symbol", "liquidity_rate",
        "variable_borrow_rate", "stable_borrow_rate", "average_stable_rate")
    val gotState = Marts.marketStateByDay(pd)
    assert(gotState.columns.contains("atoken_symbol"))
    assert(gotState.columns.contains("deposit_apy"))
  }
}
