package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.domain.Marts

class MartsSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = Timestamp.valueOf(f"2024-01-0$d%d 00:00:00")
  private def hour(d: Int, h: Int) = Timestamp.valueOf(f"2024-01-0$d%d $h%02d:00:00")

  test("marketConfigByDay strips meta columns") {
    val df = Seq((day(1), "ethereum_v3", 0.8, "k1", "2024-01-01"))
      .toDF("block_day", "market", "ltv", "_dagster_partition_key", "load_ts")
    val got = Marts.marketConfigByDay(df)
    assert(got.columns.toSet == Set("block_day", "market", "ltv"))
  }

  test("lmIncentives projects the 16 model columns with the two apr renames") {
    // fixture shaped like Protocol.incentivesByDay output
    val wh = Seq((day(1), 100L, "polygon_v3", "0xres", "aUSDC", "MATIC", "0xrw",
      0.1, 0.2, 0.3, 864.0, 691.2, 0.4, 0.0, 0.0, 0.5))
      .toDF("block_day", "block_height", "market", "reserve", "symbol",
        "reward_token_symbol", "reward_token_address",
        "supply_rewards_apr", "variable_borrow_rewards_apr", "stable_borrow_rewards_apr",
        "supply_rewards", "supply_rewards_usd",
        "variable_debt_rewards", "variable_debt_rewards_usd",
        "stable_debt_rewards", "stable_debt_rewards_usd")
    val got = Marts.lmIncentives(wh)
    // exact column list of lm_incentives.sql:3-19, in model order
    assert(got.columns.toSeq == Seq(
      "block_day", "block_height", "market", "reserve", "symbol",
      "reward_token_address", "reward_token_symbol",
      "supply_rewards", "supply_rewards_usd", "supply_rewards_apr",
      "variable_debt_rewards", "variable_debt_rewards_usd", "variable_debt_rewards_apr",
      "stable_debt_rewards", "stable_debt_rewards_usd", "stable_debt_rewards_apr"))
    val r = got.head()
    assert(r.getAs[Double]("variable_debt_rewards_apr") == 0.2)
    assert(r.getAs[Double]("stable_debt_rewards_apr") == 0.3)
  }

  test("marketConfigByTime unions grains with missing columns padded") {
    val hourly = Seq((hour(1, 5), "m", 0.8)).toDF("block_hour", "market", "ltv")
    val daily = Seq((day(1), "m", 0.8, "cat")).toDF("block_day", "market", "ltv", "emode")
    val got = Marts.marketConfigByTime(hourly, daily)
    assert(got.count() == 2)
    assert(got.columns.contains("block_time") && got.columns.contains("emode"))
  }

  test("smTokenHoldersByDay counts holders") {
    val holders = Seq((day(1), "stkAAVE", "0xa"), (day(1), "stkAAVE", "0xb"))
      .toDF("block_day", "token_symbol", "holder_address")
    assert(Marts.smTokenHoldersByDay(holders).head().getAs[Long]("holder_count") == 2L)
  }

  test("liquidityDepthLatest keeps only the newest fetch") {
    val liq = Seq(
      (Timestamp.valueOf("2024-01-01 10:00:00"), 1e6, "AAVE", "USDC"),
      (Timestamp.valueOf("2024-01-01 22:00:00"), 2e6, "AAVE", "USDC"))
      .toDF("fetch_time", "from_amount_usd", "from_token_symbol", "to_token_symbol")
    val got = Marts.liquidityDepthLatest(liq)
    assert(got.count() == 1 && got.head().getAs[Double]("from_amount_usd") == 2e6)
    assert(Marts.liquidityDepthLsd(liq).head().getAs[String]("pair") == "AAVE/USDC")
  }

  test("grants filter + sm projections") {
    val bal = Seq((day(1), "Grants DAO", 5.0), (day(1), "Collector", 9.0))
      .toDF("block_day", "collector_label", "value_usd")
    assert(Marts.grantsDaoTokenBalancesByDay(bal).count() == 1)
    val smTotals = Seq((day(1), "stkAAVE", 3e6, 1000.0, "AAVE"))
      .toDF("block_day", "stk_token_symbol", "stk_token_supply",
        "emission_per_day", "reward_token_symbol")
    assert(Marts.smStakedTokensByDay(smTotals).head()
      .getAs[Double]("staked_tokens") == 3e6)
    assert(Marts.smTokenEmissionsByDay(smTotals).head()
      .getAs[Double]("emission_per_day") == 1000.0)
  }
}
