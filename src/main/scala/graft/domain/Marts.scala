package graft.domain

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** The remaining small datamart models — projections, grain unions and
  * rollups of the primitives in Warehouse/Datamart/Protocol, provided as
  * concrete functions so every reference model has a named entry point.
  */
object Marts {

  /** Port of `market_config_by_day.sql`: daily config snapshot with the
    * lineage/meta columns stripped (`select * except(...)`). */
  def marketConfigByDay(protocolDataByDay: DataFrame,
                        metaCols: Seq[String] = Seq(
                          "_dagster_partition_type", "_dagster_partition_key",
                          "_dagster_partition_time", "_dagster_load_timestamp",
                          "load_ts")): DataFrame =
    protocolDataByDay.drop(metaCols: _*)

  /** Port of `market_config_by_time.sql`: hourly + daily config grains on
    * one time axis (the market_state_by_time union pattern over config
    * columns). */
  def marketConfigByTime(configByHour: DataFrame, configByDay: DataFrame): DataFrame = {
    val hourly = configByHour.withColumnRenamed("block_hour", "block_time")
    val daily = configByDay.withColumnRenamed("block_day", "block_time")
    hourly.unionByName(daily, allowMissingColumns = true).distinct()
  }

  /** Port of `token_supply_by_day.sql`: LSD token supply passthrough. */
  def tokenSupplyByDay(lsdTokenSupply: DataFrame): DataFrame =
    lsdTokenSupply.select(col("block_day"), col("block_height"), col("chain"),
      col("address"), col("symbol"), col("decimals"), col("total_supply"))

  /** Port of `lm_incentives.sql` (lm_incentives.sql:1-21): projection of
    * the warehouse incentives rollup (Protocol.incentivesByDay output)
    * with the model's two column renames — the *_borrow_rewards_apr
    * measures surface as *_debt_rewards_apr to match the debt-side
    * naming of their sibling columns. */
  def lmIncentives(incentivesByDay: DataFrame): DataFrame =
    incentivesByDay.select(
      col("block_day"), col("block_height"), col("market"), col("reserve"),
      col("symbol"), col("reward_token_address"), col("reward_token_symbol"),
      col("supply_rewards"), col("supply_rewards_usd"), col("supply_rewards_apr"),
      col("variable_debt_rewards"), col("variable_debt_rewards_usd"),
      col("variable_borrow_rewards_apr").as("variable_debt_rewards_apr"),
      col("stable_debt_rewards"), col("stable_debt_rewards_usd"),
      col("stable_borrow_rewards_apr").as("stable_debt_rewards_apr"))

  /** Port of `grants_dao_token_balances_by_day.sql`: balances of the
    * Grants DAO collectors — a filtered projection of treasury balances. */
  def grantsDaoTokenBalancesByDay(treasuryBalances: DataFrame,
                                  grantsCollectorLabels: Seq[String] = Seq("Grants DAO")
                                 ): DataFrame =
    treasuryBalances.filter(col("collector_label").isin(grantsCollectorLabels: _*))

  /** Port of `sm_staked_tokens_by_day.sql`: native staked amounts. */
  def smStakedTokensByDay(smTotals: DataFrame): DataFrame =
    smTotals.select(col("block_day"), col("stk_token_symbol"),
      col("stk_token_supply").as("staked_tokens"))

  /** Port of `sm_token_emissions_by_day.sql`: per-token emission feed. */
  def smTokenEmissionsByDay(smTotals: DataFrame): DataFrame =
    smTotals.select(col("block_day"), col("stk_token_symbol"),
      col("emission_per_day"), col("reward_token_symbol"))

  /** Port of `sm_token_holders_by_day.sql`: holder counts per token/day. */
  def smTokenHoldersByDay(holders: DataFrame): DataFrame =
    holders.groupBy(col("block_day"), col("token_symbol"))
      .agg(count(col("holder_address")).as("holder_count"))

  /** Port of `aave_token_liquidity_depth_all.sql` / `_latest.sql`: the
    * append-only quote-sweep feed, full and latest-fetch-only (O4). */
  def liquidityDepthAll(liquidityDepth: DataFrame): DataFrame = liquidityDepth

  def liquidityDepthLatest(liquidityDepth: DataFrame): DataFrame =
    Relational.latestOnly(liquidityDepth, "fetch_time")

  /** Port of `liquidity_depth_lsd.sql`: labelled LSD pair depth —
    * concat-label projection. */
  def liquidityDepthLsd(liquidityDepth: DataFrame): DataFrame =
    liquidityDepth.withColumn("pair",
      concat(col("from_token_symbol"), lit("/"), col("to_token_symbol")))

  /** Port of `sm_bal_pool_contents.sql`: Balancer-pool composition
    * passthrough of the lake feed (sm_bal_pool_contents.sql:3-10). */
  def smBalPoolContents(balPoolContents: DataFrame): DataFrame =
    balPoolContents.select(col("block_day"), col("safety_module_token"),
      col("symbol"), col("weight"), col("balance"))

  /** Port of `market_state_by_day.sql`: `Protocol.marketState` at the
    * daily grain (identical derivation to market_state_by_hour — the two
    * models differ only in source grain). */
  def marketStateByDay(protocolDataByDay: DataFrame): DataFrame =
    Protocol.marketState(protocolDataByDay, "block_day")
}
