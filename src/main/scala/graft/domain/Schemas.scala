package graft.domain

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.types._

/** Explicit schemas for the domain tables (the reference keeps schemas
  * implicit — SURVEY.md §1.3 hardens them here). Types follow the
  * canonicalization rules of aave_data/resources/helpers.py:663-693:
  * strings, nullable longs, nullable doubles, UTC timestamps; uint256
  * quantities as DoubleType (helpers.py:228-229).
  */
object Schemas {

  private def s(name: String) = StructField(name, StringType)
  private def d(name: String) = StructField(name, DoubleType)
  private def l(name: String) = StructField(name, LongType)
  private def ts(name: String) = StructField(name, TimestampType)

  /** financials_data_lake.collector_atoken_balances_by_day */
  val atokenBalances: StructType = StructType(Seq(
    s("market"), s("collector"), s("token"), s("symbol"),
    l("block_height"), ts("block_day"), d("balance"), d("scaled_balance")))

  /** financials_data_lake.collector_atoken_transfers_by_day */
  val atokenTransfers: StructType = StructType(Seq(
    s("market"), s("transfers_collector"), s("transfers_transfer_type"),
    s("transfers_from_address"), s("transfers_to_address"),
    s("transfers_contract_address"), s("transfers_contract_symbol"),
    ts("transfers_block_day"), d("transfers_amount_transferred")))

  /** financials_data_lake.v3_accrued_fees_by_day */
  val accruedFees: StructType = StructType(Seq(
    s("market"), s("atoken"), s("atoken_symbol"),
    l("block_height"), ts("block_day"), d("accrued_fees")))

  /** financials_data_lake.v3_minted_to_treasury_by_day */
  val mintedToTreasury: StructType = StructType(Seq(
    s("market"), s("atoken"), ts("block_day"),
    d("minted_to_treasury_amount"), d("minted_amount")))

  /** warehouse.aave_internal_addresses (classification seed) */
  val internalAddresses: StructType = StructType(Seq(
    s("chain"), s("contract_address"), s("internal_external"), s("label")))

  /** market → chain static mapping (financials_config.py market configs) */
  val marketChains: StructType = StructType(Seq(s("market"), s("chain")))

  /** financials_data_lake.market_tokens_by_day */
  val marketTokens: StructType = StructType(Seq(
    s("market"), s("atoken"), s("atoken_symbol"), l("atoken_decimals"),
    s("reserve"), s("symbol"), l("decimals"), s("name"), s("pool"),
    ts("block_day")))

  /** financials_data_lake.block_numbers_by_day */
  val blockNumbers: StructType = StructType(Seq(
    s("market"), s("chain"), ts("block_day"), l("block_height")))

  /** financials_data_lake.aave_oracle_prices_by_day */
  val oraclePrices: StructType = StructType(Seq(
    s("market"), s("reserve"), s("symbol"), ts("block_day"), d("usd_price")))

  /** protocol_data_lake.coingecko_data_by_day (price fallback) */
  val coingeckoPrices: StructType = StructType(Seq(
    s("chain"), s("address"), ts("block_day"), d("price_usd")))

  /** warehouse.user_rewards_by_day */
  val userRewards: StructType = StructType(Seq(
    s("market"), ts("block_day"), s("vault_address"), s("token_address"),
    d("sm_stkAAVE_claims"), d("sm_stkABPT_claims"), d("lm_aave_v2_claims")))

  /** warehouse.non_atoken_measures_by_day */
  val nonAtokenMeasures: StructType = StructType(Seq(
    s("contract_address"), s("chain"), s("market"), s("token"), s("symbol"),
    ts("block_day"), d("balance"),
    d("tokens_in_external"), d("tokens_in_internal"),
    d("tokens_out_external"), d("tokens_out_internal"),
    d("paraswap_fees_claimable")))

  /** financials_data_lake.eth_balances_by_day (native gas-token balances) */
  val ethBalances: StructType = StructType(Seq(
    s("chain"), s("market"), s("collector"), s("gas_token"),
    s("wrapped_gas_token"), ts("block_day"), d("balance")))

  /** financials_data_lake.display_names seed */
  val displayNames: StructType = StructType(Seq(
    s("chain"), s("market"), s("collector"), s("display_chain"), s("display_name")))

  /** warehouse.balance_group_lookup seed */
  val balanceGroups: StructType = StructType(Seq(
    s("market"), s("atoken"), s("reserve"), s("atoken_symbol"),
    s("balance_group"), s("stable_class")))

  /** financials_data_lake.tx_classification seed: measure → type/currency */
  val txClassification: StructType = StructType(Seq(
    s("measure"), s("measure_type"), s("currency")))

  def empty(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
}
