package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Datamart layer: the Spark-SQL/DataFrame port of the reference's dbt
  * models (the 62 SQL files under aave_dbt/models/datamart/), re-expressed
  * as composable transforms. The flagship chain is
  * `allFinancials` → `allTreasuryBalances` → `treasuryValueByChain` /
  * `treasuryTotals` / `allRevenue` (SURVEY.md §7.2 slice).
  */
object Datamart {

  /** The V3 liquidation double-transfer adjustment eras
    * (all_financials.sql:154-299). The reference hardcodes four UNION
    * branches of (market-set × date-range); encoded here as one rule table
    * joined on market — SURVEY §7.4(3). `liq_adjust_until` null = adjust
    * forever (markets that never deployed the fix).
    */
  val liqAdjustEras: Seq[(String, Option[String])] = Seq(
    "arbitrum_v3" -> Some("2023-05-06"),
    "avax_v3"     -> Some("2023-05-06"),
    "optimism_v3" -> Some("2023-05-06"),
    "polygon_v3"  -> Some("2023-05-06"),
    "fantom_v3"   -> None,
    "harmony_v3"  -> None)

  /** Default measure classification (the tx_classification seed,
    * data_lake.py:1499-1536): measure → (measure_type, currency). Callers
    * with their own seed table can pass it to `allFinancials` instead. */
  def defaultTxClassification(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val base = Seq(
      ("start_balance", "balance"), ("end_balance", "balance"),
      ("start_accrued_fees", "balance"), ("end_accrued_fees", "balance"),
      ("tokens_in_internal", "internal transfer"),
      ("tokens_in_external_adjust", "external transfer"),
      ("tokens_out_external", "external transfer"),
      ("tokens_out_internal", "internal transfer"),
      ("protocol_fees_received", "income"),
      ("protocol_fees_accrued", "income"),
      ("atoken_interest", "income"),
      ("sm_stkAAVE_claims", "expense"), ("sm_stkABPT_claims", "expense"),
      ("lm_aave_v2_claims", "expense"),
      ("start_paraswap_fees_claimable", "balance"),
      ("end_paraswap_fees_claimable", "balance"),
      ("ecosystem_reserve_spend", "expense"),
      ("treasury_spend", "expense"),
      ("price_change", "price change"))
    (base.map { case (m, t) => (m + "_usd", t, "usd") } ++
      base.filter(_._1 != "price_change").map { case (m, t) => (m, t, "native") })
      .toDF("measure", "measure_type", "currency")
  }

  private val entityKey = Seq("collector", "chain", "market", "token", "symbol")
  private def entityWindow = Window
    .partitionBy(entityKey.map(col): _*)
    .orderBy(col("block_day"))

  /** Inputs to `allFinancials`; optional feeds default to empty frames with
    * the declared schema. */
  final case class FinancialsInputs(
      atokenMeasures: DataFrame,
      nonAtokenMeasures: DataFrame,
      ethBalances: DataFrame,
      aaveAtokens: DataFrame,
      oraclePrices: DataFrame,
      coingeckoPrices: DataFrame,
      userRewards: DataFrame,
      txClassification: DataFrame,
      displayNames: DataFrame,
      internalAddresses: DataFrame,
      balanceGroups: DataFrame)

  object FinancialsInputs {
    /** All-optional constructor: only the three measure feeds are required;
      * dims default to empty (→ null-labelled rows are dropped by the final
      * classification filter exactly as in the reference). */
    def withDefaults(spark: SparkSession,
                     atokenMeasures: DataFrame,
                     nonAtokenMeasures: Option[DataFrame] = None,
                     ethBalances: Option[DataFrame] = None,
                     aaveAtokens: Option[DataFrame] = None,
                     oraclePrices: Option[DataFrame] = None,
                     coingeckoPrices: Option[DataFrame] = None,
                     userRewards: Option[DataFrame] = None,
                     txClassification: Option[DataFrame] = None,
                     displayNames: Option[DataFrame] = None,
                     internalAddresses: Option[DataFrame] = None,
                     balanceGroups: Option[DataFrame] = None): FinancialsInputs = {
      def e(schema: org.apache.spark.sql.types.StructType) = Schemas.empty(spark, schema)
      FinancialsInputs(
        atokenMeasures,
        nonAtokenMeasures.getOrElse(e(Schemas.nonAtokenMeasures)),
        ethBalances.getOrElse(e(Schemas.ethBalances)),
        aaveAtokens.getOrElse(e(StructTypeOf.aaveAtokens)),
        oraclePrices.getOrElse(e(Schemas.oraclePrices)),
        coingeckoPrices.getOrElse(e(Schemas.coingeckoPrices)),
        userRewards.getOrElse(e(Schemas.userRewards)),
        txClassification.getOrElse(defaultTxClassification(spark)),
        displayNames.getOrElse(e(Schemas.displayNames)),
        internalAddresses.getOrElse(e(Schemas.internalAddresses)),
        balanceGroups.getOrElse(e(Schemas.balanceGroups)))
    }
  }

  private object StructTypeOf {
    import org.apache.spark.sql.types._
    val aaveAtokens: StructType = StructType(Seq(
      StructField("atoken", StringType), StructField("atoken_symbol", StringType),
      StructField("atoken_decimals", LongType), StructField("reserve", StringType),
      StructField("reserve_symbol", StringType), StructField("reserve_decimals", LongType),
      StructField("reserve_name", StringType), StructField("market", StringType),
      StructField("chain", StringType), StructField("lending_pool", StringType)))
  }

  /** The port of `all_financials.sql` (449 lines, 6-CTE chain): one long
    * row per (collector, chain, market, token, day, measure) with USD and
    * native values for 37 measures.
    *
    * Plan shape (100 TB posture): the fact side shuffles ONCE on the entity
    * key for all eight lead-windows (identical window spec → single Window
    * exec), the unpivot is an Expand (no shuffle), and every dim join is a
    * broadcast. Era logic is a broadcast rule-table join, not a 4-way union
    * re-scan of the fact table like the reference.
    */
  def allFinancials(in: FinancialsInputs): DataFrame = {
    val spark = in.atokenMeasures.sparkSession

    // -- CTE gas_token_markets + token_measures: 3-way padded union --------
    val atok = in.atokenMeasures.select(
      col("collector"), col("chain"), col("market"), col("token"), col("symbol"),
      col("block_day"), col("balance"), col("scaled_balance"), col("accrued_fees"),
      col("tokens_in_external"), col("tokens_in_internal"),
      col("tokens_out_external"), col("tokens_out_internal"),
      col("minted_to_treasury_amount"), col("minted_amount"),
      lit(0.0).as("paraswap_fees_claimable"))
    val nonAtok = in.nonAtokenMeasures.select(
      col("contract_address").as("collector"), col("chain"), col("market"),
      col("token"), col("symbol"), col("block_day"), col("balance"),
      lit(0.0).as("scaled_balance"), lit(0.0).as("accrued_fees"),
      col("tokens_in_external"), col("tokens_in_internal"),
      col("tokens_out_external"), col("tokens_out_internal"),
      lit(0.0).as("minted_to_treasury_amount"), lit(0.0).as("minted_amount"),
      col("paraswap_fees_claimable"))
    val gasTokenMarkets = in.ethBalances
      .filter((col("chain") === "ethereum" && col("market").isin("ethereum_v1", "ethereum_v2"))
        || col("chain") =!= "ethereum")
      .select(col("market"), col("chain"), col("collector")).distinct()
    val gas = in.ethBalances.as("e")
      .join(broadcast(gasTokenMarkets).as("m"),
        col("e.chain") === col("m.chain") && col("e.collector") === col("m.collector"), "left")
      .select(
        col("e.collector"), col("e.chain"), col("m.market").as("market"),
        col("e.wrapped_gas_token").as("token"), col("e.gas_token").as("symbol"),
        col("e.block_day"), col("e.balance"),
        lit(0.0).as("scaled_balance"), lit(0.0).as("accrued_fees"),
        lit(0.0).as("tokens_in_external"), lit(0.0).as("tokens_in_internal"),
        lit(0.0).as("tokens_out_external"), lit(0.0).as("tokens_out_internal"),
        lit(0.0).as("minted_to_treasury_amount"), lit(0.0).as("minted_amount"),
        lit(0.0).as("paraswap_fees_claimable"))
      .distinct()
    val tokenMeasures = atok.unionByName(nonAtok).unionByName(gas)

    // -- CTE token_measures_reserves: underlying reserve for pricing -------
    val atokensDim = broadcast(in.aaveAtokens
      .select(col("atoken"), col("chain").as("a_chain"),
        col("reserve"), col("reserve_symbol")))
    val withReserve = tokenMeasures
      .join(atokensDim,
        tokenMeasures("token") === atokensDim("atoken") &&
          tokenMeasures("chain") === atokensDim("a_chain"), "left")
      .withColumn("underlying_reserve", coalesce(col("reserve"), col("token")))
      .withColumn("underlying_reserve_symbol", coalesce(col("reserve_symbol"), col("symbol")))
      .drop("atoken", "a_chain", "reserve", "reserve_symbol")

    // -- CTE balances_prices: price joins + the eight lead-windows ---------
    val prices = broadcast(in.oraclePrices
      .select(col("market").as("p_market"), col("reserve").as("p_reserve"),
        col("block_day").as("p_day"), col("usd_price")))
    val cg = broadcast(in.coingeckoPrices
      .select(col("chain").as("c_chain"), col("address").as("c_address"),
        col("block_day").as("c_day"), col("price_usd")))
    val rewards = broadcast(in.userRewards
      .select(col("market").as("r_market"), col("block_day").as("r_day"),
        col("vault_address"), col("token_address"),
        col("sm_stkAAVE_claims"), col("sm_stkABPT_claims"), col("lm_aave_v2_claims")))

    val w = entityWindow
    val priced = withReserve
      .join(prices,
        col("underlying_reserve") === col("p_reserve") &&
          col("block_day") === col("p_day") && col("market") === col("p_market"), "left")
      .join(cg,
        col("underlying_reserve") === col("c_address") &&
          col("block_day") === col("c_day") && col("chain") === col("c_chain"), "left")
      .join(rewards,
        col("market") === col("r_market") && col("block_day") === col("r_day") &&
          col("collector") === col("vault_address") && col("token") === col("token_address"), "left")
      .withColumn("usd_price_resolved", coalesce(col("usd_price"), col("price_usd")))
      .select(
        col("collector"), col("chain"), col("market"), col("token"), col("symbol"),
        col("underlying_reserve"), col("underlying_reserve_symbol"), col("block_day"),
        col("balance").as("start_balance"),
        lead(col("balance"), 1).over(w).as("end_balance"),
        col("scaled_balance"),
        col("accrued_fees").as("start_accrued_fees"),
        lead(col("accrued_fees"), 1).over(w).as("end_accrued_fees"),
        col("tokens_in_external"), col("tokens_in_internal"),
        col("tokens_out_external"), col("tokens_out_internal"),
        col("minted_to_treasury_amount"), col("minted_amount"),
        col("usd_price_resolved").as("start_usd_price"),
        lead(col("usd_price_resolved"), 1).over(w).as("end_usd_price"),
        coalesce(col("sm_stkAAVE_claims"), lit(0.0)).as("sm_stkAAVE_claims"),
        coalesce(col("sm_stkABPT_claims"), lit(0.0)).as("sm_stkABPT_claims"),
        coalesce(col("lm_aave_v2_claims"), lit(0.0)).as("lm_aave_v2_claims"),
        col("paraswap_fees_claimable").as("start_paraswap_fees_claimable"),
        lead(col("paraswap_fees_claimable"), 1).over(w).as("end_paraswap_fees_claimable"))

    // -- CTE token_level_calcs_staging: era rule + liq_adjust --------------
    // rows with no next day are dropped (all_financials.sql:191-192 —
    // "the newest day vanishes until the next day lands", SURVEY §7.4(2))
    import spark.implicits._
    val eras = broadcast(liqAdjustEras
      .toDF("era_market", "liq_adjust_until")
      .withColumn("liq_adjust_until", col("liq_adjust_until").cast("timestamp")))
    val staged = priced
      .filter(col("end_balance").isNotNull)
      .join(eras, col("market") === col("era_market"), "left")
      .withColumn("liq_adjust",
        when(col("era_market").isNotNull &&
             (col("liq_adjust_until").isNull || col("block_day") <= col("liq_adjust_until")),
          when(col("scaled_balance") === 0,
            (col("tokens_in_external") + col("tokens_in_internal") - col("minted_amount")) / lit(2.0))
          .otherwise(
            (col("tokens_in_external") + col("tokens_in_internal") - col("minted_amount")) /
              (lit(1.0) + col("start_balance") / col("scaled_balance"))))
        .otherwise(lit(0.0)))
      .drop("era_market", "liq_adjust_until")

    // -- CTE token_level_calcs: symbol patches + derived measures ----------
    val EcosystemReserve = "0x25f2226b597e8f9514b3f68f00f494cf4f286491"
    val V2IncentivesController = "0xd784927ff2f95ba542bfc824c8a8a98f3495f6b5"
    val aPaxToken = "0x2e8f4bdbe3d47d7d7de490437aea9915d930f1a3"
    val paxReserve = "0x8e870d67f660d95d5be530380d0ec0bd388289e1"

    val feesAccrued = col("end_accrued_fees") - col("start_accrued_fees") +
      col("minted_to_treasury_amount") +
      col("end_paraswap_fees_claimable") - col("start_paraswap_fees_claimable")
    val tokensInExternalAdjust = col("tokens_in_external") - col("liq_adjust") -
      col("minted_amount") + col("minted_to_treasury_amount")
    val feesReceived = col("tokens_in_external") - col("liq_adjust") - col("minted_amount")
    val ecosystemSpend = when(
      col("collector") === EcosystemReserve && col("market") === "ethereum_v2",
      col("tokens_out_external") - (col("sm_stkAAVE_claims") + col("sm_stkABPT_claims")))
      .otherwise(lit(0.0))
    val treasurySpend = when(
      !(col("collector").isin(V2IncentivesController, EcosystemReserve) &&
        col("chain") === "ethereum"),
      col("tokens_out_external")).otherwise(lit(0.0))
    val interest = col("end_balance") -
      (col("tokens_in_external") + col("tokens_in_internal") - col("liq_adjust") -
        col("minted_amount") + col("minted_to_treasury_amount")) +
      col("tokens_out_external") + col("tokens_out_internal") - col("start_balance")

    val calcs = staged
      .withColumn("symbol",
        when(col("token") === aPaxToken, "aUSDP").otherwise(col("symbol")))
      .withColumn("underlying_reserve_symbol",
        when(col("token") === paxReserve, "aUSDP").otherwise(col("underlying_reserve_symbol")))
      .withColumn("protocol_fees_accrued", feesAccrued)
      .withColumn("tokens_in_external_adjust", tokensInExternalAdjust)
      .withColumn("protocol_fees_received", feesReceived)
      .withColumn("ecosystem_reserve_spend", ecosystemSpend)
      .withColumn("treasury_spend", treasurySpend)
      .withColumn("atoken_interest", interest)
      .withColumn("price_change_usd",
        (col("end_balance") + col("end_accrued_fees")) *
          (col("end_usd_price") - col("start_usd_price")))
      .withColumn("start_balance_usd", col("start_balance") * col("start_usd_price"))
      .withColumn("end_balance_usd", col("end_balance") * col("end_usd_price"))
      .withColumn("start_accrued_fees_usd", col("start_accrued_fees") * col("start_usd_price"))
      .withColumn("end_accrued_fees_usd", col("end_accrued_fees") * col("end_usd_price"))
      .withColumn("tokens_in_external_usd", col("tokens_in_external") * col("start_usd_price"))
      .withColumn("tokens_in_internal_usd", col("tokens_in_internal") * col("start_usd_price"))
      .withColumn("tokens_out_external_usd", col("tokens_out_external") * col("start_usd_price"))
      .withColumn("tokens_out_internal_usd", col("tokens_out_internal") * col("start_usd_price"))
      .withColumn("tokens_in_external_adjust_usd", col("tokens_in_external_adjust") * col("start_usd_price"))
      .withColumn("protocol_fees_received_usd", col("protocol_fees_received") * col("start_usd_price"))
      .withColumn("atoken_interest_usd", col("atoken_interest") * col("start_usd_price"))
      .withColumn("protocol_fees_accrued_usd", col("protocol_fees_accrued") * col("start_usd_price"))
      .withColumn("minted_to_treasury_amount_usd", col("minted_to_treasury_amount") * col("start_usd_price"))
      .withColumn("sm_stkAAVE_claims_usd", col("sm_stkAAVE_claims") * col("start_usd_price"))
      .withColumn("sm_stkABPT_claims_usd", col("sm_stkABPT_claims") * col("start_usd_price"))
      .withColumn("lm_aave_v2_claims_usd", col("lm_aave_v2_claims") * col("start_usd_price"))
      .withColumn("start_paraswap_fees_claimable_usd", col("start_paraswap_fees_claimable") * col("start_usd_price"))
      .withColumn("end_paraswap_fees_claimable_usd", col("end_paraswap_fees_claimable") * col("end_usd_price"))
      .withColumn("ecosystem_reserve_spend_usd", col("ecosystem_reserve_spend") * col("start_usd_price"))
      .withColumn("treasury_spend_usd", col("treasury_spend") * col("start_usd_price"))

    // -- CTE long_format: 37-measure unpivot -------------------------------
    val usdMeasures = Seq(
      "start_balance_usd", "end_balance_usd", "start_accrued_fees_usd",
      "end_accrued_fees_usd", "tokens_in_internal_usd", "tokens_in_external_adjust_usd",
      "tokens_out_external_usd", "tokens_out_internal_usd", "protocol_fees_received_usd",
      "protocol_fees_accrued_usd", "atoken_interest_usd", "sm_stkAAVE_claims_usd",
      "sm_stkABPT_claims_usd", "lm_aave_v2_claims_usd", "start_paraswap_fees_claimable_usd",
      "end_paraswap_fees_claimable_usd", "ecosystem_reserve_spend_usd",
      "treasury_spend_usd", "price_change_usd")
    val nativeMeasures = Seq(
      "start_balance", "end_balance", "start_accrued_fees", "end_accrued_fees",
      "tokens_in_internal", "tokens_in_external_adjust", "tokens_out_external",
      "tokens_out_internal", "protocol_fees_received", "protocol_fees_accrued",
      "atoken_interest", "sm_stkAAVE_claims", "sm_stkABPT_claims", "lm_aave_v2_claims",
      "start_paraswap_fees_claimable", "end_paraswap_fees_claimable",
      "ecosystem_reserve_spend", "treasury_spend")
    val idCols = Seq("collector", "chain", "market", "token", "symbol",
      "underlying_reserve", "underlying_reserve_symbol", "block_day")
    // dropNulls: BigQuery UNPIVOT defaults to EXCLUDE NULLS
    // (all_financials.sql:422-423) — the lead-window end_* measures are
    // null on each partition's last day and the reference omits those
    // measure rows entirely.
    val long = Relational.melt(
      calcs.select((idCols ++ usdMeasures ++ nativeMeasures).map(col): _*),
      idCols, usdMeasures ++ nativeMeasures, dropNulls = true)

    // -- final dim joins + classification filter ---------------------------
    val txc = broadcast(in.txClassification)
    val dn = broadcast(in.displayNames
      .select(col("collector").as("d_collector"), col("chain").as("d_chain"),
        col("market").as("d_market"), col("display_chain"), col("display_name")))
    val labels = broadcast(in.internalAddresses
      .select(col("contract_address").as("l_collector"), col("chain").as("l_chain"),
        col("label").as("collector_label")))
    val bg = broadcast(in.balanceGroups
      .select(col("market").as("b_market"), col("atoken").as("b_atoken"),
        col("reserve").as("b_reserve"), col("atoken_symbol").as("b_symbol"),
        col("balance_group"), col("stable_class")))

    long
      .join(txc, Seq("measure"), "left")
      .join(dn, col("collector") === col("d_collector") &&
        col("chain") === col("d_chain") && col("market") === col("d_market"), "left")
      .join(labels, col("collector") === col("l_collector") &&
        col("chain") === col("l_chain"), "left")
      .join(bg, col("market") === col("b_market") && col("token") === col("b_atoken") &&
        col("underlying_reserve") === col("b_reserve") &&
        col("symbol") === col("b_symbol"), "left")
      .filter(col("measure_type").isNotNull)
      .drop("d_collector", "d_chain", "d_market", "l_collector", "l_chain",
        "b_market", "b_atoken", "b_reserve", "b_symbol")
  }

  /** Port of `all_treasury_balances.sql` (core branch): end-of-day USD and
    * native balance measures side by side. The Paraswap-legacy append branch
    * needs its own feed; pass `paraswapLegacy = Some(...)` to include it. */
  def allTreasuryBalances(financials: DataFrame): DataFrame = {
    val usd = financials
      .filter(col("measure").isin("end_balance_usd", "end_accrued_fees_usd",
          "end_paraswap_fees_claimable_usd") &&
        (col("collector_label").isNull ||
          col("collector_label") =!= "Ethereum V2 Incentives Controller") &&
        col("currency") === "usd")
      .select(col("block_day"), col("chain"), col("display_chain"), col("market"),
        col("display_name").as("display_market"), col("collector"), col("collector_label"),
        col("token"), col("symbol"), col("underlying_reserve"), col("underlying_reserve_symbol"),
        regexp_replace(col("measure"), "_usd$", "").as("measure"),
        col("measure_type"), col("balance_group"), col("stable_class"),
        col("value").as("value_usd"))
    val native = financials
      .filter(col("measure").isin("end_balance", "end_accrued_fees",
          "end_paraswap_fees_claimable") &&
        (col("collector_label").isNull ||
          col("collector_label") =!= "Ethereum V2 Incentives Controller") &&
        col("currency") === "native")
      .select(col("block_day").as("n_day"), col("market").as("n_market"),
        col("collector").as("n_collector"), col("token").as("n_token"),
        col("measure").as("n_measure"), col("value").as("value_native"))
    usd.join(native,
      col("block_day") === col("n_day") && col("market") === col("n_market") &&
        col("collector") === col("n_collector") && col("token") === col("n_token") &&
        col("measure") === col("n_measure"), "left")
      .drop("n_day", "n_market", "n_collector", "n_token", "n_measure")
  }

  /** Port of `treasury_value_by_chain.sql`: per-day/per-chain totals with
    * stablecoin and ex-AAVE breakdowns (end-of-day → start-of-day shift). */
  def treasuryValueByChain(balances: DataFrame): DataFrame = {
    def rollup(df: DataFrame, name: String): DataFrame =
      df.groupBy(date_add(col("block_day").cast("date"), 1).as("block_day"), col("display_chain"))
        .agg(sum(col("value_usd")).as(name))
    val totals = rollup(balances, "value_usd")
    val stables = rollup(balances.filter(col("stable_class") === "stablecoin"),
      "stablecoin_value_usd")
    val exAave = rollup(balances.filter(col("symbol") =!= "AAVE"), "ex_aave_value_usd")
    totals
      .join(stables, Seq("block_day", "display_chain"), "left")
      .join(exAave, Seq("block_day", "display_chain"), "left")
      .select(col("block_day"), col("display_chain"),
        coalesce(col("value_usd"), lit(0.0)).as("value_usd"),
        coalesce(col("stablecoin_value_usd"), lit(0.0)).as("stablecoin_value_usd"),
        coalesce(col("ex_aave_value_usd"), lit(0.0)).as("ex_aave_value_usd"))
  }

  /** Port of `treasury_totals.sql`: three global measures per day. */
  def treasuryTotals(balances: DataFrame): DataFrame = {
    def total(df: DataFrame, name: String): DataFrame =
      df.groupBy(date_add(col("block_day").cast("date"), 1).as("block_day"))
        .agg(sum(col("value_usd")).as("value_usd"))
        .withColumn("measure", lit(name))
    total(balances, "total_treasury_value")
      .unionByName(total(balances.filter(col("underlying_reserve_symbol") =!= "AAVE"),
        "total_treasury_value_ex_aave"))
      .unionByName(total(balances.filter(col("stable_class") === "stablecoin"),
        "total_stablecoin_value"))
      .select(col("block_day"), col("measure"), col("value_usd"))
  }

  /** Port of `treasury_value_by_asset.sql`: per-held-token treasury value
    * (end-of-day balances shifted to start-of-day). */
  def treasuryValueByAsset(balances: DataFrame): DataFrame =
    balances
      .groupBy(
        date_add(col("block_day").cast("date"), 1).as("block_day"),
        col("display_chain"), col("display_market"), col("collector_label"),
        col("token").as("token_held_address"), col("symbol").as("token_held_symbol"),
        col("underlying_reserve"), col("underlying_reserve_symbol"))
      .agg(sum(col("value_usd")).as("value_usd"),
        sum(col("value_native")).as("value_native"))

  /** Port of the `impact_proposal_*` report family, generalized (the
    * reference hardcodes collector/token/window per proposal — e.g.
    * impact_proposal_87.sql): sum purchases over the proposal window,
    * average purchase price as a ratio of sums, mark to the latest price.
    */
  def proposalImpact(measures: DataFrame, tokenPrices: DataFrame,
                     collector: String, token: String, chain: String,
                     windowStart: String, windowEnd: String): DataFrame = {
    val priced = measures
      .filter(col("contract_address") === collector && col("token") === token &&
        col("tokens_in_external") > 0 &&
        col("block_day").between(lit(windowStart).cast("timestamp"),
          lit(windowEnd).cast("timestamp")))
      .join(tokenPrices.filter(col("chain") === chain)
        .select(col("block_day"), col("reserve").as("token"), col("usd_price")),
        Seq("block_day", "token"), "inner")
      .withColumn("purchase_amount_usd", col("tokens_in_external") * col("usd_price"))
    val purchase = priced
      .groupBy(col("token").as("token_address"), col("symbol"))
      .agg(sum(col("tokens_in_external")).as("purchase_amount"),
        sum(col("purchase_amount_usd")).as("purchase_amount_usd"))
      .withColumn("av_purchase_price",
        col("purchase_amount_usd") / col("purchase_amount"))
    val current = Relational.latestOnly(
        tokenPrices.filter(col("reserve") === token && col("chain") === chain), "block_day")
      .select(col("block_day"), col("reserve"), col("usd_price").as("current_price"))
    purchase
      .join(broadcast(current), col("token_address") === col("reserve"), "left")
      .drop("reserve")
      .withColumn("current_value", col("purchase_amount") * col("current_price"))
      .withColumn("net_value_change", col("current_value") - col("purchase_amount_usd"))
  }

  /** Port of the market-impact `impact_proposal_*` family (131, 150, 151,
    * 158, 163, 167, 168, 172, 175 and — with `rewardFeeds` — 130): market
    * state for the proposal's reserves over the 6 months before the
    * proposal, left-joined to revenue (native + USD legs of all_revenue)
    * and oracle prices, derived TVL/deposit/borrow measures unpivoted to
    * long form. `rewardFeeds` adds the 130-style per-reward-token
    * emissions/APR columns; `aggregateMeasures` appends the 163-style
    * cross-reserve 'aggregate' rollup rows for the named measures.
    */
  def proposalMarketImpact(marketState: DataFrame, allRevenue: DataFrame,
                           oraclePrices: DataFrame, market: String,
                           reserves: Seq[String], revenueTokens: Seq[String],
                           proposalDate: String,
                           rewardFeeds: Seq[(String, DataFrame)] = Nil,
                           aggregateMeasures: Seq[String] = Nil): DataFrame = {
    def revenueLeg(currency: String, alias: String) = allRevenue
      .filter(col("currency") === currency && col("token").isin(revenueTokens: _*))
      .select(col("block_day").as(s"${alias}_day"), col("market").as(s"${alias}_market"),
        col("underlying_reserve").as(s"${alias}_reserve"), col("revenue").as(alias))
    val n = revenueLeg("native", "revenue")
    val u = revenueLeg("usd", "revenue_usd")
    val p = oraclePrices.select(col("block_day").as("p_day"), col("market").as("p_market"),
      col("reserve").as("p_reserve"), col("usd_price"))
    val base = marketState
      .filter(col("market") === market && col("reserve").isin(reserves: _*) &&
        col("block_day").cast("date") > add_months(lit(proposalDate).cast("date"), -6))
      .join(n, col("block_day") === col("revenue_day") &&
        col("market") === col("revenue_market") &&
        col("reserve") === col("revenue_reserve"), "left")
      .join(u, col("block_day") === col("revenue_usd_day") &&
        col("market") === col("revenue_usd_market") &&
        col("reserve") === col("revenue_usd_reserve"), "left")
      .join(p, col("block_day") === col("p_day") && col("market") === col("p_market") &&
        col("reserve") === col("p_reserve"), "left")
      .withColumn("tvl", col("atoken_supply") - col("variable_debt") - col("stable_debt"))
      .withColumn("tvl_usd", col("tvl") * col("usd_price"))
      .withColumn("deposits", col("atoken_supply"))
      .withColumn("deposits_usd", col("deposits") * col("usd_price"))
      .withColumn("borrows", col("variable_debt") + col("stable_debt"))
      .withColumn("borrows_usd", col("borrows") * col("usd_price"))
    val baseMeasures = Seq("tvl", "tvl_usd", "deposits", "deposits_usd",
      "borrows", "borrows_usd", "revenue", "revenue_usd", "usd_price")
    val (wide, measures) =
      if (rewardFeeds.isEmpty) (base, baseMeasures)
      else {
        val joined = rewardFeeds.foldLeft(base) { case (acc, (sym, feed)) =>
          val f = feed
            .filter(col("market") === market && col("reward_token_symbol") === sym)
            .select(col("block_day").as(s"${sym}_day"), col("market").as(s"${sym}_market"),
              col("reserve").as(s"${sym}_reserve"),
              (col("supply_rewards") + col("variable_debt_rewards") +
                col("stable_debt_rewards")).as(s"${sym}_emissions_paid"),
              col("supply_rewards_apr").as(s"${sym}_supply_apr"),
              col("variable_borrow_rewards_apr").as(s"${sym}_borrow_apr"))
          acc.join(f, col("block_day") === col(s"${sym}_day") &&
            col("market") === col(s"${sym}_market") &&
            col("reserve") === col(s"${sym}_reserve"), "left")
            .drop(s"${sym}_day", s"${sym}_market", s"${sym}_reserve")
        }
        val supplyApr = rewardFeeds.map { case (sym, _) =>
          coalesce(col(s"${sym}_supply_apr"), lit(0.0)) }.reduce(_ + _)
        val borrowApr = rewardFeeds.map { case (sym, _) =>
          coalesce(col(s"${sym}_borrow_apr"), lit(0.0)) }.reduce(_ + _)
        val withAprs = joined
          .withColumn("deposit_apy", col("liquidity_rate"))
          .withColumn("borrow_apy", col("variable_borrow_rate"))
          .withColumn("deposit_rewards_apr", supplyApr)
          .withColumn("variable_borrow_rewards_apr", borrowApr)
          .withColumn("deposit_apy_inc_rewards", col("liquidity_rate") + supplyApr)
          .withColumn("variable_borrow_apy_inc_rewards",
            col("variable_borrow_rate") + borrowApr)
        val emCols = rewardFeeds.map { case (sym, _) => s"${sym}_emissions_paid" }
        val filled = emCols.foldLeft(withAprs)((d, c) =>
          d.withColumn(c, coalesce(col(c), lit(0.0))))
        (filled, baseMeasures ++ Seq("deposit_apy", "borrow_apy",
          "deposit_rewards_apr", "variable_borrow_rewards_apr",
          "deposit_apy_inc_rewards", "variable_borrow_apy_inc_rewards") ++ emCols)
      }
    val idCols = Seq("block_day", "market", "reserve", "atoken_symbol")
    // dropNulls: the reference models use BigQuery UNPIVOT whose default is
    // EXCLUDE NULLS — a reserve-day with no revenue row must not emit
    // revenue/revenue_usd rows with null value.
    val long = Relational.melt(
      wide.select((idCols ++ measures).map(col): _*),
      idCols, measures, nameCol = "measure", valueCol = "value", dropNulls = true)
    if (aggregateMeasures.isEmpty) long
    else long.unionByName(long
      .filter(col("measure").isin(aggregateMeasures: _*))
      .groupBy(col("block_day"), col("market"), col("measure"))
      .agg(sum(col("value")).as("value"))
      .withColumn("reserve", lit("aggregate"))
      .withColumn("atoken_symbol", lit("aggregate"))
      .select((idCols :+ "measure" :+ "value").map(col): _*))
  }

  /** Port of `stablecoin_totals.sql`: stablecoin treasury value per
    * balance group per day. */
  def stablecoinTotals(balances: DataFrame): DataFrame =
    balances
      .filter(col("stable_class") === "stablecoin")
      .groupBy(col("block_day"), col("balance_group").as("stablecoin_group"))
      .agg(sum(col("value_usd")).as("value_usd"))

  private def shiftedRollup(balances: DataFrame, extraKeys: Seq[String]): DataFrame =
    balances.groupBy(
        (date_add(col("block_day").cast("date"), 1).as("block_day") +:
          extraKeys.map(col)): _*)
      .agg(sum(col("value_usd")).as("value_usd"),
        sum(col("value_native")).as("value_native"))

  /** Port of `treasury_value_by_balance_group.sql`. */
  def treasuryValueByBalanceGroup(balances: DataFrame): DataFrame =
    shiftedRollup(balances,
      Seq("display_chain", "display_market", "collector_label", "balance_group"))

  /** Port of `treasury_value_by_market.sql`. */
  def treasuryValueByMarket(balances: DataFrame): DataFrame =
    shiftedRollup(balances, Seq("display_chain", "display_market"))

  /** Port of `treasury_value_by_chain_ex_reserve.sql`: by-chain totals
    * excluding the Ecosystem Reserve collector. */
  def treasuryValueByChainExReserve(balances: DataFrame): DataFrame =
    treasuryValueByChain(balances.filter(
      col("collector_label").isNull || col("collector_label") =!= "Ecosystem Reserve"))

  /** Port of `treasury_totals_latest.sql` (O4 latest-snapshot filter). */
  def treasuryTotalsLatest(totals: DataFrame): DataFrame =
    Relational.latestOnly(totals, "block_day")

  /** Port of `all_revenue.sql`: income measures rolled up per token/day. */
  def allRevenue(financials: DataFrame): DataFrame =
    financials
      .filter(col("measure_type") === "income")
      .groupBy(col("market"), col("chain"), col("display_name"), col("display_chain"),
        col("token"), col("symbol"), col("underlying_reserve"),
        col("underlying_reserve_symbol"), col("currency"), col("block_day"))
      .agg(sum(col("value")).as("revenue"))
}
