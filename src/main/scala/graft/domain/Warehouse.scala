package graft.domain

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse-layer transforms: pure DataFrame jobs with the semantics of the
  * reference's pandas warehouse assets
  * (aave_data/assets/financials/data_warehouse.py). No network, no state —
  * inputs are lake DataFrames, output is one joined measure table per asset.
  */
object Warehouse {

  /** Join all atoken-level measures into one row per (collector, token, day) —
    * the port of `atoken_measures_by_day` (data_warehouse.py:84-227).
    *
    * Semantics preserved from the reference:
    *   - transfers get classified internal/external by matching the
    *     counterparty (from_address for IN, to_address for OUT) against the
    *     internal-address dim; unmatched → external (fillna 'aave_external',
    *     data_warehouse.py:168);
    *   - the four transfer quadrants become columns via conditional sums
    *     (np.where ×4 + groupby().sum(), data_warehouse.py:171-179);
    *   - ethereum_v1 'ETH' symbol is patched to 'WETH'
    *     (data_warehouse.py:205);
    *   - all missing measures fill 0 (data_warehouse.py:208).
    *
    * Scale: transfers aggregate map-side before the join; the measure joins
    * are on (market, token, block_day) so everything co-partitions on one
    * shuffle key family; `marketChains` and `internalAddresses` are tiny
    * dims → broadcast.
    */
  def atokenMeasuresByDay(
      balances: DataFrame,          // market, collector, token, symbol, block_height, block_day, balance, scaled_balance
      transfers: DataFrame,         // transfers_* prefixed: collector, transfer_type IN|OUT, from_address, to_address, contract_address, contract_symbol, block_day, amount_transferred, market
      accruedFees: DataFrame,       // market, atoken, atoken_symbol, block_height, block_day, accrued_fees
      mintedToTreasury: DataFrame,  // market, atoken, block_day, minted_to_treasury_amount, minted_amount
      internalAddresses: DataFrame, // chain, contract_address, internal_external
      marketChains: DataFrame       // market, chain
  ): DataFrame = {
    val mc = broadcast(marketChains)
    val base = balances.join(mc, Seq("market"), "left")

    val fees = accruedFees
      .select(col("market"), col("atoken").as("token"),
        col("atoken_symbol").as("symbol"), col("block_height"),
        col("block_day"), col("accrued_fees"))

    val transferAgg = classifiedTransfers(transfers, internalAddresses, mc)
      .groupBy(col("market"), col("chain"), col("collector"), col("token"),
               col("symbol"), col("block_day"))
      .agg(quadrantAggs.head, quadrantAggs.tail: _*)

    val mint = mintedToTreasury
      .select(col("market"), col("atoken").as("token"), col("block_day"),
        col("minted_to_treasury_amount"), col("minted_amount"))

    val joined = base
      .join(fees, Seq("market", "token", "symbol", "block_height", "block_day"), "left")
      .join(transferAgg,
        Seq("market", "chain", "collector", "token", "symbol", "block_day"), "left")
      .join(mint, Seq("market", "token", "block_day"), "left")
      .withColumn("symbol",
        when(col("market") === "ethereum_v1" && col("symbol") === "ETH", "WETH")
          .otherwise(col("symbol")))

    val measureCols = Seq("accrued_fees", "tokens_in_external", "tokens_in_internal",
      "tokens_out_external", "tokens_out_internal",
      "minted_to_treasury_amount", "minted_amount")
    joined.na.fill(0.0, measureCols)
  }

  /** Shared transfer-quadrant classification — byte-identical logic in the
    * atoken and non-atoken assets (data_warehouse.py:132-175 / :272-314):
    * strip the lake's 'transfers_' column prefix, attach the chain from the
    * market dim, and resolve each transfer's COUNTERPARTY (from_address for
    * IN, to_address for OUT) against the internal-address dim; unmatched →
    * 'aave_external' (the fillna at :167/:307). Both dims broadcast. */
  private def classifiedTransfers(transfers: DataFrame,
                                  internalAddresses: DataFrame,
                                  marketChains: DataFrame): DataFrame = {
    val t0 = transfers.columns.foldLeft(transfers) { (d, c) =>
      if (c.startsWith("transfers_")) d.withColumnRenamed(c, c.stripPrefix("transfers_")) else d
    }
    val classDim = broadcast(
      internalAddresses.select(col("chain"), col("contract_address"), col("internal_external")))
    val tWithChain = t0.join(broadcast(marketChains), Seq("market"), "left")
      .select(col("market"), col("chain"), col("collector"), col("transfer_type"),
        col("from_address"), col("to_address"),
        col("contract_address").as("token"), col("contract_symbol").as("symbol"),
        col("block_day"), col("amount_transferred"))
    // counterparty lookup: IN matches from_address, OUT matches to_address
    val counterparty = when(col("transfer_type") === "IN", col("from_address"))
      .otherwise(col("to_address"))
    tWithChain
      .withColumn("__cp", counterparty)
      .join(classDim.withColumnRenamed("contract_address", "__cp"), Seq("chain", "__cp"), "left")
      .withColumn("internal_external", coalesce(col("internal_external"), lit("aave_external")))
  }

  /** The four transfer quadrants as conditional sums (the np.where ×4 +
    * groupby().sum() at data_warehouse.py:171-179 / :310-318). */
  private def quadrantAggs: Seq[Column] = {
    def quadrant(cls: String, dir: String) =
      sum(when(col("internal_external") === cls && col("transfer_type") === dir,
        col("amount_transferred")).otherwise(0.0))
    Seq(
      quadrant("aave_external", "IN").as("tokens_in_external"),
      quadrant("aave_internal", "IN").as("tokens_in_internal"),
      quadrant("aave_external", "OUT").as("tokens_out_external"),
      quadrant("aave_internal", "OUT").as("tokens_out_internal"))
  }

  /** Port of `non_atoken_measures_by_day` (data_warehouse.py:241-359): one
    * row per (contract, token, day) for the non-atoken holdings, with the
    * same transfer-quadrant classification as the atoken asset — the
    * reference repeats the logic verbatim; here both route through
    * [[classifiedTransfers]]/[[quadrantAggs]] — plus the paraswap
    * claimable-fee rows folded in by union + re-aggregation (the pd.concat
    * + groupby().sum() at :333-335; paraswap rows carry no balance and
    * balance rows carry no claimable, so the sum is a coalesce in effect).
    *
    * Differences preserved from the atoken twin: the transfer grain drops
    * the collector in favor of the holding CONTRACT (rename at :290), the
    * quadrant grouping carries no symbol (:317-318), and there is no
    * accrued-fees/minted join. `block_height`/`decimals` are dropped
    * (:269). All missing measures fill 0.
    *
    * Scale: quadrants aggregate map-side before the join; everything keys
    * on (market, chain, contract, token, day); dims broadcast. */
  def nonAtokenMeasuresByDay(
      balances: DataFrame,          // contract_address, [chain], market, token, decimals, symbol, block_height, block_day, balance
      transfers: DataFrame,         // transfers_* prefixed (see classifiedTransfers) + market, collector
      internalAddresses: DataFrame, // chain, contract_address, internal_external
      paraswapFees: DataFrame,      // block_day, chain, market, paraswap_fee_claimer, reserve, symbol, claimable
      marketChains: DataFrame       // market, chain
  ): DataFrame = {
    val kept = balances.columns.filterNot(Seq("block_height", "decimals").contains)
    val base0 = balances.select(kept.map(col).toIndexedSeq: _*)
    // pandas merge(mc) joins on ALL shared columns — (market, chain) when
    // the lake frame already carries the chain, market alone otherwise
    val mcKeys = if (base0.columns.contains("chain")) Seq("market", "chain") else Seq("market")
    val base = base0.join(broadcast(marketChains), mcKeys, "left")

    val transferAgg = classifiedTransfers(transfers, internalAddresses, marketChains)
      .withColumnRenamed("collector", "contract_address") // :290 — the holding contract, not the collector
      .groupBy(col("market"), col("chain"), col("contract_address"),
               col("token"), col("block_day"))
      .agg(quadrantAggs.head, quadrantAggs.tail: _*)

    val para = paraswapFees.select(
      col("block_day"), col("chain"), col("market"),
      col("paraswap_fee_claimer").as("contract_address"),
      col("reserve").as("token"), col("symbol"),
      col("claimable").as("paraswap_fees_claimable"))

    val measures = Seq("balance", "tokens_in_external", "tokens_in_internal",
      "tokens_out_external", "tokens_out_internal", "paraswap_fees_claimable")
    base
      .join(transferAgg, Seq("market", "chain", "contract_address", "token", "block_day"), "left")
      .unionByName(para, allowMissingColumns = true)
      .na.fill(0.0, measures)
      .groupBy(col("block_day"), col("chain"), col("market"),
               col("contract_address"), col("token"), col("symbol"))
      .agg(sum(col(measures.head)).as(measures.head),
        measures.tail.map(m => sum(col(m)).as(m)): _*)
      .select((Seq("contract_address", "chain", "market", "token", "symbol",
        "block_day") ++ measures).map(col): _*) // Schemas.nonAtokenMeasures order
  }

  /** Port of `paraswap_fees` (data_warehouse.py:683-718): keep-last dedup
    * of the claimable-fee feed — last by market within each
    * (day, chain, claimer, reserve) group (the sort_values +
    * drop_duplicates(keep='last') at :706) — then drop the zero rows. */
  def paraswapFees(paraswapClaimableFees: DataFrame): DataFrame =
    graft.operators.Relational.dedupKeepLast(
        paraswapClaimableFees.select(col("block_day"), col("chain"),
          col("market"), col("paraswap_fee_claimer"), col("reserve"),
          col("symbol"), col("claimable")),
        keyCols = Seq("block_day", "chain", "paraswap_fee_claimer", "reserve"),
        orderCols = Seq("market"))
      .filter(col("claimable") > 0)

  /** Port of `paraswap_legacy_claimable_fees` (data_warehouse.py:728-763):
    * same keep-last dedup as [[paraswapFees]] with the legacy claimer as an
    * extra key column (:751). */
  def paraswapLegacyClaimableFees(paraswapLegacyFees: DataFrame): DataFrame =
    graft.operators.Relational.dedupKeepLast(
        paraswapLegacyFees.select(col("block_day"), col("chain"),
          col("market"), col("paraswap_fee_claimer"),
          col("paraswap_legacy_claimer"), col("reserve"),
          col("symbol"), col("claimable")),
        keyCols = Seq("block_day", "chain", "paraswap_fee_claimer",
          "paraswap_legacy_claimer", "reserve"),
        orderCols = Seq("market"))
      .filter(col("claimable") > 0)

  /** Port of `blocks_by_day` (data_warehouse.py:44-70): the closest block
    * to the daily 0000 UTC boundary per CHAIN — the per-market lake asset
    * projected to chain grain and deduplicated (markets on the same chain
    * share block numbers, so the projection collapses them; the reference
    * picks the block_table_master market, which is the same dedup). */
  def blocksByDay(blockNumbersByDay: DataFrame): DataFrame =
    blockNumbersByDay
      .select(col("block_day"), col("block_time"), col("block_height"),
        col("end_block"), col("chain"))
      .dropDuplicates()

  /** Port of `user_rewards_by_day` (data_warehouse.py:371-407): the LM/SM
    * claims feed widened with the not-yet-implemented owed measures as
    * zero columns (the reference's todo placeholder, kept for schema
    * parity with downstream SQL). */
  def userRewardsByDay(userLmRewardsClaimed: DataFrame): DataFrame =
    userLmRewardsClaimed
      .withColumn("sm_stkAAVE_owed", lit(0.0))
      .withColumn("sm_stkABPT_owed", lit(0.0))
      .withColumn("lm_aave_v2_owed", lit(0.0))

  /** Port of `treasury_incentives_by_day` (data_warehouse.py:417-460):
    * projection of the treasury accrued-incentives feed plus the
    * placeholder `held_rewards` zero column. */
  def treasuryIncentivesByDay(treasuryAccruedIncentives: DataFrame): DataFrame =
    treasuryAccruedIncentives
      .select(col("chain"), col("market"), col("collector_contract"),
        col("block_day"), col("rewards_token_address"),
        col("rewards_token_symbol"), col("accrued_rewards"))
      .withColumn("held_rewards", lit(0.0))

  /** Port of `aave_internal_addresses` (data_warehouse.py:546-591): the
    * manually-curated internal/external address seed (CSV upload) unioned
    * with EVERY atoken the protocol has listed, relabeled 'aave_internal'
    * — the dim that lets wrap/unwrap traffic against atoken contracts be
    * classified internal by the transfer-quadrant classifier
    * ([[atokenMeasuresByDay]] consumes exactly this frame's schema).
    *
    * Semantics preserved: atokens come from market_tokens_by_day with
    * chain attached from the market dim (merge how='left', :572), the
    * (chain, atoken_symbol→label, atoken→contract_address) projection is
    * dropped to distinct rows (:573-575), flagged 'aave_internal' (:578)
    * and concatenated under the seed (:580). Scale: all inputs are
    * dimension-sized; the chain attach is a broadcast join and the dedup
    * runs on the 3-column projection only. */
  def aaveInternalAddresses(marketTokensByDay: DataFrame,
                            internalExternalAddresses: DataFrame,
                            marketChains: DataFrame): DataFrame = {
    val atokens = marketTokensByDay
      .join(broadcast(marketChains.select(col("market"), col("chain"))),
        Seq("market"), "left")
      .select(col("chain"), col("atoken_symbol").as("label"),
        col("atoken").as("contract_address"))
      .dropDuplicates()
      .withColumn("internal_external", lit("aave_internal"))
    internalExternalAddresses
      .select(col("chain"), col("contract_address"),
        col("internal_external"), col("label"))
      .unionByName(atokens.select(col("chain"), col("contract_address"),
        col("internal_external"), col("label")))
  }

  /** Port of `balance_group_lookup` (data_warehouse.py:604-682): the
    * token → balance-group lookup table assembled from four sources —
    *
    *   - all atokens from `market_tokens_by_day` (distinct token dims);
    *   - the ethereum_v1 twist: v1 rows repeated with the RESERVE as the
    *     balance address (v1 collectors hold native reserves, not
    *     atokens — data_warehouse.py:631-634);
    *   - non-atoken measure tokens (incl. paraswap), address doubling as
    *     its own "atoken" (:637-641);
    *   - per-market gas tokens, wrapped address as the balance address
    *     (:644-648);
    *
    * then chain attached from the market dim and each row classified by
    * the wide balance-group seed (`balanceGroupLists`: one COLUMN per
    * group, rows = member atoken symbols — the reference iterates columns
    * with np.where, LAST matching column winning, :658-662). Unmatched →
    * 'Other Token'; stable_class from the stable group set; the
    * 'other_stables' group renames to 'Other Stables' (:664-666).
    *
    * Scale: every input is dimension-sized; the classifier seed melts to
    * (symbol, group) and broadcast-joins — no corpus-scale work exists
    * here, the function is shape-for-shape the reference's concat chain.
    */
  def balanceGroupLookup(marketTokensByDay: DataFrame,
                         balanceGroupLists: DataFrame,
                         ethBalancesByDay: DataFrame,
                         nonAtokenMeasuresByDay: DataFrame,
                         marketChains: DataFrame): DataFrame = {
    val tokens = marketTokensByDay
      .select(col("market"), col("atoken"), col("atoken_symbol"),
        col("reserve"), col("symbol"))
      .dropDuplicates()
    val v1Tokens = tokens.filter(col("market") === "ethereum_v1")
      .withColumn("atoken", col("reserve"))
    val nonAtokens = nonAtokenMeasuresByDay
      .select(col("market"), col("token").as("reserve"), col("symbol"))
      .dropDuplicates()
      .withColumn("atoken", col("reserve"))
      .withColumn("atoken_symbol", col("symbol"))
    val gasTokens = ethBalancesByDay
      .select(col("market"), col("wrapped_gas_token").as("atoken"),
        col("gas_token").as("atoken_symbol"))
      .dropDuplicates()
      .withColumn("reserve", col("atoken"))
      .withColumn("symbol", col("atoken_symbol"))
    val all = tokens
      .unionByName(v1Tokens)
      .unionByName(nonAtokens)
      .unionByName(gasTokens)
      .join(broadcast(marketChains.select(col("market"), col("chain"))),
        Seq("market"), "left")
    // melt the wide seed to (atoken_symbol, group, column order); the
    // reference's sequential np.where makes the LAST matching column win
    val groupCols = balanceGroupLists.columns
    val membership = groupCols.zipWithIndex.map { case (g, i) =>
      balanceGroupLists.select(col(g).as("atoken_symbol"))
        .filter(col("atoken_symbol").isNotNull)
        .withColumn("__grp", lit(g)).withColumn("__ord", lit(i))
    }.reduce(_ unionByName _)
    val winner = graft.operators.Relational.topPerGroup(
      membership, Seq("atoken_symbol"), Seq(col("__ord").desc))
      .select(col("atoken_symbol"), col("__grp"))
    val stableGroups = Seq("DAI", "USDC", "USDT", "other_stables")
    all.join(broadcast(winner), Seq("atoken_symbol"), "left")
      .withColumn("__grp", coalesce(col("__grp"), lit("Other Token")))
      .withColumn("stable_class",
        when(col("__grp").isin(stableGroups: _*), "stablecoin")
          .otherwise("unstablecoin"))
      .withColumn("balance_group",
        when(col("__grp") === "other_stables", "Other Stables").otherwise(col("__grp")))
      .select(col("market"), col("atoken"), col("atoken_symbol"),
        col("reserve"), col("symbol"), col("chain"),
        col("balance_group"), col("stable_class"))
  }

  /** Latest-day atoken dim — the port of `aave_atokens.sql`: one row per
    * atoken from the newest market_tokens_by_day partition, chain attached
    * from the block-numbers dim. */
  def aaveAtokens(marketTokens: DataFrame, blockNumbers: DataFrame): DataFrame = {
    val chains = blockNumbers.select(col("market"), col("chain")).distinct()
    val latest = graft.operators.Relational.latestOnly(marketTokens, "block_day")
    latest
      .join(broadcast(chains), Seq("market"), "left")
      .select(
        col("atoken"), col("atoken_symbol"), col("atoken_decimals"),
        col("reserve"), col("symbol").as("reserve_symbol"),
        col("decimals").as("reserve_decimals"), col("name").as("reserve_name"),
        col("market"), col("chain"), col("pool").as("lending_pool"))
  }
}
