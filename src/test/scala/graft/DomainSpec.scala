package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.domain.{Datamart, Schemas, Warehouse}

/** Golden-fixture tests for the domain slice — the ScalaTest port of the
  * reference's warehouse test idiom (tests/test_data_warehouse.py:78-347:
  * hand fixtures incl. the four IN/OUT×internal/external transfer classes,
  * exact expected frames).
  */
class DomainSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = Timestamp.valueOf(f"2024-01-0$d%d 00:00:00")

  private val INTERNAL = "0x00000000000000000000000000000000000000aa"
  private val EXTERNAL = "0x00000000000000000000000000000000000000bb"
  private val COLLECTOR = "0x0000000000000000000000000000000000000c01"
  private val ATOKEN = "0x000000000000000000000000000000000000ae01"

  private lazy val marketChains = Seq(("ethereum_v3", "ethereum")).toDF("market", "chain")

  private lazy val balances = Seq(
    ("ethereum_v3", COLLECTOR, ATOKEN, "aUSDC", 1000L, day(1), 100.0, 100.0),
    ("ethereum_v3", COLLECTOR, ATOKEN, "aUSDC", 2000L, day(2), 110.0, 105.0),
    ("ethereum_v3", COLLECTOR, ATOKEN, "aUSDC", 3000L, day(3), 125.0, 118.0)
  ).toDF("market", "collector", "token", "symbol", "block_height", "block_day",
    "balance", "scaled_balance")

  // the four transfer quadrants on day 2 (test_data_warehouse.py fixture shape)
  private lazy val transfers = Seq(
    ("ethereum_v3", COLLECTOR, "IN", EXTERNAL, COLLECTOR, ATOKEN, "aUSDC", day(2), 5.0),
    ("ethereum_v3", COLLECTOR, "IN", INTERNAL, COLLECTOR, ATOKEN, "aUSDC", day(2), 2.0),
    ("ethereum_v3", COLLECTOR, "OUT", COLLECTOR, EXTERNAL, ATOKEN, "aUSDC", day(2), 1.0),
    ("ethereum_v3", COLLECTOR, "OUT", COLLECTOR, INTERNAL, ATOKEN, "aUSDC", day(2), 3.0)
  ).toDF("market", "transfers_collector", "transfers_transfer_type",
    "transfers_from_address", "transfers_to_address", "transfers_contract_address",
    "transfers_contract_symbol", "transfers_block_day", "transfers_amount_transferred")

  private lazy val fees = Seq(
    ("ethereum_v3", ATOKEN, "aUSDC", 1000L, day(1), 10.0),
    ("ethereum_v3", ATOKEN, "aUSDC", 2000L, day(2), 12.0),
    ("ethereum_v3", ATOKEN, "aUSDC", 3000L, day(3), 15.0)
  ).toDF("market", "atoken", "atoken_symbol", "block_height", "block_day", "accrued_fees")

  private lazy val mints = Seq(
    ("ethereum_v3", ATOKEN, day(2), 1.0, 0.5)
  ).toDF("market", "atoken", "block_day", "minted_to_treasury_amount", "minted_amount")

  private lazy val internalAddresses = Seq(
    ("ethereum", INTERNAL, "aave_internal", "Some Internal Contract"),
    ("ethereum", COLLECTOR, "aave_internal", "Collector V3")
  ).toDF("chain", "contract_address", "internal_external", "label")

  private lazy val measures = Warehouse.atokenMeasuresByDay(
    balances, transfers, fees, mints, internalAddresses, marketChains)

  test("atokenMeasuresByDay: transfer quadrants, fee join, zero-fill") {
    val rows = measures.orderBy("block_day").collect()
    assert(rows.length == 3)
    val d2 = measures.filter($"block_day" === day(2)).head()
    assert(d2.getAs[Double]("tokens_in_external") == 5.0)
    assert(d2.getAs[Double]("tokens_in_internal") == 2.0)
    assert(d2.getAs[Double]("tokens_out_external") == 1.0)
    assert(d2.getAs[Double]("tokens_out_internal") == 3.0)
    assert(d2.getAs[Double]("accrued_fees") == 12.0)
    assert(d2.getAs[Double]("minted_to_treasury_amount") == 1.0)
    assert(d2.getAs[Double]("minted_amount") == 0.5)
    assert(d2.getAs[String]("chain") == "ethereum")
    // day 1: no transfers/mints → zero-filled, fees joined
    val d1 = measures.filter($"block_day" === day(1)).head()
    assert(d1.getAs[Double]("tokens_in_external") == 0.0)
    assert(d1.getAs[Double]("minted_amount") == 0.0)
    assert(d1.getAs[Double]("accrued_fees") == 10.0)
  }

  test("atokenMeasuresByDay: ethereum_v1 ETH symbol patched to WETH") {
    val v1bal = Seq(("ethereum_v1", COLLECTOR, ATOKEN, "ETH", 1000L, day(1), 1.0, 1.0))
      .toDF("market", "collector", "token", "symbol", "block_height", "block_day",
        "balance", "scaled_balance")
    val mc = Seq(("ethereum_v1", "ethereum")).toDF("market", "chain")
    val got = Warehouse.atokenMeasuresByDay(
      v1bal, Schemas.empty(spark, Schemas.atokenTransfers),
      Schemas.empty(spark, Schemas.accruedFees),
      Schemas.empty(spark, Schemas.mintedToTreasury),
      internalAddresses, mc)
    assert(got.head().getAs[String]("symbol") == "WETH")
  }

  test("aaveInternalAddresses: seed ∪ relabeled atokens (data_warehouse.py:546-591 golden rows)") {
    val marketTokens = Seq(
      ("ethereum_v3", ATOKEN, "aUSDC", day(1)),
      ("ethereum_v3", ATOKEN, "aUSDC", day(2)), // same atoken twice → one dim row
      ("ethereum_v3", "0x000000000000000000000000000000000000ae02", "aWETH", day(1))
    ).toDF("market", "atoken", "atoken_symbol", "block_day")
    val got = Warehouse.aaveInternalAddresses(marketTokens, internalAddresses, marketChains)
      .select($"chain", $"contract_address", $"internal_external", $"label")
      .as[(String, String, String, String)].collect().toSet
    assert(got == Set(
      // the CSV seed passes through verbatim
      ("ethereum", INTERNAL, "aave_internal", "Some Internal Contract"),
      ("ethereum", COLLECTOR, "aave_internal", "Collector V3"),
      // every distinct atoken, chain-attached, relabeled aave_internal
      ("ethereum", ATOKEN, "aave_internal", "aUSDC"),
      ("ethereum", "0x000000000000000000000000000000000000ae02", "aave_internal", "aWETH")))
  }

  test("quadrant classifier consumes the BUILT aave_internal_addresses frame") {
    // a transfer whose counterparty is an ATOKEN contract (wrap/unwrap
    // traffic) is only classified internal because aaveInternalAddresses
    // folded the atoken dim into the seed — the reference's stated purpose
    val marketTokens = Seq(("ethereum_v3", ATOKEN, "aUSDC", day(1)))
      .toDF("market", "atoken", "atoken_symbol", "block_day")
    val seedOnly = Seq(("ethereum", INTERNAL, "aave_internal", "Some Internal Contract"))
      .toDF("chain", "contract_address", "internal_external", "label")
    val built = Warehouse.aaveInternalAddresses(marketTokens, seedOnly, marketChains)
    val wrapTransfer = Seq(
      ("ethereum_v3", COLLECTOR, "IN", ATOKEN, COLLECTOR, ATOKEN, "aUSDC", day(2), 7.0)
    ).toDF("market", "transfers_collector", "transfers_transfer_type",
      "transfers_from_address", "transfers_to_address", "transfers_contract_address",
      "transfers_contract_symbol", "transfers_block_day", "transfers_amount_transferred")
    def inInternal(dim: org.apache.spark.sql.DataFrame): Double =
      Warehouse.atokenMeasuresByDay(balances, wrapTransfer, fees, mints, dim, marketChains)
        .filter($"block_day" === day(2)).head().getAs[Double]("tokens_in_internal")
    assert(inInternal(built) == 7.0, "atoken counterparty must classify internal")
    assert(inInternal(seedOnly) == 0.0, "without the atoken fold-in it is external")
  }

  private lazy val oraclePrices = Seq(
    ("ethereum_v3", ATOKEN, "aUSDC", day(1), 2.0),
    ("ethereum_v3", ATOKEN, "aUSDC", day(2), 2.0),
    ("ethereum_v3", ATOKEN, "aUSDC", day(3), 3.0)
  ).toDF("market", "reserve", "symbol", "block_day", "usd_price")

  private lazy val financials = Datamart.allFinancials(
    Datamart.FinancialsInputs.withDefaults(spark,
      atokenMeasures = measures,
      oraclePrices = Some(oraclePrices),
      internalAddresses = Some(internalAddresses)))

  test("allFinancials: lead pairing drops the newest day, 37-measure unpivot") {
    // 3 input days → 2 surviving (day3 has no next day: all_financials.sql:191)
    val days = financials.select("block_day").distinct()
      .as[Timestamp].collect().toSet
    assert(days == Set(day(1), day(2)))
    // 37 measures per surviving entity-day
    val perDay = financials.groupBy("block_day").count()
      .as[(Timestamp, Long)].collect().toMap
    assert(perDay(day(1)) == 37L && perDay(day(2)) == 37L)
  }

  test("allFinancials: missing price -> usd measure rows EXCLUDED (BQ unpivot nulls)") {
    // No oracle/coingecko price feed: every *_usd measure is null in the
    // wide form, and BigQuery UNPIVOT defaults to EXCLUDE NULLS
    // (all_financials.sql:422-423) — those rows must not appear, while the
    // native-unit measures survive.
    val noPrices = Datamart.allFinancials(
      Datamart.FinancialsInputs.withDefaults(spark,
        atokenMeasures = measures,
        internalAddresses = Some(internalAddresses)))
    val gotMeasures = noPrices.select("measure").distinct()
      .as[String].collect().toSet
    assert(gotMeasures.nonEmpty, "native measures survive without prices")
    assert(!gotMeasures.exists(_.endsWith("_usd")),
      s"usd rows must be excluded when price is null, got: ${gotMeasures.filter(_.endsWith("_usd"))}")
    assert(gotMeasures.contains("start_balance") && gotMeasures.contains("atoken_interest"))
    assert(!noPrices.filter($"value".isNull).limit(1).collect().nonEmpty,
      "no null-valued measure rows at all")
  }

  test("allFinancials: derived measure golden values (day2→day3 pair)") {
    def m(day2: Timestamp, name: String): Double =
      financials.filter($"block_day" === day2 && $"measure" === name)
        .head().getAs[Double]("value")
    // atoken_interest d2 = end - (in_ext + in_int - liq_adj - minted + mintedTT)
    //                      + out_ext + out_int - start
    //                    = 125 - (5 + 2 - 0 - 0.5 + 1) + 1 + 3 - 110 = 11.5
    assert(math.abs(m(day(2), "atoken_interest") - 11.5) < 1e-9)
    // protocol_fees_accrued d2 = 15 - 12 + 1 = 4
    assert(math.abs(m(day(2), "protocol_fees_accrued") - 4.0) < 1e-9)
    // protocol_fees_received d2 = in_ext - liq_adj - minted = 5 - 0 - 0.5 = 4.5
    assert(math.abs(m(day(2), "protocol_fees_received") - 4.5) < 1e-9)
    // end_balance_usd d2 = 125 * 3.0 (end price)
    assert(math.abs(m(day(2), "end_balance_usd") - 375.0) < 1e-9)
    // price_change_usd d2 = (125 + 15) * (3 - 2) = 140
    assert(math.abs(m(day(2), "price_change_usd") - 140.0) < 1e-9)
    // ethereum_v3 is not a liq-adjust market → treasury spend = out_ext
    assert(math.abs(m(day(2), "treasury_spend") - 1.0) < 1e-9)
  }

  test("allFinancials: liq_adjust applies per era rule table") {
    val mc = Seq(("polygon_v3", "polygon")).toDF("market", "chain")
    val bal = Seq(
      ("polygon_v3", COLLECTOR, ATOKEN, "aUSDC", 1L, day(1), 100.0, 80.0),
      ("polygon_v3", COLLECTOR, ATOKEN, "aUSDC", 2L, day(2), 110.0, 85.0)
    ).toDF("market", "collector", "token", "symbol", "block_height", "block_day",
      "balance", "scaled_balance")
    val tr = Seq(
      ("polygon_v3", COLLECTOR, "IN", EXTERNAL, COLLECTOR, ATOKEN, "aUSDC", day(1), 9.0)
    ).toDF("market", "transfers_collector", "transfers_transfer_type",
      "transfers_from_address", "transfers_to_address", "transfers_contract_address",
      "transfers_contract_symbol", "transfers_block_day", "transfers_amount_transferred")
    val meas = Warehouse.atokenMeasuresByDay(bal, tr,
      Schemas.empty(spark, Schemas.accruedFees),
      Schemas.empty(spark, Schemas.mintedToTreasury), internalAddresses, mc)
    val fin = Datamart.allFinancials(
      Datamart.FinancialsInputs.withDefaults(spark, atokenMeasures = meas))
    // polygon_v3 day1 (<= 2023-05-06? no — 2024 > fix date) → NO adjust:
    // protocol_fees_received = in_ext - 0 - 0 = 9
    val got = fin.filter($"measure" === "protocol_fees_received").head().getAs[Double]("value")
    assert(math.abs(got - 9.0) < 1e-9)
  }

  test("blocksByDay: chain-grain projection + dedup (test_data_warehouse.py:18-69)") {
    // two markets on the same chain share block numbers → one chain row
    val lake = Seq(
      (day(1), Timestamp.valueOf("2024-01-01 00:00:11"), 16050438L, 16057596L,
        "ethereum", "ethereum_v2"),
      (day(1), Timestamp.valueOf("2024-01-01 00:00:11"), 16050438L, 16057596L,
        "ethereum", "ethereum_v1")
    ).toDF("block_day", "block_time", "block_height", "end_block", "chain", "market")
    val got = Warehouse.blocksByDay(lake).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("chain") == "ethereum")
    assert(got.head.getAs[Long]("block_height") == 16050438L)
    assert(!Warehouse.blocksByDay(lake).columns.contains("market"))
  }

  test("userRewardsByDay: claims pass through, owed placeholders zeroed (test :527-613)") {
    val claims = Seq(
      (day(1), "ethereum", "ethereum_v2", "ecosystem_reserve", "0x25f2", "0x7fc6",
        1033.82, 449.626, 0.0),
      (day(1), "ethereum", "ethereum_v2", "incentives_controller_v2", "0xd784", "0x7fc6",
        0.0, 0.0, 59.4723)
    ).toDF("block_day", "chain", "market", "reward_vault", "vault_address",
      "token_address", "sm_stkAAVE_claims", "sm_stkABPT_claims", "lm_aave_v2_claims")
    val got = Warehouse.userRewardsByDay(claims).orderBy("reward_vault").collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getAs[Double]("sm_stkAAVE_owed") == 0.0)
      assert(r.getAs[Double]("sm_stkABPT_owed") == 0.0)
      assert(r.getAs[Double]("lm_aave_v2_owed") == 0.0)
    }
    assert(got.head.getAs[Double]("sm_stkAAVE_claims") == 1033.82)
  }

  test("treasuryIncentivesByDay: projection + held_rewards placeholder (test :617-676)") {
    val accrued = Seq(
      ("ethereum", "ethereum_v2", "0x464c", day(1), "0x7fc6", "stkAAVE", 561.626, "extra")
    ).toDF("chain", "market", "collector_contract", "block_day",
      "rewards_token_address", "rewards_token_symbol", "accrued_rewards", "dropme")
    val got = Warehouse.treasuryIncentivesByDay(accrued)
    assert(got.columns.toSeq == Seq("chain", "market", "collector_contract",
      "block_day", "rewards_token_address", "rewards_token_symbol",
      "accrued_rewards", "held_rewards"))
    val r = got.head()
    assert(r.getAs[Double]("accrued_rewards") == 561.626)
    assert(r.getAs[Double]("held_rewards") == 0.0)
  }

  test("balanceGroupLookup: four sources, v1 twist, group classes (data_warehouse.py:604-682)") {
    val mkTokens = Seq(
      ("ethereum_v2", "0xaUSDC", "aUSDC", "0xUSDC", "USDC"),
      ("ethereum_v1", "0xaDAIv1", "aDAI", "0xDAI", "DAI")
    ).toDF("market", "atoken", "atoken_symbol", "reserve", "symbol")
    // wide seed: one column per balance group, rows = member symbols
    val groupLists = Seq(
      (Some("aUSDC"), Some("stkAAVE"), Some("sUSD")),
      (None, None, Some("aSUSD"))
    ).toDF("USDC", "AAVE", "other_stables")
    val gas = Seq(("ethereum_v2", "0xC02", "ETH", day(1), 1.5))
      .toDF("market", "wrapped_gas_token", "gas_token", "block_day", "balance")
    val nonAtokens = Seq(("ethereum_v2", "0x4da2", "stkAAVE", day(1), 10.0))
      .toDF("market", "token", "symbol", "block_day", "balance")
    val mc = Seq(("ethereum_v2", "ethereum"), ("ethereum_v1", "ethereum"))
      .toDF("market", "chain")
    val got = Warehouse.balanceGroupLookup(mkTokens, groupLists, gas, nonAtokens, mc)
      .collect().map(r => (r.getAs[String]("market"), r.getAs[String]("atoken")) ->
        ((r.getAs[String]("atoken_symbol"), r.getAs[String]("balance_group"),
          r.getAs[String]("stable_class"), r.getAs[String]("chain")))).toMap
    // 2 market tokens + v1 twist + non-atoken + gas token = 5 rows
    assert(got.size == 5)
    assert(got(("ethereum_v2", "0xaUSDC")) == (("aUSDC", "USDC", "stablecoin", "ethereum")))
    // the v1 twist: same dims but the RESERVE is the balance address
    assert(got(("ethereum_v1", "0xDAI")) == (("aDAI", "Other Token", "unstablecoin", "ethereum")))
    assert(got(("ethereum_v1", "0xaDAIv1"))._1 == "aDAI")
    // non-atoken doubles as its own atoken; in the AAVE group
    assert(got(("ethereum_v2", "0x4da2")) == (("stkAAVE", "AAVE", "unstablecoin", "ethereum")))
    // gas token: wrapped address, unmatched symbol → Other Token
    assert(got(("ethereum_v2", "0xC02")) == (("ETH", "Other Token", "unstablecoin", "ethereum")))
  }

  test("balanceGroupLookup: other_stables renames and last matching group column wins") {
    val mkTokens = Seq(("m1", "0xa", "aSUSD", "0xr", "SUSD"))
      .toDF("market", "atoken", "atoken_symbol", "reserve", "symbol")
    // aSUSD appears in BOTH columns → the later column (other_stables) wins,
    // then surfaces renamed 'Other Stables' with stablecoin class
    val groupLists = Seq((Some("aSUSD"), Some("aSUSD")))
      .toDF("AAVE", "other_stables")
    val got = Warehouse.balanceGroupLookup(mkTokens, groupLists,
      Seq.empty[(String, String, String)].toDF("market", "wrapped_gas_token", "gas_token"),
      Seq.empty[(String, String, String)].toDF("market", "token", "symbol"),
      Seq(("m1", "c1")).toDF("market", "chain")).head()
    assert(got.getAs[String]("balance_group") == "Other Stables")
    assert(got.getAs[String]("stable_class") == "stablecoin")
  }

  // ---- non-atoken family (test_data_warehouse.py:348-525 fixture shape) ----

  private val NONATOKEN = "0x0000000000000000000000000000000000007fc6"

  private lazy val nonAtokenBalances = Seq(
    (COLLECTOR, "ethereum", "ethereum_v3", NONATOKEN, 18L, "AAVE", 16515917L, day(1), 1234.909),
    (COLLECTOR, "ethereum", "ethereum_v3", NONATOKEN, 18L, "AAVE", 16523084L, day(2), 1300.0)
  ).toDF("contract_address", "chain", "market", "token", "decimals", "symbol",
    "block_height", "block_day", "balance")

  // the reference fixture's four quadrant transfers (0.1/0.2/0.3/0.4), at
  // the holding-contract grain (the collector column IS the contract)
  private lazy val nonAtokenTransfers = Seq(
    ("ethereum_v3", COLLECTOR, "IN", EXTERNAL, COLLECTOR, NONATOKEN, "AAVE", day(2), 0.1),
    ("ethereum_v3", COLLECTOR, "IN", INTERNAL, COLLECTOR, NONATOKEN, "AAVE", day(2), 0.2),
    ("ethereum_v3", COLLECTOR, "OUT", COLLECTOR, EXTERNAL, NONATOKEN, "AAVE", day(2), 0.3),
    ("ethereum_v3", COLLECTOR, "OUT", COLLECTOR, INTERNAL, NONATOKEN, "AAVE", day(2), 0.4)
  ).toDF("market", "transfers_collector", "transfers_transfer_type",
    "transfers_from_address", "transfers_to_address", "transfers_contract_address",
    "transfers_contract_symbol", "transfers_block_day", "transfers_amount_transferred")

  private lazy val paraswapFeesFrame = Seq(
    // same 6-key as the day-1 balance row → folds INTO it (concat+sum)
    (day(1), "ethereum", "ethereum_v3", COLLECTOR, NONATOKEN, "AAVE", 0.05),
    // a claimer with no balance row → its own zero-balance row
    (day(1), "ethereum", "ethereum_v3", EXTERNAL, NONATOKEN, "AAVE", 7.5)
  ).toDF("block_day", "chain", "market", "paraswap_fee_claimer", "reserve",
    "symbol", "claimable")

  private lazy val nonAtokenMeasures = Warehouse.nonAtokenMeasuresByDay(
    nonAtokenBalances, nonAtokenTransfers, internalAddresses,
    paraswapFeesFrame, marketChains)

  test("nonAtokenMeasuresByDay: quadrants at contract grain, paraswap fold-in (test :348-525)") {
    val rows = nonAtokenMeasures.collect()
    assert(rows.length == 3, nonAtokenMeasures.columns.mkString(","))
    // block_height / decimals dropped (data_warehouse.py:269)
    assert(!nonAtokenMeasures.columns.contains("block_height"))
    assert(!nonAtokenMeasures.columns.contains("decimals"))
    val d2 = nonAtokenMeasures
      .filter($"block_day" === day(2) && $"contract_address" === COLLECTOR).head()
    assert(d2.getAs[Double]("balance") == 1300.0)
    assert(d2.getAs[Double]("tokens_in_external") == 0.1)
    assert(d2.getAs[Double]("tokens_in_internal") == 0.2)
    assert(d2.getAs[Double]("tokens_out_external") == 0.3)
    assert(d2.getAs[Double]("tokens_out_internal") == 0.4)
    assert(d2.getAs[Double]("paraswap_fees_claimable") == 0.0)
    // day-1: no transfers → zero quadrants; paraswap row at the same
    // 6-key folds into the balance row (pd.concat + groupby().sum())
    val d1 = nonAtokenMeasures
      .filter($"block_day" === day(1) && $"contract_address" === COLLECTOR).head()
    assert(d1.getAs[Double]("balance") == 1234.909)
    assert(d1.getAs[Double]("tokens_in_external") == 0.0)
    assert(d1.getAs[Double]("paraswap_fees_claimable") == 0.05)
    // claimer without a balance row surfaces as its own zero-filled row
    val p = nonAtokenMeasures.filter($"contract_address" === EXTERNAL).head()
    assert(p.getAs[Double]("balance") == 0.0)
    assert(p.getAs[Double]("paraswap_fees_claimable") == 7.5)
    assert(p.getAs[String]("symbol") == "AAVE")
  }

  test("paraswapFees: keep-last by market within (day,chain,claimer,reserve), zeros dropped (py:683-718)") {
    val feed = Seq(
      (day(1), "ethereum", "aaa_market", COLLECTOR, NONATOKEN, "AAVE", 5.0),
      (day(1), "ethereum", "zzz_market", COLLECTOR, NONATOKEN, "AAVE", 9.0),
      (day(1), "ethereum", "ethereum_v3", COLLECTOR, "0xother", "USDC", 0.0)
    ).toDF("block_day", "chain", "market", "paraswap_fee_claimer", "reserve",
      "symbol", "claimable")
    val got = Warehouse.paraswapFees(feed).collect()
    assert(got.length == 1)
    assert(got.head.getAs[String]("market") == "zzz_market") // keep='last' after market sort
    assert(got.head.getAs[Double]("claimable") == 9.0)
  }

  test("paraswapLegacyClaimableFees: legacy claimer is an extra dedup key (py:728-763)") {
    val feed = Seq(
      (day(1), "ethereum", "aaa", COLLECTOR, "0xlegacy1", NONATOKEN, "AAVE", 1.0),
      (day(1), "ethereum", "zzz", COLLECTOR, "0xlegacy1", NONATOKEN, "AAVE", 2.0),
      (day(1), "ethereum", "aaa", COLLECTOR, "0xlegacy2", NONATOKEN, "AAVE", 3.0)
    ).toDF("block_day", "chain", "market", "paraswap_fee_claimer",
      "paraswap_legacy_claimer", "reserve", "symbol", "claimable")
    val got = Warehouse.paraswapLegacyClaimableFees(feed)
      .orderBy("paraswap_legacy_claimer").collect()
    // legacy1 dedups (keep zzz/2.0); legacy2 is a distinct key → survives
    assert(got.map(r => (r.getAs[String]("paraswap_legacy_claimer"),
      r.getAs[Double]("claimable"))).toSeq == Seq(("0xlegacy1", 2.0), ("0xlegacy2", 3.0)))
  }

  test("allFinancials consumes the BUILT non-atoken frame (not a fixture)") {
    val fin = Datamart.allFinancials(
      Datamart.FinancialsInputs.withDefaults(spark,
        atokenMeasures = measures,
        nonAtokenMeasures = Some(nonAtokenMeasures),
        internalAddresses = Some(internalAddresses)))
    // the non-atoken entity has 2 days → day 1 survives the lead pairing;
    // end_balance at day 1 = day-2 balance (lead), start = day-1 balance
    def m(name: String): Double =
      fin.filter($"collector" === COLLECTOR && $"token" === NONATOKEN &&
          $"block_day" === day(1) && $"measure" === name)
        .head().getAs[Double]("value")
    assert(math.abs(m("start_balance") - 1234.909) < 1e-9)
    assert(math.abs(m("end_balance") - 1300.0) < 1e-9)
    // the paraswap measure flows through the datamart unpivot
    assert(math.abs(m("start_paraswap_fees_claimable") - 0.05) < 1e-9)
  }

  test("treasury chain: balances, by-chain rollup, totals") {
    val withNames = Datamart.allFinancials(
      Datamart.FinancialsInputs.withDefaults(spark,
        atokenMeasures = measures,
        oraclePrices = Some(oraclePrices),
        internalAddresses = Some(internalAddresses),
        displayNames = Some(Seq(
          ("ethereum", "ethereum_v3", COLLECTOR, "Ethereum", "Ethereum V3")
        ).toDF("chain", "market", "collector", "display_chain", "display_name")),
        balanceGroups = Some(Seq(
          ("ethereum_v3", ATOKEN, ATOKEN, "aUSDC", "Stablecoin", "stablecoin")
        ).toDF("market", "atoken", "reserve", "atoken_symbol", "balance_group", "stable_class"))))
    val balancesOut = Datamart.allTreasuryBalances(withNames)
    // 3 balance measures × 2 surviving days, usd+native side by side
    assert(balancesOut.count() == 6)
    val d2end = balancesOut
      .filter($"block_day" === day(2) && $"measure" === "end_balance").head()
    assert(math.abs(d2end.getAs[Double]("value_usd") - 375.0) < 1e-9)
    assert(math.abs(d2end.getAs[Double]("value_native") - 125.0) < 1e-9)

    val byChain = Datamart.treasuryValueByChain(balancesOut)
    // day shifted +1: day2 balances appear as day3 start-of-day
    val d3 = byChain.filter($"block_day" === lit("2024-01-03").cast("date")).head()
    // end_balance_usd 375 + end_accrued_fees_usd 15*3=45 = 420 (all stablecoin)
    assert(math.abs(d3.getAs[Double]("value_usd") - 420.0) < 1e-9)
    assert(math.abs(d3.getAs[Double]("stablecoin_value_usd") - 420.0) < 1e-9)

    val totals = Datamart.treasuryTotals(balancesOut)
    assert(totals.filter($"measure" === "total_treasury_value").count() == 2)

    val revenue = Datamart.allRevenue(withNames)
    // income measures: fees received/accrued + interest, usd + native, 2 days
    assert(revenue.count() == 4)
  }
}
