package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.domain.{Datamart, Warehouse}
import graft.runner.Runner
import graft.runner.Runner.{Dag, Model, Schedule}

/** Schedule descriptor + topological model-DAG executor — the shim for
  * the reference's cron schedules and `ref()`-ordered dbt build
  * (`aave_data/__init__.py:374-434`, `:232-236`). The flagship slice
  * (atoken measures → all_financials → treasury family) rebuilds from a
  * DECLARED dag in dependency order and matches direct composition.
  */
class RunnerDagSpec extends SparkSpec {
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
  private lazy val transfers = Seq(
    ("ethereum_v3", COLLECTOR, "IN", EXTERNAL, COLLECTOR, ATOKEN, "aUSDC", day(2), 5.0),
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
    ("ethereum", COLLECTOR, "aave_collector", "Collector V3")
  ).toDF("chain", "contract_address", "internal_external", "label")
  private lazy val oraclePrices = Seq(
    ("ethereum_v3", ATOKEN, "aUSDC", day(1), 2.0),
    ("ethereum_v3", ATOKEN, "aUSDC", day(2), 2.0),
    ("ethereum_v3", ATOKEN, "aUSDC", day(3), 3.0)
  ).toDF("market", "reserve", "symbol", "block_day", "usd_price")

  // the flagship slice as a declared DAG — listed in a deliberately
  // scrambled order so only dependency resolution can sequence it
  private def flagshipModels: Seq[Model] = Seq(
    Model("treasury_totals", Seq("treasury_balances"))(
      deps => Datamart.treasuryTotals(deps("treasury_balances"))),
    Model("all_financials", Seq("atoken_measures"))(
      deps => Datamart.allFinancials(
        Datamart.FinancialsInputs.withDefaults(spark,
          atokenMeasures = deps("atoken_measures"),
          oraclePrices = Some(oraclePrices),
          internalAddresses = Some(internalAddresses)))),
    Model("treasury_by_chain", Seq("treasury_balances"))(
      deps => Datamart.treasuryValueByChain(deps("treasury_balances"))),
    Model("atoken_measures",
      Seq("balances", "transfers", "fees", "mints", "internal_addresses", "market_chains"))(
      deps => Warehouse.atokenMeasuresByDay(deps("balances"), deps("transfers"),
        deps("fees"), deps("mints"), deps("internal_addresses"), deps("market_chains"))),
    Model("treasury_balances", Seq("all_financials"))(
      deps => Datamart.allTreasuryBalances(deps("all_financials"))))

  private def sources: Map[String, DataFrame] = Map(
    "balances" -> balances, "transfers" -> transfers, "fees" -> fees,
    "mints" -> mints, "internal_addresses" -> internalAddresses,
    "market_chains" -> marketChains)

  test("Schedule validates the 5-field cron shape loudly") {
    Schedule("0 7 * * *", "daily_datamart")     // the reference's daily cadence
    Schedule("*/30 0-6 1,15 * 1-5", "complex")
    assertThrows[IllegalArgumentException](Schedule("0 7 * *", "four_fields"))
    assertThrows[IllegalArgumentException](Schedule("0 7a * * *", "garbage_field"))
  }

  test("Schedule validates field VALUES, not just shape (the silent-never-fires class)") {
    assertThrows[IllegalArgumentException](Schedule("0 99 * * *", "hour_99"))
    assertThrows[IllegalArgumentException](Schedule("5 7 32 * *", "dom_32"))
    assertThrows[IllegalArgumentException](Schedule("*/0 * * * *", "zero_step"))
    // Vixie grammar: /step only after '*' or a range — "5/2" is rejected
    // by real cron implementations, so it must be rejected here too.
    assertThrows[IllegalArgumentException](Schedule("5/2 * * * *", "step_without_range"))
    Schedule("1-30/5 * * * *", "range_step")    // range + step IS legal
    assertThrows[IllegalArgumentException](Schedule("5-1 * * * *", "inverted_range"))
    Schedule("59 23 31 12 7", "all_maxima")     // boundary values are legal
  }

  test("topoOrder tolerates a repeated ref in one deps list") {
    val models = Seq(
      Model("b", Seq("a", "a"))(deps => deps("a")),
      Model("a", Nil)(_ => balances))
    assert(Dag.topoOrder(models).map(_.name) == Seq("a", "b"))
    assert(Dag.materialize(models)("b").count() == balances.count())
  }

  test("materialize refuses a model that shadows a provided source name") {
    val models = Seq(Model("balances", Nil)(_ => balances))
    assertThrows[IllegalArgumentException](
      Dag.materialize(models, Map("balances" -> balances)))
  }

  test("topoOrder sequences the scrambled flagship DAG by dependency") {
    val order = Dag.topoOrder(flagshipModels, sources.keySet).map(_.name)
    def before(a: String, b: String) =
      assert(order.indexOf(a) < order.indexOf(b), s"$a must build before $b")
    before("atoken_measures", "all_financials")
    before("all_financials", "treasury_balances")
    before("treasury_balances", "treasury_by_chain")
    before("treasury_balances", "treasury_totals")
  }

  test("topoOrder fails loudly on cycles and unresolvable refs") {
    val cyclic = Seq(
      Model("a", Seq("b"))(_ => balances),
      Model("b", Seq("a"))(_ => balances))
    assertThrows[IllegalArgumentException](Dag.topoOrder(cyclic))
    val dangling = Seq(Model("a", Seq("nope"))(_ => balances))
    assertThrows[IllegalArgumentException](Dag.topoOrder(dangling))
  }

  test("Job contract gates the landed partition: clean passes, violation throws with rules") {
    import graft.functions.Quality
    val out = java.nio.file.Files.createTempDirectory("graft_contract_job").toString
    def job(bad: Boolean) = Runner.Job("facts", out,
        contract = Seq(Quality.NotNull("v"), Quality.InRange("v", 0.0, 100.0))) {
      (s, _) =>
        import s.implicits._
        (if (bad) Seq(Some(10.0), None, Some(500.0)) else Seq(Some(10.0), Some(20.0)))
          .toDF("v")
    }
    assert(Runner.run(spark, job(bad = false), Runner.Daily("2024-01-01")) == 2L)
    val e = intercept[Runner.ContractViolation](
      Runner.run(spark, job(bad = true), Runner.Daily("2024-01-02")))
    assert(e.assetName == "facts")
    assert(e.failures.toMap == Map("not_null(v)" -> 1L, "accepted_range(v)" -> 1L),
      e.failures.toString)
    // the gate checked ONLY the slice this run wrote: day 1's clean
    // partition did not mask day 2's violations, and day 1 stays intact
    assert(spark.read.parquet(out).where($"date" === "2024-01-01").count() == 2L)
  }

  test("appendOnly contract gates PRE-write: the bad batch never lands, later appends judge only themselves") {
    import graft.functions.Quality
    val out = java.nio.file.Files.createTempDirectory("graft_contract_app").toString
    def job(vals: Seq[Option[Double]]) = Runner.Job("feed", out,
        appendOnly = true, contract = Seq(Quality.NotNull("v"))) {
      (s, _) => { import s.implicits._; vals.toDF("v") }
    }
    val p = Runner.Daily("2024-01-01")
    // bad batch: blocked AND kept out of the table entirely
    intercept[Runner.ContractViolation](
      Runner.run(spark, job(Seq(Some(1.0), None)), p))
    def dataFiles(f: java.io.File): Int =
      if (!f.exists) 0
      else if (f.isDirectory) Option(f.listFiles).toSeq.flatten.map(dataFiles).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    assert(dataFiles(new java.io.File(out)) == 0, "bad batch must not land")
    // clean batches append fine — a read-back gate would have re-judged
    // rows from prior appends; pre-write judging never does
    assert(Runner.run(spark, job(Seq(Some(2.0))), p) == 1L)
    assert(Runner.run(spark, job(Seq(Some(3.0))), p) == 1L)
    assert(spark.read.parquet(out).count() == 2L)
  }

  test("Dag contract failure stops the build before downstream models consume it") {
    import graft.functions.Quality
    val src = Seq((1L, -5.0)).toDF("id", "v")
    var downstreamRan = false
    val models = Seq(
      Model("clean", Seq("src")) { deps => deps("src") },
      Model("report", Seq("clean")) { deps => downstreamRan = true; deps("clean") })
    val e = intercept[Runner.ContractViolation](
      Dag.materialize(models, Map("src" -> src),
        contracts = Map("clean" -> Seq(Quality.InRange("v", 0.0, 100.0)))))
    assert(e.assetName == "clean" && !downstreamRan)
    assertThrows[IllegalArgumentException](
      Dag.materialize(models, Map("src" -> src),
        contracts = Map("nope" -> Seq(Quality.NotNull("v")))))
  }

  test("DAG materialization matches direct composition (lazy and parquet io)") {
    val direct = {
      val meas = Warehouse.atokenMeasuresByDay(balances, transfers, fees, mints,
        internalAddresses, marketChains)
      val fin = Datamart.allFinancials(
        Datamart.FinancialsInputs.withDefaults(spark,
          atokenMeasures = meas,
          oraclePrices = Some(oraclePrices),
          internalAddresses = Some(internalAddresses)))
      Datamart.treasuryTotals(Datamart.allTreasuryBalances(fin))
    }
    val expected = direct.orderBy($"block_day", $"measure")
      .collect().map(_.toSeq).toSeq

    val lazyBuilt = Dag.materialize(flagshipModels, sources)
    val gotLazy = lazyBuilt("treasury_totals").orderBy($"block_day", $"measure")
      .collect().map(_.toSeq).toSeq
    assert(gotLazy == expected)

    val root = java.nio.file.Files.createTempDirectory("graft_dag").toString
    val matBuilt = Dag.materialize(flagshipModels, sources,
      Dag.parquetIo(spark, root))
    val gotMat = matBuilt("treasury_totals").orderBy($"block_day", $"measure")
      .collect().map(_.toSeq).toSeq
    assert(gotMat == expected)
    // persist-every-model: each model's table exists on disk
    flagshipModels.foreach { m =>
      assert(new java.io.File(s"$root/${m.name}").exists, s"${m.name} not materialized")
    }
  }
}

/** Tick-loop semantics (round 13, verdict item 6) under a FAKE clock —
  * on-time fire, missed-window catch-up, and contract-failure stop,
  * mirroring the reference's schedule definitions (__init__.py:374-434). */
class TickerSpec extends SparkSpec {
  import graft.runner.Runner
  private def t(s: String) = java.time.Instant.parse(s)

  test("cron minute matching: daily, every-2-hours, multi-value, vixie dom/dow OR") {
    def m(cron: String, at: String) =
      Runner.Schedule(cron, "j").matchesMinute(t(at).getEpochSecond / 60)
    assert(m("0 1 * * *", "2024-01-05T01:00:00Z"))
    assert(!m("0 1 * * *", "2024-01-05T01:01:00Z"))
    assert(!m("0 1 * * *", "2024-01-05T02:00:00Z"))
    assert(m("0 */2 * * *", "2024-01-05T14:00:00Z"))
    assert(!m("0 */2 * * *", "2024-01-05T13:00:00Z"))
    assert(m("15,45 1 * * *", "2024-01-05T01:45:00Z"))
    // 2024-01-07 is a Sunday: dow 0 and 7 both mean Sunday
    assert(m("0 1 * * 0", "2024-01-07T01:00:00Z"))
    assert(m("0 1 * * 7", "2024-01-07T01:00:00Z"))
    assert(!m("0 1 * * 1", "2024-01-07T01:00:00Z"))
    // vixie OR: dom=9 OR dow=Sunday both fire when both fields restricted
    assert(m("0 1 9 * 0", "2024-01-07T01:00:00Z"))  // Sunday the 7th: dow hits
    assert(m("0 1 9 * 0", "2024-01-09T01:00:00Z"))  // Tuesday the 9th: dom hits
    assert(!m("0 1 9 * 0", "2024-01-08T01:00:00Z")) // Monday the 8th: neither
  }

  test("on-time fire: one tick per matching minute, idempotent re-advance, logical fire instant") {
    val fired = scala.collection.mutable.ArrayBuffer.empty[java.time.Instant]
    val tk = new Runner.Ticker(
      Seq(Runner.Schedule("0 1 * * *", "daily") -> (fired += (_: java.time.Instant))),
      startAt = t("2024-01-01T00:59:00Z"))
    val f1 = tk.advanceTo(t("2024-01-01T01:00:00Z"))
    assert(f1.map(f => (f.jobName, f.at, f.error)) ==
      Seq(("daily", t("2024-01-01T01:00:00Z"), None)))
    assert(fired.toSeq == Seq(t("2024-01-01T01:00:00Z")))
    // same instant again: nothing new
    assert(tk.advanceTo(t("2024-01-01T01:00:00Z")).isEmpty)
    // a non-matching hour later: still nothing
    assert(tk.advanceTo(t("2024-01-01T02:30:00Z")).isEmpty)
  }

  test("missed-window catch-up: every missed tick fires, chronological across schedules") {
    val log = scala.collection.mutable.ArrayBuffer.empty[(String, java.time.Instant)]
    val tk = new Runner.Ticker(Seq(
        Runner.Schedule("15 1 * * *", "datamart") ->
          ((at: java.time.Instant) => log += (("datamart", at))),
        Runner.Schedule("30 1 * * *", "datamart_late") ->
          ((at: java.time.Instant) => log += (("datamart_late", at)))),
      startAt = t("2024-01-01T00:00:00Z"))
    // three days pass unattended (process down) — all six ticks fire, in time order
    val fires = tk.advanceTo(t("2024-01-03T23:00:00Z"))
    assert(fires.map(_.jobName) == Seq("datamart", "datamart_late",
      "datamart", "datamart_late", "datamart", "datamart_late"))
    assert(log.toSeq == Seq(
      ("datamart", t("2024-01-01T01:15:00Z")), ("datamart_late", t("2024-01-01T01:30:00Z")),
      ("datamart", t("2024-01-02T01:15:00Z")), ("datamart_late", t("2024-01-02T01:30:00Z")),
      ("datamart", t("2024-01-03T01:15:00Z")), ("datamart_late", t("2024-01-03T01:30:00Z"))))
  }

  test("contract-failure stop: schedule halts at the failed tick, others continue, resume re-fires it") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[(String, java.time.Instant)]
    var failNext = false
    val tk = new Runner.Ticker(Seq(
        Runner.Schedule("0 1 * * *", "gated") -> ((at: java.time.Instant) => {
          if (failNext) throw Runner.ContractViolation("gated", Seq("not_null_id" -> 3L))
          ran += (("gated", at))
        }),
        Runner.Schedule("0 2 * * *", "healthy") ->
          ((at: java.time.Instant) => ran += (("healthy", at)))),
      startAt = t("2024-01-01T00:00:00Z"))
    assert(tk.advanceTo(t("2024-01-01T03:00:00Z")).forall(_.error.isEmpty))
    failNext = true
    // day 2: gated fails its 01:00 tick and HALTS; healthy still fires 02:00;
    // day 3: gated stays silent (no gap-skip), healthy fires again
    val f2 = tk.advanceTo(t("2024-01-03T03:00:00Z"))
    assert(f2.map(f => (f.jobName, f.error.isDefined)) ==
      Seq(("gated", true), ("healthy", false), ("healthy", false)))
    assert(tk.halted.keySet == Set("gated"))
    assert(tk.halted("gated").isInstanceOf[Runner.ContractViolation])
    // fix lands: resume → the FAILED tick (day 2 01:00) re-fires first,
    // then day 3's missed tick — catch-up from the stop point
    failNext = false
    tk.resume("gated")
    val f3 = tk.advanceTo(t("2024-01-03T03:00:00Z"))
    assert(f3.map(f => (f.jobName, f.at)) == Seq(
      ("gated", t("2024-01-02T01:00:00Z")), ("gated", t("2024-01-03T01:00:00Z"))))
    assert(ran.count(_._1 == "healthy") == 3 && ran.count(_._1 == "gated") == 3)
  }

  test("ticker drives Runner.run end-to-end: catch-up materializes the MISSED logical partitions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_tick").toString
    val job = Runner.Job("daily_prices", s"$root/daily_prices")((s, p) => {
      val d = p.values("date")
      Seq((d, 1.23)).toDF("stamp", "price")
    })
    val tk = new Runner.Ticker(Seq(
        Runner.Schedule("0 1 * * *", "daily_prices") -> ((at: java.time.Instant) => {
          val date = at.atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
          Runner.run(spark, job, Runner.Daily(date)); ()
        })),
      startAt = t("2024-03-01T12:00:00Z"))
    tk.advanceTo(t("2024-03-04T12:00:00Z"))
    val got = spark.read.parquet(s"$root/daily_prices")
      .select($"date").distinct().as[String].collect().sorted.toSeq
    assert(got == Seq("2024-03-02", "2024-03-03", "2024-03-04"))
  }
}
