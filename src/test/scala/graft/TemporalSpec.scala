package graft

import org.apache.spark.sql.functions._
import graft.operators.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    ("AAVE", 100L, 1.0), ("AAVE", 205L, 2.0), ("AAVE", 310L, 3.0),
    ("COMP", 150L, 4.0))
    .toDF("sym", "trade_ts", "qty")

  private val quotes = Seq(
    ("AAVE", 90L, 50.0), ("AAVE", 200L, 55.0), ("AAVE", 205L, 56.0),
    ("COMP", 400L, 30.0))
    .toDF("sym", "quote_ts", "price")

  test("asofJoinBackward: newest quote at or before each trade, per key") {
    val got = Temporal.asofJoinBackward(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("price"))
      .orderBy("sym", "trade_ts")
      .select($"sym", $"trade_ts", $"price").collect()
    assert(got(0).getDouble(2) == 50.0)  // ts 100 → quote 90
    assert(got(1).getDouble(2) == 56.0)  // ts 205 → exact-ts quote visible (<=)
    assert(got(2).getDouble(2) == 56.0)  // ts 310 → still 205 quote
    assert(got(3).isNullAt(2))           // COMP trade 150 before any quote → null
  }

  test("asofJoinBackward honors tolerance") {
    val got = Temporal.asofJoinBackward(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("price"), tolerance = Some(10L))
      .orderBy("sym", "trade_ts")
      .select($"price").collect()
    assert(got(0).getDouble(0) == 50.0)  // gap 10 ≤ 10
    assert(got(1).getDouble(0) == 56.0)  // gap 0
    assert(got(2).isNullAt(0))           // gap 105 > 10 → nulled
  }

  test("asofJoinForward: earliest quote at or after each trade, with tolerance") {
    val got = Temporal.asofJoinForward(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("price"))
      .orderBy("sym", "trade_ts")
      .select($"sym", $"trade_ts", $"price", $"asof_match_ts").collect()
    assert(got(0).getDouble(2) == 55.0 && got(0).getLong(3) == 200L) // 100 → next 200
    assert(got(1).getDouble(2) == 56.0 && got(1).getLong(3) == 205L) // exact ts visible
    assert(got(2).isNullAt(2))                                      // 310 → nothing after
    assert(got(3).getDouble(2) == 30.0)                             // COMP 150 → 400
    val tol = Temporal.asofJoinForward(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("price"), tolerance = Some(100L))
      .orderBy("sym", "trade_ts").select($"price").collect()
    assert(tol(0).getDouble(0) == 55.0) // gap 100 ≤ 100
    assert(tol(3).isNullAt(0))          // COMP gap 250 > 100 → nulled
  }

  test("asofJoinBackward preserves left row count (no fan-out)") {
    val got = Temporal.asofJoinBackward(trades, quotes, Seq("sym"),
      "trade_ts", "quote_ts", Seq("price"))
    assert(got.count() == trades.count())
  }

  test("asofJoinBackward: tied right timestamps resolve deterministically (greatest value)") {
    // 3 quotes share (sym, ts=200); the carried value must be the greatest
    // one, independent of input partitioning / partition count.
    val dupQuotes = Seq(
      ("AAVE", 200L, 55.0), ("AAVE", 200L, 51.0), ("AAVE", 200L, 53.0))
      .toDF("sym", "quote_ts", "price")
    (1 to 8).foreach { nPart =>
      val got = Temporal.asofJoinBackward(
        trades, dupQuotes.repartition(nPart), Seq("sym"),
        "trade_ts", "quote_ts", Seq("price"))
        .filter($"trade_ts" === 205L).select($"price").head().getDouble(0)
      assert(got == 55.0, s"nPart=$nPart got $got")
    }
  }

  test("resampleDaily: spine covers per-key [min,max], gaps forward-filled") {
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val sparse = Seq(
      ("a", d("2024-01-01"), 1.0),
      ("a", d("2024-01-04"), 4.0),   // 2-day gap before this
      ("b", d("2024-02-10"), 9.0))   // single-day key
      .toDF("k", "day", "v")
    val got = Temporal.resampleDaily(sparse, Seq("k"), "day", Seq("v"))
      .orderBy("k", "day").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(10), r.getDouble(2)))
    assert(got.toSeq == Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 1.0),
      ("a", "2024-01-03", 1.0), ("a", "2024-01-04", 4.0),
      ("b", "2024-02-10", 9.0)))
  }

  test("rangeJoinBucketed: malformed interval (end <= start) joins nothing, explodes nothing") {
    val sessions = Seq(
      ("u1", 100L, 200L, "ok"),
      ("u1", 500L, 500L, "empty"),          // zero-length
      ("u1", 1000000000L, 5L, "corrupt"))   // end far below start
      .toDF("user", "start", "end", "session_id")
    val events = Seq(("u1", 150L, "a"), ("u1", 500L, "b")).toDF("user", "ts", "ev")
    // binSize=1: the corrupt row would explode to ~1e9 descending bins unguarded
    val got = Temporal.rangeJoinBucketed(events, sessions, Seq("user"),
      "ts", "start", "end", 1L)
      .select($"ev", $"session_id").as[(String, String)].collect().toSet
    assert(got == Set(("a", "ok")))
  }

  test("timeWeightedAvgExact: integral durations exact past 2^53, zero-duration keys dropped") {
    // Key "big": epoch-ns gaps beyond double's 2^53 exact-integer range —
    // double `/` would mis-round the µs weight by ±1; integral `div` must
    // not. Gap 1 = 2^53+1001 ns (9007199254741992 ÷ 1000 = 9007199254741 µs
    // + r, div truncates to 9007199254741), gap 2 = 1000 ns = 1 µs.
    // Key "zero": both ticks share one ts → total duration 0 → dropped.
    val big1 = 9007199254741992L // 2^53 + 1000
    val ticks = Seq(
      ("big", 0L, 10.0), ("big", big1, 20.0), ("big", big1 + 1000L, 99.0),
      ("zero", 5L, 1.0), ("zero", 5L, 2.0))
      .toDF("k", "ts", "v")
    val got = Temporal.timeWeightedAvgExact(ticks, Seq("k"), "ts", "v",
        tieCols = Seq("v"), durDiv = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val d1 = big1 / 1000L // exact integral µs
    val expTwap = BigDecimal((10.0 * d1 + 20.0 * 1L) / (d1 + 1L))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq == Seq(("big", 2L, d1 + 1L, expTwap)))
  }

  test("funnelStages: strict ordered progression, one advance per event, same-ts blocked") {
    val steps = Seq("view", "click", "purchase")
    val ev = Seq(
      // u1: full funnel in order
      ("u1", 10L, "view"), ("u1", 20L, "click"), ("u1", 30L, "purchase"),
      // u2: click BEFORE view never counts; then view only -> stage 1
      ("u2", 5L, "click"), ("u2", 10L, "view"),
      // u3: purchase without click -> stuck at stage 1
      ("u3", 10L, "view"), ("u3", 20L, "purchase"),
      // u4: click at the SAME ts as view must not advance (strict >)
      ("u4", 10L, "view"), ("u4", 10L, "click"), ("u4", 40L, "click"),
      // u5: only non-funnel events -> absent from the result
      ("u5", 10L, "error"), ("u5", 20L, "signup"),
      // u6: late view restarts nothing — first view anchors the chain
      ("u6", 50L, "view"), ("u6", 60L, "click"), ("u6", 55L, "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = Temporal.funnelStages(ev, "user_id", "ts", "event_type", steps)
      .as[(String, Int)].collect().toMap
    assert(got == Map("u1" -> 3, "u2" -> 1, "u3" -> 1, "u4" -> 2, "u6" -> 2),
      got.toString)
    // the O(1)-state chained form and the heavy-routing hybrid agree
    val chained = Temporal.funnelStagesChained(ev, "user_id", "ts",
      "event_type", steps).as[(String, Int)].collect().toMap
    assert(chained == got, chained.toString)
    val hybrid = Temporal.funnelStages(ev, "user_id", "ts", "event_type",
      steps, maxBufferedPerUser = 2).as[(String, Int)].collect().toMap
    assert(hybrid == got, hybrid.toString)
  }

  test("funnelStages: fold ≡ chained min-ts on random event sets incl. same-ts ties") {
    // both forms advance only on STRICTLY greater ts, so same-ts tie order
    // can never matter — exercised here with a tiny ts domain (lots of
    // collisions), noise types, and every hybrid routing threshold
    val steps = Seq("a", "b", "c", "d")
    val types = steps ++ Seq("x", "y")
    val rnd = new scala.util.Random(4242)
    val ev = (0 until 2000).map { _ =>
      (s"u${rnd.nextInt(40)}", rnd.nextInt(12).toLong,
        types(rnd.nextInt(types.length)))
    }.toDF("user_id", "ts", "event_type")
    val fold = Temporal.funnelStages(ev, "user_id", "ts", "event_type",
      steps, maxBufferedPerUser = Long.MaxValue) // pure fold path
      .as[(String, Int)].collect().toMap
    val chain = Temporal.funnelStagesChained(ev, "user_id", "ts",
      "event_type", steps).as[(String, Int)].collect().toMap
    assert(chain == fold)
    // mixed routing (some users heavy, some light) must be seam-free
    val hybrid = Temporal.funnelStages(ev, "user_id", "ts", "event_type",
      steps, maxBufferedPerUser = 50).as[(String, Int)].collect().toMap
    assert(hybrid == fold)
  }

  test("funnelStages accepts timestamp-typed ts columns (no integral-epoch restriction)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("u1", ts("2024-01-01 10:00:00.250"), "view"),
      ("u1", ts("2024-01-01 10:00:00.500"), "click"),
      // sub-second strictness: same-ts purchase must NOT advance…
      ("u1", ts("2024-01-01 10:00:00.500"), "purchase"),
      ("u2", ts("2024-01-01 10:00:00.500"), "view"),
      // …but a later sub-second one must
      ("u2", ts("2024-01-01 10:00:00.501"), "click"))
      .toDF("user_id", "ts", "event_type")
    val steps = Seq("view", "click", "purchase")
    val fold = Temporal.funnelStages(ev, "user_id", "ts", "event_type", steps)
      .as[(String, Int)].collect().toMap
    assert(fold == Map("u1" -> 2, "u2" -> 2), fold.toString)
    val chain = Temporal.funnelStagesChained(ev, "user_id", "ts",
      "event_type", steps).as[(String, Int)].collect().toMap
    assert(chain == fold)
  }

  test("rangeJoinBucketed: point-in-interval matches across bin sizes") {
    val sessions = Seq(
      ("u1", 100L, 200L, "s1"), ("u1", 200L, 300L, "s2"), ("u2", 0L, 1000L, "s3"))
      .toDF("user", "start", "end", "session_id")
    val events = Seq(
      ("u1", 150L, "a"), ("u1", 200L, "b"), ("u1", 299L, "c"),
      ("u1", 300L, "d"),  // end-exclusive → no match
      ("u2", 999L, "e"))
      .toDF("user", "ts", "ev")
    Seq(1L, 7L, 100L, 5000L).foreach { bin =>
      val got = Temporal.rangeJoinBucketed(events, sessions, Seq("user"),
        "ts", "start", "end", bin)
        .select($"ev", $"session_id").as[(String, String)].collect().toSet
      assert(got == Set(("a", "s1"), ("b", "s2"), ("c", "s2"), ("e", "s3")),
        s"binSize=$bin got $got")
    }
  }
}
