package graft

import org.apache.spark.sql.functions._
import graft.functions.Quality

/** Pins [[Quality.expect]] — the runtime dbt-test vocabulary — on frames
  * that actually VIOLATE each rule (the k9 gate query runs the contract on
  * clean corpus tables, so the violation-counting arithmetic is pinned
  * here).
  */
class QualitySpec extends SparkSpec {
  import spark.implicits._

  private lazy val child = Seq(
    (Some(1L), Some("A"), 10.0, 1),
    (Some(1L), Some("A"), 10.0, 1),   // duplicate (id, line) key
    (Some(2L), Some("X"), -5.0, 2),   // bad enum value + below range
    (Some(3L), None, 60.0, 3),        // null enum (NOT an accepted_values violation) + above range
    (None, Some("N"), 25.0, 4),       // null id (not_null violation; skipped by relationships)
    (Some(99L), Some("R"), 25.0, 5)   // orphan id (no parent)
  ).toDF("id", "flag", "qty", "line")

  private lazy val parent = Seq(1L, 2L, 3L).toDF("pk")

  private def run(rules: Seq[Quality.Rule]): Map[String, (Long, Long, Boolean)] =
    Quality.expect(child, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("expect: every dbt rule type counts its own violations") {
    val got = run(Seq(
      Quality.NotNull("id"),
      Quality.AcceptedValues("flag", Seq("A", "N", "R")),
      Quality.InRange("qty", 0.0, 50.0),
      Quality.Unique(Seq("id", "line")),
      Quality.References(Seq("id"), () => parent, Seq("pk"))))
    assert(got("not_null(id)") == ((6L, 1L, false)))
    // n_checked counts NON-NULL values; the null flag is not a violation
    assert(got("accepted_values(flag)") == ((5L, 1L, false)))
    assert(got("accepted_range(qty)") == ((6L, 2L, false)))
    // null-keyed row excluded (dbt pre-filter) -> 4 distinct non-null
    // (id, line) keys, 1 of them duplicated
    assert(got("unique(id,line)") == ((4L, 1L, false)))
    // null child key skipped (dbt semantics) -> 5 checked, 1 orphan (99)
    assert(got("relationships(id)") == ((5L, 1L, false)))
  }

  test("expect: NULL keys never fail unique (dbt pre-filter); NotNull owns them") {
    val df = Seq(
      (Option.empty[Long], "x"), (Option.empty[Long], "y"), (Some(1L), "z"))
      .toDF("id", "v")
    val got = run2(df, Seq(Quality.Unique(Seq("id"))))
    assert(got("unique(id)") == ((1L, 0L, true)))
  }

  private def run2(df: org.apache.spark.sql.DataFrame,
                   rules: Seq[Quality.Rule]): Map[String, (Long, Long, Boolean)] =
    Quality.expect(df, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap

  test("expect: clean frame passes every rule, declared order preserved") {
    val clean = Seq((1L, "A", 5.0, 1), (2L, "N", 7.0, 1)).toDF("id", "flag", "qty", "line")
    val rows = Quality.expect(clean, Seq(
      Quality.Unique(Seq("id")),
      Quality.NotNull("flag"),
      Quality.References(Seq("id"), () => parent, Seq("pk")),
      Quality.InRange("qty", 0.0, 10.0))).collect()
    assert(rows.forall(_.getBoolean(3)), s"all pass, got ${rows.mkString(";")}")
    assert(rows.map(_.getString(0)).toSeq == Seq(
      "unique(id)", "not_null(flag)", "relationships(id)", "accepted_range(qty)"))
  }

  test("expectBy: per-partition scalar report sums to the global expect counts") {
    val df = Seq(
      ("d1", Some(1L), 10.0), ("d1", None, 60.0),
      ("d2", Some(2L), -5.0), ("d2", Some(3L), 20.0))
      .toDF("day", "id", "qty")
    val rules: Seq[Quality.Rule] = Seq(
      Quality.NotNull("id"), Quality.InRange("qty", 0.0, 50.0))
    val per = Quality.expectBy(df, Seq("day"), rules)
    assert(per.columns.toSeq ==
      Seq("day", "rule", "n_checked", "n_violations", "passed"))
    val got = per.collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(("d1", "not_null(id)")) == ((2L, 1L)))
    assert(got(("d2", "not_null(id)")) == ((2L, 0L)))
    assert(got(("d1", "accepted_range(qty)")) == ((2L, 1L)))
    assert(got(("d2", "accepted_range(qty)")) == ((2L, 1L)))
    // partition counts fold to the global report exactly (algebraic sums)
    val global = Quality.expect(df, rules).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rules.map {
      case Quality.NotNull(c) => s"not_null($c)"
      case r => r.name
    }.foreach { name =>
      // .toSeq first: collect-of-tuples on a Map would rebuild a Map and
      // silently dedupe by n_checked
      val folded = got.toSeq.collect { case ((_, n), v) if n == name => v }
        .foldLeft((0L, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
      assert(folded == global(name), name)
    }
    // stateful rules rejected
    assertThrows[IllegalArgumentException](
      Quality.expectBy(df, Seq("day"), Seq(Quality.Unique(Seq("id")))))
  }

  test("expect: a contract of only scalar rules is a single aggregate (one scan)") {
    val df = Quality.expect(child, Seq(
      Quality.NotNull("id"), Quality.InRange("qty", 0.0, 50.0)))
    // both rules fold into one agg: the plan has exactly one Aggregate pair
    // over the source (physical: partial+final HashAggregate, no union)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), s"scalar-only contract must not union scans:\n$plan")
    assert(df.count() == 2)
  }
}
