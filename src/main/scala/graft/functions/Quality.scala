package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-contract expectation checks — the runtime form of the reference's
  * declared (dbt) test surface: `unique`, `not_null`, `accepted_values`,
  * `relationships` (aave_dbt/models/datamart/schema.yml declares these as
  * the schema-test vocabulary; the reference ships them as descriptions,
  * this engine runs them), plus the dbt-utils `accepted_range` everyone
  * adds in practice. A contract is a list of [[Quality.Rule]]s; [[expect]]
  * evaluates all of them and returns one summary row per rule —
  * `(rule, n_checked, n_violations, passed)` — the table a warehouse gate
  * job writes next to every asset.
  *
  * Scale shape: all SCALAR rules (not-null / accepted-values / range) fold
  * into ONE conditional-sum aggregate = a single scan with map-side
  * partials, regardless of how many such rules the contract carries.
  * Each `Unique` adds one groupBy on its key (a shuffle bounded by key
  * cardinality after partial aggregation); each `References` adds one
  * join against the dim's distinct keys (broadcast when the dim is
  * dim-sized, which relationship targets are by definition). Violation
  * counts, not violating rows: the summary is O(rules), safe to collect,
  * and a follow-up query filtered by the failing rule retrieves examples.
  */
object Quality {

  sealed trait Rule { def name: String }

  /** dbt `not_null`: column must have no NULLs. */
  final case class NotNull(column: String) extends Rule {
    def name: String = s"not_null($column)"
  }

  /** dbt `accepted_values`: non-null values must be in `values`
    * (NULLs are not violations here — pair with [[NotNull]] to forbid
    * them, exactly like dbt composes the two tests). */
  final case class AcceptedValues(column: String, values: Seq[String]) extends Rule {
    def name: String = s"accepted_values($column)"
  }

  /** dbt-utils `accepted_range` (inclusive): non-null values must lie in
    * [lo, hi]. */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    def name: String = s"accepted_range($column)"
  }

  /** dbt `unique` (composite form): no key may occur more than once.
    * Rows with a NULL in any key column are excluded from the check —
    * dbt's `where column is not null` pre-filter (NULL handling is
    * [[NotNull]]'s job, same composition rule as [[AcceptedValues]]).
    * `n_violations` = number of DISTINCT duplicated keys (dbt's grouped
    * convention), `n_checked` = distinct keys. */
  final case class Unique(columns: Seq[String]) extends Rule {
    def name: String = s"unique(${columns.mkString(",")})"
  }

  /** dbt `relationships`: every non-null child key must exist in the
    * parent's key set. `dim` is evaluated lazily so contracts can be
    * declared before sessions exist. `broadcastParent` hints the parent
    * key set broadcast (the right call for true dimensions); set false
    * for a parent that is itself fact-sized (self-referential FKs) and
    * the check plans as a shuffled join instead of OOMing the driver. */
  final case class References(columns: Seq[String], dim: () => DataFrame,
                              dimColumns: Seq[String],
                              broadcastParent: Boolean = true) extends Rule {
    require(columns.length == dimColumns.length,
      "child/parent key lists must align")
    def name: String = s"relationships(${columns.mkString(",")})"
  }

  /** The scalar rules of a contract, with their original declaration
    * indexes (order drives the report's `rule_idx`). */
  private[graft] def scalarRules(rules: Seq[Rule]): Seq[(Int, Rule, Column, Column)] =
    rules.zipWithIndex.collect {
      case (r @ NotNull(c), i) =>
        (i, r: Rule, count(lit(1)), count(when(col(c).isNull, 1)))
      case (r @ AcceptedValues(c, vs), i) =>
        (i, r: Rule, count(col(c)),
          count(when(col(c).isNotNull && !col(c).isin(vs: _*), 1)))
      case (r @ InRange(c, lo, hi), i) =>
        (i, r: Rule, count(col(c)),
          count(when(col(c).isNotNull && (col(c) < lo || col(c) > hi), 1)))
    }

  /** Flat named aggregate columns for the scalar rules — 2 conditional
    * counts per rule, designed to ride ONE aggregate (batch `df.agg` or a
    * streaming global aggregate: every count is an algebraic sum, so
    * map-side partials and streaming state merges are exact). */
  private[graft] def scalarAggColumns(sr: Seq[(Int, Rule, Column, Column)]): Seq[Column] =
    sr.flatMap { case (i, _, chk, vio) =>
      Seq(chk.as(s"__c$i"), vio.as(s"__v$i"))
    }

  /** The per-rule report-row structs read off a scalar aggregate's named
    * `__c<i>`/`__v<i>` columns — the ONE place the report schema lives
    * (expect and expectBy both explode these). */
  private def scalarReportRows(sr: Seq[(Int, Rule, Column, Column)]): Seq[Column] =
    sr.map { case (i, r, _, _) =>
      struct(lit(i).as("rule_idx"), lit(r.name).as("rule"),
        col(s"__c$i").as("n_checked"), col(s"__v$i").as("n_violations"))
    }

  /** Unpivot the one-row scalar aggregate into per-rule report rows. */
  private[graft] def explodeScalarSummary(one: DataFrame,
                                          sr: Seq[(Int, Rule, Column, Column)]): DataFrame =
    one.select(explode(array(scalarReportRows(sr): _*)).as("r")).select("r.*")

  /** Evaluate `rules` against `df`; returns `(rule, n_checked,
    * n_violations, passed)` with one row per rule, in the declared rule
    * order (`rule_idx` column drives deterministic ordering). */
  def expect(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "contract must declare at least one rule")

    val sr = scalarRules(rules)

    val scalarSummary: Option[DataFrame] =
      if (sr.isEmpty) None
      else {
        // one scan for every scalar rule: 2 conditional counts per rule in
        // a single agg, then unpivot the one-row result into rule rows
        val aggs = scalarAggColumns(sr)
        Some(explodeScalarSummary(df.agg(aggs.head, aggs.tail: _*), sr))
      }

    val groupedSummaries: Seq[DataFrame] = rules.zipWithIndex.collect {
      case (r @ Unique(cols), i) =>
        df.na.drop("any", cols) // dbt unique: NULL keys are not checked
          .groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__n"))
          .agg(lit(i).as("rule_idx"), lit(r.name).as("rule"),
            count(lit(1)).as("n_checked"),
            count(when(col("__n") > 1, 1)).as("n_violations"))
      case (r @ References(cols, dim, dimCols, bcast), i) =>
        val keys = dim().select(dimCols.map(col): _*).toDF(cols: _*).distinct()
          .withColumn("__hit", lit(1))
        val parent = if (bcast) broadcast(keys) else keys
        // ONE scan of the child: left join + two conditional counts (the
        // anti-join-then-recount form scans the child twice)
        df.select(cols.map(col): _*)
          .na.drop("any") // dbt relationships: NULL child keys are skipped
          .join(parent, cols, "left")
          .agg(lit(i).as("rule_idx"), lit(r.name).as("rule"),
            count(lit(1)).as("n_checked"),
            count(when(col("__hit").isNull, 1)).as("n_violations"))
    }

    (scalarSummary.toSeq ++ groupedSummaries)
      .reduce(_ unionByName _)
      .withColumn("passed", col("n_violations") === 0L)
      .orderBy("rule_idx")
      .drop("rule_idx")
  }

  /** PER-PARTITION contract report — the incremental-warehouse form of
    * [[expect]]: scalar rules evaluated per `partitionCols` group (one
    * scan, one key-bounded groupBy — every counter is an algebraic sum,
    * so map-side partials apply), returning `(partitionCols..., rule,
    * n_checked, n_violations, passed)`. A pipeline that materializes
    * day×market partitions checks ONLY the partitions it just wrote and
    * appends the rows to the contract history table — full-table rescans
    * per run is the anti-pattern this exists to kill. Scalar rules only:
    * `unique`/`relationships` are cross-partition properties (a key can
    * collide across partitions), so they stay with [[expect]] over the
    * slice that owns them. */
  def expectBy(df: DataFrame, partitionCols: Seq[String],
               rules: Seq[Rule]): DataFrame = {
    require(partitionCols.nonEmpty, "partition columns required — use expect")
    require(rules.nonEmpty, "contract must declare at least one rule")
    val sr = scalarRules(rules)
    require(sr.size == rules.size,
      "expectBy takes scalar rules only (not_null / accepted_values / " +
        "accepted_range); unique and relationships are cross-partition " +
        "checks — run them through expect")
    val aggs = scalarAggColumns(sr)
    val one = df.groupBy(partitionCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    one.select(partitionCols.map(col) :+
        explode(array(scalarReportRows(sr): _*)).as("r"): _*)
      .select(partitionCols.map(col) :+ col("r.rule") :+
        col("r.n_checked") :+ col("r.n_violations") :+
        (col("r.n_violations") === 0L).as("passed"): _*)
  }
}
