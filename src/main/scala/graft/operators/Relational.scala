package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable relational operators covering SURVEY.md §2.3–§2.8 patterns.
  *
  * Every operator is a declarative DataFrame transform — Catalyst handles
  * pushdown/pruning/join-strategy; nothing here collects to the driver.
  */
object Relational {

  /** Unpivot wide measure columns into long `(nameCol, valueCol)` rows.
    * Reference: 37-column SQL UNPIVOT in the financials mart
    * (aave_dbt/models/datamart/all_financials.sql:419-424).
    * Uses the built-in `unpivot` (codegen'd Expand) — one pass, no shuffle.
    */
  def melt(df: DataFrame, idCols: Seq[String], measureCols: Seq[String],
           nameCol: String = "measure", valueCol: String = "value",
           dropNulls: Boolean = false): DataFrame = {
    val long = df.unpivot(idCols.map(col).toArray, measureCols.map(col).toArray, nameCol, valueCol)
    // dropNulls = BigQuery UNPIVOT's default EXCLUDE NULLS (the reference's
    // impact_proposal_* models rely on it); Spark's unpivot keeps null rows.
    if (dropNulls) long.filter(col(valueCol).isNotNull) else long
  }

  /** Pivot with deterministic output column naming `<value>_<agg>` — the
    * reference relies on BigQuery's `<agg>_<value>` names
    * (streaming_payments_summary.sql:60-68); we normalize to snake_case.
    * `values` must be supplied: a known pivot domain skips the extra
    * distinct-collection job AND keeps the output schema stable at any scale.
    */
  def pivotAgg(df: DataFrame, groupCols: Seq[String], pivotCol: String,
               values: Seq[String], aggs: Seq[(String, Column)]): DataFrame = {
    val pivoted = df.groupBy(groupCols.map(col): _*)
      .pivot(pivotCol, values)
      .agg(aggs.head._2.as(aggs.head._1), aggs.tail.map { case (n, c) => c.as(n) }: _*)
    // Spark names multi-agg pivot columns `<value>_<aggAlias>` already; for a
    // single agg it emits just `<value>` — normalize to `<value>_<aggAlias>`.
    if (aggs.size == 1) {
      values.foldLeft(pivoted) { (d, v) =>
        d.withColumnRenamed(v, s"${v}_${aggs.head._1}")
      }
    } else pivoted
  }

  /** Forward-fill: last non-null value per partition, ordered.
    * Reference: `last_value(x ignore nulls) over (... rows between unbounded
    * preceding and current row)` (market_config_by_hour.sql:27-30,
    * inv_defi_ref_rates_by_day.sql:27) and pandas ffill
    * (protocol_data_warehouse.py:406-407). ROWS frame (not RANGE) is load-
    * bearing when order keys tie — SURVEY §7.4(5).
    */
  def ffill(df: DataFrame, partitionCols: Seq[String], orderCols: Seq[String],
            fillCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fillCols.foldLeft(df)((d, c) => d.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
  }

  /** Dedup keep-last: one row per key, "last" by `orderCols` ascending —
    * the pandas `sort_values(...).drop_duplicates(subset, keep='last')` idiom
    * (aave_data/assets/financials/data_warehouse.py:706,751).
    * Window row_number desc + filter — a single shuffle on the key, no self-join.
    */
  def dedupKeepLast(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Greatest-1-per-group: the reference's min-rank self-join
    * (data_warehouse.py:509-518) re-expressed as a window — one shuffle
    * instead of aggregate+join (wins at 100 TB: no second scan, no join).
    */
  def topPerGroup(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Global DENSE row ids in a total order — WITHOUT the single-partition
    * window a naive `row_number() OVER (ORDER BY ...)` plans (which funnels
    * the whole table through one task). The parallel shape:
    *
    *   1. range-partitioned parallel sort on the order columns;
    *   2. `zipWithIndex`: per-partition counts (one lightweight job), then
    *      each partition stamps `offset + local index` map-side.
    *
    * Ids are contiguous 1..N and deterministic as long as `orderCols` is a
    * total order (pass a tie-break key). This is the scalable twin of the
    * accepted-single-partition global windows (o1 top-k, a17 heavy
    * hitters, which run over already-tiny inputs).
    */
  def globalRowIds(df: DataFrame, orderCols: Seq[Column],
                   idName: String = "row_id"): DataFrame =
    zipRowIds(df.orderBy(orderCols: _*), idName)

  /** The zip half of [[globalRowIds]]: stamp contiguous 1..N ids onto an
    * ALREADY-SORTED frame. Exposed separately because `zipWithIndex`
    * computes its per-partition offsets in an EAGER job at construction —
    * the sort subtree executes once for the offsets and again for every
    * downstream action — so callers that pay a large sort (the exact-
    * quantile family) persist the sorted frame first and hand it here,
    * halving the sort count; callers with cheap inputs use
    * [[globalRowIds]] unchanged. */
  def zipRowIds(sorted: DataFrame, idName: String = "row_id"): DataFrame = {
    val spark = sorted.sparkSession
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(idName,
          org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** SCD TYPE-2 interval build: collapse a change log into versioned
    * dimension rows with validity ranges — the warehouse dimension-
    * versioning step (the reference keeps only latest-state models, e.g.
    * market_config_by_day's ffill; SCD2 is the general form that also
    * answers "what was the config ON day X" without storing every day).
    *
    *   - rows where none of `trackCols` changed vs the previous row (per
    *     key, in `orderCols` order) are dropped (they extend the current
    *     version, null-safely compared so null→value and value→null both
    *     count as changes);
    *   - each surviving change point opens a version: `valid_from` = its
    *     `orderCols.head`, `valid_to` = the NEXT change point's (null =
    *     still current, flagged `is_current`).
    *
    * Two window passes over the same (key, order) shuffle — Catalyst plans
    * them into one Exchange + two Window execs, no self-join; at 100 TB
    * the log shuffles once on the entity key.
    */
  def scd2(log: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
           trackCols: Seq[String]): DataFrame = {
    require(trackCols.nonEmpty, "trackCols must be non-empty")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
    // The first row per key must open a version even when its tracked
    // value is null (null <=> null is TRUE, so the attribute comparison
    // alone would drop it) — detect "first" with a lag over a constant.
    val isFirst = lag(lit(1), 1).over(w).isNull
    val changed = isFirst || trackCols
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val points = log.withColumn("__chg", changed)
      .filter(col("__chg")).drop("__chg")
    // New DataFrame → the lead window ranges over change points only.
    points
      .withColumn("valid_from", col(orderCols.head))
      .withColumn("valid_to", lead(col(orderCols.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Union-by-name with missing columns padded by literals (default 0) —
    * the datamart's schema-aligned UNION ALL idiom where absent measures are
    * zero-filled (all_financials.sql:17-82; market_state_by_time.sql:4-56).
    */
  def unionPadded(dfs: Seq[DataFrame], pad: Column = lit(0.0)): DataFrame = {
    val allCols: Seq[String] = dfs.flatMap(_.columns).distinct
    dfs.map { d =>
      val have = d.columns.toSet
      d.select(allCols.map(c => if (have(c)) col(c) else pad.as(c)): _*)
    }.reduce(_.unionByName(_))
  }

  /** Guarded division — `safe_div` (protocol_data_warehouse.py:196-198). */
  def safeDiv(x: Column, y: Column, default: Column = lit(0.0)): Column =
    when(y =!= 0, x / y).otherwise(default)

  /** Salted join for skewed keys: the big (skewed) side gets a
    * deterministic salt in [0, nSalts) derived from `saltFrom` (any
    * high-cardinality column — an id, a timestamp); the small side is
    * exploded ×nSalts so every (key, salt) bucket still finds its match.
    * A hot key's rows then spread over nSalts shuffle partitions instead
    * of one straggler. Use when AQE's skew-join can't help (e.g. the skew
    * is in a window/aggregation feeding the join, or on a join type AQE
    * skew handling doesn't cover); costs nSalts× the small side's shuffle
    * volume, so keep the small side small.
    */
  /** Constant-valued but optimizer-proof partition key for DELIBERATE
    * single-partition windows over frames already bounded small
    * (post-limit ranks, post-agg share-of-total). `partitionBy(lit(0))`
    * looks right but is a placebo: Catalyst's `EliminateWindowPartitions`
    * strips FOLDABLE partition keys, the spec degrades to unpartitioned,
    * and WindowExec's no-partition warning fires anyway (discovered round
    * 12 — the r11 "hygiene" fix never silenced anything; verified against
    * executed plans). `hash(anchor) * 0` dies the same way — the
    * arithmetic simplifier folds multiply-by-zero before the window rule
    * looks. `pmod(hash(anchor), 1)` is 0 on every row but survives (no
    * rule knows pmod-by-one): one partition, no warning — and a REAL
    * unpartitioned window in a log now means a real bug. Never use on
    * corpus-sized input. */
  def onePartKey(anchor: Column): Column = pmod(hash(anchor), lit(1))

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFrom: String, nSalts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(nSalts > 0, "nSalts must be positive")
    // Only join types that never emit UNMATCHED small-side rows are sound:
    // under right/full outer each unmatched small-side row would surface
    // once per exploded salt copy (nSalts duplicates).
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti").contains(jt),
      s"saltedJoin supports inner/left/left_semi/left_anti only (got '$joinType'): " +
        "right/full outer would duplicate unmatched small-side rows nSalts times")
    val salted = big.withColumn("__salt", pmod(hash(col(saltFrom)), lit(nSalts)))
    val exploded = small.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(exploded, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Latest-snapshot filter: keep rows where `tsCol` equals the global max —
    * the `where block_day = (select max(block_day) ...)` idiom
    * (treasury_totals_latest.sql:10). The max is computed as a partial-agg
    * (map-side combine, no row movement beyond 1-row-per-partition) and
    * broadcast back as a 1-row cross join — never a global window, which
    * would shuffle the ENTIRE input into a single partition.
    */
  def latestOnly(df: DataFrame, tsCol: String): DataFrame = {
    val mx = df.agg(max(col(tsCol)).as("__mx"))
    df.crossJoin(broadcast(mx))
      .filter(col(tsCol) === col("__mx"))
      .drop("__mx")
  }

  /** Row-level upsert (MERGE emulation over immutable storage): rows of
    * `base` whose key appears in `updates` are replaced by the update row;
    * all other base rows pass through; update rows with new keys insert.
    * One anti-join shuffle on the key + a union — the standard
    * rewrite-on-merge for parquet-backed tables (the reference's
    * delete-then-append partition idempotency, applied at row grain).
    * Schemas must align by name. `updates` must be unique per key
    * (dedupKeepLast it first otherwise) — duplicate update keys pass
    * through as duplicate rows, same as SQL MERGE's multiple-match error
    * case except not detected here.
    */
  def upsert(base: DataFrame, updates: DataFrame, keys: Seq[String]): DataFrame =
    base.join(updates.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(updates)

  /** Apply a CDC changelog to a base snapshot: `changes` carries the base
    * columns plus an op column (`I`/`U` upsert, `D` delete) and a sequence
    * column; per key the HIGHEST-sequence change wins, and the result is
    * base rows untouched by any change + the surviving upserts — the
    * generalization of [[upsert]] to logs with deletes and multiple
    * changes per key (the reference's delete-then-append idempotency at
    * row grain, driven by a log instead of a full partition).
    *
    * Shape: one window shuffle on the changelog keys (changelog ≪ base in
    * any incremental pipeline) + one anti-join on base, broadcast-able
    * when the day's key set fits. `seqCol` must totally order each key's
    * changes (ties would make the winner nondeterministic — pass a
    * composite `struct(ts, log_offset)` if sequence numbers repeat).
    * A NULL op is treated as an upsert (`U`): `null =!= "D"` evaluates to
    * null and would silently FILTER the row — i.e. treat a malformed
    * change as a delete of its key — so the op is coalesced first.
    */
  def applyCdc(base: DataFrame, changes: DataFrame, keys: Seq[String],
               seqCol: String, opCol: String): DataFrame = {
    val latest = topPerGroup(changes, keys, Seq(col(seqCol).desc))
    val survivors = latest.filter(upper(coalesce(col(opCol), lit("U"))) =!= "D")
      .select(base.columns.toSeq.map(col): _*)
    base.join(latest.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(survivors)
  }

  /** Keyed snapshot reconciliation — the diff report every warehouse
    * publishes when a table is rebuilt or re-ingested: classify each key
    * as `added` (only in `after`), `removed` (only in `before`),
    * `changed` (present in both, any `compareCols` value differs,
    * null-safely) or `unchanged`. Returns per-key rows `(keys...,
    * diff_status)` plus, for `changed` keys, one `chg_<col>` boolean per
    * compared column — the per-column attribution a reconciliation
    * report needs ("which columns drifted?").
    *
    * One full-outer join on the key columns = one co-partitioned shuffle
    * of both snapshots; compare columns evaluate in the joined
    * projection (no second pass). At 100 TB, bucket both snapshots by
    * the key to make the shuffle a zipper merge.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame, keys: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    val b = before.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_b", lit(1))
      .toDF(keys ++ compareCols.map("__b_" + _) ++ Seq("__in_b"): _*)
    val a = after.select((keys ++ compareCols).map(col): _*)
      .withColumn("__in_a", lit(1))
      .toDF(keys ++ compareCols.map("__a_" + _) ++ Seq("__in_a"): _*)
    val joined = b.join(a, keys, "full")
    val anyChanged = compareCols
      .map(c => !(col("__b_" + c) <=> col("__a_" + c)))
      .reduceOption(_ || _).getOrElse(lit(false))
    val status = when(col("__in_b").isNull, "added")
      .when(col("__in_a").isNull, "removed")
      .when(anyChanged, "changed")
      .otherwise("unchanged")
    val chgCols = compareCols.map { c =>
      when(status === "changed", !(col("__b_" + c) <=> col("__a_" + c)))
        .as(s"chg_$c")
    }
    joined.select(keys.map(col) ++ Seq(status.as("diff_status")) ++ chgCols: _*)
  }
}
