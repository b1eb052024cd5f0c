package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual semi-join pruning with Spark's own bloom-filter sketch (the
  * machinery behind AQE runtime filters, reachable via the
  * `GraftExtensions`-registered `graft_bloom_agg` / `graft_might_contain`).
  *
  * Use when the optimizer can't inject the filter itself — across
  * materialization boundaries (the key set comes from another job, a
  * different table, a collected config), or ahead of an aggregation that
  * precedes the join. The sketch is built with one small-side aggregate,
  * collected (it is KB-sized by construction) and inlined as a binary
  * literal, so the big-side probe is a map-side codegen'd predicate that
  * reaches the scan — no shuffle, no false negatives, false positives only
  * cost re-reading rows the later exact join drops anyway.
  */
object Prune {

  /** Build a bloom sketch of `key` over `df` and return it as a foldable
    * binary literal column. `nBits` sizes the false-positive rate
    * (~0.03 at 8 bits/key; Spark's might_contain requires a constant or
    * scalar-subquery sketch, hence the collect-and-inline). */
  def bloomLiteral(df: DataFrame, key: Column, nItems: Long, nBits: Long): Column =
    lit(bloomBytes(df, key, nItems, nBits))

  /** The raw serialized sketch — the persistable form of [[bloomLiteral]]
    * (KB–MB by construction). Save with [[saveSketch]], re-enter a later
    * job via `lit(loadSketch(...))` — the probe is then identical to an
    * inline build (PersistSpec pins the round trip). */
  def bloomBytes(df: DataFrame, key: Column, nItems: Long, nBits: Long): Array[Byte] =
    df.agg(expr_agg(key, nItems, nBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")

  /** Persist a serialized sketch as a 1-row parquet table (staying in the
    * warehouse's own storage/permission model rather than a side file). */
  def saveSketch(spark: org.apache.spark.sql.SparkSession, path: String,
                 bytes: Array[Byte]): Unit = {
    import spark.implicits._
    Seq(Tuple1(bytes)).toDF("sketch").write.mode("overwrite").parquet(path)
  }

  /** Load a sketch saved by [[saveSketch]]. */
  def loadSketch(spark: org.apache.spark.sql.SparkSession, path: String): Array[Byte] =
    spark.read.parquet(path).head().getAs[Array[Byte]]("sketch")

  private def expr_agg(key: Column, nItems: Long, nBits: Long): Column =
    org.apache.spark.sql.GraftColumns.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        org.apache.spark.sql.GraftColumns.expression(xxhash64(key)),
        org.apache.spark.sql.catalyst.expressions.Literal(nItems),
        org.apache.spark.sql.catalyst.expressions.Literal(nBits))
        .toAggregateExpression())

  /** Probe predicate: true iff `key` might be in the sketch. Guaranteed
    * true for every key the sketch was built from. */
  def mightContain(bloom: Column, key: Column): Column =
    org.apache.spark.sql.GraftColumns.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.GraftColumns.expression(bloom),
        org.apache.spark.sql.GraftColumns.expression(xxhash64(key))))
}
