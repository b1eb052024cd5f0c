package graft.sources

import org.apache.spark.sql.DataFrame

/** Sinks (SURVEY.md §2.2 K1–K4).
  *
  * The reference's writer is delete-partition-then-append into BigQuery
  * (bigquery_io_manager.py:115-167). The Spark-native equivalent is dynamic
  * partition overwrite on partitioned Parquet: only partitions present in
  * the incoming frame are replaced — idempotent re-materialization of any
  * (date, market) slice without touching the rest of a 100 TB table.
  */
object Sinks {

  /** K1 — idempotent partition overwrite. The dynamic mode is pinned as a
    * PER-WRITE option (not inherited from the session conf): on a static-
    * mode session, `mode("overwrite").partitionBy(...)` would silently
    * truncate the whole table and keep only the incoming partitions — the
    * exact data-loss failure this sink exists to prevent. The write-level
    * option overrides the session conf, so the sink is safe under any
    * session (GraftSession also sets the conf, for writes outside Sinks).
    */
  def overwritePartitions(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** K2 — append-only sink for non-idempotent snapshot feeds
    * (append_only: True — __init__.py:103-112; liquidity-depth snapshots).
    * Downstream dedups by min(fetch_time) per key, ported as
    * Relational.dedupKeepLast / topPerGroup. */
  def appendOnly(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("append")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).parquet(path)
  }

  /** K3 — full-table overwrite (every dbt datamart model is
    * materialized='table'). */
  def replaceTable(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** K4 — metadata emission: row count + head preview, the reference logs
    * these per write (data_lake.py:134-139). Returns (count, previewLines).
    */
  def describe(df: DataFrame, previewRows: Int = 5): (Long, Array[String]) = {
    val n = df.count()
    val head = df.take(previewRows).map(_.toString)
    (n, head)
  }

  /** Bucketed table write — the co-located-join primitive (SURVEY §4): two
    * tables bucketed (and sort-ordered) on their join key with the same
    * bucket count join WITHOUT a shuffle on either side — the scan's bucket
    * layout satisfies the join's required distribution. At 100 TB this is
    * the difference between re-shuffling the fact table per join and never
    * shuffling it at all; pay the clustering once at write time, every
    * downstream join reads it back for free. `saveAsTable` is required
    * (bucket metadata lives in the catalog, not the parquet files).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    nBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Small-file COMPACTION — the housekeeping pass every incremental
    * pipeline needs at scale: an append-only feed (K2) or per-partition
    * micro-batch writer leaves thousands of KB-sized files per partition,
    * and scan cost degrades to file-open cost (driver listing, footer
    * reads, no intra-file parallelism). Rewrites the source as one task
    * per partition (`repartition` on the partition columns — a single
    * hash shuffle), with `maxRecordsPerFile` re-splitting oversized
    * partitions into bounded files map-side.
    *
    * Writes to `dstPath` rather than in place: Spark refuses to overwrite
    * a path it is reading (correctly — a mid-job failure would destroy
    * the source). The caller swaps directories afterwards (the same
    * publish discipline as the reference's delete-then-append, at table
    * grain); incremental pipelines instead compact ONLY cold partitions
    * by passing a `filter` and dynamic-overwriting them back.
    */
  def compactTo(spark: org.apache.spark.sql.SparkSession, srcPath: String,
                dstPath: String, partitionCols: Seq[String],
                maxRecordsPerFile: Long = 5000000L,
                filter: org.apache.spark.sql.Column =
                  org.apache.spark.sql.functions.lit(true)): Unit = {
    import org.apache.spark.sql.functions.col
    val df = spark.read.parquet(srcPath).filter(filter)
    val repartitioned =
      if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
      else df.coalesce(math.max(1, spark.sparkContext.defaultParallelism / 4))
    val w = repartitioned.write
      .mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(dstPath)
  }

  /** Range-sorted table layout — sorted-at-rest parquet for SKIPPING, the
    * complement of [[writeBucketed]] (which optimizes equi-joins):
    * `repartitionByRange` gives globally disjoint per-file key ranges and
    * `sortWithinPartitions` orders rows inside each file, so parquet
    * row-group min/max statistics turn any range or point predicate on the
    * sort key into file- and row-group-level skipping at scan time. At
    * 100 TB this is what makes "last 7 days" or "lang = 'en'" read 0.1%
    * of the files instead of filtering 100% of the rows; pay one range
    * shuffle at write time (sampling-based partitioner — balanced output
    * files even on skewed keys), every selective scan afterwards is
    * pruned. SinksSpec proves per-file ranges are pairwise disjoint.
    */
  def writeRangeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                       nRanges: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(nRanges, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Row-group-BOUNDED parquet write — the scan-parallelism and
    * skew-defense insurance the round-12 skew audit showed is part of a
    * table's layout contract (PLANS.md §"The skew campaign"): AQE's
    * skew-join splitter cuts a hot shuffle partition along MAP
    * boundaries, and a file written as ONE giant row group yields
    * byte-range scan splits of which only one contains any rows — the
    * skew becomes invisible to AQE (observed in the audit:
    * 10 of 11 splits read zero rows and `createSkewPartitionSpecs`
    * silently declined on a 6.1x-skewed partition). Bounding
    * `parquet.block.size` caps each row group's extent so every
    * `maxPartitionBytes`-sized split maps to at least one real row
    * group — restoring intra-file scan parallelism AND AQE's map
    * granularity. The knob is per-write (a parquet writer option, not a
    * session flip), so hot fact tables opt in without touching dim
    * writes; `saltedJoin` stays the defense that needs no layout help.
    */
  def writeRowGroupBounded(df: DataFrame, path: String,
                           rowGroupBytes: Long = 8L * 1024 * 1024,
                           partitionCols: Seq[String] = Nil): Unit = {
    require(rowGroupBytes >= 1L * 1024 * 1024,
      "row groups below 1 MiB make footer/page overhead dominate the scan")
    val w = df.write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Z-ORDERED table layout — multi-dimensional skipping, the lakehouse
    * technique [[writeRangeSorted]] cannot provide: a single-key sort
    * gives file-skipping power on that key ONLY (every file still spans
    * the full range of every other column); interleaving the bits of
    * per-column rank buckets into a Morton code and range-partitioning on
    * it bounds EVERY indexed dimension's per-file min/max extent to
    * ~1/2^(totalBits/k), so predicates on ANY of the k columns skip files.
    * All pure Catalyst: per-column linear bucketing against driver-collected
    * min/max (one tiny agg — 2k doubles), bit interleave via
    * shiftleft/shiftright/bitwiseAND folds, then the same
    * repartitionByRange + sortWithinPartitions + parquet-stats contract as
    * the range layout. Columns must be numeric/date/timestamp (cast to
    * double for bucketing — rank fidelity, not value fidelity, is what
    * matters for clustering).
    */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    nFiles: Int, bitsPerCol: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    require(zCols.size >= 2, "z-ordering needs >= 2 columns (use writeRangeSorted for 1)")
    require(bitsPerCol >= 1 && bitsPerCol * zCols.size <= 62, "bit budget must fit a long")
    // rank-bucketing needs a DOUBLE view of each column; temporal types
    // don't cast to double directly, so route them through an epoch cast
    def asD(c: String): org.apache.spark.sql.Column =
      df.schema(c).dataType match {
        case org.apache.spark.sql.types.DateType =>
          datediff(col(c), to_date(lit("1970-01-01"))).cast("double")
        case org.apache.spark.sql.types.TimestampNTZType =>
          col(c).cast("timestamp_ltz").cast("double")
        case _ => col(c).cast("double")
      }
    val stats = df.select(zCols.flatMap(c =>
      Seq(min(asD(c)).as(s"mn_$c"), max(asD(c)).as(s"mx_$c"))): _*).head()
    // an all-null column has null min/max: it contributes no skipping
    // power — drop it from the interleave (single-column remainder
    // degrades to the plain range layout) instead of failing the write
    val live = zCols.zipWithIndex.filterNot { case (_, j) => stats.isNullAt(2 * j) }
    if (live.size < 2) {
      writeRangeSorted(df, path,
        if (live.nonEmpty) live.map(_._1) else zCols.take(1), nFiles)
      return
    }
    val levels = (1L << bitsPerCol) - 1
    val buckets = live.map { case (c, j) =>
      val (mn, mx) = (stats.getDouble(2 * j), stats.getDouble(2 * j + 1))
      val span = if (mx > mn) mx - mn else 1.0
      least(lit(levels), greatest(lit(0L),
        floor((asD(c) - lit(mn)) / lit(span) * levels).cast("long")))
    }
    val stride = live.size
    val z = (0 until bitsPerCol).foldLeft(lit(0L)) { (acc, bit) =>
      buckets.zipWithIndex.foldLeft(acc) { case (a, (b, j)) =>
        a.bitwiseOR(shiftleft(shiftright(b, bit).bitwiseAND(lit(1L)), bit * stride + j))
      }
    }
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
