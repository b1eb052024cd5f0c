package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Loaders for the driver-generated test corpus (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst column pruning and
  * predicate pushdown reach the scan; callers should `select`/`filter` early
  * and let the optimizer prune.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // The engine's event-time contract is integer epoch-NANOS (exact gap /
    // bucket / as-of arithmetic cross-engine; DuckDB twins use epoch_ns(ts)).
    // Early corpus drops wrote `events.ts` as parquet TIMESTAMP(NANOS), which
    // Spark surfaces as epoch-nanos LongType under nanosAsLong; later drops
    // write TIMESTAMP(MICROS), which surfaces as TimestampType. Normalize at
    // the only read point so the contract is schema-drift-proof. unix_micros
    // is a pure Catalyst cast that folds into the scan projection and costs
    // no shuffle; parquet COLUMN PRUNING still applies, but a filter on the
    // normalized `ts` is an expression over the scan attribute and does NOT
    // push down to the parquet reader — apply ts-range filters before
    // normalization if scan pushdown ever matters (no current query does).
    if (name == "events") {
      // The NTZ→TZ cast below is the identity on the underlying micros ONLY
      // when the session TZ is UTC; under any other TZ it would silently
      // shift every event time by the local offset. Fail loudly instead.
      require(spark.conf.get("spark.sql.session.timeZone") == "UTC",
        "graft sessions must pin spark.sql.session.timeZone=UTC — the " +
        "events.ts NTZ normalization is only offset-free under UTC")
      val norm: Seq[Column] = df.schema.fields.toSeq.map { f =>
        // timestamp[us] parquet surfaces as TIMESTAMP_NTZ (no tz annotation)
        // or TIMESTAMP depending on the writer; session TZ is pinned UTC, so
        // the NTZ→TZ cast is the identity on the underlying micros value.
        if (f.name == "ts" &&
            (f.dataType == TimestampType || f.dataType == TimestampNTZType))
          (unix_micros(col("ts").cast(TimestampType)) * 1000L).as("ts")
        else col(f.name)
      }
      df.select(norm: _*)
    } else df
  }

  /** Register every corpus table as a temp view (for spark.sql query bodies). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
