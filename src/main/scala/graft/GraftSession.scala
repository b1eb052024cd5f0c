package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configuration posture this engine assumes.
  *
  * Design notes (100 TB posture):
  *   - AQE on: runtime coalescing of shuffle partitions + skew-join splitting
  *     replaces hand-tuned partition counts when the same plans run on a
  *     1000-executor cluster.
  *   - `partitionOverwriteMode=dynamic`: idempotent partition re-materialization,
  *     the Spark equivalent of the reference's delete-then-append writer
  *     (aave_data/resources/bigquery_io_manager.py:115-167).
  *   - session TZ pinned to UTC: the reference canonicalizes all timestamps to
  *     UTC (aave_data/resources/helpers.py:687-688).
  */
object GraftSession {

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // ObjectHashAggregate (TypedImperativeAggregate buffers, e.g. the
      // bounded top-k heap) falls back to SORT-based aggregation after only
      // 128 distinct in-memory groups by default — which re-sorts the whole
      // candidate stream and defeats the point of a k-bounded buffer. Heap
      // states here are tiny (k entries), so let the hash map grow.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (4 * 1024 * 1024).toString)
      // testdata events.parquet carries TIMESTAMP(NANOS); Spark reads it as
      // LongType epoch-nanos under this flag (convert via timestamp_micros).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.parquet.compression.codec", "zstd")
      // SQL surface for the native vector expressions (graft_dot/_cosine)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Spark 4.1 async checkpoint-file checksum writes hang stateful
      // state-store commits in local mode (close() awaits a checksum
      // future that never completes) — disable; corruption detection on
      // checkpoints is not worth a wedged stream here.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val s = builder().getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
