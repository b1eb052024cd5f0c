package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.types.StructType

/** Source adapters (SURVEY.md §2.1 S1–S12).
  *
  * The reference's extraction layer is driver-side HTTP/RPC fetch → small
  * DataFrame (blocks, token dims, oracle prices, quotes). The engine models
  * every source as a `SourceAdapter`: fetch rows (from the network in
  * production, from fixture files in tests/offline), declare an explicit
  * schema, and hand Catalyst a DataFrame. Bulk facts (S5 CSV, S12 warehouse
  * reads) go straight through `spark.read` so pushdown/pruning reach the
  * scan.
  */
trait SourceAdapter {
  def name: String
  def schema: StructType
  def fetch(spark: SparkSession): DataFrame
}

/** S12 — warehouse table read with partition pruning: the Spark twin of
  * `SELECT * EXCEPT(meta) FROM ds.table WHERE _dagster_partition_key='…'`
  * (bigquery_io_manager.py:251-316). Filters on partition columns are
  * pruned by Catalyst before any file is opened.
  */
object WarehouseSource {
  def read(spark: SparkSession, path: String, partitionFilters: Map[String, String] = Map.empty): DataFrame = {
    val df = spark.read.parquet(path)
    partitionFilters.foldLeft(df) { case (d, (k, v)) => d.filter(d(k) === v) }
  }
}

/** S9/S5 — CSV seed / CSV-over-HTTP scan (data_lake.py:1409-1446;
  * helpers.py:168-261). Header + explicit schema; in production the bytes
  * come from the API, offline from a fixture path. */
object CsvSource {
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
}

/** S1–S4, S6–S8, S10–S11 — driver-side fetch sources (REST JSON, GraphQL,
  * RPC eth_call/multicall, paginated scans, federated SQL, quote sweeps).
  * Production impls loop/paginate/retry on the driver and build `Seq[Row]`;
  * the engine-facing contract is only `rows → createDataFrame(rows, schema)`.
  * `FixtureSource` is the offline twin used by every test.
  */
final case class FixtureSource(name: String, schema: StructType, rows: Seq[Row]) extends SourceAdapter {
  def fetch(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
}

/** Retry with exponential backoff + jitter — the reference wraps every
  * network/DB call in this policy (helpers.py:20-21,192-204: initial 0.01 s,
  * ×2, max 10 retries). Driver-side utility for production source impls.
  */
object Retry {
  /** `retryable` classifies failures (round 13, the reference's 400
    * posture — helpers.py:1003-1010): a non-retryable error (e.g. HTTP
    * 400, a malformed request no retry can fix) propagates immediately
    * instead of burning the whole backoff schedule against a caller bug. */
  def withBackoff[T](maxRetries: Int = 10, initialDelayMs: Long = 10,
                     jitterMs: Long = 250,
                     retryable: Throwable => Boolean = _ => true)(op: => T): T = {
    var attempt = 0
    var delay = initialDelayMs
    while (true) {
      try return op
      catch {
        case e: Exception if attempt < maxRetries && retryable(e) =>
          attempt += 1
          Thread.sleep(delay + scala.util.Random.nextLong(jitterMs))
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** S-family extension (round 12): JSON-LINES bulk source — the format
  * raw web-scraped training corpora actually arrive in. Two contracts a
  * 100 TB ingest cannot do without:
  *
  *  1. EXPLICIT schema. Schema inference is a full extra pass over the
  *     corpus before the real scan even starts; at ingest scale that
  *     doubles the I/O bill. Callers declare what they expect.
  *  2. PERMISSIVE corrupt-record quarantine. One mangled line out of
  *     billions must not kill the job (FAILFAST) or silently vanish
  *     (DROPMALFORMED loses the evidence). Bad lines surface with every
  *     declared column null and the RAW LINE preserved in
  *     `quarantineCol` — filterable into a quarantine table for replay
  *     after the upstream fix.
  *
  * Caveat (Spark contract): a query whose referenced columns include
  * ONLY the corrupt-record column is rejected by the JSON relation —
  * always select/aggregate it alongside a data column (the k13 gate and
  * SourcesSpec do).
  */
object JsonLinesSource {
  val DefaultQuarantineCol = "_corrupt_record"
  def read(spark: SparkSession, path: String, schema: StructType,
           quarantineCol: String = DefaultQuarantineCol): DataFrame =
    spark.read
      .schema(schema.add(quarantineCol, org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", quarantineCol)
      .json(path)
}
