package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Sinks

/** Partition-aware job runner — the orchestration shim replacing the
  * reference's Dagster jobs + partition definitions (aave_data/__init__.py:
  * jobs 286-311, schedules 374-434, partition defs data_lake.py:58-63).
  *
  * A `Job` is a named transform over a resolved partition; the runner
  * materializes it idempotently (dynamic partition overwrite — the
  * delete-then-append twin) or append-only (K2 feeds). Partition semantics:
  *
  *   - `DailyByMarket(date, market)` ≅ the date×market MultiPartition;
  *   - `Daily(date)` ≅ the daily partition;
  *   - `HourlyByMarket(hour, market)` ≅ the hourly×market partition;
  *   - cross-partition reads (LastPartitionMapping — hourly asset reading
  *     the latest daily dim) are plain filters on the consumed table:
  *     `Relational.latestOnly(dim, "block_day")`.
  *
  * Cron cadence is external (any scheduler invoking `Runner.run`); the
  * engine's contract is only deterministic partition re-materialization.
  */
object Runner {

  sealed trait Partition {
    /** Partition-column values this run writes (and therefore replaces). */
    def values: Map[String, String]
  }
  final case class Daily(date: String) extends Partition {
    def values = Map("date" -> date)
  }
  final case class DailyByMarket(date: String, market: String) extends Partition {
    def values = Map("date" -> date, "market" -> market)
  }
  final case class HourlyByMarket(hour: String, market: String) extends Partition {
    def values = Map("hour" -> hour, "market" -> market)
  }

  /** One materializable asset: given (spark, partition) produce the frame
    * for EXACTLY that partition. `appendOnly` marks non-idempotent snapshot
    * feeds (K2 — __init__.py:103-112). */
  final case class Job(name: String,
                       outPath: String,
                       appendOnly: Boolean = false)(
                       val compute: (SparkSession, Partition) => DataFrame)

  /** Materialize `job` for `partition`: stamp the partition columns, then
    * dynamic-partition-overwrite (idempotent re-run of any historical
    * partition without touching siblings) or append. Returns row count. */
  def run(spark: SparkSession, job: Job, partition: Partition): Long = {
    val df0 = job.compute(spark, partition)
    val stamped = partition.values.foldLeft(df0) { case (d, (k, v)) =>
      if (d.columns.contains(k)) d else d.withColumn(k, lit(v))
    }
    val withLoadTs = stamped.withColumn("load_ts", current_timestamp())
    val n = withLoadTs.count()
    val partCols = partition.values.keys.toSeq
    if (job.appendOnly) Sinks.appendOnly(withLoadTs, job.outPath, partCols)
    else Sinks.overwritePartitions(withLoadTs, job.outPath, partCols)
    n
  }

  /** Backfill a list of partitions sequentially (the Dagster backfill
    * equivalent; each partition is independently idempotent). */
  def backfill(spark: SparkSession, job: Job, partitions: Seq[Partition]): Seq[(Partition, Long)] =
    partitions.map(p => p -> run(spark, job, p))
}
