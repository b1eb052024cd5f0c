package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session keeps the
  * suite fast; Spark sessions are expensive to start). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // "local[4,3]": allow task retries (maxFailures=3) — RetrySpec injects
      // first-attempt task failures; behavior is identical unless a task fails
      .master("local[4,3]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // ObjectHashAggregate (TypedImperativeAggregate buffers, e.g. the
      // bounded top-k heap) falls back to SORT-based aggregation after only
      // 128 distinct in-memory groups by default — which re-sorts the whole
      // candidate stream and defeats the point of a k-bounded buffer. Heap
      // states here are tiny (k entries), so let the hash map grow.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (4 * 1024 * 1024).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      // Spark 4.1 async checkpoint-file checksum writes hang stateful
      // (mapGroupsWithState) state-store commits in local mode — the
      // close() awaits a checksum future that never completes.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  // sf0.001 corpus for integration-style specs
  val sfDir = "/root/testdata/sf0.001"
}
