package graft.functions

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.IntegerType

/** Deterministic task-failure injection — the retry-determinism harness.
  *
  * At 100 TB, task retries and speculative duplicates are ROUTINE (a
  * 1000-executor job sees preemptions, bad nodes, and fetch failures on
  * every run), so any operator whose output depends on attempt order is
  * silently wrong at scale even when every small-SF gate is green. The
  * order-sensitive operators here (zipWithIndex row ids, per-partition
  * prefix-scan offsets, heap-merge aggregates) are exactly the ones a
  * plain re-run can never falsify: the o23 gate and RetrySpec run them
  * UNDER injected first-attempt failures and demand byte-identical
  * output vs the clean run / SQL oracle.
  *
  * This is a test/gate harness, not a production operator: the identity
  * `mapPartitions` deliberately drops to the RDD seam (breaking codegen
  * fusion) because a Catalyst expression cannot fail a TASK — only raise
  * a query-level error — and the property under test lives in Spark's
  * task-retry machinery, below the plan.
  */
object Chaos {
  /** Identity pass-through that THROWS on the first attempt of every
    * even-numbered partition of its stage, succeeds on retry, and stamps
    * each surviving row with the attempt number that produced it
    * (`attemptCol`). Downstream asserts `max(attemptCol) >= 1` — proof
    * the failures actually fired — and then drops the column before any
    * hash-gated output (partition parity of a given row is split-planning
    * detail, not oracle-expressible). Requires a session whose master
    * allows retries (`local[N,F]` with F >= 2, or any real cluster).
    *
    * The throw is keyed on `attemptNumber == 0`, so EVERY stage that
    * re-executes this lineage re-injects (range-partition sampling jobs,
    * zipWithIndex's count pass, verdict re-reads) — each stage's even
    * partitions all fail once and recompute, exercising the retry path
    * repeatedly within one gate. */
  def injectTaskRetries(df: DataFrame, attemptCol: String = "__attempt"): DataFrame = {
    val schema = df.schema.add(attemptCol, IntegerType, nullable = false)
    val rdd = df.rdd.mapPartitions { it =>
      val tc = TaskContext.get()
      if (tc != null && tc.partitionId() % 2 == 0 && tc.attemptNumber() == 0)
        throw new RuntimeException("graft-chaos: injected first-attempt task failure " +
          s"(stage ${tc.stageId()}, partition ${tc.partitionId()})")
      val att = if (tc == null) 0 else tc.attemptNumber()
      it.map(r => Row.fromSeq(r.toSeq :+ att))
    }
    df.sparkSession.createDataFrame(rdd, schema)
  }
}
