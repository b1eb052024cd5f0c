package graft.functions

import org.apache.spark.sql.DataFrame

/** Eager, lineage-truncating materialization seam for iterative loop
  * drivers (pageRank, pointer-jumping connected components, the blocked
  * kNN home projection).
  *
  * Loop drivers MUST truncate lineage every round — composing k rounds
  * lazily builds an exponentially-nested plan that kills the analyzer
  * long before the executors see work. The truncation primitive differs
  * by deployment:
  *
  *   - no checkpoint dir configured (local mode, tests, bench):
  *     `localCheckpoint` — blocks live in executor storage memory,
  *     zero-copy fast, reclaimed by the context cleaner. Fine in a
  *     single JVM where an executor cannot die independently.
  *   - cluster with `SparkContext.setCheckpointDir(...)`: reliable
  *     `checkpoint` — blocks persist on the cluster FS and survive
  *     executor loss. This matters under dynamic allocation: a
  *     localCheckpoint block dies WITH its executor, and because the
  *     lineage was truncated there is nothing left to recompute from —
  *     the whole iterative job fails. Reliable checkpointing is the
  *     documented cluster posture for every loop driver in this repo
  *     (PLANS.md "Multi-node posture").
  *
  * The switch is the standard Spark operator knob (`setCheckpointDir`),
  * so cluster deployments opt in with configuration only — no code
  * changes, and nothing to misconfigure locally (tests and bench run
  * with no dir set and keep the fast in-memory path).
  */
object Ckpt {
  /** True when a reliable checkpoint directory is configured. */
  def reliable(df: DataFrame): Boolean =
    df.sparkSession.sparkContext.getCheckpointDir.isDefined

  /** Materialize `df` eagerly with truncated lineage (see object doc). */
  def materialize(df: DataFrame): DataFrame =
    if (reliable(df)) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
