package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge DataFrames — the third member of
  * the graph family (connected components: Dedup.connectedComponents;
  * triangle enumeration: d8). Everything is expressed as joins/aggregations
  * so Catalyst plans them like any other relational op: no vertex-program
  * runtime, no driver-side adjacency.
  */
object Graph {

  /** One PageRank power-iteration step.
    *
    * rank'(v) = (1−d)/N + d · Σ_{(u,v) ∈ E} rank(u) / out_deg(u)
    *
    * `ranks` carries the previous iteration's (node, rank); when absent the
    * uniform 1/N start vector is derived in-plan (scalar aggregate
    * cross-joined — N never touches the driver). Dangling nodes (no
    * out-edges) keep only the teleport term, the textbook simple variant —
    * document the mass leak or renormalize downstream if running to
    * convergence.
    *
    * Plan shape at scale: out-degrees are one map-side-combinable groupBy
    * on src; contributions join edges to ranks+degrees on src (both sides
    * shuffle on src once — AQE broadcasts the rank/degree side when it
    * fits) and aggregate on dst with partial sums. The widest stages carry
    * (src, dst) id pairs and (node, double) ranks only. For more than a
    * step or two, use [[pageRank]] — it hoists vertices/N/degrees out of
    * the loop instead of re-deriving them through lineage every round.
    */
  def pageRankStep(edges: DataFrame, srcCol: String, dstCol: String,
                   damping: Double = 0.85,
                   ranks: Option[DataFrame] = None): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val verts = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nDf = verts.agg(count(lit(1)).as("__n"))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    step(e, verts, nDf, deg, damping,
      ranks.map(_.select(col("node").cast("long").as("node"),
          col("rank").cast("double").as("rank")))
        .getOrElse(uniform(verts, nDf)))
  }

  /** PageRank power iteration, run to `iters` rounds (or until the L1
    * rank delta drops under `tol`, when positive) — the loop driver for
    * [[pageRankStep]], with the connectedComponents discipline:
    *
    *   - vertices, N and out-degrees are derived ONCE and materialized
    *     (localCheckpoint) before the loop — a naive step composition
    *     re-runs `distinct` over the full edge list every round through
    *     lineage;
    *   - the edge list is persisted pre-partitioned on `src`, the join
    *     key of every round, so the per-round contribution join never
    *     re-exchanges the (big) edge side;
    *   - ranks localCheckpoint every `checkpointEvery` rounds: between
    *     checkpoints the rounds stay LAZY (one fused plan, no
    *     per-round job), and the checkpoint bounds plan depth and
    *     lineage for arbitrary `iters`;
    *   - when `tol` > 0, the L1 delta vs the previous checkpoint rides
    *     the checkpoint's materialization job as an observed metric
    *     (CollectMetrics — no separate count job), giving early stop
    *     and a convergence trace without extra passes.
    *
    * Per-round ranks are rounded to 1e-6 (same contract as
    * [[pageRankStep]]) — deterministic across engines and partitionings,
    * which is what makes the 3-iteration oracle query (g2) exactly
    * hash-comparable against DuckDB's unrolled closure.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, damping: Double = 0.85,
               tol: Double = 0.0, checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(checkpointEvery >= 1, "checkpointEvery must be >= 1")
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .repartition(col("src"))
      .persist(MEMORY_AND_DISK)
    // one eager fill job, then every hoisted table below reads the cache
    e.foreachPartition((_: Iterator[org.apache.spark.sql.Row]) => ())
    val verts = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .transform(Ckpt.materialize)
    val nDf = verts.agg(count(lit(1)).as("__n")).transform(Ckpt.materialize)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
      .transform(Ckpt.materialize)
    var ranks = uniform(verts, nDf)
    var prev = ranks
    var i = 0
    var delta = Double.MaxValue
    while (i < iters && delta >= tol) {
      val next = step(e, verts, nDf, deg, damping, ranks)
      i += 1
      if (i % checkpointEvery == 0 || i == iters) {
        if (tol > 0.0) {
          // delta vs the LAST CHECKPOINT (not last round): one
          // vertex-sized join riding the materialization job; sound for
          // early stop because per-round deltas only shrink (power
          // iteration contracts at rate `damping`), so checkpoint-window
          // delta < tol bounds every round inside the window too.
          val obs = org.apache.spark.sql.Observation()
          val ck = next
            .join(prev.select(col("node"), col("rank").as("__pr")), "node")
            .observe(obs, coalesce(sum(abs(col("rank") - col("__pr"))), lit(0.0))
              .as("l1_delta"))
            .select(col("node"), col("rank"))
            .transform(Ckpt.materialize)
          delta = {
            import scala.concurrent.Await
            import scala.concurrent.duration._
            try Await.result(obs.future, 30.seconds).getAs[Double]("l1_delta")
            catch { case _: java.util.concurrent.TimeoutException => Double.MaxValue }
          }
          System.err.println(s"[pageRank] round $i: l1_delta=$delta")
          ranks = ck
          prev = ck
        } else {
          ranks = next.transform(Ckpt.materialize)
        }
      } else {
        ranks = next
      }
    }
    e.unpersist()
    ranks
  }

  private def uniform(verts: DataFrame, nDf: DataFrame): DataFrame =
    verts.crossJoin(nDf).select(col("node"), (lit(1.0) / col("__n")).as("rank"))

  private def step(e: DataFrame, verts: DataFrame, nDf: DataFrame,
                   deg: DataFrame, damping: Double, ranks: DataFrame): DataFrame = {
    val contrib = e
      .join(ranks.withColumnRenamed("node", "src"), "src")
      .join(deg, "src")
      .groupBy(col("dst").as("node"))
      .agg(sum(col("rank") / col("out_deg")).as("in_mass"))
    verts.join(contrib, Seq("node"), "left")
      .crossJoin(nDf)
      .select(col("node"),
        round(lit(1.0 - damping) / col("__n") +
          lit(damping) * coalesce(col("in_mass"), lit(0.0)), 6).as("rank"))
  }
}
