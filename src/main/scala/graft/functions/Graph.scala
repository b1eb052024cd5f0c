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
    * (src, dst) id pairs and (node, double) ranks only; iterate by feeding
    * the result back as `ranks`, localCheckpointing every few rounds to
    * cut the lineage (same discipline as connectedComponents).
    */
  def pageRankStep(edges: DataFrame, srcCol: String, dstCol: String,
                   damping: Double = 0.85,
                   ranks: Option[DataFrame] = None): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val verts = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nDf = verts.agg(count(lit(1)).as("__n"))
    val r0 = ranks.map(_.select(col("node").cast("long").as("node"),
        col("rank").cast("double").as("rank")))
      .getOrElse(verts.crossJoin(nDf)
        .select(col("node"), (lit(1.0) / col("__n")).as("rank")))
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val contrib = e
      .join(r0.withColumnRenamed("node", "src"), "src")
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
