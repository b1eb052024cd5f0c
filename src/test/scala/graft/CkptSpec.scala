package graft

import graft.functions.{Ckpt, Dedup, Graph}
import org.apache.spark.sql.functions._

/** The reliable-checkpoint seam: loop drivers truncate lineage through
  * [[Ckpt.materialize]], which picks `localCheckpoint` (no checkpoint dir
  * — local mode, tests, bench) or reliable `checkpoint` (dir configured —
  * the cluster posture, where a localCheckpoint block would die with its
  * executor under dynamic allocation and kill the whole iterative job).
  * These tests run every loop driver BOTH ways and pin result equality,
  * plus the seam's dir-detection itself. */
class CkptSpec extends SparkSpec {

  private def withCheckpointDir[A](body: java.io.File => A): A = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile
    spark.sparkContext.setCheckpointDir(dir.toString)
    try body(dir)
    finally {
      // Option(null) → None inside setCheckpointDir: restores the fast
      // localCheckpoint path for every other suite sharing this context.
      spark.sparkContext.setCheckpointDir(null)
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }

  test("Ckpt.materialize picks the reliable path iff a checkpoint dir is set") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    assert(!Ckpt.reliable(df))
    val local = Ckpt.materialize(df)
    assert(local.collect().map(_.getInt(0)).sorted.sameElements(Array(1, 2, 3)))
    withCheckpointDir { dir =>
      assert(Ckpt.reliable(df))
      val rel = Ckpt.materialize(df)
      assert(rel.collect().map(_.getInt(0)).sorted.sameElements(Array(1, 2, 3)))
      // reliable checkpoint writes RDD blocks under <dir>/<uuid>/rdd-*
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      assert(files(dir).nonEmpty, "reliable checkpoint wrote no files")
    }
    assert(!Ckpt.reliable(df), "checkpoint dir must be cleared after the block")
  }

  test("pageRank: reliable-checkpoint run ≡ localCheckpoint run") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 1L), (5L, 1L))
      .toDF("src", "dst")
    val base = Graph.pageRank(edges, "src", "dst", iters = 6)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val rel = withCheckpointDir { _ =>
      Graph.pageRank(edges, "src", "dst", iters = 6)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    }
    assert(rel.map(_._1).sameElements(base.map(_._1)))
    rel.zip(base).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-12) }
  }

  test("connectedComponents: reliable-checkpoint run ≡ localCheckpoint run") {
    import spark.implicits._
    val verts = (1L to 9L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L)).toDF("a", "b")
    def run() = Dedup.connectedComponents(verts, "id", edges, "a", "b")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val base = run()
    val rel = withCheckpointDir(_ => run())
    assert(rel.sameElements(base))
    // sanity on semantics, not just agreement
    assert(base.toMap == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L, 8L -> 8L, 9L -> 8L))
  }
}
