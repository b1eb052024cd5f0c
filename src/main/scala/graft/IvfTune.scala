package graft

import org.apache.spark.sql.SparkSession

import graft.functions.{Dedup, Similarity}

/** IVF parameter tuner: measures the blocked d5/s7 variants' RECALL vs
  * their exact twins and wall time across (nLists, nProbe) combos, so the
  * harness parameters are picked from data, not guesswork. The knob that
  * matters at scale is bucket OCCUPANCY (corpus/nLists): candidate volume
  * per list grows with occupancy², so nLists must scale with the corpus.
  *
  * Usage: MAIN=graft.IvfTune bash tools/run_verify.sh [sfDir] [l,p ...]
  */
object IvfTune {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // (nLists, nProbe, trainIters, memberAssign)
    val combos: Seq[(Int, Int, Int, Int)] =
      if (args.length > 1) args.drop(1).toSeq.map { s =>
        val a = s.split(",")
        (a(0).toInt, a(1).toInt,
          if (a.length > 2) a(2).toInt else 0,
          if (a.length > 3) a(3).toInt else 1)
      }
      else Seq((16, 8, 0, 1), (32, 8, 2, 1), (32, 8, 2, 2), (32, 8, 2, 3),
        (64, 12, 2, 2), (64, 16, 2, 3))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.t(spark, sfDir, "embeddings")
    println(s"corpus: ${emb.count()} vectors")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // d5: top-50 near-dup pairs — recall = |blocked ∩ exact| / |exact|
    val (exactPairs, tExactPairs) = timed {
      Dedup.embeddingTopPairs(emb, "vec_id", "embedding", k = 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(f"d5 exact: $tExactPairs%6.2f s (driver-broadcast baseline)")
    // d5 has no memberAssign knob — dedupe combos that differ only in m,
    // or the default ladder re-times the identical configuration and
    // prints indistinguishable lines
    combos.map { case (l, p, ti, _) => (l, p, ti) }.distinct.foreach { case (l, p, ti) =>
      val (got, t) = timed {
        Similarity.embeddingNearDupBlocked(emb, "vec_id", "embedding",
          k = 50, nLists = l, nProbe = p, trainIters = ti)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val recall = got.intersect(exactPairs).size.toDouble / exactPairs.size
      println(f"d5 lists=$l%3d probe=$p%2d iters=$ti  $t%6.2f s  recall=$recall%.3f")
    }

    // s7: k=3 graph — recall over (id, nbr) edges
    val (exactEdges, tExactKnn) = timed {
      Similarity.knnGraph(emb, "vec_id", "embedding", k = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(f"s7 exact: $tExactKnn%6.2f s (driver-broadcast baseline)")
    combos.foreach { case (l, p, ti, ma) =>
      val (got, t) = timed {
        Similarity.knnGraphBlocked(emb, "vec_id", "embedding", k = 3,
          nLists = l, nProbe = p, trainIters = ti, memberAssign = ma)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val recall = got.intersect(exactEdges).size.toDouble / exactEdges.size
      println(f"s7 lists=$l%3d probe=$p%2d iters=$ti m=$ma  $t%6.2f s  recall=$recall%.3f")
    }
    spark.stop()
  }
}
