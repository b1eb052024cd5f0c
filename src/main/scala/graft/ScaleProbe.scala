package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Text}

/** Scale-trend diagnostic for the SF-proof verdict-twin claim (round 10):
  * the gated sketch queries run their production path on the FULL corpus
  * plus an exact twin on a deterministic hash slice capped at ~2000 rows
  * (`Text.hashSampleCapFilter`), so twin cost must stay ~CONSTANT as the
  * corpus grows while production cost grows ~linearly.
  *
  * This main measures exactly that, on corpus volumes built by replicating
  * the driver-provided documents table with disjoint id offsets (volume
  * replication for timing only — never a correctness input; the gate reads
  * the pristine tables). For each multiple it times
  *
  *   - production: `nearDupMinhashLsh` over the replicated corpus;
  *   - twin: `jaccardAllPairsAbove` over the capped hash slice of the
  *     same corpus (the d2 gate's exact-twin side).
  *
  * Usage: MAIN=graft.ScaleProbe bash tools/run_verify.sh [sfDir] [muls]
  *   e.g. ... /root/testdata/sf0.1 1,4,16
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val muls = args.lift(1).getOrElse("1,4,16").split(",").map(_.trim.toInt)
    val spark = GraftSession.local()
    import spark.implicits._

    val base = Tables.t(spark, sfDir, "documents").select($"doc_id", $"text")
    val baseN = base.count()

    def replicated(m: Int): DataFrame =
      (0 until m).map(i => base.select(($"doc_id" + lit(i.toLong * 1000000000L)).as("doc_id"), $"text"))
        .reduce(_ unionByName _)

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }

    println(f"[scale-probe] base corpus $baseN%d docs ($sfDir); twin cap = 2000")
    muls.foreach { m =>
      val corpus = replicated(m)
      val n = baseN * m
      val (tPull, _) = time(corpus.count()) // warm FS cache / JIT parity
      val (tProd, nPairs) = time(
        Dedup.nearDupMinhashLsh(corpus, "text", "doc_id",
          n = 2, k = 64, bands = 16, threshold = 0.4,
          reuseSignatures = true).count())
      val slice = corpus.filter(Text.hashSampleCapFilter($"doc_id", n, 2000L))
      val (tTwin, nExact) = time(
        Dedup.jaccardAllPairsAbove(slice, "text", "doc_id",
          threshold = 0.4, ngram = 2).count())
      println(f"[scale-probe] x$m%-3d docs=$n%9d  prod=$tProd%7.2f s ($nPairs%d pairs)  " +
        f"twin=$tTwin%7.2f s ($nExact%d slice pairs)  twin_share=${100 * tTwin / (tProd + tTwin)}%5.1f%%  (warm=$tPull%4.2f s)")
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
