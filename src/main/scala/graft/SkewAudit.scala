package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-campaign evidence collector (round-12): prints OBSERVED numbers for
  * the code paths uniform test data never exercises, against the planted-Zipf
  * corpus from `tools/gen_sf.py --skew`. Three audits:
  *
  *  1. funnel census — how many users actually route through the O(1)-state
  *     chained form (`Temporal.funnelStagesChained`) at the gate's 8192
  *     threshold, and what fraction of funnel events they hold;
  *  2. salted join — straggler balance (max rows landing in one of 32 hash
  *     partitions, keyed plain vs keyed+salt) and wall time (min-of-2) of
  *     the plain shuffle join vs `Relational.saltedJoin` on the planted-hot
  *     `l_suppkey`, with AQE skew handling and broadcast OFF so the salt is
  *     the only mitigation in play;
  *  3. AQE skew split — the same hot join left to AQE instead, with the
  *     skew thresholds scaled DOWN in proportion to the corpus (the 256 MB
  *     default assumes production partition sizes; sf0.1 partitions are
  *     single-digit MB), asserting the executed plan shows `skew=true` and
  *     counting the splits.
  *
  * Usage: MAIN=graft.SkewAudit bash tools/run_verify.sh [skewDir] [uniformDir]
  */
object SkewAudit {
  def main(args: Array[String]): Unit = {
    val skewDir = args.headOption.getOrElse("/root/repo/testdata_skew0.1")
    val uniDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- 1. funnel heavy-user census (skew vs uniform) --------------------
    val steps = Seq("view", "click", "purchase")
    for ((label, dir) <- Seq("skew" -> skewDir, "uniform" -> uniDir)) {
      val ev = Tables.t(spark, dir, "events")
        .filter($"event_type".isin(steps: _*))
      val perUser = ev.groupBy($"user_id").agg(count(lit(1)).as("n")).cache()
      val total = ev.count()
      val heavy = perUser.filter($"n" > 8192)
        .agg(coalesce(count(lit(1)), lit(0L)).as("users"),
             coalesce(sum($"n"), lit(0L)).as("events"))
        .collect()(0)
      val top = perUser.agg(max($"n")).collect()(0).getLong(0)
      println(f"funnel_census corpus=$label%s routed_users=${heavy.getLong(0)}%d " +
        f"routed_events=${heavy.getLong(1)}%d of_total=$total%d " +
        f"(${100.0 * heavy.getLong(1) / total}%.1f%%) top_user_events=$top%d")
      perUser.unpersist()
    }

    // ---- 2. salted join: straggler balance + wall time ---------------------
    // Broadcast and AQE skew handling OFF: at gate SF Spark would broadcast
    // the 1k-row supplier side and neither plan would shuffle; production
    // salted-join territory is "small side too big to broadcast, skew AQE
    // can't fix" (post-window/agg skew, semi/anti shapes), so force the
    // shuffle both ways and let the salt be the only difference.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val li = Tables.t(spark, skewDir, "lineitem")
      .select($"l_suppkey", $"l_orderkey", $"l_quantity")
    val supp = Tables.t(spark, skewDir, "supplier")
      .select($"s_suppkey".as("l_suppkey"), $"s_nationkey")
    def maxPartRows(df: DataFrame): Long =
      df.groupBy(spark_partition_id().as("p")).count()
        .agg(max($"count")).collect()(0).getLong(0)
    val plainMax = maxPartRows(li.repartition(32, $"l_suppkey"))
    val saltedMax = maxPartRows(li.withColumn("__salt",
      pmod(hash($"l_orderkey"), lit(8))).repartition(32, $"l_suppkey", $"__salt"))
    val nRows = li.count()
    println(f"salt_balance rows=$nRows%d max_partition_rows plain=$plainMax%d " +
      f"salted(8)=$saltedMax%d (ideal=${nRows / 32}%d)")
    def timeMinOf2(mk: => DataFrame): Double = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      mk.groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q")).collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    val tPlain = timeMinOf2(li.join(supp, Seq("l_suppkey")))
    val tSalted = timeMinOf2(operators.Relational.saltedJoin(
      li, supp, Seq("l_suppkey"), "l_orderkey", 8))
    println(f"salt_time plain=$tPlain%.3fs salted=$tSalted%.3fs " +
      f"speedup=${tPlain / tSalted}%.2fx")

    // ---- 3. AQE skew split on the hot l_suppkey ----------------------------
    // Thresholds scaled ~100x down from the 256 MB / 64 MB defaults to match
    // the ~100x-below-production corpus; the skew FACTOR (5x the median
    // partition) is untouched — that ratio is scale-free and is what decides
    // "skewed". The suppkey hot partition is ~6.8x the median (15% planted +
    // the uniform share vs 1/32), so it qualifies; the orderkey one (5%
    // planted → 2.6x median) correctly does NOT — AQE's definition of skew
    // is relative, which is itself an observed behavior worth pinning.
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // AQE splits a skewed REDUCE partition along MAP-output boundaries
    // (ShufflePartitionsUtil.createSkewPartitionSpecs) — with the whole
    // 12 MB gate file in ONE map task there is no boundary to split on
    // and the rule silently no-ops even when the partition passes both
    // skew thresholds (observed; the audit's own finding). Production
    // inputs have thousands of map tasks; mirror that here.
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1m")
    // (shuffle blocks are lz4-compressed — the sf0.1 hot partition is
    // ~1.7 MB raw but under 1 MB on the wire, so the floor must scale
    // with the COMPRESSED corpus size: 256k here ≈ 256 MB default / the
    // ~1000x corpus gap)
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
    // factor is in shuffle BYTES, and the hot partition's join-key column
    // is one repeated value — lz4 run-compresses it far below the 6.8x
    // row ratio, under the default 5x byte cutoff. 3x keeps the audit on
    // the bytes AQE actually sees rather than re-planting harder skew.
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "3")
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec, ShuffleQueryStageExec}
    // QueryStageExec is a LEAF for tree traversal (its compiled subtree
    // hangs off .plan, not .children) — recurse explicitly
    def shuffleStages(p: SparkPlan): Seq[ShuffleQueryStageExec] = p.collect {
      case a: AdaptiveSparkPlanExec => shuffleStages(a.executedPlan)
      case s: ShuffleQueryStageExec => s +: shuffleStages(s.plan)
      case q: QueryStageExec => shuffleStages(q.plan)
    }.flatten

    def runHotJoin(label: String, granular: Boolean): Unit = {
      // carry HIGH-ENTROPY payload columns (orderkey, extendedprice):
      // hot-key rows whose only payload is a constant key + low-entropy
      // quantity lz4-compress ~4x better than mixed partitions, and AQE's
      // skew test runs on WIRE bytes — the observed 6.8x row skew shrank
      // to 1.6x in bytes and the rule (correctly, by its own metric)
      // declined. Real wide rows keep the byte ratio near the row ratio.
      val left0 = Tables.t(spark, skewDir, "lineitem")
        .select($"l_suppkey", $"l_orderkey", $"l_quantity", $"l_extendedprice")
      val hotJoin = (if (granular) left0.repartition(12) else left0)
        .join(supp, Seq("l_suppkey"))
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"),
          sum($"l_extendedprice").as("rev"))
      hotJoin.collect()
      // the ADAPTIVE final plan lives on the executed DF itself — a derived
      // DF's plan would show the pre-AQE initial plan (isFinalPlan=false)
      val planTree = hotJoin.queryExecution.executedPlan
      // real wire sizes (what AQE's skew test actually compares) + the
      // per-MAP sizes of the hot reducer (what decides splittability) —
      // the latter via reflection (private[spark] object)
      shuffleStages(planTree).foreach { s =>
        s.mapStats.foreach { ms =>
          val bytes = ms.bytesByPartitionId
          val sz = bytes.sorted
          if (sz.nonEmpty && sz.last > 100000) {
            println(f"$label%s shuffle_bytes n=${sz.length}%d " +
              f"median=${sz(sz.length / 2)}%d max=${sz.last}%d " +
              f"max_over_median=${sz.last.toDouble / math.max(sz(sz.length / 2), 1)}%.1fx " +
              f"mappers=${s.shuffle.numMappers}%d")
            val cls = Class.forName(
              "org.apache.spark.sql.execution.adaptive.ShufflePartitionsUtil$")
            val mod = cls.getField("MODULE$").get(null)
            val gm = cls.getDeclaredMethods
              .find(_.getName.contains("getMapSizesForReduceId")).get
            gm.setAccessible(true)
            val perMap = gm.invoke(mod, Int.box(ms.shuffleId),
                Int.box(bytes.indexOf(bytes.max))).asInstanceOf[Array[Long]]
            println(s"$label hot_reducer_per_map nonzero=" +
              s"${perMap.count(_ > 0)}/${perMap.length} " +
              s"max=${perMap.max}")
          }
        }
      }
      val plan = planTree.toString
      val nSkewMarks = "skew=true".r.findAllIn(plan).length
      println(s"$label skew_marked_joins=${nSkewMarks} " +
        s"(${if (nSkewMarks > 0) "AQE SPLIT the hot partition" else "did NOT split"})")
      if (sys.env.contains("SKEW_AUDIT_PLAN")) println(plan)
    }

    // Run A — the gate file as-is: ONE parquet row group, so every byte-
    // range split but one reads zero rows. AQE splits a skewed reduce
    // partition along MAP-output boundaries only
    // (ShufflePartitionsUtil.createSkewPartitionSpecs): a single
    // contributing map task is unsplittable and the rule silently no-ops
    // even though the partition passes both skew thresholds. Observed —
    // the audit's key finding.
    runHotJoin("aqe_skew_single_rowgroup", granular = false)
    // Run B — MAP-SIDE GRANULARITY restored with a round-robin repartition
    // upstream (standing in for the thousands of row groups / map tasks a
    // real 100 TB table has): the splitter now has boundaries to cut at.
    // Salting (audit 2) needs no such granularity — that independence is
    // WHY saltedJoin exists alongside AQE.
    runHotJoin("aqe_skew_granular", granular = true)
    spark.stop()
  }
}
