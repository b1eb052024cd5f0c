package graft

import org.apache.spark.sql.functions._

/** Specs for the AnalyticsQueries family: sketch accuracy/mergeability,
  * rollup invariants, percentile and rank-function semantics. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("a13 approx_count_distinct lands within HLL++ error of exact") {
    // the query now emits the bound VERDICT itself (|approx − exact| ≤
    // 3·rsd·exact, oracle-checked against `true`); the spec asserts every
    // verdict holds on this corpus too
    val got = AnalyticsQueries.queries("a13_approx_distinct")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getString(0)}: exact ${r.getAs[Long]("exact_orders")} out of HLL bound")
    }
  }

  test("HLL sketches merge: unioned partial sketches == whole-corpus estimate") {
    // The 100 TB property: per-partition sketches combine WITHOUT rescanning
    // (a distributive re-aggregation, e.g. daily sketches -> monthly uniques).
    val orders = Tables.t(spark, sfDir, "orders")
    val whole = orders
      .agg(hll_sketch_estimate(hll_sketch_agg($"o_custkey")).as("est"))
      .head.getLong(0)
    val halves = orders
      .withColumn("half", ($"o_orderkey" % 2).cast("int"))
      .groupBy($"half")
      .agg(hll_sketch_agg($"o_custkey").as("sk"))
    val merged = halves
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
      .head.getLong(0)
    assert(merged == whole, s"merged $merged vs whole $whole")
    val exact = orders.select($"o_custkey").distinct().count()
    assert(math.abs(merged.toDouble - exact) / exact < 0.05,
      s"sketch $merged vs exact $exact")
  }

  test("count-min sketch: never undercounts, tight estimates, LINEAR merge") {
    import graft.functions.Stats
    val orders = Tables.t(spark, sfDir, "orders")
    val sk = orders.agg(Stats.countMinSketchAgg($"o_custkey").as("sk"))
      .head.getAs[Array[Byte]](0)
    val cms = Stats.readCountMin(sk)
    val exact = orders.groupBy($"o_custkey").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    exact.foreach { case (key, c) =>
      val e = cms.estimateCount(key)
      // CMS structurally never undercounts; at eps=1e-4 the width dwarfs
      // the key cardinality, so overcount stays within a few counts
      assert(e >= c && e - c <= 2, s"key $key exact $c est $e")
    }
    // linearity: per-half sketches merged counter-wise == whole-corpus
    // sketch, estimate-for-estimate (the per-day -> per-month compose)
    val halves = orders.withColumn("half", ($"o_orderkey" % 2).cast("int"))
      .groupBy($"half").agg(Stats.countMinSketchAgg($"o_custkey").as("sk"))
      .select("sk").collect().map(r => Stats.readCountMin(r.getAs[Array[Byte]](0)))
    val merged = halves.reduce((a, b) => a.mergeInPlace(b))
    exact.foreach { case (key, _) =>
      assert(merged.estimateCount(key) == cms.estimateCount(key))
    }
  }

  test("countMinUnion aggregate: in-plan union of partials == direct sketch") {
    import graft.functions.Stats
    val orders = Tables.t(spark, sfDir, "orders")
    // per-month partials -> ONE in-plan union aggregate (the k12 at-rest
    // merge path), compared estimate-for-estimate against the direct
    // whole-input sketch: CMS union is counter addition, so equality is
    // exact, not statistical
    val partials = orders
      .withColumn("m", date_format($"o_orderdate", "yyyy-MM"))
      .groupBy($"m").agg(Stats.countMinSketchAgg($"o_custkey").as("sk"))
    val mergedBytes = partials.agg(Stats.countMinUnion($"sk"))
      .head.getAs[Array[Byte]](0)
    val directBytes = orders.agg(Stats.countMinSketchAgg($"o_custkey"))
      .head.getAs[Array[Byte]](0)
    val (merged, direct) =
      (Stats.readCountMin(mergedBytes), Stats.readCountMin(directBytes))
    val keys = orders.select($"o_custkey").distinct()
      .collect().map(_.getLong(0))
    keys.foreach { k =>
      assert(merged.estimateCount(k) == direct.estimateCount(k), s"key $k")
    }
    // zero-input union folds to the empty sentinel, not a crash
    val empty = partials.filter(lit(false)).agg(Stats.countMinUnion($"sk"))
      .head.getAs[Array[Byte]](0)
    assert(empty == null || empty.isEmpty)
  }

  test("a12 rollup: subtotals sum to grand total, grouping flags mark levels") {
    val got = AnalyticsQueries.queries("a12_rollup")(spark, sfDir).collect()
    val grand = got.filter(r => r.getAs[Int]("g_rf") == 1 && r.getAs[Int]("g_ls") == 1)
    assert(grand.length == 1)
    val leaf = got.filter(r => r.getAs[Int]("g_rf") == 0 && r.getAs[Int]("g_ls") == 0)
    val mid = got.filter(r => r.getAs[Int]("g_rf") == 0 && r.getAs[Int]("g_ls") == 1)
    assert(leaf.map(_.getAs[Long]("n_rows")).sum == grand.head.getAs[Long]("n_rows"))
    assert(mid.map(_.getAs[Long]("n_rows")).sum == grand.head.getAs[Long]("n_rows"))
    // rollup never emits the (rf=1, ls=0) cube-only level
    assert(!got.exists(r => r.getAs[Int]("g_rf") == 1 && r.getAs[Int]("g_ls") == 0))
  }

  test("a11 percentiles: p25 <= p50 <= p75 <= p95, median of 1..100 = 50.5") {
    val got = AnalyticsQueries.queries("a11_percentiles")(spark, sfDir).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (p25, p50, p75, p95) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p25 <= p50 && p50 <= p75 && p75 <= p95)
    }
    val med = (1 to 100).map(_.toDouble).toDF("x")
      .agg(expr("percentile(x, 0.5D)")).head.getDouble(0)
    assert(math.abs(med - 50.5) < 1e-9)
  }

  test("w9 rank family: rank gaps vs dense_rank, ntile balance, percent_rank bounds") {
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 5.0), ("a", 4L, 1.0))
      .toDF("g", "id", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"g").orderBy($"v".desc, $"id".asc)
    val got = df.select($"id",
        rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("pr"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getDouble(3))))
      .toMap
    // ties on v=10.0 broken by id: ranks 1..4 all distinct (total order)
    assert(got.values.map(_._1).toSeq.sorted == Seq(1, 2, 3, 4))
    assert(got.values.map(_._2).toSeq.sorted == Seq(1, 2, 3, 4))
    val prs = got.values.map(_._3)
    assert(prs.min == 0.0 && prs.max == 1.0)
  }

  test("j11 null-safe join keeps null-key rows (inner join would drop them)") {
    val got = AnalyticsQueries.queries("j11_nullsafe_join")(spark, sfDir)
    val nullRows = got.filter($"k".isNull).count()
    val total = got.count()
    val source = Tables.t(spark, sfDir, "orders").count()
    assert(nullRows > 0, "null keys must match null dim group")
    assert(total == source, "null-safe join must preserve every order row")
  }
}
