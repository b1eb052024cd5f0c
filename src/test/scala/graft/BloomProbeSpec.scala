package graft

import org.apache.spark.sql.functions._
import graft.functions.Prune

/** Bloom-filter semi-join pruning (Spark's own BloomFilterAggregate /
  * MightContain sketch, which backs AQE runtime filters but is not
  * SQL-registered upstream; see functions.Prune + GraftExtensions). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("bloom literal + mightContain round-trip") {
    val keys = Seq(1L, 2L, 3L).toDF("k")
    val bf = Prune.bloomLiteral(keys, $"k", nItems = 3L, nBits = 64L)
    val probe = Seq(1L, 99L).toDF("x")
      .select($"x", Prune.mightContain(bf, $"x").as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(probe(1L), "planted key must hit")
    assert(!probe(99L), "absent key should miss at this bloom size")
  }

  test("bloom pre-filter preserves the exact semi-join result (no false negatives)") {
    val orders = Tables.t(spark, sfDir, "orders")
    val hot = Tables.t(spark, sfDir, "customer").filter($"c_acctbal" > 9000)
      .select($"c_custkey")
    val bf = Prune.bloomLiteral(hot, $"c_custkey", nItems = 1000L, nBits = 16384L)
    val pruned = orders.filter(Prune.mightContain(bf, $"o_custkey"))
      .join(hot, $"o_custkey" === $"c_custkey", "left_semi")
    val exact = orders.join(hot, $"o_custkey" === $"c_custkey", "left_semi")
    val a = pruned.select($"o_orderkey").collect().map(_.getLong(0)).toSet
    val b = exact.select($"o_orderkey").collect().map(_.getLong(0)).toSet
    assert(a == b, "bloom pruning must never drop a true match")
  }

  test("bloom decontamination never marks a truly contaminated doc clean") {
    val exact = SparkEntry.queries("t11_decontaminate")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet // docs with >= 1 true benchmark hit
    val sketch = SparkEntry.queries("t22_bloom_decontaminate")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2) /* n_flagged */, r.getBoolean(3) /* clean */)).toMap
    exact.foreach { id =>
      val (flagged, clean) = sketch(id)
      assert(flagged >= 1 && !clean,
        s"doc $id has true contamination but the bloom pass marked it clean")
    }
    // the pre-filter is useful, not vacuous: most uncontaminated docs pass
    val trulyClean = sketch.keySet -- exact
    val fp = trulyClean.count(id => !sketch(id)._2)
    assert(fp.toDouble / math.max(trulyClean.size, 1) < 0.1,
      s"false-positive rate $fp/${trulyClean.size} too high for the sketch size")
  }

  test("SQL surface: graft_bloom_agg scalar subquery + graft_might_contain") {
    Tables.t(spark, sfDir, "customer").createOrReplaceTempView("bloom_cust")
    Tables.t(spark, sfDir, "orders").createOrReplaceTempView("bloom_ord")
    val n = spark.sql("""
      SELECT count(*) AS n FROM bloom_ord
      WHERE graft_might_contain(
              (SELECT graft_bloom_agg(xxhash64(c_custkey), 1000L, 16384L)
               FROM bloom_cust WHERE c_acctbal > 9000),
              xxhash64(o_custkey))""").head.getLong(0)
    assert(n > 0)
  }
}
