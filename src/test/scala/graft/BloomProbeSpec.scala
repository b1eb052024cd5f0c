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
    // t22 emits one verdict row (round 9): its in-plan contract checks —
    // no_false_neg (bloom never misses an inserted shingle) and
    // fp_rate_ok (≤ 5% of clean docs spuriously flagged) — must hold, and
    // the deterministic payload must agree with t11's exact join.
    val exactDocs = SparkEntry.queries("t11_decontaminate")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet // docs with >= 1 true benchmark hit
    val row = SparkEntry.queries("t22_bloom_decontaminate")(spark, sfDir).head()
    assert(row.getAs[Long]("n_contaminated") == exactDocs.size,
      "t22's exact-contamination payload must match t11's exact join")
    assert(row.getAs[Long]("n_docs") >= exactDocs.size)
    assert(row.getAs[Boolean]("no_false_neg"),
      "a truly contaminated doc was marked clean by the bloom pass")
    assert(row.getAs[Boolean]("fp_rate_ok"),
      "false-positive rate too high for the sketch size")
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
