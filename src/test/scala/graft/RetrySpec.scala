package graft

import org.apache.spark.sql.functions._
import graft.functions.{Chaos, Similarity, Text}
import graft.operators.Relational

/** Retry-determinism: the order-sensitive operators (zipWithIndex row
  * ids, prefix-scan pack offsets, heap-merge top-k) must produce
  * byte-identical output when tasks fail and retry — the property a
  * 1000-executor run exercises constantly and a clean local run never
  * does. TestSpark's master is `local[4,3]`, so injected first-attempt
  * failures are retryable. */
class RetrySpec extends SparkSpec {
  import spark.implicits._

  private def injectedOrders = {
    // repartition(4) first: the sf0.001 table reads as one parquet split,
    // and the harness check wants both parities (even partitions retry,
    // odd succeed first try)
    val base = Tables.t(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .repartition(4)
    Chaos.injectTaskRetries(base)
  }

  test("injection harness: failures fire (attempt >= 1 on even partitions) and rows all survive") {
    val inj = injectedOrders
    val n = Tables.t(spark, sfDir, "orders").count()
    assert(inj.count() == n, "injection must be an identity on rows")
    val att = inj.groupBy($"__attempt").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(att.keySet.exists(_ >= 1), s"no retried task produced rows: $att")
    assert(att.keySet.contains(0), s"odd partitions should succeed first try: $att")
  }

  test("globalRowIds under injected retries == clean run (zipWithIndex offsets)") {
    val ord = Seq($"o_totalprice".desc, $"o_orderkey".asc)
    val clean = Relational.globalRowIds(
        Tables.t(spark, sfDir, "orders")
          .select($"o_orderkey", $"o_custkey", $"o_totalprice"), ord)
      .select($"o_orderkey", $"row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val retried = Relational.globalRowIds(injectedOrders, ord)
      .select($"o_orderkey", $"row_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(retried == clean)
  }

  test("packSequencesScalable under injected retries == clean run (prefix-scan offsets)") {
    val base = Tables.t(spark, sfDir, "documents")
      .select($"doc_id", $"lang", Text.tokenCountWs($"text").cast("long").as("n_tokens"))
    def asMap(d: org.apache.spark.sql.DataFrame) =
      d.select($"lang", $"doc_id", $"pack_id")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val clean = asMap(Text.packSequencesScalable(base, "lang", "doc_id", "n_tokens",
      budget = 512L, numPartitions = 5))
    val retried = asMap(Text.packSequencesScalable(Chaos.injectTaskRetries(base),
      "lang", "doc_id", "n_tokens", budget = 512L, numPartitions = 5))
    assert(retried == clean)
  }

  test("topKPairsAgg heap merge under injected retries == clean run") {
    val base = Tables.t(spark, sfDir, "orders")
      .select(($"o_custkey" % 50).as("g"), $"o_totalprice".as("s"), $"o_orderkey".as("id"))
    def topk(d: org.apache.spark.sql.DataFrame) = d
      .groupBy($"g")
      .agg(Similarity.topKPairsAgg($"s", $"id", 5).as("top"))
      .select($"g", $"top")
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).toSeq).toMap
    val clean = topk(base)
    val retried = topk(Chaos.injectTaskRetries(base).drop("__attempt"))
    assert(retried == clean)
  }
}
