package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Text}

/** End-to-end training-data pipeline: the operators compose the way a real
  * corpus build uses them — near-dup clustering → canonical retention →
  * quality gate → context-window packing → reproducible sampling. Asserts
  * the row-count algebra of each stage and cross-run determinism (every
  * stage is a pure function of the input — no RNG, no partition-order
  * dependence).
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def runPipeline() = {
    val docs = Tables.t(spark, sfDir, "documents")
    // 1. near-dup pair graph within (lang, source) blocks
    val edges = Dedup.nearDupJaccardBlocked(docs, "text", "doc_id",
      Seq("lang", "source"), threshold = 0.8).select($"id_a", $"id_b")
    // 2. clusters + keep the longest doc per cluster
    val clusters = Dedup.connectedComponents(
      docs.select($"doc_id"), "doc_id", edges, "id_a", "id_b")
    val scored = docs.select($"doc_id", $"lang", $"text",
      Text.tokenCountWs($"text").cast("long").as("n_tokens"))
    val canonical = Dedup.retain(scored, "doc_id", clusters, "n_tokens")
    // 3. quality gate
    val quality = canonical.filter(Text.qualityScore($"text") > 0.3)
    // 4. pack into 2048-token context windows per language (scalable form)
    val packed = Text.packSequencesScalable(
      quality.select($"doc_id", $"lang", $"n_tokens"),
      "lang", "doc_id", "n_tokens", budget = 2048L, numPartitions = 5)
    // 5. reproducible 50% eval split
    val sampled = packed.filter(Text.hashSampleFilter($"doc_id", 0.5))
    (docs.count(), canonical.count(), quality.count(), packed, sampled.count())
  }

  test("stage row-count algebra holds and output is deterministic across runs") {
    val (nDocs, nCanonical, nQuality, packed1, nSampled) = runPipeline()
    assert(nCanonical < nDocs, "retention must remove near-duplicates")
    assert(nQuality <= nCanonical)
    assert(packed1.count() == nQuality, "packing labels, never drops")
    assert(nSampled > 0 && nSampled < nQuality)
    // determinism: the full chain reproduces byte-identical assignments
    val (_, _, _, packed2, nSampled2) = runPipeline()
    val a = packed1.select($"doc_id", $"pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = packed2.select($"doc_id", $"pack_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "pack assignment must be run-invariant")
    assert(nSampled == nSampled2)
  }

  test("c1_corpus_pipeline: manifest invariants and per-lang pack contiguity") {
    val m = TrainingQueries.queries("c1_corpus_pipeline")(spark, sfDir)
    val rows = m.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) != "und", "quality filter must drop 'und' docs")
      assert(r.getLong(2) >= 1L, "n_docs")
      assert(r.getLong(3) > 0L, "pack_tokens")
      assert(r.getLong(4) <= r.getLong(5), "first_doc <= last_doc")
    }
    // pack ids per language are contiguous from 0 (greedy packing never
    // skips a pack), and only the LAST pack of a language may be under
    // half-full is not guaranteed — but ids must be dense.
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ids = rs.map(_.getLong(1)).sorted
      assert(ids.head == 0L && ids.sameElements(ids.indices.map(_.toLong)),
        s"pack ids not dense: ${ids.mkString(",")}")
    }
  }

  test("packs respect the token budget for in-budget docs") {
    val (_, _, _, packed, _) = runPipeline()
    // a pack's summed tokens may overshoot only via its LAST (straddling)
    // doc; every pack's pre-straddle content fits the budget, which in
    // start-based packing means: each doc's start offset within its pack
    // is < budget. Equivalent check: per (lang, pack) the tokens BEFORE
    // the last doc are < budget.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang", $"pack_id").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val bad = packed
      .withColumn("before_in_corpus", sum($"n_tokens").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lang").orderBy($"doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)))
      .withColumn("start_in_pack",
        coalesce($"before_in_corpus", lit(0L)) - $"pack_id" * 2048L)
      .filter($"start_in_pack" < 0 || $"start_in_pack" >= 2048L)
    assert(bad.count() == 0)
  }
}
