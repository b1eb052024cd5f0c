package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for the named queries
  * (or a representative headline set) so scan pruning (`PushedFilters`,
  * `ReadSchema`), join strategies (broadcast vs shuffle), and
  * whole-stage-codegen spans can be reviewed per query.
  *
  * Usage: MAIN=graft.Explain bash tools/run_verify.sh [sfDir] [q1 q2 ...]
  */
object Explain {
  private val defaults = Seq(
    "p1_project_filter_isin", "a1_group_sum", "j5_multiway_join",
    "j8_top_per_group", "o4_latest_only", "p10_scalar_subquery",
    "w8_cumulative", "a12_rollup", "j11_nullsafe_join", "e4_unpivot",
    "d1_exact_dedup", "s1_cosine_topk", "t4_hash_sample", "j10_asof_join",
    "a14_stats_aggs", "a15_linear_interp", "w10_sessionize", "o11_upsert",
    "d7_dedup_retain", "s5_ann_ivf", "j12_salted_join", "j13_bloom_prune",
    "s6_kmeans_step", "t7_tfidf_top_terms", "t8_weighted_sample",
    "d8_triangle_count", "w11_zscore_outliers", "t6_stratified_sample",
    "d9_prefix_filter_pairs", "o12_scd2", "w12_interval_overlap",
    "a16_grouping_sets", "a17_heavy_hitters", "t9_bigram_topn",
    "w13_ewma", "a18_quantile_bucket", "a19_welford_udaf",
    "t11_decontaminate", "t12_unigram_logprob", "t13_filter_stats",
    "p11_column_profile", "o13_global_row_ids",
    "o14_cdc_apply", "w14_mad_outliers", "m4_image_tiles",
    "d11_paragraph_dedup", "t15_winnowing", "t16_corpus_shuffle",
    "s8_pq_adc", "a20_countmin_probe", "g2_pagerank_iter",
    "s12_kmeans_train", "s13_logreg_train",
    "s7_knn_graph", "d13_semantic_dedup", "d2_minhash_lsh_neardup",
    "t22_bloom_decontaminate", "s14_index_persist",
    "s16_member_table_probe", "k5_range_layout", "s15_kcenter_coreset",
    "c1_corpus_pipeline", "k6_partial_agg_merge", "d14_shared_spans",
    "k7_zorder_layout", "k8_sketch_partials",
    "k9_expectation_checks", "o16_snapshot_diff", "t23_leakage_safe_split",
    "t24_distribution_drift", "k10_bucketed_join", "d15_incremental_neardup", "t25_bpe_merges",
    "e14_variant_json", "d16_record_linkage", "w17_funnel_steps",
    "a22_retention_cohorts", "t26_bm25_topk", "t27_bm25_index_probe",
    "s17_ivf_maintenance", "s18_hybrid_retrieval", "s19_atrest_retrieval",
    "t28_bm25_maintenance", "k11_quantile_partials", "k12_countmin_partials",
    "k13_jsonl_ingest", "k14_heavyhitter_partials", "s21_int8_rerank")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else defaults
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // ObjectHashAggregate (TypedImperativeAggregate buffers, e.g. the
      // bounded top-k heap) falls back to SORT-based aggregation after only
      // 128 distinct in-memory groups by default — which re-sorts the whole
      // candidate stream and defeats the point of a k-bounded buffer. Heap
      // states here are tiny (k entries), so let the hash map grow.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", (4 * 1024 * 1024).toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n======== $name ========")
          try fn(spark, sfDir).explain("formatted")
          catch { case e: Throwable => println(s"EXPLAIN FAILED: ${e.getMessage}") }
        case None => println(s"\n======== $name: NOT FOUND ========")
      }
    }
    spark.stop()
  }
}
