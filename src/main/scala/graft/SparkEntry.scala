package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-domain query modules; each entry has a
  * DuckDB oracle in `oracleSql` unless the operator is not SQL-expressible
  * (those get the driver's weaker rows-only check).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ EventQueries.queries ++ TextQueries.queries ++
      DedupQueries.queries ++ SimilarityQueries.queries ++ PipelineQueries.queries ++
      SketchQueries.queries ++ MultimodalQueries.queries ++ SamplingQueries.queries

  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ EventQueries.oracle ++ TextQueries.oracle ++
      DedupQueries.oracle ++ SimilarityQueries.oracle ++ PipelineQueries.oracle ++
      MultimodalQueries.oracle ++ SamplingQueries.oracle ++ SketchQueries.oracle

  /** Human-readable name per registry code. The registry keys are the short
    * codes themselves (the driver's bench tail window caps the metric line
    * at ~2,000 bytes, and 95 descriptive names can never fit a per-query
    * timing map inside it — see Bench.TailCaptureBytes); the descriptive
    * half of each name lives here and in COVERAGE.md.
    */
  val descriptions: Map[String, String] = Map(
    "c01" -> "corpus_gate", "c02" -> "corpus_integrity_audit",
    "d01" -> "exact_dedup", "d02" -> "minhash_lsh", "d03" -> "simhash",
    "d04" -> "ngram_jaccard", "d05" -> "embedding_dup", "d06" -> "dedup_keep",
    "d07" -> "dup_clusters", "d08" -> "simhash_hamming",
    "d09" -> "decontaminate", "d10" -> "window_dedup",
    "d11" -> "lsh_embedding_dup", "d12" -> "bloom_decontaminate",
    "d13" -> "incremental_dedup", "d14" -> "prefix_dedup",
    "d15" -> "dup_spans", "d16" -> "semantic_dedup",
    "d17" -> "leakage_guarded_split", "d18" -> "dedup_manifest",
    "d19" -> "minhash_calibration", "d20" -> "ensemble_dedup_vote",
    "d21" -> "cluster_size_report",
    "m01" -> "binary_meta", "m02" -> "size_classes",
    "m03" -> "codec_roundtrip", "m04" -> "phash_dedup",
    "m05" -> "frame_sample", "m06" -> "audio_energy",
    "m07" -> "scene_change", "m08" -> "phash_neardup",
    "m09" -> "audio_fingerprint",
    "p01" -> "stack_stats", "p02" -> "batch_propagate",
    "p03" -> "thickness_math", "p04" -> "energy_math",
    "p05" -> "identifiers", "p06" -> "required_counts",
    "p07" -> "staleness_gate", "p08" -> "stack_collect",
    "p09" -> "quantity_units",
    "q01" -> "pricing_summary", "q02" -> "filter_project",
    "q03" -> "shipping_priority", "q04" -> "order_priority",
    "q05" -> "region_revenue", "q06" -> "forecast_revenue",
    "q07" -> "customers_without_orders", "q08" -> "window_topn",
    "q09" -> "running_total", "q10" -> "rollup", "q11" -> "cube",
    "q12" -> "grouping_sets", "q13" -> "distinct_agg",
    "q14" -> "conditional_pivot", "q15" -> "monthly_orders",
    "q16" -> "string_funcs", "q17" -> "avg_subquery",
    "q18" -> "big_orders", "q19" -> "top_customer_per_nation",
    "q20" -> "setops", "q21" -> "asof_join", "q22" -> "tumbling_window",
    "q23" -> "sliding_window", "q24" -> "session_window",
    "q25" -> "percentile_exact", "q26" -> "moment_stats",
    "q27" -> "full_outer", "q28" -> "posexplode",
    "q29" -> "window_analytics", "q30" -> "date_funcs", "q31" -> "funnel",
    "q32" -> "correlated_subquery", "q33" -> "asof_bucketed",
    "q34" -> "json_extract", "q35" -> "trailing_window",
    "q36" -> "skew_salted", "q37" -> "pivot", "q38" -> "lateral_topk",
    "q39" -> "date_spine", "q40" -> "distributed_ntile",
    "q41" -> "cohort_retention", "q42" -> "user_anomalies",
    "q43" -> "rfm_segments", "q44" -> "part_affinity",
    "q45" -> "pareto_share", "q46" -> "strict_funnel",
    "q47" -> "event_transitions",
    "s01" -> "cosine_topk", "s02" -> "lsh_ann", "s03" -> "ivf_ann",
    "s04" -> "label_centroids", "s05" -> "quantized_ann",
    "s06" -> "kmeans_step", "s07" -> "ann_recall",
    "s08" -> "knn_graph", "s09" -> "simplified_silhouette",
    "t01" -> "token_stats", "t02" -> "quality_score",
    "t03" -> "langid_markers", "t04" -> "fingerprint",
    "t05" -> "clean_normalize", "t06" -> "edit_distance",
    "t07" -> "token_chunks", "t08" -> "ngram_repetition",
    "t09" -> "vocab_stats", "t10" -> "tfidf_topterms",
    "t11" -> "blocklist_scrub", "t12" -> "pii_scrub",
    "t13" -> "unigram_surprise", "t14" -> "source_kl_drift",
    "t15" -> "langid_confusion", "t16" -> "zipf_fit",
    "t17" -> "bigram_pmi",
    "w01" -> "hash_sample", "w02" -> "mixture_sample",
    "w03" -> "split_assign", "w04" -> "sequence_pack",
    "w05" -> "shard_export", "w06" -> "mixture_weights",
    "w07" -> "budget_sample", "w08" -> "bottomk_sample",
    "w09" -> "stratified_sample", "w10" -> "quality_sample",
    "w11" -> "mixture_fill", "w12" -> "curriculum_deciles",
    "w13" -> "weighted_poisson_sample",
    "x01" -> "hll_distinct", "x02" -> "histogram_quantiles",
    "x03" -> "countmin_heavy", "x04" -> "kmv_distinct",
    "x05" -> "kmv_setops", "x06" -> "zorder_key",
    "x07" -> "linear_counting", "x08" -> "ams_f2")
}
