"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine: ``ocr_spark`` — a PySpark-native main-content extraction pipeline
(HTML boilerplate strip + layout-fixture PDF path) plus corpus-level
analytics. The flagship ``entry`` pushes the driver's ``documents`` table
through the full salted mapInPandas extraction job; ``extract_roundtrip``
makes the north rule's byte-identical-text gate oracle-checkable (the
DuckDB oracle selects the original text — any extraction byte drift
fails the value hash).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction pipeline over sf0.001 documents."""
    from pyspark.sql import functions as F

    from ocr_spark.operators.extraction import run_extraction
    from ocr_spark.plans.extract_queries import pages_from_documents

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    extracted = run_extraction(pages, partitions=16, big_partitions=2)
    return extracted.select(
        "url", "kind", "text", "n_pages", "n_blocks", "n_blocks_dropped",
        "bytes_in", "error",
    ).orderBy(F.col("url"))


# Driver-exposure ordering: the driver samples ~50 queries() entries in
# dict-insertion order, so dict order decides which queries get a
# CORRECTNESS row each round. Round-5 rule (the round-4 verdict's #1
# ask): 3 flagship pins, then EVERY query that has never had a driver
# CORRECTNESS row in rounds 1-4 (196 of 307), whole families first —
# sketches (merge algebra is the likeliest place a silent engine
# difference hides), then indexing / htmlfeat / linkrank / tpch_rest /
# relational_extra, then the mid-round-4 simsearch/dataops/curation
# additions, then webops/queries/extract/multimodal. Ever-checked
# entries keep module order after the front, so a larger-than-expected
# sample still lands on fresh rows first.
_DRIVER_FRONT: tuple[str, ...] = (
    "extract_roundtrip",
    "extract_block_stats",
    "document_graph_edges",
    # round-5 additions (verdict #3): the trained-PQ flagships must
    # get their first driver rows this round
    "emb_ivfpq_trained_topk",
    "emb_ivfpq_residual_trained_topk",
    # round-5 extraction-tier additions (north-rule DOM heuristics)
    "pages_block_density", "pages_dom_depth",
    "pages_extract_method_agreement",
    "docs_quality_psi", "docs_dedup_yield_curve",
    "hosts_sitemap_coverage",
    "docs_hll_sketch",
    "docs_cms_heavy_hitters",
    "docs_hll_snapshot_merge",
    "docs_cms_snapshot_merge",
    "docs_length_quantile_sketch",
    "docs_kmv_distinct",
    "docs_weighted_reservoir",
    "docs_kmv_resemblance",
    "docs_hll_by_lang",
    "docs_kmv_diff",
    "pages_cdx_index",
    "pages_wat_export",
    "pages_revisit_records",
    "pages_cdx_merge",
    "pages_recrawl_priority",
    "pages_recrawl_delta",
    "pages_wrap_digest",
    "pages_html_features",
    "pages_extract_router",
    "pages_pagerank",
    "pages_pagerank_incremental",
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_parts_supplier_relationship",
    "q20_potential_promotion",
    "ev_bot_detection",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q18_large_volume_customers",
    "q19_discounted_revenue",
    "ev_funnel_latency",
    "emb_decontaminate_semantic",
    "emb_pca_power",
    "emb_abtt_postprocess",
    "emb_ivfpq_topk",
    "emb_ivfpq_residual_topk",
    "emb_kcenter_init",
    "emb_mmr_select",
    "emb_kmeans_train",
    "emb_ivf_nprobe_sweep",
    "emb_kmeans_elbow",
    "emb_pq_train",
    "emb_pq_train_residual",
    "emb_cluster_balanced_sample",
    "emb_cluster_quota_sample",
    "emb_mutual_knn",
    "emb_outlier_scan",
    "emb_cell_drift",
    "emb_mrl_recall",
    "emb_bitext_mine",
    "emb_ivf_trained_topk",
    "emb_ivf_trained_multiprobe_topk",
    "emb_quantization_error",
    "emb_ann_recall_eval",
    "emb_hard_negatives",
    "emb_label_retrieval_eval",
    "docs_keyphrases_rake",
    "docs_summary_coverage",
    "docs_soft_dedup_weights",
    "docs_fim_split",
    "docs_script_profile",
    "docs_lexical_diversity",
    "docs_near_dup_vs_snapshot",
    "docs_near_dup_quality_keepers",
    "docs_lsh_band_planner",
    "docs_contrastive_batches",
    "docs_stopword_induction",
    "docs_dedup_method_agreement",
    "docs_ct_langid",
    "docs_prefix_filter_join",
    "docs_extractive_summary",
    "docs_bbit_minhash",
    "docs_cdc_chunks",
    "docs_near_dup_clusters_logstar",
    "docs_lang_confusion",
    "docs_bpe_merges_token_count",
    "docs_bpe_train_merges",
    "docs_tokenizer_fertility",
    "docs_collocations_pmi",
    "docs_tfidf_topk",
    "docs_inverted_index",
    "docs_char_entropy",
    "docs_containment_pairs",
    "docs_winnowing",
    "docs_lsh_eval",
    "docs_bm25_search",
    "docs_lang_segments",
    "docs_code_detect",
    "docs_metric_bootstrap_ci",
    "docs_gate_mcnemar",
    "shards_compaction_plan",
    "docs_quality_constraints",
    "docs_quality_rrf",
    "docs_quality_calibration",
    "docs_sft_format",
    "docs_dp_lang_histogram",
    "docs_preference_pairs",
    "docs_canary_probe",
    "docs_metric_correlations",
    "docs_dsir_weights",
    "docs_training_order",
    "hosts_perplexity_buckets",
    "docs_bigram_kneser_ney",
    "docs_span_corruption",
    "shards_skew_report",
    "docs_seq_pack",
    "docs_decontaminate_spans",
    "docs_decontaminate_report",
    "docs_mixture_realize",
    "docs_curriculum_order",
    "shards_zone_map",
    "docs_zipf_profile",
    "docs_training_set",
    "docs_chunk_spans",
    "docs_readability",
    "docs_length_percentiles",
    "docs_sample_holdout",
    "docs_split_leakage_check",
    "docs_cluster_safe_split",
    "hosts_concentration",
    "pages_outlinks",
    "pages_host_outdegree",
    "hosts_pagerank",
    "hosts_pagerank_full",
    "hosts_hits",
    "hosts_pagerank_dangling",
    "hosts_link_spam",
    "hosts_spam_mass",
    "pages_robots_filter",
    "pages_outlinks_followed",
    "pages_spam_host_filter",
    "hosts_keep_rate",
    "pages_line_corrections",
    "docs_bloom_probe",
    "docs_encoding_repair",
    "docs_host_cap",
    "docs_vocab_novelty",
    "docs_snapshot_drift",
    "hosts_cocitation",
    "docs_toxicity_score",
    "pages_robots_txt_gate",
    "pages_wet_export",
    "pages_warc_export",
    "pages_line_dedup",
    "pages_host_boilerplate",
    "pages_anchor_texts",
    "pages_redirect_resolve",
    "pages_soft404",
    "pages_charset_detect",
    "pages_sitemap_parse",
    "pages_http_cache_headers",
    "hosts_ip_colocation",
    "pages_hreflang_clusters",
    "hosts_crawl_traps",
    "pages_url_templates",
    "frontier_fetch_schedule",
    "hosts_stats_kanon",
    "hosts_crawl_budget",
    "hosts_mirror_pairs",
    "hosts_mirror_clusters",
    "hosts_trustrank",
    "hosts_salsa",
    "hosts_assortativity",
    "hosts_pagerank_aged",
    "pages_content_sniff",
    "docs_nfc_normalize",
    "hosts_registered_domain",
    "hosts_subdomain_explosion",
    "docs_bloom_snapshot_merge",
    "docs_gopher_line_filters",
    "ev_anomaly_daily",
    "ev_markov_transitions",
    "ev_top_paths",
    "ev_rfm_segments",
    "ev_markov_stationary",
    "ev_stickiness",
    "ev_experiment_cuped",
    "ev_assoc_rules",
    "ev_attribution",
    "ev_cohort_ltv",
    "ev_experiment_srm",
    "ev_experiment_ci",
    "ev_next_event_eval",
    "ev_forecast_holt",
    "ev_survival_km",
    "extract_eval_tokenf1",
    "extract_eval_cer",
    "pages_paginate_stitch",
    "pages_thread_explode",
    "mm_phash_near_dup",
    "mm_frame_embed_pool",
    "mm_scene_cuts",
)


def _reorder(out: dict) -> dict:
    front = {k: out[k] for k in _DRIVER_FRONT if k in out}
    front.update(out)
    return front


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7.8."""
    from ocr_spark.plans import (
        curation, dataops, extract_queries, htmlfeat, indexing, linkrank,
        multimodal_queries, queries as q, relational_extra, simsearch,
        sketches, tpch_rest, webops,
    )

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(q.SPARK_QUERIES)
    out.update(extract_queries.SPARK_QUERIES)
    out.update(dataops.SPARK_QUERIES)
    out.update(simsearch.SPARK_QUERIES)
    out.update(multimodal_queries.SPARK_QUERIES)
    out.update(relational_extra.SPARK_QUERIES)
    out.update(tpch_rest.SPARK_QUERIES)
    out.update(webops.SPARK_QUERIES)
    out.update(curation.SPARK_QUERIES)
    out.update(indexing.SPARK_QUERIES)
    out.update(sketches.SPARK_QUERIES)
    out.update(linkrank.SPARK_QUERIES)
    out.update(htmlfeat.SPARK_QUERIES)
    return _reorder(out)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names/aliases)."""
    from ocr_spark.plans import (
        curation, dataops, extract_queries, htmlfeat, indexing, linkrank,
        multimodal_queries, queries as q, relational_extra, simsearch,
        sketches, tpch_rest, webops,
    )

    out: dict[str, str] = {}
    out.update(q.ORACLE_SQL)
    out.update(extract_queries.ORACLE_SQL)
    out.update(dataops.ORACLE_SQL)
    out.update(simsearch.ORACLE_SQL)
    out.update(multimodal_queries.ORACLE_SQL)
    out.update(relational_extra.ORACLE_SQL)
    out.update(tpch_rest.ORACLE_SQL)
    out.update(webops.ORACLE_SQL)
    out.update(curation.ORACLE_SQL)
    out.update(indexing.ORACLE_SQL)
    out.update(sketches.ORACLE_SQL)
    out.update(linkrank.ORACLE_SQL)
    out.update(htmlfeat.ORACLE_SQL)
    return _reorder(out)
