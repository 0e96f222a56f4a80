"""Named, oracle-checked queries — the driver-contract surface.

Importing this package registers every query into
``core.registry.QUERIES`` / ``ORACLES``.
"""

from ..core.registry import ORACLES, QUERIES

# Import order feeds registration; the explicit priority list below is
# the driver check order (dict insertion order). The driver checks ~50
# entries per round, so the round-8 order is: (1) the one query with
# zero driver history, (2) queries NEW or with CHANGED outputs this
# round (2b = registered late in round 8, first driver row pending),
# (3) the 50 queries whose latest driver row is round 4 (oldest-first
# refresh rotation), (4) everything else in registration order.
from . import advanced  # noqa: F401
from . import analytics  # noqa: F401
from . import curation  # noqa: F401
from . import dedup  # noqa: F401
from . import images  # noqa: F401
from . import multimodal  # noqa: F401
from . import pipeline_queries  # noqa: F401
from . import quality  # noqa: F401
from . import relational  # noqa: F401
from . import similarity  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import text  # noqa: F401
from . import timeseries  # noqa: F401  (registration side effect)

_PRIORITY = [
    # (1) NEW this round (round 11) with zero driver history —
    # front-loaded so the first CORRECTNESS row lands this round (the
    # lsh_incremental_pairs lesson from VERDICT r7). Names appended as
    # each operator lands.
    "kaplan_meier_churn", "benford_amount_audit",
    "mannwhitney_price_shift", "ols_revenue_trend",
    "decontam_store_prefilter", "streaming_ewma_anomaly",
    "jackknife_revenue_variance", "zipf_law_fit", "observed_scan_metrics",
    "simhash64_neardup_capped",
    # (1b) registered late in round 11 (continuation session) — zero
    # driver history, so they lead the remaining window slots.
    "roc_auc_eval", "dbscan_core_points", "spearman_rank_corr",
    "theilsen_revenue_trend", "logrank_survival_test", "acf_daily_revenue",
    "exact_deciles_no_sort", "mixture_epoch_plan", "image_patch_tokens",
    "cross_source_dup_rate", "pinball_quantile_eval",
    "trimmed_mean_no_sort", "kendall_tau_trend",
    "runs_test_randomness", "poisson_dispersion_check",
    "weekday_seasonality_strength", "isotonic_calibration",
    "mcnemar_filter_agreement",
    # (2) queries whose CODE was refactored in round 10 AFTER their
    # last driver row (ADVICE r10 item 1): the strictly-before /
    # concurrent-write refactor and the semi-join-to-filter change
    # shipped without a fresh cross-engine hash row — re-check first.
    "streaming_lsh_ingest", "streaming_decontam_ingest",
    "decontam_bloom_prefilter",
    # (3) the 31 rows whose latest driver row is still round 6 — the
    # tail of the r6 cohort past round 10's 50-slot window (VERDICT
    # r10 item 1: no row older than r7 after this round).
    "detection_class_names", "audio_feature_extract", "distinct_counts",
    "knn_bruteforce", "ann_ivf_topk", "nearest_centroid_counts",
    "embedding_norm_stats", "embedding_model_scores", "doc_token_stats",
    "doc_quality_scores", "lang_id_confusion", "doc_fingerprints",
    "conditional_agg_ratio", "keyword_doc_stats", "keyword_lang_stats",
    "tfidf_top_terms", "stats_pipeline_e2e", "jsonl_roundtrip_stats",
    "bucketed_join_revenue", "report_text_roundtrip", "vocab_top_terms",
    "repetition_ngram_stats", "streaming_stateful_totals",
    "doc_embedding_join_stats", "cached_predictions_stats",
    "interval_merge_coverage", "rfm_segmentation", "weighted_doc_sample",
    "null_safe_reconcile", "streaming_erasure_feed",
    "image_corrupt_quarantine",
    # (4) the 49-row r7 cohort, oldest-first (registration order); the
    # tail past the 50-slot window leads the round-12 rotation.
    "approx_balance_deciles", "doc_chunk_windows", "doc_quality_filter",
    "decontam_ngram_overlap", "dedup_exact", "minhash_lsh_pairs",
    "ngram_jaccard_hist", "simhash_fingerprints", "doc_chain_components",
    "label_prop_communities", "pair_rouge_stats", "minhash_estimate_error",
    "freq_event_pairs", "kll_quantile_drift", "equidepth_price_buckets",
    "image_avg_color", "image_dominant_hist", "image_detection_counts",
    "image_predictions", "image_phash_neardup", "image_letterbox_stats",
    "video_frame_sample", "cluster_profile", "pricing_summary",
    "alphabet_stats", "top_orders", "region_revenue",
    "name_length_buckets", "semi_join_customers", "anti_join_customers",
    "outer_join_order_counts", "window_topk_orders", "moving_avg_orders",
    "rollup_revenue", "cube_order_stats", "set_ops_customers",
    "full_outer_nation_counts", "exists_late_orders",
    "small_quantity_revenue", "inactive_rich_customers",
    "customer_balance_deciles", "priority_multiset_diff",
    "market_share_by_year", "ann_ivf_learned", "quantized_ann_recall",
    "pq_ann_recall", "mmr_diverse_topk", "bpe_apply_stats",
    "session_funnel_stats",
    # (5) r8+-green rows follow in registration order.
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
