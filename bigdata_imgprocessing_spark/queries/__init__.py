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
    # (1) NEW this round (round 10) with zero driver history —
    # front-loaded so the first CORRECTNESS row lands this round (the
    # lsh_incremental_pairs lesson from VERDICT r7).
    "simhash64_neardup", "shard_rendezvous_stability", "kcenter_coreset",
    "streaming_simhash_ingest", "cms_frequency_audit",
    "embedding_centroid_drift", "video_scene_cuts", "audio_silence_runs", "seasonal_naive_mase",
    # (2) the 22 rows whose latest driver row is still round 5 — the
    # tail of the r5 cohort past round 9's 50-slot window (VERDICT r9
    # item 1 says to lead with them).
    "pagerank_neardup", "pipe_syntax_summary", "pit_join_features",
    "recursive_calendar_revenue", "scd2_user_history",
    "score_calibration_bins", "semdedup_prune", "sliding_distinct_users",
    "sliding_users_sketch", "source_mixture_drift", "split_leakage_audit",
    "sql_udf_price_bands", "streaming_dedup_within_watermark",
    "streaming_outer_join", "streaming_pysource_counts",
    "streaming_sketch_rollup", "try_arithmetic_audit", "udtf_sentence_stats",
    "unigram_logprob_filter", "user_erasure_apply", "user_erasure_audit",
    "winnowing_fingerprints",
    # (3) the 50 rows whose latest driver row is round 6, oldest-first
    # (registration order); the tail past the ~50-row window leads the
    # round-11 rotation.
    "embedding_lsh_neardup", "doc_split_stats", "doc_pack_stats",
    "stratified_sample_stats", "fixed_size_group_sample",
    "minhash_band_stats", "dedup_keep_best", "dedup_incremental_stats",
    "ngram_containment_hist", "listagg_order_lines", "collation_group_names",
    "mode_per_group", "bitmap_distinct_users", "m4_downsample",
    "pareto_front_orders", "chi2_lang_source", "ks_score_drift",
    "gini_revenue_concentration", "cusum_changepoint",
    "interval_merge_coverage", "rfm_segmentation", "weighted_doc_sample",
    "detection_class_names", "image_corrupt_quarantine",
    "audio_feature_extract", "doc_embedding_join_stats",
    "stats_pipeline_e2e", "bucketed_join_revenue", "jsonl_roundtrip_stats",
    "report_text_roundtrip", "cached_predictions_stats", "distinct_counts",
    "null_safe_reconcile", "knn_bruteforce", "ann_ivf_topk",
    "nearest_centroid_counts", "embedding_norm_stats",
    "embedding_model_scores", "streaming_stateful_totals",
    "streaming_erasure_feed", "doc_token_stats", "doc_quality_scores",
    "lang_id_confusion", "doc_fingerprints", "conditional_agg_ratio",
    "keyword_doc_stats", "keyword_lang_stats", "tfidf_top_terms",
    "vocab_top_terms", "repetition_ngram_stats",
    # (4) r7+-green rows follow in registration order.
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
