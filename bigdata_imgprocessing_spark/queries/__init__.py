"""Named, oracle-checked queries — the driver-contract surface.

Importing this package registers every query into
``core.registry.QUERIES`` / ``ORACLES``.
"""

from ..core.registry import ORACLES, QUERIES

# Import order feeds registration; the explicit priority list below is
# the driver check order (dict insertion order). The driver checks ~50
# entries per round, so the round-5 order is: (1) queries NEW this
# round (first CORRECTNESS row pending), (2) the 32 queries whose
# latest driver row is round 1-2 — the codebase has changed
# substantially since, so they need a fresh row even though the local
# parity gate has them green (VERDICT r4 punch-list item 1), (3) the
# r3/r4-green rows in registration order.
from . import advanced  # noqa: F401
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
    # (1) new round-5 queries — first CORRECTNESS row pending.
    "semdedup_prune", "bpe_merge_pairs", "pagerank_neardup",
    "cogroup_order_fill", "heavy_hitters_topk", "streaming_outer_join",
    "dsir_select", "streaming_pysource_counts", "doc_entropy_stats",
    "try_arithmetic_audit", "streaming_dedup_within_watermark",
    "grouped_agg_udaf", "sql_udf_price_bands",
    # (1b) added after the 50-slot window filled — first row lands in r6
    "recursive_calendar_revenue", "pipe_syntax_summary",
    "pit_join_features", "dq_expectations",
    "filter_funnel_stats", "unigram_logprob_filter", "source_mixture_drift",
    "mad_event_outliers", "merge_into_orders", "ann_rerank_topk",
    "dup_ngram_coverage", "sliding_distinct_users", "cohort_retention",
    "split_leakage_audit", "epoch_shuffle_order",
    "backfill_partition_overwrite", "sliding_users_sketch",
    "corpus_diff_stats", "streaming_sketch_rollup",
    "hard_negative_mining", "bloom_prefilter_stats",
    "ab_test_zscore", "neardup_triangle_stats", "bm25_ndcg_eval",
    "score_calibration_bins",
    "bar_chart_data", "color_chart_data", "image_format_ingest",
    "embedding_batch_scores", "scd2_user_history", "order_value_position",
    "udtf_sentence_stats", "pq_ann_recall", "winnowing_fingerprints",
    "user_erasure_audit", "user_erasure_apply", "key_skew_profile",
    "fixed_size_group_sample", "null_safe_reconcile",
    "streaming_erasure_feed", "image_corrupt_quarantine",
    # (2) the 32 stale rows (latest driver check r1-r2; VERDICT r4 #1)
    "ann_ivf_topk", "audio_feature_extract", "bucketed_join_revenue",
    "cached_predictions_stats", "conditional_agg_ratio",
    "dedup_incremental_stats", "dedup_keep_best", "detection_class_names",
    "distinct_counts", "doc_embedding_join_stats", "doc_fingerprints",
    "doc_pack_stats", "doc_quality_scores", "doc_split_stats",
    "doc_token_stats", "embedding_lsh_neardup", "embedding_model_scores",
    "embedding_norm_stats", "jsonl_roundtrip_stats", "keyword_doc_stats",
    "keyword_lang_stats", "knn_bruteforce", "lang_id_confusion",
    "minhash_band_stats", "nearest_centroid_counts",
    "repetition_ngram_stats", "report_text_roundtrip",
    "stats_pipeline_e2e", "stratified_sample_stats",
    "streaming_stateful_totals", "tfidf_top_terms", "vocab_top_terms",
    # (3) r3/r4-green rows follow in registration order.
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
