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
    # (1) NEW this round (round 9) with zero driver history —
    # front-loaded so the first CORRECTNESS row lands this round (the
    # lsh_incremental_pairs lesson from VERDICT r7) — and the one
    # query whose OUTPUT changed this round (image_format_ingest
    # gained the 12-bit Adobe CMYK/YCCK leg at slot %48==44).
    "hamming1_neighbor_pairs", "decontam_bloom_prefilter",
    "streaming_decontam_ingest", "image_format_ingest",
    # (2) the 20 rows whose latest driver check is still round 4 — the
    # overflow VERDICT r8 item 1 says to lead with (they are 5 rounds
    # stale after r9's window).
    "salted_event_sum", "schema_evolution_union", "session_windows",
    "sliding_window_agg", "streaming_dedup_counts",
    "streaming_enriched_counts", "streaming_event_counts",
    "streaming_foreachbatch_counts", "streaming_interval_join",
    "streaming_kafka_roundtrip", "streaming_replay_dedup",
    "streaming_session_windows", "streaming_upsert_latest",
    "streaming_windowed_counts", "table_profile_stats", "time_bucket_agg",
    "unpivot_event_counts", "variant_props_stats", "xml_roundtrip_stats",
    "zorder_pruned_scan",
    # (3) the 48 rows whose latest driver row is round 5, oldest-first
    # (registration order); the tail past the ~50-row window leads the
    # round-10 rotation.
    "ab_test_zscore", "ann_rerank_topk", "backfill_partition_overwrite",
    "bar_chart_data", "bloom_prefilter_stats", "bm25_ndcg_eval",
    "bpe_merge_pairs", "cogroup_order_fill", "cohort_retention",
    "color_chart_data", "corpus_diff_stats", "doc_entropy_stats",
    "dq_expectations", "dsir_select", "dup_ngram_coverage",
    "embedding_batch_scores", "epoch_shuffle_order", "filter_funnel_stats",
    "grouped_agg_udaf", "hard_negative_mining", "heavy_hitters_topk",
    "key_skew_profile", "mad_event_outliers", "merge_into_orders",
    "neardup_triangle_stats", "order_value_position", "pagerank_neardup",
    "pipe_syntax_summary", "pit_join_features", "recursive_calendar_revenue",
    "scd2_user_history", "score_calibration_bins", "semdedup_prune",
    "sliding_distinct_users", "sliding_users_sketch", "source_mixture_drift",
    "split_leakage_audit", "sql_udf_price_bands",
    "streaming_dedup_within_watermark", "streaming_outer_join",
    "streaming_pysource_counts", "streaming_sketch_rollup",
    "try_arithmetic_audit", "udtf_sentence_stats", "unigram_logprob_filter",
    "user_erasure_apply", "user_erasure_audit", "winnowing_fingerprints",
    # (4) r6+-green rows follow in registration order.
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
