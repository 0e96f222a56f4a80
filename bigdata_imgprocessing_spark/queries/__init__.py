"""Named, oracle-checked queries — the driver-contract surface.

Importing this package registers every query into
``core.registry.QUERIES`` / ``ORACLES``.
"""

from ..core.registry import ORACLES, QUERIES

# Import order feeds registration; the explicit priority list below is
# the driver check order (dict insertion order). The driver checks ~50
# entries per round, so the round-6 order is: (1) the 14 queries NEW
# this round (first CORRECTNESS row pending), (1b) the 4 round-5
# queries that fell just outside round 5's 50-slot window, (2) the 32
# queries whose latest driver row is round 1-2 (VERDICT r4 punch-list
# item 1 — local parity has them green, but the driver row is the hard
# signal), (3) everything else in registration order. 14+4+32 = 50.
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
    # (1) new round-6 queries — first CORRECTNESS row pending.
    "listagg_order_lines", "collation_group_names", "mode_per_group",
    "bitmap_distinct_users", "m4_downsample", "pareto_front_orders",
    "chi2_lang_source", "ks_score_drift", "gini_revenue_concentration",
    "cusum_changepoint", "interval_merge_coverage", "rfm_segmentation",
    "weighted_doc_sample", "ngram_containment_hist",
    # (1b) round-5 queries that fell outside round 5's 50-slot window
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
