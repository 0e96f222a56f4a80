"""Named, oracle-checked queries — the driver-contract surface.

Importing this package registers every query into
``core.registry.QUERIES`` / ``ORACLES``.
"""

from ..core.registry import ORACLES, QUERIES

# Import order feeds registration; the explicit priority list below is
# the driver check order (dict insertion order). The driver checks ~50
# entries per round, so the round-7 order is: (1) the 6 round-6 queries
# registered after the r6 driver window closed (locally green, first
# driver row pending — VERDICT r6 item 1), (2) queries NEW or with
# CHANGED outputs this round, (3) the 39 queries whose latest driver
# row is round 3 (oldest-first refresh rotation), (4) everything else
# in registration order.
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
    # (1) round-6 queries banked past the r6 driver window — first
    # CORRECTNESS row pending (VERDICT r6 item 1).
    "bpe_apply_stats", "freq_event_pairs", "pair_rouge_stats",
    "minhash_estimate_error", "mmr_diverse_topk", "session_funnel_stats",
    # (2) new this round (label-propagation communities, KLL-sketch
    # quantile drift) or output-changed: pq_ann_recall gained a k=16
    # sampled codebook + rerank leg; image_format_ingest's JPEG leg now
    # half 4:2:0-subsampled (hash-identical by design — re-confirmed).
    "label_prop_communities", "kll_quantile_drift",
    "equidepth_price_buckets",
    "pq_ann_recall", "image_format_ingest",
    # (3) the 39 rows whose latest driver check is round 3 —
    # oldest-first refresh rotation.
    "alphabet_stats", "ann_ivf_learned", "anti_join_customers",
    "approx_balance_deciles", "cluster_profile", "cube_order_stats",
    "customer_balance_deciles", "decontam_ngram_overlap", "dedup_exact",
    "doc_chain_components", "doc_chunk_windows", "doc_quality_filter",
    "exists_late_orders", "full_outer_nation_counts", "image_avg_color",
    "image_detection_counts", "image_dominant_hist",
    "image_letterbox_stats", "image_phash_neardup", "image_predictions",
    "inactive_rich_customers", "market_share_by_year",
    "minhash_lsh_pairs", "moving_avg_orders", "name_length_buckets",
    "ngram_jaccard_hist", "outer_join_order_counts", "pricing_summary",
    "priority_multiset_diff", "quantized_ann_recall", "region_revenue",
    "rollup_revenue", "semi_join_customers", "set_ops_customers",
    "simhash_fingerprints", "small_quantity_revenue", "top_orders",
    "video_frame_sample", "window_topk_orders",
    # (4) r4+-green rows follow in registration order.
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
