"""Named, oracle-checked queries — the driver-contract surface.

Importing this package registers every query into
``core.registry.QUERIES`` / ``ORACLES``.
"""

from ..core.registry import ORACLES, QUERIES

# Import order feeds registration; the explicit priority list below is
# the driver check order (dict insertion order). The driver checks ~50
# entries per round, so order = (1) new r3 queries that have NEVER had a
# CORRECTNESS row (their first row is the highest-value check), (2)
# queries whose latest green row is r1-era (validated BEFORE the
# strictified parity gate / oracle-type audit — re-confirm them under
# it; VERDICT r2 "Next round" item 2), (3) r2-green queries (their rows
# stand under the current gate). (1)+(2) is 54 names for a ~50 window:
# the ones that may fall out are the last three of (2) — simple
# r1-green aggregates / a 3-row static dim, the least risky rows.
from . import advanced  # noqa: F401
from . import curation  # noqa: F401
from . import dedup  # noqa: F401
from . import images  # noqa: F401
from . import multimodal  # noqa: F401
from . import pipeline_queries  # noqa: F401
from . import relational  # noqa: F401
from . import similarity  # noqa: F401
from . import streaming_queries  # noqa: F401
from . import text  # noqa: F401
from . import timeseries  # noqa: F401  (registration side effect)

_PRIORITY = [
    # (1) new in r3 — never had a CORRECTNESS row
    "approx_balance_deciles",  # upgraded r3: rows-only -> hash-checked bound
    "approx_sketch_stats",  # same upgrade (was rows-only by design)
    "streaming_kafka_roundtrip", "streaming_upsert_latest",
    "ann_ivf_learned", "decontam_ngram_overlap", "quantized_ann_recall",
    "streaming_replay_dedup", "image_phash_neardup", "orc_roundtrip_stats",
    "streaming_enriched_counts", "market_share_by_year",
    "variant_props_stats",
    # (2) latest green row is r1-era (not in CORRECTNESS_r02.json) —
    # re-confirm under the strictified gate. 41 names, computed as
    # QUERIES - r2-checked set.
    "grouping_sets_revenue", "regex_token_stats", "percentile_stats",
    "doc_chunk_windows", "doc_quality_filter",
    "dedup_exact", "minhash_lsh_pairs", "ngram_jaccard_hist",
    "simhash_fingerprints", "doc_chain_components", "image_avg_color",
    "image_dominant_hist", "image_detection_counts",
    "image_predictions", "image_letterbox_stats",
    "video_frame_sample", "cluster_profile", "pricing_summary",
    "alphabet_stats", "top_orders", "region_revenue",
    "name_length_buckets", "semi_join_customers", "anti_join_customers",
    "outer_join_order_counts",
    "pivot_event_counts", "window_topk_orders", "moving_avg_orders",
    "rollup_revenue", "cube_order_stats", "set_ops_customers",
    "full_outer_nation_counts", "exists_late_orders",
    "small_quantity_revenue", "inactive_rich_customers",
    "customer_balance_deciles", "priority_multiset_diff",
    # least-risky standing rows last — with 54 names for a ~50 window
    # these are the ones that may fall outside (simple single-shuffle
    # aggregates / a 3-row static dim, all r1-green)
    "distinct_counts", "event_histogram", "detection_class_names",
    # (3) r2-green queries follow in registration order (rows stand).
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
