"""Named, oracle-checked queries — the driver-contract surface.

Importing this package registers every query into
``core.registry.QUERIES`` / ``ORACLES``.
"""

from ..core.registry import ORACLES, QUERIES

# Import order feeds registration; the explicit priority list below is
# the driver check order (dict insertion order). The driver checks ~50
# entries per round: (1) queries NEW this round with zero driver
# history, (2) queries whose code or oracle CHANGED after their last
# driver row, (3) the oldest-driver-row cohort in its original order
# (staleness refresh rotation), (4) everything else in registration
# order. tests/test_layout.py::test_priority_rotation_names_valid
# enforces that every name resolves, is unique, and leads iteration.
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
    # (1) NEW this round (round 15) with zero driver history —
    # front-loaded so the first CORRECTNESS row lands this round.
    # Names appended as each operator lands.
    "streaming_ivf_assign_ingest", "decontam_semantic_audit",
    # (2) queries whose CODE changed in round 15 after their last
    # driver row: ann_ivf_learned's centroid derivation was factored
    # into the shared label_centroids helper the new streaming ingest
    # pins its codebook on; minhash_lsh_capped/hot_bucket_rep_dedup
    # derive their semi-join id set with ONE explode scan of the
    # cached candidate frame instead of a two-branch union that raced
    # the cold cache (the r12-time recovery, VERDICT r14 item 3) —
    # values identical in all three, re-checked by the driver itself.
    "ann_ivf_learned", "minhash_lsh_capped", "hot_bucket_rep_dedup",
    # (3) staleness refresh, oldest-first (VERDICT r14 item 1): the 11
    # rows last driver-checked at r7, in their r7 driver-file order...
    "priority_multiset_diff", "quantized_ann_recall", "region_revenue",
    "rollup_revenue", "semi_join_customers", "set_ops_customers",
    "simhash_fingerprints", "small_quantity_revenue", "top_orders",
    "video_frame_sample", "window_topk_orders",
    # ...then the 32 rows last driver-checked at r9, in r9 order...
    "streaming_windowed_counts", "table_profile_stats", "time_bucket_agg",
    "unpivot_event_counts", "variant_props_stats", "xml_roundtrip_stats",
    "zorder_pruned_scan", "ab_test_zscore", "ann_rerank_topk",
    "backfill_partition_overwrite", "bar_chart_data", "bloom_prefilter_stats",
    "bm25_ndcg_eval", "bpe_merge_pairs", "cogroup_order_fill",
    "cohort_retention", "color_chart_data", "corpus_diff_stats",
    "doc_entropy_stats", "dq_expectations", "dsir_select",
    "embedding_batch_scores", "epoch_shuffle_order", "filter_funnel_stats",
    "grouped_agg_udaf", "hard_negative_mining", "heavy_hitters_topk",
    "key_skew_profile", "mad_event_outliers", "merge_into_orders",
    "neardup_triangle_stats", "order_value_position",
    # ...then the head of the r10 cohort, in r10 order, filling the
    # ~50-slot window (2 new + 3 changed + 11 + 32 + 2 = 50). The r10
    # tail leads round 16, then r11/r12.
    "shard_rendezvous_stability", "kcenter_coreset",
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
