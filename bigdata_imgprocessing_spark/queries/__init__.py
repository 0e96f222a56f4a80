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
    # (2b) queries whose PLAN changed in the r15 OPTIMIZATION pass
    # (values proven identical at sf0.001/0.01/0.1 + full driver-sim;
    # the driver's own row is the final re-check): the rank-monitor
    # duplicate-subtree fixes and the plan-audit scan diet —
    # OPTIMIZATION_r15.md has the per-query evidence.
    "spearman_rank_corr", "mannwhitney_price_shift", "acf_daily_revenue",
    "isotonic_calibration", "pinball_quantile_eval", "kendall_tau_trend",
    "theilsen_revenue_trend", "runs_test_randomness",
    "weekday_seasonality_strength", "seasonal_naive_mase",
    "ols_revenue_trend", "kaplan_meier_churn", "logrank_survival_test",
    "poisson_dispersion_check", "embedding_centroid_drift",
    "fuzzy_match_stats",
    # (3) staleness refresh, oldest-first (VERDICT r14 item 1): the 11
    # rows last driver-checked at r7, in their r7 driver-file order
    # (priority_multiset_diff is also an r15 plan change)...
    "priority_multiset_diff", "quantized_ann_recall", "region_revenue",
    "rollup_revenue", "semi_join_customers", "set_ops_customers",
    "simhash_fingerprints", "small_quantity_revenue", "top_orders",
    "video_frame_sample", "window_topk_orders",
    # ...then the head of the 32-row r9 cohort, in r9 order, filling
    # the ~50-slot window (2 new + 19 changed + 11 + 18 = 50). The r9
    # tail (from doc_entropy_stats) leads round 16, then r10/r11/r12.
    "streaming_windowed_counts", "table_profile_stats", "time_bucket_agg",
    "unpivot_event_counts", "variant_props_stats", "xml_roundtrip_stats",
    "zorder_pruned_scan", "ab_test_zscore", "ann_rerank_topk",
    "backfill_partition_overwrite", "bar_chart_data", "bloom_prefilter_stats",
    "bm25_ndcg_eval", "bpe_merge_pairs", "cogroup_order_fill",
    "cohort_retention", "color_chart_data", "corpus_diff_stats",
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
