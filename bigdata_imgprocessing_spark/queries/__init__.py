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
    # (1) NEW this round (round 12) with zero driver history —
    # front-loaded so the first CORRECTNESS row lands this round (the
    # lsh_incremental_pairs lesson from VERDICT r7). Names appended as
    # each operator lands.
    "welch_ttest_price", "cramers_v_association", "topk_capture_eval",
    "minhash_lsh_capped", "hot_bucket_rep_dedup",
    "kruskal_wallis_price", "poisson_bootstrap_ci",
    "blocklist_safety_filter",
    # (2) queries whose CODE or ORACLE changed in round 12 AFTER their
    # r11 driver row — re-check first: the lsh ingest got the F.expr
    # plan-construction rewrite + write restructure (and the shared
    # _shingles/_minhash_signatures/_band_frame builders moved to
    # F.expr, touching the whole minhash family), runs_test gained the
    # symmetric degenerate guard (oracle text changed), dbscan gained
    # the cell-width boundary guard.
    "streaming_lsh_ingest", "runs_test_randomness", "dbscan_core_points",
    "minhash_lsh_pairs", "lsh_incremental_pairs", "minhash_band_stats",
    "minhash_estimate_error", "ngram_jaccard_hist", "cross_source_dup_rate",
    "winnowing_fingerprints", "pair_rouge_stats",
    # (2b) connected_components moved to lazy localCheckpoint and
    # er_golden_record's survivorship collapsed to one aggregation —
    # re-check the closure consumers whose plans changed (values
    # proven identical by the r12 targeted driver-sim).
    "er_golden_record", "doc_chain_components", "neardup_component_dedup",
    "component_safe_split", "image_phash_neardup", "embedding_lsh_neardup",
    "simhash64_neardup",
    # (3) the r8 cohort (48 rows, oldest driver rows remaining after
    # the judge's manual r6+r7 re-verify in round 11 — VERDICT r11
    # item 2: the window drains oldest-first from r8), in their r8
    # driver-row order.
    "map_measure_rollup", "lag_order_gaps", "grouping_sets_revenue",
    "regex_token_stats", "percentile_stats", "approx_sketch_stats",
    "event_histogram", "json_map_extract", "pivot_event_counts",
    "asof_purchase_click", "range_join_funnel", "daily_counts_gapfilled",
    "event_transition_counts", "range_window_counts", "orc_roundtrip_stats",
    "compaction_file_stats", "heatmap_chart_data", "ivf_search_served",
    "pii_scrub_stats", "fuzzy_match_stats", "lone_problem_supplier",
    "mixture_sample_stats", "bm25_search",
    "funnel_conversion_stats", "jsonl_corrupt_handling",
    "lateral_topk_customers", "outlier_order_stats", "locf_daily_values",
    "pmi_collocations", "equidepth_approx_audit", "gopher_quality_rules",
    "psi_release_drift", "kcore_neardup",
    "hyperball_reach", "sorted_neighbor_lcp", "dim_truncation_recall",
    "k_anonymity_audit", "vocab_growth_curve", "cdc_chunk_dedup",
    "attribution_touchpoints", "kmeans_lloyd_rounds", "dpp_partition_join",
    "streaming_quota_admission",
    "hll_intersection_audit",
    # (4) the r9 cohort follows (48 rows, registration order) for the
    # slots past this round's window; then r10/r11 in registration
    # order.
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
