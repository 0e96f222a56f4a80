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
    # (1) the ONLY registry entry with zero driver history — registered
    # after the r7 window closed (VERDICT r7 item 2); first
    # CORRECTNESS row pending.
    "lsh_incremental_pairs",
    # (2) output CHANGED or NEW this round: image_format_ingest gained
    # the adversarial textured-JPEG leg (vec_id%24 in (17,23) — AC
    # zero-run / refinement-ZRL coverage under the driver hash, VERDICT
    # r7 item 3); equidepth_approx_audit is the new approx-percentile
    # variant of the equi-depth histogram (item 7).
    "image_format_ingest", "equidepth_approx_audit",
    # (2b) NEW this round with zero driver history (registered late in
    # round 8): the Gopher-style rule panel and the PSI release-drift
    # audit. Front-loaded so their first CORRECTNESS row lands this
    # round rather than being flagged as never-checked (the
    # lsh_incremental_pairs lesson from VERDICT r7).
    "gopher_quality_rules", "psi_release_drift", "kcore_neardup",
    "component_safe_split", "hyperball_reach", "sorted_neighbor_lcp",
    "dim_truncation_recall", "k_anonymity_audit", "vocab_growth_curve",
    "streaming_lsh_ingest", "cdc_chunk_dedup", "attribution_touchpoints",
    "kmeans_lloyd_rounds", "dpp_partition_join",
    "streaming_quota_admission", "er_golden_record",
    "hll_intersection_audit",
    # (3) the 50 rows whose latest driver check is round 4 —
    # oldest-first refresh rotation (4-round cadence; the few that
    # overflow this round's ~50-row window lead the r9 rotation).
    "approx_sketch_stats", "asof_purchase_click", "bm25_search",
    "compaction_file_stats", "daily_counts_gapfilled", "event_histogram",
    "event_transition_counts", "funnel_conversion_stats",
    "fuzzy_match_stats", "grouping_sets_revenue", "heatmap_chart_data",
    "ivf_search_served", "json_map_extract", "jsonl_corrupt_handling",
    "lag_order_gaps", "lateral_topk_customers", "locf_daily_values",
    "lone_problem_supplier", "map_measure_rollup", "mixture_sample_stats",
    "neardup_component_dedup", "orc_roundtrip_stats", "outlier_order_stats",
    "percentile_stats", "pii_scrub_stats", "pivot_event_counts",
    "pmi_collocations", "range_join_funnel", "range_window_counts",
    "regex_token_stats", "salted_event_sum", "schema_evolution_union",
    "session_windows", "sliding_window_agg", "streaming_dedup_counts",
    "streaming_enriched_counts", "streaming_event_counts",
    "streaming_foreachbatch_counts", "streaming_interval_join",
    "streaming_kafka_roundtrip", "streaming_replay_dedup",
    "streaming_session_windows", "streaming_upsert_latest",
    "streaming_windowed_counts", "table_profile_stats", "time_bucket_agg",
    "unpivot_event_counts", "variant_props_stats", "xml_roundtrip_stats",
    "zorder_pruned_scan",
    # (4) r5+-green rows follow in registration order.
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
