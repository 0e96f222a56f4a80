"""Named, oracle-checked queries — the driver-contract surface.

Importing this package registers every query into
``core.registry.QUERIES`` / ``ORACLES``.
"""

from ..core.registry import ORACLES, QUERIES

# Import order feeds registration; the explicit priority list below is
# the driver check order (dict insertion order). The driver checks ~50
# entries per round, so the round-4 order is: (1) the two queries that
# have NEVER had a CORRECTNESS row in any round, (2) every
# events-dependent query — their r1/r2 green rows predate the testdata
# regeneration that changed events.ts to timestamp[us], and round 3
# recorded 6 of them as fail/error before the schema-driven catalog fix
# (core/catalog.py normalize_event_ts) — all 27 need fresh rows, (3)
# new round-4 queries, then the standing r2/r3-green rows in
# registration order.
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
    # (1) never had a CORRECTNESS row in any round
    "xml_roundtrip_stats", "compaction_file_stats",
    # (2) events-dependent — r1/r2 rows are stale (testdata regenerated
    # with timestamp[us] ts); r3 recorded the starred ones as
    # fail/error pre-fix. First the 6 r3 fails:
    "approx_sketch_stats", "streaming_upsert_latest",
    "orc_roundtrip_stats", "variant_props_stats", "percentile_stats",
    "pivot_event_counts",
    # then the remaining 21 events readers:
    "json_map_extract", "unpivot_event_counts", "event_histogram",
    "salted_event_sum", "event_transition_counts",
    "time_bucket_agg", "sliding_window_agg", "session_windows",
    "asof_purchase_click", "range_join_funnel", "daily_counts_gapfilled",
    "range_window_counts",
    "streaming_event_counts", "streaming_windowed_counts",
    "streaming_dedup_counts", "streaming_session_windows",
    "streaming_interval_join", "streaming_foreachbatch_counts",
    "streaming_kafka_roundtrip", "streaming_replay_dedup",
    "streaming_enriched_counts",
    # (3) new round-4 queries — first CORRECTNESS row pending.
    "heatmap_chart_data", "ivf_search_served", "pii_scrub_stats",
    "fuzzy_match_stats", "lone_problem_supplier", "neardup_component_dedup",
    "mixture_sample_stats", "bm25_search", "table_profile_stats",
    "zorder_pruned_scan", "funnel_conversion_stats", "jsonl_corrupt_handling",
    "lateral_topk_customers", "schema_evolution_union",
    "outlier_order_stats", "locf_daily_values", "pmi_collocations",
    # (4) standing r2/r3-green rows follow in registration order.
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
