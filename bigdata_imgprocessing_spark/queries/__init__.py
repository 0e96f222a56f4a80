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
    # (1) NEW this round (round 13) with zero driver history —
    # front-loaded so the first CORRECTNESS row lands this round.
    # Names appended as each operator lands.
    "streaming_lsh_ingest_capped", "blocklist_lexicon_filter",
    "bh_fdr_price_tests", "conformal_coverage_eval",
    # (2) queries whose CODE changed in round 13 after their r12
    # driver row: kruskal's tie-term sum widened to decimal(38,0); the
    # capped-dedup/store family moved to scaled_width partitioning and
    # the landed stores were re-versioned (pairs/postings/wordgrams/
    # bands -v2) — values proven identical by store-freshness tests +
    # a 41-query dedup-family driver-sim, re-checked here by the
    # driver itself. Representative store consumers follow the heads.
    "kruskal_wallis_price", "minhash_lsh_capped", "hot_bucket_rep_dedup",
    "minhash_lsh_pairs", "doc_chain_components", "neardup_component_dedup",
    "ngram_containment_hist", "dup_ngram_coverage", "label_prop_communities",
    "pagerank_neardup", "split_leakage_audit",
    # (3) the r8 TAIL (21 rows whose latest driver row is still r8 —
    # NOTES round-13 bookkeeping: drain oldest-first), in r8 order.
    "image_format_ingest", "equidepth_approx_audit", "gopher_quality_rules",
    "psi_release_drift", "kcore_neardup", "hyperball_reach",
    "sorted_neighbor_lcp", "dim_truncation_recall", "k_anonymity_audit",
    "vocab_growth_curve", "cdc_chunk_dedup", "attribution_touchpoints",
    "kmeans_lloyd_rounds", "dpp_partition_join", "streaming_quota_admission",
    "hll_intersection_audit", "jsonl_corrupt_handling",
    "lateral_topk_customers", "locf_daily_values", "outlier_order_stats",
    "pmi_collocations",
    # (4) the r9 cohort head (47 stale rows, r9 driver-row order) fills
    # the remaining window slots; r10/r11 follow in later rounds.
    "hamming1_neighbor_pairs", "salted_event_sum", "schema_evolution_union",
    "session_windows", "sliding_window_agg", "streaming_dedup_counts",
    "streaming_enriched_counts", "streaming_event_counts",
    "streaming_foreachbatch_counts", "streaming_interval_join",
    "streaming_kafka_roundtrip", "streaming_replay_dedup",
    "streaming_session_windows", "streaming_upsert_latest",
    "streaming_windowed_counts", "table_profile_stats", "time_bucket_agg",
    "unpivot_event_counts", "variant_props_stats", "xml_roundtrip_stats",
    "zorder_pruned_scan", "ab_test_zscore", "ann_rerank_topk",
    "backfill_partition_overwrite", "bar_chart_data",
    "bloom_prefilter_stats", "bm25_ndcg_eval", "bpe_merge_pairs",
]
_ordered = {n: QUERIES[n] for n in _PRIORITY if n in QUERIES}
_ordered.update({n: q for n, q in QUERIES.items() if n not in _ordered})
QUERIES.clear()
QUERIES.update(_ordered)

__all__ = ["QUERIES", "ORACLES"]
