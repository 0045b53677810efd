"""Query-plan library: SURVEY.md §2's operator inventory as named queries.

Every operator the reference uses is re-expressed here as an idiomatic
DataFrame/SQL plan over the driver's test tables, each paired with an ANSI
SQL oracle (DuckDB-runnable) for hash-checked correctness. Import order
populates the registry.
"""

from gwasdb_spark.plans.base import QUERIES, Query, query, oracle_map, query_map

# Populate the registry (import side effects).
from gwasdb_spark.plans import relational as _relational  # noqa: F401
from gwasdb_spark.plans import extensions as _extensions  # noqa: F401
from gwasdb_spark.plans import tpch_extra as _tpch_extra  # noqa: F401
from gwasdb_spark.plans import corpus_quality as _corpus_quality  # noqa: F401
from gwasdb_spark.plans import scale_ops as _scale_ops  # noqa: F401

# ---------------------------------------------------------------------------
# Registration-order priority.
#
# The driver's correctness gate records the FIRST 50 registered queries per
# round. Rounds 1/3/4/5 adjudicated the reference-surface core, the
# regressed-then-fixed block, the round-3 tail + ANN/cluster upgrades, and
# the 50 oldest never-checked registrations (all green, r01∪r03∪r04∪r05).
# Round 6 seats the FINAL 45 registrations that have never held a driver
# row — the 20 r4-deferred (g09-g11, mm05/mm06, s24/s25, st15, w10,
# x63-x73) and the 25 round-5 additions (x74-x95, s26, g12/g13) — plus 5
# backfill seats: x39 (its PageRank hash oracle landed in r5 but its only
# driver row is r4's no_oracle), x12/x12g (last rows r2/r4 predate the r5
# _rank_topk rewrite), x41 (last row r4 predates the r5 exact_ntile fix),
# and x62 (its serve path is re-benched split this round). After this
# window every query registered BEFORE round 6 holds a driver row; the 8
# round-6 additions (x96-x100, sk03, e03, g14) are round 7's seats. All
# 50 seats hold in-repo oracle green rows (sf0.01 + sf0.001). File order
# within modules is unchanged; only the registry's iteration order is
# rebuilt here.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # 20 r4-deferred registrations (registration order)
    "s24_schema_evolution",
    "g09_qq_binned",
    "s25_gzip_csv_roundtrip",
    "g10_maf_spectrum",
    "g11_hwe_chisq",
    "w10_first_last_value",
    "mm05_modality_dispatch",
    "x63_triangle_counts",
    "x64_event_debounce",
    "x65_semantic_dedup",
    "x66_mad_outliers",
    "x67_winsorize",
    "mm06_binary_dedup",
    "x68_keyword_tfidf",
    "x69_rolling_distinct",
    "st15_session_durations",
    "x70_activity_streaks",
    "x71_cooccurrence_counts",
    "x72_cumulative_uniques",
    "x73_langid_confusion",
    # 25 round-5 additions
    "x74_global_rank",
    "x75_ntile_deciles",
    "x76_percentile_cut",
    "x77_weighted_sample",
    "x78_table_profile",
    "x79_stopword_discovery",
    "x80_kcore",
    "x81_k_anonymity",
    "x82_cluster_size_histogram",
    "x83_zipf_slope",
    "x84_lexical_richness",
    "x85_source_kl_divergence",
    "x86_label_centroid_sim",
    "x87_centroid_outliers",
    "x88_funnel_latency",
    "s26_compaction_roundtrip",
    "x89_gap_fill",
    "x90_forward_fill",
    "x91_series_anomalies",
    "g12_meta_analysis",
    "g13_genomic_control",
    "x92_sparse_cosine_pairs",
    "x93_label_propagation",
    "x94_hierarchy_rollup",
    "x95_peak_concurrency",
    # 5 backfill re-attestations
    "x39_pagerank_neardup",
    "x12_bm25_search",
    "x12g_bm25_indexed",
    "x41_curriculum_order",
    "x62_bm25_index_update",
]

_rest = [n for n in QUERIES if n not in _PRIORITY]
_ordered = [n for n in _PRIORITY if n in QUERIES] + _rest
_requeries = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_requeries)

__all__ = ["QUERIES", "Query", "query", "oracle_map", "query_map"]
