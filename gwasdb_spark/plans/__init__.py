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

# ---------------------------------------------------------------------------
# Registration-order priority.
#
# The driver's correctness gate records the FIRST 50 registered queries per
# round. Round 1 adjudicated the reference-surface block (50/50 green);
# round 3 re-proved the r02-regressed subset plus the never-checked
# TPC-H/set-op/corpus-quality block (50/50 green). This round's window
# seats (a) the 17 round-3 registrations that have never held a driver row,
# (b) the four formerly-no_oracle queries flipped to hash-checkable this
# round (ANN trio in flat-regime recall-1 configuration + x11's
# recursive-CTE oracle) — hash-green rows upgrade their r03 rows-only
# evidence, then (c) a backfill rotation of the SURVEY §2 reference-surface
# core so it is re-attested on current testdata (green twice: r01 + r04).
# With this window every query registered BEFORE round 4 has a driver row
# somewhere in r01∪r03∪r04. The ~52 round-4 additions (g04-g08, q11/q20,
# x12h, a07-a11, w07-w09, m02, sk02, x43-x51, x53-x66, c03/c04, mm05,
# st11-st14, s22/s23, e02, f06-f08) hold in-repo oracle green rows and
# are round 5's window seats — more than one 50-seat window, so round 5
# should seat the oldest registrations first and rotate the remainder
# into round 6. File order within modules is unchanged; only the
# registry's iteration order is rebuilt here.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # (a) registered in round 3 after the window filled — never checked
    "m01_dml_roundtrip",
    "q13_customer_distribution",
    "q16_supplier_relation",
    "q21_waiting_supplier",
    "w06_trailing_ewma",
    "x12g_bm25_indexed",
    "x35_conversion_funnel",
    "x36_split_drift",
    "x37_unicode_normalize",
    "x38_length_bucketing",
    "x39_pagerank_neardup",
    "x40_dup_ngram_coverage",
    "x41_curriculum_order",
    "s21_orc_roundtrip",
    "st10_stream_enrich",
    "u04_geomean_udaf",
    "u05_sentence_udtf",
    # (b) flipped from no_oracle to hash-checkable this round
    "x05b_ann_lsh_topk",
    "x05d_ann_ivf_topk",
    "x05e_ann_pq_topk",
    "x11_dedup_clusters",
    "x10b_embedding_neardup_lsh",
    # (c) §2 reference-surface backfill rotation (all green in r01)
    "s01_full_scan",
    "s03_csv_stage_glob_read",
    "s05_sql_text_entry",
    "p01_projection",
    "p04_derived_neglog10",
    "p06_filter_between",
    "p08_locus_window",
    "p11_in_list",
    "p13_null_filter",
    "p14_threshold_qc_split",
    "p15_conditional_expr",
    "p16_pull_distinct",
    "j01_left_join_multikey",
    "j02_right_join",
    "j03_join_renamed_keys",
    "j04_broadcast_dims",
    "j05_cross_join",
    "j06_anti_join",
    "j07_semi_join",
    "j08_export_view",
    "a01_count_global",
    "a02_groupby_count",
    "a03_distinct",
    "a05_manual_pivot_join",
    "w01_topk_per_group",
    "w02_running_total",
    "w03_auto_increment",
    "o01_topk_orders",
]

_rest = [n for n in QUERIES if n not in _PRIORITY]
_ordered = [n for n in _PRIORITY if n in QUERIES] + _rest
_requeries = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_requeries)

__all__ = ["QUERIES", "Query", "query", "oracle_map", "query_map"]
