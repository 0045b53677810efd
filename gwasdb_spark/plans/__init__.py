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
from gwasdb_spark.plans import pipeline_ops as _pipeline_ops  # noqa: F401
from gwasdb_spark.plans import eval_ops as _eval_ops  # noqa: F401
from gwasdb_spark.plans import metrics_ops as _metrics_ops  # noqa: F401
from gwasdb_spark.plans import curation_ops as _curation_ops  # noqa: F401
from gwasdb_spark.plans import mining_ops as _mining_ops  # noqa: F401

# ---------------------------------------------------------------------------
# Registration-order priority.
#
# The driver's correctness gate records the FIRST 50 registered queries per
# round. Round-12 window (r11 verdict #1): changed/new rows seat first —
# x13's brand-new bound-check oracle (graduated this round: the last
# no-oracle query), the c05 takedown and x173 ingest composites, the
# x174/x175 graph-ANN spike rows, x171 (its maintenance append is now
# real code, not just a docstring), x172 (shares the probe helper x171's
# change touched), and m12 (rename_column's collision guard changed).
# Then the deterministic backfill queue continues exactly where round
# 11's seating left off (seats 51+ of the r11 ordering), so every
# registered query keeps cycling through driver adjudication. File order
# within modules is unchanged; only the registry's iteration order is
# rebuilt.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # --- round-12 window: new registrations + changed oracles/code ---
    "x13_sketch_aggregates",
    "c05_takedown_pipeline",
    "x173_incremental_ingest",
    "x174_ann_graph_topk",
    "x175_ann_spill_serve",
    "x176_ann_graph_maintain",
    "x171_neardup_index_update",
    "x172_neardup_index_delete",
    "m12_acid_column_mapping",
    # --- backfills: the head of round 11's post-window queue ---
    "j03_join_renamed_keys",
    "j04_broadcast_dims",
    "j05_cross_join",
    "j06_anti_join",
    "j07_semi_join",
    "o01_topk_orders",
    "p01_projection",
    "p04_derived_neglog10",
    "p06_filter_between",
    "p11_in_list",
    "p13_null_filter",
    "p14_threshold_qc_split",
    "p15_conditional_expr",
    "p16_pull_distinct",
    "q13_customer_distribution",
    "q16_supplier_relation",
    "q21_waiting_supplier",
    "s03_csv_stage_glob_read",
    "s05_sql_text_entry",
    "s21_orc_roundtrip",
    "st10_stream_enrich",
    "u04_geomean_udaf",
    "u05_sentence_udtf",
    "w02_running_total",
    "w03_auto_increment",
    "w06_trailing_ewma",
    "s02_schema_only_head0",
    "p02_projection_rename",
    "p03_drop_cols",
    "p05_filter_eq",
    "p07_filter_date_range",
    "p09_regex_filter",
    "p10_regex_negate",
    "p12_semi_in_subquery",
    "a04_pivot_wide",
    "w08_range_frame_trailing",
    "a08_unpivot_long",
    "a09_listagg",
    "a10_cube_margins",
    "a11_grouping_sets",
    "a06_regression_trend",
]

_rest = [n for n in QUERIES if n not in _PRIORITY]
_ordered = [n for n in _PRIORITY if n in QUERIES] + _rest
_requeries = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_requeries)

__all__ = ["QUERIES", "Query", "query", "oracle_map", "query_map"]
