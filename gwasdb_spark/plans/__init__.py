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
# round. Round-13 window: changed/new rows seat first — the three new
# registrations (st22 streamed graph-ANN, x178 spill x graph, m13
# multi-table atomic commit, st23 streamed QC split through it), the
# graph-ANN rows whose build/maintenance
# code changed this round (x174/x175/x176 — engine-enforced sidecar
# refresh + the RP-forest approx build path; x173's stage-tag refactor;
# st18 shares the upsert path), and EVERY AcidTable-backed row, because
# table_log.py's latest_version()/read() visibility semantics changed
# for the multi-table-txn protocol (m03-m12, x158, st20/st21, c05).
# Then the deterministic backfill queue continues exactly where round
# 12's seating left off (seats 51+ of the r12 ordering), so every
# registered query keeps cycling through driver adjudication. File order
# within modules is unchanged; only the registry's iteration order is
# rebuilt.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # --- round-13 window: new registrations + changed oracles/code ---
    "st22_stream_graph_ann",
    "x178_ann_spill_graph_topk",
    "x179_ann_filtered_graph_topk",
    "m13_acid_multi_table",
    "m14_acid_txn_snapshot",
    "st23_stream_multi_table_sink",
    "x176_ann_graph_maintain",
    "x174_ann_graph_topk",
    "x175_ann_spill_serve",
    "x173_incremental_ingest",
    "st18_stream_ann_ingest",
    "c05_takedown_pipeline",
    "m03_acid_timetravel",
    "m04_acid_pruned_dml",
    "m05_acid_cluster",
    "m06_acid_bloom_skipping",
    "m07_acid_check_constraints",
    "m08_acid_schema_evolution",
    "m09_acid_zorder",
    "m10_cdc_replicate",
    "m11_acid_restore",
    "m12_acid_column_mapping",
    "x158_acid_changefeed",
    "st20_stream_acid_sink",
    "st21_stream_cdc_sequenced",
    # --- backfills: the head of round 12's post-window queue ---
    "s01_full_scan",
    "s20_jsonl_roundtrip",
    "p08_locus_window",
    "j01_left_join_multikey",
    "j02_right_join",
    "j08_export_view",
    "a01_count_global",
    "a02_groupby_count",
    "a03_distinct",
    "a05_manual_pivot_join",
    "w01_topk_per_group",
    "w04_lag_delta",
    "w05_ntile_rank",
    "w09_rank_variants",
    "w07_group_quantiles",
    "a07_rollup_revenue",
    "o02_multikey_sort",
    "u01_union_all",
    "f01_id_parse_regex",
    "f02_maf_genotype",
    "f03_pad_concat",
    "f04_date_parts",
    "f05_clean_names",
    "f06_fuzzy_match",
    "f08_fuzzy_match_blocked",
    "f07_extract_all_numbers",
    "g01_count_reconciliation",
]

_rest = [n for n in QUERIES if n not in _PRIORITY]
_ordered = [n for n in _PRIORITY if n in QUERIES] + _rest
_requeries = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_requeries)

__all__ = ["QUERIES", "Query", "query", "oracle_map", "query_map"]
