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
# round. Round-11 window (r10 verdict #1): queries whose oracle or
# semantics CHANGED this round seat first — x03's brand-new SQL-replay
# oracle and x04's r10-graduated oracle get their first driver
# adjudications; m10 (apply_changes sequencing), g21/g22/x169
# (decimal(38,0) moments), and x163 (crash-safe compaction) re-attest
# their changed code paths. New round-11 registrations are inserted next
# as they land (their only chance at a first adjudication). Then
# backfills oldest-first: the full r03-latest set (no driver row in 7
# rounds), then r04-latest rows to fill seat 50 and keep the order
# deterministic past it (heading the round-12 queue). File order within
# modules is unchanged; only the registry's iteration order is rebuilt.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # --- round-11 window: changed oracles / changed semantics first ---
    "x03_minhash_lsh_pairs",
    "x04_simhash_pairs",
    "m10_cdc_replicate",
    "g21_ldsc_slope",
    "g22_coloc_score",
    "x169_cuped_ab_readout",
    "x163_bm25_index_delete",
    # --- new round-11 registrations (inserted here as they land) ---
    "x140_bpe_learn",   # graduated r11: recursive-CTE learn replay
    "x150_bpe_apply",   # graduated r11: learn->apply round trip
    "m12_acid_column_mapping",  # new r11: RENAME/DROP COLUMN surface
    "x171_neardup_index_update",  # new r11: incremental near-dup store
    "st21_stream_cdc_sequenced",  # new r11: streaming CDC + SEQUENCE BY
    "x172_neardup_index_delete",  # new r11: band-store takedown deletes
    # --- r03-latest backfills (no driver row since r03) ---
    "q08_market_share",
    "q10_returned_items",
    "q12_late_priority",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q19_bracket_revenue",
    "q22_idle_customers",
    "s20_jsonl_roundtrip",
    "x14c_asof_nearest",
    "x15_value_outliers",
    "x20_range_join",
    "x25_repetition_signals",
    "x26_cap_vocabulary",
    "x27_length_histogram",
    "x28_temperature_sample",
    "x29_dedup_keep_best",
    "x30_unigram_logprob",
    "x31_pii_scrub",
    "x32_hybrid_rrf",
    "x33_bpe_pair_counts",
    # --- r04-latest backfills, bench headliners first ---
    "p08_locus_window",
    "j08_export_view",
    "a05_manual_pivot_join",
    "x11_dedup_clusters",
    "x05b_ann_lsh_topk",
    "x05d_ann_ivf_topk",
    "x05e_ann_pq_topk",
    "x10b_embedding_neardup_lsh",
    "w01_topk_per_group",
    "m01_dml_roundtrip",
    "s01_full_scan",
    "a01_count_global",
    "a02_groupby_count",
    "a03_distinct",
    "j01_left_join_multikey",
    "j02_right_join",
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
]

_rest = [n for n in QUERIES if n not in _PRIORITY]
_ordered = [n for n in _PRIORITY if n in QUERIES] + _rest
_requeries = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_requeries)

__all__ = ["QUERIES", "Query", "query", "oracle_map", "query_map"]
