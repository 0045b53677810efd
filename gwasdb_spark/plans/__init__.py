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
# round. Round-9 window (r8 verdict #1): new round-9 registrations first
# (their only chance at a first adjudication), then the 23 r02-latest rows
# the verdict named (the r8 window's tail + c01/mm01/mm03/mm04/q02s/q04/
# q06/sk01) — after those, no registered query's newest driver row predates
# r03 — then r03-latest backfills fill the remaining seats, bench headliners
# and rewritten code paths first. File order within modules is unchanged;
# only the registry's iteration order is rebuilt here.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # --- round-9 window (seated per the r8 verdict #1) ---
    # New round-9 registrations (first adjudication beats any backfill
    # re-attestation); later round-9 additions are inserted here and
    # displace the trailing r03 backfills.
    "mm10_media_headers",
    "x153_ann_index_upsert",
    "x154_rag_chunking",
    "x155_temporal_holdout",
    "e14_new_vs_returning",
    "e15_variant_json_props",
    "st18_stream_ann_ingest",
    "g19_credible_sets",
    "x156_hard_negatives",
    "m03_acid_timetravel",
    "w13_ohlc_monthly",
    # The 15 r02-latest rows that missed the r8 cut (the r8 window's
    # own tail, several on rewritten paths: _rank_topk BM25 family, the
    # c041e29 contamination gram-join, x06-x08 scan projections)
    "x12c_bm25_phrase",
    "x12d_bm25_boosted",
    "x12e_bm25_multiphrase",
    "x19_contamination",
    "x17_pack_chunks",
    "x21_top_terms",
    "x22_vocabulary",
    "x23_scrub_boilerplate",
    "x24_reservoir_per_lang",
    "x06_text_stats",
    "x07_lang_id",
    "x08_fingerprint",
    "x16_hash_split",
    "x18_quota_per_lang",
    "st05_stream_dedup",
    # The 8 r02-latest rows the verdict named alongside them — after
    # these 23, no registered query's newest driver row predates r03
    "c01_corpus_clean",
    "mm01_binary_meta",
    "mm03_resize_thumbs",
    "mm04_frame_sample",
    "q02s_min_cost_supplier",
    "q04_order_priority",
    "q06_forecast_revenue",
    "sk01_salted_join",
    # r03-latest backfills fill the remaining seats: bench headliners
    # and rewritten paths first (a04 sparse-pivot, e01/mm02 projection
    # work, the streaming family, the asof composition). The window is
    # 50 seats — names past 50 keep the ordering deterministic and head
    # the round-10 backfill queue.
    "a04_pivot_wide",
    "e01_json_props",
    "mm02_fake_features",
    "p09_regex_filter",
    "p10_regex_negate",
    "q07_nation_volume",
    "q09_product_profit",
    "q18_large_orders",
    "st01_hourly_rollup",
    "st02_sessionize",
    "st03_stream_hourly_rollup",
    "st04_stream_sessionize_stateful",
    "st06_stream_stream_join",
    "st07_stream_left_outer_join",
    "st08_stream_sliding_rate",
    "st09_incremental_rollup_serve",
    "u02_intersect",
    "u03_except",
    "w04_lag_delta",
    "w05_ntile_rank",
    "x05g_filtered_topk",
    "x12f_bm25_proximity",
    "x13_sketch_aggregates",
    "x14_asof_join",
    "x14b_asof_forward",
]

_rest = [n for n in QUERIES if n not in _PRIORITY]
_ordered = [n for n in _PRIORITY if n in QUERIES] + _rest
_requeries = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_requeries)

__all__ = ["QUERIES", "Query", "query", "oracle_map", "query_map"]
