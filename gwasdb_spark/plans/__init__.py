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
# round. Round-10 window (r9 verdict #1): new round-10 registrations first
# (their only chance at a first adjudication), then the r9 window's named
# tail past seat 50 (u02…x14b — the offset-50 pre-flight queue, already
# recorded 50/50 green), then r03-latest backfills oldest-first (query age =
# newest CORRECTNESS_r0N row; after the r9 window no row predates r03), then
# r04-latest rows keep the order deterministic past seat 50 and head the
# round-11 queue. mm03 re-seats with the round-10 unstubbed BMP decode and
# g07 with its new recursive-CTE oracle — both convert a structural
# no-oracle row. File order within modules is unchanged; only the registry's
# iteration order is rebuilt here.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # --- round-10 window ---
    # New round-10 registrations (first adjudication beats any backfill
    # re-attestation); later round-10 additions are inserted here and
    # displace trailing backfills.
    "m04_acid_pruned_dml",
    "m05_acid_cluster",
    "m06_acid_bloom_skipping",
    "m07_acid_check_constraints",
    "m08_acid_schema_evolution",
    "m09_acid_zorder",
    "x157_ann_index_delete",
    "x158_acid_changefeed",
    "g20_ld_prune",
    "x160_lsh_band_tuning",
    "w14_session_windows",
    "w15_range_frame_revenue",
    "e16_funnel_dropoff",
    "x161_exact_substring_spans",
    "x162_countmin_heavy_hitters",
    "st19_late_data_watermark",
    "x163_bm25_index_delete",
    "j12_scd2_pit_join",
    "g21_ldsc_slope",
    "x164_token_budget_select",
    "u06_sql_scalar_udf",
    "mm11_pcm_frame_energy",
    "x165_kneser_ney_bigram",
    "w16_v_pattern_detect",
    "e17_markov_absorption",
    "st20_stream_acid_sink",
    "m10_cdc_replicate",
    "mm12_scene_changes",
    "x167_dp_noisy_counts",
    "g22_coloc_score",
    "s28_dpp_partition_join",
    "x169_cuped_ab_readout",
    "m11_acid_restore",
    "x170_simhash_hamming_serve",
    "x140_bpe_learn",
    "x150_bpe_apply",
    "mm03_resize_thumbs",
    "g07_distance_clump",
    "x13_sketch_aggregates",
    # The r9 priority tail past seat 50 (the offset-50 queue the round-9
    # close pre-flighted 50/50 green)
    "u02_intersect",
    "u03_except",
    "w04_lag_delta",
    "w05_ntile_rank",
    "x05g_filtered_topk",
    "x12f_bm25_proximity",
    "x14_asof_join",
    "x14b_asof_forward",
    # r03-latest backfills (no driver row since r03), oldest debt first
    "a06_regression_trend",
    "c02_training_mix",
    "j09_full_outer",
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
    # r04-latest rows: deterministic order past seat 50; bench headliners
    # and rewritten paths first — these head the round-11 backfill queue.
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
]

_rest = [n for n in QUERIES if n not in _PRIORITY]
_ordered = [n for n in _PRIORITY if n in QUERIES] + _rest
_requeries = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_requeries)

__all__ = ["QUERIES", "Query", "query", "oracle_map", "query_map"]
