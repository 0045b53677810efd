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

# ---------------------------------------------------------------------------
# Registration-order priority.
#
# The driver's correctness gate records the FIRST 50 registered queries per
# round. After round 6 every query registered through round 5 holds a green
# driver row (r01∪…∪r06). The round-7 session added 51 new registrations
# (8 early-round: x96-x100/sk03/e03/g14; 43 post-close: s27, e04-e08,
# g15/g16, mm07/mm08, x101-x135, no x113/x116) — a first adjudication is
# worth more than a re-attestation of an already-green row, so 50 of the
# 51 take every seat (x134_good_turing, the 51st, heads round 8). All 50
# pre-flighted hash-green at sf0.01 this round. File order within
# modules is unchanged; only the registry's iteration order is rebuilt
# here.
#
# Round-8 seats: x134_good_turing, x136_ann_cell_serve,
# st16_stream_contamination, e09_markov_stationary,
# x137_conformal_coverage, e10_ushape_attribution, and
# x138_length_controlled_quality first, then
# the remaining 19 r01-only backfills (s02, p02, p03, p05, p07, p12,
# o02, u01, f01-f05, g01-g03, q01, q03, q05) then the r02-latest rows
# in registration order (q06 onward —
# several sit on since-rewritten code paths: shared shingle exchange,
# _rank_topk, vectorized ANN kernels — so a fresh row attests the
# rewrites kept them green).
# ---------------------------------------------------------------------------
_PRIORITY = [
    # 38 round-7 additions — never adjudicated
    "x96_dsir_importance",
    "x97_source_dup_profile",
    "x98_shingle_novelty",
    "g14_heterogeneity",
    "sk03_salted_skew_agg",
    "x99_leakage_safe_split",
    "e03_props_key_census",
    "x100_perplexity_buckets",
    "s27_orc_roundtrip",
    "g15_prs_score",
    "x101_int8_quant_audit",
    "x102_kmeans_cluster_profile",
    "x103_dup_similarity_histogram",
    "e04_last_touch_attribution",
    "x105_source_overlap_matrix",
    "x107_matryoshka_audit",
    "e05_event_transitions",
    "mm07_binary_neardup_pairs",
    "x110_diversified_topk",
    "x104_filter_funnel",
    "x106_score_quantile_normalize",
    "x108_l_diversity",
    "x109_correlation_matrix",
    "x111_bloom_prefilter_join",
    "x112_stratified_split",
    "mm08_chunk_dedup",
    "e06_rfm_segments",
    "g16_case_control_or",
    "x114_rrf_fusion",
    "x115_kmv_distinct_sketch",
    "x117_mutual_information",
    "x118_weighted_median",
    "x119_classifier_auc",
    "x120_calibration_report",
    "x121_bfs_distances",
    "x122_lorenz_gini",
    "x123_bootstrap_ci",
    "e07_transition_entropy",
    # 11 late round-7 additions (metrics_ops + curation_ops) — never
    # adjudicated
    "x124_ndcg_at_10",
    "x125_pr_threshold_sweep",
    "x126_adamic_adar",
    "x127_revenue_acf",
    "x128_benford_audit",
    "x129_kaplan_meier",
    "x130_eval_contamination",
    "x131_cusum_changepoint",
    "x132_ring_negatives",
    "x133_tokenizer_fertility",
    "e08_interevent_burstiness",
    # the skyline operator takes the 50th seat (novel distributed
    # operator — a driver row is worth more than a backfill
    # re-attestation); x134_good_turing heads the round-8 seats, then
    # the twelve r01-only rows (s02, p02, p03, p05, p07, p12, o02,
    # u01, f01-f04).
    "x135_skyline_docs",
]

_rest = [n for n in QUERIES if n not in _PRIORITY]
_ordered = [n for n in _PRIORITY if n in QUERIES] + _rest
_requeries = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_requeries)

__all__ = ["QUERIES", "Query", "query", "oracle_map", "query_map"]
