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

# ---------------------------------------------------------------------------
# Registration-order priority.
#
# The driver's correctness gate records the FIRST 50 registered queries per
# round. After round 6 every query registered through round 5 holds a green
# driver row (r01∪…∪r06). Round 7 seats the 8 round-6 additions (their
# first adjudication) followed by 42 backfill re-attestations chosen as
# the STALEST rows on the driver's books: the 19 queries whose only row is
# r01 and the 23 oldest r02-latest rows (registration order) — several of
# which (x03/x05c/x12b-e) sit on code paths rewritten since (shared
# shingle exchange, _rank_topk, vectorized ANN kernels), so a fresh row is
# attestation that the rewrites kept them green. All 50 pre-flighted
# hash-green at sf0.01 this round. File order within modules is unchanged;
# only the registry's iteration order is rebuilt here.
#
# Round-8 seats: the 11 round-7 additions (s27, e04, g15, x101-x108 —
# every one already oracle-hash-green at sf0.001 + sf0.01) followed by
# 39 backfill re-attestations, preferring the remaining r2-latest rows
# (x17-x24 block onward) then the oldest r3 rows.
# ---------------------------------------------------------------------------
_PRIORITY = [
    # 8 round-6 additions — never adjudicated
    "x96_dsir_importance",
    "x97_source_dup_profile",
    "x98_shingle_novelty",
    "g14_heterogeneity",
    "sk03_salted_skew_agg",
    "x99_leakage_safe_split",
    "e03_props_key_census",
    "x100_perplexity_buckets",
    # 19 backfill: last driver row is r01
    "s02_schema_only_head0",
    "p02_projection_rename",
    "p03_drop_cols",
    "p05_filter_eq",
    "p07_filter_date_range",
    "p12_semi_in_subquery",
    "o02_multikey_sort",
    "u01_union_all",
    "f01_id_parse_regex",
    "f02_maf_genotype",
    "f03_pad_concat",
    "f04_date_parts",
    "f05_clean_names",
    "g01_count_reconciliation",
    "g02_chr_distribution",
    "g03_fk_orphan_audit",
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    # 23 backfill: oldest r02-latest rows (registration order)
    "q06_forecast_revenue",
    "q02s_min_cost_supplier",
    "q04_order_priority",
    "x01_dedup_exact",
    "x02_ngram_jaccard_pairs",
    "x03_minhash_lsh_pairs",
    "x04_simhash_pairs",
    "x05_ann_cosine_topk",
    "x05c_ann_topk_vectorized",
    "x10_embedding_neardup",
    "x09_embedding_stats",
    "x06_text_stats",
    "x07_lang_id",
    "x08_fingerprint",
    "st05_stream_dedup",
    "mm01_binary_meta",
    "mm03_resize_thumbs",
    "mm04_frame_sample",
    "c01_corpus_clean",
    "sk01_salted_join",
    "x12b_bm25_and",
    "x12c_bm25_phrase",
    "x16_hash_split",
]

_rest = [n for n in QUERIES if n not in _PRIORITY]
_ordered = [n for n in _PRIORITY if n in QUERIES] + _rest
_requeries = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_requeries)

__all__ = ["QUERIES", "Query", "query", "oracle_map", "query_map"]
