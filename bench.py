#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is fully executed (foreach-noop action — results are consumed,
not collected to the driver, mirroring a real sink). A warmup pass on
sf0.001 triggers JVM/codegen warm paths so measured numbers reflect steady
state.
"""

from __future__ import annotations

import json
import os
import sys
import time

# HEADLINE is a CURATED subset of the ~380-query registry (r12 verdict
# minor: make the exclusion policy explicit). Excluded on purpose:
# (1) micro-shapes whose wall time is session overhead, not engine work
#     (p01-p16 single-op projections/filters, f0x scalar functions,
#     a01-a03 trivial aggregates, s0x tiny scans) — each is an
#     ingredient of a benched composite query already;
# (2) most streaming rows (st04-st23): bounded-replay wall time is
#     dominated by per-micro-batch state-store commits — harness replay
#     overhead, not steady-state throughput (the inline st07/st08 notes
#     below record the measured variance that forced this);
# (3) near-duplicate plan shapes of a benched row (e.g. x12b/x12d/x12e
#     vs the benched x12/x12c/x12f BM25 family) — one representative
#     per physical shape keeps suite wall time inside one bench session
#     without losing a regression surface.
# Every EXCLUDED query still runs per-round through the driver's
# correctness gate and per-commit tests; exclusion is a timing-ledger
# decision only.
HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "p08_locus_window",
    "j08_export_view",
    "a04_pivot_wide",
    "w01_topk_per_group",
    "st01_hourly_rollup",
    "st02_sessionize",
    "st03_stream_hourly_rollup",
    "x01_dedup_exact",
    "x02_ngram_jaccard_pairs",
    "x03_minhash_lsh_pairs",
    "x05_ann_cosine_topk",
    "x05c_ann_topk_vectorized",
    "x06_text_stats",
    "x07_lang_id",
    "x08_fingerprint",
    "x10b_embedding_neardup_lsh",
    "x12_bm25_search",
    "x12c_bm25_phrase",
    "x14_asof_join",
    "e01_json_props",
    # st07 (stream-stream LEFT OUTER) is correctness-gated, not benched:
    # its bounded-replay wall time is dominated by per-micro-batch state
    # store commits (3 batches x 32 partitions), which measures harness
    # replay overhead, not steady-state join throughput.
    "x17_pack_chunks",
    "x19_contamination",
    "q04_order_priority",
    "x21_top_terms",
    "x23_scrub_boilerplate",
    "x24_reservoir_per_lang",
    "q07_nation_volume",
    "q09_product_profit",
    "q18_large_orders",
    "x25_repetition_signals",
    "x26_cap_vocabulary",
    "x12f_bm25_proximity",
    "x28_temperature_sample",
    "w04_lag_delta",
    "x29_dedup_keep_best",
    "x30_unigram_logprob",
    "x31_pii_scrub",
    "x05g_filtered_topk",
    "x32_hybrid_rrf",
    # st08 (sliding-window stream rate) is correctness-gated, not benched
    # (r4 decision): its bounded-replay wall time is dominated by
    # per-micro-batch state-store commits — the same harness-overhead
    # rationale as st07/st09/st13 — and measured 1.2-6 s run-to-run on
    # identical code, which is variance the suite total should not carry.
    "c02_training_mix",
    "x33_bpe_pair_counts",
    "a06_regression_trend",
    "x12g_bm25_indexed",
    "x35_conversion_funnel",
    "q13_customer_distribution",
    "q21_waiting_supplier",
    "x37_unicode_normalize",
    "x38_length_bucketing",
    "st10_stream_enrich",
    "x40_dup_ngram_coverage",
    "w06_trailing_ewma",
    "x41_curriculum_order",
    # marker-name probe: indexed serving path vs full-scan baseline — the
    # pair quantifies the name-sorted index's row-group-skipping win
    "g04_marker_probe_indexed",
    "g05_marker_probe_scan",
    "x39_pagerank_neardup",
    # round-4 surface
    "q11_important_stock",
    "q20_excess_stock_suppliers",
    "x12h_bm25_fielded",
    "a07_rollup_revenue",
    "sk02_bucketed_join",
    "x45_shingle_containment",
    "c03_gopher_gate",
    "x46_casefold_dedup",
    "x48_mlm_masking",
    "x44_incremental_dedup",
    "g06_zorder_box_probe",
    "g08_binned_lead_snp",
    "w08_range_frame_trailing",
    "f08_fuzzy_match_blocked",
    "x49_cluster_keep_best",
    "x50_chunk_overlap",
    "x51_pmi_collocations",
    "x53_embedding_dim_stats",
    "m02_scd2_upsert",
    "a10_cube_margins",
    "w07_group_quantiles",
    "w09_rank_variants",
    "e02_json_construct_parse",
    "f06_fuzzy_match",
    # round-4 late additions
    "x54_span_dedup",
    "x55_bigram_logprob",
    "x56_mutual_knn_graph",
    "a11_grouping_sets",
    "x57_skew_report",
    "x58_snapshot_diff",
    "x59_quality_classifier",
    "st14_stream_dedup_ingest",
    "c04_corpus_refinery",
    "x60_copurchase_lift",
    "x61_retention_cohorts",
    "x62_bm25_index_update",
    "x63_triangle_counts",
    "x64_event_debounce",
    "x65_semantic_dedup",
    "x66_mad_outliers",
    "x67_winsorize",
    "s24_schema_evolution",
    "g09_qq_binned",
    "mm06_binary_dedup",
    "x68_keyword_tfidf",
    "x69_rolling_distinct",
    "st15_session_durations",
    "x70_activity_streaks",
    "x71_cooccurrence_counts",
    "s25_gzip_csv_roundtrip",
    "g10_maf_spectrum",
    "g11_hwe_chisq",
    "x72_cumulative_uniques",
    "j11_nullsafe_join",
    "x73_langid_confusion",
    "w10_first_last_value",
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
    # round-6 additions
    "x96_dsir_importance",
    "x97_source_dup_profile",
    "x98_shingle_novelty",
    "g14_heterogeneity",
    "sk03_salted_skew_agg",
    "x99_leakage_safe_split",
    "e03_props_key_census",
    "x100_perplexity_buckets",
    "x101_int8_quant_audit",
    "x102_kmeans_cluster_profile",
    "x103_dup_similarity_histogram",
    "x104_filter_funnel",
    "e04_last_touch_attribution",
    "s27_orc_roundtrip",
    "g15_prs_score",
    "x105_source_overlap_matrix",
    "x106_score_quantile_normalize",
    "x107_matryoshka_audit",
    "x108_l_diversity",
    "x109_correlation_matrix",
    "e05_event_transitions",
    "mm07_binary_neardup_pairs",
    "x110_diversified_topk",
    # round-7 late additions
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
    "x124_ndcg_at_10",
    "x125_pr_threshold_sweep",
    "x126_adamic_adar",
    "x127_revenue_acf",
    "x128_benford_audit",
    "x129_kaplan_meier",
    "x130_eval_contamination",
    "x131_cusum_changepoint",
    "x132_ring_negatives",
    "e08_interevent_burstiness",
    "x133_tokenizer_fertility",
    "x134_good_turing",
    "x135_skyline_docs",
    "x136_ann_cell_serve",
    "e09_markov_stationary",
    "x137_conformal_coverage",
    "e10_ushape_attribution",
    "x138_length_controlled_quality",
    "e11_top_paths",
    "x139_rouge_overlap",
    "w11_rolling_median",
    "x140_bpe_learn",
    "x141_pca_top_component",
    "g17_manhattan_bins",
    "e12_cohort_ltv",
    "x150_bpe_apply",
    "x151_winnowing_fingerprints",
    "e13_dau_stickiness",
    "w12_yoy_revenue",
    "st17_stream_dau",
    "x152_sliced_auc",
    "g18_proxy_variant",
    "mm09_chunk_manifest",
    # round-9 additions
    "mm10_media_headers",
    "x153_ann_index_upsert",
    "x154_rag_chunking",
    "x155_temporal_holdout",
    "e14_new_vs_returning",
    "e15_variant_json_props",
    "g19_credible_sets",
    "x156_hard_negatives",
    "m03_acid_timetravel",
    "w13_ohlc_monthly",
    # round-10 additions
    "m04_acid_pruned_dml",
    "x158_acid_changefeed",
    "m05_acid_cluster",
    "m06_acid_bloom_skipping",
    "m07_acid_check_constraints",
    "m08_acid_schema_evolution",
    "x157_ann_index_delete",
    "g20_ld_prune",
    "x160_lsh_band_tuning",
    "w14_session_windows",
    "w15_range_frame_revenue",
    "e16_funnel_dropoff",
    "g07_distance_clump",
    "mm03_resize_thumbs",
    "x161_exact_substring_spans",
    "x162_countmin_heavy_hitters",
    "m09_acid_zorder",
    "x163_bm25_index_delete",
    "j12_scd2_pit_join",
    "g21_ldsc_slope",
    "x164_token_budget_select",
    "u06_sql_scalar_udf",
    "mm11_pcm_frame_energy",
    "x165_kneser_ney_bigram",
    "w16_v_pattern_detect",
    "e17_markov_absorption",
    "m10_cdc_replicate",
    "mm12_scene_changes",
    "x167_dp_noisy_counts",
    "g22_coloc_score",
    "s28_dpp_partition_join",
    "x169_cuped_ab_readout",
    "m11_acid_restore",
    "x170_simhash_hamming_serve",
    "m12_acid_column_mapping",
    "x171_neardup_index_update",
    "x172_neardup_index_delete",
    "c05_takedown_pipeline",
    "x173_incremental_ingest",
    "x174_ann_graph_topk",
    "x175_ann_spill_serve",
    "x176_ann_graph_maintain",
    "x178_ann_spill_graph_topk",
    "m13_acid_multi_table",
    # st22 (streamed upsert of a graph-carrying index) is correctness-
    # gated, not benched: ingest wall time is st18's micro-batch commit
    # overhead and its serve is x174's benched shape.
    # st19 (watermark late-data) is correctness-gated, not benched: its
    # bounded 3-micro-batch replay measures per-batch state-store commit
    # overhead, the st07/st08/st13/st18 exclusion rationale.
    # st18 (streaming ANN ingest) is correctness-gated, not benched:
    # bounded-replay wall time is micro-batch commit overhead (the
    # st07/st08/st13 rationale), and its stage makes re-runs no-ops.
    # st13 (trending over the live rollup) is correctness-gated, not
    # benched: like st07/st09 its wall time is the micro-batch replay +
    # per-batch dynamic-partition-overwrite commits of the upsert
    # harness, not steady-state cost.
]


def _consume(df) -> None:
    """Execute the full plan without driver-side materialization.

    A `count()` would let Catalyst prune every unused projection — a
    projection-only query (x06/x07/x08, the carry columns of x14) would
    never compute its expressions. The noop sink consumes every output
    column like a real write, with zero serialization to the driver."""
    if df.isStreaming is False:
        df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from gwasdb_spark.plans import QUERIES
    from gwasdb_spark.session import get_spark

    spark = get_spark("gwasdb_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # Warmup on the smallest SF: JIT, codegen cache, parquet footer caches.
    warm_dir = "/root/testdata/sf0.001"
    for name in HEADLINE:
        if name in QUERIES and os.path.isdir(warm_dir):
            try:
                _consume(QUERIES[name].fn(spark, warm_dir))
            except Exception:
                pass

    # Load sentinel (r7 verdict #3): a FIXED code-independent job timed
    # with the same min-of-3 estimator. Identical code produced maps
    # ~17% apart in r7 purely from machine-wide load at round close;
    # the sentinel pins what the machine was doing during THIS run, so
    # cross-round diffs can separate plan regressions from load. The
    # job is pure JVM compute over range() — no parquet, no python, no
    # repo code — so its cost can only move with the machine.
    # r11 verdict #4: ONE sentinel shape made raw-vs-adjusted medians
    # disagree by 1.4x purely on sentinel movement — a pure-compute job
    # over-responds to CPU contention and under-responds to shuffle/IO
    # pressure, so normalizing EVERY query by it manufactures phantom
    # regressions in whichever shapes the machine-load delta didn't
    # touch. The basket times one fixed job per plan shape (pure scan
    # compute, one shuffle exchange, one partitioned window sort) and
    # the gate normalizes by the MEDIAN of the per-shape ratios —
    # a load story all three shapes agree on is real; one shape moving
    # alone no longer rescales the whole suite.
    # r13 verdict #4 (wrong): the 3-shape basket has no WRITE/IO shape,
    # and the r13 session's drift hit write-heavy rows while all three
    # compute shapes read equal-or-faster — the basket under-captured an
    # IO slowdown. The `write` sentinel times a small fixed parquet
    # write+cleanup (same min-of-3 estimator); it is ADDED to the
    # basket (existing shapes and the back-compat scalar unchanged).
    import shutil
    import tempfile

    def _write_sentinel() -> None:
        out = tempfile.mkdtemp(prefix="bench_write_sentinel_")
        try:
            (
                spark.range(0, 4_000_000, 1, 32)
                .selectExpr(
                    "id", "id * 3 AS a", "CAST(id % 97 AS STRING) AS s"
                )
                .write.mode("overwrite").parquet(out)
            )
        finally:
            shutil.rmtree(out, ignore_errors=True)

    def _basket_jobs() -> dict:
        return {
            "scan": lambda: (
                spark.range(0, 400_000_000, 1, 32)
                .selectExpr("sum(id * 3 + (id % 7)) AS s")
                .write.format("noop").mode("overwrite").save()
            ),
            "write": _write_sentinel,
            "shuffle": lambda: (
                spark.range(0, 40_000_000, 1, 32)
                .groupBy((F.col("id") % 65536).alias("k"))
                .agg(F.sum("id").alias("s"), F.count(F.lit(1)).alias("n"))
                .write.format("noop").mode("overwrite").save()
            ),
            "window": lambda: (
                spark.range(0, 10_000_000, 1, 32)
                .select(
                    "id",
                    F.sum("id").over(
                        W.partitionBy(F.col("id") % 4096).orderBy("id")
                    ).alias("r"),
                )
                .write.format("noop").mode("overwrite").save()
            ),
        }

    def _time_job(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    sentinels: dict[str, float] = {}
    for shape, job in _basket_jobs().items():
        _time_job(job)  # warm
        sentinels[shape] = round(min(_time_job(job) for _ in range(3)), 3)
    sentinel = sentinels["scan"]  # back-compat scalar: same job as r8-r11

    # min-of-3 per query (r5 verdict #6): scheduler/GC/FS noise showed
    # 0.8 s run-to-run swings on identical code; min over 3 runs is the
    # stable estimator of the plan's actual cost. The rule is recorded
    # in the payload so cross-round diffs compare like with like.
    runs_per_query = int(os.environ.get("SPARK_GRAFT_RUNS", "3"))
    # Targeted deepening (r11 verdict #3): SPARK_GRAFT_ONLY=a,b,c times
    # just those headline rows (SPARK_GRAFT_RUNS deepens the min) — the
    # resulting partial map min-merges into the round's full map via
    # scripts/bench_merge.py, whose per-query `depth` bookkeeping keeps
    # the deeper rows honestly labeled.
    only = os.environ.get("SPARK_GRAFT_ONLY")
    headline = HEADLINE
    if only:
        wanted = {n.strip() for n in only.split(",") if n.strip()}
        headline = [n for n in HEADLINE if n in wanted]
    timings: dict[str, float | None] = {}
    errors: dict[str, str] = {}
    total = 0.0
    for name in headline:
        if name not in QUERIES:
            continue
        # Per-query isolation: one broken query costs its row (null timing),
        # never the whole file (the r02 bench died on the first query and
        # recorded nothing).
        try:
            if name == "x62_bm25_index_update":
                # Phase-split timing (r5 verdict #3): build / update /
                # query recorded separately so a serve-path regression
                # cannot hide inside index-build noise. The headline row
                # is min over RUNS of each run's end-to-end total — the
                # same estimator as every other row (comparable with
                # r1-r5); summing per-phase minima across different runs
                # would record a total no single run achieved.
                from gwasdb_spark.plans.extensions import x62_phases

                best_ph: dict[str, float | None] = {
                    "build": None, "update": None, "query": None
                }
                best_total = None
                for _ in range(runs_per_query):
                    build, update, query_fn = x62_phases(spark, sf_dir)
                    run_total = 0.0
                    for ph, fn in (
                        ("build", build),
                        ("update", update),
                        ("query", lambda: _consume(query_fn())),
                    ):
                        t0 = time.perf_counter()
                        fn()
                        dt = time.perf_counter() - t0
                        run_total += dt
                        prev = best_ph[ph]
                        best_ph[ph] = dt if prev is None else min(prev, dt)
                    best_total = (
                        run_total if best_total is None
                        else min(best_total, run_total)
                    )
                for ph, val in best_ph.items():
                    timings[f"x62_bm25_index_update/{ph}"] = round(val, 3)
                timings[name] = round(best_total, 3)
                total += timings[name]
                continue
            best = None
            for _ in range(runs_per_query):
                # Reset a staged AcidTable OUTSIDE the timed span: warm,
                # every DML guard is a read-only no-op and the row would
                # measure only snapshot aggregates (ADVICE r9). Cold,
                # each run times the real create + DML commits +
                # time-travel reads. Explicit registry lookup — the old
                # startswith("m0") prefix silently excluded m10/m11, so
                # m10's row measured warm no-ops (VERDICT r10 §wrong 2).
                from gwasdb_spark.plans.mining_ops import STAGED_RESETS

                reset = STAGED_RESETS.get(name)
                if reset is not None:
                    reset(sf_dir)
                t0 = time.perf_counter()
                _consume(QUERIES[name].fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)
            total += timings[name]
        except Exception as exc:  # noqa: BLE001 — record and keep benching
            timings[name] = None
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    payload: dict = {
        "metric": "headline-suite wall time (local[%s])"
        % os.environ.get("SPARK_GRAFT_CPUS", "*"),
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "aggregation": f"min-of-{runs_per_query}",
        # machine-readable estimator depth — bench_merge.py sums these
        # across sessions so round_close.py can compare maps at equal
        # depth (a deeper min is optimistically lower; r8 verdict #4)
        "runs_per_query": runs_per_query,
        "sentinel_sec": sentinel,
        # per-shape load basket (r11 verdict #4); cross-round gates use
        # the MEDIAN of per-shape ratios when both maps carry this key,
        # falling back to sentinel_sec for r8-r11 anchors
        "sentinels": sentinels,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    # The driver's BENCH_r{N}.json keeps only the tail of stdout, which
    # loses most per-query timings; persist the complete map so
    # cross-round regression diffs stay computable (committed per round
    # as bench_full_r{N}.json).
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full_latest.json"
    )
    with open(full_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
