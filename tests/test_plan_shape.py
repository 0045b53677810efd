"""Physical-plan regression guards: the scale properties the engine's
design depends on must be visible in the plan, not just implied — a silent
fallback from broadcast to sort-merge, or a filter that stops reaching the
parquet scan, is a perf regression even while results stay correct."""

from __future__ import annotations

from gwasdb_spark.plans import QUERIES

from tests.conftest import SF_DIR, slow_gate


def _plan(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_locus_window_broadcasts_and_pushes_down(spark):
    plan = _plan(spark, "p08_locus_window")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "PushedFilters: [" in plan


def test_export_view_study_side_broadcasts(spark):
    plan = _plan(spark, "j08_export_view")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q06_filters_reach_scan(spark):
    plan = _plan(spark, "q06_forecast_revenue")
    # all three predicates must appear as pushed parquet filters
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("l_shipdate" in ln for ln in pushed)
    assert any("l_discount" in ln for ln in pushed)
    assert any("l_quantity" in ln for ln in pushed)


def test_projection_prunes_scan_columns(spark):
    plan = _plan(spark, "p01_projection")
    # ReadSchema should carry exactly the 3 projected columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and "c_custkey" in read[0] and "c_name" in read[0]
    assert "c_acctbal" not in read[0] and "c_comment" not in read[0]


def _optimized(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q05_hints_only_fixed_size_dims(spark):
    """Broadcast hints must appear ONLY on nation/region (genuinely fixed
    size). customer/supplier grow with scale factor — a forced broadcast on
    them is a driver OOM at 100x SF, so their strategy is left to AQE."""
    plan = _optimized(spark, "q05_local_supplier_volume")
    hints = [ln for ln in plan.splitlines() if "strategy=broadcast" in ln]
    assert len(hints) == 2, hints  # nation, region — and nothing else
    assert any("n_nationkey" in ln for ln in hints)
    assert any("r_regionkey" in ln for ln in hints)
    assert not any("c_custkey" in ln or "s_suppkey" in ln for ln in hints)


def test_q03_no_forced_broadcast(spark):
    """q03's customer side is SF-proportional: no broadcast hint anywhere;
    at test scale AQE still picks broadcast on its own (plan quality), but
    the *logical* plan must not force it."""
    assert "strategy=broadcast" not in _optimized(spark, "q03_shipping_priority")
    # AQE/threshold still arrives at a broadcast join at this SF
    assert "BroadcastHashJoin" in _plan(spark, "q03_shipping_priority")


def test_dedup_shuffles_hashes_not_text(spark):
    plan = _plan(spark, "x02_ngram_jaccard_pairs")
    # the pair-generation aggregate must key on the 8-byte xxhash64, and no
    # self-join of the exploded shingle table may appear
    assert "xxhash64" in plan
    assert "SortMergeJoin" not in plan


def test_ngram_jaccard_reuses_shingle_exchange(spark):
    """The shingle pipeline (scan + tokenize + hash explode) must be
    computed ONCE: both consumers (pair buckets, per-doc sizes) read the
    same repartition("sh") exchange, so the final AQE plan shows a
    ReusedExchange of the REPARTITION_BY_COL shuffle. Regression guard for
    the two reuse blockers: collect_set's nondeterminism and the inferred
    IsNotNull pushdown diverging one branch's scan."""
    df = QUERIES["x02_ngram_jaccard_pairs"].fn(spark, SF_DIR)
    # collect() (small at test SF) executes THIS df's QueryExecution; a
    # noop write would execute a copy and leave df's own AQE plan unfinalized
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    reused = [ln for ln in final.splitlines() if "ReusedExchange" in ln]
    assert any("REPARTITION_BY_COL" in ln for ln in reused), reused


def test_filtered_topk_is_equi_join_not_cross(spark):
    """x05g's metadata filter must surface as a hash-join KEY — the whole
    point of the operator is collapsing the broadcast cross join to a
    per-segment equi-join."""
    plan = _plan(spark, "x05g_filtered_topk")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pii_scrub_stays_codegen(spark):
    """x31 is a pure expression rewrite: no exchange, no Python worker —
    one whole-stage-codegen span over the scan (the `*(1)` prefix)."""
    plan = _plan(spark, "x31_pii_scrub")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.lstrip().startswith("*(1)"), plan.splitlines()[0]


def test_unigram_logprob_total_rides_in_plan(spark):
    """x30's corpus total must ride the plan as a 1-row broadcast cross
    join. If it were computed driver-side (a .count()), it would appear
    as a folded literal and the cross join would vanish."""
    plan = _plan(spark, "x30_unigram_logprob")
    assert "BroadcastNestedLoopJoin" in plan and "Cross" in plan
    assert "n_total" in plan  # the 1-row aggregate column, not a literal


def test_scrubbed_text_never_shuffles_in_c02(spark):
    """c02's packing/split stages must shuffle token counts and digests
    only — document text appearing in an Exchange doubles shuffle IO for
    nothing."""
    plan = _optimized(spark, "c02_training_mix")
    import re as _re

    # optimizedPlan shows column lineage; text may feed scan-side
    # projections (scrub, token count) but no aggregate/join KEY carries it
    for ln in plan.splitlines():
        if _re.search(r"^(Join|Aggregate|Window|Sort)\b", ln.strip()):
            assert "scrubbed_text" not in ln and ", text" not in ln, ln


def test_bm25_indexed_pushes_term_filter_to_postings_scan(spark):
    """x12g's whole point: the term-IN predicate must reach the postings
    parquet scan (PushedFilters), so term-sorted row groups skip."""
    plan = _plan(spark, "x12g_bm25_indexed")
    pushed = [
        ln
        for ln in plan.splitlines()
        if "PushedFilters" in ln and "term" in ln and "In(" in ln
    ]
    assert pushed, plan


def test_q21_probes_are_aggregates_not_self_joins(spark):
    """Q21's EXISTS/NOT-EXISTS rewrite: per-order counts, never a
    lineitem-to-lineitem self-join (which explodes with suppliers per
    order)."""
    plan = _plan(spark, "q21_waiting_supplier")
    # exactly the late⋈orders join plus the two count-filter joins and
    # the supplier dim join are allowed; no BroadcastNestedLoop/cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_has_zero_exchange(spark):
    """sk02: both sides bucketed 8-ways on the join key → the sort-merge
    join must consume buckets directly. ANY Exchange in the plan means
    bucketing silently stopped matching (bucket count drift, hint loss,
    or a non-bucketed scan) and the query re-pays the full shuffle."""
    plan = _plan(spark, "sk02_bucketed_join")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_int8_quantize_is_pure_projection(spark):
    """x43: the quantizer must stay a scan-stage projection — array HOFs
    in codegen, no Exchange, no UDF python workers."""
    plan = _plan(spark, "x43_int8_quantize")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q21_reuses_order_supplier_exchange(spark):
    """q21's two per-order probes (supplier count, late count) must both
    read the ONE deduplicated (order, supplier, late_any) aggregate — the
    final AQE plan shows a ReusedExchange, i.e. lineitem⋈orders ran once."""
    df = QUERIES["q21_waiting_supplier"].fn(spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    assert "ReusedExchange" in final


def test_incremental_dedup_single_pass_no_join(spark):
    """x44 must stay the one-scan/one-window form: corpus membership is a
    flag aggregated INSIDE the digest group. A join or a second documents
    branch means the table is scanned twice."""
    plan = _plan(spark, "x44_incremental_dedup")
    assert "Join" not in plan
    assert plan.count("documents.parquet") <= 2  # one scan (+AQE re-render)


def test_lang_partitioned_read_prunes_partitions(spark):
    """s23: the lang predicate must resolve as a PartitionFilter (directory
    pruning), not a data filter over all partitions."""
    plan = _plan(spark, "s23_lang_partitioned_corpus")
    part = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert part and any("lang" in ln for ln in part), part


def test_dpp_join_plants_dynamic_pruning(spark):
    """s28: the join-driven partition prune must plant a dynamicpruning
    subquery in the fact scan (the runtime analogue of s23's static
    PartitionFilters) — without it the join reads every language's
    files and filters rows after the fact."""
    plan = _plan(spark, "s28_dpp_partition_join")
    assert "dynamicpruning" in plan, plan[:2000]


def test_quality_classifier_is_pure_projection(spark):
    """x59's contract: the classifier is a scan-side codegen projection —
    zero Exchange, zero python workers."""
    plan = _plan(spark, "x59_quality_classifier")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_snapshot_diff_shuffles_digests_not_text(spark):
    """x58's FULL OUTER join must exchange (id, md5) pairs only — the
    document text stays scan-side in the digest projection."""
    plan = _plan(spark, "x58_snapshot_diff")
    for ln in plan.splitlines():
        if ln.strip().startswith("Exchange"):
            assert "text#" not in ln, ln


def test_span_dedup_occurrence_count_groups_by_digest(spark):
    """x54's corpus-frequency count must aggregate on (span_h, span_text)
    with the xxhash64 digest LEADING the key — 8-byte partitioning/sort
    comparisons — while text equality decides the group (64-bit
    collisions merge nothing; see span_dedup docstring)."""
    plan = _optimized(spark, "x54_span_dedup")
    agg_lines = [ln for ln in plan.splitlines() if "Aggregate [" in ln]
    occ = [
        ln.split("Aggregate [", 1)[1]
        for ln in agg_lines
        if ln.split("Aggregate [", 1)[1].startswith("span_h")
    ]
    assert occ and any("span_text" in ln for ln in occ), agg_lines


def test_copurchase_joins_are_equi_not_cartesian(spark):
    """x60's pair enumeration must be the per-order equi-self-join —
    never a parts×parts cartesian."""
    plan = _plan(spark, "x60_copurchase_lift")
    assert "CartesianProduct" not in plan


# ---------------------------------------------------------------------------
# Global-window audit (VERDICT r4 #4): an unpartitioned ordered Window is a
# single-task sort of its whole input — legitimate ONLY over relations that
# are bounded by construction. This walks every registered query's executed
# plan and fails on any site not in the documented allowlist, turning the
# BM25-top-k class of scale defect into a regression guard.
# ---------------------------------------------------------------------------

def _bracket_groups(s: str) -> list[str]:
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "[":
            if depth == 0:
                cur = []
            else:
                cur.append(ch)
            depth += 1
        elif ch == "]":
            depth -= 1
            if depth == 0:
                out.append("".join(cur))
            else:
                cur.append(ch)
        elif depth > 0:
            cur.append(ch)
    return out


def _unpartitioned_ordered_windows(plan: str) -> list[str]:
    hits = []
    for ln in plan.splitlines():
        stripped = ln.lstrip(" :+-*")
        if stripped.startswith("Window ["):
            g = _bracket_groups(stripped[len("Window "):])
            if len(g) >= 3:
                continue  # [exprs], [partition spec], [order spec]
            if len(g) == 2 and not (" ASC" in g[1] or " DESC" in g[1]):
                continue  # [exprs], [partition spec] — partitioned, unordered
            hits.append(stripped[:160])
    return hits


# query -> (max allowed unpartitioned ordered Window nodes, bounded-input
# reason). Anything not listed here gets ZERO.
GLOBAL_WINDOW_ALLOWLIST = {
    # BM25 family: rank window runs over the k survivors of
    # orderBy().limit(k) (TakeOrderedAndProject) — operators/search.py
    # _rank_topk.
    "x12_bm25_search": (1, "k-row TakeOrdered survivors"),
    "x12b_bm25_and": (1, "k-row TakeOrdered survivors"),
    "x12c_bm25_phrase": (1, "k-row TakeOrdered survivors"),
    "x12d_bm25_boosted": (1, "k-row TakeOrdered survivors"),
    "x12e_bm25_multiphrase": (1, "k-row TakeOrdered survivors"),
    "x12f_bm25_proximity": (1, "k-row TakeOrdered survivors"),
    "x12g_bm25_indexed": (1, "k-row TakeOrdered survivors"),
    "x12h_bm25_fielded": (1, "k-row TakeOrdered survivors"),
    "x62_bm25_index_update": (1, "k-row TakeOrdered survivors"),
    "x124_ndcg_at_10": (1, "k-row TakeOrdered survivors (bm25_topk head)"),
    # RRF: union of already-bounded top-k candidate lists + one bounded
    # retriever rank (operators/search.py rrf_fuse docstring).
    "x32_hybrid_rrf": (2, "bounded top-k candidate lists"),
    # Two-level cumsums: the global window sees per-bucket/per-partition
    # TOTALS, never documents (operators/sampling.py module docstring).
    "x17_pack_chunks": (1, "bucket totals (#buckets rows)"),
    "c02_training_mix": (1, "bucket totals (#buckets rows)"),
    "x38_length_bucketing": (2, "distinct sequence lengths"),
    "x41_curriculum_order": (2, "partition stats + 4 band sizes"),
    # Small-by-construction relations.
    "w03_auto_increment": (1, "distinct segments"),
    "g08_binned_lead_snp": (1, "genomic bins"),
    "g09_qq_binned": (1, "QQ bins"),
    "x72_cumulative_uniques": (1, "distinct days"),
    # Vocabulary heads: rank runs AFTER the top-k limit
    # (operators/vocab.py TakeOrdered-then-rank).
    "x22_vocabulary": (1, "top-k vocab head"),
    "x33_bpe_pair_counts": (1, "top-k pair head"),
    # Distributed global rank: the only unpartitioned window is the
    # cumulative offset over per-partition stat rows
    # (operators/sampling.py global_row_number).
    "x74_global_rank": (1, "partition stats (#partitions rows)"),
    "x75_ntile_deciles": (1, "partition stats (#partitions rows)"),
    "x83_zipf_slope": (1, "partition stats (#partitions rows)"),
    "x95_peak_concurrency": (1, "hour-bucket totals"),
    # Eval ops on the distributed-rank primitive (partition-stat window)
    # plus their own bounded rollups.
    "x119_classifier_auc": (1, "partition stats (#partitions rows)"),
    "x122_lorenz_gini": (2, "partition stats + 10 decile rows"),
    "x123_bootstrap_ci": (1, "B=200 replicate means"),
    # KM curve: all three cumulative windows run over the per-lifetime
    # relation — one row per DISTINCT lifetime day, bounded by the
    # observation window length, never the user count
    # (plans/metrics_ops.py x129 docstring).
    "x129_kaplan_meier": (3, "distinct lifetime days (observation window)"),
    # CUSUM: prefix sum + row index over the daily relation — one row
    # per DISTINCT order day, calendar-bounded like x72/x127.
    "x131_cusum_changepoint": (2, "distinct order days (calendar-bounded)"),
    # Ring negatives: the suffix-minimum window runs over the FIXED
    # 16^4-row bucket spine (hex-space construction, data-independent)
    # — operators/sampling.py ring_negatives.
    "x132_ring_negatives": (1, "fixed 16^4-bucket ring spine"),
    # Conformal calibration rank via global_row_number: the only
    # unpartitioned window is the cumulative offset over per-partition
    # stat rows (operators/sampling.py), same as x119/x122.
    "x137_conformal_coverage": (1, "partition stats (#partitions rows)"),
    # Length deciles via exact_ntile (same primitive as x75).
    "x138_length_controlled_quality": (1, "partition stats (#partitions rows)"),
    # Rolling quantiles over the daily revenue relation — one row per
    # DISTINCT order day, calendar-bounded like x131/x72.
    "w11_rolling_median": (1, "distinct order days (calendar-bounded)"),
    # 12-month lag over the MONTHLY revenue relation — one row per
    # distinct order month, calendar-bounded like w11.
    "w12_yoy_revenue": (1, "distinct order months (calendar-bounded)"),
    # Both serve phases rank k-row TakeOrdered survivors
    # (operators/search.py _rank_topk, the x12g shape twice).
    "x163_bm25_index_delete": (2, "k-row TakeOrdered survivors (2 phases)"),
    # Token-budget cumsum via global_cumsum: the only unpartitioned
    # window is the offset over per-partition weight totals
    # (operators/sampling.py global_cumsum — global_row_number's rule).
    "x164_token_budget_select": (1, "partition stats (#partitions rows)"),
    # The composite's BM25 serve phase ranks k-row TakeOrdered
    # survivors (operators/search.py _rank_topk, the x12g/x163 shape).
    "x173_incremental_ingest": (1, "k-row TakeOrdered survivors"),
}


@slow_gate
def test_global_window_audit(spark):
    """Full-registry plan audit (~4.5 min: building every registered
    query's physical plan executes the staged composites' maintenance
    ops). Slow-gated for the driver's verify window (VERDICT r13 #1);
    run with GWASDB_SLOW_TESTS=1 before round close. The per-query
    plan-shape contracts below (BM25 TakeOrdered, DSIR broadcast, ...)
    still run by default."""
    violations = {}
    for name, q in QUERIES.items():
        df = q.fn(spark, SF_DIR)
        hits = _unpartitioned_ordered_windows(
            df._jdf.queryExecution().executedPlan().toString()
        )
        allowed = GLOBAL_WINDOW_ALLOWLIST.get(name, (0, ""))[0]
        if len(hits) > allowed:
            violations[name] = hits
    assert not violations, (
        "unpartitioned ordered Window over a potentially unbounded input "
        f"(add to allowlist ONLY with a bounded-input proof): {violations}"
    )


def test_bm25_final_rank_is_take_ordered(spark):
    """r4 verdict #1's done-criterion: all three BM25 paths (ad-hoc,
    indexed/serving, fielded) must take the top k via
    TakeOrderedAndProject (per-task k-row heaps) BEFORE the rank window
    — never rank the full candidate set through one task."""
    for name in ("x12_bm25_search", "x12g_bm25_indexed", "x12h_bm25_fielded"):
        plan = _plan(spark, name)
        assert "TakeOrderedAndProject" in plan, name


def test_dsir_llr_broadcasts_onto_token_stream(spark):
    """x96's bucket-LLR relation (<=128 rows + 1-row totals) must ride a
    broadcast join back onto the token stream — a sort-merge here would
    shuffle the whole tokenized corpus on bucket for a 128-row dim."""
    plan = _plan(spark, "x96_dsir_importance")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shingle_novelty_has_no_shingle_grain_join(spark):
    """x98 is join-free at shingle grain by design: the only join is the
    doc-grain totals-vs-novels merge. A join keyed on the shingle hash
    would mean the naive two-multi-million-row-relation form regressed
    back in (measured 15x slower)."""
    plan = _plan(spark, "x98_shingle_novelty")
    joins = [
        ln for ln in plan.splitlines()
        if ("SortMergeJoin" in ln or "BroadcastHashJoin" in ln
            or "ShuffledHashJoin" in ln)
    ]
    assert joins, "expected the doc-grain join"
    assert all("sh#" not in ln for ln in joins), (
        "join keyed on the shingle hash — the join-free formulation "
        f"regressed: {joins}"
    )


def test_salted_agg_is_two_level(spark):
    """sk03 must aggregate at (hot_key, salt) before the final hot_key
    level — two distinct grouping stages in the plan. Collapsing to one
    agg on hot_key alone re-creates the single-hot-reducer it exists to
    prevent."""
    plan = _plan(spark, "sk03_salted_skew_agg")
    assert "salt" in plan, "salt column eliminated from the aggregation"
    n_hashagg_keys = plan.count("keys=[hot_key")
    assert n_hashagg_keys >= 2, plan[:2000]


def test_perplexity_buckets_reuses_scored_relation(spark):
    """x100's scored relation feeds both the cuts aggregate and the
    final projection through ONE pinned computation — without the
    checkpoint the executed plan held 6 independent corpus scans."""
    plan = _plan(spark, "x100_perplexity_buckets")
    assert plan.count("FileScan") <= 1, (
        "tokenize+LM pipeline replans per consumer again"
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_int8_quant_scales_broadcast(spark):
    """x101's per-dim scale table (|dims| rows) must BROADCAST back onto
    the exploded value stream — a sort-merge join there shuffles the
    full |corpus|×dims stream by a 64-value key (worst-case skew)."""
    plan = _plan(spark, "x101_int8_quant_audit")
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_kmeans_profile_codebook_broadcasts(spark):
    """x102's k-way scored cross join must be a broadcast nested loop of
    the k-row codebook — never a CartesianProduct exchange of the
    corpus."""
    plan = _plan(spark, "x102_kmeans_cluster_profile")
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]
    assert "CartesianProduct" not in plan


def test_dup_histogram_reuses_shingle_exchange(spark):
    """x103 rides x02's shared shingle exchange: the pipeline (scan +
    tokenize + hash explode) is computed once for both consumers."""
    df = QUERIES["x103_dup_similarity_histogram"].fn(spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final
    reused = [ln for ln in final.splitlines() if "ReusedExchange" in ln]
    assert any("REPARTITION_BY_COL" in ln for ln in reused), reused


def test_filter_funnel_single_scan(spark):
    """x104 is ONE pass over the text column: gate booleans fold into the
    scan projection and a single 1-row aggregate feeds the stack() — a
    second FileScan means a gate re-derived the corpus."""
    plan = _plan(spark, "x104_filter_funnel")
    assert plan.count("FileScan") == 1, plan[:2000]


def test_last_touch_attribution_single_exchange(spark):
    """e04's as-of composition must cost ONE hash exchange by user (the
    union'd window) — a SortMergeJoin or pair blow-up join means the
    naive theta-join crept back."""
    plan = _plan(spark, "e04_last_touch_attribution")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    n_exchanges = sum(
        1
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "user_id" in ln
    )
    assert n_exchanges == 1, plan[:2000]


def test_prs_no_forced_broadcast(spark):
    """g15's fact→orders join: both sides are SF-proportional — a forced
    broadcast is a driver OOM at biobank scale, so strategy stays with
    AQE (same rule as q03)."""
    assert "strategy=broadcast" not in _optimized(spark, "g15_prs_score")


def test_source_overlap_pins_distinct_relation(spark):
    """x105's distinct (source, shingle) relation must be computed ONCE
    (lazy localCheckpoint) and feed sizes + both join sides — three
    FileScans means each consumer re-derived the corpus."""
    plan = _plan(spark, "x105_source_overlap_matrix")
    assert plan.count("FileScan") <= 1, plan[:2000]


def test_quantile_normalize_is_one_scan_no_join(spark):
    """x106 is a scan-side scored projection + source-partitioned
    windows: no join, single FileScan."""
    plan = _plan(spark, "x106_score_quantile_normalize")
    assert plan.count("FileScan") == 1, plan[:2000]
    assert "Join" not in plan


def test_correlation_matrix_single_scan_one_agg(spark):
    """x109 computes all 6 correlations from ONE moment aggregate over
    ONE scan — a per-pair corr() formulation would re-scan the fact
    table 6 times."""
    plan = _plan(spark, "x109_correlation_matrix")
    assert plan.count("FileScan") == 1, plan[:2000]


def test_ann_cell_serve_prunes_partitions(spark):
    """x136's serve scan must read ONLY the probed cells' partitions:
    the literal IN filter over probe cells has to reach the index scan
    as a PartitionFilter (the point of partitioning the index BY CELL),
    and the filter must name at most nprobe x n_queries = 20 of the 64
    cells — a scan that reads every partition is a flat scan wearing an
    index's clothes."""
    import re

    from gwasdb_spark.plans import QUERIES

    df = QUERIES["x136_ann_cell_serve"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, "index scan lost its PartitionFilters"
    body = m.group(1)
    assert "cell" in body and body.strip(), body
    n_cells = len(re.findall(r"\d+", body))
    assert 0 < n_cells <= 20, f"expected <=20 probed cells, saw {n_cells}"


def test_ann_upsert_serve_prunes_partitions(spark):
    """x153's post-upsert serve must keep x136's pruning property: the
    probe-cell IN filter reaches the upserted index's scan as a
    PartitionFilter naming at most nprobe x n_queries = 20 cells —
    absorbing a batch must not degrade the serve path to a flat scan."""
    import re

    from gwasdb_spark.plans import QUERIES

    df = QUERIES["x153_ann_index_upsert"].fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m, "upserted index scan lost its PartitionFilters"
    body = m.group(1)
    assert "cell" in body and body.strip(), body
    n_cells = len(re.findall(r"\d+", body))
    assert 0 < n_cells <= 20, f"expected <=20 probed cells, saw {n_cells}"


def test_ann_upsert_touched_read_prunes_partitions(spark, tmp_path):
    """The UPSERT itself must also prune: the merge's read of the old
    index may open only the touched cells' partitions (the whole point
    of the manifest sidecar — at 100 TB the untouched cells are never
    scanned, let alone rewritten). Asserted via the driver-side touched
    set (bounded) plus the on-disk proof that untouched files keep
    their mtimes, which fails if the rewrite path widens."""
    import glob
    import os

    from pyspark.sql import functions as F

    from gwasdb_spark.operators.ann_index import (
        build_cell_index,
        upsert_cell_index,
    )

    rows = [(i, [float((i * 7 + d) % 11) for d in range(8)]) for i in range(64)]
    base = str(tmp_path / "idx")
    build_cell_index(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        base,
    )
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(base, "index", "cell=*", "*.parquet"))
    }
    batch = spark.createDataFrame(
        [(3, [9.0] + [0.0] * 7)], "vec_id long, embedding array<float>"
    )
    info = upsert_cell_index(spark, base, batch)
    assert len(info["touched_cells"]) <= 2
    touched_dirs = {
        os.path.join(base, "index", f"cell={c}") for c in info["touched_cells"]
    }
    stale = [
        p
        for p, m in before.items()
        if os.path.dirname(p) not in touched_dirs
        and os.path.getmtime(p) != m
    ]
    assert not stale, stale
