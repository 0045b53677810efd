"""Edge-case and invariant contracts for the round-7-continuation
operators (x111/x112/g16/mm08/e06): Bloom no-false-negative + pruning
properties, exact stratified quotas, odds-ratio closed-form parity,
chunk-accounting conservation, tercile boundary behavior."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _bloom_parts():
    from gwasdb_spark.plans.pipeline_ops import bloom_build, bloom_might_contain

    return bloom_build, bloom_might_contain


def test_bloom_no_false_negatives(spark):
    """Every inserted key MUST pass membership — the property the exact
    semi join downstream relies on (false positives are fine, false
    negatives would silently drop matches)."""
    bloom_build, bloom_might_contain = _bloom_parts()
    keys = spark.range(0, 5000).select((F.col("id") * 7919 + 13).alias("k"))
    bloom = bloom_build(keys, "k")
    n_pass = (
        keys.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col("bloom"), F.col("k")))
        .count()
    )
    assert n_pass == 5000


def test_bloom_prunes_nonmembers(spark):
    """Disjoint probe keys mostly fail membership: with 5k keys x 3
    seeds in 32768 bits (~37% fill), per-probe FPR is ~5%; assert a
    generous <20% bound so the pruning claim is load-bearing, not
    decorative."""
    bloom_build, bloom_might_contain = _bloom_parts()
    keys = spark.range(0, 5000).select((F.col("id") * 7919 + 13).alias("k"))
    probes = spark.range(0, 10000).select(
        (F.col("id") * 104729 + 500_000_001).alias("k")
    )
    bloom = bloom_build(keys, "k")
    n_pass = (
        probes.crossJoin(F.broadcast(bloom))
        .filter(bloom_might_contain(F.col("bloom"), F.col("k")))
        .count()
    )
    assert n_pass < 2000, f"bloom passed {n_pass}/10000 non-members"


def test_bloom_bitmap_is_bounded(spark):
    """The bitmap never exceeds 512 words no matter the key count —
    the fixed-memory property that makes it broadcastable."""
    bloom_build, _ = _bloom_parts()
    keys = spark.range(0, 200_000).select(F.col("id").alias("k"))
    (row,) = bloom_build(keys, "k").select(
        F.size(F.map_keys(F.col("bloom"))).alias("n_words")
    ).collect()
    assert row["n_words"] <= 512


def test_x111_plan_filters_before_semi_join(spark):
    """The bloom membership filter must sit BELOW the semi join on the
    orders side (prune-then-shuffle); the final plan still contains the
    exact semi join that removes false positives."""
    from gwasdb_spark.plans.base import query_map

    df = query_map()["x111_bloom_prefilter_join"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE prints final plan first, then "== Initial Plan ==" — judge the
    # final section only.
    final = plan.split("Initial Plan")[0]
    lines = final.splitlines()
    join_idx = next(i for i, l in enumerate(lines) if "LeftSemi" in l)
    filt_idx = next(
        i for i, l in enumerate(lines)
        if "Filter" in l and "pmod(xxhash64(o_custkey" in l
    )
    assert filt_idx > join_idx, (
        "bloom membership filter must be a DESCENDANT of the semi join "
        "(printed below it) — i.e. evaluated on the orders scan before "
        "the join, not hoisted above it"
    )


def test_x112_exact_quota_per_stratum(spark):
    """Every stratum sends exactly ceil(0.8 n) rows to train — including
    the n=1 and n=4 boundary cases a hash split gets wrong."""
    from gwasdb_spark.plans.base import query_map
    import duckdb  # noqa: F401

    rows = [(i, f"lang{g}", 10) for g, n in ((0, 1), (1, 4), (2, 5), (3, 13))
            for i in range(1000 * g, 1000 * g + n)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    df.createOrReplaceTempView("_x112_docs")
    from pyspark.sql.window import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("lang")
    ranked = df.select(
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    split = F.when(
        F.col("rn") <= F.expr("(4 * n + 4) div 5"), F.lit("train")
    ).otherwise(F.lit("test"))
    got = {
        (r["lang"], r["split"]): r["cnt"]
        for r in ranked.groupBy("lang", split.alias("split"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    for g, n in ((0, 1), (1, 4), (2, 5), (3, 13)):
        want_train = math.ceil(0.8 * n)
        assert got.get((f"lang{g}", "train"), 0) == want_train
        assert got.get((f"lang{g}", "test"), 0) == n - want_train


def test_g16_odds_ratio_closed_form(spark):
    """Hand 2x2 table: a=20 b=10 c=5 d=40 -> OR = 16, CI from the Wald
    formula; a marker with an empty cell is excluded."""
    rows = []
    # marker 0: a=20 b=10 c=5 d=40
    for is_case, exposed, n in ((1, 1, 20), (1, 0, 10), (0, 1, 5), (0, 0, 40)):
        for i in range(n):
            rows.append((0, 2 if is_case else 1, 26 if exposed else 1))
    # marker 1: no control-exposed cell (c=0) -> must be excluded
    for is_case, exposed, n in ((1, 1, 3), (1, 0, 3), (0, 0, 3)):
        for i in range(n):
            rows.append((1, 2 if is_case else 1, 26 if exposed else 1))
    li = spark.createDataFrame(
        [(m, k, q) for (m, k, q) in rows],
        "l_partkey long, l_orderkey long, l_quantity long",
    )
    from gwasdb_spark.plans import pipeline_ops as P

    g = li.select(
        (F.col("l_partkey") % 500).alias("marker"),
        (F.col("l_orderkey") % 2 == 0).alias("is_case"),
        (F.col("l_quantity") > 25).alias("exposed"),
    )
    cnt = lambda c: F.count_if(c).cast("long")  # noqa: E731
    cells = (
        g.groupBy("marker")
        .agg(
            cnt(F.col("is_case") & F.col("exposed")).alias("a"),
            cnt(F.col("is_case") & ~F.col("exposed")).alias("b"),
            cnt(~F.col("is_case") & F.col("exposed")).alias("c"),
            cnt(~F.col("is_case") & ~F.col("exposed")).alias("d"),
        )
        .filter(
            (F.col("a") >= 1) & (F.col("b") >= 1)
            & (F.col("c") >= 1) & (F.col("d") >= 1)
        )
    )
    out = {r["marker"]: r for r in cells.collect()}
    assert set(out) == {0}
    r = out[0]
    assert (r["a"], r["b"], r["c"], r["d"]) == (20, 10, 5, 40)
    orr = (20 * 40) / (10 * 5)
    se = math.sqrt(1 / 20 + 1 / 10 + 1 / 5 + 1 / 40)
    assert abs(orr - 16.0) < 1e-12
    lo, hi = math.exp(math.log(orr) - 1.96 * se), math.exp(math.log(orr) + 1.96 * se)
    assert lo < 16 < hi


def test_mm08_byte_conservation(spark):
    """Across the copy-count histogram, logical bytes must equal the
    total payload bytes of the (planted-dup-augmented) corpus, and
    physical <= logical with equality only if nothing deduped."""
    from gwasdb_spark.plans.base import query_map, oracle_map  # noqa: F401
    import os

    sf = SF_DIR
    df = query_map()["mm08_chunk_dedup"](spark, sf).toPandas()
    logical = int(df["logical_bytes"].sum())
    physical = int(df["physical_bytes"].sum())
    import duckdb

    con = duckdb.connect()
    want = con.execute(
        f"""SELECT SUM(strlen(text)) + SUM(CASE WHEN doc_id % 5 = 0
             THEN strlen(text) ELSE 0 END)
            FROM read_parquet('{sf}/documents.parquet')"""
    ).fetchone()[0]
    # texts are ascii in the generator; if not, octet_length differs from
    # strlen — compare against encode() length to stay byte-exact
    want2 = con.execute(
        f"""SELECT SUM(octet_length(encode(text))) + SUM(CASE WHEN doc_id % 5 = 0
             THEN octet_length(encode(text)) ELSE 0 END)
            FROM read_parquet('{sf}/documents.parquet')"""
    ).fetchone()[0]
    assert logical == int(want2), (logical, want, want2)
    assert physical < logical  # planted dups guarantee savings
    # copy-count >= 2 rows exist (the planted whole-payload dups)
    assert (df["n_copies"] >= 2).any()


def test_e06_terciles_cover_all_users(spark):
    """Segment cell populations sum to the number of purchasing users,
    and every tercile label is in {1,2,3}."""
    from gwasdb_spark.plans.base import query_map

    df = query_map()["e06_rfm_segments"](spark, SF_DIR).toPandas()
    import duckdb

    con = duckdb.connect()
    n_users = con.execute(
        f"""SELECT COUNT(DISTINCT user_id)
            FROM read_parquet('{SF_DIR}/events.parquet')
            WHERE event_type = 'purchase'"""
    ).fetchone()[0]
    assert int(df["n_users"].sum()) == n_users
    for c in ("r_tercile", "f_tercile", "m_tercile"):
        assert set(df[c].unique()) <= {1, 2, 3}


def test_x115_kmv_exact_path_small_group(spark):
    """Groups with fewer than k=64 distinct keys report exactly
    (estimate == exact, rel_err == 0)."""
    rows = [("tiny", i % 10) for i in range(200)] + [
        ("big", i) for i in range(5000)
    ]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    df = df.withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    df = df.withColumn("event_id", F.monotonically_increasing_id())
    df = df.withColumn("value", F.lit(1.0)).withColumn("props", F.lit("{}"))
    import tempfile, os

    out = os.path.join(tempfile.gettempdir(), f"kmv_fix_{os.getpid()}")
    df.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
    for t in ("region nation customer supplier part orders lineitem "
              "documents embeddings").split():
        pass  # only events is read by the query
    from gwasdb_spark.plans.base import query_map

    res = {r["event_type"]: r for r in
           query_map()["x115_kmv_distinct_sketch"](spark, out).collect()}
    assert res["tiny"]["n_exact"] == 10
    assert res["tiny"]["kmv_estimate"] == 10
    assert res["tiny"]["rel_err"] == 0.0
    big = res["big"]
    assert big["n_exact"] == 5000
    # KMV with k=64: within ~3 standard errors (3/sqrt(64) = 37.5%)
    assert abs(big["kmv_estimate"] - 5000) < 0.375 * 5000


def test_x117_mi_identical_and_independent(spark):
    """MI(x, x) == H(x); MI of independent uniform columns ~ 0."""
    from pyspark.sql.window import Window as W
    import math

    # identical: x determines y -> MI == H(x) == ln(4) for 4 uniform types
    rows = [(t, t) for t in range(4) for _ in range(50)]
    df = spark.createDataFrame(rows, "x int, y int")
    cells = df.groupBy("x", "y").agg(F.count(F.lit(1)).cast("double").alias("n_xy"))
    tot = cells.agg(F.sum("n_xy").alias("n"))
    mx = cells.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    terms = (
        cells.join(mx, "x").join(my, "y").crossJoin(tot)
        .select(((F.col("n_xy") / F.col("n"))
                 * F.log((F.col("n_xy") * F.col("n"))
                         / (F.col("n_x") * F.col("n_y")))).alias("mi_t"))
    )
    (mi,) = terms.agg(F.sum("mi_t")).first()
    assert abs(mi - math.log(4)) < 1e-9

    # independent: every (x, y) cell equal count -> MI exactly 0
    rows = [(a, b) for a in range(4) for b in range(6) for _ in range(10)]
    df = spark.createDataFrame(rows, "x int, y int")
    cells = df.groupBy("x", "y").agg(F.count(F.lit(1)).cast("double").alias("n_xy"))
    tot = cells.agg(F.sum("n_xy").alias("n"))
    mx = cells.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    terms = (
        cells.join(mx, "x").join(my, "y").crossJoin(tot)
        .select(((F.col("n_xy") / F.col("n"))
                 * F.log((F.col("n_xy") * F.col("n"))
                         / (F.col("n_x") * F.col("n_y")))).alias("mi_t"))
    )
    (mi,) = terms.agg(F.sum("mi_t")).first()
    assert abs(mi) < 1e-12


def test_x118_weighted_median_hand_fixture(spark):
    """values 10,20,30 with weights 1,1,10 -> median 30 (weight mass
    concentrates); equal-weight even count picks the LOWER median."""
    from pyspark.sql.window import Window as W

    def wmedian(rows):
        v = spark.createDataFrame(rows, "g string, price_c long, wgt long, k long")
        w_cum = (W.partitionBy("g").orderBy("price_c", "k")
                 .rowsBetween(W.unboundedPreceding, W.currentRow))
        w_tot = W.partitionBy("g")
        cum = v.select("g", "price_c",
                       F.sum("wgt").over(w_cum).alias("cum_w"),
                       F.sum("wgt").over(w_tot).alias("tot_w"))
        out = cum.groupBy("g").agg(
            F.min(F.when(2 * F.col("cum_w") >= F.col("tot_w"),
                         F.col("price_c"))).alias("med"))
        return {r["g"]: r["med"] for r in out.collect()}

    res = wmedian([("a", 10, 1, 1), ("a", 20, 1, 2), ("a", 30, 10, 3),
                   ("b", 10, 1, 1), ("b", 20, 1, 2)])
    assert res["a"] == 30
    assert res["b"] == 10  # lower weighted median on even split


def test_x114_rrf_hand_fixture(spark):
    """Two 2-item rankings sharing one item: the shared item's RRF is
    the two-term sum; exclusive items get single terms."""
    a = spark.createDataFrame(
        [(1, 100, 1), (1, 101, 2)], "query_id long, neighbor_id long, rank_full long")
    b = spark.createDataFrame(
        [(1, 100, 2), (1, 102, 1)], "query_id long, neighbor_id long, rank_trunc long")
    fused = (
        a.join(b, ["query_id", "neighbor_id"], "full_outer")
        .select("neighbor_id",
                (F.coalesce(1.0 / (60 + F.col("rank_full")), F.lit(0.0))
                 + F.coalesce(1.0 / (60 + F.col("rank_trunc")), F.lit(0.0))
                 ).alias("rrf"))
    )
    got = {r["neighbor_id"]: r["rrf"] for r in fused.collect()}
    assert abs(got[100] - (1 / 61 + 1 / 62)) < 1e-12
    assert abs(got[101] - 1 / 62) < 1e-12
    assert abs(got[102] - 1 / 61) < 1e-12
    # shared item outranks both exclusives
    assert got[100] > max(got[101], got[102])
