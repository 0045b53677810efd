"""Dataset-assembly operators: split determinism, packing correctness
(two-level cumsum vs naive single-window), quotas, contamination."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gwasdb_spark.operators.sampling import (
    hash_split,
    packed_sequences,
    quota_per_group,
)


def test_hash_split_deterministic_and_proportioned(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
    b = {r.doc_id: r.split for r in hash_split(df, "doc_id").collect()}
    assert a == b  # content-addressed: no run-to-run drift
    from collections import Counter

    frac = {k: v / 2000 for k, v in Counter(a.values()).items()}
    assert abs(frac["train"] - 0.75) < 0.05
    assert abs(frac["val"] - 0.125) < 0.04
    assert abs(frac["test"] - 0.125) < 0.04


def test_packed_sequences_matches_naive_global_window(spark):
    """The two-level (bucketed) cumsum must equal the naive single-task
    global window formulation exactly — including across bucket
    boundaries (bucket_width=8 forces many boundaries)."""
    rows = [(i, (i * 37) % 90 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n long")

    got = {
        r.id: (r.start_offset, r.pack_id)
        for r in packed_sequences(
            df, "doc_id", F.col("n"), budget=100, bucket_width=8
        ).collect()
    }

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r.doc_id: (r.start % 100, r.start // 100)
        for r in df.select(
            "doc_id", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("start")
        ).collect()
    }
    assert got == naive


def test_packed_sequences_plan_has_no_global_data_window(spark):
    """The window ordered over raw rows must be PARTITIONED (by bucket);
    only the bucket-totals window — #buckets rows — may be global."""
    df = spark.createDataFrame([(i, 5) for i in range(100)], "doc_id long, n long")
    plan = (
        packed_sequences(df, "doc_id", F.col("n"), budget=64, bucket_width=16)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    windows = [ln for ln in plan.splitlines() if "Window [" in ln or "windowspecdefinition" in ln]
    data_windows = [ln for ln in windows if "local_cum" in ln]
    assert data_windows and all("bucket" in ln for ln in data_windows), windows


def test_quota_per_group_caps_and_orders(spark):
    rows = [(i, "a" if i < 50 else "b", float(i % 10)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, g string, q double")
    out = quota_per_group(df, "g", [F.desc("q"), F.asc("id")], k=5).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.g, []).append(r)
    assert len(by_g["a"]) == 5 and len(by_g["b"]) == 5
    # best-first: group a's survivors are all q=9 rows (ids 9,19,29,39,49)
    assert sorted(r.id for r in by_g["a"]) == [9, 19, 29, 39, 49]


def test_contamination_planted_overlap(spark):
    from gwasdb_spark.operators.dedup import contaminated_docs

    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, bench_text),                                  # benchmark
        (100, "prefix " + bench_text + " suffix"),        # contains 8-grams
        (101, "totally different words with no overlap at all here"),
        (102, bench_text.replace("delta", "DELTA")),      # 8-gram broken
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter(F.col("doc_id") < 100)
    corpus = df.filter(F.col("doc_id") >= 100)
    got = {
        r.doc_id: r.n_shared_shingles
        for r in contaminated_docs(corpus, bench, n=8).collect()
    }
    assert set(got) == {100}
    assert got[100] == 3  # benchmark doc has 3 distinct 8-grams, all shared


def test_temperature_sample_quota_law(spark):
    # 100 'big' rows vs 9 'small' rows: quota(big)=ceil(8*10)=80,
    # quota(small)=ceil(8*3)=24 -> small kept whole, big downsampled.
    from gwasdb_spark.operators.sampling import temperature_sample

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(9)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_sample(df, "lang", "doc_id", scale=8.0)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big": 80, "small": 9}

    # deterministic: same draw on re-run
    ids1 = sorted(r["doc_id"] for r in out.collect())
    ids2 = sorted(r["doc_id"] for r in temperature_sample(
        df, "lang", "doc_id", scale=8.0).collect())
    assert ids1 == ids2


def test_chunk_overlap_covers_and_never_redundant(spark):
    """x50 chunk grid: every token lands in >= 1 chunk, consecutive chunks
    overlap by exactly 16 tokens (when both are full), and no chunk is
    fully contained in its predecessor (boundary: n == chunk size)."""
    from gwasdb_spark.plans import QUERIES
    from pyspark.sql import functions as F

    texts = [
        (1, " ".join(f"t{i}" for i in range(64))),    # exactly one chunk
        (2, " ".join(f"t{i}" for i in range(65))),    # 2 chunks, 1 new token
        (3, " ".join(f"t{i}" for i in range(200))),   # several chunks
        (4, "short doc"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    words = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda s: s != "")
    base = df.select("doc_id", words.alias("words")).filter(F.size("words") > 0)
    n_words = F.size("words")
    n_chunks = (
        F.greatest(
            F.ceil((n_words - F.lit(64)).cast("double") / 48.0).cast("long"),
            F.lit(0).cast("long"),
        ) + 1
    )
    got = {r.doc_id: (r.n, r.k) for r in
           base.select("doc_id", n_words.alias("n"), n_chunks.alias("k")).collect()}
    assert got[1] == (64, 1)     # no redundant fully-overlapped tail
    assert got[2] == (65, 2)
    assert got[3] == (200, 4)    # starts 0,48,96,144; 144+56=200 covered
    assert got[4][1] == 1
    # coverage: last chunk's end == n for every doc
    for n, k in got.values():
        assert 48 * (k - 1) < n <= 48 * (k - 1) + 64


def test_global_row_number_matches_naive_window(spark):
    """The distributed two-level rank must be indistinguishable from the
    single-task Window.orderBy row_number, including on skewed and
    duplicate-heavy key distributions."""
    from pyspark.sql.window import Window

    from gwasdb_spark.operators.sampling import global_row_number

    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") % 37).alias("k"),  # heavy duplicate sort values
    )
    got = {
        (r.id, r.rk)
        for r in global_row_number(
            df, [F.asc("k"), F.desc("id")], rank_col="rk"
        ).collect()
    }
    want = {
        (r.id, r.rk)
        for r in df.withColumn(
            "rk",
            F.row_number()
            .over(Window.orderBy(F.asc("k"), F.desc("id")))
            .cast("long"),
        ).collect()
    }
    assert got == want


def test_global_row_number_plan_has_no_global_data_window(spark):
    """The only unpartitioned window may run over per-partition stats —
    the data relation itself must go through the range exchange, not a
    single-task sort."""
    from gwasdb_spark.operators.sampling import global_row_number

    df = spark.range(0, 1000).select(F.col("id"), (F.col("id") % 7).alias("k"))
    ranked = global_row_number(df, [F.asc("k"), F.asc("id")], rank_col="rk")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    # The executed plan reads the lazily-checkpointed ranged relation as
    # an RDD scan (the range exchange lives upstream of the checkpoint);
    # what must hold HERE is that the only Window is the bounded
    # per-partition-stats cumsum — ordered by __pid, never by data
    # columns — and that the offsets join back via broadcast.
    saw_window = False
    for ln in plan.splitlines():
        stripped = ln.lstrip(" :+-*")
        if stripped.startswith("Window ["):
            saw_window = True
            assert "__pid" in stripped and "k#" not in stripped, stripped
    assert saw_window
    assert "BroadcastHashJoin" in plan


def test_exact_ntile_matches_sql_ntile(spark):
    """exact_ntile must reproduce SQL NTILE bucket boundaries exactly,
    including the N mod n remainder distribution, for several n."""
    from pyspark.sql.window import Window

    from gwasdb_spark.operators.sampling import exact_ntile

    df = spark.range(0, 1003).select(F.col("id"), (F.col("id") * 7 % 97).alias("v"))
    for n in (2, 4, 10, 1000, 2000):  # 2000 > N exercises the degenerate tile
        got = {
            (r.id, r.tile)
            for r in exact_ntile(df, n, [F.desc("v"), F.asc("id")]).collect()
        }
        want = {
            (r.id, r.tile)
            for r in df.withColumn(
                "tile",
                F.ntile(n).over(Window.orderBy(F.desc("v"), F.asc("id"))),
            ).collect()
        }
        assert got == want, f"ntile({n}) diverged"


def test_weighted_sample_is_rerun_stable(spark):
    """x77's content-addressed A-Res keys: two independent evaluations
    must select the identical sample in the identical order."""
    from gwasdb_spark.plans import QUERIES

    from tests.conftest import SF_DIR

    a = QUERIES["x77_weighted_sample"].fn(spark, SF_DIR).collect()
    b = QUERIES["x77_weighted_sample"].fn(spark, SF_DIR).collect()
    assert a == b and len(a) == 100
