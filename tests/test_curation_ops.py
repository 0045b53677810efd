"""Independent rederivations for the curation operators
(plans/curation_ops.py): the 13-gram contamination report vs a pure
python set intersection, the exact-integer CUSUM vs python bigints, the
hash-ring negative sampler vs a bisect successor walk, and burstiness
vs python integer moments — different algorithm shapes than both the
Spark plan and the DuckDB oracle."""

from __future__ import annotations

import bisect
import hashlib
import math
import re
from collections import defaultdict

import pandas as pd

from tests.conftest import SF_DIR


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _split_of(doc_id) -> str:
    nib = _md5hex(str(doc_id))[0]
    return {"c": "val", "d": "val", "e": "test", "f": "test"}.get(nib, "train")


def _docs(spark):
    from gwasdb_spark.catalog import table

    return table(spark, SF_DIR, "documents").select("doc_id", "text").toPandas()


# --------------------------------------------------------------- x130 --


def test_contamination_matches_python_sets(spark):
    from gwasdb_spark.plans import QUERIES

    pdf = _docs(spark)
    sh = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        w = re.split(r"\s+", text.strip())
        grams = {
            " ".join(w[i : i + 13]) for i in range(max(len(w) - 12, 0))
        }
        sh[doc_id] = {int(_md5hex(g)[:15], 16) for g in grams}
    train = set()
    for doc_id, hs in sh.items():
        if _split_of(doc_id) == "train":
            train |= hs
    rows = QUERIES["x130_eval_contamination"].fn(spark, SF_DIR).collect()
    test_ids = {d for d in sh if _split_of(d) == "test"}
    assert {r["doc_id"] for r in rows} == test_ids
    n_contam = 0
    for r in rows:
        hs = sh[r["doc_id"]]
        bad = len(hs & train)
        assert r["n_shingles"] == len(hs)
        assert r["n_contaminated"] == bad
        expect_frac = round(bad / len(hs), 6) if hs else 0.0
        assert r["contaminated_frac"] == expect_frac
        assert r["is_contaminated"] == (bad > 0)
        n_contam += bad > 0
    assert n_contam >= 1  # the corpus's planted near-dups do leak


# --------------------------------------------------------------- x131 --


def test_cusum_matches_python_bigints(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    o = table(spark, SF_DIR, "orders").select("o_orderdate", "o_totalprice")
    pdf = o.toPandas()
    cents = (pdf["o_totalprice"] * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"day": pd.to_datetime(pdf["o_orderdate"]), "x": cents})
        .groupby("day", sort=True)["x"]
        .sum()
    )
    xs = [int(v) for v in daily.to_list()]
    n, s = len(xs), sum(xs)
    devs, p = [], 0
    for t, x in enumerate(xs, start=1):
        p += x
        devs.append(n * p - t * s)
    mdev = max(abs(d) for d in devs)
    expect = {
        d.strftime("%Y-%m-%d"): (int(x), dev, abs(dev) == mdev)
        for d, x, dev in zip(daily.index, xs, devs)
    }
    rows = QUERIES["x131_cusum_changepoint"].fn(spark, SF_DIR).collect()
    assert len(rows) == len(expect)
    for r in rows:
        x, dev, flag = expect[r["day"]]
        assert (r["revenue_cents"], r["cusum_n"], r["is_changepoint"]) == (
            x,
            dev,
            flag,
        )
    assert sum(r["is_changepoint"] for r in rows) >= 1


# --------------------------------------------------------------- x132 --


def test_ring_negatives_match_bisect_walk(spark):
    from gwasdb_spark.plans import QUERIES

    pdf = _docs(spark)
    ids = [int(d) for d in pdf["doc_id"]]
    ring = sorted((_md5hex(str(d))[:15], f"{d:019d}") for d in ids)
    expect = {}
    for a in ids:
        for j in range(4):
            p = _md5hex(f"{a}:{j}")[:15]
            # successor: first ring position strictly greater, wrapping
            i = bisect.bisect_right([r[0] for r in ring], p)
            neg = int(ring[i % len(ring)][1])
            if neg != a:
                expect[(a, j)] = neg
    rows = QUERIES["x132_ring_negatives"].fn(spark, SF_DIR).collect()
    got = {(r["anchor"], r["neg_slot"]): r["neg_id"] for r in rows}
    assert got == expect
    # self-hits exist in principle but are rare; dropped rows ≤ a handful
    assert len(ids) * 4 - len(got) <= 5
    # consistency property: the sampler never returns the anchor
    assert all(neg != a for (a, _), neg in got.items())
    # spread: negatives are not degenerate (many distinct negatives drawn)
    assert len(set(got.values())) > len(ids) // 4


def test_ring_negatives_stable_under_growth(spark):
    """Consistent-hashing property: adding one new doc to the ring only
    reassigns probes whose successor becomes the new doc — every other
    (anchor, slot) keeps its negative."""
    from pyspark.sql import functions as F

    from gwasdb_spark.plans import QUERIES

    base = QUERIES["x132_ring_negatives"].fn(spark, SF_DIR)
    got = {
        (r["anchor"], r["neg_slot"]): r["neg_id"] for r in base.collect()
    }
    # simulate growth in python (the op itself is a pure function of the
    # id set, so the python walk IS the grown-corpus result)
    pdf = _docs(spark)
    ids = [int(d) for d in pdf["doc_id"]]
    new_id = max(ids) + 1
    grown = ids + [new_id]
    ring = sorted((_md5hex(str(d))[:15], f"{d:019d}") for d in grown)
    rpos = [r[0] for r in ring]
    moved = 0
    for (a, j), neg in got.items():
        p = _md5hex(f"{a}:{j}")[:15]
        i = bisect.bisect_right(rpos, p)
        neg2 = int(ring[i % len(ring)][1])
        if neg2 != neg:
            assert neg2 == new_id  # the only legal reassignment target
            moved += 1
    assert moved <= math.ceil(4 * len(grown) / len(grown))  # ~k probes


# ---------------------------------------------------------------- e08 --


def test_burstiness_matches_python_moments(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    e = (
        table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "ts")
        .toPandas()
    )
    e = e.sort_values(["user_id", "ts", "event_id"])
    expect = {}
    for uid, grp in e.groupby("user_id"):
        secs = (grp["ts"].astype("int64") // 1_000_000_000).to_list()
        gaps = [b - a for a, b in zip(secs, secs[1:])]
        m = len(gaps)
        if m < 2:
            continue
        sx = sum(gaps)
        sxx = sum(g * g for g in gaps)
        disc = math.sqrt(m * sxx - sx * sx)
        expect[uid] = (
            m,
            round(sx / m, 9),
            round((disc - sx) / (disc + sx), 9),
        )
    rows = QUERIES["e08_interevent_burstiness"].fn(spark, SF_DIR).collect()
    assert {r["user_id"] for r in rows} == set(expect)
    for r in rows:
        m, mean, b = expect[r["user_id"]]
        assert r["n_gaps"] == m
        assert abs(r["mean_gap_s"] - mean) < 1e-8
        assert abs(r["burstiness"] - b) < 1e-8
        assert -1.0 <= r["burstiness"] <= 1.0


# --------------------------------------------------------------- x134 --


def test_good_turing_matches_python_counter(spark):
    from collections import Counter

    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    pdf = (
        table(spark, SF_DIR, "documents")
        .select("source", "text")
        .toPandas()
    )
    per_source = defaultdict(Counter)
    for src, text in zip(pdf["source"], pdf["text"]):
        for w in re.split(r"[^a-z0-9]+", text.strip().lower()):
            if w:
                per_source[src][int(_md5hex(w)[:15], 16)] += 1
    rows = QUERIES["x134_good_turing"].fn(spark, SF_DIR).collect()
    assert {r["source"] for r in rows} == set(per_source)
    for r in rows:
        c = per_source[r["source"]]
        n = sum(c.values())
        f1 = sum(1 for v in c.values() if v == 1)
        f2 = sum(1 for v in c.values() if v == 2)
        assert (r["n_tokens"], r["n_types"], r["f1"], r["f2"]) == (
            n,
            len(c),
            f1,
            f2,
        )
        assert r["unseen_mass"] == f1 / n
        assert 0.0 <= r["unseen_mass"] <= 1.0


# --------------------------------------------------------------- x135 --


def _dominates(a, b, dirs):
    ge = all(
        (x >= y) if d == "max" else (x <= y) for x, y, d in zip(a, b, dirs)
    )
    gt = any(
        (x > y) if d == "max" else (x < y) for x, y, d in zip(a, b, dirs)
    )
    return ge and gt


def test_skyline_hand_fixtures(spark):
    from gwasdb_spark.operators.skyline import skyline

    rows = [
        (1, 10.0, 5),   # frontier
        (2, 10.0, 5),   # exact tie of 1 -> BOTH kept
        (3, 9.0, 3),    # frontier (shorter)
        (4, 9.0, 7),    # dominated by 1 (lower score, longer)
        (5, 11.0, 9),   # frontier (best score)
        (6, 8.0, 3),    # dominated by 3 (same length, lower score)
        (7, 7.0, 1),    # frontier (shortest)
    ]
    df = spark.createDataFrame(rows, "id long, q double, len long")
    got = sorted(
        r["id"]
        for r in skyline(df, [("q", "max"), ("len", "min")]).collect()
    )
    assert got == [1, 2, 3, 5, 7]
    # single row is always its own frontier
    one = spark.createDataFrame(rows[:1], "id long, q double, len long")
    assert [r["id"] for r in skyline(one, [("q", "max"), ("len", "min")]).collect()] == [1]
    # bad direction rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        skyline(df, [("q", "best")])


def test_skyline_matches_bruteforce_and_stays_parallel(spark):
    from gwasdb_spark.plans import QUERIES

    q = QUERIES["x135_skyline_docs"].fn(spark, SF_DIR)
    # plan guard: two Arrow kernels with a real exchange between them —
    # coalesce(1) would fuse phase 1 into the single final task
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 2
    assert "Exchange" in plan
    # brute-force dominance over the full dim table
    from gwasdb_spark.catalog import table
    from gwasdb_spark.functions.text import (
        quality_classifier_prob,
        stopword_ratio,
    )
    from pyspark.sql import functions as F

    dims = (
        table(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            F.round(quality_classifier_prob(F.col("text")), 9).alias("q"),
            F.length("text").cast("long").alias("len"),
            stopword_ratio(F.col("text")).alias("sw"),
        )
        .collect()
    )
    pts = {r["doc_id"]: (r["q"], r["len"], r["sw"]) for r in dims}
    dirs = ("max", "min", "max")
    expect = {
        i
        for i, a in pts.items()
        if not any(
            _dominates(b, a, dirs) for j, b in pts.items() if j != i
        )
    }
    got = {r["doc_id"] for r in q.collect()}
    assert got == expect and len(got) > 0


# ---------------------------------------------------------------- e09 --


def test_markov_stationary_matches_python_power(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    e = (
        table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    from collections import Counter

    cells = Counter()
    for _, grp in e.groupby("user_id"):
        types = grp["event_type"].to_list()
        for a, b in zip(types, types[1:]):
            cells[(a, b)] += 1
    states = sorted({a for a, _ in cells} | {b for _, b in cells})
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    P = [[0.0] * n for _ in range(n)]
    for (a, b), c in cells.items():
        P[idx[a]][idx[b]] = c
    for row in P:
        tot = sum(row)
        if tot == 0.0:  # dst-only state: uniform dangling row
            for j in range(n):
                row[j] = 1.0 / n
        else:
            for j in range(n):
                row[j] /= tot
    pi = [1.0 / n] * n
    for _ in range(20):
        pi = [
            0.05 / n + 0.95 * sum(pi[i] * P[i][j] for i in range(n))
            for j in range(n)
        ]
    rows = QUERIES["e09_markov_stationary"].fn(spark, SF_DIR).collect()
    assert {r["event_type"] for r in rows} == set(states)
    for r in rows:
        assert abs(r["stationary_p"] - pi[idx[r["event_type"]]]) < 1e-8
    # a damped distribution over the full state set sums to ~1
    assert abs(sum(r["stationary_p"] for r in rows) - 1.0) < 1e-6


def test_markov_stationary_terminal_and_entry_only_states(spark, tmp_path):
    """Engine-vs-oracle parity on the corpus shape the sf tables never
    exercise: 'churn' occurs ONLY as a destination (terminal state,
    dangling row) and 'landing' ONLY as a source (entry state, no
    incoming mass). Both engines must emit the full src∪dst state set
    with no silent mass renormalization (r7 ADVICE item)."""
    import duckdb
    import pandas as pd

    from gwasdb_spark.plans import QUERIES

    # landing -> view -> click -> churn ; landing -> view ; view -> click
    rows = []
    seqs = [
        ("u1", ["landing", "view", "click", "churn"]),
        ("u2", ["landing", "view"]),
        ("u3", ["view", "click", "churn"]),
        ("u4", ["view", "click"]),
    ]
    eid = 0
    for uid, types in seqs:
        for i, t in enumerate(types):
            rows.append(
                {
                    "user_id": uid,
                    "event_id": eid,
                    "event_type": t,
                    "ts": pd.Timestamp("2026-01-01") + pd.Timedelta(minutes=i),
                }
            )
            eid += 1
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet")

    got = {
        r["event_type"]: r["stationary_p"]
        for r in QUERIES["e09_markov_stationary"].fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'events.parquet'}')"
    )
    want = {
        t: p for t, p in con.execute(
            QUERIES["e09_markov_stationary"].oracle
        ).fetchall()
    }
    assert set(got) == set(want) == {"landing", "view", "click", "churn"}
    for t in want:
        assert abs(got[t] - want[t]) < 1e-9, (t, got[t], want[t])
    # full damped chain conserves mass; landing (entry-only) stays in
    # the output with positive mass (teleport + churn's uniform
    # dangling inflow)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    assert got["landing"] > 0.0


# --------------------------------------------------------------- x137 --


def test_conformal_matches_python_and_covers(spark):
    import math as _math

    from gwasdb_spark.catalog import table
    from gwasdb_spark.functions.text import quality_classifier_prob
    from gwasdb_spark.plans import QUERIES
    from pyspark.sql import functions as F

    pdf = (
        table(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            "lang",
            F.round(quality_classifier_prob(F.col("text")), 9).alias("score"),
        )
        .toPandas()
    )
    pdf["split"] = pdf["doc_id"].map(_split_of)
    pdf["a"] = 1.0 - pdf["score"]
    cal = pdf[(pdf["split"] == "val") & (pdf["lang"] == "en")].sort_values(
        ["a", "doc_id"]
    )
    k = _math.ceil((len(cal) + 1) * 0.9)
    qhat = cal["a"].iloc[k - 1]
    rows = QUERIES["x137_conformal_coverage"].fn(spark, SF_DIR).collect()
    test = pdf[pdf["split"] == "test"].set_index("doc_id")
    assert len(rows) == len(test)
    covered = n_en = 0
    for r in rows:
        t = test.loc[r["doc_id"]]
        assert r["is_en"] == int(t["lang"] == "en")
        assert r["score"] == t["score"]
        assert r["in_set"] == (t["a"] <= qhat)
        if r["is_en"]:
            n_en += 1
            covered += r["in_set"]
    # the distribution-free guarantee: >=90% of true-en test docs are
    # in-set in expectation; allow finite-sample slack
    assert n_en > 0 and covered / n_en >= 0.8


# ---------------------------------------------------------------- e10 --


def test_ushape_attribution_matches_python(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    e = (
        table(spark, SF_DIR, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .toPandas()
    )
    purchases = e[e["event_type"] == "purchase"]
    touches = e[e["event_type"].isin(["view", "click"])]
    expect = {}
    for _, p in purchases.iterrows():
        lo = p["ts"] - pd.Timedelta(days=7)
        path = touches[
            (touches["user_id"] == p["user_id"])
            & (touches["ts"] < p["ts"])
            & (touches["ts"] >= lo)
        ].sort_values(["ts", "event_id"])
        n = len(path)
        for pos, (_, t) in enumerate(path.iterrows(), start=1):
            if n == 1:
                c = 1.0
            elif n == 2:
                c = 0.5
            elif pos in (1, n):
                c = 0.4
            else:
                c = 0.2 / (n - 2)
            expect[(p["event_id"], t["event_id"])] = (
                t["event_type"],
                pos,
                n,
                c,
            )
    rows = QUERIES["e10_ushape_attribution"].fn(spark, SF_DIR).collect()
    got = {
        (r["purchase_id"], r["touch_id"]): (
            r["channel"],
            r["pos"],
            r["n_touches"],
            r["credit"],
        )
        for r in rows
    }
    assert set(got) == set(expect)
    for k, (ch, pos, n, c) in expect.items():
        gch, gpos, gn, gc = got[k]
        assert (gch, gpos, gn) == (ch, pos, n)
        assert abs(gc - c) < 1e-12
    # per-purchase credits sum to exactly 1 (up to the middle division)
    from collections import defaultdict as _dd

    per_p = _dd(float)
    for (pid, _), (_, _, _, c) in expect.items():
        per_p[pid] += c
    assert per_p and all(abs(v - 1.0) < 1e-9 for v in per_p.values())


# --------------------------------------------------------------- x138 --


def test_length_controlled_quality_matches_pandas(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.functions.text import quality_classifier_prob
    from gwasdb_spark.plans import QUERIES
    from pyspark.sql import functions as F

    pdf = (
        table(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            "source",
            F.length("text").cast("long").alias("len"),
            F.round(quality_classifier_prob(F.col("text")), 9).alias("score"),
        )
        .toPandas()
        .sort_values(["len", "doc_id"])
        .reset_index(drop=True)
    )
    # SQL NTILE semantics: first (N % 10) tiles get one extra row
    N = len(pdf)
    q, m = divmod(N, 10)
    sizes = [q + 1] * m + [q] * (10 - m)
    tiles = []
    for t, sz in enumerate(sizes, start=1):
        tiles += [t] * sz
    pdf["tile"] = tiles
    expect = {}
    for (t, src), grp in pdf.groupby(["tile", "source"]):
        s9 = (grp["score"] * 1e9).round().astype("int64")
        expect[(t, src)] = (len(grp), int(s9.sum()) / (len(grp) * 1e9))
    rows = QUERIES["x138_length_controlled_quality"].fn(spark, SF_DIR).collect()
    got = {
        (r["len_decile"], r["source"]): (r["n_docs"], r["mean_quality"])
        for r in rows
    }
    assert set(got) == set(expect)
    for k, (n, mq) in expect.items():
        assert got[k][0] == n
        assert got[k][1] == mq  # exact integer ratio — equality, not approx


def test_skyline_rejects_int_dims_beyond_2_53(spark):
    """Integer dims above float64's exact range must fail fast, not
    silently compare equal (r7 ADVICE item)."""
    import pytest

    from gwasdb_spark.operators.skyline import skyline

    big = 2**53 + 1
    df = spark.createDataFrame(
        [(1, big, 1.0), (2, big + 1, 2.0)], "id long, a long, b double"
    )
    with pytest.raises(Exception, match="2\\^53"):
        skyline(df, [("a", "max"), ("b", "max")]).collect()
    # in-range int64 dims still work
    ok = skyline(
        spark.createDataFrame(
            [(1, 10, 1.0), (2, 5, 2.0), (3, 4, 1.5)],
            "id long, a long, b double",
        ),
        [("a", "max"), ("b", "max")],
    ).collect()
    assert sorted(r["id"] for r in ok) == [1, 2]
