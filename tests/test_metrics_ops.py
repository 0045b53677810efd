"""Independent rederivations for the ranking/inference/series operators
(plans/metrics_ops.py): NDCG grade counts and IDCG from a pure-python
tokenizer, the PR sweep vs a pandas loop, Adamic-Adar vs a dict-of-sets
graph walk, the exact-integer ACF vs python's arbitrary-precision ints,
Benford literals vs math.log10, and Kaplan-Meier vs a sequential
product — each a different algorithm shape than the Spark plan AND the
DuckDB oracle, so agreement pins the algebra, not the SQL dialect."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import pandas as pd

from tests.conftest import SF_DIR

_TERMS = ("hash", "join", "vector")


def _docs(spark):
    from gwasdb_spark.catalog import table

    return table(spark, SF_DIR, "documents").select("doc_id", "text").toPandas()


# --------------------------------------------------------------- x124 --


def test_ndcg_grades_and_idcg_match_python(spark):
    from gwasdb_spark.plans import QUERIES

    pdf = _docs(spark)
    counts = {1: 0, 2: 0, 3: 0}
    rel_of = {}
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        toks = set(re.split(r"[^a-z0-9]+", text.strip().lower()))
        rel = len(toks & set(_TERMS))
        if rel > 0:
            counts[rel] += 1
            rel_of[doc_id] = rel
    row = QUERIES["x124_ndcg_at_10"].fn(spark, SF_DIR).collect()[0]
    assert (row["n_rel1"], row["n_rel2"], row["n_rel3"]) == (
        counts[1],
        counts[2],
        counts[3],
    )
    # IDCG depends only on the grade counts: best ranking stacks grade-3
    # docs first, then grade-2, then grade-1 into the 10 positions.
    gains = [7.0] * counts[3] + [3.0] * counts[2] + [1.0] * counts[1]
    idcg = sum(
        g * math.log(2) / math.log(r + 1)
        for r, g in enumerate(gains[:10], start=1)
    )
    assert row["idcg"] == round(idcg, 9)
    # DCG of the actual bm25 head, graded by the python relevance map.
    from gwasdb_spark.operators.search import bm25_topk
    from gwasdb_spark.catalog import table

    top = (
        bm25_topk(
            table(spark, SF_DIR, "documents"),
            list(_TERMS),
            "doc_id",
            "text",
            k=10,
        )
        .select("doc_id", "rank")
        .collect()
    )
    gain = {1: 1.0, 2: 3.0, 3: 7.0}
    dcg = sum(
        gain[rel_of[r["doc_id"]]] * math.log(2) / math.log(r["rank"] + 1)
        for r in top
        if r["doc_id"] in rel_of
    )
    assert row["dcg"] == round(dcg, 9)
    assert row["ndcg"] == round(row["dcg"] / row["idcg"], 9)
    assert 0.0 < row["ndcg"] <= 1.0


# --------------------------------------------------------------- x125 --


def test_pr_sweep_matches_pandas_loop(spark):
    from gwasdb_spark.plans import QUERIES
    from gwasdb_spark.plans.eval_ops import _scored_docs

    pdf = _scored_docs(spark, SF_DIR).toPandas()
    bins = pdf["score"].map(
        lambda s: min(int(round(s * 1_000_000)) // 100_000, 9)
    )
    pos = pdf["pos"].astype(int)
    p_all = int(pos.sum())
    got = {
        r["threshold"]: r
        for r in QUERIES["x125_pr_threshold_sweep"].fn(spark, SF_DIR).collect()
    }
    assert len(got) == 10
    for ti in range(10):
        mask = bins >= ti
        n_pred = int(mask.sum())
        tp = int(pos[mask].sum())
        r = got[ti / 10.0]
        assert (r["n_pred"], r["tp"]) == (n_pred, tp)
        assert r["prec"] == (tp / n_pred if n_pred else None)
        assert r["rec"] == tp / p_all
        assert r["f1"] == 2 * tp / (n_pred + p_all)
    # the sweep is monotone: predicted-positive count shrinks with t
    preds = [got[t / 10.0]["n_pred"] for t in range(10)]
    assert preds == sorted(preds, reverse=True)


# --------------------------------------------------------------- x126 --


def test_adamic_adar_matches_python_sets(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey")
    p = (
        table(spark, SF_DIR, "part")
        .filter("p_brand = 'Brand#12'")
        .select("p_partkey")
    )
    lp = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    baskets = defaultdict(set)
    for o, pk in zip(lp["l_orderkey"], lp["l_partkey"]):
        baskets[o].add(int(pk))
    adj = defaultdict(set)
    for items in baskets.values():
        s = sorted(items)
        for i, u in enumerate(s):
            for v in s[i + 1 :]:
                adj[u].add(v)
                adj[v].add(u)
    expect = {}
    for w, nbrs in adj.items():
        s = sorted(nbrs)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                if b not in adj[a]:
                    n, sc = expect.get((a, b), (0, 0.0))
                    expect[(a, b)] = (n + 1, sc + 1.0 / math.log(len(adj[w])))
    rows = QUERIES["x126_adamic_adar"].fn(spark, SF_DIR).collect()
    assert len(rows) == len(expect) > 0
    for r in rows:
        n, sc = expect[(r["id_a"], r["id_b"])]
        assert r["n_common"] == n
        assert abs(r["aa_score"] - sc) < 1e-8


# --------------------------------------------------------------- x127 --


def test_acf_matches_python_bigints(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    o = table(spark, SF_DIR, "orders").select("o_orderdate", "o_totalprice")
    pdf = o.toPandas()
    cents = (pdf["o_totalprice"] * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"day": pdf["o_orderdate"], "x": cents})
        .groupby("day", sort=True)["x"]
        .sum()
    )
    # python ints are arbitrary precision — the independent exact path
    xs = [int(v) for v in daily.to_list()]
    n, s, sxx = len(xs), sum(xs), sum(v * v for v in xs)
    got = {
        r["lag"]: r
        for r in QUERIES["x127_revenue_acf"].fn(spark, SF_DIR).collect()
    }
    assert len(got) == 10
    for k in range(1, 11):
        a, b = xs[:-k], xs[k:]
        m = len(a)
        sxy = sum(x * y for x, y in zip(a, b))
        num = n * n * sxy - n * s * (sum(a) + sum(b)) + m * s * s
        den = n * n * sxx - n * s * s
        assert got[k]["m"] == m
        assert got[k]["acf"] == round(float(num) / float(den), 9)
    # lag-0 sanity of the identity: num/den collapses to 1 by algebra
    assert abs(got[1]["acf"]) <= 1.0 + 1e-9


# --------------------------------------------------------------- x128 --


def test_benford_literals_and_counts_match_python(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES
    from gwasdb_spark.plans.metrics_ops import _BENFORD

    # the shared literals ARE log10(1 + 1/d) to the last double bit
    for d, lit in _BENFORD:
        assert float(lit) == math.log10(1 + 1 / d)
    pdf = table(spark, SF_DIR, "orders").select("o_totalprice").toPandas()
    digits = (
        (pdf["o_totalprice"] * 100)
        .round()
        .astype("int64")
        .astype(str)
        .str[0]
        .astype(int)
    )
    n = len(digits)
    counts = digits.value_counts().to_dict()
    rows = QUERIES["x128_benford_audit"].fn(spark, SF_DIR).collect()
    assert {r["digit"] for r in rows} == set(counts)
    for r in rows:
        n_obs = counts[r["digit"]]
        e = float(dict(_BENFORD)[r["digit"]])
        assert r["n_obs"] == n_obs
        assert r["obs_share"] == n_obs / n
        assert r["expected_share"] == round(e, 9)
        assert r["chi2_term"] == round((n_obs - n * e) ** 2 / (n * e), 9)


# --------------------------------------------------------------- x129 --


def test_kaplan_meier_matches_python_product(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    e = table(spark, SF_DIR, "events").select("user_id", "ts").toPandas()
    cut = e["ts"].max() - pd.Timedelta(hours=12)
    g = e.groupby("user_id")["ts"].agg(["min", "max"])
    t = (g["max"].dt.normalize() - g["min"].dt.normalize()).dt.days
    churn = (g["max"] <= cut).astype(int)
    per_t = pd.DataFrame({"t": t, "churn": churn}).groupby("t", sort=True)
    d_by_t = per_t["churn"].sum()
    leave_by_t = per_t["churn"].count()
    n_risk = len(g)
    surv, expect = 1.0, {}
    for ti in d_by_t.index:
        d = int(d_by_t[ti])
        if d > 0:
            surv *= 1.0 - d / n_risk
            expect[int(ti)] = (n_risk, d, round(surv, 9))
        n_risk -= int(leave_by_t[ti])
    rows = QUERIES["x129_kaplan_meier"].fn(spark, SF_DIR).collect()
    assert len(rows) == len(expect) > 0
    for r in rows:
        n_at, d, s = expect[r["t_days"]]
        assert (r["n_at_risk"], r["d_churn"]) == (n_at, d)
        assert abs(r["survival"] - s) < 1e-8
    # survival is a non-increasing curve in (0, 1]
    vals = [r["survival"] for r in sorted(rows, key=lambda r: r["t_days"])]
    assert vals == sorted(vals, reverse=True) and all(
        0.0 <= v <= 1.0 for v in vals
    )
