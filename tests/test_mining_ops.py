"""Independent python rederivations for the round-8 mining surface
(plans/mining_ops.py): BPE merge learning vs a pure-Counter trainer,
top-3-paths vs a per-user zip walk, ROUGE-1 vs multiset intersection,
and rolling quantiles vs numpy interpolation — different algorithm
shapes than both the Spark plans and the DuckDB oracles."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR


def _docs(spark):
    from gwasdb_spark.catalog import table

    return table(spark, SF_DIR, "documents").select("doc_id", "text").toPandas()


# --------------------------------------------------------------- x140 --


def _python_bpe(texts, k=20):
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                vocab[w] += 1
    syms = {w: tuple(list(w) + ["</w>"]) for w in vocab}
    merges = []
    for rank in range(1, k + 1):
        pc = Counter()
        for w, f in vocab.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                pc[(a, b)] += f
        if not pc:
            break
        # max freq, ties lexicographic on (left, right)
        (left, right), freq = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, left + right, freq))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges


def test_bpe_learn_matches_python(spark):
    from gwasdb_spark.plans import QUERIES

    pdf = _docs(spark)
    expect = _python_bpe(pdf["text"].to_list(), k=20)
    rows = QUERIES["x140_bpe_learn"].fn(spark, SF_DIR).collect()
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in sorted(rows, key=lambda r: r["rank"])
    ]
    assert got == expect  # exact — every rank, symbol, and count
    # merge ranks are strictly decreasing-or-equal in frequency only
    # within ties; the defining invariant is monotone niche: each
    # merge's pair_freq is the max over the state its rank saw, so the
    # sequence needs no global monotonicity — but ranks must be 1..20
    assert [g[0] for g in got] == list(range(1, 21))


# ---------------------------------------------------------------- e11 --


def test_top_paths_matches_python(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    e = (
        table(spark, SF_DIR, "events")
        .select("user_id", "event_id", "event_type", "ts")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    paths = Counter()
    for _, grp in e.groupby("user_id"):
        t = grp["event_type"].to_list()
        for a, b, c in zip(t, t[1:], t[2:]):
            paths[f"{a}>{b}>{c}"] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = QUERIES["e11_top_paths"].fn(spark, SF_DIR).collect()
    assert [(r["path"], r["n_paths"]) for r in rows] == expect


# --------------------------------------------------------------- x139 --


def test_rouge_overlap_matches_python(spark):
    from gwasdb_spark.operators.dedup import ngram_jaccard_pairs
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    pdf = _docs(spark)
    toks = {
        r.doc_id: Counter(w for w in re.split(r"\s+", r.text.strip()))
        for r in pdf.itertuples()
    }
    d = table(spark, SF_DIR, "documents")
    pair_rows = ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.12, max_shingle_docs=100
    ).collect()
    expect = {}
    for p in pair_rows:
        ca, cb = toks[p["id_a"]], toks[p["id_b"]]
        ov = sum((ca & cb).values())
        na, nb = sum(ca.values()), sum(cb.values())
        expect[(p["id_a"], p["id_b"])] = (ov, round(2.0 * ov / (na + nb), 9))
    rows = QUERIES["x139_rouge_overlap"].fn(spark, SF_DIR).collect()
    got = {
        (r["id_a"], r["id_b"]): (r["n_overlap"], r["rouge1_f1"]) for r in rows
    }
    # pairs with zero token overlap drop out of the inner join in both
    # engines; every surviving pair must match exactly
    assert set(got) == {k for k, v in expect.items() if v[0] > 0}
    for k, v in got.items():
        assert v[0] == expect[k][0]
        assert abs(v[1] - expect[k][1]) < 1e-9
    assert len(got) >= 1  # the planted near-dups overlap


# ---------------------------------------------------------------- w11 --


def test_rolling_median_matches_numpy(spark):
    from gwasdb_spark.catalog import table
    from gwasdb_spark.plans import QUERIES

    o = table(spark, SF_DIR, "orders").select(
        "o_orderdate", "o_totalprice"
    ).toPandas()
    cents = (o["o_totalprice"] * 100).round().astype("int64")
    daily = (
        pd.DataFrame({"day": pd.to_datetime(o["o_orderdate"]), "x": cents})
        .groupby("day", sort=True)["x"]
        .sum()
        .astype("float64")
    )
    xs = daily.to_numpy()
    expect = {}
    for i, day in enumerate(daily.index):
        w = xs[max(0, i - 6) : i + 1]
        expect[day.strftime("%Y-%m-%d")] = (
            int(xs[i]),
            round(float(np.quantile(w, 0.5)), 6),  # linear interpolation
            round(float(np.quantile(w, 0.9)), 6),
        )
    rows = QUERIES["w11_rolling_median"].fn(spark, SF_DIR).collect()
    assert len(rows) == len(expect)
    for r in rows:
        x, med, p90 = expect[r["day"]]
        assert r["revenue_cents"] == x
        assert abs(r["med7"] - med) < 1e-6
        assert abs(r["p90_7"] - p90) < 1e-6
