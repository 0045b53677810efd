"""Parity and edge-case contracts for the evaluation operators
(plans/eval_ops.py): AUC rank algebra vs an independent numpy
implementation and hand fixtures, BFS vs hand graphs, Gini vs the numpy
identity, the Poisson bootstrap vs a pure-python rederivation of the
content-addressed weights, and transition entropy vs pandas."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ---------------------------------------------------------------- AUC --


def _numpy_auc(score: np.ndarray, pos: np.ndarray) -> tuple[int, int, float]:
    """Independent tie-corrected Mann-Whitney AUC: integer rank sums."""
    order = np.lexsort((np.arange(len(score)), score))
    s = score[order]
    p = pos[order].astype(np.int64)
    rk = np.arange(1, len(s) + 1, dtype=np.int64)
    # group boundaries of equal scores
    new = np.concatenate(([True], s[1:] != s[:-1]))
    # min/max rank per tie group (rk is sorted: first/last index per group)
    first = np.flatnonzero(new)
    last = np.concatenate((first[1:] - 1, [len(s) - 1]))
    mn = rk[first]
    mx = rk[last]
    npos_g = np.add.reduceat(p, first)
    numer2 = int(np.sum(npos_g * (mn + mx)))
    n_pos = int(p.sum())
    n_neg = len(s) - n_pos
    auc = (numer2 - n_pos * (n_pos + 1)) / (2 * n_pos * n_neg)
    return n_pos, n_neg, auc


def test_auc_hand_fixtures(spark):
    from gwasdb_spark.operators.quality import mann_whitney_auc

    def run(rows):
        df = spark.createDataFrame(rows, "id long, score double, pos int")
        return mann_whitney_auc(df, "score", "pos", "id").collect()[0]

    # perfect separation -> 1.0
    r = run([(1, 0.1, 0), (2, 0.2, 0), (3, 0.8, 1), (4, 0.9, 1)])
    assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 2, 1.0)
    # perfectly wrong -> 0.0
    r = run([(1, 0.9, 0), (2, 0.8, 0), (3, 0.1, 1), (4, 0.2, 1)])
    assert r["auc"] == 0.0
    # all scores tied -> 0.5 exactly (tie correction)
    r = run([(1, 0.5, 0), (2, 0.5, 1), (3, 0.5, 0), (4, 0.5, 1)])
    assert r["auc"] == 0.5
    # single class -> NULL auc, not 0/1
    r = run([(1, 0.3, 1), (2, 0.7, 1)])
    assert r["auc"] is None and r["n_neg"] == 0


def test_auc_matches_numpy_on_corpus(spark):
    from gwasdb_spark.plans.eval_ops import _scored_docs

    pdf = _scored_docs(spark, SF_DIR).toPandas()
    n_pos, n_neg, auc = _numpy_auc(
        pdf["score"].to_numpy(), pdf["pos"].to_numpy()
    )
    from gwasdb_spark.plans import QUERIES

    row = QUERIES["x119_classifier_auc"].fn(spark, SF_DIR).collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (n_pos, n_neg)
    assert row["auc"] == auc  # both are exact-integer ratios


# ---------------------------------------------------------------- BFS --


def test_bfs_chain_hop_cap_and_min_distance(spark):
    from gwasdb_spark.operators.graph import bfs_distances

    # chain 0-1-2-3-4-5-6 plus a shortcut 0-3: seed {0}
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (0, 3)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(df, F.col("id") == 0, max_hops=4).collect()
    }
    # shortcut: 3 is 1 hop, so 6 reaches at hop 4; everything reached
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2, 5: 3, 6: 4}
    # hop cap actually binds on the pure chain
    df2 = spark.createDataFrame(edges[:6], "id_a long, id_b long")
    got2 = {
        r["id"]: r["dist"]
        for r in bfs_distances(df2, F.col("id") == 0, max_hops=4).collect()
    }
    assert got2 == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}  # 5,6 beyond budget


def test_bfs_disconnected_and_no_seed(spark):
    from gwasdb_spark.operators.graph import bfs_distances

    df = spark.createDataFrame(
        [(0, 1), (10, 11)], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["dist"]
        for r in bfs_distances(df, F.col("id") < 2, max_hops=4).collect()
    }
    assert got == {0: 0, 1: 0}  # the 10-11 component is never reached
    assert (
        bfs_distances(df, F.col("id") > 100, max_hops=4).count() == 0
    )  # no seeds -> empty, not an error


# --------------------------------------------------------------- Gini --


def test_lorenz_gini_matches_numpy(spark):
    from gwasdb_spark.plans import QUERIES

    rows = QUERIES["x122_lorenz_gini"].fn(spark, SF_DIR).collect()
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    x = np.sort(docs["n_chars"].to_numpy(np.int64))
    n, s = len(x), int(x.sum())
    rk = np.arange(1, n + 1, dtype=np.int64)
    gini = (2 * int(np.sum(rk * x))) / (n * s) - (n + 1) / n
    by_dec = sorted(rows, key=lambda r: r["decile"])
    assert [r["decile"] for r in by_dec] == list(range(1, 11))
    assert all(r["gini"] == gini for r in by_dec)
    # Lorenz invariants: cumulative, monotone, ends at exactly 1
    assert sum(r["n_docs"] for r in by_dec) == n
    assert by_dec[-1]["cum_chars"] == s and by_dec[-1]["cum_share"] == 1.0
    shares = [r["cum_share"] for r in by_dec]
    assert all(a <= b for a, b in zip(shares, shares[1:]))


# ---------------------------------------------------------- bootstrap --

_POISSON_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
    0.9999897508033253,
)


def _py_weight(doc_id: int, b: int) -> int:
    h = hashlib.md5(f"{doc_id}:{b}".encode()).hexdigest()[:8]
    u = int(h, 16) / 4294967296.0
    for k, c in enumerate(_POISSON_CDF):
        if u < c:
            return k
    return 8


def test_bootstrap_ci_matches_python_rederivation(spark):
    """The whole chain — md5 uniforms, Poisson inverse-CDF weights,
    exact replicate means, order-statistic CI — re-derived in pure
    python must agree BIT-EXACTLY (every division is the same pair of
    integers)."""
    from gwasdb_spark.plans import QUERIES

    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ids = docs["doc_id"].to_numpy(np.int64)
    chars = docs["n_chars"].to_numpy(np.int64)
    ests = []
    for b in range(200):
        w = np.fromiter(
            (_py_weight(int(i), b) for i in ids), dtype=np.int64, count=len(ids)
        )
        ests.append((int(np.sum(w * chars)) / int(np.sum(w)), b))
    ests.sort()
    lo, hi = ests[4][0], ests[195][0]
    row = QUERIES["x123_bootstrap_ci"].fn(spark, SF_DIR).collect()[0]
    assert row["n_docs"] == len(ids)
    assert row["mean_chars"] == int(chars.sum()) / len(ids)
    assert row["ci_lo"] == lo and row["ci_hi"] == hi
    # sanity: the interval brackets the point estimate
    assert lo <= row["mean_chars"] <= hi


# ---------------------------------------------------------- entropy --


def test_transition_entropy_matches_pandas(spark):
    from gwasdb_spark.plans import QUERIES

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"], kind="mergesort"
    )
    nxt = ev.groupby("user_id")["event_type"].shift(-1)
    t = (
        pd.DataFrame({"from_type": ev["event_type"], "to_type": nxt})
        .dropna()
        .groupby(["from_type", "to_type"])
        .size()
    )
    got = {
        r["from_type"]: r
        for r in QUERIES["e07_transition_entropy"].fn(spark, SF_DIR).collect()
    }
    for ft, grp in t.groupby(level=0):
        n_from = int(grp.sum())
        p = grp.to_numpy(np.float64) / n_from
        h = -float(np.sum(p * np.log(p)))
        r = got[ft]
        assert r["n_transitions"] == n_from
        assert r["n_next_types"] == len(grp)
        assert r["entropy_nats"] == pytest.approx(h, abs=1e-9)
        # entropy bounded by ln(branching factor)
        assert -1e-12 <= r["entropy_nats"] <= math.log(len(grp)) + 1e-9


# ------------------------------------------------------- calibration --


def test_calibration_matches_numpy(spark):
    from gwasdb_spark.plans import QUERIES
    from gwasdb_spark.plans.eval_ops import _scored_docs

    pdf = _scored_docs(spark, SF_DIR).toPandas()
    # HALF_UP like both engines (np.round is half-even — wrong here)
    s6 = np.floor(pdf["score"].to_numpy() * 1e6 + 0.5).astype(np.int64)
    pos = pdf["pos"].to_numpy(np.int64)
    bins = np.minimum(s6 // 100000, 9)
    rows = QUERIES["x120_calibration_report"].fn(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == len(pdf)
    for r in rows:
        m = bins == r["bin"]
        n = int(m.sum())
        assert r["n_docs"] == n and r["n_pos"] == int(pos[m].sum())
        assert r["mean_prob"] == int(s6[m].sum()) / (n * 1e6)
        err = s6[m] - pos[m] * 1000000
        assert r["brier"] == int(np.sum(err * err)) / (n * 1e12)
        # calibration gap is a probability-space quantity
        assert 0.0 <= r["mean_prob"] <= 1.0 and 0.0 <= r["frac_pos"] <= 1.0


# ------------------------------------------------------- plan shapes --


def test_e07_totals_ride_broadcast(spark):
    """e07's per-state totals (≤|event types| rows) must broadcast back
    onto the transition counts — a sort-merge join there would shuffle
    the |types|² relation for a handful of rows."""
    from gwasdb_spark.plans import QUERIES

    plan = (
        QUERIES["e07_transition_entropy"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_x120_is_scan_side_only(spark):
    """x120 must stay a single-scan projection + one 10-group aggregate:
    no joins, no windows — the whole point of integer-scaled bins."""
    from gwasdb_spark.plans import QUERIES

    plan = (
        QUERIES["x120_calibration_report"]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1
    for bad in ("Join", "Window "):
        assert bad not in plan, bad
