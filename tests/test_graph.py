"""Connected-components correctness vs a driver-side union-find oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from gwasdb_spark.operators.dedup import ngram_jaccard_pairs
from gwasdb_spark.operators.graph import connected_components, dedup_keep_representative

from tests.conftest import SF_DIR, slow_gate


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_connected_components_matches_union_find(spark):
    pairs_df = spark.createDataFrame(
        # two chains (1-2-3, 10-11), a triangle (20,21,22), a singleton pair
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22), (30, 31)],
        "id_a long, id_b long",
    )
    got = {r.id: r.component for r in connected_components(pairs_df).collect()}
    want = _union_find([(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22), (30, 31)])
    assert got == want
    assert got[3] == 1  # transitive chain collapses to min id


def test_components_on_real_pairs(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs_df = ngram_jaccard_pairs(d, "doc_id", "text", threshold=0.12)
    pairs = [(r.id_a, r.id_b) for r in pairs_df.collect()]
    got = {r.id: r.component for r in connected_components(pairs_df).collect()}
    assert got == _union_find(pairs)


def test_dedup_keep_representative_transitive(spark):
    df = spark.createDataFrame([(i, f"d{i}") for i in [1, 2, 3, 9]], "id long, t string")
    # chain 1-2, 2-3: greedy one-hop keeps 1 and drops 2,3; rep-keep must too,
    # but via component labels (exact for arbitrary chain shapes)
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    kept = sorted(r.id for r in dedup_keep_representative(df, pairs, "id").collect())
    assert kept == [1, 9]


@slow_gate  # slow parity twin (VERDICT r13 #1): x93's oracle row covers label propagation; this is the union-find parity twin on synthetic shapes
def test_star_matches_labelprop_and_union_find_on_chain(spark):
    """The alternating star algorithm must reach the same fixpoint as both
    the label-prop formulation and the union-find oracle on a 40-node
    chain — the worst topology for label-prop — in strictly fewer rounds
    (O(log n) vs O(n))."""
    from gwasdb_spark.operators.graph import (
        connected_components_labelprop,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(100, 140)] + [(500, 501)]
    pairs = spark.createDataFrame(chain, "id_a long, id_b long")

    star_stats, lp_stats = {}, {}
    star = {
        r.id: r.component
        for r in connected_components_star(pairs, stats=star_stats).collect()
    }
    lp = {
        r.id: r.component
        for r in connected_components_labelprop(
            pairs, max_iter=60, stats=lp_stats
        ).collect()
    }
    want = _union_find(chain)
    assert star == want
    assert lp == want
    assert star_stats["iterations"] < lp_stats["iterations"], (star_stats, lp_stats)
    # 41-long chain: label-prop needs ~diameter rounds, star ~log
    assert star_stats["iterations"] <= 8, star_stats


def test_pagerank_matches_dense_power_iteration(spark):
    """PageRank vs a numpy dense power iteration on a small digraph with
    a dangling node (3 has no out-edges) — the distributed version must
    reproduce the full matrix computation including dangling-mass
    redistribution."""
    import numpy as np

    from gwasdb_spark.operators.graph import pagerank

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, max_iter=60, tol=1e-12).collect()}

    n, d = 4, 0.85
    M = np.zeros((n, n))
    for u, v in edges:
        M[v, u] += 1
    out = M.sum(axis=0)
    for u in range(n):
        if out[u] > 0:
            M[:, u] /= out[u]
    r = np.full(n, 1.0 / n)
    for _ in range(200):
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (M @ r + dangling / n)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-6, (i, got[i], r[i])


def test_pagerank_symmetric_graph_uniform(spark):
    from gwasdb_spark.operators.graph import pagerank

    # 3-cycle: symmetry forces uniform ranks
    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    got = [r.rank for r in pagerank(df, max_iter=40).collect()]
    assert all(abs(x - 1 / 3) < 1e-6 for x in got)


def test_triangle_counts_known_graph(spark):
    from gwasdb_spark.operators.graph import triangle_counts

    # K4 on 1-4 (every node in C(3,2)=3 triangles), a pendant 5-1 edge,
    # and an isolated edge 6-7 (zero triangles).
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (1, 5),
        (6, 7),
    ]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["id"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0, 6: 0, 7: 0}


def test_cc_driver_and_star_paths_agree(spark):
    from gwasdb_spark.operators.graph import connected_components

    # chain 1-2-3-4, pair 10-11, self-contained triangle 20-21-22
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    s1, s2 = {}, {}
    small = {
        r.id: r.component
        for r in connected_components(df, stats=s1).collect()
    }
    dist = {
        r.id: r.component
        for r in connected_components(
            df, stats=s2, small_graph_threshold=0
        ).collect()
    }
    assert s1["path"] == "driver-unionfind" and s2["path"] == "star"
    assert small == dist
    assert small == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                     20: 20, 21: 20, 22: 20}


def test_kcore_matches_definition(spark):
    """kcore on a hand graph: path 1-2-3-4 (2-core empty contribution),
    triangle 5-6-7, and a pendant 8 off the triangle. 2-core = {5,6,7};
    3-core of the 4-clique 10-13 = {10,11,12,13}."""
    from gwasdb_spark.operators.graph import kcore

    edges = [(1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7), (7, 8)]
    clique = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    df = spark.createDataFrame(edges + clique, "id_a long, id_b long")
    two = sorted(r.id for r in kcore(df, k=2).collect())
    assert two == [5, 6, 7, 10, 11, 12, 13]
    three = sorted(r.id for r in kcore(df, k=3).collect())
    assert three == [10, 11, 12, 13]
    assert kcore(df, k=5).count() == 0


def test_pagerank_driver_path_equals_distributed(spark):
    """Size-adaptive PageRank: numpy fast path and distributed rounds
    must agree to 9 dp on a directed graph WITH dangling nodes (4 has no
    out-edges — exercises the dangling-mass redistribution both paths)."""
    from gwasdb_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (1, 4), (5, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = {
        r.id: round(r.rank, 9)
        for r in pagerank(df, max_iter=20, tol=0.0).collect()
    }
    dist = {
        r.id: round(r.rank, 9)
        for r in pagerank(df, max_iter=20, tol=0.0, small_graph_threshold=0).collect()
    }
    assert fast == dist
    assert abs(sum(fast.values()) - 1.0) < 1e-6


def test_label_propagation_communities(spark):
    """Two triangles joined by one bridge edge: synchronized LPA (5
    rounds) must keep the two dense communities distinct while x11-style
    CC would merge them through the bridge."""
    from gwasdb_spark.operators.graph import (
        connected_components,
        label_propagation,
    )

    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(10, 11), (11, 12), (10, 12)]
    bridge = [(3, 10)]
    df = spark.createDataFrame(tri1 + tri2 + bridge, "id_a long, id_b long")
    labels = {r.id: r.label for r in label_propagation(df, rounds=5).collect()}
    assert len(set(labels.values())) >= 2  # communities stay separate
    assert labels[1] == labels[2] == labels[3]
    assert labels[11] == labels[12]
    comp = {r.id: r.component for r in connected_components(df).collect()}
    assert len(set(comp.values())) == 1  # CC merges through the bridge


def test_label_propagation_driver_path_equals_distributed(spark):
    """Size-adaptive LPA: the numpy fast path and the distributed rounds
    must be EXACTLY equal (integer counts, id tiebreaks — no float)."""
    from gwasdb_spark.operators.graph import label_propagation

    import random

    rng = random.Random(7)
    edges = list({(rng.randrange(40), rng.randrange(40)) for _ in range(120)})
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    fast = {r.id: r.label for r in label_propagation(df, rounds=5).collect()}
    dist = {
        r.id: r.label
        for r in label_propagation(
            df, rounds=5, small_graph_threshold=0
        ).collect()
    }
    assert fast == dist
