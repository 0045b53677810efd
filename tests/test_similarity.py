"""Approximate operators vs their exact twins: the hash-bucketed scale
paths (MinHash-LSH, hyperplane-LSH ANN, embedding near-dup LSH) have no SQL
oracle — their correctness contract is recall against the exact operator."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from gwasdb_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    embedding_neardup_pairs_lsh,
    hyperplane_lsh_topk,
)
from gwasdb_spark.plans import QUERIES

from tests.conftest import SF_DIR


def test_minhash_lsh_recall_vs_exact_jaccard(spark):
    """Every pair with exact 3-gram Jaccard >= 0.5 must surface as an LSH
    candidate (8 bands x 4 rows: P(miss at j=0.5) = (1-0.5^4)^8 ≈ 0.6 per
    pair is too weak — but the corpus near-dups are j≈1.0 where P(miss) ≈
    (1-1)^8 = 0); estimates on found pairs within 0.25 of truth."""
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in QUERIES["x02_ngram_jaccard_pairs"].fn(spark, SF_DIR).collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in QUERIES["x03_minhash_lsh_pairs"].fn(spark, SF_DIR).collect()
    }
    strong = {p for p, j in exact.items() if j >= 0.9}
    assert strong, "fixture corpus should contain near-identical docs"
    found = strong & set(lsh)
    assert len(found) / len(strong) >= 0.95
    for p in set(lsh) & set(exact):
        assert abs(lsh[p] - exact[p]) <= 0.25


def test_ann_lsh_runs_on_random_corpus(spark):
    """On the random test corpus (max pair cosine ~0.5) hyperplane-LSH
    recall is necessarily low — the recall CONTRACT is tested on the
    injected near-dup corpus below. Here: the plumbing produces valid,
    deduplicated, ranked candidates."""
    approx = QUERIES["x05b_ann_lsh_topk"].fn(spark, SF_DIR).collect()
    seen = set()
    for r in approx:
        assert (r.query_id, r.neighbor_id) not in seen
        seen.add((r.query_id, r.neighbor_id))
        assert r.query_id != r.neighbor_id


def test_ann_lsh_recall_on_neardups(spark, neardup_corpus):
    """Each perturbed copy's true nearest neighbor (its base vector,
    cosine ≈ 0.99) must be retrieved: P(miss) per pair ≈ (1-0.955^8)^4 —
    ~0.4% at these parameters."""
    queries = neardup_corpus.filter(F.col("vec_id") >= 1000)
    res = hyperplane_lsh_topk(queries, neardup_corpus, k=5, dim=64).collect()
    found = {(r.query_id, r.neighbor_id) for r in res}
    hits = sum(1 for j in range(20) if (1000 + j, j) in found)
    assert hits >= 18


@pytest.fixture(scope="module")
def neardup_corpus(spark):
    """100 random unit vectors + 20 perturbed near-copies (cosine ≈ 0.99)."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((100, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for j in range(20):
        # noise norm ≈ 0.02·√64 = 0.16 → cosine ≈ 1/√(1+0.16²) ≈ 0.987
        v = base[j] + 0.02 * rng.standard_normal(64)
        v /= np.linalg.norm(v)
        rows.append((1000 + j, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_embedding_neardup_lsh_recall(spark, neardup_corpus):
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs(
            neardup_corpus, threshold=0.95
        ).collect()
    }
    assert len(exact) >= 20, "perturbed copies must be exact near-dups"
    approx = {
        (r.id_a, r.id_b)
        for r in embedding_neardup_pairs_lsh(
            neardup_corpus, threshold=0.95, dim=64, bands=8, bits_per_band=8
        ).collect()
    }
    # P(candidate at cos 0.95) = 1-(1-0.899^8)^8 ≈ 0.99 → a miss or two
    # among ~25 true pairs is within contract
    assert len(exact & approx) / len(exact) >= 0.85
    # no false positives below threshold by construction (exact re-score)
    assert approx <= exact


def test_brute_force_topk_self_exclusion(spark, neardup_corpus):
    res = brute_force_topk(neardup_corpus.limit(10), neardup_corpus, k=5).collect()
    assert all(r.query_id != r.neighbor_id for r in res)
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        ranks = sorted(x.rank for x in rows)
        assert ranks == list(range(1, len(rows) + 1))
        cosines = [x.cosine for x in sorted(rows, key=lambda x: x.rank)]
        assert cosines == sorted(cosines, reverse=True)


def test_hyperplane_lsh_subset_of_corpus(spark, neardup_corpus):
    res = hyperplane_lsh_topk(
        neardup_corpus.limit(5), neardup_corpus, k=5, dim=64
    ).collect()
    ids = {r[0] for r in neardup_corpus.select("vec_id").collect()}
    assert all(r.neighbor_id in ids for r in res)


def test_vectorized_topk_equals_expression_topk(spark, neardup_corpus):
    from gwasdb_spark.operators.similarity import brute_force_topk_vectorized

    q = neardup_corpus.filter(F.col("vec_id") < 10)
    a = brute_force_topk(q, neardup_corpus, "vec_id", "embedding", k=5).collect()
    b = brute_force_topk_vectorized(
        q, neardup_corpus, "vec_id", "embedding", k=5
    ).collect()
    ka = {(r.query_id, r.neighbor_id, r.rank, round(r.cosine, 6)) for r in a}
    kb = {(r.query_id, r.neighbor_id, r.rank, round(r.cosine, 6)) for r in b}
    assert ka == kb


def test_ivf_recall_on_neardups(spark, neardup_corpus):
    """IVF with nprobe=4/16 cells must find each perturbed copy's base
    vector: a near-identical pair lands in the same (or a probed) cell.
    With k-means centroids (vs the old first-n-by-id) a cosine-0.99 pair
    practically never splits across unprobed cells — recall is exact."""
    from gwasdb_spark.operators.similarity import ivf_topk

    queries = neardup_corpus.filter(F.col("vec_id") >= 1000)
    res = ivf_topk(queries, neardup_corpus, k=5, n_cells=16, nprobe=4).collect()
    found = {(r.query_id, r.neighbor_id) for r in res}
    hits = sum(1 for j in range(20) if (1000 + j, j) in found)
    assert hits >= 19
    # candidate volume bound: every query scored at most ~nprobe/n_cells of corpus
    assert all(r.rank <= 5 for r in res)


def test_ivf_probe_equals_one_shot_topk(spark, neardup_corpus):
    """The serving split (train once + assign once + ivf_probe) must be
    bit-identical to the one-shot ivf_topk at the same seed/params —
    the refactor guard for the faiss-shaped build/serve separation."""
    from gwasdb_spark.operators.similarity import (
        assign_cells,
        ivf_probe,
        ivf_topk,
        train_ivf_centroids,
    )

    queries = neardup_corpus.filter(F.col("vec_id") >= 1000)
    one_shot = ivf_topk(queries, neardup_corpus, k=5, n_cells=16, nprobe=4).collect()
    C = train_ivf_centroids(neardup_corpus, n_cells=16)
    assigned = assign_cells(neardup_corpus, C)
    served = ivf_probe(queries, assigned, C, k=5, nprobe=4).collect()
    ka = {(r.query_id, r.neighbor_id, r.rank, round(r.cosine, 9)) for r in one_shot}
    kb = {(r.query_id, r.neighbor_id, r.rank, round(r.cosine, 9)) for r in served}
    assert ka == kb


def test_ivf_probe_zero_vector_query(spark, neardup_corpus):
    """A zero query vector must not crash or NaN-argsort arbitrary probe
    cells: the driver-side norm guard picks deterministic cells, the
    query returns k rows with deterministic id-tiebroken ranks, and the
    cosines are null (similarity to a zero vector is undefined — Spark's
    x/0 → null — never NaN garbage)."""
    from gwasdb_spark.operators.similarity import (
        assign_cells,
        ivf_probe,
        train_ivf_centroids,
    )

    dim = len(neardup_corpus.select("embedding").first()[0])
    zq = spark.createDataFrame(
        [(999_999, [0.0] * dim)], "vec_id long, embedding array<double>"
    )
    C = train_ivf_centroids(neardup_corpus, n_cells=8)
    assigned = assign_cells(neardup_corpus, C)
    a = ivf_probe(zq, assigned, C, k=3, nprobe=2).collect()
    b = ivf_probe(zq, assigned, C, k=3, nprobe=2).collect()
    assert len(a) == 3
    assert [r.rank for r in a] == [1, 2, 3]
    assert all(r.cosine is None for r in a)
    # rerun-deterministic: same cells probed, same id-ordered neighbors
    assert [(r.neighbor_id, r.rank) for r in a] == [
        (r.neighbor_id, r.rank) for r in b
    ]


def test_ivf_kmeans_cell_occupancy(spark, neardup_corpus):
    """k-means centroids must produce non-degenerate cells: most cells
    populated and no single cell swallowing the corpus (the failure mode
    of arbitrary first-n centroids on clustered data)."""
    from gwasdb_spark.operators.similarity import assign_cells, train_ivf_centroids

    n_cells = 16
    C = train_ivf_centroids(neardup_corpus, n_cells=n_cells)
    assert C.shape[0] == n_cells
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)
    occ = (
        assign_cells(neardup_corpus, C)
        .groupBy("cell")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in occ)
    assert len(occ) >= n_cells // 2, f"only {len(occ)} of {n_cells} cells populated"
    assert max(r["count"] for r in occ) <= 0.5 * total, "one cell dominates"


@pytest.fixture(scope="module")
def midsim_corpus(spark):
    """100 random unit vectors + 20 moderately-perturbed copies
    (cosine ≈ 0.78) — the regime where single-probe LSH recall sags and
    multi-probe is supposed to recover it."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((100, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    for j in range(20):
        # noise norm ≈ 0.1·√64 = 0.8 → cosine ≈ 1/√(1+0.64) ≈ 0.78
        v = base[j] + 0.1 * rng.standard_normal(64)
        v /= np.linalg.norm(v)
        rows.append((1000 + j, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_multiprobe_lifts_midsim_recall(spark, midsim_corpus):
    """Probing the 1-bit-flip neighbor buckets must retrieve at least as
    many true nearest neighbors as single-probe at the same band
    parameters, and must meet a recall bar single-probe is not held to."""
    queries = midsim_corpus.filter(F.col("vec_id") >= 1000)

    def recall(multiprobe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in hyperplane_lsh_topk(
                queries, midsim_corpus, k=5,
                dim=64, bands=4, bits_per_band=8, multiprobe=multiprobe,
            ).collect()
        }
        return sum(1 for j in range(20) if (1000 + j, j) in got) / 20

    single, multi = recall(False), recall(True)
    assert multi >= single, (single, multi)
    assert multi >= 0.8, (single, multi)


def test_pq_rerank_recall_vs_exact(spark, neardup_corpus):
    """PQ shortlist + exact re-rank must recover (nearly) the exact
    top-5: ADC only has to land true neighbors inside the refine=30
    shortlist; the re-rank then orders them exactly."""
    from gwasdb_spark.operators.similarity import brute_force_topk, pq_topk

    queries = neardup_corpus.filter(F.col("vec_id") < 4)
    exact = brute_force_topk(queries, neardup_corpus, k=5).collect()
    approx = pq_topk(
        queries, neardup_corpus, k=5, m=8, nbits=4, refine=30
    ).collect()

    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    hits = sum(
        len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets
    )
    total = sum(len(v) for v in exact_sets.values())
    assert hits / total >= 0.9

    # reported cosines are EXACT (re-rank contract): spot-check one pair
    by_pair = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in approx}
    exact_pair = {(r["query_id"], r["neighbor_id"]): r["cosine"] for r in exact}
    common = set(by_pair) & set(exact_pair)
    assert common
    for p in common:
        assert by_pair[p] == pytest.approx(exact_pair[p], abs=1e-9)


def test_pq_deterministic(spark, neardup_corpus):
    from gwasdb_spark.operators.similarity import pq_topk

    queries = neardup_corpus.filter(F.col("vec_id") < 2)
    a = [tuple(r) for r in pq_topk(queries, neardup_corpus, k=5, refine=30).collect()]
    b = [tuple(r) for r in pq_topk(queries, neardup_corpus, k=5, refine=30).collect()]
    assert a == b


def test_filtered_topk_respects_segment(spark):
    from gwasdb_spark.operators.similarity import filtered_topk

    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.9, 0.1], "a"),
        (2, [1.0, 0.01], "b"),   # closest overall but wrong segment
        (3, [0.0, 1.0], "a"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, seg string")
    q = df.filter("vec_id = 0")
    got = filtered_topk(q, df, "seg", "vec_id", "embedding", k=2).collect()
    ids = [r.neighbor_id for r in got]
    assert ids == [1, 3]          # 2 excluded despite higher cosine
    assert all(r.fkey == "a" for r in got)


def test_mutual_knn_graph_prunes_nonreciprocal_edges(spark):
    from gwasdb_spark.operators.similarity import mutual_knn_graph

    # Two tight pairs on distinct axes plus one hub-ish outlier. With
    # k=1: 1<->2 are each other's nearest; 3<->4 likewise; 5 points at 1
    # but 1 points at 2 -> the 5->1 edge must NOT survive symmetrization.
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.99, 0.1, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.99, 0.1]),
        (5, [0.9, 0.0, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    edges = {
        (r["id_a"], r["id_b"]): r
        for r in mutual_knn_graph(df, k=1).collect()
    }
    assert set(edges) == {(1, 2), (3, 4)}
    assert all(r["rank_ab"] == 1 and r["rank_ba"] == 1 for r in edges.values())

    # With k=2 the 1<->5 edge becomes reciprocal (5 is 1's 2nd neighbor).
    edges2 = {
        (r["id_a"], r["id_b"]) for r in mutual_knn_graph(df, k=2).collect()
    }
    assert (1, 5) in edges2 and (1, 2) in edges2
