"""Independent-implementation parity for the round-7 operators: numpy /
plain-python references computed from the same inputs, so correctness
evidence doesn't rest on the SQL oracles alone (an oracle and a query can
share a misreading; a numpy reference can't share Spark's)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _rand_vecs(n: int, dim: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).normal(size=(n, dim)).astype(np.float32)


def test_int8_audit_matches_numpy(spark):
    from gwasdb_spark.operators.similarity import int8_quantization_audit

    v = _rand_vecs(200, 8, 7)
    df = spark.createDataFrame(
        [(row.tolist(),) for row in v], "embedding array<float>"
    )
    got = {r["dim"]: r for r in int8_quantization_audit(df).collect()}

    x = v.astype(np.float64)
    scale = np.abs(x).max(axis=0)
    q = np.round(x / scale * 127.0)
    err = np.abs(x - q * scale / 127.0)
    for d in range(8):
        assert got[d]["n_values"] == 200
        assert abs(got[d]["scale"] - scale[d]) < 1e-12
        assert abs(got[d]["mean_abs_err"] - err[:, d].mean()) < 1e-9
        assert abs(got[d]["max_abs_err"] - err[:, d].max()) < 1e-12


def test_centroid_profile_matches_numpy(spark):
    from gwasdb_spark.operators.similarity import nearest_centroid_profile

    v = _rand_vecs(150, 6, 11)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(v)],
        "vec_id long, embedding array<float>",
    )
    k = 4
    got = {
        r["centroid_id"]: r
        for r in nearest_centroid_profile(
            df, df.filter(F.col("vec_id") < k)
        ).collect()
    }

    x = v.astype(np.float64)
    c = x[:k]
    cos = (x @ c.T) / (
        np.linalg.norm(x, axis=1)[:, None] * np.linalg.norm(c, axis=1)[None, :]
    )
    cos9 = np.round(cos, 9)
    # argmax with the operator's tiebreak: highest cos9, lowest centroid id
    assign = np.array([int(np.argmax(row)) for row in cos9])
    for cid in range(k):
        members = cos9[assign == cid, cid]
        assert got[cid]["n_assigned"] == len(members)
        assert abs(got[cid]["avg_cosine"] - round(float(members.mean()), 6)) < 1e-9
        assert abs(got[cid]["min_cosine"] - round(float(members.min()), 6)) < 1e-9
    assert sum(r["n_assigned"] for r in got.values()) == 150


def test_source_overlap_matches_python_sets(spark):
    from gwasdb_spark.operators.dedup import source_overlap_matrix

    docs = [
        ("s1", "alpha beta gamma delta epsilon zeta"),
        ("s1", "one two three four five six seven"),
        ("s2", "alpha beta gamma delta other words here"),
        ("s2", "completely different content entirely"),
        ("s3", "one two three four five six seven"),
        ("s3", "alpha beta gamma delta epsilon zeta"),
    ]
    df = spark.createDataFrame(docs, "source string, text string")
    got = {
        (r["source_a"], r["source_b"]): (r["n_shared"], r["jaccard"])
        for r in source_overlap_matrix(df, "source", "text", n=3).collect()
    }

    def shingles(texts):
        out = set()
        for t in texts:
            w = t.split()
            out |= {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        return out

    sets = {}
    for s, t in docs:
        sets.setdefault(s, []).append(t)
    sets = {s: shingles(ts) for s, ts in sets.items()}
    keys = sorted(sets)
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in got
                continue
            union = len(sets[a] | sets[b])
            n, j = got[(a, b)]
            assert n == inter
            assert abs(j - inter / union) < 1e-12


def test_prs_matches_python_accumulate(spark, duck):
    """g15 on the real sf0.001 tables vs a plain-python accumulation over
    the same parquet rows (independent of both Spark and the oracle)."""
    import collections

    from gwasdb_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    got = {
        r["individual"]: (r["n_loci"], r["prs"])
        for r in QUERIES["g15_prs_score"].fn(spark, SF_DIR).collect()
    }

    rows = duck.execute(
        "SELECT o.o_custkey, l.l_discount, l.l_quantity "
        "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey"
    ).fetchall()
    acc: dict = collections.defaultdict(lambda: [0, 0])
    for cust, disc, qty in rows:
        beta_c = round((float(disc) - 0.05) * 100)
        dosage = int(qty) % 3
        acc[cust][0] += 1
        acc[cust][1] += beta_c * dosage
    assert len(got) == len(acc)
    for cust, (n, cents_sum) in acc.items():
        assert got[cust] == (n, cents_sum / 100.0)
