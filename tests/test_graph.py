"""Connected-components correctness vs a driver-side union-find oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from gwasdb_spark.operators.dedup import ngram_jaccard_pairs
from gwasdb_spark.operators.graph import connected_components, dedup_keep_representative

from tests.conftest import SF_DIR


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
