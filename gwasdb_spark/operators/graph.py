"""Iterative graph operators: connected components over near-dup pairs.

`keep_first_per_cluster` (operators/dedup.py) is the greedy one-hop
survivor pick; exact cluster assignment needs transitive closure. This is
the standard large-scale label-propagation formulation (alternating
small-star/large-star style min-label exchange):

    label(v) <- min(label(v), min over neighbors(label(n)))   until fixpoint

Each iteration is two shuffles (edge join + min aggregate) over skinny
(long, long) rows; convergence in O(max cluster diameter) iterations —
small for real near-dup graphs (clusters are small and dense). DataFrames are persisted per
iteration and lineage is cut via localCheckpoint — without it the plan
doubles per iteration and the job dies on planning long before data size
matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve (id, component) for every id appearing in `pairs`, where
    component = min id reachable through the pair graph.

    Driver-side loop with a per-iteration convergence count — the loop runs
    O(max cluster diameter) times — short in practice; all data movement stays distributed."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .persist()
    )
    labels.count()  # materialize before the loop
    for _ in range(max_iter):
        # candidate label per node: min over neighbors' current labels
        neighbor_min = (
            edges.join(labels, edges.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)  # cut lineage growth per iteration
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def dedup_keep_representative(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Exact transitive dedup: keep the min-id member of every connected
    near-dup cluster (vs keep_first_per_cluster's one-hop greedy pick,
    which can drop both members of a chain a-b, b-c)."""
    comp = connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
