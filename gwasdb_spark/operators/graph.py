"""Iterative graph operators: connected components over near-dup pairs.

`keep_first_per_cluster` (operators/dedup.py) is the greedy one-hop
survivor pick; exact cluster assignment needs transitive closure. Two
formulations, both DataFrame-native with skinny (long, long) shuffles:

- `connected_components_labelprop`: min-label exchange to fixpoint —
  O(max cluster diameter) rounds. Fine for real near-dup graphs (small,
  dense clusters), pathological on long chains.
- `connected_components_star` (default): the alternating large-star /
  small-star algorithm (Kiveris et al., "Connected Components in
  MapReduce and Beyond") — each round rewires every node toward its
  neighborhood minimum, so label information hops exponentially and
  convergence is O(log n) rounds even on chains.

Each round is a couple of shuffles over edge rows; DataFrames are
persisted per iteration and lineage is cut via localCheckpoint — without
it the plan doubles per iteration and the job dies on planning long
before data size matters. Convergence is detected with a distributed
(count, xxhash-sum) checksum of the edge set — one tiny aggregate, no
driver-side edge materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _edge_checksum(edges: DataFrame) -> tuple[int, int]:
    # pmod bounds each term so the ANSI-mode long sum can't overflow
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.pmod(F.xxhash64("u", "v"), F.lit(1_000_000_007))), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row.n), int(row.h)


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    stats: dict | None = None,
) -> DataFrame:
    """Resolve (id, component) for every id in `pairs`; component = min id
    reachable. Alternating large-star/small-star rounds until the edge
    set's checksum stabilizes — O(log n) rounds on any topology.

    large-star: every node's strictly-larger neighbors re-attach to the
    minimum of its closed neighborhood; small-star: every node's
    smaller-or-equal side collapses onto that minimum. At fixpoint the
    edges are direct (member → component-min) stars."""
    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("u").alias("id"))
        .union(e.select(F.col("v").alias("id")))
        .distinct()
        .persist()
    )
    nodes.count()  # materialize while e is cached

    # Lazy checkpoint: the checksum action right after materializes it,
    # so init costs ONE job instead of checkpoint-then-checksum two.
    edges = e.localCheckpoint(eager=False)
    prev = _edge_checksum(edges)
    iters = 0
    for _ in range(max_iter):
        iters += 1
        # large-star: m(u) = min over Γ(u) ∪ {u}; (v, m) for v > u
        bidir = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        m = (
            bidir.groupBy("u")
            .agg(F.min("v").alias("minv"))
            .select("u", F.least(F.col("minv"), F.col("u")).alias("m"))
        )
        large = (
            bidir.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )
        # small-star: collapse each node's smaller side onto its minimum
        mn = large.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            large.join(mn, "u")
            .select(F.col("v").alias("n"), F.col("m"))
            .union(mn.select(F.col("u").alias("n"), F.col("m")))
            .filter(F.col("n") != F.col("m"))
            .select(F.col("n").alias("u"), F.col("m").alias("v"))
            .distinct()
            # Lazy lineage cut: the checksum action below materializes
            # the checkpoint — one job per round, not two.
            .localCheckpoint(eager=False)
        )
        cur = _edge_checksum(small)
        edges = small
        if cur == prev:
            break
        prev = cur
    if stats is not None:
        stats["iterations"] = iters

    lab = edges.groupBy("u").agg(F.min("v").alias("c"))
    labels = (
        nodes.join(lab, nodes.id == lab.u, "left")
        .select("id", F.coalesce(F.col("c"), F.col("id")).alias("component"))
    )
    out = labels.localCheckpoint(eager=True)
    e.unpersist()
    nodes.unpersist()
    return out


def connected_components_labelprop(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Min-label propagation to fixpoint — O(max cluster diameter) rounds.
    Kept as the independent cross-check for the star algorithm (and the
    simpler plan when clusters are known-small)."""
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
    iters = 0
    for _ in range(max_iter):
        iters += 1
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
    if stats is not None:
        stats["iterations"] = iters
    return labels


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
    stats: dict | None = None,
    small_graph_threshold: int = 500_000,
) -> DataFrame:
    """Size-adaptive CC entry point — the same physical-strategy-by-size
    decision Catalyst makes for broadcast vs shuffle joins, applied to
    the iterative algorithm:

    - edge sets ≤ `small_graph_threshold` with integral ids resolve with
      a driver union-find over an Arrow-collected edge table: one
      toPandas (two int64 numpy columns — a real 16 bytes/row, ~8 MB at
      the 500k default; NOT Python Row objects, whose per-object
      overhead is ~20× that) plus an int64 parent array over the ≤ 2·|E|
      distinct nodes, zero iteration rounds. Near-dup pair graphs are
      usually far below this bound AFTER thresholding even when the
      corpus is 100 TB — paying 6 × ~5-stage distributed rounds to
      label a few thousand edges is pure scheduling overhead.
    - larger edge sets — and ANY non-integral id type (string ids etc.),
      which the star path handles for free since it only needs an
      ordering — run the O(log n)-round star algorithm unchanged.

    Both paths emit identical labels (component = min reachable id;
    equivalence pinned in tests/test_graph.py), and the driver path
    preserves the input id type in its output schema. Pass
    `small_graph_threshold=0` to force the distributed path."""
    import numpy as np
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    id_type = e.schema["u"].dataType
    integral = isinstance(id_type, (ByteType, ShortType, IntegerType, LongType))
    n_edges = e.count()
    if n_edges > small_graph_threshold or not integral:
        if stats is not None:
            stats["path"] = "star"
        return connected_components_star(e, "u", "v", max_iter, stats)

    # Bounded by contract: ≤ threshold edges, Arrow-collected once into
    # two int64 columns. Node ids are compressed to dense indices via a
    # sorted-unique table; union-by-min keeps every root the minimum id
    # of its tree (ascending node order makes index order = id order).
    pdf = e.toPandas()
    u = pdf["u"].to_numpy(dtype=np.int64, copy=False)
    v = pdf["v"].to_numpy(dtype=np.int64, copy=False)
    nodes = np.unique(np.concatenate([u, v]))
    iu = np.searchsorted(nodes, u)
    iv = np.searchsorted(nodes, v)
    parent = np.arange(len(nodes), dtype=np.int64)

    def _find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            nxt = int(parent[x])
            parent[x] = r
            x = nxt
        return r

    for a, b in zip(iu.tolist(), iv.tolist()):
        ra, rb = _find(a), _find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    roots = np.array([_find(i) for i in range(len(nodes))], dtype=np.int64)
    import pandas as pd

    out = pd.DataFrame({"id": nodes, "component": nodes[roots]})
    if stats is not None:
        stats["path"] = "driver-unionfind"
        stats["iterations"] = 0
    spark_type = id_type.simpleString()
    return pairs.sparkSession.createDataFrame(
        out, f"id {spark_type}, component {spark_type}"
    )


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


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
    small_graph_threshold: int = 500_000,
) -> DataFrame:
    """PageRank by power iteration — the iterative-algorithm shape beyond
    connected components: each round is ONE shuffle of (node, mass)
    contributions joined against the static out-degree relation, plus a
    tiny aggregate for the dangling-mass correction (nodes with no
    out-edges redistribute uniformly — without this the total mass
    leaks and ranks are wrong).

    Size-adaptive like connected_components: edge sets ≤
    `small_graph_threshold` with integral ids are Arrow-collected once
    (two int64 numpy columns) and power-iterated in numpy with the
    IDENTICAL update — near-dup graphs after thresholding are a few
    hundred edges even on a huge corpus, and 20 distributed rounds
    (~5 stages each) for that is pure scheduling overhead. Larger
    graphs run the distributed rounds. Float summation order differs
    between the paths by ≤ ~1e-13 on ~1e-2 ranks — below the 9-dp
    rounding every consumer applies (equivalence pinned in
    tests/test_graph.py). Pass `small_graph_threshold=0` to force the
    distributed path.

    Distributed-path scale discipline matches connected_components:
    skinny (long, double) rows only, per-iteration localCheckpoint to
    cut lineage (the plan would double per round), convergence via a
    distributed L1-delta aggregate (one scalar to the driver per round,
    never the rank vector). ONE job per iteration: the dangling-mass
    scalar rides in-plan as a broadcast 1-row aggregate (never
    collected), and the delta action doubles as the lazy checkpoint's
    materializer — so the contribution shuffle runs exactly once per
    round. Returns (id, rank) summing to ~1."""
    import numpy as np
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    ed = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .persist()
    )
    id_type = ed.schema["u"].dataType
    integral = isinstance(id_type, (ByteType, ShortType, IntegerType, LongType))
    if integral and ed.count() <= small_graph_threshold:
        import pandas as pd

        pdf = ed.toPandas()
        ed.unpersist()
        if len(pdf) == 0:
            return edges.sparkSession.createDataFrame(
                [], f"id {id_type.simpleString()}, rank double"
            )
        u = pdf["u"].to_numpy(dtype=np.int64)
        v = pdf["v"].to_numpy(dtype=np.int64)
        nodes = np.unique(np.concatenate([u, v]))
        n = len(nodes)
        iu = np.searchsorted(nodes, u)
        iv = np.searchsorted(nodes, v)
        deg = np.bincount(iu, minlength=n).astype(np.float64)
        r = np.full(n, 1.0 / n)
        base = (1.0 - damping) / n
        dangling_mask = deg == 0.0
        safe_deg = np.where(dangling_mask, 1.0, deg)
        for _ in range(max_iter):
            contrib = np.zeros(n)
            np.add.at(contrib, iv, r[iu] / safe_deg[iu])
            dangling = float(r[dangling_mask].sum())
            new_r = base + damping * dangling / n + damping * contrib
            delta = float(np.abs(new_r - r).sum())
            r = new_r
            if delta < tol:
                break
        out = pd.DataFrame({"id": nodes, "rank": r})
        return edges.sparkSession.createDataFrame(
            out, f"id {id_type.simpleString()}, rank double"
        )
    nodes = (
        ed.select(F.col("u").alias("id"))
        .union(ed.select(F.col("v").alias("id")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # one scalar; the node set is static
    if n_nodes == 0:
        ed.unpersist()
        nodes.unpersist()
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = ed.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).persist()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint()
    base = (1.0 - damping) / n_nodes
    for _ in range(max_iter):
        contrib = (
            ed.join(ranks, ed["u"] == ranks["id"])
            .join(outdeg, "u")
            .select(F.col("v").alias("id"), (F.col("rank") / F.col("deg")).alias("m"))
        )
        # dangling mass (rank held by nodes with no out-edges): a 1-row
        # aggregate cross-joined into the update — stays in-plan, no
        # separate driver round-trip
        dangling = ranks.join(
            outdeg, ranks["id"] == outdeg["u"], "left_anti"
        ).agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dangling"))
        share = (
            F.lit(damping) * F.col("__dangling") / F.lit(float(n_nodes))
        )
        new_ranks = (
            nodes.join(
                contrib.groupBy("id").agg(F.sum("m").alias("m")), "id", "left"
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(base)
                    + share
                    + F.lit(damping) * F.coalesce(F.col("m"), F.lit(0.0))
                ).alias("rank"),
            )
            # lazy: materialized by the delta action below — the one job
            # this iteration runs
            .localCheckpoint(eager=False)
        )
        delta = (
            new_ranks.join(ranks.withColumnRenamed("rank", "old"), "id")
            .agg(F.sum(F.abs(F.col("rank") - F.col("old"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    ed.unpersist()
    outdeg.unpersist()
    nodes.unpersist()
    return ranks


def triangle_counts(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge set (src < dst
    canonical form) — the clustering-structure probe for near-dup graphs
    (a doc in many triangles sits in a dense boilerplate clique; a
    bridge doc does not).

    Algorithm: degree-ordered edge orientation (Cohen's MapReduce
    triangle counting) — each edge is re-oriented from the LOWER-degree
    endpoint to the higher (id tiebreak), wedges are enumerated by
    self-joining oriented edges on their source, and a wedge (u→v, u→w)
    closes iff edge (v,w) exists. Orientation bounds the join fan-out by
    Σ d_out², with d_out ≤ O(√|E|) on any graph — the skew-killer that
    makes the enumeration feasible when a hub node has a million
    neighbors. Wedge closure is an equi-join against the canonical edge
    set; every relation shuffled is (node, node) pairs.

    Returns (id, n_triangles) for every node appearing in `pairs`,
    including zero rows."""
    # Lazy localCheckpoint: the edge set feeds degrees (twice), the
    # oriented wedges, and the closure probe — when `pairs` is itself an
    # expensive pipeline (the shingle-Jaccard graph) each consumer would
    # replan it. Edges are the skinny relation by construction.
    e = pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).localCheckpoint(eager=False)
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("id").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("id").alias("v"), F.col("deg").alias("deg_v"))
    keyed = e.join(du, "u").join(dv, "v")
    lower_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = keyed.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("o_src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("o_dst"),
    )
    w1 = oriented.select(F.col("o_src").alias("pivot"), F.col("o_dst").alias("a"))
    w2 = oriented.select(F.col("o_src").alias("pivot"), F.col("o_dst").alias("b"))
    wedges = w1.join(w2, "pivot").filter(F.col("a") < F.col("b"))
    closing = e.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    )
    tri = wedges.join(closing, ["a", "b"])  # (pivot, a, b) = one triangle
    per_node = (
        tri.select(F.col("pivot").alias("id"))
        .unionAll(tri.select(F.col("a").alias("id")))
        .unionAll(tri.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.select("id")
        .join(per_node, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_triangles"), F.lit(0))
            .cast("long")
            .alias("n_triangles"),
        )
    )


def kcore(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    k: int = 2,
    rounds: int = 10,
) -> DataFrame:
    """Nodes of the k-core (max subgraph where every node has degree ≥ k)
    of the undirected graph `pairs`, by SYNCHRONIZED peeling: each round
    drops every node whose degree within the current alive set is < k,
    all at once. The k-core is the unique fixpoint, so any schedule that
    reaches it agrees; `rounds` caps the iteration (peel depth is
    typically a handful of rounds — exit early when a round removes
    nothing, which post-fixpoint rounds provably do).

    Per-round shape: two semi-joins restrict the static edge relation to
    alive×alive, one degree aggregate, one filter — all skinny (node,
    node)/(node, count) rows; the edge set is checkpointed once and the
    alive set's lineage is cut every round (same discipline as
    connected_components_star/pagerank). Returns (id)."""
    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    alive = e.select(F.col("u").alias("id")).distinct().localCheckpoint()
    n_alive = alive.count()
    for _ in range(rounds):
        if n_alive == 0:
            break
        deg = (
            e.join(alive, e["u"] == alive["id"], "left_semi")
            .join(alive.withColumnRenamed("id", "__vid"),
                  F.col("v") == F.col("__vid"), "left_semi")
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        new_alive = (
            deg.filter(F.col("deg") >= k).select(F.col("u").alias("id"))
            .localCheckpoint()
        )
        n_new = new_alive.count()
        alive = new_alive
        if n_new == n_alive:
            break
        n_alive = n_new
    return alive


def label_propagation(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    rounds: int = 5,
    small_graph_threshold: int = 500_000,
) -> DataFrame:
    """Community detection by SYNCHRONIZED label propagation: every node
    starts as its own label; each round, all nodes simultaneously adopt
    the most frequent label among their neighbors (min-label tiebreak).
    A FIXED round count makes the result a deterministic function of
    the edge set — the price is that bipartite structures can oscillate
    rather than settle (inherent to synchronous LPA; asynchronous
    schedules fix oscillation but surrender determinism, the wrong
    trade for a reproducible pipeline).

    Size-adaptive like connected_components/pagerank: edge sets ≤
    `small_graph_threshold` with integral ids Arrow-collect and run the
    identical synchronized update in numpy — INTEGER counts and id
    tiebreaks, so the two paths are exactly equal (pinned in tests),
    not merely 9-dp-close. Larger graphs run distributed rounds: one
    contribution shuffle (edges ⋈ labels), one (node, label) count
    aggregate, one per-NODE-partitioned argmax window — all skinny
    rows, labels' lineage cut every round. Returns (id, label)."""
    import numpy as np
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    id_type = e.schema["u"].dataType
    integral = isinstance(id_type, (ByteType, ShortType, IntegerType, LongType))
    if integral and e.count() <= small_graph_threshold:
        import pandas as pd

        pdf = e.toPandas()
        if len(pdf) == 0:
            return pairs.sparkSession.createDataFrame(
                [], f"id {id_type.simpleString()}, label {id_type.simpleString()}"
            )
        u = pdf["u"].to_numpy(dtype=np.int64)
        v = pdf["v"].to_numpy(dtype=np.int64)
        nodes = np.unique(np.concatenate([u, v]))
        iu = np.searchsorted(nodes, u)
        iv = np.searchsorted(nodes, v)
        lbl = np.arange(len(nodes), dtype=np.int64)  # label = own index
        for _ in range(rounds):
            contrib = np.stack([iv, lbl[iu]], axis=1)
            uniq, cnt = np.unique(contrib, axis=0, return_counts=True)
            # per node: max count, then MIN label index (= min label id,
            # since node order is ascending). Sort by (v, -cnt, lbl) and
            # take the first row per v.
            order = np.lexsort((uniq[:, 1], -cnt, uniq[:, 0]))
            s = uniq[order]
            first = np.unique(s[:, 0], return_index=True)[1]
            new_lbl = lbl.copy()
            new_lbl[s[first, 0]] = s[first, 1]
            lbl = new_lbl
        out = pd.DataFrame({"id": nodes, "label": nodes[lbl]})
        spark_type = id_type.simpleString()
        return pairs.sparkSession.createDataFrame(
            out, f"id {spark_type}, label {spark_type}"
        )

    labels = e.select(F.col("u").alias("id")).distinct().withColumn(
        "label", F.col("id")
    ).localCheckpoint()
    w = Window.partitionBy("v").orderBy(F.desc("cnt"), F.asc("label"))
    for _ in range(rounds):
        cnt = (
            e.join(labels, e["u"] == labels["id"])
            .groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            cnt.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col("v").alias("id"), "label")
            .localCheckpoint()
        )
    return labels


def bfs_distances(
    pairs: DataFrame,
    seed_pred,
    max_hops: int = 4,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Multi-source BFS hop distances, level-synchronous: every node of
    the (symmetrized) edge set satisfying ``seed_pred`` starts at
    distance 0, and each of the ``max_hops`` rounds expands the current
    frontier by one equi-join against the pinned edge relation plus one
    anti-join against the visited set — per-round cost ∝ frontier
    adjacency, never the graph. The hop budget is FIXED (a reachability
    radius, not a convergence loop), so the result is a deterministic
    function of the edge set and expressible as a depth-bounded
    recursive CTE for oracle checking. Lineage is cut per round (lazy
    localCheckpoint), the same iteration discipline as
    label_propagation/kcore. Returns (id, dist) for reached nodes only;
    ``seed_pred`` is a Column predicate over the node id column ``id``.

    At 100 TB scale the frontier join shuffles (node, hop) rows — the
    visited set grows monotonically but stays id-only (16 B/row); for
    graphs whose k-hop closure explodes (social graphs), cap max_hops —
    cost is Σ |frontier_h| · avg-degree, the irreducible BFS work."""
    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    visited = (
        e.select(F.col("u").alias("id"))
        .distinct()
        .filter(seed_pred)
        .select("id", F.lit(0).cast("int").alias("dist"))
        .localCheckpoint(eager=False)
    )
    frontier = visited.select("id")
    for hop in range(1, int(max_hops) + 1):
        nxt = (
            frontier.join(e, frontier["id"] == e["u"])
            .select(F.col("v").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .select("id", F.lit(hop).cast("int").alias("dist"))
            .localCheckpoint(eager=False)
        )
        visited = visited.union(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("id")
    return visited
