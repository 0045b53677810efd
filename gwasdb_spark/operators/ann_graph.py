"""Per-cell neighbor-graph ANN (NSW-lite inside IVF cells) + boundary
spill assignment — the graph-ANN spike (r11 verdict #6: IVF recall 0.76
at nprobe 6/16 on uniform corpora was the documented quality ceiling of
the similarity family).

Two complementary mechanisms layered on the cell-partitioned layout that
x136/x153/x157 already serve and maintain, both static artifacts that
fit DataFrame plans (arrays in parquet — no pointer-chasing store):

1. **Spill assignment** (SPANN-style multi-assignment,
   `spill_assign`): a vector whose runner-up centroid similarity is
   within `eps` of its best is ALSO stored in those runner-up cells.
   Recall at equal nprobe rises because each probed cell now contains
   the near-boundary vectors plain IVF misses; storage grows by a
   bounded, measured replication factor (the gate records it). Pure
   DataFrame: assignment becomes an explode over the qualifying cells.

2. **Per-cell neighbor graphs** (`build_cell_graphs` +
   `graph_probe_topk`): inside each cell a static R-nearest-neighbor
   graph (undirected, plus a vec_id-ordered backbone chain that
   guarantees connectivity) turns the per-cell scan into a greedy
   best-first beam search — distance evaluations per probed cell drop
   from |cell| to ~ef·R·hops, so at EQUAL distance-eval budget a
   deployment probes MORE cells and recall rises (the gate's claim:
   graph@nprobe=8 beats flat@nprobe=4 on recall at no more evals).
   Graphs are built once at write time inside applyInPandas — exact
   blocked-BLAS all-pairs (O(|cell|²·d)) for cells up to `exact_max`
   rows, NN-descent (O(|cell|·R²·d·iters), near-linear — r12 verdict
   #4) above it; `method="auto"` picks per cell, and the search path
   is unchanged either way. Search is a
   cogrouped applyInPandas over (queries-by-probed-cell × cell graph):
   every probed cell searches independently, results merge with one
   bounded top-k — the same partition-pruned physical shape as
   ivf_probe, never a global traversal.

Determinism: entries, neighbor order, and every heap tie-break are
(similarity, vec_id)-ordered, so results are run-to-run stable, and with
`ef >= |cell|` the beam provably visits the whole (connected) cell —
the flat-regime config under which x174's driver row is hash-adjudicated
against an exact SQL replay, the same recipe that oracles x05b/d/e.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def spill_assign(
    assigned: DataFrame,
    centroids: np.ndarray,
    eps: float = 0.05,
    id_col: str = "neighbor_id",
    vec_col: str = "c_vec",
) -> DataFrame:
    """Multi-assign boundary vectors: emit (id, vec, cell) rows for the
    best cell AND every cell whose centroid cosine is >= best - eps.
    Input/output schema matches assign_cells, so ivf_probe / the cell
    index writers consume it unchanged. The explode is bounded by the
    number of qualifying centroids (~1-2 in practice; the replication
    factor is count(out)/count(in) and the stress gate records it)."""
    Cn = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("array<int>")
    def spill_cells(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            q = np.asarray(v, dtype=np.float64)
            q = q / (np.linalg.norm(q) or 1.0)
            sims = Cn @ q
            best = float(sims.max())
            cells = np.flatnonzero(sims >= best - eps)
            # best cell first, then runner-ups by similarity desc
            order = np.lexsort((cells, -sims[cells]))
            out.append([int(cells[i]) for i in order])
        return pd.Series(out)

    return (
        assigned.select(id_col, vec_col, spill_cells(F.col(vec_col)).alias("cs"))
        .select(id_col, vec_col, F.explode("cs").alias("cell"))
    )


def _nn_descent(Mn, ids, r: int, seed: int, iters: int = 10,
                block: int = 4096):
    """Approximate per-node top-r neighbor indices by NN-descent (Dong
    et al., WWW'11: a node's neighbors' neighbors are likely neighbors)
    — O(m·r²·d) per iteration instead of the exact build's O(m²·d),
    the swap the module header promised for cells that outgrow the
    quadratic build. Deterministic: the random init is seeded, every
    selection tie-breaks by (similarity desc, vec_id asc), and
    convergence is a pure function of the data. Returns an (m, r)
    index matrix (directed; caller undirects + backbones)."""
    m = len(ids)
    rng = np.random.default_rng(seed)
    nbr = rng.integers(0, m - 1, size=(m, r), dtype=np.int64)
    nbr[nbr >= np.arange(m)[:, None]] += 1  # never self
    rows = np.repeat(np.arange(m), r)
    for _ in range(iters):
        # REVERSE neighbors (who lists me?) — the half of NN-descent's
        # local join that makes it converge: sample up to r per node
        # (deterministically, by source id) from the reverse adjacency.
        order = np.lexsort((rows, nbr.ravel()))
        dst, src = nbr.ravel()[order], rows[order]
        starts = np.searchsorted(dst, np.arange(m))
        ends = np.searchsorted(dst, np.arange(m) + 1)
        rev = np.empty((m, r), dtype=np.int64)
        for i in range(m):
            s, e = starts[i], ends[i]
            if e > s:
                take = src[s:e][: r]
                rev[i, : len(take)] = take
                rev[i, len(take):] = take[0]
            else:
                rev[i] = i  # self: masked out at scoring
        # candidate pool per node: fwd + rev one-hop, then their fwd
        # neighbors (the general-neighbor join, bounded at (2r)² + 2r)
        one_hop = np.concatenate([nbr, rev], axis=1)
        cand = np.concatenate(
            [one_hop, nbr[one_hop].reshape(m, 2 * r * r)], axis=1
        )
        new_nbr = np.empty_like(nbr)
        for lo in range(0, m, block):
            hi = min(lo + block, m)
            Cb = cand[lo:hi]
            S = np.einsum("bd,bkd->bk", Mn[lo:hi], Mn[Cb])
            S[Cb == np.arange(lo, hi)[:, None]] = -np.inf  # no self
            order = np.argsort(Cb, axis=1, kind="stable")
            Cs = np.take_along_axis(Cb, order, 1)
            Ss = np.take_along_axis(S, order, 1)
            Ss[:, 1:][Cs[:, 1:] == Cs[:, :-1]] = -np.inf  # dedup
            cut = min(2 * r, Cs.shape[1])
            part = np.argpartition(-Ss, cut - 1, axis=1)[:, :cut]
            for i in range(lo, hi):
                b = i - lo
                csel = part[b]
                sel = np.lexsort((ids[Cs[b, csel]], -Ss[b, csel]))[:r]
                new_nbr[i] = Cs[b, csel[sel]]
        if int((new_nbr != nbr).sum()) <= max(1, (m * r) // 1000):
            nbr = new_nbr
            break
        nbr = new_nbr
    return nbr


def build_cell_graphs(
    index: DataFrame,
    R: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block: int = 2048,
    method: str = "auto",
    exact_max: int = 4096,
) -> DataFrame:
    """(cell, vec_id, neighbors array<bigint>) — per-cell undirected
    R-NN graph + vec_id-ordered backbone chain (connectivity guarantee:
    greedy search can always reach every node, so the flat-regime beam
    is exact, and no cell ever strands an island of vectors). Blocked
    BLAS keeps the per-task working set to O(block·|cell|) doubles.

    `method`: "exact" = all-pairs O(|cell|²·d); "nndescent" = the
    O(|cell|·R²·d·iters) approximate build (r12 verdict #4 — the build,
    not the serve, is the scale-killer once cells grow 100×);
    "auto" (default) = exact for cells ≤ `exact_max` rows, NN-descent
    above — small cells keep the provably-exact edge set for free, big
    cells get the near-linear build. The serve path is unchanged either
    way, and flat-regime exactness never depends on WHICH near-equal
    edges the graph carries (the backbone keeps every cell connected);
    beam-regime recall parity is measured by the `anngraph` gate."""

    def knn(pdf):
        import pandas as pd

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        m = len(pdf)
        cell = int(pdf["cell"].iloc[0])
        M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        Mn = M / nrm
        r = min(R, m - 1)
        nbrs = [set() for _ in range(m)]
        use_nnd = method == "nndescent" or (
            method == "auto" and m > exact_max
        )
        if r > 0 and use_nnd:
            top = _nn_descent(Mn, ids, r, seed=cell + 1)
            for i in range(m):
                for j in top[i]:
                    nbrs[i].add(int(j))
                    nbrs[int(j)].add(i)  # undirected
            for i in range(m - 1):  # backbone chain
                nbrs[i].add(i + 1)
                nbrs[i + 1].add(i)
            return pd.DataFrame(
                {
                    "cell": cell,
                    "vec_id": ids,
                    "neighbors": [
                        [int(ids[j]) for j in sorted(ns)] for ns in nbrs
                    ],
                }
            )
        for lo in range(0, m, block):
            hi = min(lo + block, m)
            S = Mn[lo:hi] @ Mn.T
            for i in range(lo, hi):
                S[i - lo, i] = -2.0
            if r > 0:
                # top-r by (similarity desc, vec_id asc): vectorized
                # argpartition shortlist, then a tiny per-row lexsort —
                # O(m) per row instead of O(m log m). Exact-sim ties at
                # the shortlist boundary could swap an edge, which only
                # perturbs WHICH near-equal neighbors link; flat-regime
                # exactness never depends on edge choice (backbone
                # keeps every cell connected).
                cut = min(4 * r + 8, m)
                part = np.argpartition(-S, cut - 1, axis=1)[:, :cut]
                for i in range(lo, hi):
                    csel = part[i - lo]
                    row = S[i - lo, csel]
                    order = np.lexsort((ids[csel], -row))[:r]
                    for j in csel[order]:
                        nbrs[i].add(int(j))
                        nbrs[int(j)].add(i)  # undirected
        for i in range(m - 1):  # backbone chain
            nbrs[i].add(i + 1)
            nbrs[i + 1].add(i)
        return pd.DataFrame(
            {
                "cell": cell,
                "vec_id": ids,
                "neighbors": [
                    [int(ids[j]) for j in sorted(ns)] for ns in nbrs
                ],
            }
        )

    return index.groupBy("cell").applyInPandas(
        knn, "cell int, vec_id long, neighbors array<bigint>"
    )


def _beam_search(qv, Mn, ids, adj, entries, ef, exclude):
    """Best-first beam over one cell's graph. Returns ([(sim, id)...]
    result pool sorted desc, n_evals). Deterministic: all heap keys are
    (similarity, vec_id) pairs."""
    import heapq

    visited = set()
    cand: list = []  # min-heap of (-sim, id, idx)
    res: list = []  # min-heap of (sim, -id, idx): worst kept on top
    evals = 0
    for eidx in entries:
        if eidx in visited:
            continue
        visited.add(eidx)
        s = float(Mn[eidx] @ qv)
        evals += 1
        heapq.heappush(cand, (-s, ids[eidx], eidx))
        heapq.heappush(res, (s, -ids[eidx], eidx))
    while cand:
        negs, _, idx = heapq.heappop(cand)
        if len(res) >= ef and -negs < res[0][0]:
            break
        for nb in adj[idx]:
            if nb in visited:
                continue
            visited.add(nb)
            sn = float(Mn[nb] @ qv)
            evals += 1
            if len(res) < ef or sn > res[0][0]:
                heapq.heappush(cand, (-sn, ids[nb], nb))
                heapq.heappush(res, (sn, -ids[nb], nb))
                if len(res) > ef:
                    heapq.heappop(res)
    pool = sorted(
        ((s, ids[idx]) for s, _, idx in res if ids[idx] != exclude),
        key=lambda t: (-t[0], t[1]),
    )
    return pool, evals


def graph_probe_topk(
    probes: DataFrame,
    graph_index: DataFrame,
    k: int = 10,
    ef: int = 64,
    with_evals: bool = False,
) -> DataFrame:
    """Serve path: greedy beam search inside each probed cell, then one
    bounded global top-k merge. `probes` is (query_id, q_vec, cell) —
    one row per (query, probed cell), the same probe relation ivf_probe
    builds; `graph_index` is (cell, vec_id, embedding, neighbors), the
    persisted artifact (partition BY CELL at 100 TB and the cogroup
    prunes to probed cells' files). Entries are the vec_id-ordered
    first/middle nodes — deterministic. With ef >= |cell| the search is
    exact within the cell (connected graph, beam never rejects)."""

    def search(key, qpdf, cpdf):
        import pandas as pd

        out_q, out_n, out_c, out_e, out_cell = [], [], [], [], []
        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n,
                 "cosine": out_c, "n_evals": out_e, "cell": out_cell}
            )
        cell_no = int(cpdf["cell"].iloc[0])
        cpdf = cpdf.sort_values("vec_id").reset_index(drop=True)
        ids = cpdf["vec_id"].to_numpy()
        pos = {int(v): i for i, v in enumerate(ids)}
        M = np.stack(cpdf["embedding"].to_numpy()).astype(np.float64)
        nrm = np.linalg.norm(M, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        Mn = M / nrm
        adj = [
            [pos[int(n)] for n in ns if int(n) in pos]
            for ns in cpdf["neighbors"]
        ]
        m = len(ids)
        entries = sorted({0, m // 2})
        for qrow in qpdf.itertuples(index=False):
            qv = np.asarray(qrow.q_vec, dtype=np.float64)
            qv = qv / (np.linalg.norm(qv) or 1.0)
            pool, evals = _beam_search(
                qv, Mn, ids, adj, entries, min(ef, m) if ef else m,
                int(qrow.query_id),
            )
            for s, nid in pool[:k]:
                out_q.append(int(qrow.query_id))
                out_n.append(int(nid))
                out_c.append(float(s))
                out_e.append(int(evals))
                out_cell.append(cell_no)
        return pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_n,
             "cosine": out_c, "n_evals": out_e, "cell": out_cell}
        )

    per_cell = (
        probes.groupBy("cell")
        .cogroup(graph_index.groupBy("cell"))
        .applyInPandas(
            search,
            "query_id long, neighbor_id long, cosine double, "
            "n_evals long, cell int",
        )
    )
    if with_evals:
        # raw per-(query, cell) relation for cost accounting: n_evals is
        # per-cell-search, repeated on each of its result rows — dedup
        # on (query_id, cell) before summing
        return per_cell
    # global merge: spill can surface one neighbor from several probed
    # cells — keep one copy, then the bounded per-query top-k
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    merged = per_cell.select(
        "query_id", "neighbor_id", "cosine"
    ).dropDuplicates(["query_id", "neighbor_id"])
    return (
        merged.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Graph sidecar for the PERSISTED cell index (operators/ann_index.py layout)
# ---------------------------------------------------------------------------
def _graphs_path(base: str) -> str:
    import os

    return os.path.join(base, "graphs")


def _meta_path(base: str) -> str:
    import os

    # Leading underscore: Spark/parquet readers ignore _-prefixed files
    # (the _SUCCESS convention), so the meta lives inside the graphs dir
    # without perturbing scans.
    return os.path.join(_graphs_path(base), "_GRAPH_META")


def sidecar_meta(base: str) -> dict | None:
    """The graph sidecar's build parameters ({"R": int}) if `<base>/
    graphs` exists, else None. This is how the index-maintenance ops
    (ann_index.upsert/delete/retrain — engine-enforced coherence, r12
    verdict #2) detect a sidecar and refresh it with the SAME R it was
    built with, instead of trusting every caller to remember."""
    import json
    import os

    if not os.path.isdir(_graphs_path(base)):
        return None
    try:
        with open(_meta_path(base)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        # Pre-meta sidecar (or torn write): fall back to the default R.
        return {"R": 8}


def _write_meta(base: str, R: int) -> None:
    import json

    with open(_meta_path(base), "w") as fh:
        json.dump({"R": int(R)}, fh)


def build_graph_sidecar(spark, base: str, R: int = 8) -> None:
    """Materialize per-cell neighbor graphs beside the persisted cell
    index (`<base>/graphs`, parquet partitioned by cell — the third
    sidecar after index and manifest), plus a `_GRAPH_META` file
    recording R. Built once at write time; after that the maintenance
    ops in ann_index.py keep it consistent THEMSELVES (engine-enforced:
    upsert/delete refresh touched cells, retrain rebuilds — callers no
    longer need to remember `refresh_graph_sidecar`)."""
    from gwasdb_spark.operators.ann_index import read_cell_index

    build_cell_graphs(read_cell_index(spark, base), R=R).write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(_graphs_path(base))
    _write_meta(base, R)  # after the write: overwrite clears the dir


def refresh_graph_sidecar(spark, base: str, cells, R: int | None = None) -> None:
    """Re-derive the graph partitions of the given TOUCHED cells after
    an upsert/delete (their membership changed, so their R-NN edges are
    stale), leaving every other cell's graph files byte-stable — the
    same touched-only discipline as the index/manifest rewrites. Cost ∝
    Σ|touched cell|², never the index. An emptied cell's graph
    partition is dropped outright. R defaults to the sidecar's recorded
    build parameter (mixing Rs across cells would make reachability
    depend on which cells churned)."""
    import os
    import shutil

    cells = sorted({int(c) for c in cells})
    if not cells:
        return
    if R is None:
        meta = sidecar_meta(base)
        R = int((meta or {}).get("R", 8))
    from gwasdb_spark.operators.ann_index import read_cell_index

    live = read_cell_index(spark, base).filter(F.col("cell").isin(cells))
    fresh = build_cell_graphs(live, R=R).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fresh.write.mode("overwrite").partitionBy("cell").parquet(
            _graphs_path(base)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    surviving = {
        r["cell"] for r in fresh.select("cell").distinct().collect()
    }
    for c in cells:
        if c in surviving:
            continue
        part = os.path.join(_graphs_path(base), f"cell={c}")
        if os.path.isdir(part):
            shutil.rmtree(part)
    # Dynamic overwrite leaves root-level files alone, but a pre-meta
    # sidecar gets upgraded here so future refreshes know their R.
    if not os.path.exists(_meta_path(base)):
        _write_meta(base, R)


def graph_probe_persisted(
    spark,
    base: str,
    probes: DataFrame,
    k: int = 10,
    ef: int = 64,
) -> DataFrame:
    """Serve path against the persisted index + graph sidecar: join the
    probed cells' index rows with their graph rows (both partitioned by
    cell — the equi-join prunes to probed partitions) and beam-search.
    A vector the sidecar has no graph row for is UNREACHABLE, so a
    refresh that missed a touched cell breaks the result — x176 turns
    that into a driver hash failure."""
    from gwasdb_spark.operators.ann_index import read_cell_index

    gindex = read_cell_index(spark, base).join(
        spark.read.parquet(_graphs_path(base)), ["cell", "vec_id"]
    )
    return graph_probe_topk(probes, gindex, k=k, ef=ef)
