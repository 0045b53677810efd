"""Distance-based association clumping (plink `--clump` shape, LD-free).

The reference's analysis layer reports one lead variant per associated
region rather than every correlated hit (gwasDB's Manhattan-plot
interpretation workflow); the standard algorithm is GREEDY: take the
best-p variant genome-wide, suppress everything within ±radius on the
same chromosome, repeat. Greedy suppression is inherently sequential —
but only WITHIN a chromosome. The engine shape is therefore the
reference's own (study × chr) fan-out (SURVEY §2.12 X2/X3): one
`applyInPandas` group per chromosome runs the exact serial algorithm in
vectorized numpy, chromosomes run in parallel, and the driver never sees
a variant row. At 100 TB the per-group input is one chromosome's
associations — bounded by the variant catalog, not by study count.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def clump_pandas(pdf: pd.DataFrame, radius: int) -> pd.DataFrame:
    """Exact greedy clump of one chromosome: iterate variants by
    (p, variant_id) ascending; each picked lead suppresses later
    variants within ±radius. Returns lead rows with their clump size
    (the lead itself included).

    Same greedy semantics as the original full-mask formulation, but
    the per-lead membership test runs on a position-SORTED view: the
    ±radius window is a contiguous [lo, hi) slice found by two binary
    searches, so each lead costs O(log m + window) instead of O(m)
    (the old `alive & (abs(pos - pos_i) <= radius)` scanned the whole
    chromosome per lead, and the pandas-Series alive[i] probe cost
    ~µs per ROW). Identical output: the window slice is exactly the
    inclusive |pos - pos_i| <= radius member set, iteration order and
    tie-breaks unchanged (r14, guide §1.2 per-task work)."""
    import numpy as np

    pdf = pdf.sort_values(["p", "variant_id"]).reset_index(drop=True)
    pos = pdf["pos"].to_numpy()
    m = len(pos)
    by_pos = np.argsort(pos, kind="stable")
    pos_sorted = pos[by_pos]
    rank_in_pos = np.empty(m, dtype=np.int64)
    rank_in_pos[by_pos] = np.arange(m)
    alive = np.ones(m, dtype=bool)  # indexed in pos order
    leads: list[int] = []
    n_members: list[int] = []
    for i in range(m):  # (p, variant_id) order
        if not alive[rank_in_pos[i]]:
            continue
        lo = int(np.searchsorted(pos_sorted, pos[i] - radius, "left"))
        hi = int(np.searchsorted(pos_sorted, pos[i] + radius, "right"))
        window = alive[lo:hi]
        leads.append(i)
        n_members.append(int(window.sum()))
        window[:] = False  # in-place view: suppress the whole clump
    out = pdf.loc[leads, ["chr", "pos", "variant_id", "p"]].copy()
    out["n_clumped"] = n_members
    return out


def distance_clump(
    assoc: DataFrame,
    radius: int = 100_000,
    extra_group_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Greedy distance clumping of an association frame with columns
    (chr int, pos long, variant_id long, p double). One shuffle on chr;
    each chromosome's serial greedy pass runs as a single Arrow batch
    group. Output: (chr, pos, variant_id, p, n_clumped) — the lead
    variants only.

    MEMORY CONTRACT (mirrors graph.py's ≤500k-edge driver-path
    contract): one group = ONE CHROMOSOME'S association rows in a
    single pandas batch — 4 numeric columns ≈ 40 B/row, so even the
    densest human chromosome at full catalog density (~8M variants of
    the ~93M-marker reference scale) is ~320 MB, well inside an
    executor. The bound is the VARIANT CATALOG per chromosome, not the
    corpus or study count. If the input stacks many studies (rows ≈
    catalog × |studies| per chr), pass extra_group_keys=("study_id",)
    — clumping is per-study semantics in that shape anyway (each
    study's p-values rank independently), and the per-group bound
    drops back to one chromosome of one study."""
    schema = "chr int, pos long, variant_id long, p double, n_clumped long"
    keys = ["chr", *extra_group_keys]

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pdf.head(0).assign(n_clumped=pd.Series(dtype="int64"))
        return clump_pandas(pdf, radius)

    if extra_group_keys:
        # Group on (chr, extra...) but keep the output schema: the extra
        # keys ride through clump_pandas untouched only if selected —
        # clumping output stays lead rows per (chr, extra...) group.
        schema_extra = schema + "".join(
            f", {k} {dict(assoc.dtypes)[k]}" for k in extra_group_keys
        )

        def run_extra(pdf: pd.DataFrame) -> pd.DataFrame:
            extras = {k: pdf[k].iloc[0] for k in extra_group_keys} if len(pdf) else {}
            out = run(pdf)
            for k in extra_group_keys:
                out[k] = extras.get(k)
            return out

        return assoc.groupBy(*keys).applyInPandas(run_extra, schema=schema_extra)
    return assoc.groupBy(*keys).applyInPandas(run, schema=schema)


def bp_space_thin(assoc: DataFrame, gap: int = 100_000) -> DataFrame:
    """Positional marker thinning (plink `--bp-space` shape): scan each
    chromosome in (pos, variant_id) order and keep a variant only when
    it sits >= gap past the LAST KEPT one — the backbone-marker-set
    builder (pruning dense arrays to an evenly spaced subset). The
    keep decision depends on the last KEPT row, not the previous row,
    so it is not a lag window; like distance_clump it runs the exact
    serial pass per chromosome as one Arrow batch group (same memory
    contract: bounded by the per-chr variant catalog)."""
    schema = "chr int, pos long, variant_id long, p double"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["pos", "variant_id"]).reset_index(drop=True)
        keep: list[int] = []
        last = None
        for i, pos in enumerate(pdf["pos"].to_numpy()):
            if last is None or pos >= last + gap:
                keep.append(i)
                last = pos
        return pdf.loc[keep, ["chr", "pos", "variant_id", "p"]]

    return assoc.select("chr", "pos", "variant_id", "p").groupBy(
        "chr"
    ).applyInPandas(run, schema)
