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
    (the lead itself included)."""
    pdf = pdf.sort_values(["p", "variant_id"]).reset_index(drop=True)
    pos = pdf["pos"].to_numpy()
    alive = pd.Series(True, index=pdf.index)
    leads: list[int] = []
    n_members: list[int] = []
    for i in pdf.index:
        if not alive[i]:
            continue
        members = alive & (abs(pos - pos[i]) <= radius)
        leads.append(i)
        n_members.append(int(members.sum()))
        alive &= ~members
    out = pdf.loc[leads, ["chr", "pos", "variant_id", "p"]].copy()
    out["n_clumped"] = n_members
    return out


def distance_clump(
    assoc: DataFrame,
    radius: int = 100_000,
) -> DataFrame:
    """Greedy distance clumping of an association frame with columns
    (chr int, pos long, variant_id long, p double). One shuffle on chr;
    each chromosome's serial greedy pass runs as a single Arrow batch
    group. Output: (chr, pos, variant_id, p, n_clumped) — the lead
    variants only."""
    schema = "chr int, pos long, variant_id long, p double, n_clumped long"

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pdf.head(0).assign(n_clumped=pd.Series(dtype="int64"))
        return clump_pandas(pdf, radius)

    return assoc.groupBy("chr").applyInPandas(run, schema=schema)
