"""Query API — the Shiny app's surface (gwasDB/app.R) as lazy DataFrames.

Every function mirrors one reactive query in the app; each returns a LAZY
DataFrame — collect stays at the caller, exactly like `collect()` in app.R
(SURVEY.md §3 entry-point 1). All predicates bind `chr` (partition pruning)
and `pos` ranges (row-group skipping on the pos-sorted layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gwasdb_spark.gwas.warehouse import Warehouse


def markers_by_region(wh: Warehouse, chrom: int, start: int, end: int) -> DataFrame:
    """Position-mode marker search (gwasDB/app.R:82-94): b37 variants in
    [start, end] on one chromosome, sorted by pos."""
    return (
        wh.read("b37")
        .filter((F.col("chr") == chrom) & F.col("pos").between(start, end))
        .select("chr", "pos", "kgp_id")
        .orderBy("pos")
    )


def markers_by_probe(wh: Warehouse, probe_regex: str) -> DataFrame:
    """Probe-mode marker search (gwasDB/app.R:97-101): regex over kgp_id,
    sorted by (chr, pos). At 93M rows this is the one access path with no
    pruning — served from the cached/compacted b37 (SURVEY.md §7 'what's
    hard'); a marker-name bloom/inverted table is the round-2 extension."""
    return (
        wh.read("b37")
        .filter(F.col("kgp_id").rlike(probe_regex))
        .select("chr", "pos", "kgp_id")
        .orderBy("chr", "pos")
    )


def empty_markers(wh: Warehouse) -> DataFrame:
    """Default UI state: schema-only empty result (`head(0)`, gwasDB/app.R:92)."""
    return wh.read("b37").select("chr", "pos", "kgp_id").limit(0)


def locus_window(
    wh: Warehouse, kgp_id: str, flank: int = 10_000, studies: list[str] | None = None
) -> DataFrame:
    """FLAGSHIP (gwasDB/app.R:124-154): click a marker → look up its
    position → ±flank window on `combined` for the Manhattan plot.

    Two-step lifecycle preserved: the anchor lookup is a tiny pruned scan;
    the window query binds chr + pos BETWEEN, so partition pruning + row-
    group skipping leave a few MB scanned regardless of warehouse size.
    The app's post-collect `filter(name %in% studies)` (app.R:176) is
    folded into the plan (SURVEY.md §3 note)."""
    anchor = (
        wh.read("b37").filter(F.col("kgp_id") == kgp_id).select("chr", "pos").first()
    )
    if anchor is None:
        return wh.read("combined").limit(0)
    chrom, pos = anchor["chr"], anchor["pos"]
    out = wh.read("combined").filter(
        (F.col("chr") == chrom) & F.col("pos").between(pos - flank, pos + flank)
    )
    if studies:
        out = out.filter(F.col("name").isin(studies))
    return out


def combined_region(
    wh: Warehouse, chrom: int, start: int, end: int, studies: list[str] | None = None
) -> DataFrame:
    """Region query over the gold table (gwasDB/app.R:163-166): the columns
    the app plots — chr, pos, neg_log10_p, name."""
    out = wh.read("combined").filter(
        (F.col("chr") == chrom) & F.col("pos").between(start, end)
    )
    if studies:
        out = out.filter(F.col("name").isin(studies))
    return out.select("chr", "pos", "neg_log10_p", "name")


def study_list(wh: Warehouse) -> DataFrame:
    """Startup dimension load (gwasDB/app.R:33)."""
    return wh.read("study")
