"""Scalar functions: the reference's F1-F18 surface (SURVEY.md §2.8).

The one reference UDF — `maf_calc(geno)` (R/wrangle_data.Rmd:196-201) — ships
in two forms:

1. `maf_expr`: pure Catalyst expressions (split + arithmetic). This is the
   production path — whole-stage-codegen'd, no Python round trip. At 100 TB
   the difference between this and a Python UDF is the difference between a
   scan-bound job and a serialization-bound one.
2. `maf_pandas_udf`: vectorized Arrow pandas_udf — the engine's UDF surface
   demo, equivalent to the reference's parallel `future_map_dbl`
   (R/wrangle_data.Rmd:209). Tests assert both produce identical results.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

# plink chromosome codings (R/gwas_ddl_postgres.sql:6, R/wrangle_data.Rmd:67-69)
PLINK_CHR_CODES = {**{str(i): i for i in range(1, 23)}, "X": 23, "Y": 24, "XY": 25, "MT": 26}
_CODE_TO_LABEL = {v: k for k, v in PLINK_CHR_CODES.items()}


def chr_code(chr_label: Column) -> Column:
    """Chromosome label → plink integer coding ('X'→23, 'XY'→25). Resolves the
    reference's chr type drift (SURVEY.md §1.2) in one declared direction."""
    expr = F.when(chr_label == "X", 23).when(chr_label == "Y", 24)
    expr = expr.when(chr_label == "XY", 25).when(chr_label == "MT", 26)
    # strip stray decimal suffixes ('22.0' — the SQLite leak,
    # R/postgres_process.Rmd:6-7) before casting
    return expr.otherwise(
        F.regexp_replace(chr_label, r"\.0$", "").cast("int")
    )


def chr_label(code: Column) -> Column:
    """plink integer coding → chromosome label."""
    return (
        F.when(code == 23, "X")
        .when(code == 24, "Y")
        .when(code == 25, "XY")
        .when(code == 26, "MT")
        .otherwise(code.cast("string"))
    )


def maf_expr(geno: Column) -> Column:
    """Minor-allele frequency from a 'hom1/het/hom2' count string —
    native Catalyst form of maf_calc (R/wrangle_data.Rmd:196-201):
    maf = (het + 2*hom1) / (2 * (hom1 + het + hom2)).

    All-zero counts → null: guarded because ANSI mode (Spark 4 default)
    raises DIVIDE_BY_ZERO instead of returning NaN — one malformed
    genotype row must not kill a 100 TB ingest job (found by
    tests/test_properties.py)."""
    parts = F.split(geno, "/")
    hom1 = parts.getItem(0).cast("double")
    het = parts.getItem(1).cast("double")
    hom2 = parts.getItem(2).cast("double")
    total = 2 * (hom1 + het + hom2)
    return F.when(total > 0, (het + 2 * hom1) / total)


@pandas_udf(DoubleType())
def maf_pandas_udf(geno: pd.Series) -> pd.Series:
    """Vectorized Arrow UDF twin of maf_expr (SURVEY.md §2.11). Batch-wise
    pandas ops — never row-at-a-time Python. All-zero counts → null, same
    as the guarded native expression (nullable Float64 so Arrow ships a
    real null, not NaN)."""
    counts = geno.str.split("/", expand=True).astype("float64")
    minor = counts[1] + 2 * counts[0]
    total = 2 * (counts[0] + counts[1] + counts[2])
    return (minor / total).where(total > 0).astype("Float64")


def neg_log10(p: Column) -> Column:
    """-log10(p) Manhattan transform (R/wrangle_data.Rmd:265). p=0 → +Infinity,
    matching R's behavior (SURVEY.md §7 'semantics edges')."""
    return -F.log10(p)


def unicode_pattern(pattern: str) -> str:
    """Promote a regex to ICU-equivalent Unicode class semantics.

    DECISION (ROADMAP round-2 item): the reference's `str_detect` is ICU
    (stringr — gwasDB/app.R:99, R/wrangle_data.Rmd:82), where \\w/\\b/\\s/\\d
    are Unicode-classed. Java regex defaults them to ASCII; the embedded
    `(?U)` flag (UNICODE_CHARACTER_CLASS) switches Java to the Unicode
    definitions, so a probe like '\\w+' matches 'rsΔ42' the way a stringr
    user expects. ASCII-literal patterns are unaffected — every existing
    oracle result is byte-identical. Parity with a Unicode-classed engine
    is property-tested over non-ASCII marker names in
    tests/test_properties.py."""
    return f"(?U){pattern}"


def str_detect(col: Column, pattern: str, negate: bool = False) -> Column:
    """`stringr::str_detect(col, pattern[, negate])` — the reference's
    marker-probe filter (gwasDB/app.R:99) with ICU-equivalent Unicode
    classes (see unicode_pattern)."""
    hit = col.rlike(unicode_pattern(pattern))
    return ~hit if negate else hit
