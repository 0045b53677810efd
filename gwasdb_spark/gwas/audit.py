"""Self-audit jobs — the reference's three manual correctness checks
(SURVEY.md §5) as engine functions, plus constraint audits replacing
ALTER TABLE ADD CONSTRAINT (SURVEY.md M4 — Spark enforces nothing, so we
verify post-write)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gwasdb_spark.gwas.warehouse import Warehouse


def count_reconciliation(df: DataFrame, expected_lines: int, has_header: bool = True) -> bool:
    """`select count(*)+1 from tmp_b37` vs `wc -l file.csv`
    (R/wrangle_data.Rmd:124-128)."""
    n = df.count() + (1 if has_header else 0)
    return n == expected_lines


def chr_distribution(df: DataFrame) -> DataFrame:
    """`select chr, count(*) ... group by chr` (R/wrangle_data.Rmd:132)."""
    return df.groupBy("chr").agg(F.count(F.lit(1)).alias("n")).orderBy("chr")


def fk_orphans(fact: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Anti-join FK audit (R/wrangle_data.Rmd:355): fact keys missing from
    the dimension. Empty result == constraint holds."""
    return fact.select(key).distinct().join(dim.select(key), key, "left_anti")


def pk_duplicates(df: DataFrame, keys: list[str]) -> DataFrame:
    """Composite-PK audit (R/gwas_ddl.sql:61): key groups with >1 row."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def warehouse_audit(wh: Warehouse) -> dict[str, int]:
    """Full referential-integrity sweep over the five base tables; returns
    violation counts (all zero == healthy). Mirrors the checks the reference
    runs by hand before INSERT (R/wrangle_data.Rmd:355,381;
    R/load_urate2020_gwas.Rmd:252,278)."""
    b37 = wh.read("b37")
    gwas = wh.read("gwas")
    marker = wh.read("marker")
    study = wh.read("study").select(F.col("id").alias("study_id"))
    no_res = wh.read("no_gwas_result")
    return {
        "gwas_kgp_orphans": fk_orphans(gwas, b37, "kgp_id").count(),
        "gwas_study_orphans": fk_orphans(gwas, study, "study_id").count(),
        "marker_kgp_orphans": fk_orphans(marker, b37, "kgp_id").count(),
        "no_result_kgp_orphans": fk_orphans(no_res, b37, "kgp_id").count(),
        "gwas_pk_dups": pk_duplicates(gwas, ["kgp_id", "study_id"]).count(),
        "b37_pk_dups": pk_duplicates(b37, ["kgp_id"]).count(),
        "marker_unique_dups": pk_duplicates(marker, ["kgp_id", "marker_name"]).count(),
        # tombstones must be disjoint from results per (kgp_id, study_id)
        "tombstone_overlap": no_res.join(
            gwas.select("kgp_id", "study_id"), ["kgp_id", "study_id"], "left_semi"
        ).count(),
    }
