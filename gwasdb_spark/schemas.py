"""Declared schemas for the five warehouse tables (SURVEY.md §1.1).

Type drift in the reference's three DDLs (SQLite `R/gwas_ddl.sql`, Postgres
`R/gwas_ddl_postgres.sql`, migration DDL `R/postgres_process.Rmd:14-70`) is
resolved deliberately (SURVEY.md §7.1):

- `chr` is INTEGER with plink codings X=23, Y=24, XY=25, MT=26
  (R/gwas_ddl_postgres.sql:6, R/wrangle_data.Rmd:67-69); label mapping via
  gwasdb_spark.functions.scalar.chr_code / chr_label.
- literal 'NA' strings are nulled at read time (the reference sed-fixes
  them, R/load_urate2020_gwas.Rmd:244-247).
- Spark enforces no PK/FK/UNIQUE: uniqueness is enforced at write time
  (dedup merge in gwas.dml) and audited post-write (gwas.audit), mirroring
  the reference's own validation queries (R/wrangle_data.Rmd:355).
"""

from __future__ import annotations

from pyspark.sql import types as T

# b37 — variant catalog (R/gwas_ddl.sql:4-10, R/gwas_ddl_postgres.sql:4-10)
B37 = T.StructType(
    [
        T.StructField("kgp_id", T.StringType(), nullable=False),  # PK
        T.StructField("chr", T.IntegerType(), nullable=False),  # plink coding
        T.StructField("pos", T.IntegerType(), nullable=False),
        T.StructField("ref", T.StringType()),
        T.StructField("alt", T.StringType()),
    ]
)

# marker — alias map (R/gwas_ddl.sql:13-18); UNIQUE(kgp_id, marker_name)
MARKER = T.StructType(
    [
        T.StructField("kgp_id", T.StringType(), nullable=False),  # FK→b37
        T.StructField("marker_name", T.StringType(), nullable=False),
    ]
)

# study — study metadata (R/gwas_ddl.sql:23-39, R/gwas_ddl_postgres.sql:23-40)
STUDY = T.StructType(
    [
        T.StructField("id", T.IntegerType(), nullable=False),  # SERIAL
        T.StructField("name", T.StringType(), nullable=False),
        T.StructField("ancestry", T.StringType(), nullable=False),
        T.StructField("model_formula", T.StringType()),
        T.StructField("gwas_date", T.DateType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("n_case", T.IntegerType()),  # NULL for quantitative
        T.StructField("n_control", T.IntegerType()),
        T.StructField("imputed", T.BooleanType()),
        T.StructField("impute_ref_panel", T.StringType()),
        T.StructField("summary_only", T.BooleanType()),
        T.StructField("citation", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("xsan_path", T.StringType()),
        T.StructField("comment", T.StringType()),
    ]
)

# gwas — association-results fact table (R/gwas_ddl.sql:42-64;
# composite PK (kgp_id, study_id) at :61, FKs at :62-63)
GWAS = T.StructType(
    [
        T.StructField("kgp_id", T.StringType(), nullable=False),
        T.StructField("study_id", T.IntegerType(), nullable=False),
        T.StructField("a1", T.StringType(), nullable=False),
        T.StructField("a2", T.StringType()),
        T.StructField("stat", T.DoubleType(), nullable=False),  # OR or beta
        T.StructField("se", T.DoubleType()),
        T.StructField("neg_log10_p", T.DoubleType()),
        T.StructField("imputed_tf", T.BooleanType()),  # never populated by ETL
        T.StructField("impute_score", T.DoubleType()),
        T.StructField("maf_all", T.DoubleType()),
        T.StructField("maf_aff", T.DoubleType()),  # NULL for quantitative
        T.StructField("maf_unaff", T.DoubleType()),
        T.StructField("geno_all", T.StringType()),  # "hom1/het/hom2"
        T.StructField("geno_aff", T.StringType()),
        T.StructField("geno_unaff", T.StringType()),
        T.StructField("hwe_p_all", T.DoubleType()),
        T.StructField("hwe_p_aff", T.DoubleType()),
        T.StructField("hwe_p_unaff", T.DoubleType()),
    ]
)

# no_gwas_result — QC tombstones (R/gwas_ddl.sql:69-75)
NO_GWAS_RESULT = T.StructType(
    [
        T.StructField("kgp_id", T.StringType(), nullable=False),
        T.StructField("study_id", T.IntegerType(), nullable=False),
    ]
)

# Raw ETL input formats (FIXTURES.md §B; SURVEY.md §3 entry-point 2)

# B1: mfi marker-info file, headerless 8-col TSV (R/wrangle_data.Rmd:234)
MFI_RAW = T.StructType(
    [
        T.StructField("chr_pos_alleles", T.StringType()),
        T.StructField("snp_id", T.StringType()),
        T.StructField("position", T.IntegerType()),
        T.StructField("ref", T.StringType()),
        T.StructField("alt", T.StringType()),
        T.StructField("maf", T.DoubleType()),
        T.StructField("a1", T.StringType()),
        T.StructField("info_score", T.DoubleType()),
    ]
)

# B1 pre-shaped variant: awk-recomposed 6-col marker file
# (R/wrangle_data.Rmd:64-69)
MARKER_RAW = T.StructType(
    [
        T.StructField("kgp_id", T.StringType()),
        T.StructField("snp", T.StringType()),
        T.StructField("chr", T.StringType()),  # label form; chr_code() converts
        T.StructField("pos", T.IntegerType()),
        T.StructField("ref", T.StringType()),
        T.StructField("alt", T.StringType()),
    ]
)

# B2: GWAS results TSV (R/wrangle_data.Rmd:231)
GWAS_RAW = T.StructType(
    [
        T.StructField("chr", T.IntegerType()),
        T.StructField("snp", T.StringType()),
        T.StructField("a1", T.StringType()),
        T.StructField("a2", T.StringType()),
        T.StructField("or", T.DoubleType()),  # `beta` for quantitative traits
        T.StructField("se", T.DoubleType()),
        T.StructField("p", T.DoubleType()),
    ]
)

# B3: HWE TSV, long format, 3 rows/SNP (R/wrangle_data.Rmd:241-243)
HWE_RAW = T.StructType(
    [
        T.StructField("chr", T.IntegerType()),
        T.StructField("snp", T.StringType()),
        T.StructField("test", T.StringType()),  # ALL | AFF | UNAFF | ALL(QT)
        T.StructField("a1", T.StringType()),
        T.StructField("a2", T.StringType()),
        T.StructField("geno", T.StringType()),  # "n/n/n"
        T.StructField("o_het", T.DoubleType()),
        T.StructField("e_het", T.DoubleType()),
        T.StructField("p", T.DoubleType()),
    ]
)

# B4: FRQ TSV (R/load_urate2020_gwas.Rmd:137-138)
FRQ_RAW = T.StructType(
    [
        T.StructField("chr", T.IntegerType()),
        T.StructField("snp", T.StringType()),
        T.StructField("a1", T.StringType()),
        T.StructField("a2", T.StringType()),
        T.StructField("maf", T.DoubleType()),
        T.StructField("nchrobs", T.IntegerType()),
    ]
)
