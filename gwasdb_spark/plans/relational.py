"""SURVEY.md §2 operator inventory as oracle-checked Spark plans.

Each query re-expresses one (or a cluster of) reference operators over the
driver's TPC-H-ish test tables. Docstrings cite the reference usage
(`/root/reference/<file>:<line>`). Naming convention matches SURVEY.md §2
ids: s* scans/sources, p* predicates/projections, j* joins, a* aggregations,
w* window extensions, o* sorts/limits, u* set ops, f* scalar functions,
g* GWAS-audit ports, q* flagship/headline queries.
"""

from __future__ import annotations

import datetime as _dt
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from gwasdb_spark.catalog import table
from gwasdb_spark.plans.base import query
from gwasdb_spark.plans.helpers import cents, day_str, money, sql_cents, sql_money, stage_dir

# ---------------------------------------------------------------------------
# Scans / sources / sinks (SURVEY.md §2.1)
# ---------------------------------------------------------------------------


@query(
    "s01_full_scan",
    "S1,S2,S19",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def s01_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eager full scan of a dimension table — `tbl(con,'study') %>% collect()`
    at app startup (gwasDB/app.R:33). Collect stays at the caller."""
    return table(spark, sf_dir, "region").select("r_regionkey", "r_name")


@query(
    "s02_schema_only_head0",
    "O3",
    oracle="SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem LIMIT 0",
)
def s02_schema_only_head0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`head(0)` — schema-only empty relation, the app's default UI state
    (gwasDB/app.R:92)."""
    return (
        table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .limit(0)
    )


@query(
    "s03_csv_stage_glob_read",
    "S3,S4,S8,S9,S10,U1",
    oracle="SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier",
)
def s03_csv_stage_glob_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition CSV staging then typed multi-file union read — the
    reference stages per-(chr,study) CSVs (R/wrangle_data.Rmd:77,82,258) and
    reads them back with `map_dfr(files, vroom)` typed `col_types`
    (R/wrangle_data.Rmd:116). Here: supplier → partitioned CSV → glob read
    with an explicit StructType (no inference), implicit union."""
    sup = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    out = stage_dir("supplier_csv")
    (
        sup.repartition(4, "s_nationkey")
        .write.mode("overwrite")
        .option("header", True)
        .csv(out)
    )
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    )
    return spark.read.schema(schema).option("header", True).csv(out)


@query(
    "s20_jsonl_roundtrip",
    "S-ext,X-text",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
    FROM documents GROUP BY lang
    """,
)
def s20_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL sink→source round-trip (sources/jsonl.py): documents staged
    as newline-delimited JSON, read back with an explicit schema (no
    inference pass), then digest-aggregated per language — the distinct
    md5(text) count proves byte fidelity through JSON string escaping.
    The read is the scale path: splittable files, JVM-side Jackson parse,
    corrupt-line quarantine instead of job failure."""
    from gwasdb_spark.sources.jsonl import read_jsonl, write_jsonl

    d = table(spark, sf_dir, "documents")
    out = stage_dir("docs_jsonl")
    write_jsonl(d.repartition(4), out)
    back = read_jsonl(
        spark,
        out,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count_distinct(F.md5("text")).alias("n_distinct_texts"),
    )


@query(
    "s05_sql_text_entry",
    "S17,S18,J7",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F' AND c_mktsegment = 'BUILDING'
    """,
)
def s05_sql_text_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text entry point — the engine accepts raw SQL chunks exactly like
    the reference's knitr ```{sql} chunks (R/wrangle_data.Rmd:96-109,355);
    same Catalyst plan as the DataFrame API."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT o_orderkey, c_name, o_totalprice
        FROM v_orders JOIN v_customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F' AND c_mktsegment = 'BUILDING'
        """
    )


# ---------------------------------------------------------------------------
# Projections / filters / predicates (SURVEY.md §2.2)
# ---------------------------------------------------------------------------


@query(
    "p01_projection",
    "P1",
    oracle="SELECT c_custkey, c_name, c_nationkey FROM customer",
)
def p01_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`select(chr, pos, kgp_id)` (gwasDB/app.R:91). Column pruning reaches
    the parquet scan (ReadSchema shows 3 columns only)."""
    return table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")


@query(
    "p02_projection_rename",
    "P2,P4",
    oracle="""
    SELECT c_custkey AS custkey, c_mktsegment AS segment, c_acctbal AS balance
    FROM customer
    """,
)
def p02_projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`select(kgp_id, marker_name = snp)` / `rename(...)`
    (R/wrangle_data.Rmd:82,217)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_acctbal").alias("balance"),
    )


@query(
    "p03_drop_cols",
    "P3",
    oracle="SELECT p_partkey, p_name, p_brand, p_size FROM part",
)
def p03_drop_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`select(-maf, -a1)` column drop (R/wrangle_data.Rmd:251)."""
    return table(spark, sf_dir, "part").drop("p_type", "p_retailprice")


@query(
    "p04_derived_neglog10",
    "P5,F10",
    oracle="""
    SELECT event_id, ROUND(-log10(value / 1000.0), 9) AS neg_log10_p
    FROM events WHERE value > 0
    """,
)
def p04_derived_neglog10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mutate(neg_log10_p = -log10(p))` — the Manhattan-plot y axis
    (R/wrangle_data.Rmd:265). Rounded to 9 dp: log10 may differ by 1 ulp
    across libm implementations."""
    e = table(spark, sf_dir, "events")
    return e.filter(F.col("value") > 0).select(
        "event_id",
        F.round(-F.log10(F.col("value") / F.lit(1000.0)), 9).alias("neg_log10_p"),
    )


@query(
    "p05_filter_eq",
    "P6",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def p05_filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`filter(chr == !!input$marker_chr)` (gwasDB/app.R:83). Predicate is
    pushed to the parquet scan (PushedFilters)."""
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_linenumber")
    )


@query(
    "p06_filter_between",
    "P7",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice BETWEEN 100000 AND 150000
    """,
)
def p06_filter_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`between(pos, start, end)` genome-region predicate (gwasDB/app.R:84-86)."""
    o = table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice").between(100000, 150000)).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "p07_filter_date_range",
    "P7,F16",
    oracle="""
    SELECT l_orderkey, l_linenumber, strftime(l_shipdate, '%Y-%m-%d') AS ship_day
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      AND l_shipdate < TIMESTAMP '1998-03-01'
    """,
)
def p07_filter_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range predicate on a temporal key (the reference's region queries bind
    chr + pos range; here a shipdate window). Partition pruning / min-max
    skipping serve this at scale (SURVEY.md §4)."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-03-01"))
    ).select("l_orderkey", "l_linenumber", day_str("l_shipdate").alias("ship_day"))


@query(
    "p08_locus_window",
    "P8,J10,S19",
    oracle="""
    WITH anchor AS (
      SELECT o_orderdate AS ad FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    )
    SELECT o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
           c.c_name, n.n_name AS nation, o.o_totalprice AS stat
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate BETWEEN (SELECT ad FROM anchor) - INTERVAL 10 DAY
                            AND (SELECT ad FROM anchor) + INTERVAL 10 DAY
    """,
)
def p08_locus_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: the ±10 kb locus-window query (gwasDB/app.R:149-154) — the
    app looks up a clicked marker's position (first collect, app.R:148), then
    issues a second windowed query on `combined`. Analog: anchor = the top
    order's date, window = ±10 days, denormalized through customer ⋈ nation
    (both broadcast). Two-step lifecycle preserved deliberately."""
    o = table(spark, sf_dir, "orders")
    anchor_row = (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderdate")
        .first()
    )
    ad = anchor_row["o_orderdate"]
    lo, hi = ad - _dt.timedelta(days=10), ad + _dt.timedelta(days=10)
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        o.filter(F.col("o_orderdate").between(F.lit(lo), F.lit(hi)))
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "o_orderkey",
            day_str("o_orderdate").alias("order_day"),
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("o_totalprice").alias("stat"),
        )
    )


@query(
    "p09_regex_filter",
    "P9,F1",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE regexp_matches(p_name, '^(red|blue) (bolt|gear)$')
    """,
)
def p09_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`filter(str_detect(kgp_id, !!input$probe_id))` marker search
    (gwasDB/app.R:99) via the ICU-parity str_detect helper ((?U) Unicode
    classes — functions/scalar.py). Pattern kept in the RE2 ∩ Java-regex
    common dialect so the DuckDB oracle matches byte-for-byte."""
    from gwasdb_spark.functions.scalar import str_detect

    p = table(spark, sf_dir, "part")
    return p.filter(str_detect(F.col("p_name"), "^(red|blue) (bolt|gear)$")).select(
        "p_partkey", "p_name"
    )


@query(
    "p10_regex_negate",
    "P10,F1",
    oracle="""
    SELECT doc_id, lang FROM documents
    WHERE NOT regexp_matches(text, 'spark|stream')
    """,
)
def p10_regex_negate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negated regex filter — `str_detect(..., negate=TRUE)` drops
    chr:pos-style names (R/wrangle_data.Rmd:82)."""
    from gwasdb_spark.functions.scalar import str_detect

    d = table(spark, sf_dir, "documents")
    return d.filter(str_detect(F.col("text"), "spark|stream", negate=True)).select(
        "doc_id", "lang"
    )


@query(
    "p11_in_list",
    "P11",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_name IN ('CHINA', 'FRANCE', 'GERMANY', 'PERU')
    """,
)
def p11_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`filter(name %in% !!input$gwas_study)` (gwasDB/app.R:169)."""
    n = table(spark, sf_dir, "nation")
    return n.filter(F.col("n_name").isin("CHINA", "FRANCE", "GERMANY", "PERU")).select(
        "n_nationkey", "n_name"
    )


@query(
    "p12_semi_in_subquery",
    "P12,J9",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
    """,
)
def p12_semi_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery as left-semi join — `filter(snp %in% gwas$snp)`
    (R/wrangle_data.Rmd:241-248). Spark keeps it a semi-join (no fan-out)."""
    p = table(spark, sf_dir, "part")
    keys = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return p.join(keys, p.p_partkey == keys.l_partkey, "left_semi").select(
        "p_partkey", "p_name"
    )


@query(
    "p13_null_filter",
    "P13,F14,F15",
    oracle="""
    SELECT l_orderkey, l_linenumber, NULLIF(l_tax, 0.0) AS tax_or_null
    FROM lineitem
    WHERE NULLIF(l_tax, 0.0) IS NOT NULL AND l_returnflag = 'A'
    """,
)
def p13_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`filter(!is.na(or) & remove_snp == FALSE)` (R/wrangle_data.Rmd:264) —
    null predicate + literal-NA injection (`nullif` plays the reference's
    'NA'→NULL normalization, R/load_urate2020_gwas.Rmd:244)."""
    li = table(spark, sf_dir, "lineitem")
    tax_or_null = F.nullif(F.col("l_tax"), F.lit(0.0))
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            tax_or_null.alias("tax_or_null"),
            "l_returnflag",
        )
        .filter(F.col("tax_or_null").isNotNull() & (F.col("l_returnflag") == "A"))
        .drop("l_returnflag")
    )


@query(
    "p14_threshold_qc_split",
    "P14,P15,F13",
    oracle="""
    SELECT event_id, value, TRUE AS remove_flag
    FROM events WHERE value < 0.3
    """,
)
def p14_threshold_qc_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QC threshold split — `ifelse(info_score < 0.3, TRUE, FALSE)` then route
    removed rows to `no_gwas_result` (R/wrangle_data.Rmd:234; view predicate
    R/postgres_process.Rmd:137). Returns the tombstoned side."""
    e = table(spark, sf_dir, "events")
    flagged = e.withColumn(
        "remove_flag", F.when(F.col("value") < 0.3, F.lit(True)).otherwise(F.lit(False))
    )
    return flagged.filter(F.col("remove_flag")).select("event_id", "value", "remove_flag")


@query(
    "p15_conditional_expr",
    "P15,F13",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band
    FROM customer
    """,
)
def p15_conditional_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`ifelse(str_detect(...), a, b)` conditional rewrite
    (R/wrangle_data.Rmd:267-268) as when/otherwise."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("bal_band"),
    )


@query(
    "p16_pull_distinct",
    "P16,A3",
    oracle="SELECT DISTINCT o_orderstatus AS status FROM orders",
)
def p16_pull_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pull(id)` single-column extraction (gwasDB/app.R:169) — the engine
    returns a 1-column frame; the caller materializes the vector."""
    return (
        table(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus").alias("status"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Joins (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


@query(
    "j01_left_join_multikey",
    "J1,J2",
    oracle="""
    WITH a AS (
      SELECT l_orderkey, l_returnflag,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey, l_returnflag
    ),
    b AS (
      SELECT l_orderkey, l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem WHERE l_linestatus = 'F'
      GROUP BY l_orderkey, l_returnflag
    )
    SELECT a.l_orderkey, a.l_returnflag, a.sum_qty, b.n_lines
    FROM a LEFT JOIN b ON a.l_orderkey = b.l_orderkey
                       AND a.l_returnflag = b.l_returnflag
    """,
)
def j01_left_join_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join on a composite key — dplyr natural-join chains
    `left_join(hwe_all, hwe_aff)` infer shared keys (R/wrangle_data.Rmd:245);
    Spark requires them explicit (SURVEY.md J1 note)."""
    li = table(spark, sf_dir, "lineitem")
    a = li.groupBy("l_orderkey", "l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty")
    )
    b = (
        li.filter(F.col("l_linestatus") == "F")
        .groupBy("l_orderkey", "l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    return a.join(b, ["l_orderkey", "l_returnflag"], "left")


@query(
    "j02_right_join",
    "J4",
    oracle="""
    WITH r AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_returned
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY l_orderkey
    )
    SELECT o.o_orderkey, o.o_orderstatus, r.n_returned
    FROM r RIGHT JOIN orders o ON r.l_orderkey = o.o_orderkey
    """,
)
def j02_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`right_join(res_wide, by='snp')` (R/wrangle_data.Rmd:251) — orders with
    no returned lineitems survive with NULL counts."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    r = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_returned"))
    )
    return r.join(o, r.l_orderkey == o.o_orderkey, "right").select(
        "o_orderkey", "o_orderstatus", "n_returned"
    )


@query(
    "j03_join_renamed_keys",
    "J3",
    oracle="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey
    FROM supplier s JOIN customer c ON s.s_nationkey = c.c_nationkey
    WHERE c.c_acctbal > 9900
    """,
)
def j03_join_renamed_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join with differently-named keys via join-expression —
    `left_join(by = c("snp_id"="marker_name", ...))` (R/wrangle_data.Rmd:266)."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    return s.join(c, s.s_nationkey == c.c_nationkey).select(
        "s_suppkey", "s_name", "c_custkey"
    )


@query(
    "j04_broadcast_dims",
    "J5,J10",
    oracle="""
    SELECT r.r_name AS region, CAST(COUNT(*) AS BIGINT) AS n_customers,
           (CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0)
             AS total_balance
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def j04_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension joins — `left_join(study_info, ...)` metadata joins
    (R/wrangle_data.Rmd:308) as explicit broadcasts: zero shuffle of the fact
    side for the join itself."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money(F.sum(cents(F.col("c_acctbal")))).alias("total_balance"),
        )
    )


@query(
    "j05_cross_join",
    "J6",
    oracle="""
    SELECT r_name, s.status FROM region
    CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
    """,
)
def j05_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`crossing(name, chrs)` work-list cross join (R/wrangle_data.Rmd:308)."""
    r = table(spark, sf_dir, "region").select("r_name")
    s = (
        table(spark, sf_dir, "orders")
        .select(F.col("o_orderstatus").alias("status"))
        .distinct()
    )
    return r.crossJoin(s)


@query(
    "j06_anti_join",
    "J8",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
)
def j06_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join orphan check — `left join ... where b37_kgp is NULL`
    (R/wrangle_data.Rmd:355): orders with no lineitems."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_orderstatus"
    )


@query(
    "j07_semi_join",
    "J9",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49
    )
    """,
)
def j07_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join keep-matched — `where b37_kgp is not NULL` before insert
    (R/wrangle_data.Rmd:376)."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "j08_export_view",
    "J10,S18",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice AS stat,
           c.c_name, c.c_mktsegment
    FROM lineitem l
    LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    LEFT JOIN (SELECT c_custkey, c_name, c_mktsegment FROM customer) c
      ON o.o_custkey = c.c_custkey
    WHERE l.l_discount >= 0.08
    """,
)
def j08_export_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The denormalized export view — `gwas LEFT JOIN b37 USING(kgp_id) LEFT
    JOIN (SELECT id AS study_id, ... FROM study) WHERE impute_score >= 0.3`
    with `stat` aliased (R/postgres_process.Rmd:137). The reference's
    flagship 'combined' table is this shape (gwasDB/app.R:132)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_discount") >= 0.08)
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "left")
        .join(c, o.o_custkey == c.c_custkey, "left")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").alias("stat"),
            "c_name",
            "c_mktsegment",
        )
    )


# ---------------------------------------------------------------------------
# Aggregations (SURVEY.md §2.4)
# ---------------------------------------------------------------------------


@query(
    "a01_count_global",
    "A1",
    oracle="SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem",
)
def a01_count_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-count reconciliation — `select count(*)+1 from tmp_b37` vs `wc -l`
    (R/wrangle_data.Rmd:124-128)."""
    return table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "a02_groupby_count",
    "A2",
    oracle="""
    SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def a02_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution sanity check — `select chr, count(*) ... group by chr`
    (R/wrangle_data.Rmd:132). Partial (map-side) aggregation then one shuffle
    on the grouping key."""
    return (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "a03_distinct",
    "A3",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def a03_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`distinct()` after alias projection (R/wrangle_data.Rmd:82)."""
    return table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "a04_pivot_wide",
    "A4",
    oracle="""
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
      {cols}
    FROM events GROUP BY user_id % 10
    """.format(
        cols=",\n      ".join(
            f"CAST(COUNT(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}_cnt,\n"
            f"      (CAST(SUM(CASE WHEN event_type = '{t}' "
            f"THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) / 100.0)"
            f" AS {t}_sum"
            for t in _EVENT_TYPES
        )
    ),
)
def a04_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tidyr `pivot_wider(values_from = c(geno,...), names_from = test)` —
    HWE long→wide, multi-value (R/wrangle_data.Rmd:210,426-429). Spark
    `groupBy().pivot(col, values).agg(...)` with explicit pivot values (no
    extra distinct pass) and `{test}_{value}` naming."""
    e = table(spark, sf_dir, "events")
    piv = (
        e.withColumn("user_bucket", (F.col("user_id") % 10).cast("long"))
        .groupBy("user_bucket")
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            money(F.coalesce(F.sum(cents(F.col("value"))), F.lit(0))).alias("sum"),
        )
    )
    # pivot cells with zero source rows come back NULL; the oracle's
    # COUNT FILTER / SUM CASE..ELSE 0 yields 0 — coalesce so sparse data
    # (a bucket with no rows of some event_type) agrees too
    cols = [F.col("user_bucket")]
    for t in _EVENT_TYPES:
        cols.append(F.coalesce(F.col(f"{t}_cnt"), F.lit(0).cast("long")).alias(f"{t}_cnt"))
        cols.append(F.coalesce(F.col(f"{t}_sum"), F.lit(0.0)).alias(f"{t}_sum"))
    return piv.select(*cols)


@query(
    "w08_range_frame_trailing",
    "§2.5-ext",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN CAST(86400 AS BIGINT) * 1000000 PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS trail_1d_cents,
           CAST(COUNT(*)
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN CAST(86400 AS BIGINT) * 1000000 PRECEDING
                            AND CURRENT ROW) AS BIGINT) AS trail_1d_events
    FROM events WHERE event_type = 'purchase'
    """,
)
def w08_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RANGE window frame — `RANGE BETWEEN 1 day PRECEDING` over
    event time, per user: each purchase carries its trailing-24h spend and
    event count. The VALUE-based frame (rows whose ts is within the bound,
    however many there are) vs w02/w06's ROWS frames (fixed row counts) —
    the feature that makes trailing-period metrics exact under irregular
    event spacing. Exact integer cents inside the frame sum; one (user)
    shuffle. Ties in ts share a frame edge in BOTH engines (RANGE
    semantics), so results are portable even with duplicate timestamps."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    ts_us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(-86_400 * 1_000_000, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.sum(cents(F.col("value"))).over(w).alias("trail_1d_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("trail_1d_events"),
    )


@query(
    "a08_unpivot_long",
    "A4-ext",
    oracle="""
    WITH wide AS (
      SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
             CAST(COUNT(*) FILTER (event_type = 'click') AS BIGINT) AS click_cnt,
             CAST(COUNT(*) FILTER (event_type = 'view') AS BIGINT) AS view_cnt,
             CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT)
               AS purchase_cnt
      FROM events GROUP BY user_id % 10
    )
    SELECT user_bucket, event_type, n_events
    FROM wide
    UNPIVOT (n_events FOR event_type IN (click_cnt, view_cnt, purchase_cnt))
    """,
)
def a08_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT (tidyr pivot_longer, the inverse of a04's
    pivot_wider — the reference pipeline reshapes in both directions):
    three per-type count columns melt back to (bucket, event_type, n)
    rows. Spark's `unpivot` plans as one Expand projection — no shuffle,
    no join; 3× the rows, never 3× the scans."""
    e = table(spark, sf_dir, "events")
    wide = (
        e.withColumn("user_bucket", (F.col("user_id") % 10).cast("long"))
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "view", "purchase"])
        .agg(F.count(F.lit(1)))
        .select(
            "user_bucket",
            F.coalesce(F.col("click"), F.lit(0)).cast("long").alias("click_cnt"),
            F.coalesce(F.col("view"), F.lit(0)).cast("long").alias("view_cnt"),
            F.coalesce(F.col("purchase"), F.lit(0)).cast("long").alias("purchase_cnt"),
        )
    )
    return wide.unpivot(
        "user_bucket",
        ["click_cnt", "view_cnt", "purchase_cnt"],
        "event_type",
        "n_events",
    )


@query(
    "a09_listagg",
    "A-ext,§2.11",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
             AS priorities_csv,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders GROUP BY o_orderstatus
    """,
)
def a09_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg — the OLAP "collapse a group to a delimited
    list" aggregate (the reference's R pipelines use paste(collapse=',')
    the same way). Portability requires determinism: collect_set's order
    is partition-dependent, so the set is array_sort'ed BEFORE joining —
    the only portable listagg. Distinct values bound the state (order
    priorities, not orders)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.array_join(
            F.array_sort(F.collect_set("o_orderpriority")), ","
        ).alias("priorities_csv"),
        F.count_distinct("o_orderpriority").alias("n_priorities"),
    )


@query(
    "a10_cube_margins",
    "A2-ext,§2.5",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a10_cube_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY CUBE — all four grouping sets (both margins + grand
    total) in one Expand + one partial-aggregated shuffle; with a07's
    ROLLUP this completes the grouping-sets surface. Labels COALESCE'd
    identically in both engines."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
    )


@query(
    "a11_grouping_sets",
    "A2-ext,§2.5",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def a11_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the margins-only shape ((flag), (mode),
    ()) that neither ROLLUP (a07) nor CUBE (a10) expresses without
    post-filtering: each dimension's totals plus the grand total, never
    the (flag × status) cells. One Expand (3 replicas) + one partial-agg
    shuffle — the cells' combinatorial blowup never materializes."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               COUNT(*) AS n_items,
               SUM(CAST(l_quantity AS BIGINT)) AS sum_qty
        FROM v_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "a05_manual_pivot_join",
    "A5,J1",
    oracle="""
    WITH base AS (
      SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket, event_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('click', 'view', 'purchase')
      GROUP BY 1, 2
    )
    SELECT a.user_bucket,
           a.n AS click_n, b.n AS view_n, c.n AS purchase_n
    FROM (SELECT user_bucket, n FROM base WHERE event_type = 'click') a
    LEFT JOIN (SELECT user_bucket, n FROM base WHERE event_type = 'view') b
      ON a.user_bucket = b.user_bucket
    LEFT JOIN (SELECT user_bucket, n FROM base WHERE event_type = 'purchase') c
      ON a.user_bucket = c.user_bucket
    """,
)
def a05_manual_pivot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's production pivot: filter test=='ALL'/'AFF'/'UNAFF' into
    three frames, project+rename, left-join back (R/wrangle_data.Rmd:241-245).
    Kept join-shaped for parity; a04 is the efficient single-pass form."""
    e = table(spark, sf_dir, "events")
    base = (
        e.filter(F.col("event_type").isin("click", "view", "purchase"))
        .withColumn("user_bucket", (F.col("user_id") % 10).cast("long"))
        .groupBy("user_bucket", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a = base.filter(F.col("event_type") == "click").select(
        "user_bucket", F.col("n").alias("click_n")
    )
    b = base.filter(F.col("event_type") == "view").select(
        "user_bucket", F.col("n").alias("view_n")
    )
    c = base.filter(F.col("event_type") == "purchase").select(
        "user_bucket", F.col("n").alias("purchase_n")
    )
    return a.join(b, "user_bucket", "left").join(c, "user_bucket", "left")


@query(
    "a06_regression_trend",
    "A-ext",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT event_type, n AS n_days,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0
             AS slope_per_day,
           CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0
             AS intercept
    FROM sums
    """,
)
def a06_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise OLS trend: per event type, regress the daily revenue
    total on the day index — the anomaly/trend primitive, as a pure
    two-level aggregate (no UDF, no iteration). ALL regression moments
    (n, Σx, Σy, Σxy, Σx²) accumulate as exact int64 — day indices are
    small ints, daily totals exact cents — and the closed-form
    slope/intercept divide once in double, so both engines agree
    BITWISE with no rounding fudge. Shuffles: (type, day) partial agg,
    then per-type moment agg."""
    e = table(spark, sf_dir, "events")
    x = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("long")
    daily = (
        e.select("event_type", x.alias("x"), cents(F.col("value")).alias("c"))
        .groupBy("event_type", "x")
        .agg(F.sum("c").alias("y"))
    )
    sums = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return sums.select(
        "event_type",
        F.col("n").alias("n_days"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / den
            / F.lit(100.0)
        ).alias("slope_per_day"),
        (
            (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")).cast("double")
            / den
            / F.lit(100.0)
        ).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Window extensions (SURVEY.md §2.5 — absent in reference; engine extensions)
# ---------------------------------------------------------------------------


@query(
    "w01_topk_per_group",
    "W-ext",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal, CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rank
      FROM customer
    ) WHERE rank <= 3
    """,
)
def w01_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine extension (SURVEY.md §2.5): top-k per group via ranking window —
    'top hits per study'. Deterministic tiebreak on the key."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rank")
    )


@query(
    "w02_running_total",
    "W-ext",
    oracle="""
    SELECT o_custkey, o_orderkey,
           (CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                 OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) / 100.0) AS running_spend
    FROM orders
    """,
)
def w02_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine extension: cumulative aggregate window (exact-cents so the
    running double is engine-identical)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        money(F.sum(cents(F.col("o_totalprice"))).over(w)).alias("running_spend"),
    )


@query(
    "w03_auto_increment",
    "W-ext,§1.4",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY segment) AS BIGINT) AS id, segment
    FROM (SELECT DISTINCT c_mktsegment AS segment FROM customer)
    """,
)
def w03_auto_increment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SERIAL/AUTOINCREMENT emulation (study.id, R/gwas_ddl_postgres.sql:24):
    row_number over a global ordering at append time (SURVEY.md §1.4)."""
    seg = (
        table(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("segment"))
        .distinct()
    )
    w = Window.orderBy("segment")
    return seg.withColumn("id", F.row_number().over(w).cast("long")).select("id", "segment")


@query(
    "w04_lag_delta",
    "W-ext",
    oracle="""
    SELECT user_id, event_id, value,
           value - LAG(value) OVER w AS value_delta,
           CAST(date_diff('second',
                          LAG(ts) OVER w, ts) AS BIGINT) AS gap_sec
    FROM events
    WHERE event_type = 'purchase'
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w04_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lag deltas over event time — the session-derivative shape
    (value change + inter-event gap). One window shuffle partitioned by
    user_id; the event_type filter is pushed to the scan so only the
    purchase stream shuffles. Gap computed on exact epoch seconds (no
    float timestamp arithmetic)."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("value_delta"),
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_sec"),
    )


@query(
    "w05_ntile_rank",
    "W-ext",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(NTILE(4) OVER w AS INT) AS bal_quartile,
           PERCENT_RANK() OVER w AS bal_pct_rank,
           CAST(COUNT(*) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_at_or_below
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)
def w05_ntile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window family: quartile bucket, percent rank, and
    a peers-inclusive at-or-below count (RANGE frame — exact integers, no
    cume_dist float round-trip) per customer within nation. The two specs
    share the same partitioning+sort, so Catalyst plans one shuffle."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wr = (
        Window.partitionBy("c_nationkey")
        .orderBy("c_acctbal")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("bal_quartile"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.count(F.lit(1)).over(wr).cast("long").alias("n_at_or_below"),
    )


@query(
    "w09_rank_variants",
    "§2.5-ext",
    oracle="""
    SELECT o_orderstatus, o_orderkey,
           CAST(RANK() OVER w AS BIGINT) AS price_rank,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS price_dense_rank,
           ROUND(CUME_DIST() OVER w, 9) AS price_cume_dist
    FROM orders
    WHERE o_totalprice >= 450000
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC)
    """,
)
def w09_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tie-aware ranking family in one window — RANK (gaps after
    ties), DENSE_RANK (no gaps), CUME_DIST (inclusive fraction ≤ current)
    — complementing w01's row_number and w05's ntile/percent_rank.
    Ranking over the VALUE (not the row) means duplicated prices rank
    identically in both engines with no tiebreak column needed; one
    (status) shuffle."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 450000)
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"))
    return o.select(
        "o_orderstatus",
        "o_orderkey",
        F.rank().over(w).cast("long").alias("price_rank"),
        F.dense_rank().over(w).cast("long").alias("price_dense_rank"),
        F.round(F.cume_dist().over(w), 9).alias("price_cume_dist"),
    )


@query(
    "w07_group_quantiles",
    "§2.5-ext,A2",
    oracle="""
    SELECT lang,
           ROUND(quantile_cont(n_chars, 0.5), 9) AS p50_chars,
           ROUND(quantile_cont(n_chars, 0.95), 9) AS p95_chars,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang
    """,
)
def w07_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated quantiles per group (linear/continuous — the
    numpy default both engines implement): per-language doc-length p50 and
    p95, the length-distribution monitor a corpus QA dashboard shows.
    Spark's `percentile` is the exact path (full sort per group, fine at
    dashboard grain); `approx_percentile`/KLL (x13's sketch family) is the
    sub-linear twin when groups grow unbounded."""
    d = table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.5)"), 9).alias("p50_chars"),
        F.round(F.expr("percentile(n_chars, 0.95)"), 9).alias("p95_chars"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "a07_rollup_revenue",
    "A2-ext,§2.5",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                 AS DOUBLE) / 10000.0) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a07_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals in one pass — GROUP BY ROLLUP over
    (returnflag, linestatus) plus the grand total, the OLAP drill-down
    shape. Spark plans rollup as an Expand + single hash aggregate (one
    shuffle for all grouping sets, partial-aggregated map-side); revenue
    stays in exact e4 integer space until one final division. NULL
    grouping labels are COALESCE'd to 'ALL' in both engines (the data
    columns are never null, so the label is unambiguous)."""
    li = table(spark, sf_dir, "lineitem")
    rev_e4 = cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(rev_e4).cast("double") / F.lit(10000.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL")).alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n_items",
        )
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (SURVEY.md §2.6)
# ---------------------------------------------------------------------------


@query(
    "o01_topk_orders",
    "O1,O4",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def o01_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`arrange(pos)` + `head(n)` (gwasDB/app.R:94, R/wrangle_data.Rmd:447).
    Spark executes sort+limit as TakeOrderedAndProject (no global sort)."""
    return (
        table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@query(
    "o02_multikey_sort",
    "O2",
    oracle="SELECT n_regionkey, n_name FROM nation ORDER BY n_regionkey, n_name",
)
def o02_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`arrange(chr, pos)` multi-key sort (gwasDB/app.R:101)."""
    return table(spark, sf_dir, "nation").select("n_regionkey", "n_name").orderBy(
        "n_regionkey", "n_name"
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY.md §2.7)
# ---------------------------------------------------------------------------


@query(
    "u01_union_all",
    "U1,U2",
    oracle="""
    SELECT c_custkey AS entity_key, 'customer' AS entity_kind FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, 'supplier' AS entity_kind FROM supplier
    """,
)
def u01_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all — per-chr file concat `map_dfr` / header-stripped `cat`
    (R/wrangle_data.Rmd:116, R/postgres_process.Rmd:10) and
    INSERT INTO...SELECT appends. `unionByName` for position-safety."""
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"), F.lit("customer").alias("entity_kind")
    )
    s = table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"), F.lit("supplier").alias("entity_kind")
    )
    return c.unionByName(s)


# ---------------------------------------------------------------------------
# Scalar functions (SURVEY.md §2.8)
# ---------------------------------------------------------------------------


@query(
    "f01_id_parse_regex",
    "F2,F3,F8,F9",
    oracle="""
    WITH ids AS (
      SELECT p_partkey,
             CAST(p_partkey AS VARCHAR) || ':' || CAST(p_size AS VARCHAR)
               || '_' || p_brand || ',' || CAST(p_retailprice AS VARCHAR) AS kgp_id
      FROM part
    )
    SELECT p_partkey, kgp_id,
           regexp_extract(kgp_id, '^([0-9]+):', 1) AS id_part,
           regexp_extract(kgp_id, ':([0-9]+)_', 1) AS size_part,
           regexp_replace(kgp_id, ',[0-9.]+$', '') AS id_no_suffix,
           substr(kgp_id, 1, position(':' IN kgp_id) - 1) AS prefix
    FROM ids
    """,
)
def f01_id_parse_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-id synthesis and re-parsing — the reference builds
    `{chr}:{position}_{ref}_{alt}` ids (R/load_urate2020_gwas.Rmd:128), parses
    alleles back out with str_extract/str_remove (R/wrangle_data.Rmd:217),
    strips `,position` suffixes (`:268`) and truncates at the first comma
    (SUBSTR+POSITION, R/postgres_process.Rmd:119)."""
    p = table(spark, sf_dir, "part")
    ids = p.select(
        "p_partkey",
        F.concat(
            F.col("p_partkey").cast("string"),
            F.lit(":"),
            F.col("p_size").cast("string"),
            F.lit("_"),
            F.col("p_brand"),
            F.lit(","),
            F.col("p_retailprice").cast("string"),
        ).alias("kgp_id"),
    )
    return ids.select(
        "p_partkey",
        "kgp_id",
        F.regexp_extract("kgp_id", r"^([0-9]+):", 1).alias("id_part"),
        F.regexp_extract("kgp_id", r":([0-9]+)_", 1).alias("size_part"),
        F.regexp_replace("kgp_id", r",[0-9.]+$", "").alias("id_no_suffix"),
        F.expr("substr(kgp_id, 1, instr(kgp_id, ':') - 1)").alias("prefix"),
    )


@query(
    "f02_maf_genotype",
    "F6,F11,F12,U-udf",
    oracle="""
    WITH g AS (
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_quantity AS INTEGER) AS VARCHAR) || '/' ||
             CAST(l_linenumber AS VARCHAR) || '/' ||
             CAST(l_suppkey % 7 AS VARCHAR) AS geno
      FROM lineitem
    )
    SELECT l_orderkey, l_linenumber, geno,
           CAST(string_split(geno, '/')[2] AS DOUBLE) +
             2 * CAST(string_split(geno, '/')[1] AS DOUBLE) AS minor_count,
           (CAST(string_split(geno, '/')[2] AS DOUBLE) +
              2 * CAST(string_split(geno, '/')[1] AS DOUBLE)) /
           (2 * (CAST(string_split(geno, '/')[1] AS DOUBLE) +
                 CAST(string_split(geno, '/')[2] AS DOUBLE) +
                 CAST(string_split(geno, '/')[3] AS DOUBLE))) AS maf
    FROM g
    """,
)
def f02_maf_genotype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's single UDF, made native: `maf_calc(geno)` splits the
    `"hom1/het/hom2"` count string and computes minor-allele frequency
    (R/wrangle_data.Rmd:196-201). Here as pure Catalyst expressions — split +
    arithmetic, no Python in the hot path (SURVEY.md §2.11). The pandas_udf
    twin lives in gwasdb_spark.functions.scalar and is asserted equal in
    tests."""
    li = table(spark, sf_dir, "lineitem")
    g = li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat_ws(
            "/",
            F.col("l_quantity").cast("int"),
            F.col("l_linenumber"),
            (F.col("l_suppkey") % 7),
        ).alias("geno"),
    )
    parts = F.split(F.col("geno"), "/")
    hom1 = parts.getItem(0).cast("double")
    het = parts.getItem(1).cast("double")
    hom2 = parts.getItem(2).cast("double")
    minor = het + 2 * hom1
    return g.select(
        "l_orderkey",
        "l_linenumber",
        "geno",
        minor.alias("minor_count"),
        (minor / (2 * (hom1 + het + hom2))).alias("maf"),
    )


@query(
    "f03_pad_concat",
    "F5,F7",
    oracle="""
    SELECT n_nationkey,
           lpad(CAST(n_nationkey AS VARCHAR), 2, '0') AS chr_padded,
           n_name || ',' || CAST(n_regionkey AS VARCHAR) AS united
    FROM nation
    """,
)
def f03_pad_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`str_pad(chr, 2, 'left', '0')` filename padding (R/wrangle_data.Rmd:223)
    and `unite(...)` column concat (`:251`)."""
    n = table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.lpad(F.col("n_nationkey").cast("string"), 2, "0").alias("chr_padded"),
        F.concat_ws(",", F.col("n_name"), F.col("n_regionkey").cast("string")).alias(
            "united"
        ),
    )


@query(
    "f04_date_parts",
    "F16",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS order_year,
           CAST(month(o_orderdate) AS BIGINT) AS order_month,
           strftime(o_orderdate, '%Y-%m-%d') AS order_day
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def f04_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date handling — `gwas_date` DATE literals (R/wrangle_data.Rmd:176-181);
    temporal parts extraction for partition derivation."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        day_str("o_orderdate").alias("order_day"),
    )


@query(
    "f05_clean_names",
    "F18,S5",
    oracle="SELECT c_custkey AS cust_key, c_name AS cust_name FROM customer",
)
def f05_clean_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header normalization — `janitor::clean_names()` on every raw read
    (R/wrangle_data.Rmd:231). Engine fn: gwasdb_spark.sources.csv.clean_names;
    demonstrated via a renamed projection."""
    from gwasdb_spark.sources.csv import clean_names

    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("Cust Key"), F.col("c_name").alias("CUST-Name")
    )
    cleaned = clean_names(c)
    return cleaned.select("cust_key", "cust_name")


# ---------------------------------------------------------------------------
# GWAS self-audit ports (SURVEY.md §5 — the reference's manual checks)
# ---------------------------------------------------------------------------


@query(
    "f06_fuzzy_match",
    "§2.11,F-ext",
    oracle="""
    WITH probes(probe) AS (VALUES ('smal ring'), ('red wdget'), ('hot gearr'))
    SELECT p.probe, t.p_partkey, t.p_name,
           CAST(levenshtein(p.probe, t.p_name) AS BIGINT) AS dist
    FROM probes p JOIN part t ON levenshtein(p.probe, t.p_name) <= 2
    """,
)
def f06_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy name lookup: edit-distance ≤ 2 match of typo'd probes against
    the part name column — the forgiving-search twin of the marker probe
    (a user typing rs12345 with a transposed digit still lands,
    gwasDB/app.R:97's textInput has no autocomplete). Physical shape: the
    probe list broadcasts, the table streams once through a codegen'd
    levenshtein — linear in the table, never table×table.

    SCALE ROUTING: this is the documented linear-scan BASELINE. The
    default recommendation at scale is `f08_fuzzy_match_blocked`
    (operators/fuzzy.py fuzzy_join_blocked): trigram q-gram blocking
    prunes candidates before the exact distance, the same
    indexed-vs-full-scan pairing as g04/g05's marker probe. Reach for
    f06 only when the probe list is tiny AND the table is already being
    scanned anyway — otherwise use f08."""
    p = spark.createDataFrame(
        [("smal ring",), ("red wdget",), ("hot gearr",)], "probe string"
    )
    t = table(spark, sf_dir, "part")
    dist = F.levenshtein(F.col("probe"), F.col("p_name"))
    return (
        F.broadcast(p)
        .join(t, dist <= 2)
        .select("probe", "p_partkey", "p_name", dist.cast("long").alias("dist"))
    )


@query(
    "f08_fuzzy_match_blocked",
    "§2.11,F-ext,J-scale",
    oracle="""
    WITH probes(probe) AS
      (VALUES ('smal ring'), ('red wdget'), ('hot gearr'), ('bolt'))
    SELECT p.probe, t.p_partkey, t.p_name,
           CAST(levenshtein(p.probe, t.p_name) AS BIGINT) AS dist
    FROM probes p JOIN part t ON levenshtein(p.probe, t.p_name) <= 2
    """,
)
def f08_fuzzy_match_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCALE form of f06: trigram-blocked fuzzy join (operators/
    fuzzy.py) — candidates must share a trigram before the exact
    levenshtein runs, so the distance computation touches |candidates|,
    not |probes|×|table|. Sub-blocking-length probes ('bolt') take the
    exact-scan branch the guarantee requires. Oracle: the naive
    all-pairs form — blocked and naive must be result-identical, which
    is the blocking-completeness property itself."""
    from gwasdb_spark.operators.fuzzy import fuzzy_join_blocked

    p = spark.createDataFrame(
        [("smal ring",), ("red wdget",), ("hot gearr",), ("bolt",)],
        "probe string",
    )
    t = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    return fuzzy_join_blocked(p, t, "probe", "p_name", max_dist=2)


@query(
    "f07_extract_all_numbers",
    "§2.11,F-ext",
    oracle=r"""
    WITH nums AS (
      SELECT doc_id,
             list_filter(regexp_extract_all(text, '\d+'),
                         s -> length(s) <= 9) AS ns
      FROM documents
    )
    SELECT doc_id,
           CAST(len(ns) AS BIGINT) AS n_numbers,
           CAST(COALESCE(list_sum(list_transform(ns, s -> CAST(s AS BIGINT))),
                         0) AS BIGINT) AS sum_numbers
    FROM nums
    """,
)
def f07_extract_all_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract_all — the one-to-many extraction surface (the
    reference's str_extract_all / separate_rows shape): every integer
    literal in each doc, counted and summed. Pure codegen array pipeline
    (extract → filter ≤9 digits so the bigint cast can't overflow →
    transform → aggregate), zero UDFs, zero shuffles — the projection
    runs inside the scan stage."""
    d = table(spark, sf_dir, "documents")
    ns = F.filter(
        F.regexp_extract_all(F.col("text"), F.lit(r"\d+")),
        lambda s: F.length(s) <= 9,
    )
    sums = F.aggregate(
        F.transform(ns, lambda s: s.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        F.size(ns).cast("long").alias("n_numbers"),
        sums.alias("sum_numbers"),
    )


@query(
    "g01_count_reconciliation",
    "A1,§5",
    oracle="SELECT CAST(COUNT(*) + 1 AS BIGINT) AS n_plus_header FROM lineitem",
)
def g01_count_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Port of the reference's load reconciliation: `select count(*)+1 from
    tmp_b37` compared against `wc -l` of the staged CSV
    (R/wrangle_data.Rmd:124-128)."""
    return table(spark, sf_dir, "lineitem").agg(
        (F.count(F.lit(1)) + 1).alias("n_plus_header")
    )


@query(
    "g02_chr_distribution",
    "A2,§5",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY year(o_orderdate)
    """,
)
def g02_chr_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Port of the per-chromosome distribution sanity check
    (R/wrangle_data.Rmd:132) — here per order-year."""
    return (
        table(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").cast("long").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "g03_fk_orphan_audit",
    "J8,§5",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
    WHERE l_partkey NOT IN (SELECT p_partkey FROM part WHERE p_size <= 40)
    """,
)
def g03_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Port of the referential-integrity audit: anti-join the fact table
    against the dimension and report orphans (R/wrangle_data.Rmd:355,381) —
    Spark has no FK enforcement, so this is the engine's post-write audit."""
    li = table(spark, sf_dir, "lineitem")
    pk = table(spark, sf_dir, "part").filter(F.col("p_size") <= 40).select("p_partkey")
    return li.join(
        pk, li.l_partkey == pk.p_partkey, "left_anti"
    ).select("l_orderkey", "l_linenumber", "l_partkey")


# ---------------------------------------------------------------------------
# Marker-name probe serving path (gwasDB/app.R:97-101) on a synthetic
# warehouse: both engines generate the identical marker set from one
# integer formula, so the indexed path is oracle-checkable and benchable
# against the full-scan baseline at any SF.
# ---------------------------------------------------------------------------

_MARKER_PROBE_ORACLE = """
    WITH ids AS (
      -- dense 0..4n-1: DuckDB's range() takes constants only, but
      -- ROW_NUMBER over lineitem x 4 yields the same id SET and every
      -- output field is a pure function of id (order-insensitive compare)
      SELECT (ROW_NUMBER() OVER ()) - 1 AS id
      FROM lineitem, (VALUES (0), (1), (2), (3)) v(k)
    ),
    m AS (
      SELECT 'rs' || lpad(CAST(id AS VARCHAR), 9, '0') AS kgp_id,
             CAST(id % 22 + 1 AS INT) AS chr,
             CAST(1 + (id * 997) % 50000000 AS BIGINT) AS pos
      FROM ids
    )
    SELECT chr, pos, kgp_id FROM m
    WHERE regexp_matches(kgp_id, '^rs001234[0-9]$')
    """


def _marker_warehouse(spark: SparkSession, sf_dir: str):
    """Synthetic name-probe warehouse, built once per (process, scale):
    4×|lineitem| markers with deterministic (kgp_id, chr, pos) — enough
    rows at sf0.1 (~2.4M) for row-group skipping to be measurable. b37 is
    chr-partitioned/pos-sorted (the region layout); build_marker_index
    adds the name-sorted probe index. Returns the Warehouse."""
    from gwasdb_spark.gwas.warehouse import Warehouse
    from gwasdb_spark.plans.helpers import stage_dir

    n = 4 * spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    wh = Warehouse(spark, stage_dir(f"marker_wh_{n}"))
    if not wh.has_table("marker_index"):
        m = spark.range(n).select(
            F.format_string("rs%09d", F.col("id")).alias("kgp_id"),
            (F.col("id") % 22 + 1).cast("int").alias("chr"),
            (1 + (F.col("id") * 997) % 50_000_000).cast("long").alias("pos"),
        )
        wh.write("b37", m)
        wh.build_marker_index()
    return wh


@query("g04_marker_probe_indexed", "§3,§4", oracle=_MARKER_PROBE_ORACLE)
def g04_marker_probe_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive probe-mode marker search SERVED FROM THE NAME-SORTED
    INDEX (gwas/api.py markers_by_probe): the ^-anchored regex contributes
    a literal-prefix StringStartsWith pushed to the parquet scan, so
    min/max kgp_id stats skip every non-overlapping row group — the
    b-tree-probe replacement (R/gwas_ddl.sql:5). Compare g05 (full-scan
    twin) in BENCH for the serving-path win."""
    from gwasdb_spark.gwas.api import markers_by_probe

    wh = _marker_warehouse(spark, sf_dir)
    return markers_by_probe(wh, r"^rs001234[0-9]$")


@query("g05_marker_probe_scan", "§3,§4", oracle=_MARKER_PROBE_ORACLE)
def g05_marker_probe_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same probe WITHOUT the index — regex over chr-partitioned b37
    (what the reference does when the planner skips the PK b-tree). The
    baseline g04 is measured against; identical result set, so both share
    one oracle."""
    wh = _marker_warehouse(spark, sf_dir)
    return (
        wh.read("b37")
        .filter(F.col("kgp_id").rlike(r"^rs001234[0-9]$"))
        .select("chr", "pos", "kgp_id")
        .orderBy("chr", "pos")
    )


@query(
    "s22_python_datasource",
    "S-ext,§2.1",
    oracle="""
    WITH ids AS (
      SELECT (ROW_NUMBER() OVER ()) - 1 AS id
      FROM lineitem, (VALUES (0), (1), (2), (3)) v(k)
    ),
    m AS (
      SELECT 'rs' || lpad(CAST(id AS VARCHAR), 9, '0') AS kgp_id,
             CAST(id % 22 + 1 AS INT) AS chr,
             CAST(1 + (id * 997) % 50000000 AS BIGINT) AS pos
      FROM ids
    )
    SELECT chr, CAST(COUNT(*) AS BIGINT) AS n_markers,
           CAST(MIN(pos) AS BIGINT) AS min_pos,
           CAST(MAX(pos) AS BIGINT) AS max_pos,
           CAST(SUM(pos) AS BIGINT) AS sum_pos
    FROM m GROUP BY chr
    """,
)
def s22_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (sources/pyds.py — the Spark 4 DataSource
    API): a source that is neither a file nor JDBC participates as a
    first-class `spark.read.format("marker_gen")` with declared input
    partitions (8 parallel generator slices, Arrow-batched rows). The
    aggregate proves every partition's slice arrived exactly once; the
    oracle reconstructs the generator's formula in pure SQL."""
    from gwasdb_spark.sources.pyds import register

    register(spark)
    n = 4 * spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    m = (
        spark.read.format("marker_gen")
        .option("n", n)
        .option("numpartitions", 8)
        .load()
    )
    return m.groupBy("chr").agg(
        F.count(F.lit(1)).alias("n_markers"),
        F.min("pos").alias("min_pos"),
        F.max("pos").alias("max_pos"),
        F.sum("pos").alias("sum_pos"),
    )


@query(
    "g06_zorder_box_probe",
    "§4,P7",
    oracle="""
    WITH ids AS (
      SELECT (ROW_NUMBER() OVER ()) - 1 AS id
      FROM lineitem, (VALUES (0), (1), (2), (3)) v(k)
    ),
    m AS (
      SELECT 'rs' || lpad(CAST(id AS VARCHAR), 9, '0') AS kgp_id,
             CAST(id % 22 + 1 AS INT) AS chr,
             CAST(1 + (id * 997) % 50000000 AS BIGINT) AS pos
      FROM ids
    )
    SELECT chr, pos, kgp_id FROM m
    WHERE chr = 5 AND pos BETWEEN 10000000 AND 10500000
    """,
)
def g06_zorder_box_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region box probe over a Z-ORDERED layout (operators/maintenance.
    write_zordered): the marker set is laid out on the Morton interleave
    of (chr, pos div 4096), so row-group min/max stats prune on BOTH
    dimensions — a chr-only, pos-only, or box predicate each skips most
    row groups without hive-partitioning by either column (the layout
    upgrade ROADMAP tied to Delta's OPTIMIZE ZORDER; the sort needs no
    table format). Layout effectiveness is asserted from the parquet
    footers in tests/test_maintenance.py; this query pins the result
    itself against the formula oracle."""
    from gwasdb_spark.operators.maintenance import write_zordered
    from gwasdb_spark.plans.helpers import stage_dir

    n = 4 * spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    path = stage_dir(f"zorder_markers_{n}")
    if not os.path.isdir(path):
        m = spark.range(n).select(
            F.format_string("rs%09d", F.col("id")).alias("kgp_id"),
            (F.col("id") % 22 + 1).cast("int").alias("chr"),
            (1 + (F.col("id") * 997) % 50_000_000).cast("long").alias("pos"),
        ).withColumn("pos_kb", F.expr("pos div 4096").cast("int"))
        write_zordered(m, path, ["chr", "pos_kb"], bits=14, n_files=16)
    return (
        spark.read.parquet(path)
        .filter((F.col("chr") == 5) & F.col("pos").between(10_000_000, 10_500_000))
        .select("chr", "pos", "kgp_id")
    )


def _synthetic_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic association frame for the clumping queries: the g04
    marker formula plus a pseudo-p from pure integer arithmetic —
    reconstructible in SQL on both engines."""
    n = 4 * spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    return spark.range(n).select(
        (F.col("id") % 22 + 1).cast("int").alias("chr"),
        (1 + (F.col("id") * 997) % 50_000_000).cast("long").alias("pos"),
        F.col("id").alias("variant_id"),
        (((F.col("id") * 2654435761) % 1000003).cast("double") / 1000003.0).alias(
            "p"
        ),
    )


_ASSOC_SQL = """
    ids AS (
      SELECT (ROW_NUMBER() OVER ()) - 1 AS id
      FROM lineitem, (VALUES (0), (1), (2), (3)) v(k)
    ),
    assoc AS (
      SELECT CAST(id % 22 + 1 AS INT) AS chr,
             CAST(1 + (id * 997) % 50000000 AS BIGINT) AS pos,
             id AS variant_id,
             CAST((id * 2654435761) % 1000003 AS DOUBLE) / 1000003.0 AS p
      FROM ids
    )
    """


@query(
    "g07_distance_clump",
    "X-gwas,§2.12",
    oracle=f"""
    WITH RECURSIVE {_ASSOC_SQL},
    clump AS (
      SELECT chr,
             CAST([] AS STRUCT(p DOUBLE, vid BIGINT, pos BIGINT,
                               n BIGINT)[]) AS leads,
             list(struct_pack(p := p, vid := variant_id, pos := pos)
                  ORDER BY p, variant_id) AS rest
      FROM assoc GROUP BY chr
      UNION ALL
      SELECT chr,
             leads || [struct_pack(
               p := rest[1].p, vid := rest[1].vid, pos := rest[1].pos,
               n := len(list_filter(rest,
                        r -> abs(r.pos - rest[1].pos) <= 100000)))],
             list_filter(rest, r -> abs(r.pos - rest[1].pos) > 100000)
      FROM clump WHERE len(rest) > 0
    )
    SELECT chr, u.pos AS pos, u.vid AS variant_id, u.p AS p,
           u.n AS n_clumped
    FROM (SELECT chr, unnest(leads) AS u FROM clump WHERE len(rest) = 0)
    """,
)
def g07_distance_clump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy distance-based clumping (plink --clump, LD-free): best-p
    variant leads, ±100 kb suppressed, repeat — per chromosome in
    parallel (gwas/clump.py applyInPandas; the reference's per-chr
    fan-out X2/X3). Greedy suppression is order-dependent and
    iterative, but it IS expressible as a recursive CTE over per-chr
    sorted LISTS (round 10, the x11 oracle discipline): the working
    row carries (leads-so-far, alive-rest sorted by (p, variant_id)),
    each step promotes rest[1] and filters its ±100 kb window — so the
    whole greedy trace hash-checks against DuckDB, converting g07 from
    a rows-only structural check into an oracle-green query. Exact
    parity vs a pure-python reference remains in
    tests/test_gwas_pipeline.py; g08 is the windowed binned variant."""
    from gwasdb_spark.gwas.clump import distance_clump

    assoc = _synthetic_assoc(spark, sf_dir)
    return distance_clump(assoc, radius=100_000).orderBy("chr", "pos")


@query(
    "g08_binned_lead_snp",
    "X-gwas,§2.5",
    oracle=f"""
    WITH {_ASSOC_SQL},
    ranked AS (
      SELECT chr, pos, variant_id, p,
             CAST(pos // 200000 AS BIGINT) AS bin,
             ROW_NUMBER() OVER (PARTITION BY chr, pos // 200000
                                ORDER BY p, variant_id) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY chr, pos // 200000)
                  AS BIGINT) AS n_in_bin
      FROM assoc
    )
    SELECT chr, pos, variant_id, p, bin, n_in_bin
    FROM ranked WHERE rk = 1
    """,
)
def g08_binned_lead_snp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned lead-variant selection — the SQL-exact sibling of g07's
    greedy clump: one lead (min p, variant_id tiebreak) per 200 kb bin
    per chromosome. One window over (chr, bin); no iteration, so the
    whole result hash-checks against the oracle. The greedy form refines
    bin edges; this form is what dashboards compute."""
    assoc = _synthetic_assoc(spark, sf_dir)
    binned = assoc.withColumn("bin", F.expr("pos div 200000"))
    w = Window.partitionBy("chr", "bin").orderBy("p", "variant_id")
    wc = Window.partitionBy("chr", "bin")
    return (
        binned.withColumn("rk", F.row_number().over(w))
        .withColumn("n_in_bin", F.count(F.lit(1)).over(wc).cast("long"))
        .filter(F.col("rk") == 1)
        .select("chr", "pos", "variant_id", "p", "bin", "n_in_bin")
    )


@query(
    "g20_ld_prune",
    "X-gwas,§2.12",
    oracle=f"""
    WITH RECURSIVE {_ASSOC_SQL},
    thin AS (
      SELECT chr,
             CAST([] AS STRUCT(pos BIGINT, vid BIGINT, p DOUBLE)[]) AS kept,
             list(struct_pack(pos := pos, vid := variant_id, p := p)
                  ORDER BY pos, variant_id) AS rest
      FROM assoc GROUP BY chr
      UNION ALL
      SELECT chr, kept || [rest[1]],
             list_filter(rest, r -> r.pos >= rest[1].pos + 100000)
      FROM thin WHERE len(rest) > 0
    )
    SELECT chr, u.pos AS pos, u.vid AS variant_id, u.p AS p
    FROM (SELECT chr, unnest(kept) AS u FROM thin WHERE len(rest) = 0)
    """,
)
def g20_ld_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional marker pruning (plink --bp-space, the LD-free sibling
    of --indep-pairwise): keep one variant per >= 100 kb of kept-to-next
    spacing, scanning each chromosome in (pos, variant_id) order — the
    backbone-set builder dense genotyping arrays are thinned with
    before expensive per-marker models. The keep decision depends on
    the LAST KEPT variant (not the previous row), so it is a serial
    per-chr pass (gwas/clump.bp_space_thin, applyInPandas — the g07
    engine shape), and the ORACLE replays it exactly as a recursive
    CTE over per-chr pos-sorted lists (the g07/x11 discipline): each
    step keeps rest[1] and filters rest to pos >= kept + gap. Fully
    hash-adjudicated greedy state machine."""
    from gwasdb_spark.gwas.clump import bp_space_thin

    assoc = _synthetic_assoc(spark, sf_dir)
    return bp_space_thin(assoc, gap=100_000).orderBy("chr", "pos")


# ---------------------------------------------------------------------------
# Headline analytical queries (scale benchmarks; bench.py drives these)
# ---------------------------------------------------------------------------


@query(
    "q01_pricing_summary",
    "A1-A5,P6,O2",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0)
        AS sum_base_price,
      (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS DOUBLE)
         / 10000.0) AS sum_disc_price,
      (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
                * (100 + CAST(ROUND(l_tax * 100) AS BIGINT))) AS DOUBLE)
         / 1000000.0) AS sum_charge,
      (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*)) AS avg_qty,
      (CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 / COUNT(*)) AS avg_price,
      (CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
         / 100.0 / COUNT(*)) AS avg_disc,
      CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline scan-heavy aggregation (TPC-H Q1 shape): one pass over the
    fact table, partial aggregation map-side, 6-group shuffle. All money math
    in exact integer cents (see plans/base.py docstring)."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02")
    )
    price_c = cents(F.col("l_extendedprice"))
    disc_c = cents(F.col("l_discount"))
    tax_c = cents(F.col("l_tax"))
    qty = F.col("l_quantity").cast("long")
    cnt = F.count(F.lit(1))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            money(F.sum(price_c)).alias("sum_base_price"),
            (F.sum(price_c * (100 - disc_c)).cast("double") / F.lit(10000.0)).alias(
                "sum_disc_price"
            ),
            (
                F.sum(price_c * (100 - disc_c) * (100 + tax_c)).cast("double")
                / F.lit(1000000.0)
            ).alias("sum_charge"),
            (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            (F.sum(price_c).cast("double") / F.lit(100.0) / cnt).alias("avg_price"),
            (F.sum(disc_c).cast("double") / F.lit(100.0) / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@query(
    "q03_shipping_priority",
    "J10,A2,O1,O4",
    oracle="""
    SELECT l.l_orderkey,
           (CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
              AS DOUBLE) / 10000.0) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_day,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline join+agg+top-k (TPC-H Q3 shape): selective dimension filter,
    two joins, grouped revenue, top-10. No forced broadcast on customer — it
    grows with scale factor, so the join strategy is left to AQE/threshold
    (broadcast at small SF, sort-merge at 100 TB). Revenue in exact cents so
    ordering is engine-identical."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15")
    )
    rev = F.sum(
        cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    ).cast("double") / F.lit(10000.0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            day_str("o_orderdate").alias("order_day"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q05_local_supplier_volume",
    "J5,J10,A2",
    oracle="""
    SELECT n.n_name AS nation,
           (CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                     * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
              AS DOUBLE) / 10000.0) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Headline multi-join (TPC-H Q5 shape): 6-table star join. Only the
    genuinely fixed-size dims (nation: 25 rows, region: 5 rows) carry
    broadcast hints; customer and supplier grow with scale factor, so their
    join strategy is left to AQE — broadcast at small SF, shuffle join at
    100 TB where a forced broadcast would OOM the driver."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    rev = F.sum(
        cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))
    ).cast("double") / F.lit(10000.0)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(rev.alias("revenue"))
    )


@query(
    "q06_forecast_revenue",
    "P6,P7,A1",
    oracle="""
    SELECT (CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100)
                          AS BIGINT)) AS DOUBLE) / 100.0) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure range-predicate scan + global aggregate — the
    predicate-pushdown showcase (all three filters land in PushedFilters,
    scan reads 4 columns of 16). Revenue accumulates in exact integer
    1e-4 space then truncates to cents, so both engines agree bitwise."""
    l = table(spark, sf_dir, "lineitem")
    rev_cents = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 100
    ).cast("long")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("date"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            (F.sum(rev_cents).cast("double") / F.lit(100.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q02s_min_cost_supplier",
    "S17,J10,§3-EP3",
    oracle="""
    WITH partsupp_view AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(l_extendedprice) AS ps_supplycost
      FROM lineitem GROUP BY 1, 2
    )
    SELECT s.s_name, p.p_partkey, ps.ps_supplycost
    FROM partsupp_view ps
    JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
    JOIN part p ON ps.ps_partkey = p.p_partkey
    WHERE p.p_size < 10
      AND ps.ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM partsupp_view ps2 WHERE ps2.ps_partkey = ps.ps_partkey
      )
    """,
)
def q02s_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL-text entry point (TPC-H
    Q2 core): Catalyst rewrites the correlated MIN into an aggregate +
    join — the declarative plan the reference delegates to Postgres.
    partsupp doesn't exist in the test data, so a deterministic view
    derives (partkey, suppkey, supplycost) from lineitem."""
    table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    table(spark, sf_dir, "part").createOrReplaceTempView("part")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    spark.sql(
        """
        CREATE OR REPLACE TEMP VIEW partsupp_view AS
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               MIN(l_extendedprice) AS ps_supplycost
        FROM v_lineitem GROUP BY 1, 2
        """
    )
    return spark.sql(
        """
        SELECT s.s_name, p.p_partkey, ps.ps_supplycost
        FROM partsupp_view ps
        JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
        JOIN part p ON ps.ps_partkey = p.p_partkey
        WHERE p.p_size < 10
          AND ps.ps_supplycost = (
            SELECT MIN(ps2.ps_supplycost)
            FROM partsupp_view ps2 WHERE ps2.ps_partkey = ps.ps_partkey
          )
        """
    )


@query(
    "q04_order_priority",
    "J-semi,A-group",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 adapted to the test schema (lineitem has no
    commit/receipt dates — 'late line' is shipdate > orderdate + 60d):
    order-priority counts for one quarter of orders having at least one
    late line. The EXISTS is a LEFT SEMI join whose condition references
    both sides; the quarter filter prunes orders at the scan BEFORE the
    shuffle, and the semi join deduplicates lineitem matches without
    materializing them — no DISTINCT pass. At 100x, AQE picks sort-merge
    on the (orderkey) shuffle; no broadcast hint (both sides are
    SF-proportional)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    late = o.join(
        l,
        (l["l_orderkey"] == o["o_orderkey"])
        & (l["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "j09_full_outer",
    "J1,A2,F-null",
    oracle="""
    WITH cu AS (
      SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM customer GROUP BY 1
    ),
    su AS (
      SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers
      FROM supplier GROUP BY 1
    )
    SELECT COALESCE(cu.nationkey, su.nationkey) AS nationkey,
           COALESCE(cu.n_customers, 0) AS n_customers,
           COALESCE(su.n_suppliers, 0) AS n_suppliers
    FROM cu FULL OUTER JOIN su ON cu.nationkey = su.nationkey
    """,
)
def j09_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join — the one join type the §2.3 inventory's reference
    pipelines never needed (dplyr full_join exists but is unused); included
    for drop-in completeness. Per-nation customer counts ⋈ supplier counts,
    keeping nations present on either side only (at small SF the 10-row
    supplier table misses most nations — real null-side rows). Both inputs
    are pre-aggregated to ≤25 rows, so the outer join cost is nil at any
    SF; COALESCE canonicalizes the null sides."""
    cu = (
        table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("cu_key"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    su = (
        table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("su_key"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return cu.join(su, cu["cu_key"] == su["su_key"], "full_outer").select(
        F.coalesce(cu["cu_key"], su["su_key"]).alias("nationkey"),
        F.coalesce(F.col("n_customers"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("n_suppliers"), F.lit(0)).alias("n_suppliers"),
    )


@query(
    "u02_intersect",
    "U1,A3",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    """,
)
def u02_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set semantics): customers active in both 1996
    and 1997. Catalyst rewrites intersect as a left-semi join over
    distincts — one shuffle per side on the key, no row blow-up."""
    o = table(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    return y96.intersect(y97)


@query(
    "u03_except",
    "U1,A3,J8",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    """,
)
def u03_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set semantics): customers active in 1996 who
    churned in 1997 — the set-op spelling of the j06 anti-join shape
    (Catalyst plans both as left-anti over distinct)."""
    o = table(spark, sf_dir, "orders")
    y96 = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    y97 = o.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select(F.col("o_custkey").alias("custkey"))
    return y96.subtract(y97)


@query(
    "w06_trailing_ewma",
    "W-ext",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, value,
             LAG(value, 1) OVER w AS v1, LAG(value, 2) OVER w AS v2,
             LAG(value, 3) OVER w AS v3
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id, value,
           (value + 0.5 * COALESCE(v1, 0) + 0.25 * COALESCE(v2, 0)
                  + 0.125 * COALESCE(v3, 0))
           / (1.0 + 0.5 * (CASE WHEN v1 IS NULL THEN 0 ELSE 1 END)
                  + 0.25 * (CASE WHEN v2 IS NULL THEN 0 ELSE 1 END)
                  + 0.125 * (CASE WHEN v3 IS NULL THEN 0 ELSE 1 END))
             AS ewma_value
    FROM g
    """,
)
def w06_trailing_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing exponentially-weighted mean over each user's purchase
    stream (half-life weights 1, ½, ¼, ⅛ over the last 4 events) — the
    online-feature shape for anomaly/recommendation pipelines. Weights
    are exact powers of two and the sum order is fixed, so both engines
    produce the identical double with NO rounding tolerance; one window
    shuffle, LAG-chain frame (bounded state — a full-history EWMA prefix
    trick overflows a^(−j) at scale)."""
    e = table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v1, v2, v3 = (F.lag("value", k).over(w) for k in (1, 2, 3))
    num = (
        F.col("value")
        + 0.5 * F.coalesce(v1, F.lit(0.0))
        + 0.25 * F.coalesce(v2, F.lit(0.0))
        + 0.125 * F.coalesce(v3, F.lit(0.0))
    )
    den = (
        F.lit(1.0)
        + 0.5 * F.when(v1.isNull(), 0.0).otherwise(1.0)
        + 0.25 * F.when(v2.isNull(), 0.0).otherwise(1.0)
        + 0.125 * F.when(v3.isNull(), 0.0).otherwise(1.0)
    )
    return e.select(
        "user_id", "event_id", "value", (num / den).alias("ewma_value")
    )


@query(
    "s24_schema_evolution",
    "S-ext,§2.1",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_chars,
           CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN n_chars ELSE 0 END)
                AS BIGINT) AS total_chars
    FROM documents GROUP BY lang
    """,
)
def s24_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read — the lakehouse column-add path without a
    table format: an old segment written BEFORE a column existed (half
    the corpus, no n_chars) and a new segment written after sit in one
    directory; `mergeSchema` reconciles the footers and the old rows
    surface the new column as NULL. The aggregate proves both the union
    and the null semantics. Schema merge is a footer-only operation —
    at 100 TB it reads metadata, not data; pin a user-supplied schema
    instead when footers number in the millions."""
    from gwasdb_spark.plans.helpers import stage_dir

    d = table(spark, sf_dir, "documents")
    # sf-keyed: the same process runs this at several SFs (warmup +
    # measured); a shared stage would serve the wrong corpus.
    base = stage_dir(f"schema_evo_{os.path.basename(sf_dir.rstrip('/'))}")
    old_seg = os.path.join(base, "seg=old")
    new_seg = os.path.join(base, "seg=new")
    if not (os.path.isdir(old_seg) and os.path.isdir(new_seg)):
        d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang").write.mode(
            "overwrite"
        ).parquet(old_seg)
        d.filter(F.col("doc_id") % 2 == 1).select(
            "doc_id", "lang", "n_chars"
        ).write.mode("overwrite").parquet(new_seg)
    merged = spark.read.option("mergeSchema", "true").parquet(
        old_seg, new_seg
    )
    return merged.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("n_chars").isNotNull().cast("int"))
        .cast("long")
        .alias("n_with_chars"),
        F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("total_chars"),
    )


@query(
    "g09_qq_binned",
    "X-gwas,A2,§2.5",
    oracle=f"""
    WITH {_ASSOC_SQL},
    binned AS (
      SELECT CAST(FLOOR(-log10(p) * 50) AS BIGINT) AS bin_id,
             CAST(COUNT(*) AS BIGINT) AS n_variants
      FROM assoc WHERE p > 0 GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_variants) AS DOUBLE) AS n FROM binned),
    cum AS (
      SELECT bin_id, n_variants,
             COALESCE(SUM(n_variants) OVER (
               ORDER BY bin_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_more_significant
      FROM binned
    )
    SELECT bin_id, (bin_id / 50.0) AS observed_nlp, n_variants,
           ROUND(-log10((n_more_significant + (n_variants + 1) / 2.0)
                        / (n + 1.0)), 9) AS expected_nlp
    FROM cum CROSS JOIN tot
    """,
)
def g09_qq_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QQ-plot points for the association scan — the genomic-inflation
    diagnostic every GWAS report ships (gwasDB's Shiny plots run on
    exactly this observed-vs-expected −log10 p data): variants binned at
    0.02 resolution on observed −log10 p, each bin's expected quantile
    from its midpoint rank −log10((r+½)/(n+1)). Scale: the only window
    runs over the BIN relation (bounded by resolution × max −log10 p —
    hundreds of rows at any corpus size), never over variants; the
    per-variant work is one floor() projection plus a partial-agg'd
    count; p = 0 rows (beyond float resolution) are excluded as every
    QQ implementation does. Binning uses floor (not round): both engines floor the same
    IEEE double identically."""
    assoc = _synthetic_assoc(spark, sf_dir).filter(F.col("p") > 0)
    binned = assoc.groupBy(
        F.floor(-F.log10("p") * 50).cast("long").alias("bin_id")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_variants"))
    tot = binned.agg(F.sum("n_variants").cast("double").alias("n"))
    w = (
        Window.orderBy(F.desc("bin_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        binned.withColumn(
            "n_more_significant",
            F.coalesce(F.sum("n_variants").over(w), F.lit(0)),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bin_id",
            (F.col("bin_id") / F.lit(50.0)).alias("observed_nlp"),
            "n_variants",
            F.round(
                -F.log10(
                    (
                        F.col("n_more_significant")
                        + (F.col("n_variants") + 1) / F.lit(2.0)
                    )
                    / (F.col("n") + F.lit(1.0))
                ),
                9,
            ).alias("expected_nlp"),
        )
    )


@query(
    "s25_gzip_csv_roundtrip",
    "S8,S9,S-ext",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
    FROM documents GROUP BY lang
    """,
)
def s25_gzip_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressed-CSV interchange: corpus → gzip CSV (quoted/escaped —
    the texts are free-form) → typed read-back, digest-aggregated to
    prove byte fidelity through compression, quoting, AND the codec
    (s20/s21's check for the third interchange format). gzip CSV files
    are NOT splittable — one task per file — so the writer controls
    parallelism by file count (repartition(4)); at 100 TB prefer
    splittable parquet/ORC or zstd-seekable framing, and size gzip
    files to the task budget when the format is imposed."""
    from gwasdb_spark.plans.helpers import stage_dir

    d = table(spark, sf_dir, "documents")
    out = stage_dir("docs_gzip_csv")
    (
        d.repartition(4)
        .write.mode("overwrite")
        .option("header", True)
        .option("compression", "gzip")
        .csv(out)
    )
    back = (
        spark.read.option("header", True)
        .schema("doc_id bigint, text string, lang string, source string, n_chars bigint")
        .csv(out)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count_distinct(F.md5("text")).alias("n_distinct_texts"),
    )


@query(
    "g10_maf_spectrum",
    "X-gwas,F11,A2",
    oracle="""
    WITH g AS (
      SELECT CAST(l_quantity AS INTEGER) AS hom1, l_linenumber AS het,
             l_suppkey % 7 AS hom2
      FROM lineitem
    ),
    m AS (
      SELECT (CAST(het AS DOUBLE) + 2 * CAST(hom1 AS DOUBLE))
               / (2 * CAST(hom1 + het + hom2 AS DOUBLE)) AS maf
      FROM g WHERE hom1 + het + hom2 > 0
    ),
    f AS (
      SELECT CASE WHEN maf <= 0.5 THEN maf ELSE 1.0 - maf END AS folded
      FROM m
    )
    SELECT CAST(FLOOR(folded * 20) AS BIGINT) AS maf_bin,
           (CAST(FLOOR(folded * 20) AS BIGINT) / 20.0) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_markers
    FROM f GROUP BY 1
    """,
)
def g10_maf_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folded minor-allele-frequency spectrum — the site-frequency
    histogram every GWAS QC report opens with (rare-variant load,
    ascertainment bias, genotyping artifacts all show up here). f02's
    native MAF expression, folded to [0, 0.5] and binned at 0.05
    resolution: one scan-side projection + one bounded group-by (≤ 11
    bins at any corpus size). Zero-depth genotypes are excluded in both
    engines (no 0/0 division)."""
    li = table(spark, sf_dir, "lineitem")
    hom1 = F.col("l_quantity").cast("int").cast("double")
    het = F.col("l_linenumber").cast("double")
    hom2 = (F.col("l_suppkey") % 7).cast("double")
    depth = hom1 + het + hom2
    maf = (het + 2 * hom1) / (2 * depth)
    folded = F.when(maf <= 0.5, maf).otherwise(1.0 - maf)
    return (
        li.filter(depth > 0)
        .select(F.floor(folded * 20).cast("long").alias("maf_bin"))
        .groupBy("maf_bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n_markers"))
        .select(
            "maf_bin",
            (F.col("maf_bin") / F.lit(20.0)).alias("bin_lo"),
            "n_markers",
        )
    )


@query(
    "g11_hwe_chisq",
    "X-gwas,F11,P14",
    oracle="""
    WITH g AS (
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_quantity AS INTEGER) AS DOUBLE) AS hom1,
             CAST(l_linenumber AS DOUBLE) AS het,
             CAST(l_suppkey % 7 AS DOUBLE) AS hom2
      FROM lineitem
    ),
    f AS (
      SELECT l_orderkey, l_linenumber, hom1, het, hom2,
             hom1 + het + hom2 AS n,
             (2 * hom1 + het) / (2 * (hom1 + het + hom2)) AS p
      FROM g WHERE hom1 + het + hom2 > 0
    ),
    e AS (
      SELECT l_orderkey, l_linenumber, hom1, het, hom2,
             n * p * p AS e_hom1,
             2 * n * p * (1 - p) AS e_het,
             n * (1 - p) * (1 - p) AS e_hom2
      FROM f WHERE p > 0 AND p < 1
    )
    SELECT l_orderkey, l_linenumber,
           ROUND((hom1 - e_hom1) * (hom1 - e_hom1) / e_hom1
                 + (het - e_het) * (het - e_het) / e_het
                 + (hom2 - e_hom2) * (hom2 - e_hom2) / e_hom2, 9)
             AS hwe_chisq,
           ((hom1 - e_hom1) * (hom1 - e_hom1) / e_hom1
            + (het - e_het) * (het - e_het) / e_het
            + (hom2 - e_hom2) * (hom2 - e_hom2) / e_hom2) > 3.841
             AS hwe_fail
    FROM e
    """,
)
def g11_hwe_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hardy-Weinberg equilibrium chi-square per marker — the canonical
    genotyping-QC filter (plink --hwe; the reference's marker-QC stage
    flags exactly this class of artifact): observed (hom1, het, hom2)
    vs expectations from the allele frequency, 1-df chi-square, fail at
    3.841 (p < 0.05). Pure scan-side arithmetic on f02's genotype
    counts — zero shuffles; monomorphic markers (p ∈ {0,1}) are
    excluded in both engines (their expected het count is 0)."""
    li = table(spark, sf_dir, "lineitem")
    hom1 = F.col("l_quantity").cast("int").cast("double")
    het = F.col("l_linenumber").cast("double")
    hom2 = (F.col("l_suppkey") % 7).cast("double")
    n = hom1 + het + hom2
    p = (2 * hom1 + het) / (2 * n)
    e_hom1 = n * p * p
    e_het = 2 * n * p * (1 - p)
    e_hom2 = n * (1 - p) * (1 - p)
    chi2 = (
        (hom1 - e_hom1) * (hom1 - e_hom1) / e_hom1
        + (het - e_het) * (het - e_het) / e_het
        + (hom2 - e_hom2) * (hom2 - e_hom2) / e_hom2
    )
    return (
        li.filter(n > 0)
        .filter((p > 0) & (p < 1))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(chi2, 9).alias("hwe_chisq"),
            (chi2 > 3.841).alias("hwe_fail"),
        )
    )


@query(
    "w10_first_last_value",
    "§2.5-ext",
    oracle="""
    WITH w AS (
      SELECT user_id, event_id, event_type, value,
             FIRST_VALUE(event_type) OVER uw AS first_type,
             LAST_VALUE(event_type) OVER uw AS last_type,
             FIRST_VALUE(value) OVER uw AS first_value,
             LAST_VALUE(value) OVER uw AS last_value
      FROM events
      WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, first_type, last_type,
           ROUND(last_value - first_value, 9) AS value_drift,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM w
    GROUP BY user_id, first_type, last_type,
             ROUND(last_value - first_value, 9)
    """,
)
def w10_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE/LAST_VALUE window frames — the entry/exit shape
    (first touch vs last touch attribution, value drift over a user's
    history). The frame must be explicitly UNBOUNDED FOLLOWING: the
    default frame stops at CURRENT ROW, where LAST_VALUE degenerates to
    the row itself — the classic window-frame trap, pinned here on both
    engines. One per-user window + a group-by that collapses each user
    to one row."""
    e = table(spark, sf_dir, "events")
    uw = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w = e.select(
        "user_id",
        F.first("event_type").over(uw).alias("first_type"),
        F.last("event_type").over(uw).alias("last_type"),
        F.first("value").over(uw).alias("first_value"),
        F.last("value").over(uw).alias("last_value"),
    )
    return (
        w.groupBy(
            "user_id",
            "first_type",
            "last_type",
            F.round(F.col("last_value") - F.col("first_value"), 9).alias(
                "value_drift"
            ),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


@query(
    "g12_meta_analysis",
    "X-gwas,A2",
    oracle="""
    WITH res AS (
      SELECT l_partkey AS marker, l_suppkey % 3 AS study,
             CAST(l_discount - 0.05 AS DOUBLE) AS beta,
             CAST(l_tax + 0.01 AS DOUBLE) AS se
      FROM lineitem
    ),
    per AS (
      SELECT marker, study,
             AVG(beta) AS beta, AVG(se) AS se
      FROM res GROUP BY 1, 2
    ),
    meta AS (
      SELECT marker,
             CAST(COUNT(*) AS BIGINT) AS n_studies,
             SUM(beta / (se * se)) / SUM(1.0 / (se * se)) AS beta_meta,
             SQRT(1.0 / SUM(1.0 / (se * se))) AS se_meta
      FROM per GROUP BY 1 HAVING COUNT(*) >= 2
    )
    SELECT marker, n_studies,
           ROUND(beta_meta, 9) AS beta_meta,
           ROUND(se_meta, 9) AS se_meta,
           ROUND(beta_meta / se_meta, 6) AS z_meta
    FROM meta
    """,
)
def g12_meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-effect inverse-variance meta-analysis across studies — the
    cross-study combine step the reference's multi-study warehouse
    exists to enable (9 studies of the same trait; gwasDB/app.R lets
    the user eyeball them side by side, this computes the canonical
    pooled estimate): w_i = 1/se_i², β_meta = Σw_iβ_i/Σw_i,
    se_meta = √(1/Σw_i). GWAS semantics mapped onto the deterministic
    lineitem columns like g10/g11 (marker = l_partkey, study =
    l_suppkey mod 3, per-(marker, study) results averaged first — the
    one-result-per-study grain the gwas fact table guarantees by PK).
    Two stacked marker-grain aggregates; markers in < 2 studies are
    excluded (nothing to pool). Shuffles carry (marker, study, 2
    doubles) — never wide rows."""
    li = table(spark, sf_dir, "lineitem")
    res = li.select(
        F.col("l_partkey").alias("marker"),
        (F.col("l_suppkey") % 3).alias("study"),
        (F.col("l_discount") - 0.05).cast("double").alias("beta"),
        (F.col("l_tax") + 0.01).cast("double").alias("se"),
    )
    per = res.groupBy("marker", "study").agg(
        F.avg("beta").alias("beta"), F.avg("se").alias("se")
    )
    w = 1.0 / (F.col("se") * F.col("se"))
    meta = (
        per.groupBy("marker")
        .agg(
            F.count(F.lit(1)).alias("n_studies"),
            (F.sum(F.col("beta") * w) / F.sum(w)).alias("beta_meta"),
            F.sqrt(1.0 / F.sum(w)).alias("se_meta"),
        )
        .filter(F.col("n_studies") >= 2)
    )
    return meta.select(
        "marker",
        "n_studies",
        F.round("beta_meta", 9).alias("beta_meta"),
        F.round("se_meta", 9).alias("se_meta"),
        F.round(F.col("beta_meta") / F.col("se_meta"), 6).alias("z_meta"),
    )


@query(
    "g13_genomic_control",
    "X-gwas,X-qa",
    oracle="""
    WITH z AS (
      SELECT CAST((l_discount - 0.05) / (l_tax + 0.01) AS DOUBLE) AS zstat
      FROM lineitem
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_markers,
           ROUND(quantile_cont(zstat * zstat, 0.5) / 0.4549364231195728, 6)
             AS lambda_gc
    FROM z
    """,
)
def g13_genomic_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genomic-control inflation factor λ_GC = median(χ²)/0.4549… (the
    median of a central 1-df chi-square) — the single number every GWAS
    reports to show its test statistics aren't inflated by stratification
    (λ ≈ 1 clean, λ > 1.05 suspect). Complements g09's QQ curve with
    the scalar the reference's study table would store per study.
    Exact median via `percentile` (one sort-by-value aggregate; the
    scale swap is approx_percentile, same plan otherwise) over a
    scan-side z² projection."""
    li = table(spark, sf_dir, "lineitem")
    z2 = F.pow(
        (F.col("l_discount") - 0.05).cast("double")
        / (F.col("l_tax") + 0.01).cast("double"),
        F.lit(2),
    )
    return li.select(z2.alias("z2")).agg(
        F.count(F.lit(1)).alias("n_markers"),
        F.round(
            F.expr("percentile(z2, 0.5)") / F.lit(0.4549364231195728), 6
        ).alias("lambda_gc"),
    )


@query(
    "g14_heterogeneity",
    "X-gwas,X-qa",
    oracle="""
    WITH res AS (
      SELECT l_partkey AS marker, l_suppkey % 3 AS study,
             CAST(l_discount - 0.05 AS DOUBLE) AS beta,
             CAST(l_tax + 0.01 AS DOUBLE) AS se
      FROM lineitem
    ),
    per AS (
      SELECT marker, study,
             AVG(beta) AS beta, AVG(se) AS se
      FROM res GROUP BY 1, 2
    ),
    het AS (
      SELECT marker,
             CAST(COUNT(*) AS BIGINT) AS n_studies,
             SUM(beta * beta / (se * se))
               - POW(SUM(beta / (se * se)), 2) / SUM(1.0 / (se * se)) AS q
      FROM per GROUP BY 1 HAVING COUNT(*) >= 2
    )
    SELECT marker, n_studies,
           ROUND(q, 6) AS cochran_q,
           ROUND(CASE WHEN q > n_studies - 1
                      THEN (q - (n_studies - 1)) / q
                      ELSE 0.0 END, 6) AS i_squared
    FROM het
    """,
)
def g14_heterogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Between-study heterogeneity per marker — Cochran's Q and Higgins'
    I² — the statistic a meta-analyst reads NEXT to g12's pooled
    estimate (a significant β_meta with I² > 0.75 means the studies
    disagree and the fixed-effect pool is misleading; the reference's
    multi-study warehouse is exactly the input this audits). Same
    deterministic GWAS mapping and per-(marker, study) grain as g12.

    Q = Σ wᵢ(βᵢ − β̄w)² computed via the one-pass algebraic identity
    Σwβ² − (Σwβ)²/Σw, so the marker-grain aggregate needs NO join back
    to the pooled estimate — two stacked skinny aggregates total, same
    shuffle shape as g12. I² = max(0, (Q − df)/Q), df = n−1."""
    li = table(spark, sf_dir, "lineitem")
    res = li.select(
        F.col("l_partkey").alias("marker"),
        (F.col("l_suppkey") % 3).alias("study"),
        (F.col("l_discount") - 0.05).cast("double").alias("beta"),
        (F.col("l_tax") + 0.01).cast("double").alias("se"),
    )
    per = res.groupBy("marker", "study").agg(
        F.avg("beta").alias("beta"), F.avg("se").alias("se")
    )
    # Operation order mirrors the oracle exactly (x/(se*se), not
    # x*(1/(se*se))): reciprocal-then-multiply differs from direct
    # division by ~1 ulp, and bit-identity must not lean on the 6-dp
    # rounding slack.
    se2 = F.col("se") * F.col("se")
    het = (
        per.groupBy("marker")
        .agg(
            F.count(F.lit(1)).alias("n_studies"),
            (
                F.sum(F.col("beta") * F.col("beta") / se2)
                - F.pow(F.sum(F.col("beta") / se2), 2) / F.sum(F.lit(1.0) / se2)
            ).alias("q"),
        )
        .filter(F.col("n_studies") >= 2)
    )
    df = (F.col("n_studies") - 1).cast("double")
    return het.select(
        "marker",
        "n_studies",
        F.round("q", 6).alias("cochran_q"),
        F.round(
            F.when(F.col("q") > df, (F.col("q") - df) / F.col("q")).otherwise(0.0),
            6,
        ).alias("i_squared"),
    )


@query(
    "s27_orc_roundtrip",
    "S8,S9,S-ext",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts
    FROM documents GROUP BY source
    """,
)
def s27_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-interchange round-trip through ORC (the fourth sink/source
    format after parquet, CSV/gzip-CSV, and JSONL): corpus → snappy ORC →
    typed read-back, digest-aggregated per source to prove byte fidelity
    through the codec and the second columnar layout. Unlike s25's gzip
    CSV, ORC IS splittable (stripe-level splits + predicate pushdown via
    stripe/row-group statistics, same as parquet row groups) — at 100 TB
    it's a legitimate interchange target rather than a task-parallelism
    hazard, which is why the writer here doesn't need s25's
    file-count-controls-parallelism workaround."""
    from gwasdb_spark.plans.helpers import stage_dir

    d = table(spark, sf_dir, "documents")
    out = stage_dir("docs_orc")
    d.write.mode("overwrite").option("compression", "snappy").orc(out)
    back = spark.read.schema(
        "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).orc(out)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.count_distinct(F.md5("text")).alias("n_distinct_texts"),
    )


@query(
    "g15_prs_score",
    "X-gwas,J1,A2",
    oracle="""
    WITH geno AS (
      SELECT o.o_custkey AS individual,
             CAST(ROUND((l.l_discount - 0.05) * 100) AS BIGINT) AS beta_c,
             CAST(l.l_quantity AS BIGINT) % 3 AS dosage
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT individual,
           CAST(COUNT(*) AS BIGINT) AS n_loci,
           CAST(SUM(beta_c * dosage) AS DOUBLE) / 100.0 AS prs
    FROM geno GROUP BY individual
    """,
)
def g15_prs_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polygenic-risk-score aggregation — the flagship downstream use of
    a GWAS warehouse: each individual's score is Σ β_marker × dosage
    over their genotyped loci. Deterministic mapping in the g10-g14
    family: individual = o_custkey (fact→orders join), marker effect
    β from l_discount, allele dosage 0/1/2 from l_quantity mod 3.

    Exactness discipline (helpers module docstring): β becomes integer
    CENTS before the multiply-accumulate, so the per-individual sum is
    exact int64 (< 2^53) and ONE final division yields a bit-identical
    double in both engines regardless of FP summation order — the same
    trick the revenue queries use, applied to effect sizes.

    Scale: one fact-to-orders equi-join (both SF-proportional — no
    broadcast hint, AQE decides) followed by an individual-grain
    aggregate; shuffles carry (individual, 2 longs). At biobank scale
    (500k individuals × 1M markers) this is the textbook
    partial-agg-then-exchange plan — dosage rows reduce map-side."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    geno = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("individual"),
        F.round((F.col("l_discount") - 0.05) * 100)
        .cast("long")
        .alias("beta_c"),
        (F.col("l_quantity").cast("long") % 3).alias("dosage"),
    )
    return geno.groupBy("individual").agg(
        F.count(F.lit(1)).cast("long").alias("n_loci"),
        (F.sum(F.col("beta_c") * F.col("dosage")).cast("double") / F.lit(100.0)).alias(
            "prs"
        ),
    )
