"""Adapted TPC-H decision-support queries (Q7-Q19, Q22) over the test schema.

The reference's analytical surface (gwasDB/app.R:92-154 — filtered joins,
grouped aggregates, ranked windows over the marker star schema) is stressed
here with the classic TPC-H shapes, adapted to the driver's slimmer test
tables (no partsupp; lineitem has no commit/receipt dates or shipmode; part
has no container/mfgr). Every query follows the repo's exact-integer money
discipline (plans/helpers.py) so the DuckDB oracle hash-matches bit-for-bit.

Scale stance (100 TB): only fixed-cardinality dims (`nation`, `region`) and
single-row scalar aggregates are broadcast-hinted. customer / supplier /
part / orders / lineitem are SF-proportional — their joins carry no hints so
AQE picks broadcast at small SF and sort-merge at large, and skew handling
stays available.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gwasdb_spark.catalog import table
from gwasdb_spark.plans.base import query
from gwasdb_spark.plans.helpers import cents, money

# Exact 1e-4-dollar revenue term: cents * (100 - discount-cents).
_SQL_REV_E4 = (
    "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))"
)


def _rev_e4() -> F.Column:
    return cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))


def _money_e4(sum_col: F.Column) -> F.Column:
    return sum_col.cast("double") / F.lit(10000.0)


@query(
    "q07_nation_volume",
    "J1,J5,A2,F4",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
           (CAST(SUM({_SQL_REV_E4}) AS DOUBLE) / 10000.0) AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      AND n1.n_name <> n2.n_name
    GROUP BY n1.n_name, n2.n_name, YEAR(l.l_shipdate)
    """,
)
def q07_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 adapted (cross-border volume by supplier-nation ×
    customer-nation pair × ship year; all pairs rather than one fixed pair,
    so the small-SF fixtures still produce rows). The inequality lands after
    the two broadcast `nation` joins; the two-year shipdate window prunes
    lineitem at the scan. No hints on the SF-proportional sides."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    sup = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    joined = (
        li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(_money_e4(F.sum(_rev_e4())).alias("revenue"))


@query(
    "q08_market_share",
    "J1,J5,A2,P15",
    oracle=f"""
    SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
      CASE WHEN SUM({_SQL_REV_E4}) > 0 THEN
        CAST(SUM(CASE WHEN n1.n_name = 'NATION_1' THEN {_SQL_REV_E4}
                      ELSE 0 END) AS DOUBLE)
          / CAST(SUM({_SQL_REV_E4}) AS DOUBLE)
      ELSE NULL END AS mkt_share
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    JOIN region r   ON n2.n_regionkey = r.r_regionkey
    WHERE p.p_type = 'PROMO' AND r.r_name = 'EUROPE'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY YEAR(o.o_orderdate)
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share within a region's PROMO-part market,
    by order year). Numerator and denominator accumulate in the same exact
    integer space, so the share divides two bit-identical doubles. The
    region→nation chain is broadcast (fixed-size); part is filtered on type
    at the scan but carries no hint (SF-proportional)."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"),
            F.col("n_regionkey").alias("n2_region"),
        )
    )
    reg = F.broadcast(
        table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    )
    rev = _rev_e4()
    joined = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .join(reg, F.col("n2_region") == F.col("r_regionkey"))
    )
    num = F.sum(F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(F.lit(0)))
    den = F.sum(rev)
    return joined.groupBy(
        F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(
        F.when(den > 0, num.cast("double") / den.cast("double"))
        .otherwise(F.lit(None))
        .alias("mkt_share")
    )


@query(
    "q09_product_profit",
    "J1,A2,F4,P9",
    oracle="""
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
      (CAST(SUM(
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
         - CAST(ROUND(p.p_retailprice * 100) AS BIGINT)
           * CAST(l.l_quantity AS BIGINT) * 50
       ) AS DOUBLE) / 10000.0) AS profit
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    """,
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted (no partsupp table: supply cost is modeled as half
    the part's retail price, so profit = disc-price − 0.5·retail·qty, all in
    exact 1e-4-dollar integers). Profit by supplier nation and order year
    for parts whose name contains 'red'. The name filter prunes part before
    the fact join; nation is the only broadcast."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    sup = table(spark, sf_dir, "supplier")
    orders = table(spark, sf_dir, "orders")
    nat = F.broadcast(table(spark, sf_dir, "nation"))
    profit_e4 = _rev_e4() - cents(F.col("p_retailprice")) * F.col("l_quantity").cast(
        "long"
    ) * F.lit(50)
    joined = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").cast("long").alias("o_year"),
    ).agg(_money_e4(F.sum(profit_e4)).alias("profit"))


@query(
    "q10_returned_items",
    "J1,J5,A2,O1,O4",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment, n.n_name,
           (CAST(SUM({_SQL_REV_E4}) AS DOUBLE) / 10000.0) AS revenue
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, c.c_mktsegment, n.n_name
    ORDER BY SUM({_SQL_REV_E4}) DESC, c.c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: top-20 customers by revenue lost to returns in one
    quarter. Ranking happens on the exact integer revenue (ties broken by
    custkey) so the LIMIT selects the same rows in both engines. The final
    sort is a TakeOrderedAndProject over the grouped aggregate — only 20
    rows ever reach the driver."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    cust = table(spark, sf_dir, "customer")
    nat = F.broadcast(table(spark, sf_dir, "nation"))
    grouped = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "c_mktsegment", "n_name")
        .agg(F.sum(_rev_e4()).alias("rev_e4"))
    )
    return (
        grouped.orderBy(F.col("rev_e4").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "c_mktsegment",
            "n_name",
            _money_e4(F.col("rev_e4")).alias("revenue"),
        )
    )


@query(
    "q12_late_priority",
    "J1,A2,P15,F4",
    oracle="""
    SELECT l.l_linestatus,
      CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l.l_linestatus
    """,
)
def q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no shipmode column: lines group by linestatus, and
    'late' is shipdate > orderdate + 90 d). Counts high- vs low-priority
    orders among late 1996 lines. The cross-table lateness predicate can't
    be pushed below the join, but the one-year shipdate window prunes
    lineitem at the scan; both sides are SF-proportional so the (orderkey)
    shuffle join carries no hint."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    joined = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")
    )
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


@query(
    "q14_promo_revenue",
    "J1,A1,P15",
    oracle=f"""
    SELECT CASE WHEN SUM({_SQL_REV_E4}) > 0 THEN
      (100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_SQL_REV_E4}
                             ELSE 0 END) AS DOUBLE))
        / CAST(SUM({_SQL_REV_E4}) AS DOUBLE)
    ELSE NULL END AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    GROUP BY ALL
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO-type parts.
    Global single-row aggregate: both conditional sums accumulate exactly,
    one final double division (ANSI-guarded against an empty month)."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    part = table(spark, sf_dir, "part")
    rev = _rev_e4()
    num = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
    den = F.sum(rev)
    return li.join(part, li["l_partkey"] == part["p_partkey"]).agg(
        F.when(den > 0, (F.lit(100.0) * num.cast("double")) / den.cast("double"))
        .otherwise(F.lit(None))
        .alias("promo_revenue_pct")
    )


@query(
    "q15_top_supplier",
    "J1,A2,P12,O1",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey, SUM({_SQL_REV_E4}) AS rev_e4
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           (CAST(rev.rev_e4 AS DOUBLE) / 10000.0) AS total_revenue
    FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
    WHERE rev.rev_e4 = (SELECT MAX(rev_e4) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue. The scalar
    max is a single-row aggregate broadcast back onto the per-supplier
    rollup — the comparison happens on exact integers, so 'ties all appear'
    exactly as in the oracle's subquery, with no driver-side collect."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_e4()).alias("rev_e4"))
    mx = rev.agg(F.max("rev_e4").alias("mx_e4"))
    sup = table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev["rev_e4"] == mx["mx_e4"])
        .join(sup, F.col("l_suppkey") == sup["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            _money_e4(F.col("rev_e4")).alias("total_revenue"),
        )
    )


@query(
    "q17_small_quantity_revenue",
    "J1,A1,A2,P6",
    oracle="""
    WITH pavg AS (
      SELECT l_partkey,
             0.2 * (CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*))
               AS qty_cut
      FROM lineitem GROUP BY l_partkey
    )
    SELECT (CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
              / 100.0 / 7.0) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN pavg   ON l.l_partkey = pavg.l_partkey
    WHERE p.p_brand = 'Brand#11' AND CAST(l.l_quantity AS DOUBLE) < pavg.qty_cut
    GROUP BY ALL
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue that would be lost by refusing small orders —
    lines of one brand whose quantity is below 20% of that part's average.
    The per-part average is a first groupBy over lineitem re-joined to the
    fact (self-join on partkey); the brand filter prunes `part` before its
    join, and the threshold (0.2 × exact-int avg) is bit-identical in both
    engines. No hints: at scale both the rollup and the fact shuffle on
    partkey and co-locate."""
    li = table(spark, sf_dir, "lineitem")
    pavg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(F.col("l_quantity").cast("long")).cast("double")
                / F.count(F.lit(1))
            )
        ).alias("qty_cut")
    )
    part = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#11")
    joined = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(pavg, li["l_partkey"] == pavg["avg_partkey"])
        .filter(F.col("l_quantity").cast("double") < F.col("qty_cut"))
    )
    return joined.agg(
        (
            F.sum(cents(F.col("l_extendedprice"))).cast("double")
            / F.lit(100.0)
            / F.lit(7.0)
        ).alias("avg_yearly")
    )


@query(
    "q18_large_orders",
    "J1,A2,P6,O1,O4",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
               AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
    )
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice, big.total_qty
    FROM big
    JOIN orders o   ON big.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY CAST(ROUND(o.o_totalprice * 100) AS BIGINT) DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: the 100 priciest orders among those totalling > 300 units.
    The HAVING rollup shrinks lineitem to qualifying orderkeys before any
    join; ranking uses exact integer cents with an orderkey tiebreak so the
    LIMIT is deterministic across engines (TakeOrderedAndProject — 100 rows
    to the driver regardless of SF)."""
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .orderBy(cents(F.col("o_totalprice")).desc(), F.col("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


@query(
    "q19_bracket_revenue",
    "J1,A1,P6,P11,P15",
    oracle=f"""
    SELECT (CAST(SUM({_SQL_REV_E4}) AS DOUBLE) / 10000.0) AS revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 20
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#31' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity BETWEEN 20 AND 30)
    GROUP BY ALL
    """,
)
def q19_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 adapted (no container column: brackets are brand × size
    range × quantity range). The disjunction references both join sides, so
    it stays a post-join filter on the partkey equi-join — but Catalyst
    still pushes the brand/size disjunction's part-only implication down to
    the part scan via constraint propagation, and a single exact-int sum
    comes back."""
    li = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part")
    qty = F.col("l_quantity")
    bracket = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 10)
            & qty.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#21")
            & F.col("p_size").between(1, 20)
            & qty.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#31")
            & F.col("p_size").between(1, 30)
            & qty.between(20, 30)
        )
    )
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .filter(bracket)
        .agg(_money_e4(F.sum(_rev_e4())).alias("revenue"))
    )


@query(
    "q22_idle_customers",
    "J6,A1,A2,P6",
    oracle="""
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / COUNT(*) AS cut_cents
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
           (CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
              / 100.0) AS totacctbal
    FROM customer c, avg_bal
    WHERE CAST(ROUND(c.c_acctbal * 100) AS BIGINT) > avg_bal.cut_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY c.c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 adapted (no phone column: grouping is by market segment).
    Rich-but-idle customers: balance above the positive-balance average,
    no recent orders (none since 2000). The global average is a single-row
    aggregate
    cross-joined in broadcast form (no collect); the no-recent-orders test
    is a LEFT ANTI join on custkey — at scale a shuffled anti join with the
    orders side date-pruned at the scan and pre-projected to its key
    column only."""
    cust = table(spark, sf_dir, "customer")
    bal_c = cents(F.col("c_acctbal"))
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(bal_c).cast("double") / F.count(F.lit(1))).alias("cut_cents")
    )
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        bal_c.cast("double") > F.col("cut_cents")
    )
    idle = rich.join(orders, rich["c_custkey"] == orders["o_custkey"], "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("numcust"),
        (F.sum(bal_c).cast("double") / F.lit(100.0)).alias("totacctbal"),
    )


@query(
    "q13_customer_distribution",
    "Q13,J-outer,A-group",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    join with a join-condition filter (the filter must ride the join, NOT
    the WHERE — a WHERE would drop zero-order customers), then a
    histogram of the grouped counts. The double aggregation is two skinny
    shuffles: (custkey) then (c_count). Priority filter adapts the
    spec's comment NOT LIKE (no comment column in the slim schema)."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    joined = c.join(
        o,
        (c["c_custkey"] == o["o_custkey"])
        & (o["o_orderpriority"] != "5-LOW"),
        "left",
    )
    counts = joined.groupBy("c_custkey").agg(
        F.count("o_orderkey").alias("c_count")
    )
    return counts.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "q16_supplier_relation",
    "Q16,J-anti,A-distinct",
    oracle="""
    SELECT p.p_brand, p.p_type,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size IN (1, 2, 3, 4)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type
    """,
)
def q16_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier-relationship count): distinct-supplier
    counts per part group with a NOT IN exclusion subquery — planned as
    a broadcast ANTI join (the excluded set is tiny by construction;
    NOT IN's null-trap is avoided because s_suppkey is a key). The
    lineitem⋈part join stands in for partsupp in the slim schema."""
    l = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size").isin(1, 2, 3, 4))
        .select("p_partkey", "p_brand", "p_type")
    )
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        l.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q21_waiting_supplier",
    "Q21,J-semi,J-anti",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    ),
    all_sup AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (
        SELECT 1 FROM all_sup l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM late) l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
      )
    GROUP BY s.s_name
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    EXISTS / NOT EXISTS double correlated subquery, planned as a semi
    join (another supplier exists on the order) plus an anti join (no
    OTHER supplier was late) over the deduplicated (order, supplier)
    relation. 'Late' adapts to shipdate > orderdate + 90 days (the slim
    schema has no commit/receipt dates). Both probes are skinny
    two-column shuffles."""
    l = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # Set-algebra rewrite of the EXISTS / NOT EXISTS pair: a late
    # supplier qualifies iff its order has ≥2 distinct suppliers
    # (EXISTS another) and exactly 1 distinct LATE supplier (NOT EXISTS
    # another late one — that supplier is itself). ONE pass over
    # lineitem⋈orders produces the deduplicated (order, supplier,
    # late_any) relation; both per-order probes are aggregates of that
    # same relation (the round-3 form scanned lineitem twice more).
    order_sup = (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                (F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 90)).cast(
                    "int"
                )
            ).alias("late_any")
        )
    )
    per_order = order_sup.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_sups"),
        F.sum("late_any").alias("n_late"),
    )
    lonely_late = (
        order_sup.filter(F.col("late_any") == 1)
        .join(
            per_order.filter((F.col("n_late") == 1) & (F.col("n_sups") >= 2)),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        lonely_late.join(s, lonely_late["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q11_important_stock",
    "A2,J5,P14",
    oracle="""
    WITH psv AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS cost_e2,
             SUM(CAST(l_quantity AS BIGINT)) AS availqty
      FROM lineitem GROUP BY 1, 2
    ),
    scoped AS (
      SELECT ps.ps_partkey, ps.cost_e2 * ps.availqty AS v_e2
      FROM psv ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
    ),
    per_part AS (
      SELECT ps_partkey, SUM(v_e2) AS v_e2 FROM scoped GROUP BY 1
    )
    SELECT ps_partkey, (CAST(v_e2 AS DOUBLE) / 100.0) AS value
    FROM per_part
    WHERE CAST(v_e2 AS DOUBLE) > (SELECT SUM(v_e2) FROM per_part) * 0.0005
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock in one nation): per-part inventory
    value within NATION_7's suppliers, kept when it exceeds a fraction of
    the nation's total. Adaptations for the slim schema: partsupp derives
    from lineitem (supplycost = MIN extendedprice, availqty = SUM
    quantity); the fraction is 0.0005 (vs TPC-H's 0.0001/SF) so the HAVING
    discriminates at the test SFs. Physical shape: one (part,supp)
    aggregate reused for both the per-part values and the global
    threshold; the threshold is a broadcast 1-row cross join (never a
    driver collect); nation is the only broadcast-hinted dim."""
    li = table(spark, sf_dir, "lineitem")
    psv = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(cents(F.col("l_extendedprice"))).alias("cost_e2"),
        F.sum(F.col("l_quantity").cast("long")).alias("availqty"),
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    scoped = (
        psv.join(s, psv["ps_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("ps_partkey", (F.col("cost_e2") * F.col("availqty")).alias("v_e2"))
    )
    # Lazy localCheckpoint: per_part feeds BOTH the output rows and the
    # global threshold; without it the whole lineitem→join→agg pipeline
    # plans twice (exchange reuse does not canonicalize across the
    # self-referencing cross join) and the fact table scans twice. The
    # checkpoint holds |parts-in-nation| rows — dimension-sized, far
    # below the fact table, and computed exactly once per action.
    per_part = (
        scoped.groupBy("ps_partkey")
        .agg(F.sum("v_e2").alias("v_e2"))
        .localCheckpoint(eager=False)
    )
    total = per_part.agg(F.sum("v_e2").alias("total_e2"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("v_e2").cast("double") > F.col("total_e2").cast("double") * F.lit(0.0005)
        )
        .select("ps_partkey", (F.col("v_e2").cast("double") / F.lit(100.0)).alias("value"))
    )


@query(
    "q20_excess_stock_suppliers",
    "J9,P12,A2",
    oracle="""
    WITH promo AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
    ),
    y96 AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q96
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    ),
    y97 AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS BIGINT)) AS q97
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    ),
    qual AS (
      SELECT DISTINCT a.l_suppkey
      FROM y96 a
      JOIN promo p ON a.l_partkey = p.p_partkey
      LEFT JOIN y97 b
        ON a.l_partkey = b.l_partkey AND a.l_suppkey = b.l_suppkey
      WHERE CAST(a.q96 AS DOUBLE) > 0.5 * CAST(COALESCE(b.q97, 0) AS DOUBLE)
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (SELECT l_suppkey FROM qual)
    """,
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess stock of promotable parts):
    NATION_3 suppliers whose 1996 shipments of 'small%' parts exceed half
    their 1997 demand for the same part. Adaptations: availqty derives
    from 1996 shipped quantity (the slim schema has no partsupp), demand
    from the 1997 window; (part,supp) pairs with no 1997 rows count as
    zero demand (COALESCE — the nested-IN chain otherwise drops them on
    NULL comparison, which engines disagree about). Physical shape: two
    skinny per-(part,supp) aggregates off one lineitem scan branch, promo
    part filter as an equi-join, final membership as a semi join."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )

    def in_year(y0: str, y1: str):
        return (F.col("l_shipdate") >= F.lit(y0).cast("timestamp")) & (
            F.col("l_shipdate") < F.lit(y1).cast("timestamp")
        )

    # ONE fact scan + ONE (part,supp) shuffle: both year windows fold
    # into conditional sums (the y96 ⟕ y97 join of the SQL form is the
    # same relation — q96 non-null ⇔ the pair shipped in 1996). At scale
    # this halves both the scan and the exchange vs two year-filtered
    # aggregates.
    per_ps = (
        li.filter(in_year("1996-01-01", "1998-01-01"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(
                F.when(
                    in_year("1996-01-01", "1997-01-01"),
                    F.col("l_quantity").cast("long"),
                )
            ).alias("q96"),
            F.sum(
                F.when(
                    in_year("1997-01-01", "1998-01-01"),
                    F.col("l_quantity").cast("long"),
                )
            ).alias("q97"),
        )
        .filter(F.col("q96").isNotNull())
    )
    promo = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("small"))
        .select("p_partkey")
    )
    qual = (
        per_ps.join(promo, per_ps["l_partkey"] == promo["p_partkey"])
        .filter(
            F.col("q96").cast("double")
            > F.lit(0.5) * F.coalesce(F.col("q97"), F.lit(0)).cast("double")
        )
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(qual, s["s_suppkey"] == qual["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
    )
