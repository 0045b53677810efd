"""Ranking, inference, and series-diagnostic operators (round 7, batch 4).

Rounds out the evaluation story started in eval_ops.py (x119-x123):
x119's AUC says the quality score RANKS well and x120 says it's
calibrated — this module adds the remaining evaluations a pipeline
operator actually reads, each with the registry's exactness discipline
(integer/128-bit-integer algebra end-to-end, one final division, 9-dp
rounds only where libm transcendentals force them):

- x124: NDCG@10 of the BM25 ranking against a term-coverage relevance
  grade — THE positional IR metric; AUC can't see position.
- x125: precision/recall/F1 threshold sweep for the x59 quality gate —
  the table you read to PICK the gate threshold x120 validated.
- x126: Adamic-Adar link prediction over the within-brand co-purchase
  graph — wedge fan-out bounded exactly like triangle counting.
- x127: autocorrelation (lags 1..10) of daily order revenue in EXACT
  128-bit integer algebra (Spark decimal(38,0) / DuckDB HUGEINT) — a
  sum-of-products ACF in doubles drifts across engines; this one is
  bit-identical.
- x128: Benford first-digit audit of order totals — the classic
  fabricated-data screen; digits read from exact integer cents, never
  log10 of a double.
- x129: Kaplan-Meier survival of user activity lifetimes with censoring
  — retention (x61) without the immortal-cohort bias: users still
  active at the observation edge are censored, not counted as churned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gwasdb_spark.catalog import table
from gwasdb_spark.operators.sampling import global_row_number
from gwasdb_spark.plans.base import query

# Tokenizer CTE shared by the BM25 oracles (extensions.py x12 family) —
# restated here so x124 grades the SAME ranking the x12 oracle produces.
_TOKS_CTE = r"""
    toks AS (
      SELECT doc_id AS doc,
             unnest(string_split_regex(lower(trim(text)), '[^a-z0-9]+')) AS term
      FROM documents
    ),
    postings AS (
      SELECT doc, term, COUNT(*) AS tf FROM toks WHERE term <> ''
      GROUP BY 1, 2
    ),
    doclen AS (SELECT doc, SUM(tf) AS dl FROM postings GROUP BY 1),
    consts AS (
      SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
             (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) FROM doclen) AS avgdl
    ),
    q(term) AS (VALUES ('hash'), ('join'), ('vector')),
    hit AS (SELECT p.doc, p.term, p.tf FROM postings p JOIN q USING (term)),
    dfc AS (SELECT term, COUNT(DISTINCT doc) AS df_t FROM hit GROUP BY 1),
    scored AS (
      SELECT doc,
             SUM(ln((n_docs - df_t + 0.5) / (df_t + 0.5) + 1.0)
                 * (tf * 2.2)
                 / (tf + 1.2 * (1 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))
             ) AS score
      FROM hit JOIN dfc USING (term) JOIN doclen USING (doc) CROSS JOIN consts
      GROUP BY doc
    )
"""

_LN2 = "0.6931471805599453"


@query(
    "x124_ndcg_at_10",
    "X-search,X-eval",
    oracle=f"""
    WITH {_TOKS_CTE},
    top AS (
      SELECT doc, ROW_NUMBER() OVER (ORDER BY score DESC, doc) AS rank
      FROM scored
      QUALIFY rank <= 10
    ),
    rel AS (
      SELECT doc, CAST(COUNT(DISTINCT term) AS INT) AS rel FROM hit GROUP BY 1
    ),
    grades AS (
      SELECT CAST(SUM(CASE WHEN rel = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
             CAST(SUM(CASE WHEN rel = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3
      FROM rel
    ),
    dcg AS (
      SELECT SUM((CASE rel WHEN 3 THEN 7.0 WHEN 2 THEN 3.0 ELSE 1.0 END)
                 * {_LN2} / ln(rank + 1)) AS dcg
      FROM top JOIN rel USING (doc)
    ),
    ideal AS (
      SELECT SUM((CASE WHEN r <= c3 THEN 7.0
                       WHEN r <= c3 + c2 THEN 3.0
                       WHEN r <= c3 + c2 + c1 THEN 1.0
                       ELSE 0.0 END) * {_LN2} / ln(r + 1)) AS idcg
      FROM range(1, 11) t(r) CROSS JOIN grades
    )
    SELECT c1 AS n_rel1, c2 AS n_rel2, c3 AS n_rel3,
           ROUND(dcg, 9) AS dcg, ROUND(idcg, 9) AS idcg,
           ROUND(dcg / idcg, 9) AS ndcg
    FROM grades CROSS JOIN dcg CROSS JOIN ideal
    """,
)
def x124_ndcg_at_10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the x12 BM25 ranking, graded by term coverage: a doc
    matching all 3 query terms is grade 3 (gain 7 = 2^g − 1), 2 terms →
    gain 3, 1 term → gain 1 — a deterministic relevance label that
    needs no human judgments, so the metric is oracle-checkable. AUC
    (x119) is position-blind; NDCG is what a search/RAG retriever is
    actually graded on. Shape: the ranking is bm25_topk's k-row
    TakeOrdered head; relevance grades are computed ONLY for those k
    docs (corpus joined against the broadcast 10-row head — never the
    reverse); the ideal ranking never materializes a sorted corpus —
    IDCG needs only the per-grade COUNTS (c3 docs of gain 7 fill the
    first c3 positions, and so on), a 3-number aggregate joined to a
    10-row position spine. The only doubles are the ln() discounts
    (libm 1-ulp → the 9-dp round); every count is exact BIGINT."""
    from gwasdb_spark.operators.search import bm25_topk

    terms = ["hash", "join", "vector"]
    d = table(spark, sf_dir, "documents")
    top = bm25_topk(d, terms, "doc_id", "text", k=10).select("doc_id", "rank")
    toks = F.array_distinct(
        F.split(F.lower(F.trim(F.col("text"))), "[^a-z0-9]+")
    )
    rel_all = d.select(
        "doc_id",
        F.size(
            F.array_intersect(toks, F.array(*[F.lit(t) for t in terms]))
        ).alias("rel"),
    ).filter(F.col("rel") > 0)
    grades = rel_all.agg(
        F.sum(F.when(F.col("rel") == 1, 1).otherwise(0))
        .cast("long")
        .alias("c1"),
        F.sum(F.when(F.col("rel") == 2, 1).otherwise(0))
        .cast("long")
        .alias("c2"),
        F.sum(F.when(F.col("rel") == 3, 1).otherwise(0))
        .cast("long")
        .alias("c3"),
    )
    gain = (
        F.when(F.col("rel") == 3, F.lit(7.0))
        .when(F.col("rel") == 2, F.lit(3.0))
        .otherwise(F.lit(1.0))
    )
    ln2 = F.lit(float(_LN2))
    dcg = (
        rel_all.join(F.broadcast(top), "doc_id")
        .agg(F.sum(gain * ln2 / F.log(F.col("rank") + 1)).alias("dcg"))
    )
    ideal_gain = (
        F.when(F.col("r") <= F.col("c3"), F.lit(7.0))
        .when(F.col("r") <= F.col("c3") + F.col("c2"), F.lit(3.0))
        .when(
            F.col("r") <= F.col("c3") + F.col("c2") + F.col("c1"), F.lit(1.0)
        )
        .otherwise(F.lit(0.0))
    )
    ideal = (
        spark.range(1, 11)
        .select(F.col("id").alias("r"))
        .crossJoin(F.broadcast(grades))
        .agg(F.sum(ideal_gain * ln2 / F.log(F.col("r") + 1)).alias("idcg"))
    )
    return (
        grades.crossJoin(F.broadcast(dcg))
        .crossJoin(F.broadcast(ideal))
        .select(
            F.col("c1").alias("n_rel1"),
            F.col("c2").alias("n_rel2"),
            F.col("c3").alias("n_rel3"),
            F.round("dcg", 9).alias("dcg"),
            F.round("idcg", 9).alias("idcg"),
            F.round(F.col("dcg") / F.col("idcg"), 9).alias("ndcg"),
        )
    )


# x59's score CTE (eval_ops._QUALITY_SCORE_CTE) — imported, not restated.
from gwasdb_spark.plans.eval_ops import _QUALITY_SCORE_CTE, _scored_docs


@query(
    "x125_pr_threshold_sweep",
    "X-quality,X-eval",
    oracle=f"""
    WITH {_QUALITY_SCORE_CTE},
    b AS (
      SELECT LEAST(CAST(ROUND(score * 1000000) AS BIGINT) // 100000, 9)
               AS bin,
             pos
      FROM scored
    ),
    binned AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS np
      FROM b GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_all,
             CAST(SUM(np) AS BIGINT) AS p_all
      FROM binned
    ),
    sweep AS (
      SELECT t.t AS ti,
             CAST(SUM(CASE WHEN bin >= t.t THEN n ELSE 0 END) AS BIGINT)
               AS n_pred,
             CAST(SUM(CASE WHEN bin >= t.t THEN np ELSE 0 END) AS BIGINT)
               AS tp
      FROM binned CROSS JOIN range(0, 10) t(t)
      GROUP BY 1
    )
    SELECT CAST(ti AS DOUBLE) / 10.0 AS threshold, n_pred, tp,
           CASE WHEN n_pred > 0
                THEN CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END
             AS prec,
           CAST(tp AS DOUBLE) / CAST(p_all AS DOUBLE) AS rec,
           CAST(2 * tp AS DOUBLE) / CAST(n_pred + p_all AS DOUBLE) AS f1
    FROM sweep CROSS JOIN tot
    """,
)
def x125_pr_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 of the x59 quality gate at every decile
    threshold (predict positive when score ≥ t, t = 0.0 … 0.9) — the
    operating-characteristic table an operator reads to SET the gate
    x120 calibrated. One corpus scan into a 10-bin integer aggregate
    (the x120 binning, so thresholds land exactly on bin edges), then
    the sweep is bins × thresholds = a 100-row fan over the bounded bin
    relation — no window, no second scan, no per-threshold pass. All
    counts are exact BIGINT; each metric is one final division of
    identical integers, so no rounding is needed for cross-engine
    hash equality (precision is NULL, not NaN, when nothing is
    predicted positive)."""
    binned = (
        _scored_docs(spark, sf_dir)
        .select(
            F.least(F.expr("cast(round(score * 1000000) as long) div 100000"),
                    F.lit(9)).alias("bin"),
            F.col("pos").cast("long").alias("pos"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("pos").cast("long").alias("np"),
        )
        # ≤10 rows, feeds BOTH the totals and the sweep — pin so the
        # corpus scan + scoring runs once, not once per consumer
        .localCheckpoint(eager=False)
    )
    tot = binned.agg(
        F.sum("n").cast("long").alias("n_all"),
        F.sum("np").cast("long").alias("p_all"),
    )
    thresholds = spark.range(0, 10).select(F.col("id").alias("ti"))
    sweep = (
        binned.crossJoin(F.broadcast(thresholds))
        .groupBy("ti")
        .agg(
            F.sum(F.when(F.col("bin") >= F.col("ti"), F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_pred"),
            F.sum(
                F.when(F.col("bin") >= F.col("ti"), F.col("np")).otherwise(0)
            )
            .cast("long")
            .alias("tp"),
        )
    )
    return sweep.crossJoin(F.broadcast(tot)).select(
        (F.col("ti").cast("double") / 10.0).alias("threshold"),
        "n_pred",
        "tp",
        F.when(
            F.col("n_pred") > 0,
            F.col("tp").cast("double") / F.col("n_pred").cast("double"),
        ).alias("prec"),
        (F.col("tp").cast("double") / F.col("p_all").cast("double")).alias(
            "rec"
        ),
        (
            (2 * F.col("tp")).cast("double")
            / (F.col("n_pred") + F.col("p_all")).cast("double")
        ).alias("f1"),
    )


@query(
    "x126_adamic_adar",
    "X-graph,X-eval",
    oracle="""
    WITH lp AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#12'
    ),
    cop AS (
      SELECT a.p AS u, b.p AS v FROM lp a JOIN lp b
        ON a.o = b.o AND a.p < b.p
      GROUP BY 1, 2
    ),
    edges AS (SELECT u, v FROM cop UNION SELECT v, u FROM cop),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY 1),
    wedge AS (
      SELECT e1.u AS id_a, e2.v AS id_b, e1.v AS w
      FROM edges e1 JOIN edges e2 ON e1.v = e2.u
      WHERE e1.u < e2.v
    ),
    cand AS (
      SELECT id_a, id_b, w FROM wedge wg
      WHERE NOT EXISTS (SELECT 1 FROM edges e
                        WHERE e.u = wg.id_a AND e.v = wg.id_b)
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_common,
           ROUND(SUM(1.0 / ln(CAST(deg.d AS DOUBLE))), 9) AS aa_score
    FROM cand JOIN deg ON deg.u = cand.w
    GROUP BY 1, 2
    """,
)
def x126_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction over the within-brand co-purchase
    graph (parts of one brand that shared an order): for every
    non-adjacent pair with ≥1 common neighbor, score Σ_w 1/ln(deg(w)) —
    "which substitute pairs does the basket graph PREDICT but hasn't
    directly observed?", discounting hub neighbors. (The near-dup pair
    graph is the WRONG substrate for this metric: textual similarity is
    near-transitive, so every wedge there closes and the prediction set
    is empty — x63's triangle counts measure that closure instead.)
    Shape: edges come from one distinct-(order, part) self-equi-join on
    the order key — bounded by basket size² like x60, never |parts|² —
    with the node set pre-pruned to one brand's catalog (|parts|/25) by
    a pushed-down scan filter; then one wedge self-join of the
    symmetrized edge relation (fan-out bounded by Σ deg² exactly like
    x63's triangle count), an anti-join removes observed edges, and
    degrees join back as an equi-join on the wedge center. Common
    neighbors of a wedge always have degree ≥ 2, so ln(deg) ≥ ln 2 > 0 —
    no division hazard. Counts are exact; the score's double terms get
    the 9-dp libm round."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12")
    lp = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a, b = lp.alias("a"), lp.alias("b")
    pairs = (
        a.join(b, (F.col("a.o") == F.col("b.o")) & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("u"), F.col("b.p").alias("v"))
        .distinct()
    )
    e = (
        pairs.union(pairs.select(F.col("v"), F.col("u")))
        .toDF("u", "v")
        .distinct()
        .localCheckpoint(eager=False)  # feeds wedges, degrees, anti-join
    )
    deg = e.groupBy("u").agg(F.count(F.lit(1)).cast("long").alias("d"))
    e1 = e.select(F.col("u").alias("id_a"), F.col("v").alias("w"))
    e2 = e.select(F.col("u").alias("w"), F.col("v").alias("id_b"))
    wedge = e1.join(e2, "w").filter(F.col("id_a") < F.col("id_b"))
    cand = wedge.join(
        e.select(F.col("u").alias("id_a"), F.col("v").alias("id_b")),
        ["id_a", "id_b"],
        "left_anti",
    )
    return (
        cand.join(deg.withColumnRenamed("u", "w"), "w")
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.round(
                F.sum(F.lit(1.0) / F.log(F.col("d").cast("double"))), 9
            ).alias("aa_score"),
        )
    )


@query(
    "x127_revenue_acf",
    "X-series,X-eval",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS HUGEINT)
               AS x
      FROM orders GROUP BY 1
    ),
    idx AS (
      SELECT x, ROW_NUMBER() OVER (ORDER BY day) AS i FROM daily
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS s,
             CAST(SUM(x * x) AS HUGEINT) AS sxx
      FROM idx
    ),
    lagged AS (
      SELECT k.k AS lag, CAST(COUNT(*) AS HUGEINT) AS m,
             CAST(SUM(a.x * b.x) AS HUGEINT) AS sxy,
             CAST(SUM(a.x) AS HUGEINT) AS sa,
             CAST(SUM(b.x) AS HUGEINT) AS sb
      FROM range(1, 11) k(k)
      JOIN idx a ON TRUE
      JOIN idx b ON b.i = a.i + k.k
      GROUP BY 1
    )
    SELECT CAST(lag AS INT) AS lag, CAST(m AS BIGINT) AS m,
           ROUND(CAST(n * n * sxy - n * s * (sa + sb) + m * s * s AS DOUBLE)
                 / CAST(n * n * sxx - n * s * s AS DOUBLE), 9) AS acf
    FROM lagged CROSS JOIN tot
    """,
)
def x127_revenue_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the daily order-revenue series at lags 1-10 —
    the seasonality/trend screen a forecasting pipeline (q06) runs
    first. The whole computation is EXACT 128-bit integer algebra:
    revenue is fixed to integer cents, the mean never materializes —
    r_k = (n²·Σx_t x_{t+k} − n·S·(S_a+S_b) + m·S²) / (n²·Σx² − n·S²)
    clears the x̄ = S/n denominators, so numerator and denominator are
    integers (Spark decimal(38,0) / DuckDB HUGEINT; max term n²·Σxy ≈
    3.5e31 at sf1 — headroom to 1e38), cast to double once and divided
    once: bit-identical across engines, unlike any float-accumulated
    ACF. Series indexing uses the distributed global-rank primitive;
    the lag pairing is one equi-join on (index + k) over the 10-row lag
    spine — the daily relation is calendar-bounded (~2.4k rows at any
    SF) but nothing here depends on that bound."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("decimal(38,0)")
            .alias("x")
        )
    )
    idx = global_row_number(daily, [F.col("day").asc()], rank_col="i")
    idx = idx.select("i", "x").localCheckpoint(eager=False)  # totals + lags
    tot = idx.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
    )
    lags = spark.range(1, 11).select(F.col("id").alias("lag"))
    a = idx.crossJoin(F.broadcast(lags)).select(
        "lag", F.col("i").alias("ia"), F.col("x").alias("xa"),
        (F.col("i") + F.col("lag")).alias("ib"),
    )
    b = idx.select(F.col("i").alias("ib"), F.col("x").alias("xb"))
    lagged = (
        a.join(b, "ib")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
            F.sum(F.col("xa") * F.col("xb"))
            .cast("decimal(38,0)")
            .alias("sxy"),
            F.sum("xa").cast("decimal(38,0)").alias("sa"),
            F.sum("xb").cast("decimal(38,0)").alias("sb"),
        )
    )
    num = (
        F.col("n") * F.col("n") * F.col("sxy")
        - F.col("n") * F.col("s") * (F.col("sa") + F.col("sb"))
        + F.col("m") * F.col("s") * F.col("s")
    )
    den = F.col("n") * F.col("n") * F.col("sxx") - F.col("n") * F.col(
        "s"
    ) * F.col("s")
    return lagged.crossJoin(F.broadcast(tot)).select(
        F.col("lag").cast("int").alias("lag"),
        F.col("m").cast("long").alias("m"),
        F.round(num.cast("double") / den.cast("double"), 9).alias("acf"),
    )


# Benford expected shares log10(1 + 1/d), full double precision — the SAME
# literal text in both engines (the _POISSON_CDF discipline).
_BENFORD = (
    (1, "0.3010299956639812"),
    (2, "0.17609125905568124"),
    (3, "0.12493873660829992"),
    (4, "0.09691001300805642"),
    (5, "0.07918124604762482"),
    (6, "0.06694678963061322"),
    (7, "0.05799194697768673"),
    (8, "0.05115252244738129"),
    (9, "0.04575749056067514"),
)

_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in _BENFORD)
    + " END"
)


@query(
    "x128_benford_audit",
    "X-qa,X-eval",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders
    ),
    obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM digits GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
    SELECT digit, n_obs,
           CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) AS obs_share,
           ROUND(CAST({_BENFORD_CASE} AS DOUBLE), 9) AS expected_share,
           ROUND((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
                 * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_CASE}))
                 / (CAST(n AS DOUBLE) * ({_BENFORD_CASE})), 9) AS chi2_term
    FROM obs CROSS JOIN tot
    """,
)
def x128_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the standard
    fabricated/filtered-data screen (synthetic price generators and
    truncation filters both bend the first-digit curve). The leading
    significant digit is read from the EXACT integer-cents value's
    decimal string — never floor(log10(double)), whose 1-ulp libm drift
    flips digits at powers of ten. One scan, one 9-group aggregate,
    zero joins beyond the broadcast 1-row total. Expected shares are
    shared full-precision literals inside the χ² arithmetic; the
    displayed expected_share column is CAST to DOUBLE and rounded to
    9 dp in both engines (DuckDB parses the bare literals as DECIMAL,
    whose string rendering keeps trailing zeros); each per-digit χ²
    term is a fixed
    sequence of IEEE ops on identical inputs (per-digit rows, no
    cross-digit summation → no accumulation-order hazard at all)."""
    o = table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    obs = (
        o.select(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
        # 9 rows, feeds the total AND the output join — pin so the
        # orders scan runs once
        .localCheckpoint(eager=False)
    )
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n"))
    # Both engines parse the bare literals as DECIMAL — force DOUBLE so
    # the χ² arithmetic and the rendered share are IEEE-double in both.
    expected = F.expr(_BENFORD_CASE).cast("double")
    err = F.col("n_obs").cast("double") - F.col("n").cast("double") * expected
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n_obs",
        (F.col("n_obs").cast("double") / F.col("n").cast("double")).alias(
            "obs_share"
        ),
        F.round(expected, 9).alias("expected_share"),
        F.round(
            err * err / (F.col("n").cast("double") * expected), 9
        ).alias("chi2_term"),
    )


@query(
    "x129_kaplan_meier",
    "X-events,X-eval",
    oracle="""
    WITH cutoff AS (
      SELECT MAX(ts) - INTERVAL 12 HOUR AS cut FROM events
    ),
    users AS (
      SELECT user_id,
             date_diff('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
               AS t,
             CASE WHEN MAX(ts) <= (SELECT cut FROM cutoff) THEN 1 ELSE 0 END
               AS churn
      FROM events GROUP BY 1
    ),
    per_t AS (
      SELECT t, CAST(SUM(churn) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leave_t
      FROM users GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users FROM users),
    risk AS (
      SELECT t, d,
             n_users
               - COALESCE(SUM(leave_t) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM per_t CROSS JOIN tot
    ),
    km AS (
      SELECT t, d, n_risk,
             SUM(CASE WHEN d > 0 AND d < n_risk
                 THEN ln(1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                 ELSE 0.0 END) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS lnsum,
             SUM(CASE WHEN d > 0 AND d = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS hit_zero
      FROM risk
    )
    SELECT CAST(t AS INT) AS t_days, CAST(n_risk AS BIGINT) AS n_at_risk,
           d AS d_churn,
           CASE WHEN hit_zero > 0 THEN 0.0
                ELSE ROUND(EXP(lnsum), 9) END AS survival
    FROM km WHERE d > 0
    """,
)
def x129_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of user activity lifetime (days from
    first to last event), with users still active in the final 12 hours
    of the observation window CENSORED rather than counted as churned
    (the generated corpus is a dense 30-day window, so a days-long
    horizon censors everyone; real pipelines would widen it) —
    the estimator x61's retention grid approximates with immortal-
    cohort bias. S(t) = Π_{t_j ≤ t} (1 − d_j/n_j): d_j churn events at
    lifetime t_j, n_j the at-risk count (everyone, churned or censored,
    with lifetime ≥ t_j). Shape: one per-user aggregate (the only
    data-sized shuffle), then all KM algebra runs on the per-lifetime
    relation — bounded by DISTINCT LIFETIME DAYS, i.e. the observation
    window length, never the user count (allowlisted windows). The
    product is exp(Σ ln(1−d/n)) accumulated in sorted order — running
    windows add in identical order in both engines — with an exact
    integer guard for the d = n extinction row (ln 0 never evaluated;
    survival pinned to 0.0 from there on). Counts exact BIGINT; the
    9-dp round absorbs libm ln/exp ulps."""
    e = table(spark, sf_dir, "events")
    # One scan total: the per-user extent relation is pinned and feeds
    # the global cutoff (max over users' last events == max over events),
    # the per-lifetime counts, AND the user total — without the pin each
    # consumer re-scans the events table to rebuild this aggregate.
    extents = (
        e.groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
        .localCheckpoint(eager=False)
    )
    cut = extents.agg(
        (F.max("last_ts") - F.expr("INTERVAL 12 HOURS")).alias("cut")
    )
    users = extents.crossJoin(F.broadcast(cut)).select(
        F.datediff(F.to_date("last_ts"), F.to_date("first_ts")).alias("t"),
        F.when(F.col("last_ts") <= F.col("cut"), 1)
        .otherwise(0)
        .cast("long")
        .alias("churn"),
    )
    per_t = (
        users.groupBy("t")
        .agg(
            F.sum("churn").cast("long").alias("d"),
            F.count(F.lit(1)).cast("long").alias("leave_t"),
        )
        # one row per distinct lifetime day, feeds windows AND the total
        .localCheckpoint(eager=False)
    )
    tot = users.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    prior = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    km = (
        per_t.crossJoin(F.broadcast(tot))
        .withColumn(
            "n_risk",
            F.col("n_users")
            - F.coalesce(F.sum("leave_t").over(prior), F.lit(0)),
        )
        .withColumn(
            "lnsum",
            F.sum(
                F.when(
                    (F.col("d") > 0) & (F.col("d") < F.col("n_risk")),
                    F.log(
                        F.lit(1.0)
                        - F.col("d").cast("double")
                        / F.col("n_risk").cast("double")
                    ),
                ).otherwise(F.lit(0.0))
            ).over(cum),
        )
        .withColumn(
            "hit_zero",
            F.sum(
                F.when(
                    (F.col("d") > 0) & (F.col("d") == F.col("n_risk")), 1
                ).otherwise(0)
            ).over(cum),
        )
    )
    return km.filter(F.col("d") > 0).select(
        F.col("t").cast("int").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_at_risk"),
        F.col("d").alias("d_churn"),
        F.when(F.col("hit_zero") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp("lnsum"), 9))
        .alias("survival"),
    )
