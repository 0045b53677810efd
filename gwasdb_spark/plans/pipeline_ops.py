"""Round-7+ pipeline primitives: runtime-filter joins, governed splits,
and downstream-analytics aggregates.

- x111: Bloom-prefilter semi join — a REAL Bloom filter (k=3 xxhash64
  seeds into a 32768-bit bitmap held as a <=512-entry word->mask map)
  built declaratively from the dim side and broadcast onto the fact
  scan, so non-matching fact rows die BEFORE the join exchange; the
  exact semi join afterwards removes false positives, so the result is
  exact and the DuckDB oracle is the plain semi join. This is the
  hand-rolled twin of Spark's injected runtime bloom filter
  (spark.sql.optimizer.runtime.bloomFilter.*), which only arms itself
  above multi-GB scan thresholds — here the pruning is part of the
  declared plan and testable at any SF.
- x112: stratified exact split — per-stratum 80/20 train/test with
  EXACT per-stratum proportions (ceil(0.8n) via integer math) over a
  content-addressed md5 order: deterministic, re-runnable, no RNG
  state; complements x99 (hash split, leakage-safe but only
  approximately proportional).
- g16: per-marker case/control odds ratio + 95% Wald CI from one
  conditional-count pass (the 2x2 table never materializes; four
  filtered counts per marker), integer cell counts -> one exact
  cross-product ratio -> ln/exp at the end under 6-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gwasdb_spark.catalog import table
from gwasdb_spark.plans.base import query

# Bloom geometry: 32768 bits = 512 x 64-bit words; k=3 seeded hashes.
_BLOOM_BITS = 32768
_BLOOM_SEEDS = (1, 2, 3)


def _bloom_positions(key, seed: int):
    """Bit position of `key` under hash-seed `seed` (word, mask) pair."""
    bit = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(_BLOOM_BITS))
    word = (bit / F.lit(64)).cast("int")
    # F.shiftleft's numBits parameter is Python-int-only; call the SQL
    # function directly to shift by a per-row column.
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (bit % 64).cast("int")
    )
    return word, mask


def bloom_build(df: DataFrame, key_col: str) -> DataFrame:
    """One-row DataFrame holding a Bloom bitmap of df[key_col] as a
    map<int,long> (word index -> 64-bit mask). Sparse words are simply
    absent; total size is bounded at 512 entries (~8 KB) no matter how
    many keys feed it — the fixed-memory property that makes a Bloom
    broadcastable when the key set itself is not."""
    words = []
    for s in _BLOOM_SEEDS:
        w, m = _bloom_positions(F.col(key_col), s)
        words.append(F.struct(w.alias("w"), m.alias("m")))
    per_word = (
        df.select(F.explode(F.array(*words)).alias("pos"))
        .groupBy(F.col("pos.w").alias("w"))
        .agg(F.bit_or("pos.m").alias("m"))
    )
    return per_word.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "m"))).alias("bloom")
    )


def bloom_might_contain_sql(bloom_scalar_sql: str, key_sql: str) -> str:
    """SQL text of the k-seed membership predicate against a scalar
    subquery holding the bitmap map. Used instead of the Column variant
    when the consumer must stay a plain Filter on the probe-side scan:
    a crossJoin(bloom).filter(...) formulation gets rewritten by
    Catalyst into a join CONDITION and then hoisted above any join
    that only needs probe-side columns — the prefilter would run
    AFTER the exact join it was meant to protect. A scalar subquery
    is not a join, so nothing reorders around it."""
    checks = []
    for s in _BLOOM_SEEDS:
        bit = f"pmod(xxhash64({key_sql}, {s}), {_BLOOM_BITS})"
        word = f"CAST({bit} DIV 64 AS INT)"
        mask = f"shiftleft(CAST(1 AS BIGINT), CAST({bit} % 64 AS INT))"
        checks.append(
            f"(coalesce(element_at({bloom_scalar_sql}, {word}), "
            f"CAST(0 AS BIGINT)) & {mask}) != 0"
        )
    return "(" + " AND ".join(checks) + ")"


def bloom_might_contain(bloom_col, key) -> F.Column:
    """True iff ALL k seeded bits of `key` are set in the bitmap map.
    No false negatives by construction; false positives are whatever
    the (k, m, n) geometry yields and must be removed by an exact join
    downstream."""
    checks = []
    for s in _BLOOM_SEEDS:
        w, m = _bloom_positions(key, s)
        hit = (
            F.coalesce(F.element_at(bloom_col, w), F.lit(0).cast("long"))
            .bitwiseAND(m)
            != 0
        )
        checks.append(hit)
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


@query(
    "x111_bloom_prefilter_join",
    "J9,X-scale",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
             / 100.0 AS revenue
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM customer c
      WHERE c.c_custkey = o.o_custkey
        AND c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 7500
    )
    GROUP BY 1
    """,
)
def x111_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefilter semi join: revenue by priority for orders whose
    customer sits in a selective dim slice (BUILDING segment, high
    balance — ~5% of customers). The dim keys are folded into a
    32768-bit Bloom bitmap (k=3 xxhash64 seeds, map<word,mask> — fixed
    ~8 KB regardless of dim cardinality), broadcast onto the fact scan,
    and non-matching fact rows are dropped BEFORE the semi-join
    exchange; the exact semi join then removes the (rare) false
    positives, so the result is exact and the oracle is the plain
    EXISTS. At 100 TB this is the declared-plan version of Spark's
    runtime bloom join (which only arms above multi-GB thresholds):
    the fact shuffle carries only ~bloom-pass rows instead of every
    order. Money stays in integer cents until one final division."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    dim = c.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 7500)
    ).select("c_custkey")
    o.createOrReplaceTempView("_x111_orders")
    dim.createOrReplaceTempView("_x111_dim")
    bloom_build(dim, "c_custkey").createOrReplaceTempView("_x111_bloom")
    # The bloom rides as a SCALAR SUBQUERY, not a cross join: a
    # crossJoin+filter formulation gets rewritten into a join condition
    # and hoisted above the semi join (prefilter after the join it
    # protects — observed, not hypothetical). A subquery filter stays
    # pinned on the orders scan. Cost: each of the 3 element_at
    # references parses as its own subquery instance (Spark subqueries
    # are per-reference; higher-order-function and lateral-view
    # single-reference forms either reject subqueries or re-hoist the
    # filter) — 3 small dim-side aggregate jobs, each a fraction of
    # one fact partition. The topology is what matters at scale.
    member = bloom_might_contain_sql(
        "(SELECT bloom FROM _x111_bloom)", "o.o_custkey"
    )
    return spark.sql(
        f"""
        SELECT o.o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                 AS DOUBLE) / 100.0 AS revenue
        FROM _x111_orders o
        WHERE {member}
          AND EXISTS (SELECT 1 FROM _x111_dim d
                      WHERE d.c_custkey = o.o_custkey)
        GROUP BY 1
        """
    )


@query(
    "x112_stratified_split",
    "X-dataset,§2.5",
    oracle="""
    WITH ranked AS (
      SELECT lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    )
    SELECT lang,
           CASE WHEN rn <= (4 * n + 4) // 5 THEN 'train' ELSE 'test' END
             AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ranked GROUP BY 1, 2
    """,
)
def x112_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified EXACT train/test split: within every stratum (lang),
    exactly ceil(0.8n) docs go to train — the eval-set construction
    where per-stratum proportions must hold exactly (a hash split like
    x99 only hits 80% in expectation, starving rare strata). Order
    within a stratum is the content-addressed md5(doc_id) — no RNG
    state, so re-runs and backfills cut identically. ceil(0.8n) is
    computed in INTEGER math ((4n+4) div 5) so both engines agree at
    every n. The windows are stratum-PARTITIONED (no global sort);
    per-stratum ordering is the irreducible cost of an exact quota,
    and strata are corpus-bounded (languages), so each sort is
    1/|strata| of the data. For leakage safety compose with x99:
    bucket by source first, stratify buckets."""
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("lang")
    ranked = d.select(
        "lang",
        "n_chars",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    split = F.when(
        F.col("rn") <= F.expr("(4 * n + 4) div 5"), F.lit("train")
    ).otherwise(F.lit("test"))
    return ranked.groupBy("lang", split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@query(
    "mm08_chunk_dedup",
    "X-multimodal,X-dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 800000, text FROM documents WHERE doc_id % 5 = 0
    ),
    hx AS (SELECT doc_id, hex(encode(text)) AS h FROM corpus),
    chunks AS (
      SELECT substr(h, CAST(p AS INT), 128) AS chunk
      FROM (SELECT h, unnest(range(1, len(h) + 1, 128)) AS p FROM hx)
    ),
    per_chunk AS (
      SELECT chunk, CAST(COUNT(*) AS BIGINT) AS n_copies,
             CAST(len(chunk) // 2 AS BIGINT) AS chunk_bytes
      FROM chunks GROUP BY 1
    )
    SELECT n_copies,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(n_copies * chunk_bytes) AS BIGINT) AS logical_bytes,
           CAST(SUM(chunk_bytes) AS BIGINT) AS physical_bytes
    FROM per_chunk GROUP BY 1
    """,
)
def mm08_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed chunk-level storage dedup over binary media
    payloads — the blob-store compaction audit (how much physical
    storage does chunk dedup save, and what does the copy-count
    distribution look like?). Payloads are cut into fixed 64-byte
    chunks (128 hex chars; trailing partial kept) and grouped by chunk
    CONTENT; the copy-count histogram reports logical vs physical
    bytes per duplication level. Whole-payload dups are planted (every
    5th doc re-enters under a fresh id) so n_copies >= 2 rows always
    exist. The payload bytes themselves never shuffle — only (chunk,
    count) pairs after the map-side partial aggregate; at 100 TB the
    chunk relation is what a CDC-chunked object store would hold, and
    the same plan runs with content-defined boundaries by swapping the
    splitter. Oracle joins chunk STRINGS (collision-free ground
    truth); a real store would key md5(chunk)."""
    from gwasdb_spark.multimodal.binary import to_binary_table

    d = table(spark, sf_dir, "documents")
    corpus = d.unionByName(
        d.filter(F.col("doc_id") % 5 == 0).withColumn(
            "doc_id", F.col("doc_id") + 800000
        )
    )
    bt = to_binary_table(corpus)
    hx = bt.select(F.hex(F.col("payload")).alias("h"))
    chunks = hx.select(
        F.explode(
            F.sequence(F.lit(1), F.length("h"), F.lit(128))
        ).alias("p"),
        "h",
    ).select(F.substring(F.col("h"), F.col("p"), F.lit(128)).alias("chunk"))
    per_chunk = chunks.groupBy("chunk").agg(
        F.count(F.lit(1)).cast("long").alias("n_copies")
    ).select(
        "n_copies",
        F.expr("length(chunk) div 2").cast("long").alias("chunk_bytes"),
    )
    return per_chunk.groupBy("n_copies").agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum(F.col("n_copies") * F.col("chunk_bytes"))
        .cast("long")
        .alias("logical_bytes"),
        F.sum("chunk_bytes").cast("long").alias("physical_bytes"),
    )


@query(
    "e06_rfm_segments",
    "X-events,A2",
    oracle="""
    WITH p AS (
      SELECT user_id, CAST(strftime(ts, '%Y-%m-%d') AS DATE) AS d,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    anchor AS (SELECT MAX(d) AS d_max FROM p),
    rfm AS (
      SELECT user_id,
             CAST(date_diff('day', MAX(d), (SELECT d_max FROM anchor))
               AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(SUM(cents) AS BIGINT) AS monetary_c
      FROM p GROUP BY 1
    ),
    cuts AS (
      SELECT quantile_cont(CAST(recency_days AS DOUBLE),
                           0.3333333333333333) AS r1,
             quantile_cont(CAST(recency_days AS DOUBLE),
                           0.6666666666666666) AS r2,
             quantile_cont(CAST(frequency AS DOUBLE),
                           0.3333333333333333) AS f1,
             quantile_cont(CAST(frequency AS DOUBLE),
                           0.6666666666666666) AS f2,
             quantile_cont(CAST(monetary_c AS DOUBLE),
                           0.3333333333333333) AS m1,
             quantile_cont(CAST(monetary_c AS DOUBLE),
                           0.6666666666666666) AS m2
      FROM rfm
    )
    SELECT CASE WHEN recency_days <= r1 THEN 1
                WHEN recency_days <= r2 THEN 2 ELSE 3 END AS r_tercile,
           CASE WHEN frequency <= f1 THEN 1
                WHEN frequency <= f2 THEN 2 ELSE 3 END AS f_tercile,
           CASE WHEN monetary_c <= m1 THEN 1
                WHEN monetary_c <= m2 THEN 2 ELSE 3 END AS m_tercile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(monetary_c) AS DOUBLE) / 100.0 AS total_monetary
    FROM rfm CROSS JOIN cuts
    GROUP BY 1, 2, 3
    """,
)
def e06_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic marketing-analytics
    rollup: per-user Recency (days since last purchase vs the corpus
    anchor date), Frequency (purchase count), Monetary (exact cents),
    each cut into terciles, users counted per (R,F,M) cell. One
    event-table pass to the user grain; the six tercile cuts ride as
    ONE broadcast 1-row relation into the scan-side CASE (x100's cut
    discipline — exact `percentile` here, approx_percentile at scale,
    same plan shape). Cut inputs are integers (days / counts / cents),
    so both engines interpolate identical doubles bit-for-bit.
    Timestamps reduce to civil DATES before differencing (day_str
    convention) to sidestep tz-awareness drift."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.to_date(F.date_format("ts", "yyyy-MM-dd")).alias("d"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    rfm = p.groupBy("user_id").agg(
        F.max("d").alias("d_user"),
        F.count(F.lit(1)).cast("long").alias("frequency"),
        F.sum("cents").cast("long").alias("monetary_c"),
    )
    anchor = rfm.agg(F.max("d_user").alias("d_max"))
    rfm = (
        rfm.crossJoin(F.broadcast(anchor))
        .select(
            F.datediff("d_max", "d_user").cast("long").alias("recency_days"),
            "frequency",
            "monetary_c",
        )
        # two consumers (cuts + final CASE) of the user-grain relation
        .localCheckpoint(eager=False)
    )
    cuts = rfm.agg(
        *[
            F.expr(f"percentile(cast({c} as double), {q})").alias(f"{a}{i}")
            for c, a in (
                ("recency_days", "r"),
                ("frequency", "f"),
                ("monetary_c", "m"),
            )
            for i, q in ((1, "0.3333333333333333"), (2, "0.6666666666666666"))
        ]
    )
    terc = lambda c, a: (  # noqa: E731
        F.when(F.col(c) <= F.col(f"{a}1"), F.lit(1))
        .when(F.col(c) <= F.col(f"{a}2"), F.lit(2))
        .otherwise(F.lit(3))
    )
    return (
        rfm.crossJoin(F.broadcast(cuts))
        .groupBy(
            terc("recency_days", "r").alias("r_tercile"),
            terc("frequency", "f").alias("f_tercile"),
            terc("monetary_c", "m").alias("m_tercile"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            (F.sum("monetary_c").cast("double") / F.lit(100.0)).alias(
                "total_monetary"
            ),
        )
    )


@query(
    "g16_case_control_or",
    "X-gwas,A2",
    oracle="""
    WITH g AS (
      SELECT l_partkey % 500 AS marker,
             (l_orderkey % 2 = 0) AS is_case,
             (l_quantity > 25) AS exposed
      FROM lineitem
    ),
    cells AS (
      SELECT marker,
             CAST(COUNT(*) FILTER (WHERE is_case AND exposed) AS BIGINT) AS a,
             CAST(COUNT(*) FILTER (WHERE is_case AND NOT exposed) AS BIGINT) AS b,
             CAST(COUNT(*) FILTER (WHERE NOT is_case AND exposed) AS BIGINT) AS c,
             CAST(COUNT(*) FILTER (WHERE NOT is_case AND NOT exposed) AS BIGINT) AS d
      FROM g GROUP BY 1
      HAVING a >= 1 AND b >= 1 AND c >= 1 AND d >= 1
    )
    SELECT marker, a, b, c, d,
           ROUND(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE), 6)
             AS odds_ratio,
           ROUND(exp(ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE))
                     - 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS ci_lo,
           ROUND(exp(ln(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE))
                     + 1.96 * sqrt(1.0/a + 1.0/b + 1.0/c + 1.0/d)), 6)
             AS ci_hi
    FROM cells
    """,
)
def g16_case_control_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-marker case/control odds ratio with the 95% Wald CI — the
    association statistic a GWAS warehouse serves for binary traits
    (g12-g15 cover the quantitative side). Deterministic mapping in
    the family's style: marker = partkey mod 500, case status from
    orderkey parity, exposure (risk allele carrier) from quantity.

    The 2x2 table never materializes: four conditional counts per
    marker in ONE scan-side aggregate pass (map-side partials, skinny
    (marker, 4 longs) shuffle — at biobank scale this is a single
    fact-table pass regardless of marker count). OR = ad/bc computed
    as one exact int64 cross-product ratio; ln/exp/sqrt run once per
    OUTPUT row over identical doubles in both engines, with 6-dp
    rounding absorbing libm's ~1-ulp drift. Markers with an empty cell
    are excluded (HAVING all four >= 1) rather than Haldane-corrected,
    so the continuity-correction convention can't diverge."""
    li = table(spark, sf_dir, "lineitem")
    g = li.select(
        (F.col("l_partkey") % 500).alias("marker"),
        (F.col("l_orderkey") % 2 == 0).alias("is_case"),
        (F.col("l_quantity") > 25).alias("exposed"),
    )
    cnt = lambda c: F.count_if(c).cast("long")  # noqa: E731
    cells = (
        g.groupBy("marker")
        .agg(
            cnt(F.col("is_case") & F.col("exposed")).alias("a"),
            cnt(F.col("is_case") & ~F.col("exposed")).alias("b"),
            cnt(~F.col("is_case") & F.col("exposed")).alias("c"),
            cnt(~F.col("is_case") & ~F.col("exposed")).alias("d"),
        )
        .filter(
            (F.col("a") >= 1)
            & (F.col("b") >= 1)
            & (F.col("c") >= 1)
            & (F.col("d") >= 1)
        )
    )
    ratio = (F.col("a") * F.col("d")).cast("double") / (
        F.col("b") * F.col("c")
    ).cast("double")
    se = F.sqrt(
        1.0 / F.col("a") + 1.0 / F.col("b") + 1.0 / F.col("c") + 1.0 / F.col("d")
    )
    return cells.select(
        "marker",
        "a",
        "b",
        "c",
        "d",
        F.round(ratio, 6).alias("odds_ratio"),
        F.round(F.exp(F.log(ratio) - 1.96 * se), 6).alias("ci_lo"),
        F.round(F.exp(F.log(ratio) + 1.96 * se), 6).alias("ci_hi"),
    )


# ---------------------------------------------------------------------------
# Batch 2: retrieval fusion, sketches, profiling statistics
# ---------------------------------------------------------------------------

from gwasdb_spark.plans.extensions import _COS_SQL, _COS16_SQL  # noqa: E402


@query(
    "x114_rrf_fusion",
    "X-sim",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    full_rank AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
               {_COS_SQL.format(a='qv', b='cv')}
                 / (sqrt({_COS_SQL.format(a='qv', b='qv')})
                    * sqrt({_COS_SQL.format(a='cv', b='cv')})) DESC,
               neighbor_id) AS rank
      FROM q CROSS JOIN c WHERE query_id != neighbor_id
      QUALIFY rank <= 20
    ),
    trunc_rank AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
               {_COS16_SQL.format(a='qv', b='cv')}
                 / (sqrt({_COS16_SQL.format(a='qv', b='qv')})
                    * sqrt({_COS16_SQL.format(a='cv', b='cv')})) DESC,
               neighbor_id) AS rank
      FROM q CROSS JOIN c WHERE query_id != neighbor_id
      QUALIFY rank <= 20
    ),
    fused AS (
      SELECT COALESCE(f.query_id, t.query_id) AS query_id,
             COALESCE(f.neighbor_id, t.neighbor_id) AS neighbor_id,
             COALESCE(1.0 / (60 + f.rank), 0.0)
               + COALESCE(1.0 / (60 + t.rank), 0.0) AS rrf
      FROM full_rank f FULL OUTER JOIN trunc_rank t
        ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
    )
    SELECT query_id, neighbor_id,
           ROUND(rrf, 9) AS rrf_score,
           CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, neighbor_id) AS BIGINT)
             AS fused_rank
    FROM fused
    QUALIFY fused_rank <= 10
    """,
)
def x114_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval rankings — the standard
    hybrid-serving combiner (fuse cheap and expensive rankers without
    calibrating their scores): RRF(d) = sum over rankers of
    1/(60 + rank_r(d)). Here the two rankers are the full 64-dim
    cosine top-20 and the first-16-dims truncated top-20 (x107's
    cheap pass) — fusing them is exactly the truncate-then-rescue
    serving pattern. Each ranking is a broadcast-query scan +
    PARTITIONED window; the fusion join is on (query, neighbor) over
    two k-bounded relations (|queries| x 20 rows each), so everything
    after the scans is constant-size. Absent ranks contribute 0 (the
    standard top-k RRF convention). The rrf sum is two terms in fixed
    textual order — bit-identical across engines."""
    from gwasdb_spark.operators.similarity import brute_force_topk

    e = table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    full = brute_force_topk(q, e, "vec_id", "embedding", k=20).select(
        "query_id", "neighbor_id", F.col("rank").alias("rank_full")
    )
    e16 = e.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    trunc = brute_force_topk(
        e16.filter(F.col("vec_id") < 5), e16, "vec_id", "embedding", k=20
    ).select("query_id", "neighbor_id", F.col("rank").alias("rank_trunc"))
    fused = (
        full.join(trunc, ["query_id", "neighbor_id"], "full_outer")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.coalesce(1.0 / (60 + F.col("rank_full")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("rank_trunc")), F.lit(0.0))
            ).alias("rrf"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf"), F.asc("neighbor_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rank") <= 10)
        .select(
            "query_id",
            "neighbor_id",
            F.round("rrf", 9).alias("rrf_score"),
            "fused_rank",
        )
    )


@query(
    "x115_kmv_distinct_sketch",
    "X-sketch,A3",
    oracle="""
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    hashed AS (
      SELECT event_type, user_id,
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                       AS BIGINT) AS DOUBLE) / 1152921504606846976.0 AS u
      FROM pairs
    ),
    ranked AS (
      SELECT event_type, u,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY u, user_id) AS rn
      FROM hashed
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_exact,
             MAX(CASE WHEN rn = 64 THEN u END) AS kth
      FROM ranked GROUP BY 1
    )
    SELECT event_type, n_exact,
           CAST(CASE WHEN kth IS NULL THEN n_exact
                     ELSE ROUND(63.0 / kth) END AS BIGINT) AS kmv_estimate,
           ROUND((CAST(CASE WHEN kth IS NULL THEN n_exact
                            ELSE ROUND(63.0 / kth) END AS DOUBLE)
                  - n_exact) / n_exact, 6) AS rel_err
    FROM s
    """,
)
def x115_kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch, side-by-side with the
    exact count it approximates — the calibration report that tells you
    whether sketch-based COUNT(DISTINCT) is accurate enough to replace
    the exact shuffle at 100 TB. Unlike HLL (approx_count_distinct,
    whose register layout is engine-private and un-oracle-able), KMV
    is fully deterministic given a content-addressed hash: map each
    key to u = md5-uniform in [0,1), keep the k=64 smallest per group,
    estimate (k-1)/u_(k); groups with fewer than k keys report exactly.
    Plan: one distinct on the (group, key) grain (the same shuffle an
    exact count needs once), then a group-PARTITIONED min-k window over
    the deduped relation. A production sketch would fold the min-k heap
    into a map-side aggregate; the declarative form keeps the window,
    which the plan audit accepts because it is partitioned. Estimate
    lands within ~1/sqrt(64) = 12.5% — rel_err is the report."""
    e = table(spark, sf_dir, "events")
    pairs = e.select("event_type", "user_id").distinct()
    u = (
        F.conv(
            F.substring(
                F.md5(F.col("user_id").cast("string").cast("binary")), 1, 15
            ),
            16,
            10,
        ).cast("double")
        / F.lit(1152921504606846976.0)
    )
    hashed = pairs.select("event_type", "user_id", u.alias("u"))
    w = Window.partitionBy("event_type").orderBy("u", "user_id")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    s = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_exact"),
        F.max(F.when(F.col("rn") == 64, F.col("u"))).alias("kth"),
    )
    est = F.when(F.col("kth").isNull(), F.col("n_exact").cast("double")).otherwise(
        F.round(63.0 / F.col("kth"))
    )
    return s.select(
        "event_type",
        "n_exact",
        est.cast("long").alias("kmv_estimate"),
        F.round(
            (est.cast("double") - F.col("n_exact")) / F.col("n_exact"), 6
        ).alias("rel_err"),
    )


@query(
    "x117_mutual_information",
    "X-qa,A2",
    oracle="""
    WITH cells AS (
      SELECT event_type AS x, CAST(strftime(ts, '%H') AS INT) AS y,
             CAST(COUNT(*) AS DOUBLE) AS n_xy
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n_xy) AS n FROM cells),
    mx AS (SELECT x, SUM(n_xy) AS n_x FROM cells GROUP BY 1),
    my AS (SELECT y, SUM(n_xy) AS n_y FROM cells GROUP BY 1),
    terms AS (
      SELECT (c.n_xy / t.n) * LN((c.n_xy * t.n) / (mx.n_x * my.n_y)) AS mi_t,
             -(mx.n_x / t.n) * LN(mx.n_x / t.n) / COUNT(*) OVER (PARTITION BY c.x) AS hx_t,
             -(my.n_y / t.n) * LN(my.n_y / t.n) / COUNT(*) OVER (PARTITION BY c.y) AS hy_t
      FROM cells c
      JOIN mx ON mx.x = c.x JOIN my ON my.y = c.y CROSS JOIN tot t
    )
    SELECT ROUND(SUM(mi_t), 6) AS mi_nats,
           ROUND(SUM(hx_t), 6) AS h_x,
           ROUND(SUM(hy_t), 6) AS h_y,
           ROUND(SUM(mi_t) / sqrt(SUM(hx_t) * SUM(hy_t)), 6) AS nmi
    FROM terms
    """,
)
def x117_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns (event type x
    hour-of-day) with both marginal entropies and normalized MI — the
    dependence-profiling statistic feature selection and leakage
    screening run over candidate columns (x109's Pearson r only sees
    linear dependence on numerics; MI catches any association on
    categoricals). ONE fact pass to the |X|x|Y|-bounded cell relation;
    marginals and totals re-aggregate the CELLS, never the fact table,
    and the entropy terms are spread over cell rows (divided by the
    per-group cell count) so a single SUM pass yields MI, H(x), H(y).
    Double-sum association drift across engines is absorbed by the
    suite's 6-dp rounding discipline (same as x85's KL)."""
    e = table(spark, sf_dir, "events")
    cells = (
        e.select(
            F.col("event_type").alias("x"),
            F.date_format("ts", "HH").cast("int").alias("y"),
        )
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("double").alias("n_xy"))
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(F.sum("n_xy").alias("n"))
    mx = cells.groupBy("x").agg(F.sum("n_xy").alias("n_x"))
    my = cells.groupBy("y").agg(F.sum("n_xy").alias("n_y"))
    terms = (
        cells.join(F.broadcast(mx), "x")
        .join(F.broadcast(my), "y")
        .crossJoin(F.broadcast(tot))
        .select(
            ((F.col("n_xy") / F.col("n"))
             * F.log((F.col("n_xy") * F.col("n")) / (F.col("n_x") * F.col("n_y")))
             ).alias("mi_t"),
            (-(F.col("n_x") / F.col("n")) * F.log(F.col("n_x") / F.col("n"))
             / F.count(F.lit(1)).over(Window.partitionBy("x"))).alias("hx_t"),
            (-(F.col("n_y") / F.col("n")) * F.log(F.col("n_y") / F.col("n"))
             / F.count(F.lit(1)).over(Window.partitionBy("y"))).alias("hy_t"),
        )
    )
    return terms.agg(
        F.round(F.sum("mi_t"), 6).alias("mi_nats"),
        F.round(F.sum("hx_t"), 6).alias("h_x"),
        F.round(F.sum("hy_t"), 6).alias("h_y"),
        F.round(
            F.sum("mi_t") / F.sqrt(F.sum("hx_t") * F.sum("hy_t")), 6
        ).alias("nmi"),
    )


@query(
    "x118_weighted_median",
    "X-qa,A2,§2.5",
    oracle="""
    WITH v AS (
      SELECT l_returnflag, l_linestatus,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c,
             CAST(l_quantity AS BIGINT) AS wgt,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    cum AS (
      SELECT l_returnflag, l_linestatus, price_c, wgt,
             SUM(wgt) OVER (PARTITION BY l_returnflag, l_linestatus
                            ORDER BY price_c, l_orderkey, l_linenumber
                            ROWS UNBOUNDED PRECEDING) AS cum_w,
             SUM(wgt) OVER (PARTITION BY l_returnflag, l_linestatus) AS tot_w
      FROM v
    )
    SELECT l_returnflag, l_linestatus,
           CAST(MIN(CASE WHEN 2 * cum_w >= tot_w THEN price_c END)
             AS DOUBLE) / 100.0 AS weighted_median
    FROM cum GROUP BY 1, 2
    """,
)
def x118_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median per group (price weighted by quantity, per
    returnflag x linestatus) — the robust central-tendency statistic
    plain `percentile` can't produce (it weights rows equally). The
    lower weighted median is the smallest value whose cumulative
    weight reaches half the total: one group-PARTITIONED cumulative
    window over cents/integer weights — the threshold test
    2*cum >= tot runs in EXACT int64, so there is no FP boundary to
    drift across engines. Group count here is bounded (flag x status);
    at 100 TB with very hot groups the two-pass x76-style histogram
    cut replaces the in-group sort, same output contract."""
    li = table(spark, sf_dir, "lineitem")
    v = li.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.col("l_quantity").cast("long").alias("wgt"),
        "l_orderkey",
        "l_linenumber",
    )
    w_cum = (
        Window.partitionBy("l_returnflag", "l_linestatus")
        .orderBy("price_c", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy("l_returnflag", "l_linestatus")
    cum = v.select(
        "l_returnflag",
        "l_linestatus",
        "price_c",
        F.sum("wgt").over(w_cum).alias("cum_w"),
        F.sum("wgt").over(w_tot).alias("tot_w"),
    )
    return cum.groupBy("l_returnflag", "l_linestatus").agg(
        (
            F.min(
                F.when(2 * F.col("cum_w") >= F.col("tot_w"), F.col("price_c"))
            ).cast("double")
            / F.lit(100.0)
        ).alias("weighted_median")
    )


@query(
    "x162_countmin_heavy_hitters",
    "X-sketch,X-text",
    oracle=r"""
    WITH t AS (
      SELECT token FROM (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents
      ) WHERE token <> ''
    ),
    occ AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact_count
            FROM t GROUP BY 1),
    hits AS (
      SELECT p.r,
             CAST(CAST('0x' || substr(
                    md5(CAST(p.r AS VARCHAR) || ':' || t.token), 1, 15)
                  AS BIGINT) % 512 AS BIGINT) AS b
      FROM t CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) p
    ),
    counters AS (SELECT r, b, CAST(COUNT(*) AS BIGINT) AS c
                 FROM hits GROUP BY 1, 2),
    probes AS (
      SELECT o.token, o.exact_count, p.r,
             CAST(CAST('0x' || substr(
                    md5(CAST(p.r AS VARCHAR) || ':' || o.token), 1, 15)
                  AS BIGINT) % 512 AS BIGINT) AS b
      FROM occ o CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS r) p
    ),
    est AS (
      SELECT token, exact_count, MIN(c) AS est_count
      FROM probes JOIN counters USING (r, b) GROUP BY 1, 2
    )
    SELECT token, CAST(est_count AS BIGINT) AS est_count, exact_count,
           CAST(est_count - exact_count AS BIGINT) AS overestimate
    FROM est ORDER BY est_count DESC, token LIMIT 20
    """,
)
def x162_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters, side-by-side with the exact
    counts it approximates — x115's calibration-report pattern for the
    frequency (not distinct-count) sketch. A d=4 x w=512 counter grid:
    each token occurrence increments one bucket per row (bucket =
    md5-uniform of "row:token" mod 512 — content-addressed, so the
    sketch is bit-identical on any engine, unlike engine-private
    approx_count sketches); a token's estimate is the MIN over its 4
    row counters, which can only over-count (collision mass is always
    additive) — `overestimate` is the calibration column.

    Plan: the counter build folds the token stream into <= 2048 groups
    with map-side partial aggregation — the shuffle after combine is
    O(partitions x 2048), independent of corpus size, which is the
    whole point of the sketch: at 100 TB the counter grid is still 16 KB
    and MERGEABLE across partitions, files, or streaming micro-batches
    (per-partition grids sum element-wise). The probe side joins the
    vocabulary's 4 probe rows against the broadcast 2048-row grid and
    takes MIN per token; the top-20 report is a TakeOrdered head, never
    a global sort."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token")
        )
        .filter(F.col("token") != "")
    )

    def bucket(row: int, c) -> object:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{row}:"), c).cast("binary")), 1, 15
                ),
                16,
                10,
            ).cast("long")
            % 512
        )

    hits = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"), bucket(i, F.col("token")).alias("b")
                    )
                    for i in range(4)
                ]
            )
        ).alias("rb")
    ).select("rb.r", "rb.b")
    counters = hits.groupBy("r", "b").agg(F.count(F.lit(1)).alias("c"))
    vocab = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    probes = vocab.select(
        "token",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"), bucket(i, F.col("token")).alias("b")
                    )
                    for i in range(4)
                ]
            )
        ).alias("rb"),
    ).select("token", "exact_count", "rb.r", "rb.b")
    est = (
        probes.join(F.broadcast(counters), ["r", "b"])
        .groupBy("token", "exact_count")
        .agg(F.min("c").cast("long").alias("est_count"))
    )
    return (
        est.orderBy(F.desc("est_count"), F.asc("token"))
        .limit(20)
        .select(
            "token",
            "est_count",
            "exact_count",
            (F.col("est_count") - F.col("exact_count"))
            .cast("long")
            .alias("overestimate"),
        )
    )
