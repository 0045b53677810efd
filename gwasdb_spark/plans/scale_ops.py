"""Scale-primitive queries (round 5): the operations whose naive window/
loop formulation dies at 100 TB, each expressed through a distributed
primitive and oracle-checked against the naive SQL semantics.

- x74/x75: exact global ROW_NUMBER / NTILE via operators/sampling.py's
  range-exchange two-level rank (the single-task `Window.orderBy` trap,
  solved; the DuckDB oracle IS the naive window — results must match
  bit-for-bit).
- x76: percentile-threshold filtering with the cut point riding in-plan
  (exact `percentile` — at true scale swap for approx_percentile, same
  plan shape).
- x77: deterministic weighted sampling (Efraimidis-Stirling A-Res keys
  from content-addressed uniforms — no RNG state, reproducible on any
  engine, re-runs and backfills draw the same sample).
- x78: one-pass table profiling (nulls/distincts/extrema per column in a
  single aggregate — one scan, no per-column jobs).
- x79: corpus-driven stopword discovery (document-frequency fraction) +
  per-doc stopword density, all distributed aggregates.
- x80: k-core decomposition by synchronized fixed-round peeling (the
  iterative-graph shape with a recursive-CTE twin).
- x81: k-anonymity audit over quasi-identifier groups (governance gate
  before corpus release).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gwasdb_spark.catalog import table
from gwasdb_spark.plans.base import query


@query(
    "x74_global_rank",
    "§2.5-ext,X-assembly",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice,
           CAST(ROW_NUMBER() OVER (
             ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
           ) AS BIGINT) AS price_rank
    FROM lineitem
    """,
)
def x74_global_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global rank of EVERY lineitem by price — the full-relation
    ORDER BY rank that a bare `row_number().over(Window.orderBy(...))`
    would funnel through one task. Runs through
    operators/sampling.py global_row_number: one range exchange, ranks
    assembled from per-partition offsets; the only unpartitioned window
    is over #partitions stat rows. The oracle is the naive window —
    the distributed rank must be indistinguishable from it."""
    from gwasdb_spark.operators.sampling import global_row_number

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return global_row_number(
        li,
        [F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        rank_col="price_rank",
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "price_rank")


@query(
    "x75_ntile_deciles",
    "§2.5-ext,X-assembly",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(NTILE(10) OVER (ORDER BY o_totalprice DESC, o_orderkey)
                AS INT) AS decile
    FROM orders
    """,
)
def x75_ntile_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-value deciles over the whole orders table via
    operators/sampling.py exact_ntile — SQL NTILE semantics (first
    N mod n tiles get the extra row) reproduced from the distributed
    global rank plus arithmetic, never a corpus-sized single-task
    window. Curriculum banding (x41) runs on the same primitive."""
    from gwasdb_spark.operators.sampling import exact_ntile

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return exact_ntile(
        o, 10, [F.desc("o_totalprice"), F.asc("o_orderkey")], tile_col="decile"
    ).select("o_orderkey", "o_totalprice", "decile")


@query(
    "x76_percentile_cut",
    "X-quality,X-sample",
    oracle="""
    WITH scored AS (
      SELECT doc_id, n_chars,
             CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) AS n_tok
      FROM documents
    ),
    cut AS (SELECT quantile_cont(n_tok, 0.75) AS p75 FROM scored)
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens,
           ROUND(p75, 9) AS cut_p75
    FROM scored CROSS JOIN cut
    WHERE n_tok > p75
    """,
)
def x76_percentile_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents above the corpus 75th percentile of token count —
    percentile-threshold curation with the cut point computed IN-PLAN
    (1-row exact-`percentile` aggregate, broadcast cross join; never a
    driver .collect() round-trip). Spark's `percentile` and DuckDB's
    `quantile_cont` share linear-interpolation semantics, so the twin
    hashes. At 100 TB swap `percentile` for `approx_percentile` — the
    plan shape (broadcast scalar into a scan-side filter) is unchanged;
    exact percentile's global sort-by-value is the only piece that
    grows."""
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double").alias("n_tok"),
    )
    cut = scored.agg(F.expr("percentile(n_tok, 0.75)").alias("p75"))
    return (
        scored.crossJoin(F.broadcast(cut))
        .filter(F.col("n_tok") > F.col("p75"))
        .select(
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tokens"),
            F.round("p75", 9).alias("cut_p75"),
        )
    )


@query(
    "x77_weighted_sample",
    "X-sample",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             POW(
               CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                         AS BIGINT) AS DOUBLE) / 4294967296.0,
               1.0 / LN(1.0 + CAST(n_chars AS DOUBLE))
             ) AS es_raw
      FROM documents
    )
    SELECT doc_id, n_chars, ROUND(es_raw, 9) AS es_key
    FROM keyed
    ORDER BY es_raw DESC, doc_id
    LIMIT 100
    """,
)
def x77_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis-Spirakis A-Res scheme (key = u^(1/w), keep the top n
    keys) with the uniform u drawn content-addressed from md5(doc_id)
    (first 8 hex digits / 2^32) instead of RNG state — the same
    reproducibility discipline as hash_split/x48: re-runs, backfills,
    and other engines draw the IDENTICAL sample. Weight here is
    ln(1+n_chars) (longer docs proportionally likelier). Physical
    shape: pure projection then orderBy().limit(n) — TakeOrdered's
    per-partition heaps, no global sort, no single-task window."""
    d = table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 8),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    keyed = d.select(
        "doc_id",
        "n_chars",
        F.pow(u, 1.0 / F.log(F.lit(1.0) + F.col("n_chars").cast("double"))).alias(
            "es_key"
        ),
    )
    return (
        keyed.orderBy(F.desc("es_key"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", "n_chars", F.round("es_key", 9).alias("es_key"))
    )


@query(
    "x78_table_profile",
    "X-qa",
    oracle="""
    SELECT 'l_quantity' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(l_quantity) AS BIGINT) AS n_nonnull,
           CAST(COUNT(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           CAST(MIN(l_quantity) AS VARCHAR) AS min_val,
           CAST(MAX(l_quantity) AS VARCHAR) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', COUNT(*), COUNT(l_returnflag),
           COUNT(DISTINCT l_returnflag),
           CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', COUNT(*), COUNT(l_shipdate),
           COUNT(DISTINCT l_shipdate),
           CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           CAST(MIN(l_discount) AS VARCHAR), CAST(MAX(l_discount) AS VARCHAR)
    FROM lineitem
    """,
)
def x78_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table profiling census: per-column row/non-null/distinct counts
    and extrema — the data-quality pass a pipeline runs before touching
    a new drop. Physical shape: one column-pruned branch per column
    (parquet reads exactly that column; total IO across branches = one
    full-table scan), each branch a two-level codegen HashAggregate —
    distinct counts via groupBy(col)→count, never `count_distinct`
    alongside other aggregates, which rewrites to a 5× row expand
    feeding an interpreted SortAggregate (measured 4.7 s vs 0.7 s at
    sf0.1 — string min/max disqualifies hash aggregation for the fused
    form). Branches are independent jobs that AQE runs off one shared
    session; at 100 TB swap approx_count_distinct per branch to drop
    the distinct shuffles entirely."""
    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_returnflag", "l_shipdate", "l_discount"]
    parts = []
    for c in cols:
        basic = li.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(c).alias("n_nonnull"),
            F.min(c).cast("string").alias("min_val"),
            F.max(c).cast("string").alias("max_val"),
        )
        # COUNT(DISTINCT c) semantics: nulls excluded, two-level hash agg
        dist = (
            li.select(c)
            .where(F.col(c).isNotNull())
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_distinct"))
        )
        parts.append(
            basic.crossJoin(F.broadcast(dist)).select(
                F.lit(c).alias("col"),
                "n_rows",
                "n_nonnull",
                "n_distinct",
                "min_val",
                "max_val",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "x79_stopword_discovery",
    "X-text,X-quality",
    oracle="""
    WITH tok AS (
      SELECT doc_id, token FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
      ) raw WHERE token <> ''
    ),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    df AS (
      SELECT token, COUNT(DISTINCT doc_id) AS n_docs_with
      FROM tok GROUP BY token
    ),
    stop AS (
      SELECT token FROM df CROSS JOIN n
      WHERE CAST(n_docs_with AS DOUBLE) / n_docs > 0.40
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN s.token IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_stop,
           ROUND(SUM(CASE WHEN s.token IS NOT NULL THEN 1.0 ELSE 0.0 END)
                 / COUNT(*), 9) AS stop_density
    FROM tok t LEFT JOIN stop s ON s.token = t.token
    GROUP BY t.doc_id
    """,
)
def x79_stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-DRIVEN stopword discovery + per-doc stopword density: a
    token is a stopword when it appears in >40% of documents — no
    fixed language list (c03's Gopher gate uses one; this finds the
    list from the data, which is what you must do for the long tail of
    languages/domains). Shape: one tokenize pass feeds both the df
    aggregate and the per-doc join; the stopword relation is
    vocabulary-bounded and semi-broadcast; n_docs rides in-plan as a
    1-row aggregate. Shuffles carry (token) and (doc_id, token) skinny
    rows only."""
    d = table(spark, sf_dir, "documents")
    tok = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .localCheckpoint(eager=False)  # feeds df counts AND the density join
    )
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    dfreq = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("n_docs_with"))
    stop = (
        dfreq.crossJoin(F.broadcast(n))
        .filter(F.col("n_docs_with").cast("double") / F.col("n_docs") > 0.40)
        .select("token", F.lit(1).alias("__is_stop"))
    )
    return (
        tok.join(F.broadcast(stop), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("__is_stop"), F.lit(0)))
            .cast("long")
            .alias("n_stop"),
            F.round(
                F.sum(F.coalesce(F.col("__is_stop").cast("double"), F.lit(0.0)))
                / F.count(F.lit(1)),
                9,
            ).alias("stop_density"),
        )
    )


@query(
    "x80_kcore",
    "X-graph",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct(
               list_transform(
                 range(1, greatest(len(w) - 2, 0) + 1),
                 i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingles
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
            FROM documents)
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    ex AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    rare AS (SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= 100),
    pruned AS (SELECT ex.doc_id, ex.shingle FROM ex JOIN rare USING (shingle)),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
      FROM pruned a JOIN pruned b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM shared
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.12
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    peel(iter, u, v) AS (
      SELECT 0, u, v FROM edges
      UNION ALL
      SELECT iter + 1, u, v FROM (
        SELECT iter, u, v,
               COUNT(*) OVER (PARTITION BY iter, u) AS du,
               COUNT(*) OVER (PARTITION BY iter, v) AS dv
        FROM peel WHERE iter < 10
      ) WHERE du >= 2 AND dv >= 2
    )
    SELECT DISTINCT CAST(u AS BIGINT) AS id FROM peel WHERE iter = 10
    """,
)
def x80_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the near-dup graph by synchronized peeling: each round
    drops every node with fewer than k surviving neighbors,
    SIMULTANEOUSLY, for a FIXED 10 rounds — the deterministic variant of
    degeneracy peeling (the fixpoint is reached when a round removes
    nothing; 10 synchronized rounds bound the fixpoint at this SF and
    both engines run the identical schedule, so the twin hashes). Cores
    separate dense boilerplate cliques (high core number) from chain
    duplicates (core 1) — which near-dup CLUSTER members to hand-review.
    Shape: per-round degree aggregate over the shrinking alive set,
    lineage cut per round; edge relation checkpointed once."""
    from gwasdb_spark.operators import dedup as DD
    from gwasdb_spark.operators.graph import kcore

    d = table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.12, max_shingle_docs=100
    )
    return kcore(pairs, "id_a", "id_b", k=2, rounds=10).select(
        F.col("id").cast("long").alias("id")
    )


@query(
    "x81_k_anonymity",
    "X-qa,X-priv",
    oracle="""
    WITH bucketed AS (
      SELECT lang, source,
             CAST(n_chars // 500 AS BIGINT) AS len_bucket
      FROM documents
    )
    SELECT lang, source, len_bucket,
           CAST(COUNT(*) AS BIGINT) AS group_size
    FROM bucketed
    GROUP BY 1, 2, 3
    HAVING COUNT(*) < 5
    """,
)
def x81_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit before corpus release: quasi-identifier groups
    (lang, source, 500-char length bucket) with fewer than k=5 members —
    each is a re-identification risk the release gate must suppress or
    generalize. One hash aggregate on the quasi-identifier key; the
    violating-group relation is small by definition (size < k per
    group). Integer floor-division bucketing (the r3-pinned `div`
    discipline — no double rounding drift)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            "source",
            F.expr("n_chars div 500").cast("long").alias("len_bucket"),
        )
        .groupBy("lang", "source", "len_bucket")
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < 5)
    )
