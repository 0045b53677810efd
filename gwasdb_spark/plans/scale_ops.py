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
- x78: table profiling (nulls/distincts/extrema per column) via one
  branch + one distinct aggregate per column — total IO ≈ one scan via
  column pruning; deliberately NOT a single fused aggregate, which
  measured 5x slower (interpreted SortAggregate expand; see the
  function docstring).
- x79: corpus-driven stopword discovery (document-frequency fraction) +
  per-doc stopword density, all distributed aggregates.
- x80: k-core decomposition by synchronized fixed-round peeling (the
  iterative-graph shape with a recursive-CTE twin).
- x81: k-anonymity audit over quasi-identifier groups (governance gate
  before corpus release).

Second batch — corpus/embedding analytics:

- x82: dedup cluster-size histogram (component-grain rollup of x11's CC).
- x83: Zipf rank-frequency OLS fit (vocab ranked via global_row_number).
- x84: lexical richness per source (types, hapax, TTR).
- x85: per-source KL divergence vs the corpus unigram blend.
- x86/x87: embedding label-centroid similarity + centroid-distance
  outliers (one corpus pass to centroids; everything pairwise runs over
  the centroid relation).
- x88: funnel conversion latency (view→purchase, exact seconds).
- s26: small-file compaction with content-identity proof
  (repartitionByRange keeps id clustering; file mechanics in tests).

Third batch — time-series shaping:

- x89: hourly gap-fill/resample (in-plan generated spine, zero-filled).
- x90: per-entity LOCF forward fill (per-user spine + ignorenulls last).
- x91: trailing-24h z-score anomalies over the dense series.
- x92: sparse TF-IDF cosine pairs (df-pruned postings self-join).
- x93: synchronized label-propagation communities (fixed rounds).
- x94: hierarchical subtree rollup (iterative closure, recursive twin).
- x95: sweep-line peak concurrency (two-level time-bucketed cumsum).
"""

from __future__ import annotations

import os

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


@query(
    "x82_cluster_size_histogram",
    "X-dedup,X-qa",
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
    reach(id, lbl) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.id
    ),
    comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
    csize AS (SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY 1)
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM csize GROUP BY 1
    """,
)
def x82_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER-SIZE histogram — the dedup health report
    (how much of the corpus sits in 2-doc pairs vs 50-doc boilerplate
    blobs decides whether keep-one dedup or span-level scrubbing is the
    right treatment). Built on x11's connected components; both
    follow-on aggregates are component-grain then size-grain — strictly
    smaller than the corpus at every step."""
    from gwasdb_spark.operators import dedup as DD
    from gwasdb_spark.operators.graph import connected_components

    d = table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.12, max_shingle_docs=100
    )
    comp = connected_components(pairs)
    return (
        comp.groupBy("component")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
    )


@query(
    "x83_zipf_slope",
    "X-text,X-qa",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    counts AS (
      SELECT token, COUNT(*) AS n FROM tok WHERE token <> '' GROUP BY token
    ),
    ranked AS (
      SELECT LN(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS DOUBLE))
               AS x,
             LN(CAST(n AS DOUBLE)) AS y
      FROM counts
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS m, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM ranked
    )
    SELECT CAST(m AS BIGINT) AS n_terms,
           ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 9) AS slope,
           ROUND((sy - (m * sxy - sx * sy) / (m * sxx - sx * sx) * sx) / m, 9)
             AS intercept
    FROM sums
    """,
)
def x83_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf rank-frequency fit: OLS slope/intercept of ln(freq) over
    ln(rank) across the corpus vocabulary — a natural corpus sanity
    number (clean natural language sits near slope -1; templated or
    synthetic text bends the curve). Frequency ranking runs through
    global_row_number (vocabulary is corpus-bounded but still millions
    of terms at 100 TB — no single-task rank window), and the OLS fit is
    one closed-form aggregate over (x, y) pairs. The oracle spells out
    the same explicit-sum formula (never regr_slope — its streaming
    covariance accumulates in a different order)."""
    from gwasdb_spark.operators.sampling import global_row_number

    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ranked = global_row_number(
        counts, [F.desc("n"), F.asc("token")], rank_col="rk"
    ).select(
        F.log(F.col("rk").cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    sums = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("m").cast("long").alias("n_terms"),
        F.round(slope, 9).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("m"), 9).alias(
            "intercept"
        ),
    )


@query(
    "x84_lexical_richness",
    "X-text,X-quality",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    tc AS (
      SELECT source, token, COUNT(*) AS n
      FROM tok WHERE token <> '' GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(n) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(n), 9) AS type_token_ratio,
           ROUND(SUM(CASE WHEN n = 1 THEN 1.0 ELSE 0.0 END) / COUNT(*), 9)
             AS hapax_fraction
    FROM tc GROUP BY source
    """,
)
def x84_lexical_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical-richness report per source: token count, type (distinct
    token) count, hapax legomena, type-token ratio, hapax fraction —
    the vocabulary-diversity fingerprint that separates organic text
    from templated/boilerplate sources (low TTR, low hapax) before any
    model sees the data. Two stacked aggregates: (source, token) counts
    then source rollup — shuffles carry skinny token rows bounded by
    per-source vocabulary."""
    d = table(spark, sf_dir, "documents")
    tc = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return tc.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).cast("long").alias("n_hapax"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("n"), 9).alias(
            "type_token_ratio"
        ),
        F.round(
            F.sum(F.when(F.col("n") == 1, 1.0).otherwise(0.0)) / F.count(F.lit(1)), 9
        ).alias("hapax_fraction"),
    )


@query(
    "x85_source_kl_divergence",
    "X-text,X-qa",
    oracle="""
    WITH tok AS (
      SELECT source,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
      FROM documents
    ),
    st AS (
      SELECT source, token, COUNT(*) AS n
      FROM tok WHERE token <> '' GROUP BY 1, 2
    ),
    stot AS (SELECT source, CAST(SUM(n) AS DOUBLE) AS s_total
             FROM st GROUP BY 1),
    ct AS (SELECT token, CAST(SUM(n) AS DOUBLE) AS cn FROM st GROUP BY 1),
    tot AS (SELECT SUM(cn) AS c_total FROM ct)
    SELECT s.source,
           ROUND(SUM((s.n / o.s_total)
                     * LN((s.n / o.s_total) / (c.cn / t.c_total))), 9)
             AS kl_divergence
    FROM st s
    JOIN stot o USING (source)
    JOIN ct c USING (token)
    CROSS JOIN tot t
    GROUP BY s.source
    """,
)
def x85_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's unigram distribution from the
    corpus distribution — the quantitative version of x47's mix report:
    which source is most unlike the blend (domain shift, encoding rot,
    synthetic injection) and therefore skews a model trained on the
    mix. Every relation is vocabulary-bounded ((source, token) counts,
    token totals); the corpus total rides as a broadcast 1-row
    aggregate; KL terms sum per source in one grouped aggregate.
    P_source is absolutely continuous w.r.t. P_corpus by construction
    (every source token IS a corpus token), so no smoothing term is
    needed — the log is always finite."""
    d = table(spark, sf_dir, "documents")
    st = (
        d.select(
            "source",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # feeds source totals, token totals, terms
    )
    stot = st.groupBy("source").agg(F.sum("n").cast("double").alias("s_total"))
    ct = st.groupBy("token").agg(F.sum("n").cast("double").alias("cn"))
    tot = ct.agg(F.sum("cn").alias("c_total"))
    p_s = F.col("n") / F.col("s_total")
    p_c = F.col("cn") / F.col("c_total")
    return (
        st.join(F.broadcast(stot), "source")
        .join(ct, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(F.round(F.sum(p_s * F.log(p_s / p_c)), 9).alias("kl_divergence"))
    )


_CENTROID_CTE = """
    dims AS (
      SELECT label, i.i AS pos, AVG(CAST(embedding[i.i] AS DOUBLE)) AS c
      FROM embeddings, range(1, 65) i(i)
      GROUP BY label, i.i
    )
"""


@query(
    "x86_label_centroid_sim",
    "X-sim,X-qa",
    oracle=f"""
    WITH {_CENTROID_CTE},
    pair AS (
      SELECT a.label AS label_a, b.label AS label_b,
             SUM(a.c * b.c) AS dot,
             SUM(a.c * a.c) AS na,
             SUM(b.c * b.c) AS nb
      FROM dims a JOIN dims b ON a.pos = b.pos AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT label_a, label_b,
           ROUND(dot / (SQRT(na) * SQRT(nb)), 6) AS cosine
    FROM pair
    """,
)
def x86_label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-separability audit: pairwise cosine between per-label
    embedding CENTROIDS — two labels whose centroids are near-parallel
    are candidates for merge (or mislabeling) before the embeddings
    feed a classifier or ANN index. Shape: posexplode to (label, dim)
    rows, one avg aggregate (|labels|·dims rows — tiny), then the
    pairwise join runs over the CENTROID relation only (|labels|²·dims),
    never over vectors. The corpus-sized part is exactly one pass."""
    e = table(spark, sf_dir, "embeddings")
    dims = (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("c"))
        .localCheckpoint(eager=False)  # both join sides read it
    )
    a = dims.select(
        F.col("label").alias("label_a"), "pos", F.col("c").alias("ca")
    )
    b = dims.select(
        F.col("label").alias("label_b"), "pos", F.col("c").alias("cb")
    )
    return (
        a.join(b, "pos")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.round(
                F.sum(F.col("ca") * F.col("cb"))
                / (
                    F.sqrt(F.sum(F.col("ca") * F.col("ca")))
                    * F.sqrt(F.sum(F.col("cb") * F.col("cb")))
                ),
                6,
            ).alias("cosine")
        )
    )


@query(
    "x87_centroid_outliers",
    "X-sim,X-qa",
    oracle=f"""
    WITH {_CENTROID_CTE},
    dist AS (
      SELECT e.vec_id, e.label,
             SUM(POW(CAST(e.embedding[d.pos] AS DOUBLE) - d.c, 2)) AS sq_dist
      FROM embeddings e JOIN dims d ON d.label = e.label
      GROUP BY 1, 2
    )
    SELECT vec_id, label, ROUND(sq_dist, 6) AS sq_dist
    FROM dist
    ORDER BY sq_dist DESC, vec_id
    LIMIT 20
    """,
)
def x87_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabel/outlier candidates: the 20 vectors farthest (squared
    euclidean) from their OWN label's centroid — the vectors a labeling
    audit reviews first (SemDeDup/label-error triage shape). The
    centroid relation is |labels|·dims rows and broadcast-joins back to
    the exploded vectors; the final selection is orderBy().limit —
    TakeOrdered per-partition heaps, no global sort."""
    e = table(spark, sf_dir, "embeddings")
    dims = (
        e.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("c"))
    )
    exploded = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "val")
    )
    diff = F.col("val").cast("double") - F.col("c")
    return (
        exploded.join(F.broadcast(dims), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(F.sum(F.pow(diff, F.lit(2))).alias("sq_dist"))
        .orderBy(F.desc("sq_dist"), F.asc("vec_id"))
        .limit(20)
        .select("vec_id", "label", F.round("sq_dist", 6).alias("sq_dist"))
    )


@query(
    "x88_funnel_latency",
    "X-analytics",
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(ts) AS first_view
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    fp AS (
      SELECT e.user_id, f.first_view, MIN(e.ts) AS first_purchase
      FROM events e JOIN fv f USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= f.first_view
      GROUP BY 1, 2
    )
    SELECT user_id, first_view, first_purchase,
           CAST(date_diff('second', first_view, first_purchase) AS BIGINT)
             AS latency_sec
    FROM fp
    """,
)
def x88_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency per user: first 'view' to the first 'purchase'
    at-or-after it — the time-to-convert metric behind x35's funnel
    counts. Two skinny user-grain aggregates (first view, then first
    qualifying purchase); the event-grain filter runs scan-side with
    the type predicate pushed to parquet. Timestamp arithmetic is exact
    integer seconds — no float drift."""
    ev = table(spark, sf_dir, "events")
    fv = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id", "first_view")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return fp.select(
        "user_id",
        "first_view",
        "first_purchase",
        (
            F.unix_timestamp("first_purchase") - F.unix_timestamp("first_view")
        ).cast("long").alias("latency_sec"),
    )


@query(
    "s26_compaction_roundtrip",
    "§2.1-ext,X-qa",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, lang, source FROM documents
    """,
)
def s26_compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the table-maintenance pass every long-
    lived lake table needs (streaming ingest and fine-grained upserts
    strand thousands of KB-sized files; open/footer overhead then
    dominates scans). Stages the documents table as a deliberately
    over-split layout (64 files), compacts via repartitionByRange on
    doc_id to 4 key-clustered files (range clustering keeps id
    pruning/min-max stats tight, vs coalesce which merges arbitrary
    neighbors and destroys clustering), reads the compacted layout back
    and proves content identity against the ORIGINAL table via digest
    rows. File-count mechanics pinned in tests/test_sources.py.

    The staging dir is a stage_dir path — stable within a process
    (repeated bench/driver invocations overwrite one directory instead
    of stranding two table copies per call in /tmp) and PID-scoped so
    concurrent harness runs can't interleave overwrite with read-back."""
    import hashlib as _hl

    from gwasdb_spark.plans.helpers import stage_dir

    d = table(spark, sf_dir, "documents")
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:12]
    base = stage_dir(f"compact_{tag}")
    small = f"{base}/small"
    compacted = f"{base}/compacted"
    d.repartition(64).write.mode("overwrite").parquet(small)
    (
        spark.read.parquet(small)
        .repartitionByRange(4, "doc_id")
        .write.mode("overwrite")
        .parquet(compacted)
    )
    return spark.read.parquet(compacted).select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
        "lang",
        "source",
    )


@query(
    "x89_gap_fill",
    "X-analytics,X-stream",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    c AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT t.event_type, s.hour,
           CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
    FROM spine s CROSS JOIN types t
    LEFT JOIN c ON c.event_type = t.event_type AND c.hour = s.hour
    """,
)
def x89_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly event-count series per type, gaps zero-filled — the
    resample step every downstream time-series consumer (anomaly
    detection, forecasting, rate alerting) silently assumes and raw
    event logs never provide. The hour spine is GENERATED in-plan from
    a 1-row min/max aggregate (`sequence` + explode — rows ∝ time
    range, not events) and cross-joined with the distinct-type relation
    (both broadcast-sized); only the per-(type, hour) count aggregate
    touches the event log, once."""
    ev = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    counts = ev.select("event_type", hour.alias("hour")).groupBy(
        "event_type", "hour"
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        spine.crossJoin(F.broadcast(types))
        .join(counts, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
        )
    )


@query(
    "x90_forward_fill",
    "X-analytics,X-stream",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, AVG(value) AS v
      FROM events GROUP BY 1, 2
    ),
    ub AS (
      SELECT user_id, MIN(hour) AS lo, MAX(hour) AS hi
      FROM hourly GROUP BY 1
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
      FROM ub
    ),
    joined AS (
      SELECT s.user_id, s.hour, h.v
      FROM spine s LEFT JOIN hourly h USING (user_id, hour)
    )
    SELECT user_id, hour,
           ROUND(last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 9)
             AS v_filled,
           v IS NOT NULL AS was_observed
    FROM joined
    """,
)
def x90_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample with last-observation-carried-forward —
    the LOCF imputation that turns sparse event streams into the dense
    per-entity series feature pipelines expect. Each user's spine spans
    their own [first, last] active hour (generated in-plan, rows ∝
    user-hours); the fill is `last(v, ignorenulls)` over a window
    PARTITIONED BY USER — parallel per user, no global sort, state
    bounded by one user's hours. Spine starts at an observed hour, so
    v_filled is never null."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.select(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("hour"), "value"
        )
        .groupBy("user_id", "hour")
        .agg(F.avg("value").alias("v"))
        .localCheckpoint(eager=False)  # feeds bounds AND the fill join
    )
    spine = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
        .select(
            "user_id",
            F.explode(
                F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.round(F.last("v", ignorenulls=True).over(w), 9).alias("v_filled"),
            F.col("v").isNotNull().alias("was_observed"),
        )
    )


@query(
    "x91_series_anomalies",
    "X-analytics,X-qa",
    oracle="""
    WITH b AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi
      FROM events
    ),
    spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM b
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    c AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ),
    series AS (
      SELECT t.event_type, s.hour,
             CAST(COALESCE(c.n, 0) AS DOUBLE) AS n_events
      FROM spine s CROSS JOIN types t
      LEFT JOIN c ON c.event_type = t.event_type AND c.hour = s.hour
    ),
    scored AS (
      SELECT event_type, hour, n_events,
             AVG(n_events) OVER w AS mu,
             STDDEV_SAMP(n_events) OVER w AS sd
      FROM series
      WINDOW w AS (PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour, CAST(n_events AS BIGINT) AS n_events,
           ROUND((n_events - mu) / sd, 6) AS z
    FROM scored
    WHERE sd IS NOT NULL AND sd > 0 AND ABS((n_events - mu) / sd) > 3.0
    """,
)
def x91_series_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-anomaly detection on the gap-filled hourly series: trailing
    24-hour z-score per (type, hour), flag |z| > 3 — the alerting query
    behind every 'error spike' page. Composes x89's dense series (zero
    hours matter: a silent outage IS the anomaly — raw-log windows
    can't see missing data) with per-type trailing windows (parallel
    per type, 24-row frames, no global sort). The trailing frame
    excludes the current hour so a spike can't mask itself."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour")
    )
    types = ev.select("event_type").distinct()
    counts = ev.select("event_type", hour.alias("hour")).groupBy(
        "event_type", "hour"
    ).agg(F.count(F.lit(1)).alias("n"))
    series = (
        spine.crossJoin(F.broadcast(types))
        .join(counts, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n"), F.lit(0)).cast("double").alias("n_events"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-24, -1)
    )
    # sd == 0 (constant trailing frame — e.g. an all-quiet type) must not
    # reach the division: ANSI mode turns x/0 into a runtime error.
    scored = series.withColumn("mu", F.avg("n_events").over(w)).withColumn(
        "sd", F.stddev_samp("n_events").over(w)
    )
    z = F.when(
        F.col("sd").isNotNull() & (F.col("sd") > 0),
        (F.col("n_events") - F.col("mu")) / F.col("sd"),
    )
    return (
        scored.withColumn("z", z)
        .filter(F.col("z").isNotNull() & (F.abs(F.col("z")) > 3.0))
        .select(
            "event_type",
            "hour",
            F.col("n_events").cast("long").alias("n_events"),
            F.round("z", 6).alias("z"),
        )
    )


@query(
    "x92_sparse_cosine_pairs",
    "X-sim,X-dedup",
    oracle="""
    WITH tok AS (
      SELECT doc_id, token FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
      ) raw WHERE token <> ''
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
    vec AS (
      SELECT t.doc_id, t.token,
             t.tf * LN(n.n_docs / d.df) AS w
      FROM tf t JOIN df d USING (token) CROSS JOIN n
      WHERE d.df <= 100
    ),
    norm AS (SELECT doc_id, SQRT(SUM(w * w)) AS nrm FROM vec GROUP BY 1),
    dot AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w * b.w) AS dot
      FROM vec a JOIN vec b
        ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d.id_a, d.id_b,
           ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dot d
    JOIN norm na ON na.doc_id = d.id_a
    JOIN norm nb ON nb.doc_id = d.id_b
    WHERE d.dot / (na.nrm * nb.nrm) >= 0.3
    """,
)
def x92_sparse_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine document pairs ≥ 0.3 — lexical near-dup /
    related-document detection in the SPARSE vector space (catches
    paraphrase-free template reuse that MinHash's set-Jaccard and the
    dense embedding space each miss differently). Physical discipline
    mirrors x02: the pair fan-out happens ONLY through the postings
    self-join on terms with df ≤ 100 (common terms carry no signal AND
    are the quadratic blow-up — one bound serves both purposes), so
    per-term join fan-in is capped at df²; norms and the doc count ride
    the plan as aggregates (no driver actions). The tf-idf postings
    relation is computed once and checkpointed — it feeds the norm
    aggregate and BOTH self-join sides."""
    d = table(spark, sf_dir, "documents")
    tf = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("token"),
        )
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    vec = (
        tf.join(dfreq, "token")
        .filter(F.col("df") <= 100)
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    norm = vec.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    a = vec.select(F.col("doc_id").alias("id_a"), "token", F.col("w").alias("wa"))
    b = vec.select(F.col("doc_id").alias("id_b"), "token", F.col("w").alias("wb"))
    dot = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return (
        dot.join(norm.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na")), "id_a")
        .join(norm.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb")), "id_b")
        .filter(cos >= 0.3)
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
    )


@query(
    "x93_label_propagation",
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
    prs AS (
      SELECT id_a, id_b
      FROM shared
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(n_shared AS DOUBLE) / (sa.n_sh + sb.n_sh - n_shared) >= 0.12
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM prs
      UNION
      SELECT id_b AS u, id_a AS v FROM prs
    ),
    lp(iter, id, lbl) AS (
      SELECT DISTINCT 0, u, u FROM edges
      UNION ALL
      SELECT iter + 1, v, lbl FROM (
        SELECT iter, v, lbl,
               ROW_NUMBER() OVER (PARTITION BY iter, v
                                  ORDER BY cnt DESC, lbl) AS rn
        FROM (
          SELECT p.iter AS iter, e.v AS v, p.lbl AS lbl, COUNT(*) AS cnt
          FROM lp p JOIN edges e ON e.u = p.id
          WHERE p.iter < 5
          GROUP BY 1, 2, 3
        )
      ) WHERE rn = 1
    )
    SELECT CAST(id AS BIGINT) AS id, CAST(lbl AS BIGINT) AS label
    FROM lp WHERE iter = 5
    """,
)
def x93_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the near-dup graph by synchronized label
    propagation (operators/graph.py label_propagation, FIXED 5 rounds:
    deterministic on any engine, so the recursive-CTE twin hashes) —
    the soft-clustering complement to x11's exact components: LPA
    splits a weakly-bridged blob into its dense communities, which is
    the right grouping when two boilerplate families share one chance
    near-dup edge. Per round: one contribution shuffle + (node, label)
    count + per-node argmax window (parallel per node)."""
    from gwasdb_spark.operators import dedup as DD
    from gwasdb_spark.operators.graph import label_propagation

    d = table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.12, max_shingle_docs=100
    )
    return label_propagation(pairs, "id_a", "id_b", rounds=5).select(
        F.col("id").cast("long").alias("id"),
        F.col("label").cast("long").alias("label"),
    )


@query(
    "x94_hierarchy_rollup",
    "X-analytics,X-graph",
    oracle="""
    WITH RECURSIVE parts AS (
      SELECT p_partkey AS part, CAST(p_retailprice AS DOUBLE) AS price
      FROM part
    ),
    closure(part, anc) AS (
      SELECT part, part FROM parts
      UNION
      SELECT c.part, c.anc // 10
      FROM closure c JOIN parts a ON a.part = c.anc
      WHERE c.anc >= 10
    ),
    pairs AS (
      SELECT c.part, c.anc FROM closure c
      JOIN parts p ON p.part = c.anc  -- ancestors that exist as parts
    )
    SELECT pr.anc AS part,
           CAST(COUNT(*) AS BIGINT) AS subtree_size,
           ROUND(SUM(p.price), 6) AS subtree_price
    FROM pairs pr JOIN parts p ON p.part = pr.part
    GROUP BY pr.anc
    """,
)
def x94_hierarchy_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (BOM-style) subtree rollup: parts form a synthetic
    10-ary tree (parent = part div 10); every node aggregates its whole
    SUBTREE's size and retail price — the ancestor-descendant closure +
    rollup that flat SQL can't express without recursion and that BI
    hierarchies (org charts, assemblies, category trees) need
    constantly. The closure is built by iterative self-joins doubling
    nothing: each round extends every path by ONE hop toward the root
    (rounds = tree depth, here ≤ 5; fixpoint reached when a round adds
    no pairs — both engines compute the identical unique closure, so
    the UNION-recursion twin hashes). Closure size = nodes × depth —
    the relation every round shuffles — never nodes². Lineage cut per
    round."""
    p = table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("part"),
        F.col("p_retailprice").cast("double").alias("price"),
    ).localCheckpoint(eager=False)
    parts_only = p.select("part")
    # closure: (part, anc) including self; extend last frontier one hop/round
    closure = p.select("part", F.col("part").alias("anc"))
    frontier = closure
    for _ in range(8):
        nxt = (
            frontier.filter(F.col("anc") >= 10)
            .join(parts_only.withColumnRenamed("part", "anc"), "anc", "left_semi")
            .select("part", F.expr("anc div 10").alias("anc"))
            .exceptAll(closure)
            .distinct()
            .localCheckpoint()
        )
        if nxt.count() == 0:
            break
        closure = closure.unionByName(nxt).localCheckpoint(eager=False)
        frontier = nxt
    pairs = closure.join(
        parts_only.withColumnRenamed("part", "anc"), "anc", "left_semi"
    )
    return (
        pairs.join(p, "part")
        .groupBy(F.col("anc").alias("part"))
        .agg(
            F.count(F.lit(1)).alias("subtree_size"),
            F.round(F.sum("price"), 6).alias("subtree_price"),
        )
    )


@query(
    "x95_peak_concurrency",
    "X-analytics,X-stream",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, epoch_us(ts) AS ts_us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id)
               AS prev_us
      FROM events
    ),
    f AS (
      SELECT user_id, ts, ts_us,
             CASE WHEN prev_us IS NULL
                       OR ts_us - prev_us > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM g
    ),
    numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts_us
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS session_no
      FROM f
    ),
    sessions AS (
      SELECT user_id, session_no, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM numbered GROUP BY 1, 2
    ),
    deltas AS (
      SELECT s_start AS t, 1 AS d FROM sessions
      UNION ALL
      SELECT s_end, -1 FROM sessions
    ),
    net AS (SELECT t, SUM(d) AS net FROM deltas GROUP BY t),
    run AS (
      SELECT t, SUM(net) OVER (ORDER BY t
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS conc
      FROM net
    )
    SELECT CAST(MAX(conc) AS BIGINT) AS peak_concurrency,
           MIN(t) FILTER (WHERE conc = (SELECT MAX(conc) FROM run))
             AS first_peak_ts
    FROM run
    """,
)
def x95_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions (and when it first happened) by
    sweep-line: sessionize (30-min gap), emit +1/-1 boundary deltas,
    NET them per timestamp (ends-before-starts at a shared instant —
    netting per instant makes the tie order irrelevant), running-sum,
    max. The running sum over all boundary timestamps is the classic
    single-task window trap; here it is two-level — per-hour-bucket
    cumsums in parallel, one bounded window over the hour totals
    (operators/sampling.py's packing discipline applied to time) —
    while the ORACLE uses the naive global window, proving the
    decomposition exact. Sessionization windows are per-user."""
    from pyspark.sql.window import Window

    ev = table(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy(F.col("ts_us"), F.col("event_id"))
    g = ev.select(
        "user_id", "ts", "event_id", F.unix_micros("ts").alias("ts_us")
    ).withColumn("prev_us", F.lag("ts_us").over(uw))
    f = g.withColumn(
        "new_session",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("ts_us") - F.col("prev_us") > 1800 * 1_000_000),
            1,
        ).otherwise(0),
    )
    cum = Window.partitionBy("user_id").orderBy("ts_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = (
        f.withColumn("session_no", F.sum("new_session").over(cum))
        .groupBy("user_id", "session_no")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    deltas = sessions.select(F.col("s_start").alias("t"), F.lit(1).alias("d")).unionByName(
        sessions.select(F.col("s_end").alias("t"), F.lit(-1).alias("d"))
    )
    net = deltas.groupBy("t").agg(F.sum("d").alias("net"))
    # two-level global cumsum over boundary timestamps, bucketed by hour
    bucketed = net.withColumn("bucket", F.date_trunc("hour", F.col("t")))
    in_bucket = Window.partitionBy("bucket").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = bucketed.withColumn("local_cum", F.sum("net").over(in_bucket))
    totals = bucketed.groupBy("bucket").agg(F.sum("net").alias("bucket_total"))
    prior = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow - 1
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("bucket_total").over(prior), F.lit(0)).alias("offset"),
    )
    run = (
        local.join(F.broadcast(offsets), "bucket")
        .select("t", (F.col("offset") + F.col("local_cum")).alias("conc"))
        # both consumers (peak scalar, first-peak filter) read one
        # materialization — without it the whole sweep replans twice
        .localCheckpoint(eager=False)
    )
    peak = run.agg(F.max("conc").alias("peak"))
    return (
        run.crossJoin(F.broadcast(peak))
        .filter(F.col("conc") == F.col("peak"))
        .agg(
            F.max("conc").cast("long").alias("peak_concurrency"),
            F.min("t").alias("first_peak_ts"),
        )
    )


# ---------------------------------------------------------------------------
# Fourth batch (round 6) — data-selection and corpus-forensics shapes.
# ---------------------------------------------------------------------------


@query(
    "x96_dsir_importance",
    "X-text,X-sample",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lang,
             CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 128
                  AS INTEGER) AS bucket
      FROM (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS tok
        FROM documents
      )
      WHERE tok <> ''
    ),
    stats AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n_raw,
             CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_target
      FROM toks GROUP BY bucket
    ),
    consts AS (
      SELECT SUM(n_raw) AS tot_raw, SUM(n_target) AS tot_target FROM stats
    ),
    llr AS (
      SELECT bucket,
             LN((n_target + 1.0) / (tot_target + 128.0))
               - LN((n_raw + 1.0) / (tot_raw + 128.0)) AS bucket_llr
      FROM stats CROSS JOIN consts
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM(l.bucket_llr), 6) AS log_importance
    FROM toks t JOIN llr l USING (bucket)
    GROUP BY t.doc_id
    """,
)
def x96_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, public method):
    score every raw document by the log-likelihood ratio of a TARGET
    hashed-token unigram model (here: the lang='en' slice) vs the RAW
    corpus model — the data-selection step that tilts a 100 TB crawl
    toward a target distribution before sampling. Features are words
    hashed content-addressed into 128 buckets (md5 prefix, identical
    on any engine — no vocabulary to ship), both models add-one
    smoothed.

    Physical shape: one token explode feeding (a) the 128-row bucket
    stats aggregate — target and raw counts in the SAME pass via a
    conditional count, not two scans — and (b) the per-doc sum; the
    bucket LLR relation (≤128 rows with its 1-row totals cross-joined
    in-plan) broadcasts back onto the token stream, so the only
    token-grain shuffle carries (doc_id, bucket). The downstream
    consumer composes this with x77's deterministic weighted sampler
    (weight = exp(log_importance)) for the actual resample."""
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .select(
            "doc_id",
            "lang",
            (F.conv(F.substring(F.md5(F.col("tok").cast("binary")), 1, 8), 16, 10)
             .cast("long") % 128).cast("int").alias("bucket"),
        )
        # three consumers (stats, consts via stats, final join) — pin the
        # tokenize+hash projection once or the corpus scans three times
        .localCheckpoint(eager=False)
    )
    stats = toks.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count_if(F.col("lang") == "en").alias("n_target"),
    )
    consts = stats.agg(
        F.sum("n_raw").alias("tot_raw"), F.sum("n_target").alias("tot_target")
    )
    llr = stats.crossJoin(F.broadcast(consts)).select(
        "bucket",
        (
            F.log((F.col("n_target") + 1.0) / (F.col("tot_target") + 128.0))
            - F.log((F.col("n_raw") + 1.0) / (F.col("tot_raw") + 128.0))
        ).alias("bucket_llr"),
    )
    return (
        toks.join(F.broadcast(llr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.round(F.sum("bucket_llr"), 6).alias("log_importance"),
        )
    )


@query(
    "x97_source_dup_profile",
    "X-dedup,X-qa",
    oracle=r"""
    WITH fp AS (
      SELECT source, n_chars,
             md5(trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g'))) AS fingerprint
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT fingerprint) AS BIGINT) AS n_unique,
           ROUND(1.0 - CAST(COUNT(DISTINCT fingerprint) AS DOUBLE)
                 / COUNT(*), 6) AS dup_fraction,
           ROUND(AVG(CAST(n_chars AS DOUBLE)), 6) AS avg_chars
    FROM fp GROUP BY source
    """,
)
def x97_source_dup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplication profile — the triage table a crawl
    pipeline reads before deciding which hosts to throttle or drop
    (CommonCrawl-style pipelines budget by domain, and a source whose
    dup_fraction spikes is a scraper loop or a mirror): docs, unique
    normalized fingerprints (x08's formatting-robust key), the implied
    duplicate fraction, and mean length per source.

    One scan projecting (source, fingerprint digest, n_chars); the
    count_distinct shuffles 16-byte digests keyed by source — never
    text — and |sources| output rows. At 100 TB this is the cheapest
    question the dedup family answers, which is exactly why it runs
    FIRST in a refinery (drop whole sources before pairwise work)."""
    from gwasdb_spark.functions import text as TX

    d = table(spark, sf_dir, "documents")
    fp = d.select(
        "source", "n_chars", TX.fingerprint(F.col("text")).alias("fingerprint")
    )
    return fp.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.count_distinct("fingerprint").cast("long").alias("n_unique"),
        F.round(
            1.0
            - F.count_distinct("fingerprint").cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_fraction"),
        F.round(F.avg(F.col("n_chars").cast("double")), 6).alias("avg_chars"),
    )


@query(
    "x98_shingle_novelty",
    "X-dedup,X-qa",
    oracle=r"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(
               list_transform(
                 range(1, greatest(len(w) - 2, 0) + 1),
                 i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2]))) AS shingle
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents)
    ),
    firsts AS (
      SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
    )
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(COUNT(*) FILTER (WHERE f.first_doc = sh.doc_id) AS BIGINT)
             AS n_novel,
           ROUND(CAST(COUNT(*) FILTER (WHERE f.first_doc = sh.doc_id)
                      AS DOUBLE) / COUNT(*), 6) AS novelty
    FROM sh JOIN firsts f USING (shingle)
    GROUP BY sh.doc_id
    """,
)
def x98_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document shingle novelty — what fraction of a doc's distinct
    3-gram shingles appear in NO earlier document (ingest order =
    doc_id): the redundancy-growth curve that tells a corpus builder
    when additional crawl volume stops adding information (novelty
    decaying toward 0 means the marginal doc is re-paste). Uses x02's
    exact 3-word shingle definition, unpruned — novelty needs every
    shingle, not just rare ones.

    Physical shape — deliberately JOIN-FREE at shingle grain: a doc's
    novel-shingle count is |{shingle : MIN(doc_id over its holders) =
    doc}|, so it falls out of aggregating the first-sighting aggregate
    a second time (shingle-keyed MIN, then first_doc-keyed COUNT) —
    the shingle-keyed equi-join of two multi-million-row relations the
    naive oracle form implies never happens, and the only join is
    doc-grain (|docs| rows per side). Shingles ride as dedup.py's
    xxhash64 occurrence stream (`_exploded_shingle_hashes`: arrays_zip
    codegen, NOT interpreted transform(); shuffles (long, long), never
    strings; 64-bit collision odds ~n²/2^64, the module's documented
    discipline) — every consumer here (count_distinct, MIN, COUNT) is
    multiset-insensitive, so occurrences need no pre-dedup. Measured at
    sf0.1: 18 s (string join form) → ~2 s."""
    d = table(spark, sf_dir, "documents")
    from gwasdb_spark.operators.dedup import _exploded_shingle_hashes

    sh = _exploded_shingle_hashes(d, "doc_id", "text", 3).localCheckpoint(
        eager=False
    )
    totals = sh.groupBy("doc").agg(
        F.count_distinct("sh").cast("long").alias("n_shingles")
    )
    novels = (
        sh.groupBy("sh")
        .agg(F.min("doc").alias("doc"))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
    )
    return (
        totals.join(novels, "doc", "left")
        .select(
            F.col("doc").alias("doc_id"),
            "n_shingles",
            F.coalesce(F.col("n_novel"), F.lit(0)).cast("long").alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0)).cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("novelty"),
        )
    )


@query(
    "x108_l_diversity",
    "X-qa,X-priv",
    oracle="""
    WITH bucketed AS (
      SELECT lang, CAST(n_chars // 500 AS BIGINT) AS len_bucket, source
      FROM documents
    )
    SELECT lang, len_bucket,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_distinct_sensitive
    FROM bucketed
    GROUP BY 1, 2
    HAVING COUNT(DISTINCT source) < 8
    """,
)
def x108_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — x81's homogeneity-attack companion: a
    quasi-identifier group can satisfy k-anonymity (enough members) yet
    still leak if the SENSITIVE attribute is near-constant inside it
    (everyone in the group comes from one host → membership reveals the
    host). Groups on the x81 quasi-identifier (lang, 500-char length
    bucket) with fewer than l=8 distinct sensitive values (source) are
    flagged for suppression/generalization before release. One
    distinct-count aggregate on the QI key — the partial distinct
    dedupes (QI, source) map-side, so the exchange carries at most
    |QI groups| × |sources| skinny rows."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(
            "lang",
            F.expr("n_chars div 500").cast("long").alias("len_bucket"),
            "source",
        )
        .groupBy("lang", "len_bucket")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct("source").alias("n_distinct_sensitive"),
        )
        .filter(F.col("n_distinct_sensitive") < 8)
    )


@query(
    "x109_correlation_matrix",
    "X-qa,A2",
    oracle="""
    WITH v AS (
      SELECT CAST(l_quantity AS DOUBLE) AS quantity,
             CAST(l_extendedprice AS DOUBLE) AS price,
             CAST(l_discount AS DOUBLE) AS discount,
             CAST(l_tax AS DOUBLE) AS tax
      FROM lineitem
    ),
    s AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             SUM(quantity) AS sq, SUM(price) AS sp,
             SUM(discount) AS sd, SUM(tax) AS st,
             SUM(quantity * quantity) AS sqq, SUM(price * price) AS spp,
             SUM(discount * discount) AS sdd, SUM(tax * tax) AS stt,
             SUM(quantity * price) AS sqp, SUM(quantity * discount) AS sqd,
             SUM(quantity * tax) AS sqt, SUM(price * discount) AS spd,
             SUM(price * tax) AS spt, SUM(discount * tax) AS sdt
      FROM v
    ),
    pairs AS (
      SELECT 'quantity' AS col_a, 'price' AS col_b,
             sqp AS sxy, sq AS sx, sp AS sy, sqq AS sxx, spp AS syy, n FROM s
      UNION ALL SELECT 'quantity', 'discount', sqd, sq, sd, sqq, sdd, n FROM s
      UNION ALL SELECT 'quantity', 'tax', sqt, sq, st, sqq, stt, n FROM s
      UNION ALL SELECT 'price', 'discount', spd, sp, sd, spp, sdd, n FROM s
      UNION ALL SELECT 'price', 'tax', spt, sp, st, spp, stt, n FROM s
      UNION ALL SELECT 'discount', 'tax', sdt, sd, st, sdd, stt, n FROM s
    )
    SELECT col_a, col_b,
           ROUND((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)),
                 6) AS pearson_r
    FROM pairs
    """,
)
def x109_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation over the fact table's numeric
    columns — the data-profiling step (x78's multivariate companion)
    that catches leaky/duplicated features and informs which columns
    z-order or bucketing should co-locate. Computed from EXPLICIT
    moment sums (n, Σx, Σy, Σxy, Σx², Σy²) in ONE single-pass
    aggregate — not the builtin corr(), whose summation strategy is
    engine-private — then 6 pair rows expanded from the 1-row moment
    relation. One scan, one 15-value aggregate row, zero joins; at
    100 TB the cost is the scan and nothing else. Double sums associate
    differently across engines at ~1e-10 relative; the 6-dp round
    absorbs it (same discipline as every avg in the suite)."""
    li = table(spark, sf_dir, "lineitem")
    cols = {
        "quantity": F.col("l_quantity").cast("double"),
        "price": F.col("l_extendedprice").cast("double"),
        "discount": F.col("l_discount").cast("double"),
        "tax": F.col("l_tax").cast("double"),
    }
    v = li.select(*[c.alias(k) for k, c in cols.items()])
    names = list(cols)
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for a in names:
        aggs.append(F.sum(F.col(a)).alias(f"s_{a}"))
        aggs.append(F.sum(F.col(a) * F.col(a)).alias(f"s_{a}_{a}"))
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"s_{a}_{b}"))
    s = v.agg(*aggs)
    # expand the 1-row moment relation into 6 pair rows with stack()
    exprs = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            r = (
                f"(n * s_{a}_{b} - s_{a} * s_{b}) / "
                f"(sqrt(n * s_{a}_{a} - s_{a} * s_{a}) * "
                f"sqrt(n * s_{b}_{b} - s_{b} * s_{b}))"
            )
            exprs.append(f"'{a}', '{b}', round({r}, 6)")
    stack = (
        f"stack({len(exprs)}, "
        + ", ".join(exprs)
        + ") AS (col_a, col_b, pearson_r)"
    )
    return s.select(F.expr(stack))


@query(
    "x136_ann_cell_serve",
    "X-sim,X-serve",
    oracle="""
    WITH v AS (SELECT vec_id, embedding AS e FROM embeddings),
    cells AS (
      SELECT vec_id, e,
             CAST(list_position(e, list_max(e)) AS INT) AS cell
      FROM v
    ),
    q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 5),
    dims AS (SELECT CAST(d AS INT) AS cell FROM range(1, 65) t(d)),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.query_id, dims.cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY CAST(qv[dims.cell] AS DOUBLE) DESC, dims.cell)
                 AS dim_rank
        FROM q CROSS JOIN dims
      ) WHERE dim_rank <= 4
    ),
    cand AS (
      SELECT p.query_id, c.vec_id AS neighbor_id, q.qv, c.e AS cv
      FROM probes p
      JOIN cells c ON c.cell = p.cell
      JOIN q ON q.query_id = p.query_id
      WHERE c.vec_id <> p.query_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             list_sum(list_transform(range(1, 65),
               i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, 65),
                    i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))
               AS cos_raw
      FROM cand
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
           ROUND(cos_raw, 6) AS cosine
    FROM (
      SELECT query_id, neighbor_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def x136_ann_cell_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN serving against a PERSISTED cell-partitioned vector index —
    the vector-search sibling of the BM25 build/serve split (x12g) and
    the marker-probe index (g04): the index is built ONCE to disk as
    parquet partitioned BY CELL, and each query's serve cost is the
    probed cells' files only, proven by PartitionFilters in the scan
    (plan-guarded). Cells here are deterministic axis-argmax buckets
    (cell = 1-based index of the vector's max component) so the WHOLE
    serve path — assignment, probe choice, candidate join, rank — is
    SQL-expressible and hash-checked end-to-end; the learned-centroid
    variant of the same machinery (train_ivf_centroids/ivf_probe) keeps
    its recall contracts in tests/test_similarity.py and the 200k-vector
    stress gate. Probes = the query's top-4 components (nprobe=4 of 64
    cells ⇒ ~1/16 of the index scanned per query). The 5-query set is a
    bounded-by-contract collect (the x12g/g04 serving discipline); the
    probe-cell filter is a literal IN over ≤20 cells, which is what
    makes the scan prune statically. Cosine in fixed association order,
    6-dp round (engines associate the 64-term fold differently at
    ~1e-13); rank ties break on neighbor_id."""
    import hashlib as _hl

    import numpy as np

    from gwasdb_spark.functions.vectors import cosine
    from gwasdb_spark.plans.helpers import stage_dir

    e = table(spark, sf_dir, "embeddings")
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:12]
    base = stage_dir(f"ann_cell_index_{tag}")
    if not os.path.isdir(base):
        (
            e.select(
                "vec_id",
                "embedding",
                F.array_position(
                    F.col("embedding"), F.array_max(F.col("embedding"))
                )
                .cast("int")
                .alias("cell"),
            )
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(base)
        )
    index = spark.read.parquet(base)

    qrows = e.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        # top-4 components, ties by lower dim index (matches the oracle's
        # ORDER BY value DESC, dim): stable argsort on (-value, index)
        top = np.lexsort((np.arange(qv.size), -qv))[:4]
        for c in top:
            probe_rows.append(
                (int(r["vec_id"]), [float(x) for x in r["embedding"]], int(c) + 1)
            )
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qv array<float>, cell int"
    )
    probe_cells = sorted({p[2] for p in probe_rows})

    cand = (
        index.filter(F.col("cell").isin(probe_cells))  # static prune
        .join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("embedding")).alias("cos_raw"),
    )
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


@query(
    "x157_ann_index_delete",
    "X-sim,X-serve",
    oracle="""
    WITH corpus AS (
      SELECT vec_id, embedding AS e FROM embeddings
      WHERE vec_id % 17 <> 0
    ),
    cells AS (
      SELECT vec_id, e,
             CAST(list_position(e, list_max(e)) AS INT) AS cell
      FROM corpus
    ),
    q AS (
      SELECT vec_id AS query_id, e AS qv FROM corpus
      WHERE vec_id BETWEEN 1 AND 5
    ),
    dims AS (SELECT CAST(d AS INT) AS cell FROM range(1, 65) t(d)),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.query_id, dims.cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY CAST(qv[dims.cell] AS DOUBLE) DESC, dims.cell)
                 AS dim_rank
        FROM q CROSS JOIN dims
      ) WHERE dim_rank <= 4
    ),
    cand AS (
      SELECT p.query_id, c.vec_id AS neighbor_id, q.qv, c.e AS cv
      FROM probes p
      JOIN cells c ON c.cell = p.cell
      JOIN q ON q.query_id = p.query_id
      WHERE c.vec_id <> p.query_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             list_sum(list_transform(range(1, 65),
               i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, 65),
                    i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))
               AS cos_raw
      FROM cand
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
           ROUND(cos_raw, 6) AS cosine
    FROM (
      SELECT query_id, neighbor_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def x157_ann_index_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETION from the persisted cell-partitioned ANN index (the
    x153 family's missing op, r9 verdict #6): a takedown batch (every
    17th vector — the PII-scrub shape that pairs with x31) plus
    already-absent ids (idempotent no-ops under at-least-once replay)
    is absorbed by `operators/ann_index.delete_from_cell_index`, which
    finds the victims' cells via the (vec_id, cell) manifest sidecar
    and rewrites ONLY those partitions — dynamic partition overwrite,
    emptied cells dropped from index AND manifest, untouched cells'
    files byte-stable (mtime-gated in tests + the annupsert stress
    gate's delete phase). The query then serves the x136 probe path
    against the shrunken index; the oracle recomputes the same top-k
    over (corpus minus takedowns) in SQL, so the hash proves
    delete ≡ rebuild end-to-end. At 100 TB an embedding store that
    cannot delete cannot host user data — this is the op that makes
    the index GDPR-viable, at O(touched cells) not O(index)."""
    import hashlib as _hl

    import numpy as np

    from gwasdb_spark.functions.vectors import cosine
    from gwasdb_spark.operators.ann_index import (
        build_cell_index,
        delete_from_cell_index,
        read_cell_index,
    )
    from gwasdb_spark.plans.helpers import stage_dir

    e = table(spark, sf_dir, "embeddings")
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:12]
    base = stage_dir(f"ann_delete_{tag}")
    if not os.path.isdir(os.path.join(base, "index")):
        build_cell_index(e.select("vec_id", "embedding"), base)
    takedown = e.filter(F.col("vec_id") % 17 == 0).select("vec_id")
    absent = e.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 3000000).alias("vec_id")
    )
    delete_from_cell_index(spark, base, takedown.unionByName(absent))

    index = read_cell_index(spark, base)
    qrows = (
        index.filter(F.col("vec_id").between(1, 5))
        .select("vec_id", "embedding")
        .collect()
    )
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        top = np.lexsort((np.arange(qv.size), -qv))[:4]
        for c in top:
            probe_rows.append(
                (int(r["vec_id"]), [float(x) for x in r["embedding"]], int(c) + 1)
            )
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qv array<float>, cell int"
    )
    probe_cells = sorted({p[2] for p in probe_rows})

    cand = (
        index.filter(F.col("cell").isin(probe_cells))
        .join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("embedding")).alias("cos_raw"),
    )
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos_raw", 6).alias("cosine"),
        )
    )


@query(
    "x153_ann_index_upsert",
    "X-sim,X-serve",
    oracle="""
    WITH orig AS (SELECT vec_id, embedding FROM embeddings),
    v AS (
      SELECT vec_id,
             CASE WHEN vec_id % 20 = 0 THEN list_reverse(embedding)
                  ELSE embedding END AS e
      FROM orig
      UNION ALL
      SELECT vec_id + 1000000 AS vec_id,
             embedding[2:64] || embedding[1:1] AS e
      FROM orig WHERE vec_id < 5
    ),
    cells AS (
      SELECT vec_id, e,
             CAST(list_position(e, list_max(e)) AS INT) AS cell
      FROM v
    ),
    q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < 5),
    dims AS (SELECT CAST(d AS INT) AS cell FROM range(1, 65) t(d)),
    probes AS (
      SELECT query_id, cell FROM (
        SELECT q.query_id, dims.cell,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY CAST(qv[dims.cell] AS DOUBLE) DESC, dims.cell)
                 AS dim_rank
        FROM q CROSS JOIN dims
      ) WHERE dim_rank <= 4
    ),
    cand AS (
      SELECT p.query_id, c.vec_id AS neighbor_id, q.qv, c.e AS cv
      FROM probes p
      JOIN cells c ON c.cell = p.cell
      JOIN q ON q.query_id = p.query_id
      WHERE c.vec_id <> p.query_id
    ),
    scored AS (
      SELECT query_id, neighbor_id,
             list_sum(list_transform(range(1, 65),
               i -> CAST(qv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))))
                * sqrt(list_sum(list_transform(range(1, 65),
                    i -> CAST(cv[i] AS DOUBLE) * CAST(cv[i] AS DOUBLE)))))
               AS cos_raw
      FROM cand
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank,
           ROUND(cos_raw, 6) AS cosine
    FROM (
      SELECT query_id, neighbor_id, cos_raw,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_raw DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
)
def x153_ann_index_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL maintenance of the persisted cell-partitioned ANN
    index (x136's missing half): a batch of vector replacements (every
    20th vector's embedding reversed — most change their argmax cell,
    so rows MOVE between partitions) plus additions (5 rotated twins)
    is absorbed by `operators/ann_index.upsert_cell_index`, which
    rewrites ONLY the touched cell partitions — old cells found via the
    (vec_id, cell) manifest sidecar, new+old cell set pruned statically,
    dynamic partition overwrite leaves every untouched cell's files
    byte-stable (the x62 LSM postings discipline applied to IVF cells;
    at 100 TB nobody rebuilds the index per ingest batch). The query
    then serves x136's probe path against the UPSERTED index, and the
    oracle recomputes the same top-k over the logically-updated corpus
    in SQL — so the hash check proves upsert ≡ rebuild end-to-end. The
    upsert is idempotent (re-running the batch replaces the same rows
    with the same values), so repeated invocations serve identical
    results. Bit-equality vs a full rebuild and untouched-file mtime
    stability are additionally gated in tests and the stress harness."""
    import hashlib as _hl

    import numpy as np

    from gwasdb_spark.functions.vectors import cosine
    from gwasdb_spark.operators.ann_index import (
        build_cell_index,
        read_cell_index,
        upsert_cell_index,
    )
    from gwasdb_spark.plans.helpers import stage_dir

    e = table(spark, sf_dir, "embeddings")
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:12]
    base = stage_dir(f"ann_upsert_{tag}")
    if not os.path.isdir(os.path.join(base, "index")):
        build_cell_index(e.select("vec_id", "embedding"), base)
    emb = F.col("embedding")
    replacements = e.filter(F.col("vec_id") % 20 == 0).select(
        "vec_id", F.reverse(emb).alias("embedding")
    )
    additions = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.concat(F.slice(emb, 2, 63), F.slice(emb, 1, 1)).alias("embedding"),
    )
    upsert_cell_index(spark, base, replacements.unionByName(additions))

    index = read_cell_index(spark, base)
    qrows = (
        index.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    )
    probe_rows = []
    for r in qrows:
        qv = np.asarray(r["embedding"], dtype=np.float64)
        top = np.lexsort((np.arange(qv.size), -qv))[:4]
        for c in top:
            probe_rows.append(
                (int(r["vec_id"]), [float(x) for x in r["embedding"]], int(c) + 1)
            )
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qv array<float>, cell int"
    )
    probe_cells = sorted({p[2] for p in probe_rows})

    cand = (
        index.filter(F.col("cell").isin(probe_cells))
        .join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("embedding")).alias("cos_raw"),
    )
    from pyspark.sql.window import Window as _W

    w = _W.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.round("cos_raw", 6).alias("cosine"),
        )
    )
