"""Model-evaluation and statistical-inference operators.

A training-data pipeline doesn't stop at producing scores (x59 quality,
x30/x100 perplexity) and splits (x99/x112) — it has to EVALUATE them:
does the quality classifier actually separate the cohorts it gates, are
its probabilities calibrated, how concentrated is the corpus, and what
is the uncertainty on a corpus statistic. This module adds those
evaluation primitives, each with the same exactness discipline as the
rest of the registry (integer rank/count algebra end-to-end, one final
division) so the DuckDB oracles hash-match bit-for-bit:

- x119: tie-corrected Mann-Whitney AUC via the distributed global-rank
  primitive (operators/sampling.py global_row_number) — no single-task
  sort anywhere; the rank-sum is exact bigint algebra.
- x120: calibration / reliability report + Brier score in 6-dp-scaled
  integer space (the squared-error sums stay bigint-exact at sf1).
- x121: multi-source BFS hop distances over the shared near-dup pair
  graph — level-synchronous frontier rounds, recursive-CTE oracle.
- x122: Lorenz curve by decile + exact Gini from the Σ rank·value
  identity, on the same global-rank primitive as x119.
- x123: Poisson bootstrap CI — THE resampling scheme that works on
  data too large to permute (each row draws its replicate weight
  independently; no global resample pass), derandomized through the
  repo's content-addressed md5-uniform discipline (x77/x48) so both
  engines draw identical replicates.
- e07: per-state transition entropy over e05's Markov census.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gwasdb_spark.catalog import table
from gwasdb_spark.operators.sampling import global_row_number
from gwasdb_spark.plans.base import query
from gwasdb_spark.plans.extensions import _NEARDUP_EDGES_CTE

# x59's logistic quality model (functions/text.py quality_classifier_prob)
# restated as oracle SQL — x119/x120 evaluate THAT model, so the score
# expression must be the same text the x59 oracle uses.
_QUALITY_SCORE_CTE = r"""
    feats AS (
      SELECT doc_id, lang,
             CAST(length(text) AS DOUBLE) AS n_chars_d,
             CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
             CAST(len(regexp_extract_all(lower(text),
                  '\b(the|and|of|to|a|in|is|that)\b')) AS DOUBLE) AS n_sw,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
               AS DOUBLE) AS n_punct
      FROM documents
    ),
    scored AS (
      SELECT doc_id, lang,
             ROUND(1.0 / (1.0 + EXP(-(
               -2.4 + 0.35 * LN(1.0 + n_chars_d)
                    + 6.0 * (CASE WHEN n_tok > 0 THEN n_sw / n_tok
                                  ELSE 0.0 END)
                    - 8.0 * (CASE WHEN n_chars_d > 0 THEN n_punct / n_chars_d
                                  ELSE 0.0 END)))), 9) AS score,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM feats
    )
"""


def _scored_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score, pos): 9-dp-rounded x59 quality probability plus
    the binary evaluation label (lang = 'en'). The 9-dp round is the
    rank key so both engines tie-group identically at 1-ulp exp/ln
    drift — same discipline as x106's rank keys."""
    from gwasdb_spark.functions.text import quality_classifier_prob

    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(quality_classifier_prob(F.col("text")), 9).alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("pos"),
    )


@query(
    "x119_classifier_auc",
    "X-quality,X-eval",
    oracle=f"""
    WITH {_QUALITY_SCORE_CTE},
    r AS (
      SELECT score, pos,
             RANK() OVER (ORDER BY score) AS mn,
             COUNT(*) OVER (PARTITION BY score) AS cnt
      FROM scored
    )
    SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(COUNT(*) - SUM(pos) AS BIGINT) AS n_neg,
           CAST(SUM(CAST(pos AS BIGINT) * (2 * mn + cnt - 1))
                  - SUM(CAST(pos AS BIGINT))
                    * (SUM(CAST(pos AS BIGINT)) + 1) AS DOUBLE)
             / CAST(2 * SUM(CAST(pos AS BIGINT))
                      * (COUNT(*) - SUM(CAST(pos AS BIGINT))) AS DOUBLE)
             AS auc
    FROM r
    """,
)
def x119_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney AUC of the x59 quality score against
    the lang='en' label — the standard "does the fasttext gate actually
    rank the target cohort higher?" evaluation, run without ever
    sorting the corpus through one task. Rank-sum algebra: ranks come
    from the distributed `global_row_number` (range exchange +
    per-partition offsets; the only unpartitioned window is over
    #partitions stat rows), tie groups contribute their average rank
    exactly via min+max (contiguous ranks within a 9-dp score group),
    and AUC = (2·R_pos − n_pos(n_pos+1)) / (2·n_pos·n_neg) stays in
    BIGINT until the one final division — bit-identical across engines.
    Requires both classes present (the documents table always has
    en + non-en rows); degenerate single-class input returns NULL auc
    rather than a misleading 0/1."""
    from gwasdb_spark.operators.quality import mann_whitney_auc

    return mann_whitney_auc(
        _scored_docs(spark, sf_dir), "score", "pos", "doc_id"
    )


@query(
    "x120_calibration_report",
    "X-quality,X-eval",
    oracle=f"""
    WITH {_QUALITY_SCORE_CTE},
    s6 AS (
      SELECT CAST(ROUND(score * 1000000) AS BIGINT) AS s6, pos
      FROM scored
    ),
    b AS (
      SELECT LEAST(s6 // 100000, 9) AS bin, s6, pos FROM s6
    )
    SELECT CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(s6) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mean_prob,
           CAST(SUM(pos) AS DOUBLE) / COUNT(*) AS frac_pos,
           CAST(SUM((s6 - CAST(pos AS BIGINT) * 1000000)
                    * (s6 - CAST(pos AS BIGINT) * 1000000)) AS DOUBLE)
             / (COUNT(*) * 1000000000000.0) AS brier
    FROM b GROUP BY 1
    """,
)
def x120_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + Brier score for the x59 quality classifier
    against the lang='en' label: ten equal-width probability bins, each
    reporting predicted mean vs empirical positive rate, plus the
    per-bin Brier contribution — the "are the probabilities usable as
    probabilities?" audit that decides whether a gate threshold can be
    set from the score directly. Everything is one scan-side projection
    plus one 10-group aggregate (zero joins, zero windows): scores are
    fixed to 6-dp INTEGER units first, so the mean and the squared-error
    sums are exact BIGINT arithmetic (max ~1e12 per row — no overflow at
    sf1's ~1e6 docs) with one final division per output column."""
    s = _scored_docs(spark, sf_dir)
    s6 = F.round(F.col("score") * 1000000).cast("long")
    b = s.select(
        s6.alias("s6"),
        F.col("pos").cast("long").alias("pos"),
    ).select(
        F.least(F.expr("s6 div 100000"), F.lit(9)).cast("int").alias("bin"),
        "s6",
        "pos",
    )
    err = F.col("s6") - F.col("pos") * 1000000
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("pos").cast("long").alias("n_pos"),
        (
            F.sum("s6").cast("double")
            / (F.count(F.lit(1)) * F.lit(1000000.0))
        ).alias("mean_prob"),
        (F.sum("pos").cast("double") / F.count(F.lit(1))).alias("frac_pos"),
        (
            F.sum(err * err).cast("double")
            / (F.count(F.lit(1)) * F.lit(1000000000000.0))
        ).alias("brier"),
    )


@query(
    "x121_bfs_distances",
    "X-graph",
    oracle=_NEARDUP_EDGES_CTE
    + """
    reach(id, d) AS (
      SELECT DISTINCT u, 0 FROM edges WHERE u % 5 = 0
      UNION
      SELECT e.v, r.d + 1 FROM reach r JOIN edges e ON e.u = r.id
      WHERE r.d < 4
    )
    SELECT CAST(id AS BIGINT) AS id, CAST(MIN(d) AS INT) AS dist
    FROM reach GROUP BY id
    """,
)
def x121_bfs_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance (≤ 4 hops) over the exact 3-gram
    near-dup pair graph — "how far does contamination spread from a
    seed set?": seeds are the graph nodes with doc_id % 5 == 0, and
    every node reachable within 4 hops reports its minimum hop count.
    Level-synchronous frontier expansion: each round is one equi-join
    of the current frontier against the (symmetrized, pinned) edge
    relation plus an anti-join against the visited set — per-round cost
    ∝ frontier adjacency, lineage cut per round via lazy localCheckpoint
    (the x93/x94 iteration discipline). Four rounds is a FIXED hop
    budget (not a convergence loop), so the oracle is a depth-bounded
    recursive CTE over the same edge set."""
    from gwasdb_spark.operators import dedup as DD
    from gwasdb_spark.operators.graph import bfs_distances

    d = table(spark, sf_dir, "documents")
    pairs = DD.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.12, max_shingle_docs=100
    )
    return bfs_distances(pairs, F.col("id") % 5 == 0, max_hops=4)


@query(
    "x122_lorenz_gini",
    "X-qa,X-scale",
    oracle="""
    WITH r AS (
      SELECT n_chars,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rk,
             NTILE(10) OVER (ORDER BY n_chars, doc_id) AS tile
      FROM documents
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS s,
             CAST(SUM(rk * n_chars) AS BIGINT) AS rsum
      FROM r
    ),
    per AS (
      SELECT tile, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS total_chars
      FROM r GROUP BY 1
    ),
    cum AS (
      SELECT tile, n_docs, total_chars,
             CAST(SUM(total_chars) OVER (ORDER BY tile) AS BIGINT)
               AS cum_chars
      FROM per
    )
    SELECT CAST(tile AS INT) AS decile, n_docs, total_chars, cum_chars,
           CAST(cum_chars AS DOUBLE) / CAST(s AS DOUBLE) AS cum_share,
           CAST(2 * rsum AS DOUBLE) / CAST(n * s AS DOUBLE)
             - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
    FROM cum CROSS JOIN tot
    """,
)
def x122_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus concentration audit: the Lorenz curve of character mass
    across documents by decile, plus the exact Gini coefficient — does
    10% of the corpus hold half the text (a dedup/packing skew signal
    and the classic "your token budget is fewer documents than you
    think" diagnostic). Ranks and decile boundaries come from ONE pass
    of the distributed global-rank primitive (tile = SQL-NTILE
    arithmetic on the rank, bit-identical to NTILE(10)); Gini uses the
    identity G = 2·Σ(rank·x)/(n·Σx) − (n+1)/n so it needs only BIGINT
    sums over the ranked stream — no pairwise |Δx| join, no second
    sort. The only unpartitioned ordered windows are over #partitions
    stat rows (inside global_row_number) and the 10 decile rows."""
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = global_row_number(
        d, [F.col("n_chars").asc(), F.col("doc_id").asc()], rank_col="rk"
    ).localCheckpoint(eager=False)  # feeds totals AND the decile rollup
    tot = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("n_chars").cast("long").alias("s"),
        F.sum(F.col("rk") * F.col("n_chars")).cast("long").alias("rsum"),
    )
    # SQL NTILE arithmetic on the global rank (operators/sampling.py
    # exact_ntile's formula, inlined to reuse this query's ranked rel).
    per = (
        ranked.crossJoin(F.broadcast(tot.select("n")))
        .withColumn("__q", F.expr("n div 10"))
        .withColumn("__m", F.expr("n % 10"))
        .withColumn(
            "decile",
            F.when(
                F.col("rk") <= F.col("__m") * (F.col("__q") + 1),
                F.expr("(rk - 1) div (__q + 1) + 1"),
            )
            .otherwise(
                F.col("__m") + F.expr("(rk - __m * (__q + 1) - 1) div __q + 1")
            )
            .cast("int"),
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
    cum_w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.withColumn(
            "cum_chars", F.sum("total_chars").over(cum_w).cast("long")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n_docs",
            "total_chars",
            "cum_chars",
            (F.col("cum_chars").cast("double") / F.col("s").cast("double")).alias(
                "cum_share"
            ),
            (
                (2 * F.col("rsum")).cast("double")
                / (F.col("n") * F.col("s")).cast("double")
                - (F.col("n") + 1).cast("double") / F.col("n").cast("double")
            ).alias("gini"),
        )
    )


# Poisson(1) CDF thresholds (cumulative e^{-1}/k!), full double precision.
# The SAME literal text appears in the oracle so both engines compare the
# identical doubles against the identical md5-uniforms.
_POISSON_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
    "0.999916758850712",
    "0.9999897508033253",
)


def _poisson_weight_sql(u_sql: str) -> str:
    branches = " ".join(
        f"WHEN {u_sql} < {c} THEN {k}" for k, c in enumerate(_POISSON_CDF)
    )
    return f"CASE {branches} ELSE 8 END"


@query(
    "x123_bootstrap_ci",
    "X-eval,X-scale",
    oracle=f"""
    WITH rep AS (
      SELECT b.b AS b, n_chars,
             CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                                       || CAST(b.b AS VARCHAR)), 1, 8)
                       AS BIGINT) AS DOUBLE) / 4294967296.0 AS u
      FROM documents CROSS JOIN range(0, 200) b(b)
    ),
    w AS (
      SELECT b, n_chars, {_poisson_weight_sql('u')} AS w FROM rep
    ),
    est AS (
      SELECT b,
             CAST(SUM(CAST(w AS BIGINT) * n_chars) AS DOUBLE)
               / CAST(SUM(CAST(w AS BIGINT)) AS DOUBLE) AS est
      FROM w GROUP BY b
    ),
    r AS (
      SELECT b, est, ROW_NUMBER() OVER (ORDER BY est, b) AS rn FROM est
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS mean_chars
      FROM documents
    )
    SELECT tot.n_docs, tot.mean_chars,
           MIN(CASE WHEN rn = 5 THEN est END) AS ci_lo,
           MAX(CASE WHEN rn = 196 THEN est END) AS ci_hi
    FROM r CROSS JOIN tot
    GROUP BY 1, 2
    """,
)
def x123_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap confidence interval for the corpus mean document
    length, via the POISSON bootstrap — the resampling scheme that
    scales: a classical bootstrap draws n rows WITH replacement per
    replicate (a global shuffle per replicate, impossible at 100 TB),
    while Poisson(1) replicate weights are drawn per-row independently,
    so all 200 replicates ride ONE scan as a 200-way explode +
    re-aggregation. Weights are derandomized content-addressed
    (md5(doc_id:replicate) → uniform → inverse-CDF, the x77 discipline):
    re-runs and both engines draw the identical resample. Each
    replicate mean is an exact BIGINT-ratio (Σw·x / Σw); the CI is
    order statistics 5 and 196 of the 200 replicate means (2.5%/97.5%,
    lower convention stated here), ranked over a 200-row bounded
    relation — never the data."""
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    # The Poisson CASE is built over the uniform's full SQL text so the
    # weight is one codegen expression on the exploded stream.
    rep = d.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(199))).alias("b"),
    ).select(
        "b",
        "n_chars",
        F.expr(
            _poisson_weight_sql(
                "(cast(conv(substring(md5(cast(concat(cast(doc_id as string),"
                "':', cast(b as string)) as binary)), 1, 8), 16, 10) as double)"
                " / 4294967296.0)"
            )
        ).alias("w"),
    )
    est = rep.groupBy("b").agg(
        (
            F.sum(F.col("w").cast("long") * F.col("n_chars")).cast("double")
            / F.sum(F.col("w").cast("long")).cast("double")
        ).alias("est")
    )
    rn_w = Window.orderBy("est", "b")  # bounded: exactly 200 replicate rows
    ranked = est.withColumn("rn", F.row_number().over(rn_w))
    ci = ranked.agg(
        F.min(F.when(F.col("rn") == 5, F.col("est"))).alias("ci_lo"),
        F.max(F.when(F.col("rn") == 196, F.col("est"))).alias("ci_hi"),
    )
    tot = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
            "mean_chars"
        ),
    )
    return tot.crossJoin(F.broadcast(ci)).select(
        "n_docs", "mean_chars", "ci_lo", "ci_hi"
    )


@query(
    "e07_transition_entropy",
    "X-events,§2.5",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from FROM t GROUP BY 1
    )
    SELECT t.from_type,
           CAST(tot.n_from AS BIGINT) AS n_transitions,
           CAST(COUNT(*) AS BIGINT) AS n_next_types,
           ROUND(-SUM((CAST(t.n AS DOUBLE) / CAST(tot.n_from AS DOUBLE))
                      * LN(CAST(t.n AS DOUBLE)
                           / CAST(tot.n_from AS DOUBLE))), 9)
             AS entropy_nats
    FROM t JOIN tot USING (from_type)
    GROUP BY 1, 2
    """,
)
def e07_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the next-event distribution per current event
    type — e05's Markov census reduced to one number per state: a
    near-zero entropy state is a deterministic funnel step, a
    max-entropy state is a navigation hub (and for synthetic-session
    generation, entropy is the branching budget per state). Built on
    e05's exact shape: one user-partitioned lag window, a
    |types|²-bounded transition count, totals joined back as a
    broadcast ≤|types|-row dim, and −Σ p·ln p summed per state over at
    most |types| terms (9-dp rounded: ln associativity differs across
    engines at ~1e-15 — the x85 discipline)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    tot = t.groupBy("from_type").agg(
        F.sum("n").cast("long").alias("n_from")
    )
    p = F.col("n").cast("double") / F.col("n_from").cast("double")
    return (
        t.join(F.broadcast(tot), "from_type")
        .groupBy("from_type", F.col("n_from").alias("n_transitions"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_next_types"),
            F.round(-F.sum(p * F.log(p)), 9).alias("entropy_nats"),
        )
        .select(
            "from_type", "n_transitions", "n_next_types", "entropy_nats"
        )
    )
