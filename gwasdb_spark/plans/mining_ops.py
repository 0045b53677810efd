"""Round-8 mining surface: sequence-path mining over the event stream,
ROUGE-1 overlap scoring of near-dup pairs, rolling exact quantiles over
the revenue series, and distributed BPE merge learning.

Reference parity: the reference (MerrimanLab/gwasDB) has no operators in
this family — these extend the engine along the mandated
training-data-pipeline axis (dedup diagnostics, tokenizer learning)
plus the event/series analytics users of a warehouse expect.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gwasdb_spark.catalog import table
from gwasdb_spark.plans.base import query

# The x02 candidate-pair CTEs, restated for oracles that consume the
# near-dup pair set (3-gram shingles, <=100-doc frequency prune,
# jaccard >= 0.12 — operators/dedup.py ngram_jaccard_pairs defaults as
# fixed by x02_ngram_jaccard_pairs).
_NEARDUP_PAIRS_CTE = """
    sh AS (
      SELECT doc_id,
             list_distinct(
               list_transform(
                 range(1, greatest(len(w) - 2, 0) + 1),
                 i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS shingles
      FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
            FROM documents)
    ),
    sizes AS (SELECT doc_id, len(shingles) AS n_sh FROM sh),
    exsh AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
    rare AS (SELECT shingle FROM exsh GROUP BY shingle HAVING COUNT(*) <= 100),
    pruned AS (SELECT exsh.doc_id, exsh.shingle
               FROM exsh JOIN rare USING (shingle)),
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
    )
"""


@query(
    "e11_top_paths",
    "X-events,X-analytics",
    oracle="""
    WITH g AS (
      SELECT event_type AS s1,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS s2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS s3
      FROM events
    )
    SELECT s1 || '>' || s2 || '>' || s3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n_paths
    FROM g WHERE s3 IS NOT NULL
    GROUP BY 1
    ORDER BY n_paths DESC, path
    LIMIT 10
    """,
)
def e11_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern head: the 10 most common 3-step event-type
    paths across all user sessions — the "what do users actually do"
    report that funnels (x35) presuppose an answer to. Shape: ONE
    per-user ordered window produces both lookaheads, the path grain is
    |event types|^3-bounded (125 cells here) so the aggregate is a
    shuffle of skinny triples, and the head is TakeOrdered (never a
    global sort). Ties at the cut break on path string — deterministic
    in both engines."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        F.col("event_type").alias("s1"),
        F.lead("event_type", 1).over(w).alias("s2"),
        F.lead("event_type", 2).over(w).alias("s3"),
    ).filter(F.col("s3").isNotNull())
    return (
        g.groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .select(
            F.concat_ws(">", "s1", "s2", "s3").alias("path"), "n_paths"
        )
        .orderBy(F.col("n_paths").desc(), "path")
        .limit(10)
    )


@query(
    "x139_rouge_overlap",
    "X-dedup,X-eval",
    oracle="WITH "
    + _NEARDUP_PAIRS_CTE
    + """,
    toks AS (
      SELECT doc_id, t AS tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
            FROM documents)
      GROUP BY 1, 2
    ),
    ntok AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n FROM toks GROUP BY 1),
    ov AS (
      SELECT p.id_a, p.id_b,
             CAST(SUM(LEAST(ta.c, tb.c)) AS BIGINT) AS n_overlap
      FROM pairs p
      JOIN toks ta ON ta.doc_id = p.id_a
      JOIN toks tb ON tb.doc_id = p.id_b AND tb.tok = ta.tok
      GROUP BY 1, 2
    )
    SELECT ov.id_a, ov.id_b, n_overlap,
           ROUND(2.0 * n_overlap / (na.n + nb.n), 9) AS rouge1_f1
    FROM ov
    JOIN ntok na ON na.doc_id = ov.id_a
    JOIN ntok nb ON nb.doc_id = ov.id_b
    """,
)
def x139_rouge_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1 F1 for every near-dup candidate pair: Jaccard (x02)
    counts DISTINCT shared shingles, which under-weights repeated
    boilerplate; ROUGE-1's clipped-multiset overlap Σ min(c_a, c_b) is
    the summarization-literature measure of how much of one doc's
    surface the other reproduces. F1 = 2·overlap/(n_a + n_b) — the
    precision/recall harmonic collapses to an exact integer ratio, so
    only the final division rounds (9 dp).

    Shape: the pair set is x02's bounded candidate output (shared
    shingle exchange, frequency-pruned — NEVER all-pairs); token
    multisets ride as (doc, 60-bit md5 digest, count) rows so both
    overlap joins shuffle 8-byte keys, not token strings; overlap =
    one join keyed (doc pair via id_a, digest) bounded by
    |pairs|·|tokens per doc|. Oracle joins token strings — digest
    collisions are the usual 2^-60 contract (x130's discipline)."""
    from gwasdb_spark.operators.dedup import ngram_jaccard_pairs

    d = table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.12, max_shingle_docs=100
    ).select("id_a", "id_b")
    h60 = lambda c: F.conv(  # noqa: E731 — column-expression shorthand
        F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10
    ).cast("long")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("t"),
        )
        .groupBy("doc_id", h60(F.col("t")).alias("tok"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        # feeds both pair sides and the per-doc totals — pin so the
        # tokenize + digest pipeline runs once
        .localCheckpoint(eager=False)
    )
    ntok = toks.groupBy("doc_id").agg(F.sum("c").cast("long").alias("n"))
    ta = toks.select(
        F.col("doc_id").alias("id_a"), "tok", F.col("c").alias("ca")
    )
    tb = toks.select(
        F.col("doc_id").alias("id_b"), "tok", F.col("c").alias("cb")
    )
    ov = (
        pairs.join(ta, "id_a")
        .join(tb, ["id_b", "tok"])
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.least("ca", "cb")).cast("long").alias("n_overlap"))
    )
    na = ntok.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = ntok.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        ov.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_overlap",
            F.round(
                2.0 * F.col("n_overlap") / (F.col("na") + F.col("nb")), 9
            ).alias("rouge1_f1"),
        )
    )


@query(
    "w11_rolling_median",
    "X-window,X-series",
    oracle="""
    WITH d AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
               AS x
      FROM orders GROUP BY 1
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           CAST(x AS BIGINT) AS revenue_cents,
           ROUND(quantile_cont(x, 0.5) OVER w7, 6) AS med7,
           ROUND(quantile_cont(x, 0.9) OVER w7, 6) AS p90_7
    FROM d
    WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def w11_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling EXACT 7-day median and p90 of daily revenue — the
    robust-trend twin of w06's EWMA (a single fat-finger day saturates
    a mean-based smoother; the median shrugs it off). Both engines use
    linear-interpolation quantiles (Spark `percentile` ≡ DuckDB
    `quantile_cont`) over the same integer-cents values, so the only
    inexactness is the interpolation midpoint — halves are exact in
    binary, 6-dp round absorbs nothing real. The ordered window runs
    on the DAILY relation — calendar-bounded (#days rows), the
    x131/x72 allowlist class — never on orders."""
    o = table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("double")
        .alias("x")
    )
    w7 = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").cast("long").alias("revenue_cents"),
        F.round(F.expr("percentile(x, 0.5)").over(w7), 6).alias("med7"),
        F.round(F.expr("percentile(x, 0.9)").over(w7), 6).alias("p90_7"),
    )


def _merge_udf(left: str, right: str):
    """Arrow-batched application of ONE BPE merge rule to the symbol
    arrays (sequential merge-with-skip — not expressible in
    `transform`, which cannot consume two positions per step)."""

    @F.pandas_udf("array<string>")
    def _apply(syms: pd.Series) -> pd.Series:
        merged = left + right

        def m(s):
            out, i, n = [], 0, len(s)
            while i < n:
                if i + 1 < n and s[i] == left and s[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            return out

        return syms.map(m)

    return _apply


@query(
    "x140_bpe_learn",
    "X-text,X-tokenizer",
    oracle=None,  # data-dependent argmax per iteration — not SQL-
    # expressible; exact python rederivation in tests/test_mining_ops.py
)
def x140_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning (Sennrich et al. 2016): the first
    20 merge rules of a byte-pair-encoding tokenizer learned from the
    corpus — x33 counts the FIRST round's pairs; this runs the actual
    training loop. Classic BPE trains on the WORD-FREQUENCY table, not
    the corpus: one corpus-scale aggregate builds (word, freq), and
    every iteration after that touches only the |vocab|-row relation —
    the 100 TB corpus is scanned exactly once.

    Per iteration: adjacent-pair counts via slice+zip_with explode
    (freq-weighted, pure codegen), argmax by (freq DESC, left, right)
    via TakeOrdered(1) — a 1-row collect by contract, the only driver
    boundary — then the winning merge applied to the symbol arrays by
    an Arrow-batched pandas UDF (sequential merge-with-skip is not
    expressible in `transform`). The vocab relation is localCheckpointed
    each iteration so plan size stays O(1) across the fixed 20 steps.
    Ties break lexicographically — deterministic across engines/runs.

    Returns (rank, left, right, merged, pair_freq)."""
    d = table(spark, sf_dir, "documents")
    vocab = (
        d.select(
            F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(
            # split-by-empty keeps a trailing "" under Java's limit=-1
            # semantics — filter it before appending the end-of-word
            # marker so no empty symbol enters the pair counts
            F.concat(
                F.filter(
                    F.split(F.col("w"), ""), lambda x: x != F.lit("")
                ),
                F.array(F.lit("</w>")),
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )

    merges = []
    for rank in range(1, 21):
        pair_counts = (
            vocab.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.expr("slice(syms, 1, size(syms) - 1)"),
                        F.expr("slice(syms, 2, size(syms) - 1)"),
                        lambda a, b: F.struct(
                            a.alias("left"), b.alias("right")
                        ),
                    )
                ).alias("p"),
            )
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("pair_freq"))
        )
        top = pair_counts.orderBy(
            F.col("pair_freq").desc(), "left", "right"
        ).limit(1).collect()  # 1 row by construction
        if not top:
            break
        left, right, freq = top[0]["left"], top[0]["right"], top[0]["pair_freq"]
        merges.append((rank, left, right, left + right, int(freq)))

        vocab = vocab.select(
            _merge_udf(left, right)(F.col("syms")).alias("syms"), "freq"
        ).localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_freq long"
    )
