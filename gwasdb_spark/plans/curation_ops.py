"""Training-data curation operators (round 7, batch 5).

The decontamination / sampling / series-diagnostic gaps left after
eval_ops (x119-x123) and metrics_ops (x124-x129):

- x130: eval-set contamination report — the GPT-3 appendix-C method:
  13-gram collision rate of every TEST-split document against the
  train split's shingle set, joined on 60-bit md5 digests so the
  shuffle carries 8-byte keys, never text.
- x131: CUSUM change-point scan of daily order revenue in exact
  integer algebra — n·P_t − t·S never forms the floating mean, so the
  argmax day is bit-identical across engines.
- x132: deterministic hash-ring negative sampling — k contrastive
  negatives per anchor via successor lookup on an md5 ring,
  implemented as one bucket equi-join + a broadcast 256-row fix-up
  (never an all-pairs argmin).
- e08: per-user inter-event burstiness B = (σ−μ)/(σ+μ) with σ from
  the integer identity m·Σx²−S² — the "is this user a cron job or a
  human" triage signal.
- x133: tokenizer fertility audit (tokens-per-word, chars-per-token)
  per source under the BPE-ish pretokenizer.
- x134: Good-Turing unseen-mass estimate per source (f₁/N) — the
  vocabulary-saturation / crawl-more signal, term-digest shuffles.
- x135: skyline (Pareto frontier) document selection over
  (quality, length, fluency) — the distributive two-phase operator
  in operators/skyline.py.
- st16: streaming decontamination-on-ingest — x130 as a live gate,
  per-micro-batch digest join against the static train shingle set.
- e09: damped stationary distribution of the event-type Markov chain
  (x39's PageRank recipe on behavior; |types|²-bounded matrix).
- x137: split-conformal coverage gate — distribution-free ≥90%
  coverage from an exact finite-sample quantile index.
- e10: U-shaped (40-20-40) multi-touch attribution — the per-edge
  credit ledger, engine-exact with no float accumulation.
- x138: length-controlled quality comparison — per-(source, exact
  length decile) means, the "better vs just longer" confounder
  control; cell means exact via int64-scaled scores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from gwasdb_spark.catalog import table
from gwasdb_spark.operators.sampling import global_row_number, split_label
from gwasdb_spark.plans.base import query

# The x16 split CASE, restated for oracles (operators/sampling.py
# split_label: md5 first nibble, c/d → val, e/f → test, else train).
_SPLIT_CASE = """
    CASE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
         WHEN 'c' THEN 'val' WHEN 'd' THEN 'val'
         WHEN 'e' THEN 'test' WHEN 'f' THEN 'test'
         ELSE 'train' END
"""

# Word-13-gram shingle set per doc (DuckDB list algebra), mirroring
# operators/dedup.py word_shingles(n=13).
_SHINGLE13_CTE = r"""
    sh AS (
      SELECT doc_id,
             {split} AS split,
             list_distinct(list_transform(
               range(1, greatest(len(w) - 12, 0) + 1),
               i -> array_to_string(list_slice(w, i, i + 12), ' ')))
               AS shingles
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
            FROM documents)
    )
""".format(split=_SPLIT_CASE)


@query(
    "x130_eval_contamination",
    "X-dedup,X-qa",
    oracle="WITH "
    + _SHINGLE13_CTE
    + """,
    ex AS (
      SELECT doc_id, split,
             CAST('0x' || substr(md5(unnest(shingles)), 1, 15) AS BIGINT)
               AS h
      FROM sh
    ),
    train_h AS (SELECT DISTINCT h FROM ex WHERE split = 'train'),
    te AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN h IN (SELECT h FROM train_h)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
      FROM ex WHERE split = 'test' GROUP BY 1
    ),
    base AS (SELECT doc_id FROM sh WHERE split = 'test')
    SELECT base.doc_id,
           COALESCE(n_shingles, 0) AS n_shingles,
           COALESCE(n_contaminated, 0) AS n_contaminated,
           CASE WHEN COALESCE(n_shingles, 0) > 0
                THEN ROUND(CAST(n_contaminated AS DOUBLE) / n_shingles, 6)
                ELSE 0.0 END AS contaminated_frac,
           COALESCE(n_contaminated, 0) > 0 AS is_contaminated
    FROM base LEFT JOIN te USING (doc_id)
    """,
)
def x130_eval_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination report — the published GPT-3/PaLM
    decontamination method: for every TEST-split document, the count
    and fraction of its distinct word 13-grams that also occur anywhere
    in the TRAIN split. x99 prevents split leakage by construction
    (group-aware hashing); this op MEASURES the leakage a doc-level
    split (x16) actually admits — the audit you run before trusting an
    eval number. Shape: one tokenize+shingle scan; shingles are md5'd
    to 60-bit digests at the scan, so the train-side DISTINCT and the
    semi-join both shuffle 8-byte keys, never 13-word strings (x54's
    digest discipline; the 2^-60 per-pair false-hit rate is identical
    in both engines by construction and far below any curation
    threshold). Train set deduplicates before the join; test side
    joins per-shingle then re-aggregates per doc. Short docs (<13
    words) keep a row with frac 0.0 — silence is not cleanliness.
    Reference decontamination semantics: Brown et al. 2020 App. C.
    Implementation: operators/dedup.py contamination_report (also
    stress-gated at 200k docs with planted overlaps)."""
    from gwasdb_spark.operators.dedup import contamination_report

    d = table(spark, sf_dir, "documents").select(
        "doc_id", split_label(F.col("doc_id")).alias("split"), "text"
    )
    return contamination_report(d, "doc_id", "text", "split", n=13)


@query(
    "x131_cusum_changepoint",
    "X-series,X-qa",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS HUGEINT)
               AS x
      FROM orders GROUP BY 1
    ),
    c AS (
      SELECT day, x,
             SUM(x) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
             ROW_NUMBER() OVER (ORDER BY day) AS t
      FROM daily
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(x) AS HUGEINT) AS s
      FROM daily
    ),
    d AS (
      SELECT day, x, n * p - t * s AS dev FROM c CROSS JOIN tot
    ),
    mx AS (SELECT MAX(ABS(dev)) AS mdev FROM d)
    SELECT strftime(day, '%Y-%m-%d') AS day, CAST(x AS BIGINT) AS revenue_cents,
           CAST(dev AS BIGINT) AS cusum_n,
           ABS(dev) = mdev AS is_changepoint
    FROM d CROSS JOIN mx
    """,
)
def x131_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point scan of daily order revenue: the classic
    level-shift detector (Page 1954) — D_t = Σ_{i≤t}(x_i − x̄) peaks at
    the day the series' mean shifts; x91's anomaly op flags POINT
    outliers, this finds the STRUCTURAL break. All algebra is exact:
    the mean never materializes — n·P_t − t·S (P_t the prefix sum, S
    the total, everything integer cents in decimal(38,0)/HUGEINT) is
    the n-scaled CUSUM, so the argmax day and every reported value are
    bit-identical across engines; |n·P−t·S| ≤ n·S ≈ 2.4e3 · 2.3e14 at
    sf100 — BIGINT-safe with 3 decades of headroom, flagged rows tie
    exactly. The running sum and row index share ONE window spec over
    the daily relation — calendar-bounded (#days), allowlisted like
    x72/x127."""
    o = table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("decimal(38,0)")
            .alias("x")
        )
        # calendar-bounded (#days rows), feeds the cumulative relation
        # AND the totals — pin so the orders scan runs once
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = daily.select(
        "day",
        "x",
        F.sum("x").over(w).alias("p"),
        F.row_number().over(Window.orderBy("day")).alias("t"),
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
    )
    d = c.crossJoin(F.broadcast(tot)).select(
        "day",
        "x",
        (F.col("n") * F.col("p") - F.col("t") * F.col("s")).alias("dev"),
    ).localCheckpoint(eager=False)  # feeds the argmax AND the output
    mx = d.agg(F.max(F.abs(F.col("dev"))).alias("mdev"))
    return d.crossJoin(F.broadcast(mx)).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("x").cast("long").alias("revenue_cents"),
        F.col("dev").cast("long").alias("cusum_n"),
        (F.abs(F.col("dev")) == F.col("mdev")).alias("is_changepoint"),
    )


@query(
    "x132_ring_negatives",
    "X-sample",
    oracle="""
    WITH ring AS (
      SELECT doc_id AS doc,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS r,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
               || ':' || lpad(CAST(doc_id AS VARCHAR), 19, '0') AS rkey
      FROM documents
    ),
    probes AS (
      SELECT d.doc_id AS anchor, t.j AS neg_slot,
             substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                        || CAST(t.j AS VARCHAR)), 1, 15) AS p
      FROM documents d CROSS JOIN range(0, 4) t(j)
    ),
    succ AS (
      SELECT anchor, neg_slot,
             COALESCE((SELECT MIN(rkey) FROM ring WHERE r > p),
                      (SELECT MIN(rkey) FROM ring)) AS skey
      FROM probes
    )
    SELECT anchor, CAST(neg_slot AS INT) AS neg_slot,
           CAST(substr(skey, 17) AS BIGINT) AS neg_id
    FROM succ
    WHERE CAST(substr(skey, 17) AS BIGINT) <> anchor
    """,
)
def x132_ring_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: k=4
    negatives per anchor document, drawn by consistent hashing — probe
    position md5(anchor:j) on the md5(doc_id) ring, negative = the
    ring successor (wrapping). The draw is uniform (md5 spreads the
    ring), reproducible across runs/engines/batch boundaries with NO
    RNG state, and stable under corpus growth: inserting a doc only
    steals the probes that now land before it — every other (anchor,
    slot) pair keeps its negative (the consistent-hashing property;
    rand(seed) re-deals everything when row order shifts). Shape: the
    successor lookup is NEVER an all-pairs argmin — probes equi-join
    ring members on the 4-hex-char bucket prefix (65,536 buckets) and
    take MIN(rkey) among r > p; the ~1/⟨bucket size⟩ of probes whose
    successor lies past their bucket resolve against a broadcast
    65,536-row bucket SPINE carrying the exclusive suffix-minimum
    (first non-empty later bucket = MIN over later buckets), and the
    wraparound against a broadcast 1-row global min. Positions stay
    15-char lowercase-hex strings — lexicographic = numeric, identical
    in both engines — and the min key carries ':' + doc_id zero-padded
    to the full 19-digit int64 width so hash-collision ties break on
    doc_id, not engine whim. Rare self-successor rows (P = 1/n) are
    dropped identically by both engines. Implementation:
    operators/sampling.py ring_negatives (also stress-gated at 2M
    anchors with a full python-bisect checksum)."""
    from gwasdb_spark.operators.sampling import ring_negatives

    d = table(spark, sf_dir, "documents").select("doc_id")
    return ring_negatives(d, "doc_id", k=4)


@query(
    "e08_interevent_burstiness",
    "X-events,X-series",
    oracle="""
    WITH g AS (
      SELECT user_id,
             date_diff('second',
                       LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                       ts) AS gap
      FROM events
    ),
    s AS (
      SELECT user_id, CAST(COUNT(*) AS HUGEINT) AS m,
             CAST(SUM(gap) AS HUGEINT) AS sx,
             CAST(SUM(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS sxx
      FROM g WHERE gap IS NOT NULL GROUP BY 1
    )
    SELECT user_id, CAST(m AS BIGINT) AS n_gaps,
           ROUND(CAST(sx AS DOUBLE) / CAST(m AS DOUBLE), 9) AS mean_gap_s,
           ROUND((sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) - CAST(sx AS DOUBLE))
                 / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE)) + CAST(sx AS DOUBLE)),
                 9) AS burstiness
    FROM s WHERE m >= 2
    """,
)
def e08_interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event-time burstiness B = (σ−μ)/(σ+μ) (Goh &
    Barabási 2008): B → −1 for metronomic (cron/bot) activity, ≈ 0 for
    Poisson arrivals, → +1 for extreme burst-silence alternation — the
    standard bot-vs-human triage signal, complementing x64's debounce
    (which REMOVES bursts; this MEASURES them). Gaps are integer
    seconds from one lag() window partitioned per user (parallel, no
    global state); per-user moments use the integer identity m·Σx²−S²
    (decimal(38,0)/HUGEINT — Σx² of 30-day second-gaps overflows
    BIGINT at whale users, not decimal38) so σ and μ share one scale
    factor m that cancels in B: sqrt is the only inexact step, 9-dp
    rounded. Note σ here is the population std (the B convention).
    Users with <2 gaps carry no signal and are dropped. Dirty-input
    contract: a user whose events all share one timestamp has σ=μ=0 and
    B = 0/0 = NaN in BOTH engines (IEEE, not an error) — undefined
    burstiness stays undefined; the generated corpus never produces
    it (µs-distinct timestamps)."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    g = e.select("user_id", gap.alias("gap")).filter(F.col("gap").isNotNull())
    s = g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("m"),
        F.sum("gap").cast("decimal(38,0)").alias("sx"),
        F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    disc = F.sqrt((F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    sxd = F.col("sx").cast("double")
    return s.filter(F.col("m") >= 2).select(
        "user_id",
        F.col("m").cast("long").alias("n_gaps"),
        F.round(sxd / F.col("m").cast("double"), 9).alias("mean_gap_s"),
        F.round((disc - sxd) / (disc + sxd), 9).alias("burstiness"),
    )


@query(
    "x133_tokenizer_fertility",
    "X-text,X-qa",
    oracle=r"""
    WITH t AS (
      SELECT source,
             CAST(length(text) AS BIGINT) AS chars,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS words,
             CAST(len(regexp_extract_all(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS toks
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS n_words,
           CAST(SUM(toks) AS BIGINT) AS n_tokens,
           ROUND(CAST(SUM(toks) AS DOUBLE) / CAST(SUM(words) AS DOUBLE), 9)
             AS fertility,
           ROUND(CAST(SUM(chars) AS DOUBLE) / CAST(SUM(toks) AS DOUBLE), 9)
             AS chars_per_token
    FROM t GROUP BY 1
    """,
)
def x133_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per source: tokens-per-word and
    chars-per-token under the BPE-ish pretokenizer (functions/text.py
    TOKEN_REGEX) — the pre-training economics check (a source whose
    fertility is 2x costs 2x the compute per word of signal, the
    standard multilingual-tokenizer diagnostic). Pure scan-side
    regexp_count expressions (whole-stage codegen, no UDF) into a
    |sources|-row aggregate; exact BIGINT sums, two final divisions
    9-dp rounded (double quotient reassociates nothing, but DuckDB and
    Spark may fuse differently at higher optimization levels — the
    round is insurance priced at nothing)."""
    from gwasdb_spark.functions import text as TX

    d = table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        F.length("text").cast("long").alias("chars"),
        TX.n_tokens_ws(F.col("text")).alias("words"),
        TX.n_tokens_bpe(F.col("text")).alias("toks"),
    )
    return t.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("words").cast("long").alias("n_words"),
        F.sum("toks").cast("long").alias("n_tokens"),
        F.round(
            F.sum("toks").cast("double") / F.sum("words").cast("double"), 9
        ).alias("fertility"),
        F.round(
            F.sum("chars").cast("double") / F.sum("toks").cast("double"), 9
        ).alias("chars_per_token"),
    )


@query(
    "x134_good_turing",
    "X-text,X-qa",
    oracle="""
    WITH toks AS (
      SELECT source,
             CAST('0x' || substr(md5(unnest(
               string_split_regex(lower(trim(text)), '[^a-z0-9]+'))), 1, 15)
               AS BIGINT) AS h,
             unnest(string_split_regex(lower(trim(text)), '[^a-z0-9]+')) AS w
      FROM documents
    ),
    tf AS (
      SELECT source, h, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks WHERE w <> '' GROUP BY 1, 2
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE) AS unseen_mass
    FROM tf GROUP BY 1
    """,
)
def x134_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing unseen-mass estimate per source: p₀ = f₁/N (the
    total probability a fresh token from this source is a word never
    seen in it) — the corpus-coverage diagnostic behind every smoothed
    LM and the "is this source's vocabulary saturated?" crawl-more
    signal (a high f₁/N says additional data still buys new types).
    Hapax (f₁) and dis legomena (f₂) counts also feed the Turing
    discount f₂/f₁ a smoother would apply. Shape: one tokenize scan;
    terms are md5'd to 60-bit digests at the scan so both aggregation
    shuffles carry (source, 8-byte) keys, never strings (collision
    behavior engine-identical by construction, the x130 discipline);
    two stacked hash-aggregates — (source, term-digest) counts, then a
    |sources|-row frequency-of-frequencies rollup. Every output is an
    exact BIGINT except the final single division of identical
    integers (deterministic, no round needed)."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), "[^a-z0-9]+")
        ).alias("w"),
    ).filter(F.col("w") != "")
    tf = (
        toks.select(
            "source",
            F.conv(F.substring(F.md5(F.col("w").cast("binary")), 1, 15), 16, 10)
            .cast("long")
            .alias("h"),
        )
        .groupBy("source", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return tf.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("f2"),
        (
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("double")
            / F.sum("c").cast("double")
        ).alias("unseen_mass"),
    )


@query(
    "x135_skyline_docs",
    "X-sample,X-qa",
    oracle=r"""
    WITH f AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text) AS DOUBLE) AS n_chars_d,
             CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
             CAST(len(regexp_extract_all(lower(text),
                  '\b(the|and|of|to|a|in|is|that)\b')) AS DOUBLE) AS n_sw,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
               AS DOUBLE) AS n_punct
      FROM documents
    ),
    d AS (
      SELECT doc_id, n_chars,
             ROUND(1.0 / (1.0 + EXP(-(
               -2.4 + 0.35 * LN(1.0 + n_chars_d)
                    + 6.0 * (CASE WHEN n_tok > 0 THEN n_sw / n_tok
                                  ELSE 0.0 END)
                    - 8.0 * (CASE WHEN n_chars_d > 0 THEN n_punct / n_chars_d
                                  ELSE 0.0 END)))), 9) AS score,
             CASE WHEN n_tok > 0 THEN n_sw / n_tok ELSE 0.0 END AS sw_ratio
      FROM f
    )
    SELECT a.doc_id, a.score, a.n_chars, a.sw_ratio
    FROM d a
    WHERE NOT EXISTS (
      SELECT 1 FROM d b
      WHERE b.score >= a.score AND b.n_chars <= a.n_chars
        AND b.sw_ratio >= a.sw_ratio
        AND (b.score > a.score OR b.n_chars < a.n_chars
             OR b.sw_ratio > a.sw_ratio))
    """,
)
def x135_skyline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier document selection — the skyline operator Spark
    lacks: every document no other document beats simultaneously on
    quality score (max), length (min), and stopword fluency (max).
    Multi-objective curation without committing to blend weights: the
    frontier IS the defensible candidate set, and any weighted scorer's
    winner is on it. Shape (operators/skyline.py): skyline is
    distributive, so phase 1 runs a vectorized numpy sort-filter
    skyline per partition via Arrow mapInPandas (the only full-data
    pass, zero shuffle), and phase 2 re-runs the same kernel once over
    the union of local frontiers behind a repartition(1) exchange that
    carries only survivors (coalesce(1) would pull phase 1 serial —
    plan-guarded). Dominance keys: the 9-dp-rounded score (x106's
    tie-grouping discipline) and exact-integer-derived ratios, so both
    engines see identical frontier membership; exactly-tied vectors all
    survive (the SQL NOT EXISTS semantics)."""
    from gwasdb_spark.functions.text import (
        quality_classifier_prob,
        stopword_ratio,
    )
    from gwasdb_spark.operators.skyline import skyline

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.round(quality_classifier_prob(F.col("text")), 9).alias("score"),
        F.length("text").cast("long").alias("n_chars"),
        stopword_ratio(F.col("text")).alias("sw_ratio"),
    )
    return skyline(
        d, [("score", "max"), ("n_chars", "min"), ("sw_ratio", "max")]
    )


def _h60(c):
    """First 60 bits of md5 as a signed long (engine-portable digest)."""
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast(
        "long"
    )


def contamination_gate(train_h: DataFrame, sink: str):
    """st16's foreachBatch sink fn: shingle the batch (13-grams →
    60-bit digests), left-join the static train digest set, and upsert
    the per-doc ledger rows. IDEMPOTENT under at-least-once retry by
    construction: the output is partitioned by batch_id and written
    with dynamic-partition overwrite (the st13 upsert discipline), so
    a batch retried after a partial write replaces its own partition
    instead of duplicating rows. Module-level so the retry contract is
    directly testable (tests/test_streaming.py)."""
    from gwasdb_spark.operators.dedup import _gram_array

    def _gate(batch_df, batch_id):
        tok = batch_df.select(
            "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("__toks")
        )
        ex = tok.select(
            "doc_id",
            F.explode_outer(_gram_array(F.col("__toks"), 13)).alias("g"),
        ).select("doc_id", _h60(F.col("g")).alias("h"))
        hits = (
            ex.join(train_h.withColumn("hit", F.lit(1)), "h", "left")
            .groupBy("doc_id")
            .agg(
                F.sum(
                    F.when(F.col("h").isNotNull(), 1).otherwise(0)
                )
                .cast("long")
                .alias("n_shingles"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0)))
                .cast("long")
                .alias("n_contaminated"),
            )
        )
        spark_b = batch_df.sparkSession
        prev = spark_b.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        spark_b.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                hits.withColumn("batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(sink)
            )
        finally:
            spark_b.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return _gate


@query(
    "st16_stream_contamination",
    "X-stream,X-dedup,X-qa",
    oracle="WITH "
    + _SHINGLE13_CTE
    + """,
    ex AS (
      SELECT doc_id, split,
             CAST('0x' || substr(md5(unnest(shingles)), 1, 15) AS BIGINT)
               AS h
      FROM sh
    ),
    train_h AS (SELECT DISTINCT h FROM ex WHERE split = 'train'),
    te AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
             CAST(SUM(CASE WHEN h IN (SELECT h FROM train_h)
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
      FROM ex WHERE split = 'test' GROUP BY 1
    ),
    base AS (SELECT doc_id FROM sh WHERE split = 'test')
    SELECT base.doc_id,
           COALESCE(n_shingles, 0) AS n_shingles,
           COALESCE(n_contaminated, 0) AS n_contaminated,
           COALESCE(n_contaminated, 0) > 0 AS is_contaminated
    FROM base LEFT JOIN te USING (doc_id)
    """,
)
def st16_stream_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE decontamination-on-ingest — the streaming twin of x130 the
    way st14 is of x44: eval-candidate documents arrive as a file
    stream and each micro-batch is shingled (13-grams → 60-bit md5
    digests, tokens materialized before the gram lambda), left-joined
    against the STATIC train-split digest set, and upserted per-doc
    into a batch_id-partitioned contamination ledger (dynamic-partition
    overwrite, so an at-least-once foreachBatch retry replaces its own
    partition instead of duplicating rows). Per-batch cost is one equi-join on 8-byte
    digests ∝ batch size — the train side is a digest projection
    computed once, never text — so the gate runs at ingest speed
    instead of as a corpus-wide batch job. The final relation is the
    per-doc ledger (shingle count, contaminated count, flag),
    independent of how the file source cut micro-batches because each
    doc arrives exactly once. Staged under a stable stage_dir path
    (the s26/x62 discipline — no per-invocation /tmp litter); the
    checkpoint makes re-runs no-ops, so repeated harness invocations
    read the same ledger."""
    import hashlib as _hl

    from gwasdb_spark.operators.dedup import _gram_array
    from gwasdb_spark.plans.helpers import stage_dir

    d = table(spark, sf_dir, "documents")
    split = split_label(F.col("doc_id"))
    tag = _hl.md5(sf_dir.encode()).hexdigest()[:12]
    # v2: batch_id-partitioned idempotent ledger (layout change — a
    # fresh stage dir so pre-v2 append-mode ledgers can't mix in)
    base = stage_dir(f"stream_contam_v2_{tag}")
    src = os.path.join(base, "arrivals")
    sink = os.path.join(base, "ledger")

    if not os.path.isdir(src):
        (
            d.filter(split == "test")
            .select("doc_id", "text")
            .repartition(4)
            .write.mode("overwrite")
            .json(src)
        )
    train_h = (
        d.filter(split == "train")
        .select(
            F.explode(
                _gram_array(F.split(F.trim(F.col("text")), r"\s+"), 13)
            ).alias("g")
        )
        .select(_h60(F.col("g")).alias("h"))
        .distinct()
    )

    stream = spark.readStream.schema("doc_id bigint, text string").json(src)
    q = (
        stream.writeStream.foreachBatch(contamination_gate(train_h, sink))
        .option("checkpointLocation", os.path.join(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    led = spark.read.parquet(sink)
    return led.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        (F.col("n_contaminated") > 0).alias("is_contaminated"),
    )


@query(
    "e09_markov_stationary",
    "X-events,X-eval",
    oracle="""
    WITH RECURSIVE g AS (
      SELECT user_id, event_type AS src, ts, event_id,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    cells AS (
      SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
      FROM g WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    rowtot AS (SELECT src, SUM(c) AS tot FROM cells GROUP BY 1),
    states AS (
      -- DISTINCT-over-UNION-ALL, not UNION: inside a WITH RECURSIVE
      -- block DuckDB treats a bare UNION CTE as an iterative one and
      -- keeps both branches' duplicates
      SELECT DISTINCT s FROM (
        SELECT src AS s FROM cells UNION ALL SELECT dst FROM cells
      )
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM states),
    p AS (
      SELECT cells.src, cells.dst,
             CAST(c AS DOUBLE) / CAST(tot AS DOUBLE) AS w
      FROM cells JOIN rowtot USING (src)
      UNION ALL
      -- dangling states (dst-only: no outgoing transitions) get a
      -- uniform row, the PageRank dangling-node treatment
      SELECT d.s AS src, st.s AS dst, 1.0 / nn.n AS w
      FROM (SELECT s FROM states
            WHERE s NOT IN (SELECT src FROM cells)) d
      CROSS JOIN states st CROSS JOIN nn
      UNION ALL
      -- zero-weight self rows keep EVERY state in the recursive
      -- working table: without them a src-only state (outgoing edges
      -- but no incoming) drops out after iteration 1 — its own row is
      -- COALESCEd back in the final SELECT, but its OUTGOING mass
      -- (0.95 * teleport * w per successor) silently vanishes from
      -- every successor from iteration 2 onward
      SELECT s AS src, s AS dst, 0.0 AS w FROM states
    ),
    pi(iter, s, r) AS (
      SELECT 0, s, 1.0 / n FROM states CROSS JOIN nn
      UNION ALL
      SELECT q.iter + 1, p.dst, 0.05 / nn.n + 0.95 * SUM(q.r * p.w)
      FROM pi q JOIN p ON p.src = q.s CROSS JOIN nn
      WHERE q.iter < 20
      GROUP BY q.iter, p.dst, nn.n
    )
    -- src-only states receive no incoming edges, so the recursive
    -- step never emits them; their value is exactly the teleport term
    SELECT st.s AS event_type,
           ROUND(COALESCE(q.r, 0.05 / nn.n), 9) AS stationary_p
    FROM states st CROSS JOIN nn
    LEFT JOIN (SELECT s, r FROM pi WHERE iter = 20) q ON q.s = st.s
    """,
)
def e09_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped stationary distribution of the event-type Markov chain —
    "where does user attention SETTLE" (e05 gives one-step transition
    probabilities; this is their fixed point): 20 power-iteration steps
    of pi' = 0.05/n + 0.95*pi*P from uniform, the x39 PageRank recipe
    on the behavioral chain (damping makes the iteration well-posed on
    any empirical matrix). Shape: the transition matrix is bounded by
    |event types|^2 — a broadcast-scale object by CONTRACT, like
    ivf_probe's query set — so cells are counted distributed (one scan,
    one per-user lag window, |types|^2 aggregate), the <=~100-row
    matrix collects to the driver, and numpy runs the 20 fixed matmuls;
    per-state sums are <=|types| doubles, so the 9-dp final round
    absorbs engine-vs-engine association drift exactly as x39's does.
    The iteration count is FIXED (not convergence-tested) so both
    engines compute the identical object. The state set is
    distinct(src) ∪ distinct(dst), so terminal-only (dst-only) and
    entry-only (src-only) event types both survive: dst-only states
    get the PageRank dangling-node treatment (a uniform outgoing row,
    so no transition mass is dropped or silently renormalized), and
    zero-weight self rows keep every state — src-only ones included —
    in the oracle's recursive working table, so a src-only state's
    outgoing mass (0.95 * its teleport value per successor weight)
    keeps flowing at every iteration instead of vanishing after
    iteration 1; the final SELECT's COALESCE over the full state set
    is now pure belt-and-suspenders."""
    import numpy as np

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cells = (
        e.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    rows = cells.collect()  # |types|^2-bounded by contract
    states = sorted({r["src"] for r in rows} | {r["dst"] for r in rows})
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    P = np.zeros((n, n))
    for r in rows:
        P[idx[r["src"]], idx[r["dst"]]] = r["c"]
    tot = P.sum(axis=1, keepdims=True)
    dangling = tot[:, 0] == 0.0  # dst-only states: uniform row
    Pn = P / np.where(tot == 0.0, 1.0, tot)
    Pn[dangling, :] = 1.0 / n
    pi = np.full(n, 1.0 / n)
    for _ in range(20):
        pi = 0.05 / n + 0.95 * (pi @ Pn)
    out = [(s, float(round(pi[idx[s]], 9))) for s in states]
    return spark.createDataFrame(out, "event_type string, stationary_p double")


@query(
    "x137_conformal_coverage",
    "X-eval,X-qa",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CASE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                  WHEN 'c' THEN 'val' WHEN 'd' THEN 'val'
                  WHEN 'e' THEN 'test' WHEN 'f' THEN 'test'
                  ELSE 'train' END AS split,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
             ROUND(1.0 / (1.0 + EXP(-(
               -2.4 + 0.35 * LN(1.0 + CAST(length(text) AS DOUBLE))
               + 6.0 * (CASE WHEN len(regexp_extract_all(text, '\\S+')) > 0
                        THEN CAST(len(regexp_extract_all(lower(text),
                             '\\b(the|and|of|to|a|in|is|that)\\b')) AS DOUBLE)
                             / len(regexp_extract_all(text, '\\S+'))
                        ELSE 0.0 END)
               - 8.0 * (CASE WHEN length(text) > 0
                        THEN CAST(len(regexp_extract_all(text,
                             '[^A-Za-z0-9\\s]')) AS DOUBLE) / length(text)
                        ELSE 0.0 END)))), 9) AS score
      FROM documents
    ),
    cal AS (
      SELECT 1.0 - score AS a, doc_id,
             ROW_NUMBER() OVER (ORDER BY 1.0 - score, doc_id) AS rk
      FROM f WHERE split = 'val' AND pos = 1
    ),
    nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
    q AS (
      SELECT a AS qhat FROM cal CROSS JOIN nc
      WHERE rk = CAST(ceil((n_cal + 1) * 0.9) AS BIGINT)
    )
    SELECT doc_id, pos AS is_en, score,
           (1.0 - score) <= qhat AS in_set
    FROM f CROSS JOIN q WHERE split = 'test'
    """,
)
def x137_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction for the quality classifier: calibrate
    the nonconformity a = 1 - P(en) on the VAL split's true-en docs,
    take q-hat = the ceil((n+1)*0.9)-th smallest a (the finite-sample
    90% quantile with the +1 correction), and flag every TEST doc whose
    nonconformity clears it — the distribution-free coverage guarantee
    (>=90% of true-en test docs land in-set, regardless of how wrong
    the model is) that a calibrated gate (x120) cannot give. Everything
    is exact: the quantile INDEX is integer algebra, the rank runs on
    the 9-dp-rounded score (x106's tie-grouping discipline) with doc_id
    tiebreak via the distributed global-rank primitive, and q-hat rides
    the plan as a broadcast 1-row relation — no driver-side math. One
    corpus scan feeds both splits (pinned)."""
    from gwasdb_spark.functions.text import quality_classifier_prob
    from gwasdb_spark.operators.sampling import split_label

    d = table(spark, sf_dir, "documents")
    f = (
        d.select(
            "doc_id",
            split_label(F.col("doc_id")).alias("split"),
            F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_en"),
            F.round(quality_classifier_prob(F.col("text")), 9).alias("score"),
        )
        # feeds the calibration rank AND the test-side flagging
        .localCheckpoint(eager=False)
    )
    cal = f.filter((F.col("split") == "val") & (F.col("is_en") == 1)).select(
        (F.lit(1.0) - F.col("score")).alias("a"), "doc_id"
    )
    ranked = global_row_number(
        cal, [F.col("a").asc(), F.col("doc_id").asc()], rank_col="rk"
    )
    nc = cal.agg(F.count(F.lit(1)).cast("long").alias("n_cal"))
    qhat = (
        ranked.crossJoin(F.broadcast(nc))
        .filter(
            F.col("rk")
            == F.ceil((F.col("n_cal") + 1) * 0.9).cast("long")
        )
        .select(F.col("a").alias("qhat"))
    )
    return (
        f.filter(F.col("split") == "test")
        .crossJoin(F.broadcast(qhat))
        .select(
            "doc_id",
            "is_en",
            "score",
            ((F.lit(1.0) - F.col("score")) <= F.col("qhat")).alias("in_set"),
        )
    )


@query(
    "e10_ushape_attribution",
    "X-events,X-analytics",
    oracle="""
    WITH p AS (
      SELECT event_id AS purchase_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT event_id AS touch_id, user_id, event_type AS channel, ts
      FROM events WHERE event_type IN ('view', 'click')
    ),
    path AS (
      SELECT p.purchase_id, t.touch_id, t.channel,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                ORDER BY t.ts, t.touch_id) AS pos,
             COUNT(*) OVER (PARTITION BY p.purchase_id) AS n
      FROM p JOIN t ON t.user_id = p.user_id
       AND t.ts < p.p_ts AND t.ts >= p.p_ts - INTERVAL 7 DAY
    )
    SELECT purchase_id, touch_id, channel,
           CAST(pos AS BIGINT) AS pos, CAST(n AS BIGINT) AS n_touches,
           CASE WHEN n = 1 THEN 1.0
                WHEN n = 2 THEN 0.5
                WHEN pos = 1 OR pos = n THEN 0.4
                ELSE 0.2 / CAST(n - 2 AS DOUBLE) END AS credit
    FROM path
    """,
)
def e10_ushape_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped / 40-20-40) multi-touch attribution —
    the credit model between e04's last-touch and full linear: each
    purchase's 7-day touch path (views + clicks) gives 40% to the
    first touch, 40% to the last, and splits 20% across the middles
    (single touch → 100%, two touches → 50/50). Output grain is the
    per-EDGE credit ledger (purchase, touch, credit) — one division
    per row of identical integers, so every value is engine-exact
    with NO cross-purchase float accumulation (a per-channel rollup
    would sum thousands of inexact 0.4s in engine-specific order; the
    consumer can aggregate at whatever grain it trusts). Shape: one
    equi-join on user_id with the interval as a post-filter (one user
    exchange, the e04 discipline; fan-out bounded by per-user
    purchases × touches, never cross-user), then position/count
    windows PARTITIONED by purchase. Ties in the path order break on
    (ts, touch event_id) in both engines."""
    e = table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("touch_id"),
        "user_id",
        F.col("event_type").alias("channel"),
        "ts",
    )
    path = (
        p.join(t, "user_id")
        .filter(
            (F.col("ts") < F.col("p_ts"))
            & (F.col("ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
        )
    )
    wp = Window.partitionBy("purchase_id")
    path = path.select(
        "purchase_id",
        "touch_id",
        "channel",
        F.row_number()
        .over(wp.orderBy("ts", "touch_id"))
        .cast("long")
        .alias("pos"),
        F.count(F.lit(1)).over(wp).cast("long").alias("n_touches"),
    )
    n, pos = F.col("n_touches"), F.col("pos")
    credit = (
        F.when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.5))
        .when((pos == 1) | (pos == n), F.lit(0.4))
        .otherwise(F.lit(0.2) / (n - 2).cast("double"))
    )
    return path.select(
        "purchase_id", "touch_id", "channel", "pos", "n_touches",
        credit.alias("credit"),
    )


@query(
    "x138_length_controlled_quality",
    "X-quality,X-qa",
    oracle=r"""
    WITH f AS (
      SELECT doc_id, source,
             CAST(NTILE(10) OVER (ORDER BY length(text), doc_id) AS INT)
               AS len_decile,
             ROUND(1.0 / (1.0 + EXP(-(
               -2.4 + 0.35 * LN(1.0 + CAST(length(text) AS DOUBLE))
               + 6.0 * (CASE WHEN len(regexp_extract_all(text, '\S+')) > 0
                        THEN CAST(len(regexp_extract_all(lower(text),
                             '\b(the|and|of|to|a|in|is|that)\b')) AS DOUBLE)
                             / len(regexp_extract_all(text, '\S+'))
                        ELSE 0.0 END)
               - 8.0 * (CASE WHEN length(text) > 0
                        THEN CAST(len(regexp_extract_all(text,
                             '[^A-Za-z0-9\s]')) AS DOUBLE) / length(text)
                        ELSE 0.0 END)))), 9) AS score
      FROM documents
    )
    SELECT len_decile, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(ROUND(score * 1000000000) AS BIGINT)) AS DOUBLE)
             / (COUNT(*) * 1e9) AS mean_quality
    FROM f GROUP BY 1, 2
    """,
)
def x138_length_controlled_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-controlled quality comparison — the confounder control a
    source-level quality ranking needs: the x59 score REWARDS length
    (its ln(1+len) term), so a raw per-source mean conflates "writes
    better" with "writes longer". Stratifying by exact length decile
    compares sources WITHIN a length band (Simpson's-paradox insurance;
    x109/x117 quantify association, this removes one known confound).
    Shape: deciles come from the distributed exact-NTILE primitive
    (range exchange + per-partition offsets — the only unpartitioned
    window runs over partition stats, x75's allowlisted shape), then
    one |sources|x10-bounded aggregate. The cell mean is EXACT: the
    9-dp scores scale losslessly to int64 (round(score·1e9)), the sum
    is integer, and one final division of identical integers needs no
    rounding — a double SUM re-rounded at 9 dp flipped a boundary cell
    between engines in testing (drift absorption fails when the true
    mean sits on a half-digit)."""
    from gwasdb_spark.functions.text import quality_classifier_prob
    from gwasdb_spark.operators.sampling import exact_ntile

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.length("text").cast("long").alias("len"),
        F.round(quality_classifier_prob(F.col("text")), 9).alias("score"),
    )
    t = exact_ntile(
        d,
        10,
        [F.col("len").asc(), F.col("doc_id").asc()],
        tile_col="len_decile",
    )
    s9 = F.round(F.col("score") * 1e9).cast("long")
    return t.groupBy("len_decile", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum(s9).cast("double") / (F.count(F.lit(1)) * F.lit(1e9))
        ).alias("mean_quality"),
    )
