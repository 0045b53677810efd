"""Corpus-quality queries: repetition gates, vocabulary capping, length
histograms (operators/quality.py behind oracle-checked registrations).

The pre-training data-prep counterpart of the reference's marker-QC
flag/filter stage (R/wrangle_data.Rmd:96-118): measure each document,
gate on thresholds, rewrite the corpus — all as single declarative plans
over the `documents` table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gwasdb_spark.catalog import table
from gwasdb_spark.operators.quality import cap_vocabulary, repetition_signals
from gwasdb_spark.plans.base import query

_SQL_TOK = r"""
    tok AS (
      SELECT doc_id, token, pos FROM (
        SELECT doc_id,
               unnest(string_split_regex(trim(text), '\s+')) AS token,
               generate_subscripts(string_split_regex(trim(text), '\s+'), 1)
                 AS pos
        FROM documents
      ) raw WHERE token <> ''
    )
"""


@query(
    "x25_repetition_signals",
    "X-text,X-quality",
    oracle=rf"""
    WITH {_SQL_TOK},
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ),
    tstats AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
             CAST(MAX(tf) AS BIGINT) AS max_tf
      FROM tf GROUP BY 1
    ),
    bg AS (
      SELECT doc_id, token,
             LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS next_token
      FROM tok
    ),
    bstats AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(COUNT(DISTINCT token || ' ' || next_token) AS BIGINT)
               AS n_distinct_bigrams
      FROM bg WHERE next_token IS NOT NULL GROUP BY 1
    )
    SELECT t.doc_id, t.n_tokens, t.n_distinct_tokens, t.max_tf,
      CASE WHEN t.n_tokens > 0 THEN
        CAST(t.n_tokens - t.n_distinct_tokens AS DOUBLE)
          / CAST(t.n_tokens AS DOUBLE) END AS dup_token_frac,
      CASE WHEN t.n_tokens > 0 THEN
        CAST(t.max_tf AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) END
        AS top_token_frac,
      COALESCE(b.n_bigrams, 0) AS n_bigrams,
      COALESCE(b.n_distinct_bigrams, 0) AS n_distinct_bigrams,
      CASE WHEN b.n_bigrams > 0 THEN
        CAST(b.n_bigrams - b.n_distinct_bigrams AS DOUBLE)
          / CAST(b.n_bigrams AS DOUBLE) END AS dup_bigram_frac,
      ((CASE WHEN t.n_tokens > 0 THEN
          CAST(t.n_tokens - t.n_distinct_tokens AS DOUBLE)
            / CAST(t.n_tokens AS DOUBLE) END > 0.6)
       OR (CASE WHEN t.n_tokens > 0 THEN
             CAST(t.max_tf AS DOUBLE) / CAST(t.n_tokens AS DOUBLE) END > 0.2)
       OR COALESCE(CASE WHEN b.n_bigrams > 0 THEN
            CAST(b.n_bigrams - b.n_distinct_bigrams AS DOUBLE)
              / CAST(b.n_bigrams AS DOUBLE) END > 0.4, FALSE))
        AS is_repetitive
    FROM tstats t LEFT JOIN bstats b USING (doc_id)
    """,
)
def x25_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gate: duplicate-token, top-token, and
    duplicate-bigram fractions per document plus the combined pass/fail
    flag. Two partial-aggregated (doc, token) shuffles + one per-doc
    lead() window — all counts exact integers, fractions divided once
    (operators/quality.py scale notes)."""
    d = table(spark, sf_dir, "documents")
    return repetition_signals(d, "doc_id", "text")


@query(
    "x26_cap_vocabulary",
    "X-text,X-quality",
    oracle=rf"""
    WITH {_SQL_TOK},
    counts AS (SELECT token, COUNT(*) AS n_occ FROM tok GROUP BY 1),
    kept AS (SELECT token FROM counts ORDER BY n_occ DESC, token LIMIT 40),
    tagged AS (
      SELECT doc_id, pos,
             CASE WHEN token IN (SELECT token FROM kept) THEN token
                  ELSE '<unk>' END AS out_token
      FROM tok
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN out_token = '<unk>' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_unk,
           string_agg(out_token, ' ' ORDER BY pos) AS capped_text
    FROM tagged GROUP BY doc_id
    """,
)
def x26_cap_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-vocabulary rewrite: keep the corpus' 40 most frequent tokens
    (exact counts, lexicographic tiebreak), replace the tail with
    ``<unk>``, reassemble each document in token order. The kept-set is
    a bounded TakeOrdered head broadcast onto the token stream — the
    unbounded rare-token tail never concentrates anywhere
    (operators/quality.py cap_vocabulary)."""
    d = table(spark, sf_dir, "documents")
    return cap_vocabulary(d, "doc_id", "text", max_vocab=40)


@query(
    "x27_length_histogram",
    "X-text,A-group",
    oracle=r"""
    WITH t AS (
      SELECT lang,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT lang, CAST(length(bin(n_tokens)) AS BIGINT) AS log2_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM t WHERE n_tokens > 0 GROUP BY 1, 2
    """,
)
def x27_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram in power-of-two buckets per language — the
    sequence-length profile that sizes packing (x17) and batching.
    Bucket = bit-length of the token count (floor(log2)+1), computed on
    exact integers in both engines — no float log() drift. Pure scan
    projection + one small group-by."""
    from gwasdb_spark.functions import text as TX

    d = table(spark, sf_dir, "documents")
    n_tok = TX.n_tokens_ws(F.col("text"))
    return (
        d.select("lang", n_tok.alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
        .groupBy(
            "lang", F.length(F.bin(F.col("n_tokens"))).cast("long").alias("log2_bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
    )


@query(
    "x28_temperature_sample",
    "X-sample",
    oracle=r"""
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS group_size FROM documents
      GROUP BY 1
    ),
    r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS sample_rank
      FROM documents
    )
    SELECT r.doc_id, r.lang, CAST(r.sample_rank AS BIGINT) AS sample_rank,
           c.group_size,
           CAST(CEIL(8.0 * SQRT(CAST(c.group_size AS DOUBLE))) AS BIGINT)
             AS group_quota
    FROM r JOIN c USING (lang)
    WHERE r.sample_rank <= CEIL(8.0 * SQRT(CAST(c.group_size AS DOUBLE)))
    """,
)
def x28_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """√-temperature language rebalancing: per-lang quota ⌈8·√n⌉ drawn in
    deterministic md5(doc_id) order — dominant languages downsampled
    toward the square-root law, rare ones kept nearly whole. Quota math
    uses only per-group scalars (√ is correctly rounded IEEE, 8 a power
    of two), so the cut is bit-identical across engines
    (operators/sampling.py temperature_sample)."""
    from gwasdb_spark.operators.sampling import temperature_sample

    d = table(spark, sf_dir, "documents")
    return temperature_sample(d, "lang", "doc_id", scale=8.0).select(
        "doc_id", "lang", "sample_rank", "group_size", "group_quota"
    )


@query(
    "x29_dedup_keep_best",
    "X-dedup,X-quality",
    oracle="""
    WITH g AS (
      SELECT doc_id, n_chars, md5(text) AS digest,
             ROW_NUMBER() OVER (PARTITION BY md5(text)
                                ORDER BY n_chars DESC, doc_id) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY md5(text)) AS BIGINT)
               AS n_copies
      FROM documents
    )
    SELECT doc_id, n_chars, digest, n_copies FROM g WHERE rk = 1
    """,
)
def x29_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-doc selection: one survivor per distinct content, best
    quality (n_chars) first, id tiebreak — dedup as curation
    (operators/dedup.py keep_best_per_content; window partitions are
    duplicate groups, so no skew and no text shuffle)."""
    from gwasdb_spark.operators.dedup import keep_best_per_content

    d = table(spark, sf_dir, "documents")
    return keep_best_per_content(d, "doc_id", "text", "n_chars")


@query(
    "x30_unigram_logprob",
    "X-text,X-quality",
    oracle=rf"""
    WITH {_SQL_TOK},
    counts AS (SELECT token, COUNT(*) AS n_occ FROM tok GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_occ) AS DOUBLE) AS n_total FROM counts)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(LN(CAST(n_occ AS DOUBLE) / n_total)), 9) AS avg_logprob,
           ROUND(MIN(LN(CAST(n_occ AS DOUBLE) / n_total)), 9) AS min_logprob
    FROM tok JOIN counts USING (token) CROSS JOIN tot
    GROUP BY doc_id
    """,
)
def x30_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: mean/min token log-probability
    under the corpus' own unigram distribution. Corpus total rides as a
    1-row cross join (in-plan constant, no driver action); shuffles carry
    token pairs only (operators/quality.py unigram_logprob)."""
    from gwasdb_spark.operators.quality import unigram_logprob

    d = table(spark, sf_dir, "documents")
    res = unigram_logprob(d, "doc_id", "text")
    # 9-dp round: avg-of-logs associates differently across engines at
    # ~1e-15; the rounded value is what both the driver and in-repo gates
    # compare.
    return res.select(
        "doc_id",
        "n_tokens",
        F.round("avg_logprob", 9).alias("avg_logprob"),
        F.round("min_logprob", 9).alias("min_logprob"),
    )


@query(
    "x31_pii_scrub",
    "X-text,X-quality",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(text,
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT)
             AS n_ips,
           CAST(len(regexp_extract_all(text,
             '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b')) AS BIGINT)
             AS n_phones,
           regexp_replace(regexp_replace(regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g'),
             '\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b', '[PHONE]', 'g')
             AS scrubbed_text
    FROM documents
    """,
)
def x31_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-hygiene PII redaction with audit counts — emails, IPv4s,
    phone-shaped numbers → typed sentinels. Pure codegen regex path;
    patterns held in the Java ∩ RE2 common dialect so the oracle matches
    byte-for-byte (operators/quality.py pii_scrub; behavior on real PII
    exercised in tests/test_quality.py)."""
    from gwasdb_spark.operators.quality import pii_scrub

    d = table(spark, sf_dir, "documents")
    return pii_scrub(d, "doc_id", "text")


@query(
    "x33_bpe_pair_counts",
    "X-text,X-vocab",
    oracle=r"""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS word
      FROM documents
    ),
    words AS (
      SELECT word, COUNT(*) AS freq FROM tok
      WHERE word <> '' AND len(word) >= 2 GROUP BY 1
    ),
    pairs AS (
      SELECT substr(word, CAST(i AS INT), 2) AS pair, freq FROM (
        SELECT word, freq, unnest(range(1, len(word))) AS i FROM words
      )
    ),
    agg AS (SELECT pair, CAST(SUM(freq) AS BIGINT) AS n_occ FROM pairs GROUP BY 1)
    SELECT pair, n_occ, CAST(rank AS BIGINT) AS rank FROM (
      SELECT pair, n_occ,
             ROW_NUMBER() OVER (ORDER BY n_occ DESC, pair) AS rank
      FROM agg
    ) WHERE rank <= 20
    """,
)
def x33_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training inner loop: top-20 adjacent character pairs
    corpus-wide, counted over the DISTINCT-word vocabulary weighted by
    word frequency — pair enumeration scales with vocabulary size, not
    corpus size (operators/vocab.py bpe_pair_counts)."""
    from gwasdb_spark.operators.vocab import bpe_pair_counts

    d = table(spark, sf_dir, "documents")
    return bpe_pair_counts(d, "text", top_n=20)


@query(
    "x40_dup_ngram_coverage",
    "X-text,X-quality",
    oracle=rf"""
    WITH {_SQL_TOK},
    seq AS (
      SELECT doc_id, token,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS idx
      FROM tok
    ),
    led AS (
      SELECT doc_id, idx, token,
             LEAD(token, 1) OVER w AS t1, LEAD(token, 2) OVER w AS t2,
             LEAD(token, 3) OVER w AS t3, LEAD(token, 4) OVER w AS t4
      FROM seq WINDOW w AS (PARTITION BY doc_id ORDER BY idx)
    ),
    grams AS (
      SELECT doc_id, idx AS gpos,
             token || ' ' || t1 || ' ' || t2 || ' ' || t3 || ' ' || t4 AS gram
      FROM led WHERE t4 IS NOT NULL
    ),
    dup AS (
      SELECT doc_id, gpos FROM (
        SELECT doc_id, gpos,
               COUNT(*) OVER (PARTITION BY doc_id, gram) AS n_occ
        FROM grams
      ) WHERE n_occ > 1
    ),
    covered AS (
      SELECT DISTINCT doc_id, CAST(u.tpos AS BIGINT) AS tpos
      FROM (SELECT doc_id, unnest(range(gpos, gpos + 5)) AS tpos FROM dup) u
    ),
    cov_counts AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_positions
      FROM covered GROUP BY doc_id
    ),
    nt AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens FROM seq GROUP BY 1
    )
    SELECT nt.doc_id, nt.n_tokens,
           COALESCE(c.n_dup_positions, 0) AS n_dup_positions,
           CASE WHEN nt.n_tokens > 0
                THEN CAST(COALESCE(c.n_dup_positions, 0) AS DOUBLE)
                     / CAST(nt.n_tokens AS DOUBLE)
                ELSE 0.0 END AS dup_ngram_frac
    FROM nt LEFT JOIN cov_counts c USING (doc_id)
    """,
)
def x40_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FineWeb/Gopher duplicate-5-gram coverage: fraction of token
    positions inside an n-gram repeated within the SAME document —
    catches templated boilerplate that per-token duplication misses.
    Exact integer position counting both sides
    (operators/quality.py dup_ngram_coverage)."""
    from gwasdb_spark.operators.quality import dup_ngram_coverage

    d = table(spark, sf_dir, "documents")
    return dup_ngram_coverage(d, "doc_id", "text", n=5)


@query(
    "x41_curriculum_order",
    "X-sample,X-assembly",
    oracle=r"""
    WITH q AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    banded AS (
      SELECT doc_id, n_tokens,
             CAST(NTILE(4) OVER (ORDER BY n_tokens DESC, doc_id) AS INT)
               AS band
      FROM q
    )
    SELECT doc_id, n_tokens, band,
           CAST(ROW_NUMBER() OVER (ORDER BY band,
                                   md5(CAST(doc_id AS VARCHAR)), doc_id)
                AS BIGINT) AS curriculum_rank
    FROM banded
    """,
)
def x41_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: quality-band the corpus (4 bands by token
    count as the quality proxy, best first) and emit a deterministic
    training order — banded curriculum with content-addressed shuffling
    inside each band (md5 order, so the 'random' order is reproducible
    on any engine). Fully distributed: the banding is
    operators/sampling.py exact_ntile (range-exchange two-level global
    rank + NTILE arithmetic — bit-identical to SQL NTILE, no
    corpus-sized unpartitioned window), and the final global rank is
    per-band row_number + offsets over the 4 band sizes. The banded
    relation is checkpointed once — it feeds both the in-band ranking
    and the band-size aggregate."""
    from gwasdb_spark.functions import text as TX
    from gwasdb_spark.operators.sampling import exact_ntile
    from pyspark.sql.window import Window as W

    d = table(spark, sf_dir, "documents")
    q = d.select("doc_id", TX.n_tokens_ws(F.col("text")).cast("long").alias("n_tokens"))
    banded = exact_ntile(
        q, 4, [F.desc("n_tokens"), F.asc("doc_id")], tile_col="band"
    ).localCheckpoint(eager=False)
    in_band = W.partitionBy("band").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.asc("doc_id")
    )
    local = banded.withColumn("local_rk", F.row_number().over(in_band))
    sizes = banded.groupBy("band").agg(F.count(F.lit(1)).alias("n_in_band"))
    prior = W.orderBy("band").rowsBetween(W.unboundedPreceding, W.currentRow - 1)
    offsets = sizes.select(
        "band",
        F.coalesce(F.sum("n_in_band").over(prior), F.lit(0)).alias("band_offset"),
    )
    return (
        local.join(F.broadcast(offsets), "band")
        .select(
            "doc_id",
            "n_tokens",
            "band",
            (F.col("band_offset") + F.col("local_rk")).cast("long").alias(
                "curriculum_rank"
            ),
        )
    )


@query(
    "x54_span_dedup",
    "X-dedup,X-quality",
    oracle=rf"""
    WITH {_SQL_TOK},
    spans AS (
      SELECT doc_id, CAST((pos - 1) // 3 AS BIGINT) AS span_id,
             string_agg(token, ' ' ORDER BY pos) AS span_text
      FROM tok GROUP BY 1, 2
    ),
    occ AS (SELECT span_text, COUNT(*) AS n_occ FROM spans GROUP BY 1),
    flagged AS (
      SELECT s.doc_id, s.span_id, s.span_text, o.n_occ <= 1 AS keep
      FROM spans s JOIN occ o USING (span_text)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
             AS n_spans_kept,
           COALESCE(string_agg(CASE WHEN keep THEN span_text END, ' '
                               ORDER BY span_id), '') AS cleaned_text
    FROM flagged GROUP BY doc_id
    """,
)
def x54_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-wide repeated-span removal: cut each document
    into consecutive 3-token spans, drop every span whose exact text
    occurs more than once ACROSS the corpus, re-join the survivors in
    order. The cross-document sibling of x40's within-doc coverage and
    x23's pattern scrub — this one removes shared boilerplate by exact
    corpus-frequency evidence. Occurrence counting shuffles xxhash64
    digests, never span text (operators/quality.py span_dedup)."""
    from gwasdb_spark.operators.quality import span_dedup

    d = table(spark, sf_dir, "documents")
    return span_dedup(d, "doc_id", "text", span_words=3, max_occ=1)


@query(
    "x55_bigram_logprob",
    "X-text,X-quality",
    oracle=rf"""
    WITH {_SQL_TOK},
    bg AS (
      SELECT doc_id, token AS w1,
             LEAD(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
      FROM tok QUALIFY w2 IS NOT NULL
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
    v AS (SELECT CAST(COUNT(DISTINCT token) AS DOUBLE) AS v_size FROM tok)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(LN((c12 + 1.0) / (c1 + v_size))), 9) AS avg_logprob,
           ROUND(MIN(LN((c12 + 1.0) / (c1 + v_size))), 9) AS min_logprob
    FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
    GROUP BY doc_id
    """,
)
def x55_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-filter stand-in, one order up from x30: add-one-smoothed
    bigram log-likelihood per document under the corpus' own 2-gram
    distribution — ln((c(w1,w2)+1) / (c(w1,·)+V)) averaged and min'd per
    doc. Count relations are vocabulary-bounded; V rides as a broadcast
    1-row constant; stop-word skew on the w1 join is AQE-split
    (operators/quality.py bigram_logprob). 9-dp round as in x30: log
    associativity differs across engines at ~1e-15."""
    from gwasdb_spark.operators.quality import bigram_logprob

    d = table(spark, sf_dir, "documents")
    res = bigram_logprob(d, "doc_id", "text")
    return res.select(
        "doc_id",
        "n_bigrams",
        F.round("avg_logprob", 9).alias("avg_logprob"),
        F.round("min_logprob", 9).alias("min_logprob"),
    )


@query(
    "x59_quality_classifier",
    "X-text,X-quality",
    oracle=r"""
    WITH feats AS (
      SELECT doc_id, source,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
             CAST(len(regexp_extract_all(lower(text),
                  '\b(the|and|of|to|a|in|is|that)\b')) AS DOUBLE) AS n_sw,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
               AS DOUBLE) AS n_punct
      FROM documents
    ),
    z AS (
      SELECT doc_id, source,
             -2.4 + 0.35 * LN(1.0 + n_chars)
                  + 6.0 * (CASE WHEN n_tok > 0 THEN n_sw / n_tok
                                ELSE 0.0 END)
                  - 8.0 * (CASE WHEN n_chars > 0 THEN n_punct / n_chars
                                ELSE 0.0 END) AS z
      FROM feats
    )
    SELECT doc_id, source,
           ROUND(1.0 / (1.0 + EXP(-z)), 9) AS quality_prob,
           (1.0 / (1.0 + EXP(-z))) >= 0.5 AS keep
    FROM z
    """,
)
def x59_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality gate — the classifier stage (fasttext-style)
    of a pre-training pipeline as a fixed logistic model over length,
    stopword density, and punctuation features. Entirely a scan-side
    codegen projection: zero shuffles, and swapping in trained weights
    changes literals, not the plan
    (functions/text.py quality_classifier_prob)."""
    from gwasdb_spark.functions.text import quality_classifier_prob

    d = table(spark, sf_dir, "documents")
    p = quality_classifier_prob(F.col("text"))
    return d.select(
        "doc_id",
        "source",
        F.round(p, 9).alias("quality_prob"),
        (p >= 0.5).alias("keep"),
    )


@query(
    "c04_corpus_refinery",
    "X-dedup,X-quality,X-composite",
    oracle=rf"""
    WITH {_SQL_TOK},
    spans AS (
      SELECT doc_id, CAST((pos - 1) // 3 AS BIGINT) AS span_id,
             string_agg(token, ' ' ORDER BY pos) AS span_text
      FROM tok GROUP BY 1, 2
    ),
    occ AS (SELECT span_text, COUNT(*) AS n_occ FROM spans GROUP BY 1),
    cleaned AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(CASE WHEN o.n_occ <= 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_spans_kept,
             COALESCE(string_agg(CASE WHEN o.n_occ <= 1 THEN s.span_text END,
                                 ' ' ORDER BY s.span_id), '') AS ct
      FROM spans s JOIN occ o USING (span_text) GROUP BY doc_id
    ),
    feats AS (
      SELECT doc_id, n_spans, n_spans_kept,
             CAST(length(ct) AS DOUBLE) AS n_chars,
             CAST(len(regexp_extract_all(ct, '\S+')) AS DOUBLE) AS n_tok,
             CAST(len(regexp_extract_all(lower(ct),
                  '\b(the|and|of|to|a|in|is|that)\b')) AS DOUBLE) AS n_sw,
             CAST(len(regexp_extract_all(ct, '[^A-Za-z0-9\s]'))
               AS DOUBLE) AS n_punct
      FROM cleaned
    ),
    scored AS (
      SELECT doc_id, n_spans, n_spans_kept, CAST(n_tok AS BIGINT) AS n_tokens,
             1.0 / (1.0 + EXP(-(-2.4 + 0.35 * LN(1.0 + n_chars)
                  + 6.0 * (CASE WHEN n_tok > 0 THEN n_sw / n_tok
                                ELSE 0.0 END)
                  - 8.0 * (CASE WHEN n_chars > 0 THEN n_punct / n_chars
                                ELSE 0.0 END)))) AS p
      FROM feats
    )
    SELECT s.doc_id, d.lang, d.source, s.n_spans, s.n_spans_kept,
           s.n_tokens, ROUND(s.p, 9) AS quality_prob
    FROM scored s JOIN documents d USING (doc_id)
    WHERE s.p >= 0.4
    """,
)
def c04_corpus_refinery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus refinery over the ROUND-4 stages: corpus-wide
    span dedup strips shared boilerplate (x54), then the logistic quality
    classifier re-scores the CLEANED text (x59's model — scoring after
    boilerplate removal is the order production pipelines use, since
    boilerplate inflates length and deflates stopword density), gating at
    p ≥ 0.4. One composed plan: the span pipeline's digest shuffles, a
    scan-side classifier projection, and one broadcast-sized join back to
    the doc dims — cleaned text shuffles once (the reassembly), never
    again."""
    from gwasdb_spark.functions.text import (
        n_tokens_ws,
        quality_classifier_prob,
    )
    from gwasdb_spark.operators.quality import span_dedup

    d = table(spark, sf_dir, "documents")
    cleaned = span_dedup(d, "doc_id", "text", span_words=3, max_occ=1)
    p = quality_classifier_prob(F.col("cleaned_text"))
    return (
        cleaned.withColumn("quality_prob", F.round(p, 9))
        .withColumn("n_tokens", n_tokens_ws(F.col("cleaned_text")))
        .filter(p >= 0.4)
        .join(d.select("doc_id", "lang", "source"), "doc_id")
        .select(
            "doc_id",
            "lang",
            "source",
            "n_spans",
            "n_spans_kept",
            "n_tokens",
            "quality_prob",
        )
    )


@query(
    "x68_keyword_tfidf",
    "X-text,X-search",
    oracle=rf"""
    WITH {_SQL_TOK},
    tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2
    ),
    df AS (
      SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df_t
      FROM tok GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM tok),
    scored AS (
      SELECT doc_id, token, tf,
             tf * LN(n_docs / df_t) AS tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tf * LN(n_docs / df_t) DESC,
                                         token) AS rk
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, ROUND(tfidf, 9) AS tfidf,
           CAST(rk AS BIGINT) AS rank
    FROM scored WHERE rk <= 3
    """,
)
def x68_keyword_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keyword extraction: the top-3 tf·idf terms of every
    document — the corpus-exploration op behind tag clouds, topic
    labeling, and near-dup triage (x21 answers "what is the corpus
    about", this answers "what is THIS doc about"). Postings and df are
    the same two partial-agg'd shuffles the BM25 family pays; scoring
    constants ride as a broadcast 1-row aggregate; the rank window
    partitions by document (no global sort)."""
    from pyspark.sql.window import Window

    from gwasdb_spark.operators.quality import positional_tokens

    d = table(spark, sf_dir, "documents")
    toks = positional_tokens(d, "doc_id", "text")
    tf = toks.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )
    dfr = toks.groupBy("token").agg(
        F.count_distinct("doc_id").cast("long").alias("df_t")
    )
    n = toks.agg(F.count_distinct("doc_id").cast("double").alias("n_docs"))
    tfidf = F.col("tf") * F.log(F.col("n_docs") / F.col("df_t"))
    w = Window.partitionBy("doc_id").orderBy(F.desc(tfidf), F.asc("token"))
    return (
        tf.join(dfr, "token")
        .crossJoin(F.broadcast(n))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tf", F.round(tfidf, 9).alias("tfidf"), "rank")
    )


@query(
    "x71_cooccurrence_counts",
    "X-text",
    oracle=rf"""
    WITH {_SQL_TOK},
    pairs AS (
      SELECT LEAST(a.token, b.token) AS w1,
             GREATEST(a.token, b.token) AS w2
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id
       AND b.pos > a.pos AND b.pos <= a.pos + 3
       AND a.token != b.token
    )
    SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_cooc
    FROM pairs GROUP BY 1, 2
    ORDER BY n_cooc DESC, w1, w2 LIMIT 20
    """,
)
def x71_cooccurrence_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed co-occurrence counts — the GloVe/word2vec context-matrix
    builder: unordered term pairs within a ±3-token window, top-20 by
    count (x51's PMI is the adjacent-bigram special case). No join at
    all: three lead() columns over one per-doc window enumerate each
    position's ≤3 successors (window × tokens rows, never per-doc
    tokens²); counts shuffle (term, term) pairs, vocabulary²-bounded;
    the head is a bounded TakeOrdered. The oracle states the same pair
    set as the positional band self-join DuckDB plans well at test
    scale."""
    from pyspark.sql.window import Window

    from gwasdb_spark.operators.quality import positional_tokens

    d = table(spark, sf_dir, "documents")
    toks = positional_tokens(d, "doc_id", "text")
    w = Window.partitionBy("doc_id").orderBy("pos")
    led = toks.select(
        F.col("token").alias("ta"),
        F.array(
            F.lead("token", 1).over(w),
            F.lead("token", 2).over(w),
            F.lead("token", 3).over(w),
        ).alias("succ"),
    )
    pairs = (
        led.select("ta", F.explode("succ").alias("tb"))
        .filter(F.col("tb").isNotNull() & (F.col("ta") != F.col("tb")))
        .select(
            F.least("ta", "tb").alias("w1"), F.greatest("ta", "tb").alias("w2")
        )
    )
    return (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("n_cooc"))
        .orderBy(F.desc("n_cooc"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


@query(
    "x100_perplexity_buckets",
    "X-quality,X-sample",
    oracle=rf"""
    WITH {_SQL_TOK},
    counts AS (SELECT token, COUNT(*) AS n_occ FROM tok GROUP BY 1),
    tot AS (SELECT CAST(SUM(n_occ) AS DOUBLE) AS n_total FROM counts),
    scored AS (
      SELECT doc_id,
             ROUND(AVG(LN(CAST(n_occ AS DOUBLE) / n_total)), 9) AS avg_logprob
      FROM tok JOIN counts USING (token) CROSS JOIN tot
      GROUP BY doc_id
    ),
    cuts AS (
      SELECT quantile_cont(avg_logprob, 0.3333333333333333) AS c_tail,
             quantile_cont(avg_logprob, 0.6666666666666666) AS c_mid
      FROM scored
    )
    SELECT doc_id, avg_logprob,
           CASE WHEN avg_logprob >= c_mid THEN 'head'
                WHEN avg_logprob >= c_tail THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored CROSS JOIN cuts
    """,
)
def x100_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity binning: split the corpus into
    head/middle/tail terciles by LM score (here x30's corpus-unigram
    avg log-probability; head = most fluent) — the quality
    stratification CCNet uses to keep head+middle and drop (or
    down-sample) tail before training. Terciles are computed over the
    9-dp ROUNDED score so both engines cut on bit-identical inputs (an
    unrounded boundary could flip a doc whose score differs at 1e-15
    across engines); the two cut points ride as a broadcast 1-row
    constant into the scan-side CASE — percentile's sort-by-value is
    the only piece that grows at scale (swap approx_percentile, same
    plan shape, per x76)."""
    from gwasdb_spark.operators.quality import unigram_logprob

    d = table(spark, sf_dir, "documents")
    scored = (
        unigram_logprob(d, "doc_id", "text")
        .select("doc_id", F.round("avg_logprob", 9).alias("avg_logprob"))
        # two consumers (the cuts aggregate and the final projection) of
        # an expensive doc-grain relation — pin it once or the whole
        # tokenize+LM pipeline replans per consumer (measured 6 corpus
        # scans in the executed plan without this)
        .localCheckpoint(eager=False)
    )
    cuts = scored.agg(
        F.expr("percentile(avg_logprob, 0.3333333333333333)").alias("c_tail"),
        F.expr("percentile(avg_logprob, 0.6666666666666666)").alias("c_mid"),
    )
    bucket = (
        F.when(F.col("avg_logprob") >= F.col("c_mid"), F.lit("head"))
        .when(F.col("avg_logprob") >= F.col("c_tail"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.crossJoin(F.broadcast(cuts))
        .select("doc_id", "avg_logprob", bucket.alias("bucket"))
    )


@query(
    "x104_filter_funnel",
    "X-text,X-quality,X-qa",
    oracle=r"""
    WITH feats AS (
      SELECT lang,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tok,
             CAST(len(regexp_extract_all(lower(text),
                  '\b(the|and|of|to|a|in|is|that)\b')) AS DOUBLE) AS n_sw,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
               AS DOUBLE) AS n_punct
      FROM documents
    ),
    g AS (
      SELECT (n_chars BETWEEN 100 AND 20000) AS g1,
             n_tok >= 30 AS g2,
             1.0 / (1.0 + EXP(-(
               -2.4 + 0.35 * LN(1.0 + CAST(n_chars AS DOUBLE))
                    + 6.0 * (CASE WHEN n_tok > 0 THEN n_sw / n_tok
                                  ELSE 0.0 END)
                    - 8.0 * (CASE WHEN n_chars > 0
                                  THEN n_punct / CAST(n_chars AS DOUBLE)
                                  ELSE 0.0 END)))) >= 0.4 AS g3,
             lang = 'en' AS g4
      FROM feats
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS s0,
             CAST(COALESCE(SUM(CASE WHEN g1 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS s1,
             CAST(COALESCE(SUM(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS s2,
             CAST(COALESCE(SUM(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END),
               0) AS BIGINT) AS s3,
             CAST(COALESCE(
               SUM(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END), 0)
               AS BIGINT) AS s4
      FROM g
    ),
    funnel AS (
      SELECT CAST(1 AS BIGINT) AS stage, 'len_100_20000' AS gate,
             s0 AS n_entered, s1 AS n_survived, s0 AS total FROM s
      UNION ALL SELECT 2, 'min_30_tokens', s1, s2, s0 FROM s
      UNION ALL SELECT 3, 'classifier_p40', s2, s3, s0 FROM s
      UNION ALL SELECT 4, 'lang_en', s3, s4, s0 FROM s
    )
    SELECT stage, gate, n_entered,
           n_entered - n_survived AS n_failed, n_survived,
           ROUND(CASE WHEN n_entered > 0
                      THEN CAST(n_entered - n_survived AS DOUBLE)
                           / CAST(n_entered AS DOUBLE)
                      ELSE 0.0 END, 6) AS marginal_fail_rate,
           ROUND(CASE WHEN total > 0
                      THEN CAST(n_survived AS DOUBLE) / CAST(total AS DOUBLE)
                      ELSE 0.0 END, 6) AS cumulative_survival
    FROM funnel
    """,
)
def x104_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline-yield funnel: per-gate marginal and cumulative document
    survival through the fixed c01/c04-style gate sequence (length →
    token count → quality classifier → language) — the yield table every
    published corpus reports, and the first diff to read when a pipeline
    change silently shifts output volume. One text-column pass: gate
    booleans fold into the scan projection, one 1-row aggregate computes
    the conjunction-prefix survivor counts, stack() expands the 4-row
    report (operators/quality.py filter_funnel)."""
    from gwasdb_spark.operators.quality import filter_funnel

    d = table(spark, sf_dir, "documents")
    return filter_funnel(d, "text", "lang")


@query(
    "x106_score_quantile_normalize",
    "X-text,X-quality",
    oracle=r"""
    WITH feats AS (
      SELECT doc_id, source,
             CAST(length(text) AS DOUBLE) AS n_chars,
             CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) AS n_tok,
             CAST(len(regexp_extract_all(lower(text),
                  '\b(the|and|of|to|a|in|is|that)\b')) AS DOUBLE) AS n_sw,
             CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]'))
               AS DOUBLE) AS n_punct
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             ROUND(1.0 / (1.0 + EXP(-(
               -2.4 + 0.35 * LN(1.0 + n_chars)
                    + 6.0 * (CASE WHEN n_tok > 0 THEN n_sw / n_tok
                                  ELSE 0.0 END)
                    - 8.0 * (CASE WHEN n_chars > 0 THEN n_punct / n_chars
                                  ELSE 0.0 END)))), 9) AS quality_prob
      FROM feats
    ),
    ranked AS (
      SELECT doc_id, source, quality_prob,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY quality_prob, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM scored
    )
    SELECT doc_id, source, quality_prob,
           ROUND(CASE WHEN n > 1
                      THEN CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                      ELSE 0.0 END, 9) AS pct_rank
    FROM ranked
    """,
)
def x106_score_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quantile normalization of the quality score — the
    calibration step before mixing sources: raw classifier scores are
    not comparable across domains (code scores differently from prose),
    so each source's docs are mapped to their within-source quantile
    [0, 1] and the MIX gates on the quantile, not the raw score
    (DoReMi/DSIR-adjacent practice). Ranking key is the 9-dp-ROUNDED
    score + doc id, so both engines order identically even where ln/exp
    differ at 1 ulp; a single-doc source normalizes to 0. One window
    partitioned by source (parallel across sources, no global sort) over
    a scan-side scored projection."""
    from pyspark.sql.window import Window

    from gwasdb_spark.functions.text import quality_classifier_prob

    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.round(quality_classifier_prob(F.col("text")), 9).alias("quality_prob"),
    )
    w = Window.partitionBy("source").orderBy("quality_prob", "doc_id")
    wn = Window.partitionBy("source")
    return scored.select(
        "doc_id",
        "source",
        "quality_prob",
        F.round(
            F.when(
                F.count(F.lit(1)).over(wn) > 1,
                (F.row_number().over(w) - 1).cast("double")
                / (F.count(F.lit(1)).over(wn) - 1).cast("double"),
            ).otherwise(0.0),
            9,
        ).alias("pct_rank"),
    )


# ---------------------------------------------------------------------------
# c05: end-to-end takedown pipeline (GDPR / right-to-be-forgotten composite)
# ---------------------------------------------------------------------------
def _c05_stage(sf_dir: str) -> str:
    import hashlib as _hl

    from gwasdb_spark.plans.helpers import stage_dir
    from gwasdb_spark.plans.mining_ops import _corpus_fingerprint

    return stage_dir(
        "c05_takedown_"
        + _hl.md5(sf_dir.encode()).hexdigest()[:12]
        + "_" + _corpus_fingerprint(sf_dir)
    )


def c05_reset_stage(sf_dir: str) -> None:
    """Drop c05's staged stores (bench resets outside the timed span —
    the m03..m07 discipline)."""
    import shutil as _sh

    _sh.rmtree(_c05_stage(sf_dir), ignore_errors=True)


@query(
    "c05_takedown_pipeline",
    "C-composite,X-dml,X-serve",
    oracle=r"""
    WITH ntok AS (
      SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS nw
      FROM documents
    ),
    toks AS (
      SELECT doc_id AS doc,
             unnest(string_split_regex(lower(trim(text)), '[^a-z0-9]+'))
               AS term
      FROM documents
    ),
    postings0 AS (
      SELECT doc, term FROM toks WHERE term <> '' GROUP BY 1, 2
    ),
    audit AS (
      SELECT 'acid_rows' AS store, 0 AS victim_hits,
             (SELECT COUNT(*) FROM documents WHERE doc_id % 13 <> 5)
               AS survivor_units
      UNION ALL
      SELECT 'ann_cells', 0,
             (SELECT COUNT(*) FROM embeddings WHERE vec_id % 13 <> 5)
      UNION ALL
      SELECT 'ann_serve', 0,
             LEAST(3, (SELECT COUNT(*) FROM embeddings
                       WHERE vec_id % 13 = 5))
             * LEAST(10, (SELECT COUNT(*) FROM embeddings
                          WHERE vec_id % 13 <> 5))
      UNION ALL
      SELECT 'bm25_postings', 0,
             (SELECT COUNT(DISTINCT doc) FROM postings0 WHERE doc % 13 <> 5)
      UNION ALL
      SELECT 'bm25_serve', 0,
             LEAST(10, (SELECT COUNT(DISTINCT doc) FROM postings0
                        WHERE doc % 13 <> 5
                          AND term IN ('hash', 'join', 'vector')))
      UNION ALL
      SELECT 'minhash_bands', 0,
             (SELECT COUNT(*) FROM ntok WHERE doc_id % 13 <> 5 AND nw >= 3)
      UNION ALL
      SELECT 'neardup_serve', 0,
             8 * (SELECT COUNT(*) FROM ntok
                  WHERE doc_id % 13 = 6 AND nw >= 3)
    )
    SELECT store, CAST(victim_hits AS BIGINT) AS victim_hits,
           CAST(survivor_units AS BIGINT) AS survivor_units
    FROM audit ORDER BY store
    """,
)
def c05_takedown_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end takedown across EVERY maintained store in one audited
    plan — the GDPR / right-to-be-forgotten operation a real corpus
    operator runs (r11 verdict #2; reference analog: the QC tombstone
    flow, R/wrangle_data.Rmd:376-381 `no_gwas_result`). One victim list
    (doc_id % 13 = 5, and the matching vec_ids on the embeddings side)
    is deleted from all four persisted stores the engine maintains:

      1. corpus rows   — AcidTable bloom-pruned DELETE (m06 machinery)
      2. BM25 postings — tombstone + compaction (x163 machinery)
      3. ANN cells     — manifest-targeted partition rewrite (x157)
      4. minhash bands — band-store anti-join compaction (x172)

    and then SEVEN audit aggregates run in one returned plan: per-store
    victim row counts (the oracle pins all of them to literal 0 — any
    store that leaks a victim row breaks the hash) plus three
    serve-path leakage probes: BM25 top-10 over fixed terms, an
    exhaustive ANN compliance scan that queries WITH the victims' own
    vectors (the adversarial probe — a deleted person's embedding must
    not retrieve their own row; deliberately all-cells, a scheduled
    O(index) compliance scan, not the nprobe serve path), and a minhash
    self-match probe (victims' bands must match nothing; a control set
    of surviving docs must self-match exactly bands-per-doc, proving
    the probe machinery is live, not vacuously empty). survivor_units
    pin the surviving populations so a store that over-deletes fails
    the same hash. Warm-idempotent: AcidTable ops are version-gated,
    index deletes are replay-no-ops, band compaction is build-once.

    At 100 TB each deletion is the touched-only maintenance op its
    family already proved (bloom-pruned groups / tombstone append /
    manifest-targeted cells / victim-holding band buckets); the audits
    are one pass per store with map-side conditional sums — no joins,
    no shuffles beyond each store's own scan."""
    import os

    from pyspark.sql.window import Window

    from gwasdb_spark.acid import AcidTable
    from gwasdb_spark.acid import predicates as P
    from gwasdb_spark.functions.vectors import cosine
    from gwasdb_spark.operators import dedup as DD
    from gwasdb_spark.operators.ann_index import (
        build_cell_index,
        delete_from_cell_index,
        read_cell_index,
    )
    from gwasdb_spark.operators.search import (
        bm25_topk_indexed,
        build_text_index,
        compact_text_index,
        delete_from_text_index,
    )

    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    vic = lambda c: (c % 13) == 5  # noqa: E731 — the victim predicate
    victims = d.filter(vic(F.col("doc_id"))).select("doc_id")
    # the takedown batch is a bounded driver list by contract (same as
    # x157's absorb path) — O(victims), never O(corpus)
    victim_ids = sorted(r["doc_id"] for r in victims.collect())

    base = _c05_stage(sf_dir)

    # The four store deletions are INDEPENDENT (disjoint on-disk
    # stores); submitted sequentially, each one's job tail left the
    # cluster idle. Run them from a driver thread pool (guide §2.6 —
    # the x173 discipline). Thread safety: no pooled op mutates session
    # conf — dynamic partition overwrite is a per-writer option since
    # r14 (ADVICE r13), so there is no cross-thread conf coupling to
    # audit. The audit plan below is built from the joined results and
    # is unchanged.

    # -- store 1: corpus rows in the ACID table (bloom on the id) -----
    def store_acid():
        acid_path = os.path.join(base, "acid")
        t = AcidTable(spark, acid_path)
        if t.latest_version() < 0:
            t = AcidTable.create(
                spark, acid_path, d.filter(F.col("doc_id") % 3 == 0),
                bloom_cols=["doc_id"],
            )
        if t.latest_version() == 0:
            t.append(d.filter(F.col("doc_id") % 3 == 1))
        if t.latest_version() == 1:
            t.append(d.filter(F.col("doc_id") % 3 == 2))
        if t.latest_version() == 2:
            t.delete_where(P.IsIn("doc_id", victim_ids))
        return t.read()

    # -- store 2: BM25 inverted index (tombstone, then physical) ------
    idx = os.path.join(base, "bm25")

    def store_bm25():
        if not os.path.isdir(os.path.join(idx, "consts")):
            build_text_index(d, idx)
        delete_from_text_index(victims, idx)  # replay-no-op when compacted
        compact_text_index(spark, idx)
        return (
            spark.read.parquet(os.path.join(idx, "postings")),
            spark.read.parquet(os.path.join(idx, "doclen")),
        )

    # -- store 3: ANN cell index ---------------------------------------
    def store_ann():
        annb = os.path.join(base, "ann")
        if not os.path.isdir(os.path.join(annb, "index")):
            build_cell_index(e.select("vec_id", "embedding"), annb)
        delete_from_cell_index(
            spark, annb, e.filter(vic(F.col("vec_id"))).select("vec_id")
        )
        return (
            read_cell_index(spark, annb),
            spark.read.parquet(os.path.join(annb, "manifest")),
        )

    # -- store 4: minhash band store (compaction folds victims out) ---
    def store_bands():
        bands_full = os.path.join(base, "bands_full")
        bands_live = os.path.join(base, "bands_live")
        if not os.path.isdir(bands_full):
            DD.minhash_bands(d, "doc_id", "text").write.parquet(bands_full)
        if not os.path.isdir(bands_live):
            spark.read.parquet(bands_full).join(
                F.broadcast(victims.select(F.col("doc_id").alias("doc"))),
                "doc", "left_anti",
            ).write.parquet(bands_live)
        return spark.read.parquet(bands_live)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        f_acid = pool.submit(store_acid)
        f_bm25 = pool.submit(store_bm25)
        f_ann = pool.submit(store_ann)
        f_bands = pool.submit(store_bands)
        acid_df = f_acid.result()
        postings, doclen = f_bm25.result()
        ann_index, ann_manifest = f_ann.result()
        band_store = f_bands.result()

    # -- audits: one conditional-sum pass per store --------------------
    def _vic_sum(c):
        return (
            F.coalesce(F.sum(F.when(vic(c), 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias("victim_hits")
        )

    def _row(label, agg_df):
        return agg_df.select(
            F.lit(label).alias("store"), "victim_hits", "survivor_units"
        )

    rows = [
        _row("acid_rows", acid_df.agg(
            _vic_sum(F.col("doc_id")),
            F.count(F.lit(1)).cast("long").alias("survivor_units"),
        )),
        _row("bm25_postings", postings.select("doc")
             .unionByName(doclen.select("doc"))
             .agg(_vic_sum(F.col("doc")))
             .crossJoin(doclen.agg(
                 F.count_distinct("doc").cast("long")
                 .alias("survivor_units")))),
        _row("ann_cells", ann_index.select("vec_id")
             .unionByName(ann_manifest.select("vec_id"))
             .agg(_vic_sum(F.col("vec_id")))
             .crossJoin(ann_index.agg(
                 F.count(F.lit(1)).cast("long").alias("survivor_units")))),
        _row("minhash_bands", band_store.agg(
            _vic_sum(F.col("doc")),
            F.count_distinct("doc").cast("long").alias("survivor_units"),
        )),
    ]

    # serve probe 1: BM25 top-10 must contain no victim
    serve = bm25_topk_indexed(
        spark, idx, ["hash", "join", "vector"], "doc_id", k=10
    )
    rows.append(_row("bm25_serve", serve.agg(
        _vic_sum(F.col("doc_id")),
        F.count(F.lit(1)).cast("long").alias("survivor_units"),
    )))

    # serve probe 2: exhaustive ANN compliance scan with the victims'
    # own vectors as queries — deleted embeddings must not surface
    qv = (
        e.filter(vic(F.col("vec_id")))
        .orderBy("vec_id")
        .limit(3)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qv"))
    )
    scored = ann_index.crossJoin(F.broadcast(qv)).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qv"), F.col("embedding")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    topk = scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 10
    )
    rows.append(_row("ann_serve", topk.agg(
        _vic_sum(F.col("neighbor_id")),
        F.count(F.lit(1)).cast("long").alias("survivor_units"),
    )))

    # serve probe 3: minhash self-match — victims' bands hit nothing,
    # surviving control docs (doc_id % 13 = 6) self-match exactly once
    # per band, proving the probe join is live
    probe_docs = d.filter(
        vic(F.col("doc_id")) | (F.col("doc_id") % 13 == 6)
    )
    pb = DD.minhash_bands(probe_docs, "doc_id", "text").select(
        F.col("doc").alias("p_doc"), "band_idx", "band_key"
    )
    joined = pb.join(band_store, ["band_idx", "band_key"])
    rows.append(_row("neardup_serve", joined.agg(
        _vic_sum(F.col("doc")),
        F.coalesce(
            F.sum(F.when(F.col("doc") == F.col("p_doc"), 1).otherwise(0)),
            F.lit(0),
        ).cast("long").alias("survivor_units"),
    )))

    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("store")
