"""Corpus-vocabulary operators: term statistics, per-doc salient terms,
pattern scrubbing, per-group reservoir sampling.

These are the corpus-analysis primitives between lang-id/quality scoring
(functions/text.py) and dataset assembly (operators/sampling.py): build
the token vocabulary, surface each document's distinguishing terms, strip
boilerplate/PII-shaped patterns, and draw reproducible per-group samples.

Scale notes (the 100 TB contract):
- Tokenize-and-explode shuffles (token, doc) pairs, never full documents;
  term frequency (`groupBy(doc, token).count()`) and document frequency
  (`groupBy(token).count()`) both benefit from map-side partial
  aggregation, which absorbs stop-word skew before the shuffle.
- The tf⋈df join keys on `token`. Document frequency for hot tokens is
  huge but the DF SIDE is one row per token, so the join skew lives
  entirely in the tf side's key distribution — AQE's skew-join splitting
  handles it (the df row replicates to each split). No broadcast hint:
  vocabulary size grows with corpus scale (long tail of rare tokens) and
  must not be forced driver-side.
- Per-doc top-k is a `Window.partitionBy(doc)` row_number — parallel per
  document, bounded output (k rows/doc).
- `reservoir_per_group` orders by md5(id) inside each group partition: a
  deterministic, engine-portable "random" order (same trick as
  sampling.split_label), so the sample is reproducible across runs and
  engines, and re-drawing after corpus growth only swaps rows whose hash
  rank crossed the k boundary. Skewed groups cost one window scan of the
  group — no global sort.
- `scrub_patterns` is a pure projection (regexp_replace chain) — runs in
  the scan stage, whole-stage codegen, embarrassingly parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "explode_tokens",
    "term_doc_freq",
    "top_terms_per_doc",
    "vocabulary",
    "scrub_patterns",
    "reservoir_per_group",
]


def explode_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per whitespace token occurrence: (id, token).

    Same tokenizer as the dedup shinglers (`split(trim(text), '\\s+')`)
    so vocab statistics and shingle statistics agree on word boundaries.
    """
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")


def term_doc_freq(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, token, tf, df): per-document term frequency joined with
    corpus document frequency.

    Two partial-aggregated shuffles (by (id, token), then by token) and
    one token-keyed join; see module scale notes for the skew story.
    """
    toks = explode_tokens(df, id_col, text_col)
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    return tf.join(dfreq, "token")


def top_terms_per_doc(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Each document's k most salient terms: highest tf, rarest (lowest
    df) on ties, lexicographic token as the final tiebreak.

    The ordering is integer-only — no tf·log(N/df) floats — so the rank
    is bit-identical across engines while preserving the tf-idf
    intuition (frequent-in-doc, rare-in-corpus). Output: (id, token,
    tf, df, term_rank), k rows per document.
    """
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        term_doc_freq(df, id_col, text_col)
        .withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "token", "tf", "df", "term_rank")
    )


def vocabulary(
    df: DataFrame, id_col: str, text_col: str, top_n: int = 100
) -> DataFrame:
    """Corpus vocabulary head: top_n tokens by total occurrences with
    document frequency and dense rank. Output: (token, n_occurrences,
    n_docs, vocab_rank), ordered by rank.

    The global top-n is a TakeOrdered (per-partition top-n, merge at the
    driver) over the already-aggregated token table — no global sort of
    the vocabulary.
    """
    toks = explode_tokens(df, id_col, text_col)
    stats = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct(F.col(id_col)).alias("n_docs"),
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    # row_number over an un-partitioned window would serialize the full
    # vocabulary through one task; instead take the head FIRST (TakeOrdered,
    # parallel) and rank only the surviving top_n rows.
    head = stats.orderBy(F.desc("n_occurrences"), F.asc("token")).limit(top_n)
    return head.withColumn("vocab_rank", F.row_number().over(w))


def scrub_patterns(
    df: DataFrame,
    text_col: str,
    patterns: list[tuple[str, str]],
    out_col: str = "clean_text",
) -> DataFrame:
    """Redact/scrub regex patterns from a text column.

    ``patterns`` is a list of (regex, replacement) applied in order; the
    result is whitespace-normalized (collapse runs, trim). Adds:
    - ``out_col``: the scrubbed text;
    - ``n_scrubbed``: total match count across all patterns (counted on
      the ORIGINAL text, so later patterns can't hide earlier matches).

    Use '' as the replacement for removal (boilerplate/stop-phrase
    strip) or a tag like '<EMAIL>' for PII-style redaction. Patterns
    must stay in the RE2-compatible subset (no backreferences /
    lookaround) to keep Java-regex and DuckDB-oracle semantics aligned.
    Pure projection — codegen'd in the scan stage.
    """
    clean: Column = F.col(text_col)
    n_hits: Column = F.lit(0).cast("bigint")
    for pat, repl in patterns:
        n_hits = n_hits + F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
        clean = F.regexp_replace(clean, pat, repl)
    clean = F.trim(F.regexp_replace(clean, r"\s+", " "))
    return df.withColumn(out_col, clean).withColumn("n_scrubbed", n_hits)


def reservoir_per_group(
    df: DataFrame, group_col: str, id_col: str, k: int
) -> DataFrame:
    """Deterministic k-row sample per group.

    Rows are ranked inside each group by md5 of the id (an
    engine-portable pseudo-random order — no rand() seed drift between
    engines or between runs with different partitioning) with the raw id
    as tiebreak; the first k survive. Adds ``sample_rank`` (1..k).
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", top_n: int = 20
) -> DataFrame:
    """First BPE merge round: corpus-wide adjacent character-pair counts,
    top-N by frequency — the inner loop of byte-pair-encoding tokenizer
    training, expressed as the classic trainer optimization: aggregate
    the corpus to (DISTINCT word, freq) FIRST, then enumerate each
    distinct word's pairs once and weight by freq. Pair enumeration cost
    scales with vocabulary (sub-linear in corpus), not token count; the
    pair aggregate shuffles 2-char keys. A full trainer iterates this
    with a merge-apply step per round."""
    tok = df.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    words = (
        tok.filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.select(
        F.explode(F.expr("sequence(1, length(word) - 1)")).alias("i"),
        F.col("word"),
        F.col("freq"),
    ).select(F.expr("substring(word, i, 2)").alias("pair"), "freq")
    agg = pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("n_occ"))
    w = Window.orderBy(F.desc("n_occ"), F.asc("pair"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select("pair", "n_occ", "rank")
    )
