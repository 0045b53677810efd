"""Corpus-quality operators: repetition signals, vocabulary capping,
length histograms.

The repetition family implements the classic pre-training corpus gates
(duplicate-token / duplicate-bigram / top-token fractions — the signals
behind "Gopher rules"-style repetition filters) as pure DataFrame plans;
`cap_vocabulary` rewrites the long tail of the token distribution to an
`<unk>` sentinel — the corpus-side half of a fixed-vocabulary tokenizer
prep. Complements functions/text.py (per-doc scalar stats) and
operators/vocab.py (corpus vocabulary); reference analogue: the QC
flag/filter columns of the marker pipeline (R/wrangle_data.Rmd:96-118)
applied to text.

Scale notes (the 100 TB contract):
- All statistics shuffle (doc, token) pairs or per-doc rows — never full
  document text. Fractions divide exact integer counts once at the end,
  so oracle hash parity holds regardless of partitioning.
- Bigram stats come from a `lead()` window PARTITIONED BY doc — parallel
  per document, no cross-doc state; duplicate-token stats are two
  partial-aggregated shuffles (by (doc, token), then by doc).
- `cap_vocabulary`'s kept-set is a TakeOrderedAndProject head (parallel
  per-partition top-n, bounded by `max_vocab`) broadcast to the token
  stream — the full vocabulary (unbounded at scale: the rare-token tail
  grows with the corpus) is never collected, sorted globally, or
  window-ranked. Document reassembly groups by doc with an array_sort
  over (pos, token) structs — per-doc memory is one document's tokens,
  the same bound any reader of the row already pays.
- ANSI mode: every fraction is `when(denominator > 0)`-guarded; docs
  with no tokens produce no explode rows and drop out of all outputs
  (same as the SQL oracle's unnest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "positional_tokens",
    "repetition_signals",
    "cap_vocabulary",
    "unigram_logprob",
    "pii_scrub",
    "span_dedup",
    "exact_substring_spans",
    "bigram_logprob",
]

UNK = "<unk>"


def positional_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, pos, token) whitespace tokens with split-array positions —
    the positional twin of vocab.explode_tokens (same word boundaries)."""
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "token"
        ),
    ).filter(F.col("token") != "")


def repetition_signals(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_token_frac: float = 0.6,
    max_top_token_frac: float = 0.2,
    max_dup_bigram_frac: float = 0.4,
) -> DataFrame:
    """Per-document repetition diagnostics + a pass/fail gate.

    Columns: n_tokens, n_distinct_tokens, max_tf, dup_token_frac
    (1 − distinct/total), top_token_frac (max tf / total), n_bigrams,
    n_distinct_bigrams, dup_bigram_frac, is_repetitive (true when any
    signal exceeds its threshold). Documents with no tokens are absent
    (nothing to measure).
    """
    toks = positional_tokens(df, id_col, text_col)

    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    token_stats = tf.groupBy(id_col).agg(
        F.sum("tf").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct_tokens"),
        F.max("tf").alias("max_tf"),
    )

    w = Window.partitionBy(id_col).orderBy("pos")
    bigrams = toks.withColumn("next_token", F.lead("token").over(w))
    bigram_stats = bigrams.filter(F.col("next_token").isNotNull()).groupBy(
        id_col
    ).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.countDistinct(
            F.concat_ws(" ", F.col("token"), F.col("next_token"))
        ).alias("n_distinct_bigrams"),
    )

    joined = token_stats.join(bigram_stats, id_col, "left")
    n_tok_d = F.col("n_tokens").cast("double")
    dup_tok = F.when(
        F.col("n_tokens") > 0,
        (F.col("n_tokens") - F.col("n_distinct_tokens")).cast("double") / n_tok_d,
    )
    top_tok = F.when(
        F.col("n_tokens") > 0, F.col("max_tf").cast("double") / n_tok_d
    )
    dup_big = F.when(
        F.col("n_bigrams") > 0,
        (F.col("n_bigrams") - F.col("n_distinct_bigrams")).cast("double")
        / F.col("n_bigrams").cast("double"),
    )
    return joined.select(
        id_col,
        "n_tokens",
        "n_distinct_tokens",
        "max_tf",
        dup_tok.alias("dup_token_frac"),
        top_tok.alias("top_token_frac"),
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.coalesce(F.col("n_distinct_bigrams"), F.lit(0)).alias(
            "n_distinct_bigrams"
        ),
        dup_big.alias("dup_bigram_frac"),
        (
            (dup_tok > F.lit(max_dup_token_frac))
            | (top_tok > F.lit(max_top_token_frac))
            | F.coalesce(dup_big > F.lit(max_dup_bigram_frac), F.lit(False))
        ).alias("is_repetitive"),
    )


def cap_vocabulary(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_vocab: int = 40,
) -> DataFrame:
    """Rewrite each document keeping only the `max_vocab` most frequent
    corpus tokens (ties: lexicographic); every other token becomes
    ``<unk>``.

    Returns (id, n_tokens, n_unk, capped_text). The kept-set is a
    bounded TakeOrdered head (count desc, token asc) broadcast onto the
    token stream; reassembly array_sorts (pos, token) structs per doc —
    field extraction from the sorted struct array stays JVM-side (no
    Python, no per-element lambda)."""
    toks = positional_tokens(df, id_col, text_col)

    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n_occ"))
    kept = (
        counts.orderBy(F.col("n_occ").desc(), F.col("token"))
        .limit(max_vocab)
        .select("token", F.lit(True).alias("__kept"))
    )
    tagged = toks.join(F.broadcast(kept), "token", "left").select(
        F.col(id_col),
        "pos",
        F.when(F.col("__kept").isNotNull(), F.col("token"))
        .otherwise(F.lit(UNK))
        .alias("out_token"),
    )
    sorted_arr = F.array_sort(F.collect_list(F.struct("pos", "out_token")))
    return tagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("out_token") == UNK, 1).otherwise(0)).alias("n_unk"),
        F.array_join(sorted_arr.getField("out_token"), " ").alias("capped_text"),
    )


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus-unigram language-model scoring: each document's mean token
    log-probability under the corpus' own unigram distribution — the
    cheap perplexity proxy used to rank/filter pre-training text (a doc
    of globally-rare tokens scores low; boilerplate scores high).

    Two-pass but ONE job: the token stream is aggregated to corpus
    counts, the corpus total rides along as a 1-row cross join (in-plan
    constant — no `.count()` action on the driver), and the token stream
    joins back to the counts on the token key. Every shuffle carries
    (token) or (doc, token) pairs — never document text. No smoothing
    term: every scored token exists in the corpus by construction."""
    tok = positional_tokens(df, id_col, text_col).select(id_col, "token")
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n_occ"))
    total = counts.agg(F.sum("n_occ").cast("double").alias("n_total"))
    scored = tok.join(counts, "token").crossJoin(total)
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.avg(F.log(F.col("n_occ") / F.col("n_total"))).alias(
                "avg_logprob"
            ),
            F.min(F.log(F.col("n_occ") / F.col("n_total"))).alias(
                "min_logprob"
            ),
        )
    )


# PII patterns, kept in the Java-regex ∩ RE2 common dialect (ASCII \b, no
# lookaround) so the DuckDB oracle matches byte-for-byte.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII redaction pass: replace emails / IPv4s / phone-shaped numbers
    with typed sentinels and count what was removed — the
    release-hygiene rewrite every published corpus runs. Pure codegen
    expressions (regexp_extract_all + chained regexp_replace), zero
    Python in the row path; the three counts make the scrub auditable
    (sum them corpus-wide to report redaction rates)."""
    t = F.col(text_col)
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "[EMAIL]"), PII_IPV4, "[IP]"
        ),
        PII_PHONE,
        "[PHONE]",
    )
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0))).cast("long").alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0))).cast("long").alias("n_ips"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0))).cast("long").alias("n_phones"),
        scrubbed.alias("scrubbed_text"),
    )


def dup_ngram_coverage(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Within-document duplicate n-gram coverage: the fraction of token
    positions lying inside an n-gram that occurs MORE THAN ONCE in the
    same document — the FineWeb/Gopher "dup n-gram char fraction" gate
    that catches templated/boilerplate text plain token-duplication
    misses.

    Shape: positional n-grams per doc (arrays_zip of shifted slices, one
    explode), per-(doc, gram) counts, positions of repeated grams
    exploded to their n covered token indices, distinct-position count
    over exact integers. Every shuffle carries (doc, 8-byte gram hash)
    or (doc, int position) — never text."""
    tok = positional_tokens(df, id_col, text_col).groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "token"))
        ).alias("toks")
    ).select(
        F.col(id_col),
        F.transform("toks", lambda s: s.getField("token")).alias("toks"),
    )
    size = F.size("toks")
    width = F.greatest(size - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice("toks", j + 1, width) for j in range(n)])
    gram = F.xxhash64(
        F.concat_ws(" ", *[F.col("g").getField(str(j)) for j in range(n)])
    )
    grams = (
        tok.select(F.col(id_col), size.alias("n_tokens"), F.posexplode(zipped).alias("gpos", "g"))
        .select(F.col(id_col), "n_tokens", "gpos", gram.alias("gh"))
    )
    dup_positions = (
        grams.withColumn(
            "n_occ", F.count(F.lit(1)).over(Window.partitionBy(id_col, "gh"))
        )
        .filter(F.col("n_occ") > 1)
        .select(
            F.col(id_col),
            "n_tokens",
            F.explode(F.sequence(F.col("gpos"), F.col("gpos") + (n - 1))).alias(
                "tpos"
            ),
        )
        .groupBy(id_col, "n_tokens")
        .agg(F.count_distinct("tpos").alias("n_dup_positions"))
    )
    base = tok.select(F.col(id_col), F.size("toks").cast("long").alias("n_tokens"))
    return (
        base.join(
            dup_positions.select(id_col, "n_dup_positions"), id_col, "left"
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.coalesce(F.col("n_dup_positions"), F.lit(0))
            .cast("long")
            .alias("n_dup_positions"),
        )
        .withColumn(
            "dup_ngram_frac",
            F.when(
                F.col("n_tokens") > 0,
                F.col("n_dup_positions").cast("double")
                / F.col("n_tokens").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 3,
    max_occ: int = 1,
) -> DataFrame:
    """Corpus-wide duplicate-span removal — the CCNet/RefinedWeb
    "drop repeated lines" pass for corpora whose unit of repetition is a
    token span rather than a newline-delimited line. Documents are cut
    into consecutive ``span_words``-token spans; any span whose exact
    text occurs more than ``max_occ`` times ACROSS THE CORPUS is dropped
    from every document, and the survivors are re-joined in order.

    Columns: id, n_spans, n_spans_kept, cleaned_text (empty string when
    every span was boilerplate). Token-less documents are absent, as in
    every tokenizing oracle.

    Scale: the occurrence count groups by (xxhash64(span), span_text) —
    the digest leads the key so partitioning and sort comparisons run on
    8 bytes, but TEXT EQUALITY decides the group: a 64-bit collision
    (statistically expected around the ~4B-span birthday bound, i.e.
    guaranteed at 100 TB) merges nothing and can never drop clean text.
    The keep-flag returns via an equi-join on the same composite key
    (co-partitioned with the count). The marginal shuffle cost over a
    digest-only key is the span text itself (~tens of bytes for a
    3-word span) — spans already travel through the reassembly exchange,
    so the pass stays one order of magnitude below shuffling documents.
    Reassembly is one per-document aggregate whose memory bound is a
    single document — the same bound the reader already pays. The global
    duplicate-span set is never collected or broadcast: at 100 TB the
    hot spans (the whole point of the pass) would overflow any
    broadcast, so both sides stay distributed.
    """
    toks = positional_tokens(df, id_col, text_col)
    spans = (
        toks.withColumn("span_id", F.expr(f"pos div {int(span_words)}"))
        .groupBy(id_col, "span_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "token"))),
                    lambda s: s.token,
                ),
                " ",
            ).alias("span_text")
        )
        .withColumn("span_h", F.xxhash64("span_text"))
    )
    occ = spans.groupBy("span_h", "span_text").agg(
        F.count(F.lit(1)).alias("n_occ")
    )
    flagged = spans.join(occ, ["span_h", "span_text"]).withColumn(
        "keep", F.col("n_occ") <= F.lit(int(max_occ))
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_spans_kept"),
        F.coalesce(
            F.array_join(
                F.transform(
                    F.filter(
                        F.array_sort(
                            F.collect_list(
                                F.struct("span_id", "keep", "span_text")
                            )
                        ),
                        lambda s: s.keep,
                    ),
                    lambda s: s.span_text,
                ),
                " ",
            ),
            F.lit(""),
        ).alias("cleaned_text"),
    )


def exact_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 40,
) -> DataFrame:
    """ExactSubstr duplicate-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): every
    sliding ``window``-character substring is checked for a second
    occurrence ANYWHERE in the corpus (including the same document);
    per document, the flagged window positions are merged into maximal
    duplicated character spans — the regions an ExactSubstr pass would
    cut before training.

    Columns: id, n_chars, n_dup_spans, dup_chars, dup_char_frac.
    Documents shorter than the window carry zero spans.

    This is the distributed stand-in for the suffix-array construction
    the single-node reference tooling uses: a suffix array needs the
    whole corpus in one address space, while the hashed-window form is
    embarrassingly parallel and detects exactly the same >= ``window``
    duplicated regions (a duplicated region of length m >= window flags
    exactly its m - window + 1 interior window positions, which merge
    back into one maximal span).

    Scale (the 100 TB contract):
    - The only corpus-sized shuffle carries (xxhash64 digest) +
      (id, pos) — 24 bytes per character position, never window text
      (which would be a ``window``x write amplification). Occurrence
      counting is digest-only under the 2^-60 collision contract
      (x130's discipline): a collision flags one clean window as
      duplicated, it never drops data and never crashes.
    - The window-position stream is pinned with a lazy localCheckpoint
      because it feeds both the occurrence count and the join-back;
      without the pin the corpus would be re-scanned and re-hashed.
    - Interval merging is a per-document window (lag + running sum of
      break flags) — doc-bounded state, no global ordering. Because
      all intervals share one length, the running-max-end of classic
      gaps-and-islands reduces to lag(pos): ends are monotone in pos.
    - Everything up to the final fraction is exact integer algebra, so
      oracle hash parity is partitioning-independent.
    """
    L = int(window)
    base = df.select(
        id_col,
        F.col(text_col).alias("__t"),
        F.length(text_col).cast("long").alias("n_chars"),
    )
    grams = (
        base.where(F.col("n_chars") >= L)
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("n_chars") - L + 1)
            ).alias("pos"),
            "__t",
        )
        .select(
            id_col,
            "pos",
            F.xxhash64(
                F.col("__t").substr(F.col("pos").cast("int"), F.lit(L))
            ).alias("h"),
        )
    )
    # Occurrence filter as ONE windowed count over the digest partition
    # (r14, guide §2.4): the old shape pinned the gram stream with a
    # localCheckpoint (a full materialization pass over the char-grain
    # relation), aggregated it by h (exchange #1), and self-joined the
    # duplicated digests back (exchange #2 + #3 for the sort-merge) —
    # three exchanges plus a checkpoint of the corpus's largest
    # intermediate. count(*) OVER (PARTITION BY h) computes the same
    # multiset occurrence count with a single exchange, and the gram
    # stream now has exactly one consumer, so no pin is needed.
    occ_w = Window.partitionBy("h")
    dup = (
        grams.withColumn("n_occ", F.count(F.lit(1)).over(occ_w))
        .where(F.col("n_occ") > 1)
        .select(id_col, "pos")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    islands = (
        dup.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "is_new",
            F.when(
                F.col("prev").isNull() | (F.col("pos") > F.col("prev") + L), 1
            ).otherwise(0),
        )
        .withColumn("island", F.sum("is_new").over(w))
    )
    spans = islands.groupBy(id_col, "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + L - 1).alias("e")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("long").alias("dup_chars"),
    )
    return (
        base.select(id_col, "n_chars")
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            "n_chars",
            F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce("dup_chars", F.lit(0)).cast("long").alias("dup_chars"),
            F.round(
                F.when(
                    F.col("n_chars") > 0,
                    F.coalesce("dup_chars", F.lit(0)).cast("double")
                    / F.col("n_chars"),
                ).otherwise(F.lit(0.0)),
                9,
            ).alias("dup_char_frac"),
        )
    )


def bigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Add-one-smoothed bigram language-model score per document — the
    2-gram refinement of `unigram_logprob` (the KenLM-filter stand-in):
    for each adjacent token pair, log p(w2 | w1) = ln((c(w1,w2) + 1) /
    (c(w1,·) + V)) with counts from the corpus itself and V = corpus
    distinct-token count. Columns: id, n_bigrams, avg_logprob,
    min_logprob. Single-token documents have no bigrams and are absent.

    Scale: bigrams come from one per-document lead() window (no
    cross-doc state); the two count relations shuffle (w1, w2) string
    pairs — bounded by vocabulary², not corpus size; V rides the plan as
    a broadcast 1-row cross join (no driver action). The (w1,·)
    continuation counts join on w1 — skew on stop-words is real at
    scale, and AQE skew-join splitting handles it (conf set in
    session.py) without a salting pass.
    """
    toks = positional_tokens(df, id_col, text_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    bg = (
        toks.withColumn("next_token", F.lead("token").over(w))
        .filter(F.col("next_token").isNotNull())
        .select(F.col(id_col), F.col("token").alias("w1"), F.col("next_token").alias("w2"))
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = toks.agg(F.count_distinct("token").cast("double").alias("v_size"))
    logp = F.log(
        (F.col("c12") + F.lit(1.0)).cast("double")
        / (F.col("c1").cast("double") + F.col("v_size"))
    )
    return (
        bg.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn("logp", logp)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.avg("logp").alias("avg_logprob"),
            F.min("logp").alias("min_logprob"),
        )
    )


def filter_funnel(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Pipeline-yield funnel report: how many documents each quality gate
    removes, marginally and cumulatively, in the order the gates run —
    the table every published corpus reports ("we started with N docs;
    the length gate cut 3%, the classifier another 11%") and the first
    thing to diff when a pipeline change silently shifts yield.

    Fixed gate sequence (the c01/c04 stages as a measurement, not a
    filter): 1 length ∈ [100, 20000] chars, 2 ≥ 30 whitespace tokens,
    3 classifier prob ≥ 0.4, 4 lang = 'en'. Returns 4 rows:
    (stage, gate, n_entered, n_failed, n_survived, marginal_fail_rate,
    cumulative_survival), rates 6-dp.

    Plan shape: the gate booleans are scan-side codegen projections; ONE
    1-row aggregate computes the total and the 4 conjunction-prefix
    survivor counts (conditional sums — map-side partial agg, a 5-long
    shuffle row per task); the 4-row funnel is expanded from that single
    row with stack(). Nothing re-scans, nothing re-shuffles — at 100 TB
    this costs exactly one pass over the text column.
    """
    from gwasdb_spark.functions.text import n_tokens_ws, quality_classifier_prob

    t = F.col(text_col)
    g1 = (F.length(t) >= 100) & (F.length(t) <= 20000)
    g2 = n_tokens_ws(t) >= 30
    g3 = quality_classifier_prob(t) >= 0.4
    g4 = F.col(lang_col) == "en"

    def _n(cond) -> Column:
        # coalesce: SUM over an empty relation is NULL, and the funnel's
        # count columns must stay 0 (a monitoring consumer diffs them)
        return F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)).cast(
            "long"
        )

    agg = df.agg(
        F.count(F.lit(1)).cast("long").alias("s0"),
        _n(g1).alias("s1"),
        _n(g1 & g2).alias("s2"),
        _n(g1 & g2 & g3).alias("s3"),
        _n(g1 & g2 & g3 & g4).alias("s4"),
    )
    stages = agg.select(
        F.col("s0"),
        F.expr(
            "stack(4, "
            "1L, 'len_100_20000', s0, s1, "
            "2L, 'min_30_tokens', s1, s2, "
            "3L, 'classifier_p40', s2, s3, "
            "4L, 'lang_en', s3, s4"
            ") AS (stage, gate, n_entered, n_survived)"
        ),
    )
    return stages.select(
        "stage",
        "gate",
        "n_entered",
        (F.col("n_entered") - F.col("n_survived")).alias("n_failed"),
        "n_survived",
        F.round(
            F.when(
                F.col("n_entered") > 0,
                (F.col("n_entered") - F.col("n_survived")).cast("double")
                / F.col("n_entered").cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("marginal_fail_rate"),
        F.round(
            F.when(
                F.col("s0") > 0,
                F.col("n_survived").cast("double") / F.col("s0").cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("cumulative_survival"),
    )


def mann_whitney_auc(
    df: DataFrame, score_col: str, pos_col: str, id_col: str
) -> DataFrame:
    """Tie-corrected Mann-Whitney AUC of ``score_col`` against the 0/1
    label ``pos_col``, fully distributed and exact: ranks come from
    `operators.sampling.global_row_number` over (score, id) — range
    exchange + per-partition offsets, no single-task sort — and a tie
    group's average rank enters as (min+max)/2 (its ranks are
    contiguous under the (score, id) total order). The whole rank-sum
    stays BIGINT via 2·R_pos = Σ n_pos(group)·(min+max):

        AUC = (2·R_pos − n_pos(n_pos+1)) / (2·n_pos·n_neg)

    — one final double division, bit-identical across engines. Returns
    one row (n_pos, n_neg, auc); auc is NULL on single-class input
    (rather than a misleading 0 or 1). Callers that need identical tie
    groups across engines should pre-round the score (x106 discipline)."""
    from gwasdb_spark.operators.sampling import global_row_number

    s = df.select(
        F.col(score_col).alias("__score"),
        F.col(pos_col).cast("long").alias("__pos"),
        F.col(id_col).alias("__id"),
    )
    ranked = global_row_number(
        s, [F.col("__score").asc(), F.col("__id").asc()], rank_col="__rk"
    )
    per_score = ranked.groupBy("__score").agg(
        F.min("__rk").alias("__mn"),
        F.max("__rk").alias("__mx"),
        F.sum("__pos").alias("__np"),
    )
    agg = per_score.agg(
        F.sum("__np").cast("long").alias("n_pos"),
        F.sum(F.col("__np") * (F.col("__mn") + F.col("__mx")))
        .cast("long")
        .alias("__numer2"),
        F.max("__mx").cast("long").alias("__n"),
    )
    n_neg = F.col("__n") - F.col("n_pos")
    return agg.select(
        "n_pos",
        n_neg.alias("n_neg"),
        F.when(
            (F.col("n_pos") > 0) & (n_neg > 0),
            (F.col("__numer2") - F.col("n_pos") * (F.col("n_pos") + 1)).cast(
                "double"
            )
            / (2 * F.col("n_pos") * n_neg).cast("double"),
        ).alias("auc"),
    )
