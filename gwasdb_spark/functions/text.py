"""Text-analysis expression library (training-data-pipeline extensions).

All hot-path functions are pure Catalyst expressions (JVM-side, codegen'd):
at 100 TB of documents, tokenization and quality scoring must not cross the
Python boundary. Patterns stay within the RE2 ∩ Java-regex common dialect so
DuckDB oracles can mirror them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword lists for the n-gram language-ID heuristic.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "de": ("der", "die", "und", "das", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "de", "et", "un", "est", "que", "pour"),
}

# BPE-ish pretokenizer: words / numbers / single punctuation marks.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def n_tokens_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.regexp_count(text, F.lit(r"\S+")).cast("long")


def n_tokens_bpe(text: Column) -> Column:
    """BPE-ish regex token count."""
    return F.regexp_count(text, F.lit(TOKEN_REGEX)).cast("long")


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (quality signal)."""
    n = F.length(text)
    p = F.regexp_count(text, F.lit(r"[^A-Za-z0-9\s]")).cast("double")
    return F.when(n > 0, p / n.cast("double")).otherwise(F.lit(0.0))


def stopword_count(text: Column, lang: str = "en") -> Column:
    """Count of language stopword occurrences (word-bounded)."""
    pat = r"\b(" + "|".join(LANG_STOPWORDS[lang]) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pat)).cast("long")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Stopwords per whitespace token (quality signal)."""
    nt = n_tokens_ws(text)
    return F.when(
        nt > 0, stopword_count(text, lang).cast("double") / nt.cast("double")
    ).otherwise(F.lit(0.0))


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit scores for the language-ID heuristic."""
    return {lang: stopword_count(text, lang) for lang in LANG_STOPWORDS}


def lang_id(text: Column) -> Column:
    """Argmax language over stopword scores; 'und' (undetermined) when all
    scores are zero. Deterministic tiebreak: language name order."""
    scores = lang_scores(text)
    best = None
    best_score = None
    for lang in sorted(scores):  # deterministic tie resolution
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            gt = s > best_score
            best = F.when(gt, F.lit(lang)).otherwise(best)
            best_score = F.when(gt, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def normalize_for_fingerprint(text: Column) -> Column:
    """Canonical form for document fingerprinting: lowercase, strip
    non-alphanumerics, collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9\s]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    Used for exact dedup keyed on content, robust to formatting noise."""
    return F.md5(normalize_for_fingerprint(text))


def quality_score(text: Column) -> Column:
    """Composite heuristic quality score in [0,1]: rewards stopword density
    and reasonable length, penalizes punctuation soup. Weights are arbitrary
    but fixed; exposed as one expression so Catalyst folds it into the scan
    projection."""
    length_ok = F.when(
        (F.length(text) >= 50) & (F.length(text) <= 20000), F.lit(1.0)
    ).otherwise(F.lit(0.3))
    sw = F.least(stopword_ratio(text) * 2.5, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    return F.round((length_ok * 0.3 + sw * 0.4 + punct_ok * 0.3), 9)


def nfc_normalize_udf():
    """Arrow-batched NFC Unicode normalizer — corpus canonicalization
    before dedup/fingerprinting (é as U+00E9 vs e+combining-acute must
    hash equal). Spark has no built-in normalizer, so this is a genuine
    pandas-UDF case: one Python round trip, vectorized per Arrow batch,
    never per row. Returns a fresh udf object (pandas_udf registration is
    session-bound)."""
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    # real-object annotations: the module-wide `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf's
    # signature inspection rejects
    _nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_nfc, "string")


def quality_classifier_prob(text: Column) -> Column:
    """Model-based quality filter stand-in (the fasttext/classifier stage
    of production corpus pipelines) as a FIXED logistic model over
    interpretable features — deterministic, oracle-mirrorable, and a pure
    codegen expression:

      z = -2.4 + 0.35·ln(1+len) + 6·stopword_ratio − 8·punct_ratio
      p = 1 / (1 + e^(−z))

    Swap the weights for trained ones without changing the plan shape —
    the classifier stays a scan-side projection either way."""
    z = (
        F.lit(-2.4)
        + F.lit(0.35) * F.log(F.lit(1.0) + F.length(text).cast("double"))
        + F.lit(6.0) * stopword_ratio(text)
        - F.lit(8.0) * punct_ratio(text)
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
