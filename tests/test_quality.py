"""Unit tests for operators/quality.py (repetition gate, vocabulary cap)
and the BM25 proximity decay (operators/search.py)."""

from __future__ import annotations

import pytest

from gwasdb_spark.operators.quality import cap_vocabulary, repetition_signals
from gwasdb_spark.operators.search import bm25_topk


def test_repetition_signals_known_fractions(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a"),  # 4 tokens, 1 distinct; bigrams: "a a" x3
            (2, "u v w x y z"),  # all distinct, long enough to pass the gate
            (3, "solo"),  # one token, no bigrams
            (4, "   "),  # no tokens -> absent
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}

    r1 = rows[1]
    assert r1["n_tokens"] == 4 and r1["n_distinct_tokens"] == 1 and r1["max_tf"] == 4
    assert r1["dup_token_frac"] == pytest.approx(0.75)
    assert r1["top_token_frac"] == pytest.approx(1.0)
    assert r1["n_bigrams"] == 3 and r1["n_distinct_bigrams"] == 1
    assert r1["dup_bigram_frac"] == pytest.approx(2 / 3)
    assert r1["is_repetitive"] is True

    r2 = rows[2]
    assert r2["dup_token_frac"] == 0.0
    assert r2["top_token_frac"] == pytest.approx(1 / 6)
    assert r2["dup_bigram_frac"] == 0.0
    assert r2["is_repetitive"] is False

    r3 = rows[3]
    assert r3["n_bigrams"] == 0 and r3["n_distinct_bigrams"] == 0
    assert r3["dup_bigram_frac"] is None
    # single token = 100% top-token mass -> gated
    assert r3["top_token_frac"] == pytest.approx(1.0)
    assert r3["is_repetitive"] is True


def test_cap_vocabulary_rewrite_and_counts(spark):
    # corpus counts: a=4, b=3, c=2, d=1 -> max_vocab=2 keeps {a, b}
    df = spark.createDataFrame(
        [(1, "a b c a"), (2, "a d b"), (3, "b c a")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r for r in cap_vocabulary(df, "doc_id", "text", max_vocab=2).collect()
    }
    assert rows[1]["capped_text"] == "a b <unk> a"
    assert rows[1]["n_unk"] == 1 and rows[1]["n_tokens"] == 4
    assert rows[2]["capped_text"] == "a <unk> b"
    assert rows[3]["capped_text"] == "b <unk> a"


def test_cap_vocabulary_tie_is_lexicographic(spark):
    # x and y both occur twice; max_vocab=1 must keep 'x' (lexicographic)
    df = spark.createDataFrame([(1, "x y y x")], "doc_id long, text string")
    out = cap_vocabulary(df, "doc_id", "text", max_vocab=1).collect()[0]
    assert out["capped_text"] == "x <unk> <unk> x"


def test_bm25_proximity_rewards_colocated_terms(spark):
    # Both docs contain "hash" and "join" once -> identical base BM25.
    # Doc 1 has them adjacent (gap 1), doc 2 separated (gap 5):
    # proximity must rank doc 1 first.
    df = spark.createDataFrame(
        [
            (1, "hash join pad pad pad pad pad"),
            (2, "hash pad pad pad pad join pad"),
        ],
        "doc_id long, text string",
    )
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, ["hash", "join"], k=10).collect()
    }
    assert base[1] == pytest.approx(base[2])

    prox = bm25_topk(df, ["hash", "join"], k=10, proximity=True).collect()
    by_id = {r["doc_id"]: r for r in prox}
    assert by_id[1]["rank"] == 1 and by_id[2]["rank"] == 2
    # gap 1 -> x1.5, gap 5 -> x(1 + 1/6)
    assert by_id[1]["score"] == pytest.approx(base[1] * 1.5, abs=1e-6)
    assert by_id[2]["score"] == pytest.approx(base[2] * (1 + 1 / 6), abs=1e-6)


def test_bm25_proximity_single_term_doc_unchanged(spark):
    df = spark.createDataFrame(
        [(1, "hash pad pad"), (2, "hash join pad")],
        "doc_id long, text string",
    )
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, ["hash", "join"], k=10).collect()
    }
    prox = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, ["hash", "join"], k=10, proximity=True).collect()
    }
    # doc 1 matches one distinct term -> multiplier 1.0
    assert prox[1] == pytest.approx(base[1], abs=1e-6)
    assert prox[2] == pytest.approx(base[2] * 1.5, abs=1e-6)


def test_pii_scrub_redacts_and_counts(spark):
    from gwasdb_spark.operators.quality import pii_scrub

    rows = [
        (1, "mail alice.smith+x@example.co.uk now or ping 10.0.255.3 twice"),
        (2, "call 555-867-5309 or 555.867.5309; version 1.2 stays"),
        (3, "no pii here, just 1234 and a.b"),
        (4, "a@b.io b@c.org 192.168.1.1 and 800 555 1234"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got[1].n_emails == 1 and got[1].n_ips == 1 and got[1].n_phones == 0
    assert "[EMAIL]" in got[1].scrubbed_text and "[IP]" in got[1].scrubbed_text
    assert "alice" not in got[1].scrubbed_text
    assert got[2].n_phones == 2 and "version 1.2 stays" in got[2].scrubbed_text
    assert got[3].n_emails == got[3].n_ips == got[3].n_phones == 0
    assert got[3].scrubbed_text == rows[2][1]
    assert got[4].n_emails == 2 and got[4].n_ips == 1 and got[4].n_phones == 1


def test_keep_best_per_content_picks_highest_quality(spark):
    from gwasdb_spark.operators.dedup import keep_best_per_content

    rows = [
        (1, "same text", 9),
        (2, "same text", 9),   # tie on quality -> min id (1) wins
        (3, "same text", 9),
        (4, "other", 5),
        (5, "third", 7),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    kept = {r.doc_id: r for r in keep_best_per_content(df).collect()}
    assert set(kept) == {1, 4, 5}
    assert kept[1].n_copies == 3
    assert kept[4].n_copies == 1


def test_unigram_logprob_orders_rare_below_common(spark):
    import math

    from gwasdb_spark.operators.quality import unigram_logprob

    rows = [
        (1, "the the the the"),      # all common tokens
        (2, "zyzzyva qwerty"),       # all singletons
        (3, "the zyxwv"),            # mixed
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in unigram_logprob(df).collect()}
    # corpus: the x5, others x1 each; total 8 tokens
    assert got[1].n_tokens == 4
    assert abs(got[1].avg_logprob - math.log(5 / 8)) < 1e-12
    assert abs(got[2].avg_logprob - math.log(1 / 8)) < 1e-12
    assert got[1].avg_logprob > got[3].avg_logprob > got[2].avg_logprob
    assert abs(got[3].min_logprob - math.log(1 / 8)) < 1e-12


def test_nfc_normalize_composes_accents(spark):
    import unicodedata

    from pyspark.sql import functions as F

    from gwasdb_spark.functions.text import nfc_normalize_udf

    decomposed = "résumé"       # e + combining acute
    composed = "résumé"           # precomposed é
    rows = [(1, decomposed), (2, composed), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nfc = nfc_normalize_udf()
    got = {r.doc_id: r.out for r in df.select("doc_id", nfc(F.col("text")).alias("out")).collect()}
    assert got[1] == got[2] == composed
    assert got[3] is None
    assert unicodedata.normalize("NFC", decomposed) == composed


def test_length_bucketing_minimizes_padding(spark):
    from gwasdb_spark.operators.sampling import length_bucketed_batches

    # 4 short docs + 4 long docs, batch_size 4: sorted bucketing must put
    # shorts together (zero padding) instead of mixing lengths
    rows = [(i, 10) for i in range(4)] + [(i + 4, 100) for i in range(4)]
    df = spark.createDataFrame(rows, "id long, n_tokens long")
    got = length_bucketed_batches(df, "id", "n_tokens", batch_size=4).collect()
    by_batch = {}
    for r in got:
        by_batch.setdefault(r.batch_id, []).append(r)
    assert len(by_batch) == 2
    for rows_in in by_batch.values():
        assert len({r.n_tokens for r in rows_in}) == 1   # homogeneous
        assert all(r.batch_padding == 0 for r in rows_in)


def test_dup_ngram_coverage_flags_repeated_blocks(spark):
    from gwasdb_spark.operators.quality import dup_ngram_coverage

    rows = [
        # 'a b c d e' repeated: every 5-gram window dupes with its twin
        (1, "a b c d e a b c d e"),
        # all-distinct tokens: no repeated 5-gram
        (2, "q w e r t y u i o p"),
        # short doc (< n tokens): no grams at all
        (3, "x y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in dup_ngram_coverage(df, n=5).collect()}
    assert got[1].n_tokens == 10
    # windows 0 and 5 are 'a b c d e' (dup) -> cover positions 0-4, 5-9
    assert got[1].n_dup_positions == 10 and got[1].dup_ngram_frac == 1.0
    assert got[2].n_dup_positions == 0 and got[2].dup_ngram_frac == 0.0
    assert got[3].n_dup_positions == 0


def test_casefold_dedup_groups_variants(spark):
    """Case/space/NFC variants of one text must land in one canon group
    while genuinely different text stays apart."""
    from gwasdb_spark.plans import QUERIES  # registry import only

    from gwasdb_spark.functions.text import nfc_normalize_udf
    from pyspark.sql import functions as F

    rows = [
        (1, "Hello  World"),
        (2, "hello world"),
        (3, "HELLO\tWORLD"),
        (4, "Café time"),   # e + combining acute
        (5, "Café time"),    # precomposed é
        (6, "different"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    canon = F.regexp_replace(
        F.lower(nfc_normalize_udf()(F.trim(F.col("text")))), r"\s+", " "
    )
    groups = (
        d.select("doc_id", F.md5(canon).alias("h"))
        .groupBy("h").agg(F.collect_set("doc_id").alias("ids"))
        .collect()
    )
    sets = {frozenset(r.ids) for r in groups}
    assert frozenset({1, 2, 3}) in sets
    assert frozenset({4, 5}) in sets
    assert frozenset({6}) in sets


def test_span_dedup_drops_corpus_repeated_spans(spark):
    import math

    from gwasdb_spark.operators.quality import span_dedup

    df = spark.createDataFrame(
        [
            (1, "a b c x y z"),          # spans: "a b c", "x y z"
            (2, "a b c p q r"),          # "a b c" repeats corpus-wide
            (3, "unique words only here yes sir"),
            (4, "  "),                   # token-less -> absent
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in span_dedup(df, span_words=3).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_spans"] == 2 and rows[1]["n_spans_kept"] == 1
    assert rows[1]["cleaned_text"] == "x y z"
    assert rows[2]["cleaned_text"] == "p q r"
    assert rows[3]["n_spans_kept"] == 2
    assert rows[3]["cleaned_text"] == "unique words only here yes sir"

    # Identical documents: every span shared -> emptied, row retained.
    dup = spark.createDataFrame(
        [(1, "m n o"), (2, "m n o")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in span_dedup(dup, span_words=3).collect()}
    assert out[1]["cleaned_text"] == "" and out[2]["cleaned_text"] == ""
    assert out[1]["n_spans_kept"] == 0


def test_bigram_logprob_matches_hand_formula(spark):
    import math

    from gwasdb_spark.operators.quality import bigram_logprob

    # Corpus tokens: a, b, solo -> V = 3 distinct.
    # Bigrams: (a,b) x3, (b,a) x1 -> c(a,b)=3, c(b,a)=1, c(a,.)=3, c(b,.)=1.
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    assert set(rows) == {1, 2}  # single-token doc has no bigrams
    p_ab = math.log((3 + 1) / (3 + 3))
    p_ba = math.log((1 + 1) / (1 + 3))
    r1 = rows[1]
    assert r1["n_bigrams"] == 3
    assert r1["avg_logprob"] == pytest.approx((2 * p_ab + p_ba) / 3)
    assert r1["min_logprob"] == pytest.approx(min(p_ab, p_ba))
    assert rows[2]["avg_logprob"] == pytest.approx(p_ab)
    # Smoothed probabilities are proper: log p < 0 always.
    assert all(r["min_logprob"] < 0 for r in rows.values())
