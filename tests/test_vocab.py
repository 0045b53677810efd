"""Unit tests for operators/vocab.py: scrub/redaction semantics, salient
terms, deterministic per-group reservoir sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from gwasdb_spark.operators.vocab import (
    reservoir_per_group,
    scrub_patterns,
    top_terms_per_doc,
    vocabulary,
)

EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def test_scrub_pii_tagging(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a@b.com or c.d@e.org and call 555-123-4567 now"),
            (2, "no pii here at all"),
            (3, "dial 111 222 3333 then 444.555.6666 bye"),
        ],
        "id long, text string",
    )
    out = scrub_patterns(
        df, "text", [(EMAIL, "<EMAIL>"), (PHONE, "<PHONE>")]
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["n_scrubbed"] == 3
    assert rows[1]["clean_text"] == "mail <EMAIL> or <EMAIL> and call <PHONE> now"
    assert rows[2]["n_scrubbed"] == 0
    assert rows[2]["clean_text"] == "no pii here at all"
    assert rows[3]["n_scrubbed"] == 2
    assert rows[3]["clean_text"] == "dial <PHONE> then <PHONE> bye"


def test_scrub_removal_normalizes_whitespace(spark):
    df = spark.createDataFrame([(1, "keep the word the gone")], "id long, text string")
    out = scrub_patterns(df, "text", [(r"\bthe\b", "")]).first()
    assert out["clean_text"] == "keep word gone"
    assert out["n_scrubbed"] == 2


def test_scrub_counts_on_original_text(spark):
    # Second pattern's matches exist only pre-scrub: counts must come from
    # the ORIGINAL text, so both patterns report their own hits.
    df = spark.createDataFrame([(1, "ab ab")], "id long, text string")
    out = scrub_patterns(df, "text", [(r"ab", "x"), (r"ab", "y")]).first()
    assert out["n_scrubbed"] == 4
    assert out["clean_text"] == "x x"


def test_top_terms_ranking(spark):
    # doc 1: 'x' tf=3; 'rare' tf=2; 'common' tf=2 but df=2 -> 'rare' (df=1)
    # outranks 'common' on the df tiebreak.
    df = spark.createDataFrame(
        [
            (1, "x x x rare rare common common"),
            (2, "common z z"),
        ],
        "doc_id long, text string",
    )
    out = top_terms_per_doc(df, "doc_id", "text", k=2)
    got = {(r["doc_id"], r["term_rank"]): (r["token"], r["tf"], r["df"]) for r in out.collect()}
    assert got[(1, 1)] == ("x", 3, 1)
    assert got[(1, 2)] == ("rare", 2, 1)
    assert got[(2, 1)] == ("z", 2, 1)
    assert got[(2, 2)] == ("common", 1, 2)


def test_vocabulary_counts_and_rank(spark):
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "  ")], "doc_id long, text string"
    )
    out = {r["token"]: r for r in vocabulary(df, "doc_id", "text", top_n=10).collect()}
    assert out["a"]["n_occurrences"] == 2 and out["a"]["n_docs"] == 1
    assert out["b"]["n_occurrences"] == 2 and out["b"]["n_docs"] == 2
    assert out["c"]["n_occurrences"] == 1
    # ties broken lexicographically: a(2) < b(2), then c(1)
    assert [out[t]["vocab_rank"] for t in ("a", "b", "c")] == [1, 2, 3]


def test_reservoir_deterministic_and_bounded(spark):
    df = spark.createDataFrame(
        [(i, "g%d" % (i % 3)) for i in range(60)], "id long, grp string"
    )
    a = reservoir_per_group(df, "grp", "id", k=5)
    assert a.groupBy("grp").count().agg(F.max("count")).first()[0] == 5
    # identical draw under a different physical partitioning
    b = reservoir_per_group(df.repartition(7, "id"), "grp", "id", k=5)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_reservoir_small_group_returns_all(spark):
    df = spark.createDataFrame([(1, "g"), (2, "g")], "id long, grp string")
    assert reservoir_per_group(df, "grp", "id", k=10).count() == 2
