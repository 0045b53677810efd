"""Property-based checks (hypothesis): Spark expression implementations vs
pure-Python references on arbitrary inputs. Each property batches its
examples into ONE DataFrame so a property costs one Spark job, not one per
example."""

from __future__ import annotations

import math
import re

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from gwasdb_spark.functions.scalar import maf_expr
from gwasdb_spark.functions.text import TOKEN_REGEX, n_tokens_bpe, n_tokens_ws
from gwasdb_spark.operators.dedup import ngram_jaccard_pairs

SETTINGS = settings(max_examples=15, deadline=None)

geno_triples = st.tuples(
    st.integers(0, 10_000), st.integers(0, 10_000), st.integers(0, 10_000)
)


def _maf_reference(h1: int, het: int, h2: int) -> float | None:
    """maf_calc (R/wrangle_data.Rmd:196-201): (het + 2*hom1) / (2*total);
    all-zero counts → undefined (NaN/null)."""
    tot = 2 * (h1 + het + h2)
    if tot == 0:
        return None
    return (het + 2 * h1) / tot


@SETTINGS
@given(st.lists(geno_triples, min_size=1, max_size=50))
def test_maf_expr_matches_reference(spark, triples):
    rows = [(i, f"{a}/{b}/{c}") for i, (a, b, c) in enumerate(triples)]
    df = spark.createDataFrame(rows, "i long, geno string")
    got = {r.i: r.maf for r in df.select("i", maf_expr(F.col("geno")).alias("maf")).collect()}
    for i, (a, b, c) in enumerate(triples):
        want = _maf_reference(a, b, c)
        if want is None:
            assert got[i] is None or math.isnan(got[i])
        else:
            assert got[i] is not None and abs(got[i] - want) < 1e-9, (i, a, b, c)


# ASCII only: Java regex (\S, \b) is ASCII-classed by default while Python's
# is Unicode-classed — the dialect difference (e.g. NBSP) is documented, not
# a property under test.
texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=200,
)


@SETTINGS
@given(st.lists(texts, min_size=1, max_size=50))
def test_token_counts_match_python_regex(spark, samples):
    rows = [(i, t) for i, t in enumerate(samples)]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {
        r.i: (r.ws, r.bpe)
        for r in df.select(
            "i",
            n_tokens_ws(F.col("text")).alias("ws"),
            n_tokens_bpe(F.col("text")).alias("bpe"),
        ).collect()
    }
    for i, t in enumerate(samples):
        assert got[i][0] == len(re.findall(r"\S+", t)), repr(t)
        assert got[i][1] == len(re.findall(TOKEN_REGEX, t)), repr(t)


words = st.lists(st.sampled_from("alpha beta gamma delta epsilon zeta".split()),
                 min_size=0, max_size=30)


def _jaccard_py(docs):
    out = {}
    sh = {
        i: {" ".join(w[j : j + 3]) for j in range(len(w) - 2)}
        for i, w in docs.items()
    }
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            j = inter / len(sh[a] | sh[b])
            if j >= 0.2:
                out[(a, b)] = j
    return out


@SETTINGS
@given(st.dictionaries(st.integers(0, 20), words, min_size=2, max_size=12))
def test_ngram_jaccard_matches_python(spark, docs):
    rows = [(i, " ".join(w)) for i, w in docs.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", n=3, threshold=0.2, max_shingle_docs=1000
        ).collect()
    }
    want = _jaccard_py(docs)
    assert set(got) == set(want), (sorted(got), sorted(want))
    for p in want:
        assert abs(got[p] - want[p]) < 1e-9
