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


# --- as-of join vs pandas.merge_asof ---------------------------------------

asof_rows = st.tuples(
    st.integers(1, 3),                      # by key
    st.integers(0, 40),                    # ts
    st.one_of(st.none(), st.floats(-100, 100, allow_nan=False)),  # value
)


@SETTINGS
@given(
    left=st.lists(st.tuples(st.integers(1, 3), st.integers(0, 40)),
                  min_size=1, max_size=25),
    right=st.lists(asof_rows, min_size=0, max_size=25),
)
def test_asof_backward_matches_pandas_merge_asof(spark, left, right):
    """Random interleavings incl. duplicate timestamps, null values, and
    keys with no right rows: the union+window composition must agree with
    pandas.merge_asof(direction='backward', allow_exact_matches=True)
    row for row — ties broken by max tiebreak id, matched-null values
    propagating as null."""
    import pandas as pd

    from gwasdb_spark.operators.asof import asof_join_backward

    lrows = [(i, u, ts) for i, (u, ts) in enumerate(left)]
    rrows = [(100 + j, u, ts, v) for j, (u, ts, v) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "event_id long, user_id long, ts long")
    rdf = spark.createDataFrame(
        rrows, "rid long, user_id long, ts long, value double"
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join_backward(
            ldf, rdf, "ts", ["user_id"], ["value"], tiebreak_col="rid"
        ).collect()
    }

    lpd = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"]).sort_values(
        "ts", kind="stable"
    )
    rpd = (
        pd.DataFrame(rrows, columns=["rid", "user_id", "ts", "value"])
        .astype({"rid": "int64", "user_id": "int64", "ts": "int64",
                 "value": "float64"})
        .sort_values(["ts", "rid"], kind="stable")
    )
    ref = pd.merge_asof(
        lpd, rpd[["user_id", "ts", "value"]], on="ts", by="user_id",
        direction="backward", allow_exact_matches=True,
    )
    want = {int(r.event_id): (None if pd.isna(r.value) else r.value)
            for r in ref.itertuples()}
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None, (k, got[k])
        else:
            assert got[k] is not None and abs(got[k] - want[k]) < 1e-9, k


# --- stateful sessionizer fold vs python reference -------------------------


class _FakeState:
    """Minimal GroupState stand-in for driving _sessionize_group directly."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _sessions_py(ts_us_sorted, gap_us):
    n = 0
    for i, t in enumerate(ts_us_sorted):
        if i == 0 or t - ts_us_sorted[i - 1] > gap_us:
            n += 1
    return n


@SETTINGS
@given(
    ts_and_splits=st.lists(st.integers(0, 4 * 3600), min_size=1, max_size=60).flatmap(
        lambda ts: st.tuples(
            st.just(ts),
            st.lists(st.integers(0, len(ts)), min_size=0, max_size=4),
        )
    )
)
def test_stateful_sessionize_fold_matches_batch_reference(ts_and_splits):
    """Random timestamp multisets (seconds, duplicates allowed) split into
    random time-ordered micro-batches: folding batch-by-batch through the
    applyInPandasWithState kernel must equal the one-shot gap count — the
    cross-batch boundary (carried last_us) is exactly where the
    watermark-lag class of bug lives. Pure pandas, no Spark session."""
    import pandas as pd

    from gwasdb_spark.streaming.sessions import GAP_US, _sessionize_group

    ts_s, cuts = ts_and_splits
    ts_us = sorted(t * 1_000_000 for t in ts_s)
    bounds = sorted({0, len(ts_us), *cuts})
    batches = [
        ts_us[a:b] for a, b in zip(bounds, bounds[1:]) if b > a
    ] or [ts_us]

    state = _FakeState()
    last = None
    for chunk in batches:
        # micro-batches arrive time-ordered but unsorted inside
        ns = pd.Series([t * 1000 for t in reversed(chunk)], dtype="int64")
        (out,) = _sessionize_group((7,), [pd.DataFrame({"ts": ns})], state)
        last = out
    assert int(last["n_events"].iloc[0]) == len(ts_us)
    assert int(last["n_sessions"].iloc[0]) == _sessions_py(ts_us, GAP_US)


@SETTINGS
@given(
    left=st.lists(st.tuples(st.integers(1, 3), st.integers(0, 40)),
                  min_size=1, max_size=25),
    right=st.lists(asof_rows, min_size=0, max_size=25),
    direction=st.sampled_from(["forward", "nearest"]),
)
def test_asof_directions_match_pandas_merge_asof(spark, left, right, direction):
    """forward and nearest directions against pandas.merge_asof on random
    interleavings: same duplicate-ts / null-value / missing-key coverage
    as the backward property test, plus the equidistant tie (nearest must
    resolve backward, like pandas)."""
    import pandas as pd

    from gwasdb_spark.operators.asof import asof_join

    lrows = [(i, u, ts) for i, (u, ts) in enumerate(left)]
    rrows = [(100 + j, u, ts, v) for j, (u, ts, v) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "event_id long, user_id long, ts long")
    rdf = spark.createDataFrame(
        rrows, "rid long, user_id long, ts long, value double"
    )
    got = {
        r.event_id: r.asof_value
        for r in asof_join(
            ldf, rdf, "ts", ["user_id"], ["value"],
            tiebreak_col="rid", direction=direction,
        ).collect()
    }

    lpd = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"]).sort_values(
        "ts", kind="stable"
    )
    rpd = (
        pd.DataFrame(rrows, columns=["rid", "user_id", "ts", "value"])
        .astype({"rid": "int64", "user_id": "int64", "ts": "int64",
                 "value": "float64"})
        .sort_values(["ts", "rid"], kind="stable")
    )
    ref = pd.merge_asof(
        lpd, rpd[["user_id", "ts", "value"]], on="ts", by="user_id",
        direction=direction, allow_exact_matches=True,
    )
    want = {int(r.event_id): (None if pd.isna(r.value) else r.value)
            for r in ref.itertuples()}
    assert set(got) == set(want)
    for k in want:
        if want[k] is None:
            assert got[k] is None, (k, got[k], direction)
        else:
            assert got[k] is not None and abs(got[k] - want[k]) < 1e-9, (
                k, direction
            )


# ---------------------------------------------------------------------------
# ICU/Unicode regex parity (ROADMAP decision, round 3): str_detect applies
# (?U) so Java's \w/\b/\s/\d use Unicode definitions — the reference's
# stringr/ICU semantics (gwasDB/app.R:99). Python's re is Unicode-classed
# by default, so it serves as the independent Unicode-semantics reference.
# ---------------------------------------------------------------------------

# Marker-name-ish text across scripts: Latin, Greek, Cyrillic, CJK, accented
# letters, non-ASCII digits (٣ Arabic-Indic), NBSP, punctuation.
unicode_marker_chars = st.characters(
    whitelist_categories=("Lu", "Ll", "Nd", "Pd", "Zs"),
    whitelist_characters="rsΔλЖ中.:_٣ ",
    max_codepoint=0x4FF,
)
unicode_markers = st.text(alphabet=unicode_marker_chars, max_size=40)

# Patterns that exercise the Unicode-sensitive classes. Kept inside the
# Java-(?U) ∩ Python-re common dialect (no \b-adjacent combining-mark edge
# cases, which the two engines tie-break differently).
_CLASS_PATTERNS = [
    r"^rs\d+",
    r"\w+:\w+",
    r"\d",
    r"\s",
    r"^\w+$",
    r"[^\W\d]+",
]


@SETTINGS
@given(st.lists(unicode_markers, min_size=1, max_size=40))
def test_str_detect_unicode_parity(spark, samples):
    from gwasdb_spark.functions.scalar import str_detect

    rows = [(i, t) for i, t in enumerate(samples)]
    df = spark.createDataFrame(rows, "i long, name string")
    sel = [
        str_detect(F.col("name"), pat).alias(f"m{j}")
        for j, pat in enumerate(_CLASS_PATTERNS)
    ]
    got = {r.i: r for r in df.select("i", *sel).collect()}
    for i, t in enumerate(samples):
        for j, pat in enumerate(_CLASS_PATTERNS):
            want = re.search(pat, t) is not None
            assert got[i][f"m{j}"] == want, (repr(t), pat)


# Small-alphabet documents maximize span collisions across docs.
_span_words = st.lists(
    st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=0, max_size=12
).map(" ".join)


@SETTINGS
@given(st.lists(_span_words, min_size=1, max_size=12))
def test_span_dedup_matches_python_reference(spark, texts):
    from collections import Counter

    from gwasdb_spark.operators.quality import span_dedup

    W = 3
    docs = list(enumerate(texts))
    # Pure-python reference: cut into consecutive W-token spans, drop
    # spans whose exact text occurs >1 time corpus-wide, re-join.
    spans_by_doc = {}
    for i, t in docs:
        toks = t.split()
        spans_by_doc[i] = [
            " ".join(toks[j : j + W]) for j in range(0, len(toks), W)
        ]
    occ = Counter(s for spans in spans_by_doc.values() for s in spans)
    want = {
        i: (
            len(spans),
            sum(1 for s in spans if occ[s] <= 1),
            " ".join(s for s in spans if occ[s] <= 1),
        )
        for i, spans in spans_by_doc.items()
        if spans  # token-less docs absent
    }

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["n_spans_kept"], r["cleaned_text"])
        for r in span_dedup(df, span_words=W).collect()
    }
    assert got == want
