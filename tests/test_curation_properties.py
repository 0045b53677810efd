"""Hypothesis property tests for the curation operators: skyline vs an
O(n²) dominance check, ring negatives vs a bisect successor walk, and
contamination_report vs python set intersections — on RANDOM inputs,
where hand fixtures and the fixed test corpus can't reach the weird
corners (duplicate vectors, all-identical dims, single-element rings,
empty splits)."""

from __future__ import annotations

import bisect
import hashlib
import re

from hypothesis import given, settings, strategies as st

SETTINGS = settings(max_examples=10, deadline=None)


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# -------------------------------------------------------------- skyline --

_pts = st.lists(
    st.tuples(
        st.integers(0, 6),  # coarse grids force ties and duplicates
        st.integers(0, 6),
        st.integers(0, 6),
    ),
    min_size=1,
    max_size=60,
)


@SETTINGS
@given(_pts)
def test_skyline_matches_bruteforce_random(spark, pts):
    from gwasdb_spark.operators.skyline import skyline

    rows = [(i, float(a), float(b), float(c)) for i, (a, b, c) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, a double, b double, c double")
    dims = [("a", "max"), ("b", "min"), ("c", "max")]
    got = {r["id"] for r in skyline(df, dims).collect()}

    def dominates(x, y):
        ge = x[1] >= y[1] and x[2] <= y[2] and x[3] >= y[3]
        gt = x[1] > y[1] or x[2] < y[2] or x[3] > y[3]
        return ge and gt

    expect = {
        x[0]
        for x in rows
        if not any(dominates(y, x) for y in rows if y[0] != x[0])
    }
    assert got == expect


# ------------------------------------------------------- ring negatives --

# Mix small ids with >12-digit and max-int64 ids — the r7 ADVICE bug
# class was lpad(…, 12) silently truncating wide ids to a wrong neg_id.
_ids = st.sets(
    st.one_of(st.integers(0, 10_000), st.integers(10**13, 2**63 - 1)),
    min_size=1,
    max_size=40,
)


@SETTINGS
@given(_ids)
def test_ring_negatives_matches_bisect_random(spark, ids):
    from gwasdb_spark.operators.sampling import ring_negatives

    id_list = sorted(ids)
    df = spark.createDataFrame([(i,) for i in id_list], "id long")
    got = {
        (r["anchor"], r["neg_slot"]): r["neg_id"]
        for r in ring_negatives(df, "id", k=2).collect()
    }
    ring = sorted((_md5hex(str(d))[:15], f"{d:019d}") for d in id_list)
    rpos = [r[0] for r in ring]
    expect = {}
    for a in id_list:
        for j in range(2):
            p = _md5hex(f"{a}:{j}")[:15]
            i = bisect.bisect_right(rpos, p)
            neg = int(ring[i % len(ring)][1])
            if neg != a:
                expect[(a, j)] = neg
    assert got == expect
    # single-element rings drop everything (the only successor is self)
    if len(id_list) == 1:
        assert got == {}


def test_ring_negatives_rejects_negative_ids(spark):
    """Negative ids would break both the zero-pad decode and the
    lexicographic tiebreak — the operator fails fast instead of
    emitting wrong neg_id values (r7 ADVICE item)."""
    import pytest

    from gwasdb_spark.operators.sampling import ring_negatives

    df = spark.createDataFrame([(5,), (-3,)], "id long")
    with pytest.raises(Exception, match="non-negative"):
        ring_negatives(df, "id", k=1).collect()


# -------------------------------------------------------- contamination --

_words = st.text(alphabet="abc", min_size=1, max_size=2)
_doc = st.lists(_words, min_size=0, max_size=8).map(" ".join)


@SETTINGS
@given(st.lists(_doc, min_size=1, max_size=20))
def test_contamination_matches_python_random(spark, docs):
    from gwasdb_spark.operators.dedup import contamination_report

    n = 3
    rows = [
        (i, "train" if i % 2 == 0 else "test", t) for i, t in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, split string, text string")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"], r["is_contaminated"])
        for r in contamination_report(df, "doc_id", "text", "split", n=n).collect()
    }

    def grams(t):
        w = [x for x in re.split(r"\s+", t.strip()) if x] if t.strip() else []
        return {" ".join(w[i : i + n]) for i in range(max(len(w) - n + 1, 0))}

    train = set()
    for i, s, t in rows:
        if s == "train":
            train |= grams(t)
    expect = {}
    for i, s, t in rows:
        if s == "test":
            g = grams(t)
            bad = len(g & train)
            expect[i] = (len(g), bad, bad > 0)
    assert got == expect
