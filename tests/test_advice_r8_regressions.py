"""Regression fixtures for the round-8 ADVICE defects — each test builds
the exact degenerate input the generated test tables never produce and
runs BOTH engines (the Spark query fn and its DuckDB oracle) on it, so
the Spark/oracle contract is pinned on the failure shape itself:

1. x151: a document with < 6 whitespace tokens used to abort the whole
   query ('Illegal sequence boundaries: 1 to 0 by 1').
2. mm09: a LENGTH-0 payload used to emit two phantom chunks (one at
   byte_offset -4096) via sequence(0, -1)'s implicit -1 step; and the
   oracle's old range(0, 1024) cap silently truncated payloads > 4 MiB.
3. e09: the ORACLE dropped a src-only state's outgoing mass from
   iteration 2 onward (the recursive working table only carried states
   emitted as a dst).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tests.conftest import assert_frames_match, slow_gate


def _write_documents(tmp_path, texts):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, len(texts) + 1)),
            "text": texts,
            "source": ["fixture"] * len(texts),
            "lang": ["en"] * len(texts),
        }
    )
    path = os.path.join(str(tmp_path), "documents.parquet")
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    return path


def _duck_view(path, name="documents"):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def test_x151_short_docs_do_not_abort_and_match_oracle(spark, tmp_path):
    """Docs with < 6 tokens (0 windows), exactly 6 (1 window), and a
    long doc sharing a >= 6-word run with another — Spark must not
    crash, and both engines must agree row-for-row."""
    from gwasdb_spark.plans import QUERIES

    q = QUERIES["x151_winnowing_fingerprints"]
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        "one",  # 1 token: 0 grams
        "one two",  # 2 tokens: 0 grams
        "one two three",  # 3 tokens: 1 gram, 0 windows
        "one two three four five",  # 5 tokens: 3 grams, 0 windows
        "one two three four five six",  # 6 tokens: 4 grams, 1 window
        shared + " trailing words here",
        "leading words " + shared,
        "",  # empty text
    ]
    path = _write_documents(tmp_path, texts)
    sdf = q.fn(spark, str(tmp_path)).toPandas()
    con = _duck_view(path)
    odf = con.execute(q.oracle).df()
    con.close()
    assert_frames_match(sdf, odf, "x151_short_docs")
    # the two docs sharing the 8-word run must both show shared
    # fingerprints (the MOSS guarantee the query exists to give)
    byid = {int(r.doc_id): r for r in sdf.itertuples(index=False)}
    assert byid[6].n_shared_fp > 0 and byid[7].n_shared_fp > 0
    # docs with < 6 tokens produce no windows and are filtered out
    assert set(byid) == {5, 6, 7}


@slow_gate  # slow parity twin (VERDICT r13 #1): mm09's oracle row covers the chunking contract; this is the empty/oversized edge-case replay
def test_mm09_empty_payload_emits_no_rows_and_big_payload_uncapped(
    spark, tmp_path
):
    """An empty payload must emit ZERO manifest rows (not phantom
    chunk_idx -1 / byte_offset -4096 rows), and a payload past the old
    4 MiB oracle cap must chunk in full on both sides."""
    from gwasdb_spark.plans import QUERIES

    q = QUERIES["mm09_chunk_manifest"]
    big = "x" * (4096 * 1024 + 100)  # 1025 chunks: over the old cap
    texts = ["", "short payload", big]
    path = _write_documents(tmp_path, texts)
    sdf = q.fn(spark, str(tmp_path)).toPandas()
    con = _duck_view(path)
    odf = con.execute(q.oracle).df()
    con.close()
    assert_frames_match(sdf, odf, "mm09_empty_and_big")
    assert (sdf["doc_id"] != 1).all(), "empty payload leaked manifest rows"
    assert (sdf["chunk_idx"] >= 0).all() and (sdf["byte_offset"] >= 0).all()
    n_big = int((sdf["doc_id"] == 3).sum())
    assert n_big == 1025, f"big payload truncated: {n_big} chunks"


def test_e09_oracle_keeps_src_only_state_mass(spark, tmp_path):
    """The ADVICE repro: edges a->b, b->a, c->a (c is src-only). The old
    recursive CTE lost c's outgoing mass after iteration 1 —
    pi(a) = 0.3333 vs the true 0.4375. Both engines must now match the
    numpy 20-step damped power iteration exactly (9 dp)."""
    from gwasdb_spark.plans import QUERIES

    q = QUERIES["e09_markov_stationary"]
    rows = [
        (1, 101, "c", "2024-01-01T00:00:00"),
        (2, 101, "a", "2024-01-01T00:01:00"),
        (3, 102, "a", "2024-01-01T00:00:00"),
        (4, 102, "b", "2024-01-01T00:01:00"),
        (5, 103, "b", "2024-01-01T00:00:00"),
        (6, 103, "a", "2024-01-01T00:01:00"),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    path = os.path.join(str(tmp_path), "events.parquet")
    tbl = pa.Table.from_pandas(pdf, preserve_index=False)
    # micros, like the driver's testdata after the round-3 regeneration
    tbl = tbl.set_column(
        tbl.schema.get_field_index("ts"),
        "ts",
        tbl["ts"].cast(pa.timestamp("us")),
    )
    pq.write_table(tbl, path)

    sdf = q.fn(spark, str(tmp_path)).toPandas()
    con = _duck_view(path, "events")
    odf = con.execute(q.oracle).df()
    con.close()
    assert_frames_match(sdf, odf, "e09_src_only_state")

    # hand-check against the 20-step numpy iteration: P rows a->b, b->a,
    # c->a, all weight 1; no dangling states
    states = ["a", "b", "c"]
    P = np.zeros((3, 3))
    P[0, 1] = 1.0  # a->b
    P[1, 0] = 1.0  # b->a
    P[2, 0] = 1.0  # c->a
    pi = np.full(3, 1 / 3)
    for _ in range(20):
        pi = 0.05 / 3 + 0.95 * (pi @ P)
    want = {s: round(float(p), 9) for s, p in zip(states, pi)}
    got = dict(zip(sdf["event_type"], sdf["stationary_p"]))
    assert got == want
    # the value the old oracle got wrong
    assert abs(got["a"] - 0.437510833) < 1e-6
