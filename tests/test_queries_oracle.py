"""Every registered query vs its DuckDB oracle — the driver's t2 gate,
replicated at sf0.001 for fast iteration (the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from gwasdb_spark.plans import QUERIES

from tests.conftest import SF_DIR, assert_frames_match

ALL_NAMES = sorted(QUERIES)


@pytest.mark.parametrize("name", ALL_NAMES)
def test_query_matches_oracle(name, spark, duck):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    spark_pdf = sdf.toPandas()
    if q.oracle is None:
        # rows-only: runs, yields a stable schema, non-negative rows
        assert spark_pdf.shape[0] >= 0
        assert len(spark_pdf.columns) > 0
        return
    oracle_pdf = duck.execute(q.oracle).df()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_entry_smoke(spark):
    import __spark_entry__ as mod

    df = mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert len(df.columns) == 5


def test_contract_shape():
    import __spark_entry__ as mod

    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 40
