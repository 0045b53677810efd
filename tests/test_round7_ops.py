"""Edge-case contracts for the round-7 operators — the degenerate inputs
the generated test tables never produce (all-zero dimensions, zero-norm
vectors, users with no history, empty corpora), pinned at the operator
level so the oracle-facing queries can rely on them."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_int8_audit_all_zero_dimension(spark):
    """An all-zero dimension must report scale 0 and zero error — not an
    ANSI divide-by-zero — while live dimensions audit normally."""
    from gwasdb_spark.operators.similarity import int8_quantization_audit

    df = spark.createDataFrame(
        [([0.0, 1.0],), ([0.0, -3.0],), ([0.0, 2.5],)], "embedding array<float>"
    )
    rows = {r["dim"]: r for r in int8_quantization_audit(df).collect()}
    assert rows[0]["scale"] == 0.0
    assert rows[0]["mean_abs_err"] == 0.0 and rows[0]["max_abs_err"] == 0.0
    assert rows[1]["scale"] == 3.0
    assert rows[1]["n_values"] == 3
    # round-to-nearest invariant: every error <= scale / 254
    assert rows[1]["max_abs_err"] <= 3.0 / 254.0 + 1e-12


def test_int8_audit_error_is_exact_for_representable_values(spark):
    """Values that are exact multiples of scale/127 reconstruct exactly."""
    from gwasdb_spark.operators.similarity import int8_quantization_audit

    df = spark.createDataFrame(
        [([127.0],), ([-127.0],), ([64.0],), ([0.0],)], "embedding array<float>"
    )
    (row,) = int8_quantization_audit(df).collect()
    assert row["scale"] == 127.0
    assert row["max_abs_err"] == 0.0


def test_nearest_centroid_profile_hand_fixture(spark):
    """Orthogonal 2-centroid codebook: assignment and cohesion are
    hand-computable; a zero-norm vector is dropped (unassignable), never
    silently attached to an arbitrary centroid."""
    from gwasdb_spark.operators.similarity import nearest_centroid_profile

    rows = [
        (0, [1.0, 0.0]),  # centroid 0
        (1, [0.0, 1.0]),  # centroid 1
        (2, [2.0, 0.0]),  # -> c0, cos 1.0
        (3, [1.0, 1.0]),  # tie cos(c0)=cos(c1)=0.7071... -> lower id c0
        (4, [0.0, -1.0]),  # cos(c0)=0, cos(c1)=-1 -> c0 (argmax, not abs)
        (5, [0.0, 0.0]),  # zero-norm: dropped
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = df.filter(F.col("vec_id") < 2)
    res = {
        r["centroid_id"]: r
        for r in nearest_centroid_profile(df, cents).collect()
    }
    # assigned: 0,2,3,4 -> c0; 1 -> c1; 5 dropped
    assert res[0]["n_assigned"] == 4
    assert res[1]["n_assigned"] == 1
    assert res[1]["avg_cosine"] == 1.0
    assert res[0]["min_cosine"] == 0.0  # vec 4's cos against c0
    total = sum(r["n_assigned"] for r in res.values())
    assert total == 5  # the zero vector is absent, nothing else lost


def test_filter_funnel_degenerate_corpus(spark):
    """Empty and all-failing corpora keep the 4-row report shape with
    zero-guarded rates (no ANSI divide-by-zero)."""
    from gwasdb_spark.operators.quality import filter_funnel

    empty = spark.createDataFrame([], "text string, lang string")
    rows = filter_funnel(empty).collect()
    assert len(rows) == 4
    assert all(r["n_entered"] == 0 and r["marginal_fail_rate"] == 0.0 for r in rows)
    assert all(r["cumulative_survival"] == 0.0 for r in rows)

    tiny = spark.createDataFrame([("hi", "en")], "text string, lang string")
    rows = {r["stage"]: r for r in filter_funnel(tiny).collect()}
    assert rows[1]["n_entered"] == 1 and rows[1]["n_survived"] == 0
    # later gates see zero entrants and report rate 0, not an error
    assert rows[2]["n_entered"] == 0 and rows[2]["marginal_fail_rate"] == 0.0


def test_filter_funnel_counts_are_conjunction_prefixes(spark):
    """Survivor counts must be cumulative conjunctions, not per-gate
    marginals over the full corpus: a doc failing gate 1 never reaches
    gate 2 even if it would pass it."""
    from gwasdb_spark.operators.quality import filter_funnel

    long_en = ("the and of to a in is that " * 20).strip()  # passes 1-4
    long_fr = ("le la de un une et " * 30).strip()  # passes 1-3, fails lang
    short_en = "the cat"  # fails length
    df = spark.createDataFrame(
        [(long_en, "en"), (long_fr, "fr"), (short_en, "en")],
        "text string, lang string",
    )
    rows = {r["stage"]: r for r in filter_funnel(df).collect()}
    assert rows[1]["n_entered"] == 3 and rows[1]["n_survived"] == 2
    assert rows[2]["n_entered"] == 2
    assert rows[4]["n_survived"] == 1
    assert rows[4]["cumulative_survival"] == round(1 / 3, 6)


def test_attribution_user_with_no_clicks(spark):
    """e04's sentinel contract: a purchase from a user with no click
    history lands at click_id = gap_s = -1 (asof carries null, the
    window filter must not error on it)."""
    from gwasdb_spark.operators.asof import asof_join

    purch = spark.createDataFrame(
        [(10, 1, "2024-01-05 12:00:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = spark.createDataFrame(
        [], "click_id long, user_id long, ts timestamp, click_ts timestamp"
    )
    j = asof_join(
        purch, clicks, "ts", ["user_id"], ["click_id", "click_ts"],
        tiebreak_col="click_id",
    )
    in_window = F.col("asof_click_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    out = j.select(
        F.when(in_window, F.col("asof_click_id")).otherwise(F.lit(-1)).alias("c"),
    ).collect()
    assert [r["c"] for r in out] == [-1]
