"""CSV/TSV source+sink surface (SURVEY §2.1 S3-S5, S8-S10, F17/F18):
typed reads, 'NA' null normalization, header cleaning, glob union reads,
and the write→read round-trip."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from gwasdb_spark.sources.csv import clean_names, read_delim, snake_case, write_csv


def test_snake_case_headers():
    assert snake_case("Chr Pos") == "chr_pos"
    assert snake_case("INFO.Score") == "info_score"
    assert snake_case("alreadyGood") == "already_good"  # janitor splits camelCase


def test_typed_read_with_na_and_clean_names(spark, tmp_path):
    p = str(tmp_path / "raw.tsv")
    with open(p, "w") as f:
        f.write("Kgp ID\tPos\tInfo.Score\n")
        f.write("1:100_A_G\t100\t0.9\n")
        f.write("NA\t200\tNA\n")
    schema = T.StructType(
        [
            T.StructField("Kgp ID", T.StringType()),
            T.StructField("Pos", T.IntegerType()),
            T.StructField("Info.Score", T.DoubleType()),
        ]
    )
    df = read_delim(spark, p, schema=schema, sep="\t")
    assert df.columns == ["kgp_id", "pos", "info_score"]
    rows = {r.pos: (r.kgp_id, r.info_score) for r in df.collect()}
    assert rows[100] == ("1:100_A_G", 0.9)
    assert rows[200] == (None, None)  # 'NA' → null at read time, no sed pass


def test_headerless_read_with_col_names(spark, tmp_path):
    p = str(tmp_path / "nohdr.tsv")
    with open(p, "w") as f:
        f.write("1:100_A_G\trs1\n2:200_C_T\trs2\n")
    df = read_delim(
        spark, p, sep="\t", header=False, col_names=["kgp_id", "snp"]
    )
    assert df.columns == ["kgp_id", "snp"]
    assert df.count() == 2


def test_glob_union_read(spark, tmp_path):
    for i in (1, 2, 3):
        with open(str(tmp_path / f"chr{i}.csv"), "w") as f:
            f.write("kgp_id,chr\n")
            f.write(f"{i}:1_A_G,{i}\n")
    df = read_delim(spark, str(tmp_path / "chr*.csv"), sep=",")
    assert df.count() == 3  # implicit per-chr file union (S9/U1)


def test_csv_roundtrip_single_file(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a", None), (2, None, 0.5)], "id long, name string, score double"
    )
    out = str(tmp_path / "out_csv")
    write_csv(src, out, single_file=True)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(files) == 1  # vroom_write one-file contract (S10)
    back = (
        spark.read.option("header", True)
        .schema("id long, name string, score double")
        .csv(out)
    )
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in src.collect()}


def test_clean_names_passthrough(spark):
    df = spark.createDataFrame([(1,)], "`Weird Col` long")
    assert clean_names(df).columns == ["weird_col"]


def test_jsonl_roundtrip_preserves_tricky_strings(spark, tmp_path):
    from gwasdb_spark.sources.jsonl import read_jsonl, write_jsonl

    rows = [
        (1, 'quote " backslash \\ newline \n tab \t done', "en"),
        (2, "unicode: Δλ中 ٣ nbsp end", "el"),
        (3, "", "en"),
        (4, None, "fr"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "jl")
    write_jsonl(df, out)
    back = read_jsonl(spark, out, "doc_id bigint, text string, lang string")
    got = {r.doc_id: (r.text, r.lang) for r in back.collect()}
    assert got == {i: (t, l) for i, t, l in rows}


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    import os

    from gwasdb_spark.sources.jsonl import corrupt_lines, read_jsonl

    d = tmp_path / "mixed"
    os.makedirs(d)
    (d / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok"}\n'
        '{"doc_id": "NaNopeNotANumber", "text": "bad type"}\n'
    )
    schema = "doc_id bigint, text string"
    clean = read_jsonl(spark, str(d), schema)
    assert {r.doc_id for r in clean.collect()} == {1, 2}
    bad = [r.raw_line for r in corrupt_lines(spark, str(d), schema).collect()]
    assert len(bad) == 2
    assert "this is not json" in bad


def test_jsonl_read_does_not_mutate_caller_schema(spark, tmp_path):
    """A StructType passed in must come back untouched: StructType.add
    mutates in place, so reusing one schema object across reads would
    accumulate _corrupt_record fields and break the second read."""
    import pyspark.sql.types as T

    from gwasdb_spark.sources.jsonl import corrupt_lines, read_jsonl, write_jsonl

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    out = str(tmp_path / "docs")
    write_jsonl(spark.createDataFrame([(1, "a")], schema), out)
    for _ in range(2):  # second pass fails if the first mutated `schema`
        back = read_jsonl(spark, out, schema)
        assert back.columns == ["doc_id", "text"]
        corrupt_lines(spark, out, schema)
        assert len(schema.fields) == 2


def test_ignore_corrupt_files_skips_truncated_parquet(spark, tmp_path):
    """Ingest robustness: with spark.sql.files.ignoreCorruptFiles a
    truncated parquet (half a file, as a died writer leaves behind)
    costs its rows, not the job — the 100 TB backfill contract."""
    import os

    d = tmp_path / "mixed"
    os.makedirs(d)
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "ok"))
    src = [
        f for f in os.listdir(tmp_path / "ok") if f.endswith(".parquet")
    ][0]
    good = (tmp_path / "ok" / src).read_bytes()
    (d / "good.parquet").write_bytes(good)
    (d / "bad.parquet").write_bytes(good[: len(good) // 2])  # truncated

    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        # explicit schema (the repo's typed-read discipline): corrupt
        # skipping then applies at SCAN time; schema inference over a
        # directory with corrupt members is itself unreliable
        got = spark.read.schema("id bigint").parquet(str(d)).count()
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)
    assert got == 100


def test_merge_schema_reads_evolved_table(spark, tmp_path):
    """Schema evolution: a column added mid-stream (v2 files carry
    `lang`, v1 files don't) reads as the union schema with nulls for the
    missing column — the additive-evolution contract a long-lived corpus
    table needs."""
    p = str(tmp_path / "t")
    spark.createDataFrame([(1, "a")], "doc_id long, text string").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id long, text string, lang string"
    ).write.mode("append").parquet(p)
    df = spark.read.option("mergeSchema", True).parquet(p)
    assert set(df.columns) == {"doc_id", "text", "lang"}
    got = {r.doc_id: r.lang for r in df.collect()}
    assert got == {1: None, 2: "en"}


def test_python_datasource_partitioned_read(spark):
    """The custom Python DataSource must honor its declared input
    partitions (real parallelism, not one generator task) and emit each
    slice exactly once."""
    from gwasdb_spark.sources.pyds import register

    register(spark)
    df = (
        spark.read.format("marker_gen")
        .option("n", 1000).option("numpartitions", 8).load()
    )
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 1000
    assert df.select("kgp_id").distinct().count() == 1000


def test_compaction_reduces_file_count_and_preserves_content(spark, tmp_path):
    """s26 mechanics: 64-way over-split layout compacts to exactly 4
    range-clustered files with identical content; each compacted file
    covers a disjoint doc_id range (min-max stats stay prunable)."""
    import glob
    import os

    from tests.conftest import SF_DIR

    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    small = str(tmp_path / "small")
    compacted = str(tmp_path / "compacted")
    d.repartition(64).write.parquet(small)
    spark.read.parquet(small).repartitionByRange(4, "doc_id").write.parquet(
        compacted
    )
    n_small = len(glob.glob(f"{small}/part-*.parquet"))
    n_comp = len(glob.glob(f"{compacted}/part-*.parquet"))
    assert n_small == 64 and n_comp == 4, (n_small, n_comp)
    a = {r.doc_id: r.text for r in d.collect()}
    b = {r.doc_id: r.text for r in spark.read.parquet(compacted).collect()}
    assert a == b
    # range clustering: per-file id ranges must not overlap
    import pyarrow.parquet as pq

    ranges = []
    for f in glob.glob(f"{compacted}/part-*.parquet"):
        t = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
        if t:
            ranges.append((min(t), max(t)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, ranges
