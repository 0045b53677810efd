"""JSON-Lines source/sink — the lingua franca of LLM training corpora.

The reference ingests delimited text only (SURVEY.md §2.1); a training-data
engine must also round-trip newline-delimited JSON: corpus releases,
tokenizer inputs, and eval sets all ship as .jsonl(.gz). Spark's native
JSON datasource is the scale path — splittable files, predicate/column
pruning into the parser (Jackson, JVM-side), per-file parallelism — so
both directions here are thin, typed wrappers, not custom parsers.

Design rules:
- ALWAYS pass an explicit schema on read. Schema inference is a full
  extra pass over 100 TB and type-widens surprise rows; a typed read is
  one pass and fails loudly via the `_corrupt_record` channel instead.
- PERMISSIVE + columnNameOfCorruptRecord: one bad line must not kill an
  ingest job; corrupt lines land in a quarantine column for audit
  (mirrors the reference's 'NA'-scrub hygiene, sources/csv.py).
- Writes are directory-parallel (one file per partition) — the only shape
  that scales; `single_file` exists for small exports, same contract as
  write_csv(single_file=True).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Typed JSONL read (file, directory, or glob). Malformed lines parse
    to nulls with the raw line preserved in `_corrupt_record`; pass
    keep_corrupt=True to retain that column for quarantine/auditing,
    otherwise clean rows only are returned."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    # Copy, never StructType.add — that mutates the caller's schema object
    # in place (repeated calls would accumulate _corrupt_record fields).
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def write_jsonl(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Directory-parallel JSONL write (one part file per partition). At
    scale pair with .repartition(n) upstream to control file count;
    single_file collapses to one part for small exports."""
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").json(path)


def corrupt_lines(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """The quarantine view: raw text of every line that failed the typed
    parse — audit/repair input, same role as the reference's sed-scrub
    preflight (R/load_urate2020_gwas.Rmd:244-247).

    Built on text-read + from_json rather than the JSON datasource: Spark
    disallows datasource plans whose only referenced column is the
    internal corrupt-record column (the documented workaround is
    .cache(), a non-starter on a 100 TB scan). The text source streams;
    from_json fills the corrupt field per line with identical PERMISSIVE
    semantics."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    full = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    parsed = F.from_json(
        F.col("value"),
        full,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return (
        spark.read.text(path)
        .select(parsed.getField(CORRUPT_COL).alias("raw_line"))
        .filter(F.col("raw_line").isNotNull())
    )
