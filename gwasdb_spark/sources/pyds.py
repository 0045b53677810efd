"""Custom Python DataSource (Spark 4 DataSource API): a partitioned
synthetic marker generator.

The reference's source surface is files + Postgres (SURVEY.md §2.1); this
module demonstrates the engine's EXTENSIBILITY surface — the Python
DataSource API lets a source that is neither a file format nor a JDBC
endpoint (a simulator, an internal service, a generator) participate in
the DataFrame engine as a first-class `spark.read.format(...)` with real
partitioned parallelism: `partitions()` declares the split, each executor
runs `read()` for its own slice, and rows arrive Arrow-batched.

The generator emits the same deterministic marker formula the probe
benchmarks use (plans/relational.py g04), so its output is oracle-checkable
against a pure-SQL reconstruction."""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class MarkerGenReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.n_parts = int(options.get("numpartitions", 8))

    def partitions(self):
        step = max(1, -(-self.n // self.n_parts))  # ceil div
        return [
            _Slice(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield (f"rs{i:09d}", i % 22 + 1, 1 + (i * 997) % 50_000_000)


class MarkerGenDataSource(DataSource):
    """`spark.read.format("marker_gen").option("n", N).load()`."""

    @classmethod
    def name(cls) -> str:
        return "marker_gen"

    def schema(self) -> str:
        return "kgp_id string, chr int, pos bigint"

    def reader(self, schema) -> MarkerGenReader:
        return MarkerGenReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the custom source with a session."""
    spark.dataSource.register(MarkerGenDataSource)
