"""Minimal ACID table layer over plain parquet (no Delta jar in this
container — see ROADMAP). Public Delta-protocol-shaped: an append-only
version log of snapshot manifests with atomic, exclusive commits."""

from gwasdb_spark.acid.table_log import (
    AcidTable,
    CheckViolation,
    CommitConflict,
)
from gwasdb_spark.acid.multi_commit import MultiTableTxn

__all__ = ["AcidTable", "CheckViolation", "CommitConflict", "MultiTableTxn"]
