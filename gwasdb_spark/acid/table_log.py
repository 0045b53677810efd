"""Transactional table-on-parquet via an append-only version log.

The container ships no Delta/Iceberg jar (re-checked every round), so
`gwas/dml.py`'s DELETE/UPDATE/MERGE were read-transform-rewrite with
rename-swap "atomicity" — no snapshot isolation, no concurrent-writer
safety, no time travel. This module supplies those properties with the
same mechanism the public lakehouse formats use (Delta's protocol, the
part of it this engine needs), built only on POSIX primitives:

Layout:
    <table>/data/<uuid>/part-*.parquet   -- immutable data file groups
    <table>/_log/00000000.json           -- version 0 commit
    <table>/_log/00000001.json           -- version 1 commit ...

Each commit file is a FULL snapshot manifest: {"version", "op",
"file_groups": [relative dirs], "stats": {group: {col: [min, max,
null_count, row_count]}}} — simpler than Delta's add/remove actions
and right at this metadata scale; swapping the manifest body for
add/remove deltas (and checkpoint compaction) changes nothing below,
and is the 100 TB metadata path.

File skipping (round 10): every written group records per-column
min/max/null stats in the manifest (the Delta data-skipping / parquet
footer design). DML with a sargable `acid.predicates.Pred` reads ONLY
the groups whose stats admit a match — untouched groups are carried
into the new manifest verbatim, their files never opened, never
rewritten (mtime-stable, gated in scripts/stress_scale.py). At 100 TB
this is the difference between a 1-row UPDATE costing one file group
and costing a full table rewrite. A plain Column predicate still
works and falls back to the full-snapshot rewrite (soundness over
speed when the predicate is not statically analyzable).

ACID properties and how they hold:
- Atomic commit: the manifest is fully written to a temp file, fsynced,
  then `os.link`ed to its final `_log/{v:08d}.json` name. Link is
  atomic AND exclusive — it FAILS if the version already exists, so a
  torn write can never surface as a live commit and two writers can
  never both own a version.
- Isolation (snapshot): readers resolve the latest committed manifest
  once and read only the immutable file groups it names; an in-flight
  writer adds NEW data dirs and cannot disturb any named group.
  Optimistic concurrency: the loser of a version race gets
  CommitConflict and retries against the new snapshot (classic OCC;
  semantic conflict detection — did the winner touch my rows — is the
  caller's policy, as in Delta's WriteSerializable default for
  blind appends vs rewrites).
- Durability: data files and the manifest are fsynced before the link;
  the log advances only past complete manifests.
- Consistency: every snapshot is a complete table version; DML ops are
  copy-on-write (this implementation rewrites the full snapshot — the
  file-granular rewrite that skips untouched files via min/max stats is
  the same interface with a pushed-down touched-file predicate, noted
  where it applies).

Point-lookup skipping (round 10): tables created with `bloom_cols`
carry a per-group bloom-filter sidecar (acid/bloom.py — the native
stand-in for Delta bloom indexes / parquet column blooms, both absent
from this container). After min/max passes, Eq/IsIn conjuncts on a
bloom column probe the sidecar and prune groups the filter proves
value-free — the case min/max cannot see: a point DELETE on a key
whose values interleave across every group.

CHECK constraints (round 10): `create(checks=...)` / `add_check` /
`drop_check` store {name: SQL boolean expr} in every manifest;
`_write_group` validates each new group in one aggregate and aborts
the statement (CheckViolation, no version committed, group removed)
on any FALSE row — NULL passes, per SQL/Delta CHECK semantics.
`add_check` validates the whole current snapshot before committing
its metadata-only version.

Time travel: `read(version=k)` pins any retained snapshot; `history()`
lists commits; `vacuum(keep_last)` removes data groups unreferenced by
the retained log tail (and the old manifests), refusing to touch
anything a retained version still names.

Cites: reference applies row-level SQL DML against Postgres
(R/wrangle_data.Rmd:360-390, R/postgres_process.Rmd:119); this gives
those statements transactional lakehouse semantics.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gwasdb_spark.acid import bloom as _bloom
from gwasdb_spark.acid.predicates import Pred, required_point_lookups


class CommitConflict(Exception):
    """Another writer committed this version first — re-read and retry."""


class CheckViolation(Exception):
    """A write produced rows failing a table CHECK constraint; the
    statement is aborted, the table unchanged (Delta's CHECK
    semantics: the violating version never commits)."""


class SchemaMismatch(Exception):
    """An append's schema conflicts with the table schema: a shared
    column changed type, or new columns arrived without
    merge_schema=True (Delta's mergeSchema opt-in)."""


# dtypes whose min/max are meaningful, orderable, and JSON-serializable
_STATS_TYPES = (
    "tinyint", "smallint", "int", "bigint", "float", "double",
    "string", "boolean", "date",
)


def _json_safe(v):
    import datetime as _dt
    import decimal as _dec

    if isinstance(v, _dec.Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def _check_violations(df: DataFrame, checks: dict) -> dict:
    """{name: violating-row-count} for every failing CHECK, one
    aggregate pass. SQL CHECK semantics: a row violates only when the
    expression is FALSE — NULL/unknown passes (coalesce to TRUE)."""
    aggs = [
        F.sum(
            (~F.coalesce(F.expr(expr), F.lit(True))).cast("long")
        ).alias(f"__chk_{i}")
        for i, expr in enumerate(checks.values())
    ]
    row = df.agg(*aggs).collect()[0]  # 1-row bounded collect
    return {
        name: int(row[f"__chk_{i}"] or 0)
        for i, name in enumerate(checks)
        if row[f"__chk_{i}"]
    }


def _txn_marker_path(txn: dict) -> str:
    return os.path.join(txn["root"], txn["id"] + ".commit")


def _txn_visible(manifest: dict) -> bool:
    """A manifest committed by a MULTI-TABLE transaction (acid/
    multi_commit.py) carries {"txn": {"id", "root"}} and is visible
    IFF the transaction's commit marker exists — the single fsync-then-
    link of that marker is the atomic commit point for every
    participating table at once. A manifest without the field is an
    ordinary single-table commit, always visible."""
    txn = manifest.get("txn")
    return txn is None or os.path.exists(_txn_marker_path(txn))


def _fsync_dir(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class AcidTable:
    """A versioned parquet table with atomic commits (see module doc)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._log = os.path.join(path, "_log")
        self._data = os.path.join(path, "data")

    # ----------------------------------------------------------- log --
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._log, f"{version:08d}.json")

    def latest_version(self) -> int:
        """Highest committed AND VISIBLE version, -1 when the table
        does not exist. A version published by an in-flight multi-table
        transaction (manifest carries a "txn" pointer whose commit
        marker is absent) is invisible — readers snapshot below it, and
        because the slot is physically taken (os.link exclusivity),
        every other writer's next-version commit conflicts until the
        transaction commits or is recovered: pending transactions BLOCK
        the log rather than leaving reorderable holes. The extra cost
        is one tiny json read per txn-tagged tip manifest; at real
        metadata scale a log checkpoint carries the visibility bit."""
        if not os.path.isdir(self._log):
            return -1
        versions = []
        for name in os.listdir(self._log):
            if name.endswith(".json"):
                try:
                    versions.append(int(name[:-5]))
                except ValueError:
                    continue
        for v in sorted(versions, reverse=True):
            try:
                m = self._manifest(v)
            except (OSError, ValueError):
                continue  # racing a recovery unlink
            if _txn_visible(m):
                return v
        return -1

    def _tip_slot(self) -> int:
        """Highest PHYSICALLY TAKEN version slot (visible or pending) —
        where multi_commit allocates, so a transaction never stacks a
        version under a pending one."""
        if not os.path.isdir(self._log):
            return -1
        best = -1
        for name in os.listdir(self._log):
            if name.endswith(".json"):
                try:
                    best = max(best, int(name[:-5]))
                except ValueError:
                    continue
        return best

    def _manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        """Commit log, oldest retained first (vacuum may trim the head)."""
        out = []
        for v in range(self.latest_version() + 1):
            if os.path.exists(self._manifest_path(v)):
                m = self._manifest(v)
                if not _txn_visible(m):
                    continue  # aborted-txn hole below the tip
                out.append({"version": m["version"], "op": m["op"]})
        return out

    def _visible_manifest(self, version: int) -> dict:
        """Manifest of an EXPLICITLY requested version, refusing a
        pending/aborted multi-table-txn slot (its data was never
        atomically published)."""
        m = self._manifest(version)
        if not _txn_visible(m):
            raise FileNotFoundError(
                f"version {version} of {self.path} belongs to an "
                "uncommitted multi-table transaction"
            )
        return m

    # ---------------------------------------------------------- write --
    def _write_group(
        self,
        df: DataFrame,
        checks: dict | None = None,
        bloom_cols: list | None = None,
        column_map: dict | None = None,
    ) -> tuple[str, dict]:
        """Write a new immutable file group and return (group, stats).

        Stats come from ONE aggregate over the just-written files (the
        truthful source — what is actually on disk), the same min/max/
        null-count triple parquet footers carry; batch-scale cost.

        When the table carries a `column_map` (RENAME COLUMN history —
        {logical: physical}), the batch arrives with LOGICAL names and
        is written under the PHYSICAL ones, so every file group in the
        table shares one physical naming forever (the Delta
        column-mapping invariant; mixed per-group names would make the
        single read schema null-fill the newer groups silently). Stats
        are translated back to logical keys — pruning predicates speak
        logical names.

        When the table carries CHECK constraints, the new rows are
        validated here (one aggregate over the just-written group);
        any violation removes the group and aborts the statement
        BEFORE a manifest could name it. When the table carries bloom
        columns, the group's bloom sidecar is built and written inside
        the group dir before return (immutable with the group)."""
        group = uuid.uuid4().hex
        path = os.path.join(self._data, group)
        column_map = column_map or {}
        # Stats AND CHECK validation ride the write job itself as
        # observed metrics (r13, guide §1.4/§5): the old path re-read
        # the just-written files once for stats and once more for
        # checks — two extra jobs per commit, paid by every DML
        # statement. The metrics are computed over the exact rows the
        # write emits (same truthful source, one pass), and the
        # expressions speak LOGICAL names so no column-map
        # back-translation is needed. CHECK semantics unchanged: a
        # violating group is removed before any manifest names it.
        from pyspark.sql import Observation

        stat_cols = [
            f.name
            for f in df.schema.fields
            if f.dataType.typeName() in (
                "byte", "short", "integer", "long", "float", "double",
                "string", "boolean", "date", "timestamp", "timestamp_ntz",
            ) or f.dataType.typeName().startswith("decimal")
        ]
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in stat_cols:
            aggs += [
                F.min(c).alias(f"__min_{c}"),
                F.max(c).alias(f"__max_{c}"),
                F.count(c).alias(f"__cnt_{c}"),
            ]
        chk_names = list(checks or {})
        for i, expr in enumerate((checks or {}).values()):
            aggs.append(
                F.sum(
                    (~F.coalesce(F.expr(expr), F.lit(True))).cast("long")
                ).alias(f"__chk_{i}")
            )
        obs = Observation()
        observed = df.observe(obs, *aggs)
        if column_map:
            observed = observed.select(
                *[F.col(c).alias(column_map.get(c, c)) for c in df.columns]
            )
        observed.write.mode("overwrite").parquet(path)
        row = obs.get
        rows = int(row["__rows"] or 0)
        st = {
            c: [
                _json_safe(row[f"__min_{c}"]),
                _json_safe(row[f"__max_{c}"]),
                rows - int(row[f"__cnt_{c}"] or 0),
                rows,
            ]
            for c in stat_cols
        }
        if checks and rows:
            bad = {
                name: int(row[f"__chk_{i}"] or 0)
                for i, name in enumerate(chk_names)
                if row[f"__chk_{i}"]
            }
            if bad:
                shutil.rmtree(path, ignore_errors=True)
                raise CheckViolation(
                    f"CHECK constraint(s) violated, statement aborted: "
                    + ", ".join(
                        f"{n} ({c} rows): {checks[n]}"
                        for n, c in sorted(bad.items())
                    )
                )
        if bloom_cols and rows:
            back = self.spark.read.parquet(path)
            elig = _bloom.bloom_eligible_columns(back, bloom_cols)
            if elig:
                _bloom.write_sidecar(
                    path,
                    {c: _bloom.build_bloom(back, c, rows) for c in elig},
                )
        return group, st

    def _group_stats(self, path: str) -> dict:
        back = self.spark.read.parquet(path)
        cols = [
            f.name
            for f in back.schema.fields
            if f.dataType.typeName() in (
                "byte", "short", "integer", "long", "float", "double",
                "string", "boolean", "date", "timestamp", "timestamp_ntz",
            ) or f.dataType.typeName().startswith("decimal")
        ]
        aggs = [F.count(F.lit(1)).alias("__rows")]
        for c in cols:
            aggs += [
                F.min(c).alias(f"__min_{c}"),
                F.max(c).alias(f"__max_{c}"),
                F.count(c).alias(f"__cnt_{c}"),
            ]
        row = back.agg(*aggs).collect()[0]  # 1-row bounded collect
        rows = row["__rows"]
        return {
            c: [
                _json_safe(row[f"__min_{c}"]),
                _json_safe(row[f"__max_{c}"]),
                rows - row[f"__cnt_{c}"],
                rows,
            ]
            for c in cols
        }

    @staticmethod
    def _meta_of(manifest: dict) -> dict:
        """Table-level metadata carried forward commit-to-commit
        (Delta keeps these in protocol/metaData actions; a
        full-snapshot manifest carries them verbatim)."""
        return {
            "checks": manifest.get("checks"),
            "bloom_cols": manifest.get("bloom_cols"),
            "schema": manifest.get("schema"),
            "column_map": manifest.get("column_map"),
            "dropped_physical": manifest.get("dropped_physical"),
        }

    def _commit(
        self,
        version: int,
        op: str,
        groups: list[str],
        stats: dict | None = None,
        meta: dict | None = None,
        txn: dict | None = None,
    ) -> None:
        os.makedirs(self._log, exist_ok=True)
        meta = meta or {}
        body = {
            "version": version,
            "op": op,
            "file_groups": sorted(groups),
            "stats": stats or {},
            "checks": meta.get("checks") or {},
            "bloom_cols": sorted(meta.get("bloom_cols") or []),
        }
        if txn:
            # Published but INVISIBLE until the txn's commit marker
            # links (acid/multi_commit.py) — the slot is taken so other
            # writers conflict rather than reorder around it.
            body["txn"] = {"id": txn["id"], "root": txn["root"]}
        if meta.get("schema"):
            body["schema"] = meta["schema"]
        if meta.get("column_map"):
            body["column_map"] = meta["column_map"]
        if meta.get("dropped_physical"):
            body["dropped_physical"] = meta["dropped_physical"]
        tmp = os.path.join(self._log, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(body, fh)
            fh.flush()
            os.fsync(fh.fileno())
        try:
            # atomic + exclusive: fails iff the version is already taken
            os.link(tmp, self._manifest_path(version))
        except FileExistsError as exc:
            raise CommitConflict(
                f"version {version} was committed by another writer"
            ) from exc
        finally:
            os.unlink(tmp)
        _fsync_dir(self._log)

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        checks: dict | None = None,
        bloom_cols: list | None = None,
    ) -> "AcidTable":
        """`checks` = {name: SQL boolean expr} enforced on every write
        from version 0 on (see add_check for post-hoc addition);
        `bloom_cols` = columns to carry per-group bloom sidecars for
        point-lookup skipping (int/string columns only — others are
        ignored with min/max stats still applying)."""
        t = cls(spark, path)
        if t.latest_version() >= 0:
            raise FileExistsError(f"table already exists at {path}")
        group, st = t._write_group(df, checks, bloom_cols)
        t._commit(
            0,
            "create",
            [group],
            {group: st},
            {
                "checks": checks,
                "bloom_cols": bloom_cols,
                "schema": df.schema.jsonValue(),
            },
        )
        return t

    # ----------------------------------------------------------- read --
    def _read_groups(self, manifest: dict, groups: list[str]) -> DataFrame:
        """Read file groups UNDER THE MANIFEST SCHEMA: groups written
        before a schema evolution lack the newer columns, and Spark's
        parquet reader null-fills columns the requested schema has but
        a file does not — the scalable evolution read (no footer
        merging; the log is the source of truth, as in Delta).

        With a `column_map` (RENAME history), the requested parquet
        schema uses the PHYSICAL field names (what is in the files) and
        one zero-cost Project aliases them back to the manifest's
        logical names; a DROPPED column simply isn't requested — the
        reader never materializes it. Time travel works unchanged:
        read(v) uses manifest(v)'s own schema AND map, so pre-rename
        snapshots surface pre-rename names."""
        paths = [os.path.join(self._data, g) for g in groups]
        reader = self.spark.read
        cmap = manifest.get("column_map") or {}
        if manifest.get("schema"):
            from pyspark.sql.types import StructField, StructType

            logical = StructType.fromJson(manifest["schema"])
            if cmap:
                physical = StructType(
                    [
                        StructField(
                            cmap.get(f.name, f.name), f.dataType, f.nullable
                        )
                        for f in logical.fields
                    ]
                )
                out = reader.schema(physical).parquet(*paths)
                return out.select(
                    *[
                        F.col(cmap.get(f.name, f.name)).alias(f.name)
                        for f in logical.fields
                    ]
                )
            reader = reader.schema(logical)
        return reader.parquet(*paths)

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read. `version=None` pins the LATEST version once —
        concurrent commits after this call do not move the snapshot."""
        v = self.latest_version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"no committed version at {self.path}")
        m = self._visible_manifest(v)
        return self._read_groups(m, m["file_groups"])

    def read_where(
        self, predicate: Column | Pred, version: int | None = None
    ) -> DataFrame:
        """Snapshot read with MANIFEST-level skipping — the serving
        path's twin of pruned DML. With a sargable Pred, only groups
        whose min/max stats (and bloom sidecars, for Eq/IsIn on bloom
        columns) admit a match are even listed to Spark; the row-level
        filter is then applied on top (stats skipping is group-
        granular, not exact). At 100 TB a point lookup on a clustered
        or bloomed key touches O(1) file groups instead of planning a
        full-table scan; parquet footer pruning inside the surviving
        groups still applies. A plain Column predicate reads the full
        snapshot and filters (soundness fallback). An all-pruned
        lookup returns an empty frame of the table's schema without
        touching any data file."""
        v = self.latest_version() if version is None else version
        if v < 0:
            raise FileNotFoundError(f"no committed version at {self.path}")
        if not isinstance(predicate, Pred):
            return self.read(v).filter(predicate)
        m = self._visible_manifest(v)
        touched = self._touched_by(predicate)(m)
        if not touched:
            return self.read(v).limit(0)
        return self._read_groups(m, touched).filter(predicate.to_column())

    def scan_groups(
        self, predicate: Pred, version: int | None = None
    ) -> tuple[int, int]:
        """(groups a read_where(predicate) would open, total groups) —
        the observable skipping contract, driver/oracle-pinnable."""
        v = self.latest_version() if version is None else version
        m = self._visible_manifest(v)
        return len(self._touched_by(predicate)(m)), len(m["file_groups"])

    # ------------------------------------------------------------ dml --
    def _rewrite(self, op: str, transform, max_retries: int = 3) -> int:
        """Optimistic copy-on-write over the FULL snapshot: read latest,
        transform, commit as the next version; on a version race,
        re-read and re-apply (the transform must be a pure function of
        the snapshot). Returns the committed version. The pruned path
        (`_rewrite_pruned`) is preferred whenever the predicate is
        statically analyzable."""
        for _ in range(max_retries + 1):
            base = self.latest_version()
            m = self._manifest(base)
            out = transform(self.read(base))
            group, st = self._write_group(
                out, m.get("checks"), m.get("bloom_cols"),
                m.get("column_map"),
            )
            meta = self._meta_of(m)
            # a full rewrite's output IS the new table — record its
            # true schema (DML transforms preserve it in practice)
            meta["schema"] = out.schema.jsonValue()
            try:
                self._commit(base + 1, op, [group], {group: st}, meta)
                return base + 1
            except CommitConflict:
                shutil.rmtree(
                    os.path.join(self._data, group), ignore_errors=True
                )
                continue
        raise CommitConflict(f"gave up after {max_retries} retries: {op}")

    def _rewrite_pruned(
        self,
        op: str,
        touched_of,
        transform,
        max_retries: int = 3,
        transform_empty_when_unmatched: bool = False,
    ) -> int:
        """Touched-only copy-on-write (the x153 ANN-upsert discipline
        brought to DML): `touched_of(manifest)` names the groups whose
        stats admit a match; ONLY those are read and transformed into
        one new group, every other group rides into the new manifest
        verbatim — files never opened, never rewritten. Sound because
        DELETE/UPDATE WHERE p is the identity on a group `may_match`
        proves p cannot touch (predicates.py's contract), and MERGE
        cannot match a target row outside the source's key box.

        A DML whose predicate prunes EVERY group still commits (a
        metadata-only version, zero data IO) — SQL UPDATE matching 0
        rows succeeds, and time travel sees one version per statement.
        """
        for _ in range(max_retries + 1):
            base = self.latest_version()
            m = self._manifest(base)
            stats = m.get("stats", {})
            touched = touched_of(m)
            untouched = [g for g in m["file_groups"] if g not in touched]
            new_groups = list(untouched)
            new_stats = {g: stats[g] for g in untouched if g in stats}
            written = None
            if touched or transform_empty_when_unmatched:
                if touched:
                    # manifest-schema read: pre-evolution groups
                    # null-fill newer columns
                    tdf = self._read_groups(m, touched)
                else:
                    # MERGE with no overlapping group still INSERTS the
                    # unmatched source rows: run the transform over an
                    # empty target of the table's schema.
                    tdf = self.read(base).limit(0)
                out = transform(tdf)
                written, st = self._write_group(
                    out, m.get("checks"), m.get("bloom_cols"),
                    m.get("column_map"),
                )
                if st and next(iter(st.values()))[3] == 0:
                    # transform emptied every touched row: drop the
                    # empty group rather than carry a 0-row file
                    shutil.rmtree(
                        os.path.join(self._data, written),
                        ignore_errors=True,
                    )
                    written = None
                else:
                    new_groups.append(written)
                    new_stats[written] = st
            try:
                self._commit(
                    base + 1,
                    f"{op}(pruned {len(touched)}/{len(m['file_groups'])})",
                    new_groups,
                    new_stats,
                    self._meta_of(m),
                )
                return base + 1
            except CommitConflict:
                if written:
                    shutil.rmtree(
                        os.path.join(self._data, written),
                        ignore_errors=True,
                    )
                continue
        raise CommitConflict(f"gave up after {max_retries} retries: {op}")

    @staticmethod
    def _evolve(df: DataFrame, table_schema, merge_schema: bool):
        """Reshape an append batch to the table schema, evolving it
        when allowed. Returns (reshaped df, new schema). Rules (the
        public Delta mergeSchema contract): shared columns must keep
        their exact type (no implicit casts — a silent widening
        corrupts stats comparability); missing table columns null-fill;
        NEW batch columns require merge_schema=True and are appended
        to the schema (older groups null-fill them at read)."""
        from pyspark.sql.types import StructType

        by_name = {f.name: f for f in df.schema.fields}
        sel, out_fields = [], []
        for f in table_schema.fields:
            g = by_name.pop(f.name, None)
            if g is None:
                sel.append(F.lit(None).cast(f.dataType).alias(f.name))
            elif g.dataType != f.dataType:
                raise SchemaMismatch(
                    f"column {f.name!r}: table has "
                    f"{f.dataType.simpleString()}, append batch has "
                    f"{g.dataType.simpleString()}"
                )
            else:
                sel.append(F.col(f.name))
            out_fields.append(f)
        if by_name:
            if not merge_schema:
                raise SchemaMismatch(
                    "append batch adds columns "
                    f"{sorted(by_name)} — pass merge_schema=True"
                )
            for f in df.schema.fields:  # preserve batch order for new
                if f.name in by_name:
                    sel.append(F.col(f.name))
                    out_fields.append(f)
        return df.select(*sel), StructType(out_fields)

    def append(
        self, df: DataFrame, merge_schema: bool = False, op: str | None = None
    ) -> int:
        """Blind append: a NEW file group + manifest extension — existing
        groups are never read or rewritten (the one DML op that stays
        O(batch) at any table size). `merge_schema=True` lets the batch
        add columns: the manifest schema widens, existing groups
        null-fill the new columns at read time, zero data IO
        (Delta's mergeSchema evolution). `op` overrides the committed op
        string — idempotent sinks stamp their delivery id into the log
        (e.g. 'append(batch 3)') and check history before re-appending,
        Delta's txn-version pattern."""
        for _ in range(4):
            base = self.latest_version()
            m = self._manifest(base)
            groups = list(m["file_groups"])
            stats = dict(m.get("stats", {}))
            meta = self._meta_of(m)
            out = df
            if meta.get("schema"):
                from pyspark.sql.types import StructType

                old_names = {
                    f["name"] for f in meta["schema"].get("fields", [])
                }
                out, new_schema = self._evolve(
                    df, StructType.fromJson(meta["schema"]), merge_schema
                )
                # An evolved-in column may not collide with a PHYSICAL
                # file name still in use by a renamed or dropped field —
                # the old groups' bytes under that name would silently
                # surface as the "new" column's values (Delta avoids
                # this with field ids; this engine refuses loudly).
                taken = set(
                    (m.get("column_map") or {}).values()
                ) | set(m.get("dropped_physical") or [])
                clash = [
                    f.name
                    for f in new_schema.fields
                    if f.name not in old_names and f.name in taken
                ]
                if clash:
                    raise SchemaMismatch(
                        f"new column(s) {clash} collide with physical "
                        "file columns of renamed/dropped fields"
                    )
                meta["schema"] = new_schema.jsonValue()
            # (a legacy manifest without a schema keeps legacy reads —
            # first-file schema — rather than guessing one here)
            new, st = self._write_group(
                out, m.get("checks"), m.get("bloom_cols"),
                m.get("column_map"),
            )
            stats[new] = st
            try:
                self._commit(
                    base + 1, op or "append", groups + [new], stats, meta
                )
                return base + 1
            except CommitConflict:
                shutil.rmtree(
                    os.path.join(self._data, new), ignore_errors=True
                )
        raise CommitConflict("append retries exhausted")

    def _touched_by(self, predicate: Pred):
        def touched_of(manifest: dict) -> list[str]:
            stats = manifest.get("stats", {})
            bloom_cols = set(manifest.get("bloom_cols", []))
            lookups = [
                (c, vs)
                for c, vs in required_point_lookups(predicate)
                if c in bloom_cols
            ]
            out = []
            for g in manifest["file_groups"]:
                # a group with no recorded stats is always touched
                if not predicate.may_match(stats.get(g, {})):
                    continue
                if lookups and not self._bloom_admits(g, lookups):
                    continue
                out.append(g)
            return out

        return touched_of

    def _bloom_admits(
        self, group: str, lookups: list[tuple[str, tuple]]
    ) -> bool:
        """Second-stage skip after min/max passes: every required
        point lookup (Eq/IsIn conjunct on a bloom column) must find at
        least one candidate value the group's bloom cannot rule out.
        Missing sidecar or missing column degrades to True (read the
        group) — same soundness posture as missing stats."""
        side = _bloom.read_sidecar(os.path.join(self._data, group))
        for col, values in lookups:
            b = side.get(col)
            if not b:
                continue
            if not any(_bloom.may_contain(b, v) for v in values):
                return False
        return True

    def delete_where(self, predicate: Column | Pred) -> int:
        from gwasdb_spark.gwas.dml import delete_where

        if isinstance(predicate, Pred):
            col = predicate.to_column()
            return self._rewrite_pruned(
                "delete",
                self._touched_by(predicate),
                lambda df: delete_where(df, col),
            )
        return self._rewrite("delete", lambda df: delete_where(df, predicate))

    def update_set(
        self, predicate: Column | Pred, assignments: dict
    ) -> int:
        from gwasdb_spark.gwas.dml import update_set

        if isinstance(predicate, Pred):
            col = predicate.to_column()
            return self._rewrite_pruned(
                "update",
                self._touched_by(predicate),
                lambda df: update_set(df, col, assignments),
            )
        return self._rewrite(
            "update", lambda df: update_set(df, predicate, assignments)
        )

    def merge(self, source: DataFrame, keys: list[str]) -> int:
        """MERGE (source wins on key collision). Pruned by the source's
        key bounding box: one batch-scale aggregate computes min/max of
        every key column over `source`; a target group whose stats are
        disjoint from that box on ANY key dimension cannot hold a
        matching row, so it is carried verbatim. Matched rewrites and
        inserted rows both land in the one new group."""
        from gwasdb_spark.acid.predicates import And, Between
        from gwasdb_spark.gwas.dml import merge_upsert

        aggs = []
        for k in keys:
            aggs += [F.min(k).alias(f"__lo_{k}"), F.max(k).alias(f"__hi_{k}")]
        box = source.agg(*aggs).collect()[0]  # 1-row bounded collect
        bounds = [
            Between(k, box[f"__lo_{k}"], box[f"__hi_{k}"])
            for k in keys
            if box[f"__lo_{k}"] is not None
        ]
        if not bounds:  # empty/all-null source box: no target row matches
            touched_of = lambda m: []  # noqa: E731
        else:
            touched_of = self._touched_by(And(*bounds))
        return self._rewrite_pruned(
            "merge",
            touched_of,
            lambda df: merge_upsert(df, source, keys),
            transform_empty_when_unmatched=True,
        )

    def apply_changes(
        self,
        changes: DataFrame,
        keys: list[str],
        op_col: str = "_op",
        sequence_by: str | None = None,
        op: str | None = None,
    ) -> int:
        """CDC apply — the consumer side of a change feed (Delta's
        APPLY CHANGES pattern): `changes` carries the target columns
        plus `op_col` in {'I','U','D'}; inserts/updates upsert by key
        (source wins), deletes remove their keys. ONE pruned rewrite:
        touched groups = those whose stats intersect the WHOLE change
        batch's key bounding box (upserts and deletes together), so a
        narrow feed touches O(1) groups and untouched files ride the
        manifest verbatim — the same skipping contract as merge/DML.
        Delete keys travel inside the distributed transform (an
        anti-join), never through the driver — the scale path a
        collect-the-keys IsIn predicate would not have.

        Sequencing (Delta's SEQUENCE BY): a batch may carry several ops
        for one key. With `sequence_by` set, only the LATEST op per key
        applies — row_number over the keys ordered by (sequence desc,
        op desc) picks one row deterministically (the op tiebreak makes
        exact-sequence ties reproducible: 'U' > 'I' > 'D'); the sequence
        column is CDC metadata and is dropped before applying. Without
        `sequence_by`, a key appearing more than once in the batch is
        AMBIGUOUS (delete-then-insert vs insert-then-delete differ) and
        raises ValueError rather than resolving nondeterministically."""
        from gwasdb_spark.acid.predicates import And, Between
        from gwasdb_spark.gwas.dml import merge_upsert

        changes = changes.localCheckpoint(eager=False)
        if sequence_by is not None:
            w = Window.partitionBy(*keys).orderBy(
                F.desc(sequence_by), F.desc(op_col)
            )
            changes = (
                changes.withColumn("__seq_rn", F.row_number().over(w))
                .filter(F.col("__seq_rn") == 1)
                .drop("__seq_rn", sequence_by)
                .localCheckpoint(eager=False)
            )
        else:
            dup = (
                changes.groupBy(*keys)
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .collect()  # bounded: at most 1 row
            )
            if dup:
                kv = {k: dup[0][k] for k in keys}
                raise ValueError(
                    f"apply_changes: key {kv} appears more than once in "
                    "the change batch; pass sequence_by= to order the ops"
                )
        ups = changes.filter(F.col(op_col) != "D").drop(op_col)
        dels = changes.filter(F.col(op_col) == "D").select(*keys).distinct()
        aggs = []
        for k in keys:
            aggs += [F.min(k).alias(f"__lo_{k}"), F.max(k).alias(f"__hi_{k}")]
        box = changes.agg(*aggs).collect()[0]  # 1-row bounded collect
        bounds = [
            Between(k, box[f"__lo_{k}"], box[f"__hi_{k}"])
            for k in keys
            if box[f"__lo_{k}"] is not None
        ]
        if not bounds:
            touched_of = lambda m: []  # noqa: E731
        else:
            touched_of = self._touched_by(And(*bounds))

        def transform(df: DataFrame) -> DataFrame:
            return merge_upsert(df.join(dels, keys, "left_anti"), ups, keys)

        return self._rewrite_pruned(
            op or "apply_changes",
            touched_of,
            transform,
            transform_empty_when_unmatched=True,
        )

    # -------------------------------------------------- constraints --
    def checks(self) -> dict:
        """Active CHECK constraints {name: SQL boolean expr}."""
        v = self.latest_version()
        return dict(self._manifest(v).get("checks", {})) if v >= 0 else {}

    def add_check(self, name: str, expr: str, max_retries: int = 3) -> int:
        """ALTER TABLE ADD CONSTRAINT ... CHECK (expr): validates the
        CURRENT snapshot first (one aggregate over the table — the same
        full-scan Delta pays), then commits a metadata-only version;
        every later write is validated against it in `_write_group`.
        Raises CheckViolation (no version committed) if existing rows
        already fail."""
        for _ in range(max_retries + 1):
            base = self.latest_version()
            m = self._manifest(base)
            checks = dict(m.get("checks", {}))
            if name in checks:
                raise ValueError(f"constraint {name!r} already exists")
            bad = _check_violations(self.read(base), {name: expr})
            if bad:
                raise CheckViolation(
                    f"cannot add {name!r}: {bad[name]} existing rows "
                    f"violate {expr}"
                )
            checks[name] = expr
            meta = self._meta_of(m)
            meta["checks"] = checks
            try:
                self._commit(
                    base + 1,
                    f"add_check({name})",
                    m["file_groups"],
                    m.get("stats", {}),
                    meta,
                )
                return base + 1
            except CommitConflict:
                continue  # re-validate against the winner's snapshot
        raise CommitConflict(f"gave up adding check {name!r}")

    def drop_check(self, name: str, max_retries: int = 3) -> int:
        """Metadata-only constraint removal (no data IO)."""
        for _ in range(max_retries + 1):
            base = self.latest_version()
            m = self._manifest(base)
            checks = dict(m.get("checks", {}))
            if name not in checks:
                raise KeyError(f"no constraint named {name!r}")
            del checks[name]
            meta = self._meta_of(m)
            meta["checks"] = checks
            try:
                self._commit(
                    base + 1,
                    f"drop_check({name})",
                    m["file_groups"],
                    m.get("stats", {}),
                    meta,
                )
                return base + 1
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up dropping check {name!r}")

    # ---------------------------------------------- column mapping --
    def _schema_struct(self, m: dict):
        from pyspark.sql.types import StructType

        if not m.get("schema"):
            raise ValueError(
                "rename/drop need a schema-carrying table (legacy "
                "manifests predate schema tracking)"
            )
        return StructType.fromJson(m["schema"])

    @staticmethod
    def _refuse_referenced(m: dict, col: str, verb: str) -> None:
        """Conservative guard: a column referenced by a CHECK constraint
        or carrying a bloom sidecar cannot be renamed/dropped (the
        constraint text and the sidecar key would silently go stale —
        Delta refuses the same way until constraints are dropped)."""
        import re

        for name, expr in (m.get("checks") or {}).items():
            # identifier-boundary match, not raw substring — a column
            # `v` must not be refused because some OTHER identifier in
            # the expression contains a `v` (ADVICE r11)
            if re.search(rf"\b{re.escape(col)}\b", expr):
                raise ValueError(
                    f"cannot {verb} {col!r}: referenced by CHECK "
                    f"{name!r} ({expr}) — drop the constraint first"
                )
        if col in (m.get("bloom_cols") or []):
            raise ValueError(
                f"cannot {verb} {col!r}: it carries bloom sidecars "
                "keyed by the physical name — rebuild without bloom "
                "first"
            )

    def rename_column(
        self, old: str, new: str, max_retries: int = 3
    ) -> int:
        """ALTER TABLE RENAME COLUMN — metadata-only, zero data IO
        (Delta column mapping, public design): the manifest schema
        renames the field and records {logical: physical} in
        `column_map`; data files keep the physical name forever, reads
        alias physical→logical in one free Project, later appends write
        batches under the physical names so every group stays
        uniformly named, and per-group stats re-key so pruning keeps
        working. Time travel is untouched: each manifest carries its
        own schema+map, so read(v) of a pre-rename snapshot surfaces
        the pre-rename name."""
        for _ in range(max_retries + 1):
            base = self.latest_version()
            m = self._manifest(base)
            schema = self._schema_struct(m)
            names = [f.name for f in schema.fields]
            if old not in names:
                raise KeyError(f"no column named {old!r}")
            if new in names:
                raise ValueError(f"column {new!r} already exists")
            cmap = dict(m.get("column_map") or {})
            if new in cmap.values() and cmap.get(old) != new:
                # the renamed column's OWN physical is not a collision —
                # rename(a->b) then rename(b->a) lands back on the
                # physical name and the map entry below simply drops
                # (ADVICE r11: the guard used to fire before the
                # column's own entry was popped)
                raise ValueError(
                    f"{new!r} collides with a physical file column of a "
                    "previously renamed field"
                )
            self._refuse_referenced(m, old, "rename")
            physical = cmap.pop(old, old)
            if new != physical:
                cmap[new] = physical
            fields = []
            for f in schema.fields:
                fields.append(
                    {**f.jsonValue(), "name": new}
                    if f.name == old
                    else f.jsonValue()
                )
            stats = {
                g: {(new if c == old else c): v for c, v in st.items()}
                for g, st in (m.get("stats") or {}).items()
            }
            meta = self._meta_of(m)
            meta["schema"] = {"type": "struct", "fields": fields}
            meta["column_map"] = cmap
            try:
                self._commit(
                    base + 1,
                    f"rename_column({old}->{new})",
                    m["file_groups"],
                    stats,
                    meta,
                )
                return base + 1
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up renaming {old!r}")

    def drop_column(self, col: str, max_retries: int = 3) -> int:
        """ALTER TABLE DROP COLUMN — metadata-only, zero data IO: the
        field leaves the manifest schema (and the column map / stats),
        so reads never even request it from parquet; the bytes stay in
        the immutable files, which is what keeps every pre-drop
        snapshot time-travelable. A later `append(merge_schema=True)`
        adding a column with the same name is refused when it would
        collide with a still-on-disk physical name (Delta solves this
        with field ids; this engine refuses the ambiguous case
        loudly)."""
        for _ in range(max_retries + 1):
            base = self.latest_version()
            m = self._manifest(base)
            schema = self._schema_struct(m)
            names = [f.name for f in schema.fields]
            if col not in names:
                raise KeyError(f"no column named {col!r}")
            if len(names) == 1:
                raise ValueError("cannot drop the only column")
            self._refuse_referenced(m, col, "drop")
            cmap = dict(m.get("column_map") or {})
            physical = cmap.pop(col, col)
            dropped = sorted(
                set(m.get("dropped_physical") or []) | {physical}
            )
            fields = [
                f.jsonValue() for f in schema.fields if f.name != col
            ]
            stats = {
                g: {c: v for c, v in st.items() if c != col}
                for g, st in (m.get("stats") or {}).items()
            }
            meta = self._meta_of(m)
            meta["schema"] = {"type": "struct", "fields": fields}
            meta["column_map"] = cmap
            meta["dropped_physical"] = dropped
            try:
                self._commit(
                    base + 1,
                    f"drop_column({col})",
                    m["file_groups"],
                    stats,
                    meta,
                )
                return base + 1
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up dropping {col!r}")

    def restore(self, version: int, max_retries: int = 3) -> int:
        """RESTORE TABLE TO VERSION (Delta's RESTORE, public design):
        commit a NEW version whose manifest is the target version's —
        data, stats, schema, checks, bloom config all roll back while
        HISTORY is preserved (the bad versions stay time-travelable;
        nothing is deleted, so a restore is itself restorable). O(1)
        data IO: file groups are immutable and shared across manifests,
        the commit is metadata-only. Refuses if any target group has
        been vacuumed away (the retention window bounds how far back a
        restore can reach — same contract as Delta)."""
        target = self._visible_manifest(version)
        missing = [
            g
            for g in target["file_groups"]
            if not os.path.isdir(os.path.join(self._data, g))
        ]
        if missing:
            raise FileNotFoundError(
                f"restore({version}): {len(missing)} file group(s) "
                f"vacuumed away ({missing[:3]}...)"
            )
        for _ in range(max_retries + 1):
            base = self.latest_version()
            try:
                self._commit(
                    base + 1,
                    f"restore({version})",
                    list(target["file_groups"]),
                    dict(target.get("stats", {})),
                    self._meta_of(target),
                )
                return base + 1
            except CommitConflict:
                continue
        raise CommitConflict(f"restore({version}) retries exhausted")

    # --------------------------------------------------- maintenance --
    def compact(self, small_rows: int = 100_000) -> int:
        """Small-file compaction (Delta OPTIMIZE's file-count half):
        merge every group holding fewer than `small_rows` rows into ONE
        new group; big groups ride the manifest verbatim (mtime-stable,
        like every pruned rewrite). Logically a no-op — the committed
        snapshot reads identically — but a table fed by streaming
        micro-batch appends (st14/st18 shape) accretes one tiny group
        per batch, and at 100 TB the scheduler cost of a million tiny
        files dwarfs the data. Returns the committed version (or the
        current one when <2 groups qualify — nothing to merge)."""
        base = self.latest_version()
        m = self._manifest(base)
        stats = m.get("stats", {})

        def rows_of(g: str) -> int | None:
            st = stats.get(g)
            if not st:
                return None  # unknown size: leave it alone
            return next(iter(st.values()))[3]

        small = [
            g
            for g in m["file_groups"]
            if rows_of(g) is not None and rows_of(g) < small_rows
        ]
        if len(small) < 2:
            return base
        # op surfaces as "compact(pruned k/n)": k merged, n-k untouched
        return self._rewrite_pruned(
            "compact",
            lambda manifest: [g for g in small if g in manifest["file_groups"]],
            lambda df: df,
        )

    def cluster_by(self, col: str, n_groups: int = 8) -> int:
        """Range-cluster the WHOLE table into `n_groups` file groups
        with non-overlapping `col` stats — the data-layout half of
        Delta OPTIMIZE ZORDER / liquid clustering, reduced to the one
        dimension that matters for this engine's skipping: after
        clustering, a range predicate on `col` prunes to O(1) groups
        no matter how interleaved the ingest order was. Logically a
        no-op (same rows); physically a full rewrite (that is the
        point — pay once, skip forever).

        Mechanics: exact quantile boundaries (approxQuantile with
        relativeError=0 — deterministic), one staging write partitioned
        by the computed bucket, then each bucket directory is RENAMED
        into place as its own file group (one data pass total, no
        per-bucket rescans). Empty buckets (duplicate-heavy boundaries)
        are skipped; the op string records the real group count."""
        base = self.latest_version()
        meta = self._manifest(base)
        snap = self.read(base)
        qs = [i / n_groups for i in range(1, n_groups)]
        bounds = sorted(set(snap.approxQuantile(col, qs, 0.0)))
        bucket = F.lit(0)
        for i, b in enumerate(bounds):
            bucket = F.when(F.col(col) > F.lit(b), i + 1).otherwise(bucket)
        return self._relayout(
            snap.withColumn("__bucket", bucket),
            lambda n: f"cluster({col}, {n})",
            base,
            meta,
        )

    def cluster_by_zorder(
        self, cols: list[str], n_groups: int = 16, tiles: int = 16
    ) -> int:
        """Multi-dimensional Z-order clustering — the full form of what
        `cluster_by` does for one dimension. Each clustering column is
        quantized to `tiles` rank tiles (exact quantile boundaries, all
        columns in ONE approxQuantile pass), the per-column tile ids are
        BIT-INTERLEAVED into a Z-value (Morton code — nearby points in
        any dimension get nearby Z-values), and the table is rewritten
        into `n_groups` Z-range file groups. After the rewrite a box
        predicate on ANY subset of the clustering columns prunes by the
        per-group min/max stats: the Morton curve keeps each group's
        bounding box compact in every interleaved dimension, instead of
        compact in one and full-range in the rest (the 1-D clustering
        failure mode for multi-column probes). Same guarantees as
        cluster_by: logically a no-op, one staging pass, version race
        aborts rather than blind-retrying. This is Delta OPTIMIZE
        ZORDER's layout, native over the parquet log."""
        base = self.latest_version()
        meta = self._manifest(base)
        snap = self.read(base)
        bits = max(1, (int(tiles) - 1).bit_length())
        qs = [i / tiles for i in range(1, tiles)]
        all_bounds = snap.approxQuantile(list(cols), qs, 0.0)
        tile_exprs = []
        for col, raw in zip(cols, all_bounds):
            bounds = sorted(set(raw))
            t = F.lit(0)
            for i, b in enumerate(bounds):
                t = F.when(F.col(col) > F.lit(b), i + 1).otherwise(t)
            tile_exprs.append(t.cast("long"))
        z = F.lit(0).cast("long")
        for i in range(bits):
            for j, t in enumerate(tile_exprs):
                z = z + F.shiftleft(
                    F.shiftright(t, i).bitwiseAND(F.lit(1)),
                    i * len(cols) + j,
                )
        zdf = snap.withColumn("__z", z)
        zq = [i / n_groups for i in range(1, n_groups)]
        zbounds = sorted(set(zdf.approxQuantile("__z", zq, 0.0)))
        bucket = F.lit(0)
        for i, b in enumerate(zbounds):
            bucket = F.when(F.col("__z") > F.lit(b), i + 1).otherwise(bucket)
        return self._relayout(
            zdf.withColumn("__bucket", bucket).drop("__z"),
            lambda n: f"zorder({','.join(cols)}, {n})",
            base,
            meta,
        )

    def _relayout(self, bucketed, op_of, base: int, meta: dict) -> int:
        """Shared full-rewrite layout mechanics: stage `bucketed`
        (carrying a __bucket column) partitioned by bucket, rename each
        bucket directory into place as a file group, recompute stats and
        bloom sidecars, commit. `op_of(n_groups)` names the commit."""
        staging = os.path.join(self._data, f".cluster-{uuid.uuid4().hex}")
        try:
            bucketed.write.mode("overwrite").partitionBy("__bucket").parquet(
                staging
            )
            new_groups: list[str] = []
            new_stats: dict = {}
            # ONE grouped aggregate over the staged tree computes every
            # bucket's stats (r13, guide §1.4: the old loop re-read and
            # re-aggregated each bucket directory separately — one scan
            # job PER group, 8-16 extra jobs per cluster/zorder commit).
            # Same aggregates, same just-written files, grouped by the
            # staging partition column instead of per-dir reads.
            # Explicit schema: an emptied table (delete-all then
            # cluster/zorder) stages ZERO parquet files, and schema
            # inference over the bare dir raises UNABLE_TO_INFER_SCHEMA
            # (ADVICE r13 medium). The staged tree is `bucketed`'s own
            # rows, so its schema is authoritative either way.
            back_all = self.spark.read.schema(bucketed.schema).parquet(
                staging
            )
            stat_cols = [
                f.name
                for f in back_all.schema.fields
                if f.name != "__bucket"
                and (
                    f.dataType.typeName() in (
                        "byte", "short", "integer", "long", "float",
                        "double", "string", "boolean", "date", "timestamp",
                        "timestamp_ntz",
                    )
                    or f.dataType.typeName().startswith("decimal")
                )
            ]
            aggs = [F.count(F.lit(1)).alias("__rows")]
            for c in stat_cols:
                aggs += [
                    F.min(c).alias(f"__min_{c}"),
                    F.max(c).alias(f"__max_{c}"),
                    F.count(c).alias(f"__cnt_{c}"),
                ]
            bucket_rows = {
                str(r["__bucket"]): r
                for r in back_all.groupBy("__bucket").agg(*aggs).collect()
            }  # ≤ n_groups rows — bounded collect
            for name in sorted(os.listdir(staging)):
                if not name.startswith("__bucket="):
                    continue
                row = bucket_rows.get(name.split("=", 1)[1])
                group = uuid.uuid4().hex
                os.rename(
                    os.path.join(staging, name),
                    os.path.join(self._data, group),
                )
                rows = int(row["__rows"]) if row is not None else 0
                st = {
                    c: [
                        _json_safe(row[f"__min_{c}"]),
                        _json_safe(row[f"__max_{c}"]),
                        rows - int(row[f"__cnt_{c}"] or 0),
                        rows,
                    ]
                    for c in stat_cols
                } if row is not None else {}
                if st and rows == 0:
                    shutil.rmtree(
                        os.path.join(self._data, group), ignore_errors=True
                    )
                    continue
                new_groups.append(group)
                new_stats[group] = st
                # layout change only (rows already validated at their
                # original commits — checks need no re-run), but bloom
                # sidecars are per-group artifacts and must be rebuilt
                # for the new grouping
                bcols = meta.get("bloom_cols") or []
                if bcols:
                    gpath = os.path.join(self._data, group)
                    back = self.spark.read.parquet(gpath)
                    elig = _bloom.bloom_eligible_columns(back, bcols)
                    rows = next(iter(st.values()))[3] if st else 0
                    if elig and rows:
                        _bloom.write_sidecar(
                            gpath,
                            {
                                c: _bloom.build_bloom(back, c, rows)
                                for c in elig
                            },
                        )
            try:
                self._commit(
                    base + 1,
                    op_of(len(new_groups)),
                    new_groups,
                    new_stats,
                    self._meta_of(meta),
                )
                return base + 1
            except CommitConflict:
                # A rewrite CANNOT blind-retry here: the clustered data
                # was derived from `base`, and committing it over a
                # racing writer's version would silently drop their
                # rows. Clean up and let the caller re-run cluster_by
                # against the new snapshot (maintenance jobs normally
                # hold exclusivity anyway).
                for g in new_groups:
                    shutil.rmtree(
                        os.path.join(self._data, g), ignore_errors=True
                    )
                raise
        finally:
            shutil.rmtree(staging, ignore_errors=True)

    # --------------------------------------------------------- vacuum --
    def vacuum(
        self, keep_last: int = 2, grace_seconds: float = 3600.0
    ) -> list[str]:
        """Drop data groups (and manifests) referenced ONLY by versions
        older than the retained tail. Refuses to break any retained
        snapshot by construction: the keep set is the union of retained
        manifests' groups.

        Concurrent-writer safety (ADVICE r9): a group named by NO
        manifest at all is ambiguous — it is either leaked garbage from
        a crashed writer or a LIVE in-flight write whose commit has not
        landed yet; deleting it in the second case corrupts the table
        the moment that commit links. Like Delta's vacuum retention
        window, unreferenced groups are only removed once older than
        `grace_seconds` (newest mtime under the group dir) — any sane
        grace exceeds a write-then-commit gap by orders of magnitude.
        Groups named by a pre-cutoff manifest are committed HISTORY and
        removable at any age (the retained log no longer reaches them).
        """
        import time

        latest = self.latest_version()
        if latest < 0:
            return []
        cutoff = max(0, latest - keep_last + 1)
        keep: set[str] = set()
        ever_named: set[str] = set()
        for v in range(latest + 1):
            if os.path.exists(self._manifest_path(v)):
                groups = self._manifest(v)["file_groups"]
                ever_named.update(groups)
                if v >= cutoff:
                    keep.update(groups)
        now = time.time()
        removed = []
        for g in os.listdir(self._data) if os.path.isdir(self._data) else []:
            if g in keep:
                continue
            if g not in ever_named:
                gdir = os.path.join(self._data, g)
                try:
                    newest = max(
                        os.stat(os.path.join(gdir, f)).st_mtime
                        for f in [*os.listdir(gdir), "."]
                    )
                except OSError:
                    continue  # racing its own writer's mkdir — skip
                if now - newest < grace_seconds:
                    continue  # possibly in-flight: not ours to reap yet
            shutil.rmtree(os.path.join(self._data, g), ignore_errors=True)
            removed.append(g)
        for v in range(cutoff):
            p = self._manifest_path(v)
            if os.path.exists(p):
                os.unlink(p)
        return removed
