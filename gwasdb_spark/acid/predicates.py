"""Sargable predicate specs for file-group pruning (the Iceberg
`Expressions` / Delta data-skipping design, public knowledge): a tiny
AST that compiles BOTH to a Spark Column (exact row-level evaluation)
and to a three-valued `may_match` test over a file group's per-column
[min, max, null_count] stats (group-level skipping).

Soundness contract — the only property pruning correctness rests on:
`may_match(stats) is False` ⇒ NO row in that group satisfies the
predicate. The reverse is never assumed (True just means "cannot rule
it out"); any uncertainty (missing column stats, cross-type
comparison, an operator with no stats semantics) degrades to True,
i.e. the group is read. DELETE/UPDATE with predicate p are identity on
any group where no row matches p, so a pruned copy-on-write rewrite
that carries may_match==False groups over verbatim commits the exact
same table as a full rewrite — files untouched, bytes unmoved.

Reference analog: the reference's row-level SQL DML relies on Postgres
indexes to touch only matching heap pages (R/postgres_process.Rmd:119);
min/max skipping is the lakehouse equivalent at 100 TB.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# stats shape per group: {col: [lo, hi, null_count, row_count]}
# lo/hi are None when every value in the group is NULL.


def _norm(v):
    """JSON-safe canonical literal: dates/timestamps to ISO strings so a
    spec value compares against stored stats with plain <=."""
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def _comparable(a, b) -> bool:
    """Same comparison family? Numbers compare across int/float; strings
    with strings. Anything else → not comparable → no pruning."""
    num = (int, float)
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    if isinstance(a, num) and isinstance(b, num):
        return True
    return isinstance(a, str) and isinstance(b, str)


class Pred:
    """Base: a predicate usable as AcidTable DML's `predicate` argument."""

    def to_column(self) -> Column:
        raise NotImplementedError

    def may_match(self, stats: dict) -> bool:
        raise NotImplementedError

    def columns(self) -> set[str]:
        raise NotImplementedError


def _bounds(stats: dict, col: str):
    """(lo, hi, nulls, rows) or None when the group has no stats for col
    (schema drift, non-orderable type) — caller must degrade to True."""
    s = stats.get(col)
    if not isinstance(s, (list, tuple)) or len(s) != 4:
        return None
    return tuple(s)


@dataclass(frozen=True)
class _Cmp(Pred):
    col: str
    value: object

    def __post_init__(self):
        object.__setattr__(self, "value", _norm(self.value))

    def columns(self) -> set[str]:
        return {self.col}

    def _range_test(self, lo, hi) -> bool:
        raise NotImplementedError

    def may_match(self, stats: dict) -> bool:
        b = _bounds(stats, self.col)
        if b is None:
            return True
        lo, hi, nulls, rows = b
        if lo is None:  # all-NULL group: no comparison can be satisfied
            return False
        if not (_comparable(lo, self.value) and _comparable(hi, self.value)):
            return True
        return self._range_test(lo, hi)


class Eq(_Cmp):
    def to_column(self) -> Column:
        return F.col(self.col) == F.lit(self.value)

    def _range_test(self, lo, hi) -> bool:
        return lo <= self.value <= hi


class Ne(_Cmp):
    def to_column(self) -> Column:
        return F.col(self.col) != F.lit(self.value)

    def _range_test(self, lo, hi) -> bool:
        # only an entirely-constant group pinned to the value is ruled out
        return not (lo == hi == self.value)


class Lt(_Cmp):
    def to_column(self) -> Column:
        return F.col(self.col) < F.lit(self.value)

    def _range_test(self, lo, hi) -> bool:
        return lo < self.value


class Le(_Cmp):
    def to_column(self) -> Column:
        return F.col(self.col) <= F.lit(self.value)

    def _range_test(self, lo, hi) -> bool:
        return lo <= self.value


class Gt(_Cmp):
    def to_column(self) -> Column:
        return F.col(self.col) > F.lit(self.value)

    def _range_test(self, lo, hi) -> bool:
        return hi > self.value


class Ge(_Cmp):
    def to_column(self) -> Column:
        return F.col(self.col) >= F.lit(self.value)

    def _range_test(self, lo, hi) -> bool:
        return hi >= self.value


@dataclass(frozen=True)
class Between(Pred):
    col: str
    lo_value: object
    hi_value: object  # inclusive both ends, like SQL BETWEEN

    def __post_init__(self):
        object.__setattr__(self, "lo_value", _norm(self.lo_value))
        object.__setattr__(self, "hi_value", _norm(self.hi_value))

    def columns(self) -> set[str]:
        return {self.col}

    def to_column(self) -> Column:
        return F.col(self.col).between(
            F.lit(self.lo_value), F.lit(self.hi_value)
        )

    def may_match(self, stats: dict) -> bool:
        b = _bounds(stats, self.col)
        if b is None:
            return True
        lo, hi, nulls, rows = b
        if lo is None:
            return False
        if not (
            _comparable(lo, self.lo_value) and _comparable(hi, self.hi_value)
        ):
            return True
        return hi >= self.lo_value and lo <= self.hi_value


@dataclass(frozen=True)
class IsIn(Pred):
    col: str
    values: tuple

    def __init__(self, col: str, values):
        object.__setattr__(self, "col", col)
        object.__setattr__(self, "values", tuple(_norm(v) for v in values))

    def columns(self) -> set[str]:
        return {self.col}

    def to_column(self) -> Column:
        return F.col(self.col).isin(list(self.values))

    def may_match(self, stats: dict) -> bool:
        b = _bounds(stats, self.col)
        if b is None:
            return True
        lo, hi, nulls, rows = b
        if lo is None:
            return False
        for v in self.values:
            if not (_comparable(lo, v) and _comparable(hi, v)):
                return True
            if lo <= v <= hi:
                return True
        return False


@dataclass(frozen=True)
class IsNull(Pred):
    col: str

    def columns(self) -> set[str]:
        return {self.col}

    def to_column(self) -> Column:
        return F.col(self.col).isNull()

    def may_match(self, stats: dict) -> bool:
        b = _bounds(stats, self.col)
        if b is None:
            return True
        return b[2] > 0


@dataclass(frozen=True)
class NotNull(Pred):
    col: str

    def columns(self) -> set[str]:
        return {self.col}

    def to_column(self) -> Column:
        return F.col(self.col).isNotNull()

    def may_match(self, stats: dict) -> bool:
        b = _bounds(stats, self.col)
        if b is None:
            return True
        lo, hi, nulls, rows = b
        return nulls < rows


@dataclass(frozen=True)
class And(Pred):
    children: tuple

    def __init__(self, *children: Pred):
        object.__setattr__(self, "children", tuple(children))

    def columns(self) -> set[str]:
        return set().union(*(c.columns() for c in self.children))

    def to_column(self) -> Column:
        out = self.children[0].to_column()
        for c in self.children[1:]:
            out = out & c.to_column()
        return out

    def may_match(self, stats: dict) -> bool:
        return all(c.may_match(stats) for c in self.children)


def required_point_lookups(pred: "Pred") -> list[tuple[str, tuple]]:
    """(col, candidate-values) pairs every matching row MUST satisfy —
    the sound extraction for bloom-filter probing. Eq/IsIn contribute
    directly; And contributes all children's requirements (a conjunct
    is individually necessary); Or and range forms contribute nothing
    (a disjunct is not necessary, a range is not enumerable). A group
    whose bloom proves any required lookup empty holds no matching
    row."""
    if isinstance(pred, Eq):
        return [] if pred.value is None else [(pred.col, (pred.value,))]
    if isinstance(pred, IsIn):
        vals = tuple(v for v in pred.values if v is not None)
        # isin(NULL) never matches a row, so dropping Nones is sound
        return [(pred.col, vals)] if vals else []
    if isinstance(pred, And):
        return [
            r for c in pred.children for r in required_point_lookups(c)
        ]
    return []


@dataclass(frozen=True)
class Or(Pred):
    children: tuple

    def __init__(self, *children: Pred):
        object.__setattr__(self, "children", tuple(children))

    def columns(self) -> set[str]:
        return set().union(*(c.columns() for c in self.children))

    def to_column(self) -> Column:
        out = self.children[0].to_column()
        for c in self.children[1:]:
            out = out | c.to_column()
        return out

    def may_match(self, stats: dict) -> bool:
        return any(c.may_match(stats) for c in self.children)
