"""Selector: column-set algebra resolved client-side against a schema.

Mirrors /root/reference native_shim/src/selectors.rs — by name pattern/regex/
dtype with union/intersect/difference/complement (selectors.rs:212-264) — but
needs no engine object: a Selector is a predicate over (name, dtype) pairs,
resolved eagerly against ``df.schema`` and expanded to column names
(SURVEY §2.3).
"""

from __future__ import annotations

import re
from typing import Callable, Sequence

from pyspark.sql import types as T

from .exprs import Expr, col

__all__ = [
    "Selector",
    "all_",
    "exclude",
    "starts_with",
    "ends_with",
    "contains",
    "matches",
    "by_dtype",
    "numeric",
    "string",
    "temporal",
    "boolean",
    "list_",
    "struct_",
]


class Selector:
    def __init__(self, pred: Callable[[str, T.DataType], bool]):
        self._pred = pred

    # set algebra (selectors.rs:213-264)
    def __and__(self, other: "Selector") -> "Selector":
        return Selector(lambda n, t: self._pred(n, t) and other._pred(n, t))

    def __or__(self, other: "Selector") -> "Selector":
        return Selector(lambda n, t: self._pred(n, t) or other._pred(n, t))

    def __sub__(self, other: "Selector") -> "Selector":
        return Selector(lambda n, t: self._pred(n, t) and not other._pred(n, t))

    def __invert__(self) -> "Selector":
        return Selector(lambda n, t: not self._pred(n, t))

    def resolve(self, schema: T.StructType) -> list[str]:
        return [f.name for f in schema.fields if self._pred(f.name, f.dataType)]

    def to_exprs(self, schema: T.StructType) -> list[Expr]:
        """selector → exprs (selectors.rs:270-279)."""
        return [col(n) for n in self.resolve(schema)]

    def map_cols(self, schema: T.StructType, fn: Callable[[Expr], Expr]) -> list[Expr]:
        """Apply fn to every selected column, keeping names
        (reference MapCols, Polars.FSharp/Exprs.fs:538-563)."""
        return [fn(col(n)).alias(n) for n in self.resolve(schema)]


def all_() -> Selector:
    return Selector(lambda n, t: True)


def exclude(*names: str) -> Selector:
    ns = set(names)
    return Selector(lambda n, t: n not in ns)


def starts_with(prefix: str) -> Selector:
    return Selector(lambda n, t: n.startswith(prefix))


def ends_with(suffix: str) -> Selector:
    return Selector(lambda n, t: n.endswith(suffix))


def contains(sub: str) -> Selector:
    return Selector(lambda n, t: sub in n)


def matches(pattern: str) -> Selector:
    rx = re.compile(pattern)
    return Selector(lambda n, t: rx.search(n) is not None)


def by_dtype(*dtypes: type) -> Selector:
    return Selector(lambda n, t: isinstance(t, tuple(dtypes)))


def numeric() -> Selector:
    return by_dtype(T.NumericType)


def string() -> Selector:
    return by_dtype(T.StringType)


def temporal() -> Selector:
    return by_dtype(T.DateType, T.TimestampType, T.TimestampNTZType)


def boolean() -> Selector:
    return by_dtype(T.BooleanType)


def list_() -> Selector:
    return by_dtype(T.ArrayType)


def struct_() -> Selector:
    return by_dtype(T.StructType)
