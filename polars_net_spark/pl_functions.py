"""polars top-level convenience functions (pl.len / pl.sum("x") / pl.struct
/ ...): thin named-aggregate wrappers over the Expr surface.  A separate
module so the polars-named builtin shadows (len/sum/min/max) never leak into
exprs.py's own namespace."""

from __future__ import annotations

import builtins
from typing import Sequence

from pyspark.sql import functions as F

from .exprs import Expr, _c, _wrap, col



def len() -> Expr:  # noqa: A001 — polars name
    """pl.len(): group/frame row count including nulls, named 'len'."""
    return _wrap(F.count(F.lit(1)).alias("len"))


def count(name: str | None = None) -> Expr:
    """pl.count("x") == col("x").count(); bare pl.count() == pl.len()."""
    if name is None:
        return _wrap(F.count(F.lit(1)).alias("count"))
    return _wrap(F.count(F.col(name)).alias(name))


def _named_agg(name, fn):
    return _wrap(fn(F.col(name)).alias(name))


def sum(name: str) -> Expr:  # noqa: A001 — polars name
    """pl.sum("x"): column sum keeping the column's name (polars)."""
    return _named_agg(name, F.sum)


def mean(name: str) -> Expr:
    return _named_agg(name, F.avg)


def min(name: str) -> Expr:  # noqa: A001 — polars name
    return _named_agg(name, F.min)


def max(name: str) -> Expr:  # noqa: A001 — polars name
    return _named_agg(name, F.max)


def median(name: str) -> Expr:
    return _named_agg(name, F.median)


def std(name: str, ddof: int = 1) -> Expr:
    return _wrap((F.stddev_samp if ddof == 1 else F.stddev_pop)(F.col(name)).alias(name))


def var(name: str, ddof: int = 1) -> Expr:
    return _wrap((F.var_samp if ddof == 1 else F.var_pop)(F.col(name)).alias(name))


def first(name: str) -> Expr:
    """pl.first("x") == col("x").first().  (Bare pl.first() — 'the frame's
    first column' — needs schema context an unbound Expr doesn't have; pass
    the name.)"""
    return _wrap(F.first(F.col(name), ignorenulls=False).alias(name))


def last(name: str) -> Expr:
    return _wrap(F.last(F.col(name), ignorenulls=False).alias(name))


def n_unique(name: str) -> Expr:
    return _wrap(F.countDistinct(F.col(name)).alias(name))


def approx_n_unique(name: str) -> Expr:
    return _wrap(F.approx_count_distinct(F.col(name)).alias(name))


def implode(name: str) -> Expr:
    return _wrap(F.collect_list(F.col(name)).alias(name))


def quantile(name: str, q: float, interpolation: str = "nearest") -> Expr:
    return _wrap(_c(col(name).quantile(q, interpolation)).alias(name))


def struct(*exprs: "Expr | str", schema: "Sequence[str] | None" = None) -> Expr:
    """pl.struct: pack columns/expressions into one struct column."""
    flat: list = []
    for e in exprs:
        if isinstance(e, (list, tuple)):
            flat.extend(e)
        else:
            flat.append(e)
    cols = [F.col(e) if isinstance(e, str) else _c(e) for e in flat]
    if schema is not None:
        if builtins.len(schema) != builtins.len(cols):
            raise ValueError("schema must name every field")
        cols = [c.alias(n) for c, n in zip(cols, schema)]
    return _wrap(F.struct(*cols))
