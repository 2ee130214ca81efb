"""Mergeable distinct-count sketches (Apache DataSketches HLL, built into
Spark SQL since 3.5): build per-group sketches ONCE, then roll them up to any
coarser grouping by unioning binary sketches — no re-scan of the data.

This is the 100 TB distinct-count pattern: exact count_distinct re-shuffles
raw values for every grouping level, while a persisted sketch column (a few
KB per group) answers every rollup by sketch union.  Estimates carry HLL's
~1-2% relative error at the default lgConfigK.

No DuckDB oracle is possible (sketch binaries are engine-specific), so these
ops are test-gated against exact counts (relative-error bound) instead of
hash-gated — the documented weaker-check class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = ["distinct_sketches", "rollup_sketches", "sketch_estimate"]


def _sdf(frame):
    return frame if isinstance(frame, SparkDF) else frame.spark


def distinct_sketches(
    frame: "LazyFrame | SparkDF",
    value_col: str,
    by: "str | list[str] | None" = None,
    lg_k: int = 12,
    sketch_col: str = "sketch",
) -> LazyFrame:
    """One HLL sketch (binary) per ``by`` group over ``value_col`` — a
    map-side-combining aggregate; persist the result as the reusable
    distinct-count cube base."""
    sdf = _sdf(frame)
    keys = [by] if isinstance(by, str) else list(by or [])
    agg = F.hll_sketch_agg(F.col(value_col), F.lit(int(lg_k))).alias(sketch_col)
    out = sdf.groupBy(*keys).agg(agg) if keys else sdf.agg(agg)
    return LazyFrame(out)


def rollup_sketches(
    sketches: "LazyFrame | SparkDF",
    by: "str | list[str] | None" = None,
    sketch_col: str = "sketch",
) -> LazyFrame:
    """Union per-group sketches up to a coarser grouping (``by`` must be a
    subset of the original keys; ``None`` = grand total) — touches only the
    sketch rows, never the raw data."""
    sdf = _sdf(sketches)
    keys = [by] if isinstance(by, str) else list(by or [])
    agg = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    out = sdf.groupBy(*keys).agg(agg) if keys else sdf.agg(agg)
    return LazyFrame(out)


def sketch_estimate(
    sketches: "LazyFrame | SparkDF",
    sketch_col: str = "sketch",
    estimate_col: str = "approx_distinct",
) -> LazyFrame:
    """Materialize the distinct-count estimate column from a sketch column
    (keeps every other column)."""
    sdf = _sdf(sketches)
    out = sdf.withColumn(estimate_col, F.hll_sketch_estimate(F.col(sketch_col)))
    return LazyFrame(out)
