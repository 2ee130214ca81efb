"""pivot — wide reshape with the reference's 9 agg codes (SURVEY §2.5).

/root/reference native_shim/src/eager.rs:554-605: agg ∈ {first, sum, min, max,
mean, median, count, len, last}; ``pivot_stable`` column order (eager.rs:593)
→ we sort the distinct pivot values before passing them to Spark's pivot,
which both stabilizes order and skips Spark's internal distinct-collect pass.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = ["pivot"]

_AGGS = {
    "first": lambda c: F.first(c, ignorenulls=False),
    "last": lambda c: F.last(c, ignorenulls=False),
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "mean": F.avg,
    "median": F.median,
    "count": F.count,
    "len": lambda c: F.count(F.lit(1)),
}


def pivot(
    lf: LazyFrame,
    index: "str | Sequence[str]",
    columns: str,
    values: str,
    aggregate_function: str = "first",
) -> LazyFrame:
    if aggregate_function not in _AGGS:
        raise ValueError(f"unknown pivot agg {aggregate_function!r}; valid: {sorted(_AGGS)}")
    idx = [index] if isinstance(index, str) else list(index)
    sdf = lf._sdf
    distinct_vals = sorted(
        r[0] for r in sdf.select(columns).distinct().collect() if r[0] is not None
    )
    agg = _AGGS[aggregate_function](F.col(values))
    out = sdf.groupBy(*[F.col(c) for c in idx]).pivot(columns, distinct_vals).agg(agg)
    return LazyFrame(out)
