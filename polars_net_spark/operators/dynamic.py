"""group_by_dynamic — time-bucketed grouping (SURVEY §2.5).

Semantics from /root/reference native_shim/src/lazy.rs:187-273 and the oracle
Polars.CSharp.Tests/TimeSeriesTests.cs:8-131:

- ``every``: bucket stride; ``period``: bucket width (default = every; wider →
  sliding windows, rows belong to several buckets); ``offset``: shift origin.
- ``closed``: which boundary of [start, end) includes points (left default).
- ``label``: which boundary names the output index column (left default;
  "datapoint" = first point in the bucket).
- ``include_boundaries``: emit _lower_boundary/_upper_boundary columns.
- ``start_by``: "window" aligns buckets to the epoch grid; "datapoint" starts
  the grid at the first data point.

Spark mapping: ``F.window(ts, period, every, offset)`` assigns each row its
window struct(s) — tumbling or sliding — with [start, end) membership.
``closed="right"`` is handled by bucketing ``ts - 1µs`` (the reference's own
boundary trick, SURVEY §2.5); empty buckets are never emitted (same as polars).
All work is one shuffle on (window, keys) — scales like any groupBy.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F

from .._fmt import duration_to_interval, parse_polars_duration_us
from ..exprs import _c
from ..frame import LazyFrame

__all__ = ["DynamicGroupBy"]


class DynamicGroupBy:
    def __init__(
        self,
        lf: LazyFrame,
        index_column: str,
        every: str,
        period: str | None,
        offset: str | None,
        closed: str,
        label: str,
        include_boundaries: bool,
        group_by: Sequence[str],
        start_by: str,
    ):
        if closed not in ("left", "right", "both", "none"):
            raise ValueError(f"unknown closed {closed!r}")
        self._lf = lf
        self._index = index_column
        self._every = every
        self._period = period or every
        self._offset = offset
        self._closed = closed
        self._label = label
        self._include_boundaries = include_boundaries
        self._group_by = list(group_by)
        self._start_by = start_by

    def agg(self, *aggs, **named_aggs) -> LazyFrame:
        from ..frame import _flatten

        if self._every.endswith("i"):
            return self._agg_int(aggs, named_aggs)

        sdf = self._lf._sdf
        ts = F.col(self._index)
        # defensive cast for epoch math: parquet tz-naive timestamps read as
        # TIMESTAMP_NTZ and unix_micros rejects NTZ (the q37/NTZ hazard class);
        # wall-clock-preserving under the UTC session tz
        ts_epoch = ts.cast("timestamp")

        every_iv = duration_to_interval(self._every)
        period_iv = duration_to_interval(self._period)

        offset_us = 0
        if self._offset:
            offset_us = parse_polars_duration_us(self._offset)
        weekdays = ["monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday"]
        if self._start_by in weekdays:
            # align the grid to the given weekday: epoch (1970-01-01) was a
            # Thursday, so Monday = epoch + 4 days, … (mod 1 week)
            w = weekdays.index(self._start_by)
            offset_us += ((w - 3) % 7) * 86_400_000_000
        rel_col = None  # per-group grid shift (start_by='datapoint' with keys)
        if self._start_by == "datapoint":
            every_us = parse_polars_duration_us(self._every)
            if self._group_by:
                # polars anchors EACH group's grid at that group's first data
                # point (dynamic windows are computed per group).  Constant
                # start_time can't vary per row, so: shift each row by its
                # group's (min_ts mod every), bucket on the epoch grid, and
                # shift the window boundaries back afterwards.  One extra
                # key-partitioned window pass — same shuffle key as the
                # grouping itself, no driver round-trip.
                from pyspark.sql import Window

                gmin = F.min(F.unix_micros(ts_epoch)).over(
                    Window.partitionBy(*[F.col(k) for k in self._group_by])
                )
                rel_col = "__rel__"
                sdf = sdf.withColumn(rel_col, F.pmod(gmin, F.lit(every_us)))
            else:
                # ungrouped: a single scalar anchor — fold min(ts) into the
                # constant offset (scalar-sized driver fetch, not data)
                min_ts = sdf.agg(F.min(ts).alias("m")).collect()[0][0]
                if min_ts is None:
                    raise ValueError("empty frame for start_by='datapoint'")
                if min_ts.tzinfo is None:
                    # NTZ collect gives a naive datetime; .timestamp() would
                    # interpret it in the driver's LOCAL tz — pin to UTC
                    import datetime as _dt

                    min_ts = min_ts.replace(tzinfo=_dt.timezone.utc)
                epoch_us = int(min_ts.timestamp() * 1_000_000)
                offset_us += epoch_us % every_us
        elif self._start_by != "window" and self._start_by not in weekdays:
            raise ValueError(f"unknown start_by {self._start_by!r}")

        start_time = f"{offset_us} microseconds" if offset_us else "0 seconds"
        ts_us = F.unix_micros(ts_epoch)
        if rel_col is not None:
            ts_us = ts_us - F.col(rel_col)
        ts_left = F.timestamp_micros(ts_us) if rel_col is not None else ts  # [start, end)
        ts_right = F.timestamp_micros(ts_us - 1)  # (start, end]
        win_left = F.window(ts_left, period_iv, every_iv, start_time)
        win_right = F.window(ts_right, period_iv, every_iv, start_time)
        if self._closed == "left":
            assigned = sdf.withColumn("__w__", win_left)
        elif self._closed == "right":
            assigned = sdf.withColumn("__w__", win_right)
        elif self._closed == "both":
            # boundary points belong to BOTH adjacent windows: union the left
            # and right assignments; non-boundary rows produce the same window
            # twice → distinct on (window, row identity)
            tagged = sdf.withColumn("__rid__", F.monotonically_increasing_id())
            assigned = (
                tagged.withColumn("__w__", win_left)
                .unionByName(tagged.withColumn("__w__", win_right))
                .dropDuplicates(["__rid__", "__w__"])
                .drop("__rid__")
            )
        else:  # none: boundary points (left != right window) belong to neither
            assigned = (
                sdf.withColumn("__wl__", win_left)
                .withColumn("__wr__", win_right)
                .filter(F.col("__wl__") == F.col("__wr__"))
                .withColumn("__w__", F.col("__wl__"))
                .drop("__wl__", "__wr__")
            )

        agg_cols = [_c(a) for a in _flatten(aggs)] + [
            _c(a).alias(n) for n, a in named_aggs.items()
        ]
        keys = [F.col(k) for k in self._group_by]
        first_point = F.min(ts).alias("__first_point__")
        extra_keys = [F.col(rel_col)] if rel_col is not None else []
        # __rel__ is constant within a key group, so adding it to the grouping
        # keys changes nothing except making it available for the shift-back
        grouped = assigned.groupBy(F.col("__w__"), *keys, *extra_keys).agg(
            first_point, *agg_cols
        )

        lower = F.col("__w__.start")
        upper = F.col("__w__.end")
        if rel_col is not None:
            lower = F.timestamp_micros(F.unix_micros(lower) + F.col(rel_col))
            upper = F.timestamp_micros(F.unix_micros(upper) + F.col(rel_col))
        if self._label == "left":
            index_col = lower.alias(self._index)
        elif self._label == "right":
            index_col = upper.alias(self._index)
        elif self._label == "datapoint":
            index_col = F.col("__first_point__").alias(self._index)
        else:
            raise ValueError(f"unknown label {self._label!r}")

        out_cols = []
        if self._include_boundaries:
            out_cols += [lower.alias("_lower_boundary"), upper.alias("_upper_boundary")]
        out_cols += [F.col(k) for k in self._group_by]
        out_cols.append(index_col)
        out_cols += [F.col(c) for c in grouped.columns if c not in ("__w__", "__first_point__", "__rel__") and c not in self._group_by]
        out = grouped.select(*out_cols).orderBy(*self._group_by, self._index)
        return LazyFrame(out)


def _int_every(s: str, what: str) -> int:
    if not s.endswith("i"):
        raise ValueError(f"{what} must use 'Ni' notation when every does (got {s!r})")
    n = int(s[:-1])
    if n <= 0:
        raise ValueError(f"{what} must be positive, got {s!r}")
    return n


def _agg_int_impl(self, aggs, named_aggs):
    """Integer-index dynamic windows (polars every='10i'): buckets are pure
    integer arithmetic on the index — no timestamps, no F.window, one
    groupBy shuffle on (keys, bucket_start).

    Supported subset (documented): period == every (non-overlapping),
    closed 'left' (polars default) or 'right', label left/right/datapoint,
    include_boundaries, group_by keys, start_by='window'.
    """
    from ..frame import _flatten

    aggs = _flatten(aggs)
    every = _int_every(self._every, "every")
    if _int_every(self._period, "period") != every:
        raise ValueError("integer dynamic windows support period == every only")
    off = int(self._offset[:-1]) if self._offset else 0
    if self._closed not in ("left", "right"):
        raise ValueError("integer dynamic windows support closed='left'/'right'")
    if self._start_by != "window":
        raise ValueError("integer dynamic windows support start_by='window' only")

    sdf = self._lf._sdf
    idx = F.col(self._index).cast("long")
    shifted = idx - F.lit(off) - (F.lit(1) if self._closed == "right" else F.lit(0))
    start = (
        F.floor(shifted / F.lit(every)).cast("long") * F.lit(every) + F.lit(off)
    ).alias("__start__")
    key_cols = [F.col(k) for k in self._group_by]
    agg_cols = [_c(a) for a in aggs] + [_c(a).alias(n) for n, a in named_aggs.items()]
    grouped = sdf.withColumn("__start__", start).groupBy(*key_cols, F.col("__start__"))
    out = grouped.agg(*agg_cols)
    lab = F.col("__start__")
    if self._label == "right":
        lab = lab + F.lit(every)
    elif self._label == "datapoint":
        # smallest index actually in the bucket — recompute as an extra agg
        out = grouped.agg(F.min(idx).alias("__dp__"), *agg_cols)
        lab = F.col("__dp__")
    sel = key_cols + [lab.alias(self._index)]
    if self._include_boundaries:
        sel += [
            F.col("__start__").alias("_lower_boundary"),
            (F.col("__start__") + F.lit(every)).alias("_upper_boundary"),
        ]
    sel += [F.col(c) for c in out.columns
            if c not in ("__start__", "__dp__") and c not in self._group_by]
    return LazyFrame(out.select(*sel).orderBy(*key_cols, "__start__"))


DynamicGroupBy._agg_int = _agg_int_impl
