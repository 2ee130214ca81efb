"""Horizontal concat — positional zip of equal-height frames (SURVEY §2.8).

The reference requires equal heights (safety oracle
Polars.CSharp.Tests/LazyFrameTests.cs:46-76).  Spark has no positional zip;
we assign each frame a dense row number (JVM-side global window over a
monotonic id — order-stable, no Python round-trip) and inner-join on it.

Scale note: the dense row_number is a single-task stage by construction —
positional alignment of distributed data has no parallel formulation unless
both frames share a partitioner.  Fine for the reference's use cases (frames
that fit a node); prefer key-based joins at 100 TB.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = ["concat_horizontal"]


def _with_pos(lf: LazyFrame, idx_name: str):
    sdf = lf._sdf
    w = Window.orderBy(F.monotonically_increasing_id())
    return sdf.withColumn(idx_name, F.row_number().over(w))


def concat_horizontal(frames: Sequence[LazyFrame], strict_height: bool = True) -> LazyFrame:
    if not frames:
        raise ValueError("nothing to concat")
    seen: set[str] = set()
    for lf in frames:
        for c in lf.columns:
            if c in seen:
                raise ValueError(f"duplicate column name {c!r} in horizontal concat")
            seen.add(c)
    if strict_height:
        heights = [lf._sdf.count() for lf in frames]
        if len(set(heights)) > 1:
            raise ValueError(f"horizontal concat requires equal heights, got {heights}")
    idx = "__hcat_idx__"
    parts = [_with_pos(lf, idx) for lf in frames]
    out = reduce(lambda a, b: a.join(b, on=idx, how="inner"), parts)
    cols = [c for lf in frames for c in lf.columns]
    return LazyFrame(out.orderBy(idx).select(*cols))
