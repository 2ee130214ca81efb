"""Z-order (Morton) clustering keys for multi-dimensional data layout.

Writing 100 TB sorted by ONE column prunes scans on that column only; a
Z-order key interleaves the bits of several columns' bucket ranks so rows
close in ANY keyed dimension land close on disk — min/max parquet statistics
then prune scans filtered on any of the dimensions (the Delta/Iceberg
OPTIMIZE ZORDER pattern, done here as plain engine math).

Everything is Column arithmetic (bucket = scaled clamp, interleave = shifted
bit picks) — map-only when ranges are given; computed ranges are one 1-row
aggregate broadcast onto the scan (the bounded-broadcast class the plan
audit exempts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = ["with_zorder_key", "zorder_sort"]


def _sdf(frame):
    return frame if isinstance(frame, SparkDF) else frame.spark


def with_zorder_key(
    frame: "LazyFrame | SparkDF",
    cols: "list[str]",
    bits: int = 8,
    ranges: "dict[str, tuple[float, float]] | None" = None,
    key_col: str = "zorder_key",
) -> LazyFrame:
    """Add a Morton key over ``cols``: each column maps to a ``bits``-bit
    bucket rank inside its [min, max] range, and the ranks' bits interleave
    (column j contributes bit i to key position ``i*len(cols)+j``).

    ``ranges`` maps column → (min, max); omitted columns (or ranges=None)
    compute global min/max as a single 1-row aggregate joined back by
    broadcast — one extra corpus scan, no shuffle of the data itself.
    Total key width = bits × len(cols) ≤ 63.
    """
    if not cols:
        raise ValueError("need at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"bits*len(cols) = {bits * len(cols)} exceeds 63")
    sdf = _sdf(frame)
    ranges = dict(ranges or {})
    missing = [c for c in cols if c not in ranges]
    if missing:
        stats = sdf.agg(
            *[F.min(c).cast("double").alias(f"__mn_{c}__") for c in missing],
            *[F.max(c).cast("double").alias(f"__mx_{c}__") for c in missing],
        )
        sdf = sdf.join(F.broadcast(stats))
        rng = {
            c: (F.col(f"__mn_{c}__"), F.col(f"__mx_{c}__")) for c in missing
        }
    else:
        rng = {}
    nbuckets = 1 << bits
    key = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        if c in ranges:
            lo, hi = (F.lit(float(ranges[c][0])), F.lit(float(ranges[c][1])))
        else:
            lo, hi = rng[c]
        span = hi - lo
        scaled = F.when(
            span > 0, F.floor((F.col(c).cast("double") - lo) / span * nbuckets)
        ).otherwise(F.lit(0))
        bucket = F.greatest(
            F.lit(0).cast("long"),
            F.least(F.lit(nbuckets - 1).cast("long"), scaled.cast("long")),
        )
        for i in range(bits):
            key = key + F.shiftleft(
                F.shiftright(bucket, i).bitwiseAND(F.lit(1)), i * len(cols) + j
            )
    out = sdf.withColumn(key_col, key)
    if missing:
        out = out.drop(*[f"__mn_{c}__" for c in missing], *[f"__mx_{c}__" for c in missing])
    return LazyFrame(out)


def zorder_sort(
    frame: "LazyFrame | SparkDF",
    cols: "list[str]",
    bits: int = 8,
    ranges: "dict[str, tuple[float, float]] | None" = None,
    num_partitions: int | None = None,
) -> LazyFrame:
    """Rows range-partitioned and sorted by their Z-order key (the key
    column itself is dropped) — write the result with sink_parquet /
    write_bucketed and every dimension in ``cols`` gets min/max-stat scan
    pruning.  One range-exchange shuffle, the standard price of any global
    layout."""
    keyed = with_zorder_key(frame, cols, bits=bits, ranges=ranges).spark
    npart = num_partitions or keyed.sparkSession.sparkContext.defaultParallelism
    out = (
        keyed.repartitionByRange(npart, F.col("zorder_key"))
        .sortWithinPartitions("zorder_key")
        .drop("zorder_key")
    )
    return LazyFrame(out)
