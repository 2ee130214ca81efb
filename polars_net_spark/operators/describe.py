"""describe() — summary statistics table (SURVEY §2.2).

Mirrors Polars.CSharp/DataFrame.cs:665-728: one row per statistic
(count, null_count, mean, std, min, 25%, 50%, 75%, max) over numeric columns,
composed client-side from ordinary aggregations — a single Spark job computes
the whole stat grid, then the tiny (9 × ncols) result is reshaped on the
driver.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..frame import DataFrame, LazyFrame

__all__ = ["describe"]

_STATS = ["count", "null_count", "mean", "std", "min", "25%", "50%", "75%", "max"]


def describe(lf: LazyFrame, exact_percentiles: bool = True, accuracy: int = 10_000) -> LazyFrame:
    """exact_percentiles=True (default, the reference/oracle semantics) uses
    F.percentile — a sort-based aggregate per column.  At 100 TB pass
    exact_percentiles=False: approx_percentile (Greenwald-Khanna sketch,
    ``accuracy`` = 1/eps) is a streaming single-pass aggregate with bounded
    memory; count/mean/std/min/max are identical either way."""
    sdf = lf._sdf
    num_cols = [
        f.name for f in sdf.schema.fields if isinstance(f.dataType, T.NumericType)
    ]
    if not num_cols:
        raise ValueError("describe needs at least one numeric column")

    def pct(col, q: float):
        if exact_percentiles:
            return F.percentile(col, F.lit(q))
        return F.approx_percentile(col, F.lit(q), F.lit(accuracy)).cast("double")

    aggs = []
    for c in num_cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__count"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"{c}__null_count"),
            F.avg(col).alias(f"{c}__mean"),
            F.stddev_samp(col).alias(f"{c}__std"),
            F.min(col).cast("double").alias(f"{c}__min"),
            pct(col, 0.25).alias(f"{c}__25%"),
            pct(col, 0.5).alias(f"{c}__50%"),
            pct(col, 0.75).alias(f"{c}__75%"),
            F.max(col).cast("double").alias(f"{c}__max"),
        ]
    row = sdf.agg(*aggs).collect()[0].asDict()
    data = [
        tuple([stat] + [float(row[f"{c}__{stat}"]) if row[f"{c}__{stat}"] is not None else None for c in num_cols])
        for stat in _STATS
    ]
    schema = T.StructType(
        [T.StructField("statistic", T.StringType(), False)]
        + [T.StructField(c, T.DoubleType(), True) for c in num_cols]
    )
    out = sdf.sparkSession.createDataFrame(data, schema)
    return LazyFrame(out)


def histogram_frame(
    lf: "LazyFrame",
    col: str,
    n_bins: int = 10,
    lo: "float | None" = None,
    hi: "float | None" = None,
    by: "str | None" = None,
) -> LazyFrame:
    """Equi-width histogram of a numeric column: one row per bin with its
    [bin_lo, bin_hi) edges and count — the data-profiling primitive behind
    distribution dashboards and drift monitors.  The last bin is closed on
    both ends (max lands in bin n_bins−1, the standard convention).  Nulls
    and NaNs are excluded.  Empty bins are emitted with count 0 so the
    shape is stable (a bins×1 driver-built frame left-joined to counts —
    bounded by n_bins, not data).

    ``lo``/``hi`` default to the column's min/max via ONE tiny extra
    aggregate (a bounded 1-row probe); pass them explicitly to skip that
    pass or to pin comparable edges across runs — at 100 TB pinned edges
    also make successive daily histograms directly diffable.  ``by``
    produces one histogram per key (bins shared globally so keys are
    comparable).  One map-side-combining aggregate either way.
    """
    sdf = lf._sdf if hasattr(lf, "_sdf") else lf
    x = F.col(col).cast("double")
    clean = sdf.filter(x.isNotNull() & ~F.isnan(x))
    if lo is None or hi is None:
        row = clean.agg(F.min(x).alias("lo"), F.max(x).alias("hi")).first()
        lo = float(row["lo"]) if lo is None else float(lo)
        hi = float(row["hi"]) if hi is None else float(hi)
    if not hi > lo:
        hi = lo + 1.0  # degenerate single-value column: one catch-all bin
    width = (hi - lo) / n_bins
    b = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), F.floor((x - lo) / width).cast("int")))
    spark = clean.sparkSession
    edges = spark.range(n_bins).select(
        F.col("id").cast("int").alias("bin"),
        F.round(lo + F.col("id") * width, 9).alias("bin_lo"),
        F.round(lo + (F.col("id") + 1) * width, 9).alias("bin_hi"),
    )
    if by is None:
        counts = clean.groupBy(b.alias("bin")).agg(F.count(F.lit(1)).alias("count"))
        out = (
            edges.join(counts, "bin", "left")
            .select("bin", "bin_lo", "bin_hi", F.coalesce("count", F.lit(0)).alias("count"))
        )
    else:
        keys = clean.select(F.col(by)).distinct()
        grid = keys.crossJoin(edges)  # |keys| x n_bins — bounded by key cardinality
        counts = clean.groupBy(F.col(by), b.alias("bin")).agg(F.count(F.lit(1)).alias("count"))
        out = (
            grid.join(counts, [by, "bin"], "left")
            .select(by, "bin", "bin_lo", "bin_hi", F.coalesce("count", F.lit(0)).alias("count"))
        )
    return LazyFrame(out)


__all__.append("histogram_frame")
