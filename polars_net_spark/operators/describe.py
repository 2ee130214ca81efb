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
