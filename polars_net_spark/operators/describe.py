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
        if row["lo"] is None or row["hi"] is None:
            raise ValueError(
                f"histogram_frame: column {col!r} has no non-null, non-NaN "
                "values to infer lo/hi from — pass lo= and hi= explicitly"
            )
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


def profile_frame(
    frame: "LazyFrame | SparkDF",
    cols: "list[str] | None" = None,
) -> LazyFrame:
    """Deequ-style column profiling — the audit sibling of describe()
    (which summarizes numeric distributions) and validate_frame (which
    checks declared expectations): one row per column with row count, null
    count, exact distinct count, and the modal value (most frequent
    non-null, ties to the smallest value string).

    Values profile in their string form so one frame covers mixed types.
    Shuffle shape: columns melt map-side into (column, value) pairs — ONE
    pass, rows × |cols| fan-out — then (column, value) counts combine
    map-side, and the per-column rollup (distinct = one row per surviving
    (column, value); mode = min(struct(-count, value))) is a second
    map-side-combining aggregate keyed by column, so hot columns never pool
    raw rows.  Output: (column, n, n_null, n_distinct, top_value, top_count).

    Caveat for cross-engine comparisons: float-to-string renderings differ
    between engines; profile numeric columns via an explicit cast/round
    upstream if the string form matters."""
    from pyspark.sql import DataFrame as SparkDF

    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    names = list(cols) if cols is not None else list(sdf.columns)
    if not names:
        raise ValueError("cols must name at least one column")
    melted = sdf.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in names
            ])
        ).alias("kv")
    ).select("kv.column", "kv.value")
    base = melted.groupBy("column").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").isNull().cast("long")).alias("n_null"),
    )
    vc = (
        melted.filter(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    roll = vc.groupBy("column").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("value").alias("v"))).alias("__top__"),
    )
    out = (
        base.join(roll, "column", "left")
        .select(
            "column",
            F.col("n").cast("long").alias("n"),
            F.col("n_null").cast("long").alias("n_null"),
            F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long").alias("n_distinct"),
            F.col("__top__.v").alias("top_value"),
            (-F.col("__top__.nc")).cast("long").alias("top_count"),
        )
    )
    return LazyFrame(out)


def weighted_quantile(
    frame: "LazyFrame | SparkDF",
    value_col: str,
    weight_col: str,
    qs: "list[float]",
    by: "str | list[str] | None" = None,
    round_to: int = 6,
) -> LazyFrame:
    """Exact weighted quantiles: the smallest value whose cumulative weight
    reaches q·W (the weighted generalization of quantile 'lower'
    interpolation) — survey weighting, importance-weighted percentiles,
    token-weighted length stats.  Null/zero/negative weights and null
    values drop.

    Per-``by``-key the cumulative weight is one window sharded on the key.
    The GLOBAL path never uses a single-partition window: distinct values
    collapse first (map-side combine), then the distsort range-bucket +
    driver-prefix-offset machinery (operators/distsort.py) gives each
    bucket its exclusive prefix, and the within-bucket window holds
    ~1/nbuckets of the DISTINCT values.  Output: (*by, q, value)."""
    from pyspark.sql import DataFrame as SparkDF, Window

    from .distsort import with_bucket_offsets

    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError("each q must be in (0, 1]")
    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    keys = [by] if isinstance(by, str) else list(by or [])
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    base = sdf.filter(v.isNotNull() & w.isNotNull() & (w > 0)).select(
        *keys, v.alias("__v__"), w.alias("__w__")
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    if keys:
        wk = Window.partitionBy(*keys).orderBy("__v__")
        cum = F.sum("__w__").over(
            wk.rangeBetween(Window.unboundedPreceding, Window.currentRow)
        )
        tot = F.sum("__w__").over(Window.partitionBy(*keys))
        staged = base.select(*keys, "__v__", cum.alias("__cw__"), tot.alias("__tw__"))
        picked = (
            staged.select(*keys, "__v__", "__cw__", "__tw__", F.explode(qarr).alias("q"))
            .groupBy(*keys, "q")
            .agg(
                F.min(
                    F.when(
                        F.col("__cw__") >= F.col("q") * F.col("__tw__") - F.lit(1e-12),
                        F.col("__v__"),
                    )
                ).alias("value")
            )
            .select(*keys, F.round("q", 6).alias("q"), F.round("value", round_to).alias("value"))
        )
        return LazyFrame(picked)
    from .._cache import register_cache

    # persist the distinct-value table: the boundary sketch, the offsets
    # aggregate and the final window pass each read it (unpersisted, each
    # action re-ran the full input scan + combine — 3 passes for 1)
    dv = register_cache(base.groupBy("__v__").agg(F.sum("__w__").alias("__w__")))
    offs, bcol, totals = with_bucket_offsets(dv, "__v__", {"w": F.col("__w__")})
    wtot = float(totals["w"])
    wb = Window.partitionBy(bcol).orderBy("__v__")
    cum = F.col("__off_w__") + F.sum("__w__").over(
        wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = offs.select("__v__", cum.alias("__cw__"))
    picked = (
        staged.select("__v__", "__cw__", F.explode(qarr).alias("q"))
        .groupBy("q")
        .agg(
            F.min(
                F.when(F.col("__cw__") >= F.col("q") * F.lit(wtot) - F.lit(1e-12), F.col("__v__"))
            ).alias("value")
        )
        .select(F.round("q", 6).alias("q"), F.round("value", round_to).alias("value"))
    )
    return LazyFrame(picked)


__all__.extend(["profile_frame", "weighted_quantile"])


def profile_diff(
    reference: "LazyFrame",
    current: "LazyFrame",
    cols: "list[str] | None" = None,
    round_to: int = 6,
) -> LazyFrame:
    """Schema/profile drift between two snapshots of the same table (e.g.
    yesterday's crawl vs today's): per column, the row counts, null rates,
    distinct counts, and modal values of BOTH sides plus the headline
    deltas — the structural companion to psi_report (which compares value
    DISTRIBUTIONS; this catches pipeline breaks: a column going all-null,
    cardinality collapsing, a new sentinel flooding the mode).

    Columns profiled are the intersection of both schemas unless ``cols``
    is given; columns present on only one side appear with null metrics on
    the missing side (full-outer join on column name), so added/dropped
    columns surface instead of vanishing.  Cost: one profile_frame pass
    per side (each ONE melt + map-side-combining aggregates) joined on the
    bounded column-name key.

    Output per column: (column, n_ref, n_cur, null_rate_ref, null_rate_cur,
    null_rate_delta, n_distinct_ref, n_distinct_cur, distinct_ratio,
    top_value_ref, top_value_cur, top_changed)."""
    from pyspark.sql import DataFrame as SparkDF

    r_sdf = reference if isinstance(reference, SparkDF) else reference.spark
    c_sdf = current if isinstance(current, SparkDF) else current.spark
    if cols is None:
        shared = [c for c in r_sdf.columns if c in set(c_sdf.columns)]
        union = shared + [c for c in r_sdf.columns if c not in set(shared)] + [
            c for c in c_sdf.columns if c not in set(r_sdf.columns)
        ]
    else:
        union = list(cols)
    rp = profile_frame(r_sdf, [c for c in union if c in r_sdf.columns])._sdf
    cp = profile_frame(c_sdf, [c for c in union if c in c_sdf.columns])._sdf
    rp = rp.select(*[F.col(c).alias(f"{c}_ref") for c in rp.columns]).withColumnRenamed(
        "column_ref", "column"
    )
    cp = cp.select(*[F.col(c).alias(f"{c}_cur") for c in cp.columns]).withColumnRenamed(
        "column_cur", "column"
    )
    j = rp.join(cp, "column", "full_outer")
    nr_ref = F.col("n_null_ref") / F.col("n_ref")
    nr_cur = F.col("n_null_cur") / F.col("n_cur")
    out = j.select(
        "column",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(nr_ref, round_to).alias("null_rate_ref"),
        F.round(nr_cur, round_to).alias("null_rate_cur"),
        F.round(nr_cur - nr_ref, round_to).alias("null_rate_delta"),
        F.col("n_distinct_ref").cast("long").alias("n_distinct_ref"),
        F.col("n_distinct_cur").cast("long").alias("n_distinct_cur"),
        F.round(
            F.when(
                F.col("n_distinct_ref") > 0,
                F.col("n_distinct_cur") / F.col("n_distinct_ref"),
            ),
            round_to,
        ).alias("distinct_ratio"),
        F.col("top_value_ref"),
        F.col("top_value_cur"),
        F.coalesce(
            F.col("top_value_ref") != F.col("top_value_cur"),
            F.col("top_value_ref").isNotNull() | F.col("top_value_cur").isNotNull(),
        ).alias("top_changed"),
    )
    return LazyFrame(out)


__all__.append("profile_diff")
