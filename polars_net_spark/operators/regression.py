"""Closed-form per-key statistics: grouped OLS fit and key-skew reporting.

Both are pure aggregate compositions (map-side combining, one shuffle on the
key) — the "fit a trend per user / find the hot keys" analytics that usually
get exported to pandas happen in-plan instead, at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window
from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = ["fit_linear_by_key", "key_skew_report", "corr_matrix"]


def _sdf(frame):
    return frame if isinstance(frame, SparkDF) else frame.spark


def fit_linear_by_key(
    frame: "LazyFrame | SparkDF",
    key_cols: "str | list[str]",
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> LazyFrame:
    """Per-key ordinary-least-squares fit of ``y ~ a + b·x``: one row per key
    with (n, slope, intercept, r2), computed from the five power sums — a
    single map-side-combining aggregate, no window, no iteration.

    Rows where x or y is null are excluded (SQL REGR_* semantics).  Keys
    with zero x-variance give null slope/intercept/r2; r2 is null when y has
    zero variance.  Keep |x| modest (e.g. days since an epoch, not raw
    microseconds): the power sums square x, and 1e15-scale x burns double
    precision.
    """
    sdf = _sdf(frame)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    both = x.isNotNull() & y.isNotNull()
    xm = F.when(both, x)
    ym = F.when(both, y)
    agg = sdf.groupBy(*keys).agg(
        F.count(xm).cast("double").alias("n"),
        F.sum(xm).alias("sx"),
        F.sum(ym).alias("sy"),
        F.sum(xm * xm).alias("sxx"),
        F.sum(ym * ym).alias("syy"),
        F.sum(xm * ym).alias("sxy"),
    )
    nxx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    nyy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    nxy = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(nxx > 0, nxy / nxx)
    intercept = F.when(nxx > 0, (F.col("sy") - nxy / nxx * F.col("sx")) / F.col("n"))
    r2 = F.when((nxx > 0) & (nyy > 0), (nxy * nxy) / (nxx * nyy))
    out = agg.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.round(slope, round_to).alias("slope"),
        F.round(intercept, round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )
    return LazyFrame(out)


def key_skew_report(
    frame: "LazyFrame | SparkDF",
    key_cols: "str | list[str]",
    top_k: int = 20,
    round_to: int = 6,
) -> LazyFrame:
    """The ``top_k`` heaviest keys with their row counts and corpus fraction
    — the "which key will wreck my shuffle" probe to run BEFORE a big join
    or window (pipe the winners into salted_join / cap_per_key /
    length-bucket shards).

    One map-side-combining count + TakeOrdered top-k; the total is a 1-row
    aggregate attached by broadcast (the audited bounded-broadcast class).
    Output: key cols, cnt, frac, desc rank.
    """
    sdf = _sdf(frame)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = sdf.groupBy(*keys).agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("__total__"))
    top = (
        counts.join(F.broadcast(total))
        .orderBy(F.col("cnt").desc(), *[F.col(k) for k in keys])
        .limit(int(top_k))
    )
    # rank window runs on the top_k-row result only (bounded by construction)
    w_rank = F.row_number().over(
        Window.orderBy(F.col("cnt").desc(), *[F.col(k) for k in keys])
    )
    out = top.select(
        *keys,
        F.col("cnt").cast("long").alias("cnt"),
        F.round(F.col("cnt") / F.col("__total__"), round_to).alias("frac"),
        w_rank.alias("rank"),
    )
    return LazyFrame(out)


def corr_matrix(
    frame: "LazyFrame | SparkDF",
    cols: "list[str]",
    round_to: int = 6,
) -> LazyFrame:
    """Pairwise Pearson correlations of ``cols`` in ONE aggregate pass —
    long-format output (col_a, col_b, corr, both upper-triangle orders
    excluded; a < b by input position).  F.corr handles pairwise null
    exclusion (rows missing either value drop from that pair only).

    k columns → k(k−1)/2 corr aggregates in a single map-side-combining
    groupBy-less agg; keep k modest (≤ ~40, i.e. ≤ 800 aggregates) — the
    cost is plan width, not data passes (the corpus is scanned ONCE).
    """
    sdf = _sdf(frame)
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    aggs = []
    names = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(
                F.round(F.corr(F.col(a).cast("double"), F.col(b).cast("double")), round_to)
                .alias(f"__c_{a}__{b}__")
            )
            names.append((a, b))
    one = sdf.agg(*aggs)
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col(f"__c_{a}__{b}__").alias("corr"),
                )
                for a, b in names
            ]
        )
    )
    out = one.select(entries.alias("e")).select("e.col_a", "e.col_b", "e.corr")
    return LazyFrame(out)
