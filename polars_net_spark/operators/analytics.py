"""Event-analytics building blocks: outlier flags, gap detection, cohort
retention, funnels.

All are window/aggregate compositions over the standard (user, ts, value)
shape — one key-partitioned shuffle each, no iteration, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF, Window
from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = [
    "with_outlier_flags",
    "find_gaps",
    "cohort_retention",
    "funnel_counts",
]


def _sdf(frame):
    return frame if isinstance(frame, SparkDF) else frame.spark


def with_outlier_flags(
    frame: "LazyFrame | SparkDF",
    value_col: str,
    by: "str | list[str] | None" = None,
    method: str = "zscore",
    threshold: float = 3.0,
    flag_col: str = "is_outlier",
    score_col: str | None = None,
    round_to: int = 6,
) -> LazyFrame:
    """Flag per-key outliers: ``zscore`` = |x − mean| / std (population std),
    ``mad`` = |x − median| / (1.4826·MAD) (robust to the outliers
    themselves).  One grouped aggregate joined back (zscore combines
    map-side; mad's median materializes per-key value multisets in the
    percentile buffer — prefer zscore at extreme scale or pre-sample).
    Null values get a null flag.  Keys with zero spread flag nothing.
    """
    sdf = _sdf(frame)
    keys = [by] if isinstance(by, str) else list(by or [])
    v = F.col(value_col).cast("double")
    if method == "zscore":
        stats = (
            sdf.groupBy(*keys).agg(
                F.avg(v).alias("__ctr__"),
                F.var_pop(v).alias("__var__"),
            )
            .select(*keys, "__ctr__", F.sqrt(F.col("__var__")).alias("__spr__"))
        )
    elif method == "mad":
        med = sdf.groupBy(*keys).agg(F.percentile(v, F.lit(0.5)).alias("__ctr__"))
        # keyed joins stay plain equi-joins (AQE broadcasts small stat sides;
        # a forced broadcast would be wrong for a million-key frame)
        joined = sdf.join(med, keys) if keys else sdf.join(F.broadcast(med))
        stats = (
            joined.groupBy(*keys)
            .agg(
                F.first("__ctr__").alias("__ctr__"),
                F.percentile(F.abs(v - F.col("__ctr__")), F.lit(0.5)).alias("__mad__"),
            )
            .select(*keys, "__ctr__", (F.col("__mad__") * 1.4826).alias("__spr__"))
        )
    else:
        raise ValueError(f"unknown method {method!r}")
    out = sdf.join(stats, keys) if keys else sdf.join(F.broadcast(stats))
    score = F.when(
        F.col("__spr__") > 0, F.abs(v - F.col("__ctr__")) / F.col("__spr__")
    )
    cols = [F.col(c) for c in sdf.columns]
    cols.append(
        F.when(v.isNull(), F.lit(None).cast("boolean"))
        .otherwise(F.coalesce(score > threshold, F.lit(False)))
        .alias(flag_col)
    )
    if score_col:
        cols.append(F.round(score, round_to).alias(score_col))
    return LazyFrame(out.select(*cols))


def find_gaps(
    frame: "LazyFrame | SparkDF",
    ts_col: str,
    by: "str | list[str] | None" = None,
    min_gap: str = "1 hour",
    tie_cols: "list[str] | None" = None,
) -> LazyFrame:
    """Per-key silence periods: consecutive-event spans longer than
    ``min_gap`` as (key, gap_start, gap_end, gap_seconds).  One lag window
    keyed on ``by`` — the monitoring-flavored sibling of sessionize (which
    labels the rows; this emits the holes)."""
    sdf = _sdf(frame)
    keys = [by] if isinstance(by, str) else list(by or [])
    order = [F.col(ts_col)] + [F.col(c) for c in (tie_cols or [])]
    w = Window.partitionBy(*keys).orderBy(*order) if keys else Window.orderBy(*order)
    ts = F.col(ts_col).cast("timestamp")
    prev = F.lag(ts).over(w)
    gap_s = F.unix_micros(ts) / 1e6 - F.unix_micros(prev) / 1e6
    out = (
        sdf.select(*keys, ts.alias("__ts__"), prev.alias("__prev__"), gap_s.alias("__gap__"))
        .filter(F.col("__gap__") > F.lit(_interval_seconds(min_gap)))
        .select(
            *keys,
            F.col("__prev__").alias("gap_start"),
            F.col("__ts__").alias("gap_end"),
            F.round("__gap__", 6).alias("gap_seconds"),
        )
    )
    return LazyFrame(out)


def _interval_seconds(spec: str) -> float:
    """'2 hours' / '90 minutes' / '45 seconds' / '1 day' → seconds."""
    num, _, unit = spec.strip().partition(" ")
    mult = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }
    if unit not in mult:
        raise ValueError(f"unsupported interval {spec!r}")
    return float(num) * mult[unit]


def cohort_retention(
    frame: "LazyFrame | SparkDF",
    user_col: str,
    ts_col: str,
    period: str = "week",
    max_periods: int | None = None,
) -> LazyFrame:
    """Classic cohort-retention triangle: users grouped by their FIRST-seen
    period (cohort); for each (cohort, period offset) the count of distinct
    users active in that period.  Offset 0 is the cohort size.

    Two shuffles: first-seen per user (map-side min), then the distinct
    count per (cohort, offset).  ``period``: 'day' | 'week' | 'month'.
    Output: cohort (period start date), period_offset, n_users.
    """
    if period not in ("day", "week", "month"):
        raise ValueError("period must be day/week/month")
    sdf = _sdf(frame)
    ts = F.col(ts_col).cast("timestamp")
    bucket = F.date_trunc(period, ts).cast("date")
    ev = sdf.select(F.col(user_col).alias("u"), bucket.alias("p"))
    first = ev.groupBy("u").agg(F.min("p").alias("cohort"))
    joined = ev.join(first, "u")
    if period == "day":
        off = F.datediff(F.col("p"), F.col("cohort"))
    elif period == "week":
        off = (F.datediff(F.col("p"), F.col("cohort")) / 7).cast("int")
    else:
        off = (
            (F.year("p") - F.year("cohort")) * 12 + (F.month("p") - F.month("cohort"))
        )
    acts = joined.select("u", "cohort", off.alias("period_offset"))
    if max_periods is not None:
        acts = acts.filter(F.col("period_offset") < max_periods)
    out = (
        acts.groupBy("cohort", "period_offset")
        .agg(F.count_distinct("u").alias("n_users"))
    )
    return LazyFrame(out)


def funnel_counts(
    frame: "LazyFrame | SparkDF",
    user_col: str,
    ts_col: str,
    step_col: str,
    steps: "list[str]",
) -> LazyFrame:
    """Ordered-funnel completion: for each prefix of ``steps``, how many
    users performed those steps IN ORDER (step k's earliest qualifying time
    is after the time used for step k-1).  The per-user walk is a chain of
    conditional min-aggregates over one grouped collect of (step, ts) —
    a single shuffle on the user key.

    Output: step (name), step_idx (1-based), n_users — n_users is
    non-increasing down the funnel.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    sdf = _sdf(frame)
    ev = sdf.filter(F.col(step_col).isin(steps)).select(
        F.col(user_col).alias("u"),
        F.col(step_col).alias("s"),
        F.col(ts_col).cast("timestamp").alias("t"),
    )
    # earliest ts of step k strictly after the chosen ts of step k-1:
    # min(t | s == step_k, t > prev) as a chain of filtered min aggregates
    agg = ev.groupBy("u").agg(
        *[
            F.min(F.when(F.col("s") == st, F.col("t"))).alias(f"__m{i}__")
            for i, st in enumerate(steps)
        ],
        F.collect_list(F.struct("s", "t")).alias("__evs__"),
    )
    chain = agg
    prev = None
    reach_flags = []
    for i, st in enumerate(steps):
        if i == 0:
            cur = F.col("__m0__")
        else:
            # earliest occurrence of step i after prev (array min over the
            # collected events — group-sized array, same contract as implode).
            # Closure factory: defaults in the lambda would change its ARITY
            # and PySpark binds HOF lambdas by arity (the test_lambda_arity
            # trap).
            def _after(_st, _prev):
                return lambda e: (e["s"] == F.lit(_st)) & (e["t"] > _prev)

            cand = F.array_min(
                F.filter(F.col("__evs__"), _after(st, prev)).getField("t")
            )
            cur = F.when(prev.isNotNull(), cand)
        chain = chain.withColumn(f"__r{i}__", cur)
        prev = F.col(f"__r{i}__")
        reach_flags.append(F.col(f"__r{i}__").isNotNull())
    counts = chain.agg(
        *[
            F.sum(fl.cast("long")).alias(f"__n{i}__")
            for i, fl in enumerate(reach_flags)
        ]
    )
    # ONE pass over the 1-row counts (a per-step union would recompute the
    # whole per-user chain once per branch — no CSE across union legs)
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(st).alias("step"),
                    F.lit(i + 1).alias("step_idx"),
                    F.col(f"__n{i}__").alias("n_users"),
                )
                for i, st in enumerate(steps)
            ]
        )
    )
    rows = counts.select(entries.alias("e")).select("e.step", "e.step_idx", "e.n_users")
    return LazyFrame(rows)
