"""Exponentially-weighted moving aggregates (polars ``Expr.ewm_mean`` /
``ewm_std`` / ``ewm_var``). Parity extra: the reference itself does NOT expose
an ewm surface (zero hits in /root/reference); this exists for polars-API
completeness.

EWM is a linear recurrence (y_t = x_t + (1-alpha) * y_{t-1}); the closed-form
two-cumsum rewrite ((1-alpha)^-i factors) overflows float64 after ~1k rows, so
a pure window-expression formulation is not numerically viable for long
series.  Spark-first design: hash-repartition on the keys +
``sortWithinPartitions`` + ONE ``mapInPandas`` pass per PARTITION, with
pandas' C groupby-ewm kernel inside (identical semantics to polars for
adjust/min_periods/ignore_nulls).  Time-series keys are typically many and
small (1.5k users x 67 events at the test SF), so per-group ``applyInPandas``
pays ~1 Arrow round trip + pandas construction per GROUP; the partition-level
pass pays one per TASK — measured 4.9 s -> ~1 s on the q80 gate.  Each task
materializes its partition as one pandas frame (groups are hash-scattered, so
a partition holds |data|/shuffle.partitions rows — the standard executor
sizing contract, tunable via spark.sql.shuffle.partitions; no group ever
spans partitions).  Parallelism comes from the key partitioning, the natural
shape of time-series data; without ``partition_by`` the whole frame is ONE
partition (single task — documented, same caveat as asof-without-by).
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..exprs import ROW_ORDER_COL

__all__ = ["with_ewm", "with_ewm_mean_by", "resolve_alpha"]


def resolve_alpha(
    alpha: float | None = None,
    com: float | None = None,
    span: float | None = None,
    half_life: float | None = None,
) -> float:
    """Exactly one of alpha/com/span/half_life, polars' parameterization:
    com -> a = 1/(1+com); span -> a = 2/(span+1); half_life -> a = 1-exp(-ln2/hl)."""
    given = [v for v in (alpha, com, span, half_life) if v is not None]
    if len(given) != 1:
        raise ValueError("provide exactly one of alpha, com, span, half_life")
    if alpha is not None:
        a = float(alpha)
    elif com is not None:
        a = 1.0 / (1.0 + float(com))
    elif span is not None:
        a = 2.0 / (float(span) + 1.0)
    else:
        a = 1.0 - math.exp(-math.log(2.0) / float(half_life))
    if not (0.0 < a <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {a}")
    return a


def with_ewm(
    lf,
    column: str,
    *,
    kind: "str | Sequence[str]" = "mean",
    alpha: float | None = None,
    com: float | None = None,
    span: float | None = None,
    half_life: float | None = None,
    adjust: bool = True,
    bias: bool = False,
    min_periods: int = 1,
    ignore_nulls: bool = False,
    order_by: str | Sequence[str] | None = None,
    partition_by: Sequence[str] = (),
    out_col: "str | Sequence[str] | None" = None,
):
    """Append ``out_col`` = EWM <kind> of ``column`` ordered by ``order_by``
    within each ``partition_by`` group.

    ``kind`` may be a list (e.g. ``["var", "std"]``) to compute several EWM
    aggregates in ONE applyInPandas pass — one shuffle and one Arrow round
    trip instead of one per aggregate; ``out_col`` then takes a matching
    list of names.

    kind: 'mean' | 'var' | 'std' (var/std honor ``bias``, polars default
    bias=False = debiased).  Nulls: default ignore_nulls=False matches modern
    polars (>=1.0) and pandas ignore_na=False — weights are based on absolute
    row positions, so intervening nulls decay older values; with
    ignore_nulls=True weights use relative positions of the non-null values.
    Rows before the first non-null, and rows masked by min_periods, yield
    null.
    """
    from ..frame import LazyFrame

    kinds = [kind] if isinstance(kind, str) else list(kind)
    for knd in kinds:
        if knd not in ("mean", "var", "std"):
            raise ValueError(f"kind must be mean|var|std, got {knd!r}")
    if not partition_by:
        from ..exprs import _warn_single_partition

        _warn_single_partition(f"with_ewm_{'_'.join(kinds)}")
    a = resolve_alpha(alpha, com, span, half_life)
    if out_col is None:
        out_cols = [f"{column}_ewm_{knd}" for knd in kinds]
    else:
        out_cols = [out_col] if isinstance(out_col, str) else list(out_col)
    if len(out_cols) != len(kinds):
        raise ValueError("out_col must match kind in length")

    if order_by is None:
        lf = lf._order_col()
        order_names = [ROW_ORDER_COL]
    else:
        order_names = [order_by] if isinstance(order_by, str) else list(order_by)

    sdf = lf._sdf
    schema = T.StructType(
        sdf.schema.fields + [T.StructField(c, T.DoubleType(), True) for c in out_cols]
    )
    field_names = [f.name for f in schema.fields]
    part = list(partition_by)
    mp = int(min_periods)
    adj, ign, b, col_ = bool(adjust), bool(ignore_nulls), bool(bias), column

    def _ewm_part(batches):
        import pandas as pd

        pdfs = list(batches)  # groups are partition-local: fold the whole task
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(part + order_names, kind="mergesort", ignore_index=True)
        x = pdf[col_].astype("float64")
        if part:
            # pandas' cython groupby-ewm: one kernel call for ALL groups
            ew = x.groupby(
                [pdf[p] for p in part], sort=False, dropna=False
            ).ewm(alpha=a, adjust=adj, min_periods=mp, ignore_na=ign)
        else:
            ew = x.ewm(alpha=a, adjust=adj, min_periods=mp, ignore_na=ign)
        for knd, oc in zip(kinds, out_cols):
            if knd == "mean":
                res = ew.mean()
            elif knd == "var":
                res = ew.var(bias=b)
            else:
                res = ew.std(bias=b)
            if part:
                res = res.reset_index(drop=True)
            # nullable Float64 so masked/leading NaNs cross Arrow as SQL
            # nulls, not double-NaN
            pdf[oc] = res.astype("Float64")
        yield pdf[field_names]

    shuffled = (
        sdf.repartition(*[F.col(c) for c in part]) if part else sdf.repartition(1)
    ).sortWithinPartitions(*(part + order_names))
    return LazyFrame(shuffled.mapInPandas(_ewm_part, schema=schema))


def with_ewm_mean_by(
    lf,
    column: str,
    by: str,
    half_life: str,
    *,
    order_by: "str | Sequence[str] | None" = None,
    partition_by: Sequence[str] = (),
    out_col: str | None = None,
):
    """polars ``Expr.ewm_mean_by`` (time-decay EWM; parity extra — the
    reference has no ewm surface): with observations x at times t,

        y_0 = x_0
        y_i = x_i + a_i * (y_{i-1} - x_i),  a_i = 0.5 ** (dt_i / half_life)

    i.e. irregularly-sampled series decay by elapsed time, not row count.
    Null observations yield null and do not advance the state or the decay
    clock (time is measured between non-null observations, polars
    semantics).  ``half_life`` is a polars duration string ("2h", "30m").

    ``order_by`` defaults to [by]; pass extra tie-break columns for
    deterministic output when timestamps collide.  Scale: applyInPandas per
    ``partition_by`` key — hash repartition + sortWithinPartitions + ONE
    mapInPandas per task (see module docstring: per-group applyInPandas pays
    an Arrow round trip per group; this pays one per task).  The recurrence
    itself is one fused scan over the task's rows with state resets at group
    boundaries — the same O(n) sequential work polars runs per series;
    parallelism comes from key partitioning.  Without ``partition_by`` the
    frame is one task (warned, same class as asof-without-by).
    """
    import numpy as np

    from .._fmt import parse_polars_duration_us
    from ..frame import LazyFrame

    if not partition_by:
        from ..exprs import _warn_single_partition

        _warn_single_partition("with_ewm_mean_by")
    hl_us = float(parse_polars_duration_us(half_life))
    if hl_us <= 0:
        raise ValueError(f"half_life={half_life!r} must be positive")
    oc = out_col or f"{column}_ewm_mean_by"
    order_names = (
        [by] if order_by is None
        else ([order_by] if isinstance(order_by, str) else list(order_by))
    )
    sdf = lf._sdf
    schema = T.StructType(sdf.schema.fields + [T.StructField(oc, T.DoubleType(), True)])
    field_names = [f.name for f in schema.fields]
    part = list(partition_by)
    col_, by_ = column, by

    def _fn_part(batches):
        import pandas as pd

        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        pdf = pdf.sort_values(part + order_names, kind="mergesort", ignore_index=True)
        t = pdf[by_].to_numpy(dtype="datetime64[us]").astype("int64")
        x = pdf[col_].astype("float64").to_numpy()
        n = len(x)
        if part:
            keys = pdf[part]
            sh = keys.shift()
            # null==null is the same group (don't let NaN != NaN split it)
            new_group = (keys.ne(sh) & ~(keys.isna() & sh.isna())).any(axis=1).to_numpy()
        else:
            new_group = np.zeros(n, dtype=bool)
        if n:
            new_group[0] = True
        out = np.full(n, np.nan)
        state = 0.0
        t_prev = 0
        started = False
        for i in range(n):
            if new_group[i]:
                started = False
            xi = x[i]
            if np.isnan(xi):
                continue
            if not started:
                state, started = xi, True
            else:
                a = 0.5 ** ((t[i] - t_prev) / hl_us)
                state = xi + a * (state - xi)
            t_prev = t[i]
            out[i] = state
        # nullable Float64 so leading/masked NaNs cross Arrow as SQL nulls
        pdf[oc] = pd.Series(out).astype("Float64")
        yield pdf[field_names]

    shuffled = (
        sdf.repartition(*[F.col(c) for c in part]) if part else sdf.repartition(1)
    ).sortWithinPartitions(*(part + order_names))
    return LazyFrame(shuffled.mapInPandas(_fn_part, schema=schema))


def holt_forecast(
    frame,
    value_col: str,
    ts_col: str,
    by: "str | list[str] | None" = None,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizon: int = 1,
    round_to: int = 6,
):
    """Holt's linear (double exponential) smoothing per series — the
    trend-aware step past ewm_mean: level l_t = α·x_t + (1−α)(l_{t−1} +
    b_{t−1}), trend b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}, initialized
    l_1 = x_1, b_1 = x_2 − x_1 (the textbook init), forecast at
    ``horizon`` steps = l_n + h·b_n.

    The recurrence is one in-order fold per series: values collect into ONE
    ts-sorted array per key (size contract: a series must fit a row — the
    same bound ewm's partition pass and any per-series model share; split
    longer series upstream) and F.aggregate walks it — whole-row Column
    math, no Python, shuffle = one groupBy on the key.  Series with < 2
    points return nulls.  The fold's expression tree matches the oracle's
    list_reduce term-for-term, so results are bit-identical cross-engine
    (dyadic default α/β make the products exact).  Output per key:
    (*by, n, level, trend, forecast)."""
    from pyspark.sql import DataFrame as SparkDF

    from ..frame import LazyFrame

    if not (0.0 < alpha <= 1.0) or not (0.0 <= beta <= 1.0):
        raise ValueError("alpha must be in (0,1], beta in [0,1]")
    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    keys = [by] if isinstance(by, str) else list(by or [])
    v = F.col(value_col).cast("double")
    base = sdf.filter(v.isNotNull()).select(
        *keys, F.struct(F.col(ts_col).alias("t"), v.alias("x")).alias("__p__")
    )
    grouped = base.groupBy(*keys).agg(
        F.transform(F.array_sort(F.collect_list("__p__")), lambda p: p["x"]).alias("__xs__")
    )
    xs = F.col("__xs__")
    n = F.size(xs)
    a, b = float(alpha), float(beta)
    fold = F.aggregate(
        F.slice(xs, 3, F.greatest(n - 2, F.lit(0))),
        F.struct(
            F.element_at(xs, 1).alias("l"),
            (F.element_at(xs, 2) - F.element_at(xs, 1)).alias("b"),
        ),
        lambda acc, x: F.struct(
            (F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["b"])).alias("l"),
            (
                F.lit(b)
                * ((F.lit(a) * x + F.lit(1.0 - a) * (acc["l"] + acc["b"])) - acc["l"])
                + F.lit(1.0 - b) * acc["b"]
            ).alias("b"),
        ),
    )
    # the l_2/b_2 update for the SECOND point is the init itself (l=x1's
    # smoothed value): textbook init treats (x1, x2) as consumed; the fold
    # starts at x3.
    staged = grouped.select(
        *keys,
        n.cast("long").alias("n"),
        F.when(n >= 2, fold).alias("__f__"),
    )
    out = staged.select(
        *keys,
        "n",
        F.round(F.col("__f__.l"), round_to).alias("level"),
        F.round(F.col("__f__.b"), round_to).alias("trend"),
        F.round(F.col("__f__.l") + F.lit(float(horizon)) * F.col("__f__.b"), round_to).alias("forecast"),
    )
    return LazyFrame(out)


__all__.append("holt_forecast")
