"""As-of join — the reference's one genuinely custom operator (SURVEY §2.4).

Semantics from /root/reference native_shim/src/lazy.rs:502-569 and the oracle
test Polars.FSharp.Tests/ComplexTests.fs:475-533:

- strategy backward: match the greatest right.time <= left.time
- strategy forward:  match the smallest right.time >= left.time
- strategy nearest:  whichever of the two is closer (tie → backward)
- ``by``: match only within equal group keys
- ``tolerance``: if |left.time - matched.time| > tolerance → null match
- ``allow_eq=True``: equality counts as a match (reference default)

Implementation (union + ignore-nulls window, not a range join): tag left and
right rows, union them on (by, time), then ``last(right_value, ignorenulls)``
over a window partitioned by ``by`` ordered by (time, side).  One shuffle on
(by, time), no row explosion — at 100 TB this beats a range join because the
right side is never duplicated per left row and skew follows the ``by`` keys,
which AQE handles.

Without ``by`` the window has no natural partition key.  Pass
``range_buckets=N`` to enable the scale path: rows are range-bucketed on
approx-quantile time boundaries (computed in-plan, no driver action), each
bucket receives at most one injected "carrier" row per direction — the last
right row from all earlier buckets (backward) / the first right row from all
later buckets (forward) — and the window partitions by bucket.  Result is
row-identical to the single-window semantics (tested against it), but the
sort parallelizes across N buckets instead of one task.  Default
(``range_buckets=None``) keeps the sequential single-partition behavior,
matching polars' own constraint.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from .._fmt import parse_polars_duration_us
from ..frame import LazyFrame

__all__ = ["join_asof"]

_LEFT_COLS = "__asof_lv__"
_RIGHT_VAL = "__asof_rv__"
_RIGHT_T = "__asof_rt__"
_SIDE = "__asof_side__"


def _tolerance_micros(tolerance, on_is_timestamp: bool):
    if tolerance is None:
        return None
    if isinstance(tolerance, str):
        return parse_polars_duration_us(tolerance)
    return tolerance  # numeric 'on' column: tolerance in the column's own units


def _range_bucketize(unioned, num_buckets: int, strategy: str):
    """Scale path for asof without ``by``: assign every union row a range
    bucket from approx-quantile boundaries of the RIGHT side's times
    (computed inside the plan — no driver action), then inject per-bucket
    carrier rows so cross-boundary matches survive:

    - backward: each bucket gets the last right row from all earlier buckets
    - forward:  each bucket gets the first right row from all later buckets

    Carrier t is provably outside the bucket's own time range (bucket(t) is
    monotone in t), so tie-order semantics inside the bucket are untouched.
    The carrier computation runs on ≤ num_buckets rows (per-bucket extremes),
    so its single-partition window is bounded by construction."""
    fracs = [i / num_buckets for i in range(1, num_buckets)]
    bounds = (
        unioned.filter(F.col(_SIDE) == 0)
        .agg(F.percentile_approx("__t__", fracs, 10_000).alias("__bounds__"))
    )
    u = unioned.crossJoin(F.broadcast(bounds))
    bucket = F.coalesce(
        F.size(F.filter(F.col("__bounds__"), lambda x: x <= F.col("__t__"))),
        F.lit(0),
    )
    u = u.withColumn("__bkt__", bucket).drop("__bounds__")
    left_struct_t = u.schema[_LEFT_COLS].dataType

    rights = u.filter(F.col(_SIDE) == 0)
    all_b = u.select("__bkt__").distinct()
    carriers = []
    if strategy in ("backward", "nearest"):
        per_b = rights.groupBy("__bkt__").agg(
            F.max_by(
                F.struct(F.col(_RIGHT_VAL), F.col(_RIGHT_T), F.col("__t__")),
                F.col("__t__"),
            ).alias("__s__")
        )
        w = Window.orderBy("__bkt__").rowsBetween(Window.unboundedPreceding, -1)
        carriers.append(
            all_b.join(per_b, "__bkt__", "left")
            .withColumn("__c__", F.last("__s__", ignorenulls=True).over(w))
            .filter(F.col("__c__").isNotNull())
        )
    if strategy in ("forward", "nearest"):
        per_b = rights.groupBy("__bkt__").agg(
            F.min_by(
                F.struct(F.col(_RIGHT_VAL), F.col(_RIGHT_T), F.col("__t__")),
                F.col("__t__"),
            ).alias("__s__")
        )
        w = Window.orderBy("__bkt__").rowsBetween(1, Window.unboundedFollowing)
        carriers.append(
            all_b.join(per_b, "__bkt__", "left")
            .withColumn("__c__", F.first("__s__", ignorenulls=True).over(w))
            .filter(F.col("__c__").isNotNull())
        )
    for c in carriers:
        rows = c.select(
            F.col("__c__").getField("__t__").alias("__t__"),
            F.col("__c__").getField(_RIGHT_VAL).alias(_RIGHT_VAL),
            F.col("__c__").getField(_RIGHT_T).alias(_RIGHT_T),
            F.lit(0).alias(_SIDE),
            F.lit(None).cast("long").alias("__lid__"),
            F.lit(None).cast(left_struct_t).alias(_LEFT_COLS),
            F.col("__bkt__"),
        )
        u = u.unionByName(rows.select(u.columns))
    return u


def join_asof(
    left: LazyFrame,
    right: LazyFrame,
    on: str | None = None,
    left_on: str | None = None,
    right_on: str | None = None,
    by: str | Sequence[str] | None = None,
    by_left: Sequence[str] | None = None,
    by_right: Sequence[str] | None = None,
    strategy: str = "backward",
    tolerance=None,
    suffix: str = "_right",
    allow_exact_matches: bool = True,
    range_buckets: int | None = None,
) -> LazyFrame:
    lon = left_on or on
    ron = right_on or on
    if lon is None or ron is None:
        raise ValueError("join_asof needs on= or left_on=/right_on=")
    if strategy not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown strategy {strategy!r}")

    by_l = [by] if isinstance(by, str) else list(by or by_left or [])
    by_r = [by] if isinstance(by, str) else list(by or by_right or [])

    lsdf, rsdf = left._sdf, right._sdf
    on_type = dict(lsdf.dtypes)[lon]
    is_ts = "timestamp" in on_type
    tol = _tolerance_micros(tolerance, is_ts)

    def _t(c: Column) -> Column:
        # cast handles TIMESTAMP_NTZ (parquet timestamps without tz read as NTZ)
        return F.unix_micros(c.cast("timestamp")) if is_ts else c.cast("double")

    # right side: pack non-key payload into one struct so the window carries a
    # single value column regardless of width
    r_payload = [c for c in rsdf.columns if c != ron and c not in by_r]
    r_prep = rsdf.select(
        *[F.col(k).alias(f"__by{i}__") for i, k in enumerate(by_r)],
        _t(F.col(ron)).alias("__t__"),
        F.struct(*[F.col(c) for c in r_payload]).alias(_RIGHT_VAL),
        _t(F.col(ron)).alias(_RIGHT_T),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast("long").alias("__lid__"),
        F.lit(None).alias(_LEFT_COLS),
    )
    l_prep = lsdf.select(
        *[F.col(k).alias(f"__by{i}__") for i, k in enumerate(by_l)],
        _t(F.col(lon)).alias("__t__"),
        F.lit(None).cast(r_prep.schema[_RIGHT_VAL].dataType).alias(_RIGHT_VAL),
        F.lit(None).cast("long" if not is_ts else "long").alias(_RIGHT_T),
        F.lit(1).alias(_SIDE),
        F.monotonically_increasing_id().alias("__lid__"),
        F.struct(*[F.col(c) for c in lsdf.columns]).alias(_LEFT_COLS),
    )
    r_prep = r_prep.select(l_prep.columns)  # align column order
    unioned = l_prep.unionByName(r_prep)

    by_cols = [F.col(f"__by{i}__") for i in range(len(by_l))]

    if range_buckets and not by_cols:
        unioned = _range_bucketize(unioned, range_buckets, strategy)
        by_cols = [F.col("__bkt__")]

    # side order: for allow_eq, right rows at equal t must sort BEFORE left in
    # backward (so last() sees them) and AFTER left in forward (so first() sees them)
    # With the side tag in the sort key, frame bounds stay (preceding..current)
    # and (current..following); only the tie order flips for allow_eq:
    #   backward+eq:  right sorts BEFORE left at equal t → last() sees it
    #   backward+!eq: right sorts AFTER  left at equal t → excluded
    #   forward+eq:   right sorts AFTER  left at equal t → first() sees it
    #   forward+!eq:  right sorts BEFORE left at equal t → excluded
    if strategy in ("backward", "nearest"):
        tie = F.col(_SIDE).asc() if allow_exact_matches else F.col(_SIDE).desc()
        w_back = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col("__t__").asc(), tie)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    if strategy in ("forward", "nearest"):
        tie = F.col(_SIDE).desc() if allow_exact_matches else F.col(_SIDE).asc()
        w_fwd = (
            Window.partitionBy(*by_cols)
            .orderBy(F.col("__t__").asc(), tie)
            .rowsBetween(0, Window.unboundedFollowing)
        )

    stage = unioned
    if strategy in ("backward", "nearest"):
        stage = stage.withColumn("__bv__", F.last(_RIGHT_VAL, ignorenulls=True).over(w_back))
        stage = stage.withColumn("__bt__", F.last(_RIGHT_T, ignorenulls=True).over(w_back))
    if strategy in ("forward", "nearest"):
        stage = stage.withColumn("__fv__", F.first(_RIGHT_VAL, ignorenulls=True).over(w_fwd))
        stage = stage.withColumn("__ft__", F.first(_RIGHT_T, ignorenulls=True).over(w_fwd))

    lefts = stage.filter(F.col(_SIDE) == 1)

    if strategy == "backward":
        matched_v, matched_t = F.col("__bv__"), F.col("__bt__")
    elif strategy == "forward":
        matched_v, matched_t = F.col("__fv__"), F.col("__ft__")
    else:  # nearest: closer of the two; tie → backward
        bdist = F.col("__t__") - F.col("__bt__")
        fdist = F.col("__ft__") - F.col("__t__")
        use_b = F.col("__bt__").isNotNull() & (F.col("__ft__").isNull() | (bdist <= fdist))
        matched_v = F.when(use_b, F.col("__bv__")).otherwise(F.col("__fv__"))
        matched_t = F.when(use_b, F.col("__bt__")).otherwise(F.col("__ft__"))

    if tol is not None:
        within = F.abs(F.col("__t__") - matched_t) <= F.lit(tol)
        matched_v = F.when(within, matched_v)

    lcols = lsdf.columns
    out_cols = [F.col(f"{_LEFT_COLS}.{c}").alias(c) for c in lcols]
    for c in r_payload:
        name = c + suffix if c in lcols else c
        out_cols.append(matched_v.getField(c).alias(name))
    return LazyFrame(lefts.select(*out_cols))
