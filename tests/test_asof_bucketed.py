"""Range-bucketed asof (scale path for asof without `by`): must be
row-identical to the single-window reference implementation."""

import polars_net_spark as pl
from polars_net_spark.operators.asof import join_asof


def _lcg(seed):
    x = seed
    while True:
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        yield x


def frames(spark):
    g = _lcg(7)
    left_rows = [(i, float(next(g) % 10_000)) for i in range(400)]
    right_rows = [(j, float(next(g) % 10_000), float(j) * 0.5) for j in range(250)]
    left = pl.from_records(left_rows, ["lid", "t"]).lazy()
    right = pl.from_records(right_rows, ["rid", "t", "val"]).lazy()
    return left, right


def _sorted_rows(lf):
    return sorted(
        (tuple(r) for r in lf.collect().rows()),
        key=lambda r: tuple((v is None, v) for v in r),
    )


def test_bucketed_asof_matches_reference_all_strategies(spark):
    left, right = frames(spark)
    for strategy in ("backward", "forward", "nearest"):
        for allow_eq in (True, False):
            base = join_asof(
                left, right, on="t", strategy=strategy, allow_exact_matches=allow_eq
            )
            bucketed = join_asof(
                left, right, on="t", strategy=strategy,
                allow_exact_matches=allow_eq, range_buckets=8,
            )
            assert _sorted_rows(bucketed) == _sorted_rows(base), (strategy, allow_eq)


def test_bucketed_asof_with_tolerance(spark):
    left, right = frames(spark)
    base = join_asof(left, right, on="t", strategy="backward", tolerance=50.0)
    bucketed = join_asof(
        left, right, on="t", strategy="backward", tolerance=50.0, range_buckets=16
    )
    assert _sorted_rows(bucketed) == _sorted_rows(base)
    # tolerance actually nulls some matches in this data
    assert any(r[-1] is None for r in _sorted_rows(bucketed))


def test_bucketed_asof_window_is_partitioned(spark):
    left, right = frames(spark)
    out = join_asof(left, right, on="t", range_buckets=8)
    plan = out._sdf._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(__bkt__" in plan  # the big window shuffles by bucket


def test_bucketed_asof_empty_right(spark):
    left, _ = frames(spark)
    right = (
        pl.from_records([(0, 0.0, 0.0)], ["rid", "t", "val"])
        .lazy()
        .filter(pl.col("rid") < 0)
    )
    out = join_asof(left, right, on="t", range_buckets=4)
    rows = out.collect().rows()
    assert len(rows) == 400
    assert all(r[2] is None and r[3] is None for r in rows)
