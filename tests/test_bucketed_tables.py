"""Storage-level bucketing: write_bucketed + read_table produce co-located
joins and aggregations WITHOUT an exchange — the pay-the-shuffle-once-at-
ingest pattern for 100 TB fact tables."""

import pytest

import polars_net_spark as pl


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    a = pl.from_records([(i, float(i)) for i in range(100)], ["k", "va"]).lazy()
    b = pl.from_records([(i, i * 10) for i in range(100)], ["k", "vb"]).lazy()
    pl.write_bucketed(a, "t_buck_a", "k", num_buckets=8, sort_by="k")
    pl.write_bucketed(b, "t_buck_b", "k", num_buckets=8, sort_by="k")
    yield "t_buck_a", "t_buck_b"
    spark.sql("DROP TABLE IF EXISTS t_buck_a")
    spark.sql("DROP TABLE IF EXISTS t_buck_b")


def test_join_without_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    # tiny tables would broadcast (bucketing "disabled by query planner");
    # force the sort-merge path a 100 TB fact-fact join takes
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = pl.read_table(ta).join(pl.read_table(tb), on="k")
        plan = j._sdf._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket metadata kills the shuffle
        assert "Bucketed: true" in plan
        assert j.collect().height == 100
        rows = dict((r[0], (r[1], r[2])) for r in j.collect().rows())
        assert rows[7] == (7.0, 70)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_groupby_without_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    g = pl.read_table(ta).group_by("k").agg(pl.col("va").sum().alias("s"))
    plan = g._sdf._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert g.collect().height == 100


def test_unbucketed_join_has_exchange(spark, bucketed_pair):
    """Control: the same join through plain frames DOES shuffle."""
    a = pl.from_records([(i, float(i)) for i in range(100)], ["k", "va"]).lazy()
    b = pl.from_records([(i, i * 10) for i in range(100)], ["k", "vb"]).lazy()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, on="k")
        plan = j._sdf._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
