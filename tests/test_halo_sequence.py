"""Round-8 halo refit: the unkeyed (by=None) forms of sessionize,
markov_transitions, frequent_sequences and time_weighted_average now ride
distsort halo buckets (operators/distsort.py with_halo_buckets) instead of
a warned single-partition global window.

Identity contract: by=None on multi-partition data must equal the keyed
path run with a constant key (the keyed path is the long-verified
reference), and the executed plan must not order the raw sequence without
a partition key."""

import datetime as dt
import warnings

import pytest

from polars_net_spark.operators.analytics import (
    frequent_sequences,
    markov_transitions,
    sessionize,
    time_weighted_average,
)


def rows(lf):
    return lf.collect().rows()


def _plan(lf):
    return lf.spark._jdf.queryExecution().executedPlan().toString()


def _events(spark, n=60, nparts=7):
    # irregular timestamps, repeating states, a few exact-duplicate ts to
    # exercise the tie handling (ties stay in one bucket)
    base = dt.datetime(2024, 3, 1)
    data = []
    for i in range(n):
        ts = base + dt.timedelta(minutes=(i * 7) % 97 + (i // 10) * 120)
        data.append((i, "k", ts, f"s{i % 4}", float((i * 13) % 29)))
    # duplicate-timestamp pair (distinct eid tie-break)
    data.append((n, "k", data[5][2], "s9", 3.5))
    return spark.createDataFrame(
        data, "eid long, g string, ts timestamp, state string, v double"
    ).repartition(nparts)


class TestSessionizeHalo:
    def test_matches_keyed_constant_key(self, spark):
        d = _events(spark)
        keyed = {
            r[0]: r[5]
            for r in rows(sessionize(d, "ts", by="g", gap="45 minutes", tie_cols=["eid"]))
        }
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            glob = {
                r[0]: r[5]
                for r in rows(sessionize(d, "ts", gap="45 minutes", tie_cols=["eid"]))
            }
        assert glob == keyed

    def test_plan_no_unkeyed_window(self, spark):
        d = _events(spark)
        p = _plan(sessionize(d, "ts", gap="45 minutes", tie_cols=["eid"]))
        assert "windowspecdefinition(__gb__" in p
        # no window orders the raw sequence without a partition key
        assert "windowspecdefinition(ts#" not in p
        assert "windowspecdefinition(__ord__#" not in p


class TestMarkovHalo:
    def test_matches_keyed_constant_key(self, spark):
        d = _events(spark)
        keyed = sorted(rows(markov_transitions(d, "state", "ts", by="g", tie_cols=["eid"])))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            glob = sorted(rows(markov_transitions(d, "state", "ts", tie_cols=["eid"])))
        assert glob == keyed

    def test_integer_order_column(self, spark):
        # numeric (non-temporal) sequence index works too
        d = spark.createDataFrame(
            [(i, f"s{(i * i) % 3}") for i in range(40)], "pos long, state string"
        ).repartition(5)
        keyed_d = d.withColumn("g", d.pos * 0)
        keyed = sorted(rows(markov_transitions(keyed_d, "state", "pos", by="g")))
        glob = sorted(rows(markov_transitions(d, "state", "pos")))
        assert glob == keyed


class TestFrequentSequencesHalo:
    @pytest.mark.parametrize("length", [2, 3, 5])
    def test_matches_keyed_constant_key(self, spark, length):
        d = _events(spark)
        keyed = sorted(
            rows(
                frequent_sequences(
                    d, "state", "ts", by="g", length=length, min_count=1, tie_cols=["eid"]
                )
            )
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            glob = sorted(
                rows(
                    frequent_sequences(
                        d, "state", "ts", length=length, min_count=1, tie_cols=["eid"]
                    )
                )
            )
        assert glob == keyed

    def test_halo_longer_than_thin_buckets(self, spark):
        # 12 rows under many partitions: bucket coalescing must keep the
        # 4-row lag chain exact (the halo-starvation bug class)
        d = spark.createDataFrame(
            [(i, f"s{i % 2}") for i in range(12)], "pos long, state string"
        ).repartition(11)
        keyed_d = d.withColumn("g", d.pos * 0)
        keyed = sorted(
            rows(frequent_sequences(keyed_d, "state", "pos", by="g", length=5, min_count=1))
        )
        glob = sorted(rows(frequent_sequences(d, "state", "pos", length=5, min_count=1)))
        assert glob == keyed


class TestTimeWeightedAverageHalo:
    # twa has no tie_cols parameter, so drop the duplicate-ts row: with a
    # tie the lag pairing among equal timestamps is nondeterministic in
    # BOTH paths (keyed and global), which would flake the identity check
    def test_matches_keyed_constant_key(self, spark):
        d = _events(spark).filter("eid < 60")
        keyed = rows(time_weighted_average(d, "ts", "v", by="g"))
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            glob = rows(time_weighted_average(d, "ts", "v"))
        assert len(glob) == 1 and len(keyed) == 1
        assert glob[0] == tuple(keyed[0][1:])  # drop the key column

    def test_step_method(self, spark):
        d = _events(spark).filter("eid < 60")
        keyed = rows(time_weighted_average(d, "ts", "v", by="g", method="step"))
        glob = rows(time_weighted_average(d, "ts", "v", method="step"))
        assert glob[0] == tuple(keyed[0][1:])
