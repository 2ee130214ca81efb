"""upsample + temporal rolling group-by (polars parity extras; frame.py)."""

import datetime as dt

import pytest

import polars_net_spark as pl
from polars_net_spark import col


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0), 1.0),
        (1, dt.datetime(2024, 1, 1, 2, 0), 2.0),
        (1, dt.datetime(2024, 1, 1, 5, 0), 5.0),
        (2, dt.datetime(2024, 1, 1, 1, 0), 10.0),
    ]
    return pl.LazyFrame(
        spark.createDataFrame(rows, "uid long, ts timestamp, v double")
    )


class TestUpsample:
    def test_grid_and_nulls(self, ev):
        out = ev.upsample("ts", "1h", group_by=["uid"]).sort("uid", "ts").collect().rows()
        g1 = [r for r in out if r[0] == 1]
        assert len(g1) == 6  # 00..05 hourly
        assert [r[2] for r in g1] == [1.0, None, 2.0, None, None, 5.0]
        g2 = [r for r in out if r[0] == 2]
        assert g2 == [(2, dt.datetime(2024, 1, 1, 1, 0), 10.0)]

    def test_off_grid_rows_drop(self, spark):
        # 0:30 is not on the grid anchored at 0:00 → polars drops it
        rows = [(1, dt.datetime(2024, 1, 1, 0, 0), 1.0), (1, dt.datetime(2024, 1, 1, 0, 30), 9.0),
                (1, dt.datetime(2024, 1, 1, 2, 0), 2.0)]
        lf = pl.LazyFrame(spark.createDataFrame(rows, "uid long, ts timestamp, v double"))
        out = lf.upsample("ts", "1h", group_by=["uid"]).sort("ts").collect().rows()
        assert [r[2] for r in out] == [1.0, None, 2.0]

    def test_forward_fill_chain(self, ev):
        out = (
            ev.upsample("ts", "1h", group_by=["uid"])
            .with_columns(
                col("v").forward_fill(order_by="ts", partition_by="uid").alias("vf")
            )
            .sort("uid", "ts")
            .collect()
            .rows()
        )
        g1 = [r[3] for r in out if r[0] == 1]
        assert g1 == [1.0, 1.0, 2.0, 2.0, 2.0, 5.0]

    def test_no_groups(self, spark):
        rows = [(dt.datetime(2024, 1, 1, 0, 0), 1.0), (dt.datetime(2024, 1, 1, 0, 2), 2.0)]
        lf = pl.LazyFrame(spark.createDataFrame(rows, "ts timestamp, v double"))
        out = lf.upsample("ts", "1m").sort("ts").collect().rows()
        assert len(out) == 3 and out[1][1] is None

    def test_bad_every(self, ev):
        with pytest.raises(ValueError):
            ev.upsample("ts", "-1h", group_by=["uid"])


class TestRollingFrame:
    def test_trailing_right_closed(self, ev):
        out = (
            ev.rolling("ts", "3h", group_by=["uid"])
            .agg(col("v").sum().alias("s"), col("v").count().alias("n"))
            .sort("uid", "ts")
            .collect()
            .rows()
        )
        assert [r[2] for r in out] == [1.0, 3.0, 5.0, 10.0]

    def test_closed_left(self, ev):
        out = (
            ev.rolling("ts", "3h", closed="left", group_by=["uid"])
            .agg(col("v").sum().alias("s"))
            .sort("uid", "ts")
            .collect()
            .rows()
        )
        assert [r[2] for r in out] == [None, 1.0, 2.0, None]

    def test_offset_forward_window(self, ev):
        # offset=0 → (t, t+3h]: the strictly-after window
        out = (
            ev.rolling("ts", "3h", offset="0h", group_by=["uid"])
            .agg(col("v").sum().alias("s"))
            .sort("uid", "ts")
            .collect()
            .rows()
        )
        assert [r[2] for r in out] == [2.0, 5.0, None, None]

    def test_named_agg_and_mean(self, ev):
        out = (
            ev.rolling("ts", "6h", closed="both", group_by=["uid"])
            .agg(m=col("v").mean())
            .sort("uid", "ts")
            .collect()
            .rows()
        )
        assert out[2][2] == pytest.approx((1 + 2 + 5) / 3)

    def test_ntz_input(self, spark, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = str(tmp_path / "ntz.parquet")
        tbl = pa.table(
            {
                "uid": pa.array([1, 1], pa.int64()),
                "ts": pa.array(
                    [dt.datetime(2024, 1, 1, 0, 0), dt.datetime(2024, 1, 1, 1, 0)],
                    pa.timestamp("us"),
                ),
                "v": pa.array([1.0, 2.0], pa.float64()),
            }
        )
        pq.write_table(tbl, path)
        lf = pl.scan_parquet(path, spark=spark)
        out = (
            lf.rolling("ts", "2h", closed="both", group_by=["uid"])
            .agg(col("v").sum().alias("s"))
            .sort("ts")
            .collect()
            .rows()
        )
        assert [r[2] for r in out] == [1.0, 3.0]

    def test_bad_args(self, ev):
        with pytest.raises(ValueError):
            ev.rolling("ts", "-1h", group_by=["uid"])
        with pytest.raises(ValueError):
            ev.rolling("ts", "1h", closed="weird", group_by=["uid"])
