"""scan_jdbc end-to-end against embedded Derby (bundled with Spark's jars).

The reference streams DB rows via IDataReader→Arrow
(Polars.NET.Core/Data/DbToArrowStream.cs:10-50, Polars.FSharp/Types.fs:1342-1363);
Spark's JDBC source adds range-partitioned parallel reads on top.  local-mode
executors share the JVM, so an in-memory Derby database is reachable from
tasks — this is a REAL read through the DataSource, not a mock."""

import polars_net_spark as pl
from polars_net_spark import col

URL = "jdbc:derby:memory:pnstest;create=true"
DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _seed_db(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    try:
        st.executeUpdate("DROP TABLE items")
    except Exception:
        pass
    st.executeUpdate("CREATE TABLE items (id INT, name VARCHAR(32), price DOUBLE)")
    ps = conn.prepareStatement("INSERT INTO items VALUES (?, ?, ?)")
    for i in range(100):
        ps.setInt(1, i)
        ps.setString(2, f"item{i}")
        ps.setDouble(3, float(i) * 1.5)
        ps.addBatch()
    ps.executeBatch()
    st.close()
    conn.close()


def test_scan_jdbc_roundtrip(spark):
    _seed_db(spark)
    lf = pl.scan_jdbc(URL, "items", properties={"driver": DRIVER})
    out = lf.filter(col("ID") > 95).sort("ID").collect()
    assert out.rows() == [
        (96, "item96", 144.0),
        (97, "item97", 145.5),
        (98, "item98", 147.0),
        (99, "item99", 148.5),
    ]


def test_scan_jdbc_partitioned_read(spark):
    _seed_db(spark)
    lf = pl.scan_jdbc(
        URL,
        "items",
        properties={"driver": DRIVER},
        partition_column="ID",
        num_partitions=4,
        lower_bound=0,
        upper_bound=100,
    )
    assert lf._sdf.rdd.getNumPartitions() == 4
    assert lf.collect().height == 100  # partition predicates cover all rows
    total = lf.select(col("PRICE").sum().alias("s")).collect().rows()[0][0]
    assert total == sum(i * 1.5 for i in range(100))


def test_scan_jdbc_filter_pushdown(spark):
    """The relational filter must reach the JDBC source as a pushed predicate
    (at scale the DB prunes, not Spark)."""
    _seed_db(spark)
    lf = pl.scan_jdbc(URL, "items", properties={"driver": DRIVER})
    filtered = lf.filter(col("ID") < 10)._sdf
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "ID" in plan
    assert filtered.count() == 10


# -- write path (reference ArrowToDbStream.cs:10-50 / Types.fs:1395-1444 SinkTo,
#    exercised by the MsSqlFixture ETL round-trip in
#    Polars.CSharp.Tests/IntegrationTests.cs:17) ---------------------------------


def test_sink_jdbc_append_roundtrip(spark):
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(URL)
    st = conn.createStatement()
    try:
        st.executeUpdate("DROP TABLE out_items")
    except Exception:
        pass
    st.executeUpdate(
        "CREATE TABLE out_items (id INT, name VARCHAR(32), price DOUBLE)"
    )
    st.close()
    conn.close()

    df = pl.from_records(
        [(1, "a", 1.5), (2, "b", 3.0), (3, "c", 4.5)],
        schema=["id", "name", "price"],
        spark=spark,
    )
    df.write_jdbc(URL, "out_items", mode="append", properties={"driver": DRIVER},
                  batch_size=2)
    back = pl.scan_jdbc(URL, "out_items", properties={"driver": DRIVER})
    assert sorted(back.collect().rows()) == [(1, "a", 1.5), (2, "b", 3.0), (3, "c", 4.5)]

    # append again: rows accumulate (the ArrowToDbStream bulk-insert semantics)
    df.write_jdbc(URL, "out_items", mode="append", properties={"driver": DRIVER})
    assert pl.scan_jdbc(URL, "out_items", properties={"driver": DRIVER}).collect().height == 6


def test_sink_jdbc_overwrite_and_etl_roundtrip(spark):
    """The MsSqlFixture shape: read from DB, transform, write back, read back."""
    _seed_db(spark)
    lf = pl.scan_jdbc(URL, "items", properties={"driver": DRIVER})
    top = lf.filter(col("ID") >= 98).with_columns(
        (col("PRICE") * 2).alias("PRICE")
    )
    top.sink_jdbc(URL, "items_out", mode="overwrite", properties={"driver": DRIVER})
    back = pl.scan_jdbc(URL, "items_out", properties={"driver": DRIVER}).sort("ID").collect()
    assert back.rows() == [(98, "item98", 294.0), (99, "item99", 297.0)]

    # overwrite replaces
    lf.filter(col("ID") == 0).sink_jdbc(
        URL, "items_out", mode="overwrite", properties={"driver": DRIVER},
        num_partitions=1,
    )
    assert pl.scan_jdbc(URL, "items_out", properties={"driver": DRIVER}).collect().rows() == [
        (0, "item0", 0.0)
    ]


def test_sink_jdbc_validates_mode_and_properties(spark):
    """r11 ADVICE: a mode typo or a properties key that collides with the
    explicit url/dbtable/batchsize/truncate options must fail up front,
    before any plan execution starts."""
    import pytest

    df = pl.from_records([(1, "a")], ["id", "name"])
    with pytest.raises(ValueError, match="mode 'apend'"):
        df.write_jdbc(URL, "items_out", mode="apend", properties={"driver": DRIVER})
    with pytest.raises(ValueError, match="collide"):
        df.write_jdbc(
            URL, "items_out", mode="append",
            properties={"driver": DRIVER, "dbtable": "sneaky"},
        )
