import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import polars_net_spark as pl  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = pl.get_spark(app_name="polars_net_spark_tests", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def people(spark):
    """FIXTURES.md F1."""
    return pl.from_records(
        [("Alice", 25, 100.0), ("Bob", 30, 200.0), ("Charlie", 35, 300.0)],
        ["name", "age", "salary"],
    )
