"""SQLContext: register frames as tables, execute SQL → LazyFrame.

Exact semantic match to /root/reference native_shim/src/sql.rs:7-64 — a
register/execute pair where execution returns a *lazy* frame — realised as
temp views + ``spark.sql`` (SURVEY §2.13).  Spark's dialect is a strict
superset of the polars-sql subset the reference exercises.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .frame import DataFrame, LazyFrame

__all__ = ["SQLContext", "sql"]


class SQLContext:
    def __init__(self, spark: SparkSession | None = None, **frames: "LazyFrame | DataFrame"):
        self._spark = spark or SparkSession.getActiveSession()
        if self._spark is None:
            raise RuntimeError("no active SparkSession")
        self._tables: dict[str, LazyFrame] = {}
        for name, frame in frames.items():
            self.register(name, frame)

    def register(self, name: str, frame: "LazyFrame | DataFrame") -> "SQLContext":
        lf = frame.lazy() if isinstance(frame, DataFrame) else frame
        lf._sdf.createOrReplaceTempView(name)
        self._tables[name] = lf
        return self

    def unregister(self, name: str) -> "SQLContext":
        self._spark.catalog.dropTempView(name)
        self._tables.pop(name, None)
        return self

    def tables(self) -> list[str]:
        return sorted(self._tables)

    def execute(self, query: str) -> LazyFrame:
        return LazyFrame(self._spark.sql(query))


def sql(query: str, spark: SparkSession | None = None, **frames) -> LazyFrame:
    """polars pl.sql: run SQL over the given frames (registered as temp
    views by keyword name for this call) and return a LazyFrame.  Without
    frames it queries whatever views are already registered."""
    ctx = SQLContext(spark=spark, **frames)
    return ctx.execute(query)
