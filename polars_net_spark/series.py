"""Series: named single-column facade over a one-column LazyFrame.

The reference's Series (/root/reference native_shim/src/types.rs:24-26,
series.rs) is an eager chunked Arrow column with scalar access, broadcasting
arithmetic, and 1-row aggregations.  Spark has no first-class column container,
so Series wraps a single-column frame (SURVEY §1.1) and compiles element-wise
ops to Column expressions.  Aggregations return Python scalars (the reference
returns 1-row Series — scalar is the idiomatic Python rendering).
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .exprs import Expr, _to_spark_type, col
from .frame import DataFrame, LazyFrame

__all__ = ["Series"]


class Series:
    def __init__(self, name: str, values: Sequence[Any] | None = None, dtype: str | None = None):
        if values is None:
            raise ValueError("Series needs values (or use Series._from_lazy)")
        spark = SparkSession.getActiveSession()
        if spark is None:
            raise RuntimeError("no active SparkSession")
        import pandas as pd

        pdf = pd.DataFrame({name: list(values)})
        sdf = spark.createDataFrame(pdf)
        if dtype is not None:
            sdf = sdf.select(F.col(name).cast(_to_spark_type(dtype)).alias(name))
        self._lf = LazyFrame(sdf)
        self._name = name

    @classmethod
    def _from_lazy(cls, lf: LazyFrame, name: str) -> "Series":
        s = object.__new__(cls)
        s._lf = lf
        s._name = name
        return s

    # -- introspection ------------------------------------------------------
    @property
    def name(self) -> str:
        return self._name

    @property
    def dtype(self) -> str:
        return self._lf.dtypes[0][1]

    def len(self) -> int:
        return self._lf._sdf.count()

    def __len__(self) -> int:
        return self.len()

    def rename(self, name: str) -> "Series":
        return Series._from_lazy(self._lf.select(col(self._name).alias(name)), name)

    # -- data access --------------------------------------------------------
    def to_list(self) -> list:
        return [r[0] for r in self._lf._sdf.collect()]

    def to_pandas(self):
        return self._lf._sdf.toPandas()[self._name]

    def item(self, index: int = 0) -> Any:
        rows = self._lf._sdf.take(index + 1)
        if len(rows) <= index:
            raise IndexError(index)
        return rows[index][0]

    def __getitem__(self, index: int) -> Any:
        return self.item(index)

    def slice(self, offset: int, length: int) -> "Series":
        from pyspark.sql import Window

        lf = self._lf.with_row_index("__i__")
        w = F.row_number().over(Window.orderBy("__i__")) - 1
        out = lf._sdf.withColumn("__rn__", w).filter(
            (F.col("__rn__") >= offset) & (F.col("__rn__") < offset + length)
        )
        return Series._from_lazy(LazyFrame(out.select(self._name)), self._name)

    # -- element-wise ops (series.rs:560-663) --------------------------------
    def _binop(self, other: Any, fn) -> "Series":
        c = F.col(self._name)
        if isinstance(other, Series):
            from .operators.horizontal import concat_horizontal

            joined = concat_horizontal([self._lf, other.rename("__other__")._lf])
            out = joined._sdf.select(fn(F.col(self._name), F.col("__other__")).alias(self._name))
            return Series._from_lazy(LazyFrame(out), self._name)
        out = self._lf._sdf.select(fn(c, F.lit(other)).alias(self._name))
        return Series._from_lazy(LazyFrame(out), self._name)

    def __add__(self, o):
        return self._binop(o, lambda a, b: a + b)

    def __sub__(self, o):
        return self._binop(o, lambda a, b: a - b)

    def __mul__(self, o):
        return self._binop(o, lambda a, b: a * b)

    def __truediv__(self, o):
        return self._binop(o, lambda a, b: a / b)

    def eq(self, o):
        return self._binop(o, lambda a, b: a == b)

    def neq(self, o):
        return self._binop(o, lambda a, b: a != b)

    def gt(self, o):
        return self._binop(o, lambda a, b: a > b)

    def gt_eq(self, o):
        return self._binop(o, lambda a, b: a >= b)

    def lt(self, o):
        return self._binop(o, lambda a, b: a < b)

    def lt_eq(self, o):
        return self._binop(o, lambda a, b: a <= b)

    # -- aggregations (series.rs:669-716) ------------------------------------
    def _agg(self, fn) -> Any:
        return self._lf._sdf.agg(fn(F.col(self._name)).alias("v")).collect()[0][0]

    def sum(self) -> Any:
        return self._agg(F.sum)

    def mean(self) -> Any:
        return self._agg(F.avg)

    def min(self) -> Any:
        return self._agg(F.min)

    def max(self) -> Any:
        return self._agg(F.max)

    def std(self, ddof: int = 1) -> Any:
        return self._agg(F.stddev_samp if ddof == 1 else F.stddev_pop)

    def var(self, ddof: int = 1) -> Any:
        return self._agg(F.var_samp if ddof == 1 else F.var_pop)

    def median(self) -> Any:
        return self._agg(F.median)

    def n_unique(self) -> int:
        row = self._lf._sdf.select(
            F.count_distinct(F.col(self._name)).alias("n")
        ).collect()[0]
        return int(row["n"])

    def mode(self) -> Any:
        """Most frequent value (smallest on ties, matching Expr.mode)."""
        rows = (
            self._lf._sdf.groupBy(self._name)
            .agg(F.count(F.lit(1)).alias("__n__"))
            .orderBy(F.col("__n__").desc(), F.col(self._name).asc())
            .take(1)
        )
        return rows[0][0] if rows else None

    def value_counts(self) -> "Any":
        """(value, count) frame sorted by count desc, value asc."""
        from .frame import DataFrame, LazyFrame

        out = (
            self._lf._sdf.groupBy(self._name)
            .agg(F.count(F.lit(1)).cast("long").alias("count"))
            .orderBy(F.col("count").desc(), F.col(self._name).asc())
        )
        return DataFrame(LazyFrame(out))

    def null_count(self) -> int:
        return self._lf._sdf.filter(F.col(self._name).isNull()).count()

    # -- predicates (series.rs:719-753, 403-436) ------------------------------
    def is_null(self) -> "Series":
        return Series._from_lazy(
            self._lf.select(col(self._name).is_null().alias(self._name)), self._name
        )

    def is_not_null(self) -> "Series":
        return Series._from_lazy(
            self._lf.select(col(self._name).is_not_null().alias(self._name)), self._name
        )

    def is_nan(self) -> "Series":
        return Series._from_lazy(
            self._lf.select(col(self._name).is_nan().alias(self._name)), self._name
        )

    def is_finite(self) -> "Series":
        return Series._from_lazy(
            self._lf.select(col(self._name).is_finite().alias(self._name)), self._name
        )

    # -- positional kernels (polars Series.arg_* / search_sorted) ------------
    def _dense_indexed(self):
        """(value, __i__) with a DENSE 0..n-1 position: row_number over the
        sparse order id — a single-task window, fine for eager Series kernels
        (same pattern as slice())."""
        from pyspark.sql import Window

        lf = self._lf.with_row_index("__mono__")
        w = F.row_number().over(Window.orderBy("__mono__")) - 1
        return lf._sdf.withColumn("__i__", w).select(self._name, "__i__")

    def arg_max(self) -> int | None:
        """Index of the maximum (first occurrence on ties, nulls ignored)."""
        rows = (
            self._dense_indexed()
            .filter(F.col(self._name).isNotNull())
            .orderBy(F.col(self._name).desc(), F.col("__i__").asc())
            .select("__i__")
            .take(1)
        )
        return int(rows[0][0]) if rows else None

    def arg_min(self) -> int | None:
        """Index of the minimum (first occurrence on ties, nulls ignored)."""
        rows = (
            self._dense_indexed()
            .filter(F.col(self._name).isNotNull())
            .orderBy(F.col(self._name).asc(), F.col("__i__").asc())
            .select("__i__")
            .take(1)
        )
        return int(rows[0][0]) if rows else None

    def arg_sort(self, descending: bool = False, nulls_last: bool = False) -> "Series":
        """Indices that would sort the series (polars arg_sort: stable, nulls
        first unless nulls_last)."""
        c = F.col(self._name)
        if descending:
            order = c.desc_nulls_last() if nulls_last else c.desc_nulls_first()
        else:
            order = c.asc_nulls_last() if nulls_last else c.asc_nulls_first()
        out = (
            self._dense_indexed()
            .orderBy(order, F.col("__i__").asc())
            .select(F.col("__i__").cast("long").alias(self._name))
        )
        return Series._from_lazy(LazyFrame(out), self._name)

    def search_sorted(self, element: Any, side: str = "left") -> int:
        """Insertion index that keeps a sorted series sorted: count of values
        strictly below (side='left') or not above (side='right') the element."""
        c = F.col(self._name)
        if side == "left":
            pred = c < F.lit(element)
        elif side == "right":
            pred = c <= F.lit(element)
        else:
            raise ValueError(f"side={side!r} must be 'left' or 'right'")
        row = self._lf._sdf.select(
            F.sum(F.when(pred, 1).otherwise(0)).alias("n")
        ).collect()[0]
        return int(row["n"] or 0)

    def unique_counts(self) -> "Series":
        """Counts of unique values in order of first appearance (polars
        unique_counts)."""
        out = (
            self._dense_indexed()
            .groupBy(self._name)
            .agg(F.count(F.lit(1)).alias("__n__"), F.min("__i__").alias("__first__"))
            .orderBy("__first__")
            .select(F.col("__n__").cast("long").alias(self._name))
        )
        return Series._from_lazy(LazyFrame(out), self._name)

    def cast(self, dtype: str, strict: bool = False) -> "Series":
        return Series._from_lazy(
            self._lf.select(col(self._name).cast(dtype, strict).alias(self._name)), self._name
        )

    # -- frame bridge --------------------------------------------------------
    def to_frame(self) -> DataFrame:
        return DataFrame(self._lf)

    def to_arrow(self):
        return self._lf._sdf.toArrow().column(0)


def _series_ext():  # appended methods (round 4): positional + hygiene ops
    def _elem(self, expr: Expr) -> "Series":
        return Series._from_lazy(
            self._lf.select(expr.alias(self._name)), self._name
        )

    def abs(self) -> "Series":
        return _elem(self, col(self._name).abs())

    def round(self, decimals: int = 0) -> "Series":
        return _elem(self, col(self._name).round(decimals))

    def fill_null(self, value) -> "Series":
        return _elem(self, col(self._name).fill_null(value))

    def head(self, n: int = 10) -> "Series":
        return Series._from_lazy(self._lf.limit(n), self._name)

    def tail(self, n: int = 10) -> "Series":
        return Series._from_lazy(self._lf.tail(n), self._name)

    def filter(self, mask_fn) -> "Series":
        """Keep elements where ``mask_fn(col)`` holds (callable form — a
        distributed Series has no positional boolean-mask zip)."""
        return Series._from_lazy(
            self._lf.filter(mask_fn(col(self._name))), self._name
        )

    def sort(self, descending: bool = False) -> "Series":
        return Series._from_lazy(
            self._lf.sort(self._name, descending=descending), self._name
        )

    def shift(self, n: int = 1) -> "Series":
        lf = self._lf._order_col()  # shift needs the hidden row-order column
        return Series._from_lazy(
            LazyFrame(
                lf._sdf.select(
                    col(self._name).shift(n).to_column().alias(self._name)
                )
            ),
            self._name,
        )

    def append(self, other: "Series") -> "Series":
        out = self._lf._drop_order()._sdf.unionByName(
            other._lf._drop_order()._sdf.withColumnRenamed(other._name, self._name)
        )
        return Series._from_lazy(LazyFrame(out), self._name)

    def rename_local(self, name: str) -> "Series":
        return Series._from_lazy(
            LazyFrame(self._lf._sdf.withColumnRenamed(self._name, name)), name
        )

    for fn in (abs, round, fill_null, head, tail, filter, sort, shift, append):
        setattr(Series, fn.__name__, fn)


_series_ext()
del _series_ext
