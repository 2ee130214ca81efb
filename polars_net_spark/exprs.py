"""Expr: composable column expressions compiled directly to pyspark Columns.

Mirrors the reference's expression surface (/root/reference native_shim/src/expr.rs,
~120 constructors; F# namespaces Polars.FSharp/Exprs.fs:22-30) but compiles each
node straight to a ``pyspark.sql.Column`` — no custom IR, Catalyst is the
optimizer (SURVEY.md §4).  Namespaces: ``.str``, ``.dt``, ``.list``, ``.struct``,
``.name`` as accessor objects, like the reference.

Positional operations (shift/diff/rolling/fills) are window functions in Spark
and therefore need an ordering.  Polars implicitly uses the frame's row order;
a distributed engine has none, so these take an ``order_by`` argument and
default to the hidden row-order column that ``LazyFrame.with_row_index()``
maintains (SURVEY.md §7.0).  Scale note: an *unpartitioned* positional window
is a single-task bottleneck by construction — callers should supply
``partition_by`` (e.g. via ``.over()``) at 100 TB.
"""

from __future__ import annotations

import warnings
from typing import Any, Iterable, Sequence

from pyspark.sql import Column, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._fmt import parse_polars_duration_us, strftime_to_java

__all__ = [
    "Expr",
    "col",
    "cols",
    "lit",
    "lit_datetime",
    "when",
    "concat_str",
    "corr",
    "cov",
    "ROW_ORDER_COL",
]

ROW_ORDER_COL = "__row_order__"

_NO_DEFAULT = object()  # sentinel: replace_strict without a default aborts

def _pb(partition_by) -> list:
    """Normalize partition_by: a bare string/Expr means ONE key (iterating a
    str would silently split it into characters)."""
    if partition_by is None:
        return []
    if isinstance(partition_by, (str, Expr, Column)):
        return [partition_by]
    return list(partition_by)


# ---------------------------------------------------------------------------
# dtype name → Spark type. Mirrors the reference's canonical enum
# (native_shim/src/datatypes.rs:51-79) with the documented widenings for
# unsigned ints / Time / Categorical (SURVEY.md §1.3).
_DTYPES: dict[str, T.DataType] = {
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "i8": T.ByteType(),
    "int8": T.ByteType(),
    "i16": T.ShortType(),
    "int16": T.ShortType(),
    "i32": T.IntegerType(),
    "int32": T.IntegerType(),
    "int": T.IntegerType(),
    "i64": T.LongType(),
    "int64": T.LongType(),
    "long": T.LongType(),
    "u8": T.ShortType(),  # widened: Spark has no unsigned ints
    "u16": T.IntegerType(),
    "u32": T.LongType(),
    "u64": T.DecimalType(20, 0),
    "f32": T.FloatType(),
    "float32": T.FloatType(),
    "float": T.FloatType(),
    "f64": T.DoubleType(),
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "str": T.StringType(),
    "string": T.StringType(),
    "utf8": T.StringType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "timestamp": T.TimestampType(),
    "datetime_ntz": T.TimestampNTZType(),
    "time": T.LongType(),  # nanoseconds since midnight (reference Time dtype)
    "duration": T.DayTimeIntervalType(),
    "binary": T.BinaryType(),
    "null": T.NullType(),
    "categorical": T.StringType(),  # erased to string (no categorical-specific ops in ref)
}


def _to_spark_type(dtype: str | T.DataType) -> T.DataType:
    if isinstance(dtype, T.DataType):
        return dtype
    key = dtype.strip().lower()
    if key in _DTYPES:
        return _DTYPES[key]
    if key.startswith("decimal"):
        inner = key[key.index("(") + 1 : key.index(")")]
        p, s = (int(x) for x in inner.split(","))
        return T.DecimalType(p, s)
    if any(key.startswith(p) for p in ("struct<", "array<", "map<")):
        # nested DDL strings ("struct<k:int>", "array<double>")
        return T._parse_datatype_string(dtype)
    raise ValueError(f"unknown dtype {dtype!r}")


def _c(x: "Expr | Column | Any") -> Column:
    """Coerce an operand to a Column (Expr unwraps; scalars become literals)."""
    if isinstance(x, Expr):
        return x._col
    if isinstance(x, Column):
        return x
    return F.lit(x)


def _wrap(c: Column) -> "Expr":
    return Expr(c)


def _warn_single_partition(op: str) -> None:
    """Loudly flag ops whose empty ``partition_by`` collapses the frame to ONE
    window task (same hazard class as asof-without-by; asof offers
    ``range_buckets`` as its escape). At 100 TB supply ``partition_by`` — the
    natural per-series key — or pre-bucket the order column."""
    warnings.warn(
        f"{op} without partition_by runs as a single global-window task; "
        "pass partition_by=[...] (per-series key) for distributed execution",
        UserWarning,
        stacklevel=3,
    )


def _order_cols(order_by: Any) -> list[Column]:
    """Order keys for window specs.  A bare string is a COLUMN NAME (polars
    semantics) — it must not fall through _c's literal branch, which would
    silently order by a constant (i.e. arbitrary order)."""
    if order_by is None:
        return [F.col(ROW_ORDER_COL)]
    if isinstance(order_by, (list, tuple)):
        return [F.col(o) if isinstance(o, str) else _c(o) for o in order_by]
    if isinstance(order_by, str):
        return [F.col(order_by)]
    return [_c(order_by)]


class Expr:
    """Composable expression; wraps one pyspark Column."""

    __slots__ = ("_col", "_filter_pred", "_sort_by")

    def __init__(
        self,
        column: Column,
        _filter_pred: Column | None = None,
        _sort_by: "tuple | None" = None,
    ):
        self._col = column
        # Set only by Expr.filter(): the raw predicate, consumed by the
        # aggregates whose null-masking compilation would otherwise be wrong
        # (len counts masked-out rows; first/last return the mask's null).
        self._filter_pred = _filter_pred
        # Set only by Expr.sort_by(): (key Columns, descending flags,
        # nulls_last), consumed by the order-sensitive aggregates
        # (first/last/implode).
        self._sort_by = _sort_by

    # -- interop ----------------------------------------------------------
    def to_column(self) -> Column:
        return self._col

    def __repr__(self) -> str:  # pragma: no cover
        return f"Expr<{self._col}>"

    # -- naming (expr.rs:283-291, 891-914) --------------------------------
    def alias(self, name: str) -> "Expr":
        return _wrap(self._col.alias(name))

    @property
    def name(self) -> "ExprNameNamespace":
        return ExprNameNamespace(self)

    # -- comparisons (expr.rs:223-228) ------------------------------------
    def __eq__(self, other: Any) -> "Expr":  # type: ignore[override]
        return _wrap(self._col == _c(other))

    def __ne__(self, other: Any) -> "Expr":  # type: ignore[override]
        return _wrap(self._col != _c(other))

    def __gt__(self, other: Any) -> "Expr":
        return _wrap(self._col > _c(other))

    def __ge__(self, other: Any) -> "Expr":
        return _wrap(self._col >= _c(other))

    def __lt__(self, other: Any) -> "Expr":
        return _wrap(self._col < _c(other))

    def __le__(self, other: Any) -> "Expr":
        return _wrap(self._col <= _c(other))

    def eq(self, other: Any) -> "Expr":
        return self.__eq__(other)

    def neq(self, other: Any) -> "Expr":
        return self.__ne__(other)

    # -- arithmetic (expr.rs:230-243) -------------------------------------
    def __add__(self, other: Any) -> "Expr":
        return _wrap(self._col + _c(other))

    def __radd__(self, other: Any) -> "Expr":
        return _wrap(_c(other) + self._col)

    def __sub__(self, other: Any) -> "Expr":
        return _wrap(self._col - _c(other))

    def __rsub__(self, other: Any) -> "Expr":
        return _wrap(_c(other) - self._col)

    def __mul__(self, other: Any) -> "Expr":
        return _wrap(self._col * _c(other))

    def __rmul__(self, other: Any) -> "Expr":
        return _wrap(_c(other) * self._col)

    def __truediv__(self, other: Any) -> "Expr":
        return _wrap(self._col / _c(other))

    def __rtruediv__(self, other: Any) -> "Expr":
        return _wrap(_c(other) / self._col)

    def __mod__(self, other: Any) -> "Expr":
        return _wrap(self._col % _c(other))

    def __neg__(self) -> "Expr":
        return _wrap(-self._col)

    def floor_div(self, other: Any) -> "Expr":
        return _wrap(F.floor(self._col / _c(other)).cast("long"))

    def __floordiv__(self, other: Any) -> "Expr":
        return self.floor_div(other)

    def pow(self, other: Any) -> "Expr":
        return _wrap(F.pow(self._col, _c(other)))

    def __pow__(self, other: Any) -> "Expr":
        return self.pow(other)

    # -- boolean (expr.rs:237-239, 214) -----------------------------------
    def __and__(self, other: Any) -> "Expr":
        return _wrap(self._col & _c(other))

    def __or__(self, other: Any) -> "Expr":
        return _wrap(self._col | _c(other))

    def __xor__(self, other: Any) -> "Expr":
        return _wrap(self._col != _c(other))  # boolean xor

    def __invert__(self) -> "Expr":
        return _wrap(~self._col)

    def not_(self) -> "Expr":
        return self.__invert__()

    # -- null / NaN (expr.rs:216-217, 241, 1179-1192, 707-723) ------------
    def eq_missing(self, other: Any) -> "Expr":
        """Null-safe equality (polars eq_missing): null == null is True."""
        return _wrap(self._col.eqNullSafe(_c(other)))

    def ne_missing(self, other: Any) -> "Expr":
        """Null-safe inequality (polars ne_missing)."""
        return _wrap(~self._col.eqNullSafe(_c(other)))

    def is_null(self) -> "Expr":
        return _wrap(self._col.isNull())

    def is_not_null(self) -> "Expr":
        return _wrap(self._col.isNotNull())

    def is_nan(self) -> "Expr":
        return _wrap(F.isnan(self._col))

    def is_not_nan(self) -> "Expr":
        return _wrap(~F.isnan(self._col))

    def is_finite(self) -> "Expr":
        return _wrap(
            self._col.isNotNull()
            & ~F.isnan(self._col)
            & (F.abs(self._col) != F.lit(float("inf")))
        )

    def is_infinite(self) -> "Expr":
        return _wrap(F.abs(self._col) == F.lit(float("inf")))

    def fill_null(self, value: Any) -> "Expr":
        return _wrap(F.coalesce(self._col, _c(value)))

    def fill_nan(self, value: Any) -> "Expr":
        return _wrap(F.nanvl(self._col, _c(value)))

    def is_between(self, lower: Any, upper: Any, closed: str = "both") -> "Expr":
        lo, hi = _c(lower), _c(upper)
        c = self._col
        preds = {
            "both": (c >= lo) & (c <= hi),
            "left": (c >= lo) & (c < hi),
            "right": (c > lo) & (c <= hi),
            "none": (c > lo) & (c < hi),
        }
        return _wrap(preds[closed])

    def is_in(self, values: "Iterable[Any] | Expr") -> "Expr":
        if isinstance(values, Expr):
            # membership in a list-typed column (reference list.contains reversed form)
            return _wrap(F.array_contains(values._col, self._col))
        return _wrap(self._col.isin(list(values)))

    # -- math (expr.rs:212, 219-220, 853-876) ------------------------------
    def abs(self) -> "Expr":
        return _wrap(F.abs(self._col))

    def sqrt(self) -> "Expr":
        return _wrap(F.sqrt(self._col))

    def exp(self) -> "Expr":
        return _wrap(F.exp(self._col))

    def log(self, base: float | None = None) -> "Expr":
        if base is None:
            return _wrap(F.log(self._col))
        return _wrap(F.log(float(base), self._col))

    def round(self, decimals: int = 0) -> "Expr":
        # reference rounds HalfAwayFromZero (expr.rs:868-876); Spark F.round is HALF_UP
        # which is half-away-from-zero for both signs — exact match.
        return _wrap(F.round(self._col, decimals))

    # polars math extras (all JVM built-ins, codegen)
    def log10(self) -> "Expr":
        return _wrap(F.log10(self._col))

    def log1p(self) -> "Expr":
        return _wrap(F.log1p(self._col))

    def sign(self) -> "Expr":
        return _wrap(F.signum(self._col))

    def cbrt(self) -> "Expr":
        return _wrap(F.cbrt(self._col))

    def sin(self) -> "Expr":
        return _wrap(F.sin(self._col))

    def cos(self) -> "Expr":
        return _wrap(F.cos(self._col))

    def tan(self) -> "Expr":
        return _wrap(F.tan(self._col))

    def arcsin(self) -> "Expr":
        return _wrap(F.asin(self._col))

    def arccos(self) -> "Expr":
        return _wrap(F.acos(self._col))

    def arctan(self) -> "Expr":
        return _wrap(F.atan(self._col))

    def sinh(self) -> "Expr":
        return _wrap(F.sinh(self._col))

    def cosh(self) -> "Expr":
        return _wrap(F.cosh(self._col))

    def tanh(self) -> "Expr":
        return _wrap(F.tanh(self._col))

    def cot(self) -> "Expr":
        """Cotangent (polars Expr.cot): cos/sin — matches polars' 1/tan
        including signed-infinity at multiples of pi."""
        return _wrap(F.cos(self._col) / F.sin(self._col))

    def arcsinh(self) -> "Expr":
        """Inverse hyperbolic sine: ln(x + sqrt(x^2+1)) — exact closed form,
        pure codegen."""
        x = self._col.cast("double")
        return _wrap(F.log(x + F.sqrt(x * x + F.lit(1.0))))

    def arccosh(self) -> "Expr":
        """Inverse hyperbolic cosine: ln(x + sqrt(x^2-1)); x<1 -> NaN like
        polars (sqrt of negative)."""
        x = self._col.cast("double")
        return _wrap(F.log(x + F.sqrt(x * x - F.lit(1.0))))

    def arctanh(self) -> "Expr":
        """Inverse hyperbolic tangent: 0.5*ln((1+x)/(1-x)); x=1 -> inf,
        x=-1 -> -inf, |x|>1 -> NaN like polars (Spark's ln(negative) is null,
        so the out-of-domain case is re-mapped to NaN)."""
        x = self._col.cast("double")
        y = F.lit(0.5) * F.log((F.lit(1.0) + x) / (F.lit(1.0) - x))
        return _wrap(F.when(x.isNull(), y).otherwise(F.coalesce(y, F.lit(float("nan")))))

    def round_sig_figs(self, digits: int) -> "Expr":
        """Round to ``digits`` significant figures (polars round_sig_figs):
        scale by 10^(digits-1-floor(log10(|x|))), round, scale back — pure
        codegen; 0 and null pass through."""
        if digits < 1:
            raise ValueError("digits must be >= 1")
        x = self._col.cast("double")
        mag = F.floor(F.log10(F.abs(x)))
        scale = F.pow(F.lit(10.0), F.lit(float(digits - 1)) - mag)
        return _wrap(
            F.when(x == 0.0, x).otherwise(F.round(x * scale) / scale)
        )

    def is_close(
        self,
        other: "Expr | float",
        abs_tol: float = 1e-12,
        rel_tol: float = 1e-9,
        nans_equal: bool = False,
    ) -> "Expr":
        """Approximate equality (polars is_close): |a-b| <= max(rel_tol *
        max(|a|,|b|), abs_tol).  ``nans_equal=True`` additionally treats
        NaN==NaN as close."""
        a = self._col.cast("double")
        b = _c(other).cast("double")
        close = F.abs(a - b) <= F.greatest(
            F.lit(float(rel_tol)) * F.greatest(F.abs(a), F.abs(b)),
            F.lit(float(abs_tol)),
        )
        if nans_equal:
            close = close | (F.isnan(a) & F.isnan(b))
        return _wrap(close)

    def degrees(self) -> "Expr":
        return _wrap(F.degrees(self._col))

    def radians(self) -> "Expr":
        return _wrap(F.radians(self._col))

    def floor(self) -> "Expr":
        return _wrap(F.floor(self._col))

    def ceil(self) -> "Expr":
        return _wrap(F.ceil(self._col))

    def clip(self, lower: Any = None, upper: Any = None) -> "Expr":
        c = self._col
        if lower is not None:
            c = F.greatest(c, _c(lower))
        if upper is not None:
            c = F.least(c, _c(upper))
        return _wrap(c)

    def cut(
        self,
        breaks: list[float],
        left_closed: bool = False,
        labels: "Sequence[str] | None" = None,
    ) -> "Expr":
        """Bucket index for fixed bin edges (polars Expr.cut): right-closed
        intervals ``(b_i, b_{i+1}]`` by default, so index = #{b in breaks :
        value > b} — a pure when-free comparison sum, fully codegen'd.
        ``left_closed`` switches to ``[b_i, b_{i+1})`` (index counts >=).
        ``labels`` (len(breaks)+1 strings, polars-style) maps bucket index to
        category name via an array-literal lookup.  Null in → null out."""
        if sorted(breaks) != list(breaks):
            raise ValueError("breaks must be sorted ascending")
        if labels is not None and len(labels) != len(breaks) + 1:
            raise ValueError(
                f"labels must have len(breaks)+1 = {len(breaks) + 1} entries, got {len(labels)}"
            )
        c = self._col
        acc = F.lit(0)
        for b in breaks:
            hit = (c >= F.lit(b)) if left_closed else (c > F.lit(b))
            acc = acc + hit.cast("int")
        idx = F.when(c.isNotNull(), acc.cast("long")).otherwise(F.lit(None))
        if labels is None:
            return _wrap(idx)
        arr = F.array(*[F.lit(str(x)) for x in labels])
        return _wrap(F.when(c.isNotNull(), F.element_at(arr, (acc + 1).cast("int"))))

    # -- cast (expr.rs:1016-1033) ------------------------------------------
    def cast(self, dtype: str | T.DataType, strict: bool = False) -> "Expr":
        t = _to_spark_type(dtype)
        if strict:
            # Strict cast: any non-null input that casts to null aborts the query,
            # mirroring the reference's strict=true (expr.rs:1024-1031).
            casted = self._col.try_cast(t)
            bad = self._col.isNotNull() & casted.isNull()
            return _wrap(
                F.when(
                    bad,
                    F.raise_error(
                        F.concat(F.lit("strict cast failed for value: "), self._col.cast("string"))
                    ).try_cast(t),
                ).otherwise(casted)
            )
        # non-strict: invalid → null (Spark try_cast), matching CleaningTests.cs:76-100
        return _wrap(self._col.try_cast(t))

    def to_physical(self, kind: str = "datetime") -> "Expr":
        """polars to_physical for temporal columns: 'date' -> days since
        epoch, 'datetime' -> microseconds since epoch, 'time' ->
        microseconds since midnight.  polars derives the branch from the
        schema; an unbound Column has none, so pass ``kind`` (or use
        LazyFrame.to_physical(), which IS schema-driven).  Pure codegen."""
        c = self._col
        if kind == "date":
            return _wrap(F.datediff(c, F.lit("1970-01-01").cast("date")).cast("int"))
        if kind == "datetime":
            return _wrap(F.unix_micros(c.cast("timestamp")))
        if kind == "time":
            return _wrap(
                (
                    F.hour(c) * F.lit(3600_000_000)
                    + F.minute(c) * F.lit(60_000_000)
                    + F.second(c) * F.lit(1_000_000)
                ).cast("long")
            )
        raise ValueError("kind must be date|datetime|time")

    def extend_constant(self, value, n: int) -> "Expr":
        """Append ``n`` copies of ``value`` after the group's elements
        (polars extend_constant; aggregation context — returns a list like
        implode).  Same size contract as implode."""
        if n < 0:
            raise ValueError("n must be >= 0")
        return _wrap(
            F.concat(
                F.collect_list(self._col),
                F.array_repeat(F.lit(value), int(n)),
            )
        )

    def arg_unique(self) -> "Expr":
        """Positions (0-based, collection order) of the FIRST occurrence of
        each distinct value — nulls count as a value — as an ascending list
        (polars arg_unique; aggregation context).  collect_list of
        null-keeping structs + an O(n^2) duplicate scan per group: implode
        size contract, keep groups bounded."""
        vals = F.collect_list(F.struct(self._col.alias("v")))
        n = F.size(vals)
        return _wrap(
            F.filter(
                F.sequence(F.lit(0), n - F.lit(1)),
                lambda i: ~F.exists(
                    F.slice(vals, 1, i),
                    lambda e: e.getField("v").eqNullSafe(
                        F.element_at(vals, i + F.lit(1)).getField("v")
                    ),
                ),
            )
        )

    # -- value remapping (polars Expr.replace / replace_strict) -------------
    def _replace_map(self, mapping: dict) -> tuple[Column | None, "Column | None", bool]:
        non_null = {k: v for k, v in mapping.items() if k is not None}
        null_new = mapping.get(None) if None in mapping else None
        m = None
        if non_null:
            m = F.create_map(
                *[x for k, v in non_null.items() for x in (F.lit(k), F.lit(v))]
            )
        return m, F.lit(null_new) if None in mapping else None, bool(non_null)

    def replace(self, mapping: dict) -> "Expr":
        """Remap values by dict; unmatched values pass through unchanged
        (polars Expr.replace). Compiles to one map literal + element_at —
        pure codegen, no join, no UDF. A ``None`` key remaps nulls."""
        m, null_new, has = self._replace_map(mapping)
        x = self._col
        out = x
        if has:
            out = F.when(
                F.map_contains_key(m, x), F.element_at(m, x)
            ).otherwise(x)
        if null_new is not None:
            out = F.when(x.isNull(), null_new).otherwise(out)
        return _wrap(out)

    def replace_strict(self, mapping: dict, default: Any = _NO_DEFAULT) -> "Expr":
        """Remap values by dict; unmatched values take ``default``, or ABORT
        the query when no default is given (polars Expr.replace_strict)."""
        m, null_new, has = self._replace_map(mapping)
        x = self._col
        matched = F.map_contains_key(m, x) if has else F.lit(False)
        new = F.element_at(m, x) if has else F.lit(None)
        if default is _NO_DEFAULT:
            fallback = F.raise_error(
                F.concat(
                    F.lit("replace_strict: value not in mapping: "),
                    F.coalesce(x.cast("string"), F.lit("null")),
                )
            ).try_cast("string")
        else:
            fallback = F.lit(default)
        out = F.when(matched, new).otherwise(fallback)
        if null_new is not None:
            out = F.when(x.isNull(), null_new).otherwise(out)
        elif default is _NO_DEFAULT:
            # nulls not in the mapping and no default: polars errors too
            out = F.when(x.isNull(), fallback).otherwise(out)
        return _wrap(out)

    def repeat_by(self, n: "Expr | int") -> "Expr":
        """List of the value repeated ``n`` times (polars Expr.repeat_by)."""
        count = n if isinstance(n, int) else _c(n).cast("int")  # array_repeat wants INT
        return _wrap(F.array_repeat(self._col, count))

    def hash(self, seed: int = 0) -> "Expr":
        """Deterministic 64-bit hash (xxhash64; engine-stable, not polars'
        bit pattern)."""
        return _wrap(F.xxhash64(self._col, F.lit(int(seed))))

    # -- aggregations (expr.rs:208-211, 1126-1176, 817-824) ----------------
    def sum(self) -> "Expr":
        return _wrap(F.sum(self._col))

    def mean(self) -> "Expr":
        return _wrap(F.avg(self._col))

    def min(self) -> "Expr":
        return _wrap(F.min(self._col))

    def max(self) -> "Expr":
        return _wrap(F.max(self._col))

    def count(self) -> "Expr":
        """Non-null count (expr.rs:1126-1130)."""
        return _wrap(F.count(self._col))

    def len(self) -> "Expr":
        """Group/frame length including nulls (expr.rs:882-888).  After
        :meth:`filter`, counts only the surviving elements (null or not) —
        count(when(pred, 1)), not the unfiltered group size."""
        if self._filter_pred is not None:
            return _wrap(F.count(F.when(self._filter_pred, F.lit(1))))
        return _wrap(F.count(F.lit(1)))

    def dot(self, other: "Expr | str") -> "Expr":
        """Dot product with another column (polars Expr.dot): sum(self *
        other) — a plain partial-aggregable sum, null rows skipped like every
        Spark sum."""
        o = col(other) if isinstance(other, str) else other
        return _wrap(F.sum(self._col * o._col))

    def any(self, ignore_nulls: bool = True) -> "Expr":
        """Boolean OR aggregate (polars Expr.any): true when any element is
        true; empty/all-null groups give false (polars ignore_nulls=True
        default).  ignore_nulls=False gives Kleene logic: null if no true
        but nulls present."""
        out = F.bool_or(self._col)
        if ignore_nulls:
            return _wrap(F.coalesce(out, F.lit(False)))
        return _wrap(
            F.when(out, F.lit(True)).otherwise(
                F.when(F.count(F.lit(1)) > F.count(self._col), F.lit(None)).otherwise(F.lit(False))
            )
        )

    def all(self, ignore_nulls: bool = True) -> "Expr":
        """Boolean AND aggregate (polars Expr.all): true when every element
        is true; empty groups give true.  ignore_nulls=False: null if all
        non-null are true but nulls present (Kleene)."""
        out = F.bool_and(self._col)
        if ignore_nulls:
            return _wrap(F.coalesce(out, F.lit(True)))
        return _wrap(
            F.when(~out, F.lit(False)).otherwise(
                F.when(F.count(F.lit(1)) > F.count(self._col), F.lit(None)).otherwise(F.lit(True))
            )
        )

    def n_unique(self) -> "Expr":
        return _wrap(F.countDistinct(self._col))

    def approx_n_unique(self) -> "Expr":
        return _wrap(F.approx_count_distinct(self._col))

    def std(self, ddof: int = 1) -> "Expr":
        return _wrap(F.stddev_samp(self._col) if ddof == 1 else F.stddev_pop(self._col))

    def var(self, ddof: int = 1) -> "Expr":
        return _wrap(F.var_samp(self._col) if ddof == 1 else F.var_pop(self._col))

    def median(self) -> "Expr":
        return _wrap(F.median(self._col))

    def approx_quantile(self, q: float, accuracy: int = 10000) -> "Expr":
        """Approximate quantile via Spark's streaming Greenwald-Khanna sketch
        (percentile_approx) — the 100 TB path: exact ``quantile`` materializes
        every group value, the sketch merges map-side in O(accuracy) memory.
        Error bound: rank error ≤ 1/accuracy."""
        return _wrap(F.percentile_approx(self._col, F.lit(float(q)), F.lit(int(accuracy))))

    # -- higher-moment / information aggregates (polars Expr.skew/kurtosis/
    # entropy/product; parity extras — the reference shim exposes none of
    # these, but polars users reach for them constantly) ------------------
    def skew(self, bias: bool = True) -> "Expr":
        """Skewness. bias=True (polars default) is the population estimator
        m3/m2^1.5 — exactly Spark's ``skewness``; bias=False applies the
        standard sqrt(n(n-1))/(n-2) correction."""
        g1 = F.skewness(self._col)
        if bias:
            return _wrap(g1)
        n = F.count(self._col).cast("double")
        return _wrap(F.sqrt(n * (n - 1)) / (n - 2) * g1)

    def kurtosis(self, fisher: bool = True, bias: bool = True) -> "Expr":
        """Kurtosis. fisher=True → excess kurtosis (m4/m2^2 - 3, Spark's
        ``kurtosis``); bias=False applies the G2 sample correction
        ((n-1)/((n-2)(n-3))) * ((n+1)*g2 + 6), matching polars/scipy."""
        g2 = F.kurtosis(self._col)  # fisher, biased
        if not bias:
            n = F.count(self._col).cast("double")
            g2 = (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + F.lit(6.0))
        return _wrap(g2 if fisher else g2 + F.lit(3.0))

    def entropy(self, base: float | None = None, normalize: bool = True) -> "Expr":
        """Shannon entropy -sum(p ln p) of the group's values taken as a
        (to-be-normalized) probability vector (polars Expr.entropy).
        normalize=True: p = x / sum(x), algebraically H = ln(S) - sum(x ln x)/S
        — two map-side-combinable aggregates, no second pass."""
        x = self._col.cast("double")
        s = F.sum(x)
        xlx = F.sum(x * F.log(x))
        h = F.log(s) - xlx / s if normalize else -F.sum(x * F.log(x))
        if base is not None:
            import math as _math

            h = h / F.lit(_math.log(base))
        return _wrap(h)

    def product(self) -> "Expr":
        """Product of the group (polars Expr.product): exact multiplication
        fold over the collected group (same bit pattern as polars' fold —
        exp(sum(log)) drifts in the last ulps). Like polars, the group is
        materialized; overflow follows IEEE ±inf.

        **SIZE CONTRACT**: collect_list materializes the ENTIRE group as one
        array on one executor — grouped use with bounded groups only.  An
        UNGROUPED ``product()`` over a 100 TB column is one array of
        everything and will OOM; at that scale compute
        ``exp(sum(ln(abs(x))))`` with separate sign-parity
        (``sum((x < 0)::int) % 2``) and any-zero tracking — streaming,
        map-side-combinable, bit-inexact."""
        x = self._col.cast("double")
        return _wrap(
            F.aggregate(
                F.collect_list(x), F.lit(1.0).cast("double"), lambda acc, v: acc * v
            )
        )

    def quantile(self, q: float, interpolation: str = "nearest") -> "Expr":
        """Quantile with polars interpolation modes (expr.rs:1157-1176).

        linear  → exact linear interpolation (Spark percentile)
        lower   → largest element at cum-position floor
        higher  → element at cum-position ceil
        midpoint→ (lower+higher)/2
        nearest → lower/higher, whichever index is closer (ties → higher,
                  matching polars' round-half-up on (n-1)*q)

        **SIZE CONTRACT**: the non-linear modes sort a collect_list of the
        whole group on one executor — bounded groups only.  'linear' streams
        through Spark's percentile aggregate (group-sized buffer on the
        merging reducer — also not for an ungrouped 100 TB column).  At
        scale use :meth:`approx_quantile` (constant-memory GK sketch).
        """
        c = self._col
        if interpolation == "linear":
            return _wrap(F.percentile(c, F.lit(q)))
        n = F.count(c)
        pos = (n - 1) * F.lit(float(q))
        lo_idx = F.floor(pos)
        hi_idx = F.ceil(pos)
        sorted_arr = F.array_sort(F.collect_list(c))
        lo = F.get(sorted_arr, lo_idx.cast("int"))
        hi = F.get(sorted_arr, hi_idx.cast("int"))
        if interpolation == "lower":
            return _wrap(lo)
        if interpolation == "higher":
            return _wrap(hi)
        if interpolation == "midpoint":
            return _wrap((lo + hi) / 2.0)
        if interpolation == "nearest":
            # polars rounds (n-1)*q half-AWAY-from-zero (f64::round), so an
            # exact .5 fractional position resolves to the HIGHER index
            nearest = F.when(pos - lo_idx < F.lit(0.5), lo).otherwise(hi)
            return _wrap(nearest)
        raise ValueError(f"unknown interpolation {interpolation!r}")

    def quantiles(self, qs: Sequence[float]) -> "Expr":
        """Several linear-interpolation quantiles from ONE sort (array result;
        pair with .list.get(i)).  N separate .quantile calls sort N times."""
        return _wrap(F.percentile(self._col, F.array(*[F.lit(float(q)) for q in qs])))

    def first(self) -> "Expr":
        """First element of the group.  After :meth:`filter` the mask's
        nulls are skipped (ignorenulls=True) so this returns the first
        SURVIVING value; a surviving element that is itself null is
        indistinguishable from the mask and also skipped — use
        ``implode().list.first()`` if null survivors must be observable.
        After :meth:`sort_by` this is the value at the smallest sort key
        (min_by — a true aggregate, no group materialization)."""
        if self._sort_by is not None:
            return self._sorted_pick(last=False)
        if self._filter_pred is not None:
            return _wrap(F.first(self._col, ignorenulls=True))
        return _wrap(F.first(self._col, ignorenulls=False))

    def last(self) -> "Expr":
        """Last element of the group (filter-aware, see :meth:`first`;
        sort_by-aware — value at the largest sort key via max_by)."""
        if self._sort_by is not None:
            return self._sorted_pick(last=True)
        if self._filter_pred is not None:
            return _wrap(F.last(self._col, ignorenulls=True))
        return _wrap(F.last(self._col, ignorenulls=False))

    def sort_by(
        self,
        *by: "Expr | str",
        descending: "bool | Sequence[bool]" = False,
        nulls_last: bool = False,
    ) -> "Expr":
        """polars Expr.sort_by in AGGREGATION context: order the elements by
        other expressions before an order-sensitive aggregate —
        ``col("v").sort_by("ts").first()`` is "value at the earliest ts".

        Compilation: first()/last() become min_by/max_by (true aggregates,
        map-side combining, no group materialization — the 100 TB path);
        implode() collects (keys, value) structs and sorts with an
        array_sort comparator (group-sized array — same size contract as
        plain implode).  Order-INsensitive aggregates (sum/mean/...) ignore
        the ordering, as in polars.

        Deviations (documented, not silent): min_by/max_by skip rows whose
        sort key is null, while the implode path places null keys first
        (polars nulls-first default) or last (``nulls_last=True``); ties are
        nondeterministic unless the key set is unique — add a tie-break key
        (polars' stable sort has row order to fall back on; a distributed
        shuffle does not).  Outside an aggregate this marker has no effect.
        """
        # bare strings are COLUMN NAMES here (never literals — _c's fallback
        # would silently sort by a constant, the order_by trap fixed in r4)
        keys = [F.col(b) if isinstance(b, str) else _c(b) for b in by]
        if not keys:
            raise ValueError("sort_by needs at least one key")
        desc = (
            [bool(descending)] * len(keys)
            if isinstance(descending, bool)
            else [bool(d) for d in descending]
        )
        if len(desc) != len(keys):
            raise ValueError("descending must match the number of keys")
        return Expr(
            self._col,
            _filter_pred=self._filter_pred,
            _sort_by=(keys, desc, bool(nulls_last)),
        )

    def _sorted_pick(self, last: bool) -> "Expr":
        keys, desc, _nulls_last = self._sort_by
        if len(set(desc)) > 1:
            # mixed directions: comparator-sorted implode, element at edge
            arr = self._sorted_implode_col()
            return _wrap(F.element_at(arr, -1 if last else 1))
        key = keys[0] if len(keys) == 1 else F.struct(*keys)
        if self._filter_pred is not None:
            key = F.when(self._filter_pred, key)
        want_max = last != desc[0]  # descending flips which end is "first"
        fn = F.max_by if want_max else F.min_by
        return _wrap(fn(self._col, key))

    def _sorted_implode_col(self) -> Column:
        keys, desc, nulls_last = self._sort_by
        packed = F.collect_list(
            F.struct(
                *[k.alias(f"k{i}") for i, k in enumerate(keys)],
                self._col.alias("v"),
            )
        )

        def comparator(a: Column, b: Column) -> Column:
            result = F.lit(0)
            for i in reversed(range(len(keys))):
                av, bv = a[f"k{i}"], b[f"k{i}"]
                lo, hi = (-1, 1) if not desc[i] else (1, -1)
                n_first = 1 if nulls_last else -1
                step = (
                    F.when(av.isNull() & bv.isNull(), F.lit(0))
                    .when(av.isNull(), F.lit(n_first))
                    .when(bv.isNull(), F.lit(-n_first))
                    .when(av < bv, F.lit(lo))
                    .when(av > bv, F.lit(hi))
                    .otherwise(F.lit(0))
                )
                result = F.when(step != 0, step).otherwise(result)
            return result

        return F.transform(F.array_sort(packed, comparator), lambda s: s["v"])

    def filter(self, *predicates: "Expr") -> "Expr":
        """polars Expr.filter (conditional aggregation): keep only elements
        where every predicate holds before the enclosing aggregate —
        ``col("x").filter(col("y") > 0).sum()`` == SQL ``sum(x) FILTER
        (WHERE y > 0)``.  Compiles to when(pred, x): null where the
        predicate fails, which the null-skipping aggregates (sum/mean/min/
        max/count/...) handle for free; the predicate itself rides along on
        the returned Expr so len()/first()/last() — whose defaults would
        otherwise see the mask — compile filter-aware."""
        if not predicates:
            return self
        pred = _c(predicates[0])
        for p in predicates[1:]:
            pred = pred & _c(p)
        return Expr(F.when(pred, self._col), _filter_pred=pred)

    def where(self, *predicates: "Expr") -> "Expr":
        """Alias of :meth:`filter` (polars Expr.where)."""
        return self.filter(*predicates)

    def implode(self) -> "Expr":
        if self._sort_by is not None:
            return _wrap(self._sorted_implode_col())
        return _wrap(F.collect_list(self._col))

    def top_k(self, k: int) -> "Expr":
        """polars Expr.top_k (aggregate context): the k largest non-null
        values, descending, as a list.  collect_list + sort_array + slice —
        **SIZE CONTRACT**: the collected group must fit one executor (same
        as implode); never call ungrouped on a 100 TB column.  For
        frame-level top-k use LazyFrame.top_k (TakeOrderedAndProject — k
        values per partition, no full materialization)."""
        return _wrap(
            F.slice(F.sort_array(F.collect_list(self._col), asc=False), 1, int(k))
        )

    def bottom_k(self, k: int) -> "Expr":
        """polars Expr.bottom_k: the k smallest non-null values, ascending
        (same size contract as :meth:`top_k`)."""
        return _wrap(
            F.slice(F.sort_array(F.collect_list(self._col), asc=True), 1, int(k))
        )

    def top_k_by(self, by: "Expr | str", k: int) -> "Expr":
        """polars Expr.top_k_by: the values of self at the k LARGEST ``by``
        values, as a list in descending-by order.  collect_list of
        (by, value) structs + sort + slice — same size contract as
        :meth:`top_k`; rows where ``by`` is null are dropped (polars
        top_k semantics)."""
        return self._k_by(by, k, asc=False)

    def bottom_k_by(self, by: "Expr | str", k: int) -> "Expr":
        """polars Expr.bottom_k_by: values of self at the k SMALLEST ``by``
        values (ascending-by order; same contract as :meth:`top_k_by`)."""
        return self._k_by(by, k, asc=True)

    def _k_by(self, by: "Expr | str", k: int, asc: bool) -> "Expr":
        b = (col(by) if isinstance(by, str) else by)._col
        pairs = F.collect_list(
            F.when(b.isNotNull(), F.struct(b.alias("b"), self._col.alias("v")))
        )
        ordered = F.sort_array(pairs, asc=asc)
        return _wrap(
            F.transform(F.slice(ordered, 1, int(k)), lambda s: s.getField("v"))
        )

    # -- window ops (expr.rs:995-1101, SURVEY §2.6) ------------------------
    def over(self, *partition_by: "Expr | str") -> "Expr":
        keys = [_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)]
        return _wrap(self._col.over(Window.partitionBy(*keys)))

    def shift(
        self,
        n: int = 1,
        order_by: Any = None,
        partition_by: Sequence[Any] = (),
        fill_value: Any = None,
    ) -> "Expr":
        """Shift by n positions (negative = lead).  ``fill_value`` replaces
        the rolled-off edge values (polars shift(fill_value=) /
        shift_and_fill) — passed straight to lag/lead's default."""
        w = Window.orderBy(*_order_cols(order_by))
        if partition_by:
            w = Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)]).orderBy(
                *_order_cols(order_by)
            )
        if n >= 0:
            return _wrap(F.lag(self._col, n, fill_value).over(w))
        return _wrap(F.lead(self._col, -n, fill_value).over(w))

    def diff(
        self, n: int = 1, order_by: Any = None, partition_by: Sequence[Any] = (),
        null_behavior: str = "ignore",
    ) -> "Expr":
        """Difference with the value n rows earlier.  null_behavior='ignore'
        (polars default) leaves the first n rows null; 'drop' is a FRAME
        operation in polars (shrinks the series) — here the caller filters
        the nulls (documented, a column expression cannot drop rows)."""
        if null_behavior not in ("ignore", "drop"):
            raise ValueError("null_behavior must be ignore|drop")
        return _wrap(self._col - self.shift(n, order_by, partition_by)._col)

    def forward_fill(
        self, limit: int | None = None, order_by: Any = None, partition_by: Sequence[Any] = ()
    ) -> "Expr":
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by))
        lo = Window.unboundedPreceding if limit is None else -int(limit)
        return _wrap(F.last(self._col, ignorenulls=True).over(w.rowsBetween(lo, 0)))

    def backward_fill(
        self, limit: int | None = None, order_by: Any = None, partition_by: Sequence[Any] = ()
    ) -> "Expr":
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by))
        hi = Window.unboundedFollowing if limit is None else int(limit)
        return _wrap(F.first(self._col, ignorenulls=True).over(w.rowsBetween(0, hi)))

    def cum_sum(self, order_by: Any = None, partition_by: Sequence[Any] = ()) -> "Expr":
        """Running sum over the frame/partition order."""
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by)).rowsBetween(Window.unboundedPreceding, 0)
        return _wrap(F.sum(self._col).over(w))

    def cum_count(self, order_by: Any = None, partition_by: Sequence[Any] = ()) -> "Expr":
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by)).rowsBetween(Window.unboundedPreceding, 0)
        return _wrap(F.count(self._col).over(w))

    def cum_max(self, order_by: Any = None, partition_by: Sequence[Any] = ()) -> "Expr":
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by)).rowsBetween(Window.unboundedPreceding, 0)
        return _wrap(F.max(self._col).over(w))

    def cum_min(self, order_by: Any = None, partition_by: Sequence[Any] = ()) -> "Expr":
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by)).rowsBetween(Window.unboundedPreceding, 0)
        return _wrap(F.min(self._col).over(w))

    def cum_prod(self, order_by: Any = None, partition_by: Sequence[Any] = ()) -> "Expr":
        """polars cum_prod: exact multiplication fold over the windowed
        prefix (collect_list + aggregate — same bit pattern as product();
        exp(sum(log)) would drift).  Null rows emit null and are excluded
        from later products (polars semantics).  Prefix lists are O(n) per
        row, so keep partitions to series-sized groups like other cum_* ops."""
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by)).rowsBetween(Window.unboundedPreceding, 0)
        x = self._col.cast("double")
        prefix_prod = F.aggregate(
            F.collect_list(x).over(w), F.lit(1.0).cast("double"), lambda acc, v: acc * v
        )
        return _wrap(F.when(self._col.isNotNull(), prefix_prod))

    # rolling fixed-size (expr.rs:110-141, 272-275)
    def _rolling(self, fn, window_size: int | str, min_periods: int | None, order_by, partition_by):
        if isinstance(window_size, str):
            if not window_size.endswith("i"):
                raise ValueError("fixed rolling windows use 'Ni' notation; for temporal use rolling_*_by")
            window_size = int(window_size[:-1])
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by))
        frame = w.rowsBetween(-(window_size - 1), 0)
        mp = min_periods if min_periods is not None else window_size
        agg = fn(self._col).over(frame)
        cnt = F.count(self._col).over(frame)
        return _wrap(F.when(cnt >= F.lit(mp), agg))

    def rolling_mean(self, window_size, min_periods=None, order_by=None, partition_by=()):
        return self._rolling(F.avg, window_size, min_periods, order_by, partition_by)

    def rolling_sum(self, window_size, min_periods=None, order_by=None, partition_by=()):
        return self._rolling(F.sum, window_size, min_periods, order_by, partition_by)

    def rolling_min(self, window_size, min_periods=None, order_by=None, partition_by=()):
        return self._rolling(F.min, window_size, min_periods, order_by, partition_by)

    def rolling_max(self, window_size, min_periods=None, order_by=None, partition_by=()):
        return self._rolling(F.max, window_size, min_periods, order_by, partition_by)

    def rolling_std(self, window_size, min_periods=None, order_by=None, partition_by=(), ddof: int = 1):
        """polars rolling_std (ddof=1 sample default; windows with fewer than
        ddof+1 values yield null, matching both engines' var_samp)."""
        fn = F.stddev_samp if ddof == 1 else F.stddev_pop
        return self._rolling(fn, window_size, min_periods, order_by, partition_by)

    def rolling_var(self, window_size, min_periods=None, order_by=None, partition_by=(), ddof: int = 1):
        """polars rolling_var (ddof=1 sample default)."""
        fn = F.var_samp if ddof == 1 else F.var_pop
        return self._rolling(fn, window_size, min_periods, order_by, partition_by)

    def _rolling_frame(self, window_size, order_by, partition_by):
        if isinstance(window_size, str):
            if not window_size.endswith("i"):
                raise ValueError("fixed rolling windows use 'Ni' notation")
            window_size = int(window_size[:-1])
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by))
        return w.rowsBetween(-(window_size - 1), 0), window_size

    def rolling_corr(self, other: "Expr | str", window_size, min_periods=None,
                     order_by=None, partition_by=(), ddof: int = 1):
        """Pearson correlation of self vs ``other`` over the trailing window
        (pandas/polars rolling_corr).  F.corr is a declarative aggregate, so
        it evaluates INSIDE the window frame — one WindowExec, no UDF.
        Windows with fewer than ``min_periods`` both-non-null pairs (default
        the window size) yield null, as do zero-variance windows (corr's own
        semantics)."""
        o = F.col(other) if isinstance(other, str) else _c(other)
        frame, ws = self._rolling_frame(window_size, order_by, partition_by)
        both = F.when(self._col.isNotNull() & o.isNotNull(), F.lit(1))
        cnt = F.count(both).over(frame)
        c = F.corr(self._col, o).over(frame)
        mp = min_periods if min_periods is not None else ws
        return _wrap(F.when(cnt >= F.lit(mp), c))

    def rolling_skew(self, window_size, bias: bool = True, min_periods=None,
                     order_by=None, partition_by=()):
        """polars rolling_skew: skewness over the trailing window.  Spark's
        skewness is a declarative moment aggregate, so it runs inside the
        window frame; the bias=False correction arithmetic rides the SAME
        frame's count — one WindowExec either way, pure codegen."""
        frame, ws = self._rolling_frame(window_size, order_by, partition_by)
        cnt = F.count(self._col).over(frame)
        g1 = F.skewness(self._col).over(frame)
        if not bias:
            n = cnt.cast("double")
            g1 = F.sqrt(n * (n - 1)) / (n - 2) * g1
        mp = min_periods if min_periods is not None else ws
        return _wrap(F.when(cnt >= F.lit(mp), g1))

    def rolling_kurtosis(self, window_size, fisher: bool = True, bias: bool = True,
                         min_periods=None, order_by=None, partition_by=()):
        """polars rolling_kurtosis (excess by default, same corrections as
        Expr.kurtosis; one WindowExec)."""
        frame, ws = self._rolling_frame(window_size, order_by, partition_by)
        cnt = F.count(self._col).over(frame)
        g2 = F.kurtosis(self._col).over(frame)
        if not bias:
            n = cnt.cast("double")
            g2 = (n - 1) / ((n - 2) * (n - 3)) * ((n + 1) * g2 + F.lit(6.0))
        if not fisher:
            g2 = g2 + F.lit(3.0)
        mp = min_periods if min_periods is not None else ws
        return _wrap(F.when(cnt >= F.lit(mp), g2))

    # rolling temporal (expr.rs:151-191, 277-280)
    def _rolling_by(self, fn, window: str, by, closed: str, min_periods: int, partition_by):
        micros = parse_polars_duration_us(window)
        ts = _c(col(by) if isinstance(by, str) else by)
        # cast handles TIMESTAMP_NTZ (parquet ms/µs without tz reads as NTZ)
        order = (F.unix_micros(ts.cast("timestamp"))).cast("long")
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(order)
        # polars closed='right' (default): window is (t - period, t]
        bounds = {
            "right": (-(micros - 1), 0),
            "left": (-micros, -1),
            "both": (-micros, 0),
            "none": (-(micros - 1), -1),
        }
        lo, hi = bounds[closed]
        frame = w.rangeBetween(lo, hi)
        agg = fn(self._col).over(frame)
        cnt = F.count(self._col).over(frame)
        return _wrap(F.when(cnt >= F.lit(min_periods), agg))

    def rolling_mean_by(self, by, window: str, closed: str = "right", min_periods: int = 1, partition_by=()):
        return self._rolling_by(F.avg, window, by, closed, min_periods, partition_by)

    def rolling_sum_by(self, by, window: str, closed: str = "right", min_periods: int = 1, partition_by=()):
        return self._rolling_by(F.sum, window, by, closed, min_periods, partition_by)

    def rolling_min_by(self, by, window: str, closed: str = "right", min_periods: int = 1, partition_by=()):
        return self._rolling_by(F.min, window, by, closed, min_periods, partition_by)

    def rolling_max_by(self, by, window: str, closed: str = "right", min_periods: int = 1, partition_by=()):
        return self._rolling_by(F.max, window, by, closed, min_periods, partition_by)

    def rolling_std_by(self, by, window: str, closed: str = "right", min_periods: int = 1, partition_by=(), ddof: int = 1):
        fn = F.stddev_samp if ddof == 1 else F.stddev_pop
        return self._rolling_by(fn, window, by, closed, min_periods, partition_by)

    def rolling_var_by(self, by, window: str, closed: str = "right", min_periods: int = 1, partition_by=(), ddof: int = 1):
        fn = F.var_samp if ddof == 1 else F.var_pop
        return self._rolling_by(fn, window, by, closed, min_periods, partition_by)

    # rank-style helpers (free in Spark; not in reference but useful)
    def rank(self, method: str = "dense", order_by: Any = None, partition_by=()):
        """Rank within partitions.  Methods (polars names): 'dense', 'min'
        (competition), 'ordinal' (row_number), 'max' (ties share the LAST
        slot), 'average' (ties share the mean slot, polars' default method).
        max/average ride the SAME window as rank(): the max rank of a tie
        group is count(*) over the default RANGE frame (<= current order
        value, ties included) — every method is one WindowExec, one shuffle,
        one sort, no second tie-keyed exchange (r4: the old tie-count window
        partitioned by (keys, value), adding an exchange and capping
        parallelism at the distinct-value count)."""
        keys = [_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)]
        order = self._col if order_by is None else _order_cols(order_by)[0]
        w = (Window.partitionBy(*keys) if keys else Window.partitionBy()).orderBy(order)
        if method in ("dense", "min", "ordinal"):
            fn = {"dense": F.dense_rank, "min": F.rank, "ordinal": F.row_number}[method]
            return _wrap(fn().over(w))
        if method in ("max", "average"):
            # default aggregate frame = RANGE UNBOUNDED PRECEDING..CURRENT ROW:
            # counts every row ordered <= current INCLUDING its ties
            rmax = F.count(F.lit(1)).over(w)
            if method == "max":
                return _wrap(rmax)
            rmin = F.rank().over(w)
            return _wrap((rmin + rmax) / F.lit(2.0))
        raise ValueError(
            f"rank method={method!r} must be dense/min/ordinal/max/average"
        )

    def rolling_quantile(
        self,
        quantile: float,
        window_size: int | str,
        min_periods: int | None = None,
        interpolation: str = "nearest",
        order_by: Any = None,
        partition_by: Sequence[Any] = (),
    ) -> "Expr":
        """Rolling quantile over the trailing ``window_size`` rows (polars
        Expr.rolling_quantile; default interpolation='nearest' like polars and
        this repo's Expr.quantile). ``linear`` uses Spark's exact
        ``percentile`` aggregate over the window frame; the index-based modes
        reuse the sorted-window-array logic from ``quantile`` (same tie rules).
        """
        if isinstance(window_size, str):
            if not window_size.endswith("i"):
                raise ValueError("fixed rolling windows use 'Ni' notation")
            window_size = int(window_size[:-1])
        if not partition_by:
            _warn_single_partition("rolling_quantile")
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by))
        frame = w.rowsBetween(-(window_size - 1), 0)
        mp = min_periods if min_periods is not None else window_size
        cnt = F.count(self._col).over(frame)
        if interpolation == "linear":
            agg = F.percentile(self._col, F.lit(float(quantile))).over(frame)
        else:
            arr = F.array_sort(F.collect_list(self._col).over(frame))
            pos = (F.size(arr) - 1) * F.lit(float(quantile))
            lo_idx = F.floor(pos)
            lo = F.get(arr, lo_idx.cast("int"))
            hi = F.get(arr, F.ceil(pos).cast("int"))
            if interpolation == "lower":
                agg = lo
            elif interpolation == "higher":
                agg = hi
            elif interpolation == "midpoint":
                agg = (lo + hi) / 2.0
            elif interpolation == "nearest":
                agg = F.when(pos - lo_idx < F.lit(0.5), lo).otherwise(hi)
            else:
                raise ValueError(f"unknown interpolation {interpolation!r}")
        return _wrap(F.when(cnt >= F.lit(mp), agg))

    def rolling_median(self, window_size, min_periods=None, order_by=None, partition_by=()):
        """Rolling median (= linear-interpolation quantile 0.5, polars semantics)."""
        return self.rolling_quantile(0.5, window_size, min_periods, "linear", order_by, partition_by)

    def interpolate(self, order_by: Any = None, partition_by: Sequence[Any] = ()) -> "Expr":
        """Linearly interpolate nulls between surrounding non-null values
        (polars Expr.interpolate, method='linear'); leading/trailing nulls
        stay null.  Pure window math: previous/next non-null value + its
        row position bracket each gap — no Python, no extra pass.
        """
        if not partition_by:
            _warn_single_partition("interpolate")
        part = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        )
        w = part.orderBy(*_order_cols(order_by))
        c = self._col
        i = F.row_number().over(w)
        prev = w.rowsBetween(Window.unboundedPreceding, 0)
        nxt = w.rowsBetween(0, Window.unboundedFollowing)
        pv = F.last(c, ignorenulls=True).over(prev)
        pi = F.last(F.when(c.isNotNull(), i), ignorenulls=True).over(prev)
        nv = F.first(c, ignorenulls=True).over(nxt)
        ni = F.first(F.when(c.isNotNull(), i), ignorenulls=True).over(nxt)
        filled = pv + (nv - pv) * (i - pi) / (ni - pi)
        return _wrap(
            F.when(c.isNotNull(), c.cast("double")).when(
                pv.isNotNull() & nv.isNotNull(), filled
            )
        )

    def interpolate_by(
        self, by: "Expr | str", partition_by: Sequence[Any] = (), coordinate: str = "time"
    ) -> "Expr":
        """Coordinate-aware linear interpolation (polars Expr.interpolate_by):
        nulls are filled proportionally to the ``by`` coordinate, not row
        position — irregular sampling interpolates correctly.  Same
        bracket-window shape as interpolate().  ``coordinate='time'``
        (default) treats ``by`` as a timestamp (cast + epoch µs, NTZ-safe);
        ``'numeric'`` uses the raw values (Columns are unbound here, so the
        dtype branch polars resolves at plan time is a caller hint)."""
        if not partition_by:
            _warn_single_partition("interpolate_by")
        if coordinate not in ("time", "numeric"):
            raise ValueError(f"coordinate={coordinate!r} must be 'time' or 'numeric'")
        bc = _c(col(by) if isinstance(by, str) else by)
        if coordinate == "time":
            x = F.unix_micros(bc.cast("timestamp")).cast("double")
        else:
            x = bc.cast("double")
        part = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        )
        w = part.orderBy(bc)
        c = self._col
        prev = w.rowsBetween(Window.unboundedPreceding, 0)
        nxt = w.rowsBetween(0, Window.unboundedFollowing)
        pv = F.last(c, ignorenulls=True).over(prev)
        px = F.last(F.when(c.isNotNull(), x), ignorenulls=True).over(prev)
        nv = F.first(c, ignorenulls=True).over(nxt)
        nx = F.first(F.when(c.isNotNull(), x), ignorenulls=True).over(nxt)
        filled = pv + (nv - pv) * (x - px) / (nx - px)
        return _wrap(
            F.when(c.isNotNull(), c.cast("double")).when(
                pv.isNotNull() & nv.isNotNull(), filled
            )
        )

    # distinctness predicates (polars is_duplicated/is_unique family).
    # Window.partitionBy groups nulls together, matching polars' null-is-a-
    # value semantics for these.
    def is_duplicated(self) -> "Expr":
        return _wrap(F.count(F.lit(1)).over(Window.partitionBy(self._col)) > 1)

    def is_unique(self) -> "Expr":
        return _wrap(F.count(F.lit(1)).over(Window.partitionBy(self._col)) == 1)

    def is_first_distinct(self, order_by: Any = None) -> "Expr":
        w = Window.partitionBy(self._col).orderBy(*_order_cols(order_by))
        return _wrap(F.row_number().over(w) == 1)

    def is_last_distinct(self, order_by: Any = None) -> "Expr":
        w = Window.partitionBy(self._col).orderBy(*[o.desc() for o in _order_cols(order_by)])
        return _wrap(F.row_number().over(w) == 1)

    def mode(self) -> "Expr":
        """Most frequent value (aggregation context). Ties resolve to the
        smallest value (Spark 4 deterministic mode), so results are stable
        across runs — polars returns ALL tied modes as a list; use
        ``.implode()`` + a count-window if the full tie set is needed.
        Memory is O(distinct values in the group) on the merging reducer —
        fine for categorical columns at any scale; for a high-cardinality
        100 TB column prefer a groupBy(value).count().top_k(1) reformulation
        (map-side combined)."""
        return _wrap(F.mode(self._col, True))

    def rle_id(self, order_by: Any = None, partition_by: Sequence[Any] = ()) -> "Expr":
        """Run id: 0-based counter that increments whenever the value changes
        from the previous row (polars Expr.rle_id). lag + change-flag cumsum —
        two stacked windows on the same (partition, order), one shuffle.
        Null == null counts as 'same run', polars-style."""
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by))
        prev = F.lag(self._col).over(w)
        changed = F.when(
            F.row_number().over(w) == 1, F.lit(0)
        ).when(self._col.eqNullSafe(prev), F.lit(0)).otherwise(F.lit(1))
        return _wrap(
            F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long")
        )

    def _peak(self, cmp, order_by, partition_by) -> "Expr":
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by))
        prev, nxt = F.lag(self._col).over(w), F.lead(self._col).over(w)
        # boundaries: a missing neighbor never disqualifies (polars peak_max
        # marks an edge element that beats its single neighbor)
        return _wrap(
            (prev.isNull() | cmp(self._col, prev)) & (nxt.isNull() | cmp(self._col, nxt))
        )

    def peak_max(self, order_by: Any = None, partition_by: Sequence[Any] = ()) -> "Expr":
        """Local-maximum mask (polars Expr.peak_max): strictly greater than
        both neighbors."""
        return self._peak(lambda a, b: a > b, order_by, partition_by)

    def peak_min(self, order_by: Any = None, partition_by: Sequence[Any] = ()) -> "Expr":
        """Local-minimum mask (polars Expr.peak_min)."""
        return self._peak(lambda a, b: a < b, order_by, partition_by)

    def pct_change(self, n: int = 1, order_by: Any = None, partition_by: Sequence[Any] = ()) -> "Expr":
        """Fractional change vs the value ``n`` rows earlier (polars
        Expr.pct_change). Polars forward-fills nulls BEFORE the shift/diff, so
        a null row inherits the previous value's change basis: on
        [1, null, null, 4] polars yields [null, 0.0, 0.0, 3.0]."""
        w = (
            Window.partitionBy(*[_c(col(p) if isinstance(p, str) else p) for p in _pb(partition_by)])
            if partition_by
            else Window.partitionBy()
        ).orderBy(*_order_cols(order_by))
        ff = F.last(self._col, ignorenulls=True).over(w.rowsBetween(Window.unboundedPreceding, 0))
        prev = F.lag(ff, n).over(w)
        return _wrap((ff - prev) / prev)

    # -- map/UDF (udf.rs:92-123; SURVEY §2.12) -----------------------------
    def map(self, fn, return_dtype: str | T.DataType | None = None) -> "Expr":
        """Vectorized scalar UDF: ``fn(pandas.Series) -> pandas.Series``.

        Mirrors the reference's Arrow-vectorized ``expr.map`` contract
        (native_shim/src/udf.rs:47-123): the whole chunk crosses as one Arrow
        array; exceptions propagate and abort the query.  ``return_dtype=None``
        is not supported (Spark needs a declared type) — pass the output dtype,
        like the reference's non-Unknown path.
        """
        if return_dtype is None:
            raise ValueError(
                "Spark requires a declared return dtype for UDFs; for the "
                "reference's same-as-input behavior use LazyFrame.map_column "
                "(it resolves the dtype from the schema)"
            )
        t = _to_spark_type(return_dtype)
        from pyspark.sql.functions import pandas_udf

        udf = pandas_udf(fn, returnType=t)
        return _wrap(udf(self._col))

    def map_elements(self, fn, return_dtype: str | T.DataType) -> "Expr":
        """Element-wise wrapper (reference Wrap<TIn,TOut> auto-vectorizer,
        Polars.CSharp/UdfUtils.cs:216) — vectorized via pandas .map under the hood."""
        t = _to_spark_type(return_dtype)
        from pyspark.sql.functions import pandas_udf

        def _vec(s):
            return s.map(lambda v: fn(v) if v is not None else None)

        udf = pandas_udf(_vec, returnType=t)
        return _wrap(udf(self._col))

    # -- conditional -------------------------------------------------------
    # (when/then/otherwise is module-level `when`; ternary helper here)
    def if_else(self, then_val: Any, else_val: Any) -> "Expr":
        return _wrap(F.when(self._col, _c(then_val)).otherwise(_c(else_val)))

    # -- namespaces --------------------------------------------------------
    @property
    def str(self) -> "ExprStrNamespace":
        return ExprStrNamespace(self)

    @property
    def dt(self) -> "ExprDtNamespace":
        return ExprDtNamespace(self)

    @property
    def list(self) -> "ExprListNamespace":
        return ExprListNamespace(self)

    @property
    def struct(self) -> "ExprStructNamespace":
        return ExprStructNamespace(self)

    @property
    def bin(self) -> "ExprBinNamespace":
        return ExprBinNamespace(self)


class ExprBinNamespace:
    """Binary ops (polars Expr.bin — parity extra; all JVM built-ins)."""

    def __init__(self, expr: Expr):
        self._c = expr._col

    def encode(self, encoding: str) -> Expr:
        """bytes -> text: 'hex' (lowercase, polars-style) or 'base64'."""
        if encoding == "hex":
            return _wrap(F.lower(F.hex(self._c)))
        if encoding == "base64":
            return _wrap(F.base64(self._c))
        raise ValueError(f"encoding={encoding!r} must be 'hex' or 'base64'")

    def decode(self, encoding: str) -> Expr:
        """text -> bytes (invalid input yields null, polars strict=False)."""
        if encoding == "hex":
            return _wrap(F.try_to_binary(self._c, F.lit("hex")))
        if encoding == "base64":
            return _wrap(F.try_to_binary(self._c, F.lit("base64")))
        raise ValueError(f"encoding={encoding!r} must be 'hex' or 'base64'")

    def size(self) -> Expr:
        """Byte length (polars bin.size)."""
        return _wrap(F.octet_length(self._c))

    def contains(self, literal: bytes) -> Expr:
        return _wrap(F.contains(self._c, F.lit(literal)))

    def starts_with(self, literal: bytes) -> Expr:
        return _wrap(F.startswith(self._c, F.lit(literal)))

    def ends_with(self, literal: bytes) -> Expr:
        return _wrap(F.endswith(self._c, F.lit(literal)))


class ExprNameNamespace:
    """name.prefix/suffix (expr.rs:891-914). Resolved per-expression: requires
    the underlying column to be a plain reference so we know the base name."""

    def __init__(self, expr: Expr):
        self._expr = expr

    def _base_name(self) -> str:
        # Column's toString is like "Column<'colname'>" for plain refs
        s = str(self._expr._col)
        if s.startswith("Column<'") and s.endswith("'>"):
            inner = s[8:-2]
            if all(ch.isalnum() or ch in "_." for ch in inner):
                return inner
        raise ValueError(
            "name.prefix/suffix needs a plain column reference; use .alias() for computed exprs"
        )

    def prefix(self, p: str) -> Expr:
        return self._expr.alias(p + self._base_name())

    def suffix(self, s: str) -> Expr:
        return self._expr.alias(self._base_name() + s)

    def keep(self) -> Expr:
        return self._expr.alias(self._base_name())


class ExprStrNamespace:
    """String ops (expr.rs:262-536)."""

    def __init__(self, expr: Expr):
        self._c = expr._col

    def to_uppercase(self) -> Expr:
        return _wrap(F.upper(self._c))

    def to_lowercase(self) -> Expr:
        return _wrap(F.lower(self._c))

    def len_bytes(self) -> Expr:
        return _wrap(F.octet_length(self._c))

    def len_chars(self) -> Expr:
        return _wrap(F.length(self._c))

    def contains(self, pattern: str, literal: bool = False) -> Expr:
        if literal:
            return _wrap(self._c.contains(pattern))
        return _wrap(self._c.rlike(pattern))

    def slice(self, offset: int, length: int | None = None) -> Expr:
        # polars slice: negative offset counts from end (expr.rs:322-334)
        c = self._c
        n = F.length(c)
        if offset >= 0:
            start = F.lit(offset + 1)
        else:
            start = F.greatest(n + F.lit(offset) + 1, F.lit(1))
        ln = F.lit(2147483647) if length is None else F.lit(int(length))
        return _wrap(F.substring(c, start, ln))

    def extract(self, pattern: str, group_index: int = 1) -> Expr:
        # F.regexp_extract returns "" on no-match; polars returns null (expr.rs:337-351)
        out = F.regexp_extract(self._c, pattern, group_index)
        return _wrap(F.when(self._c.rlike(pattern), out))

    def replace_all(self, pattern: str, value: str, literal: bool = False) -> Expr:
        if literal:
            return _wrap(F.replace(self._c, F.lit(pattern), F.lit(value)))
        return _wrap(F.regexp_replace(self._c, pattern, value))

    def split(self, by: str) -> Expr:
        import re as _re

        return _wrap(F.split(self._c, _re.escape(by)))

    def strip_chars(self, chars: str | None = None) -> Expr:
        if chars is None:
            return _wrap(F.trim(self._c))
        return _wrap(F.btrim(self._c, F.lit(chars)))

    def strip_chars_start(self, chars: str | None = None) -> Expr:
        if chars is None:
            return _wrap(F.ltrim(self._c))
        return _wrap(F.ltrim(self._c, F.lit(chars)))

    def strip_chars_end(self, chars: str | None = None) -> Expr:
        if chars is None:
            return _wrap(F.rtrim(self._c))
        return _wrap(F.rtrim(self._c, F.lit(chars)))

    def strip_prefix(self, prefix: str) -> Expr:
        c = self._c
        return _wrap(
            F.when(c.startswith(prefix), F.substring(c, len(prefix) + 1, 2147483647)).otherwise(c)
        )

    def strip_suffix(self, suffix: str) -> Expr:
        c = self._c
        return _wrap(
            F.when(c.endswith(suffix), F.substring(c, 1, F.length(c) - len(suffix))).otherwise(c)
        )

    def head(self, n: int) -> Expr:
        """First n characters (polars str.head; negative n = all but last
        |n|).  Null in → null out; out-of-range clamps to ''."""
        if n >= 0:
            return _wrap(F.substring(self._c, 1, n))
        return _wrap(F.substring(self._c, 1, F.greatest(F.length(self._c) + n, F.lit(0))))

    def tail(self, n: int) -> Expr:
        """Last n characters (polars str.tail; negative n = all but first |n|)."""
        if n == 0:
            return _wrap(F.when(self._c.isNotNull(), F.lit("")))
        if n > 0:
            start = F.greatest(F.length(self._c) - F.lit(n) + 1, F.lit(1))
            return _wrap(F.substring(self._c, start, n))
        return _wrap(F.substring(self._c, -n + 1, 2147483647))

    def starts_with(self, prefix: str) -> Expr:
        return _wrap(self._c.startswith(prefix))

    def ends_with(self, suffix: str) -> Expr:
        return _wrap(self._c.endswith(suffix))

    def to_date(self, fmt: str | None = None, strict: bool = False) -> Expr:
        java = strftime_to_java(fmt) if fmt else None
        if strict:
            out = F.to_date(self._c, java) if java else F.to_date(self._c)
        else:
            ts = F.try_to_timestamp(self._c, F.lit(java)) if java else F.try_to_timestamp(self._c)
            out = ts.cast("date")
        return _wrap(out)

    def to_datetime(self, fmt: str | None = None, strict: bool = False) -> Expr:
        java = strftime_to_java(fmt) if fmt else None
        if strict:
            out = F.to_timestamp(self._c, java) if java else F.to_timestamp(self._c)
        else:
            out = F.try_to_timestamp(self._c, F.lit(java)) if java else F.try_to_timestamp(self._c)
        return _wrap(out)

    def json_path_match(self, path: str) -> Expr:
        """First JSONPath match as a string, null on miss/invalid JSON
        (polars str.json_path_match; Spark get_json_object)."""
        return _wrap(F.get_json_object(self._c, path))

    def json_decode(self, dtype: str | T.DataType) -> Expr:
        return _wrap(F.from_json(self._c, _to_spark_type(dtype)))

    def concat(self, other: Any, sep: str = "") -> Expr:
        return _wrap(F.concat_ws(sep, self._c, _c(other)))

    def pad_start(self, length: int, fill_char: str = " ") -> Expr:
        """polars str.pad_start: pad to length (longer strings unchanged)."""
        return _wrap(
            F.when(F.length(self._c) >= length, self._c).otherwise(
                F.lpad(self._c, length, fill_char)
            )
        )

    def pad_end(self, length: int, fill_char: str = " ") -> Expr:
        return _wrap(
            F.when(F.length(self._c) >= length, self._c).otherwise(
                F.rpad(self._c, length, fill_char)
            )
        )

    def zfill(self, length: int) -> Expr:
        """polars str.zfill: zero-pad to length, keeping a leading +/- sign in
        front of the zeros."""
        c = self._c
        sign = F.substring(c, 1, 1)
        signed = sign.isin("+", "-")
        rest = F.substring(c, 2, 2_147_483_647)
        padded_rest = F.concat(sign, F.lpad(rest, length - 1, "0"))
        return _wrap(
            F.when(F.length(c) >= length, c)
            .when(signed, padded_rest)
            .otherwise(F.lpad(c, length, "0"))
        )

    def extract_groups(self, pattern: str) -> Expr:
        """All capture groups of ``pattern`` as a struct (polars
        str.extract_groups): named groups become fields by name, unnamed ones
        "1", "2", ...; a non-matching row yields nulls."""
        import re as _re

        compiled = _re.compile(pattern)
        if compiled.groups == 0:
            raise ValueError("pattern has no capture groups")
        names = {v: k for k, v in compiled.groupindex.items()}
        # Python names groups (?P<x>...); Java/Spark regex wants (?<x>...)
        jpattern = pattern.replace("(?P<", "(?<").replace("(?P=", r"\k<").replace(
            "(?P>", "(?"
        )
        fields = [
            F.when(self._c.rlike(jpattern), F.regexp_extract(self._c, jpattern, i)).alias(
                names.get(i, str(i))
            )
            for i in range(1, compiled.groups + 1)
        ]
        return _wrap(F.struct(*fields))

    def splitn(self, by: str, n: int) -> Expr:
        """Split into at most ``n`` pieces as a struct field_0..field_{n-1}
        (polars str.splitn); missing pieces are null."""
        import re as _re

        parts = F.split(self._c, _re.escape(by), n)
        return _wrap(
            F.struct(
                *[F.get(parts, i).alias(f"field_{i}") for i in range(n)]
            )
        )

    def split_exact(self, by: str, n: int) -> Expr:
        """Split into EXACTLY n+1 pieces as a struct field_0..field_n (polars
        str.split_exact — note the off-by-one vs splitn: n is the number of
        SPLITS, so n+1 fields); extra content stays in the last field,
        missing pieces are null."""
        import re as _re

        parts = F.split(self._c, _re.escape(by), n + 1)
        return _wrap(
            F.struct(*[F.get(parts, i).alias(f"field_{i}") for i in range(n + 1)])
        )

    def to_titlecase(self) -> Expr:
        """polars str.to_titlecase: first letter of each word upper, rest
        lower (Spark initcap matches polars' whitespace-word semantics)."""
        return _wrap(F.initcap(self._c))

    def reverse(self) -> Expr:
        """polars str.reverse: code-point reversal (Spark reverse)."""
        return _wrap(F.reverse(self._c))

    def to_integer(self, base: int = 10, strict: bool = True) -> Expr:
        """polars str.to_integer: parse in the given base.  base 10 is a
        plain cast; base 2..36 uses Spark's conv (which returns garbage on
        invalid digits, so invalid rows are pre-masked to null).  strict=True
        aborts the query on an unparseable non-null value, polars-style."""
        c = self._c
        if base == 10:
            out = c.cast("long")
            valid = c.rlike(r"^[+-]?[0-9]+$")
        else:
            if not (2 <= base <= 36):
                raise ValueError("base must be in 2..36")
            digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:base]
            valid = F.lower(c).rlike(rf"^[+-]?[{digits}]+$")
            out = F.conv(c, base, 10).cast("long")
        masked = F.when(valid, out)
        if strict:
            masked = F.when(c.isNull(), F.lit(None).cast("long")).when(valid, out).otherwise(
                F.raise_error(
                    F.concat(F.lit(f"to_integer(base={base}): invalid value "), c)
                ).cast("long")
            )
        return _wrap(masked)

    def extract_many(
        self, patterns: Sequence[str], ascii_case_insensitive: bool = False,
        overlapping: bool = False,
    ) -> Expr:
        """All occurrences of any literal pattern, in match order (polars
        str.extract_many, the aho-corasick surface): ONE alternation regex
        (longest-first, so overlapping literals prefer the longer match like
        polars' leftmost-longest) driving a single regexp_extract_all scan.
        ``overlapping=True`` is not expressible in one linear regex pass —
        explicitly unsupported rather than silently wrong."""
        import re as _re

        if not patterns:
            raise ValueError("extract_many needs at least one pattern")
        if overlapping:
            raise NotImplementedError(
                "overlapping=True needs an aho-corasick pass; the regex "
                "engine yields non-overlapping leftmost-longest matches"
            )
        ordered = sorted(patterns, key=len, reverse=True)
        alt = "(" + "|".join(_re.escape(p) for p in ordered) + ")"
        if ascii_case_insensitive:
            alt = "(?i)" + alt
        return _wrap(F.regexp_extract_all(self._c, F.lit(alt), F.lit(1)))

    def contains_any(self, patterns: Sequence[str], ascii_case_insensitive: bool = False) -> Expr:
        """True when the string contains ANY of the literal patterns (polars
        str.contains_any): compiled into one alternation regex — a single
        scan per row regardless of pattern-list size."""
        import re as _re

        if not patterns:
            raise ValueError("contains_any needs at least one pattern")
        alt = "|".join(_re.escape(p) for p in patterns)
        if ascii_case_insensitive:
            alt = "(?i)" + alt
        return _wrap(self._c.rlike(alt))

    def replace_many(self, patterns: Sequence[str], replace_with: "str | Sequence[str]") -> Expr:
        """Replace every occurrence of each literal pattern (polars
        str.replace_many).  A single replacement string compiles to ONE
        alternation regexp pass; per-pattern replacements chain one
        regexp_replace per pattern (longer patterns first, polars'
        leftmost-longest behaviour for overlapping literals)."""
        import re as _re

        def _lit_repl(r: str) -> str:
            # regexp_replace replacements interpret $N as a group ref and \
            # as an escape; polars replace_many is fully literal — escape both
            return _re.sub(r"([\\$])", r"\\\1", r)

        if not patterns:
            raise ValueError("replace_many needs at least one pattern")
        if isinstance(replace_with, str):
            ordered = sorted(patterns, key=len, reverse=True)
            alt = "|".join(_re.escape(p) for p in ordered)
            return _wrap(F.regexp_replace(self._c, alt, _lit_repl(replace_with)))
        if len(replace_with) != len(patterns):
            raise ValueError("replace_with must be a string or match patterns in length")
        pairs = sorted(zip(patterns, replace_with), key=lambda pr: len(pr[0]), reverse=True)
        c = self._c
        for p, r in pairs:
            c = F.regexp_replace(c, _re.escape(p), _lit_repl(r))
        return _wrap(c)

    def extract_all(self, pattern: str) -> Expr:
        """All full regex matches as a list (polars str.extract_all)."""
        return _wrap(F.regexp_extract_all(self._c, F.lit(pattern), F.lit(0)))

    def count_matches(self, pattern: str, literal: bool = False) -> Expr:
        """Number of non-overlapping matches (polars str.count_matches)."""
        import re as _re

        pat = _re.escape(pattern) if literal else pattern
        return _wrap(F.regexp_count(self._c, F.lit(pat)))

    def find(self, pattern: str, literal: bool = False) -> Expr:
        """0-based offset of the first match, null when absent (polars
        str.find)."""
        import re as _re

        pat = _re.escape(pattern) if literal else pattern
        pos = F.regexp_instr(self._c, F.lit(pat))
        return _wrap(F.when(pos > 0, pos - 1))


class ExprDtNamespace:
    """Temporal ops (expr.rs:247-700).

    All epoch-math paths go through ``_ts`` (a defensive ``cast("timestamp")``):
    polars' Datetime default is tz-naive µs (expr.rs:534), which Spark 4 reads
    from parquet as TIMESTAMP_NTZ, and ``unix_micros`` rejects NTZ input. The
    session tz is UTC, so the cast is wall-clock-preserving and a no-op on
    already-tz-aware columns.
    """

    def __init__(self, expr: Expr):
        self._c = expr._col
        self._ts = expr._col.cast("timestamp")

    def year(self) -> Expr:
        return _wrap(F.year(self._c))

    def month(self) -> Expr:
        return _wrap(F.month(self._c))

    def day(self) -> Expr:
        return _wrap(F.dayofmonth(self._c))

    def ordinal_day(self) -> Expr:
        return _wrap(F.dayofyear(self._c))

    def quarter(self) -> Expr:
        return _wrap(F.quarter(self._c))

    def week(self) -> Expr:
        """ISO 8601 week number (polars dt.week; Spark weekofyear is ISO)."""
        return _wrap(F.weekofyear(self._c))

    def iso_year(self) -> Expr:
        """ISO week-numbering year: the year of this ISO week's Thursday
        (differs from calendar year around Jan 1 / Dec 31)."""
        thursday = F.date_add(self._c.cast("date"), 4 - (F.weekday(self._c) + 1))
        return _wrap(F.year(thursday))

    def is_leap_year(self) -> Expr:
        y = F.year(self._c)
        return _wrap(((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0))

    def days_in_month(self) -> Expr:
        return _wrap(F.dayofmonth(F.last_day(self._c)))

    def epoch(self, unit: str = "us") -> Expr:
        """Time since the Unix epoch (polars dt.epoch): unit in
        'd'/'s'/'ms'/'us'/'ns' (ns is us*1000 — Spark timestamps are
        microsecond-precision).  NTZ input is cast defensively."""
        ts = self._c.cast("timestamp")
        us = F.unix_micros(ts)
        if unit == "us":
            return _wrap(us)
        if unit == "ns":
            return _wrap(us * F.lit(1000))
        if unit == "ms":
            return _wrap(F.floor(us / F.lit(1000)).cast("long"))
        if unit == "s":
            return _wrap(F.floor(us / F.lit(1_000_000)).cast("long"))
        if unit == "d":
            return _wrap(F.floor(us / F.lit(86_400_000_000)).cast("long"))
        raise ValueError(f"epoch unit={unit!r} must be d/s/ms/us/ns")

    def month_start(self) -> Expr:
        """Roll back to the first day of the month, keeping time-of-day
        (polars dt.month_start)."""
        return _wrap(
            F.timestamp_add("DAY", -(F.dayofmonth(self._c) - F.lit(1)), self._c)
        )

    def month_end(self) -> Expr:
        """Roll forward to the last day of the month, keeping time-of-day
        (polars dt.month_end)."""
        return _wrap(
            F.timestamp_add(
                "DAY",
                F.dayofmonth(F.last_day(self._c)) - F.dayofmonth(self._c),
                self._c,
            )
        )

    def add_business_days(self, n: int, roll: str = "raise") -> Expr:
        """Add ``n`` Mon-Fri business days (polars dt.add_business_days with
        the default week_mask; holiday calendars are not supported — compose
        with an is_in(holidays) filter upstream if needed).

        Weekend starts follow ``roll``: 'raise' aborts the query (polars
        default), 'forward' rolls to Monday first, 'backward' to Friday.
        Closed-form codegen: full_weeks*7 + remainder, +2 when the remainder
        crosses a weekend — no UDF, no calendar table."""
        if roll not in ("raise", "forward", "backward"):
            raise ValueError("roll must be raise|forward|backward")
        d = self._c
        w = F.weekday(d)  # Mon=0..Sun=6
        is_weekend = w >= 5
        if roll == "forward":
            start = F.when(is_weekend, F.date_add(d, (F.lit(7) - w).cast("int"))).otherwise(d)
        elif roll == "backward":
            start = F.when(is_weekend, F.date_sub(d, (w - F.lit(4)).cast("int"))).otherwise(d)
        else:
            start = F.when(
                is_weekend,
                F.raise_error(
                    F.concat(F.lit("add_business_days: weekend start "), d.cast("string"))
                ),
            ).otherwise(d)
        sw = F.weekday(start)
        n_ = int(n)
        weeks, rem = divmod(abs(n_), 5)
        if n_ >= 0:
            cross = (sw + F.lit(rem)) >= 5
            off = F.lit(weeks * 7 + rem) + F.when(cross, F.lit(2)).otherwise(F.lit(0))
            return _wrap(F.date_add(start.cast("date"), off.cast("int")))
        cross = (sw - F.lit(rem)) < 0
        off = F.lit(weeks * 7 + rem) + F.when(cross, F.lit(2)).otherwise(F.lit(0))
        return _wrap(F.date_sub(start.cast("date"), off.cast("int")))

    def weekday(self) -> Expr:
        # polars: Monday=1..Sunday=7 ; Spark weekday(): Monday=0
        return _wrap(F.weekday(self._c) + F.lit(1))

    def hour(self) -> Expr:
        return _wrap(F.hour(self._c))

    def minute(self) -> Expr:
        return _wrap(F.minute(self._c))

    def second(self) -> Expr:
        return _wrap(F.floor(F.second(self._c)).cast("int"))

    def millisecond(self) -> Expr:
        return _wrap((F.unix_micros(self._ts) % 1_000_000 / 1000).cast("int"))

    def microsecond(self) -> Expr:
        return _wrap((F.unix_micros(self._ts) % 1_000_000).cast("int"))

    def nanosecond(self) -> Expr:
        return _wrap(((F.unix_micros(self._ts) % 1_000_000) * 1000).cast("long"))

    def date(self) -> Expr:
        return _wrap(self._c.cast("date"))

    def time(self) -> Expr:
        """Time-of-day as nanoseconds since midnight (reference Time dtype, §1.3)."""
        midnight = F.date_trunc("day", self._ts)
        return _wrap(((F.unix_micros(self._ts) - F.unix_micros(midnight)) * 1000).cast("long"))

    def to_string(self, fmt: str) -> Expr:
        return _wrap(F.date_format(self._c, strftime_to_java(fmt)))

    strftime = to_string

    def truncate(self, every: str) -> Expr:
        """Floor to an arbitrary fixed interval like "15m" (expr.rs:569-579)."""
        unit_map = {"1y": "year", "1mo": "month", "1d": "day", "1h": "hour", "1m": "minute", "1s": "second"}
        if every in unit_map:
            return _wrap(F.date_trunc(unit_map[every], self._c))
        micros = parse_polars_duration_us(every)
        e = F.unix_micros(self._ts)
        return _wrap(F.timestamp_micros((e - (e % F.lit(micros))).cast("long")))

    def round(self, every: str) -> Expr:
        """Round to nearest interval boundary (expr.rs:583-591): trunc(t + every/2)."""
        micros = parse_polars_duration_us(every)
        e = F.unix_micros(self._ts) + F.lit(micros // 2)
        return _wrap(F.timestamp_micros((e - (e % F.lit(micros))).cast("long")))

    def offset_by(self, duration: str) -> Expr:
        from ._fmt import duration_to_interval

        return _wrap(self._c + F.expr(f"INTERVAL {duration_to_interval(duration)}"))

    def timestamp(self, unit: str = "us") -> Expr:
        if unit == "ns":
            return _wrap(F.unix_micros(self._ts) * 1000)
        if unit == "us":
            return _wrap(F.unix_micros(self._ts))
        if unit == "ms":
            return _wrap(F.unix_millis(self._ts))
        raise ValueError(f"unknown unit {unit!r}")

    def convert_time_zone(self, tz: str) -> Expr:
        # session tz is UTC; display-convert = from_utc_timestamp (wall-clock shift)
        return _wrap(F.from_utc_timestamp(self._c, tz))

    def replace_time_zone(
        self, tz: str | None, ambiguous: str = "raise", non_existent: str = "raise"
    ) -> Expr:
        """Reinterpret the wall-clock in ``tz`` (expr.rs:660-700).

        DST policies: ambiguous ∈ {'earliest','latest','raise','null'},
        non_existent ∈ {'raise','null'}.  The default-policy path stays a pure
        JVM expression (to_utc_timestamp resolves overlaps to the earlier
        offset); explicit policies run through a vectorized pandas pass."""
        if tz is None:
            return _wrap(self._c.cast("timestamp_ntz"))
        if ambiguous == "raise" and non_existent == "raise":
            return _wrap(F.to_utc_timestamp(self._c, tz))

        amb_map = {"earliest": True, "latest": False, "raise": "raise", "null": "NaT"}
        nonex_map = {"raise": "raise", "null": "NaT"}
        amb = amb_map[ambiguous]
        nonex = nonex_map[non_existent]
        from pyspark.sql.functions import pandas_udf

        def _localize(s):
            # wall-clock arrives naive (session UTC); localize with policy,
            # convert back to UTC instants for Spark's timestamp storage
            localized = s.dt.tz_localize(tz, ambiguous=amb, nonexistent=nonex)
            return localized.dt.tz_convert("UTC").dt.tz_localize(None)

        udf = pandas_udf(_localize, returnType=T.TimestampType())
        return _wrap(udf(self._c))

    def total_days(self) -> Expr:
        return _wrap(F.floor(self._c.cast("long") / 86_400_000_000).cast("long"))

    def total_seconds(self) -> Expr:
        return _wrap(F.floor(self._c.cast("long") / 1_000_000).cast("long"))


class ExprListNamespace:
    """List/array ops (expr.rs:263-847)."""

    def __init__(self, expr: Expr):
        self._c = expr._col

    def eval(self, fn) -> Expr:
        """Per-element expression (polars ``list.eval``): ``fn`` receives each
        element as an Expr and returns the transformed Expr — the Spark-
        idiomatic callable form of ``pl.element()`` (compiles to
        ``F.transform``, pure codegen, no UDF)."""
        return _wrap(F.transform(self._c, lambda x: _c(fn(_wrap(x)))))

    def filter(self, fn) -> Expr:
        """Keep elements where ``fn(element)`` is true (maps to F.filter)."""
        return _wrap(F.filter(self._c, lambda x: _c(fn(_wrap(x)))))

    def first(self) -> Expr:
        return _wrap(F.element_at(self._c, 1))

    def last(self) -> Expr:
        return _wrap(F.element_at(self._c, -1))

    def head(self, n: int = 5) -> Expr:
        """First n elements (polars list.head)."""
        return _wrap(F.slice(self._c, 1, int(n)))

    def tail(self, n: int = 5) -> Expr:
        """Last n elements (polars list.tail)."""
        sz = F.size(self._c)
        start = F.greatest(sz - F.lit(int(n)) + F.lit(1), F.lit(1))
        return _wrap(F.slice(self._c, start, F.lit(int(n))))

    def gather(self, indices: "Sequence[int] | Expr", null_on_oob: bool = False) -> Expr:
        """Elements at the given indices (polars list.gather): negative
        indices count from the end.  Compiles to a transform over the index
        array — pure codegen.  null_on_oob=False raises on an out-of-bounds
        index like polars."""
        c = self._c
        idx = (
            F.array(*[F.lit(int(i)) for i in indices])
            if not isinstance(indices, Expr)
            else indices._col
        )
        sz = F.size(c)

        def pick(i):
            pos = F.when(i >= 0, i + 1).otherwise(sz + i + 1)  # element_at is 1-based
            val = F.element_at(c, pos)
            if null_on_oob:
                return F.when((pos >= 1) & (pos <= sz), val)
            return F.when((pos >= 1) & (pos <= sz), val).otherwise(
                F.raise_error(F.concat(F.lit("list.gather index out of bounds: "), i.cast("string")))
            )

        return _wrap(F.transform(idx, pick))

    def diff(self, n: int = 1) -> Expr:
        """Element-wise difference with the element n positions earlier
        (polars list.diff, null_behavior='ignore' drops the first n):
        here polars' default — first n elements are null."""
        c = self._c
        return _wrap(
            F.transform(
                c,
                lambda x, i: F.when(i >= n, x - F.element_at(c, i - F.lit(n) + 1)),
            )
        )

    def shift(self, n: int = 1) -> Expr:
        """Shift elements by n (positive = toward the end), vacated slots
        null (polars list.shift)."""
        c = self._c
        sz = F.size(c)
        if n >= 0:
            return _wrap(
                F.transform(c, lambda x, i: F.when(i >= n, F.element_at(c, i - F.lit(n) + 1)))
            )
        m = -n
        return _wrap(
            F.transform(
                c, lambda x, i: F.when(i < sz - m, F.element_at(c, i + F.lit(m) + 1))
            )
        )

    def any(self) -> Expr:
        """True when any element of a boolean list is true (polars list.any;
        empty/all-null -> false like polars)."""
        return _wrap(F.coalesce(F.exists(self._c, lambda x: x), F.lit(False)))

    def all(self) -> Expr:
        """True when every element is true (polars list.all; empty -> true)."""
        return _wrap(F.coalesce(F.forall(self._c, lambda x: x), F.lit(True)))

    def median(self) -> Expr:
        """Median of the list elements (exact; sorts the list — per-row cost
        O(len log len), same as polars)."""
        c = F.array_sort(F.filter(self._c, lambda x: x.isNotNull()))
        n = F.size(c)
        mid = F.floor((n + F.lit(1)) / F.lit(2)).cast("int")  # odd: exact middle
        lo = F.element_at(c, F.floor(n / F.lit(2)).cast("int"))
        hi = F.element_at(c, F.floor(n / F.lit(2)).cast("int") + F.lit(1))
        return _wrap(
            F.when(n == 0, F.lit(None).cast("double")).otherwise(
                F.when(n % 2 == 1, F.element_at(c, mid).cast("double")).otherwise(
                    (lo.cast("double") + hi.cast("double")) / 2.0
                )
            )
        )

    def std(self, ddof: int = 1) -> Expr:
        """Standard deviation of the list elements (polars list.std)."""
        return _wrap(F.sqrt(self._var_col(ddof)))

    def var(self, ddof: int = 1) -> Expr:
        """Variance of the list elements (polars list.var)."""
        return _wrap(self._var_col(ddof))

    def _var_col(self, ddof: int):
        vals = F.filter(self._c, lambda x: x.isNotNull())
        n = F.size(vals).cast("double")
        s = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x.cast("double"))
        s2 = F.aggregate(vals, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double"))
        return F.when(n > ddof, (s2 - s * s / n) / (n - F.lit(float(ddof))))

    def get(self, index: int, null_on_oob: bool = True) -> Expr:
        if index >= 0:
            out = F.get(self._c, index)  # F.get is 0-indexed, null on OOB
            in_bounds = F.size(self._c) > index
        else:
            out = F.element_at(self._c, index)  # negative = from end, 1-indexed semantics
            in_bounds = F.size(self._c) >= -index
        if not null_on_oob:
            # guard on the INDEX vs the array size, not on the output's
            # nullness — an in-bounds element whose value is legitimately
            # null must not raise.  raise_error in the else branch: a
            # same-branch CASE around assert_true gets eliminated by Catalyst.
            err = F.raise_error(F.lit("list.get out of bounds"))
            return _wrap(F.when(self._c.isNull() | in_bounds, out).otherwise(err))
        return _wrap(out)

    def sum(self) -> Expr:
        return _wrap(
            F.aggregate(self._c, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
        )

    def min(self) -> Expr:
        return _wrap(F.array_min(self._c))

    def max(self) -> Expr:
        return _wrap(F.array_max(self._c))

    def mean(self) -> Expr:
        total = F.aggregate(self._c, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
        return _wrap(total / F.size(self._c))

    def sort(self, descending: bool = False) -> Expr:
        if descending:
            return _wrap(F.reverse(F.array_sort(self._c)))
        return _wrap(F.array_sort(self._c))

    def reverse(self) -> Expr:
        return _wrap(F.reverse(self._c))

    def contains(self, item: Any) -> Expr:
        return _wrap(F.array_contains(self._c, _c(item)))

    def join(self, separator: str, ignore_nulls: bool = True) -> Expr:
        if ignore_nulls:
            return _wrap(F.array_join(self._c, separator))
        # any null element -> null result (polars ignore_nulls=false propagates)
        has_null = F.exists(self._c, lambda x: x.isNull())
        return _wrap(F.when(~has_null, F.array_join(self._c, separator)))

    def len(self) -> Expr:
        return _wrap(F.size(self._c))

    def explode(self) -> Expr:
        return _wrap(F.explode(self._c))

    def unique(self) -> Expr:
        return _wrap(F.array_distinct(self._c))

    def n_unique(self) -> Expr:
        """Distinct element count (polars list.n_unique; null list -> null,
        not Spark's legacy size(null) = -1)."""
        return _wrap(
            F.when(self._c.isNotNull(), F.size(F.array_distinct(self._c)))
        )

    def set_union(self, other: "Expr") -> Expr:
        """polars list.set_union (distinct elements of both, left-first order)."""
        return _wrap(F.array_union(self._c, _c(other)))

    def set_intersection(self, other: "Expr") -> Expr:
        """polars list.set_intersection."""
        return _wrap(F.array_intersect(self._c, _c(other)))

    def set_difference(self, other: "Expr") -> Expr:
        """polars list.set_difference (elements of self not in other)."""
        return _wrap(F.array_except(self._c, _c(other)))

    def index_of(self, value: Any) -> Expr:
        """0-based position of the first occurrence, null when absent
        (polars Series.index_of semantics at list level)."""
        pos = F.array_position(self._c, _c(value))
        return _wrap(F.when(pos > 0, pos - 1))

    def arg_max(self) -> Expr:
        """0-based index of the list's maximum (first on ties, nulls
        ignored; null for empty/all-null lists)."""
        pos = F.array_position(self._c, F.array_max(self._c))
        return _wrap(F.when(pos > 0, pos - 1))

    def arg_min(self) -> Expr:
        """0-based index of the list's minimum (first on ties)."""
        pos = F.array_position(self._c, F.array_min(self._c))
        return _wrap(F.when(pos > 0, pos - 1))

    def slice(self, offset: int, length: int) -> Expr:
        start = offset + 1 if offset >= 0 else offset
        return _wrap(F.slice(self._c, start, length))

    def to_struct(self, width: int, fields: "Sequence[str] | None" = None) -> Expr:
        """List -> struct of its first ``width`` elements (polars
        list.to_struct).  polars' lazy engine also demands a declared width
        (n_field_strategy='first_non_null' is eager-only); missing elements
        are null.  Field names default to polars' field_0..field_{n-1}."""
        names = list(fields) if fields is not None else [f"field_{i}" for i in range(width)]
        if len(names) != width:
            raise ValueError("fields must match width")
        return _wrap(
            F.struct(*[F.get(self._c, i).alias(n) for i, n in enumerate(names)])
        )


class ExprStructNamespace:
    """Struct ops (expr.rs:920-992)."""

    def __init__(self, expr: Expr):
        self._expr = expr
        self._c = expr._col

    def field(self, name: str) -> Expr:
        return _wrap(self._c.getField(name))

    field_by_name = field

    def field_by_index(self, index: int, field_names: Sequence[str] | None = None) -> Expr:
        """Positional field access (expr.rs:948-957).  Spark can't index a
        struct positionally without its schema — pass ``field_names`` or use
        ``LazyFrame.struct_field_by_index`` which resolves the schema."""
        if field_names is None:
            raise ValueError(
                "struct.field_by_index needs field_names=[...] (or use "
                "LazyFrame.struct_field_by_index, which reads the schema)"
            )
        return _wrap(self._c.getField(field_names[index]))

    def rename_fields(self, names: Sequence[str], field_names: Sequence[str] | None = None) -> Expr:
        """Rename struct fields positionally (expr.rs:960-982).  Needs the
        current field names — pass ``field_names`` or use
        ``LazyFrame.struct_rename_fields``."""
        if field_names is None:
            raise ValueError(
                "struct.rename_fields needs field_names=[...] (or use "
                "LazyFrame.struct_rename_fields, which reads the schema)"
            )
        return _wrap(
            F.struct(*[self._c.getField(o).alias(n) for o, n in zip(field_names, names)])
        )

    def json_encode(self) -> Expr:
        return _wrap(F.to_json(self._c))

    def with_fields(self, *exprs: "Expr", **named: "Expr") -> Expr:
        """polars struct.with_fields: add or overwrite struct fields
        (Column.withField — in-place schema surgery, no rebuild).  Positional
        exprs must carry an alias; kwargs name the field directly."""
        c = self._c
        for e in exprs:
            inner = _c(e)
            name = _col_out_name_local(inner)
            c = c.withField(name, inner)
        for name, e in named.items():
            c = c.withField(name, _c(e))
        return _wrap(c)

def _col_out_name_local(c: Column) -> str:
    s = str(c)
    # Column<'x AS name'> → name ; Column<'name'> → name
    inner = s[8:-2] if s.startswith("Column<'") and s.endswith("'>") else s
    return inner.split(" AS ")[-1].strip("`")


# ---------------------------------------------------------------------------
# module-level constructors (expr.rs:197-205, 294-299, 727-739, 787-805)


def col(name: str) -> Expr:
    return Expr(F.col(name))


def cols(*names: str) -> list[Expr]:
    flat: list[str] = []
    for n in names:
        if isinstance(n, (list, tuple)):
            flat.extend(n)
        else:
            flat.append(n)
    return [col(n) for n in flat]


def lit(value: Any, dtype: str | T.DataType | None = None) -> Expr:
    c = F.lit(value)
    if dtype is not None:
        c = c.cast(_to_spark_type(dtype))
    return Expr(c)


def lit_datetime(epoch_us: int) -> Expr:
    """Datetime literal from epoch microseconds (expr.rs:727-739)."""
    return Expr(F.timestamp_micros(F.lit(int(epoch_us))))


class _WhenThen:
    def __init__(self, chain: Column):
        self._chain = chain

    def when(self, predicate: Expr) -> "_WhenBranch":
        return _WhenBranch(self._chain, predicate)

    def otherwise(self, value: Any) -> Expr:
        return Expr(self._chain.otherwise(_c(value)))


class _WhenBranch:
    def __init__(self, chain: Column | None, predicate: Expr):
        self._chain = chain
        self._pred = predicate

    def then(self, value: Any) -> _WhenThen:
        if self._chain is None:
            return _WhenThen(F.when(_c(self._pred), _c(value)))
        return _WhenThen(self._chain.when(_c(self._pred), _c(value)))


def when(predicate: Expr) -> _WhenBranch:
    """when(p).then(t).otherwise(f) — reference if_else (expr.rs:1105-1122)."""
    return _WhenBranch(None, predicate)


def corr(a: "Expr | str", b: "Expr | str") -> Expr:
    """Pearson correlation aggregate (polars pl.corr; Spark F.corr is the
    same sample estimator)."""
    return _wrap(F.corr(_c(col(a) if isinstance(a, str) else a), _c(col(b) if isinstance(b, str) else b)))


def cov(a: "Expr | str", b: "Expr | str", ddof: int = 1) -> Expr:
    """Covariance aggregate (polars pl.cov): ddof=1 sample, ddof=0 population."""
    ca = _c(col(a) if isinstance(a, str) else a)
    cb = _c(col(b) if isinstance(b, str) else b)
    return _wrap(F.covar_samp(ca, cb) if ddof == 1 else F.covar_pop(ca, cb))


def concat_str(exprs: Sequence[Expr], separator: str = "") -> Expr:
    return Expr(F.concat_ws(separator, *[_c(e) for e in exprs]))


def arctan2(y: "Expr | str", x: "Expr | str") -> Expr:
    """polars pl.arctan2."""
    cy = _c(col(y) if isinstance(y, str) else y)
    cx = _c(col(x) if isinstance(x, str) else x)
    return _wrap(F.atan2(cy, cx))


def format(fstring: str, *exprs: "Expr | str") -> Expr:  # noqa: A001 — polars name
    """polars pl.format: '{}' placeholders filled from exprs (nulls render
    as null, whole-string; compiles to concat of literals + casts)."""
    parts = fstring.split("{}")
    if len(parts) - 1 != len(exprs):
        raise ValueError(
            f"format string has {len(parts) - 1} placeholders but {len(exprs)} exprs"
        )
    pieces: list[Column] = []
    for i, p in enumerate(parts):
        if p:
            pieces.append(F.lit(p))
        if i < len(exprs):
            e = exprs[i]
            pieces.append(_c(col(e) if isinstance(e, str) else e).cast("string"))
    if not pieces:
        return _wrap(F.lit(""))
    return _wrap(F.concat(*pieces))


def concat_list(*exprs: "Expr | str", lists: bool = False) -> Expr:
    """polars pl.concat_list, row-wise.  Expressions are unbound Columns here
    (no schema at build time), so the scalar-vs-list resolution polars does at
    plan time needs a flag: default combines SCALAR columns into one list
    (F.array); ``lists=True`` concatenates LIST columns (F.concat)."""
    cs = []
    for e in exprs:
        cs.append(_c(col(e) if isinstance(e, str) else e))
    if not cs:
        raise ValueError("concat_list needs at least one expression")
    return _wrap(F.concat(*cs) if lists else F.array(*cs))


def _hcols(exprs) -> list[Column]:
    out = []
    for e in exprs:
        out.append(_c(col(e) if isinstance(e, str) else e))
    if not out:
        raise ValueError("horizontal function needs at least one expression")
    return out


def coalesce(*exprs: "Expr | str") -> Expr:
    """polars pl.coalesce: first non-null across columns, row-wise."""
    return _wrap(F.coalesce(*_hcols(exprs)))


def sum_horizontal(*exprs: "Expr | str", ignore_nulls: bool = True) -> Expr:
    """polars pl.sum_horizontal. ignore_nulls=True (default) treats null as 0
    (an all-null row sums to 0, like summing an empty set); ignore_nulls=False
    propagates null. Pure Column arithmetic — stays in whole-stage codegen."""
    cs = _hcols(exprs)
    if ignore_nulls:
        cs = [F.coalesce(c, F.lit(0)) for c in cs]
    acc = cs[0]
    for c in cs[1:]:
        acc = acc + c
    return _wrap(acc)


def mean_horizontal(*exprs: "Expr | str", ignore_nulls: bool = True) -> Expr:
    """polars pl.mean_horizontal: sum of non-null / count of non-null
    (all-null row -> null). ignore_nulls=False: null if any input is null."""
    cs = _hcols(exprs)
    if not ignore_nulls:
        total = cs[0].cast("double")
        for c in cs[1:]:
            total = total + c
        return _wrap(total / F.lit(len(cs)))
    total = F.lit(0.0)
    cnt = F.lit(0)
    for c in cs:
        total = total + F.coalesce(c.cast("double"), F.lit(0.0))
        cnt = cnt + F.when(c.isNotNull(), F.lit(1)).otherwise(F.lit(0))
    return _wrap(F.when(cnt > 0, total / cnt))


def min_horizontal(*exprs: "Expr | str") -> Expr:
    """polars pl.min_horizontal (nulls ignored; all-null -> null) = F.least."""
    cs = _hcols(exprs)
    return _wrap(cs[0] if len(cs) == 1 else F.least(*cs))


def max_horizontal(*exprs: "Expr | str") -> Expr:
    """polars pl.max_horizontal (nulls ignored; all-null -> null) = F.greatest."""
    cs = _hcols(exprs)
    return _wrap(cs[0] if len(cs) == 1 else F.greatest(*cs))


def any_horizontal(*exprs: "Expr | str", ignore_nulls: bool = True) -> Expr:
    """polars pl.any_horizontal. ignore_nulls=True: null counts as false
    (all-null -> false). ignore_nulls=False: Kleene OR (Spark's boolean OR is
    already Kleene: true|null=true, false|null=null)."""
    cs = _hcols(exprs)
    if ignore_nulls:
        cs = [F.coalesce(c, F.lit(False)) for c in cs]
    acc = cs[0]
    for c in cs[1:]:
        acc = acc | c
    return _wrap(acc)


def all_horizontal(*exprs: "Expr | str", ignore_nulls: bool = True) -> Expr:
    """polars pl.all_horizontal. ignore_nulls=True: null counts as true
    (all-null -> true). ignore_nulls=False: Kleene AND."""
    cs = _hcols(exprs)
    if ignore_nulls:
        cs = [F.coalesce(c, F.lit(True)) for c in cs]
    acc = cs[0]
    for c in cs[1:]:
        acc = acc & c
    return _wrap(acc)


def fold(acc: "Expr | Any", function, exprs: Sequence["Expr | str"]) -> Expr:
    """polars pl.fold: left-fold `function(acc, x)` across columns, row-wise.
    The fold unrolls at plan-build time into nested Column expressions — the
    whole thing stays JVM-side (no UDF), one codegen stage."""
    a = acc if isinstance(acc, Expr) else lit(acc)
    for e in exprs:
        x = col(e) if isinstance(e, str) else e
        a = function(a, x)
        if not isinstance(a, Expr):
            a = _wrap(_c(a))
    return a


def reduce(function, exprs: Sequence["Expr | str"]) -> Expr:
    """polars pl.reduce: fold seeded with the first column."""
    exprs = list(exprs)
    if not exprs:
        raise ValueError("reduce needs at least one expression")
    first = exprs[0]
    return fold(col(first) if isinstance(first, str) else first, function, exprs[1:])


def cum_fold(acc: "Expr | Any", function, exprs: Sequence["Expr | str"]) -> Expr:
    """polars pl.cum_fold: struct of every intermediate accumulator, one field
    per input expression (field names follow the inputs, polars-style)."""
    a = acc if isinstance(acc, Expr) else lit(acc)
    fields = []
    for e in exprs:
        x = col(e) if isinstance(e, str) else e
        a = function(a, x)
        if not isinstance(a, Expr):
            a = _wrap(_c(a))
        name = e if isinstance(e, str) else _col_name_of(x)
        fields.append(_c(a).alias(name))
    if not fields:
        raise ValueError("cum_fold needs at least one expression")
    return _wrap(F.struct(*fields))


def cum_reduce(function, exprs: Sequence["Expr | str"]) -> Expr:
    """polars pl.cum_reduce: cum_fold seeded with the first column."""
    exprs = list(exprs)
    if not exprs:
        raise ValueError("cum_reduce needs at least one expression")
    first = exprs[0] if isinstance(exprs[0], Expr) else col(exprs[0])
    fields = [(_c(first)).alias(exprs[0] if isinstance(exprs[0], str) else _col_name_of(first))]
    a = first
    for e in exprs[1:]:
        x = col(e) if isinstance(e, str) else e
        a = function(a, x)
        if not isinstance(a, Expr):
            a = _wrap(_c(a))
        fields.append(_c(a).alias(e if isinstance(e, str) else _col_name_of(x)))
    return _wrap(F.struct(*fields))


def _col_name_of(e: "Expr") -> str:
    try:
        jc = _c(e)._jc  # noqa: SLF001 — display name only
        return jc.toString().split(" AS ")[-1].strip("`")
    except Exception:
        return "field"


def as_struct(exprs: Sequence[Expr]) -> Expr:
    """expr.rs:920-930."""
    return Expr(F.struct(*[_c(e) for e in exprs]))

