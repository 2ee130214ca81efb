"""polars.testing analogue: frame/series equality assertions for user test
suites migrating from the reference (Polars.CSharp.Tests compare frames with
row-order-sensitive equality; polars exposes assert_frame_equal).

Driver-side by design — these collect both frames; they are TEST utilities,
not pipeline operators.  For big-data equality checks use
``left.join(right, how="anti")`` style set comparisons instead.
"""

from __future__ import annotations

__all__ = ["assert_frame_equal", "assert_series_equal"]


def _to_pandas(frame):
    sdf = getattr(frame, "_sdf", None) or getattr(frame, "spark", None) or frame
    if hasattr(frame, "_drop_order"):
        sdf = frame._drop_order()._sdf
    return sdf.toPandas()


def assert_frame_equal(
    left,
    right,
    check_row_order: bool = True,
    check_column_order: bool = True,
    check_dtypes: bool = True,
    rtol: float = 1e-5,
    atol: float = 1e-8,
) -> None:
    """Assert two frames (Lazy/eager/Spark) hold equal data.

    check_row_order=False sorts both by all columns first (a distributed
    engine gives no row order unless you sorted — most comparisons here
    want False).  Float columns compare within rtol/atol."""
    import pandas as pd

    a, b = _to_pandas(left), _to_pandas(right)
    if check_column_order:
        if list(a.columns) != list(b.columns):
            raise AssertionError(f"column order differs: {list(a.columns)} vs {list(b.columns)}")
    else:
        if sorted(a.columns) != sorted(b.columns):
            raise AssertionError(f"column sets differ: {sorted(a.columns)} vs {sorted(b.columns)}")
        b = b[list(a.columns)]
    if len(a) != len(b):
        raise AssertionError(f"height differs: {len(a)} vs {len(b)}")
    if not check_row_order and len(a):
        key = list(a.columns)
        a = a.sort_values(key, key=lambda s: s.astype(str)).reset_index(drop=True)
        b = b.sort_values(key, key=lambda s: s.astype(str)).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a, b, check_dtype=check_dtypes, check_exact=False, rtol=rtol, atol=atol
    )


def assert_series_equal(left, right, rtol: float = 1e-5, atol: float = 1e-8) -> None:
    """Assert two Series hold equal values (order-sensitive)."""
    la = left.to_list() if hasattr(left, "to_list") else list(left)
    lb = right.to_list() if hasattr(right, "to_list") else list(right)
    if len(la) != len(lb):
        raise AssertionError(f"length differs: {len(la)} vs {len(lb)}")
    for i, (x, y) in enumerate(zip(la, lb)):
        if x is None or y is None:
            if x is not y:
                raise AssertionError(f"index {i}: {x!r} != {y!r}")
            continue
        if isinstance(x, float) and isinstance(y, float):
            if x != y and abs(x - y) > max(rtol * max(abs(x), abs(y)), atol):
                raise AssertionError(f"index {i}: {x!r} !~ {y!r}")
        elif x != y:
            raise AssertionError(f"index {i}: {x!r} != {y!r}")
