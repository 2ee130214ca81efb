"""Test helpers for library users (and our own suite)."""

from __future__ import annotations

from typing import Sequence

from .frame import DataFrame, LazyFrame

__all__ = ["assert_frame_equal"]


def assert_frame_equal(
    left: "DataFrame | LazyFrame",
    right: "DataFrame | LazyFrame",
    check_row_order: bool = False,
    check_column_order: bool = True,
    rtol: float = 0.0,
) -> None:
    """Assert two frames hold the same data.

    Row order is ignored by default (Spark results are unordered unless
    sorted); column order is checked by default.  ``rtol`` > 0 allows
    relative float tolerance.
    """
    import pandas as pd

    l_sdf = (left.lazy() if isinstance(left, DataFrame) else left)._drop_order()._sdf
    r_sdf = (right.lazy() if isinstance(right, DataFrame) else right)._drop_order()._sdf

    lcols, rcols = list(l_sdf.columns), list(r_sdf.columns)
    if check_column_order:
        assert lcols == rcols, f"column mismatch: {lcols} vs {rcols}"
    else:
        assert sorted(lcols) == sorted(rcols), f"column set mismatch: {lcols} vs {rcols}"
        r_sdf = r_sdf.select(*lcols)

    lp, rp = l_sdf.toPandas(), r_sdf.toPandas()
    assert len(lp) == len(rp), f"row count mismatch: {len(lp)} vs {len(rp)}"
    if not check_row_order:
        lp = lp.sort_values(by=lcols, key=lambda s: s.astype(str)).reset_index(drop=True)
        rp = rp.sort_values(by=lcols, key=lambda s: s.astype(str)).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        lp, rp, check_dtype=False, check_exact=(rtol == 0.0), rtol=rtol or 1e-5
    )
