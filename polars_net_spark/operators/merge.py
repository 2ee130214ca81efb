"""Batch MERGE / upsert (SCD-1): the Delta-style ``MERGE INTO`` expressed as
one full-outer join — the primitive every incremental 100 TB pipeline needs
for applying change batches to a snapshot.

Beyond the reference surface (Polars.NET has no merge; its users emulate it
with joins + concat).  Semantics follow SQL MERGE:

- key matched in both:   ``when_matched`` — ``"update"`` (source wins,
  column-wise), ``"delete"`` (row dropped), or ``None`` (target kept).
- key only in target:    row kept unchanged.
- key only in source:    ``when_not_matched`` — ``"insert"`` (row added) or
  ``None`` (ignored).

Scale shape: exactly ONE shuffle — the full-outer join on the merge keys
(AQE turns it into a broadcast join when the change batch is small, the
common case).  All row selection is Column-level CASE logic, no Python.
Deterministic and ANSI-replicable, so the gate query (q74) hash-checks the
whole semantics against a DuckDB FULL JOIN.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import functions as F

__all__ = ["merge_into"]


def merge_into(
    target,
    source,
    on: str | Sequence[str],
    when_matched: str | None = "update",
    when_not_matched: str | None = "insert",
    update_cols: Sequence[str] | None = None,
):
    """Apply ``source`` as a change batch onto ``target`` (see module doc).

    ``update_cols`` restricts which non-key columns an update overwrites
    (default: every shared non-key column).  Both frames must share the key
    columns; non-key columns present on only one side pass through as nulls
    on rows originating from the other.
    """
    from ..frame import LazyFrame

    if when_matched not in ("update", "delete", None):
        raise ValueError("when_matched must be 'update', 'delete', or None")
    if when_not_matched not in ("insert", None):
        raise ValueError("when_not_matched must be 'insert' or None")
    keys = [on] if isinstance(on, str) else list(on)
    t = target._sdf if isinstance(target, LazyFrame) else target
    s = source._sdf if isinstance(source, LazyFrame) else source
    for k in keys:
        if k not in t.columns or k not in s.columns:
            raise ValueError(f"merge key {k!r} missing from target or source")

    t_cols = [c for c in t.columns if c not in keys]
    s_cols = [c for c in s.columns if c not in keys]
    shared = [c for c in t_cols if c in s_cols]
    upd = set(shared if update_cols is None else update_cols)
    if not upd.issubset(shared):
        raise ValueError(f"update_cols must be shared non-key columns, got {sorted(upd - set(shared))}")

    tt = t.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_t__"),
        *[F.col(c).alias(f"__t_{c}__") for c in t_cols],
    )
    ss = s.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_s__"),
        *[F.col(c).alias(f"__s_{c}__") for c in s_cols],
    )
    j = tt.join(ss, keys, "full")
    in_t = F.col("__in_t__").isNotNull()
    in_s = F.col("__in_s__").isNotNull()

    keep = in_t & ~in_s  # target-only rows always survive
    if when_matched != "delete":
        keep = keep | (in_t & in_s)
    if when_not_matched == "insert":
        keep = keep | (~in_t & in_s)

    out_cols = [F.col(k) for k in keys]
    all_value_cols = t_cols + [c for c in s_cols if c not in t_cols]
    for c in all_value_cols:
        tc = F.col(f"__t_{c}__") if c in t_cols else F.lit(None)
        sc = F.col(f"__s_{c}__") if c in s_cols else F.lit(None)
        if c in upd and when_matched == "update":
            expr = F.when(in_t & in_s, sc).when(in_t, tc).otherwise(sc)
        else:
            expr = F.when(in_t, tc).otherwise(sc)
        out_cols.append(expr.alias(c))
    return LazyFrame(j.filter(keep).select(*out_cols))
