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

__all__ = ["merge_into", "scd2_apply"]


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


def scd2_apply(
    history,
    updates,
    key_cols: "str | Sequence[str]",
    compare_cols: "str | Sequence[str]",
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
):
    """Slowly-Changing-Dimension **type 2** apply: fold a change batch into a
    versioned history table.  For every update key whose ``compare_cols``
    differ from the key's OPEN row, the open row closes (``valid_to`` = the
    update's ``ts_col``, flag false) and a new open version inserts;
    unchanged keys keep their open row; unseen keys insert fresh.  Closed
    history rows pass through untouched.

    The update batch is first reduced to ONE row per key (latest ``ts_col``,
    struct-max tie-break) so intra-batch dup keys can't fork the history.
    Plan shape: one map-side-combining reduce on the batch + ONE full-outer
    join against the open slice, emitting 1-2 rows per key via a conditional
    array explode — no second join, no window.  Closed rows union back by
    scan.  AQE broadcasts small change batches.

    ``history`` columns: key_cols + compare_cols + valid_from + valid_to +
    current_flag.  Open rows have null ``valid_to``.  Output schema equals
    the history schema.
    """
    from ..frame import LazyFrame

    hsdf = history._sdf if isinstance(history, LazyFrame) else history
    usdf = updates._sdf if isinstance(updates, LazyFrame) else updates
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    attrs = [compare_cols] if isinstance(compare_cols, str) else list(compare_cols)

    # latest update per key (deterministic: ts then attrs break ties)
    packed = usdf.select(
        *keys,
        F.struct(F.col(ts_col).alias("__ts__"), *[F.col(a) for a in attrs]).alias("__u__"),
    )
    latest = packed.groupBy(*keys).agg(F.max("__u__").alias("__u__"))

    open_rows = hsdf.filter(F.col(current_flag))
    closed_rows = hsdf.filter(~F.col(current_flag))
    j = open_rows.alias("o").join(latest.alias("u"), keys, "full")

    has_open = F.col(f"o.{valid_from}").isNotNull()
    has_upd = F.col("u.__u__").isNotNull()
    same = F.forall(
        F.array(*[
            F.col(f"o.{a}").eqNullSafe(F.col("u.__u__").getField(a)) for a in attrs
        ]),
        lambda x: x,
    )
    uts = F.col("u.__u__").getField("__ts__")

    def _row(from_, to_, flag, attr_src):
        return F.struct(
            from_.alias(valid_from),
            to_.alias(valid_to),
            flag.alias(current_flag),
            *[attr_src(a).alias(a) for a in attrs],
        )

    open_attr = lambda a: F.col(f"o.{a}")
    upd_attr = lambda a: F.col("u.__u__").getField(a)
    keep_open = _row(F.col(f"o.{valid_from}"), F.col(f"o.{valid_to}"), F.lit(True), open_attr)
    close_open = _row(F.col(f"o.{valid_from}"), uts, F.lit(False), open_attr)
    new_open = _row(uts, F.lit(None).cast(open_rows.schema[valid_to].dataType), F.lit(True), upd_attr)

    emit = (
        F.when(has_open & ~has_upd, F.array(keep_open))
        .when(~has_open & has_upd, F.array(new_open))
        .when(same, F.array(keep_open))
        .otherwise(F.array(close_open, new_open))
    )
    exploded = j.select(*[F.col(k) for k in keys], F.explode(emit).alias("__r__"))
    out_cols = keys + [c for c in hsdf.columns if c not in keys]
    versioned = exploded.select(
        *[F.col(k) for k in keys],
        *[F.col("__r__").getField(c).alias(c) for c in out_cols if c not in keys],
    ).select(*out_cols)
    return LazyFrame(versioned.unionByName(closed_rows.select(*out_cols)))


def build_rollup(
    frame,
    keys: "Sequence[str] | str",
    value_cols: "Sequence[str]",
) -> "LazyFrame":
    """Partial-aggregate STATE table for incremental rollup maintenance:
    per key, ``n`` plus for each value column its ``{c}_sum``, ``{c}_min``,
    ``{c}_max``, ``{c}_n`` (non-null count) — every statistic here is
    ASSOCIATIVE, so states merge without touching raw history.  This is
    the 100 TB daily-rollup pattern: aggregate each day's partition once,
    then :func:`merge_rollup` folds new days into the persisted state —
    the full recompute (rescanning all history for every refresh) never
    happens.  Derive means downstream as sum/n.

    One map-side-combining aggregate.  Output: (keys..., n, per-column
    sum/min/max/n)."""
    from ..frame import LazyFrame

    sdf = frame if not hasattr(frame, "_sdf") else frame._sdf
    key_list = [keys] if isinstance(keys, str) else list(keys)
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for c in value_cols:
        v = F.col(c).cast("double")
        aggs += [
            F.sum(v).alias(f"{c}_sum"),
            F.min(v).alias(f"{c}_min"),
            F.max(v).alias(f"{c}_max"),
            F.count(v).cast("long").alias(f"{c}_n"),
        ]
    return LazyFrame(sdf.groupBy(*key_list).agg(*aggs))


def merge_rollup(
    state,
    batch,
    keys: "Sequence[str] | str",
    value_cols: "Sequence[str]",
    batch_is_state: bool = False,
) -> "LazyFrame":
    """Fold a new raw batch (or another state table, ``batch_is_state=
    True``) into a :func:`build_rollup` state: union the two partial-state
    tables and re-combine per key (sum the sums and counts, min the mins,
    max the maxes).  The result is IDENTICAL to rebuilding the rollup over
    all raw data — the associativity contract — but costs one aggregate
    over |state| + |batch| rows instead of a full history rescan.

    Shuffle shape: the batch's own aggregate + one key-sharded combine of
    two state tables; at 100 TB persist the state with write_bucketed on
    the keys and the combine plans with no exchange on the state side."""
    from ..frame import LazyFrame

    s_sdf = state if not hasattr(state, "_sdf") else state._sdf
    key_list = [keys] if isinstance(keys, str) else list(keys)
    b = batch if batch_is_state else build_rollup(batch, key_list, value_cols)
    b_sdf = b if not hasattr(b, "_sdf") else b._sdf
    unioned = s_sdf.unionByName(b_sdf)
    aggs = [F.sum("n").cast("long").alias("n")]
    for c in value_cols:
        aggs += [
            F.sum(f"{c}_sum").alias(f"{c}_sum"),
            F.min(f"{c}_min").alias(f"{c}_min"),
            F.max(f"{c}_max").alias(f"{c}_max"),
            F.sum(f"{c}_n").cast("long").alias(f"{c}_n"),
        ]
    return LazyFrame(unioned.groupBy(*key_list).agg(*aggs))


__all__.extend(["build_rollup", "merge_rollup"])
