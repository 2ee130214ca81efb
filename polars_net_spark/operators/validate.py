"""Declarative data-quality validation: run a rule list against a frame and
get one audit row per rule — the expectation-suite primitive (Great-
Expectations-shaped) that gates a pipeline stage before bad data propagates.

Scale design (100 TB): every non-uniqueness rule compiles to one conditional
count inside a SINGLE fused all-reduce (map-side combining, 1-row result);
uniqueness rules add exact count-distinct aggregates to the same fused agg
(one distinct column plans as a partial-distinct HashAggregate chain, 2+ as
Expand — either way one pass over the data, no per-rule scans).  The
rule→row explode happens on the 1-row result, so driver/exchange cost is
rule-list-sized, never data-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = ["validate_frame"]


def _violation_expr(rule: dict):
    """Boolean Column: TRUE when the row violates the rule (never null).

    Range/set/regex checks skip nulls (null handling is `not_null`'s job —
    composing the two is the caller's choice, mirroring SQL constraints)."""
    c = F.col(rule["col"])
    check = rule["check"]
    if check == "not_null":
        return c.isNull()
    if check == "min":
        return c.isNotNull() & (c < F.lit(rule["value"]))
    if check == "max":
        return c.isNotNull() & (c > F.lit(rule["value"]))
    if check == "between":
        return c.isNotNull() & ((c < F.lit(rule["lo"])) | (c > F.lit(rule["hi"])))
    if check == "in_set":
        return c.isNotNull() & ~c.isin(list(rule["values"]))
    if check == "regex":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    raise ValueError(f"unknown check: {check!r}")


def _label(rule: dict) -> str:
    check = rule["check"]
    if check == "min":
        return f"min {rule['value']}"
    if check == "max":
        return f"max {rule['value']}"
    if check == "between":
        return f"between {rule['lo']} {rule['hi']}"
    return check


def validate_frame(
    frame: "LazyFrame | SparkDF",
    rules: "list[dict]",
    round_to: int = 6,
) -> LazyFrame:
    """Audit ``frame`` against ``rules``; one output row per rule.

    Each rule is a dict: ``{"col": name, "check": kind, ...}`` where kind is
    one of ``not_null``, ``unique``, ``min``/``max`` (+``value``),
    ``between`` (+``lo``/``hi``), ``in_set`` (+``values``), ``regex``
    (+``pattern``); an optional ``max_violation_rate`` (default 0.0) sets
    the pass threshold.  Range/set/regex checks skip nulls (pair with
    ``not_null`` for both).  ``unique`` counts non-null duplicates beyond
    the first occurrence: violations = count(col) − count(DISTINCT col).

    Output: (rule, column, n_rows, n_violations, violation_rate, passed),
    rate relative to total rows, rounded to ``round_to``."""
    if not rules:
        raise ValueError("rules must be non-empty")
    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    aggs = [F.count(F.lit(1)).alias("__n__")]
    for i, rule in enumerate(rules):
        if rule["check"] == "unique":
            c = F.col(rule["col"])
            aggs.append(
                (F.count(c) - F.count_distinct(c)).alias(f"__v{i}__")
            )
        else:
            aggs.append(
                F.sum(_violation_expr(rule).cast("long")).alias(f"__v{i}__")
            )
    one = sdf.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(_label(r)).alias("rule"),
                F.lit(r["col"]).alias("column"),
                F.col(f"__v{i}__").cast("long").alias("nv"),
                F.lit(float(r.get("max_violation_rate", 0.0))).alias("thr"),
            )
            for i, r in enumerate(rules)
        ]
    )
    rate = F.when(F.col("__n__") > 0, F.col("e.nv") / F.col("__n__")).otherwise(F.lit(0.0))
    out = (
        one.select(F.col("__n__"), F.explode(entries).alias("e"))
        .select(
            F.col("e.rule").alias("rule"),
            F.col("e.column").alias("column"),
            F.col("__n__").cast("long").alias("n_rows"),
            F.col("e.nv").alias("n_violations"),
            F.round(rate, round_to).alias("violation_rate"),
            (rate <= F.col("e.thr")).alias("passed"),
        )
    )
    return LazyFrame(out)


def frame_diff(
    left: "LazyFrame | SparkDF",
    right: "LazyFrame | SparkDF",
    key_cols: "list[str] | str",
    compare_cols: "list[str] | None" = None,
) -> "LazyFrame":
    """Dataset regression diff — the audit for "what changed between two
    versions of this table": keyed FULL OUTER join, then ONE fused
    all-reduce counting rows added (key only in ``right``), removed (only
    in ``left``), changed (key in both, any compared column differs,
    null-safe), unchanged — plus one per-column changed count.

    Keys are assumed unique per side (pre-aggregate otherwise — a dup key
    would fan the join out).  Output: (metric, n) rows — 'added',
    'removed', 'changed', 'unchanged', 'col:<name>' per compared column.
    Shuffle shape: one key-sharded join + map-side-combining counts; at
    100 TB bucket both sides by the key (write_bucketed) and the join
    plans with no exchange."""
    lsdf = left if isinstance(left, SparkDF) else left.spark
    rsdf = right if isinstance(right, SparkDF) else right.spark
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in lsdf.columns if c not in keys and c in rsdf.columns]
    a = lsdf.select(
        *[F.col(k).alias(f"__k{i}__") for i, k in enumerate(keys)],
        F.lit(1).alias("__inl__"),
        *[F.col(c).alias(f"__l_{c}__") for c in compare_cols],
    )
    b = rsdf.select(
        *[F.col(k).alias(f"__k{i}__") for i, k in enumerate(keys)],
        F.lit(1).alias("__inr__"),
        *[F.col(c).alias(f"__r_{c}__") for c in compare_cols],
    )
    j = a.join(b, [f"__k{i}__" for i in range(len(keys))], "full_outer")
    in_l, in_r = F.col("__inl__").isNotNull(), F.col("__inr__").isNotNull()
    col_diff = {
        c: ~F.col(f"__l_{c}__").eqNullSafe(F.col(f"__r_{c}__")) for c in compare_cols
    }
    any_diff = F.lit(False)
    for c in compare_cols:
        any_diff = any_diff | col_diff[c]
    both = in_l & in_r
    aggs = [
        F.sum((~in_l & in_r).cast("long")).alias("added"),
        F.sum((in_l & ~in_r).cast("long")).alias("removed"),
        F.sum((both & any_diff).cast("long")).alias("changed"),
        F.sum((both & ~any_diff).cast("long")).alias("unchanged"),
    ] + [
        F.sum((both & col_diff[c]).cast("long")).alias(f"col:{c}") for c in compare_cols
    ]
    wide = j.agg(*aggs)
    metrics = ["added", "removed", "changed", "unchanged"] + [
        f"col:{c}" for c in compare_cols
    ]
    out = wide.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(m).alias("metric"),
                    F.coalesce(F.col(f"`{m}`"), F.lit(0)).cast("long").alias("n"),
                )
                for m in metrics
            ])
        ).alias("kv")
    ).select("kv.metric", "kv.n")
    return LazyFrame(out)


__all__.append("frame_diff")


def fk_integrity_report(
    child: "LazyFrame | SparkDF",
    parent: "LazyFrame | SparkDF",
    child_key: "str | list[str]",
    parent_key: "str | list[str] | None" = None,
) -> "LazyFrame":
    """Referential-integrity audit between a fact and its dimension: child
    rows whose key has no parent (orphans), null-key child rows, and
    parent keys never referenced — the join-health check to run before
    trusting any inner-join metric (silently dropped orphans are the
    classic under-count).

    One anti-join each way on distinct keys + two count aggregates, all
    map-side combining.  Output (1 row): n_child, n_child_null_key,
    n_orphans (distinct orphan KEY count), orphan_row_count (child ROWS
    with those keys), n_parent_keys, n_parent_unused."""
    csdf = child if isinstance(child, SparkDF) else child.spark
    psdf = parent if isinstance(parent, SparkDF) else parent.spark
    ck = [child_key] if isinstance(child_key, str) else list(child_key)
    pk = ck if parent_key is None else (
        [parent_key] if isinstance(parent_key, str) else list(parent_key)
    )
    null_pred = F.lit(False)
    for k in ck:
        null_pred = null_pred | F.col(k).isNull()
    c_nonnull = csdf.filter(~null_pred)
    ckeys = c_nonnull.groupBy(*[F.col(k).alias(f"__k{i}__") for i, k in enumerate(ck)]).agg(
        F.count(F.lit(1)).alias("__rows__")
    )
    pkeys = psdf.select(
        *[F.col(k).alias(f"__k{i}__") for i, k in enumerate(pk)]
    ).distinct()
    join_keys = [f"__k{i}__" for i in range(len(ck))]
    orphans = ckeys.join(pkeys, join_keys, "left_anti")
    unused = pkeys.join(ckeys, join_keys, "left_anti")
    totals = csdf.agg(
        F.count(F.lit(1)).alias("n_child"),
        F.sum(null_pred.cast("long")).alias("n_child_null_key"),
    )
    o = orphans.agg(
        F.count(F.lit(1)).alias("n_orphans"),
        F.coalesce(F.sum("__rows__"), F.lit(0)).alias("orphan_row_count"),
    )
    p = pkeys.agg(F.count(F.lit(1)).alias("n_parent_keys"))
    u = unused.agg(F.count(F.lit(1)).alias("n_parent_unused"))
    out = (
        totals.join(F.broadcast(o))
        .join(F.broadcast(p))
        .join(F.broadcast(u))
        .select(
            F.col("n_child").cast("long").alias("n_child"),
            F.col("n_child_null_key").cast("long").alias("n_child_null_key"),
            F.col("n_orphans").cast("long").alias("n_orphans"),
            F.col("orphan_row_count").cast("long").alias("orphan_row_count"),
            F.col("n_parent_keys").cast("long").alias("n_parent_keys"),
            F.col("n_parent_unused").cast("long").alias("n_parent_unused"),
        )
    )
    return LazyFrame(out)


__all__.append("fk_integrity_report")


def snapshot_rows_diff(
    left: "LazyFrame | SparkDF",
    right: "LazyFrame | SparkDF",
    key_cols: "list[str] | str",
    compare_cols: "list[str] | None" = None,
    include_unchanged: bool = False,
) -> "LazyFrame":
    """Row-level companion to :func:`frame_diff` (which returns counts):
    the actual added / removed / changed rows between two versions of a
    table, each with the LIST of columns that differ — what a CDC debug
    session or a data-contract incident actually needs to look at.

    Output: (keys..., status ∈ {added, removed, changed[, unchanged]},
    changed_cols array<string> — null-safe comparison, empty for
    added/removed).  Unchanged rows are EXCLUDED by default: at 100 TB
    the unchanged mass is the bulk and materializing it defeats the
    point; ``include_unchanged=True`` for small audits.  Keys are assumed
    unique per side (pre-aggregate otherwise).  One key-sharded FULL
    OUTER join; bucket both sides by the key at scale and it plans with
    no exchange."""
    lsdf = left if isinstance(left, SparkDF) else left.spark
    rsdf = right if isinstance(right, SparkDF) else right.spark
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in lsdf.columns if c not in keys and c in rsdf.columns]
    a = lsdf.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("__inl__"),
        *[F.col(c).alias(f"__l_{c}__") for c in compare_cols],
    )
    b = rsdf.select(
        *[F.col(k) for k in keys],
        F.lit(1).alias("__inr__"),
        *[F.col(c).alias(f"__r_{c}__") for c in compare_cols],
    )
    j = a.join(b, keys, "full_outer")
    in_l, in_r = F.col("__inl__").isNotNull(), F.col("__inr__").isNotNull()
    diffs = F.array_compact(
        F.array(*[
            F.when(
                ~F.col(f"__l_{c}__").eqNullSafe(F.col(f"__r_{c}__")), F.lit(c)
            )
            for c in compare_cols
        ])
    ) if compare_cols else F.array().cast("array<string>")
    status = (
        F.when(~in_l & in_r, F.lit("added"))
        .when(in_l & ~in_r, F.lit("removed"))
        .when(F.size(diffs) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *keys,
        status.alias("status"),
        F.when(in_l & in_r, diffs)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_cols"),
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return LazyFrame(out)


__all__.append("snapshot_rows_diff")
