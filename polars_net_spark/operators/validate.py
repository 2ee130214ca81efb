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
