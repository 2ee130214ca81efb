"""Preference-pair construction for RLHF/DPO training data.

Given scored responses grouped by prompt, emit (chosen, rejected) training
pairs.  The reference repo has no RLHF surface; this extends the
training-data-pipeline block (flatten_chat_frame is the SFT sibling) with the
standard preference-optimization prep step.

Scale design: ``strategy='best_worst'`` is ONE groupBy aggregate — chosen and
rejected are struct-max/struct-min aggregates (score, id, response), which
combine map-side, so 100 TB of responses reduces to one partial-aggregated
shuffle keyed by prompt and one output row per prompt.  No window, no sort.
``strategy='all_pairs'`` self-joins within the prompt key (O(k²) pairs per
prompt of k responses — use only when responses-per-prompt is bounded; the
docstring contract mirrors the group-materializing aggregates elsewhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = ["preference_pairs"]


def preference_pairs(
    frame: "LazyFrame | SparkDF",
    group_col: str = "prompt_id",
    response_col: str = "text",
    score_col: str = "score",
    id_col: str = "doc_id",
    min_margin: float = 0.0,
    strategy: str = "best_worst",
    round_to: int = 6,
) -> LazyFrame:
    """(group, chosen_id, rejected_id, chosen, rejected, margin) pairs.

    best_worst: per group the highest-scored response is ``chosen`` and the
    lowest-scored is ``rejected`` (ties broken by id — highest id wins the
    chosen side, lowest id the rejected side, so the result is deterministic
    and engine-portable).  Self-pairs (single-response groups) are always
    dropped; ``min_margin`` additionally requires
    ``score(chosen) - score(rejected) >= min_margin``.

    all_pairs: every ordered pair with a score gap ≥ max(min_margin, >0)
    within the group.
    """
    sdf = frame if isinstance(frame, SparkDF) else frame.spark
    score = F.col(score_col).cast("double")
    if strategy == "best_worst":
        # struct ordering = (score, id, response) lexicographic; id is unique
        # so response never participates — it rides along for extraction.
        packed = sdf.select(
            F.col(group_col),
            F.struct(
                score.alias("s"),
                F.col(id_col).alias("i"),
                F.col(response_col).alias("r"),
            ).alias("__p__"),
        )
        agg = packed.groupBy(group_col).agg(
            F.max("__p__").alias("hi"), F.min("__p__").alias("lo")
        )
        out = (
            agg.select(
                F.col(group_col),
                F.col("hi.i").alias("chosen_id"),
                F.col("lo.i").alias("rejected_id"),
                F.col("hi.r").alias("chosen"),
                F.col("lo.r").alias("rejected"),
                F.round(F.col("hi.s") - F.col("lo.s"), round_to).alias("margin"),
            )
            .filter(F.col("chosen_id") != F.col("rejected_id"))
            .filter(F.col("hi.s") - F.col("lo.s") >= F.lit(min_margin))
        )
        return LazyFrame(out)
    if strategy == "all_pairs":
        gap = max(min_margin, 0.0)
        base = sdf.select(
            F.col(group_col),
            F.col(id_col).alias("i"),
            F.col(response_col).alias("r"),
            score.alias("s"),
        )
        a = base.select(
            group_col,
            F.col("i").alias("chosen_id"),
            F.col("r").alias("chosen"),
            F.col("s").alias("sa"),
        )
        b = base.select(
            group_col,
            F.col("i").alias("rejected_id"),
            F.col("r").alias("rejected"),
            F.col("s").alias("sb"),
        )
        cond = (F.col("sa") > F.col("sb")) & (
            F.col("sa") - F.col("sb") >= F.lit(gap)
        )
        out = (
            a.join(b, on=group_col)
            .filter(cond)
            .select(
                group_col,
                "chosen_id",
                "rejected_id",
                "chosen",
                "rejected",
                F.round(F.col("sa") - F.col("sb"), round_to).alias("margin"),
            )
        )
        return LazyFrame(out)
    raise ValueError(f"unknown strategy {strategy!r}")
