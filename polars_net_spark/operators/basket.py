"""Market-basket mining: pairwise association rules (support / confidence /
lift) with the exact Apriori item prune.

Scale design: ONE data-sized shuffle (groupBy basket → sorted item array);
pair generation is map-side lambda math over that array (no positional
self-join), so the cost driver is Σ_b |items_b|² — ``max_items_per_basket``
is the cap for pathological baskets.  The frequent-item prefilter is EXACT
(downward closure: support(a,b) ≤ min(support(a), support(b)), so a pair
with an infrequent member can never reach ``min_support``) and collapses
the fan-out before it happens.  Item-count and basket-count attachments are
bounded broadcasts (item cardinality, 1 row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = ["association_rules"]


def _sdf(frame):
    return frame if isinstance(frame, SparkDF) else frame.spark


def association_rules(
    frame: "LazyFrame | SparkDF",
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_confidence: float = 0.0,
    max_items_per_basket: "int | None" = None,
    round_to: int = 6,
) -> LazyFrame:
    """Directed pairwise association rules over (basket, item) rows — the
    classic market-basket / co-occurrence miner (Agrawal & Srikant 1994,
    pair depth).  For every ordered pair of frequent items (a → b) whose
    joint support meets ``min_support``:

    - ``n_pair``     — baskets containing both,
    - ``support``    — n_pair / n_baskets,
    - ``confidence`` — P(b | a) = n_pair / n_a,
    - ``lift``       — confidence / P(b)  (symmetric; >1 = positive
      association).

    Presence is set-valued (duplicate (basket, item) rows collapse first);
    null baskets/items drop.  ``min_support`` prunes ITEMS exactly before
    any pair exists (downward closure), then prunes pairs; ``min_confidence``
    filters the emitted rules.  ``max_items_per_basket`` truncates each
    sorted basket to its first k items — a deterministic cap for degenerate
    mega-baskets; counts for truncated items undercount (recall trade,
    default off).

    Output: (antecedent, consequent, n_pair, support, confidence, lift),
    both directions of every surviving pair."""
    if not (0.0 < min_support <= 1.0):
        raise ValueError("min_support must be in (0, 1]")
    sdf = _sdf(frame)
    b, i = F.col(basket_col), F.col(item_col)
    pres = (
        sdf.filter(b.isNotNull() & i.isNotNull())
        .select(b.alias("__b__"), i.alias("__i__"))
        .distinct()
    )
    n_baskets = pres.agg(F.countDistinct("__b__").alias("__nb__"))
    item_counts = pres.groupBy("__i__").agg(F.count(F.lit(1)).alias("__ni__"))
    frequent = (
        item_counts.join(F.broadcast(n_baskets))
        .filter(F.col("__ni__") / F.col("__nb__") >= F.lit(min_support))
        .select("__i__", "__ni__")
    )
    # Apriori prune BEFORE the array build: infrequent items can't be in any
    # surviving pair, so dropping them here is exact and shrinks |items_b|².
    pruned = pres.join(F.broadcast(frequent.select("__i__")), "__i__")
    baskets = pruned.groupBy("__b__").agg(
        F.array_sort(F.collect_list("__i__")).alias("__items__")
    )
    if max_items_per_basket is not None:
        baskets = baskets.withColumn(
            "__items__", F.slice("__items__", 1, int(max_items_per_basket))
        )
    # Map-side i<j pair fan-out over the sorted array — no self-join shuffle.
    pairs_arr = F.expr(
        "flatten(transform(__items__, (x, i) -> "
        "transform(slice(__items__, i + 2, size(__items__) - i - 1), "
        "y -> struct(x AS a, y AS b))))"
    )
    pair_counts = (
        baskets.select(F.explode(pairs_arr).alias("__p__"))
        .groupBy(F.col("__p__.a").alias("__a__"), F.col("__p__.b").alias("__b2__"))
        .agg(F.count(F.lit(1)).alias("__np__"))
        .join(F.broadcast(n_baskets))
        .filter(F.col("__np__") / F.col("__nb__") >= F.lit(min_support))
    )
    # Emit both directions; item counts attach as a bounded broadcast.
    directed = pair_counts.select(
        F.explode(
            F.array(
                F.struct(F.col("__a__").alias("x"), F.col("__b2__").alias("y")),
                F.struct(F.col("__b2__").alias("x"), F.col("__a__").alias("y")),
            )
        ).alias("__d__"),
        "__np__",
        "__nb__",
    ).select(
        F.col("__d__.x").alias("__ante__"),
        F.col("__d__.y").alias("__cons__"),
        "__np__",
        "__nb__",
    )
    ca = frequent.select(F.col("__i__").alias("__ante__"), F.col("__ni__").alias("__na__"))
    cb = frequent.select(F.col("__i__").alias("__cons__"), F.col("__ni__").alias("__nc__"))
    out = (
        directed.join(F.broadcast(ca), "__ante__")
        .join(F.broadcast(cb), "__cons__")
        .withColumn("__conf__", F.col("__np__") / F.col("__na__"))
        .filter(F.col("__conf__") >= F.lit(min_confidence))
        .select(
            F.col("__ante__").alias("antecedent"),
            F.col("__cons__").alias("consequent"),
            F.col("__np__").cast("long").alias("n_pair"),
            F.round(F.col("__np__") / F.col("__nb__"), round_to).alias("support"),
            F.round(F.col("__conf__"), round_to).alias("confidence"),
            F.round(
                F.col("__conf__") * F.col("__nb__") / F.col("__nc__"), round_to
            ).alias("lift"),
        )
    )
    return LazyFrame(out)
