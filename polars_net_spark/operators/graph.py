"""Minimal distributed graph ops beyond connected components (which lives in
llm/dedup.py as dedup_clusters): fixed-iteration PageRank.

PageRank here is the bounded-round variant: ``iterations`` is explicit, each
round is one (src-keyed) join + one (dst-keyed) aggregate — the standard
power-iteration plan shape.  A fixed round count keeps the computation
deterministic and closed-form (the oracle replicates it as chained CTEs);
for convergence-driven runs loop externally and diff successive ranks.
Lineage is checkpoint-truncated per round like dedup_clusters (plans double
per round otherwise); pass ``checkpoint_dir=`` for reliable checkpoints that
survive executor loss on a real cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F

from ..frame import LazyFrame

__all__ = ["pagerank"]


def pagerank(
    edges: "LazyFrame | SparkDF",
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 3,
    vertices: "LazyFrame | SparkDF | None" = None,
    vertex_id: str = "id",
    round_to: int = 6,
    checkpoint_every: int = 4,
    checkpoint_dir: str | None = None,
) -> LazyFrame:
    """(id, rank) after ``iterations`` power-iteration rounds from the
    uniform start 1/N; rank_new(v) = (1−d)/N + d·Σ_{u→v} rank(u)/deg(u).

    Simple-variant semantics (documented): dangling vertices (no out-edges)
    leak their mass — ranks sum to < 1, as in the textbook edge-only
    formulation; renormalize downstream if a distribution is needed.
    Duplicate (src, dst) edges count once.  ``vertices`` widens the vertex
    set beyond edge endpoints (isolated vertices hold (1−d)/N).

    Scale: per round one join keyed on src + one aggregate keyed on dst —
    both map-side combining; degree and N are computed once.  Rounds are
    short by construction; a checkpoint every ``checkpoint_every`` rounds
    truncates the doubling plan lineage.  ``checkpoint_dir`` upgrades those
    checkpoints from localCheckpoint (blocks die with their executor —
    fine on local[n], fatal for a long run on a real cluster) to RELIABLE
    checkpoints written to that path (HDFS/S3), same option and semantics
    as dedup_clusters.
    """
    esdf = edges if isinstance(edges, SparkDF) else edges.spark
    if checkpoint_dir is not None:
        esdf.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

        def _ckpt(df, eager=True):
            return df.checkpoint(eager=eager)
    else:

        def _ckpt(df, eager=True):
            return df.localCheckpoint(eager=eager)

    e = esdf.select(F.col(src).alias("s"), F.col(dst).alias("d")).distinct()
    verts = e.select(F.col("s").alias("v")).union(e.select(F.col("d").alias("v"))).distinct()
    if vertices is not None:
        vsdf = vertices if isinstance(vertices, SparkDF) else vertices.spark
        verts = verts.union(vsdf.select(F.col(vertex_id).alias("v"))).distinct()
    verts = _ckpt(verts, eager=False)
    n = verts.count()
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    ranks = verts.select("v", (F.lit(1.0) / n).alias("r"))
    base = (1.0 - damping) / n
    for i in range(int(iterations)):
        contribs = (
            e.join(ranks.withColumnRenamed("v", "s"), "s")
            .join(deg, "s")
            .select(F.col("d").alias("v"), (F.col("r") / F.col("deg")).alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            verts.join(contribs, "v", "left")
            .select(
                "v",
                (F.lit(base) + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))).alias("r"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = _ckpt(ranks)
    out = ranks.select(F.col("v").alias(vertex_id), F.round("r", round_to).alias("rank"))
    return LazyFrame(out)
