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
from ..session import scoped_checkpoint_dir

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

        def _ckpt(df, eager=True):
            return df.checkpoint(eager=eager)
    else:

        def _ckpt(df, eager=True):
            return df.localCheckpoint(eager=eager)

    # with-block: restore the previous checkpoint dir on ALL exit paths,
    # including a mid-iteration exception (r7 ADVICE)
    with scoped_checkpoint_dir(esdf.sparkSession.sparkContext, checkpoint_dir):
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


def triangle_count(
    edges: "LazyFrame | SparkDF",
    src: str = "src",
    dst: str = "dst",
    per_node: bool = False,
) -> LazyFrame:
    """Exact triangle counting on an undirected graph via degree-ordered
    orientation (the Suri–Vassilvitskii / GraphX design): orient each edge
    from the (degree, id)-smaller endpoint to the larger, enumerate wedges
    by self-joining oriented edges on their source, and confirm each wedge's
    closing edge with one equi-join.  Orientation makes every triangle
    countable exactly once AND bounds the wedge fan-out: Σ outdeg² = O(m^1.5)
    on any graph, so no hub node ever explodes the join (the naive
    direction-free wedge count is Σ deg², quadratic in hub degree).

    Input edges are treated as undirected: self-loops drop, duplicates and
    reversed duplicates collapse.  Output: one row ``(n_triangles)``; with
    ``per_node=True``, ``(node, n_triangles)`` for every vertex (triangle
    membership credited to all three corners — the clustering-coefficient
    numerator), isolated-in-triangle-terms vertices included with 0.

    Shuffle shape: two node-keyed joins to attach degrees, one src-keyed
    wedge self-join, one (lo, hi)-keyed closing join — all equi-joins,
    all map-side combinable aggregates."""
    esdf = edges if isinstance(edges, SparkDF) else edges.spark
    canon = (
        esdf.filter(F.col(src).isNotNull() & F.col(dst).isNotNull() & (F.col(src) != F.col(dst)))
        .select(
            F.least(src, dst).alias("a"),
            F.greatest(src, dst).alias("b"),
        )
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("v"))
        .union(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # (deg, id) total order; orient low → high.  Carrying both endpoint keys
    # lets the wedge stage order its two spokes without re-joining degrees.
    keyed = (
        canon.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a", "b",
            F.struct(F.col("da").alias("d"), F.col("a").alias("i")).alias("ka"),
            F.struct(F.col("db").alias("d"), F.col("b").alias("i")).alias("kb"),
        )
    )
    oriented = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("w"),
        F.when(F.col("ka") < F.col("kb"), F.col("kb")).otherwise(F.col("ka")).alias("kw"),
    )
    e1 = oriented.select(F.col("u"), F.col("w").alias("w1"), F.col("kw").alias("k1"))
    e2 = oriented.select(F.col("u"), F.col("w").alias("w2"), F.col("kw").alias("k2"))
    wedges = e1.join(e2, "u").filter(F.col("k1") < F.col("k2")).select(
        "u", F.col("w1").alias("lo"), F.col("w2").alias("hi")
    )
    closing = oriented.select(F.col("u").alias("lo"), F.col("w").alias("hi"))
    tris = wedges.join(closing, ["lo", "hi"])
    if not per_node:
        out = tris.agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
        return LazyFrame(out)
    credited = (
        tris.select(F.explode(F.array("u", "lo", "hi")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("nt"))
    )
    out = (
        deg.select("v")
        .join(credited, "v", "left")
        .select(
            F.col("v").alias("node"),
            F.coalesce("nt", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )
    return LazyFrame(out)


__all__.append("triangle_count")


def label_propagation(
    edges: "LazyFrame | SparkDF",
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    checkpoint_every: int = 4,
    checkpoint_dir: str | None = None,
) -> LazyFrame:
    """Synchronous label propagation (Raghavan et al. 2007, the GraphX LPA
    variant) for community detection: every vertex starts as its own label;
    each round it adopts the most frequent label among its neighbors, ties
    to the SMALLEST label — fully deterministic, so a fixed ``iterations``
    is closed-form and the oracle replays it as unrolled CTE rounds (the
    pagerank/BPE convention; synchronous LPA on bipartite structures can
    oscillate, which a fixed round count makes an explicit, reproducible
    choice).

    Edges are undirected (loops drop, duplicates/reversals collapse);
    the vertex set is the edge endpoints.  Per round: one adjacency⋈labels
    equi-join + one (vertex, label) count aggregate + one per-vertex argmax
    via min(struct(-count, label)) — all map-side combining, lineage
    checkpoint-truncated like pagerank (same ``checkpoint_dir`` semantics).
    Output: (id, label)."""
    esdf = edges if isinstance(edges, SparkDF) else edges.spark
    if checkpoint_dir is not None:

        def _ckpt(df):
            return df.checkpoint(eager=True)
    else:

        def _ckpt(df):
            return df.localCheckpoint(eager=True)

    # with-block: restore the previous checkpoint dir on ALL exit paths
    with scoped_checkpoint_dir(esdf.sparkSession.sparkContext, checkpoint_dir):
        canon = (
            esdf.filter(
                F.col(src).isNotNull() & F.col(dst).isNotNull() & (F.col(src) != F.col(dst))
            )
            .select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
            .distinct()
        )
        adj = canon.select(F.col("a").alias("v"), F.col("b").alias("n")).union(
            canon.select(F.col("b").alias("v"), F.col("a").alias("n"))
        )
        labels = adj.select("v").distinct().select("v", F.col("v").alias("lab"))
        for i in range(int(iterations)):
            counts = (
                adj.join(labels.withColumnRenamed("v", "n"), "n")
                .groupBy("v", "lab")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            labels = counts.groupBy("v").agg(
                F.min(F.struct((-F.col("c")).alias("nc"), F.col("lab").alias("l")))
                .getField("l")
                .alias("lab")
            )
            if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
                labels = _ckpt(labels)
        out = labels.select(F.col("v").alias("id"), F.col("lab").alias("label"))
    return LazyFrame(out)


__all__.append("label_propagation")


def degree_report(
    edges: "LazyFrame | SparkDF",
    src: str = "src",
    dst: str = "dst",
    round_to: int = 6,
) -> LazyFrame:
    """Degree summary + degree assortativity of an undirected graph
    (Newman 2002): assortativity is the Pearson correlation of the two
    endpoint degrees over every edge counted in BOTH directions (the
    standard convention) — positive means hubs attach to hubs (social
    graphs), negative means hub-and-spoke (the web, infrastructure).
    The one-row structural health check to sit beside triangle_count.

    Edges canonicalize as in triangle_count (loops drop, duplicates and
    reversals collapse).  Shuffle shape: one degree aggregate + two
    node-keyed joins to attach endpoint degrees + one fused 1-row corr
    reduce — all map-side combining.  Output (1 row): n_nodes, n_edges,
    mean_degree, max_degree, assortativity (null on degree-regular
    graphs, where the correlation is undefined)."""
    esdf = edges if isinstance(edges, SparkDF) else edges.spark
    canon = (
        esdf.filter(
            F.col(src).isNotNull() & F.col(dst).isNotNull() & (F.col(src) != F.col(dst))
        )
        .select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
        .distinct()
    )
    deg = (
        canon.select(F.col("a").alias("v"))
        .union(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    both = canon.select(F.col("a").alias("u"), F.col("b").alias("w")).union(
        canon.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    joined = (
        both.join(deg.select(F.col("v").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("v").alias("w"), F.col("deg").alias("dw")), "w")
    )
    stats = joined.agg(
        F.corr(F.col("du").cast("double"), F.col("dw").cast("double")).alias("r"),
    )
    dstats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("deg") / 2).alias("n_edges"),
        F.avg("deg").alias("mean_degree"),
        F.max("deg").alias("max_degree"),
    )
    out = dstats.join(F.broadcast(stats)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.round("mean_degree", round_to).alias("mean_degree"),
        F.col("max_degree").cast("long").alias("max_degree"),
        F.round("r", round_to).alias("assortativity"),
    )
    return LazyFrame(out)


__all__.append("degree_report")


def k_core(
    edges: "LazyFrame | SparkDF",
    k: int,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 30,
    checkpoint_every: int = 4,
    checkpoint_dir: str | None = None,
) -> LazyFrame:
    """k-core decomposition membership: iteratively peel every vertex with
    degree < k until none remain; what survives is the maximal subgraph
    where everyone keeps >= k neighbors — the standard "dense backbone"
    filter (spam-farm detection, influence seeding, collaboration cores)
    beside triangle_count's local view.

    Peeling is MONOTONE (a removed vertex never comes back), so the
    fixpoint is unique and an oracle that unrolls at least as many rounds
    as convergence took replays it exactly (the pagerank/LPA convention,
    extended: extra unrolled rounds are no-ops after the fixpoint).
    Edges are undirected (loops drop, duplicates/reversals collapse).

    Scale shape: per round ONE degree aggregate (map-side combining) and
    TWO left_anti equi-joins against the (small, shrinking) peel set; a
    driver count() per round is the loop condition — bounded by the round
    count, which is at most the graph's degeneracy ordering depth (tiny
    for real graphs: web/social cores converge in < 20 rounds).  Lineage
    checkpoint-truncated like pagerank; same ``checkpoint_dir`` contract.
    Raises RuntimeError if ``max_rounds`` is hit before the fixpoint so a
    truncated answer can never masquerade as the core.  Output:
    (id, degree) of surviving vertices — degree WITHIN the k-core."""
    if k < 1:
        raise ValueError("k must be >= 1")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    esdf = edges if isinstance(edges, SparkDF) else edges.spark
    if checkpoint_dir is not None:

        def _ckpt(df):
            return df.checkpoint(eager=True)
    else:

        def _ckpt(df):
            return df.localCheckpoint(eager=True)

    with scoped_checkpoint_dir(esdf.sparkSession.sparkContext, checkpoint_dir):
        e = (
            esdf.filter(
                F.col(src).isNotNull() & F.col(dst).isNotNull()
                & (F.col(src) != F.col(dst))
            )
            .select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
            .distinct()
        )
        e.persist()
        converged = False
        for r in range(int(max_rounds)):
            deg = (
                e.select(F.col("a").alias("v"))
                .unionAll(e.select(F.col("b").alias("v")))
                .groupBy("v")
                .agg(F.count(F.lit(1)).alias("c"))
            )
            # persist the peel set: isEmpty() materializes it here, and the
            # two anti-joins below then reuse the cached rows instead of
            # re-running the degree shuffle inside their own lineage
            bad = deg.filter(F.col("c") < F.lit(int(k))).select("v").persist()
            if bad.isEmpty():
                bad.unpersist()
                converged = True
                break
            nxt = e.join(
                bad.withColumnRenamed("v", "a"), "a", "left_anti"
            ).join(bad.withColumnRenamed("v", "b"), "b", "left_anti")
            if (r + 1) % checkpoint_every == 0:
                nxt = _ckpt(nxt)
            nxt.persist()
            nxt.count()  # materialize past `bad` before releasing caches
            bad.unpersist()
            e.unpersist()
            e = nxt
        if not converged:
            e.unpersist()
            raise RuntimeError(
                f"k_core did not converge within max_rounds={max_rounds}"
            )
        out = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
            .select(F.col("v").alias("id"), "degree")
        )
        # materialize before releasing the loop frame's cache: the lazy
        # result would otherwise recompute the whole peel from source
        out = _ckpt(out)
        e.unpersist()
    return LazyFrame(out)


__all__.append("k_core")


def connected_components(
    edges: "LazyFrame | SparkDF",
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    checkpoint_every: int = 4,
    checkpoint_dir: str | None = None,
) -> LazyFrame:
    """Connected components by MIN-LABEL propagation: every vertex starts
    as its own component id and repeatedly takes the minimum label among
    itself and its neighbors until nothing changes — the entity-
    resolution / "how many disjoint clusters does this graph have"
    primitive beside label_propagation's modular communities (which uses
    the MODE and can split a connected graph; this one never does).

    The iteration is MONOTONE (labels only decrease toward the component
    minimum), so the fixpoint is unique and an oracle unrolling at least
    as many rounds as convergence took replays it exactly, extra rounds
    being no-ops (the k_core convention).  Convergence takes at most the
    graph diameter in rounds — fine for the short-diameter graphs entity
    resolution produces; for chain-like graphs prefer dedup_clusters'
    union-find path.

    Scale shape: per round ONE union + min-aggregate over the (vertex-
    keyed) label frame joined to the edge list on each endpoint — plain
    equi-joins, map-side-combining min — plus an anti-join emptiness
    probe as the stop condition; lineage checkpoint-truncated every
    ``checkpoint_every`` rounds.  Edges are undirected (loops drop,
    duplicates collapse).  Raises RuntimeError if ``max_rounds`` is hit
    before the fixpoint.  Output: (id, component) with component = min
    vertex id of the component."""
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    esdf = edges if isinstance(edges, SparkDF) else edges.spark
    if checkpoint_dir is not None:

        def _ckpt(df):
            return df.checkpoint(eager=True)
    else:

        def _ckpt(df):
            return df.localCheckpoint(eager=True)

    with scoped_checkpoint_dir(esdf.sparkSession.sparkContext, checkpoint_dir):
        e = (
            esdf.filter(
                F.col(src).isNotNull() & F.col(dst).isNotNull()
                & (F.col(src) != F.col(dst))
            )
            .select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
            .distinct()
        )
        e.persist()
        labels = (
            e.select(F.col("a").alias("v"))
            .unionAll(e.select(F.col("b").alias("v")))
            .distinct()
            .select("v", F.col("v").alias("c"))
        )
        labels.persist()
        cached = labels  # the actually-persisted frame behind `labels`
        converged = False
        for r in range(int(max_rounds)):
            # own-label rows ride the union FLAGGED, so the round's previous
            # label falls out of the same min-aggregate — the r12 shape
            # re-joined nxt to labels on v every round just to ask "did
            # anything change" (one data-sized join + sort per round, gone)
            nxt = (
                labels.select("v", "c", F.lit(True).alias("__own__"))
                .unionAll(
                    labels.join(e, labels["v"] == e["a"], "inner")
                    .select(F.col("b").alias("v"), "c", F.lit(False).alias("__own__"))
                )
                .unionAll(
                    labels.join(e, labels["v"] == e["b"], "inner")
                    .select(F.col("a").alias("v"), "c", F.lit(False).alias("__own__"))
                )
                .groupBy("v")
                .agg(
                    F.min("c").alias("c"),
                    F.min(F.when(F.col("__own__"), F.col("c"))).alias("__prev__"),
                )
            )
            if (r + 1) % checkpoint_every == 0:
                nxt = _ckpt(nxt)
            nxt.persist()
            done = nxt.filter(F.col("c") != F.col("__prev__")).isEmpty()
            cached.unpersist()
            cached = nxt
            labels = nxt.select("v", "c")
            if done:
                converged = True
                break
        if not converged:
            cached.unpersist()
            e.unpersist()
            raise RuntimeError(
                f"connected_components did not converge within "
                f"max_rounds={max_rounds}"
            )
        out = labels.select(F.col("v").alias("id"), F.col("c").alias("component"))
        out = _ckpt(out)
        cached.unpersist()
        e.unpersist()
    return LazyFrame(out)


__all__.append("connected_components")


def bfs_distances(
    edges: "LazyFrame | SparkDF",
    sources: "list",
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 20,
    checkpoint_every: int = 4,
    checkpoint_dir: str | None = None,
) -> LazyFrame:
    """Multi-source BFS hop distances: dist(v) = fewest undirected hops
    from any vertex in ``sources`` — the "blast radius" primitive behind
    influence reach, contamination spread, and k-hop neighborhood
    queries, beside connected_components' reachability-only view.

    MONOTONE (a distance only ever decreases), so the fixpoint is unique
    and an unrolled oracle replays it exactly, extra rounds being no-ops
    (the k_core/connected_components convention).  Converges within the
    sources' eccentricity; raises RuntimeError at ``max_rounds`` so a
    truncated frontier can't masquerade as the answer.  Unreached
    vertices are ABSENT from the output (no infinity sentinel).

    Every listed source appears at distance 0 even when isolated (no
    incident edges) — a missing seed row would read as a silently
    dropped input.  Scale shape: per round one union + min aggregate
    over the reached set joined to the edge list on each endpoint
    (plain equi-joins, map-side-combining min) + an emptiness probe as
    the stop condition; lineage checkpoint-truncated.  Output: (id,
    distance)."""
    if not sources:
        raise ValueError("sources must be non-empty")
    if checkpoint_every < 1:
        raise ValueError("checkpoint_every must be >= 1")
    esdf = edges if isinstance(edges, SparkDF) else edges.spark
    if checkpoint_dir is not None:

        def _ckpt(df):
            return df.checkpoint(eager=True)
    else:

        def _ckpt(df):
            return df.localCheckpoint(eager=True)

    with scoped_checkpoint_dir(esdf.sparkSession.sparkContext, checkpoint_dir):
        e = (
            esdf.filter(
                F.col(src).isNotNull() & F.col(dst).isNotNull()
                & (F.col(src) != F.col(dst))
            )
            .select(F.least(src, dst).alias("a"), F.greatest(src, dst).alias("b"))
            .distinct()
        )
        e.persist()
        spark = esdf.sparkSession
        svals = [(s,) for s in sources]
        dist = (
            spark.createDataFrame(svals, ["v"])
            .distinct()
            .select("v", F.lit(0).cast("long").alias("d"))
        )
        dist.persist()
        cached = dist  # the actually-persisted frame behind `dist`
        converged = False
        for r in range(int(max_rounds)):
            # own-distance rows ride the union FLAGGED so the previous
            # distance falls out of the same min-aggregate — the old shape
            # re-joined nxt to dist every round just for the "did anything
            # change" probe (the connected_components r13 fuse; a newly
            # reached vertex has no own row, so __prev__ NULL ⇔ the left
            # join's p.d-is-null case)
            nxt = (
                dist.select("v", "d", F.lit(True).alias("__own__"))
                .unionAll(
                    dist.join(e, dist["v"] == e["a"], "inner")
                    .select(F.col("b").alias("v"), (F.col("d") + 1).alias("d"),
                            F.lit(False).alias("__own__"))
                )
                .unionAll(
                    dist.join(e, dist["v"] == e["b"], "inner")
                    .select(F.col("a").alias("v"), (F.col("d") + 1).alias("d"),
                            F.lit(False).alias("__own__"))
                )
                .groupBy("v")
                .agg(
                    F.min("d").alias("d"),
                    F.min(F.when(F.col("__own__"), F.col("d"))).alias("__prev__"),
                )
            )
            if (r + 1) % checkpoint_every == 0:
                nxt = _ckpt(nxt)
            nxt.persist()
            done = nxt.filter(
                F.col("__prev__").isNull() | (F.col("d") != F.col("__prev__"))
            ).isEmpty()
            cached.unpersist()
            cached = nxt
            dist = nxt.select("v", "d")
            if done:
                converged = True
                break
        if not converged:
            cached.unpersist()
            e.unpersist()
            raise RuntimeError(
                f"bfs_distances did not converge within max_rounds={max_rounds}"
            )
        out = dist.select(F.col("v").alias("id"), F.col("d").alias("distance"))
        out = _ckpt(out)
        cached.unpersist()
        e.unpersist()
    return LazyFrame(out)


__all__.append("bfs_distances")
