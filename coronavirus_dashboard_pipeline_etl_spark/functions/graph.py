"""Iterative graph algorithms over DataFrame edge lists.

Companion to ``dedup.dedup_components`` (min-label propagation): this
module adds PageRank in an exactly-reproducible fixed-point form, the
iterative-algorithm showcase beyond connected components.

Why fixed-point: float PageRank sums per-node contributions, and double
addition is order-dependent — two engines (or two partitionings of the
same engine) disagree in the low bits, so no exact oracle is possible.
Storing rank as a BIGINT in units of 1e-12 ("micro-micro mass") makes
every step integer arithmetic: contributions use integer division
(deterministic truncation), per-node sums are exact and
order-independent, and the damping mix is an integer expression. The
result is bit-identical across engines, partition layouts, and AQE
decisions — the same trick as the decimal-exact Lloyd update in
``similarity.kmeans_lloyd(exact=True)``.

Scale design (100 TB): the edge list is hash-partitioned by source ONCE
and cached — InMemoryTableScan preserves that partitioning, so each
iteration shuffles only (a) the |nodes|-sized rank table onto src and
(b) the per-edge contributions onto dst (with map-side partial sums, so
the wire carries at most one row per (task, dst)). The edge list itself
is never re-shuffled or re-scanned from source after the first
materialisation. ``localCheckpoint`` truncates the rank lineage per
round, bounding the plan the way ``dedup_components`` does.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

UNIT = 10**12  # one unit of rank mass, as a BIGINT fixed-point scale


def pagerank_fixed_point(
    edges: DataFrame,
    n_iter: int = 3,
    damping_num: int = 85,
    damping_den: int = 100,
    src_col: str = "src",
    dst_col: str = "dst",
    teleport: Sequence[int] | None = None,
) -> DataFrame:
    """PageRank over a directed edge list, exact fixed-point arithmetic.

    Every node must have at least one out-edge (no dangling mass —
    callers with dangling nodes add reverse edges or self-loops first;
    the bipartite helper below guarantees this by construction). Each
    node starts with ``UNIT`` mass; per iteration::

        contrib(u->v) = rank(u) div outdeg(u)          -- integer div
        rank'(v) = (15 * UNIT) div 100
                 + (85 * sum(contrib(u->v))) div 100   -- integer div

    Integer division truncates a deterministic sub-1e-12 remainder per
    edge, so total mass decays by a bounded, reproducible epsilon —
    the documented price of an exact cross-engine result.

    ``teleport`` switches to PERSONALIZED PageRank: the restart mass
    concentrates on the given seed nodes instead of spreading uniformly
    — each seed's per-round base term is ``(n_nodes * base) div
    len(teleport)`` (total restart mass preserved, integer-exact), all
    other nodes get restart 0 and hold only flowed-in mass. The
    standard proximity/recommendation primitive ("rank relative to
    this user/doc"); seeds ride an ``isin`` literal, so the loop shape
    and shuffle costs are identical to the uniform case.

    Returns (node, rank_int, rank) where ``rank = rank_int / 1e12`` —
    one double division of identical operands, hence identical doubles.
    """
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    if teleport is not None and len(teleport) == 0:
        raise ValueError("teleport seed set must be non-empty")
    # Edges are hash-partitioned by src ONCE and cached: InMemoryTableScan
    # preserves outputPartitioning (localCheckpoint's LogicalRDD does
    # not), so every iteration's rank join reuses the layout — the
    # per-round shuffles are the node-sized rank table (onto src) and
    # the contribution scatter (onto dst), never the edge list itself.
    e = (
        edges.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .distinct()
        .repartition("src")
        .persist()
    )
    # deg rides the cached src partitioning (groupBy src needs no
    # exchange) and is itself cached: it anchors every round's node set.
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")).persist()
    # the rank table carries outdeg so the hot loop joins ONE small
    # frame to the edges instead of two
    ranks = deg.select("src", "outdeg", F.lit(UNIT).cast("long").alias("rank_int"))
    base = (damping_den - damping_num) * UNIT // damping_den
    if teleport is None:
        base_expr = F.lit(base).cast("long")
    else:
        # same total restart mass as the uniform case, concentrated on
        # the seeds (one cheap count of the cached node table)
        seed_base = deg.count() * base // len(teleport)
        base_expr = (
            F.when(
                F.col("src").isin([int(t) for t in teleport]),
                F.lit(seed_base),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )
    for _ in range(n_iter):
        contrib = e.join(ranks, "src").select(
            "dst",
            F.expr("rank_int div outdeg").alias("contrib"),
        )
        incoming = contrib.groupBy("dst").agg(
            F.sum("contrib").alias("incoming")
        )
        # deg is partitioned by src, incoming by dst (its agg key):
        # both sides arrive partitioned on their join key — no exchange
        ranks = (
            deg.join(incoming, F.col("src") == F.col("dst"), "left")
            .select(
                "src",
                "outdeg",
                (
                    base_expr
                    + F.expr(
                        f"({damping_num} * coalesce(incoming, 0L)) div {damping_den}"
                    )
                ).alias("rank_int"),
            )
            .localCheckpoint(eager=False)
        )
    # materialise the final ranks, then release the cached edge/degree
    # frames — the operator returns a self-contained frame and leaves no
    # cache residue in a long-lived session
    out = ranks.select(
        F.col("src").alias("node"),
        "rank_int",
        (F.col("rank_int").cast("double") / F.lit(float(UNIT))).alias("rank"),
    ).localCheckpoint(eager=True)
    e.unpersist()
    deg.unpersist()
    return out


def bipartite_edges(
    pairs: DataFrame,
    left_col: str,
    right_col: str,
    right_offset: int = 1_000_000,
) -> DataFrame:
    """Symmetrise a bipartite relation into a directed edge list with
    disjoint node-id spaces (right ids shifted by ``right_offset``).
    Both directions are emitted, so every node that appears has an
    out-edge — the no-dangling precondition of ``pagerank_fixed_point``
    holds by construction.
    """
    lr = pairs.select(
        F.col(left_col).cast("long").alias("src"),
        (F.col(right_col).cast("long") + right_offset).alias("dst"),
    )
    return lr.unionByName(lr.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
