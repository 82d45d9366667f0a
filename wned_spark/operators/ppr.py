"""Batched personalized PageRank — semantic signatures (G3/G5/G6).

The reference computes one PPR per candidate entity, farmed out to 32
threads over a shared in-heap WebGraph
(``WeightedPersonalizedPageRank.java:42-110,233-266``). The Spark-native
re-expression batches ALL seeds into one long-form DataFrame
``ranks(seed, node, rank)`` and iterates a single
join-aggregate (sparse matrix-matrix instead of 32x matrix-vector):

    ranks' = alpha * (ranks ⋈ P).groupBy(seed, dst).sum
             + [node == seed] * ((1 - alpha) + alpha * dangling(seed))

with ``localCheckpoint()`` per iteration to truncate lineage (the north
rule's "checkpointed sparse matrix-vector joins"). Dangling mass is
returned to the preference vector — ``stronglyPreferential=true``
(``PersonalizedPageRank.java:30``).

Parameters pinned to the reference: alpha=0.85, stop at L1 delta < 1e-5
or 3 iterations (``PersonalizedPageRank.java:27-30``).

Scale notes: P is row-normalized ONCE and persisted; each iteration is
one shuffle on (seed, dst); signatures stay sparse (3 iterations from a
single seed reach a bounded neighborhood), so signature size is
O(seeds x avg 3-hop neighborhood), never O(seeds x |V|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wned_spark.config import ERConfig


def normalize_transition(edges: DataFrame) -> DataFrame:
    """Row-normalize edge weights: P(src→dst) = w / sum_w(src).
    (WeightedPersonalizedPageRank.java:161-184 weight handling; F8
    zero-weight arcs dropped.)"""
    sums = edges.groupBy("src").agg(F.sum("weight").alias("wsum"))
    return (
        edges.filter(F.col("weight") > 0)
        .join(sums, "src")
        .select("src", "dst", (F.col("weight") / F.col("wsum")).alias("p"))
    )


def personalized_pagerank(
    seeds: DataFrame,
    edges: DataFrame,
    cfg: ERConfig = ERConfig(),
    check_delta: bool = True,
) -> DataFrame:
    """seeds: (seed) node ids — each seed gets its own indicator
    preference vector (G5); edges: (src, dst, weight).

    Returns signatures ``(seed, node, rank)``.
    """
    alpha = cfg.ppr_alpha
    trans = normalize_transition(edges).persist()
    out_nodes = trans.select("src").distinct()

    # lazy checkpoints: lineage still truncates at materialization, but
    # no extra job barrier per iteration (3 fixed iterations keep the
    # un-truncated plan bounded anyway)
    ranks = seeds.select(
        F.col("seed"), F.col("seed").alias("node"), F.lit(1.0).alias("rank")
    ).localCheckpoint(eager=False)

    for _ in range(cfg.ppr_max_iter):
        prev = ranks
        spread = (
            ranks.join(trans, ranks["node"] == trans["src"])
            .groupBy("seed", "dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
            .select("seed", F.col("dst").alias("node"), (alpha * F.col("mass")).alias("rank"))
        )
        # dangling mass per seed: rank sitting on nodes with no out-edges
        dangling = (
            ranks.join(out_nodes, ranks["node"] == out_nodes["src"], "left_anti")
            .groupBy("seed")
            .agg(F.sum("rank").alias("dmass"))
        )
        teleport = (
            seeds.join(dangling, "seed", "left")
            .na.fill({"dmass": 0.0})
            .select(
                "seed",
                F.col("seed").alias("node"),
                ((1.0 - alpha) + alpha * F.col("dmass")).alias("rank"),
            )
        )
        ranks = (
            spread.union(teleport)
            .groupBy("seed", "node")
            .agg(F.sum("rank").alias("rank"))
            .localCheckpoint(eager=False)  # truncate lineage, no job barrier
        )
        if check_delta:
            delta = (
                ranks.alias("n")
                .join(prev.alias("p"), ["seed", "node"], "full")
                .select(
                    F.abs(
                        F.coalesce(F.col("n.rank"), F.lit(0.0))
                        - F.coalesce(F.col("p.rank"), F.lit(0.0))
                    ).alias("d")
                )
                .agg(F.max("d"))
                .first()[0]
            )
            if delta is not None and delta < cfg.ppr_tol:
                break
    # trans stays persisted: with lazy checkpoints nothing has
    # materialized yet — unpersisting here would force 3 recomputes of
    # the row-normalization when the caller finally acts on the ranks
    return ranks


def signature_cosine(pairs: DataFrame, signatures: DataFrame) -> DataFrame:
    """Pairwise cosine between two seeds' signatures (R6 long-form).

    pairs: (seed_a, seed_b); signatures: (seed, node, rank).
    dot = sum over shared nodes of rank_a*rank_b; norms precomputed per
    seed (one small agg) — the join-agg pattern replaces the
    reference's in-heap Map dot product (VectorSimilarity.java:22-43).
    """
    from wned_spark.functions.similarity import cosine_expr

    norms = signatures.groupBy("seed").agg(
        F.sqrt(F.sum(F.col("rank") * F.col("rank"))).alias("norm")
    )
    sa = signatures.select(
        F.col("seed").alias("seed_a"), "node", F.col("rank").alias("rank_a")
    )
    sb = signatures.select(
        F.col("seed").alias("seed_b"), "node", F.col("rank").alias("rank_b")
    )
    dots = (
        pairs.join(sa, "seed_a")
        .join(sb, ["seed_b", "node"])
        .groupBy("seed_a", "seed_b")
        .agg(F.sum(F.col("rank_a") * F.col("rank_b")).alias("dot"))
    )
    na = norms.select(F.col("seed").alias("seed_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("seed").alias("seed_b"), F.col("norm").alias("norm_b"))
    return (
        pairs.join(dots, ["seed_a", "seed_b"], "left")
        .na.fill({"dot": 0.0})
        .join(na, "seed_a")
        .join(nb, "seed_b")
        .select(
            "seed_a",
            "seed_b",
            cosine_expr(F.col("dot"), F.col("norm_a"), F.col("norm_b")).alias("sig_cosine"),
        )
    )
