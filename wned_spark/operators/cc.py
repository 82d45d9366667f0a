"""Connected components — alternating large-star / small-star (G8).

The clustering stage the reference lacks (it assigns each mention
independently, ``SemanticSignatureEL.java:786-848``); the north rule
replaces the per-mention argmax with transitive closure over match
edges. Algorithm: Kiveris et al., "Connected Components in MapReduce
and Beyond" (SOCC'14) — alternate:

  large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
  small-star(u): S = {v ∈ N(u) : v < u}; m = min(S ∪ {u});
                 emit (v, m) for v ∈ S ∪ {u}, v ≠ m

until the edge set reaches a fixpoint (checked by a cheap
count+hash-sum checksum, not a full set-compare). Each round is two
groupBy shuffles; converges in O(log n) rounds; ``localCheckpoint``
per round truncates lineage. Min-id convention keeps results
deterministic across parallelism levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    und = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = und.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        und.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # orient every edge larger→smaller, group by the larger end
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = oriented.join(mins, "u")
    relink = nbrs.filter(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_link = mins.select(F.col("u"), F.col("m").alias("v"))
    return relink.union(self_link).filter(F.col("u") != F.col("v")).distinct()


def _checksum(edges: DataFrame) -> tuple:
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).first()
    return (row["n"], row["h"])


def connected_components(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """edges(u, v) undirected → components(node, component) where
    component = min node id of the component. Nodes absent from any
    edge are the caller's responsibility (left-join + coalesce self).
    """
    cur = edges.select("u", "v").filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    if cur.isEmpty():
        return cur.sparkSession.createDataFrame([], "node long, component long")
    prev_sum = None
    for _ in range(max_iter):
        # lazy checkpoint after large-star: the round's single job
        # barrier is the checksum, which materializes both stars
        cur = _large_star(cur).localCheckpoint(eager=False)
        cur = _small_star(cur).localCheckpoint(eager=False)
        s = _checksum(cur)
        if s == prev_sum:
            break
        prev_sum = s
    # converged star edges: u → root v
    leaves = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = (
        cur.select(F.col("v").alias("node"))
        .distinct()
        .join(cur.select(F.col("u").alias("node")).distinct(), "node", "left_anti")
        .select("node", F.col("node").alias("component"))
    )
    return leaves.union(roots).distinct()
