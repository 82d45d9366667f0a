"""End-to-end entity-resolution pipeline (§3 lifecycle, Spark-first).

Stage graph (each stage a committed snapshot, resumable):

  transcripts ─→ mentions ─→ coref ─→ block keys ─→ candidate pairs
       │                        │                        │
       │                        └→ co-occur edges ─→ PPR signatures
       │                                                 │
       └→ alias_dict ─→ candidates (priors)              │
                                │                        │
                     pair features (string ⊕ sig ⊕ prior)┘
                                │
                     score → threshold → match edges
                                │
                     connected components → clusters

Replaces the reference's per-document in-heap loop
(``SemanticSignatureEL.java:576-723``) with set-at-a-time dataflow; the
iterative confident-decision feedback becomes transitive closure (G7→G8
recast, per the north rule).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wned_spark.config import ERConfig
from wned_spark.operators import blocking, candidates as cand_ops, cc, graph, mentions as mention_ops, ppr, scoring
from wned_spark.operators.evaluate import label_pairs, pairwise_prf
from wned_spark.plans.catalog import Catalog


@dataclass
class PipelineResult:
    mentions: DataFrame
    pairs: DataFrame
    scored: DataFrame
    clusters: DataFrame
    metrics: dict


def run_er_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    alias_raw: DataFrame | None = None,
    cfg: ERConfig = ERConfig(),
    catalog: Catalog | None = None,
    use_signatures: bool = True,
    gold_mentions: DataFrame | None = None,
) -> PipelineResult:
    """Run the full ER pipeline. With a ``catalog``, every stage is a
    committed resumable snapshot; without, everything stays lazy/cached.
    """

    def stage(name: str, fn, **kw) -> DataFrame:
        if catalog is not None:
            return catalog.run_stage(name, fn, **kw)
        # no catalog: persist so multi-consumer stages don't recompute
        return fn().persist()

    # ---- mention extraction + doc-local coref (N1/J6) ----
    mentions = stage("mentions", lambda: mention_ops.extract_mentions(transcripts))
    mentions = stage("mentions_coref", lambda: mention_ops.resolve_coref(mentions))

    # ---- blocking → candidate pairs (J2) ----
    pairs = stage("candidate_pairs", lambda: blocking.candidate_pairs(mentions, cfg))

    # ---- string features on DISTINCT surface pairs (R2-R4/R15) ----
    def _feat():
        sp = pairs.select("left_norm", "right_norm").distinct()
        return scoring.score_surface_pairs(sp, cfg)

    surface_feats = stage("surface_features", _feat)

    feats = pairs.join(surface_feats, ["left_norm", "right_norm"], "left")

    # ---- PPR semantic signatures (G1/G3/G5, J7/J8) ----
    if use_signatures:
        def _edges():
            return graph.build_cooccurrence_edges(mentions, cfg)

        edges = stage("cooccur_edges", _edges)

        def _sigs():
            seeds = (
                pairs.select(graph.node_id(F.col("left_norm")).alias("seed"))
                .union(pairs.select(graph.node_id(F.col("right_norm")).alias("seed")))
                .distinct()
            )
            return ppr.personalized_pagerank(seeds, edges, cfg, check_delta=cfg.ppr_check_delta)

        sigs = stage("ppr_signatures", _sigs)

        node_pairs = (
            pairs.select(
                graph.node_id(F.col("left_norm")).alias("seed_a"),
                graph.node_id(F.col("right_norm")).alias("seed_b"),
            ).distinct()
        )
        sig_sim = ppr.signature_cosine(node_pairs, sigs)
        feats = (
            feats.withColumn("seed_a", graph.node_id(F.col("left_norm")))
            .withColumn("seed_b", graph.node_id(F.col("right_norm")))
            .join(sig_sim, ["seed_a", "seed_b"], "left")
            .na.fill({"sig_cosine": 0.0})
            .drop("seed_a", "seed_b")
        )
        # identical surfaces never form a pair with themselves at the
        # node level but may at mention level — perfect signature match
        feats = feats.withColumn(
            "sig_cosine",
            F.when(F.col("left_norm") == F.col("right_norm"), F.lit(1.0)).otherwise(
                F.col("sig_cosine")
            ),
        )

    # ---- prior feature via alias dictionary (J1/A2) ----
    if alias_raw is not None:
        alias_dict = stage("alias_dict", lambda: cand_ops.build_alias_dict(alias_raw))
        cands = stage("candidates", lambda: cand_ops.select_candidates(mentions, alias_dict, cfg))
        sp = scoring.shared_prior_feature(pairs, cands)
        feats = feats.join(sp, ["left_id", "right_id"], "left").na.fill({"shared_prior": 0.0})

    # ---- combine + threshold (R1) ----
    def _scored():
        return scoring.combine_scores(feats, cfg)

    scored = stage("scored_pairs", _scored)

    # ---- match edges → connected components (G8) ----
    def _clusters():
        gate = F.col("score") >= cfg.match_threshold
        if "name_soft" in scored.columns:
            gate = gate & (F.col("name_soft") >= cfg.soft_gate)
        edges_m = scored.filter(gate).select(
            F.col("left_id").alias("u"), F.col("right_id").alias("v")
        )
        comp = cc.connected_components(edges_m, cfg.cc_max_iter)
        all_mentions = mentions.select(F.col("mention_id").alias("node"))
        return (
            all_mentions.join(comp, "node", "left")
            .select(
                F.col("node").alias("mention_id"),
                F.coalesce(F.col("component"), F.col("node")).alias("cluster_id"),
            )
        )

    clusters = stage("clusters", _clusters)

    metrics: dict = {}
    if gold_mentions is not None:
        gold_keyed = gold_mentions.select(
            F.xxhash64("conv_id", "turn_idx", "start").alias("mention_id"), "entity_id"
        )
        labeled = label_pairs(scored.select("left_id", "right_id"), gold_keyed)
        cl = clusters.select(F.col("mention_id").alias("left_id"), F.col("cluster_id").alias("cl_l"))
        cr = clusters.select(F.col("mention_id").alias("right_id"), F.col("cluster_id").alias("cl_r"))
        labeled = (
            labeled.join(cl, "left_id")
            .join(cr, "right_id")
            .withColumn("predicted", F.col("cl_l") == F.col("cl_r"))
        )
        metrics = pairwise_prf(labeled)

    return PipelineResult(mentions=mentions, pairs=pairs, scored=scored, clusters=clusters, metrics=metrics)
