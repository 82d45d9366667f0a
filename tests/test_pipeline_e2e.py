"""End-to-end gates: pairwise F1 >= 0.99 (BASELINE.json metric), per-turn
text-equality invariant, and catalog resume semantics."""

import json
import os

import pyspark.sql.functions as F

from wned_spark.config import ERConfig
from wned_spark.datagen import generate_corpus
from wned_spark.pipeline import run_er_pipeline
from wned_spark.plans.catalog import Catalog


def test_e2e_pairwise_f1_gate(spark):
    c = generate_corpus(spark, n_conversations=40, turns_per_conv=10,
                        n_entities=32, community_size=8)
    c["transcripts"] = c["transcripts"].cache()
    c["gold_mentions"] = c["gold_mentions"].cache()
    res = run_er_pipeline(
        spark, c["transcripts"], alias_raw=c["alias_raw"],
        gold_mentions=c["gold_mentions"], cfg=ERConfig(),
    )
    assert res.metrics["f1"] >= 0.99, res.metrics
    # four-feature parity with WNED (utils/Feature.java:20-38):
    # nameSim block, semSim (cosine + ZeroKL), local, prior
    for col in ["name_jw", "name_soft", "sig_cosine", "sig_kl",
                "ctx_cosine", "shared_prior", "score"]:
        assert col in res.scored.columns, col


def test_per_turn_text_equality_roundtrip(spark, tmp_warehouse):
    """Per-row invariant (BASELINE.json input_hint): writing transcripts
    through the table layer and reading back preserves per-turn text
    under stable (conv_id, turn_idx) ordering."""
    c = generate_corpus(spark, n_conversations=10, turns_per_conv=8, n_entities=8)
    cat = Catalog(spark, tmp_warehouse)
    cat.write("bronze_transcripts", c["transcripts"])
    back = cat.read("bronze_transcripts")
    orig = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in c["transcripts"].orderBy("conv_id", "turn_idx").collect()
    ]
    rt = [
        (r["conv_id"], r["turn_idx"], r["text"])
        for r in back.orderBy("conv_id", "turn_idx").collect()
    ]
    assert orig == rt


def test_resume_skips_committed_stages(spark, tmp_warehouse):
    c = generate_corpus(spark, n_conversations=12, turns_per_conv=8,
                        n_entities=16, community_size=8)
    c["transcripts"] = c["transcripts"].cache()
    cfg = ERConfig()
    cat = Catalog(spark, tmp_warehouse)
    res1 = run_er_pipeline(spark, c["transcripts"], alias_raw=c["alias_raw"],
                           cfg=cfg, catalog=cat)
    man1 = json.load(open(os.path.join(tmp_warehouse, "_wned_manifest.json")))
    snap1 = {k: v["snapshot_id"] for k, v in man1["stages"].items()}
    mtimes1 = {
        s: os.path.getmtime(cat.path(s)) for s in man1["stages"] if os.path.exists(cat.path(s))
    }

    cat2 = Catalog(spark, tmp_warehouse)
    res2 = run_er_pipeline(spark, c["transcripts"], alias_raw=c["alias_raw"],
                           cfg=cfg, catalog=cat2)
    man2 = json.load(open(os.path.join(tmp_warehouse, "_wned_manifest.json")))
    snap2 = {k: v["snapshot_id"] for k, v in man2["stages"].items()}
    # no stage re-executed: snapshot ids and data mtimes unchanged
    assert snap1 == snap2
    for s, t in mtimes1.items():
        assert os.path.getmtime(cat2.path(s)) == t
    # identical final snapshot
    assert res1.clusters.exceptAll(res2.clusters).count() == 0
    assert res2.clusters.exceptAll(res1.clusters).count() == 0


def test_clusters_deterministic_across_parallelism(spark):
    """Same input at different shuffle partitioning → identical clusters
    (required for the local[8] vs local[32] scaling claim)."""
    c = generate_corpus(spark, n_conversations=12, turns_per_conv=8,
                        n_entities=16, community_size=8)
    t = c["transcripts"].cache()
    cfg = ERConfig()
    r1 = run_er_pipeline(spark, t, alias_raw=c["alias_raw"], cfg=cfg)
    r2 = run_er_pipeline(spark, t.repartition(13), alias_raw=c["alias_raw"], cfg=cfg)
    c1 = r1.clusters
    c2 = r2.clusters
    assert c1.exceptAll(c2).count() == 0
    assert c2.exceptAll(c1).count() == 0


def test_e2e_adversarial_regime_gate(spark):
    """Round-3 verdict item 6: the F1 gate must hold on an ADVERSARIAL
    corpus where the fuzzy paths are load-bearing, not just present —
    boosted misspelling frequency (fuzzy blocking + JW/SoftTFIDF),
    parenthetical-only acronym definitions (the R10 pattern miner is
    the ONLY resolution evidence), and a Zipf-hot shared alias token
    (salting + IDF down-weighting). Also asserts the miner is load-
    bearing: with pattern mining disabled the same corpus fails the
    gate."""
    import dataclasses

    c = generate_corpus(
        spark, n_conversations=60, turns_per_conv=10,
        n_entities=32, community_size=8,
        misspell_boost=4, paren_def_rate=0.6, hot_token_rate=1.0,
    )
    c["transcripts"] = c["transcripts"].cache()
    c["gold_mentions"] = c["gold_mentions"].cache()

    res = run_er_pipeline(
        spark, c["transcripts"], alias_raw=c["alias_raw"],
        gold_mentions=c["gold_mentions"], cfg=ERConfig(),
    )
    assert res.metrics["f1"] >= 0.99, res.metrics

    res_off = run_er_pipeline(
        spark, c["transcripts"], alias_raw=c["alias_raw"],
        gold_mentions=c["gold_mentions"],
        cfg=dataclasses.replace(ERConfig(), use_pattern_defs=False),
    )
    assert res_off.metrics["f1"] < 0.99, res_off.metrics
