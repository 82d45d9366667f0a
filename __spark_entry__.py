"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end entity-resolution
pipeline on a deterministic synthetic transcript corpus (the engine's
primary input shape, BASELINE.json input_hint) and returns the cluster
assignment DataFrame.

``queries()`` / ``oracle_sql()`` delegate to
``wned_spark.entry_queries`` — one entry per implemented operator from
SURVEY.md §2 plus the training-data-pipeline extras (dedup, ANN, text
analysis). Hash-dependent operators (MinHash/SimHash/LSH) are
registered without oracles → rows-only checks, as the contract allows;
their correctness is pinned by pytest oracles instead.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wned_spark import entry_queries  # noqa: E402
from wned_spark.session import ship_package  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ER pipeline (mentions → blocking → scoring → PPR
    signatures → threshold → connected components) on a small
    deterministic corpus; returns (mention_id, cluster_id, surface)."""
    ship_package(spark)
    from pyspark.sql import functions as F

    from wned_spark.config import ERConfig
    from wned_spark.datagen import generate_corpus
    from wned_spark.pipeline import run_er_pipeline

    c = generate_corpus(
        spark, n_conversations=24, turns_per_conv=8, n_entities=16,
        community_size=8, ambiguity_rate=0.25,
    )
    res = run_er_pipeline(
        spark, c["transcripts"].cache(), alias_raw=c["alias_raw"], cfg=ERConfig()
    )
    surfaces = res.mentions.select("mention_id", "surface", "conv_id", "turn_idx")
    return res.clusters.join(surfaces, "mention_id").select(
        "mention_id", "cluster_id", "surface", "conv_id", "turn_idx"
    ).orderBy("cluster_id", "mention_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for name, fn in entry_queries.queries().items():
        def wrapped(spark, sf_dir, _fn=fn):
            ship_package(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapped
    return out


def oracle_sql() -> dict[str, str]:
    return entry_queries.oracle_sql()
