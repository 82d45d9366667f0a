"""Evaluation: pairwise precision / recall / F1 (A8).

The reference's harness computes micro/macro mention-accuracy against
gold XML (``experiment/Evaluation.java:57-161``); per BASELINE.json the
rebuild evaluates PAIRWISE over labeled pairs at the fixed blocking
key: predicted-match = same predicted cluster; gold-match = same gold
entity. Micro counts, same correct/found/query arithmetic as
``Evaluation.java:154-160`` recast to TP/FP/FN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile_gold_offsets(mentions: DataFrame, gold_mentions: DataFrame) -> DataFrame:
    """N4: mention-offset reconciliation (``utils/DocumentUtils.java:66-143``):
    gold rows match extracted mentions by the exact (conv, turn, start)
    key first; the remainder falls back to SPAN CONTAINMENT within the
    same turn (the gold span inside the extracted span — the
    reference's containment walk over annotation offsets), choosing the
    tightest containing mention deterministically.

    Returns (mention_id, entity_id)."""
    from pyspark.sql import Window

    m = mentions.select(
        "mention_id", "conv_id", "turn_idx",
        F.col("start").alias("m_start"), F.col("end").alias("m_end"),
    )
    exact_key = F.xxhash64("conv_id", "turn_idx", "start")
    gold = gold_mentions.select(
        "conv_id", "turn_idx", "start", "end", "entity_id",
        exact_key.alias("gkey"),
    )
    exact = gold.join(
        m.withColumn("gkey", F.xxhash64("conv_id", "turn_idx", F.col("m_start"))),
        "gkey",
    ).select("mention_id", "entity_id")

    missed = gold.join(
        m.withColumn("gkey", F.xxhash64("conv_id", "turn_idx", F.col("m_start"))),
        "gkey",
        "left_anti",
    )
    contained = (
        missed.join(m, ["conv_id", "turn_idx"])
        .filter((F.col("m_start") <= F.col("start")) & (F.col("end") <= F.col("m_end")))
    )
    w = Window.partitionBy("conv_id", "turn_idx", "start", "end").orderBy(
        F.asc(F.col("m_end") - F.col("m_start")), F.asc("mention_id")
    )
    fallback = (
        contained.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("mention_id", "entity_id")
    )
    return exact.union(fallback)


def label_pairs(pairs: DataFrame, gold_mentions_keyed: DataFrame) -> DataFrame:
    """pairs(left_id, right_id) ⋈ gold entity per side →
    + is_match column (F5). gold_mentions_keyed: (mention_id, entity_id)."""
    gl = gold_mentions_keyed.select(
        F.col("mention_id").alias("left_id"), F.col("entity_id").alias("ent_l")
    )
    gr = gold_mentions_keyed.select(
        F.col("mention_id").alias("right_id"), F.col("entity_id").alias("ent_r")
    )
    return (
        pairs.join(gl, "left_id")
        .join(gr, "right_id")
        .withColumn("is_match", F.col("ent_l") == F.col("ent_r"))
    )


def macro_accuracy(
    labeled: DataFrame,
    group_col: str = "conv_id",
    predicted_col: str = "predicted",
    gold_col: str = "is_match",
) -> DataFrame:
    """A8 macro variant (``experiment/Evaluation.java:86-153``): the
    reference logs per-document accuracy (``correct/query`` per doc)
    and macro-averages across documents; here each group of
    ``group_col`` is one document.

    Returns per-group rows (doc, queries, correct, accuracy_ppm) with
    the macro average attached as ``macro_accuracy_ppm`` (identical on
    every row). Accuracies are exact INTEGER parts-per-million — the
    same cross-engine determinism trick as the pairwise harness.
    The macro scalar rides a one-row broadcast crossJoin (the repo's
    standard pattern for global-stat attachment, cf. tfidf.py), not a
    global window, so no single-partition sort appears at scale."""
    per = (
        labeled.groupBy(F.col(group_col).alias("doc"))
        .agg(
            F.count("*").alias("queries"),
            F.sum(
                F.when(F.col(predicted_col) == F.col(gold_col), 1).otherwise(0)
            ).alias("correct"),
        )
        .withColumn("accuracy_ppm", F.expr("div(correct * 1000000, queries)"))
    )
    macro = per.agg(
        F.expr("div(sum(accuracy_ppm), count(1))").alias("macro_accuracy_ppm")
    )
    return per.crossJoin(F.broadcast(macro))


def pairwise_prf(labeled: DataFrame, predicted_col: str = "predicted") -> dict:
    """labeled(is_match, <predicted_col>) → {precision, recall, f1, tp, fp, fn}."""
    row = labeled.agg(
        F.sum(F.when(F.col(predicted_col) & F.col("is_match"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col(predicted_col) & ~F.col("is_match"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col(predicted_col) & F.col("is_match"), 1).otherwise(0)).alias("fn"),
    ).first()
    tp, fp, fn = row["tp"] or 0, row["fp"] or 0, row["fn"] or 0
    p = tp / (tp + fp) if tp + fp else 0.0
    r = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    return {"precision": p, "recall": r, "f1": f1, "tp": tp, "fp": fp, "fn": fn}
