"""Mention extraction (N1-lite) + doc-local coreference (J6/N2-lite).

The reference runs Stanford CoreNLP NER + GATE orthographic coref
(``common/nlp/StanfordNER.java:98-230``, ``OrthoMatcherCoref.java``).
The rebuild extracts capitalized-token-run mentions with char offsets via
an Arrow-batched regex UDF (deterministic, dependency-free), then merges
short person names into containing longer names per conversation —
the ``ELUtils.resolve`` rule (``utils/ELUtils.java:178-208``: substring
containment, longer name wins).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from wned_spark.functions.normalize import norm_surface

# Runs of capitalized tokens: "Alice Gardenbar", "Dr. Alice Gardenbar",
# "A. Gardenbar", "IBM", "Gardenbar Systems Inc."
_CAP_TOKEN = r"(?:[A-Z][a-z]+\.?|[A-Z]\.|[A-Z]{2,})"
_MENTION_RE = re.compile(rf"{_CAP_TOKEN}(?:\s+{_CAP_TOKEN})*")

_MENTION_STRUCT = T.ArrayType(
    T.StructType([
        T.StructField("surface", T.StringType()),
        T.StructField("start", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
    ])
)


@F.pandas_udf(_MENTION_STRUCT)
def extract_mention_spans(texts: pd.Series) -> pd.Series:
    """Per-text array of (surface, start, end) capitalized-run spans."""
    out = []
    for t in texts:
        if not isinstance(t, str):
            out.append([])
            continue
        out.append([
            {"surface": m.group(0), "start": m.start(), "end": m.end()}
            for m in _MENTION_RE.finditer(t)
        ])
    return pd.Series(out)


def extract_mentions(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) → mentions(
    conv_id, turn_idx, mention_id, surface, start, end, surface_norm).

    mention_id is a stable 64-bit hash of (conv_id, turn_idx, start) —
    reproducible across runs and parallelism levels (no
    monotonically_increasing_id, which is partition-layout-dependent).
    """
    spans = transcripts.select(
        "conv_id",
        "turn_idx",
        F.explode(extract_mention_spans(F.col("text"))).alias("m"),
    )
    return spans.select(
        "conv_id",
        "turn_idx",
        F.xxhash64("conv_id", "turn_idx", F.col("m.start")).alias("mention_id"),
        F.col("m.surface").alias("surface"),
        F.col("m.start").alias("start"),
        F.col("m.end").alias("end"),
    ).withColumn("surface_norm", norm_surface(F.col("surface")))


_COREF_SCHEMA = (
    "conv_id string, turn_idx int, mention_id long, surface string, "
    "start int, end int, surface_norm string, canon_norm string"
)


def resolve_coref(mentions: DataFrame) -> DataFrame:
    """Doc-local orthographic coref (ELUtils.java:178-208 semantics):
    within a conversation, a mention whose normalized surface is a
    token-subsequence-prefix/suffix of a longer mention's surface is
    re-pointed at the longest such surface ('canon_norm'). O(d²) per
    conversation — bounded by mentions-per-conversation, executed as a
    grouped pandas kernel (the reference does the same doc-local loop
    in OrthoMatcherCoref.java:221-319).
    """

    def per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        uniq = sorted(set(pdf["surface_norm"]), key=lambda s: (-len(s), s))
        canon = {}
        for s in uniq:
            toks = set(s.split(" "))
            target = s
            for longer in uniq:
                if len(longer) <= len(s):
                    break
                lt = longer.split(" ")
                # containment: every token of s appears in longer (order-free
                # token containment — covers "Gardenbar" ⊂ "Alice Gardenbar")
                if toks and toks.issubset(set(lt)):
                    target = longer
                    break
            canon[s] = target
        pdf = pdf.copy()
        pdf["canon_norm"] = pdf["surface_norm"].map(canon)
        return pdf

    return mentions.groupBy("conv_id").applyInPandas(per_conv, schema=_COREF_SCHEMA)
