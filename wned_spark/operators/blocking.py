"""Blocking: salted mention-token keys + MinHash-LSH band keys (J2).

Replaces the reference's Lucene bigram fuzzy search
(``AliasLuceneIndex.java:247-300``) with set-similarity blocking:

- token keys: every non-stopword token of the normalized surface is a
  block key — the exact-lookup recall path (J1-analog);
- MinHash band keys over character bigrams — the fuzzy recall path
  (misspellings, initials), same collision shape as the reference's
  bigram index probe;
- skew control (north rule: "salted mention-token blocking keys"):
  block keys hotter than ``max_block_size`` are SALTED — split into
  ``ceil(freq / max_block_size)`` sub-blocks by a deterministic hash of
  the mention — bounding any single block's pair count. A Zipf-head
  token ("the"-like) therefore costs O(k·(n/k)²) instead of O(n²),
  and no reduce task sees more than max_block_size² pair candidates.
  AQE skew-join splits any residue at runtime.

Pair generation dedups with ``left_id < right_id`` — mirroring the
reference's ``name1.compareTo(name2)`` guard
(``WikiGraphExtractor.java:71-72``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wned_spark.config import ERConfig
from wned_spark.functions.shingles import char_shingles, minhash_band_keys, minhash_signature

_STOPWORDS = [
    "the", "a", "an", "of", "and", "or", "in", "on", "at", "to", "for",
    "inc", "ltd", "co", "corp", "llc", "dr", "mr", "mrs", "ms", "prof",
]


def block_keys(mentions: DataFrame, cfg: ERConfig = ERConfig()) -> DataFrame:
    """mentions(mention_id, surface_norm) → (mention_id, block_key).

    Token keys are prefixed 'tok:', LSH band keys 'mh:<band-hash>'.
    One row per (mention, key); downstream self-join happens per key.
    """
    key_col = "canon_norm" if "canon_norm" in mentions.columns else "surface_norm"
    base = mentions.select("mention_id", F.col(key_col).alias("sn"))

    tok_rows = base.select(
        "mention_id",
        F.explode(F.split(F.col("sn"), r"[\s\.]+")).alias("tok"),
    ).filter((F.length("tok") >= 3) & (~F.col("tok").isin(_STOPWORDS)))
    toks = tok_rows.select(
        "mention_id", F.concat(F.lit("tok:"), F.col("tok")).alias("block_key")
    )
    # typo-robust keys: a single swap/drop inside a token keeps either
    # its 4-char prefix or suffix intact, so misspelled surnames still
    # share a key with the canonical form
    affix = (
        tok_rows.filter(F.length("tok") >= 5)
        .select(
            "mention_id",
            F.explode(
                F.array(
                    F.concat(F.lit("pfx:"), F.substring("tok", 1, 4)),
                    F.concat(F.lit("sfx:"), F.substring("tok", -4, 4)),
                )
            ).alias("block_key"),
        )
    )
    toks = toks.union(affix)

    sh = char_shingles(F.col("sn"), n=cfg.shingle_size)
    sig = minhash_signature(sh, cfg.minhash_num_hashes)
    bands = minhash_band_keys(sig, cfg.minhash_num_hashes, cfg.minhash_band_size)
    mh = base.select(
        "mention_id",
        F.explode(bands).alias("bk"),
    ).select("mention_id", F.concat(F.lit("mh:"), F.col("bk").cast("string")).alias("block_key"))

    return toks.union(mh)


def salt_hot_keys(keys: DataFrame, cfg: ERConfig = ERConfig()) -> DataFrame:
    """Deterministic salting of hot block keys.

    A pre-pass counts rows per key (cheap map-side-combine groupBy);
    keys with freq > max_block_size get ``n_salts = ceil(freq/max)``
    sub-blocks, the salt chosen by hash(mention_id) % n_salts. Salting
    is RECALL-LOSSY within the hot key (pairs in different salt buckets
    aren't compared) — exactly the trade the north rule prescribes for
    Zipf-head tokens, whose pairs are uninformative. Keys at or below
    the cap pass through with salt 0.
    """
    freqs = keys.groupBy("block_key").agg(F.count("*").alias("key_freq"))
    n_salts = F.ceil(F.col("key_freq") / cfg.max_block_size).cast("int")
    salted = (
        keys.join(freqs, "block_key")
        .withColumn("n_salts", n_salts)
        .withColumn(
            "salt",
            F.when(F.col("n_salts") <= 1, F.lit(0)).otherwise(
                F.pmod(F.xxhash64("mention_id", F.lit(7919)), F.col("n_salts")).cast("int")
            ),
        )
        .select(
            F.concat_ws("#", "block_key", "salt").alias("block_key"),
            "mention_id",
        )
    )
    return salted


def candidate_pairs(
    mentions: DataFrame, cfg: ERConfig = ERConfig(), salted: bool = True
) -> DataFrame:
    """Blocked self-join → distinct candidate pairs (left_id < right_id),
    carrying both normalized surfaces for downstream scoring."""
    keys = block_keys(mentions, cfg)
    if salted:
        keys = salt_hot_keys(keys, cfg)
    a = keys.alias("a")
    b = keys.alias("b")
    pairs = (
        a.join(b, "block_key")
        .filter(F.col("a.mention_id") < F.col("b.mention_id"))
        .select(
            F.col("a.mention_id").alias("left_id"),
            F.col("b.mention_id").alias("right_id"),
        )
        .distinct()
    )
    key_col = "canon_norm" if "canon_norm" in mentions.columns else "surface_norm"
    m = mentions.select(
        "mention_id",
        F.col(key_col).alias("sn"),
        "conv_id",
        "turn_idx",
    )
    return (
        pairs.join(m.alias("ml"), F.col("left_id") == F.col("ml.mention_id"))
        .join(m.alias("mr"), F.col("right_id") == F.col("mr.mention_id"))
        .select(
            "left_id",
            "right_id",
            F.col("ml.sn").alias("left_norm"),
            F.col("mr.sn").alias("right_norm"),
            F.col("ml.conv_id").alias("left_conv"),
            F.col("mr.conv_id").alias("right_conv"),
        )
    )
