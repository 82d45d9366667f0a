"""Datagen invariants: determinism under repartitioning, gold-offset
exactness, schema conformance to BASELINE.json input_hint."""

import pyspark.sql.functions as F

from wned_spark.datagen import generate_corpus


def test_schema_matches_input_hint(spark):
    c = generate_corpus(spark, n_conversations=5, turns_per_conv=6, n_entities=8)
    t = c["transcripts"]
    assert [f.name for f in t.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    types = {f.name: f.dataType.simpleString() for f in t.schema.fields}
    assert types["conv_id"] == "string"
    assert types["turn_idx"] == "int"
    assert types["text"] == "string"
    assert types["ts"] == "timestamp"


def test_deterministic_across_partitioning(spark):
    a = generate_corpus(spark, n_conversations=12, turns_per_conv=6, n_entities=8)["transcripts"]
    b_src = generate_corpus(spark, n_conversations=12, turns_per_conv=6, n_entities=8)
    b = b_src["transcripts"].repartition(7)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_gold_offsets_exact(spark):
    c = generate_corpus(spark, n_conversations=10, turns_per_conv=8, n_entities=8)
    joined = c["gold_mentions"].join(c["transcripts"], ["conv_id", "turn_idx"])
    bad = joined.filter(
        F.expr("substring(text, start + 1, end - start)") != F.col("surface")
    )
    assert bad.count() == 0


def test_stable_turn_ordering_invariant(spark):
    """Per-turn text equality under (conv_id, turn_idx) ordering — the
    BASELINE.json per-row invariant: regenerating and re-sorting yields
    the identical text sequence."""
    a = generate_corpus(spark, n_conversations=8, turns_per_conv=6, n_entities=8)["transcripts"]
    texts1 = [r["text"] for r in a.orderBy("conv_id", "turn_idx").select("text").collect()]
    b = generate_corpus(spark, n_conversations=8, turns_per_conv=6, n_entities=8)["transcripts"]
    texts2 = [r["text"] for r in b.repartition(5).orderBy("conv_id", "turn_idx").select("text").collect()]
    assert texts1 == texts2


def test_surnames_unique():
    from wned_spark.datagen import surname_for

    names = [surname_for(i) for i in range(2000)]
    assert len(set(names)) == 2000
