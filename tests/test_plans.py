"""Physical-plan quality gates: predicate pushdown reaches the parquet
scan, column pruning trims ReadSchema, small dims broadcast, and
aggregations keep their map-side partial step. These pin the plans we
WANT, so a refactor that silently de-optimizes a scan fails a test
rather than a 100 TB run."""

import wned_spark.entry_queries as EQ

SF_DIR = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized_with_scan(df) -> str:
    # executedPlan keeps scan details (PushedFilters / ReadSchema)
    return _physical_plan(df)


def test_f1_filter_pushed_to_parquet_scan(spark):
    df = EQ.queries()["f1_filter_project"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "PushedFilters" in plan
    # the shipdate range predicate must reach the scan, not sit in a
    # post-scan Filter only
    assert "LessThan(l_shipdate" in plan or "LessThan(l_discount" in plan, plan


def test_f1_column_pruning_trims_readschema(spark):
    df = EQ.queries()["f1_filter_project"](spark, SF_DIR)
    plan = _physical_plan(df)
    start = plan.index("ReadSchema")
    schema_line = plan[start:start + 400]
    # only the referenced columns are read — a scan that reads
    # l_comment for a 3-column projection is wrong
    assert "l_comment" not in schema_line
    assert "l_orderkey" in schema_line


def test_j1_small_dims_broadcast(spark):
    df = EQ.queries()["j1_dimension_join"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan, plan


def test_q1_keeps_partial_aggregation(spark):
    df = EQ.queries()["agg_tpch_q1"](spark, SF_DIR)
    plan = _physical_plan(df)
    # map-side combine: HashAggregate appears for both partial and
    # final steps around the exchange
    assert plan.count("HashAggregate") >= 2, plan


def test_semi_join_stays_semi(spark):
    df = EQ.queries()["j5_semi_join"](spark, SF_DIR)
    plan = _physical_plan(df)
    assert "LeftSemi" in plan, plan


def test_soft_tfidf_relational_plan_shape(spark):
    """The relational SoftTFIDF's token-pair expansion must be
    generator-only (explode from split expressions — no join building
    the |pairs|·t² intermediate) and must never plan a cartesian
    product. r07: the shared small tables (sp / tpairs / tokidf / den /
    sims) are pinned with local checkpoints — the final plan must read
    them as RDD scans (the AQE cross-job exchange-reuse gap made each
    reference re-run its chain otherwise), so the n_surf broadcast now
    lives in the tokidf checkpoint's own query, not this plan."""
    from pyspark.sql import functions as F

    from wned_spark.operators.scoring import soft_tfidf_scores

    pairs = spark.createDataFrame(
        [("alice gardenbar", "a. gardenbar"), ("acme widgets", "acme widgets inc")],
        "left_norm string, right_norm string",
    )
    df = soft_tfidf_scores(pairs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "Generate posexplode" in plan or "Generate explode" in plan, plan
    assert "Scan ExistingRDD" in plan, plan  # pinned shared tables


def test_fused_signature_features_plan_shape(spark):
    """The fused R6+R7 kernel must keep the (pair × signature-node)
    join single-pass: exactly ONE aggregate pyramid (partial + final of
    the fused groupBy) over one full-outer node join, no cartesian —
    the point of the fusion is paying that shuffle once, not three
    times as the composed single-feature kernels did."""
    import re

    from pyspark.sql import Row

    from wned_spark.operators.ppr import signature_features

    sigs = spark.createDataFrame(
        [Row(seed=1, node=1, rank=0.6), Row(seed=1, node=2, rank=0.4),
         Row(seed=2, node=2, rank=1.0)]
    )
    pairs = spark.createDataFrame([Row(seed_a=1, seed_b=2)])
    plan = signature_features(pairs, sigs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "FullOuter" in plan, plan
    # ONE logical aggregate pyramid renders as <= 2 physical aggregate
    # operators (partial + final); the pre-fusion three-kernel shape
    # rendered >= 4. Upper-bound (not exact-count) so a harmless
    # planner change (ObjectHashAggregate fallback, AQE re-render)
    # can't fail the suite without a real extra shuffle appearing.
    aggs = re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan)
    assert 1 <= len(aggs) <= 2, (len(aggs), plan)
