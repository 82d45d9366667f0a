"""Learning-to-rank margin over candidate pairs (N5/K6/N7).

The reference ranks candidates with a RankLib GBDT ("lambdaMART")
model: features are dumped with gold labels
(``tuning/SemanticSignatureEL.java:666-692``), trained offline, and
applied at inference by summing tree scores and taking the argmax
(``disambiguation/L2RPredictor.java:31-83``). The north rule recasts
this as "a learning-to-rank margin over candidate PAIRS replacing
WNED's GBDT ranker":

- ``surface_gold_labels`` + ``pair_training_data`` — the K6/N7
  training-data sink: every scored surface pair joined with its gold
  same-entity label, ready to persist via the Catalog;
- ``train_ranker`` — a Spark ML gradient-boosted-tree classifier
  (the GBDT family the reference uses, trained distributively);
- ``score_with_model`` — margin inference: raw GBT score (sum of
  tree outputs — exactly L2RPredictor's tree-sum margin) plus its
  bounded logistic form as ``score`` so the pipeline's
  ``match_threshold`` gate semantics carry over unchanged.

Feature sum-normalization note (A6): L2RPredictor.java:44-57 sum-
normalizes each feature over a mention's candidate list before
inference. Pair features here are already per-pair similarities in
[0,1] with no per-mention candidate list, so the normalization has no
analog; trees are scale-invariant per split anyway.

Determinism: fixed seed, ``featureSubsetStrategy="all"``,
``subsamplingRate=1.0`` — tree stats are distributive sums, so the
fitted model is identical across partitionings and core counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wned_spark.config import ERConfig

# the four-feature WNED family (Feature.java:20-38) recast for pairs
FEATURE_COLS = [
    "name_jw",
    "name_soft",
    "name_dice",
    "name_lev",
    "sig_cosine",
    "sig_kl",
    "ctx_cosine",
    "shared_prior",
]


def surface_gold_labels(mentions: DataFrame, gold_mentions: DataFrame) -> DataFrame:
    """(sid, entity_id): majority gold entity per distinct normalized
    surface (ties -> min entity_id, deterministic). Gold mentions are
    keyed exactly like the pipeline's evaluation join —
    xxhash64(conv_id, turn_idx, start)."""
    key_col = "canon_norm" if "canon_norm" in mentions.columns else "surface_norm"
    gm = gold_mentions.select(
        F.xxhash64("conv_id", "turn_idx", "start").alias("mention_id"), "entity_id"
    )
    m = mentions.select("mention_id", F.xxhash64(F.col(key_col)).alias("sid"))
    counts = m.join(gm, "mention_id").groupBy("sid", "entity_id").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("sid").orderBy(F.desc("n"), F.asc("entity_id"))
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("sid", "entity_id")
    )


def pair_training_data(
    scored: DataFrame, surface_labels: DataFrame,
    feature_cols: list[str] | None = None,
) -> DataFrame:
    """Scored surface pairs ⋈ gold labels → labeled training rows
    (the SemanticSignatureEL.java:666-692 feature dump as a DataFrame;
    persist through the Catalog for the K6 sink). label = 1 when both
    surfaces carry the same gold entity."""
    cols = feature_cols or [c for c in FEATURE_COLS if c in scored.columns]
    ll = surface_labels.select(
        F.col("sid").alias("left_sid"), F.col("entity_id").alias("ent_l")
    )
    lr = surface_labels.select(
        F.col("sid").alias("right_sid"), F.col("entity_id").alias("ent_r")
    )
    return (
        scored.join(ll, "left_sid")
        .join(lr, "right_sid")
        .select(
            "left_sid",
            "right_sid",
            *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in cols],
            (F.col("ent_l") == F.col("ent_r")).cast("int").alias("label"),
        )
    )


def train_ranker(
    training: DataFrame,
    feature_cols: list[str] | None = None,
    max_iter: int = 20,
    max_depth: int = 3,
    seed: int = 42,
):
    """Fit the GBT pair ranker. Returns a fitted ``PipelineModel``
    (assembler + GBT) whose first stage pins the feature column order."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import GBTClassifier
    from pyspark.ml.feature import VectorAssembler

    cols = feature_cols or [c for c in FEATURE_COLS if c in training.columns]
    assembler = VectorAssembler(inputCols=cols, outputCol="fvec")
    gbt = GBTClassifier(
        featuresCol="fvec",
        labelCol="label",
        maxIter=max_iter,
        maxDepth=max_depth,
        seed=seed,
        featureSubsetStrategy="all",
        subsamplingRate=1.0,
    )
    return Pipeline(stages=[assembler, gbt]).fit(training)


def score_with_model(features: DataFrame, model, cfg: ERConfig = ERConfig()) -> DataFrame:
    """Margin inference (L2RPredictor.java:31-83 recast): adds
    ``l2r_margin`` (raw tree-sum score for the match class) and
    ``score`` (its logistic form in [0,1], drop-in for the LINEAR
    combiner's score so ``match_threshold`` keeps its meaning)."""
    from pyspark.ml.functions import vector_to_array

    cols = model.stages[0].getInputCols()
    filled = features
    for c in cols:
        if c in filled.columns:
            filled = filled.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
        else:
            # a model input the pipeline ran without (use_signatures /
            # use_ctx_feature off): the training-time convention is
            # coalesce-to-0, so an absent feature scores as 0
            filled = filled.withColumn(c, F.lit(0.0))
    out = model.transform(filled)
    return (
        out.withColumn("l2r_margin", vector_to_array("rawPrediction")[1])
        .withColumn("score", vector_to_array("probability")[1])
        .drop("fvec", "rawPrediction", "probability", "prediction")
    )


def train_nil_head(
    training: DataFrame,
    feature_cols: list[str] | None = None,
    max_iter: int = 50,
):
    """N6: the reference's NIL predictor recast
    (``disambiguation/NILPredictor.java:24-62``: a libsvm BINARY
    classifier over the 4-feature family deciding whether the top
    candidate should be REJECTED). In the pair formulation the same
    decision is "is this scored pair a real match": a logistic head
    over the pair features whose P(match) ≥ 0.5 boundary replaces the
    fixed ``match_threshold`` when a fitted head is passed to
    ``run_er_pipeline(nil_model=...)``.

    Ablation note: on the clean synthetic regime the trained boundary
    and the hand threshold agree (both pass the F1 ≥ 0.99 gate — the
    features separate cleanly, as NILPredictor's do on Wikipedia);
    the trained form exists for reference parity and for corpora where
    the margin between match and non-match shifts. The reference ships
    NIL off by default (``el.config:28``) — so does the rebuild
    (``nil_model=None``).

    Determinism: LBFGS over a fixed dataset; decisions (not raw
    coefficients) are pinned by test."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    cols = feature_cols or [c for c in FEATURE_COLS if c in training.columns]
    assembler = VectorAssembler(inputCols=cols, outputCol="fvec")
    lr = LogisticRegression(
        featuresCol="fvec", labelCol="label", maxIter=max_iter, standardization=True
    )
    return Pipeline(stages=[assembler, lr]).fit(training)


def apply_nil_head(scored: DataFrame, model) -> DataFrame:
    """Filter scored pairs through the NIL head: keep rows the head
    accepts (P(match) ≥ 0.5). Missing/absent feature columns fill with
    0.0 — the training-time convention."""
    from pyspark.ml.functions import vector_to_array

    cols = model.stages[0].getInputCols()
    filled = scored
    for c in cols:
        if c in filled.columns:
            filled = filled.withColumn(c, F.coalesce(F.col(c), F.lit(0.0)))
        else:
            filled = filled.withColumn(c, F.lit(0.0))
    out = model.transform(filled).withColumn(
        "nil_p", vector_to_array("probability")[1]
    )
    return out.filter(F.col("nil_p") >= 0.5).drop(
        "fvec", "rawPrediction", "probability", "prediction", "nil_p"
    ).select(*scored.columns)


def train_l2r_from_gold(
    spark,
    transcripts: DataFrame,
    alias_raw: DataFrame | None,
    gold_mentions: DataFrame,
    cfg: ERConfig = ERConfig(),
    catalog=None,
    train_soft_gate: float = 0.0,
    **train_kw,
):
    """End-to-end training path: run the feature stages of the pipeline
    on a gold-labeled corpus, dump the labeled pair features (committed
    as the ``training_features`` snapshot when a catalog is given — the
    K6 sink), and fit the GBT ranker. Returns (model, training_df).

    The training run RELEASES the cascade gate (``train_soft_gate``,
    default 0): the production gate exists to prune obvious
    non-matches, but a ranker trained only on gate-survivors would see
    almost no negatives. Training corpora are gold-labeled and
    therefore small, so full-feature scoring of every blocked pair is
    affordable there — and the inference population (gate survivors)
    is a subset of the training population, never the reverse."""
    import dataclasses

    from wned_spark.pipeline import run_er_pipeline

    res = run_er_pipeline(
        spark, transcripts, alias_raw=alias_raw,
        cfg=dataclasses.replace(cfg, soft_gate=train_soft_gate),
        catalog=catalog,
    )
    labels = surface_gold_labels(res.mentions, gold_mentions)
    training = pair_training_data(res.scored, labels)
    if catalog is not None:
        training = catalog.run_stage("training_features", lambda: training)
    model = train_ranker(training, **train_kw)
    return model, training
