"""Batched personalized PageRank — semantic signatures (G3/G5/G6).

The reference computes one PPR per candidate entity, farmed out to 32
threads over a shared in-heap WebGraph
(``WeightedPersonalizedPageRank.java:42-110,233-266``). The Spark-native
re-expression batches ALL seeds into one long-form DataFrame
``ranks(seed, node, rank)`` and iterates a single
join-aggregate (sparse matrix-matrix instead of 32x matrix-vector):

    ranks' = alpha * (ranks ⋈ P).groupBy(seed, dst).sum
             + [node == seed] * ((1 - alpha) + alpha * dangling(seed))

with ``localCheckpoint()`` per iteration to truncate lineage (the north
rule's "checkpointed sparse matrix-vector joins"). Dangling mass is
returned to the preference vector — ``stronglyPreferential=true``
(``PersonalizedPageRank.java:30``).

Parameters pinned to the reference: alpha=0.85, stop at L1 delta < 1e-5
or 3 iterations (``PersonalizedPageRank.java:27-30``).

Scale notes: P is row-normalized ONCE and persisted; each iteration is
one shuffle on (seed, dst); signatures stay sparse (3 iterations from a
single seed reach a bounded neighborhood), so signature size is
O(seeds x avg 3-hop neighborhood), never O(seeds x |V|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wned_spark.config import ERConfig


def normalize_transition(edges: DataFrame, max_degree: int | None = None) -> DataFrame:
    """Row-normalize edge weights: P(src→dst) = w / sum_w(src).
    (WeightedPersonalizedPageRank.java:161-184 weight handling; F8
    zero-weight arcs dropped.)

    ``max_degree`` keeps only the top-K outgoing edges per node by
    weight — the degree-threshold idea of the reference's subgraph
    expansion (SubGraphGenerator.java:30-31) applied to transition
    sparsity: hub surfaces otherwise blow the signature fan-out to
    O(hub_degree) rows per seed per iteration."""
    e = edges.filter(F.col("weight") > 0)
    if max_degree is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("src").orderBy(F.desc("weight"), F.asc("dst"))
        e = e.withColumn("_rk", F.row_number().over(w)).filter(
            F.col("_rk") <= max_degree
        ).drop("_rk")
    sums = e.groupBy("src").agg(F.sum("weight").alias("wsum"))
    return e.join(sums, "src").select(
        "src", "dst", (F.col("weight") / F.col("wsum")).alias("p")
    )


def personalized_pagerank(
    seeds: DataFrame,
    edges: DataFrame,
    cfg: ERConfig = ERConfig(),
    check_delta: bool = True,
    symmetric: bool = False,
    max_degree: int | None = None,
) -> DataFrame:
    """seeds: (seed) node ids — each seed gets its own indicator
    preference vector (G5); edges: (src, dst, weight).

    ``symmetric=True`` asserts every node reachable through an edge has
    out-edges (true for mirrored undirected graphs): then the only
    dangling mass is an ISOLATED seed, whose signature is the fixed
    point {seed: 1.0} — handled once outside the loop, and the
    per-iteration dangling scan + join disappear.

    Returns signatures ``(seed, node, rank)``.
    """
    alpha = cfg.ppr_alpha
    trans = normalize_transition(edges, max_degree=max_degree).persist()
    out_nodes = trans.select("src").distinct()

    live_seeds = seeds
    isolated = None
    if symmetric:
        live_seeds = seeds.join(
            out_nodes, seeds["seed"] == out_nodes["src"], "left_semi"
        ).persist()
        isolated = seeds.join(
            out_nodes, seeds["seed"] == out_nodes["src"], "left_anti"
        ).select("seed", F.col("seed").alias("node"), F.lit(1.0).alias("rank"))

    # lazy checkpoints: lineage still truncates at materialization, but
    # no extra job barrier per iteration (3 fixed iterations keep the
    # un-truncated plan bounded anyway)
    ranks = live_seeds.select(
        F.col("seed"), F.col("seed").alias("node"), F.lit(1.0).alias("rank")
    ).localCheckpoint(eager=False)

    for _ in range(cfg.ppr_max_iter):
        prev = ranks
        spread = (
            ranks.join(trans, ranks["node"] == trans["src"])
            .groupBy("seed", "dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
            .select("seed", F.col("dst").alias("node"), (alpha * F.col("mass")).alias("rank"))
        )
        if symmetric:
            teleport = live_seeds.select(
                "seed", F.col("seed").alias("node"), F.lit(1.0 - alpha).alias("rank")
            )
        else:
            # dangling mass per seed: rank on nodes with no out-edges
            dangling = (
                ranks.join(out_nodes, ranks["node"] == out_nodes["src"], "left_anti")
                .groupBy("seed")
                .agg(F.sum("rank").alias("dmass"))
            )
            teleport = (
                seeds.join(dangling, "seed", "left")
                .na.fill({"dmass": 0.0})
                .select(
                    "seed",
                    F.col("seed").alias("node"),
                    ((1.0 - alpha) + alpha * F.col("dmass")).alias("rank"),
                )
            )
        ranks = (
            spread.union(teleport)
            .groupBy("seed", "node")
            .agg(F.sum("rank").alias("rank"))
            .localCheckpoint(eager=False)  # truncate lineage, no job barrier
        )
        if check_delta:
            delta = (
                ranks.alias("n")
                .join(prev.alias("p"), ["seed", "node"], "full")
                .select(
                    F.abs(
                        F.coalesce(F.col("n.rank"), F.lit(0.0))
                        - F.coalesce(F.col("p.rank"), F.lit(0.0))
                    ).alias("d")
                )
                .agg(F.max("d"))
                .first()[0]
            )
            if delta is not None and delta < cfg.ppr_tol:
                break
    # trans stays persisted: with lazy checkpoints nothing has
    # materialized yet — unpersisting here would force 3 recomputes of
    # the row-normalization when the caller finally acts on the ranks
    if isolated is not None:
        ranks = ranks.union(isolated)
    return ranks


def personalized_pagerank_auto(
    seeds: DataFrame,
    edges: DataFrame,
    cfg: ERConfig = ERConfig(),
    check_delta: bool = True,
    max_degree: int | None = None,
    local_threshold: int | None = None,
) -> DataFrame:
    """PPR with a size-gated physical strategy (same output contract —
    the shape :func:`cc.connected_components_auto` uses, r07): below
    the edge threshold, the broadcast-CSR kernel
    (:func:`personalized_pagerank_broadcast` — one Arrow collect + one
    shuffle-free mapInPandas job); above it, the join-based power
    iteration (~2 shuffles × iterations). The two variants are
    parity-pinned against each other and the numpy oracle in
    tests/test_ppr_cc.py; both apply the strongly-preferential dangling
    rule, and a seed with no out-edges is the fixed point {seed: 1.0}
    under either. For a 25-node registry graph the join variant's ~8
    chained shuffles are pure job-barrier overhead — the gate is the
    same decision AQE makes for broadcast-vs-shuffle joins, applied to
    the iterative operator."""
    if local_threshold is None:
        local_threshold = cfg.ppr_broadcast_max_edges
    e = edges.persist()
    try:
        if e.count() <= local_threshold:
            return personalized_pagerank_broadcast(
                seeds, e, cfg, max_degree=max_degree
            )
        return personalized_pagerank(
            seeds, e, cfg, check_delta=check_delta, symmetric=False,
            max_degree=max_degree,
        )
    finally:
        e.unpersist()


def renormalize_signatures(signatures: DataFrame, tol: float = 1e-4) -> DataFrame:
    """R14: stochastic-vector guard (``utils/ELUtils.java:81-83``): a
    signature whose total mass drifts from 1.0 beyond ``tol`` (numeric
    loss, truncated fan-out) is renormalized; in-tolerance signatures
    pass through bit-unchanged."""
    mass = signatures.groupBy("seed").agg(F.sum("rank").alias("mass"))
    return (
        signatures.join(mass, "seed")
        .select(
            "seed",
            "node",
            F.when(F.abs(F.col("mass") - 1.0) <= tol, F.col("rank"))
            .otherwise(F.col("rank") / F.col("mass"))
            .alias("rank"),
        )
    )


def signature_cosine(pairs: DataFrame, signatures: DataFrame) -> DataFrame:
    """Pairwise cosine between two seeds' signatures (R6 long-form).

    pairs: (seed_a, seed_b); signatures: (seed, node, rank).
    dot = sum over shared nodes of rank_a*rank_b; norms precomputed per
    seed (one small agg) — the join-agg pattern replaces the
    reference's in-heap Map dot product (VectorSimilarity.java:22-43).
    """
    from wned_spark.functions.similarity import cosine_expr

    norms = signatures.groupBy("seed").agg(
        F.sqrt(F.sum(F.col("rank") * F.col("rank"))).alias("norm")
    )
    sa = signatures.select(
        F.col("seed").alias("seed_a"), "node", F.col("rank").alias("rank_a")
    )
    sb = signatures.select(
        F.col("seed").alias("seed_b"), "node", F.col("rank").alias("rank_b")
    )
    dots = (
        pairs.join(sa, "seed_a")
        .join(sb, ["seed_b", "node"])
        .groupBy("seed_a", "seed_b")
        .agg(F.sum(F.col("rank_a") * F.col("rank_b")).alias("dot"))
    )
    na = norms.select(F.col("seed").alias("seed_a"), F.col("norm").alias("norm_a"))
    nb = norms.select(F.col("seed").alias("seed_b"), F.col("norm").alias("norm_b"))
    return (
        pairs.join(dots, ["seed_a", "seed_b"], "left")
        .na.fill({"dot": 0.0})
        .join(na, "seed_a")
        .join(nb, "seed_b")
        .select(
            "seed_a",
            "seed_b",
            cosine_expr(F.col("dot"), F.col("norm_a"), F.col("norm_b")).alias("sig_cosine"),
        )
    )


def personalized_pagerank_pref(
    preference: DataFrame,
    edges: DataFrame,
    cfg: ERConfig = ERConfig(),
    max_degree: int | None = None,
) -> DataFrame:
    """G6: batched PPR from arbitrary per-seed PREFERENCE VECTORS —
    the document-signature case (``ELUtils.java:59-94``: one walk per
    document, preference uniform over its confident entities; here one
    seed per conversation over its confident surface nodes).

    preference: (seed, node, w); w is sum-normalized per seed here.
    Strongly preferential (PersonalizedPageRank.java:30): dangling mass
    returns to the preference vector, scaled by each node's weight.
    Same alpha / iteration / checkpoint regime as the indicator-seed
    variant above; one shuffle per iteration regardless of seed count.
    """
    alpha = cfg.ppr_alpha
    trans = normalize_transition(edges, max_degree=max_degree).persist()
    out_nodes = trans.select("src").distinct()

    wsum = preference.groupBy("seed").agg(F.sum("w").alias("wsum"))
    pref = (
        preference.join(wsum, "seed")
        .select("seed", "node", (F.col("w") / F.col("wsum")).alias("w"))
        .persist()
    )
    ranks = pref.select("seed", "node", F.col("w").alias("rank")).localCheckpoint(
        eager=False
    )
    for _ in range(cfg.ppr_max_iter):
        spread = (
            ranks.join(trans, ranks["node"] == trans["src"])
            .groupBy("seed", "dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("mass"))
            .select("seed", F.col("dst").alias("node"), (alpha * F.col("mass")).alias("rank"))
        )
        dangling = (
            ranks.join(out_nodes, ranks["node"] == out_nodes["src"], "left_anti")
            .groupBy("seed")
            .agg(F.sum("rank").alias("dmass"))
        )
        teleport = (
            pref.join(dangling, "seed", "left")
            .na.fill({"dmass": 0.0})
            .select(
                "seed",
                "node",
                (F.col("w") * ((1.0 - alpha) + alpha * F.col("dmass"))).alias("rank"),
            )
        )
        ranks = (
            spread.union(teleport)
            .groupBy("seed", "node")
            .agg(F.sum("rank").alias("rank"))
            .localCheckpoint(eager=False)
        )
    return ranks


def _zero_kl_directed(pairs: DataFrame, signatures: DataFrame,
                      eps: float, gamma: float) -> DataFrame:
    """ZeroKL(sig_a || sig_b) per pair, relationally: signatures store
    only nonzero ranks, so every p-row contributes either
    p*log2(p/q) (q present and > eps) or p*gamma (q missing/tiny) —
    the exact VectorSimilarity.java:87-104 term structure as one
    left join + sum. Pairs whose seed_a has no signature rows get the
    all-mass-unmatched value gamma (sum(p)=1)."""
    sa = signatures.select(F.col("seed").alias("seed_a"), "node", F.col("rank").alias("p"))
    sb = signatures.select(F.col("seed").alias("seed_b"), "node", F.col("rank").alias("q"))
    terms = (
        pairs.join(sa, "seed_a")
        .join(sb, ["seed_b", "node"], "left")
        .select(
            "seed_a",
            "seed_b",
            F.when(
                F.coalesce(F.col("q"), F.lit(0.0)) <= eps, F.col("p") * gamma
            ).otherwise(F.col("p") * F.log2(F.col("p") / F.col("q"))).alias("term"),
        )
        .groupBy("seed_a", "seed_b")
        .agg(F.sum("term").alias("kl"))
    )
    return pairs.join(terms, ["seed_a", "seed_b"], "left").na.fill({"kl": gamma})


def signature_zero_kl(
    pairs: DataFrame,
    signatures: DataFrame,
    eps: float = 1e-6,
    gamma: float = 10.0,
) -> DataFrame:
    """Symmetrized ZeroKL semantic similarity between two seeds' PPR
    signatures (R7 — the reference's semSim, SemanticSignatureEL.java:806
    uses 1.0/ZeroKL(entity_sig, doc_sig); VectorSimilarity.java:87-104
    constants eps=1e-6, gamma=10).

    pairs: (seed_a, seed_b); signatures: (seed, node, rank).
    Returns (seed_a, seed_b, sig_kl) where sig_kl = 1/(1 + kl_sym),
    kl_sym = (KL(a||b) + KL(b||a)) / 2. Deviations from the reference,
    both deliberate: symmetrized (pair features have no preferred
    direction) and bounded to (0, 1] via 1/(1+kl) rather than the
    unbounded 1/kl (identical signatures would divide by zero); both
    are monotone transforms of the reference's score."""
    ab = _zero_kl_directed(pairs, signatures, eps, gamma)
    ba = _zero_kl_directed(
        pairs.select(F.col("seed_b").alias("seed_a"), F.col("seed_a").alias("seed_b")),
        signatures, eps, gamma,
    ).select(
        F.col("seed_b").alias("seed_a"), F.col("seed_a").alias("seed_b"),
        F.col("kl").alias("kl_ba"),
    )
    return (
        ab.join(ba, ["seed_a", "seed_b"])
        .select(
            "seed_a",
            "seed_b",
            (1.0 / (1.0 + (F.col("kl") + F.col("kl_ba")) / 2.0)).alias("sig_kl"),
        )
    )


def signature_features(
    pairs: DataFrame,
    signatures: DataFrame,
    eps: float = 1e-6,
    gamma: float = 10.0,
) -> DataFrame:
    """Fused R6+R7: ``sig_cosine`` AND symmetrized-ZeroKL ``sig_kl``
    from ONE pass over the pair-node join.

    ``signature_cosine`` + ``signature_zero_kl`` each materialize the
    (pair × signature-node) join — three times total (cosine once, KL
    once per direction). That join is the most voluminous intermediate
    of the feature stage (|pairs| × |signature| rows), so at scale the
    pipeline was paying its shuffle three times for numbers derivable
    from the same rows. Here one full-outer join per (pair, node)
    carries both sides' masses, and a single groupBy produces the dot
    product, both norms (each side's rows are complete within its
    group, so the per-group norm equals the global per-seed norm) and
    both directed ZeroKL sums — exact VectorSimilarity.java:22-43 +
    :87-104 term structure, one shuffle pyramid instead of three.

    Semantics are identical to composing the two single-feature kernels
    (parity-pinned in tests/test_ppr_cc.py): a pair with a missing
    signature on either side gets cosine 0; a missing side's directed
    KL is gamma (all mass unmatched); a pair missing both signatures
    falls out of the join entirely and is restored by the final left
    join with (0, 1/(1+gamma)). The standalone kernels remain the
    driver-oracle surface (r7_zero_kl) and the second-pass scorer.

    PRECONDITION: ``pairs`` must be DISTINCT on (seed_a, seed_b). A
    duplicated pair turns the full-outer join into a per-key cross
    product, QUADRATICALLY inflating the dot/norm/KL sums (worse than
    the standalone kernels, whose inflation is linear). The pipeline
    satisfies this by construction (``.distinct()`` before the call);
    external callers must too — the kernel does not re-distinct
    internally to avoid paying a redundant shuffle on the common path.
    """
    from wned_spark.functions.similarity import cosine_expr

    sa = signatures.select(
        F.col("seed").alias("seed_a"), "node", F.col("rank").alias("p")
    )
    sb = signatures.select(
        F.col("seed").alias("seed_b"), "node", F.col("rank").alias("q")
    )
    j = pairs.join(sa, "seed_a").join(
        pairs.join(sb, "seed_b"), ["seed_a", "seed_b", "node"], "full_outer"
    )
    p0 = F.coalesce(F.col("p"), F.lit(0.0))
    q0 = F.coalesce(F.col("q"), F.lit(0.0))
    # ZeroKL row terms (VectorSimilarity.java:87-104): skip absent p;
    # q missing-or-tiny contributes p*gamma, else p*log2(p/q)
    term_ab = (
        F.when(F.col("p").isNull(), F.lit(0.0))
        .when(q0 <= F.lit(eps), F.col("p") * F.lit(gamma))
        .otherwise(F.col("p") * F.log2(F.col("p") / F.col("q")))
    )
    term_ba = (
        F.when(F.col("q").isNull(), F.lit(0.0))
        .when(p0 <= F.lit(eps), F.col("q") * F.lit(gamma))
        .otherwise(F.col("q") * F.log2(F.col("q") / F.col("p")))
    )
    g = j.groupBy("seed_a", "seed_b").agg(
        F.sum(p0 * q0).alias("dot"),
        F.sqrt(F.sum(p0 * p0)).alias("norm_a"),
        F.sqrt(F.sum(q0 * q0)).alias("norm_b"),
        F.sum(term_ab).alias("kl_ab"),
        F.sum(term_ba).alias("kl_ba"),
        F.max(F.col("p").isNotNull().cast("int")).alias("has_a"),
        F.max(F.col("q").isNotNull().cast("int")).alias("has_b"),
    )
    kl_ab = F.when(F.col("has_a") == 1, F.col("kl_ab")).otherwise(F.lit(gamma))
    kl_ba = F.when(F.col("has_b") == 1, F.col("kl_ba")).otherwise(F.lit(gamma))
    return pairs.join(g, ["seed_a", "seed_b"], "left").select(
        "seed_a",
        "seed_b",
        F.when(F.col("dot").isNull(), F.lit(0.0))
        .otherwise(cosine_expr(F.col("dot"), F.col("norm_a"), F.col("norm_b")))
        .alias("sig_cosine"),
        (
            1.0
            / (
                1.0
                + (F.coalesce(kl_ab, F.lit(gamma)) + F.coalesce(kl_ba, F.lit(gamma)))
                / 2.0
            )
        ).alias("sig_kl"),
    )


def personalized_pagerank_broadcast(
    seeds: DataFrame,
    edges: DataFrame,
    cfg: ERConfig = ERConfig(),
    max_degree: int | None = None,
    csr_bc=None,
) -> DataFrame:
    """Broadcast-graph PPR: same semantics as ``personalized_pagerank``
    (alpha, 3 iterations, strongly-preferential dangling) computed by
    shipping the row-normalized transition matrix (CSR in plain numpy
    arrays) to every executor and fanning SEEDS out via mapInPandas.

    This is the reference's own architecture — one shared in-heap graph,
    per-seed parallel walks (WeightedPersonalizedPageRank.java:233-266) —
    re-expressed with Spark distributing the seed batches. It is the
    right plan whenever the DICTIONARY graph fits executor memory
    (10^8 edges ~ 2.4 GB), which holds far past 100 TB of input text;
    the join-based variant above remains the fallback for graphs that
    don't.

    Embarrassingly parallel: zero shuffles after the one-time broadcast;
    scaling is linear in cores.

    Driver memory is bounded by the numpy CSR arrays alone (~28 bytes
    per edge): the collect is Arrow-columnar (``toArrow`` → zero-copy
    numpy views, no pandas block consolidation, no Python row objects)
    and the node-id lookup is ``np.searchsorted`` over the sorted
    unique-id array — no Python dict of node ids is ever built (a 1e8-
    node dict alone would be ~10 GB of driver heap and would also ride
    the broadcast pickle).
    """
    import numpy as np
    import pandas as pd

    alpha = cfg.ppr_alpha
    bc = csr_bc if csr_bc is not None else _csr_broadcast(edges, max_degree)

    def run_batch(batches):
        n_, indptr_, dst_, p_, has_out_, rev_ = bc.value
        for pdf in batches:
            out_seed, out_node, out_rank = [], [], []
            for raw_seed in pdf["seed"]:
                raw_seed = int(raw_seed)
                pos = int(np.searchsorted(rev_, raw_seed))
                six = pos if pos < n_ and rev_[pos] == raw_seed else None
                if six is None or not has_out_[six]:
                    # isolated / dangling-only seed: fixed point at itself
                    out_seed.append(raw_seed)
                    out_node.append(raw_seed)
                    out_rank.append(1.0)
                    continue
                idx, val = _ppr_sparse(
                    bc.value,
                    np.array([six], dtype=np.int64),
                    np.array([1.0]),
                    alpha,
                    cfg.ppr_max_iter,
                )
                out_seed.extend([raw_seed] * len(idx))
                out_node.extend(rev_[idx].tolist())
                out_rank.extend(val.tolist())
            yield pd.DataFrame({"seed": out_seed, "node": out_node, "rank": out_rank})

    return seeds.select(F.col("seed").cast("long")).repartition(
        seeds.sparkSession.sparkContext.defaultParallelism
    ).mapInPandas(run_batch, schema="seed long, node long, rank double")


def _csr_collect(edges: DataFrame, max_degree: int | None):
    """Row-normalize, Arrow-collect and CSR-pack the transition matrix
    as driver numpy arrays: (n, indptr, dst, p, has_out, rev_ids).
    rev_ids is sorted — both the dense→original map and the
    searchsorted lookup table."""
    import numpy as np

    tarrow = normalize_transition(edges, max_degree=max_degree).toArrow()
    raw_src = tarrow.column("src").to_numpy().astype(np.int64, copy=False)
    raw_dst = tarrow.column("dst").to_numpy().astype(np.int64, copy=False)
    p = tarrow.column("p").to_numpy().astype(np.float64, copy=False)
    del tarrow
    uniq = np.unique(np.concatenate([raw_src, raw_dst]))
    n = len(uniq)
    src = np.searchsorted(uniq, raw_src)
    dst = np.searchsorted(uniq, raw_dst)
    order = np.argsort(src, kind="stable")
    src, dst, p = src[order], dst[order], p[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    has_out = np.zeros(n, dtype=bool)
    has_out[src] = True
    return (n, indptr, dst, p, has_out, uniq)


def _csr_broadcast(edges: DataFrame, max_degree: int | None):
    """`_csr_collect` + broadcast to executors."""
    sc = edges.sparkSession.sparkContext
    return sc.broadcast(_csr_collect(edges, max_degree))


def _ppr_sparse(csr, pidx, pval, alpha: float, iters: int):
    """Per-seed sparse power iteration against the CSR arrays, with an
    arbitrary preference vector (pidx dense-indices, pval weights;
    entries with index >= n are graph-absent: pure-dangling receivers
    of their own teleport mass). The accumulator stays sized by the
    frontier's nonzeros, never O(|V|)."""
    import numpy as np

    n_, indptr_, dst_, p_, _has_out, _rev = csr
    idx, val = pidx.copy(), pval.copy()
    for _ in range(iters):
        safe = np.minimum(idx, n_ - 1)
        counts = np.where(idx < n_, indptr_[safe + 1] - indptr_[safe], 0)
        dangling = float(val[counts == 0].sum())
        nz = counts > 0
        teleport = pval * ((1.0 - alpha) + alpha * dangling)
        if nz.any():
            starts = indptr_[idx[nz]]
            lens = counts[nz]
            flat = np.concatenate(
                [np.arange(s, s + l) for s, l in zip(starts, lens)]
            )
            cat_i = np.append(dst_[flat], pidx)
            cat_v = np.append(np.repeat(val[nz], lens) * p_[flat] * alpha, teleport)
            idx, inv = np.unique(cat_i, return_inverse=True)
            val = np.bincount(inv, weights=cat_v)
        else:
            idx, val = pidx.copy(), teleport
    return idx, val


def personalized_pagerank_pref_broadcast(
    preference: DataFrame,
    edges: DataFrame,
    cfg: ERConfig = ERConfig(),
    max_degree: int | None = None,
    csr_bc=None,
) -> DataFrame:
    """Broadcast-CSR variant of ``personalized_pagerank_pref`` (G6):
    one ``applyInPandas`` group per seed runs the whole walk in numpy
    against the shared transition matrix — zero shuffles per iteration
    versus ~3 for the join-based variant, the right plan whenever the
    dictionary graph fits executor memory. Semantics identical
    (strongly-preferential dangling; per-seed weight normalization);
    preference nodes absent from the graph hold pure-dangling mass."""
    import numpy as np
    import pandas as pd

    alpha = cfg.ppr_alpha
    iters = cfg.ppr_max_iter
    bc = csr_bc if csr_bc is not None else _csr_broadcast(edges, max_degree)

    def one_seed(pdf: pd.DataFrame) -> pd.DataFrame:
        csr = bc.value
        n_, _indptr, _dst, _p, _has_out, rev_ = csr
        seed = int(pdf["seed"].iloc[0])
        # aggregate duplicate (seed, node) input rows FIRST: a raw
        # duplicate absent node would otherwise get two distinct
        # virtual indices and emit two output rows with split rank,
        # diverging from the join-based variant's groupBy semantics
        nodes_raw = pdf["node"].to_numpy(dtype=np.int64)
        w_raw = pdf["w"].to_numpy(dtype=np.float64)
        nodes, inv0 = np.unique(nodes_raw, return_inverse=True)
        w = np.bincount(inv0, weights=w_raw)
        w = w / w.sum()
        pos = np.searchsorted(rev_, nodes)
        pos_safe = np.minimum(pos, n_ - 1)
        present = rev_[pos_safe] == nodes
        # graph-absent preference nodes get virtual indices >= n
        pidx = np.where(present, pos_safe, n_ + np.arange(len(nodes)))
        # de-dup preference nodes (defensive)
        pidx, inv = np.unique(pidx, return_inverse=True)
        pval = np.bincount(inv, weights=w)
        idx, val = _ppr_sparse(csr, pidx.astype(np.int64), pval, alpha, iters)
        # map dense indices back: virtual indices recover the raw node id
        absent_map = {int(n_ + k): int(nodes[k]) for k in range(len(nodes))}
        out_nodes = [
            int(rev_[i]) if i < n_ else absent_map[int(i)] for i in idx
        ]
        return pd.DataFrame(
            {"seed": seed, "node": out_nodes, "rank": val}
        )

    return (
        preference.select(
            F.col("seed").cast("long"), F.col("node").cast("long"), F.col("w")
        )
        .groupBy("seed")
        .applyInPandas(one_seed, schema="seed long, node long, rank double")
    )
