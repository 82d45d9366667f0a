"""Mention-level second pass for AMBIGUOUS surfaces (G6 + W5-style
argmax): the acronym case where one surface form names different
entities in different conversations, which surface-level clustering
cannot split by construction.

Mirrors the reference's document-signature disambiguation:
- a CONVERSATION SIGNATURE is a PPR walk from a preference vector
  uniform over the conversation's confident (non-ambiguous) surfaces
  (``ELUtils.java:59-94``);
- each candidate entity is represented by its best non-ambiguous
  surface present in the corpus (max prior — the alias-dict analog of
  the entity's canonical page) with its own indicator-seed signature;
- each ambiguous mention is assigned to the candidate entity whose
  representative signature is most similar to its conversation's
  signature (cosine argmax — ``SemanticSignatureEL.java:786-848``'s
  per-mention decision recast), and inherits that representative
  surface's first-pass cluster.

SCALE: everything here is sized by the AMBIGUOUS slice, not the
corpus — ambiguous surfaces are the alias-dictionary rows with >1
candidate entity (a tiny dictionary subset); only conversations
containing them get signatures; the second PPR batch has one seed per
such conversation plus one per candidate representative. At 10^12
turns this remains a small side-pipeline joined back by mention_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wned_spark.config import ERConfig
from wned_spark.operators import ppr


def ambiguous_surfaces(cands: DataFrame) -> DataFrame:
    """Surfaces whose candidate set spans >1 entity: (sid). cands:
    (sid, entity_id, source, prior) from candidates.select_candidates."""
    return (
        cands.groupBy("sid")
        .agg(F.countDistinct("entity_id").alias("n_ents"))
        .filter(F.col("n_ents") > 1)
        .select("sid")
    )


def entity_rep_surfaces(cands: DataFrame, amb: DataFrame) -> DataFrame:
    """(entity_id, rep_sid): for every candidate entity of an ambiguous
    surface, its highest-prior NON-ambiguous surface present in the
    corpus (deterministic tiebreak on sid)."""
    ents = (
        cands.join(amb, "sid", "left_semi").select("entity_id").distinct()
    )
    unambiguous = cands.join(amb, "sid", "left_anti")
    w = Window.partitionBy("entity_id").orderBy(F.desc("prior"), F.asc("sid"))
    return (
        unambiguous.join(ents, "entity_id", "left_semi")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("entity_id", F.col("sid").alias("rep_sid"))
    )


def second_pass_overrides(
    mentions: DataFrame,
    cands: DataFrame,
    edges: DataFrame,
    surface_clusters: DataFrame,
    cfg: ERConfig = ERConfig(),
    n_edges: int | None = None,
) -> DataFrame:
    """(mention_id, cluster_id) overrides for mentions of ambiguous
    surfaces. Mentions with no resolvable signal (no confident
    co-mentions in the conversation, or no representative signature
    overlap) are left out — callers coalesce with the first-pass
    assignment. ``n_edges`` lets the caller reuse an already-computed
    edge count (the strategy probe is otherwise one more serial job)."""
    key_col = "canon_norm" if "canon_norm" in mentions.columns else "surface_norm"
    m = mentions.select(
        "mention_id",
        "conv_id",
        F.xxhash64(F.col(key_col)).alias("sid"),
    )
    amb = ambiguous_surfaces(cands)
    if amb.isEmpty():
        # no surface has >1 candidate entity: decide from the
        # DICTIONARY alone, before any corpus-sized work — the
        # amb_mentions probe below would join the full mentions table
        # just to learn the same thing. On unambiguous corpora this
        # makes the whole second pass dictionary-sized.
        return mentions.sparkSession.createDataFrame(
            [], "mention_id long, cluster_id long"
        )

    amb_mentions = m.join(amb, "sid", "left_semi").persist()
    reps = None
    try:
        if amb_mentions.isEmpty():
            # ambiguous dictionary rows exist but none occur in the
            # corpus: skip the side-pipeline (otherwise the CSR
            # broadcast of the full edge set is built for nothing)
            return amb_mentions.sparkSession.createDataFrame(
                [], "mention_id long, cluster_id long"
            )
        reps = entity_rep_surfaces(cands, amb).persist()
        out = _second_pass_body(
            m, amb, amb_mentions, reps, cands, edges, surface_clusters, cfg,
            n_edges=n_edges,
        )
        # materialize the (tiny — one row per re-pointed mention)
        # override table before the finally releases the caches it
        # reads, so they never outlive the call and repeated pipeline
        # runs in one session don't accumulate executor cache
        out = out.localCheckpoint(eager=False)
        out.count()
        return out
    finally:
        amb_mentions.unpersist()
        if reps is not None:
            reps.unpersist()


def _second_pass_best_local(spark, edges, pref_tbl, trial_tbl, cfg):
    """Driver-numpy computation of the per-(conversation, surface)
    best representative — semantics identical to the distributed path:
    conversation signatures via preference-vector PPR (duplicate nodes
    aggregated, graph-absent nodes as pure-dangling virtual indices),
    representative signatures via single-seed PPR (isolated seeds fix
    at themselves), cosine over shared nodes, argmax gated on
    cosine > 0 with (desc cosine, asc entity_id) tiebreak."""
    import numpy as np

    from wned_spark.operators import ppr

    csr = ppr._csr_collect(edges, cfg.ppr_max_degree)
    n_, _indptr, _dst, _p, has_out, rev = csr
    alpha, iters = cfg.ppr_alpha, cfg.ppr_max_iter

    sigs: dict = {}

    def _store(key, idx, val, virt_map=None):
        # map dense indices back to original node ids
        nodes = np.where(
            idx < n_,
            rev[np.minimum(idx, n_ - 1)],
            np.array([virt_map.get(int(i), -1) for i in idx]) if virt_map else -1,
        )
        order = np.argsort(nodes)
        sigs[key] = (nodes[order], val[order])

    # conversation signatures (preference-vector PPR)
    p_seed = pref_tbl.column("seed").to_numpy().astype(np.int64, copy=False)
    p_node = pref_tbl.column("node").to_numpy().astype(np.int64, copy=False)
    p_w = pref_tbl.column("w").to_numpy().astype(np.float64, copy=False)
    for seed in np.unique(p_seed):
        m_ = p_seed == seed
        nodes, inv0 = np.unique(p_node[m_], return_inverse=True)
        w = np.bincount(inv0, weights=p_w[m_])
        w = w / w.sum()
        pos = np.searchsorted(rev, nodes)
        pos_safe = np.minimum(pos, n_ - 1)
        present = (pos < n_) & (rev[pos_safe] == nodes)
        pidx = np.where(present, pos_safe, n_ + np.arange(len(nodes)))
        virt_map = {int(n_ + k): int(nodes[k]) for k in range(len(nodes))}
        idx, val = ppr._ppr_sparse(csr, pidx.astype(np.int64), w, alpha, iters)
        _store(int(seed), idx, val, virt_map)

    # representative signatures (single-seed PPR)
    t_conv = trial_tbl.column("conv_id").to_pylist()
    t_seed = trial_tbl.column("seed_a").to_numpy().astype(np.int64, copy=False)
    t_sid = trial_tbl.column("sid").to_numpy().astype(np.int64, copy=False)
    t_ent = trial_tbl.column("entity_id").to_numpy().astype(np.int64, copy=False)
    t_rep = trial_tbl.column("rep_sid").to_numpy().astype(np.int64, copy=False)
    for rep in np.unique(t_rep):
        pos = int(np.searchsorted(rev, rep))
        six = pos if pos < n_ and rev[pos] == rep else None
        if six is None or not has_out[six]:
            sigs[int(rep)] = (np.array([rep], dtype=np.int64), np.array([1.0]))
            continue
        idx, val = ppr._ppr_sparse(
            csr, np.array([six], dtype=np.int64), np.array([1.0]), alpha, iters
        )
        _store(int(rep), idx, val)

    def _cos(a, b):
        ia, va = sigs.get(a, (np.empty(0, np.int64), np.empty(0)))
        ib, vb = sigs.get(b, (np.empty(0, np.int64), np.empty(0)))
        if not len(ia) or not len(ib):
            return 0.0
        _common, ca, cb = np.intersect1d(ia, ib, assume_unique=True, return_indices=True)
        if not len(ca):
            return 0.0
        na = float(np.sqrt((va * va).sum()))
        nb = float(np.sqrt((vb * vb).sum()))
        if na == 0.0 or nb == 0.0:
            return 0.0
        return float((va[ca] * vb[cb]).sum()) / (na * nb)

    # argmax per (conv_id, sid): cosine > 0, desc cosine / asc entity_id
    best: dict = {}
    for i in range(len(t_conv)):
        c = _cos(int(t_seed[i]), int(t_rep[i]))
        if c <= 0.0:
            continue
        key = (t_conv[i], int(t_sid[i]))
        cur = best.get(key)
        cand = (-c, int(t_ent[i]), int(t_rep[i]))
        if cur is None or cand < cur:
            best[key] = cand
    rows = [(k[0], k[1], v[2]) for k, v in best.items()]
    return spark.createDataFrame(rows, "conv_id string, sid long, rep_sid long")


def _second_pass_body(
    m, amb, amb_mentions, reps, cands, edges, surface_clusters, cfg, n_edges=None
):
    # conversations that need a signature
    convs = amb_mentions.select("conv_id").distinct()
    # confident co-mentions: non-ambiguous surfaces in those conversations
    confident = (
        m.join(convs, "conv_id", "left_semi")
        .join(amb, "sid", "left_anti")
        .select("conv_id", "sid")
        .distinct()
    )
    preference = confident.select(
        F.xxhash64("conv_id").alias("seed"), F.col("sid").alias("node"), F.lit(1.0).alias("w")
    )

    if n_edges is None:
        n_edges = edges.count()

    # DRIVER FAST PATH: the ambiguous slice is usually dictionary-sized
    # (tens of conversations × a handful of surfaces), yet the
    # distributed plan costs ~12 small stages (two mapInPandas PPR
    # chains, a union, a three-way cosine join, two windows) — ~15 s of
    # pure stage orchestration for a 17-row override table at 720k
    # turns. When the graph fits the broadcast cap AND the preference/
    # trial tables are small, compute `best` entirely in numpy with the
    # SAME kernels the executors run (_csr_collect + _ppr_sparse) —
    # parity-pinned against the distributed path.
    cap = cfg.second_pass_local_max_rows
    if cap > 0 and n_edges <= cfg.ppr_broadcast_max_edges:
        trial_small = (
            amb_mentions.join(
                cands.join(amb, "sid", "left_semi").select("sid", "entity_id"), "sid"
            )
            .join(reps, "entity_id")
            .select("conv_id", "sid", "entity_id", "rep_sid")
            .distinct()
            .withColumn("seed_a", F.xxhash64("conv_id"))
        )
        # the size gate must run BEFORE any collect: limit(cap+1).count()
        # is one cheap bounded job, so a multi-million-row preference/
        # trial table is never shipped to the driver just to be rejected
        if (
            preference.limit(cap + 1).count() <= cap
            and trial_small.limit(cap + 1).count() <= cap
        ):
            pref_tbl = preference.toArrow()
            trial_tbl = trial_small.toArrow()
            best = _second_pass_best_local(
                amb_mentions.sparkSession, edges, pref_tbl, trial_tbl, cfg
            )
            return (
                amb_mentions.join(best, ["conv_id", "sid"])
                .join(
                    surface_clusters.select(F.col("sid").alias("rep_sid"), "cluster_id"),
                    "rep_sid",
                )
                .select("mention_id", "cluster_id")
            )

    # one batched PPR for the conversation preference vectors, one for
    # the representative indicator seeds (both tiny seed sets); same
    # broadcast-vs-join gate as the main pipeline — the broadcast CSR
    # path runs each walk shuffle-free, which matters here because the
    # join-based variant costs ~3 barriered shuffles per iteration on a
    # side-pipeline that is usually tiny
    rep_seeds = reps.select(F.col("rep_sid").alias("seed")).distinct()
    if n_edges <= cfg.ppr_broadcast_max_edges:
        # ONE shared CSR broadcast: both walks read the same transition
        # matrix; building it twice doubles the normalize+collect cost
        bc = ppr._csr_broadcast(edges, cfg.ppr_max_degree)
        conv_sigs = ppr.personalized_pagerank_pref_broadcast(
            preference, edges, cfg, max_degree=cfg.ppr_max_degree, csr_bc=bc
        )
        rep_sigs = ppr.personalized_pagerank_broadcast(
            rep_seeds, edges, cfg, max_degree=cfg.ppr_max_degree, csr_bc=bc
        )
    else:
        conv_sigs = ppr.personalized_pagerank_pref(
            preference, edges, cfg, max_degree=cfg.ppr_max_degree
        )
        rep_sigs = ppr.personalized_pagerank(
            rep_seeds, edges, cfg, check_delta=False, symmetric=True,
            max_degree=cfg.ppr_max_degree,
        )
    sigs = conv_sigs.union(rep_sigs.select("seed", "node", "rank"))

    # candidate (conversation, entity-rep) pairs per ambiguous mention
    cand_ents = cands.join(amb, "sid", "left_semi").select("sid", "entity_id")
    trial = (
        amb_mentions.join(cand_ents, "sid")
        .join(reps, "entity_id")
        .select("conv_id", "sid", "entity_id", "rep_sid")
        .distinct()
        .withColumn("seed_a", F.xxhash64("conv_id"))
    )
    cos = ppr.signature_cosine(
        trial.select(F.col("seed_a"), F.col("rep_sid").alias("seed_b")).distinct(),
        sigs,
    )
    scored = trial.join(
        cos,
        (trial["seed_a"] == cos["seed_a"]) & (trial["rep_sid"] == cos["seed_b"]),
    ).select("conv_id", "sid", "entity_id", "rep_sid", "sig_cosine")

    # argmax candidate per (conversation, ambiguous surface); zero
    # similarity everywhere -> no override (no signal)
    w = Window.partitionBy("conv_id", "sid").orderBy(
        F.desc("sig_cosine"), F.asc("entity_id")
    )
    best = (
        scored.filter(F.col("sig_cosine") > 0)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("conv_id", "sid", "rep_sid")
    )
    return (
        amb_mentions.join(best, ["conv_id", "sid"])
        .join(
            surface_clusters.select(F.col("sid").alias("rep_sid"), "cluster_id"),
            "rep_sid",
        )
        .select("mention_id", "cluster_id")
    )
