"""PPR vs a numpy power-iteration oracle; connected components vs a
pure-python union-find oracle (FIXTURES.md F6)."""

import random

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Row

from wned_spark.config import ERConfig
from wned_spark.operators.cc import connected_components
from wned_spark.operators.ppr import personalized_pagerank, signature_cosine


def _numpy_ppr(edges, seeds, n_nodes, alpha=0.85, iters=3):
    """Oracle replicating the exact update rule:
    r' = alpha * P^T r + e_seed * ((1-alpha) + alpha * dangling_mass)."""
    P = np.zeros((n_nodes, n_nodes))
    for s, d, w in edges:
        P[s, d] = w
    row_sums = P.sum(axis=1)
    out = {}
    for seed in seeds:
        r = np.zeros(n_nodes)
        r[seed] = 1.0
        for _ in range(iters):
            spread = np.zeros(n_nodes)
            dangling = 0.0
            for s in range(n_nodes):
                if row_sums[s] > 0:
                    spread += alpha * r[s] * P[s] / row_sums[s]
                else:
                    dangling += r[s]
            spread[seed] += (1 - alpha) + alpha * dangling
            r = spread
        out[seed] = r
    return out


def test_ppr_matches_numpy_oracle(spark):
    rng = random.Random(4)
    n = 12
    edge_list = []
    seen = set()
    for _ in range(30):
        s, d = rng.randrange(n), rng.randrange(n)
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            edge_list.append((s, d, float(rng.randint(1, 5))))
    # node 11 left dangling on purpose
    edge_list = [(s, d, w) for s, d, w in edge_list if s != 11]
    edges = spark.createDataFrame(
        [Row(src=s, dst=d, weight=w) for s, d, w in edge_list]
    )
    seeds = spark.createDataFrame([Row(seed=0), Row(seed=5), Row(seed=11)])
    cfg = ERConfig(ppr_max_iter=3)
    got = personalized_pagerank(seeds, edges, cfg, check_delta=False).collect()
    oracle = _numpy_ppr(edge_list, [0, 5, 11], n)
    for r in got:
        assert abs(r["rank"] - oracle[r["seed"]][r["node"]]) < 1e-9, (r, oracle[r["seed"]][r["node"]])
    # mass conservation: each signature sums to 1
    gm = {}
    for r in got:
        gm[r["seed"]] = gm.get(r["seed"], 0.0) + r["rank"]
    for seed, total in gm.items():
        assert abs(total - 1.0) < 1e-9


def test_signature_cosine_self_is_one(spark):
    sigs = spark.createDataFrame(
        [Row(seed=1, node=1, rank=0.5), Row(seed=1, node=2, rank=0.5),
         Row(seed=2, node=1, rank=0.5), Row(seed=2, node=2, rank=0.5),
         Row(seed=3, node=9, rank=1.0)]
    )
    pairs = spark.createDataFrame([Row(seed_a=1, seed_b=2), Row(seed_a=1, seed_b=3)])
    out = {(r["seed_a"], r["seed_b"]): r["sig_cosine"] for r in signature_cosine(pairs, sigs).collect()}
    assert abs(out[(1, 2)] - 1.0) < 1e-12
    assert out[(1, 3)] == 0.0


def _union_find_components(n, edges):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    groups = {}
    for x in range(n):
        groups.setdefault(find(x), set()).add(x)
    return {frozenset(g) for g in groups.values() if len(g) > 1}


def test_connected_components_vs_union_find(spark):
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = 60
        edge_list = {(rng.randrange(n), rng.randrange(n)) for _ in range(45)}
        edge_list = [(u, v) for u, v in edge_list if u != v]
        df = spark.createDataFrame([Row(u=u, v=v) for u, v in edge_list])
        comp = connected_components(df).collect()
        groups = {}
        for r in comp:
            groups.setdefault(r["component"], set()).add(r["node"])
            groups[r["component"]].add(r["component"])
        got = {frozenset(g) for g in groups.values() if len(g) > 1}
        want = _union_find_components(n, edge_list)
        assert got == want, f"seed={seed}"


def test_connected_components_min_id_convention(spark):
    df = spark.createDataFrame([Row(u=5, v=3), Row(u=3, v=9), Row(u=100, v=50)])
    comp = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert comp[5] == 3 and comp[9] == 3 and comp[3] == 3
    assert comp[100] == 50 and comp[50] == 50


def test_ppr_broadcast_matches_join_based(spark):
    """The broadcast-graph PPR must agree with the join-based variant
    (and thus the numpy oracle) on random graphs, including dangling
    and isolated seeds."""
    from wned_spark.operators.ppr import personalized_pagerank_broadcast

    rng = random.Random(9)
    n = 20
    edge_list = []
    seen = set()
    for _ in range(50):
        s, d = rng.randrange(n), rng.randrange(n)
        if s != d and (s, d) not in seen:
            seen.add((s, d))
            edge_list.append((s, d, float(rng.randint(1, 5))))
    edge_list = [(s, d, w) for s, d, w in edge_list if s != 19]  # dangling 19
    edges = spark.createDataFrame(
        [Row(src=s, dst=d, weight=w) for s, d, w in edge_list]
    )
    seeds = spark.createDataFrame([Row(seed=i) for i in [0, 3, 19, 77]])  # 77 isolated
    cfg = ERConfig(ppr_max_iter=3)
    ref = {(r["seed"], r["node"]): r["rank"]
           for r in personalized_pagerank(seeds, edges, cfg, check_delta=False).collect()}
    got = {(r["seed"], r["node"]): r["rank"]
           for r in personalized_pagerank_broadcast(seeds, edges, cfg).collect()}
    # broadcast variant treats a dangling SEED as a fixed point at
    # itself, which equals the strongly-preferential stationary rule
    # for a node with no out-edges
    assert set(got) >= {k for k in ref if abs(ref[k]) > 1e-12}
    for k, v in ref.items():
        if abs(v) > 1e-12:
            assert abs(got[k] - v) < 1e-9, (k, v, got.get(k))


def test_signature_zero_kl_matches_numpy(spark):
    """Relational ZeroKL (R7) vs a direct numpy transcription of
    VectorSimilarity.java:87-104 (eps=1e-6, gamma=10, base-2 log)."""
    from wned_spark.operators.ppr import signature_zero_kl

    eps, gamma = 1e-6, 10.0
    sigs = {
        1: {10: 0.6, 11: 0.3, 12: 0.1},
        2: {10: 0.5, 11: 0.5},
        3: {12: 1.0},
    }

    def np_kl(p, q):
        out = 0.0
        for node, pv in p.items():
            qv = q.get(node, 0.0)
            out += pv * gamma if qv <= eps else pv * np.log2(pv / qv)
        return out

    rows = [Row(seed=s, node=n_, rank=r)
            for s, d in sigs.items() for n_, r in d.items()]
    pair_rows = [Row(seed_a=1, seed_b=2), Row(seed_a=1, seed_b=3), Row(seed_a=2, seed_b=3)]
    got = {
        (r["seed_a"], r["seed_b"]): r["sig_kl"]
        for r in signature_zero_kl(
            spark.createDataFrame(pair_rows), spark.createDataFrame(rows),
            eps=eps, gamma=gamma,
        ).collect()
    }
    for a, b in [(1, 2), (1, 3), (2, 3)]:
        expected = 1.0 / (1.0 + (np_kl(sigs[a], sigs[b]) + np_kl(sigs[b], sigs[a])) / 2.0)
        assert abs(got[(a, b)] - expected) < 1e-12, (a, b)


def test_signature_zero_kl_identical_is_one(spark):
    from wned_spark.operators.ppr import signature_zero_kl

    rows = [Row(seed=s, node=n_, rank=r)
            for s in (1, 2) for n_, r in [(10, 0.7), (11, 0.3)]]
    out = signature_zero_kl(
        spark.createDataFrame([Row(seed_a=1, seed_b=2)]),
        spark.createDataFrame(rows),
    ).first()
    assert abs(out["sig_kl"] - 1.0) < 1e-12


def test_signature_features_matches_single_kernels(spark):
    """The fused one-pass kernel (sig_cosine + sig_kl together) must
    equal composing signature_cosine and signature_zero_kl on random
    signatures — including pairs missing one or both signatures, the
    cases where the single kernels' fill/drop semantics differ most."""
    from wned_spark.operators.ppr import (
        signature_cosine,
        signature_features,
        signature_zero_kl,
    )

    rng = random.Random(17)
    n_seeds, n_nodes = 12, 15
    rows = []
    for s in range(n_seeds - 2):  # seeds 10, 11 have NO signature
        nodes = rng.sample(range(n_nodes), rng.randint(1, 6))
        ws = [rng.random() for _ in nodes]
        tot = sum(ws)
        rows += [Row(seed=s, node=n_, rank=w / tot) for n_, w in zip(nodes, ws)]
    pair_rows = [
        Row(seed_a=a, seed_b=b)
        for a in range(n_seeds)
        for b in range(n_seeds)
        if a < b and rng.random() < 0.5
    ]
    # force the degenerate corners into the sample
    pair_rows += [Row(seed_a=0, seed_b=10), Row(seed_a=10, seed_b=1),
                  Row(seed_a=10, seed_b=11)]
    sigs = spark.createDataFrame(rows)
    pairs = spark.createDataFrame(pair_rows).distinct()

    fused = {
        (r["seed_a"], r["seed_b"]): (r["sig_cosine"], r["sig_kl"])
        for r in signature_features(pairs, sigs).collect()
    }
    cos = {
        (r["seed_a"], r["seed_b"]): r["sig_cosine"]
        for r in signature_cosine(pairs, sigs).collect()
    }
    kl = {
        (r["seed_a"], r["seed_b"]): r["sig_kl"]
        for r in signature_zero_kl(pairs, sigs).collect()
    }
    assert set(fused) == {(r["seed_a"], r["seed_b"]) for r in pair_rows}
    for key, (c_f, k_f) in fused.items():
        # cosine: the standalone kernel DROPS pairs with a missing-side
        # norm; the pipeline refills them with 0.0 — fused emits the 0
        assert abs(c_f - cos.get(key, 0.0)) < 1e-9, key
        assert abs(k_f - kl[key]) < 1e-9, key


def test_surface_context_weights_and_cosine(spark):
    """ctx feature source: two surfaces sharing context terms score
    higher than two that don't; weights match the Lucene tf-idf form."""
    from wned_spark.operators.tfidf import pairwise_cosine, surface_context_weights

    transcripts = spark.createDataFrame(
        [
            ("c1", 0, "alpha beta invoice shipment"),
            ("c1", 1, "alpha beta contract renewal"),
            ("c2", 0, "gamma delta warehouse pallet"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    mentions = spark.createDataFrame(
        [
            ("c1", 0, "s one"),
            ("c1", 1, "s two"),
            ("c2", 0, "s three"),
        ],
        "conv_id string, turn_idx int, surface_norm string",
    )
    w = surface_context_weights(mentions, transcripts, window_turns=1)
    sid = {r["sn"]: r["sid"] for r in mentions.select(
        F.col("surface_norm").alias("sn"),
        F.xxhash64("surface_norm").alias("sid")).distinct().collect()}
    pairs = spark.createDataFrame(
        [Row(left_sid=sid["s one"], right_sid=sid["s two"]),
         Row(left_sid=sid["s one"], right_sid=sid["s three"])],
    )
    got = {(r["left_sid"], r["right_sid"]): r["ctx_cosine"]
           for r in pairwise_cosine(pairs, w, doc_col="sid",
                                    left_col="left_sid", right_col="right_sid").collect()}
    same_conv = got[(sid["s one"], sid["s two"])]
    diff_conv = got[(sid["s one"], sid["s three"])]
    assert same_conv > 0.5
    assert diff_conv == 0.0


def test_expand_subgraph_with_keep_connected_fallback(spark):
    """G1 pinned semantics (SubGraphGenerator.java:105-188): neighbors
    pass a degree floor; a seed none of whose neighbors passed keeps ALL
    its neighbors (lines 160-175); induced edges need both ends member
    and a seed on at least one end (lines 176-188).

    Hand oracle: undirected graph 1-2, 1-3, 2-4, 2-3, 10-11 (degrees
    1:2, 2:3, 3:2, 4:1, 10:1, 11:1), seeds {1, 10}, floor 2.
    Seed 1's neighbors {2, 3} both pass; seed 10's neighbor 11 fails
    the floor -> keep-connected rescue adds it anyway. Induced edges:
    1-2, 1-3, 10-11 (2-3 has no seed end; 2-4 leaves the member set).
    """
    from wned_spark.operators.graph import expand_subgraph

    und = [(1, 2), (1, 3), (2, 4), (2, 3), (10, 11)]
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in und] + [(b, a, 1.0) for a, b in und],
        "src long, dst long, weight double",
    )
    seeds = spark.createDataFrame([(1,), (10,)], "nid long")
    got = sorted(
        (r["src"], r["dst"])
        for r in expand_subgraph(seeds, edges, levels=1, degree_floor=2).collect()
    )
    expected = sorted(
        [(1, 2), (2, 1), (1, 3), (3, 1), (10, 11), (11, 10)]
    )
    assert got == expected


def test_pref_ppr_broadcast_matches_join_based(spark):
    """G6 broadcast path ≡ join-based preference PPR, including a
    preference node absent from the graph (pure-dangling holder)."""
    from wned_spark.operators.ppr import (
        personalized_pagerank_pref, personalized_pagerank_pref_broadcast,
    )

    rng = random.Random(11)
    und = set()
    while len(und) < 25:
        a, b = rng.randrange(12), rng.randrange(12)
        if a != b:
            und.add((min(a, b), max(a, b)))
    rows = [(a, b, float(1 + rng.randrange(3))) for a, b in und]
    edges = spark.createDataFrame(
        rows + [(b, a, w) for a, b, w in rows], "src long, dst long, weight double"
    )
    pref = spark.createDataFrame(
        [
            (100, 0, 1.0), (100, 3, 1.0), (100, 7, 2.0),
            (200, 5, 1.0), (200, 999, 1.0),  # 999 absent from the graph
        ],
        "seed long, node long, w double",
    )
    cfg = ERConfig()
    a = {
        (r["seed"], r["node"]): r["rank"]
        for r in personalized_pagerank_pref(pref, edges, cfg).collect()
    }
    b = {
        (r["seed"], r["node"]): r["rank"]
        for r in personalized_pagerank_pref_broadcast(pref, edges, cfg).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, k
    # mass conservation per seed
    for seed in (100, 200):
        assert abs(sum(v for (s, _n), v in a.items() if s == seed) - 1.0) < 1e-6


def test_connected_components_auto_matches_distributed(spark):
    from wned_spark.operators.cc import connected_components, connected_components_auto

    rng = random.Random(13)
    edges = []
    for _ in range(60):
        a, b = rng.randrange(40), rng.randrange(40)
        if a != b:
            edges.append((a, b))
    df = spark.createDataFrame(edges, "u long, v long")
    d1 = {r["node"]: r["component"] for r in connected_components(df).collect()}
    d2 = {r["node"]: r["component"] for r in connected_components_auto(df).collect()}
    assert d1 == d2


def test_ppr_auto_matches_join_on_g3_graph(spark):
    """r07: the g3 registry row routes through the size-gated
    ``personalized_pagerank_auto``. Pin the broadcast-CSR branch against
    the join-based iteration on the EXACT registry graph (the nation
    co-membership clique — identical at every SF) at the row's own
    rounding (9 dp), as full row-set equality."""
    from pyspark.sql import functions as F

    from wned_spark.operators.ppr import (
        personalized_pagerank,
        personalized_pagerank_auto,
    )

    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    a, b = n.alias("a"), n.alias("b")
    edges = a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") != F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_nationkey").cast("long").alias("src"),
        F.col("b.n_nationkey").cast("long").alias("dst"),
        F.lit(1.0).alias("weight"),
    )
    seeds = (
        n.groupBy("n_regionkey")
        .agg(F.min("n_nationkey").cast("long").alias("seed"))
        .select("seed")
    )
    cfg = ERConfig(ppr_max_iter=3)

    def rows(df):
        return {
            (r["seed"], r["node"]): round(r["rank"], 9) for r in df.collect()
        }

    ref = rows(personalized_pagerank(seeds, edges, cfg, check_delta=False))
    got = rows(personalized_pagerank_auto(seeds, edges, cfg, check_delta=False))
    assert got == ref
