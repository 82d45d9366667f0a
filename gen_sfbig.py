#!/usr/bin/env python
"""Measurement-only synthetic large-scale table generator (round 7).

The driver's round-6 MEASUREMENT ran at sf=1.0 on driver-generated
tables that are no longer on disk (``/root/testdata`` holds only
sf0.001/0.01/0.1 and is read-only). To validate that round-7
optimizations hold at the driver's scale, this script emits a
*distribution-matched* 10x extrapolation of ``/root/testdata/sf0.1``
into ``/root/sfbig/sf1.0`` (schemas identical, key ranges/cardinalities
scaled 10x, value distributions fit from sf0.1 — doc text from the
per-language empirical unigram model + ~1% planted near-duplicates,
embeddings from the per-label gaussian fit).

It is NOT driver data and is never used for correctness oracles — only
as the input for local perf measurement (`SPARK_GRAFT_SF_DIR=/root/sfbig/sf1.0`).
Deterministic (numpy PCG64 seed 7). Pure pandas/pyarrow; no Spark.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
DST = "/root/sfbig/sf1.0"
SCALE = 10
SEED = 7


def write(df: pd.DataFrame, name: str) -> None:
    path = f"{DST}/{name}.parquet"
    df.to_parquet(path, index=False)
    print(f"{name}: {len(df)} rows -> {path}", flush=True)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    rng = np.random.default_rng(SEED)
    import duckdb

    con = duckdb.connect()

    # ---- fixed-size dimensions: copy verbatim ----
    for t in ("region", "nation"):
        df = con.execute(f"select * from parquet_scan('{SRC}/{t}.parquet')").df()
        write(df, t)

    n_cust, n_supp, n_part = 15000 * SCALE, 1000 * SCALE, 20000 * SCALE
    n_orders, n_li = 150000 * SCALE, 600000 * SCALE
    n_events, n_docs, n_emb = 100000 * SCALE, 5000 * SCALE, 2000 * SCALE

    # ---- customer / supplier / part ----
    seg = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
    write(
        pd.DataFrame(
            {
                "c_custkey": np.arange(n_cust, dtype=np.int64),
                "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
                "c_nationkey": rng.integers(0, 25, n_cust, dtype=np.int32),
                "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
                "c_mktsegment": rng.choice(seg, n_cust),
            }
        ),
        "customer",
    )
    write(
        pd.DataFrame(
            {
                "s_suppkey": np.arange(n_supp, dtype=np.int64),
                "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
                "s_nationkey": rng.integers(0, 25, n_supp, dtype=np.int32),
                "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
            }
        ),
        "supplier",
    )
    adjs = ["large", "hot", "blue", "small", "red", "green", "cold", "dim"]
    nouns = ["ring", "bolt", "nut", "gear", "tube", "cap", "rod", "pin"]
    ptypes = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO", "MEDIUM"]
    write(
        pd.DataFrame(
            {
                "p_partkey": np.arange(n_part, dtype=np.int64),
                "p_name": [
                    f"{adjs[i % 8]} {nouns[(i // 8) % 8]}" for i in range(n_part)
                ],
                "p_brand": [f"Brand#{i % 25}" for i in range(n_part)],
                "p_type": rng.choice(ptypes, n_part),
                "p_size": rng.integers(1, 51, n_part, dtype=np.int32),
                "p_retailprice": np.round(rng.uniform(900, 2100, n_part), 2),
            }
        ),
        "part",
    )

    # ---- orders / lineitem ----
    day = np.timedelta64(86400, "s")
    t0 = np.datetime64("1995-01-01")
    odate = t0 + rng.integers(0, 2404, n_orders) * day
    write(
        pd.DataFrame(
            {
                "o_orderkey": np.arange(n_orders, dtype=np.int64),
                "o_custkey": rng.integers(0, n_cust, n_orders),
                "o_orderstatus": rng.choice(["O", "P", "F"], n_orders),
                "o_totalprice": np.round(rng.uniform(1000, 400000, n_orders), 2),
                "o_orderdate": odate,
                "o_orderpriority": rng.choice(
                    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
                    n_orders,
                ),
            }
        ),
        "orders",
    )
    lkey = rng.integers(0, n_orders, n_li)
    lkey.sort()
    write(
        pd.DataFrame(
            {
                "l_orderkey": lkey,
                "l_partkey": rng.integers(0, n_part, n_li),
                "l_suppkey": rng.integers(0, n_supp, n_li),
                "l_linenumber": rng.integers(1, 8, n_li, dtype=np.int32),
                "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
                "l_extendedprice": np.round(rng.uniform(900, 105000, n_li), 2),
                "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
                "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
                "l_returnflag": rng.choice(["A", "N", "R"], n_li),
                "l_linestatus": rng.choice(["O", "F"], n_li),
                "l_shipdate": odate[lkey] + rng.integers(1, 95, n_li) * day,
            }
        ),
        "lineitem",
    )

    # ---- events ----
    e0 = np.datetime64("2024-01-01", "us")
    write(
        pd.DataFrame(
            {
                "event_id": np.arange(n_events, dtype=np.int64),
                "ts": e0 + rng.integers(0, 30 * 86400 * 10**6, n_events).astype(
                    "timedelta64[us]"
                ),
                "user_id": rng.integers(0, 1500 * SCALE, n_events),
                "event_type": rng.choice(
                    ["signup", "click", "error", "view", "purchase"], n_events
                ),
                "value": np.round(rng.uniform(0, 100, n_events), 4),
                "props": [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_events)],
            }
        ),
        "events",
    )

    # ---- documents: per-language empirical unigram model from sf0.1 ----
    src_docs = con.execute(
        f"select lang, source, text from parquet_scan('{SRC}/documents.parquet')"
    ).df()
    by_lang: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    for lang, grp in src_docs.groupby("lang"):
        toks = [w for t in grp["text"] for w in str(t).split()]
        vocab, counts = np.unique(toks, return_counts=True)
        lens = np.array([len(str(t).split()) for t in grp["text"]])
        by_lang[lang] = (vocab, counts / counts.sum(), lens)
    langs = src_docs["lang"].to_numpy()
    sources = src_docs["source"].to_numpy()
    pick = rng.integers(0, len(src_docs), n_docs)
    texts: list[str] = []
    doc_langs: list[str] = []
    doc_srcs: list[str] = []
    for i in range(n_docs):
        lang = langs[pick[i]]
        vocab, p, lens = by_lang[lang]
        if i % 100 == 99 and i >= 100:
            # planted near-duplicate (~1%): copy an earlier doc of this
            # run, re-draw ~20% of its tokens
            base = texts[i - rng.integers(1, 100)].split()
            n_mut = max(1, len(base) // 5)
            idx = rng.choice(len(base), n_mut, replace=False)
            for j in idx:
                base[j] = str(rng.choice(vocab, p=p))
            texts.append(" ".join(base))
        else:
            n = int(lens[rng.integers(0, len(lens))])
            texts.append(" ".join(rng.choice(vocab, n, p=p)))
        doc_langs.append(str(lang))
        doc_srcs.append(str(sources[pick[i]]))
    write(
        pd.DataFrame(
            {
                "doc_id": np.arange(n_docs, dtype=np.int64),
                "text": texts,
                "lang": doc_langs,
                "source": doc_srcs,
                "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
            }
        ),
        "documents",
    )

    # ---- embeddings: per-label gaussian fit (label-mean norm ~0.07,
    # within-label per-coord std ~0.1247, dim 64 — measured on sf0.1) ----
    dim = 64
    mus = rng.normal(0, 0.07 / np.sqrt(dim), (10, dim))
    lab = rng.integers(0, 10, n_emb)
    vecs = (mus[lab] + rng.normal(0, 0.1247, (n_emb, dim))).astype(np.float32)
    write(
        pd.DataFrame(
            {
                "vec_id": np.arange(n_emb, dtype=np.int64),
                "embedding": [v for v in vecs],
                "label": lab.astype(np.int32),
            }
        ),
        "embeddings",
    )
    print("done", flush=True)


if __name__ == "__main__":
    main()
