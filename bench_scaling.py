#!/usr/bin/env python
"""Two-parallelism-level scaling measurement (the sandbox adaptation of
the north rule's N vs 4N executor criterion — no real cluster here, so
the same job runs at local[N] and local[4N] on the same input and we
report throughput at both plus efficiency = (tput_4N / tput_N) / 4).

Each measurement is a FRESH subprocess (clean JVM, no warm caches
shared between levels). The measured job is the ER pipeline proper —
mention extraction through clusters — on a pre-materialized corpus;
corpus generation is excluded from the timed window at both levels
identically.

Usage:
  python bench_scaling.py                  # orchestrate N=8 vs 4N=32
  python bench_scaling.py --worker --cpus 8 --convs 3000   # one level
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def worker(cpus: int, convs: int) -> None:
    from wned_spark.config import ERConfig
    from wned_spark.datagen import generate_corpus
    from wned_spark.pipeline import run_er_pipeline
    from wned_spark.session import get_spark

    spark = get_spark(
        app_name=f"wned_scaling_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    corpus = generate_corpus(
        spark, n_conversations=convs, turns_per_conv=12,
        n_entities=max(64, convs // 8), community_size=8,
    )
    transcripts = corpus["transcripts"].persist()
    n_turns = transcripts.count()

    t0 = time.time()
    res = run_er_pipeline(spark, transcripts, alias_raw=corpus["alias_raw"], cfg=ERConfig())
    res.clusters.write.format("noop").mode("overwrite").save()
    wall = time.time() - t0
    print(json.dumps({"cpus": cpus, "turns": n_turns, "wall_sec": round(wall, 3),
                      "turns_per_sec": round(n_turns / wall, 2)}))


def orchestrate(n: int, convs: int) -> None:
    results = {}
    for cpus in (n, 4 * n):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--cpus", str(cpus), "--convs", str(convs)],
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
        print(f"local[{cpus}]: {results[cpus]}", file=sys.stderr)

    t_n = results[n]["turns_per_sec"]
    t_4n = results[4 * n]["turns_per_sec"]
    eff = (t_4n / t_n) / 4.0
    summary = {
        "n_cores": n,
        "4n_cores": 4 * n,
        "turns": results[n]["turns"],
        "throughput_n": t_n,
        "throughput_4n": t_4n,
        "speedup": round(t_4n / t_n, 3),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--convs", type=int, default=3000)
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()
    if args.worker:
        worker(args.cpus, args.convs)
    else:
        orchestrate(args.n, args.convs)
