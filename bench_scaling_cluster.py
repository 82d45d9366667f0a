#!/usr/bin/env python
"""Multi-JVM two-cluster-size scaling measurement (round-3 evidence for
the north rule's N vs 4N executor criterion).

Unlike ``bench_scaling.py`` (single-JVM local[N] vs local[4N], which
round 2 showed measures local-mode orchestration, not the engine), this
harness runs a REAL Spark standalone cluster on this host — one master
JVM + separate worker JVMs — and measures the identical job at two
executor allocations (``spark.cores.max`` N vs 4N over multi-core
executor JVMs). Executors are fresh JVM processes per app; shuffle and
RDD blocks move between executors over TCP + the block manager exactly
as on a distributed cluster.

Host-bound disclosure (measured, see BENCH_scaling docs): this sandbox
saturates on memory bandwidth for shuffle-heavy work above ~8 busy
cores — a pure-JVM 240M-row shuffle join control runs at the SAME wall
time on 8 and 32 cores (speedup 1.01×) while a pure-CPU control scales
3.4×. The pipeline measurement therefore uses N=2 → 4N=8 (inside the
host's headroom) and reports the 32-core control to evidence the
ceiling; on a real multi-host cluster the bandwidth per executor is
constant and the N→4N regime is the 2→8 one measured here.

Per level: fresh driver app → corpus generation (untimed) → one
untimed warm-up pipeline run (JIT/codegen/python-worker pools — a
long-lived cluster's steady state) → ``--reps`` timed runs. All
samples disclosed; median reported.

Usage:
  python bench_scaling_cluster.py                # full orchestration
  python bench_scaling_cluster.py --convs 60000 --reps 2
  python bench_scaling_cluster.py --worker --cores 8 ...   # one level
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

MASTER_URL = "spark://127.0.0.1:7077"
WORK_ROOT = "/tmp/spark-standalone"
# Disk-backed local dirs, NOT tmpfs: shuffle files written here are
# page-cache-hot (RAM-speed on this idle 126 GB host) but the kernel can
# evict them under pressure. Round 5 learned the hard way that tmpfs
# cannot: a gate-retry-stretched N-level run (~6 pipeline runs in one
# app) accumulated enough shuffle/localCheckpoint data on /dev/shm to
# exhaust host RAM and the kernel OOM-killed the executor in the final
# rep. Both levels use the same dirs, so the N->4N ratio is unaffected.
LOCAL_DIRS = "/tmp/spark-local"
N_WORKERS = 8
WORKER_CORES = 4


def _spark_home() -> str:
    import pyspark

    return os.path.dirname(pyspark.__file__)


def _cluster_up() -> bool:
    import socket

    s = socket.socket()
    s.settimeout(1)
    try:
        s.connect(("127.0.0.1", 7077))
        return True
    except OSError:
        return False
    finally:
        s.close()


def start_cluster() -> None:
    """Start master + N_WORKERS worker JVMs (idempotent)."""
    if _cluster_up():
        return
    sh = _spark_home()
    os.makedirs(f"{WORK_ROOT}/logs", exist_ok=True)
    os.makedirs(LOCAL_DIRS, exist_ok=True)
    env = dict(os.environ, SPARK_HOME=sh)
    subprocess.Popen(
        [f"{sh}/bin/spark-class", "org.apache.spark.deploy.master.Master",
         "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8089"],
        stdout=open(f"{WORK_ROOT}/logs/master.log", "w"),
        stderr=subprocess.STDOUT, env=env,
    )
    time.sleep(8)
    for i in range(1, N_WORKERS + 1):
        wenv = dict(env, SPARK_WORKER_DIR=f"{WORK_ROOT}/work{i}",
                    SPARK_LOCAL_DIRS=LOCAL_DIRS)
        subprocess.Popen(
            [f"{sh}/bin/spark-class", "org.apache.spark.deploy.worker.Worker",
             "--cores", str(WORKER_CORES), "--memory", "10g",
             "--webui-port", str(8100 + i), MASTER_URL],
            stdout=open(f"{WORK_ROOT}/logs/worker{i}.log", "w"),
            stderr=subprocess.STDOUT, env=wenv,
        )
    time.sleep(10)


class InterferenceProbe:
    """In-run host-interference detector (round-5 sample gating).

    Round 4's final-code validation was polluted by an external
    interference window that a before/after check could not see; this
    probe times a FIXED unit of single-thread work (CPU loop + ~100 MB
    memcpy, GIL released during the copy) every ``interval`` seconds
    ON A SPARE CORE while the pipeline runs. An idle tick time is
    calibrated at start (min of 7) for disclosure; acceptance is judged
    against a LOADED reference — the tick median recorded during the
    identical untimed warm-up run — because the pipeline's own memory
    traffic slows the memcpy probe too (a constant factor per level,
    harmless to the N->4N ratio). Samples whose ticks exceed the loaded
    reference beyond the gate are re-run, not medianed — see
    ``verdict`` for thresholds and rationale.

    The probe costs ~0.2s per tick on 1 of 32 host cores while the
    measured job uses at most 8 + driver; it perturbs the measurement
    by well under 1% and reads near-clean unless something EXTERNAL is
    eating CPU/bandwidth — exactly the one-sided wall-time adder
    observed in BENCH_scaling_r04.json:final_code_validation."""

    def __init__(self, interval: float = 12.0):
        import numpy as np

        # preallocated src/dst: copyto touches the same pages every
        # tick, so a tick after a sleep costs the same as one run
        # back-to-back (a per-tick copy() reallocation made calibration
        # hot-cache-biased vs the in-run ticks)
        self._src = np.arange(12_500_000, dtype=np.float64)  # ~100 MB
        self._dst = np.empty_like(self._src)
        self._np = np
        self.interval = interval
        self.ticks: list[float] = []
        self._stop = False
        self._thread = None
        for _ in range(3):
            self._tick()  # warm pages + JIT-free steady state
        cal = []
        for _ in range(7):
            cal.append(self._tick())
            time.sleep(0.3)  # calibrate under loop-like (not hot-spin) timing
        self.clean = min(cal)

    def _tick(self) -> float:
        t0 = time.perf_counter()
        x = 0
        for i in range(200_000):
            x += i
        self._np.copyto(self._dst, self._src)
        self._np.copyto(self._src, self._dst)
        return time.perf_counter() - t0

    def _loop(self):
        while not self._stop:
            self.ticks.append(self._tick())
            time.sleep(self.interval)

    def start(self):
        import threading

        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop = True
        if self._thread is not None:
            self._thread.join(timeout=self.interval + 5)
            self._thread = None

    def window(self) -> int:
        return len(self.ticks)

    def window_median(self, start_idx: int, end_idx: int | None = None) -> float | None:
        w = self.ticks[start_idx:end_idx]
        if not w:
            return None
        return sorted(w)[len(w) // 2]

    def verdict(self, start_idx: int, ref: float, end_idx: int | None = None) -> dict:
        """Gate the ticks since ``start_idx`` against ``ref`` — the
        LOADED reference tick (median during the identical untimed
        warm-up run, lowered to the cleanest accepted attempt since).

        Judging against the idle calibration instead conflates the
        pipeline's own memory-bandwidth contention (constant for the
        identical job at the same level, so harmless to the N->4N
        ratio) with external interference: the first 240k N-level
        attempt this round showed a sustained 1.20x median tick across
        the entire 20-minute rep — self-load, not a burst — and the
        idle-referenced gate re-ran every rep until the host OOM'd.
        The idle tick stays disclosed (``median_vs_idle``) so the
        self-contention factor is visible per sample.

        A window with fewer than 3 ticks is NOT judged clean (advisor
        r5: an empty window — a sample shorter than the probe interval,
        or a dead probe thread — previously passed the gate silently);
        ``gated`` records whether the verdict carries evidence."""
        w = self.ticks[start_idx:end_idx]
        if len(w) < 3:
            return {"clean": False, "gated": False, "n_ticks": len(w),
                    "median_ratio": None, "frac_slow": None,
                    "median_vs_idle": None}
        ratios = sorted(t / ref for t in w)
        med = ratios[len(ratios) // 2]
        frac_slow = sum(r > 1.15 for r in ratios) / len(ratios)
        med_idle = sorted(t / self.clean for t in w)[len(w) // 2]
        return {
            "clean": bool(frac_slow <= 0.20 and med <= 1.08),
            "gated": True,
            "n_ticks": len(w),
            "median_ratio": round(med, 3),
            "frac_slow": round(frac_slow, 3),
            "median_vs_idle": round(med_idle, 3),
        }


def worker(cores: int, convs: int, reps: int, executor_cores: int) -> None:
    import tempfile

    os.environ["PYSPARK_PYTHON"] = sys.executable
    from wned_spark.config import ERConfig
    from wned_spark.datagen import generate_corpus
    from wned_spark.pipeline import run_er_pipeline
    from wned_spark.session import get_spark

    spark = get_spark(
        app_name=f"wned_scaling_c{cores}",
        master=MASTER_URL,
        shuffle_partitions=16,
        extra_conf={
            "spark.cores.max": str(cores),
            "spark.executor.cores": str(executor_cores),
            "spark.executor.memory": "6g",
            "spark.driver.memory": "8g",
            "spark.local.dir": LOCAL_DIRS,
            # many dictionary-sized stages: a 3s locality wait per task
            # wave costs more than any data movement it avoids
            "spark.locality.wait": "0ms",
            # drive ContextCleaner promptly: shuffle files are only
            # unregistered when their driver-side objects are GC'd, and
            # the 30min default lets several ~20min reps' worth of
            # shuffle data pile up in spark.local.dir
            "spark.cleaner.periodicGC.interval": "2min",
        },
    )
    spark.sparkContext.setCheckpointDir(tempfile.mkdtemp())
    corpus = generate_corpus(
        spark, n_conversations=convs, turns_per_conv=12,
        n_entities=max(64, convs // 8), community_size=8,
    )
    transcripts = corpus["transcripts"].persist()
    n_turns = transcripts.count()

    def one_run() -> float:
        t0 = time.time()
        res = run_er_pipeline(
            spark, transcripts, alias_raw=corpus["alias_raw"], cfg=ERConfig()
        )
        res.clusters.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    def release_blocks() -> None:
        """Untimed, between runs: drop every cached/localCheckpoint
        block the pipeline pinned (bench.py applies the same hygiene —
        blocks pinned by prior reps put later reps under growing
        storage pressure), nudge the driver JVM so ContextCleaner
        promptly unregisters dead shuffles' files from spark.local.dir,
        then re-pin + re-materialize the input so every rep starts from
        the identical storage state."""
        spark.catalog.clearCache()
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            jrdd.unpersist(True)
        spark.sparkContext._jvm.System.gc()
        transcripts.persist()
        transcripts.count()

    # gated sampling (round 5, hardened round 6 per ADVICE r5): each
    # timed rep must pass the in-run interference gate or it is re-run
    # (max 2 retries per rep); every attempt is disclosed either way.
    # The probe starts BEFORE the untimed warm-up so the warm-up window
    # (identical job, identical self-contention) becomes the loaded
    # reference the gate judges samples against — see
    # InterferenceProbe.verdict. Round-6 hardening:
    # - the warm-up ref window ends BEFORE release_blocks() (its
    #   cache-clearing/GC ticks are non-pipeline load that diluted the
    #   'identical job => identical self-contention' premise);
    # - a warm-up ref above idle × MAX_SELF_CONTENTION is treated as
    #   polluted: the warm-up is re-run (≤2 extra), then clamped —
    #   previously the first attempt after a polluted warm-up was
    #   judged against an inflated ref;
    # - after the loop every ACCEPTED attempt is re-judged against the
    #   final (tightest) ref and the retro-verdicts disclosed.
    MAX_SELF_CONTENTION = 1.6  # r05 measured pipeline self-load ~1.2x;
    # the one observed polluted warm-up ran at 3.37x idle
    probe = InterferenceProbe()
    probe.start()
    warmup_medians: list[float] = []
    ref_clamped = False
    for wu_try in range(3):
        wu0 = probe.window()
        one_run()  # warm-up: JIT + codegen caches + python worker pools
        wu1 = probe.window()  # ref window ends before release_blocks
        release_blocks()
        ref = probe.window_median(wu0, wu1) or probe.clean
        warmup_medians.append(round(ref, 4))
        if ref <= probe.clean * MAX_SELF_CONTENTION:
            break
        print(f"[gate] warm-up ref {ref:.4f} exceeds idle x "
              f"{MAX_SELF_CONTENTION} sanity bound — re-running warm-up",
              file=sys.stderr)
    else:
        ref = probe.clean * MAX_SELF_CONTENTION
        ref_clamped = True
    walls: list[float] = []
    attempts: list[dict] = []
    try:
        for rep in range(reps):
            for attempt in range(3):
                w0 = probe.window()
                wall = round(one_run(), 2)
                w1 = probe.window()
                v = probe.verdict(w0, ref, w1)
                release_blocks()  # untimed, outside the gate window
                rec = {"rep": rep, "attempt": attempt, "wall_sec": wall,
                       "accepted": False, "_w": (w0, w1), **v}
                attempts.append(rec)
                print(f"[gate] rep={rep} attempt={attempt} wall={wall} {v}",
                      file=sys.stderr)
                if v["clean"]:
                    rec["accepted"] = True
                    walls.append(wall)
                    # adapt: the cleanest accepted window becomes the
                    # reference (guards against a polluted warm-up
                    # inflating ref and leniating the gate)
                    m = probe.window_median(w0, w1)
                    if m is not None and m < ref:
                        ref = m
                    break
            else:
                # never clean after 3 attempts: keep the MIN wall
                # (interference is one-sided) and leave it flagged
                rep_atts = [a for a in attempts if a["rep"] == rep]
                best = min(rep_atts, key=lambda a: a["wall_sec"])
                best["accepted"] = True
                walls.append(best["wall_sec"])
    finally:
        probe.stop()
    # retro-judge accepted attempts against the FINAL tightened ref
    # (ADVICE r5: an attempt accepted early against a still-loose ref
    # could mask interference up to the loosening factor)
    for a in attempts:
        w0, w1 = a.pop("_w")
        if a["accepted"]:
            a["retro_vs_final_ref"] = probe.verdict(w0, ref, w1)
    med = sorted(walls)[len(walls) // 2]
    print(json.dumps({
        "cores": cores, "executor_cores": executor_cores, "turns": n_turns,
        "walls_sec": walls, "median_wall_sec": med,
        "turns_per_sec": round(n_turns / med, 2),
        "probe_clean_tick_sec": round(probe.clean, 4),
        "loaded_ref_tick_sec": round(ref, 4),
        "self_contention_vs_idle": round(ref / probe.clean, 3),
        "warmup_ref_medians": warmup_medians,
        "warmup_ref_clamped": ref_clamped,
        "gate": {"rule": "loaded-reference gate: accept iff frac(tick>1.15x ref)<=0.20 and median tick<=1.08x ref during the sample (>=3 ticks required), ref = warm-up-window median tick ending before release_blocks (identical job => identical self-contention), sanity-bounded at idle x 1.6 (warm-up re-run then clamped if above), lowered to the cleanest accepted window; polluted samples re-run (<=2 retries); accepted attempts retro-judged against the final ref; idle-calibrated ratio disclosed per sample as median_vs_idle",
                 "attempts": attempts,
                 "all_accepted_clean": all(a["clean"] for a in attempts
                                           if a["accepted"]),
                 "all_accepted_clean_vs_final_ref": all(
                     a["retro_vs_final_ref"]["clean"] for a in attempts
                     if a["accepted"] and a["retro_vs_final_ref"]["gated"])},
    }))


def shuffle_control(cores: int, executor_cores: int = 4) -> dict:
    """Pure-JVM shuffle-join control: no python, no pipeline — isolates
    what the HOST gives Spark at this core count."""
    code = f"""
import sys, os, time, json
sys.path.insert(0, {REPO!r})
os.environ["PYSPARK_PYTHON"] = sys.executable
from wned_spark.session import get_spark
from pyspark.sql import functions as F
spark = get_spark(app_name="ctl{cores}", master={MASTER_URL!r}, shuffle_partitions=64,
                  extra_conf={{"spark.cores.max": "{cores}", "spark.executor.cores": "{executor_cores}",
                              "spark.executor.memory": "8g", "spark.driver.memory": "8g",
                              "spark.local.dir": {LOCAL_DIRS!r},
                              "spark.locality.wait": "0ms"}})
a = spark.range(120_000_000).select(F.col("id"), (F.col("id") % 4000000).alias("k"), F.rand(1).alias("x"))
b = spark.range(120_000_000).select((F.col("id") % 4000000).alias("k"), F.rand(2).alias("y"))
q = lambda: a.join(b, "k").groupBy((F.col("k") % 1024).alias("g")).agg(F.sum("x"), F.sum("y")).write.format("noop").mode("overwrite").save()
q()
t0 = time.time(); q(); w = time.time() - t0
print(json.dumps({{"cores": {cores}, "wall_sec": round(w, 1)}}))
spark.stop()
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def _burn(_):
    x = 0
    t0 = time.time()
    while time.time() - t0 < 3:
        x += 1
    return x


def cpu_control() -> dict:
    """Pure-CPU control (no Spark): does the host scale 8→32 processes?"""
    import multiprocessing as mp

    out = {}
    for n in (8, 32):
        with mp.Pool(n) as p:
            out[n] = sum(p.map(_burn, range(n)))
    return {"iters_8": out[8], "iters_32": out[32],
            "speedup": round(out[32] / out[8], 2)}


def orchestrate(convs: int, reps: int,
                skip_saturation_controls: bool = False) -> None:
    start_cluster()
    results = {}
    # N=2 (1×2-core executor) vs 4N=8 (4×2-core executors): multi-JVM
    # separation at both levels, inside the host's bandwidth headroom
    for cores in (2, 8):
        # stream worker output: stderr ([gate] progress lines) inherits
        # the orchestrator's stderr live, stdout (the result JSON) goes
        # to a per-level file — a crash mid-level can no longer swallow
        # the samples already taken (round-5 lesson: a buffered
        # capture_output run died 2h in with nothing recoverable)
        lvl_path = f"{WORK_ROOT}/level_c{cores}.out"
        with open(lvl_path, "w") as lvl:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "--cores", str(cores), "--convs", str(convs),
                 "--reps", str(reps), "--executor-cores", "2"],
                stdout=lvl, stderr=sys.stderr, text=True, check=True,
                cwd=REPO,
            )
        with open(lvl_path) as lvl:
            line = [l for l in lvl.read().strip().splitlines()
                    if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(f"cores={cores}: {results[cores]}", file=sys.stderr)

    t_n, t_4n = results[2]["turns_per_sec"], results[8]["turns_per_sec"]
    # infra ceiling at the SAME allocations as the pipeline levels
    # (1x2-core vs 4x2-core executors): what the host itself gives a
    # pure-JVM shuffle join at 2 -> 8 cores
    ctl2 = shuffle_control(2, executor_cores=2)
    ctl8s = shuffle_control(8, executor_cores=2)
    out = {
        "mode": "standalone-cluster multi-JVM",
        "n_level": results[2], "4n_level": results[8],
        "speedup": round(t_4n / t_n, 3),
        "scaling_efficiency": round(t_4n / t_n / 4.0, 3),
        "infra_ceiling_same_levels": {
            "what": "pure-JVM 240M-row shuffle join + aggregate on the same cluster at the same 2 vs 8 core allocations (no Python, no pipeline)",
            "wall_2_cores": ctl2["wall_sec"], "wall_8_cores": ctl8s["wall_sec"],
            "speedup": round(ctl2["wall_sec"] / ctl8s["wall_sec"], 2),
            "efficiency": round(ctl2["wall_sec"] / ctl8s["wall_sec"] / 4.0, 2),
        },
    }
    if skip_saturation_controls:
        out["host_ceiling_controls"] = (
            "skipped this run: host-saturation characterization (8 vs 32 "
            "cores shuffle join; pure-CPU 8 vs 32 procs) is a property of "
            "the VM, not the engine — measured identically in "
            "BENCH_scaling_r03.json and BENCH_scaling_r04.json"
        )
    else:
        ctl8 = shuffle_control(8)
        ctl32 = shuffle_control(32)
        cpu = cpu_control()
        out["host_ceiling_controls"] = {
            "shuffle_join_240M_rows": {"wall_8_cores": ctl8["wall_sec"],
                                        "wall_32_cores": ctl32["wall_sec"],
                                        "speedup_8_to_32": round(
                                            ctl8["wall_sec"] / ctl32["wall_sec"], 2)},
            "pure_cpu_8_to_32_procs": cpu,
        }
    print(json.dumps(out))


def data_scale(reps: int) -> None:
    """VERDICT r5 #7: one 4N data-scale point — the identical pipeline
    at FIXED 4N parallelism (8 cores, 4×2-core executors) on 240k and
    480k conversations. Constant-term amortization says turns/sec
    should hold or improve as the input doubles; this is the cheapest
    remaining evidence that the 100 TB claim's throughput is
    data-scale-stable, complementing the N→4N parallelism criterion
    measured in BENCH_scaling_r05."""
    start_cluster()
    results = {}
    for convs in (240_000, 480_000):
        lvl_path = f"{WORK_ROOT}/level_ds_{convs}.out"
        with open(lvl_path, "w") as lvl:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 "--cores", "8", "--convs", str(convs),
                 "--reps", str(reps), "--executor-cores", "2"],
                stdout=lvl, stderr=sys.stderr, text=True, check=True,
                cwd=REPO,
            )
        with open(lvl_path) as lvl:
            line = [l for l in lvl.read().strip().splitlines()
                    if l.startswith("{")][-1]
        results[convs] = json.loads(line)
        print(f"data-scale convs={convs}: {results[convs]['turns_per_sec']} turns/s",
              file=sys.stderr)
    r240, r480 = results[240_000], results[480_000]
    print(json.dumps({
        "mode": "data-scale at fixed 4N parallelism (8 cores, 4x2-core executors, standalone multi-JVM cluster)",
        "at_240k": r240,
        "at_480k": r480,
        "throughput_ratio_480k_over_240k": round(
            r480["turns_per_sec"] / r240["turns_per_sec"], 3),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--executor-cores", type=int, default=2)
    ap.add_argument("--convs", type=int, default=60000)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--skip-saturation-controls", action="store_true")
    ap.add_argument("--data-scale", action="store_true")
    args = ap.parse_args()
    if args.worker:
        worker(args.cores, args.convs, args.reps, args.executor_cores)
    elif args.data_scale:
        data_scale(args.reps)
    else:
        orchestrate(args.convs, args.reps,
                    args.skip_saturation_controls)
