"""Pins for the scaling bench's in-run interference gate.

The gate (bench_scaling_cluster.InterferenceProbe.verdict) judges each
timed sample's probe-tick distribution against a LOADED reference (the
tick median during the identical warm-up run), not the idle calibration
— the pipeline's own memory traffic slows the probe a constant ~1.2×
per level, which is harmless to the N→4N ratio and must not read as
pollution. These tests drive the verdict logic directly with synthetic
tick streams: no Spark, no cluster, milliseconds.
"""

from __future__ import annotations

import pytest

from bench_scaling_cluster import InterferenceProbe


@pytest.fixture(scope="module")
def probe():
    p = InterferenceProbe.__new__(InterferenceProbe)  # skip calibration
    p.ticks = []
    p.clean = 0.0274  # idle tick from a real run, for median_vs_idle
    return p


def _set(probe, ticks):
    probe.ticks = list(ticks)


def test_self_contention_reads_clean_against_loaded_ref(probe):
    """A sustained 1.2x-idle window — the pipeline's own contention —
    is CLEAN when the loaded reference carries the same factor. The
    idle-referenced round-4 gate flagged exactly this profile
    (median_ratio 1.199, frac_slow 0.857) and re-ran every rep."""
    ref = 0.0274 * 1.21
    _set(probe, [ref * r for r in (0.99, 1.0, 1.01, 1.02, 0.98, 1.0)])
    v = probe.verdict(0, ref)
    assert v["clean"]
    assert v["median_ratio"] <= 1.05
    assert v["median_vs_idle"] > 1.15  # the idle view still discloses it


def test_external_burst_is_flagged(probe):
    """Ticks at 1.5x the loaded reference (the rep-2 burst this round
    measured 1.47x idle with frac_slow 0.5) must be rejected."""
    ref = 0.033
    _set(probe, [ref * r for r in (1.5, 1.6, 1.4, 1.5, 1.02, 1.0)])
    v = probe.verdict(0, ref)
    assert not v["clean"]
    assert v["frac_slow"] > 0.20


def test_partial_window_burst_fails_frac_slow(probe):
    """A burst covering 30% of the window trips the frac_slow arm even
    when the median stays near the reference."""
    ref = 0.033
    _set(probe, [ref] * 7 + [ref * 1.5] * 3)
    v = probe.verdict(0, ref)
    assert v["median_ratio"] <= 1.08 and not v["clean"]


def test_window_median_and_start_idx(probe):
    _set(probe, [1.0, 2.0, 9.0, 3.0])
    assert probe.window_median(0) == 3.0  # upper median of even window
    assert probe.window_median(2) == 9.0
    assert probe.window_median(4) is None


def test_short_or_empty_window_is_not_judged_clean(probe):
    """ADVICE r5: an empty window (sample shorter than the probe
    interval, or a dead probe thread) previously returned clean=True
    with n_ticks=0 — a silent gate bypass. Now any window under 3
    ticks is ungated and NOT clean."""
    _set(probe, [1.0, 2.0, 9.0, 3.0])
    v = probe.verdict(4, ref=1.0)  # empty window
    assert not v["clean"] and not v["gated"] and v["n_ticks"] == 0
    v = probe.verdict(2, ref=1.0)  # 2 ticks < 3
    assert not v["clean"] and not v["gated"] and v["n_ticks"] == 2
    v = probe.verdict(1, ref=3.0)  # 3 ticks: gated again
    assert v["gated"] and v["n_ticks"] == 3


def test_window_end_idx_excludes_release_ticks(probe):
    """ADVICE r5: the warm-up reference window must end BEFORE
    release_blocks() — its cache-clearing/GC ticks are non-pipeline
    load. window_median/verdict take an end index for that."""
    # warm-up ticks at 1.2, then two release_blocks ticks at 3.0
    _set(probe, [1.2, 1.21, 1.19, 3.0, 3.0])
    assert probe.window_median(0, 3) == pytest.approx(1.2)
    assert probe.window_median(0) == pytest.approx(1.21)  # polluted view
    v = probe.verdict(0, ref=1.2, end_idx=3)
    assert v["clean"] and v["n_ticks"] == 3


def test_adaptive_ref_tightens_not_loosens():
    """The worker lowers ref to the cleanest accepted window's median —
    a polluted warm-up cannot permanently leniate the gate. Replicates
    the worker's update rule on synthetic windows."""
    p = InterferenceProbe.__new__(InterferenceProbe)
    p.clean = 1.0
    polluted_warmup_ref = 2.0
    p.ticks = [1.2, 1.21, 1.19]  # first accepted attempt: truly 1.2x idle
    v = p.verdict(0, polluted_warmup_ref)
    assert v["clean"]  # lenient pass (disclosed via median_vs_idle=1.2)
    ref = polluted_warmup_ref
    m = p.window_median(0)
    if m is not None and m < ref:
        ref = m
    assert ref == pytest.approx(1.2)
    # a later 1.5x-idle burst now fails against the tightened ref
    p.ticks = [1.5, 1.55, 1.5]
    assert not p.verdict(0, ref)["clean"]
