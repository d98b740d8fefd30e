"""Unit tests for bench.py's broad-slowdown guard math (round 7).

Pure-function tests, no Spark: the round-6 verdict showed the
run-chain prior laundering a gradual 1.24x slowdown (each
intra-round step <=1.13x), so the guards gained a ROUND-END anchor
and canary-based host normalization. These tests pin both behaviors
synthetically.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

PRIOR = {f"q{i}": 1.0 + 0.1 * i for i in range(20)}


def test_round_end_guard_trips_where_run_chain_does_not():
    # The r6 failure shape: the run-chain prior already absorbed the
    # slowdown (timings == last run), but everything is 1.2x the
    # round-end artifact. Run-chain geomean says 1.0 (no trip); the
    # round-end geomean must say 1.2 and trip the 1.15 limit.
    timings = {n: t * 1.2 for n, t in PRIOR.items()}
    run_chain_prior = dict(timings)  # last run == this run
    g_run = bench.geomean_vs(timings, run_chain_prior, host=1.0)
    g_round_end = bench.geomean_vs(timings, PRIOR, host=1.0)
    assert g_run is not None and g_run <= bench.GEOMEAN_LIMIT
    assert g_round_end is not None and g_round_end > bench.GEOMEAN_LIMIT
    assert abs(g_round_end - 1.2) < 1e-9


def test_host_normalization_clears_uniform_host_slowdown():
    # Every query 1.5x slower AND the canary 1.5x slower: that is the
    # host, not the code — the normalized geomean must be ~1.0 and
    # must not trip.
    timings = {n: t * 1.5 for n, t in PRIOR.items()}
    host = bench.host_factor(canary_cur=0.45, canary_prior=0.30)  # 1.5
    g = bench.geomean_vs(timings, PRIOR, host=host)
    assert g is not None and abs(g - 1.0) < 1e-9 and g <= bench.GEOMEAN_LIMIT


def test_host_normalization_does_not_hide_code_regression():
    # Host 1.5x slower but the code ALSO regressed 1.3x on top: the
    # normalized geomean is 1.3 and still trips.
    timings = {n: t * 1.5 * 1.3 for n, t in PRIOR.items()}
    host = bench.host_factor(canary_cur=0.45, canary_prior=0.30)
    g = bench.geomean_vs(timings, PRIOR, host=host)
    assert g is not None and abs(g - 1.3) < 1e-9 and g > bench.GEOMEAN_LIMIT


def test_host_normalization_on_faster_host_still_catches_regression():
    # Host got 2x FASTER, code regressed 1.25x: raw ratios say 0.625
    # (looks like a speedup); normalization must surface the 1.25.
    timings = {n: t * 0.5 * 1.25 for n, t in PRIOR.items()}
    host = bench.host_factor(canary_cur=0.15, canary_prior=0.30)  # 0.5
    g = bench.geomean_vs(timings, PRIOR, host=host)
    assert g is not None and abs(g - 1.25) < 1e-9 and g > bench.GEOMEAN_LIMIT


def test_host_factor_missing_evidence_is_neutral():
    assert bench.host_factor(None, 0.3) == 1.0
    assert bench.host_factor(0.3, None) == 1.0
    assert bench.host_factor(0.3, 0.0) == 1.0


def test_geomean_no_overlap_is_none():
    assert bench.geomean_vs({"a": 1.0}, {"b": 1.0}) is None
    assert bench.geomean_vs({}, PRIOR) is None


def test_prior_from_artifact_degraded_carries_clean_map_and_canary():
    clean = {"queries": {"a": 1.0}, "canary": {"median": 0.3, "py_median": 0.5}}
    q, c, cp = bench._prior_from_artifact(clean)
    assert q == {"a": 1.0} and c == 0.3 and cp == 0.5
    degraded = {
        "degraded": True,
        "queries": {"a": 9.0},
        "canary": {"median": 0.9, "py_median": 1.5},
        "last_clean_queries": {"a": 1.0},
        "last_clean_canary_median": 0.3,
        "last_clean_canary_py_median": 0.5,
    }
    q, c, cp = bench._prior_from_artifact(degraded)
    assert q == {"a": 1.0} and c == 0.3 and cp == 0.5
    # pre-round-8 artifacts carry no python canary
    legacy = {"queries": {"a": 1.0}, "canary": {"median": 0.3}}
    q, c, cp = bench._prior_from_artifact(legacy)
    assert q == {"a": 1.0} and c == 0.3 and cp is None


def test_round_end_prior_reads_driver_round_commit():
    # The repo's own history has driver "round N: ..." commits with a
    # committed BENCH_FULL.json — the anchor must resolve to a
    # non-empty map with a canary median.
    here = os.path.join(os.path.dirname(__file__), "..")
    prior, canary, canary_py, commit = bench._round_end_prior(here)
    assert commit, "no driver round commit found"
    assert prior and all(v > 0 for v in prior.values())
    assert canary is None or canary > 0
    assert canary_py is None or canary_py > 0


def test_dual_canary_agreement_normalizes():
    # Genuine host event: both canary shapes 1.5x slower -> factors
    # agree -> geometric-mean factor, NOT ambiguous, and a uniformly
    # 1.5x-slower sweep normalizes clean.
    host, ambiguous = bench.combined_host_factor(0.45, 0.30, 1.5, 1.0)
    assert not ambiguous and abs(host - 1.5) < 1e-9
    timings = {n: t * 1.5 for n, t in PRIOR.items()}
    raw, norm, tripped = bench.broad_slowdown(timings, PRIOR, host=host)
    assert not tripped and abs(norm - 1.0) < 1e-9


def test_scan_only_slowdown_is_ambiguous_and_trips_raw():
    # The round-7 blind spot: a scan-path code regression (session
    # conf, parquet reader) slows the scan canary 2x while the
    # python-worker canary is flat. The single-canary design would
    # normalize the whole sweep by 2x and classify the regression as
    # host noise. The dual-canary guard must refuse to normalize
    # (host_ambiguous) and judge raw ratios — which trip.
    host, ambiguous = bench.combined_host_factor(0.60, 0.30, 1.0, 1.0)
    assert ambiguous and host == 1.0
    timings = {n: t * 2.0 for n, t in PRIOR.items()}  # every scan 2x
    raw, norm, tripped = bench.broad_slowdown(timings, PRIOR, host=host)
    assert tripped and raw == norm and raw > bench.GEOMEAN_LIMIT


def test_single_canary_fallback_for_legacy_priors():
    # Artifacts predating round 8 have no python-canary median: fall
    # back to the scan factor alone, un-ambiguous (legacy behavior).
    host, ambiguous = bench.combined_host_factor(0.45, 0.30, 1.2, None)
    assert not ambiguous and abs(host - 1.5) < 1e-9
    host, ambiguous = bench.combined_host_factor(None, None, 1.5, 1.0)
    assert not ambiguous and abs(host - 1.5) < 1e-9
    host, ambiguous = bench.combined_host_factor(None, None, None, None)
    assert not ambiguous and host == 1.0


def test_broad_slowdown_needs_both_raw_and_normalized():
    # r7 phantom: scan-bound canary rode the page cache 15% faster
    # while CPU-bound queries were unchanged — normalized geomean 1.18
    # on raw parity must NOT trip
    timings = dict(PRIOR)
    raw, norm, tripped = bench.broad_slowdown(timings, PRIOR, host=0.85)
    assert abs(raw - 1.0) < 1e-9 and norm > bench.GEOMEAN_LIMIT
    assert not tripped
    # r6 phantom: uniformly slower host, unchanged code — raw 1.3,
    # normalized 1.0 must NOT trip
    slow = {n: t * 1.3 for n, t in PRIOR.items()}
    raw, norm, tripped = bench.broad_slowdown(slow, PRIOR, host=1.3)
    assert raw > bench.GEOMEAN_LIMIT and abs(norm - 1.0) < 1e-9
    assert not tripped
    # genuine fleet-wide regression on a steady host trips
    reg = {n: t * 1.25 for n, t in PRIOR.items()}
    raw, norm, tripped = bench.broad_slowdown(reg, PRIOR, host=1.0)
    assert tripped and raw == norm
    # no overlap -> never trips
    assert bench.broad_slowdown({"x": 1.0}, PRIOR, host=1.0) == (None, None, False)
