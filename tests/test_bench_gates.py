"""Quality gates: a regression in any metric BASELINE.md quotes must turn
the bench red.

The gates formalize baseline_cpu.json's artifact_scores (the reference's own
shipped artifacts, scored — SNR floors AND LSD ceilings) + this framework's
measured bests, plus the windowed/streaming engine-regression legs;
bench.py emits violations in the JSON line's quality_regressions field.
"""

import copy
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from bench import GATES, check_quality

# The measured suite numbers (round-3/4 bench passes) — all gates pass.
GOOD = {
    "part0": {
        "gp": {"snr_db": 11.57, "local_snr_db": 1.24},
        "ar": {"snr_db": 12.65, "local_snr_db": 2.32},
        "ar_texture": {"snr_db": 8.22, "snr_db_mean": 9.47},
        "nmf": {"snr_db": 10.10, "local_snr_db": 0.49},
    },
    "part1": {
        "linear": {"snr_db": 4.81},
        "ar": {"snr_db": 4.99, "lsd_db": 12.2},
        "nmf": {"lsd_db": 11.9},
        "unet": {"snr_db": 15.21, "lsd_db": 10.3},
    },
    "part2": {
        "linear": {"snr_db": 3.84},
        "ar": {"snr_db": 1.64},
        "nmf": {"snr_db": 3.83, "local_snr_db": -0.0095, "lsd_db": 10.9},
        "gan": {"snr_db": 2.71, "local_snr_db": -0.048, "lsd_db": 41.2},
        # round-5 corpus prior + fill 0.12 measured band
        "diffusion": {"snr_db": 3.34, "local_snr_db": -0.66, "lsd_db": 11.06},
    },
    "engines": {
        "windowed_ar": {"steady_wall_s": 0.19, "passthrough_exact": 1.0},
        "streaming_ar": {"rtf_warm": 20.0, "chunk_invariant": 1.0},
        "streaming_unet": {"rtf_warm": 14.0, "chunk_invariant": 1.0,
                           "filled": 1.0},
    },
}


def test_good_run_passes():
    assert check_quality(GOOD) == []


def test_broken_gan_padding_fails():
    # The round-1 bug: padding the [-1,1] spectrogram with 0 instead of -1
    # cost ~9 dB global SNR on the GAN (methods/neural.py:238-244). Simulate
    # its symptom: the gate must catch it.
    bad = copy.deepcopy(GOOD)
    bad["part2"]["gan"]["snr_db"] = -6.0
    regs = check_quality(bad)
    assert any(r["part"] == "part2" and r["method"] == "gan"
               and r["metric"] == "snr_db" for r in regs)


def test_lsd_ceiling_catches_spectral_wreck():
    # An LSD regression that HOLDS SNR (e.g. a texture_scale or OLA-eq
    # break filling gaps with spectrally-wrong but low-energy content) must
    # go red on the ceiling even though every floor stays green
    # (VERDICT r3 weak #3).
    bad = copy.deepcopy(GOOD)
    bad["part2"]["nmf"]["lsd_db"] = 16.0        # ceiling 13.0 (ref artifact)
    regs = check_quality(bad)
    assert any(r["method"] == "nmf" and r["metric"] == "lsd_db"
               and r["kind"] == "max" for r in regs)
    # and an IMPROVED (lower) LSD never trips a ceiling
    good2 = copy.deepcopy(GOOD)
    good2["part2"]["nmf"]["lsd_db"] = 5.0
    assert check_quality(good2) == []


def test_engine_gates_catch_breaks():
    bad = copy.deepcopy(GOOD)
    bad["engines"]["windowed_ar"]["passthrough_exact"] = 0.0
    bad["engines"]["streaming_ar"]["rtf_warm"] = 0.4
    regs = check_quality(bad)
    assert any(r["method"] == "windowed_ar"
               and r["metric"] == "passthrough_exact" for r in regs)
    assert any(r["method"] == "streaming_ar" and r["metric"] == "rtf_warm"
               for r in regs)


def test_missing_metric_is_a_regression():
    bad = copy.deepcopy(GOOD)
    del bad["part0"]["ar_texture"]["snr_db_mean"]
    regs = check_quality(bad)
    assert any(r["method"] == "ar_texture" and r["measured"] is None
               for r in regs)


def test_every_gate_is_reachable():
    # each gate's (part, method) exists in the suite results shape
    for part, method, metric, _, kind in GATES:
        assert part in GOOD and method in GOOD[part], (part, method)
        assert kind in ("min", "max"), kind
