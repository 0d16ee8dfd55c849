"""Quality gates: a regression in any method's SNR must turn the bench red.

The gates formalize baseline_cpu.json's artifact_scores (the reference's own
shipped artifacts, scored) + this framework's measured bests as floors;
bench.py emits violations in the JSON line's quality_regressions field.
"""

import copy
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

from bench import GATES, check_quality

# The round-2/3 measured suite numbers (BENCH_r02.json) — all gates pass.
GOOD = {
    "part0": {
        "gp": {"snr_db": 11.57, "local_snr_db": 1.24},
        "ar": {"snr_db": 12.65, "local_snr_db": 2.32},
        "ar_texture": {"snr_db": 8.22, "snr_db_mean": 9.47},
        "nmf": {"snr_db": 10.10, "local_snr_db": 0.49},
    },
    "part1": {
        "ar": {"snr_db": 4.99},
        "unet": {"snr_db": 15.21},
    },
    "part2": {
        "ar": {"snr_db": 1.64},
        "nmf": {"snr_db": 3.83, "local_snr_db": -0.0095},
        "gan": {"snr_db": 2.71, "local_snr_db": -0.048},
        "diffusion": {"snr_db": 3.22, "local_snr_db": -0.81},
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


def test_missing_metric_is_a_regression():
    bad = copy.deepcopy(GOOD)
    del bad["part0"]["ar_texture"]["snr_db_mean"]
    regs = check_quality(bad)
    assert any(r["method"] == "ar_texture" and r["measured"] is None
               for r in regs)


def test_every_gate_is_reachable():
    # each gate's (part, method) exists in the suite results shape
    for part, method, metric, _ in GATES:
        assert part in GOOD and method in GOOD[part], (part, method)
