#!/usr/bin/env python
"""Benchmark: full Part0-2 restoration suite on the 10 s clip, real TPU.

Runs the suite twice — a warmup pass that populates the persistent
compilation cache, then a measured pass — and prints ONE JSON line:

  {"metric": "suite_wall_clock_s", "value": ..., "unit": "s",
   "vs_baseline": <reference_cpu_seconds / ours_seconds>}

The measured suite is the reference-comparable set (every method whose
reference script runs on this machine: GP, AR x3 scenarios, NMF x3, linear
x2, U-Net, GAN — at the reference's own training budgets). The diffusion
method runs too but is excluded from the comparison (the reference's
riffusion script cannot run here: needs diffusers + a HF download), and its
wall-clock is reported separately on stderr.

``vs_baseline`` divides the reference's measured CPU wall-clock for the same
set (tools/measure_reference_baseline.py -> baseline_cpu.json) by ours:
>1 means faster than the reference.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

INPUT = os.environ.get("BENCH_INPUT", "/root/reference/vocals_accompaniment_10s.wav")
ASSETS = os.environ.get("BENCH_ASSETS", "/tmp/bench_assets")
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")


def run_suite(tag: str) -> dict:
    from audio_inpainting_tpu.methods.diffusion import DiffusionConfig
    from audio_inpainting_tpu.methods.gp import GPConfig
    from audio_inpainting_tpu.pipelines import run_part0, run_part1, run_part2

    t0 = time.time()
    r0 = run_part0(INPUT, ASSETS, seed=0, gp_cfg=GPConfig())
    r1 = run_part1(INPUT, ASSETS, seed=0, unet_epochs=400)
    r2 = run_part2(INPUT, ASSETS, seed=0, gan_epochs=1500,
                   diffusion_cfg=DiffusionConfig(train_steps=1500))
    total = time.time() - t0
    print(f"[{tag}] total={total:.1f}s", file=sys.stderr)
    return {"part0": r0, "part1": r1, "part2": r2, "total_s": total}


def comparable_seconds(res: dict) -> float:
    """Sum method wall-clocks for the reference-comparable set."""
    s = 0.0
    for name in ("gp", "ar", "ar_texture", "nmf"):
        s += res["part0"][name]["wall_s"]
    for name in ("damaged", "linear", "ar", "nmf", "unet"):
        s += res["part1"][name]["wall_s"]
    for name in ("linear", "ar", "nmf", "gan"):
        s += res["part2"][name]["wall_s"]
    return s


def main() -> int:
    run_suite("warmup")
    res = run_suite("measured")
    ours = comparable_seconds(res)
    diff_s = res["part2"]["diffusion"]["wall_s"]
    print(f"[measured] comparable={ours:.2f}s diffusion={diff_s:.2f}s",
          file=sys.stderr)
    for part in ("part0", "part1", "part2"):
        print(f"[metrics] {part}: "
              + json.dumps({k: v for k, v in res[part].items()
                            if isinstance(v, dict)}), file=sys.stderr)

    vs = 0.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)
        ref_s = baseline.get("comparable_suite_wall_s", 0.0)
        if ref_s:
            vs = ref_s / ours
    print(json.dumps({"metric": "suite_wall_clock_s",
                      "value": round(ours, 2), "unit": "s",
                      "vs_baseline": round(vs, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
