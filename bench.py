#!/usr/bin/env python
"""Benchmark: full Part0-2 restoration suite on the 10 s clip, real TPU.

Runs the suite twice — a warmup pass that populates the persistent
compilation cache, then a measured pass — and prints ONE JSON line:

  {"metric": "suite_wall_clock_s", "value": ..., "unit": "s",
   "vs_baseline": <reference_cpu_seconds / ours_seconds>,
   "quality_regressions": [...]}

The measured suite is the reference-comparable set (every method whose
reference script runs on this machine: GP, AR x3 scenarios, NMF x3, linear
x2, U-Net, GAN — at the reference's own training budgets). The diffusion
method runs too but is excluded from the comparison (the reference's
riffusion script cannot run here: needs diffusers + a HF download), and its
wall-clock is reported separately on stderr.

Diffusion runs in PRETRAINED mode — the reference's own semantics
(main_diffusion_gap.py:16-19 downloads pretrained riffusion weights and only
runs inference). The DDPM prior is pretrained once before the warmup pass on
the DAMAGED bench clip's spectrogram image with the hole excluded from the
loss (masks_u8), so no ground truth ever leaks through the gap; the measured
pass is sample+Griffin-Lim only. Pretrain wall is reported on stderr.

``vs_baseline`` divides the reference's measured CPU wall-clock for the same
set (tools/measure_reference_baseline.py -> baseline_cpu.json) by ours:
>1 means faster than the reference.

Quality gates: each method's measured SNR is compared against GATES —
floors derived from the reference's own shipped artifacts
(baseline_cpu.json: artifact_scores) and this framework's round-2 bests
minus a noise margin. Violations land in the JSON line's
``quality_regressions`` list (empty = all pass), so a silent quality
regression (e.g. the GAN -1 padding constant) turns the bench red.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax  # noqa: E402


def _enable_compilation_cache() -> None:
    """Persistent compile cache — called from main() ONLY. Enabling it at
    import time poisoned the test process (tests/test_bench_gates.py imports
    this module): this jaxlib SEGFAULTS serializing/deserializing 8-device
    CPU pjit executables, so the cache must never be active for the virtual
    mesh tests."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])

INPUT = os.environ.get("BENCH_INPUT", "/root/reference/vocals_accompaniment_10s.wav")
ASSETS = os.environ.get("BENCH_ASSETS", "/tmp/bench_assets")
BASELINE_FILE = os.path.join(os.path.dirname(__file__), "baseline_cpu.json")

# (part, method, metric, bound, kind). kind "min" = floor (higher is
# better: SNRs, RTF), "max" = ceiling (lower is better: LSD, wall-clock).
# Sources: reference artifact scores where the reference shipped one
# (gan/unet/nmf part2, LSD ceilings from baseline_cpu.json artifact_scores),
# reference printed SNRs (part0), the damaged-baseline bar (part1 ar), and
# this framework's measured bests minus/plus a noise margin elsewhere —
# every number BASELINE.md's tables quote now has a gate (VERDICT r3 #4).
GATES: list[tuple[str, str, str, float, str]] = [
    ("part0", "gp", "snr_db", 10.5, "min"),     # ref prints 10.87; ours 11.57
    ("part0", "gp", "local_snr_db", 0.4, "min"),
    ("part0", "ar", "snr_db", 12.6, "min"),     # exact parity: 12.65
    ("part0", "ar", "local_snr_db", 2.25, "min"),
    ("part0", "ar_texture", "snr_db_mean", 8.96, "min"),  # ref 9.46 - 0.5
    ("part0", "nmf", "snr_db", 9.9, "min"),     # ref prints 10.13; ours 10.10
    ("part0", "nmf", "local_snr_db", 0.3, "min"),
    # part1 linear is the reference's defect-documented baseline (straight
    # lines across 9 ms gaps barely beat zeros; its LSD is structurally
    # high and not a quality claim) — floor at the reference's own shipped
    # artifact score (baseline_cpu.json part1/fixed_linear_random 4.29;
    # ours measures 4.81)
    ("part1", "linear", "snr_db", 4.2, "min"),
    ("part1", "unet", "snr_db", 11.73, "min"),  # ref artifact dl_long_restored
    ("part1", "unet", "lsd_db", 11.5, "max"),   # ours 10.3
    ("part1", "ar", "snr_db", 4.87, "min"),     # ≥ the damaged baseline
    ("part1", "ar", "lsd_db", 13.5, "max"),     # ours 12.2
    ("part1", "nmf", "lsd_db", 13.2, "max"),    # ours 11.9
    ("part2", "linear", "snr_db", 2.5, "min"),   # ref artifact 1.87; ours 3.84
    ("part2", "ar", "snr_db", 1.0, "min"),      # ref artifact scores -6.22
    ("part2", "nmf", "snr_db", 3.78, "min"),    # ref artifact 3.83
    ("part2", "nmf", "local_snr_db", -0.06, "min"),  # ref artifact -0.01
    ("part2", "nmf", "lsd_db", 13.0, "max"),    # ref artifact 13.01; ours 10.9
    ("part2", "gan", "snr_db", 2.04, "min"),    # ref artifact 2.04 (we beat it)
    ("part2", "gan", "local_snr_db", -0.07, "min"),  # ref artifact -0.07
    ("part2", "gan", "lsd_db", 42.5, "max"),    # ref artifact 40.79; seed noise
    # round-5 corpus prior (48 clips x 4 styles, 24k steps) + fill 0.12:
    # measured 3.34 / -0.664 / 11.06 on the pipeline path — gates
    # tightened from (3.0, -1.0, 13.0) to the new band (VERDICT r4 #3)
    ("part2", "diffusion", "snr_db", 3.0, "min"),
    ("part2", "diffusion", "local_snr_db", -0.8, "min"),
    ("part2", "diffusion", "lsd_db", 11.5, "max"),
    # engine-regression gates (run_engines below): the windowed engine's
    # steady wall on the fixed 60 s program and the streaming engine's
    # warm-pass RTF; both also hard-fail on passthrough/invariance breaks.
    ("engines", "windowed_ar", "steady_wall_s", 2.0, "max"),  # ours ~0.19
    ("engines", "windowed_ar", "passthrough_exact", 0.5, "min"),  # bool
    ("engines", "streaming_ar", "rtf_warm", 3.0, "min"),
    ("engines", "streaming_ar", "chunk_invariant", 0.5, "min"),   # bool
    # round 5: persistent per-stream U-Net must hold realtime with margin
    # (measured 14x on the 2-min program; 3x is the floor the verdict set)
    ("engines", "streaming_unet", "rtf_warm", 3.0, "min"),
    ("engines", "streaming_unet", "chunk_invariant", 0.5, "min"),  # bool
    ("engines", "streaming_unet", "filled", 0.5, "min"),           # bool
]


def check_quality(res: dict) -> list[dict]:
    """Compare one suite run against GATES; returns the violations."""
    regressions = []
    for part, method, metric, bound, kind in GATES:
        got = res.get(part, {}).get(method, {}).get(metric)
        bad = (got is None or (kind == "min" and got < bound)
               or (kind == "max" and got > bound))
        if bad:
            regressions.append({"part": part, "method": method,
                                "metric": metric, "bound": bound,
                                "kind": kind,
                                "measured": None if got is None
                                else round(float(got), 3)})
    return regressions


PRIOR_DIR = os.path.join(os.path.dirname(__file__), "checkpoints",
                         "diffusion_prior")


def load_or_pretrain_prior(cfg):
    """The diffusion prior for the bench: the committed CORPUS checkpoint
    (trained by tools/train_diffusion_prior.py on procedurally generated
    music that excludes the bench clip — the reference's pretrained-prior
    semantics, main_diffusion_gap.py:16-19) when present; else fall back to
    on-clip adaptation (hole masked from the loss) and say so."""
    if os.path.isdir(PRIOR_DIR):
        from audio_inpainting_tpu.utils.checkpoint import load_params

        t0 = time.time()
        params = load_params(PRIOR_DIR)
        print(f"[prior] corpus checkpoint loaded in {time.time() - t0:.1f}s "
              f"({PRIOR_DIR}; bench clip excluded from training)",
              file=sys.stderr)
        return params
    print("[prior] no corpus checkpoint; falling back to on-clip "
          "adaptation (NOT a pretrained prior)", file=sys.stderr)
    return pretrain_diffusion(cfg)


def run_engines() -> dict:
    """Windowed + streaming engine regression legs (VERDICT r3 #4).

    Windowed: the fixed 60 s program (6x the clip, one 4,000-sample hole),
    AR with batch_windows, run twice — first pass pays any compile, second
    is the gated steady wall; clean samples outside the hole's composite
    region must be BIT-identical. Streaming: the same damage fed through
    StreamRestorer twice with different chunkings after warmup() — outputs
    must match exactly (chunk invariance) and the gated warm RTF comes
    from the second pass.
    """
    import numpy as np

    from audio_inpainting_tpu.io import load_mono_normalized
    from audio_inpainting_tpu.methods.streaming import StreamRestorer
    from audio_inpainting_tpu.methods.windowed import restore_windowed

    sr, clip = load_mono_normalized(INPUT)
    audio = np.tile(clip[:10 * sr], 6).astype(np.float32)
    gs = 3 * 10 * sr + 12345
    ge = gs + 4_000
    damaged = audio.copy()
    damaged[gs:ge] = 0.0

    kw = dict(method="ar", window_s=2.0, gaps=[(gs, ge)], seed=0,
              batch_windows=True)
    restore_windowed(damaged, sr, **kw)            # compile pass
    t0 = time.time()
    out_w = restore_windowed(damaged, sr, **kw)
    wall_w = time.time() - t0
    clean = np.ones(len(damaged), bool)
    clean[gs - 100:ge + 100] = False
    windowed = {
        "steady_wall_s": round(wall_w, 3),
        "passthrough_exact": float(np.array_equal(out_w[clean],
                                                  damaged[clean])),
        "filled": float(np.abs(out_w[gs:ge]).max() > 1e-3)}

    def stream_pass(chunk):
        rest = StreamRestorer(sr, method="ar", window_s=2.0)
        rest.warmup(max_gap_s=0.5)
        outs = []
        t0 = time.time()
        for i in range(0, len(damaged), chunk):
            outs.append(rest.feed(damaged[i:i + chunk]))
        outs.append(rest.flush())
        return np.concatenate(outs), time.time() - t0

    out_a, _ = stream_pass(sr // 10)
    out_b, wall_b = stream_pass(sr)                # warm: programs compiled
    streaming = {
        "rtf_warm": round((len(damaged) / sr) / wall_b, 1),
        "chunk_invariant": float(np.array_equal(out_a, out_b)),
        "filled": float(np.abs(out_b[gs:ge]).max() > 1e-3)}

    # Streaming U-Net leg (round 5): the persistent per-stream net
    # (methods/unet_stream.py) at the reference's 400-epoch cold budget,
    # adapt_epochs=100 — gated at >= 3x realtime warm (round-4 published
    # 0.8x; round-5 measured 14x on the 2-minute program). 30 s program,
    # three 300 ms gaps.
    audio_u = np.tile(clip[:10 * sr], 3).astype(np.float32)
    u_spans = [(8 * sr, 8 * sr + 13230), (18 * sr, 18 * sr + 13230),
               (27 * sr, 27 * sr + 13230)]
    dmg_u = audio_u.copy()
    for s, e in u_spans:
        dmg_u[s:e] = 0.0

    def stream_pass_unet(chunk):
        rest = StreamRestorer(sr, method="unet")   # 2 s default window
        rest.warmup(max_gap_s=0.5)
        outs = []
        t0 = time.time()
        for i in range(0, len(dmg_u), chunk):
            outs.append(rest.feed(dmg_u[i:i + chunk]))
        outs.append(rest.flush())
        return np.concatenate(outs), time.time() - t0

    ou_a, _ = stream_pass_unet(sr // 10)
    ou_b, wall_u = stream_pass_unet(sr)
    streaming_unet = {
        "rtf_warm": round((len(dmg_u) / sr) / wall_u, 1),
        "chunk_invariant": float(np.array_equal(ou_a, ou_b)),
        "filled": float(all(np.abs(ou_b[s:e]).max() > 1e-3
                            for s, e in u_spans))}
    res = {"windowed_ar": windowed, "streaming_ar": streaming,
           "streaming_unet": streaming_unet}
    print(f"[engines] {json.dumps(res)}", file=sys.stderr)
    return res


def pretrain_diffusion(cfg):
    """Build the DDPM prior from the damaged bench clip (hole masked out)."""
    import numpy as np

    from audio_inpainting_tpu.corrupt import center_gap_bounds
    from audio_inpainting_tpu.io import load_mono_normalized
    from audio_inpainting_tpu.methods.diffusion import (
        logspec_to_image, mask_from_image, train_spectrogram_ddpm,
        wav_to_logspec)

    sr, data = load_mono_normalized(INPUT)
    data = data[:10 * sr]
    gs, ge = center_gap_bounds(len(data), sr)
    damaged = data.copy()
    damaged[gs:ge] = 0.0      # the ground truth under the hole is never seen
    img, _, _ = logspec_to_image(np.asarray(wav_to_logspec(damaged)))
    mask = mask_from_image(img)
    t0 = time.time()
    params = train_spectrogram_ddpm([img], cfg, key=0, masks_u8=[mask])
    jax.block_until_ready(params)
    print(f"[pretrain] diffusion prior {time.time() - t0:.1f}s "
          f"({cfg.train_steps} steps, hole-masked)", file=sys.stderr)
    return params


def run_suite(tag: str, diffusion_cfg, diffusion_params) -> dict:
    from audio_inpainting_tpu.methods.gp import GPConfig
    from audio_inpainting_tpu.pipelines import run_part0, run_part1, run_part2

    t0 = time.time()
    r0 = run_part0(INPUT, ASSETS, seed=0, gp_cfg=GPConfig())
    r1 = run_part1(INPUT, ASSETS, seed=0, unet_epochs=400)
    r2 = run_part2(INPUT, ASSETS, seed=0, gan_epochs=1500,
                   diffusion_cfg=diffusion_cfg,
                   diffusion_params=diffusion_params)
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


def _emit_stall(reason: str) -> None:
    print(json.dumps({"metric": "suite_wall_clock_s", "value": None,
                      "unit": "s", "vs_baseline": 0.0, "error": reason}))
    sys.stdout.flush()


def _arm_watchdog(seconds: int):
    """Fail LOUDLY instead of hanging forever when the TPU tunnel stalls.

    The axon tunnel has been observed to hang indefinitely on device
    enumeration/compile RPCs (round 3: >8 h unresponsive). A silent hang
    leaves no bench record at all; this prints a diagnostic JSON line on
    the same contract as the success path and exits nonzero so the driver
    can retry.

    A daemon THREAD, not SIGALRM: the observed hang blocks the main thread
    inside a PJRT C++ RPC, where a Python signal handler never gets to run
    (handlers execute between bytecodes on the main thread). os._exit from
    another thread works regardless. Returns the event to set on success."""
    import threading

    done = threading.Event()

    def _watch():
        if not done.wait(seconds):
            _emit_stall(f"bench watchdog: no result within {seconds}s "
                        f"(TPU tunnel stalled?)")
            os._exit(2)

    threading.Thread(target=_watch, daemon=True, name="bench-watchdog").start()
    return done


def _probe_devices(timeout_s: int) -> str | None:
    """Bounded device-enumeration probe in a SUBPROCESS (a stalled tunnel
    hangs jax.devices() in C land; only an external kill is reliable).
    Lets a dead tunnel fail the bench in minutes, not the full watchdog
    budget, so the driver can retry sooner. Returns None on success, else
    a diagnostic string that distinguishes a hang (tunnel down) from an
    instant nonzero exit (broken install — retrying won't help)."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        if r.returncode == 0:
            return None
        tail = r.stderr.decode("utf-8", errors="replace").strip()[-400:]
        return (f"device probe exited rc={r.returncode} "
                f"(NOT a tunnel hang): {tail}")
    except subprocess.TimeoutExpired:
        return (f"device enumeration did not complete within {timeout_s}s "
                f"(TPU tunnel down?)")


def main() -> int:
    from audio_inpainting_tpu.methods.diffusion import DiffusionConfig

    # watchdog is armed BEFORE the probe so its budget covers the whole
    # process: an outer driver timeout need only exceed BENCH_WATCHDOG_S
    # (not watchdog + probe) for the stall JSON to get out first
    done = _arm_watchdog(int(os.environ.get("BENCH_WATCHDOG_S", "5400")))
    probe_s = int(os.environ.get("BENCH_PROBE_S", "600"))
    err = _probe_devices(probe_s)
    if err is not None:
        _emit_stall(f"bench probe: {err}")
        return 2
    _enable_compilation_cache()

    diffusion_cfg = DiffusionConfig(train_steps=1500)
    diffusion_params = load_or_pretrain_prior(diffusion_cfg)
    run_suite("warmup", diffusion_cfg, diffusion_params)
    res = run_suite("measured", diffusion_cfg, diffusion_params)
    res["engines"] = run_engines()
    ours = comparable_seconds(res)
    diff_s = res["part2"]["diffusion"]["wall_s"]
    print(f"[measured] comparable={ours:.2f}s diffusion={diff_s:.2f}s "
          f"(pretrained inference)", file=sys.stderr)
    for part in ("part0", "part1", "part2"):
        print(f"[metrics] {part}: "
              + json.dumps({k: v for k, v in res[part].items()
                            if isinstance(v, dict)}), file=sys.stderr)
    regressions = check_quality(res)
    if regressions:
        print(f"[quality] FAIL: {json.dumps(regressions)}", file=sys.stderr)
    else:
        print("[quality] all gates pass", file=sys.stderr)

    vs = 0.0
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)
        ref_s = baseline.get("comparable_suite_wall_s", 0.0)
        if ref_s:
            vs = ref_s / ours
    done.set()
    print(json.dumps({"metric": "suite_wall_clock_s",
                      "value": round(ours, 2), "unit": "s",
                      "vs_baseline": round(vs, 2),
                      "quality_regressions": regressions}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
