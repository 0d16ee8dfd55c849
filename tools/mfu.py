#!/usr/bin/env python
"""MFU / roofline accounting for the hot ops (BASELINE.md table source).

For each hot op: device time from a jax.profiler trace of a scan-chained
run (the axon tunnel makes wall-clock timing useless — block_until_ready is
a no-op, so ONLY trace-derived device times are trusted), FLOPs and HBM
bytes from XLA's own cost analysis of the compiled executable, then
achieved TFLOP/s, % of v5e bf16 peak, achieved GB/s, % of HBM peak, and
which roofline wall the op sits against.

v5e peaks: 197 TFLOP/s bf16 (MXU), 819 GB/s HBM.

Usage: python tools/mfu.py [--out mfu.json]   (requires the real TPU)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0    # v5e bf16
PEAK_GBS = 819.0       # v5e HBM

TRACE_DIR = "/tmp/mfu_traces"


def device_ms_from_trace(trace_dir: str) -> float:
    """Sum the XLA Ops lane (pid 3 / tid 3), excluding the while wrapper."""
    f = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(f) as fh:
        d = json.load(fh)
    total = 0.0
    for e in d["traceEvents"]:
        if (e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3
                and "dur" in e and not e["name"].startswith("while")):
            total += e["dur"]
    return total / 1e3


def _fetch_scalar(r) -> None:
    """Force device completion by fetching ONE scalar from the result tree
    (block_until_ready is a no-op over the axon tunnel)."""
    leaf = jax.tree_util.tree_leaves(r)[0]
    float(jnp.sum(jnp.asarray(leaf, dtype=jnp.float32)))


def measure(name: str, fn, args, iters: int,
            cost_fn=None, cost_args=None):
    """Trace `fn(*args)` (which internally runs `iters` iterations) for
    DEVICE TIME, and lower `cost_fn(*cost_args)` — a single-iteration
    variant — for FLOPs / bytes (XLA's cost analysis counts a scan/while
    body ONCE regardless of trip count, so per-iter numbers must come from
    an n=1 program, not the chained one). Returns the row dict."""
    if cost_fn is None:
        cost_fn, cost_args = fn, args
    ca = jax.jit(cost_fn).lower(*cost_args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))

    jitted = jax.jit(fn)
    _fetch_scalar(jitted(*args))  # warm
    tdir = os.path.join(TRACE_DIR,
                        "".join(c if c.isalnum() else "_" for c in name))
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        _fetch_scalar(jitted(*args))
    ms = device_ms_from_trace(tdir) / iters
    tflops = flops / (ms / 1e3) / 1e12 if ms > 0 else 0.0
    gbs = byts / (ms / 1e3) / 1e9 if ms > 0 else 0.0
    bound = ("HBM" if gbs / PEAK_GBS > tflops / PEAK_TFLOPS else "MXU")
    row = {"op": name, "ms": round(ms, 4), "gflops": round(flops / 1e9, 2),
           "mb": round(byts / 1e6, 1), "tflops": round(tflops, 2),
           "mfu_pct": round(100 * tflops / PEAK_TFLOPS, 1),
           "gbs": round(gbs, 1),
           "hbm_pct": round(100 * gbs / PEAK_GBS, 1), "bound": bound}
    print(json.dumps(row), flush=True)
    return row


def chain(op, x, k, n):
    def many(x, k):
        def body(c, _):
            y = op(c, k)
            return (c + y[..., :c.shape[-1]] * 1e-6).astype(c.dtype), ()
        c, _ = jax.lax.scan(body, x, None, length=n)
        return c
    return many


def main() -> int:
    from audio_inpainting_tpu.methods.neural import (
        GANTrainConfig, UNetTrainConfig, _gan_train_chunk, _nhwc, _pad4,
        _unet_train_chunk, _valid4, _d_model)
    from audio_inpainting_tpu.methods.nmf import NMFConfig, _init_wh, _mu_fit
    from audio_inpainting_tpu.models.packed_unet import PackedGeneratorUNet
    from audio_inpainting_tpu.ops import torch_stft_config
    from audio_inpainting_tpu.ops.packedconv import (
        conv3x3_packed, conv3x3_packed_dense, conv4x4s2_packed_dense,
        conv_transpose2x2_packed_dense, pack)
    from audio_inpainting_tpu.ops.stft import stft
    import optax

    assert jax.default_backend() == "tpu", "MFU accounting needs the TPU"
    rows = []
    rng = np.random.RandomState(0)
    DT = jnp.bfloat16
    N = 50

    # --- packed 3x3 convs (GAN/U-Net hot op): the SHIPPED band-matmul path
    # (conv3x3_packed), with the dense-kernel twin at L0 for comparison ---
    for ci, co, h, w, label in [(16, 16, 516, 1728, "L0"),
                                (32, 32, 258, 864, "L1"),
                                (64, 64, 129, 432, "L2")]:
        xp = pack(jnp.asarray(rng.randn(1, h, w, ci), DT))
        k = jnp.asarray(rng.randn(3, 3, ci, co), jnp.float32)
        rows.append(measure(f"conv3x3 band fwd {label} C{ci}",
                            chain(conv3x3_packed, xp, k, N),
                            (xp, k), N,
                            cost_fn=conv3x3_packed, cost_args=(xp, k)))

        def fb(c, kk):
            y, vjp = jax.vjp(lambda a, b: conv3x3_packed(a, b), c, kk)
            dx, _ = vjp(y)
            return dx
        rows.append(measure(f"conv3x3 band fwd+bwd {label} C{ci}",
                            chain(fb, xp, k, N), (xp, k), N,
                            cost_fn=fb, cost_args=(xp, k)))
    # dense twin at L0 for comparison (2.4x structural-zero FLOPs)
    xp = pack(jnp.asarray(rng.randn(1, 516, 1728, 16), DT))
    k = jnp.asarray(rng.randn(3, 3, 16, 16), jnp.float32)
    rows.append(measure("conv3x3 dense fwd L0 C16 (comparison)",
                        chain(conv3x3_packed_dense, xp, k, N), (xp, k), N,
                        cost_fn=conv3x3_packed_dense, cost_args=(xp, k)))

    # --- discriminator stride-2 conv + generator up-conv (shipped band) ---
    from audio_inpainting_tpu.ops.packedconv import (conv4x4s2_packed,
                                                     conv_transpose2x2_packed)
    xp = pack(jnp.asarray(rng.randn(1, 516, 1728, 16), DT))
    k4 = jnp.asarray(rng.randn(4, 4, 16, 32), jnp.float32)
    def s2chain(op):
        def many(x, k):
            def body(c, _):
                y = op(c, k)
                c2 = c * (1 + jnp.mean(y.astype(jnp.float32)) * 1e-9).astype(c.dtype)
                return c2, ()
            c, _ = jax.lax.scan(body, x, None, length=N)
            return c
        return many
    rows.append(measure("conv4x4s2 band fwd (D op)",
                        s2chain(conv4x4s2_packed), (xp, k4), N,
                        cost_fn=conv4x4s2_packed, cost_args=(xp, k4)))
    rows.append(measure("conv4x4s2 dense fwd (comparison)",
                        s2chain(conv4x4s2_packed_dense), (xp, k4), N,
                        cost_fn=conv4x4s2_packed_dense, cost_args=(xp, k4)))

    xp2 = pack(jnp.asarray(rng.randn(1, 129, 432, 64), DT))
    kt = jnp.asarray(rng.randn(2, 2, 64, 32), jnp.float32)
    rows.append(measure("conv_transpose2x2 band fwd (G up)",
                        s2chain(conv_transpose2x2_packed), (xp2, kt), N,
                        cost_fn=conv_transpose2x2_packed,
                        cost_args=(xp2, kt)))

    # --- DFT matmul STFT of the 10 s clip ---
    x = jnp.asarray(rng.randn(441000), jnp.float32)
    cfg = torch_stft_config(1024, 256)
    def stft_mag_n(x):
        def body(c, _):
            m = jnp.abs(stft(c, cfg))
            return c * (1 + jnp.mean(m) * 1e-12), ()
        c, _ = jax.lax.scan(body, x, None, length=10)
        return c
    rows.append(measure("stft 1024/256 10s clip (DFT matmul)", stft_mag_n,
                        (x,), 10,
                        cost_fn=lambda x: jnp.abs(stft(x, cfg)),
                        cost_args=(x,)))

    # --- NMF multiplicative-update fit (200 iters, bench shape) ---
    v = jnp.abs(jnp.asarray(rng.randn(513, 1723), jnp.float32))
    w0, h0 = _init_wh(jax.random.PRNGKey(0), jnp.mean(v), v.shape, 40)
    rows.append(measure("nmf MU fit 200it (513x1723, k=40)",
                        lambda v, w0, h0: _mu_fit(v, w0, h0, 200),
                        (v, w0, h0), 200,
                        cost_fn=lambda v, w0, h0: _mu_fit(v, w0, h0, 1),
                        cost_args=(v, w0, h0)))

    # --- full GAN epoch and U-Net epoch (production configs) ---
    gcfg = GANTrainConfig(bf16=True, scan_chunk=100)  # production defaults
    norm = jnp.asarray(rng.rand(513, 1723) * 2 - 1, jnp.float32)
    inp2d, (f0, t0) = _pad4(norm, value=-1.0)
    msk2d, _ = _pad4((norm > -0.95).astype(jnp.float32), value=1.0)
    inp, msk = _nhwc(inp2d), _nhwc(msk2d)
    vld = _nhwc(_valid4(f0, t0))
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g_vars = PackedGeneratorUNet(dtype=DT).init(kg, inp, True)
    d_vars = _d_model(gcfg).init(kd, inp, True)
    tx = optax.adam(gcfg.lr, b1=gcfg.b1, b2=gcfg.b2)
    state = (g_vars["params"], g_vars["batch_stats"], tx.init(g_vars["params"]),
             d_vars["params"], d_vars["batch_stats"], tx.init(d_vars["params"]))
    rows.append(measure(
        "GAN epoch (G+D step, bf16 packed)",
        lambda s: _gan_train_chunk(s, inp, inp, msk, vld, gcfg, 100)[0][0],
        (state,), 100,
        cost_fn=lambda s: _gan_train_chunk(s, inp, inp, msk, vld,
                                           gcfg, 1)[0][0],
        cost_args=(state,)))

    ucfg = UNetTrainConfig(bf16=True, scan_chunk=100)
    from audio_inpainting_tpu.models.packed_unet import PackedSimpleUNet
    up = PackedSimpleUNet(dtype=DT).init(jax.random.PRNGKey(1), inp)["params"]
    uopt = optax.adam(ucfg.lr).init(up)
    rows.append(measure(
        "U-Net epoch (masked MSE, bf16 packed)",
        lambda p, o: _unet_train_chunk(p, o, inp, inp, msk, vld, ucfg, 100)[0],
        (up, uopt), 100,
        cost_fn=lambda p, o: _unet_train_chunk(p, o, inp, inp, msk, vld,
                                               ucfg, 1)[0],
        cost_args=(up, uopt)))

    out = {"peak_tflops_bf16": PEAK_TFLOPS, "peak_hbm_gbs": PEAK_GBS,
           "rows": rows}
    path = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv \
        else "/tmp/mfu.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
