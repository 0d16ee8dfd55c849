#!/usr/bin/env python
"""Griffin-Lim iteration cost: fused row-space body vs naive istft∘stft.

Traces 32-iteration loops at the production diffusion shape (n_fft=2048,
hop=512, 10 s clip → 1025x862 mag, length=441000) and reports device
ms/iter for both bodies (DESIGN.md source). Run on the real TPU.
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audio_inpainting_tpu.ops.griffin_lim import _fused_ok, _iter_fused
from audio_inpainting_tpu.ops.stft import (hann_window, istft, overlap_add,
                                           stft, torch_stft_config)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mfu import TRACE_DIR, device_ms_from_trace  # noqa: E402

N_ITER = 32


def loop(body, z0):
    def run(z):
        def f(_, c):
            zz, prev = c
            rebuilt = body(zz)
            rebuilt2 = rebuilt - (0.99 / 1.99) * prev
            ang = rebuilt2 / jnp.maximum(jnp.abs(rebuilt2), 1e-16)
            return jnp.abs(z0) * ang, rebuilt
        c, _ = jax.lax.fori_loop(0, N_ITER, f, (z, jnp.zeros_like(z)))
        return c
    return run


def trace_ms(tag, fn, z0):
    jitted = jax.jit(fn)
    jax.block_until_ready(jitted(z0))
    tdir = os.path.join(TRACE_DIR, f"gl_{tag}")
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        jax.block_until_ready(jitted(z0))
    ms = device_ms_from_trace(tdir)
    # include the while-op wrapper lane too (fori_loop shows as while)
    return ms


def main() -> int:
    assert jax.default_backend() == "tpu"
    rng = np.random.RandomState(0)
    length = 441000
    cfg = torch_stft_config(2048, 512)
    x = jnp.asarray(rng.randn(length), jnp.float32)
    z0 = stft(x, cfg)
    F = z0.shape[1]
    assert _fused_ok(cfg, length, F)
    win = hann_window(cfg.n_fft)
    den = overlap_add(jnp.broadcast_to(win * win, (F, cfg.n_fft)),
                      cfg.hop, None)
    den_safe = jnp.where(den > 1e-11, den, 1.0)

    fused = loop(lambda z: _iter_fused(z, cfg, length, win, den_safe), z0)
    naive = loop(lambda z: stft(istft(z, cfg, length), cfg)[:, :F], z0)

    ms_f = trace_ms("fused", fused, z0)
    ms_n = trace_ms("naive", naive, z0)
    out = {"shape": [int(z0.shape[0]), int(F)], "n_iter": N_ITER,
           "fused_ms_per_iter": round(ms_f / N_ITER, 3),
           "naive_ms_per_iter": round(ms_n / N_ITER, 3),
           "speedup": round(ms_n / ms_f, 2)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
