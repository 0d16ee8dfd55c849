#!/usr/bin/env python
"""Device-time per GAN epoch from a jax.profiler trace (tunnel-safe).

Runs _gan_train_chunk for N epochs inside a trace and reports total XLA-op
device time / N. Toggle the conv dispatch with AIT_PACKED_DENSE=0|1 and the
discriminator with argv[1] in {unpacked, packed}; separate processes per
config (the jit cache does not key on the env var).
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
import optax

from audio_inpainting_tpu.methods.neural import (GANTrainConfig, _d_model,
                                                 _gan_train_chunk, _nhwc,
                                                 _pad4, _valid4)
from audio_inpainting_tpu.models.packed_unet import PackedGeneratorUNet

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mfu import TRACE_DIR, device_ms_from_trace  # noqa: E402


def main() -> int:
    packed_d = (sys.argv[1] if len(sys.argv) > 1 else "unpacked") == "packed"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    flat = (sys.argv[3] if len(sys.argv) > 3 else "flat") == "flat"
    vmapd = (sys.argv[4] if len(sys.argv) > 4 else "seq") == "vmapd"
    cfg = GANTrainConfig(bf16=True, scan_chunk=n, packed_d=packed_d,
                         flat_opt=flat, vmap_d=vmapd)
    rng = np.random.RandomState(0)
    norm = jnp.asarray(rng.rand(513, 1723) * 2 - 1, jnp.float32)
    inp2d, (f0, t0) = _pad4(norm, value=-1.0)
    msk2d, _ = _pad4((norm > -0.95).astype(jnp.float32), value=1.0)
    inp, msk = _nhwc(inp2d), _nhwc(msk2d)
    vld = _nhwc(_valid4(f0, t0))
    kg, kd = jax.random.split(jax.random.PRNGKey(0))
    g_vars = PackedGeneratorUNet(dtype=jnp.bfloat16).init(kg, inp, True)
    d_vars = _d_model(cfg).init(kd, inp, True)
    tx = optax.adam(cfg.lr, b1=cfg.b1, b2=cfg.b2)
    state = (g_vars["params"], g_vars["batch_stats"],
             tx.init(g_vars["params"]), d_vars["params"],
             d_vars["batch_stats"], tx.init(d_vars["params"]))

    def run(s):
        s, (dl, gl) = _gan_train_chunk(s, inp, inp, msk, vld, cfg, n)
        return s, float(dl[-1])

    state, _ = run(state)  # compile + warm
    # effective conv dispatch: env override, else the band-form default
    # (ops/packedconv._DENSE_DEFAULT is empty — unset env means ALL band)
    dense = os.environ.get("AIT_PACKED_DENSE", "band-default")
    tdir = os.path.join(
        TRACE_DIR,
        f"gan_epoch_{dense}_"
        f"{'pd' if packed_d else 'ud'}_{'fl' if flat else 'pl'}"
        f"{'_vd' if vmapd else ''}")
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        state, _ = run(state)
    ms = device_ms_from_trace(tdir)
    print(json.dumps({
        "dense": dense,
        "packed_d": packed_d, "flat_opt": flat, "vmap_d": vmapd, "epochs": n,
        "ms_per_epoch": round(ms / n, 3),
        "wall_1500_est_s": round(ms / n * 1500 / 1e3, 1)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
