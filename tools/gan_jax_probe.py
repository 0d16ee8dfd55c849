#!/usr/bin/env python
"""Our GAN's trajectory with the same logging as tools/gan_torch_probe.py.

Trains in 25-epoch chunks via methods.neural._gan_train_chunk and logs
rec/adv/d losses plus composite-vs-real hole L1 at the same epochs, so the
two trajectories can be compared point-for-point.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audio_inpainting_tpu.methods.neural import (
    GANTrainConfig, _gan_train_chunk, _nhwc, _pad4, _valid4)
from audio_inpainting_tpu.models.unet import Discriminator, GeneratorUNet
from audio_inpainting_tpu.metrics import local_snr_db, lsd_db, snr_db
from audio_inpainting_tpu.ops import istft
from audio_inpainting_tpu.ops.stft import polar
from tools.gan_ab import _CFG, prepare

import optax


def main(epochs=300, log_every=25, seed=0, bf16=False):
    sr, data, damaged, n, gs, ge = prepare()
    from audio_inpainting_tpu.ops import stft
    from audio_inpainting_tpu.ops.stft import magphase
    zd = stft(jnp.asarray(damaged), _CFG)
    mag_d, phase_d = magphase(zd)
    mn, mx = jnp.min(mag_d), jnp.max(mag_d)
    norm = (mag_d - mn) / (mx - mn) * 2.0 - 1.0
    keep = (norm > -0.95).astype(jnp.float32)
    z_r = stft(jnp.asarray(data), _CFG)
    real_n = ((jnp.abs(z_r) - mn) / (mx - mn)) * 2.0 - 1.0

    cfg = GANTrainConfig(bf16=bf16, scan_chunk=log_every)
    key = jax.random.PRNGKey(seed)
    inp2d, (f0, t0) = _pad4(jnp.asarray(norm, jnp.float32))
    real2d, _ = _pad4(jnp.asarray(real_n, jnp.float32))
    msk2d, _ = _pad4(jnp.asarray(keep, jnp.float32), value=1.0)
    inp, real, msk = _nhwc(inp2d), _nhwc(real2d), _nhwc(msk2d)
    vld = _nhwc(_valid4(f0, t0))

    kg, kd = jax.random.split(key)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    g_model, d_model = GeneratorUNet(dtype=dt), Discriminator(dtype=dt)
    g_vars = g_model.init(kg, inp, True)
    d_vars = d_model.init(kd, inp, True)
    tx = optax.adam(cfg.lr, b1=cfg.b1, b2=cfg.b2)
    state = (g_vars["params"], g_vars["batch_stats"], tx.init(g_vars["params"]),
             d_vars["params"], d_vars["batch_stats"], tx.init(d_vars["params"]))

    hole2d = (1.0 - msk2d) * _valid4(f0, t0)
    t0_ = time.time()
    done = 0
    while done < epochs:
        state, (dl, gl) = _gan_train_chunk(state, inp, real, msk, vld, cfg,
                                           log_every)
        done += log_every
        gp, gbs = state[0], state[1]
        fake, _ = GeneratorUNet(dtype=dt).apply(
            {"params": gp, "batch_stats": gbs}, inp, True,
            mutable=["batch_stats"])
        completed = inp * msk2d[None, :, :, None] + fake * (1 - msk2d)[None, :, :, None]
        hl1 = float(jnp.sum(jnp.abs((completed[0, :, :, 0] - real2d) * hole2d))
                    / jnp.sum(hole2d))
        print(json.dumps({"ep": done, "g": round(float(gl[-1]), 5),
                          "d": round(float(dl[-1]), 5),
                          "hole_l1": round(hl1, 5),
                          "s": round(time.time() - t0_, 1)}), flush=True)

    gp, gbs = state[0], state[1]
    fake = GeneratorUNet(dtype=dt).apply({"params": gp, "batch_stats": gbs},
                                         inp, False)
    final = inp * msk + fake * (1.0 - msk)
    final_norm = final[0, :f0, :t0, 0]
    final_mag = (final_norm + 1.0) / 2.0 * (mx - mn) + mn
    out = np.clip(np.asarray(istft(polar(final_mag, phase_d), _CFG, n)), -1, 1)
    print(json.dumps({"variant": f"jax-{epochs}ep",
                      "snr_db": round(float(snr_db(data, out)), 3),
                      "local_snr_db": round(float(local_snr_db(data, out, gs, ge)), 3),
                      "lsd_db": round(float(lsd_db(data, out)), 3)}), flush=True)


if __name__ == "__main__":
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 300,
         bf16="--bf16" in sys.argv)
