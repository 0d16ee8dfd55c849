#!/usr/bin/env python
"""Deep-dive diagnostics on our trained GAN: eval vs train mode, error
distribution over the magnitude spectrogram, and which bins drive the SNR.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_inpainting_tpu.methods.neural import (
    GANTrainConfig, _gan_train_chunk, _nhwc, _pad4, _valid4)
from audio_inpainting_tpu.models.unet import Discriminator, GeneratorUNet
from audio_inpainting_tpu.metrics import local_snr_db, lsd_db, snr_db
from audio_inpainting_tpu.ops import istft, stft
from audio_inpainting_tpu.ops.stft import magphase, polar
from tools.gan_ab import _CFG, prepare


def main(epochs=1500, seed=0):
    sr, data, damaged, n, gs, ge = prepare()
    zd = stft(jnp.asarray(damaged), _CFG)
    mag_d, phase_d = magphase(zd)
    mn, mx = jnp.min(mag_d), jnp.max(mag_d)
    norm = (mag_d - mn) / (mx - mn) * 2.0 - 1.0
    keep2d = (norm > -0.95).astype(jnp.float32)
    z_r = stft(jnp.asarray(data), _CFG)
    real_mag = jnp.abs(z_r)
    real_n = (real_mag - mn) / (mx - mn) * 2.0 - 1.0

    cfg = GANTrainConfig(bf16=False, scan_chunk=100)
    inp2d, (f0, t0) = _pad4(jnp.asarray(norm, jnp.float32))
    real2d, _ = _pad4(jnp.asarray(real_n, jnp.float32))
    msk2d, _ = _pad4(keep2d, value=1.0)
    inp, real, msk = _nhwc(inp2d), _nhwc(real2d), _nhwc(msk2d)
    vld = _nhwc(_valid4(f0, t0))

    key = jax.random.PRNGKey(seed)
    kg, kd = jax.random.split(key)
    g_model, d_model = GeneratorUNet(), Discriminator()
    g_vars = g_model.init(kg, inp, True)
    d_vars = d_model.init(kd, inp, True)
    tx = optax.adam(cfg.lr, b1=cfg.b1, b2=cfg.b2)
    state = (g_vars["params"], g_vars["batch_stats"], tx.init(g_vars["params"]),
             d_vars["params"], d_vars["batch_stats"], tx.init(d_vars["params"]))
    done = 0
    while done < epochs:
        state, _ = _gan_train_chunk(state, inp, real, msk, vld, cfg, 100)
        done += 100
    gp, gbs = state[0], state[1]

    for mode, train in (("eval", False), ("train", True)):
        if train:
            fake, _ = GeneratorUNet().apply({"params": gp, "batch_stats": gbs},
                                            inp, True, mutable=["batch_stats"])
        else:
            fake = GeneratorUNet().apply({"params": gp, "batch_stats": gbs},
                                         inp, False)
        final = (inp * msk + fake * (1 - msk))[0, :f0, :t0, 0]
        final_mag = (final + 1.0) / 2.0 * (mx - mn) + mn
        out = np.clip(np.asarray(istft(polar(final_mag, phase_d), _CFG, n)),
                      -1, 1)
        err_n = np.asarray((final - real_n))
        hole = np.asarray(1 - keep2d) > 0.5
        err_mag = np.asarray(final_mag - real_mag)
        rel = np.abs(err_mag) / float(mx)
        print(json.dumps({
            "mode": mode,
            "snr_db": round(float(snr_db(data, out)), 3),
            "local_snr_db": round(float(local_snr_db(data, out, gs, ge)), 3),
            "lsd_db": round(float(lsd_db(data, out)), 3),
            "hole_l1": round(float(np.mean(np.abs(err_n[hole]))), 5),
            "hole_l2": round(float(np.sqrt(np.mean(err_n[hole] ** 2))), 5),
            "err_mag_l2_rel": round(float(np.sqrt(np.mean(rel ** 2))), 6),
            "err_mag_p99_rel": round(float(np.percentile(rel, 99)), 5),
            "err_mag_max_rel": round(float(rel.max()), 5),
            "sig_l2_rel": round(float(np.sqrt(np.mean(
                (np.asarray(real_mag) / float(mx)) ** 2))), 6),
        }), flush=True)
        # where are the worst errors? (freq rows)
        row_err = (rel ** 2).mean(axis=1)
        print("worst rows:", np.argsort(row_err)[-6:][::-1].tolist(),
              "of", rel.shape[0], flush=True)


if __name__ == "__main__":
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 1500)
