#!/usr/bin/env python
"""Attribute gan_train_restore's WALL time phase by phase on the real TPU.

Round-2 recorded 33.2 s wall for the 1500-epoch GAN against ~19 s of traced
device time; this probe times each phase of the exact production call path
(pad/stage, jitted init, the 15 scan-chunk dispatches, tail-snapshot evals,
final composite + host fetch) with a device-sync fence between phases so the
async dispatch queue can't smear one phase's cost into the next.

Usage: python tools/gan_wall_probe.py [epochs] — run twice; first run
includes compiles, the second is the steady state that matches bench.py.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from audio_inpainting_tpu.methods.neural import (  # noqa: E402
    GANTrainConfig, _d_model, _gan_train_chunk, _jit_adam_init,
    _jit_apply_eval, _jit_init_train, _nhwc, _pad4, _valid4)
from audio_inpainting_tpu.models.packed_unet import PackedGeneratorUNet  # noqa: E402


def fence(x=None):
    """Force the dispatch queue to drain (block_until_ready is a no-op over
    the axon tunnel — fetch a scalar instead)."""
    if x is None:
        x = jnp.zeros(())
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def main() -> int:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    # the production part-2 config's one-draw path (pipelines/part2.py);
    # retry_l1 is a host-side policy outside this probe's scope
    cfg = GANTrainConfig(bf16=True, epochs=epochs, ema_decay=0.99,
                         ema_scope="gap")
    rng = np.random.RandomState(0)
    norm_h = rng.rand(513, 1723).astype(np.float32) * 2 - 1

    for run in ("compile", "steady"):
        t: dict[str, float] = {}
        t0 = time.time()
        inp2d, (f0, t0sh) = _pad4(jnp.asarray(norm_h, jnp.float32), value=-1.0)
        msk2d, _ = _pad4(jnp.asarray((norm_h > -0.95).astype(np.float32)),
                         value=1.0)
        inp, msk = _nhwc(inp2d), _nhwc(msk2d)
        vld = _nhwc(_valid4(f0, t0sh))
        fence(inp)
        t["stage_inputs"] = time.time() - t0

        g_model = PackedGeneratorUNet(dtype=jnp.bfloat16)
        d_model = _d_model(cfg)
        t0 = time.time()
        kg, kd = jax.random.split(jax.random.PRNGKey(0))
        g_vars = _jit_init_train(g_model, kg, inp)
        d_vars = _jit_init_train(d_model, kd, inp)
        fence(g_vars["params"])
        fence(d_vars["params"])
        t["model_init"] = time.time() - t0

        t0 = time.time()
        state = (g_vars["params"], g_vars["batch_stats"],
                 _jit_adam_init(g_vars["params"]), d_vars["params"],
                 d_vars["batch_stats"], _jit_adam_init(d_vars["params"]))
        if cfg.ema_decay > 0.0:
            state += (jax.tree_util.tree_map(jnp.zeros_like,
                                             g_vars["params"]),)
        fence(state[2])
        t["opt_init"] = time.time() - t0

        t0 = time.time()
        done, n_chunks = 0, 0
        while done < cfg.epochs:
            n = min(cfg.scan_chunk, cfg.epochs - done)
            state, (dl, gl) = _gan_train_chunk(state, inp, inp, msk, vld,
                                               cfg, n)
            done += n
            n_chunks += 1
        fence(dl)
        t["train_chunks"] = time.time() - t0

        t0 = time.time()
        # readout IS gan_train_restore's (the shared helper)
        from audio_inpainting_tpu.methods.neural import gan_readout_fake
        fake = gan_readout_fake(
            lambda p, bs: _jit_apply_eval(g_model, p, bs, inp),
            state, msk, vld, cfg)
        final = inp * msk + fake * (1.0 - msk)
        out = np.asarray(final[0, :f0, :t0sh, 0])
        t["eval_and_fetch"] = time.time() - t0

        total = sum(t.values())
        print(json.dumps({"run": run, "epochs": cfg.epochs,
                          "chunks": n_chunks, "out_sum": float(out.sum()),
                          **{k: round(v, 2) for k, v in t.items()},
                          "total_s": round(total, 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
