#!/usr/bin/env python
"""Multi-clip serving throughput on the real chip (and RTF per clip).

The reference restores one clip per process run; this measures the
production path: N independent per-clip U-Nets trained and composited in
one batched program (parallel/batch.py — clips shard over a dp mesh when
one is available; on a single chip they pipeline through lax.map with zero
relayout between clips).

Prints one JSON line per batch size: wall for the batch, clips/s,
real-time factor (10 s of audio restored per clip), and the projected
8-chip dp throughput (the dp mode is embarrassingly parallel — validated
bit-identical to meshless execution by __graft_entry__.dryrun_multichip).

Usage: python tools/serve_throughput.py [epochs] [batch_sizes...]
       SERVE_METHOD=gan python tools/serve_throughput.py [epochs] [sizes...]
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

import os  # noqa: E402

from audio_inpainting_tpu.methods.neural import (  # noqa: E402
    GANTrainConfig, UNetTrainConfig)
from audio_inpainting_tpu.parallel import restore_clips_gan  # noqa: E402
from audio_inpainting_tpu.parallel.batch import restore_clips_unet  # noqa: E402


def main() -> int:
    method = os.environ.get("SERVE_METHOD", "unet")
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    sizes = [int(s) for s in sys.argv[2:]] or [1, 2, 4, 8]
    f, t = 513, 1723            # part-1 spectrogram of the 10 s clip
    clip_seconds = 10.0
    rng = np.random.RandomState(0)

    for n in sizes:
        for tag in ("compile", "steady"):
            t0 = time.time()
            if method == "gan":
                real = jnp.asarray(rng.rand(n, f, t) * 2 - 1, jnp.float32)
                msk2 = (jnp.asarray(rng.rand(n, f, t), jnp.float32) > 0.2
                        ).astype(jnp.float32)
                norm = real * msk2 + (-1.0) * (1 - msk2)
                cfg = GANTrainConfig(epochs=epochs, bf16=True,
                                     scan_chunk=min(100, epochs))
                restored, _ = restore_clips_gan(norm, real, msk2, cfg,
                                                mesh=None)
            else:
                mag = jnp.asarray(rng.rand(n, f, t, 1), jnp.float32)
                msk = (jnp.asarray(rng.rand(n, f, t, 1), jnp.float32) > 0.3
                       ).astype(jnp.float32)
                cfg = UNetTrainConfig(epochs=epochs,
                                      scan_chunk=min(100, epochs))
                restored, _ = restore_clips_unet(mag, msk, cfg=cfg,
                                                 mesh=None)
            _ = float(jnp.sum(restored))      # fence (tunnel-safe)
            wall = time.time() - t0
            if tag == "steady":
                print(json.dumps({
                    "method": method, "batch": n, "epochs": epochs,
                    "wall_s": round(wall, 2),
                    "clips_per_s": round(n / wall, 3),
                    "rtf": round(n * clip_seconds / wall, 2),
                    "projected_8chip_clips_per_s": round(8 * n / wall, 2),
                }))
            else:
                print(f"[compile] batch={n} {wall:.1f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
