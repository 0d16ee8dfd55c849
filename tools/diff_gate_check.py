#!/usr/bin/env python
"""CPU check of the bench's EXACT pretrained-diffusion leg vs its gates.

bench.py pretrains the DDPM prior on the damaged bench clip (hole masked
out of the loss) and runs sample+Griffin-Lim inference inside the measured
suite; its gates require part2 diffusion snr >= 3.0 and local >= -1.0.
BASELINE.md lists this path's quality as pending — this tool measures it
standalone (any platform; slow on CPU) so a gate violation is found before
the official bench run, not by it.
"""

from __future__ import annotations

import json
import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

import bench  # noqa: E402
from audio_inpainting_tpu.corrupt import center_gap_bounds  # noqa: E402
from audio_inpainting_tpu.io import load_mono_normalized  # noqa: E402
from audio_inpainting_tpu.methods.diffusion import (  # noqa: E402
    DiffusionConfig, diffusion_restore_audio)
from audio_inpainting_tpu.metrics import snr_db  # noqa: E402


def main() -> int:
    cfg = DiffusionConfig(train_steps=1500)
    t0 = time.time()
    params = bench.pretrain_diffusion(cfg)
    pre_s = time.time() - t0

    sr, data = load_mono_normalized(bench.INPUT)
    data = data[:10 * sr]
    gs, ge = center_gap_bounds(len(data), sr)
    damaged = data.copy()
    damaged[gs:ge] = 0.0
    # the benched leg consumes the damaged signal RELOADED through the
    # int16 WAV chain (pipelines/part2.py writes part2_data.wav and every
    # downstream method reads it back); skipping the quantization here
    # would let this tool's verdict diverge from the official bench near
    # the gate boundary
    import os
    import tempfile

    from audio_inpainting_tpu.io.wav import save_wav_int16
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        save_wav_int16(damaged, sr, f.name)
        _, damaged = load_mono_normalized(f.name)
    os.unlink(f.name)

    t0 = time.time()
    out = np.clip(diffusion_restore_audio(damaged, sr, cfg, key=0,
                                          params=params), -1.0, 1.0)
    infer_s = time.time() - t0
    # the gate floors come from bench.GATES itself, so tightening the
    # official gates tightens this tool with them
    gates = {metric: floor for part, method, metric, floor in bench.GATES
             if part == "part2" and method == "diffusion"}
    res = {
        "snr_db": round(float(snr_db(data, out)), 3),
        "local_snr_db": round(float(snr_db(data[gs:ge], out[gs:ge])), 3),
        "pretrain_s": round(pre_s, 1),
        "infer_s": round(infer_s, 1),
        "gates": gates,
    }
    res["pass"] = all(res[m] >= floor for m, floor in gates.items())
    print(json.dumps(res))
    return 0 if res["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
