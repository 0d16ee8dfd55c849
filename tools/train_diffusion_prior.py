#!/usr/bin/env python
"""Train the corpus diffusion prior — a real PRETRAINED prior (VERDICT r3 #3).

The reference's diffusion method is INFERENCE with a prior trained on other
data (hub-downloaded riffusion weights, main_diffusion_gap.py:16-19). This
tool builds the framework-native equivalent: train the spectrogram DDPM on
a procedurally generated music-like corpus (corrupt/synth.py) that provably
EXCLUDES the bench clip, and persist the orbax checkpoint the bench loads
(bench.py PRIOR_DIR -> checkpoints/diffusion_prior, committed).

Also reports the generalization gap: part-2 restore of the bench clip with
(a) the corpus prior and (b) the on-clip-adapted prior (what bench.py used
through round 3 — trained on the damaged bench clip with the hole masked
out), so BASELINE.md can state both numbers honestly.

    python tools/train_diffusion_prior.py [--clips 16] [--steps 12000]
        [--out checkpoints/diffusion_prior] [--eval-only]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

REF = os.environ.get("BENCH_INPUT",
                     "/root/reference/vocals_accompaniment_10s.wav")


def build_corpus(n_clips: int, sr: int):
    """Clean clips + corrupted variants (center 2 s gap) with loss masks."""
    import jax.numpy as jnp

    from audio_inpainting_tpu.corrupt import center_gap_bounds
    from audio_inpainting_tpu.corrupt.synth import synth_music_clip
    from audio_inpainting_tpu.methods.diffusion import (logspec_to_image,
                                                        mask_from_image,
                                                        wav_to_logspec)

    images, masks = [], []
    for i in range(n_clips):
        clip = synth_music_clip(1000 + i, sr=sr, seconds=10.0)
        img, _, _ = logspec_to_image(np.asarray(wav_to_logspec(
            jnp.asarray(clip))))
        images.append(img)
        masks.append(np.zeros_like(img))
        if i % 2 == 0:      # corrupted variant: intact regions only in loss
            dmg = clip.copy()
            gs, ge = center_gap_bounds(len(dmg), sr)
            dmg[gs:ge] = 0.0
            dimg, _, _ = logspec_to_image(np.asarray(wav_to_logspec(
                jnp.asarray(dmg))))
            images.append(dimg)
            masks.append(mask_from_image(dimg))
    return images, masks


def eval_on_bench(params, cfg, tag: str) -> dict:
    """Part-2 style restore of the bench clip; SNR/local/LSD + wall."""
    import jax.numpy as jnp

    from audio_inpainting_tpu.corrupt import center_gap_bounds
    from audio_inpainting_tpu.io import load_mono_normalized
    from audio_inpainting_tpu.methods.diffusion import diffusion_restore_audio
    from audio_inpainting_tpu.metrics.snr import lsd_db, snr_db

    sr, data = load_mono_normalized(REF)
    data = data[:10 * sr]
    gs, ge = center_gap_bounds(len(data), sr)
    damaged = data.copy()
    damaged[gs:ge] = 0.0
    t0 = time.time()
    out = diffusion_restore_audio(damaged, sr, cfg, key=0, params=params)
    wall = time.time() - t0
    res = {
        "snr_db": float(snr_db(data, out)),
        "local_snr_db": float(snr_db(data[gs:ge], out[gs:ge])),
        "lsd_db": float(lsd_db(jnp.asarray(data), jnp.asarray(out))),
        "wall_s": round(wall, 2)}
    print(f"[eval:{tag}] {json.dumps(res)}", file=sys.stderr)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--out", default="checkpoints/diffusion_prior")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training; evaluate the checkpoint in --out")
    ap.add_argument("--sweep-fill", action="store_true",
                    help="after training, sweep fill_energy_ratio on the "
                         "bench clip and print the curve")
    ap.add_argument("--skip-adapted", action="store_true",
                    help="skip the on-clip-adapted baseline leg")
    args = ap.parse_args()

    from audio_inpainting_tpu.methods.diffusion import (DiffusionConfig,
                                                        train_spectrogram_ddpm)

    cfg = DiffusionConfig(train_steps=args.steps)
    if args.eval_only:
        from audio_inpainting_tpu.utils.checkpoint import load_params

        params = load_params(args.out)
    else:
        sr = 44100
        t0 = time.time()
        images, masks = build_corpus(args.clips, sr)
        print(f"[corpus] {len(images)} spectrogram images "
              f"({args.clips} clips + corrupted variants) in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        params = train_spectrogram_ddpm(images, cfg, key=0,
                                        checkpoint_dir=args.out,
                                        masks_u8=masks)
        import jax

        jax.block_until_ready(params)
        print(f"[train] {args.steps} steps in {time.time() - t0:.1f}s -> "
              f"{args.out}", file=sys.stderr)

    corpus_res = eval_on_bench(params, cfg, "corpus-prior")

    if args.sweep_fill:
        # fill_energy_ratio sweep for THIS prior (VERDICT r4 #3): the fill
        # power target is prior-dependent; re-measure it whenever the
        # corpus changes and record the curve
        import dataclasses

        sweep = {}
        for ratio in (0.08, 0.12, 0.15, 0.20, 0.30, 0.50):
            r_cfg = dataclasses.replace(cfg, fill_energy_ratio=ratio)
            sweep[str(ratio)] = eval_on_bench(params, r_cfg, f"fill={ratio}")
        print(json.dumps({"fill_sweep": sweep}))

    if args.skip_adapted:
        print(json.dumps({"corpus_prior": corpus_res,
                          "train_steps": args.steps,
                          "checkpoint": args.out}))
        return 0

    # on-clip-adapted baseline (the round-3 bench mode) for the gap report
    import jax.numpy as jnp

    from audio_inpainting_tpu.corrupt import center_gap_bounds
    from audio_inpainting_tpu.io import load_mono_normalized
    from audio_inpainting_tpu.methods.diffusion import (logspec_to_image,
                                                        mask_from_image,
                                                        wav_to_logspec)

    sr, data = load_mono_normalized(REF)
    data = data[:10 * sr]
    gs, ge = center_gap_bounds(len(data), sr)
    damaged = data.copy()
    damaged[gs:ge] = 0.0
    img, _, _ = logspec_to_image(np.asarray(wav_to_logspec(
        jnp.asarray(damaged))))
    mask = mask_from_image(img)
    adapt_cfg = DiffusionConfig(train_steps=1500)
    t0 = time.time()
    adapted = train_spectrogram_ddpm([img], adapt_cfg, key=0,
                                     masks_u8=[mask])
    import jax

    jax.block_until_ready(adapted)
    print(f"[train] on-clip adaptation 1500 steps in "
          f"{time.time() - t0:.1f}s", file=sys.stderr)
    adapted_res = eval_on_bench(adapted, adapt_cfg, "on-clip-adapted")

    print(json.dumps({"corpus_prior": corpus_res,
                      "on_clip_adapted": adapted_res,
                      "train_steps": args.steps,
                      "checkpoint": args.out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
