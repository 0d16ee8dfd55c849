"""Batch serving: restore a directory of damaged WAVs in one device program.

The reference restores one clip per script run; this is the corpus-scale
path the TPU design buys — every clip's per-clip network trains
simultaneously (parallel/batch.py U-Net mode, parallel/gan_batch.py GAN
mode), clips sharded over the mesh's dp axis.

Per clip: STFT (1024/256, the reference neural methods' convention), blind
damage detection from silent STFT columns (>=90% of the hop window under
1e-4 — main4_NMF_gap.py:28-40 semantics), batched restore, composite,
iSTFT with the damaged clip's phase, int16 WAV out.

Unequal lengths are handled by padding every spectrogram to the batch's max
frame count with silence marked KEPT (pad columns never train or composite
into the output, which is trimmed to each clip's true length).
"""

from __future__ import annotations

import glob
import os
import time

import jax.numpy as jnp
import numpy as np

from ..corrupt import silent_frame_columns
from ..io import load_mono_normalized, save_wav_int16
from ..ops import istft, stft, torch_stft_config
from ..ops.stft import magphase, polar

_CFG = torch_stft_config(1024, 256)


def _analyze(path: str):
    sr, x = load_mono_normalized(path)
    z = stft(jnp.asarray(x), _CFG)
    mag, phase = magphase(z)
    n_frames = int(mag.shape[1])
    idx = silent_frame_columns(x, n_frames, _CFG.hop,
                               threshold=1e-4, silent_fraction=0.9)
    bad = np.zeros(n_frames, bool)
    bad[idx] = True
    return sr, x, np.asarray(mag), phase, bad


def _pad_to(a: np.ndarray, t: int, value: float) -> np.ndarray:
    if a.shape[1] >= t:          # longer than the batch frame: truncate
        return a[:, :t]
    return np.pad(a, ((0, 0), (0, t - a.shape[1])), constant_values=value)


def _true_extent_mask(shape, f: int, clips) -> np.ndarray:
    """1 over each clip's true (f, t_i) extent of the padded batch array
    (shared by the unet and gan branches: pad cells must never enter a
    reconstruction loss)."""
    valid = np.zeros(shape, np.float32)
    for i, c in enumerate(clips):
        valid[i, :f, :min(c[2].shape[1], shape[2])] = 1.0
    return valid


def _synthetic_train_masks(seed: int, clips, masks: np.ndarray) -> np.ndarray:
    """Per-clip synthetic stripe masks for serving-mode U-Net training
    (1 = keep), drawn over each clip's TRUE frame extent — never the
    divisor/batch padding. The stripe policy (width clamps, >=1 stripe,
    resample-off-damage) lives in corrupt.training_stripes, shared with the
    blind `api.restore` U-Net branch."""
    import jax

    from ..corrupt import training_stripes

    _, _, t_pad = masks.shape
    syn = np.ones_like(masks)
    base = jax.random.PRNGKey(seed)
    for i, c in enumerate(clips):
        t_i = min(c[2].shape[1], t_pad)
        intact = masks[i, 0, :t_i] > 0       # full-band stripes: row 0 view
        syn[i, :, :t_i] = training_stripes(
            jax.random.fold_in(base, i), t_i, intact)[None, :]
    return syn


def run_serve(input_dir: str, output_dir: str, method: str = "unet",
              epochs: int = 400, originals_dir: str | None = None,
              seed: int = 0, devices: int = 1,
              window_s: float | None = None) -> dict:
    """Restore every WAV under input_dir into output_dir; returns metrics.

    window_s: long-file mode — each clip restores only fixed windows around
    its detected damage (methods/windowed.py: O(damage) work, static window
    shapes, exact clean passthrough; unet windows batch over the dp mesh).
    Without it, whole clips batch over the mesh (unet/gan) or run the
    per-clip facade.
    """
    from ..methods.neural import GANTrainConfig, UNetTrainConfig
    from ..parallel import make_mesh, restore_clips_gan
    from ..parallel.batch import restore_clips_unet

    paths = sorted(glob.glob(os.path.join(input_dir, "*.wav")))
    if not paths:
        raise FileNotFoundError(f"no .wav files under {input_dir}")
    os.makedirs(output_dir, exist_ok=True)
    t0 = time.time()

    clips, kept_paths, skipped = [], [], []
    for p in paths:
        try:
            clips.append(_analyze(p))
            kept_paths.append(p)
        except Exception as e:  # unreadable/corrupt container: skip, don't
            skipped.append({"file": os.path.basename(p),   # kill the batch
                            "error": f"{type(e).__name__}: {e}"})
    if not clips:
        raise ValueError(f"no readable .wav files under {input_dir}: "
                         f"{skipped}")
    paths = kept_paths

    orig_clips = None
    if method == "gan":
        if originals_dir is None:
            raise ValueError("gan serving needs --originals (the reference "
                             "GAN trains against the clean clip, "
                             "main_gan_gap.py:103-108)")
        kept2, orig_clips = [], []
        for p, c in zip(paths, clips):
            op = os.path.join(originals_dir, os.path.basename(p))
            try:
                orig_clips.append(_analyze(op))
                kept2.append((p, c))
            except Exception as e:   # missing/corrupt original: skip clip
                skipped.append({"file": os.path.basename(p),
                                "error": f"original: "
                                         f"{type(e).__name__}: {e}"})
        if not kept2:
            raise ValueError(f"no clip under {input_dir} has a readable "
                             f"original in {originals_dir}: {skipped}")
        paths = [p for p, _ in kept2]
        clips = [c for _, c in kept2]

    if window_s is not None:
        import jax

        from ..methods.windowed import restore_windowed

        n_dev = min(max(devices, 1), jax.device_count())
        wmesh = make_mesh(n_dev) if n_dev > 1 else None
        results = {"method": method, "clips": len(clips), "epochs": epochs,
                   "window_s": window_s, "skipped": skipped, "files": {}}
        for i, (path, (sr, x, mag, _phase, cols)) in enumerate(
                zip(paths, clips)):
            kw = {}
            if method in ("unet", "gan"):
                kw["epochs"] = epochs
            elif method == "diffusion":
                kw["train_steps"] = epochs
            y = restore_windowed(
                x, sr, method=method, window_s=window_s, seed=seed,
                original=orig_clips[i][1] if method == "gan" else None,
                batch_windows=(method == "unet"), mesh=wmesh, **kw)
            name = os.path.basename(path)
            save_wav_int16(y, sr, os.path.join(output_dir, name))
            results["files"][name] = {"frames": int(mag.shape[1]),
                                      "damaged_cols": int(cols.sum())}
        results["wall_s"] = round(time.time() - t0, 2)
        return results

    f = clips[0][2].shape[0]
    g = len(clips)
    # frame count: batch max, padded so the models' pool/packing divisors
    # hold (T % 32 covers both the U-Net's %4 and the packed GAN's %32)
    t_max = max(c[2].shape[1] for c in clips)
    t_pad = t_max + ((-t_max) % 32)
    # mesh divisibility: repeat the last clip and drop its extra outputs.
    # make_mesh silently truncates to the available devices, so size the
    # batch padding from what the mesh actually has.
    if devices < 1:
        raise ValueError(f"--devices must be >= 1, got {devices}")
    import jax

    devices = min(devices, jax.device_count())
    mesh = make_mesh(devices) if devices > 1 else None
    g_pad = g + ((-g) % devices)

    mags = np.stack([_pad_to(c[2], t_pad, 0.0) for c in clips])
    col_keep = np.stack(
        [np.pad(~c[4], (0, t_pad - len(c[4])), constant_values=True)
         for c in clips]).astype(np.float32)          # 1 = kept
    masks = np.broadcast_to(col_keep[:, None, :], mags.shape).copy()
    fpad = (-f) % 4
    if fpad:
        mags = np.pad(mags, ((0, 0), (0, fpad), (0, 0)))
        masks = np.pad(masks, ((0, 0), (0, fpad), (0, 0)),
                       constant_values=1.0)

    def _batch_pad(a):
        return (np.concatenate([a] + [a[-1:]] * (g_pad - g)) if g_pad > g
                else a)

    if method == "unet":
        peak = mags.max(axis=(1, 2), keepdims=True)
        peak = np.maximum(peak, 1e-12)
        norm = (mags / peak).astype(np.float32)
        # Train on SYNTHETIC frame dropouts over the intact content
        # (reference main5_UNet_mask.py:111-127 semantics: the net learns to
        # fill columns from context), then composite over the REAL damage.
        # Training directly against the detected-damage mask would teach
        # the net that holes contain silence — its targets there ARE the
        # damaged (silent) columns.
        syn = _synthetic_train_masks(seed, clips, masks)
        train_mask = (masks * syn).astype(np.float32)  # real-damage AND syn
        # loss only where content is real: synthetic holes inside intact,
        # true-extent cells (real holes have no target and stay out)
        valid = _true_extent_mask(norm.shape, f, clips) * masks
        cfg = UNetTrainConfig(epochs=epochs,
                              scan_chunk=min(100, epochs))
        out, _ = restore_clips_unet(
            _batch_pad(norm)[..., None], _batch_pad(train_mask)[..., None],
            cfg=cfg, mesh=mesh, key=seed,
            valid_batch=_batch_pad(valid)[..., None],
            composite_mask_batch=_batch_pad(masks)[..., None])
        final = np.asarray(out)[:g, :, :, 0] * peak
    elif method == "gan":
        rmags = np.stack([_pad_to(c[2], t_pad, 0.0) for c in orig_clips])
        if fpad:
            rmags = np.pad(rmags, ((0, 0), (0, fpad), (0, 0)))
        lo = mags.min(axis=(1, 2), keepdims=True)
        hi = np.maximum(mags.max(axis=(1, 2), keepdims=True), lo + 1e-12)
        norm = (2 * (mags - lo) / (hi - lo) - 1).astype(np.float32)
        rnorm = (2 * (rmags - lo) / (hi - lo) - 1).astype(np.float32)
        # each clip's true (f, t_i) extent: pad cells must not enter the L1
        # reconstruction term (single-clip _valid4 semantics)
        valid = _true_extent_mask(norm.shape, f, clips)
        # same readout policy as the benched part-2 pipeline (gap-scoped
        # weight EMA + collapse retry) so serving never drifts from it;
        # the 0.04 collapse signature is calibrated at convergence, so the
        # retry only arms at the full budget (see pipelines/part2.py), and
        # batch-padding duplicates never gate it (n_real)
        cfg = GANTrainConfig(epochs=epochs, bf16=True,
                             scan_chunk=min(100, epochs),
                             ema_decay=0.99, ema_scope="gap",
                             retry_l1=0.04 if epochs >= 1500 else 0.0)
        out, _ = restore_clips_gan(_batch_pad(norm), _batch_pad(rnorm),
                                   _batch_pad(masks), cfg, mesh=mesh,
                                   key=seed, valid_batch=_batch_pad(valid),
                                   n_real=g)
        final = (np.asarray(out)[:g] + 1) / 2 * (hi - lo) + lo
    else:
        # every other method runs through the per-clip facade (these are
        # sub-second methods where batching buys nothing)
        from ..api import restore as api_restore

        results = {"method": method, "clips": g, "epochs": epochs,
                   "skipped": skipped, "files": {}}
        for path, (sr, x, mag, phase, cols) in zip(paths, clips):
            y = api_restore(x, sr, method=method, seed=seed)
            name = os.path.basename(path)
            save_wav_int16(y, sr, os.path.join(output_dir, name))
            results["files"][name] = {"frames": int(mag.shape[1]),
                                      "damaged_cols": int(cols.sum())}
        results["wall_s"] = round(time.time() - t0, 2)
        return results

    results = {"method": method, "clips": g, "epochs": epochs,
               "skipped": skipped, "files": {}}
    for i, (path, (sr, x, mag, phase, cols)) in enumerate(zip(paths, clips)):
        t_i = mag.shape[1]
        out_mag = jnp.asarray(final[i, :f, :t_i], jnp.float32)
        y = np.asarray(istft(polar(out_mag, phase), _CFG, len(x)))
        name = os.path.basename(path)
        save_wav_int16(y, sr, os.path.join(output_dir, name))
        results["files"][name] = {"frames": int(t_i),
                                  "damaged_cols": int(cols.sum())}
    results["wall_s"] = round(time.time() - t0, 2)
    return results
