"""Uniform restoration API — the reference's implicit L3 contract made real.

Every reference method follows ``restore(corrupted) -> restored`` (same
length, same sr) with method-specific detection/config (SURVEY.md §1 L3).
This facade exposes that contract directly:

    from audio_inpainting_tpu import restore
    fixed = restore(damaged, sr, method="ar")        # blind detection
    fixed = restore(damaged, sr, method="nmf", gaps=[(s, e)])

Methods: linear | ar | nmf | gp | unet | gan | diffusion.
Blind damage detection (threshold scans, SURVEY L2) runs when ``gaps`` /
``mask`` are not supplied. GP is only sensible on short segments (the
reference restricts it to 0.05 s windows).
"""

from __future__ import annotations

import numpy as np

# The facade's AR posture: the reference's multi-gap texture setup
# (main3_AR_text_mask.py — order 30, Ridge alpha 0.5, 1000-sample contexts,
# progressive context reuse ~ passes=2). Shared with the windowed engine's
# batched AR path (methods/windowed.py) so the two can never drift.
AR_DEFAULTS = {"order": 30, "alpha": 0.5, "texture": True,
               "context_len": 1000, "passes": 2}


def restore(damaged, sr: int, method: str = "ar", *, gaps=None, mask=None,
            threshold: float = 1e-4, seed: int = 0, original=None,
            **cfg_kwargs) -> np.ndarray:
    """Restore a damaged mono float32 signal in [-1, 1]. Returns same length.

    gaps: optional [(start, end)] damaged spans; detected by threshold scan
    when omitted. mask: optional bool array (True = valid sample),
    alternative to gaps for linear/gp. original: clean reference, only used
    by the GAN method (the reference trains its GAN against the ground
    truth, main_gan_gap.py:103-108).
    """
    import jax
    import jax.numpy as jnp

    from .corrupt import find_gaps, mask_to_bad_columns, silent_frame_columns
    from .ops import torch_stft_config, stft, istft
    from .ops.stft import magphase, polar

    damaged = np.asarray(damaged, np.float32)
    n = len(damaged)

    def _mask():
        if mask is not None:
            return np.asarray(mask, bool)
        if gaps is not None:
            # explicit damage spans beat the threshold scan: naturally quiet
            # passages stay untouched
            m = np.ones(n, bool)
            for s, e in gaps:
                m[max(0, int(s)):min(n, int(e))] = False
            return m
        return np.abs(damaged) > threshold

    def _gaps():
        if gaps is not None:
            return [(int(s), int(e)) for s, e in gaps]
        return find_gaps(damaged, threshold=max(threshold, 0.01), min_len=100)

    def _bad_columns(n_cols: int, thr: float) -> np.ndarray:
        """Column damage indicator for the spectral methods. With explicit
        gaps/mask, map the sample mask through the SAME hop-window
        silent-fraction criterion the blind path uses (a column is bad when
        >=80% of its window is damaged) by scanning the mask as a 0/1
        pseudo-signal; blind otherwise (reference main4_NMF_gap.py:28-40)."""
        if gaps is not None or mask is not None:
            return mask_to_bad_columns(_mask(), n_cols, 256)
        bad = np.zeros(n_cols, bool)
        bad[silent_frame_columns(damaged, n_cols, 256,
                                 threshold=thr, silent_fraction=0.8)] = True
        return bad

    if method == "linear":
        # host np.interp, not the jitted kernel: the facade is the serving
        # engines' per-window entry point, and a zero-FLOP O(n) fill must
        # not pay a device round trip per window (methods/linear.py
        # linear_interp_masked_host rationale; the two are oracle-equal)
        from .methods.linear import linear_interp_masked_host

        return linear_interp_masked_host(damaged, _mask())

    if method == "ar":
        from .methods import ARConfig, ar_restore_gaps

        g = _gaps()
        cfg = ARConfig(**{**AR_DEFAULTS, **cfg_kwargs})
        return np.asarray(ar_restore_gaps(jnp.asarray(damaged), g, cfg,
                                          key=jax.random.PRNGKey(seed)))

    if method == "gp":
        from .methods.gp import GPConfig, gp_restore

        out, _ = gp_restore(damaged, _mask(), sr,
                            GPConfig(**cfg_kwargs), key=seed)
        return np.asarray(out)

    scfg = torch_stft_config(1024, 256)
    z = stft(jnp.asarray(damaged), scfg)
    mag, phase = magphase(z)

    if method == "nmf":
        from .methods.nmf import NMFConfig, nmf_inpaint_columns

        bad = _bad_columns(mag.shape[1], threshold)
        out_mag = nmf_inpaint_columns(mag, jnp.asarray(bad),
                                      NMFConfig(**cfg_kwargs),
                                      jax.random.PRNGKey(seed))
        return np.asarray(istft(polar(out_mag, phase), scfg, n))

    if method == "unet":
        from .corrupt import training_stripes
        from .methods.neural import UNetTrainConfig, unet_train_restore

        # all-silent input has max 0 — degrade to a zero spectrogram
        # instead of 0/0 NaNs poisoning the whole output
        mag_max = jnp.maximum(jnp.max(mag), 1e-12)
        mag_norm = mag / mag_max
        # frame-level keep mask from explicit gaps or the silent columns
        bad = _bad_columns(mag.shape[1], max(threshold, 0.01))
        keep = jnp.broadcast_to(jnp.asarray(~bad, jnp.float32)[None, :], mag.shape)
        # Self-supervised on BLIND damage: train on synthetic stripes hidden
        # over the intact columns and keep the real holes OUT of the loss —
        # their targets ARE the damaged (silent) columns, so the reference's
        # masked-loss formula (main5_UNet_mask.py:169, synthetic mask + an
        # intact target) would otherwise teach the net to fill holes with
        # silence. Composite over the real damage. Same scheme as the
        # batched serving layer (pipelines/serve.py).
        syn = training_stripes(jax.random.PRNGKey(seed), mag.shape[1], ~bad)
        train_mask = keep * jnp.broadcast_to(
            jnp.asarray(syn, jnp.float32)[None, :], mag.shape)
        final, _, _ = unet_train_restore(mag_norm, train_mask,
                                         UNetTrainConfig(**cfg_kwargs),
                                         key=seed, valid=keep,
                                         composite_mask=keep)
        return np.asarray(istft(polar(jnp.asarray(final) * mag_max, phase),
                                scfg, n))

    if method == "gan":
        from .methods.neural import GANTrainConfig, gan_train_restore

        mag_min, mag_max = jnp.min(mag), jnp.max(mag)
        scale = jnp.maximum(mag_max - mag_min, 1e-12)  # constant input: no NaN
        norm = (mag - mag_min) / scale * 2.0 - 1.0
        if gaps is not None or mask is not None:
            # explicit damage spans beat the pixel-brightness scan: columns
            # inside the named spans are the hole, everything else is kept
            # (naturally dark pixels outside the spans stay untouched)
            bad = _bad_columns(mag.shape[1], threshold)
            keep = jnp.broadcast_to(
                jnp.asarray(~bad, jnp.float32)[None, :], mag.shape)
        else:
            keep = (norm > -0.95).astype(jnp.float32)
        if original is None:
            # Refuse rather than silently self-supervise: without the clean
            # clip the training target IS the damaged spectrogram — the hole
            # it should fill (reference trains against ground truth,
            # main_gan_gap.py:103-108).
            raise ValueError(
                "restore(method='gan') requires original=<clean signal>: "
                "the reference GAN trains against the ground-truth clip's "
                "spectrogram; without it the target would contain the hole "
                "being filled")
        z_real = stft(jnp.asarray(np.asarray(original, np.float32)[:n]), scfg)
        real = ((jnp.abs(z_real) - mag_min) / scale) * 2.0 - 1.0
        final, _ = gan_train_restore(norm, real, keep,
                                     GANTrainConfig(**cfg_kwargs), key=seed)
        final_mag = (jnp.asarray(final) + 1.0) / 2.0 * (mag_max - mag_min) + mag_min
        return np.asarray(istft(polar(final_mag, phase), scfg, n))

    if method == "diffusion":
        from .methods.diffusion import DiffusionConfig, diffusion_restore_audio

        ckpt = cfg_kwargs.pop("checkpoint_dir", None)
        # explicit damage spans override the codec's near-black image scan
        sample_mask = (_mask() if gaps is not None or mask is not None
                       else None)
        return diffusion_restore_audio(damaged, sr,
                                       DiffusionConfig(**cfg_kwargs),
                                       key=seed, checkpoint_dir=ckpt,
                                       sample_mask=sample_mask)

    raise ValueError(f"unknown method {method!r}")
