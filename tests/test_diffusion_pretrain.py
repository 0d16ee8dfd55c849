"""Corpus DDPM pretraining + reuse (the riffusion-role weight path)."""

import numpy as np

from audio_inpainting_tpu.methods.diffusion import (
    DiffusionConfig, train_spectrogram_ddpm, diffusion_inpaint_image)


def test_pretrain_and_reuse(tmp_path):
    rng = np.random.RandomState(0)
    imgs = [(rng.rand(48, 64) * 200 + 30).astype(np.uint8) for _ in range(3)]
    cfg = DiffusionConfig(train_steps=20, batch=2, patch=16, sample_steps=4,
                          base_channels=16, scan_chunk=10)
    ckpt = str(tmp_path / "ddpm")
    params = train_spectrogram_ddpm(imgs, cfg, key=0, checkpoint_dir=ckpt)

    dmg = imgs[0].copy()
    mask = np.zeros_like(dmg)
    mask[:, 20:30] = 255
    dmg[:, 20:30] = 0
    out = diffusion_inpaint_image(dmg, mask, cfg, key=1, params=params)
    assert out.shape == dmg.shape and np.isfinite(out).all()
    np.testing.assert_array_equal(out[:, :20], dmg[:, :20])

    # checkpoint round-trip produces identical params
    from audio_inpainting_tpu.utils import load_params
    import jax

    back = load_params(ckpt)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(back)
    assert all(np.allclose(a, b) for a, b in zip(flat1, flat2))


def test_committed_corpus_prior_loads_and_restores():
    """The committed corpus checkpoint (checkpoints/diffusion_prior,
    trained by tools/train_diffusion_prior.py on procedural music that
    excludes the bench clip) must load on ANY topology — it was saved on
    the TPU; load_params restores topology-free numpy leaves — and drive
    an inference-only restore."""
    import os

    import jax

    from audio_inpainting_tpu.methods.diffusion import (DiffusionConfig,
                                                        diffusion_restore_audio)
    from audio_inpainting_tpu.utils.checkpoint import load_params

    ckpt = os.path.join(os.path.dirname(__file__), "..", "checkpoints",
                        "diffusion_prior")
    assert os.path.isdir(ckpt), "committed corpus prior missing"
    params = load_params(ckpt)
    leaves = jax.tree_util.tree_leaves(params)
    assert leaves and all(isinstance(l, np.ndarray) for l in leaves)

    sr = 8000
    t = np.arange(4 * sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    dmg = x.copy()
    dmg[2 * sr:2 * sr + 2000] = 0.0
    out = diffusion_restore_audio(dmg, sr, DiffusionConfig(sample_steps=4),
                                  key=0, params=params)
    assert out.shape == dmg.shape and np.isfinite(out).all()
    assert np.abs(out[2 * sr:2 * sr + 2000]).max() > 1e-4
