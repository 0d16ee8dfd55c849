"""Checkpoint round-trip + timer + unet-gap extra driver."""

import numpy as np
import jax
import jax.numpy as jnp

from audio_inpainting_tpu.utils import save_params, load_params, latest_checkpoint, Timer


def test_checkpoint_roundtrip(tmp_path):
    params = {"dense": {"kernel": jnp.arange(6.0).reshape(2, 3),
                        "bias": jnp.zeros(3)},
              "scale": jnp.float32(2.5)}
    p = save_params(params, str(tmp_path / "ckpt" / "step_10"))
    back = load_params(p)
    assert np.allclose(back["dense"]["kernel"], np.arange(6.0).reshape(2, 3))
    assert float(back["scale"]) == 2.5
    assert latest_checkpoint(str(tmp_path / "ckpt")) == p
    save_params(params, str(tmp_path / "ckpt" / "step_2"))
    assert latest_checkpoint(str(tmp_path / "ckpt")).endswith("step_10")


def test_timer():
    t = Timer()
    x = jnp.ones(16) * 2
    lap = t.lap("op", x)
    assert lap >= 0 and t.laps["op"] == lap


def test_unet_gap_extra(tmp_path):
    from audio_inpainting_tpu.io import write_wav
    from audio_inpainting_tpu.pipelines.extras import run_unet_gap

    sr = 8000
    tt = np.arange(2 * sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 220 * tt)).astype(np.float32)
    clip = str(tmp_path / "c.wav")
    write_wav(clip, sr, (x * 32767).astype(np.int16))
    res = run_unet_gap(clip, str(tmp_path / "assets"), duration=2.0, epochs=20)
    assert np.isfinite(res["snr_db"])
    import os
    assert os.path.exists(str(tmp_path / "assets" / "dl_restored.wav"))
    assert os.path.exists(str(tmp_path / "assets" / "dl_corrupted.wav"))
