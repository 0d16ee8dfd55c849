"""Batch serving pipeline: directory of WAVs in, restored WAVs out."""

import os

import numpy as np

from audio_inpainting_tpu.io import load_mono_normalized, save_wav_int16


def _make_corpus(tmp_path, sr=8000, n=2):
    """Short tone clips with a silent dropout; unequal lengths."""
    rng = np.random.RandomState(0)
    din = tmp_path / "in"
    dorig = tmp_path / "orig"
    din.mkdir()
    dorig.mkdir()
    names = []
    for i in range(n):
        dur = sr // 2 + i * 1024          # unequal lengths
        t = np.arange(dur)
        x = (0.6 * np.sin(2 * np.pi * (220 + 60 * i) * t / sr)
             + 0.05 * rng.randn(dur)).astype(np.float32)
        x /= np.abs(x).max()
        dmg = x.copy()
        dmg[sr // 8: sr // 8 + 2000] = 0.0
        name = f"clip{i}.wav"
        save_wav_int16(dmg, sr, str(din / name))
        save_wav_int16(x, sr, str(dorig / name))
        names.append(name)
    return din, dorig, names, sr


def test_serve_unet_batch(tmp_path):
    from audio_inpainting_tpu.pipelines.serve import run_serve

    din, _, names, sr = _make_corpus(tmp_path)
    dout = tmp_path / "out"
    res = run_serve(str(din), str(dout), method="unet", epochs=30, seed=0)
    assert res["clips"] == len(names)
    for name in names:
        assert (dout / name).exists()
        sr_i, dmg = load_mono_normalized(str(din / name))
        sr_o, out = load_mono_normalized(str(dout / name))
        assert sr_o == sr_i and len(out) == len(dmg)
        assert np.isfinite(out).all()
        # detector found the dropout
        assert res["files"][name]["damaged_cols"] > 0
        # intact prefix survives the spectrogram round trip
        n_keep = sr // 16
        assert float(np.sqrt(np.mean((out[:n_keep] - dmg[:n_keep]) ** 2))) < 0.1


def test_serve_gan_batch_requires_and_uses_originals(tmp_path):
    import pytest

    from audio_inpainting_tpu.pipelines.serve import run_serve

    din, dorig, names, sr = _make_corpus(tmp_path)
    dout = tmp_path / "out_gan"
    with pytest.raises(ValueError):
        run_serve(str(din), str(dout), method="gan", epochs=4)
    res = run_serve(str(din), str(dout), method="gan", epochs=4,
                    originals_dir=str(dorig), seed=0)
    for name in names:
        assert (dout / name).exists()
        _, out = load_mono_normalized(str(dout / name))
        assert np.isfinite(out).all()
    assert res["method"] == "gan"


def test_serve_windowed_long_files(tmp_path):
    """--window-s serving: each clip restores only windows around its
    damage; clean samples pass through bit-exact, every output written."""
    from audio_inpainting_tpu.pipelines.serve import run_serve

    din, dout = tmp_path / "in", tmp_path / "out"
    din.mkdir()
    sr = 8000
    originals, gaps = {}, (12_000, 12_600)
    for k in range(2):
        t = np.arange(4 * sr)
        x = (0.6 * np.sin(2 * np.pi * (1.5 + k) * t / sr)).astype(np.float32)
        d = x.copy()
        d[gaps[0]:gaps[1]] = 0.0
        save_wav_int16(d, sr, str(din / f"c{k}.wav"))
        originals[f"c{k}.wav"] = x
    res = run_serve(str(din), str(dout), method="linear", window_s=0.5)
    assert res["window_s"] == 0.5 and len(res["files"]) == 2
    for name, clean in originals.items():
        sr2, y = load_mono_normalized(str(dout / name))
        _, d = load_mono_normalized(str(din / name))
        g = slice(*gaps)
        assert np.abs(y[g]).max() > 0.01
        assert (np.mean((y[g] - clean[g] / np.abs(clean).max()) ** 2)
                < np.mean((d[g] - clean[g] / np.abs(clean).max()) ** 2))


def test_serve_cli(tmp_path):
    from audio_inpainting_tpu.cli.main import main

    din, _, names, _ = _make_corpus(tmp_path)
    dout = tmp_path / "out_cli"
    rc = main(["serve", str(din), str(dout), "--method", "unet",
               "--epochs", "10", "--json"])
    assert rc == 0
    for name in names:
        assert (dout / name).exists()


def test_serve_facade_methods(tmp_path):
    """Non-neural methods route through the per-clip facade."""
    from audio_inpainting_tpu.pipelines.serve import run_serve

    din, _, names, _ = _make_corpus(tmp_path)
    for method in ("linear", "ar"):
        dout = tmp_path / f"out_{method}"
        res = run_serve(str(din), str(dout), method=method)
        assert res["method"] == method
        for name in names:
            assert (dout / name).exists()
            _, out = load_mono_normalized(str(dout / name))
            assert np.isfinite(out).all()


def test_serve_skips_unreadable_files(tmp_path):
    from audio_inpainting_tpu.pipelines.serve import run_serve

    din, _, names, _ = _make_corpus(tmp_path)
    (din / "broken.wav").write_bytes(b"not a riff file at all")
    dout = tmp_path / "out_skip"
    res = run_serve(str(din), str(dout), method="linear")
    assert len(res["skipped"]) == 1
    assert res["skipped"][0]["file"] == "broken.wav"
    for name in names:
        assert (dout / name).exists()


def test_serve_gan_skips_clip_missing_original(tmp_path):
    from audio_inpainting_tpu.pipelines.serve import run_serve

    din, dorig, names, _ = _make_corpus(tmp_path)
    (dorig / names[1]).unlink()                      # second original gone
    dout = tmp_path / "out_gan_missing"
    res = run_serve(str(din), str(dout), method="gan", epochs=3,
                    originals_dir=str(dorig))
    assert (dout / names[0]).exists()
    assert not (dout / names[1]).exists()
    assert any(s["file"] == names[1] for s in res["skipped"])


def test_serve_devices_validation(tmp_path):
    import pytest

    from audio_inpainting_tpu.pipelines.serve import run_serve

    din, _, names, _ = _make_corpus(tmp_path)
    with pytest.raises(ValueError):
        run_serve(str(din), str(tmp_path / "x"), method="linear", devices=0)
    # more devices than exist: clamped, still works
    res = run_serve(str(din), str(tmp_path / "out_many"), method="linear",
                    devices=10_000)
    assert res["clips"] == len(names)


def test_synthetic_train_masks_short_clips_always_trainable():
    """Every clip must get >= 1 trainable cell (intact AND synthetically
    hidden): the reference stripe-count formula gives 0 stripes under ~50
    frames, which would leave the loss identically zero and composite an
    UNTRAINED net into the real holes."""
    import numpy as np

    from audio_inpainting_tpu.pipelines.serve import _synthetic_train_masks

    # clips tuples: only c[2].shape[1] (true frame count) is consulted
    t_pad = 64
    frame_counts = [2, 5, 17, 40, 64]       # all below the ~50-frame cliff
    clips = [(None, None, np.zeros((9, t)), None, None)
             for t in frame_counts]
    masks = np.ones((len(clips), 9, t_pad), np.float32)
    masks[3, :, :20] = 0.0                   # clip 3: leading real damage
    syn = _synthetic_train_masks(0, clips, masks)
    assert syn.shape == masks.shape
    for i, t in enumerate(frame_counts):
        trainable = (syn[i, :, :t] == 0) & (masks[i, :, :t] == 1)
        assert trainable.any(), f"clip {i} (t={t}) has no trainable cell"
        # stripes never spill into the batch padding
        assert (syn[i, :, t:] == 1).all()


def test_random_frame_mask_min_segments():
    import jax
    import numpy as np

    from audio_inpainting_tpu.corrupt import random_frame_mask

    # reference semantics unchanged: 40 frames -> int(40*0.3/30*2) = 0 stripes
    m0 = np.asarray(random_frame_mask(jax.random.PRNGKey(0), 4, 40))
    assert (m0 == 1).all()
    # with the floor: at least one stripe
    m1 = np.asarray(random_frame_mask(jax.random.PRNGKey(0), 4, 40,
                                      min_segments=1))
    assert (m1 == 0).any()
