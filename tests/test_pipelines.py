"""End-to-end scenario pipelines + the demo asset contract.

Tiny budgets on a short synthetic clip (CPU test budget); the full-budget
run on the real clip happens in bench.py on TPU. The contract test is the
formalization of the reference's implicit file contract (SURVEY.md §4).
"""

import os

import numpy as np
import pytest

from audio_inpainting_tpu.io import write_wav
from audio_inpainting_tpu.methods.diffusion import DiffusionConfig
from audio_inpainting_tpu.methods.gp import GPConfig
from audio_inpainting_tpu.pipelines import run_part0, run_part1, run_part2
from audio_inpainting_tpu.pipelines.registry import (ASSET_REGISTRY,
                                                     VIZ_ARTIFACTS)


@pytest.fixture(scope="module")
def clip_file(tmp_path_factory):
    sr = 8000
    t = np.arange(3 * sr) / sr
    rng = np.random.RandomState(0)
    x = (0.6 * np.sin(2 * np.pi * 220 * t) + 0.25 * np.sin(2 * np.pi * 660 * t)
         + 0.05 * rng.randn(len(t))).astype(np.float32)
    x /= np.abs(x).max()
    p = tmp_path_factory.mktemp("clip") / "clip.wav"
    write_wav(str(p), sr, (x * 32767).astype(np.int16))
    return str(p)


@pytest.fixture(scope="module")
def assets_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("assets"))


@pytest.fixture(scope="module")
def all_results(clip_file, assets_dir):
    r0 = run_part0(clip_file, assets_dir, seed=0,
                   gp_cfg=GPConfig(n_restarts=1, opt_steps=20))
    r1 = run_part1(clip_file, assets_dir, seed=0, unet_epochs=30)
    r2 = run_part2(clip_file, assets_dir, seed=0, gan_epochs=20,
                   diffusion_cfg=DiffusionConfig(
                       train_steps=30, batch=2, patch=16, sample_steps=8,
                       base_channels=16, scan_chunk=30))
    return r0, r1, r2


def test_asset_contract_complete(all_results, assets_dir):
    missing = []
    for part, methods in ASSET_REGISTRY.items():
        for method, kinds in methods.items():
            for kind, rel in kinds.items():
                p = os.path.join(assets_dir, rel)
                if not os.path.exists(p):
                    missing.append(rel)
    for rel in VIZ_ARTIFACTS:
        if not os.path.exists(os.path.join(assets_dir, rel)):
            missing.append(rel)
    assert not missing, missing


def test_artifacts_are_valid_media(all_results, assets_dir):
    from PIL import Image

    from audio_inpainting_tpu.io import read_wav

    for part, methods in ASSET_REGISTRY.items():
        for method, kinds in methods.items():
            sr, wav = read_wav(os.path.join(assets_dir, kinds["audio"]))
            assert sr == 8000 and wav.dtype == np.int16 and len(wav) > 0
            img = Image.open(os.path.join(assets_dir, kinds["image"]))
            assert img.size[0] > 0


def test_metrics_recorded(all_results):
    r0, r1, r2 = all_results
    for name in ("gp", "ar", "ar_texture", "nmf"):
        assert "snr_db" in r0[name] and np.isfinite(r0[name]["snr_db"])
        assert r0[name]["wall_s"] > 0
    for name in ("damaged", "linear", "ar", "nmf", "unet"):
        assert "snr_db" in r1[name] and np.isfinite(r1[name]["snr_db"])
    for name in ("linear", "ar", "nmf", "gan", "diffusion"):
        assert "local_snr_db" in r2[name] and np.isfinite(r2[name]["local_snr_db"])
    assert r1["n_gaps"] >= 1
    # detected gap should roughly cover the injected center gap
    gs, ge = r2["gap"]
    ds, de = r2["detected_gap"]
    assert abs(ds - gs) < 2000 and abs(de - ge) < 2000


def test_cli_check_command(all_results, assets_dir):
    from audio_inpainting_tpu.cli.main import main

    assert main(["check", "--assets-dir", assets_dir]) == 0
    assert main(["check", "--assets-dir", assets_dir + "_nonexistent"]) == 1


def test_demo_static_html(all_results, assets_dir):
    from audio_inpainting_tpu.demo.app import render_static_html, get_media_paths

    html_text = render_static_html(assets_dir)
    assert "Scene 1" in html_text and "Scene 2" in html_text
    assert "fixed_riffusion_gap.wav" in html_text
    a, i = get_media_paths(assets_dir, "part2", "diffusion")
    assert a is not None and i is not None
    a2, _ = get_media_paths(assets_dir, "part2", "nonexistent_method")
    assert a2 is None


def test_part0_synthetic_fallback(tmp_path):
    """Missing input file -> the reference's 200+450 Hz synthetic segment
    (main1_gp.py:53-59) drives the full part-0 pipeline."""
    r = run_part0(None, str(tmp_path / "assets"), seed=0,
                  gp_cfg=GPConfig(n_restarts=1, opt_steps=10))
    assert r["sr"] == 16000
    for m in ("gp", "ar", "ar_texture", "nmf"):
        assert np.isfinite(r[m]["snr_db"])
