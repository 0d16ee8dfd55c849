"""score subcommand: SNR/LSD of restored WAVs vs originals."""

import json

import numpy as np

from audio_inpainting_tpu.io import save_wav_int16


def test_score_cli(tmp_path, capsys):
    from audio_inpainting_tpu.cli.main import main

    sr = 8000
    t = np.arange(sr)
    ref = (0.5 * np.sin(2 * np.pi * 220 * t / sr)).astype(np.float32)
    got = ref + 0.01 * np.sin(2 * np.pi * 700 * t / sr).astype(np.float32)
    dorig = tmp_path / "orig"
    drest = tmp_path / "rest"
    dorig.mkdir()
    drest.mkdir()
    save_wav_int16(ref, sr, str(dorig / "a.wav"))
    save_wav_int16(got, sr, str(drest / "a.wav"))
    save_wav_int16(got, sr, str(drest / "unmatched.wav"))

    rc = main(["score", str(drest), str(dorig), "--json"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    row = out["score"]["a.wav"]
    assert 30 < row["snr_db"] < 45        # ~1% additive tone
    assert row["samples"] == sr
    assert out["score"]["unmatched.wav"] == "no original"
