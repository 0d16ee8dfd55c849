"""WAV codec oracles vs scipy.io.wavfile + the reference's normalization chain."""

import numpy as np
import pytest

from audio_inpainting_tpu.io import (
    read_wav,
    write_wav,
    load_mono_normalized,
    save_wav_int16,
)


def test_int16_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    data = (rng.randn(4410) * 10000).astype(np.int16)
    p = str(tmp_path / "m.wav")
    write_wav(p, 44100, data)
    sr, back = read_wav(p)
    assert sr == 44100
    np.testing.assert_array_equal(back, data)


def test_stereo_matches_scipy(tmp_path):
    from scipy.io import wavfile

    rng = np.random.RandomState(2)
    data = (rng.randn(2000, 2) * 20000).astype(np.int16)
    p1, p2 = str(tmp_path / "a.wav"), str(tmp_path / "b.wav")
    write_wav(p1, 22050, data)
    wavfile.write(p2, 22050, data)
    sr1, d1 = read_wav(p2)          # our reader on scipy's file
    sr2, d2 = wavfile.read(p1)      # scipy's reader on our file
    assert sr1 == sr2 == 22050
    np.testing.assert_array_equal(d1, data)
    np.testing.assert_array_equal(d2, data)


def test_float32_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    data = rng.randn(1000).astype(np.float32)
    p = str(tmp_path / "f.wav")
    write_wav(p, 16000, data)
    sr, back = read_wav(p)
    assert back.dtype == np.float32
    np.testing.assert_array_equal(back, data)


def write_pcm24(path, sr, vals, n_channels=1):
    """Hand-pack a 24-bit PCM RIFF file (scipy can read but not write 24-bit).

    ``vals`` are int 24-bit sample values in [-2^23, 2^23), interleaved if
    multi-channel.
    """
    import struct

    body = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, n_channels, sr,
                                      sr * n_channels * 3, n_channels * 3, 24))
        f.write(b"data" + struct.pack("<I", len(body)) + body)
        if len(body) & 1:
            f.write(b"\x00")


def test_pcm24_matches_scipy(tmp_path):
    """24-bit PCM reads as int32 << 8, bit-identical to scipy.io.wavfile."""
    from scipy.io import wavfile

    rng = np.random.RandomState(7)
    vals = rng.randint(-(1 << 23), 1 << 23, size=3000)
    p = str(tmp_path / "p24.wav")
    write_pcm24(p, 48000, vals)
    sr, ours = read_wav(p)
    sr2, theirs = wavfile.read(p)
    assert sr == sr2 == 48000 and ours.dtype == np.int32
    np.testing.assert_array_equal(ours, theirs)
    np.testing.assert_array_equal(ours, vals.astype(np.int32) << 8)


def test_pcm24_stereo_load_mono_normalized(tmp_path):
    """Stereo 24-bit through the canonical load chain (native or numpy)."""
    rng = np.random.RandomState(8)
    vals = rng.randint(-(1 << 23), 1 << 23, size=4000)  # 2000 stereo frames
    p = str(tmp_path / "s24.wav")
    write_pcm24(p, 44100, vals, n_channels=2)
    sr, x = load_mono_normalized(p)
    frames = (vals.astype(np.int64) << 8).reshape(-1, 2)
    expected = frames.mean(axis=1)
    expected = (expected / np.max(np.abs(expected))).astype(np.float32)
    assert sr == 44100 and x.dtype == np.float32
    np.testing.assert_allclose(x, expected, rtol=1e-6, atol=1e-7)


def test_truncated_fmt_chunk_raises_valueerror(tmp_path):
    """A file cut off mid-fmt must raise ValueError (the API's 400 path and
    library callers' except clause), never a bare struct.error."""
    import struct

    p = str(tmp_path / "trunc.wav")
    data = (np.arange(100) * 100).astype(np.int16)
    write_wav(p, 8000, data)
    raw = open(p, "rb").read()
    # keep the RIFF header + 'fmt ' id/size but only 6 of its 16 body bytes
    open(p, "wb").write(raw[: 12 + 8 + 6])
    with pytest.raises(ValueError, match="missing fmt/data"):
        read_wav(p)


def test_load_mono_normalized_matches_reference_convention(tmp_path):
    # reference: data.mean(axis=1); data / max|data| (main2_AR.py:41-43)
    rng = np.random.RandomState(4)
    stereo = (rng.randn(5000, 2) * 12000).astype(np.int16)
    p = str(tmp_path / "s.wav")
    write_wav(p, 44100, stereo)
    sr, x = load_mono_normalized(p)
    expected = stereo.mean(axis=1)
    expected = expected / np.max(np.abs(expected))
    np.testing.assert_allclose(x, expected.astype(np.float32), rtol=1e-6)
    assert np.max(np.abs(x)) <= 1.0 + 1e-6


def test_save_wav_int16_quantization(tmp_path):
    # reference: clip to [-1,1], x32767, int16 (main1_gp.py:21-24)
    x = np.array([-2.0, -1.0, 0.0, 0.5, 1.0, 2.0], dtype=np.float32)
    p = save_wav_int16(x, 8000, str(tmp_path / "q.wav"))
    _, back = read_wav(p)
    expected = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    np.testing.assert_array_equal(back, expected)
