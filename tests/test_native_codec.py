"""Native C WAV codec vs the numpy path (skipped when not built)."""

import numpy as np
import pytest

import audio_inpainting_tpu.io.wav as W

needs_native = pytest.mark.skipif(W._NATIVE is None,
                                  reason="native codec not built "
                                         "(python runtime/build.py)")


@needs_native
def test_native_load_matches_numpy(tmp_path):
    rng = np.random.RandomState(0)
    stereo = (rng.randn(5000, 2) * 12000).astype(np.int16)
    p = str(tmp_path / "s.wav")
    W.write_wav(p, 44100, stereo)

    sr_n, a = W._NATIVE.load_mono_normalized(p)
    a = np.frombuffer(a, dtype=np.float32)
    sr_p, data = W.read_wav(p)
    b = W.peak_normalize(W.to_float_mono(data))
    assert sr_n == sr_p
    np.testing.assert_allclose(a, b, atol=1e-6)


@needs_native
def test_native_write_matches_numpy_quantization(tmp_path):
    x = (np.sin(np.linspace(0, 50, 4000)) * 1.2).astype(np.float32)
    p = str(tmp_path / "q.wav")
    W._NATIVE.write_int16(p, 8000, np.ascontiguousarray(x).tobytes(), 1.0)
    sr, q = W.read_wav(p)
    expected = (np.clip(x, -1, 1) * 32767).astype(np.int16)
    assert sr == 8000
    np.testing.assert_array_equal(q, expected)


@needs_native
def test_native_uint8_matches_numpy(tmp_path):
    # 8-bit PCM: raw 0..255 values mono-mixed then peak-normalized, same as
    # the numpy fallback (no 128-centering on either path).
    rng = np.random.RandomState(1)
    stereo = rng.randint(0, 256, (300, 2)).astype(np.uint8)
    p = str(tmp_path / "u8.wav")
    W.write_wav(p, 8000, stereo)
    sr_n, a = W._NATIVE.load_mono_normalized(p)
    a = np.frombuffer(a, dtype=np.float32)
    sr_p, data = W.read_wav(p)
    b = W.peak_normalize(W.to_float_mono(data))
    assert sr_n == sr_p == 8000
    np.testing.assert_allclose(a, b, atol=1e-6)


@needs_native
def test_native_pcm24_matches_numpy(tmp_path):
    """24-bit PCM: the C path assembles int32 << 8 like the numpy path;
    outputs agree to the normalize step's reciprocal-vs-division ulp."""
    from test_io import write_pcm24

    rng = np.random.RandomState(2)
    vals = rng.randint(-(1 << 23), 1 << 23, size=6000)  # 3000 stereo frames
    p = str(tmp_path / "n24.wav")
    write_pcm24(p, 44100, vals, n_channels=2)
    sr_n, a = W._NATIVE.load_mono_normalized(p)
    a = np.frombuffer(a, dtype=np.float32)
    sr_p, data = W.read_wav(p)
    b = W.peak_normalize(W.to_float_mono(data))
    assert sr_n == sr_p == 44100
    np.testing.assert_allclose(a, b, atol=1e-6)


@needs_native
def test_native_rejects_zero_bits(tmp_path):
    # A malformed fmt chunk declaring bits_per_sample=0 must raise
    # ValueError, not SIGFPE the process (integer division by zero).
    import struct

    x = (np.zeros(64) + 100).astype(np.int16)
    p = str(tmp_path / "bad.wav")
    W.write_wav(p, 8000, x)
    raw = bytearray(open(p, "rb").read())
    struct.pack_into("<H", raw, 34, 0)  # bits_per_sample field
    open(p, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="unsupported format"):
        W._NATIVE.load_mono_normalized(p)


@needs_native
def test_native_float32_wav(tmp_path):
    x = np.linspace(-0.5, 0.5, 1000).astype(np.float32)
    p = str(tmp_path / "f.wav")
    W.write_wav(p, 16000, x)
    sr, a = W._NATIVE.load_mono_normalized(p)
    a = np.frombuffer(a, dtype=np.float32)
    np.testing.assert_allclose(a, x / np.abs(x).max(), atol=1e-6)


@needs_native
def test_native_float64_matches_numpy(tmp_path):
    # IEEE float64: numpy path reads these via np.frombuffer; the native
    # codec must accept them too (both-paths format parity, PARITY.md)
    rng = np.random.RandomState(7)
    x64 = rng.randn(3000, 2) * 0.3
    p = str(tmp_path / "f64.wav")
    # write_wav downcasts float64 -> float32, so build the file by hand
    import struct

    body = x64.astype("<f8").tobytes()
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 2, 8000,
                                      8000 * 16, 16, 64))
        f.write(b"data" + struct.pack("<I", len(body)) + body)
    sr_n, a = W._NATIVE.load_mono_normalized(p)
    a = np.frombuffer(a, dtype=np.float32)
    sr_p, data = W.read_wav(p)
    assert data.dtype == np.float64
    b = W.peak_normalize(W.to_float_mono(data))
    assert sr_n == sr_p == 8000
    np.testing.assert_allclose(a, b, atol=1e-6)
