"""stream subcommand: raw float32 PCM stdin -> restored PCM stdout."""

import subprocess
import sys

import numpy as np

from audio_inpainting_tpu.methods.streaming import StreamRestorer


def _clip(sr=8000, n=48_000, gap=(20_000, 20_400)):
    t = np.arange(n)
    x = (0.6 * np.sin(2 * np.pi * 2 * t / sr)
         + 0.2 * np.sin(2 * np.pi * 330 * t / sr)).astype(np.float32)
    dmg = x.copy()
    dmg[gap[0]:gap[1]] = 0.0
    return x, dmg, sr, gap


def test_stream_cli_pipe_matches_engine():
    """Piping PCM through the subprocess must emit exactly the bytes the
    in-process StreamRestorer produces (the CLI is a transport shim, not a
    second engine)."""
    clean, dmg, sr, gap = _clip()
    proc = subprocess.run(
        [sys.executable, "-m", "audio_inpainting_tpu", "stream",
         "--sr", str(sr), "--method", "linear", "--window-s", "1.0",
         "--chunk", "7777"],
        input=np.asarray(dmg, "<f4").tobytes(),
        capture_output=True, timeout=600)
    assert proc.returncode == 0, proc.stderr.decode()
    out = np.frombuffer(proc.stdout, "<f4")
    assert out.shape == dmg.shape

    rest = StreamRestorer(sr, method="linear", window_s=1.0)
    parts = [rest.feed(dmg[i:i + 7777]) for i in range(0, len(dmg), 7777)]
    parts.append(rest.flush())
    want = np.concatenate(parts)
    np.testing.assert_array_equal(out, want)
    # and the gap actually improved
    g = slice(*gap)
    assert (np.mean((out[g] - clean[g]) ** 2)
            < np.mean((dmg[g] - clean[g]) ** 2))
    assert b"streamed" in proc.stderr


def test_stream_cli_partial_sample_tail_warns():
    """A trailing partial float32 (stream cut mid-sample) is dropped with a
    warning, not crashed on or silently absorbed."""
    _, dmg, sr, _ = _clip(n=8_000, gap=(4_000, 4_100))
    body = np.asarray(dmg, "<f4").tobytes() + b"\x01\x02"
    proc = subprocess.run(
        [sys.executable, "-m", "audio_inpainting_tpu", "stream",
         "--sr", str(sr), "--method", "linear", "--window-s", "1.0"],
        input=body, capture_output=True, timeout=600)
    assert proc.returncode == 0, proc.stderr.decode()
    assert len(np.frombuffer(proc.stdout, "<f4")) == len(dmg)
    assert b"trailing bytes" in proc.stderr
