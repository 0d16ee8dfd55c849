#!/usr/bin/env python
"""Measure the reference's own scripts on CPU to establish BASELINE.md.

Copies /root/reference into a /tmp sandbox (execution only — reference code
never enters this repo), shims the missing ``torchaudio`` module (the
reference only uses torchaudio.load; this image ships torch but not
torchaudio), forces the Agg matplotlib backend, runs each runnable script
under ``time``, and records wall-clock + printed SNRs as JSON lines.

main_diffusion_gap.py needs ``diffusers`` + a HF download — impossible in
this zero-egress image; recorded as skipped.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time

REF = "/root/reference"
SANDBOX = "/tmp/refbench"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbench_results.jsonl"

TORCHAUDIO_SHIM = '''
"""torchaudio shim for baseline measurement: only load() is used."""
import numpy as np
import torch
from scipy.io import wavfile

def load(path):
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 1:
        data = data[None, :]
    else:
        data = data.T
    return torch.from_numpy(data.copy()), sr
'''

# execution order honors the reference's inter-script file chaining
SCRIPTS = [
    "generate_part1_data.py",
    "generate_part2_data.py",
    "linear_interp_part1.py",      # needs part1/damaged_random.wav (moved below)
    "main1_gp.py",
    "main2_AR.py",
    "main3_AR_text.py",
    "main4_NMF.py",
    "main5_UNet_mask.py",          # publishes demo_assets/damaged_random.wav
    "main3_AR_text_mask.py",
    "main4_NMF_mask.py",
    "main3_AR_text_gap.py",
    "main4_NMF_gap.py",
    "main_gan_gap.py",
    "main5_UNet_gap.py",
]


def main():
    if os.path.exists(SANDBOX):
        shutil.rmtree(SANDBOX)
    os.makedirs(SANDBOX)
    for f in os.listdir(REF):
        if f.endswith(".py") or f.endswith(".wav"):
            shutil.copy(os.path.join(REF, f), SANDBOX)
    with open(os.path.join(SANDBOX, "torchaudio.py"), "w") as f:
        f.write(TORCHAUDIO_SHIM)

    env = dict(os.environ)
    env["MPLBACKEND"] = "Agg"
    env["JAX_PLATFORMS"] = "cpu"  # keep the axon sitecustomize off the TPU
    env["PYTHONUNBUFFERED"] = "1"

    results = []
    for script in SCRIPTS:
        # the author hand-moved assets between script runs (SURVEY.md §2);
        # replicate the two known moves
        da = os.path.join(SANDBOX, "demo_assets")
        os.makedirs(os.path.join(da, "part1"), exist_ok=True)
        os.makedirs(os.path.join(da, "part2"), exist_ok=True)
        for src, dst in [("damaged_random.wav", "part1/damaged_random.wav"),
                         ("part2/original.wav", "original.wav")]:
            s, d = os.path.join(da, src), os.path.join(da, dst)
            if os.path.exists(s) and not os.path.exists(d):
                shutil.copy(s, d)

        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, script], cwd=SANDBOX, env=env,
                capture_output=True, text=True, timeout=3 * 3600)
            wall = time.time() - t0
            snrs = re.findall(r"SNR: ([-\d.]+) dB, Local SNR: ([-\d.]+) dB",
                              proc.stdout)
            rec = {"script": script, "wall_s": round(wall, 2),
                   "returncode": proc.returncode,
                   "snr": snrs[-1] if snrs else None}
            if proc.returncode != 0:
                rec["stderr_tail"] = proc.stderr[-500:]
        except subprocess.TimeoutExpired:
            rec = {"script": script, "wall_s": time.time() - t0,
                   "returncode": "timeout"}
        results.append(rec)
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    print("TOTAL runnable wall:",
          sum(r["wall_s"] for r in results if r["returncode"] == 0))


if __name__ == "__main__":
    main()
