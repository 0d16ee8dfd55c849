#!/usr/bin/env python
"""Diagnostic: reference-style torch GAN trajectory on CPU (not shipped code).

Replicates main_gan_gap.py's training dynamics on the same damaged input our
pipeline produces, logging rec/adv losses and composite-vs-real hole L1 every
N epochs, so we can see where our JAX GAN's optimization diverges from
torch's. Behavioral spec: /root/reference/main_gan_gap.py:117-158.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import torch
import torch.nn as nn

from audio_inpainting_tpu.corrupt import center_gap_bounds
from audio_inpainting_tpu.io import load_mono_normalized
from audio_inpainting_tpu.io.wav import save_wav_int16
from audio_inpainting_tpu.metrics import local_snr_db, lsd_db, snr_db

INPUT = os.environ.get("BENCH_INPUT",
                       "/root/reference/vocals_accompaniment_10s.wav")


def block(ci, co):
    return nn.Sequential(
        nn.Conv2d(ci, co, 3, padding=1), nn.BatchNorm2d(co), nn.LeakyReLU(0.2),
        nn.Conv2d(co, co, 3, padding=1), nn.BatchNorm2d(co), nn.LeakyReLU(0.2))


class G(nn.Module):
    def __init__(self):
        super().__init__()
        self.e1, self.e2, self.b = block(1, 16), block(16, 32), block(32, 64)
        self.p = nn.MaxPool2d(2)
        self.u2 = nn.ConvTranspose2d(64, 32, 2, 2)
        self.d2 = block(64, 32)
        self.u1 = nn.ConvTranspose2d(32, 16, 2, 2)
        self.d1 = block(32, 16)
        self.f = nn.Conv2d(16, 1, 1)

    def forward(self, x):
        e1 = self.e1(x)
        e2 = self.e2(self.p(e1))
        b = self.b(self.p(e2))
        d2 = self.u2(b)
        d2 = nn.functional.interpolate(d2, size=e2.shape[2:])
        d2 = self.d2(torch.cat((e2, d2), 1))
        d1 = self.u1(d2)
        d1 = nn.functional.interpolate(d1, size=e1.shape[2:])
        return torch.tanh(self.f(self.d1(torch.cat((e1, d1), 1))))


class D(nn.Module):
    def __init__(self):
        super().__init__()
        self.m = nn.Sequential(
            nn.Conv2d(1, 16, 4, 2, 1), nn.LeakyReLU(0.2),
            nn.Conv2d(16, 32, 4, 2, 1), nn.BatchNorm2d(32), nn.LeakyReLU(0.2),
            nn.Conv2d(32, 64, 4, 2, 1), nn.BatchNorm2d(64), nn.LeakyReLU(0.2),
            nn.Conv2d(64, 1, 4, 1, 0), nn.Sigmoid())

    def forward(self, x):
        return self.m(x)


def main(epochs=300, log_every=25, seed=0):
    torch.manual_seed(seed)
    sr, data = load_mono_normalized(INPUT)
    data = data[:10 * sr]
    n = len(data)
    gs, ge = center_gap_bounds(n, sr)
    corrupted = data.copy()
    corrupted[gs:ge] = 0.0
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        save_wav_int16(corrupted, sr, f.name)
        _, damaged = load_mono_normalized(f.name)
    os.unlink(f.name)

    win = torch.hann_window(1024)
    z = torch.stft(torch.tensor(damaged, dtype=torch.float32), 1024,
                   hop_length=256, window=win, return_complex=True)
    mag, phase = torch.abs(z), torch.angle(z)
    mn, mx = mag.min(), mag.max()
    norm = (mag - mn) / (mx - mn) * 2 - 1
    keep = (norm > -0.95).float()
    z_r = torch.stft(torch.tensor(data, dtype=torch.float32), 1024,
                     hop_length=256, window=win, return_complex=True)
    real = (torch.abs(z_r) - mn) / (mx - mn) * 2 - 1

    inp_t = norm[None, None]
    real_t = real[None, None]
    keep_t = keep[None, None]
    netG, netD = G(), D()
    oG = torch.optim.Adam(netG.parameters(), lr=2e-4, betas=(0.5, 0.999))
    oD = torch.optim.Adam(netD.parameters(), lr=2e-4, betas=(0.5, 0.999))
    bce, l1 = nn.BCELoss(), nn.L1Loss()
    hole = 1 - keep_t

    t0 = time.time()
    for ep in range(epochs):
        netD.zero_grad()
        out_real = netD(real_t)
        ld_r = bce(out_real, torch.ones_like(out_real))
        fake = netG(inp_t)
        completed = inp_t * keep_t + fake * hole
        out_fake = netD(completed.detach())
        ld_f = bce(out_fake, torch.zeros_like(out_fake))
        ((ld_r + ld_f) * 0.5).backward()
        oD.step()

        netG.zero_grad()
        out_fake_g = netD(completed)
        adv = bce(out_fake_g, torch.ones_like(out_fake_g))
        rec = l1(fake * hole, real_t * hole)
        (rec * 0.99 + adv * 0.01).backward()
        oG.step()

        if (ep + 1) % log_every == 0 or ep == 0:
            with torch.no_grad():
                hl1 = float((torch.abs((completed - real_t) * hole)).sum()
                            / hole.sum())
            print(json.dumps({"ep": ep + 1, "rec": round(float(rec), 5),
                              "adv": round(float(adv), 4),
                              "d": round(float(ld_r + ld_f) / 2, 5),
                              "hole_l1": round(hl1, 5),
                              "s": round(time.time() - t0, 1)}), flush=True)

    netG.eval()
    with torch.no_grad():
        fake = netG(inp_t)
        final = inp_t * keep_t + fake * hole
        final = ((final + 1) / 2 * (mx - mn) + mn)[0, 0]
        rec_z = torch.polar(final, phase)
        out = torch.istft(rec_z, 1024, hop_length=256, window=win, length=n)
    out = np.clip(out.numpy(), -1, 1)
    print(json.dumps({"variant": f"torch-{epochs}ep",
                      "snr_db": round(float(snr_db(data, out)), 3),
                      "local_snr_db": round(float(local_snr_db(data, out, gs, ge)), 3),
                      "lsd_db": round(float(lsd_db(data, out)), 3)}), flush=True)


if __name__ == "__main__":
    main(epochs=int(sys.argv[1]) if len(sys.argv) > 1 else 300)
