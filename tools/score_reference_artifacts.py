#!/usr/bin/env python
"""Score the reference's own output WAVs against its own originals.

The reference prints SNR for only 4 of its 14 scripts (SURVEY.md §6); its
remaining outputs sit unscored in the refbench run directory. This tool
computes global SNR / gap-local SNR / LSD for every restored WAV the
reference produced, so every parity claim in PARITY.md carries a number.

Methodology (identical to our pipelines' scoring):
- every WAV is loaded with load_mono_normalized (mono mix + peak-normalize),
  the same chain the reference applies when re-reading its own artifacts;
- gap-local SNR uses gap bounds blind-detected from the corresponding
  *damaged* artifact (longest sub-threshold run for single-gap scenarios,
  all runs for multi-gap) — the same detectors the pipelines use;
- LSD uses the scipy 1024/256 convention.

Writes an ``artifact_scores`` section into baseline_cpu.json.

Usage: python tools/score_reference_artifacts.py [refbench_dir] [baseline.json]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from audio_inpainting_tpu.corrupt import find_gaps  # noqa: E402
from audio_inpainting_tpu.io import load_mono_normalized  # noqa: E402
from audio_inpainting_tpu.metrics import lsd_db, snr_db  # noqa: E402


def _load(path: str) -> np.ndarray | None:
    if not os.path.exists(path):
        return None
    _, x = load_mono_normalized(path)
    return x


def _multi_gap_local_snr(orig, rest, gaps) -> float | None:
    """SNR over the union of gap samples (multi-gap scenarios)."""
    if not gaps:
        return None
    sel = np.zeros(len(orig), bool)
    for s, e in gaps:
        sel[s:e] = True
    o, r = orig[sel], rest[sel]
    return float(10 * np.log10(np.sum(o**2) / (np.sum((o - r) ** 2) + 1e-10)))


def _score(orig, rest, gaps) -> dict:
    n = min(len(orig), len(rest))
    o, r = orig[:n], rest[:n]
    return {
        "snr_db": round(float(snr_db(o, r)), 2),
        "local_snr_db": (None if not gaps else
                         round(_multi_gap_local_snr(o, r, gaps), 2)),
        "lsd_db": round(float(lsd_db(o, r)), 2),
    }


def _detect(damaged, threshold, min_len, longest_only):
    gaps = find_gaps(damaged, threshold=threshold, min_len=min_len)
    if longest_only and gaps:
        gaps = [max(gaps, key=lambda g: g[1] - g[0])]
    return [(int(s), int(e)) for s, e in gaps]


def score_all(root: str) -> dict:
    da = os.path.join(root, "demo_assets")
    scores: dict[str, dict] = {}

    # ---- part2: single 2 s center gap -----------------------------------
    orig = _load(os.path.join(da, "part2", "original.wav"))
    damaged = _load(os.path.join(da, "part2", "damaged_gap.wav"))
    if orig is not None and damaged is not None:
        gaps = _detect(damaged, 1e-4, 1000, longest_only=True)
        for name in ("damaged_gap", "fixed_linear_gap", "fixed_ar_gap",
                     "fixed_nmf_gap", "fixed_gan_gap", "fixed_diffusion_gap"):
            x = _load(os.path.join(da, "part2", f"{name}.wav"))
            if x is not None:
                scores[f"part2/{name}"] = _score(orig, x, gaps)

    # ---- part1 root group: U-Net-published random STFT-frame dropouts ---
    orig = _load(os.path.join(da, "original.wav"))
    damaged = _load(os.path.join(da, "damaged_random.wav"))
    if orig is not None and damaged is not None:
        # mask-variant scripts detect with threshold 0.01, runs > 100
        gaps = _detect(damaged, 0.01, 100, longest_only=False)
        for name in ("damaged_random", "fixed_linear_random",
                     "fixed_ar_random", "fixed_nmf_random"):
            x = _load(os.path.join(da, f"{name}.wav"))
            if x is not None:
                scores[f"root/{name}"] = _score(orig, x, gaps)
        # U-Net mask variant's own composite (main6_results dir)
        m6 = os.path.join(root, "main6_results")
        if os.path.isdir(m6):
            for sub in sorted(os.listdir(m6)):
                x = _load(os.path.join(m6, sub, "dl_long_restored.wav"))
                if x is not None:
                    scores["root/dl_long_restored"] = _score(orig, x, gaps)
                    break

    # ---- part1 time-domain random dropouts (generate_part1_data) --------
    damaged = _load(os.path.join(da, "part1", "damaged_random.wav"))
    if orig is not None and damaged is not None:
        gaps = _detect(damaged, 1e-4, 10, longest_only=False)
        for name in ("damaged_random", "fixed_linear_random"):
            x = _load(os.path.join(da, "part1", f"{name}.wav"))
            if x is not None:
                scores[f"part1/{name}"] = _score(orig, x, gaps)

    # ---- U-Net gap variant (writes to CWD) -------------------------------
    orig2 = _load(os.path.join(da, "part2", "original.wav")) \
        if orig is None else orig
    for name in ("dl_corrupted", "dl_restored"):
        x = _load(os.path.join(root, f"{name}.wav"))
        if x is not None and orig2 is not None:
            dmg = _load(os.path.join(root, "dl_corrupted.wav"))
            gaps = _detect(dmg, 0.01, 100, longest_only=False) \
                if dmg is not None else []
            scores[f"root/{name}"] = _score(orig2, x, gaps)

    # ---- part0: 0.05 s segment, per-method triplets ----------------------
    p0 = os.path.join(da, "part0")
    if os.path.isdir(p0):
        for method in ("gp", "ar", "ar_texture", "nmf"):
            o = _load(os.path.join(p0, f"{method}_original.wav"))
            c = _load(os.path.join(p0, f"{method}_corrupted.wav"))
            r = _load(os.path.join(p0, f"{method}_restored.wav"))
            if o is None or r is None:
                continue
            gaps = (_detect(c, 1e-4, 20, longest_only=True)
                    if c is not None else [])
            scores[f"part0/{method}_restored"] = _score(o, r, gaps)

    return scores


def main() -> int:
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbench"
    baseline = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(__file__), "..", "baseline_cpu.json")
    scores = score_all(root)
    print(json.dumps(scores, indent=1))
    if os.path.exists(baseline):
        with open(baseline) as f:
            data = json.load(f)
        data["artifact_scores"] = scores
        data["artifact_scores_note"] = (
            "reference outputs scored vs reference originals; both sides "
            "load_mono_normalized; local SNR over blind-detected gap(s) "
            "from the damaged artifact; LSD scipy 1024/256")
        with open(baseline, "w") as f:
            json.dump(data, f, indent=1)
        print(f"wrote artifact_scores -> {baseline}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
