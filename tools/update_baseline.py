#!/usr/bin/env python
"""Convert refbench results (measure_reference_baseline.py output) into
baseline_cpu.json (consumed by bench.py's vs_baseline) and print the
BASELINE.md comparison table skeleton."""

from __future__ import annotations

import json
import sys

IN = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refbench_results.jsonl"
OUT = sys.argv[2] if len(sys.argv) > 2 else "baseline_cpu.json"

# reference scripts whose method work maps to bench.py's comparable set
COMPARABLE = {
    "main1_gp.py",            # part0 gp
    "main2_AR.py",            # part0 ar
    "main3_AR_text.py",       # part0 ar_texture
    "main4_NMF.py",           # part0 nmf
    "main5_UNet_mask.py",     # part1 corruption + unet
    "linear_interp_part1.py", # part1 linear
    "main3_AR_text_mask.py",  # part1 ar
    "main4_NMF_mask.py",      # part1 nmf
    "generate_part2_data.py", # part2 corruption + linear
    "main3_AR_text_gap.py",   # part2 ar
    "main4_NMF_gap.py",       # part2 nmf
    "main_gan_gap.py",        # part2 gan
}


def main():
    rows = {}
    with open(IN) as f:
        for line in f:
            rec = json.loads(line)
            rows[rec["script"]] = rec   # last run wins

    total = 0.0
    missing = []
    for s in sorted(COMPARABLE):
        rec = rows.get(s)
        if rec and rec.get("returncode") == 0:
            total += rec["wall_s"]
        else:
            missing.append(s)

    out = {
        "machine": "1-core CPU (this image), reference scripts unmodified "
                   "(torchaudio shim for load only)",
        "comparable_suite_wall_s": round(total, 2),
        "missing_scripts": missing,
        "per_script": {s: rows[s] for s in rows},
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"comparable_suite_wall_s={total:.1f} missing={missing}")
    for s in sorted(rows):
        r = rows[s]
        print(f"  {s:28s} {r['wall_s']:9.1f}s rc={r['returncode']} snr={r.get('snr')}")


if __name__ == "__main__":
    main()
