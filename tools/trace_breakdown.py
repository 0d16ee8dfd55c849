#!/usr/bin/env python
"""Per-op device-time breakdown of a jax.profiler trace.

Groups the XLA Ops lane (pid 3 / tid 3 — the convention asserted by
tools/mfu.py:device_ms_from_trace) by op name, collapsing fusion indices
(`fusion.123` -> `fusion`) optionally, and prints the top-K rows with total
ms, count, and % of lane time. Use on the dirs tools/gan_epoch_time.py
writes to find which fusions/convolutions own the epoch.

Usage: python tools/trace_breakdown.py TRACE_DIR [-k 25] [--exact]
"""

from __future__ import annotations

import glob
import gzip
import json
import re


def breakdown(trace_dir: str, exact: bool = False):
    traces = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not traces:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}/plugins/"
                         f"profile/ — is this a jax.profiler trace dir?")
    f = traces[-1]
    with gzip.open(f) as fh:
        d = json.load(fh)
    groups: dict[str, list[float]] = {}
    total = 0.0
    for e in d["traceEvents"]:
        if (e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3
                and "dur" in e and not e["name"].startswith("while")):
            name = e["name"]
            if not exact:
                # collapse per-instance suffixes: fusion.123, convolution.4
                name = re.sub(r"\.(\d+)$", "", name)
            groups.setdefault(name, []).append(e["dur"])
            total += e["dur"]
    rows = sorted(((sum(v), len(v), k) for k, v in groups.items()),
                  reverse=True)
    return rows, total


def main() -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("trace_dir")
    p.add_argument("-k", type=int, default=25, help="rows to print")
    p.add_argument("--exact", action="store_true",
                   help="keep per-instance op suffixes (fusion.123)")
    ns = p.parse_args()
    k, exact = ns.k, ns.exact
    rows, total = breakdown(ns.trace_dir, exact)
    print(f"{'ms':>10} {'%':>6} {'count':>7}  op")
    for dur, cnt, name in rows[:k]:
        print(f"{dur / 1e3:10.3f} {100 * dur / total:6.2f} {cnt:7d}  {name}")
    print(f"{total / 1e3:10.3f} 100.00 {'':7}  TOTAL (XLA Ops lane)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
