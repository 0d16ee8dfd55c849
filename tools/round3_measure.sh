#!/bin/bash
# Round-3 measurement battery — run once the TPU tunnel is healthy.
# Usage: bash tools/round3_measure.sh [outdir]  (default /tmp/r3measure)
set -u
OUT=${1:-/tmp/r3measure}
mkdir -p "$OUT"
cd /root/repo

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  timeout "$t" "$@" >"$OUT/$name.json" 2>"$OUT/$name.err"
  echo "rc=$? -> $OUT/$name.json"
  tail -c 400 "$OUT/$name.json" || true
  echo
}

# 1. GAN epoch device time: flat vs per-leaf Adam (packed D, 100 epochs)
run gan_epoch_flat   1200 python tools/gan_epoch_time.py packed 100 flat
run gan_epoch_plain  1200 python tools/gan_epoch_time.py packed 100 plain

# 1b. Op-count lever A/B on the GAN epoch: single-gather band-kernel
# build (bitwise-equal values, tests/test_packed.py). Flip the default
# only if it WINS. (A latency-hiding-scheduler XLA-flag A/B was planned
# here but this jaxlib's XLA rejects the flag as unknown —
# parse_flags_from_env aborts — so it is not measurable on this stack.)
run gan_epoch_gather 1200 env AIT_BAND_GATHER=1 \
    python tools/gan_epoch_time.py packed 100 flat

# 2. GAN wall attribution, production 1500 epochs (compile + steady runs)
run gan_wall         2400 python tools/gan_wall_probe.py 1500

# 3. AR engines on the 88.2k-step part-2 gap
run ar_engines       1200 python tools/ar_chunk_time.py

# 4. Multi-clip serving throughput (U-Net 400 ep and GAN 1500 ep)
run serve_tp         3600 python tools/serve_throughput.py 400 1 4 8
run serve_tp_gan     3600 env SERVE_METHOD=gan python tools/serve_throughput.py 1500 1 2

# 5. MFU/roofline table refresh (rows also land in docs/mfu_v5e.json)
run mfu              2400 python tools/mfu.py --out docs/mfu_v5e.json

# 6. Official bench (writes its own one-line JSON). Outer budget exceeds
# bench's internal 5400s watchdog so a tunnel stall emits the diagnostic
# JSON line instead of being SIGTERMed silently by this timeout.
run bench            6000 python bench.py

echo "battery done; results in $OUT"
