#!/usr/bin/env python
"""Generate tests/golden/sd_tiny_golden.npz — the frozen SD forward goldens.

Run ONCE on CPU (the test suite's platform) after the independent NumPy
oracles in tests/test_sd_golden.py pass, then commit the npz. Regenerating
is only legitimate when the forward math changes DELIBERATELY — and then
the oracles must pass first (they are the independent derivation; the
goldens only extend their reach to the whole-model plumbing).

    JAX_PLATFORMS=cpu python tools/gen_sd_goldens.py
"""

import os
import sys

# EXACTLY the test suite's platform config (tests/conftest.py): XLA CPU
# codegen differs between device-count configs enough to move a 2-level
# UNet forward by ~3e-2 — goldens must be generated under the same flags
# the suite asserts them under.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402


def main() -> int:
    from test_sd_golden import GOLDEN, _tiny_outputs  # noqa: E402

    out = _tiny_outputs()
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(GOLDEN, **out)
    for k, v in out.items():
        print(f"{k}: shape={v.shape} mean={v.mean():+.6f} "
              f"std={v.std():.6f}")
    print(f"wrote {GOLDEN}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
