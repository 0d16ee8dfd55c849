"""Test config: run on a virtual 8-device CPU mesh.

Real TPU hardware here is single-chip; multi-chip sharding is validated by
forcing 8 virtual CPU devices (the driver's dryrun does the same).
Must run before jax initializes, hence module scope in conftest.
"""

import os
import resource

# XLA's CPU compiler recurses deeply on the biggest programs here (the GAN
# scan chunk, 8-device SPMD of the packed models, the dense conv twins);
# with the default 8 MB stack it SEGFAULTS in backend_compile_and_load once
# the process has aged (every observed crash is a compile of one of the
# largest programs; each program is fine in a fresh process). XLA compiles
# on worker threads, and glibc sizes new pthread stacks from RLIMIT_STACK —
# but falls back to the 8 MB default when the limit is RLIM_INFINITY, so an
# "unlimited" limit does NOT help the compile threads. Set a large FINITE
# limit (virtual reservation only) before jax spawns its thread pool.
_STACK_BYTES = 512 << 20
try:
    _hard = resource.getrlimit(resource.RLIMIT_STACK)[1]
    _soft = (_STACK_BYTES if _hard == resource.RLIM_INFINITY
             else min(_STACK_BYTES, _hard))
    resource.setrlimit(resource.RLIMIT_STACK, (_soft, _hard))
except (ValueError, OSError):  # not permitted: keep the inherited limit
    pass

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# This image's sitecustomize imports jax at interpreter start (before this
# conftest), so the env vars above may be read too late; override via config.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_programs_between_modules():
    """Free XLA:CPU executables at module boundaries.

    This jaxlib segfaults inside backend_compile_and_load once the process
    has compiled a few hundred programs: every observed full-suite crash is
    a LARGE compile late in the run (the GAN scan chunk, 8-device SPMD, the
    dense conv4x4s2 grad), each fine in a fresh process — the signature of
    the JIT'd-code memory region degrading as cached executables accumulate,
    not of any one program. Dropping the caches per module keeps the
    executable population bounded; within-module compile reuse (the
    expensive case) is unaffected.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def ref_clip():
    """A deterministic music-like 10 s test clip at 44.1 kHz (synthetic, so
    tests don't depend on the reference's asset file)."""
    sr = 44100
    t = np.arange(10 * sr, dtype=np.float64) / sr
    rng = np.random.RandomState(0)
    x = (
        0.5 * np.sin(2 * np.pi * 220 * t)
        + 0.3 * np.sin(2 * np.pi * 440 * t + 0.3)
        + 0.15 * np.sin(2 * np.pi * 1760 * t * (1 + 0.001 * np.sin(2 * np.pi * 2 * t)))
        + 0.02 * rng.randn(len(t))
    )
    x = (x / np.max(np.abs(x))).astype(np.float32)
    return sr, x


@pytest.fixture(scope="session")
def short_clip(ref_clip):
    """0.05 s mid-clip segment, the reference's Part-0 working set."""
    sr, x = ref_clip
    n = int(0.05 * sr)
    start = len(x) // 2
    return sr, x[start : start + n]
