"""Persistent XLA compilation cache for serving processes.

The serving engines' cold-start cost is XLA compiles (round-4 measured:
AR warmup 79.5 s / 18 programs, U-Net 324 s — BASELINE.md streaming
table), and it was paid per PROCESS: the persistent compilation cache was
wired only into bench.py, so every new `stream`/`serve` process recompiled
everything and the unwarmed first-gap stalls (10.9 s AR / 72 s U-Net)
recurred on every restart. This module wires the same cache into the
serving entry points (`StreamRestorer.warmup()` and the stream/serve/
windowed-restore CLIs): a restarted server re-loads its programs from disk
instead of recompiling them.

Guard: this jaxlib SEGFAULTS serializing/deserializing multi-device CPU
pjit executables (found round 3; see bench.py._enable_compilation_cache),
so the cache stays off for CPU backends — the virtual-mesh test suite and
CPU smoke runs keep their round-trip-free behavior, while real
accelerators (the serving deployment) get the cache.
"""

from __future__ import annotations

import os
import tempfile


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Idempotently enable jax's persistent compilation cache (accelerator
    backends only; no-op on CPU). Returns True when enabled.

    Directory resolution: ``cache_dir`` argument, else $AIT_COMPILE_CACHE,
    else ``$TMPDIR/ait_compile_cache``. Set AIT_COMPILE_CACHE=off to
    disable entirely.
    """
    env = os.environ.get("AIT_COMPILE_CACHE", "")
    if env.lower() in ("off", "0", "none"):
        return False
    import jax

    try:
        backend = jax.default_backend()
    except RuntimeError:
        # backend init failed (e.g. a plugin platform is requested but not
        # registered in this process) — don't add a second confusing
        # traceback from the cache helper; the caller's first real jax use
        # will surface the original error
        return False
    if backend == "cpu":
        return False
    path = cache_dir or env or os.path.join(tempfile.gettempdir(),
                                            "ait_compile_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program: the serving windows' programs individually
    # compile under the default 1 s floor yet still stall a live feed
    # when recompiled on restart
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return True
