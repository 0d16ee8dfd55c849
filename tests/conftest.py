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


# ---------------------------------------------------------------- tiering --
# The full suite costs ~87 min on this 1-core box (round-5 measured).
# Tests >= ~30 s (measured via --durations; dominated by GAN/U-Net training
# loops and 8-device SPMD compiles) carry the `slow` marker, leaving a
# <20-minute default development subset:
#
#     pytest -m "not slow" tests/      # fast subset (~15-19 min)
#     pytest tests/                    # everything (CI / end-of-round)
#
# Names are frozen from the measured run rather than marked inline so the
# tier list lives in one place; parametrized variants inherit the mark.
_SLOW_TESTS = frozenset({
    "test_graft_entry_contract",
    "test_restore_unet_blind_fills_with_content",
    "test_batch_restore_gan_clips_dp_sharded",
    "test_packed_flagship_mesh_equivalence",
    "test_gan_batch_retry_retrains_bad_clips",
    "test_restore_gan_with_original",
    "test_windowed_unet_batched_equals_sequential",
    "test_gan_batch_single_clip_matches_gan_train_restore",
    "test_gan_ema_readout",
    "test_unet_batch_single_clip_matches_unet_train_restore",
    "test_serve_gan_skips_clip_missing_original",
    "test_gan_batch_single_clip_matches_production_readout",
    "test_serve_gan_batch_requires_and_uses_originals",
    "test_gan_chunk_flat_matches_per_leaf",
    "test_restore_audio_uses_checkpoint",
    "test_gan_trains_and_composites",
    "test_batch_restore_8_clips_dp_sharded",
    "test_stream_warmup_unet_then_feed_compiles_nothing_new",
    "test_gan_retry_l1_retrains_on_bad_draw",
    "test_unet_gap_extra",
    "test_gan_vmap_d_equivalence",
    "test_unet_inpaints_masked_region",
    "test_batch_restore_respects_epoch_count",
    "test_unet_chunk_flat_matches_per_leaf",
    "test_serve_unet_batch",
    "test_restore_unet_all_damaged_is_finite",
    "test_restore_unet",
    "test_gan_batch_valid_ones_matches_default",
    "test_windowed_unet_batched_on_8dev_mesh",
    "test_restore_audio_sample_mask_overrides_detection",
    "test_persistent_unet_chunk_invariance_and_carry",
    "test_pretrain_and_reuse",
    "test_gan_empty_patchgan_map_contract",
    "test_diffusion_inpaint_smoke_tiny",
    "test_serve_cli",
    "test_windowed_unet_batched_mixed_sizes",
    "test_persistent_unet_opt_out_matches_facade",
    "test_sd_tiny_forward_golden",
    "test_unet_tiny_shapes",
    "test_unet_batch_internal_divisor_padding",
    "test_unet_batch_composite_mask_differs_from_train_mask",
    "test_diffusion_unet_still_trains",
    "test_gan_ema_gap_scope_splits_fill_by_column",
    "test_shared_unet_dp_training_step_runs_and_learns",
    "test_unet_full_loss_variant_runs",
    "test_gan_retry_holeless_mask_is_a_noop",
    "test_spatial_training_runs_on_dp_x_tp_mesh",
    "test_restore_unet_explicit_gaps_columns",
    "test_persistent_unet_never_trains_on_hole_content",
    "test_riffusion_restore_audio_end_to_end_tiny",
})


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: training-loop / SPMD-compile heavy (>= ~30 s on "
        "the 1-core reference box); deselect with -m 'not slow'")


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name.split("[")[0] in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
