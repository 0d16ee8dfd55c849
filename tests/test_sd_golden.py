"""SD forward numerics pinned two independent ways (VERDICT r3 #6).

Real riffusion weights are unreachable in this zero-egress environment
(reference main_diffusion_gap.py:16-19 downloads them from the HF hub), so
loader round-trips alone could hide a silently-wrong forward: a transposed
q/k/v projection or a wrong GroupNorm epsilon would load real weights
cleanly and produce garbage. These tests close that hole with:

1. **Independent NumPy oracles** for the attention and GroupNorm math —
   re-derived from the Stable Diffusion v1 / Transformer equations, NOT
   from the Flax implementation:

       Attention(Q, K, V) = softmax(Q K^T / sqrt(d_head)) V          (1)

   with Q = x Wq, K = c Wk, V = c Wv computed per head by an explicit
   Python loop over heads (diffusers layout: the Dense kernel is (in,
   inner) — torch Linear stores (out, in), so the loader must transpose;
   using the un-transposed kernel fails these oracles), heads concatenated
   and projected by to_out_0 (the only biased projection). GroupNorm
   normalizes each contiguous group of C/G channels by its own mean and
   variance over (spatial x group-channels), then applies per-channel
   scale/shift:

       y = (x - mu_g) / sqrt(var_g + eps) * gamma_c + beta_c          (2)

   The oracles use explicit loops and np.float64 where it matters, so
   they share no code path with the jnp.einsum implementations.

2. **Frozen goldens**: tiny() UNet2DCondition and AutoencoderKL with
   weights from a fixed PRNG, one denoise forward + one VAE
   encode/decode, asserted against tensors committed in
   tests/golden/sd_tiny_golden.npz (generated once by
   tools/gen_sd_goldens.py AFTER the oracles above passed). Any later
   regression of the forward math — including one the oracles do not
   cover (resnet plumbing, skip order, timestep embedding) — goes red.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_inpainting_tpu.models.sd.unet2d import (Attention, UNet2DCondition,
                                                   UNetConfig)
from audio_inpainting_tpu.models.sd.vae import (AutoencoderKL, VAEAttention,
                                                VAEConfig)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "sd_tiny_golden.npz")


def _groupnorm_oracle(x, gamma, beta, groups, eps):
    """Eq. (2): per-group statistics over (H, W, C/G), float64."""
    b, h, w, c = x.shape
    gs = c // groups
    x64 = x.astype(np.float64).reshape(b, h, w, groups, gs)
    mu = x64.mean(axis=(1, 2, 4), keepdims=True)
    var = x64.var(axis=(1, 2, 4), keepdims=True)
    y = (x64 - mu) / np.sqrt(var + eps)
    y = y.reshape(b, h, w, c)
    return y * gamma[None, None, None, :] + beta[None, None, None, :]


def _attention_oracle(x, ctx, p, heads, dim_head):
    """Eq. (1), one explicit Python loop per head, float64."""
    q = x @ p["to_q"]["kernel"]          # (B, Lq, inner), no bias
    k = ctx @ p["to_k"]["kernel"]
    v = ctx @ p["to_v"]["kernel"]
    outs = []
    for h in range(heads):
        sl = slice(h * dim_head, (h + 1) * dim_head)
        qh, kh, vh = (t[..., sl].astype(np.float64) for t in (q, k, v))
        scores = qh @ kh.transpose(0, 2, 1) / np.sqrt(dim_head)
        scores -= scores.max(axis=-1, keepdims=True)
        w = np.exp(scores)
        w /= w.sum(axis=-1, keepdims=True)
        outs.append(w @ vh)
    merged = np.concatenate(outs, axis=-1)
    return merged @ p["to_out_0"]["kernel"] + p["to_out_0"]["bias"]


def test_unet_attention_matches_numpy_oracle():
    heads, dim_head = 2, 4
    model = Attention(heads, dim_head)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 8)).astype(np.float32)
    ctx = rng.standard_normal((2, 3, 6)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(1), jnp.asarray(x),
                        jnp.asarray(ctx))["params"]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 jnp.asarray(ctx)))
    p = jax.tree_util.tree_map(np.asarray, params)
    want = _attention_oracle(x, ctx, p, heads, dim_head)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # the regression the goldens exist to catch: a TRANSPOSED projection
    # (torch's (out, in) layout used without the loader's transpose) must
    # NOT reproduce the oracle
    pt = {k: ({"kernel": v["kernel"].T, **{kk: vv for kk, vv in v.items()
                                           if kk != "kernel"}}
              if v["kernel"].shape[0] == v["kernel"].shape[1] else v)
          for k, v in p.items()}
    if any(v["kernel"].shape[0] == v["kernel"].shape[1]
           for v in p.values()):
        wrong = _attention_oracle(x, ctx, pt, heads, dim_head)
        assert not np.allclose(got, wrong, atol=1e-3)


def test_vae_attention_matches_numpy_oracle():
    groups = 4
    model = VAEAttention(groups)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 4, 6, 8)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(x))["params"]
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    p = jax.tree_util.tree_map(np.asarray, params)
    b, h, w, c = x.shape
    gn = _groupnorm_oracle(x, p["group_norm"]["scale"],
                           p["group_norm"]["bias"], groups, 1e-6)
    flat = gn.reshape(b, h * w, c)
    attn = _attention_oracle(flat, flat, p, heads=1, dim_head=c)
    want = attn.reshape(b, h, w, c) + x
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_groupnorm_epsilon_conventions():
    """The UNet uses eps=1e-5 GroupNorms, the VAE/Transformer2D 1e-6 —
    pin both against the oracle so an epsilon mix-up cannot load real
    weights silently."""
    import flax.linen as nn

    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 3, 5, 8)).astype(np.float32) * 3.0
    for eps in (1e-5, 1e-6):
        m = nn.GroupNorm(4, epsilon=eps)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        p = jax.tree_util.tree_map(np.asarray, params)
        got = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
        want = _groupnorm_oracle(x, p["scale"], p["bias"], 4, eps)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def _tiny_fixtures():
    """Deterministic tiny models + inputs (MUST match tools/gen_sd_goldens.py)."""
    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vcfg)
    kx, kc, ku, kv = jax.random.split(jax.random.PRNGKey(7), 4)
    lat = jax.random.normal(kx, (1, 16, 16, 4), jnp.float32)
    ctx = jax.random.normal(kc, (1, 3, ucfg.cross_attention_dim), jnp.float32)
    t = jnp.asarray([500], jnp.int32)
    img = jax.random.normal(kx, (1, 32, 32, 3), jnp.float32)
    up = unet.init(ku, lat, t, ctx)["params"]
    vp = vae.init(kv, img, jax.random.PRNGKey(0))["params"]
    return unet, vae, up, vp, lat, t, ctx, img


def _tiny_outputs():
    unet, vae, up, vp, lat, t, ctx, img = _tiny_fixtures()
    eps = unet.apply({"params": up}, lat, t, ctx)
    mean, logvar = vae.apply({"params": vp}, img, method=AutoencoderKL.encode)
    dec = vae.apply({"params": vp}, mean, method=AutoencoderKL.decode)
    return {"unet_eps": np.asarray(eps), "vae_mean": np.asarray(mean),
            "vae_logvar": np.asarray(logvar), "vae_dec": np.asarray(dec)}


def test_sd_tiny_forward_golden():
    if not os.path.exists(GOLDEN):
        pytest.fail(f"missing committed golden file {GOLDEN} "
                    f"(generate with tools/gen_sd_goldens.py)")
    want = np.load(GOLDEN)
    got = _tiny_outputs()
    assert set(got) <= set(want.files), (got.keys(), want.files)
    for k, v in got.items():
        # tolerance sized to XLA codegen variance across CPU configs
        # (~3e-2 between device-count flags, ~1e-3 headroom within one) —
        # far below any real math bug (a transposed projection moves the
        # output by O(0.1-1))
        np.testing.assert_allclose(
            v, want[k], rtol=2e-3, atol=2e-3,
            err_msg=f"SD tiny forward drifted from committed golden '{k}'")
