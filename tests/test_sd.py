"""Tests for the Flax SD/Riffusion port (models/sd/).

Real riffusion weights cannot be downloaded in this zero-egress image, so
these tests validate everything that doesn't need them: module shapes on
tiny configs, the loader's key mapping + tensor-transform round trip
(synthetic torch-style state dicts), scheduler algebra, and the full
inpaint pipeline loop end-to-end with random weights.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from audio_inpainting_tpu.models.sd import (  # noqa: E402
    AutoencoderKL, InpaintConfig, SchedulerConfig, UNet2DCondition,
    UNetConfig, VAEConfig, add_noise, alphas_cumprod, ddim_step,
    flax_to_torch_key, flax_to_torch_state, plms_init, plms_step,
    plms_timesteps, torch_to_flax)
from audio_inpainting_tpu.models.sd.pipeline import (  # noqa: E402
    riffusion_inpaint_image)


# --------------------------------------------------------------- shapes ----


def test_unet_tiny_shapes():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    x = jnp.zeros((2, 16, 16, cfg.in_channels))
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 7, cfg.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    out = model.apply({"params": params}, x, t, ctx)
    assert out.shape == (2, 16, 16, cfg.out_channels)


def test_vae_tiny_shapes():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    x = jnp.zeros((1, 32, 32, cfg.in_channels))
    params = vae.init(jax.random.PRNGKey(0), x, jax.random.PRNGKey(1))["params"]
    mean, logvar = vae.apply({"params": params}, x,
                             method=AutoencoderKL.encode)
    n_down = 2 ** (len(cfg.block_out_channels) - 1)
    assert mean.shape == (1, 32 // n_down, 32 // n_down, cfg.latent_channels)
    assert logvar.shape == mean.shape
    rec = vae.apply({"params": params}, mean, method=AutoencoderKL.decode)
    assert rec.shape == x.shape


# --------------------------------------------------------------- loader ----


def test_key_mapping_spot_checks():
    cases = {
        ("down_blocks_0_resnets_0", "conv1", "kernel"):
            "down_blocks.0.resnets.0.conv1.weight",
        ("down_blocks_0_attentions_1", "transformer_blocks_0", "attn2",
         "to_out_0", "kernel"):
            "down_blocks.0.attentions.1.transformer_blocks.0.attn2."
            "to_out.0.weight",
        ("down_blocks_0_attentions_0", "transformer_blocks_0", "ff", "net_0",
         "proj", "bias"):
            "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0."
            "proj.bias",
        ("time_embedding", "linear_1", "kernel"):
            "time_embedding.linear_1.weight",
        ("mid_block_resnets_1", "norm2", "scale"):
            "mid_block.resnets.1.norm2.weight",
        ("mid_block_attentions_0", "group_norm", "bias"):
            "mid_block.attentions.0.group_norm.bias",
        ("up_blocks_2_upsamplers_0", "conv", "kernel"):
            "up_blocks.2.upsamplers.0.conv.weight",
        ("encoder", "down_blocks_1_downsamplers_0", "conv", "bias"):
            "encoder.down_blocks.1.downsamplers.0.conv.bias",
        ("quant_conv", "kernel"): "quant_conv.weight",
        ("conv_norm_out", "scale"): "conv_norm_out.weight",
    }
    for path, want in cases.items():
        assert flax_to_torch_key(path) == want


def _roundtrip(params):
    """flax -> torch-style dict -> flax; strict both ways."""
    sd = flax_to_torch_state(params)
    back = torch_to_flax(sd, params, strict=True)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    return sd


def test_loader_roundtrip_unet():
    cfg = UNetConfig.tiny()
    model = UNet2DCondition(cfg)
    params = model.init(jax.random.PRNGKey(1),
                        jnp.zeros((1, 8, 8, cfg.in_channels)),
                        jnp.zeros((1,)),
                        jnp.zeros((1, 3, cfg.cross_attention_dim)))["params"]
    sd = _roundtrip(params)
    # torch layouts: conv OIHW, linear (O, I)
    assert sd["conv_in.weight"].shape[2:] == (3, 3)
    assert sd["conv_in.weight"].shape[0] == cfg.block_out_channels[0]


def test_loader_roundtrip_vae():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    params = vae.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 16, 16, cfg.in_channels)),
                      jax.random.PRNGKey(2))["params"]
    sd = _roundtrip(params)
    assert "encoder.mid_block.attentions.0.to_q.weight" in sd
    assert "decoder.up_blocks.0.resnets.0.conv1.weight" in sd
    assert "post_quant_conv.weight" in sd


def test_loader_legacy_vae_attention_aliases():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    params = vae.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 16, 16, cfg.in_channels)),
                      jax.random.PRNGKey(2))["params"]
    sd = flax_to_torch_state(params)
    legacy = {}
    for k, v in sd.items():
        for new, old in (("to_q", "query"), ("to_k", "key"),
                         ("to_v", "value"), ("to_out.0", "proj_attn")):
            if f"attentions.0.{new}." in k:
                k = k.replace(new, old)
                if v.ndim == 2 and k.endswith("weight"):
                    v = v[:, :, None, None]  # legacy 1x1-conv layout
                break
        legacy[k] = v
    back = torch_to_flax(legacy, params, strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_loader_strict_raises_on_missing_and_unused():
    cfg = VAEConfig.tiny()
    vae = AutoencoderKL(cfg)
    params = vae.init(jax.random.PRNGKey(1),
                      jnp.zeros((1, 16, 16, cfg.in_channels)),
                      jax.random.PRNGKey(2))["params"]
    sd = flax_to_torch_state(params)
    key = next(iter(sd))
    missing = dict(sd)
    del missing[key]
    with pytest.raises(KeyError):
        torch_to_flax(missing, params, strict=True)
    extra = dict(sd)
    extra["bogus.weight"] = np.zeros((1,), np.float32)
    with pytest.raises(KeyError):
        torch_to_flax(extra, params, strict=True)


# ------------------------------------------------------------ scheduler ----


def test_plms_timetable_structure():
    table = plms_timesteps(50)
    assert len(table) == 51
    assert table[0] == 981 and table[-1] == 1
    assert table[1] == table[2] == 961          # counter==1 re-evaluation
    assert all(np.diff(table[2:]) == -20)


def test_prev_sample_identity_with_true_eps():
    """If eps is the exact noise of x_t, every scheduler update must land on
    the exact x_{t_prev} of the same (x0, eps) pair — an algebraic identity
    of the PNDM/DDIM prev-sample formulas."""
    cfg = SchedulerConfig()
    acp = alphas_cumprod(cfg)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(2, 3)), jnp.float32)
    for t in [981, 501, 21]:
        xt = add_noise(x0, eps, jnp.int32(t), acp)
        want = add_noise(x0, eps, jnp.int32(t - 20), acp)
        got = ddim_step(xt, eps, jnp.int32(t), 50, acp, cfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_plms_constant_eps_converges_to_x0():
    """With a model that always reports the same eps, the multistep combos
    collapse to that eps and the full 51-eval PLMS chain must land exactly on
    sqrt(acp[0]) x0 + sqrt(1-acp[0]) eps (set_alpha_to_one=False)."""
    cfg = SchedulerConfig()
    acp = alphas_cumprod(cfg)
    table = jnp.asarray(plms_timesteps(50, cfg))
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    eps = jnp.asarray(rng.normal(size=(4,)), jnp.float32)
    x = add_noise(x0, eps, table[0], acp)
    state = plms_init(x.shape)
    for i in range(len(table)):
        state, x = plms_step(state, x, eps, table[i], 50, acp, cfg)
    want = add_noise(x0, eps, jnp.int32(0), acp)  # a_prev -> acp[0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(want), atol=1e-4)


def test_plms_golden_vectors_distinct_eps():
    """Pin the PLMS algebra with golden vectors from an INDEPENDENT scalar
    transcription of the PNDM update equations (paper eq. phi + the
    Adams-Bashforth warmup diffusers uses with skip_prk_steps=True).

    Every eps fed in is distinct, so each multistep coefficient
    (1/2, 3/2, 23/16/5, 55/59/37/9) contributes a different value — the
    constant-eps convergence test above cannot see a coefficient slip
    (orders collapse when all eps are equal); this one can. Literal goldens
    are from the float64 scalar reference below, NOT from plms_step."""
    cfg = SchedulerConfig()
    acp_np = np.cumprod(
        1.0 - np.linspace(cfg.beta_start ** 0.5, cfg.beta_end ** 0.5,
                          cfg.num_train_timesteps, dtype=np.float64) ** 2)
    # schedule spot values (independent of alphas_cumprod under test)
    np.testing.assert_allclose(acp_np[[1, 801, 901]],
                               [0.9982960278384514, 0.03654652460771403,
                                0.014004897893943923], rtol=1e-12)

    ratio = 100
    table = plms_timesteps(10, cfg)
    assert table.tolist() == [901, 801, 801, 701, 601, 501, 401, 301, 201,
                              101, 1]
    eps_seq = [np.cos(0.7 * i) for i in range(len(table))]

    def phi(sample, t_eval, t_prev, eps_p):
        a_t = acp_np[t_eval]
        a_prev = acp_np[t_prev] if t_prev >= 0 else acp_np[0]
        den = a_t * np.sqrt(1.0 - a_prev) + np.sqrt(
            a_t * (1.0 - a_t) * a_prev)
        return np.sqrt(a_prev / a_t) * sample - (a_prev - a_t) * eps_p / den

    x_ref, ets, counter, cur = 0.5, [], 0, None
    ref_traj = []
    for i, t in enumerate(table):
        eps = eps_seq[i]
        if counter != 1:
            ets.append(eps)
            t_prev, t_eval, sample = t - ratio, t, x_ref
        else:
            t_prev, t_eval, sample = t, t + ratio, cur
        if len(ets) == 1 and counter == 0:
            eps_p, cur = eps, x_ref
        elif len(ets) == 1 and counter == 1:
            eps_p = (eps + ets[-1]) / 2.0
        elif len(ets) == 2:
            eps_p = (3.0 * ets[-1] - ets[-2]) / 2.0
        elif len(ets) == 3:
            eps_p = (23.0 * ets[-1] - 16.0 * ets[-2] + 5.0 * ets[-3]) / 12.0
        else:
            eps_p = (55.0 * ets[-1] - 59.0 * ets[-2] + 37.0 * ets[-3]
                     - 9.0 * ets[-4]) / 24.0
        x_ref = phi(sample, t_eval, t_prev, eps_p)
        counter += 1
        ref_traj.append(x_ref)

    # the same trajectory, hard-pinned (float64 reference values)
    np.testing.assert_allclose(
        [ref_traj[0], ref_traj[1], ref_traj[2], ref_traj[3], ref_traj[10]],
        [0.18520281735902966, 0.25839600914841454, 0.5121650589659684,
         1.0432976046937008, 3.0166211302403267], rtol=1e-12)

    acp = alphas_cumprod(cfg)
    x = jnp.float32(0.5)
    state = plms_init(())
    for i, t in enumerate(table):
        state, x = plms_step(state, x, jnp.float32(eps_seq[i]),
                             jnp.int32(t), 10, acp, cfg)
        np.testing.assert_allclose(float(x), ref_traj[i], atol=3e-6,
                                   rtol=3e-6, err_msg=f"step {i} (t={t})")


def test_add_noise_golden():
    """add_noise (the strength-1.0 init) against hand-computed values."""
    acp = alphas_cumprod(SchedulerConfig())
    got = add_noise(jnp.float32(1.0), jnp.float32(-2.0), jnp.int32(901), acp)
    a = 0.014004897893943923
    np.testing.assert_allclose(float(got),
                               np.sqrt(a) - 2.0 * np.sqrt(1.0 - a),
                               rtol=1e-5)


# ------------------------------------------------------------- pipeline ----


class _FakeTokenizer:
    model_max_length = 77

    def __call__(self, texts, **kw):
        class R:
            input_ids = np.zeros((len(texts), 7), np.int32)
        return R()


class _FakeTextEncoder:
    def __init__(self, dim):
        self.dim = dim

    def __call__(self, ids):
        class R:
            pass
        r = R()
        rng = np.random.default_rng(3)
        r.last_hidden_state = rng.normal(
            size=(ids.shape[0], ids.shape[1], self.dim)).astype(np.float32)
        return r


def test_inpaint_pipeline_tiny_end_to_end():
    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vcfg)
    n_down = 2 ** (len(vcfg.block_out_channels) - 1)
    H = 32
    up = unet.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, H // n_down, H // n_down, 4)),
                   jnp.zeros((1,)),
                   jnp.zeros((1, 7, ucfg.cross_attention_dim)))["params"]
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, H, H, 3)),
                  jax.random.PRNGKey(2))["params"]
    bundle = {"unet_params": up, "vae_params": vp,
              "text_encoder": _FakeTextEncoder(ucfg.cross_attention_dim),
              "tokenizer": _FakeTokenizer(), "unet_cfg": ucfg,
              "vae_cfg": vcfg}
    img = np.random.default_rng(4).integers(
        0, 256, size=(H, H, 3)).astype(np.uint8)
    mask = np.zeros((H, H), np.uint8)
    mask[:, 12:20] = 255
    out = riffusion_inpaint_image(bundle, img, mask,
                                  cfg=InpaintConfig(steps=4), key=0)
    assert out.shape == (H, H, 3) and out.dtype == np.uint8
    with pytest.raises(NotImplementedError):
        riffusion_inpaint_image(bundle, img, mask,
                                cfg=InpaintConfig(steps=4, strength=0.5))


def test_load_riffusion_from_synthetic_checkpoint(tmp_path):
    """End-to-end loader: write a tiny checkpoint in the diffusers disk
    layout (real safetensors files) and load it back through
    load_riffusion; trees must round-trip exactly."""
    from safetensors.numpy import save_file

    from audio_inpainting_tpu.models.sd import load_riffusion

    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vcfg)
    up = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                   jnp.zeros((1,)),
                   jnp.zeros((1, 3, ucfg.cross_attention_dim)))["params"]
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)),
                  jax.random.PRNGKey(2))["params"]
    for sub, params in (("unet", up), ("vae", vp)):
        d = tmp_path / sub
        d.mkdir()
        sd = {k: np.ascontiguousarray(v)
              for k, v in flax_to_torch_state(params).items()}
        save_file(sd, str(d / "diffusion_pytorch_model.safetensors"))
    bundle = load_riffusion(str(tmp_path), ucfg, vcfg, load_text=False)
    for ref, got in ((up, bundle["unet_params"]), (vp, bundle["vae_params"])):
        for a, b in zip(jax.tree_util.tree_leaves(ref),
                        jax.tree_util.tree_leaves(got)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(FileNotFoundError):
        load_riffusion(str(tmp_path / "missing"), ucfg, vcfg,
                       load_text=False)


def test_denoise_loop_masked_latent_end_composite():
    """The masked-latent schedule's endpoint contract
    (main_diffusion_gap.py:61-67 semantics via diffusers' legacy 4-channel
    path): after the final PLMS step the region OUTSIDE the hole is snapped
    to the CLEAN image latents exactly — inpainting may only write inside
    the mask."""
    from audio_inpainting_tpu.models.sd.pipeline import _denoise_loop

    ucfg = UNetConfig.tiny()
    cfg = InpaintConfig(steps=3, unet=ucfg, vae=VAEConfig.tiny())
    h = w = 8
    unet = UNet2DCondition(ucfg)
    up = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, h, w, 4)),
                   jnp.zeros((1,)),
                   jnp.zeros((1, 7, ucfg.cross_attention_dim)))["params"]
    rng = np.random.default_rng(11)
    init = jnp.asarray(rng.normal(size=(1, h, w, 4)), jnp.float32)
    hole = np.zeros((1, h, w, 1), np.float32)
    hole[:, :, 3:6, :] = 1.0
    ctx = jnp.asarray(rng.normal(size=(2, 7, ucfg.cross_attention_dim)),
                      jnp.float32)
    out = _denoise_loop(up, init, jnp.asarray(hole), ctx,
                        jax.random.PRNGKey(2), cfg)
    out = np.asarray(out)
    keep = hole[0, :, :, 0] == 0
    np.testing.assert_array_equal(out[0][keep], np.asarray(init)[0][keep])
    inside = out[0][~keep]
    assert np.isfinite(inside).all()
    assert np.abs(inside - np.asarray(init)[0][~keep]).max() > 1e-6


def _write_tiny_sd_layout(root, ucfg, vcfg, with_text: bool):
    """Write a complete diffusers directory layout (unet/ vae/ safetensors,
    plus text_encoder/ + tokenizer/ when with_text) from randomly
    initialized models. Returns (unet_params, vae_params)."""
    import os

    from safetensors.numpy import save_file

    unet = UNet2DCondition(ucfg)
    vae = AutoencoderKL(vcfg)
    up = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
                   jnp.zeros((1,)),
                   jnp.zeros((1, 3, ucfg.cross_attention_dim)))["params"]
    vp = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, 3)),
                  jax.random.PRNGKey(2))["params"]
    for sub, params in (("unet", up), ("vae", vp)):
        d = root / sub
        d.mkdir()
        sd = {k: np.ascontiguousarray(v)
              for k, v in flax_to_torch_state(params).items()}
        save_file(sd, str(d / "diffusion_pytorch_model.safetensors"))
    if with_text:
        from transformers import (CLIPTextConfig, CLIPTextModel,
                                  CLIPTokenizer)

        # a real (torch) CLIP text encoder at tiny scale, saved in the
        # checkpoint layout load_riffusion reads (from_pt=True)
        vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
        for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz ,"):
            tok = (ch if ch != " " else "Ġ")
            vocab[tok] = len(vocab)
            vocab[ch + "</w>"] = len(vocab)
        cfg = CLIPTextConfig(
            vocab_size=len(vocab), hidden_size=ucfg.cross_attention_dim,
            intermediate_size=2 * ucfg.cross_attention_dim,
            num_hidden_layers=2, num_attention_heads=2,
            max_position_embeddings=77)
        CLIPTextModel(cfg).save_pretrained(str(root / "text_encoder"))
        tdir = root / "tokenizer"
        tdir.mkdir()
        import json

        with open(tdir / "vocab.json", "w") as f:
            json.dump(vocab, f)
        with open(tdir / "merges.txt", "w") as f:
            f.write("#version: 0.2\n")
        tok = CLIPTokenizer(str(tdir / "vocab.json"),
                            str(tdir / "merges.txt"), model_max_length=77)
        tok.save_pretrained(str(tdir))
    return up, vp


def test_load_riffusion_full_layout_with_text(tmp_path):
    """load_text=True: the COMPLETE diffusers layout — unet + vae +
    text_encoder + tokenizer — loads, and encode_prompt produces the
    (2, 77, ctx_dim) [uncond; cond] context from the loaded CLIP
    (VERDICT r4 #4b: this leg had never executed)."""
    from audio_inpainting_tpu.models.sd import load_riffusion
    from audio_inpainting_tpu.models.sd.pipeline import encode_prompt

    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    up, vp = _write_tiny_sd_layout(tmp_path, ucfg, vcfg, with_text=True)
    bundle = load_riffusion(str(tmp_path), ucfg, vcfg, load_text=True)
    assert bundle["text_encoder"] is not None
    assert bundle["tokenizer"] is not None
    assert bundle["tokenizer"].model_max_length == 77
    ctx = encode_prompt(bundle["tokenizer"], bundle["text_encoder"],
                        "ambient sound")
    assert ctx.shape == (2, 77, ucfg.cross_attention_dim)
    assert np.isfinite(ctx).all()
    # the prompt row must differ from the unconditional row
    assert np.abs(ctx[0] - ctx[1]).max() > 1e-6
    # weights really round-tripped
    for a, b in zip(jax.tree_util.tree_leaves(up),
                    jax.tree_util.tree_leaves(bundle["unet_params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_riffusion_restore_audio_end_to_end_tiny(tmp_path):
    """Audio in -> audio out through the FULL riffusion path (codec ->
    SD masked-latent inpaint -> Griffin-Lim -> energy calibration ->
    time-domain composite) at tiny configs (VERDICT r4 #4c: this
    composition had never run). Pins the contract a real checkpoint
    will hit: same length out, finite, clean region composited back
    bit-near, hole region rewritten."""
    from audio_inpainting_tpu.methods.diffusion import (
        mask_from_image, riffusion_restore_audio, wav_to_logspec,
        logspec_to_image)
    from audio_inpainting_tpu.models.sd import load_riffusion

    ucfg, vcfg = UNetConfig.tiny(), VAEConfig.tiny()
    _write_tiny_sd_layout(tmp_path, ucfg, vcfg, with_text=True)
    bundle = load_riffusion(str(tmp_path), ucfg, vcfg, load_text=True)

    sr = 8000
    rng = np.random.default_rng(5)
    t = np.arange(sr)
    # broadband content: every clean spectrogram column must sit well above
    # the log floor, or the near-black damage scan reads the whole image as
    # one hole (pure tones leave 1021/1025 bins at the floor)
    x = (0.3 * rng.standard_normal(sr)
         + 0.5 * np.sin(2 * np.pi * 300 * t / sr)).astype(np.float32)
    # the hole must EXCEED n_fft=2048: the composite replaces only fully-
    # damaged spectrogram columns, and a frame window is only 100% silent
    # when it sits entirely inside the hole
    gs, ge = 2500, 5500
    dmg = x.copy()
    dmg[gs:ge] = 0.0
    out = riffusion_restore_audio(dmg, sr, bundle=bundle, steps=3,
                                  image_size=32)
    assert out.shape == dmg.shape and out.dtype == np.float32
    assert np.isfinite(out).all()
    # the time-domain composite keeps clean audio outside the hole columns'
    # 1024-sample crossfades exactly (columns are hop=512 wide)
    np.testing.assert_allclose(out[: gs - 2048], dmg[: gs - 2048], atol=1e-6)
    np.testing.assert_allclose(out[ge + 2048:], dmg[ge + 2048:], atol=1e-6)
    # the fully-damaged columns' center was written (not left silent)
    assert np.abs(out[3700:4700]).max() > 1e-4
