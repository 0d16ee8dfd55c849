"""Self-supervised per-clip neural inpainting: U-Net and GAN training loops.

Reference behavior (SURVEY.md §2/§3):

- U-Net, random mask (main5_UNet_mask.py:158-193): Adam lr=1e-3, MSE on the
  masked region ONLY, 400 epochs over the single clip's normalized magnitude;
  composite output ``input + pred*(1-mask)``, iSTFT with original phase.
- U-Net, deterministic gap (main5_UNet_gap.py:133-168): loss over the WHOLE
  spectrogram (overfit demonstration), 600 epochs, same composite.
- GAN (main_gan_gap.py:117-158): D with BCE on [real | composited fake
  (detached)], G loss = 0.99*L1(masked) + 0.01*adv(BCE on composited),
  Adam lr=2e-4 betas=(0.5, 0.999), 1500 epochs; min-max [-1,1] normalized
  magnitudes; trains against the ground-truth clip's spectrogram.

TPU-native design: each epoch is a jitted train step; the whole budget runs
as ``lax.scan`` over epochs inside ONE device program (donated carry), so
400-1500 epochs execute without host round-trips. Padding to multiples of 4
keeps all conv shapes static; the U-Net/Generator run in the W-packed
lane layout of models/packed_unet.py (full 128-lane occupancy at C=16,
no conv<->matmul relayout copies inside blocks), so T pads to 32.
"""

from __future__ import annotations

import functools
import warnings
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from ..models.packed_unet import PackedGeneratorUNet, PackedSimpleUNet
from ..models.unet import BN_MOMENTUM, Discriminator
from ..ops import flatopt


@dataclass(frozen=True)
class UNetTrainConfig:
    epochs: int = 400
    lr: float = 1e-3
    masked_loss: bool = True   # True: MSE on masked region only (mask variant)
    scan_chunk: int = 100      # epochs per device program (axon watchdog)
    bf16: bool = False         # bf16 conv compute (params/loss stay f32)
    # Run Adam on ONE concatenated f32 vector instead of optax's per-leaf
    # tree map (ops/flatopt.py): bitwise-identical math, ~4 fused HLOs per
    # step instead of ~4 per parameter leaf. optax state format is kept at
    # the chunk boundary.
    flat_opt: bool = True


@dataclass(frozen=True)
class GANTrainConfig:
    epochs: int = 1500
    lr: float = 2e-4
    b1: float = 0.5
    b2: float = 0.999
    l1_weight: float = 0.99
    adv_weight: float = 0.01
    scan_chunk: int = 100
    bf16: bool = False         # bf16 conv compute (params/loss stay f32)
    # lane-packed Discriminator (same param tree as the standard class).
    # Measured v5e GAN epoch (tools/gan_epoch_time.py): 19.2 ms with the
    # unpacked D (C=1 input lanes 1/128 occupied + relayouts) vs 12.7 ms
    # packed — the round-2 "packed D slower" note predates the packed
    # ConvTranspose landing and is obsolete.
    packed_d: bool = True
    # (Two other readout policies were measured and removed — see
    # docs/DESIGN.md "GAN readout policy": avg_tail output-averaging over
    # late chunk-boundary snapshots blurs the fill (global SNR fell up to
    # 5 dB), and best_tail argmin-hole-L1 snapshot selection is the
    # identity — its selection metric IS the training objective, which
    # decreases monotonically, so the final snapshot always wins.)
    # Retrain once with a folded key if the hole-L1 of the composite vs the
    # real spectrogram (a training input, main_gan_gap.py:125) exceeds this —
    # the measured signature of mode collapse (healthy draws <= 0.031,
    # collapsed >= 0.040 in norm units across every 5-seed sweep). 0 = off.
    retry_l1: float = 0.0
    # Weight-space EMA of the GENERATOR params: ema <- d*ema + (1-d)*params
    # after every G update, zero-initialized with Adam-style bias correction
    # (ema / (1 - d^T)) at readout — seeding the EMA from the random init
    # instead leaves d^T of init noise in the weights (0.22 at d=0.999,
    # T=1500), which is the bug signature of the first, rejected EMA
    # measurement (hole-L1 0.14-1.9). The training trajectory itself is
    # untouched (reference-exact update sequence); only the final inference
    # reads the averaged weights, with the final running BN stats.
    # 0 = off (reference-exact single final inference).
    ema_decay: float = 0.0
    # Where the EMA readout replaces the single-inference fill:
    #   "full" — everywhere (one eval forward with EMA weights);
    #   "gap"  — only in fully-dark columns (per-column keep fraction < 2%),
    #            i.e. the contiguous hole, where no within-column context
    #            exists and fill variance dominates: measured, EMA improves
    #            gap-local SNR on EVERY healthy seed, while on the scattered
    #            dark pixels elsewhere (92% of the mask but with live
    #            neighbors) the sharper single-inference fill preserves
    #            global SNR/LSD. Costs one extra eval forward (~1 epoch).
    ema_scope: str = "full"
    # Flat-vector Adam (see UNetTrainConfig.flat_opt).
    flat_opt: bool = True
    # Batch the D step's two forwards (real, composited fake) into ONE
    # vmapped pass. Math-identical to the reference's separate netD calls —
    # vmap keeps BatchNorm's per-input (N=1) batch statistics, and the
    # running averages are merged to the exact sequential-update value —
    # while XLA sees one conv per D layer at batch 2 instead of two at
    # batch 1. (The earlier rejection of "batching D(real)+D(fake)" was
    # about a naive N=2 concat, whose BN stats mix the pair; vmap doesn't.)
    # MEASURED AND REJECTED as the default on v5e (tools/gan_epoch_time.py,
    # band/packed/flat config): 13.81 ms/epoch vs 12.53 sequential — the
    # batch-2 packed convs don't reach 2x the batch-1 rate at these shapes,
    # and the stack/slice + stats-merge ops eat the op-count saving. Kept as
    # an option with step-level equivalence pinned (tests/test_neural.py).
    vmap_d: bool = False


def _d_model(cfg):
    if getattr(cfg, "packed_d", False):
        from ..models.packed_unet import PackedDiscriminator

        return PackedDiscriminator(dtype=_dtype(cfg))
    return Discriminator(dtype=_dtype(cfg))


def _dtype(cfg) -> jnp.dtype:
    return jnp.bfloat16 if cfg.bf16 else jnp.float32


def _nhwc(x2d: jax.Array) -> jax.Array:
    return x2d[None, :, :, None]


# Initialization and eval forwards run as ONE compiled program each. flax
# 0.12 does not jit Module.init — eagerly it dispatches every op of the
# model forward individually, which over the axon tunnel's per-dispatch
# latency costs whole seconds per training run (the round-2 GAN's 33 s wall
# vs ~19 s device time). Module instances are frozen dataclasses, so they
# are valid static arguments and the jit cache persists across calls.
@functools.partial(jax.jit, static_argnums=(0,))
def _jit_init(model, key, inp):
    return model.init(key, inp)


@functools.partial(jax.jit, static_argnums=(0,))
def _jit_init_train(model, key, inp):
    return model.init(key, inp, True)


@functools.partial(jax.jit, static_argnums=(0,))
def _jit_apply(model, params, inp):
    return model.apply({"params": params}, inp)


@functools.partial(jax.jit, static_argnums=(0,))
def _jit_apply_eval(model, params, batch_stats, inp):
    return model.apply({"params": params, "batch_stats": batch_stats},
                       inp, False)


@jax.jit
def _jit_adam_init(params):
    # optax.adam state is lr-independent (zero moments + step count), so one
    # compiled program serves every config.
    return optax.adam(1.0).init(params)


def _pad4(x2d: jax.Array, value: float = 0.0) -> tuple[jax.Array, tuple[int, int]]:
    # F to a multiple of 4 (two pools), T to a multiple of 32 (two pools x
    # the 8-wide lane packing of models.packed_unet)
    f, t = x2d.shape
    pf, pt = (-f) % 4, (-t) % 32
    return jnp.pad(x2d, ((0, pf), (0, pt)), constant_values=value), (f, t)


def _valid4(f: int, t: int) -> jax.Array:
    """1 over the original (f, t) extent, 0 over the pad-to-4 margin.

    Losses are summed over this and divided by f*t so the pad rows/cols
    neither enter the loss nor inflate the mean's denominator (the
    reference's losses are means over the unpadded spectrogram)."""
    pad = jnp.zeros(((-f) % 4 + f, (-t) % 32 + t), jnp.float32)
    return pad.at[:f, :t].set(1.0)


# ---------------------------------------------------------------- U-Net ----


def _unet_scan_core(params, opt_state, inp, tgt, mask, valid,
                    cfg: UNetTrainConfig, n_epochs: int):
    """The U-Net per-clip training scan; call under jit (or lax.map — the
    batched serving mode reuses this exact core per clip)."""
    model = PackedSimpleUNet(dtype=_dtype(cfg))
    tx = optax.adam(cfg.lr)
    inv = (1.0 - mask) * valid
    # a window whose every column is damaged has sum(valid) == 0 (reachable
    # via explicit gaps covering the whole clip): the loss degrades to 0
    # with zero gradients instead of 0/0 NaN params poisoning the composite
    denom = jnp.maximum(jnp.sum(valid), 1.0)

    def loss_fn(p):
        out = model.apply({"params": p}, inp)
        if cfg.masked_loss:
            return jnp.sum((out * inv - tgt * inv) ** 2) / denom
        return jnp.sum(((out - tgt) * valid) ** 2) / denom

    if cfg.flat_opt:
        spec = flatopt.make_spec(params)

        def epoch_flat(carry, _):
            pf, fs = carry
            loss, g = jax.value_and_grad(loss_fn)(flatopt.from_flat(pf, spec))
            pf, fs = flatopt.adam_step(pf, flatopt.to_flat(g), fs, cfg.lr)
            return (pf, fs), loss

        carry0 = (flatopt.to_flat(params),
                  flatopt.optax_to_flat(opt_state, spec))
        (pf, fs), losses = jax.lax.scan(epoch_flat, carry0, None,
                                        length=n_epochs)
        return (flatopt.from_flat(pf, spec),
                flatopt.flat_to_optax(fs, spec, opt_state), losses)

    def epoch(carry, _):
        p, st = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        upd, st = tx.update(g, st, p)
        return (optax.apply_updates(p, upd), st), loss

    (params, opt_state), losses = jax.lax.scan(
        epoch, (params, opt_state), None, length=n_epochs)
    return params, opt_state, losses


@functools.partial(jax.jit, static_argnames=("cfg", "n_epochs"),
                   donate_argnums=(0, 1))
def _unet_train_chunk(params, opt_state, inp, tgt, mask, valid,
                      cfg: UNetTrainConfig, n_epochs: int):
    return _unet_scan_core(params, opt_state, inp, tgt, mask, valid, cfg,
                           n_epochs)


def unet_train_restore(mag_norm, mask, cfg: UNetTrainConfig = UNetTrainConfig(),
                       key: jax.Array | int = 0, valid=None,
                       composite_mask=None):
    """Train SimpleUNet on one clip's normalized magnitude and composite.

    mag_norm, mask: (F, T); mask 1 = kept. Returns (final_mag_norm (F, T),
    prediction (F, T), loss history).

    valid (optional (F, T), 1 = real content): cells whose target may enter
    the loss, multiplied into the pad-extent mask. For BLIND damage the
    caller passes the detected-keep mask here — the real holes have no
    target (their cells ARE the damage), so they must stay out of the loss
    while synthetic training stripes (in ``mask``) carry the learning
    signal. composite_mask (optional (F, T)): the mask for the final
    input + pred*(1-mask) composite when it differs from the TRAINING
    mask — same contract as parallel/batch.restore_clips_unet.
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    mag_norm = jnp.asarray(mag_norm, jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    tgt2d, (f0, t0) = _pad4(mag_norm)
    msk2d, _ = _pad4(mask, value=1.0)  # pad = kept, excluded from masked loss
    inp = _nhwc(tgt2d * msk2d)
    tgt = _nhwc(tgt2d)
    msk = _nhwc(msk2d)
    vld2d = _valid4(f0, t0)
    if valid is not None:
        vld2d = vld2d * _pad4(jnp.asarray(valid, jnp.float32))[0]
    vld = _nhwc(vld2d)

    model = PackedSimpleUNet(dtype=_dtype(cfg))
    params = _jit_init(model, key, inp)["params"]
    opt_state = _jit_adam_init(params)

    losses = []
    done = 0
    while done < cfg.epochs:
        n = min(cfg.scan_chunk, cfg.epochs - done)
        params, opt_state, ls = _unet_train_chunk(
            params, opt_state, inp, tgt, msk, vld, cfg, n)
        losses.append(ls)
        done += n

    cmsk2d = (msk2d if composite_mask is None
              else _pad4(jnp.asarray(composite_mask, jnp.float32),
                         value=1.0)[0])
    # eval on the composite-masked input: only REAL damage hidden, synthetic
    # training stripes visible again as context (matches the batched
    # serving path, parallel/batch.restore_clips_unet)
    eval_inp = inp if composite_mask is None else _nhwc(tgt2d * cmsk2d)
    pred = _jit_apply(model, params, eval_inp)[0, :, :, 0]
    input_mag = tgt2d * cmsk2d
    final = input_mag + pred * (1.0 - cmsk2d)      # composite (reference :182)
    return final[:f0, :t0], pred[:f0, :t0], jnp.concatenate(losses)


# ------------------------------------------------------------------ GAN ----


def _gan_scan_core(train_state, inp, real, mask, valid, cfg: GANTrainConfig,
                   n_epochs: int):
    g_model = PackedGeneratorUNet(dtype=_dtype(cfg))
    d_model = _d_model(cfg)
    tx = optax.adam(cfg.lr, b1=cfg.b1, b2=cfg.b2)
    inv = 1.0 - mask
    rec_inv = inv * valid        # L1 only over the unpadded extent
    rec_denom = jnp.sum(valid)

    flat = cfg.flat_opt
    ema = cfg.ema_decay > 0.0
    if flat:
        gp0, gbs0, gst0, dp0, dbs0, dst0 = train_state[:6]
        g_spec, d_spec = flatopt.make_spec(gp0), flatopt.make_spec(dp0)
        train_state = (flatopt.to_flat(gp0), gbs0,
                       flatopt.optax_to_flat(gst0, g_spec),
                       flatopt.to_flat(dp0), dbs0,
                       flatopt.optax_to_flat(dst0, d_spec)) + (
            (flatopt.to_flat(train_state[6]),) if ema else ())

    def opt_update(grad, st, p_carry):
        """One Adam step; flat (fused) or optax per-leaf, same math."""
        if flat:
            return flatopt.adam_step(p_carry, flatopt.to_flat(grad), st,
                                     cfg.lr, cfg.b1, cfg.b2)
        upd, st = tx.update(grad, st, p_carry)
        return optax.apply_updates(p_carry, upd), st

    # The PatchGAN map is EMPTY for clips under ~32x32 padded cells (three
    # stride-2 convs then a 4x4 VALID head): jnp.mean over it is NaN with
    # zero gradient — training silently proceeds on the L1 term alone while
    # the reported losses are NaN. Make that contract explicit instead:
    # adversarial term = 0.0 exactly (the same gradients), finite losses.
    # Production spectrograms (F=513 from the 1024-point STFT) never hit it.
    d_map = jax.eval_shape(
        lambda x: d_model.init_with_output(jax.random.PRNGKey(0), x, True)[0],
        jax.ShapeDtypeStruct(inp.shape, jnp.float32))
    if d_map.size == 0:
        warnings.warn(
            f"clip {inp.shape[1]}x{inp.shape[2]} is too small for the "
            f"PatchGAN discriminator (logits map {d_map.shape} is empty); "
            "the adversarial term is 0 and the generator trains on the L1 "
            "term only", stacklevel=2)

    # BCE from logits (the Discriminator returns logits): identical value to
    # sigmoid+BCE but saturation-stable — torch's BCELoss clamps logs at
    # -100 to survive this; the naive jnp formulation NaNs mid-training
    def bce(logits, t):
        if logits.size == 0:
            return jnp.float32(0.0)
        return jnp.mean(jnp.maximum(logits, 0.0) - logits * t
                        + jnp.log1p(jnp.exp(-jnp.abs(logits))))

    def epoch(carry, _):
        gpc, gbs, gst, dpc, dbs, dst = carry[:6]
        gp = flatopt.from_flat(gpc, g_spec) if flat else gpc
        dp = flatopt.from_flat(dpc, d_spec) if flat else dpc

        # ONE generator forward per epoch, like the reference
        # (main_gan_gap.py:130 computes `fake` once; both the D step and the
        # G step reuse it). jax.vjp keeps the residuals so the G backward
        # below pulls gradients through this same forward.
        def g_apply(gpar):
            fake, upd = g_model.apply(
                {"params": gpar, "batch_stats": gbs}, inp, True,
                mutable=["batch_stats"])
            return fake, upd["batch_stats"]

        (fake, gbs_new), g_vjp = jax.vjp(g_apply, gp)
        completed = inp * mask + fake * inv

        # --- D step on [real | composited fake (detached)] ---
        def d_loss_fn(dpar, dbs_in):
            if cfg.vmap_d:
                # ONE batched D pass over the stacked pair via vmap. BatchNorm
                # inside the vmap still normalizes each input with its OWN
                # batch stats (each slice is N=1) — the same math as the
                # reference's two separate netD calls (main_gan_gap.py:
                # 131-137) — but XLA sees one conv per layer at double batch
                # instead of two N=1 convs, halving the D-step op count.
                pair = jnp.stack([real, jax.lax.stop_gradient(completed)])

                def one(x):
                    out, upd = d_model.apply(
                        {"params": dpar, "batch_stats": dbs_in}, x, True,
                        mutable=["batch_stats"])
                    return out, upd["batch_stats"]

                outs, upds = jax.vmap(one)(pair)
                out_real, out_fake = outs[0], outs[1]
                # Training outputs never read the running averages (train
                # mode normalizes with batch stats), but carry the exact
                # sequential-update value anyway: with u_i = m*r0 + (1-m)*s_i
                # both computed from dbs_in, the reference's real-then-fake
                # chaining is r2 = m*u_real + (1-m)*s_fake
                #            = u_fake + m*(u_real - r0),  m = BN_MOMENTUM.
                dbs_out = jax.tree_util.tree_map(
                    lambda u, r0: u[1] + BN_MOMENTUM * (u[0] - r0),
                    upds, dbs_in)
            else:
                out_real, upd1 = d_model.apply(
                    {"params": dpar, "batch_stats": dbs_in}, real, True,
                    mutable=["batch_stats"])
                out_fake, upd2 = d_model.apply(
                    {"params": dpar, "batch_stats": upd1["batch_stats"]},
                    jax.lax.stop_gradient(completed), True,
                    mutable=["batch_stats"])
                dbs_out = upd2["batch_stats"]
            loss = 0.5 * (bce(out_real, jnp.ones_like(out_real))
                          + bce(out_fake, jnp.zeros_like(out_fake)))
            return loss, dbs_out

        (d_loss, dbs_mid), d_grad = jax.value_and_grad(
            d_loss_fn, has_aux=True)(dp, dbs)
        dpc, dst = opt_update(d_grad, dst, dpc)
        dp = flatopt.from_flat(dpc, d_spec) if flat else dpc

        # --- G step: grad wrt `fake` through the UPDATED D (reference
        # order: optimizerD.step() precedes netD(completed) at :140),
        # pulled back through the stored G forward ---
        def g_downstream(fake_):
            completed_ = inp * mask + fake_ * inv
            out_fake_g, upd3 = d_model.apply(
                {"params": dp, "batch_stats": dbs_mid}, completed_, True,
                mutable=["batch_stats"])
            adv = bce(out_fake_g, jnp.ones_like(out_fake_g))
            rec = jnp.sum(jnp.abs(fake_ * rec_inv - real * rec_inv)) / rec_denom
            return (cfg.l1_weight * rec + cfg.adv_weight * adv,
                    upd3["batch_stats"])

        (g_loss, dbs_new), fake_grad = jax.value_and_grad(
            g_downstream, has_aux=True)(fake)
        (g_grad,) = g_vjp((fake_grad, jax.tree_util.tree_map(
            jnp.zeros_like, gbs_new)))
        gpc, gst = opt_update(g_grad, gst, gpc)

        out = (gpc, gbs_new, gst, dpc, dbs_new, dst)
        if ema:
            d_ = cfg.ema_decay
            if flat:
                out += (carry[6] * d_ + gpc * (1.0 - d_),)
            else:
                out += (jax.tree_util.tree_map(
                    lambda e, p: e * d_ + p * (1.0 - d_), carry[6], gpc),)
        return out, (d_loss, g_loss)

    carry, losses = jax.lax.scan(epoch, train_state, None, length=n_epochs)
    if flat:
        gpc, gbs, gst, dpc, dbs, dst = carry[:6]
        carry = (flatopt.from_flat(gpc, g_spec), gbs,
                 flatopt.flat_to_optax(gst, g_spec, gst0),
                 flatopt.from_flat(dpc, d_spec), dbs,
                 flatopt.flat_to_optax(dst, d_spec, dst0)) + (
            (flatopt.from_flat(carry[6], g_spec),) if ema else ())
    return carry, losses


@functools.partial(jax.jit, static_argnames=("cfg", "n_epochs"),
                   donate_argnums=(0,))
def _gan_train_chunk(train_state, inp, real, mask, valid, cfg: GANTrainConfig,
                     n_epochs: int):
    return _gan_scan_core(train_state, inp, real, mask, valid, cfg, n_epochs)




def gan_readout_fake(eval_fn, state, msk, vld, cfg: GANTrainConfig):
    """The GAN readout contract, shared by the single-clip path, the batched
    serving path (parallel/gan_batch.py) and the probe tools so the three
    can never drift (their equivalence is also pinned by tests).

    ``eval_fn(params, batch_stats) -> fake``; msk/vld are NHWC (1, F, T, 1).
    ema_decay=0 is one eval-mode forward of the final params (reference
    main_gan_gap.py:150-153). ema_decay>0 reads out the bias-corrected
    weight-space EMA (zero-init accumulator, so ema / (1 - d^T) removes the
    init term exactly); ema_scope="gap" takes the EMA fill only in
    fully-dark columns and the single-inference fill elsewhere
    (docs/DESIGN.md "GAN readout policy" has the 5-seed measurements).
    """
    if cfg.ema_decay <= 0.0:
        return eval_fn(state[0], state[1])
    corr = 1.0 - cfg.ema_decay ** cfg.epochs
    ema_p = jax.tree_util.tree_map(lambda e: e / corr, state[6])
    fake = eval_fn(ema_p, state[1])
    if cfg.ema_scope == "gap":
        fake_one = eval_fn(state[0], state[1])
        hole_col = jnp.sum((1.0 - msk) * vld, axis=1, keepdims=True)
        vld_col = jnp.sum(vld, axis=1, keepdims=True)
        gap_col = (hole_col > 0.98 * jnp.maximum(vld_col, 1.0))
        fake = jnp.where(gap_col, fake, fake_one)
    return fake


def gan_train_restore(input_norm, real_norm, mask,
                      cfg: GANTrainConfig = GANTrainConfig(),
                      key: jax.Array | int = 0):
    """Train the GAN pair on one clip and return the composited magnitude.

    input_norm, real_norm in [-1, 1]; mask 1 = kept (all (F, T)).
    Returns (final_norm (F, T), (d_losses, g_losses)).
    """
    if isinstance(key, int):
        key = jax.random.PRNGKey(key)
    # pad with -1.0: in the GAN's min-max [-1, 1] space silence IS -1, and a
    # 0.0 pad reads as a bright band that pollutes the generator's top
    # frequency rows (measured: rel mag error ~1.0 in rows 507-512, the
    # dominant term of the round-1 -6 dB global SNR; tools/gan_diag.py)
    inp2d, (f0, t0) = _pad4(jnp.asarray(input_norm, jnp.float32), value=-1.0)
    real2d, _ = _pad4(jnp.asarray(real_norm, jnp.float32), value=-1.0)
    msk2d, _ = _pad4(jnp.asarray(mask, jnp.float32), value=1.0)  # pad = kept
    inp, real, msk = _nhwc(inp2d), _nhwc(real2d), _nhwc(msk2d)
    vld = _nhwc(_valid4(f0, t0))

    g_model = PackedGeneratorUNet(dtype=_dtype(cfg))
    d_model = _d_model(cfg)

    def eval_fake(gp, gbs):
        return _jit_apply_eval(g_model, gp, gbs, inp)

    def train_once(k):
        kg, kd = jax.random.split(k)
        g_vars = _jit_init_train(g_model, kg, inp)
        d_vars = _jit_init_train(d_model, kd, inp)
        state = (g_vars["params"], g_vars["batch_stats"],
                 _jit_adam_init(g_vars["params"]), d_vars["params"],
                 d_vars["batch_stats"], _jit_adam_init(d_vars["params"]))
        if cfg.ema_decay > 0.0:
            # zero-init: the bias correction at readout removes the init
            # term exactly (see ema_decay docstring for why not params-init)
            state += (jax.tree_util.tree_map(jnp.zeros_like,
                                             g_vars["params"]),)
        d_hist, g_hist = [], []
        done = 0
        while done < cfg.epochs:
            n = min(cfg.scan_chunk, cfg.epochs - done)
            state, (dl, gl) = _gan_train_chunk(state, inp, real, msk, vld,
                                               cfg, n)
            d_hist.append(dl)
            g_hist.append(gl)
            done += n
        # final inference in eval mode (running stats), reference :150-153
        fake = gan_readout_fake(eval_fake, state, msk, vld, cfg)
        final = inp * msk + fake * (1.0 - msk)
        return final, (jnp.concatenate(d_hist), jnp.concatenate(g_hist))

    final, hist = train_once(key)
    if cfg.retry_l1 > 0.0:
        hole = (1.0 - msk) * vld     # computed (and synced) only when gated
        hole_sum = float(jnp.sum(hole))
        # no hole (mask all-kept): nothing was filled, nothing to judge
        l1 = (float(jnp.sum(jnp.abs((final - real) * hole))) / hole_sum
              if hole_sum > 0.0 else 0.0)
        if l1 > cfg.retry_l1:
            # measured mode-collapse signature; one retrain on a fresh draw
            final, hist = train_once(jax.random.fold_in(key, 1))
    return final[0, :f0, :t0, 0], hist
