"""Packed-activation convolution layer ops (TPU lane-occupancy design).

Motivation (device traces, tools/gan_diag.py round): with C=16..64 channels
in NHWC, the TPU lane dimension is 1/8 occupied, and every hop between
XLA's conv layouts and matmul layouts costs a full-tensor relayout copy —
~17 ms of the GAN's 48 ms epoch was `data formatting`. This module keeps
activations in a W-PACKED layout

    packed(x)[n, h, wb, j*C + c] = x[n, h, wb*B + j, c],  B = 8

i.e. shape (N, H, W/B, B*C) whose minor dimension fills all 128 lanes at
C=16. Everything a conv block needs — 3x3 conv, 1x1 conv, BatchNorm
statistics and application, LeakyReLU — is expressed directly on this
layout, so whole blocks run with ZERO relayouts; pack/unpack reshapes
happen only at pool/upsample boundaries.

The 3x3 conv is the banded-Toeplitz matmul of ops.fastconv.conv3x3_wpack
(K=(B+2)*Ci, N=B*Co), with a custom VJP: the input gradient is the same
packed conv with the flipped/transposed kernel, and the weight gradient is
three (B+2)*Ci x B*Co MXU matmuls (contraction over all N*H*Wb positions)
folded along the band — all full-lane shapes.

Requires W % B == 0 (callers pad the spectrogram width; silence padding is
handled by the model's existing pad/crop + valid-mask logic).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

B = 8


def pack(x: jax.Array) -> jax.Array:
    """(N, H, W, C) -> (N, H, W/B, B*C). W must divide by B."""
    n, h, w, c = x.shape
    assert w % B == 0, (w, B)
    return x.reshape(n, h, w // B, B * c)


def unpack(xp: jax.Array, c: int) -> jax.Array:
    """(N, H, Wb, B*C) -> (N, H, Wb*B, C)."""
    n, h, wb, bc = xp.shape
    assert bc == B * c, (bc, c)
    return xp.reshape(n, h, wb * B, c)


def _band_kernel(k: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (3, (B+2)*Ci, B*Co) banded Toeplitz blocks.

    Built by concatenating row-blocks (each a concat of k-taps and zeros)
    rather than scattering 24 dynamic-update-slices: the build runs every
    epoch inside the training scan and the concat form fuses better —
    measured 38.6 -> 30.9 s on the 1500-epoch GAN. (Applying the same
    concat trick to the 1x1/transpose/stride-2 kernel builds and the dk
    band fold was ALSO tried and measured slower, 33.7 s — those builds
    stay in scatter form.)"""
    _, _, ci, co = k.shape
    zero = jnp.zeros((3, ci, co), k.dtype)
    rows = []
    for p in range(B + 2):           # band row = input position p-1
        cells = [k[:, p - j] if 0 <= p - j < 3 else zero for j in range(B)]
        rows.append(jnp.concatenate(cells, axis=-1))
    return jnp.concatenate(rows, axis=1)


def _band_kernel_gather(k: jax.Array) -> jax.Array:
    """_band_kernel as ONE static gather instead of ~18 concats.

    Extend k with a zero tap at index 3, then index (3, 4, Ci, Co) with the
    precomputed (B+2, B) tap map tap[p, j] = p - j if in [0, 3) else 3 —
    a single gather HLO per build instead of a concat tree. Same values
    bitwise; candidate for the GAN epoch's op-count lever (the build runs
    every epoch inside the training scan, once per conv). Enable with
    AIT_BAND_GATHER=1 for the TPU A/B."""
    _, _, ci, co = k.shape
    ke = jnp.concatenate([k, jnp.zeros((3, 1, ci, co), k.dtype)], axis=1)
    p = jnp.arange(B + 2)[:, None]
    j = jnp.arange(B)[None, :]
    tap = jnp.where((p - j >= 0) & (p - j < 3), p - j, 3)   # (B+2, B)
    kb = ke[:, tap]                                         # (3,B+2,B,Ci,Co)
    return kb.transpose(0, 1, 3, 2, 4).reshape(3, (B + 2) * ci, B * co)


# The one-hot-einsum kernel-build forms (AIT_KBUILD_EINSUM) were measured
# and rejected twice (19.07 vs 12.53 ms/epoch on v5e — the one-hot dots pad
# their length-3/4 contraction dim to full MXU tiles; numbers in
# docs/DESIGN.md) and deleted in round 4 (VERDICT r3 #9). The surviving
# fallback per build is the single-gather form below (AIT_BAND_GATHER=1,
# 12.82 ms — within noise of the default, and the natural candidate if a
# future jaxlib changes how update-slice chains fuse).


def _band_kernel_auto(k: jax.Array) -> jax.Array:
    import os

    if os.environ.get("AIT_BAND_GATHER") == "1":
        return _band_kernel_gather(k)
    return _band_kernel(k)


def _gather_xb(xp: jax.Array, ci: int) -> jax.Array:
    """(N, H, Wb, B*Ci) -> (N, H+2, Wb, (B+2)*Ci): zero H pad + the
    neighbor blocks' boundary columns appended in the lane dimension."""
    xh = jnp.pad(xp, ((0, 0), (1, 1), (0, 0), (0, 0)))
    last = xh[:, :, :-1, (B - 1) * ci:]            # prev block's last column
    left = jnp.pad(last, ((0, 0), (0, 0), (1, 0), (0, 0)))
    first = xh[:, :, 1:, :ci]                      # next block's first column
    right = jnp.pad(first, ((0, 0), (0, 0), (0, 1), (0, 0)))
    return jnp.concatenate([left, xh, right], axis=-1)


def _conv_packed(xp, k):
    n, h, wb, bci = xp.shape
    ci = bci // B
    co = k.shape[3]
    xb = _gather_xb(xp, ci)
    kb = _band_kernel_auto(k.astype(xp.dtype))
    # lane order in xb is [left | core | right] = position index -1..B, so
    # the band kernel's row j*Ci starts at lane (j)*Ci of the core -> offset
    # by Ci for the left column: xb lanes (dw+j)*Ci line up with kb rows.
    y = jnp.zeros((n, h, wb, B * co), jnp.float32)
    for kh in range(3):
        y = y + jnp.einsum("nhwk,kc->nhwc", xb[:, kh:kh + h], kb[kh],
                           preferred_element_type=jnp.float32)
    return y.astype(xp.dtype)


@jax.custom_vjp
def conv3x3_packed(xp: jax.Array, k: jax.Array) -> jax.Array:
    """3x3 SAME conv on packed activations: (N,H,Wb,B*Ci) -> (N,H,Wb,B*Co).

    k: (3, 3, Ci, Co) float32. Mixed precision like fastconv: forward in
    xp's dtype, weight grad accumulated f32."""
    return _conv_packed(xp, k)


def _fwd(xp, k):
    return _conv_packed(xp, k), (xp, k)


def _bwd(res, g):
    xp, k = res
    kt = jnp.flip(k, (0, 1)).transpose(0, 1, 3, 2)
    dx = _conv_packed(g, kt).astype(xp.dtype)
    # weight grad: dkb[kh] = xb[:, kh:kh+h]^T @ g  (full-lane MXU matmuls),
    # then fold the band structure back to (3, 3, Ci, Co)
    n, h, wb, bci = xp.shape
    ci = bci // B
    co = g.shape[3] // B
    xb = _gather_xb(xp, ci)
    gf = g.reshape(-1, B * co)
    dk = jnp.zeros((3, 3, ci, co), jnp.float32)
    for kh in range(3):
        xf = xb[:, kh:kh + h].reshape(-1, (B + 2) * ci)
        dkb = jnp.dot(xf.T, gf, preferred_element_type=jnp.float32)
        for dw in range(3):
            blocks = [dkb[(j + dw) * ci:(j + dw + 1) * ci,
                          j * co:(j + 1) * co] for j in range(B)]
            dk = dk.at[kh, dw].add(sum(blocks))
    return dx, dk.astype(k.dtype)


conv3x3_packed.defvjp(_fwd, _bwd)


def conv3x3_packed2(xa: jax.Array, xb_: jax.Array, ka: jax.Array,
                    kb_: jax.Array) -> jax.Array:
    """Conv over the channel-concatenation of two packed inputs WITHOUT
    materializing the concat (packed concat would interleave lanes):
    conv(concat([a, b], C), k) == conv(a, k[:Ca]) + conv(b, k[Ca:])."""
    return conv3x3_packed(xa, ka) + conv3x3_packed(xb_, kb_).astype(xa.dtype)


def dense_band_kernel(k: jax.Array) -> jax.Array:
    """(3, 3, Ci, Co) -> (3, 3, B*Ci, B*Co): the band conv as a PLAIN conv
    kernel on the packed layout.

    Treat the packed tensor (N, H, Wb, B*C) as an ordinary NHWC image whose
    W axis is the block index and whose channels are the B x C lane groups.
    Then the band conv IS a dense 3x3 conv whose kernel carries the band
    structure as zeros: within-column taps at dcol=1 (j' = j+dw-1), the
    previous column's last position feeding j=0 (dcol=0, tap dw=0), and the
    next column's first position feeding j=B-1 (dcol=2, tap dw=2).

    Why: lanes are 100% occupied (B*C >= 128), XLA's native TPU conv reads
    x once and fuses the surrounding elementwise work — unlike the explicit
    band-matmul path whose HBM gather dominates, and unlike the rejected
    Pallas kernels whose opaque custom calls broke XLA fusion (A/B record
    in docs/DESIGN.md). The structural zeros cost extra MXU flops (6.4x at C=16), which
    is free in an HBM-bound regime. Autodiff flows through the kernel build
    (dk = the B-occurrence sums), so no custom VJP is needed.
    """
    _, _, ci, co = k.shape
    kd = jnp.zeros((3, 3, B * ci, B * co), k.dtype)
    for j in range(B):
        for dw in range(3):
            jp = j + dw - 1
            if 0 <= jp < B:
                kd = kd.at[:, 1, jp * ci:(jp + 1) * ci,
                           j * co:(j + 1) * co].set(k[:, dw])
    kd = kd.at[:, 0, (B - 1) * ci:, :co].set(k[:, 0])
    kd = kd.at[:, 2, :ci, (B - 1) * co:].set(k[:, 2])
    return kd


def conv3x3_packed_dense(xp: jax.Array, k: jax.Array) -> jax.Array:
    """conv3x3_packed expressed as one plain XLA conv (see dense_band_kernel).

    Same numerics: TPU convs accumulate f32 on the MXU regardless of the
    bf16 operand dtype, matching the band path's preferred_element_type."""
    kd = dense_band_kernel(k).astype(xp.dtype)
    return jax.lax.conv_general_dilated(
        xp, kd, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dense_transpose2x2_kernel(k: jax.Array) -> jax.Array:
    """(2, 2, Ci, Co) -> (2, 2, B*Ci, B*Co) dense twin of the packed
    ConvTranspose (kernel 2x2, stride 2).

    Output column 2w'+dcb, lane (j, co) comes from input column w', lane
    (u, ci) with tap k[dr, dc] where j = 2u + dc - dcb*B — the low half of
    the input lanes feeds the even output block, the high half the odd.
    lax.conv_transpose applies the kernel spatially flipped relative to
    this scatter view (same convention note as conv_transpose2x2_packed):
    the taps flip inside each lane block AND the (dr, dcb) placement flips
    — verified exact against conv_transpose2x2_packed / nn.ConvTranspose."""
    _, _, ci, co = k.shape
    kf = jnp.flip(k, (0, 1))
    kt = jnp.zeros((2, 2, B * ci, B * co), k.dtype)
    for dcb in range(2):
        for u in range(B):
            for dc in range(2):
                j = 2 * u + dc - dcb * B
                if 0 <= j < B:
                    kt = kt.at[:, dcb, u * ci:(u + 1) * ci,
                               j * co:(j + 1) * co].set(kf[:, dc])
    return jnp.flip(kt, (0, 1))


def conv_transpose2x2_packed_dense(xp: jax.Array, k: jax.Array) -> jax.Array:
    """conv_transpose2x2_packed as one plain XLA transposed conv."""
    kt = dense_transpose2x2_kernel(k).astype(xp.dtype)
    return jax.lax.conv_transpose(
        xp, kt, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dense_conv4x4s2_kernel(k: jax.Array) -> jax.Array:
    """(4, 4, Ci, Co) -> (4, 4, B*Ci, B*Co) dense twin of the packed
    stride-2 4x4 conv (the reference discriminator's op).

    Output block w'' reads global positions 2(B*w''+j)+dw-1 = in block
    2w''+q, lane r, where q*B + r = 2j + dw - 1; q in {-1..2} maps to the
    4-wide W' kernel extent (pad 1 each side, stride 2)."""
    _, _, ci, co = k.shape
    kd = jnp.zeros((4, 4, B * ci, B * co), k.dtype)
    for j in range(B):
        for dw in range(4):
            p = 2 * j + dw - 1
            q, r = p // B, p % B
            kd = kd.at[:, q + 1, r * ci:(r + 1) * ci,
                       j * co:(j + 1) * co].set(k[:, dw])
    return kd


def conv4x4s2_packed_dense(xp: jax.Array, k: jax.Array) -> jax.Array:
    """conv4x4s2_packed as one plain XLA stride-2 conv. Wb must be even."""
    kd = dense_conv4x4s2_kernel(k).astype(xp.dtype)
    return jax.lax.conv_general_dilated(
        xp, kd, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


# The Pallas band-conv kernels (ops/pallas/pconv.py) were measured and
# rejected in round 2 (GAN epoch 19.2 -> 39.1 ms: the opaque custom calls
# broke XLA's elementwise fusions around each conv and each pallas_call
# carried ~0.3 ms grid/DMA overhead at these shapes) and deleted in round 4
# (VERDICT r3 #9) after losing a second round of A/Bs; the numbers live in
# docs/DESIGN.md. The surviving per-op alternative is the dense-kernel twin
# below (AIT_PACKED_DENSE) — the one form with a measured isolated win
# (conv4x4s2 0.34 vs 0.61 ms) kept as a documented, switchable fallback.

# Per-op TPU dispatch between the band-matmul packed convs and their
# dense-kernel twins (one plain XLA conv with the band structure baked into
# a (kh,kw,B*Ci,B*Co) kernel). The dense form burns MXU FLOPs on structural
# zeros (3x3: 3B/(B+2) = 2.4x; 4x4s2: 4B/(2B+2) = 1.8x) but is a single
# fusable/SPMD-shardable HLO. Measured on v5e (tools/gan_epoch_time.py,
# GAN epoch device time): all-dense REGRESSED 19.2 -> 22.7 ms/epoch, so
# each op ships whichever form measured faster (set below); CPU always
# takes the band path (the oracle the tests pin).
# AIT_PACKED_DENSE overrides for A/Bs: "0" none, "1" all, or a comma list
# from {c3, t2, s2}.
_DENSE_DEFAULT = frozenset()


def _use_dense(op: str) -> bool:
    import os

    if jax.default_backend() != "tpu":
        return False
    env = os.environ.get("AIT_PACKED_DENSE")
    if env is None:
        return op in _DENSE_DEFAULT
    if env == "0":
        return False
    if env == "1":
        return True
    return op in env.split(",")


def conv3x3_packed_auto(xp: jax.Array, k: jax.Array) -> jax.Array:
    """Fastest packed conv per backend (see _use_dense)."""
    if _use_dense("c3"):
        return conv3x3_packed_dense(xp, k)
    return conv3x3_packed(xp, k)


def conv_transpose2x2_packed_auto(xp: jax.Array, k: jax.Array) -> jax.Array:
    if _use_dense("t2"):
        return conv_transpose2x2_packed_dense(xp, k)
    return conv_transpose2x2_packed(xp, k)


def conv4x4s2_packed_auto(xp: jax.Array, k: jax.Array) -> jax.Array:
    if _use_dense("s2"):
        return conv4x4s2_packed_dense(xp, k)
    return conv4x4s2_packed(xp, k)


def conv3x3_packed2_auto(xa: jax.Array, xb_: jax.Array, ka: jax.Array,
                         kb_: jax.Array) -> jax.Array:
    """conv3x3_packed2 with the same auto dispatch."""
    return (conv3x3_packed_auto(xa, ka)
            + conv3x3_packed_auto(xb_, kb_).astype(xa.dtype))


def conv1x1_packed(xp: jax.Array, k: jax.Array) -> jax.Array:
    """1x1 conv as one block-diagonal lane matmul. k: (Ci, Co)."""
    ci, co = k.shape
    kd = jnp.zeros((B * ci, B * co), k.dtype)
    for j in range(B):
        kd = kd.at[j * ci:(j + 1) * ci, j * co:(j + 1) * co].set(k)
    y = jnp.einsum("nhwk,kc->nhwc", xp, kd.astype(xp.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(xp.dtype)


def channel_stats_packed(xp: jax.Array, ci: int):
    """Per-channel mean/var over (N, H, W) of a packed tensor.

    Reduces to a (B*Ci,) vector first (full-lane reduction), then folds the
    B packing positions — the fold touches only a 1-D vector, so no tensor
    relayout happens."""
    x32 = xp.astype(jnp.float32)
    n = xp.shape[0] * xp.shape[1] * xp.shape[2] * B
    s1 = jnp.sum(x32, axis=(0, 1, 2)).reshape(B, ci).sum(0)
    s2 = jnp.sum(x32 * x32, axis=(0, 1, 2)).reshape(B, ci).sum(0)
    mean = s1 / n
    var = s2 / n - mean * mean
    return mean, var


def channel_affine_packed(xp: jax.Array, scale: jax.Array,
                          shift: jax.Array) -> jax.Array:
    """y = xp * tile(scale) + tile(shift); scale/shift are (Ci,)."""
    ci = scale.shape[0]
    sc = jnp.tile(scale, B).astype(xp.dtype)
    sh = jnp.tile(shift, B).astype(xp.dtype)
    return xp * sc[None, None, None, :] + sh[None, None, None, :]


def max_pool_2x2_packed(xp: jax.Array, ci: int) -> jax.Array:
    """2x2/stride-2 max pool: packed in, packed out (Wb halves).

    H-pool is a sublane-strided elementwise max; W-pool pairs adjacent
    packed columns, which in lane space is max(lane j, lane j+ci) of the
    (2ci)-strided groups — expressed as two strided lane gathers."""
    n, h, wb, bci = xp.shape
    hp = jnp.maximum(xp[:, 0::2], xp[:, 1::2])          # (n, h/2, wb, B*ci)
    # lanes [j*ci : (j+1)*ci] for even j vs odd j
    ev = hp.reshape(n, h // 2, wb, B // 2, 2, ci)[..., 0, :]
    od = hp.reshape(n, h // 2, wb, B // 2, 2, ci)[..., 1, :]
    wp = jnp.maximum(ev, od).reshape(n, h // 2, wb, (B // 2) * ci)
    # two half-filled blocks merge into one full block: (wb, B/2*ci) ->
    # (wb/2, B*ci) is a pure reshape in the (wb, lane) plane
    return wp.reshape(n, h // 2, wb // 2, B * ci)


def conv_transpose2x2_packed(xp: jax.Array, k: jax.Array) -> jax.Array:
    """ConvTranspose(kernel 2x2, stride 2, VALID) on packed activations.

    out[2r+dr, 2c+dc] = sum_i x[r, c, i] * k[dr, dc, i, o] — i.e. each input
    pixel emits a 2x2 output block. In packed lanes: output block 2m comes
    from input block m's first half-lanes, block 2m+1 from the second half,
    each via a (B/2*Ci, B*Co) matmul (dc interleaving baked into the
    kernel); rows double by an interleaving stack. k: (2, 2, Ci, Co),
    matching nn.ConvTranspose's kernel layout.
    """
    n, h, wb, bci = xp.shape
    ci = bci // B
    co = k.shape[3]
    # lax.conv_transpose (and therefore nn.ConvTranspose) applies the
    # kernel spatially FLIPPED relative to the scatter view used below:
    # out[2r+dr, 2c+dc] uses k[1-dr, 1-dc] (verified vs flax numerically)
    kd = jnp.flip(k, (0, 1)).astype(xp.dtype)
    # (B/2*Ci, B*Co) for one row tap dr: out lane (2u+dc)*Co+o <- in lane
    # u*Ci+i with weight k[dr, dc, i, o]
    kups = []
    for dr in range(2):
        ku = jnp.zeros((B // 2 * ci, B * co), kd.dtype)
        for u in range(B // 2):
            for dc in range(2):
                ku = ku.at[u * ci:(u + 1) * ci,
                           (2 * u + dc) * co:(2 * u + dc + 1) * co].set(
                               kd[dr, dc])
        kups.append(ku)
    lo, hi = xp[..., :B // 2 * ci], xp[..., B // 2 * ci:]
    rows = []
    for dr in range(2):
        ye = jnp.einsum("nhwk,kc->nhwc", lo, kups[dr],
                        preferred_element_type=jnp.float32)
        yo = jnp.einsum("nhwk,kc->nhwc", hi, kups[dr],
                        preferred_element_type=jnp.float32)
        # interleave even/odd output blocks along wb
        y = jnp.stack([ye, yo], axis=3).reshape(n, h, 2 * wb, B * co)
        rows.append(y)
    # interleave the two row taps: out rows 2r, 2r+1
    out = jnp.stack(rows, axis=2).reshape(n, 2 * h, 2 * wb, B * co)
    return out.astype(xp.dtype)


def conv4x4s2_packed(xp: jax.Array, k: jax.Array) -> jax.Array:
    """4x4 conv, stride 2, pad 1 (the reference discriminator's op) on
    packed activations: (N, H, Wb, B*Ci) -> (N, H/2, Wb/2, B*Co).

    Out column c reads in columns 2c-1..2c+2, so an output block spans two
    input blocks plus one boundary column on each side: lane gather
    [prev_tail | even block | odd block | next_head] = (2B+2)*Ci lanes,
    contracted against a (2B+2)*Ci x B*Co banded kernel per h tap; the four
    h taps are stride-2 sublane views. Wb must be even.
    """
    n, h, wb, bci = xp.shape
    ci = bci // B
    co = k.shape[3]
    kd = k.astype(xp.dtype)
    h_out = (h + 2 - 4) // 2 + 1
    xh = jnp.pad(xp, ((0, 0), (1, 1), (0, 0), (0, 0)))
    ev, od = xh[:, :, 0::2], xh[:, :, 1::2]
    prev_tail = jnp.pad(od[:, :, :-1, (B - 1) * ci:],
                        ((0, 0), (0, 0), (1, 0), (0, 0)))
    next_head = jnp.pad(ev[:, :, 1:, :ci],
                        ((0, 0), (0, 0), (0, 1), (0, 0)))
    xb = jnp.concatenate([prev_tail, ev, od, next_head], axis=-1)
    # banded kernel: out lane j*Co+o <- xb lane block p=2j+dw, tap k[kh,dw]
    kbs = []
    for kh in range(4):
        kb = jnp.zeros(((2 * B + 2) * ci, B * co), kd.dtype)
        for j in range(B):
            for dw in range(4):
                p = 2 * j + dw
                kb = kb.at[p * ci:(p + 1) * ci,
                           j * co:(j + 1) * co].add(kd[kh, dw])
        kbs.append(kb)
    y = jnp.zeros((n, h_out, wb // 2, B * co), jnp.float32)
    for kh in range(4):
        rows = xb[:, kh:kh + 2 * h_out:2]
        y = y + jnp.einsum("nhwk,kc->nhwc", rows, kbs[kh],
                           preferred_element_type=jnp.float32)
    return y.astype(xp.dtype)
