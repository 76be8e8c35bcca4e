# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Fused Pallas TPU kernels for the AVEC video front-end stem.

The stem (ref nnet/networks.py:459-473: Conv3d 1->64 k=(5,7,7) s=(1,2,2)
-> BatchNorm3d -> ReLU -> MaxPool (3,3)/(2,2)) is the single largest
device-time block in the AV training step. XLA lowers the C_in=1 conv with
a sublane-packed VPU emitter (~14.4M estimated cycles at B=16, the profiled
8.7 ms/step) and spends further milliseconds on BN-apply passes, a full
599 MB layout copy feeding the pool, and a redundant conv-bias gradient.

This module restructures the stem over the polyphase-folded input
(ops/layers._polyphase_fold, the exact same fold the XLA path uses):

  stage 1   XLA polyphase conv + bias + masked single-pass batch-stat
            sums (E[y], E[y^2] fused into the conv's consumer). The conv
            itself stays on XLA: a Pallas im2col needs a lane-dim split
            Mosaic cannot lower, and channel-unfold reformulations padded
            their 4-lane intermediates 32x into HBM OOM (see
            stem_conv_stats docstring / ROUND_NOTES).
  kernel 2  y -> relu(a*y + b) -> 3x3/2 max pool, one Pallas pass
            (a = scale*rsqrt(var+eps), b = bias - mean*a), removing the
            separate BN-apply, relu, pool and 599 MB layout-copy passes.

The backward is a custom_vjp in plain XLA: select-and-scatter pool
backward on the recomputed pre-pool activation, the exact training-mode
BN backward, the XLA weight-gradient conv, and an ANALYTIC ZERO for the
conv bias gradient (BN immediately subtracts the batch mean, so the conv
bias cannot affect the loss — XLA cannot see this, and was spending a
multi-ms full reduction computing zeros).

Single-device v1: the pallas_call carries no partitioning rule, so the
fused path is enabled only when one device is visible (the bench/serving
case); multi-device meshes fall back to the XLA polyphase path (see
models/encoders.py gate).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Stem geometry (fixed by the architecture, asserted at the entry point):
# input 88x88x1, folded spatial 47 (44 outputs + 3 halo), 4 phases,
# 5 time taps, 64 output channels, 44 -> 22 pool.
_HP = 47
_HO = 44
_CF = 4
_KT = 5
_KS = 4
_CO = 64
_K = _KT * _KS * _KS * _CF  # 320


def stem_conv_stats(xp: jnp.ndarray, kp2: jnp.ndarray, bias: jnp.ndarray,
                    t_valid: int, tb: int = 4, interpret: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Folded stem conv + single-pass stat partials.

    xp: (B, Tp+4, 47, 47, 4) folded input; kp2: (320, 64); bias: (64,).
    Returns y (B, Tp, 44, 44, 64) in xp.dtype and stats (2, 64) f32 sums
    over valid frames only.

    The conv itself stays on XLA's polyphase emitter: a Pallas im2col needs
    a lane-dim split ((44, 176) -> (44, 44, 4)) that Mosaic cannot lower
    ("unsupported shape cast"), and XLA reformulations with a channel
    unfold (C_in=16/64) padded the 4-lane gather intermediates 32x into an
    HBM OOM — measured on v5e, see ROUND_NOTES. XLA fuses the single-pass
    stat reductions into the conv's consumer, which is the part that
    matters for bandwidth.
    """
    b, tp4 = xp.shape[0], xp.shape[1]
    tp = tp4 - (_KT - 1)
    assert xp.shape[2:] == (_HP, _HP, _CF), xp.shape
    kp5 = kp2.reshape(_KT, _KS, _KS, _CF, _CO)
    dn = lax.conv_dimension_numbers(xp.shape, kp5.shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))
    y = lax.conv_general_dilated(
        xp, kp5, window_strides=(1, 1, 1), padding=((0, 0),) * 3,
        dimension_numbers=dn, preferred_element_type=xp.dtype)
    y = y + bias.astype(y.dtype)

    yf = y.astype(jnp.float32)
    if t_valid < tp:
        frame = jax.lax.broadcasted_iota(jnp.int32, (1, tp, 1, 1, 1), 1)
        yf = jnp.where(frame < t_valid, yf, 0.0)
    stats = jnp.stack([yf.sum(axis=(0, 1, 2, 3)),
                       (yf * yf).sum(axis=(0, 1, 2, 3))])
    return y, stats


def _bn_relu_pool_kernel(y_ref, ab_ref, o_ref):
    """relu(a*y + b) -> dense 3x3 'same' max -> even-row select, one pass.

    y_ref: (tb2, 44, 44, 64); ab_ref: (2, 64) f32; o_ref: (tb2, 22, 44, 64)
    — the caller takes even COLUMNS in XLA (Mosaic cannot express a
    strided lane-adjacent selection: vector strided slices must have
    stride 1 and minor-dim reshapes are unsupported; even-ROW selection is
    a leading-dim split + index, which is free).
    """
    a = ab_ref[0, :].astype(jnp.float32)
    b = ab_ref[1, :].astype(jnp.float32)
    # Affine+relu in f32, then drop to the output dtype immediately: the
    # max is order-preserving, and bf16 intermediates keep the kernel
    # inside the 16 MB scoped-VMEM budget.
    z = jnp.maximum(y_ref[...].astype(jnp.float32) * a + b,
                    0.0).astype(o_ref.dtype)
    tb2 = z.shape[0]

    # Dense separable 3x3 'same' max; 0.0 edge pads are the identity
    # because z = relu(...) >= 0.
    zpad = ((0, 0), (0, 0), (1, 0), (0, 0))
    left = jnp.pad(z[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))
    right = jnp.pad(z[:, :, :-1, :], zpad)
    zw = jnp.maximum(z, jnp.maximum(left, right))
    up = jnp.pad(zw[:, 1:, :, :], ((0, 0), (0, 1), (0, 0), (0, 0)))
    down = jnp.pad(zw[:, :-1, :, :], ((0, 0), (1, 0), (0, 0), (0, 0)))
    zh = jnp.maximum(zw, jnp.maximum(up, down))
    # Even rows via a leading-dim split (the size-2 axis sits before the
    # (44, 64) minor pair, so no tile padding).
    o_ref[...] = zh.reshape(tb2, _HO // 2, 2, _HO, _CO)[:, :, 0]


def bn_relu_pool(y: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                 tb2: int = 4, interpret: bool = False) -> jnp.ndarray:
    """Fused BN-apply + ReLU + max pool over (N, 44, 44, 64) frames.

    One Pallas pass produces the even-row dense-3x3 max (N, 22, 44, 64);
    the final even-column selection runs in XLA (see kernel docstring).
    """
    n = y.shape[0]
    assert y.shape[1:] == (_HO, _HO, _CO), y.shape
    while n % tb2:
        tb2 //= 2
    tb2 = max(tb2, 1)
    ab = jnp.stack([a, b]).astype(jnp.float32)
    half = pl.pallas_call(
        _bn_relu_pool_kernel,
        grid=(n // tb2,),
        in_specs=[
            pl.BlockSpec((tb2, _HO, _HO, _CO), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((2, _CO), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tb2, _HO // 2, _HO, _CO),
                               lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, _HO // 2, _HO, _CO), y.dtype),
        interpret=interpret,
    )(y, ab)
    return half[:, :, 0::2, :]


# ----------------------------------------------------------------- fused op

def _pool_ref(z):
    """XLA reference max pool (3,3)/(2,2) 'same' on (N, 44, 44, C) —
    used by the backward's select-and-scatter vjp."""
    return lax.reduce_window(
        z, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_stem_train(xp, kp2, bias, scale, bn_bias, t_valid, eps, interpret):
    """Training-mode fused stem on folded inputs.

    xp (B, Tp+4, 47, 47, 4); kp2 (320, 64); bias/scale/bn_bias (64,).
    Returns (pooled (B, Tp, 22, 22, 64), batch_mean, batch_var) — the
    caller crops Tp -> T and updates running stats. Reverse-mode only.
    """
    out, _ = _fused_stem_train_fwd(xp, kp2, bias, scale, bn_bias, t_valid,
                                   eps, interpret)
    return out


def _stats_to_ab(stats, scale, bn_bias, n, eps):
    mean = stats[0] / n
    var = jnp.maximum(stats[1] / n - mean * mean, 0.0)
    a = scale * lax.rsqrt(var + eps)
    b = bn_bias - mean * a
    return mean, var, a, b


def _fused_stem_train_fwd(xp, kp2, bias, scale, bn_bias, t_valid, eps,
                          interpret):
    b_sz = xp.shape[0]
    n = b_sz * t_valid * _HO * _HO
    y, stats = stem_conv_stats(xp, kp2, bias, t_valid, interpret=interpret)
    tp = y.shape[1]
    mean, var, a, bb = _stats_to_ab(stats, scale, bn_bias, n, eps)
    pooled = bn_relu_pool(y.reshape(b_sz * tp, _HO, _HO, _CO), a, bb,
                          interpret=interpret)
    pooled = pooled.reshape(b_sz, tp, _HO // 2, _HO // 2, _CO)
    res = (xp, kp2, y, mean, var, scale, a, bb)
    return (pooled, mean, var), res


def _fused_stem_train_bwd(t_valid, eps, interpret, res, g):
    xp, kp2, y, mean, var, scale, a, bb = res
    gp, _, _ = g  # cotangents of (pooled, mean, var); stat grads unused
    b_sz, tp = y.shape[0], y.shape[1]
    n = b_sz * t_valid * _HO * _HO

    # Recompute the pre-pool activation with the SAME rounding as the
    # forward kernel (f32 affine, cast to y.dtype) and run the
    # select-and-scatter pool backward in that dtype — bf16 halves the
    # bandwidth of the heaviest backward pass.
    y2 = y.reshape(b_sz * tp, _HO, _HO, _CO)
    z = jnp.maximum(y2.astype(jnp.float32) * a + bb, 0.0).astype(y.dtype)
    gp2 = gp.reshape(b_sz * tp, _HO // 2, _HO // 2, _CO).astype(y.dtype)
    _, pool_vjp = jax.vjp(_pool_ref, z)
    ghat = pool_vjp(gp2)[0]  # select-and-scatter; relu ties resolved by it
    ghat = jnp.where(z > 0, ghat, jnp.zeros_like(ghat))  # relu gate

    # Training-mode BN backward (stats are functions of y); reductions
    # accumulate in f32 (converts fuse into the reduces).
    inv = lax.rsqrt(var + eps)
    gf = ghat.astype(jnp.float32)
    yhat = (y2.astype(jnp.float32) - mean) * inv
    dbn_bias = gf.sum(axis=(0, 1, 2))
    dscale = (gf * yhat).sum(axis=(0, 1, 2))
    # Padded frames carry garbage y; ghat is zero there (gp padded with
    # zeros), but the broadcast -mean terms are not — mask dy to valid
    # frames before the weight gradient.
    frame = jax.lax.broadcasted_iota(
        jnp.int32, (b_sz * tp, 1, 1, 1), 0) % tp
    fmask = frame < t_valid
    dy = (scale * inv) * (gf - dbn_bias / n - yhat * (dscale / n))
    dy = jnp.where(fmask, dy, 0.0).astype(y.dtype)
    dy = dy.reshape(b_sz, tp, _HO, _HO, _CO)

    # Weight gradient through the equivalent stride-1 VALID conv.
    kp5 = kp2.reshape(_KT, _KS, _KS, _CF, _CO)
    dn = lax.conv_dimension_numbers(xp.shape, kp5.shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))

    def conv_fn(k):
        return lax.conv_general_dilated(
            xp, k.reshape(_KT, _KS, _KS, _CF, _CO),
            window_strides=(1, 1, 1), padding=((0, 0),) * 3,
            dimension_numbers=dn, preferred_element_type=xp.dtype)

    _, wgrad_vjp = jax.vjp(conv_fn, kp2)
    dkp2 = wgrad_vjp(dy)[0].astype(kp2.dtype)

    # Conv bias gradient is analytically zero: BN subtracts the batch mean
    # of the conv output, so a constant shift cannot reach the loss.
    dbias = jnp.zeros_like(scale)
    dxp = jnp.zeros_like(xp)  # video input needs no gradient (DCE'd)
    return dxp, dkp2, dbias, dscale, dbn_bias


fused_stem_train.defvjp(_fused_stem_train_fwd, _fused_stem_train_bwd)


def fused_stem_eval(xp, kp2, bias, scale, bn_bias, ra_mean, ra_var,
                    t_valid, eps, interpret=False):
    """Eval-mode fused stem: running statistics, no stat outputs."""
    b_sz = xp.shape[0]
    y, _ = stem_conv_stats(xp, kp2, bias, t_valid, interpret=interpret)
    tp = y.shape[1]
    a = scale * lax.rsqrt(ra_var + eps)
    bb = bn_bias - ra_mean * a
    pooled = bn_relu_pool(y.reshape(b_sz * tp, _HO, _HO, _CO), a, bb,
                          interpret=interpret)
    return pooled.reshape(b_sz, tp, _HO // 2, _HO // 2, _CO)
