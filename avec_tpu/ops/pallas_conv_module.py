# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Fused conformer convolution module as Pallas kernels (fwd AND bwd).

Computes the whole stride-1 ConvolutionModule body (ref:
nnet/modules.py:341-385) with activations resident in VMEM:

    h = LN(x)                       (eps 1e-6, f32 stats)
    u = h @ Wpw1 + b1               (pointwise conv, 2e channels)
    z = glu(u) = u[:e] * sigmoid(u[e:])
    c = depthwise_conv_k(z) + b_dw  ('same' padding, per-channel taps)
    cn = BN(c)                      (train-mode batch stats, eps 1e-5)
    s = swish(cn)
    y = s @ Wpw2 + b2               [dropout]

Training-mode BatchNorm makes this a TWO-pass computation: the batch
mean/var over ALL (B*T) tokens must be complete before any token can be
normalized. The forward is therefore two pallas_calls over a (B,) grid —
one accumulating per-channel sum/sum-of-squares, one recomputing the
pre-BN path and finishing the module — with the tiny mean/var arithmetic
as XLA glue between them. The backward mirrors it: BN's gradient couples
every token through d(mean)/d(var), so pass one accumulates the two
global reductions (sum g_bn, sum g_bn*c_hat) plus the pw2 weight grads,
and pass two finishes dx and the remaining weight grads. All four kernels
recompute the forward from x per batch row instead of saving residuals:
the only HBM tensors are x, g, y, dx and the (e,)-sized stats.

Each grid step owns one full (T, d) sequence row, so the depthwise conv
needs no halo exchange: the kernel zero-pads the row in VMEM and takes k
static shifted slices ('same' = (k-1)//2 left, k//2 right, matching
ops/layers.conv_padding). The GLU halves are produced by two separate
(d, e) matmuls (the caller splits Wpw1) so the kernel never slices the
lane dimension at a non-128 multiple. Sequence tensors stay (B, T, D)
with (1, T, D) blocks — Mosaic requires a block's trailing two dims to be
(8,128)-divisible OR equal to the array dims, and conformer dims
(180/256/360, T=301/151/76) are not 8x128 tiles.

The depthwise-conv bias gradient is identically zero (train-mode BN
subtracts the batch mean; ops/layers.Conv.bias_stop_gradient documents
the same analytic fact) but the bias still shifts the RUNNING mean, so
the forward includes it in the stats.

Dropout (the trailing module dropout) regenerates its mask identically in
forward and backward from a per-row hardware-PRNG stream, exactly like
ops/pallas_ffn.

Sharding caveat (same as pallas_ffn): a pallas_call is opaque to GSPMD.
`fused_conv_module_3d_dp` wraps the kernel in shard_map for a data-
sharded batch axis; because BN statistics are GLOBAL across the batch,
the wrapper psums the phase-one stats (and the backward's two global
reductions) over the mesh axis so the math equals the unsharded module
(= the GSPMD sync-BN semantics of the unfused path).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avec_tpu.ops.pallas_ffn import _ln_f32, _mix32, _SEED_STRIDE


def _dropout_mask(seed_ref, shape, keep_rate, interpret):
    """One Bernoulli(keep)/keep multiplier per grid row, regenerated
    identically by forward and backward (same seed formula, single draw)."""
    thr = np.uint32(min(int(keep_rate * float(2 ** 32)), 2 ** 32 - 1))
    inv_keep = np.float32(1.0 / keep_rate)
    if interpret:
        base = (seed_ref[0].astype(jnp.uint32)
                + jnp.uint32(pl.program_id(0)) * np.uint32(_SEED_STRIDE))
        flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
                * np.uint32(shape[1])
                + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
        bits = _mix32(flat ^ _mix32(base + np.uint32(0x9E3779B9)))
    else:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * _SEED_STRIDE)
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return jnp.where(bits < thr, inv_keep, np.float32(0.0))


def _pre_bn(x_ref, ls_ref, lb_ref, w1a_ref, b1a_ref, w1b_ref, b1b_ref,
            dw_ref, dwb_ref, *, k, pad_lo, ln_eps):
    """Shared forward recompute up to the depthwise-conv output.

    Returns (c_cdt, z, gate_sig, a, h, xhat, rstd_ln) where c_cdt is the
    conv output in the compute dtype (the exact tensor whose f32 view
    feeds BN, matching the unfused path where the conv emits x.dtype).
    x_ref is a (1, T, D) block; everything downstream works on (T, D)."""
    cdt = x_ref.dtype
    h, xhat, rstd = _ln_f32(x_ref[0], ls_ref, lb_ref, ln_eps, cdt)
    a = (jnp.dot(h, w1a_ref[:].astype(cdt),
                 preferred_element_type=jnp.float32)
         + b1a_ref[:]).astype(cdt)
    bg = (jnp.dot(h, w1b_ref[:].astype(cdt),
                  preferred_element_type=jnp.float32)
          + b1b_ref[:]).astype(cdt)
    gate = jax.nn.sigmoid(bg.astype(jnp.float32))
    z = (a.astype(jnp.float32) * gate).astype(cdt)
    t, e = z.shape
    pad_hi = k - 1 - pad_lo
    zp = jnp.concatenate(
        [jnp.zeros((pad_lo, e), z.dtype), z, jnp.zeros((pad_hi, e), z.dtype)],
        axis=0)
    c = jnp.zeros((t, e), jnp.float32)
    for j in range(k):
        c = c + zp[j:j + t].astype(jnp.float32) * dw_ref[j:j + 1, :]
    c_cdt = (c.astype(cdt) + dwb_ref[:].astype(cdt))
    return c_cdt, z, gate, a, h, xhat, rstd


def _stats_kernel(x_ref, ls_ref, lb_ref, w1a_ref, b1a_ref, w1b_ref, b1b_ref,
                  dw_ref, dwb_ref, s1_ref, s2_ref, *, k, pad_lo, ln_eps):
    @pl.when(pl.program_id(0) == 0)
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    c_cdt, *_ = _pre_bn(x_ref, ls_ref, lb_ref, w1a_ref, b1a_ref, w1b_ref,
                        b1b_ref, dw_ref, dwb_ref, k=k, pad_lo=pad_lo, ln_eps=ln_eps)
    cf = c_cdt.astype(jnp.float32)
    s1_ref[:] += cf.sum(axis=0, keepdims=True)
    s2_ref[:] += (cf * cf).sum(axis=0, keepdims=True)


def _bn_swish(c_cdt, mean_ref, rstd_ref, bs_ref, bb_ref, cdt):
    """BN apply (f32, matching ops/layers._bn_apply: normalize + affine in
    f32, cast once at the end) followed by swish on the cast value."""
    chat = (c_cdt.astype(jnp.float32) - mean_ref[:]) * rstd_ref[:]
    cn = (chat * bs_ref[:] + bb_ref[:]).astype(cdt)
    cnf = cn.astype(jnp.float32)
    sig = jax.nn.sigmoid(cnf)
    s = (cnf * sig).astype(cdt)
    return chat, cnf, sig, s


def _fwd_kernel(seed_ref, x_ref, mean_ref, rstd_ref, ls_ref, lb_ref,
                w1a_ref, b1a_ref, w1b_ref, b1b_ref, dw_ref, dwb_ref,
                bs_ref, bb_ref, w2_ref, b2_ref, o_ref, *,
                k, pad_lo, ln_eps, drop_rate, train, interpret):
    cdt = x_ref.dtype
    c_cdt, *_ = _pre_bn(x_ref, ls_ref, lb_ref, w1a_ref, b1a_ref, w1b_ref,
                        b1b_ref, dw_ref, dwb_ref, k=k, pad_lo=pad_lo, ln_eps=ln_eps)
    _, _, _, s = _bn_swish(c_cdt, mean_ref, rstd_ref, bs_ref, bb_ref, cdt)
    y = jnp.dot(s, w2_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + b2_ref[:]
    if train and drop_rate > 0.0:
        y = y * _dropout_mask(seed_ref, y.shape, 1.0 - drop_rate, interpret)
    o_ref[0, :, :] = y.astype(cdt)


def _bwd1_kernel(seed_ref, x_ref, g_ref, mean_ref, rstd_ref, ls_ref, lb_ref,
                 w1a_ref, b1a_ref, w1b_ref, b1b_ref, dw_ref, dwb_ref,
                 bs_ref, bb_ref, w2_ref, b2_ref,
                 dw2_ref, db2_ref, r1_ref, r2_ref, *,
                 k, pad_lo, ln_eps, drop_rate, train, interpret):
    """Pass one of the backward: everything downstream of BN plus the two
    global BN reductions (r1 = sum g_bn, r2 = sum g_bn * c_hat)."""
    cdt = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        r1_ref[:] = jnp.zeros_like(r1_ref)
        r2_ref[:] = jnp.zeros_like(r2_ref)

    c_cdt, *_ = _pre_bn(x_ref, ls_ref, lb_ref, w1a_ref, b1a_ref, w1b_ref,
                        b1b_ref, dw_ref, dwb_ref, k=k, pad_lo=pad_lo, ln_eps=ln_eps)
    chat, cnf, sig, s = _bn_swish(c_cdt, mean_ref, rstd_ref, bs_ref, bb_ref,
                                  cdt)
    g = g_ref[0].astype(jnp.float32)
    if train and drop_rate > 0.0:
        g = g * _dropout_mask(seed_ref, g.shape, 1.0 - drop_rate, interpret)
    db2_ref[:] += g.sum(axis=0, keepdims=True)
    row = (((0,), (0,)), ((), ()))
    dw2_ref[:] += jax.lax.dot_general(
        s, g.astype(cdt), dimension_numbers=row,
        preferred_element_type=jnp.float32)
    ds = jax.lax.dot_general(
        g.astype(cdt), w2_ref[:].astype(cdt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    # d swish(u)/du at u = cnf
    gbn = ds * (sig + cnf * sig * (1.0 - sig))
    r1_ref[:] += gbn.sum(axis=0, keepdims=True)
    r2_ref[:] += (gbn * chat).sum(axis=0, keepdims=True)


def _bwd2_kernel(seed_ref, x_ref, g_ref, mean_ref, rstd_ref, rn1_ref,
                 rn2_ref, ls_ref, lb_ref, w1a_ref, b1a_ref, w1b_ref, b1b_ref,
                 dw_ref, dwb_ref, bs_ref, bb_ref, w2_ref, b2_ref,
                 dx_ref, dls_ref, dlb_ref, dw1a_ref, db1a_ref,
                 dw1b_ref, db1b_ref, ddw_ref, *,
                 k, pad_lo, ln_eps, drop_rate, train, interpret):
    """Pass two: dc from the completed BN reductions, then depthwise-conv,
    GLU, pointwise-1 and LayerNorm backward down to dx."""
    cdt = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        dls_ref[:] = jnp.zeros_like(dls_ref)
        dlb_ref[:] = jnp.zeros_like(dlb_ref)
        dw1a_ref[:] = jnp.zeros_like(dw1a_ref)
        db1a_ref[:] = jnp.zeros_like(db1a_ref)
        dw1b_ref[:] = jnp.zeros_like(dw1b_ref)
        db1b_ref[:] = jnp.zeros_like(db1b_ref)
        ddw_ref[:] = jnp.zeros_like(ddw_ref)

    c_cdt, z, gate, a, h, xhat, rstd_ln = _pre_bn(
        x_ref, ls_ref, lb_ref, w1a_ref, b1a_ref, w1b_ref, b1b_ref,
        dw_ref, dwb_ref, k=k, pad_lo=pad_lo, ln_eps=ln_eps)
    chat, cnf, sig, s = _bn_swish(c_cdt, mean_ref, rstd_ref, bs_ref, bb_ref,
                                  cdt)
    g = g_ref[0].astype(jnp.float32)
    if train and drop_rate > 0.0:
        g = g * _dropout_mask(seed_ref, g.shape, 1.0 - drop_rate, interpret)
    ds = jax.lax.dot_general(
        g.astype(cdt), w2_ref[:].astype(cdt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    gbn = ds * (sig + cnf * sig * (1.0 - sig))
    # Train-mode BN backward with the global means rn1 = E[gbn * scale-path],
    # rn2 = E[gbn * chat] precomputed (pass one, divided by N in the glue):
    dc = bs_ref[:] * rstd_ref[:] * (gbn - rn1_ref[:] - chat * rn2_ref[:])

    t, e = z.shape
    pad_hi = k - 1 - pad_lo
    zp = jnp.concatenate(
        [jnp.zeros((pad_lo, e), jnp.float32), z.astype(jnp.float32),
         jnp.zeros((pad_hi, e), jnp.float32)], axis=0)
    # Weight grad: ddw[j, ch] = sum_t zp[t + j, ch] * dc[t, ch]
    rows = [ (zp[j:j + t] * dc).sum(axis=0, keepdims=True) for j in range(k) ]
    ddw_ref[:] += jnp.concatenate(rows, axis=0)
    # Data grad: dz[tau] = sum_j w[j] * dc_pad[tau + (pad_hi + pad_lo) - j]
    # where dc is zero-padded by (pad_hi, pad_lo) — the transpose of 'same'.
    dcp = jnp.concatenate(
        [jnp.zeros((pad_hi, e), jnp.float32), dc,
         jnp.zeros((pad_lo, e), jnp.float32)], axis=0)
    dz = jnp.zeros((t, e), jnp.float32)
    for j in range(k):
        dz = dz + dcp[k - 1 - j:k - 1 - j + t] * dw_ref[j:j + 1, :]
    # (depthwise bias grad is identically zero under train-mode BN — the
    # unfused path stop_gradients it for the same reason.)

    # GLU backward: z = a * sigmoid(bg)
    da = dz * gate
    dbg = dz * a.astype(jnp.float32) * gate * (1.0 - gate)
    db1a_ref[:] += da.sum(axis=0, keepdims=True)
    db1b_ref[:] += dbg.sum(axis=0, keepdims=True)
    row = (((0,), (0,)), ((), ()))
    dw1a_ref[:] += jax.lax.dot_general(
        h, da.astype(cdt), dimension_numbers=row,
        preferred_element_type=jnp.float32)
    dw1b_ref[:] += jax.lax.dot_general(
        h, dbg.astype(cdt), dimension_numbers=row,
        preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(
        da.astype(cdt), w1a_ref[:].astype(cdt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = dh + jax.lax.dot_general(
        dbg.astype(cdt), w1b_ref[:].astype(cdt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dls_ref[:] += (dh * xhat).sum(axis=0, keepdims=True)
    dlb_ref[:] += dh.sum(axis=0, keepdims=True)
    dxhat = dh * ls_ref[:]
    dx = rstd_ln * (dxhat - dxhat.mean(axis=-1, keepdims=True)
                    - xhat * (dxhat * xhat).mean(axis=-1, keepdims=True))
    dx_ref[0, :, :] = dx.astype(cdt)


def _const(i, *_):
    return (0, 0)


def _tile3(i, *_):
    return (i, 0, 0)


def _seq_spec(t, d):
    """(1, T, D) blocks: trailing two dims equal the array dims, which
    Mosaic accepts for ANY (T, D) — conformer dims are not 8x128 tiles."""
    return pl.BlockSpec((1, t, d), _tile3)


def _param_specs(d, e, k):
    return [
        pl.BlockSpec((1, d), _const),      # ln scale
        pl.BlockSpec((1, d), _const),      # ln bias
        pl.BlockSpec((d, e), _const),      # w1a
        pl.BlockSpec((1, e), _const),      # b1a
        pl.BlockSpec((d, e), _const),      # w1b
        pl.BlockSpec((1, e), _const),      # b1b
        pl.BlockSpec((k, e), _const),      # dw kernel
        pl.BlockSpec((1, e), _const),      # dw bias
    ]


def _bn_pw2_specs(e, e_out):
    return [
        pl.BlockSpec((1, e), _const),      # bn scale
        pl.BlockSpec((1, e), _const),      # bn bias
        pl.BlockSpec((e, e_out), _const),  # w2
        pl.BlockSpec((1, e_out), _const),  # b2
    ]


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17, 18, 19,
                                                    20, 21))
def _fused_conv_module(x, ls, lb, w1a, b1a, w1b, b1b, dwk, dwb, bs, bb,
                       w2, b2, seed, t, k, pad_lo, ln_eps, bn_eps, drop_rate,
                       train, interpret):
    # NOTE: seed rides as a differentiable arg slot (float0 tangent) so the
    # nondiff tuple stays hashable statics only; t is the per-row length.
    (y, mean, var), _ = _fused_conv_fwd(x, ls, lb, w1a, b1a, w1b, b1b, dwk,
                                        dwb, bs, bb, w2, b2, seed, t, k,
                                        pad_lo, ln_eps, bn_eps, drop_rate,
                                        train, interpret)
    return y, mean, var


def _fused_conv_fwd(x, ls, lb, w1a, b1a, w1b, b1b, dwk, dwb, bs, bb, w2, b2,
                    seed, t, k, pad_lo, ln_eps, bn_eps, drop_rate, train,
                    interpret):
    b, _, d = x.shape
    n = b * t
    e = w1a.shape[1]
    e_out = w2.shape[1]
    pre_args = (ls.reshape(1, d), lb.reshape(1, d), w1a, b1a.reshape(1, e),
                w1b, b1b.reshape(1, e), dwk, dwb.reshape(1, e))
    s1, s2 = pl.pallas_call(
        functools.partial(_stats_kernel, k=k, pad_lo=pad_lo, ln_eps=ln_eps),
        grid=(b,),
        in_specs=[_seq_spec(t, d)] + _param_specs(d, e, k),
        out_specs=[pl.BlockSpec((1, e), _const), pl.BlockSpec((1, e), _const)],
        out_shape=[jax.ShapeDtypeStruct((1, e), jnp.float32),
                   jax.ShapeDtypeStruct((1, e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x, *pre_args)
    mean = s1.reshape(e) / n
    var = jnp.maximum(s2.reshape(e) / n - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + bn_eps)

    bn_args = (bs.reshape(1, e), bb.reshape(1, e), w2, b2.reshape(1, e_out))
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, pad_lo=pad_lo, ln_eps=ln_eps,
                          drop_rate=drop_rate, train=train,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,),
            in_specs=([_seq_spec(t, d),
                       pl.BlockSpec((1, e), _const),   # mean
                       pl.BlockSpec((1, e), _const)]   # rstd
                      + _param_specs(d, e, k) + _bn_pw2_specs(e, e_out)),
            out_specs=_seq_spec(t, e_out),
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, e_out), x.dtype),
        interpret=interpret,
    )(seed, x, mean.reshape(1, e), rstd.reshape(1, e), *pre_args, *bn_args)
    res = (x, ls, lb, w1a, b1a, w1b, b1b, dwk, dwb, bs, bb, w2, b2, seed,
           mean, rstd)
    return (y, mean, var), res


def _fused_conv_bwd(t, k, pad_lo, ln_eps, bn_eps, drop_rate, train,
                    interpret, res, cts):
    g, _, _ = cts  # mean/var cotangents: running-stat sinks, no grad path
    (x, ls, lb, w1a, b1a, w1b, b1b, dwk, dwb, bs, bb, w2, b2, seed,
     mean, rstd) = res
    b, _, d = x.shape
    n = b * t
    e = w1a.shape[1]
    e_out = w2.shape[1]
    g = g.astype(x.dtype)
    pre_args = (ls.reshape(1, d), lb.reshape(1, d), w1a, b1a.reshape(1, e),
                w1b, b1b.reshape(1, e), dwk, dwb.reshape(1, e))
    bn_args = (bs.reshape(1, e), bb.reshape(1, e), w2, b2.reshape(1, e_out))
    mean2, rstd2 = mean.reshape(1, e), rstd.reshape(1, e)

    dw2, db2, r1, r2 = pl.pallas_call(
        functools.partial(_bwd1_kernel, k=k, pad_lo=pad_lo, ln_eps=ln_eps,
                          drop_rate=drop_rate, train=train,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,),
            in_specs=([_seq_spec(t, d),
                       _seq_spec(t, e_out),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((1, e), _const)]
                      + _param_specs(d, e, k) + _bn_pw2_specs(e, e_out)),
            out_specs=[pl.BlockSpec((e, e_out), _const),
                       pl.BlockSpec((1, e_out), _const),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((1, e), _const)],
        ),
        out_shape=[jax.ShapeDtypeStruct((e, e_out), jnp.float32),
                   jax.ShapeDtypeStruct((1, e_out), jnp.float32),
                   jax.ShapeDtypeStruct((1, e), jnp.float32),
                   jax.ShapeDtypeStruct((1, e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, x, g, mean2, rstd2, *pre_args, *bn_args)

    rn1 = r1 / n
    rn2 = r2 / n

    dx, dls, dlb, dw1a, db1a, dw1b, db1b, ddw = pl.pallas_call(
        functools.partial(_bwd2_kernel, k=k, pad_lo=pad_lo, ln_eps=ln_eps,
                          drop_rate=drop_rate, train=train,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,),
            in_specs=([_seq_spec(t, d),
                       _seq_spec(t, e_out),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((1, e), _const)]
                      + _param_specs(d, e, k) + _bn_pw2_specs(e, e_out)),
            out_specs=[_seq_spec(t, d),
                       pl.BlockSpec((1, d), _const),
                       pl.BlockSpec((1, d), _const),
                       pl.BlockSpec((d, e), _const),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((d, e), _const),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((k, e), _const)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((d, e), jnp.float32),
                   jax.ShapeDtypeStruct((1, e), jnp.float32),
                   jax.ShapeDtypeStruct((d, e), jnp.float32),
                   jax.ShapeDtypeStruct((1, e), jnp.float32),
                   jax.ShapeDtypeStruct((k, e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, x, g, mean2, rstd2, rn1, rn2, *pre_args, *bn_args)

    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dx, dls.reshape(d).astype(ls.dtype),
            dlb.reshape(d).astype(lb.dtype), dw1a.astype(w1a.dtype),
            db1a.reshape(e).astype(b1a.dtype), dw1b.astype(w1b.dtype),
            db1b.reshape(e).astype(b1b.dtype), ddw.astype(dwk.dtype),
            jnp.zeros_like(dwb),  # train-BN kills the depthwise bias grad
            r2.reshape(e).astype(bs.dtype),  # d bn_scale = sum gbn * chat
            r1.reshape(e).astype(bb.dtype),  # d bn_bias  = sum gbn
            dw2.astype(w2.dtype), db2.reshape(e_out).astype(b2.dtype),
            dseed)


_fused_conv_module.defvjp(_fused_conv_fwd, _fused_conv_bwd)


def _pad_lo_for(padding, k):
    if padding == "same":
        return (k - 1) // 2
    if padding == "causal":
        return k - 1
    raise ValueError(f"fused conv module: unsupported padding {padding!r}")


def fused_conv_module_3d(x, ln_scale, ln_bias, pw1_kernel, pw1_bias,
                         dw_kernel, dw_bias, bn_scale, bn_bias,
                         pw2_kernel, pw2_bias, *, seed=None, padding="same",
                         ln_eps=1e-6, bn_eps=1e-5, drop_rate=0.0,
                         deterministic=True, interpret=None):
    """Fused stride-1 ConvolutionModule on (B, T, D) sequences.

    Parameters are the flax child params of ConvolutionModule:
    pw1_kernel (1, D, 2E) / pw1_bias (2E,) from Conv_0, dw_kernel (k, 1, E) /
    dw_bias (E,) from Conv_1 (groups=E), bn_* from BatchNorm_0 and
    pw2_kernel (1, E, E') / pw2_bias from Conv_2. Returns
    (y (B, T, E'), batch_mean (E,), batch_var (E,)) — the biased batch var,
    exactly what BatchNorm computes before the unbiased running update.
    `padding` is "same" or "causal" (ops/layers.conv_padding semantics).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    b, t, d = x.shape
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(-1)[:1]
    pw1 = pw1_kernel.reshape(pw1_kernel.shape[-2], pw1_kernel.shape[-1])
    e = pw1.shape[1] // 2
    w1a, w1b = pw1[:, :e], pw1[:, e:]
    b1a, b1b = pw1_bias[:e], pw1_bias[e:]
    dwk = dw_kernel.reshape(dw_kernel.shape[0], dw_kernel.shape[-1])
    k = dwk.shape[0]
    pw2 = pw2_kernel.reshape(pw2_kernel.shape[-2], pw2_kernel.shape[-1])
    y, mean, var = _fused_conv_module(
        x, ln_scale, ln_bias, w1a, b1a, w1b, b1b, dwk,
        dw_bias, bn_scale, bn_bias, pw2, pw2_bias, seed,
        int(t), int(k), _pad_lo_for(padding, int(k)), float(ln_eps),
        float(bn_eps), float(drop_rate), not deterministic, bool(interpret))
    return y, mean, var


def fused_conv_module_3d_dp(mesh, axis, x, ln_scale, ln_bias, pw1_kernel,
                            pw1_bias, dw_kernel, dw_bias, bn_scale, bn_bias,
                            pw2_kernel, pw2_bias, *, seed=None,
                            padding="same", ln_eps=1e-6, bn_eps=1e-5,
                            drop_rate=0.0, deterministic=True,
                            interpret=None):
    """Mesh-safe wrapper: batch sharded over `axis`, params replicated.

    BN statistics are GLOBAL over the batch, so per-shard sums are psummed
    before the mean/var glue — the sharded module equals the unsharded one
    bit-for-bit in expectation (matching GSPMD sync-BN on the unfused
    path). Implemented by running the stats phase per shard, psumming, and
    threading the global stats into a stats-fixed variant of the kernel.
    """
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(-1)[:1]

    n_shards = mesh.shape[axis]

    def body(x, ls, lb, pw1k, pw1b, dwk3, dwb, bs, bb, pw2k, pw2b, seed):
        idx = jax.lax.axis_index(axis)
        shard_seed = seed + (idx.astype(jnp.int32) + 1) * np.int32(0x68E31DA5)
        b, t, d = x.shape
        pw1 = pw1k.reshape(pw1k.shape[-2], pw1k.shape[-1])
        e = pw1.shape[1] // 2
        w1a, w1b = pw1[:, :e], pw1[:, e:]
        b1a, b1b = pw1b[:e], pw1b[e:]
        dwk = dwk3.reshape(dwk3.shape[0], dwk3.shape[-1])
        k = dwk.shape[0]
        pw2 = pw2k.reshape(pw2k.shape[-2], pw2k.shape[-1])
        y, mean, var = _fused_conv_dp_core(
            x, ls, lb, w1a, b1a, w1b, b1b, dwk, dwb,
            bs, bb, pw2, pw2b, shard_seed, int(t), int(k),
            _pad_lo_for(padding, int(k)), float(ln_eps), float(bn_eps),
            float(drop_rate), not deterministic, bool(interpret), axis,
            int(n_shards))
        return y, mean, var

    rep = P()
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis),) + (rep,) * 10 + (rep,),
        out_specs=(P(axis), rep, rep), check_vma=False)(
            x, ln_scale, ln_bias, pw1_kernel, pw1_bias, dw_kernel, dw_bias,
            bn_scale, bn_bias, pw2_kernel, pw2_bias, seed)


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17, 18, 19,
                                                    20, 21, 22, 23))
def _fused_conv_dp_core(x, ls, lb, w1a, b1a, w1b, b1b, dwk, dwb, bs, bb,
                        w2, b2, seed, t, k, pad_lo, ln_eps, bn_eps,
                        drop_rate, train, interpret, axis, n_shards):
    (y, mean, var), _ = _fused_conv_dp_fwd(
        x, ls, lb, w1a, b1a, w1b, b1b, dwk, dwb, bs, bb, w2, b2, seed,
        t, k, pad_lo, ln_eps, bn_eps, drop_rate, train, interpret, axis,
        n_shards)
    return y, mean, var


def _dp_stats(x, pre_args, t, k, pad_lo, ln_eps, interpret, axis, b, d, e):
    s1, s2 = pl.pallas_call(
        functools.partial(_stats_kernel, k=k, pad_lo=pad_lo, ln_eps=ln_eps),
        grid=(b,),
        in_specs=[_seq_spec(t, d)] + _param_specs(d, e, k),
        out_specs=[pl.BlockSpec((1, e), _const), pl.BlockSpec((1, e), _const)],
        out_shape=[jax.ShapeDtypeStruct((1, e), jnp.float32),
                   jax.ShapeDtypeStruct((1, e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(x, *pre_args)
    return jax.lax.psum(s1, axis), jax.lax.psum(s2, axis)


def _fused_conv_dp_fwd(x, ls, lb, w1a, b1a, w1b, b1b, dwk, dwb, bs, bb,
                       w2, b2, seed, t, k, pad_lo, ln_eps, bn_eps, drop_rate,
                       train, interpret, axis, n_shards):
    b, _, d = x.shape
    n = b * t
    e = w1a.shape[1]
    e_out = w2.shape[1]
    n_global = n * n_shards
    pre_args = (ls.reshape(1, d), lb.reshape(1, d), w1a, b1a.reshape(1, e),
                w1b, b1b.reshape(1, e), dwk, dwb.reshape(1, e))
    s1, s2 = _dp_stats(x, pre_args, t, k, pad_lo, ln_eps, interpret,
                       axis, b, d, e)
    mean = s1.reshape(e) / n_global
    var = jnp.maximum(s2.reshape(e) / n_global - mean * mean, 0.0)
    rstd = jax.lax.rsqrt(var + bn_eps)
    bn_args = (bs.reshape(1, e), bb.reshape(1, e), w2, b2.reshape(1, e_out))
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, pad_lo=pad_lo, ln_eps=ln_eps,
                          drop_rate=drop_rate, train=train,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,),
            in_specs=([_seq_spec(t, d),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((1, e), _const)]
                      + _param_specs(d, e, k) + _bn_pw2_specs(e, e_out)),
            out_specs=_seq_spec(t, e_out),
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, e_out), x.dtype),
        interpret=interpret,
    )(seed, x, mean.reshape(1, e), rstd.reshape(1, e), *pre_args, *bn_args)
    res = (x, ls, lb, w1a, b1a, w1b, b1b, dwk, dwb, bs, bb, w2, b2, seed,
           mean, rstd)
    return (y, mean, var), res


def _fused_conv_dp_bwd(t, k, pad_lo, ln_eps, bn_eps, drop_rate, train,
                       interpret, axis, n_shards, res, cts):
    g, _, _ = cts
    (x, ls, lb, w1a, b1a, w1b, b1b, dwk, dwb, bs, bb, w2, b2, seed,
     mean, rstd) = res
    b, _, d = x.shape
    n = b * t
    e = w1a.shape[1]
    e_out = w2.shape[1]
    n_global = n * n_shards
    g = g.astype(x.dtype)
    pre_args = (ls.reshape(1, d), lb.reshape(1, d), w1a, b1a.reshape(1, e),
                w1b, b1b.reshape(1, e), dwk, dwb.reshape(1, e))
    bn_args = (bs.reshape(1, e), bb.reshape(1, e), w2, b2.reshape(1, e_out))
    mean2, rstd2 = mean.reshape(1, e), rstd.reshape(1, e)

    dw2, db2, r1, r2 = pl.pallas_call(
        functools.partial(_bwd1_kernel, k=k, pad_lo=pad_lo, ln_eps=ln_eps,
                          drop_rate=drop_rate, train=train,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,),
            in_specs=([_seq_spec(t, d),
                       _seq_spec(t, e_out),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((1, e), _const)]
                      + _param_specs(d, e, k) + _bn_pw2_specs(e, e_out)),
            out_specs=[pl.BlockSpec((e, e_out), _const),
                       pl.BlockSpec((1, e_out), _const),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((1, e), _const)],
        ),
        out_shape=[jax.ShapeDtypeStruct((e, e_out), jnp.float32),
                   jax.ShapeDtypeStruct((1, e_out), jnp.float32),
                   jax.ShapeDtypeStruct((1, e), jnp.float32),
                   jax.ShapeDtypeStruct((1, e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, x, g, mean2, rstd2, *pre_args, *bn_args)

    # BN couples every token GLOBALLY: psum the two reductions.
    r1g = jax.lax.psum(r1, axis)
    r2g = jax.lax.psum(r2, axis)
    rn1 = r1g / n_global
    rn2 = r2g / n_global

    dx, dls, dlb, dw1a, db1a, dw1b, db1b, ddw = pl.pallas_call(
        functools.partial(_bwd2_kernel, k=k, pad_lo=pad_lo, ln_eps=ln_eps,
                          drop_rate=drop_rate, train=train,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(b,),
            in_specs=([_seq_spec(t, d),
                       _seq_spec(t, e_out),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((1, e), _const)]
                      + _param_specs(d, e, k) + _bn_pw2_specs(e, e_out)),
            out_specs=[_seq_spec(t, d),
                       pl.BlockSpec((1, d), _const),
                       pl.BlockSpec((1, d), _const),
                       pl.BlockSpec((d, e), _const),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((d, e), _const),
                       pl.BlockSpec((1, e), _const),
                       pl.BlockSpec((k, e), _const)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((d, e), jnp.float32),
                   jax.ShapeDtypeStruct((1, e), jnp.float32),
                   jax.ShapeDtypeStruct((d, e), jnp.float32),
                   jax.ShapeDtypeStruct((1, e), jnp.float32),
                   jax.ShapeDtypeStruct((k, e), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, x, g, mean2, rstd2, rn1, rn2, *pre_args, *bn_args)

    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    # ALL weight grads returned here must be PER-SHARD partial sums —
    # shard_map's transpose psums replicated-input cotangents across the
    # mesh axis. In particular the BN grads are the LOCAL r1/r2 (the
    # psummed r1g/r2g fed only the dc glue above); returning the global
    # sums would double-count by n_shards.
    return (dx, dls.reshape(d).astype(ls.dtype),
            dlb.reshape(d).astype(lb.dtype), dw1a.astype(w1a.dtype),
            db1a.reshape(e).astype(b1a.dtype), dw1b.astype(w1b.dtype),
            db1b.reshape(e).astype(b1b.dtype), ddw.astype(dwk.dtype),
            jnp.zeros_like(dwb),
            r2.reshape(e).astype(bs.dtype), r1.reshape(e).astype(bb.dtype),
            dw2.astype(w2.dtype), db2.reshape(e_out).astype(b2.dtype),
            dseed)


_fused_conv_dp_core.defvjp(_fused_conv_dp_fwd, _fused_conv_dp_bwd)
