# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Fused conformer attention module as Pallas kernels (fwd AND bwd).

Computes the whole AttentionModule body (ref: nnet/modules.py:291-339 with
the RelPos1dMultiHeadAttention core, nnet/attentions.py:215-323) with
activations resident in VMEM:

    h  = LN(x)                                   (eps 1e-6, f32 stats)
    q, k, v = h @ Wq + bq, h @ Wk + bk, h @ Wv + bv
    per head:  s = q_h k_h^T + relpos_factorized(q_h) + q_h . b_pos_h
               s = s / sqrt(dh) + key-padding mask (additive -1e9)
               o_h = softmax_f32(s) v_h
    y  = concat(o_h) @ Wout + bout               [dropout]
    out = y + x                                  (pre-norm residual)

The relative-position scores use the EXACT angle-difference factorization
of ops/attention.RelPos1dMultiHeadAttention._rel_scores_factorized (the
in-model default), so the kernel is numerically the same computation.

TPU-first head handling: the kernel NEVER slices or concatenates the lane
dimension at head boundaries (dh = 45/64/90 is not a 128-lane multiple).
Heads are expressed as full-width masked matmuls:

    s_h   = q @ (k * m_h)^T          (m_h zeroes other heads' lanes)
    acc  += softmax(s_h) @ (v * m_h) (head outputs merge IN PLACE)

and the per-head rel-pos projections arrive pre-masked from the caller
(ws_s/ws_c rows outside head h are zero), so `us = q @ ws_s[h]` needs no
slicing either. The extra zero-lane FLOPs are microseconds on the MXU;
what matters is that ~30 XLA dispatches per module (each a HBM round
trip at these tiny shapes) collapse into one VMEM-resident kernel per
direction — this bucket is latency-bound, not FLOP-bound (ROUND_NOTES
round-4 profile: ~5.6 us/op over ~4100 tiny fused ops).

Attention is per-sequence (no cross-batch coupling, unlike the conv
module's train BN), so forward and backward are ONE pallas_call each over
a (B,) grid: the backward recomputes the forward per row (storing only
the per-head softmax matrices transiently, ~H * T^2 f32 <= 1.5 MB at the
AVEC operating point) and accumulates weight grads across grid rows.

The caller-side construction of the masked per-head weights (ws_s =
pos_kernel[0::2]^T * head_mask etc.) stays OUTSIDE the custom_vjp: it is
linear, so jax transposes it automatically and pos_kernel/pos_bias get
exact gradients without manual fold-back.

Dropout (the trailing module dropout) regenerates its mask identically in
forward and backward from a per-row hardware-PRNG stream, exactly like
ops/pallas_ffn. Sharding: a pallas_call is opaque to GSPMD —
`fused_attention_module_3d_dp` wraps the kernel in shard_map (batch
sharded, params replicated; shard_map's transpose psums the replicated-
weight cotangents, and there are no cross-shard statistics to sync).
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avec_tpu.ops.pallas_conv_module import _dropout_mask, _seq_spec, _const
from avec_tpu.ops.pallas_ffn import _ln_f32

NEG_INF = -1e9  # ops/masks.NEG_INF — additive key-padding masking


# Head lane masks arrive as a precomputed (H, 1, d) input: building them
# in-kernel from iota comparisons produced a (1, d) i1 vector whose
# replicated->tiled relayout Mosaic rejects ("Invalid relayout: Non-
# singleton logical dimension is replicated in destination but not in
# source", v5e, jax 0.8).


def _proj(h, w_ref, b_ref, cdt):
    """Linear matching ops/layers.Linear numerics: dot in the compute
    dtype (f32 MXU accumulate), bias added post-cast."""
    y = jnp.dot(h, w_ref[:].astype(cdt), preferred_element_type=jnp.float32)
    return y.astype(cdt) + b_ref[:].astype(cdt)


def _head_scores(q, k, ws_ref, wc_ref, bh_ref, sin_ref, cos_ref, hm, head,
                 scale, ln, cdt):
    """One head's masked, scaled attention scores (T, T) in cdt, mirroring
    the unfused op order: bf16 score tensors summed, scaled, additive
    -1e9 mask, ready for f32 softmax."""
    t = q.shape[0]
    km = k * hm
    s_k = jnp.dot(q, km.T, preferred_element_type=jnp.float32).astype(cdt)
    us = jnp.dot(q, ws_ref[head].astype(cdt),
                 preferred_element_type=jnp.float32).astype(cdt)
    uc = jnp.dot(q, wc_ref[head].astype(cdt),
                 preferred_element_type=jnp.float32).astype(cdt)
    sin = sin_ref[:].astype(cdt)
    cos = cos_ref[:].astype(cdt)
    a1 = us * sin + uc * cos
    a2 = uc * sin - us * cos
    s_e = (jnp.dot(a1, cos.T, preferred_element_type=jnp.float32)
           + jnp.dot(a2, sin.T,
                     preferred_element_type=jnp.float32)).astype(cdt)
    qb = jnp.dot(q, bh_ref[head].T.astype(cdt),
                 preferred_element_type=jnp.float32).astype(cdt)  # (T, 1)
    s = ((s_k + s_e + qb).astype(jnp.float32) * scale).astype(cdt)
    # Arithmetic mask — NO booleans: any iota comparison here produces a
    # sublane-replicated i1 vector whose replicated->tiled relayout Mosaic
    # rejects (v5e, jax 0.8). clip(col - len + 1, 0, 1) is exactly the
    # indicator of col >= len on integer-valued floats.
    col = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1).astype(jnp.float32)
    ind = jnp.clip(col - ln.astype(jnp.float32) + 1.0, 0.0, 1.0)
    return s + (ind * NEG_INF).astype(cdt)


def _fwd_kernel(seed_ref, len_ref, x_ref, ls_ref, lb_ref, wq_ref, bq_ref,
                wk_ref, bk_ref, wv_ref, bv_ref, ws_ref, wc_ref, bh_ref,
                wo_ref, bo_ref, sin_ref, cos_ref, hm_ref, o_ref, *,
                num_heads, scale, ln_eps, drop_rate, train, residual,
                interpret):
    cdt = x_ref.dtype
    ln = len_ref[pl.program_id(0)]
    h, _, _ = _ln_f32(x_ref[0], ls_ref, lb_ref, ln_eps, cdt)
    q = _proj(h, wq_ref, bq_ref, cdt)
    k = _proj(h, wk_ref, bk_ref, cdt)
    v = _proj(h, wv_ref, bv_ref, cdt)
    t, d = q.shape
    acc = jnp.zeros((t, d), jnp.float32)
    for head in range(num_heads):
        hm = hm_ref[head].astype(cdt)
        s = _head_scores(q, k, ws_ref, wc_ref, bh_ref, sin_ref, cos_ref,
                         hm, head, scale, ln, cdt)
        att = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(cdt)
        acc = acc + jnp.dot(att, v * hm, preferred_element_type=jnp.float32)
    y = _proj(acc.astype(cdt), wo_ref, bo_ref, cdt).astype(jnp.float32)
    if train and drop_rate > 0.0:
        y = y * _dropout_mask(seed_ref, y.shape, 1.0 - drop_rate, interpret)
    y = y.astype(cdt)
    if residual:
        y = y + x_ref[0]
    o_ref[0, :, :] = y


def _bwd_kernel(seed_ref, len_ref, x_ref, g_ref, ls_ref, lb_ref, wq_ref,
                bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, ws_ref, wc_ref,
                bh_ref, wo_ref, bo_ref, sin_ref, cos_ref, hm_ref,
                dx_ref, dls_ref, dlb_ref, dwq_ref, dbq_ref, dwk_ref,
                dbk_ref, dwv_ref, dbv_ref, dws_ref, dwc_ref, dbh_ref,
                dwo_ref, dbo_ref, *,
                num_heads, scale, ln_eps, drop_rate, train, residual,
                interpret):
    cdt = x_ref.dtype
    ln = len_ref[pl.program_id(0)]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (dls_ref, dlb_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                    dwv_ref, dbv_ref, dws_ref, dwc_ref, dbh_ref, dwo_ref,
                    dbo_ref):
            ref[:] = jnp.zeros_like(ref)

    # Recompute the forward (per-row; nothing was saved to HBM).
    h, xhat, rstd = _ln_f32(x_ref[0], ls_ref, lb_ref, ln_eps, cdt)
    q = _proj(h, wq_ref, bq_ref, cdt)
    k = _proj(h, wk_ref, bk_ref, cdt)
    v = _proj(h, wv_ref, bv_ref, cdt)
    t, d = q.shape
    sin = sin_ref[:].astype(jnp.float32)
    cos = cos_ref[:].astype(jnp.float32)

    atts = []
    acc = jnp.zeros((t, d), jnp.float32)
    for head in range(num_heads):
        hm = hm_ref[head].astype(cdt)
        s = _head_scores(q, k, ws_ref, wc_ref, bh_ref, sin_ref, cos_ref,
                         hm, head, scale, ln, cdt)
        att = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        atts.append(att)
        acc = acc + jnp.dot(att.astype(cdt), v * hm,
                            preferred_element_type=jnp.float32)
    acc = acc.astype(cdt)

    g = g_ref[0].astype(jnp.float32)
    if train and drop_rate > 0.0:
        gy = g * _dropout_mask(seed_ref, g.shape, 1.0 - drop_rate, interpret)
    else:
        gy = g
    dbo_ref[:] += gy.sum(axis=0, keepdims=True)
    row = (((0,), (0,)), ((), ()))
    dwo_ref[:] += jax.lax.dot_general(acc, gy.astype(cdt),
                                      dimension_numbers=row,
                                      preferred_element_type=jnp.float32)
    dacc = jax.lax.dot_general(gy.astype(cdt), wo_ref[:].astype(cdt),
                               dimension_numbers=(((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dq = jnp.zeros((t, d), jnp.float32)
    dk = jnp.zeros((t, d), jnp.float32)
    dv = jnp.zeros((t, d), jnp.float32)
    for head in range(num_heads):
        hm = hm_ref[head].astype(jnp.float32)
        att = atts[head]
        vm = vf * hm
        datt = jnp.dot(dacc, vm.T, preferred_element_type=jnp.float32)
        dv = dv + jax.lax.dot_general(
            att, dacc, dimension_numbers=row,
            preferred_element_type=jnp.float32) * hm
        ds = att * (datt - (datt * att).sum(axis=-1, keepdims=True))
        ds = ds * scale  # d(pre-scale scores); masked cols have att=0 => 0
        dq = dq + jnp.dot(ds, kf * hm, preferred_element_type=jnp.float32)
        dk = dk + jax.lax.dot_general(
            ds, qf, dimension_numbers=row,
            preferred_element_type=jnp.float32) * hm
        # rel-pos factorization backward
        da1 = jnp.dot(ds, cos, preferred_element_type=jnp.float32)
        da2 = jnp.dot(ds, sin, preferred_element_type=jnp.float32)
        dus = da1 * sin - da2 * cos
        duc = da1 * cos + da2 * sin
        dq = dq + jnp.dot(dus, ws_ref[head].astype(jnp.float32).T,
                          preferred_element_type=jnp.float32)
        dq = dq + jnp.dot(duc, wc_ref[head].astype(jnp.float32).T,
                          preferred_element_type=jnp.float32)
        dws_ref[head] += jax.lax.dot_general(
            qf, dus, dimension_numbers=row,
            preferred_element_type=jnp.float32)
        dwc_ref[head] += jax.lax.dot_general(
            qf, duc, dimension_numbers=row,
            preferred_element_type=jnp.float32)
        # positional bias term: s += q . bh  (same value every key column)
        rs = ds.sum(axis=-1, keepdims=True)            # (T, 1)
        dq = dq + rs * bh_ref[head].astype(jnp.float32)
        dbh_ref[head] += (qf * rs).sum(axis=0, keepdims=True)

    dbq_ref[:] += dq.sum(axis=0, keepdims=True)
    dbk_ref[:] += dk.sum(axis=0, keepdims=True)
    dbv_ref[:] += dv.sum(axis=0, keepdims=True)
    hc = h
    dwq_ref[:] += jax.lax.dot_general(hc, dq.astype(cdt),
                                      dimension_numbers=row,
                                      preferred_element_type=jnp.float32)
    dwk_ref[:] += jax.lax.dot_general(hc, dk.astype(cdt),
                                      dimension_numbers=row,
                                      preferred_element_type=jnp.float32)
    dwv_ref[:] += jax.lax.dot_general(hc, dv.astype(cdt),
                                      dimension_numbers=row,
                                      preferred_element_type=jnp.float32)
    kt = (((1,), (1,)), ((), ()))
    dh = jnp.dot(dq.astype(cdt), wq_ref[:].astype(cdt).T,
                 preferred_element_type=jnp.float32)
    dh = dh + jnp.dot(dk.astype(cdt), wk_ref[:].astype(cdt).T,
                      preferred_element_type=jnp.float32)
    dh = dh + jnp.dot(dv.astype(cdt), wv_ref[:].astype(cdt).T,
                      preferred_element_type=jnp.float32)
    del kt

    dls_ref[:] += (dh * xhat).sum(axis=0, keepdims=True)
    dlb_ref[:] += dh.sum(axis=0, keepdims=True)
    dxhat = dh * ls_ref[:]
    dx = rstd * (dxhat - dxhat.mean(axis=-1, keepdims=True)
                 - xhat * (dxhat * xhat).mean(axis=-1, keepdims=True))
    if residual:
        dx = dx + g  # pre-dropout residual cotangent
    dx_ref[0, :, :] = dx.astype(cdt)


def _mat_specs(d, num_heads, half):
    """Param block specs shared by fwd and bwd, in input order after x
    (and g): ln scale/bias, Wq,bq,Wk,bk,Wv,bv, ws_s, ws_c, bh, Wout, bout,
    sin, cos."""
    return [
        pl.BlockSpec((1, d), _const), pl.BlockSpec((1, d), _const),
        pl.BlockSpec((d, d), _const), pl.BlockSpec((1, d), _const),
        pl.BlockSpec((d, d), _const), pl.BlockSpec((1, d), _const),
        pl.BlockSpec((d, d), _const), pl.BlockSpec((1, d), _const),
        pl.BlockSpec((num_heads, d, half), lambda i, *_: (0, 0, 0)),
        pl.BlockSpec((num_heads, d, half), lambda i, *_: (0, 0, 0)),
        pl.BlockSpec((num_heads, 1, d), lambda i, *_: (0, 0, 0)),
        pl.BlockSpec((d, d), _const), pl.BlockSpec((1, d), _const),
    ]


def _table_specs(t, half, num_heads, d):
    return [pl.BlockSpec((t, half), _const), pl.BlockSpec((t, half), _const),
            pl.BlockSpec((num_heads, 1, d), lambda i, *_: (0, 0, 0))]


@functools.partial(jax.custom_vjp, nondiff_argnums=(19, 20, 21, 22, 23, 24,
                                                    25))
def _fused_att_module(x, ls, lb, wq, bq, wk, bk, wv, bv, ws_s, ws_c, bh,
                      wo, bo, sin_t, cos_t, hm, lengths, seed,
                      num_heads, scale, ln_eps, drop_rate, train, residual,
                      interpret):
    y, _ = _fused_att_fwd(x, ls, lb, wq, bq, wk, bk, wv, bv, ws_s, ws_c,
                          bh, wo, bo, sin_t, cos_t, hm, lengths, seed,
                          num_heads, scale, ln_eps, drop_rate, train,
                          residual, interpret)
    return y


def _fused_att_fwd(x, ls, lb, wq, bq, wk, bk, wv, bv, ws_s, ws_c, bh, wo,
                   bo, sin_t, cos_t, hm, lengths, seed, num_heads, scale,
                   ln_eps, drop_rate, train, residual, interpret):
    b, t, d = x.shape
    half = sin_t.shape[1]
    args = (ls.reshape(1, d), lb.reshape(1, d), wq, bq.reshape(1, d),
            wk, bk.reshape(1, d), wv, bv.reshape(1, d), ws_s, ws_c, bh,
            wo, bo.reshape(1, d), sin_t, cos_t, hm)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, scale=scale,
                          ln_eps=ln_eps, drop_rate=drop_rate, train=train,
                          residual=residual, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(b,),
            in_specs=([_seq_spec(t, d)] + _mat_specs(d, num_heads, half)
                      + _table_specs(t, half, num_heads, d)),
            out_specs=_seq_spec(t, d),
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, d), x.dtype),
        interpret=interpret,
    )(seed, lengths, x, *args)
    res = (x, ls, lb, wq, bq, wk, bk, wv, bv, ws_s, ws_c, bh, wo, bo,
           sin_t, cos_t, hm, lengths, seed)
    return y, res


def _fused_att_bwd(num_heads, scale, ln_eps, drop_rate, train, residual,
                   interpret, res, g):
    (x, ls, lb, wq, bq, wk, bk, wv, bv, ws_s, ws_c, bh, wo, bo,
     sin_t, cos_t, hm, lengths, seed) = res
    b, t, d = x.shape
    half = sin_t.shape[1]
    g = g.astype(x.dtype)
    args = (ls.reshape(1, d), lb.reshape(1, d), wq, bq.reshape(1, d),
            wk, bk.reshape(1, d), wv, bv.reshape(1, d), ws_s, ws_c, bh,
            wo, bo.reshape(1, d), sin_t, cos_t, hm)
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads, scale=scale,
                          ln_eps=ln_eps, drop_rate=drop_rate, train=train,
                          residual=residual, interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(b,),
            in_specs=([_seq_spec(t, d), _seq_spec(t, d)]
                      + _mat_specs(d, num_heads, half)
                      + _table_specs(t, half, num_heads, d)),
            out_specs=[_seq_spec(t, d),
                       pl.BlockSpec((1, d), _const),
                       pl.BlockSpec((1, d), _const),
                       pl.BlockSpec((d, d), _const),
                       pl.BlockSpec((1, d), _const),
                       pl.BlockSpec((d, d), _const),
                       pl.BlockSpec((1, d), _const),
                       pl.BlockSpec((d, d), _const),
                       pl.BlockSpec((1, d), _const),
                       pl.BlockSpec((num_heads, d, half),
                                    lambda i, *_: (0, 0, 0)),
                       pl.BlockSpec((num_heads, d, half),
                                    lambda i, *_: (0, 0, 0)),
                       pl.BlockSpec((num_heads, 1, d),
                                    lambda i, *_: (0, 0, 0)),
                       pl.BlockSpec((d, d), _const),
                       pl.BlockSpec((1, d), _const)],
        ),
        out_shape=[jax.ShapeDtypeStruct((b, t, d), x.dtype),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32),
                   jax.ShapeDtypeStruct((num_heads, d, half), f32),
                   jax.ShapeDtypeStruct((num_heads, d, half), f32),
                   jax.ShapeDtypeStruct((num_heads, 1, d), f32),
                   jax.ShapeDtypeStruct((d, d), f32),
                   jax.ShapeDtypeStruct((1, d), f32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, lengths, x, g, *args)
    (dx, dls, dlb, dwq, dbq, dwk, dbk, dwv, dbv, dws, dwc, dbh, dwo,
     dbo) = outs
    fl0 = lambda a: np.zeros(a.shape, dtype=jax.dtypes.float0)
    return (dx, dls.reshape(d).astype(ls.dtype),
            dlb.reshape(d).astype(lb.dtype), dwq.astype(wq.dtype),
            dbq.reshape(d).astype(bq.dtype), dwk.astype(wk.dtype),
            dbk.reshape(d).astype(bk.dtype), dwv.astype(wv.dtype),
            dbv.reshape(d).astype(bv.dtype), dws.astype(ws_s.dtype),
            dwc.astype(ws_c.dtype), dbh.astype(bh.dtype),
            dwo.astype(wo.dtype), dbo.reshape(d).astype(bo.dtype),
            jnp.zeros_like(sin_t), jnp.zeros_like(cos_t),
            jnp.zeros_like(hm), fl0(lengths), fl0(seed))


_fused_att_module.defvjp(_fused_att_fwd, _fused_att_bwd)


def _pos_tables(t, dim_model, dtype):
    """sin/cos angle tables, identical to _rel_scores_factorized."""
    half = dim_model // 2
    pos = jnp.arange(t, dtype=jnp.float32)
    inv_freq = jnp.asarray(
        1.0 / (10000.0 ** (2.0 * np.arange(half) / dim_model)),
        dtype=jnp.float32)
    ang = pos[:, None] * inv_freq[None, :]
    return jnp.sin(ang).astype(dtype), jnp.cos(ang).astype(dtype)


def fused_attention_module_3d(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv,
                              pos_kernel, pos_bias, wo, bo, *, num_heads,
                              lengths=None, seed=None, drop_rate=0.0,
                              deterministic=True, residual=True,
                              ln_eps=1e-6, interpret=None):
    """Fused pre-norm rel-pos self-attention module on (B, T, D).

    Parameters are the flax child params of AttentionModule: LayerNorm_0
    scale/bias, the attention's query/key/value/output Linear kernels and
    biases, and pos_kernel (D, D) / pos_bias (D,). `lengths` (B,) int32
    gives the per-sequence valid key count (None = unmasked); keys at or
    beyond it get the additive -1e9 mask of ops/masks.apply_mask. Returns
    dropout(attention(LN(x))) + x (residual optional), exactly the module
    body with the factorized rel-pos path.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    b, t, d = x.shape
    dh = d // num_heads
    half = d // 2
    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    else:
        lengths = jnp.asarray(lengths, jnp.int32)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(-1)[:1]

    # Per-head masked rel-pos projections (linear in pos_kernel/pos_bias,
    # so autodiff transposes this construction exactly):
    #   ws_s[h, j, m] = pos_kernel[2m, j]  for j in head h's lanes, else 0.
    lane = jnp.arange(d)
    hmask = ((lane[None, :] // dh)
             == jnp.arange(num_heads)[:, None]).astype(pos_kernel.dtype)
    base_s = pos_kernel[0::2].T       # (d, half)
    base_c = pos_kernel[1::2].T
    ws_s = base_s[None] * hmask[:, :, None]
    ws_c = base_c[None] * hmask[:, :, None]
    bh = (pos_bias[None, :] * hmask).reshape(num_heads, 1, d)
    sin_t, cos_t = _pos_tables(t, d, x.dtype)
    hm = jax.lax.stop_gradient(hmask).reshape(num_heads, 1, d).astype(x.dtype)

    return _fused_att_module(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv,
        ws_s.astype(x.dtype), ws_c.astype(x.dtype), bh.astype(x.dtype),
        wo, bo, sin_t, cos_t, hm, lengths, seed,
        int(num_heads), float(1.0 / math.sqrt(dh)), float(ln_eps),
        float(drop_rate), not deterministic, bool(residual), bool(interpret))


def fused_attention_module_3d_dp(mesh, axis, x, ln_scale, ln_bias, wq, bq,
                                 wk, bk, wv, bv, pos_kernel, pos_bias, wo,
                                 bo, *, num_heads, lengths=None, seed=None,
                                 drop_rate=0.0, deterministic=True,
                                 residual=True, ln_eps=1e-6, interpret=None):
    """Mesh-safe wrapper: batch (and lengths) sharded over `axis`, params
    replicated. Attention has no cross-shard statistics; shard_map's
    transpose psums the replicated-weight cotangents, and the dropout
    seed is decorrelated per shard exactly like fused_ffn_3d_dp."""
    from jax.sharding import PartitionSpec as P

    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    b = x.shape[0]
    if lengths is None:
        lengths = jnp.full((b,), x.shape[1], jnp.int32)
    else:
        lengths = jnp.asarray(lengths, jnp.int32)
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(-1)[:1]

    def body(x, lengths, ls, lb, wq, bq, wk, bk, wv, bv, pk, pb, wo, bo,
             seed):
        idx = jax.lax.axis_index(axis)
        shard_seed = seed + (idx.astype(jnp.int32) + 1) * np.int32(0x68E31DA5)
        return fused_attention_module_3d(
            x, ls, lb, wq, bq, wk, bk, wv, bv, pk, pb, wo, bo,
            num_heads=num_heads, lengths=lengths, seed=shard_seed,
            drop_rate=drop_rate, deterministic=deterministic,
            residual=residual, ln_eps=ln_eps, interpret=interpret)

    rep = P()
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis)) + (rep,) * 12 + (rep,),
        out_specs=P(axis), check_vma=False)(
            x, lengths, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv,
            pos_kernel, pos_bias, wo, bo, seed)
