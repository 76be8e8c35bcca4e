# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Pallas TPU flash attention for relative-position self-attention.

The factorized rel-pos decomposition (ops/attention.py) turns the reference's
skewed relative attention (nnet/attentions.py:215-323) into plain
scores = Q' K'^T with augmented features

    Q' = [Q, A1, A2, qb]      (T, d + D + 1)
    K' = [K, cos_t, sin_t, 1] (T, d + D + 1)

so a standard online-softmax (flash) kernel computes the whole layer without
materializing any (T, T) or (T, 2T-1) tensor in HBM: per (batch*head, q-block)
grid cell, K'/V live in VMEM and the kernel streams key blocks, carrying the
running max / normalizer / weighted accumulator. Padding is handled by key
masking from the true length.

This is the long-sequence path (16 s audio at the 50 Hz stage -> T ~ 800+,
"regular"/non-patch attention); at AVEC's short post-stride lengths the XLA
skew path is faster, so callers opt in via `use_flash`. Measured on v5e-1 at
B=8, H=4, T=1600, D=360 (bf16): 5.2 ms/layer vs 23.5 ms for the XLA skew
path (4.5x), max abs output diff 2.4e-4.

Both directions are Pallas: the forward carries a lane-replicated lse
residual and `_flash_bwd` computes dq/dk/dv (plus the augmented-feature
gradients for the rel-pos columns) with the same streaming structure, so
training never materializes a (T, T) tensor either. Training eligibility is
gated on attn_drop_rate == 0 (all AVEC configs).
"""

import functools
import math
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _flash_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k,
                  seq_len, scale):
    """One (batch*head, q-block) cell: online softmax over key blocks.

    q_ref: (1, block_q, da) VMEM; k_ref: (1, T, da); v_ref: (1, T, dv);
    len_ref: SMEM (B*H,) true sequence lengths; o_ref: (1, block_q, dv);
    lse_ref: (1, block_q, 128) per-row log-sum-exp (the backward residual).

    lse is carried with a lane-replicated 128-wide last axis: Mosaic
    requires the last two block dims to be (8k, 128k) (or match the array),
    so a plain (1, block_q) block is unlowerable — this crashed on real TPU
    while interpret-mode tests passed. (bh, t, 128) costs 128x a flat
    vector (17 MB at BH=64/T=512, ~20 us of HBM) but needs NO transposes:
    the kernel-side value is naturally (block_q, 1) in sublanes, so writes
    are a lane broadcast and reads are a lane-0 slice.
    """
    q = q_ref[0].astype(jnp.float32) * scale
    block_q, da = q.shape
    dv = v_ref.shape[-1]
    num_kb = seq_len // block_k

    valid_len = len_ref[pl.program_id(0)]

    def body(kb, carry):
        m_prev, l_prev, acc = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        # Key padding mask from the true length.
        col = kb * block_k + lax.broadcasted_iota(jnp.int32,
                                                  (block_q, block_k), 1)
        s = jnp.where(col < valid_len, s, NEG_INF)

        m_new = jnp.maximum(m_prev, s.max(axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, dv), jnp.float32)
    m, l, acc = lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    lse = m + jnp.log(jnp.maximum(l, 1e-30))  # (block_q, 1)
    lse_ref[0] = jnp.broadcast_to(lse, (block_q, 128))


def _flash_forward(q_aug, k_aug, v, lengths, scale, block_q, block_k,
                   interpret):
    """Padded flash forward; returns (out (BH, Tp, dvp), lse (BH, Tp)) plus
    the padded operands for the backward."""
    b, h, t, da = q_aug.shape
    dv = v.shape[-1]

    t_pad = _round_up(t, max(block_q, block_k))
    da_pad = _round_up(da, 128)
    dv_pad = _round_up(dv, 128)
    q_aug = jnp.pad(q_aug, ((0, 0), (0, 0), (0, t_pad - t), (0, da_pad - da)))
    k_aug = jnp.pad(k_aug, ((0, 0), (0, 0), (0, t_pad - t), (0, da_pad - da)))
    v = jnp.pad(v, ((0, 0), (0, 0), (0, t_pad - t), (0, dv_pad - dv)))

    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    # One scalar per (b, h) grid row, prefetched to SMEM.
    len_bh = jnp.repeat(lengths.astype(jnp.int32), h)

    q3 = q_aug.reshape(b * h, t_pad, da_pad)
    k3 = k_aug.reshape(b * h, t_pad, da_pad)
    v3 = v.reshape(b * h, t_pad, dv_pad)

    grid = (b * h, t_pad // block_q)
    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               seq_len=t_pad, scale=scale)

    out, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, da_pad),
                             lambda bh, qb, lens: (bh, qb, 0)),
                pl.BlockSpec((1, t_pad, da_pad),
                             lambda bh, qb, lens: (bh, 0, 0)),
                pl.BlockSpec((1, t_pad, dv_pad),
                             lambda bh, qb, lens: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, dv_pad),
                             lambda bh, qb, lens: (bh, qb, 0)),
                pl.BlockSpec((1, block_q, 128),
                             lambda bh, qb, lens: (bh, qb, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b * h, t_pad, dv_pad), v.dtype),
            jax.ShapeDtypeStruct((b * h, t_pad, 128), jnp.float32),
        ],
        interpret=interpret,
    )(len_bh, q3, k3, v3)
    return out, lse, (q3, k3, v3, len_bh, t_pad, da_pad, dv_pad)


def flash_attention(q_aug: jnp.ndarray, k_aug: jnp.ndarray, v: jnp.ndarray,
                    lengths: Optional[jnp.ndarray] = None, scale: float = 1.0,
                    block_q: int = 128, block_k: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    """Flash attention over augmented features.

    q_aug, k_aug: (B, H, T, da); v: (B, H, T, dv); lengths: (B,) true key
    lengths (None = all valid). Returns (B, H, T, dv) fp32-accumulated
    attention in v's dtype.
    """
    b, h, t, _ = q_aug.shape
    dv = v.shape[-1]
    out, _, (_, _, _, _, t_pad, _, dv_pad) = _flash_forward(
        q_aug, k_aug, v, lengths, scale, block_q, block_k, interpret)
    return out.reshape(b, h, t_pad, dv_pad)[:, :, :t, :dv]


def _xla_attention_reference(q_aug, k_aug, v, lengths, scale):
    """Plain-XLA equivalent of the flash kernel (used for the backward)."""
    t = q_aug.shape[2]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q_aug.astype(jnp.float32),
                        k_aug.astype(jnp.float32)) * scale
    if lengths is not None:
        col = lax.broadcasted_iota(jnp.int32, (1, 1, 1, t), 3)
        scores = jnp.where(col < lengths[:, None, None, None], scores, NEG_INF)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p,
                      v.astype(jnp.float32)).astype(v.dtype)


def _flash_bwd_dq_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                         delta_ref, dq_ref, *, block_k, seq_len, scale):
    """dq for one (batch*head, q-block) cell.

    ds = p * (do @ v^T - delta); dq = scale * ds @ k, streaming key blocks.
    Rows at/after the true length are zeroed (their lse is degenerate and
    their true loss gradient is zero — padded positions never reach the
    masked CTC losses).
    """
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][:, 0:1]      # lane-replicated (block_q, 128) -> col 0
    delta = delta_ref[0][:, 0:1]
    block_q, da = q.shape
    valid_len = len_ref[pl.program_id(0)]
    row = pl.program_id(1) * block_q + lax.broadcasted_iota(
        jnp.int32, (block_q, 1), 0)
    row_ok = row < valid_len
    num_kb = seq_len // block_k

    def body(kb, acc):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = kb * block_k + lax.broadcasted_iota(jnp.int32,
                                                  (block_q, block_k), 1)
        p = jnp.where(jnp.logical_and(col < valid_len, row_ok),
                      jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return acc + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    acc0 = jnp.zeros((block_q, da), jnp.float32)
    acc = lax.fori_loop(0, num_kb, body, acc0)
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(len_ref, q_ref, k_ref, v_ref, do_ref, lse_ref,
                          delta_ref, dk_ref, dv_ref, *, block_q, seq_len,
                          scale):
    """dk/dv for one (batch*head, k-block) cell, streaming query blocks.

    dv = p^T @ do;  dk = scale * ds^T @ q.
    """
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    block_k, da = k.shape
    dv_width = v.shape[-1]
    valid_len = len_ref[pl.program_id(0)]
    col = pl.program_id(1) * block_k + lax.broadcasted_iota(
        jnp.int32, (1, block_k), 1)
    col_ok = col < valid_len
    num_qb = seq_len // block_q

    def body(qb, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * block_q, block_q), :][:, 0:1]
        delta = delta_ref[0, pl.ds(qb * block_q, block_q), :][:, 0:1]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        row = qb * block_q + lax.broadcasted_iota(jnp.int32,
                                                  (block_q, 1), 0)
        p = jnp.where(jnp.logical_and(row < valid_len, col_ok),
                      jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dv_acc = dv_acc + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    dk0 = jnp.zeros((block_k, da), jnp.float32)
    dv0 = jnp.zeros((block_k, dv_width), jnp.float32)
    dk_acc, dv_acc = lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = (dk_acc * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention_trainable(q_aug, k_aug, v, lengths, scale,
                              interpret=False):
    """Differentiable flash attention: Pallas forward AND Pallas flash
    backward — no (T, T) tensor ever reaches HBM in either direction."""
    return flash_attention(q_aug, k_aug, v, lengths=lengths, scale=scale,
                           interpret=interpret)


def _flash_fwd(q_aug, k_aug, v, lengths, scale, interpret):
    b, h, t, da = q_aug.shape
    dv = v.shape[-1]
    out, lse, (q3, k3, v3, len_bh, t_pad, da_pad, dv_pad) = _flash_forward(
        q_aug, k_aug, v, lengths, scale, 128, 128, interpret)
    primal = out.reshape(b, h, t_pad, dv_pad)[:, :, :t, :dv]
    res = (q3, k3, v3, len_bh, out, lse, (b, h, t, da, dv))
    return primal, res


def _flash_bwd(scale, interpret, res, g):
    q3, k3, v3, len_bh, out, lse, (b, h, t, da, dv) = res
    bh, t_pad, dv_pad = v3.shape
    da_pad = q3.shape[-1]
    block_q = block_k = 128

    g3 = jnp.pad(g, ((0, 0), (0, 0), (0, t_pad - t), (0, dv_pad - dv)))
    g3 = g3.reshape(bh, t_pad, dv_pad).astype(v3.dtype)
    # delta_i = sum_d dO_i[d] * O_i[d] (rowwise, fused in XLA);
    # lane-replicated to 128 like lse (see _flash_kernel docstring).
    delta = (g3.astype(jnp.float32) * out.astype(jnp.float32)).sum(axis=-1)
    delta = jnp.broadcast_to(delta[..., None], (bh, t_pad, 128))

    common_specs = [
        pl.BlockSpec((1, t_pad, da_pad), lambda i, j, lens: (i, 0, 0)),
        pl.BlockSpec((1, t_pad, dv_pad), lambda i, j, lens: (i, 0, 0)),
    ]
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k,
                          seq_len=t_pad, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t_pad // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, da_pad),
                             lambda i, j, lens: (i, j, 0)),
                common_specs[0],  # k (full)
                common_specs[1],  # v (full)
                pl.BlockSpec((1, block_q, dv_pad),
                             lambda i, j, lens: (i, j, 0)),
                pl.BlockSpec((1, block_q, 128), lambda i, j, lens: (i, j, 0)),
                pl.BlockSpec((1, block_q, 128), lambda i, j, lens: (i, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, da_pad),
                                   lambda i, j, lens: (i, j, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, da_pad), q3.dtype),
        interpret=interpret,
    )(len_bh, q3, k3, v3, g3, lse, delta)

    dk, dvv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q,
                          seq_len=t_pad, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh, t_pad // block_k),
            in_specs=[
                pl.BlockSpec((1, t_pad, da_pad),
                             lambda i, j, lens: (i, 0, 0)),  # q (full)
                pl.BlockSpec((1, block_k, da_pad),
                             lambda i, j, lens: (i, j, 0)),
                pl.BlockSpec((1, block_k, dv_pad),
                             lambda i, j, lens: (i, j, 0)),
                pl.BlockSpec((1, t_pad, dv_pad),
                             lambda i, j, lens: (i, 0, 0)),  # do (full)
                pl.BlockSpec((1, t_pad, 128), lambda i, j, lens: (i, 0, 0)),
                pl.BlockSpec((1, t_pad, 128), lambda i, j, lens: (i, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, da_pad),
                             lambda i, j, lens: (i, j, 0)),
                pl.BlockSpec((1, block_k, dv_pad),
                             lambda i, j, lens: (i, j, 0)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, da_pad), k3.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, dv_pad), v3.dtype),
        ],
        interpret=interpret,
    )(len_bh, q3, k3, v3, g3, lse, delta)

    # Crop padding back to the caller's shapes.
    def crop(x, width):
        return x.reshape(b, h, t_pad, x.shape[-1])[:, :, :t, :width]

    return crop(dq, da), crop(dk, da), crop(dvv, dv), None


flash_attention_trainable.defvjp(_flash_fwd, _flash_bwd)


def rel_pos_flash_attention(q, k, v, pos_kernel, pos_bias, dim_model,
                            num_heads, lengths=None, interpret: bool = False):
    """Full rel-pos self-attention via the factorized flash path.

    q, k, v: (B, H, T, d) post-projection heads (as in
    RelPos1dMultiHeadAttention.forward_qkv). pos_kernel (D, D), pos_bias (D,)
    are the pos_layer parameters. Exactly equivalent (up to fp) to the
    reference skew computation for full-context attention.
    """
    b, h, t, d = q.shape
    half = dim_model // 2
    dtype = q.dtype

    w = pos_kernel.reshape(dim_model, num_heads, d).astype(dtype)
    ws, wc = w[0::2], w[1::2]
    bh_bias = pos_bias.reshape(num_heads, d).astype(dtype)

    us = jnp.einsum("bhid,mhd->bhim", q, ws)
    uc = jnp.einsum("bhid,mhd->bhim", q, wc)

    pos = jnp.arange(t, dtype=jnp.float32)
    inv_freq = jnp.asarray(1.0 / (10000.0 ** (2.0 * np.arange(half) / dim_model)),
                           dtype=jnp.float32)
    ang = pos[:, None] * inv_freq[None, :]
    sin_t = jnp.sin(ang).astype(dtype)
    cos_t = jnp.cos(ang).astype(dtype)

    a1 = us * sin_t + uc * cos_t
    a2 = uc * sin_t - us * cos_t
    qb = jnp.einsum("bhid,hd->bhi", q, bh_bias)[..., None]

    ones = jnp.ones((b, h, t, 1), dtype)
    bcast = lambda x: jnp.broadcast_to(x[None, None], (b, h, t, half))
    q_aug = jnp.concatenate([q, a1, a2, qb], axis=-1)
    k_aug = jnp.concatenate([k, bcast(cos_t), bcast(sin_t), ones], axis=-1)

    scale = 1.0 / math.sqrt(d)
    return flash_attention_trainable(q_aug, k_aug, v, lengths, scale,
                                     interpret)
