# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Fused conformer FFN as a single Pallas kernel (forward AND backward).

Computes the whole pre-norm FeedForwardModule body (ref:
nnet/modules.py:257-289) in one VMEM-resident pass per token tile:

    h = LN(x) * scale + bias
    u = h @ W1 + b1
    s = swish(u)            [inner dropout]
    y = s @ W2 + b2         [outer dropout]

Why: at conformer shapes ((B*T, d) with d in {180, 256, 360}, 4x expansion)
the unfused XLA program round-trips every intermediate through HBM — the
(N, 4d) swish activations alone are 2 x 6.9 MB per FFN forward and ~4 more
passes backward. The fused kernel reads x and the weights once, keeps all
intermediates in VMEM, and the backward recomputes them per-tile instead of
saving residuals (the only HBM residuals are x and the seed). The HBM
traffic per FFN drops from tens of MB to ~2x the tensor size + weights.

Dropout (drop_rate, the AVEC configs train with 0.1) is implemented
in-kernel with the TPU PRNG: forward and backward re-seed identically per
tile and regenerate identical masks, so no mask is ever materialized in
HBM. The masks come from a different stream than flax's `Dropout` (still
i.i.d. Bernoulli(keep)), which changes the random draw but not the
semantics; exactness tests therefore run deterministic.

Sharding caveat: a pallas_call is an opaque custom call — GSPMD cannot
partition it. Under a >1-device mesh the fused path must sit inside a
shard_map (or be disabled); `FeedForwardModule` only takes this path when
`AVEC_TPU_FUSED_FFN=1` is set explicitly (bench.py sets it after the
keep/reject measurement; the multichip dryrun does not).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Token-tile rows per grid step. 256 keeps the MXU M-dim full and the
# per-tile VMEM (x, h, u, s tiles + f32 weight/grad accumulators) under
# ~10 MB at the largest conformer width (d=360, F=1440).
_TILE_N = 256
# Odd multiplier decorrelates per-tile PRNG streams (fwd and bwd use the
# same formula, so masks match exactly). Must fit int32.
_SEED_STRIDE = 1103515245


def _round_up(x, m):
    return (x + m - 1) // m * m


def _ln_f32(x_ref, scale_ref, bias_ref, epsilon, cdt):
    """In-kernel LayerNorm matching ops/layers._ln_apply numerics:
    f32 stats, normalized value cast to the compute dtype BEFORE the
    affine transform. Returns (h, xhat_f32, rstd_f32, mean_f32)."""
    xf = x_ref[:].astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + epsilon)
    xhat = (xf - mean) * rstd
    h = (xhat.astype(cdt) * scale_ref[:].astype(cdt)
         + bias_ref[:].astype(cdt))
    return h, xhat, rstd


def _mix32(x):
    """murmur3 finalizer: a full-avalanche 32-bit mixer in plain vector
    ops (used only on the interpret path, where the TPU PRNG primitives
    have no CPU lowering)."""
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> np.uint32(13))
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> np.uint32(16))
    return x


def _dropout_masks(seed_ref, shapes, keep_rate, interpret):
    """Seed once per tile, then draw masks in a FIXED order (the backward
    regenerates the identical stream). Returns f32 multiplier arrays
    (0 or 1/keep_rate) for each requested shape. On TPU the masks come
    from the hardware PRNG; in interpret mode (CPU tests) from a
    counter-based hash — different streams, same Bernoulli semantics and
    the same fwd==bwd regeneration guarantee."""
    thr = np.uint32(min(int(keep_rate * float(2 ** 32)), 2 ** 32 - 1))
    inv_keep = np.float32(1.0 / keep_rate)
    outs = []
    if interpret:
        base = (seed_ref[0].astype(jnp.uint32)
                + jnp.uint32(pl.program_id(0)) * np.uint32(_SEED_STRIDE))
        for draw, shape in enumerate(shapes):
            flat = (jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
                    * np.uint32(shape[1])
                    + jax.lax.broadcasted_iota(jnp.uint32, shape, 1))
            bits = _mix32(flat ^ _mix32(base + np.uint32(
                (draw + 1) * 0x9E3779B9 % (2 ** 32))))
            outs.append(jnp.where(bits < thr, inv_keep, np.float32(0.0)))
        return outs
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * _SEED_STRIDE)
    for shape in shapes:
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        outs.append(jnp.where(bits < thr, inv_keep, np.float32(0.0)))
    return outs


def _swish_f32(u):
    sig = jax.nn.sigmoid(u)
    return u * sig, sig


def _ffn_fwd_kernel(seed_ref, x_ref, scale_ref, bias_ref, w1_ref, b1_ref,
                    w2_ref, b2_ref, o_ref, *, epsilon, drop_rate, train,
                    interpret):
    cdt = x_ref.dtype
    if train and drop_rate > 0.0:
        m_inner, m_outer = _dropout_masks(
            seed_ref, [(x_ref.shape[0], w1_ref.shape[1]), x_ref.shape],
            1.0 - drop_rate, interpret)
    h, _, _ = _ln_f32(x_ref, scale_ref, bias_ref, epsilon, cdt)
    u = jnp.dot(h, w1_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + b1_ref[:]
    s, _ = _swish_f32(u)
    if train and drop_rate > 0.0:
        s = s * m_inner
    y = jnp.dot(s.astype(cdt), w2_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + b2_ref[:]
    if train and drop_rate > 0.0:
        y = y * m_outer
    o_ref[:] = y.astype(cdt)


def _ffn_bwd_kernel(seed_ref, x_ref, g_ref, scale_ref, bias_ref, w1_ref,
                    b1_ref, w2_ref, b2_ref, dx_ref, dscale_ref, dbias_ref,
                    dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                    epsilon, drop_rate, train, interpret):
    cdt = x_ref.dtype
    use_drop = train and drop_rate > 0.0
    if use_drop:
        # SAME seed and draw order as the forward -> identical masks.
        m_inner, m_outer = _dropout_masks(
            seed_ref, [(x_ref.shape[0], w1_ref.shape[1]), x_ref.shape],
            1.0 - drop_rate, interpret)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dscale_ref[:] = jnp.zeros_like(dscale_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    # Recompute the forward for this tile (cheaper than saving residuals:
    # the only HBM reads are x, g and the weights).
    h, xhat, rstd = _ln_f32(x_ref, scale_ref, bias_ref, epsilon, cdt)
    u = jnp.dot(h, w1_ref[:].astype(cdt),
                preferred_element_type=jnp.float32) + b1_ref[:]
    s, sig = _swish_f32(u)
    if use_drop:
        sd = s * m_inner
    else:
        sd = s

    g = g_ref[:].astype(jnp.float32)
    if use_drop:
        g = g * m_outer
    db2_ref[:] += g.sum(axis=0, keepdims=True)
    row = (((0,), (0,)), ((), ()))  # contract over the token rows
    dw2_ref[:] += jax.lax.dot_general(
        sd.astype(cdt), g.astype(cdt), dimension_numbers=row,
        preferred_element_type=jnp.float32)
    ds = jax.lax.dot_general(
        g.astype(cdt), w2_ref[:].astype(cdt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    if use_drop:
        ds = ds * m_inner
    # d(swish)/du = sig + u * sig * (1 - sig)
    du = ds * (sig + u * sig * (1.0 - sig))
    db1_ref[:] += du.sum(axis=0, keepdims=True)
    dw1_ref[:] += jax.lax.dot_general(
        h.astype(cdt), du.astype(cdt), dimension_numbers=row,
        preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(
        du.astype(cdt), w1_ref[:].astype(cdt),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dscale_ref[:] += (dh * xhat).sum(axis=0, keepdims=True)
    dbias_ref[:] += dh.sum(axis=0, keepdims=True)
    dxhat = dh * scale_ref[:]
    dx = rstd * (dxhat - dxhat.mean(axis=-1, keepdims=True)
                 - xhat * (dxhat * xhat).mean(axis=-1, keepdims=True))
    dx_ref[:] = dx.astype(cdt)


def _pad_rows(a, n_pad):
    n = a.shape[0]
    if n == n_pad:
        return a
    return jnp.pad(a, ((0, n_pad - n), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_ffn(x, scale, bias, w1, b1, w2, b2, seed,
              epsilon, drop_rate, train, interpret):
    """Fused FFN on (N, D) tokens. Params are the f32 flax params
    (scale/bias (D,), w1 (D, F), b1 (F,), w2 (F, D), b2 (D,)); seed is a
    (1,) int32 array (ignored unless train and drop_rate > 0)."""
    y, _ = _fused_ffn_fwd(x, scale, bias, w1, b1, w2, b2, seed,
                          epsilon, drop_rate, train, interpret)
    return y


def _call_specs(n_tiles, d, f):
    # PrefetchScalarGridSpec index maps receive the scalar-prefetch
    # refs after the grid indices.
    const = lambda i, *_: (0, 0)
    tile = lambda i, *_: (i, 0)
    return dict(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE_N, d), tile),
            pl.BlockSpec((1, d), const),       # ln scale
            pl.BlockSpec((1, d), const),       # ln bias
            pl.BlockSpec((d, f), const),       # w1
            pl.BlockSpec((1, f), const),       # b1
            pl.BlockSpec((f, d), const),       # w2
            pl.BlockSpec((1, d), const),       # b2
        ],
    )


def _fused_ffn_fwd(x, scale, bias, w1, b1, w2, b2, seed,
                   epsilon, drop_rate, train, interpret):
    n, d = x.shape
    f = w1.shape[1]
    n_pad = _round_up(n, _TILE_N)
    xp = _pad_rows(x, n_pad)
    args = (scale.reshape(1, d), bias.reshape(1, d), w1,
            b1.reshape(1, f), w2, b2.reshape(1, d))
    sp = _call_specs(n_pad // _TILE_N, d, f)
    y = pl.pallas_call(
        functools.partial(_ffn_fwd_kernel, epsilon=epsilon,
                          drop_rate=drop_rate, train=train,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=sp["grid"], in_specs=sp["in_specs"],
            out_specs=pl.BlockSpec((_TILE_N, d), lambda i, *_: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, d), x.dtype),
        interpret=interpret,
    )(seed, xp, *args)
    return y[:n], (x, scale, bias, w1, b1, w2, b2, seed)


def _fused_ffn_bwd(epsilon, drop_rate, train, interpret, res, g):
    x, scale, bias, w1, b1, w2, b2, seed = res
    n, d = x.shape
    f = w1.shape[1]
    n_pad = _round_up(n, _TILE_N)
    xp = _pad_rows(x, n_pad)
    gp = _pad_rows(g.astype(x.dtype), n_pad)
    args = (scale.reshape(1, d), bias.reshape(1, d), w1,
            b1.reshape(1, f), w2, b2.reshape(1, d))
    sp = _call_specs(n_pad // _TILE_N, d, f)
    const = lambda i, *_: (0, 0)
    in_specs = [sp["in_specs"][0]] + sp["in_specs"]  # x tile, g tile, params
    dx, dscale, dbias, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, epsilon=epsilon,
                          drop_rate=drop_rate, train=train,
                          interpret=interpret),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=sp["grid"], in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((_TILE_N, d), lambda i, *_: (i, 0)),
                pl.BlockSpec((1, d), const),
                pl.BlockSpec((1, d), const),
                pl.BlockSpec((d, f), const),
                pl.BlockSpec((1, f), const),
                pl.BlockSpec((f, d), const),
                pl.BlockSpec((1, d), const),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, d), x.dtype),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(seed, xp, gp, *args)
    dseed = np.zeros(seed.shape, dtype=jax.dtypes.float0)
    return (dx[:n], dscale.reshape(d).astype(scale.dtype),
            dbias.reshape(d).astype(bias.dtype), dw1.astype(w1.dtype),
            db1.reshape(f).astype(b1.dtype), dw2.astype(w2.dtype),
            db2.reshape(d).astype(b2.dtype), dseed)


fused_ffn.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


def fused_ffn_3d_dp(mesh, axis, x, scale, bias, w1, b1, w2, b2, *,
                    seed=None, epsilon=1e-6, drop_rate=0.0,
                    deterministic=True, interpret=None):
    """Mesh-safe fused FFN: the pallas_call is opaque to GSPMD, so under a
    >1-device mesh the kernel must run per-shard. This wraps fused_ffn_3d
    in jax.shard_map with the batch dim sharded over `axis` and the params
    replicated — shard_map's transpose inserts the weight-grad psum, and
    the dropout seed is decorrelated per shard (seed + axis_index * odd)
    so shards never reuse a tile PRNG stream."""
    from jax.sharding import PartitionSpec as P

    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(-1)[:1]

    def body(x, scale, bias, w1, b1, w2, b2, seed):
        idx = jax.lax.axis_index(axis)
        shard_seed = seed + (idx.astype(jnp.int32) + 1) * np.int32(0x68E31DA5)
        return fused_ffn_3d(x, scale, bias, w1, b1, w2, b2, seed=shard_seed,
                            epsilon=epsilon, drop_rate=drop_rate,
                            deterministic=deterministic, interpret=interpret)

    rep = P()
    # check_vma=False: pallas_call out_shapes carry no varying-mesh-axes
    # annotation, which the jax>=0.8 vma checker requires otherwise.
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), rep, rep, rep, rep, rep, rep, rep),
        out_specs=P(axis), check_vma=False)(x, scale, bias, w1, b1, w2, b2,
                                            seed)


def fused_ffn_3d(x, scale, bias, w1, b1, w2, b2, *, seed=None,
                 epsilon=1e-6, drop_rate=0.0, deterministic=True,
                 interpret=None):
    """(B, T, D) convenience wrapper: flattens tokens, pads to the tile
    size and restores the shape. `seed` is any int32 scalar/array (only
    read when training with dropout)."""
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    b, t, d = x.shape
    if seed is None:
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape(-1)[:1]
    y = fused_ffn(x.reshape(b * t, d), scale, bias, w1, b1, w2, b2, seed,
                  float(epsilon), float(drop_rate), not deterministic,
                  bool(interpret))
    return y.reshape(b, t, d)
