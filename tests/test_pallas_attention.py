"""Pallas flash rel-pos attention vs the XLA paths (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avec_tpu.ops.attention import RelPos1dMultiHeadAttention, _split_heads
from avec_tpu.ops.masks import padding_mask
from avec_tpu.ops.pallas_attention import flash_attention, rel_pos_flash_attention


def test_flash_attention_matches_softmax():
    rng = np.random.RandomState(0)
    b, h, t, d = 2, 2, 64, 32
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    lengths = jnp.array([64, 40])

    out = flash_attention(q, k, v, lengths=lengths, scale=0.3,
                          block_q=32, block_k=32, interpret=True)

    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) * 0.3
    mask = padding_mask(lengths, t)
    scores = jnp.where(mask, scores, -1e30)
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(scores, axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_rel_pos_flash_matches_module():
    """Flash factorized path == the module's skew path (valid rows only)."""
    d_model, h, t = 32, 4, 48
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, t, d_model).astype(np.float32))
    lengths = jnp.array([48, 30])
    mask = padding_mask(lengths, t)

    att = RelPos1dMultiHeadAttention(dim_model=d_model, num_heads=h,
                                     factorized=False, output_proj=False)
    variables = att.init({"params": jax.random.PRNGKey(0)}, x, mask)
    want = att.apply(variables, x, mask)  # (B, T, D)

    params = variables["params"]
    q = _split_heads(att.bind(variables).query_layer(x), h, d_model // h)
    k = _split_heads(att.bind(variables).key_layer(x), h, d_model // h)
    v = _split_heads(att.bind(variables).value_layer(x), h, d_model // h)
    out = rel_pos_flash_attention(
        q, k, v, params["pos_kernel"], params["pos_bias"], d_model, h,
        lengths=lengths, interpret=True)
    got = out.transpose(0, 2, 1, 3).reshape(2, t, d_model)

    w = np.asarray(want)
    g = np.asarray(got)
    # Compare only valid query rows (padded-query rows see all-masked keys:
    # the reference softmaxes uniform garbage there, flash outputs ~0).
    np.testing.assert_allclose(g[0], w[0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(g[1, :30], w[1, :30], rtol=2e-3, atol=2e-3)


def test_flash_full_mask_falls_back_to_xla():
    """A full (B, 1, T, T) mask carries structure the flash kernel cannot
    represent; use_flash must fall back to the exact XLA path (it used to
    silently treat all keys as valid)."""
    d_model, h, t = 32, 4, 40
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, t, d_model).astype(np.float32))
    lengths = jnp.array([40, 24])
    pad = padding_mask(lengths, t)  # (B, 1, 1, T)
    # Band-limited full mask: +/-8 frames of context AND padding.
    q_idx = jnp.arange(t)[:, None]
    k_idx = jnp.arange(t)[None, :]
    band = (jnp.abs(q_idx - k_idx) <= 8)[None, None]  # (1, 1, T, T)
    full_mask = jnp.logical_and(band, pad)  # (B, 1, T, T)
    assert full_mask.shape == (2, 1, t, t)

    ref = RelPos1dMultiHeadAttention(dim_model=d_model, num_heads=h,
                                     use_flash=False)
    fl = RelPos1dMultiHeadAttention(dim_model=d_model, num_heads=h,
                                    use_flash=True)
    variables = ref.init({"params": jax.random.PRNGKey(0)}, x, full_mask)
    want = ref.apply(variables, x, full_mask)
    got = fl.apply(variables, x, full_mask)  # must NOT ignore the band
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_flash_trainable_grads_match_xla():
    """Pallas flash backward (dq/dk/dv kernels) == grads of the pure XLA
    reference. The loss reads only valid rows (padded query rows never
    reach the masked CTC losses in real models; the reference softmaxes
    fully-masked rows into uniform garbage there while the kernel zeroes
    them, so an unmasked loss would compare garbage contributions)."""
    from avec_tpu.ops.pallas_attention import (
        _xla_attention_reference,
        flash_attention_trainable,
    )

    rng = np.random.RandomState(3)
    b, h, t, d = 2, 2, 32, 16
    q = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    lengths = jnp.array([24, 32])
    w = jnp.asarray(rng.randn(b, h, t, d).astype(np.float32))
    row_mask = (jnp.arange(t)[None, None, :, None]
                < lengths[:, None, None, None])
    wm = jnp.where(row_mask, w, 0.0)

    def loss_flash(q, k, v):
        o = flash_attention_trainable(q, k, v, lengths, 0.25, True)
        return (o.astype(jnp.float32) * wm).sum()

    def loss_ref(q, k, v):
        o = _xla_attention_reference(q, k, v, lengths, 0.25)
        return (o.astype(jnp.float32) * wm).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    # Padded q rows: the kernel's dq is exactly zero; the reference has
    # garbage there. Compare valid rows for dq, everything for dk/dv.
    np.testing.assert_allclose(
        np.asarray(gf[0] * row_mask), np.asarray(gr[0] * row_mask),
        rtol=1e-3, atol=1e-4)
    assert np.abs(np.asarray(gf[0] * ~row_mask)).max() == 0.0
    for a, b_ in zip(gf[1:], gr[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-4)
