"""Tests for the attention library: skewing trick golden values, masking,
patch/grouped shapes, causal behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avec_tpu.ops.attention import (
    GroupedRelPosMultiHeadSelfAttention,
    MultiHeadAttention,
    RelPos1dMultiHeadAttention,
    RelPosMultiHeadSelfAttention,
    RelPosPatch1dMultiHeadAttention,
    rel_to_abs,
)
from avec_tpu.ops.masks import make_mask, padding_mask


def test_rel_to_abs_full_golden():
    """out[i, j] == in[i, T-1 + j - i] (relative index of key j wrt query i)."""
    t = 5
    rng = np.random.RandomState(0)
    x = rng.randn(1, 1, t, 2 * t - 1).astype(np.float32)
    out = np.asarray(rel_to_abs(jnp.asarray(x), causal=False))
    assert out.shape == (1, 1, t, t)
    for i in range(t):
        for j in range(t):
            assert abs(out[0, 0, i, j] - x[0, 0, i, t - 1 + j - i]) < 1e-6


def test_rel_to_abs_causal_golden():
    """Causal: keys include Th history; out[i, j] == in[i, T-1 + j - i] for
    j <= i + Th."""
    t, th = 4, 3
    rng = np.random.RandomState(1)
    x = rng.randn(1, 1, t, th + t).astype(np.float32)
    out = np.asarray(rel_to_abs(jnp.asarray(x), causal=True))
    assert out.shape == (1, 1, t, th + t)
    for i in range(t):
        for j in range(i + th + 1):
            assert abs(out[0, 0, i, j] - x[0, 0, i, t - 1 + j - i]) < 1e-6


def _init_and_run(module, *args, rngs=None, **kwargs):
    rngs = rngs or {"params": jax.random.PRNGKey(0)}
    variables = module.init(rngs, *args, **kwargs)
    return module.apply(variables, *args, **kwargs), variables


def test_mha_masking_blocks_padded_keys():
    b, t, d = 2, 6, 16
    x = jnp.asarray(np.random.RandomState(0).randn(b, t, d).astype(np.float32))
    mha = MultiHeadAttention(dim_model=d, num_heads=4)
    mask = padding_mask(jnp.array([6, 3]), t)
    out_full, variables = _init_and_run(mha, x, mask)
    # Perturbing padded keys must not change valid outputs of sample 1.
    x2 = x.at[1, 4:].set(99.0)
    out_pert = mha.apply(variables, x2, mask)
    np.testing.assert_allclose(np.asarray(out_full[1, :3]),
                               np.asarray(out_pert[1, :3]), atol=1e-5)


def test_relpos1d_shapes_and_mask_invariance():
    b, t, d = 2, 9, 16
    x = jnp.asarray(np.random.RandomState(1).randn(b, t, d).astype(np.float32))
    att = RelPos1dMultiHeadAttention(dim_model=d, num_heads=4,
                                     num_pos_embeddings=100)
    mask = padding_mask(jnp.array([9, 5]), t)
    out, variables = _init_and_run(att, x, mask)
    assert out.shape == (b, t, d)
    x2 = x.at[1, 6:].set(-50.0)
    out2 = att.apply(variables, x2, mask)
    np.testing.assert_allclose(np.asarray(out[1, :5]), np.asarray(out2[1, :5]),
                               atol=1e-5)


def test_patch_attention_shapes_and_padding():
    b, d = 2, 16
    att = RelPosPatch1dMultiHeadAttention(dim_model=d, num_heads=4,
                                          num_pos_embeddings=100, patch_size=3)
    for t in (9, 10):  # divisible and not
        x = jnp.asarray(np.random.RandomState(2).randn(b, t, d).astype(np.float32))
        mask = padding_mask(jnp.array([t, t - 2]), t)
        out, _ = _init_and_run(att, x, mask)
        assert out.shape == (b, t, d)


def test_xl_attention_with_hidden_cache():
    b, t, th, d = 1, 4, 3, 8
    att = RelPosMultiHeadSelfAttention(dim_model=d, num_heads=2, causal=True)
    x = jnp.asarray(np.random.RandomState(3).randn(b, t, d).astype(np.float32))
    variables = att.init({"params": jax.random.PRNGKey(0)},
                         x, x, x, method=att.forward_qkv)
    hidden = {"K": jnp.zeros((b, th, d)), "V": jnp.zeros((b, th, d))}
    out, new_hidden = att.apply(variables, x, x, x, hidden=hidden,
                                return_hidden=True, method=att.forward_qkv)
    assert out.shape == (b, t, d)
    assert new_hidden["K"].shape == (b, th + t, d)


@pytest.mark.parametrize("g", [1, 3])
def test_grouped_attention_shapes(g):
    b, t, d = 2, 9, 12
    att = GroupedRelPosMultiHeadSelfAttention(dim_model=d, num_heads=2,
                                              group_size=g, causal=False)
    x = jnp.asarray(np.random.RandomState(4).randn(b, t, d).astype(np.float32))
    mask = make_mask(t, jnp.array([9, 6]))
    out, _ = _init_and_run(att, x, x, x, mask, method=att.forward_qkv)
    assert out.shape == (b, t, d)


def test_causal_attention_is_causal():
    """Future tokens must not affect past outputs under the causal mask."""
    b, t, d = 1, 6, 8
    x = jnp.asarray(np.random.RandomState(5).randn(b, t, d).astype(np.float32))
    mha = MultiHeadAttention(dim_model=d, num_heads=2)
    mask = make_mask(t, right_context=0)
    out, variables = _init_and_run(mha, x, mask)
    x2 = x.at[0, 4:].set(77.0)
    out2 = mha.apply(variables, x2, mask)
    np.testing.assert_allclose(np.asarray(out[0, :4]), np.asarray(out2[0, :4]),
                               atol=1e-5)


def test_nd_attention_flattens_and_restores_shape():
    """NdMultiHeadAttention (ref nnet/attentions.py:173-213): (B,...,C) is
    flattened to (B,N,C) for attention then reshaped back; it must equal
    plain MHA on the pre-flattened input with shared params."""
    from avec_tpu.ops.attention import NdMultiHeadAttention

    b, h, w, c = 2, 3, 4, 8
    x = jnp.asarray(np.random.RandomState(0).randn(b, h, w, c), jnp.float32)
    att = NdMultiHeadAttention(dim_model=c, num_heads=2)
    params = att.init(jax.random.PRNGKey(0), x)
    out = att.apply(params, x)
    assert out.shape == (b, h, w, c)

    flat = MultiHeadAttention(dim_model=c, num_heads=2)
    out_flat = flat.apply(params, x.reshape(b, h * w, c))
    np.testing.assert_allclose(np.asarray(out).reshape(b, h * w, c),
                               np.asarray(out_flat), atol=1e-6)


def test_nd_attention_in_registry():
    from avec_tpu.ops.attention import att_dict, make_attention

    assert "NdMultiHeadAttention" in att_dict
    mod = make_attention(8, {"class": "NdMultiHeadAttention",
                             "params": {"num_heads": 2}})
    x = jnp.ones((1, 2, 3, 8), jnp.float32)
    out = mod.apply(mod.init(jax.random.PRNGKey(0), x), x)
    assert out.shape == (1, 2, 3, 8)
