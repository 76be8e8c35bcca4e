"""The factorized rel-pos score path must equal the reference skew path
(exact sin/cos angle-difference identity; only fp reassociation differs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avec_tpu.ops.attention import RelPos1dMultiHeadAttention, RelPosPatch1dMultiHeadAttention
from avec_tpu.ops.masks import padding_mask


@pytest.mark.parametrize("t", [7, 16])
def test_factorized_equals_skew(t):
    d, h = 24, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, t, d).astype(np.float32))
    mask = padding_mask(jnp.array([t, t - 3]), t)

    att_f = RelPos1dMultiHeadAttention(dim_model=d, num_heads=h,
                                       num_pos_embeddings=64, factorized=True)
    att_s = RelPos1dMultiHeadAttention(dim_model=d, num_heads=h,
                                       num_pos_embeddings=64, factorized=False)
    variables = att_f.init({"params": jax.random.PRNGKey(0)}, x, mask)
    out_f = att_f.apply(variables, x, mask)
    out_s = att_s.apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               rtol=1e-4, atol=1e-4)


def test_factorized_patch_attention_equals_skew():
    d, h, t = 16, 2, 10
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, t, d).astype(np.float32))
    mask = padding_mask(jnp.array([t, 7]), t)
    att_f = RelPosPatch1dMultiHeadAttention(
        dim_model=d, num_heads=h, num_pos_embeddings=64, patch_size=3,
        factorized=True)
    att_s = RelPosPatch1dMultiHeadAttention(
        dim_model=d, num_heads=h, num_pos_embeddings=64, patch_size=3,
        factorized=False)
    variables = att_f.init({"params": jax.random.PRNGKey(0)}, x, mask)
    out_f = att_f.apply(variables, x, mask)
    out_s = att_s.apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_s),
                               rtol=1e-4, atol=1e-4)


def test_factorized_grads_match():
    d, h, t = 16, 2, 9
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, t, d).astype(np.float32))
    att_f = RelPos1dMultiHeadAttention(dim_model=d, num_heads=h,
                                       factorized=True)
    att_s = RelPos1dMultiHeadAttention(dim_model=d, num_heads=h,
                                       factorized=False)
    variables = att_f.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(f):
        return lambda v: (f.apply(v, x) ** 2).sum()

    g_f = jax.grad(loss(att_f))(variables)
    g_s = jax.grad(loss(att_s))(variables)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)
