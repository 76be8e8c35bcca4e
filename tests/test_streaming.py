"""Streaming/KV-cache decode coverage: incremental XL attention must match
full-sequence causal attention (ref: nnet/attentions.py:482-519 hidden)."""

import numpy as np
import jax
import jax.numpy as jnp

from avec_tpu.ops.attention import (
    GroupedRelPosMultiHeadSelfAttention,
    RelPosMultiHeadSelfAttention,
)
from avec_tpu.ops.masks import make_mask


def test_xl_incremental_matches_full():
    d, h, t = 16, 2, 8
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, t, d).astype(np.float32))
    att = RelPosMultiHeadSelfAttention(dim_model=d, num_heads=h, causal=True)
    variables = att.init({"params": jax.random.PRNGKey(0)},
                         x, x, x, method=att.forward_qkv)

    # Full causal pass.
    mask = make_mask(t, right_context=0)
    full = att.apply(variables, x, x, x, mask, method=att.forward_qkv)

    # Incremental: feed chunks with a growing KV cache.
    hidden = None
    outs = []
    for start in (0, 3, 5):
        end = {0: 3, 3: 5, 5: 8}[start]
        chunk = x[:, start:end]
        if hidden is None:
            out, hidden = att.apply(variables, chunk, chunk, chunk,
                                    make_mask(end - start, right_context=0),
                                    hidden=None, return_hidden=True,
                                    method=att.forward_qkv)
        else:
            from jax import lax

            th = hidden["K"].shape[1]
            tq = end - start
            # Causal band over [history | chunk] keys.
            rows = lax.broadcasted_iota(jnp.int32, (tq, th + tq), 0)
            cols = lax.broadcasted_iota(jnp.int32, (tq, th + tq), 1)
            mask_c = (cols <= rows + th)[None, None]
            out, hidden = att.apply(variables, chunk, chunk, chunk, mask_c,
                                    hidden=hidden, return_hidden=True,
                                    method=att.forward_qkv)
        outs.append(out)
    inc = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_grouped_hidden_shapes():
    d, h, g = 12, 2, 3
    att = GroupedRelPosMultiHeadSelfAttention(dim_model=d, num_heads=h,
                                              group_size=g, causal=True)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 6, d).astype(np.float32))
    variables = att.init({"params": jax.random.PRNGKey(0)},
                         x, x, x, method=att.forward_qkv)
    out, hidden = att.apply(variables, x, x, x, hidden=None,
                            return_hidden=True, method=att.forward_qkv)
    assert out.shape == (1, 6, d)
    assert hidden["K"].shape == (1, 6, d)
    # Feed a second chunk with the cache.
    x2 = jnp.asarray(np.random.RandomState(2).randn(1, 3, d).astype(np.float32))
    out2, hidden2 = att.apply(variables, x2, x2, x2, hidden=hidden,
                              return_hidden=True, method=att.forward_qkv)
    assert out2.shape == (1, 3, d)
    assert hidden2["K"].shape == (1, 9, d)
