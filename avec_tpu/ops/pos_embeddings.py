# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Positional encodings.

Behavioral parity target: /root/reference/nnet/embeddings.py.

Absolute sinusoidal (:20-99), relative sinusoidal with signed left/right
context (:101-158) and its grouped variant (:160-216), plus a learned absolute
embedding. Tables are computed on the fly for the (static-under-jit) sequence
length actually needed rather than storing a 2*max_len-1 buffer: the slice
[max_len - T - Th : max_len - 1 + T] of the reference table corresponds to
relative positions T + Th - 1 ... -(T - 1), which we generate directly.
"""

import numpy as np
import jax.numpy as jnp
import flax.linen as nn


def _sinusoid(pos: jnp.ndarray, dim_model: int) -> jnp.ndarray:
    """Interleaved sin/cos table for arbitrary (possibly signed) positions.

    pos: (N,) float. Returns (N, dim_model) with [:, 0::2]=sin, [:, 1::2]=cos
    of pos / 10000^(2i/dim) — matching nnet/embeddings.py:122-126.
    """
    i = np.arange(dim_model // 2, dtype=np.float32)
    inv_freq = jnp.asarray(1.0 / (10000.0 ** (2.0 * i / dim_model)))
    angles = pos[:, None] * inv_freq[None, :]
    # Interleave sin/cos: out[:, 0::2] = sin, out[:, 1::2] = cos.
    out = jnp.stack([jnp.sin(angles), jnp.cos(angles)], axis=-1)
    out = out.reshape(pos.shape[0], -1)
    if dim_model % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


def sinusoidal_pos_encoding(seq_len: int, dim_model: int) -> jnp.ndarray:
    """(1, T, D) absolute sinusoidal PE (ref: nnet/embeddings.py:64-99)."""
    pos = jnp.arange(seq_len, dtype=jnp.float32)
    return _sinusoid(pos, dim_model)[None]


def relative_pos_encoding(seq_len: int, dim_model: int, causal: bool = False,
                          hidden_len: int = 0) -> jnp.ndarray:
    """Relative sinusoidal PE slice.

    Full context: positions [T + Th - 1, ..., 1, 0, -1, ..., -(T-1)]
      -> (1, Th + 2T - 1, D)
    Causal: positions [T + Th - 1, ..., 1, 0] -> (1, Th + T, D)

    Matches RelativeSinusoidalPositionalEncoding.forward
    (nnet/embeddings.py:134-158): left context positive (sin branch),
    right context negative.
    """
    if causal:
        pos = jnp.arange(seq_len + hidden_len - 1, -1, -1, dtype=jnp.float32)
    else:
        pos = jnp.arange(seq_len + hidden_len - 1, -seq_len, -1, dtype=jnp.float32)
    return _sinusoid(pos, dim_model)[None]


def grouped_relative_pos_encoding(seq_len: int, dim_model: int, group_size: int,
                                  causal: bool = False, hidden_len: int = 0) -> jnp.ndarray:
    """Grouped relative sinusoidal PE slice (nnet/embeddings.py:194-216).

    Full context slice of the (2*max_len - G%2) table:
    [max_len - T + G//2 - Th : max_len - G%2 + T - G//2] which corresponds to
    positions [T + Th - 1 - G//2, ..., -(T - 1) + G//2 - (1 - G%2)] stepping -1.
    """
    if causal:
        pos = jnp.arange(seq_len + hidden_len - 1, -1, -1, dtype=jnp.float32)
    else:
        # Left (sin) section descends to 1 for odd G, to 0 for even G (the
        # even-G table duplicates position 0 across its sin/cos halves).
        left = jnp.arange(seq_len + hidden_len - 1 - group_size // 2,
                          group_size % 2 - 1, -1, dtype=jnp.float32)
        right = jnp.arange(0, -(seq_len - group_size // 2), -1, dtype=jnp.float32)
        pos = jnp.concatenate([left, right])
    return _sinusoid(pos, dim_model)[None]


class SinPosEmbedding(nn.Module):
    """Additive absolute sinusoidal embedding (ref: nnet/embeddings.py:20-44)."""

    num_embeddings: int
    dim_emb: int

    @nn.compact
    def __call__(self, x):
        pe = sinusoidal_pos_encoding(x.shape[1], self.dim_emb).astype(x.dtype)
        return x + pe


class PosEmbedding1d(nn.Module):
    """Additive learned absolute embedding (ref: nnet/embeddings.py:46-62).

    Initialized to zeros like the reference.
    """

    num_embeddings: int
    dim_emb: int

    @nn.compact
    def __call__(self, x):
        table = self.param("pos_encoding", nn.initializers.zeros,
                           (self.num_embeddings, self.dim_emb))
        return x + table[None, : x.shape[1]].astype(x.dtype)
