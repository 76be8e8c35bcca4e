# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Attention / padding masks, built statically from sequence lengths.

Behavioral parity target: /root/reference/nnet/attentions.py:656-733 (`Mask`).
The reference builds a (B or 1, 1, T, T) binary mask (1 = attend) from an
optional left/right context band and a per-batch padding mask assembled with a
Python loop. Here everything is vectorized with broadcasted iota (static
shapes, jit-friendly) and we avoid materializing (B, T, T) when only key
padding is needed:

- With no context band (the Conformer default `Mask()`), the reference mask
  reduces to `m[b, i, j] = (j < len_b)`, i.e. a key-padding-only mask of shape
  (B, 1, 1, T) broadcast over queries/heads.
- With a band (e.g. GPT's `Mask(right_context=0)`), the band (1, 1, T, T) is
  combined with key padding by broadcast.

Masks are boolean; attention layers apply `scores += (~mask) * -1e9` to match
the reference exactly (nnet/attentions.py:120-121).
"""

from typing import Optional

import jax.numpy as jnp
from jax import lax

NEG_INF = -1e9


def length_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, T) bool validity mask."""
    pos = lax.broadcasted_iota(jnp.int32, (1, max_len), 1)
    return pos < lengths.astype(jnp.int32)[:, None]


def padding_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, 1, 1, T) key-padding mask (ref Mask.padding_mask)."""
    return length_mask(lengths, max_len)[:, None, None, :]


def band_mask(seq_len: int, left_context: Optional[int], right_context: Optional[int],
              mask_start: int = 0) -> Optional[jnp.ndarray]:
    """Context band mask (1, 1, T, T); None when unconstrained.

    ref: nnet/attentions.py:699-713. right_context=0 => causal.
    `mask_start` forces the top-left (mask_start, mask_start) block to 1.
    """
    if left_context is None and right_context is None:
        return None
    rows = lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 0)
    cols = lax.broadcasted_iota(jnp.int32, (seq_len, seq_len), 1)
    mask = jnp.ones((seq_len, seq_len), dtype=bool)
    if right_context is not None:
        mask &= cols <= rows + right_context
    if left_context is not None:
        mask &= cols >= rows - left_context
    if mask_start > 0:
        start = (rows < mask_start) & (cols < mask_start)
        mask |= start
    return mask[None, None, :, :]


def make_mask(seq_len: int, lengths: Optional[jnp.ndarray] = None,
              left_context: Optional[int] = None, right_context: Optional[int] = None,
              mask_start: int = 0) -> Optional[jnp.ndarray]:
    """Combined mask, broadcastable to (B, 1, T, T); None when unmasked.

    Mirrors the forward of reference `Mask` (nnet/attentions.py:694-733) with
    `seq_len_axis` collapsed (callers pass flattened lengths).
    """
    band = band_mask(seq_len, left_context, right_context, mask_start)
    if lengths is None:
        return band
    pad = padding_mask(lengths, seq_len)
    if band is None:
        return pad
    return band & pad


def apply_mask(scores: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """scores += (~mask) * -1e9, the reference's additive masking."""
    if mask is None:
        return scores
    return scores + (~mask).astype(scores.dtype) * NEG_INF


def downsample_mask(mask: Optional[jnp.ndarray], stride: int) -> Optional[jnp.ndarray]:
    """Stride a (B,1,Tq,Tk) or (B,1,1,Tk) mask: m[:, :, ::s, ::s].

    ref: nnet/networks.py:296-298. Query-dim slicing is a no-op on
    key-padding-only masks (broadcast dim 1).
    """
    if mask is None or stride == 1:
        return mask
    q = mask[:, :, ::stride, :] if mask.shape[2] > 1 else mask
    return q[:, :, :, ::stride]


def strided_lengths(lengths: jnp.ndarray, stride: int) -> jnp.ndarray:
    """len -> (len - 1) // stride + 1 (ref: nnet/networks.py:302)."""
    if stride == 1:
        return lengths
    return (lengths - 1) // stride + 1


def min_pool_mask(mask: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Min-pool a mask by `patch_size` along both query and key axes.

    ref: nnet/attentions.py:354-362 (`- MaxPool1d(-mask)` on each axis).
    A pooled position is valid only if every covered position is valid.
    Input (B, 1, Tq, Tk) [Tq may be broadcast dim 1]; T axes must be padded
    to a multiple of patch_size beforehand.
    """
    b, h, tq, tk = mask.shape
    m = mask.reshape(b, h, tq, tk // patch_size, patch_size).all(axis=-1)
    if tq > 1:
        m = m.reshape(b, h, tq // patch_size, patch_size, tk // patch_size).all(axis=3)
    return m
