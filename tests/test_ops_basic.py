"""Unit tests for activations, inits, masks, positional encodings, schedulers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avec_tpu.ops import activations as A
from avec_tpu.ops import masks as M
from avec_tpu.ops import pos_embeddings as P
from avec_tpu.train import schedulers as S


def test_swish_glu():
    x = jnp.array([-1.0, 0.0, 2.0])
    np.testing.assert_allclose(A.swish(x), x * jax.nn.sigmoid(x), rtol=1e-6)
    y = jnp.array([[1.0, 2.0, 3.0, 4.0]])
    g = A.glu(y)
    np.testing.assert_allclose(
        g, y[:, :2] * jax.nn.sigmoid(y[:, 2:]), rtol=1e-6)


def test_length_and_padding_mask():
    lengths = jnp.array([3, 5])
    m = M.length_mask(lengths, 6)
    assert m.shape == (2, 6)
    np.testing.assert_array_equal(np.asarray(m[0]), [1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(m[1]), [1, 1, 1, 1, 1, 0])
    pm = M.padding_mask(lengths, 6)
    assert pm.shape == (2, 1, 1, 6)


def test_band_mask_causal():
    bm = M.band_mask(4, None, 0)
    expected = np.tril(np.ones((4, 4), dtype=bool))
    np.testing.assert_array_equal(np.asarray(bm[0, 0]), expected)


def test_band_mask_local():
    bm = M.band_mask(5, 1, 1)
    e = np.zeros((5, 5), dtype=bool)
    for i in range(5):
        for j in range(5):
            e[i, j] = abs(i - j) <= 1
    np.testing.assert_array_equal(np.asarray(bm[0, 0]), e)


def test_make_mask_combines():
    m = M.make_mask(4, lengths=jnp.array([2, 4]), right_context=0)
    assert m.shape == (2, 1, 4, 4)
    assert bool(m[0, 0, 1, 1]) and not bool(m[0, 0, 1, 2])
    assert bool(m[1, 0, 3, 3]) and not bool(m[1, 0, 2, 3])


def test_strided_lengths_matches_reference_formula():
    lengths = jnp.array([1, 2, 3, 7, 8])
    out = M.strided_lengths(lengths, 2)
    np.testing.assert_array_equal(np.asarray(out), [(l - 1) // 2 + 1 for l in [1, 2, 3, 7, 8]])


def test_min_pool_mask():
    lengths = jnp.array([7])
    mask = M.padding_mask(lengths, 9)
    pooled = M.min_pool_mask(mask, 3)
    np.testing.assert_array_equal(np.asarray(pooled[0, 0, 0]), [1, 1, 0])


def _torch_rel_pe(max_len, dim, seq_len, causal, hidden_len=0):
    """Reproduce RelativeSinusoidalPositionalEncoding (embeddings.py:101-158)
    in numpy as a golden value."""
    pe = np.zeros((2 * max_len - 1, dim), dtype=np.float64)
    pos_left = np.arange(max_len - 1, 0, -1, dtype=np.float64)
    pos_right = np.arange(0, -max_len, -1, dtype=np.float64)
    pos = np.concatenate([pos_left, pos_right])[:, None]
    i = np.arange(dim // 2, dtype=np.float64)[None, :]
    angles = pos / 10000 ** (2 * i / dim)
    pe[:, 0::2] = np.sin(angles)
    pe[:, 1::2] = np.cos(angles)
    if causal:
        return pe[max_len - seq_len - hidden_len: max_len]
    return pe[max_len - seq_len - hidden_len: max_len - 1 + seq_len]


@pytest.mark.parametrize("causal,hidden", [(False, 0), (True, 0), (False, 3), (True, 2)])
def test_relative_pos_encoding_golden(causal, hidden):
    got = np.asarray(P.relative_pos_encoding(7, 16, causal, hidden)[0])
    want = _torch_rel_pe(100, 16, 7, causal, hidden)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_grouped_relative_pos_encoding_shapes():
    # Full context: Th + 2T - G rows (embeddings.py:208-210).
    for g in (1, 2, 3):
        got = P.grouped_relative_pos_encoding(9, 16, g, causal=False)
        assert got.shape[1] == 2 * 9 - g, (g, got.shape)


def _golden_grouped_pe(max_len, dim, group_size, seq_len):
    pe = np.zeros((2 * max_len - group_size % 2, dim), dtype=np.float64)
    pos_left = np.arange(max_len - 1, group_size % 2 - 1, -1, dtype=np.float64)
    pos_right = np.arange(0, -max_len, -1, dtype=np.float64)
    pos = np.concatenate([pos_left, pos_right])[:, None]
    i = np.arange(dim // 2, dtype=np.float64)[None, :]
    angles = pos / 10000 ** (2 * i / dim)
    pe[:, 0::2] = np.sin(angles)
    pe[:, 1::2] = np.cos(angles)
    return pe[max_len - seq_len + group_size // 2:
              max_len - group_size % 2 + seq_len - group_size // 2]


@pytest.mark.parametrize("g", [1, 2, 3])
def test_grouped_relative_pos_encoding_golden(g):
    got = np.asarray(P.grouped_relative_pos_encoding(9, 16, g, causal=False)[0])
    want = _golden_grouped_pe(50, 16, g, 9)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_noam_scheduler():
    s = S.NoamDecayScheduler(warmup_steps=10000, dim_decay=360, val_factor=2)
    # Golden from the reference formula (schedulers.py:130-137).
    for step in [1, 100, 10000, 20000]:
        want = 2 * 360 ** -0.5 * min(step * 10000 ** -1.5, step ** -0.5)
        assert abs(s(step) - want) < 1e-12
        got_traced = jax.jit(s)(jnp.asarray(step))
        assert abs(float(got_traced) - want) < 1e-6


def test_cosine_scheduler():
    s = S.CosineAnnealingScheduler(warmup_steps=750, val_max=6e-4, val_min=6e-5, end_step=520000)
    assert abs(s(750) - 6e-4) < 1e-12
    assert abs(s(520000) - 6e-5) < 1e-10
    assert abs(s(600000) - 6e-5) < 1e-15
    mid = s((750 + 520000) // 2)
    assert 6e-5 < mid < 6e-4
    got = float(jax.jit(s)(jnp.asarray(260375)))
    assert abs(got - s(260375)) < 1e-9


def test_constant_decay_scheduler():
    s = S.ConstantDecayScheduler(values=[1.0, 0.5, 0.1], decay_steps=[10, 20])
    assert s(5) == 1.0 and s(11) == 0.5 and s(25) == 0.1
    assert float(jax.jit(s)(jnp.asarray(11))) == 0.5
