"""Golden tests for the audio frontend against torch.stft (CPU torch is the
oracle for the reference's torchaudio pipeline: Spectrogram = |stft|^2 with
periodic hann, center+reflect; MelScale = htk triangular filterbank)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from avec_tpu.ops.audio import (
    AudioPreprocessing,
    SpecAugment,
    mel_filterbank,
    power_spectrogram,
)


def _torch_power_spec(x, n_fft=512, win=400, hop=160):
    xt = torch.tensor(np.asarray(x), dtype=torch.float64)
    window = torch.hann_window(win, periodic=True, dtype=torch.float64)
    spec = torch.stft(xt, n_fft=n_fft, hop_length=hop, win_length=win,
                      window=window, center=True, pad_mode="reflect",
                      normalized=False, onesided=True, return_complex=True)
    return (spec.abs() ** 2).numpy()  # (B, F, T')


def test_power_spectrogram_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3200).astype(np.float32)
    ours = np.asarray(power_spectrogram(jnp.asarray(x)))  # (B, T', F)
    want = _torch_power_spec(x).transpose(0, 2, 1)  # -> (B, T', F)
    assert ours.shape == want.shape == (2, 3200 // 160 + 1, 257)
    # fp32 DFT vs fp64 torch: scale-aware tolerance.
    # fp32 DFT vs fp64 torch: scale-aware absolute tolerance, plus tight
    # bounds on typical relative error (near-zero bins are noise-dominated).
    assert np.abs(ours - want).max() < 1e-4 * want.max()
    rel = np.abs(ours - want) / (np.abs(want) + 1e-3)
    assert np.median(rel) < 1e-4
    assert np.percentile(rel, 99) < 2e-2


def test_mel_filterbank_matches_librosa_formula():
    fb = mel_filterbank(257, 80, 16000, 0.0, 8000.0)
    assert fb.shape == (257, 80)
    # Each filter is a unit-peak triangle; columns are nonnegative, rows at
    # interior frequencies sum to > 0.
    assert fb.min() >= 0.0
    assert fb.max() <= 1.0 + 1e-6
    assert (fb.sum(axis=1)[10:200] > 0).all()


def test_audio_preprocessing_shapes_and_lengths():
    ap = AudioPreprocessing()
    x = jnp.asarray(np.random.RandomState(1).randn(2, 16000).astype(np.float32))
    lengths = jnp.array([16000, 8000])
    out, out_len = ap(x, lengths)
    assert out.shape == (2, 80, 16000 // 160 + 1)
    # ref: lengths // hop + 1 (preprocessing.py:77)
    np.testing.assert_array_equal(np.asarray(out_len), [101, 51])
    assert np.isfinite(np.asarray(out)).all()


def test_audio_preprocessing_normalize():
    ap = AudioPreprocessing(normalize=True, mean=-5.6501, std=4.2280)
    x = jnp.zeros((1, 1600), dtype=jnp.float32)
    out = ap(x)
    np.testing.assert_allclose(
        np.asarray(out), (np.log(1e-9) + 5.6501) / 4.2280, rtol=1e-4)


def test_spec_augment_masks_only_valid_region():
    sa = SpecAugment(mF=2, F=10, mT=2, pS=0.2)
    x = jnp.ones((2, 40, 50))
    lengths = jnp.array([50, 30])
    out = sa(x, lengths, jax.random.PRNGKey(0), training=True)
    out = np.asarray(out)
    assert out.shape == x.shape
    assert (out <= 1.0).all() and (out >= 0.0).all()
    assert (out == 0).any(), "some positions should be masked"
    # Beyond sample 1's length, time masks must not apply; only freq masks
    # (which zero whole rows) may touch columns >= 30.
    tail = out[1, :, 30:]
    row_all_masked = (tail == 0).all(axis=1)
    row_untouched = (tail == 1).all(axis=1)
    assert (row_all_masked | row_untouched).all()


def test_spec_augment_eval_is_identity():
    sa = SpecAugment(mF=2, F=27, mT=5, pS=0.05)
    x = jnp.ones((1, 80, 100))
    out = sa(x, jnp.array([100]), jax.random.PRNGKey(0), training=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_spec_augment_jit_compatible():
    sa = SpecAugment(mF=2, F=27, mT=5, pS=0.05)

    @jax.jit
    def f(x, lengths, rng):
        return sa(x, lengths, rng, training=True)

    out = f(jnp.ones((2, 80, 100)), jnp.array([100, 60]), jax.random.PRNGKey(1))
    assert out.shape == (2, 80, 100)
