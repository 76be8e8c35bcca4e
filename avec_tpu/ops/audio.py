# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Audio frontend: log-mel filterbank + SpecAugment, fully on-device.

Behavioral parity target: /root/reference/nnet/preprocessing.py:24-130.

The reference computes torchaudio Spectrogram(n_fft=512, win=25ms, hop=10ms,
power=2, center=True, reflect pad, periodic hann) -> MelScale(80 mels, htk,
f 0-8kHz, no norm) -> log(x + 1e-9), always in fp32 regardless of AMP
(:59-73), with length update len // hop + 1 (:77).

TPU-first design: the STFT is expressed as a single strided convolution with a
precomputed windowed-DFT basis (n_fft x 2*n_freq) so the whole frontend is two
MXU matmuls (DFT, mel projection) + elementwise ops, fused by XLA into the
training graph — no FFT op, no host round trip. SpecAugment's per-sample
Python loop (:115-128) is replaced by vectorized mask generation under a PRNG
key.
"""

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def hz_to_mel(f):
    """HTK mel scale (torchaudio MelScale default)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(n_freqs: int, n_mels: int, sample_rate: int,
                   f_min: float = 0.0, f_max: Optional[float] = None) -> np.ndarray:
    """Triangular mel filterbank (n_freqs, n_mels), torchaudio-compatible.

    Equivalent to torchaudio.functional.melscale_fbanks(norm=None,
    mel_scale='htk') as consumed at nnet/preprocessing.py:52.
    """
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    # Triangles: up-slope then down-slope between consecutive f_pts.
    f_diff = f_pts[1:] - f_pts[:-1]                      # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]         # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT basis (n_fft, 2 * (n_fft//2 + 1)) [cos | -sin].

    The window is periodic hann of win_length, centered (zero-padded) inside
    n_fft, matching torch.stft's window handling.
    """
    n_freq = n_fft // 2 + 1
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(win_length) / win_length))
    pad_l = (n_fft - win_length) // 2
    win_full = np.zeros(n_fft)
    win_full[pad_l:pad_l + win_length] = window
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    angle = 2.0 * np.pi * n * k / n_fft
    basis = np.concatenate([np.cos(angle), -np.sin(angle)], axis=1)
    return (basis * win_full[:, None]).astype(np.float32)


def power_spectrogram(x: jnp.ndarray, n_fft: int = 512, win_length: int = 400,
                      hop_length: int = 160) -> jnp.ndarray:
    """|STFT|^2 via hop-phase framing + one windowed-DFT matmul.

    x: (B, T) -> (B, n_frames, n_fft//2 + 1), n_frames = T // hop + 1.
    center=True reflect padding of n_fft//2, as torch.stft defaults.

    TPU note: the obvious strided conv over a (B, T, 1) signal compiles to
    a C_in=1 convolution in a T(1,128) layout that wastes ~98% of the MXU
    (profiled at 3.26 ms/step at B=16/6 s, the single hottest fbank op).
    Instead the signal is reshaped into hop-sized rows and each analysis
    window assembled from ceil(n_fft/hop) row slices, giving one dense
    (B*n_frames, K) x (K, 2F) fp32 matmul — same multiplies, MXU-friendly
    layout (~25x faster at the bench operating point).
    """
    t = x.shape[1]
    x = x.astype(jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    return spectrogram_frames(x, t // hop_length + 1, n_fft, win_length,
                              hop_length)


def spectrogram_frames(xp: jnp.ndarray, n_frames: int, n_fft: int = 512,
                       win_length: int = 400, hop_length: int = 160
                       ) -> jnp.ndarray:
    """|STFT|^2 frames of an ALREADY-padded signal: frame f covers
    xp[f*hop, f*hop + n_fft). Shared by the offline path above and the
    chunked streaming fbank (decode/causal_streaming.py), which supplies
    its own context samples instead of reflect padding."""
    b = xp.shape[0]
    basis = jnp.asarray(_dft_basis(n_fft, win_length))  # (n_fft, 2F)
    rows = -(-n_fft // hop_length)          # hop rows per analysis window
    k_pad = rows * hop_length               # n_fft padded up to row multiple
    # Window f covers xp[f*hop, f*hop + n_fft) — always inside the padded
    # signal; the extra zero samples below only ever multiply the zero rows
    # appended to the basis.
    total = (n_frames - 1 + rows) * hop_length
    if xp.shape[1] < total:
        xp = jnp.pad(xp.astype(jnp.float32),
                     ((0, 0), (0, total - xp.shape[1])))
    h = xp.astype(jnp.float32)[:, :total].reshape(b, -1, hop_length)
    frames = jnp.concatenate(
        [h[:, i: i + n_frames] for i in range(rows)], axis=-1)
    basis_p = jnp.pad(basis, ((0, k_pad - n_fft), (0, 0)))
    # True fp32: the fbank path is AMP-exempt in the reference
    # (preprocessing.py:59-73); avoid bf16 accumulation passes.
    out = jnp.einsum("btk,kf->btf", frames, basis_p,
                     precision=lax.Precision.HIGHEST,
                     preferred_element_type=jnp.float32)
    n_freq = n_fft // 2 + 1
    real, imag = out[..., :n_freq], out[..., n_freq:]
    return real * real + imag * imag


class AudioPreprocessing:
    """Log-mel filterbank extractor (ref: nnet/preprocessing.py:24-85).

    Callable: (B, T) float audio -> (B, n_mels, T // hop + 1) log-mels (and
    updated lengths). Output layout is (B, n_mels, frames) to match the
    reference's downstream unsqueeze -> conv2d stem contract.
    Always computes in fp32 and casts back (AMP-exempt path, ref :59-83).
    """

    def __init__(self, sample_rate=16000, n_fft=512, win_length_ms=25,
                 hop_length_ms=10, n_mels=80, normalize=False, mean=0.0, std=1.0):
        self.sample_rate = sample_rate
        self.n_fft = n_fft
        self.win_length = int(sample_rate * win_length_ms) // 1000
        self.hop_length = int(sample_rate * hop_length_ms) // 1000
        self.n_mels = n_mels
        self.normalize = normalize
        self.mean = mean
        self.std = std
        self._mel = jnp.asarray(
            mel_filterbank(n_fft // 2 + 1, n_mels, sample_rate, 0.0, 8000.0))

    def __call__(self, x: jnp.ndarray, lengths: Optional[jnp.ndarray] = None):
        dtype = x.dtype
        spec = power_spectrogram(x, self.n_fft, self.win_length, self.hop_length)
        mel = jnp.einsum("btf,fm->btm", spec, self._mel,
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
        out = jnp.log(mel + 1e-9)
        if self.normalize:
            out = (out - self.mean) / self.std
        out = out.transpose(0, 2, 1).astype(dtype)  # (B, n_mels, frames)
        if lengths is not None:
            lengths = lengths // self.hop_length + 1
            return out, lengths
        return out

    def stream_frames(self, xp: jnp.ndarray, n_frames: int) -> jnp.ndarray:
        """Log-mels of `n_frames` frames from an already-padded signal
        chunk (frame f covers xp[f*hop, f*hop + n_fft)) — the chunked
        streaming fbank. Same mel/log/normalize math as __call__."""
        dtype = xp.dtype
        spec = spectrogram_frames(xp, n_frames, self.n_fft, self.win_length,
                                  self.hop_length)
        mel = jnp.einsum("btf,fm->btm", spec, self._mel,
                         preferred_element_type=jnp.float32,
                         precision=lax.Precision.HIGHEST)
        out = jnp.log(mel + 1e-9)
        if self.normalize:
            out = (out - self.mean) / self.std
        return out.transpose(0, 2, 1).astype(dtype)  # (B, n_mels, frames)


class SpecAugment:
    """SpecAugment with adaptive time masking (ref: nnet/preprocessing.py:87-130).

    mF freq masks of max width F shared across the batch (iid_masks=False,
    ref :122) and mT per-sample time masks each of max width pS * length,
    masked to 0.0 inside the valid region only (ref slices [:, :, :len_b]).
    Vectorized: masks are built from uniform draws + iota comparisons,
    no data-dependent shapes.
    """

    def __init__(self, mF: int, F: int, mT: int, pS: float):
        self.mF = mF
        self.F = F
        self.mT = mT
        self.pS = pS

    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray, rng: jax.Array,
                 training: bool = True) -> jnp.ndarray:
        """x: (B, n_mels, T) log-mels; lengths: (B,) valid frame counts."""
        if not training:
            return x
        b, n_mels, t = x.shape
        rng_f, rng_t = jax.random.split(rng)

        keep = jnp.ones((b, n_mels, t), dtype=bool)

        # Frequency masks: same interval for the whole batch per mask.
        freq_idx = lax.broadcasted_iota(jnp.int32, (n_mels, 1), 0)
        for i in range(self.mF):
            k1, k2, rng_f = jax.random.split(rng_f, 3)
            width = jax.random.randint(k1, (), 0, self.F + 1)
            start = jax.random.randint(k2, (), 0, jnp.maximum(n_mels - width, 0) + 1)
            fmask = (freq_idx >= start) & (freq_idx < start + width)
            keep &= ~fmask[None, :, :]

        # Time masks: per-sample widths bounded by pS * length.
        time_idx = lax.broadcasted_iota(jnp.int32, (1, t), 1)
        max_width = (self.pS * lengths.astype(jnp.float32)).astype(jnp.int32)
        for i in range(self.mT):
            k1, k2, rng_t = jax.random.split(rng_t, 3)
            u_w = jax.random.uniform(k1, (b,))
            u_s = jax.random.uniform(k2, (b,))
            width = (u_w * (max_width + 1).astype(jnp.float32)).astype(jnp.int32)
            room = jnp.maximum(lengths.astype(jnp.int32) - width, 0)
            start = (u_s * (room + 1).astype(jnp.float32)).astype(jnp.int32)
            tmask = (time_idx >= start[:, None]) & (time_idx < (start + width)[:, None])
            # Only mask within the valid region (ref masks samples[:, :, :len]).
            tmask &= time_idx < lengths.astype(jnp.int32)[:, None]
            keep &= ~tmask[:, None, :]

        return jnp.where(keep, x, jnp.zeros((), dtype=x.dtype))
