# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Host-side data transforms (numpy) for the input pipeline.

Behavioral parity target: /root/reference/nnet/transforms.py plus the
torchvision crop/flip transforms the configs compose
(configs/LRS23/AV/EffConfInterCTC.py:82-89). Video layout is (T, H, W, C)
float32 throughout — no channels-first permutes.
"""

from typing import List, Optional, Sequence, Tuple

import numpy as np


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


class NormalizeVideo:
    """(x - mean) / std per channel (ref: transforms.py:40-52)."""

    def __init__(self, mean=(0.5,), std=(0.5,)):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, video):
        return (video - self.mean) / self.std


class DenormalizeVideo:
    """ref: transforms.py:54-66."""

    def __init__(self, mean=(0.5,), std=(0.5,)):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = np.asarray(std, dtype=np.float32)

    def __call__(self, video):
        return video * self.std + self.mean


class RandomCrop:
    """Spatial random crop on (T, H, W, C) (torchvision RandomCrop parity)."""

    def __init__(self, size: Tuple[int, int], rng: Optional[np.random.RandomState] = None):
        self.size = size
        self.rng = rng or np.random

    def __call__(self, video):
        h, w = video.shape[1], video.shape[2]
        th, tw = self.size
        i = self.rng.randint(0, h - th + 1)
        j = self.rng.randint(0, w - tw + 1)
        return video[:, i:i + th, j:j + tw]


class CenterCrop:
    """torchvision CenterCrop parity on (T, H, W, C)."""

    def __init__(self, size: Tuple[int, int]):
        self.size = size

    def __call__(self, video):
        h, w = video.shape[1], video.shape[2]
        th, tw = self.size
        i = (h - th) // 2
        j = (w - tw) // 2
        return video[:, i:i + th, j:j + tw]


class RandomHorizontalFlip:
    """torchvision parity: flip W axis with prob p."""

    def __init__(self, p: float = 0.5, rng: Optional[np.random.RandomState] = None):
        self.p = p
        self.rng = rng or np.random

    def __call__(self, video):
        if self.rng.rand() < self.p:
            return video[:, :, ::-1].copy()
        return video


class TimeMaskSecond:
    """Video time masking in seconds (ref: transforms.py:108-126).

    Applies int(duration_s * num_mask_second) masks, each of uniform width in
    [0, T_second * fps), filled with the video mean (mean_frame=True) or 0.
    Operates on (T, H, W, C) along axis 0 (the reference permutes to put time
    on axis 2 of a (W, C, T, H) tensor; same distribution).
    """

    def __init__(self, T_second: float, num_mask_second: float, fps: float = 25.0,
                 mean_frame: bool = True, rng: Optional[np.random.RandomState] = None):
        self.T = int(T_second * fps)
        self.num_mask_second = num_mask_second
        self.fps = fps
        self.mean_frame = mean_frame
        self.rng = rng or np.random

    def __call__(self, video):
        t = video.shape[0]
        m_t = int(t / self.fps * self.num_mask_second)
        fill = video.mean() if self.mean_frame else 0.0
        video = video.copy()
        for _ in range(m_t):
            width = self.rng.randint(0, self.T + 1) if self.T > 0 else 0
            if width == 0 or width >= t:
                continue
            start = self.rng.randint(0, t - width + 1)
            video[start:start + width] = fill
        return video


class BabbleNoise:
    """NoiseX babble mixing at a random SNR (ref: transforms.py:128-167).

    SNR in dB drawn from SNR_db (None = clean); the noise segment is a random
    slice, scaled so that signal/noise amplitude ratio = 10^(SNR/20).
    """

    def __init__(self, noise_file_path: Optional[str] = None,
                 noise: Optional[np.ndarray] = None,
                 SNR_db=(-5, 0, 5, 10, 15, 20, None), to_sample_rate=16000,
                 rng: Optional[np.random.RandomState] = None):
        from avec_tpu.utils.media import read_audio, resample_audio

        if noise is None:
            noise, sr = read_audio(noise_file_path)
            if to_sample_rate is not None:
                noise = resample_audio(noise, sr, to_sample_rate)
        self.noise = np.asarray(noise, dtype=np.float32)
        self.SNR_db = list(SNR_db)
        self.rng = rng or np.random

    def __call__(self, audio):
        snr_db = self.SNR_db[self.rng.randint(0, len(self.SNR_db))]
        if snr_db is None:
            return audio
        snr = (10.0 ** (snr_db / 10.0)) ** 0.5
        n = audio.shape[-1]
        pos = self.rng.randint(0, self.noise.shape[-1] - n + 1)
        noise = self.noise[pos:pos + n]
        x_power = (audio ** 2).sum() / n
        noise_power = (noise ** 2).sum() / n
        noise = noise / snr * np.sqrt(x_power / max(noise_power, 1e-12))
        return audio + noise


def align_video_to_audio(video: np.ndarray, audio: np.ndarray) -> np.ndarray:
    """Zero-pad video to Ta // 640 + 1 frames so 25 fps video aligns with
    16 kHz audio after the 4x audio time downsampling
    (ref: transforms.py:169-180: 160 hop * 2 * 2)."""
    tv = video.shape[0]
    ta = audio.shape[0]
    padding = ta // (160 * 2 * 2) + 1 - tv
    pad_left = padding // 2
    pad_right = padding // 2 + padding % 2
    if padding < 0:
        return video[:ta // 640 + 1]
    return np.pad(video, ((pad_left, pad_right), (0, 0), (0, 0), (0, 0)))
