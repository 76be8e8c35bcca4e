# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Host-side media IO (the torchvision/torchaudio/FFmpeg replacement).

The reference uses torchvision.io.read_video/write_video and
torchaudio.load/save (SURVEY §2.4, nnet/datasets.py:331-339,532-554). Here
video goes through OpenCV (C++-backed, no Python in the decode loop) and
audio through the stdlib `wave` module (16-bit PCM wav), with optional
soundfile for flac when available.
"""

import os
import wave
from typing import Optional, Tuple

import numpy as np


def read_video(path: str) -> Tuple[np.ndarray, float]:
    """Decode a video to (T, H, W, 3) uint8 + fps (cv2-backed)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(path)
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {path}")
    return np.stack(frames), fps


def write_video(path: str, video: np.ndarray, fps: float = 25.0):
    """Encode (T, H, W, 3|1) uint8 to mp4 (cv2-backed)."""
    import cv2

    if video.ndim == 3:
        video = video[..., None]
    if video.shape[-1] == 1:
        video = np.repeat(video, 3, axis=-1)
    t, h, w, _ = video.shape
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(path, fourcc, fps, (w, h))
    for frame in video:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    """Load mono audio as float32 in [-1, 1] + sample rate.

    Supports .wav natively; .flac via soundfile when installed.
    """
    if path.endswith(".wav"):
        with wave.open(path, "rb") as f:
            sr = f.getframerate()
            n = f.getnframes()
            width = f.getsampwidth()
            channels = f.getnchannels()
            raw = f.readframes(n)
        if width == 2:
            audio = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
        elif width == 4:
            audio = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"unsupported sample width {width}")
        if channels > 1:
            audio = audio.reshape(-1, channels)[:, 0]
        return audio.reshape(-1), sr
    try:
        import soundfile as sf

        audio, sr = sf.read(path, dtype="float32")
        if audio.ndim > 1:
            audio = audio[:, 0]
        return audio, sr
    except ImportError as e:
        raise ImportError(
            f"cannot read {path}: non-wav audio requires soundfile") from e


def write_audio(path: str, audio: np.ndarray, sample_rate: int = 16000):
    """Write mono float32 [-1, 1] audio as 16-bit PCM wav."""
    pcm = np.clip(audio * 32768.0, -32768, 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())


def resample_audio(audio: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    """Polyphase resampling (replaces torchaudio.functional.resample,
    ref transforms.py:136)."""
    if orig_sr == new_sr:
        return audio
    from scipy.signal import resample_poly
    from math import gcd

    g = gcd(orig_sr, new_sr)
    return resample_poly(audio, new_sr // g, orig_sr // g).astype(np.float32)


def rgb_to_grayscale(video: np.ndarray) -> np.ndarray:
    """(T, H, W, 3) -> (T, H, W, 1) with ITU-R 601 weights (torchvision
    Grayscale parity: 0.2989 R + 0.587 G + 0.114 B)."""
    w = np.array([0.2989, 0.587, 0.114], dtype=np.float32)
    gray = (video.astype(np.float32) * w).sum(axis=-1, keepdims=True)
    if video.dtype == np.uint8:
        return gray
    return gray
