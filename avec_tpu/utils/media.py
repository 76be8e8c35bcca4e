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


_H264_FOURCC = None  # resolved on first write: fourcc str, or "" if none


def _h264_fourcc(cv2, w, h, fps):
    """Probe once for a working H.264 encoder (the reference writes h264
    mouth crops, nnet/datasets.py:554). OpenCV builds with openh264/ffmpeg
    accept 'avc1'/'H264'; builds without silently produce empty files, so
    probe by writing a real frame to a temp file."""
    global _H264_FOURCC
    if _H264_FOURCC is not None:
        return _H264_FOURCC
    import os
    import tempfile

    for code in ("avc1", "H264", "X264"):
        fd, tmp = tempfile.mkstemp(suffix=".mp4")
        os.close(fd)
        try:
            wr = cv2.VideoWriter(tmp, cv2.VideoWriter_fourcc(*code),
                                 25.0, (32, 32))
            ok = wr.isOpened()
            if ok:
                wr.write(np.zeros((32, 32, 3), np.uint8))
            wr.release()
            if ok and os.path.getsize(tmp) > 0:
                _H264_FOURCC = code
                return code
        except Exception:
            pass
        finally:
            os.unlink(tmp)
    _H264_FOURCC = ""
    return ""


def write_video(path: str, video: np.ndarray, fps: float = 25.0,
                codec: str = "h264"):
    """Encode (T, H, W, 3|1) uint8 to mp4 (cv2-backed).

    codec="h264" uses an H.264 encoder when the OpenCV build has one
    (reference-artifact parity); falls back to mp4v otherwise.
    """
    import cv2

    if video.ndim == 3:
        video = video[..., None]
    if video.shape[-1] == 1:
        video = np.repeat(video, 3, axis=-1)
    t, h, w, _ = video.shape
    code = (_h264_fourcc(cv2, w, h, fps) or "mp4v") if codec == "h264" \
        else codec
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*code), fps, (w, h))
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
    except ImportError:
        pass
    if path.endswith(".flac"):
        # Native decoder (utils/flac.py): reads reference-prepared artifacts
        # (libFLAC LPC/fixed/constant subframes) without soundfile.
        from avec_tpu.utils.flac import read_flac

        return read_flac(path)
    raise ImportError(f"cannot read {path}: non-wav/flac audio requires "
                      "soundfile")


def write_audio(path: str, audio: np.ndarray, sample_rate: int = 16000):
    """Write mono float32 [-1, 1] audio: 16-bit PCM wav, or FLAC when the
    path ends in .flac (reference-artifact parity, nnet/datasets.py:532;
    soundfile when installed, else the native encoder in utils/flac.py)."""
    if path.endswith(".flac"):
        try:
            import soundfile as sf

            sf.write(path, np.asarray(audio, np.float32), sample_rate)
            return
        except ImportError:
            from avec_tpu.utils.flac import write_flac

            write_flac(path, audio, sample_rate)
            return
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
