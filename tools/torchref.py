# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Import harness for the PyTorch reference (/root/reference) on this host.

Used ONLY to generate parity fixtures and run side-by-side tests: the
reference needs torchaudio / skimage / jiwer / sentencepiece, which are not
installed here. We install minimal stand-ins before importing `nnet`:

  * torchaudio.transforms.Spectrogram / MelScale — functional re-creations
    over torch.stft and our mel filterbank (avec_tpu.ops.audio.mel_filterbank
    is golden-tested against the torchaudio formula), so reference forwards
    compute real log-mels.
  * everything else (jiwer, sentencepiece, skimage, masking transforms) —
    inert stubs: reference model *construction* and *forward* never touch
    them on the eval path.

Nothing here is imported by the framework itself.
"""

import os
import sys
import types

REFERENCE_DIR = os.environ.get("AVEC_REFERENCE_DIR", "/root/reference")


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_DIR, "nnet"))


def _install_torchaudio_stub():
    import numpy as np
    import torch
    import torch.nn as nn

    from avec_tpu.ops.audio import mel_filterbank

    ta = types.ModuleType("torchaudio")
    transforms = types.ModuleType("torchaudio.transforms")
    functional = types.ModuleType("torchaudio.functional")

    class Spectrogram(nn.Module):
        """torchaudio.transforms.Spectrogram semantics (power=2, center=True,
        reflect pad, periodic hann) over torch.stft."""

        def __init__(self, n_fft=400, win_length=None, hop_length=None,
                     power=2.0, **_):
            super().__init__()
            self.n_fft = n_fft
            self.win_length = win_length or n_fft
            self.hop_length = hop_length or self.win_length // 2
            self.power = power
            self.register_buffer(
                "window", torch.hann_window(self.win_length, periodic=True))

        def forward(self, x):
            spec = torch.stft(x, self.n_fft, hop_length=self.hop_length,
                              win_length=self.win_length, window=self.window,
                              center=True, pad_mode="reflect",
                              return_complex=True)
            return spec.abs().pow(self.power)

    class MelScale(nn.Module):
        def __init__(self, n_mels=128, sample_rate=16000, f_min=0.0,
                     f_max=None, n_stft=201, **_):
            super().__init__()
            f_max = f_max if f_max is not None else sample_rate / 2
            fb = mel_filterbank(n_stft, n_mels, sample_rate,
                                float(f_min), float(f_max))
            self.register_buffer("fb", torch.tensor(np.asarray(fb),
                                                    dtype=torch.float32))

        def forward(self, spec):  # (..., freq, time)
            return torch.matmul(spec.transpose(-1, -2),
                                self.fb).transpose(-1, -2)

    class _Unused(nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

        def forward(self, *a, **k):
            raise NotImplementedError("stubbed torchaudio transform")

    class RNNTLoss(_Unused):
        pass

    class FrequencyMasking(_Unused):
        pass

    class TimeMasking(_Unused):
        pass

    transforms.Spectrogram = Spectrogram
    transforms.MelScale = MelScale
    transforms.RNNTLoss = RNNTLoss
    transforms.FrequencyMasking = FrequencyMasking
    transforms.TimeMasking = TimeMasking

    def resample(*a, **k):
        raise NotImplementedError("stubbed torchaudio.functional.resample")

    functional.resample = resample
    ta.transforms = transforms
    ta.functional = functional
    ta.load = lambda *a, **k: (_ for _ in ()).throw(NotImplementedError())
    ta.save = ta.load
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = transforms
    sys.modules["torchaudio.functional"] = functional


def _install_misc_stubs():
    if "torchvision" not in sys.modules:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            tv = types.ModuleType("torchvision")
            tv.datasets = types.ModuleType("torchvision.datasets")
            tv_utils = types.ModuleType("torchvision.datasets.utils")
            tv_utils.extract_archive = lambda *a, **k: None
            tv.datasets.utils = tv_utils
            tv.io = types.ModuleType("torchvision.io")
            sys.modules["torchvision"] = tv
            sys.modules["torchvision.datasets"] = tv.datasets
            sys.modules["torchvision.datasets.utils"] = tv_utils
            sys.modules["torchvision.io"] = tv.io
    if "sentencepiece" not in sys.modules:
        try:
            import sentencepiece  # noqa: F401
        except ImportError:
            # Functional stub backed by our native ModelProto parser
            # (utils/spm_model.py): the reference's decoders
            # (nnet/decoders.py:83,138) run for real, enabling
            # transcript-level pipeline parity tests.
            sp = types.ModuleType("sentencepiece")

            class SentencePieceProcessor:
                def __init__(self, model_file=None, *a, **k):
                    from avec_tpu.utils.spm_model import SentencePieceModel

                    path = model_file or (a[0] if a else k.get("model_path"))
                    self._m = SentencePieceModel.from_file(path)

                def vocab_size(self):
                    return self._m.vocab_size()

                def encode(self, text, *a, **k):
                    return self._m.encode(text)

                def decode(self, ids, *a, **k):
                    return self._m.decode(ids)

            sp.SentencePieceProcessor = SentencePieceProcessor
            sys.modules["sentencepiece"] = sp
    for name in ("jiwer", "gdown", "requests", "tqdm"):
        if name not in sys.modules:
            try:
                __import__(name)
            except ImportError:
                sys.modules[name] = types.ModuleType(name)
    if "skimage" not in sys.modules:
        try:
            import skimage  # noqa: F401
        except ImportError:
            sk = types.ModuleType("skimage")
            sk.transform = types.ModuleType("skimage.transform")
            sys.modules["skimage"] = sk
            sys.modules["skimage.transform"] = sk.transform


def import_reference():
    """Import and return the reference `nnet` package (with stubs installed).

    Raises ImportError if /root/reference is absent.
    """
    if not reference_available():
        raise ImportError(f"reference not found at {REFERENCE_DIR}")
    try:
        import torchaudio  # noqa: F401
    except ImportError:
        _install_torchaudio_stub()
    _install_misc_stubs()
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import nnet  # noqa: E402

    return nnet
