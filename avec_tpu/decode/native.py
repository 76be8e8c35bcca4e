# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""ctypes bindings for the native C++ beam decoder (csrc/beam_decoder.cpp).

Builds the shared library on first use (g++ -O3) and caches it next to the
source; falls back cleanly if no compiler is available (the Python prefix
beam search in decode/beam.py implements the identical algorithm).
"""

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "csrc", "beam_decoder.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "libbeamdecoder.so")
_BUILD_LOCK = threading.Lock()


def build_library(force: bool = False) -> str:
    """Compile the decoder shared library (idempotent)."""
    with _BUILD_LOCK:
        if not force and os.path.isfile(_LIB) and (
                os.path.getmtime(_LIB) >= os.path.getmtime(_SRC)):
            return _LIB
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _LIB]
        subprocess.run(cmd, check=True, capture_output=True)
        return _LIB


_lib_handle = None


def _load():
    global _lib_handle
    if _lib_handle is not None:
        return _lib_handle
    lib = ctypes.CDLL(build_library())
    lib.bd_create.restype = ctypes.c_void_p
    lib.bd_create.argtypes = [ctypes.c_int, ctypes.c_int, ctypes.c_double,
                              ctypes.c_double, ctypes.c_char_p, ctypes.c_int]
    lib.bd_destroy.argtypes = [ctypes.c_void_p]
    lib.bd_set_cutoff.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                  ctypes.c_double]
    lib.bd_decode.restype = ctypes.c_int
    lib.bd_decode.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    lib.bd_decode_batch.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int,
    ]
    _lib_handle = lib
    return lib


class NativeBeamDecoder:
    """C++ prefix beam search; same (prefix, score) contract as
    decode.beam.ctc_prefix_beam_search (score = combined log-likelihood,
    best first)."""

    def __init__(self, blank: int = 0, beam_size: int = 16, alpha: float = 0.6,
                 beta: float = 1.0, ngram_path: Optional[str] = None,
                 ngram_offset: int = 100, cutoff_top_n: Optional[int] = None,
                 cutoff_prob: float = 1.0, num_threads: int = 8):
        self._lib = _load()
        path = (ngram_path or "").encode()
        self._handle = self._lib.bd_create(blank, beam_size, alpha, beta,
                                           path, ngram_offset)
        if not self._handle:
            raise RuntimeError(f"bd_create failed (ngram_path={ngram_path})")
        if cutoff_top_n is not None or cutoff_prob < 1.0:
            self._lib.bd_set_cutoff(self._handle, int(cutoff_top_n or 0),
                                    float(cutoff_prob))
        self.beam_size = beam_size
        self.num_threads = num_threads

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.bd_destroy(self._handle)
            self._handle = None

    def decode(self, logp: np.ndarray, seq_len: int,
               max_out_len: int = 512) -> List[Tuple[Tuple[int, ...], float]]:
        logp = np.ascontiguousarray(logp, dtype=np.float32)
        t, v = logp.shape
        tokens = np.zeros((self.beam_size, max_out_len), np.int32)
        lens = np.zeros((self.beam_size,), np.int32)
        scores = np.zeros((self.beam_size,), np.float64)
        n = self._lib.bd_decode(self._handle, logp, t, v, int(seq_len),
                                tokens, lens, scores, max_out_len)
        return [(tuple(tokens[i, : lens[i]].tolist()), float(scores[i]))
                for i in range(n)]

    def decode_batch(self, logp: np.ndarray, seq_lens: np.ndarray,
                     max_out_len: int = 512
                     ) -> List[List[Tuple[Tuple[int, ...], float]]]:
        """Decode a (B, T, V) batch on the C++ thread pool (num_processes
        parity, ref nnet/decoders.py:30). Returns per-utterance beam lists
        with the same contract as decode()."""
        logp = np.ascontiguousarray(logp, dtype=np.float32)
        b, t, v = logp.shape
        seq_lens = np.ascontiguousarray(seq_lens, dtype=np.int32)
        tokens = np.zeros((b, self.beam_size, max_out_len), np.int32)
        lens = np.zeros((b, self.beam_size), np.int32)
        scores = np.full((b, self.beam_size), -np.inf, np.float64)
        self._lib.bd_decode_batch(self._handle, logp, b, t, v, seq_lens,
                                  tokens, lens, scores, max_out_len,
                                  int(self.num_threads))
        out = []
        for i in range(b):
            beams = [(tuple(tokens[i, k, : lens[i, k]].tolist()),
                      float(scores[i, k]))
                     for k in range(self.beam_size)
                     if np.isfinite(scores[i, k]) or lens[i, k] > 0]
            out.append(beams)
        return out
