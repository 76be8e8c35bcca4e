# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Streaming transcription over chunked audio (push / partial / final).

The reference has no streaming serving path — its closest mechanism is the
XL-attention KV cache (`/root/reference/nnet/attentions.py:482-519`), which
this repo covers at the attention level (tests/test_streaming.py). This
module adds the missing serving capability on top of the offline models,
with the semantics of production ASR streaming APIs:

  * ``push(pcm)`` ingests a chunk of 16 kHz float PCM and returns a revised
    PARTIAL transcript (it may change as right context arrives — the AVEC
    encoders are bidirectional, so later audio legitimately revises earlier
    frames);
  * ``finish()`` returns the final transcript. With an unbounded window it
    is EXACT: identical to the offline full-utterance greedy decode of the
    same audio (asserted in tests/test_streaming_transcriber.py).

Engineering notes (TPU-first):
  * one jitted forward per power-of-two length bucket — steady-state pushes
    never retrace or recompile, and shapes stay static for XLA;
  * the device returns per-frame argmax ids + valid length only (a few KB);
    collapse/commit logic runs on host;
  * with ``window_seconds`` set, memory is bounded: once the buffer exceeds
    the window, tokens left of the commit horizon are frozen at a CTC
    blank-run boundary (falling back to a forced cut when the model never
    emits blanks) and the corresponding audio is dropped. Windowed mode is
    approximate by design — global (rel-pos / patch) attention means
    dropping left context can perturb later frames; unbounded mode is the
    exact path.

Frame rate: the AVEC audio encoder emits 12.5 Hz frames from 16 kHz input
(fbank hop 160 × stem stride 2 × stage strides 2·2), i.e. 1280 samples per
output frame (`/root/reference/nnet/networks.py:359-406`).
"""

from typing import List, Optional

import numpy as np

__all__ = ["StreamingTranscriber"]


def _collapse_host(preds: np.ndarray, blank: int = 0,
                   prev: int = None) -> List[int]:
    """Host-side greedy CTC collapse of a 1-D frame-argmax sequence.

    Matches ops.ctc.ctc_greedy_collapse (drop repeats, then blanks).
    ``prev`` seeds the repeat-suppression state: after a forced window cut
    that may have landed mid-token, passing the frame id at the cut prevents
    the same token from being emitted again at the head of the new window."""
    out: List[int] = []
    prev = blank if prev is None else prev
    for p in preds.tolist():
        if p != blank and p != prev:
            out.append(int(p))
        prev = p
    return out


def _find_blank_cut(preds: np.ndarray, horizon: int, blank: int = 0,
                    min_run: int = 2) -> int:
    """Latest frame index f <= horizon such that frames [f-min_run, f) are
    all blank — committing at f cannot split a token. Returns -1 if no such
    blank run exists."""
    horizon = min(horizon, len(preds))
    run = 0
    cut = -1
    for f in range(horizon):
        run = run + 1 if preds[f] == blank else 0
        if run >= min_run:
            cut = f + 1
    return cut


class StreamingTranscriber:
    """Incremental transcription for a (compiled) audio-only AVEC model.

    Parameters
    ----------
    model : avec_tpu Model (compiled; built lazily on first push)
    decoder : CTCGreedySearchDecoder (supplies tokenizer + blank id)
    hop_seconds : minimum new audio between device forwards; pushes smaller
        than the hop are buffered and return the previous partial.
    window_seconds : bound on buffered audio; None = unbounded (exact).
    commit_margin_seconds : audio kept to the right of any commit cut so
        frozen frames always had at least this much right context.
    """

    SAMPLE_RATE = 16000
    FRAME_SAMPLES = 1280  # 12.5 Hz encoder output on 16 kHz input
    UNBOUNDED_WARN_SECONDS = 60  # one-time O(T^2) cost warning threshold

    def __init__(self, model, decoder, hop_seconds: float = 0.48,
                 window_seconds: Optional[float] = None,
                 commit_margin_seconds: float = 1.0,
                 bucket_floor: int = 4000, precision: Optional[str] = None):
        self.model = model
        self.decoder = decoder
        self.blank = getattr(decoder, "blank_token", 0)
        self.hop = max(1, int(hop_seconds * self.SAMPLE_RATE))
        self.window = (None if window_seconds is None
                       else int(window_seconds * self.SAMPLE_RATE))
        self.margin = int(commit_margin_seconds * self.SAMPLE_RATE)
        if self.window is not None:
            assert self.window > self.margin + self.FRAME_SAMPLES, \
                "window must exceed commit margin"
        self.bucket_floor = bucket_floor
        self.precision = precision

        self._buffer = np.zeros((0,), np.float32)
        self._pending = 0          # samples since last forward
        self._committed: List[int] = []  # frozen token ids
        self._fresh: List[int] = []      # tokens decoded from live buffer
        self._carry = self.blank   # frame id at the last window cut
        self._fwd_cache = {}
        self._finished = False
        self._warned_unbounded = False
        self.device_seconds = 0.0  # cumulative device+fetch time

    # ------------------------------------------------------------ device
    def _bucket(self, n: int) -> int:
        b = self.bucket_floor
        while b < n:
            b *= 2
        return b

    def _forward_preds(self, audio: np.ndarray) -> np.ndarray:
        """Run the encoder on the buffered audio, return valid frame argmax
        ids (1-D int array). One jit per length bucket; static shapes."""
        import time

        import jax
        import jax.numpy as jnp

        bucket = self._bucket(len(audio))
        pad = np.zeros((1, bucket), np.float32)
        pad[0, : len(audio)] = audio
        lens = np.array([len(audio)], np.int32)
        inputs = [pad, lens]
        if not getattr(self.model, "built", False):
            # Build only when the model has never been built — an externally
            # built model (e.g. with a loaded checkpoint) keeps its params.
            self.model.build(inputs, precision=self.precision)
        if bucket not in self._fwd_cache:
            model = self.model

            @jax.jit
            def fwd(params, batch_stats, a, al):
                out, _ = model.apply_net(params, batch_stats, [a, al],
                                         False, None)
                logits, lengths = out["outputs"]
                return jnp.argmax(logits, axis=-1), lengths
            self._fwd_cache[bucket] = fwd
        t0 = time.perf_counter()
        preds, lengths = self._fwd_cache[bucket](
            self.model.params, self.model.batch_stats, pad, lens)
        preds = np.asarray(preds)[0]
        nf = int(np.asarray(lengths)[0])
        self.device_seconds += time.perf_counter() - t0
        return preds[:nf]

    # ------------------------------------------------------------- logic
    def _slide_window(self, preds: np.ndarray) -> np.ndarray:
        """Freeze tokens left of the commit horizon and drop their audio."""
        while self.window is not None and len(self._buffer) > self.window:
            overflow = len(self._buffer) - (self.window - self.hop)
            horizon = min(overflow + self.margin,
                          len(self._buffer) - self.margin)
            horizon_f = max(1, horizon // self.FRAME_SAMPLES)
            cut_f = _find_blank_cut(preds, horizon_f, self.blank)
            if cut_f <= 0:
                cut_f = horizon_f  # forced cut: model emitted no blank run
            self._committed.extend(
                _collapse_host(preds[:cut_f], self.blank, prev=self._carry))
            # Seed the next collapse with the frame id at the cut so a token
            # split by a forced cut is not emitted twice (blank-run cuts
            # carry blank, preserving the old behavior).
            self._carry = int(preds[cut_f - 1]) if cut_f > 0 else self._carry
            self._buffer = self._buffer[cut_f * self.FRAME_SAMPLES:]
            preds = preds[cut_f:]
        return preds

    def _text(self) -> str:
        ids = self._committed + self._fresh
        return self.decoder.tokenizer.decode([ids])[0] if ids else ""

    # --------------------------------------------------------------- API
    def push(self, pcm: np.ndarray) -> dict:
        """Ingest a chunk of float PCM; return the current partial result."""
        assert not self._finished, "push() after finish()"
        pcm = np.asarray(pcm, np.float32).reshape(-1)
        if self.window is not None and len(pcm) > self.hop:
            # Windowed mode state bound: a giant push is processed hop by
            # hop so the encoder never sees more than window + hop samples —
            # the jit bucket set is capped at _bucket(window + hop) and RSS
            # stays O(window) no matter how much PCM one call delivers.
            out = None
            for s in range(0, len(pcm), self.hop):
                out = self.push(pcm[s: s + self.hop])
            return out
        self._buffer = np.concatenate([self._buffer, pcm])
        self._pending += len(pcm)
        if (self.window is None and not self._warned_unbounded
                and len(self._buffer) > self.UNBOUNDED_WARN_SECONDS
                * self.SAMPLE_RATE):
            # Unbounded mode re-runs the full forward every hop, so a
            # session's cumulative device cost grows O(T^2) — exact but it
            # will silently crawl on minute-long sessions. Surface it once.
            import logging

            logging.getLogger(__name__).warning(
                "unbounded streaming session passed %d s buffered; per-push "
                "cost grows with the whole session (O(T^2) cumulative). Set "
                "window_seconds for bounded cost, or use the causal encoder "
                "+ CausalStreamingTranscriber for exact O(chunk) streaming.",
                self.UNBOUNDED_WARN_SECONDS)
            self._warned_unbounded = True
        if self._pending >= self.hop and len(self._buffer) >= self.FRAME_SAMPLES:
            self._pending = 0
            preds = self._forward_preds(self._buffer)
            preds = self._slide_window(preds)
            self._fresh = _collapse_host(preds, self.blank, prev=self._carry)
        return {"text": self._text(), "final": False,
                "buffered_seconds": len(self._buffer) / self.SAMPLE_RATE}

    def finish(self) -> dict:
        """Flush: one last forward over the remaining buffer; final text."""
        if not self._finished:
            if len(self._buffer) >= self.FRAME_SAMPLES:
                preds = self._forward_preds(self._buffer)
                preds = self._slide_window(preds)
                self._fresh = _collapse_host(preds, self.blank,
                                             prev=self._carry)
            self._finished = True
        return {"text": self._text(), "final": True,
                "device_seconds": self.device_seconds}
