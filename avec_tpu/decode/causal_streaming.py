# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Exact O(chunk) streaming transcription for the causal AVEC audio model.

`StreamingTranscriber` (decode/streaming.py) re-runs the full forward over
the buffered audio each push — exact for the bidirectional models, but
O(T^2) per session. This module is the causal counterpart: with
`AudioEfficientConformerInterCTC(causal=True, left_context=L)` every output
frame is a function of past audio only, so the encoder runs CHUNKED with
carried state and never revisits old frames:

  * fbank: the driver slices each analysis window from its raw-sample
    buffer (frame f covers x[f*hop-256, f*hop+256), torch.stft center
    semantics) — no recompute, reflect padding only at session start/end;
  * conv stem + depthwise convs: (k-1)-frame input tails replace the causal
    left zero-padding (conv VALID over concat(tail, chunk));
  * attention: fixed-size right-aligned KV caches of L/2^stage keys per
    layer (the reference's own streaming mechanism,
    /root/reference/nnet/attentions.py:482-519), with cache validity masked
    during warmup. Mask restriding in the offline model halves left_context
    per stage, so cache size L/2^s reproduces the offline band EXACTLY.

One jitted step function, fixed shapes, zero retraces after the first push.
Every emitted token is FINAL (causal model ⇒ outputs never revise), so
partial == committed transcript and per-push device cost is O(chunk·L).

Exactness contract (tested): concatenated streaming logits == the offline
`causal=True` forward of the full utterance (up to float reassociation from
different tilings), and the final transcript is identical.
"""

from typing import List, Optional

import numpy as np

__all__ = ["CausalStreamingTranscriber"]

HOP = 160          # fbank hop (10 ms at 16 kHz)
N_FFT = 512
PAD = N_FFT // 2   # center-padding lookahead per frame
STRIDES = 8        # fbank frames per 12.5 Hz output frame (2*2*2)


def _od(n: int) -> int:
    """Length update of one causal stride-2 layer: (n-1)//2 + 1."""
    return (n - 1) // 2 + 1


class CausalStreamingTranscriber:
    """Chunked exact streaming for a causal audio model.

    Parameters
    ----------
    model : AudioEfficientConformerInterCTC(causal=True, left_context=L)
        compiled; built lazily (or pre-built with loaded weights).
    decoder : CTCGreedySearchDecoder (tokenizer + blank id).
    chunk_frames : fbank frames per device step (multiple of 8). Smaller =
        lower latency, larger = better device efficiency.
    """

    def __init__(self, model, decoder, chunk_frames: int = 16,
                 precision: Optional[str] = None):
        net = model.net
        assert getattr(net, "causal", False), \
            "CausalStreamingTranscriber needs a causal=True model"
        self.left_context = int(net.left_context or 128)
        assert self.left_context % 4 == 0, "left_context must be 4-aligned"
        assert chunk_frames % STRIDES == 0 and chunk_frames > 0
        self.model = model
        self.decoder = decoder
        self.blank = getattr(decoder, "blank_token", 0)
        self.chunk = chunk_frames
        self.precision = precision

        self._buffer = np.zeros((0,), np.float32)
        self._f_done = 0          # fbank frames fully processed
        self._tokens: List[int] = []
        self._prev = self.blank   # greedy-collapse carry
        self._o_done = 0          # output (12.5 Hz) frames emitted
        self._finished = False
        self._step = None
        self._state = None
        self.device_seconds = 0.0
        self.push_latencies: List[float] = []
        self.collect_logits = False      # exactness tests: keep chunk logits
        self.logits_chunks: List[np.ndarray] = []

    # ---------------------------------------------------------------- plan
    def _plan(self):
        from avec_tpu.models.conformer import ConformerInterCTC

        net = self.model.net
        # Mirrors AudioEfficientConformerEncoder's back_end construction.
        # dim_model/kernel_size are architecture constants hardcoded there
        # (encoders.py: dim_model=[180,256,360], kernel_size=15);
        # num_blocks/interctc_blocks come from the LIVE model so non-default
        # sizes (e.g. configs/Synthetic num_blocks=[2,2,1]) get correct
        # cache shapes instead of silently wrong ones.
        return ConformerInterCTC(
            dim_model=[180, 256, 360], num_blocks=list(net.num_blocks),
            interctc_blocks=list(net.interctc_blocks),
            vocab_size=net.vocab_size, att_params=None,
            kernel_size=15, conv_stride=2).stream_plan()

    def _init_state(self, dtype):
        import jax.numpy as jnp

        L = self.left_context
        blocks = []
        for run in self._plan():
            l_s = L >> run["stage_id"]
            shapes = {
                "att": {"K": (1, l_s, run["dim_model"]),
                        "V": (1, l_s, run["dim_model"])},
                "conv": (1, run["kernel_size"] - 1, run["dim_expand"]),
            }
            lead = (run["n_layers"],) if run["scanned"] else ()

            def mk(shape):
                return jnp.zeros(lead + shape, dtype)
            blocks.append({"att": {"K": mk(shapes["att"]["K"]),
                                   "V": mk(shapes["att"]["V"])},
                           "conv": mk(shapes["conv"])})
        # Stem tail is time-major, matching the encoder's stem orientation:
        # (B, 2 tail frames, n_mels, 1).
        return {"stem": jnp.zeros((1, 2, 80, 1), dtype), "blocks": blocks}

    def _build(self):
        import jax
        import jax.numpy as jnp
        from jax import lax

        from avec_tpu.ops.audio import AudioPreprocessing

        model, F, L = self.model, self.chunk, self.left_context
        if not getattr(model, "built", False):
            warm = np.zeros((1, 4000), np.float32)
            model.build([warm, np.array([4000], np.int32)],
                        precision=self.precision)
        dtype = (jnp.bfloat16 if self.precision == "bfloat16"
                 else jnp.float32)
        self._state = self._init_state(dtype)
        # One jitted step per (model, chunk, precision): new transcriber
        # instances (one per serving session / eval utterance) reuse it
        # instead of re-tracing — tracing the whole encoder per session
        # costs seconds even with a warm persistent compile cache.
        cache = getattr(model, "_causal_stream_steps", None)
        if cache is None:
            cache = model._causal_stream_steps = {}
        ckey = (F, self.precision, self.left_context)
        if ckey in cache:
            self._step = cache[ckey]
            return
        plan = self._plan()
        ap = AudioPreprocessing(sample_rate=16000, n_fft=N_FFT,
                                win_length_ms=25, hop_length_ms=10,
                                n_mels=80, normalize=False,
                                mean=-5.6501, std=4.2280)
        net = model.net
        c1 = F // 2  # stage-1 (50 Hz) frames per chunk

        def masks_for(p1):
            masks = []
            for s in range(3):
                l_s, c_s = L >> s, c1 >> s
                valid = jnp.minimum(p1 // (1 << s), l_s)
                i = lax.broadcasted_iota(jnp.int32, (c_s, l_s + c_s), 0)
                j = lax.broadcasted_iota(jnp.int32, (c_s, l_s + c_s), 1)
                m = (j >= i) & (j <= l_s + i) & (j >= l_s - valid)
                masks.append(m[None, None])
            return masks

        def step(params, batch_stats, xp, state, p1):
            fb = ap.stream_frames(xp[None].astype(jnp.float32), F)
            logits, new_state = net.apply(
                {"params": params, "batch_stats": batch_stats},
                fb.astype(dtype), None, False, state, masks_for(p1))
            blocks = []
            for run, st in zip(plan, new_state["blocks"]):
                l_s = L >> run["stage_id"]
                att = {"K": st["att"]["K"][..., -l_s:, :],
                       "V": st["att"]["V"][..., -l_s:, :]}
                blocks.append({"att": att, "conv": st["conv"]})
            preds = jnp.argmax(logits.astype(jnp.float32), axis=-1)[0]
            return preds, logits[0], {"stem": new_state["stem"],
                                      "blocks": blocks}

        self._step = cache[ckey] = jax.jit(step)

    # ------------------------------------------------------------ chunking
    def _window(self, f0: int, end_reflect: bool) -> np.ndarray:
        """Raw samples covering fbank frames [f0, f0+chunk): padded signal
        slice [f0*hop, (f0+chunk-1)*hop + n_fft), where padded = reflect(256)
        + x (+ reflect(256) at finish). Fixed length; zero-filled past the
        available signal (those frames are truncated by the caller)."""
        n = len(self._buffer)
        length = (self.chunk - 1) * HOP + N_FFT
        lo = f0 * HOP - PAD
        out = np.zeros((length,), np.float32)
        # Head reflect (session start only).
        if lo < 0:
            head = self._buffer[1: 1 - lo][::-1]
            out[: len(head)] = head
            src_lo, dst = 0, -lo
        else:
            src_lo, dst = lo, 0
        take = self._buffer[src_lo: src_lo + (length - dst)]
        out[dst: dst + len(take)] = take
        if end_reflect:
            # Append the end reflection where the window extends past n.
            tail_start = dst + len(take)
            need = length - tail_start
            if need > 0 and n >= 2:
                # x[n-2], x[n-3], ..., x[n-1-need] (bounded by the signal).
                stop = max(-2 - need, -n - 1)
                refl = self._buffer[-2: stop: -1]
                refl = refl[:need]
                out[tail_start: tail_start + len(refl)] = refl
        return out

    def _run_block(self, f0: int, end_reflect: bool = False):
        import time

        import jax

        if self._step is None:
            self._build()
        xp = self._window(f0, end_reflect)
        p1 = np.int32(self._f_done // 2)
        t0 = time.perf_counter()
        preds, logits, self._state = self._step(
            self.model.params, self.model.batch_stats, xp, self._state, p1)
        preds = np.asarray(preds)
        if self.collect_logits:
            self.logits_chunks.append(np.asarray(logits, np.float32))
        dt = time.perf_counter() - t0
        self.device_seconds += dt
        self.push_latencies.append(dt)
        self._f_done += self.chunk
        return preds

    def _emit(self, preds: np.ndarray):
        for p in preds.tolist():
            if p != self.blank and p != self._prev:
                self._tokens.append(int(p))
            self._prev = p
        self._o_done += len(preds)

    def _text(self) -> str:
        return (self.decoder.tokenizer.decode([self._tokens])[0]
                if self._tokens else "")

    # ----------------------------------------------------------------- API
    def push(self, pcm: np.ndarray) -> dict:
        """Ingest PCM; run every complete chunk; return the partial (which
        is also FINAL for all emitted tokens — the model is causal)."""
        assert not self._finished, "push() after finish()"
        pcm = np.asarray(pcm, np.float32).reshape(-1)
        self._buffer = np.concatenate([self._buffer, pcm])
        n = len(self._buffer)
        # Frames [f0, f0+F) need samples through (f0+F-1)*hop + 256.
        while (self._f_done + self.chunk - 1) * HOP + PAD <= n:
            self._emit(self._run_block(self._f_done))
        return {"text": self._text(), "final": False,
                "committed_frames": self._o_done}

    def finish(self) -> dict:
        """Process the remaining frames (with torch.stft end reflection) and
        return the final transcript. Output-frame count matches the offline
        forward exactly: od^3(T//hop + 1)."""
        if not self._finished:
            n = len(self._buffer)
            total_f = n // HOP + 1 if n else 0
            o_total = _od(_od(_od(total_f))) if total_f else 0
            while self._f_done < total_f:
                preds = self._run_block(self._f_done, end_reflect=True)
                keep = min(len(preds), o_total - self._o_done)
                self._emit(preds[:keep])
            self._finished = True
            self._o_total = o_total
        return {"text": self._text(), "final": True,
                "device_seconds": self.device_seconds}
