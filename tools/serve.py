# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Minimal production serving loop for AVEC models.

Loads a model once (our msgpack checkpoints or the released torch .ckpt via
the converter), then transcribes requests — wav (audio-only), mp4
(visual-only) or mp4+wav (audio-visual) — either from argv or as a
long-running stdin loop (one path per line -> one JSON result per line).

Serving-path engineering, the part the reference leaves to notebooks:
  * ONE jitted forward, compiled per length bucket (power-of-two padded
    lengths) — steady-state requests never retrace or recompile;
  * padding is masked by the model's length semantics, so bucket padding
    does not change the transcription;
  * decoder split: device argmax/collapse (jitted) + host detokenize or
    C++ beam search + n-gram + optional GPT rescoring, exactly the eval
    stack (avec_tpu/decode/).

Usage:
  python tools/serve.py --mode ao --checkpoint ckpt.ckpt a.wav b.wav
  ... --stdin        # serve lines from stdin until EOF
  ... --mode av clip.mp4      # expects clip.wav next to the video
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bucket(n: int, floor: int = 4000) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


class Server:
    def __init__(self, mode: str = "ao", checkpoint: str = None,
                 tokenizer: str = "datasets/LRS3/tokenizerbpe256.json",
                 decoder: str = "greedy"):
        import avec_tpu as nnet

        self.mode = mode
        if mode == "ao":
            self.model = nnet.AudioEfficientConformerInterCTC(interctc_blocks=[])
        elif mode == "vo":
            self.model = nnet.VisualEfficientConformerInterCTC()
        else:
            self.model = nnet.AudioVisualEfficientConformerInterCTC()
        self.model.compile(losses=nnet.CTCLoss(zero_infinity=True,
                                               assert_shorter=False))
        self._built = False
        self.checkpoint = checkpoint
        self.decoder = None
        self.device_fn = None
        if os.path.isfile(tokenizer):
            if decoder == "greedy":
                self.decoder = nnet.CTCGreedySearchDecoder(tokenizer)
            else:
                self.decoder = nnet.CTCBeamSearchDecoder(tokenizer)
        self._fwd_cache = {}

    # ------------------------------------------------------------ inputs
    def load_request(self, path: str):
        """path -> model inputs (unbatched)."""
        from avec_tpu.utils import media

        if path.endswith(".wav") or path.endswith(".flac"):
            audio, sr = media.read_audio(path)
            if sr != 16000:
                audio = media.resample_audio(audio, sr, 16000)
            return {"audio": audio.astype(np.float32)}
        # video request
        from demo import load_av_inputs

        video, audio, _ = load_av_inputs(path)
        out = {"video": video.astype(np.float32)}
        if audio is not None:
            out["audio"] = audio.astype(np.float32)
        return out

    def _inputs_for(self, req, bucket_len):
        if self.mode == "ao":
            audio = req["audio"]
            pad = np.zeros((1, bucket_len), np.float32)
            pad[0, : len(audio)] = audio
            return [pad, np.array([len(audio)], np.int32)]
        video = req["video"]
        vb = bucket_len // 640 + 1
        vpad = np.zeros((1, vb) + video.shape[1:], np.float32)
        vpad[0, : video.shape[0]] = video
        vin = [vpad, np.array([video.shape[0]], np.int32)]
        if self.mode == "vo":
            return vin
        audio = req["audio"]
        apad = np.zeros((1, bucket_len), np.float32)
        apad[0, : len(audio)] = audio
        return vin + [apad, np.array([len(audio)], np.int32)]

    # ----------------------------------------------------------- forward
    def _forward(self, inputs):
        import jax

        if not self._built:
            self.model.build(inputs, precision="bfloat16")
            if self.checkpoint and os.path.isfile(self.checkpoint):
                self.model.load(self.checkpoint, load_optimizer=False)
            elif self.checkpoint:
                raise FileNotFoundError(self.checkpoint)
            self._built = True
        key = tuple(tuple(np.shape(a)) for a in inputs)
        if key not in self._fwd_cache:
            model = self.model

            @jax.jit
            def fwd(params, batch_stats, *args):
                out, _ = model.apply_net(params, batch_stats, list(args),
                                         False, None)
                return out["outputs"]
            self._fwd_cache[key] = fwd
        return self._fwd_cache[key](self.model.params, self.model.batch_stats,
                                    *inputs)

    def transcribe(self, path: str):
        import jax

        req = self.load_request(path)
        n = len(req.get("audio", [])) or req["video"].shape[0] * 640
        inputs = self._inputs_for(req, _bucket(int(n)))
        t0 = time.perf_counter()
        logits, lengths = self._forward(inputs)
        if self.decoder is not None:
            pre = jax.tree.map(np.asarray,
                               self.decoder.device_fn((logits, lengths)))
            text = self.decoder(pre)[0]
        else:
            text = None
        dt = time.perf_counter() - t0
        dur = n / 16000.0
        return {"file": path, "text": text, "latency_s": round(dt, 4),
                "rtf": round(dt / max(dur, 1e-6), 5),
                "compiled_buckets": len(self._fwd_cache)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="*")
    ap.add_argument("--mode", choices=["ao", "vo", "av"], default="ao")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tokenizer",
                    default="datasets/LRS3/tokenizerbpe256.json")
    ap.add_argument("--decoder", choices=["greedy", "beam"], default="greedy")
    ap.add_argument("--stdin", action="store_true",
                    help="serve request paths from stdin, one per line")
    args = ap.parse_args()

    srv = Server(mode=args.mode, checkpoint=args.checkpoint,
                 tokenizer=args.tokenizer, decoder=args.decoder)
    if not args.checkpoint:
        print("WARNING: no checkpoint — transcriptions will be noise",
              file=sys.stderr)

    def handle(path):
        try:
            print(json.dumps(srv.transcribe(path.strip())), flush=True)
        except Exception as e:  # keep serving
            print(json.dumps({"file": path.strip(), "error": str(e)}),
                  flush=True)

    for p in args.paths:
        handle(p)
    if args.stdin:
        for line in sys.stdin:
            if line.strip():
                handle(line)


if __name__ == "__main__":
    main()
