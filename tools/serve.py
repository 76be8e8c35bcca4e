# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Batched serving loop for AVEC models.

Loads a model once (our msgpack checkpoints or the released torch .ckpt via
the converter), then transcribes requests — wav (audio-only), mp4
(visual-only) or mp4+wav (audio-visual) — either from argv or as a
long-running stdin loop (one path per line -> one JSON result per line).

Serving-path engineering, the part the reference leaves to notebooks:
  * ONE jitted forward, compiled per (batch-bucket, length-bucket) —
    power-of-two padded batch and sequence dims, so steady-state requests
    never retrace or recompile;
  * cross-request batching: the stdin loop gathers up to --max_batch
    pending requests inside a --batch_window_ms linger window and runs
    them as one device batch (throughput under load, low latency when
    idle);
  * padding is masked by the model's length semantics, so neither bucket
    padding nor batch padding changes the transcription (tested);
  * decoder split: device argmax/collapse (jitted) + host detokenize or
    C++ beam search + n-gram + optional GPT rescoring, exactly the eval
    stack (avec_tpu/decode/);
  * latency accounting: every response carries queue-to-response latency
    and RTF; a run summary (p50/p95 latency, throughput) prints to stderr
    at EOF.

  * streaming: --stream feeds a wav through the incremental
    push/partial/final API (avec_tpu/decode/streaming.py) — bucketed-jit
    chunked forwards, CTC blank-run commits, optional bounded window.

Usage:
  python tools/serve.py --mode ao --checkpoint ckpt.ckpt a.wav b.wav
  ... --stdin --max_batch 8 --batch_window_ms 50   # serve stdin until EOF
  ... --mode av clip.mp4      # expects clip.wav next to the video
  ... --stream --chunk_ms 480 a.wav   # live partial transcripts
"""

import argparse
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bucket(n: int, floor: int = 4000) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


def _batch_bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


class Server:
    def __init__(self, mode: str = "ao", checkpoint: str = None,
                 tokenizer: str = "datasets/LRS3/tokenizerbpe256.json",
                 decoder: str = "greedy", decoder_kwargs: dict = None,
                 precision: str = "bfloat16", causal: bool = False,
                 left_context: int = 128):
        import avec_tpu as nnet

        self.mode = mode
        self.precision = precision
        self.causal = causal
        if mode == "ao":
            self.model = nnet.AudioEfficientConformerInterCTC(
                interctc_blocks=[], causal=causal,
                left_context=left_context if causal else None)
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
                # Full eval decode stack: beam + optional 6-gram ARPA +
                # optional GPT neural rescoring (ref nnet/decoders.py:185-242).
                self.decoder = nnet.CTCBeamSearchDecoder(
                    tokenizer, **(decoder_kwargs or {}))
        self._fwd_cache = {}
        self.latencies = []  # queue-to-response seconds, one per request
        self.rtfs = []

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

    @staticmethod
    def _request_samples(req) -> int:
        """Audio-sample-equivalent length of a request (for bucketing)."""
        n = len(req.get("audio", []))
        return int(n) if n else int(req["video"].shape[0] * 640)

    def _inputs_for(self, req, bucket_len):
        """Single-request inputs (B=1); kept for the argv path and tests."""
        return self._inputs_for_batch([req], bucket_len, 1)

    # Batch-padding rows are zero audio/video with this many samples of
    # valid length: short enough to cost nothing to compute or decode, long
    # enough that every mask row has real frames (no all-masked attention).
    PAD_ROW_SAMPLES = 2560  # 2 encoder frames at 12.5 Hz

    def _inputs_for_batch(self, reqs, bucket_len, batch_bucket):
        """Pad a list of requests into one (batch_bucket, bucket_len) batch.

        Padding rows are zero-filled with a tiny valid length — their
        outputs are discarded before host decoding (transcribe_batch slices
        to the real rows), so no decode time is wasted on them."""
        pad_samples = min(self.PAD_ROW_SAMPLES, bucket_len)

        def audio_pack():
            pad = np.zeros((batch_bucket, bucket_len), np.float32)
            lens = np.full((batch_bucket,), pad_samples, np.int32)
            for i, r in enumerate(reqs):
                a = r["audio"]
                pad[i, : len(a)] = a
                lens[i] = len(a)
            return [pad, lens]

        if self.mode == "ao":
            return audio_pack()
        vb = bucket_len // 640 + 1
        vshape = reqs[0]["video"].shape[1:]
        vpad = np.zeros((batch_bucket, vb) + vshape, np.float32)
        vlens = np.full((batch_bucket,), pad_samples // 640 + 1, np.int32)
        for i, r in enumerate(reqs):
            v = r["video"]
            vpad[i, : v.shape[0]] = v
            vlens[i] = v.shape[0]
        vin = [vpad, vlens]
        if self.mode == "vo":
            return vin
        return vin + audio_pack()

    # ----------------------------------------------------------- forward
    def ensure_built(self, inputs):
        """Build the model and load the checkpoint exactly once. Shared by
        the batch path and the streaming path (the latter previously
        bypassed build+load and streamed with random weights)."""
        if not self._built:
            self.model.build(inputs, precision=self.precision)
            if self.checkpoint and os.path.isfile(self.checkpoint):
                self.model.load(self.checkpoint, load_optimizer=False)
            elif self.checkpoint:
                raise FileNotFoundError(self.checkpoint)
            self._built = True

    def _forward(self, inputs):
        import jax

        self.ensure_built(inputs)
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

    # ------------------------------------------------------- transcription
    def submit_batch(self, paths, enqueue_times=None):
        """Load a batch and LAUNCH its device work; return a pending handle.

        JAX dispatch is asynchronous — the handle holds device futures, so
        the host is free to decode a previous batch (finish_batch) while
        this one runs on the device. Per-path load errors become {"file",
        "error"} results; the remaining requests still run."""
        if enqueue_times is None:
            enqueue_times = [time.perf_counter()] * len(paths)
        reqs, order, results = [], [], [None] * len(paths)
        for i, path in enumerate(paths):
            try:
                reqs.append(self.load_request(path))
                order.append(i)
            except Exception as e:  # keep serving
                results[i] = {"file": path, "error": str(e)}
        pending = {"paths": paths, "times": enqueue_times, "order": order,
                   "results": results, "n": len(reqs), "pre": None,
                   "samples": []}
        if reqs:
            samples = [self._request_samples(r) for r in reqs]
            bucket_len = _bucket(max(samples))
            inputs = self._inputs_for_batch(reqs, bucket_len,
                                            _batch_bucket(len(reqs)))
            logits, lengths = self._forward(inputs)
            pending["samples"] = samples
            if self.decoder is not None:
                pending["pre"] = self.decoder.device_fn((logits, lengths))
            else:
                pending["pre"] = ()
        return pending

    def finish_batch(self, pending):
        """Fetch device outputs for a submitted batch, decode the REAL rows
        only (padding rows never reach the host decoder), format results."""
        import jax

        n = pending["n"]
        results, order = pending["results"], pending["order"]
        if n:
            if self.decoder is not None:
                pre = jax.tree.map(lambda a: np.asarray(a)[:n],
                                   pending["pre"])
                texts = self.decoder(pre)
            else:
                texts = [None] * n
            done = time.perf_counter()
            for k, i in enumerate(order):
                dt = done - pending["times"][i]
                dur = pending["samples"][k] / 16000.0
                self.latencies.append(dt)
                self.rtfs.append(dt / max(dur, 1e-6))
                results[i] = {"file": pending["paths"][i], "text": texts[k],
                              "latency_s": round(dt, 4),
                              "rtf": round(dt / max(dur, 1e-6), 5),
                              "batch_size": n,
                              "compiled_buckets": len(self._fwd_cache)}
        return results

    def transcribe_batch(self, paths, enqueue_times=None):
        """Transcribe a list of paths as ONE device batch (submit+finish).

        Latency is measured from enqueue_times[i] (defaults to now) to the
        moment the request's result is ready — it includes queue wait,
        preprocessing, device time and decoding."""
        return self.finish_batch(self.submit_batch(paths, enqueue_times))

    def transcribe(self, path: str):
        return self.transcribe_batch([path])[0]

    def stats_summary(self):
        """Aggregate latency/throughput stats over the server's lifetime."""
        if not self.latencies:
            return {"requests": 0}
        lat = np.sort(np.asarray(self.latencies))
        return {"requests": int(lat.size),
                "latency_p50_s": round(float(lat[lat.size // 2]), 4),
                "latency_p95_s": round(float(lat[min(lat.size - 1,
                                                     int(lat.size * 0.95))]), 4),
                "latency_mean_s": round(float(lat.mean()), 4),
                "rtf_mean": round(float(np.mean(self.rtfs)), 5),
                "compiled_buckets": len(self._fwd_cache)}


def _stdin_loop(srv, max_batch: int, window_ms: float, out=sys.stdout):
    """Batching request loop: block on the first pending path, then linger
    up to window_ms gathering more (bounded by max_batch) before running
    one device batch. Under load the window fills instantly; when idle a
    single request pays at most the linger.

    Host/device pipelining (one-deep): batch N is submitted to the device
    (async dispatch) BEFORE batch N-1's host decode runs, so beam+LM decode
    of N-1 overlaps device compute of N. When the queue is empty the
    pending batch is finished immediately — idle latency is unchanged."""
    q = queue.Queue()
    EOF = object()

    def reader():
        for line in sys.stdin:
            if line.strip():
                q.put((line.strip(), time.perf_counter()))
        q.put((EOF, None))

    threading.Thread(target=reader, daemon=True).start()
    pending = None  # one-deep device pipeline

    def emit(batch_pending):
        for r in srv.finish_batch(batch_pending):
            print(json.dumps(r), file=out, flush=True)

    while True:
        path, t0 = q.get()
        if path is EOF:
            break
        batch, times = [path], [t0]
        deadline = time.perf_counter() + window_ms / 1000.0
        eof = False
        while len(batch) < max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                p, t = q.get(timeout=remaining)
            except queue.Empty:
                break
            if p is EOF:
                eof = True
                break
            batch.append(p)
            times.append(t)
        submitted = srv.submit_batch(batch, times)  # device starts now
        if pending is not None:
            emit(pending)  # host decode overlaps the running device batch
        pending = submitted
        if eof or q.empty():
            emit(pending)
            pending = None
        if eof:
            break
    if pending is not None:
        emit(pending)


def _stream_file(srv, path: str, chunk_ms: float, window_s: float,
                 out=sys.stdout):
    """Simulated live stream: feed a wav in chunk_ms slices through
    StreamingTranscriber, printing one JSON partial per forward and a
    final line (avec_tpu/decode/streaming.py)."""
    audio = srv.load_request(path)["audio"]
    # Build + checkpoint-load through the same path as batch serving (same
    # precision, same weights) BEFORE streaming: the transcribers honor an
    # already-built model and will not re-initialize it.
    warm = np.zeros((1, 4000), np.float32)
    srv.ensure_built([warm, np.array([4000], np.int32)])
    if srv.causal:
        # Causal model: exact O(chunk) streaming with carried KV/conv state
        # (decode/causal_streaming.py); every emitted token is final.
        from avec_tpu.decode.causal_streaming import CausalStreamingTranscriber

        st = CausalStreamingTranscriber(srv.model, srv.decoder,
                                        precision=srv.precision)
    else:
        from avec_tpu.decode.streaming import StreamingTranscriber

        st = StreamingTranscriber(srv.model, srv.decoder,
                                  window_seconds=window_s or None,
                                  precision=srv.precision)
    step = max(1, int(chunk_ms * 16))
    last = None
    for start in range(0, len(audio), step):
        r = st.push(audio[start: start + step])
        if r["text"] != last:
            last = r["text"]
            print(json.dumps({"file": path, "partial": r["text"],
                              "t": round((start + step) / 16000.0, 2)}),
                  file=out, flush=True)
    final = st.finish()
    print(json.dumps({"file": path, "text": final["text"], "final": True,
                      "device_seconds": round(final["device_seconds"], 4)}),
          file=out, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="*")
    ap.add_argument("--mode", choices=["ao", "vo", "av"], default="ao")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tokenizer",
                    default="datasets/LRS3/tokenizerbpe256.json")
    ap.add_argument("--decoder", choices=["greedy", "beam"], default="greedy")
    ap.add_argument("--beam_size", type=int, default=16)
    ap.add_argument("--ngram", default=None,
                    help="ARPA n-gram LM path for --decoder beam "
                         "(ref: 6gram_lrs23.arpa)")
    ap.add_argument("--ngram_alpha", type=float, default=0.6)
    ap.add_argument("--ngram_beta", type=float, default=1.0)
    ap.add_argument("--ngram_tmp", type=float, default=1.0)
    ap.add_argument("--neural_config", default=None,
                    help="LM config module for GPT beam rescoring "
                         "(ref: configs/LRS23/LM/GPT-Small.py)")
    ap.add_argument("--neural_checkpoint", default=None,
                    help="LM checkpoint filename inside the config's "
                         "callback_path")
    ap.add_argument("--stdin", action="store_true",
                    help="serve request paths from stdin, one per line")
    ap.add_argument("--max_batch", type=int, default=8,
                    help="max requests batched into one device call")
    ap.add_argument("--batch_window_ms", type=float, default=50.0,
                    help="linger window for gathering a batch from stdin")
    ap.add_argument("--stream", action="store_true",
                    help="audio-only: stream each wav in chunks, printing "
                         "partial transcripts then a final one")
    ap.add_argument("--chunk_ms", type=float, default=480.0,
                    help="--stream chunk size in milliseconds")
    ap.add_argument("--stream_window_s", type=float, default=0.0,
                    help="--stream bounded audio window (0 = unbounded)")
    ap.add_argument("--causal", action="store_true",
                    help="audio-only: use the causal encoder variant; "
                         "--stream then runs exact O(chunk) cached-state "
                         "streaming (requires a causal-trained checkpoint)")
    ap.add_argument("--left_context", type=int, default=128,
                    help="causal attention history bound (stage-1 frames)")
    args = ap.parse_args()
    if args.stream and args.mode != "ao":
        ap.error("--stream is audio-only (use --mode ao)")
    if args.stream and not args.paths:
        ap.error("--stream requires at least one wav path")
    if (args.ngram or args.neural_config) and args.decoder != "beam":
        ap.error("--ngram/--neural_config require --decoder beam")

    decoder_kwargs = {}
    if args.decoder == "beam":
        decoder_kwargs = dict(beam_size=args.beam_size,
                              ngram_path=args.ngram,
                              ngram_alpha=args.ngram_alpha,
                              ngram_beta=args.ngram_beta,
                              ngram_tmp=args.ngram_tmp,
                              neural_config_path=args.neural_config,
                              neural_checkpoint=args.neural_checkpoint)
    if args.causal and args.mode != "ao":
        ap.error("--causal is audio-only (use --mode ao)")
    srv = Server(mode=args.mode, checkpoint=args.checkpoint,
                 tokenizer=args.tokenizer, decoder=args.decoder,
                 decoder_kwargs=decoder_kwargs, causal=args.causal,
                 left_context=args.left_context)
    if not args.checkpoint:
        print("WARNING: no checkpoint — transcriptions will be noise",
              file=sys.stderr)

    if args.stream:
        for path in args.paths:
            _stream_file(srv, path, args.chunk_ms, args.stream_window_s)
    elif args.paths:
        for r in srv.transcribe_batch(list(args.paths)):
            print(json.dumps(r), flush=True)
    if args.stdin:
        _stdin_loop(srv, args.max_batch, args.batch_window_ms)
    print(json.dumps({"summary": srv.stats_summary()}), file=sys.stderr,
          flush=True)


if __name__ == "__main__":
    main()
