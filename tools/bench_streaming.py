# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Per-push latency curve: causal O(chunk) streaming vs full-recompute.

VERDICT r3 item 5 asks for the per-push latency CURVE on record, not just
the exactness test: the causal transcriber (decode/causal_streaming.py)
must stay FLAT as the session grows, while the bidirectional
StreamingTranscriber (decode/streaming.py) re-runs the forward over the
whole buffer each push — exact, but O(T) per push / O(T^2) per session
(bounded only by window_seconds).

Drives both over one long synthetic utterance and prints a JSON line per
mode with p50 push latency per 10 s bucket of session time — the causal
row should be ~constant, the unbounded row should grow roughly linearly.

Usage:
  python tools/bench_streaming.py [--seconds 60] [--hop 0.48]
      [--left_context 128] [--platform cpu|axon]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _curve(latencies, push_seconds, bucket_s=10.0):
    """p50 latency (ms) per bucket of session audio time."""
    out = []
    t = 0.0
    cur = []
    edge = bucket_s
    for lat in latencies:
        t += push_seconds
        cur.append(lat)
        if t >= edge:
            cur.sort()
            out.append(round(1e3 * cur[len(cur) // 2], 1))
            cur, edge = [], edge + bucket_s
    if cur:
        cur.sort()
        out.append(round(1e3 * cur[len(cur) // 2], 1))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--hop", type=float, default=0.48,
                    help="push size in seconds (0.48 s = 48 fbank frames)")
    ap.add_argument("--left_context", type=int, default=128)
    ap.add_argument("--platform", default=os.environ.get("STREAM_PLATFORM",
                                                         "cpu"))
    ap.add_argument("--skip_unbounded", action="store_true")
    ap.add_argument("--window", type=float, default=0.0,
                    help="also run a WINDOWED session bounded to this many "
                         "seconds: reports the latency curve, the jit "
                         "bucket set, and RSS — all must stay flat/bounded "
                         "over a minutes-long session")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/avec_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from avec_tpu.decode.causal_streaming import CausalStreamingTranscriber
    from avec_tpu.decode.streaming import StreamingTranscriber
    from avec_tpu.models.zoo import AudioEfficientConformerInterCTC

    # Latency bench decodes random-init logits: an identity "tokenizer"
    # (token id -> str) keeps host decode out of the measured path's noise.
    class _IdTok:
        def decode(self, ids_list):
            return [" ".join(map(str, ids)) for ids in ids_list]

    class _IdDec:
        blank_token = 0
        tokenizer = _IdTok()

    rng = np.random.RandomState(0)
    pcm = (rng.randn(int(args.seconds * 16000)) * 0.1).astype(np.float32)
    hop = int(args.hop * 16000)
    dec = _IdDec()

    # Causal: one jitted fixed-shape step, carried state.
    causal_model = AudioEfficientConformerInterCTC(
        vocab_size=32, causal=True, left_context=args.left_context)
    causal_model.compile()
    st = CausalStreamingTranscriber(causal_model, dec,
                                    chunk_frames=max(8, (hop // 160) // 8 * 8))
    for i in range(0, len(pcm) - hop + 1, hop):
        st.push(pcm[i: i + hop])
    st.finish()
    lat = st.push_latencies[1:]  # drop the compile push
    print(json.dumps({
        "metric": "streaming_push_latency_p50_ms_per_10s",
        "mode": "causal_exact_ochunk",
        "push_seconds": args.hop,
        "curve": _curve(lat, args.hop),
        "p50_ms": round(1e3 * sorted(lat)[len(lat) // 2], 1),
        "p95_ms": round(1e3 * sorted(lat)[int(len(lat) * 0.95)], 1),
    }), flush=True)

    if args.window > 0:
        # Windowed bounded-state session: O(window) memory by construction
        # (committed PCM is dropped; giant pushes process hop-by-hop so the
        # encoder never sees more than window + hop samples).
        import resource

        wmodel = AudioEfficientConformerInterCTC(vocab_size=32)
        wmodel.compile()
        ws = StreamingTranscriber(wmodel, dec, hop_seconds=args.hop,
                                  window_seconds=args.window)
        w_lat, max_buf = [], 0
        for i in range(0, len(pcm) - hop + 1, hop):
            t0 = time.perf_counter()
            ws.push(pcm[i: i + hop])
            w_lat.append(time.perf_counter() - t0)
            max_buf = max(max_buf, len(ws._buffer))
        ws.finish()
        lat = w_lat[1:]
        print(json.dumps({
            "metric": "streaming_push_latency_p50_ms_per_10s",
            "mode": f"windowed_{args.window:g}s",
            "push_seconds": args.hop,
            "curve": _curve(lat, args.hop),
            "p50_ms": round(1e3 * sorted(lat)[len(lat) // 2], 1),
            "p95_ms": round(1e3 * sorted(lat)[int(len(lat) * 0.95)], 1),
            "jit_buckets": sorted(ws._fwd_cache),
            "max_buffered_samples": max_buf,
            "bound_samples": ws.window + ws.hop,
            "maxrss_mb": round(
                resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024),
        }), flush=True)

    if args.skip_unbounded:
        return

    # Bidirectional unbounded: exact but re-runs the whole buffer per push.
    model = AudioEfficientConformerInterCTC(vocab_size=32)
    model.compile()
    ub = StreamingTranscriber(model, dec, hop_seconds=args.hop)
    t_lat = []
    for i in range(0, len(pcm) - hop + 1, hop):
        t0 = time.perf_counter()
        ub.push(pcm[i: i + hop])
        t_lat.append(time.perf_counter() - t0)
    ub.finish()
    # power-of-two bucketing retraces at each new bucket: report the curve
    # over pushes that hit an existing bucket too (compile spikes included
    # in p95, excluded from the curve via median-per-bucket).
    print(json.dumps({
        "metric": "streaming_push_latency_p50_ms_per_10s",
        "mode": "unbounded_full_recompute",
        "push_seconds": args.hop,
        "curve": _curve(t_lat[1:], args.hop),
        "p50_ms": round(1e3 * sorted(t_lat)[len(t_lat) // 2], 1),
    }), flush=True)


if __name__ == "__main__":
    main()
