# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Beam-decode throughput bench: C++ native (serial + thread pool) vs the
Python prefix beam search, at the reference's operating point (beam 16,
6-gram char ARPA, V=256, 12.5 Hz output frames — ref nnet/decoders.py:28-31,
eval_models.sh).

Usage: python tools/bench_decode.py [--utts 16] [--seconds 6] [--beam 16]
Prints one JSON line with utt/s for each path and the native/python ratio.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avec_tpu.decode.beam import ctc_prefix_beam_search  # noqa: E402
from avec_tpu.decode.native import NativeBeamDecoder  # noqa: E402
from avec_tpu.decode.ngram import ArpaLM  # noqa: E402


def synthetic_char_arpa(path, vocab, offset=100, order=6, seed=0):
    """A random (but well-formed, normalized-ish) backoff ARPA over the
    chr(idx + offset) token vocabulary, with a sample of higher-order grams
    so backoff walks actually run."""
    rng = np.random.RandomState(seed)
    words = [chr(i + offset) for i in range(1, vocab)]  # blank never scored
    lines = ["\\data\\"]
    ngrams = {1: [(w,) for w in words]}
    for n in range(2, order + 1):
        grams = set()
        for _ in range(min(2000, len(words) ** 2)):
            grams.add(tuple(rng.choice(words, size=n)))
        ngrams[n] = grams
    # Suffix closure (KenLM/SRILM structural property the decoder's LM-state
    # optimization relies on): every sub-gram of a stored n-gram is stored.
    for n in range(order, 2, -1):
        for g in ngrams[n]:
            ngrams[n - 1].add(g[1:])
            ngrams[n - 1].add(g[:-1])
    ngrams = {n: sorted(g) if isinstance(g, set) else g
              for n, g in ngrams.items()}
    for n in range(1, order + 1):
        lines.append(f"ngram {n}={len(ngrams[n])}")
    lines.append("")
    for n in range(1, order + 1):
        lines.append(f"\\{n}-grams:")
        for g in ngrams[n]:
            logp = -1.0 - 2.0 * rng.rand()
            if n < order:
                bo = -0.2 - 0.5 * rng.rand()
                lines.append(f"{logp:.4f}\t{' '.join(g)}\t{bo:.4f}")
            else:
                lines.append(f"{logp:.4f}\t{' '.join(g)}")
        lines.append("")
    lines.append("\\end\\")
    with open(path, "w") as f:
        f.write("\n".join(lines))


def peaky_batch(rng, utts, t, v, peak=3.0):
    """Speech-like log-prob batch: blank-dominated with peaked tokens."""
    logits = rng.randn(utts, t, v).astype(np.float32)
    # Make blanks likely and a random token per frame peaked (CTC-like).
    logits[:, :, 0] += 2.0
    tok = rng.randint(1, v, size=(utts, t))
    for i in range(utts):
        logits[i, np.arange(t), tok[i]] += peak
    m = logits.max(axis=-1, keepdims=True)
    lse = m + np.log(np.exp(logits - m).sum(axis=-1, keepdims=True))
    return (logits - lse).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=16)
    ap.add_argument("--seconds", type=float, default=6.0)
    ap.add_argument("--beam", type=int, default=16)
    ap.add_argument("--vocab", type=int, default=256)
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 1)
    ap.add_argument("--skip_python", action="store_true")
    ap.add_argument("--device", action="store_true",
                    help="also bench the jitted device beam search "
                         "(decode/device_beam.py) on the default JAX "
                         "platform (set JAX_PLATFORMS / DEVICE_PLATFORM)")
    ap.add_argument("--device_cutoff", type=int, default=0,
                    help="cutoff_top_n for the device leg (0 = full vocab)")
    args = ap.parse_args()

    t = int(args.seconds * 12.5)  # AV output frame rate (12.5 Hz)
    rng = np.random.RandomState(0)
    lp = peaky_batch(rng, args.utts, t, args.vocab)
    seq_lens = np.full((args.utts,), t, np.int32)

    with tempfile.TemporaryDirectory() as td:
        arpa = os.path.join(td, "6gram.arpa")
        synthetic_char_arpa(arpa, args.vocab)

        dec = NativeBeamDecoder(blank=0, beam_size=args.beam, alpha=0.6,
                                beta=1.0, ngram_path=arpa, ngram_offset=100,
                                num_threads=args.threads)
        # Warmup (token-table build) + correctness anchor.
        ref = dec.decode(lp[0], t)

        t0 = time.perf_counter()
        for i in range(args.utts):
            dec.decode(lp[i], t)
        native_serial = args.utts / (time.perf_counter() - t0)

        t0 = time.perf_counter()
        batch = dec.decode_batch(lp, seq_lens)
        native_batch = args.utts / (time.perf_counter() - t0)
        assert [p for p, _ in batch[0]] == [p for p, _ in ref]

        device_rate = None
        device_match = None
        if args.device:
            import jax

            plat = os.environ.get("DEVICE_PLATFORM")
            if plat:
                jax.config.update("jax_platforms", plat)
            from avec_tpu.decode.device_beam import (
                DeviceNgramTables,
                device_beam_search,
            )

            tables = DeviceNgramTables(ArpaLM(arpa), offset=100,
                                       vocab_size=args.vocab)
            cut = args.device_cutoff or None
            kw = dict(beam_size=args.beam, tables=tables, alpha=0.6,
                      beta=1.0, cutoff_top_n=cut)
            dref = device_beam_search(lp[:1], seq_lens[:1], **kw)  # compile
            device_match = ([p for p, _ in dref[0][:4]]
                            == [p for p, _ in ref[:4]])
            t0 = time.perf_counter()
            device_beam_search(lp, seq_lens, **kw)
            device_rate = args.utts / (time.perf_counter() - t0)

        python_rate = None
        if not args.skip_python:
            lm = ArpaLM(arpa)
            n_py = min(4, args.utts)  # python path is slow; extrapolate
            t0 = time.perf_counter()
            for i in range(n_py):
                ctc_prefix_beam_search(
                    lp[i], t, args.beam, blank=0, lm=lm, alpha=0.6, beta=1.0,
                    token_to_word=lambda c: chr(c + 100))
            python_rate = n_py / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "beam_decode_utt_per_sec",
        "beam": args.beam, "seconds": args.seconds, "vocab": args.vocab,
        "frames": t, "threads": args.threads,
        "native_serial_utt_per_sec": round(native_serial, 2),
        "native_batch_utt_per_sec": round(native_batch, 2),
        "python_utt_per_sec": (round(python_rate, 3)
                               if python_rate else None),
        "native_vs_python": (round(native_batch / python_rate, 1)
                             if python_rate else None),
        "device_utt_per_sec": (round(device_rate, 2)
                               if args.device else None),
        "device_top4_matches_native": device_match if args.device else None,
        "device_cutoff_top_n": args.device_cutoff or None,
    }))


if __name__ == "__main__":
    main()
