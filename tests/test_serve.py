"""Serving-loop tests: bucketed compile cache + end-to-end transcription."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from avec_tpu.utils import media


def _write_wav(path, seconds, freq=440.0):
    t = np.arange(int(16000 * seconds)) / 16000.0
    media.write_audio(str(path), (0.3 * np.sin(2 * np.pi * freq * t))
                      .astype(np.float32), 16000)


def _make_tokenizer(path):
    from avec_tpu.utils import tokenizer as T

    pieces = T.train_bpe(["hello world serving test"] * 4, vocab_size=32)
    tok = T.Tokenizer(pieces)
    tok.save(str(path))
    return str(path)


def test_serve_ao_bucketed_compile_cache(tmp_path):
    import serve

    tok = _make_tokenizer(tmp_path / "tok.json")
    srv = serve.Server(mode="ao", checkpoint=None, tokenizer=tok)

    w1 = tmp_path / "a.wav"
    w2 = tmp_path / "b.wav"
    w3 = tmp_path / "c.wav"
    _write_wav(w1, 0.20)
    _write_wav(w2, 0.23, freq=220.0)  # same power-of-two bucket as w1
    _write_wav(w3, 0.60)              # larger bucket

    r1 = srv.transcribe(str(w1))
    r2 = srv.transcribe(str(w2))
    assert r1["compiled_buckets"] == 1
    assert r2["compiled_buckets"] == 1, "same-bucket request must not retrace"
    r3 = srv.transcribe(str(w3))
    assert r3["compiled_buckets"] == 2
    for r in (r1, r2, r3):
        assert isinstance(r["text"], str)
        assert r["rtf"] > 0
        json.dumps(r)  # serializable

    # Padding must not change the transcription: the same audio served in a
    # larger bucket decodes identically (length masking correctness).
    audio, _ = media.read_audio(str(w1))
    req = {"audio": audio.astype(np.float32)}
    import jax

    small = srv._inputs_for(req, serve._bucket(len(audio)))
    large = srv._inputs_for(req, serve._bucket(len(audio)) * 2)
    out_s = srv._forward(small)
    out_l = srv._forward(large)
    pre_s = jax.tree.map(np.asarray, srv.decoder.device_fn(tuple(out_s)))
    pre_l = jax.tree.map(np.asarray, srv.decoder.device_fn(tuple(out_l)))
    assert srv.decoder(pre_s)[0] == srv.decoder(pre_l)[0]


def test_serve_cross_request_batching(tmp_path):
    """A batch of requests runs as ONE device call and decodes each request
    identically to serving it alone (batch padding correctness), including
    when batch padding rows are added (3 requests -> batch bucket 4)."""
    import serve

    tok = _make_tokenizer(tmp_path / "tok.json")
    srv = serve.Server(mode="ao", checkpoint=None, tokenizer=tok)

    paths = []
    for i, (sec, freq) in enumerate([(0.20, 440.0), (0.23, 220.0),
                                     (0.15, 660.0)]):
        w = tmp_path / f"q{i}.wav"
        _write_wav(w, sec, freq=freq)
        paths.append(str(w))

    singles = [srv.transcribe(p) for p in paths]
    batched = srv.transcribe_batch(paths)
    assert [r["text"] for r in batched] == [r["text"] for r in singles]
    assert all(r["batch_size"] == 3 for r in batched)
    assert all(r["latency_s"] > 0 for r in batched)

    # Per-path failures must not poison the rest of the batch.
    mixed = srv.transcribe_batch([paths[0], str(tmp_path / "missing.wav")])
    assert mixed[0]["text"] == singles[0]["text"]
    assert "error" in mixed[1]

    s = srv.stats_summary()
    assert s["requests"] == len(srv.latencies) >= 7
    assert s["latency_p95_s"] >= s["latency_p50_s"] > 0
    assert s["rtf_mean"] > 0


def test_serve_stdin_batching_loop(tmp_path, monkeypatch):
    """The stdin loop gathers queued lines into one batch (linger window)
    and emits one JSON line per request plus per-request latency."""
    import io
    import serve

    tok = _make_tokenizer(tmp_path / "tok.json")
    srv = serve.Server(mode="ao", checkpoint=None, tokenizer=tok)
    w = tmp_path / "s.wav"
    _write_wav(w, 0.2)
    monkeypatch.setattr(serve.sys, "stdin",
                        io.StringIO(f"{w}\n{w}\n{w}\n"))
    out = io.StringIO()
    serve._stdin_loop(srv, max_batch=4, window_ms=200.0, out=out)
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(lines) == 3
    assert all(isinstance(r["text"], str) for r in lines)
    # All three lines were already queued when the loop woke: one batch.
    assert max(r["batch_size"] for r in lines) >= 2
