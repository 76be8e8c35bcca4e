"""Decoder tests: greedy/beam search, ARPA LM, native C++ vs Python parity,
tokenizer round trips, WER."""

import math
import os

import numpy as np
import pytest

from avec_tpu.decode.beam import (
    CTCBeamSearchDecoder,
    ctc_prefix_beam_search,
)
from avec_tpu.decode.ngram import ArpaLM
from avec_tpu.utils.tokenizer import Tokenizer, train_bpe
from avec_tpu.utils.wer import edit_distance, standardize, wer

ARPA = """\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-0.5\t<s>\t-0.3
-0.7\ta\t-0.2
-0.9\tb\t-0.1
-1.2\tc
-0.8\t</s>

\\2-grams:
-0.3\ta b
-0.4\tb a
-0.6\t<s> a

\\end\\
"""


@pytest.fixture
def arpa_path(tmp_path):
    p = os.path.join(tmp_path, "lm.arpa")
    with open(p, "w") as f:
        f.write(ARPA)
    return p


def test_arpa_lm_scoring(arpa_path):
    lm = ArpaLM(arpa_path)
    assert lm.order == 2
    # Direct bigram.
    assert abs(lm.log10_cond("b", ["a"]) - (-0.3)) < 1e-9
    # Backoff: P(c | a) = backoff(a) + P(c) = -0.2 + -1.2.
    assert abs(lm.log10_cond("c", ["a"]) - (-1.4)) < 1e-9
    # Unigram.
    assert abs(lm.log10_cond("a", []) - (-0.7)) < 1e-9


def _peaky_logp(seq, t_per=2, v=5):
    """Log-probs strongly peaked on a token sequence with blanks between."""
    frames = []
    for tok in seq:
        for _ in range(t_per):
            row = np.full(v, -8.0)
            row[tok] = -0.01
            frames.append(row)
        row = np.full(v, -8.0)
        row[0] = -0.01  # blank separator
        frames.append(row)
    lp = np.asarray(frames, dtype=np.float32)
    return lp - _lse(lp)


def _lse(x):
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


def test_prefix_beam_search_recovers_sequence():
    lp = _peaky_logp([1, 2, 1, 3])
    beams = ctc_prefix_beam_search(lp, lp.shape[0], beam_size=4)
    assert beams[0][0] == (1, 2, 1, 3)
    assert beams[0][1] > beams[-1][1]


def test_prefix_beam_search_repeated_tokens():
    # 1 1 (same token twice, blank-separated) must decode as (1, 1).
    lp = _peaky_logp([1, 1])
    beams = ctc_prefix_beam_search(lp, lp.shape[0], beam_size=4)
    assert beams[0][0] == (1, 1)


def _has_gxx():
    import shutil

    return shutil.which("g++") is not None


@pytest.mark.skipif(not _has_gxx(), reason="no g++")
def test_native_decoder_matches_python(arpa_path):
    from avec_tpu.decode.native import NativeBeamDecoder

    rng = np.random.RandomState(0)
    logits = rng.randn(12, 5).astype(np.float32) * 2
    lp = (logits - _lse(logits)).astype(np.float32)

    # Without LM.
    py = ctc_prefix_beam_search(lp, 12, beam_size=4)
    nat = NativeBeamDecoder(blank=0, beam_size=4).decode(lp, 12)
    assert [p for p, _ in py] == [p for p, _ in nat]
    for (p1, s1), (p2, s2) in zip(py, nat):
        assert abs(s1 - s2) < 1e-4

    # With ARPA LM: remap ids so chr(id + 97) = 'a', 'b', 'c'... and the toy
    # LM vocabulary lines up (offset 97, ids 0..: 'a'=id0? blank=0 skipped).
    lm = ArpaLM(arpa_path)
    py = ctc_prefix_beam_search(
        lp, 12, beam_size=4, lm=lm, alpha=0.6, beta=1.0,
        token_to_word=lambda i: chr(i + 96))  # id 1 -> 'a', 2 -> 'b', 3 -> 'c'
    nat = NativeBeamDecoder(blank=0, beam_size=4, alpha=0.6, beta=1.0,
                            ngram_path=arpa_path, ngram_offset=96).decode(lp, 12)
    assert [p for p, _ in py] == [p for p, _ in nat]
    for (p1, s1), (p2, s2) in zip(py, nat):
        assert abs(s1 - s2) < 1e-3


ARPA3 = """\\data\\
ngram 1=4
ngram 2=5
ngram 3=3

\\1-grams:
-0.6\ta\t-0.25
-0.8\tb\t-0.15
-1.1\tc\t-0.35
-0.9\t</s>

\\2-grams:
-0.3\ta b\t-0.1
-0.45\tb a\t-0.2
-0.5\tb c\t-0.12
-0.7\tc a
-0.65\ta c\t-0.3

\\3-grams:
-0.2\ta b c
-0.35\tb a b
-0.4\ta c a

\\end\\
"""


@pytest.mark.skipif(not _has_gxx(), reason="no g++")
def test_native_trigram_state_matches_python(tmp_path):
    """The native decoder's KenLM-style LM-state shortcut (skip contexts
    longer than the last matched n-gram) must be score-exact vs the Python
    full backoff walk on a suffix-closed 3-gram ARPA."""
    from avec_tpu.decode.native import NativeBeamDecoder

    p = os.path.join(tmp_path, "lm3.arpa")
    with open(p, "w") as f:
        f.write(ARPA3)
    rng = np.random.RandomState(3)
    logits = rng.randn(18, 5).astype(np.float32) * 2
    lp = (logits - _lse(logits)).astype(np.float32)
    lm = ArpaLM(p)
    py = ctc_prefix_beam_search(
        lp, 18, beam_size=6, lm=lm, alpha=0.6, beta=1.0,
        token_to_word=lambda i: chr(i + 96))
    nat = NativeBeamDecoder(blank=0, beam_size=6, alpha=0.6, beta=1.0,
                            ngram_path=p, ngram_offset=96).decode(lp, 18)
    assert [pr for pr, _ in py] == [pr for pr, _ in nat]
    for (_, s1), (_, s2) in zip(py, nat):
        assert abs(s1 - s2) < 1e-6


@pytest.mark.skipif(not _has_gxx(), reason="no g++")
def test_native_batch_decode_matches_serial(arpa_path):
    """bd_decode_batch (thread pool) == per-utterance bd_decode, incl. with
    the ARPA LM and per-utterance seq_lens."""
    from avec_tpu.decode.native import NativeBeamDecoder

    rng = np.random.RandomState(7)
    b, t, v = 6, 20, 5
    logits = rng.randn(b, t, v).astype(np.float32) * 2
    lp = (logits - _lse(logits)).astype(np.float32)
    seq_lens = np.array([20, 15, 20, 8, 20, 1], np.int32)

    for kwargs in [dict(), dict(alpha=0.6, beta=1.0, ngram_path=arpa_path,
                              ngram_offset=96)]:
        dec = NativeBeamDecoder(blank=0, beam_size=4, num_threads=3, **kwargs)
        batch = dec.decode_batch(lp, seq_lens)
        for i in range(b):
            serial = dec.decode(lp[i], int(seq_lens[i]))
            assert [p for p, _ in batch[i]] == [p for p, _ in serial]
            for (_, s1), (_, s2) in zip(batch[i], serial):
                assert abs(s1 - s2) < 1e-9


@pytest.mark.skipif(not _has_gxx(), reason="no g++")
def test_native_cutoff_pruning():
    """cutoff_top_n keeps top tokens only (matches the Python cutoff path);
    pruning must not change the result on peaky inputs, and must restrict
    candidates on flat inputs."""
    from avec_tpu.decode.native import NativeBeamDecoder

    lp = _peaky_logp([1, 2, 1, 3]).astype(np.float32)
    t = lp.shape[0]
    full = NativeBeamDecoder(blank=0, beam_size=4).decode(lp, t)
    pruned = NativeBeamDecoder(blank=0, beam_size=4,
                               cutoff_top_n=2).decode(lp, t)
    assert pruned[0][0] == full[0][0] == (1, 2, 1, 3)

    # Python parity at the same cutoff on random inputs: candidate sets are
    # identical (top-n by log-prob), so beams must agree.
    rng = np.random.RandomState(11)
    logits = rng.randn(16, 6).astype(np.float32) * 2
    lp2 = (logits - _lse(logits)).astype(np.float32)
    py = ctc_prefix_beam_search(lp2, 16, beam_size=4, cutoff_top_n=3)
    nat = NativeBeamDecoder(blank=0, beam_size=4,
                            cutoff_top_n=3).decode(lp2, 16)
    assert [p for p, _ in py] == [p for p, _ in nat]

    # cutoff_prob < 1 on a peaky distribution: still decodes correctly.
    prob = NativeBeamDecoder(blank=0, beam_size=4,
                             cutoff_prob=0.99).decode(lp, t)
    assert prob[0][0] == (1, 2, 1, 3)


def test_beam_decoder_end_to_end(tmp_path):
    corpus = ["a b a", "b a b", "a a b"]
    tok = Tokenizer(train_bpe(corpus, 8))
    tok_path = os.path.join(tmp_path, "tok.json")
    tok.save(tok_path)
    dec = CTCBeamSearchDecoder(tokenizer_path=tok_path, beam_size=4,
                               use_native=False)
    # Feed peaky logits over the tokenizer's ids for "a b".
    ids = tok.encode("a b")
    lp = _peaky_logp(ids, v=tok.vocab_size())[None]  # (1, T, V)
    lengths = np.array([lp.shape[1]])
    out = dec((lp, lengths))
    assert out == ["a b"], out


def test_tokenizer_roundtrip():
    corpus = ["hello world", "the quick brown fox jumps", "hello there"]
    tok = Tokenizer(train_bpe(corpus, 40))
    for text in corpus:
        ids = tok.encode(text)
        assert tok.decode(ids) == text
    assert tok.decode([0]) == ""  # unk -> unk_surface ""


def test_wer():
    assert wer(["hello world"], ["hello world"]) == 0.0
    assert wer(["a b c d"], ["a b x d"]) == 0.25
    # standardize: case/punct-insensitive (jiwer parity).
    assert wer(["Hello, World!"], ["hello world"]) == 0.0
    assert standardize("I'm can't") == "i am can not"
    assert edit_distance("a b c".split(), "a c".split()) == 1


def test_device_beam_decoder_class(tmp_path):
    """CTCDeviceBeamSearchDecoder: engine decoder contract (device_fn
    passthrough + host detokenize of the jitted beam search's best beam),
    LM-free leg == Python prefix beam search."""
    import os

    from avec_tpu.data.synthetic import tone_tokenizer
    from avec_tpu.decode.beam import ctc_prefix_beam_search
    from avec_tpu.decode.device_beam import CTCDeviceBeamSearchDecoder

    tok_path = os.path.join(str(tmp_path), "tok.json")
    tone_tokenizer(16).save(tok_path)
    dec = CTCDeviceBeamSearchDecoder(tok_path, beam_size=4)

    rng = np.random.RandomState(3)
    logits = rng.randn(3, 10, 16).astype(np.float32) * 2.0
    lengths = np.array([10, 7, 4], np.int32)
    outputs = (logits, lengths)
    assert dec.device_fn(outputs) is outputs
    texts = dec(outputs)
    assert len(texts) == 3

    logp = logits - _lse_np(logits)
    for b in range(3):
        py = ctc_prefix_beam_search(logp[b].astype(np.float64),
                                    int(lengths[b]), 4)
        want = dec.tokenizer.decode([list(py[0][0])])[0]
        assert texts[b] == want, (b, texts[b], want)

    # from_logits=False: targets path (labels + lengths -> text).
    labels = np.array([[3, 5, 0], [2, 0, 0]], np.int32)
    got = dec((labels, np.array([2, 1], np.int32)), from_logits=False)
    assert got == dec.tokenizer.decode([[3, 5], [2]])


def _lse_np(x):
    m = x.max(-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(-1, keepdims=True))


def test_device_beam_key_packing_ops():
    """Packed-key bit ops: shift-in / truncate / drop-last agree with the
    host packer for random token sequences (the LM walk's correctness rests
    on these)."""
    import jax.numpy as jnp

    from avec_tpu.decode.device_beam import (
        _SLOTS,
        _drop_last,
        _pack_host,
        _shift_in,
        _truncate,
    )

    rng = np.random.RandomState(0)
    for _ in range(50):
        n = rng.randint(1, 9)
        seq = [int(t) for t in rng.randint(0, 500, size=n)]
        # Device-side incremental packing == host packing of the tail.
        hi = lo = jnp.int32(0)
        for t in seq:
            hi, lo = _shift_in(hi, lo, jnp.int32(t))
        want = _pack_host(tuple(seq[-2 * _SLOTS:]))
        assert (int(hi), int(lo)) == want, seq
        # Truncation to every k == host packing of the last k tokens.
        for k in range(0, 2 * _SLOTS + 1):
            thi, tlo = _truncate(hi, lo, k)
            w = _pack_host(tuple(seq[-min(k, 2 * _SLOTS):])
                           if min(k, 2 * _SLOTS) else ())
            assert (int(thi), int(tlo)) == w, (seq, k)
        # Drop-last == host packing of seq[:-1]'s tail.
        dhi, dlo = _drop_last(hi, lo)
        w = _pack_host(tuple(seq[-2 * _SLOTS:][:-1]))
        assert (int(dhi), int(dlo)) == w, seq
