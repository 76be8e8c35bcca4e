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
