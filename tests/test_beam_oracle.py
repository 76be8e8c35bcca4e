"""Independent correctness oracle for CTC beam search.

The beam decoder produces the WER numbers, so self-agreement (C++ == Python,
both by the same author) is not enough: a shared misreading of the semantics
at /root/reference/nnet/decoders.py:122-257 would pass every parity test.
These tests check both implementations against EXHAUSTIVE ENUMERATION:

  * the true decoding objective is, per labeling l,
        score(l) = ln P_ctc(l | x) + sum_k [alpha * ln10 * log10 P_lm(w_k |
                   w_<k) + beta]
    where P_ctc sums over ALL alignment paths. For tiny (T, V) we compute it
    literally — every one of the V^T frame paths is collapsed and its
    probability accumulated into its labeling — with no shared code with
    either decoder (independent collapse, independent LM walk).
  * prefix beam search with beam_size >= the number of distinct labelings of
    length <= T performs NO pruning, so it must return the exact score for
    every labeling and the oracle argmax as beam 0.
  * a cross-fuzz sweep (random logits, random suffix-closed ARPA LMs, random
    alpha/beta/beam/cutoff) asserts C++ == Python on hundreds of cases, and
    == brute force whenever (T, V) is small enough to enumerate.
"""

import itertools
import math
import os
import shutil

import numpy as np
import pytest

from avec_tpu.decode.beam import NEG_INF, ctc_prefix_beam_search
from avec_tpu.decode.ngram import ArpaLM

LN10 = math.log(10.0)


def _lse(x):
    m = x.max(axis=-1, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=-1, keepdims=True))


def _rand_logp(rng, t, v, scale=2.0):
    logits = rng.randn(t, v).astype(np.float64) * scale
    return (logits - _lse(logits)).astype(np.float64)


def _logsumexp2(a, b):
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = max(a, b)
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def _collapse(path, blank=0):
    """Independent CTC collapse: drop repeats, then blanks."""
    out = []
    prev = None
    for c in path:
        if c != blank and c != prev:
            out.append(c)
        prev = c
    return tuple(out)


def brute_force_scores(logp, seq_len, blank=0, lm=None, alpha=0.6,
                       beta=1.0, token_to_word=None):
    """labeling -> exact combined score, by enumerating all V^T paths."""
    v = logp.shape[1]
    ctc = {}
    for path in itertools.product(range(v), repeat=seq_len):
        lp = float(sum(logp[t, c] for t, c in enumerate(path)))
        lab = _collapse(path, blank)
        ctc[lab] = _logsumexp2(ctc.get(lab, NEG_INF), lp)
    totals = {}
    for lab, lp_ctc in ctc.items():
        lmsc = 0.0
        if lm is not None:
            hist = []
            for c in lab:
                w = token_to_word(c)
                lmsc += alpha * lm.log10_cond(w, hist) * LN10 + beta
                hist.append(w)
        totals[lab] = lp_ctc + lmsc
    return totals


def _full_beam(v, t):
    """Beam size covering every distinct labeling of length <= t over v-1
    non-blank tokens (no pruning can occur)."""
    n = 0
    for k in range(t + 1):
        n += (v - 1) ** k
    return n + 8


# ------------------------------------------------------- random ARPA maker
def _write_random_arpa(rng, path, words):
    """Random backoff LM with the structural invariants real ARPA files
    (and KenLM) guarantee: every n-gram's suffix is an (n-1)-gram, and
    every n-gram's context exists with a backoff weight."""
    uni = {w: -float(rng.uniform(0.3, 2.0)) for w in words + ["</s>", "<s>"]}
    ubo = {w: -float(rng.uniform(0.05, 0.6)) for w in uni}
    bi = {}
    for u in words + ["<s>"]:
        for w in words:
            if rng.rand() < 0.5:
                bi[(u, w)] = -float(rng.uniform(0.1, 1.2))
    bbo = {k: -float(rng.uniform(0.02, 0.4)) for k in bi if rng.rand() < 0.8}
    tri = {}
    for (u, v2) in list(bbo):  # context must have a backoff entry
        for w in words:
            if (v2, w) in bi and rng.rand() < 0.5:  # suffix closure
                tri[(u, v2, w)] = -float(rng.uniform(0.05, 1.0))
    lines = ["\\data\\", f"ngram 1={len(uni)}", f"ngram 2={len(bi)}",
             f"ngram 3={len(tri)}", "", "\\1-grams:"]
    for w, p in uni.items():
        lines.append(f"{p:.4f}\t{w}\t{ubo[w]:.4f}")
    lines.append("")
    lines.append("\\2-grams:")
    for (u, w), p in bi.items():
        bo = f"\t{bbo[(u, w)]:.4f}" if (u, w) in bbo else ""
        lines.append(f"{p:.4f}\t{u} {w}{bo}")
    lines.append("")
    lines.append("\\3-grams:")
    for (u, v2, w), p in tri.items():
        lines.append(f"{p:.4f}\t{u} {v2} {w}")
    lines.append("")
    lines.append("\\end\\")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return path


def _has_gxx():
    return shutil.which("g++") is not None


# ----------------------------------------------------------- oracle tests
def test_exhaustive_oracle_no_lm():
    """Unpruned prefix beam search == literal path enumeration: same best
    labeling AND the exact score of EVERY labeling."""
    rng = np.random.RandomState(0)
    for trial in range(12):
        t = int(rng.randint(2, 7))
        v = int(rng.randint(2, 5))
        logp = _rand_logp(rng, t, v)
        oracle = brute_force_scores(logp, t)
        beams = ctc_prefix_beam_search(logp, t, beam_size=_full_beam(v, t))
        got = dict(beams)
        assert set(got) == set(oracle), (trial, t, v)
        for lab, s in oracle.items():
            assert abs(got[lab] - s) < 1e-9, (trial, lab, got[lab], s)
        best = max(oracle, key=oracle.get)
        assert beams[0][0] == best, (trial, beams[0][0], best)


def test_exhaustive_oracle_with_arpa(tmp_path):
    """Same, with trigram ARPA scoring (alpha/beta sweep included): the LM
    walk in the oracle is an independent reimplementation of the scoring
    semantics (alpha * ln10 * log10_cond + beta per extension)."""
    rng = np.random.RandomState(1)
    words = ["a", "b", "c"]
    for trial in range(8):
        arpa = _write_random_arpa(
            rng, os.path.join(str(tmp_path), f"lm{trial}.arpa"), words)
        lm = ArpaLM(arpa)
        t = int(rng.randint(2, 7))
        v = len(words) + 1
        alpha = float(rng.uniform(0.2, 1.5))
        beta = float(rng.uniform(-0.5, 1.5))
        logp = _rand_logp(rng, t, v)
        to_word = lambda i: chr(i + 96)  # id 1 -> 'a', ...
        oracle = brute_force_scores(logp, t, lm=lm, alpha=alpha, beta=beta,
                                    token_to_word=to_word)
        beams = ctc_prefix_beam_search(
            logp, t, beam_size=_full_beam(v, t), lm=lm, alpha=alpha,
            beta=beta, token_to_word=to_word)
        got = dict(beams)
        assert set(got) == set(oracle)
        for lab, s in oracle.items():
            assert abs(got[lab] - s) < 1e-9, (trial, lab, got[lab], s)
        best = max(oracle, key=oracle.get)
        assert beams[0][0] == best


@pytest.mark.skipif(not _has_gxx(), reason="no g++")
def test_exhaustive_oracle_native(tmp_path):
    """The C++ decoder, unpruned, also matches the enumeration oracle —
    independently of the Python implementation."""
    from avec_tpu.decode.native import NativeBeamDecoder

    rng = np.random.RandomState(2)
    words = ["a", "b", "c"]
    for trial in range(8):
        t = int(rng.randint(2, 7))
        use_lm = trial % 2 == 1
        v = len(words) + 1 if use_lm else int(rng.randint(2, 5))
        logp = _rand_logp(rng, t, v).astype(np.float32)
        # float32 input: recompute the oracle on the rounded values so the
        # comparison isolates algorithmic, not precision, differences.
        logp64 = logp.astype(np.float64)
        kwargs, okw = {}, {}
        if use_lm:
            arpa = _write_random_arpa(
                rng, os.path.join(str(tmp_path), f"nlm{trial}.arpa"), words)
            alpha = float(rng.uniform(0.2, 1.5))
            beta = float(rng.uniform(-0.5, 1.5))
            kwargs = dict(alpha=alpha, beta=beta, ngram_path=arpa,
                          ngram_offset=96)
            okw = dict(lm=ArpaLM(arpa), alpha=alpha, beta=beta,
                       token_to_word=lambda i: chr(i + 96))
        oracle = brute_force_scores(logp64, t, **okw)
        beam_size = _full_beam(v, t)
        nat = NativeBeamDecoder(blank=0, beam_size=beam_size,
                                **kwargs).decode(logp, t)
        best = max(oracle, key=oracle.get)
        assert nat[0][0] == best, (trial, nat[0][0], best)
        got = dict(nat)
        for lab in got:
            assert abs(got[lab] - oracle[lab]) < 1e-3, (trial, lab)


# ------------------------------------------------------------- cross-fuzz
@pytest.mark.skipif(not _has_gxx(), reason="no g++")
def test_cross_fuzz_native_python_bruteforce(tmp_path):
    """Hundreds of random (logits, ARPA, alpha/beta/beam/cutoff) cases:
    C++ == Python beam-for-beam, and both == brute force whenever (T, V)
    is enumerable. Catches divergence anywhere in the pruning, merging,
    LM-state, or score-combination logic."""
    from avec_tpu.decode.native import NativeBeamDecoder

    rng = np.random.RandomState(42)
    words = ["a", "b", "c", "d", "e"]
    arpas = [None] + [
        _write_random_arpa(rng, os.path.join(str(tmp_path), f"f{i}.arpa"),
                           words[: int(rng.randint(2, 6))])
        for i in range(6)]
    n_brute = 0
    for case in range(250):
        t = int(rng.randint(1, 25))
        v = int(rng.randint(2, 8))
        beam = int(rng.choice([2, 4, 8, 16]))
        cutoff = int(rng.choice([0, 0, 3, 5]))  # 0 = no cutoff
        arpa = arpas[int(rng.randint(len(arpas)))]
        alpha = float(rng.uniform(0.2, 1.5))
        beta = float(rng.uniform(-0.5, 1.5))
        logp = _rand_logp(rng, t, v, scale=float(rng.uniform(0.5, 3.0))
                          ).astype(np.float32)
        nkw = dict(blank=0, beam_size=beam)
        pkw = dict(beam_size=beam)
        if arpa is not None:
            nkw.update(alpha=alpha, beta=beta, ngram_path=arpa,
                       ngram_offset=96)
            pkw.update(lm=ArpaLM(arpa), alpha=alpha, beta=beta,
                       token_to_word=lambda i: chr(i + 96))
        if cutoff:
            nkw["cutoff_top_n"] = cutoff
            pkw["cutoff_top_n"] = cutoff
        py = ctc_prefix_beam_search(logp.astype(np.float64), t, **pkw)
        nat = NativeBeamDecoder(**nkw).decode(logp, t)
        assert [p for p, _ in py] == [p for p, _ in nat], (case, t, v, beam)
        for (_, s1), (_, s2) in zip(py, nat):
            assert abs(s1 - s2) < 2e-3, (case, s1, s2)
        # Brute-force leg when enumerable (no cutoff — the oracle models
        # the objective, not the pruning heuristic).
        if cutoff == 0 and v ** t <= 4096:
            okw = ({} if arpa is None else
                   dict(lm=ArpaLM(arpa), alpha=alpha, beta=beta,
                        token_to_word=lambda i: chr(i + 96)))
            oracle = brute_force_scores(logp.astype(np.float64), t, **okw)
            # Unpruned run must find the oracle argmax.
            full = ctc_prefix_beam_search(
                logp.astype(np.float64), t,
                beam_size=_full_beam(v, t), **pkw_no_cutoff(pkw))
            best = max(oracle, key=oracle.get)
            assert full[0][0] == best, (case, full[0][0], best)
            assert abs(full[0][1] - oracle[best]) < 1e-6
            n_brute += 1
    assert n_brute >= 30  # the sweep actually exercised the oracle leg


def pkw_no_cutoff(pkw):
    kw = dict(pkw)
    kw.pop("cutoff_top_n", None)
    kw.pop("beam_size", None)
    return kw


# ------------------------------------------------- device (jitted) decoder
def test_exhaustive_oracle_device_no_lm():
    """The jitted lax.scan decoder (decode/device_beam.py), unpruned, also
    matches the enumeration oracle — independent of both host decoders."""
    from avec_tpu.decode.device_beam import device_beam_search

    rng = np.random.RandomState(3)
    for trial in range(8):
        t = int(rng.randint(2, 6))
        v = int(rng.randint(2, 5))
        logp = _rand_logp(rng, t, v).astype(np.float32)
        oracle = brute_force_scores(logp.astype(np.float64), t)
        beams = device_beam_search(logp[None], np.array([t]),
                                   beam_size=_full_beam(v, t))[0]
        got = {p: s for p, s in beams if s > -1e29}
        assert set(got) == set(oracle), (trial, t, v)
        for lab, s in oracle.items():
            assert abs(got[lab] - s) < 1e-3, (trial, lab, got[lab], s)
        best = max(oracle, key=oracle.get)
        assert beams[0][0] == best, (trial, beams[0][0], best)


def test_exhaustive_oracle_device_with_arpa(tmp_path):
    """Device n-gram shallow fusion (packed-key binary search) == the
    enumeration oracle's independent ArpaLM walk."""
    from avec_tpu.decode.device_beam import (
        DeviceNgramTables,
        device_beam_search,
    )

    rng = np.random.RandomState(4)
    words = ["a", "b", "c"]
    for trial in range(6):
        arpa = _write_random_arpa(
            rng, os.path.join(str(tmp_path), f"dlm{trial}.arpa"), words)
        lm = ArpaLM(arpa)
        tables = DeviceNgramTables(lm, offset=96)
        t = int(rng.randint(2, 6))
        v = len(words) + 1
        alpha = float(rng.uniform(0.2, 1.5))
        beta = float(rng.uniform(-0.5, 1.5))
        logp = _rand_logp(rng, t, v).astype(np.float32)
        to_word = lambda i: chr(i + 96)
        oracle = brute_force_scores(logp.astype(np.float64), t, lm=lm,
                                    alpha=alpha, beta=beta,
                                    token_to_word=to_word)
        beams = device_beam_search(logp[None], np.array([t]),
                                   beam_size=_full_beam(v, t),
                                   tables=tables, alpha=alpha, beta=beta)[0]
        got = {p: s for p, s in beams if s > -1e29}
        assert set(got) == set(oracle), (trial,)
        for lab, s in oracle.items():
            assert abs(got[lab] - s) < 2e-3, (trial, lab, got[lab], s)
        assert beams[0][0] == max(oracle, key=oracle.get)


def test_fuzz_device_vs_python(tmp_path):
    """Pruned beams: device == Python beam-for-beam across random logits,
    ARPA LMs, alpha/beta and beam sizes (float32-tolerant)."""
    from avec_tpu.decode.device_beam import (
        DeviceNgramTables,
        device_beam_search,
    )

    rng = np.random.RandomState(5)
    words = ["a", "b", "c", "d"]
    arpas = [None] + [
        _write_random_arpa(rng, os.path.join(str(tmp_path), f"df{i}.arpa"),
                           words[: int(rng.randint(2, 5))])
        for i in range(3)]
    for case in range(40):
        t = int(rng.randint(1, 14))
        v = int(rng.randint(2, 7))
        beam = int(rng.choice([2, 4, 8]))
        arpa = arpas[int(rng.randint(len(arpas)))]
        alpha = float(rng.uniform(0.2, 1.5))
        beta = float(rng.uniform(-0.5, 1.5))
        logp = _rand_logp(rng, t, v, scale=float(rng.uniform(0.5, 2.5))
                          ).astype(np.float32)
        pkw, dkw = dict(beam_size=beam), dict(beam_size=beam)
        if arpa is not None:
            pkw.update(lm=ArpaLM(arpa), alpha=alpha, beta=beta,
                       token_to_word=lambda i: chr(i + 96))
            dkw.update(tables=DeviceNgramTables(ArpaLM(arpa), offset=96),
                       alpha=alpha, beta=beta)
        py = ctc_prefix_beam_search(logp.astype(np.float64), t, **pkw)
        dv = device_beam_search(logp[None], np.array([t]), **dkw)[0]
        dv = [(p, s) for p, s in dv if s > -1e29][: len(py)]
        assert [p for p, _ in py] == [p for p, _ in dv], (case, t, v, beam)
        for (_, s1), (_, s2) in zip(py, dv):
            assert abs(s1 - s2) < 5e-3, (case, s1, s2)


@pytest.mark.skipif(not _has_gxx(), reason="no g++")
def test_unicode_whitespace_vocab_parity(tmp_path):
    """The chr(id + offset) remapping produces words that are UNICODE
    whitespace (U+00A0 = id 60 at offset 100, U+0085 = id 33) but not ASCII
    whitespace. KenLM/the C++ decoder parse ARPA byte-wise; ArpaLM must not
    let str.strip()/str.split() treat those words as separators (it did —
    found by the device-beam bench at vocab 256)."""
    from avec_tpu.decode.native import NativeBeamDecoder

    rng = np.random.RandomState(7)
    # Words straddling the unicode-whitespace codepoints at offset 100.
    ids = [28, 33, 60, 100, 131]  # chr: 0x80, 0x85(NEL), 0xA0(NBSP), ...
    words = [chr(i + 100) for i in ids]
    arpa = _write_random_arpa(rng, os.path.join(str(tmp_path), "uws.arpa"),
                              words)
    lm = ArpaLM(arpa)
    # The whitespace words parsed as real vocabulary entries:
    for w in words:
        assert (w,) in lm.probs, hex(ord(w))
    v = 256
    for trial in range(4):
        t = int(rng.randint(4, 20))
        logp = _rand_logp(rng, t, v, scale=2.5).astype(np.float32)
        # Peak the whitespace-word token ids so they actually get explored.
        logp[np.arange(t), np.array(ids)[rng.randint(0, len(ids), t)]] += 4.0
        logp -= _lse(logp)
        py = ctc_prefix_beam_search(
            logp.astype(np.float64), t, 8, blank=0, lm=lm, alpha=0.8,
            beta=0.5, token_to_word=lambda c: chr(c + 100))
        nat = NativeBeamDecoder(blank=0, beam_size=8, alpha=0.8, beta=0.5,
                                ngram_path=arpa,
                                ngram_offset=100).decode(logp, t)
        assert [p for p, _ in py] == [p for p, _ in nat], trial
        for (_, s1), (_, s2) in zip(py, nat):
            assert abs(s1 - s2) < 2e-3
