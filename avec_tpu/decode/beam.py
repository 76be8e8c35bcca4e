# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""CTC prefix beam search with n-gram LM scoring and neural LM rescoring.

Behavioral parity target: /root/reference/nnet/decoders.py:122-257, which
drives the C++ ctcdecode.CTCBeamDecoder (beam 16, KenLM 6-gram, alpha=0.6,
beta=1.0, temperature, blank 0, log-prob inputs) and then rescores the beams
with a GPT LM: total = beam_score + neural_alpha * neural_nll
- neural_beta * length, best = argmin (:234-252).

Decoding is host-side post-TPU work on logits (SURVEY §2.4). A Python prefix
beam search is provided here; `avec_tpu/csrc/beam_decoder.cpp` implements the
same algorithm natively (loaded via ctypes when built — see decode/native.py)
and is preferred automatically.

Scoring semantics (matching ctcdecode's character-based KenLM path):
  * beams accumulate log P_ctc via the standard (p_blank, p_non_blank)
    prefix recursion
  * every time a prefix is extended by a new token, add
    alpha * log10->ln(P_lm(token | history)) + beta * ln(10)... the Baidu
    scorer adds `alpha * log10_cond + beta` in log10 domain; we keep
    everything in natural log and convert: alpha * log10p * ln(10) + beta.
  * returned beam "scores" are negative total log-likelihoods; best beam is
    the argmin, as the reference consumes them (:242,252).
"""

import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from avec_tpu.decode.ngram import ArpaLM
from avec_tpu.utils.tokenizer import load_tokenizer

LN10 = math.log(10.0)
NEG_INF = -float("inf")


def _logsumexp2(a: float, b: float) -> float:
    if a == NEG_INF:
        return b
    if b == NEG_INF:
        return a
    m = a if a > b else b
    return m + math.log(math.exp(a - m) + math.exp(b - m))


def ctc_prefix_beam_search(log_probs: np.ndarray, seq_len: int, beam_size: int,
                           blank: int = 0, lm: Optional[ArpaLM] = None,
                           alpha: float = 0.6, beta: float = 1.0,
                           token_to_word=None, cutoff_top_n: Optional[int] = None
                           ) -> List[Tuple[Tuple[int, ...], float]]:
    """Prefix beam search over (T, V) log probs.

    Returns up to beam_size (prefix, score) sorted best-first, where score is
    the total combined log-likelihood (higher is better).
    """
    # beams: prefix -> (logp_blank, logp_non_blank, lm_score)
    beams: Dict[Tuple[int, ...], Tuple[float, float, float]] = {
        (): (0.0, NEG_INF, 0.0)}
    v = log_probs.shape[1]
    top_n = min(cutoff_top_n or v, v)

    for t in range(seq_len):
        lp = log_probs[t]
        if top_n < v:
            cand = np.argpartition(-lp, top_n)[:top_n]
            if blank not in cand:  # blank must always be considered
                cand = np.concatenate([cand, [blank]])
        else:
            cand = range(v)
        new_beams: Dict[Tuple[int, ...], Tuple[float, float, float]] = {}

        def acc(prefix, pb, pnb, lmsc):
            opb, opnb, olm = new_beams.get(prefix, (NEG_INF, NEG_INF, lmsc))
            new_beams[prefix] = (_logsumexp2(opb, pb), _logsumexp2(opnb, pnb),
                                 lmsc)

        for prefix, (pb, pnb, lmsc) in beams.items():
            total = _logsumexp2(pb, pnb)
            last = prefix[-1] if prefix else None
            for c in cand:
                p = float(lp[c])
                if c == blank:
                    acc(prefix, total + p, NEG_INF, lmsc)
                elif c == last:
                    # Repeat: extends non-blank of same prefix...
                    acc(prefix, NEG_INF, pnb + p, lmsc)
                    # ...or, after a blank, creates a new doubled token.
                    if pb != NEG_INF:
                        new_prefix = prefix + (int(c),)
                        add = _lm_add(lm, alpha, beta, prefix, c, token_to_word)
                        acc(new_prefix, NEG_INF, pb + p, lmsc + add)
                else:
                    new_prefix = prefix + (int(c),)
                    add = _lm_add(lm, alpha, beta, prefix, c, token_to_word)
                    acc(new_prefix, NEG_INF, total + p, lmsc + add)

        # Prune to beam_size by combined score.
        scored = sorted(
            new_beams.items(),
            key=lambda kv: -(_logsumexp2(kv[1][0], kv[1][1]) + kv[1][2]))
        beams = dict(scored[:beam_size])

    results = [(prefix, _logsumexp2(pb, pnb) + lmsc)
               for prefix, (pb, pnb, lmsc) in beams.items()]
    results.sort(key=lambda kv: -kv[1])
    return results


def _lm_add(lm, alpha, beta, prefix, c, token_to_word) -> float:
    if lm is None:
        return 0.0
    history = [token_to_word(p) for p in prefix]
    log10p = lm.log10_cond(token_to_word(int(c)), history)
    return alpha * log10p * LN10 + beta


class CTCBeamSearchDecoder:
    """Beam search + n-gram + neural rescoring decoder.

    ref: nnet/decoders.py:122-257. `neural_rescorer` is an optional callable
    (padded_ids (B, L) int32) -> logits (B, L, V) running the GPT LM, set up
    by the config loader together with its tokenizer and special ids.
    """

    def __init__(self, tokenizer_path: str, beam_size: int = 16,
                 ngram_path: Optional[str] = None, ngram_tmp: float = 1.0,
                 ngram_alpha: float = 0.6, ngram_beta: float = 1.0,
                 ngram_offset: int = 100,
                 neural_config_path: Optional[str] = None,
                 neural_checkpoint: Optional[str] = None,
                 neural_rescorer=None, neural_tokenizer_path: Optional[str] = None,
                 neural_alpha: float = 0.6, neural_beta: float = 1.0,
                 neural_pad_token: int = 0, neural_sos_token: Optional[int] = None,
                 neural_eos_token: Optional[int] = None,
                 num_processes: int = 8, test_time_aug: bool = False,
                 use_native: bool = True):
        self.tokenizer = load_tokenizer(tokenizer_path)
        self.beam_size = beam_size
        self.ngram_tmp = ngram_tmp
        self.ngram_alpha = ngram_alpha
        self.ngram_beta = ngram_beta
        self.ngram_offset = ngram_offset
        self.test_time_aug = test_time_aug
        self.lm = ArpaLM(ngram_path) if ngram_path else None
        self.neural_rescorer = neural_rescorer
        self.neural_tokenizer = (load_tokenizer(neural_tokenizer_path)
                                 if neural_tokenizer_path else None)
        self.neural_alpha = neural_alpha
        self.neural_beta = neural_beta
        self.neural_pad_token = neural_pad_token
        self.neural_sos_token = neural_sos_token
        self.neural_eos_token = neural_eos_token
        if neural_config_path is not None:
            self._build_neural_rescorer(neural_config_path, neural_checkpoint)
        self._native = None
        if use_native:
            try:
                from avec_tpu.decode.native import NativeBeamDecoder

                self._native = NativeBeamDecoder(
                    blank=0, beam_size=beam_size, alpha=ngram_alpha,
                    beta=ngram_beta, ngram_path=ngram_path,
                    ngram_offset=ngram_offset, num_threads=num_processes)
            except Exception:
                self._native = None

    def _build_neural_rescorer(self, neural_config_path: str,
                               neural_checkpoint: str):
        """Construct the GPT rescorer from an LM config module.

        ref: nnet/decoders.py:153-162 — import the config (its side effects
        build + compile the LM), load the checkpoint from the config's
        callback_path, take the config's tokenizer and special ids. The
        forward is jitted with the padded length bucketed to multiples of 32
        so repeated rescoring calls hit the compile cache.
        """
        import os

        config = _import_config_module(neural_config_path)
        model = config.model
        if not getattr(model, "built", False):
            import numpy as _np

            dummy = _np.zeros((1, 32), _np.int32)
            model.build([dummy], precision=getattr(config, "precision", None))
        ckpt_path = os.path.join(config.callback_path, neural_checkpoint)
        model.load(ckpt_path, load_optimizer=False)

        import jax

        fwd = jax.jit(lambda params, ids: model.apply_net(
            params, model.batch_stats, [ids], False, None)[0])

        def rescore(padded_ids: np.ndarray) -> np.ndarray:
            b, t = padded_ids.shape
            t_pad = -(-t // 32) * 32
            full = np.full((b, t_pad), self.neural_pad_token, np.int32)
            full[:, :t] = padded_ids
            out = fwd(model.params, full)
            logits = out["output"] if isinstance(out, dict) else out
            return np.asarray(logits, np.float32)[:, :t]

        self.neural_rescorer = rescore
        self.neural_tokenizer = load_tokenizer(config.tokenizer_path)
        self.neural_pad_token = config.pad_token
        self.neural_sos_token = config.sos_token
        self.neural_eos_token = config.eos_token

    def _token_to_word(self, idx: int) -> str:
        return chr(idx + self.ngram_offset)  # ref decoders.py:187

    def device_fn(self, outputs):
        # Beam search needs full logits on host; pass through.
        return outputs

    def __call__(self, outputs, from_logits: bool = True) -> List[str]:
        if not from_logits:
            labels, label_lens = outputs
            labels, label_lens = np.asarray(labels), np.asarray(label_lens)
            ids = [labels[b, : label_lens[b]].tolist() for b in range(len(labels))]
            return self.tokenizer.decode(ids)
        logits, lengths = np.asarray(outputs[0]), np.asarray(outputs[1])
        tokens = self.beam_search(logits, lengths)
        return self.tokenizer.decode(tokens)

    def beam_search(self, logits: np.ndarray, logits_len: np.ndarray
                    ) -> List[List[int]]:
        """ref: nnet/decoders.py:175-257 (incl. test-time-aug flattening)."""
        if self.test_time_aug:
            b, naug = logits.shape[0], logits.shape[1]
            logits = logits.reshape((-1,) + logits.shape[2:])
            logits_len = logits_len.reshape(-1)
        else:
            b, naug = logits.shape[0], 1

        logits = logits / self.ngram_tmp
        logp = logits - _logsumexp_np(logits)

        if self._native is not None:
            # Whole batch through the C++ thread pool (num_processes parity).
            all_beams = self._native.decode_batch(
                logp, logits_len.astype(np.int32))
        else:
            all_beams = [
                ctc_prefix_beam_search(
                    logp[i], int(logits_len[i]), self.beam_size, blank=0,
                    lm=self.lm, alpha=self.ngram_alpha, beta=self.ngram_beta,
                    token_to_word=self._token_to_word)
                for i in range(logits.shape[0])]
        for beams in all_beams:
            while len(beams) < self.beam_size:
                beams.append(((), NEG_INF))
        all_beams = [beams[: self.beam_size] for beams in all_beams]

        # Scores as negative log-likelihood (argmin best, ref :242).
        beam_scores = np.array([[-s for _, s in beams] for beams in all_beams])

        if self.neural_rescorer is not None:
            neural_scores, neural_lengths = self._neural_scores(all_beams)
            # NB: neural_lengths is already scaled by neural_beta inside
            # _neural_scores AND scaled again here — faithfully reproducing
            # the reference's double-beta (decoders.py:231,234).
            total = (beam_scores + self.neural_alpha * neural_scores
                     - self.neural_beta * neural_lengths)
            total = total.reshape(b, naug * self.beam_size)
            flat_beams = [beams[k][0] for beams in all_beams
                          for k in range(self.beam_size)]
            flat_beams = [flat_beams[i * naug * self.beam_size:
                                     (i + 1) * naug * self.beam_size]
                          for i in range(b)]
            best = total.argmin(axis=-1)
            return [list(flat_beams[i][best[i]]) for i in range(b)]

        # No rescorer: best beam of each augment, then argmin over augments.
        top = beam_scores[:, 0].reshape(b, naug)
        top_beams = [[all_beams[i * naug + a][0][0] for a in range(naug)]
                     for i in range(b)]
        best = top.argmin(axis=-1)
        return [list(top_beams[i][best[i]]) for i in range(b)]

    def _neural_scores(self, all_beams):
        """GPT rescoring (ref: nnet/decoders.py:209-231): re-tokenize each
        beam text with the LM tokenizer, forward, sum token NLLs."""
        n = len(all_beams)
        scores = np.zeros((n, self.beam_size))
        lengths = np.zeros((n, self.beam_size))
        seqs, idx = [], []
        for i, beams in enumerate(all_beams):
            for k, (prefix, _) in enumerate(beams):
                text = self.tokenizer.decode([list(prefix)])[0]
                ids = self.neural_tokenizer.encode(text)
                ids = [self.neural_sos_token] + list(ids) + [self.neural_eos_token]
                seqs.append(ids)
                idx.append((i, k))
        max_len = max(len(s) for s in seqs)
        padded = np.full((len(seqs), max_len), self.neural_pad_token, np.int32)
        for j, s in enumerate(seqs):
            padded[j, : len(s)] = s
        logits = np.asarray(self.neural_rescorer(padded))
        logp = logits - _logsumexp_np(logits)
        for j, s in enumerate(seqs):
            i, k = idx[j]
            nll = 0.0
            for t in range(len(s) - 1):
                nll -= logp[j, t, s[t + 1]]
            scores[i, k] = nll
            lengths[i, k] = self.neural_beta * (len(s) - 1)
        return scores, lengths


def _import_config_module(path: str):
    """Import a config by file path or dotted module name
    (ref: nnet/decoders.py:156 importlib.import_module)."""
    import importlib
    import importlib.util
    import os
    import sys

    if os.path.isfile(path):
        name = "avec_tpu_neural_config_" + os.path.basename(path).replace(
            ".py", "").replace("-", "_")
        spec = importlib.util.spec_from_file_location(name, path)
        module = importlib.util.module_from_spec(spec)
        sys.modules[name] = module
        spec.loader.exec_module(module)
        return module
    return importlib.import_module(
        path.replace(".py", "").replace("/", "."))


def _logsumexp_np(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    return m + np.log(np.exp(x - m).sum(axis=axis, keepdims=True))
