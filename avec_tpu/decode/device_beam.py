# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Device-side (jitted) CTC prefix beam search with n-gram shallow fusion.

The reference decodes on the HOST: an 8-process pool around the C++
ctcdecode beam decoder (/root/reference/nnet/decoders.py:28-31,185-197).
This repo's C++ decoder (csrc/beam_decoder.cpp) reproduces that at ~2
utt/s/core for beam 16 + 6-gram — on a 1-core host the device forward
(~770 utt/s) outruns decode by ~350x. This module is the TPU-native
answer: the whole beam search runs as ONE `lax.scan` over time inside
jit, so evaluation never ships (T, V) log-prob tensors to the host and
decode throughput scales with the chip, not the host cores.

Algorithm (semantics identical to decode/beam.py `ctc_prefix_beam_search`,
itself oracle-anchored by tests/test_beam_oracle.py):

  * beams carry (p_blank, p_non_blank) in log domain plus an LM score;
  * per frame, candidates are K "stay" beams (blank extension + repeat
    of the last token) and K*V "extend" beams (new token appended);
  * the classic merge case — prefix_k + v equals an existing beam
    prefix_k' — is detected EXACTLY (token-array comparison, no hashing:
    ext/ext collisions are impossible while beams are distinct, so only
    the K*K stay-vs-ext pairs with v == last(k') need checking) and the
    extension mass is folded into the stay candidate;
  * top-K by combined score via `lax.top_k`, then token rows are
    gathered/appended with static shapes ((K, U) int32, U = T).

N-gram shallow fusion evaluates the SAME Katz-backoff recursion as
`ngram.ArpaLM.log10_cond` on device: each order's n-grams are packed
into two int32 limbs (3 tokens x 9 bits per limb, order <= 6) and kept
as sorted arrays; lookups are vectorized lexicographic binary searches
(unrolled log2(M) steps of gathers). Missing-backoff-equals-zero and the
-99 unigram fallback match the host scorer bit-for-bit in float32.

Scoring parity: extending a prefix by token v adds
``alpha * ln(10) * log10 P_lm(v | prefix) + beta`` (the ctcdecode/KenLM
convention, decoders.py:234); with no LM both terms are omitted exactly
as in the host implementations.
"""

import math
from functools import partial
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

LN10 = math.log(10.0)
NEG = -1e30          # -inf stand-in (f32-safe, survives additions)
LOG10_NEG_INF = -99.0
_BITS = 9            # bits per token slot (vocab <= 511)
_SLOTS = 3           # token slots per int32 limb (27 bits)
MAX_ORDER = 2 * _SLOTS  # 6 — the AVEC stack's own maximum (6-gram ARPA)


# --------------------------------------------------------------- LM tables
class DeviceNgramTables:
    """Per-order sorted n-gram arrays of one ARPA LM, laid out for TPU.

    Built host-side from `ngram.ArpaLM` (words are chr(id + offset),
    decoders.py:187). TPUs have no hardware gather: both an unrolled binary
    search per (beam, word) query and an open-addressing hash table measure
    ~2 utt/s on v5e — XLA serializes large-table vector gathers to ~2M
    elem/s. This layout trades gathers for what the hardware does well:

      * entries of order n are sorted by packed key, CONTEXT IN THE HIGH
        BITS — so all continuations of one context are CONTIGUOUS;
      * per (beam, order) the device does ONE small binary search over the
        per-context START array ((K,) queries, tiny gathers) and ONE
        dynamic-slice window of width `win` (contiguous — fast), then
        scatters window probs to the (V,) vocabulary via a compare matrix
        (VPU elementwise, no gather);
      * history backoffs are point queries resolved the same way (the
        history (n-1)-gram is one context's window, word = its last token).
    """

    def __init__(self, lm, offset: int = 100, vocab_size: int = 0):
        assert lm.order <= MAX_ORDER, f"order {lm.order} > {MAX_ORDER}"
        self.order = lm.order

        def tok(word: str) -> Optional[int]:
            i = ord(word) - offset if len(word) == 1 else -1
            return i if 0 <= i < (1 << _BITS) - 1 else None

        probs: List[dict] = [dict() for _ in range(self.order + 1)]
        backs: List[dict] = [dict() for _ in range(self.order + 1)]
        for ngram, p in lm.probs.items():
            ids = [tok(w) for w in ngram]
            if any(i is None for i in ids):
                continue  # <s>/</s>/OOV never appear in CTC histories
            probs[len(ids)][tuple(ids)] = p
        for ngram, b in lm.backoffs.items():
            ids = [tok(w) for w in ngram]
            if any(i is None for i in ids):
                continue
            backs[len(ids)][tuple(ids)] = b

        # Per order n: group entries by context (first n-1 tokens).
        self.tables = []
        for n in range(1, self.order + 1):
            ctxs: dict = {}
            for ids in set(probs[n]) | set(backs[n]):
                ctxs.setdefault(ids[:-1], []).append(ids[-1])
            ctx_keys = sorted(ctxs)
            win = max((len(v) for v in ctxs.values()), default=1)
            m = len(ctx_keys)
            chi = np.zeros(max(m, 1), np.int32)
            clo = np.zeros(max(m, 1), np.int32)
            words = np.full((max(m, 1), win), -1, np.int32)
            p_arr = np.full((max(m, 1), win), LOG10_NEG_INF, np.float32)
            pm_arr = np.zeros((max(m, 1), win), bool)
            b_arr = np.zeros((max(m, 1), win), np.float32)
            for i, c in enumerate(ctx_keys):
                chi[i], clo[i] = _pack_host(c)
                for j, w in enumerate(sorted(ctxs[c])):
                    words[i, j] = w
                    g = c + (w,)
                    if g in probs[n]:
                        p_arr[i, j] = probs[n][g]
                        pm_arr[i, j] = True
                    b_arr[i, j] = backs[n].get(g, 0.0)
            # Rows flattened so a context's window is one dynamic slice.
            self.tables.append(dict(
                n=n, n_ctx=m, win=win,
                chi=chi, clo=clo,
                words=words.reshape(-1), prob=p_arr.reshape(-1),
                prob_mask=pm_arr.reshape(-1), back=b_arr.reshape(-1)))
        self._dev = None

    def device_arrays(self):
        """Device-resident pytree of the tables — passed as a jit ARGUMENT
        (closing over them would embed the whole LM as HLO constants)."""
        if self._dev is None:
            self._dev = tuple(
                {f: jnp.asarray(t[f]) for f in
                 ("chi", "clo", "words", "prob", "prob_mask", "back")}
                for t in self.tables)
        return self._dev

    @property
    def meta(self):
        """Static structure: (order, per-order window widths)."""
        return (self.order, tuple(t["win"] for t in self.tables))


def _pack_host(ids: Tuple[int, ...]) -> Tuple[int, int]:
    """Right-aligned 9-bit slots; slots 0..2 -> lo, 3..5 -> hi."""
    lo = hi = 0
    for j, t in enumerate(reversed(ids)):  # j=0 is the LAST token
        v = t + 1
        if j < _SLOTS:
            lo |= v << (_BITS * j)
        else:
            hi |= v << (_BITS * (j - _SLOTS))
    return hi, lo


def _ctx_search(chi, clo, qhi, qlo):
    """Index of (qhi, qlo) in the sorted context arrays; found flag.
    Queries are (K,) — the gathers here touch K elements per step."""
    m = chi.shape[0]
    lo = jnp.zeros(qhi.shape, jnp.int32)
    hi = jnp.full(qhi.shape, m, jnp.int32)
    for _ in range(int(math.ceil(math.log2(max(m, 2)))) + 1):
        mid = (lo + hi) // 2
        mh, ml = chi[mid], clo[mid]
        less = (mh < qhi) | ((mh == qhi) & (ml < qlo))
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    idx = jnp.minimum(lo, m - 1)
    found = (lo < m) & (chi[idx] == qhi) & (clo[idx] == qlo)
    return jnp.where(found, idx, 0), found


def _shift_in(hi, lo, tok):
    """Append token to a packed (hi, lo) key: everything shifts one slot
    left; the token enters slot 0. Slot overflow beyond 2*_SLOTS drops."""
    mask = (1 << (_BITS * _SLOTS)) - 1
    top = lo >> (_BITS * (_SLOTS - 1))            # slot that moves to hi
    hi = ((hi << _BITS) | top) & mask
    lo = ((lo << _BITS) | (tok + 1)) & mask
    return hi, lo


def _truncate(hi, lo, n):
    """Keep only the last n token slots of a packed key (static n)."""
    if n >= 2 * _SLOTS:
        return hi, lo
    if n >= _SLOTS:
        keep = n - _SLOTS
        return hi & ((1 << (_BITS * keep)) - 1), lo
    return jnp.zeros_like(hi), lo & ((1 << (_BITS * n)) - 1)


def _drop_last(hi, lo):
    """Remove the LAST token (slot 0) of a packed key: shift right one
    slot, moving hi's lowest slot into lo's highest."""
    lo = (lo >> _BITS) | ((hi & ((1 << _BITS) - 1)) << (_BITS * (_SLOTS - 1)))
    hi = hi >> _BITS
    return hi, lo


def _window_slices(arrs, win, idx):
    """Contiguous `win`-wide windows of one order's arrays at context rows
    `idx` (K,): returns words/probs/prob_mask/backoffs as (K, win)."""
    words, prob, pmask, back = (arrs["words"], arrs["prob"],
                                arrs["prob_mask"], arrs["back"])

    def slice_one(s):
        return (lax.dynamic_slice(words, (s,), (win,)),
                lax.dynamic_slice(prob, (s,), (win,)),
                lax.dynamic_slice(pmask, (s,), (win,)),
                lax.dynamic_slice(back, (s,), (win,)))
    return jax.vmap(slice_one)(idx * win)


def _lm_scores_all(tarrays, tmeta, ctx_hi, ctx_lo, ctx_len, v):
    """alpha-less log10 P(w | ctx) for every w in [0, v): the exact
    ArpaLM.log10_cond walk, vectorized over (K, V).

    ctx_hi/lo: (K,) packed FULL history (last 2*_SLOTS tokens); ctx_len:
    (K,) true history length. Returns (K, V) float32 log10 probs.

    Per order: one small binary search over contexts ((K,) queries), one
    contiguous window slice, and a compare-matrix scatter to (V,) — no
    large-table gathers (see DeviceNgramTables). `tarrays` is the pytree of
    device arrays (a jit ARGUMENT — embedding a real 6-gram as trace
    constants would explode compilation); `tmeta` the static (order, wins)."""
    k = ctx_hi.shape[0]
    order, wins = tmeta
    toks = jnp.arange(v, dtype=jnp.int32)

    out = jnp.full((k, v), LOG10_NEG_INF, jnp.float32)
    found = jnp.zeros((k, v), bool)
    acc = jnp.zeros((k, v), jnp.float32)
    last_tok = (ctx_lo & ((1 << _BITS) - 1)) - 1      # last history token
    par_hi, par_lo = _drop_last(ctx_hi, ctx_lo)       # history minus last
    for n in range(order, 0, -1):
        arrs = tarrays[n - 1]
        # Context of the order-n query: last n-1 history tokens.
        qhi, qlo = _truncate(ctx_hi, ctx_lo, n - 1)
        idx, ok_ctx = _ctx_search(arrs["chi"], arrs["clo"], qhi, qlo)
        wwin, pwin, pmwin, _ = _window_slices(arrs, wins[n - 1], idx)
        # Scatter window probs to the vocabulary: each word appears at most
        # once per context window, so a masked sum selects it.
        hit = ((wwin[:, :, None] == toks[None, None, :])
               & pmwin[:, :, None]
               & (ok_ctx & (ctx_len >= n - 1))[:, None, None])
        probs_v = jnp.where(hit, pwin[:, :, None], 0.0).sum(1)
        found_v = hit.any(1)
        out = jnp.where(found_v & ~found, acc + probs_v, out)
        found = found | found_v
        if n > 1:
            # Backoff of the history (n-1)-gram: a point query in the
            # order-(n-1) table — context = the history MINUS its last
            # token (truncated to n-2), word = the history's last token.
            barrs = tarrays[n - 2]
            bqhi, bqlo = _truncate(par_hi, par_lo, n - 2)
            bidx, bok = _ctx_search(barrs["chi"], barrs["clo"], bqhi, bqlo)
            bwords, _, _, bback = _window_slices(barrs, wins[n - 2], bidx)
            sel = (bwords == last_tok[:, None]) & bok[:, None]
            b = jnp.where(sel, bback, 0.0).sum(1)
            b = jnp.where(ctx_len >= n - 1, b, 0.0)
            acc = jnp.where(found, acc, acc + b[:, None])
    # Unigram miss: acc + LOG10_NEG_INF (matches the host walk).
    out = jnp.where(found, out, acc + LOG10_NEG_INF)
    return out


# ------------------------------------------------------------- beam search
def _logaddexp(a, b):
    mx = jnp.maximum(a, b)
    mn = jnp.minimum(a, b)
    safe = jnp.clip(mn - mx, -80.0, 0.0)
    return jnp.where(mx <= NEG / 2, NEG, mx + jnp.log1p(jnp.exp(safe)))


def _device_beam_single(logp, length, tarrays, *, beam_size: int, blank: int,
                        tmeta: Optional[tuple],
                        alpha: float, beta: float,
                        cutoff_top_n: Optional[int]):
    """One utterance: (T, V) log-probs -> (tokens (K,U), lens (K,),
    scores (K,)) sorted best-first. U = T (a CTC labeling cannot be longer
    than its frame count)."""
    t_max, v = logp.shape
    k = beam_size
    u = max(t_max, 1)

    tokens0 = jnp.zeros((k, u), jnp.int32)
    lens0 = jnp.zeros((k,), jnp.int32)
    pb0 = jnp.full((k,), NEG).at[0].set(0.0)
    pnb0 = jnp.full((k,), NEG)
    lm0 = jnp.zeros((k,), jnp.float32)
    hi0 = jnp.zeros((k,), jnp.int32)
    lo0 = jnp.zeros((k,), jnp.int32)

    alpha_ln = alpha * LN10

    def frame(state, inp):
        tokens, lens, pb, pnb, lmsc, chi, clo = state
        lp, t = inp
        total = _logaddexp(pb, pnb)                          # (K,)
        last = jnp.where(
            lens > 0,
            jnp.take_along_axis(tokens, jnp.maximum(lens - 1, 0)[:, None],
                                axis=1)[:, 0],
            -1)

        # ---- stay candidates (K,): same prefix.
        stay_pb = total + lp[blank]
        stay_pnb = pnb + jnp.where(last >= 0, lp[jnp.maximum(last, 0)], NEG)

        # ---- extend candidates (K, V): prefix + v.
        ext = jnp.where(jnp.arange(v)[None, :] == last[:, None],
                        pb[:, None], total[:, None]) + lp[None, :]
        ext = jnp.where(jnp.arange(v)[None, :] == blank, NEG, ext)
        ext = jnp.where(lens[:, None] >= u, NEG, ext)        # capacity
        if cutoff_top_n is not None and cutoff_top_n < v:
            thresh = lax.top_k(lp, cutoff_top_n)[0][-1]
            ext = jnp.where(lp[None, :] >= thresh, ext, NEG)
            # Host parity: the repeat branch is also a candidate token —
            # outside the cutoff it is dropped there too (beam.py iterates
            # `for c in cand` for every branch).
            stay_pnb = jnp.where(
                (last >= 0) & (lp[jnp.maximum(last, 0)] >= thresh),
                stay_pnb, NEG)

        if tmeta is not None:
            lm_add = alpha_ln * _lm_scores_all(tarrays, tmeta, chi, clo,
                                               lens, v) + beta
        else:
            lm_add = jnp.zeros((k, v), jnp.float32)

        # ---- exact merge: ext(k, v=last[k2]) may equal stay prefix k2.
        # prefixes equal iff lens[k2] == lens[k]+1 and tokens agree on the
        # first lens[k] positions (k2's final token is v by construction).
        pos = jnp.arange(u)[None, None, :]
        agree = (tokens[:, None, :] == tokens[None, :, :]) | \
                (pos >= lens[:, None, None])
        prefix_eq = agree.all(-1) & (lens[None, :] == lens[:, None] + 1)
        # Only finite-score beams participate (dup -inf rows are inert).
        prefix_eq &= (total[:, None] > NEG / 2) & (total[None, :] > NEG / 2)
        vlast = jnp.maximum(last, 0)
        # ext contribution of (k -> prefix k2): ext[k, last[k2]].
        contrib = jnp.where(prefix_eq & (last[None, :] >= 0),
                            jnp.take_along_axis(
                                ext, vlast[None, :].repeat(k, 0), axis=1),
                            NEG)                              # (K src, K dst)
        merged_in = contrib.max(0)
        merged_in = jnp.where(
            merged_in > NEG / 2,
            merged_in + jnp.log(jnp.exp(contrib - merged_in[None, :])
                                .sum(0)),
            NEG)
        stay_pnb = _logaddexp(stay_pnb, merged_in)
        # Invalidate merged ext candidates.
        kill = (prefix_eq & (last[None, :] >= 0)).any(1)      # (K src,) per v?
        # kill is per (src k, dst) pair at token last[dst]; build (K, V) mask
        kill_kv = jnp.zeros((k, v), bool)
        dst_tok = jnp.where(last >= 0, last, 0)
        kill_kv = kill_kv.at[jnp.arange(k)[:, None].repeat(k, 1),
                             dst_tok[None, :].repeat(k, 0)].max(
            prefix_eq & (last[None, :] >= 0))
        ext = jnp.where(kill_kv, NEG, ext)

        # ---- assemble candidate scores and select top-K.
        stay_tot = _logaddexp(stay_pb, stay_pnb) + lmsc
        ext_lm = lmsc[:, None] + lm_add
        ext_tot = ext + ext_lm
        ext_tot = jnp.where(ext > NEG / 2, ext_tot, NEG)
        cand = jnp.concatenate([stay_tot, ext_tot.reshape(-1)])
        _, top = lax.top_k(cand, k)

        is_stay = top < k
        parent = jnp.where(is_stay, top, (top - k) // v)
        newtok = jnp.where(is_stay, 0, (top - k) % v)

        g = lambda a: a[parent]
        ntokens, nlens = g(tokens), g(lens)
        npb = jnp.where(is_stay, stay_pb[parent], NEG)
        npnb = jnp.where(is_stay, stay_pnb[parent],
                         ext[parent, newtok])
        nlm = jnp.where(is_stay, lmsc[parent], ext_lm[parent, newtok])
        nhi, nlo = g(chi), g(clo)
        shi, slo = _shift_in(nhi, nlo, newtok)
        nhi = jnp.where(is_stay, nhi, shi)
        nlo = jnp.where(is_stay, nlo, slo)
        write = (~is_stay)[:, None] & (jnp.arange(u)[None, :]
                                       == nlens[:, None])
        ntokens = jnp.where(write, newtok[:, None], ntokens)
        nlens = nlens + (~is_stay)

        live = t < length
        out = tuple(jnp.where(live, n, o) for n, o in
                    zip((ntokens, nlens, npb, npnb, nlm, nhi, nlo),
                        (tokens, lens, pb, pnb, lmsc, chi, clo)))
        return out, None

    state0 = (tokens0, lens0, pb0, pnb0, lm0, hi0, lo0)
    (tokens, lens, pb, pnb, lmsc, _, _), _ = lax.scan(
        frame, state0, (logp, jnp.arange(t_max)))
    scores = _logaddexp(pb, pnb) + lmsc
    order = jnp.argsort(-scores)
    return tokens[order], lens[order], scores[order]


@partial(jax.jit, static_argnames=("beam_size", "blank", "tmeta",
                                   "cutoff_top_n"))
def _device_beam_batch(logp, lengths, tarrays, alpha, beta, *,
                       beam_size, blank, tmeta, cutoff_top_n):
    """Stable jitted batch entry: a fresh vmap(lambda) per call would break
    the jit dispatch fast path (re-lower + executable reload every call —
    measured ~8 s of host overhead per batch over the TPU tunnel)."""
    return jax.vmap(lambda x, n: _device_beam_single(
        x, n, tarrays, beam_size=beam_size, blank=blank, tmeta=tmeta,
        alpha=alpha, beta=beta, cutoff_top_n=cutoff_top_n))(logp, lengths)


def device_beam_search(logp: np.ndarray, lengths: np.ndarray,
                       beam_size: int = 16, blank: int = 0,
                       tables: Optional[DeviceNgramTables] = None,
                       alpha: float = 0.6, beta: float = 1.0,
                       cutoff_top_n: Optional[int] = None
                       ) -> List[List[Tuple[Tuple[int, ...], float]]]:
    """Batch API matching `ctc_prefix_beam_search`'s outputs: per item, a
    best-first list of (prefix tuple, combined log score)."""
    logp = jnp.asarray(logp, jnp.float32)
    lengths = jnp.asarray(lengths, jnp.int32)
    tarrays = tables.device_arrays() if tables is not None else ()
    tmeta = tables.meta if tables is not None else None
    tokens, lens, scores = _device_beam_batch(
        logp, lengths, tarrays, float(alpha), float(beta),
        beam_size=beam_size, blank=blank, tmeta=tmeta,
        cutoff_top_n=cutoff_top_n)
    tokens, lens, scores = (np.asarray(tokens), np.asarray(lens),
                            np.asarray(scores, np.float64))
    out = []
    for b in range(tokens.shape[0]):
        beams = []
        for i in range(tokens.shape[1]):
            if scores[b, i] <= NEG / 2:
                beams.append(((), -float("inf")))
            else:
                beams.append((tuple(int(x) for x in
                              tokens[b, i, : lens[b, i]]),
                              float(scores[b, i])))
        out.append(beams)
    return out


class CTCDeviceBeamSearchDecoder:
    """Engine-compatible decoder running the WHOLE beam search on device.

    Drop-in alternative to `beam.CTCBeamSearchDecoder` for LM-free or
    n-gram-fused decoding (no neural rescoring — that stays a host-driven
    GPT pass): `device_fn` passes logits through the jitted eval step;
    `__call__` runs the jitted scan (decode/device_beam.py) and
    detokenizes the best beam. Scores/semantics are oracle-anchored to the
    host decoders (tests/test_beam_oracle.py).
    """

    def __init__(self, tokenizer_path: str, beam_size: int = 16,
                 ngram_path: Optional[str] = None, ngram_tmp: float = 1.0,
                 ngram_alpha: float = 0.6, ngram_beta: float = 1.0,
                 ngram_offset: int = 100,
                 cutoff_top_n: Optional[int] = None, blank: int = 0):
        from avec_tpu.decode.ngram import ArpaLM
        from avec_tpu.utils.tokenizer import load_tokenizer

        self.tokenizer = load_tokenizer(tokenizer_path)
        self.beam_size = beam_size
        self.ngram_tmp = ngram_tmp
        self.alpha = ngram_alpha
        self.beta = ngram_beta
        self.cutoff_top_n = cutoff_top_n
        self.blank = blank
        self.tables = (DeviceNgramTables(ArpaLM(ngram_path),
                                         offset=ngram_offset)
                       if ngram_path else None)

    def device_fn(self, outputs):
        return outputs  # full logits to the decode stage (still on device)

    def __call__(self, outputs, from_logits: bool = True) -> List[str]:
        if not from_logits:
            labels, lens = np.asarray(outputs[0]), np.asarray(outputs[1])
            return self.tokenizer.decode(
                [labels[b, : lens[b]].tolist() for b in range(len(labels))])
        logits = np.asarray(outputs[0], np.float32) / self.ngram_tmp
        lengths = np.asarray(outputs[1]).astype(np.int32)
        m = logits.max(-1, keepdims=True)
        logp = logits - (m + np.log(np.exp(logits - m).sum(-1,
                                                           keepdims=True)))
        beams = device_beam_search(
            logp, lengths, beam_size=self.beam_size, blank=self.blank,
            tables=self.tables, alpha=self.alpha, beta=self.beta,
            cutoff_top_n=self.cutoff_top_n)
        return self.tokenizer.decode([list(bs[0][0]) for bs in beams])
