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
    """Open-addressing hash table over ALL n-grams of one ARPA LM, keyed by
    packed TOKEN-ID n-grams.

    Built host-side from `ngram.ArpaLM` (words are chr(id + offset),
    decoders.py:187). One table holds every order's entries (the order is
    encoded in the key's high bits); each entry carries BOTH its log10 prob
    and its backoff weight (0 when absent — matching ArpaLM's
    `backoffs.get(h, 0.0)`).

    Device lookups are O(probe_depth) gathers — the table is built with a
    BOUNDED max probe depth (rehash/grow until <= 8), so a query is ~6 ops
    instead of an unrolled log2(M)-step binary search. Op count is what
    latency-binds a `lax.scan` body on TPU, not FLOPs.
    """

    PROBE = 8

    def __init__(self, lm, offset: int = 100, vocab_size: int = 0):
        assert lm.order <= MAX_ORDER, f"order {lm.order} > {MAX_ORDER}"
        self.order = lm.order

        def tok(word: str) -> Optional[int]:
            i = ord(word) - offset if len(word) == 1 else -1
            return i if 0 <= i < (1 << _BITS) - 1 else None

        entries = {}  # (hi, lo) -> [prob, backoff]
        for ngram, p in lm.probs.items():
            ids = [tok(w) for w in ngram]
            if any(i is None for i in ids):
                continue  # <s>/</s>/OOV never appear in CTC histories
            entries[_pack_host(tuple(ids))] = [p, 0.0]
        for ngram, b in lm.backoffs.items():
            ids = [tok(w) for w in ngram]
            if any(i is None for i in ids):
                continue
            key = _pack_host(tuple(ids))
            if key in entries:
                entries[key][1] = b
            else:
                # Backoff-only entry (no prob): prob = miss sentinel.
                entries[key] = [None, b]
        self._build_hash(entries)

    def _build_hash(self, entries):
        n = max(len(entries), 1)
        size = 1
        while size < 4 * n:
            size *= 2
        keys = np.array(sorted(entries), dtype=np.int64)  # (M, 2) hi, lo
        for attempt in range(8):
            a = (0x9E3779B1 + 2 * attempt * 0x85EBCA77) & 0xFFFFFFFF
            b = (0xC2B2AE35 + 2 * attempt * 0x27D4EB2F) & 0xFFFFFFFF
            khi = np.full(size, -1, np.int32)
            klo = np.full(size, -1, np.int32)
            kp = np.full(size, LOG10_NEG_INF, np.float32)
            kb = np.zeros(size, np.float32)
            kpm = np.zeros(size, bool)  # prob present
            ok = True
            for (hi, lo) in keys:
                e = entries[(int(hi), int(lo))]
                # 32-bit wrapping hash in plain Python ints (numpy raises
                # on uint32 overflow instead of wrapping).
                h = ((int(lo) * a + int(hi) * b) & 0xFFFFFFFF) & (size - 1)
                for d in range(self.PROBE):
                    i = (h + d) & (size - 1)
                    if khi[i] == -1 and klo[i] == -1:
                        khi[i], klo[i] = hi, lo
                        if e[0] is not None:
                            kp[i], kpm[i] = e[0], True
                        kb[i] = e[1]
                        break
                else:
                    ok = False
                    break
            if ok:
                break
            size *= 2  # grow and retry with fresh multipliers
        assert ok, "hash build failed"
        self.size, self.mult_a, self.mult_b = size, a, b
        self.khi, self.klo = khi, klo
        self.kprob, self.kback, self.kprob_mask = kp, kb, kpm


def _pack_host(ids: Tuple[int, ...]) -> Tuple[int, int]:
    """Right-aligned 9-bit slots; slots 0..2 -> lo, 3..5 -> hi; the order
    (token count) tags bits 27.. of hi so same-suffix n-grams of different
    orders cannot collide."""
    lo = hi = 0
    for j, t in enumerate(reversed(ids)):  # j=0 is the LAST token
        v = t + 1
        if j < _SLOTS:
            lo |= v << (_BITS * j)
        else:
            hi |= v << (_BITS * (j - _SLOTS))
    return hi | (len(ids) << (_BITS * _SLOTS)), lo


def _order_tag(hi, n):
    return hi | (n << (_BITS * _SLOTS))


def _hash_lookup(t: DeviceNgramTables, qhi, qlo):
    """(prob_found, prob, backoff) for packed queries, O(PROBE) gathers."""
    khi = jnp.asarray(t.khi)
    klo = jnp.asarray(t.klo)
    kp = jnp.asarray(t.kprob)
    kb = jnp.asarray(t.kback)
    kpm = jnp.asarray(t.kprob_mask)
    h = ((qlo.astype(jnp.uint32) * jnp.uint32(t.mult_a)
          + qhi.astype(jnp.uint32) * jnp.uint32(t.mult_b))
         & jnp.uint32(t.size - 1)).astype(jnp.int32)
    found = jnp.zeros(qhi.shape, bool)
    pfound = jnp.zeros(qhi.shape, bool)
    prob = jnp.full(qhi.shape, LOG10_NEG_INF, jnp.float32)
    back = jnp.zeros(qhi.shape, jnp.float32)
    for d in range(t.PROBE):
        idx = (h + d) & (t.size - 1)
        hit = (khi[idx] == qhi) & (klo[idx] == qlo) & ~found
        prob = jnp.where(hit, kp[idx], prob)
        back = jnp.where(hit, kb[idx], back)
        pfound = pfound | (hit & kpm[idx])
        found = found | hit
    return pfound, prob, back


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


def _lm_scores_all(tables: DeviceNgramTables, ctx_hi, ctx_lo, ctx_len, v):
    """alpha-less log10 P(w | ctx) for every w in [0, v): the exact
    ArpaLM.log10_cond walk, vectorized over (K, V).

    ctx_hi/lo: (K,) packed FULL history (last 2*_SLOTS tokens, untagged);
    ctx_len: (K,) true history length. Returns (K, V) float32 log10 probs.
    Per order: ONE (K, V) hash lookup for the n-gram probs + ONE (K,)
    lookup for the history backoff — O(PROBE) gathers each, so the whole
    walk stays ~100 ops (op count is what latency-binds scan bodies)."""
    k = ctx_hi.shape[0]
    toks = jnp.arange(v, dtype=jnp.int32)
    # Packed (history + w) for each (k, w): shift w into slot 0.
    qhi, qlo = _shift_in(ctx_hi[:, None], ctx_lo[:, None], toks[None, :])

    out = jnp.full((k, v), LOG10_NEG_INF, jnp.float32)
    found = jnp.zeros((k, v), bool)
    acc = jnp.zeros((k, v), jnp.float32)
    for n in range(tables.order, 0, -1):
        # Order n uses the last n-1 history tokens + w.
        nhi, nlo = _truncate(qhi, qlo, n)
        hit, p, _ = _hash_lookup(tables, _order_tag(nhi, n), nlo)
        # Only orders with enough history participate (n-1 <= ctx_len).
        hit = hit & (ctx_len[:, None] >= n - 1)
        take = hit & ~found
        out = jnp.where(take, acc + p, out)
        found = found | hit
        if n > 1:
            # Backoff of the history (n-1)-gram, applied when not found.
            bhi, blo = _truncate(ctx_hi, ctx_lo, n - 1)
            bfound, _, b = _hash_lookup(tables, _order_tag(bhi, n - 1), blo)
            b = jnp.where(bfound & (ctx_len >= n - 1), b, 0.0)
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


@partial(jax.jit, static_argnames=("beam_size", "blank", "tables",
                                   "cutoff_top_n"))
def _device_beam_single(logp, length, *, beam_size: int, blank: int,
                        tables: Optional[DeviceNgramTables],
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

        if tables is not None:
            lm_add = alpha_ln * _lm_scores_all(tables, chi, clo,
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
    fn = jax.vmap(lambda x, n: _device_beam_single(
        x, n, beam_size=beam_size, blank=blank, tables=tables,
        alpha=alpha, beta=beta, cutoff_top_n=cutoff_top_n))
    tokens, lens, scores = fn(logp, lengths)
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
