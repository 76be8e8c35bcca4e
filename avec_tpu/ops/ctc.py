# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""CTC loss, natively in JAX (log-domain forward algorithm).

Behavioral parity target: /root/reference/nnet/losses.py:292-334 which wraps
torch.nn.CTCLoss over log_softmax(logits). Reductions (ref :296-306):
  "mean":    per-sample total NLL, mean over batch
  "sum":     per-sample total NLL, summed
  "default": torch 'mean': per-sample NLL / max(target_len, 1), mean over batch
zero_infinity clamps infeasible samples (target longer than input allows) to 0.

TPU-first design: a lax.scan over time with an (B, S) alpha state,
S = 2*U_max + 1 interleaved blank/label positions; all shapes static, fully
differentiable, jit/vmap/pjit-compatible. The gradient is the classic
alpha-beta posterior (custom_vjp): dNLL/dlog_p[t, v] =
-sum_{s: ext[s]=v} exp(alpha_t[s] + beta_t[s] - log Z) — one forward scan
plus one reverse scan instead of autodiff's transposed replay (measured
cheaper on TPU: autodiff's scan transpose re-gathers per step).

Constraint: custom_vjp makes the loss reverse-mode only — jax.jvp/
jax.hessian through ctc_loss raise; training uses reverse-mode grad
exclusively.
"""

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_NEG_INF = -1e30


def _logaddexp(a, b):
    return jnp.logaddexp(a, b)


def _ctc_topology(log_probs, labels, label_lengths, blank):
    """Extended-sequence tensors shared by the alpha and beta recursions."""
    b, t, v = log_probs.shape
    u = labels.shape[1]
    s = 2 * u + 1

    # Extended label sequence: blank, y0, blank, y1, ..., blank. (B, S)
    ext = jnp.full((b, s), blank, dtype=labels.dtype)
    ext = ext.at[:, 1::2].set(labels)

    pos = lax.broadcasted_iota(jnp.int32, (1, s), 1)
    valid_s = pos <= 2 * label_lengths.astype(jnp.int32)[:, None]  # (B, S)

    # Skip transition allowed from s-2 when ext[s] is a label differing from
    # ext[s-2] (standard CTC topology).
    ext_m2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=blank)[:, :s]
    can_skip = (pos >= 2) & (ext != blank) & (ext != ext_m2)

    # Per-frame log prob of each extended label, (B, T, S). A one-hot
    # batched matmul instead of take_along_axis: TPU gathers of a
    # (B, T, S) index tensor cost ~2 ms/step at the bench shapes while the
    # MXU einsum is ~free (B*T*V*S ~ 40 MFLOP), and its transpose (the
    # scatter in the backward) is again a matmul.
    onehot = jax.nn.one_hot(ext.astype(jnp.int32), log_probs.shape[-1],
                            dtype=log_probs.dtype)          # (B, S, V)
    lp_ext = jnp.einsum("btv,bsv->bts", log_probs, onehot)
    return ext, pos, valid_s, can_skip, lp_ext


def _ctc_alpha(lp_ext, logit_lengths, label_lengths, valid_s, can_skip):
    """Forward recursion. Returns (alpha_all (T, B, S), nll (B,))."""
    t = lp_ext.shape[1]
    s = lp_ext.shape[2]
    neg = jnp.full((), _NEG_INF, dtype=lp_ext.dtype)

    alpha0 = jnp.full(lp_ext.shape[:1] + (s,), _NEG_INF, dtype=lp_ext.dtype)
    alpha0 = alpha0.at[:, 0].set(lp_ext[:, 0, 0])
    has_label = label_lengths > 0
    alpha0 = alpha0.at[:, 1].set(jnp.where(has_label, lp_ext[:, 0, 1], neg))
    alpha0 = jnp.where(valid_s, alpha0, neg)

    time_idx = jnp.arange(t)

    def step(alpha, inputs):
        lp_t, t_i = inputs  # (B, S), scalar
        a_m1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=_NEG_INF)[:, :s]
        a_m2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=_NEG_INF)[:, :s]
        a_m2 = jnp.where(can_skip, a_m2, neg)
        new = _logaddexp(_logaddexp(alpha, a_m1), a_m2) + lp_t
        new = jnp.where(valid_s, new, neg)
        # Freeze alpha past each sample's last valid frame.
        active = (t_i < logit_lengths.astype(jnp.int32))[:, None]
        new = jnp.where(active, new, alpha)
        return new, new

    lp_seq = lp_ext.transpose(1, 0, 2)  # (T, B, S)
    # unroll=8: the per-iteration state is tiny ((B, S) fp32), so the scan
    # is launch-latency-bound on TPU; unrolling amortizes loop plumbing.
    alpha, alpha_rest = lax.scan(step, alpha0, (lp_seq[1:], time_idx[1:]),
                                 unroll=8)
    alpha_all = jnp.concatenate([alpha0[None], alpha_rest], axis=0)

    # Final score: logsumexp of positions 2*U_b and 2*U_b - 1.
    last = 2 * label_lengths.astype(jnp.int32)
    a_last = jnp.take_along_axis(alpha, last[:, None], axis=1)[:, 0]
    a_prev = jnp.take_along_axis(
        alpha, jnp.maximum(last - 1, 0)[:, None], axis=1)[:, 0]
    a_prev = jnp.where(label_lengths > 0, a_prev, neg)
    return alpha_all, -_logaddexp(a_last, a_prev)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _ctc_score(log_probs, logit_lengths, labels, label_lengths, blank):
    _, _, valid_s, can_skip, lp_ext = _ctc_topology(
        log_probs, labels, label_lengths, blank)
    _, nll = _ctc_alpha(lp_ext, logit_lengths, label_lengths, valid_s,
                        can_skip)
    return nll


def _ctc_score_fwd(log_probs, logit_lengths, labels, label_lengths, blank):
    ext, pos, valid_s, can_skip, lp_ext = _ctc_topology(
        log_probs, labels, label_lengths, blank)
    alpha_all, nll = _ctc_alpha(lp_ext, logit_lengths, label_lengths,
                                valid_s, can_skip)
    res = (alpha_all, nll, ext, pos, valid_s, can_skip, lp_ext,
           logit_lengths, labels, label_lengths, log_probs.shape[2])
    return nll, res


def _ctc_score_bwd(blank, res, g):
    """Classic alpha-beta CTC gradient: one reverse scan + a posterior
    scatter, instead of autodiff's transposed alpha-scan replay."""
    (alpha_all, nll, ext, pos, valid_s, can_skip, lp_ext,
     logit_lengths, labels, label_lengths, v) = res
    t = lp_ext.shape[1]
    s = lp_ext.shape[2]
    neg = jnp.full((), _NEG_INF, dtype=lp_ext.dtype)

    # beta_{len-1}[s] = 0 at s in {2U, 2U-1}; the reverse recursion freezes
    # (keeps the end state) for frames past each sample's length, mirroring
    # the forward freeze.
    last = 2 * label_lengths.astype(jnp.int32)
    end_state = jnp.where(
        (pos == last[:, None])
        | ((pos == last[:, None] - 1) & (label_lengths > 0)[:, None]),
        jnp.zeros((), lp_ext.dtype), neg)
    end_state = jnp.where(valid_s, end_state, neg)

    # Skip transition s -> s+2 exists iff can_skip at s+2.
    can_skip_p2 = jnp.pad(can_skip, ((0, 0), (0, 2)))[:, 2:]

    lp_seq = lp_ext.transpose(1, 0, 2)  # (T, B, S)
    time_idx = jnp.arange(t)

    def step(beta, inputs):
        lp_t1, t1 = inputs  # consumes frame t1, produces beta_{t1-1}
        c = beta + lp_t1
        c_p1 = jnp.pad(c, ((0, 0), (0, 1)), constant_values=_NEG_INF)[:, 1:]
        c_p2 = jnp.pad(c, ((0, 0), (0, 2)), constant_values=_NEG_INF)[:, 2:]
        c_p2 = jnp.where(can_skip_p2, c_p2, neg)
        new = _logaddexp(_logaddexp(c, c_p1), c_p2)
        new = jnp.where(valid_s, new, neg)
        active = (t1 < logit_lengths.astype(jnp.int32))[:, None]
        new = jnp.where(active, new, beta)
        return new, new

    _, beta_rest = lax.scan(step, end_state, (lp_seq[1:], time_idx[1:]),
                            unroll=8,
                            reverse=True)
    beta_all = jnp.concatenate([beta_rest, end_state[None]], axis=0)

    # Posterior gamma_t(s) = exp(alpha_t + beta_t - logZ); logZ = -nll.
    log_gamma = alpha_all + beta_all + nll[None, :, None]
    frame_ok = (time_idx[:, None] < logit_lengths.astype(jnp.int32)[None, :])
    gamma = jnp.exp(jnp.minimum(log_gamma, 0.0))
    gamma = jnp.where(frame_ok[:, :, None] & valid_s[None], gamma, 0.0)

    # Scatter extended positions back to the vocab: (T,B,S) x (B,S,V).
    onehot = jax.nn.one_hot(ext.astype(jnp.int32), v, dtype=gamma.dtype)
    dlp = -jnp.einsum("tbs,bsv->btv", gamma, onehot)
    dlp = dlp * g[:, None, None]

    zero = lambda x: np.zeros(np.shape(x), dtype=jax.dtypes.float0)
    return (dlp, zero(logit_lengths), zero(labels), zero(label_lengths))


_ctc_score.defvjp(_ctc_score_fwd, _ctc_score_bwd)


def ctc_forward_score(log_probs: jnp.ndarray, logit_lengths: jnp.ndarray,
                      labels: jnp.ndarray, label_lengths: jnp.ndarray,
                      blank: int = 0) -> jnp.ndarray:
    """Per-sample negative log likelihood of the label sequences.

    Args:
      log_probs: (B, T, V) log-softmax outputs.
      logit_lengths: (B,) valid frame counts.
      labels: (B, U) padded label ids.
      label_lengths: (B,) valid label counts.
      blank: blank id (0 everywhere in the reference).

    Returns: (B,) total NLL per sample (sum over frames), matching
    torch.nn.CTCLoss(reduction='none').
    """
    return _ctc_score(log_probs, logit_lengths, labels,
                      label_lengths, blank)


def ctc_loss(logits: jnp.ndarray, logit_lengths: jnp.ndarray,
             labels: jnp.ndarray, label_lengths: jnp.ndarray,
             blank: int = 0, reduction: str = "mean",
             zero_infinity: bool = False) -> jnp.ndarray:
    """CTC loss over raw logits (applies log_softmax, ref nnet/losses.py:325).

    Computed in fp32 regardless of input dtype for numerical stability.
    """
    assert reduction in ("mean", "sum", "default", "none")
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = ctc_forward_score(log_probs, logit_lengths, labels, label_lengths, blank)
    if zero_infinity:
        # Infeasible alignments surface as ~1e30; clamp to 0 with zero grad.
        bad = nll >= -0.5 * _NEG_INF
        nll = jnp.where(bad, lax.stop_gradient(nll) * 0.0, nll)
    if reduction == "none":
        return nll
    if reduction == "mean":
        return nll.mean()
    if reduction == "sum":
        return nll.sum()
    # "default" == torch reduction='mean': divide by target lengths.
    denom = jnp.maximum(label_lengths.astype(nll.dtype), 1.0)
    return (nll / denom).mean()


def ctc_greedy_collapse(preds: jnp.ndarray, lengths: jnp.ndarray,
                        blank: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """On-device greedy CTC collapse: drop repeats then blanks.

    preds: (B, T) argmax token ids; lengths: (B,) valid frames.
    Returns (tokens, token_lengths) where tokens is (B, T) left-packed with
    `blank` padding. Mirrors CTCGreedySearchDecoder.greedy_search
    (/root/reference/nnet/decoders.py:97-120) without the Python loops.
    """
    b, t = preds.shape
    pos = lax.broadcasted_iota(jnp.int32, (b, t), 1)
    valid = pos < lengths.astype(jnp.int32)[:, None]
    prev = jnp.pad(preds, ((0, 0), (1, 0)), constant_values=blank)[:, :t]
    keep = valid & (preds != blank) & (preds != prev)
    # Left-pack kept tokens via cumsum-based scatter.
    target_idx = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
    target_idx = jnp.where(keep, target_idx, t)  # dump dropped tokens at t
    out = jnp.full((b, t + 1), blank, dtype=preds.dtype)
    out = jax.vmap(lambda o, idx, p: o.at[idx].set(p))(out, target_idx, preds)
    return out[:, :t], keep.sum(axis=1)
