# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""RNN-Transducer loss in JAX.

Behavioral parity target: /root/reference/nnet/losses.py:336-357 (wrapping
torchaudio.transforms.RNNTLoss: logits (B, T, U+1, V), targets (B, U),
blank id, mean-over-batch reduction).

Log-domain alpha recursion over the (T, U+1) lattice via lax.scan over time
with an inner scan over the label axis; differentiable by autodiff, all
shapes static, variable lengths handled by masking.
"""

import jax
import jax.numpy as jnp
from jax import lax

_NEG_INF = -1e30


def rnnt_forward_score(log_probs: jnp.ndarray, logit_lengths: jnp.ndarray,
                       labels: jnp.ndarray, label_lengths: jnp.ndarray,
                       blank: int = 0) -> jnp.ndarray:
    """(B,) negative log likelihood. log_probs: (B, T, U+1, V)."""
    b, t, u1, v = log_probs.shape
    u = u1 - 1
    assert labels.shape[1] == u

    # blank_lp[b, t, u] = lp(blank); label_lp[b, t, u] = lp(labels[u]).
    blank_lp = log_probs[..., blank]                                   # (B,T,U+1)
    lab = labels.astype(jnp.int32)
    label_lp = jnp.take_along_axis(
        log_probs[:, :, :u, :], lab[:, None, :, None].repeat(t, axis=1),
        axis=3)[..., 0]                                                # (B,T,U)

    upos = lax.broadcasted_iota(jnp.int32, (1, u1), 1)
    u_valid = upos <= label_lengths.astype(jnp.int32)[:, None]         # (B,U+1)

    def time_step(alpha, inputs):
        # alpha: (B, U+1) for time t-1; advance to time t.
        # blank transition consumes frame t-1 at u; label transition emits
        # label u-1 at the CURRENT frame t.
        blank_prev, label_cur, t_i = inputs  # (B,U+1) at t-1, (B,U) at t
        from_blank = alpha + blank_prev

        # In-row recurrence: new[u] = logaddexp(from_blank[u],
        #                                        new[u-1] + label_prev[u-1]).
        def u_step(carry, x):
            fb, lp_lab = x  # scalars per batch: (B,), (B,)
            new = jnp.logaddexp(fb, carry + lp_lab)
            return new, new

        init = from_blank[:, 0]
        _, rest = lax.scan(
            u_step, init,
            (from_blank[:, 1:].T, label_cur.T))                        # (U, B)
        new_alpha = jnp.concatenate([init[:, None], rest.T], axis=1)
        new_alpha = jnp.where(u_valid, new_alpha, _NEG_INF)
        active = (t_i < logit_lengths.astype(jnp.int32))[:, None]
        new_alpha = jnp.where(active, new_alpha, alpha)
        return new_alpha, None

    # alpha at t=0: alpha[0,0]=0; alpha[0,u] = sum_{k<u} label_lp[0,k].
    first_lab = jnp.where(u_valid[:, 1:], label_lp[:, 0, :], _NEG_INF)
    alpha0 = jnp.concatenate(
        [jnp.zeros((b, 1), log_probs.dtype),
         jnp.cumsum(first_lab, axis=1)], axis=1)
    alpha0 = jnp.where(u_valid, alpha0, _NEG_INF)

    time_idx = jnp.arange(1, t)
    inputs = (blank_lp[:, :-1].transpose(1, 0, 2),
              label_lp[:, 1:].transpose(1, 0, 2), time_idx)
    alpha, _ = lax.scan(time_step, alpha0, inputs)

    # Final: alpha[T-1, U] + blank_lp[T-1, U].
    tl = (logit_lengths.astype(jnp.int32) - 1).clip(0)
    ul = label_lengths.astype(jnp.int32)
    a_final = jnp.take_along_axis(alpha, ul[:, None], axis=1)[:, 0]
    blank_final = jnp.take_along_axis(
        jnp.take_along_axis(blank_lp, tl[:, None, None].repeat(u1, 2),
                            axis=1)[:, 0, :], ul[:, None], axis=1)[:, 0]
    return -(a_final + blank_final)


def rnnt_loss(logits: jnp.ndarray, logit_lengths: jnp.ndarray,
              labels: jnp.ndarray, label_lengths: jnp.ndarray,
              blank: int = 0, reduction: str = "mean") -> jnp.ndarray:
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = rnnt_forward_score(log_probs, logit_lengths, labels, label_lengths,
                             blank)
    if reduction == "none":
        return nll
    if reduction == "sum":
        return nll.sum()
    return nll.mean()


class RNNTLoss:
    """(targets=(y, y_len), outputs=(logits, logits_len)) callable
    (ref: nnet/losses.py:336-357)."""

    def __init__(self, blank=0, clamp=-1, reduction="mean"):
        self.blank = blank
        self.reduction = reduction

    def __call__(self, targets, outputs):
        y, y_len = targets
        logits, logits_len = outputs
        return rnnt_loss(logits, logits_len, y, y_len, blank=self.blank,
                         reduction=self.reduction)
