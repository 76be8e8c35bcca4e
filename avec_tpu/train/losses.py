# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Loss functions (pure jax callables over (targets, outputs)).

Behavioral parity target: /root/reference/nnet/losses.py. Each class is a
stateless callable usable inside a jitted train step. The (targets, outputs)
call convention and unpacking rules match the reference's forward methods.
"""

from typing import Optional

import jax
import jax.numpy as jnp

from avec_tpu.ops.ctc import ctc_loss


class Reduction:
    """sum / mean / mean_batch (ref: nnet/losses.py:25-45)."""

    def __init__(self, reduction="mean"):
        assert reduction in ("sum", "mean", "mean_batch")
        self.reduction = reduction

    def __call__(self, x, n_elt=None):
        if self.reduction == "sum":
            return x.sum()
        if self.reduction == "mean":
            return x.sum() / n_elt if n_elt is not None else x.mean()
        return x.mean(axis=0).sum()  # mean_batch


class MeanLoss:
    """Signed mean (ref: nnet/losses.py:47-79)."""

    def __init__(self, targets_as_sign=True, targets=None, reduction="mean"):
        self.targets_as_sign = targets_as_sign
        self.targets = targets
        self.reduction = Reduction(reduction)

    def __call__(self, targets, outputs):
        y_pred = outputs
        y = jnp.full_like(y_pred, self.targets) if self.targets is not None else targets
        if self.targets_as_sign:
            y_pred = jnp.where(y == 1, -y_pred, y_pred)
        return self.reduction(y_pred)


class HingeLoss:
    """ref: nnet/losses.py:81-116."""

    def __init__(self, margin=1.0, targets=None, reduction="mean"):
        self.margin = margin
        self.targets = targets
        self.reduction = Reduction(reduction)

    def __call__(self, targets, outputs):
        y_pred = outputs
        y = jnp.full_like(y_pred, self.targets) if self.targets is not None else targets
        loss = jnp.where(y > 0, jax.nn.relu(self.margin - y_pred),
                         jax.nn.relu(self.margin + y_pred))
        return self.reduction(loss)


class MeanAbsoluteError:
    """ref: nnet/losses.py:118-164."""

    def __init__(self, convert_one_hot=False, masked=False, reduction="mean"):
        self.convert_one_hot = convert_one_hot
        self.masked = masked
        self.reduction = Reduction(reduction)

    def __call__(self, targets, outputs):
        if self.masked:
            y_pred, mask = outputs
        else:
            y_pred, mask = outputs, None
        y = targets
        if self.convert_one_hot:
            y = jax.nn.one_hot(y, y_pred.shape[-1], dtype=y_pred.dtype)
        loss = jnp.abs(y_pred - y)
        if mask is not None:
            loss = loss * mask
            n = jnp.count_nonzero(mask)
        else:
            n = loss.size
        return self.reduction(loss, n_elt=n)


class MeanSquaredError:
    """ref: nnet/losses.py:166-211."""

    def __init__(self, convert_one_hot=False, targets=None, factor=1.0,
                 reduction="mean"):
        self.convert_one_hot = convert_one_hot
        self.targets = targets
        self.factor = factor
        self.reduction = Reduction(reduction)

    def __call__(self, targets, outputs):
        y_pred = outputs
        y = jnp.full_like(y_pred, self.targets) if self.targets is not None else targets
        if self.convert_one_hot:
            y = jax.nn.one_hot(y, y_pred.shape[-1], dtype=y_pred.dtype)
        return self.reduction(self.factor * (y_pred - y) ** 2)


class HuberLoss:
    """ref: nnet/losses.py:213-256."""

    def __init__(self, convert_one_hot=False, targets=None, delta=1.0,
                 factor=1.0, reduction="mean"):
        self.convert_one_hot = convert_one_hot
        self.targets = targets
        self.delta = delta
        self.factor = factor
        self.reduction = Reduction(reduction)

    def __call__(self, targets, outputs):
        y_pred = outputs
        y = jnp.full_like(y_pred, self.targets) if self.targets is not None else targets
        if self.convert_one_hot:
            y = jax.nn.one_hot(y, y_pred.shape[-1], dtype=y_pred.dtype)
        err = jnp.abs(y_pred - y)
        loss = jnp.where(err <= self.delta, 0.5 * err ** 2,
                         self.delta * (err - 0.5 * self.delta))
        return self.reduction(self.factor * loss)


class SoftmaxCrossEntropy:
    """Masked CE with ignore_index (ref: nnet/losses.py:258-290).

    transpose_logits in the reference moves (B, T, V) -> (B, V, T) for torch
    CE; here logits are always (..., V) so the flag is a no-op kept for
    config compatibility.
    """

    def __init__(self, ignore_index=-1, transpose_logits=False, reduction="mean"):
        self.ignore_index = ignore_index
        self.reduction = Reduction(reduction)

    def __call__(self, targets, outputs):
        logits = outputs
        y = targets
        valid = y != self.ignore_index
        y_safe = jnp.where(valid, y, 0)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, y_safe[..., None].astype(jnp.int32),
                                   axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        # torch CE(reduction='none') gives 0 at ignored positions; the repo's
        # Reduction("mean") then averages over ALL positions — but torch sets
        # ignored losses to 0 and divides by total count only under 'none' +
        # external mean. Match that: plain mean over every element.
        return self.reduction(nll)


class CTCLoss:
    """CTC over (y, y_len) targets and (logits, logits_len) outputs.

    ref: nnet/losses.py:292-334. reduction "mean"/"sum"/"default"; the
    assert_shorter runtime check is validated host-side by the data pipeline
    (a traced assert is not jit-compatible).
    """

    def __init__(self, blank=0, reduction="mean", zero_infinity=False,
                 assert_shorter=True):
        assert reduction in ("mean", "sum", "default")
        self.blank = blank
        self.reduction = reduction
        self.zero_infinity = zero_infinity
        self.assert_shorter = assert_shorter

    def __call__(self, targets, outputs):
        y, y_len = targets
        logits, logits_len = outputs
        return ctc_loss(logits, logits_len, y, y_len, blank=self.blank,
                        reduction=self.reduction, zero_infinity=self.zero_infinity)


loss_dict = {
    "SoftmaxCrossEntropy": SoftmaxCrossEntropy,
    "CTC": CTCLoss,
}
