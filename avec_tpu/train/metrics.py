# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Metrics.

Behavioral parity target: /root/reference/nnet/metrics.py. Tensor metrics
(accuracy family) are jax-traceable; WordErrorRate runs host-side on decoded
strings (it consumes decoder outputs, as in the reference engine's
forward_model, nnet/model.py:290-324).
"""

import jax.numpy as jnp

from avec_tpu.utils.wer import wer


class Mean:
    """ref: nnet/metrics.py:27-38."""

    name = "mean"
    on_host = False

    def __call__(self, y_true, y_pred):
        return y_pred.mean()


class CategoricalAccuracy:
    """Masked accuracy *100 with ignore_index (ref: nnet/metrics.py:40-69)."""

    on_host = False

    def __init__(self, ignore_index=-1, dim_argmax=-1, name="acc"):
        self.ignore_index = ignore_index
        self.dim_argmax = dim_argmax
        self.name = name

    def __call__(self, y_true, y_pred):
        if self.dim_argmax is not None:
            y_pred = y_pred.argmax(axis=self.dim_argmax)
        mask = jnp.where(y_true == self.ignore_index, 0.0, 1.0)
        n = jnp.count_nonzero(mask)
        acc = jnp.where(y_true == y_pred, 1.0, 0.0) * mask
        return 100.0 * acc.sum() / jnp.maximum(n, 1)


class CategoricalAccuracyTopK:
    """Top-k accuracy *100 (ref: nnet/metrics.py:71-99)."""

    on_host = False

    def __init__(self, ignore_index=-1, topk=5, name=None):
        self.ignore_index = ignore_index
        self.topk = topk
        self.name = name if name is not None else f"topk{topk}"

    def __call__(self, y_true, y_pred):
        import jax

        mask = jnp.where(y_true == self.ignore_index, 0.0, 1.0)
        n = jnp.count_nonzero(mask)
        _, indices = jax.lax.top_k(y_pred, self.topk)
        hit = (indices == y_true[..., None]).any(axis=-1).astype(jnp.float32)
        hit = hit * mask
        return 100.0 * hit.sum() / jnp.maximum(n, 1)


class WordErrorRate:
    """Corpus WER *100 over decoded strings (ref: nnet/metrics.py:101-110).

    Host-side: consumes lists of strings produced by a decoder.
    """

    on_host = True

    def __init__(self, name="wer"):
        self.name = name

    def __call__(self, targets, outputs):
        return 100.0 * wer(targets, outputs, do_standardize=True)


metric_dict = {
    "CategoricalAccuracy": CategoricalAccuracy,
    "WordErrorRate": WordErrorRate,
}
