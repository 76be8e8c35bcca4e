# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Optimizers: optax transforms with attached step schedulers.

Behavioral parity target: /root/reference/nnet/optimizers.py. The reference
wraps torch optimizers so that .step() pulls the LR from a Scheduler at the
incremented step (:71-75) and embeds model_step in the state dict (:77-85).
Here an Optimizer bundles an optax GradientTransformation with a Scheduler;
the jitted train step evaluates lr = scheduler(step + 1) in-graph (no
recompilation across steps).

torch semantics preserved:
  Adam: L2 weight decay folded into the gradient BEFORE moments
        (torch Adam weight_decay), eps inside sqrt denominator only.
  AdamW: decoupled decay scaled by lr, with the GPT decay/no-decay parameter
        split of get_decay_param_groups (:133-178) expressed as an optax mask.
"""

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from avec_tpu.train.schedulers import Scheduler, as_scheduler


class Optimizer:
    """optax transform + LR scheduler, applied as p -= lr * update."""

    def __init__(self, tx: optax.GradientTransformation, scheduler: Scheduler,
                 name: str = "optimizer"):
        self.tx = tx
        self.scheduler = scheduler
        self.name = name

    def init(self, params):
        return self.tx.init(params)

    def update(self, grads, opt_state, params, step):
        """step is the PRE-increment model step; lr = scheduler(step + 1)."""
        updates, opt_state = self.tx.update(grads, opt_state, params)
        lr = self.scheduler(step + 1)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        return updates, opt_state

    def learning_rate(self, step):
        return self.scheduler(step + 1)


def _decay_to_grad(weight_decay: float) -> optax.GradientTransformation:
    """torch-style L2: g += wd * p before the moment updates."""
    if weight_decay == 0.0:
        return optax.identity()
    return optax.add_decayed_weights(weight_decay)


def SGD(lr, momentum=0.0, dampening=0.0, weight_decay=0.0, nesterov=False,
        params=None):
    """ref: nnet/optimizers.py:27-59 (params arg accepted for API parity)."""
    chain = [_decay_to_grad(weight_decay)]
    if momentum:
        chain.append(optax.trace(decay=momentum, nesterov=nesterov))
    tx = optax.chain(*chain) if chain else optax.identity()
    return Optimizer(tx, as_scheduler(lr), name="SGD")


def Adam(lr=0.001, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
         params=None):
    """ref: nnet/optimizers.py:61-93. Conformer models use
    betas=(0.9, 0.98), eps=1e-9, weight_decay=1e-6 with a Noam schedule
    (nnet/models_zoo.py:54)."""
    tx = optax.chain(
        _decay_to_grad(weight_decay),
        optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps, eps_root=0.0),
    )
    return Optimizer(tx, as_scheduler(lr), name="Adam")


def AdamW(lr=0.001, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.01,
          decay_mask: Optional[Callable] = None, params=None):
    """ref: nnet/optimizers.py:95-127. Decoupled decay, optionally masked by
    the GPT decay/no-decay split."""
    chain = [optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps, eps_root=0.0)]
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay, mask=decay_mask))
    tx = optax.chain(*chain)
    return Optimizer(tx, as_scheduler(lr), name="AdamW")


def gpt_decay_mask(params) -> Any:
    """Decay/no-decay split (ref: nnet/optimizers.py:133-178).

    Decay: Linear/Dense kernels. No decay: biases, LayerNorm/BatchNorm
    scales, embeddings and positional tables.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def decide(path):
        names = [getattr(k, "key", str(k)) for k in path]
        leaf = names[-1]
        joined = "/".join(names)
        if leaf != "kernel":
            return False
        if "embedding" in joined or "pos_encoding" in joined:
            return False
        return True

    return jax.tree_util.tree_map_with_path(lambda p, _: decide(p), params)


def RMSprop(lr=0.01, alpha=0.99, eps=1e-8, weight_decay=0.0, momentum=0.0,
            params=None):
    """torch RMSprop semantics (ref registry nnet/optimizers.py:184-189)."""
    chain = [_decay_to_grad(weight_decay),
             optax.scale_by_rms(decay=alpha, eps=eps)]
    if momentum:
        chain.append(optax.trace(decay=momentum))
    return Optimizer(optax.chain(*chain), as_scheduler(lr), name="RMSprop")


optim_dict = {
    "SGD": SGD,
    "RMSprop": RMSprop,
    "Adam": Adam,
    "AdamW": AdamW,
}
