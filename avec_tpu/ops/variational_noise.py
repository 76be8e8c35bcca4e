# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Variational ("synaptic") weight noise.

Behavioral parity target: /root/reference/nnet/layers.py:50-62,1063-1079
(`init_vn` / `sample_synaptic_noise` on Linear/LSTM/Embedding weights, with a
distributed broadcast of the sampled noise) and nnet/apply_fn.py:19-27 (the
model-wide appliers).

TPU-first: instead of mutating module weights and broadcasting noise across
ranks, noise is sampled functionally from a shared PRNG key (identical on
every replica by construction — the broadcast is free) and added to the
parameter pytree before the forward pass.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp


def make_vn_mask(params: Any, predicate: Optional[Callable] = None) -> Any:
    """Boolean pytree marking leaves that receive noise.

    Default: every 'kernel'/'embedding' leaf (Linear/LSTM/Embedding weights,
    matching the reference's per-layer vn flags).
    """
    def decide(path, leaf):
        name = getattr(path[-1], "key", str(path[-1]))
        if predicate is not None:
            return predicate(path, leaf)
        return name in ("kernel", "embedding")

    return jax.tree_util.tree_map_with_path(decide, params)


def sample_synaptic_noise(params: Any, rng: jax.Array, std: float,
                          mask: Optional[Any] = None) -> Any:
    """params + N(0, std^2) noise on masked leaves (shared across replicas
    since `rng` is replicated)."""
    if std == 0.0:
        return params
    if mask is None:
        mask = make_vn_mask(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(rng, len(leaves))
    mask_leaves = treedef.flatten_up_to(mask)

    noised = [
        leaf + std * jax.random.normal(k, leaf.shape, leaf.dtype)
        if m else leaf
        for leaf, m, k in zip(leaves, mask_leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, noised)


def init_vn(model, vn_std: float):
    """Enable variational noise on an engine Model (applied in train steps
    when model.vn_std > 0)."""
    model.vn_std = vn_std
    return model
