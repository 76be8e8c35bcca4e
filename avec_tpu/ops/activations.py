# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Activation functions.

Behavioral parity target: /root/reference/nnet/activations.py:39-81
(Swish = x * sigmoid(x), GLU split on last axis, TanhGLU, plus the standard
registry entries). Implemented as pure jax functions; the registry maps the
reference's string names onto callables usable inside flax modules.
"""

import jax
import jax.numpy as jnp

# NOTE (round 4, measured): wrapping the gated activations in
# jax.checkpoint(nothing_saveable) to drop the sigmoid/tanh backward
# residuals was tried and REGRESSED the AV train step (194.5 -> 185.4
# utt/s/chip on v5e, B=16): the conformer buckets were flat (XLA already
# fuses these into adjacent matmul epilogues; the "saved residual" never
# hits HBM) and the extra checkpoint boundaries broke conv+BN backward
# fusions elsewhere. Keep these as plain functions.


def identity(x):
    return x


def swish(x):
    """Swish / SiLU: x * sigmoid(x) (ref: nnet/activations.py:39-45)."""
    return x * jax.nn.sigmoid(x)


def glu(x, axis=-1):
    """Gated Linear Unit: split in half on `axis`, a * sigmoid(b).

    (ref: nnet/activations.py:47-55, torch.nn.GLU semantics)
    """
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


def tanh_glu(x, axis=-1):
    """Tanh-gated linear unit (ref: nnet/activations.py:57-65)."""
    a, b = jnp.split(x, 2, axis=axis)
    return jnp.tanh(a) * jax.nn.sigmoid(b)


def gelu(x):
    # torch default GELU is the exact erf form.
    return jax.nn.gelu(x, approximate=False)


act_dict = {
    "Identity": identity,
    "ReLU": jax.nn.relu,
    "ReLU6": lambda x: jnp.minimum(jax.nn.relu(x), 6.0),
    "LeakyReLU": jax.nn.leaky_relu,
    "GELU": gelu,
    "Swish": swish,
    "SiLU": swish,
    "Sigmoid": jax.nn.sigmoid,
    "Softmax": jax.nn.softmax,
    "Tanh": jnp.tanh,
    "GLU": glu,
    "TanhGLU": tanh_glu,
}


def get_act(act_fun):
    """Resolve an activation spec (name, {'class':..,'params':..} or callable)."""
    if callable(act_fun):
        return act_fun
    if isinstance(act_fun, dict):
        fn = act_dict[act_fun["class"]]
        params = act_fun.get("params", {})
        if params:
            import functools

            return functools.partial(fn, **params)
        return fn
    return act_dict[act_fun]
