# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Weight initializer registry.

Behavioral parity target: /root/reference/nnet/initializations.py:24-92.
The reference wraps torch initializers; we express the same distributions as
flax/jax initializers. Distribution semantics (matching torch):

  scaled_uniform  U(-b, b),  b = sqrt(1/fan_in)   (torch kaiming_uniform a=sqrt(5))
  scaled_normal   N(0, 1/fan_in)                   (note: ref maps it to a
                  kaiming_uniform due to an upstream bug; we implement the
                  documented distribution)
  lecun_uniform   U(-b, b),  b = sqrt(3/fan_in)
  lecun_normal    N(0, 1/fan_in)
  he_uniform      U(-b, b),  b = sqrt(6/fan_in)
  he_normal       N(0, 2/fan_in)
  xavier_uniform  U(-b, b),  b = sqrt(6/(fan_in+fan_out))
  xavier_normal   N(0, 2/(fan_in+fan_out))
  normal_02       N(0, 0.02^2)                     (GPT init)
  default         torch Linear/Conv default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))

flax initializers receive (key, shape, dtype). fan_in / fan_out are computed
with flax's convention: for conv kernels (H, W, Cin, Cout) the receptive field
multiplies into both fans, matching torch.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.nn import initializers as jinit


def _compute_fans(shape):
    """fan_in/fan_out following torch's convention for linear/conv kernels.

    flax kernels are (..spatial.., in, out); torch computes
    fan_in = in * prod(spatial), fan_out = out * prod(spatial).
    """
    if len(shape) < 1:
        return 1, 1
    if len(shape) == 1:
        return shape[0], shape[0]
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = shape[-2] * receptive
    fan_out = shape[-1] * receptive
    return fan_in, fan_out


def _uniform_bound(bound_fn):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _compute_fans(shape)
        b = bound_fn(fan_in, fan_out)
        return jax.random.uniform(key, shape, dtype, minval=-b, maxval=b)

    return init


def _normal_std(std_fn):
    def init(key, shape, dtype=jnp.float32):
        fan_in, fan_out = _compute_fans(shape)
        std = std_fn(fan_in, fan_out)
        return std * jax.random.normal(key, shape, dtype)

    return init


def constant_init(value):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


zeros_init = jinit.zeros
ones_init = jinit.ones

scaled_uniform = _uniform_bound(lambda fi, fo: float(np.sqrt(1.0 / fi)))
scaled_normal = _normal_std(lambda fi, fo: float(np.sqrt(1.0 / fi)))
lecun_uniform = _uniform_bound(lambda fi, fo: float(np.sqrt(3.0 / fi)))
lecun_normal = _normal_std(lambda fi, fo: float(np.sqrt(1.0 / fi)))
he_uniform = _uniform_bound(lambda fi, fo: float(np.sqrt(6.0 / fi)))
he_normal = _normal_std(lambda fi, fo: float(np.sqrt(2.0 / fi)))
xavier_uniform = _uniform_bound(lambda fi, fo: float(np.sqrt(6.0 / (fi + fo))))
xavier_normal = _normal_std(lambda fi, fo: float(np.sqrt(2.0 / (fi + fo))))
normal_02 = _normal_std(lambda fi, fo: 0.02)

# torch nn.Linear / nn.ConvNd default weight + bias init.
torch_default = _uniform_bound(lambda fi, fo: float(1.0 / np.sqrt(fi)))


def torch_default_bias(fan_in):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    b = float(1.0 / np.sqrt(fan_in)) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-b, maxval=b)

    return init


init_dict = {
    "uniform": _uniform_bound(lambda fi, fo: 1.0),
    "normal": _normal_std(lambda fi, fo: 1.0),
    "ones": ones_init,
    "zeros": zeros_init,
    "scaled_uniform": scaled_uniform,
    "scaled_normal": scaled_normal,
    "lecun_uniform": lecun_uniform,
    "lecun_normal": lecun_normal,
    "he_uniform": he_uniform,
    "he_normal": he_normal,
    "xavier_uniform": xavier_uniform,
    "xavier_normal": xavier_normal,
    "normal_02": normal_02,
    "default": torch_default,
}


def get_init(name_or_fn, default="default"):
    if name_or_fn is None:
        name_or_fn = default
    if callable(name_or_fn):
        return name_or_fn
    return init_dict[name_or_fn]
