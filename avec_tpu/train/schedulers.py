# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Step-indexed value schedules.

Behavioral parity target: /root/reference/nnet/schedulers.py:24-192.
Schedules are used for learning rates AND loss weights (the engine evaluates
loss-weight schedules per step, nnet/model.py:100-124,287). Unlike the
reference (stateful nn.Modules), these are stateless callables `f(step)`
that accept Python ints or jnp arrays, so they can run inside a jitted train
step and inside optax via `optax.inject_hyperparams`-free schedule functions.

Step convention: the reference increments its step BEFORE reading the value
(Scheduler.step, nnet/schedulers.py:32-34), so the first optimizer update uses
step=1. Callers here must pass that already-incremented step.
"""

import math

import jax.numpy as jnp


def _is_traced(step):
    return isinstance(step, jnp.ndarray)


class Scheduler:
    """Base class; subclasses implement __call__(step) -> value."""

    def __call__(self, step):
        raise NotImplementedError


class ConstantScheduler(Scheduler):
    """ref: nnet/schedulers.py:42-51."""

    def __init__(self, val):
        self.val = val

    def __call__(self, step):
        if _is_traced(step):
            return jnp.full((), self.val, dtype=jnp.float32)
        return self.val


class ConstantDecayScheduler(Scheduler):
    """Piecewise-constant by decay steps (ref: nnet/schedulers.py:53-72).

    values has size n+1, decay_steps size n; value i+1 applies once
    step > decay_steps[i].
    """

    def __init__(self, values, decay_steps):
        self.values = list(values)
        self.decay_steps = list(decay_steps)

    def __call__(self, step):
        if _is_traced(step):
            val = jnp.full((), self.values[0], dtype=jnp.float32)
            for i, start in enumerate(self.decay_steps):
                val = jnp.where(step > start, self.values[i + 1], val)
            return val
        val = self.values[0]
        for i, start in enumerate(self.decay_steps):
            if step > start:
                val = self.values[i + 1]
            else:
                break
        return val


class WarmupConstantDecayScheduler(Scheduler):
    """Linear warmup into piecewise-constant decay (ref: :74-98)."""

    def __init__(self, warmup_steps, values, decay_steps):
        self.warmup_steps = warmup_steps
        self.values = list(values)
        self.decay_steps = list(decay_steps)

    def __call__(self, step):
        decay = ConstantDecayScheduler(self.values, self.decay_steps)(step)
        warm = step / self.warmup_steps * self.values[0]
        if _is_traced(step):
            return jnp.where(step <= self.warmup_steps, warm, decay)
        return warm if step <= self.warmup_steps else decay


class LinearDecayScheduler(Scheduler):
    """Linear value_start -> value_end over decay_steps (ref: :100-118)."""

    def __init__(self, value_start, value_end, decay_steps):
        self.value_start = value_start
        self.value_end = value_end
        self.decay_steps = decay_steps

    def __call__(self, step):
        lin = self.value_start - step * (self.value_start - self.value_end) / self.decay_steps
        if _is_traced(step):
            return jnp.where(step >= self.decay_steps, self.value_end, lin)
        return self.value_end if step >= self.decay_steps else lin


class NoamDecayScheduler(Scheduler):
    """Noam: factor * dim^-0.5 * min(step * warmup^-1.5, step^-0.5).

    ref: nnet/schedulers.py:120-137. All Conformer models use
    warmup_steps=10000, dim_decay=360, val_factor=2
    (nnet/models_zoo.py:53,88,138,173).
    """

    def __init__(self, warmup_steps, dim_decay, val_factor):
        self.warmup_steps = warmup_steps
        self.dim_decay = dim_decay
        self.val_factor = val_factor

    def __call__(self, step):
        scale = self.val_factor * self.dim_decay ** -0.5
        if _is_traced(step):
            s = jnp.maximum(step.astype(jnp.float32), 1e-9)
            return scale * jnp.minimum(s * self.warmup_steps ** -1.5, s ** -0.5)
        s = max(float(step), 1e-9)
        return scale * min(s * self.warmup_steps ** -1.5, s ** -0.5)


class ExpDecayScheduler(Scheduler):
    """Warmup then exponential decay (ref: :139-157)."""

    def __init__(self, warmup_steps, val_max, alpha, end_step):
        self.warmup_steps = warmup_steps
        self.val_max = val_max
        self.alpha = alpha
        self.end_step = end_step

    def __call__(self, step):
        warm = step / self.warmup_steps * self.val_max
        frac = (step - self.warmup_steps) / (self.end_step - self.warmup_steps)
        if _is_traced(step):
            decay = self.val_max * jnp.power(self.alpha, frac)
            return jnp.minimum(warm, decay)
        decay = self.val_max * self.alpha ** frac
        return min(warm, decay)


class CosineAnnealingScheduler(Scheduler):
    """Warmup + cosine annealing to val_min (ref: :159-180).

    GPT configs: warmup 750, end 520000 (nnet/models_zoo.py:280-282).
    """

    def __init__(self, warmup_steps, val_max, val_min, end_step):
        self.warmup_steps = warmup_steps
        self.val_max = val_max
        self.val_min = val_min
        self.end_step = end_step

    def __call__(self, step):
        if _is_traced(step):
            warm = step / self.warmup_steps * self.val_max
            frac = (step - self.warmup_steps) / (self.end_step - self.warmup_steps)
            cos = (self.val_max - self.val_min) * 0.5 * (1 + jnp.cos(jnp.pi * frac)) + self.val_min
            val = jnp.where(step <= self.warmup_steps, warm, cos)
            return jnp.where(step > self.end_step, self.val_min, val)
        if step <= self.warmup_steps:
            return step / self.warmup_steps * self.val_max
        if step <= self.end_step:
            frac = (step - self.warmup_steps) / (self.end_step - self.warmup_steps)
            return (self.val_max - self.val_min) * 0.5 * (1 + math.cos(math.pi * frac)) + self.val_min
        return self.val_min


def as_scheduler(value):
    """Wrap raw numbers in ConstantScheduler (ref: nnet/model.py:100-124)."""
    if isinstance(value, Scheduler):
        return value
    return ConstantScheduler(float(value))


scheduler_dict = {
    "Constant": ConstantScheduler,
    "ConstantDecay": ConstantDecayScheduler,
    "WarmupConstantDecay": WarmupConstantDecayScheduler,
    "LinearDecay": LinearDecayScheduler,
    "NoamDecay": NoamDecayScheduler,
    "ExpDecay": ExpDecayScheduler,
    "CosineAnnealing": CosineAnnealingScheduler,
}
