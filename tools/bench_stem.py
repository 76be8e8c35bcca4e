# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Microbench: fused Pallas video stem vs the XLA polyphase composition.

Times the full stem block (conv+BN+ReLU+pool) forward AND train-step
(fwd+bwd+param-grads) at the AV bench operating point (B=16, T=151 frames
of 88x88). Honest timing: value-fetch synchronization (see bench.py).

Usage: python tools/bench_stem.py [--batch 16] [--frames 152]
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/tmp/avec_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from bench import sync_value, timed_windows  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=151)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    from avec_tpu.models.conformer import ConvNeuralNetwork
    from avec_tpu.models.encoders import FusedVideoStem
    from avec_tpu.ops.layers import max_pool

    def _ref_stem():
        return ConvNeuralNetwork(
            dim_layers=64, kernel_size=(5, 7, 7), strides=(1, 2, 2),
            norm="BatchNorm3d", act_fun="ReLU", ndim=3, polyphase=True)

    def _ref_apply(variables, x, training, mutable=False):
        out = _ref_stem().apply(
            variables, x, deterministic=not training,
            mutable=["batch_stats"] if mutable else False)
        y, updates = out if mutable else (out, None)
        b, t, h, wd, c = y.shape
        pooled = max_pool(y.reshape(b * t, h, wd, c), (3, 3), (2, 2),
                          padding="same").reshape(b, t, h // 2, wd // 2, c)
        return pooled, updates

    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.rand(args.batch, args.frames, 88, 88, 1)
                    .astype(np.float32)).astype(dtype)
    ref_vars = _ref_stem().init({"params": jax.random.PRNGKey(0)},
                                x, deterministic=True)
    w = jnp.asarray(rng.randn(args.batch, args.frames, 22, 22, 64)
                    .astype(np.float32)).astype(dtype)

    fused = FusedVideoStem()

    def loss_ref(p, bs):
        out, _ = _ref_apply({"params": p, "batch_stats": bs}, x,
                            training=True, mutable=True)
        return (out.astype(jnp.float32) * w.astype(jnp.float32)).sum()

    def loss_fused(p, bs):
        out, _ = fused.apply({"params": p, "batch_stats": bs}, x,
                             deterministic=False, mutable=["batch_stats"])
        return (out.astype(jnp.float32) * w.astype(jnp.float32)).sum()

    results = {}
    for name, loss in [("xla", loss_ref), ("fused", loss_fused)]:
        step = jax.jit(jax.grad(loss))
        fwd = jax.jit(loss)
        p, bs = ref_vars["params"], ref_vars["batch_stats"]
        g = step(p, bs)
        sync_value(g)
        rate, _ = timed_windows(lambda _: step(p, bs), g, args.windows,
                                args.steps, 1.0)
        results[f"{name}_train_ms"] = round(1000.0 / rate, 3)
        o = fwd(p, bs)
        sync_value(o)
        rate, _ = timed_windows(lambda _: fwd(p, bs), o, args.windows,
                                args.steps, 1.0)
        results[f"{name}_fwd_ms"] = round(1000.0 / rate, 3)

    results["train_speedup"] = round(
        results["xla_train_ms"] / results["fused_train_ms"], 2)
    results["fwd_speedup"] = round(
        results["xla_fwd_ms"] / results["fused_fwd_ms"], 2)
    results["batch"] = args.batch
    results["frames"] = args.frames
    print(json.dumps(results))


if __name__ == "__main__":
    main()
