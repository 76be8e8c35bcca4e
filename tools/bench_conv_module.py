# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Standalone fused-vs-unfused ConvolutionModule microbench (train fwd+bwd).

Runs the stride-1 conformer conv module at the AV model's per-stage shapes
(B=16, 6 s operating point) on the available accelerator, fused Pallas
kernel (ops/pallas_conv_module.py) vs the unfused XLA path, and reports
per-call wall time plus max output/grad deviation. Mirrors
tools/bench_flash.py's methodology: jit both, warm up, value-fetch-sync
(bench.py sync_value rules), median of several windows.

Usage: python tools/bench_conv_module.py [--steps 50] [--windows 3]
"""

import argparse
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from avec_tpu.models.conformer import ConvolutionModule
from avec_tpu.ops.pallas_conv_module import fused_conv_module_3d

# (name, dim_model, dim_expand, B, T): AV flagship stage shapes at B=16/6 s.
SHAPES = [
    ("audio_s1", 180, 180, 16, 301),
    ("audio_s2/video_s1", 256, 256, 16, 151),
    ("audio_s3/av", 360, 360, 16, 76),
]
K = 15


def sync_value(out):
    leaf = jax.tree.leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim])


def timed(fn, args, steps, windows):
    rates = []
    out = fn(*args)
    sync_value(out)
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        sync_value(out)
        rates.append((time.perf_counter() - t0) / steps)
    rates.sort()
    return rates[len(rates) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)

    for name, d, e, b, t in SHAPES:
        mod = ConvolutionModule(dim_model=d, dim_expand=e, drop_rate=0.0,
                                kernel_size=K, batch_norm=True)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (b, t, d), jnp.float32).astype(dtype)
        cot = jax.random.normal(jax.random.PRNGKey(1), (b, t, e),
                                jnp.float32).astype(dtype)
        variables = mod.init(jax.random.PRNGKey(2), x, deterministic=True)
        params = variables["params"]

        def unfused_loss(params, x):
            y, _ = mod.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             x, deterministic=False, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(3)})
            return (y * cot).sum()

        def fused_loss(params, x):
            p = params
            y, _, _ = fused_conv_module_3d(
                x, p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"],
                p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
                p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
                p["BatchNorm_0"]["scale"], p["BatchNorm_0"]["bias"],
                p["Conv_2"]["kernel"], p["Conv_2"]["bias"],
                deterministic=False, interpret=False)
            return (y * cot).sum()

        g_un = jax.jit(jax.grad(unfused_loss, argnums=(0, 1)))
        g_fu = jax.jit(jax.grad(fused_loss, argnums=(0, 1)))

        gp_u, gx_u = g_un(params, x)
        gp_f, gx_f = g_fu(params, x)
        dev = max(float(jnp.abs(a.astype(jnp.float32)
                                - b2.astype(jnp.float32)).max())
                  for a, b2 in zip(jax.tree.leaves((gp_u, gx_u)),
                                   jax.tree.leaves((gp_f, gx_f))))
        scale = max(float(jnp.abs(a.astype(jnp.float32)).max())
                    for a in jax.tree.leaves((gp_u, gx_u)))

        t_un = timed(g_un, (params, x), args.steps, args.windows)
        t_fu = timed(g_fu, (params, x), args.steps, args.windows)
        print(f"{name:>20} d={d} T={t}: unfused {t_un * 1e3:7.3f} ms  "
              f"fused {t_fu * 1e3:7.3f} ms  speedup {t_un / t_fu:5.2f}x  "
              f"max|grad dev| {dev:.3e} (scale {scale:.1e})")


if __name__ == "__main__":
    main()
