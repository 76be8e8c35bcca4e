# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Standalone fused-vs-unfused AttentionModule microbench (train fwd+bwd).

Same methodology as tools/bench_conv_module.py: the pre-norm rel-pos
attention module at the AV model's per-stage shapes, fused Pallas kernels
(ops/pallas_attention_module.py) vs the unfused factorized-XLA path, with
value-fetch-synchronized timing and a max-grad-deviation check.

Usage: python tools/bench_att_module.py [--steps 30] [--windows 3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from avec_tpu.models.conformer import AttentionModule
from avec_tpu.ops.masks import make_mask

SHAPES = [
    ("audio_s1", 180, 4, 16, 301),
    ("audio_s2/video_s1", 256, 4, 16, 151),
    ("audio_s3/av", 360, 4, 16, 76),
]


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
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)
    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)

    for name, d, h, b, t in SHAPES:
        att = {"class": "RelPos1dMultiHeadAttention",
               "params": {"num_heads": h, "attn_drop_rate": 0.0,
                          "num_pos_embeddings": 10000,
                          "weight_init": "default", "bias_init": "default"}}
        mod = AttentionModule(dim_model=d, att_params=att, drop_rate=0.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d),
                              jnp.float32).astype(dtype)
        cot = jax.random.normal(jax.random.PRNGKey(1), (b, t, d),
                                jnp.float32).astype(dtype)
        lengths = jnp.full((b,), t, jnp.int32).at[1].set(t - 7)
        mask = make_mask(t, lengths)
        variables = mod.init(jax.random.PRNGKey(2), x)

        def loss(params, x, fused):
            if fused:
                os.environ["AVEC_TPU_FUSED_ATT"] = "1"
            try:
                y = mod.apply({"params": params}, x, mask=mask,
                              deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(3)})
            finally:
                os.environ.pop("AVEC_TPU_FUSED_ATT", None)
            return (y * cot).sum()

        g_un = jax.jit(jax.grad(lambda p, x: loss(p, x, False),
                                argnums=(0, 1)))
        g_fu = jax.jit(jax.grad(lambda p, x: loss(p, x, True),
                                argnums=(0, 1)))

        gu = g_un(variables["params"], x)
        gf = g_fu(variables["params"], x)
        dev = max(float(jnp.abs(a.astype(jnp.float32)
                                - b2.astype(jnp.float32)).max())
                  for a, b2 in zip(jax.tree.leaves(gu), jax.tree.leaves(gf)))
        scale = max(float(jnp.abs(a.astype(jnp.float32)).max())
                    for a in jax.tree.leaves(gu))

        t_un = timed(g_un, (variables["params"], x), args.steps, args.windows)
        t_fu = timed(g_fu, (variables["params"], x), args.steps, args.windows)
        print(f"{name:>20} d={d} T={t}: unfused {t_un * 1e3:7.3f} ms  "
              f"fused {t_fu * 1e3:7.3f} ms  speedup {t_un / t_fu:5.2f}x  "
              f"max|grad dev| {dev:.3e} (scale {scale:.1e})")


if __name__ == "__main__":
    main()
