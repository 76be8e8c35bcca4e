# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Long-sequence rel-pos attention bench: flash (Pallas fwd+bwd) vs the
XLA skew and factorized paths, per layer, fwd and train (fwd+bwd).

The 16 s-utterance training regime runs the 50 Hz audio stage at T ~ 800
(regular attention variant); this quantifies the flash win there.

Usage: python tools/bench_flash.py [--t 800 1600] [--batch 8] [--dim 180]
"""

import argparse
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
    ap.add_argument("--t", type=int, nargs="+", default=[800, 1600])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dim", type=int, default=180)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--windows", type=int, default=3)
    args = ap.parse_args()

    from avec_tpu.ops.attention import RelPos1dMultiHeadAttention
    from avec_tpu.ops.masks import padding_mask

    results = []
    for t in args.t:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(args.batch, t, args.dim)
                        .astype(np.float32)).astype(jnp.bfloat16)
        lengths = jnp.asarray(
            np.linspace(t // 2, t, args.batch).astype(np.int32))
        mask = padding_mask(lengths, t)
        w = jnp.asarray(rng.randn(*x.shape).astype(np.float32)
                        ).astype(jnp.bfloat16)

        row = {"t": t, "batch": args.batch, "dim": args.dim}
        for name, kwargs in [("skew", dict()),
                             ("factorized", dict(factorized=True)),
                             ("flash", dict(use_flash=True))]:
            att = RelPos1dMultiHeadAttention(
                dim_model=args.dim, num_heads=args.heads, **kwargs)
            variables = att.init({"params": jax.random.PRNGKey(0)}, x, mask)

            def fwd(p, x):
                return att.apply({"params": p}, x, mask,
                                 deterministic=False)

            def loss(p, x):
                o = fwd(p, x).astype(jnp.float32)
                return (o * w.astype(jnp.float32)).sum()

            jf = jax.jit(fwd)
            jg = jax.jit(jax.grad(loss))
            o = jf(variables["params"], x)
            sync_value(o)
            rate, _ = timed_windows(
                lambda _: jf(variables["params"], x), o,
                args.windows, args.steps, 1.0)
            row[f"{name}_fwd_ms"] = round(1000.0 / rate, 3)
            g = jg(variables["params"], x)
            sync_value(g)
            rate, _ = timed_windows(
                lambda _: jg(variables["params"], x), g,
                args.windows, args.steps, 1.0)
            row[f"{name}_train_ms"] = round(1000.0 / rate, 3)
        row["flash_vs_skew_train"] = round(
            row["skew_train_ms"] / row["flash_train_ms"], 2)
        row["flash_vs_factorized_train"] = round(
            row["factorized_train_ms"] / row["flash_train_ms"], 2)
        results.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
