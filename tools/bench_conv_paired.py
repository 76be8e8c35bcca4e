"""Measure the paired-output-column reformulation of N=64 3x3 convs.

Problem: the video ResNet's stage-0 convs (22x22 spatial, 64 -> 64
channels over B*T=2416 merged frames, reference
/root/reference/nnet/networks.py:359-406) fill only 64 of the MXU's 128
output lanes — profile r4d attributes ~35 ms/step to the trunk with
stage 0 at a ~53% lane ceiling (ROUND_NOTES.md round-4 budget).

Idea: compute TWO horizontally adjacent output columns per MXU pass.
A 3x3/stride-1 conv with kernel K (3,3,64,64) is reformulated as a
(3,4)/stride-(1,2) conv with 128 output channels:

    K2[di, dj, c, b*64 + n] = K[di, dj - b, c, n]   (zero outside)

so output channel block b in {0,1} holds the conv at column offset b.
The (H, W/2, 128) result is un-paired back to (H, W, 64) with a
reshape-transpose that XLA fuses into the following elementwise chain.
FLOPs grow 4/3 (kernel width 3 -> 4) but lane use doubles: net ~1.5x
theoretical on the MXU. K2 is BUILT from K inside the traced function,
so autodiff routes wgrad back through the padding/stack (the zero taps
get zero grads) — no custom vjp needed.

Run standalone on the v5e (compiles are small):
    python tools/bench_conv_paired.py
"""

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def direct_conv(x, k):
    dn = lax.conv_dimension_numbers(x.shape, k.shape, ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME", dimension_numbers=dn,
        preferred_element_type=x.dtype)


def paired_conv(x, k):
    """3x3 s=1 SAME conv via a (3,4) s=(1,2) conv with doubled out-lanes."""
    kh, kw, cin, cout = k.shape
    assert (kh, kw) == (3, 3)
    # Column block b computes output column 2j+b. SAME padding for the
    # direct conv pads W by (1, 1); output column 2j+b reads padded input
    # columns [2j+b, 2j+b+2], i.e. kernel tap dj lands on padded column
    # 2j + (b + dj). So K2 tap dj' = b + dj.
    k2 = jnp.zeros((kh, kw + 1, cin, 2 * cout), k.dtype)
    k2 = k2.at[:, 0:3, :, :cout].set(k)
    k2 = k2.at[:, 1:4, :, cout:].set(k)
    b, h, w, _ = x.shape
    assert w % 2 == 0
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    dn = lax.conv_dimension_numbers(xp.shape, k2.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y2 = lax.conv_general_dilated(
        xp, k2, window_strides=(1, 2), padding="VALID",
        dimension_numbers=dn, preferred_element_type=x.dtype)
    # (B, H, W/2, 2*C) -> (B, H, W, C): un-pairing is a pure reshape
    # (W index = 2j + b with the block index b minor) — bitcast, no copy.
    return y2.reshape(b, h, w, cout)


def main():
    B, H, W, C = 2416, 22, 22, 64
    dtype = jnp.bfloat16
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), dtype)
    k = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, dtype)
    g = jnp.asarray(rng.randn(B, H, W, C), dtype)

    def loss(fn, x, k, g):
        return (fn(x, k) * g).sum(dtype=jnp.float32)

    results = {}
    for name, fn in [("direct", direct_conv), ("paired", paired_conv)]:
        fwd = jax.jit(fn)
        bwd = jax.jit(jax.grad(functools.partial(loss, fn), argnums=(0, 1)))
        y = fwd(x, k)
        dx, dk = bwd(x, k, g)
        jax.block_until_ready((y, dx, dk))
        for label, f, args in [("fwd", fwd, (x, k)), ("bwd", bwd, (x, k, g))]:
            # Value-fetch sync (see bench.py sync_value rationale).
            out = f(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[0, 0]
            t0 = time.perf_counter()
            n = 30
            for _ in range(n):
                out = f(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[0, 0]
            dt = (time.perf_counter() - t0) / n
            results[f"{name}_{label}"] = dt * 1e3
        results[f"{name}_y"] = np.asarray(y, np.float32)
        results[f"{name}_dx"] = np.asarray(dx, np.float32)
        results[f"{name}_dk"] = np.asarray(dk, np.float32)

    for pair in ["y", "dx", "dk"]:
        a, b = results[f"direct_{pair}"], results[f"paired_{pair}"]
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        print(f"max rel err {pair}: {err:.2e}")
        assert err < 2e-2, f"{pair} mismatch"

    f_d, f_p = results["direct_fwd"], results["paired_fwd"]
    b_d, b_p = results["direct_bwd"], results["paired_bwd"]
    print(f"fwd  direct {f_d:.3f} ms   paired {f_p:.3f} ms   "
          f"speedup {f_d / f_p:.2f}x")
    print(f"bwd  direct {b_d:.3f} ms   paired {b_p:.3f} ms   "
          f"speedup {b_d / b_p:.2f}x")


if __name__ == "__main__":
    main()
