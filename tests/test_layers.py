"""Golden tests for layer primitives vs torch (conv padding policies,
pooling, norms)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from avec_tpu.ops.layers import (
    BatchNorm,
    Conv,
    ConvTranspose,
    LayerNorm,
    avg_pool,
    conv_padding,
    max_pool,
)


def test_conv_padding_policies():
    # ref nnet/layers.py:127-155: same = ((k-1)//2, k//2), causal = (k-1, 0).
    assert conv_padding((15,), "same") == ((7, 7),)
    assert conv_padding((4,), "same") == ((1, 2),)
    assert conv_padding((4,), "same-left") == ((2, 1),)
    assert conv_padding((5,), "causal") == ((4, 0),)
    assert conv_padding((3, 3), "valid") == ((0, 0), (0, 0))
    assert conv_padding((3,), 1) == ((1, 1),)


def test_conv1d_matches_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 20, 4).astype(np.float32)
    conv = Conv(6, kernel_size=5, ndim=1, strides=2, padding="same")
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(conv.apply(variables, jnp.asarray(x)))

    w = np.asarray(variables["params"]["kernel"])  # (K, Cin, Cout)
    b = np.asarray(variables["params"]["bias"])
    xt = torch.tensor(x.transpose(0, 2, 1))  # (B, C, T)
    wt = torch.tensor(w.transpose(2, 1, 0))  # (Cout, Cin, K)
    yt = F.conv1d(F.pad(xt, (2, 2)), wt, torch.tensor(b), stride=2)
    want = yt.numpy().transpose(0, 2, 1)
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)
    # Length formula parity: out = (T-1)//2 + 1.
    assert ours.shape[1] == (20 - 1) // 2 + 1


def test_depthwise_conv_matches_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 16, 6).astype(np.float32)
    conv = Conv(6, kernel_size=15, ndim=1, strides=2, padding="same", groups=6)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(conv.apply(variables, jnp.asarray(x)))
    w = np.asarray(variables["params"]["kernel"])  # (K, 1, C)
    b = np.asarray(variables["params"]["bias"])
    xt = torch.tensor(x.transpose(0, 2, 1))
    wt = torch.tensor(w.transpose(2, 1, 0))  # (C, 1, K)
    yt = F.conv1d(F.pad(xt, (7, 7)), wt, torch.tensor(b), stride=2, groups=6)
    want = yt.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_max_pool_matches_torch():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 10, 12, 3).astype(np.float32)
    ours = np.asarray(max_pool(jnp.asarray(x), (3, 3), (2, 2), padding=1))
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    want = F.max_pool2d(xt, 3, 2, 1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, want, rtol=1e-6)


def test_max_pool3d_same_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 4, 11, 11, 2).astype(np.float32)
    ours = np.asarray(max_pool(jnp.asarray(x), (1, 3, 3), (1, 2, 2),
                               padding="same"))
    xt = torch.tensor(x.transpose(0, 4, 1, 2, 3))
    want = F.max_pool3d(xt, (1, 3, 3), (1, 2, 2), (0, 1, 1))
    want = want.numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(ours, want, rtol=1e-6)


def test_avg_pool_matches_torch():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 9, 4).astype(np.float32)
    ours = np.asarray(avg_pool(jnp.asarray(x), (3,), (3,)))
    xt = torch.tensor(x.transpose(0, 2, 1))
    want = F.avg_pool1d(xt, 3, 3).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, want, rtol=1e-5)


def test_pool_grads_inside_scan():
    """Regression: reduce_window has no grad under lax.scan; pooling must
    differentiate inside scan (our gradient accumulation)."""
    def step(x):
        def body(carry, _):
            g = jax.grad(lambda y: max_pool(y, (3,), (2,), "same")
                         .sum())(x + carry)
            return carry + g.mean(), None
        out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=2)
        return out

    val = jax.jit(step)(jnp.ones((1, 8, 2)))
    assert np.isfinite(float(val))


def test_pool_grads_through_scan():
    """Regression: reduce_window has no LINEARIZATION rule, so plain
    reduce_window pooling breaks when differentiating THROUGH a scan —
    exactly the conformer nn.scan'd blocks (patch-attention avg_pool, the
    strided-residual max_pool). The custom_vjp max_pool / view-based
    avg_pool must both survive grad-of-scan."""
    def loss(x):
        def body(carry, _):
            y = max_pool(carry, (1, 3, 3), (1, 2, 2), "same")
            z = avg_pool(carry, (1, 3, 1), (1, 3, 1))
            return carry * 1.0, (y.sum() + z.sum())
        _, ys = jax.lax.scan(body, x, None, length=2)
        return ys.sum()

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(2, 6, 8, 8, 3), jnp.float32)
    g = jax.jit(jax.grad(loss))(x)
    assert np.isfinite(np.asarray(g)).all()
    # Gradient value check vs the all-views reference formulation.
    def loss_ref(x):
        def body(carry, _):
            views = [carry[:, :, i::2][:, :, :4] for i in range(3)]
            pad = jnp.pad(carry, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)),
                          constant_values=-np.inf)
            out = None
            for dh in range(3):
                for dw in range(3):
                    v = pad[:, :, dh:dh + 8:2, dw:dw + 8:2]
                    out = v if out is None else jnp.maximum(out, v)
            z = (carry[:, :, 0::3][:, :, :2] + carry[:, :, 1::3][:, :, :2]
                 + carry[:, :, 2::3][:, :, :2]) / 3.0
            return carry * 1.0, (out.sum() + z.sum())
        _, ys = jax.lax.scan(body, x, None, length=2)
        return ys.sum()

    g_ref = jax.jit(jax.grad(loss_ref))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_layernorm_matches_torch():
    rng = np.random.RandomState(5)
    x = rng.randn(2, 7, 16).astype(np.float32)
    ln = LayerNorm(epsilon=1e-6)
    variables = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(ln.apply(variables, jnp.asarray(x)))
    want = F.layer_norm(torch.tensor(x), (16,), eps=1e-6).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_batchnorm_matches_torch_train_and_eval():
    rng = np.random.RandomState(6)
    x = rng.randn(4, 10, 8).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        use_running_average=False)
    ours, mut = bn.apply(variables, jnp.asarray(x), use_running_average=False,
                         mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm1d(8)  # over (B, C, L)
    xt = torch.tensor(x.transpose(0, 2, 1))
    want = tbn(xt).detach().numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(np.asarray(ours), want, rtol=1e-3, atol=1e-4)
    # Running stats: torch momentum 0.1 <-> linen momentum 0.9, unbiased var.
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               tbn.running_var.numpy(), rtol=1e-3, atol=1e-4)


def test_conv_transpose_matches_torch():
    rng = np.random.RandomState(7)
    x = rng.randn(1, 6, 3).astype(np.float32)
    ct = ConvTranspose(4, kernel_size=4, ndim=1, strides=2, padding=1)
    variables = ct.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(ct.apply(variables, jnp.asarray(x)))
    w = np.asarray(variables["params"]["kernel"])  # (K, Cin, Cout)
    b = np.asarray(variables["params"]["bias"])
    xt = torch.tensor(x.transpose(0, 2, 1))
    wt = torch.tensor(w.transpose(1, 2, 0))  # (Cin, Cout, K)
    yt = F.conv_transpose1d(xt, wt, torch.tensor(b), stride=2, padding=1)
    want = yt.numpy().transpose(0, 2, 1)
    assert ours.shape == want.shape
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


def test_polyphase_conv_matches_direct():
    """Conv(polyphase=True|"full") is a pure lowering: outputs and kernel
    gradients must match the direct conv exactly (fp32) for the stem shapes
    (3-D video stem k(5,7,7) s(1,2,2); 2-D audio stem k3 s2)."""
    from avec_tpu.ops.layers import Conv

    rng = np.random.RandomState(0)
    cases = [
        # (x shape, kernel, strides, ndim)
        ((2, 7, 20, 18, 1), (5, 7, 7), (1, 2, 2), 3),
        ((2, 21, 16, 1), (3, 3), (2, 2), 2),
        ((2, 16, 17, 3), (3, 5), (2, 2), 2),  # multi-channel, odd width
    ]
    for shape, ks, st, ndim in cases:
        x = jnp.asarray(rng.rand(*shape), jnp.float32)
        for mode in (True, "full"):
            ref = Conv(4, kernel_size=ks, ndim=ndim, strides=st,
                       padding="same", polyphase=False)
            opt = Conv(4, kernel_size=ks, ndim=ndim, strides=st,
                       padding="same", polyphase=mode)
            v = ref.init(jax.random.PRNGKey(0), x)
            y_ref = ref.apply(v, x)
            y_opt = opt.apply(v, x)
            np.testing.assert_allclose(np.asarray(y_opt), np.asarray(y_ref),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"{shape} {ks} {mode}")
            g_ref = jax.grad(lambda v_: ref.apply(v_, x).sum())(v)
            g_opt = jax.grad(lambda v_: opt.apply(v_, x).sum())(v)
            np.testing.assert_allclose(
                np.asarray(jax.tree.leaves(g_opt)[1]),
                np.asarray(jax.tree.leaves(g_ref)[1]),
                rtol=1e-4, atol=1e-4, err_msg=f"grad {shape} {ks} {mode}")
