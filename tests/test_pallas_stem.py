"""Restructured video stem (FusedVideoStem) vs the 5-D composition.

Both implementations (pure-XLA 2-D path and the Pallas-kernel path) must
be numerically interchangeable with Conv(polyphase) + BatchNorm + ReLU +
max_pool — same params, same outputs, same gradients (up to the analytic
zero for the conv bias), same running-stat updates. FusedVideoStem
returns frames flattened (B*T, 22, 22, 64).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avec_tpu.models.encoders import FusedVideoStem
from avec_tpu.models.conformer import ConvNeuralNetwork
from avec_tpu.ops.layers import conv_padding, max_pool, _polyphase_fold


B, T, H = 2, 5, 88


def _x(seed=0, t=T):
    return jnp.asarray(np.random.RandomState(seed)
                       .randn(B, t, H, H, 1).astype(np.float32) * 0.5)


def _ref_stem():
    return ConvNeuralNetwork(
        dim_layers=64, kernel_size=(5, 7, 7), strides=(1, 2, 2),
        norm="BatchNorm3d", act_fun="ReLU", ndim=3, polyphase=True)


def _stem(pallas):
    return FusedVideoStem(use_pallas=pallas, interpret=True)


def _ref_apply(variables, x, training, mutable=False):
    stem = _ref_stem()
    out = stem.apply(variables, x, deterministic=not training,
                     mutable=["batch_stats"] if mutable else False)
    y, updates = out if mutable else (out, None)
    b, t, h, w, c = y.shape
    pooled = max_pool(y.reshape(b * t, h, w, c), (3, 3), (2, 2),
                      padding="same")
    return pooled, updates  # flattened (B*T, 22, 22, 64)


@pytest.mark.parametrize("pallas", [False, True])
def test_param_tree_matches_unfused(pallas):
    x = _x()
    ref_vars = _ref_stem().init({"params": jax.random.PRNGKey(0)}, x,
                                deterministic=True)
    fused_vars = _stem(pallas).init(
        {"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref_vars)
    fused_shapes = jax.tree.map(lambda a: a.shape, fused_vars)
    assert ref_shapes == fused_shapes, (ref_shapes, fused_shapes)


@pytest.mark.parametrize("pallas", [False, True])
def test_eval_forward_matches_unfused(pallas):
    x = _x(1)
    ref_vars = _ref_stem().init({"params": jax.random.PRNGKey(0)}, x,
                                deterministic=True)
    want, _ = _ref_apply(ref_vars, x, training=False)
    got = _stem(pallas).apply(ref_vars, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pallas", [False, True])
def test_train_forward_and_stats_match_unfused(pallas):
    x = _x(2)
    ref_vars = _ref_stem().init({"params": jax.random.PRNGKey(0)}, x,
                                deterministic=True)
    want, ref_updates = _ref_apply(ref_vars, x, training=True, mutable=True)
    got, fused_updates = _stem(pallas).apply(
        ref_vars, x, deterministic=False, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    for key in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(fused_updates["batch_stats"]["BatchNorm_0"][key]),
            np.asarray(ref_updates["batch_stats"]["BatchNorm_0"][key]),
            rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("pallas", [False, True])
def test_train_grads_match_unfused(pallas):
    x = _x(3)
    ref_vars = _ref_stem().init({"params": jax.random.PRNGKey(0)}, x,
                                deterministic=True)
    params = ref_vars["params"]
    bstats = {"batch_stats": ref_vars["batch_stats"]}

    def loss_ref(p):
        out, _ = _ref_apply({"params": p, **bstats}, x, training=True,
                            mutable=True)
        return (out.astype(jnp.float32) * _w).sum()

    def loss_fused(p):
        out, _ = _stem(pallas).apply(
            {"params": p, **bstats}, x, deterministic=False,
            mutable=["batch_stats"])
        return (out.astype(jnp.float32) * _w).sum()

    rng = np.random.RandomState(7)
    _w = jnp.asarray(rng.randn(B * T, 22, 22, 64).astype(np.float32))
    g_ref = jax.grad(loss_ref)(params)
    g_fused = jax.grad(loss_fused)(params)

    np.testing.assert_allclose(
        np.asarray(g_fused["conv_0"]["kernel"]),
        np.asarray(g_ref["conv_0"]["kernel"]), rtol=5e-4, atol=5e-4)
    for key in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(g_fused["BatchNorm_0"][key]),
            np.asarray(g_ref["BatchNorm_0"][key]), rtol=5e-4, atol=5e-4)
    # Conv bias gradient: analytically zero through training-mode BN; the
    # XLA path computes it numerically (reduction roundoff ~1e-3 over the
    # ~2e4-element per-channel sums).
    np.testing.assert_allclose(np.asarray(g_ref["conv_0"]["bias"]), 0.0,
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(g_fused["conv_0"]["bias"]), 0.0,
                               atol=1e-12)


@pytest.mark.parametrize("pallas", [False, True])
def test_block_padding_t_not_multiple(pallas):
    """T=3 pads to Tp=4 internally on the pallas path; outputs and stats
    must still be exact (masking correctness)."""
    x = _x(4, t=3)
    ref_vars = _ref_stem().init({"params": jax.random.PRNGKey(1)}, x,
                                deterministic=True)
    want, ref_updates = _ref_apply(ref_vars, x, training=True, mutable=True)
    got, fused_updates = _stem(pallas).apply(
        ref_vars, x, deterministic=False, mutable=["batch_stats"])
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(fused_updates["batch_stats"]["BatchNorm_0"]["mean"]),
        np.asarray(ref_updates["batch_stats"]["BatchNorm_0"]["mean"]),
        rtol=2e-5, atol=2e-5)
