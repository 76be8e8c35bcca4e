"""Fused conv-module Pallas kernels (ops/pallas_conv_module.py) vs the
unfused ConvolutionModule.

Runs in interpret mode on the CPU test mesh. Covers: train-mode forward
exactness (batch-stat BN) incl. the returned batch mean/var, full gradient
exactness vs autodiff of the unfused path (incl. the analytically-zero
depthwise bias grad), causal padding, dropout fwd/bwd mask consistency
(finite differences), module-level env-flag routing with an unchanged
variable tree and identical running-stat updates, and the shard_map DP
wrapper's global-BN semantics on the 8-device mesh.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avec_tpu.models.conformer import ConvolutionModule
from avec_tpu.ops.pallas_conv_module import fused_conv_module_3d


def _params(key, d, e, k, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    u = lambda kk, shape, s: (jax.random.uniform(kk, shape, jnp.float32,
                                                 -s, s)).astype(dtype)
    return dict(
        ln_scale=1.0 + 0.1 * jax.random.normal(ks[0], (d,)),
        ln_bias=0.1 * jax.random.normal(ks[1], (d,)),
        pw1_k=u(ks[2], (1, d, 2 * e), d ** -0.5),
        pw1_b=u(ks[3], (2 * e,), d ** -0.5),
        dw_k=u(ks[4], (k, 1, e), k ** -0.5),
        dw_b=u(ks[5], (e,), k ** -0.5),
        bn_scale=1.0 + 0.1 * jax.random.normal(ks[6], (e,)),
        bn_bias=0.1 * jax.random.normal(ks[7], (e,)),
        pw2_k=u(ks[2], (1, e, e), e ** -0.5),
        pw2_b=u(ks[3], (e,), e ** -0.5),
    )


def _unfused_tree(p):
    return {
        "params": {
            "LayerNorm_0": {"scale": p["ln_scale"], "bias": p["ln_bias"]},
            "Conv_0": {"kernel": p["pw1_k"], "bias": p["pw1_b"]},
            "Conv_1": {"kernel": p["dw_k"], "bias": p["dw_b"]},
            "BatchNorm_0": {"scale": p["bn_scale"], "bias": p["bn_bias"]},
            "Conv_2": {"kernel": p["pw2_k"], "bias": p["pw2_b"]},
        },
        "batch_stats": {"BatchNorm_0": {
            "mean": jnp.zeros((p["bn_scale"].shape[0],), jnp.float32),
            "var": jnp.ones((p["bn_scale"].shape[0],), jnp.float32),
        }},
    }


def _fused_call(x, p, padding="same", **kw):
    return fused_conv_module_3d(
        x, p["ln_scale"], p["ln_bias"], p["pw1_k"], p["pw1_b"],
        p["dw_k"], p["dw_b"], p["bn_scale"], p["bn_bias"],
        p["pw2_k"], p["pw2_b"], padding=padding, interpret=True, **kw)


@pytest.mark.parametrize("padding", ["same", "causal"])
@pytest.mark.parametrize("d,e,k,bt", [(64, 64, 15, (3, 40)),
                                      (48, 96, 7, (2, 33))])
def test_forward_matches_unfused_train_mode(padding, d, e, k, bt):
    b, t = bt
    p = _params(jax.random.PRNGKey(0), d, e, k)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, d), jnp.float32)
    mod = ConvolutionModule(dim_model=d, dim_expand=e, drop_rate=0.0,
                            kernel_size=k, padding=padding, batch_norm=True)
    tree = _unfused_tree(p)
    ref, mut = mod.apply(tree, x, deterministic=False,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(2)})
    got, mean, var = _fused_call(x, p, padding=padding,
                                 deterministic=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)
    # Returned batch stats must reproduce the unfused running update:
    # new_running = 0.9 * init + 0.1 * (mean | unbiased var).
    n = b * t
    upd = mut["batch_stats"]["BatchNorm_0"]
    np.testing.assert_allclose(np.asarray(upd["mean"]),
                               0.1 * np.asarray(mean), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(upd["var"]),
        0.9 + 0.1 * np.asarray(var) * (n / (n - 1)), atol=1e-6, rtol=1e-5)


def test_grads_match_unfused():
    d, e, k, b, t = 64, 64, 15, 2, 37
    p = _params(jax.random.PRNGKey(3), d, e, k)
    x = jax.random.normal(jax.random.PRNGKey(4), (b, t, d), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(5), (b, t, e), jnp.float32)
    mod = ConvolutionModule(dim_model=d, dim_expand=e, drop_rate=0.0,
                            kernel_size=k, batch_norm=True)

    def loss_ref(x, p):
        y, _ = mod.apply(_unfused_tree(p), x, deterministic=False,
                         mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(6)})
        return (y * cot).sum()

    def loss_fused(x, p):
        y, _, _ = _fused_call(x, p, deterministic=False)
        return (y * cot).sum()

    gx_r, gp_r = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    gx_f, gp_f = jax.grad(loss_fused, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=5e-4, rtol=5e-4)
    for key in p:
        np.testing.assert_allclose(np.asarray(gp_f[key]),
                                   np.asarray(gp_r[key]),
                                   atol=5e-4, rtol=5e-4, err_msg=key)
    # The depthwise bias grad is analytically zero under train-mode BN
    # (the unfused path stop_gradients it; the kernel returns exact zero).
    assert float(np.abs(np.asarray(gp_f["dw_b"])).max()) == 0.0
    assert float(np.abs(np.asarray(gp_r["dw_b"])).max()) == 0.0


def test_dropout_deterministic_given_seed_and_consistent_bwd():
    d, e, k, b, t = 48, 48, 7, 2, 30
    p = _params(jax.random.PRNGKey(7), d, e, k)
    x = jax.random.normal(jax.random.PRNGKey(8), (b, t, d), jnp.float32)
    seed = jnp.array([77], jnp.int32)
    kw = dict(drop_rate=0.3, deterministic=False, seed=seed)

    y1, _, _ = _fused_call(x, p, **kw)
    y2, _, _ = _fused_call(x, p, **kw)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    frac_zero = float((np.asarray(y1) == 0.0).mean())
    assert 0.15 < frac_zero < 0.45, frac_zero

    def loss(x):
        y, _, _ = _fused_call(x, p, **kw)
        return (y * jnp.cos(jnp.arange(y.size, dtype=jnp.float32)
                            .reshape(y.shape))).sum()

    g = jax.grad(loss)(x)
    v = jax.random.normal(jax.random.PRNGKey(9), x.shape)
    eps = 1e-3
    fd = (loss(x + eps * v) - loss(x - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float((g * v).sum()), float(fd),
                               rtol=2e-2, atol=2e-2)


def test_module_env_flag_routes_and_tree_unchanged():
    d, e, k, b, t = 48, 48, 15, 2, 26
    x = jax.random.normal(jax.random.PRNGKey(10), (b, t, d), jnp.float32)
    mod = ConvolutionModule(dim_model=d, dim_expand=e, drop_rate=0.0,
                            kernel_size=k, batch_norm=True)
    rngs = {"dropout": jax.random.PRNGKey(11)}
    variables = mod.init(jax.random.PRNGKey(12), x, deterministic=True)

    ref, mut_ref = mod.apply(variables, x, deterministic=False,
                             mutable=["batch_stats"], rngs=rngs)
    os.environ["AVEC_TPU_FUSED_CONV"] = "1"
    try:
        fused, mut_f = mod.apply(variables, x, deterministic=False,
                                 mutable=["batch_stats"], rngs=rngs)
        # Eval-mode apply under the flag must be the unchanged XLA path.
        ev_flag = mod.apply(variables, x, deterministic=True)
        # init under the flag must still create the unfused tree.
        v2 = mod.init(jax.random.PRNGKey(12), x, deterministic=True)
        assert jax.tree.structure(v2) == jax.tree.structure(variables)
    finally:
        del os.environ["AVEC_TPU_FUSED_CONV"]
    ev = mod.apply(variables, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(ev_flag), np.asarray(ev))
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)
    # Running-stat updates identical through both paths.
    assert jax.tree.structure(mut_f) == jax.tree.structure(mut_ref)
    for a, r in zip(jax.tree.leaves(mut_f), jax.tree.leaves(mut_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-5, rtol=1e-5)


def test_bfloat16_path():
    d, e, k, b, t = 64, 64, 15, 2, 40
    p = _params(jax.random.PRNGKey(13), d, e, k)
    x = jax.random.normal(jax.random.PRNGKey(14), (b, t, d),
                          jnp.float32).astype(jnp.bfloat16)
    mod = ConvolutionModule(dim_model=d, dim_expand=e, drop_rate=0.0,
                            kernel_size=k, batch_norm=True)
    ref, _ = mod.apply(_unfused_tree(p), x, deterministic=False,
                       mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(15)})
    got, _, _ = _fused_call(x, p, deterministic=False)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_fused_conv_under_scanned_block_run():
    """fit() wraps uniform block runs in nn.scan (models/conformer.py:541);
    the fused branch must be exact inside a scanned ConformerBlock — per-
    iteration params arrive as dynamic slices and batch_stats are carried
    per block. Compares a 3-block scanned stack, flag on vs off, in train
    mode: outputs, batch-stat updates, and grads."""
    from avec_tpu.models.conformer import ConformerInterCTC
    from avec_tpu.ops.masks import make_mask

    att = {"class": "RelPos1dMultiHeadAttention",
           "params": {"num_heads": 2, "attn_drop_rate": 0.0,
                      "num_pos_embeddings": 64,
                      "weight_init": "default", "bias_init": "default"}}
    net = ConformerInterCTC(dim_model=[32], num_blocks=[3],
                            interctc_blocks=[], vocab_size=7, att_params=att,
                            kernel_size=7, drop_rate=0.0, conv_stride=1,
                            loss_prefix="ctc", unroll_blocks=False)
    x = jax.random.normal(jax.random.PRNGKey(20), (2, 24, 32))
    lengths = jnp.array([24, 17])
    mask = make_mask(24, lengths)
    rngs = {"dropout": jax.random.PRNGKey(21)}
    variables = net.init(jax.random.PRNGKey(22), x, lengths, mask)

    def run(x, params):
        (out, _, _), mut = net.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, lengths, mask, deterministic=False, mutable=["batch_stats"],
            rngs=rngs)
        return out, mut

    def loss(x, params):
        out, _ = run(x, params)
        return (out ** 2).sum()

    ref, mut_ref = run(x, variables["params"])
    g_ref = jax.grad(loss, argnums=(0, 1))(x, variables["params"])
    os.environ["AVEC_TPU_FUSED_CONV"] = "1"
    try:
        fused, mut_f = run(x, variables["params"])
        g_f = jax.grad(loss, argnums=(0, 1))(x, variables["params"])
    finally:
        del os.environ["AVEC_TPU_FUSED_CONV"]
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    assert jax.tree.structure(mut_f) == jax.tree.structure(mut_ref)
    for a, r in zip(jax.tree.leaves(mut_f), jax.tree.leaves(mut_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-5, rtol=1e-5)
    for a, r in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=2e-3)


def test_shard_map_dp_matches_global():
    """Data-sharded wrapper: BN stats must be GLOBAL (psum'd), so the
    sharded module equals the unsharded fused path — forward, batch
    stats, and all grads (incl. the psum'd replicated weight grads)."""
    from jax.sharding import Mesh
    from avec_tpu.ops.pallas_conv_module import fused_conv_module_3d_dp

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU test mesh")
    d, e, k, b, t = 48, 48, 7, 8, 21
    p = _params(jax.random.PRNGKey(16), d, e, k)
    x = jax.random.normal(jax.random.PRNGKey(17), (b, t, d), jnp.float32)
    cot = jax.random.normal(jax.random.PRNGKey(18), (b, t, e), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def call_dp(x, p):
        return fused_conv_module_3d_dp(
            mesh, "data", x, p["ln_scale"], p["ln_bias"], p["pw1_k"],
            p["pw1_b"], p["dw_k"], p["dw_b"], p["bn_scale"], p["bn_bias"],
            p["pw2_k"], p["pw2_b"], deterministic=False, interpret=True)

    def loss_dp(x, p):
        y, _, _ = call_dp(x, p)
        return (y * cot).sum()

    def loss_ref(x, p):
        y, _, _ = _fused_call(x, p, deterministic=False)
        return (y * cot).sum()

    y_dp, mean_dp, var_dp = call_dp(x, p)
    y_g, mean_g, var_g = _fused_call(x, p, deterministic=False)
    np.testing.assert_allclose(np.asarray(y_dp), np.asarray(y_g),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mean_dp), np.asarray(mean_g),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var_dp), np.asarray(var_g),
                               atol=1e-6, rtol=1e-6)

    (gx_d, gp_d) = jax.grad(loss_dp, argnums=(0, 1))(x, p)
    (gx_r, gp_r) = jax.grad(loss_ref, argnums=(0, 1))(x, p)
    np.testing.assert_allclose(np.asarray(gx_d), np.asarray(gx_r),
                               atol=1e-5, rtol=1e-5)
    for key in p:
        np.testing.assert_allclose(np.asarray(gp_d[key]),
                                   np.asarray(gp_r[key]),
                                   atol=2e-5, rtol=2e-5, err_msg=key)
