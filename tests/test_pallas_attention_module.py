"""Fused attention-module Pallas kernels (ops/pallas_attention_module.py)
vs the unfused AttentionModule (factorized rel-pos path, the in-model
default).

Runs in interpret mode on the CPU test mesh. Covers: train-mode forward
exactness with and without key-padding masks, full gradient exactness vs
autodiff of the unfused module (params and input), dropout fwd/bwd mask
consistency (finite differences), env-flag routing with an unchanged
variable tree, all-three-fused-kernels ConformerBlock exactness, bf16
sanity, and the shard_map DP wrapper.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avec_tpu.models.conformer import AttentionModule
from avec_tpu.ops.masks import make_mask


def _att_params(num_heads):
    return {"class": "RelPos1dMultiHeadAttention",
            "params": {"num_heads": num_heads, "attn_drop_rate": 0.0,
                       "num_pos_embeddings": 64,
                       "weight_init": "default", "bias_init": "default"}}


def _module(d, num_heads, drop_rate=0.0):
    return AttentionModule(dim_model=d, att_params=_att_params(num_heads),
                           drop_rate=drop_rate)


def _apply(mod, variables, x, mask, fused, rngs=None, det=False):
    if fused:
        os.environ["AVEC_TPU_FUSED_ATT"] = "1"
    try:
        return mod.apply(variables, x, mask=mask, deterministic=det,
                         rngs=rngs or {"dropout": jax.random.PRNGKey(9)})
    finally:
        os.environ.pop("AVEC_TPU_FUSED_ATT", None)


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("d,h,bt", [(32, 2, (3, 29)), (64, 4, (2, 40))])
def test_forward_matches_unfused(masked, d, h, bt):
    b, t = bt
    mod = _module(d, h)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
    mask = None
    if masked:
        lengths = jnp.array([t, t // 2, t - 5][:b])
        mask = make_mask(t, lengths)
    variables = mod.init(jax.random.PRNGKey(1), x)
    ref = _apply(mod, variables, x, mask, fused=False)
    got = _apply(mod, variables, x, mask, fused=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_grads_match_unfused():
    d, h, b, t = 32, 4, 2, 26
    mod = _module(d, h)
    x = jax.random.normal(jax.random.PRNGKey(2), (b, t, d))
    lengths = jnp.array([t, t - 7])
    mask = make_mask(t, lengths)
    cot = jax.random.normal(jax.random.PRNGKey(3), (b, t, d))
    variables = mod.init(jax.random.PRNGKey(4), x)

    def loss(params, x, fused):
        y = _apply(mod, {"params": params}, x, mask, fused=fused)
        return (y * cot).sum()

    gp_r, gx_r = jax.grad(loss, argnums=(0, 1))(variables["params"], x, False)
    gp_f, gx_f = jax.grad(loss, argnums=(0, 1))(variables["params"], x, True)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r),
                               atol=5e-4, rtol=5e-4)
    flat_r = jax.tree_util.tree_flatten_with_path(gp_r)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(gp_f)[0]
    for (path, r), (_, f) in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   atol=5e-4, rtol=5e-4,
                                   err_msg=jax.tree_util.keystr(path))


def test_dropout_deterministic_given_seed_and_consistent_bwd():
    d, h, b, t = 32, 2, 2, 21
    mod = _module(d, h, drop_rate=0.4)
    x = jax.random.normal(jax.random.PRNGKey(5), (b, t, d))
    variables = mod.init(jax.random.PRNGKey(6), x)
    rngs = {"dropout": jax.random.PRNGKey(7)}

    y1 = _apply(mod, variables, x, None, fused=True, rngs=rngs)
    y2 = _apply(mod, variables, x, None, fused=True, rngs=rngs)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # Residual means dropped positions equal x exactly.
    frac_res = float((np.asarray(y1) == np.asarray(x)).mean())
    assert 0.2 < frac_res < 0.6, frac_res

    def loss(x):
        y = _apply(mod, variables, x, None, fused=True, rngs=rngs)
        return (y * jnp.sin(jnp.arange(y.size, dtype=jnp.float32)
                            .reshape(y.shape))).sum()

    g = jax.grad(loss)(x)
    v = jax.random.normal(jax.random.PRNGKey(8), x.shape)
    eps = 1e-3
    fd = (loss(x + eps * v) - loss(x - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float((g * v).sum()), float(fd),
                               rtol=2e-2, atol=2e-2)


def test_env_flag_routes_and_tree_unchanged():
    d, h, b, t = 32, 2, 2, 18
    mod = _module(d, h)
    x = jax.random.normal(jax.random.PRNGKey(10), (b, t, d))
    variables = mod.init(jax.random.PRNGKey(11), x)
    os.environ["AVEC_TPU_FUSED_ATT"] = "1"
    try:
        v2 = mod.init(jax.random.PRNGKey(11), x)
        assert jax.tree.structure(v2) == jax.tree.structure(variables)
        # Eval-mode apply under the flag must be the unchanged XLA path.
        ev_flag = mod.apply(variables, x, deterministic=True)
    finally:
        del os.environ["AVEC_TPU_FUSED_ATT"]
    ev = mod.apply(variables, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(ev_flag), np.asarray(ev))


def test_bfloat16_path():
    d, h, b, t = 64, 4, 2, 33
    mod = _module(d, h)
    x = jax.random.normal(jax.random.PRNGKey(12), (b, t, d)).astype(
        jnp.bfloat16)
    variables = mod.init(jax.random.PRNGKey(13), x)
    ref = _apply(mod, variables, x, None, fused=False)
    got = _apply(mod, variables, x, None, fused=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               atol=5e-2, rtol=5e-2)


def test_conformer_block_all_three_fused():
    """ConformerBlock with FFN + attention + conv-module kernels all on vs
    all off (train mode, stride 1): outputs, batch stats and grads."""
    from avec_tpu.models.conformer import ConformerBlock

    d, b, t = 32, 2, 24
    block = ConformerBlock(dim_model=d, dim_expand=d, ff_ratio=4,
                           att_params=_att_params(2), drop_rate=0.0,
                           conv_stride=1, kernel_size=7)
    x = jax.random.normal(jax.random.PRNGKey(14), (b, t, d))
    lengths = jnp.array([t, t - 9])
    mask = make_mask(t, lengths)
    variables = block.init(jax.random.PRNGKey(15), x)
    cot = jax.random.normal(jax.random.PRNGKey(16), (b, t, d))

    def run(params, x):
        (y, mut) = block.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, mask=mask, deterministic=False, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(17)})
        return y, mut

    def loss(params, x):
        y, _ = run(params, x)
        return (y * cot).sum()

    ref, mut_ref = run(variables["params"], x)
    g_ref = jax.grad(loss, argnums=(0, 1))(variables["params"], x)
    for flag in ("AVEC_TPU_FUSED_ATT", "AVEC_TPU_FUSED_FFN",
                 "AVEC_TPU_FUSED_CONV"):
        os.environ[flag] = "1"
    try:
        got, mut_f = run(variables["params"], x)
        g_f = jax.grad(loss, argnums=(0, 1))(variables["params"], x)
    finally:
        for flag in ("AVEC_TPU_FUSED_ATT", "AVEC_TPU_FUSED_FFN",
                     "AVEC_TPU_FUSED_CONV"):
            del os.environ[flag]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
    for a, r in zip(jax.tree.leaves(mut_f), jax.tree.leaves(mut_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-5, rtol=1e-5)
    for a, r in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=2e-3, rtol=2e-3)


def test_shard_map_dp_matches_global():
    from jax.sharding import Mesh
    from avec_tpu.ops.pallas_attention_module import (
        fused_attention_module_3d, fused_attention_module_3d_dp)

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU test mesh")
    d, h, b, t = 32, 2, 8, 19
    mod = _module(d, h)
    x = jax.random.normal(jax.random.PRNGKey(18), (b, t, d))
    lengths = jnp.arange(b) + (t - b) + 1
    variables = mod.init(jax.random.PRNGKey(19), x)
    p = variables["params"]
    a = p["RelPos1dMultiHeadAttention_0"]
    args = (p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"],
            a["query_layer"]["kernel"], a["query_layer"]["bias"],
            a["key_layer"]["kernel"], a["key_layer"]["bias"],
            a["value_layer"]["kernel"], a["value_layer"]["bias"],
            a["pos_kernel"], a["pos_bias"],
            a["output_layer"]["kernel"], a["output_layer"]["bias"])
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    cot = jax.random.normal(jax.random.PRNGKey(20), (b, t, d))

    def loss_dp(x, args):
        y = fused_attention_module_3d_dp(
            mesh, "data", x, *args, num_heads=h, lengths=lengths,
            deterministic=False, interpret=True)
        return (y * cot).sum()

    def loss_ref(x, args):
        y = fused_attention_module_3d(
            x, *args, num_heads=h, lengths=lengths, deterministic=False,
            interpret=True)
        return (y * cot).sum()

    np.testing.assert_allclose(np.asarray(jax.jit(loss_dp)(x, args)),
                               np.asarray(loss_ref(x, args)),
                               rtol=1e-6)
    g_dp = jax.jit(jax.grad(loss_dp, argnums=(0, 1)))(x, args)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(x, args)
    for a_, r_ in zip(jax.tree.leaves(g_dp), jax.tree.leaves(g_r)):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(r_),
                                   atol=2e-5, rtol=2e-5)
