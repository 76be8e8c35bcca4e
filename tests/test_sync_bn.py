"""Cross-replica BatchNorm (sync-BN) parity on the 8-device mesh.

Parity target: /root/reference/nnet/normalizations.py:172-249
(SyncBatchNorm.convert_sync_batchnorm): under DDP the reference computes BN
batch statistics over the GLOBAL batch. Our claim is that GSPMD does this
"for free" — BatchNorm reduces over the sharded batch axis, so XLA inserts
the cross-replica collective. These tests assert it numerically: train-mode
batch_stats after a step on a batch sharded over 8 devices equal the
single-device global-batch statistics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avec_tpu.ops.layers import BatchNorm
from avec_tpu.models.conformer import ConvolutionModule
from avec_tpu.parallel import mesh as pmesh


def _train_forward(module, variables, x, sharded_x=None, rngs=None):
    """One train-mode forward returning updated batch_stats."""

    @jax.jit
    def step(params, batch_stats, inp):
        out, mut = module.apply(
            {"params": params, "batch_stats": batch_stats}, inp,
            deterministic=False, mutable=["batch_stats"],
            rngs=rngs or {})
        return out, mut["batch_stats"]

    inp = sharded_x if sharded_x is not None else x
    return step(variables["params"], variables["batch_stats"], inp)


def test_batchnorm_stats_match_global_batch():
    mesh = pmesh.make_mesh()
    rng = np.random.RandomState(0)
    # Per-replica batches DIFFER (the interesting case): global stats are not
    # any replica's local stats.
    x = np.concatenate([rng.randn(2, 5, 16) * (i + 1) + i
                        for i in range(8)]).astype(np.float32)

    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), x, use_running_average=False)

    @jax.jit
    def step(params, batch_stats, inp):
        out, mut = bn.apply({"params": params, "batch_stats": batch_stats},
                            inp, use_running_average=False,
                            mutable=["batch_stats"])
        return out, mut["batch_stats"]

    # Single-device reference on the full batch.
    ref_out, ref_bs = step(variables["params"], variables["batch_stats"], x)

    # Sharded over the mesh, params replicated.
    xs = pmesh.shard_batch(mesh, {"x": x})["x"]
    assert not xs.sharding.is_fully_replicated
    pr = pmesh.replicate(mesh, variables["params"])
    bsr = pmesh.replicate(mesh, variables["batch_stats"])
    got_out, got_bs = step(pr, bsr, xs)

    for key in ("mean", "var"):
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(got_bs)[0] if key == "mean" else
                       jax.tree.leaves(got_bs)[1]),
            np.asarray(jax.tree.leaves(ref_bs)[0] if key == "mean" else
                       jax.tree.leaves(ref_bs)[1]),
            atol=1e-5, err_msg=key)
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=1e-5)


@pytest.mark.parametrize("stride", [1, 2])
def test_conv_module_bn_stats_match_global_batch(stride):
    """The conformer ConvolutionModule's BN (incl. the strided downsampling
    block) computes global-batch statistics under sharding."""
    mesh = pmesh.make_mesh()
    rng = np.random.RandomState(1)
    x = np.stack([rng.randn(12, 16) * (1 + 0.5 * (i % 8))
                  for i in range(16)]).astype(np.float32)

    mod = ConvolutionModule(dim_model=16, dim_expand=16, drop_rate=0.0,
                            stride=stride)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         deterministic=True)

    @jax.jit
    def step(params, batch_stats, inp):
        out, mut = mod.apply({"params": params, "batch_stats": batch_stats},
                             inp, deterministic=False,
                             mutable=["batch_stats"])
        return out, mut["batch_stats"]

    ref_out, ref_bs = step(variables["params"], variables["batch_stats"], x)

    xs = pmesh.shard_batch(mesh, {"x": x})["x"]
    pr = pmesh.replicate(mesh, variables["params"])
    bsr = pmesh.replicate(mesh, variables["batch_stats"])
    got_out, got_bs = step(pr, bsr, xs)

    flat_ref = jax.tree_util.tree_leaves_with_path(ref_bs)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got_bs))
    assert flat_ref, "ConvolutionModule must carry BN running stats"
    for path, ref_leaf in flat_ref:
        np.testing.assert_allclose(np.asarray(flat_got[path]),
                                   np.asarray(ref_leaf), atol=1e-5,
                                   err_msg=str(path))
    np.testing.assert_allclose(np.asarray(got_out), np.asarray(ref_out),
                               atol=1e-4)
