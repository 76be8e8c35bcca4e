"""Mesh/sharding helper tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from avec_tpu.parallel import mesh as pmesh


def test_make_mesh_axes():
    m = pmesh.make_mesh()
    assert m.axis_names == ("data", "model")
    assert m.shape["data"] == 8 and m.shape["model"] == 1
    m2 = pmesh.make_mesh(model_parallel=2)
    assert m2.shape["data"] == 4 and m2.shape["model"] == 2


def test_shard_batch_divisible_and_not():
    m = pmesh.make_mesh()
    batch = {"a": np.zeros((16, 4), np.float32),
             "b": np.zeros((5, 4), np.float32),   # not divisible -> replicated
             "len": np.zeros((16,), np.int32)}
    out = pmesh.shard_batch(m, batch)
    a_shard = out["a"].sharding
    assert a_shard.is_fully_replicated is False
    assert out["b"].sharding.is_fully_replicated
    # Stacked micro-batches shard axis 1.
    stacked = {"a": np.zeros((2, 16, 4), np.float32)}
    out2 = pmesh.shard_batch(m, stacked, batch_axis=1)
    assert not out2["a"].sharding.is_fully_replicated


def test_replicate_and_collectives_single_process():
    m = pmesh.make_mesh()
    tree = {"w": np.ones((3, 3), np.float32)}
    rep = pmesh.replicate(m, tree)
    assert rep["w"].sharding.is_fully_replicated
    assert pmesh.process_allgather(["x"]) == [["x"]]
    assert pmesh.broadcast_host_object({"k": 1}) == {"k": 1}
    pmesh.sync_global_devices("test")  # no-op single process


def test_sharded_computation_matches_replicated():
    """A psum-free data-parallel loss over a sharded batch must equal the
    single-device value (GSPMD correctness smoke)."""
    m = pmesh.make_mesh()
    x = np.random.RandomState(0).randn(16, 8).astype(np.float32)
    w = np.random.RandomState(1).randn(8, 4).astype(np.float32)

    def loss(w, x):
        return ((x @ w) ** 2).mean()

    ref = float(loss(jnp.asarray(w), jnp.asarray(x)))
    xs = pmesh.shard_batch(m, {"x": x})["x"]
    wr = pmesh.replicate(m, {"w": w})["w"]
    got = float(jax.jit(loss)(wr, xs))
    assert abs(ref - got) < 1e-5
