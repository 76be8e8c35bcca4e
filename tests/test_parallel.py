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


def _tiny_gpt_batch(n=16, t=16, vocab=64):
    rng = np.random.RandomState(0)
    ids = rng.randint(1, vocab, size=(n, t)).astype(np.int32)
    labels = np.concatenate([ids[:, 1:], np.full((n, 1), -1, np.int32)], axis=1)
    return {"inputs": [ids], "targets": labels}


def _fit_gpt(model_parallel, rules, steps=2):
    from avec_tpu.models import zoo
    from avec_tpu.train.losses import SoftmaxCrossEntropy

    model = zoo.GPT(vocab_size=64, model="GPT-Tiny", max_pos_encoding=32)
    model.compile(losses=SoftmaxCrossEntropy(ignore_index=-1))
    model.mesh = pmesh.make_mesh(model_parallel=model_parallel)
    model.param_sharding_rules = rules
    batch = _tiny_gpt_batch()
    model.build(batch["inputs"])
    step_fn = model._build_train_step(accumulated_steps=1, eval_training=False)
    stacked = model._stack_micro(batch, 1)
    gbatch = pmesh.host_local_batch_to_global(model.mesh, stacked, batch_axis=1)
    state = model._state()
    rng = jax.random.PRNGKey(0)
    losses = []
    for _ in range(steps):
        state, (ls, _, _) = step_fn(state, gbatch, rng)
        losses.append(float(ls["loss"]))
    return model, state, losses


def test_gpt_tensor_parallel_matches_data_parallel():
    """Megatron-style 'model'-axis sharding of the GPT (column/row-parallel
    FFN + QKV, hidden-sharded embedding) must (a) actually shard the
    parameters across the mesh and (b) produce the same losses as the pure
    data-parallel run — GSPMD inserts the TP collectives."""
    rules = pmesh.gpt_tensor_parallel_rules()
    model_tp, state_tp, losses_tp = _fit_gpt(model_parallel=4, rules=rules)

    # The FFN-in kernel must be sharded over 'model' (a real shard, not a
    # replica: each device holds 1/4 of the hidden dim).
    k = state_tp["params"]["transformer"]["block_0"]["ff_module"]["Linear_0"]["kernel"]
    assert not k.sharding.is_fully_replicated
    shard_shapes = {s.data.shape for s in k.addressable_shards}
    assert shard_shapes == {(k.shape[0], k.shape[1] // 4)}
    # The embedding table is hidden-sharded as well.
    emb = state_tp["params"]["embedding"]["embedding"]
    assert not emb.sharding.is_fully_replicated

    _, _, losses_dp = _fit_gpt(model_parallel=1, rules=None)
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-5, atol=2e-5)
