# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Device mesh + sharding utilities (the NCCL/DDP replacement).

The reference's distribution stack (torch DDP over NCCL, SyncBatchNorm,
DistributedSampler, all_reduce/all_gather_object — SURVEY §2.2-2.3) maps to:

  * one global `Mesh` with a 'data' axis (room for a 'model' axis kept —
    `make_mesh(model_parallel=k)` factors devices as data x model)
  * batch pytrees sharded on 'data' via NamedSharding; params replicated
  * gradient averaging, metric reduction and sync-BN batch statistics all
    emerge from GSPMD: XLA inserts the collectives over ICI/DCN
  * host-object exchange (path broadcast, string gather, barriers) via
    jax.experimental.multihost_utils

Multi-host: call `init_distributed()` before mesh construction; per-host data
sharding goes through `host_local_batch_to_global`.
"""

import os
from typing import Any, Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None):
    """Initialize multi-host JAX (no-op for single-process runs).

    Replaces torch.distributed.init_process_group (main.py:46).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_mesh(devices=None, model_parallel: int = 1) -> Mesh:
    """Build a ('data', 'model') mesh over all devices.

    The reference is data-parallel only (SURVEY §2.2); model_parallel=1 keeps
    the 'model' axis trivial but present so tensor-parallel shardings can be
    layered in without re-plumbing.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size % model_parallel == 0
    grid = devices.reshape(devices.size // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Shard `batch_axis` over 'data' (axis 1 for (A, B, ...) stacked
    micro-batches, axis 0 for plain batches)."""
    spec = [None] * batch_axis + ["data"]
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, batch_axis: int = 0) -> Any:
    """Place a host batch pytree with batch-axis sharding.

    Leaves whose batch dim is not divisible by the data-axis size (e.g. the
    final partial eval batch) are replicated instead — correctness first,
    XLA still partitions the compute where it can.
    """
    ndata = mesh.shape["data"]
    sharded = batch_sharding(mesh, batch_axis)
    replicated = replicated_sharding(mesh)

    def put(x):
        ok = (hasattr(x, "shape") and len(x.shape) > batch_axis
              and x.shape[batch_axis] % ndata == 0)
        return jax.device_put(x, sharded if ok else replicated)

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sharding = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def host_local_batch_to_global(mesh: Mesh, batch: Any, batch_axis: int = 0) -> Any:
    """Multi-host: assemble a global sharded array from per-host shards.

    Replaces DistributedSampler rank slicing (functions.py:115) at the array
    level.

    A final eval batch whose per-host shard is not divisible by this host's
    slice of the 'data' axis (eval uses drop_last=False, functions.py:151)
    cannot be assembled with host_local_array_to_global_array; those leaves
    are instead gathered across processes and replicated — the same
    correctness-first fallback as the single-process path (shard_batch).
    """
    if jax.process_count() == 1:
        return shard_batch(mesh, batch, batch_axis)
    from jax.experimental import multihost_utils

    ndata_local = max(
        1, mesh.shape["data"] // max(1, jax.process_count()))

    def divisible(x):
        return (hasattr(x, "shape") and len(x.shape) > batch_axis
                and x.shape[batch_axis] % ndata_local == 0)

    flat = jax.tree.leaves(batch)
    all_ok = all(divisible(x) for x in flat)
    # Every process must take the same branch (collectives must match up);
    # agree on the verdict first.
    verdicts = process_allgather(bool(all_ok))
    if all(verdicts):
        spec = P(*([None] * batch_axis + ["data"]))
        return multihost_utils.host_local_array_to_global_array(
            batch, mesh, spec)

    # Fallback: gather each host's shard, concatenate on the batch axis,
    # replicate the global batch (rare: only the last partial eval batch).
    host_np = jax.tree.map(np.asarray, batch)
    shards = process_allgather(host_np)
    global_batch = jax.tree.map(
        lambda *xs: np.concatenate(xs, axis=batch_axis), *shards)
    return replicate(mesh, global_batch)


def param_shardings(mesh: Mesh, params: Any, rules) -> Any:
    """NamedShardings for a param pytree from (path-regex, PartitionSpec)
    rules — the tensor-parallel layer of the ('data', 'model') mesh.

    Paths are '/'-joined key strings ("transformer/block_0/ff_module/
    Linear_0/kernel"); first matching rule wins. A rule only applies when
    every named axis divides the corresponding dim (otherwise the param is
    replicated — correctness first). GSPMD propagates the resulting
    shardings through the jitted step and inserts the all-reduces /
    all-gathers over ICI, replacing Megatron-style manual collectives.
    """
    import re

    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    def axis_ok(shape, spec):
        for dim, name in zip(shape, tuple(spec)):
            if name is not None and dim % mesh.shape[name] != 0:
                return False
        return len(tuple(spec)) <= len(shape)

    flat, treedef = tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        pathstr = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                           for k in path)
        sharding = replicated_sharding(mesh)
        for pat, spec in rules:
            if re.search(pat, pathstr):
                if axis_ok(leaf.shape, spec):
                    sharding = NamedSharding(mesh, spec)
                break
        out.append(sharding)
    return tree_unflatten(treedef, out)


def shard_tree(tree: Any, shardings: Any) -> Any:
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)


def shard_like_params(mesh: Mesh, state: Any, params: Any,
                      shardings: Any) -> Any:
    """Place an optimizer-state pytree using the param shardings.

    optax moment trees mirror the params tree, so any state leaf whose path
    ENDS WITH a param path (same shape, anchored at a '/' path boundary so
    'dense/kernel' cannot claim 'other_dense/kernel') gets that param's
    sharding; everything else (step counters, scalars) is replicated.
    """
    from jax.tree_util import tree_flatten_with_path, tree_unflatten

    def pathstr(path):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                        for k in path)

    pflat, _ = tree_flatten_with_path(params)
    sflat = jax.tree.leaves(shardings)
    by_suffix = [(pathstr(path), leaf.shape, sh)
                 for (path, leaf), sh in zip(pflat, sflat)]
    flat, treedef = tree_flatten_with_path(state)
    repl = replicated_sharding(mesh)
    out = []
    for path, leaf in flat:
        ps = pathstr(path)
        sharding = repl
        for suffix, shape, sh in by_suffix:
            if ((ps == suffix or ps.endswith("/" + suffix))
                    and getattr(leaf, "shape", None) == shape):
                sharding = sh
                break
        out.append(jax.device_put(leaf, sharding))
    return tree_unflatten(treedef, out)


def gpt_tensor_parallel_rules():
    """Megatron-style sharding rules for the GPT stack (models/transformer.py):
    column-parallel FFN-in and fused QKV projections, row-parallel FFN-out
    and attention output, hidden-sharded embedding/head."""
    return [
        (r"ff_module/Linear_0/kernel$", P(None, "model")),
        (r"ff_module/Linear_0/bias$", P("model")),
        (r"ff_module/Linear_1/kernel$", P("model", None)),
        (r"(query|key|value)_layer/kernel$", P(None, "model")),
        (r"(query|key|value)_layer/bias$", P("model")),
        (r"output_layer/kernel$", P("model", None)),
        (r"embedding/embedding$", P(None, "model")),
        (r"head/kernel$", P(None, "model")),
        (r"head/bias$", P("model")),
    ]


def sync_global_devices(name: str = "barrier"):
    """Replaces torch.distributed.barrier (functions.py:58-59)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def process_allgather(obj):
    """Gather arbitrary host objects from every process (replaces
    all_gather_object, nnet/model.py:645-666). Single-process: identity list.

    multihost_utils.process_allgather moves ARRAYS; arbitrary objects
    (decoded-string lists for exact-WER recompute) are pickled into padded
    uint8 buffers: gather sizes first, pad to the global max, gather, strip.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    sizes = np.asarray(multihost_utils.process_allgather(
        np.array([data.size], np.int32))).reshape(-1)
    padded = np.zeros((int(sizes.max()),), np.uint8)
    padded[: data.size] = data
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [pickle.loads(gathered[i, : int(sizes[i])].tobytes())
            for i in range(jax.process_count())]


def broadcast_host_object(obj, root: int = 0):
    """Broadcast an arbitrary host object from root (replaces
    broadcast_object_list, nnet/datasets.py:202-217)."""
    if jax.process_count() == 1:
        return obj
    import pickle

    from jax.experimental import multihost_utils

    is_src = jax.process_index() == root
    data = (np.frombuffer(pickle.dumps(obj), np.uint8) if is_src
            else np.zeros((0,), np.uint8))
    size = multihost_utils.broadcast_one_to_all(
        np.array([data.size], np.int32), is_source=is_src)
    buf = np.zeros((int(size[0]),), np.uint8)
    if is_src:
        buf[:] = data
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf,
                                                          is_source=is_src))
    return pickle.loads(out.tobytes())
