"""Worker for the 2-process host-collective test (run via subprocess).

Each process: 2 virtual CPU devices -> 4 global. Exercises the full
multi-host path of parallel/mesh.py: mesh construction over global devices,
host_local_batch_to_global, string-list process_allgather, object broadcast,
barrier, and a jitted global-batch mean (the DDP gradient-averaging shape).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROCESS_ID = int(sys.argv[1])
NUM_PROCESSES = int(sys.argv[2])
COORDINATOR = sys.argv[3]

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from avec_tpu.parallel import mesh as pmesh  # noqa: E402

pmesh.init_distributed(coordinator_address=COORDINATOR,
                       num_processes=NUM_PROCESSES, process_id=PROCESS_ID)
assert jax.process_count() == NUM_PROCESSES, jax.process_count()
assert jax.device_count() == 2 * NUM_PROCESSES, jax.device_count()

import numpy as np  # noqa: E402

mesh = pmesh.make_mesh()
assert mesh.shape["data"] == 2 * NUM_PROCESSES

# --- host_local_batch_to_global + jitted global mean -------------------
local = np.full((4, 3), float(PROCESS_ID), np.float32)  # 2 rows per device
gbatch = pmesh.host_local_batch_to_global(mesh, {"x": local})
mean = jax.jit(lambda b: b["x"].mean())(gbatch)
want = np.mean([float(p) for p in range(NUM_PROCESSES) for _ in range(4)])
assert abs(float(mean) - want) < 1e-6, (float(mean), want)

# --- indivisible final eval batch (drop_last=False) ---------------------
# 3 rows per host is not divisible by the 2 local devices on the 'data'
# axis: host_local_array_to_global_array can't assemble it, so the
# gather-and-replicate fallback must kick in and still produce the global
# batch (all hosts' rows concatenated).
odd = np.arange(3, dtype=np.float32).reshape(3, 1) + 10.0 * PROCESS_ID
godd = pmesh.host_local_batch_to_global(mesh, {"x": odd})
assert godd["x"].shape[0] == 3 * NUM_PROCESSES, godd["x"].shape
osum = jax.jit(lambda b: b["x"].sum())(godd)
want_sum = sum(float(v) for p in range(NUM_PROCESSES)
               for v in (np.arange(3) + 10.0 * p))
assert abs(float(osum) - want_sum) < 1e-5, (float(osum), want_sum)

# --- exact-WER recompute over gathered transcripts ----------------------
from avec_tpu.utils.wer import wer  # noqa: E402

local_truths = ["the cat sat", "on the mat"] if PROCESS_ID == 0 else \
    ["a dog ran"]  # unequal counts: the partial-batch shape
local_preds = ["the cat sat", "on a mat"] if PROCESS_ID == 0 else \
    ["a dog run"]
all_t = [s for part in pmesh.process_allgather(local_truths) for s in part]
all_p = [s for part in pmesh.process_allgather(local_preds) for s in part]
assert len(all_t) == len(all_p) == 3, (all_t, all_p)
wer_global = wer(all_t, all_p)
# 2 errors over 9 words, identically computed on every rank
assert abs(wer_global - 2 / 9) < 1e-9, wer_global

# --- string-list allgather (exact-WER recompute path) -------------------
truths = [f"hello from rank {PROCESS_ID}", "x" * (PROCESS_ID + 1)]
gathered = pmesh.process_allgather(truths)
assert len(gathered) == NUM_PROCESSES
for p in range(NUM_PROCESSES):
    assert gathered[p][0] == f"hello from rank {p}", gathered

# --- object broadcast (dataset path-list pattern) ------------------------
paths = {"paths": ["a.mp4", "b.mp4"], "rank": 0} if PROCESS_ID == 0 else None
out = pmesh.broadcast_host_object(paths, root=0)
assert out == {"paths": ["a.mp4", "b.mp4"], "rank": 0}, out

# --- barrier -------------------------------------------------------------
pmesh.sync_global_devices("test")

print(f"WORKER_OK rank={PROCESS_ID} mean={float(mean):.3f}")
