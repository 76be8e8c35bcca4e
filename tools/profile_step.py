# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Map profiled device time to model components.

Workflow (how the round-2 optimizations were found):
  1. BENCH_PROFILE=/tmp/prof BENCH_WINDOWS=1 python bench.py
     (writes a jax.profiler trace; NOTE: a second profiler attach in one
     process can abort the TPU backend — use a fresh process per trace)
  2. python tools/profile_step.py /tmp/prof
     (dumps the compiled train-step HLO, joins trace op names with HLO
     op_name metadata, prints per-component and top-op tables)

The per-component buckets use the jax scope names burned into HLO metadata
(encoder/video_encoder/front_end..., audio_encoder/back_end, ...), so the
output reads as "which part of the model costs what" instead of fusion ids.
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_top_ops import load_trace_events, summarize

BUCKETS = [
    ("video_front_end", ("video_encoder/front_end",)),
    ("video_conformer", ("video_encoder/back_end",)),
    ("video_other", ("video_encoder",)),
    ("audio_conformer", ("audio_encoder/back_end",)),
    ("audio_frontend+stem", ("audio_encoder",)),
    ("av_conformer", ("audio_visual_encoder",)),
    ("fusion_module", ("fusion_module", "Fusion")),
    ("ctc_loss", ("ctc", "take_along", "logsumexp")),
    ("optimizer", ("adam", "opt", "ema")),
]


def dump_train_step_hlo(batch: int, path: str) -> str:
    """Compile (cache-warm) the bench train step and dump optimized HLO."""
    os.environ.setdefault("BENCH_BATCH", str(batch))
    import jax

    import bench
    from avec_tpu.models.zoo import AudioVisualEfficientConformerInterCTC
    from avec_tpu.parallel import mesh as pmesh
    from avec_tpu.train.losses import CTCLoss

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/avec_tpu_jax_cache"))
    model = AudioVisualEfficientConformerInterCTC()
    model.compile(losses=CTCLoss(zero_infinity=True, assert_shorter=False))
    model.mesh = pmesh.make_mesh()
    b = bench.make_batch(batch)
    model.build(b["inputs"], precision="bfloat16")
    step = model._build_train_step(accumulated_steps=1, eval_training=False)
    gbatch = pmesh.host_local_batch_to_global(
        model.mesh, model._stack_micro(b, 1), batch_axis=1)
    txt = step.lower(model._state(), gbatch,
                     jax.random.PRNGKey(0)).compile().as_text()
    with open(path, "w") as f:
        f.write(txt)
    return txt


def main():
    profile_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    batch = int(os.environ.get("BENCH_BATCH", 16))
    hlo_path = f"/tmp/train_step_b{batch}.hlo"
    if os.path.isfile(hlo_path):
        hlo = open(hlo_path).read()
    else:
        hlo = dump_train_step_hlo(batch, hlo_path)

    events = load_trace_events(profile_dir)
    total, count, _ = summarize(events)
    meta = {m.group(1): m.group(2) for m in re.finditer(
        r"%([\w.\-]+) = .*?op_name=\"([^\"]+)\"", hlo)}

    # Steps profiled = number of jit_train_step executions in the trace.
    steps = max(count.get(n, 0) for n in total if n.startswith("jit_")) or 1

    buckets = collections.Counter()
    detail = collections.defaultdict(collections.Counter)
    for name, dur in total.items():
        if name.startswith("jit_") or name.isdigit():
            continue
        om = meta.get(name, "")
        b = "unmapped"
        for bname, pats in BUCKETS:
            if any(p in om or p in om.lower() for p in pats):
                b = bname
                break
        else:
            if om:
                b = "other_mapped"
        buckets[b] += dur
        detail[b][name] += dur

    tot = sum(buckets.values())
    print(f"device time: {tot/steps/1e3:.1f} ms/step over {steps} steps\n")
    for b, d in buckets.most_common():
        print(f"  {b:<22} {d/steps/1e3:8.2f} ms/step  {100*d/tot:5.1f}%")
    print("\ntop ops per bucket:")
    for b, _ in buckets.most_common(5):
        print(f"== {b}")
        for name, d in detail[b].most_common(5):
            om = meta.get(name, "?").replace(
                "jit(train_step)/while/body/closed_call/", "")
            print(f"   {d/steps/1e3:6.2f} ms  {name[:28]:<28} {om[:80]}")


if __name__ == "__main__":
    main()
