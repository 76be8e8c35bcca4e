# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Dump the optimized (post-layout, post-fusion) HLO of bench.py's train step.

The profiler trace (tools/profile_step.py) names hot fusions (fusion.371,
compare_select_fusion.4, ...) but carries no shapes/dtypes. This tool
compiles the SAME train step bench.py times (hitting the persistent compile
cache when bench ran first) and writes `compiled.as_text()` so those fusion
names can be looked up with exact operand shapes, layouts, and dtypes.

Usage:
  python bench.py                      # warms /tmp/avec_tpu_jax_cache
  python tools/dump_hlo.py /tmp/av_step.hlo.txt
  grep -A30 'fusion.371 ' /tmp/av_step.hlo.txt
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/av_step.hlo.txt"

    import jax

    os.environ.setdefault("AVEC_TPU_UNROLL_BLOCKS", "1")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/avec_tpu_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from bench import BATCH, make_batch
    from avec_tpu.models.zoo import AudioVisualEfficientConformerInterCTC
    from avec_tpu.parallel import mesh as pmesh
    from avec_tpu.train.losses import CTCLoss

    model = AudioVisualEfficientConformerInterCTC(
        use_flash=os.environ.get("BENCH_FLASH", "0") == "1")
    model.compile(losses=CTCLoss(zero_infinity=True, assert_shorter=False))
    model.mesh = pmesh.make_mesh()

    batch = make_batch(BATCH)
    model.build(batch["inputs"], precision="bfloat16")
    train_step = model._build_train_step(accumulated_steps=1,
                                         eval_training=False)
    stacked = model._stack_micro(batch, 1)
    gbatch = pmesh.host_local_batch_to_global(model.mesh, stacked,
                                              batch_axis=1)
    state = model._state()
    rng = jax.random.PRNGKey(0)

    compiled = train_step.lower(state, gbatch, rng).compile()
    text = compiled.as_text()
    with open(out_path, "w") as f:
        f.write(text)
    print(f"wrote {len(text) / 1e6:.1f} MB of optimized HLO to {out_path}")


if __name__ == "__main__":
    main()
