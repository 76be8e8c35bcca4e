# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Map profiled device time to model components.

Workflow (how the round-2/3/4 optimizations were found):
  1. BENCH_PROFILE=/tmp/prof BENCH_WINDOWS=1 python bench.py
     (writes a jax.profiler trace; NOTE: a second profiler attach in one
     process can abort the TPU backend — use a fresh process per trace)
  2. python tools/profile_step.py /tmp/prof
     (prints per-component and top-op tables)

Attribution source: each device-lane trace event carries the op's own
`tf_op` (the jax scope path burned into HLO metadata, e.g.
"...jvp(_AVInterCTCNet)/encoder/video_encoder/front_end_resnet/...") and
`source` (file:line) args — no HLO re-dump/join needed (the round-3 version
re-lowered the step and joined on fusion names, which broke whenever the
trace numbering diverged from the fresh lowering).
"""

import collections
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_top_ops import load_trace_events

BUCKETS = [
    ("video_stem", ("front_end_stem",)),
    ("video_resnet", ("front_end_resnet", "front_end")),
    ("video_conformer", ("video_encoder/back_end",)),
    ("video_other", ("video_encoder",)),
    ("fbank", ("ops/audio.py", "audio_encoder/log", "audio_encoder/conv_general_dilated")),
    ("audio_stem", ("subsampling_module", "audio_encoder/linear")),
    ("audio_conf_stage1", tuple(f"audio_encoder/back_end/block_{i}/" for i in range(5))
     + ("audio_encoder/back_end/blocks_0", "audio_encoder/back_end/blocks_1",
        "audio_encoder/back_end/blocks_2", "audio_encoder/back_end/blocks_3")),
    ("audio_conf_rest", ("audio_encoder/back_end",)),
    ("av_conformer", ("audio_visual_encoder",)),
    ("fusion_module", ("fusion_module", "Fusion")),
    ("ctc_loss", ("ops/ctc.py", "ctc", "take_along", "logsumexp")),
    ("optimizer+ema", ("adam", "/opt", "ema", "optim")),
]


def attribute(events):
    """Bucket device-lane op time by tf_op/source scope."""
    proc_names, thread_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def is_op_lane(pid, tid):
        txt = (proc_names.get(pid, "") + " "
               + thread_names.get((pid, tid), "")).lower()
        return "xla op" in txt

    buckets = collections.Counter()
    detail = collections.defaultdict(collections.Counter)
    opcount = collections.Counter()
    steps = 0
    for e in events:
        if e.get("ph") != "X":
            continue
        name = e.get("name", "?")
        if name.startswith("jit_train_step"):
            steps += 1
            continue
        if not is_op_lane(e.get("pid"), e.get("tid")):
            continue
        if name.startswith("jit_") or name.isdigit():
            continue
        args = e.get("args", {})
        scope = args.get("tf_op", "") + " " + args.get("source", "")
        b = "unmapped"
        for bname, pats in BUCKETS:
            if any(p in scope for p in pats):
                b = bname
                break
        else:
            if scope.strip():
                b = "other_mapped"
        dur = e.get("dur", 0)
        buckets[b] += dur
        key = (name, scope[:140])
        detail[b][key] += dur
        opcount[b] += 1
    return buckets, detail, opcount, max(steps, 1)


def main():
    profile_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    events = load_trace_events(profile_dir)
    buckets, detail, opcount, steps = attribute(events)

    tot = sum(buckets.values())
    print(f"device time: {tot/steps/1e3:.1f} ms/step over {steps} steps\n")
    for b, d in buckets.most_common():
        print(f"  {b:<22} {d/steps/1e3:8.2f} ms/step  {100*d/tot:5.1f}%"
              f"  ({opcount[b]//steps} ops)")
    print("\ntop ops per bucket:")
    for b, _ in buckets.most_common(8):
        print(f"== {b}")
        for (name, scope), d in detail[b].most_common(top_n):
            print(f"   {d/steps/1e3:6.2f} ms  {name[:30]:<30} {scope[:100]}")


if __name__ == "__main__":
    main()
