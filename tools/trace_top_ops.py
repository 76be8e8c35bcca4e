# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Summarize a jax.profiler trace: top ops by total device time.

Usage: python tools/trace_top_ops.py /tmp/profile_dir [N]

Reads the chrome-trace json(.gz) files that `jax.profiler.trace` writes under
<dir>/plugins/profile/<run>/, filters to TPU/device lanes, and prints the N
longest-running op names with total/self duration and call counts. This is
the lightweight substitute for the tensorboard profile plugin (absent here).
"""

import collections
import glob
import gzip
import json
import os
import sys


def load_trace_events(profile_dir):
    pats = [os.path.join(profile_dir, "plugins", "profile", "*", "*.trace.json.gz"),
            os.path.join(profile_dir, "plugins", "profile", "*", "*.trace.json"),
            os.path.join(profile_dir, "*.trace.json.gz")]
    files = [f for p in pats for f in glob.glob(p)]
    if not files:
        raise SystemExit(f"no trace files under {profile_dir}")
    events = []
    for f in sorted(files):
        op = gzip.open if f.endswith(".gz") else open
        with op(f, "rt") as fh:
            data = json.load(fh)
        events.extend(data.get("traceEvents", []))
    return events


def summarize(events, top_n=25):
    # Map pid/tid -> lane name so we can keep device (TPU/XLA) lanes only.
    proc_names = {}
    thread_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    def is_device_lane(pid, tid):
        pn = proc_names.get(pid, "")
        tn = thread_names.get((pid, tid), "")
        txt = (pn + " " + tn).lower()
        return ("tpu" in txt or "/device" in txt or "xla op" in txt
                or "tensorflow op" in txt)

    total = collections.Counter()
    count = collections.Counter()
    lane_total = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        pid, tid = e.get("pid"), e.get("tid")
        if not is_device_lane(pid, tid):
            continue
        dur = e.get("dur", 0)  # microseconds
        name = e.get("name", "?")
        total[name] += dur
        count[name] += 1
        lane = (proc_names.get(pid, "?"), thread_names.get((pid, tid), "?"))
        lane_total[lane] += dur
    return total, count, lane_total


def main():
    profile_dir = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    events = load_trace_events(profile_dir)
    total, count, lane_total = summarize(events, top_n)
    grand = sum(total.values())
    print(f"device-lane events: {sum(count.values())}, "
          f"total device time: {grand/1e3:.2f} ms")
    print(f"{'op':<72} {'total_ms':>10} {'%':>6} {'calls':>7}")
    for name, dur in total.most_common(top_n):
        print(f"{name[:72]:<72} {dur/1e3:>10.3f} "
              f"{100.0*dur/max(grand,1):>6.2f} {count[name]:>7}")
    print("\nlanes:")
    for (pn, tn), dur in lane_total.most_common(10):
        print(f"  {pn} / {tn}: {dur/1e3:.2f} ms")


if __name__ == "__main__":
    main()
