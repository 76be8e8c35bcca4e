# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Per-op roofline bound from a profile trace + the optimized HLO dump.

For VERDICT r4 item 1's "quantified structural bound": for every hot op in
a chosen bucket this joins

  * measured device time (jax.profiler trace, tools/trace_top_ops.py), with
  * HBM bytes = sum of operand + output buffer sizes parsed from the
    POST-FUSION HLO (tools/dump_hlo.py output — a fusion's internal values
    never touch HBM, so its operands/outputs ARE the traffic), and
  * MXU FLOPs for convolution/dot ops (2 * out_elems * K-reduction),

and prints measured vs max(bytes/peak_BW, flops/peak_MXU) per op plus the
bucket total — i.e., how far the bucket sits from the combined roofline and
the MAXIMUM time a perfect hand kernel could recover assuming no reuse
beyond fusion boundaries.

Usage:
  BENCH_PROFILE=/tmp/prof BENCH_WINDOWS=1 python bench.py
  python tools/dump_hlo.py /tmp/av_step.hlo.txt
  python tools/roofline.py /tmp/prof /tmp/av_step.hlo.txt front_end_resnet

v5e peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""

import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_top_ops import load_trace_events  # noqa: E402

PEAK_FLOPS = float(os.environ.get("ROOFLINE_PEAK_FLOPS", 197e12))
PEAK_BW = float(os.environ.get("ROOFLINE_PEAK_BW", 819e9))

DTYPE_BYTES = {"pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2,
               "f16": 2, "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8,
               "f64": 8, "c64": 8, "c128": 16}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_DEF_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.+)$")


def shape_bytes(shape_str):
    """Total bytes of an HLO shape string ('bf16[16,151,80]{..}' or a
    tuple '(f32[8], bf16[4,4])')."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def parse_hlo(path):
    """name -> (own shape string, rhs text). Includes fusion bodies."""
    defs = {}
    with open(path) as f:
        for line in f:
            m = _DEF_RE.match(line)
            if not m:
                continue
            name, rhs = m.group(1), m.group(2)
            defs[name] = rhs
    return defs


def op_shape(rhs):
    """The defined value's shape = leading shape token(s) of the rhs."""
    # rhs starts with the shape, e.g. 'bf16[16,151]{1,0} fusion(...)'.
    depth = 0
    for i, ch in enumerate(rhs):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == " " and depth == 0:
            return rhs[:i]
    return rhs


def operand_names(rhs):
    """Operand value names referenced by an op line."""
    call = rhs.find("(")
    if call < 0:
        return []
    # take the top-level parenthesized arg list
    depth = 0
    for i in range(call, len(rhs)):
        if rhs[i] == "(":
            depth += 1
        elif rhs[i] == ")":
            depth -= 1
            if depth == 0:
                args = rhs[call + 1: i]
                break
    else:
        return []
    return re.findall(r"%([\w.\-]+)", args)


def conv_flops(rhs, defs):
    """FLOPs of a convolution op line (2 * out_elems * cin/g * prod(k))."""
    m = re.search(r"window={size=([\dx]+)", rhs)
    out = op_shape(rhs)
    dts = _SHAPE_RE.findall(out)
    if not m or not dts:
        return 0
    k = 1
    for d in m.group(1).split("x"):
        k *= int(d)
    out_elems = 1
    for d in dts[0][1].split(","):
        if d:
            out_elems *= int(d)
    ops = operand_names(rhs)
    cin = 1
    if len(ops) >= 2 and ops[1] in defs:
        # kernel shape [*spatial, cin/g, cout] under default dim_labels
        kdims = _SHAPE_RE.findall(op_shape(defs[ops[1]]))
        if kdims:
            dims = [int(d) for d in kdims[0][1].split(",") if d]
            if len(dims) >= 2:
                cin = dims[-2]
    g = 1
    gm = re.search(r"feature_group_count=(\d+)", rhs)
    if gm:
        g = int(gm.group(1))
        _ = g  # cin already per-group in the kernel shape
    return 2 * out_elems * cin * k


def dot_flops(rhs, defs):
    """FLOPs of a dot op: 2 * out_elems * contracted size."""
    ops = operand_names(rhs)
    if not ops or ops[0] not in defs:
        return 0
    m = re.search(r"lhs_contracting_dims={([\d,]+)}", rhs)
    if not m:
        return 0
    lhs_shape = _SHAPE_RE.findall(op_shape(defs[ops[0]]))
    if not lhs_shape:
        return 0
    lhs_dims = [int(d) for d in lhs_shape[0][1].split(",") if d]
    kred = 1
    for ci in m.group(1).split(","):
        kred *= lhs_dims[int(ci)]
    out = _SHAPE_RE.findall(op_shape(rhs))
    out_elems = 1
    if out:
        for d in out[0][1].split(","):
            if d:
                out_elems *= int(d)
    return 2 * out_elems * kred


def fusion_flops(name, rhs, defs):
    """FLOPs of a fusion = sum over conv/dot ops in its called computation.
    HLO text lists the body ops with names; we approximate by scanning all
    defs whose rhs mentions the fused computation name."""
    m = re.search(r"calls=%?([\w.\-]+)", rhs)
    total = 0
    if not m:
        return 0
    # Body ops were parsed into defs too (they are '%x = ...' lines).
    # We cannot easily scope them; instead rely on convention: fusion
    # bodies' conv/dot ops are rare (TPU keeps convs unfused) — report 0.
    return total


def main():
    if len(sys.argv) < 4:
        print(__doc__)
        raise SystemExit(1)
    prof_dir, hlo_path, bucket = sys.argv[1], sys.argv[2], sys.argv[3]
    steps = float(sys.argv[4]) if len(sys.argv) > 4 else None

    defs = parse_hlo(hlo_path)
    events = load_trace_events(prof_dir)

    # Aggregate device time by op name, filtered to the bucket substring
    # (matched against the tf_op scope path like profile_step.py).
    time_by_op = collections.defaultdict(float)
    count_by_op = collections.defaultdict(int)
    scope_by_op = {}
    for ev in events:
        tf_op = ev.get("tf_op", "")
        if bucket not in tf_op and bucket not in ev["name"]:
            continue
        time_by_op[ev["name"]] += ev["dur_us"]
        count_by_op[ev["name"]] += 1
        scope_by_op[ev["name"]] = tf_op[-60:]

    rows = []
    tot_t = tot_bound = 0.0
    for name, t_us in sorted(time_by_op.items(), key=lambda kv: -kv[1]):
        base = name.split("/")[-1]
        rhs = defs.get(base)
        if rhs is None:
            # trace names sometimes prefix module: try suffix match
            cands = [k for k in defs if k == base or base.endswith(k)]
            rhs = defs.get(cands[0]) if cands else None
        if rhs is None:
            rows.append((name, t_us, None, None, None))
            tot_t += t_us
            continue
        out_b = shape_bytes(op_shape(rhs))
        in_b = sum(shape_bytes(op_shape(defs[o])) for o in operand_names(rhs)
                   if o in defs)
        fl = 0
        if " convolution(" in rhs or rhs.startswith("convolution"):
            fl = conv_flops(rhs, defs)
        elif " dot(" in rhs:
            fl = dot_flops(rhs, defs)
        bytes_total = in_b + out_b
        n = count_by_op[name]
        bound_us = max(bytes_total / PEAK_BW, fl / PEAK_FLOPS) * 1e6 * n
        rows.append((name, t_us, bytes_total, fl, bound_us))
        tot_t += t_us
        tot_bound += bound_us

    print(f"bucket '{bucket}': measured {tot_t/1e3:.2f} ms, roofline bound "
          f"{tot_bound/1e3:.2f} ms -> recoverable <= "
          f"{(tot_t - tot_bound)/1e3:.2f} ms "
          f"({100*(1 - tot_bound/max(tot_t,1e-9)):.0f}%)")
    print(f"{'op':42s} {'t_us':>9s} {'GB':>7s} {'GFLOP':>8s} {'bound_us':>9s} {'x':>5s}")
    for name, t_us, b, fl, bound in rows[:25]:
        if b is None:
            print(f"{name[:42]:42s} {t_us:9.0f}   (no HLO match)")
            continue
        x = t_us / bound if bound else float("inf")
        print(f"{name[:42]:42s} {t_us:9.0f} {b/1e9:7.3f} {fl/1e9:8.2f} "
              f"{bound:9.0f} {x:5.1f}")


if __name__ == "__main__":
    main()
