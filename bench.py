# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Benchmark: flagship AV training throughput (utterances/sec/chip).

Measures the fully-jitted train step (fbank + SpecAugment + AV encoders +
6 CTC losses + backward + Adam) on the available accelerator at a realistic
workload (B=16, 6 s utterances — LRS utterances average ~2-6 s, capped at
16 s, ref configs/LRS23/AO/EffConfCTC.py:47; B=16 is the better MXU
utilization point, override with BENCH_BATCH).

vs_baseline compares against a PyTorch-CPU baseline (utterances/sec of an
equivalent-compute torch AV conformer train step), measured once on this host
and cached in bench_baseline.json. Prints ONE JSON line.

NOTE on operating points: the CPU baseline runs B=2 while the TPU number is
B=16 — different batches, each reasonable for its hardware (a B=16 torch-CPU
step would mostly measure swap/cache pressure on this 1-core host).
vs_baseline is therefore a cross-stack throughput ratio, valid as the >=5x
floor check, not a matched-batch microbenchmark; BENCH_BATCH=2 reproduces
the matched point if needed.
"""

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 16))
AUDIO_SECONDS = int(os.environ.get("BENCH_AUDIO_SECONDS", 6))
AUDIO_LEN = AUDIO_SECONDS * 16000
LABEL_LEN = 32
WARMUP = int(os.environ.get("BENCH_WARMUP", 3))
STEPS = int(os.environ.get("BENCH_STEPS", 30))
# Median of several timing windows: the TPU tunnel adds jitter that a single
# short window under/over-states by 15-20%.
WINDOWS = int(os.environ.get("BENCH_WINDOWS", 3))
PROFILE_DIR = os.environ.get("BENCH_PROFILE", "")
# TPU v5e (v5litepod) peak: 197 TFLOP/s bf16 per chip.
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12,
              "TPU v6 lite": 918e12}
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def sync_value(out):
    """Force real device completion by FETCHING a value from `out`.

    Over the axon TPU tunnel jax.block_until_ready can acknowledge before
    remote execution completes (verified: 50 chained 4096^3 matmuls "finish"
    in 2 ms under block_until_ready but take ~75 ms when the result value is
    fetched). Fetching a scalar forces a real device round-trip. Every timing
    window in this file MUST end with this call — tests/test_driver_contract
    guards the idiom against refactors.
    """
    import jax

    leaf = jax.tree.leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim])


def timed_windows(step_once, carry, windows, steps, work_per_step):
    """Honest-throughput measurement: dispatch `steps` chained calls of
    `step_once(carry) -> carry`, then sync_value(carry); median rate over
    `windows` windows (the TPU tunnel adds jitter that a single short window
    under/over-states by 15-20%)."""
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            carry = step_once(carry)
        sync_value(carry)
        rates.append(work_per_step * steps / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2], carry


def make_batch(batch_size):
    video_len = AUDIO_LEN // 640 + 1
    rng = np.random.RandomState(0)
    video = rng.rand(batch_size, video_len, 88, 88, 1).astype(np.float32)
    audio = (rng.randn(batch_size, AUDIO_LEN) * 0.1).astype(np.float32)
    labels = rng.randint(1, 256, size=(batch_size, LABEL_LEN)).astype(np.int32)
    inputs = [video, np.full((batch_size,), video_len, np.int32),
              audio, np.full((batch_size,), AUDIO_LEN, np.int32)]
    targets = (labels, np.full((batch_size,), LABEL_LEN, np.int32))
    return {"inputs": inputs, "targets": targets}


def bench_jax():
    import jax

    # Unroll the conformer nn.scan block runs at lowering time: +4.6%
    # measured throughput (120.7 vs 115.4 utt/s/chip at B=16) for a one-time
    # longer compile that the persistent cache amortizes. Set here (not at
    # module scope: importing bench must not flip other code's models); the
    # default is resolved at trace time (models/conformer.py).
    os.environ.setdefault("AVEC_TPU_UNROLL_BLOCKS", "1")

    # Fused FFN Pallas kernel (training path only): measured keep,
    # 227.95 vs 222.26 utt/s/chip at B=16/6 s on the v5e. Single-chip only
    # (a pallas_call is opaque to GSPMD; bench runs a 1-device mesh —
    # multi-device callers go through ops/pallas_ffn.fused_ffn_3d_dp).
    os.environ.setdefault("AVEC_TPU_FUSED_FFN", "1")
    fused_ffn = os.environ["AVEC_TPU_FUSED_FFN"] == "1"
    fused_conv = os.environ.get("AVEC_TPU_FUSED_CONV", "") == "1"

    # Persistent compile cache: the AV train step is a large graph (~15-25 min
    # cold over the TPU tunnel); repeat bench runs must hit the cache.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                         "/tmp/avec_tpu_jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    from avec_tpu.models.zoo import AudioVisualEfficientConformerInterCTC
    from avec_tpu.parallel import mesh as pmesh
    from avec_tpu.train.losses import CTCLoss

    # BENCH_FLASH=1 routes the audio encoder's RelPos1d stages through the
    # Pallas flash kernel — the long-sequence datapoint (BENCH_AUDIO_SECONDS
    # =16 is the configs' cap, configs/LRS23/AO/EffConfCTC.py:47).
    model = AudioVisualEfficientConformerInterCTC(
        use_flash=os.environ.get("BENCH_FLASH", "0") == "1")
    model.compile(losses=CTCLoss(zero_infinity=True, assert_shorter=False))
    model.mesh = pmesh.make_mesh()

    batch = make_batch(BATCH)
    model.build(batch["inputs"], precision="bfloat16")
    train_step = model._build_train_step(accumulated_steps=1,
                                         eval_training=False)
    stacked = model._stack_micro(batch, 1)
    gbatch = pmesh.host_local_batch_to_global(model.mesh, stacked, batch_axis=1)

    state = model._state()
    # Same key construction as Model.fit: train_rng is unsafe_rbg by default
    # (O(1) per-module key derivation vs ~19k scalar threefry ops/step —
    # see train/model.py). Benching with a raw threefry key would time a
    # different program than training runs.
    rng = jax.random.fold_in(model.train_rng, 1)
    for i in range(WARMUP):
        state, (losses, _, _) = train_step(state, gbatch, rng)
    jax.block_until_ready(state["params"])

    # Per-step model FLOPs from the compiled executable (XLA cost analysis).
    # With the fused FFN on, the pallas custom call is opaque to the cost
    # model (it would UNDERCOUNT by ~0.37 TFLOP/step and overstate nothing),
    # so the flops come from compiling the UNFUSED step — identical model
    # math, and a persistent-cache hit since the unfused variant is the
    # historical bench program. MFU therefore stays model-flops-based and
    # comparable across rounds (the fused kernel's in-VMEM recompute is NOT
    # credited to MFU).
    step_flops = None
    try:
        if fused_ffn or fused_conv:
            # EVERY fused-kernel flag must be off for the cost compile —
            # each pallas call is opaque to XLA cost analysis and would
            # undercount model FLOPs (and so understate MFU).
            os.environ["AVEC_TPU_FUSED_FFN"] = "0"
            os.environ["AVEC_TPU_FUSED_CONV"] = "0"
            try:
                cost_step = model._build_train_step(accumulated_steps=1,
                                                    eval_training=False)
                cost = cost_step.lower(state, gbatch,
                                       rng).compile().cost_analysis()
            finally:
                os.environ["AVEC_TPU_FUSED_FFN"] = "1" if fused_ffn else "0"
                os.environ["AVEC_TPU_FUSED_CONV"] = ("1" if fused_conv
                                                     else "0")
        else:
            cost = train_step.lower(state, gbatch,
                                    rng).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        step_flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    if PROFILE_DIR:
        with jax.profiler.trace(PROFILE_DIR):
            for i in range(3):
                state, (losses, _, _) = train_step(state, gbatch, rng)
            jax.block_until_ready(state["params"])
        print(f"profile trace written to {PROFILE_DIR}", file=sys.stderr)

    # Synchronize each window with a VALUE FETCH (sync_value), not
    # block_until_ready — see sync_value's docstring. STEPS=30 amortizes the
    # fetch RTT to <1% of the window.
    float(losses["loss"])  # drain the warmup queue for real

    def train_once(c):
        _, state = c
        state, (losses, _, _) = train_step(state, gbatch, rng)
        return (losses["loss"], state)  # loss first: sync_value fetches it

    utt_per_sec_total, (final_loss, state) = timed_windows(
        train_once, (losses["loss"], state), WINDOWS, STEPS, BATCH)
    final_loss = float(final_loss)

    # Eval (forward-only) throughput -> real-time factor.
    fwd = jax.jit(lambda p, bs, inputs: model.apply_net(p, bs, inputs,
                                                        False, None)[0])
    ebatch = pmesh.host_local_batch_to_global(model.mesh, batch)

    out = fwd(state["params"], state["batch_stats"], ebatch["inputs"])
    sync_value(out)
    eval_rate, _ = timed_windows(
        lambda _: fwd(state["params"], state["batch_stats"],
                      ebatch["inputs"]),
        out, WINDOWS, STEPS, BATCH)

    n_chips = len(jax.devices())
    utt_per_sec = utt_per_sec_total / n_chips
    eval_rtfx = eval_rate * AUDIO_SECONDS / n_chips

    mfu = None
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in PEAK_FLOPS.items() if kind.startswith(k)), None)
    if step_flops and peak:
        mfu = step_flops * (utt_per_sec_total / BATCH) / (n_chips * peak)
    return utt_per_sec, eval_rtfx, final_loss, mfu, step_flops


def bench_torch_cpu_baseline():
    """Equivalent-compute torch-CPU AV conformer train step (the reference's
    stack is pure PyTorch; this measures the same architecture family's
    fwd+bwd on this host's CPU). Cached in bench_baseline.json.

    Measurement: median per-step time over >=6 timed steps (or >=20 s of
    wall clock, whichever comes first) after a warmup step — a single
    outlier step (page cache, thread pool spin-up) cannot skew the cached
    number. Cache is versioned; older 2-step measurements are remeasured."""
    if os.path.isfile(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            cached = json.load(f)
        if cached.get("version", 1) >= 2:
            return cached["torch_cpu_utt_per_sec"]
    import torch
    import torch.nn as nn

    torch.set_num_threads(os.cpu_count() or 1)

    class ConformerBlock(nn.Module):
        def __init__(self, d, k=15):
            super().__init__()
            self.ff1 = nn.Sequential(nn.LayerNorm(d), nn.Linear(d, 4 * d),
                                     nn.SiLU(), nn.Linear(4 * d, d))
            self.att = nn.MultiheadAttention(d, 4, batch_first=True)
            self.ln_att = nn.LayerNorm(d)
            self.conv = nn.Sequential(
                nn.LayerNorm(d))
            self.pw1 = nn.Linear(d, 2 * d)
            self.dw = nn.Conv1d(d, d, k, padding=k // 2, groups=d)
            self.bn = nn.BatchNorm1d(d)
            self.pw2 = nn.Linear(d, d)
            self.ff2 = nn.Sequential(nn.LayerNorm(d), nn.Linear(d, 4 * d),
                                     nn.SiLU(), nn.Linear(4 * d, d))
            self.ln = nn.LayerNorm(d)

        def forward(self, x):
            x = x + 0.5 * self.ff1(x)
            a = self.ln_att(x)
            x = x + self.att(a, a, a, need_weights=False)[0]
            c = nn.functional.glu(self.pw1(self.conv(x)), dim=-1)
            c = self.bn(self.dw(c.transpose(1, 2))).transpose(1, 2)
            x = x + self.pw2(nn.functional.silu(c))
            x = x + 0.5 * self.ff2(x)
            return self.ln(x)

    class TorchAV(nn.Module):
        """Compute-equivalent stand-in: video 3D stem + per-frame ResNet-ish
        trunk + conformer stacks + fusion + CTC head."""

        def __init__(self):
            super().__init__()
            self.vstem = nn.Conv3d(1, 64, (5, 7, 7), (1, 2, 2), (2, 3, 3))
            trunk = []
            ch = 64
            for out, s in [(64, 1), (128, 2), (256, 2), (512, 2)]:
                trunk += [nn.Conv2d(ch, out, 3, s, 1), nn.BatchNorm2d(out),
                          nn.ReLU(), nn.Conv2d(out, out, 3, 1, 1),
                          nn.BatchNorm2d(out), nn.ReLU()]
                ch = out
            self.vtrunk = nn.Sequential(*trunk)
            self.vproj = nn.Linear(512, 256)
            self.vconf = nn.ModuleList([ConformerBlock(256) for _ in range(6)]
                                       + [ConformerBlock(360)])
            self.vexp = nn.Linear(256, 360)
            self.astem = nn.Conv2d(1, 180, 3, 2, 1)
            self.aproj = nn.Linear(180 * 40, 180)
            self.aconf = nn.ModuleList(
                [ConformerBlock(180) for _ in range(5)]
                + [ConformerBlock(256) for _ in range(6)]
                + [ConformerBlock(360)])
            self.aexp1 = nn.Linear(180, 256)
            self.aexp2 = nn.Linear(256, 360)
            self.fusion = nn.Sequential(nn.Linear(720, 1440), nn.SiLU(),
                                        nn.Linear(1440, 360))
            self.fconf = nn.ModuleList([ConformerBlock(360) for _ in range(5)])
            self.head = nn.Linear(360, 256)

        def forward(self, video, mel):
            b, t = video.shape[0], video.shape[2]
            v = torch.relu(self.vstem(video))
            v = nn.functional.max_pool3d(v, (1, 3, 3), (1, 2, 2), (0, 1, 1))
            v = v.transpose(1, 2).reshape(b * t, 64, v.shape[3], v.shape[4])
            v = self.vtrunk(v).mean(dim=(2, 3)).reshape(b, t, 512)
            v = self.vproj(v)
            for i, blk in enumerate(self.vconf):
                if i == 6:
                    v = nn.functional.max_pool1d(
                        self.vexp(v).transpose(1, 2), 2, 2).transpose(1, 2)
                v = blk(v)
            a = torch.relu(self.astem(mel))
            a = a.flatten(1, 2).transpose(1, 2)
            a = self.aproj(a)
            for i, blk in enumerate(self.aconf):
                if i == 5:
                    a = nn.functional.max_pool1d(
                        self.aexp1(a).transpose(1, 2), 2, 2).transpose(1, 2)
                if i == 11:
                    a = nn.functional.max_pool1d(
                        self.aexp2(a).transpose(1, 2), 2, 2).transpose(1, 2)
                a = blk(a)
            n = min(a.shape[1], v.shape[1])
            f = self.fusion(torch.cat([a[:, :n], v[:, :n]], dim=-1))
            for blk in self.fconf:
                f = blk(f)
            return self.head(f)

    model = TorchAV()
    opt = torch.optim.Adam(model.parameters(), lr=1e-4)
    ctc = nn.CTCLoss(zero_infinity=True)

    b = 2
    tv = AUDIO_LEN // 640 + 1
    video = torch.randn(b, 1, tv, 44, 44)  # post-crop 88 -> stem halves to 44
    mel = torch.randn(b, 1, 80, AUDIO_LEN // 160 + 1)
    labels = torch.randint(1, 256, (b, LABEL_LEN))

    def step():
        opt.zero_grad()
        logits = model(video, mel)
        lp = torch.log_softmax(logits, dim=-1).transpose(0, 1)
        tlen = torch.full((b,), logits.shape[1], dtype=torch.long)
        loss = ctc(lp, labels, tlen, torch.full((b,), LABEL_LEN, dtype=torch.long))
        loss.backward()
        opt.step()

    step()  # warmup
    step_times = []
    t0 = time.time()
    while len(step_times) < 6 and (time.time() - t0) < 20.0:
        ts = time.time()
        step()
        step_times.append(time.time() - ts)
    step_times.sort()
    median_dt = step_times[len(step_times) // 2]
    utt_per_sec = b / median_dt
    with open(BASELINE_FILE, "w") as f:
        json.dump({"torch_cpu_utt_per_sec": utt_per_sec,
                   "batch": b, "audio_seconds": AUDIO_SECONDS,
                   "n_steps": len(step_times),
                   "step_times_sec": [round(t, 4) for t in step_times],
                   "version": 2}, f)
    return utt_per_sec


def main():
    baseline = None
    try:
        baseline = bench_torch_cpu_baseline()
    except Exception as e:
        print(f"baseline measurement failed: {e}", file=sys.stderr)

    utt_per_sec, eval_rtfx, loss, mfu, step_flops = bench_jax()
    result = {
        "metric": "train_utterances_per_sec_per_chip",
        "value": round(utt_per_sec, 3),
        "unit": "utt/s/chip",
        "vs_baseline": (round(utt_per_sec / baseline, 2)
                        if baseline else None),
        "eval_rtfx_per_chip": round(eval_rtfx, 1),
        "mfu": round(mfu, 4) if mfu is not None else None,
        "step_tflops": (round(step_flops / 1e12, 3)
                        if step_flops is not None else None),
        "batch": BATCH,
        "audio_seconds": AUDIO_SECONDS,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
