# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""One-command offline lifecycle — the closest offline analogue of the
reference's eval_models.sh (/root/reference/eval_models.sh:1-20, which needs
the network-gated released checkpoints).

Drives main.py through the FULL mode chain on the learnable synthetic
tone-speech dataset (configs/Synthetic/):

  1. evaluation  (random init — the WER baseline to beat)
  2. training    (GPT-Tiny LM on the tone corpus -> rescorer checkpoint)
  3. training    (AO conformer, periodic eval + checkpoints per epoch)
  4. swa         (average the epoch checkpoints, BN re-estimation)
  5. evaluation  (SWA checkpoint; beam 8 + estimated 2-gram ARPA + GPT
                  rescoring, recompute_metrics=True exact corpus WER)

Asserts the final WER is finite and improved over init. Runtime is
compile-dominated on the 1-core CPU host (~30-45 min cold, much less with a
warm /tmp/avec_tpu_jax_cache); pass --steps to change the training budget.

--av runs the AUDIO-VISUAL chain instead (configs/Synthetic/AV-Tone.py):
same modes, but the dataset's audio is ambiguous by construction (tokens t
and t+15 sound identical; only the video pattern disambiguates), so a WER
collapse proves the Conv3d stem + ResNet18 + video conformer + FusionModule
path trains — including SWA BN re-estimation over video BN layers. This is
the offline analogue of the reference's released VO/AV checkpoints
(/root/reference/README.md:152-153).

Usage: python tools/lifecycle_demo.py [--steps 400] [--skip_lm] [--av]
"""

import argparse
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ)
ENV.setdefault("JAX_PLATFORMS", os.environ.get("LIFECYCLE_PLATFORM", "cpu"))


def run_main(*args, timeout=7200):
    cmd = [sys.executable, "main.py", *args]
    print(f"[lifecycle] $ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=ENV, capture_output=True,
                       text=True, timeout=timeout)
    print(f"[lifecycle]   -> rc={r.returncode} in {time.time()-t0:.0f}s",
          flush=True)
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-5000:])
        raise SystemExit(f"main.py {args} failed")
    return r.stdout


def last_wer(stdout: str) -> float:
    wers = re.findall(r"eval wer: ([0-9.]+)", stdout)
    assert wers, f"no WER in output:\n{stdout[-2000:]}"
    return float(wers[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800,
                    help="AO training steps total (2 epochs)")
    ap.add_argument("--skip_lm", action="store_true",
                    help="skip the GPT-rescorer leg (beam+ARPA only)")
    ap.add_argument("--fresh", action="store_true",
                    help="delete callbacks/Synthetic before starting")
    ap.add_argument("--av", action="store_true",
                    help="run the audio-visual chain (AV-Tone.py)")
    ap.add_argument("--causal", action="store_true",
                    help="run the causal-streaming chain (AO-Tone-Causal.py:"
                         " train -> eval -> streaming==offline check on the"
                         " trained weights)")
    args = ap.parse_args()

    if args.fresh:
        shutil.rmtree(os.path.join(REPO, "callbacks/Synthetic"),
                      ignore_errors=True)

    name = ("AO-Tone-Causal" if args.causal
            else "AV-Tone" if args.av else "AO-Tone")
    cfg = f"configs/Synthetic/{name}.py"
    spe = max(args.steps // 2, 1)

    if args.causal:
        # Causal chain: init eval -> train -> eval -> streaming==offline on
        # the TRAINED weights (greedy stack; commits are final by causality).
        out = run_main("-c", cfg, "-m", "evaluation")
        wer_init = last_wer(out)
        print(f"[lifecycle] causal init WER {wer_init:.2f}%", flush=True)
        run_main("-c", cfg, "-m", "training",
                 "--steps_per_epoch", str(spe), "--epochs", "2",
                 "--step_log_period", "50")
        out = run_main("-c", cfg, "-m", "evaluation", "--load_last")
        wer_final = last_wer(out)
        print(f"[lifecycle] causal WER init {wer_init:.2f}% -> final "
              f"{wer_final:.2f}%", flush=True)
        assert wer_final < wer_init, (wer_final, wer_init)
        r = subprocess.run(
            [sys.executable, "tools/causal_streaming_check.py",
             "--config", cfg], cwd=REPO, env=ENV, capture_output=True,
            text=True, timeout=7200)
        print(r.stdout, flush=True)
        if r.returncode != 0:
            print(r.stderr[-4000:])
            raise SystemExit("causal streaming check failed")
        print("[lifecycle] PASS: causal train -> eval -> exact streaming "
              "on trained weights", flush=True)
        return

    # 1. Random-init evaluation: the baseline WER (beam + ARPA, no LM ckpt
    #    yet so no rescorer — the comparison target is the final number).
    out = run_main("-c", cfg, "-m", "evaluation")
    wer_init = last_wer(out)
    print(f"[lifecycle] init WER {wer_init:.2f}%", flush=True)

    # 2. LM leg: 1 epoch of GPT-Tiny on the tone corpus.
    if not args.skip_lm:
        run_main("-c", "configs/Synthetic/LM-Tone.py", "-m", "training",
                 "--steps_per_epoch", "30", "--epochs", "1",
                 "--step_log_period", "10")

    # 3. AO training: 2 epochs with per-epoch eval + checkpoints.
    run_main("-c", cfg, "-m", "training",
             "--steps_per_epoch", str(spe), "--epochs", "2",
             "--step_log_period", "50")

    # 4. SWA over the two epoch checkpoints (+ BN re-estimation pass).
    run_main("-c", cfg, "-m", "swa", "--swa_epochs", "1", "2")

    # 5. Full-stack evaluation of the SWA checkpoint: beam + ARPA (+ GPT
    #    rescoring now that LM-Tone has a checkpoint) + exact corpus WER.
    swa = [f for f in os.listdir(os.path.join(REPO, "callbacks/Synthetic",
                                              name))
           if f.startswith("checkpoints_swa")]
    assert swa, "swa produced no checkpoint"
    out = run_main("-c", cfg, "-m", "evaluation",
                   "--checkpoint", sorted(swa)[-1])
    wer_final = last_wer(out)

    print(f"[lifecycle] WER init {wer_init:.2f}% -> final {wer_final:.2f}%",
          flush=True)
    assert wer_final == wer_final and wer_final < float("inf")
    assert wer_final < wer_init, (wer_final, wer_init)
    print("[lifecycle] PASS: full training->swa->beam+LM evaluation chain, "
          "WER improved over init", flush=True)


if __name__ == "__main__":
    main()
