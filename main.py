# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Experiment driver CLI.

Behavioral parity target: /root/reference/main.py. Same flags, same modes
(training / evaluation / swa / pass / eval_time), same config contract: the
-c file is imported as a Python module whose globals define the (compiled)
model, datasets and engine hyperparameters (read with getattr fallbacks,
ref main.py:66-106).

Distribution: instead of torch.multiprocessing.spawn + NCCL process groups
(main.py:179-190), one process drives all local devices through the GSPMD
mesh; multi-host runs launch one process per host with --coordinator/--
num_processes/--process_id (jax.distributed).
"""

import argparse
import importlib
import os
import sys

import jax

# Honor JAX_PLATFORMS before any device query: in this environment the TPU
# plugin pins the platform at import time and the env var alone is silently
# ignored (see tests/conftest.py for the same override).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def main(args):
    from avec_tpu.cli import functions
    from avec_tpu.parallel import mesh as pmesh

    args.rank = jax.process_index()
    if args.rank == 0:
        print(f"Mode: {args.mode}")

    # Load config module (side effects build + compile the model,
    # ref main.py:49).
    sys.path.insert(0, os.getcwd())
    args.config = importlib.import_module(
        args.config_file.replace(".py", "").replace("/", "."))

    model = functions.load_model(args)
    dataset_train, dataset_eval = functions.load_datasets(args)

    precision = getattr(args.config, "precision", None)

    # Deferred checkpoint load (engine builds from a sample batch first).
    if getattr(args, "checkpoint_path", None):
        probe = dataset_train or (dataset_eval[0] if isinstance(dataset_eval, list)
                                  else dataset_eval)
        batch = next(iter(probe))
        accum = getattr(args.config, "accumulated_steps", 1)
        micro = jax.tree.map(
            lambda x: x[: max(x.shape[0] // accum, 1)] if hasattr(x, "ndim") and x.ndim else x,
            batch)
        model.build(micro["inputs"], precision=precision)
        model.load(args.checkpoint_path)

    assert args.mode in ["training", "evaluation", "swa", "pass", "eval_time"]

    # Profiling (SURVEY §5: the reference has only eval_time; we add real
    # tracing): --profile writes a TensorBoard-viewable XLA trace.
    profile_ctx = None
    if args.profile:
        trace_dir = os.path.join(args.config.callback_path, "profile")
        os.makedirs(trace_dir, exist_ok=True)
        jax.profiler.start_trace(trace_dir)
        print(f"Profiling to {trace_dir}")

    if args.mode == "training":
        model.fit(
            dataset_train=dataset_train,
            epochs=(args.epochs if args.epochs is not None
                    else getattr(args.config, "epochs", 1000)),
            dataset_eval=dataset_eval,
            eval_steps=getattr(args.config, "eval_steps", args.eval_steps),
            verbose_eval=args.verbose_eval,
            initial_epoch=(int(args.checkpoint.split("_")[2])
                           if args.checkpoint is not None else 0),
            callback_path=args.config.callback_path,
            steps_per_epoch=args.steps_per_epoch,
            precision=precision,
            accumulated_steps=getattr(args.config, "accumulated_steps", 1),
            eval_period_step=getattr(args.config, "eval_period_step",
                                     args.eval_period_step),
            eval_period_epoch=getattr(args.config, "eval_period_epoch",
                                      args.eval_period_epoch),
            saving_period_step=getattr(args.config, "saving_period_step",
                                       args.saving_period_step),
            saving_period_epoch=getattr(args.config, "saving_period_epoch",
                                        args.saving_period_epoch),
            step_log_period=args.step_log_period,
            eval_training=getattr(args.config, "eval_training",
                                  not args.no_eval_training),
            dist_log=args.dist_log,
            grad_init_scale=getattr(args.config, "grad_init_scale", None),
            detect_anomaly=getattr(args.config, "detect_anomaly",
                                   args.detect_anomaly),
            recompute_metrics=getattr(args.config, "recompute_metrics", False),
        )
    elif args.mode == "evaluation":
        model._evaluate(
            dataset_eval, writer=None, step=None,
            eval_steps=getattr(args.config, "eval_steps", args.eval_steps),
            verbose=args.verbose_eval,
            recompute_metrics=getattr(args.config, "recompute_metrics", False),
        )
    elif args.mode == "swa":
        model.swa(dataset_train, callback_path=args.config.callback_path,
                  start_epoch=args.swa_epochs[0] if args.swa_epochs else None,
                  end_epoch=args.swa_epochs[1] if args.swa_epochs else None,
                  epochs_list=args.swa_epochs_list,
                  update_steps=args.steps_per_epoch, swa_type=args.swa_type,
                  precision=precision)
    elif args.mode == "pass":
        pass
    elif args.mode == "eval_time":
        eval_time = model.eval_time(
            dataset_eval if not isinstance(dataset_eval, list) else dataset_eval[0],
            eval_steps=getattr(args.config, "eval_steps", args.eval_steps))
        if args.rank == 0:
            print(f"Eval time: {eval_time}")

    if args.profile:
        jax.profiler.stop_trace()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config_file", type=str,
                        default="configs/LRS23/AV/EffConfInterCTC.py",
                        help="Python configuration file containing model hyperparameters")
    parser.add_argument("-m", "--mode", type=str, default="training",
                        help="Mode : training, evaluation, swa, pass, eval_time")
    parser.add_argument("-i", "--checkpoint", type=str, default=None,
                        help="Load model from checkpoint name")
    parser.add_argument("-j", "--num_workers", type=int, default=0,
                        help="Number of data loading workers")
    parser.add_argument("--cpu", action="store_true", help="Run on CPU devices")
    parser.add_argument("--load_last", action="store_true",
                        help="Load last model checkpoint")

    # Distributed (multi-host)
    parser.add_argument("-d", "--distributed", action="store_true",
                        help="Multi-host distributed run (jax.distributed)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="Coordinator address host:port")
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--dist_log", action="store_true",
                        help="Log every process instead of only process 0")

    # Training
    parser.add_argument("--epochs", type=int, default=None,
                        help="Override config epochs")
    parser.add_argument("--steps_per_epoch", type=int, default=None)
    parser.add_argument("--saving_period_step", type=int, default=None)
    parser.add_argument("--saving_period_epoch", type=int, default=1)
    parser.add_argument("--step_log_period", type=int, default=100)
    parser.add_argument("--no_eval_training", action="store_true")

    # Eval
    parser.add_argument("--eval_period_epoch", type=int, default=1)
    parser.add_argument("--eval_period_step", type=int, default=None)
    parser.add_argument("--batch_size_eval", type=int, default=None)
    parser.add_argument("--verbose_eval", type=int, default=0)
    parser.add_argument("--eval_steps", type=int, default=None)

    # Info
    parser.add_argument("--show_dict", action="store_true")
    parser.add_argument("--show_modules", action="store_true")

    # SWA
    parser.add_argument("--swa_epochs", nargs="+", default=None)
    parser.add_argument("--swa_epochs_list", nargs="+", default=None)
    parser.add_argument("--swa_type", type=str, default="equal")

    # Debug
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--profile", action="store_true",
                        help="Write an XLA profiler trace under callback_path")

    args = parser.parse_args()

    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    if args.distributed and args.num_processes:
        jax.distributed.initialize(coordinator_address=args.coordinator,
                                   num_processes=args.num_processes,
                                   process_id=args.process_id)
    main(args)
