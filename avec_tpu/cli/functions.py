# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""CLI helpers: model/dataset loading, checkpoint discovery.

Behavioral parity target: /root/reference/functions.py. Device selection is
implicit (the JAX platform); DDP setup becomes mesh construction; DataLoader
wiring keeps the dataset-owned batch_size/collate_fn/shuffle contract
(functions.py:111-120) and DistributedSampler semantics (per-process strided
sharding, drop_last train/eval split).
"""

import contextlib
import os
import socket
from typing import Optional

import jax

from avec_tpu.data.loader import DataLoader
from avec_tpu.parallel import mesh as pmesh
from avec_tpu.train.checkpoint import find_last_checkpoint
from avec_tpu.utils.tokenizer import train_tokenizer  # noqa: F401 (re-export)


def load_model(args):
    """ref: functions.py:46-103."""
    model = args.config.model
    if args.rank == 0:
        print(f"Rank {args.rank} devices: {jax.devices()}")

    model.mesh = pmesh.make_mesh()

    # EMA (ref :67-69; engine tracks EMA inside the train step, all ranks).
    if hasattr(args.config, "ema_tau"):
        model.set_ema(args.config.ema_tau)

    args.config.callback_path = getattr(
        args.config, "callback_path",
        os.path.join("callbacks",
                     "/".join(args.config_file.replace(".py", "").split("/")[1:])))

    if args.load_last:
        last = find_last_checkpoint(args.config.callback_path)
        if last is not None:
            args.checkpoint = last

    # Deferred checkpoint load: the engine builds lazily on the first batch,
    # so remember the path and let main() trigger it after build.
    args.checkpoint_path = (os.path.join(args.config.callback_path,
                                         args.checkpoint)
                            if args.checkpoint is not None else None)

    if args.rank == 0:
        model.summary(show_dict=args.show_dict, show_modules=args.show_modules)
    return model


def _make_loader(dataset, args, drop_last):
    n_proc = jax.process_count()
    # Global batch = per-replica batch x data-parallel degree (DDP parity:
    # the reference runs batch_size per GPU).
    ndev = max(len(jax.devices()) // n_proc, 1)
    accum = getattr(args.config, "accumulated_steps", 1) if drop_last else 1
    return DataLoader(
        dataset,
        batch_size=dataset.batch_size * ndev,
        collate_fn=dataset.collate_fn,
        drop_last=drop_last,
        num_replicas=n_proc,
        rank=jax.process_index(),
        accum=accum,
        num_workers=args.num_workers,
        # Length-bucketed batches for training when the dataset knows its
        # sample lengths (smaller pads, fewer XLA shapes); eval keeps the
        # natural order for reproducible per-batch metrics.
        bucket_by_length=drop_last and getattr(args.config,
                                               "bucket_by_length", True),
    )


def load_datasets(args):
    """ref: functions.py:105-185."""
    dataset_train = None
    if hasattr(args.config, "training_dataset"):
        dataset_train = _make_loader(args.config.training_dataset, args,
                                     drop_last=True)
        if args.rank == 0:
            ds = dataset_train.dataset
            print(f"Training Dataset: {ds.__class__.__name__}, "
                  f"{len(ds):,} samples - {len(dataset_train):,} batches - "
                  f"batch size {dataset_train.batch_size}")

    dataset_eval = None
    if hasattr(args.config, "evaluation_dataset"):
        cfg_eval = args.config.evaluation_dataset
        if isinstance(cfg_eval, list):
            dataset_eval = [_make_loader(d, args, drop_last=False)
                            for d in cfg_eval]
            if args.rank == 0:
                for dl in dataset_eval:
                    print(f"Evaluation Dataset: {dl.dataset.__class__.__name__}, "
                          f"{len(dl.dataset):,} samples - {len(dl):,} batches")
        else:
            dataset_eval = _make_loader(cfg_eval, args, drop_last=False)
            if args.rank == 0:
                print(f"Evaluation Dataset: {dataset_eval.dataset.__class__.__name__}, "
                      f"{len(dataset_eval.dataset):,} samples - "
                      f"{len(dataset_eval):,} batches")
    return dataset_train, dataset_eval


def get_open_port():
    """ref: functions.py:187-191."""
    with contextlib.closing(socket.socket(socket.AF_INET, socket.SOCK_STREAM)) as s:
        s.bind(("", 0))
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        return s.getsockname()[1]
