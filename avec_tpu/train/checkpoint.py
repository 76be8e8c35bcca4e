# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Checkpointing with the reference's save/load/partial-load semantics.

Behavioral parity target: /root/reference/nnet/model.py:499-544 and
functions.py:25-44. A checkpoint is one msgpack file holding:

  model_state_dict      flat {path: array} over params + batch_stats
  optimizer_state_dict  optax state pytree (+ model_step, like the reference
                        embeds scheduler step, optimizers.py:77-85)
  model_step            int
  is_distributed        bool (kept for format parity; sharding-agnostic here)
  ema_model_state_dict  flat dict or None

Naming: "checkpoints_epoch_{E}_step_{S}.ckpt" (model.py:562), SWA
"checkpoints_swa-{type}-{a}-{b}.ckpt" (model.py:1011);
find_last_checkpoint picks the max-step file (functions.py:25-44).
Partial loads (e.g. LRW front-end surgery, configs/LRS23/AV/
EffConfInterCTC.py:70-75) use load_state_dict with a key filter/rename.
"""

import glob
import os
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax
from flax import serialization
from flax.traverse_util import flatten_dict, unflatten_dict

SEP = "."


def state_dict_flatten(tree: Any) -> Dict[str, np.ndarray]:
    """Nested pytree -> flat {dotted/path: np.array} (torch-state_dict-like)."""
    if tree is None:
        return {}
    flat = flatten_dict(serialization.to_state_dict(tree), sep=SEP)
    return {k: np.asarray(v) for k, v in flat.items()}


def state_dict_unflatten(flat: Dict[str, np.ndarray]) -> Any:
    return unflatten_dict({k: v for k, v in flat.items()}, sep=SEP)


def save_checkpoint(path: str, model_state: Dict[str, Any],
                    optimizer_state: Any = None, model_step: int = 0,
                    ema_state: Optional[Dict[str, Any]] = None,
                    extra: Optional[Dict[str, Any]] = None):
    payload = {
        "model_state_dict": state_dict_flatten(model_state),
        "optimizer_state_dict": (serialization.to_state_dict(
            jax.tree.map(np.asarray, optimizer_state))
            if optimizer_state is not None else None),
        "model_step": int(model_step),
        "is_distributed": False,
        "ema_model_state_dict": (state_dict_flatten(ema_state)
                                 if ema_state is not None else None),
        "extra": extra or {},
    }
    data = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def restore_tree(template: Any, flat: Dict[str, np.ndarray], strict: bool = True,
                 rename: Optional[Callable[[str], Optional[str]]] = None) -> Any:
    """Load a flat state dict into a pytree shaped like `template`.

    rename maps checkpoint keys -> template keys (None drops the key),
    enabling the reference's partial-load surgery. strict=False tolerates
    missing keys (kept from template) and ignores extra checkpoint keys.
    """
    tmpl_flat = {k: np.asarray(v)
                 for k, v in flatten_dict(
                     serialization.to_state_dict(template), sep=SEP).items()}
    incoming = {}
    for k, v in flat.items():
        k2 = rename(k) if rename is not None else k
        if k2 is None:
            continue
        incoming[k2] = v
    merged = {}
    for k, tv in tmpl_flat.items():
        if k in incoming:
            iv = np.asarray(incoming[k])
            if iv.shape != tv.shape:
                raise ValueError(f"shape mismatch for {k}: ckpt {iv.shape} "
                                 f"vs model {tv.shape}")
            merged[k] = iv.astype(tv.dtype)
        elif strict:
            raise KeyError(f"missing key in checkpoint: {k}")
        else:
            merged[k] = tv
    extra = set(incoming) - set(tmpl_flat)
    if strict and extra:
        raise KeyError(f"unexpected keys in checkpoint: {sorted(extra)[:10]}")
    rebuilt = state_dict_unflatten(merged)
    # flatten_dict drops empty subtrees (e.g. batch_stats == {} for BN-free
    # models like GPT); re-add them so the structure matches the template.
    rebuilt = _merge_missing_empty(serialization.to_state_dict(template),
                                   rebuilt)
    return serialization.from_state_dict(template, rebuilt)


def _merge_missing_empty(tmpl_sd: Any, rebuilt: Any) -> Any:
    """Recursively re-add dict keys present in the template state dict but
    absent from the rebuilt one (only leafless subtrees can be missing)."""
    if not isinstance(tmpl_sd, dict):
        return rebuilt
    out = dict(rebuilt) if isinstance(rebuilt, dict) else {}
    for k, v in tmpl_sd.items():
        if isinstance(v, dict):
            out[k] = _merge_missing_empty(v, out.get(k, {}))
    return out


def find_last_checkpoint(callback_path: str,
                         return_full_path: bool = False) -> Optional[str]:
    """Highest-step "checkpoints_*.ckpt" (ref: functions.py:25-44)."""
    checkpoints = glob.glob(os.path.join(callback_path, "checkpoints_*.ckpt"))
    max_steps, last = 0, None
    for ckpt in checkpoints:
        name = os.path.basename(ckpt)
        try:
            steps = int(name.split("_")[-1].replace(".ckpt", ""))
        except ValueError:
            continue
        if steps > max_steps:
            max_steps, last = steps, name
    if last is not None and return_full_path:
        return os.path.join(callback_path, last)
    return last
