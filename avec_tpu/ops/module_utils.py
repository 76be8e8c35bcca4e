# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Per-module auxiliary losses and info hooks.

Behavioral parity target: /root/reference/nnet/module.py:31-41 (`add_loss`,
`add_info`) harvested by the engine at nnet/model.py:327-336.

Functional equivalent: modules `sow` into dedicated collections; the engine
applies with those collections mutable and folds harvested losses into the
total with their weights.

Usage inside any linen module:

    from avec_tpu.ops.module_utils import add_loss, add_info
    add_loss(self, "commitment", commit_loss, weight=0.25)
    add_info(self, "codebook_usage", usage)
"""

from typing import Any, Dict, Tuple

from flax.traverse_util import flatten_dict

AUX_LOSS_COLLECTION = "aux_losses"
INFO_COLLECTION = "infos"


def add_loss(module, name: str, loss, weight: float = 1.0):
    """ref: nnet/module.py:31-32."""
    module.sow(AUX_LOSS_COLLECTION, name, (loss, weight),
               reduce_fn=lambda prev, cur: cur)


def add_info(module, name: str, value):
    """ref: nnet/module.py:34-35."""
    module.sow(INFO_COLLECTION, name, value, reduce_fn=lambda prev, cur: cur)


def harvest_aux_losses(collections: Dict[str, Any]) -> Dict[str, Tuple[Any, float]]:
    """Flatten a sown aux_losses collection to {name: (loss, weight)}."""
    col = collections.get(AUX_LOSS_COLLECTION)
    if not col:
        return {}
    out = {}
    for path, value in flatten_dict(col).items():
        out[path[-1]] = value
    return out


def harvest_infos(collections: Dict[str, Any]) -> Dict[str, Any]:
    col = collections.get(INFO_COLLECTION)
    if not col:
        return {}
    return {path[-1]: value for path, value in flatten_dict(col).items()}
