"""LRW -> VO/AV front-end checkpoint surgery (the reference's partial load,
configs/LRS23/AV/EffConfInterCTC.py:70-75)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avec_tpu.models.zoo import (
    VisualEfficientConformerCE,
    VisualEfficientConformerInterCTC,
)
from avec_tpu.train.checkpoint import load_checkpoint, state_dict_flatten


@pytest.mark.slow
def test_lrw_frontend_partial_load(tmp_path):
    video = jnp.zeros((1, 4, 88, 88, 1), jnp.float32)

    # "Pretrain" the LRW classifier (just init + save).
    lrw = VisualEfficientConformerCE(vocab_size=500)
    lrw.compile(optimizer="Adam")
    lrw.build(video)
    ckpt_path = os.path.join(tmp_path, "checkpoints_epoch_30_step_57247.ckpt")
    lrw.save(ckpt_path)

    # Load only front_end keys into the VO sentence model.
    payload = load_checkpoint(ckpt_path)
    front_keys = {k: v for k, v in payload["model_state_dict"].items()
                  if "front_end" in k}
    assert front_keys, "expected front_end params in the LRW checkpoint"

    vo = VisualEfficientConformerInterCTC(vocab_size=256)
    vo.compile(optimizer="Adam")
    vo.pending_partial_load = {"state_dict": front_keys, "rename": None}
    vo.build([video, jnp.array([4])])

    vo_flat = state_dict_flatten({"params": vo.params,
                                  "batch_stats": vo.batch_stats})
    matched = 0
    for k, v in front_keys.items():
        assert k in vo_flat, k
        np.testing.assert_array_equal(vo_flat[k], np.asarray(v))
        matched += 1
    assert matched > 10
