"""Aux-loss / info sow hooks harvested by the engine (ref Module.add_loss /
add_info, nnet/module.py:31-41 + nnet/model.py:327-336)."""

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from avec_tpu.data.collate import CollateFn
from avec_tpu.data.loader import DataLoader
from avec_tpu.ops.layers import Linear
from avec_tpu.ops.module_utils import add_info, add_loss
from avec_tpu.train.losses import MeanSquaredError
from avec_tpu.train.model import Model
from avec_tpu.train.optim import Adam


class NetWithAux(nn.Module):
    @nn.compact
    def __call__(self, x, training: bool = False):
        h = Linear(4)(x)
        # A weight-decay-like aux loss the engine must fold into the total.
        add_loss(self, "activity", (h ** 2).mean().astype(jnp.float32),
                 weight=0.5)
        add_info(self, "h_mean", h.mean())
        return Linear(1)(h)


class AuxModel(Model):
    def __init__(self):
        super().__init__(name="aux")
        self.net = NetWithAux()


class TinyRegressionDataset:
    def __init__(self, n=16):
        self.n = n
        self.shuffle = False
        self.batch_size = 8
        self.collate_fn = CollateFn(inputs_params=[{"axis": 0}],
                                    targets_params=[{"axis": 1}])

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        rng = np.random.RandomState(i)
        x = rng.randn(3).astype(np.float32)
        return (x, np.float32(x.sum())[None])


def test_aux_losses_enter_total():
    ds = TinyRegressionDataset()
    loader = DataLoader(ds, batch_size=8, drop_last=True, prefetch=0)
    model = AuxModel()
    model.compile(losses=MeanSquaredError(), optimizer=Adam(lr=1e-3))
    model.fit(loader, epochs=1, eval_period_epoch=None,
              saving_period_epoch=None, step_log_period=1000)
    assert model.model_step == 2

    # Check the harvested structure directly.
    batch = next(iter(loader))
    outputs, _, aux, infos = model.apply_net(
        model.params, model.batch_stats, batch["inputs"], False,
        with_aux=True)
    assert "activity" in aux
    loss, weight = aux["activity"]
    assert weight == 0.5 and float(loss) >= 0
    assert "h_mean" in infos
