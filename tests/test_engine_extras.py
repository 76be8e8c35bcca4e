"""Engine extras: eval_time, save_logits, EMA evaluation, string-spec compile."""

import os

import numpy as np
import pytest

from avec_tpu.data.loader import DataLoader
from tests.test_engine import FeatureDataset, TinyCTCModel, _make_model


def test_eval_time(capsys):
    ds = FeatureDataset(n=8)
    loader = DataLoader(ds, batch_size=8, shuffle=False, prefetch=0)
    model = _make_model()
    stats = model.eval_time(loader, num_evals=2, warmup_eval=True)
    assert set(stats) == {"mean", "std", "min", "max"}
    assert stats["min"] > 0


def test_save_logits(tmp_path):
    ds = FeatureDataset(n=8)
    loader = DataLoader(ds, batch_size=8, shuffle=False, prefetch=0)
    model = _make_model()
    batch = next(iter(loader))
    model.build(batch["inputs"])
    model.save_logits(loader, str(tmp_path))
    assert os.path.isfile(os.path.join(tmp_path, "logits.pkl"))
    assert os.path.isfile(os.path.join(tmp_path, "targets.pkl"))


def test_ema_evaluation_path():
    ds = FeatureDataset(n=8)
    loader = DataLoader(ds, batch_size=8, drop_last=True, prefetch=0)
    model = _make_model()
    model.set_ema(0.5)
    model.fit(loader, epochs=2, eval_period_epoch=None,
              saving_period_epoch=None, step_log_period=1000)
    eval_loader = DataLoader(ds, batch_size=8, shuffle=False, prefetch=0)
    live, _ = model.evaluate(eval_loader)
    ema, _ = model.evaluate(eval_loader, use_ema=True)
    assert np.isfinite(live["loss"]) and np.isfinite(ema["loss"])
    assert abs(live["loss"] - ema["loss"]) > 1e-8  # different params


def test_compile_with_string_specs():
    from avec_tpu.train.model import Model

    m = TinyCTCModel()
    m.compile(losses="CTC", optimizer="Adam", metrics="WordErrorRate",
              decoders="ArgMax")
    assert m.compiled
    assert type(m.compiled_losses).__name__ == "CTCLoss"
    assert type(m.compiled_metrics).__name__ == "WordErrorRate"
    assert type(m.compiled_decoders).__name__ == "ArgMaxDecoder"
