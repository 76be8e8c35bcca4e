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


def test_train_prng_env_override_pins_legacy_stream(monkeypatch):
    """AVEC_TPU_TRAIN_PRNG=threefry2x32 must reproduce the legacy stream.

    Regression guard for checkpoint-reproducibility claims: fit() folds
    `train_rng` by step (train/model.py), so pinning the folded draws pins
    every dropout/augment draw fit() makes.
    """
    import jax

    from avec_tpu.train.model import Model

    monkeypatch.setenv("AVEC_TPU_TRAIN_PRNG", "threefry2x32")
    model = Model(seed=7)
    legacy = jax.random.PRNGKey(7)
    for step in (1, 2, 17):
        got = jax.random.uniform(
            jax.random.fold_in(model.train_rng, step), (8,))
        want = jax.random.uniform(jax.random.fold_in(legacy, step), (8,))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_train_prng_unknown_impl_warns_and_falls_back(monkeypatch):
    import jax

    from avec_tpu.train.model import Model

    monkeypatch.setenv("AVEC_TPU_TRAIN_PRNG", "definitely-not-a-prng")
    with pytest.warns(RuntimeWarning, match="not a PRNG impl"):
        model = Model(seed=3)
    # Fallback is the raw threefry base key (legacy stream).
    got = jax.random.uniform(jax.random.fold_in(model.train_rng, 1), (4,))
    want = jax.random.uniform(
        jax.random.fold_in(jax.random.PRNGKey(3), 1), (4,))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
