"""End-to-end engine tests: fit/eval/save/load/swa on a tiny CTC model over
the virtual 8-device CPU mesh (data-parallel sharding exercised for real)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from avec_tpu.data.collate import CollateFn
from avec_tpu.data.loader import DataLoader
from avec_tpu.data.synthetic import SyntheticAVDataset
from avec_tpu.models.conformer import ConformerInterCTC
from avec_tpu.ops.layers import Linear
from avec_tpu.ops.masks import make_mask
from avec_tpu.train.losses import CTCLoss
from avec_tpu.train.metrics import WordErrorRate
from avec_tpu.train.model import Model
from avec_tpu.train.optim import Adam
from avec_tpu.train.schedulers import NoamDecayScheduler

VOCAB = 16


class TinyCTCNet(nn.Module):
    """Minimal audio-features -> CTC logits net exercising the conformer
    stack + InterCTC + masks end to end."""

    vocab_size: int = VOCAB

    @nn.compact
    def __call__(self, feats, lengths, training: bool = False):
        # feats: (B, T, 8) pre-extracted features (keep the test fast).
        x = Linear(16)(feats)
        mask = make_mask(x.shape[1], lengths)
        att = {"class": "RelPos1dMultiHeadAttention",
               "params": {"num_heads": 2, "attn_drop_rate": 0.0,
                          "num_pos_embeddings": 64}}
        x, lengths, inter = ConformerInterCTC(
            dim_model=[16, 24], num_blocks=[1, 1], interctc_blocks=[1],
            vocab_size=self.vocab_size, att_params=att, kernel_size=3,
            drop_rate=0.0, conv_stride=2)(x, lengths, mask,
                                          deterministic=not training)
        x = Linear(self.vocab_size)(x)
        out = {"outputs": [x, lengths]}
        out.update(inter)
        return out


class TinyCTCModel(Model):
    def __init__(self):
        super().__init__(name="tiny-ctc")
        self.net = TinyCTCNet()


class FeatureDataset:
    """(feats, feat_len, labels, label_len) samples with a learnable
    feature->token mapping so the loss can actually go down."""

    def __init__(self, n=32, t=24, seed=0):
        self.n, self.t = n, t
        self.seed = seed
        self.shuffle = True
        self.batch_size = 8
        self.collate_fn = CollateFn(
            inputs_params=[{"axis": 0, "padding": True}, {"axis": 1}],
            targets_params=({"axis": 2, "padding": True}, {"axis": 3}))

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rng = np.random.RandomState(self.seed + idx)
        u = rng.randint(2, 5)
        labels = rng.randint(1, VOCAB, size=u).astype(np.int32)
        t = self.t
        # Each label repeated over segments: learnable alignment.
        feats = np.zeros((t, 8), np.float32)
        seg = t // u
        for i, lab in enumerate(labels):
            feats[i * seg:(i + 1) * seg, lab % 8] = 1.0
            feats[i * seg:(i + 1) * seg, (lab // 8) % 8] += 0.5
        return (feats, np.int32(t), labels, np.int32(u))


def _make_model():
    model = TinyCTCModel()
    model.compile(
        losses=CTCLoss(zero_infinity=True, assert_shorter=False),
        loss_weights=[0.3, 0.7],
        optimizer=Adam(lr=NoamDecayScheduler(warmup_steps=50, dim_decay=16,
                                             val_factor=1),
                       betas=(0.9, 0.98), eps=1e-9),
        metrics=None, decoders=None)
    return model


def test_fit_reduces_loss(tmp_path):
    ds = FeatureDataset()
    loader = DataLoader(ds, batch_size=8, drop_last=True, prefetch=0)
    model = _make_model()
    # Capture first/last epoch loss via evaluate.
    model.fit(loader, epochs=1, eval_period_epoch=None, saving_period_epoch=None,
              step_log_period=1000)
    eval_loader = DataLoader(ds, batch_size=8, shuffle=False, prefetch=0)
    losses0, _ = model.evaluate(eval_loader)
    model.fit(loader, epochs=8, initial_epoch=1, eval_period_epoch=None,
              saving_period_epoch=None, step_log_period=1000)
    losses1, _ = model.evaluate(eval_loader)
    # 1 epoch + epochs 1..7 => 8 epochs x 4 steps.
    assert model.model_step == 8 * 4
    assert losses1["loss"] < losses0["loss"], (losses0, losses1)


def test_grad_accumulation_matches_big_batch():
    """A=2 accumulation over B=4 must step the optimizer once per 8 samples
    and produce finite losses."""
    ds = FeatureDataset(n=16)
    loader = DataLoader(ds, batch_size=4, accum=2, drop_last=True, prefetch=0)
    model = _make_model()
    model.fit(loader, epochs=1, accumulated_steps=2, eval_period_epoch=None,
              saving_period_epoch=None, step_log_period=1000)
    assert model.model_step == 2  # 16 samples / (4*2)


def test_save_load_roundtrip(tmp_path):
    ds = FeatureDataset(n=8)
    loader = DataLoader(ds, batch_size=8, drop_last=True, prefetch=0)
    model = _make_model()
    model.fit(loader, epochs=1, eval_period_epoch=None, saving_period_epoch=None,
              step_log_period=1000)
    path = os.path.join(tmp_path, "checkpoints_epoch_1_step_1.ckpt")
    model.save(path)

    model2 = _make_model()
    eval_loader = DataLoader(ds, batch_size=8, shuffle=False, prefetch=0)
    batch = next(iter(eval_loader))
    model2.build(batch["inputs"])
    model2.load(path)
    assert model2.model_step == model.model_step
    l1, _ = model.evaluate(eval_loader)
    l2, _ = model2.evaluate(eval_loader)
    assert abs(l1["loss"] - l2["loss"]) < 1e-5

    # Partial / non-strict load must also work (ref config surgery).
    model3 = _make_model()
    model3.build(batch["inputs"])
    from avec_tpu.train.checkpoint import load_checkpoint, restore_tree

    payload = load_checkpoint(path)
    template = {"params": model3.params, "batch_stats": model3.batch_stats}
    restored = restore_tree(template, payload["model_state_dict"], strict=False)
    assert restored is not None


def test_eval_with_greedy_decoder_and_wer(tmp_path):
    """WER metric through the greedy decoder on-device collapse."""
    from avec_tpu.utils.tokenizer import Tokenizer, train_bpe

    corpus = ["hello world", "the quick brown fox", "jax on tpu"]
    tok = Tokenizer(train_bpe(corpus, VOCAB))
    tok_path = os.path.join(tmp_path, "tok.json")
    tok.save(tok_path)

    from avec_tpu.decode.greedy import CTCGreedySearchDecoder

    ds = FeatureDataset(n=8)
    loader = DataLoader(ds, batch_size=8, shuffle=False, prefetch=0)
    model = TinyCTCModel()
    model.compile(losses=CTCLoss(zero_infinity=True, assert_shorter=False),
                  metrics={"outputs": WordErrorRate()},
                  decoders={"outputs": CTCGreedySearchDecoder(tok_path)},
                  optimizer=Adam(lr=1e-3))
    losses, metrics = model.evaluate(loader, recompute_metrics=True)
    assert "wer" in metrics
    assert metrics["wer"] >= 0.0
    assert np.isfinite(losses["loss"])


def test_swa_cycle(tmp_path):
    ds = FeatureDataset(n=8)
    loader = DataLoader(ds, batch_size=8, drop_last=True, prefetch=0)
    model = _make_model()
    cb = str(tmp_path)
    model.fit(loader, epochs=2, callback_path=cb, eval_period_epoch=None,
              saving_period_epoch=1, step_log_period=1000)
    files = sorted(os.listdir(cb))
    assert any(f.startswith("checkpoints_epoch_1") for f in files)
    assert any(f.startswith("checkpoints_epoch_2") for f in files)
    model.swa(loader, cb, start_epoch=1, end_epoch=2, update_steps=2)
    assert any(f.startswith("checkpoints_swa-equal-1-2") for f in os.listdir(cb))


def test_swa_picks_max_step_per_epoch(tmp_path):
    """With saving_period_step there can be several ckpts per epoch; SWA
    must deterministically pick the end-of-epoch (max-step) one, including
    when the step numbers don't sort lexically (step_2 vs step_10)."""
    ds = FeatureDataset(n=8)
    loader = DataLoader(ds, batch_size=8, drop_last=True, prefetch=0)
    model = _make_model()
    model.build(next(iter(loader))["inputs"])
    cb = str(tmp_path)
    # Mid-epoch ckpt at the init params...
    model.save(os.path.join(cb, "checkpoints_epoch_1_step_2.ckpt"))
    # ...then perturbed params at a higher step (lexically SMALLER name).
    model.params = jax.tree.map(lambda a: a + 1.0, model.params)
    expected = jax.tree.map(np.asarray, model.params)
    model.save(os.path.join(cb, "checkpoints_epoch_1_step_10.ckpt"))
    model.params = jax.tree.map(lambda a: a - 5.0, model.params)
    model.swa(loader, cb, start_epoch=1, end_epoch=1, update_steps=0)
    got = jax.tree.map(np.asarray, model.params)
    for a, b in zip(jax.tree.leaves(expected), jax.tree.leaves(got)):
        np.testing.assert_allclose(a, b)


def test_ema_updates():
    ds = FeatureDataset(n=8)
    loader = DataLoader(ds, batch_size=8, drop_last=True, prefetch=0)
    model = _make_model()
    model.set_ema(0.9)
    model.fit(loader, epochs=2, eval_period_epoch=None,
              saving_period_epoch=None, step_log_period=1000)
    assert model.ema_params is not None
    # EMA params must differ from live params but not be the init.
    d = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), model.params, model.ema_params))
    assert max(d) > 0
    # Reference buffer semantics (nnet/model.py:406-407): BN buffers are
    # COPIED into the EMA model each step, not exponentially averaged.
    # ema_batch_stats must therefore equal the live batch_stats exactly.
    bd = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        model.batch_stats, model.ema_batch_stats))
    assert bd, "test model must have BN batch_stats"
    assert max(bd) == 0.0
