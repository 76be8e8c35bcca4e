# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Task models: the reference's model zoo on top of the training engine.

Behavioral parity target: /root/reference/nnet/models_zoo.py and
nnet/models.py:24-44 (Classifier). Each class wires a linen network into the
engine and reproduces the reference's compile() defaults (losses, loss
weights, Noam/cosine schedules, optimizer hyperparameters).
"""

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from avec_tpu.models.encoders import (
    AudioEfficientConformerEncoder,
    AudioVisualEfficientConformerEncoder,
    VisualEfficientConformerEncoder,
)
from avec_tpu.models.transformer import GPT_LR, GPTNet
from avec_tpu.train import losses as L
from avec_tpu.train import metrics as M
from avec_tpu.train.model import Model
from avec_tpu.train.optim import Adam, AdamW, gpt_decay_mask
from avec_tpu.train.schedulers import CosineAnnealingScheduler, NoamDecayScheduler


def _noam_adam(params=None):
    """Conformer optimizer (ref: models_zoo.py:53-54 etc.)."""
    lr = NoamDecayScheduler(warmup_steps=10000, dim_decay=360, val_factor=2)
    return Adam(lr=lr, betas=(0.9, 0.98), eps=1e-9, weight_decay=1e-6)


class Classifier(Model):
    """ref: nnet/models.py:24-44."""

    def compile(self, losses=None, loss_weights=None, optimizer="Adam",
                metrics="default", decoders=None):
        if losses is None:
            losses = L.SoftmaxCrossEntropy()
        if metrics == "default":
            metrics = M.CategoricalAccuracy()
        super().compile(losses=losses, loss_weights=loss_weights,
                        optimizer=optimizer, metrics=metrics, decoders=decoders)


class _VisualCENet(nn.Module):
    """LRW net: VO encoder -> time-mean logits (ref: models_zoo.py:40-41)."""

    vocab_size: int = 500

    @nn.compact
    def __call__(self, video, training: bool = False):
        x, _, _ = VisualEfficientConformerEncoder(
            vocab_size=self.vocab_size, interctc_blocks=[],
            name="encoder")(video, None, training=training)
        return x.mean(axis=1)


class VisualEfficientConformerCE(Classifier):
    """LRW 500-word classifier (ref: models_zoo.py:33-62)."""

    def __init__(self, vocab_size: int = 500):
        super().__init__(name="Visual Efficient Conformer CE")
        self.net = _VisualCENet(vocab_size=vocab_size)

    def compile(self, losses=None, loss_weights=None, optimizer="Adam",
                metrics="default", decoders=None):
        if optimizer == "Adam":
            optimizer = _noam_adam()
        super().compile(losses=losses, loss_weights=loss_weights,
                        optimizer=optimizer, metrics=metrics, decoders=decoders)


class _AudioInterCTCNet(nn.Module):
    vocab_size: int = 256
    att_type: str = "patch"
    interctc_blocks: Sequence[int] = (3, 6, 10, 13)
    num_blocks: Sequence[int] = (5, 6, 5)
    use_flash: bool = False
    causal: bool = False
    left_context: Optional[int] = None

    @nn.compact
    def __call__(self, audio, audio_len, training: bool = False,
                 stream_state=None, stream_masks=None):
        encoder = AudioEfficientConformerEncoder(
            vocab_size=self.vocab_size, att_type=self.att_type,
            interctc_blocks=list(self.interctc_blocks),
            num_blocks=list(self.num_blocks),
            use_flash=self.use_flash,
            causal=self.causal, left_context=self.left_context,
            name="encoder")
        if stream_state is not None:
            # Streaming chunk step: audio is a fbank chunk; returns
            # (logits, new_state) for decode/causal_streaming.py.
            logits, _, new_state = encoder(
                audio, audio_len, training=False,
                stream_state=stream_state, stream_masks=stream_masks)
            return logits, new_state
        x, lengths, inter = encoder(audio, audio_len, training=training)
        outputs = {"outputs": [x, lengths]}
        outputs.update(inter)
        return outputs


class AudioEfficientConformerInterCTC(Model):
    """ref: models_zoo.py:64-97.

    causal=True selects the causal-streaming variant (causal stem/conv
    padding + Transformer-XL causal attention bounded to `left_context`
    stage-1 frames) — beyond reference parity; see
    AudioEfficientConformerEncoder and decode/causal_streaming.py."""

    def __init__(self, vocab_size: int = 256, att_type: str = "patch",
                 interctc_blocks: Sequence[int] = (3, 6, 10, 13),
                 num_blocks: Sequence[int] = (5, 6, 5),
                 use_flash: bool = False, causal: bool = False,
                 left_context: Optional[int] = None):
        super().__init__(name="Audio Efficient Conformer Inter CTC")
        self.net = _AudioInterCTCNet(vocab_size=vocab_size, att_type=att_type,
                                     interctc_blocks=tuple(interctc_blocks),
                                     num_blocks=tuple(num_blocks),
                                     use_flash=use_flash, causal=causal,
                                     left_context=left_context)

    def compile(self, losses=None,
                loss_weights=(0.5 / 4, 0.5 / 4, 0.5 / 4, 0.5 / 4, 0.5),
                optimizer="Adam", metrics=None, decoders=None):
        if losses is None:
            losses = L.CTCLoss()
        if optimizer == "Adam":
            optimizer = _noam_adam()
        if isinstance(loss_weights, tuple):
            loss_weights = list(loss_weights)
        super().compile(losses=losses, loss_weights=loss_weights,
                        optimizer=optimizer, metrics=metrics, decoders=decoders)


class _VisualInterCTCNet(nn.Module):
    vocab_size: int = 256
    interctc_blocks: Sequence[int] = (3, 6, 9)
    test_augments: Tuple = ()

    @nn.compact
    def __call__(self, video, video_len, training: bool = False):
        encoder = VisualEfficientConformerEncoder(
            vocab_size=self.vocab_size,
            interctc_blocks=list(self.interctc_blocks), name="encoder")
        x, lengths, inter = encoder(video, video_len, training=training)

        # Test-time augmentation (ref: models_zoo.py:114-122): stack the
        # base and augmented forwards on a new axis for TTA beam search.
        if not training and self.test_augments:
            xs, lens = [x], [lengths]
            for aug in self.test_augments:
                xa, la, _ = encoder(aug(video), video_len, training=False)
                xs.append(xa)
                lens.append(la)
            x = jnp.stack(xs, axis=1)
            lengths = jnp.stack(lens, axis=1)

        outputs = {"outputs": [x, lengths]}
        outputs.update(inter)
        return outputs


class VisualEfficientConformerInterCTC(Model):
    """ref: models_zoo.py:99-147."""

    def __init__(self, vocab_size: int = 256,
                 interctc_blocks: Sequence[int] = (3, 6, 9),
                 test_augments=None):
        super().__init__(name="Visual Efficient Conformer Inter CTC")
        if test_augments is not None and not isinstance(test_augments, (list, tuple)):
            test_augments = [test_augments]
        self.net = _VisualInterCTCNet(
            vocab_size=vocab_size, interctc_blocks=tuple(interctc_blocks),
            test_augments=tuple(test_augments) if test_augments else ())

    def compile(self, losses=None, loss_weights=(0.5 / 3, 0.5 / 3, 0.5 / 3, 0.5),
                optimizer="Adam", metrics=None, decoders=None):
        if losses is None:
            losses = L.CTCLoss()
        if optimizer == "Adam":
            optimizer = _noam_adam()
        if isinstance(loss_weights, tuple):
            loss_weights = list(loss_weights)
        super().compile(losses=losses, loss_weights=loss_weights,
                        optimizer=optimizer, metrics=metrics, decoders=decoders)


class _AVInterCTCNet(nn.Module):
    vocab_size: int = 256
    v_interctc_blocks: Sequence[int] = (3, 6)
    a_interctc_blocks: Sequence[int] = (8, 11)
    f_interctc_blocks: Sequence[int] = (2,)
    v_num_blocks: Sequence[int] = (6, 1)
    a_num_blocks: Sequence[int] = (5, 6, 1)
    f_num_blocks: int = 5
    remat: bool = False
    use_flash: bool = False

    @nn.compact
    def __call__(self, video, video_len, audio, audio_len,
                 training: bool = False):
        x, lengths, inter = AudioVisualEfficientConformerEncoder(
            vocab_size=self.vocab_size,
            v_interctc_blocks=list(self.v_interctc_blocks),
            a_interctc_blocks=list(self.a_interctc_blocks),
            f_interctc_blocks=list(self.f_interctc_blocks),
            v_num_blocks=tuple(self.v_num_blocks),
            a_num_blocks=tuple(self.a_num_blocks),
            f_num_blocks=self.f_num_blocks,
            remat=self.remat, use_flash=self.use_flash,
            name="encoder")(video, video_len, audio, audio_len,
                            training=training)
        outputs = {"outputs": [x, lengths]}
        outputs.update(inter)
        return outputs


class AudioVisualEfficientConformerInterCTC(Model):
    """ref: models_zoo.py:149-182."""

    def __init__(self, vocab_size: int = 256,
                 v_interctc_blocks: Sequence[int] = (3, 6),
                 a_interctc_blocks: Sequence[int] = (8, 11),
                 f_interctc_blocks: Sequence[int] = (2,), remat: bool = False,
                 use_flash: bool = False,
                 v_num_blocks: Sequence[int] = (6, 1),
                 a_num_blocks: Sequence[int] = (5, 6, 1),
                 f_num_blocks: int = 5):
        super().__init__(name="Audio-Visual Efficient Conformer Inter CTC")
        self.net = _AVInterCTCNet(
            vocab_size=vocab_size, v_interctc_blocks=tuple(v_interctc_blocks),
            a_interctc_blocks=tuple(a_interctc_blocks),
            f_interctc_blocks=tuple(f_interctc_blocks), remat=remat,
            use_flash=use_flash, v_num_blocks=tuple(v_num_blocks),
            a_num_blocks=tuple(a_num_blocks), f_num_blocks=f_num_blocks)

    def compile(self, losses=None, loss_weights=None, optimizer="Adam",
                metrics=None, decoders=None):
        if losses is None:
            losses = L.CTCLoss()
        if loss_weights is None:
            loss_weights = {"v_ctc_2": 0.5 / 3, "v_ctc_5": 0.5 / 3,
                            "a_ctc_7": 0.5 / 3, "a_ctc_10": 0.5 / 3,
                            "f_ctc_1": 0.5 / 3, "outputs": 0.5}
        if optimizer == "Adam":
            optimizer = _noam_adam()
        super().compile(losses=losses, loss_weights=loss_weights,
                        optimizer=optimizer, metrics=metrics, decoders=decoders)


class GPT(Classifier):
    """GPT LM (ref: models_zoo.py:184-326)."""

    def __init__(self, vocab_size: int = 25000, padding_idx: Optional[int] = None,
                 max_pos_encoding: int = 2048, model: str = "GPT-Small",
                 pos_embedding: str = "learned", drop_rate: float = 0.1):
        super().__init__(name=model)
        self.model_size = model
        self.net = GPTNet(vocab_size=vocab_size, padding_idx=padding_idx,
                          max_pos_encoding=max_pos_encoding, model=model,
                          pos_embedding=pos_embedding, drop_rate=drop_rate)

    def compile(self, losses=None, loss_weights=None, optimizer="AdamW",
                metrics="default", decoders=None):
        if losses is None:
            losses = L.SoftmaxCrossEntropy(transpose_logits=True)
        if metrics == "default":
            # ref models_zoo.py:275: {"output": [acc, top-10 acc]}.
            metrics = {"output": [M.CategoricalAccuracy(),
                                  M.CategoricalAccuracyTopK(topk=10)]}
        if optimizer == "AdamW":
            # 300B-token recipe (ref models_zoo.py:277-309).
            lr_max, lr_min = GPT_LR[self.model_size]
            lr = CosineAnnealingScheduler(warmup_steps=750, val_max=lr_max,
                                          val_min=lr_min, end_step=520000)
            optimizer = AdamW(lr=lr, betas=(0.9, 0.95), eps=1e-8,
                              weight_decay=0.1, decay_mask=gpt_decay_mask)
        super().compile(losses=losses, loss_weights=loss_weights,
                        optimizer=optimizer, metrics=metrics, decoders=decoders)


model_dict = {
    "Classifier": Classifier,
}
