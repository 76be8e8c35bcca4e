# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Efficient Conformer encoders: audio, visual, audio-visual.

Behavioral parity targets:
  AudioEfficientConformerEncoder       /root/reference/nnet/networks.py:309-440
  VisualEfficientConformerEncoder      /root/reference/nnet/networks.py:442-512
  AudioVisualEfficientConformerEncoder /root/reference/nnet/networks.py:514-579

Layouts are channels-last: audio (B, Ta) raw waveform; video
(B, Tv, H, W, C). Time downsampling: audio 100 Hz -> 50 (conv stem) -> 25 ->
12.5 Hz across stages (dims 180 -> 256 -> 360); video 25 Hz -> 12.5 Hz.
Masks are built once from lengths and re-strided per stage.
"""

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from avec_tpu.models.conformer import ConformerInterCTC, ConvNeuralNetwork, FusionModule
from avec_tpu.models.resnet import ResNet
from avec_tpu.ops.audio import AudioPreprocessing, SpecAugment
from avec_tpu.ops.inits import get_init, torch_default_bias
from avec_tpu.ops.layers import Linear, conv_padding, max_pool, _polyphase_fold
from avec_tpu.ops.masks import make_mask


def _fused_stem_auto() -> bool:
    """Fused Pallas stem default: on for a single TPU device (the
    pallas_calls carry no partitioning rule yet, so multi-device meshes
    keep the XLA polyphase path)."""
    try:
        devs = jax.devices()
        return len(devs) == 1 and "tpu" in devs[0].device_kind.lower()
    except Exception:
        return False


class _StemConvParams(nn.Module):
    """Parameter container matching ops.layers.Conv's declarations for the
    stem conv (kernel (5,7,7,1,64) torch-default init, bias fan_in=245)."""

    @nn.compact
    def __call__(self):
        ks = (5, 7, 7)
        kernel = self.param("kernel", get_init("default"), ks + (1, 64))
        bias = self.param("bias", torch_default_bias(int(np.prod(ks))),
                          (64,))
        return kernel, bias


class _StemBNParams(nn.Module):
    """Parameter/stat container matching ops.layers.BatchNorm."""

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (64,))
        bias = self.param("bias", nn.initializers.zeros, (64,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((64,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((64,), jnp.float32))
        return scale, bias, ra_mean, ra_var


class FusedVideoStem(nn.Module):
    """Drop-in stem (Conv3d 1->64 + BN + ReLU + MaxPool) backed by the
    fused Pallas kernels (ops/pallas_stem.py).

    Declares parameters under the SAME names/shapes as the
    ConvNeuralNetwork + BatchNorm path (conv_0/{kernel,bias},
    BatchNorm_0/{scale,bias} + batch_stats mean/var), so checkpoints and
    the torch converter are unaffected by the compute path.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    interpret: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from avec_tpu.ops import pallas_stem as ps

        ks, strides = (5, 7, 7), (1, 2, 2)
        kernel, bias = _StemConvParams(name="conv_0")()
        scale, bn_bias, ra_mean, ra_var = _StemBNParams(name="BatchNorm_0")()

        b, t = x.shape[0], x.shape[1]
        pads = conv_padding(ks, "same")
        xp, kp, _ = _polyphase_fold(x, kernel.astype(x.dtype), ks, strides,
                                    pads)
        kp2 = kp.reshape(-1, 64)
        # Pad the folded time axis so Tp is a block multiple (masked in the
        # kernels; outputs are cropped back to t below).
        tb = 4
        tp = -(-t // tb) * tb
        if tp > t:
            xp = jnp.pad(xp, ((0, 0), (0, tp - t), (0, 0), (0, 0), (0, 0)))

        if deterministic or self.is_initializing():
            pooled = ps.fused_stem_eval(
                xp, kp2, bias, scale, bn_bias, ra_mean.value, ra_var.value,
                t, self.epsilon, interpret=self.interpret)
        else:
            pooled, bmean, bvar = ps.fused_stem_train(
                xp, kp2, bias, scale, bn_bias, t, self.epsilon,
                self.interpret)
            n = b * t * 44 * 44
            unbiased = bvar * (n / max(n - 1, 1))
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * bmean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * unbiased)
        return pooled[:, :t]


def _att_params_audio(att_type: str, num_heads: int, attn_drop_rate: float,
                      max_pos_encoding: int, causal: bool) -> List[Dict]:
    """Per-stage attention specs (ref: networks.py:385-397)."""
    regular = {"class": "RelPos1dMultiHeadAttention",
               "params": {"num_heads": num_heads, "attn_drop_rate": attn_drop_rate,
                          "num_pos_embeddings": max_pos_encoding,
                          "weight_init": "default", "bias_init": "default"}}
    if att_type == "regular":
        return [regular, regular, regular]
    if att_type == "grouped":
        def grouped(g):
            return {"class": "GroupedRelPosMultiHeadSelfAttention",
                    "params": {"num_heads": num_heads, "group_size": g,
                               "attn_drop_rate": attn_drop_rate,
                               "max_pos_encoding": max_pos_encoding,
                               "causal": causal}}
        return [grouped(3), grouped(1), grouped(1)]
    if att_type == "patch":
        patch = {"class": "RelPosPatch1dMultiHeadAttention",
                 "params": {"num_heads": num_heads, "patch_size": 3,
                            "attn_drop_rate": attn_drop_rate,
                            "num_pos_embeddings": max_pos_encoding,
                            "weight_init": "default", "bias_init": "default"}}
        return [patch, regular, regular]
    raise ValueError(att_type)


class AudioEfficientConformerEncoder(nn.Module):
    """Raw audio -> logits (ref: networks.py:309-440).

    fbank (fp32, fused) -> SpecAugment (train) -> conv2d stem 1->180ch k3 s2
    -> flatten freq -> Linear 7200->180 -> 3-stage ConformerInterCTC
    [180, 256, 360] with stage strides 2 -> Linear head to vocab.
    """

    include_head: bool = True
    vocab_size: int = 256
    att_type: str = "patch"
    interctc_blocks: Sequence[int] = (3, 6, 10, 13)
    num_blocks: Sequence[int] = (5, 6, 5)
    loss_prefix: str = "ctc"
    remat: bool = False

    @nn.compact
    def __call__(self, x, lengths, training: bool = False):
        # Params hardcoded in the reference (networks.py:316-333).
        n_mels, kernel_size = 80, 15
        drop_rate, attn_drop_rate = 0.1, 0.0
        max_pos_encoding, causal = 10000, False
        subsampling_filters = 180
        dim_model = [180, 256, 360]
        num_heads = 4

        compute_dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32

        # Audio preprocessing: (B, Ta) -> (B, n_mels, T'), fp32 internally.
        ap = AudioPreprocessing(sample_rate=16000, n_fft=512, win_length_ms=25,
                                hop_length_ms=10, n_mels=n_mels,
                                normalize=False, mean=-5.6501, std=4.2280)
        x, lengths = ap(x, lengths)

        if training:
            sa = SpecAugment(mF=2, F=27, mT=5, pS=0.05)
            x = sa(x, lengths, self.make_rng("augment"), training=True)

        # (B, n_mels, T') -> (B, n_mels, T', 1) -> stem -> (B, 40, T'', 180)
        x = x[..., None].astype(compute_dtype)
        x, lengths = ConvNeuralNetwork(
            dim_layers=subsampling_filters, kernel_size=3, strides=2,
            norm="BatchNorm2d", act_fun="Swish", ndim=2, polyphase=True,
            name="subsampling_module")(x, lengths, deterministic=not training)

        # Flatten frequency into features: (B, F', T'', C) -> (B, T'', F'*C).
        b, f, t, c = x.shape
        x = x.transpose(0, 2, 1, 3).reshape(b, t, f * c)
        x = Linear(dim_model[0], name="linear")(x)

        mask = make_mask(t, lengths)

        x, lengths, interctc_outputs = ConformerInterCTC(
            dim_model=dim_model, num_blocks=list(self.num_blocks),
            interctc_blocks=list(self.interctc_blocks),
            vocab_size=self.vocab_size,
            att_params=_att_params_audio(self.att_type, num_heads,
                                         attn_drop_rate, max_pos_encoding, causal),
            kernel_size=kernel_size, ff_ratio=4, drop_rate=drop_rate,
            conv_stride=2, batch_norm=True, loss_prefix=self.loss_prefix,
            remat=self.remat,
            name="back_end")(x, lengths, mask, deterministic=not training)

        if self.include_head:
            x = Linear(self.vocab_size, name="head")(x)
        return x, lengths, interctc_outputs


class VisualEfficientConformerEncoder(nn.Module):
    """Lip video -> logits (ref: networks.py:442-512).

    Conv3d stem (1->64, k(5,7,7), s(1,2,2)) + MaxPool3d -> per-frame ResNet18
    trunk -> (B, Tv, 256) -> 2-stage ConformerInterCTC [256, 360] -> head.
    Video input is (B, Tv, H, W, C) channels-last (the reference permutes to
    channels-first for torch; we don't need to).
    """

    include_head: bool = True
    vocab_size: int = 256
    interctc_blocks: Sequence[int] = (3, 6, 9)
    num_blocks: Sequence[int] = (6, 6)
    loss_prefix: str = "ctc"
    remat: bool = False
    # Fused Pallas stem (conv+BN+ReLU+pool in two kernels): None = auto
    # (single TPU device). stem_interpret runs the kernels in interpreter
    # mode (CPU tests).
    fused_stem: Optional[bool] = None
    stem_interpret: bool = False

    @nn.compact
    def __call__(self, x, lengths, training: bool = False):
        dim_model = [256, 360]
        num_heads, kernel_size = 4, 15
        drop_rate, attn_drop_rate = 0.1, 0.0
        max_pos_encoding = 10000

        b, t = x.shape[0], x.shape[1]

        use_fused = (self.fused_stem if self.fused_stem is not None
                     else _fused_stem_auto())
        if use_fused and tuple(x.shape[2:]) == (88, 88, 1):
            # Fused Pallas stem: conv+stats then BN-apply+ReLU+pool
            # (ops/pallas_stem.py); same params, same math, ~5x fewer
            # activation passes than the unfused lowering.
            x = FusedVideoStem(name="front_end_stem",
                               interpret=self.stem_interpret)(
                                   x, deterministic=not training)
            x = x.reshape(b * t, 22, 22, 64)
        else:
            # Stem: (B, T, H, W, 1) -> (B, T, H/2, W/2, 64); 88 -> 44.
            # polyphase: the 1->64ch stride-2 conv3d lowers via
            # space-to-depth (9x faster on the MXU, see
            # ops/layers._polyphase_conv); params and outputs are identical
            # to the direct conv.
            x = ConvNeuralNetwork(
                dim_layers=64, kernel_size=(5, 7, 7), strides=(1, 2, 2),
                norm="BatchNorm3d", act_fun="ReLU", ndim=3, polyphase=True,
                name="front_end_stem")(x, deterministic=not training)
            # MaxPool3d k(1,3,3) s(1,2,2) "same": 44 -> 22. The time kernel
            # is 1, so flatten (B, T) first and pool in 2-D — same math, and
            # XLA picks a sane NHWC layout instead of a transposed 5-D one.
            _, _, h, w, c = x.shape
            x = x.reshape(b * t, h, w, c)
            x = max_pool(x, (3, 3), (2, 2), padding="same")

        # Per-frame ResNet18 (no stem): (B*T, H, W, 64) -> (B*T, 256).
        x = ResNet(model="ResNet18", include_stem=False,
                   dim_output=dim_model[0], name="front_end_resnet")(
                       x, deterministic=not training)
        x = x.reshape(b, t, dim_model[0])

        mask = make_mask(t, lengths)

        att = {"class": "RelPos1dMultiHeadAttention",
               "params": {"num_heads": num_heads, "attn_drop_rate": attn_drop_rate,
                          "num_pos_embeddings": max_pos_encoding,
                          "weight_init": "default", "bias_init": "default"}}
        x, lengths, interctc_outputs = ConformerInterCTC(
            dim_model=dim_model, num_blocks=list(self.num_blocks),
            interctc_blocks=list(self.interctc_blocks),
            vocab_size=self.vocab_size, att_params=att,
            kernel_size=kernel_size, ff_ratio=4, drop_rate=drop_rate,
            conv_stride=2, batch_norm=True, loss_prefix=self.loss_prefix,
            remat=self.remat,
            name="back_end")(x, lengths, mask, deterministic=not training)

        if self.include_head:
            x = Linear(self.vocab_size, name="head")(x)
        return x, lengths, interctc_outputs


class AudioVisualEfficientConformerEncoder(nn.Module):
    """Audio-visual fusion encoder (ref: networks.py:514-579).

    video enc (v_num_blocks=[6,1]) + audio enc (a_num_blocks=[5,6,1]) both to
    360-d @ 12.5 Hz -> FusionModule -> 5-block AV ConformerInterCTC -> head.
    Lengths after fusion are the audio lengths (networks.py:568-569); the
    dataset-side align_video_to_audio guarantees matching frame counts.
    """

    include_head: bool = True
    vocab_size: int = 256
    v_interctc_blocks: Sequence[int] = (3, 6)
    a_interctc_blocks: Sequence[int] = (8, 11)
    f_interctc_blocks: Sequence[int] = (2,)
    remat: bool = False

    @nn.compact
    def __call__(self, video, video_len, audio, audio_len, training: bool = False):
        dim_model, num_blocks, num_heads = 360, 5, 4
        drop_rate, attn_drop_rate = 0.1, 0.0
        max_pos_encoding, kernel_size = 10000, 15

        v, video_len, v_inter = VisualEfficientConformerEncoder(
            include_head=False, vocab_size=self.vocab_size,
            interctc_blocks=list(self.v_interctc_blocks), num_blocks=[6, 1],
            loss_prefix="v_ctc", remat=self.remat, name="video_encoder")(
                video, video_len, training=training)

        a, audio_len, a_inter = AudioEfficientConformerEncoder(
            include_head=False, vocab_size=self.vocab_size,
            interctc_blocks=list(self.a_interctc_blocks), num_blocks=[5, 6, 1],
            loss_prefix="a_ctc", remat=self.remat, name="audio_encoder")(
                audio, audio_len, training=training)

        # Padded frame counts can differ by rounding of the padded (not true)
        # lengths; align video onto the audio time axis (true lengths already
        # match by dataset-side align_video_to_audio, transforms.py:169-180).
        ta = a.shape[1]
        if v.shape[1] < ta:
            v = jnp.pad(v, ((0, 0), (0, ta - v.shape[1]), (0, 0)))
        elif v.shape[1] > ta:
            v = v[:, :ta]

        x = FusionModule(a_dim_model=dim_model, v_dim_model=dim_model,
                         f_dim_model=dim_model, name="fusion_module")(a, v)
        lengths = audio_len

        mask = make_mask(ta, lengths)
        att = {"class": "RelPos1dMultiHeadAttention",
               "params": {"num_heads": num_heads, "attn_drop_rate": attn_drop_rate,
                          "num_pos_embeddings": max_pos_encoding,
                          "weight_init": "default", "bias_init": "default"}}
        x, lengths, f_inter = ConformerInterCTC(
            dim_model=dim_model, num_blocks=num_blocks,
            interctc_blocks=list(self.f_interctc_blocks),
            vocab_size=self.vocab_size, att_params=att,
            kernel_size=kernel_size, ff_ratio=4, drop_rate=drop_rate,
            conv_stride=2, batch_norm=True, loss_prefix="f_ctc",
            remat=self.remat,
            name="audio_visual_encoder")(x, lengths, mask,
                                         deterministic=not training)

        interctc_outputs = dict(f_inter)
        interctc_outputs.update(v_inter)
        interctc_outputs.update(a_inter)

        if self.include_head:
            x = Linear(self.vocab_size, name="head")(x)
        return x, lengths, interctc_outputs
