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

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from avec_tpu.models.conformer import ConformerInterCTC, ConvNeuralNetwork, FusionModule
from avec_tpu.models.resnet import ResNet
from avec_tpu.ops.audio import AudioPreprocessing, SpecAugment
from avec_tpu.ops.inits import get_init, torch_default_bias
from avec_tpu.ops.layers import Linear, conv_padding, max_pool, _polyphase_fold
from avec_tpu.ops.masks import make_mask


def _stem_mode() -> str:
    """Video-stem implementation selector (AVEC_TPU_STEM env override).

    "2d" (pure XLA, dt-unrolled conv + flattened frames) / "pallas" /
    "5d" (the original ConvNeuralNetwork path). Measured on v5e at B=16:
    the Pallas variant wins standalone (1.10x the isolated stem) but
    loses in-model (127.1 vs 132.2 utt/s/chip) — the custom_vjp boundary
    blocks fusions worth more than the kernel saves. The 2-D path is the
    default: it removes the (B,T)-merge relayout copies the 5-D conv
    emitter forces (7.5 ms/step)."""
    return os.environ.get("AVEC_TPU_STEM", "2d")


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
    """Drop-in stem (Conv3d 1->64 + BN + ReLU + MaxPool), restructured for
    TPU layouts. Returns frames FLATTENED: (B*T, 22, 22, 64).

    Declares parameters under the SAME names/shapes as the
    ConvNeuralNetwork + BatchNorm path (conv_0/{kernel,bias},
    BatchNorm_0/{scale,bias} + batch_stats mean/var), so checkpoints and
    the torch converter are unaffected by the compute path.

    Two implementations:
      * default (pure XLA "2-D" path): the time taps of the polyphase-
        folded conv are unrolled into channels, every frame-tensor from
        the conv onward is 4-D (B*T leading), and BN/ReLU/pool run on
        flattened frames. The 5-D path's conv emitter pins batch into
        sublanes, forcing a 599 MB relayout copy + reshape (7.5 ms/step at
        B=16) just to merge (B, T) afterwards — all-4-D removes the merge.
      * use_pallas=True: Pallas fused BN+ReLU+pool kernels
        (ops/pallas_stem.py) — wins standalone, loses in-model (see
        _fused_stem_auto); kept for standalone front-end serving.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    use_pallas: bool = False
    interpret: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        ks, strides = (5, 7, 7), (1, 2, 2)
        kernel, bias = _StemConvParams(name="conv_0")()
        scale, bn_bias, ra_mean, ra_var = _StemBNParams(name="BatchNorm_0")()

        b, t = x.shape[0], x.shape[1]
        pads = conv_padding(ks, "same")
        xp, kp, _ = _polyphase_fold(x, kernel.astype(x.dtype), ks, strides,
                                    pads)
        if self.use_pallas:
            return self._pallas_path(xp, kp, bias, scale, bn_bias, ra_mean,
                                     ra_var, b, t, deterministic)

        # dt-unrolled 2-D conv on flattened frames: channel index = dt*4+c.
        # Flatten (B, T) -> B*T per-slice BEFORE the concat: XLA fuses the
        # slice-reshape copies into the concat's output fusion (one 213 MB
        # write), where reshaping the concat result re-copied it (1.1
        # ms/step at B=16).
        kt = kp.shape[0]
        xs = jnp.concatenate(
            [xp[:, dt: dt + t].reshape((b * t,) + xp.shape[2:])
             for dt in range(kt)], axis=-1)               # (B*T, 47, 47, 20)
        k2d = kp.transpose(1, 2, 0, 3, 4)                 # (4, 4, kt, 4, 64)
        k2d = k2d.reshape(k2d.shape[0], k2d.shape[1], -1, k2d.shape[-1])
        dn = lax.conv_dimension_numbers(xs.shape, k2d.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            xs, k2d, window_strides=(1, 1), padding=((0, 0),) * 2,
            dimension_numbers=dn, preferred_element_type=xs.dtype)
        bias_v = (lax.stop_gradient(bias) if not deterministic else bias)
        y = y + bias_v.astype(y.dtype)                    # (B*T, 44, 44, 64)

        # Same single-pass BN formulation as ops.layers.BatchNorm, against
        # the container's variables.
        if deterministic or self.is_initializing():
            mean, var = ra_mean.value, ra_var.value
        else:
            yf = y.astype(jnp.float32)
            mean = yf.mean(axis=(0, 1, 2))
            var = jnp.maximum((yf * yf).mean(axis=(0, 1, 2)) - mean * mean,
                              0.0)
            n = y.shape[0] * 44 * 44
            unbiased = var * (n / max(n - 1, 1))
            ra_mean.value = (self.momentum * ra_mean.value
                             + (1 - self.momentum) * mean)
            ra_var.value = (self.momentum * ra_var.value
                            + (1 - self.momentum) * unbiased)
        # Rematerialized apply (see ops.layers._bn_apply): keeps the 586 MB
        # conv output's f32 upcast out of the backward residuals.
        from avec_tpu.ops.layers import _bn_apply

        yn = _bn_apply(y, mean, var, scale, bn_bias, self.epsilon)
        # max commutes with the monotone ReLU: relu(max_pool(yn)) ==
        # max_pool(relu(yn)) exactly, but pooling FIRST applies ReLU to the
        # 4x-smaller pooled tensor (saves a 586 MB activation round-trip at
        # B=16) and removes exact-0 ties from the pool's backward argmax
        # (gradients match the reference's relu-then-pool a.s.: yn is
        # continuous, so the window argmax is unique).
        return jnp.maximum(max_pool(yn, (3, 3), (2, 2), padding="same"), 0)

    def _pallas_path(self, xp, kp, bias, scale, bn_bias, ra_mean, ra_var,
                     b, t, deterministic):
        from avec_tpu.ops import pallas_stem as ps

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
        pooled = pooled[:, :t]
        return pooled.reshape((b * t,) + pooled.shape[2:])


def _att_params_audio(att_type: str, num_heads: int, attn_drop_rate: float,
                      max_pos_encoding: int, causal: bool,
                      use_flash: bool = False) -> List[Dict]:
    """Per-stage attention specs (ref: networks.py:385-397).

    use_flash routes the RelPos1d layers through the Pallas flash kernel
    (ops/pallas_attention.py) — the long-sequence training path (16 s
    utterances at the 50 Hz stage, T ~ 800)."""
    regular = {"class": "RelPos1dMultiHeadAttention",
               "params": {"num_heads": num_heads, "attn_drop_rate": attn_drop_rate,
                          "num_pos_embeddings": max_pos_encoding,
                          "use_flash": use_flash,
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
    # Pallas flash attention for the RelPos1d layers (long-sequence
    # training: no (T, T) HBM tensor forward or backward).
    use_flash: bool = False
    # Causal-streaming variant (beyond parity; built from the reference's
    # own streaming mechanisms: Transformer-XL causal rel-pos attention
    # nnet/attentions.py:384-554 + "causal" conv padding nnet/layers.py):
    # stem and conformer convs pad causally in time, attention uses
    # RelPosMultiHeadSelfAttention with a causal band mask. left_context
    # (in stage-1 / 50 Hz frames) bounds the attention history; mask
    # restriding halves it per stage, so a streaming decoder with per-stage
    # KV caches of left_context/2^s keys reproduces offline outputs EXACTLY.
    causal: bool = False
    left_context: Optional[int] = None

    @nn.compact
    def __call__(self, x, lengths, training: bool = False,
                 stream_state=None, stream_masks=None):
        # Params hardcoded in the reference (networks.py:316-333).
        n_mels, kernel_size = 80, 15
        drop_rate, attn_drop_rate = 0.1, 0.0
        max_pos_encoding, causal = 10000, self.causal
        subsampling_filters = 180
        dim_model = [180, 256, 360]
        num_heads = 4

        compute_dtype = x.dtype if x.dtype in (jnp.bfloat16, jnp.float16) else jnp.float32

        if stream_state is not None:
            # Streaming step (causal config only): x is a pre-computed
            # fbank chunk (B, n_mels, Tc) from the driver (which carries the
            # raw-sample tail for exact chunked fbank); see
            # decode/causal_streaming.py.
            assert causal, "streaming requires the causal encoder"
            return self._stream_step(x, stream_state, stream_masks,
                                     subsampling_filters, dim_model,
                                     num_heads, kernel_size, drop_rate,
                                     attn_drop_rate, max_pos_encoding,
                                     compute_dtype)

        # Audio preprocessing: (B, Ta) -> (B, n_mels, T'), fp32 internally.
        ap = AudioPreprocessing(sample_rate=16000, n_fft=512, win_length_ms=25,
                                hop_length_ms=10, n_mels=n_mels,
                                normalize=False, mean=-5.6501, std=4.2280)
        x, lengths = ap(x, lengths)

        if training:
            sa = SpecAugment(mF=2, F=27, mT=5, pS=0.05)
            x = sa(x, lengths, self.make_rng("augment"), training=True)

        # Stem runs TIME-MAJOR: (B, n_mels, T') -> (B, T', n_mels, 1) ->
        # conv2d (spatial_swap keeps the stored kernel in the reference
        # (freq, time) layout) -> (B, T'', 40, 180). The flatten to
        # (B, T'', F'*C) is then a bitcast — the freq-major orientation
        # spent ~0.7 ms/step (B=16) on the (B,F,T,C)->(B,T,F,C) transpose
        # copy + non-bitcast reshape feeding `linear`.
        # Causal variant: causal in time (axis 1 here), centered in freq.
        x = x.transpose(0, 2, 1)[..., None].astype(compute_dtype)
        x, lengths = ConvNeuralNetwork(
            dim_layers=subsampling_filters, kernel_size=3, strides=2,
            norm="BatchNorm2d", act_fun="Swish", ndim=2, polyphase=True,
            padding=("causal", "same") if causal else "same",
            spatial_swap=True,
            name="subsampling_module")(x, lengths, deterministic=not training)

        # Flatten frequency into features: (B, T'', F', C) -> (B, T'', F'*C).
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = Linear(dim_model[0], name="linear")(x)

        if causal:
            # Causal band mask; left_context (stage-1 frames) bounds the
            # attention history and halves per stage under mask restriding.
            mask = make_mask(t, lengths, left_context=self.left_context,
                             right_context=0)
            xl = {"class": "RelPosMultiHeadSelfAttention",
                  "params": {"num_heads": num_heads,
                             "attn_drop_rate": attn_drop_rate,
                             "max_pos_encoding": max_pos_encoding,
                             "causal": True}}
            att_params = [xl, xl, xl]
        else:
            mask = make_mask(t, lengths)
            att_params = _att_params_audio(self.att_type, num_heads,
                                           attn_drop_rate, max_pos_encoding,
                                           causal, use_flash=self.use_flash)

        x, lengths, interctc_outputs = ConformerInterCTC(
            dim_model=dim_model, num_blocks=list(self.num_blocks),
            interctc_blocks=list(self.interctc_blocks),
            vocab_size=self.vocab_size,
            att_params=att_params,
            kernel_size=kernel_size, ff_ratio=4, drop_rate=drop_rate,
            conv_stride=2, batch_norm=True, loss_prefix=self.loss_prefix,
            conv_padding="causal" if causal else "same",
            remat=self.remat,
            name="back_end")(x, lengths, mask, deterministic=not training)

        if self.include_head:
            x = Linear(self.vocab_size, name="head")(x)
        return x, lengths, interctc_outputs

    def _stream_step(self, x, state, masks, subsampling_filters, dim_model,
                     num_heads, kernel_size, drop_rate, attn_drop_rate,
                     max_pos_encoding, compute_dtype):
        """One streaming chunk through stem + conformer with carried state.

        x: (B, n_mels, Tc) fbank chunk, Tc even. state: {"stem": (B, n_mels,
        2, 1) fbank tail, "blocks": per-run conformer states}. masks: per-
        stage streaming attention masks. Module names/params are identical
        to the offline path. Returns (logits, interctc, new_state)."""
        # Time-major like the offline path: (B, n_mels, Tc) -> (B, Tc, F, 1).
        x = x.transpose(0, 2, 1)[..., None].astype(compute_dtype)
        # Causal stem via carried tail: conv VALID over concat(tail, chunk)
        # in time == the offline ("causal", "same") stem. Tail is carried
        # time-major: (B, 2, n_mels, 1).
        x = jnp.concatenate([state["stem"].astype(x.dtype), x], axis=1)
        new_stem = {"stem": x[:, -2:, :, :]}
        x = ConvNeuralNetwork(
            dim_layers=subsampling_filters, kernel_size=3, strides=2,
            norm="BatchNorm2d", act_fun="Swish", ndim=2, polyphase=True,
            padding=("valid", "same"), spatial_swap=True,
            name="subsampling_module")(x, None, deterministic=True)
        b, t, f, c = x.shape
        x = x.reshape(b, t, f * c)
        x = Linear(dim_model[0], name="linear")(x)

        xl = {"class": "RelPosMultiHeadSelfAttention",
              "params": {"num_heads": num_heads,
                         "attn_drop_rate": attn_drop_rate,
                         "max_pos_encoding": max_pos_encoding,
                         "causal": True}}
        x, new_blocks, interctc_outputs = ConformerInterCTC(
            dim_model=dim_model, num_blocks=list(self.num_blocks),
            interctc_blocks=list(self.interctc_blocks),
            vocab_size=self.vocab_size,
            att_params=[xl, xl, xl],
            kernel_size=kernel_size, ff_ratio=4, drop_rate=drop_rate,
            conv_stride=2, batch_norm=True, loss_prefix=self.loss_prefix,
            conv_padding="causal", remat=self.remat,
            name="back_end")(x, None, masks, deterministic=True,
                             stream_state=state["blocks"])
        if self.include_head:
            x = Linear(self.vocab_size, name="head")(x)
        new_stem["blocks"] = new_blocks
        return x, interctc_outputs, new_stem


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
    # Video-stem implementation: "2d" (default, see _stem_mode), "pallas",
    # or "5d"; None = AVEC_TPU_STEM env / default. stem_interpret runs the
    # Pallas kernels in interpreter mode (CPU tests).
    stem_mode: Optional[str] = None
    stem_interpret: bool = False

    @nn.compact
    def __call__(self, x, lengths, training: bool = False):
        dim_model = [256, 360]
        num_heads, kernel_size = 4, 15
        drop_rate, attn_drop_rate = 0.1, 0.0
        max_pos_encoding = 10000

        b, t = x.shape[0], x.shape[1]

        mode = self.stem_mode if self.stem_mode is not None else _stem_mode()
        if mode in ("2d", "pallas") and tuple(x.shape[2:]) != (88, 88, 1):
            # The fused stem's dt-unroll is validated for the AVEC 88x88
            # grayscale input; other shapes silently losing the ~43% stem
            # win would be invisible — say so once at trace time.
            import logging

            logging.getLogger(__name__).warning(
                "FusedVideoStem supports (88, 88, 1) input; got %s — "
                "falling back to the slower 5-D conv stem",
                tuple(x.shape[2:]))
        if mode in ("2d", "pallas") and tuple(x.shape[2:]) == (88, 88, 1):
            # Layout-restructured stem (same params/math as the 5-D path,
            # see FusedVideoStem): returns flattened (B*T, 22, 22, 64).
            x = FusedVideoStem(name="front_end_stem",
                               use_pallas=(mode == "pallas"),
                               interpret=self.stem_interpret)(
                                   x, deterministic=not training)
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
    # Block counts per sub-encoder; defaults are the reference architecture
    # (networks.py:514-528) and MUST stay so for checkpoint parity. Smaller
    # values back the synthetic AV lifecycle (configs/Synthetic/AV-Tone.py).
    v_num_blocks: Sequence[int] = (6, 1)
    a_num_blocks: Sequence[int] = (5, 6, 1)
    f_num_blocks: int = 5
    remat: bool = False
    # Pallas flash attention for the audio encoder's RelPos1d stages (the
    # long-sequence path; video/fusion stages run at <=12.5 Hz where the
    # XLA paths win — see tools/bench_flash.py).
    use_flash: bool = False

    @nn.compact
    def __call__(self, video, video_len, audio, audio_len, training: bool = False):
        dim_model, num_blocks, num_heads = 360, self.f_num_blocks, 4
        drop_rate, attn_drop_rate = 0.1, 0.0
        max_pos_encoding, kernel_size = 10000, 15

        v, video_len, v_inter = VisualEfficientConformerEncoder(
            include_head=False, vocab_size=self.vocab_size,
            interctc_blocks=list(self.v_interctc_blocks),
            num_blocks=list(self.v_num_blocks),
            loss_prefix="v_ctc", remat=self.remat, name="video_encoder")(
                video, video_len, training=training)

        a, audio_len, a_inter = AudioEfficientConformerEncoder(
            include_head=False, vocab_size=self.vocab_size,
            interctc_blocks=list(self.a_interctc_blocks),
            num_blocks=list(self.a_num_blocks),
            loss_prefix="a_ctc", remat=self.remat, use_flash=self.use_flash,
            name="audio_encoder")(audio, audio_len, training=training)

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
