# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Conformer building blocks and the InterCTC conformer stack.

Behavioral parity targets:
  FeedForwardModule      /root/reference/nnet/modules.py:257-289
  AttentionModule        /root/reference/nnet/modules.py:291-339
  ConvolutionModule      /root/reference/nnet/modules.py:341-385
  InterCTCResModule      /root/reference/nnet/modules.py:387-400
  FusionModule           /root/reference/nnet/modules.py:402-425
  ConformerBlock         /root/reference/nnet/blocks.py:208-306
  ConformerInterCTC      /root/reference/nnet/networks.py:202-307
  MultiLayerPerceptron   /root/reference/nnet/modules.py:29-68
  ConvNeuralNetwork      /root/reference/nnet/modules.py:70-130

All sequence tensors are (B, T, D) channels-last; masks are boolean
(B, 1, 1|T, T); lengths are int32 (B,). The whole stack is static-shape and
jit-compatible; strided blocks shrink the padded T by exactly stride so the
reference's mask[::s, ::s] / (len-1)//s+1 semantics hold
(networks.py:294-302).
"""

import os
from typing import Any, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import flax.linen as nn

from avec_tpu.ops.activations import get_act, glu
from avec_tpu.ops.attention import make_attention
from avec_tpu.ops.layers import (
    BatchNorm,
    Conv,
    Dropout,
    LayerNorm,
    Linear,
    max_pool,
    norm_dict,
)
from avec_tpu.ops.masks import downsample_mask, strided_lengths

def _unroll_blocks_default() -> bool:
    """Read AVEC_TPU_UNROLL_BLOCKS at trace time (not import time), so
    setting the env var inside a driver (bench.py) works regardless of
    import order and importing a driver never flips other code's models."""
    return os.environ.get("AVEC_TPU_UNROLL_BLOCKS", "") == "1"


def _fused_conv_enabled() -> bool:
    """AVEC_TPU_FUSED_CONV=1 routes ConvolutionModule (training mode,
    stride 1, BN, Swish, same/causal padding) through the fused Pallas
    kernels (ops/pallas_conv_module.py). Same opt-in/sharding rules as
    the fused FFN below; multi-device callers must use
    ops/pallas_conv_module.fused_conv_module_3d_dp."""
    return os.environ.get("AVEC_TPU_FUSED_CONV", "") == "1"


def _fused_att_enabled() -> bool:
    """AVEC_TPU_FUSED_ATT=1 routes AttentionModule (training mode,
    non-causal RelPos1d self-attention on the factorized path, key-padding
    masks only, attn dropout off — every AVEC config) through the fused
    Pallas kernels (ops/pallas_attention_module.py). Same opt-in/sharding
    rules as the fused FFN below; multi-device callers must use
    ops/pallas_attention_module.fused_attention_module_3d_dp."""
    return os.environ.get("AVEC_TPU_FUSED_ATT", "") == "1"


def _fused_ffn_enabled() -> bool:
    """AVEC_TPU_FUSED_FFN=1 routes FeedForwardModule (training mode only)
    through the fused Pallas kernel (ops/pallas_ffn.py). Opt-in: a
    pallas_call is opaque to GSPMD, so the flag must stay off for >1-device
    meshes unless the caller wraps the step in shard_map
    (ops/pallas_ffn.fused_ffn_3d_dp). bench.py enables it single-chip:
    measured 227.95 vs 222.26 utt/s/chip on the AV train step (B=16, 6 s,
    v5e)."""
    return os.environ.get("AVEC_TPU_FUSED_FFN", "") == "1"


class FeedForwardModule(nn.Module):
    """Pre-norm FFN: LN -> Linear(4x) -> act -> drop -> Linear -> drop.

    ref: nnet/modules.py:257-289 (eps 1e-6, inner_dropout configurable).
    """

    dim_model: int
    dim_ffn: int
    drop_rate: float
    act_fun: Any = "Swish"
    inner_dropout: bool = True
    prenorm: bool = True
    weight_init: Any = "default"
    bias_init: Any = "default"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if (_fused_ffn_enabled() and not self.is_initializing()
                and not deterministic
                and self.prenorm and x.ndim == 3
                and self.act_fun == "Swish"
                and (self.inner_dropout or self.drop_rate == 0.0)):
            # Training only: the kernel's win is backward-pass HBM traffic
            # (recompute-in-VMEM vs saved residuals). Forward-only (eval/
            # SWA) XLA's own fusion is already optimal — measured 4402 vs
            # 4306 RTFx — and eval keeps bit-exact legacy numerics.
            # Whole-FFN Pallas kernel: LN + Linear(4x) + swish + dropout +
            # Linear + dropout in one VMEM-resident pass (fwd AND bwd).
            # Param tree unchanged — the kernel reads the same child params
            # the unfused path creates (init always traces unfused).
            from avec_tpu.ops.pallas_ffn import fused_ffn_3d

            p = self.variables["params"]
            seed = None
            if not deterministic and self.drop_rate > 0.0:
                bits = jax.random.bits(self.make_rng("dropout"),
                                       dtype=jnp.uint32)
                seed = (bits & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
            return fused_ffn_3d(
                x, p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"],
                p["Linear_0"]["kernel"], p["Linear_0"]["bias"],
                p["Linear_1"]["kernel"], p["Linear_1"]["bias"],
                seed=seed, epsilon=1e-6, drop_rate=self.drop_rate,
                deterministic=deterministic)
        if self.prenorm:
            x = LayerNorm(epsilon=1e-6)(x)
        x = Linear(self.dim_ffn, weight_init=self.weight_init,
                   bias_init=self.bias_init)(x)
        x = get_act(self.act_fun)(x)
        if self.inner_dropout:
            x = Dropout(self.drop_rate)(x, deterministic=deterministic)
        x = Linear(self.dim_model, weight_init=self.weight_init,
                   bias_init=self.bias_init)(x)
        return Dropout(self.drop_rate)(x, deterministic=deterministic)


class AttentionModule(nn.Module):
    """Pre-norm attention + dropout (+ optional residual).

    ref: nnet/modules.py:291-339.
    """

    dim_model: int
    att_params: Dict
    drop_rate: float
    residual: bool = True

    def _fused_eligible(self, x, mask, deterministic, hidden, return_hidden):
        """Gate for the fused Pallas path: training-mode, non-causal
        RelPos1d self-attention with attention dropout off, on the
        factorized rel-pos path (the in-model default), with at most a
        key-padding mask (the kernel reconstructs it from lengths). Init
        always traces unfused so the child param tree is unchanged."""
        if (not _fused_att_enabled() or self.is_initializing()
                or deterministic or return_hidden or hidden is not None
                or x.ndim != 3
                or self.att_params.get("class") != "RelPos1dMultiHeadAttention"
                or not (mask is None
                        or (mask.ndim == 4 and mask.shape[2] == 1))):
            return False
        ap = dict(self.att_params.get("params", {}))
        factorized = ap.get("factorized")
        if factorized is None:
            factorized = os.environ.get("AVEC_TPU_FACTORIZED_ATT", "1") == "1"
        h = ap.get("num_heads", 1)
        return (factorized and not ap.get("causal", False)
                and not ap.get("use_flash", False)
                and ap.get("attn_drop_rate", 0.0) == 0.0
                and self.dim_model % h == 0 and self.dim_model % 2 == 0)

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True,
                 hidden=None, return_hidden: bool = False):
        if self._fused_eligible(x, mask, deterministic, hidden,
                                return_hidden):
            from avec_tpu.ops.pallas_attention_module import (
                fused_attention_module_3d)

            p = self.variables["params"]
            a = p["RelPos1dMultiHeadAttention_0"]
            seed = None
            if self.drop_rate > 0.0:
                bits = jax.random.bits(self.make_rng("dropout"),
                                       dtype=jnp.uint32)
                seed = (bits & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
            lengths = (None if mask is None
                       else mask[:, 0, 0, :].sum(axis=-1).astype(jnp.int32))
            return fused_attention_module_3d(
                x, p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"],
                a["query_layer"]["kernel"], a["query_layer"]["bias"],
                a["key_layer"]["kernel"], a["key_layer"]["bias"],
                a["value_layer"]["kernel"], a["value_layer"]["bias"],
                a["pos_kernel"], a["pos_bias"],
                a["output_layer"]["kernel"], a["output_layer"]["bias"],
                num_heads=self.att_params["params"]["num_heads"],
                lengths=lengths, seed=seed, drop_rate=self.drop_rate,
                deterministic=False, residual=self.residual)

        x_res = x
        x = LayerNorm(epsilon=1e-6)(x)
        att = make_attention(self.dim_model, self.att_params)
        new_hidden = None
        if return_hidden:
            # Streaming: KV-cache attention (RelPosMultiHeadSelfAttention,
            # ref nnet/attentions.py:482-519). `hidden` holds the projected
            # K/V of past frames; the layer returns the updated cache.
            x, new_hidden = att(x, mask=mask, deterministic=deterministic,
                                hidden=hidden, return_hidden=True)
        else:
            x = att(x, mask=mask, deterministic=deterministic)
        x = Dropout(self.drop_rate)(x, deterministic=deterministic)
        if self.residual:
            x = x + x_res
        if return_hidden:
            return x, new_hidden
        return x


class ConvolutionModule(nn.Module):
    """Conformer convolution module, channels-last.

    LN -> pointwise (2*expand) -> GLU -> depthwise(k, stride, groups=expand)
    -> BatchNorm -> act -> pointwise -> dropout.
    ref: nnet/modules.py:341-385. The depthwise conv carries the block's
    stride (progressive time downsampling, SURVEY §5).
    """

    dim_model: int
    dim_expand: int
    drop_rate: float
    stride: int = 1
    act_fun: Any = "Swish"
    kernel_size: int = 15
    padding: str = "same"
    batch_norm: bool = True
    transposed: bool = False  # upsampling variant (ref blocks.py:269-280)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, state=None,
                 return_state: bool = False):
        from avec_tpu.ops.layers import ConvTranspose

        if (_fused_conv_enabled() and not self.is_initializing()
                and not deterministic and not return_state
                and not self.transposed and self.stride == 1
                and self.batch_norm and self.act_fun == "Swish"
                and self.padding in ("same", "causal") and x.ndim == 3):
            # Training only (train-mode BN batch stats are what force the
            # two-pass structure; eval BN is a pure elementwise chain XLA
            # already fuses). The kernel computes the whole module body
            # VMEM-resident; this branch reads the same child params the
            # unfused path creates (init always traces unfused) and routes
            # the batch stats through the BatchNorm child so the running-
            # stat update (and the variable tree) is unchanged.
            from avec_tpu.ops.pallas_conv_module import fused_conv_module_3d

            p = self.variables["params"]
            seed = None
            if self.drop_rate > 0.0:
                bits = jax.random.bits(self.make_rng("dropout"),
                                       dtype=jnp.uint32)
                seed = (bits & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
            y, mean, var = fused_conv_module_3d(
                x, p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"],
                p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
                p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
                p["BatchNorm_0"]["scale"], p["BatchNorm_0"]["bias"],
                p["Conv_2"]["kernel"], p["Conv_2"]["bias"],
                seed=seed, padding=self.padding, drop_rate=self.drop_rate,
                deterministic=False)
            BatchNorm(name="BatchNorm_0")(
                None, use_running_average=False,
                precomputed=(mean, var, x.shape[0] * x.shape[1]))
            return y

        x = LayerNorm(epsilon=1e-6)(x)
        x = Conv(2 * self.dim_expand, kernel_size=1, ndim=1)(x)
        x = glu(x, axis=-1)
        new_state = None
        if self.transposed:
            # out = T * stride: padding (k-1)//2, output_padding stride-1.
            x = ConvTranspose(self.dim_expand, kernel_size=self.kernel_size,
                              ndim=1, strides=self.stride,
                              padding=(self.kernel_size - 1) // 2,
                              output_padding=max(self.stride - 1, 0))(x)
        else:
            padding = self.padding
            if return_state:
                # Streaming (causal padding only): the carried tail is the
                # last k-1 GLU-output frames; conv VALID over concat(tail,
                # chunk) == the causal conv over the full sequence, so
                # chunked and offline outputs are identical.
                assert self.padding == "causal", "streaming needs causal conv"
                x = jnp.concatenate([state.astype(x.dtype), x], axis=1)
                new_state = x[:, -(self.kernel_size - 1):]
                padding = "valid"
            # bias_stop_gradient: training-mode BN follows, so the bias
            # gradient is exactly zero (see ops/layers.Conv).
            x = Conv(self.dim_expand, kernel_size=self.kernel_size, ndim=1,
                     strides=self.stride, padding=padding,
                     groups=self.dim_expand,
                     bias_stop_gradient=(self.batch_norm
                                         and not deterministic))(x)
        if self.batch_norm:
            x = BatchNorm()(x, use_running_average=deterministic)
        else:
            x = LayerNorm()(x)
        x = get_act(self.act_fun)(x)
        x = Conv(self.dim_expand, kernel_size=1, ndim=1)(x)
        x = Dropout(self.drop_rate)(x, deterministic=deterministic)
        if return_state:
            return x, new_state
        return x


class InterCTCResModule(nn.Module):
    """Intermediate-CTC residual conditioning (ref: nnet/modules.py:387-400).

    logits = proj_1(x); x += proj_2(softmax(logits)).
    """

    dim_model: int
    vocab_size: int

    @nn.compact
    def __call__(self, x):
        logits = Linear(self.vocab_size, name="proj_1")(x)
        probs = jnp.asarray(
            nn.softmax(logits.astype(jnp.float32), axis=-1), dtype=x.dtype)
        x = x + Linear(self.dim_model, name="proj_2")(probs)
        return x, logits


class FusionModule(nn.Module):
    """Audio-visual fusion MLP (ref: nnet/modules.py:402-425).

    concat(audio, video) -> Linear(4*f_dim) -> Swish -> Linear(f_dim).
    """

    a_dim_model: int = 360
    v_dim_model: int = 360
    f_dim_model: int = 360
    ff_ratio: int = 4

    @nn.compact
    def __call__(self, audio, video):
        x = jnp.concatenate([audio, video], axis=-1)
        x = Linear(self.ff_ratio * self.f_dim_model)(x)
        x = get_act("Swish")(x)
        return Linear(self.f_dim_model)(x)


class ConformerBlock(nn.Module):
    """x += 1/2 ff1; x += MHSA(LN(x)); x = conv_res(x) + ConvModule(x);
    x += 1/2 ff2; x = LN(x).

    ref: nnet/blocks.py:208-306. A strided block downsamples inside the conv
    module; the residual is a stride-matched MaxPool (same dim) or strided
    pointwise conv (dim change) (:273-284).
    """

    dim_model: int
    dim_expand: int
    ff_ratio: int
    att_params: Dict
    drop_rate: float
    conv_stride: int = 1
    kernel_size: int = 15
    conv_padding: str = "same"
    inner_dropout: bool = True
    act_fun: Any = "Swish"
    batch_norm: bool = True
    block_norm: bool = True
    transposed: bool = False  # upsampling block (ref blocks.py:269-284)

    @property
    def stride(self):
        return self.conv_stride

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True,
                 state=None, return_state: bool = False):
        x = x + 0.5 * FeedForwardModule(
            dim_model=self.dim_model, dim_ffn=self.dim_model * self.ff_ratio,
            drop_rate=self.drop_rate, act_fun=self.act_fun,
            inner_dropout=self.inner_dropout, name="ff_module1")(
                x, deterministic=deterministic)

        new_state = {}
        att_module = AttentionModule(
            dim_model=self.dim_model, att_params=self.att_params,
            drop_rate=self.drop_rate, residual=False, name="self_att_module")
        if return_state:
            att_out, new_state["att"] = att_module(
                x, mask=mask, deterministic=deterministic,
                hidden=state["att"], return_hidden=True)
            x = x + att_out
        else:
            x = x + att_module(x, mask=mask, deterministic=deterministic)

        conv_module = ConvolutionModule(
            dim_model=self.dim_model, dim_expand=self.dim_expand,
            drop_rate=self.drop_rate, stride=self.conv_stride,
            act_fun=self.act_fun, kernel_size=self.kernel_size,
            padding=self.conv_padding, batch_norm=self.batch_norm,
            transposed=self.transposed, name="conv_module")
        if return_state:
            conv_out, new_state["conv"] = conv_module(
                x, deterministic=deterministic, state=state["conv"],
                return_state=True)
        else:
            conv_out = conv_module(x, deterministic=deterministic)

        if self.dim_model != self.dim_expand:
            if self.transposed:
                from avec_tpu.ops.layers import ConvTranspose

                res = ConvTranspose(self.dim_expand, kernel_size=1, ndim=1,
                                    strides=self.conv_stride,
                                    output_padding=max(self.conv_stride - 1, 0),
                                    name="conv_res")(x)
            else:
                res = Conv(self.dim_expand, kernel_size=1, ndim=1,
                           strides=self.conv_stride, name="conv_res")(x)
        elif self.conv_stride > 1:
            if self.transposed:
                from avec_tpu.ops.layers import upsample_nearest

                res = upsample_nearest(x, self.conv_stride, axis=1)
            else:
                res = max_pool(x, (1,), (self.conv_stride,))
        else:
            res = x
        x = res + conv_out

        x = x + 0.5 * FeedForwardModule(
            dim_model=self.dim_expand, dim_ffn=self.dim_expand * self.ff_ratio,
            drop_rate=self.drop_rate, act_fun=self.act_fun,
            inner_dropout=self.inner_dropout, name="ff_module2")(
                x, deterministic=deterministic)

        if self.block_norm:
            x = LayerNorm(epsilon=1e-6)(x)
        if return_state:
            return x, new_state
        return x


class _BlockScanCell(nn.Module):
    """Scan cell wrapping one ConformerBlock (see ConformerInterCTC)."""

    block_kwargs: Dict
    deterministic: bool

    @nn.compact
    def __call__(self, x, mask=None):
        y = ConformerBlock(**self.block_kwargs, name="block")(
            x, mask=mask, deterministic=self.deterministic)
        return y, None


class _BlockScanCellStream(nn.Module):
    """Streaming scan cell: same params as _BlockScanCell ("block" child),
    but threads per-layer KV-cache + conv-tail state (stacked on the scan
    axis) through the run."""

    block_kwargs: Dict
    deterministic: bool

    @nn.compact
    def __call__(self, x, mask, state):
        y, new_state = ConformerBlock(**self.block_kwargs, name="block")(
            x, mask=mask, deterministic=self.deterministic,
            state=state, return_state=True)
        return y, new_state


class ConformerInterCTC(nn.Module):
    """Multi-stage Conformer stack with interleaved InterCTC modules.

    ref: nnet/networks.py:202-307. Stage boundaries stride by conv_stride and
    expand dims; InterCTC outputs are keyed "{loss_prefix}_{i}" with 0-based
    block index i (networks.py:289). Masks/lengths are re-strided after each
    strided block.

    TPU-first: consecutive identical blocks (same dims, stride 1, same
    attention, no InterCTC tap between them) execute under nn.scan with
    stacked parameters — one traced block per homogeneous run instead of N,
    shrinking the HLO graph and compile time multiplicatively while XLA still
    unrolls nothing at runtime (lax.scan).
    """

    dim_model: Union[int, Sequence[int]]
    num_blocks: Union[int, Sequence[int]]
    interctc_blocks: Sequence[int]
    vocab_size: int
    loss_prefix: str = "ctc"
    att_params: Any = None
    kernel_size: int = 15
    conv_padding: str = "same"
    ff_ratio: int = 4
    drop_rate: float = 0.1
    conv_stride: Union[int, Sequence[int]] = 2
    batch_norm: bool = True
    # Rematerialize block activations in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for O(1) activation memory per block — lifts
    # the HBM ceiling for large batch x long sequence training.
    remat: bool = False
    # Unroll the nn.scan'd uniform block runs at lowering time (lax.scan
    # unroll=N): same stacked parameters / checkpoints, removes the per-
    # iteration parameter dynamic-slice overhead at the cost of compile
    # time. Default (None) from AVEC_TPU_UNROLL_BLOCKS=1 at trace time
    # (compile caches persist, so production pays the longer compile once).
    unroll_blocks: Optional[bool] = None

    def _block_plan(self):
        """Static per-block configs + homogeneous-run grouping."""
        dims = [self.dim_model] if isinstance(self.dim_model, int) else list(self.dim_model)
        nblocks = [self.num_blocks] if isinstance(self.num_blocks, int) else list(self.num_blocks)
        interctc = set(self.interctc_blocks)
        blocks = []
        i = 0
        for stage_id in range(len(nblocks)):
            for block_id in range(nblocks[stage_id]):
                down_block = (block_id == nblocks[stage_id] - 1
                              and stage_id < len(nblocks) - 1)
                stride = 1
                if down_block:
                    stride = (self.conv_stride[stage_id]
                              if isinstance(self.conv_stride, (list, tuple))
                              else self.conv_stride)
                # linen freezes list fields to tuples of FrozenDicts.
                att = (self.att_params[stage_id]
                       if isinstance(self.att_params, (list, tuple))
                       else self.att_params)
                dim_out = dims[stage_id + (1 if down_block else 0)]
                blocks.append(dict(
                    index=i,
                    kwargs=dict(dim_model=dims[stage_id], dim_expand=dim_out,
                                ff_ratio=self.ff_ratio, att_params=att,
                                drop_rate=self.drop_rate, conv_stride=stride,
                                kernel_size=self.kernel_size,
                                conv_padding=self.conv_padding,
                                batch_norm=self.batch_norm),
                    interctc=(i + 1) in interctc,
                    stage_id=stage_id,
                    stride=stride, dim_out=dim_out))
                i += 1

        # Group consecutive STRICTLY uniform blocks (stride 1, no InterCTC
        # tap, identical config); boundary blocks become singleton runs.
        runs, current = [], []
        for b in blocks:
            uniform = b["stride"] == 1 and not b["interctc"]
            if uniform and current and current[0]["kwargs"] == b["kwargs"]:
                current.append(b)
            elif uniform:
                if current:
                    runs.append(current)
                current = [b]
            else:
                if current:
                    runs.append(current)
                    current = []
                runs.append([b])
        if current:
            runs.append(current)
        return runs

    def stream_plan(self):
        """Static run descriptions for a streaming driver: one entry per
        _block_plan run with (n_layers, stage_id, dim_model, dim_expand,
        kernel_size, stride, scanned)."""
        return [dict(n_layers=len(run), stage_id=run[0]["stage_id"],
                     dim_model=run[0]["kwargs"]["dim_model"],
                     dim_expand=run[0]["kwargs"]["dim_expand"],
                     kernel_size=self.kernel_size,
                     stride=run[-1]["stride"], scanned=len(run) > 1)
                for run in self._block_plan()]

    @nn.compact
    def __call__(self, x, lengths=None, mask=None, deterministic: bool = True,
                 stream_state=None):
        if stream_state is not None:
            return self._stream_forward(x, mask, stream_state, deterministic)
        x = Dropout(self.drop_rate)(x, deterministic=deterministic)

        interctc_outputs = {}
        for run in self._block_plan():
            if len(run) > 1:  # strictly uniform by construction
                first, last = run[0]["index"], run[-1]["index"]
                cell = (nn.remat(_BlockScanCell, prevent_cse=False)
                        if self.remat else _BlockScanCell)
                scan = nn.scan(
                    cell,
                    variable_axes={"params": 0, "batch_stats": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast,),
                    length=len(run),
                    unroll=len(run) if (
                        self.unroll_blocks if self.unroll_blocks is not None
                        else _unroll_blocks_default()) else 1,
                )(block_kwargs=run[0]["kwargs"], deterministic=deterministic,
                  name=f"blocks_{first}_{last}")
                x, _ = scan(x, mask)
                continue

            # Singleton (boundary) blocks stay un-rematted: they are few and
            # keeping them direct preserves parameter naming across configs.
            for b in run:
                x = ConformerBlock(**b["kwargs"], name=f"block_{b['index']}")(
                    x, mask=mask, deterministic=deterministic)
                logits = None
                if b["interctc"]:
                    x, logits = InterCTCResModule(
                        dim_model=b["dim_out"], vocab_size=self.vocab_size,
                        name=f"interctc_{b['index']}")(x)
                    key = f"{self.loss_prefix}_{b['index']}"
                if b["stride"] > 1:
                    mask = downsample_mask(mask, b["stride"])
                    if lengths is not None:
                        lengths = strided_lengths(lengths, b["stride"])
                if logits is not None:
                    interctc_outputs[key] = [logits, lengths]

        return x, lengths, interctc_outputs

    def _stream_forward(self, x, masks, stream_state, deterministic):
        """Chunked forward with carried per-block state (causal configs).

        `masks` is a per-stage list of (B, 1, c_s, L_s + c_s) streaming
        attention masks; `stream_state` one pytree per _block_plan run
        (stacked along axis 0 for scanned runs): {"att": {"K", "V"} fixed-
        size right-aligned KV caches, "conv": (k-1)-frame conv tails}.
        Returns (x, new_states, interctc_outputs); the driver trims the
        returned caches back to their fixed sizes. Parameter paths are
        identical to the offline path (same scan grouping and names)."""
        x = Dropout(self.drop_rate)(x, deterministic=deterministic)
        interctc_outputs = {}
        new_states = []
        for si, run in enumerate(self._block_plan()):
            m = (masks[run[0]["stage_id"]]
                 if isinstance(masks, (list, tuple)) else masks)
            if len(run) > 1:
                first, last = run[0]["index"], run[-1]["index"]
                scan = nn.scan(
                    _BlockScanCellStream,
                    variable_axes={"params": 0, "batch_stats": 0},
                    split_rngs={"params": True, "dropout": True},
                    in_axes=(nn.broadcast, 0), out_axes=0,
                    length=len(run),
                )(block_kwargs=run[0]["kwargs"], deterministic=deterministic,
                  name=f"blocks_{first}_{last}")
                x, new_s = scan(x, m, stream_state[si])
                new_states.append(new_s)
                continue
            b = run[0]
            x, new_s = ConformerBlock(**b["kwargs"],
                                      name=f"block_{b['index']}")(
                x, mask=m, deterministic=deterministic,
                state=stream_state[si], return_state=True)
            new_states.append(new_s)
            if b["interctc"]:
                x, logits = InterCTCResModule(
                    dim_model=b["dim_out"], vocab_size=self.vocab_size,
                    name=f"interctc_{b['index']}")(x)
                interctc_outputs[f"{self.loss_prefix}_{b['index']}"] = [
                    logits, None]
        return x, new_states, interctc_outputs


class MultiLayerPerceptron(nn.Module):
    """Linear -> norm -> act -> dropout stack (ref: nnet/modules.py:29-68)."""

    dim_layers: Sequence[int]
    act_fun: Any = "ReLU"
    norm: Any = None
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i, dim in enumerate(self.dim_layers):
            x = Linear(dim, name=f"linear_{i}")(x)
            if self.norm is not None:
                x = norm_dict[self.norm]()(x)
            x = get_act(self.act_fun)(x)
            if self.drop_rate > 0:
                x = Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x


class InceptionModule(nn.Module):
    """GoogLeNet Inception module (ref: nnet/modules.py:187-251).

    Four parallel branches (1x1 / 1x1->k0 / 1x1->k1 / pool->1x1) concatenated
    on channels; channels-last NHWC.
    """

    out_channels: Sequence[int]  # [C0, C1, C2, C3, C4, C5]
    kernel_sizes: Sequence[int] = (3, 5)
    ndim: int = 2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from avec_tpu.ops.layers import max_pool

        def conv_bn_relu(y, ch, k, name):
            y = Conv(ch, k, ndim=self.ndim, use_bias=False, name=name)(y)
            y = BatchNorm(name=name + "_bn")(y, use_running_average=deterministic)
            return get_act("ReLU")(y)

        c = self.out_channels
        b0 = conv_bn_relu(x, c[0], 1, "branch0")
        b1 = conv_bn_relu(x, c[1], 1, "branch1a")
        b1 = conv_bn_relu(b1, c[2], self.kernel_sizes[0], "branch1b")
        b2 = conv_bn_relu(x, c[3], 1, "branch2a")
        b2 = conv_bn_relu(b2, c[4], self.kernel_sizes[1], "branch2b")
        b3 = max_pool(x, (3,) * self.ndim, (1,) * self.ndim, padding="same")
        b3 = conv_bn_relu(b3, c[5], 1, "branch3")
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class ConvNeuralNetwork(nn.Module):
    """Conv -> norm -> act -> dropout stack (ref: nnet/modules.py:70-130).

    Channels-last. Each layer updates lengths by (len-1)//2+1 — the
    reference hardcodes stride-2 length updates (modules.py:128).
    """

    dim_layers: Sequence[int]
    kernel_size: Any
    ndim: int = 2
    strides: Any = 1
    norm: Any = None
    act_fun: Any = "ReLU"
    drop_rate: float = 0.0
    padding: str = "same"
    weight_init: Any = "default"
    bias_init: Any = "default"
    polyphase: Any = False
    spatial_swap: bool = False  # see ops.layers.Conv.spatial_swap

    @nn.compact
    def __call__(self, x, lengths=None, deterministic: bool = True):
        dims = ([self.dim_layers] if isinstance(self.dim_layers, int)
                else list(self.dim_layers))
        for i, dim in enumerate(dims):
            ks = (self.kernel_size[i] if isinstance(self.kernel_size, list)
                  else self.kernel_size)
            st = self.strides[i] if isinstance(self.strides, list) else self.strides
            norm_cls = (norm_dict[self.norm] if isinstance(self.norm, str)
                        else self.norm)
            # Training-mode BN right after the conv makes the conv bias
            # gradient exactly zero (BN subtracts the batch mean); detach
            # it so autodiff skips the full-activation reduction.
            bias_sg = norm_cls is BatchNorm and not deterministic
            x = Conv(dim, kernel_size=ks, ndim=self.ndim, strides=st,
                     padding=self.padding, weight_init=self.weight_init,
                     bias_init=self.bias_init, polyphase=self.polyphase,
                     bias_stop_gradient=bias_sg,
                     spatial_swap=self.spatial_swap,
                     name=f"conv_{i}")(x)
            if self.norm is not None:
                if norm_cls is BatchNorm:
                    x = norm_cls()(x, use_running_average=deterministic)
                else:
                    x = norm_cls()(x)
            x = get_act(self.act_fun)(x)
            if self.drop_rate > 0:
                x = Dropout(self.drop_rate)(x, deterministic=deterministic)
            if lengths is not None:
                lengths = (lengths - 1) // 2 + 1  # ref modules.py:128
        return x if lengths is None else (x, lengths)


class ConvTransposeNeuralNetwork(nn.Module):
    """ConvTranspose -> norm -> act -> dropout stack
    (ref: nnet/modules.py:132-181)."""

    dim_layers: Sequence[int]
    kernel_size: Any
    ndim: int = 2
    strides: Any = 1
    padding: Any = 0
    output_padding: Any = 0
    norm: Any = None
    act_fun: Any = "ReLU"
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x, lengths=None, deterministic: bool = True):
        from avec_tpu.ops.layers import ConvTranspose

        dims = ([self.dim_layers] if isinstance(self.dim_layers, int)
                else list(self.dim_layers))
        for i, dim in enumerate(dims):
            ks = (self.kernel_size[i] if isinstance(self.kernel_size, list)
                  else self.kernel_size)
            st = self.strides[i] if isinstance(self.strides, list) else self.strides
            pad = self.padding[i] if isinstance(self.padding, list) else self.padding
            opad = (self.output_padding[i] if isinstance(self.output_padding, list)
                    else self.output_padding)
            x = ConvTranspose(dim, kernel_size=ks, ndim=self.ndim, strides=st,
                              padding=pad, output_padding=opad,
                              name=f"convt_{i}")(x)
            if self.norm is not None:
                norm_cls = norm_dict[self.norm] if isinstance(self.norm, str) else self.norm
                if norm_cls is BatchNorm:
                    x = norm_cls()(x, use_running_average=deterministic)
                else:
                    x = norm_cls()(x)
            x = get_act(self.act_fun)(x)
            if self.drop_rate > 0:
                x = Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x if lengths is None else (x, lengths)
