# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Layer library: Linear / ConvNd / pooling / norms, channels-last native.

Behavioral parity targets:
  /root/reference/nnet/layers.py (Linear :29, Conv1d/2d/3d :82/200/326,
  pooling :723-1011, Upsample :1013, Embedding :1134) and
  /root/reference/nnet/normalizations.py (LayerNorm :27, BatchNorm :42-170,
  SyncBatchNorm :172-249).

TPU-first deltas from the reference:
  * Channels-last is THE layout (TPU/XLA native); the reference's
    `channels_last` permute machinery (layers.py:1199) disappears entirely.
  * Padding policies ("valid" / "same" / "same-left" / "causal") reproduce the
    reference's explicit pre-padding: same = (k-1)//2 left, k//2 right
    (layers.py:127-137), causal = (k-1, 0).
  * SyncBatchNorm needs no special module: under pjit/GSPMD with the batch
    axis sharded, the batch-stat reductions inside BatchNorm compile to
    cross-replica collectives automatically — exactly the semantics of the
    reference's SyncBatchNorm conversion (nnet/model.py:59-61).
"""

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
import flax.linen as nn

from avec_tpu.ops.inits import get_init, torch_default_bias, zeros_init, ones_init

PaddingLike = Union[str, int, Sequence[int]]


def _tuple(v, n):
    if isinstance(v, (tuple, list)):
        assert len(v) == n
        return tuple(v)
    return (v,) * n


def conv_padding(kernel_size: Tuple[int, ...], padding: PaddingLike):
    """Resolve a reference padding policy to explicit (lo, hi) pairs.

    Also accepts a per-axis tuple of policy strings, e.g. ("same", "causal")
    for a 2-D conv that is causal in time but centered in frequency (the
    causal-streaming audio stem)."""
    n = len(kernel_size)
    if isinstance(padding, str):
        if padding == "valid":
            return tuple((0, 0) for _ in range(n))
        if padding == "same":
            return tuple(((k - 1) // 2, k // 2) for k in kernel_size)
        if padding == "same-left":
            return tuple((k // 2, (k - 1) // 2) for k in kernel_size)
        if padding == "causal":
            return tuple((k - 1, 0) for k in kernel_size)
        raise ValueError(f"unknown padding policy: {padding}")
    if (isinstance(padding, (tuple, list))
            and any(isinstance(p, str) for p in padding)):
        assert len(padding) == n
        return tuple(conv_padding((k,), p)[0]
                     for k, p in zip(kernel_size, padding))
    pads = _tuple(padding, n)
    return tuple((p, p) for p in pads)


class Linear(nn.Module):
    """Dense layer with the reference's init registry (nnet/layers.py:29-80).

    weight_init/bias_init accept registry names; "default" reproduces the
    torch nn.Linear default U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    """

    features: int
    use_bias: bool = True
    weight_init: Any = "default"
    bias_init: Any = "default"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", get_init(self.weight_init),
                            (fan_in, self.features))
        xc = x.astype(self.dtype or x.dtype)
        if xc.ndim > 2:
            # Flatten leading dims around the dot: on (B, T, d) inputs the
            # weight gradient of a direct jnp.dot is a TWO-dim contraction
            # over (B, T), which XLA-TPU lowers as a window=B convolution
            # (measured 84 us vs ~5 us roofline per FFN wgrad on v5e —
            # ~6 ms/step across the conformer stacks). Flattened, the wgrad
            # is a single-contraction matmul; the reshapes are bitcasts.
            y = jnp.dot(xc.reshape(-1, fan_in), kernel.astype(x.dtype))
            y = y.reshape(xc.shape[:-1] + (self.features,))
        else:
            y = jnp.dot(xc, kernel.astype(x.dtype))
        if self.use_bias:
            b_init = (torch_default_bias(fan_in) if self.bias_init in (None, "default")
                      else get_init(self.bias_init))
            bias = self.param("bias", b_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def _polyphase_fold(x, kernel, ks, strides, pads):
    """Space-to-depth fold shared by the XLA polyphase conv and the Pallas
    fused stem: returns (xp, kp, out_strides) — a stride-1 VALID conv
    xp * kp equals the original strided conv — or None when no axis
    qualifies (stride 2, odd kernel > 1)."""
    n = len(ks)
    split = [i for i in range(n)
             if strides[i] == 2 and ks[i] % 2 == 1 and ks[i] > 1]
    if not split:
        return None

    xp = jnp.pad(x, ((0, 0),) + tuple(pads) + ((0, 0),))
    # Split axes must have even length for the (G, 2) phase reshape; an extra
    # zero row on the right is outside every output's receptive field or
    # contributes additive zero.
    extra = [(0, xp.shape[1 + i] % 2) if i in split else (0, 0)
             for i in range(n)]
    if any(e != (0, 0) for e in extra):
        xp = jnp.pad(xp, ((0, 0),) + tuple(extra) + ((0, 0),))

    # Space-to-depth: reshape each split axis into (G, 2) pairs, then move
    # all phase axes to just before the channel axis (phase-major order).
    new_shape = [xp.shape[0]]
    for i in range(n):
        if i in split:
            new_shape += [xp.shape[1 + i] // 2, 2]
        else:
            new_shape += [xp.shape[1 + i]]
    new_shape += [xp.shape[-1]]
    xp = xp.reshape(new_shape)
    perm, phase_axes, pos = [0], [], 1
    for i in range(n):
        perm.append(pos)
        if i in split:
            phase_axes.append(pos + 1)
            pos += 2
        else:
            pos += 1
    xp = xp.transpose(perm + phase_axes + [pos])
    xp = xp.reshape(xp.shape[:n + 1] + (-1,))

    # Kernel: pad each split tap axis to 2*ceil(k/2), reshape (taps, 2),
    # move phases before C_in in the same phase-major order as the input.
    padk = [(0, ks[i] % 2) if i in split else (0, 0) for i in range(n)]
    kp = jnp.pad(kernel, padk + [(0, 0), (0, 0)])
    new_kshape = []
    for i in range(n):
        if i in split:
            new_kshape += [kp.shape[i] // 2, 2]
        else:
            new_kshape += [kp.shape[i]]
    new_kshape += [kernel.shape[-2], kernel.shape[-1]]
    kp = kp.reshape(new_kshape)
    kperm, kphase, pos = [], [], 0
    for i in range(n):
        kperm.append(pos)
        if i in split:
            kphase.append(pos + 1)
            pos += 2
        else:
            pos += 1
    kp = kp.transpose(kperm + kphase + [pos, pos + 1])
    kp = kp.reshape(kp.shape[:n] + (-1, kernel.shape[-1]))

    out_strides = tuple(1 if i in split else strides[i] for i in range(n))
    return xp, kp, out_strides


def _polyphase_conv(x, kernel, ks, strides, pads, unroll_taps=False):
    """Stride-2 conv with few input channels as a space-to-depth conv.

    A conv like the AVEC video stem (Conv3d 1->64, k=(5,7,7), s=(1,2,2),
    ref nnet/networks.py:459-473) maps terribly onto the MXU: the
    contraction dim per output is C_in*prod(k) with C_in=1 and XLA's
    conv emitters fall off a cliff (measured 177 ms fwd+bwd for the stem at
    B=16 on a v5e). Folding each stride-2 spatial axis into the channel dim
    (polyphase decomposition: out[h] = sum_{t,ph} k[2t+ph] * x_phase_ph[h+t])
    turns it into a stride-1 conv with 4x the input channels and ~half-width
    kernels — mathematically identical, 9x faster measured.

    Applies to axes with stride 2 and odd kernel > 1; returns None when no
    axis qualifies (caller falls back to the direct conv).
    """
    n = len(ks)
    folded = _polyphase_fold(x, kernel, ks, strides, pads)
    if folded is None:
        return None
    xp, kp, out_strides = folded

    if unroll_taps:
        # Also fold stride-1 tap axes (e.g. the stem's kT=5 time axis) into
        # channels: XLA's weight-gradient conv for a (5,4,4)-tap kernel is
        # far slower than for a (1,4,4) one (measured 10x on v5e). Each tap
        # becomes a shifted slice concatenated channel-major; the kernel
        # axis moves next to C_in in the same tap-major order.
        split = [i for i in range(n)
                 if strides[i] == 2 and ks[i] % 2 == 1 and ks[i] > 1]
        for i in range(n):
            if i in split or ks[i] <= 1 or strides[i] != 1:
                continue
            klen = kp.shape[i]
            out_len = xp.shape[1 + i] - klen + 1
            xp = jnp.concatenate(
                [lax.slice_in_dim(xp, dt, dt + out_len, axis=1 + i)
                 for dt in range(klen)], axis=-1)
            # kernel axis i -> tap-major channel block
            kperm2 = [a for a in range(n) if a != i] + [i, n, n + 1]
            kp = kp.transpose(kperm2)
            kp = kp.reshape(kp.shape[:n - 1] + (1,) * 1
                            + (klen * kp.shape[-2], kp.shape[-1]))
            # restore spatial axis order: the collapsed axis i is now size 1
            # and sits at position n-1; move it back to position i.
            order = list(range(n - 1))
            order.insert(i, n - 1)
            kp = kp.transpose(order + [n, n + 1])

    dn = lax.conv_dimension_numbers(
        xp.shape, kp.shape,
        ("NHWC"[:1] + "DHW"[3 - n:] + "C", "DHW"[3 - n:] + "IO",
         "NHWC"[:1] + "DHW"[3 - n:] + "C"))
    return lax.conv_general_dilated(
        xp, kp, window_strides=out_strides,
        padding=((0, 0),) * n, dimension_numbers=dn,
        preferred_element_type=x.dtype)


class Conv(nn.Module):
    """N-d convolution, channels-last, reference padding policies.

    Mirrors nnet/layers.py Conv1d/2d/3d: explicit zero pre-padding + VALID
    conv, torch-default init unless overridden via registry names.
    """

    features: int
    kernel_size: Union[int, Sequence[int]]
    ndim: int = 1
    strides: Union[int, Sequence[int]] = 1
    padding: PaddingLike = "same"
    groups: int = 1
    use_bias: bool = True
    weight_init: Any = "default"
    bias_init: Any = "default"
    # Optional fixed weight mask (PixelCNN A/B-style causal masks,
    # ref nnet/layers.py:468-484): array broadcastable to the kernel.
    kernel_mask: Optional[Any] = None
    # Lower stride-2 axes via polyphase space-to-depth (MXU-friendly for
    # small-C_in stems; see _polyphase_conv). "full" additionally unrolls
    # stride-1 tap axes into channels (fast weight-gradient). Parameters
    # keep the reference shape, so checkpoints are unaffected.
    polyphase: Any = False
    # Detach the bias from the gradient path. Used when the conv feeds a
    # training-mode BatchNorm: BN subtracts the batch mean, so the bias
    # gradient is EXACTLY zero analytically — but autodiff computes it as a
    # full reduction over the activation (~3 ms/step for the video stem at
    # B=16). The forward value is unchanged.
    bias_stop_gradient: bool = False
    # 2-D only: swap the kernel's two spatial axes at apply time. Lets a
    # caller feed the input with its spatial axes transposed (e.g. the
    # audio stem running time-major so the (B,F,T,C)->(B,T,F*C) flatten
    # after it is a bitcast instead of a 69 MB transpose copy) while the
    # stored param — and therefore checkpoints and the torch converter —
    # keeps the reference (kh, kw) layout. The caller must also swap its
    # per-axis padding/strides. Math is identical: conv with transposed
    # input and transposed kernel is the transpose of the original conv.
    spatial_swap: bool = False

    @nn.compact
    def __call__(self, x):
        ks = _tuple(self.kernel_size, self.ndim)
        strides = _tuple(self.strides, self.ndim)
        pads = conv_padding(ks, self.padding)
        in_ch = x.shape[-1]
        assert in_ch % self.groups == 0
        kernel_shape = ks + (in_ch // self.groups, self.features)
        if self.spatial_swap:
            assert self.ndim == 2, "spatial_swap is 2-D only"
            # ks/strides/pads arrive in the caller's swapped (axis1, axis0)
            # order; the stored param keeps the reference (axis0, axis1)
            # layout, so its shape uses the un-swapped order.
            param_shape = (kernel_shape[1], kernel_shape[0]) + kernel_shape[2:]
        else:
            param_shape = kernel_shape
        # torch fan_in for conv = (in_ch / groups) * prod(kernel).
        kernel = self.param("kernel", get_init(self.weight_init), param_shape)
        if self.spatial_swap:
            kernel = kernel.transpose(1, 0, 2, 3)
        if self.kernel_mask is not None:
            kernel = kernel * jnp.asarray(self.kernel_mask, kernel.dtype)
        y = None
        if self.polyphase and self.groups == 1 and self.kernel_mask is None:
            y = _polyphase_conv(x, kernel.astype(x.dtype), ks, strides, pads,
                                unroll_taps=(self.polyphase == "full"))
        if y is None:
            dn = lax.conv_dimension_numbers(
                x.shape, kernel_shape,
                ("NHWC"[:1] + "DHW"[3 - self.ndim:] + "C",
                 "DHW"[3 - self.ndim:] + "IO",
                 "NHWC"[:1] + "DHW"[3 - self.ndim:] + "C"))
            y = lax.conv_general_dilated(
                x, kernel.astype(x.dtype), window_strides=strides, padding=pads,
                dimension_numbers=dn, feature_group_count=self.groups,
                preferred_element_type=x.dtype)
        if self.use_bias:
            fan_in = (in_ch // self.groups) * int(np.prod(ks))
            b_init = (torch_default_bias(fan_in) if self.bias_init in (None, "default")
                      else get_init(self.bias_init))
            bias = self.param("bias", b_init, (self.features,))
            if self.bias_stop_gradient:
                bias = lax.stop_gradient(bias)
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose(nn.Module):
    """N-d transposed convolution, channels-last (nnet/layers.py:505-721)."""

    features: int
    kernel_size: Union[int, Sequence[int]]
    ndim: int = 1
    strides: Union[int, Sequence[int]] = 1
    padding: Union[int, Sequence[int]] = 0
    output_padding: Union[int, Sequence[int]] = 0
    use_bias: bool = True
    weight_init: Any = "default"
    bias_init: Any = "default"

    @nn.compact
    def __call__(self, x):
        ks = _tuple(self.kernel_size, self.ndim)
        strides = _tuple(self.strides, self.ndim)
        pads = _tuple(self.padding, self.ndim)
        out_pads = _tuple(self.output_padding, self.ndim)
        in_ch = x.shape[-1]
        kernel_shape = ks + (in_ch, self.features)
        kernel = self.param("kernel", get_init(self.weight_init), kernel_shape)
        # torch ConvTranspose output: (T-1)*s - 2p + k + output_padding.
        pad_cfg = tuple((k - 1 - p, k - 1 - p + op)
                        for k, p, op in zip(ks, pads, out_pads))
        dn = lax.conv_dimension_numbers(
            x.shape, kernel_shape,
            ("N" + "DHW"[3 - self.ndim:] + "C",
             "DHW"[3 - self.ndim:] + "IO",
             "N" + "DHW"[3 - self.ndim:] + "C"))
        y = lax.conv_general_dilated(
            x, jnp.flip(kernel, axis=tuple(range(self.ndim))).astype(x.dtype),
            window_strides=(1,) * self.ndim, padding=pad_cfg,
            lhs_dilation=strides, dimension_numbers=dn,
            preferred_element_type=x.dtype)
        if self.use_bias:
            fan_in = in_ch * int(np.prod(ks))
            b_init = (torch_default_bias(fan_in) if self.bias_init in (None, "default")
                      else get_init(self.bias_init))
            bias = self.param("bias", b_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def _reduce_window_max(x, ks, strides, pads):
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -jnp.inf
    else:
        init = jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, init, lax.max, (1,) + ks + (1,), (1,) + strides + (1,),
        ((0, 0),) + pads + ((0, 0),))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _max_pool_vjp(x, ks, strides, pads):
    """reduce_window(max) behind a custom_vjp.

    reduce_window has no linearization rule under lax.scan/nn.scan
    partial-eval ("Linearization failed to produce known values..."), but it
    is 14x faster than the shifted-view formulation on a v5e. custom_vjp
    makes the op opaque to linearization (same mechanism the Pallas flash
    attention uses inside scanned conformer blocks); the backward invokes
    reduce_window's own native vjp (select-and-scatter), which only needs to
    execute, never to be linearized.

    Constraint: custom_vjp is reverse-mode only — jax.jvp/jax.jacfwd/
    jax.hessian through max_pool raise. The training stack only ever uses
    reverse-mode grad; forward-mode users can call _reduce_window_max
    directly (it is jvp-able outside scans).
    """
    return _reduce_window_max(x, ks, strides, pads)


def _max_pool_fwd(x, ks, strides, pads):
    return _reduce_window_max(x, ks, strides, pads), x


def _max_pool_bwd(ks, strides, pads, x, g):
    _, vjp = jax.vjp(lambda t: _reduce_window_max(t, ks, strides, pads), x)
    return (vjp(g)[0],)


_max_pool_vjp.defvjp(_max_pool_fwd, _max_pool_bwd)


def max_pool(x, kernel_size, strides=None, padding: PaddingLike = "valid"):
    """Channels-last max pool with reference padding policies.

    Padded positions use -inf so they never win (torch pads with -inf too).
    """
    n = x.ndim - 2
    ks = _tuple(kernel_size, n)
    strides = _tuple(strides if strides is not None else kernel_size, n)
    pads = conv_padding(ks, padding)
    if jnp.issubdtype(x.dtype, jnp.floating):
        return _max_pool_vjp(x, ks, strides, pads)
    return _reduce_window_max(x, ks, strides, pads)


def _pool_views(x, ks, strides, padding, pad_value):
    """Stack of prod(ks) strided views covering each pooling window."""
    import itertools

    n = x.ndim - 2
    pads = conv_padding(ks, padding)
    x = jnp.pad(x, ((0, 0),) + pads + ((0, 0),), constant_values=pad_value)
    out_shape = [(x.shape[1 + i] - ks[i]) // strides[i] + 1 for i in range(n)]
    views = []
    for offsets in itertools.product(*[range(k) for k in ks]):
        idx = tuple(slice(o, o + (out_shape[i] - 1) * strides[i] + 1, strides[i])
                    for i, o in enumerate(offsets))
        views.append(x[(slice(None),) + idx + (slice(None),)])
    return views


def avg_pool(x, kernel_size, strides=None, padding: PaddingLike = "valid"):
    """Channels-last average pool (count includes padding, as torch default).

    Kept as a sum over shifted strided views: its only model use is the tiny
    non-overlapping patch-attention pool (k=s=3) inside nn.scan'd conformer
    blocks, where reduce_window(add) cannot be linearized (see
    _max_pool_vjp) and views are already cheap.
    """
    n = x.ndim - 2
    ks = _tuple(kernel_size, n)
    strides = _tuple(strides if strides is not None else kernel_size, n)
    views = _pool_views(x, ks, strides, padding, 0)
    out = views[0]
    for v in views[1:]:
        out = out + v
    return out / np.prod(ks)


def upsample_nearest(x, scale_factor: int, axis: int = 1):
    """Nearest-neighbor upsample along one axis (nnet/layers.py:1013-1047)."""
    return jnp.repeat(x, scale_factor, axis=axis)


def global_avg_pool(x, axes=None):
    """Mean over all spatial axes (nnet/layers.py GlobalAvgPool)."""
    if axes is None:
        axes = tuple(range(1, x.ndim - 1))
    return x.mean(axis=axes)


def global_max_pool(x, axes=None):
    """Max over all spatial axes (nnet/layers.py GlobalMaxPool2d :1000s)."""
    if axes is None:
        axes = tuple(range(1, x.ndim - 1))
    return x.max(axis=axes)


def pixelcnn_mask(kernel_size: Sequence[int], mask_type: str = "A") -> np.ndarray:
    """PixelCNN A/B causal kernel mask over spatial dims
    (ref: nnet/layers.py:468-484). Shape (*kernel, 1, 1)."""
    ks = tuple(kernel_size)
    mask = np.ones(ks, dtype=np.float32)
    center = [k // 2 for k in ks]
    flat = mask.reshape(-1)
    center_flat = int(np.ravel_multi_index(center, ks))
    cutoff = center_flat if mask_type == "A" else center_flat + 1
    flat[cutoff:] = 0.0
    return mask.reshape(ks + (1, 1))


class LayerNorm(nn.Module):
    """LayerNorm over the last axis (nnet/normalizations.py:27-40).

    Stats in fp32 for bf16 inputs; affine params initialized to ones/zeros.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", ones_init, (dim,))
        bias = self.param("bias", zeros_init, (dim,))
        return _ln_apply(x, scale, bias, self.epsilon)


def _ln_apply(x, scale, bias, epsilon):
    """LayerNorm stats + apply (f32 stats, output in x.dtype)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + epsilon)
    return (y.astype(x.dtype) * scale.astype(x.dtype)) + bias.astype(x.dtype)


def _bn_apply(x, mean, var, scale, bias, epsilon):
    """Normalize + affine in f32, output in x.dtype.

    NOTE (round 4, measured): wrapping this (and _ln_apply, and the gated
    activations) in jax.checkpoint(nothing_saveable) to keep the f32
    upcast out of the backward residuals was tried and REGRESSED the AV
    train step 194.5 -> 185.4 utt/s/chip (v5e, B=16). The profile showed
    the damage concentrated exactly where BNs are dense (video_resnet
    +1.5 ms, video_stem +1.65 ms/step) while the LN/activation-heavy
    conformer buckets were flat: XLA already fuses these elementwise
    chains into the conv/matmul backward fusions, and the checkpoint
    boundary *prevents* that fusion, materializing the rematerialized
    subgraph's outputs instead. Plain composition is the fast form.
    """
    y = (x.astype(jnp.float32) - mean) * lax.rsqrt(var + epsilon)
    return (y * scale + bias).astype(x.dtype)


class BatchNorm(nn.Module):
    """BatchNorm over all non-channel axes (nnet/normalizations.py:42-170).

    torch defaults: eps=1e-5, momentum=0.1 (-> linen momentum 0.9).
    `frozen=True` forces eval-mode statistics even in training, matching the
    reference's frozen flag (:79-87). Under a sharded batch axis, the batch
    reductions become cross-replica collectives (sync-BN parity, see module
    docstring).
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    frozen: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None,
                 precomputed=None):
        use_ra = nn.merge_param("use_running_average",
                                self.use_running_average, use_running_average)
        use_ra = use_ra or self.frozen
        if precomputed is not None:
            # Fused-kernel path (ops/pallas_conv_module): the kernel already
            # normalized with these batch stats; this call only performs the
            # RUNNING-stat update so the variable tree and semantics match
            # the unfused path exactly. `precomputed` is (mean, biased_var,
            # n_elements) with f32 stats.
            assert not use_ra and not self.frozen
            mean, var, n = precomputed
            dim = mean.shape[-1]
            ra_mean = self.variable("batch_stats", "mean",
                                    lambda: jnp.zeros((dim,), jnp.float32))
            ra_var = self.variable("batch_stats", "var",
                                   lambda: jnp.ones((dim,), jnp.float32))
            self.param("scale", ones_init, (dim,))
            self.param("bias", zeros_init, (dim,))
            if not self.is_initializing():
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * unbiased)
            return None
        dim = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((dim,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((dim,), jnp.float32))
        scale = self.param("scale", ones_init, (dim,))
        bias = self.param("bias", zeros_init, (dim,))
        axes = tuple(range(x.ndim - 1))
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            # Single-pass batch statistics: E[x] and E[x^2] are sibling
            # reductions over the same operand, so XLA fuses them into ONE
            # sweep of the activation (the two-pass mean-then-centered-var
            # formulation costs a second full HBM read — measured ~9 ms/step
            # of BN reduce time on the v5e AV model). f32 accumulation;
            # max(., 0) guards the subtraction against rounding.
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=axes)
            var = jnp.maximum((xf * xf).mean(axis=axes) - mean * mean, 0.0)
            if not self.is_initializing():
                n = np.prod([x.shape[a] for a in axes])
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * unbiased)
        return _bn_apply(x, mean, var, scale, bias, self.epsilon)


class GroupNorm(nn.Module):
    """GroupNorm, channels-last (nnet/normalizations.py:285-304)."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.epsilon)(x)


class InstanceNorm(nn.Module):
    """InstanceNorm over spatial axes per sample+channel
    (nnet/normalizations.py:251-283). torch default: no affine."""

    epsilon: float = 1e-5
    affine: bool = False

    @nn.compact
    def __call__(self, x):
        axes = tuple(range(1, x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=axes, keepdims=True)
        var = ((xf - mean) ** 2).mean(axis=axes, keepdims=True)
        y = (xf - mean) * lax.rsqrt(var + self.epsilon)
        if self.affine:
            dim = x.shape[-1]
            scale = self.param("scale", ones_init, (dim,))
            bias = self.param("bias", zeros_init, (dim,))
            y = y * scale + bias
        return y.astype(x.dtype)


class Embedding(nn.Module):
    """Token embedding (nnet/layers.py:1134-1181). torch default init N(0,1)."""

    num_embeddings: int
    features: int
    padding_idx: Optional[int] = None
    embedding_init: Any = None  # init registry name; default torch N(0, 1)

    @nn.compact
    def __call__(self, ids):
        def init(key, shape, dtype=jnp.float32):
            if self.embedding_init is not None:
                table = get_init(self.embedding_init)(key, shape, dtype)
            else:
                table = jax.random.normal(key, shape, dtype)
            if self.padding_idx is not None:
                table = table.at[self.padding_idx].set(0.0)
            return table

        table = self.param("embedding", init, (self.num_embeddings, self.features))
        return jnp.take(table, ids, axis=0)


class Dropout(nn.Module):
    """Dropout keyed off the 'dropout' rng collection."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, p=keep, shape=x.shape)
        return jnp.where(mask, x / keep, jnp.zeros((), x.dtype))


class LSTM(nn.Module):
    """Multi-layer (optionally bidirectional) LSTM over (B, T, D).

    Parity target: nnet/layers.py:1049-1132 (torch LSTM wrapper with
    batch_first semantics). Built on linen's scan-based OptimizedLSTMCell.
    """

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x):
        for layer in range(self.num_layers):
            fwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                         name=f"lstm_{layer}")
            if self.bidirectional:
                bwd = nn.RNN(nn.OptimizedLSTMCell(self.hidden_size),
                             reverse=True, keep_order=True,
                             name=f"lstm_{layer}_rev")
                x = jnp.concatenate([fwd(x), bwd(x)], axis=-1)
            else:
                x = fwd(x)
        return x


norm_dict = {
    "LayerNorm": LayerNorm,
    "BatchNorm1d": BatchNorm,
    "BatchNorm2d": BatchNorm,
    "BatchNorm3d": BatchNorm,
    # SyncBatchNorm parity: under a sharded batch axis plain BatchNorm IS
    # synchronized (GSPMD inserts the cross-replica reductions).
    "SyncBatchNorm": BatchNorm,
    "GroupNorm": GroupNorm,
    "InstanceNorm2d": InstanceNorm,
    "InstanceNorm3d": InstanceNorm,
    None: None,
}

# Layer registry mirroring nnet/layers.py:1372 (classes usable via string
# specs in block configs).
layer_dict = {
    "Linear": Linear,
    "Conv1d": lambda *a, **k: Conv(*a, ndim=1, **k),
    "Conv2d": lambda *a, **k: Conv(*a, ndim=2, **k),
    "Conv3d": lambda *a, **k: Conv(*a, ndim=3, **k),
    "ConvTranspose1d": lambda *a, **k: ConvTranspose(*a, ndim=1, **k),
    "ConvTranspose2d": lambda *a, **k: ConvTranspose(*a, ndim=2, **k),
    "ConvTranspose3d": lambda *a, **k: ConvTranspose(*a, ndim=3, **k),
    "LSTM": LSTM,
    "Embedding": Embedding,
    "Dropout": Dropout,
}
