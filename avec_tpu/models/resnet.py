# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""ResNet family (18/34/50/101/152), channels-last NHWC.

Behavioral parity targets:
  ResNetBlock           /root/reference/nnet/blocks.py:29-91
  ResNetBottleneckBlock /root/reference/nnet/blocks.py:93-162
  ResNet                /root/reference/nnet/networks.py:32-146

AVEC uses ResNet18 without the stem as the visual front-end trunk
(networks.py:472: include_stem=False, dim_output=256). Convs are bias-free
with he_normal init, "same" padding, joined post-activation after the
residual add.
"""

from typing import Any, Sequence, Tuple

import flax.linen as nn

from avec_tpu.ops.activations import get_act
from avec_tpu.ops.layers import BatchNorm, Conv, Linear, global_avg_pool, max_pool

_CONFIGS = {
    "ResNet18": dict(dim_stem=64, dim_blocks=(64, 128, 256, 512),
                     num_blocks=(2, 2, 2, 2), bottleneck=False),
    "ResNet34": dict(dim_stem=64, dim_blocks=(64, 128, 256, 512),
                     num_blocks=(3, 4, 6, 3), bottleneck=False),
    "ResNet50": dict(dim_stem=64, dim_blocks=(256, 512, 1024, 2048),
                     num_blocks=(3, 4, 6, 3), bottleneck=True),
    "ResNet101": dict(dim_stem=64, dim_blocks=(256, 512, 1024, 2048),
                      num_blocks=(3, 4, 23, 3), bottleneck=True),
    "ResNet152": dict(dim_stem=64, dim_blocks=(256, 512, 1024, 2048),
                      num_blocks=(3, 8, 36, 3), bottleneck=True),
}


class ResNetBlock(nn.Module):
    """Basic residual block (ref: nnet/blocks.py:29-91)."""

    out_features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    act_fun: Any = "ReLU"
    joined_post_act: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_act(self.act_fun)
        in_features = x.shape[-1]
        y = Conv(self.out_features, self.kernel_size, ndim=2,
                 strides=self.strides, use_bias=False,
                 weight_init="he_normal", name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=deterministic)
        y = act(y)
        y = Conv(self.out_features, self.kernel_size, ndim=2,
                 use_bias=False, weight_init="he_normal", name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=deterministic)
        if not self.joined_post_act:
            y = act(y)
        if self.strides != (1, 1) or in_features != self.out_features:
            res = Conv(self.out_features, 1, ndim=2, strides=self.strides,
                       use_bias=False, weight_init="he_normal",
                       name="res_conv")(x)
            res = BatchNorm(name="res_bn")(res, use_running_average=deterministic)
        else:
            res = x
        out = y + res
        if self.joined_post_act:
            out = act(out)
        return out


class ResNetBottleneckBlock(nn.Module):
    """Bottleneck block (ref: nnet/blocks.py:93-162)."""

    out_features: int
    bottleneck_ratio: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    act_fun: Any = "ReLU"
    joined_post_act: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        act = get_act(self.act_fun)
        in_features = x.shape[-1]
        mid = in_features // self.bottleneck_ratio
        y = Conv(mid, 1, ndim=2, use_bias=False, weight_init="he_normal",
                 name="conv1")(x)
        y = BatchNorm(name="bn1")(y, use_running_average=deterministic)
        y = act(y)
        y = Conv(mid, self.kernel_size, ndim=2, strides=self.strides,
                 use_bias=False, weight_init="he_normal", name="conv2")(y)
        y = BatchNorm(name="bn2")(y, use_running_average=deterministic)
        y = act(y)
        y = Conv(self.out_features, 1, ndim=2, use_bias=False,
                 weight_init="he_normal", name="conv3")(y)
        y = BatchNorm(name="bn3")(y, use_running_average=deterministic)
        if not self.joined_post_act:
            y = act(y)
        if self.strides != (1, 1) or in_features != self.out_features:
            res = Conv(self.out_features, 1, ndim=2, strides=self.strides,
                       use_bias=False, weight_init="he_normal",
                       name="res_conv")(x)
            res = BatchNorm(name="res_bn")(res, use_running_average=deterministic)
        else:
            res = x
        out = y + res
        if self.joined_post_act:
            out = act(out)
        return out


class ResNet(nn.Module):
    """ResNet trunk (ref: nnet/networks.py:32-146). Input NHWC.

    Stage 0 block 0: stride 1, bottleneck_ratio 1; later stage-entry blocks:
    stride 2, ratio 2; remaining blocks: stride 1, ratio 4 (:88-106).
    """

    model: str = "ResNet50"
    dim_output: int = 1000
    include_stem: bool = True
    include_head: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = _CONFIGS[self.model]
        if self.include_stem:
            x = Conv(cfg["dim_stem"], (7, 7), ndim=2, strides=(2, 2),
                     use_bias=False, weight_init="he_normal", name="stem_conv")(x)
            x = BatchNorm(name="stem_bn")(x, use_running_average=deterministic)
            x = get_act("ReLU")(x)
            x = max_pool(x, (3, 3), (2, 2), padding=1)

        i = 0
        for stage_id in range(4):
            for block_id in range(cfg["num_blocks"][stage_id]):
                if block_id == 0 and stage_id == 0:
                    strides, ratio = (1, 1), 1
                elif block_id == 0:
                    strides, ratio = (2, 2), 2
                else:
                    strides, ratio = (1, 1), 4
                if cfg["bottleneck"]:
                    x = ResNetBottleneckBlock(
                        out_features=cfg["dim_blocks"][stage_id],
                        bottleneck_ratio=ratio, strides=strides,
                        name=f"block_{i}")(x, deterministic=deterministic)
                else:
                    x = ResNetBlock(
                        out_features=cfg["dim_blocks"][stage_id],
                        strides=strides, name=f"block_{i}")(
                            x, deterministic=deterministic)
                i += 1

        if self.include_head:
            x = global_avg_pool(x)
            x = Linear(self.dim_output, weight_init="he_normal",
                       bias_init="zeros", name="head")(x)
        return x
