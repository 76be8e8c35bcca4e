# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Transformer network and the GPT language-model family.

Behavioral parity targets:
  TransformerBlock  /root/reference/nnet/blocks.py:168-206
  Transformer       /root/reference/nnet/networks.py:148-200
  GPT               /root/reference/nnet/models_zoo.py:184-326

GPT sizes table (:199-230) and the normal(0, 0.02) init for Linear/Embedding
with zeroed biases / unit LayerNorm (:263-273). The causal mask is
Mask(right_context=0) combined with padding lengths when provided.
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp
import flax.linen as nn

from avec_tpu.models.conformer import AttentionModule, FeedForwardModule
from avec_tpu.ops.layers import Dropout, Embedding, LayerNorm, Linear
from avec_tpu.ops.masks import make_mask
from avec_tpu.ops.pos_embeddings import PosEmbedding1d, SinPosEmbedding

GPT_CONFIGS = {
    # GPT-Tiny is an addition for fast tests/demos (not in the reference).
    "GPT-Tiny": dict(dim_model=64, num_blocks=2, num_heads=2),
    "GPT-Small": dict(dim_model=768, num_blocks=12, num_heads=12),
    "GPT-Medium": dict(dim_model=1024, num_blocks=24, num_heads=16),
    "GPT-Large": dict(dim_model=1536, num_blocks=24, num_heads=16),
    "GPT-XL": dict(dim_model=2048, num_blocks=24, num_heads=24),
    "GPT-2.7B": dict(dim_model=2560, num_blocks=32, num_heads=32),
    "GPT-6.7B": dict(dim_model=4096, num_blocks=32, num_heads=32),
    "GPT-13.0B": dict(dim_model=5140, num_blocks=40, num_heads=40),
    "GPT-175.0B": dict(dim_model=12288, num_blocks=96, num_heads=96),
}

# Per-size LR table (ref: models_zoo.py:284-307).
GPT_LR = {
    "GPT-Tiny": (6e-4, 6e-5),
    "GPT-Small": (6e-4, 6e-5),
    "GPT-Medium": (3e-4, 3e-5),
    "GPT-Large": (2.5e-4, 2.5e-5),
    "GPT-XL": (2e-4, 2e-5),
    "GPT-2.7B": (1.6e-4, 1.6e-5),
    "GPT-6.7B": (1.2e-4, 1.2e-5),
    "GPT-13.0B": (1e-4, 1e-5),
    "GPT-175.0B": (0.6e-4, 0.6e-5),
}


class TransformerBlock(nn.Module):
    """Pre-norm attention + FFN block (ref: nnet/blocks.py:168-206)."""

    dim_model: int
    att_params: Dict
    ff_ratio: int = 4
    drop_rate: float = 0.1
    inner_dropout: bool = False
    act_fun: Any = "GELU"
    weight_init: Any = "normal_02"
    bias_init: Any = "zeros"
    post_norm: bool = False

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        x = AttentionModule(dim_model=self.dim_model, att_params=self.att_params,
                            drop_rate=self.drop_rate, residual=True,
                            name="self_att_module")(
                                x, mask=mask, deterministic=deterministic)
        x = x + FeedForwardModule(
            dim_model=self.dim_model, dim_ffn=self.dim_model * self.ff_ratio,
            drop_rate=self.drop_rate, act_fun=self.act_fun,
            inner_dropout=self.inner_dropout, weight_init=self.weight_init,
            bias_init=self.bias_init, name="ff_module")(
                x, deterministic=deterministic)
        if self.post_norm:
            x = LayerNorm()(x)
        return x


class Transformer(nn.Module):
    """Transformer stack (ref: nnet/networks.py:148-200)."""

    dim_model: int
    num_blocks: int
    att_params: Dict
    ff_ratio: int = 4
    emb_drop_rate: float = 0.1
    drop_rate: float = 0.1
    act_fun: Any = "GELU"
    pos_embedding: Optional[str] = None  # None | "sin" | "learned"
    max_pos_encoding: int = 2048
    causal: bool = True
    inner_dropout: bool = False
    weight_init: Any = "normal_02"
    bias_init: Any = "zeros"
    post_norm: bool = False

    @nn.compact
    def __call__(self, x, lengths=None, training: bool = False):
        if self.pos_embedding == "sin":
            x = SinPosEmbedding(self.max_pos_encoding, self.dim_model)(x)
        elif self.pos_embedding == "learned":
            x = PosEmbedding1d(self.max_pos_encoding, self.dim_model)(x)

        x = Dropout(self.emb_drop_rate)(x, deterministic=not training)

        mask = make_mask(x.shape[1], lengths,
                         right_context=0 if self.causal else None)

        for i in range(self.num_blocks):
            x = TransformerBlock(
                dim_model=self.dim_model, att_params=self.att_params,
                ff_ratio=self.ff_ratio, drop_rate=self.drop_rate,
                inner_dropout=self.inner_dropout, act_fun=self.act_fun,
                weight_init=self.weight_init, bias_init=self.bias_init,
                post_norm=self.post_norm, name=f"block_{i}")(
                    x, mask=mask, deterministic=not training)

        if not self.post_norm:
            x = LayerNorm()(x)
        return x


class GPTNet(nn.Module):
    """GPT network: embedding -> causal Transformer -> vocab head.

    ref: nnet/models_zoo.py:184-273. All Linear/Embedding weights N(0, 0.02),
    biases zero (:263-273).
    """

    vocab_size: int = 25000
    padding_idx: Optional[int] = None
    max_pos_encoding: int = 2048
    model: str = "GPT-Small"
    pos_embedding: str = "learned"
    drop_rate: float = 0.1
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, ids, training: bool = False):
        cfg = GPT_CONFIGS[self.model]
        x = Embedding(self.vocab_size, cfg["dim_model"],
                      padding_idx=self.padding_idx, embedding_init="normal_02",
                      name="embedding")(ids)
        x = x.astype(self.compute_dtype)
        x = Transformer(
            dim_model=cfg["dim_model"], num_blocks=cfg["num_blocks"],
            att_params={"class": "MultiHeadAttention",
                        "params": {"num_heads": cfg["num_heads"],
                                   "attn_drop_rate": self.drop_rate,
                                   "weight_init": "normal_02",
                                   "bias_init": "zeros"}},
            ff_ratio=4, emb_drop_rate=self.drop_rate, drop_rate=self.drop_rate,
            act_fun="GELU", pos_embedding=self.pos_embedding,
            max_pos_encoding=self.max_pos_encoding, causal=True,
            inner_dropout=False, name="transformer")(x, training=training)
        x = Linear(self.vocab_size, weight_init="normal_02", bias_init="zeros",
                   name="head")(x)
        return x
