# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Decoders: identity/threshold/argmax/CTC-greedy.

Behavioral parity target: /root/reference/nnet/decoders.py:37-120. Decoders
are called two ways by the engine (nnet/model.py:303-316):
  decoder(outputs)                      -> predictions (strings / labels)
  decoder(targets, from_logits=False)   -> ground truths

TPU-first split: each decoder exposes `device_fn(outputs)` — the traced part
that runs inside the jitted eval step (argmax, CTC collapse) — and
`__call__(host_outputs, from_logits)` which finishes on host (tokenizer
detokenization). The engine wires them together.
"""

from typing import Any, List, Optional

import numpy as np
import jax.numpy as jnp

from avec_tpu.ops.ctc import ctc_greedy_collapse
from avec_tpu.utils.tokenizer import load_tokenizer


class IdentityDecoder:
    """ref: nnet/decoders.py:37-44."""

    def device_fn(self, outputs):
        return outputs

    def __call__(self, outputs, from_logits: bool = True):
        return np.asarray(outputs).tolist()


class ThresholdDecoder:
    """ref: nnet/decoders.py:46-59."""

    def __init__(self, threshold: float = 0.5):
        self.threshold = threshold

    def device_fn(self, outputs):
        return outputs

    def __call__(self, outputs, from_logits: bool = True):
        if from_logits:
            arr = np.asarray(outputs)
            return np.where(arr >= self.threshold, 1, 0).squeeze(-1).tolist()
        return np.asarray(outputs).tolist()


class ArgMaxDecoder:
    """ref: nnet/decoders.py:61-75."""

    def __init__(self, axis: int = -1):
        self.axis = axis

    def device_fn(self, outputs):
        return jnp.argmax(outputs, axis=self.axis)

    def __call__(self, outputs, from_logits: bool = True):
        return np.asarray(outputs).tolist()


class CTCGreedySearchDecoder:
    """Greedy CTC: argmax -> collapse repeats -> drop blanks -> detokenize.

    ref: nnet/decoders.py:77-120. The collapse runs on-device
    (ctc_greedy_collapse); only packed token ids reach the host.
    """

    def __init__(self, tokenizer_path: str, blank_token: int = 0):
        self.tokenizer = load_tokenizer(tokenizer_path)
        self.blank_token = blank_token

    def device_fn(self, outputs):
        logits, lengths = outputs
        preds = jnp.argmax(logits, axis=-1)
        return ctc_greedy_collapse(preds, lengths, blank=self.blank_token)

    def __call__(self, outputs, from_logits: bool = True) -> List[str]:
        if from_logits:
            tokens, tok_lens = outputs
            tokens, tok_lens = np.asarray(tokens), np.asarray(tok_lens)
            ids = [tokens[b, : tok_lens[b]].tolist() for b in range(len(tokens))]
        else:
            # Targets: (labels, label_lengths) of raw token ids.
            labels, label_lens = outputs
            labels, label_lens = np.asarray(labels), np.asarray(label_lens)
            ids = [labels[b, : label_lens[b]].tolist() for b in range(len(labels))]
        return self.tokenizer.decode(ids)
