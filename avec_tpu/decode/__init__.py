# Copyright 2026. Apache-2.0.
"""Decoder registry (ref: nnet/decoders.py:263-268; CTCDeviceBeamSearch is
beyond parity — the whole prefix beam search as one jitted lax.scan)."""

from avec_tpu.decode.beam import CTCBeamSearchDecoder
from avec_tpu.decode.device_beam import CTCDeviceBeamSearchDecoder
from avec_tpu.decode.greedy import (
    ArgMaxDecoder,
    CTCGreedySearchDecoder,
    IdentityDecoder,
    ThresholdDecoder,
)

decoder_dict = {
    "Identity": IdentityDecoder,
    "Threshold": ThresholdDecoder,
    "ArgMax": ArgMaxDecoder,
    "CTCGreedySearchDecoder": CTCGreedySearchDecoder,
    "CTCBeamSearch": CTCBeamSearchDecoder,
    "CTCDeviceBeamSearch": CTCDeviceBeamSearchDecoder,
}
