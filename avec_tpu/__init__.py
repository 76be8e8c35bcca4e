# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""avec_tpu — TPU-native Audio-Visual Efficient Conformer framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
PyTorch implementation (burchim/AVEC, WACV 2023). The public surface mirrors
the reference's `nnet` package (models, losses, metrics, decoders, datasets,
collate, transforms) so configs read the same, while the internals are
idiomatic JAX: channels-last layouts, static shapes, pjit/GSPMD data
parallelism over a device mesh, fully-jitted train/eval steps.
"""

__version__ = "0.1.0"

# --- ops / core --------------------------------------------------------
from avec_tpu.ops import activations, attention, audio, ctc, inits, layers, masks  # noqa: F401
from avec_tpu.ops.audio import AudioPreprocessing, SpecAugment  # noqa: F401
from avec_tpu.ops.ctc import ctc_loss  # noqa: F401
from avec_tpu.ops.pos_embeddings import PosEmbedding1d, SinPosEmbedding  # noqa: F401

# --- training engine ----------------------------------------------------
from avec_tpu.train import schedulers  # noqa: F401
from avec_tpu.train.model import Model  # noqa: F401
from avec_tpu.ops.rnnt import RNNTLoss, rnnt_loss  # noqa: F401
from avec_tpu.train.losses import (  # noqa: F401
    CTCLoss,
    HingeLoss,
    HuberLoss,
    MeanAbsoluteError,
    MeanLoss,
    MeanSquaredError,
    SoftmaxCrossEntropy,
)
from avec_tpu.train.metrics import (  # noqa: F401
    CategoricalAccuracy,
    CategoricalAccuracyTopK,
    Mean,
    WordErrorRate,
)
from avec_tpu.train.optim import SGD, Adam, AdamW  # noqa: F401
from avec_tpu.train.schedulers import (  # noqa: F401
    ConstantDecayScheduler,
    ConstantScheduler,
    CosineAnnealingScheduler,
    ExpDecayScheduler,
    LinearDecayScheduler,
    NoamDecayScheduler,
    WarmupConstantDecayScheduler,
)

# --- models -------------------------------------------------------------
from avec_tpu.models.encoders import (  # noqa: F401
    AudioEfficientConformerEncoder,
    AudioVisualEfficientConformerEncoder,
    VisualEfficientConformerEncoder,
)
from avec_tpu.models.resnet import ResNet  # noqa: F401
from avec_tpu.models.transformer import GPTNet, Transformer  # noqa: F401
from avec_tpu.models.zoo import (  # noqa: F401
    GPT,
    AudioEfficientConformerInterCTC,
    AudioVisualEfficientConformerInterCTC,
    Classifier,
    VisualEfficientConformerCE,
    VisualEfficientConformerInterCTC,
)

# --- decoding -----------------------------------------------------------
from avec_tpu.decode.beam import CTCBeamSearchDecoder  # noqa: F401
from avec_tpu.decode.device_beam import (  # noqa: F401
    CTCDeviceBeamSearchDecoder,
)
from avec_tpu.decode.greedy import (  # noqa: F401
    ArgMaxDecoder,
    CTCGreedySearchDecoder,
    IdentityDecoder,
    ThresholdDecoder,
)

# --- data ---------------------------------------------------------------
from avec_tpu import data  # noqa: F401
from avec_tpu.data import datasets  # noqa: F401
from avec_tpu.data.collate import Collate, CollateFn  # noqa: F401
from avec_tpu.data.loader import DataLoader  # noqa: F401
from avec_tpu.data.transforms import (  # noqa: F401
    BabbleNoise,
    CenterCrop,
    Compose,
    DenormalizeVideo,
    NormalizeVideo,
    RandomCrop,
    RandomHorizontalFlip,
    TimeMaskSecond,
    align_video_to_audio,
)

# --- utils --------------------------------------------------------------
from avec_tpu.parallel import mesh  # noqa: F401
from avec_tpu.utils.tokenizer import Tokenizer, load_tokenizer, train_tokenizer  # noqa: F401
from avec_tpu.utils.wer import wer  # noqa: F401
