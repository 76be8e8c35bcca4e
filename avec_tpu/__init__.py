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

# Lazy-ish re-exports: keep import light; heavy subpackages import on demand.
from avec_tpu.ops import activations, inits, masks, audio, ctc, layers, attention  # noqa: F401
from avec_tpu.train import schedulers  # noqa: F401
