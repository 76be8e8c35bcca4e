# Copyright 2026. Apache-2.0.
"""Dataset namespace mirroring the reference's nnet.datasets module."""

from avec_tpu.data.corpus_lm import CorpusLM  # noqa: F401
from avec_tpu.data.dataset import Dataset, MultiDataset  # noqa: F401
from avec_tpu.data.lrs import LRS  # noqa: F401
from avec_tpu.data.lrw import LRW  # noqa: F401
from avec_tpu.data.synthetic import (  # noqa: F401
    SyntheticAVDataset,
    SyntheticClassificationDataset,
    SyntheticLMDataset,
)
