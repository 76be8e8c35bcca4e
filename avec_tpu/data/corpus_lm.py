# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Text LM dataset over a corpus file.

Behavioral parity target: /root/reference/nnet/datasets.py:602-628
(`CorpusLM`): one sample per corpus line, tokenized lowercased; when a line
exceeds max_length the sample is rejection-resampled to a random other line.
"""

from typing import Optional

import numpy as np

from avec_tpu.data.dataset import Dataset
from avec_tpu.utils.tokenizer import load_tokenizer


class CorpusLM(Dataset):
    def __init__(self, batch_size, collate_fn, root="datasets", shuffle=True,
                 download=False,
                 tokenizer_path="datasets/LRS3/tokenizerbpe1024.json",
                 max_length: Optional[int] = None,
                 corpus_path="datasets/LibriSpeechCorpus/librispeech-lm-norm.txt"):
        super().__init__(batch_size=batch_size, collate_fn=collate_fn,
                         shuffle=shuffle)
        self.root = root
        self.max_len = max_length
        self.tokenizer = (load_tokenizer(tokenizer_path)
                          if isinstance(tokenizer_path, str) else tokenizer_path)
        with open(corpus_path) as f:
            self.corpus = f.readlines()
        self._rng = np.random.RandomState(0)

    def __len__(self):
        return len(self.corpus)

    def __getitem__(self, i):
        # Rejection-resample over max_length (ref: datasets.py:619-622).
        if self.max_len:
            while len(self.tokenizer.encode(
                    self.corpus[i].replace("\n", "").lower())) > self.max_len:
                i = int(self._rng.randint(0, len(self)))
        ids = self.tokenizer.encode(self.corpus[i].replace("\n", "").lower())
        return (np.asarray(ids, dtype=np.int32),)
