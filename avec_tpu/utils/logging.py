# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Lightweight scalar logging.

The reference logs to TensorBoard (nnet/model.py:596-616). When the
tensorboard package is unavailable we fall back to an append-only JSONL file
with the same (tag, value, step) records — trivially convertible.
"""

import json
import time


class JsonlWriter:
    """SummaryWriter-compatible subset writing JSON lines."""

    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "a")

    def add_scalar(self, tag: str, value: float, step):
        self._f.write(json.dumps({"tag": tag, "value": float(value),
                                  "step": int(step) if step is not None else None,
                                  "ts": time.time()}) + "\n")
        self._f.flush()

    def add_text(self, tag: str, text: str, step=None):
        self._f.write(json.dumps({"tag": tag, "text": text,
                                  "step": step, "ts": time.time()}) + "\n")
        self._f.flush()

    def close(self):
        self._f.close()
