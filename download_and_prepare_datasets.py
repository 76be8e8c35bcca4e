# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""Download + prepare LRS2/LRS3/LRW and build the merged training corpus.

Behavioral parity target: /root/reference/download_and_prepare_datasets.py:
instantiate each dataset with download/prepare flags, then merge the train
corpora into corpus_lrs23_pretrain+train+val.txt and train the BPE
tokenizers (functions.train_tokenizer parity).
"""

import argparse
import os

import avec_tpu as nnet


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="datasets")
    parser.add_argument("--download", action="store_true")
    parser.add_argument("--prepare", action="store_true")
    parser.add_argument("--skip_lrw", action="store_true")
    args = parser.parse_args()

    for version, modes in (("LRS2", ["pretrain", "train", "val", "test"]),
                           ("LRS3", ["pretrain", "trainval", "test"])):
        if not os.path.isdir(os.path.join(args.root, version)):
            print(f"{version} not found under {args.root}; skipping "
                  "(license-gated download, see avec_tpu/data/lrs.py)")
            continue
        ds = nnet.datasets.LRS(batch_size=None, collate_fn=None,
                               version=version, mode=modes[0], root=args.root,
                               download=args.download, prepare=args.prepare,
                               load_video=False, load_audio=False)
        for m in modes:
            ds.create_corpus(m)

    if not args.skip_lrw and os.path.isdir(os.path.join(args.root, "LRW")):
        nnet.datasets.LRW(batch_size=None, collate_fn=None, root=args.root,
                          prepare=args.prepare)

    # Merge train corpora (ref: download_and_prepare_datasets.py:30-44).
    merged = os.path.join(args.root, "LRS3",
                          "corpus_lrs23_pretrain+train+val.txt")
    parts = [os.path.join(args.root, "LRS2", f"corpus_{m}.txt")
             for m in ("pretrain", "train", "val")]
    parts += [os.path.join(args.root, "LRS3", f"corpus_{m}.txt")
              for m in ("pretrain", "trainval")]
    existing = [p for p in parts if os.path.isfile(p)]
    if existing:
        with open(merged, "w") as out:
            for p in existing:
                with open(p) as f:
                    out.write(f.read())
        # Train tokenizers (ref functions.py:193-194: BPE-256 CTC labels,
        # BPE-1024 LM).
        nnet.train_tokenizer(merged, os.path.join(args.root, "LRS3",
                                                  "tokenizerbpe256"), 256)
        nnet.train_tokenizer(merged, os.path.join(args.root, "LRS3",
                                                  "tokenizerbpe1024"), 1024)
        print(f"corpus + tokenizers written under {args.root}/LRS3")


if __name__ == "__main__":
    main()
