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
the reference implementation; convert them to this framework's format with

    python -m avec_tpu.train.torch_convert <ckpt> --config <config.py>

(or pass the .ckpt directly to eval — the loader converts on the fly).
The gdrive ids below are the reference's published public constants.
"""

import os
import sys

# (relative path, gdrive id) — the reference's published download table
# (/root/reference/download_checkpoints_and_tokenizers.py:5-55).
ARTIFACTS = [
    ("callbacks/LRS23/AO/EffConfCTC/checkpoints_swa-equal-200-210.ckpt",
     "1TPlqoSythY90xJrZRquJmMUwK4sVeAHc"),
    ("callbacks/LRS23/VO/EffConfInterCTC/checkpoints_swa-equal-90-100.ckpt",
     "1bq3Eh8zDfUK7iWG3hLd5xuorWal1krnb"),
    ("callbacks/LRS23/AV/EffConfInterCTC/checkpoints_swa-equal-60-70.ckpt",
     "1kE3HDPhnG04Zysb1RZiwNaxrVUofLRk7"),
    ("callbacks/LRS23/LM/GPT-Small/checkpoints_epoch_10_step_2860.ckpt",
     "1PSo4ZQIZPWEI_S5LHkJBo0gYhQpWzRnh"),
    ("callbacks/LibriSpeechCorpus/GPT-Small/checkpoints_epoch_13_step_512924.ckpt",
     "1V4-GMlh8dh0LXYniZb72pYqgBkVdpND6"),
    ("callbacks/LRW/EffConfCE/checkpoints_epoch_30_step_57247.ckpt",
     "1shDN2pRj8nd8XJzJuV422bnKo2Tj0rfS"),
    ("datasets/LRS3/tokenizerbpe256.model",
     "1u3U3aHaTWvR_NTftkUGv1JXkxpX1pkOL"),
    ("datasets/LRS3/tokenizerbpe1024.model",
     "1zKp376kItVhceTFSi2_-EMG3oeYbSC0U"),
    ("datasets/LRS3/6gram_lrs23.arpa",
     "1l71jUmRdQMFO2AVezxweENpZgdvL7TyD"),
]


def _download_with_gdown(gid: str, path: str) -> bool:
    try:
        import gdown
    except ImportError:
        return False
    gdown.download("https://drive.google.com/uc?id=" + gid, path, quiet=False)
    return True


def _download_with_urllib(gid: str, path: str) -> bool:
    """Fallback without gdown: direct gdrive uc endpoint (works for files
    below the virus-scan size threshold; large checkpoints need gdown)."""
    import urllib.request

    url = f"https://drive.google.com/uc?export=download&id={gid}"
    try:
        with urllib.request.urlopen(url, timeout=60) as resp:
            data = resp.read()
        if data[:15].lstrip().startswith(b"<!DOCTYPE html"):
            return False  # interstitial page, not the file
        with open(path, "wb") as f:
            f.write(data)
        return True
    except Exception as e:  # noqa: BLE001 — best-effort fallback
        print(f"  urllib fallback failed: {e}", file=sys.stderr)
        return False


def main():
    failed = []
    for path, gid in ARTIFACTS:
        if os.path.exists(path):
            print(f"exists {path}")
            continue
        os.makedirs(os.path.dirname(path), exist_ok=True)
        print(f"Download {path}")
        if not (_download_with_gdown(gid, path)
                or _download_with_urllib(gid, path)):
            failed.append((path, gid))
    if failed:
        print("\nCould not download (install gdown, or fetch manually):",
              file=sys.stderr)
        for path, gid in failed:
            print(f"  https://drive.google.com/uc?id={gid}  ->  {path}",
                  file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
