#!/usr/bin/env bash
# Evaluate all released checkpoints (parity: /root/reference/eval_models.sh).
set -e

# Audio-only Efficient Conformer (expected: 2.4%/2.0% WER LRS2/LRS3)
python main.py -c configs/LRS23/AO/EffConfCTC.py -m evaluation -i checkpoints_swa-equal-200-210.ckpt

# Visual-only Efficient Conformer (expected: 29.8%/37.5% WER)
python main.py -c configs/LRS23/VO/EffConfInterCTC.py -m evaluation -i checkpoints_swa-equal-90-100.ckpt

# Audio-visual Efficient Conformer (expected: 2.3%/1.8% WER)
python main.py -c configs/LRS23/AV/EffConfInterCTC.py -m evaluation -i checkpoints_swa-equal-60-70.ckpt

# LRW classifier
python main.py -c configs/LRW/EffConfCE.py -m evaluation -i checkpoints_epoch_30_step_57247.ckpt

# GPT-Small LM
python main.py -c configs/LRS23/LM/GPT-Small.py -m evaluation -i checkpoints_epoch_10_step_2860.ckpt
