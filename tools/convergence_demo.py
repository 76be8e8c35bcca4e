# Copyright 2026.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
# You may obtain a copy of the License at
#
#     http://www.apache.org/licenses/LICENSE-2.0

"""End-to-end learning demonstration on synthetic tone 'speech'.

Each token is a 100 ms sinusoid burst at a token-specific frequency; the full
Audio Efficient Conformer InterCTC pipeline (fbank -> SpecAugment -> conformer
-> CTC + InterCTC losses -> greedy decode -> WER) must learn to transcribe it.
This exercises training, decoding and metrics on real hardware and verifies
the framework actually learns (the published-WER parity run needs the
license-gated LRS data; this is the self-contained stand-in).

Usage: python tools/convergence_demo.py [--steps 300] [--eval_every 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class ToneDataset:
    """Synthetic 'speech': tokens -> 0.1s tone bursts with silence gaps."""

    def __init__(self, num_samples=512, vocab_size=32, min_len=2, max_len=8,
                 sr=16000, seed=0):
        from avec_tpu.data.collate import CollateFn

        self.num_samples = num_samples
        self.vocab_size = vocab_size
        self.min_len, self.max_len = min_len, max_len
        self.sr = sr
        self.seed = seed
        self.shuffle = True
        self.batch_size = 16
        self.collate_fn = CollateFn(
            inputs_params=[{"axis": 0, "padding": True}, {"axis": 1}],
            targets_params=({"axis": 2, "padding": True}, {"axis": 3}))

    def __len__(self):
        return self.num_samples

    def __getitem__(self, idx):
        rng = np.random.RandomState(self.seed + idx)
        n = rng.randint(self.min_len, self.max_len + 1)
        tokens = rng.randint(1, self.vocab_size, size=n).astype(np.int32)
        burst = int(0.1 * self.sr)
        gap = int(0.05 * self.sr)
        t = np.arange(burst) / self.sr
        pieces = []
        for tok in tokens:
            freq = 200.0 + 120.0 * tok
            env = np.hanning(burst)
            pieces.append((np.sin(2 * np.pi * freq * t) * env).astype(np.float32))
            pieces.append(np.zeros(gap, np.float32))
        audio = np.concatenate(pieces) * 0.3
        true_len = audio.shape[0]
        # Fixed shapes: ONE train-step compilation (TPU-tunnel compiles are
        # expensive; true lengths mask the padding).
        max_audio = self.max_len * (burst + gap)
        audio = np.pad(audio, (0, max_audio - true_len))
        audio += rng.randn(max_audio).astype(np.float32) * 0.01
        tokens_fixed = np.zeros(self.max_len, np.int32)
        tokens_fixed[:n] = tokens
        return (audio.astype(np.float32), np.int32(true_len),
                tokens_fixed, np.int32(n))


def make_token_tokenizer(vocab_size):
    from avec_tpu.utils.tokenizer import Tokenizer, WORD_BOUNDARY

    pieces = ["<unk>"] + [f"{WORD_BOUNDARY}w{i}" for i in range(1, vocab_size)]
    return Tokenizer(pieces)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--eval_every", type=int, default=100)
    parser.add_argument("--vocab", type=int, default=32)
    parser.add_argument("--assert_wer", type=float, default=None,
                        help="Fail unless final WER < this value")
    args = parser.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/avec_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass

    import avec_tpu as nnet
    from avec_tpu.data.loader import DataLoader
    from avec_tpu.decode.greedy import CTCGreedySearchDecoder
    from avec_tpu.train.optim import Adam
    from avec_tpu.train.schedulers import NoamDecayScheduler

    tok = make_token_tokenizer(args.vocab)
    tok_path = "/tmp/tone_tok.json"
    tok.save(tok_path)

    # Enough samples that one 'epoch' covers eval_every optimizer steps.
    train = ToneDataset(num_samples=args.eval_every * 16, vocab_size=args.vocab,
                        seed=0)
    test = ToneDataset(num_samples=64, vocab_size=args.vocab, seed=10_000_000)
    test.shuffle = False

    model = nnet.AudioEfficientConformerInterCTC(
        vocab_size=args.vocab, att_type="patch", interctc_blocks=[3, 6, 10, 13])
    model.compile(
        losses=nnet.CTCLoss(zero_infinity=True, assert_shorter=False),
        loss_weights=[0.5 / 4] * 4 + [0.5],
        optimizer=Adam(lr=NoamDecayScheduler(warmup_steps=1000, dim_decay=360,
                                             val_factor=1.5),
                       betas=(0.9, 0.98), eps=1e-9, weight_decay=1e-6),
        metrics={"outputs": nnet.WordErrorRate()},
        decoders={"outputs": CTCGreedySearchDecoder(tok_path)})

    train_loader = DataLoader(train, batch_size=train.batch_size,
                              drop_last=True, prefetch=2)
    eval_loader = DataLoader(test, batch_size=16, shuffle=False, prefetch=2)

    steps_per_epoch = args.eval_every
    epochs = (args.steps + steps_per_epoch - 1) // steps_per_epoch
    t0 = time.time()
    wers = []
    for epoch in range(epochs):
        model.fit(train_loader, epochs=epoch + 1, initial_epoch=epoch,
                  steps_per_epoch=steps_per_epoch, precision="bfloat16",
                  eval_period_epoch=None, saving_period_epoch=None,
                  step_log_period=50, eval_training=False)
        losses, metrics = model.evaluate(eval_loader, recompute_metrics=True)
        wers.append(metrics.get("wer", float("nan")))
        print(f"[demo] step {model.model_step}: eval loss "
              f"{float(losses['loss']):.3f} WER {wers[-1]:.2f}% "
              f"({time.time() - t0:.0f}s elapsed)", flush=True)
        sys.stdout.flush()

    print(f"[demo] WER trajectory: {[round(w, 1) for w in wers]}")
    if args.assert_wer is not None:
        assert wers[-1] < args.assert_wer, (
            f"final WER {wers[-1]:.2f} >= {args.assert_wer}")
        print(f"[demo] PASS: final WER {wers[-1]:.2f}% < {args.assert_wer}%")


if __name__ == "__main__":
    main()
