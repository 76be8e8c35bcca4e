# Self-contained LEARNABLE CAUSAL audio lifecycle config (synthetic tone
# speech) — trains the causal-streaming variant of the AO model so the exact
# O(chunk) streaming path (decode/causal_streaming.py) can be validated on a
# model that actually transcribes (not just at random init):
#
#   python main.py -c configs/Synthetic/AO-Tone-Causal.py -m training
#   python main.py -c configs/Synthetic/AO-Tone-Causal.py -m evaluation
#   python tools/causal_streaming_check.py    # streaming == offline == low WER
#
# causal=True selects causal stem/conv padding + Transformer-XL causal
# attention with a left_context band (built from the reference's own
# streaming mechanisms, nnet/attentions.py:384-554); every output frame
# depends on past audio only, so streaming commits are final.
import os

import avec_tpu as nnet
from avec_tpu.data.synthetic import ToneSpeechDataset, tone_tokenizer

vocab_size = 32
epochs = 2
batch_size = 16
precision = "bfloat16"
recompute_metrics = True
eval_training = False
callback_path = "callbacks/Synthetic/AO-Tone-Causal"
os.makedirs(callback_path, exist_ok=True)
tokenizer_path = os.path.join(callback_path, "tokenizer.json")
if not os.path.isfile(tokenizer_path):
    tone_tokenizer(vocab_size).save(tokenizer_path)

# Same learnable tone-speech task as AO-Tone (see its steps_per_epoch note).
training_dataset = ToneSpeechDataset(num_samples=6400, vocab_size=vocab_size,
                                     seed=0, batch_size=batch_size)
evaluation_dataset = ToneSpeechDataset(num_samples=64, vocab_size=vocab_size,
                                       seed=10_000_000,
                                       batch_size=batch_size, shuffle=False)

# Greedy decode: the causal streaming driver is greedy (committed tokens are
# final), so offline eval uses the same decoder for a like-for-like check.
decoder = nnet.CTCGreedySearchDecoder(tokenizer_path=tokenizer_path)

# left_context=64 stage-1 frames = 1.28 s of audio — plenty for 100 ms tone
# bursts; [2, 2, 1] blocks as in AO-Tone (non-default shape: also exercises
# the live-model-derived streaming plan).
model = nnet.AudioEfficientConformerInterCTC(
    vocab_size=vocab_size, att_type="patch", num_blocks=[2, 2, 1],
    interctc_blocks=[2, 4], causal=True, left_context=64)
model.compile(
    losses=nnet.CTCLoss(zero_infinity=True, assert_shorter=False),
    loss_weights=[0.25, 0.25, 0.5],
    optimizer=nnet.Adam(
        lr=nnet.NoamDecayScheduler(warmup_steps=300, dim_decay=360,
                                   val_factor=1.5),
        betas=(0.9, 0.98), eps=1e-9, weight_decay=1e-6),
    metrics={"outputs": nnet.WordErrorRate()},
    decoders={"outputs": decoder})
