# Self-contained LEARNABLE audio-only lifecycle config (synthetic tone
# speech) — the offline analogue of eval_models.sh
# (/root/reference/eval_models.sh:1-20, network-gated here):
#
#   python main.py -c configs/Synthetic/AO-Tone.py -m training   # + periodic
#   python main.py -c configs/Synthetic/AO-Tone.py -m swa        #   eval/ckpt
#   python main.py -c configs/Synthetic/AO-Tone.py -m evaluation # full stack
#
# Evaluation runs the full decode stack: beam search + an ARPA 2-gram
# estimated from the training transcripts, plus GPT neural rescoring when a
# configs/Synthetic/LM-Tone.py checkpoint exists. tools/lifecycle_demo.py
# chains every mode and asserts the final WER improved over init.
import glob
import os

import avec_tpu as nnet
from avec_tpu.data.synthetic import ToneSpeechDataset, tone_tokenizer
from avec_tpu.decode.ngram import estimate_arpa

vocab_size = 32
epochs = 2
batch_size = 16
precision = "bfloat16"
recompute_metrics = True
eval_training = False
callback_path = "callbacks/Synthetic/AO-Tone"
os.makedirs(callback_path, exist_ok=True)
tokenizer_path = os.path.join(callback_path, "tokenizer.json")
if not os.path.isfile(tokenizer_path):
    tone_tokenizer(vocab_size).save(tokenizer_path)

# 6400 samples = 400 batches/epoch: steps_per_epoch CAPS at the dataset
# length (torch semantics), so the demo's "--steps_per_epoch 400 --epochs 2"
# must be backed by >= 400 real batches — with the old 512 samples it
# silently trained 32 steps/epoch and never left LR warmup (WER 100%).
# With real 800 steps this exact recipe reaches ~0.6% eval WER (greedy).
training_dataset = ToneSpeechDataset(num_samples=6400, vocab_size=vocab_size,
                                     seed=0, batch_size=batch_size)
evaluation_dataset = ToneSpeechDataset(num_samples=64, vocab_size=vocab_size,
                                       seed=10_000_000,
                                       batch_size=batch_size, shuffle=False)

# 2-gram ARPA over the decoder's char-remapped token vocabulary
# (chr(id + 100), ref nnet/decoders.py:187), estimated from the TRAINING
# transcripts — a real LM, not a random one.
ngram_path = os.path.join(callback_path, "2gram.arpa")
ngram_offset = 100
if not os.path.isfile(ngram_path):
    seqs = [[chr(ngram_offset + int(t)) for t in training_dataset.token_ids(i)]
            for i in range(len(training_dataset))]
    estimate_arpa(seqs, ngram_path, order=2)

# GPT rescoring leg: picked up automatically once LM-Tone has trained.
_lm_ckpts = sorted(
    glob.glob("callbacks/Synthetic/LM-Tone/checkpoints_*.ckpt"),
    key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
neural_config_path = "configs/Synthetic/LM-Tone.py" if _lm_ckpts else None
neural_checkpoint = os.path.basename(_lm_ckpts[-1]) if _lm_ckpts else None

decoder = nnet.CTCBeamSearchDecoder(
    tokenizer_path=tokenizer_path, beam_size=8,
    ngram_path=ngram_path, ngram_alpha=0.4, ngram_beta=0.6,
    ngram_offset=ngram_offset,
    neural_config_path=neural_config_path,
    neural_checkpoint=neural_checkpoint,
    neural_alpha=0.3, neural_beta=0.3)

# Same architecture family as the real AO model, scaled to 5 conformer
# blocks so the CPU-hosted lifecycle learns past CTC blank-collapse in
# minutes (the full [5, 6, 5] stack needs ~3.4 s/step and >1k steps here).
model = nnet.AudioEfficientConformerInterCTC(
    vocab_size=vocab_size, att_type="patch", num_blocks=[2, 2, 1],
    interctc_blocks=[2, 4])
model.compile(
    losses=nnet.CTCLoss(zero_infinity=True, assert_shorter=False),
    loss_weights=[0.25, 0.25, 0.5],
    optimizer=nnet.Adam(
        lr=nnet.NoamDecayScheduler(warmup_steps=300, dim_decay=360,
                                   val_factor=1.5),
        betas=(0.9, 0.98), eps=1e-9, weight_decay=1e-6),
    metrics={"outputs": nnet.WordErrorRate()},
    decoders={"outputs": decoder})
