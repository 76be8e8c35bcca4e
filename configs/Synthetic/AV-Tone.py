# Self-contained LEARNABLE audio-VISUAL lifecycle config (synthetic tone
# speech + per-token video patterns) — the offline proof that the
# video/fusion path trains (the reference proves it with its released
# VO/AV checkpoints, /root/reference/README.md:152-153, network-gated here):
#
#   python main.py -c configs/Synthetic/AV-Tone.py -m training
#   python main.py -c configs/Synthetic/AV-Tone.py -m swa
#   python main.py -c configs/Synthetic/AV-Tone.py -m evaluation
#
# The dataset is constructed so AUDIO ALONE CANNOT SOLVE IT: tokens t and
# t + 15 are acoustically identical (same tone frequency) and only the video
# (a grid-cell pattern encoding the full token id) disambiguates. Reaching
# low WER therefore requires the Conv3d stem + ResNet18 + video conformer +
# FusionModule path to train — including SWA BN re-estimation over the video
# BatchNorm layers. tools/lifecycle_demo.py --av chains every mode.
import glob
import os

import avec_tpu as nnet
from avec_tpu.data.synthetic import ToneAVSpeechDataset, tone_tokenizer
from avec_tpu.decode.ngram import estimate_arpa

vocab_size = 32
epochs = 2
batch_size = 16
precision = "bfloat16"
recompute_metrics = True
eval_training = False
callback_path = "callbacks/Synthetic/AV-Tone"
os.makedirs(callback_path, exist_ok=True)
tokenizer_path = os.path.join(callback_path, "tokenizer.json")
if not os.path.isfile(tokenizer_path):
    tone_tokenizer(vocab_size).save(tokenizer_path)

# steps_per_epoch caps at len(dataset)/batch (torch semantics) — back the
# demo's requested steps with real batches (see AO-Tone's warning).
training_dataset = ToneAVSpeechDataset(num_samples=6400,
                                       vocab_size=vocab_size,
                                       seed=0, batch_size=batch_size)
evaluation_dataset = ToneAVSpeechDataset(num_samples=64,
                                         vocab_size=vocab_size,
                                         seed=10_000_000,
                                         batch_size=batch_size, shuffle=False)

# 2-gram ARPA over char-remapped token ids (chr(id + 100),
# ref nnet/decoders.py:187), estimated from the TRAINING transcripts.
ngram_path = os.path.join(callback_path, "2gram.arpa")
ngram_offset = 100
if not os.path.isfile(ngram_path):
    seqs = [[chr(ngram_offset + int(t)) for t in training_dataset.token_ids(i)]
            for i in range(len(training_dataset))]
    estimate_arpa(seqs, ngram_path, order=2)

# GPT rescoring leg: picked up automatically once LM-Tone has trained (the
# LM corpus is the same token vocabulary).
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

# Real AV architecture (Conv3d stem + ResNet18 + fusion + InterCTC), scaled
# to [2,1]/[2,2,1]/2 blocks so the lifecycle trains in minutes.
model = nnet.AudioVisualEfficientConformerInterCTC(
    vocab_size=vocab_size,
    v_num_blocks=[2, 1], a_num_blocks=[2, 2, 1], f_num_blocks=2,
    v_interctc_blocks=[2], a_interctc_blocks=[2, 4], f_interctc_blocks=[1])
model.compile(
    losses=nnet.CTCLoss(zero_infinity=True, assert_shorter=False),
    loss_weights={"v_ctc_1": 0.5 / 4, "a_ctc_1": 0.5 / 4,
                  "a_ctc_3": 0.5 / 4, "f_ctc_0": 0.5 / 4, "outputs": 0.5},
    optimizer=nnet.Adam(
        lr=nnet.NoamDecayScheduler(warmup_steps=300, dim_decay=360,
                                   val_factor=1.5),
        betas=(0.9, 0.98), eps=1e-9, weight_decay=1e-6),
    metrics={"outputs": nnet.WordErrorRate()},
    decoders={"outputs": decoder})
