# Audio-only Efficient Conformer CTC on LRS2+LRS3.
# Parity target: /root/reference/configs/LRS23/AO/EffConfCTC.py
import os

import avec_tpu as nnet

# Architecture
vocab_size = 256
interctc_blocks = []
loss_weights = None
att_type = "patch"

# Training
batch_size = 16
accumulated_steps = 4
eval_training = False
precision = "bfloat16"  # reference fp16+GradScaler -> TPU bf16, no scaler
recompute_metrics = True
callback_path = "callbacks/LRS23/AO/EffConfCTC"

# Beam Search
beam_search = True
tokenizer_path = "datasets/LRS3/tokenizerbpe256.json"
ngram_path = "datasets/LRS3/6gram_lrs23.arpa"
ngram_offset = 100
beam_size = 16
ngram_alpha = 0.6
ngram_beta = 1.0
ngram_tmp = 1.0
neural_config_path = "configs/LRS23/LM/GPT-Small.py"
neural_checkpoint = "checkpoints_epoch_10_step_2860.ckpt"
neural_alpha = 0.6
neural_beta = 1.0
_has_lm = os.path.isfile(os.path.join("callbacks/LRS23/LM/GPT-Small",
                                      neural_checkpoint))

# Model
model = nnet.AudioEfficientConformerInterCTC(
    vocab_size=vocab_size, att_type=att_type, interctc_blocks=interctc_blocks)

_has_tok = os.path.isfile(tokenizer_path)
if _has_tok and beam_search:
    decoder = nnet.CTCBeamSearchDecoder(
        tokenizer_path=tokenizer_path,
        beam_size=beam_size,
        ngram_path=ngram_path if os.path.isfile(ngram_path) else None,
        ngram_tmp=ngram_tmp, ngram_alpha=ngram_alpha, ngram_beta=ngram_beta,
        ngram_offset=ngram_offset,
        neural_config_path=neural_config_path if _has_lm else None,
        neural_checkpoint=neural_checkpoint, neural_alpha=neural_alpha,
        neural_beta=neural_beta)
elif _has_tok:
    decoder = nnet.CTCGreedySearchDecoder(tokenizer_path=tokenizer_path)
else:
    decoder = None

model.compile(
    losses=nnet.CTCLoss(zero_infinity=True, assert_shorter=False),
    metrics=nnet.WordErrorRate() if decoder else None,
    decoders=decoder,
    loss_weights=loss_weights,
)

# Datasets
load_video = False
audio_max_length = 16 * 16000
collate_fn = nnet.CollateFn(
    inputs_params=[{"axis": 1, "padding": True}, {"axis": 4}],
    targets_params=({"axis": 2, "padding": True}, {"axis": 5}))

if os.path.isdir("datasets/LRS2") and os.path.isdir("datasets/LRS3"):
    training_dataset = nnet.datasets.MultiDataset(
        batch_size=batch_size, collate_fn=collate_fn,
        datasets=[
            nnet.datasets.LRS(batch_size=None, collate_fn=None, version="LRS2",
                              mode="pretrain+train+val",
                              audio_max_length=audio_max_length,
                              load_video=load_video),
            nnet.datasets.LRS(batch_size=None, collate_fn=None, version="LRS3",
                              mode="pretrain+trainval",
                              audio_max_length=audio_max_length,
                              load_video=load_video),
        ])
    evaluation_dataset = [
        nnet.datasets.LRS(batch_size=batch_size, collate_fn=collate_fn,
                          version="LRS2", mode="test", load_video=load_video),
        nnet.datasets.LRS(batch_size=batch_size, collate_fn=collate_fn,
                          version="LRS3", mode="test", load_video=load_video),
    ]
else:
    # Synthetic stand-in so pass/eval/bench run without the license-gated
    # datasets (BASELINE.json configs[0]: CPU-runnable AO workload).
    training_dataset = nnet.datasets.SyntheticAVDataset(
        num_samples=256, audio_len=audio_max_length, vocab_size=vocab_size,
        load_video=False, batch_size=batch_size, collate_fn=collate_fn)
    evaluation_dataset = [nnet.datasets.SyntheticAVDataset(
        num_samples=64, audio_len=audio_max_length, vocab_size=vocab_size,
        load_video=False, batch_size=batch_size, collate_fn=collate_fn,
        seed=123)]
