# Visual-only Efficient Conformer InterCTC on LRS2+LRS3.
# Parity target: /root/reference/configs/LRS23/VO/EffConfInterCTC.py
import os

import avec_tpu as nnet

# Architecture
vocab_size = 256
interctc_blocks = [3, 6, 9]
loss_weights = [0.5 / 3, 0.5 / 3, 0.5 / 3, 0.5]

# lrw_pretrained
lrw_pretrained = True
lrw_checkpoint = "callbacks/LRW/EffConfCE/checkpoints_epoch_30_step_57247.ckpt"

# Test-time augmentation: horizontal flip branch (ref VO config).
test_time_aug = False

# Beam Search
beamsearch = True
beam_size = 16
tokenizer_path = "datasets/LRS3/tokenizerbpe256.json"
ngram_path = "datasets/LRS3/6gram_lrs23.arpa"
ngram_offset = 100
ngram_alpha = 0.6
ngram_beta = 1.0
ngram_tmp = 1.0
neural_config_path = "configs/LRS23/LM/GPT-Small.py"
neural_checkpoint = "checkpoints_epoch_10_step_2860.ckpt"
neural_alpha = 0.6
neural_beta = 1.0
_has_lm = os.path.isfile(os.path.join("callbacks/LRS23/LM/GPT-Small",
                                      neural_checkpoint))

# Training
batch_size = 16
accumulated_steps = 4
eval_training = False
precision = "bfloat16"
recompute_metrics = True
callback_path = "callbacks/LRS23/VO/EffConfInterCTC"


def _flip(video):
    import jax.numpy as jnp

    return jnp.flip(video, axis=3)  # flip W of (B, T, H, W, C)


# Model
model = nnet.VisualEfficientConformerInterCTC(
    vocab_size=vocab_size, interctc_blocks=interctc_blocks,
    test_augments=[_flip] if test_time_aug else None)

_has_tok = os.path.isfile(tokenizer_path)
if _has_tok and beamsearch:
    decoder = nnet.CTCBeamSearchDecoder(
        tokenizer_path=tokenizer_path, beam_size=beam_size,
        ngram_path=ngram_path if os.path.isfile(ngram_path) else None,
        ngram_tmp=ngram_tmp, ngram_alpha=ngram_alpha, ngram_beta=ngram_beta,
        ngram_offset=ngram_offset,
        neural_config_path=neural_config_path if _has_lm else None,
        neural_checkpoint=neural_checkpoint, neural_alpha=neural_alpha,
        neural_beta=neural_beta, test_time_aug=test_time_aug)
elif _has_tok:
    decoder = nnet.CTCGreedySearchDecoder(tokenizer_path=tokenizer_path)
else:
    decoder = None

model.compile(
    losses=nnet.CTCLoss(zero_infinity=True, assert_shorter=False),
    decoders={"outputs": decoder} if decoder else None,
    metrics={"outputs": nnet.WordErrorRate()} if decoder else None,
    loss_weights=loss_weights,
)

# LRW-pretrained front-end partial load.
if lrw_pretrained and os.path.isfile(lrw_checkpoint):
    from avec_tpu.train.checkpoint import load_checkpoint

    _ckpt = load_checkpoint(lrw_checkpoint)
    model.pending_partial_load = {
        "state_dict": {k: v for k, v in _ckpt["model_state_dict"].items()
                       if "front_end" in k},
        "rename": lambda k: k,  # same "encoder.front_end_*" scopes
    }

# Datasets
video_max_length = 400
label_max_length = 100
collate_fn = nnet.CollateFn(
    inputs_params=[{"axis": 0, "padding": True}, {"axis": 3}],
    targets_params=({"axis": 2, "padding": True}, {"axis": 5}))
crop_size = (88, 88)
training_video_transform = nnet.Compose([
    nnet.RandomCrop(crop_size),
    nnet.RandomHorizontalFlip(),
    nnet.TimeMaskSecond(T_second=0.4, num_mask_second=1.0, fps=25.0,
                        mean_frame=True),
])
evaluation_video_transform = nnet.CenterCrop(crop_size)

if os.path.isdir("datasets/LRS2") and os.path.isdir("datasets/LRS3"):
    training_dataset = nnet.datasets.MultiDataset(
        batch_size=batch_size, collate_fn=collate_fn,
        datasets=[
            nnet.datasets.LRS(batch_size=None, collate_fn=None, version="LRS2",
                              mode="pretrain+train+val",
                              video_max_length=video_max_length,
                              label_max_length=label_max_length,
                              video_transform=training_video_transform,
                              load_audio=False),
            nnet.datasets.LRS(batch_size=None, collate_fn=None, version="LRS3",
                              mode="pretrain+trainval",
                              video_max_length=video_max_length,
                              label_max_length=label_max_length,
                              video_transform=training_video_transform,
                              load_audio=False),
        ])
    evaluation_dataset = [
        nnet.datasets.LRS(batch_size=batch_size, collate_fn=collate_fn,
                          version="LRS2", mode="test",
                          video_transform=evaluation_video_transform,
                          load_audio=False),
        nnet.datasets.LRS(batch_size=batch_size, collate_fn=collate_fn,
                          version="LRS3", mode="test",
                          video_transform=evaluation_video_transform,
                          load_audio=False),
    ]
else:
    training_dataset = nnet.datasets.SyntheticAVDataset(
        num_samples=256, audio_len=4 * 16000, vocab_size=vocab_size,
        load_audio=False, batch_size=batch_size, collate_fn=collate_fn)
    evaluation_dataset = [nnet.datasets.SyntheticAVDataset(
        num_samples=64, audio_len=4 * 16000, vocab_size=vocab_size,
        load_audio=False, batch_size=batch_size, collate_fn=collate_fn,
        seed=123)]
