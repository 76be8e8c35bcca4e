# GPT-Small LM fine-tuning on LRS2/3 corpora (used as beam-search rescorer).
# Parity target: /root/reference/configs/LRS23/LM/GPT-Small.py
import os

import avec_tpu as nnet
from avec_tpu.train.optim import AdamW, gpt_decay_mask

# Architecture
vocab_size = 1024
model = "GPT-Small"
max_pos_encoding = 2048
pad_token = 0
sos_token = vocab_size
eos_token = vocab_size

# Pretrained Checkpoint
pretrained = True
pretrained_checkpoint = ("callbacks/LibriSpeechCorpus/GPT-Small/"
                         "checkpoints_epoch_13_step_512924.ckpt")

# Training
lr = 6e-5
epochs = 10
batch_size = 128
accumulated_steps = 2
tokenizer_path = "datasets/LRS3/tokenizerbpe1024.json"
precision = "bfloat16"
callback_path = "callbacks/LRS23/LM/GPT-Small"

# Model
model = nnet.GPT(vocab_size=vocab_size + 1, padding_idx=pad_token,
                 max_pos_encoding=max_pos_encoding, model=model,
                 pos_embedding="sin")
model.compile(
    optimizer=AdamW(lr=lr, betas=(0.9, 0.95), eps=1e-8, weight_decay=0.1,
                    decay_mask=gpt_decay_mask))

# Load Pretrained
if pretrained and os.path.isfile(pretrained_checkpoint):
    from avec_tpu.train.checkpoint import load_checkpoint

    _ckpt = load_checkpoint(pretrained_checkpoint)
    model.pending_partial_load = {"state_dict": _ckpt["model_state_dict"],
                                  "rename": None}

# Datasets
label_max_length = 100
collate_fn = nnet.CollateFn(
    inputs_params=[{"axis": 0, "padding": True, "start_token": sos_token,
                    "padding_value": pad_token}],
    targets_params=[{"axis": 0, "padding": True, "end_token": eos_token,
                     "padding_value": -1}])

_corpus = "datasets/LRS3/corpus_lrs23_pretrain+train+val.txt"
if os.path.isfile(_corpus) and os.path.isfile(tokenizer_path):
    training_dataset = nnet.datasets.CorpusLM(
        collate_fn=collate_fn, batch_size=batch_size,
        tokenizer_path=tokenizer_path, max_length=label_max_length,
        corpus_path=_corpus)
    evaluation_dataset = [
        nnet.datasets.CorpusLM(collate_fn=collate_fn, batch_size=batch_size,
                               tokenizer_path=tokenizer_path,
                               corpus_path="datasets/LRS2/corpus_test.txt"),
        nnet.datasets.CorpusLM(collate_fn=collate_fn, batch_size=batch_size,
                               tokenizer_path=tokenizer_path,
                               corpus_path="datasets/LRS3/corpus_test.txt"),
    ]
else:
    training_dataset = nnet.datasets.SyntheticLMDataset(
        num_samples=512, max_length=label_max_length,
        vocab_size=vocab_size + 1, batch_size=batch_size,
        collate_fn=collate_fn)
    evaluation_dataset = [nnet.datasets.SyntheticLMDataset(
        num_samples=128, max_length=label_max_length,
        vocab_size=vocab_size + 1, batch_size=batch_size,
        collate_fn=collate_fn, seed=123)]
