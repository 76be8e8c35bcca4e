# GPT-Small LM pretraining on the LibriSpeech normalized corpus.
# Parity target: /root/reference/configs/LibriSpeechCorpus/GPT-Small.py
import os

import avec_tpu as nnet

# Architecture
vocab_size = 1024
model = "GPT-Small"
max_pos_encoding = 2048
pad_token = 0
sos_token = vocab_size
eos_token = vocab_size

# Training
batch_size = 128
accumulated_steps = 2
tokenizer_path = "datasets/LRS3/tokenizerbpe1024.json"
precision = "bfloat16"
callback_path = "callbacks/LibriSpeechCorpus/GPT-Small"

# Model (default compile: AdamW + 300B-token cosine schedule,
# ref models_zoo.py:275-309)
model = nnet.GPT(vocab_size=vocab_size + 1, padding_idx=pad_token,
                 max_pos_encoding=max_pos_encoding, model=model,
                 pos_embedding="sin")
model.compile()

# Datasets
label_max_length = 100
collate_fn = nnet.CollateFn(
    inputs_params=[{"axis": 0, "padding": True, "start_token": sos_token,
                    "padding_value": pad_token}],
    targets_params=[{"axis": 0, "padding": True, "end_token": eos_token,
                     "padding_value": -1}])

_corpus = "datasets/LibriSpeechCorpus/librispeech-lm-norm.txt"
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
