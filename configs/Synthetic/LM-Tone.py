# GPT LM on the synthetic tone-speech corpus — the rescorer leg of the
# offline lifecycle (tools/lifecycle_demo.py). GPT-Tiny keeps the CPU
# runtime small; the config contract is identical to LRS23/LM/GPT-Small.py
# (parity target: /root/reference/configs/LRS23/LM/GPT-Small-demo.py).
import os

import avec_tpu as nnet
from avec_tpu.data.synthetic import ToneSpeechDataset, tone_tokenizer
from avec_tpu.train.optim import AdamW, gpt_decay_mask

tone_vocab = 32
vocab_size = tone_vocab          # word-level tone tokenizer
pad_token = 0
sos_token = vocab_size
eos_token = vocab_size + 1

epochs = 1
batch_size = 16
precision = None                 # fp32: tiny model, CPU-friendly
callback_path = "callbacks/Synthetic/LM-Tone"
os.makedirs(callback_path, exist_ok=True)
tokenizer_path = os.path.join(callback_path, "tokenizer.json")
if not os.path.isfile(tokenizer_path):
    tone_tokenizer(tone_vocab).save(tokenizer_path)

model = nnet.GPT(vocab_size=vocab_size + 2, padding_idx=pad_token,
                 max_pos_encoding=64, model="GPT-Tiny", pos_embedding="sin")
model.compile(
    optimizer=AdamW(lr=3e-4, betas=(0.9, 0.95), eps=1e-8, weight_decay=0.1,
                    decay_mask=gpt_decay_mask))

# Corpus = the tone training transcripts, written once then consumed through
# the standard CorpusLM path (same mechanics as the LibriSpeech config).
_corpus = os.path.join(callback_path, "corpus.txt")
if not os.path.isfile(_corpus):
    with open(_corpus, "w") as f:
        f.write("\n".join(ToneSpeechDataset(num_samples=512, seed=0)
                          .corpus_lines()) + "\n")

collate_fn = nnet.CollateFn(
    inputs_params=[{"axis": 0, "padding": True, "start_token": sos_token,
                    "padding_value": pad_token}],
    targets_params=[{"axis": 0, "padding": True, "end_token": eos_token,
                     "padding_value": -1}])
training_dataset = nnet.datasets.CorpusLM(
    collate_fn=collate_fn, batch_size=batch_size,
    tokenizer_path=tokenizer_path, max_length=32, corpus_path=_corpus)
evaluation_dataset = nnet.datasets.CorpusLM(
    collate_fn=collate_fn, batch_size=batch_size,
    tokenizer_path=tokenizer_path, corpus_path=_corpus, shuffle=False)
