"""Transcript-level end-to-end pipeline parity vs the PyTorch reference.

Closes the last untested link between "logits match" and "WER matches"
(round-2 verdict): a random-init REFERENCE model's checkpoint is loaded by
OUR engine, the same utterances flow through the reference eval path (its
model forward + its CTCGreedySearchDecoder, nnet/decoders.py:77-120) and
through OUR full engine eval (`Model.evaluate(recompute_metrics=True)`,
ref nnet/model.py:867-942), and the decoded TRANSCRIPTS and corpus WER are
asserted identical. A second leg runs the in-engine beam decoder
(beam + ARPA n-gram) and asserts the engine plumbing reproduces the
decoder applied directly to the network's logits.

Skipped when /root/reference or torch is unavailable. Slow (builds the AO
conformer twice).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)

try:
    import torchref
    HAVE_REF = torchref.reference_available()
except Exception:
    HAVE_REF = False
try:
    import torch  # noqa: F401
    HAVE_TORCH = True
except ImportError:
    HAVE_TORCH = False

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not (HAVE_REF and HAVE_TORCH),
                       reason="reference repo or torch unavailable"),
]

TEXTS = ["the cat sat on the mat",
         "a quick brown fox",
         "jumps over the lazy dog"]


def _make_tokenizer(tmp_path):
    from avec_tpu.utils.tokenizer import train_tokenizer

    corpus = os.path.join(tmp_path, "corpus.txt")
    with open(corpus, "w") as f:
        f.write("\n".join(TEXTS * 4) + "\n")
    tok_path = os.path.join(tmp_path, "tokenizerbpe256.model")
    train_tokenizer(corpus, tok_path, vocab_size=256)
    return tok_path


def _make_batch(tok):
    rng = np.random.RandomState(5)
    audio = (rng.randn(3, 16000) * 0.1).astype(np.float32)
    alen = np.array([16000, 12800, 9600], np.int32)
    ids = [tok.encode(t) for t in TEXTS]
    llen = np.array([len(i) for i in ids], np.int32)
    labels = np.zeros((3, int(llen.max())), np.int32)
    for i, seq in enumerate(ids):
        labels[i, : len(seq)] = seq
    return {"inputs": [audio, alen], "targets": (labels, llen)}


def test_transcripts_and_wer_match_reference(tmp_path):
    import torch

    nnet = torchref.import_reference()
    from avec_tpu.decode.greedy import CTCGreedySearchDecoder
    from avec_tpu.models import zoo
    from avec_tpu.train.losses import CTCLoss
    from avec_tpu.train.metrics import WordErrorRate
    from avec_tpu.utils.tokenizer import load_tokenizer

    tok_path = _make_tokenizer(str(tmp_path))
    tok = load_tokenizer(tok_path)
    batch = _make_batch(tok)
    audio, alen = batch["inputs"]

    # --- reference eval path: model forward + ITS greedy decoder ---------
    torch.manual_seed(0)
    ref = nnet.AudioEfficientConformerInterCTC(vocab_size=256,
                                               att_type="patch",
                                               interctc_blocks=[])
    ref.eval()
    with torch.no_grad():
        out_ref = ref([torch.tensor(audio), torch.tensor(alen)])
    ref_dec = nnet.CTCGreedySearchDecoder(tokenizer_path=tok_path)
    ref_preds = ref_dec(out_ref["outputs"])
    ref_truths = ref_dec([torch.tensor(batch["targets"][0]),
                          torch.tensor(batch["targets"][1])],
                         from_logits=False)
    assert ref_truths == TEXTS  # tokenizer round-trips ground truth
    ckpt_path = os.path.join(tmp_path, "checkpoints_epoch_1_step_1.ckpt")
    torch.save({"model_state_dict": ref.state_dict(), "model_step": 1},
               str(ckpt_path))

    # --- our full engine eval on the converted checkpoint ----------------
    m = zoo.AudioEfficientConformerInterCTC(interctc_blocks=[])
    m.compile(losses=CTCLoss(zero_infinity=True, assert_shorter=False),
              loss_weights=None,
              metrics={"outputs": WordErrorRate()},
              decoders={"outputs": CTCGreedySearchDecoder(tok_path)})
    m.build(batch["inputs"])
    m.load(str(ckpt_path), load_optimizer=False)
    losses, metrics, transcripts = m.evaluate(
        [batch], recompute_metrics=True, return_transcripts=True)

    truths, preds = transcripts["wer"]
    assert truths == TEXTS
    # THE parity claim: full-pipeline transcripts are identical.
    assert preds == ref_preds, (preds, ref_preds)
    # And the engine-reported exact corpus WER equals the WER of the
    # reference pipeline's transcripts.
    want_wer = WordErrorRate()(TEXTS, ref_preds)
    assert abs(metrics["wer"] - want_wer) < 1e-9, (metrics["wer"], want_wer)
    assert np.isfinite(losses["loss"])


def _make_av_batch(tok, n=2, al=16000):
    """Aligned AV batch: Tv = Ta // 640 + 1 (align_video_to_audio parity,
    ref nnet/transforms.py:169-180)."""
    rng = np.random.RandomState(9)
    vl = al // 640 + 1
    video = rng.rand(n, vl, 88, 88, 1).astype(np.float32)
    audio = (rng.randn(n, al) * 0.1).astype(np.float32)
    alen = np.array([al, al - 3200][:n], np.int32)
    vlen = alen // 640 + 1
    ids = [tok.encode(t) for t in TEXTS[:n]]
    llen = np.array([len(i) for i in ids], np.int32)
    labels = np.zeros((n, int(llen.max())), np.int32)
    for i, seq in enumerate(ids):
        labels[i, : len(seq)] = seq
    return {"inputs": [video, vlen, audio, alen], "targets": (labels, llen)}


def test_av_transcripts_match_reference_with_interctc(tmp_path):
    """Full-pipeline AV transcript parity with InterCTC ENABLED: a
    random-init reference AV checkpoint (fusion + alignment + all 6 output
    keys, ref nnet/networks.py:514-579) flows through the reference eval
    path and through our full `evaluate(recompute_metrics=True)`; decoded
    transcripts and corpus WER must be identical."""
    import torch

    nnet = torchref.import_reference()
    from avec_tpu.decode.greedy import CTCGreedySearchDecoder
    from avec_tpu.models import zoo
    from avec_tpu.train.losses import CTCLoss
    from avec_tpu.train.metrics import WordErrorRate
    from avec_tpu.utils.tokenizer import load_tokenizer

    tok_path = _make_tokenizer(str(tmp_path))
    tok = load_tokenizer(tok_path)
    batch = _make_av_batch(tok)

    torch.manual_seed(0)
    ref = nnet.AudioVisualEfficientConformerInterCTC(vocab_size=256)
    ref.eval()
    with torch.no_grad():
        out_ref = ref([torch.tensor(a) for a in batch["inputs"]])
    # All six output keys present (v_ctc_2, v_ctc_5, a_ctc_7, a_ctc_10,
    # f_ctc_1, outputs) — InterCTC machinery is live, not bypassed.
    assert set(out_ref) == {"outputs", "v_ctc_2", "v_ctc_5", "a_ctc_7",
                            "a_ctc_10", "f_ctc_1"}
    ref_dec = nnet.CTCGreedySearchDecoder(tokenizer_path=tok_path)
    ref_preds = ref_dec(out_ref["outputs"])
    ckpt_path = os.path.join(tmp_path, "checkpoints_epoch_1_step_1.ckpt")
    torch.save({"model_state_dict": ref.state_dict(), "model_step": 1},
               str(ckpt_path))

    m = zoo.AudioVisualEfficientConformerInterCTC()
    m.compile(losses=CTCLoss(zero_infinity=True, assert_shorter=False),
              loss_weights={"v_ctc_2": 0.5 / 3, "v_ctc_5": 0.5 / 3,
                            "a_ctc_7": 0.5 / 3, "a_ctc_10": 0.5 / 3,
                            "f_ctc_1": 0.5 / 3, "outputs": 0.5},
              metrics={"outputs": WordErrorRate()},
              decoders={"outputs": CTCGreedySearchDecoder(tok_path)})
    m.build(batch["inputs"])
    m.load(str(ckpt_path), load_optimizer=False)
    losses, metrics, transcripts = m.evaluate(
        [batch], recompute_metrics=True, return_transcripts=True)

    truths, preds = transcripts["wer"]
    assert truths == TEXTS[:2]
    assert preds == ref_preds, (preds, ref_preds)
    want_wer = WordErrorRate()(truths, ref_preds)
    assert abs(metrics["wer"] - want_wer) < 1e-9
    assert np.isfinite(losses["loss"])


def test_vo_transcripts_match_reference_with_interctc(tmp_path):
    """Same full-pipeline transcript parity for the visual-only model with
    its default InterCTC blocks (ref nnet/models_zoo.py:99-126)."""
    import torch

    nnet = torchref.import_reference()
    from avec_tpu.decode.greedy import CTCGreedySearchDecoder
    from avec_tpu.models import zoo
    from avec_tpu.train.losses import CTCLoss
    from avec_tpu.train.metrics import WordErrorRate
    from avec_tpu.utils.tokenizer import load_tokenizer

    tok_path = _make_tokenizer(str(tmp_path))
    tok = load_tokenizer(tok_path)
    av = _make_av_batch(tok)
    video, vlen = av["inputs"][0], av["inputs"][1]
    batch = {"inputs": [video, vlen], "targets": av["targets"]}

    torch.manual_seed(1)
    ref = nnet.VisualEfficientConformerInterCTC(vocab_size=256)
    ref.eval()
    with torch.no_grad():
        out_ref = ref([torch.tensor(video), torch.tensor(vlen)])
    # Standalone VO uses loss_prefix="ctc" (ref networks.py:444).
    assert set(out_ref) == {"outputs", "ctc_2", "ctc_5", "ctc_8"}
    ref_dec = nnet.CTCGreedySearchDecoder(tokenizer_path=tok_path)
    ref_preds = ref_dec(out_ref["outputs"])
    ckpt_path = os.path.join(tmp_path, "checkpoints_epoch_1_step_2.ckpt")
    torch.save({"model_state_dict": ref.state_dict(), "model_step": 1},
               str(ckpt_path))

    m = zoo.VisualEfficientConformerInterCTC()
    m.compile(losses=CTCLoss(zero_infinity=True, assert_shorter=False),
              loss_weights={"ctc_2": 0.5 / 3, "ctc_5": 0.5 / 3,
                            "ctc_8": 0.5 / 3, "outputs": 0.5},
              metrics={"outputs": WordErrorRate()},
              decoders={"outputs": CTCGreedySearchDecoder(tok_path)})
    m.build(batch["inputs"])
    m.load(str(ckpt_path), load_optimizer=False)
    losses, metrics, transcripts = m.evaluate(
        [batch], recompute_metrics=True, return_transcripts=True)

    truths, preds = transcripts["wer"]
    assert preds == ref_preds, (preds, ref_preds)
    want_wer = WordErrorRate()(truths, ref_preds)
    assert abs(metrics["wer"] - want_wer) < 1e-9
    assert np.isfinite(losses["loss"])


def test_engine_beam_path_matches_direct_decode(tmp_path):
    """The in-engine beam+ARPA eval (eval_step -> decode_pre -> decoder)
    reproduces the decoder applied directly to the network logits."""
    import jax

    from avec_tpu.decode.beam import CTCBeamSearchDecoder
    from avec_tpu.models import zoo
    from avec_tpu.train.losses import CTCLoss
    from avec_tpu.train.metrics import WordErrorRate
    from avec_tpu.utils.tokenizer import load_tokenizer
    from bench_decode import synthetic_char_arpa

    tok_path = _make_tokenizer(str(tmp_path))
    tok = load_tokenizer(tok_path)
    batch = _make_batch(tok)

    arpa = os.path.join(tmp_path, "6gram.arpa")
    synthetic_char_arpa(arpa, 256, offset=100, order=3, seed=1)

    m = zoo.AudioEfficientConformerInterCTC(interctc_blocks=[])
    dec = CTCBeamSearchDecoder(tokenizer_path=tok_path, beam_size=8,
                               ngram_path=arpa, ngram_alpha=0.4,
                               ngram_beta=0.8)
    m.compile(losses=CTCLoss(zero_infinity=True, assert_shorter=False),
              loss_weights=None,
              metrics={"outputs": WordErrorRate()},
              decoders={"outputs": dec})
    m.build(batch["inputs"])
    _, metrics, transcripts = m.evaluate(
        [batch], recompute_metrics=True, return_transcripts=True)

    # Direct decode of the network's own logits outside the engine.
    out = m.apply_net(m.params, m.batch_stats, batch["inputs"], False, None)[0]
    logits, lens = out["outputs"]
    direct = dec((np.asarray(logits, np.float32), np.asarray(lens)))

    assert transcripts["wer"][1] == direct
    want = WordErrorRate()(TEXTS, direct)
    assert abs(metrics["wer"] - want) < 1e-9
