"""Torch->flax checkpoint converter parity tests.

Builds the PyTorch reference models (via tools/torchref stubs), saves their
random-init state as reference-format .ckpt pickles, converts through
avec_tpu.train.torch_convert, and asserts logits parity on fixed inputs.
This is the proof that the released reference checkpoints load correctly
(ref: nnet/model.py:515-544, eval_models.sh).

Skipped when /root/reference or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

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

pytestmark = pytest.mark.skipif(
    not (HAVE_REF and HAVE_TORCH),
    reason="reference repo or torch unavailable")

import jax  # noqa: E402


def _convert_into(variables, ckpt_path):
    from flax import serialization

    from avec_tpu.train import checkpoint as ckpt
    from avec_tpu.train.torch_convert import convert_checkpoint

    tmpl = {"params": variables["params"]}
    if variables.get("batch_stats"):
        tmpl["batch_stats"] = variables["batch_stats"]
    template = ckpt.state_dict_flatten(tmpl)
    flat, ema, step, report = convert_checkpoint(ckpt_path, template)
    assert not report["unexpected"], report["unexpected"][:5]
    restored = serialization.from_state_dict(
        tmpl, ckpt.state_dict_unflatten(flat))
    restored.setdefault("batch_stats", {})
    return restored, step


def test_convert_vo_logits_parity(tmp_path):
    import torch

    nnet = torchref.import_reference()
    from avec_tpu.models import zoo

    torch.manual_seed(0)
    ref = nnet.VisualEfficientConformerInterCTC(vocab_size=256)
    ref.eval()
    rng = np.random.RandomState(1)
    video = rng.rand(2, 12, 88, 88, 1).astype(np.float32)
    vlen = np.array([12, 9], np.int32)
    with torch.no_grad():
        out_ref = ref([torch.tensor(video), torch.tensor(vlen)])
    path = str(tmp_path / "vo.ckpt")
    torch.save({"model_state_dict": ref.state_dict(), "model_step": 123}, path)

    m = zoo.VisualEfficientConformerInterCTC()
    variables = m.net.init({"params": jax.random.PRNGKey(0)}, video, vlen,
                           training=False)
    restored, step = _convert_into(variables, path)
    assert step == 123
    out = m.net.apply(restored, video, vlen, training=False)

    np.testing.assert_allclose(np.asarray(out["outputs"][0], np.float32),
                               out_ref["outputs"][0].numpy(), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(out["outputs"][1]),
                                  out_ref["outputs"][1].numpy())
    for key in ("ctc_2", "ctc_5", "ctc_8"):
        np.testing.assert_allclose(np.asarray(out[key][0], np.float32),
                                   out_ref[key][0].numpy(), atol=1e-3)


def test_convert_gpt_logits_parity(tmp_path):
    import torch

    nnet = torchref.import_reference()
    from avec_tpu.models import zoo

    torch.manual_seed(0)
    ref = nnet.GPT(vocab_size=1024, model="GPT-Small", max_pos_encoding=512)
    ref.eval()
    tok = np.random.RandomState(2).randint(0, 1024, size=(2, 16))
    with torch.no_grad():
        ref_logits = ref(torch.tensor(tok)).numpy()
    path = str(tmp_path / "gpt.ckpt")
    torch.save({"model_state_dict": ref.state_dict(), "model_step": 1}, path)

    m = zoo.GPT(vocab_size=1024, model="GPT-Small", max_pos_encoding=512)
    tok32 = tok.astype(np.int32)
    variables = m.net.init({"params": jax.random.PRNGKey(0)}, tok32,
                           training=False)
    restored, _ = _convert_into(variables, path)
    out = m.net.apply({"params": restored["params"]}, tok32, training=False)
    arr = np.asarray(out["output"] if isinstance(out, dict) and "output" in out
                     else out, np.float32)
    np.testing.assert_allclose(arr, ref_logits, atol=1e-3)


@pytest.mark.slow
def test_convert_av_logits_parity(tmp_path):
    """Flagship model: the shape the released swa-equal-60-70 ckpt has."""
    import torch

    nnet = torchref.import_reference()
    from avec_tpu.models import zoo

    torch.manual_seed(0)
    ref = nnet.AudioVisualEfficientConformerInterCTC(vocab_size=256)
    ref.eval()
    rng = np.random.RandomState(1)
    al = 16000
    vl = al // 640 + 1
    video = rng.rand(2, vl, 88, 88, 1).astype(np.float32)
    audio = (rng.randn(2, al) * 0.1).astype(np.float32)
    vlen = np.array([vl, vl - 5], np.int32)
    alen = np.array([al, al - 3200], np.int32)
    with torch.no_grad():
        out_ref = ref([torch.tensor(video), torch.tensor(vlen),
                       torch.tensor(audio), torch.tensor(alen)])
    path = str(tmp_path / "av.ckpt")
    torch.save({"model_state_dict": ref.state_dict(), "model_step": 7}, path)

    m = zoo.AudioVisualEfficientConformerInterCTC()
    args = (video, vlen, audio, alen)
    variables = m.net.init({"params": jax.random.PRNGKey(0)}, *args,
                           training=False)
    restored, _ = _convert_into(variables, path)
    out = m.net.apply(restored, *args, training=False)

    np.testing.assert_allclose(np.asarray(out["outputs"][0], np.float32),
                               out_ref["outputs"][0].numpy(), atol=1e-3)
    for key in ("v_ctc_2", "v_ctc_5", "a_ctc_7", "a_ctc_10", "f_ctc_1"):
        np.testing.assert_allclose(np.asarray(out[key][0], np.float32),
                                   out_ref[key][0].numpy(), atol=1e-3)


@pytest.mark.slow
def test_convert_ao_and_lrw_logits_parity(tmp_path):
    import torch

    nnet = torchref.import_reference()
    from avec_tpu.models import zoo

    rng = np.random.RandomState(2)

    # AO (EffConfCTC config shape: att patch, no interctc)
    torch.manual_seed(0)
    ref = nnet.AudioEfficientConformerInterCTC(vocab_size=256,
                                               att_type="patch",
                                               interctc_blocks=[])
    ref.eval()
    audio = (rng.randn(2, 16000) * 0.1).astype(np.float32)
    alen = np.array([16000, 12800], np.int32)
    with torch.no_grad():
        out_ref = ref([torch.tensor(audio), torch.tensor(alen)])
    path = str(tmp_path / "ao.ckpt")
    torch.save({"model_state_dict": ref.state_dict(), "model_step": 3}, path)

    m = zoo.AudioEfficientConformerInterCTC(interctc_blocks=[])
    variables = m.net.init({"params": jax.random.PRNGKey(0)}, audio, alen,
                           training=False)
    restored, _ = _convert_into(variables, path)
    out = m.net.apply(restored, audio, alen, training=False)
    np.testing.assert_allclose(np.asarray(out["outputs"][0], np.float32),
                               out_ref["outputs"][0].numpy(), atol=1e-3)

    # LRW classifier
    torch.manual_seed(0)
    ref = nnet.VisualEfficientConformerCE(vocab_size=500)
    ref.eval()
    video = rng.rand(2, 10, 88, 88, 1).astype(np.float32)
    with torch.no_grad():
        ref_logits = ref(torch.tensor(video).permute(0, 4, 1, 2, 3)).numpy()
    path = str(tmp_path / "lrw.ckpt")
    torch.save({"model_state_dict": ref.state_dict(), "model_step": 2}, path)

    m = zoo.VisualEfficientConformerCE()
    variables = m.net.init({"params": jax.random.PRNGKey(0)}, video,
                           training=False)
    restored, _ = _convert_into(variables, path)
    out = m.net.apply(restored, video, training=False)
    arr = np.asarray(out["output"] if isinstance(out, dict) and "output" in out
                     else out, np.float32)
    np.testing.assert_allclose(arr, ref_logits, atol=1e-3)
