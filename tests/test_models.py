"""Model-level tests: forward shapes, length propagation, InterCTC keys, and
parameter-count parity with the published reference numbers
(/root/reference/README.md:149-161)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avec_tpu.models.conformer import ConformerBlock, ConformerInterCTC
from avec_tpu.models.encoders import (
    AudioEfficientConformerEncoder,
    AudioVisualEfficientConformerEncoder,
    VisualEfficientConformerEncoder,
)
from avec_tpu.models.resnet import ResNet
from avec_tpu.models.transformer import GPTNet
from avec_tpu.ops.layers import Linear
from avec_tpu.ops.masks import make_mask


def _num_params(variables):
    return sum(np.prod(x.shape) for x in jax.tree.leaves(variables["params"]))


ATT = {"class": "RelPos1dMultiHeadAttention",
       "params": {"num_heads": 4, "attn_drop_rate": 0.0,
                  "num_pos_embeddings": 100,
                  "weight_init": "default", "bias_init": "default"}}


def test_conformer_block_stride():
    block = ConformerBlock(dim_model=16, dim_expand=24, ff_ratio=4,
                           att_params=ATT, drop_rate=0.1, conv_stride=2,
                           kernel_size=5)
    x = jnp.ones((2, 10, 16))
    variables = block.init(jax.random.PRNGKey(0), x)
    out = block.apply(variables, x, mutable=["batch_stats"])[0]
    assert out.shape == (2, 5, 24)


def test_conformer_interctc_stack():
    net = ConformerInterCTC(dim_model=[16, 24], num_blocks=[2, 1],
                            interctc_blocks=[1, 2], vocab_size=11,
                            att_params=ATT, kernel_size=5, drop_rate=0.0,
                            conv_stride=2, loss_prefix="ctc")
    x = jnp.ones((2, 12, 16))
    lengths = jnp.array([12, 7])
    mask = make_mask(12, lengths)
    variables = net.init(jax.random.PRNGKey(0), x, lengths, mask)
    (out, out_len, inter), _ = net.apply(variables, x, lengths, mask,
                                         mutable=["batch_stats"])
    assert out.shape == (2, 6, 24)
    np.testing.assert_array_equal(np.asarray(out_len), [6, 4])
    # InterCTC keys are 0-based block indices (networks.py:289).
    assert set(inter.keys()) == {"ctc_0", "ctc_1"}
    logits0, len0 = inter["ctc_0"]
    assert logits0.shape == (2, 12, 11)  # before the strided block's effect
    np.testing.assert_array_equal(np.asarray(len0), [12, 7])
    logits1, len1 = inter["ctc_1"]
    assert logits1.shape == (2, 6, 11)
    np.testing.assert_array_equal(np.asarray(len1), [6, 4])


def test_resnet18_trunk_output():
    net = ResNet(model="ResNet18", include_stem=False, dim_output=256)
    x = jnp.ones((2, 22, 22, 64))
    variables = net.init(jax.random.PRNGKey(0), x)
    out, _ = net.apply(variables, x, mutable=["batch_stats"])
    assert out.shape == (2, 256)


@pytest.mark.slow
def test_audio_encoder_forward_and_params():
    net = AudioEfficientConformerEncoder(vocab_size=256, att_type="patch",
                                         interctc_blocks=[])
    audio = jnp.zeros((1, 16000), dtype=jnp.float32)
    lengths = jnp.array([16000])
    variables = net.init(jax.random.PRNGKey(0), audio, lengths)
    (logits, out_len, inter), _ = net.apply(
        variables, audio, lengths, mutable=["batch_stats"])
    # 16000 samples -> 101 frames -> 51 -> 26 -> 13 at 12.5 Hz.
    assert logits.shape[0] == 1 and logits.shape[2] == 256
    np.testing.assert_array_equal(np.asarray(out_len), [13])
    assert inter == {}
    # Published: 31.5M params (README.md:151).
    n = _num_params(variables)
    assert abs(n - 31.5e6) / 31.5e6 < 0.03, f"param count {n:,}"


@pytest.mark.slow
def test_visual_encoder_forward_and_params():
    net = VisualEfficientConformerEncoder(vocab_size=256,
                                          interctc_blocks=[3, 6, 9])
    video = jnp.zeros((1, 4, 88, 88, 1), dtype=jnp.float32)
    lengths = jnp.array([4])
    variables = net.init(jax.random.PRNGKey(0), video, lengths)
    (logits, out_len, inter), _ = net.apply(
        variables, video, lengths, mutable=["batch_stats"])
    assert logits.shape == (1, 2, 256)
    np.testing.assert_array_equal(np.asarray(out_len), [2])
    assert set(inter.keys()) == {"ctc_2", "ctc_5", "ctc_8"}
    # Published: 40.9M params (README.md:152).
    n = _num_params(variables)
    assert abs(n - 40.9e6) / 40.9e6 < 0.03, f"param count {n:,}"


@pytest.mark.slow
def test_av_encoder_forward_and_params():
    net = AudioVisualEfficientConformerEncoder()
    audio = jnp.zeros((1, 16000), dtype=jnp.float32)
    audio_len = jnp.array([16000])
    # align_video_to_audio: Tv = Ta // 640 + 1 (transforms.py:169-180).
    tv = 16000 // 640 + 1
    video = jnp.zeros((1, tv, 88, 88, 1), dtype=jnp.float32)
    video_len = jnp.array([tv])
    variables = net.init(jax.random.PRNGKey(0), video, video_len, audio, audio_len)
    (logits, out_len, inter), _ = net.apply(
        variables, video, video_len, audio, audio_len, mutable=["batch_stats"])
    assert logits.shape[-1] == 256
    assert set(inter.keys()) == {"v_ctc_2", "v_ctc_5", "a_ctc_7", "a_ctc_10",
                                 "f_ctc_1"}
    # Published: 61.7M params (README.md:153).
    n = _num_params(variables)
    assert abs(n - 61.7e6) / 61.7e6 < 0.03, f"param count {n:,}"


@pytest.mark.slow
def test_gpt_small_params_and_causality():
    net = GPTNet(vocab_size=1025, padding_idx=0, max_pos_encoding=2048,
                 model="GPT-Small", pos_embedding="sin")
    ids = jnp.zeros((1, 8), dtype=jnp.int32)
    variables = net.init(jax.random.PRNGKey(0), ids)
    logits = net.apply(variables, ids)
    assert logits.shape == (1, 8, 1025)
    # Published: 86.6M params (README.md:157).
    n = _num_params(variables)
    assert abs(n - 86.6e6) / 86.6e6 < 0.03, f"param count {n:,}"
