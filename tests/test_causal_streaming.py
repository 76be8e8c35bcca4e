"""Causal encoder + exact O(chunk) streaming (decode/causal_streaming.py).

The causal config (beyond reference parity, built from the reference's own
streaming mechanisms: XL causal attention nnet/attentions.py:384-554 +
"causal" conv padding) must be (a) genuinely causal — future audio cannot
change past logits — and (b) streamable with carried state such that the
chunked forward equals the offline forward exactly (up to float
reassociation) with per-push cost independent of session length.
"""

import os

import numpy as np
import pytest

from avec_tpu.ops.layers import conv_padding


def test_conv_padding_per_axis_policies():
    # ("same", "causal"): centered in axis 0, causal in axis 1.
    assert conv_padding((3, 3), ("same", "causal")) == ((1, 1), (2, 0))
    assert conv_padding((5, 7), ("causal", "valid")) == ((4, 0), (0, 0))
    # Plain policies unchanged.
    assert conv_padding((3,), "causal") == ((2, 0),)
    assert conv_padding((3, 3), "same") == ((1, 1), (1, 1))
    assert conv_padding((3, 3), 1) == ((1, 1), (1, 1))


def _causal_model(left_context=32):
    from avec_tpu.models import zoo
    from avec_tpu.train.losses import CTCLoss

    m = zoo.AudioEfficientConformerInterCTC(
        interctc_blocks=[], causal=True, left_context=left_context)
    m.compile(losses=CTCLoss(zero_infinity=True, assert_shorter=False))
    return m


class _IdTok:
    def decode(self, ids_list):
        return [" ".join(map(str, ids)) for ids in ids_list]


class _IdDec:
    blank_token = 0
    tokenizer = _IdTok()


@pytest.mark.slow
def test_causal_encoder_is_causal():
    """Changing audio after sample S leaves every output frame whose
    receptive field ends before S bit-identical; the future really changes
    later frames (the test is not vacuous)."""
    m = _causal_model()
    rng = np.random.RandomState(0)
    n = 25600
    a1 = (rng.randn(1, n) * 0.1).astype(np.float32)
    lens = np.array([n], np.int32)
    m.build([a1, lens])
    out1, _ = m.apply_net(m.params, m.batch_stats, [a1, lens], False, None)
    l1 = np.asarray(out1["outputs"][0])

    S = 12800
    a2 = a1.copy()
    a2[0, S:] += rng.randn(n - S).astype(np.float32)
    out2, _ = m.apply_net(m.params, m.batch_stats, [a2, lens], False, None)
    l2 = np.asarray(out2["outputs"][0])
    # Output frame o (12.5 Hz) depends on samples <= 1280*o + 256 (fbank
    # center lookahead); frames strictly before the boundary are identical.
    safe = (S - 256) // 1280
    assert np.array_equal(l1[0, : safe + 1], l2[0, : safe + 1])
    assert np.abs(l1[0, safe + 2:] - l2[0, safe + 2:]).max() > 1e-3


@pytest.mark.slow
def test_causal_streaming_exact_and_o_chunk(tmp_path):
    """Chunked streaming with carried state == offline forward: same logits
    (allclose), same greedy transcript, output count matches od^3(T//hop+1);
    and the per-push device work is fixed-shape (one compile, no growth)."""
    from avec_tpu.decode.causal_streaming import (
        CausalStreamingTranscriber,
        _od,
    )

    m = _causal_model()
    rng = np.random.RandomState(1)
    n = 41000  # deliberately not chunk-aligned
    audio = (rng.randn(n) * 0.1).astype(np.float32)
    lens = np.array([n], np.int32)
    m.build([audio[None], lens])

    out, _ = m.apply_net(m.params, m.batch_stats, [audio[None], lens],
                         False, None)
    off_logits = np.asarray(out["outputs"][0], np.float32)
    off_len = int(np.asarray(out["outputs"][1])[0])
    assert off_len == _od(_od(_od(n // 160 + 1)))

    st = CausalStreamingTranscriber(m, _IdDec(), chunk_frames=16)
    st.collect_logits = True
    partials = []
    for s in range(0, n, 5000):  # ragged pushes
        partials.append(st.push(audio[s: s + 5000])["text"])
    fin = st.finish()
    stream_logits = np.concatenate(st.logits_chunks, axis=0)[:st._o_total]

    assert stream_logits.shape[0] == off_len
    np.testing.assert_allclose(stream_logits, off_logits[0, :off_len],
                               atol=2e-4)
    # Transcripts identical (greedy collapse of the offline argmax).
    preds = off_logits[0, :off_len].argmax(-1)
    toks, prev = [], 0
    for p in preds.tolist():
        if p != 0 and p != prev:
            toks.append(int(p))
        prev = p
    assert st._tokens == toks
    assert fin["final"] is True
    # O(chunk): every device step processed one fixed 16-fbank-frame chunk
    # through the same jitted function (static shapes, no growth with T).
    assert len(st.push_latencies) == -(-(n // 160 + 1) // 16)
    # Committed tokens never revised: partial texts are prefixes of final.
    for p in partials:
        assert fin["text"].startswith(p)


@pytest.mark.slow
def test_causal_streaming_committed_prefix_monotonic():
    """Longer sessions: commits only grow, device cost per push constant
    (fixed shapes), cache warmup does not perturb exactness (covered above);
    here: monotonicity + bounded state."""
    from avec_tpu.decode.causal_streaming import CausalStreamingTranscriber

    m = _causal_model()
    rng = np.random.RandomState(2)
    audio = (rng.randn(3 * 16000) * 0.1).astype(np.float32)
    m.build([audio[None, :16000], np.array([16000], np.int32)])

    st = CausalStreamingTranscriber(m, _IdDec(), chunk_frames=16)
    lens = []
    for s in range(0, len(audio), 3200):
        r = st.push(audio[s: s + 3200])
        lens.append(r["committed_frames"])
    assert lens == sorted(lens)
    st.finish()
    # KV caches stay at their fixed sizes.
    for run_state in st._state["blocks"]:
        k = np.asarray(run_state["att"]["K"])
        assert k.shape[-2] <= st.left_context


@pytest.mark.slow
def test_causal_streaming_nondefault_shape():
    """num_blocks=[2,2,1] (the Synthetic config scale): the streaming plan
    must derive cache shapes from the LIVE model, not the default [5,6,5]
    architecture — wrong shapes crash or silently corrupt state."""
    from avec_tpu.decode.causal_streaming import (
        CausalStreamingTranscriber,
        _od,
    )
    from avec_tpu.models import zoo
    from avec_tpu.train.losses import CTCLoss

    m = zoo.AudioEfficientConformerInterCTC(
        interctc_blocks=[], num_blocks=[2, 2, 1],
        causal=True, left_context=32)
    m.compile(losses=CTCLoss(zero_infinity=True, assert_shorter=False))
    rng = np.random.RandomState(5)
    n = 20000
    audio = (rng.randn(n) * 0.1).astype(np.float32)
    lens = np.array([n], np.int32)
    m.build([audio[None], lens])

    out, _ = m.apply_net(m.params, m.batch_stats, [audio[None], lens],
                         False, None)
    off_logits = np.asarray(out["outputs"][0], np.float32)
    off_len = int(np.asarray(out["outputs"][1])[0])
    assert off_len == _od(_od(_od(n // 160 + 1)))

    st = CausalStreamingTranscriber(m, _IdDec(), chunk_frames=16)
    st.collect_logits = True
    for s in range(0, n, 4000):
        st.push(audio[s: s + 4000])
    st.finish()
    stream_logits = np.concatenate(st.logits_chunks, axis=0)[:st._o_total]
    assert stream_logits.shape[0] == off_len
    np.testing.assert_allclose(stream_logits, off_logits[0, :off_len],
                               atol=2e-4)
