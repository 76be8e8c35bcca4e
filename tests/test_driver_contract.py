"""Driver-contract guards: __graft_entry__ and bench stay importable and
their cheap invariants hold (the expensive paths — dryrun_multichip, the
TPU bench — run out-of-band on real hardware)."""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_bench_batch_shapes():
    import bench

    b = bench.make_batch(2)
    video, vlen, audio, alen = b["inputs"]
    assert video.shape == (2, bench.AUDIO_LEN // 640 + 1, 88, 88, 1)
    assert audio.shape == (2, bench.AUDIO_LEN)
    labels, llen = b["targets"]
    assert labels.shape[0] == 2 and llen.tolist() == [labels.shape[1]] * 2
    # align_video_to_audio contract: Tv = Ta // 640 + 1.
    assert vlen.tolist() == [video.shape[1]] * 2


@pytest.mark.slow
def test_graft_entry_forward():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    assert callable(fn) and isinstance(args, tuple)
    out = jax.jit(fn)(*args)
    assert np.asarray(out).ndim == 3  # (B, T', vocab) logits
    assert np.isfinite(np.asarray(out, np.float32)).all()
