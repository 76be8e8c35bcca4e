"""Native FLAC codec + prepare-artifact round-trip tests.

The reference prepare pipeline stores audio as .flac and infos as torch
.pt pickles (nnet/datasets.py:532,558); utils/flac.py implements the codec
natively so those artifacts round-trip without soundfile/ffmpeg.
"""

import json
import os

import numpy as np
import pytest

from avec_tpu.utils import media
from avec_tpu.utils.flac import (
    _crc8,
    _crc16,
    _utf8_number,
    read_flac,
    write_flac,
)


def test_crc_known_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 (FLAC frame CRCs) against the
    # standard "123456789" check values.
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_utf8_frame_numbers_match_chr_encoding():
    for v in (0, 0x7F, 0x80, 0x7FF, 0x800, 0xFFFF, 0x10000):
        assert _utf8_number(v) == chr(v).encode("utf-8")


@pytest.mark.parametrize("n", [1, 3, 100, 4096, 4097, 16000])
def test_flac_lossless_roundtrip(tmp_path, n):
    rng = np.random.RandomState(n)
    x = (rng.randn(n) * 0.2).clip(-1, 1).astype(np.float32)
    p = os.path.join(tmp_path, "t.flac")
    write_flac(p, x, 16000)
    y, sr = read_flac(p)
    assert sr == 16000 and y.shape == (n,)
    q = np.clip(x * 32768.0, -32768, 32767).astype(np.int32) / 32768.0
    np.testing.assert_array_equal(y, q.astype(np.float32))


def test_flac_compresses_predictable_signals(tmp_path):
    t = np.arange(16000) / 16000.0
    sine = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = os.path.join(tmp_path, "s.flac")
    write_flac(p, sine, 16000)
    assert os.path.getsize(p) < 16000 * 2 * 0.6  # fixed predictors bite
    y, _ = read_flac(p)
    q = np.clip(sine * 32768.0, -32768, 32767).astype(np.int32) / 32768.0
    np.testing.assert_array_equal(y, q.astype(np.float32))
    # Constant signal collapses to CONSTANT subframes.
    c = os.path.join(tmp_path, "c.flac")
    write_flac(c, np.zeros(8192, np.float32), 16000)
    assert os.path.getsize(c) < 200


def test_flac_streaminfo_md5_matches_pcm(tmp_path):
    """STREAMINFO carries the MD5 of the raw PCM — what strict decoders
    (flac -t) verify."""
    import hashlib

    rng = np.random.RandomState(0)
    x = (rng.randn(5000) * 0.1).astype(np.float32)
    p = os.path.join(tmp_path, "m.flac")
    write_flac(p, x, 16000)
    with open(p, "rb") as f:
        data = f.read()
    assert data[:4] == b"fLaC"
    # STREAMINFO block: 4-byte header then 34 bytes, MD5 = last 16.
    md5_stored = data[8 + 18: 8 + 34]
    pcm = np.clip(x * 32768.0, -32768, 32767).astype(np.int16)
    assert md5_stored == hashlib.md5(pcm.astype("<i2").tobytes()).digest()


def test_media_write_audio_flac_path(tmp_path):
    rng = np.random.RandomState(1)
    x = (rng.randn(3000) * 0.1).astype(np.float32)
    p = os.path.join(tmp_path, "a.flac")
    media.write_audio(p, x, 16000)
    y, sr = media.read_audio(p)
    assert sr == 16000
    q = np.clip(x * 32768.0, -32768, 32767).astype(np.int32) / 32768.0
    np.testing.assert_array_equal(y, q.astype(np.float32))


def test_prepare_artifacts_round_trip_reference_format(tmp_path):
    """LRS._prepare_sample writes .flac + _mouth.mp4 + .pt; the .pt loads
    with plain torch.load (reference tooling) with a LongTensor label, and
    the prepared sample is readable back through our own loaders."""
    torch = pytest.importorskip("torch")
    cv2 = pytest.importorskip("cv2")

    from avec_tpu.data.lrs import LRS, _load_audio_any, _load_infos

    root = os.path.join(tmp_path, "datasets")
    sample_dir = os.path.join(root, "LRS3", "test", "spk0")
    os.makedirs(sample_dir)
    base = os.path.join(sample_dir, "00001")

    # Source artifacts: a tiny mp4 + wav + label text.
    frames = (np.random.RandomState(0).rand(5, 96, 96, 3) * 255).astype(np.uint8)
    media.write_video(base + ".mp4", frames, fps=25.0)
    audio = (np.random.RandomState(1).randn(3200) * 0.1).astype(np.float32)
    media.write_audio(base + ".wav", audio, 16000)
    with open(base + ".txt", "w") as f:
        f.write("Text:  hello world\n")

    # Tokenizer for the prepare pass.
    from avec_tpu.utils.tokenizer import Tokenizer, train_bpe

    tok = Tokenizer(train_bpe(["hello world"], 32))
    tok_path = os.path.join(tmp_path, "tok.json")
    tok.save(tok_path)

    class _NoCrop:
        def crop_patch(self, frames, landmarks):
            raise AssertionError("no landmarks in this test")

        def __call__(self, frames):
            raise RuntimeError("no detector")  # falls back to resize

    ds = LRS.__new__(LRS)  # prepare-sample only; skip full init
    ds.root, ds.version = root, "LRS3"
    ds._prepare_sample(base, tok, _NoCrop())

    assert os.path.isfile(base + ".flac")
    assert os.path.isfile(base + "_mouth.mp4")
    assert os.path.isfile(base + ".pt")

    # Reference-tooling read: plain torch.load, LongTensor label.
    infos = torch.load(base + ".pt", weights_only=False)
    assert infos["label"].dtype == torch.long
    assert infos["video_len"] == 5 and infos["label_len"] > 0

    # Our loaders read the prepared artifacts back.
    got_audio = _load_audio_any(base)
    q = np.clip(audio * 32768.0, -32768, 32767).astype(np.int32) / 32768.0
    np.testing.assert_array_equal(got_audio, q.astype(np.float32))
    got_infos = _load_infos(base)
    assert got_infos["audio_len"] == 3200
    vid, _ = media.read_video(base + "_mouth.mp4")
    assert vid.shape[0] == 5 and vid.shape[1:3] == (96, 96)
