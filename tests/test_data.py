"""Data layer tests: collate specs + bucketing, loader sharding/accum,
transforms, media IO, LRS dataset round-trip through real files."""

import json
import os

import numpy as np
import pytest

from avec_tpu.data.collate import CollateFn, round_to_bucket
from avec_tpu.data.dataset import Dataset, MultiDataset
from avec_tpu.data.loader import DataLoader
from avec_tpu.data.synthetic import SyntheticAVDataset, SyntheticLMDataset
from avec_tpu.data import transforms as T


def test_round_to_bucket():
    assert round_to_bucket(5, 8) == 5
    assert round_to_bucket(100, 8) == 104  # step 8 within [64, 128)
    assert round_to_bucket(128, 8) == 128
    assert round_to_bucket(129, 8) == 144  # step 16 within [128, 256)
    # Bounded waste: <= 1/granularity.
    for n in [17, 63, 999, 12345]:
        b = round_to_bucket(n, 8)
        assert n <= b <= n * (1 + 1 / 8) + 16


def test_collate_fn_av_spec():
    """The AO config's collate spec (configs/LRS23/AO/EffConfCTC.py:48)."""
    cf = CollateFn(inputs_params=[{"axis": 1, "padding": True}, {"axis": 4}],
                   targets_params=({"axis": 2, "padding": True}, {"axis": 5}),
                   bucket_granularity=0)
    ds = SyntheticAVDataset(num_samples=4, audio_len=8000, load_video=False)
    batch = cf([ds[i] for i in range(4)])
    audio, audio_len = batch["inputs"]
    labels, label_len = batch["targets"]
    assert audio.shape[0] == 4
    assert audio.shape[1] == max(int(x) for x in audio_len)
    assert labels.shape[1] == max(int(x) for x in label_len)
    # Padding beyond each sample's length must be zero.
    for i in range(4):
        assert (audio[i, int(audio_len[i]):] == 0).all()


def test_collate_start_end_tokens():
    """LM collate spec (configs/LibriSpeechCorpus/GPT-Small.py:29)."""
    cf = CollateFn(
        inputs_params=[{"axis": 0, "padding": True, "start_token": 7,
                        "padding_value": 0}],
        targets_params=[{"axis": 0, "padding": True, "end_token": 7,
                         "padding_value": -1}],
        bucket_granularity=0)
    samples = [(np.array([1, 2, 3], np.int32),), (np.array([4], np.int32),)]
    batch = cf(samples)
    np.testing.assert_array_equal(batch["inputs"][0], [7, 1, 2, 3])
    np.testing.assert_array_equal(batch["inputs"][1], [7, 4, 0, 0])
    np.testing.assert_array_equal(batch["targets"][0], [1, 2, 3, 7])
    np.testing.assert_array_equal(batch["targets"][1], [4, 7, -1, -1])


def test_bucketing_limits_shapes():
    cf = CollateFn(inputs_params=[{"axis": 0, "padding": True}],
                   targets_params=[{"axis": 1}], bucket_granularity=4)
    shapes = set()
    for length in range(60, 128):
        samples = [(np.zeros(length, np.float32), np.int32(0))]
        shapes.add(cf(samples)["inputs"].shape[1])
    assert len(shapes) <= 10, shapes  # bounded shape count per octave


def test_loader_sharding_and_accum():
    ds = SyntheticLMDataset(num_samples=32, batch_size=4)
    ds.collate_fn = CollateFn(inputs_params=[{"axis": 0, "padding": True}],
                              targets_params=[{"axis": 0, "padding": True}])
    # 2 replicas: each sees half the samples.
    l0 = DataLoader(ds, batch_size=4, num_replicas=2, rank=0, drop_last=True,
                    prefetch=0)
    l1 = DataLoader(ds, batch_size=4, num_replicas=2, rank=1, drop_last=True,
                    prefetch=0)
    assert len(l0) == len(l1) == 4
    # accum packs A*B samples per yielded batch.
    la = DataLoader(ds, batch_size=4, accum=2, drop_last=True, prefetch=0)
    batch = next(iter(la))
    assert batch["inputs"].shape[0] == 8
    # epoch reshuffle changes order.
    l = DataLoader(ds, batch_size=4, drop_last=True, prefetch=0)
    l.set_epoch(0)
    b0 = next(iter(l))["inputs"].copy()
    l.set_epoch(1)
    b1 = next(iter(l))["inputs"]
    assert b0.shape[0] == b1.shape[0]


def test_transforms():
    rng = np.random.RandomState(0)
    video = rng.rand(10, 96, 96, 1).astype(np.float32)
    assert T.RandomCrop((88, 88), rng)(video).shape == (10, 88, 88, 1)
    assert T.CenterCrop((88, 88))(video).shape == (10, 88, 88, 1)
    flipped = T.RandomHorizontalFlip(p=1.0, rng=rng)(video)
    np.testing.assert_allclose(flipped, video[:, :, ::-1])
    norm = T.NormalizeVideo((0.5,), (0.5,))(video)
    np.testing.assert_allclose(norm, (video - 0.5) / 0.5, rtol=1e-6)
    masked = T.TimeMaskSecond(0.4, 25.0, fps=25.0, mean_frame=True,
                              rng=rng)(video)
    assert masked.shape == video.shape

    audio = rng.randn(16000).astype(np.float32)
    noise = rng.randn(100000).astype(np.float32)
    noisy = T.BabbleNoise(noise=noise, SNR_db=[0], rng=rng)(audio)
    assert noisy.shape == audio.shape
    assert not np.allclose(noisy, audio)
    clean = T.BabbleNoise(noise=noise, SNR_db=[None], rng=rng)(audio)
    np.testing.assert_array_equal(clean, audio)


def test_align_video_to_audio():
    video = np.ones((20, 8, 8, 1), np.float32)
    audio = np.zeros(16000, np.float32)
    out = T.align_video_to_audio(video, audio)
    assert out.shape[0] == 16000 // 640 + 1  # ref transforms.py:174


def test_media_wav_roundtrip(tmp_path):
    from avec_tpu.utils import media

    audio = (np.sin(np.linspace(0, 100, 8000)) * 0.5).astype(np.float32)
    path = os.path.join(tmp_path, "x.wav")
    media.write_audio(path, audio, 16000)
    loaded, sr = media.read_audio(path)
    assert sr == 16000
    np.testing.assert_allclose(loaded, audio, atol=1e-4)


def test_media_video_roundtrip(tmp_path):
    from avec_tpu.utils import media

    video = (np.random.RandomState(0).rand(5, 64, 64, 3) * 255).astype(np.uint8)
    path = os.path.join(tmp_path, "x.mp4")
    media.write_video(path, video, 25.0)
    loaded, fps = media.read_video(path)
    assert loaded.shape == video.shape
    assert abs(fps - 25.0) < 1e-3


def test_lrs_dataset_from_prepared_files(tmp_path):
    """LRS3-style layout with our .json/.wav/_mouth.mp4 artifacts."""
    from avec_tpu.data.lrs import LRS
    from avec_tpu.utils import media

    root = str(tmp_path)
    d = os.path.join(root, "LRS3", "test", "spk0")
    os.makedirs(d)
    rng = np.random.RandomState(0)
    for name in ("00001", "00002"):
        base = os.path.join(d, name)
        with open(base + ".txt", "w") as f:
            f.write("Text:  hello world\n")
        audio = rng.randn(8000).astype(np.float32) * 0.1
        media.write_audio(base + ".wav", audio)
        video = (rng.rand(13, 96, 96, 3) * 255).astype(np.uint8)
        media.write_video(base + "_mouth.mp4", video)
        with open(base + ".json", "w") as f:
            json.dump({"label": [1, 2, 3], "video_len": 13,
                       "audio_len": 8000, "label_len": 3}, f)

    ds = LRS(batch_size=2, collate_fn=None, version="LRS3", mode="test",
             root=root, align=True)
    assert len(ds) == 2
    video, audio, label, v_len, a_len, l_len = ds[0]
    assert audio.shape[0] == 8000
    assert video.shape[1:] == (96, 96, 1)
    assert int(v_len) == 8000 // 640 + 1  # align=True re-pads video
    assert list(label) == [1, 2, 3]
    # Length filter drops everything over the cap and caches the path list.
    ds2 = LRS(batch_size=2, collate_fn=None, version="LRS3", mode="test",
              root=root, audio_max_length=4000)
    assert len(ds2) == 0
    cache_files = [f for f in os.listdir(os.path.join(root, "LRS3"))
                   if f.endswith("_paths.json")]
    assert cache_files


def test_multi_dataset_concat():
    a = SyntheticLMDataset(num_samples=3, seed=0)
    b = SyntheticLMDataset(num_samples=5, seed=100)
    m = MultiDataset([a, b], batch_size=2)
    assert len(m) == 8
    np.testing.assert_array_equal(m[0][0], a[0][0])
    np.testing.assert_array_equal(m[3][0], b[0][0])
    np.testing.assert_array_equal(m[7][0], b[4][0])


def test_loader_workers_match_serial():
    """num_workers>0 yields identical batches in identical order."""
    from avec_tpu.data.loader import DataLoader

    class Ds:
        shuffle = True
        collate_fn = None
        batch_size = None

        def __len__(self):
            return 23

        def __getitem__(self, n):
            return np.full((3,), n, np.int32)

    kw = dict(batch_size=4, collate_fn=lambda s: np.stack(s), seed=7)
    serial = list(DataLoader(Ds(), num_workers=0, **kw))
    threaded = list(DataLoader(Ds(), num_workers=4, **kw))
    assert len(serial) == len(threaded)
    for a, b in zip(serial, threaded):
        np.testing.assert_array_equal(a, b)


def test_loader_length_bucketing():
    """Bucketed batches group similar lengths; all samples appear once."""
    from avec_tpu.data.loader import DataLoader

    rng = np.random.RandomState(0)
    lengths = rng.randint(10, 1000, size=64).tolist()

    class Ds:
        shuffle = True
        collate_fn = None
        batch_size = None

        def __len__(self):
            return 64

        def __getitem__(self, n):
            return n

        def sample_lengths(self):
            return lengths

    dl = DataLoader(Ds(), batch_size=8, collate_fn=lambda s: list(s),
                    drop_last=True, seed=1, bucket_by_length=True,
                    bucket_pool_batches=4)
    batches = list(dl)
    seen = sorted(i for b in batches for i in b)
    assert seen == list(range(64))
    # Within each pool of 4 batches, batches must be length-sorted chunks:
    # the max length spread inside a batch is bounded by the pool's spread,
    # and on average far smaller than the global spread.
    spreads = [max(lengths[i] for i in b) - min(lengths[i] for i in b)
               for b in batches]
    global_spread = max(lengths) - min(lengths)
    assert np.mean(spreads) < global_spread / 2, (spreads, global_spread)


def test_loader_bucketing_keeps_epoch_reshuffle():
    from avec_tpu.data.loader import DataLoader

    class Ds:
        shuffle = True
        collate_fn = None
        batch_size = None

        def __len__(self):
            return 32

        def __getitem__(self, n):
            return n

        def sample_lengths(self):
            return list(range(32))

    dl = DataLoader(Ds(), batch_size=4, collate_fn=lambda s: list(s),
                    bucket_by_length=True, bucket_pool_batches=2)
    dl.set_epoch(0)
    e0 = [tuple(b) for b in dl]
    dl.set_epoch(1)
    e1 = [tuple(b) for b in dl]
    assert sorted(i for b in e0 for i in b) == list(range(32))
    assert e0 != e1  # epoch reshuffle changes batch composition/order


def test_tone_av_dataset_contract():
    """ToneAVSpeechDataset: LRS tuple layout, audio/video alignment, audio
    ambiguity + video disambiguation by construction."""
    from avec_tpu.data.synthetic import ToneAVSpeechDataset

    ds = ToneAVSpeechDataset(num_samples=8, vocab_size=32, seed=0,
                             batch_size=4)
    video, audio, label, v_len, a_len, n = ds[0]
    period, burst = 2400, 1600
    assert video.shape == (ds.max_len * period // 640 + 1, 88, 88, 1)
    assert audio.shape == (ds.max_len * period,)
    assert label.shape == (ds.max_len,)
    assert int(v_len) == int(a_len) // 640 + 1  # align_video_to_audio parity
    toks = ds.token_ids(0)
    assert int(n) == len(toks) and np.array_equal(label[: len(toks)], toks)

    # Video: during token i's burst, the cell encoding the FULL token id is
    # bright; audio ambiguity: tokens t and t+15 share an acoustic class.
    tok = int(toks[0]) - 1
    r, c = (tok // 8) * 11, (tok % 8) * 11
    f = burst // 2 // 640  # a frame inside the first burst
    assert video[f, r + 5, c + 5, 0] == 1.0
    assert ds.n_audio_classes == 15

    # Collate: real AV spec -> 4 inputs + 2 targets.
    batch = ds.collate_fn([ds[i] for i in range(4)])
    assert len(batch["inputs"]) == 4 and len(batch["targets"]) == 2
    assert batch["inputs"][0].shape[0] == 4
