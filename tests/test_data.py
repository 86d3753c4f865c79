"""Data pipeline tests: WAV I/O round-trip, dynamic mixing statistics,
deterministic RNG streams, dataset walkers, prefetching loader.
"""

import os

import numpy as np
import pytest

from fullsubnet_plus_tpu.data.wav import read_wav, write_wav, resample
from fullsubnet_plus_tpu.data.mixing import snr_mix, parse_snr_range
from fullsubnet_plus_tpu.data.datasets import (
    TrainDataset,
    ValidationDataset,
    InferenceDataset,
)
from fullsubnet_plus_tpu.data.loader import BatchLoader


@pytest.fixture
def corpus(tmp_path, rng):
    """Tiny synthetic corpus: 6 clean, 3 noise, 1 RIR + list files."""
    sr = 16000
    clean_dir = tmp_path / "clean"
    noise_dir = tmp_path / "noise"
    rir_dir = tmp_path / "rir"
    for d in (clean_dir, noise_dir, rir_dir):
        d.mkdir()
    clean_files, noise_files, rir_files = [], [], []
    for i in range(6):
        path = clean_dir / f"clean_{i}.wav"
        t = np.arange(sr * 2) / sr
        write_wav(str(path), 0.3 * np.sin(2 * np.pi * (200 + 50 * i) * t), sr)
        clean_files.append(str(path))
    for i in range(3):
        path = noise_dir / f"noise_{i}.wav"
        write_wav(str(path), 0.1 * rng.standard_normal(sr), sr)
        noise_files.append(str(path))
    rir = np.zeros(512, np.float32)
    rir[0] = 1.0
    rir[100] = 0.3
    write_wav(str(rir_dir / "rir_0.wav"), rir, sr, subtype="FLOAT")
    rir_files.append(str(rir_dir / "rir_0.wav"))

    lists = {}
    for name, files in (("clean", clean_files), ("noise", noise_files), ("rir", rir_files)):
        lst = tmp_path / f"{name}.txt"
        lst.write_text("\n".join(files) + "\n")
        lists[name] = str(lst)
    return tmp_path, lists


def test_wav_roundtrip_pcm16(tmp_path, rng):
    y = (0.5 * rng.standard_normal(16000)).astype(np.float32).clip(-1, 1)
    path = str(tmp_path / "a.wav")
    write_wav(path, y, 16000)
    back = read_wav(path)
    assert back.shape == y.shape
    np.testing.assert_allclose(back, y, atol=1.0 / 32768)


def test_wav_float_and_resample(tmp_path, rng):
    y = (0.5 * rng.standard_normal(32000)).astype(np.float32)
    path = str(tmp_path / "f.wav")
    write_wav(path, y, 32000, subtype="FLOAT")
    back = read_wav(path, sr=16000)
    assert abs(len(back) - 16000) <= 1


def test_snr_mix_achieves_snr(rng):
    sr = 16000
    clean = 0.3 * np.sin(2 * np.pi * 300 * np.arange(sr * 2) / sr).astype(np.float32)
    noise = (0.1 * rng.standard_normal(sr * 2)).astype(np.float32)
    for snr in (-5, 0, 10, 20):
        noisy, clean_out = snr_mix(
            clean.copy(), noise.copy(), snr, -25, 10, np.random.default_rng(1)
        )
        residual = noisy - clean_out
        achieved = 10 * np.log10(
            np.mean(clean_out**2) / (np.mean(residual**2) + 1e-12)
        )
        assert abs(achieved - snr) < 0.5, (snr, achieved)
        # loudness retarget within the floating window and no clipping
        db_fs = 20 * np.log10(np.sqrt(np.mean(noisy**2)) + 1e-12)
        assert -36 < db_fs < -14
        assert np.max(np.abs(noisy)) <= 1.0


def test_parse_snr_range():
    assert parse_snr_range((-5, 20)) == list(range(-5, 21))
    assert parse_snr_range((0, 0)) == [0]


def test_train_dataset_deterministic(corpus):
    _, lists = corpus
    kwargs = dict(
        clean_dataset=lists["clean"],
        noise_dataset=lists["noise"],
        rir_dataset=lists["rir"],
        sub_sample_length=1.0,
        seed=3,
    )
    ds1 = TrainDataset(**kwargs)
    ds2 = TrainDataset(**kwargs)
    ds1.set_epoch(5)
    ds2.set_epoch(5)
    n1, c1 = ds1[2]
    n2, c2 = ds2[2]
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(c1, c2)
    assert n1.shape == (16000,)
    # different epoch -> different example
    ds2.set_epoch(6)
    n3, _ = ds2[2]
    assert not np.array_equal(n1, n3)


def test_train_dataset_host_sharding(corpus):
    _, lists = corpus
    kwargs = dict(
        clean_dataset=lists["clean"],
        noise_dataset=lists["noise"],
        rir_dataset=lists["rir"],
        sub_sample_length=1.0,
    )
    ds_all = TrainDataset(**kwargs)
    ds_h0 = TrainDataset(**kwargs, host_id=0, num_hosts=2)
    ds_h1 = TrainDataset(**kwargs, host_id=1, num_hosts=2)
    assert len(ds_h0) + len(ds_h1) == len(ds_all)
    assert set(ds_h0.clean_list).isdisjoint(ds_h1.clean_list)


def test_batch_loader(corpus):
    _, lists = corpus
    ds = TrainDataset(
        clean_dataset=lists["clean"],
        noise_dataset=lists["noise"],
        rir_dataset=lists["rir"],
        sub_sample_length=1.0,
    )
    loader = BatchLoader(ds, batch_size=2, num_workers=2)
    batches = list(loader.epoch(0))
    assert len(batches) == len(loader) == 3
    noisy, clean = batches[0]
    assert noisy.shape == clean.shape == (2, 16000)
    assert noisy.dtype == np.float32


def test_validation_dataset_layout(tmp_path, rng):
    sr = 16000
    for split in ("with_reverb", "no_reverb"):
        for sub in ("noisy", "clean"):
            (tmp_path / split / sub).mkdir(parents=True)
        for i in range(2):
            write_wav(
                str(tmp_path / split / "noisy" / f"x_snr10_fileid_{i}.wav"),
                0.1 * rng.standard_normal(sr),
                sr,
            )
            write_wav(
                str(tmp_path / split / "clean" / f"clean_fileid_{i}.wav"),
                0.1 * rng.standard_normal(sr),
                sr,
            )
    ds = ValidationDataset([str(tmp_path / "with_reverb"), str(tmp_path / "no_reverb")])
    assert len(ds) == 4
    noisy, clean, name, speech_type = ds[0]
    assert noisy.shape == clean.shape == (sr,)
    assert speech_type in ("With_reverb", "No_reverb")


def test_inference_dataset(tmp_path, rng):
    sub = tmp_path / "in" / "nested"
    sub.mkdir(parents=True)
    write_wav(str(sub / "a.wav"), 0.1 * rng.standard_normal(8000), 16000)
    write_wav(str(tmp_path / "in" / "b.wav"), 0.1 * rng.standard_normal(8000), 16000)
    ds = InferenceDataset([str(tmp_path / "in")])
    assert len(ds) == 2
    wav, name = ds[0]
    assert wav.ndim == 1 and isinstance(name, str)


def test_batch_loader_propagates_worker_exception():
    """A crashing __getitem__ must raise in the consumer, not hang the
    training loop (regression: a dead producer thread left q.get() blocked
    forever)."""

    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, idx):
            raise ValueError("synthetic worker failure")

    loader = BatchLoader(Boom(), batch_size=2, num_workers=2)
    with pytest.raises(ValueError, match="synthetic worker failure"):
        list(loader.epoch(0))


def test_snr_mix_zero_floating_value(corpus):
    """target_dB_FS_floating_value=0 means a fixed loudness target — the
    reference's randint(low, high) would raise on low >= high
    (dataset_train.py:166); we handle it (regression: hung the trainer via
    the loader)."""
    _, lists = corpus
    ds = TrainDataset(
        clean_dataset=lists["clean"],
        noise_dataset=lists["noise"],
        rir_dataset="",
        sub_sample_length=1.0,
        target_dB_FS_floating_value=0,
        reverb_proportion=0.0,
    )
    noisy, clean = ds[0]
    assert noisy.shape == clean.shape == (16000,)
    assert np.isfinite(noisy).all() and np.isfinite(clean).all()

def test_batch_loader_early_exit_releases_producer(corpus):
    """Closing the epoch generator early (preemption, a failing train step)
    must unblock and join the producer thread — a bare q.put() on the full
    prefetch queue used to leak the producer + its worker pool forever."""
    import threading
    import time

    _, lists = corpus
    dataset = TrainDataset(
        lists["clean"], lists["noise"], lists["rir"], sub_sample_length=0.5
    )
    loader = BatchLoader(dataset, 2, num_workers=2, prefetch=1, seed=0)
    before = threading.active_count()
    gen = loader.epoch(0)
    next(gen)  # producer is now blocked refilling the size-1 queue
    gen.close()  # finally: stop.set() + join — must not hang or leak
    deadline = time.time() + 10
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before
