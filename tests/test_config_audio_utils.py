"""Config round-trip and remaining waveform-util coverage."""

import os
import numpy as np

from fullsubnet_plus_tpu.utils.config import load_config, merge_config, dump_config
from fullsubnet_plus_tpu.dsp.audio import (
    aligned_subsample,
    overlap_cat,
    activity_detector,
    norm_amplitude,
    tailor_db_fs,
    is_clipped,
)


def test_config_dump_roundtrip(tmp_path):
    config = {
        "meta": {"save_dir": "logs/x", "seed": 0, "flag": True},
        "acoustics": {"n_fft": 512, "sr": 16000},
        "model": {
            "path": "a.b.C",
            "args": {"kersize": [3, 5, 10], "sb_output_activate_function": False},
        },
    }
    path = str(tmp_path / "c.toml")
    dump_config(config, path)
    back = load_config(path)
    assert back == config


def test_merge_config():
    base = {"a": {"x": 1, "y": 2}, "b": 3}
    override = {"a": {"y": 9}, "c": 4}
    merged = merge_config(base, override)
    assert merged == {"a": {"x": 1, "y": 9}, "b": 3, "c": 4}
    assert base["a"]["y"] == 2  # no mutation


def test_reference_config_parses():
    """Our configs keep the reference's section shape and parse with tomllib."""
    cfg = load_config("configs/train.toml")
    assert cfg["model"]["path"] == "fullsubnet_plus.model.fullsubnet_plus.FullSubNet_Plus"
    assert cfg["model"]["args"]["sb_num_neighbors"] == 15
    assert cfg["train_dataset"]["dataloader"]["batch_size"] == 18
    inf = load_config("configs/inference.toml")
    assert inf["inferencer"]["type"] == "mag_complex_full_band_crm_mask"


def test_aligned_subsample(rng):
    a = rng.standard_normal(1000).astype(np.float32)
    b = a * 2
    sa, sb = aligned_subsample(a, b, 300, rng=np.random.default_rng(1))
    assert sa.shape == sb.shape == (300,)
    np.testing.assert_allclose(sb, sa * 2)
    # padding branch
    pa, pb = aligned_subsample(a[:100], b[:100], 300)
    assert pa.shape == (300,) and (pa[100:] == 0).all()


def test_overlap_cat(rng):
    chunks = [np.ones((2, 10)) * i for i in range(1, 4)]
    out = overlap_cat(chunks)
    assert out.shape == (2, 20)  # 3 chunks, 50% overlap
    # overlapping halves are averaged
    np.testing.assert_allclose(out[:, 5:10], np.full((2, 5), 1.5))


def test_activity_detector():
    sr = 16000
    t = np.arange(sr) / sr
    speech = 0.3 * np.sin(2 * np.pi * 300 * t)
    silence = np.zeros(sr)
    half = np.concatenate([speech, silence])
    frac = activity_detector(half, fs=sr)
    assert 0.3 < frac < 0.7


def test_loudness_helpers(rng):
    y = 0.5 * rng.standard_normal(16000).astype(np.float32)
    normed, scalar = norm_amplitude(y)
    assert abs(np.abs(normed).max() - 1.0) < 1e-3
    tailored, rms, _ = tailor_db_fs(y.copy(), -25)
    achieved = 20 * np.log10(np.sqrt(np.mean(tailored**2)))
    assert abs(achieved - (-25)) < 0.1
    assert not is_clipped(tailored)
    assert is_clipped(np.array([1.5]))


def test_enable_compilation_cache(tmp_path, monkeypatch):
    import jax

    from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    used = enable_compilation_cache(str(tmp_path / "jaxcache"))
    assert used == str(tmp_path / "jaxcache")
    assert os.path.isdir(used)
    assert jax.config.jax_compilation_cache_dir == used
    # env override wins when no explicit dir is passed
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "envcache"))
    assert enable_compilation_cache() == str(tmp_path / "envcache")
