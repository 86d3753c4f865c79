"""Metric sanity tests + checkpoint round-trip tests."""

import jax
import numpy as np
import pytest

from fullsubnet_plus_tpu.eval import (
    si_sdr,
    stoi,
    compute_metric,
    transform_pesq_range,
    validation_score,
)
from fullsubnet_plus_tpu.eval.metrics import metric_available


def _speechlike(rng, seconds=2.0, sr=16000):
    """Modulated multi-tone — has spectral and temporal structure so STOI's
    silent-frame removal and band envelopes behave like speech."""
    t = np.arange(int(seconds * sr)) / sr
    env = 0.5 * (1 + np.sin(2 * np.pi * 3 * t))
    sig = sum(np.sin(2 * np.pi * f * t) for f in (220, 450, 900, 1800))
    return (0.2 * env * sig).astype(np.float32)


def test_si_sdr_basics(rng):
    clean = _speechlike(rng)
    assert si_sdr(clean, clean) > 60
    noisy = clean + 0.1 * rng.standard_normal(len(clean)).astype(np.float32)
    mid = si_sdr(clean, noisy)
    noisier = clean + 0.5 * rng.standard_normal(len(clean)).astype(np.float32)
    assert si_sdr(clean, noisier) < mid < si_sdr(clean, clean)
    # scale invariance
    np.testing.assert_allclose(si_sdr(clean, 2.0 * noisy), mid, atol=1e-6)


def test_stoi_basics(rng):
    clean = _speechlike(rng)
    perfect = stoi(clean, clean)
    assert perfect > 0.99
    noisy = clean + 0.05 * rng.standard_normal(len(clean)).astype(np.float32)
    mid = stoi(clean, noisy)
    very_noisy = clean + 1.0 * rng.standard_normal(len(clean)).astype(np.float32)
    low = stoi(clean, very_noisy)
    assert low < mid < perfect
    assert 0.0 <= low <= 1.0


def test_pesq_gated():
    if metric_available("WB_PESQ"):
        pytest.skip("pesq installed; gating not exercised")
    with pytest.raises(RuntimeError, match="pesq"):
        compute_metric("WB_PESQ", np.zeros(16000), np.zeros(16000))


def test_validation_score():
    assert transform_pesq_range(4.5) == 1.0
    s = validation_score({"STOI": 0.9, "WB_PESQ": 2.0})
    assert abs(s - (0.9 + 0.5) / 2) < 1e-9
    assert validation_score({"STOI": 0.8}) == 0.8


def test_checkpoint_roundtrip(tmp_path, rng):
    from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
    from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
    from fullsubnet_plus_tpu.train.step import make_optimizer, init_train_state
    from fullsubnet_plus_tpu.io.checkpoint import CheckpointManager

    cfg = FullSubNetPlusConfig(
        num_freqs=17, sb_num_neighbors=2, fb_model_hidden_size=8,
        sb_model_hidden_size=8,
    )
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), cfg)
    optimizer = make_optimizer()
    state = init_train_state(params, optimizer)

    mgr = CheckpointManager(str(tmp_path / "exp"))
    mgr.save(state, epoch=3, best_score=0.5, is_best=True)
    assert mgr.has_checkpoint()

    # perturb, then resume — must restore exactly
    state2 = init_train_state(
        FULLSUBNET_PLUS.init(jax.random.PRNGKey(1), cfg), optimizer
    )
    state3, epoch, best = mgr.resume(state2)
    assert epoch == 3 and best == 0.5
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(state3.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # opt_state structure survives (optax namedtuples)
    assert jax.tree_util.tree_structure(state.opt_state) == jax.tree_util.tree_structure(
        state3.opt_state
    )

    # weights-only preload from the per-epoch snapshot
    preloaded = mgr.preload_params(
        str(tmp_path / "exp" / "checkpoints" / "model_0003.npz"), state2.params
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params), jax.tree_util.tree_leaves(preloaded)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_torch_checkpoint_ingest(tmp_path):
    """Round-trip a torch state_dict .tar through load_torch_checkpoint."""
    import sys, types, torch

    if "librosa" not in sys.modules:
        sys.modules["librosa"] = types.ModuleType("librosa")
    for p in ("/root/reference/speech_enhance", "/root/reference"):
        if p not in sys.path:
            sys.path.insert(0, p)
    from fullsubnet_plus.model.fullsubnet_plus import FullSubNet_Plus
    from fullsubnet_plus_tpu.io.checkpoint import load_torch_checkpoint

    torch.manual_seed(0)
    model = FullSubNet_Plus(
        num_freqs=257, look_ahead=2, sequence_model="LSTM", fb_num_neighbors=0,
        sb_num_neighbors=15, fb_output_activate_function="ReLU",
        sb_output_activate_function=False, fb_model_hidden_size=512,
        sb_model_hidden_size=384, channel_attention_model="TSSE",
        norm_type="offline_laplace_norm", num_groups_in_drop_band=2,
        kersize=[3, 5, 10], subband_num=1, weight_init=False,
    )
    path = str(tmp_path / "best_model.tar")
    torch.save({"model": model.state_dict(), "epoch": 12}, path)
    params = load_torch_checkpoint(path, "fullsubnet_plus")
    ref_w = model.state_dict()["sb_model.sequence_model.weight_ih_l0"].numpy()
    np.testing.assert_array_equal(
        params["sb_model"]["seq"]["layers"][0]["w_ih"], ref_w.T
    )


def test_export_torch_cli_roundtrip(tmp_path):
    """npz -> export_torch CLI -> .tar -> load_torch_checkpoint == original."""
    import jax
    from fullsubnet_plus_tpu.models import fullsubnet_plus as jmodel
    from fullsubnet_plus_tpu.io.checkpoint import load_torch_checkpoint, save_pytree
    from fullsubnet_plus_tpu.cli.export_torch import main as export_main

    cfg = jmodel.FullSubNetPlusConfig(
        num_freqs=33, sb_num_neighbors=4, fb_model_hidden_size=16,
        sb_model_hidden_size=12,
    )
    params = jmodel.init(jax.random.PRNGKey(5), cfg)
    npz = str(tmp_path / "best_model.npz")
    save_pytree(npz, {"params": params}, {"epoch": 7, "best_score": 0.5})

    tar = str(tmp_path / "best_model.tar")
    export_main(["-M", npz, "-O", tar])

    back = load_torch_checkpoint(tar)
    flat_a, tree_a = jax.tree_util.tree_flatten(params)
    flat_b, tree_b = jax.tree_util.tree_flatten(back)
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a, np.float32), b)

    import torch
    blob = torch.load(tar, map_location="cpu", weights_only=True)
    assert blob["epoch"] == 7 and "model" in blob
