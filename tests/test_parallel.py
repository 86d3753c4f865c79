"""Multi-chip logic on the fake 8-device CPU mesh: fold-sharded forward
equivalence and mesh-sharded batched enhancement equivalence.
"""

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from fullsubnet_plus_tpu.parallel import make_mesh

SMALL = dict(
    num_freqs=33, sb_num_neighbors=4, fb_model_hidden_size=32, sb_model_hidden_size=24
)


def test_fold_sharded_forward_matches_unsharded(rng):
    cfg_plain = FullSubNetPlusConfig(**SMALL)
    cfg_sharded = FullSubNetPlusConfig(**SMALL, fold_sharding=("data", "freq"))
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), cfg_plain)
    B, T = 4, 25
    mag = np.abs(rng.standard_normal((B, 1, 33, T))).astype(np.float32)
    real = rng.standard_normal((B, 1, 33, T)).astype(np.float32)
    imag = rng.standard_normal((B, 1, 33, T)).astype(np.float32)

    ref = np.asarray(FULLSUBNET_PLUS.apply(params, mag, real, imag, cfg_plain))
    mesh = make_mesh(data=4, freq=2)
    with jax.set_mesh(mesh):
        out = np.asarray(
            jax.jit(
                lambda p, m, r, i: FULLSUBNET_PLUS.apply(p, m, r, i, cfg_sharded)
            )(params, mag, real, imag)
        )
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_fold_sharded_train_step_kernel_matches_scan(rng, monkeypatch):
    """Full sharded training step through the Pallas kernel (interpret mode,
    forced via FORCE_PALLAS_INTERPRET) matches the lax.scan path: same loss
    and same global gradient norm on the ('data','freq') mesh."""
    import fullsubnet_plus_tpu.nn.sequence as seq_mod
    from fullsubnet_plus_tpu.parallel import replicated
    from fullsubnet_plus_tpu.train.loss import mse_loss
    from fullsubnet_plus_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = FullSubNetPlusConfig(**SMALL, fold_sharding=("data", "freq"))
    mesh = make_mesh(data=4, freq=2)
    optimizer = make_optimizer()
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), cfg)
    noisy = (0.1 * rng.standard_normal((4, 2048))).astype(np.float32)
    clean = (0.8 * noisy).astype(np.float32)

    def run(force_kernel):
        monkeypatch.setattr(seq_mod, "FORCE_PALLAS_INTERPRET", force_kernel)
        step = make_train_step(
            FULLSUBNET_PLUS, cfg, optimizer, mse_loss, mesh=mesh,
            n_fft=64, hop_length=32, win_length=64,
        )
        state = init_train_state(
            jax.tree_util.tree_map(jnp.copy, params), optimizer
        )
        state = jax.device_put(state, replicated(mesh))
        with jax.default_matmul_precision("highest"):
            _, metrics = step(state, noisy, clean)
        return float(metrics["loss"]), float(metrics["grad_norm"])

    loss_scan, gnorm_scan = run(False)
    loss_kernel, gnorm_kernel = run(True)
    np.testing.assert_allclose(loss_kernel, loss_scan, rtol=1e-5)
    np.testing.assert_allclose(gnorm_kernel, gnorm_scan, rtol=1e-4)


def test_mesh_enhancer_matches_single_device(rng):
    from fullsubnet_plus_tpu.enhance import Enhancer

    cfg = FullSubNetPlusConfig(**SMALL)
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), cfg)
    acoustics = dict(n_fft=64, hop_length=32, win_length=64)
    noisy = (0.1 * rng.standard_normal((8, 4000))).astype(np.float32)

    plain = Enhancer(FULLSUBNET_PLUS, cfg, params, **acoustics)
    ref = plain.enhance_batch(noisy)

    mesh = make_mesh(data=4, freq=2)
    cfg_sharded = FullSubNetPlusConfig(**SMALL, fold_sharding=("data",))
    sharded = Enhancer(FULLSUBNET_PLUS, cfg_sharded, params, mesh=mesh, **acoustics)
    out = sharded.enhance_batch(noisy)
    assert out.shape == ref.shape == (8, 4000)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)

def test_auto_mesh_multi_host_sizing(monkeypatch):
    """Multi-process auto_mesh must size the data axis from the GLOBAL batch
    and use every device uniformly (regression: local-batch sizing built a
    6-device mesh over 2x4-host topologies that globalize_batch's
    make_array_from_process_local_data then rejects on the first batch)."""
    import jax
    import pytest

    from fullsubnet_plus_tpu.parallel.mesh import auto_mesh

    devices = jax.devices()
    assert len(devices) == 8
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    with pytest.raises(ValueError):  # 18/host x 2 = 36, not divisible by 8
        auto_mesh(18, devices=devices)
    mesh = auto_mesh(16, devices=devices)  # 32 % 8 == 0 -> all devices
    assert mesh.shape == {"data": 8, "freq": 1}
