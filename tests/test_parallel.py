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

def _collective_sizes(hlo_text: str) -> dict:
    """{op_name: [result element counts]} for every collective in compiled
    HLO (handles -start forms and tuple-shaped results)."""
    import re

    pat = re.compile(
        r"= \(?((?:\w+\[[0-9,]*\][^ )]*(?:, )?)+)\)? "
        r"(all-gather|all-reduce|collective-permute|all-to-all|reduce-scatter)"
        r"(?:-start)?\("
    )
    sizes: dict = {}
    for m in pat.finditer(hlo_text):
        shapes = re.findall(r"\w+\[([0-9,]*)\]", m.group(1))
        n = max(
            int(np.prod([int(x) for x in s.split(",") if x] or [1]))
            for s in shapes
        )
        sizes.setdefault(m.group(2), []).append(n)
    return sizes


def test_fold_sharded_hlo_scale_proof(rng):
    """Scale-proof HLO assertions (VERDICT r1 item 6): GSPMD must not insert
    a fold-sized (or larger) resharding collective — a silent all-gather of
    the (B·F) sub-band batch would wreck real multi-chip perf long before
    any throughput test notices on the 8-CPU fake mesh.

    Pinned state (measured at introduction):
      * serving forward: ZERO collectives — the fold reshard from
        batch-sharded [B,F,34,T] to (data,freq)-sharded [(B·F),34,T] is
        communication-free (every freq shard's F rows are already local),
        and the output stays sharded;
      * train step: gradient all-reduces exist, and every collective result
        is smaller than the folded tensor itself.
    """
    from fullsubnet_plus_tpu.parallel import replicated
    from fullsubnet_plus_tpu.parallel.mesh import data_sharding
    from fullsubnet_plus_tpu.train.loss import mse_loss
    from fullsubnet_plus_tpu.train.step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    cfg = FullSubNetPlusConfig(**SMALL, fold_sharding=("data", "freq"))
    mesh = make_mesh(data=4, freq=2)
    params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), cfg)

    # -- serving forward -----------------------------------------------------
    B, T = 8, 65
    mag = np.abs(rng.standard_normal((B, 1, 33, T))).astype(np.float32)
    real = rng.standard_normal((B, 1, 33, T)).astype(np.float32)
    imag = rng.standard_normal((B, 1, 33, T)).astype(np.float32)
    bs4 = data_sharding(mesh, 4)
    with jax.set_mesh(mesh):
        fwd = jax.jit(
            lambda p, m, r, i: FULLSUBNET_PLUS.apply(p, m, r, i, cfg),
            in_shardings=(None, bs4, bs4, bs4),
        )
        fwd_hlo = fwd.lower(params, mag, real, imag).compile().as_text()
    assert _collective_sizes(fwd_hlo) == {}, (
        "serving forward grew collectives: " + str(_collective_sizes(fwd_hlo))
    )

    # -- train step ------------------------------------------------------------
    optimizer = make_optimizer()
    state = init_train_state(params, optimizer)
    state = jax.device_put(state, replicated(mesh))
    step = make_train_step(
        FULLSUBNET_PLUS, cfg, optimizer, mse_loss, mesh=mesh,
        n_fft=64, hop_length=32, win_length=64,
    )
    jitted = next(
        c.cell_contents for c in step.__closure__
        if hasattr(c.cell_contents, "lower")
    )
    noisy = (0.1 * rng.standard_normal((8, 2048))).astype(np.float32)
    clean = (0.8 * noisy).astype(np.float32)
    with jax.set_mesh(mesh):
        train_hlo = jitted.lower(state, noisy, clean).compile().as_text()
    sizes = _collective_sizes(train_hlo)
    assert sizes.get("all-reduce"), "gradient all-reduce missing from train HLO"
    # folded train tensor: (B·F/groups) rows × 12 features × (T + look_ahead)
    t_frames = 2048 // 32 + 1 + 2
    fold_elems = (8 * 33 // 2) * 12 * t_frames
    worst = max(n for v in sizes.values() for n in v)
    assert worst < fold_elems, (
        f"a collective result ({worst} elems) reaches fold size "
        f"({fold_elems}) — GSPMD is regathering the sub-band fold: {sizes}"
    )


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
