"""Pallas fused-LSTM kernel parity vs the lax.scan path (interpret mode on
CPU; the same kernel compiles on TPU — verified in bench runs).

The kernels take x CHANNEL-MAJOR [N, D, T] (the model's native fold layout);
the scan reference takes [N, T, D], hence the swapaxes at each call."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fullsubnet_plus_tpu.nn.lstm import lstm_init, lstm_apply
from fullsubnet_plus_tpu.ops.lstm_pallas import stacked_lstm2


@pytest.mark.parametrize("n,t,d,h,tile", [(100, 17, 34, 64, 64), (130, 9, 12, 48, 32)])
def test_pallas_matches_scan(rng, n, t, d, h, tile):
    params = lstm_init(jax.random.PRNGKey(0), d, h, 2)
    x = (rng.standard_normal((n, t, d)) * 0.5).astype(np.float32)
    ref, _ = lstm_apply(params, jnp.asarray(x))
    out = stacked_lstm2(params, jnp.swapaxes(jnp.asarray(x), 1, 2), tile_n=tile, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_pallas_fused_fc(rng):
    """Fused output projection matches scan-LSTM + separate Linear."""
    from fullsubnet_plus_tpu.nn.init import linear_init

    params = lstm_init(jax.random.PRNGKey(3), 34, 64, 2)
    fc = linear_init(jax.random.PRNGKey(4), 64, 2)
    x = (rng.standard_normal((100, 17, 34)) * 0.5).astype(np.float32)
    hid, _ = lstm_apply(params, jnp.asarray(x))
    ref = hid @ fc["weight"] + fc["bias"]
    out = stacked_lstm2(params, jnp.swapaxes(jnp.asarray(x), 1, 2), fc, tile_n=64, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_pallas_small_fold_tile_shrink(rng):
    """N smaller than tile_n shrinks the tile instead of 8x-padding (the
    full-band LSTM of the FullSubNet baseline runs at N = batch)."""
    params = lstm_init(jax.random.PRNGKey(5), 20, 32, 2)
    x = (rng.standard_normal((6, 9, 20)) * 0.5).astype(np.float32)
    ref, _ = lstm_apply(params, jnp.asarray(x))
    out = stacked_lstm2(params, jnp.swapaxes(jnp.asarray(x), 1, 2), tile_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("n,t,d,h,o,tile",
                         [(20, 9, 10, 16, 3, 256), (100, 17, 34, 64, 2, 64),
                          (96, 12, 34, 32, 2, 32)])  # 3 row tiles: the
                         # in-kernel weight-grad accumulators must sum
                         # across the outer grid dimension too
def test_pallas_train_vjp_matches_scan_grads(rng, n, t, d, h, o, tile):
    """Custom-VJP (residual fwd kernel + reverse-sweep bwd kernel) gradient
    parity vs jax.grad through the lax.scan path, for every param tensor,
    the input, and the fused fc."""
    from fullsubnet_plus_tpu.nn.init import linear_init
    from fullsubnet_plus_tpu.ops.lstm_pallas import stacked_lstm2_train

    params = lstm_init(jax.random.PRNGKey(6), d, h, 2)
    fc = linear_init(jax.random.PRNGKey(7), h, o)
    x = jnp.asarray((rng.standard_normal((n, t, d)) * 0.5).astype(np.float32))
    # Fixed cotangent seed so the loss exercises every output element.
    dy = jnp.asarray(rng.standard_normal((n, t, o)).astype(np.float32))

    def loss_scan(params, x, fc):
        hid, _ = lstm_apply(params, x)
        return jnp.sum((hid @ fc["weight"] + fc["bias"]) * dy)

    def loss_pallas(params, x, fc):
        return jnp.sum(
            stacked_lstm2_train(params, jnp.swapaxes(x, 1, 2), fc, tile, True) * dy
        )

    with jax.default_matmul_precision("highest"):
        v0, g0 = jax.value_and_grad(loss_scan, argnums=(0, 1, 2))(params, x, fc)
        v1, g1 = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(params, x, fc)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4)


def test_pallas_train_vjp_bwd_row_tile_knob(rng, monkeypatch):
    """BWD_ROW_TILE (the perf-experiment knob, scripts/exp_btile.py) changes
    only the backward grid tiling — gradients must match the default rule
    exactly. Uses a knob value that divides the padded fold but differs
    from the halving rule's choice."""
    from fullsubnet_plus_tpu.nn.init import linear_init
    from fullsubnet_plus_tpu.ops import lstm_pallas as lp

    n, t, d, h, o = 48, 7, 12, 16, 2
    params = lstm_init(jax.random.PRNGKey(30), d, h, 2)
    fc = linear_init(jax.random.PRNGKey(31), h, o)
    x = jnp.asarray((rng.standard_normal((n, t, d)) * 0.5).astype(np.float32))
    dy = jnp.asarray(rng.standard_normal((n, t, o)).astype(np.float32))

    def loss(params, x, fc):
        return jnp.sum(
            lp.stacked_lstm2_train(params, jnp.swapaxes(x, 1, 2), fc, 48, True) * dy
        )

    with jax.default_matmul_precision("highest"):
        g_default = jax.grad(loss, argnums=(0, 1, 2))(params, x, fc)
        monkeypatch.setattr(lp, "BWD_ROW_TILE", 16)
        g_knob = jax.grad(loss, argnums=(0, 1, 2))(params, x, fc)
    for a, b in zip(jax.tree_util.tree_leaves(g_default),
                    jax.tree_util.tree_leaves(g_knob)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_pallas_train_vjp_bwd_sub_tiles_knob(rng, monkeypatch):
    """BWD_SUB_TILES (the reverse-sweep interleave probe, VERDICT r4 #6)
    splits each backward grid step into independent row chains — pure
    scheduling, so gradients must match the default exactly."""
    from fullsubnet_plus_tpu.nn.init import linear_init
    from fullsubnet_plus_tpu.ops import lstm_pallas as lp

    n, t, d, h, o = 48, 7, 12, 16, 2
    params = lstm_init(jax.random.PRNGKey(32), d, h, 2)
    fc = linear_init(jax.random.PRNGKey(33), h, o)
    x = jnp.asarray((rng.standard_normal((n, t, d)) * 0.5).astype(np.float32))
    dy = jnp.asarray(rng.standard_normal((n, t, o)).astype(np.float32))

    def loss(params, x, fc):
        return jnp.sum(
            lp.stacked_lstm2_train(params, jnp.swapaxes(x, 1, 2), fc, 48, True) * dy
        )

    with jax.default_matmul_precision("highest"):
        g_default = jax.grad(loss, argnums=(0, 1, 2))(params, x, fc)
        monkeypatch.setattr(lp, "BWD_SUB_TILES", 2)
        g_knob = jax.grad(loss, argnums=(0, 1, 2))(params, x, fc)
    for a, b in zip(jax.tree_util.tree_leaves(g_default),
                    jax.tree_util.tree_leaves(g_knob)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_pallas_train_vjp_einsum_fallback(rng, monkeypatch):
    """FUSED_WGRAD=False restores the dgates-materializing einsum weight
    grads; both paths must produce the same gradients."""
    from fullsubnet_plus_tpu.nn.init import linear_init
    from fullsubnet_plus_tpu.ops import lstm_pallas as lp

    n, t, d, h, o = 40, 9, 12, 16, 2
    params = lstm_init(jax.random.PRNGKey(20), d, h, 2)
    fc = linear_init(jax.random.PRNGKey(21), h, o)
    x = jnp.asarray((rng.standard_normal((n, t, d)) * 0.5).astype(np.float32))
    dy = jnp.asarray(rng.standard_normal((n, t, o)).astype(np.float32))

    def loss(params, x, fc):
        return jnp.sum(
            lp.stacked_lstm2_train(params, jnp.swapaxes(x, 1, 2), fc, 32, True) * dy
        )

    with jax.default_matmul_precision("highest"):
        g_fused = jax.grad(loss, argnums=(0, 1, 2))(params, x, fc)
        monkeypatch.setattr(lp, "FUSED_WGRAD", False)
        g_einsum = jax.grad(loss, argnums=(0, 1, 2))(params, x, fc)
    for a, b in zip(jax.tree_util.tree_leaves(g_fused),
                    jax.tree_util.tree_leaves(g_einsum)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_pallas_train_vjp_bf16(rng):
    """bf16 gradient path: residuals are stored in bf16; grads must come back
    in the params' dtype and stay close to the fp32 reference."""
    from fullsubnet_plus_tpu.nn.init import linear_init
    from fullsubnet_plus_tpu.ops.lstm_pallas import stacked_lstm2_train

    n, t, d, h, o = 24, 7, 10, 16, 2
    params32 = lstm_init(jax.random.PRNGKey(12), d, h, 2)
    fc32 = linear_init(jax.random.PRNGKey(13), h, o)
    x32 = jnp.asarray((rng.standard_normal((n, t, d)) * 0.5).astype(np.float32))
    dy = jnp.asarray(rng.standard_normal((n, t, o)).astype(np.float32))
    to_bf16 = lambda tree: jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), tree
    )

    def loss(params, x, fc):
        y = stacked_lstm2_train(params, jnp.swapaxes(x, 1, 2), fc, 256, True)
        return jnp.sum(y.astype(jnp.float32) * dy)

    with jax.default_matmul_precision("highest"):
        g32 = jax.grad(loss, argnums=(0, 1, 2))(params32, x32, fc32)
        g16 = jax.grad(loss, argnums=(0, 1, 2))(
            to_bf16(params32), x32.astype(jnp.bfloat16), to_bf16(fc32)
        )
    for a, b in zip(jax.tree_util.tree_leaves(g32), jax.tree_util.tree_leaves(g16)):
        assert b.dtype == jnp.bfloat16
        scale = float(jnp.max(jnp.abs(a))) + 1e-6
        err = float(jnp.max(jnp.abs(a - b.astype(jnp.float32)))) / scale
        assert err < 0.05, f"bf16 grad rel err {err} for {a.shape}"


def test_pallas_sharded_fold_matches_scan_grads(rng):
    """shard_map'd kernel over a ('data','freq')-sharded fold: value and
    gradient parity vs the unsharded scan path on the virtual 8-device mesh
    (weight grads must be psum'd across shards by the shard_map transpose)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fullsubnet_plus_tpu.nn.init import linear_init
    from fullsubnet_plus_tpu.ops.lstm_pallas import stacked_lstm2_train_sharded
    from fullsubnet_plus_tpu.parallel import make_mesh

    n, t, d, h, o = 32, 7, 10, 16, 3
    params = lstm_init(jax.random.PRNGKey(10), d, h, 2)
    fc = linear_init(jax.random.PRNGKey(11), h, o)
    x = jnp.asarray(rng.standard_normal((n, t, d)).astype(np.float32))
    dy = jnp.asarray(rng.standard_normal((n, t, o)).astype(np.float32))

    def loss_scan(params, x, fc):
        hid, _ = lstm_apply(params, x)
        return jnp.sum((hid @ fc["weight"] + fc["bias"]) * dy)

    def loss_sharded(params, x, fc):
        y = stacked_lstm2_train_sharded(
            params, jnp.swapaxes(x, 1, 2), fc, ("data", "freq"), 8, True
        )
        return jnp.sum(y * dy)

    mesh = make_mesh(data=4, freq=2)
    with jax.default_matmul_precision("highest"):
        v0, g0 = jax.value_and_grad(loss_scan, argnums=(0, 1, 2))(params, x, fc)
        with jax.set_mesh(mesh):
            xs = jax.device_put(x, NamedSharding(mesh, P(("data", "freq"), None, None)))
            v1, g1 = jax.jit(jax.value_and_grad(loss_sharded, argnums=(0, 1, 2)))(
                params, xs, fc
            )
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4, rtol=1e-4)


def test_pallas_train_primal_matches_inference_kernel(rng):
    """stacked_lstm2_train's primal is exactly stacked_lstm2 (no VJP tax)."""
    from fullsubnet_plus_tpu.nn.init import linear_init
    from fullsubnet_plus_tpu.ops.lstm_pallas import stacked_lstm2_train

    params = lstm_init(jax.random.PRNGKey(8), 12, 32, 2)
    fc = linear_init(jax.random.PRNGKey(9), 32, 2)
    x = jnp.asarray((rng.standard_normal((24, 7, 12)) * 0.5).astype(np.float32))
    xc = jnp.swapaxes(x, 1, 2)
    a = stacked_lstm2(params, xc, fc, tile_n=32, interpret=True)
    b = stacked_lstm2_train(params, xc, fc, 32, True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=0, rtol=0)


def test_pallas_sub_tiles(rng):
    params = lstm_init(jax.random.PRNGKey(2), 34, 64, 2)
    x = (rng.standard_normal((64, 13, 34)) * 0.5).astype(np.float32)
    ref, _ = lstm_apply(params, jnp.asarray(x))
    out = stacked_lstm2(
        params, jnp.swapaxes(jnp.asarray(x), 1, 2), tile_n=64, sub_tiles=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_pallas_sub_tiles_indivisible_falls_back(rng):
    """A sub_tiles that does not divide the row tile must fall back to 1
    instead of silently skipping the remainder rows (r5 review finding:
    the forward had no guard, leaving uninitialized output rows)."""
    params = lstm_init(jax.random.PRNGKey(3), 34, 64, 2)
    x = (rng.standard_normal((64, 9, 34)) * 0.5).astype(np.float32)
    ref, _ = lstm_apply(params, jnp.asarray(x))
    out = stacked_lstm2(
        params, jnp.swapaxes(jnp.asarray(x), 1, 2), tile_n=64, sub_tiles=3,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=1e-4)


def test_pallas_steps_per_block(rng):
    params = lstm_init(jax.random.PRNGKey(1), 16, 32, 2)
    x = (rng.standard_normal((40, 11, 16)) * 0.5).astype(np.float32)  # 11 % 4 != 0
    ref, _ = lstm_apply(params, jnp.asarray(x))
    out = stacked_lstm2(
        params, jnp.swapaxes(jnp.asarray(x), 1, 2), tile_n=40, steps_per_block=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_pallas_quantized_kernel_snr(rng):
    """int8-recurrent serving kernel (stacked_lstm2_quantized): output SNR vs
    the fp32 scan path stays high — h is bounded (-1,1) so the fixed 127
    scale plus per-column weight scales lose ~7 effective bits, comparable
    to bf16 (measured 41.6 dB at the real model shapes on TPU)."""
    from fullsubnet_plus_tpu.nn.init import linear_init
    from fullsubnet_plus_tpu.ops.lstm_pallas import stacked_lstm2_quantized

    params = lstm_init(jax.random.PRNGKey(11), 34, 64, 2)
    fc = linear_init(jax.random.PRNGKey(12), 64, 2)
    x = jnp.asarray((rng.standard_normal((64, 21, 34)) * 0.5).astype(np.float32))
    hid, _ = lstm_apply(params, x)
    ref = np.asarray(hid @ fc["weight"] + fc["bias"])
    out = np.asarray(stacked_lstm2_quantized(params, jnp.swapaxes(x, 1, 2), fc, 64, True))
    assert out.shape == ref.shape and np.isfinite(out).all()
    snr = 10 * np.log10((ref**2).sum() / (((ref - out) ** 2).sum() + 1e-20))
    assert snr > 30.0, f"quantized kernel SNR {snr:.1f} dB"


def test_pallas_quantized_build_time_prep_matches(rng):
    """Build-time quantization (prepare_quantized_lstm, r5): attaching the
    numpy-precomputed int8 weights/scales as params["int8_prepared"] must
    be the same quantization to within one quantum (XLA rewrites the
    in-graph w/scale division as a reciprocal multiply, so a few
    near-half-way elements round one int apart from numpy's exact
    division) and produce outputs at the same quantized-kernel accuracy."""
    from fullsubnet_plus_tpu.nn.init import linear_init
    from fullsubnet_plus_tpu.ops.lstm_pallas import (
        _quantize_per_column,
        prepare_quantized_lstm,
        stacked_lstm2_quantized,
    )

    params = lstm_init(jax.random.PRNGKey(40), 34, 64, 2)
    fc = linear_init(jax.random.PRNGKey(41), 64, 2)
    x = jnp.asarray((rng.standard_normal((48, 11, 34)) * 0.5).astype(np.float32))
    xc = jnp.swapaxes(x, 1, 2)
    per_call = np.asarray(stacked_lstm2_quantized(params, xc, fc, 48, True))

    prep = prepare_quantized_lstm(params)
    u1q_graph, s1_graph = _quantize_per_column(params["layers"][0]["w_hh"])
    np.testing.assert_allclose(np.asarray(s1_graph) / 127.0, prep["s1"],
                               rtol=1e-6)
    assert np.abs(prep["u1q"].astype(np.int32)
                  - np.asarray(u1q_graph, np.int32)).max() <= 1

    prepped = dict(params)
    prepped["int8_prepared"] = {
        k: jnp.asarray(v) for k, v in prep.items()
    }
    build_time = np.asarray(stacked_lstm2_quantized(prepped, xc, fc, 48, True))
    # both are valid int8 quantizations; outputs agree at the kernel's own
    # quantization-noise scale
    np.testing.assert_allclose(per_call, build_time, atol=2e-3, rtol=2e-3)

    # the Enhancer attaches it for every 2-layer LSTM at int8 build
    from fullsubnet_plus_tpu.enhance import _attach_int8_prepared

    tree = {"sb_model": {"seq": params, "fc_output_layer": fc},
            "other": {"w": jnp.zeros((3, 3))}}
    out = _attach_int8_prepared(tree)
    assert "int8_prepared" in out["sb_model"]["seq"]
    assert out["sb_model"]["seq"]["int8_prepared"]["u1q"].dtype == jnp.int8
    assert "int8_prepared" not in tree["sb_model"]["seq"]  # original untouched


def test_pallas_quantized_sharded_mesh_matches(rng):
    """int8 serving kernel under shard_map on the virtual 8-device mesh:
    each shard sweeps its own fold rows with the SAME replicated quantized
    weights, so the output must match the unsharded kernel (the sharded
    serving config the multi-chip dryrun certifies, int8 flavor)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fullsubnet_plus_tpu.nn.init import linear_init
    from fullsubnet_plus_tpu.ops.lstm_pallas import (
        stacked_lstm2_quantized,
        stacked_lstm2_quantized_sharded,
    )
    from fullsubnet_plus_tpu.parallel import make_mesh

    n, t, d, h, o = 32, 7, 10, 16, 2
    params = lstm_init(jax.random.PRNGKey(15), d, h, 2)
    fc = linear_init(jax.random.PRNGKey(16), h, o)
    x = jnp.asarray((rng.standard_normal((n, t, d)) * 0.5).astype(np.float32))
    xc = jnp.swapaxes(x, 1, 2)
    ref = stacked_lstm2_quantized(params, xc, fc, 8, True)

    mesh = make_mesh(data=4, freq=2)
    with jax.set_mesh(mesh):
        xs = jax.device_put(
            xc, NamedSharding(mesh, P(("data", "freq"), None, None))
        )
        out = jax.jit(
            lambda p, xx, f: stacked_lstm2_quantized_sharded(
                p, xx, f, ("data", "freq"), 8, True
            )
        )(params, xs, fc)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)


def test_pallas_quantized_sharded_fallback(rng):
    """Without an ambient mesh the sharded wrapper must fall through to the
    plain quantized kernel bit-identically."""
    from fullsubnet_plus_tpu.nn.init import linear_init
    from fullsubnet_plus_tpu.ops.lstm_pallas import (
        stacked_lstm2_quantized,
        stacked_lstm2_quantized_sharded,
    )

    params = lstm_init(jax.random.PRNGKey(13), 12, 32, 2)
    fc = linear_init(jax.random.PRNGKey(14), 32, 2)
    x = jnp.asarray((rng.standard_normal((24, 7, 12)) * 0.5).astype(np.float32))
    xc = jnp.swapaxes(x, 1, 2)
    a = stacked_lstm2_quantized(params, xc, fc, 32, True)
    b = stacked_lstm2_quantized_sharded(params, xc, fc, ("data",), 32, True)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=0, rtol=0)
