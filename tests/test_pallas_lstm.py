"""Pallas fused-LSTM kernel parity vs the lax.scan path (interpret mode on
CPU; the same kernel compiles on TPU — verified in bench runs)."""

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
    out = stacked_lstm2(params, jnp.asarray(x), tile_n=tile, interpret=True)
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
    out = stacked_lstm2(params, jnp.asarray(x), fc, tile_n=64, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_pallas_small_fold_tile_shrink(rng):
    """N smaller than tile_n shrinks the tile instead of 8x-padding (the
    full-band LSTM of the FullSubNet baseline runs at N = batch)."""
    params = lstm_init(jax.random.PRNGKey(5), 20, 32, 2)
    x = (rng.standard_normal((6, 9, 20)) * 0.5).astype(np.float32)
    ref, _ = lstm_apply(params, jnp.asarray(x))
    out = stacked_lstm2(params, jnp.asarray(x), tile_n=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_pallas_sub_tiles(rng):
    params = lstm_init(jax.random.PRNGKey(2), 34, 64, 2)
    x = (rng.standard_normal((64, 13, 34)) * 0.5).astype(np.float32)
    ref, _ = lstm_apply(params, jnp.asarray(x))
    out = stacked_lstm2(
        params, jnp.asarray(x), tile_n=64, sub_tiles=2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)


def test_pallas_steps_per_block(rng):
    params = lstm_init(jax.random.PRNGKey(1), 16, 32, 2)
    x = (rng.standard_normal((40, 11, 16)) * 0.5).astype(np.float32)  # 11 % 4 != 0
    ref, _ = lstm_apply(params, jnp.asarray(x))
    out = stacked_lstm2(
        params, jnp.asarray(x), tile_n=40, steps_per_block=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4)
