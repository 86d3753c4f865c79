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
