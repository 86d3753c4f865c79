"""Parity tests for cIRM ops, norms, freq_unfold, and drop_band vs torch.

Each test reconstructs the reference computation directly with torch ops
(same math as audio_zen/acoustics/mask.py, base_model.py, feature.py) and
compares our jnp implementations against it.
"""

import numpy as np
import torch
import torch.nn.functional as F

from fullsubnet_plus_tpu.constants import EPSILON
from fullsubnet_plus_tpu.dsp import (
    build_complex_ideal_ratio_mask,
    build_ideal_ratio_mask,
    compress_cirm,
    decompress_cirm,
    complex_mul,
    offline_laplace_norm,
    cumulative_laplace_norm,
    offline_gaussian_norm,
    cumulative_layer_norm,
    forgetting_norm,
    freq_unfold,
    drop_band,
)


# ---------- cIRM ----------

def _torch_compress(mask, K=10, C=0.1):
    mask = -100 * (mask <= -100).float() + mask * (mask > -100).float()
    return K * (1 - torch.exp(-C * mask)) / (1 + torch.exp(-C * mask))


def test_cirm_build_compress(rng):
    noisy = rng.standard_normal((2, 257, 50)) + 1j * rng.standard_normal((2, 257, 50))
    clean = rng.standard_normal((2, 257, 50)) + 1j * rng.standard_normal((2, 257, 50))
    noisy, clean = noisy.astype(np.complex64), clean.astype(np.complex64)

    tn, tc = torch.from_numpy(noisy), torch.from_numpy(clean)
    denom = tn.real.square() + tn.imag.square() + EPSILON
    mr = (tn.real * tc.real + tn.imag * tc.imag) / denom
    mi = (tn.real * tc.imag - tn.imag * tc.real) / denom
    ref = _torch_compress(torch.stack((mr, mi), dim=-1)).numpy()

    ours = np.asarray(
        build_complex_ideal_ratio_mask(
            noisy.real, noisy.imag, clean.real, clean.imag
        )
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_cirm_compress_decompress_inverse(rng):
    m = (rng.standard_normal((4, 257, 30, 2)) * 3).astype(np.float32)
    compressed = compress_cirm(m)
    restored = np.asarray(decompress_cirm(compressed))
    np.testing.assert_allclose(restored, m, atol=1e-3, rtol=1e-3)


def test_decompress_clamps(rng):
    m = np.array([[-12.0, -9.95, 0.0, 9.95, 12.0]], dtype=np.float32)
    t = torch.from_numpy(m)
    ref = (9.9 * (t >= 9.9).float() - 9.9 * (t <= -9.9).float() + t * (t.abs() < 9.9).float())
    ref = (-10 * torch.log((10 - ref) / (10 + ref))).numpy()
    np.testing.assert_allclose(np.asarray(decompress_cirm(m)), ref, atol=1e-5)


def test_irm(rng):
    noisy = np.abs(rng.standard_normal((2, 257, 20))).astype(np.float32)
    clean = np.abs(rng.standard_normal((2, 257, 20))).astype(np.float32)
    ref = _torch_compress(
        (torch.from_numpy(clean) / (torch.from_numpy(noisy) + EPSILON))[..., None]
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(build_ideal_ratio_mask(noisy, clean)), ref, atol=1e-5, rtol=1e-5
    )


def test_complex_mul(rng):
    a = rng.standard_normal((4, 5)).astype(np.float32)
    b = rng.standard_normal((4, 5)).astype(np.float32)
    c = rng.standard_normal((4, 5)).astype(np.float32)
    d = rng.standard_normal((4, 5)).astype(np.float32)
    r, i = complex_mul(a, b, c, d)
    ref = (a + 1j * b) * (c + 1j * d)
    np.testing.assert_allclose(np.asarray(r), ref.real, atol=1e-5)
    np.testing.assert_allclose(np.asarray(i), ref.imag, atol=1e-5)


# ---------- norms ----------

def test_offline_laplace_norm(rng):
    x = np.abs(rng.standard_normal((3, 1, 257, 40))).astype(np.float32)
    t = torch.from_numpy(x)
    ref = (t / (t.mean(dim=(1, 2, 3), keepdim=True) + 1e-5)).numpy()
    np.testing.assert_allclose(np.asarray(offline_laplace_norm(x)), ref, atol=1e-6)


def test_offline_gaussian_norm(rng):
    x = rng.standard_normal((3, 1, 257, 40)).astype(np.float32)
    t = torch.from_numpy(x)
    mu = t.mean(dim=(1, 2, 3), keepdim=True)
    std = t.std(dim=(1, 2, 3), keepdim=True)  # unbiased, like the reference
    ref = ((t - mu) / (std + 1e-5)).numpy()
    np.testing.assert_allclose(
        np.asarray(offline_gaussian_norm(x)), ref, atol=1e-5, rtol=1e-5
    )


def _torch_cumulative_laplace(x):
    b, c, f_, t_ = x.shape
    x = x.reshape(b * c, f_, t_)
    step_sum = x.sum(dim=1)
    csum = torch.cumsum(step_sum, dim=-1)
    cnt = torch.arange(f_, f_ * t_ + 1, f_, dtype=x.dtype).reshape(1, t_)
    mean = (csum / cnt).reshape(b * c, 1, t_)
    return (x / (mean + EPSILON)).reshape(b, c, f_, t_)


def test_cumulative_laplace_norm(rng):
    x = np.abs(rng.standard_normal((2, 1, 257, 33))).astype(np.float32)
    ref = _torch_cumulative_laplace(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(
        np.asarray(cumulative_laplace_norm(x)), ref, atol=1e-5, rtol=1e-4
    )


def test_cumulative_layer_norm_runs(rng):
    x = rng.standard_normal((2, 1, 257, 33)).astype(np.float32)
    out = np.asarray(cumulative_layer_norm(x))
    assert out.shape == x.shape
    assert np.isfinite(out).all()


def test_forgetting_norm_matches_reference_loop(rng):
    x = np.abs(rng.standard_normal((2, 257, 40))).astype(np.float32)
    # re-create the reference loop (base_model.py:128-162)
    t = torch.from_numpy(x)
    sample_len = 20
    alpha = (sample_len - 1) / (sample_len + 1)
    mu = torch.zeros(2, 1)
    mu_list = []
    for idx in range(x.shape[-1]):
        if idx < sample_len:
            alp = min((idx - 1) / (idx + 1), alpha)
            mu = alp * mu + (1 - alp) * t[:, :, idx].mean(dim=1).reshape(2, 1)
        else:
            cur = t[:, :, idx].mean(dim=1).reshape(2, 1)
            mu = alpha * mu + (1 - alpha) * cur
        mu_list.append(mu)
    ref_mu = torch.stack(mu_list, dim=-1)
    ref = (t / (ref_mu + 1e-10)).numpy()
    ours = np.asarray(forgetting_norm(x, sample_len))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


# ---------- unfold / drop_band ----------

def _torch_unfold(x, num_neighbor):
    """BaseModel.unfold re-created with torch ops (base_model.py:15-47)."""
    b, c, f_, t_ = x.shape
    if num_neighbor < 1:
        return x.permute(0, 2, 1, 3).reshape(b, f_, c, 1, t_)
    out = x.reshape(b * c, 1, f_, t_)
    sub = num_neighbor * 2 + 1
    out = F.pad(out, [0, 0, num_neighbor, num_neighbor], mode="reflect")
    out = F.unfold(out, (sub, t_))
    out = out.reshape(b, c, sub, t_, f_)
    return out.permute(0, 4, 1, 2, 3).contiguous()


def test_freq_unfold_matches_torch(rng):
    x = rng.standard_normal((2, 1, 257, 10)).astype(np.float32)
    for n in (0, 1, 15):
        ref = _torch_unfold(torch.from_numpy(x), n).numpy()
        ours = np.asarray(freq_unfold(x, n))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_freq_unfold_pad_modes_match_torch(rng):
    """Configurable edge handling of BaseInferencer._unfold
    (base_inferencer.py:88 pads with the config's pad_mode): every torch
    F.pad mode the reference can name must match."""
    x = rng.standard_normal((2, 1, 33, 8)).astype(np.float32)
    for mode in ("reflect", "replicate", "circular", "constant"):
        for n in (1, 4):
            out = x.reshape(2, 1, 33, 8)
            t = torch.from_numpy(x).reshape(2 * 1, 1, 33, 8)
            t = F.pad(t, [0, 0, n, n], mode=mode)
            t = F.unfold(t, (n * 2 + 1, 8))
            t = t.reshape(2, 1, n * 2 + 1, 8, 33).permute(0, 4, 1, 2, 3)
            ours = np.asarray(freq_unfold(x, n, mode))
            np.testing.assert_allclose(ours, t.numpy(), atol=1e-6,
                                       err_msg=f"{mode} n={n}")


def _torch_drop_band(x, num_groups):
    b = x.shape[0]
    f_ = x.shape[2]
    if num_groups <= 1:
        return x
    if f_ % num_groups != 0:
        x = x[..., : f_ - (f_ % num_groups), :]
        f_ = x.shape[2]
    out = []
    for g in range(num_groups):
        s_idx = torch.arange(g, b, num_groups)
        f_idx = torch.arange(g, f_, num_groups)
        sel = torch.index_select(x, 0, s_idx)
        sel = torch.index_select(sel, 2, f_idx)
        out.append(sel)
    return torch.cat(out, dim=0)


def test_drop_band_matches_torch(rng):
    x = rng.standard_normal((6, 2, 257, 8)).astype(np.float32)
    for g in (1, 2, 3):
        ref = _torch_drop_band(torch.from_numpy(x), g).numpy()
        ours = np.asarray(drop_band(x, g))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_causal_norm_valid_passthrough():
    """get_norm's causal wrapper: trailing padding must not change the valid
    frames of a cumulative norm (causality), and the padded region is
    zeroed in the output."""
    import jax.numpy as jnp

    from fullsubnet_plus_tpu.dsp.norms import get_norm

    rng = np.random.default_rng(0)
    fn = get_norm("cumulative_laplace_norm")
    x = jnp.asarray(np.abs(rng.standard_normal((2, 5, 20))).astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 12)))
    valid = jnp.asarray([20, 20])
    exact = fn(x)
    masked = fn(xp, valid=valid)
    np.testing.assert_allclose(np.asarray(masked[..., :20]), np.asarray(exact),
                               rtol=1e-6, atol=1e-7)
    assert float(np.abs(np.asarray(masked[..., 20:])).max()) == 0.0


def test_masked_offline_norms_match_exact():
    """Masked offline laplace/gaussian stats over a padded batch equal the
    exact-length stats (counting only valid frames)."""
    import jax.numpy as jnp

    from fullsubnet_plus_tpu.dsp.norms import offline_laplace_norm, offline_gaussian_norm

    rng = np.random.default_rng(1)
    x = jnp.asarray(np.abs(rng.standard_normal((2, 3, 7, 15))).astype(np.float32))
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 9)))
    valid = jnp.asarray([15, 15])
    for fn in (offline_laplace_norm, offline_gaussian_norm):
        exact = fn(x)
        masked = fn(xp, valid=valid)
        np.testing.assert_allclose(np.asarray(masked[..., :15]), np.asarray(exact),
                                   rtol=1e-5, atol=1e-6)
        assert float(np.abs(np.asarray(masked[..., 15:])).max()) == 0.0
