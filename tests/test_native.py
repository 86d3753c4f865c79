"""Native mixkit library: builds via g++, matches the numpy reference path."""

import numpy as np
import pytest

from fullsubnet_plus_tpu.data import native
from fullsubnet_plus_tpu.data.mixing import snr_mix


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("g++ unavailable or native build failed")
    return True


def test_pcm16_decode(lib_available, rng):
    samples = (rng.integers(-32768, 32767, 1000)).astype(np.int16)
    out = native.pcm16_to_float(samples)
    np.testing.assert_allclose(out, samples.astype(np.float32) / 32768.0, atol=1e-7)
    stereo = (rng.integers(-32768, 32767, 2000)).astype(np.int16)
    out2 = native.pcm16_to_float(stereo, num_channels=2)
    ref = (stereo.astype(np.float32) / 32768.0).reshape(-1, 2).mean(axis=1)
    np.testing.assert_allclose(out2, ref, atol=1e-6)


def test_native_mix_matches_numpy(lib_available, rng):
    clean = (0.3 * np.sin(2 * np.pi * 300 * np.arange(32000) / 16000)).astype(np.float32)
    noise = (0.1 * rng.standard_normal(32000)).astype(np.float32)
    for snr in (-5, 0, 15):
        # identical RNG streams -> identical noisy_target draw in both paths
        n1, c1 = snr_mix(clean.copy(), noise.copy(), snr, -25, 10,
                         np.random.default_rng(3), use_native=True)
        n2, c2 = snr_mix(clean.copy(), noise.copy(), snr, -25, 10,
                         np.random.default_rng(3), use_native=False)
        np.testing.assert_allclose(n1, n2, atol=1e-5, rtol=1e-4)
        np.testing.assert_allclose(c1, c2, atol=1e-5, rtol=1e-4)


def test_native_rir_matches_fftconvolve(lib_available, rng):
    from scipy.signal import fftconvolve

    clean = rng.standard_normal(8000).astype(np.float32)
    rir = np.zeros(256, np.float32)
    rir[0], rir[40], rir[200] = 1.0, 0.5, 0.25
    out = native.rir_convolve(clean, rir)
    ref = fftconvolve(clean, rir)[:8000]
    np.testing.assert_allclose(out, ref, atol=1e-4)
