"""STFT/iSTFT parity vs torch.stft / torch.istft (the reference's DSP core).

The reference calls torch.stft with center=True, reflect pad, periodic Hann,
onesided (audio_zen/acoustics/feature.py:10-65); these tests lock our
matmul-based implementation to those exact semantics.
"""

import numpy as np
import pytest
import torch

from fullsubnet_plus_tpu.dsp import stft as jstft_mod
from fullsubnet_plus_tpu.dsp import istft as jistft
from fullsubnet_plus_tpu.dsp import stft as jstft
from fullsubnet_plus_tpu.dsp.stft import hann_window, stft_split


def torch_stft(y, n_fft=512, hop=256, win=512):
    return torch.stft(
        torch.from_numpy(y),
        n_fft,
        hop,
        win,
        window=torch.hann_window(n_fft),
        return_complex=True,
    )


@pytest.mark.parametrize("length", [49152, 16000, 16001, 7777])
def test_stft_matches_torch(rng, length):
    y = rng.standard_normal((2, length)).astype(np.float32)
    ours = np.asarray(jstft(y))
    ref = torch_stft(y).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours.real, ref.real, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(ours.imag, ref.imag, atol=2e-3, rtol=1e-4)


def test_stft_split_consistent(rng):
    y = rng.standard_normal((1, 16000)).astype(np.float32)
    mag, real, imag = stft_split(y)
    spec = np.asarray(jstft(y))
    np.testing.assert_allclose(np.asarray(real), spec.real, atol=1e-5)
    np.testing.assert_allclose(np.asarray(imag), spec.imag, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(mag), np.abs(spec), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("length", [49152, 16000, 16001])
def test_istft_matches_torch(rng, length):
    y = rng.standard_normal((2, length)).astype(np.float32)
    spec = torch_stft(y)
    ref = torch.istft(
        spec, 512, 256, 512, window=torch.hann_window(512), length=length
    ).numpy()
    ours = np.asarray(jistft(spec.numpy(), length=length))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-4)


def test_roundtrip(rng):
    y = rng.standard_normal((1, 32000)).astype(np.float32)
    spec = jstft(y)
    back = np.asarray(jistft(spec, length=32000))
    np.testing.assert_allclose(back[0], y[0], atol=1e-3, rtol=1e-3)


def test_istft_stacked_realimag_input(rng):
    y = rng.standard_normal((1, 16000)).astype(np.float32)
    spec = np.asarray(jstft(y))
    stacked = np.stack([spec.real, spec.imag], axis=-1)
    a = np.asarray(jistft(spec, length=16000))
    b = np.asarray(jistft(stacked, length=16000))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_istft_mag_phase_input(rng):
    y = rng.standard_normal((1, 16000)).astype(np.float32)
    spec = np.asarray(jstft(y))
    mag, phase = np.abs(spec), np.angle(spec)
    a = np.asarray(jistft(spec, length=16000))
    b = np.asarray(jistft((mag, phase), length=16000, use_mag_phase=True))
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_hann_window_periodic():
    np.testing.assert_allclose(
        hann_window(512), torch.hann_window(512).numpy(), atol=1e-6
    )


def test_num_frames():
    assert jstft_mod  # imported
    from fullsubnet_plus_tpu.dsp.stft import num_frames

    # 3.072 s at 16 kHz -> 193 frames (SURVEY.md §2.6)
    assert num_frames(49152) == 193
