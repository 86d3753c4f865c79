"""Multi-channel DSP: mc_stft, beamforming einsums, directional features.

Equivalents of the reference's multi-channel surface (vestigial for the
shipped single-channel recipes, but part of the framework):
  * mc_stft — audio_zen/acoustics/feature.py:68-91
  * beamforming ops — audio_zen/acoustics/beamforming.py:5-39 (expressed on
    jnp complex arrays instead of torch_complex)
  * directional features (LPS + cos/sin IPD) — feature.py:437-631's
    DirectionalFeatureComputer, built on our matmul STFT instead of the
    legacy torch.rfft conv kernel.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from fullsubnet_plus_tpu.dsp.stft import stft


def mc_stft(y_s: jnp.ndarray, n_fft: int, hop_length: int, win_length: int) -> jnp.ndarray:
    """[B, M, L] multi-channel waveforms -> [B, M, F, T] complex STFTs."""
    assert y_s.ndim == 3
    batch, channels, samples = y_s.shape
    spec = stft(y_s.reshape(batch * channels, samples), n_fft, hop_length, win_length)
    return spec.reshape(batch, channels, spec.shape[-2], spec.shape[-1])


# ---------------------------------------------------------------------------
# Beamforming (complex einsums)
# ---------------------------------------------------------------------------

def apply_crf_filter(crm_filter: jnp.ndarray, mix: jnp.ndarray) -> jnp.ndarray:
    """complex Ratio Filter: [B,F,T,D] (conj) x [B,C,F,D,T] -> [B,C,F,T]."""
    return jnp.einsum("bftd,bcfdt->bcft", jnp.conj(crm_filter), mix)


def get_power_spectral_density_matrix(spec: jnp.ndarray) -> jnp.ndarray:
    """[..., C, T] -> [..., T, C, C] cross-channel PSD outer products."""
    return jnp.einsum("...ct,...et->...tce", spec, jnp.conj(spec))


def apply_beamforming_vector(bf_vector: jnp.ndarray, mix: jnp.ndarray) -> jnp.ndarray:
    """[B,F,T,C] (conj) x [B,F,C,T] -> [B,F,T]."""
    return jnp.einsum("bftc,bfct->bft", jnp.conj(bf_vector), mix)


# ---------------------------------------------------------------------------
# Directional features
# ---------------------------------------------------------------------------

def channel_wise_layer_norm(x: jnp.ndarray, weight=None, bias=None, eps=1e-5):
    """LayerNorm over the channel dim of [B, N, K] (feature.py:415-435)."""
    mu = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.var(x, axis=1, keepdims=True)
    out = (x - mu) / jnp.sqrt(var + eps)
    if weight is not None:
        out = out * weight[None, :, None] + bias[None, :, None]
    return out


@dataclasses.dataclass(frozen=True)
class DirectionalFeatureConfig:
    n_fft: int = 512
    win_length: int = 512
    hop_length: int = 256
    input_features: tuple = ("LPS", "IPD")
    mic_pairs: tuple = ((0, 4), (1, 5), (2, 6), (3, 7))
    lps_channel: int = 4
    use_cos_ipd: bool = True
    use_sin_ipd: bool = False
    eps: float = 1e-8

    @property
    def num_freqs(self):
        return self.n_fft // 2 + 1

    @property
    def directional_feature_dim(self):
        dim = 0
        if "LPS" in self.input_features:
            dim += self.num_freqs
        if "IPD" in self.input_features:
            dim += self.num_freqs * len(self.mic_pairs)
            if self.use_sin_ipd:
                dim += self.num_freqs * len(self.mic_pairs)
        return dim


def compute_ipd(phase: jnp.ndarray, mic_pairs) -> tuple:
    """phase [B, M, F, K] -> (cos_ipd, sin_ipd), each [B, P, F, K]."""
    left = np.asarray([p[0] for p in mic_pairs])
    right = np.asarray([p[1] for p in mic_pairs])
    diff = phase[:, left] - phase[:, right]
    return jnp.cos(diff), jnp.sin(diff)


def directional_features(y: jnp.ndarray, config: DirectionalFeatureConfig):
    """[B, M, L] mixture -> (features [B, D, K], mag, real, imag per channel).

    Mirrors DirectionalFeatureComputer.forward (feature.py:489-560): LPS of
    the configured channel (channel-wise layer norm without learned affine)
    concatenated with cos (and optionally sin) IPD per mic pair, flattened
    over frequency.
    """
    batch, channels, _ = y.shape
    spec = mc_stft(y, config.n_fft, config.hop_length, config.win_length)
    magnitude = jnp.abs(spec)
    phase = jnp.angle(spec)
    real, imag = spec.real, spec.imag
    frames = spec.shape[-1]

    feats = []
    if "LPS" in config.input_features:
        lps = jnp.log(magnitude[:, config.lps_channel] ** 2 + config.eps)  # [B, F, K]
        feats.append(channel_wise_layer_norm(lps))
    if "IPD" in config.input_features:
        cos_ipd, sin_ipd = compute_ipd(phase, config.mic_pairs)
        feats.append(cos_ipd.reshape(batch, -1, frames))
        if config.use_sin_ipd:
            feats.append(sin_ipd.reshape(batch, -1, frames))
    features = jnp.concatenate(feats, axis=1) if feats else jnp.zeros((batch, 0, frames))
    return features, magnitude, real, imag
