"""Magnitude-spectral normalization (reference audio_zen/model/module/
feature_norm.py:5-82): cumulative_norm (streaming zero-norm) and the
parameter-free CumulativeMagSpectralNorm with offline/cumulative and
mid-frequency-μ variants. Not used by the shipped models but part of the
module surface.
"""

from __future__ import annotations

import jax.numpy as jnp


def cumulative_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Streaming zero-norm over [B, C, F, T] (feature_norm.py:5-36).

    Same math as dsp.norms.cumulative_layer_norm but with the reference's
    eps placement (inside the sqrt, eps=1e-10).
    """
    eps = 1e-10
    batch, channels, freqs, frames = x.shape
    flat = x.reshape(batch * channels, freqs, frames)
    step_sum = jnp.sum(flat, axis=1)
    step_pow_sum = jnp.sum(jnp.square(flat), axis=1)
    cumulative_sum = jnp.cumsum(step_sum, axis=-1)
    cumulative_pow_sum = jnp.cumsum(step_pow_sum, axis=-1)
    entry_count = jnp.arange(freqs, freqs * frames + 1, freqs, dtype=x.dtype)[None, :]
    cum_mean = cumulative_sum / entry_count
    cum_var = (cumulative_pow_sum - 2 * cum_mean * cumulative_sum) / entry_count + jnp.square(cum_mean)
    cum_std = jnp.sqrt(cum_var + eps)
    normed = (flat - cum_mean[:, None, :]) / cum_std[:, None, :]
    return normed.reshape(batch, channels, freqs, frames)


def cumulative_mag_spectral_norm(
    x: jnp.ndarray,
    *,
    cumulative: bool = False,
    use_mid_freq_mu: bool = False,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """CumulativeMagSpectralNorm.forward (feature_norm.py:39-82).

    x: [B, C, F, T]; divides by a μ computed either from the per-frame mean
    (or the mid-frequency bin), cumulatively over time or offline.
    """
    assert x.ndim == 4, "cumulative_mag_spectral_norm only supports 4D input."
    batch, channels, freqs, frames = x.shape
    flat = x.reshape(batch * channels, freqs, frames)
    if use_mid_freq_mu:
        step_sum = flat[:, int(freqs // 2 - 1), :]  # [B*C, T]
    else:
        step_sum = jnp.mean(flat, axis=1)
    if cumulative:
        cumulative_sum = jnp.cumsum(step_sum, axis=-1)
        entry_count = jnp.arange(1, frames + 1, dtype=x.dtype)[None, :]
        mu = (cumulative_sum / entry_count)[:, None, :]  # [B*C, 1, T]
    else:
        mu = jnp.mean(step_sum, axis=-1)[:, None, None]  # [B*C, 1, 1]
    normed = flat / (mu + eps)
    return normed.reshape(batch, channels, freqs, frames)
