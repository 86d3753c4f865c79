"""Complex Ideal Ratio Mask (cIRM) construction, compression, application.

Same math as the reference (audio_zen/acoustics/mask.py:10-69); expressed on
real/imag pairs so everything stays in real dtypes under jit/bf16.
"""

from __future__ import annotations

import jax.numpy as jnp

from fullsubnet_plus_tpu.constants import EPSILON


def build_ideal_ratio_mask(noisy_mag: jnp.ndarray, clean_mag: jnp.ndarray) -> jnp.ndarray:
    """IRM = |clean| / (|noisy| + eps), compressed. [B, F, T] -> [B, F, T, 1].

    Reference: audio_zen/acoustics/mask.py:10-24.
    """
    ratio_mask = clean_mag / (noisy_mag + EPSILON)
    return compress_cirm(ratio_mask[..., None], k=10.0, c=0.1)


def build_complex_ideal_ratio_mask(
    noisy_real: jnp.ndarray,
    noisy_imag: jnp.ndarray,
    clean_real: jnp.ndarray,
    clean_imag: jnp.ndarray,
) -> jnp.ndarray:
    """Compressed cIRM = compress(clean / noisy) in C. [B, F, T] -> [B, F, T, 2].

    Reference: audio_zen/acoustics/mask.py:27-44.
    """
    denominator = noisy_real**2 + noisy_imag**2 + EPSILON
    mask_real = (noisy_real * clean_real + noisy_imag * clean_imag) / denominator
    mask_imag = (noisy_real * clean_imag - noisy_imag * clean_real) / denominator
    cirm = jnp.stack((mask_real, mask_imag), axis=-1)
    return compress_cirm(cirm, k=10.0, c=0.1)


def compress_cirm(mask: jnp.ndarray, k: float = 10.0, c: float = 0.1) -> jnp.ndarray:
    """Compress (-inf, inf) -> (-k, k) via the scaled tanh-like map.

    Values <= -100 are clamped first, exactly as the reference
    (audio_zen/acoustics/mask.py:47-57).
    """
    mask = jnp.where(mask <= -100.0, -100.0, mask)
    return k * (1.0 - jnp.exp(-c * mask)) / (1.0 + jnp.exp(-c * mask))


def decompress_cirm(mask: jnp.ndarray, k: float = 10.0, limit: float = 9.9) -> jnp.ndarray:
    """Inverse of :func:`compress_cirm` with a ±limit clamp.

    Reference: audio_zen/acoustics/mask.py:60-63.
    """
    mask = jnp.clip(mask, -limit, limit)
    return -k * jnp.log((k - mask) / (k + mask))


def complex_mul(noisy_r, noisy_i, mask_r, mask_i):
    """(noisy_r + i noisy_i) * (mask_r + i mask_i) -> (real, imag).

    Reference: audio_zen/acoustics/mask.py:66-69.
    """
    r = noisy_r * mask_r - noisy_i * mask_i
    i = noisy_r * mask_i + noisy_i * mask_r
    return r, i
