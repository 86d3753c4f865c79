"""Spectral normalization zoo.

Functional equivalents of the reference BaseModel's norm methods
(audio_zen/model/base_model.py:90-330). The offline variants are simple
reductions; the cumulative/streaming variants are cumsum- or scan-based so
they compile to single fused XLA loops instead of per-frame Python loops.

All functions take [B, C, F, T] (4-D) or [B, F, T] (3-D) and normalize over
every non-batch, non-time dim as the reference does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fullsubnet_plus_tpu.constants import EPSILON


def time_mask(num_frames: int, valid, dtype=jnp.float32) -> jnp.ndarray:
    """[B, num_frames] 1/0 mask of each row's first valid[b] frames — THE
    mask primitive for length-masked batched serving (every consumer
    reshapes it onto its own broadcast layout)."""
    return (jnp.arange(num_frames)[None, :] < valid[:, None]).astype(dtype)


def _time_mask(x: jnp.ndarray, valid):
    """[B]-valid-frame mask broadcast to x's trailing time axis, or None."""
    if valid is None:
        return None
    return time_mask(x.shape[-1], valid, x.dtype).reshape(
        x.shape[0], *([1] * (x.ndim - 2)), x.shape[-1]
    )


def offline_laplace_norm(x: jnp.ndarray, valid=None) -> jnp.ndarray:
    """x / (utterance mean + 1e-5), mean over all non-batch dims.

    Reference: base_model.py:210-225 (the shipped FullSubNet+ norm).
    `valid` ([B] int frame counts) restricts the statistics to the first
    `valid[b]` frames of the time axis — used by batched serving so bucket
    padding cannot perturb a shorter utterance's normalization (the padded
    region is also zeroed so downstream convs see true zeros).
    """
    mask = _time_mask(x, valid)
    if mask is None:
        axes = tuple(range(1, x.ndim))
        mu = jnp.mean(x, axis=axes, keepdims=True)
        return x / (mu + 1e-5)
    axes = tuple(range(1, x.ndim))
    n_inner = 1
    for d in x.shape[1:-1]:
        n_inner *= d
    count = n_inner * valid.astype(x.dtype)
    count = count.reshape(x.shape[0], *([1] * (x.ndim - 1)))
    mu = jnp.sum(x * mask, axis=axes, keepdims=True) / count
    return x * mask / (mu + 1e-5)


def offline_gaussian_norm(x: jnp.ndarray, valid=None) -> jnp.ndarray:
    """(x - mean) / (std + 1e-5); std uses Bessel's correction like torch.std.

    Reference: base_model.py:260-275. `valid` as in offline_laplace_norm;
    note the masked variant's output is zeroed (not -mu/std) in the padded
    region so downstream ops see true zeros.
    """
    mask = _time_mask(x, valid)
    axes = tuple(range(1, x.ndim))
    if mask is None:
        mu = jnp.mean(x, axis=axes, keepdims=True)
        std = jnp.std(x, axis=axes, keepdims=True, ddof=1)
        return (x - mu) / (std + 1e-5)
    n_inner = 1
    for d in x.shape[1:-1]:
        n_inner *= d
    count = (n_inner * valid.astype(x.dtype)).reshape(
        x.shape[0], *([1] * (x.ndim - 1))
    )
    mu = jnp.sum(x * mask, axis=axes, keepdims=True) / count
    var = jnp.sum(jnp.square((x - mu) * mask), axis=axes, keepdims=True) / (
        count - 1.0
    )
    return (x - mu) * mask / (jnp.sqrt(var) + 1e-5)


def _flatten_bc(x: jnp.ndarray):
    """[B, C, F, T] -> ([B*C, F, T], unflatten); [B, F, T] passes through."""
    if x.ndim == 4:
        b, c, f, t = x.shape
        return x.reshape(b * c, f, t), lambda y: y.reshape(b, c, f, t)
    return x, lambda y: y


def cumulative_laplace_norm(x: jnp.ndarray) -> jnp.ndarray:
    """x / cumulative per-frame mean (streaming-causal Laplace norm).

    Reference: base_model.py:227-258.
    """
    flat, unflatten = _flatten_bc(x)
    _, num_freqs, num_frames = flat.shape
    step_sum = jnp.sum(flat, axis=1)  # [B*C, T]
    cumulative_sum = jnp.cumsum(step_sum, axis=-1)
    entry_count = jnp.arange(
        num_freqs, num_freqs * num_frames + 1, num_freqs, dtype=flat.dtype
    )
    cumulative_mean = cumulative_sum / entry_count[None, :]
    normed = flat / (cumulative_mean[:, None, :] + EPSILON)
    return unflatten(normed)


def cumulative_layer_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Streaming zero-norm: (x - cum_mean) / cum_std.

    Reference: base_model.py:277-316.
    """
    flat, unflatten = _flatten_bc(x)
    _, num_freqs, num_frames = flat.shape
    step_sum = jnp.sum(flat, axis=1)
    step_pow_sum = jnp.sum(jnp.square(flat), axis=1)
    cumulative_sum = jnp.cumsum(step_sum, axis=-1)
    cumulative_pow_sum = jnp.cumsum(step_pow_sum, axis=-1)
    entry_count = jnp.arange(
        num_freqs, num_freqs * num_frames + 1, num_freqs, dtype=flat.dtype
    )[None, :]
    cumulative_mean = cumulative_sum / entry_count
    cumulative_var = (
        cumulative_pow_sum - 2.0 * cumulative_mean * cumulative_sum
    ) / entry_count + jnp.square(cumulative_mean)
    cumulative_std = jnp.sqrt(cumulative_var + EPSILON)
    normed = (flat - cumulative_mean[:, None, :]) / cumulative_std[:, None, :]
    return unflatten(normed)


def forgetting_norm(x: jnp.ndarray, sample_length_in_training: int = 192) -> jnp.ndarray:
    """Exponential-forgetting mean norm, re-expressed as a lax.scan.

    Reproduces the reference Python loop (base_model.py:128-162) including its
    idx=0 quirk where alp = min(-1, alpha) = -1. Input [B, F, T].
    """
    assert x.ndim == 3
    eps = 1e-10
    alpha = (sample_length_in_training - 1) / (sample_length_in_training + 1)
    frame_mean = jnp.mean(x, axis=1)  # [B, T]
    num_frames = x.shape[-1]
    idx = jnp.arange(num_frames, dtype=x.dtype)
    alp_t = jnp.where(
        idx < sample_length_in_training,
        jnp.minimum((idx - 1.0) / (idx + 1.0), alpha),
        alpha,
    )  # [T]

    def step(mu, inputs):
        alp, mean_t = inputs
        mu = alp * mu + (1.0 - alp) * mean_t
        return mu, mu

    _, mu_seq = jax.lax.scan(
        step, jnp.zeros(x.shape[0], x.dtype), (alp_t, frame_mean.T)
    )
    mu = mu_seq.T[:, None, :]  # [B, 1, T]
    return x / (mu + eps)


def hybrid_norm(x: jnp.ndarray, sample_length_in_training: int = 192) -> jnp.ndarray:
    """Forgetting norm for the first `sample_length` frames, cumulative after.

    Reference: base_model.py:165-208. Input [B, F, T].
    """
    assert x.ndim == 3
    eps = 1e-10
    _, num_freqs, num_frames = x.shape
    step_sum = jnp.sum(x, axis=1)
    cumulative_sum = jnp.cumsum(step_sum, axis=-1)
    entry_count = jnp.arange(
        num_freqs, num_freqs * num_frames + 1, num_freqs, dtype=x.dtype
    )[None, :]
    cum_mean = cumulative_sum / entry_count  # [B, T]

    alpha = (sample_length_in_training - 1) / (sample_length_in_training + 1)
    frame_mean = jnp.mean(x, axis=1)
    idx = jnp.arange(num_frames, dtype=x.dtype)
    alp_t = jnp.minimum((idx - 1.0) / (idx + 1.0), alpha)

    def step(mu, inputs):
        alp, mean_t = inputs
        mu = alp * mu + (1.0 - alp) * mean_t
        return mu, mu

    _, mu_seq = jax.lax.scan(
        step, jnp.zeros(x.shape[0], x.dtype), (alp_t, frame_mean.T)
    )
    initial_mu = mu_seq.T  # [B, T]
    in_prefix = jnp.arange(num_frames) < sample_length_in_training
    mu = jnp.where(in_prefix[None, :], initial_mu, cum_mean)
    return x / (mu[:, None, :] + eps)


def sband_forgetting_norm(x: jnp.ndarray, train_sample_length: int = 192) -> jnp.ndarray:
    """Forgetting norm whose steady-state mean tracks only the middle
    frequency bin (reference base_model.py:91-125). Input [B, F, T]."""
    assert x.ndim == 3
    eps = 1e-10
    _, n_freqs, num_frames = x.shape
    alpha = (train_sample_length - 1) / (train_sample_length + 1)
    frame_mean = jnp.mean(x, axis=1)  # [B, T]
    mid_bin = x[:, n_freqs // 2 - 1, :]  # [B, T]
    idx = jnp.arange(num_frames, dtype=x.dtype)
    in_prefix = idx < train_sample_length
    alp_t = jnp.where(in_prefix, jnp.minimum((idx - 1.0) / (idx + 1.0), alpha), alpha)
    drive = jnp.where(in_prefix[None, :], frame_mean, mid_bin)  # [B, T]

    def step(mu, inputs):
        alp, d = inputs
        mu = alp * mu + (1.0 - alp) * d
        return mu, mu

    _, mu_seq = jax.lax.scan(step, jnp.zeros(x.shape[0], x.dtype), (alp_t, drive.T))
    return x / (mu_seq.T[:, None, :] + eps)


_NORMS = {
    "sband_forgetting_norm": sband_forgetting_norm,
    "offline_laplace_norm": offline_laplace_norm,
    "cumulative_laplace_norm": cumulative_laplace_norm,
    "offline_gaussian_norm": offline_gaussian_norm,
    "cumulative_layer_norm": cumulative_layer_norm,
    "forgetting_norm": forgetting_norm,
    "hybrid_norm": hybrid_norm,
}


def get_norm(norm_type: str):
    """Norm dispatch, mirroring BaseModel.norm_wrapper (base_model.py:318-330).

    Every returned fn accepts (x, valid=None). The offline norms implement
    masked statistics; the causal variants (cumulative/forgetting/hybrid)
    are inherently unaffected by trailing padding, so they zero the padded
    region and keep their stats unchanged.
    """
    if norm_type not in _NORMS:
        raise NotImplementedError(
            f"Unknown norm type {norm_type!r}; choose from {sorted(_NORMS)}"
        )
    fn = _NORMS[norm_type]
    if norm_type in ("offline_laplace_norm", "offline_gaussian_norm"):
        return fn

    def causal_norm(x, valid=None):
        y = fn(x)
        mask = _time_mask(x, valid)
        return y if mask is None else y * mask

    return causal_norm
