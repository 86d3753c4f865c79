"""Sub-band frequency unfold and drop_band frequency subsampling.

Both are static-index gathers on TPU — the index tables are computed at trace
time with numpy, so XLA sees constant gather indices and can fuse them.

Reference semantics:
  * freq_unfold: BaseModel.unfold (base_model.py:15-47) — reflect-pad the
    frequency axis by `num_neighbors`, then slide a (2n+1)-wide window over it.
  * drop_band: feature.py:254-285 — keep every `num_groups`-th frequency with
    a per-batch-shard rotating offset (batch and freq indices are coupled).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


@functools.lru_cache(maxsize=64)
def _unfold_indices(num_freqs: int, num_neighbors: int,
                    pad_mode: str = "reflect") -> np.ndarray:
    """[F, 2n+1] indices into the *unpadded* freq axis reproducing torch
    F.pad's edge semantics for the given mode. "constant" maps out-of-range
    positions to index `num_freqs` — the caller appends a zero row there
    (a gather cannot otherwise produce zeros)."""
    idx = np.arange(-num_neighbors, num_freqs + num_neighbors)
    if pad_mode == "reflect":  # no edge repeat
        idx = np.abs(idx)
        over = idx > num_freqs - 1
        idx[over] = 2 * (num_freqs - 1) - idx[over]
    elif pad_mode == "replicate":
        idx = np.clip(idx, 0, num_freqs - 1)
    elif pad_mode == "circular":
        idx = idx % num_freqs
    elif pad_mode == "constant":
        idx = np.where((idx < 0) | (idx > num_freqs - 1), num_freqs, idx)
    else:
        raise ValueError(f"unknown pad_mode {pad_mode!r}")
    window = num_neighbors * 2 + 1
    return np.stack([idx[f : f + window] for f in range(num_freqs)], axis=0)


def freq_unfold(x: jnp.ndarray, num_neighbors: int,
                pad_mode: str = "reflect") -> jnp.ndarray:
    """[B, C, F, T] -> [B, F, C, 2n+1, T] overlapping frequency sub-bands.

    With num_neighbors < 1 this is just a transpose/reshape, exactly like the
    reference fast path (base_model.py:30-32). `pad_mode` reproduces the
    configurable edge handling of BaseInferencer._unfold
    (base_inferencer.py:72-95, used by the sub_band_crm_mask mode).
    """
    assert x.ndim == 4, f"freq_unfold expects [B, C, F, T], got {x.shape}"
    batch, channels, num_freqs, frames = x.shape
    if num_neighbors < 1:
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(
            batch, num_freqs, channels, 1, frames
        )
    idx = jnp.asarray(_unfold_indices(num_freqs, num_neighbors, pad_mode))
    if pad_mode == "constant":  # zero row at index F for out-of-range taps
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))
    gathered = x[:, :, idx, :]  # [B, C, F, W, T]
    return jnp.transpose(gathered, (0, 2, 1, 3, 4))  # [B, F, C, W, T]


@functools.lru_cache(maxsize=64)
def _drop_band_indices(batch_size: int, num_freqs: int, num_groups: int):
    """(batch_idx [B], freq_idx [B, F//G]) reproducing the reference ordering.

    Output sample j of group g is input sample g + j*G, and it keeps
    frequencies g, g+G, g+2G, ... (feature.py:276-285).
    """
    kept = num_freqs - (num_freqs % num_groups)
    batch_idx, freq_idx = [], []
    for g in range(num_groups):
        samples = np.arange(g, batch_size, num_groups)
        freqs = np.arange(g, kept, num_groups)
        for s in samples:
            batch_idx.append(s)
            freq_idx.append(freqs)
    return np.asarray(batch_idx), np.stack(freq_idx, axis=0)


def drop_band(x: jnp.ndarray, num_groups: int = 2) -> jnp.ndarray:
    """[B, C, F, T] -> [B, C, F//num_groups, T] rotating frequency subsample.

    Training-only compute reduction; couples batch and frequency indices the
    same way the reference does so loss curves match under data parallelism.
    """
    batch_size, _, num_freqs, _ = x.shape
    assert batch_size > num_groups, (
        f"Batch size ({batch_size}) must exceed num_groups ({num_groups})."
    )
    if num_groups <= 1:
        return x
    batch_idx, freq_idx = _drop_band_indices(batch_size, num_freqs, num_groups)
    # Advanced indices separated by a slice move to the front:
    # result is [B, F//G, C, T]; transpose back to [B, C, F//G, T].
    gathered = x[jnp.asarray(batch_idx)[:, None], :, jnp.asarray(freq_idx), :]
    return jnp.transpose(gathered, (0, 2, 1, 3))
