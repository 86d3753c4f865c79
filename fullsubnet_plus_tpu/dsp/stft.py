"""STFT / iSTFT as MXU-friendly matmuls with reshape-based overlap-add.

Semantics match the reference's `torch.stft` / `torch.istft` wrappers
(/root/reference/speech_enhance/audio_zen/acoustics/feature.py:10-65):
center=True with reflect padding, periodic Hann window, onesided rFFT,
and least-squares iSTFT (overlap-add normalized by the squared-window
envelope, center-trimmed, cut to `length`).

TPU-first design notes:
  * Framing is done with a reshape trick, not a gather: the padded signal is
    chunked into hop-sized rows and each frame is the concatenation of
    ``n_fft // hop`` consecutive rows. Zero data-dependent indexing, so XLA
    lowers it to pure reshapes/concats.
  * The DFT itself is a single ``[B*T, n_fft] x [n_fft, 2F]`` matmul against a
    precomputed windowed rDFT basis — this maps directly onto the MXU and lets
    XLA fuse the surrounding elementwise work, which beats the generic FFT
    lowering for small n_fft (512).
  * Overlap-add is the inverse reshape trick (split frames into hop-sized
    slabs, add shifted copies) — again scatter-free.

All functions are jit-safe with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from fullsubnet_plus_tpu.constants import N_FFT, HOP_LENGTH, WIN_LENGTH


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(win_length)``."""
    n = np.arange(win_length)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))).astype(dtype)


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int, win_length: int):
    """Windowed forward rDFT basis C, S with shape [n_fft, F].

    X_re = frames @ C,  X_im = frames @ S  (window folded into the basis).
    """
    num_freqs = n_fft // 2 + 1
    window = hann_window(win_length).astype(np.float64)
    if win_length < n_fft:  # center-pad the window, torch.stft semantics
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    n = np.arange(n_fft)[:, None]
    k = np.arange(num_freqs)[None, :]
    angle = -2.0 * np.pi * n * k / n_fft
    cos_b = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_b = (np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


@functools.lru_cache(maxsize=8)
def _idft_basis(n_fft: int, win_length: int):
    """Windowed inverse rDFT basis [F, n_fft] for real/imag parts.

    frame_time = X_re @ Ci + X_im @ Si, already multiplied by the synthesis
    window (the squared-window normalization happens in overlap-add).
    """
    num_freqs = n_fft // 2 + 1
    window = hann_window(win_length).astype(np.float64)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    k = np.arange(num_freqs)[:, None]
    n = np.arange(n_fft)[None, :]
    angle = 2.0 * np.pi * k * n / n_fft
    # Hermitian weights: DC and Nyquist count once, interior bins twice.
    alpha = np.full((num_freqs, 1), 2.0)
    alpha[0, 0] = 1.0
    alpha[-1, 0] = 1.0
    ci = (alpha * np.cos(angle) / n_fft) * window[None, :]
    si = (-alpha * np.sin(angle) / n_fft) * window[None, :]
    return ci.astype(np.float32), si.astype(np.float32)


def num_frames(signal_length: int, hop_length: int = HOP_LENGTH) -> int:
    """Number of STFT frames for a center-padded signal (torch.stft)."""
    return 1 + signal_length // hop_length


def frame_signal(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """[B, L] -> [B, T, n_fft] overlapping frames, center reflect-padded.

    Scatter/gather-free: requires n_fft % hop_length == 0 (true for the
    shipped 512/256 config); each frame is ``n_fft // hop`` hop-sized rows.
    """
    assert n_fft % hop_length == 0, "frame reshape trick needs hop | n_fft"
    batch, length = y.shape
    frames = 1 + length // hop_length
    rows_per_frame = n_fft // hop_length
    pad = n_fft // 2
    y = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    padded_len = length + 2 * pad
    # Right-pad with zeros to a whole number of hop rows (the tail never
    # contributes to the first `frames` frames).
    n_rows = -(-padded_len // hop_length)
    extra = n_rows * hop_length - padded_len
    if n_rows - rows_per_frame + 1 < frames:  # ensure enough rows to slice
        n_rows = frames + rows_per_frame - 1
        extra = n_rows * hop_length - padded_len
    if extra:
        y = jnp.pad(y, ((0, 0), (0, extra)))
    rows = y.reshape(batch, n_rows, hop_length)
    slabs = [rows[:, i : i + frames, :] for i in range(rows_per_frame)]
    return jnp.concatenate(slabs, axis=-1)  # [B, T, n_fft]


def stft(
    y: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    win_length: int = WIN_LENGTH,
) -> jnp.ndarray:
    """[B, L] float waveform -> [B, F, T] complex64 STFT.

    Matches ``torch.stft(y, n_fft, hop, win, hann, return_complex=True)``
    with its defaults (center=True, reflect pad, onesided, unnormalized) —
    the reference wrapper at audio_zen/acoustics/feature.py:10-31.
    """
    assert y.ndim == 2, f"stft expects [B, L], got {y.shape}"
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop_length)
    cos_b, sin_b = _dft_basis(n_fft, win_length)
    real = frames @ jnp.asarray(cos_b)  # [B, T, F]
    imag = frames @ jnp.asarray(sin_b)
    spec = jax.lax.complex(real, imag)
    return jnp.swapaxes(spec, 1, 2)  # [B, F, T]


def stft_split(
    y: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    win_length: int = WIN_LENGTH,
):
    """Like :func:`stft` but returns (mag, real, imag), each [B, F, T].

    This is the model-facing variant: FullSubNet+ consumes the three real
    tensors, so returning them directly keeps everything in real dtypes
    (friendlier to bf16 and sharding) and skips complex arithmetic.
    """
    assert y.ndim == 2
    frames = frame_signal(y.astype(jnp.float32), n_fft, hop_length)
    cos_b, sin_b = _dft_basis(n_fft, win_length)
    real = jnp.swapaxes(frames @ jnp.asarray(cos_b), 1, 2)
    imag = jnp.swapaxes(frames @ jnp.asarray(sin_b), 1, 2)
    mag = jnp.sqrt(real * real + imag * imag)
    return mag, real, imag


@functools.lru_cache(maxsize=32)
def _window_envelope(n_fft: int, hop_length: int, win_length: int, frames: int):
    """Squared-window OLA envelope [frames*hop + n_fft] (numpy, trace-time)."""
    window = hann_window(win_length).astype(np.float64)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    env = np.zeros(frames * hop_length + n_fft - hop_length, dtype=np.float64)
    w2 = window * window
    for t in range(frames):
        env[t * hop_length : t * hop_length + n_fft] += w2
    # torch.istft guards tiny values; after center-trim env >= O(0.5) for
    # hann/2-overlap, so a plain epsilon guard is enough.
    env = np.where(env > 1e-11, env, 1.0)
    return env.astype(np.float32)


def overlap_add(frames_time: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """[B, T, n_fft] windowed frames -> [B, T*hop + n_fft - hop] OLA signal.

    Reshape-based: each frame is split into ``n_fft // hop`` hop-sized slabs
    and slab i is added at row offset i — no scatter ops.
    """
    assert n_fft % hop_length == 0
    batch, frames, _ = frames_time.shape
    rows_per_frame = n_fft // hop_length
    n_rows = frames + rows_per_frame - 1
    slabs = frames_time.reshape(batch, frames, rows_per_frame, hop_length)
    out = jnp.zeros((batch, n_rows, hop_length), frames_time.dtype)
    for i in range(rows_per_frame):
        out = out.at[:, i : i + frames, :].add(slabs[:, :, i, :])
    return out.reshape(batch, n_rows * hop_length)


def istft(
    spec,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    win_length: int = WIN_LENGTH,
    length: int | None = None,
    use_mag_phase: bool = False,
    valid_frames=None,
) -> jnp.ndarray:
    """Inverse STFT matching ``torch.istft`` (least-squares OLA, center trim).

    Accepts [B, F, T] complex, [B, F, T, 2] stacked real/imag, or a
    (mag, phase) tuple with ``use_mag_phase=True`` — the reference wrapper's
    surface (audio_zen/acoustics/feature.py:34-65).

    `valid_frames` ([B] int32): per-utterance frame counts for bucket-padded
    batches. The least-squares window envelope then counts only each
    utterance's own frames, so samples near a shorter utterance's end are
    normalized exactly as its exact-length istft would (the static envelope
    would over-divide them by the padding frames' windows).
    """
    if use_mag_phase:
        mag, phase = spec
        real = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
    elif isinstance(spec, (tuple, list)):
        real, imag = spec
    elif jnp.iscomplexobj(spec):
        real, imag = spec.real, spec.imag
    else:  # [B, F, T, 2]
        real, imag = spec[..., 0], spec[..., 1]

    batch, _, frames = real.shape
    ci, si = _idft_basis(n_fft, win_length)
    # [B, T, F] @ [F, n_fft] -> windowed time frames
    frames_time = jnp.swapaxes(real, 1, 2) @ jnp.asarray(ci) + jnp.swapaxes(
        imag, 1, 2
    ) @ jnp.asarray(si)
    signal = overlap_add(frames_time, n_fft, hop_length)
    if valid_frames is None:
        env = jnp.asarray(_window_envelope(n_fft, hop_length, win_length, frames))
        signal = signal / env[None, :]
    else:
        window = hann_window(win_length)
        if win_length < n_fft:
            p = (n_fft - win_length) // 2
            window = jnp.pad(window, (p, n_fft - win_length - p))
        from fullsubnet_plus_tpu.dsp.norms import time_mask

        mask = time_mask(frames, valid_frames, real.dtype)
        w2_frames = mask[:, :, None] * (window * window)[None, None, :]
        env = overlap_add(w2_frames, n_fft, hop_length)
        env = jnp.where(env > 1e-11, env, 1.0)
        signal = signal / env
    pad = n_fft // 2
    signal = signal[:, pad:]
    default_len = (frames - 1) * hop_length
    if length is None:
        length = default_len
    if length <= signal.shape[1]:
        return signal[:, :length]
    return jnp.pad(signal, ((0, 0), (0, length - signal.shape[1])))


def mag_phase(spec: jnp.ndarray):
    """Complex [.., F, T] -> (magnitude, phase)."""
    return jnp.abs(spec), jnp.angle(spec)
