"""ctypes bindings for the native mixing helpers (native/mixkit.cc).

Auto-builds libmixkit.so on first import if g++ is available; every entry
point has a numpy fallback, so the framework runs identically without the
native library (just slower host-side mixing).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmixkit.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "mixkit.cc")
        if not os.path.exists(src):
            return None
        try:
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-o", _LIB_PATH, src],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.mixkit_pcm16_to_float.argtypes = [i16p, ctypes.c_int64, ctypes.c_int32, f32p]
    lib.mixkit_pcm16_to_float.restype = ctypes.c_int64
    lib.mixkit_normalize_loudness.argtypes = [f32p, ctypes.c_int64, ctypes.c_float, ctypes.c_float]
    lib.mixkit_normalize_loudness.restype = None
    lib.mixkit_snr_mix.argtypes = [f32p, f32p, f32p, ctypes.c_int64,
                                   ctypes.c_float, ctypes.c_float,
                                   ctypes.c_float, ctypes.c_float]
    lib.mixkit_snr_mix.restype = ctypes.c_float
    lib.mixkit_rir_convolve.argtypes = [f32p, ctypes.c_int64, f32p, ctypes.c_int64, f32p]
    lib.mixkit_rir_convolve.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def pcm16_to_float(samples: np.ndarray, num_channels: int = 1) -> np.ndarray:
    """Interleaved int16 -> mono float32 [-1, 1)."""
    lib = _load()
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    frames = len(samples) // num_channels
    if lib is None:
        data = samples.astype(np.float32) / 32768.0
        if num_channels > 1:
            data = data.reshape(frames, num_channels).mean(axis=1)
        return data
    out = np.empty(frames, np.float32)
    lib.mixkit_pcm16_to_float(
        samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        frames,
        num_channels,
        _fptr(out),
    )
    return out


def snr_mix_native(clean: np.ndarray, noise: np.ndarray, snr_db: float,
                   target_db_fs: float, noisy_target_db_fs: float,
                   eps: float = 1e-6):
    """Native mix: returns (noisy, clean_scaled); None if lib unavailable."""
    lib = _load()
    if lib is None:
        return None
    clean = np.ascontiguousarray(clean, np.float32).copy()
    noise = np.ascontiguousarray(noise, np.float32).copy()
    noisy = np.empty_like(clean)
    lib.mixkit_snr_mix(
        _fptr(clean), _fptr(noise), _fptr(noisy), len(clean),
        float(snr_db), float(target_db_fs), float(noisy_target_db_fs), float(eps),
    )
    return noisy, clean


def rir_convolve(clean: np.ndarray, rir: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    clean = np.ascontiguousarray(clean, np.float32)
    rir = np.ascontiguousarray(rir, np.float32)
    out = np.empty_like(clean)
    lib.mixkit_rir_convolve(_fptr(clean), len(clean), _fptr(rir), len(rir), _fptr(out))
    return out
