"""Misc helpers (reference audio_zen/utils.py:13-218)."""

from __future__ import annotations

import importlib
import os
import time

import numpy as np


def initialize_module(path: str, args: dict | None = None, initialize: bool = True):
    """Dynamic dotted-path loader (audio_zen/utils.py:63-99) — the generic
    fallback for components outside our registries (custom user models)."""
    module_path = ".".join(path.split(".")[:-1])
    class_or_function_name = path.split(".")[-1]
    module = importlib.import_module(module_path)
    class_or_function = getattr(module, class_or_function_name)
    if initialize:
        return class_or_function(**(args or {}))
    return class_or_function


def prepare_empty_dir(dirs, resume: bool = False):
    """audio_zen/utils.py:26-38: assert dirs exist when resuming, else mkdir."""
    for dir_path in dirs:
        if resume:
            assert os.path.exists(dir_path), (
                f"Resuming expects existing directory {dir_path}"
            )
        else:
            os.makedirs(dir_path, exist_ok=True)


def check_nan(arr, name: str = "array") -> bool:
    """audio_zen/utils.py:41-43."""
    has_nan = bool(np.isnan(np.asarray(arr)).any())
    if has_nan:
        print(f"Warning: {name} contains NaN")
    return has_nan


class ExecutionTime:
    """Wall-clock timer (audio_zen/utils.py:46-60)."""

    def __init__(self):
        self.start_time = time.time()

    def duration(self) -> int:
        return int(time.time() - self.start_time)


def print_tensor_info(tensor, flag: str = "Tensor"):
    """audio_zen/utils.py:102-110."""
    arr = np.asarray(tensor)
    print(
        f"{flag}\tmax: {arr.max():.6f}, min: {arr.min():.6f}, "
        f"mean: {arr.mean():.6f}, shape: {arr.shape}, dtype: {arr.dtype}"
    )


def expand_path(path: str) -> str:
    """audio_zen/utils.py:212-214."""
    return os.path.abspath(os.path.expanduser(path))


def basename(path: str):
    """audio_zen/utils.py:216-218: (stem, ext)."""
    filename = os.path.splitext(os.path.basename(path))
    return filename[0], filename[1]


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache (idempotent).

    Remote TPU compiles over the axon tunnel are very slow (the full
    training program takes tens of minutes cold; even a trivial jit
    measured 114 s vs 0.5 s cached), and the remote service keeps no
    cross-process cache — so every CLI/bench process pays full price
    without this. Honors JAX_COMPILATION_CACHE_DIR if set; returns the
    directory used, or None if the cache could not be enabled (old jax).
    Compile time is never inside a timed bench region, so caching does not
    affect measured numbers.
    """
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/fullsubnet_plus_tpu/jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        return None
    return cache_dir
