"""On-chip A/B: single-live-stream chunk latency, bf16 vs int8 with
BUILD-TIME weight quantization (r5, VERDICT r4 ask #3).

Context: the r4 int8 streaming probe measured 52.0 ms p50 vs bf16's
40.4 ms at the single-stream chunk shape ([1, 256+4 s]) and named the
PER-CALL weight quantization as part of the cost — a serial
quantize+pad chain ahead of the kernel that the batch-96 offline fold
amortizes but a batch-1 chunk does not. `Enhancer(compute_dtype="int8")`
now quantizes ONCE at engine build (ops/lstm_pallas.py
prepare_quantized_lstm, numpy, no device work) and feeds int8 weights +
scales as plain program inputs. This re-measures the r4 decision with the
quantize hoisted; if int8 now wins, the daemon's streaming default story
changes (docs/PERFORMANCE.md "int8 at the streaming shape").

Methodology per CLAUDE.md: both enhancers warmed first, interleaved
per-chunk walls in ONE process (each tick pays H2D + compute + D2H + host
cross-fade exactly as bench.py --mode streaming measures), p50/p99 per
variant over all rounds.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

from fullsubnet_plus_tpu.enhance import Enhancer
from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig

SR = 16000
CHUNK, HOP = 4 * SR, 2 * SR
IN_LEN = 256 + CHUNK
TICKS, WARMUP = 30, 4

config = FullSubNetPlusConfig()
params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), config)

variants = {}
for name in ("bf16", "int8"):
    e = Enhancer(
        FULLSUBNET_PLUS, config, params,
        compute_dtype={"bf16": "bfloat16", "int8": "int8"}[name],
    )
    variants[name] = e.mag_complex_full_band_crm_mask

rng = np.random.default_rng(0)
row = (rng.standard_normal((1, IN_LEN)) * 0.1).astype(np.float32)
lens = np.full((1,), IN_LEN, np.int64)
window = np.hanning(CHUNK + 1)[:CHUNK].astype(np.float32)

for name, mode in variants.items():
    t0 = time.perf_counter()
    np.asarray(mode(jnp.asarray(row), lengths=lens))
    print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s",
          flush=True)

walls = {name: [] for name in variants}
prev = {name: np.zeros((1, HOP), np.float32) for name in variants}
for i in range(WARMUP + TICKS):
    for name, mode in variants.items():
        fresh = row + np.float32(i) * 1e-9  # new audio each tick (H2D)
        t0 = time.perf_counter()
        out = np.asarray(mode(jnp.asarray(fresh), lengths=lens))  # D2H
        faded = out[:, 256:] * window[None, :]
        emit = faded[:, :HOP] + prev[name]  # host cross-fade, then emit
        prev[name] = faded[:, HOP:]
        assert np.isfinite(emit).all()
        if i >= WARMUP:
            walls[name].append(time.perf_counter() - t0)

for name, w in walls.items():
    w = np.asarray(w) * 1000
    print(f"{name}: p50={np.percentile(w, 50):.1f} ms "
          f"p90={np.percentile(w, 90):.1f} p99={np.percentile(w, 99):.1f} "
          f"(n={len(w)})", flush=True)
