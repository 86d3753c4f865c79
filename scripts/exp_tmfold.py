"""HISTORICAL PROBE (r4) — the TIME_MAJOR_FOLD construction path this
script A/B-tested was measured SLOWER end-to-end and DELETED in r5
(VERDICT r4 weak #3); the measured record lives in docs/PERFORMANCE.md
"Fold-construction probe". Run the r4 tree (git log -S TIME_MAJOR_FOLD)
to reproduce. Kept as the probe record only.

"""
raise SystemExit(__doc__)

"""On-chip A/B: channel-major fold construction (r3 layout) vs the
time-major fold (models/fullsubnet_plus.py TIME_MAJOR_FOLD) at the bench
headline shape (batch 96, 10 s, int8 serving path).

Context: the batch-96 serving program decomposes as ~36.5 ms pre-kernel /
307 ms kernel / 6 ms output (docs/PERFORMANCE.md). Within the pre-kernel
half, ~20 ms is fold construction: the channel-major route materializes the
unfold at [B, F, 34, T], norms it, and the kernel wrapper then transposes
the WHOLE fold to the kernel's [T, 48, N] layout. TIME_MAJOR_FOLD builds
the fold directly in that layout — only the compact [B, F, T] branch
outputs are transposed, and the 34-feature stack is written once.

Methodology per CLAUDE.md: both variants compiled first, then interleaved
timed rounds in ONE process, queue-ahead within a round, completion forced
by scalar taps, min elapsed (= max throughput) per variant over rounds.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

from fullsubnet_plus_tpu.enhance import Enhancer
from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
from fullsubnet_plus_tpu.models import fullsubnet_plus as M

BATCH, SECONDS, SR = 96, 10.0, 16000
ITERS, ROUNDS, WARMUP = 4, 5, 2
DTYPE = "int8"

config = M.FullSubNetPlusConfig()
params = FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), config)
rng = np.random.default_rng(0)
noisy = jnp.asarray(
    (rng.standard_normal((BATCH, int(SECONDS * SR))) * 0.1).astype(np.float32)
)
noisy.block_until_ready()

variants = {}
for name, flag in (("channel_major", False), ("time_major", True)):
    M.TIME_MAJOR_FOLD = flag
    enhancer = Enhancer(FULLSUBNET_PLUS, config, params, compute_dtype=DTYPE)
    step = jax.jit(
        lambda x, s, e=enhancer: e.mag_complex_full_band_crm_mask(x + s)[0, 0]
    )
    t0 = time.perf_counter()
    for i in range(WARMUP):  # traces (reads the flag) + compiles + warms
        val = float(step(noisy, jnp.float32(i) * 1e-9))
    print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s, "
          f"tap={val:.6f}", flush=True)
    variants[name] = step
M.TIME_MAJOR_FOLD = True

best = {name: float("inf") for name in variants}
k = WARMUP
for r in range(ROUNDS):
    for name, step in variants.items():
        t0 = time.perf_counter()
        taps = []
        for _ in range(ITERS):
            taps.append(step(noisy, jnp.float32(k) * 1e-9))
            k += 1
        for tap in taps:
            float(tap)
        el = time.perf_counter() - t0
        best[name] = min(best[name], el)
        print(f"round {r} {name}: {el / ITERS * 1000:.1f} ms/iter", flush=True)

audio_seconds = BATCH * SECONDS * ITERS
for name, el in best.items():
    print(f"BEST {name}: {el / ITERS * 1000:.2f} ms/iter, "
          f"{audio_seconds / el:.1f} audio-s/s/chip", flush=True)
