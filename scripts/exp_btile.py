"""On-chip A/B: backward row tile 128 (default) vs 192 for the fused-wgrad
LSTM backward (ops/lstm_pallas.py BWD_ROW_TILE).

Context (VERDICT r4 ask #5): the training backward runs at ~60 % MFU; the
residuals are ALREADY stored in the compute dtype (bf16 for the default
training config — `_train_fwd` seq_out uses x.dtype), so the remaining
named lever is the halved backward row tile (256 -> 128) that was needed to
fit the fp32 weight-grad accumulators in scoped VMEM (17.04 M > 16 M at
256). 192 fits (accumulators are tile-independent; only the double-buffered
blocks scale) and divides the batch-36 fold (4608 = 24 x 192).

Methodology per CLAUDE.md: both variants compiled first, then interleaved
timed rounds in ONE process, queue-ahead within a round, every loss fetched
inside the timed region, min over rounds reported.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from fullsubnet_plus_tpu.utils.misc import enable_compilation_cache

enable_compilation_cache()

from fullsubnet_plus_tpu.models import FULLSUBNET_PLUS
from fullsubnet_plus_tpu.models.fullsubnet_plus import FullSubNetPlusConfig
from fullsubnet_plus_tpu.train.loss import mse_loss
from fullsubnet_plus_tpu.train.step import (
    init_train_state,
    make_optimizer,
    make_train_step,
)
from fullsubnet_plus_tpu.ops import lstm_pallas as lp

BATCH, SAMPLES = 36, 49152
ITERS, ROUNDS, WARMUP = 12, 4, 2

config = FullSubNetPlusConfig()
optimizer = make_optimizer()
state0 = init_train_state(
    FULLSUBNET_PLUS.init(jax.random.PRNGKey(0), config), optimizer
)
rng = np.random.default_rng(0)
noisy = jnp.asarray(rng.standard_normal((BATCH, SAMPLES)).astype(np.float32) * 0.1)
clean = noisy * 0.8
perturb = jax.jit(lambda x, s: x + s)

variants = {}
for name, bt in (("btile128", None), ("btile192", 192)):
    lp.BWD_ROW_TILE = bt
    step = make_train_step(
        FULLSUBNET_PLUS, config, optimizer, mse_loss,
        compute_dtype=jnp.bfloat16,
    )
    state = jax.tree_util.tree_map(jnp.copy, state0)
    t0 = time.perf_counter()
    for i in range(WARMUP):  # compiles under THIS trace-time constant
        state, metrics = step(state, perturb(noisy, jnp.float32(i) * 1e-9), clean)
        loss = float(metrics["loss"])
    print(f"{name}: compiled+warm in {time.perf_counter() - t0:.1f}s, "
          f"loss={loss:.6f}", flush=True)
    variants[name] = (step, state)
lp.BWD_ROW_TILE = None

best = {name: float("inf") for name in variants}
k = WARMUP
for r in range(ROUNDS):
    for name, (step, state) in variants.items():
        t0 = time.perf_counter()
        losses = []
        for _ in range(ITERS):
            state, metrics = step(
                state, perturb(noisy, jnp.float32(k) * 1e-9), clean
            )
            losses.append(metrics["loss"])
            k += 1
        for l in losses:
            float(l)
        el = time.perf_counter() - t0
        variants[name] = (step, state)
        best[name] = min(best[name], el)
        print(f"round {r} {name}: {el / ITERS * 1000:.1f} ms/step", flush=True)

for name, el in best.items():
    aps = BATCH * (SAMPLES / 16000) * ITERS / el
    print(f"BEST {name}: {el / ITERS * 1000:.2f} ms/step, "
          f"{aps:.1f} audio-s/s/chip", flush=True)
