"""On-chip A/B: reverse-sweep dependency interleave (BWD_SUB_TILES 1 vs 2)
for the fused-wgrad LSTM backward (ops/lstm_pallas.py).

Context (VERDICT r4 ask #6): the fwd/bwd kernel gap is attributed to the
backward's dependency structure — per step, the VPU cell-backward feeds the
MXU dgates matmuls feeds the next step's carries. Splitting each backward
grid step's row tile into two INDEPENDENT chains gives the scheduler one
chain's VPU cell-backward to overlap with the other's MXU matmuls — the
one pipelining shape the r3/r4 rejected-variants list did not cover
(those were forward-side). Gradients are bitwise-equivalent scheduling
(tests/test_pallas_lstm.py::test_pallas_train_vjp_bwd_sub_tiles_knob).

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
for name, sub in (("sub1", 1), ("sub2", 2)):
    lp.BWD_SUB_TILES = sub
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
lp.BWD_SUB_TILES = 1

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
