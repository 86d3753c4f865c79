"""Fused 2-layer LSTM as a single Pallas TPU kernel.

The sub-band model is a 2-layer LSTM(34→384) over a folded batch of B·257
sequences — the dominant cost of FullSubNet+ (SURVEY.md §3.2 "HOTTEST op").
This kernel replaces the per-layer lax.scan with ONE sequential sweep:

  * The kernel runs on a grid (row_tiles, T). TPU grids iterate the last
    axis innermost, so for each row tile the T steps run sequentially while
    VMEM scratch carries (h1, c1, h2, c2) across steps — both layers advance
    in the same step, so the sequence is traversed ONCE instead of twice.
  * ALL weights live in VMEM for the whole sweep (their BlockSpec index is
    constant, so Pallas never re-DMAs them): W1 [Dp,4H] + U1, W2, U2
    [384,1536] ≈ 8 MB fp32.
  * Unlike the scan path in nn/lstm.py, the layer-1 input projection is NOT
    hoisted/materialized: a [N, T, 4H] fp32 intermediate would be ~8 GB of
    HBM for a 10 s batch-8 call. Instead the raw [1, TILE_N, Dp] input
    slice (Dp = 34 padded to 128 lanes) streams in per step — 12× less HBM
    traffic — and the 128→1536 projection runs on the MXU inside the step.
  * Per-step HBM traffic is the x block in and the h2 block out, which
    Pallas double-buffers against the compute. Matmuls accumulate in fp32
    (`preferred_element_type`) regardless of storage dtype.

Gate order i, f, g, o (torch-compatible, see nn/lstm.py). Inference-only
(no VJP; training uses the lax.scan path, which autodiff handles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _make_kernel(steps_per_block: int, sub_tiles: int = 1):
    def _kernel(x_ref, w1_ref, b1_ref, u1_ref, w2_ref, b2_ref, u2_ref,
                out_ref, h1, c1, h2, c2):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h1[:] = jnp.zeros_like(h1)
            c1[:] = jnp.zeros_like(c1)
            h2[:] = jnp.zeros_like(h2)
            c2[:] = jnp.zeros_like(c2)

        hidden = h1.shape[-1]
        tile_n = h1.shape[0]
        sub = tile_n // sub_tiles

        def cell(gates, c_prev):
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])
            c_new = f * c_prev + i * g
            h_new = o * jnp.tanh(c_new)
            return h_new, c_new

        # `steps_per_block` timesteps per grid iteration (statically
        # unrolled). Measured on v5e: 1 is fastest — larger blocks blow up
        # VMEM live ranges and lose to Pallas's own double buffering.
        # Matmuls run in the weights' storage dtype (state is cast down per
        # step so bf16 weights get true-bf16 MXU rate) with fp32 accumulation;
        # the carried state itself stays fp32 in VMEM.
        # `sub_tiles` splits the row tile into independent chains so the
        # instruction scheduler can overlap one chain's VPU cell math with
        # another's MXU matmuls.
        mm = u1_ref.dtype
        for k in range(steps_per_block):
            for s in range(sub_tiles):
                rows = pl.ds(s * sub, sub)
                gates1 = (
                    jnp.dot(x_ref[k, rows, :], w1_ref[:], preferred_element_type=jnp.float32)
                    + jnp.dot(h1[rows, :].astype(mm), u1_ref[:], preferred_element_type=jnp.float32)
                    + b1_ref[0].astype(jnp.float32)
                )
                h1_new, c1_new = cell(gates1, c1[rows, :])
                h1[rows, :] = h1_new.astype(h1.dtype)
                c1[rows, :] = c1_new.astype(c1.dtype)

                # Layer 2: fresh h1 feeds straight in — no second sweep over T.
                gates2 = (
                    jnp.dot(h1_new.astype(mm), w2_ref[:], preferred_element_type=jnp.float32)
                    + jnp.dot(h2[rows, :].astype(mm), u2_ref[:], preferred_element_type=jnp.float32)
                    + b2_ref[0].astype(jnp.float32)
                )
                h2_new, c2_new = cell(gates2, c2[rows, :])
                h2[rows, :] = h2_new.astype(h2.dtype)
                c2[rows, :] = c2_new.astype(c2.dtype)
                out_ref[k, rows, :] = h2_new.astype(out_ref.dtype)

    return _kernel


@functools.partial(jax.jit, static_argnames=("tile_n", "steps_per_block", "sub_tiles", "interpret"))
def stacked_lstm2(params, x, *, tile_n: int = 256, steps_per_block: int = 1,
                  sub_tiles: int = 1, interpret: bool = False):
    """2-layer LSTM forward via the fused kernel.

    params: nn/lstm.py layout ({"layers": [{w_ih, w_hh, b_ih, b_hh} x2]}).
    x: [N, T, D] -> [N, T, H].
    """
    l1, l2 = params["layers"]
    n, t, d = x.shape
    hidden = l1["w_hh"].shape[0]
    dtype = x.dtype

    d_pad = -d % LANE
    n_pad = -n % tile_n
    t_pad = -t % steps_per_block
    # Time-major [T, N, Dp] so blocks are (K, tile_n, Dp) — last two dims
    # tile-aligned as the TPU lowering requires.
    x_tm = jnp.swapaxes(x, 0, 1)
    x_tm = jnp.pad(x_tm, ((0, t_pad), (0, n_pad), (0, d_pad)))
    n_total = n + n_pad
    d_total = d + d_pad
    t_total = t + t_pad

    w1 = jnp.pad(l1["w_ih"].astype(dtype), ((0, d_pad), (0, 0)))
    b1 = (l1["b_ih"] + l1["b_hh"]).reshape(1, -1).astype(dtype)
    u1 = l1["w_hh"].astype(dtype)
    w2 = l2["w_ih"].astype(dtype)
    b2 = (l2["b_ih"] + l2["b_hh"]).reshape(1, -1).astype(dtype)
    u2 = l2["w_hh"].astype(dtype)

    resident = lambda shape: pl.BlockSpec(
        shape, lambda i, s: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    grid = (n_total // tile_n, t_total // steps_per_block)
    out = pl.pallas_call(
        _make_kernel(steps_per_block, sub_tiles),
        grid=grid,
        in_specs=[
            pl.BlockSpec((steps_per_block, tile_n, d_total), lambda i, s: (s, i, 0),
                         memory_space=pltpu.VMEM),
            resident((d_total, 4 * hidden)),
            resident((1, 4 * hidden)),
            resident((hidden, 4 * hidden)),
            resident((hidden, 4 * hidden)),
            resident((1, 4 * hidden)),
            resident((hidden, 4 * hidden)),
        ],
        out_specs=pl.BlockSpec((steps_per_block, tile_n, hidden), lambda i, s: (s, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_total, n_total, hidden), dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_n, hidden), jnp.float32),
            pltpu.VMEM((tile_n, hidden), jnp.float32),
            pltpu.VMEM((tile_n, hidden), jnp.float32),
            pltpu.VMEM((tile_n, hidden), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_total * t * (d_total + 3 * hidden) * 4 * hidden,
            bytes_accessed=(
                n_total * t * d_total * x.dtype.itemsize
                + n_total * t * hidden * x.dtype.itemsize
                + (d_total + 3 * hidden) * 4 * hidden * x.dtype.itemsize
            ),
            transcendentals=n_total * t * 8 * hidden,
        ),
        interpret=interpret,
    )(x_tm, w1, b1, u1, w2, b2, u2)
    return jnp.swapaxes(out[:t], 0, 1)[:n]
