"""Fused 2-layer LSTM (+ output projection) as a single Pallas TPU kernel.

The sub-band model is a 2-layer LSTM(34→384) over a folded batch of B·257
sequences — the dominant cost of FullSubNet+ (SURVEY.md §3.2 "HOTTEST op";
measured 83 % of the enhance path in docs/PERFORMANCE.md). This kernel
replaces the per-layer lax.scan with ONE sequential sweep:

  * The kernel runs on a grid (row_tiles, T). TPU grids iterate the last
    axis innermost, so for each row tile the T steps run sequentially while
    VMEM scratch carries (h1, c1, h2, c2) across steps — both layers advance
    in the same step, so the sequence is traversed ONCE instead of twice.
  * Each layer's input and recurrent matmuls are COMBINED into one MXU
    issue: gates₁ = [xₜ | h₁] @ [W₁; U₁], gates₂ = [h₁ | h₂] @ [W₂; U₂].
    Measured ≈9 % faster than four separate dots at the model's shapes (the
    kernel is dependency-stall-bound, not FLOP-bound — see
    docs/PERFORMANCE.md).
  * ALL weights live in VMEM for the whole sweep (their BlockSpec index is
    constant, so Pallas never re-DMAs them): [W₁;U₁] [Dp+H,4H] + [W₂;U₂]
    [2H,4H] ≈ 8 MB fp32 / 4 MB bf16.
  * Optional fused output projection (`fc`): out = h₂ @ W_fc + b_fc written
    straight as a [T, N, O] array. For the shipped O=2 this shrinks the HBM
    intermediate from [T, N, 384] (4 GB bf16 at batch 32 × 10 s) to 21 MB
    and eliminates the separate whole-sequence Linear pass.
  * Unlike the scan path in nn/lstm.py, the layer-1 input projection is NOT
    hoisted/materialized: a [N, T, 4H] fp32 intermediate would be ~8 GB of
    HBM for a 10 s batch-8 call. Instead the raw [1, TILE_N, Dp] input
    slice (Dp = 34 padded to 128 lanes) streams in per step and the
    projection runs on the MXU inside the step.
  * Per-step HBM traffic is the x block in and the (tiny, when fc is fused)
    output block out, which Pallas double-buffers against compute. Matmuls
    accumulate in fp32 (`preferred_element_type`) regardless of storage
    dtype; carried state stays fp32 in VMEM and is cast to the weight dtype
    per step so bf16 weights get true-bf16 MXU rate.

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
SUBLANE = 8


def _make_kernel(steps_per_block: int, sub_tiles: int, fused_fc: bool):
    def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, *rest):
        if fused_fc:
            fcw_ref, fcb_ref, out_ref, h1, c1, h2, c2 = rest
        else:
            (out_ref, h1, c1, h2, c2), fcw_ref, fcb_ref = rest, None, None
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
        # unrolled); 1 measures fastest — larger blocks blow up VMEM live
        # ranges and lose to Pallas's own double buffering. `sub_tiles`
        # splits the row tile into independent chains so the scheduler can
        # overlap one chain's VPU cell math with another's MXU matmuls.
        mm = w1_ref.dtype
        for k in range(steps_per_block):
            for s in range(sub_tiles):
                rows = pl.ds(s * sub, sub)
                gates1 = (
                    jnp.dot(
                        jnp.concatenate(
                            [x_ref[k, rows, :], h1[rows, :].astype(mm)], axis=-1
                        ),
                        w1_ref[:],
                        preferred_element_type=jnp.float32,
                    )
                    + b1_ref[0].astype(jnp.float32)
                )
                h1_new, c1_new = cell(gates1, c1[rows, :])
                h1[rows, :] = h1_new.astype(h1.dtype)
                c1[rows, :] = c1_new.astype(c1.dtype)

                # Layer 2: fresh h1 feeds straight in — no second sweep over T.
                gates2 = (
                    jnp.dot(
                        jnp.concatenate(
                            [h1_new.astype(mm), h2[rows, :].astype(mm)], axis=-1
                        ),
                        w2_ref[:],
                        preferred_element_type=jnp.float32,
                    )
                    + b2_ref[0].astype(jnp.float32)
                )
                h2_new, c2_new = cell(gates2, c2[rows, :])
                h2[rows, :] = h2_new.astype(h2.dtype)
                c2[rows, :] = c2_new.astype(c2.dtype)
                if fused_fc:
                    y = jnp.dot(
                        h2_new.astype(mm), fcw_ref[:],
                        preferred_element_type=jnp.float32,
                    ) + fcb_ref[0].astype(jnp.float32)
                    out_ref[k, rows, :] = y.astype(out_ref.dtype)
                else:
                    out_ref[k, rows, :] = h2_new.astype(out_ref.dtype)

    return _kernel


@functools.partial(jax.jit, static_argnames=("tile_n", "steps_per_block", "sub_tiles", "interpret"))
def stacked_lstm2(params, x, fc=None, *, tile_n: int = 256, steps_per_block: int = 1,
                  sub_tiles: int = 1, interpret: bool = False):
    """2-layer LSTM forward via the fused kernel.

    params: nn/lstm.py layout ({"layers": [{w_ih, w_hh, b_ih, b_hh} x2]}).
    fc: optional {"weight": [H, O], "bias": [O]} fused output projection.
    x: [N, T, D] -> [N, T, H] (or [N, T, O] when fc is given).
    """
    l1, l2 = params["layers"]
    n, t, d = x.shape
    hidden = l1["w_hh"].shape[0]
    dtype = x.dtype

    # Shrink the row tile for small folds (e.g. the full-band LSTM of the
    # FullSubNet baseline runs at N = batch) so padding stays bounded.
    tile_n = min(tile_n, max(SUBLANE, -(-n // SUBLANE) * SUBLANE))

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

    w1 = jnp.concatenate(
        [jnp.pad(l1["w_ih"].astype(dtype), ((0, d_pad), (0, 0))),
         l1["w_hh"].astype(dtype)], axis=0
    )  # [Dp + H, 4H]
    b1 = (l1["b_ih"] + l1["b_hh"]).reshape(1, -1).astype(dtype)
    w2 = jnp.concatenate(
        [l2["w_ih"].astype(dtype), l2["w_hh"].astype(dtype)], axis=0
    )  # [2H, 4H]
    b2 = (l2["b_ih"] + l2["b_hh"]).reshape(1, -1).astype(dtype)

    resident = lambda shape: pl.BlockSpec(
        shape, lambda i, s: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    grid = (n_total // tile_n, t_total // steps_per_block)
    in_specs = [
        pl.BlockSpec((steps_per_block, tile_n, d_total), lambda i, s: (s, i, 0),
                     memory_space=pltpu.VMEM),
        resident((d_total + hidden, 4 * hidden)),
        resident((1, 4 * hidden)),
        resident((2 * hidden, 4 * hidden)),
        resident((1, 4 * hidden)),
    ]
    args = [x_tm, w1, b1, w2, b2]
    if fc is not None:
        out_dim = fc["weight"].shape[-1]
        args += [fc["weight"].astype(dtype),
                 fc["bias"].reshape(1, -1).astype(dtype)]
        in_specs += [resident((hidden, out_dim)), resident((1, out_dim))]
    else:
        out_dim = hidden

    out = pl.pallas_call(
        _make_kernel(steps_per_block, sub_tiles, fc is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((steps_per_block, tile_n, out_dim), lambda i, s: (s, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_total, n_total, out_dim), dtype),
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
                + n_total * t * out_dim * x.dtype.itemsize
                + (d_total + 3 * hidden) * 4 * hidden * x.dtype.itemsize
            ),
            transcendentals=n_total * t * 8 * hidden,
        ),
        interpret=interpret,
    )(*args)
    return jnp.swapaxes(out[:t], 0, 1)[:n]
