"""Fused 2-layer LSTM (+ output projection) as a single Pallas TPU kernel.

The sub-band model is a 2-layer LSTM(34→384) over a folded batch of B·257
sequences — the dominant cost of FullSubNet+ (SURVEY.md §3.2 "HOTTEST op";
measured 83 % of the enhance path in docs/PERFORMANCE.md). This kernel
replaces the per-layer lax.scan with ONE sequential sweep:

  * The kernel runs on a grid (row_tiles, T). TPU grids iterate the last
    axis innermost, so for each row tile the T steps run sequentially while
    VMEM scratch carries (h1, c1, h2, c2) across steps — both layers advance
    in the same step, so the sequence is traversed ONCE instead of twice.
  * Layer 2's input and recurrent matmuls are COMBINED into one MXU
    issue (gates₂ = [h₁ | h₂] @ [W₂; U₂] — measured ≈9 % faster than
    separate dots; the kernel is dependency-stall-bound, not FLOP-bound).
    Layer 1 splits into W₁x (a sublane-contracting dot on the
    feature-major input block) + U₁ so the x block needs no lane padding.
  * ALL weights live in VMEM for the whole sweep (their BlockSpec index is
    constant, so Pallas never re-DMAs them): W₁x + U₁ + [W₂;U₂]
    ≈ 8 MB fp32 / 4 MB bf16.
  * Optional fused output projection (`fc`): out = h₂ @ W_fc + b_fc written
    transposed as a [T, O, N] array (O=2 on sublanes — lane-minor O would
    physically pad 2→128). For the shipped O=2 this shrinks the HBM
    intermediate from [T, N, 384] (4 GB bf16 at batch 32 × 10 s) to ~80 MB
    and eliminates the separate whole-sequence Linear pass.
  * Unlike the scan path in nn/lstm.py, the layer-1 input projection is NOT
    hoisted/materialized: a [N, T, 4H] fp32 intermediate would be ~8 GB of
    HBM for a 10 s batch-8 call. Instead the [1, Dp, TILE_N] input slice
    (Dp = 34 padded to the 48-sublane tile) streams in per step and the
    projection runs on the MXU inside the step.
  * Per-step HBM traffic is the x block in and the (tiny, when fc is fused)
    output block out, which Pallas double-buffers against compute. Matmuls
    accumulate in fp32 (`preferred_element_type`) regardless of storage
    dtype; carried state stays fp32 in VMEM and is cast to the weight dtype
    per step so bf16 weights get true-bf16 MXU rate.

Gate order i, f, g, o (torch-compatible, see nn/lstm.py).

Training support (`stacked_lstm2_train`) is a jax.custom_vjp around the same
forward: the VJP forward runs a residual-saving variant of the kernel (gate
activations + h/c sequences written to HBM alongside the output), and the
backward is a second Pallas kernel sweeping T in REVERSE with only the
sequential work inside — per step, the cell backward (VPU) plus matmuls
yielding d(input) and the dh carry. The layer weight gradients
(dW = x/hᵀ·dgates) are ACCUMULATED IN-KERNEL into fp32 VMEM blocks via
transposed MXU matmuls (_make_bwd_kernel_fused) so the [T, N, 4H] dgates
tensors never touch HBM (~16 GB of traffic at the batch-36 train shape;
landed +15 % step throughput). FUSED_WGRAD=False restores the einsum path,
whose dgates-materializing backward keeps a smaller VMEM footprint under
the ~16 MB budget.

r5: the training kernels consume the SAME feature-sublane-major layouts as
the serving kernel (VERDICT r4 #1) — x blocks [T, Dp, N] (D = 34 on
sublanes, 34→48 instead of the lane pad 34→128), dy/primal-out blocks
[T, O, N] (O = 2 on sublanes instead of 2→128), and the backward's dx
written [T, Dp, N]. The feature-major x rows double as the dWih₁
accumulation layout (a plain dot, no in-kernel transpose); layer 1's
combined [W₁;U₁] splits into W₁x (sublane-contracting input product / dx)
and U₁ (dh₁ carry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8


def _split_weights(params, dtype, d_pad):
    """Per-layer weights for the feature-sublane-major forward kernels:
    layer-1 input rows sublane-padded ([Dp, 4H]), U1 separate (the input
    product is a sublane-contracting dot), layer-2 kept combined."""
    l1, l2 = params["layers"]
    w1x = jnp.pad(l1["w_ih"].astype(dtype), ((0, d_pad), (0, 0)))
    u1 = l1["w_hh"].astype(dtype)
    b1 = (l1["b_ih"] + l1["b_hh"]).reshape(1, -1).astype(dtype)
    w2 = jnp.concatenate(
        [l2["w_ih"].astype(dtype), l2["w_hh"].astype(dtype)], axis=0
    )  # [2H, 4H]
    b2 = (l2["b_ih"] + l2["b_hh"]).reshape(1, -1).astype(dtype)
    return w1x, u1, b1, w2, b2


def _tdot(a, b):
    """[K, M] x [K, N] -> [M, N]: MXU contraction over the SUBLANE axis of
    both operands (no transposes materialized)."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _make_kernel(steps_per_block: int, sub_tiles: int, fused_fc: bool):
    """Forward kernel. The folded input arrives FEATURE-SUBLANE-MAJOR
    ([T, Dp, N] blocks, Dp = D rounded up to the sublane tile): with D on
    the minor (lane) axis XLA's tiled layout physically pads 34 lanes to
    128 — a 3.8x HBM inflation of the largest tensor in the serving
    program (docs/PERFORMANCE.md "Input-layout facts"); with D on the
    sublane axis the pad is 34 -> 48 (1.4x) and the per-step input block
    DMA shrinks 128/48 = 2.7x. The layer-1 input product becomes a
    sublane-contracting dot_general (same MXU path the backward's
    weight-grad accumulation uses); the h products keep their combined
    row-major form."""
    def _kernel(x_ref, w1x_ref, u1_ref, b1_ref, w2_ref, b2_ref, *rest):
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
        mm = w1x_ref.dtype
        for k in range(steps_per_block):
            for s in range(sub_tiles):
                rows = pl.ds(s * sub, sub)
                gates1 = (
                    _tdot(x_ref[k, :, rows], w1x_ref[:])
                    + jnp.dot(
                        h1[rows, :].astype(mm), u1_ref[:],
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
                    # y written transposed ([O, rows]) so the out block is
                    # feature-major: O = 2 on the lane axis would pad the
                    # HBM array (and every write DMA) 2 -> 128.
                    y = jax.lax.dot_general(
                        fcw_ref[:], h2_new.astype(mm),
                        dimension_numbers=(((0,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) + fcb_ref[0].astype(jnp.float32)[:, None]
                    out_ref[k, :, rows] = y.astype(out_ref.dtype)
                else:
                    out_ref[k, rows, :] = h2_new.astype(out_ref.dtype)

    return _kernel


def _sublane_pad(d: int, dtype) -> int:
    """Feature-dim padding for the sublane-major [T, Dp, N] input layout:
    round D up to the dtype's sublane tile so the HBM array's physical
    layout is exact (bf16 tiles 16 sublanes, fp32 tiles 8)."""
    tile = 16 if jnp.dtype(dtype).itemsize == 2 else SUBLANE
    return -d % tile


def _feature_major(x, d_pad, n_pad):
    """[N, D, T] -> [T, D + d_pad, N + n_pad] (zero-padded).

    This is THE layout fix for the serving program's memory: with D = 34 on
    the minor (lane) axis XLA pads it physically to 128 (3.8x inflation of
    the largest tensor, and the single-neighbor unfold operands were
    padded 1 -> 128 lanes, a 128x blowup — measured in the batch-96 OOM
    dump). Feature-sublane-major keeps the lanes dense (N is a multiple of
    the tile) and pads only 34 -> 48 sublanes."""
    x_tm = jnp.transpose(x, (2, 1, 0))
    return jnp.pad(x_tm, ((0, 0), (0, d_pad), (0, n_pad)))


@functools.partial(jax.jit, static_argnames=("tile_n", "steps_per_block",
                                             "sub_tiles", "interpret"))
def stacked_lstm2(params, x, fc=None, *, tile_n: int = 256, steps_per_block: int = 1,
                  sub_tiles: int = 1, interpret: bool = False):
    """2-layer LSTM forward via the fused kernel.

    params: nn/lstm.py layout ({"layers": [{w_ih, w_hh, b_ih, b_hh} x2]}).
    fc: optional {"weight": [H, O], "bias": [O]} fused output projection.
    x: [N, D, T] (the model's native channel-major fold layout —
    fullsubnet_plus.py:254 reshapes straight to it) -> [N, T, H]
    (or [N, T, O] when fc is given).
    """
    l1, l2 = params["layers"]
    n, d, t = x.shape
    hidden = l1["w_hh"].shape[0]
    dtype = x.dtype

    # Shrink the row tile for small folds (e.g. the full-band LSTM of the
    # FullSubNet baseline runs at N = batch) so padding stays bounded.
    tile_n = min(tile_n, max(LANE, -(-n // LANE) * LANE))
    if sub_tiles < 1 or tile_n % sub_tiles:
        # An indivisible sub-tile split would silently skip the remainder
        # rows of every tile (uninitialized output); fall back like the
        # backward's BWD_SUB_TILES guard does.
        sub_tiles = 1

    d_pad = _sublane_pad(d, dtype)
    n_pad = -n % tile_n
    t_pad = -t % steps_per_block
    x_tm = _feature_major(x, d_pad, n_pad)
    if t_pad:
        x_tm = jnp.pad(x_tm, ((0, t_pad), (0, 0), (0, 0)))
    n_total = n + n_pad
    d_total = d + d_pad
    t_total = t + t_pad

    w1x, u1, b1, w2, b2 = _split_weights(params, dtype, d_pad)

    resident = lambda shape: pl.BlockSpec(
        shape, lambda i, s: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    grid = (n_total // tile_n, t_total // steps_per_block)
    in_specs = [
        pl.BlockSpec((steps_per_block, d_total, tile_n), lambda i, s: (s, 0, i),
                     memory_space=pltpu.VMEM),
        resident((d_total, 4 * hidden)),
        resident((hidden, 4 * hidden)),
        resident((1, 4 * hidden)),
        resident((2 * hidden, 4 * hidden)),
        resident((1, 4 * hidden)),
    ]
    args = [x_tm, w1x, u1, b1, w2, b2]
    if fc is not None:
        out_dim = fc["weight"].shape[-1]
        args += [fc["weight"].astype(dtype),
                 fc["bias"].reshape(1, -1).astype(dtype)]
        in_specs += [resident((hidden, out_dim)), resident((1, out_dim))]
        # feature-major out [T, O, N] (O on sublanes — see the kernel)
        out_spec = pl.BlockSpec((steps_per_block, out_dim, tile_n),
                                lambda i, s: (s, 0, i),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((t_total, out_dim, n_total), dtype)
    else:
        out_dim = hidden
        out_spec = pl.BlockSpec((steps_per_block, tile_n, out_dim),
                                lambda i, s: (s, i, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((t_total, n_total, out_dim), dtype)

    out = pl.pallas_call(
        _make_kernel(steps_per_block, sub_tiles, fc is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
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
    if fc is not None:
        return jnp.transpose(out[:t], (2, 0, 1))[:n]  # [T, O, N] -> [N, T, O]
    return jnp.swapaxes(out[:t], 0, 1)[:n]


# ---------------------------------------------------------------------------
# Training: custom-VJP wrapper (see module docstring). The reference trains
# this LSTM through PyTorch autograd (cuDNN backward); here the backward is
# a hand-written reverse-sweep kernel so the training step gets the same
# fused-kernel throughput as inference instead of falling back to lax.scan.
# ---------------------------------------------------------------------------


def _gate_slices(gates, hidden):
    return (
        gates[:, :hidden],
        gates[:, hidden : 2 * hidden],
        gates[:, 2 * hidden : 3 * hidden],
        gates[:, 3 * hidden :],
    )


def _residual_kernel(
    x_ref, w1x_ref, u1_ref, b1_ref, w2_ref, b2_ref, fcw_ref, fcb_ref,
    out_ref, g1_ref, c1o_ref, h1o_ref, g2_ref, c2o_ref, h2o_ref,
    h1, c1, h2, c2,
):
    """Forward sweep that also streams gate activations and h/c to HBM.

    r5: consumes the same feature-sublane-major [T, Dp, N] input blocks as
    the serving kernel (_make_kernel) — with D = 34 on the minor (lane)
    axis XLA padded the per-step x DMA 34 -> 128 lanes and the HBM copy of
    the fold 3.8x (the r4 serving win, previously missing on the training
    side — VERDICT r4 #1). The fused output projection likewise writes
    feature-major [T, O, N] blocks: O = 2 on lanes would pad 2 -> 128 (64x
    write traffic); on sublanes it pads only 2 -> 8."""
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        h1[:] = jnp.zeros_like(h1)
        c1[:] = jnp.zeros_like(c1)
        h2[:] = jnp.zeros_like(h2)
        c2[:] = jnp.zeros_like(c2)

    hidden = h1.shape[-1]
    mm = w1x_ref.dtype

    def cell(gates, c_prev):
        i, f, g, o = _gate_slices(gates, hidden)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c_prev + i * g
        h_new = o * jnp.tanh(c_new)
        return jnp.concatenate([i, f, g, o], axis=-1), h_new, c_new

    gates1 = (
        _tdot(x_ref[0], w1x_ref[:])
        + jnp.dot(h1[:].astype(mm), u1_ref[:],
                  preferred_element_type=jnp.float32)
        + b1_ref[0].astype(jnp.float32)
    )
    acts1, h1_new, c1_new = cell(gates1, c1[:])
    g1_ref[0] = acts1.astype(g1_ref.dtype)
    c1o_ref[0] = c1_new.astype(c1o_ref.dtype)
    h1o_ref[0] = h1_new.astype(h1o_ref.dtype)
    h1[:] = h1_new
    c1[:] = c1_new

    gates2 = (
        jnp.dot(
            jnp.concatenate([h1_new.astype(mm), h2[:].astype(mm)], axis=-1),
            w2_ref[:], preferred_element_type=jnp.float32,
        )
        + b2_ref[0].astype(jnp.float32)
    )
    acts2, h2_new, c2_new = cell(gates2, c2[:])
    g2_ref[0] = acts2.astype(g2_ref.dtype)
    c2o_ref[0] = c2_new.astype(c2o_ref.dtype)
    h2o_ref[0] = h2_new.astype(h2o_ref.dtype)
    h2[:] = h2_new
    c2[:] = c2_new

    # y written transposed ([O, tile]) so the out block is feature-major.
    y = jax.lax.dot_general(
        fcw_ref[:], h2_new.astype(mm),
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + fcb_ref[0].astype(jnp.float32)[:, None]
    out_ref[0] = y.astype(out_ref.dtype)


def _cell_bwd(dh, gates, c, c_prev, dc_carry, at_t0):
    """Single LSTM cell backward (shared by both reverse-sweep kernels).
    `at_t0` masks c_prev to the zero initial state (the shifted block ref
    is clamped to block 0 by its index map)."""
    hidden = dh.shape[-1]
    i, f, g, o = _gate_slices(gates.astype(jnp.float32), hidden)
    tanh_c = jnp.tanh(c.astype(jnp.float32))
    do = dh * tanh_c
    dc = dh * o * (1.0 - tanh_c * tanh_c) + dc_carry
    c_prev = jnp.where(at_t0, 0.0, c_prev.astype(jnp.float32))
    di, dg, df = dc * g, dc * i, dc * c_prev
    dgates = jnp.concatenate(
        [
            di * i * (1.0 - i),
            df * f * (1.0 - f),
            dg * (1.0 - g * g),
            do * o * (1.0 - o),
        ],
        axis=-1,
    )
    return dgates, dc * f


def _make_bwd_kernel(t_steps: int):
    def _kernel(
        dy_ref, g1_ref, c1_ref, c1p_ref, g2_ref, c2_ref, c2p_ref,
        fcwt_ref, w2t_ref, u1t_ref, w1x_ref,
        dg1_ref, dg2_ref, dx_ref,
        dh1, dc1, dh2, dc2,
    ):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _():
            dh1[:] = jnp.zeros_like(dh1)
            dc1[:] = jnp.zeros_like(dc1)
            dh2[:] = jnp.zeros_like(dh2)
            dc2[:] = jnp.zeros_like(dc2)

        hidden = dh1.shape[-1]
        mm = w1x_ref.dtype
        # Grid step s processes timestep t = T-1-s.
        at_t0 = (t_steps - 1 - s) == 0

        # Layer 2 backward (fc backward fused: dh2 += dy @ fcWᵀ; dy arrives
        # feature-major [O, tile], so this is a sublane-contracting dot).
        dh2_t = _tdot(dy_ref[0].astype(mm), fcwt_ref[:]) + dh2[:]
        dgates2, dc2_new = _cell_bwd(
            dh2_t, g2_ref[0], c2_ref[0], c2p_ref[0], dc2[:], at_t0
        )
        dc2[:] = dc2_new
        dg2_ref[0] = dgates2.astype(dg2_ref.dtype)
        # One matmul yields d(h1_t) and d(h2_{t-1}) together: layer 2's step
        # input was [h1_t | h2_{t-1}] @ [W2;U2].
        dinp2 = jnp.dot(
            dgates2.astype(mm), w2t_ref[:], preferred_element_type=jnp.float32
        )  # [tile, 2H]

        # Layer 1 backward. Split weights like the fused path: U₁ᵀ for the
        # dh carry, W₁x-side dot_general for the feature-major dx write
        # (dx as [T, N, 34] would lane-pad 34→128 — the CLAUDE.md rule).
        dh1_t = dinp2[:, :hidden] + dh1[:]
        dh2[:] = dinp2[:, hidden:]
        dgates1, dc1_new = _cell_bwd(
            dh1_t, g1_ref[0], c1_ref[0], c1p_ref[0], dc1[:], at_t0
        )
        dc1[:] = dc1_new
        dg1_mm = dgates1.astype(mm)
        dg1_ref[0] = dgates1.astype(dg1_ref.dtype)
        dh1[:] = jnp.dot(dg1_mm, u1t_ref[:],
                         preferred_element_type=jnp.float32)
        dx_ref[0] = jax.lax.dot_general(
            w1x_ref[:], dg1_mm,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dx_ref.dtype)  # [Dp, tile]

    return _kernel


def _make_bwd_kernel_fused(t_steps: int, d: int, d_total: int,
                           sub_tiles: int = 1):
    """Reverse sweep with the weight gradients ACCUMULATED IN-KERNEL.

    The plain backward streams two [T, N, 4H] dgates tensors to HBM and the
    weight-grad einsums read them back (plus the h sequences) — ~16 GB of
    pure dgates traffic at the batch-36 train shape. Here each timestep's
    dgates go straight into fp32 VMEM accumulators (dWih/dWhh/db per layer,
    ~8 MB total) via transposed MXU matmuls contracting over the row tile,
    and dgates never exist in HBM. Accumulator blocks use constant index
    maps, so Pallas keeps them VMEM-resident across the whole (rows, time)
    grid and writes each back once; partial accumulators from different row
    tiles sum there too (order-free). Padded rows contribute nothing (their
    dy and carries are zero, hence dgates are zero).

    r5 layout port (VERDICT r4 #1): x arrives feature-sublane-major
    ([T, Dp, btile] blocks — its rows ARE the dWih₁ contraction layout, so
    the accumulation is a plain jnp.dot with no in-kernel transpose), dy
    arrives [O, btile] (O = 2 on sublanes instead of lane-padded 64x), and
    dx writes [Dp, btile] blocks via a W₁ᵀ-side dot_general. The combined
    [W₁;U₁]ᵀ matmul splits into U₁ᵀ (dh₁ carry) + W₁ᵀ (dx) to make the
    feature-major dx write possible.

    `sub_tiles` > 1 splits the row tile into independent chains per grid
    step so one chain's VPU cell-backward can overlap another's MXU
    matmuls — the reverse-sweep dependency-chain probe (VERDICT r4 #6).
    """
    def _kernel(
        dy_ref, g1_ref, c1_ref, c1p_ref, g2_ref, c2_ref, c2p_ref,
        x_ref, h1_ref, h1p_ref, h2p_ref,
        fcwt_ref, w2t_ref, u1t_ref, w1x_ref,
        dx_ref, dwih1_ref, dwhh1_ref, db1_ref, dwih2_ref, dwhh2_ref, db2_ref,
        dh1, dc1, dh2, dc2,
    ):
        s = pl.program_id(1)
        first_row_tile = pl.program_id(0) == 0

        @pl.when(s == 0)
        def _():
            dh1[:] = jnp.zeros_like(dh1)
            dc1[:] = jnp.zeros_like(dc1)
            dh2[:] = jnp.zeros_like(dh2)
            dc2[:] = jnp.zeros_like(dc2)

        @pl.when(first_row_tile & (s == 0))
        def _():
            dwih1_ref[:] = jnp.zeros_like(dwih1_ref)
            dwhh1_ref[:] = jnp.zeros_like(dwhh1_ref)
            db1_ref[:] = jnp.zeros_like(db1_ref)
            dwih2_ref[:] = jnp.zeros_like(dwih2_ref)
            dwhh2_ref[:] = jnp.zeros_like(dwhh2_ref)
            db2_ref[:] = jnp.zeros_like(db2_ref)

        hidden = dh1.shape[-1]
        tile = dh1.shape[0]
        sub = tile // sub_tiles
        mm = w1x_ref.dtype
        at_t0 = (t_steps - 1 - s) == 0

        # rows-contracting transposed matmul: [tile, A]ᵀ @ [tile, 4H]
        tdot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        for si in range(sub_tiles):
            rows = pl.ds(si * sub, sub)
            # Layer 2 backward (fc backward fused: dh2 += dyᵀ @ fcWᵀ — dy is
            # feature-major [O, tile], a sublane-contracting dot).
            dh2_t = _tdot(dy_ref[0, :, rows].astype(mm), fcwt_ref[:]) + dh2[rows, :]
            dgates2, dc2_new = _cell_bwd(
                dh2_t, g2_ref[0, rows, :], c2_ref[0, rows, :],
                c2p_ref[0, rows, :], dc2[rows, :], at_t0,
            )
            dc2[rows, :] = dc2_new
            dg2_mm = dgates2.astype(mm)
            dinp2 = jnp.dot(dg2_mm, w2t_ref[:],
                            preferred_element_type=jnp.float32)

            # layer-2 weight grads: inputs were [h1_t | h2_{t-1}]
            h2_prev = jnp.where(at_t0, 0.0,
                                h2p_ref[0, rows, :].astype(jnp.float32))
            dwih2_ref[:] += tdot(h1_ref[0, rows, :].astype(mm), dg2_mm)
            dwhh2_ref[:] += tdot(h2_prev.astype(mm), dg2_mm)
            db2_ref[:] += jnp.sum(dgates2, axis=0, keepdims=True)

            # Layer 1 backward.
            dh1_t = dinp2[:, :hidden] + dh1[rows, :]
            dh2[rows, :] = dinp2[:, hidden:]
            dgates1, dc1_new = _cell_bwd(
                dh1_t, g1_ref[0, rows, :], c1_ref[0, rows, :],
                c1p_ref[0, rows, :], dc1[rows, :], at_t0,
            )
            dc1[rows, :] = dc1_new
            dg1_mm = dgates1.astype(mm)
            dh1[rows, :] = jnp.dot(dg1_mm, u1t_ref[:],
                                   preferred_element_type=jnp.float32)
            # dx feature-major: [Dp, sub] = W₁x [Dp, 4H] · dgates₁ᵀ
            dx_ref[0, :, rows] = jax.lax.dot_general(
                w1x_ref[:], dg1_mm,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dx_ref.dtype)

            # layer-1 weight grads: inputs were [x_t | h1_{t-1}]; the
            # feature-major x block is ALREADY [Dp, rows] — a plain dot.
            h1_prev = jnp.where(at_t0, 0.0,
                                h1p_ref[0, rows, :].astype(jnp.float32))
            dwih1_ref[:] += jnp.dot(x_ref[0, :, rows].astype(mm), dg1_mm,
                                    preferred_element_type=jnp.float32)
            dwhh1_ref[:] += tdot(h1_prev.astype(mm), dg1_mm)
            db1_ref[:] += jnp.sum(dgates1, axis=0, keepdims=True)

    return _kernel


def _eff_tile(n: int, dtype, tile_n: int) -> int:
    # fp32 residual blocks double every buffer; halve the row tile to stay
    # inside the ~16 MB VMEM budget (both fwd and bwd derive the tile with
    # this same rule so the padded row count always agrees).
    if jnp.dtype(dtype) == jnp.float32:
        tile_n = min(tile_n, 128)
    return min(tile_n, max(SUBLANE, -(-n // SUBLANE) * SUBLANE))


def stacked_lstm2_train(params, x, fc, tile_n: int = 256, interpret: bool = False):
    """Differentiable fused 2-layer LSTM + output projection.

    Same primal as `stacked_lstm2(params, x, fc)` (x channel-major
    [N, D, T]); under jax.grad the residual-saving forward and the
    reverse-sweep backward kernels run instead of autodiff-of-scan. fc is
    required (the sub-band model always projects; fullsubnet_plus.py:205 /
    sequence_model.py:113-123).
    """
    return _stacked_lstm2_train(params, x, fc, tile_n, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _stacked_lstm2_train(params, x, fc, tile_n, interpret):
    return stacked_lstm2(params, x, fc, tile_n=tile_n, interpret=interpret)


def _train_fwd(params, x, fc, tile_n, interpret):
    n, d, t = x.shape  # channel-major input, feature-major kernel blocks
    l1, _ = params["layers"]
    hidden = l1["w_hh"].shape[0]
    dtype = x.dtype
    tile = _eff_tile(n, dtype, tile_n)
    d_pad = _sublane_pad(d, dtype)
    n_pad = -n % tile
    x_fm = _feature_major(x, d_pad, n_pad)  # [T, Dp, N]
    n_total, d_total = n + n_pad, d + d_pad
    out_dim = fc["weight"].shape[-1]

    w1x, u1, b1, w2, b2 = _split_weights(params, dtype, d_pad)
    resident = lambda shape: pl.BlockSpec(
        shape, lambda i, s: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    block = lambda width: pl.BlockSpec(
        (1, tile, width), lambda i, s: (s, i, 0), memory_space=pltpu.VMEM
    )
    fm_block = lambda width: pl.BlockSpec(  # feature-major [T, width, N]
        (1, width, tile), lambda i, s: (s, 0, i), memory_space=pltpu.VMEM
    )
    seq_out = lambda width: jax.ShapeDtypeStruct((t, n_total, width), dtype)
    out, g1, c1, h1, g2, c2, h2 = pl.pallas_call(
        _residual_kernel,
        grid=(n_total // tile, t),
        in_specs=[
            fm_block(d_total),
            resident((d_total, 4 * hidden)),
            resident((hidden, 4 * hidden)),
            resident((1, 4 * hidden)),
            resident((2 * hidden, 4 * hidden)),
            resident((1, 4 * hidden)),
            resident((hidden, out_dim)),
            resident((1, out_dim)),
        ],
        out_specs=(
            fm_block(out_dim),
            block(4 * hidden), block(hidden), block(hidden),
            block(4 * hidden), block(hidden), block(hidden),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t, out_dim, n_total), dtype),
            seq_out(4 * hidden), seq_out(hidden), seq_out(hidden),
            seq_out(4 * hidden), seq_out(hidden), seq_out(hidden),
        ),
        scratch_shapes=[pltpu.VMEM((tile, hidden), jnp.float32) for _ in range(4)],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_total * t * (d_total + 3 * hidden + out_dim) * 4 * hidden,
            bytes_accessed=n_total * t * (d_total + 12 * hidden + out_dim)
            * x.dtype.itemsize,
            transcendentals=n_total * t * 10 * hidden,
        ),
        interpret=interpret,
    )(
        x_fm, w1x, u1, b1, w2, b2,
        fc["weight"].astype(dtype), fc["bias"].reshape(1, -1).astype(dtype),
    )
    primal = jnp.transpose(out, (2, 0, 1))[:n]  # [T, O, N] -> [N, T, O]
    return primal, (params, x, fc, g1, c1, h1, g2, c2, h2)


# In-kernel weight-gradient accumulation (see _make_bwd_kernel_fused).
# Trace-time toggle: False restores the dgates-materializing einsum path.
FUSED_WGRAD = True

# Backward row tile for the fused-wgrad sweep. None = the default rule
# (halve the forward tile so the fp32 accumulators fit scoped VMEM —
# measured 17.04 M > 16 M at 256). A trace-time experiment knob: probed
# 192 on-chip (fits VMEM, n_total=4608 divides) — see docs/PERFORMANCE.md.
BWD_ROW_TILE = None

# Independent row chains per backward grid step (the reverse-sweep
# dependency probe, VERDICT r4 #6): >1 splits the row tile so one chain's
# VPU cell-backward overlaps another's MXU matmuls. Trace-time knob;
# measured on-chip in scripts/exp_bwd_interleave.py — see
# docs/PERFORMANCE.md for the verdict.
BWD_SUB_TILES = 1


def _train_bwd(tile_n, interpret, residuals, dy):
    params, x, fc, g1, c1, h1, g2, c2, h2 = residuals
    n, d, t = x.shape  # channel-major input, feature-major kernel blocks
    l1, l2 = params["layers"]
    hidden = l1["w_hh"].shape[0]
    dtype = x.dtype
    tile = _eff_tile(n, dtype, tile_n)
    d_pad = _sublane_pad(d, dtype)
    n_pad = -n % tile
    x_fm = _feature_major(x, d_pad, n_pad)  # [T, Dp, N]
    n_total, d_total = n + n_pad, d + d_pad
    out_dim = fc["weight"].shape[-1]
    # dy feature-major [T, O, N]: O = 2 on lanes would physically pad the
    # HBM array (and every per-step block DMA) 2 -> 128.
    dy_fm = jnp.pad(
        jnp.transpose(dy.astype(dtype), (1, 2, 0)), ((0, 0), (0, 0), (0, n_pad))
    )

    w1x, u1, _, w2, _ = _split_weights(params, dtype, d_pad)
    fcwt = jnp.swapaxes(fc["weight"].astype(dtype), 0, 1)  # [O, H]
    u1t = jnp.swapaxes(u1, 0, 1)  # [4H, H]
    w2t = jnp.swapaxes(w2, 0, 1)  # [4H, 2H]

    resident = lambda shape: pl.BlockSpec(
        shape, lambda i, s: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    seq_out = lambda width: jax.ShapeDtypeStruct((t, n_total, width), dtype)
    f32 = jnp.float32
    ein = functools.partial(jnp.einsum, preferred_element_type=f32)
    cast = lambda g, ref: g.astype(ref.dtype)

    if FUSED_WGRAD:
        # The fp32 accumulators (~8 MB) plus the standard double-buffered
        # blocks exceed the 16 MB scoped-VMEM budget at tile 256 (measured:
        # 17.04 M). Halve the bwd row tile — padding keeps the fwd tile, so
        # the residual shapes are untouched and btile always divides
        # n_total.
        btile = tile if tile <= 128 else tile // 2
        if BWD_ROW_TILE and n_total % BWD_ROW_TILE == 0:
            btile = BWD_ROW_TILE
        sub_tiles = (BWD_SUB_TILES
                     if BWD_SUB_TILES >= 1 and btile % BWD_SUB_TILES == 0
                     else 1)
        rev_b = lambda width: pl.BlockSpec(
            (1, btile, width), lambda i, s: (t - 1 - s, i, 0),
            memory_space=pltpu.VMEM,
        )
        prev_b = lambda width: pl.BlockSpec(
            (1, btile, width),
            lambda i, s: (jnp.maximum(t - 2 - s, 0), i, 0),
            memory_space=pltpu.VMEM,
        )
        rev_fm = lambda width: pl.BlockSpec(  # feature-major [T, width, N]
            (1, width, btile), lambda i, s: (t - 1 - s, 0, i),
            memory_space=pltpu.VMEM,
        )
        facc = lambda shape: jax.ShapeDtypeStruct(shape, f32)
        dx_fm, dwih1, dwhh1, db1, dwih2, dwhh2, db2 = pl.pallas_call(
            _make_bwd_kernel_fused(t, d, d_total, sub_tiles),
            grid=(n_total // btile, t),
            in_specs=[
                rev_fm(out_dim),
                rev_b(4 * hidden), rev_b(hidden), prev_b(hidden),
                rev_b(4 * hidden), rev_b(hidden), prev_b(hidden),
                rev_fm(d_total), rev_b(hidden), prev_b(hidden), prev_b(hidden),
                resident((out_dim, hidden)),
                resident((4 * hidden, 2 * hidden)),
                resident((4 * hidden, hidden)),
                resident((d_total, 4 * hidden)),
            ],
            out_specs=(
                rev_fm(d_total),
                resident((d_total, 4 * hidden)),
                resident((hidden, 4 * hidden)),
                resident((1, 4 * hidden)),
                resident((hidden, 4 * hidden)),
                resident((hidden, 4 * hidden)),
                resident((1, 4 * hidden)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((t, d_total, n_total), dtype),
                facc((d_total, 4 * hidden)),
                facc((hidden, 4 * hidden)),
                facc((1, 4 * hidden)),
                facc((hidden, 4 * hidden)),
                facc((hidden, 4 * hidden)),
                facc((1, 4 * hidden)),
            ),
            scratch_shapes=[
                pltpu.VMEM((btile, hidden), jnp.float32) for _ in range(4)
            ],
            cost_estimate=pl.CostEstimate(
                # step matmuls + the transposed weight-grad accumulations
                flops=2 * n_total * t
                * (2 * (3 * hidden + d_total) + out_dim) * 4 * hidden,
                bytes_accessed=n_total * t
                * (18 * hidden + 2 * d_total + out_dim) * x.dtype.itemsize,
                transcendentals=n_total * t * 2 * hidden,
            ),
            interpret=interpret,
        )(dy_fm, g1, c1, c1, g2, c2, c2, x_fm, h1, h1, h2,
          fcwt, w2t, u1t, w1x)
        db1, db2 = db1[0], db2[0]
        dparams = {
            "layers": [
                {
                    "w_ih": cast(dwih1[:d], l1["w_ih"]),  # drop sublane-pad rows
                    "w_hh": cast(dwhh1, l1["w_hh"]),
                    "b_ih": cast(db1, l1["b_ih"]),
                    "b_hh": cast(db1, l1["b_hh"]),
                },
                {
                    "w_ih": cast(dwih2, l2["w_ih"]),
                    "w_hh": cast(dwhh2, l2["w_hh"]),
                    "b_ih": cast(db2, l2["b_ih"]),
                    "b_hh": cast(db2, l2["b_hh"]),
                },
            ]
        }
    else:
        rev = lambda width: pl.BlockSpec(
            (1, tile, width), lambda i, s: (t - 1 - s, i, 0),
            memory_space=pltpu.VMEM,
        )
        prev = lambda width: pl.BlockSpec(
            (1, tile, width),
            lambda i, s: (jnp.maximum(t - 2 - s, 0), i, 0),
            memory_space=pltpu.VMEM,
        )
        rev_fm_t = lambda width: pl.BlockSpec(
            (1, width, tile), lambda i, s: (t - 1 - s, 0, i),
            memory_space=pltpu.VMEM,
        )
        dg1, dg2, dx_fm = pl.pallas_call(
            _make_bwd_kernel(t),
            grid=(n_total // tile, t),
            in_specs=[
                rev_fm_t(out_dim),
                rev(4 * hidden), rev(hidden), prev(hidden),
                rev(4 * hidden), rev(hidden), prev(hidden),
                resident((out_dim, hidden)),
                resident((4 * hidden, 2 * hidden)),
                resident((4 * hidden, hidden)),
                resident((d_total, 4 * hidden)),
            ],
            out_specs=(rev(4 * hidden), rev(4 * hidden), rev_fm_t(d_total)),
            out_shape=(seq_out(4 * hidden), seq_out(4 * hidden),
                       jax.ShapeDtypeStruct((t, d_total, n_total), dtype)),
            scratch_shapes=[
                pltpu.VMEM((tile, hidden), jnp.float32) for _ in range(4)
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * n_total * t * (3 * hidden + d_total + out_dim)
                * 4 * hidden,
                bytes_accessed=n_total * t * (20 * hidden + d_total + out_dim)
                * x.dtype.itemsize,
                transcendentals=n_total * t * 2 * hidden,
            ),
            interpret=interpret,
        )(dy_fm, g1, c1, c1, g2, c2, c2, fcwt, w2t, u1t, w1x)

        # Weight gradients: whole-sequence contractions, no recurrence —
        # plain XLA einsums on the MXU. h_prev sequences are the saved h
        # shifted by one step (zero initial state). Padded rows contribute
        # nothing (their dgates/dy are zero).
        h1p = jnp.concatenate([jnp.zeros_like(h1[:1]), h1[:-1]], axis=0)
        h2p = jnp.concatenate([jnp.zeros_like(h2[:1]), h2[:-1]], axis=0)
        db1 = ein("tng->g", dg1)
        db2 = ein("tng->g", dg2)
        dparams = {
            "layers": [
                {
                    "w_ih": cast(ein("tdn,tng->dg", x_fm, dg1)[:d], l1["w_ih"]),
                    "w_hh": cast(ein("tnh,tng->hg", h1p, dg1), l1["w_hh"]),
                    "b_ih": cast(db1, l1["b_ih"]),
                    "b_hh": cast(db1, l1["b_hh"]),
                },
                {
                    "w_ih": cast(ein("tnh,tng->hg", h1, dg2), l2["w_ih"]),
                    "w_hh": cast(ein("tnh,tng->hg", h2p, dg2), l2["w_hh"]),
                    "b_ih": cast(db2, l2["b_ih"]),
                    "b_hh": cast(db2, l2["b_hh"]),
                },
            ]
        }
    # [T, Dp, N] -> [N, D, T], dropping the sublane-pad feature rows
    # (both backward paths write dx feature-major).
    dx = cast(jnp.transpose(dx_fm, (2, 1, 0))[:n, :d], x)
    dfc = {
        "weight": cast(ein("tnh,ton->ho", h2, dy_fm), fc["weight"]),
        "bias": cast(ein("ton->o", dy_fm), fc["bias"]),
    }
    return dparams, dx, dfc


_stacked_lstm2_train.defvjp(_train_fwd, _train_bwd)


def _fold_sharded(kernel, params, x, fc, axes, tile_n: int, interpret: bool):
    """Run `kernel(params, x, fc, tile_n, interpret)` with the fold's leading
    dim sharded on mesh `axes`.

    pallas_call is opaque to GSPMD, so running the kernel on a pjit-sharded
    fold would otherwise gather the whole (B·F) batch onto every chip. The
    fold rows are fully independent sequences (fullsubnet_plus.py:198-205),
    so shard_map over the row axis needs NO collectives in the forward;
    the VJP's replicated weight/fc gradients are psum'd across shards by
    shard_map's transpose automatically. Falls back to the unsharded kernel
    when there is no ambient mesh with the named axes (e.g. single chip) or
    the fold does not divide across them.
    """
    axes = tuple(axes) if axes else ()
    mesh = jax.sharding.get_abstract_mesh()
    if (
        not axes
        or mesh is None
        or getattr(mesh, "empty", True)
        or any(a not in mesh.shape for a in axes)
    ):
        return kernel(params, x, fc, tile_n, interpret)
    n_shards = 1
    for a in axes:
        n_shards *= mesh.shape[a]
    if n_shards == 1 or x.shape[0] % n_shards != 0:
        if n_shards > 1:
            # An indivisible fold cannot shard_map: the kernel runs
            # UNSHARDED, i.e. every chip gathers the whole (B·F) fold and
            # sweeps all rows — the exact perf/memory cliff this wrapper
            # exists to prevent. Surface it instead of silently degrading
            # (pad the batch so B·F divides the mesh to fix).
            import warnings

            warnings.warn(
                f"fold of {x.shape[0]} rows does not divide the "
                f"{n_shards}-way mesh {axes}; running the LSTM kernel "
                "UNSHARDED (full fold gathered onto every chip)",
                stacklevel=3,
            )
        return kernel(params, x, fc, tile_n, interpret)
    from jax.sharding import PartitionSpec as P

    spec = P(axes, None, None)
    fn = jax.shard_map(
        lambda p, xx, f: kernel(p, xx, f, tile_n, interpret),
        in_specs=(P(), spec, P()),
        out_specs=spec,
        # pallas_call outputs carry no varying-mesh-axes annotation; skip the
        # vma check (the weight-grad psum on the transpose still happens).
        check_vma=False,
    )
    return fn(params, x, fc)


def stacked_lstm2_train_sharded(params, x, fc, axes, tile_n: int = 256,
                                interpret: bool = False):
    """Differentiable fused LSTM over a mesh-sharded fold (see _fold_sharded)."""
    return _fold_sharded(stacked_lstm2_train, params, x, fc, axes, tile_n, interpret)


# ---------------------------------------------------------------------------
# Quantized serving kernel (int8 recurrent path). A capability beyond the
# reference (which serves fp32/AMP only): the recurrent h@U products run on
# the MXU at int8 rate. Opt-in via Enhancer(compute_dtype="int8") /
# `bench.py --dtype int8`; NOT the parity path.
#
# Design (measured on v5e at the model fold shape N=16448, T=630):
#   * Only the hidden-state products are quantized: h is bounded in (-1, 1)
#     by o·tanh(c), so a fixed symmetric scale of 127 loses ~7 effective
#     bits — comparable to bf16's 8-bit mantissa. h is stored int8 in VMEM
#     and consumed directly by the int8 MXU dots.
#   * U₁ and [W₂;U₂] are quantized per-output-column (symmetric int8); the
#     combined (1/127 · col_scale) dequant multiplies the int32 accumulator.
#   * The layer-1 INPUT product x@W₁ stays in the float dtype: x is the
#     laplace-normed sub-band feature with unbounded outliers, and a static
#     int8 scale there would clip them. The split costs one extra (narrow,
#     K=34) MXU issue per step.
#   * The fused output projection stays float and consumes the UN-quantized
#     fp32 h₂ of the current step.
#   * Cell math, cell state c, biases: fp32, identical to the float kernel.
#
# Measured: 248 ms vs 281 ms bf16 at the serving fold shape (-12 %); output
# SNR vs the fp32 scan path 41.6 dB (bf16 kernel: 52.3 dB) at torch-default
# init scales. Forward-only: custom-VJP training stays bf16/fp32.
# ---------------------------------------------------------------------------

H_QUANT_SCALE = 127.0


def _quantize_per_column(w):
    """fp weight [K, M] -> (int8 weight, fp32 per-column scale [1, M])."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale.astype(jnp.float32).reshape(1, -1)


def prepare_quantized_lstm(params):
    """BUILD-TIME int8 quantization of the recurrent weights (r5, VERDICT
    r4 #3): numpy-only (no device dispatch at engine construction —
    CLAUDE.md), producing the exact arrays the per-call path would compute
    (same fp32 math, round-half-even, the 1/H_QUANT_SCALE dequant fold
    included in the scales). Attach the result as params["int8_prepared"]
    and `stacked_lstm2_quantized` skips its in-graph quantization — at the
    streaming fold shape the per-call quantize/pad chain is serial latency
    ahead of the kernel that the big batch-96 fold amortizes but a
    single-stream chunk does not (docs/PERFORMANCE.md int8 streaming
    probe)."""
    import numpy as np

    l1, l2 = params["layers"]

    def q(w):
        w = np.asarray(w).astype(np.float32)
        amax = np.abs(w).max(axis=0)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        return wq, (scale / H_QUANT_SCALE).reshape(1, -1)

    u1q, s1 = q(l1["w_hh"])
    w2q, s2 = q(np.concatenate(
        [np.asarray(l2["w_ih"]).astype(np.float32),
         np.asarray(l2["w_hh"]).astype(np.float32)], axis=0
    ))
    return {"u1q": u1q, "s1": s1, "w2q": w2q, "s2": s2}


def _make_quant_kernel():
    def _kernel(x_ref, w1x_ref, u1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                fcw_ref, fcb_ref, out_ref, h1, c1, h2, c2):
        t = pl.program_id(1)

        @pl.when(t == 0)
        def _():
            h1[:] = jnp.zeros_like(h1)  # int8 hidden-state storage
            c1[:] = jnp.zeros_like(c1)
            h2[:] = jnp.zeros_like(h2)
            c2[:] = jnp.zeros_like(c2)

        hidden = c1.shape[-1]
        f32 = jnp.float32

        def cell(gates, c_prev):
            i = jax.nn.sigmoid(gates[:, :hidden])
            f = jax.nn.sigmoid(gates[:, hidden : 2 * hidden])
            g = jnp.tanh(gates[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(gates[:, 3 * hidden :])
            c_new = f * c_prev + i * g
            return o * jnp.tanh(c_new), c_new

        def quant_h(h):
            return jnp.clip(jnp.round(h * H_QUANT_SCALE), -127, 127).astype(jnp.int8)

        gates1 = (
            _tdot(x_ref[0], w1x_ref[:])
            + jnp.dot(h1[:], u1_ref[:], preferred_element_type=jnp.int32).astype(f32)
            * s1_ref[0].astype(f32)
            + b1_ref[0].astype(f32)
        )
        h1_new, c1_new = cell(gates1, c1[:])
        h1q = quant_h(h1_new)
        h1[:] = h1q
        c1[:] = c1_new

        gates2 = (
            jnp.dot(
                jnp.concatenate([h1q, h2[:]], axis=-1), w2_ref[:],
                preferred_element_type=jnp.int32,
            ).astype(f32)
            * s2_ref[0].astype(f32)
            + b2_ref[0].astype(f32)
        )
        h2_new, c2_new = cell(gates2, c2[:])
        h2[:] = quant_h(h2_new)
        c2[:] = c2_new

        # y written transposed ([O, tile]): feature-major out block, O = 2
        # on sublanes instead of lane-padded 2 -> 128 (see _make_kernel).
        y = jax.lax.dot_general(
            fcw_ref[:], h2_new.astype(fcw_ref.dtype),
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=f32,
        ) + fcb_ref[0].astype(f32)[:, None]
        out_ref[0] = y.astype(out_ref.dtype)

    return _kernel


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def stacked_lstm2_quantized(params, x, fc, tile_n: int = 256,
                            interpret: bool = False):
    """int8-recurrent 2-layer LSTM + fused output projection (serving only).

    Same signature/contract as stacked_lstm2(params, x, fc) — x arrives
    channel-major [N, D, T] and runs through the feature-sublane-major
    [T, Dp, N] block layout (see _feature_major). Weights are quantized per
    call (trivial vs the sweep). Forward-only — do not differentiate
    through it.
    """
    l1, l2 = params["layers"]
    n, d, t = x.shape
    hidden = l1["w_hh"].shape[0]
    dtype = x.dtype
    tile_n = min(tile_n, max(LANE, -(-n // LANE) * LANE))
    n_pad = -n % tile_n
    d_pad = _sublane_pad(d, dtype)
    d_total = d + d_pad
    x_tm = _feature_major(x, d_pad, n_pad)
    n_total = n + n_pad

    w1x = jnp.pad(l1["w_ih"].astype(dtype), ((0, d_pad), (0, 0)))
    b1 = (l1["b_ih"] + l1["b_hh"]).reshape(1, -1).astype(jnp.float32)
    b2 = (l2["b_ih"] + l2["b_hh"]).reshape(1, -1).astype(jnp.float32)
    prepared = params.get("int8_prepared")
    if prepared is not None:
        # Build-time quantization (prepare_quantized_lstm): the int8
        # weights and folded scales arrive as plain kernel inputs — no
        # serial quantize chain ahead of the sweep.
        u1q, s1 = prepared["u1q"], prepared["s1"]
        w2q, s2 = prepared["w2q"], prepared["s2"]
    else:
        u1q, s1 = _quantize_per_column(l1["w_hh"])
        w2q, s2 = _quantize_per_column(
            jnp.concatenate([l2["w_ih"], l2["w_hh"]], axis=0)
        )
        s1 = s1 / H_QUANT_SCALE  # fold the h scale into the dequant multiplier
        s2 = s2 / H_QUANT_SCALE
    out_dim = fc["weight"].shape[-1]

    resident = lambda shape: pl.BlockSpec(
        shape, lambda i, s: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _make_quant_kernel(),
        grid=(n_total // tile_n, t),
        in_specs=[
            pl.BlockSpec((1, d_total, tile_n), lambda i, s: (s, 0, i),
                         memory_space=pltpu.VMEM),
            resident((d_total, 4 * hidden)),
            resident((hidden, 4 * hidden)),
            resident((1, 4 * hidden)),
            resident((1, 4 * hidden)),
            resident((2 * hidden, 4 * hidden)),
            resident((1, 4 * hidden)),
            resident((1, 4 * hidden)),
            resident((hidden, out_dim)),
            resident((1, out_dim)),
        ],
        out_specs=pl.BlockSpec((1, out_dim, tile_n), lambda i, s: (s, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t, out_dim, n_total), dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_n, hidden), jnp.int8),
            pltpu.VMEM((tile_n, hidden), jnp.float32),
            pltpu.VMEM((tile_n, hidden), jnp.int8),
            pltpu.VMEM((tile_n, hidden), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_total * t * (d + 3 * hidden + out_dim) * 4 * hidden,
            bytes_accessed=n_total * t * (d + out_dim) * x.dtype.itemsize,
            transcendentals=n_total * t * 10 * hidden,
        ),
        interpret=interpret,
    )(x_tm, w1x, u1q, s1, b1, w2q, s2, b2,
      fc["weight"].astype(dtype), fc["bias"].reshape(1, -1).astype(jnp.float32))
    return jnp.transpose(out[:t], (2, 0, 1))[:n]  # [T, O, N] -> [N, T, O]


def stacked_lstm2_quantized_sharded(params, x, fc, axes, tile_n: int = 256,
                                    interpret: bool = False):
    """Quantized serving kernel over a mesh-sharded fold (see _fold_sharded)."""
    return _fold_sharded(
        stacked_lstm2_quantized, params, x, fc, axes, tile_n, interpret
    )
