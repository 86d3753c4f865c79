"""Multi-layer LSTM / GRU as lax.scan recurrences (torch-weight-compatible).

The sub-band LSTM is the hottest op in FullSubNet+ — a 2-layer LSTM(34→384)
over a folded batch of B·257 sequences (fullsubnet_plus.py:198-205). The
TPU-first formulation here:

  * The layer-input projection ``x @ W_ih + b`` is hoisted out of the scan and
    done as ONE [B*T, D] x [D, 4H] matmul for the whole sequence — that's the
    bulk of the FLOPs and it runs on the MXU at full tilt.
  * The scan carries only the [B, H] state GEMM (``h @ W_hh``), which is also
    MXU work because the folded batch is huge (B·257 or B·128).
  * All layers are scanned in sequence; `fused_stacked_cell` in
    ops/lstm_pallas.py replaces this loop with a single Pallas kernel when the
    shapes allow.

Weight layout: ``w_ih [D_in, 4H]`` / ``w_hh [H, 4H]`` (transposed from torch's
``weight_ih_l{k} [4H, D]``), gate order i, f, g, o — identical to
torch.nn.LSTM so the released checkpoint converts by transposition alone.
GRU keeps separate b_ih / b_hh because of the reset-gated candidate term,
gate order r, z, n (torch.nn.GRU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fullsubnet_plus_tpu.nn.init import uniform_fan_in


def lstm_init(key, input_size: int, hidden_size: int, num_layers: int, dtype=jnp.float32,
              *, bidirectional: bool = False):
    """torch-default U(-1/sqrt(H), 1/sqrt(H)) init for every tensor.

    `bidirectional` sizes layer-1+ inputs at 2H: in torch's bidirectional=True
    every layer above the first consumes the concat of both directions
    (this init builds ONE direction's stack; bilstm_apply pairs two).
    """
    layers = []
    for layer in range(num_layers):
        d_in = input_size if layer == 0 else hidden_size * (2 if bidirectional else 1)
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        layers.append(
            {
                "w_ih": uniform_fan_in(k1, (d_in, 4 * hidden_size), hidden_size, dtype),
                "w_hh": uniform_fan_in(k2, (hidden_size, 4 * hidden_size), hidden_size, dtype),
                "b_ih": uniform_fan_in(k3, (4 * hidden_size,), hidden_size, dtype),
                "b_hh": uniform_fan_in(k4, (4 * hidden_size,), hidden_size, dtype),
            }
        )
    return {"layers": layers}


def _lstm_layer(params, x: jnp.ndarray, h0=None, c0=None):
    """One LSTM layer. x: [B, T, D] -> [B, T, H]."""
    batch, _, _ = x.shape
    hidden = params["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((batch, hidden), x.dtype)
    if c0 is None:
        c0 = jnp.zeros((batch, hidden), x.dtype)

    # Hoisted input projection: one big MXU matmul over the whole sequence.
    xw = x @ params["w_ih"] + (params["b_ih"] + params["b_hh"])  # [B, T, 4H]
    w_hh = params["w_hh"]

    def step(carry, xw_t):
        h, c = carry
        gates = xw_t + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    (h_n, c_n), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xw, 0, 1))
    return jnp.swapaxes(ys, 0, 1), (h_n, c_n)


def lstm_apply(params, x: jnp.ndarray, state=None):
    """Stacked LSTM. x: [B, T, D] -> ([B, T, H], final (h, c) per layer)."""
    finals = []
    for layer, p in enumerate(params["layers"]):
        h0c0 = (None, None) if state is None else state[layer]
        x, hc = _lstm_layer(p, x, *h0c0)
        finals.append(hc)
    return x, finals


def bilstm_apply(params_fwd, params_bwd, x: jnp.ndarray):
    """Bidirectional stacked LSTM (for config surface parity; not the hot path).

    Layer l consumes the concat of both directions of layer l-1, like torch's
    bidirectional=True.
    """
    for p_f, p_b in zip(params_fwd["layers"], params_bwd["layers"]):
        fwd, _ = _lstm_layer(p_f, x)
        bwd, _ = _lstm_layer(p_b, jnp.flip(x, axis=1))
        x = jnp.concatenate([fwd, jnp.flip(bwd, axis=1)], axis=-1)
    return x


def gru_init(key, input_size: int, hidden_size: int, num_layers: int, dtype=jnp.float32,
             *, bidirectional: bool = False):
    """torch-default init; `bidirectional` sizes layer-1+ inputs at 2H (one
    direction's stack — bigru_apply pairs two, like lstm_init/bilstm_apply)."""
    layers = []
    for layer in range(num_layers):
        d_in = input_size if layer == 0 else hidden_size * (2 if bidirectional else 1)
        k1, k2, k3, k4, key = jax.random.split(key, 5)
        layers.append(
            {
                "w_ih": uniform_fan_in(k1, (d_in, 3 * hidden_size), hidden_size, dtype),
                "w_hh": uniform_fan_in(k2, (hidden_size, 3 * hidden_size), hidden_size, dtype),
                "b_ih": uniform_fan_in(k3, (3 * hidden_size,), hidden_size, dtype),
                "b_hh": uniform_fan_in(k4, (3 * hidden_size,), hidden_size, dtype),
            }
        )
    return {"layers": layers}


def _gru_layer(params, x: jnp.ndarray, h0=None):
    """One GRU layer, torch gate order r, z, n. x: [B, T, D] -> [B, T, H]."""
    batch, _, _ = x.shape
    hidden = params["w_hh"].shape[0]
    if h0 is None:
        h0 = jnp.zeros((batch, hidden), x.dtype)
    xw = x @ params["w_ih"] + params["b_ih"]  # [B, T, 3H]
    w_hh, b_hh = params["w_hh"], params["b_hh"]

    def step(h, xw_t):
        hw = h @ w_hh + b_hh
        xr, xz, xn = jnp.split(xw_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hw, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h = (1.0 - z) * n + z * h
        return h, h

    h_n, ys = jax.lax.scan(step, h0, jnp.swapaxes(xw, 0, 1))
    return jnp.swapaxes(ys, 0, 1), h_n


def bigru_apply(params_fwd, params_bwd, x: jnp.ndarray):
    """Bidirectional stacked GRU (torch bidirectional=True semantics: layer l
    consumes the 2H concat of both directions of layer l-1). Config-surface
    parity with the reference SequenceModel (sequence_model.py:20-45); not a
    hot path in any shipped config."""
    for p_f, p_b in zip(params_fwd["layers"], params_bwd["layers"]):
        fwd, _ = _gru_layer(p_f, x)
        bwd, _ = _gru_layer(p_b, jnp.flip(x, axis=1))
        x = jnp.concatenate([fwd, jnp.flip(bwd, axis=1)], axis=-1)
    return x


def gru_apply(params, x: jnp.ndarray, state=None):
    finals = []
    for layer, p in enumerate(params["layers"]):
        h0 = None if state is None else state[layer]
        x, h_n = _gru_layer(p, x, h0)
        finals.append(h_n)
    return x, finals
