"""SequenceModel: configurable LSTM / GRU / TCN backbone + output projection.

Functional equivalent of the reference SequenceModel
(audio_zen/model/module/sequence_model.py:5-123): a recurrent (LSTM/GRU,
batch_first, optionally bidirectional) or TCN stack over [B, F, T], followed
by a Linear output layer and an optional Tanh/ReLU/ReLU6 activation.

Faithfully reproduces the reference quirk that the TCN path ignores
`hidden_size`/`num_layers` (TCNBlock default hidden=512, dilations
(1,2,5,9)x2 — SURVEY.md §2.1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fullsubnet_plus_tpu.nn.init import linear_init
from fullsubnet_plus_tpu.nn.lstm import (
    lstm_init,
    lstm_apply,
    bilstm_apply,
    bigru_apply,
    gru_init,
    gru_apply,
)
from fullsubnet_plus_tpu.nn.tcn import tcn_stack_init, tcn_stack_apply

_ACTIVATIONS = {
    "Tanh": jnp.tanh,
    "ReLU": jax.nn.relu,
    "ReLU6": lambda x: jnp.clip(x, 0.0, 6.0),
}

# Tests set this to route the `fast` LSTM path through the Pallas kernel in
# interpret mode on CPU (read at trace time).
FORCE_PALLAS_INTERPRET = False


def _tpu_backend() -> bool:
    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return dev.platform in ("tpu", "axon") or "TPU" in (dev.device_kind or "")


def sequence_model_init(
    key,
    input_size: int,
    output_size: int,
    hidden_size: int,
    num_layers: int,
    bidirectional: bool,
    sequence_model: str = "GRU",
    dtype=jnp.float32,
):
    k_seq, k_fc = jax.random.split(key)
    if sequence_model == "LSTM":
        if bidirectional:
            k_f, k_b = jax.random.split(k_seq)
            seq = {
                "fwd": lstm_init(k_f, input_size, hidden_size, num_layers, dtype,
                                 bidirectional=True),
                "bwd": lstm_init(k_b, input_size, hidden_size, num_layers, dtype,
                                 bidirectional=True),
            }
            fc_in = hidden_size * 2
        else:
            seq = lstm_init(k_seq, input_size, hidden_size, num_layers, dtype)
            fc_in = hidden_size
    elif sequence_model == "GRU":
        if bidirectional:
            k_f, k_b = jax.random.split(k_seq)
            seq = {
                "fwd": gru_init(k_f, input_size, hidden_size, num_layers, dtype,
                                bidirectional=True),
                "bwd": gru_init(k_b, input_size, hidden_size, num_layers, dtype,
                                bidirectional=True),
            }
            fc_in = hidden_size * 2
        else:
            seq = gru_init(k_seq, input_size, hidden_size, num_layers, dtype)
            fc_in = hidden_size
    elif sequence_model == "TCN":
        # hidden_size/num_layers intentionally unused (reference behavior).
        seq = tcn_stack_init(k_seq, input_size, hidden_channel=512, dtype=dtype)
        fc_in = input_size
    elif sequence_model == "TCN-subband":
        seq = tcn_stack_init(
            k_seq, input_size, hidden_channel=hidden_size, dtype=dtype,
            subband_variant=True,
        )
        fc_in = input_size
    else:
        raise NotImplementedError(f"Not implemented {sequence_model}")
    return {"seq": seq, "fc_output_layer": linear_init(k_fc, fc_in, output_size, dtype)}


def sequence_model_apply(
    params,
    x: jnp.ndarray,
    *,
    sequence_model: str,
    bidirectional: bool = False,
    output_activate_function: str | bool | None = None,
    fast: bool = False,
    fold_axes: tuple | None = None,
    quantized: bool = False,
    valid=None,
) -> jnp.ndarray:
    """x: [B, F, T] -> [B, output_size, T] (reference forward, :98-123).

    `fast=True` routes 2-layer unidirectional LSTMs through the fused Pallas
    kernel on TPU backends (ops/lstm_pallas.py) — for inference AND training:
    the kernel carries a custom VJP (reverse-sweep backward kernel), so
    jax.grad through this path stays fused. CPU keeps the lax.scan path.
    `fold_axes` names the mesh axes the leading (folded B·F) dim is sharded
    over; the kernel then runs under shard_map so each chip sweeps only its
    own fold rows. `quantized=True` (serving only, forward-only) runs the
    int8-recurrent kernel instead — see ops/lstm_pallas.py for the scheme
    and measured speed/SNR. `valid` ([B] frame counts) gives the TCN path
    masked GroupNorm statistics for bucket-padded batches; the recurrent
    paths are causal and need no masking.
    """
    assert x.ndim == 3
    if sequence_model in ("TCN", "TCN-subband"):
        y = tcn_stack_apply(params["seq"], x, valid=valid)  # [B, F, T]
        o = jnp.swapaxes(y, 1, 2) @ params["fc_output_layer"]["weight"] + params[
            "fc_output_layer"
        ]["bias"]  # [B, T, O]
    else:
        xt = jnp.swapaxes(x, 1, 2)  # [B, T, F]
        if sequence_model == "LSTM":
            if bidirectional:
                o = bilstm_apply(params["seq"]["fwd"], params["seq"]["bwd"], xt)
            elif (
                fast
                and len(params["seq"]["layers"]) == 2
                and (_tpu_backend() or FORCE_PALLAS_INTERPRET)
            ):
                from fullsubnet_plus_tpu.ops.lstm_pallas import (
                    stacked_lstm2_quantized,
                    stacked_lstm2_quantized_sharded,
                    stacked_lstm2_train,
                    stacked_lstm2_train_sharded,
                )

                # Output Linear fused into the kernel: avoids materializing
                # the [N, T, H] hidden sequence in HBM (docs/PERFORMANCE.md).
                # The _train wrapper has the same primal; under jax.grad its
                # custom VJP keeps the backward fused too. The quantized
                # kernel is the int8-recurrent serving path (forward-only).
                interp = FORCE_PALLAS_INTERPRET
                # tile 512 measures ~2 % faster for the int8 kernel (its
                # halved MXU passes leave more latency to hide); bf16/fp32
                # are flat at 512 and keep 256 (docs/PERFORMANCE.md).
                plain, sharded, tile = (
                    (stacked_lstm2_quantized, stacked_lstm2_quantized_sharded, 512)
                    if quantized
                    else (stacked_lstm2_train, stacked_lstm2_train_sharded, 256)
                )
                # The kernels take the model's native channel-major [N, D, T]
                # fold directly — no [N, T, D] transpose in between (the old
                # lane-minor D=34 layout physically padded to 128 lanes in
                # HBM, 3.8x; see ops/lstm_pallas.py _feature_major).
                if fold_axes:
                    o = sharded(
                        params["seq"], x, params["fc_output_layer"], fold_axes,
                        tile, interp,
                    )
                else:
                    o = plain(
                        params["seq"], x, params["fc_output_layer"], tile, interp
                    )
                if output_activate_function:
                    o = _ACTIVATIONS[output_activate_function](o)
                return jnp.swapaxes(o, 1, 2)
            else:
                o, _ = lstm_apply(params["seq"], xt)
        elif bidirectional:
            o = bigru_apply(params["seq"]["fwd"], params["seq"]["bwd"], xt)
        else:
            o, _ = gru_apply(params["seq"], xt)
        o = o @ params["fc_output_layer"]["weight"] + params["fc_output_layer"]["bias"]
    if output_activate_function:
        o = _ACTIVATIONS[output_activate_function](o)
    return jnp.swapaxes(o, 1, 2)  # [B, O, T]


# ---------------------------------------------------------------------------
# Complex-valued sequence model (reference Complex_SequenceModel,
# sequence_model.py:126-243; unused by shipped configs). Two real recurrent
# nets model the real/imag parts with cross terms:
#   real_out = real_net(re) - imag_net(im);  imag_out = real_net(im) + imag_net(re)
# ---------------------------------------------------------------------------

def complex_sequence_model_init(
    key, input_size, output_size, hidden_size, num_layers,
    bidirectional=False, sequence_model="LSTM", dtype=jnp.float32,
):
    assert not bidirectional, "bidirectional complex model unused by configs"
    k1, k2, k3, k4 = jax.random.split(key, 4)
    rnn_init = lstm_init if sequence_model == "LSTM" else gru_init
    if sequence_model not in ("LSTM", "GRU"):
        raise NotImplementedError(f"Not implemented {sequence_model}")
    return {
        "real_sequence_model": rnn_init(k1, input_size, hidden_size, num_layers, dtype),
        "imag_sequence_model": rnn_init(k2, input_size, hidden_size, num_layers, dtype),
        "real_fc_output_layer": linear_init(k3, hidden_size, output_size, dtype),
        "imag_fc_output_layer": linear_init(k4, hidden_size, output_size, dtype),
    }


def complex_sequence_model_apply(
    params, x, *, sequence_model="LSTM", output_activate_function=None,
):
    """x: [B, 2F, T] (real/imag stacked on the channel dim) -> [B, 2O, T]."""
    assert x.ndim == 3
    rnn = lstm_apply if sequence_model == "LSTM" else gru_apply
    real, imag = jnp.split(x, 2, axis=1)
    real = jnp.swapaxes(real, 1, 2)
    imag = jnp.swapaxes(imag, 1, 2)
    r2r, _ = rnn(params["real_sequence_model"], real)
    r2i, _ = rnn(params["imag_sequence_model"], real)
    i2r, _ = rnn(params["real_sequence_model"], imag)
    i2i, _ = rnn(params["imag_sequence_model"], imag)
    real_out = r2r - i2i
    imag_out = i2r + r2i
    real_out = real_out @ params["real_fc_output_layer"]["weight"] + params[
        "real_fc_output_layer"
    ]["bias"]
    imag_out = imag_out @ params["imag_fc_output_layer"]["weight"] + params[
        "imag_fc_output_layer"
    ]["bias"]
    if output_activate_function:
        act = _ACTIVATIONS[output_activate_function]
        real_out, imag_out = act(real_out), act(imag_out)
    return jnp.concatenate(
        [jnp.swapaxes(real_out, 1, 2), jnp.swapaxes(imag_out, 1, 2)], axis=1
    )
