"""Temporal Convolutional Network blocks (the full-band extractor).

Functional re-design of the reference TCNBlock (causal_conv.py:67-117):
1x1 conv → PReLU → GroupNorm(1 group) → depthwise dilated conv → PReLU →
GroupNorm → 1x1 conv, with a residual skip. The shipped FullSubNet+ stacks
8 of these per spectrogram branch with dilations (1,2,5,9,1,2,5,9),
non-causal, hidden width 512 (sequence_model.py:47-58).

TPU notes: convs use lax.conv_general_dilated with NCW layout; the 1x1 convs
are plain [C_in → C_out] matmuls over (B·T) and map straight onto the MXU.
The depthwise conv is VPU work; XLA fuses the PReLU/GroupNorm chains around
the convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from fullsubnet_plus_tpu.nn.init import conv1d_init


def conv1d(x: jnp.ndarray, weight: jnp.ndarray, bias=None, *, dilation=1, padding=0, groups=1):
    """torch.nn.functional.conv1d semantics. x [B, C, T], weight [O, I/g, K].

    TPU-first lowering: XLA's grouped-conv path is catastrophically slow for
    the many-group shapes this model uses (depthwise convs with 257/512
    groups in MulCA/TCN), so the two hot cases take explicit forms instead:
      * depthwise (groups == C_in == C_out): K shifted multiply-adds — pure
        VPU streaming, one pass over x per tap;
      * 1x1 dense (K == 1, groups == 1): a single [C_in -> C_out] einsum that
        maps straight onto the MXU.
    The general case keeps lax.conv_general_dilated.
    """
    out_c, in_per_group, k = weight.shape
    in_c = x.shape[1]
    if groups == in_c and out_c == in_c and in_per_group == 1:
        # depthwise: y[b,c,t] = sum_k w[c,k] * xp[b,c,t + k*dilation]
        xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding)))
        t_out = xp.shape[-1] - dilation * (k - 1)
        out = weight[None, :, 0, 0, None] * xp[:, :, :t_out]
        for tap in range(1, k):
            out = out + weight[None, :, 0, tap, None] * xp[
                :, :, tap * dilation : tap * dilation + t_out
            ]
    elif k == 1 and groups == 1 and dilation == 1 and padding == 0:
        out = jnp.einsum("bct,oc->bot", x, weight[:, :, 0])
    else:
        out = jax.lax.conv_general_dilated(
            x,
            weight,
            window_strides=(1,),
            padding=[(padding, padding)],
            rhs_dilation=(dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=groups,
        )
    if bias is not None:
        out = out + bias[None, :, None]
    return out


def prelu(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """nn.PReLU with a single shared parameter (torch default)."""
    return jnp.where(x >= 0, x, alpha * x)


def group_norm1(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
                eps: float = 1e-8, valid=None):
    """nn.GroupNorm(1, C): normalize over (C, T) per sample. x [B, C, T].

    `valid` ([B] frame counts) restricts the statistics to the first
    valid[b] frames and zeroes the rest of the output, so a bucket-padded
    batch normalizes each utterance exactly as its exact-length run would
    (the reference always runs exact-length at batch 1)."""
    if valid is None:
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(x - mu), axis=(1, 2), keepdims=True)
        x = (x - mu) * jax.lax.rsqrt(var + eps)
        return x * weight[None, :, None] + bias[None, :, None]
    from fullsubnet_plus_tpu.dsp.norms import time_mask

    mask = time_mask(x.shape[-1], valid, x.dtype)[:, None, :]
    count = (x.shape[1] * valid.astype(x.dtype))[:, None, None]
    mu = jnp.sum(x * mask, axis=(1, 2), keepdims=True) / count
    var = jnp.sum(jnp.square((x - mu) * mask), axis=(1, 2), keepdims=True) / count
    x = (x - mu) * jax.lax.rsqrt(var + eps)
    return (x * weight[None, :, None] + bias[None, :, None]) * mask


def tcn_block_init(
    key,
    in_channels: int = 257,
    hidden_channel: int = 512,
    out_channels: int = 257,
    kernel_size: int = 3,
    dtype=jnp.float32,
):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv1x1": conv1d_init(k1, in_channels, hidden_channel, 1, dtype=dtype),
        "prelu1": jnp.asarray([0.25], dtype),
        "norm1": {
            "weight": jnp.ones((hidden_channel,), dtype),
            "bias": jnp.zeros((hidden_channel,), dtype),
        },
        "depthwise": conv1d_init(
            k2, hidden_channel, hidden_channel, kernel_size, groups=hidden_channel, dtype=dtype
        ),
        "prelu2": jnp.asarray([0.25], dtype),
        "norm2": {
            "weight": jnp.ones((hidden_channel,), dtype),
            "bias": jnp.zeros((hidden_channel,), dtype),
        },
        "sconv": conv1d_init(k3, hidden_channel, out_channels, 1, dtype=dtype),
    }


def tcn_block_apply(
    params,
    x: jnp.ndarray,
    *,
    kernel_size: int = 3,
    dilation: int = 1,
    causal: bool = False,
    use_skip_connection: bool = True,
    valid=None,
) -> jnp.ndarray:
    """x: [B, C, T] -> [B, C, T]. Matches TCNBlock.forward (causal_conv.py:96-117).

    `valid`: per-sample valid frame counts for masked GroupNorm statistics
    (batched serving with bucket padding). The masked GroupNorms re-zero
    the padded region, so the convs' zero-padding at each utterance's true
    end matches the exact-length run's."""
    padding = dilation * (kernel_size - 1) if causal else (dilation * (kernel_size - 1)) // 2
    hidden = params["depthwise"]["weight"].shape[0]
    y = conv1d(x, params["conv1x1"]["weight"], params["conv1x1"]["bias"])
    y = group_norm1(prelu(y, params["prelu1"]), **params["norm1"], valid=valid)
    y = conv1d(
        y,
        params["depthwise"]["weight"],
        params["depthwise"]["bias"],
        dilation=dilation,
        padding=padding,
        groups=hidden,
    )
    if causal and padding:
        y = y[:, :, :-padding]
    y = group_norm1(prelu(y, params["prelu2"]), **params["norm2"], valid=valid)
    out = conv1d(y, params["sconv"]["weight"], params["sconv"]["bias"])
    out = x + out if use_skip_connection else out
    if valid is not None:
        # keep the invariant "zero beyond valid" (sconv bias + skip would
        # otherwise re-introduce nonzeros the next conv would smear inward)
        from fullsubnet_plus_tpu.dsp.norms import time_mask

        out = out * time_mask(out.shape[-1], valid, out.dtype)[:, None, :]
    return out


# STCNBlock in the reference (causal_conv.py:120-170) is a verbatim duplicate
# of TCNBlock; alias rather than re-implement.
stcn_block_init = tcn_block_init
stcn_block_apply = tcn_block_apply


# ---------------------------------------------------------------------------
# 2-D causal encoder/decoder convs (causal_conv.py:5-64; unused by shipped
# configs but part of the module surface). BatchNorm runs with provided
# statistics (inference) or batch statistics (training=True).
# ---------------------------------------------------------------------------

def conv2d(x, weight, bias=None, *, stride=(1, 1), padding=((0, 0), (0, 0))):
    """torch.nn.functional.conv2d. x [B, C, F, T], weight [O, I, KF, KT]."""
    out = jax.lax.conv_general_dilated(
        x, weight, window_strides=stride, padding=list(padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


def batch_norm2d(x, params, *, training: bool = False, eps: float = 1e-5):
    if training:
        mu = jnp.mean(x, axis=(0, 2, 3), keepdims=True)
        var = jnp.var(x, axis=(0, 2, 3), keepdims=True)
    else:
        mu = params["running_mean"][None, :, None, None]
        var = params["running_var"][None, :, None, None]
    x = (x - mu) * jax.lax.rsqrt(var + eps)
    return x * params["weight"][None, :, None, None] + params["bias"][None, :, None, None]


def _bn_init(channels, dtype=jnp.float32):
    return {
        "weight": jnp.ones((channels,), dtype),
        "bias": jnp.zeros((channels,), dtype),
        "running_mean": jnp.zeros((channels,), dtype),
        "running_var": jnp.ones((channels,), dtype),
    }


def causal_conv_block_init(key, in_channels, out_channels, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    fan_in = in_channels * 3 * 2
    from fullsubnet_plus_tpu.nn.init import kaiming_uniform, uniform_fan_in

    return {
        "conv": {
            "weight": kaiming_uniform(kw, (out_channels, in_channels, 3, 2), fan_in, dtype=dtype),
            "bias": uniform_fan_in(kb, (out_channels,), fan_in, dtype=dtype),
        },
        "norm": _bn_init(out_channels, dtype),
    }


def causal_conv_block_apply(params, x, *, activation="ELU", training=False):
    """[B, C, F, T] -> halved F, same T; causal in time via right-chomp."""
    y = conv2d(x, params["conv"]["weight"], params["conv"]["bias"],
               stride=(2, 1), padding=((0, 0), (1, 1)))
    y = y[:, :, :, :-1]  # chomp the look-ahead sample
    y = batch_norm2d(y, params["norm"], training=training)
    act = {"ELU": jax.nn.elu, "ReLU": jax.nn.relu, "Tanh": jnp.tanh,
           "LeakyReLU": jax.nn.leaky_relu}[activation]
    return act(y)


def causal_trans_conv_block_init(key, in_channels, out_channels, dtype=jnp.float32):
    kw, kb = jax.random.split(key)
    fan_in = out_channels * 3 * 2  # transposed conv fan-in uses out side
    from fullsubnet_plus_tpu.nn.init import kaiming_uniform, uniform_fan_in

    return {
        "conv": {
            # torch ConvTranspose2d weight layout [in, out, KF, KT]
            "weight": kaiming_uniform(kw, (in_channels, out_channels, 3, 2), fan_in, dtype=dtype),
            "bias": uniform_fan_in(kb, (out_channels,), fan_in, dtype=dtype),
        },
        "norm": _bn_init(out_channels, dtype),
    }


def causal_trans_conv_block_apply(params, x, *, is_last=False,
                                  output_padding=(0, 0), training=False):
    """ConvTranspose2d (3,2)/(2,1) + chomp + BN + ELU/ReLU (causal_conv.py:35-64).

    torch's ConvTranspose2d is the gradient of a forward conv, i.e. a
    fractionally-strided conv with the spatially *flipped* kernel; flip here
    and use VALID padding (verified element-exact vs torch at HIGHEST
    precision).
    """
    weight = params["conv"]["weight"]  # torch layout [I, O, KF, KT]
    kernel = jnp.transpose(weight[:, :, ::-1, ::-1], (2, 3, 0, 1))  # [KF, KT, I, O]
    y = jax.lax.conv_transpose(
        x,
        kernel,
        strides=(2, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "HWIO", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    if any(output_padding):
        y = jnp.pad(y, ((0, 0), (0, 0), (0, output_padding[0]), (0, output_padding[1])))
    y = y + params["conv"]["bias"][None, :, None, None]
    y = y[:, :, :, :-1]  # chomp
    y = batch_norm2d(y, params["norm"], training=training)
    return jax.nn.relu(y) if is_last else jax.nn.elu(y)


# The shipped full-band extractor stack: 8 blocks, dilations repeat (1,2,5,9).
TCN_DILATIONS = (1, 2, 5, 9, 1, 2, 5, 9)


def tcn_stack_init(key, channels: int, hidden_channel: int = 512, dtype=jnp.float32,
                   subband_variant: bool = False):
    """8-block stack. `subband_variant` reproduces SequenceModel's
    "TCN-subband" (sequence_model.py:59-70): hidden = hidden_channel for the
    first 7 blocks and 384 for the last."""
    keys = jax.random.split(key, len(TCN_DILATIONS))
    hiddens = [hidden_channel] * len(TCN_DILATIONS)
    if subband_variant:
        hiddens[-1] = 384
    return {
        "blocks": [
            tcn_block_init(k, channels, h, channels, dtype=dtype)
            for k, h in zip(keys, hiddens)
        ]
    }


def tcn_stack_apply(params, x: jnp.ndarray, valid=None) -> jnp.ndarray:
    """8 TCN blocks + final ReLU (sequence_model.py:47-58). x: [B, C, T]."""
    for block, dilation in zip(params["blocks"], TCN_DILATIONS):
        x = tcn_block_apply(block, x, dilation=dilation, valid=valid)
    return jax.nn.relu(x)
