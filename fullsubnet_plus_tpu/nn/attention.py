"""Channel-attention zoo: MulCA (TSSE) and the SE/ECA/CBAM alternatives.

Functional re-design of the reference attention_model.py. The shipped
FullSubNet+ uses `ChannelTimeSenseSELayer` ("TSSE", the paper's MulCA):
three parallel depthwise Conv1d branches with kernel sizes (3, 5, 10) over
time, global-average-pooled and ReLU'd, fused by a Linear(3→1), then an SE
bottleneck FC(257→128→257) + sigmoid channel gate
(attention_model.py:43-98).

TPU notes: the depthwise convs are tiny VPU ops; the SE MLP is two small
matmuls. Everything here fuses into the surrounding graph — no kernels
needed. Inputs are [B, C, T] (C = frequency bins acting as channels).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from fullsubnet_plus_tpu.nn.init import conv1d_init, linear_init
from fullsubnet_plus_tpu.nn.tcn import conv1d


def _linear(params, x):
    return x @ params["weight"] + params["bias"]


# ---------------------------------------------------------------------------
# TSSE / MulCA — the shipped config (attention_model.py:43-98)
# ---------------------------------------------------------------------------

def tsse_init(key, num_channels: int, reduction_ratio: int = 2, kersize=(3, 5, 10),
              subband_num: int = 1, dtype=jnp.float32):
    reduced = num_channels // reduction_ratio
    groups = num_channels // subband_num
    ks = list(kersize)
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    return {
        "small_conv": conv1d_init(k1, num_channels, num_channels, ks[0], groups=groups, dtype=dtype),
        "middle_conv": conv1d_init(k2, num_channels, num_channels, ks[1], groups=groups, dtype=dtype),
        "large_conv": conv1d_init(k3, num_channels, num_channels, ks[2], groups=groups, dtype=dtype),
        "feature_concate_fc": linear_init(k4, 3, 1, dtype=dtype),
        "fc1": linear_init(k5, num_channels, reduced, dtype=dtype),
        "fc2": linear_init(k6, reduced, num_channels, dtype=dtype),
    }


def tsse_apply(params, x: jnp.ndarray, kersize=(3, 5, 10), subband_num: int = 1,
               valid=None) -> jnp.ndarray:
    """x: [B, C, T] -> gated [B, C, T].

    `valid` ([B] frame counts): masked pooling for bucket-padded batched
    serving — each branch's AdaptiveAvgPool averages over exactly the
    frames its valid conv would produce on the exact-length input
    (valid - k + 1), so the gate matches the reference's per-file run.
    Requires the padded region of x to be zero (the caller's masked norm
    guarantees it); only the shipped subband_num == 1 layout is supported
    with masking."""
    num_channels = x.shape[1]
    groups = num_channels // subband_num
    assert valid is None or subband_num == 1, "masked TSSE needs subband_num=1"

    def branch(conv_params, k):
        # valid depthwise conv -> [B, C, T-k+1], mean over time, ReLU
        y = conv1d(x, conv_params["weight"], conv_params["bias"], groups=groups)
        if valid is None:
            return jax.nn.relu(jnp.mean(y, axis=-1))  # [B, C]
        n_out = jnp.maximum(valid - k + 1, 1).astype(y.dtype)  # [B]
        from fullsubnet_plus_tpu.dsp.norms import time_mask

        mask = time_mask(y.shape[-1], valid - k + 1, y.dtype)
        return jax.nn.relu(
            jnp.sum(y * mask[:, None, :], axis=-1) / n_out[:, None]
        )

    feats = jnp.stack(
        [
            branch(params["small_conv"], kersize[0]),
            branch(params["middle_conv"], kersize[1]),
            branch(params["large_conv"], kersize[2]),
        ],
        axis=-1,
    )  # [B, C, 3]
    squeeze = _linear(params["feature_concate_fc"], feats)[..., 0]  # [B, C]
    gate = jax.nn.sigmoid(_linear(params["fc2"], jax.nn.relu(_linear(params["fc1"], squeeze))))
    return x * gate[:, :, None]


# ---------------------------------------------------------------------------
# Plain SE (attention_model.py:6-40)
# ---------------------------------------------------------------------------

def se_init(key, num_channels: int, reduction_ratio: int = 2, dtype=jnp.float32):
    reduced = num_channels // reduction_ratio
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, num_channels, reduced, dtype=dtype),
        "fc2": linear_init(k2, reduced, num_channels, dtype=dtype),
    }


def _masked_mean_t(x: jnp.ndarray, valid) -> jnp.ndarray:
    """[B, C, T] -> [B, C] mean over the first valid[b] frames (padded
    region must be zero)."""
    if valid is None:
        return jnp.mean(x, axis=2)
    return jnp.sum(x, axis=2) / valid.astype(x.dtype)[:, None]


def se_apply(params, x: jnp.ndarray, valid=None) -> jnp.ndarray:
    squeeze = _masked_mean_t(x, valid)  # [B, C]
    gate = jax.nn.sigmoid(_linear(params["fc2"], jax.nn.relu(_linear(params["fc1"], squeeze))))
    return x * gate[:, :, None]


# ---------------------------------------------------------------------------
# ECA (attention_model.py:344-361): conv1d(1,1,k=3,bias=False) over the
# channel axis of the pooled descriptor.
# ---------------------------------------------------------------------------

def eca_init(key, channel: int, k_size: int = 3, dtype=jnp.float32):
    conv = conv1d_init(key, 1, 1, k_size, dtype=dtype)
    return {"conv": {"weight": conv["weight"]}}


def eca_apply(params, x: jnp.ndarray, valid=None) -> jnp.ndarray:
    # k derived from the weight's static shape — storing it as a pytree leaf
    # would break tree_map dtype casts and trace as a non-concrete value
    # under jax.grad.
    k_size = params["conv"]["weight"].shape[-1]
    squeeze = _masked_mean_t(x, valid)[:, None, :]  # [B, 1, C]
    pad = (k_size - 1) // 2
    y = conv1d(squeeze, params["conv"]["weight"], None, padding=pad)
    gate = jax.nn.sigmoid(y[:, 0, :])  # [B, C]
    return x * gate[:, :, None]


# ---------------------------------------------------------------------------
# CBAM channel attention (attention_model.py:296-332)
# ---------------------------------------------------------------------------

def cbam_init(key, num_channels: int, reduction_ratio: int = 2, dtype=jnp.float32):
    reduced = num_channels // reduction_ratio
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, num_channels, reduced, dtype=dtype),
        "fc2": linear_init(k2, reduced, num_channels, dtype=dtype),
    }


def cbam_apply(params, x: jnp.ndarray, valid=None) -> jnp.ndarray:
    avg_pool = _masked_mean_t(x, valid)
    if valid is None:
        max_pool = jnp.max(x, axis=2)
    else:
        from fullsubnet_plus_tpu.dsp.norms import time_mask

        mask = time_mask(x.shape[-1], valid, jnp.bool_)[:, None, :]
        max_pool = jnp.max(jnp.where(mask, x, -jnp.inf), axis=2)
    # shared fc1, branch ReLUs summed BEFORE fc2 (attention_model.py:325-329)
    hidden = jax.nn.relu(_linear(params["fc1"], avg_pool)) + jax.nn.relu(
        _linear(params["fc1"], max_pool)
    )
    gate = jax.nn.sigmoid(_linear(params["fc2"], hidden))
    return x * gate[:, :, None]


# ---------------------------------------------------------------------------
# TSSE variant returning its gate (ChannelTimeSenseSEWeightLayer,
# attention_model.py:101-156) — same params as TSSE, extra return value.
# ---------------------------------------------------------------------------

tsse_weight_init = tsse_init


def tsse_weight_apply(params, x: jnp.ndarray, kersize=(3, 5, 10)):
    """Returns (gated_x, gate[B, C, 1]) — the squeeze path runs once."""
    num_channels = x.shape[1]

    def branch(conv_params):
        y = conv1d(x, conv_params["weight"], conv_params["bias"], groups=num_channels)
        return jax.nn.relu(jnp.mean(y, axis=-1))

    feats = jnp.stack(
        [branch(params["small_conv"]), branch(params["middle_conv"]),
         branch(params["large_conv"])],
        axis=-1,
    )
    squeeze = _linear(params["feature_concate_fc"], feats)[..., 0]
    gate = jax.nn.sigmoid(_linear(params["fc2"], jax.nn.relu(_linear(params["fc1"], squeeze))))
    return x * gate[:, :, None], gate[:, :, None]


# ---------------------------------------------------------------------------
# Deep TSSE: two stacked depthwise convs per scale (attention_model.py:159-223)
# ---------------------------------------------------------------------------

def deep_tsse_init(key, num_channels: int, reduction_ratio: int = 2,
                   kersize=(3, 5, 10), dtype=jnp.float32):
    reduced = num_channels // reduction_ratio
    keys = jax.random.split(key, 9)
    branches = {}
    for i, name in enumerate(("small", "middle", "large")):
        branches[f"{name}_conv1"] = conv1d_init(
            keys[2 * i], num_channels, num_channels, kersize[i], groups=num_channels, dtype=dtype
        )
        branches[f"{name}_conv2"] = conv1d_init(
            keys[2 * i + 1], num_channels, num_channels, kersize[i], groups=num_channels, dtype=dtype
        )
    return {
        **branches,
        "feature_concate_fc": linear_init(keys[6], 3, 1, dtype=dtype),
        "fc1": linear_init(keys[7], num_channels, reduced, dtype=dtype),
        "fc2": linear_init(keys[8], reduced, num_channels, dtype=dtype),
    }


def deep_tsse_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    num_channels = x.shape[1]

    def branch(name):
        y = jax.nn.relu(
            conv1d(x, params[f"{name}_conv1"]["weight"], params[f"{name}_conv1"]["bias"],
                   groups=num_channels)
        )
        y = jax.nn.relu(
            conv1d(y, params[f"{name}_conv2"]["weight"], params[f"{name}_conv2"]["bias"],
                   groups=num_channels)
        )
        return jnp.mean(y, axis=-1)  # AdaptiveAvgPool AFTER the ReLUs here

    feats = jnp.stack([branch("small"), branch("middle"), branch("large")], axis=-1)
    squeeze = _linear(params["feature_concate_fc"], feats)[..., 0]
    gate = jax.nn.sigmoid(_linear(params["fc2"], jax.nn.relu(_linear(params["fc1"], squeeze))))
    return x * gate[:, :, None]


# ---------------------------------------------------------------------------
# Self-attention + conv-attention blocks (attention_model.py:226-293, 364-390)
# ---------------------------------------------------------------------------

def self_attention_init(key, amp_dim: int = 257, att_dim: int = 257, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "q_linear": linear_init(k1, amp_dim, att_dim, dtype=dtype),
        "k_linear": linear_init(k2, amp_dim, att_dim, dtype=dtype),
        "v_linear": linear_init(k3, amp_dim, att_dim, dtype=dtype),
        "out": linear_init(k4, att_dim, amp_dim, dtype=dtype),
        "d_k": amp_dim,
    }


def self_attention_apply(params, q, k, v):
    """Sigmoid-scored attention over [B, T, F] (SelfAttentionlayer.forward).

    Note the reference uses sigmoid, not softmax, on the scores.
    """
    import math as _math

    q = _linear(params["q_linear"], q)
    k = _linear(params["k_linear"], k)
    v = _linear(params["v_linear"], v)
    scores = jax.nn.sigmoid(
        q @ jnp.swapaxes(k, -2, -1) / _math.sqrt(params["d_k"])
    )
    return _linear(params["out"], scores @ v)


def conv_attention_block_init(key, num_channels: int, kersize: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "conv1d": conv1d_init(k1, num_channels, num_channels, kersize,
                              groups=num_channels, dtype=dtype),
        "attention": self_attention_init(k2, num_channels, num_channels, dtype=dtype),
    }


def conv_attention_block_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    """[B, C, T] -> [B, C, 1] (Conv_Attention_Block.forward)."""
    num_channels = x.shape[1]
    y = conv1d(x, params["conv1d"]["weight"], params["conv1d"]["bias"],
               groups=num_channels)
    y = jnp.swapaxes(y, 1, 2)  # [B, T', C]
    y = self_attention_apply(params["attention"], y, y, y)
    pooled = jnp.mean(jnp.swapaxes(y, 1, 2), axis=-1, keepdims=True)
    return jax.nn.relu(pooled)


def tsse_attention_init(key, num_channels: int, reduction_ratio: int = 2,
                        kersize=(3, 5, 10), dtype=jnp.float32):
    reduced = num_channels // reduction_ratio
    keys = jax.random.split(key, 6)
    return {
        "small_conv": conv_attention_block_init(keys[0], num_channels, kersize[0], dtype),
        "middle_conv": conv_attention_block_init(keys[1], num_channels, kersize[1], dtype),
        "large_conv": conv_attention_block_init(keys[2], num_channels, kersize[2], dtype),
        "feature_concate_fc": linear_init(keys[3], 3, 1, dtype=dtype),
        "fc1": linear_init(keys[4], num_channels, reduced, dtype=dtype),
        "fc2": linear_init(keys[5], reduced, num_channels, dtype=dtype),
    }


def tsse_attention_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    """ChannelTimeSenseAttentionSELayer.forward (attention_model.py:278-293)."""
    feats = jnp.concatenate(
        [
            conv_attention_block_apply(params["small_conv"], x),
            conv_attention_block_apply(params["middle_conv"], x),
            conv_attention_block_apply(params["large_conv"], x),
        ],
        axis=2,
    )  # [B, C, 3]
    squeeze = _linear(params["feature_concate_fc"], feats)[..., 0]
    gate = jax.nn.sigmoid(_linear(params["fc2"], jax.nn.relu(_linear(params["fc1"], squeeze))))
    return x * gate[:, :, None]


# ---------------------------------------------------------------------------
# Registry keyed the way FullSubNet_Plus selects them (fullsubnet_plus.py:52-70)
# ---------------------------------------------------------------------------

def channel_attention_init(key, model: str, num_channels: int, kersize=(3, 5, 10),
                           subband_num: int = 1, dtype=jnp.float32):
    if model == "TSSE":
        return tsse_init(key, num_channels, kersize=kersize, subband_num=subband_num, dtype=dtype)
    if model == "SE":
        return se_init(key, num_channels, dtype=dtype)
    if model == "ECA":
        return eca_init(key, num_channels, dtype=dtype)
    if model == "CBAM":
        return cbam_init(key, num_channels, dtype=dtype)
    if model == "DeepTSSE":
        return deep_tsse_init(key, num_channels, kersize=kersize, dtype=dtype)
    if model == "TSSE_ATT":
        return tsse_attention_init(key, num_channels, kersize=kersize, dtype=dtype)
    raise NotImplementedError(f"Not implemented channel attention model {model}")


def channel_attention_apply(params, model: str, x: jnp.ndarray, kersize=(3, 5, 10),
                            subband_num: int = 1, valid=None) -> jnp.ndarray:
    """`valid`: masked time pooling for bucket-padded batched serving
    (TSSE/SE/ECA/CBAM; the unshipped DeepTSSE/TSSE_ATT variants reject it)."""
    if model == "TSSE":
        return tsse_apply(params, x, kersize=kersize, subband_num=subband_num,
                          valid=valid)
    if model == "SE":
        return se_apply(params, x, valid=valid)
    if model == "ECA":
        return eca_apply(params, x, valid=valid)
    if model == "CBAM":
        return cbam_apply(params, x, valid=valid)
    assert valid is None, f"masked pooling not wired for {model}"
    if model == "DeepTSSE":
        return deep_tsse_apply(params, x)
    if model == "TSSE_ATT":
        return tsse_attention_apply(params, x)
    raise NotImplementedError(f"Not implemented channel attention model {model}")
