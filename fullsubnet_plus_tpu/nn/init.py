"""Parameter initializers matching torch defaults (for from-scratch training)
and the reference's optional `weight_init` scheme (base_model.py:332-397).

The released checkpoint ships `weight_init=false` (config/train.toml:89), so
torch *default* inits are what training-parity runs use:
  * nn.Linear / nn.Conv1d: kaiming-uniform(a=sqrt(5)) weights,
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) bias.
  * nn.LSTM/GRU: U(-1/sqrt(hidden), 1/sqrt(hidden)) for all tensors.
  * nn.PReLU: 0.25;  nn.GroupNorm: weight 1, bias 0.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_uniform(key, shape, fan_in, a=math.sqrt(5.0), dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ with leaky_relu gain (torch default)."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_fan_in(key, shape, fan_in, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(key, in_features, out_features, dtype=jnp.float32):
    """Weight [in, out] (transposed vs torch), bias [out]."""
    kw, kb = jax.random.split(key)
    weight = kaiming_uniform(kw, (in_features, out_features), in_features, dtype=dtype)
    bias = uniform_fan_in(kb, (out_features,), in_features, dtype=dtype)
    return {"weight": weight, "bias": bias}


def conv1d_init(key, in_channels, out_channels, kernel_size, groups=1, dtype=jnp.float32):
    """Kernel [out, in/groups, k] (torch layout), bias [out]."""
    kw, kb = jax.random.split(key)
    fan_in = (in_channels // groups) * kernel_size
    weight = kaiming_uniform(
        kw, (out_channels, in_channels // groups, kernel_size), fan_in, dtype=dtype
    )
    bias = uniform_fan_in(kb, (out_channels,), fan_in, dtype=dtype)
    return {"weight": weight, "bias": bias}


def orthogonal(key, shape, dtype=jnp.float32):
    return jax.nn.initializers.orthogonal()(key, shape, dtype)
