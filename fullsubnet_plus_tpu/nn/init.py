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


def reference_weight_init(key, params, path=""):
    """Re-initialize a param tree with the reference's optional scheme
    (BaseModel.weight_init, base_model.py:332-397): xavier-normal for linear
    weights, standard-normal for conv1d weights and all biases, orthogonal
    for recurrent matrices. The shipped configs set weight_init=false, so
    this is for config-surface parity only.

    Heuristics mirror the torch isinstance dispatch using our layouts:
      * {"w_ih"/"w_hh"}: LSTM/GRU — orthogonal (ndim>=2), normal otherwise
      * conv weights [O, I/g, K] (ndim==3): normal
      * linear weights [in, out] (ndim==2): xavier-normal
      * biases / 1-D tensors: normal
    """
    import numpy as np

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    new_leaves = []
    for tree_path, leaf in flat:
        key, sub = jax.random.split(key)
        name = str(tree_path[-1])
        arr = jnp.asarray(leaf)
        if "norm" in str(tree_path).lower() or "prelu" in str(tree_path).lower():
            new_leaves.append(arr)  # GroupNorm/PReLU keep defaults
            continue
        if ("w_ih" in name or "w_hh" in name) and arr.ndim >= 2:
            new_leaves.append(orthogonal(sub, arr.shape, arr.dtype))
        elif arr.ndim == 3:  # conv1d weight
            new_leaves.append(jax.random.normal(sub, arr.shape, arr.dtype))
        elif arr.ndim == 2:  # linear weight — xavier normal
            fan_in, fan_out = arr.shape
            std = math.sqrt(2.0 / (fan_in + fan_out))
            new_leaves.append(std * jax.random.normal(sub, arr.shape, arr.dtype))
        else:
            new_leaves.append(jax.random.normal(sub, arr.shape, arr.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
