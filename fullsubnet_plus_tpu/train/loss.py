"""Loss functions (reference audio_zen/loss.py:1-32).

Selected by name from config exactly like the reference's
`initialize_module(loss_function.name)` (tools/train.py:66).
"""

from __future__ import annotations

import jax.numpy as jnp

from fullsubnet_plus_tpu.constants import EPSILON


def mse_loss(target: jnp.ndarray, prediction: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(target - prediction))


def l1_loss(target: jnp.ndarray, prediction: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(target - prediction))


def si_snr_loss(target: jnp.ndarray, estimate: jnp.ndarray) -> jnp.ndarray:
    """Negative scale-invariant SNR on time-domain signals [B, T].

    Reference: audio_zen/loss.py si_snr (zero-mean projection form).
    """
    target = target - jnp.mean(target, axis=-1, keepdims=True)
    estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    s_target = (
        jnp.sum(estimate * target, axis=-1, keepdims=True)
        * target
        / (jnp.sum(jnp.square(target), axis=-1, keepdims=True) + EPSILON)
    )
    e_noise = estimate - s_target
    ratio = jnp.sum(jnp.square(s_target), axis=-1) / (
        jnp.sum(jnp.square(e_noise), axis=-1) + EPSILON
    )
    return -jnp.mean(10.0 * jnp.log10(ratio + EPSILON))


LOSS_REGISTRY = {
    "mse_loss": mse_loss,
    "l1_loss": l1_loss,
    "si_snr_loss": si_snr_loss,
}


def get_loss(name: str):
    if name not in LOSS_REGISTRY:
        raise KeyError(f"Unknown loss {name!r}; known: {sorted(LOSS_REGISTRY)}")
    return LOSS_REGISTRY[name]
