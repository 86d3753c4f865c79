"""Test harness setup: force JAX onto a virtual 8-device CPU platform.

The environment's sitecustomize registers the axon TPU PJRT plugin at
interpreter start and forces ``jax_platforms="axon,cpu"``; tests must run on
CPU (the real chip is reserved for bench runs and host transfers over the
tunnel are slow), so we override the config *after* import but before any
backend initialization. Multi-chip logic is validated on a fake 8-device CPU
mesh (SURVEY.md §4 item 4).
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
