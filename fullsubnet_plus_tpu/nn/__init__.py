"""Parameterized pure functions + pytree params (no module framework).

Every layer is an (init, apply) pair: ``init(key, ...) -> params`` returns a
nested dict pytree; ``apply(params, x, ...)`` is a pure jittable function.
This keeps checkpoint conversion from the PyTorch reference trivial and makes
sharding annotations explicit.
"""

from fullsubnet_plus_tpu.nn import lstm, tcn, attention, sequence, init
