"""Device meshes and sharding specs (ICI/DCN scaling)."""

from fullsubnet_plus_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated,
    initialize_distributed,
)
