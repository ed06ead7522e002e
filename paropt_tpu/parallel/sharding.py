"""Device-mesh and sharding helpers.

The reference distributes the design vector (and the sparse-constraint vector)
in 1-D blocks over MPI ranks (`ParOptVec.{h,cpp}`, offsets via MPI_Allgather at
`ParOptInteriorPoint.cpp:214-229`).  The TPU-native equivalent: the design axis
``n`` is sharded over a 1-D `jax.sharding.Mesh` axis (named ``"d"``) with a
`NamedSharding`; everything of size ``ncon`` / ``qn_subspace`` is replicated.
All cross-device reductions then lower to XLA `all-reduce` over ICI inside the
jitted step — there is no explicit communication code anywhere in the
framework (the SPMD analogue of `MPI_Allreduce`-in-vector-ops, `ParOptVec.cpp:
63-143`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "DESIGN_AXIS",
    "design_mesh",
    "design_sharding",
    "replicated_sharding",
    "shard_design",
    "replicate",
]

# Name of the mesh axis over which design-dimension arrays are sharded.
DESIGN_AXIS = "d"


def design_mesh(devices: Optional[Sequence[jax.Device]] = None,
                n_devices: Optional[int] = None) -> Mesh:
    """Create a 1-D mesh over ``devices`` (default: all available)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DESIGN_AXIS,))


def design_sharding(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    """Sharding for a [n]-shaped (or leading-axis-n) design-dimension array."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(DESIGN_AXIS))


def row_sharding(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    """Sharding for a [k, n] array of stacked design vectors: shard axis 1."""
    if mesh is None:
        return None
    return NamedSharding(mesh, P(None, DESIGN_AXIS))


def replicated_sharding(mesh: Optional[Mesh]) -> Optional[NamedSharding]:
    if mesh is None:
        return None
    return NamedSharding(mesh, P())


def shard_design(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    """Place a design-dimension array with block sharding on its last... first
    axis.  1-D arrays [n] shard on axis 0; 2-D [k, n] stacks shard on axis 1."""
    if mesh is None:
        return x
    if x.ndim == 1:
        return jax.device_put(x, design_sharding(mesh))
    return jax.device_put(x, row_sharding(mesh))


def replicate(x: jax.Array, mesh: Optional[Mesh]) -> jax.Array:
    if mesh is None:
        return x
    return jax.device_put(x, replicated_sharding(mesh))
