"""Device mesh helpers for ensemble ("ens") parallelism.

The reference's only parallel axis is the ensemble member (SURVEY.md §2 P1,
via pathos ProcessPool). Here members are a leading array axis in HBM:
intra-chip parallelism is `vmap`; cross-chip is a 1-D `jax.sharding.Mesh`
over axis "ens", with XLA inserting any collectives (ensemble moments in the
DA updates become psum-reduced matmuls over ICI).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENS_AXIS = "ens"


def ens_mesh(n_devices=None, devices=None):
    """Build a 1-D mesh over the ensemble axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ENS_AXIS,))


def ens_spec(mesh=None):
    return P(ENS_AXIS)


def shard_ens(x, mesh, axis=0):
    """Place `x` with its leading (member) axis sharded over the mesh."""
    spec = [None] * np.ndim(x)
    spec[axis] = ENS_AXIS
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(x, mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
