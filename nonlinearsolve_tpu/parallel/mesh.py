"""Device mesh helpers for the distributed layer.

The reference's distribution story is MPI-inside-PETSc (SURVEY.md §5.8);
the TPU-native replacement is a ``jax.sharding.Mesh`` + NamedSharding over
ICI with XLA-inserted collectives (GSPMD).  These helpers build the meshes
the distributed Newton–Krylov layer and the driver's ``dryrun_multichip``
use.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape: Optional[Sequence[int]] = None,
                axis_names: Sequence[str] = ("x",),
                devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def row_sharding(mesh: Mesh, axis: str = "x", ndim: int = 1,
                 shard_dim: int = 0) -> NamedSharding:
    """Shard dimension ``shard_dim`` of an ndim-array over ``axis`` —
    row/block partitioning of the state vector (the PETSc Vec layout
    analogue)."""
    spec = [None] * ndim
    spec[shard_dim] = axis
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
