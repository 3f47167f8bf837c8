"""Mesh / sharding helpers.

The reference has no distributed backend (SURVEY §2.2); its big-n strategy
is blockwise seeded regeneration on one host. The TPU-native equivalent is
first-class: a ``jax.sharding.Mesh`` over ICI with the DoF axis sharded
('dof') and, optionally, a data-parallel parameter-batch axis ('mu').
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("dof",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def dof_sharding(mesh: Mesh, axis: int = 0, ndim: int = 2) -> NamedSharding:
    """Shard array dimension ``axis`` over the 'dof' mesh axis."""
    spec = [None] * ndim
    spec[axis] = "dof"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
