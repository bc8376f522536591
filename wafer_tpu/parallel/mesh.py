"""Device mesh construction and sharding specs for the 3D grid."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

AXIS_NAMES = ("gx", "gy", "gz")


def make_mesh(shape: Tuple[int, int, int], devices: Optional[Sequence] = None) -> Mesh:
    """Build a 3D mesh over ``shape = (mx, my, mz)`` devices.

    Axis order matters on real hardware: the leading grid axis maps to the
    leading mesh axis so face exchanges ride neighbouring ICI links on a
    torus. ``mx·my·mz`` must equal the participating device count."""
    devices = list(devices if devices is not None else jax.devices())
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.array(devices[:n]).reshape(shape)
    return Mesh(dev_array, AXIS_NAMES)


def shard_spec() -> PartitionSpec:
    """Interior grid arrays shard block-wise over all three mesh axes."""
    return PartitionSpec(*AXIS_NAMES)


def grid_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, shard_spec())


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
