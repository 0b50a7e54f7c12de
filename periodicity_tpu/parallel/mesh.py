"""Device-mesh helpers."""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["default_mesh", "grid_sharding"]


def default_mesh(axis_names=("grid",), shape=None, devices=None):
    """Build a Mesh over the available devices.

    axis_names: mesh axis names, e.g. ("batch", "grid").
    shape: per-axis sizes; defaults to all devices on the first axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def grid_sharding(mesh, axis="grid"):
    """NamedSharding that lays a 1-D grid array over one mesh axis."""
    return NamedSharding(mesh, P(axis))
