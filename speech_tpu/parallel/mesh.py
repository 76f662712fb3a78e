"""Device-mesh construction helpers."""

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "named_sharding"]


def make_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
    devices=None,
) -> Mesh:
    """Build a :class:`jax.sharding.Mesh` over the available devices.

    Parameters
    ----------
    axis_names
        Logical axis names, e.g. ``("data",)`` or ``("data", "filt")``.
    shape
        Devices per axis.  Defaults to all devices on the first axis (and 1
        on the rest).  A ``-1`` entry is inferred from the device count.
    devices
        Devices to use; defaults to ``jax.devices()``.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {tuple(shape)} != {n} devices")
    return Mesh(devices.reshape(shape), tuple(axis_names))


def named_sharding(mesh: Mesh, *spec) -> NamedSharding:
    """Shorthand for ``NamedSharding(mesh, PartitionSpec(*spec))``."""
    return NamedSharding(mesh, PartitionSpec(*spec))
