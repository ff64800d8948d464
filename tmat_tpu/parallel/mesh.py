"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices.

    Defaults to a 1-D data-parallel mesh over all devices. ``axis_shape``
    lets callers carve (dp, sp/tp) submeshes, e.g. (4, 2) on 8 chips.

    Process-aware: after ``parallel.distributed.initialize`` (multi-host
    pods / multi-process CPU), ``jax.devices()`` enumerates EVERY
    process's devices, so the default mesh spans the whole job —
    collectives ride ICI within a host's slice and DCN (or gloo on CPU)
    across processes. Single-process runs are unchanged.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if axis_shape is None:
        axis_shape = (len(devices),)
    n_needed = int(np.prod(axis_shape))
    if n_needed > len(devices):
        raise ValueError(
            f"mesh shape {axis_shape} needs {n_needed} devices, "
            f"have {len(devices)}"
        )
    dev_array = np.array(devices[:n_needed]).reshape(axis_shape)
    return Mesh(dev_array, axis_names)


def shard_leading(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding that splits the leading (well/batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr, multiple: int, axis: int = 0):
    """Pad the leading axis so it divides the mesh size; returns (arr, n_valid).

    Plates rarely divide the chip count exactly; padding + masking keeps
    shapes static for XLA (SURVEY §7 hard-part #3).
    """
    import numpy as np

    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_widths = [(0, 0)] * arr.ndim
    pad_widths[axis] = (0, rem)
    return np.pad(arr, pad_widths, mode="edge"), n
