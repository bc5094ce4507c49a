"""Device-mesh construction helpers (SURVEY.md §5.8).

No reference equivalent — HOT is shared-memory-only. This is the
jax.distributed / mesh layer the rebuild adds: named axes over the slice,
with spatial grid-slab ownership as the primary ("SP/CP-analog") strategy
(SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axes: Sequence[str] = ("x",)) -> Mesh:
    """Mesh over the available devices; defaults to 1-D over all devices."""
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    n = 1
    for s in shape:
        n *= s
    assert n <= len(devices), f"mesh {shape} needs {n} devices, have {len(devices)}"
    import numpy as np

    return Mesh(np.asarray(devices[:n]).reshape(shape), axis_names=tuple(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())


def shard_leading(mesh: Mesh, axis: str = "x") -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec(axis))
