"""Device-mesh construction (SURVEY.md SS2 parallelism table).

Axes:
  * ``block`` — scene-volume blocks (the sequence/context-parallel analog):
    the scan's voxel lattice is partitioned into contiguous blocks of cubes;
    ray pooling across block boundaries uses halo exchange (parallel/halo.py).
  * ``cube``  — data-parallel over cubes / view-pair work items / training
    minibatch.

On a multi-host slice ``jax.distributed.initialize`` has already populated
``jax.devices()``; the same code path builds the global mesh.  Collectives
ride ICI within a slice (mesh construction orders devices so the block axis
maps to physically adjacent chips via jax.experimental.mesh_utils).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_block: Optional[int] = None,
    devices: Optional[Sequence] = None,
    axis_names: Tuple[str, str] = ("block", "cube"),
) -> Mesh:
    """Build a (block, cube) mesh over the available devices.

    Args:
      n_block: devices along the block (scene-partition) axis.  Default 1
        (all devices data-parallel) — the right choice until the scene is
        large enough to shard spatially.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_block = n_block or 1
    if n % n_block != 0:
        raise ValueError(f"n_block={n_block} does not divide {n} devices")
    shape = (n_block, n // n_block)
    try:
        dmesh = mesh_utils.create_device_mesh(
            shape, devices=np.asarray(devices)
        )
    except Exception:
        dmesh = np.asarray(devices).reshape(shape)
    return Mesh(dmesh, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def cube_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (cube/batch) dim over every mesh axis."""
    return NamedSharding(mesh, P(mesh.axis_names))


def block_sharded(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Shard the leading spatial dim of a volume over the block axis."""
    spec = [None] * ndim
    spec[0] = "block"
    return NamedSharding(mesh, P(*spec))
