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

    Multi-process: ``jax.devices()`` orders devices by owning process, and
    the plain process-ordered reshape is kept (no mesh_utils reordering) so
    that when n_block is a multiple of the process count, each block row's
    devices live on ONE process — block work, harvest, and ledger IO are
    then host-local by construction (SURVEY.md SS7 step 8).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_block = n_block or 1
    if n % n_block != 0:
        raise ValueError(f"n_block={n_block} does not divide {n} devices")
    shape = (n_block, n // n_block)
    if jax.process_count() > 1:
        dmesh = np.asarray(devices).reshape(shape)
    else:
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


def global_put(tree, sharding: NamedSharding):
    """Build global arrays under ``sharding`` from host data every process
    holds in full.

    The multi-process-safe replacement for ``jax.device_put(x, sharding)``:
    device_put cannot construct arrays over non-addressable devices, so on
    an N-process mesh each process contributes only its addressable shards
    here (each shard sliced out of the identical host copy — the callers'
    host logic is deterministic, so all processes hold the same bytes).
    Single-process it degenerates to a sharded device_put.
    """

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    return jax.tree_util.tree_map(put, tree)


def fetch_rows(arr: jax.Array, start: int, stop: int) -> np.ndarray:
    """Rows [start, stop) of a global array sharded on axis 0, assembled
    from this process's addressable shards.

    The multi-process harvest primitive: ``np.asarray`` on a sharded global
    array requires every shard to be addressable, which fails on N-process
    meshes.  Callers guarantee the requested rows live on this process
    (block rows are process-local by make_mesh construction).
    """
    out = None
    filled = None
    for sh in arr.addressable_shards:
        s0 = sh.index[0].start if sh.index and sh.index[0].start else 0
        data = np.asarray(sh.data)
        e0 = s0 + data.shape[0]
        lo, hi = max(s0, start), min(e0, stop)
        if lo >= hi:
            continue
        if out is None:
            out = np.empty((stop - start,) + data.shape[1:], data.dtype)
            filled = np.zeros(stop - start, bool)
        out[lo - start : hi - start] = data[lo - s0 : hi - s0]
        filled[lo - start : hi - start] = True
    if out is None or not filled.all():
        raise ValueError(
            f"rows [{start}, {stop}) are not fully addressable on "
            f"process {jax.process_index()}"
        )
    return out
