"""Pallas TPU kernel for affine (sheared-slab) ray pooling.

The XLA formulation of the affine ray-max (ops/ray_pooling.py::
ray_max_mask_affine) vmaps dynamic-sliced 2D shifts, which XLA lowers to
gathers — the exact thing the affine mode exists to avoid.  In Pallas the
same shifts are VMEM pointer arithmetic: per (cube, view) item the kernel
does 2*D dynamic slices of a padded (3D, 3D) scratch — microseconds.

The dominant ray axis varies per item; rather than data-dependent
transposes, the wrapper runs the kernel once per axis permutation on
pre-transposed volumes and selects per item (3x a tiny cost).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _affine_pool_kernel(
    slopes_ref,  # (N, 2) f32 scalar prefetch: (sl0, sl1) per item
    vol_ref,  # (1, D, D, D) f32 VMEM: probability, dominant axis LAST
    mask_ref,  # (1, D, D, D) f32 VMEM out: 1.0 where ray-max
    pad_ref,  # (3D, 3D) f32 scratch
    *,
    D: int,
):
    item = pl.program_id(0)
    sl0 = slopes_ref[item, 0]
    sl1 = slopes_ref[item, 1]

    pad_ref[...] = jnp.full((3 * D, 3 * D), NEG, jnp.float32)

    def offs(t):
        tf = (t - D // 2).astype(jnp.float32)
        oi = jnp.round(sl0 * tf).astype(jnp.int32)
        oj = jnp.round(sl1 * tf).astype(jnp.int32)
        return oi, oj

    # pass 1: M[p, q] = max_t shifted slab t
    def acc(t, M):
        oi, oj = offs(t)
        pad_ref[pl.ds(D, D), pl.ds(D, D)] = vol_ref[0, :, :, t]
        sh = pad_ref[pl.ds(D - oi, D), pl.ds(D - oj, D)]
        return jnp.maximum(M, sh)

    M = jax.lax.fori_loop(
        0, D, acc, jnp.full((D, D), NEG, jnp.float32)
    )

    # pass 2: ray_max for slab t = M shifted back; mask = vol >= ray_max
    pad_ref[...] = jnp.full((3 * D, 3 * D), NEG, jnp.float32)
    pad_ref[pl.ds(D, D), pl.ds(D, D)] = M

    def back(t, _):
        oi, oj = offs(t)
        rm = pad_ref[pl.ds(D + oi, D), pl.ds(D + oj, D)]
        mask_ref[0, :, :, t] = (
            vol_ref[0, :, :, t] >= rm - 1e-6
        ).astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, D, back, 0)


@functools.partial(jax.jit, static_argnames=("D", "interpret"))
def _pool_one_axis(
    vols: jnp.ndarray,  # (N, D, D, D) pre-transposed, dominant axis last
    slopes: jnp.ndarray,  # (N, 2)
    *,
    D: int,
    interpret: bool = False,
) -> jnp.ndarray:
    N = vols.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, D, D, D), lambda i, *_: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, D, D, D), lambda i, *_: (i, 0, 0, 0)),
        ],
        scratch_shapes=[pltpu.VMEM((3 * D, 3 * D), jnp.float32)],
    )
    (mask,) = pl.pallas_call(
        functools.partial(_affine_pool_kernel, D=D),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, D, D, D), jnp.float32)],
        interpret=interpret,
    )(slopes.astype(jnp.float32), vols.astype(jnp.float32))
    return mask


def ray_max_mask_affine_pallas(
    probs: jnp.ndarray,  # (N, D, D, D) per-item probability volumes
    origins: jnp.ndarray,  # (N, 3)
    s: float,
    Ps: jnp.ndarray,  # (N, 3, 4) per-item pooling view
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched affine ray-max mask via the Pallas kernel.

    Same semantics as vmap(ray_max_mask_affine) (ops/ray_pooling.py) —
    the XLA oracle it is tested against.  Returns (N, D, D, D) bool.
    """
    from surfacenet_tpu.ops.ray_pooling import _projection_jacobian

    D = probs.shape[1]
    centers = origins.astype(jnp.float32) + 0.5 * D * s

    A = jax.vmap(_projection_jacobian)(Ps, centers)  # (N, 2, 3)
    n = jnp.cross(A[:, 0], A[:, 1])  # (N, 3) ray direction
    axis = jnp.argmax(jnp.abs(n), axis=-1)  # (N,)

    perms = [(1, 2, 0), (0, 2, 1), (0, 1, 2)]
    masks = []
    for a, perm in enumerate(perms):
        vols = jnp.transpose(probs, (0,) + tuple(p + 1 for p in perm))
        na = n[:, perm[2]]
        safe = jnp.where(jnp.abs(na) < 1e-12, 1e-12, na)
        slopes = jnp.stack(
            [n[:, perm[0]] / safe, n[:, perm[1]] / safe], axis=-1
        )
        # items not on this axis would have |slope| > 1: clamp (their
        # results are discarded by the select below).
        slopes = jnp.clip(slopes, -1.0, 1.0)
        m = _pool_one_axis(vols, slopes, D=D, interpret=interpret)
        inv = tuple(int(np.argsort(perm)[i]) + 1 for i in range(3))
        masks.append(jnp.transpose(m, (0,) + inv))

    stacked = jnp.stack(masks)  # (3, N, D, D, D)
    sel = jnp.take_along_axis(
        stacked, axis[None, :, None, None, None], axis=0
    )[0]
    return sel > 0.5
