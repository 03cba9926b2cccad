"""Pallas TPU kernel for affine (sheared-slab) ray pooling.

The XLA formulation of the affine ray-max (ops/ray_pooling.py::
ray_max_mask_affine) vmaps dynamic-sliced 2D shifts, which XLA lowers to
gathers — the exact thing the affine mode exists to avoid.  In Pallas the
same shifts are dynamic lane/sublane ROTATES (tpu.dynamic_rotate) of a
NEG-padded (2D, 2D) tile with static reads — wraparound lands in the
padding, so a circular roll realizes the shift exactly.  Per (cube, view)
item that is 2*D tiny VPU rotates — microseconds, no gathers.

The dominant ray axis varies per item; rather than data-dependent
transposes, the wrapper runs the kernel once per axis permutation on
pre-transposed volumes and selects per item (3x a tiny cost).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _shifted_slab(slab: jnp.ndarray, oi, oj, D: int) -> jnp.ndarray:
    """(D, D) -> (D, D): out[i, j] = slab[i-oi, j-oj], NEG outside.

    Circular roll of a (2D, 2D) NEG-padded tile: for |o| <= D the
    wrapped-around content lands in the padding, so the top-left (D, D)
    window of the rolled tile is exactly the shifted slab.
    Lane-dim rotates need >=128 lanes; width pads to a 128 multiple.
    """
    L = max(2 * D, 128)
    top = jnp.concatenate(
        [slab, jnp.full((D, L - D), NEG, jnp.float32)], axis=1
    )  # (D, L)
    buf = jnp.concatenate(
        [top, jnp.full((D, L), NEG, jnp.float32)], axis=0
    )  # (2D, L)
    buf = pltpu.roll(buf, oi, 0)
    buf = pltpu.roll(buf, oj, 1)
    return buf[:D, :D]


def _affine_pool_kernel(
    slopes_ref,  # (N, 3) f32 scalar prefetch: (sl0, sl1, active) per item
    vol_ref,  # (1, D, D, D) f32 VMEM: dominant (depth) axis FIRST of the
    #           three spatial dims — dynamic slab indexing must hit an
    #           untiled leading axis, never the (8,128)-tiled trailing two
    mask_ref,  # (1, D, D, D) f32 VMEM out: 1.0 where ray-max
    sheared_ref,  # (D, D, D) f32 VMEM scratch: sheared stack (windowed mode)
    *,
    D: int,
    window: int = 0,
):
    item = pl.program_id(0)
    sl0 = slopes_ref[item, 0]
    sl1 = slopes_ref[item, 1]
    # the wrapper runs all 3 axis permutations and selects per item; the
    # active flag skips the ~4D VPU rotates for the two discarded perms
    # (their output block is left unwritten — garbage, but dropped by the
    # wrapper's select), cutting pool VPU work ~3x.
    active = slopes_ref[item, 2] > 0.0

    def offs(t):
        tf = (t - D // 2).astype(jnp.float32)
        oi = jnp.round(sl0 * tf).astype(jnp.int32)
        oj = jnp.round(sl1 * tf).astype(jnp.int32)
        return oi, oj

    def shifted(slab, oi, oj):
        return _shifted_slab(slab, oi, oj, D)

    if window > 0:
        # windowed (cross-cube-consistent) ray max: store the sheared
        # stack, then per-slab max over +-window neighbors before the
        # unshear-and-compare.  Costs one extra (D, D, D) VMEM scratch and
        # D*(2*window+1) elementwise maxes — still VPU-trivial.
        @pl.when(active)
        def _windowed():
            def store(t, _):
                oi, oj = offs(t)
                sheared_ref[t] = shifted(vol_ref[0, t], oi, oj)
                return 0

            jax.lax.fori_loop(0, D, store, 0)

            def back_w(t, _):
                def wmax(k, M):
                    tt = t - window + k
                    ok = (tt >= 0) & (tt < D)
                    v = sheared_ref[jnp.clip(tt, 0, D - 1)]
                    return jnp.maximum(
                        M, jnp.where(ok, v, jnp.float32(NEG))
                    )

                W = jax.lax.fori_loop(
                    0, 2 * window + 1, wmax,
                    jnp.full((D, D), NEG, jnp.float32),
                )
                oi, oj = offs(t)
                rm = shifted(W, -oi, -oj)
                mask_ref[0, t] = (
                    vol_ref[0, t] >= rm - 1e-6
                ).astype(jnp.float32)
                return 0

            jax.lax.fori_loop(0, D, back_w, 0)

        return

    @pl.when(active)
    def _segment():
        # pass 1: M[p, q] = max_t shifted slab t
        def acc(t, M):
            oi, oj = offs(t)
            return jnp.maximum(M, shifted(vol_ref[0, t], oi, oj))

        M = jax.lax.fori_loop(
            0, D, acc, jnp.full((D, D), NEG, jnp.float32)
        )

        # pass 2: ray_max for slab t = M shifted back; mask = vol >= max
        def back(t, _):
            oi, oj = offs(t)
            rm = shifted(M, -oi, -oj)
            mask_ref[0, t] = (
                vol_ref[0, t] >= rm - 1e-6
            ).astype(jnp.float32)
            return 0

        jax.lax.fori_loop(0, D, back, 0)


@functools.partial(jax.jit, static_argnames=("D", "window", "interpret"))
def _pool_one_axis(
    vols: jnp.ndarray,  # (N, D, D, D) pre-transposed, dominant axis last
    slopes: jnp.ndarray,  # (N, 3): (sl0, sl1, active)
    *,
    D: int,
    window: int = 0,
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
        # the sheared-stack scratch is only touched in windowed mode; do
        # not reserve D^3 f32 of scoped VMEM (1 MiB at D=64) for segment
        # mode.
        scratch_shapes=(
            [pltpu.VMEM((D, D, D), jnp.float32)] if window > 0 else []
        ),
    )
    kern = functools.partial(_affine_pool_kernel, D=D, window=window)
    if window <= 0:

        def kern(slopes_ref, vol_ref, mask_ref):  # noqa: F811
            _affine_pool_kernel(
                slopes_ref, vol_ref, mask_ref, None, D=D, window=window
            )

    (mask,) = pl.pallas_call(
        kern,
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
    window: int = 0,
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

    perms = [(1, 2, 0), (0, 2, 1), (0, 1, 2)]  # (o1, o2, dominant)
    masks = []
    for a, perm in enumerate(perms):
        # kernel layout: depth (dominant axis) FIRST, then (o1, o2)
        order = (perm[2], perm[0], perm[1])
        vols = jnp.transpose(probs, (0,) + tuple(p + 1 for p in order))
        na = n[:, perm[2]]
        safe = jnp.where(jnp.abs(na) < 1e-12, 1e-12, na)
        slopes = jnp.stack(
            [n[:, perm[0]] / safe, n[:, perm[1]] / safe], axis=-1
        )
        # items not on this axis would have |slope| > 1: clamp (their
        # results are discarded by the select below).
        slopes = jnp.clip(slopes, -1.0, 1.0)
        # active flag: the kernel skips the rotate loops for items whose
        # dominant axis is a different perm (output discarded below).
        slopes = jnp.concatenate(
            [slopes, (axis == a).astype(jnp.float32)[:, None]], axis=-1
        )
        m = _pool_one_axis(
            vols, slopes, D=D, window=window, interpret=interpret
        )
        inv = tuple(int(i) + 1 for i in np.argsort(order))
        masks.append(jnp.transpose(m, (0,) + inv))

    # per-item select between the three axis results.  Elementwise where
    # chain, NOT take_along_axis: XLA lowers the latter to a gather over
    # the full (3, N, D^3) stack (gathers are the pathological op on TPU;
    # the whole kernel above exists to avoid them).
    ax = axis[:, None, None, None]
    sel = jnp.where(
        ax == 0, masks[0], jnp.where(ax == 1, masks[1], masks[2])
    )
    return sel > 0.5


def _affine_vote_kernel(
    slopes_ref,  # (N, K, 3) f32 scalar prefetch: (sl0, sl1, active)
    vol_ref,  # (1, D, D, D) f32 VMEM: dominant (depth) axis FIRST
    votes_ref,  # (1, D, D, D) f32 VMEM out: active-view ray-max vote sum
    sheared_ref,  # (D, D, D) f32 VMEM scratch (windowed mode; else None)
    *,
    D: int,
    K: int,
    window: int = 0,
):
    """Vote-accumulating variant of _affine_pool_kernel.

    Instead of one mask per (cube, view) item, the grid is one program per
    CUBE; the K pooling views whose dominant ray axis matches this kernel's
    permutation (active flag) run back-to-back in VMEM and accumulate their
    ray-max masks into a single per-cube vote volume.  The per-view masks
    (and the K-repeated probability volumes the flattened form needs) never
    touch HBM — kernel I/O drops from Nc*K to Nc blocks per permutation.
    """
    item = pl.program_id(0)

    def zero(t, _):
        votes_ref[0, t] = jnp.zeros((D, D), jnp.float32)
        return 0

    jax.lax.fori_loop(0, D, zero, 0)

    for k in range(K):
        sl0 = slopes_ref[item, k, 0]
        sl1 = slopes_ref[item, k, 1]
        active = slopes_ref[item, k, 2] > 0.0

        def offs(t, sl0=sl0, sl1=sl1):
            tf = (t - D // 2).astype(jnp.float32)
            oi = jnp.round(sl0 * tf).astype(jnp.int32)
            oj = jnp.round(sl1 * tf).astype(jnp.int32)
            return oi, oj

        if window > 0:

            @pl.when(active)
            def _one_view(offs=offs):
                def store(t, _):
                    oi, oj = offs(t)
                    sheared_ref[t] = _shifted_slab(vol_ref[0, t], oi, oj, D)
                    return 0

                jax.lax.fori_loop(0, D, store, 0)

                def back_w(t, _):
                    def wmax(kk, M):
                        tt = t - window + kk
                        ok = (tt >= 0) & (tt < D)
                        v = sheared_ref[jnp.clip(tt, 0, D - 1)]
                        return jnp.maximum(
                            M, jnp.where(ok, v, jnp.float32(NEG))
                        )

                    W = jax.lax.fori_loop(
                        0, 2 * window + 1, wmax,
                        jnp.full((D, D), NEG, jnp.float32),
                    )
                    oi, oj = offs(t)
                    rm = _shifted_slab(W, -oi, -oj, D)
                    votes_ref[0, t] = votes_ref[0, t] + (
                        vol_ref[0, t] >= rm - 1e-6
                    ).astype(jnp.float32)
                    return 0

                jax.lax.fori_loop(0, D, back_w, 0)

        else:

            @pl.when(active)
            def _one_view(offs=offs):
                def acc(t, M):
                    oi, oj = offs(t)
                    return jnp.maximum(
                        M, _shifted_slab(vol_ref[0, t], oi, oj, D)
                    )

                M = jax.lax.fori_loop(
                    0, D, acc, jnp.full((D, D), NEG, jnp.float32)
                )

                def back(t, _):
                    oi, oj = offs(t)
                    rm = _shifted_slab(M, -oi, -oj, D)
                    votes_ref[0, t] = votes_ref[0, t] + (
                        vol_ref[0, t] >= rm - 1e-6
                    ).astype(jnp.float32)
                    return 0

                jax.lax.fori_loop(0, D, back, 0)


@functools.partial(
    jax.jit, static_argnames=("D", "K", "window", "interpret")
)
def _vote_one_axis(
    vols: jnp.ndarray,  # (N, D, D, D) pre-transposed, dominant axis at dim 1
    slopes: jnp.ndarray,  # (N, K, 3): (sl0, sl1, active)
    *,
    D: int,
    K: int,
    window: int = 0,
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
        scratch_shapes=(
            [pltpu.VMEM((D, D, D), jnp.float32)] if window > 0 else []
        ),
    )
    kern = functools.partial(
        _affine_vote_kernel, D=D, K=K, window=window
    )
    if window <= 0:

        def kern(slopes_ref, vol_ref, votes_ref):  # noqa: F811
            _affine_vote_kernel(
                slopes_ref, vol_ref, votes_ref, None, D=D, K=K,
                window=window,
            )

    (votes,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, D, D, D), jnp.float32)],
        interpret=interpret,
    )(slopes.astype(jnp.float32), vols.astype(jnp.float32))
    return votes


def ray_vote_affine_pallas(
    probs: jnp.ndarray,  # (N, D, D, D) per-cube fused probability volumes
    origins: jnp.ndarray,  # (N, 3)
    s: float,
    Ps_pool: jnp.ndarray,  # (N, K, 3, 4) pooling views per cube
    view_mask: jnp.ndarray,  # (N, K) bool; False = padded slot (no vote)
    window: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused per-cube ray-max VOTE via the Pallas rotate kernel.

    Semantically equal to summing ``ray_max_mask_affine(probs[i], ...,
    Ps_pool[i, k])`` over the unmasked views k (the ray_pool vote) — but
    the (N, K, D^3) per-view masks and the K-repeated probability volumes
    of the flattened mask API are never materialized in HBM.  Per axis
    permutation the kernel streams each cube's volume ONCE and loops its
    matching views in VMEM; HBM traffic per batch drops from O(N*K*D^3)
    to O(N*D^3) (measured: the pool stage is HBM-bound, ~3-4x at K=6).

    Returns votes (N, D, D, D) int32.
    """
    from surfacenet_tpu.ops.ray_pooling import _projection_jacobian

    N, D = probs.shape[0], probs.shape[1]
    K = Ps_pool.shape[1]
    centers = origins.astype(jnp.float32) + 0.5 * D * s  # (N, 3)

    A = jax.vmap(
        jax.vmap(_projection_jacobian, in_axes=(0, None))
    )(Ps_pool, centers)  # (N, K, 2, 3)
    n = jnp.cross(A[:, :, 0], A[:, :, 1])  # (N, K, 3) ray directions
    axis = jnp.argmax(jnp.abs(n), axis=-1)  # (N, K)

    perms = [(1, 2, 0), (0, 2, 1), (0, 1, 2)]  # (o1, o2, dominant)
    total = None
    for a, perm in enumerate(perms):
        order = (perm[2], perm[0], perm[1])
        vols = jnp.transpose(probs, (0,) + tuple(p + 1 for p in order))
        na = n[..., perm[2]]
        safe = jnp.where(jnp.abs(na) < 1e-12, 1e-12, na)
        slopes = jnp.stack(
            [
                jnp.clip(n[..., perm[0]] / safe, -1.0, 1.0),
                jnp.clip(n[..., perm[1]] / safe, -1.0, 1.0),
                ((axis == a) & view_mask).astype(jnp.float32),
            ],
            axis=-1,
        )  # (N, K, 3)
        v = _vote_one_axis(
            vols, slopes, D=D, K=K, window=window, interpret=interpret
        )
        inv = tuple(int(i) + 1 for i in np.argsort(order))
        vt = jnp.transpose(v, (0,) + inv)
        total = vt if total is None else total + vt
    return total.astype(jnp.int32)
