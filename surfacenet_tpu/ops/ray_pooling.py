"""Ray pooling: view-consistent thinning of the fused probability volume.

Reference behavior (SURVEY.md C8, paper SS5.2-5.3): after fusion and
binarization at tau, thin the occupancy so surfaces are ~1 voxel thick: along
each camera viewing ray through the cube, keep only the voxel(s) with locally
maximal fused probability; gamma controls the retention criterion.  The exact
reference rule is marked *re-verify* in SURVEY.md (mount was empty); the rule
implemented here is:

    a voxel survives iff it is the ray-maximum in at least
    ceil(gamma * n_views) of the pooling views, and p > tau.

TPU-first design: per view this is a segmented max over "which voxels share a
pixel" — implemented as a static-shape scatter-max into a cube-local raster
window followed by a gather-back and equality test.  No sorting, no dynamic
shapes, no host loop; vmapped over views and over cubes.

The raster window is anchored at the integer floor of the cube footprint's
minimum pixel, so local pixel ids coincide with the true image pixel grid
(rays are genuine camera rays), while the buffer stays a small static
(R x R) regardless of image resolution.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from surfacenet_tpu.geometry.camera import project, voxel_centers

NEG = -1e30


def ray_max_mask_single_view(
    prob: jnp.ndarray,
    origin: jnp.ndarray,
    s: float,
    P: jnp.ndarray,
    raster_size: int = 128,
    auto_scale: bool = True,
    window: int = 0,
) -> jnp.ndarray:
    """Per-voxel mask: is this voxel the max-probability voxel on its ray?

    Args:
      prob: (D, D, D) fused probability.
      origin: (3,) cube origin (mm).
      s: voxel size (mm).
      P: (3, 4) projection matrix of the pooling view.
      raster_size: R, static side of the local raster window (pixels).  Must
        cover the cube's projected footprint; voxels falling outside the
        window are conservatively kept out of the max (mask False).
      auto_scale: when the image resolution is finer than the voxel
        footprint, native pixel rays are narrower than a voxel and thinning
        degenerates (every voxel is its own ray).  With auto_scale the ray
        raster is coarsened so one ray is ~one voxel footprint — and the
        cube's footprint always fits the static window.
      window: 0 = segment semantics (max over the ray's whole intersection
        with this volume — the reference's per-cube chop).  > 0 = WINDOWED
        semantics: a voxel survives if it is the max within ~±window voxels
        of ray depth.  Windowed is the cross-cube-consistent rule: combined
        with core claiming (cubes claim only voxels >= window voxels from
        their faces, which the sweep overlap provides), every claimed
        voxel's comparison window lies inside its own cube, so boundary
        pooling is exact with zero communication.  Implemented as a
        depth-binned scatter-max (bin = window voxels of metric ray depth;
        compare own + adjacent bins), so the effective window is in
        [window, 3*window) depending on bin alignment — it errs on the
        thinning side.

    Returns:
      (D, D, D) bool.
    """
    D = prob.shape[0]
    centers = voxel_centers(origin.astype(jnp.float32), D, s).reshape(-1, 3)
    uv, w = project(P, centers)
    infront = w > 0
    u = uv[:, 0]
    v = uv[:, 1]

    big = jnp.float32(1e9)
    u_min = jnp.min(jnp.where(infront, u, big))
    v_min = jnp.min(jnp.where(infront, v, big))
    if auto_scale:
        u_max = jnp.max(jnp.where(infront, u, -big))
        v_max = jnp.max(jnp.where(infront, v, -big))
        extent = jnp.maximum(u_max - u_min, v_max - v_min)
        # one ray ~ one voxel column (a face-on cube footprint spans D
        # columns); never finer than 1 px or coarser than the window allows.
        scale = jnp.maximum(extent / D, 1.0)
        scale = jnp.maximum(scale, (extent + 1.0) / (raster_size - 1))
    else:
        scale = jnp.float32(1.0)

    ui = jnp.floor(u / scale).astype(jnp.int32)
    vi = jnp.floor(v / scale).astype(jnp.int32)
    big_i = jnp.int32(2**30)
    u_min_i = jnp.min(jnp.where(infront, ui, big_i))
    v_min_i = jnp.min(jnp.where(infront, vi, big_i))
    uu = ui - u_min_i
    vv = vi - v_min_i

    R = raster_size
    inside = infront & (uu >= 0) & (uu < R) & (vv >= 0) & (vv < R)
    pid = jnp.clip(vv * R + uu, 0, R * R - 1)

    pf = prob.reshape(-1)
    contrib = jnp.where(inside, pf, NEG)

    if window <= 0:
        buf = jnp.full((R * R,), NEG, prob.dtype).at[pid].max(contrib)
        ray_max = buf[pid]
    else:
        # metric ray depth: w / ||P[2,:3]|| is depth in mm for any row
        # scaling of P; bin by `window` voxels of depth.
        depth = w / (jnp.linalg.norm(P[2, :3]) + 1e-12)
        bin_mm = window * s
        # depth range inside the cube spans <= D*sqrt(3) voxels
        NB = int(np.ceil(D * 1.7322 / window)) + 2
        dmin = jnp.min(jnp.where(infront, depth, big))
        b = jnp.clip(
            jnp.floor((depth - dmin) / bin_mm).astype(jnp.int32), 0, NB - 1
        )
        buf = jnp.full((R * R * NB,), NEG, prob.dtype).at[
            pid * NB + b
        ].max(contrib)
        buf2 = buf.reshape(R * R, NB)
        own = buf2[pid, b]
        lo = jnp.where(b > 0, buf2[pid, jnp.maximum(b - 1, 0)], NEG)
        hi = jnp.where(
            b < NB - 1, buf2[pid, jnp.minimum(b + 1, NB - 1)], NEG
        )
        ray_max = jnp.maximum(own, jnp.maximum(lo, hi))
    is_max = inside & (pf >= ray_max - 1e-6) & (ray_max > NEG / 2)
    return is_max.reshape(D, D, D)


def _projection_jacobian(P: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """d(u,v)/d(world xyz) of the perspective projection at point x. (2,3)."""
    xh = jnp.concatenate([x, jnp.ones((1,), x.dtype)])
    num = P[:2] @ xh  # (2,)
    den = P[2] @ xh  # ()
    return (P[:2, :3] * den - num[:, None] * P[2, :3][None]) / (den * den)


def _shift2d(slab: jnp.ndarray, oi: jnp.ndarray, oj: jnp.ndarray, fill):
    """Shift a (D, D) slab by integer offsets, filling with `fill`.

    Entry [i, j] of the result is slab[i - oi, j - oj] (out of range -> fill).
    Implemented as pad + dynamic_slice: dense, no gathers.
    """
    D = slab.shape[0]
    padded = jnp.full((3 * D, 3 * D), fill, slab.dtype)
    padded = jax.lax.dynamic_update_slice(padded, slab, (D, D))
    return jax.lax.dynamic_slice(padded, (D - oi, D - oj), (D, D))


def ray_max_mask_affine(
    prob: jnp.ndarray,
    origin: jnp.ndarray,
    s: float,
    P: jnp.ndarray,
    window: int = 0,
) -> jnp.ndarray:
    """Affine-approximation ray-max mask: no scatters, no gathers.

    Within a cube whose extent is small relative to the camera distance,
    the perspective map is near-affine; viewing rays are then straight lines
    in voxel space with direction n = null(d(uv)/dxyz).  Grouping voxels
    into rays becomes a SHEARED COLUMN MAX along the dominant axis of n:
    slab t is shifted by round(n_perp/n_axis * t) and max-reduced — D dense
    (D, D) shifts + maxes on the VPU, instead of a 32k-element scatter-max
    per view.  Ray raster is voxel-matched by construction.

    Error sources vs the exact rule (ray_max_mask_single_view): perspective
    curvature O(cube_extent/distance) and +-0.5 voxel shear rounding —
    acceptable for thinning (the gamma vote absorbs ray misassignment);
    mode-selectable via FusionConfig.ray_pool_mode.

    window: 0 = segment max over the volume (reference per-cube semantics);
    > 0 = sliding max over +-window slabs along the dominant ray axis (the
    cross-cube-consistent rule; see ray_max_mask_single_view).  In the
    sheared frame the windowed ray max is an exact 1-D max-pool over the
    slab axis — no binning approximation.
    """
    D = prob.shape[0]
    center = origin.astype(jnp.float32) + 0.5 * D * s
    A = _projection_jacobian(P, center)  # (2, 3) d(uv)/dxyz
    n = jnp.cross(A[0], A[1])  # ray direction in world = voxel space (iso s)

    # dominant axis: static 3-way branch keeps everything dense
    a = jnp.argmax(jnp.abs(n))

    def pooled(perm):
        # permute prob so the dominant axis is LAST; offsets for the two
        # leading axes come from the matching components of n.
        p = jnp.transpose(prob, perm)
        na = n[perm[2]]
        n0 = n[perm[0]]
        n1 = n[perm[1]]
        safe = jnp.where(jnp.abs(na) < 1e-12, 1e-12, na)
        sl0 = n0 / safe
        sl1 = n1 / safe

        ts = jnp.arange(D) - D // 2
        oi = jnp.round(sl0 * ts).astype(jnp.int32)  # (D,)
        oj = jnp.round(sl1 * ts).astype(jnp.int32)

        # 1) sheared accumulation: shift every slab at once (vmapped
        #    dynamic_slice = one batched op, not a serial loop), then a
        #    max-reduce over t (global, or sliding-window for windowed
        #    cross-cube-consistent pooling).
        shifted = jax.vmap(
            lambda t: _shift2d(p[:, :, t], oi[t], oj[t], NEG),
        )(jnp.arange(D))  # (D, D, D) with t leading

        if window > 0:
            W = jax.lax.reduce_window(
                shifted, NEG, jax.lax.max,
                (2 * window + 1, 1, 1), (1, 1, 1), "SAME",
            )  # (D, D, D) t leading: per-slab windowed ray max
            ray_max = jax.vmap(
                lambda t: _shift2d(W[t], -oi[t], -oj[t], NEG)
            )(jnp.arange(D))
        else:
            M = jnp.max(shifted, axis=0)  # (D, D)
            # 2) broadcast back: ray_max for slab t = M shifted by -offs(t)
            ray_max = jax.vmap(
                lambda t: _shift2d(M, -oi[t], -oj[t], NEG)
            )(jnp.arange(D))  # (D, D, D) t leading
        ray_max = jnp.moveaxis(ray_max, 0, -1)
        is_max = p >= ray_max - 1e-6
        inv = np.argsort(perm)
        return jnp.transpose(is_max, tuple(inv))

    return jax.lax.switch(
        a,
        [
            lambda: pooled((1, 2, 0)),
            lambda: pooled((0, 2, 1)),
            lambda: pooled((0, 1, 2)),
        ],
    )


def ray_max_mask_affine_matmul(
    probs: jnp.ndarray,  # (N, D, D, D) per-item probability volumes
    origins: jnp.ndarray,  # (N, 3)
    s: float,
    Ps: jnp.ndarray,  # (N, 3, 4) per-item pooling view
    window: int = 0,
) -> jnp.ndarray:
    """Batched affine ray-max mask via one-hot SHIFT MATMULS (MXU form).

    Same semantics as vmap(ray_max_mask_affine) and the Pallas rotate
    kernel (ops/pallas/affine_pool.py) — a third implementation of the
    sheared-slab ray max, shaped for the MXU: the per-slab integer shift
    ``sh[t, i, j] = vol[t, i-oi_t, j-oj_t]`` is a batched contraction with
    one-hot selection matrices ``Arow[t, i, r] = [r == i-oi_t]`` (and the
    unshear is the adjoint contraction with the same matrices).  That
    replaces the rotate kernel's ~4*D serial VPU rotates per item with 4
    batched (D, D)@(D, D) matmuls per slab — measured ~4x faster at the
    sweep's operating point, because the rotates are latency-bound on the
    sequential Pallas grid while the MXU is idle during pooling anyway.

    Out-of-range shear targets are masked to NEG before the max; the
    adjoint's out-of-range unshear rows produce ray_max 0, which marks the
    voxel ray-max exactly like the rotate kernel's NEG fill does (probs
    are >= 0): a ray that exits the comparison volume keeps its voxel.

    Precision: the contractions run at Precision.HIGHEST.  At the TPU
    default the f32 probability operand is truncated to bf16 through the
    MXU, and near-tie ray maxima flip the mask on ~3% (window=0) to ~14%
    (window=1) of voxels vs the oracle; HIGHEST restores exact agreement
    (the selection matrices are exact 0/1, so the contraction is then a
    lossless permutation).  Re-measured on v5e at HIGHEST (see the
    affine_matmul row in scripts/pool_mode_bench.py): the MXU form no
    longer beats the Pallas rotate kernel at the sweep's operating point,
    so it ships as the experimental ray_pool_mode="affine_matmul" rather
    than the default.
    """
    D = probs.shape[1]
    N = probs.shape[0]
    centers = origins.astype(jnp.float32) + 0.5 * D * s
    A = jax.vmap(_projection_jacobian)(Ps, centers)  # (N, 2, 3)
    n = jnp.cross(A[:, 0], A[:, 1])  # (N, 3) ray direction
    axis = jnp.argmax(jnp.abs(n), axis=-1)  # (N,)

    ts = (jnp.arange(D) - D // 2).astype(jnp.float32)  # (D,)
    ii = jnp.arange(D)
    f32 = jnp.float32

    perms = [(1, 2, 0), (0, 2, 1), (0, 1, 2)]  # (o1, o2, dominant)
    masks = []
    for a, perm in enumerate(perms):
        # layout: dominant (slab) axis FIRST, then (o1, o2)
        order = (perm[2], perm[0], perm[1])
        vols = jnp.transpose(probs, (0,) + tuple(p + 1 for p in order))
        na = n[:, perm[2]]
        safe = jnp.where(jnp.abs(na) < 1e-12, 1e-12, na)
        sl0 = jnp.clip(n[:, perm[0]] / safe, -1.0, 1.0)  # (N,)
        sl1 = jnp.clip(n[:, perm[1]] / safe, -1.0, 1.0)
        oi = jnp.round(sl0[:, None] * ts).astype(jnp.int32)  # (N, D)
        oj = jnp.round(sl1[:, None] * ts).astype(jnp.int32)

        # one-hot shift matrices + in-range masks
        src_i = ii[None, None, :, None] - oi[:, :, None, None]  # (N,D,D,1)
        Arow = (src_i == ii[None, None, None, :]).astype(f32)  # (N,D,D,D)
        src_j = ii[None, None, :, None] - oj[:, :, None, None]
        Acol = (src_j == ii[None, None, None, :]).astype(f32)
        vr = (src_i[..., 0] >= 0) & (src_i[..., 0] < D)  # (N, D, D) rows
        vc = (src_j[..., 0] >= 0) & (src_j[..., 0] < D)  # (N, D, D) cols

        hi = jax.lax.Precision.HIGHEST
        # shear: sh[t,i,j] = vols[t, i-oi_t, j-oj_t]
        sh = jnp.einsum("ntir,ntrj->ntij", Arow, vols.astype(f32),
                        precision=hi)
        sh = jnp.einsum("ntjc,ntic->ntij", Acol, sh, precision=hi)
        valid = vr[:, :, :, None] & vc[:, :, None, :]
        sh = jnp.where(valid, sh, NEG)

        if window > 0:
            pad = jnp.pad(
                sh, ((0, 0), (window, window), (0, 0), (0, 0)),
                constant_values=NEG,
            )
            M = sh
            for k in range(2 * window + 1):
                M = jnp.maximum(M, pad[:, k : k + D])
        else:
            M = jnp.broadcast_to(jnp.max(sh, axis=1, keepdims=True), sh.shape)

        # unshear (adjoint): rm[t,r,c] = M[t, r+oi_t, c+oj_t]
        rm = jnp.einsum("ntjc,ntij->ntic", Acol, M, precision=hi)
        rm = jnp.einsum("ntir,ntic->ntrc", Arow, rm, precision=hi)
        is_max = vols >= rm - 1e-6

        inv = tuple(int(i) + 1 for i in np.argsort(order))
        masks.append(jnp.transpose(is_max, (0,) + inv))

    ax = axis[:, None, None, None]
    return jnp.where(ax == 0, masks[0], jnp.where(ax == 1, masks[1], masks[2]))


def ray_pool(
    prob: jnp.ndarray,
    origin: jnp.ndarray,
    s: float,
    Ps: jnp.ndarray,
    tau: jnp.ndarray | float,
    gamma: float,
    raster_size: int = 128,
    auto_scale: bool = True,
    mode: str = "exact",
    view_mask: jnp.ndarray | None = None,
    window: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full thinning for one cube.  mode: "exact" (scatter-max raster) or
    "affine" (sheared-slab approximation, ~100x cheaper on TPU).
    window > 0 switches from per-cube segment max to the windowed
    (cross-cube-consistent) ray max; see ray_max_mask_single_view.

    Args:
      prob: (D, D, D) fused probability.
      Ps: (Vr, 3, 4) pooling-view projections (typically the views of the
        fused pairs).
      tau: binarization threshold (scalar or per-cube from
        fusion.adaptive_threshold).
      gamma: retention fraction over views.
      view_mask: optional (Vr,) bool; False marks padding slots (duplicate
        views from static-shape dedup) that must not vote nor count toward
        the gamma denominator.

    Returns:
      occupancy: (D, D, D) bool thin surface voxels.
      votes: (D, D, D) int32 number of views voting voxel as ray-max.
    """
    if mode == "affine":
        masks = jax.vmap(
            lambda P: ray_max_mask_affine(prob, origin, s, P, window)
        )(Ps)
    else:
        masks = jax.vmap(
            lambda P: ray_max_mask_single_view(
                prob, origin, s, P, raster_size, auto_scale, window
            )
        )(Ps)
    if view_mask is not None:
        masks = masks & view_mask[:, None, None, None]
        n_views = jnp.sum(view_mask.astype(jnp.int32))
    else:
        n_views = Ps.shape[0]
    votes = jnp.sum(masks.astype(jnp.int32), axis=0)
    need = jnp.maximum(jnp.ceil(gamma * n_views).astype(jnp.int32), 1)
    occ = (votes >= need) & (prob > tau)
    return occ, votes


def ray_pool_batch(
    probs: jnp.ndarray,
    origins: jnp.ndarray,
    s: float,
    Ps: jnp.ndarray,
    taus: jnp.ndarray,
    gamma: float,
    raster_size: int = 128,
    auto_scale: bool = True,
    mode: str = "exact",
    window: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """vmap of ray_pool over a batch of cubes.

    Args:
      probs: (B, D, D, D); origins: (B, 3); Ps: (B, Vr, 3, 4) or (Vr, 3, 4)
      shared; taus: (B,) or scalar.
    """
    if Ps.ndim == 3:
        Ps = jnp.broadcast_to(Ps, (probs.shape[0],) + Ps.shape)
    taus = jnp.broadcast_to(jnp.asarray(taus), (probs.shape[0],))
    return jax.vmap(
        lambda p, o, P, t: ray_pool(
            p, o, s, P, t, gamma, raster_size, auto_scale, mode,
            window=window,
        )
    )(probs, origins, Ps, taus)
