"""Colored Voxel Cube (CVC) construction — the perspective-warp gather.

Reference behavior (SURVEY.md C4): for a cube (origin, D^3 voxels of size s)
and a view v, project every voxel center through the 3x4 matrix P_v and
sample the image color there (bilinear), producing CVC in R^{D^3 x 3}; a view
*pair* concatenates two CVCs into 6 channels for the 3D CNN.

TPU-first design notes:
  * The whole computation is expressed as dense, static-shape tensor algebra:
    one (D^3 x 4) @ (4 x 3) matmul for the projection and a vectorized
    bilinear gather.  ``vmap`` batches it over cubes x views so XLA sees one
    large fused program instead of a per-cube Python loop.
  * Out-of-frustum voxels are masked to a fill value (and a validity mask is
    returned) instead of branching — no data-dependent control flow.
  * A Pallas kernel specializing the gather (image crop tiles resident in
    VMEM) lives in ``surfacenet_tpu/ops/pallas/warp_gather.py``; this module
    is the XLA-path oracle it is tested against.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from surfacenet_tpu.geometry.camera import voxel_centers


def bilinear_sample(
    image: jnp.ndarray, uv: jnp.ndarray, fill: float = 0.0
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear sampling of an image at fractional pixel coordinates.

    Args:
      image: (H, W, C).
      uv: (..., 2) with u = column, v = row (camera.project convention).
      fill: value used outside the image.

    Returns:
      colors: (..., C); valid: (...,) bool mask (True = fully inside image).
    """
    H, W, C = image.shape
    u = uv[..., 0]
    v = uv[..., 1]

    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)

    valid = (u >= 0) & (u <= W - 1) & (v >= 0) & (v <= H - 1)

    u0c = jnp.clip(u0i, 0, W - 1)
    u1c = jnp.clip(u0i + 1, 0, W - 1)
    v0c = jnp.clip(v0i, 0, H - 1)
    v1c = jnp.clip(v0i + 1, 0, H - 1)

    # Four corner gathers; XLA lowers these to vector gathers over HBM.
    c00 = image[v0c, u0c]
    c01 = image[v0c, u1c]
    c10 = image[v1c, u0c]
    c11 = image[v1c, u1c]

    w00 = ((1 - dv) * (1 - du))[..., None]
    w01 = ((1 - dv) * du)[..., None]
    w10 = (dv * (1 - du))[..., None]
    w11 = (dv * du)[..., None]

    out = c00 * w00 + c01 * w01 + c10 * w10 + c11 * w11
    out = jnp.where(valid[..., None], out, fill)
    return out, valid


def build_cvc(
    image: jnp.ndarray,
    P: jnp.ndarray,
    origin: jnp.ndarray,
    D: int,
    s: float,
    center_colors: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build one Colored Voxel Cube.

    Args:
      image: (H, W, C) float in [0, 1].
      P: (3, 4) projection matrix.
      origin: (3,) cube min corner (mm).
      D: cube side in voxels (static).
      s: voxel size in mm.
      center_colors: subtract the mean color of valid voxels (reference
        normalizes CVC colors; SURVEY.md C4).

    Returns:
      cvc: (D, D, D, C); valid: (D, D, D) bool.
    """
    from surfacenet_tpu.geometry.camera import precise_divide

    centers = voxel_centers(origin, D, s)  # (D, D, D, 3)
    flat = centers.reshape(-1, 3)
    ones = jnp.ones((flat.shape[0], 1), flat.dtype)
    # HIGHEST precision: default bf16 MXU rounding of ~1e4-magnitude P
    # entries costs 1-3 px of sampling position (K=4, so it is free).
    proj = jax.lax.dot_general(
        jnp.concatenate([flat, ones], axis=-1), P.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )  # (D^3, 3)
    w = proj[:, 2]
    # precise_divide: TPU approximate-reciprocal division costs 1-3 px here
    uv = precise_divide(proj[:, :2], w[:, None] + 1e-8)
    colors, valid = bilinear_sample(image, uv)
    valid = valid & (w > 0)
    colors = jnp.where(valid[:, None], colors, 0.0)

    if center_colors:
        denom = jnp.maximum(jnp.sum(valid), 1).astype(colors.dtype)
        mean = jnp.sum(colors, axis=0) / denom
        colors = jnp.where(valid[:, None], colors - mean, 0.0)

    C = image.shape[-1]
    return colors.reshape(D, D, D, C), valid.reshape(D, D, D)


def center_cvc(colors: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Subtract the mean color over valid voxels; zero invalid voxels.

    Args:
      colors: (..., D, D, D, C); valid: (..., D, D, D).
    """
    v = valid[..., None]
    denom = jnp.maximum(
        jnp.sum(v, axis=(-4, -3, -2), keepdims=True), 1
    ).astype(colors.dtype)
    mean = jnp.sum(
        jnp.where(v, colors, 0.0), axis=(-4, -3, -2), keepdims=True
    ) / denom
    return jnp.where(v, colors - mean, 0.0)


def build_cvc_pair(
    image_a: jnp.ndarray,
    image_b: jnp.ndarray,
    P_a: jnp.ndarray,
    P_b: jnp.ndarray,
    origin: jnp.ndarray,
    D: int,
    s: float,
    center_colors: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CVC pair -> (D, D, D, 2C) input tensor + joint validity mask."""
    cvc_a, va = build_cvc(image_a, P_a, origin, D, s, center_colors)
    cvc_b, vb = build_cvc(image_b, P_b, origin, D, s, center_colors)
    return jnp.concatenate([cvc_a, cvc_b], axis=-1), va & vb


def build_cvc_views(
    images: jnp.ndarray,
    Ps: jnp.ndarray,
    view_idx: jnp.ndarray,
    origins: jnp.ndarray,
    D: int,
    s: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uncentered single-view CVCs for (cube, view) work items.

    Same contract as the Pallas kernel (ops/pallas/warp_gather.py
    ``warp_gather_pallas``) — this is its XLA-path oracle.

    Args:
      view_idx: (B,) int32; origins: (B, 3).
    Returns:
      colors: (B, D, D, D, 3); valid: (B, D, D, D).
    """

    def one(vi, origin):
        return build_cvc(
            images[vi], Ps[vi], origin, D, s, center_colors=False
        )

    return jax.vmap(one)(view_idx, origins)


def build_cvc_batch(
    images: jnp.ndarray,
    Ps: jnp.ndarray,
    pair_idx: jnp.ndarray,
    origins: jnp.ndarray,
    D: int,
    s: float,
    center_colors: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched CVC-pair construction over (cube x view-pair) work items.

    This replaces the reference's sequential per-cube loop: the full batch is
    one traced program; XLA fuses projection matmuls and gathers across the
    batch.

    Args:
      images: (V, H, W, C) all scan images (device-resident).
      Ps: (V, 3, 4).
      pair_idx: (B, 2) int32 view indices per work item.
      origins: (B, 3) cube origins per work item.

    Returns:
      x: (B, D, D, D, 2C); valid: (B, D, D, D).
    """

    def one(pi, origin):
        ia = images[pi[0]]
        ib = images[pi[1]]
        return build_cvc_pair(
            ia, ib, Ps[pi[0]], Ps[pi[1]], origin, D, s, center_colors
        )

    return jax.vmap(one)(pair_idx, origins)
