"""Pinhole camera model and projection geometry (SURVEY.md C2).

The reference parses per-view 3x4 projection matrices from DTU ``pos/*.txt``
calibration files and uses them to project voxel centers into images.  Here
the camera is a pure-functional JAX module: every function is shape-static,
vmappable, and differentiable, so the same code runs on host (numpy-like) and
inside jitted TPU programs.

Conventions:
  * ``P`` is a 3x4 projection matrix mapping homogeneous world points (mm) to
    homogeneous pixel coordinates: ``[u*w, v*w, w]^T = P @ [X, Y, Z, 1]^T``.
  * Pixel coordinates are (u, v) = (column, row), origin at the top-left.
  * A batch of cameras is an array of shape (V, 3, 4).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def precise_divide(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """Division with a Newton-Raphson-refined reciprocal.

    The TPU VPU's f32 reciprocal is ~2^-8 accurate and XLA may lower ``x/y``
    to it directly; for pixel coordinates ~10^3 px that is a 1-3 PIXEL
    error — fatal for warping/sampling.  One refinement step squares the
    error (~2^-16, <0.01 px); on exact-division backends it is a no-op.

    The optimization_barrier is load-bearing: XLA's algebraic simplifier
    (--xla_allow_excess_precision) otherwise folds ``inv*(2 - den*inv)``
    right back into ``1/den``.
    """
    inv = jax.lax.optimization_barrier(1.0 / den)
    inv = inv * (2.0 - den * inv)
    return num * inv


def project(P: jnp.ndarray, pts: jnp.ndarray, eps: float = 1e-8):
    """Project world points into pixel coordinates.

    Args:
      P: (..., 3, 4) projection matrix/matrices.
      pts: (..., N, 3) world points in mm.

    Returns:
      uv: (..., N, 2) pixel coordinates (u=col, v=row).
      depth: (..., N) homogeneous scale w (positive = in front of camera for
        standard DTU-style P with det(M) > 0).
    """
    pts_h = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    # HIGHEST: the default TPU matmul precision is bf16; P entries are ~1e4
    # so bf16 rounding is a 1-3 PIXEL projection error.  K=4, so full-f32
    # passes are free.
    proj = jnp.einsum(
        "...ij,...nj->...ni", P, pts_h,
        precision=jax.lax.Precision.HIGHEST,
    )
    w = proj[..., 2]
    uv = precise_divide(proj[..., :2], (w[..., None] + eps))
    return uv, w


def camera_center(P: jnp.ndarray) -> jnp.ndarray:
    """Camera center C from P = K[R|t]: the null space, C = -M^{-1} p4.

    Args:
      P: (..., 3, 4).
    Returns:
      (..., 3) world-space camera center in mm.
    """
    M = P[..., :, :3]
    p4 = P[..., :, 3]
    return -jnp.linalg.solve(M, p4[..., None])[..., 0]


def look_at_projection(
    eye: np.ndarray,
    target: np.ndarray,
    up: np.ndarray,
    focal_px: float,
    principal: Tuple[float, float],
) -> np.ndarray:
    """Build a synthetic 3x4 projection matrix (host-side, numpy).

    Used by the synthetic-scene generator and tests; DTU matrices are instead
    parsed from calibration files.  +z of the camera frame points from eye
    toward target (points in front have positive depth).
    """
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)  # image v grows downward
    R = np.stack([right, down, fwd], axis=0)  # world -> cam
    t = -R @ eye
    K = np.array(
        [
            [focal_px, 0.0, principal[0]],
            [0.0, focal_px, principal[1]],
            [0.0, 0.0, 1.0],
        ]
    )
    return (K @ np.concatenate([R, t[:, None]], axis=1)).astype(np.float64)


def baseline_angle(P_a: jnp.ndarray, P_b: jnp.ndarray, point: jnp.ndarray):
    """Cosine of the angle at `point` subtended by the two camera centers.

    The geometric feature used in view-pair scoring (SURVEY.md C6): small
    baseline angles give poor triangulation, very wide ones poor matching.
    """
    ca = camera_center(P_a)
    cb = camera_center(P_b)
    va = ca - point
    vb = cb - point
    va = va / (jnp.linalg.norm(va, axis=-1, keepdims=True) + 1e-8)
    vb = vb / (jnp.linalg.norm(vb, axis=-1, keepdims=True) + 1e-8)
    return jnp.sum(va * vb, axis=-1)


def in_frustum(
    P: jnp.ndarray,
    pts: jnp.ndarray,
    image_hw: Tuple[int, int],
    margin: float = 0.0,
) -> jnp.ndarray:
    """Boolean mask: which points project inside the image with positive depth.

    Args:
      P: (3, 4) or (V, 3, 4).
      pts: (N, 3).
      image_hw: (H, W).
    Returns:
      (N,) or (V, N) bool.
    """
    uv, w = project(P, pts)
    h, wpx = image_hw
    u, v = uv[..., 0], uv[..., 1]
    return (
        (w > 0)
        & (u >= -margin)
        & (u <= wpx - 1 + margin)
        & (v >= -margin)
        & (v <= h - 1 + margin)
    )


def cube_corners(origin: jnp.ndarray, extent_mm: float) -> jnp.ndarray:
    """The 8 corners of an axis-aligned cube. origin: (..., 3) -> (..., 8, 3)."""
    offs = jnp.array(
        [
            [0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
            [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1],
        ],
        dtype=origin.dtype,
    )
    return origin[..., None, :] + extent_mm * offs


def cube_visible(
    P: jnp.ndarray,
    origin: jnp.ndarray,
    extent_mm: float,
    image_hw: Tuple[int, int],
    margin: float = 0.0,
) -> jnp.ndarray:
    """True if any corner of the cube is inside view frustum(s).

    Args:
      P: (V, 3, 4).  origin: (..., 3).
    Returns:
      (..., V) bool: per-view visibility of the cube.
    """
    corners = cube_corners(origin, extent_mm)  # (..., 8, 3)
    flat = corners.reshape((-1, 3))
    vis = in_frustum(P, flat, image_hw, margin)  # (V, prod*8)
    vis = vis.reshape(P.shape[0], *corners.shape[:-2], 8)
    vis = jnp.any(vis, axis=-1)  # (V, ...)
    return jnp.moveaxis(vis, 0, -1)


def estimate_bbox_from_cameras(
    Ps: np.ndarray,
    size_factor: float = 0.6,
) -> Tuple[np.ndarray, np.ndarray]:
    """Estimate a scene bbox from calibrated cameras alone.

    The reference hardcodes per-dataset bounding boxes; when none is given
    we use the cameras' geometry: all principal rays (optical axes) of a
    capture rig converge near the scanned object, so the least-squares
    closest point to all principal rays is a robust scene center, and the
    median camera-to-center distance sets the scale.

    Args:
      Ps: (V, 3, 4) projection matrices.
      size_factor: bbox half-side as a fraction of the median camera
        distance (0.6 comfortably covers DTU-style table-top rigs).

    Returns:
      (bbox_min, bbox_max) as (3,) float64 arrays.
    """
    Ps = np.asarray(Ps, np.float64)
    centers = []
    dirs = []
    for P in Ps:
        M = P[:, :3]
        c = -np.linalg.solve(M, P[:, 3])
        # principal ray: third row of M points along the optical axis
        d = M[2] / np.linalg.norm(M[2])
        if np.linalg.det(M) < 0:
            d = -d
        centers.append(c)
        dirs.append(d)
    centers = np.stack(centers)
    dirs = np.stack(dirs)

    # least-squares point closest to all lines c_i + t d_i:
    # sum_i (I - d d^T) x = sum_i (I - d d^T) c
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for c, d in zip(centers, dirs):
        Pm = np.eye(3) - np.outer(d, d)
        A += Pm
        b += Pm @ c
    target = np.linalg.solve(A, b)

    dist = np.median(np.linalg.norm(centers - target, axis=1))
    half = size_factor * dist / 2.0
    return target - half, target + half


def voxel_centers(origin: jnp.ndarray, D: int, s: float) -> jnp.ndarray:
    """World coordinates of the D^3 voxel centers of a cube.

    Voxel (i, j, k) has center ``origin + s * ([i, j, k] + 0.5)`` so the cube
    spans ``[origin, origin + s*D)``.

    Args:
      origin: (3,) cube min-corner in mm.
    Returns:
      (D, D, D, 3) float array.
    """
    r = (jnp.arange(D, dtype=origin.dtype) + 0.5) * s
    gi, gj, gk = jnp.meshgrid(r, r, r, indexing="ij")
    return origin + jnp.stack([gi, gj, gk], axis=-1)
