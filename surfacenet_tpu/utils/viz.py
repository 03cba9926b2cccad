"""Lightweight point-cloud visualization (inspection/debug artifact).

Orthographic splat renders of a reconstruction along the three axes —
enough to eyeball a .ply without external tooling.  Pure numpy + PIL.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def splat_orthographic(
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    axis: int = 2,
    size: int = 512,
    pad: float = 0.05,
) -> np.ndarray:
    """Render points orthographically along an axis (max-depth splats).

    Args:
      points: (N, 3); colors: (N, 3) float [0,1] (default height-coded).
      axis: projection axis (dropped dimension).
      size: output image side (pixels).

    Returns:
      (size, size, 3) uint8 image.
    """
    if len(points) == 0:
        return np.zeros((size, size, 3), np.uint8)
    keep = [a for a in range(3) if a != axis]
    uv = points[:, keep]
    depth = points[:, axis]
    lo = uv.min(axis=0)
    hi = uv.max(axis=0)
    span = max((hi - lo).max(), 1e-6)
    lo = lo - pad * span
    span = span * (1 + 2 * pad)
    px = np.clip(((uv - lo) / span * (size - 1)).astype(int), 0, size - 1)

    if colors is None:
        t = (depth - depth.min()) / max(np.ptp(depth), 1e-6)
        colors = np.stack([t, 0.4 + 0.3 * t, 1.0 - t], axis=-1)

    img = np.zeros((size, size, 3), np.float32)
    zbuf = np.full((size, size), -np.inf, np.float32)
    # max-depth splat: vectorized via depth-sorted assignment (later wins)
    order = np.argsort(depth)
    img[px[order, 1], px[order, 0]] = colors[order]
    zbuf[px[order, 1], px[order, 0]] = depth[order]
    img = np.flipud(img)
    return np.clip(img * 255, 0, 255).astype(np.uint8)


def save_turntable(
    path_prefix: str,
    points: np.ndarray,
    colors: Optional[np.ndarray] = None,
    size: int = 512,
) -> Tuple[str, str, str]:
    """Write three axis-aligned splat renders: <prefix>_{xy,xz,yz}.png."""
    from PIL import Image

    names = []
    for axis, tag in [(2, "xy"), (1, "xz"), (0, "yz")]:
        img = splat_orthographic(points, colors, axis=axis, size=size)
        p = f"{path_prefix}_{tag}.png"
        Image.fromarray(img).save(p)
        names.append(p)
    return tuple(names)
