"""View-pair probability fusion (SURVEY.md C7, paper SS5.1).

Per-voxel fused probability over the Nv selected view pairs of a cube:

    p(x) = sum_ij w_ij * p_ij(x) / sum_ij w_ij

All shapes static; batched over cubes with vmap/sharding.
"""

from __future__ import annotations

import jax.numpy as jnp


def fuse_pairs(
    probs: jnp.ndarray,
    weights: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Weighted average of per-pair probability volumes.

    Args:
      probs: (Npairs, D, D, D) per-pair surface probabilities.
      weights: (Npairs,) non-negative pair weights (from the pair net +
        geometric features; SURVEY.md C6).
      valid: optional (Npairs, D, D, D) bool — voxels where the pair's CVC
        was inside both frusta; invalid voxels drop out of the average.

    Returns:
      (D, D, D) fused probability.
    """
    w = weights[:, None, None, None]
    if valid is not None:
        w = w * valid.astype(probs.dtype)
    num = jnp.sum(w * probs, axis=0)
    den = jnp.sum(w, axis=0)
    return num / (den + eps)


def adaptive_threshold(
    fused: jnp.ndarray,
    taus: jnp.ndarray,
    target_density: float,
) -> jnp.ndarray:
    """Pick, per cube, the threshold whose occupancy is closest to a target.

    The paper's adaptive-threshold variant tunes the binarization cut per
    region (SURVEY.md C8).  Static-shape formulation: evaluate every candidate
    tau, select by density distance — a lax-friendly argmin, no host loop.

    Args:
      fused: (..., D, D, D) fused probabilities (leading batch dims ok).
      taus: (T,) candidate thresholds.
      target_density: desired fraction of occupied voxels.

    Returns:
      tau_star: (...) chosen threshold per cube.
    """
    occ = (
        fused[..., None, :, :, :] > taus[:, None, None, None]
    )  # (..., T, D, D, D)
    dens = jnp.mean(occ.astype(jnp.float32), axis=(-1, -2, -3))  # (..., T)
    idx = jnp.argmin(jnp.abs(dens - target_density), axis=-1)
    return taus[idx]
