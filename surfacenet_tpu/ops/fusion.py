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


def fuse_pairs_consensus(
    probs: jnp.ndarray,
    weights: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    beta: float = 8.0,
    deadband: float = 0.1,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Consensus-reweighted fusion (SURVEY.md C6/C7 occlusion robustness).

    Two-pass robust aggregation: fuse once with the geometric weights,
    correlate each pair's probability volume with the preliminary fusion
    (masked zero-mean cosine over the cube's voxels), then re-fuse with
    outlier pairs downweighted.  A pair containing an occluded or
    specularity-corrupted view predicts surface mass that disagrees with
    the majority consensus at VOXEL granularity.  Measured with the
    shipped trained weights at the production operating point
    (results/occlusion_r04.json): occluded golden scene 0.62x geometric
    (a 38% win) but clean sphere 1.12x — the deadband default below is
    calibrated to the ORACLE regime's correlation spread (where clean
    is 0.99x, tests/test_occlusion.py), not the trained model's, so
    this mode is OPT-IN; the clean-safe production occlusion path is
    ``--pairnet`` (select_pairs_learned_local: 0.54x occluded, 1.018x
    clean at the same operating point).

    Clean-scene safety mirrors ``consensus_gates``'s flat deadband:
    pairs whose correlation is within ``deadband`` of the cube's best
    pair keep their geometric weight EXACTLY (g = 1), so agreeing pairs
    reproduce plain ``fuse_pairs`` and only genuine dissenters decay
    (g = exp(beta * (corr - max + deadband)) < 1).  Empty cubes: the
    preliminary fusion is ~constant, correlations ~0 for every pair,
    all inside the deadband -> identical to ``fuse_pairs``.

    Args:
      probs: (Npairs, D, D, D) per-pair surface probabilities.
      weights: (Npairs,) geometric pair weights.
      valid: optional (Npairs, D, D, D) bool frustum mask.
      beta: decay sharpness per unit correlation deficit.
      deadband: correlation slack that keeps full weight.

    Returns:
      (D, D, D) fused probability.
    """
    v = (
        valid.astype(probs.dtype) if valid is not None
        else jnp.ones_like(probs)
    )
    # leave-one-out consensus per pair: with Nv of 3-5 a pair's own
    # contribution dominates its correlation with the plain fusion and
    # masks dissent; exclude it from the reference it is judged against.
    w = weights[:, None, None, None] * v
    num_all = jnp.sum(w * probs, axis=0, keepdims=True)
    den_all = jnp.sum(w, axis=0, keepdims=True)
    f_loo = (num_all - w * probs) / (den_all - w + eps)  # (Npairs, D,D,D)
    cnt = jnp.sum(v, axis=(1, 2, 3), keepdims=True) + eps
    pm = jnp.sum(probs * v, axis=(1, 2, 3), keepdims=True) / cnt
    fm = jnp.sum(f_loo * v, axis=(1, 2, 3), keepdims=True) / cnt
    pc = (probs - pm) * v
    fc = (f_loo - fm) * v
    num = jnp.sum(pc * fc, axis=(1, 2, 3))
    den = jnp.sqrt(
        jnp.sum(pc * pc, axis=(1, 2, 3)) * jnp.sum(fc * fc, axis=(1, 2, 3))
    ) + eps
    corr = num / den  # (Npairs,)
    gate = jnp.exp(
        beta * jnp.minimum(corr - jnp.max(corr) + deadband, 0.0)
    )
    return fuse_pairs(probs, weights * gate, valid)


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
