"""Affine (sheared-slab) ray pooling vs the exact raster implementation."""

import numpy as np
import jax.numpy as jnp

from surfacenet_tpu.geometry.camera import look_at_projection
from surfacenet_tpu.ops.ray_pooling import (
    ray_max_mask_affine,
    ray_max_mask_single_view,
    ray_pool,
)


def _camera(eye, focal=40.0):
    return look_at_projection(
        np.asarray(eye, float), np.zeros(3), np.array([0, 0, 1.0]),
        focal, (64.0, 64.0),
    )


def test_affine_matches_exact_far_camera():
    """Far camera => perspective ~ affine => the two modes agree closely."""
    rng = np.random.default_rng(0)
    D, s = 16, 2.0
    prob = rng.uniform(size=(D, D, D)).astype(np.float32)
    origin = np.array([-16.0, -16.0, -16.0], np.float32)
    # distance 2000mm >> cube 32mm; focal scaled so footprint ~ D pixels
    P = _camera([2000.0, 50.0, 30.0], focal=1000.0)

    exact = np.asarray(
        ray_max_mask_single_view(
            jnp.asarray(prob), jnp.asarray(origin), s,
            jnp.asarray(P, jnp.float32),
        )
    )
    affine = np.asarray(
        ray_max_mask_affine(
            jnp.asarray(prob), jnp.asarray(origin), s,
            jnp.asarray(P, jnp.float32),
        )
    )
    # masks agree on the vast majority of voxels
    agree = (exact == affine).mean()
    assert agree > 0.95, f"agreement {agree:.3f}"


def test_affine_axis_aligned_column_max():
    """Camera exactly along +x: rays = x-columns; affine mode must reduce to
    an exact per-column argmax."""
    rng = np.random.default_rng(1)
    D, s = 8, 2.0
    prob = rng.uniform(size=(D, D, D)).astype(np.float32)
    origin = np.array([-8.0, -8.0, -8.0], np.float32)
    P = _camera([3000.0, 0.0, 0.0], focal=2000.0)

    mask = np.asarray(
        ray_max_mask_affine(
            jnp.asarray(prob), jnp.asarray(origin), s,
            jnp.asarray(P, jnp.float32),
        )
    )
    ref = prob >= prob.max(axis=0, keepdims=True) - 1e-6
    assert (mask == ref).mean() > 0.99


def test_affine_mode_through_ray_pool():
    rng = np.random.default_rng(2)
    D, s = 8, 2.0
    prob = rng.uniform(size=(D, D, D)).astype(np.float32)
    origin = np.array([-8.0, -8.0, -8.0], np.float32)
    Ps = jnp.asarray(
        np.stack(
            [_camera([2000.0, 0, 0], 1000.0), _camera([0, 2000.0, 0], 1000.0)]
        ),
        jnp.float32,
    )
    occ_e, _ = ray_pool(
        jnp.asarray(prob), jnp.asarray(origin), s, Ps, 0.3, 0.9,
        mode="exact",
    )
    occ_a, _ = ray_pool(
        jnp.asarray(prob), jnp.asarray(origin), s, Ps, 0.3, 0.9,
        mode="affine",
    )
    # similar sparsity and large overlap
    e = np.asarray(occ_e)
    a = np.asarray(occ_a)
    assert a.sum() > 0
    inter = (e & a).sum()
    union = max((e | a).sum(), 1)
    assert inter / union > 0.7, f"IoU {inter/union:.2f}"
