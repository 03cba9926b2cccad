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


def test_affine_matmul_matches_oracle():
    """ray_max_mask_affine_matmul is documented equivalent to
    vmap(ray_max_mask_affine); assert exact agreement at window 0 and 1
    (ADVICE r2: this shipped untested and a TPU-precision bug hid here —
    the einsums now run at Precision.HIGHEST so agreement is exact)."""
    import jax

    from surfacenet_tpu.ops.ray_pooling import ray_max_mask_affine_matmul

    rng = np.random.default_rng(3)
    D, s = 16, 2.0
    N = 6
    probs = rng.uniform(size=(N, D, D, D)).astype(np.float32)
    origins = np.tile(
        np.array([-16.0, -16.0, -16.0], np.float32), (N, 1)
    )
    eyes = [
        [2000.0, 50.0, 30.0], [0.0, 2000.0, 100.0], [30.0, -60.0, 2000.0],
        [-2000.0, 0.0, 0.0], [1500.0, 1500.0, 10.0], [10.0, 1400.0, -1500.0],
    ]
    Ps = np.stack([_camera(e, focal=1000.0) for e in eyes]).astype(np.float32)

    for window in (0, 1):
        oracle = np.asarray(
            jax.vmap(
                lambda p, o, P: ray_max_mask_affine(
                    p, o, s, P, window=window
                )
            )(jnp.asarray(probs), jnp.asarray(origins), jnp.asarray(Ps))
        )
        got = np.asarray(
            ray_max_mask_affine_matmul(
                jnp.asarray(probs), jnp.asarray(origins), s,
                jnp.asarray(Ps), window=window,
            )
        )
        agree = (oracle == got).mean()
        assert agree == 1.0, f"window={window}: agreement {agree:.4f}"


def test_affine_matmul_mode_in_sweep():
    """ray_pool_mode='affine_matmul' runs through cube_batch_step and
    matches the 'affine' mode's occupancy (same semantics, MXU form)."""
    from surfacenet_tpu.config import Config, FusionConfig, SweepConfig, VoxelConfig
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.pipeline.sweep import (
        photoconsistency_predictor, run_sweep,
    )

    scene = make_sphere_scene(n_views=4, hw=(90, 120))
    outs = {}
    for mode in ("affine", "affine_matmul"):
        cfg = Config(
            voxel=VoxelConfig(voxel_size_mm=4.0, cube_size=8, overlap=2),
            fusion=FusionConfig(
                n_view_pairs=2, tau=0.2, gamma=0.5, ray_pool_mode=mode,
                n_pool_views=4,
            ),
            sweep=SweepConfig(cube_batch=4),
        )
        store, stats = run_sweep(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            cfg, photoconsistency_predictor,
        )
        pts, probs, colors = store.merge()
        outs[mode] = np.asarray(pts)
    assert len(outs["affine_matmul"]) == len(outs["affine"])
    a = {tuple(p) for p in np.round(outs["affine"], 3)}
    b = {tuple(p) for p in np.round(outs["affine_matmul"], 3)}
    assert a == b
