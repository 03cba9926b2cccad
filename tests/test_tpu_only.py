"""TPU-hardware regression tests (skipped on the CPU test mesh).

Run directly on a TPU host with:  python -m pytest tests/test_tpu_only.py
(without the conftest CPU forcing — i.e. JAX_PLATFORMS unset).  These
encode the compiled-kernel agreements that were verified manually on v5e:
the numerics bugs in ARCHITECTURE.md SS"TPU numerics findings" would all be
caught here.
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu",
    reason="requires real TPU (conftest forces CPU for the main suite)",
)


def test_pallas_warp_gather_matches_oracle_on_tpu():
    import jax.numpy as jnp

    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.ops.cvc import build_cvc
    from surfacenet_tpu.ops.pallas.warp_gather import warp_gather_pallas

    D, s = 32, 0.8
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    pts = scene.surface_points(4, seed=1)
    origins = jnp.asarray((pts - D * s / 2).astype(np.float32))
    views = jnp.asarray(np.array([6, 5, 4, 2], np.int32))

    colors, valid = warp_gather_pallas(
        images, Ps, views, origins, D=D, s=s, CH=192, CW=256
    )
    colors = np.asarray(colors)
    valid = np.asarray(valid)
    for b in range(4):
        ref, rv = build_cvc(
            images[views[b]], Ps[views[b]], origins[b], D, s,
            center_colors=False,
        )
        both = np.asarray(rv) & valid[b]
        err = np.abs(colors[b] - np.asarray(ref))[both]
        assert err.max() < 2e-2, f"item {b}: max err {err.max()}"


def test_tiled_gather_64_matches_oracle_on_tpu():
    """64^3 gather via 32^3 sub-cube tiling (production large-D path) on
    real hardware, bf16 crop streaming."""
    import jax.numpy as jnp

    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.ops.cvc import build_cvc
    from surfacenet_tpu.ops.pallas.warp_gather import (
        auto_crop_hw, gather_tile_d, warp_gather_tiled,
    )

    D, s = 64, 0.8
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    pts = scene.surface_points(2, seed=4)
    origins = jnp.asarray((pts - D * s / 2).astype(np.float32))
    views = jnp.asarray(np.array([3, 7], np.int32))
    CH, CW = auto_crop_hw(
        scene.Ps, scene.bbox_min, scene.bbox_max, gather_tile_d(D), s,
        scene.images.shape[1:3],
    )

    colors, valid = warp_gather_tiled(
        images, Ps, views, origins, D=D, s=s, CH=CH, CW=CW
    )
    colors = np.asarray(colors)
    valid = np.asarray(valid)
    for b in range(2):
        ref, rv = build_cvc(
            images[views[b]], Ps[views[b]], origins[b], D, s,
            center_colors=False,
        )
        both = np.asarray(rv) & valid[b]
        assert both.mean() > 0.5  # crops must cover most of the cube
        err = np.abs(colors[b] - np.asarray(ref))[both]
        assert err.max() < 2e-2, f"item {b}: max err {err.max()}"


def test_projection_precision_on_tpu():
    """The bf16-matmul projection bug: uv must match float64 within 0.05px."""
    import jax.numpy as jnp

    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.geometry.camera import project, voxel_centers

    scene = make_sphere_scene(n_views=4, hw=(600, 800), radius=30.0)
    origin = jnp.asarray(np.array([10.0, -5.0, 3.0], np.float32))
    c = voxel_centers(origin, 16, 0.8).reshape(-1, 3)
    uv, w = project(jnp.asarray(scene.Ps[0], jnp.float32), c)

    c64 = np.asarray(c).astype(np.float64)
    ph = np.concatenate([c64, np.ones((len(c64), 1))], 1) @ scene.Ps[0].T
    uv64 = ph[:, :2] / ph[:, 2:3]
    err = np.abs(np.asarray(uv) - uv64).max()
    assert err < 0.05, f"projection error {err:.3f}px (bf16 matmul bug?)"


def test_pallas_affine_pool_matches_oracle_on_tpu():
    import jax.numpy as jnp

    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.ops.pallas.affine_pool import (
        ray_max_mask_affine_pallas,
    )
    from surfacenet_tpu.ops.ray_pooling import ray_max_mask_affine

    D, s = 32, 0.8
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    rng = np.random.default_rng(0)
    N = 6
    probs = jnp.asarray(rng.uniform(size=(N, D, D, D)).astype(np.float32))
    pts = scene.surface_points(N, seed=1)
    origins = jnp.asarray((pts - D * s / 2).astype(np.float32))
    Ps = jnp.asarray(scene.Ps[rng.integers(0, 8, N)], jnp.float32)

    got = np.asarray(ray_max_mask_affine_pallas(probs, origins, s, Ps))
    for i in range(N):
        ref = np.asarray(
            ray_max_mask_affine(probs[i], origins[i], s, Ps[i])
        )
        assert (got[i] == ref).mean() > 0.99


def test_pallas_affine_vote_matches_oracle_on_tpu():
    import jax.numpy as jnp

    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.ops.pallas.affine_pool import ray_vote_affine_pallas
    from surfacenet_tpu.ops.ray_pooling import ray_max_mask_affine

    D, s = 32, 0.8
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    rng = np.random.default_rng(3)
    N, K = 4, 4
    probs = jnp.asarray(rng.uniform(size=(N, D, D, D)).astype(np.float32))
    pts = scene.surface_points(N, seed=2)
    origins = jnp.asarray((pts - D * s / 2).astype(np.float32))
    views = rng.integers(0, 8, (N, K))
    Ps_pool = jnp.asarray(scene.Ps[views], jnp.float32)
    view_mask = np.ones((N, K), bool)
    view_mask[1, 3] = False

    for window in (0, 2):
        got = np.asarray(
            ray_vote_affine_pallas(
                probs, origins, s, Ps_pool, jnp.asarray(view_mask),
                window=window,
            )
        )
        ref = np.zeros((N, D, D, D), np.int64)
        for i in range(N):
            for k in range(K):
                if view_mask[i, k]:
                    ref[i] += np.asarray(
                        ray_max_mask_affine(
                            probs[i], origins[i], s, Ps_pool[i, k],
                            window=window,
                        )
                    ).astype(np.int64)
        assert (got == ref).mean() > 0.99, f"window={window}"
