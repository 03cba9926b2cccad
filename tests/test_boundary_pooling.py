"""Cross-cube ray pooling (VERDICT r1 item 2; SURVEY.md SS7 hard part).

The failure mode of per-cube segment pooling: a ray grazing a cube
boundary keeps a weak voxel as "this cube's ray max" even though the true
(stronger) maximum lies just across the face in the neighbor cube.  The
windowed ray max + core claiming must kill it; the legacy segment mode
(pool_window_vox=0) must exhibit the artifact (this is the regression
contract — if legacy stops failing, the scenario is no longer probing the
boundary).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from surfacenet_tpu.config import Config, FusionConfig, SweepConfig, VoxelConfig
from surfacenet_tpu.geometry.camera import look_at_projection
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.parallel.sweep_sharded import run_sweep_sharded


S = 1.0  # voxel size (mm)
D = 16
OVERLAP = 8  # stride 8: cube k covers x in [8k, 8k+16)


def _config(window):
    # affine pooling: the production TPU mode, and the one that assigns
    # near-collinear voxels to the same ray by true geometry (the exact
    # raster mode quantizes to pixel cells, so two voxels 2 apart on one
    # ray can straddle a cell edge — an inherent property of pixel-ray
    # rasterization, orthogonal to the cube-boundary mechanics under test).
    return Config(
        voxel=VoxelConfig(voxel_size_mm=S, cube_size=D, overlap=OVERLAP),
        fusion=FusionConfig(
            n_view_pairs=1, tau=0.3, gamma=0.1, n_pool_views=2,
            pool_window_vox=window, ray_pool_mode="affine",
        ),
        sweep=SweepConfig(cube_batch=4, prefilter=False),
    )


@pytest.fixture(scope="module")
def boundary_scene():
    """Two probability peaks on the same +x ray, 2 voxels apart, straddling
    a cube face.

    Scene bbox [0, 32mm)^3 at s=1mm/D=16/overlap=8 -> cube x-origins
    {0, 8, 16, 24}mm.  The weak ghost sits at voxel x=23 (just inside cube
    origin-8's volume [8, 24)); the strong peak at x=25 (just OUTSIDE it).
    Cube origin-8's per-cube segment max on that ray is therefore the ghost
    (the true max is invisible to it), cube origin-16 (volume [16, 32))
    sees both and votes the ghost down — a 1/2 = 0.5 overlap vote, which
    passes: the classic boundary artifact.  Windowed pooling + core
    claiming instead assigns both voxels to cube origin-16's core
    [20, 28), whose +-window ray max sees the strong peak 2 voxels away
    and kills the ghost.  Cameras look along -x so both peaks share rays.
    """
    hw = (64, 64)
    center = np.array([16.0, 16.0, 16.0])
    # two cameras looking down the x axis (slightly offset so the pair has
    # a baseline), plus nothing else: pooling views = these two.
    up = np.array([0.0, 0.0, 1.0])
    principal = (hw[1] / 2, hw[0] / 2)
    Ps = np.stack([
        look_at_projection(
            np.array([200.0, 26.0, 16.0]), center, up, 300.0, principal
        ),
        look_at_projection(
            np.array([200.0, 6.0, 16.0]), center, up, 300.0, principal
        ),
    ])
    images = np.random.default_rng(0).uniform(
        0.3, 0.7, (2, *hw, 3)
    ).astype(np.float32)

    strong = np.array([25.5, 16.5, 16.5])  # voxel-center x = 25
    weak = np.array([23.5, 16.5, 16.5])  # voxel-center x = 23

    def predictor(x, origins):
        from surfacenet_tpu.geometry.camera import voxel_centers
        import jax

        def one(origin):
            c = voxel_centers(origin, D, S)
            d_strong = jnp.linalg.norm(c - strong, axis=-1)
            d_weak = jnp.linalg.norm(c - weak, axis=-1)
            return jnp.maximum(
                0.95 * jnp.exp(-((d_strong / S) ** 2)),
                0.60 * jnp.exp(-((d_weak / S) ** 2)),
            )

        return jax.vmap(one)(origins)

    return dict(
        images=images, Ps=Ps, predictor=predictor,
        bbox_min=np.zeros(3), bbox_max=np.full(3, 32.0),
        strong=strong, weak=weak,
    )


def _sweep_points(scene, cfg, sharded=False):
    if sharded:
        store, _ = run_sweep_sharded(
            scene["images"], scene["Ps"], scene["bbox_min"],
            scene["bbox_max"], cfg, scene["predictor"],
        )
    else:
        store, _ = run_sweep(
            scene["images"], scene["Ps"], scene["bbox_min"],
            scene["bbox_max"], cfg, scene["predictor"],
        )
    pts, _, _ = store.merge()
    return pts


def _has_point_near(pts, target, r=0.9):
    if len(pts) == 0:
        return False
    return bool((np.linalg.norm(pts - target, axis=-1) < r).any())


def test_segment_mode_exhibits_boundary_artifact(boundary_scene):
    """Legacy per-cube segment pooling keeps the cross-boundary ghost."""
    pts = _sweep_points(boundary_scene, _config(window=0))
    assert _has_point_near(pts, boundary_scene["strong"])
    assert _has_point_near(pts, boundary_scene["weak"]), (
        "segment mode no longer keeps the ghost — scenario not probing "
        "the boundary anymore; rebuild the fixture"
    )


def test_windowed_pooling_kills_cross_boundary_ghost(boundary_scene):
    """Windowed max + core claiming: the ray's true max (in the neighbor
    cube's claim region) suppresses the ghost; the real surface stays."""
    pts = _sweep_points(boundary_scene, _config(window=4))
    assert _has_point_near(pts, boundary_scene["strong"])
    assert not _has_point_near(pts, boundary_scene["weak"])


def test_windowed_pooling_auto_window(boundary_scene):
    """Default config (pool_window_vox=-1 -> min(2, overlap//2)=2) passes."""
    pts = _sweep_points(boundary_scene, _config(window=-1))
    assert _has_point_near(pts, boundary_scene["strong"])
    assert not _has_point_near(pts, boundary_scene["weak"])


def test_windowed_pooling_sharded_matches_unsharded(boundary_scene):
    """block_axis=2 sharded sweep: same claims, same merged points."""
    cfg = _config(window=4)
    cfg = dataclasses.replace(
        cfg, mesh=dataclasses.replace(cfg.mesh, block_axis=2)
    )
    pts_sharded = _sweep_points(boundary_scene, cfg, sharded=True)
    pts = _sweep_points(boundary_scene, _config(window=4))
    assert len(pts_sharded) == len(pts)
    a = pts[np.lexsort(pts.T)]
    b = pts_sharded[np.lexsort(pts_sharded.T)]
    np.testing.assert_allclose(a, b, atol=1e-5)
