"""Golden end-to-end sweep on the synthetic sphere (SURVEY.md SS4).

Uses the model-free photo-consistency predictor so the geometry + fusion +
thinning + merge pipeline is validated independently of training.
"""

import dataclasses

import numpy as np

from surfacenet_tpu.config import Config, FusionConfig, SweepConfig, VoxelConfig
from surfacenet_tpu.pipeline.sweep import (
    enumerate_cubes,
    photoconsistency_predictor,
    prefilter_cubes,
    run_sweep,
)
from surfacenet_tpu.utils.metrics import accuracy_completeness


def _config():
    return Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        fusion=FusionConfig(n_view_pairs=3, tau=0.25, gamma=0.6),
        sweep=SweepConfig(cube_batch=8),
    )


def test_enumerate_cubes_covers_bbox():
    cfg = _config()
    grid, origins = enumerate_cubes(
        np.array([-40.0, -40.0, -40.0]), np.array([40.0, 40.0, 40.0]), cfg
    )
    assert len(grid) == len(origins)
    # cubes cover the whole bbox: last cube must reach past bbox_max
    D_mm = cfg.voxel.cube_size * cfg.voxel.voxel_size_mm
    assert (origins.max(axis=0) + D_mm >= 40.0).all()
    assert (origins.min(axis=0) <= -40.0).all()


def test_prefilter_drops_out_of_frustum(sphere_scene):
    cfg = _config()
    origins = np.array(
        [[-16.0, -16.0, -16.0], [5000.0, 5000.0, 5000.0]]
    )
    keep = prefilter_cubes(
        sphere_scene.Ps, origins, sphere_scene.images.shape[1:3], cfg
    )
    assert keep.tolist() == [True, False]


def _analytic_predictor(scene, cfg):
    """Oracle with access to the true surface: p = exp(-(d/s)^2).

    Validates everything downstream of the CVC gather — fusion, thresholds,
    ray pooling, overlap merge, coordinate bookkeeping — with tight bounds.
    """
    import jax
    import jax.numpy as jnp

    from surfacenet_tpu.geometry.camera import voxel_centers

    center = jnp.asarray(scene.center, jnp.float32)
    radius = scene.radius
    D = cfg.voxel.cube_size
    s = cfg.voxel.voxel_size_mm

    def predict(x, origins):
        def one(origin):
            c = voxel_centers(origin, D, s)
            d = jnp.abs(jnp.linalg.norm(c - center, axis=-1) - radius)
            return jnp.exp(-((d / s) ** 2))

        return jax.vmap(one)(origins)

    return predict


def test_golden_sphere_analytic_oracle(sphere_scene):
    """Sweep with the analytic oracle: reconstruction must be voxel-accurate.

    This is the tight pipeline-correctness gate (geometry, fusion, thinning,
    merge); the photoconsistency test below checks the realistic signal path
    more loosely.
    """
    cfg = _config()
    store, stats = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, predictor=_analytic_predictor(sphere_scene, cfg),
    )
    pts, probs, colors = store.merge()
    assert len(pts) > 500, "reconstruction too sparse"
    gt = sphere_scene.surface_points(4000)
    acc, comp = accuracy_completeness(pts, gt)
    s = cfg.voxel.voxel_size_mm
    assert acc < 1.5 * s, f"accuracy {acc:.2f}mm (s={s})"
    assert comp < 2.0 * s, f"completeness {comp:.2f}mm (s={s})"


def test_golden_sphere_reconstruction(sphere_scene):
    """Full sweep with the photoconsistency oracle: the true surface must be
    covered (completeness), and a solid core of points must be on-surface.
    Accuracy is NOT tightly bounded here: a model-free pairwise oracle keeps
    silhouette-edge ghosts that the learned net exists to suppress."""
    cfg = _config()
    store, stats = run_sweep(
        sphere_scene.images,
        sphere_scene.Ps,
        sphere_scene.bbox_min,
        sphere_scene.bbox_max,
        cfg,
        predictor=photoconsistency_predictor,
    )
    assert stats.n_cubes_after_prefilter > 0
    assert stats.n_cubes_nonempty > 0

    pts, probs, colors = store.merge()
    assert len(pts) > 200, "reconstruction too sparse"

    gt = sphere_scene.surface_points(4000)
    acc, comp = accuracy_completeness(pts, gt)
    s = cfg.voxel.voxel_size_mm
    assert comp < 4.0 * s, f"completeness {comp:.2f}mm too poor"
    d = sphere_scene.surface_distance(pts)
    # ~0.19 observed with the current oracle; gate well below the ~0.02
    # that a broken geometry path would produce.
    assert (d < 2 * s).mean() > 0.10, "too few on-surface points"


def test_sweep_resume(sphere_scene, tmp_path):
    """Killing and restarting the sweep must not redo finished cubes."""
    cfg = _config()
    ledger = str(tmp_path / "ledger.jsonl")
    store1, stats1 = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor, ledger_path=ledger,
    )
    n1 = len(store1.done_set())
    assert n1 == stats1.n_cubes_after_prefilter

    # resume: everything already done -> no new batches
    store2, stats2 = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor, ledger_path=ledger,
    )
    assert stats2.n_batches == 0
    # merged result identical
    p1, _, _ = store1.merge()
    p2, _, _ = store2.merge()
    assert len(p1) == len(p2)
