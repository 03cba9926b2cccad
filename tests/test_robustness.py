"""Robustness-to-real-imaging degradations (VERDICT r4 item 3).

data/synthetic.degrade_scene is the testable proxy for DTU's photographs
(sensor noise, exposure/lighting variation, white balance, background
clutter, calibration error) while the dataset is absent.  These tests
pin (a) the degradation model itself and (b) acceptable degradation
slopes of the reconstruction pipeline on the golden scene — the on-chip
curves for the shipped trained weights live in
results/robustness_r04.json (scripts/robustness_eval.py).
"""

import numpy as np
import pytest

from surfacenet_tpu.data.synthetic import degrade_scene, make_sphere_scene


@pytest.fixture(scope="module")
def scene():
    return make_sphere_scene(n_views=6, hw=(120, 160))


def test_degrade_scene_deterministic_and_bounded(scene):
    kw = dict(
        noise_std=0.02, exposure_jitter=0.2, wb_jitter=0.1, n_clutter=3,
        calib_sigma_px=1.0, seed=5,
    )
    d1 = degrade_scene(scene, **kw)
    d2 = degrade_scene(scene, **kw)
    np.testing.assert_array_equal(d1.images, d2.images)
    np.testing.assert_array_equal(d1.Ps, d2.Ps)
    assert d1.images.min() >= 0.0 and d1.images.max() <= 1.0
    assert not np.allclose(d1.images, scene.images)
    assert not np.allclose(d1.Ps, scene.Ps)
    # GT surface untouched: robustness curves measure imaging alone
    assert np.allclose(d1.surface_points(50), scene.surface_points(50))


def test_clutter_spares_the_object(scene):
    """Background clutter must never overwrite object pixels (occlusion
    is a separate golden scene, make_occluded_scene)."""
    d = degrade_scene(scene, n_clutter=6, seed=2)
    fg = ~np.all(np.abs(scene.images - 0.1) < 1e-3, axis=-1)
    np.testing.assert_array_equal(d.images[fg], scene.images[fg])
    # and it must actually add clutter somewhere in the background
    assert not np.allclose(d.images[~fg], scene.images[~fg])


def test_calib_sigma_is_pixel_scaled(scene):
    """calib_sigma_px shifts reprojections by ~that many pixels: the
    perturbed P projects a world point sigma-class pixels away."""
    sig = 2.0
    d = degrade_scene(scene, calib_sigma_px=sig, seed=3)
    pts = scene.surface_points(200, seed=1)
    ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    shifts = []
    for v in range(scene.Ps.shape[0]):
        a = ph @ scene.Ps[v].T
        b = ph @ d.Ps[v].T
        ua = a[:, :2] / a[:, 2:3]
        ub = b[:, :2] / b[:, 2:3]
        shifts.append(np.linalg.norm(ua - ub, axis=1).mean())
    shifts = np.asarray(shifts)
    # per-view constant principal-point shift, Rayleigh(sigma) magnitude
    assert 0.2 * sig < shifts.mean() < 4.0 * sig


def test_mild_degradation_keeps_reconstruction(scene):
    """Degradation slope: a DTU-plausible imaging condition must not
    collapse the model-free pipeline (photoconsistency oracle).  Bounds
    are loose — the point is 'degrades, does not break'."""
    from surfacenet_tpu.config import Config, FusionConfig, VoxelConfig
    from surfacenet_tpu.pipeline.sweep import (
        photoconsistency_predictor, run_sweep,
    )
    from surfacenet_tpu.utils.metrics import accuracy_completeness

    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        fusion=FusionConfig(
            n_view_pairs=2, tau=0.3, gamma=0.6, ray_pool_mode="affine",
            n_pool_views=3,
        ),
    )
    gt = scene.surface_points(3000)

    def overall(sc):
        store, _ = run_sweep(
            sc.images, sc.Ps, sc.bbox_min, sc.bbox_max, cfg,
            photoconsistency_predictor,
        )
        pts, _, _ = store.merge()
        assert len(pts) > 100, "reconstruction collapsed"
        acc, comp = accuracy_completeness(pts, gt)
        return (acc + comp) / 2

    clean = overall(scene)
    mild = overall(
        degrade_scene(
            scene, noise_std=0.01, exposure_jitter=0.15, wb_jitter=0.05,
            n_clutter=3, calib_sigma_px=0.3, seed=1,
        )
    )
    # slope bound: the combined mild condition may cost at most 2x the
    # clean geometric error plus half a voxel
    assert mild < 2.0 * clean + 1.0, (clean, mild)
