"""DTU-protocol evaluation: ObsMask + dtu_eval (SURVEY.md C14).

The official MATLAB protocol (Jensen et al., CVPR 2014) masks accuracy by
the scan's observability volume, masks completeness by the table plane,
drops outliers beyond max_dist from the means, and reports medians.  These
tests pin each delta against the conservative accuracy_completeness metric.
"""

import numpy as np
import pytest

from surfacenet_tpu.utils.metrics import (
    ObsMask,
    accuracy_completeness,
    dtu_eval,
)


def _ring(n, r, z=0.0, seed=0):
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack(
        [r * np.cos(th), r * np.sin(th), np.full(n, z)], axis=-1
    ).astype(np.float32)


def test_obsmask_contains_roundtrip(tmp_path):
    vol = np.zeros((4, 4, 4), bool)
    vol[1, 2, 3] = True
    m = ObsMask(vol=vol, origin=np.array([10.0, 0.0, -5.0]), res_mm=2.0)
    pts = np.array(
        [
            [13.0, 5.0, 2.0],   # voxel (1, 2, 3) -> observed
            [11.0, 1.0, -4.0],  # voxel (0, 0, 0) -> unobserved
            [9.0, 5.0, 2.0],    # below origin -> outside
            [10.0 + 8.1, 5.0, 2.0],  # past the far face -> outside
        ]
    )
    np.testing.assert_array_equal(
        m.contains(pts), [True, False, False, False]
    )
    p = str(tmp_path / "mask.npz")
    m.save(p)
    m2 = ObsMask.load(p)
    np.testing.assert_array_equal(m2.contains(pts), m.contains(pts))
    assert m2.res_mm == m.res_mm


def test_obsmask_from_cameras_marks_frustum_overlap():
    from surfacenet_tpu.data.synthetic import make_sphere_scene

    sc = make_sphere_scene(n_views=6, hw=(120, 160), radius=30.0)
    m = ObsMask.from_cameras(
        sc.Ps, (120, 160), sc.bbox_min, sc.bbox_max,
        res_mm=4.0, min_views=2,
    )
    # the scene's own surface must be observable (all cameras orbit it)
    on_surface = sc.surface_points(500, seed=3)
    assert m.contains(on_surface).mean() > 0.99
    # a point far outside every frustum must not be
    far = sc.bbox_min[None, :] - 500.0
    assert not m.contains(far).any()


def test_dtu_eval_outliers_dropped_not_clamped():
    gt = _ring(2000, 30.0)
    pred = np.concatenate(
        [gt[::2], np.full((10, 3), 500.0, np.float32)]  # 10 gross outliers
    )
    acc_clamp, _ = accuracy_completeness(pred, gt, max_dist=20.0)
    r = dtu_eval(pred, gt, max_dist=20.0)
    # clamped mean carries 10 * 20mm of outlier mass; dtu drops them
    assert r["acc_mean_mm"] < 1e-4
    assert acc_clamp > r["acc_mean_mm"] + 0.1
    assert 0 < r["acc_outlier_frac"] < 0.02
    assert r["acc_median_mm"] <= r["acc_mean_mm"] + 1e-6
    # every GT point is within one ring spacing (~0.19mm) of a pred point
    assert r["comp_mean_mm"] < 0.2


def test_dtu_eval_obs_mask_restricts_accuracy():
    gt = _ring(2000, 30.0)
    junk = np.full((500, 3), 80.0, np.float32)  # observable-region junk?
    pred = np.concatenate([gt[:1000], junk])
    # mask covering only the ring neighborhood: junk at (80,80,80) is
    # outside -> excluded from accuracy entirely (not even as outliers)
    vol = np.ones((40, 40, 8), bool)
    mask = ObsMask(
        vol=vol, origin=np.array([-40.0, -40.0, -8.0]), res_mm=2.0
    )
    r = dtu_eval(pred, gt, max_dist=20.0, obs_mask=mask)
    assert r["n_pred_eval"] == 1000
    assert r["acc_mean_mm"] < 1e-4
    assert r["acc_outlier_frac"] == 0.0
    r_nomask = dtu_eval(pred, gt, max_dist=20.0)
    assert r_nomask["n_pred_eval"] == 1500


def test_dtu_eval_plane_restricts_completeness():
    gt_above = _ring(1000, 30.0, z=5.0)
    gt_below = _ring(1000, 30.0, z=-5.0)
    gt = np.concatenate([gt_above, gt_below])
    pred = gt_above.copy()  # reconstruct only the above-plane half
    r_all = dtu_eval(pred, gt, max_dist=20.0)
    r_plane = dtu_eval(
        pred, gt, max_dist=20.0, plane=np.array([0.0, 0.0, 1.0, 0.0])
    )
    assert r_plane["n_gt_eval"] == 1000
    assert r_plane["comp_mean_mm"] < 1e-4
    assert r_all["comp_mean_mm"] > 1.0  # below-plane GT counts against


def test_dtu_eval_empty_prediction():
    gt = _ring(100, 30.0)
    r = dtu_eval(np.zeros((0, 3), np.float32), gt)
    assert np.isinf(r["overall_mm"])
    assert r["n_pred_eval"] == 0


def test_dtu_eval_matches_clamped_metric_when_clean():
    """With no mask/plane and no outliers, the two styles agree."""
    gt = _ring(1500, 30.0)
    rng = np.random.default_rng(0)
    pred = gt + rng.normal(0, 0.3, gt.shape).astype(np.float32)
    acc, comp = accuracy_completeness(pred, gt, max_dist=20.0)
    r = dtu_eval(pred, gt, max_dist=20.0)
    assert r["acc_mean_mm"] == pytest.approx(acc, abs=1e-4)
    assert r["comp_mean_mm"] == pytest.approx(comp, abs=1e-4)
