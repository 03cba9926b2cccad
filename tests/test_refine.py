"""Calibration-refinement prepass tests (geometry/refine.py; VERDICT r4
next #4 — the in-pipeline fix for the one brittle robustness axis).

The full-scale quality gate (sigma=1 px overall <= 1.5x clean on the
production sphere) is measured on TPU by scripts/robustness_refine_eval.py
-> results/robustness_r05.json; these CPU tests lock the component
semantics and a small-scale end-to-end recovery.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from surfacenet_tpu.data.synthetic import degrade_scene, make_sphere_scene
from surfacenet_tpu.geometry.refine import (
    _remove_rigid, apply_uv_shift, photometric_probes, refine_calibration,
)


@pytest.fixture(scope="module")
def scene():
    return make_sphere_scene(n_views=8, hw=(180, 240), radius=30.0)


def test_apply_uv_shift_matches_degradation_model(scene):
    """apply_uv_shift(P, duv) composes exactly with degrade_scene's
    calibration model: applying -duv restores the original matrices."""
    sigma, seed = 1.3, 7
    deg = degrade_scene(scene, calib_sigma_px=sigma, seed=seed)
    rng = np.random.default_rng(seed)
    duv = rng.normal(0.0, sigma, (len(scene.Ps), 2))
    restored = np.asarray(
        apply_uv_shift(jnp.asarray(deg.Ps, jnp.float32),
                       jnp.asarray(-duv, jnp.float32))
    )
    np.testing.assert_allclose(restored, scene.Ps, rtol=0, atol=1e-3)


def test_remove_rigid_kills_rigid_field_keeps_nonrigid():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 10, (256, 3)), jnp.float32)
    t = jnp.asarray([0.5, -0.2, 0.3])
    omega = jnp.asarray([0.01, -0.02, 0.015])
    rigid = t[None] + jnp.cross(jnp.broadcast_to(omega, x.shape), x)
    out = _remove_rigid(rigid, x)
    assert float(jnp.abs(out).max()) < 1e-4
    # a non-rigid (radial) field survives mostly intact
    radial = x * 0.03
    out2 = _remove_rigid(radial, x)
    assert float(jnp.abs(out2).max()) > 0.1


def test_probes_land_near_surface(scene):
    """Texture-gated robust-consistency probes sit on the sphere surface
    (median within ~2 grid cells), not on background/silhouette ghosts —
    the r5 failure modes this selector was measured against."""
    probes = photometric_probes(
        jnp.asarray(scene.images, jnp.float32),
        jnp.asarray(scene.Ps, jnp.float32),
        scene.bbox_min, scene.bbox_max, n_probes=512, grid=32,
    )
    d = np.abs(np.linalg.norm(probes, axis=1) - scene.radius)
    cell = float(np.min((scene.bbox_max - scene.bbox_min) / 32))
    assert np.median(d) < 2.0 * cell, (np.median(d), cell)


@pytest.mark.slow
def test_recovery_reduces_shift_error(scene):
    """End-to-end at sigma=1 px: the refined duv must recover a
    substantial part of the injected per-view shift (measured ~30% at
    this small scale; 600x800 production scale recovers more — see
    results/robustness_r05.json)."""
    sigma, seed = 1.0, 3
    deg = degrade_scene(scene, calib_sigma_px=sigma, seed=seed)
    rng = np.random.default_rng(seed)
    duv_true = rng.normal(0.0, sigma, (len(scene.Ps), 2))
    target = -(duv_true - duv_true.mean(axis=0, keepdims=True))
    before = np.abs(duv_true - duv_true.mean(0)).mean()
    _, info = refine_calibration(
        deg.images, deg.Ps, scene.bbox_min, scene.bbox_max,
        n_probes=512, grid=32, steps_per_level=50, slack_mm=0.5,
    )
    after = np.abs(info["duv_px"] - target).mean()
    assert after < 0.8 * before, (before, after)
