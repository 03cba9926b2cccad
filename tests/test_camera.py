"""Camera projection unit tests (SURVEY.md SS4: closed-form round trips)."""

import numpy as np
import jax.numpy as jnp

from surfacenet_tpu.geometry.camera import (
    baseline_angle,
    camera_center,
    cube_visible,
    in_frustum,
    look_at_projection,
    project,
    voxel_centers,
)


def test_project_known_point():
    # camera at -Z looking at origin: a point at the origin projects to the
    # principal point with depth = distance
    eye = np.array([0.0, 0.0, -100.0])
    P = look_at_projection(eye, np.zeros(3), np.array([0, 1, 0]), 200.0, (40, 30))
    uv, w = project(jnp.asarray(P), jnp.zeros((1, 3)))
    assert np.allclose(np.asarray(uv)[0], [40, 30], atol=1e-4)
    assert np.allclose(np.asarray(w)[0], 100.0, atol=1e-4)


def test_project_offset_point_focal_scaling():
    eye = np.array([0.0, 0.0, -100.0])
    P = look_at_projection(eye, np.zeros(3), np.array([0, 1, 0]), 200.0, (40, 30))
    # point 10mm to the right (world +x maps to image +u direction up to sign)
    uv, w = project(jnp.asarray(P), jnp.array([[10.0, 0.0, 0.0]]))
    # x offset of 10 at depth 100 with f=200 -> 20 px from principal point
    assert abs(abs(float(uv[0, 0]) - 40.0) - 20.0) < 1e-3
    assert abs(float(uv[0, 1]) - 30.0) < 1e-3


def test_camera_center_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        eye = rng.uniform(-50, 50, 3) + np.array([0, 0, -120.0])
        P = look_at_projection(
            eye, rng.uniform(-5, 5, 3), np.array([0, 1, 0]), 150.0, (32, 24)
        )
        C = np.asarray(camera_center(jnp.asarray(P)))
        assert np.allclose(C, eye, atol=1e-6)


def test_in_frustum():
    eye = np.array([0.0, 0.0, -100.0])
    P = look_at_projection(eye, np.zeros(3), np.array([0, 1, 0]), 100.0, (40, 30))
    pts = jnp.array(
        [
            [0.0, 0.0, 0.0],  # center: inside
            [0.0, 0.0, -200.0],  # behind camera
            [1000.0, 0.0, 0.0],  # far outside image
        ]
    )
    mask = np.asarray(in_frustum(jnp.asarray(P), pts, (60, 80)))
    assert mask.tolist() == [True, False, False]


def test_baseline_angle():
    # two cameras 90 degrees apart around origin
    P1 = look_at_projection(
        np.array([100.0, 0, 0]), np.zeros(3), np.array([0, 0, 1.0]), 100, (1, 1)
    )
    P2 = look_at_projection(
        np.array([0, 100.0, 0]), np.zeros(3), np.array([0, 0, 1.0]), 100, (1, 1)
    )
    c = float(baseline_angle(jnp.asarray(P1), jnp.asarray(P2), jnp.zeros(3)))
    assert abs(c) < 1e-6  # cos(90 deg) = 0


def test_voxel_centers():
    c = np.asarray(voxel_centers(jnp.array([10.0, 20.0, 30.0]), 4, 2.0))
    assert c.shape == (4, 4, 4, 3)
    assert np.allclose(c[0, 0, 0], [11.0, 21.0, 31.0])
    assert np.allclose(c[3, 0, 0], [17.0, 21.0, 31.0])
    assert np.allclose(c[0, 1, 2], [11.0, 23.0, 35.0])


def test_cube_visible(small_scene):
    Ps = jnp.asarray(small_scene.Ps, jnp.float32)
    hw = small_scene.images.shape[1:3]
    # cube at scene center: visible in all views
    vis = np.asarray(
        cube_visible(Ps, jnp.array([[-5.0, -5.0, -5.0]]), 10.0, hw)
    )
    assert vis.shape == (1, 4)
    assert vis.all()
    # cube far outside: nowhere visible
    vis2 = np.asarray(
        cube_visible(Ps, jnp.array([[4000.0, 4000.0, 4000.0]]), 10.0, hw)
    )
    assert not vis2.any()


def test_estimate_bbox_from_cameras(small_scene):
    from surfacenet_tpu.geometry.camera import estimate_bbox_from_cameras

    lo, hi = estimate_bbox_from_cameras(small_scene.Ps)
    # cameras all look at the origin: estimated center must be near it
    center = (lo + hi) / 2
    assert np.linalg.norm(center) < 10.0
    # box must contain the sphere (radius 30)
    assert (lo < -25).all() and (hi > 25).all()
