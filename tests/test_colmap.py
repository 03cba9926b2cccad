"""COLMAP model loading: roundtrip against the synthetic scene geometry."""

import numpy as np
import jax.numpy as jnp

from surfacenet_tpu.data.colmap import load_colmap_scan, write_colmap_model
from surfacenet_tpu.geometry.camera import camera_center, project


def _decompose_P(P):
    """P = K[R|t] with K upper-triangular (RQ), positive diagonal."""
    M = P[:, :3]
    # RQ decomposition via QR of reversed matrix
    Pr = np.flipud(M).T
    q, r = np.linalg.qr(Pr)
    K = np.flipud(np.fliplr(r.T))
    R = np.flipud(q.T)
    # fix signs so diag(K) > 0
    S = np.diag(np.sign(np.diag(K)))
    K = K @ S
    R = S @ R
    if np.linalg.det(R) < 0:
        K, R = -K, -R
    t = np.linalg.solve(K, P[:, 3])
    return K / K[2, 2], R, t


def test_colmap_roundtrip(tmp_path, small_scene):
    model_dir = str(tmp_path / "sparse")
    img_dir = str(tmp_path / "images")

    Ks, Rs, ts = [], [], []
    for P in small_scene.Ps:
        K, R, t = _decompose_P(P)
        Ks.append(K)
        Rs.append(R)
        ts.append(t)
    gt_pts = small_scene.surface_points(200)
    write_colmap_model(
        model_dir, small_scene.images, np.stack(Ks), np.stack(Rs),
        np.stack(ts), points3d=gt_pts, image_dir=img_dir,
    )

    scan = load_colmap_scan(model_dir, image_dir=img_dir)
    assert scan.images.shape == small_scene.images.shape
    assert scan.bbox_min is not None

    # projections must agree with the original P matrices
    pts = jnp.asarray(small_scene.surface_points(50))
    for v in range(small_scene.Ps.shape[0]):
        uv0, w0 = project(jnp.asarray(small_scene.Ps[v]), pts)
        uv1, w1 = project(jnp.asarray(scan.Ps[v]), pts)
        assert np.allclose(np.asarray(uv0), np.asarray(uv1), atol=0.05)
        assert np.allclose(np.sign(np.asarray(w0)), np.sign(np.asarray(w1)))

    # camera centers agree
    c0 = np.asarray(camera_center(jnp.asarray(small_scene.Ps)))
    c1 = np.asarray(camera_center(jnp.asarray(scan.Ps)))
    assert np.allclose(c0, c1, atol=1e-3)


def test_colmap_bbox_from_points(tmp_path, small_scene):
    model_dir = str(tmp_path / "sparse")
    K, R, t = _decompose_P(small_scene.Ps[0])
    gt = small_scene.surface_points(500)
    write_colmap_model(
        model_dir, small_scene.images[:1], K[None], R[None], t[None],
        points3d=gt, image_dir=str(tmp_path / "images"),
    )
    scan = load_colmap_scan(model_dir, image_dir=str(tmp_path / "images"))
    # bbox encloses most of the sphere
    assert (scan.bbox_min < -20).all()
    assert (scan.bbox_max > 20).all()
