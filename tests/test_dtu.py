"""DTU loader format tests via synthetic fixture roundtrip."""

import numpy as np

from surfacenet_tpu.data.dtu import (
    load_scan,
    read_projection_matrix,
    write_projection_matrix,
    write_scan,
)


def test_projection_matrix_roundtrip(tmp_path):
    P = np.random.default_rng(0).uniform(-100, 100, (3, 4))
    path = str(tmp_path / "pos_000.txt")
    write_projection_matrix(path, P)
    P2 = read_projection_matrix(path)
    assert np.allclose(P, P2, rtol=1e-9)


def test_scan_roundtrip(tmp_path, small_scene):
    scan_dir = str(tmp_path / "scan9")
    write_scan(
        scan_dir,
        small_scene.images,
        small_scene.Ps,
        small_scene.bbox_min,
        small_scene.bbox_max,
    )
    scan = load_scan(scan_dir)
    assert scan.images.shape == small_scene.images.shape
    assert np.abs(scan.images - small_scene.images).max() < 1 / 128
    assert np.allclose(scan.Ps, small_scene.Ps, rtol=1e-8)
    assert np.allclose(scan.bbox_min, small_scene.bbox_min)
    assert scan.name == "scan9"


def test_scan_downsample(tmp_path, small_scene):
    scan_dir = str(tmp_path / "scanX")
    write_scan(scan_dir, small_scene.images, small_scene.Ps)
    scan = load_scan(scan_dir, downsample=2)
    assert scan.images.shape[1] == small_scene.images.shape[1] // 2
    # projection consistency: a point projecting to (u, v) at full res
    # projects to (u/2, v/2) after downsampling
    import jax.numpy as jnp
    from surfacenet_tpu.geometry.camera import project

    pt = jnp.asarray(small_scene.surface_points(1))
    uv1, _ = project(jnp.asarray(small_scene.Ps[0]), pt)
    uv2, _ = project(jnp.asarray(scan.Ps[0]), pt)
    assert np.allclose(np.asarray(uv1) / 2, np.asarray(uv2), atol=1e-5)


def test_sampleset_layout_roundtrip(tmp_path, small_scene):
    """Full-fidelity DTU SampleSet: rect_###_<light>_r5000.png (1-indexed)
    + sibling Calibration/cal18/pos_###.txt discovery."""
    from surfacenet_tpu.data.dtu import write_scan_sampleset

    scan_dir = write_scan_sampleset(
        str(tmp_path), "scan6", small_scene.images, small_scene.Ps
    )
    assert scan_dir.endswith("Rectified/scan6")
    scan = load_scan(scan_dir)
    assert scan.images.shape == small_scene.images.shape
    assert np.abs(scan.images - small_scene.images).max() < 1 / 128
    assert np.allclose(scan.Ps, small_scene.Ps, rtol=1e-8)

    # lighting-condition filter: only the requested light's images load
    scan2 = load_scan(scan_dir, light="3")
    assert scan2.images.shape[0] == small_scene.images.shape[0]
