"""PointCloudScene + multi-scene training tests."""

import numpy as np

from surfacenet_tpu.config import (
    Config, ModelConfig, TrainConfig, VoxelConfig,
)
from surfacenet_tpu.data.scene import PointCloudScene, TrainScene
from surfacenet_tpu.train.train_surface import train_surfacenet


def _pc_scene(small_scene):
    gt = small_scene.surface_points(3000)
    return PointCloudScene(
        images=small_scene.images, Ps=small_scene.Ps, gt_points=gt,
        bbox_min=small_scene.bbox_min, bbox_max=small_scene.bbox_max,
    )


def test_pointcloud_scene_protocol(small_scene):
    sc = _pc_scene(small_scene)
    assert isinstance(sc, TrainScene)
    pts = sc.surface_points(10)
    assert pts.shape == (10, 3)
    # sampled points lie on the GT cloud -> occupancy true at small s
    occ = sc.occupancy(pts, s=2.0)
    assert occ.all()
    # far point not occupied
    assert not sc.occupancy(np.array([[500.0, 0, 0]]), s=2.0).any()


def test_pointcloud_scene_surface_distance(small_scene):
    sc = _pc_scene(small_scene)
    d = sc.surface_distance(sc.gt_points[:50])
    assert np.allclose(d, 0.0, atol=1e-4)
    # analytic check: distance from center is ~radius
    d2 = sc.surface_distance(np.zeros((1, 3)))
    assert abs(d2[0] - small_scene.radius) < 2.0


def test_multi_scene_training(small_scene):
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        model=ModelConfig.tiny(),
        train=TrainConfig(batch_size=4, lr=1e-2, seed=0),
    )
    sc2 = _pc_scene(small_scene)
    state, log = train_surfacenet(
        [small_scene, sc2], cfg, n_steps=12, log_every=1
    )
    assert len(log.losses) >= 12
    assert np.isfinite(log.losses).all()


def test_from_scan_roundtrip(tmp_path, small_scene):
    from surfacenet_tpu.data.dtu import load_scan, write_scan
    from surfacenet_tpu.utils.ply import write_ply

    scan_dir = str(tmp_path / "scanA")
    write_scan(scan_dir, small_scene.images, small_scene.Ps,
               small_scene.bbox_min, small_scene.bbox_max)
    gt = small_scene.surface_points(500)
    gt_path = str(tmp_path / "gt.ply")
    write_ply(gt_path, gt)

    scan = load_scan(scan_dir)
    sc = PointCloudScene.from_scan(scan, gt_path)
    assert sc.gt_points.shape == (500, 3)
    assert sc.images.shape == small_scene.images.shape
