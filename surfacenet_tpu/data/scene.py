"""Training-scene abstraction (SURVEY.md C11 data contract).

Training needs, per scene: images + projection matrices + a ground-truth
surface to (a) sample cube locations near and (b) voxelize into occupancy
labels.  Two providers:

  * ``SyntheticScene`` (data/synthetic.py) — analytic surface, used for
    golden tests and the no-dataset environment.
  * ``PointCloudScene`` (here) — GT given as a point cloud (the DTU
    structured-light reference scans): occupancy = voxel center within half
    a voxel diagonal of the nearest GT point, sampling draws from the GT
    points directly.  This is the DTU-training path; plug a
    ``data/dtu.py`` scan + its GT .ply in.
"""

from __future__ import annotations

import dataclasses
from typing import Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class TrainScene(Protocol):
    images: np.ndarray  # (V, H, W, 3)
    Ps: np.ndarray  # (V, 3, 4)

    def surface_points(self, n: int, seed: int = 0) -> np.ndarray: ...

    def occupancy(self, centers: np.ndarray, s: float) -> np.ndarray: ...


@dataclasses.dataclass
class PointCloudScene:
    """GT-point-cloud-backed training scene (e.g. DTU reference scans)."""

    images: np.ndarray
    Ps: np.ndarray
    gt_points: np.ndarray  # (N, 3) mm
    bbox_min: np.ndarray = None
    bbox_max: np.ndarray = None
    name: str = ""

    def __post_init__(self):
        if self.bbox_min is None:
            pad = 5.0
            self.bbox_min = self.gt_points.min(axis=0) - pad
            self.bbox_max = self.gt_points.max(axis=0) + pad

    def surface_points(self, n: int, seed: int = 0) -> np.ndarray:
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, len(self.gt_points), n)
        return self.gt_points[idx]

    def surface_distance(self, pts: np.ndarray) -> np.ndarray:
        """Exact NN distance to the GT cloud, host KD-tree.

        Label generation queries ~N_pool * D^3 voxel centers (67M at a
        2048-cube 32^3 pool): the device brute-force (utils.metrics.
        min_dists) costs an (n, m) matmul + relay roundtrip per 4096-row
        chunk — fine for metric-sized point sets, hours for label pools,
        and pool REFRESH (train.pool_refresh_steps) pays it repeatedly.
        A cKDTree answers the same query exactly in ~1 us/point on host.
        Falls back to the device path if scipy is unavailable.
        """
        shape = pts.shape[:-1]
        flat = np.asarray(pts, np.float64).reshape(-1, 3)
        try:
            from scipy.spatial import cKDTree
        except ImportError:
            from surfacenet_tpu.utils.metrics import min_dists

            return min_dists(flat.astype(np.float32),
                             self.gt_points).reshape(shape)
        if not hasattr(self, "_kdtree"):
            object.__setattr__(self, "_kdtree", cKDTree(self.gt_points))
        d, _ = self._kdtree.query(flat, k=1, workers=-1)
        return d.astype(np.float32).reshape(shape)

    def occupancy(self, centers: np.ndarray, s: float) -> np.ndarray:
        return self.surface_distance(centers) <= (s * np.sqrt(3) / 2)

    @staticmethod
    def from_scan(scan, gt_ply_path: str) -> "PointCloudScene":
        """Build from a dtu.Scan + a GT point-cloud .ply."""
        from surfacenet_tpu.utils.ply import read_ply

        gt, _ = read_ply(gt_ply_path)
        return PointCloudScene(
            images=scan.images, Ps=scan.Ps, gt_points=gt,
            bbox_min=scan.bbox_min, bbox_max=scan.bbox_max,
            name=scan.name,
        )
