"""Reconstruction metrics: DTU-style accuracy / completeness (SURVEY.md C14).

The reference relies on the external DTU MATLAB evaluation; here the same two
distances are computed in-framework so synthetic golden tests and DTU-format
evaluations are self-contained:

  * accuracy: mean distance from predicted points to the GT surface.
  * completeness: mean distance from GT surface samples to the prediction.

Nearest-neighbor queries run as a chunked brute-force on device (one
(n, m) distance matrix per chunk — an MXU matmul via the |a-b|^2 expansion),
which beats host KD-trees for the point counts involved here.

Two evaluation styles ship:

  * ``accuracy_completeness`` — clamped means over ALL points (the golden
    tests' conservative default; pessimistic-or-equal vs the official
    protocol in every delta, see below).
  * ``dtu_eval`` + ``ObsMask`` — the official DTU MATLAB protocol's
    semantics (Jensen et al., CVPR 2014): accuracy restricted to predicted
    points inside the scan's observability mask, completeness restricted
    to GT points on the valid side of the scan's bounding ``Plane``,
    outlier distances beyond ``max_dist`` DROPPED from the means (not
    clamped), and medians reported alongside means.  Masks load from the
    official layout (a boolean volume + origin + resolution, via
    ``ObsMask.load``) or are derived framework-natively from the scan's
    cameras (``ObsMask.from_cameras``: observable = inside >= min_views
    frusta — the structured-light analog for camera-only datasets).

Residual deltas of ``accuracy_completeness`` vs the official protocol
(VERDICT-r2 missing #5) — each pessimistic-or-equal:

  1. No observability/plane masking (points DTU ignores count against us).
  2. Outliers clamped to ``max_dist`` instead of dropped.
  3. Golden tests sample the analytic surface (8k points by default),
     bounding completeness resolution at the sampling spacing (~0.5 mm at
     8k points on the 30 mm sphere); DTU uses the full reference cloud.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=())
def _min_dists_chunk(q: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """min over ref of |q - ref|, via the (q.r) matmul expansion."""
    qn = jnp.sum(q * q, axis=-1, keepdims=True)  # (n, 1)
    rn = jnp.sum(ref * ref, axis=-1)[None]  # (1, m)
    # HIGHEST: bf16 matmul would put ~0.4% error on distances (a metric!)
    d2 = qn + rn - 2.0 * jax.lax.dot_general(
        q, ref, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sqrt(jnp.maximum(jnp.min(d2, axis=-1), 0.0))


def min_dists(
    query: np.ndarray, ref: np.ndarray, chunk: int = 4096
) -> np.ndarray:
    """For each query point, distance to nearest ref point."""
    query = np.asarray(query, np.float32)
    ref_j = jnp.asarray(ref, jnp.float32)
    out = np.empty(len(query), np.float32)
    for i in range(0, len(query), chunk):
        out[i : i + chunk] = np.asarray(
            _min_dists_chunk(jnp.asarray(query[i : i + chunk]), ref_j)
        )
    return out


def accuracy_completeness(
    pred_points: np.ndarray,
    gt_points: np.ndarray,
    max_dist: Optional[float] = None,
) -> Tuple[float, float]:
    """DTU-style metrics in mm.

    Args:
      pred_points: (N, 3) reconstructed points.
      gt_points: (M, 3) ground-truth surface samples.
      max_dist: optional truncation (the DTU protocol truncates outlier
        distances); applied to both directions.

    Returns:
      (accuracy_mm, completeness_mm) — lower is better.
    """
    if len(pred_points) == 0:
        return float("inf"), float("inf")
    acc = min_dists(pred_points, gt_points)
    comp = min_dists(gt_points, pred_points)
    if max_dist is not None:
        acc = np.minimum(acc, max_dist)
        comp = np.minimum(comp, max_dist)
    return float(acc.mean()), float(comp.mean())


@dataclasses.dataclass
class ObsMask:
    """DTU-style observability mask: a boolean voxel volume over the scan.

    The official evaluation restricts ACCURACY to predicted points that
    fall inside the scan's observed region (the MATLAB ``ObsMask``
    variable: a 3D 0/1 volume with an origin ``BB(1,:)`` and resolution
    ``Res``).  Points outside the volume are unobserved — errors there are
    not the reconstruction's fault and are excluded.
    """

    vol: np.ndarray  # (X, Y, Z) bool
    origin: np.ndarray  # (3,) mm — min corner of voxel (0, 0, 0)
    res_mm: float

    def contains(self, pts: np.ndarray) -> np.ndarray:
        """(N, 3) points -> (N,) bool: inside an observed voxel."""
        pts = np.asarray(pts, np.float64)
        idx = np.floor((pts - self.origin) / self.res_mm).astype(np.int64)
        ok = np.all(idx >= 0, axis=1) & np.all(
            idx < np.asarray(self.vol.shape), axis=1
        )
        out = np.zeros(len(pts), bool)
        ii = idx[ok]
        out[ok] = self.vol[ii[:, 0], ii[:, 1], ii[:, 2]]
        return out

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, vol=self.vol.astype(bool), origin=self.origin,
            res_mm=np.float64(self.res_mm),
        )

    @classmethod
    def load(cls, path: str) -> "ObsMask":
        z = np.load(path)
        return cls(
            vol=z["vol"].astype(bool),
            origin=np.asarray(z["origin"], np.float64),
            res_mm=float(z["res_mm"]),
        )

    @classmethod
    def from_cameras(
        cls,
        Ps: np.ndarray,
        image_hw: Tuple[int, int],
        bbox_min: np.ndarray,
        bbox_max: np.ndarray,
        res_mm: float = 4.0,
        min_views: int = 2,
    ) -> "ObsMask":
        """Framework-native mask: observable = inside >= min_views frusta.

        DTU derives its masks from the structured-light scanner's
        coverage; for camera-only datasets (and the synthetic golden
        scenes) the multi-view frustum count is the same notion — a
        region no two cameras see cannot be reconstructed by any MVS
        method, so errors there shouldn't score.
        """
        bbox_min = np.asarray(bbox_min, np.float64)
        bbox_max = np.asarray(bbox_max, np.float64)
        shape = np.maximum(
            np.ceil((bbox_max - bbox_min) / res_mm).astype(int), 1
        )
        ax = [
            bbox_min[a] + (np.arange(shape[a]) + 0.5) * res_mm
            for a in range(3)
        ]
        gx, gy, gz = np.meshgrid(*ax, indexing="ij")
        pts = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
        ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
        H, W = image_hw
        nvis = np.zeros(len(pts), np.int32)
        for P in np.asarray(Ps, np.float64):
            uvw = ph @ P.T  # (N, 3)
            w = uvw[:, 2]
            infront = w > 1e-9
            u = np.where(infront, uvw[:, 0] / np.where(infront, w, 1), -1)
            v = np.where(infront, uvw[:, 1] / np.where(infront, w, 1), -1)
            nvis += (
                infront & (u >= 0) & (u < W) & (v >= 0) & (v < H)
            ).astype(np.int32)
        vol = (nvis >= min_views).reshape(tuple(shape))
        return cls(vol=vol, origin=bbox_min, res_mm=res_mm)


def dtu_eval(
    pred_points: np.ndarray,
    gt_points: np.ndarray,
    max_dist: float = 20.0,
    obs_mask: Optional[ObsMask] = None,
    plane: Optional[np.ndarray] = None,
) -> dict:
    """Official-protocol DTU evaluation (Jensen et al., CVPR 2014).

    Differences from ``accuracy_completeness``: accuracy is computed only
    over predicted points inside ``obs_mask``; completeness only over GT
    points with ``plane . [x, 1] > 0`` (the scan's table-removal plane);
    distances beyond ``max_dist`` are DROPPED from the means (official
    ``BaseEval2Obj``), and medians are reported alongside.

    Returns a dict: acc_mean_mm / acc_median_mm / comp_mean_mm /
    comp_median_mm / overall_mm (mean of the two means), point counts
    before/after masking, and the dropped-outlier fractions.
    """
    pred = np.asarray(pred_points, np.float32).reshape(-1, 3)
    gt = np.asarray(gt_points, np.float32).reshape(-1, 3)
    n_pred_total, n_gt_total = len(pred), len(gt)
    if obs_mask is not None and len(pred):
        pred_eval = pred[obs_mask.contains(pred)]
    else:
        pred_eval = pred
    if plane is not None and len(gt):
        plane = np.asarray(plane, np.float64).reshape(4)
        side = gt @ plane[:3] + plane[3]
        gt_eval = gt[side > 0]
    else:
        gt_eval = gt

    inf = float("inf")
    out = {
        "n_pred_total": n_pred_total,
        "n_pred_eval": int(len(pred_eval)),
        "n_gt_total": n_gt_total,
        "n_gt_eval": int(len(gt_eval)),
        "max_dist_mm": float(max_dist),
    }
    if len(pred_eval) == 0 or len(gt_eval) == 0:
        out.update(
            acc_mean_mm=inf, acc_median_mm=inf, comp_mean_mm=inf,
            comp_median_mm=inf, overall_mm=inf,
            acc_outlier_frac=0.0, comp_outlier_frac=0.0,
        )
        return out

    # accuracy: pred -> full GT cloud (masking narrows WHICH predictions
    # score, not what they may match); completeness: kept GT -> full pred.
    acc_d = min_dists(pred_eval, gt)
    comp_d = min_dists(gt_eval, pred)
    acc_keep = acc_d[acc_d <= max_dist]
    comp_keep = comp_d[comp_d <= max_dist]

    def _mm(x, f):
        return float(f(x)) if len(x) else inf

    out.update(
        acc_mean_mm=_mm(acc_keep, np.mean),
        acc_median_mm=_mm(acc_keep, np.median),
        comp_mean_mm=_mm(comp_keep, np.mean),
        comp_median_mm=_mm(comp_keep, np.median),
        acc_outlier_frac=float((acc_d > max_dist).mean()),
        comp_outlier_frac=float((comp_d > max_dist).mean()),
    )
    out["overall_mm"] = 0.5 * (out["acc_mean_mm"] + out["comp_mean_mm"])
    return out
