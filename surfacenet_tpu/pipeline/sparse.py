"""Sparse cube store + overlap merge (SURVEY.md C10).

The sweep emits per-cube results (thinned occupancy + fused probability +
optional color) for non-empty cubes only.  Cubes tile the scene with overlap;
a global voxel may therefore receive contributions from up to 8 cubes.  The
merge resolves overlaps by averaging probabilities / voting occupancy, then
emits the surviving voxel centers as a colored point cloud.

Host-side numpy on purpose: this is the accumulation/IO tail of the pipeline
(compaction, dedupe, .ply export), not device compute; it is also the natural
place for the restartable block ledger (SURVEY.md SS5, failure recovery) since
every cube result is an idempotent record keyed by its grid index.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

from surfacenet_tpu.utils.ply import write_ply


@dataclasses.dataclass
class CubeResult:
    """Result for one cube, keyed by its integer grid index."""

    grid_idx: Tuple[int, int, int]  # cube position in the sweep lattice
    occupancy: np.ndarray  # (D, D, D) bool, thinned
    prob: np.ndarray  # (D, D, D) float32 fused probability
    color: Optional[np.ndarray] = None  # (D, D, D, 3) float32 in [0,1]


class SparseCubeStore:
    """Accumulates non-empty cube results and merges overlaps.

    Global voxel coordinates: cube at grid index g owns local voxels
    ``g * stride + (i, j, k)``; world position of a voxel is
    ``scene_origin + s * (coord + 0.5)``.
    """

    def __init__(
        self,
        scene_origin: np.ndarray,
        voxel_size_mm: float,
        cube_size: int,
        stride: int,
        ledger_path: Optional[str] = None,
        occupancy_vote: float = 0.5,
    ):
        self.scene_origin = np.asarray(scene_origin, np.float64)
        self.s = float(voxel_size_mm)
        self.D = int(cube_size)
        self.stride = int(stride)
        # default overlap-merge vote threshold; 0.0 for core-claiming
        # sweeps (each voxel has exactly one owning cube, no cross-votes).
        self.occupancy_vote = float(occupancy_vote)
        self._cubes: Dict[Tuple[int, int, int], CubeResult] = {}
        self._done: set = set()
        self.ledger_path = ledger_path
        if ledger_path and os.path.exists(ledger_path):
            self._load_ledger()

    # ------------------------------------------------------------- store

    def add(self, result: CubeResult) -> None:
        if not result.occupancy.any():
            # still record in ledger as done-and-empty for resume
            self._cubes.pop(result.grid_idx, None)
            self._log_done(result.grid_idx, empty=True)
            return
        self._cubes[result.grid_idx] = result
        self._log_done(result.grid_idx, empty=False, result=result)

    def done_set(self) -> set:
        return set(self._done)

    def __len__(self) -> int:
        return len(self._cubes)

    # ------------------------------------------------------------- ledger

    def _log_done(self, gidx, empty: bool, result: CubeResult = None) -> None:
        self._done.add(tuple(gidx))
        if not self.ledger_path:
            return
        os.makedirs(os.path.dirname(self.ledger_path) or ".", exist_ok=True)
        rec = {"grid_idx": list(map(int, gidx)), "empty": bool(empty)}
        if result is not None and not empty:
            # compact sparse record: indices + probs of occupied voxels
            occ = np.argwhere(result.occupancy)
            rec["occ_idx"] = occ.astype(int).tolist()
            rec["prob"] = result.prob[result.occupancy].astype(
                float
            ).round(4).tolist()
            if result.color is not None:
                rec["color"] = (
                    result.color[result.occupancy].astype(float)
                    .round(4).tolist()
                )
        with open(self.ledger_path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def _load_ledger(self) -> None:
        """Resume: re-hydrate completed cubes from the ledger.

        Crash-resilient: a process killed mid-append leaves a truncated
        final line — skipped (that cube is simply redone), never fatal.
        """
        with open(self.ledger_path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn write from a crashed process
                g = tuple(rec["grid_idx"])
                self._done.add(g)
                if rec.get("empty", True):
                    continue
                occ = np.zeros((self.D,) * 3, bool)
                idx = np.asarray(rec["occ_idx"], int)
                occ[idx[:, 0], idx[:, 1], idx[:, 2]] = True
                prob = np.zeros((self.D,) * 3, np.float32)
                prob[idx[:, 0], idx[:, 1], idx[:, 2]] = np.asarray(
                    rec["prob"], np.float32
                )
                color = None
                if "color" in rec:
                    color = np.zeros((self.D,) * 3 + (3,), np.float32)
                    color[idx[:, 0], idx[:, 1], idx[:, 2]] = np.asarray(
                        rec["color"], np.float32
                    )
                self._cubes[g] = CubeResult(g, occ, prob, color)

    # ------------------------------------------------------------- merge

    def merge(
        self,
        occupancy_vote: Optional[float] = None,
        min_component: int = 0,
        keep_top_components: Optional[int] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Merge all cubes into deduplicated global voxels.

        Overlap rule: every cube containing a global voxel contributes its
        (occupancy, prob); the voxel survives if the occupied fraction among
        contributors is >= occupancy_vote.  Probabilities and colors are
        averaged.  When ``min_component`` > 1 (or ``keep_top_components``
        is set), merged voxels are additionally denoised: 26-connected
        components smaller than ``min_component`` voxels — floating specks
        from a single bad view pair — are dropped (SURVEY.md C8, the
        reference ``denoising.py`` analog; see ops/denoise.py).

        Returns:
          points: (N, 3) world-space voxel centers (mm).
          probs: (N,) merged probability.
          colors: (N, 3) float in [0, 1].
        """
        if occupancy_vote is None:
            occupancy_vote = self.occupancy_vote
        if not self._cubes:
            return (
                np.zeros((0, 3), np.float32),
                np.zeros((0,), np.float32),
                np.zeros((0, 3), np.float32),
            )

        all_coords = []
        all_occ = []
        all_prob = []
        all_color = []
        for g, res in self._cubes.items():
            # voxels that are occupied OR lie in a region another cube might
            # claim: we only need records where this cube says "occupied",
            # plus its vote (occupied or not) for voxels claimed by others.
            # Simplification with identical semantics: contribute only voxels
            # this cube marks occupied, but count *votes* from every cube
            # that contains the voxel and processed it.  To keep it exact we
            # contribute all voxels of the cube that are occupied in ANY
            # contributor — resolved below via vote counting on occupied
            # records vs. containment counts.
            occ = res.occupancy
            idx = np.argwhere(occ)
            if idx.size == 0:
                continue
            base = np.asarray(g, np.int64) * self.stride
            all_coords.append(base + idx)
            all_occ.append(np.ones(len(idx), np.float32))
            all_prob.append(res.prob[occ].astype(np.float32))
            if res.color is not None:
                all_color.append(res.color[occ].astype(np.float32))
            else:
                all_color.append(np.full((len(idx), 3), 0.5, np.float32))

        coords = np.concatenate(all_coords, axis=0)
        occv = np.concatenate(all_occ)
        probv = np.concatenate(all_prob)
        colorv = np.concatenate(all_color, axis=0)

        # native fast path: O(N) hash merge + binary-search containment
        # (surfacenet_tpu/native); falls back to numpy below if unavailable.
        from surfacenet_tpu.native import native_merge

        done = np.asarray(sorted(self.done_set()), np.int64).reshape(-1, 3)
        res = native_merge(
            coords, probv, colorv, done, self.stride, self.D,
            occupancy_vote,
        )
        if res is not None:
            ucoords, probs, colors = res
            m = self._denoise_mask(ucoords, min_component, keep_top_components)
            ucoords, probs, colors = ucoords[m], probs[m], colors[m]
            pts = self.scene_origin + self.s * (ucoords + 0.5)
            return (
                pts.astype(np.float32), probs, np.clip(colors, 0.0, 1.0)
            )

        # containment counts: how many *processed* cubes contain each voxel
        n_contain = self._containment_counts(coords)

        # dedupe by linear id
        cmin = coords.min(axis=0)
        rel = coords - cmin
        dims = rel.max(axis=0) + 1
        lin = (rel[:, 0] * dims[1] + rel[:, 1]) * dims[2] + rel[:, 2]
        uniq, inv = np.unique(lin, return_inverse=True)

        n = len(uniq)
        votes = np.zeros(n, np.float32)
        np.add.at(votes, inv, occv)
        prob_sum = np.zeros(n, np.float32)
        np.add.at(prob_sum, inv, probv)
        color_sum = np.zeros((n, 3), np.float32)
        np.add.at(color_sum, inv, colorv)
        contain = np.zeros(n, np.float32)
        # containment is per-voxel (same for duplicates) — take max
        np.maximum.at(contain, inv, n_contain)

        keep = votes / np.maximum(contain, 1.0) >= occupancy_vote
        # reconstruct integer coords of unique voxels
        u = uniq
        k = u % dims[2]
        j = (u // dims[2]) % dims[1]
        i = u // (dims[2] * dims[1])
        ucoords = np.stack([i, j, k], axis=-1) + cmin

        kcoords = ucoords[keep]
        probs = prob_sum[keep] / votes[keep]
        colors = color_sum[keep] / votes[keep][:, None]
        m = self._denoise_mask(kcoords, min_component, keep_top_components)
        pts = self.scene_origin + self.s * (kcoords[m] + 0.5)
        return pts.astype(np.float32), probs[m], np.clip(colors[m], 0.0, 1.0)

    @staticmethod
    def _denoise_mask(
        coords: np.ndarray, min_component: int, keep_top: Optional[int]
    ) -> np.ndarray:
        if min_component <= 1 and keep_top is None:
            return np.ones(len(coords), bool)
        from surfacenet_tpu.ops.denoise import component_filter_mask

        return component_filter_mask(coords, min_component, keep_top)

    def _containment_counts(self, coords: np.ndarray) -> np.ndarray:
        """For each global voxel coord, count processed cubes containing it."""
        done = self.done_set()
        counts = np.zeros(len(coords), np.float32)
        # a cube at grid g contains voxel c iff g*stride <= c < g*stride + D
        # candidate g range per axis: ceil((c - D + 1)/stride) .. floor(c/stride)
        lo = -(-(coords - self.D + 1) // self.stride)
        hi = coords // self.stride
        span = (hi - lo).max() + 1 if len(coords) else 1
        for di in range(int(span)):
            for dj in range(int(span)):
                for dk in range(int(span)):
                    g = lo + np.array([di, dj, dk])
                    ok = (g <= hi).all(axis=1)
                    if not ok.any():
                        continue
                    keys = [tuple(x) for x in g[ok]]
                    hitmask = np.fromiter(
                        (k in done for k in keys), bool, count=len(keys)
                    )
                    idxs = np.nonzero(ok)[0][hitmask]
                    counts[idxs] += 1
        return counts

    # ------------------------------------------------------------- export

    def export_ply(
        self,
        path: str,
        occupancy_vote: Optional[float] = None,
        min_component: int = 0,
        keep_top_components: Optional[int] = None,
    ) -> int:
        pts, probs, colors = self.merge(
            occupancy_vote, min_component, keep_top_components
        )
        write_ply(path, pts, colors)
        return len(pts)
