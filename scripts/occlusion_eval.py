"""Occluded-scene learned-vs-geometric pair selection eval (r3 item 4).

SURVEY.md C6's point is occlusion/specularity robustness: the occluded
golden scene (data/synthetic.make_occluded_scene) defeats the geometric
prior — a repeated-texture occluder disk outside the sweep bbox blocks
the sphere for the views nearest +x, which no frustum or baseline-angle
computation can detect.  This script measures, with the photoconsistency
predictor (model-free, so the delta is attributable to selection alone):

  * geometric selection (the r2 default),
  * scene-global learned similarity (select_pairs_learned — the r2 tie),
  * cube-local learned consensus (select_pairs_learned_local — the r3
    production --pairnet path),

on the occluded scene (full + occluded-hemisphere metrics) and the clean
sphere (no-regression), writing results/occlusion_r03.json.

The pairnet is trained on the CLEAN sphere: triplet sampling on the
occluded scene itself would mark occluder-texture patches as positives of
sphere patches and poison the embedding.

Usage: python scripts/occlusion_eval.py
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from surfacenet_tpu.config import Config, FusionConfig, SweepConfig, VoxelConfig
from surfacenet_tpu.data.synthetic import make_occluded_scene, make_sphere_scene
from surfacenet_tpu.ops.view_pairs import (
    select_pairs_learned,
    select_pairs_learned_local,
    view_similarity_from_scene,
)
from surfacenet_tpu.pipeline.sweep import photoconsistency_predictor, run_sweep
from surfacenet_tpu.train.train_pair import train_pairnet
from surfacenet_tpu.utils.metrics import accuracy_completeness

OCC_DIR = np.array([1.0, 0.0, 0.0])


def sweep_points(scene, cfg, selector):
    store, _ = run_sweep(
        scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
        cfg, photoconsistency_predictor, pair_selector=selector,
    )
    pts, _, _ = store.merge()
    return np.asarray(pts)


def report(scene, pts, gt, hemi_mask=None):
    acc, comp = accuracy_completeness(pts, gt)
    rec = {
        "acc_mm": round(float(acc), 3),
        "comp_mm": round(float(comp), 3),
        "overall_mm": round(float(acc + comp) / 2, 3),
        "n_pts": int(len(pts)),
    }
    if hemi_mask is not None:
        pm = (pts - scene.center) @ OCC_DIR > 0.3 * scene.radius
        acc_h, comp_h = accuracy_completeness(pts[pm], gt[hemi_mask])
        rec["hemi_overall_mm"] = round(float(acc_h + comp_h) / 2, 3)
    return rec


def main():
    clean = make_sphere_scene(n_views=10, hw=(120, 160))
    occ = make_occluded_scene(n_views=12, hw=(120, 160))
    print("occluded views (center-ray):", occ.occluded_views().tolist())

    model, variables, losses = train_pairnet(clean, Config(), n_steps=600)
    print(f"pairnet (clean-trained): loss {losses[0]:.3f} -> {losses[-1]:.3f}")

    pcfg = Config()
    out = {"pairnet": "trained on clean sphere, 600 triplet steps",
           "scenes": {}}
    for name, scene, n_views_pairs in [("occluded", occ, 4), ("sphere", clean, 3)]:
        cfg = Config(
            voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
            fusion=FusionConfig(n_view_pairs=n_views_pairs, tau=0.25, gamma=0.6),
            sweep=SweepConfig(cube_batch=8),
        )
        gt = scene.surface_points(4000)
        hemi = (
            ((gt - scene.center) @ OCC_DIR > 0.3 * scene.radius)
            if name == "occluded" else None
        )
        common = dict(
            n_pairs=cfg.fusion.n_view_pairs,
            image_hw=scene.images.shape[1:3],
            extent_mm=cfg.voxel.cube_extent_mm,
        )
        sim = view_similarity_from_scene(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            model, variables, pcfg.pairnet.patch_size, n_points=64,
        )
        rows = {}
        for label, sel in [
            ("geometric", None),
            ("learned_global", functools.partial(
                select_pairs_learned, similarity=sim, **common)),
            ("learned_local", functools.partial(
                select_pairs_learned_local, images=scene.images,
                model=model, variables=variables,
                patch_size=pcfg.pairnet.patch_size, **common)),
        ]:
            pts = sweep_points(scene, cfg, sel)
            rows[label] = report(scene, pts, gt, hemi)
            print(f"[{name}] {label}: {rows[label]}")
        out["scenes"][name] = rows

    o = out["scenes"]["occluded"]
    out["gap_pct_full"] = round(
        100 * (1 - o["learned_local"]["overall_mm"]
               / o["geometric"]["overall_mm"]), 1)
    out["gap_pct_hemi"] = round(
        100 * (1 - o["learned_local"]["hemi_overall_mm"]
               / o["geometric"]["hemi_overall_mm"]), 1)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "results", "occlusion_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}; local-vs-geo gap: full {out['gap_pct_full']}% "
          f"hemi {out['gap_pct_hemi']}%")


if __name__ == "__main__":
    main()
