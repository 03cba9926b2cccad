"""Matched selection A/B: angle-only vs proximity pair scoring, each
TRAINED AND APPLIED with its own selection distribution.

The r4 campaign found pair-selection geometry is part of the training
distribution (apply-time proximity collapses angle-trained weights 13x,
results/occlusion_r04.json), so the fair comparison trains one model per
selection policy (identical seeds/recipe otherwise) and evaluates each
with ITS OWN policy on the clean sphere and the occluded golden scene.
This decides the production default for cfg.fusion.pair_dist_sigma_frac.
Writes results/selection_ab_r04.json.

Usage: python scripts/selection_ab_eval.py [n_steps]   (default 8000)
"""

import dataclasses
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from surfacenet_tpu.config import (
    Config, FusionConfig, SweepConfig, TrainConfig, VoxelConfig,
)
from surfacenet_tpu.data.synthetic import make_occluded_scene, make_sphere_scene
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_surface import train_surfacenet
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OCC_DIR = np.array([1.0, 0.0, 0.0])


def main(n_steps=8000):
    n_steps = int(n_steps)
    on_tpu = jax.default_backend() != "cpu"
    train_scene = make_sphere_scene(n_views=12, hw=(600, 800), radius=30.0)
    occ = make_occluded_scene(n_views=12, hw=(600, 800), radius=30.0)
    gt_clean = train_scene.surface_points(8000)
    gt_occ = occ.surface_points(8000)
    hemi = (gt_occ - occ.center) @ OCC_DIR > 0.3 * occ.radius

    out = {
        "recipe": (
            f"sphere 12 views 600x800, s=0.5mm D=32, {n_steps} steps "
            "cosine batch 16 seed 0; each arm trains AND applies with "
            "its own pair_dist_sigma_frac; eval tau=0.7 4 pairs"
        ),
        "arms": {},
    }
    for label, frac in (("angle_trained", 0.0), ("prox_trained", 0.15)):
        cfg = Config(
            voxel=VoxelConfig(voxel_size_mm=0.5, cube_size=32, overlap=8),
            sweep=SweepConfig(cube_batch=32, use_pallas_gather=on_tpu),
            fusion=FusionConfig(
                n_view_pairs=4, tau=0.7, gamma=0.7,
                ray_pool_mode="affine_pallas" if on_tpu else "affine",
                n_pool_views=6, pair_dist_sigma_frac=frac,
            ),
            train=TrainConfig(
                batch_size=16, n_steps=n_steps, lr_decay="cosine",
                seed=0, scan_chunk=250,
            ),
        )
        t0 = time.perf_counter()
        state, log = train_surfacenet(train_scene, cfg, log_every=1000)
        P(f"{label}: {n_steps} steps in {time.perf_counter() - t0:.0f}s, "
          f"final loss {log.losses[-1]:.4f}")

        def predictor(x, origins, _state=state):
            return _state.apply_fn(
                {"params": _state.params,
                 "batch_stats": _state.batch_stats},
                x, train=False,
            )

        arm = {"pair_dist_sigma_frac": frac,
               "final_loss": round(float(log.losses[-1]), 4)}
        for sname, scene, gt in (
            ("clean", train_scene, gt_clean), ("occluded", occ, gt_occ),
        ):
            store, _ = run_sweep(
                scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
                cfg, predictor,
            )
            pts, _, _ = store.merge()
            pts = np.asarray(pts)
            if not len(pts):
                arm[sname] = {"empty": True}
                P(f"  {label} {sname}: EMPTY")
                continue
            acc, comp = accuracy_completeness(pts, gt)
            rec = {
                "acc_mm": round(float(acc), 4),
                "comp_mm": round(float(comp), 4),
                "overall_mm": round(float((acc + comp) / 2), 4),
                "n_pts": int(len(pts)),
            }
            if sname == "occluded":
                pm = (pts - scene.center) @ OCC_DIR > 0.3 * scene.radius
                if pm.any():
                    ah, ch = accuracy_completeness(pts[pm], gt_occ[hemi])
                    rec["hemi_overall_mm"] = round(float(ah + ch) / 2, 4)
            arm[sname] = rec
            P(f"  {label} {sname}: {rec}")
        out["arms"][label] = arm

    a, p = out["arms"]["angle_trained"], out["arms"]["prox_trained"]
    if "overall_mm" in a.get("clean", {}) and "overall_mm" in p.get(
        "clean", {}
    ):
        out["prox_vs_angle_clean"] = round(
            p["clean"]["overall_mm"] / a["clean"]["overall_mm"], 4
        )
    if "overall_mm" in a.get("occluded", {}) and "overall_mm" in p.get(
        "occluded", {}
    ):
        out["prox_vs_angle_occluded"] = round(
            p["occluded"]["overall_mm"] / a["occluded"]["overall_mm"], 4
        )
    path = os.path.join(REPO, "results", "selection_ab_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    P(f"wrote {path}: {json.dumps({k: v for k, v in out.items() if k != 'arms'})}")


if __name__ == "__main__":
    main(*sys.argv[1:])
