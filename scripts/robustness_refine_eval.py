"""Calibration-robustness A/B with the self-calibration prepass (VERDICT
r4 next #4) -> results/robustness_r05.json.

Same production recipe as scripts/robustness_eval.py (sphere 12 views
600x800 f=200, s=0.5 mm, 4 pairs, weights/golden_sphere_30k): for each
calibration level sigma in {0 (clean), 0.5, 1, 2} px, reconstruct with the
refinement prepass OFF and ON and record DTU-style acc/comp + the prepass
wall time and detected shift.  The r4 brittleness finding this answers:
sigma=1 px took overall 0.605 -> 1.937 mm (3.2x) with every photometric
axis flat.  Gate (VERDICT): sigma=1 overall <= 1.5x clean, clean
regression <= 3%.

Run on the TPU chip:  python -u scripts/robustness_refine_eval.py
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
    Config, FusionConfig, ModelConfig, SweepConfig, VoxelConfig,
)
from surfacenet_tpu.data.synthetic import degrade_scene, make_sphere_scene
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_surface import load_pretrained
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(weights=os.path.join(REPO, "weights", "golden_sphere_30k")):
    on_tpu = jax.default_backend() != "cpu"
    base = Config(
        voxel=VoxelConfig(voxel_size_mm=0.5, cube_size=32, overlap=8),
        model=ModelConfig(),
        sweep=SweepConfig(cube_batch=32, use_pallas_gather=on_tpu),
        fusion=FusionConfig(
            n_view_pairs=4, tau=0.7, gamma=0.7,
            ray_pool_mode="affine_pallas" if on_tpu else "affine",
            n_pool_views=6,
        ),
    )
    clean = make_sphere_scene(
        n_views=12, hw=(600, 800), radius=30.0, focal=200.0
    )
    gt = clean.surface_points(8000)
    model, variables = load_pretrained(weights, base)

    def predictor(x, origins):
        return model.apply(variables, x, train=False)

    def run(scene, label, refine: bool):
        cfg = dataclasses.replace(
            base,
            sweep=dataclasses.replace(base.sweep, refine_calib=refine),
        )
        t0 = time.perf_counter()
        store, stats = run_sweep(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            cfg, predictor,
        )
        pts, probs, colors = store.merge()
        dt = time.perf_counter() - t0
        if not len(pts):
            P(f"{label}: EMPTY ({dt:.0f}s)")
            return {"label": label, "refine": refine, "empty": True}
        acc, comp = accuracy_completeness(pts, gt)
        row = {
            "label": label,
            "refine": refine,
            "acc_mm": round(float(acc), 4),
            "comp_mm": round(float(comp), 4),
            "overall_mm": round(float((acc + comp) / 2), 4),
            "n_pts": int(len(pts)),
            "wall_s": round(dt, 1),
        }
        P(f"{label} refine={refine}: acc {acc:.3f} comp {comp:.3f} "
          f"overall {(acc + comp) / 2:.3f} ({len(pts)} pts, {dt:.0f}s)")
        return row

    out = {
        "weights": os.path.relpath(weights, REPO),
        "recipe": (
            "sphere 12 views 600x800 f=200, s=0.5mm, 4 pairs, tau=0.7 "
            "gamma=0.7; degrade_scene seed=1 per row; refine prepass = "
            "geometry/refine.refine_calibration_auto defaults"
        ),
        "rows": [],
    }
    path = os.path.join(REPO, "results", "robustness_r05.json")
    for sigma in (0.0, 0.5, 1.0, 2.0):
        scene = (
            clean if sigma == 0.0
            else degrade_scene(clean, calib_sigma_px=sigma, seed=1)
        )
        label = "clean" if sigma == 0.0 else f"calib_sigma_px={sigma}"
        for refine in (False, True):
            out["rows"].append(run(scene, label, refine))
            with open(path, "w") as f:
                json.dump(out, f, indent=2)
                f.write("\n")
    P(f"wrote {path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
