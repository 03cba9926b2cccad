"""Robustness-to-real-imaging curves for the shipped weights (VERDICT r4
item 3; SURVEY.md SS6 — the testable proxy for DTU photographs while the
dataset is absent).

Reconstructs the golden sphere with weights/golden_sphere_30k under
increasing sensor noise, exposure/white-balance jitter, background
clutter, and calibration perturbation (data/synthetic.degrade_scene),
and records DTU-style accuracy/completeness per level.  Writes
results/robustness_r04.json.

Usage: python scripts/robustness_eval.py [weights_dir]
"""

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

# one knob per row; levels chosen around DTU-plausible magnitudes
AXES = {
    "noise_std": (0.01, 0.02, 0.05),
    "exposure_jitter": (0.1, 0.2, 0.4),
    "wb_jitter": (0.05, 0.1),
    "n_clutter": (4, 10),
    "calib_sigma_px": (0.5, 1.0, 2.0),
}
# everything-at-once: a DTU-like imaging condition
COMBINED = dict(
    noise_std=0.01, exposure_jitter=0.15, wb_jitter=0.05, n_clutter=4,
    calib_sigma_px=0.5,
)


def main(weights=os.path.join(REPO, "weights", "golden_sphere_30k")):
    on_tpu = jax.default_backend() != "cpu"
    cfg = Config(
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
    model, variables = load_pretrained(weights, cfg)

    def predictor(x, origins):
        return model.apply(variables, x, train=False)

    def run(scene, label):
        t0 = time.perf_counter()
        store, stats = run_sweep(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            cfg, predictor,
        )
        pts, probs, colors = store.merge()
        dt = time.perf_counter() - t0
        if not len(pts):
            P(f"{label}: EMPTY ({dt:.0f}s)")
            return {"label": label, "empty": True}
        acc, comp = accuracy_completeness(pts, gt)
        row = {
            "label": label,
            "acc_mm": round(float(acc), 4),
            "comp_mm": round(float(comp), 4),
            "overall_mm": round(float((acc + comp) / 2), 4),
            "n_pts": int(len(pts)),
        }
        P(f"{label}: acc {acc:.3f} comp {comp:.3f} overall "
          f"{(acc + comp) / 2:.3f} ({len(pts)} pts, {dt:.0f}s)")
        return row

    out = {
        "weights": os.path.relpath(weights, REPO),
        "recipe": (
            "sphere 12 views 600x800 f=200, s=0.5mm, 4 pairs, tau=0.7 "
            "gamma=0.7; degrade_scene seed=1 per row"
        ),
        "rows": [run(clean, "clean")],
    }
    for axis, levels in AXES.items():
        for lv in levels:
            sc = degrade_scene(clean, **{axis: lv}, seed=1)
            out["rows"].append(run(sc, f"{axis}={lv}"))
    out["rows"].append(
        run(degrade_scene(clean, **COMBINED, seed=1), "combined_dtu_like")
    )

    path = os.path.join(REPO, "results", "robustness_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    P(f"wrote {path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
