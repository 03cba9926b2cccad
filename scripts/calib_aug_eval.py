"""Does train-time calibration augmentation buy calibration robustness?

The r4 robustness curves (results/robustness_r04.json) show calibration
error is the ONE brittle imaging axis of the clean-trained shipped
weights: sigma=1 px triples overall mm while every photometric axis is
flat.  This script trains two models from scratch — identical except
`train.aug_calib_sigma_px` (0 vs 0.7) — and reconstructs under
calib_sigma_px in {0, 0.5, 1.0, 2.0}, writing the A/B curves to
results/robustness_aug_r04.json.

Short runs (default 4000 steps) suffice for the A/B: the question is the
SLOPE under degradation, not absolute quality.  Usage:
    python scripts/calib_aug_eval.py [n_steps]
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
from surfacenet_tpu.data.synthetic import degrade_scene, make_sphere_scene
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_surface import train_surfacenet
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SIGMAS = (0.0, 0.5, 1.0, 2.0)
AUG_SIGMA = 0.7


def main(n_steps=4000):
    n_steps = int(n_steps)
    on_tpu = jax.default_backend() != "cpu"
    scene = make_sphere_scene(n_views=12, hw=(600, 800), radius=30.0)
    gt = scene.surface_points(8000)
    base = Config(
        voxel=VoxelConfig(voxel_size_mm=0.5, cube_size=32, overlap=8),
        sweep=SweepConfig(cube_batch=32, use_pallas_gather=on_tpu),
        fusion=FusionConfig(
            n_view_pairs=4, tau=0.7, gamma=0.7,
            ray_pool_mode="affine_pallas" if on_tpu else "affine",
            n_pool_views=6,
        ),
        train=TrainConfig(
            batch_size=16, n_steps=n_steps, lr_decay="cosine", seed=0,
            scan_chunk=250,
        ),
    )

    out = {
        "recipe": (
            f"sphere 12 views 600x800, s=0.5mm D=32, {n_steps} steps "
            f"cosine, batch 16, seed 0; aug_calib_sigma_px 0 vs "
            f"{AUG_SIGMA}; eval sweep tau=0.7 4 pairs; same degrade "
            "seed=1 scenes for both models"
        ),
        "models": {},
    }
    for label, aug in (("clean_trained", 0.0), ("aug_trained", AUG_SIGMA)):
        cfg = dataclasses.replace(
            base, train=dataclasses.replace(
                base.train, aug_calib_sigma_px=aug
            ),
        )
        t0 = time.perf_counter()
        state, log = train_surfacenet(scene, cfg, log_every=500)
        P(f"{label}: trained {n_steps} steps in "
          f"{time.perf_counter() - t0:.0f}s, final loss "
          f"{log.losses[-1]:.4f}")

        def predictor(x, origins, _state=state):
            return _state.apply_fn(
                {"params": _state.params,
                 "batch_stats": _state.batch_stats},
                x, train=False,
            )

        rows = []
        for sig in SIGMAS:
            sc = (
                scene if sig == 0.0
                else degrade_scene(scene, calib_sigma_px=sig, seed=1)
            )
            store, _ = run_sweep(
                sc.images, sc.Ps, sc.bbox_min, sc.bbox_max, cfg, predictor,
            )
            pts, _, _ = store.merge()
            pts = np.asarray(pts)
            if not len(pts):
                rows.append({"calib_sigma_px": sig, "empty": True})
                P(f"  {label} sigma={sig}: EMPTY")
                continue
            acc, comp = accuracy_completeness(pts, gt)
            rows.append({
                "calib_sigma_px": sig,
                "acc_mm": round(float(acc), 4),
                "comp_mm": round(float(comp), 4),
                "overall_mm": round(float((acc + comp) / 2), 4),
                "n_pts": int(len(pts)),
            })
            P(f"  {label} sigma={sig}: overall "
              f"{(acc + comp) / 2:.3f} mm ({len(pts)} pts)")
        out["models"][label] = {
            "aug_calib_sigma_px": aug,
            "final_loss": round(float(log.losses[-1]), 4),
            "rows": rows,
        }

    path = os.path.join(REPO, "results", "robustness_aug_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    P(f"wrote {path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
