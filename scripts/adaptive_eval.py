"""Adaptive-vs-fixed binarization threshold eval (r3 item 5).

BASELINE config 2 ships ``adaptive_threshold`` (paper SS5.3) but round 2
never measured it.  This script reconstructs the golden sphere and tori
scenes with the shipped paper-width weights, sweeping

  * fixed tau in {0.7, 0.8, 0.9} (gamma 0.7 — the shipped operating point),
  * adaptive thresholding over target_density in {0.005, 0.01, 0.02, 0.04},

and writes results/adaptive_r03.json so configs can ship whichever wins.

Usage: python scripts/adaptive_eval.py [sphere|tori|both]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax

from surfacenet_tpu.config import (
    Config, FusionConfig, ModelConfig, SweepConfig, VoxelConfig,
)
from surfacenet_tpu.data.synthetic import make_sphere_scene, make_tori_scene
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_surface import load_pretrained
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def eval_scene(which: str) -> dict:
    on_tpu = jax.default_backend() != "cpu"
    s_mm = float(os.environ.get("DEMO_VOXEL_MM", "0.5"))
    if which == "tori":
        scene = make_tori_scene(n_views=12, hw=(600, 800), focal=800.0)
        weights = os.path.join(REPO, "weights", "golden_tori_30k")
    else:
        scene = make_sphere_scene(
            n_views=12, hw=(600, 800), radius=30.0, focal=200.0
        )
        weights = os.path.join(REPO, "weights", "golden_sphere_30k")
    gt = scene.surface_points(8000)

    def make_cfg(**fusion_kw):
        return Config(
            voxel=VoxelConfig(voxel_size_mm=s_mm, cube_size=32, overlap=8),
            model=ModelConfig(),
            fusion=FusionConfig(
                n_view_pairs=4, gamma=0.7,
                ray_pool_mode="affine_pallas" if on_tpu else "affine",
                n_pool_views=6, **fusion_kw,
            ),
            sweep=SweepConfig(cube_batch=32, use_pallas_gather=on_tpu),
        )

    cfg0 = make_cfg(tau=0.8)
    model, variables = load_pretrained(weights, cfg0)

    def predictor(x, origins):
        return model.apply(variables, x, train=False)

    def one(cfg, label):
        t0 = time.perf_counter()
        store, stats = run_sweep(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            cfg, predictor,
        )
        pts, _, _ = store.merge()
        dt = time.perf_counter() - t0
        if not len(pts):
            P(f"[{which}] {label}: EMPTY ({dt:.0f}s)")
            return {"label": label, "empty": True}
        acc, comp = accuracy_completeness(pts, gt)
        rec = {
            "label": label,
            "acc_mm": round(float(acc), 4),
            "comp_mm": round(float(comp), 4),
            "overall_mm": round(float(acc + comp) / 2, 4),
            "n_pts": int(len(pts)),
        }
        P(f"[{which}] {label}: acc {acc:.3f} comp {comp:.3f} "
          f"overall {rec['overall_mm']} ({len(pts)} pts, {dt:.0f}s)")
        return rec

    rows = []
    for tau in (0.7, 0.8, 0.9):
        rows.append(one(make_cfg(tau=tau), f"fixed tau={tau}"))
    for dens in (0.005, 0.01, 0.02, 0.04):
        rows.append(one(
            make_cfg(tau=0.8, adaptive_threshold=True,
                     adaptive_target_density=dens),
            f"adaptive dens={dens}",
        ))
    nonempty = [r for r in rows if not r.get("empty")]
    best = min(nonempty, key=lambda r: r["overall_mm"])
    P(f"[{which}] BEST: {best['label']} overall {best['overall_mm']}mm")
    return {"rows": rows, "best": best}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = {}
    for w in (["sphere", "tori"] if which == "both" else [which]):
        out[w] = eval_scene(w)
    path = os.path.join(REPO, "results", "adaptive_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    P(f"wrote {path}")


if __name__ == "__main__":
    main()
