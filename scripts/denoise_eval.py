"""Measure the quality effect of post-merge denoising (ops/denoise.py):
one sweep of a golden scene with the shipped weights, then acc/comp at
several fusion.min_component settings (merge is host-side, so the sweep
runs once and each setting is a cheap re-merge).

Usage: python scripts/denoise_eval.py [sphere|tori] [weights_dir]
Env: TAU (0.8), GAMMA (0.7), DEMO_VOXEL_MM (0.5), MIN_COMPONENTS
(comma list, default "0,4,9,16,25,50").
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import time

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


def main(which: str, weights: str):
    on_tpu = jax.default_backend() != "cpu"
    s_mm = float(os.environ.get("DEMO_VOXEL_MM", "0.5"))
    tau = float(os.environ.get("TAU", "0.8"))
    gamma = float(os.environ.get("GAMMA", "0.7"))
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=s_mm, cube_size=32, overlap=8),
        model=ModelConfig(),
        fusion=FusionConfig(
            n_view_pairs=4, tau=tau, gamma=gamma,
            ray_pool_mode="affine_pallas" if on_tpu else "affine",
            n_pool_views=6,
        ),
        sweep=SweepConfig(cube_batch=32, use_pallas_gather=on_tpu),
    )
    if which == "tori":
        focal = float(os.environ.get("DEMO_FOCAL", "800"))
        scene = make_tori_scene(n_views=12, hw=(600, 800), focal=focal)
    else:
        focal = float(os.environ.get("DEMO_FOCAL", "200"))
        scene = make_sphere_scene(n_views=12, hw=(600, 800), radius=30.0,
                                  focal=focal)
    model, variables = load_pretrained(weights, cfg)

    def predictor(x, origins):
        return model.apply(variables, x, train=False)

    t0 = time.perf_counter()
    store, stats = run_sweep(
        scene.images, scene.Ps, scene.bbox_min, scene.bbox_max, cfg,
        predictor,
    )
    P(f"sweep done in {time.perf_counter() - t0:.0f}s "
      f"({stats.n_cubes_after_prefilter} cubes)")
    gt = scene.surface_points(8000)

    mins = [
        int(v) for v in
        os.environ.get("MIN_COMPONENTS", "0,4,9,16,25,50").split(",")
    ]
    rows = {}
    for mc in mins:
        t0 = time.perf_counter()
        pts, _, _ = store.merge(min_component=mc)
        dt = time.perf_counter() - t0
        if not len(pts):
            P(f"min_component={mc}: empty")
            continue
        acc, comp = accuracy_completeness(pts, gt)
        overall = (acc + comp) / 2
        rows[mc] = {
            "acc_mm": round(float(acc), 4),
            "comp_mm": round(float(comp), 4),
            "overall_mm": round(float(overall), 4),
            "points": int(len(pts)),
            "merge_s": round(dt, 2),
        }
        P(f"min_component={mc}: acc {acc:.3f} comp {comp:.3f} "
          f"overall {overall:.3f} ({len(pts)} pts, merge {dt:.1f}s)")
    P(json.dumps({"scene": which, "tau": tau, "gamma": gamma,
                  "s_mm": s_mm, "rows": rows}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "sphere"
    default_w = os.path.join(
        REPO, "weights",
        "golden_sphere_30k" if which == "sphere" else "golden_tori_30k",
    )
    main(which, sys.argv[2] if len(sys.argv) > 2 else default_w)
