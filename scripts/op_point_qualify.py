"""Qualify the shipped model variants at the DTU preset operating point
(VERDICT r4 next #1).

The golden quality grids (results/quality_r03_aligned.json,
quality_r04_fast64.json) qualified the aligned/fast/fast64 models at the
TRAIN point (s=0.5 mm, 32^3 sweeps).  The flagship preset `dtu9_full`
runs s=0.4 mm, cube 64^3, 5 view pairs — nobody had measured quality
there, so the preset kept shipping the slowest qualified model.  This
script closes that gap: for each model variant with shipped golden
weights, reconstruct the golden sphere AND tori scenes at the preset
point (64^3 apply, 5 pairs, overlap 8, s from OP_S — default "0.4,0.5")
over a small tau grid, and record DTU-style acc/comp plus sweep
throughput -> results/op_point_r05.json.  The preset flip + README
operating-point table cite this artifact.

Run on the TPU chip:  python -u scripts/op_point_qualify.py
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
from surfacenet_tpu.data.synthetic import make_sphere_scene, make_tori_scene
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_surface import load_pretrained
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODELS = {
    "paper": (ModelConfig, "weights/golden_{scene}_30k"),
    "aligned": (ModelConfig.mxu_aligned, "weights/golden_{scene}_aligned_30k"),
    "fast": (ModelConfig.fast, "weights/golden_{scene}_fastE_30k"),
    "fast64": (ModelConfig.fast64, "weights/golden_{scene}_fast64_30k"),
}

TAUS = (0.6, 0.7, 0.8)
GAMMA = 0.8


def qualify(scene, gt, model_name: str, scene_name: str, s_mm: float,
            on_tpu: bool):
    mk, wtpl = MODELS[model_name]
    wdir = os.path.join(REPO, wtpl.format(scene=scene_name))
    if not os.path.isdir(wdir):
        P(f"  [{model_name}/{scene_name}] weights missing: {wdir} — skip")
        return None
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=s_mm, cube_size=64, overlap=8),
        model=mk(),
        fusion=FusionConfig(
            n_view_pairs=5, tau=0.7, gamma=GAMMA,
            ray_pool_mode="affine_pallas" if on_tpu else "affine",
            n_pool_views=6,
        ),
        sweep=SweepConfig(cube_batch=24, use_pallas_gather=on_tpu),
    )
    model, variables = load_pretrained(wdir, cfg)

    def predictor(x, origins):
        return model.apply(variables, x, train=False)

    rows, best = [], None
    walls = []
    import dataclasses

    for tau in TAUS:
        c = dataclasses.replace(
            cfg, fusion=dataclasses.replace(cfg.fusion, tau=tau)
        )
        t0 = time.perf_counter()
        store, stats = run_sweep(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            c, predictor,
        )
        dt = time.perf_counter() - t0
        walls.append((dt, stats.n_cubes_after_prefilter))
        pts, probs, colors = store.merge()
        if not len(pts):
            P(f"  tau={tau}: empty ({dt:.0f}s)")
            continue
        acc, comp = accuracy_completeness(pts, gt)
        overall = float(acc + comp) / 2
        row = dict(tau=tau, gamma=GAMMA, acc_mm=round(float(acc), 4),
                   comp_mm=round(float(comp), 4),
                   overall_mm=round(overall, 4), n_pts=len(pts))
        rows.append(row)
        P(f"  tau={tau}: acc {acc:.3f} comp {comp:.3f} overall "
          f"{overall:.3f} ({len(pts)} pts, {stats.n_cubes_after_prefilter} "
          f"cubes, {dt:.1f}s)")
        if best is None or overall < best["overall_mm"]:
            best = row
    # throughput: later tau runs reuse the compiled program (tau is a
    # traced scalar) — the last wall is the compile-free sweep time.
    wall, n_cubes = walls[-1] if walls else (float("nan"), 0)
    return {
        "weights": os.path.relpath(wdir, REPO),
        "grid": rows,
        "best": best,
        "n_cubes": int(n_cubes),
        "sweep_wall_s_warm": round(wall, 2),
        "sweep_cubes_per_s_warm": (
            round(n_cubes / wall, 1) if walls and wall > 0 else None
        ),
    }


def main():
    on_tpu = jax.default_backend() != "cpu"
    P(f"backend={jax.default_backend()}")
    s_list = [
        float(x) for x in os.environ.get("OP_S", "0.4,0.5").split(",")
    ]
    scenes = {
        "sphere": make_sphere_scene(
            n_views=12, hw=(600, 800), radius=30.0, focal=200.0
        ),
        "tori": make_tori_scene(n_views=12, hw=(600, 800), focal=800.0),
    }
    gts = {k: v.surface_points(8000) for k, v in scenes.items()}

    out = {
        "operating_point": {
            "cube_size": 64, "overlap": 8, "n_view_pairs": 5,
            "gamma": GAMMA, "taus": list(TAUS),
            "voxel_sizes_mm": s_list,
        },
        "note": (
            "64^3 apply of 32^3-trained (s=0.5mm) golden weights at the "
            "dtu9_full preset point; quality per model variant per scene, "
            "plus warm sweep throughput on this chip."
        ),
        "models": {},
    }
    path = os.path.join(REPO, "results", "op_point_r05.json")
    for model_name in MODELS:
        out["models"][model_name] = {}
        for scene_name, scene in scenes.items():
            for s_mm in s_list:
                key = f"{scene_name}@s{s_mm}"
                P(f"[{model_name}] {key}")
                try:
                    r = qualify(
                        scene, gts[scene_name], model_name, scene_name,
                        s_mm, on_tpu,
                    )
                except Exception as e:
                    P(f"  FAILED: {e!r}")
                    r = {"error": repr(e)}
                if r is not None:
                    out["models"][model_name][key] = r
                with open(path, "w") as f:
                    json.dump(out, f, indent=2)
                    f.write("\n")
    P("done -> " + path)


if __name__ == "__main__":
    main()
