"""Occlusion eval with the TRAINED SurfaceNet (VERDICT r4 item 4).

results/occlusion_r03.json measured a learned-vs-geometric selection win
with the photoconsistency oracle; the r4 measurement campaign showed
that win was selection DECORRELATION, not detection (the consensus gates
did not separate occluded from clean views: mean gate 0.489 vs 0.458),
and that pair-selection geometry is part of the TRAINING distribution:
the proximity term wins 36%/31% in the low-res oracle regime but
collapses the angle-trained shipped weights 13x at apply time.  This
script measures the full story with the SHIPPED trained model
(weights/golden_sphere_30k) at the production operating point
(s=0.5 mm, D=32, 600x800 renders), on the occluded golden scene and the
clean sphere:

  * geometric - the production default (angle-only, matches training),
  * proximity - pair_dist_sigma_frac=0.15 at apply time, deliberately
    MISMATCHED with the angle-trained weights (quantifies the coupling;
    the matched comparison is scripts/selection_ab_eval.py),
  * geometric + fusion_mode="consensus" - the occlusion-robust fusion,
  * learned_global / learned_local - the pairnet paths (clean-trained).
    At 600x800 the 32-px probes carry real texture and the cube-local
    gates separate the occluder decisively (unlike the 120x160 oracle
    scenes): measured 46% better than geometric under occlusion at
    1.8% clean cost - the production occlusion path.

Writes results/occlusion_r04.json.  Usage:
    python scripts/occlusion_trained_eval.py [weights_dir]
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
    Config, FusionConfig, SweepConfig, VoxelConfig,
)
from surfacenet_tpu.data.synthetic import make_occluded_scene, make_sphere_scene
from surfacenet_tpu.ops.view_pairs import (
    select_pairs_learned,
    select_pairs_learned_local,
    view_similarity_from_scene,
)
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_pair import train_pairnet
from surfacenet_tpu.train.train_surface import load_pretrained
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OCC_DIR = np.array([1.0, 0.0, 0.0])


def main(weights=os.path.join(REPO, "weights", "golden_sphere_30k")):
    on_tpu = jax.default_backend() != "cpu"
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=0.5, cube_size=32, overlap=8),
        sweep=SweepConfig(cube_batch=32, use_pallas_gather=on_tpu),
        fusion=FusionConfig(
            n_view_pairs=4, tau=0.7, gamma=0.7,
            ray_pool_mode="affine_pallas" if on_tpu else "affine",
            n_pool_views=6,
        ),
    )
    model, variables = load_pretrained(weights, cfg)

    def predictor(x, origins):
        return model.apply(variables, x, train=False)

    clean = make_sphere_scene(n_views=12, hw=(600, 800), radius=30.0)
    occ = make_occluded_scene(n_views=12, hw=(600, 800), radius=30.0)
    P(f"occluded views (center-ray): {occ.occluded_views().tolist()}")

    pcfg = Config()
    pmodel, pvars, losses = train_pairnet(clean, pcfg, n_steps=600)
    P(f"pairnet (clean-trained): loss {losses[0]:.3f} -> {losses[-1]:.3f}")

    out = {
        "weights": os.path.relpath(weights, REPO),
        "recipe": (
            "trained SurfaceNet predictor, s=0.5mm D=32 o=8, 4 pairs "
            "tau=0.7 gamma=0.7, 12 views 600x800; pairnet clean-trained "
            "600 triplet steps; oracle rows live in occlusion_r03.json"
        ),
        "scenes": {},
    }
    for name, scene in [("occluded", occ), ("sphere", clean)]:
        gt = scene.surface_points(8000)
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
            pmodel, pvars, pcfg.pairnet.patch_size, n_points=64,
        )
        import dataclasses

        cons_cfg = dataclasses.replace(
            cfg, fusion=dataclasses.replace(
                cfg.fusion, fusion_mode="consensus"
            ),
        )
        prox_cfg = dataclasses.replace(
            cfg, fusion=dataclasses.replace(
                cfg.fusion, pair_dist_sigma_frac=0.15
            ),
        )
        rows = {}
        for label, run_cfg, sel in [
            ("geometric", cfg, None),  # production default (angle-only)
            ("proximity", prox_cfg, None),  # apply-time prox, MISMATCHED
            #   with the angle-trained weights on purpose: quantifies the
            #   train/apply selection-distribution coupling
            ("geometric_consensus", cons_cfg, None),
            ("learned_global", cfg, functools.partial(
                select_pairs_learned, similarity=sim, **common)),
            ("learned_local", cfg, functools.partial(
                select_pairs_learned_local, images=scene.images,
                model=pmodel, variables=pvars,
                patch_size=pcfg.pairnet.patch_size, **common)),
        ]:
            t0 = time.perf_counter()
            store, _ = run_sweep(
                scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
                run_cfg, predictor, pair_selector=sel,
            )
            pts, _, _ = store.merge()
            pts = np.asarray(pts)
            dt = time.perf_counter() - t0
            acc, comp = accuracy_completeness(pts, gt)
            rec = {
                "acc_mm": round(float(acc), 3),
                "comp_mm": round(float(comp), 3),
                "overall_mm": round(float(acc + comp) / 2, 3),
                "n_pts": int(len(pts)),
            }
            if hemi is not None and len(pts):
                pm = (pts - scene.center) @ OCC_DIR > 0.3 * scene.radius
                if pm.any():
                    ah, ch = accuracy_completeness(pts[pm], gt[hemi])
                    rec["hemi_overall_mm"] = round(float(ah + ch) / 2, 3)
            rows[label] = rec
            P(f"[{name}] {label}: {rec} ({dt:.0f}s)")
        out["scenes"][name] = rows

    o = out["scenes"]["occluded"]
    s = out["scenes"]["sphere"]
    out["prox_mismatch_ratio_occluded"] = round(
        o["proximity"]["overall_mm"] / o["geometric"]["overall_mm"], 2)
    out["prox_mismatch_ratio_clean"] = round(
        s["proximity"]["overall_mm"] / s["geometric"]["overall_mm"], 2)
    out["consensus_ratio_occluded"] = round(
        o["geometric_consensus"]["overall_mm"]
        / o["geometric"]["overall_mm"], 4)
    out["consensus_ratio_clean"] = round(
        s["geometric_consensus"]["overall_mm"]
        / s["geometric"]["overall_mm"], 4)
    out["learned_local_ratio_occluded"] = round(
        o["learned_local"]["overall_mm"] / o["geometric"]["overall_mm"], 4)
    out["learned_local_ratio_clean"] = round(
        s["learned_local"]["overall_mm"] / s["geometric"]["overall_mm"], 4)
    path = os.path.join(REPO, "results", "occlusion_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    P(f"wrote {path}; prox-mismatch ratio occ/clean "
      f"{out['prox_mismatch_ratio_occluded']}/"
      f"{out['prox_mismatch_ratio_clean']}; consensus ratio occ/clean "
      f"{out['consensus_ratio_occluded']}/{out['consensus_ratio_clean']}")


if __name__ == "__main__":
    main(*sys.argv[1:])
