"""Pairnet at real scale (VERDICT r4 next #7; SURVEY C6/C12) ->
weights/pairnet_10k + results/occlusion_r05.json.

The r4 occlusion win (46% under occlusion at 1.8% clean cost) used a
600-step clean-sphere pairnet; the verdict's critique: the win leans on
the consensus gating math, and the embedding itself was token-scale,
single-scene, clean-only.  This round trains the triplet net properly:

  * multi-scene: clean sphere + occluded sphere (disk + specular) + tori,
    all at production 600x800 renders;
  * occluded-view hard negatives (sample_triplets hard_negative_frac):
    the same 3D point seen through the occluder — the exact appearance
    the cube-local gates must reject;
  * 10k steps (vs 600).

Then re-runs the r4 occlusion eval rows (geometric vs learned_local)
with the 10k net AND the shipped 600-step-class net side by side, on the
occluded scene and the clean sphere.

Usage:
  JAX_PLATFORMS=cpu python -u scripts/pairnet_r05.py train   # CPU ok
  python -u scripts/pairnet_r05.py eval                      # needs TPU
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
from surfacenet_tpu.data.synthetic import (
    make_occluded_scene, make_sphere_scene, make_tori_scene,
)
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OCC_DIR = np.array([1.0, 0.0, 0.0])
N_STEPS = int(os.environ.get("PAIRNET_STEPS", "10000"))


def scenes_600():
    return {
        "clean": make_sphere_scene(n_views=12, hw=(600, 800), radius=30.0),
        "occluded": make_occluded_scene(n_views=12, hw=(600, 800),
                                        radius=30.0),
        "tori": make_tori_scene(n_views=12, hw=(600, 800), focal=800.0),
    }


def train():
    from surfacenet_tpu.train.train_pair import save_pairnet, train_pairnet

    sc = scenes_600()
    cfg = Config()
    t0 = time.perf_counter()
    model, variables, losses = train_pairnet(
        [sc["clean"], sc["occluded"], sc["tori"]], cfg,
        n_steps=N_STEPS, lr=1e-3, hard_negative_frac=0.3,
    )
    P(f"pairnet: {N_STEPS} steps in {time.perf_counter()-t0:.0f}s, "
      f"loss {np.mean(losses[:50]):.4f} -> {np.mean(losses[-50:]):.4f}")
    save_pairnet(os.path.join(REPO, "weights"), variables, step=N_STEPS)
    P(f"saved weights/pairnet_{N_STEPS}")


def eval_():
    from surfacenet_tpu.ops.view_pairs import select_pairs_learned_local
    from surfacenet_tpu.pipeline.sweep import run_sweep
    from surfacenet_tpu.train.train_pair import restore_pairnet
    from surfacenet_tpu.train.train_surface import load_pretrained

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
    model, variables = load_pretrained(
        os.path.join(REPO, "weights", "golden_sphere_30k"), cfg
    )

    def predictor(x, origins):
        return model.apply(variables, x, train=False)

    pcfg = Config()
    nets = {}
    for label, step in (("pairnet_1500", 1500), ("pairnet_10k", N_STEPS)):
        try:
            nets[label] = restore_pairnet(
                os.path.join(REPO, "weights"), pcfg, step=step
            )
        except FileNotFoundError as e:
            P(f"{label}: missing ({e}); skipping")

    sc = scenes_600()
    out = {
        "recipe": (
            f"eval = occlusion_r04 rows (s=0.5 D=32 o=8, 4 pairs, tau .7 "
            f"gamma .7, 12v 600x800); pairnet_10k = {N_STEPS} steps, "
            "multi-scene (clean+occluded+tori 600x800), "
            "hard_negative_frac 0.3 (occluded-view hard negatives)"
        ),
        "scenes": {},
    }
    path = os.path.join(REPO, "results", "occlusion_r05.json")
    for name in ("occluded", "clean"):
        scene = sc[name]
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
        rows = {}
        selectors = [("geometric", None)]
        for label, (pmodel, pvars) in nets.items():
            selectors.append((
                f"learned_local/{label}",
                functools.partial(
                    select_pairs_learned_local, images=scene.images,
                    model=pmodel, variables=pvars,
                    patch_size=pcfg.pairnet.patch_size, **common,
                ),
            ))
        for label, sel in selectors:
            t0 = time.perf_counter()
            store, _ = run_sweep(
                scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
                cfg, predictor, pair_selector=sel,
            )
            pts, _, _ = store.merge()
            pts = np.asarray(pts)
            dt = time.perf_counter() - t0
            if not len(pts):
                # guard: inf acc/comp would serialize as non-RFC
                # 'Infinity' and poison the ratio lines
                rows[label] = {"empty": True, "n_pts": 0}
                P(f"[{name}] {label}: EMPTY ({dt:.0f}s)")
                continue
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
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
            f.write("\n")

    o, c = out["scenes"]["occluded"], out["scenes"]["clean"]
    for label in nets:
        k = f"learned_local/{label}"
        for tag, rows_ in (("occluded", o), ("clean", c)):
            a = rows_.get(k, {}).get("overall_mm")
            b = rows_.get("geometric", {}).get("overall_mm")
            if a is not None and b:
                out[f"ratio_{tag}/{label}"] = round(a / b, 4)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    P(f"wrote {path}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "train"
    (train if mode == "train" else eval_)()
