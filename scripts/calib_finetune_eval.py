"""Annealed calibration fine-tune arm (VERDICT r4 weak #4) ->
results/robustness_ft_r05.json.

r4 measured always-on calibration augmentation (constant sigma=0.7 from
step 0): it flattens the degradation curve but costs 2.3x clean, so it
shipped default-off.  The standard trick went untried: keep the clean
30k weights and buy robustness with a SHORT fine-tune whose augmentation
sigma anneals to zero (train.aug_calib_anneal_steps, r5) — the late
clean steps restore clean accuracy while the early noisy steps leave the
robustness behind.

This script: load weights/golden_sphere_30k -> fine-tune FT_STEPS with
sigma=FT_SIGMA annealed to 0 -> ship weights/golden_sphere_ftcalib ->
reconstruct clean + sigma in {0.5, 1, 2} px with original vs fine-tuned
weights (same recipe as robustness_r04/r05).

Run on the TPU chip:  python -u scripts/calib_finetune_eval.py
"""

import dataclasses
import functools
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from surfacenet_tpu.config import (
    Config, FusionConfig, ModelConfig, SweepConfig, TrainConfig, VoxelConfig,
)
from surfacenet_tpu.data.synthetic import degrade_scene, make_sphere_scene
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_surface import (
    create_train_state, load_pretrained, train_surfacenet,
)
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FT_STEPS = int(os.environ.get("FT_STEPS", "3000"))
FT_SIGMA = float(os.environ.get("FT_SIGMA", "1.0"))
FT_LR = float(os.environ.get("FT_LR", "3e-4"))


def main():
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
    train_scene = make_sphere_scene(
        n_views=12, hw=(600, 800), radius=30.0, focal=200.0
    )
    gt = train_scene.surface_points(8000)

    # --- fine-tune from the shipped clean weights
    wsrc = os.path.join(REPO, "weights", "golden_sphere_30k")
    model, variables = load_pretrained(wsrc, base)
    ft_cfg = dataclasses.replace(
        base,
        train=TrainConfig(
            batch_size=16, lr=FT_LR, seed=7, n_steps=FT_STEPS,
            lr_decay="cosine", scan_chunk=25,
            aug_calib_sigma_px=FT_SIGMA,
            aug_calib_anneal_steps=FT_STEPS,
        ),
    )
    _, state = create_train_state(ft_cfg, jax.random.PRNGKey(7))
    state = state.replace(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", state.batch_stats),
    )
    t0 = time.perf_counter()
    state, log = train_surfacenet(train_scene, ft_cfg, state=state)
    P(f"fine-tuned {FT_STEPS} steps in {time.perf_counter()-t0:.0f}s; "
      f"loss {log.losses[0]:.4f} -> {log.losses[-1]:.4f}")

    import orbax.checkpoint as ocp

    wdir = os.path.join(REPO, "weights", "golden_sphere_ftcalib")
    if os.path.isdir(wdir):
        shutil.rmtree(wdir)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(wdir),
        {"params": state.params, "batch_stats": state.batch_stats},
        force=True,
    )
    ckptr.wait_until_finished()
    P(f"saved {wdir}")

    variants = {
        "orig": variables,
        "ftcalib": {"params": state.params, "batch_stats": state.batch_stats},
    }

    def run(scene, label, vars_):
        def predictor(x, origins):
            return model.apply(vars_, x, train=False)

        t0 = time.perf_counter()
        store, stats = run_sweep(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            base, predictor,
        )
        pts, probs, colors = store.merge()
        dt = time.perf_counter() - t0
        if not len(pts):
            return {"label": label, "empty": True}
        acc, comp = accuracy_completeness(pts, gt)
        row = {
            "label": label,
            "acc_mm": round(float(acc), 4),
            "comp_mm": round(float(comp), 4),
            "overall_mm": round(float((acc + comp) / 2), 4),
            "n_pts": int(len(pts)),
        }
        P(f"{label}: overall {(acc + comp) / 2:.3f} ({len(pts)} pts, "
          f"{dt:.0f}s)")
        return row

    out = {
        "recipe": (
            f"fine-tune: {FT_STEPS} steps from golden_sphere_30k, "
            f"lr {FT_LR} cosine, aug sigma {FT_SIGMA} px annealed to 0 "
            f"over the run (train.aug_calib_anneal_steps); eval recipe = "
            "robustness_r04 (sphere 12v 600x800 f=200, s=0.5, 4 pairs, "
            "tau .7 gamma .7, degrade seed=1)"
        ),
        "rows": [],
    }
    path = os.path.join(REPO, "results", "robustness_ft_r05.json")
    for sigma in (0.0, 0.5, 1.0, 2.0):
        scene = (
            train_scene if sigma == 0.0
            else degrade_scene(train_scene, calib_sigma_px=sigma, seed=1)
        )
        slabel = "clean" if sigma == 0.0 else f"calib_sigma_px={sigma}"
        for name, v in variants.items():
            out["rows"].append(run(scene, f"{slabel}/{name}", v))
            with open(path, "w") as f:
                json.dump(out, f, indent=2)
                f.write("\n")
    P(f"wrote {path}")


if __name__ == "__main__":
    main()
