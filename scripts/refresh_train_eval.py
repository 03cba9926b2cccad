"""Pool-refresh training demo with held-out eval curve (r3 item 6).

Trains the paper-width model on a PointCloudScene (the DTU-shaped path
whose pooled sampler previously drew 2,048 cubes ONCE for a 30k-step run)
with train.pool_refresh_steps rebuilding the pool mid-run and
train.eval_every logging class-balanced BCE on a disjoint held-out pool.
Writes results/refresh_train_r03.json with the train + eval curves.

Usage: python scripts/refresh_train_eval.py [n_steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from surfacenet_tpu.config import (
    Config, ModelConfig, SweepConfig, TrainConfig, VoxelConfig,
)
from surfacenet_tpu.data.scene import PointCloudScene
from surfacenet_tpu.data.synthetic import make_sphere_scene
from surfacenet_tpu.train.train_surface import train_surfacenet

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(n_steps: int):
    import jax

    on_tpu = jax.default_backend() != "cpu"
    base = make_sphere_scene(n_views=12, hw=(600, 800), radius=30.0,
                             focal=200.0)
    scene = PointCloudScene(
        images=base.images, Ps=base.Ps,
        gt_points=base.surface_points(120_000, seed=7),
        name="sphere_cloud",
    )
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=0.5, cube_size=32, overlap=8),
        model=ModelConfig(),
        sweep=SweepConfig(use_pallas_gather=on_tpu),
        train=TrainConfig(
            batch_size=16, lr=3e-3, lr_decay="cosine", n_steps=n_steps,
            seed=0, scan_chunk=250, pool_size=2048,
            pool_refresh_steps=2000, eval_every=1000,
        ),
    )
    t0 = time.time()
    state, log = train_surfacenet(scene, cfg, n_steps=n_steps,
                                  log_every=250)
    dt = time.time() - t0
    rec = {
        "scene": "PointCloudScene (120k-point sphere cloud, DTU-shaped path)",
        "recipe": (
            f"{n_steps} steps, batch 16, lr 3e-3 cosine, s=0.5mm, "
            "pool_size 2048, pool_refresh_steps 2000, eval_every 1000"
        ),
        "train_seconds": round(dt, 1),
        "steps_per_s": round(n_steps / dt, 2),
        "train_steps": log.steps,
        "train_losses": [round(v, 4) for v in log.losses],
        "eval_steps": log.eval_steps,
        "eval_losses": [round(v, 4) for v in log.eval_losses],
    }
    path = os.path.join(REPO, "results", "refresh_train_r03.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
    print(f"wrote {path}: {n_steps} steps in {dt:.0f}s "
          f"({rec['steps_per_s']} steps/s); final train "
          f"{log.losses[-1]:.4f}, final eval {log.eval_losses[-1]:.4f}",
          flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30000)
