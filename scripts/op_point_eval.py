"""Operating-point sweep for a trained checkpoint: reconstruct the golden
sphere at several (tau, gamma) points and report DTU-style acc/comp.

Usage: python scripts/op_point_eval.py /tmp/sn_demo_ckpt [step]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax

from surfacenet_tpu.config import (
    Config, FusionConfig, ModelConfig, SweepConfig, TrainConfig, VoxelConfig,
)
from surfacenet_tpu.data.synthetic import make_sphere_scene, make_tori_scene
from surfacenet_tpu.models.surfacenet import SurfaceNet
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_surface import restore_checkpoint
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)


def main(ckpt_dir: str, step=None):
    on_tpu = jax.default_backend() != "cpu"
    s_mm = float(os.environ.get("DEMO_VOXEL_MM", "0.5"))
    base = Config(
        voxel=VoxelConfig(voxel_size_mm=s_mm, cube_size=32, overlap=8),
        model=ModelConfig(),
        sweep=SweepConfig(cube_batch=32, use_pallas_gather=on_tpu),
        # opt-state template must match how the checkpoint was trained
        train=TrainConfig(
            batch_size=16, lr=3e-3, seed=0, n_steps=30000,
            lr_decay=os.environ.get("DEMO_LR_DECAY", "none"),
        ),
    )
    state, got = restore_checkpoint(ckpt_dir, base, step)
    P(f"restored step {got} from {ckpt_dir}")
    focal = float(os.environ.get("DEMO_FOCAL", "1000"))
    if os.environ.get("DEMO_SCENE", "sphere") == "tori":
        scene = make_tori_scene(n_views=12, hw=(600, 800), focal=focal)
    else:
        scene = make_sphere_scene(
            n_views=12, hw=(600, 800), radius=30.0, focal=focal
        )
    gt = scene.surface_points(8000)

    model = SurfaceNet(base.model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def predictor(x, origins):
        return model.apply(variables, x, train=False)

    best = None
    taus = tuple(
        float(t) for t in
        os.environ.get("EVAL_TAUS", "0.6,0.7,0.8,0.9").split(",")
    )
    gammas = tuple(
        float(g) for g in os.environ.get("EVAL_GAMMAS", "0.7,0.8").split(",")
    )
    for tau in taus:
        for gamma in gammas:
            cfg = Config(
                voxel=base.voxel, model=base.model, sweep=base.sweep,
                fusion=FusionConfig(
                    n_view_pairs=4, tau=tau, gamma=gamma,
                    ray_pool_mode="affine_pallas" if on_tpu else "affine",
                    n_pool_views=6,
                ),
            )
            t0 = time.perf_counter()
            store, stats = run_sweep(
                scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
                cfg, predictor,
            )
            pts, probs, colors = store.merge()
            dt = time.perf_counter() - t0
            if not len(pts):
                P(f"tau={tau} gamma={gamma}: empty ({dt:.0f}s)")
                continue
            acc, comp = accuracy_completeness(pts, gt)
            overall = (acc + comp) / 2
            P(f"tau={tau} gamma={gamma}: acc {acc:.3f} comp {comp:.3f} "
              f"overall {overall:.3f} ({len(pts)} pts, {dt:.0f}s, "
              f"{stats.n_cubes_after_prefilter/dt:.1f} cubes/s)")
            if best is None or overall < best[0]:
                best = (overall, tau, gamma, acc, comp, len(pts))
    if best:
        P(f"BEST: overall {best[0]:.3f}mm at tau={best[1]} gamma={best[2]} "
          f"(acc {best[3]:.3f}, comp {best[4]:.3f}, {best[5]} pts)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sn_demo_ckpt",
         int(sys.argv[2]) if len(sys.argv) > 2 else None)
