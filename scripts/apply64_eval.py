"""64^3 apply operating point (SURVEY.md C5 "trained at 32^3, applied at
64^3"; BASELINE config 2): reconstruct the golden scene with the shipped
32^3-trained weights at cube_size 32 AND 64 and report quality + speed for
the ARCHITECTURE.md table.

The model is fully convolutional, so the same params serve both sizes; 64^3
quadruples the per-cube receptive-field budget and quarters the cube count
(fewer overlap seams), at the cost of per-item VMEM (the Pallas conv falls
back to XLA where needed, ROOFLINE.md SS5).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python \
        scripts/apply64_eval.py > /tmp/apply64_eval.log 2>&1
"""

import functools
import time

import numpy as np
import jax

from surfacenet_tpu.config import (
    Config, FusionConfig, SweepConfig, VoxelConfig,
)
from surfacenet_tpu.data.synthetic import make_sphere_scene
from surfacenet_tpu.models.surfacenet import make_predictor
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_surface import load_pretrained
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)


def run_point(scene, gt, D: int, cube_batch: int) -> None:
    on_tpu = jax.default_backend() != "cpu"
    cfg = Config(
        voxel=VoxelConfig(
            voxel_size_mm=0.5, cube_size=D, overlap=D // 4
        ),
        fusion=FusionConfig(
            n_view_pairs=4, tau=0.7, gamma=0.7,
            ray_pool_mode="affine_pallas" if on_tpu else "affine",
            n_pool_views=6,
        ),
        sweep=SweepConfig(
            cube_batch=cube_batch, use_pallas_gather=on_tpu
        ),
    )
    model, variables = load_pretrained("weights/golden_sphere_30k", cfg)
    predict = make_predictor(model, variables, cfg.model)
    t0 = time.perf_counter()
    store, stats = run_sweep(
        scene.images, scene.Ps, scene.bbox_min, scene.bbox_max, cfg,
        predict,
    )
    pts, _, _ = store.merge()
    dt = time.perf_counter() - t0
    n = stats.n_cubes_after_prefilter
    if not len(pts):
        P(f"D={D}: EMPTY reconstruction ({n} cubes, {dt:.0f}s)")
        return
    acc, comp = accuracy_completeness(pts, gt)
    P(
        f"D={D}: acc {acc:.3f}mm comp {comp:.3f}mm overall "
        f"{(acc + comp) / 2:.3f}mm  ({len(pts)} pts, {n} cubes in "
        f"{dt:.0f}s = {n / dt:.1f} cubes/s)"
    )


def main():
    scene = make_sphere_scene(n_views=12, hw=(600, 800), radius=30.0)
    gt = scene.surface_points(8000)
    P(f"backend {jax.default_backend()}")
    run_point(scene, gt, D=32, cube_batch=32)
    run_point(scene, gt, D=64, cube_batch=24)


if __name__ == "__main__":
    main()
