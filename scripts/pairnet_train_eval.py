"""Train the pairnet on the golden scene, ship weights, and measure the
learned-vs-geometric pair-selection delta (SURVEY.md C6/C12 closure).

Runs the full loop:
  1. triplet-train PairNet on the golden sphere scene;
  2. save params-only weights to weights/pairnet_golden;
  3. reconstruct the scene with the shipped SurfaceNet weights twice —
     geometric pair selection vs learned (similarity-matrix) selection;
  4. print acc/comp for both (the ARCHITECTURE.md C6 table row).

Run:  PYTHONPATH=/root/.axon_site:/root/repo python \
        scripts/pairnet_train_eval.py [n_steps] > /tmp/pairnet_eval.log
"""

import functools
import sys
import time

import numpy as np
import jax

from surfacenet_tpu.config import (
    Config, FusionConfig, SweepConfig, TrainConfig, VoxelConfig,
)
from surfacenet_tpu.data.synthetic import make_sphere_scene
from surfacenet_tpu.models.surfacenet import make_predictor
from surfacenet_tpu.ops.view_pairs import (
    select_pairs_learned, view_similarity_from_scene,
)
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_pair import save_pairnet, train_pairnet
from surfacenet_tpu.train.train_surface import load_pretrained
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)


def main(n_steps: int = 1500):
    on_tpu = jax.default_backend() != "cpu"
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=0.5, cube_size=32, overlap=8),
        fusion=FusionConfig(
            n_view_pairs=4, tau=0.5, gamma=0.7,
            ray_pool_mode="affine_pallas" if on_tpu else "affine",
            n_pool_views=6,
        ),
        sweep=SweepConfig(cube_batch=16, use_pallas_gather=on_tpu),
        train=TrainConfig(batch_size=16, seed=0),
    )
    scene = make_sphere_scene(n_views=12, hw=(600, 800), radius=30.0)
    P(f"scene {scene.images.shape}, backend {jax.default_backend()}")

    t0 = time.perf_counter()
    model, variables, losses = train_pairnet(
        scene, cfg, n_steps=n_steps, lr=1e-3
    )
    P(f"pairnet: {n_steps} steps in {time.perf_counter()-t0:.0f}s, "
      f"loss {np.mean(losses[:20]):.4f} -> {np.mean(losses[-20:]):.4f}")
    save_pairnet("weights", variables, step=n_steps)
    P(f"saved weights/pairnet_{n_steps}")

    sn_model, sn_vars = load_pretrained("weights/golden_sphere_30k", cfg)
    predict = make_predictor(sn_model, sn_vars, cfg.model)
    gt = scene.surface_points(8000)

    def eval_selector(tag, selector):
        t0 = time.perf_counter()
        store, stats = run_sweep(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            cfg, predict, pair_selector=selector,
        )
        pts, _, _ = store.merge()
        dt = time.perf_counter() - t0
        if not len(pts):
            P(f"{tag}: EMPTY reconstruction")
            return
        acc, comp = accuracy_completeness(pts, gt)
        P(f"{tag}: acc {acc:.3f}mm comp {comp:.3f}mm overall "
          f"{(acc+comp)/2:.3f}mm  ({len(pts)} pts, {dt:.0f}s)")

    eval_selector("geometric", None)

    sim = view_similarity_from_scene(
        scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
        model, variables, cfg.pairnet.patch_size,
    )
    P(f"similarity matrix: mean {np.mean(sim):.3f} "
      f"diag {np.mean(np.diag(sim)):.3f}")
    learned = functools.partial(
        select_pairs_learned,
        n_pairs=cfg.fusion.n_view_pairs,
        image_hw=scene.images.shape[1:3],
        extent_mm=cfg.voxel.cube_extent_mm,
        similarity=np.asarray(sim),
    )
    eval_selector("learned", learned)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500)
