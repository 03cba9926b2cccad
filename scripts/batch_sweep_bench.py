"""Throughput vs cube-batch size for the fused sweep step (1 chip).

Finds the knee of the batch-size curve for `cube_batch_step` at 32^3 —
the config default `sweep.cube_batch` should sit at the measured knee.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python \
        scripts/batch_sweep_bench.py > /tmp/batch_sweep.log 2>&1
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from surfacenet_tpu.config import Config, FusionConfig, VoxelConfig
from surfacenet_tpu.data.synthetic import make_sphere_scene
from surfacenet_tpu.models.surfacenet import init_surfacenet, make_predictor
from surfacenet_tpu.ops.view_pairs import select_pairs_geometric
from surfacenet_tpu.pipeline.sweep import cube_batch_step


def main():
    on_tpu = jax.default_backend() != "cpu"
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=0.8, cube_size=32, overlap=8),
        fusion=FusionConfig(
            n_view_pairs=5, tau=0.7, gamma=0.8,
            ray_pool_mode="affine_pallas" if on_tpu else "affine",
            n_pool_views=6,
        ),
    )
    D = cfg.voxel.cube_size
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    model, variables = init_surfacenet(cfg.model, jax.random.PRNGKey(0), D=D)
    predict = make_predictor(model, variables, cfg.model)
    if on_tpu:
        from surfacenet_tpu.ops.pallas.warp_gather import auto_crop_hw

        crop_hw = auto_crop_hw(
            scene.Ps, scene.bbox_min, scene.bbox_max, D,
            cfg.voxel.voxel_size_mm, scene.images.shape[1:3],
        )
    else:
        crop_hw = (192, 256)

    for batch in (16, 32, 64, 96):
        pts = scene.surface_points(batch, seed=1)
        origins = (pts - D * cfg.voxel.voxel_size_mm / 2).astype(np.float32)
        pair_idx, pair_w = select_pairs_geometric(
            scene.Ps, origins, cfg.fusion.n_view_pairs,
            scene.images.shape[1:3], extent_mm=cfg.voxel.cube_extent_mm,
        )
        kw = dict(
            D=D, s=cfg.voxel.voxel_size_mm, n_pairs=cfg.fusion.n_view_pairs,
            tau=cfg.fusion.tau, gamma=cfg.fusion.gamma, adaptive=False,
            center_colors=True, predict=predict, use_pallas=on_tpu,
            n_pool_views=cfg.fusion.n_pool_views,
            ray_pool_mode=cfg.fusion.ray_pool_mode, crop_hw=crop_hw,
        )
        args = (
            images, Ps, jnp.asarray(origins), jnp.asarray(pair_idx),
            jnp.asarray(pair_w),
        )
        out = cube_batch_step(*args, **kw)
        float(jnp.sum(out[1]))
        n_iters = 10
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sums = [
                jnp.sum(cube_batch_step(*args, **kw)[1])
                for _ in range(n_iters)
            ]
            float(sum(sums))
            best = min(best, time.perf_counter() - t0)
        print(
            f"batch {batch:3d}: {best / n_iters * 1e3:7.1f} ms/step  "
            f"{batch * n_iters / best:7.1f} cubes/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
