"""Full production 64^3 step (gather+fwd+fuse+pool+compact): fast vs fast64.

Mirrors bench.py's 64^3 operating point (B=24 cubes, 5 pairs, r4 gather
policy: tile_d sub-cubes + slab chunk windows) and swaps only the model.
results/fast64_bench_r04_b120.json showed fast64's isolated forward at
1.42x fast's; this measures how much of that survives the full step.

Run on the TPU chip: python scripts/fast64_step_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from surfacenet_tpu.config import Config, FusionConfig, ModelConfig, VoxelConfig
from surfacenet_tpu.data.synthetic import make_sphere_scene
from surfacenet_tpu.models.surfacenet import init_surfacenet, make_predictor
from surfacenet_tpu.ops.view_pairs import dedup_view_slots, select_pairs_geometric
from surfacenet_tpu.ops.pallas.warp_gather import (
    auto_chunk_hw, auto_crop_hw, gather_tile_d,
)
from surfacenet_tpu.pipeline.sweep import cube_batch_step


def time_pipelined(fn, n_iters=10, n_windows=3):
    float(fn())
    best = float("inf")
    for _ in range(n_windows):
        t0 = time.perf_counter()
        sums = [fn() for _ in range(n_iters)]
        float(sum(sums))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=0.8, cube_size=32, overlap=8),
        fusion=FusionConfig(
            n_view_pairs=5, tau=0.7, gamma=0.8,
            ray_pool_mode="affine_pallas", n_pool_views=6,
        ),
    )
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    hw = scene.images.shape[1:3]

    D64, B64, n_iters = 64, 24, 10
    pts64 = scene.surface_points(B64, seed=2)
    origins64 = (pts64 - D64 * cfg.voxel.voxel_size_mm / 2).astype(np.float32)
    pair_idx64, pair_w64 = select_pairs_geometric(
        scene.Ps, origins64, cfg.fusion.n_view_pairs,
        hw, extent_mm=D64 * cfg.voxel.voxel_size_mm,
    )
    td64 = gather_tile_d(D64)
    crop_hw = auto_crop_hw(
        scene.Ps, scene.bbox_min, scene.bbox_max, td64,
        cfg.voxel.voxel_size_mm, hw,
    )
    chunk_hw = auto_chunk_hw(
        scene.Ps, scene.bbox_min, scene.bbox_max, td64,
        cfg.voxel.voxel_size_mm, hw, PC=min(td64**3, 8192),
    )
    uniq64, slot64 = dedup_view_slots(pair_idx64)
    args64 = (
        images, Ps, jnp.asarray(origins64), jnp.asarray(pair_idx64),
        jnp.asarray(pair_w64), None,
        jnp.asarray(uniq64), jnp.asarray(slot64),
    )
    out = {}
    for name, mk in (("fast", ModelConfig.fast), ("fast64", ModelConfig.fast64)):
        mcfg = mk()
        mmodel, mvars = init_surfacenet(mcfg, jax.random.PRNGKey(0), D=D64)
        mpredict = make_predictor(mmodel, mvars, mcfg)
        kw = dict(
            D=D64, s=cfg.voxel.voxel_size_mm, n_pairs=cfg.fusion.n_view_pairs,
            tau=cfg.fusion.tau, gamma=cfg.fusion.gamma, adaptive=False,
            center_colors=True, predict=mpredict, use_pallas=True,
            n_pool_views=cfg.fusion.n_pool_views,
            ray_pool_mode="affine_pallas",
            crop_hw=tuple(int(v) for v in crop_hw),
            chunk_hw=tuple(int(v) for v in chunk_hw),
            compact_output=True, pool_window=2,
        )
        best = time_pipelined(
            lambda: jnp.sum(cube_batch_step(*args64, **kw)[1]), n_iters
        )
        out[f"cubes_per_s_64_{name}"] = round(B64 * n_iters / best, 2)
        print(name, out[f"cubes_per_s_64_{name}"], flush=True)
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "results/fast64_step_r04.json"), "w"
    ) as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
