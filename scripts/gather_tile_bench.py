"""Micro-bench: warp-gather tile-size variants + pool/compact changes.

Times, on the real chip, (a) the warp gather at D=32 as one 32-tile vs
eight 16-tiles (crop area 128x256 vs 80x128 -> 3.2x fewer matmul FLOPs),
(b) the affine-Pallas pool with the per-item axis skip, (c) compact
top_k vs approx_max_k.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

P = functools.partial(print, flush=True)


def _sync(out):
    # scalar readback: block_until_ready under-reports on the axon remote
    # platform (see bench.py)
    leaves = jax.tree_util.tree_leaves(out)
    return float(sum(jnp.sum(x.astype(jnp.float32)) for x in leaves))


def timeit(fn, *args, n=10, label=""):
    _sync(fn(*args))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(n)]
        _sync(outs)
        best = min(best, (time.perf_counter() - t0) / n)
    P(f"  {label}: {best * 1000:.2f} ms")
    return best


def main():
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.ops.pallas.warp_gather import (
        auto_crop_hw, warp_gather_tiled,
    )
    from surfacenet_tpu.ops.pallas.affine_pool import (
        ray_max_mask_affine_pallas,
    )

    P(f"devices: {jax.devices()}")
    D, NC, Ku = 32, 32, 7
    s = 0.8
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    B = NC * Ku
    pts = scene.surface_points(B, seed=1)
    origins = jnp.asarray(
        (pts - D * s / 2).astype(np.float32), jnp.float32
    )
    views = jnp.asarray(np.random.RandomState(0).randint(0, 8, B), jnp.int32)

    # --- (a) gather tiles
    for td in (32, 16):
        ch, cw = auto_crop_hw(
            scene.Ps, scene.bbox_min, scene.bbox_max, td, s, (600, 800)
        )
        fn = jax.jit(
            functools.partial(
                warp_gather_tiled, D=D, s=s, CH=ch, CW=cw, tile_d=td,
            )
        )
        timeit(fn, images, Ps, views, origins,
               label=f"gather B={B} tile={td} crop=({ch},{cw})")

    # --- (b) affine pool (with axis-skip)
    K = 6
    probs = jax.random.uniform(jax.random.PRNGKey(0), (NC * K, D, D, D))
    pool_origins = jnp.repeat(origins[:NC], K, axis=0)
    pool_Ps = Ps[jnp.asarray(np.random.RandomState(1).randint(0, 8, NC * K))]
    pool = jax.jit(
        functools.partial(ray_max_mask_affine_pallas, window=2)
    )
    timeit(pool, probs, pool_origins, s, pool_Ps,
           label=f"affine pool N={NC * K} window=2")

    # --- (c) compact: top_k vs approx_max_k
    score = jax.random.uniform(jax.random.PRNGKey(1), (NC, D * D * D))
    kk = 4096
    t1 = jax.jit(lambda x: jax.lax.top_k(x, kk)[1])
    t2 = jax.jit(
        lambda x: jax.lax.approx_max_k(
            x, kk, recall_target=0.95, aggregate_to_topk=True
        )[1]
    )
    timeit(t1, score, label=f"top_k K={kk}")
    timeit(t2, score, label=f"approx_max_k K={kk}")


if __name__ == "__main__":
    main()
