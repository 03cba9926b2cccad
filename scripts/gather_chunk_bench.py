"""On-chip A/B of the r4 per-chunk gather sub-windows (warp_gather).

Compares, at the production operating points, the warp-gather kernel
with (a) full-crop interpolation (r3 behavior), (b) chunk sub-windows at
several PC values (smaller PC = thinner slabs = smaller windows, at more
grid steps), and for 64^3 (c) sub-cube tiling (the r3 large-D path) vs
one chunk-windowed dispatch.  Writes results/gather_chunk_r04.json.

Run on a quiet chip (no concurrent TPU jobs).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def time_ms(fn, n=10):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1000.0


def main():
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.ops.pallas.warp_gather import (
        auto_chunk_hw, auto_crop_hw, gather_tile_d, warp_gather_tiled,
    )

    P(f"devices: {jax.devices()}")
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    hw = scene.images.shape[1:3]
    rng = np.random.RandomState(0)
    rec = {"rows": []}

    for D, s, B in [(32, 0.8, 160), (64, 0.8, 120)]:
        pts = scene.surface_points(B, seed=1)
        origins = jnp.asarray(
            (pts - D * s / 2).astype(np.float32), jnp.float32
        )
        views = jnp.asarray(
            rng.randint(0, scene.Ps.shape[0], B).astype(np.int32)
        )

        # r3 baseline: crop sized for the gather tile, full-crop kernel
        td = gather_tile_d(D)
        crop_t = auto_crop_hw(
            scene.Ps, scene.bbox_min, scene.bbox_max, td, s, hw
        )

        for PC in (1024, 8192):

            @jax.jit
            def base(PC=PC):
                return warp_gather_tiled(
                    images, Ps, views, origins, D=D, s=s,
                    CH=crop_t[0], CW=crop_t[1], PC=PC,
                )

            try:
                ms = time_ms(base)
            except Exception as e:
                P(f"  item-mode PC={PC} failed: {e!r}"[:200])
                continue
            row = {
                "D": D, "B": B, "variant": "r3_full_crop_tiled",
                "tile_d": td, "PC": PC, "crop_hw": list(crop_t),
                "ms": round(ms, 2),
                "items_per_s": round(B / ms * 1000, 1),
            }
            P(str(row))
            rec["rows"].append(row)

        # fused 1D-grid kernel: one grid step per item (tiled at D>32)
        for PC in (512, 1024, 2048):

            @jax.jit
            def fused(PC=PC):
                return warp_gather_tiled(
                    images, Ps, views, origins, D=D, s=s,
                    CH=crop_t[0], CW=crop_t[1], PC=PC, fused=True,
                )

            try:
                ms = time_ms(fused)
            except Exception as e:
                P(f"  fused PC={PC} failed: {e!r}"[:200])
                continue
            row = {
                "D": D, "B": B, "variant": "r4_fused_1d",
                "tile_d": td, "PC": PC, "crop_hw": list(crop_t),
                "ms": round(ms, 2),
                "items_per_s": round(B / ms * 1000, 1),
            }
            P(str(row))
            rec["rows"].append(row)

        if D > 32:
            # tiled + chunk windows: windows sized for the TILE's slabs
            chw_t = auto_chunk_hw(
                scene.Ps, scene.bbox_min, scene.bbox_max, td, s, hw,
                PC=8192,
            )

            @jax.jit
            def tiled_chunk():
                return warp_gather_tiled(
                    images, Ps, views, origins, D=D, s=s,
                    CH=crop_t[0], CW=crop_t[1], PC=8192, chunk_hw=chw_t,
                )

            try:
                ms = time_ms(tiled_chunk)
                row = {
                    "D": D, "B": B, "variant": "r4_tiled_chunk_windows",
                    "tile_d": td, "PC": 8192, "crop_hw": list(crop_t),
                    "chunk_hw": list(chw_t), "ms": round(ms, 2),
                    "items_per_s": round(B / ms * 1000, 1),
                }
                P(str(row))
                rec["rows"].append(row)
            except Exception as e:
                P(f"  tiled+chunk failed: {e!r}"[:200])

        # chunk windows: full-cube crop, one dispatch, several PC
        # (measured a loser at D>32 — slab windows approach the cube
        # footprint while paying per-chunk DMA; tiling handles large D)
        crop_f = auto_crop_hw(
            scene.Ps, scene.bbox_min, scene.bbox_max, D, s, hw
        )
        for PC in (8192, 4096) if D <= 32 else ():
            if D**3 % PC:
                continue
            chw = auto_chunk_hw(
                scene.Ps, scene.bbox_min, scene.bbox_max, D, s, hw, PC=PC
            )

            @jax.jit
            def chunked(PC=PC, chw=chw):
                return warp_gather_tiled(
                    images, Ps, views, origins, D=D, s=s,
                    CH=crop_f[0], CW=crop_f[1], PC=PC,
                    chunk_hw=chw, tile_d=D,
                )

            try:
                ms = time_ms(chunked)
            except Exception as e:
                P(f"  PC={PC} failed: {e!r}")
                continue
            row = {
                "D": D, "B": B, "variant": "r4_chunk_windows",
                "PC": PC, "crop_hw": list(crop_f), "chunk_hw": list(chw),
                "ms": round(ms, 2),
                "items_per_s": round(B / ms * 1000, 1),
            }
            P(str(row))
            rec["rows"].append(row)

    path = os.path.join(REPO, "results", "gather_chunk_r04.json")
    with open(path, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    P(f"wrote {path}")


if __name__ == "__main__":
    main()
