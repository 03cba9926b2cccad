"""On-chip A/B of the warp-gather crop/matmul dtype (SweepConfig.gather_dtype).

The gather's FLOPs are the bilinear hat-matmul (3*2*CH*CW per voxel); v5e
contracts int8 x int8 -> int32 at 2x the bf16 MXU rate, and the sources are
8-bit images, so 7-bit crop/hat quantization stays in the bf16 error class
(tests/test_pallas.py::test_warp_gather_int8_close).  This script measures
whether the 2x matmul rate survives the extra quantize/dequantize VPU work
at production shapes, and the compiled-path error vs the f32 kernel.

Usage: python scripts/gather_dtype_bench.py  (on the TPU)
Writes results/gather_dtype_r03.json.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sync(out):
    return float(sum(jnp.sum(x.astype(jnp.float32))
                     for x in jax.tree_util.tree_leaves(out)))


def timeit(fn, n=10):
    _sync(fn())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn() for _ in range(n)]
        _sync(outs)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.ops.pallas.warp_gather import (
        auto_crop_hw, warp_gather_tiled,
    )

    P(f"devices: {jax.devices()}")
    D, NC, KU = 32, 32, 7  # production: 32 cubes x 7 distinct views
    s = 0.8
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    B = NC * KU
    pts = scene.surface_points(NC, seed=1)
    origins = np.repeat(
        (pts - D * s / 2).astype(np.float32), KU, axis=0
    )
    views = jnp.asarray(np.tile(np.arange(KU), NC), jnp.int32)
    CH, CW = auto_crop_hw(scene.Ps, scene.bbox_min, scene.bbox_max, D, s,
                          scene.images.shape[1:3])
    P(f"B={B} D={D} crop={CH}x{CW}")

    run = {}
    for name, dt in (("float32", jnp.float32), ("bfloat16", jnp.bfloat16),
                     ("int8", jnp.int8)):
        f = jax.jit(lambda im, dt=dt: warp_gather_tiled(
            im, Ps, views, jnp.asarray(origins), D=D, s=s, CH=CH, CW=CW,
            in_dtype=dt,
        ))
        best = timeit(lambda f=f: f(images))
        colors, valid = f(images)
        run[name] = dict(
            ms=round(best * 1000, 3),
            items_per_s=round(B / best, 1),
            colors=np.asarray(colors, np.float32),
            valid=np.asarray(valid),
        )
        P(f"  {name}: {best*1e3:.2f} ms ({B/best:.0f} items/s)")

    ref_c, ref_v = run["float32"]["colors"], run["float32"]["valid"]
    out = {"B": B, "D": D, "crop_hw": [CH, CW], "rows": {}}
    for name, r in run.items():
        m = r["valid"] & ref_v
        err = float(np.abs(r["colors"][m] - ref_c[m]).max()) if m.any() else 0
        out["rows"][name] = dict(
            ms=r["ms"], items_per_s=r["items_per_s"],
            max_err_vs_f32=round(err, 5),
            valid_agree_pct=round(100.0 * float(
                (r["valid"] == ref_v).mean()), 3),
        )
        P(f"  {name}: max_err={err:.5f} "
          f"valid_agree={out['rows'][name]['valid_agree_pct']}%")

    path = os.path.join(REPO, "results", "gather_dtype_r03.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    P(f"wrote {path}")


if __name__ == "__main__":
    main()
