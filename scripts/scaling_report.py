"""Scaling report over mesh sizes (BASELINE target: >=80% weak-scaling
efficiency at N>=2 hosts on real multi-chip slices).

Modes:
  * weak (default, the BASELINE metric): scene volume grows with the
    device count (bbox extended along x, prefilter off so work ~ volume);
    efficiency(n) = throughput(n) / (n * throughput(1)).
  * strong: fixed scene; efficiency(n) = T(1) / (n * T(n)).

On the CPU-emulated mesh the virtual devices SHARE the same physical
cores, so throughput numbers are correctness/shape-only — the emulated run
validates that the sharded path executes at every mesh size; real
efficiency needs a multi-chip slice (none is attached to this
environment; the driver's multichip dry run compiles the same program).
The JSON artifact records that caveat explicitly.

CPU emulation:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/scaling_report.py --out SCALING_r02.json
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import functools
import json
import time

import numpy as np

P = functools.partial(print, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["weak", "strong"], default="weak")
    ap.add_argument("--out", default=None, help="write JSON artifact here")
    ap.add_argument("--sizes", type=int, nargs="*", default=None)
    args = ap.parse_args()

    import jax

    from surfacenet_tpu.config import (
        Config, FusionConfig, SweepConfig, VoxelConfig,
    )
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.parallel.mesh import make_mesh
    from surfacenet_tpu.parallel.sweep_sharded import run_sweep_sharded
    from surfacenet_tpu.pipeline.sweep import photoconsistency_predictor
    from surfacenet_tpu.utils.observability import scaling_efficiency

    n_dev = len(jax.devices())
    platform = jax.devices()[0].platform
    P(f"devices: {n_dev} x {platform}")

    scene = make_sphere_scene(n_views=8, hw=(240, 320), radius=30.0)
    base_min = np.asarray(scene.bbox_min, np.float64)
    base_max = np.asarray(scene.bbox_max, np.float64)
    base_extent = base_max - base_min

    results = {}
    dev_results = {}
    cubes_done = {}
    sizes = args.sizes or [n for n in (1, 2, 4, 8) if n <= n_dev]
    for n in sizes:
        cfg = Config(
            voxel=VoxelConfig(voxel_size_mm=1.0, cube_size=16, overlap=4),
            fusion=FusionConfig(
                n_view_pairs=3, tau=0.3, gamma=0.6,
                ray_pool_mode="affine",
            ),
            sweep=SweepConfig(
                cube_batch=8, prefilter=(args.mode == "strong")
            ),
        )
        bbox_max = base_max.copy()
        if args.mode == "weak":
            # scene volume ~ n: extend along x; prefilter is off so every
            # cube does the full gather+model work regardless of content.
            bbox_max[0] = base_min[0] + base_extent[0] * n
        # block axis shards the scene; with 1 device it degenerates to DP.
        n_block = min(n, 2) if n > 1 else 1
        mesh = make_mesh(n_block=n_block, devices=jax.devices()[:n])
        # warm-up (compile) round
        run_sweep_sharded(
            scene.images, scene.Ps, base_min, bbox_max,
            cfg, photoconsistency_predictor, mesh=mesh,
        )
        store, stats = run_sweep_sharded(
            scene.images, scene.Ps, base_min, bbox_max,
            cfg, photoconsistency_predictor, mesh=mesh,
        )
        results[n] = stats.n_cubes_after_prefilter / stats.wall_s
        cubes_done[n] = stats.n_cubes_after_prefilter
        # device-time attribution pass: sequential rounds, quiesced mesh,
        # dispatch->ready seconds only (separates host-side contention
        # from the device program's scaling; VERDICT-r2 weak #3)
        _, dstats = run_sweep_sharded(
            scene.images, scene.Ps, base_min, bbox_max,
            cfg, photoconsistency_predictor, mesh=mesh,
            measure_device_time=True,
        )
        dev_results[n] = (
            dstats.n_cubes_after_prefilter / dstats.device_s
            if dstats.device_s > 0 else 0.0
        )
        P(f"n={n}: {results[n]:.1f} cubes/s wall "
          f"({stats.n_cubes_after_prefilter} cubes, {stats.wall_s:.2f}s); "
          f"{dev_results[n]:.1f} cubes/s device "
          f"({dstats.device_s:.2f}s device)")

    if args.mode == "weak":
        base_n = min(results)
        eff = {
            n: results[n] / (results[base_n] * n / base_n) for n in results
        }
        dev_eff = {
            n: dev_results[n] / (dev_results[base_n] * n / base_n)
            for n in dev_results if dev_results[base_n] > 0
        }
    else:
        eff = scaling_efficiency(results)
        dev_eff = scaling_efficiency(dev_results)
    caveat = (
        "correctness/shape only — emulated CPU mesh shares physical "
        "cores, so efficiency numbers do not reflect chip scaling"
        if platform == "cpu"
        else "real chips"
    )
    rec = {
        "mode": args.mode,
        "platform": platform,
        "n_devices_available": n_dev,
        "cubes_per_s": {str(k): round(v, 2) for k, v in results.items()},
        "device_cubes_per_s": {
            str(k): round(v, 2) for k, v in dev_results.items()
        },
        "cubes_processed": {str(k): int(v) for k, v in cubes_done.items()},
        f"{args.mode}_scaling_efficiency": {
            str(k): round(v, 3) for k, v in eff.items()
        },
        f"{args.mode}_scaling_efficiency_device": {
            str(k): round(v, 3) for k, v in dev_eff.items()
        },
        "device_time_caveat": (
            "device_cubes_per_s times dispatch->block_until_ready on a "
            "quiesced mesh (sequential rounds): excludes host harvest/"
            "assembly, still includes H2D transfer; on an emulated CPU "
            "mesh the virtual devices share cores, so even device time "
            "reflects contention, only less of it"
        ),
        "caveat": caveat,
    }
    P(json.dumps(rec))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rec, f, indent=2)
        P(f"wrote {args.out}")


if __name__ == "__main__":
    main()
