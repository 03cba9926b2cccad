"""Scaling report over mesh sizes (BASELINE target: >=80% weak-scaling
efficiency at N>=2 hosts on real multi-chip slices).

Fixed total scene => STRONG scaling: efficiency(n) = T(1) / (n * T(n)).
On the CPU-emulated mesh the virtual devices SHARE the same physical cores,
so throughput numbers are not meaningful — the emulated run validates that
the sharded path executes correctly at every mesh size; real efficiency
must be measured on a multi-chip slice (the driver's multichip dry run
compiles the same program).

CPU emulation: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/scaling_report.py
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import time

import numpy as np

P = functools.partial(print, flush=True)


def main():
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
    P(f"devices: {n_dev} x {jax.devices()[0].platform}")

    scene = make_sphere_scene(n_views=8, hw=(240, 320), radius=30.0)
    results = {}
    sizes = [n for n in (1, 2, 4, 8) if n <= n_dev]
    for n in sizes:
        cfg = Config(
            voxel=VoxelConfig(voxel_size_mm=1.0, cube_size=16, overlap=4),
            fusion=FusionConfig(
                n_view_pairs=3, tau=0.3, gamma=0.6,
                ray_pool_mode="affine",
            ),
            sweep=SweepConfig(cube_batch=8),
        )
        mesh = make_mesh(n_block=1, devices=jax.devices()[:n])
        # warm-up (compile) round
        run_sweep_sharded(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            cfg, photoconsistency_predictor, mesh=mesh,
        )
        t0 = time.perf_counter()
        store, stats = run_sweep_sharded(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            cfg, photoconsistency_predictor, mesh=mesh,
        )
        results[n] = stats.n_cubes_after_prefilter / stats.wall_s
        P(f"n={n}: {results[n]:.1f} cubes/s "
          f"({stats.n_cubes_after_prefilter} cubes, {stats.wall_s:.2f}s)")

    eff = scaling_efficiency(results)  # == strong-scaling eff. (fixed work)
    caveat = (
        "emulated-CPU mesh shares physical cores; efficiencies not "
        "meaningful" if jax.devices()[0].platform == "cpu" else "real chips"
    )
    P(json.dumps({
        "cubes_per_s": {str(k): round(v, 2) for k, v in results.items()},
        "strong_scaling_efficiency": {
            str(k): round(v, 3) for k, v in eff.items()
        },
        "caveat": caveat,
    }))


if __name__ == "__main__":
    main()
