"""Regenerate results/ artifacts: reconstruct a golden scene with the
shipped weights at its best operating point, write .ply + orthographic
renders + metrics line.

Usage: python scripts/make_artifacts.py [sphere|tori] [weights_dir]
Env: DEMO_VOXEL_MM (0.5), DEMO_FOCAL (sphere 200 / tori 800 defaults
match how the shipped weights were trained), TAU, GAMMA.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax

from surfacenet_tpu.config import (
    Config, FusionConfig, ModelConfig, SweepConfig, VoxelConfig,
)
from surfacenet_tpu.data.synthetic import make_sphere_scene, make_tori_scene
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_surface import load_pretrained
from surfacenet_tpu.utils.metrics import accuracy_completeness
from surfacenet_tpu.utils.ply import write_ply
from surfacenet_tpu.utils.viz import splat_orthographic

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(which: str, weights: str):
    on_tpu = jax.default_backend() != "cpu"
    s_mm = float(os.environ.get("DEMO_VOXEL_MM", "0.5"))
    tau = float(os.environ.get("TAU", "0.8"))
    gamma = float(os.environ.get("GAMMA", "0.7"))
    hw = tuple(
        int(v) for v in os.environ.get("DEMO_HW", "600x800").split("x")
    )
    cube = int(os.environ.get("DEMO_CUBE", "32"))
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=s_mm, cube_size=cube,
                          overlap=cube // 4),
        model=ModelConfig(),
        fusion=FusionConfig(
            n_view_pairs=4, tau=tau, gamma=gamma,
            ray_pool_mode="affine_pallas" if on_tpu else "affine",
            n_pool_views=6,
        ),
        sweep=SweepConfig(cube_batch=32, use_pallas_gather=on_tpu),
    )
    # defaults match how the shipped weights were trained (600x800 frames)
    if which == "tori":
        focal = float(os.environ.get("DEMO_FOCAL", "800"))
        scene = make_tori_scene(n_views=12, hw=hw, focal=focal)
    else:
        focal = float(os.environ.get("DEMO_FOCAL", "200"))
        scene = make_sphere_scene(n_views=12, hw=hw, radius=30.0,
                                  focal=focal)
    model, variables = load_pretrained(weights, cfg)

    def predictor(x, origins):
        return model.apply(variables, x, train=False)

    t0 = time.perf_counter()
    store, stats = run_sweep(
        scene.images, scene.Ps, scene.bbox_min, scene.bbox_max, cfg,
        predictor,
    )
    pts, probs, colors = store.merge()
    dt = time.perf_counter() - t0
    acc, comp = accuracy_completeness(pts, scene.surface_points(8000))
    P(f"{which}: {len(pts)} pts in {dt:.0f}s "
      f"(tau={tau} gamma={gamma} s={s_mm}mm focal={focal}): "
      f"acc {acc:.3f}mm comp {comp:.3f}mm overall {(acc+comp)/2:.3f}mm")

    out = os.path.join(REPO, "results", f"golden_{which}.ply")
    write_ply(out, pts, colors)
    from PIL import Image

    for axis, name in ((0, "yz"), (1, "xz"), (2, "xy")):
        img = splat_orthographic(pts, colors, axis=axis)
        Image.fromarray(img).save(
            os.path.join(REPO, "results", f"golden_{which}_{name}.png")
        )
    P(f"wrote {out} + renders")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "sphere"
    default_w = os.path.join(
        REPO, "weights",
        "golden_sphere_30k" if which == "sphere" else "golden_tori_30k",
    )
    main(which, sys.argv[2] if len(sys.argv) > 2 else default_w)
