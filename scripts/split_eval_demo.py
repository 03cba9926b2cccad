"""Eval-split demo (BASELINE config 3 protocol): train ONE SurfaceNet on
both golden scenes (multi-scene union pool — the reference trains across
the DTU training scans, SURVEY.md C11), export the scenes as scan dirs,
then drive `cli reconstruct-all --gt-dir` end-to-end for a per-scan +
split-mean report.

Run on TPU:  python scripts/split_eval_demo.py [n_steps]
Artifacts: weights/golden_multi_<steps>, results/split_report_r02.json.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import shutil
import subprocess
import time

import numpy as np
import jax

from surfacenet_tpu.config import (
    Config, FusionConfig, ModelConfig, SweepConfig, TrainConfig, VoxelConfig,
)
from surfacenet_tpu.data.dtu import write_scan
from surfacenet_tpu.data.synthetic import make_sphere_scene, make_tori_scene
from surfacenet_tpu.train.train_surface import train_surfacenet
from surfacenet_tpu.utils.ply import write_ply

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(n_steps: int = 30000):
    on_tpu = jax.default_backend() != "cpu"
    s_mm = float(os.environ.get("DEMO_VOXEL_MM", "0.5"))
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=s_mm, cube_size=32, overlap=8),
        model=ModelConfig(),
        fusion=FusionConfig(
            n_view_pairs=4, tau=0.8, gamma=0.7,
            ray_pool_mode="affine_pallas" if on_tpu else "affine",
            n_pool_views=6,
        ),
        sweep=SweepConfig(cube_batch=32, use_pallas_gather=on_tpu),
        train=TrainConfig(
            batch_size=16, lr=3e-3, seed=0, n_steps=n_steps,
            lr_decay="cosine",
        ),
    )
    scenes = {
        "scan_sphere": make_sphere_scene(
            n_views=12, hw=(600, 800), radius=30.0, focal=200.0
        ),
        "scan_tori": make_tori_scene(n_views=12, hw=(600, 800), focal=800.0),
    }

    t0 = time.perf_counter()
    state, log = train_surfacenet(
        list(scenes.values()), cfg, checkpoint_dir="/tmp/sn_multi_ckpt",
    )
    P(f"multi-scene train {n_steps} steps in {time.perf_counter()-t0:.0f}s; "
      f"loss {log.losses[0]:.4f} -> {log.losses[-1]:.4f}")

    # ship params-only weights (the reference's published-weights role)
    import orbax.checkpoint as ocp

    wdir = os.path.join(REPO, "weights", f"golden_multi_{n_steps // 1000}k")
    if os.path.isdir(wdir):
        shutil.rmtree(wdir)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(wdir),
        {"params": state.params, "batch_stats": state.batch_stats},
        force=True,
    )
    ckptr.wait_until_finished()
    P(f"saved {wdir}")

    # export the split: scan dirs + GT clouds
    root = "/tmp/split"
    shutil.rmtree(root, ignore_errors=True)
    gt_dir = os.path.join(root, "gt")
    os.makedirs(gt_dir)
    for name, sc in scenes.items():
        write_scan(os.path.join(root, name), sc.images, sc.Ps,
                   sc.bbox_min, sc.bbox_max)
        write_ply(os.path.join(gt_dir, f"{name}.ply"),
                  sc.surface_points(8000))

    # drive the CLI end-to-end (the user surface for BASELINE config 3)
    out_dir = os.path.join(root, "out")
    cmd = [
        sys.executable, "-m", "surfacenet_tpu.cli", "reconstruct-all",
        "--scans", os.path.join(root, "scan_sphere"),
        os.path.join(root, "scan_tori"),
        "--out-dir", out_dir, "--gt-dir", gt_dir,
        "--checkpoint", wdir,
        "--set", f"voxel.voxel_size_mm={s_mm}",
        "--set", "voxel.cube_size=32", "--set", "voxel.overlap=8",
        "--set", "fusion.n_view_pairs=4", "--set", "fusion.tau=0.8",
        "--set", "fusion.gamma=0.7", "--set", "fusion.n_pool_views=6",
        "--set", f'fusion.ray_pool_mode="{cfg.fusion.ray_pool_mode}"',
        "--set", "sweep.cube_batch=32",
        "--set", f"sweep.use_pallas_gather={'true' if on_tpu else 'false'}",
    ]
    P("+ " + " ".join(cmd))
    subprocess.run(cmd, check=True, cwd=REPO)

    with open(os.path.join(out_dir, "report.json")) as f:
        report = json.load(f)
    report["_provenance"] = {
        "weights": os.path.relpath(wdir, REPO),
        "train_steps": n_steps,
        "trained_on": "union pool over both scenes (one shared model)",
        "per_scene_reference": "quality_r02.json best (per-scene weights): "
                               "sphere 0.606mm / tori 0.564mm overall",
    }
    out = os.path.join(REPO, "results", "split_report_r02.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    P(f"wrote {out}: " + json.dumps(report.get("_mean", {})))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30000)
