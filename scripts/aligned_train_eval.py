"""Train + evaluate the MXU-aligned SurfaceNet operating point (r3 item 1).

ROOFLINE.md bounds the paper-width model (32/80/160/300) at a 59.3% MXU
lane ceiling; `ModelConfig.mxu_aligned()` (128/128/256/256, 2 convs/block)
removes that ceiling.  This script proves the lever instead of citing it:

  1. trains the aligned model 30k steps on the golden sphere and tori
     scenes with the exact golden-weights recipe (batch 16, lr 3e-3,
     cosine decay, seed 0, s=0.5mm) and ships params-only weights to
     weights/golden_{sphere,tori}_aligned_30k;
  2. sweeps (tau, gamma) with run_sweep and records DTU-style acc/comp
     next to the paper-width rows -> results/quality_r03_aligned.json.

Forward-MFU for the aligned model is measured separately by bench.py
(model_fwd_mfu_pct_aligned).

Also used for the round-3 FAST lane-aligned candidates (thin full-res
block-1, aligned deep blocks — scripts/fast_model_bench.py): pass a third
arg naming the model; weights ship to weights/golden_{scene}_{model}_30k
and the grid to results/quality_r03_{model}.json.

Usage: python scripts/aligned_train_eval.py [n_steps] [sphere|tori|both]
           [aligned|fastA|fastE|fastF|fast64]

NOTE on fast64: this recipe trains AND evaluates at cube_size=32 (the
repo's train-32 convention), so the grid it writes qualifies fast64's
*learning capacity* at 32^3 only.  The preset's claim is the 64^3 apply
point — that qualification (64^3 apply on the trained weights, DTU
operating point) is run by scripts/op_point_qualify.py (r5), which
writes results/op_point_r05.json.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import json
import shutil
import time

import numpy as np
import jax

from surfacenet_tpu.config import (
    Config, FusionConfig, ModelConfig, SweepConfig, TrainConfig, VoxelConfig,
)
from surfacenet_tpu.data.synthetic import make_sphere_scene, make_tori_scene
from surfacenet_tpu.models.surfacenet import SurfaceNet
from surfacenet_tpu.pipeline.sweep import run_sweep
from surfacenet_tpu.train.train_surface import train_surfacenet
from surfacenet_tpu.utils.metrics import accuracy_completeness

P = functools.partial(print, flush=True)
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


MODELS = {
    "aligned": ModelConfig.mxu_aligned,
    # FLOP-lean lane-aligned candidates (measured forward throughput in
    # results/fast_model_bench_r03.json): one conv at full 32^3 resolution,
    # deep blocks at 128/256 lanes.
    "fastA": lambda: ModelConfig(
        block_channels=(128, 128, 256, 256), convs_per_block=(1, 2, 2, 2)
    ),
    "fastE": lambda: ModelConfig(
        block_channels=(128, 128, 128, 256), convs_per_block=(1, 2, 2, 2)
    ),
    "fastF": lambda: ModelConfig(
        block_channels=(128, 128, 256, 256), convs_per_block=(1, 1, 2, 3)
    ),
    # r4: the 64^3-shaped point — narrow HBM-lean first block, aligned
    # deep blocks (results/fast64_bench_r04_b120.json, fast64_step_r04).
    "fast64": ModelConfig.fast64,
}


def base_config(n_steps: int, on_tpu: bool, model: str = "aligned") -> Config:
    return Config(
        voxel=VoxelConfig(voxel_size_mm=0.5, cube_size=32, overlap=8),
        model=MODELS[model](),
        sweep=SweepConfig(cube_batch=32, use_pallas_gather=on_tpu),
        train=TrainConfig(
            batch_size=16, lr=3e-3, seed=0, n_steps=n_steps,
            lr_decay="cosine",
        ),
    )


def ship_weights(name: str, state) -> str:
    import orbax.checkpoint as ocp

    wdir = os.path.join(REPO, "weights", name)
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
    return wdir


def eval_grid(scene, cfg_base: Config, variables, on_tpu: bool):
    gt = scene.surface_points(8000)
    model = SurfaceNet(cfg_base.model)

    def predictor(x, origins):
        return model.apply(variables, x, train=False)

    rows, best = [], None
    for tau in (0.6, 0.7, 0.8, 0.9):
        for gamma in (0.7, 0.8):
            cfg = Config(
                voxel=cfg_base.voxel, model=cfg_base.model,
                sweep=cfg_base.sweep,
                fusion=FusionConfig(
                    n_view_pairs=4, tau=tau, gamma=gamma,
                    ray_pool_mode="affine_pallas" if on_tpu else "affine",
                    n_pool_views=6,
                ),
            )
            t0 = time.perf_counter()
            store, stats = run_sweep(
                scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
                cfg, predictor,
            )
            pts, probs, colors = store.merge()
            dt = time.perf_counter() - t0
            if not len(pts):
                P(f"  tau={tau} gamma={gamma}: empty ({dt:.0f}s)")
                continue
            acc, comp = accuracy_completeness(pts, gt)
            overall = (acc + comp) / 2
            row = dict(tau=tau, gamma=gamma, acc_mm=round(float(acc), 4),
                       comp_mm=round(float(comp), 4),
                       overall_mm=round(float(overall), 4), n_pts=len(pts))
            rows.append(row)
            P(f"  tau={tau} gamma={gamma}: acc {acc:.3f} comp {comp:.3f} "
              f"overall {overall:.3f} ({len(pts)} pts, {dt:.0f}s)")
            if best is None or overall < best["overall_mm"]:
                best = row
    return rows, best


def main(n_steps: int = 30000, which: str = "both", model: str = "aligned"):
    on_tpu = jax.default_backend() != "cpu"
    P(f"backend={jax.default_backend()} n_steps={n_steps} model={model}")
    scenes = {}
    # Focals match the paper-width rows in results/quality_r02.json
    # (sphere 200 wide framing, tori 800) so the aligned-vs-paper-width
    # comparison is same-scene, same-eval.
    if which in ("sphere", "both"):
        scenes["sphere"] = make_sphere_scene(
            n_views=12, hw=(600, 800), radius=30.0, focal=200.0
        )
    if which in ("tori", "both"):
        scenes["tori"] = make_tori_scene(n_views=12, hw=(600, 800),
                                         focal=800.0)

    mc = MODELS[model]()
    tag = "r04" if model == "fast64" else "r03"
    path = os.path.join(REPO, "results", f"quality_{tag}_{model}.json")
    out = {"model": f"{model}: ch={mc.block_channels} "
                    f"convs={mc.convs_per_block}",
           "recipe": f"{n_steps} steps, batch 16, lr 3e-3 cosine, s=0.5mm",
           "scenes": {}}
    if os.path.exists(path):  # partial runs merge into the existing grid
        with open(path) as f:
            prev = json.load(f)
        out["scenes"].update(prev.get("scenes", {}))
    for name, scene in scenes.items():
        cfg = base_config(n_steps, on_tpu, model)
        t0 = time.perf_counter()
        state, log = train_surfacenet(
            scene, cfg, checkpoint_dir=f"/tmp/{model}_{name}_ckpt",
        )
        dt = time.perf_counter() - t0
        P(f"[{name}] trained {n_steps} steps in {dt:.0f}s "
          f"({n_steps/dt:.1f} steps/s); loss {log.losses[0]:.4f} -> "
          f"{log.losses[-1]:.4f}")
        wdir = ship_weights(f"golden_{name}_{model}_{n_steps//1000}k", state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        rows, best = eval_grid(scene, cfg, variables, on_tpu)
        out["scenes"][name] = {
            "train_seconds": round(dt, 1),
            "steps_per_s": round(n_steps / dt, 2),
            "final_loss": round(float(log.losses[-1]), 4),
            "weights": os.path.relpath(wdir, REPO),
            "grid": rows, "best": best,
        }
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        P(f"[{name}] best: {best}")
    P("done")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30000,
         sys.argv[2] if len(sys.argv) > 2 else "both",
         sys.argv[3] if len(sys.argv) > 3 else "aligned")
