"""Training-step throughput: XLA gather vs Pallas warp gather (1 chip).

VERDICT r1 item 9: route `train_step` through the Pallas gather and measure
steps/s before/after.  Uses the full-size model (SURVEY.md C5 widths), the
shipped golden-scene geometry, and the fused gather+fwd+bwd step from
`train/train_surface.py`.

Run:  PYTHONPATH=/root/.axon_site:/root/repo python \
        scripts/train_step_bench.py > /tmp/train_step_bench.log 2>&1
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from surfacenet_tpu.config import Config, TrainConfig, VoxelConfig
from surfacenet_tpu.data.synthetic import make_sphere_scene
from surfacenet_tpu.train.train_surface import create_train_state, train_step

P = functools.partial(print, flush=True)


def bench(use_pallas: bool, crop_hw) -> float:
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=0.5, cube_size=32, overlap=8),
        train=TrainConfig(batch_size=16),
    )
    D = cfg.voxel.cube_size
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0))

    B = cfg.train.batch_size
    rng = np.random.default_rng(0)
    pts = scene.surface_points(B, seed=3)
    origins = jnp.asarray(pts - D * cfg.voxel.voxel_size_mm / 2, jnp.float32)
    pair_idx = jnp.asarray(
        rng.integers(0, len(scene.Ps), size=(B, 2)), jnp.int32
    )
    labels = jnp.asarray(rng.random((B, D, D, D)) < 0.05, jnp.float32)

    step = functools.partial(
        train_step,
        D=D, s=cfg.voxel.voxel_size_mm,
        balanced=True, center_colors=True,
        use_pallas=use_pallas, crop_hw=crop_hw,
    )
    # warmup / compile.  NB: on the axon relay platform block_until_ready
    # under-reports; a host readback (float(...)) is the only reliable sync.
    state2, loss = step(state, images, Ps, origins, pair_idx, labels)
    float(loss)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = state
        for _ in range(10):
            s, loss = step(s, images, Ps, origins, pair_idx, labels)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    sps = 10 / best
    P(
        f"use_pallas={use_pallas}: {best / 10 * 1e3:.1f} ms/step, "
        f"{sps:.2f} steps/s (batch {B}, loss {float(loss):.4f})"
    )
    return sps


def main():
    on_tpu = jax.default_backend() != "cpu"
    P(f"backend {jax.default_backend()}")
    if not on_tpu:
        P("CPU backend: Pallas path unavailable; XLA-only timing")
        bench(False, (192, 256))
        return
    from surfacenet_tpu.ops.pallas.warp_gather import auto_crop_hw

    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    crop_hw = auto_crop_hw(
        scene.Ps, scene.bbox_min, scene.bbox_max, 32, 0.5,
        scene.images.shape[1:3],
    )
    P(f"crop_hw {crop_hw}")
    xla = bench(False, crop_hw)
    pal = bench(True, crop_hw)
    P(f"speedup {pal / xla:.2f}x")


if __name__ == "__main__":
    main()
