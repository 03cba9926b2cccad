"""One-process TPU profiling sweep: model variants, CVC gather, ray pooling.

Run on the real chip; prints incremental results (flush) so progress is
observable.  Uses host-sync timing (sum -> float) — block_until_ready alone
under-reports on the axon remote platform.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from surfacenet_tpu.config import Config, ModelConfig
from surfacenet_tpu.data.synthetic import make_sphere_scene
from surfacenet_tpu.models.surfacenet import init_surfacenet
from surfacenet_tpu.ops.cvc import build_cvc_batch
from surfacenet_tpu.ops.ray_pooling import ray_pool_batch

P = functools.partial(print, flush=True)


def timeit(fn, *args, n=3, label=""):
    t0 = time.perf_counter()
    float(fn(*args))  # includes compile
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / n
    P(f"  {label}: first={t_first:.1f}s steady={dt*1000:.1f}ms")
    return dt


def conv_stack_flops(cfg: ModelConfig, D: int) -> float:
    total = 0.0
    res = D
    cin = cfg.in_channels
    for ch, nc, dil, pool in zip(
        cfg.block_channels, cfg.convs_per_block, cfg.dilations,
        cfg.pool_after_block,
    ):
        for i in range(nc):
            total += 2 * 27 * cin * ch * res**3
            cin = ch
        if pool:
            res //= 2
    return total


def main():
    P(f"devices: {jax.devices()}")
    D, B, NP = 32, 32, 5
    BV = B * NP

    # ---- model variants
    for mode in ["resize", "deconv"]:
        cfg = dataclasses.replace(ModelConfig(), upsample_mode=mode)
        model, variables = init_surfacenet(cfg, jax.random.PRNGKey(0), D=D)
        fwd = jax.jit(
            lambda v, x: jnp.sum(model.apply(v, x, train=False))
        )
        x = jax.random.normal(jax.random.PRNGKey(1), (BV, D, D, D, 6))
        float(jnp.sum(x))
        dt = timeit(fwd, variables, x, label=f"model/{mode} B={BV}")
        fl = conv_stack_flops(cfg, D) * BV
        P(
            f"    conv-stack {fl/1e9:.0f} GF -> {fl/dt/1e12:.1f} TF/s "
            f"({fl/dt/1e12/197*100:.0f}% of v5e bf16 peak, convs only)"
        )

    # ---- CVC gather at DTU-like image size
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    pts = scene.surface_points(BV, seed=1)
    s = 0.8
    origins = jnp.asarray((pts - D * s / 2).astype(np.float32))
    rng = np.random.default_rng(0)
    pair_idx = jnp.asarray(
        np.stack(
            [rng.integers(0, 8, BV), (rng.integers(0, 8, BV) + 1) % 8], -1
        ).astype(np.int32)
    )
    cvcf = jax.jit(
        lambda im, p, pi, o: jnp.sum(
            build_cvc_batch(im, p, pi, o, D, s)[0]
        )
    )
    timeit(cvcf, images, Ps, pair_idx, origins, label=f"cvc_gather B={BV}")

    # ---- ray pooling
    probs = jax.random.uniform(jax.random.PRNGKey(2), (B, D, D, D))
    rpf = jax.jit(
        lambda pr, o: jnp.sum(
            ray_pool_batch(pr, o, s, Ps[:10], 0.5, 0.8)[0]
        )
    )
    timeit(rpf, probs, origins[:B], label=f"ray_pool B={B} V=10")

    # ---- end-to-end current bench step for reference
    from surfacenet_tpu.ops.view_pairs import select_pairs_geometric
    from surfacenet_tpu.pipeline.sweep import cube_batch_step

    cfg = Config()
    model, variables = init_surfacenet(cfg.model, jax.random.PRNGKey(0), D=D)

    def predict(x, origins):
        return model.apply(variables, x, train=False)

    pair_idx2, pair_w2 = select_pairs_geometric(
        scene.Ps, np.asarray(origins[:B]), NP, scene.images.shape[1:3],
        extent_mm=D * s,
    )
    step = lambda: cube_batch_step(
        images, Ps, origins[:B], jnp.asarray(pair_idx2),
        jnp.asarray(pair_w2),
        D=D, s=s, n_pairs=NP, tau=0.7, gamma=0.8, adaptive=False,
        center_colors=True, predict=predict,
    )
    f = jax.jit(lambda: sum(jnp.sum(o.astype(jnp.float32)) for o in step()))
    dt = timeit(lambda: f(), label=f"cube_batch_step B={B}")
    P(f"  => {B/dt:.1f} cubes/s/chip end-to-end")


if __name__ == "__main__":
    main()
