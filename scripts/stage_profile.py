"""Per-stage timing of the fused cube_batch_step on the real chip.

Decomposes e2e time into gather / model / pool+fuse+compact by timing
three nested programs (gather-only, gather+model, full step) at the bench
operating point (5 pairs, dedup gather, affine-Pallas pooling, r4
production gather policy: tiled sub-cubes + slab chunk windows).

Usage: python scripts/stage_profile.py [D] [NC]   (defaults 32 32;
e.g. `64 24` for the 64^3 apply point's stage table, VERDICT r4 item 7)
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


def timeit(fn, *args, n=5, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    P(f"  {label}: {dt * 1000:.1f} ms")
    return dt


def main():
    from surfacenet_tpu.config import Config
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.models.surfacenet import init_surfacenet
    from surfacenet_tpu.ops.view_pairs import (
        dedup_view_slots,
        select_pairs_geometric,
    )
    from surfacenet_tpu.ops.pallas.warp_gather import warp_gather_tiled
    from surfacenet_tpu.ops.cvc import center_cvc
    from surfacenet_tpu.pipeline.sweep import cube_batch_step

    P(f"devices: {jax.devices()}")
    D = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    NC = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    NP = 5
    s = 0.5
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    cfg = Config()
    model, variables = init_surfacenet(
        cfg.model, jax.random.PRNGKey(0), D=D
    )

    centers = scene.bbox_min + (scene.bbox_max - scene.bbox_min) * 0.5
    rng = np.random.RandomState(0)
    origins = jnp.asarray(
        centers[None, :]
        + rng.uniform(-10, 10, size=(NC, 3)).astype(np.float32),
        jnp.float32,
    )
    pairs, w = select_pairs_geometric(
        np.asarray(scene.Ps), np.asarray(origins), n_pairs=NP,
        image_hw=scene.images.shape[1:3], extent_mm=D * s,
    )
    pair_idx = jnp.asarray(pairs, jnp.int32)
    pair_w = jnp.asarray(w, jnp.float32)
    uniq, slots = dedup_view_slots(np.asarray(pair_idx))
    uniq = jnp.asarray(uniq)
    slots = jnp.asarray(slots)
    Ku = uniq.shape[1]
    P(f"Ku (distinct views/cube) = {Ku}")

    # r4 production gather policy: crop/chunk sized at the TILE
    from surfacenet_tpu.ops.pallas.warp_gather import (
        auto_chunk_hw, auto_crop_hw, gather_tile_d,
    )

    td = gather_tile_d(D)
    CH, CW = auto_crop_hw(
        np.asarray(scene.Ps), scene.bbox_min, scene.bbox_max, td, s,
        scene.images.shape[1:3],
    )
    chunk_hw = auto_chunk_hw(
        np.asarray(scene.Ps), scene.bbox_min, scene.bbox_max, td, s,
        scene.images.shape[1:3], PC=min(td ** 3, 8192),
    )
    P(f"gather policy: tile_d={td} crop=({CH},{CW}) chunk={chunk_hw}")

    # --- stage 1: gather only (dedup: Nc*Ku items)
    @jax.jit
    def gather_only(origins):
        uv = jnp.where(uniq >= 0, uniq, jnp.maximum(uniq[:, :1], 0))
        colors, valids = warp_gather_tiled(
            images, Ps, uv.reshape(-1).astype(jnp.int32),
            jnp.repeat(origins, Ku, axis=0), D=D, s=s, CH=CH, CW=CW,
            chunk_hw=chunk_hw,
        )
        return colors, valids

    # --- stage 2: gather + center + slot-select + model forward
    from surfacenet_tpu.models.surfacenet import make_predictor

    predict = make_predictor(model, variables, cfg.model)

    @jax.jit
    def gather_model(origins):
        colors_u, valids_u = gather_only(origins)
        xs_u = center_cvc(colors_u, valids_u)
        xs_u = xs_u.reshape(NC, Ku, D, D, D, 3)
        sa, sb = slots[..., 0], slots[..., 1]
        take = jax.vmap(lambda a, si: jnp.take(a, si, axis=0))
        x = jnp.concatenate(
            [take(xs_u, sa), take(xs_u, sb)], axis=-1
        ).reshape(NC * NP, D, D, D, 6)
        return predict(x, None)

    # --- model only (pre-made input)
    x_fake = jax.random.normal(
        jax.random.PRNGKey(1), (NC * NP, D, D, D, 6), jnp.float32
    )

    @jax.jit
    def model_only(x):
        return predict(x, None)

    # --- full step
    step = jax.jit(
        functools.partial(
            cube_batch_step,
            D=D, s=s, n_pairs=NP, tau=0.7, gamma=0.7,
            adaptive=False, center_colors=True, predict=predict,
            use_pallas=True, ray_pool_mode="affine_pallas",
            crop_hw=(int(CH), int(CW)), chunk_hw=tuple(chunk_hw),
            compact_output=True, pool_window=2,
        ),
        static_argnames=(),
    )

    def full(origins):
        return step(images, Ps, origins, pair_idx, pair_w,
                    None, uniq, slots)

    t_g = timeit(gather_only, origins, label="gather only")
    t_gm = timeit(gather_model, origins, label="gather+model")
    t_m = timeit(model_only, x_fake, label="model only")
    t_f = timeit(full, origins, label="full step")

    # --- isolated micro-stages on fabricated inputs (attribute the
    # pool+fuse+compact residual; shapes match the full step's)
    from surfacenet_tpu.ops.fusion import fuse_pairs
    from surfacenet_tpu.ops.pallas.affine_pool import ray_vote_affine_pallas

    rngk = jax.random.PRNGKey(2)
    probs_f = jax.random.uniform(rngk, (NC, NP, D, D, D), jnp.float32)
    valid_f = jnp.ones((NC, NP, D, D, D), bool)
    fused_f = jax.random.uniform(rngk, (NC, D, D, D), jnp.float32)
    Kp = 6
    pool_views = jnp.tile(jnp.arange(Kp, dtype=jnp.int32)[None], (NC, 1))
    vmask = jnp.ones((NC, Kp), bool)
    Ps_pool = Ps[pool_views]

    @jax.jit
    def fuse_only(p):
        return jax.vmap(fuse_pairs)(p, pair_w, valid_f)

    @jax.jit
    def vote_only(f):
        return ray_vote_affine_pallas(
            f, origins, 0.5, Ps_pool, vmask, window=2
        )

    @jax.jit
    def compact_only(f):
        occ = f > 0.7
        flat_occ = occ.reshape(NC, -1)
        flat_fused = f.reshape(NC, -1)
        score = (
            flat_occ.astype(jnp.bfloat16) * jnp.bfloat16(2.0)
            + flat_fused.astype(jnp.bfloat16)
        )
        _, top_idx = jax.lax.top_k(score, 4096)
        return (
            jnp.take_along_axis(flat_occ, top_idx, axis=-1),
            jnp.take_along_axis(flat_fused, top_idx, axis=-1),
        )

    P("\nisolated micro-stages (fabricated inputs):")
    timeit(fuse_only, probs_f, label="fuse_pairs")
    timeit(vote_only, fused_f, label="ray_vote (Pallas, w=2, K=6)")
    timeit(compact_only, fused_f, label="top_k compact (bf16 key)")

    P(f"\nbreakdown over {NC} cubes ({NC * NP} items):")
    P(f"  gather:              {t_g * 1000:7.1f} ms")
    P(f"  model (isolated):    {t_m * 1000:7.1f} ms")
    P(f"  gather+model:        {t_gm * 1000:7.1f} ms"
      f"  (overlap vs sum: {(t_g + t_m - t_gm) * 1000:+.1f} ms)")
    P(f"  pool+fuse+compact:   {(t_f - t_gm) * 1000:7.1f} ms (residual)")
    P(f"  full:                {t_f * 1000:7.1f} ms"
      f"  -> {NC / t_f:.1f} cubes/s")


if __name__ == "__main__":
    main()
