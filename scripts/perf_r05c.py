"""Round-5 perf session C -> results/perf_r05c.json.

Three attacks staged by sessions A/B's attribution:

  1. gather_dtype int8 at the 64^3 production step: r3 measured int8 a
     WASH at 32^3 (crop-DMA-bound there), but session A shows the 64^3
     gather is ~47 ms and FLOP-dominated by the hat matmuls (window area
     x points) — the 2x int8 MXU rate should finally pay.  Also re-check
     32^3.
  2. x-assembly forms: the slot-select take+concat costs 13 ms at 64^3
     (1/3 of the residual).  A/B the vmap'd take against a flat-row
     gather and a one-hot bf16 matmul.
  3. Aligned e2e cube-batch sweep (NC 32/48/64): the forward gains
     3-5 MFU points at larger batches (session A); does the full step?

Run on the TPU chip:  python -u scripts/perf_r05c.py
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
OUT = os.path.join(REPO, "results", "perf_r05c.json")


def timeit(fn, *args, n=10, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / n)
    P(f"  {label}: {best * 1000:.2f} ms")
    return best


def setup(D, NC, s):
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.ops.pallas.warp_gather import (
        auto_chunk_hw, auto_crop_hw, gather_tile_d,
    )
    from surfacenet_tpu.ops.view_pairs import (
        dedup_view_slots, select_pairs_geometric,
    )

    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    centers = scene.bbox_min + (scene.bbox_max - scene.bbox_min) * 0.5
    rng = np.random.RandomState(0)
    origins = jnp.asarray(
        centers[None, :] + rng.uniform(-10, 10, (NC, 3)), jnp.float32
    )
    pairs, w = select_pairs_geometric(
        np.asarray(scene.Ps), np.asarray(origins), n_pairs=5,
        image_hw=scene.images.shape[1:3], extent_mm=D * s,
    )
    uniq, slots = dedup_view_slots(np.asarray(pairs))
    td = gather_tile_d(D)
    CH, CW = auto_crop_hw(
        np.asarray(scene.Ps), scene.bbox_min, scene.bbox_max, td, s,
        scene.images.shape[1:3],
    )
    chunk_hw = auto_chunk_hw(
        np.asarray(scene.Ps), scene.bbox_min, scene.bbox_max, td, s,
        scene.images.shape[1:3], PC=min(td ** 3, 8192),
    )
    return scene, origins, pairs, w, uniq, slots, (CH, CW), chunk_hw


def step_time(D, NC, s, mk, gather_dtype, label):
    from surfacenet_tpu.models.surfacenet import (
        init_surfacenet, make_predictor,
    )
    from surfacenet_tpu.pipeline.sweep import cube_batch_step

    scene, origins, pairs, w, uniq, slots, crop, chunk = setup(D, NC, s)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    mcfg = mk()
    model, variables = init_surfacenet(mcfg, jax.random.PRNGKey(0), D=D)
    predict = make_predictor(model, variables, mcfg)
    step = functools.partial(
        cube_batch_step,
        D=D, s=s, n_pairs=5, tau=0.7, gamma=0.7,
        adaptive=False, center_colors=True, predict=predict,
        use_pallas=True, ray_pool_mode="affine_pallas",
        crop_hw=(int(crop[0]), int(crop[1])), chunk_hw=tuple(chunk),
        compact_output=True, pool_window=2, gather_dtype=gather_dtype,
    )
    f = jax.jit(
        lambda o: step(
            images, Ps, o, jnp.asarray(pairs, jnp.int32),
            jnp.asarray(w, jnp.float32), None,
            jnp.asarray(uniq), jnp.asarray(slots),
        )
    )
    return timeit(f, origins, label=label)


def gather_dtype_ab(rec):
    from surfacenet_tpu.config import ModelConfig

    rows = {}
    for D, NC, s, mk, mname in (
        (64, 24, 0.8, ModelConfig.fast64, "fast64"),
        (32, 32, 0.5, ModelConfig.mxu_aligned, "aligned"),
    ):
        for dt in ("bfloat16", "int8"):
            t = step_time(
                D, NC, s, mk, dt, f"{mname}@{D} gather_dtype={dt}"
            )
            rows[f"{mname}@{D}/{dt}"] = round(t * 1e3, 2)
    rec["gather_dtype_full_ms"] = rows
    return rec


def x_assembly_ab(rec):
    rows = {}
    for D, NC in ((64, 24), (32, 32)):
        Ku, NP_ = 6, 5
        rng = jax.random.PRNGKey(0)
        xs_u = jax.random.normal(
            rng, (NC, Ku, D, D, D, 3), jnp.bfloat16
        )
        sa = jax.random.randint(rng, (NC, NP_), 0, Ku, jnp.int32)
        sb = jax.random.randint(rng, (NC, NP_), 0, Ku, jnp.int32)

        @jax.jit
        def vmap_take(xs_u, sa, sb):
            take = jax.vmap(lambda a, si: jnp.take(a, si, axis=0))
            return jnp.concatenate(
                [take(xs_u, sa), take(xs_u, sb)], axis=-1
            ).reshape(NC * NP_, D, D, D, 6)

        @jax.jit
        def flat_take(xs_u, sa, sb):
            F = D * D * D * 3
            flat = xs_u.reshape(NC * Ku, F)
            base = (jnp.arange(NC, dtype=jnp.int32) * Ku)[:, None]
            a = jnp.take(flat, (base + sa).reshape(-1), axis=0)
            b = jnp.take(flat, (base + sb).reshape(-1), axis=0)
            return jnp.concatenate(
                [a.reshape(NC * NP_, D, D, D, 3),
                 b.reshape(NC * NP_, D, D, D, 3)], axis=-1
            )

        @jax.jit
        def onehot_matmul(xs_u, sa, sb):
            F = D * D * D * 3
            flat = xs_u.reshape(NC, Ku, F)
            oh_a = jax.nn.one_hot(sa, Ku, dtype=jnp.bfloat16)
            oh_b = jax.nn.one_hot(sb, Ku, dtype=jnp.bfloat16)
            a = jnp.einsum("npk,nkf->npf", oh_a, flat)
            b = jnp.einsum("npk,nkf->npf", oh_b, flat)
            return jnp.concatenate(
                [a.reshape(NC * NP_, D, D, D, 3),
                 b.reshape(NC * NP_, D, D, D, 3)], axis=-1
            )

        for name, f in (("vmap_take", vmap_take),
                        ("flat_take", flat_take),
                        ("onehot_matmul", onehot_matmul)):
            t = timeit(f, xs_u, sa, sb, label=f"x-assembly {name} D={D}")
            rows[f"D{D}/{name}"] = round(t * 1e3, 2)
    rec["x_assembly_ms"] = rows
    return rec


def aligned_nc_sweep(rec):
    from surfacenet_tpu.config import ModelConfig

    rows = {}
    for NC in (32, 48, 64):
        t = step_time(
            32, NC, 0.5, ModelConfig.mxu_aligned, "bfloat16",
            f"aligned@32 NC={NC}",
        )
        rows[str(NC)] = {
            "ms": round(t * 1e3, 2),
            "cubes_per_s": round(NC / t, 1),
        }
    rec["aligned_nc_sweep"] = rows
    return rec


def main():
    P(f"devices: {jax.devices()}")
    rec = {}
    rec = x_assembly_ab(rec)
    rec = gather_dtype_ab(rec)
    rec = aligned_nc_sweep(rec)
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    P(f"wrote {OUT}")


if __name__ == "__main__":
    main()
