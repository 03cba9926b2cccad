"""Round-5 perf session B: 64^3 residual decomposition + aligned
fused-inference A/B -> results/perf_r05b.json.

perf_r05.py measured the fast64@64^3 production step at
gather 47 / forward 88.5 / residual ~38.6 ms — the residual (windowed
vote + compact + color + x-assembly) is now 22% of the 64^3 step and the
next documented lever.  This script attributes it op by op and sweeps
compact_k at 64^3 (auto resolves to 16384 there), then A/Bs the
BN-folded Pallas fused inference at the aligned 32^3 shapes (the r2
whole-network verdict favored XLA at paper shapes; lane-aligned shapes
are where the im2col kernel should do best — VERDICT #3).

Run on the TPU chip:  python -u scripts/perf_r05b.py
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
OUT = os.path.join(REPO, "results", "perf_r05b.json")


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


def residual_64(rec):
    from surfacenet_tpu.ops.fusion import fuse_pairs
    from surfacenet_tpu.ops.pallas.affine_pool import ray_vote_affine_pallas
    from surfacenet_tpu.data.synthetic import make_sphere_scene

    D, NC, NP_, K = 64, 24, 5, 6
    s = 0.8
    d3 = D * D * D
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    rng = jax.random.PRNGKey(0)
    fused = jax.random.uniform(rng, (NC, D, D, D), jnp.float32)
    probs = jax.random.uniform(rng, (NC, NP_, D, D, D), jnp.float32)
    pair_w = jax.random.uniform(rng, (NC, NP_), jnp.float32)
    valid = jnp.ones((NC, NP_, D, D, D), bool)
    origins = jnp.asarray(
        np.tile(scene.bbox_min, (NC, 1)).astype(np.float32)
    )
    pool_views = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None], (NC, 1))
    view_mask = jnp.ones((NC, K), bool)

    rows = {}
    f_fuse = jax.jit(lambda p, w, v: jax.vmap(fuse_pairs)(p, w, v))
    rows["fuse_ms"] = round(
        timeit(f_fuse, probs, pair_w, valid, label="fuse") * 1e3, 2
    )

    f_vote = jax.jit(
        lambda fu, o: ray_vote_affine_pallas(
            fu, o, s, Ps[pool_views], view_mask, window=2
        )
    )
    rows["vote_kernel_ms"] = round(
        timeit(f_vote, fused, origins, label="vote kernel") * 1e3, 2
    )

    key = jax.random.randint(rng, (NC, d3), 0, 1 << 30, jnp.int32)
    for k in (4096, 8192, 16384):
        f_topk = jax.jit(lambda x, k=k: jax.lax.top_k(x, k))
        rows[f"topk_{k}_ms"] = round(
            timeit(f_topk, key, label=f"top_k {k} (24, 262144)") * 1e3, 2
        )

    packed = jax.random.randint(rng, (NC, d3), 0, 1 << 24, jnp.uint32)
    idx = jax.random.randint(rng, (NC, 16384), 0, d3, jnp.int32)
    f_col = jax.jit(
        lambda p, i: jnp.take_along_axis(p, i, axis=-1)
    )
    rows["color_gather_ms"] = round(
        timeit(f_col, packed, idx, label="color gather") * 1e3, 2
    )

    # x-assembly: slot-select two halves out of the unique table + concat
    Ku = 6
    xs_u = jax.random.normal(
        rng, (NC, Ku, D, D, D, 3), jnp.bfloat16
    )
    sa = jax.random.randint(rng, (NC, NP_), 0, Ku, jnp.int32)
    sb = jax.random.randint(rng, (NC, NP_), 0, Ku, jnp.int32)

    @jax.jit
    def assemble(xs_u, sa, sb):
        take = jax.vmap(lambda a, si: jnp.take(a, si, axis=0))
        return jnp.concatenate(
            [take(xs_u, sa), take(xs_u, sb)], axis=-1
        ).reshape(NC * NP_, D, D, D, 6)

    rows["x_assembly_ms"] = round(
        timeit(assemble, xs_u, sa, sb, label="x assembly") * 1e3, 2
    )
    rec["residual_64"] = rows

    # compact_k full-step sweep at fast64@64 (needs the whole step)
    from surfacenet_tpu.config import ModelConfig
    from surfacenet_tpu.models.surfacenet import (
        init_surfacenet, make_predictor,
    )
    from surfacenet_tpu.ops.pallas.warp_gather import (
        auto_chunk_hw, auto_crop_hw, gather_tile_d,
    )
    from surfacenet_tpu.ops.view_pairs import (
        dedup_view_slots, select_pairs_geometric,
    )
    from surfacenet_tpu.pipeline.sweep import cube_batch_step

    images = jnp.asarray(scene.images, jnp.float32)
    mcfg = ModelConfig.fast64()
    model, variables = init_surfacenet(mcfg, jax.random.PRNGKey(0), D=D)
    predict = make_predictor(model, variables, mcfg)
    centers = scene.bbox_min + (scene.bbox_max - scene.bbox_min) * 0.5
    nprng = np.random.RandomState(0)
    r_origins = jnp.asarray(
        centers[None, :] + nprng.uniform(-10, 10, (NC, 3)), jnp.float32
    )
    pairs, w = select_pairs_geometric(
        np.asarray(scene.Ps), np.asarray(r_origins), n_pairs=NP_,
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
    ks = {}
    for k in (4096, 8192, 16384):
        step = functools.partial(
            cube_batch_step,
            D=D, s=s, n_pairs=NP_, tau=0.7, gamma=0.7,
            adaptive=False, center_colors=True, predict=predict,
            use_pallas=True, ray_pool_mode="affine_pallas",
            crop_hw=(int(CH), int(CW)), chunk_hw=tuple(chunk_hw),
            compact_output=True, pool_window=2, compact_k=k,
        )
        f = jax.jit(
            lambda o, step=step: step(
                images, Ps, o, jnp.asarray(pairs, jnp.int32),
                jnp.asarray(w, jnp.float32), None,
                jnp.asarray(uniq), jnp.asarray(slots),
            )
        )
        ks[str(k)] = round(
            timeit(f, r_origins, label=f"fast64@64 compact_k={k}") * 1e3,
            2,
        )
    rec["fast64_64_compact_k_full_ms"] = ks
    return rec


def fused_infer_ab(rec):
    from surfacenet_tpu.config import ModelConfig
    import dataclasses

    from surfacenet_tpu.models.surfacenet import (
        init_surfacenet, make_predictor,
    )
    from surfacenet_tpu.utils.observability import (
        FlopModel, detect_peak_tflops,
    )

    D, B = 32, 160
    rows = {}
    for fused in (False, True):
        mcfg = dataclasses.replace(
            ModelConfig.mxu_aligned(), fused_inference=fused
        )
        model, variables = init_surfacenet(
            mcfg, jax.random.PRNGKey(0), D=D
        )
        predict = make_predictor(model, variables, mcfg)
        x = jnp.zeros((B, D, D, D, 6), jnp.float32)
        f = jax.jit(lambda x: predict(x, None))
        try:
            t = timeit(f, x, label=f"aligned fwd fused={fused}")
            fm = FlopModel(mcfg, D)
            peak = detect_peak_tflops()
            rows[str(fused)] = {
                "ms": round(t * 1e3, 2),
                "mfu_pct": round(100 * fm.utilization(B / t, peak), 1),
            }
        except Exception as e:
            rows[str(fused)] = {"error": repr(e)[:150]}
    rec["aligned_fused_infer_ab"] = rows
    return rec


def main():
    P(f"devices: {jax.devices()}")
    rec = {}
    rec = residual_64(rec)
    rec = fused_infer_ab(rec)
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    P(f"wrote {OUT}")


if __name__ == "__main__":
    main()
