"""Round-5 perf session (VERDICT r4 next #2/#3/#5) -> results/perf_r05.json.

One TPU process, four experiments:

  A. Stage decomposition (gather / forward / pool+fuse+compact residual)
     for the ALIGNED model at 32^3 and the FAST64 model at 64^3 — the r4
     stage table only covered paper widths, and the e2e-MFU attack needs
     the non-conv residual measured at the operating points that matter.
  B. Aligned forward batch sweep at 32^3: the 69.5-70.1 MFU band was
     only ever measured at 160 items; if a larger batch clears 71%, the
     bench adopts it (VERDICT: clear 70 with margin or stop writing 70).
  C. compact_k sweep at the 32^3 aligned step: auto resolves to 4096
     records/cube; typical thinned cubes carry <2k occupied voxels, and
     top_k cost scales with k — smaller k + the existing truncation
     re-fetch may buy the pool+compact residual down.
  D. Isolated top_k timing vs k (attribution for C).

Run on the TPU chip:  python -u scripts/perf_r05.py
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
OUT = os.path.join(REPO, "results", "perf_r05.json")


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


def stage_rows(model_name, mk, D, NC, rec):
    from surfacenet_tpu.config import Config
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.models.surfacenet import (
        init_surfacenet, make_predictor,
    )
    from surfacenet_tpu.ops.cvc import center_cvc
    from surfacenet_tpu.ops.pallas.warp_gather import (
        auto_chunk_hw, auto_crop_hw, gather_tile_d, warp_gather_tiled,
    )
    from surfacenet_tpu.ops.view_pairs import (
        dedup_view_slots, select_pairs_geometric,
    )
    from surfacenet_tpu.pipeline.sweep import cube_batch_step
    from surfacenet_tpu.utils.observability import (
        FlopModel, detect_peak_tflops,
    )

    NP_ = 5
    s = 0.5 if D == 32 else 0.8
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    mcfg = mk()
    model, variables = init_surfacenet(mcfg, jax.random.PRNGKey(0), D=D)
    predict = make_predictor(model, variables, mcfg)

    centers = scene.bbox_min + (scene.bbox_max - scene.bbox_min) * 0.5
    rng = np.random.RandomState(0)
    origins = jnp.asarray(
        centers[None, :] + rng.uniform(-10, 10, (NC, 3)), jnp.float32
    )
    pairs, w = select_pairs_geometric(
        np.asarray(scene.Ps), np.asarray(origins), n_pairs=NP_,
        image_hw=scene.images.shape[1:3], extent_mm=D * s,
    )
    pair_idx = jnp.asarray(pairs, jnp.int32)
    pair_w = jnp.asarray(w, jnp.float32)
    uniq, slots = dedup_view_slots(np.asarray(pair_idx))
    uniq = jnp.asarray(uniq)
    slots = jnp.asarray(slots)
    Ku = uniq.shape[1]

    td = gather_tile_d(D)
    CH, CW = auto_crop_hw(
        np.asarray(scene.Ps), scene.bbox_min, scene.bbox_max, td, s,
        scene.images.shape[1:3],
    )
    chunk_hw = auto_chunk_hw(
        np.asarray(scene.Ps), scene.bbox_min, scene.bbox_max, td, s,
        scene.images.shape[1:3], PC=min(td ** 3, 8192),
    )

    @jax.jit
    def gather_only(origins):
        uv = jnp.where(uniq >= 0, uniq, jnp.maximum(uniq[:, :1], 0))
        return warp_gather_tiled(
            images, Ps, uv.reshape(-1).astype(jnp.int32),
            jnp.repeat(origins, Ku, axis=0), D=D, s=s,
            CH=int(CH), CW=int(CW), chunk_hw=tuple(chunk_hw),
        )

    n_items = NC * NP_
    x_fake = jax.random.normal(
        jax.random.PRNGKey(1), (n_items, D, D, D, 6), jnp.float32
    )

    @jax.jit
    def model_only(x):
        return predict(x, None)

    def make_full(compact_k):
        step = functools.partial(
            cube_batch_step,
            D=D, s=s, n_pairs=NP_, tau=0.7, gamma=0.7,
            adaptive=False, center_colors=True, predict=predict,
            use_pallas=True, ray_pool_mode="affine_pallas",
            crop_hw=(int(CH), int(CW)), chunk_hw=tuple(chunk_hw),
            compact_output=True, pool_window=2, compact_k=compact_k,
        )
        return lambda o: step(images, Ps, o, pair_idx, pair_w,
                              None, uniq, slots)

    t_g = timeit(gather_only, origins, label=f"{model_name}@{D} gather")
    t_m = timeit(model_only, x_fake, label=f"{model_name}@{D} forward")
    t_f = timeit(make_full(0), origins, label=f"{model_name}@{D} full")
    fm = FlopModel(mcfg, D)
    peak = detect_peak_tflops()
    row = {
        "D": D, "NC": NC, "gather_ms": round(t_g * 1e3, 2),
        "forward_ms": round(t_m * 1e3, 2),
        "full_ms": round(t_f * 1e3, 2),
        "residual_ms": round((t_f - t_g - t_m) * 1e3, 2),
        "fwd_mfu_pct": round(
            100 * fm.utilization(n_items / t_m, peak), 1
        ),
        "e2e_mfu_pct": round(
            100 * fm.utilization(n_items / t_f, peak), 1
        ),
        "cubes_per_s_unpipelined": round(NC / t_f, 1),
    }
    rec.setdefault("stages", {})[f"{model_name}@{D}"] = row

    # C: compact_k sweep (32^3 aligned only to keep the matrix small)
    if model_name == "aligned" and D == 32:
        ks = {}
        for k in (1024, 2048, 4096):
            t = timeit(
                make_full(k), origins, label=f"compact_k={k} full"
            )
            ks[str(k)] = round(t * 1e3, 2)
        rec["compact_k_full_ms"] = ks
    return rec


def fwd_batch_sweep(rec):
    from surfacenet_tpu.config import ModelConfig
    from surfacenet_tpu.models.surfacenet import (
        init_surfacenet, make_predictor,
    )
    from surfacenet_tpu.utils.observability import (
        FlopModel, detect_peak_tflops,
    )

    D = 32
    mcfg = ModelConfig.mxu_aligned()
    model, variables = init_surfacenet(mcfg, jax.random.PRNGKey(0), D=D)
    predict = make_predictor(model, variables, mcfg)
    fm = FlopModel(mcfg, D)
    peak = detect_peak_tflops()
    rows = {}
    for B in (160, 224, 320, 480, 640):
        x = jnp.zeros((B, D, D, D, 6), jnp.float32)
        fwd = jax.jit(lambda x: predict(x, None))
        try:
            t = timeit(fwd, x, label=f"aligned fwd B={B}")
            rows[str(B)] = {
                "ms": round(t * 1e3, 2),
                "mfu_pct": round(100 * fm.utilization(B / t, peak), 1),
            }
        except Exception as e:
            rows[str(B)] = {"error": repr(e)[:120]}
    rec["aligned_fwd_batch_sweep"] = rows
    return rec


def topk_timing(rec):
    rows = {}
    key = jax.random.randint(
        jax.random.PRNGKey(0), (32, 32768), 0, 1 << 30, jnp.int32
    )
    for k in (1024, 2048, 4096):
        f = jax.jit(lambda x, k=k: jax.lax.top_k(x, k))
        t = timeit(f, key, label=f"top_k k={k} (32,32768)")
        rows[str(k)] = round(t * 1e3, 2)
    rec["topk_ms"] = rows
    return rec


def main():
    from surfacenet_tpu.config import ModelConfig

    P(f"devices: {jax.devices()}")
    rec = {}
    rec = stage_rows("aligned", ModelConfig.mxu_aligned, 32, 32, rec)
    rec = stage_rows("paper", ModelConfig, 32, 32, rec)
    rec = stage_rows("fast64", ModelConfig.fast64, 64, 24, rec)
    rec = stage_rows("paper", ModelConfig, 64, 24, rec)
    rec = fwd_batch_sweep(rec)
    rec = topk_timing(rec)
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=2)
        f.write("\n")
    P(f"wrote {OUT}")


if __name__ == "__main__":
    main()
