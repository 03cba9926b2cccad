"""Batched scene sweep (SURVEY.md C9) — the TPU replacement for the
reference's sequential per-cube loop (SURVEY.md SS3.1 "HOT LOOP").

Structure (two-phase, SURVEY.md SS7 "Sparsity vs fixed shapes"):
  1. Host-side enumeration + cheap prefilter: tile the scene bbox into
     overlapping cubes, keep cubes visible in >= min_views frusta, compact
     the survivors into fixed-size padded batches.
  2. One jitted device program per batch: CVC gather for all (cube x pair)
     work items -> 3D CNN -> per-cube weighted fusion -> (adaptive)
     threshold -> ray pooling -> thinned occupancy + color.  Static shapes
     throughout; padding lanes are masked out on the host.

The per-batch function is also the unit that ``parallel/`` shards across a
device mesh (cube axis = data parallel; block axis = scene blocks).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from surfacenet_tpu.config import Config
from surfacenet_tpu.geometry.camera import cube_visible
from surfacenet_tpu.ops.fusion import (
    adaptive_threshold, fuse_pairs, fuse_pairs_consensus,
)
from surfacenet_tpu.ops.ray_pooling import ray_pool
from surfacenet_tpu.pipeline.sparse import CubeResult, SparseCubeStore

# A predictor maps a CVC-pair batch (B, D, D, D, 2C) plus the work items'
# cube origins (B, 3) -> per-voxel probs (B, D, D, D).  Model-backed
# predictors ignore origins; analytic test oracles use them.
Predictor = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _local_variance(v: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """Mean-over-channels local spatial variance of a (B, D, D, D, C) volume."""
    dims = (1, window, window, window, 1)
    ones = (1, 1, 1, 1, 1)

    def avg(y):
        s = jax.lax.reduce_window(
            y, 0.0, jax.lax.add, dims, ones, "SAME"
        )
        n = jax.lax.reduce_window(
            jnp.ones_like(y), 0.0, jax.lax.add, dims, ones, "SAME"
        )
        return s / n

    m = avg(v)
    m2 = avg(v * v)
    return jnp.mean(jnp.maximum(m2 - m * m, 0.0), axis=-1)


def photoconsistency_predictor(
    x: jnp.ndarray, origins: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Model-free oracle predictor for golden tests (SURVEY.md SS4).

    Surface probability from photo-consistency of the two CVCs: where the two
    views agree on a *textured* color, a surface is likely.  Texture is
    measured as local spatial variance — textureless (background) regions are
    photo-consistent but carry no surface evidence and are gated to ~0.
    Not the learned net — used to validate the geometry/fusion/thinning
    pipeline in isolation and as a fallback when no weights are available.
    """
    c = x.shape[-1] // 2
    a, b = x[..., :c], x[..., c:]
    d2 = jnp.mean((a - b) ** 2, axis=-1)
    consistency = jnp.exp(-d2 * 60.0)
    tex = jnp.minimum(_local_variance(a), _local_variance(b))
    texture_gate = 1.0 - jnp.exp(-tex * 300.0)
    return consistency * texture_gate


def enumerate_cubes(
    bbox_min: np.ndarray, bbox_max: np.ndarray, cfg: Config
) -> Tuple[np.ndarray, np.ndarray]:
    """Tile the scene bbox into overlapping cubes.

    Returns (grid_idx (N, 3) int, origins (N, 3) float64 mm).
    """
    s = cfg.voxel.voxel_size_mm
    D = cfg.voxel.cube_size
    stride_mm = cfg.voxel.stride * s
    n = np.maximum(
        np.ceil((bbox_max - bbox_min - D * s) / stride_mm).astype(int) + 1, 1
    )
    gi, gj, gk = np.meshgrid(
        np.arange(n[0]), np.arange(n[1]), np.arange(n[2]), indexing="ij"
    )
    grid = np.stack([gi, gj, gk], axis=-1).reshape(-1, 3)
    origins = bbox_min + grid * stride_mm
    return grid, origins


def prefilter_cubes(
    Ps: np.ndarray,
    origins: np.ndarray,
    image_hw: Tuple[int, int],
    cfg: Config,
) -> np.ndarray:
    """Frustum prefilter: keep cubes visible in >= min_views views.

    Returns bool mask (N,).  Runs as one jitted call on device (cheap), then
    compaction happens host-side — the classic occupancy-compaction split.
    """
    if not cfg.sweep.prefilter:
        return np.ones(len(origins), bool)
    vis = cube_visible(
        jnp.asarray(Ps, jnp.float32),
        jnp.asarray(origins, jnp.float32),
        cfg.voxel.cube_extent_mm,
        image_hw,
    )  # (N, V)
    nvis = np.asarray(jnp.sum(vis, axis=-1))
    return nvis >= cfg.sweep.min_views_visible


def resolve_backend_config(cfg: Config) -> Config:
    """Downgrade TPU-only kernel knobs when running on a CPU backend.

    The shipped configs enable the flagship TPU path (Pallas warp gather +
    Pallas affine ray pooling).  Those kernels only compile on TPU; on CPU
    (tests, dev boxes) they fall back to the XLA oracle gather and the XLA
    affine pooling, which compute the same thing.
    """
    if jax.default_backend() != "cpu":
        return cfg
    sweep = cfg.sweep
    fusion = cfg.fusion
    if sweep.use_pallas_gather:
        sweep = dataclasses.replace(sweep, use_pallas_gather=False)
    if fusion.ray_pool_mode == "affine_pallas":
        fusion = dataclasses.replace(fusion, ray_pool_mode="affine")
    if sweep is not cfg.sweep or fusion is not cfg.fusion:
        cfg = dataclasses.replace(cfg, sweep=sweep, fusion=fusion)
    return cfg


def resolve_fusion_mode(cfg: Config):
    """cfg.fusion -> the hashable fusion_mode static for cube_batch_step:
    "mean", or ("consensus", beta, deadband)."""
    if cfg.fusion.fusion_mode == "consensus":
        return (
            "consensus",
            float(cfg.fusion.consensus_beta),
            float(cfg.fusion.consensus_deadband),
        )
    return cfg.fusion.fusion_mode


def resolve_pool_window(cfg: Config) -> int:
    """Effective ray-max window (voxels): -1 = auto.

    Auto picks min(2, overlap//2): large enough to suppress peak
    shoulders and near-face ghosts, small enough not to eat thin
    structures (the window must stay below the smallest surface-to-surface
    separation IN VOXELS — at very coarse voxelizations of thin geometry,
    set pool_window_vox=1 explicitly; see tests/test_golden_tori.py).
    Claims are exact without halo communication only while
    overlap >= 2*window, so overlap < 2 resolves to 0 — per-cube segment
    pooling with the 0.5 occupancy vote — instead of a window whose
    comparison region would silently extend past the cube's data.
    """
    w = cfg.fusion.pool_window_vox
    if w < 0:
        w = min(2, cfg.voxel.overlap // 2)
    return w


def core_bounds_for(
    grid: np.ndarray,
    lattice_max: np.ndarray,
    D: int,
    overlap: int,
    present: np.ndarray | None = None,
) -> np.ndarray:
    """Per-cube claimed-voxel bounds (N, 3, 2) for core claiming.

    Cores trim overlap//2 voxels from each face so they tile the scene
    exactly (stride = D - overlap).  A cube extends its claim to its own
    face on every side whose lattice neighbor is absent — beyond the
    lattice edge, or dropped by the prefilter when ``present`` carries
    the grid coords of all surviving cubes.  Without the extension the
    overlap strip owned by a dropped neighbor is claimed by no cube at
    all: holes along prefilter boundaries.  (Every voxel inside at least
    one surviving cube is then claimed by at least one surviving cube —
    if the strip's owner is absent, induction along each axis reaches a
    present cube whose neighbor toward the owner is absent, which
    therefore extends.  Corner strips may be double-claimed by two
    extending cubes; the store's merge averages those.)
    """
    m_lo = overlap // 2
    m_hi = overlap - m_lo
    grid = np.asarray(grid)
    if present is None:
        lo = np.where(grid == 0, 0, m_lo)
        hi = np.where(grid == np.asarray(lattice_max), D, D - m_hi)
    else:
        pres = {tuple(int(v) for v in g) for g in np.asarray(present)}
        lo = np.full(grid.shape, m_lo, int)
        hi = np.full(grid.shape, D - m_hi, int)
        for a in range(3):
            e = np.zeros(3, int)
            e[a] = 1
            for i, g in enumerate(grid):
                if tuple(g - e) not in pres:
                    lo[i, a] = 0
                if tuple(g + e) not in pres:
                    hi[i, a] = D
    return np.stack([lo, hi], axis=-1).astype(np.int32)


# Truncation re-fetch mini-batch: offending cubes are re-dispatched dense
# in fixed-size chunks of this many rows (one extra compiled program shape,
# tiny transfer) instead of re-running the whole round dense.
_REFETCH_PAD = 4


def _resolve_compact_k(compact_k: int, D: int) -> int:
    """compact_k <= 0 means auto: a few surface sheets' worth of records.

    A thinned surface sheet through a D-cube is ~D^2 voxels, so 4*D^2
    (min 4096) keeps headroom for multi-sheet / noisy cubes while staying
    ~100x smaller than a dense D^3 transfer.  Callers must still check the
    returned counts for truncation (harvest paths re-fetch dense).
    """
    k = compact_k if compact_k > 0 else max(4096, 4 * D * D)
    return min(k, D * D * D)


@functools.partial(
    jax.jit,
    # tau/gamma are traced scalars: operating-point sweeps (threshold
    # tuning) reuse one compiled program across (tau, gamma) values.
    static_argnames=(
        "D", "s", "n_pairs", "adaptive", "center_colors",
        "predict", "use_pallas", "n_pool_views", "ray_pool_mode",
        "crop_hw", "adaptive_taus", "adaptive_target_density",
        "compact_output", "compact_k", "pool_window", "gather_dtype",
        "pallas_interpret", "chunk_hw", "compact_row_sharding",
        "fusion_mode",
    ),
)
def cube_batch_step(
    images: jnp.ndarray,  # (V, H, W, 3)
    Ps: jnp.ndarray,  # (V, 3, 4) float32
    origins: jnp.ndarray,  # (Nc, 3) float32
    pair_idx: jnp.ndarray,  # (Nc, Npairs, 2) int32
    pair_w: jnp.ndarray,  # (Nc, Npairs) float32
    core_bounds: jnp.ndarray | None = None,  # (Nc, 3, 2) int32 claim region
    uniq_views: jnp.ndarray | None = None,  # (Nc, Ku) int32, -1 padded
    slot_idx: jnp.ndarray | None = None,  # (Nc, Npairs, 2) int32 into Ku
    *,
    D: int,
    s: float,
    n_pairs: int,
    tau: float,
    gamma: float,
    adaptive: bool,
    center_colors: bool,
    predict: Predictor,
    use_pallas: bool = False,
    n_pool_views: int = 6,
    ray_pool_mode: str = "exact",
    crop_hw: tuple = (192, 256),
    adaptive_taus: tuple = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    adaptive_target_density: float = 0.02,
    compact_output: bool = False,
    compact_k: int = 0,  # records/cube for compact_output; <=0 = auto by D
    pool_window: int = 0,  # >0: windowed ray max (cross-cube-consistent)
    gather_dtype: str = "bfloat16",  # Pallas-gather crop/matmul dtype
    #   ("bfloat16" | "int8" | "float32"; SweepConfig.gather_dtype)
    pallas_interpret: bool = False,  # run Pallas kernels in interpret mode
    #   (CPU integration tests of the TPU-native path; no effect on XLA
    #   fallbacks)
    chunk_hw: tuple = (0, 0),  # (SH, SW) per-chunk gather sub-windows
    #   (r4; auto_chunk_hw).  (0, 0) = full-crop kernel.  When set, large
    #   cubes gather in ONE dispatch (no sub-cube tiling): the per-point
    #   cost is the sub-window area, independent of the cube footprint.
    compact_row_sharding=None,  # NamedSharding pinning the compact
    #   top_k's (Nc, D^3) key rows to the cube axis.  Without it the SPMD
    #   partitioner ALL-GATHERS the key matrix across the cube axis and
    #   sorts the full batch redundantly on every device (found by the r4
    #   HLO collective audit, SCALING_r04.json) — Nc*D^3*4 B of per-round
    #   ICI traffic plus N-fold sort work.  Sharded callers pass their
    #   row sharding; the single-device path leaves None.
    fusion_mode="mean",  # "mean" (paper SS5.1 weighted average) |
    #   or ("consensus", beta, deadband) — hashable static tuple |
    #   "consensus" (two-pass consensus-reweighted fusion,
    #   ops/fusion.py::fuse_pairs_consensus — downweights pairs whose
    #   predicted volume disagrees with the cube's preliminary fusion;
    #   the r4 occlusion-robust path, measured in
    #   results/occlusion_r04.json).
):
    """One fused device program over a fixed-size batch of cubes.

    The warp gather runs ONCE per (cube, pair, view): raw (uncentered) CVCs
    feed both the voxel-color output and (after mean-centering) the model —
    no second gather for colors.  ``use_pallas`` switches the gather between
    the XLA oracle (ops/cvc.py) and the Pallas kernel
    (ops/pallas/warp_gather.py).

    Cross-cube pooling (SURVEY.md SS7 "ray pooling across shard
    boundaries"): with ``pool_window`` > 0 the per-ray max is windowed
    (+-pool_window voxels) instead of chopped at the cube face, and
    ``core_bounds`` restricts each cube's claimed voxels to its core so the
    scene tiles without double claims.  When the sweep overlap is >=
    2*pool_window, every claimed voxel's comparison window lies inside its
    own cube's volume — boundary pooling is then exact with ZERO
    communication (redundant compute in the overlap region replaces the
    halo exchange; the TPU-native tradeoff).

    Returns (occupancy (Nc,D,D,D) bool, fused (Nc,D,D,D) f32,
             color (Nc,D,D,D,3) f32).
    """
    from surfacenet_tpu.ops.cvc import build_cvc_views, center_cvc
    from surfacenet_tpu.ops.pallas.warp_gather import warp_gather_tiled

    Nc = origins.shape[0]
    NB = Nc * n_pairs
    flat_pairs = pair_idx.reshape(NB, 2)
    flat_origins = jnp.repeat(origins, n_pairs, axis=0)
    # model-input dtype: predictors stamped bfloat16 (make_predictor) get
    # their (B, D^3, 6) batch assembled in bf16 — bit-identical (the model
    # casts at entry; astype commutes with take/concat) at half the HBM
    # traffic.  Oracle/f32 predictors keep f32.
    x_dt = (
        jnp.bfloat16
        if getattr(predict, "in_dtype", "float32") == "bfloat16"
        else jnp.float32
    )

    def _gather(views, view_origins):
        if use_pallas:
            return warp_gather_tiled(
                images, Ps, views.astype(jnp.int32), view_origins, D=D, s=s,
                CH=crop_hw[0], CW=crop_hw[1], interpret=pallas_interpret,
                in_dtype={
                    "bfloat16": jnp.bfloat16,
                    "int8": jnp.int8,
                    "float32": jnp.float32,
                }[gather_dtype],
                # r4 production gather policy: sub-cube tiling at
                # gather_tile_d(D) + per-chunk slab windows at PC=8192
                # (fastest measured at 32^3 AND 64^3 — chunk_hw must be
                # sized for the TILE; run_sweep/auto callers do so).
                chunk_hw=chunk_hw,
            )
        return build_cvc_views(images, Ps, views, view_origins, D, s)

    if uniq_views is not None:
        # Deduplicated gather: one item per (cube, DISTINCT view) — the Nv
        # pairs of a cube reuse far fewer views than 2*Nv halves
        # (ops/view_pairs.dedup_view_slots), and gather cost is per item.
        # Padded slots (-1) gather the cube's first view; harmless dupes.
        Ku = uniq_views.shape[1]
        uv = jnp.where(
            uniq_views >= 0, uniq_views,
            jnp.maximum(uniq_views[:, :1], 0),
        )
        colors_u, valids_u = _gather(
            uv.reshape(-1), jnp.repeat(origins, Ku, axis=0)
        )
        if center_colors:
            xs_u = center_cvc(colors_u, valids_u).astype(x_dt)
        else:
            xs_u = jnp.where(
                valids_u[..., None], colors_u, 0.0
            ).astype(x_dt)
        colors_u = colors_u.reshape(Nc, Ku, D, D, D, 3)
        valids_u = valids_u.reshape(Nc, Ku, D, D, D)
        xs_u = xs_u.reshape(Nc, Ku, D, D, D, 3)
        sa, sb = slot_idx[..., 0], slot_idx[..., 1]  # (Nc, n_pairs)

        def _take(arr, sl):  # index the Ku axis by per-pair slots
            # vmap'd take keeps the gather indices at (Nc, n_pairs) —
            # take_along_axis would broadcast them to the full output
            # shape (hundreds of MB at 64^3, and it remats poorly).
            # DO NOT "simplify" to a flat-row gather over a collapsed
            # (Nc*Ku) axis: isolated micro-benches rate both forms at
            # ~0.05 ms, but IN-SITU the flat form collapsed the whole
            # production step 3.6x (567 -> 158 cubes/s, r5 bench A/B) —
            # the batched-take form is what XLA fuses well here.
            return jax.vmap(lambda a, si: jnp.take(a, si, axis=0))(arr, sl)

        xa = _take(xs_u, sa)
        xb = _take(xs_u, sb)
        x = jnp.concatenate([xa, xb], axis=-1).reshape(NB, D, D, D, 6)
        va_p = _take(valids_u, sa)
        vb_p = _take(valids_u, sb)
        valid = va_p & vb_p  # (Nc, n_pairs, D, D, D)
    else:
        # one gather per (cube, pair, view-half): [a-halves, b-halves]
        all_views = flat_pairs.T.reshape(-1)  # (2*NB,)
        all_origins = jnp.concatenate([flat_origins, flat_origins], axis=0)
        colors, valids = _gather(all_views, all_origins)
        ca, cb = colors[:NB], colors[NB:]
        va, vb = valids[:NB], valids[NB:]

        if center_colors:
            xa = center_cvc(ca, va).astype(x_dt)
            xb = center_cvc(cb, vb).astype(x_dt)
        else:
            xa = jnp.where(va[..., None], ca, 0.0).astype(x_dt)
            xb = jnp.where(vb[..., None], cb, 0.0).astype(x_dt)
        x = jnp.concatenate([xa, xb], axis=-1)  # (NB, D,D,D, 6)
        valid = (va & vb).reshape(Nc, n_pairs, D, D, D)

    probs = predict(x, flat_origins)  # (NB, D, D, D)
    probs = probs.reshape(Nc, n_pairs, D, D, D)

    fm = (
        (fusion_mode,) if isinstance(fusion_mode, str) else tuple(fusion_mode)
    )
    if fm[0] == "consensus":
        fuse_kw = {}
        if len(fm) > 1:
            fuse_kw = dict(beta=float(fm[1]), deadband=float(fm[2]))
        fused = jax.vmap(
            functools.partial(fuse_pairs_consensus, **fuse_kw)
        )(probs, pair_w, valid)
    else:
        fused = jax.vmap(fuse_pairs)(probs, pair_w, valid)  # (Nc, D,D,D)

    if adaptive:
        taus = adaptive_threshold(
            fused, jnp.asarray(adaptive_taus),
            target_density=adaptive_target_density,
        )
    else:
        taus = jnp.full((Nc,), tau, jnp.float32)

    # pooling views: deduplicated views of this cube's selected pairs.
    # Static shape: unique padded with -1 sentinels; padded slots are masked
    # out of the vote and out of the gamma denominator, so "gamma fraction
    # of views" counts each distinct view exactly once even when a cube has
    # fewer than K unique views (low n_view_pairs configs).
    K = min(n_pool_views, n_pairs * 2)
    if uniq_views is not None:
        # uniq_views is already the ascending -1-padded unique table —
        # its first K columns equal jnp.unique(pv, size=K, fill_value=-1).
        Ku = uniq_views.shape[1]
        if Ku >= K:
            pool_views_raw = uniq_views[:, :K]
        else:
            pool_views_raw = jnp.pad(
                uniq_views, ((0, 0), (0, K - Ku)), constant_values=-1
            )
    else:
        pv_all = pair_idx.reshape(Nc, n_pairs * 2)
        pool_views_raw = jax.vmap(
            lambda pv: jnp.unique(pv, size=K, fill_value=-1)
        )(pv_all)
    view_mask = pool_views_raw >= 0  # (Nc, K)
    pool_views = jnp.maximum(pool_views_raw, 0)
    n_uniq = jnp.sum(view_mask, axis=1)  # (Nc,) true pooling-view count

    if ray_pool_mode == "affine_pallas":
        # fused per-cube vote kernel: the K pooling views accumulate their
        # ray-max masks in VMEM — no (Nc*K, D^3) repeated volumes or
        # per-view masks in HBM (the r2 pool stage was HBM-bound on those)
        from surfacenet_tpu.ops.pallas.affine_pool import (
            ray_vote_affine_pallas,
        )

        votes = ray_vote_affine_pallas(
            fused, origins, s, Ps[pool_views], view_mask,
            window=pool_window, interpret=pallas_interpret,
        )
        need = jnp.maximum(
            jnp.ceil(gamma * n_uniq).astype(jnp.int32), 1
        )[:, None, None, None]
        occ = (votes >= need) & (fused > taus[:, None, None, None])
    elif ray_pool_mode == "affine_matmul":
        # experimental MXU form of the affine shear (one-hot shift matmuls
        # at Precision.HIGHEST); semantics match affine/affine_pallas.
        from surfacenet_tpu.ops.ray_pooling import ray_max_mask_affine_matmul

        flat_probs = jnp.repeat(fused, K, axis=0)
        flat_pool_origins = jnp.repeat(origins, K, axis=0)
        flat_Ps = Ps[pool_views.reshape(-1)]
        masks = ray_max_mask_affine_matmul(
            flat_probs, flat_pool_origins, s, flat_Ps, window=pool_window,
        ).reshape(Nc, K, D, D, D)
        votes = jnp.sum(
            masks.astype(jnp.int32)
            * view_mask[:, :, None, None, None].astype(jnp.int32),
            axis=1,
        )
        need = jnp.maximum(
            jnp.ceil(gamma * n_uniq).astype(jnp.int32), 1
        )[:, None, None, None]
        occ = (votes >= need) & (fused > taus[:, None, None, None])
    else:

        def _pool_one(fp, o, pv, t, vm):
            Pv = Ps[pv]  # (K, 3, 4)
            occ, _ = ray_pool(
                fp, o, s, Pv, t, gamma, mode=ray_pool_mode, view_mask=vm,
                window=pool_window,
            )
            return occ

        occ = jax.vmap(_pool_one)(
            fused, origins, pool_views, taus, view_mask
        )

    if core_bounds is not None:
        # claim only the core region (scene-edge cubes claim to the edge):
        # with windowed pooling this makes cube claims tile the scene with
        # exact boundary semantics; voxels outside the core belong to the
        # neighbor that sees their full comparison window.
        ii = jnp.arange(D)

        def _claim(b):
            mx = (ii >= b[0, 0]) & (ii < b[0, 1])
            my = (ii >= b[1, 0]) & (ii < b[1, 1])
            mz = (ii >= b[2, 0]) & (ii < b[2, 1])
            return (
                mx[:, None, None] & my[None, :, None] & mz[None, None, :]
            )

        occ = occ & jax.vmap(_claim)(core_bounds)

    # Color: validity-weighted average of the strongest pair's raw CVCs.
    # Per-cube dynamic SLICES over the slot axis + one elementwise pass —
    # no gathers (XLA gathers cost ~80 ns/element on v5e; slices are DMA).
    best = jnp.argmax(pair_w, axis=-1)  # (Nc,)
    d3 = D * D * D
    if uniq_views is not None:
        # index the best pair's two view slots out of the unique table
        def _take_best(arr, sl):  # (Nc, Ku, ...) x (Nc,) -> (Nc, ...)
            return jax.vmap(lambda a, si: a[si])(arr, sl)

        sa_best = jnp.take_along_axis(sa, best[:, None], axis=1)[:, 0]
        sb_best = jnp.take_along_axis(sb, best[:, None], axis=1)[:, 0]
        c1 = _take_best(colors_u, sa_best)
        c2 = _take_best(colors_u, sb_best)
        w1 = _take_best(valids_u, sa_best).astype(jnp.float32)
        w2 = _take_best(valids_u, sb_best).astype(jnp.float32)
        color = (
            c1 * w1[..., None] + c2 * w2[..., None]
        ) / jnp.maximum(w1 + w2, 1.0)[..., None]
    else:
        ca_b = ca.reshape(Nc, n_pairs, D, D, D, 3)
        cb_b = cb.reshape(Nc, n_pairs, D, D, D, 3)
        va_b = va.reshape(Nc, n_pairs, D, D, D)
        vb_b = vb.reshape(Nc, n_pairs, D, D, D)

        def _color_one(cab, cbb, vab, vbb, b):
            c1 = cab[b]
            c2 = cbb[b]
            w1 = vab[b].astype(jnp.float32)
            w2 = vbb[b].astype(jnp.float32)
            return (c1 * w1[..., None] + c2 * w2[..., None]) / jnp.maximum(
                w1 + w2, 1.0
            )[..., None]

        color = jax.vmap(_color_one)(ca_b, cb_b, va_b, vb_b, best)

    if compact_output:
        # Device-side SPARSE compaction: thinned surfaces occupy ~0.3-5% of
        # a cube, and the device->host link is the sweep bottleneck on
        # relay-attached TPUs.  Per cube: the top compact_k voxels ranked
        # occupied-first/highest-prob-first, as one uint8 record
        # [idx_hi, idx_mid, idx_lo, prob, r, g, b] (7 bytes/voxel; 24-bit
        # voxel index covers up to 256^3 cubes), plus the true occupied
        # count.  ~10-30x less transfer than dense volumes; exact unless a
        # cube has more than compact_k occupied voxels — harvest paths MUST
        # check the counts and re-fetch truncated cubes dense.
        #
        # Packed-key formulation (r3, measured at (24, 64^3) k=16384 on
        # v5e): the int32 sort key (occ << idx_bits+8 | prob_u8 << idx_bits
        # | voxel_idx) carries occupancy, quantized probability, AND the
        # voxel index through top_k's VALUES — no post-top_k occ/prob
        # gathers (11.4 ms saved) — and color rides ONE u32 gather from a
        # dense packed volume (6.5 ms vs 31.4 ms for two f32 gathers from
        # the per-slot CVC table).  Exactness: occupied keys all exceed
        # non-occupied keys (occ owns the top bit), so every occupied voxel
        # is retrieved whenever count <= K; count > K re-fetches dense.
        # The stored prob was already u8-quantized in the record format, so
        # ranking by prob_u8 loses nothing.
        K = _resolve_compact_k(compact_k, D)
        idx_bits = (d3 - 1).bit_length()
        if idx_bits + 9 > 31:  # int32 key headroom: D <= 161 (prod: <= 64)
            raise NotImplementedError(
                f"compact_output packed key needs idx_bits+9 <= 31; "
                f"D={D} gives {idx_bits + 9}"
            )
        fn = functools.partial(
            _compact_records, D=D, K=K, idx_bits=idx_bits
        )
        if compact_row_sharding is not None:
            # run the compact block under shard_map: per-cube rows are
            # independent, but the SPMD partitioner all-gathers the
            # (Nc, D^3) sort keys across the cube axis and sorts the full
            # batch redundantly on every device (found by the r4 HLO
            # collective audit, SCALING_r04.json — Nc*D^3*4 B of ICI
            # traffic AND N-fold sort work per round).  shard_map keeps
            # top_k local to each device's rows; sharded callers pass
            # their row sharding, the single-device path leaves None.
            from jax import shard_map

            spec = compact_row_sharding.spec
            fn = shard_map(
                fn,
                mesh=compact_row_sharding.mesh,
                in_specs=(spec, spec, spec),
                out_specs=(spec, spec),
            )
        return fn(occ, fused, color)
    return occ, fused, color


def _compact_records(occ, fused, color, *, D, K, idx_bits):
    """Per-cube sparse records (rec (Nc, K, 7) uint8, counts (Nc,)) from
    dense occupancy/probability/color — the device side of the compact
    harvest (see the compact_output comment in cube_batch_step).  Pure
    row-wise math: safe under shard_map over the cube axis."""
    Nc = occ.shape[0]
    d3 = D * D * D
    flat_occ = occ.reshape(Nc, -1)
    counts = jnp.sum(flat_occ, axis=-1).astype(jnp.int32)
    prob_u8_full = jnp.round(
        jnp.clip(fused.reshape(Nc, -1), 0.0, 1.0) * 255.0
    ).astype(jnp.int32)
    iota = jnp.arange(d3, dtype=jnp.int32)[None]
    key = (
        (flat_occ.astype(jnp.int32) << (idx_bits + 8))
        | (prob_u8_full << idx_bits)
        | iota
    )
    # exact top_k (measured: approx_max_k is NOT faster at these row
    # sizes on v5e — 3.7 vs 3.4 ms at (32, 32k) k=4096 — so take the
    # exact op; harvest paths additionally verify retrieved occupied
    # records against `counts` and re-fetch short cubes dense).
    vals, _ = jax.lax.top_k(key, K)  # (Nc, K) — values carry all
    sel_occ = (vals >> (idx_bits + 8)) > 0
    sel_prob_u8 = ((vals >> idx_bits) & 0xFF).astype(jnp.uint8)
    top_idx = (vals & ((1 << idx_bits) - 1)).astype(jnp.uint32)

    cu8 = jnp.round(
        jnp.clip(color, 0.0, 1.0) * 255.0
    ).astype(jnp.uint32)
    packed_col = (
        (cu8[..., 0] << 16) | (cu8[..., 1] << 8) | cu8[..., 2]
    ).reshape(Nc, d3)
    sel_col = jnp.take_along_axis(
        packed_col, top_idx.astype(jnp.int32), axis=-1
    )
    rec = jnp.stack(
        [
            (top_idx >> 16).astype(jnp.uint8),
            ((top_idx >> 8) & 0xFF).astype(jnp.uint8),
            (top_idx & 0xFF).astype(jnp.uint8),
            jnp.where(sel_occ, sel_prob_u8, 0),  # prob=0 marks padding
            ((sel_col >> 16) & 0xFF).astype(jnp.uint8),
            ((sel_col >> 8) & 0xFF).astype(jnp.uint8),
            (sel_col & 0xFF).astype(jnp.uint8),
        ],
        axis=-1,
    )  # (Nc, K, 7)
    return rec, counts




def unpack_compact(rec: np.ndarray, counts: np.ndarray, D: int):
    """Host-side unpack of cube_batch_step's sparse compact_output.

    Args:
      rec: (Nc, K, 7) uint8 [idx_hi, idx_mid, idx_lo, prob, r, g, b];
        prob==0 marks padding records.
      counts: (Nc,) int32 true occupied counts (> K indicates truncation).
    Returns:
      occ (Nc,D,D,D) bool, fused (Nc,D,D,D) f32, color (Nc,D,D,D,3) f32.
    """
    Nc = rec.shape[0]
    d3 = D * D * D
    occ = np.zeros((Nc, d3), bool)
    fused = np.zeros((Nc, d3), np.float32)
    color = np.zeros((Nc, d3, 3), np.float32)
    idx = (
        rec[..., 0].astype(np.int64) << 16
    ) | (rec[..., 1].astype(np.int64) << 8) | rec[..., 2].astype(np.int64)
    prob = rec[..., 3].astype(np.float32) / 255.0
    live = rec[..., 3] > 0
    r, c = np.nonzero(live)  # vectorized scatter across all cubes
    li = idx[r, c]
    occ[r, li] = True
    fused[r, li] = prob[r, c]
    color[r, li] = rec[r, c, 4:7].astype(np.float32) / 255.0
    return (
        occ.reshape(Nc, D, D, D),
        fused.reshape(Nc, D, D, D),
        color.reshape(Nc, D, D, D, 3),
    )

@dataclasses.dataclass
class SweepStats:
    n_cubes_total: int = 0
    n_cubes_after_prefilter: int = 0
    n_cubes_nonempty: int = 0
    n_batches: int = 0


def run_sweep(
    images: np.ndarray,
    Ps: np.ndarray,
    bbox_min: np.ndarray,
    bbox_max: np.ndarray,
    cfg: Config,
    predictor: Predictor,
    pair_selector: Optional[Callable] = None,
    ledger_path: Optional[str] = None,
    metrics=None,
) -> Tuple[SparseCubeStore, SweepStats]:
    """Full single-host scene sweep -> sparse store.

    Args:
      predictor: jit-compatible (B, D,D,D, 6) -> (B, D,D,D) model forward.
      pair_selector: optional callable (Ps, origins) -> (pair_idx, pair_w)
        with shapes (N, Npairs, 2), (N, Npairs).  Defaults to the geometric
        top-Nv selector in ``view_pairs.select_pairs_geometric``.
    """
    from surfacenet_tpu.ops.view_pairs import select_pairs_geometric

    cfg = resolve_backend_config(cfg)
    stats = SweepStats()
    D = cfg.voxel.cube_size
    s = cfg.voxel.voxel_size_mm
    hw = images.shape[1:3]

    if cfg.sweep.refine_calib:
        # self-calibration prepass (geometry/refine.py): photometric
        # bundle adjustment of per-view image-space shifts — the fix for
        # the one brittle robustness axis (results/robustness_r05.json).
        from surfacenet_tpu.geometry.refine import refine_calibration_auto

        Ps, rinfo = refine_calibration_auto(
            images, Ps, bbox_min, bbox_max,
            steps_per_level=cfg.sweep.refine_calib_steps,
            n_probes=cfg.sweep.refine_calib_probes,
        )
        if metrics is not None:
            metrics.gauge("refine_calib_max_shift_px", rinfo["max_shift_px"])
            metrics.gauge("refine_calib_passes", rinfo["passes"])

    grid, origins = enumerate_cubes(
        np.asarray(bbox_min, np.float64), np.asarray(bbox_max, np.float64),
        cfg,
    )
    stats.n_cubes_total = len(origins)
    lattice_max = grid.max(axis=0) if len(grid) else np.zeros(3, int)

    keep = prefilter_cubes(Ps, origins, hw, cfg)
    grid, origins = grid[keep], origins[keep]
    stats.n_cubes_after_prefilter = len(origins)
    # claim extension sees all prefilter survivors (incl. ledger-done cubes,
    # whose claims are already recorded): a dropped neighbor's strip must be
    # claimed by someone, a done neighbor's must not be re-claimed wider.
    present_grid = grid.copy()

    pool_window = resolve_pool_window(cfg)
    store = SparseCubeStore(
        scene_origin=np.asarray(bbox_min, np.float64),
        voxel_size_mm=s,
        cube_size=D,
        stride=cfg.voxel.stride,
        ledger_path=ledger_path,
        # core claiming assigns each voxel exactly one owning cube, so the
        # multi-cube occupancy vote must not veto single claims.
        occupancy_vote=0.0 if pool_window > 0 else 0.5,
    )
    # resume: skip cubes already in the ledger
    done = store.done_set()
    todo = np.array([tuple(g) not in done for g in grid], bool)
    grid, origins = grid[todo], origins[todo]

    if len(origins) == 0:
        if metrics is not None:  # still record the (zero-cube) run
            metrics.gauge("sweep_wall_s", 0.0)
            metrics.gauge("cubes_per_s", 0.0)
            metrics.flush(
                extra={
                    "n_cubes_total": stats.n_cubes_total,
                    "n_cubes_after_prefilter": stats.n_cubes_after_prefilter,
                    "n_cubes_nonempty": stats.n_cubes_nonempty,
                }
            )
        return store, stats

    if pair_selector is None:
        pair_selector = functools.partial(
            select_pairs_geometric, n_pairs=cfg.fusion.n_view_pairs,
            image_hw=hw, extent_mm=cfg.voxel.cube_extent_mm,
            dist_sigma_frac=cfg.fusion.pair_dist_sigma_frac,
        )
    pair_idx, pair_w = pair_selector(Ps, origins)
    pair_idx = np.asarray(pair_idx)
    pair_w = np.asarray(pair_w)
    # gather dedup: one warp-gather item per (cube, distinct view) —
    # ~30-40% fewer items than the 2*Nv pair halves (see dedup_view_slots)
    from surfacenet_tpu.ops.view_pairs import dedup_view_slots

    uniq_views, slot_idx = dedup_view_slots(pair_idx)

    images_d = jnp.asarray(images, jnp.float32)
    Ps_d = jnp.asarray(Ps, jnp.float32)

    crop_hw = (192, 256)
    chunk_hw = (0, 0)
    if cfg.sweep.use_pallas_gather:
        from surfacenet_tpu.ops.pallas.warp_gather import (
            auto_chunk_hw, auto_crop_hw, gather_tile_d,
        )

        # crops are sized for the gather tile (large cubes are gathered
        # as sub-cubes; see warp_gather_tiled)
        td = gather_tile_d(D)
        crop_hw = auto_crop_hw(Ps, bbox_min, bbox_max, td, s, hw)
        if cfg.sweep.gather_chunk_windows:
            # r4: per-chunk slab sub-windows, sized for the TILE at the
            # production PC (warp_gather_tiled's auto policy)
            chunk_hw = auto_chunk_hw(
                Ps, bbox_min, bbox_max, td, s, hw, PC=min(td**3, 8192)
            )

    core_bounds = (
        core_bounds_for(
            grid, lattice_max, D, cfg.voxel.overlap, present=present_grid
        )
        if pool_window > 0
        else None
    )

    B = cfg.sweep.cube_batch
    n = len(origins)
    n_pad = (-n) % B
    if n_pad:
        origins = np.concatenate([origins, origins[:1].repeat(n_pad, 0)])
        pair_idx = np.concatenate([pair_idx, pair_idx[:1].repeat(n_pad, 0)])
        pair_w = np.concatenate([pair_w, pair_w[:1].repeat(n_pad, 0)])
        uniq_views = np.concatenate(
            [uniq_views, uniq_views[:1].repeat(n_pad, 0)]
        )
        slot_idx = np.concatenate([slot_idx, slot_idx[:1].repeat(n_pad, 0)])
        if core_bounds is not None:
            core_bounds = np.concatenate(
                [core_bounds, core_bounds[:1].repeat(n_pad, 0)]
            )

    def dispatch(b0, compact: bool = True):
        """Launch one batch (async; jax dispatch returns immediately)."""
        return cube_batch_step(
            images_d,
            Ps_d,
            jnp.asarray(origins[b0 : b0 + B], jnp.float32),
            jnp.asarray(pair_idx[b0 : b0 + B], jnp.int32),
            jnp.asarray(pair_w[b0 : b0 + B], jnp.float32),
            None
            if core_bounds is None
            else jnp.asarray(core_bounds[b0 : b0 + B], jnp.int32),
            jnp.asarray(uniq_views[b0 : b0 + B], jnp.int32),
            jnp.asarray(slot_idx[b0 : b0 + B], jnp.int32),
            D=D,
            s=s,
            n_pairs=cfg.fusion.n_view_pairs,
            tau=cfg.fusion.tau,
            gamma=cfg.fusion.gamma,
            adaptive=cfg.fusion.adaptive_threshold,
            center_colors=cfg.voxel.center_colors,
            predict=predictor,
            use_pallas=cfg.sweep.use_pallas_gather,
            n_pool_views=cfg.fusion.n_pool_views,
            ray_pool_mode=cfg.fusion.ray_pool_mode,
            fusion_mode=resolve_fusion_mode(cfg),
            crop_hw=crop_hw,
            adaptive_taus=cfg.fusion.adaptive_taus,
            adaptive_target_density=cfg.fusion.adaptive_target_density,
            compact_output=compact,
            compact_k=cfg.sweep.compact_k,
            gather_dtype=cfg.sweep.gather_dtype,
            pool_window=pool_window,
            chunk_hw=chunk_hw,
        )

    compact_K = _resolve_compact_k(cfg.sweep.compact_k, D)

    def dispatch_rows(rows: np.ndarray):
        """Dense dispatch over selected batch rows only (truncation
        re-fetch).  Rows are padded to a small fixed mini-batch so the
        dense program compiles once regardless of offender count — at 64^3
        a whole dense round is ~256 MB of device->host transfer, so only
        the offending cubes come back dense (VERDICT r2 weak #5)."""
        PAD = min(B, _REFETCH_PAD)
        n_pad = (-len(rows)) % PAD
        rr = (
            np.concatenate([rows, rows[:1].repeat(n_pad)]) if n_pad
            else rows
        )
        outs = []
        for c0 in range(0, len(rr), PAD):
            sel = rr[c0 : c0 + PAD]
            out = cube_batch_step(
                images_d,
                Ps_d,
                jnp.asarray(origins[sel], jnp.float32),
                jnp.asarray(pair_idx[sel], jnp.int32),
                jnp.asarray(pair_w[sel], jnp.float32),
                None
                if core_bounds is None
                else jnp.asarray(core_bounds[sel], jnp.int32),
                jnp.asarray(uniq_views[sel], jnp.int32),
                jnp.asarray(slot_idx[sel], jnp.int32),
                D=D,
                s=s,
                n_pairs=cfg.fusion.n_view_pairs,
                tau=cfg.fusion.tau,
                gamma=cfg.fusion.gamma,
                adaptive=cfg.fusion.adaptive_threshold,
                center_colors=cfg.voxel.center_colors,
                predict=predictor,
                use_pallas=cfg.sweep.use_pallas_gather,
                n_pool_views=cfg.fusion.n_pool_views,
                ray_pool_mode=cfg.fusion.ray_pool_mode,
                fusion_mode=resolve_fusion_mode(cfg),
                crop_hw=crop_hw,
                adaptive_taus=cfg.fusion.adaptive_taus,
                adaptive_target_density=cfg.fusion.adaptive_target_density,
                compact_output=False,
                compact_k=cfg.sweep.compact_k,
                gather_dtype=cfg.sweep.gather_dtype,
                pool_window=pool_window,
                chunk_hw=chunk_hw,
            )
            outs.append(tuple(np.asarray(x) for x in out))
        take = len(rows)
        return (
            np.concatenate([o[0] for o in outs])[:take],
            np.concatenate([o[1] for o in outs])[:take],
            np.concatenate([o[2] for o in outs])[:take],
        )

    def harvest(b0, out):
        nb = min(B, n - b0)
        counts = np.asarray(out[1])[:nb]  # ignore padding slots
        rec_np = np.asarray(out[0])
        occ, fused, color = unpack_compact(rec_np, counts, D)
        # exactness check: every occupied voxel (true count from the
        # device) must be among the retrieved records — catches both
        # compact_k truncation and approx_max_k recall misses.
        got = (rec_np[:nb, :, 3] > 0).sum(axis=1)
        short = np.flatnonzero(got < counts)
        if len(short):
            # compact records dropped occupied voxels (dense cube past
            # compact_k, or an approx-top-k miss): re-fetch just those
            # cubes dense so no occupied voxel is silently lost.
            print(
                f"sweep: {len(short)} cube(s) short of their occupied "
                f"count (compact_k={compact_K}); re-fetching them dense"
            )
            if metrics is not None:
                metrics.count("compact_truncation_refetches", len(short))
            d_occ, d_fused, d_color = dispatch_rows(b0 + short)
            occ[short] = d_occ
            fused[short] = d_fused
            color[short] = d_color
        stats.n_batches += 1
        for i in range(min(B, n - b0)):
            gi = tuple(grid[b0 + i])
            if occ[i].any():
                stats.n_cubes_nonempty += 1
            store.add(CubeResult(gi, occ[i], fused[i], color[i]))
        if metrics is not None:
            nb = min(B, n - b0)  # exclude padding slots (cube-0 copies)
            metrics.count("cubes_processed", nb)
            metrics.count("voxels_occupied", float(occ[:nb].sum()))
            metrics.gauge(
                "occupancy_rate",
                metrics.data["voxels_occupied"]
                / (metrics.data["cubes_processed"] * D**3),
            )

    # pipelined: keep a few batches in flight so host-side harvest (sync +
    # transfer + store/ledger) overlaps device compute of later batches.
    import collections
    import time as _time

    from surfacenet_tpu.utils.observability import trace

    DEPTH = 3
    t0 = _time.perf_counter()
    starts = list(range(0, n + n_pad, B))
    pending = collections.deque()
    # profiler hook: JAX_PROFILER_DIR=<dir> captures a Perfetto/XProf trace
    # of the pipelined sweep (no-op otherwise).
    with trace("run_sweep"):
        for b0 in starts:
            pending.append((b0, dispatch(b0)))
            if len(pending) > DEPTH:
                harvest(*pending.popleft())
        while pending:
            harvest(*pending.popleft())
    if metrics is not None:
        wall = _time.perf_counter() - t0
        metrics.gauge("sweep_wall_s", wall)
        metrics.gauge("cubes_per_s", n / wall if wall > 0 else 0.0)
        metrics.flush(
            extra={
                "n_cubes_total": stats.n_cubes_total,
                "n_cubes_after_prefilter": stats.n_cubes_after_prefilter,
                "n_cubes_nonempty": stats.n_cubes_nonempty,
            }
        )
    return store, stats
