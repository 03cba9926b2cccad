"""Pallas TPU kernel for the CVC perspective-warp gather (SURVEY.md C4/SS7).

The hot spot of CVC construction is a data-dependent bilinear gather — the
single worst-fitting op for a TPU.  This kernel restructures it TPU-natively
(BASELINE north star: "CVC-warp kernel at speed-of-light"):

  * Per (cube, view) work item, the cube's projected image footprint is a
    small crop window.  Crops are extracted once with XLA dynamic slices and
    streamed through the kernel by the Pallas BlockSpec pipeline (automatic
    double-buffered DMA overlapped with compute); the kernel never touches
    the full image.
  * Bilinear interpolation is expressed WITHOUT gathers, as two dense
    contractions against "hat" weight matrices:

        sample(p, c) = sum_h sum_w hatV[p,h] * hatW[p,w] * crop[c, h, w]

    computed as a (CH-contraction) matmul on the MXU followed by a VPU
    multiply-reduce over the crop width.  hat[p, i] = max(0, 1-|x_p - i|)
    is nonzero only at the two neighbors, so this is exactly bilinear.
  * Points are processed in lane-aligned chunks (PC lanes); all tensors keep
    the point dimension in lanes, so every op is tiled natively.

Implementation note: an earlier version DMA'd crops manually from HBM inside
the kernel (make_async_copy + semaphore); on real TPU the Mosaic scheduler
hoisted the scratch reads past the DMA wait across grid steps, producing
stale crops.  The BlockSpec pipeline has the dependency explicit and is also
faster (overlaps the next item's crop fetch with current compute).

The XLA-path oracle is ops/cvc.py::build_cvc_views; tests assert agreement
in interpret mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _warp_kernel(
    # scalar prefetch (SMEM)
    window_ref,  # (B, 2) int32: crop origin (v0, u0) per item — or, in
    #           chunk mode, (B, 2*NCh) with this chunk's (v0, u0) at
    #           columns (2*ci, 2*ci+1)
    Pm_ref,  # (B, 12) f32: row-major 3x4 projection matrix per item
    origin_ref,  # (B, 3) f32: cube origin per item
    # inputs (pipelined per grid step)
    crop_ref,  # (1, 3, CH, CW) f32 VMEM: this item's image crop — or, in
    #           chunk mode, (1, 1, 3, CH, CW): this CHUNK's image window
    # outputs
    out_ref,  # (1, 8, PC) f32 VMEM block: rows 0-2 = RGB, row 3 = valid,
    #           rows 4-7 = padding.  One full-tile store per chunk (earlier
    #           versions used 8-row slots per channel because single-row
    #           stores at odd sublane offsets mis-lower on TPU; packing
    #           RGB+valid into ONE aligned (8, PC) store cuts the kernel's
    #           HBM output traffic 4x — it was the gather's actual
    #           bottleneck, not the interpolation matmul)
    *,
    D: int,
    s: float,
    CH: int,
    CW: int,
    PC: int,
    H: int,
    W: int,
    chunk_mode: bool = False,
):
    item = pl.program_id(0)
    ci = pl.program_id(1)  # point-chunk index (grid dim 1)
    if chunk_mode:
        # r4 chunk sub-windows: each grid step's PC points are a thin
        # voxel slab whose projected footprint is a fraction of the
        # cube's; the streamed block is the slab's own (CH, CW) image
        # window (computed in XLA at pixel granularity — in-kernel pl.ds
        # sub-slicing is not an option: Mosaic requires statically-aligned
        # sublane starts).  The interpolation cost per point is the
        # window AREA, so this cuts the kernel's MXU+VPU work by the
        # slab/cube footprint area ratio.
        v0 = window_ref[item, 2 * ci]
        u0 = window_ref[item, 2 * ci + 1]
    else:
        v0 = window_ref[item, 0]
        u0 = window_ref[item, 1]

    # 3x4 projection matrix + cube origin as SMEM scalars
    Pm = [
        [Pm_ref[item, r * 4 + c] for c in range(4)] for r in range(3)
    ]
    origin = [origin_ref[item, a] for a in range(3)]

    if True:
        q0 = ci * PC
        q = q0 + jax.lax.broadcasted_iota(jnp.int32, (1, PC), 1)  # (1, PC)
        i = q // (D * D)
        j = (q // D) % D
        k = q % D
        fx = origin[0] + s * (i.astype(jnp.float32) + 0.5)
        fy = origin[1] + s * (j.astype(jnp.float32) + 0.5)
        fz = origin[2] + s * (k.astype(jnp.float32) + 0.5)

        num_u = Pm[0][0] * fx + Pm[0][1] * fy + Pm[0][2] * fz + Pm[0][3]
        num_v = Pm[1][0] * fx + Pm[1][1] * fy + Pm[1][2] * fz + Pm[1][3]
        den = Pm[2][0] * fx + Pm[2][1] * fy + Pm[2][2] * fz + Pm[2][3]
        # Mosaic lowers plain f32 division to a ~2^-8 approximate
        # reciprocal; at u ~ 10^3 px that is a 1-3 PIXEL sampling error.
        # Use the exact-mode reciprocal plus one Newton-Raphson refinement.
        d = den + 1e-8
        inv = pl.reciprocal(d, approx=False)
        inv = inv * (2.0 - d * inv)
        u = num_u * inv  # (1, PC) global pixel coords
        v = num_v * inv

        infront = den > 0.0
        in_img = (
            (u >= 0.0) & (u <= W - 1.0) & (v >= 0.0) & (v <= H - 1.0)
        )
        u_loc = u - u0.astype(jnp.float32)
        v_loc = v - v0.astype(jnp.float32)
        in_crop = (
            (u_loc >= 0.0)
            & (u_loc <= CW - 1.0)
            & (v_loc >= 0.0)
            & (v_loc <= CH - 1.0)
        )
        ok = (infront & in_img & in_crop).astype(jnp.float32)  # (1, PC)

        # hat weights: (CH, PC) and (CW, PC).  iota must be integer on TPU.
        hrow = jax.lax.broadcasted_iota(jnp.int32, (CH, PC), 0).astype(
            jnp.float32
        )
        hatV = jnp.maximum(0.0, 1.0 - jnp.abs(v_loc - hrow))
        wrow = jax.lax.broadcasted_iota(jnp.int32, (CW, PC), 0).astype(
            jnp.float32
        )
        hatW = jnp.maximum(0.0, 1.0 - jnp.abs(u_loc - wrow))

        # per channel: (CH, CW) x (CH, PC) -> (CW, PC) on the MXU
        # (contraction over CH = rows of both operands), then a VPU
        # multiply-reduce over CW against hatW.  The matmul runs at the
        # crop dtype (bf16 by default: f32 MXU matmuls cost ~6 bf16 passes
        # and this contraction is the kernel's entire FLOP budget; the
        # sources are 8-bit images, so bf16's 8-bit mantissa loses nothing)
        # with f32 accumulation.  int8 crops (callers quantize [0,1] images
        # by x127) double the MXU rate again on v5e (394 int8 TOPS vs 197
        # bf16): the hat row weights are quantized to 7 bits in-kernel and
        # the int32 product is dequantized by 1/127^2 — max color error vs
        # the f32 oracle stays ~1% of full scale, same class as bf16.
        dt = crop_ref.dtype
        int8_mode = dt == jnp.int8
        rows = []
        if int8_mode:
            hatVc = jnp.round(hatV * 127.0).astype(jnp.int8)
            dequant = 1.0 / (127.0 * 127.0)
        else:
            hatVc = hatV.astype(dt)
        for c in range(3):
            if chunk_mode:
                plane = crop_ref[0, 0, c]  # (CH, CW) chunk window
            else:
                plane = crop_ref[0, c]  # (CH, CW)
            T = jax.lax.dot_general(
                plane,
                hatVc,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=(
                    jnp.int32 if int8_mode else jnp.float32
                ),
            )  # (CW, PC)
            if int8_mode:
                T = T.astype(jnp.float32) * dequant
            val = jnp.sum(T * hatW, axis=0, keepdims=True)  # (1, PC)
            rows.append(val * ok)
        rows.append(ok)
        out_ref[0] = jnp.concatenate(
            rows + [jnp.zeros((4, PC), jnp.float32)], axis=0
        )  # (8, PC)


def _warp_kernel_fused(
    # scalar prefetch (SMEM)
    window_ref,  # (B, 2) int32: crop origin (v0, u0) per item
    Pm_ref,  # (B, 12) f32
    origin_ref,  # (B, 3) f32
    # inputs
    crop_ref,  # (1, 3, CH, CW) VMEM: this item's crop
    # outputs
    out_ref,  # (1, 8, D^3) f32 VMEM: the item's ENTIRE output
    *,
    D: int,
    s: float,
    CH: int,
    CW: int,
    PC: int,
    H: int,
    W: int,
):
    """1D-grid variant: ONE grid step per item; the point chunks run as a
    fully-unrolled in-kernel loop with static store offsets.

    The 2D (item, chunk) grid pays a fixed per-grid-step cost (grid
    sequencing + block DMA bookkeeping) measured at ~2 us on v5e — at
    32 chunks/item that floor IS the gather's cost (the interpolation
    math is cheaper than the steps).  Fusing the chunk loop into the
    kernel leaves one step per item: the crop is fetched once, every
    chunk's q0/iota/store offset is a compile-time constant, and the
    only per-item output is a single (8, D^3) store.  VMEM bounds this
    to D^3 <= 32^3 (1 MB out block); larger cubes go through sub-cube
    tiling (gather_tile_d), which the production sweep already does.
    """
    item = pl.program_id(0)
    v0 = window_ref[item, 0]
    u0 = window_ref[item, 1]
    Pm = [
        [Pm_ref[item, r * 4 + c] for c in range(4)] for r in range(3)
    ]
    origin = [origin_ref[item, a] for a in range(3)]
    dt = crop_ref.dtype
    int8_mode = dt == jnp.int8

    for ci in range(D * D * D // PC):
        q0 = ci * PC  # static
        q = q0 + jax.lax.broadcasted_iota(jnp.int32, (1, PC), 1)
        i = q // (D * D)
        j = (q // D) % D
        k = q % D
        fx = origin[0] + s * (i.astype(jnp.float32) + 0.5)
        fy = origin[1] + s * (j.astype(jnp.float32) + 0.5)
        fz = origin[2] + s * (k.astype(jnp.float32) + 0.5)
        num_u = Pm[0][0] * fx + Pm[0][1] * fy + Pm[0][2] * fz + Pm[0][3]
        num_v = Pm[1][0] * fx + Pm[1][1] * fy + Pm[1][2] * fz + Pm[1][3]
        den = Pm[2][0] * fx + Pm[2][1] * fy + Pm[2][2] * fz + Pm[2][3]
        d = den + 1e-8
        inv = pl.reciprocal(d, approx=False)
        inv = inv * (2.0 - d * inv)
        u = num_u * inv
        v = num_v * inv
        infront = den > 0.0
        in_img = (
            (u >= 0.0) & (u <= W - 1.0) & (v >= 0.0) & (v <= H - 1.0)
        )
        u_loc = u - u0.astype(jnp.float32)
        v_loc = v - v0.astype(jnp.float32)
        in_crop = (
            (u_loc >= 0.0)
            & (u_loc <= CW - 1.0)
            & (v_loc >= 0.0)
            & (v_loc <= CH - 1.0)
        )
        ok = (infront & in_img & in_crop).astype(jnp.float32)
        hrow = jax.lax.broadcasted_iota(jnp.int32, (CH, PC), 0).astype(
            jnp.float32
        )
        hatV = jnp.maximum(0.0, 1.0 - jnp.abs(v_loc - hrow))
        wrow = jax.lax.broadcasted_iota(jnp.int32, (CW, PC), 0).astype(
            jnp.float32
        )
        hatW = jnp.maximum(0.0, 1.0 - jnp.abs(u_loc - wrow))
        rows = []
        if int8_mode:
            hatVc = jnp.round(hatV * 127.0).astype(jnp.int8)
            dequant = 1.0 / (127.0 * 127.0)
        else:
            hatVc = hatV.astype(dt)
        for c in range(3):
            plane = crop_ref[0, c]
            T = jax.lax.dot_general(
                plane,
                hatVc,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=(
                    jnp.int32 if int8_mode else jnp.float32
                ),
            )
            if int8_mode:
                T = T.astype(jnp.float32) * dequant
            val = jnp.sum(T * hatW, axis=0, keepdims=True)
            rows.append(val * ok)
        rows.append(ok)
        out_ref[0, :, q0 : q0 + PC] = jnp.concatenate(
            rows + [jnp.zeros((4, PC), jnp.float32)], axis=0
        )


def _compute_windows(
    Ps_item: jnp.ndarray,  # (B, 3, 4)
    origins: jnp.ndarray,  # (B, 3)
    extent_mm: float,
    H: int,
    W: int,
    CH: int,
    CW: int,
) -> jnp.ndarray:
    """Crop-window origins (v0, u0) per item: projected cube bbox, clamped."""
    offs = jnp.array(
        [
            [0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
            [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1],
        ],
        jnp.float32,
    )
    corners = origins[:, None, :] + extent_mm * offs[None]  # (B, 8, 3)
    ones = jnp.ones((*corners.shape[:-1], 1), jnp.float32)
    ph = jnp.einsum(
        "bci,bji->bcj", jnp.concatenate([corners, ones], -1), Ps_item,
        precision=jax.lax.Precision.HIGHEST,
    )
    w = ph[..., 2]
    uv = ph[..., :2] / (w[..., None] + 1e-8)
    big = jnp.float32(1e9)
    u_min = jnp.min(jnp.where(w > 0, uv[..., 0], big), axis=-1)
    v_min = jnp.min(jnp.where(w > 0, uv[..., 1], big), axis=-1)
    u0 = jnp.clip(jnp.floor(u_min).astype(jnp.int32) - 1, 0, max(W - CW, 0))
    v0 = jnp.clip(jnp.floor(v_min).astype(jnp.int32) - 1, 0, max(H - CH, 0))
    return jnp.stack([v0, u0], axis=-1)


def _chunk_boxes(D: int, PC: int, n_chunks: int):
    """Static slab geometry for chunk-window mode.

    Returns (off_vox (NCh, 3) float64 voxel offsets of each chunk's box
    within the cube, ext_vox (3,) common voxel extent).  Points are
    raster-ordered (i-major) and PC divides D^3, so chunk c starts at
    voxel id c*PC: a whole number of slabs when PC >= D^2, else a j-band
    of one slab (q0 is a multiple of PC, so the band never wraps).
    """
    q0 = np.arange(n_chunks) * PC
    i0 = q0 // (D * D)
    j0 = (q0 // D) % D
    off = np.stack([i0, j0, np.zeros_like(i0)], -1).astype(np.float64)
    return off, chunk_voxel_extent(D, PC)


def _compute_chunk_windows(
    Ps_item: jnp.ndarray,  # (B, 3, 4)
    origins: jnp.ndarray,  # (B, 3)
    slab_off_mm: jnp.ndarray,  # (NCh, 3) f32
    ext_mm: Tuple[float, float, float],
    H: int,
    W: int,
    SH: int,
    SW: int,
) -> jnp.ndarray:
    """Per-(item, chunk) window origins (v0, u0): projected slab bbox.

    Same scheme as _compute_windows, at slab granularity: the bbox of the
    8 projected box corners (exact for a convex box when all corners are
    in front), anchored at floor(min)-1 for the bilinear lower neighbor,
    clamped on-image.  Points a clamped/overflowed window cannot cover
    come back invalid from the kernel — identical semantics to the
    per-item crop window.
    """
    offs = jnp.array(
        [
            [0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
            [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1],
        ],
        jnp.float32,
    )
    e = jnp.asarray(ext_mm, jnp.float32)
    corners = (
        origins[:, None, None, :]
        + slab_off_mm[None, :, None, :]
        + offs[None, None] * e[None, None, None]
    )  # (B, NCh, 8, 3)
    ones = jnp.ones((*corners.shape[:-1], 1), jnp.float32)
    ph = jnp.einsum(
        "bnci,bji->bncj", jnp.concatenate([corners, ones], -1), Ps_item,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, NCh, 8, 3)
    w = ph[..., 2]
    uv = ph[..., :2] / (w[..., None] + 1e-8)
    big = jnp.float32(1e9)
    u_min = jnp.min(jnp.where(w > 0, uv[..., 0], big), axis=-1)
    v_min = jnp.min(jnp.where(w > 0, uv[..., 1], big), axis=-1)
    u0 = jnp.clip(
        jnp.floor(u_min).astype(jnp.int32) - 1, 0, max(W - SW, 0)
    )
    v0 = jnp.clip(
        jnp.floor(v_min).astype(jnp.int32) - 1, 0, max(H - SH, 0)
    )
    return jnp.stack([v0, u0], axis=-1)  # (B, NCh, 2)


# Per-call item cap: Mosaic pads every scalar-prefetch operand to one
# 512 B sublane row per item in SMEM, so 3 operands cost ~1.5 KB/item
# against the 1 MB SMEM budget — 960 items fails to compile (OOM at
# 1.41 M) and 640 already degrades throughput (289 vs 444 cubes/s,
# measured on v5e).  320 items is the measured throughput sweet spot
# (480 KB of SMEM); larger batches are split transparently.
GATHER_ITEM_CHUNK = 320


def warp_gather_pallas(
    images: jnp.ndarray,  # (V, H, W, 3) f32
    Ps: jnp.ndarray,  # (V, 3, 4) f32
    view_idx: jnp.ndarray,  # (B,) int32
    origins: jnp.ndarray,  # (B, 3) f32
    *,
    D: int,
    s: float,
    CH: int = 192,
    CW: int = 256,
    PC: int = 0,
    interpret: bool = False,
    in_dtype=jnp.bfloat16,
    chunk_hw: Tuple[int, int] = (0, 0),
    fused: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas CVC gather for a batch of (cube, view) work items.

    PC <= 0 resolves to the measured production policy — min(D^3, 8192)
    with chunk windows, min(D^3, 1024) without — which MATCHES
    auto_chunk_hw's default window sizing; pass PC explicitly only
    together with an auto_chunk_hw(PC=...) sized for the same value.

    ``fused`` selects the 1D-grid kernel (_warp_kernel_fused): one grid
    step per item with the chunk loop unrolled in-kernel — removes the
    ~2 us/grid-step floor that dominates the 2D grid at production sizes.
    Requires D^3 <= 32768 (the per-item output block must fit VMEM).

    ``chunk_hw`` = (SH, SW) > 0 enables per-point-chunk sub-windows of the
    item crop (see _warp_kernel): the kernel's per-point cost drops from
    CH*CW to SH*SW.  Size with ``auto_chunk_hw`` for the scene's worst
    slab footprint; (0, 0) disables (full-crop behavior).

    Returns (colors (B, D, D, D, 3) f32, valid (B, D, D, D) bool).  Voxels
    whose projection falls outside the crop window are invalid (callers pick
    CH/CW to cover the footprint for their geometry; see ops/cvc.py oracle
    which has no such window).

    ``in_dtype`` is the crop-streaming/matmul dtype.  bf16 (default) halves
    the crop DMA traffic and runs the bilinear contraction at the MXU's
    native rate; max color error vs the f32 oracle is ~1% of full scale
    (the sources are 8-bit images).  ``jnp.int8`` quantizes the [0,1]
    crops and the hat weights to 7 bits and contracts int8 x int8 -> int32
    at 2x the bf16 MXU rate (v5e), same ~1% error class.  Measured on a
    v5e chip the int8 path is a WASH (15.5 ms vs bf16's 15.3 ms at
    B=224/crop 128x256 — results/gather_dtype_r03.json): the kernel is
    crop-DMA bound, not MXU bound, and int8 halves matmul time the
    pipeline already hides while adding a quantize pass.  Kept as an
    opt-in for geometries with larger crops where the matmul dominates.
    Pass ``jnp.float32`` for oracle-exact sampling.

    Batches larger than ``GATHER_ITEM_CHUNK`` items are dispatched as
    multiple kernel calls to stay inside the SMEM scalar-prefetch budget
    (see the constant's comment); results are identical.  Chunk-window
    mode carries a (2*NCh)-column window row per item in SMEM, so its
    per-call cap shrinks when NCh = D^3/PC is large.
    """
    B = view_idx.shape[0]
    chunked_mode = chunk_hw[0] > 0 and chunk_hw[1] > 0
    if PC <= 0:
        PC = min(D**3, 8192 if chunked_mode else 1024)
    if chunked_mode:
        # Mosaic scoped-VMEM guard: the kernel's matmul-form hat matrices
        # (hatV (SH, PC), hatW (SW, PC) + the (SW, PC) contraction temp)
        # scale as PC*(SH+SW).  Measured on v5e: (PC=8192, SH+SW=560)
        # allocates a 16.05 MB kernel stack vs the 16 MB scoped limit
        # (tori-geometry crops; compile failure r5).  Halve PC until the
        # calibrated estimate (3.5 B per hat element) fits with margin —
        # thinner slabs under the SAME caller-sized windows stay covered
        # (windows are recomputed per actual PC inside _warp_gather_chunk
        # and shrink monotonically with slab extent), at the cost of more
        # grid steps.
        _H, _W = images.shape[1], images.shape[2]
        _SH, _SW = min(chunk_hw[0], _H), min(chunk_hw[1], _W)
        while (
            PC > 512
            and PC * (_SH + _SW) * 3.5 > 14e6
            and (D**3) % (PC // 2) == 0
        ):
            PC //= 2
    cap = GATHER_ITEM_CHUNK
    if chunked_mode:
        n_chunks = (D * D * D) // min(PC, D * D * D)
        cap = max(
            1, min(cap, 700_000 // (1024 + max(512, 8 * n_chunks)))
        )
    if B <= cap:
        return _warp_gather_chunk(
            images, Ps, view_idx, origins, D=D, s=s, CH=CH, CW=CW, PC=PC,
            interpret=interpret, in_dtype=in_dtype, chunk_hw=chunk_hw,
            fused=fused,
        )
    cs, vs = [], []
    for b0 in range(0, B, cap):
        c, v = _warp_gather_chunk(
            images, Ps,
            view_idx[b0 : b0 + cap],
            origins[b0 : b0 + cap],
            D=D, s=s, CH=CH, CW=CW, PC=PC,
            interpret=interpret, in_dtype=in_dtype, chunk_hw=chunk_hw,
            fused=fused,
        )
        cs.append(c)
        vs.append(v)
    return jnp.concatenate(cs, axis=0), jnp.concatenate(vs, axis=0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "D", "s", "CH", "CW", "PC", "interpret", "in_dtype", "chunk_hw",
        "fused",
    ),
)
def _warp_gather_chunk(
    images: jnp.ndarray,  # (V, H, W, 3) f32
    Ps: jnp.ndarray,  # (V, 3, 4) f32
    view_idx: jnp.ndarray,  # (B,) int32
    origins: jnp.ndarray,  # (B, 3) f32
    *,
    D: int,
    s: float,
    CH: int,
    CW: int,
    PC: int,
    interpret: bool,
    in_dtype,
    chunk_hw: Tuple[int, int] = (0, 0),
    fused: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    V, H, W, _ = images.shape
    images_planar = jnp.moveaxis(images, -1, 1)  # (V, 3, H, W)
    B = view_idx.shape[0]
    D3 = D * D * D
    PC = min(PC, D3)
    if D3 % PC:
        raise ValueError(f"D^3={D3} must be divisible by PC={PC}")

    Ps_item = Ps[view_idx]  # (B, 3, 4)
    n_chunks = D3 // PC
    chunked = 0 < chunk_hw[0] and 0 < chunk_hw[1]

    # cast/quantize ONCE at image granularity, then slice windows out of
    # the cast array with a single 4D dynamic_slice per row.  (An earlier
    # form indexed images_planar[vi] inside the vmap'd slice; its batching
    # rule materializes the SELECTED IMAGE per row — B*NCh * 5.8 MB = up
    # to hundreds of GB at chunk granularity.  A 4D-start slice lowers to
    # one gather-of-slices: output-sized memory only.)
    if in_dtype == jnp.int8:
        # sources are [0,1] images (8-bit upstream); 7-bit quantization
        images_cast = jnp.round(images_planar * 127.0).astype(jnp.int8)
    else:
        images_cast = images_planar.astype(in_dtype)

    if chunked:
        # r4 chunk-window mode: one (SH, SW) image window per (item,
        # point-chunk), extracted in XLA at pixel granularity and streamed
        # as the pipeline block — the kernel's per-point cost becomes the
        # SLAB footprint area instead of the cube's (see _warp_kernel).
        SH = min(chunk_hw[0], H)
        SW = min(chunk_hw[1], W)
        off_vox, ext_vox = _chunk_boxes(D, PC, n_chunks)
        wins = _compute_chunk_windows(
            Ps_item, origins, jnp.asarray(off_vox * s, jnp.float32),
            tuple(float(e * s) for e in ext_vox), H, W, SH, SW,
        )  # (B, NCh, 2) int32 [v0, u0]

        flat_wins = wins.reshape(B * n_chunks, 2)
        flat_views = jnp.repeat(view_idx, n_chunks)

        def crop_chunk(vi, win):
            return jax.lax.dynamic_slice(
                images_cast, (vi, 0, win[0], win[1]), (1, 3, SH, SW)
            )[0]

        crops = jax.vmap(crop_chunk)(flat_views, flat_wins).reshape(
            B, n_chunks, 3, SH, SW
        )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, n_chunks),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, 3, SH, SW), lambda i, c, *_: (i, c, 0, 0, 0)
                ),
            ],
            out_specs=[
                pl.BlockSpec((1, 8, PC), lambda i, c, *_: (i, 0, c)),
            ],
        )
        kernel = functools.partial(
            _warp_kernel, D=D, s=s, CH=SH, CW=SW, PC=PC, H=H, W=W,
            chunk_mode=True,
        )
        # windows packed (B, 2*NCh) so SMEM stays one row per ITEM
        # (Mosaic pads each scalar-prefetch row to >= 512 B; a flat
        # (B*NCh, 2) layout would cost 512 B per CHUNK and blow the
        # 1 MB SMEM budget at production batch sizes).
        scalar_windows = wins.reshape(B, 2 * n_chunks)
    else:
        windows = _compute_windows(
            Ps_item, origins, D * s, H, W, CH, CW
        )  # (B, 2) int32

        # XLA-side crop extraction; the pipeline streams these per item.
        def crop_one(vi, win):
            return jax.lax.dynamic_slice(
                images_cast, (vi, 0, win[0], win[1]), (1, 3, CH, CW)
            )[0]

        crops = jax.vmap(crop_one)(view_idx, windows)  # (B, 3, CH, CW)

        if fused:
            # 1D grid: one step per ITEM, chunk loop unrolled in-kernel
            # (removes the ~2 us/grid-step floor; see _warp_kernel_fused)
            if D3 > 32768:
                raise ValueError(
                    f"fused gather needs D^3 <= 32768 (out block VMEM); "
                    f"D={D} — use sub-cube tiling (warp_gather_tiled)"
                )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec(
                        (1, 3, CH, CW), lambda i, *_: (i, 0, 0, 0)
                    ),
                ],
                out_specs=[
                    pl.BlockSpec((1, 8, D3), lambda i, *_: (i, 0, 0)),
                ],
            )
            kernel = functools.partial(
                _warp_kernel_fused, D=D, s=s, CH=CH, CW=CW, PC=PC, H=H,
                W=W,
            )
        else:
            # 2D grid: (item, point-chunk).  Output blocks are per-chunk
            # so VMEM stays bounded at any D (64^3 would need a 25 MB
            # per-item block otherwise); the crop's index map ignores the
            # chunk axis, so the pipeline fetches each item's crop once
            # and reuses it across chunks.
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(B, n_chunks),
                in_specs=[
                    pl.BlockSpec(
                        (1, 3, CH, CW), lambda i, c, *_: (i, 0, 0, 0)
                    ),
                ],
                out_specs=[
                    pl.BlockSpec((1, 8, PC), lambda i, c, *_: (i, 0, c)),
                ],
            )
            kernel = functools.partial(
                _warp_kernel, D=D, s=s, CH=CH, CW=CW, PC=PC, H=H, W=W
            )
        scalar_windows = windows

    (out,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, 8, D3), jnp.float32),
        ],
        interpret=interpret,
    )(
        scalar_windows,
        Ps_item.reshape(B, 12).astype(jnp.float32),
        origins.astype(jnp.float32),
        crops,
    )

    colors = jnp.moveaxis(out[:, :3, :], 1, -1).reshape(B, D, D, D, 3)
    validb = (out[:, 3, :] > 0.5).reshape(B, D, D, D)
    return colors, validb


def gather_tile_d(D: int) -> int:
    """Per-gather-item cube side used by ``warp_gather_tiled``.

    Large cubes are gathered as 32^3 sub-cubes: the kernel's interpolation
    cost per voxel scales with the crop area CH*CW, and a 64^3 cube's
    projected footprint is ~4x a 32^3 cube's — so tiling returns the
    per-voxel gather cost to the 32^3 level (sub-cubes sample the same
    global positions; the result is bit-identical up to crop windowing).
    Callers must size CH/CW (auto_crop_hw) for THIS tile size, not D.
    """
    if D <= 32:
        return D
    for t in (32, 16, 8, 4):
        if D % t == 0:
            return t
    return D


def warp_gather_tiled(
    images: jnp.ndarray,
    Ps: jnp.ndarray,
    view_idx: jnp.ndarray,  # (B,) int32
    origins: jnp.ndarray,  # (B, 3) f32
    *,
    D: int,
    s: float,
    CH: int = 192,
    CW: int = 256,
    PC: int = 0,
    interpret: bool = False,
    in_dtype=jnp.bfloat16,
    tile_d: int = 0,
    chunk_hw: Tuple[int, int] = (0, 0),
    fused: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``warp_gather_pallas`` with sub-cube tiling for large D (see
    ``gather_tile_d``).  One kernel program (at the tile size) is traced
    once and dispatched per octant, keeping the scalar-prefetch SMEM
    footprint per call at the small-batch level.

    tile_d > 0 overrides the default tile choice: finer tiles shrink the
    crop footprint (the kernel's per-point matmul cost is CH*CW), at the
    price of (D/tile_d)^3 kernel dispatches.  ``chunk_hw`` (auto_chunk_hw
    at the TILE size) additionally restricts each point chunk to its
    slab's footprint — the r4 production policy is tiling + chunk
    windows at PC=8192, measured fastest at both 32^3 (8.05 vs 10.8 ms
    per 160 items) and 64^3 (37.1 vs 52.0 ms per 120 items) on v5e
    (results/gather_chunk_r04.json).  PC <= 0 resolves to that policy's
    value: min(tile^3, 8192) with chunk windows, 1024 without (the 2D
    grid's hat matrices at the full crop bound VMEM otherwise).
    CH/CW must be sized for the tile (auto_crop_hw at tile_d).
    """
    td = tile_d if tile_d > 0 else gather_tile_d(D)
    if D % td:
        raise ValueError(f"tile_d={td} must divide D={D}")
    if PC <= 0:
        chunked = 0 < chunk_hw[0] and 0 < chunk_hw[1]
        PC = min(td**3, 8192 if chunked else 1024)
    if td == D:
        return warp_gather_pallas(
            images, Ps, view_idx, origins, D=D, s=s, CH=CH, CW=CW, PC=PC,
            interpret=interpret, in_dtype=in_dtype, chunk_hw=chunk_hw,
            fused=fused,
        )
    t = D // td
    B = view_idx.shape[0]
    cs, vs = [], []
    for oi in range(t):
        for oj in range(t):
            for ok in range(t):
                off = jnp.asarray(
                    [oi * td * s, oj * td * s, ok * td * s], jnp.float32
                )
                c, v = warp_gather_pallas(
                    images, Ps, view_idx, origins + off, D=td, s=s,
                    CH=CH, CW=CW, PC=PC, interpret=interpret,
                    in_dtype=in_dtype, chunk_hw=chunk_hw, fused=fused,
                )
                cs.append(c)
                vs.append(v)
    colors = (
        jnp.stack(cs, 0)
        .reshape(t, t, t, B, td, td, td, 3)
        .transpose(3, 0, 4, 1, 5, 2, 6, 7)
        .reshape(B, D, D, D, 3)
    )
    valid = (
        jnp.stack(vs, 0)
        .reshape(t, t, t, B, td, td, td)
        .transpose(3, 0, 4, 1, 5, 2, 6)
        .reshape(B, D, D, D)
    )
    return colors, valid


def auto_crop_hw(
    Ps: np.ndarray,
    bbox_min: np.ndarray,
    bbox_max: np.ndarray,
    D: int,
    s: float,
    image_hw,
    margin: float = 1.15,
):
    """Pick (CH, CW) to cover the largest cube footprint in the scene.

    The kernel's interpolation cost scales with CH*CW, so a footprint-sized
    crop (instead of the conservative 192x256 default) is a 3-10x FLOP
    saving.  Host-side, once per scene: probe cubes on a coarse grid over
    the bbox, project their corners into every view, take the maximal
    footprint extent, pad by `margin` + 2px of bilinear slack, and snap to
    the (8, 128) f32 tile.
    """
    bbox_min = np.asarray(bbox_min, np.float64)
    bbox_max = np.asarray(bbox_max, np.float64)
    H, W = image_hw
    lin = [np.linspace(bbox_min[a], bbox_max[a] - D * s, 4) for a in range(3)]
    gx, gy, gz = np.meshgrid(*lin, indexing="ij")
    origins = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    offs = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
         [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.float64
    )
    corners = origins[:, None, :] + D * s * offs[None]  # (N, 8, 3)
    ones = np.ones((*corners.shape[:-1], 1))
    ph = np.einsum(
        "nci,vji->nvcj", np.concatenate([corners, ones], -1),
        np.asarray(Ps, np.float64),
    )  # (N, V, 8, 3)
    w = ph[..., 2]
    uv = ph[..., :2] / np.where(np.abs(w[..., None]) < 1e-9, 1e-9, w[..., None])
    # only front-facing, on-screen-ish footprints count
    ok = (w > 0) & (uv[..., 0] > -W) & (uv[..., 0] < 2 * W)         & (uv[..., 1] > -H) & (uv[..., 1] < 2 * H)
    big = 1e18
    umin = np.min(np.where(ok, uv[..., 0], big), axis=-1)
    umax = np.max(np.where(ok, uv[..., 0], -big), axis=-1)
    vmin = np.min(np.where(ok, uv[..., 1], big), axis=-1)
    vmax = np.max(np.where(ok, uv[..., 1], -big), axis=-1)
    valid = ok.any(axis=-1)
    du = np.where(valid, umax - umin, 0.0).max()
    dv = np.where(valid, vmax - vmin, 0.0).max()
    CH = int(np.ceil((dv * margin + 4) / 8) * 8)
    CW = int(np.ceil((du * margin + 4) / 128) * 128)
    CH = int(np.clip(CH, 32, min(((H // 8) * 8), 512)))
    CW = int(np.clip(CW, 128, min(((W // 128) * 128), 512)))
    return CH, CW


def chunk_voxel_extent(D: int, PC: int) -> Tuple[int, int, int]:
    """Voxel extent (ei, ej, ek) of one PC-point chunk of a D-cube.

    Points are raster-ordered (i-major): a chunk of PC contiguous ids
    covers PC//D^2 full slabs when PC >= D^2, else a PC//D-row band of one
    slab.  k always spans the full cube edge (PC >= D in practice).
    """
    dd = D * D
    if PC >= dd:
        return (max(PC // dd, 1), D, D)
    return (1, max(PC // D, 1), D)


def auto_chunk_hw(
    Ps: np.ndarray,
    bbox_min: np.ndarray,
    bbox_max: np.ndarray,
    D: int,
    s: float,
    image_hw,
    PC: int = 0,
    margin: float = 1.15,
) -> Tuple[int, int]:
    """Pick (SH, SW) to cover the largest CHUNK (slab) footprint.

    PC <= 0 resolves to the gather's chunk-window policy value
    (min(D^3, 8192)) so default-sized windows always match the
    default-PC kernel; pass PC explicitly only in matched pairs.

    The r4 gather attack: the kernel's per-point interpolation cost is the
    window AREA, and one grid step's PC points are a thin slab of the
    cube — its projected footprint is a fraction of the cube's.  Probe
    slab-shaped boxes over the scene bbox (same scheme as auto_crop_hw),
    take the worst per-view bbox EDGE lengths, pad by `margin` + bilinear
    slack, snap to sublane/lane-friendly sizes.  Returns sizes capped at
    the full-crop bound; pass to warp_gather_pallas(chunk_hw=...).
    """
    bbox_min = np.asarray(bbox_min, np.float64)
    bbox_max = np.asarray(bbox_max, np.float64)
    H, W = image_hw
    if PC <= 0:
        PC = min(D**3, 8192)
    ext = np.array(chunk_voxel_extent(D, PC), np.float64) * s
    lin = [
        np.linspace(bbox_min[a], max(bbox_max[a] - ext[a], bbox_min[a]), 5)
        for a in range(3)
    ]
    gx, gy, gz = np.meshgrid(*lin, indexing="ij")
    origins = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    offs = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1],
         [1, 1, 0], [1, 0, 1], [0, 1, 1], [1, 1, 1]], np.float64
    )
    corners = origins[:, None, :] + ext[None, None, :] * offs[None]
    ones = np.ones((*corners.shape[:-1], 1))
    ph = np.einsum(
        "nci,vji->nvcj", np.concatenate([corners, ones], -1),
        np.asarray(Ps, np.float64),
    )  # (N, V, 8, 3)
    w = ph[..., 2]
    uv = ph[..., :2] / np.where(
        np.abs(w[..., None]) < 1e-9, 1e-9, w[..., None]
    )
    ok = (
        (w > 0) & (uv[..., 0] > -W) & (uv[..., 0] < 2 * W)
        & (uv[..., 1] > -H) & (uv[..., 1] < 2 * H)
    )
    big = 1e18
    umin = np.min(np.where(ok, uv[..., 0], big), axis=-1)
    umax = np.max(np.where(ok, uv[..., 0], -big), axis=-1)
    vmin = np.min(np.where(ok, uv[..., 1], big), axis=-1)
    vmax = np.max(np.where(ok, uv[..., 1], -big), axis=-1)
    valid = ok.any(axis=-1)
    du = np.where(valid, umax - umin, 0.0).max()
    dv = np.where(valid, vmax - vmin, 0.0).max()
    # +4: one bilinear neighbor each side + the kernel's floor-1 anchor.
    SH = int(np.ceil((dv * margin + 4) / 8) * 8)
    SW = int(np.ceil((du * margin + 4) / 8) * 8)
    SH = int(np.clip(SH, 8, min(512, H)))
    SW = int(np.clip(SW, 8, min(512, W)))
    return SH, SW


def build_cvc_batch_pallas(
    images: jnp.ndarray,
    Ps: jnp.ndarray,
    pair_idx: jnp.ndarray,  # (B, 2) int32
    origins: jnp.ndarray,  # (B, 3)
    D: int,
    s: float,
    center_colors: bool = True,
    interpret: bool = False,
    CH: int = 192,
    CW: int = 256,
    in_dtype=jnp.bfloat16,
    chunk_hw: Tuple[int, int] = (0, 0),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.cvc.build_cvc_batch using the kernel.

    Returns (x (B, D, D, D, 6), valid (B, D, D, D)).
    """
    B = pair_idx.shape[0]
    flat_views = pair_idx.T.reshape(-1)  # [a0..aB, b0..bB]
    flat_origins = jnp.concatenate([origins, origins], axis=0)
    colors, valid = warp_gather_tiled(
        images, Ps, flat_views.astype(jnp.int32), flat_origins,
        D=D, s=s, CH=CH, CW=CW, interpret=interpret, in_dtype=in_dtype,
        chunk_hw=chunk_hw,
    )
    ca, cb = colors[:B], colors[B:]
    va, vb = valid[:B], valid[B:]

    if center_colors:

        def center(c, v):
            denom = jnp.maximum(
                jnp.sum(v, axis=(1, 2, 3), keepdims=True), 1
            ).astype(c.dtype)
            mean = (
                jnp.sum(c * v[..., None], axis=(1, 2, 3), keepdims=True)
                / denom[..., None]
            )
            return jnp.where(v[..., None], c - mean, 0.0)

        ca = center(ca, va)
        cb = center(cb, vb)
    else:
        ca = jnp.where(va[..., None], ca, 0.0)
        cb = jnp.where(vb[..., None], cb, 0.0)

    return jnp.concatenate([ca, cb], axis=-1), va & vb
