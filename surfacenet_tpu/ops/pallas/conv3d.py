"""Pallas TPU implicit-GEMM 3D convolution (SURVEY.md C5 hot spot (b)).

Why XLA's conv is below the lane ceiling here (measured, scripts/
conv_profile.py): SurfaceNet's 3x3x3 (optionally dilated) convs at small
per-block channel widths (32..300) leave XLA's general conv lowering at
~50% of the MXU lane-padding ceiling.  This kernel reformulates each conv
as ONE deep matmul per z-slab:

    im2col rows = 27 statically-shifted (y, x) views of a Zc-slab z-chunk
    (Zc*R*R, 27*Cin) @ (27*Cin, Cout)  ->  (Zc*R*R, Cout)

so the MXU contraction depth is 27*Cin (864 for a 32-channel block — 6.75
full 128-lane passes) instead of per-tap fragments, and the only data
movement is VPU-local shifts of VMEM-resident slabs.  Bias add (folded
BatchNorm, models/surfacenet.fold_bn) and ReLU are fused into the same
kernel, so a whole conv+BN+relu costs one HBM read and one write.

The z-chunk size Zc is chosen so the GEMM M dimension (Zc*R*R) reaches
>= 256 rows: at the deep blocks' 8^3 resolution a single z-slab gives only
M = 64 rows, leaving MXU M-tiles half empty — measured exactly as a 2x
loss (40% vs the 78% lane ceiling for 300ch, scripts/conv_kernel_bench.py
round 2).  Chunking z restores full M tiles without increasing the VPU
im2col copy work (still 27 window copies per z-slab).

The batch item's full volume must be VMEM-resident: the wrapper falls back
to XLA's conv when the estimated footprint exceeds the budget (e.g. the
64^3 apply's first block), keeping semantics identical either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET_BYTES = 13 * 1024 * 1024


def _lane_pad(c: int) -> int:
    return -(-c // 128) * 128


def pick_zc(R: int, cin: int, cout: int, budget: int) -> int:
    """Largest z-chunk (divisor of R) with M = Zc*R*R <= 1024 that fits."""
    best = 1
    for zc in (1, 2, 4, 8, 16):
        if R % zc or zc > R:
            continue
        if zc * R * R > 1024 and zc > 1:
            break
        if vmem_estimate(R, cin, cout, zc) <= budget:
            best = zc
    return best


def vmem_estimate(R: int, cin: int, cout: int, zc: int = 1) -> int:
    """Scoped-VMEM footprint of the resident kernel (lane-padded).

    The 2x factor is empirical: Mosaic's scoped-vmem accounting charges
    roughly two buffers for the pipelined blocks AND the scratch/
    accumulator (a compile-time OOM report at Zc=4, R=16, 80->160 showed
    19.19M ~= 2*(x+out+col+acc) + w; the Zc=1 variant of the same shape
    compiles at ~10M, consistent with this formula and not with higher
    multipliers).
    """
    x = R**3 * _lane_pad(cin) * 2
    out = R**3 * _lane_pad(cout) * 2
    col = zc * R * R * _lane_pad(27 * cin) * 2
    w = 27 * cin * _lane_pad(cout) * 2
    acc = zc * R * R * _lane_pad(cout) * 4
    return 2 * (x + out + col + acc) + w


def _conv3d_kernel(
    x_ref,  # (1, R, R, R, Cin) bf16
    w_ref,  # (27*Cin, Cout) bf16, tap-major rows (dz, dy, dx) in {-d,0,d}
    b_ref,  # (1, Cout) f32 bias (folded BN shift)
    out_ref,  # (1, R, R, R, Cout)
    col_ref,  # scratch (Zc*R*R, 27*Cin) bf16
    *,
    R: int,
    Cin: int,
    dil: int,
    relu: bool,
    Zc: int,
):
    offs = (-dil, 0, dil)

    def body(c, _):
        z0 = c * Zc
        for j in range(Zc):  # static unroll over the chunk's slabs
            z = z0 + j
            for iz, dz in enumerate(offs):
                zz = z + dz
                ok = ((zz >= 0) & (zz < R)).astype(jnp.bfloat16)
                slab = x_ref[0, jnp.clip(zz, 0, R - 1)] * ok  # (R, R, Cin)
                padded = jnp.pad(
                    slab, ((dil, dil), (dil, dil), (0, 0))
                )
                for iy, dy in enumerate(offs):
                    for ix, dx in enumerate(offs):
                        k = (iz * 3 + iy) * 3 + ix
                        col_ref[
                            j * R * R : (j + 1) * R * R,
                            k * Cin : (k + 1) * Cin,
                        ] = padded[
                            dil + dy : dil + dy + R,
                            dil + dx : dil + dx + R,
                        ].reshape(R * R, Cin)
        acc = jnp.dot(
            col_ref[:], w_ref[:], preferred_element_type=jnp.float32
        )
        acc = acc + b_ref[0][None, :]
        if relu:
            acc = jnp.maximum(acc, 0.0)
        out_ref[0, pl.ds(z0, Zc)] = acc.reshape(Zc, R, R, -1).astype(
            out_ref.dtype
        )
        return 0

    jax.lax.fori_loop(0, R // Zc, body, 0)


@functools.partial(
    jax.jit, static_argnames=("dil", "relu", "interpret")
)
def conv3d_pallas(
    x: jnp.ndarray,  # (B, R, R, R, Cin)
    w: jnp.ndarray,  # (3, 3, 3, Cin, Cout) DHWIO
    b: jnp.ndarray,  # (Cout,)
    dil: int = 1,
    relu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """SAME-padded (dilated) 3D conv + bias + optional ReLU, bf16 MXU.

    Matches jax.lax.conv_general_dilated(..., padding="SAME",
    rhs_dilation=(dil,)*3) with NDHWC/DHWIO layouts (oracle in tests).
    """
    B, R, _, _, Cin = x.shape
    Cout = w.shape[-1]
    wf = w.astype(jnp.bfloat16).reshape(27 * Cin, Cout)
    bf = b.astype(jnp.float32).reshape(1, Cout)
    Zc = pick_zc(R, Cin, Cout, VMEM_BUDGET_BYTES)

    return pl.pallas_call(
        functools.partial(
            _conv3d_kernel, R=R, Cin=Cin, dil=dil, relu=relu, Zc=Zc
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, R, R, R, Cin),
                lambda i: (i, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, R, R, R, Cout),
            lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (B, R, R, R, Cout), jnp.bfloat16
        ),
        scratch_shapes=[
            pltpu.VMEM((Zc * R * R, 27 * Cin), jnp.bfloat16),
        ],
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wf, bf)


def conv3d_fused(
    x: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    dil: int = 1,
    relu: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """conv+bias+relu: Pallas when the volume fits VMEM, XLA otherwise."""
    B, R = x.shape[0], x.shape[1]
    Cin, Cout = w.shape[-2], w.shape[-1]
    if vmem_estimate(R, Cin, Cout) <= VMEM_BUDGET_BYTES:
        return conv3d_pallas(x, w, b, dil=dil, relu=relu, interpret=interpret)
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        window_strides=(1, 1, 1),
        padding="SAME",
        rhs_dilation=(dil,) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + b.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(jnp.bfloat16)
