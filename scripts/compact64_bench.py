"""Attribute the 64^3 windowed-pool + compact residual (r3).

At 64^3 the production-parity bench pays ~62 ms/24-cube batch over the
segment+dense configuration; this times the candidate costs in isolation.

Measurement notes: timings are PIPELINED (10 async dispatches, one scalar
sync per window, fastest of 3 windows) — a per-iteration sync would put
the ~25-30 ms relay round trip on every number.  All arrays are passed as
jit ARGUMENTS: closure-captured arrays are embedded in the HLO as
literals, and a (24, 7*64^3, 3) f32 constant overflows the remote-compile
relay's request limit (HTTP 413).
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


def timeit(fn, *args, n=10, label=""):
    """Pipelined: n async dispatches, one device-scalar sync per window."""
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sums = []
        for _ in range(n):
            out = fn(*args)
            sums.append(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        float(sum(jnp.asarray(s, jnp.float32) for s in sums))
        best = min(best, (time.perf_counter() - t0) / n)
    P(f"  {label}: {best * 1000:.2f} ms")
    return best


def main():
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.ops.pallas.affine_pool import ray_vote_affine_pallas

    P(f"devices: {jax.devices()}")
    D, NC, K = 64, 24, 6
    s = 0.8
    scene = make_sphere_scene(n_views=8, hw=(600, 800), radius=30.0)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    rng = np.random.RandomState(0)
    pts = scene.surface_points(NC, seed=2)
    origins = jnp.asarray((pts - D * s / 2).astype(np.float32))
    fused = jax.random.uniform(jax.random.PRNGKey(0), (NC, D, D, D))
    pool_views = jnp.asarray(
        rng.randint(0, 8, size=(NC, K)).astype(np.int32)
    )
    vmask = jnp.ones((NC, K), bool)
    Ps_pool = Ps[pool_views]

    @functools.partial(jax.jit, static_argnames=("window",))
    def vote(f, o, Pp, vm, window):
        return ray_vote_affine_pallas(f, o, s, Pp, vm, window=window)

    timeit(vote, fused, origins, Ps_pool, vmask, 2,
           label=f"vote kernel w=2 K={K} ({NC}x{D}^3)")
    timeit(vote, fused, origins, Ps_pool, vmask, 0,
           label=f"vote kernel w=0 K={K}")

    flat = fused.reshape(NC, -1)
    occ = flat > 0.9

    for kk in (16384, 8192, 4096):
        for dt_name, caster in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):

            @functools.partial(jax.jit, static_argnames=())
            def topk(o, f, kk=kk, caster=caster):
                score = o.astype(caster) * caster(2.0) + f.astype(caster)
                return jax.lax.top_k(score, kk)[1]

            timeit(topk, occ, flat, label=f"top_k k={kk} {dt_name}")

    # record gathers at k=16384: occ/prob, then the two color gathers
    Ku = 7
    d3 = D * D * D
    colors_u = jax.random.uniform(
        jax.random.PRNGKey(1), (NC, Ku * d3, 3)
    )
    valids_u = jnp.ones((NC, Ku * d3), bool)
    top_idx = jnp.tile(jnp.arange(16384, dtype=jnp.int32)[None], (NC, 1))
    sa_b = jnp.zeros((NC, 1), jnp.int32)
    sb_b = jnp.ones((NC, 1), jnp.int32)

    @jax.jit
    def occ_prob_gathers(o, f, ti):
        return (
            jnp.take_along_axis(o, ti, axis=-1),
            jnp.take_along_axis(f, ti, axis=-1),
        )

    timeit(occ_prob_gathers, occ, flat, top_idx,
           label="occ+prob gathers k=16384")

    @jax.jit
    def color_gathers(c_src, v_src, ti, s1, s2):
        f1 = s1 * d3 + ti
        f2 = s2 * d3 + ti
        c1 = jnp.take_along_axis(c_src, f1[..., None], axis=1)
        c2 = jnp.take_along_axis(c_src, f2[..., None], axis=1)
        w1 = jnp.take_along_axis(v_src, f1, axis=1).astype(jnp.float32)
        w2 = jnp.take_along_axis(v_src, f2, axis=1).astype(jnp.float32)
        return (c1 * w1[..., None] + c2 * w2[..., None]) / jnp.maximum(
            w1 + w2, 1.0
        )[..., None]

    timeit(color_gathers, colors_u, valids_u, top_idx, sa_b, sb_b,
           label="color gathers k=16384 (f32 src)")

    @jax.jit
    def color_gathers_packed(c_src, v_src, ti, s1, s2):
        # pack RGB+valid into one u32 per voxel first (elementwise), then
        # gather u32s: 1/4 the gather bytes and half the gather count
        u8 = jnp.round(jnp.clip(c_src, 0.0, 1.0) * 255.0).astype(jnp.uint32)
        packed = (
            (u8[..., 0] << 24) | (u8[..., 1] << 16) | (u8[..., 2] << 8)
            | v_src.astype(jnp.uint32)
        )
        f1 = s1 * d3 + ti
        f2 = s2 * d3 + ti
        p1 = jnp.take_along_axis(packed, f1, axis=1)
        p2 = jnp.take_along_axis(packed, f2, axis=1)

        def unpack(p):
            c = jnp.stack(
                [(p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF],
                axis=-1,
            ).astype(jnp.float32) / 255.0
            return c, (p & 0xFF).astype(jnp.float32)

        c1, w1 = unpack(p1)
        c2, w2 = unpack(p2)
        return (c1 * w1[..., None] + c2 * w2[..., None]) / jnp.maximum(
            w1 + w2, 1.0
        )[..., None]

    timeit(color_gathers_packed, colors_u, valids_u, top_idx, sa_b, sb_b,
           label="color gathers k=16384 (packed u32)")

    # --- candidate redesign: packed int32 sort key (occ|prob_u8|vox_idx)
    # carries everything through top_k's VALUES (no occ/prob gathers), and
    # color is one u32 gather from a dense packed volume built with
    # per-cube slices (no gathers).
    idx_bits = (d3 - 1).bit_length()

    @jax.jit
    def topk_packed_key(o, f):
        prob_u8 = jnp.round(
            jnp.clip(f, 0.0, 1.0) * 255.0
        ).astype(jnp.int32)
        iota = jnp.arange(d3, dtype=jnp.int32)[None]
        key = (
            (o.astype(jnp.int32) << (idx_bits + 8))
            | (prob_u8 << idx_bits) | iota
        )
        vals, _ = jax.lax.top_k(key, 16384)
        return vals

    timeit(topk_packed_key, occ, flat,
           label=f"top_k packed-key int32 (idx_bits={idx_bits})")

    colors_u5 = colors_u.reshape(NC, Ku, D, D, D, 3)
    valids_u5 = valids_u.reshape(NC, Ku, D, D, D)

    @jax.jit
    def dense_color_pack(cu, vu, s1, s2):
        def take(arr, sl):
            return jax.vmap(lambda a, si: a[si])(arr, sl)

        c1 = take(cu, s1[:, 0])
        c2 = take(cu, s2[:, 0])
        w1 = take(vu, s1[:, 0]).astype(jnp.float32)
        w2 = take(vu, s2[:, 0]).astype(jnp.float32)
        col = (c1 * w1[..., None] + c2 * w2[..., None]) / jnp.maximum(
            w1 + w2, 1.0
        )[..., None]
        cu8 = jnp.round(
            jnp.clip(col, 0.0, 1.0) * 255.0
        ).astype(jnp.uint32)
        return (
            (cu8[..., 0] << 16) | (cu8[..., 1] << 8) | cu8[..., 2]
        ).reshape(NC, d3)

    packed_vol = dense_color_pack(colors_u5, valids_u5, sa_b, sb_b)
    timeit(dense_color_pack, colors_u5, valids_u5, sa_b, sb_b,
           label="dense color avg + u32 pack (slices)")

    @jax.jit
    def one_u32_gather(pv, ti):
        return jnp.take_along_axis(pv, ti, axis=-1)

    timeit(one_u32_gather, packed_vol, top_idx,
           label="single u32 color gather k=16384")


if __name__ == "__main__":
    main()
