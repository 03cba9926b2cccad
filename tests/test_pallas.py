"""Pallas kernels vs their XLA-path oracles (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surfacenet_tpu.ops.cvc import build_cvc_batch
from surfacenet_tpu.ops.pallas.warp_gather import (
    build_cvc_batch_pallas,
    warp_gather_pallas,
)


@pytest.fixture(scope="module")
def scene():
    from surfacenet_tpu.data.synthetic import make_sphere_scene

    return make_sphere_scene(n_views=4, hw=(96, 128))


def test_warp_gather_matches_oracle(scene):
    D, s = 8, 4.0
    images = jnp.asarray(scene.images)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    origins = jnp.asarray(
        np.array(
            [[-16.0, -16.0, -16.0], [0.0, -8.0, -16.0], [-8.0, 0.0, 0.0]],
            np.float32,
        )
    )
    views = jnp.asarray(np.array([0, 1, 2], np.int32))

    colors, valid = warp_gather_pallas(
        images, Ps, views, origins, D=D, s=s, CH=96, CW=128, PC=128,
        interpret=True, in_dtype=jnp.float32,
    )

    # oracle: build_cvc (uncentered) per item
    from surfacenet_tpu.ops.cvc import build_cvc

    for b in range(3):
        ref, ref_valid = build_cvc(
            images[views[b]], Ps[views[b]], origins[b], D, s,
            center_colors=False,
        )
        got = np.asarray(colors[b])
        gv = np.asarray(valid[b])
        rv = np.asarray(ref_valid)
        # crop covers whole image here -> validity should agree
        assert (gv == rv).mean() > 0.999, f"item {b} validity mismatch"
        both = gv & rv
        assert np.abs(got[both] - np.asarray(ref)[both]).max() < 1e-4


def test_warp_gather_bf16_default_tolerance(scene):
    """The production default streams crops in bf16; colors must stay
    within ~1 LSB of an 8-bit source (<1% of full scale) of the f32
    oracle."""
    D, s = 8, 4.0
    images = jnp.asarray(scene.images)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    origins = jnp.asarray(
        np.array([[-16.0, -16.0, -16.0], [-8.0, 0.0, 0.0]], np.float32)
    )
    views = jnp.asarray(np.array([0, 2], np.int32))

    colors, valid = warp_gather_pallas(
        images, Ps, views, origins, D=D, s=s, CH=96, CW=128, PC=128,
        interpret=True,
    )

    from surfacenet_tpu.ops.cvc import build_cvc

    for b in range(2):
        ref, ref_valid = build_cvc(
            images[views[b]], Ps[views[b]], origins[b], D, s,
            center_colors=False,
        )
        gv = np.asarray(valid[b])
        rv = np.asarray(ref_valid)
        assert (gv == rv).mean() > 0.999
        both = gv & rv
        err = np.abs(np.asarray(colors[b]) - np.asarray(ref))[both]
        assert err.max() < 1e-2, f"item {b}: bf16 err {err.max()}"


def test_warp_gather_int8_tolerance(scene):
    """int8 crops + 7-bit hat weights (2x MXU rate on v5e) must stay in
    the same ~1%-of-full-scale error class as bf16 vs the f32 oracle."""
    D, s = 8, 4.0
    images = jnp.asarray(scene.images)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    origins = jnp.asarray(
        np.array([[-16.0, -16.0, -16.0], [-8.0, 0.0, 0.0]], np.float32)
    )
    views = jnp.asarray(np.array([0, 2], np.int32))

    colors, valid = warp_gather_pallas(
        images, Ps, views, origins, D=D, s=s, CH=96, CW=128, PC=128,
        interpret=True, in_dtype=jnp.int8,
    )

    from surfacenet_tpu.ops.cvc import build_cvc

    for b in range(2):
        ref, ref_valid = build_cvc(
            images[views[b]], Ps[views[b]], origins[b], D, s,
            center_colors=False,
        )
        gv = np.asarray(valid[b])
        rv = np.asarray(ref_valid)
        assert (gv == rv).mean() > 0.999
        both = gv & rv
        err = np.abs(np.asarray(colors[b]) - np.asarray(ref))[both]
        assert err.max() < 1.5e-2, f"item {b}: int8 err {err.max()}"


def test_warp_gather_chunk_windows_match_oracle(scene):
    """r4 per-chunk sub-windows (chunk_hw): the kernel restricts each
    point-chunk's interpolation to its slab's projected footprint; results
    must stay oracle-exact for both chunk geometries (j-band when
    PC < D^2, multi-slab when PC >= D^2)."""
    from surfacenet_tpu.ops.pallas.warp_gather import auto_chunk_hw

    D, s = 8, 4.0
    images = jnp.asarray(scene.images)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    rng = np.random.default_rng(7)
    B = 3
    origins = jnp.asarray(rng.uniform(-16, 0, (B, 3)).astype(np.float32))
    views = jnp.asarray(rng.integers(0, 4, B).astype(np.int32))

    from surfacenet_tpu.ops.cvc import build_cvc

    for PC in (32, 128):
        sh, sw = auto_chunk_hw(
            np.asarray(scene.Ps), [-20, -20, -20], [4, 4, 4], D, s,
            (96, 128), PC=PC,
        )
        assert sh < 96 or sw < 128  # must actually sub-window
        colors, valid = warp_gather_pallas(
            images, Ps, views, origins, D=D, s=s, CH=96, CW=128, PC=PC,
            interpret=True, in_dtype=jnp.float32, chunk_hw=(sh, sw),
        )
        gv = np.asarray(valid)
        for b in range(B):
            ref, rv = build_cvc(
                images[views[b]], Ps[views[b]], origins[b], D, s,
                center_colors=False,
            )
            rv = np.asarray(rv)
            assert (gv[b] == rv).mean() > 0.999, (PC, b)
            both = gv[b] & rv
            err = np.abs(np.asarray(colors[b]) - np.asarray(ref))[both]
            assert err.max() < 1e-4, (PC, b, err.max())


def test_build_cvc_batch_pallas_matches_oracle(scene):
    D, s = 8, 4.0
    images = jnp.asarray(scene.images)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    origins = jnp.asarray(
        np.array([[-16.0, -16.0, -16.0], [-8.0, -8.0, -8.0]], np.float32)
    )
    pair_idx = jnp.asarray(np.array([[0, 1], [2, 3]], np.int32))

    x_ref, v_ref = build_cvc_batch(
        images, Ps, pair_idx, origins, D, s, center_colors=True
    )
    x_pal, v_pal = build_cvc_batch_pallas(
        images, Ps, pair_idx, origins, D, s, center_colors=True,
        interpret=True, CH=96, CW=128, in_dtype=jnp.float32,
    )
    v_ref = np.asarray(v_ref)
    v_pal = np.asarray(v_pal)
    assert (v_ref == v_pal).mean() > 0.999
    both = v_ref & v_pal
    d = np.abs(np.asarray(x_ref) - np.asarray(x_pal))[both]
    assert d.max() < 1e-3


def test_warp_gather_64_cube(scene):
    """64^3 cubes (inference size, BASELINE config 2) through the 2D-grid
    kernel: multi-chunk outputs must agree with the oracle."""
    D, s = 64, 0.5
    images = jnp.asarray(scene.images)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    origins = jnp.asarray(np.array([[-16.0, -16.0, -16.0]], np.float32))
    views = jnp.asarray(np.array([1], np.int32))

    colors, valid = warp_gather_pallas(
        images, Ps, views, origins, D=D, s=s, CH=96, CW=128, PC=2048,
        interpret=True, in_dtype=jnp.float32,
    )
    from surfacenet_tpu.ops.cvc import build_cvc

    ref, rv = build_cvc(
        images[1], Ps[1], origins[0], D, s, center_colors=False
    )
    gv = np.asarray(valid[0])
    rv = np.asarray(rv)
    assert (gv == rv).mean() > 0.999
    both = gv & rv
    assert np.abs(np.asarray(colors[0])[both] - np.asarray(ref)[both]).max() < 1e-3


def test_warp_gather_tiled_64_matches_oracle(scene):
    """64^3 gather via 32^3 sub-cube tiling (the production large-D path):
    must agree with the oracle despite per-octant crop windows."""
    from surfacenet_tpu.ops.pallas.warp_gather import warp_gather_tiled

    D, s = 64, 0.5
    images = jnp.asarray(scene.images)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    origins = jnp.asarray(np.array([[-16.0, -16.0, -16.0]], np.float32))
    views = jnp.asarray(np.array([1], np.int32))

    colors, valid = warp_gather_tiled(
        images, Ps, views, origins, D=D, s=s, CH=96, CW=128, PC=2048,
        interpret=True, in_dtype=jnp.float32,
    )
    from surfacenet_tpu.ops.cvc import build_cvc

    ref, rv = build_cvc(
        images[1], Ps[1], origins[0], D, s, center_colors=False
    )
    gv = np.asarray(valid[0])
    rv = np.asarray(rv)
    assert (gv == rv).mean() > 0.999
    both = gv & rv
    assert np.abs(np.asarray(colors[0])[both] - np.asarray(ref)[both]).max() < 1e-3


def test_affine_pool_pallas_matches_xla(scene):
    """Pallas affine ray pool vs the XLA affine oracle (interpret mode)."""
    from surfacenet_tpu.ops.pallas.affine_pool import (
        ray_max_mask_affine_pallas,
    )
    from surfacenet_tpu.ops.ray_pooling import ray_max_mask_affine

    rng = np.random.default_rng(0)
    D, s = 16, 2.0
    N = 6
    probs = jnp.asarray(rng.uniform(size=(N, D, D, D)).astype(np.float32))
    origins = jnp.asarray(
        np.tile(np.array([-16.0, -16.0, -16.0], np.float32), (N, 1))
    )
    views = rng.integers(0, scene.Ps.shape[0], N)
    Ps = jnp.asarray(scene.Ps[views], jnp.float32)

    got = np.asarray(
        ray_max_mask_affine_pallas(probs, origins, s, Ps, interpret=True)
    )
    for i in range(N):
        ref = np.asarray(
            ray_max_mask_affine(probs[i], origins[i], s, Ps[i])
        )
        agree = (got[i] == ref).mean()
        assert agree > 0.999, f"item {i}: agreement {agree}"


def test_affine_pool_pallas_windowed_matches_xla(scene):
    """Windowed (cross-cube-consistent) Pallas pool vs the XLA oracle."""
    from surfacenet_tpu.ops.pallas.affine_pool import (
        ray_max_mask_affine_pallas,
    )
    from surfacenet_tpu.ops.ray_pooling import ray_max_mask_affine

    rng = np.random.default_rng(1)
    D, s = 16, 2.0
    N = 6
    probs = jnp.asarray(rng.uniform(size=(N, D, D, D)).astype(np.float32))
    origins = jnp.asarray(
        np.tile(np.array([-16.0, -16.0, -16.0], np.float32), (N, 1))
    )
    views = rng.integers(0, scene.Ps.shape[0], N)
    Ps = jnp.asarray(scene.Ps[views], jnp.float32)

    for window in (2, 4):
        got = np.asarray(
            ray_max_mask_affine_pallas(
                probs, origins, s, Ps, window=window, interpret=True
            )
        )
        for i in range(N):
            ref = np.asarray(
                ray_max_mask_affine(
                    probs[i], origins[i], s, Ps[i], window=window
                )
            )
            agree = (got[i] == ref).mean()
            assert agree > 0.999, f"w={window} item {i}: agreement {agree}"


def test_affine_vote_pallas_matches_mask_sum(scene):
    """Fused per-cube vote kernel vs the sum of per-view oracle masks
    (segment + windowed, with padded view slots masked out)."""
    from surfacenet_tpu.ops.pallas.affine_pool import ray_vote_affine_pallas
    from surfacenet_tpu.ops.ray_pooling import ray_max_mask_affine

    rng = np.random.default_rng(2)
    D, s = 16, 2.0
    N, K = 4, 3
    probs = jnp.asarray(rng.uniform(size=(N, D, D, D)).astype(np.float32))
    origins = jnp.asarray(
        np.tile(np.array([-16.0, -16.0, -16.0], np.float32), (N, 1))
    )
    views = rng.integers(0, scene.Ps.shape[0], (N, K))
    Ps_pool = jnp.asarray(scene.Ps[views], jnp.float32)
    view_mask = np.ones((N, K), bool)
    view_mask[0, 2] = False  # padded slots must not vote
    view_mask[3, 1] = False

    for window in (0, 2):
        got = np.asarray(
            ray_vote_affine_pallas(
                probs, origins, s, Ps_pool, jnp.asarray(view_mask),
                window=window, interpret=True,
            )
        )
        ref = np.zeros((N, D, D, D), np.int64)
        for i in range(N):
            for k in range(K):
                if view_mask[i, k]:
                    ref[i] += np.asarray(
                        ray_max_mask_affine(
                            probs[i], origins[i], s, Ps_pool[i, k],
                            window=window,
                        )
                    ).astype(np.int64)
        agree = (got == ref).mean()
        assert agree > 0.995, f"w={window}: vote agreement {agree}"


def test_cube_batch_step_tpu_native_path_interpret(scene):
    """Integration parity: the FULL fused device step on the TPU-native
    path (Pallas warp gather + affine-Pallas pooling, interpret mode)
    against the XLA-oracle path — catches crop-forwarding/tiling/pooling
    integration regressions without hardware."""
    import numpy as np

    from surfacenet_tpu.ops.view_pairs import select_pairs_geometric
    from surfacenet_tpu.pipeline.sweep import (
        cube_batch_step, photoconsistency_predictor,
    )

    D, s = 16, 2.0
    hw = scene.images.shape[1:3]
    origins = np.stack(
        [[-16.0, -16.0, -16.0], [0.0, 0.0, -16.0],
         [-16.0, 0.0, 0.0], [0.0, 0.0, 0.0]], axis=0
    ).astype(np.float32)
    pair_idx, pair_w = select_pairs_geometric(
        scene.Ps, origins, 2, hw, extent_mm=D * s
    )
    images = jnp.asarray(scene.images, jnp.float32)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    args = (
        images, Ps, jnp.asarray(origins), jnp.asarray(pair_idx),
        jnp.asarray(pair_w),
    )
    kw = dict(
        D=D, s=s, n_pairs=2, tau=0.3, gamma=0.6, adaptive=False,
        center_colors=True, predict=photoconsistency_predictor,
        n_pool_views=3,
    )
    occ_x, fused_x, _ = cube_batch_step(
        *args, ray_pool_mode="affine", **kw
    )
    occ_p, fused_p, _ = cube_batch_step(
        *args, use_pallas=True, ray_pool_mode="affine_pallas",
        pallas_interpret=True, crop_hw=(96, 128), **kw
    )
    fused_x, fused_p = np.asarray(fused_x), np.asarray(fused_p)
    occ_x, occ_p = np.asarray(occ_x), np.asarray(occ_p)
    # bf16 crop streaming shifts probabilities slightly; bound the drift
    assert np.abs(fused_x - fused_p).max() < 0.05
    assert (occ_x == occ_p).mean() > 0.995

    # gather_dtype plumbs through the jitted step as a STATIC arg (it is a
    # string; regression for the r3 int8 wiring) and the int8 path stays
    # in the bf16 error class at the step level.
    occ_i, fused_i, _ = cube_batch_step(
        *args, use_pallas=True, ray_pool_mode="affine_pallas",
        pallas_interpret=True, crop_hw=(96, 128), gather_dtype="int8",
        **kw
    )
    assert np.abs(fused_x - np.asarray(fused_i)).max() < 0.06
    assert (occ_x == np.asarray(occ_i)).mean() > 0.99

    # r4 gather chunk windows through the fused step (auto-sized like the
    # production sweep): same error class as the full-crop kernel.
    from surfacenet_tpu.ops.pallas.warp_gather import auto_chunk_hw

    chw = auto_chunk_hw(
        scene.Ps, scene.bbox_min, scene.bbox_max, D, s, hw
    )
    occ_c, fused_c, _ = cube_batch_step(
        *args, use_pallas=True, ray_pool_mode="affine_pallas",
        pallas_interpret=True, crop_hw=(96, 128), chunk_hw=chw, **kw
    )
    assert np.abs(fused_x - np.asarray(fused_c)).max() < 0.05
    assert (occ_x == np.asarray(occ_c)).mean() > 0.995


def test_warp_gather_item_chunking(scene, monkeypatch):
    """Batches beyond GATHER_ITEM_CHUNK split into multiple kernel calls
    (SMEM scalar-prefetch budget); results must equal the single-call path."""
    import surfacenet_tpu.ops.pallas.warp_gather as wg

    D, s = 8, 4.0
    images = jnp.asarray(scene.images)
    Ps = jnp.asarray(scene.Ps, jnp.float32)
    rng = np.random.default_rng(3)
    B = 11
    origins = jnp.asarray(
        rng.uniform(-16.0, 0.0, (B, 3)).astype(np.float32)
    )
    views = jnp.asarray(rng.integers(0, 4, B).astype(np.int32))
    kw = dict(D=D, s=s, CH=96, CW=128, PC=128, interpret=True,
              in_dtype=jnp.float32)

    ref_c, ref_v = warp_gather_pallas(images, Ps, views, origins, **kw)
    monkeypatch.setattr(wg, "GATHER_ITEM_CHUNK", 4)  # 11 -> 4+4+3 calls
    got_c, got_v = wg.warp_gather_pallas(images, Ps, views, origins, **kw)
    np.testing.assert_array_equal(np.asarray(ref_v), np.asarray(got_v))
    np.testing.assert_allclose(
        np.asarray(ref_c), np.asarray(got_c), atol=1e-6
    )
