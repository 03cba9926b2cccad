"""Ray pooling vs a brute-force ray marcher (SURVEY.md SS4)."""

import numpy as np
import jax.numpy as jnp

from surfacenet_tpu.geometry.camera import look_at_projection, voxel_centers
from surfacenet_tpu.ops.ray_pooling import (
    ray_max_mask_single_view,
    ray_pool,
    ray_pool_batch,
)


def brute_force_ray_max(prob, origin, s, P):
    """For each voxel, check if it has max prob among voxels projecting to
    the same integer pixel (the definition of a 'ray' here)."""
    D = prob.shape[0]
    centers = np.asarray(voxel_centers(jnp.asarray(origin, jnp.float32), D, s))
    flat = centers.reshape(-1, 3).astype(np.float32)
    # match the kernel's float32 arithmetic exactly (pixel-boundary voxels
    # would otherwise fall into different buckets)
    P32 = np.asarray(P, np.float32)
    ph = (
        np.concatenate([flat, np.ones((len(flat), 1), np.float32)], -1) @ P32.T
    ).astype(np.float32)
    w = ph[:, 2]
    u = np.floor(ph[:, 0] / (w + np.float32(1e-8))).astype(int)
    v = np.floor(ph[:, 1] / (w + np.float32(1e-8))).astype(int)
    pf = prob.reshape(-1)
    mask = np.zeros(len(flat), bool)
    infront = w > 0
    from collections import defaultdict

    buckets = defaultdict(list)
    for idx in range(len(flat)):
        if infront[idx]:
            buckets[(u[idx], v[idx])].append(idx)
    for _, idxs in buckets.items():
        mx = max(pf[i] for i in idxs)
        for i in idxs:
            if pf[i] >= mx - 1e-6:
                mask[i] = True
    return mask.reshape(D, D, D)


def _camera():
    return look_at_projection(
        np.array([0.0, 0.0, -80.0]), np.zeros(3),
        np.array([0, 1.0, 0]), 120.0, (64.0, 64.0),
    )


def test_ray_max_matches_brute_force():
    rng = np.random.default_rng(0)
    D, s = 8, 2.0
    prob = rng.uniform(size=(D, D, D)).astype(np.float32)
    origin = np.array([-8.0, -8.0, -8.0], np.float32)
    P = _camera()

    ref = brute_force_ray_max(prob, origin, s, P)
    got = np.asarray(
        ray_max_mask_single_view(
            jnp.asarray(prob), jnp.asarray(origin), s,
            jnp.asarray(P, jnp.float32), raster_size=64, auto_scale=False,
        )
    )
    assert (got == ref).mean() > 0.999


def test_ray_pool_thins_along_ray():
    """A solid column of high probability along the view axis must thin to
    (approximately) a single surface voxel per ray."""
    D, s = 8, 2.0
    origin = np.array([-8.0, -8.0, -8.0], np.float32)
    P = _camera()  # looking along +z
    prob = np.full((D, D, D), 0.9, np.float32)
    # make the depth-middle slab slightly more probable: k index ~ z
    prob[:, :, 3] = 0.99

    occ, votes = ray_pool(
        jnp.asarray(prob), jnp.asarray(origin), s,
        jnp.asarray(P, jnp.float32)[None], tau=0.5, gamma=0.9,
    )
    occ = np.asarray(occ)
    # thinned: much sparser than the solid volume, concentrated at k=3
    assert occ.sum() < D * D * 2.5
    assert occ[:, :, 3].mean() > 0.5


def test_ray_pool_gamma_vote():
    """With 2 views and gamma=1.0, voxel must be ray-max in both."""
    D, s = 6, 2.0
    origin = np.array([-6.0, -6.0, -6.0], np.float32)
    P1 = _camera()
    P2 = look_at_projection(
        np.array([0.0, -80.0, 0.0]), np.zeros(3),
        np.array([0, 0, 1.0]), 120.0, (64.0, 64.0),
    )
    rng = np.random.default_rng(1)
    prob = rng.uniform(0.8, 1.0, size=(D, D, D)).astype(np.float32)

    Ps = jnp.asarray(np.stack([P1, P2]), jnp.float32)
    occ_strict, votes = ray_pool(
        jnp.asarray(prob), jnp.asarray(origin), s, Ps, tau=0.5, gamma=1.0
    )
    occ_loose, _ = ray_pool(
        jnp.asarray(prob), jnp.asarray(origin), s, Ps, tau=0.5, gamma=0.5
    )
    assert np.asarray(occ_strict).sum() <= np.asarray(occ_loose).sum()
    assert int(np.asarray(votes).max()) <= 2


def test_ray_pool_batch_shapes():
    D, s = 6, 2.0
    P = jnp.asarray(_camera(), jnp.float32)
    probs = jnp.asarray(
        np.random.default_rng(0).uniform(size=(3, D, D, D)).astype(np.float32)
    )
    origins = jnp.asarray(
        np.tile(np.array([-6.0, -6.0, -6.0], np.float32), (3, 1))
    )
    occ, votes = ray_pool_batch(
        probs, origins, s, P[None], taus=0.5, gamma=0.5
    )
    assert occ.shape == (3, D, D, D)
    assert votes.shape == (3, D, D, D)
