"""Fusion arithmetic + adaptive threshold unit tests."""

import numpy as np
import jax.numpy as jnp

from surfacenet_tpu.ops.fusion import adaptive_threshold, fuse_pairs


def test_fuse_weighted_average():
    p = jnp.stack(
        [jnp.full((4, 4, 4), 0.2), jnp.full((4, 4, 4), 0.8)]
    )
    w = jnp.array([1.0, 3.0])
    out = np.asarray(fuse_pairs(p, w))
    assert np.allclose(out, 0.65, atol=1e-6)


def test_fuse_validity_mask_drops_pairs():
    p = jnp.stack(
        [jnp.full((2, 2, 2), 0.2), jnp.full((2, 2, 2), 0.8)]
    )
    w = jnp.array([1.0, 1.0])
    valid = jnp.stack(
        [jnp.ones((2, 2, 2), bool), jnp.zeros((2, 2, 2), bool)]
    )
    out = np.asarray(fuse_pairs(p, w, valid))
    assert np.allclose(out, 0.2, atol=1e-5)


def test_fuse_all_invalid_is_zero():
    p = jnp.full((2, 3, 3, 3), 0.9)
    w = jnp.array([1.0, 1.0])
    valid = jnp.zeros((2, 3, 3, 3), bool)
    out = np.asarray(fuse_pairs(p, w, valid))
    assert np.allclose(out, 0.0)


def test_adaptive_threshold_picks_target_density():
    rng = np.random.default_rng(0)
    fused = jnp.asarray(rng.uniform(size=(8, 8, 8)).astype(np.float32))
    taus = jnp.linspace(0.1, 0.9, 9)
    # target 10% occupancy -> tau should be ~0.9
    t = float(adaptive_threshold(fused, taus, target_density=0.10))
    assert abs(t - 0.9) < 0.15
    # target 90% -> tau ~0.1
    t2 = float(adaptive_threshold(fused, taus, target_density=0.90))
    assert abs(t2 - 0.1) < 0.15


def test_adaptive_threshold_batched():
    rng = np.random.default_rng(1)
    fused = jnp.asarray(rng.uniform(size=(3, 6, 6, 6)).astype(np.float32))
    taus = jnp.linspace(0.2, 0.8, 4)
    out = adaptive_threshold(fused, taus, 0.3)
    assert out.shape == (3,)
