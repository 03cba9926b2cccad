"""View-pair selection tests."""

import numpy as np
import jax.numpy as jnp

from surfacenet_tpu.ops.view_pairs import (
    candidate_pairs,
    pair_angle_weight,
    select_pairs_geometric,
    select_pairs_learned,
)


def test_candidate_pairs():
    p = candidate_pairs(4)
    assert p.shape == (6, 2)
    assert (p[:, 0] < p[:, 1]).all()


def test_angle_weight_peaks_at_preferred():
    import math

    w_pref = float(pair_angle_weight(jnp.cos(jnp.deg2rad(20.0))))
    w_zero = float(pair_angle_weight(jnp.asarray(1.0)))  # 0 degrees
    w_wide = float(pair_angle_weight(jnp.cos(jnp.deg2rad(90.0))))
    assert w_pref > w_zero
    assert w_pref > w_wide


def test_geometric_selection(sphere_scene):
    origins = np.array([[-16.0, -16.0, -16.0]])
    sel, w = select_pairs_geometric(
        sphere_scene.Ps,
        origins,
        n_pairs=3,
        image_hw=sphere_scene.images.shape[1:3],
        extent_mm=32.0,
    )
    assert sel.shape == (1, 3, 2)
    assert w.shape == (1, 3)
    assert (w >= 0).all() and w[0, 0] > 0
    # weights sorted descending (top_k order)
    assert (np.diff(w[0]) <= 1e-6).all()
    # selected views are adjacent-ish in the ring (smaller angle), not
    # opposite (180 deg apart gives near-zero weight)
    V = sphere_scene.Ps.shape[0]
    gaps = np.minimum(
        np.abs(sel[0, :, 0] - sel[0, :, 1]),
        V - np.abs(sel[0, :, 0] - sel[0, :, 1]),
    )
    assert (gaps <= 2).all()


def test_learned_selection_modulates_weights(sphere_scene):
    origins = np.array([[-16.0, -16.0, -16.0]])
    hw = sphere_scene.images.shape[1:3]
    V = sphere_scene.Ps.shape[0]
    sim = np.ones((V, V), np.float32)
    sel_g, w_g = select_pairs_geometric(
        sphere_scene.Ps, origins, 3, hw, 32.0
    )
    sel_l, w_l = select_pairs_learned(
        sphere_scene.Ps, origins, 3, hw, 32.0, sim
    )
    # similarity=1 everywhere -> identical to geometric
    assert (sel_g == sel_l).all()
    assert np.allclose(w_g, w_l, atol=1e-5)

    # zero similarity suppresses weights
    _, w_0 = select_pairs_learned(
        sphere_scene.Ps, origins, 3, hw, 32.0, np.zeros((V, V), np.float32)
    )
    assert w_0[0, 1:].max() <= 1e-6
