"""Post-merge denoising (SURVEY.md C8 — the reference denoising.py analog):
26-connected components over merged voxel coords + cluster-size filtering,
native C++ union-find vs numpy hook-and-jump parity, and the sparse-store
integration."""

import numpy as np
import pytest

from surfacenet_tpu.ops.denoise import (
    _components_numpy,
    component_filter_mask,
    connected_components,
)


def _blob(center, n, seed):
    """A connected blob: random walk of n unique voxels from center."""
    rng = np.random.default_rng(seed)
    pts = {tuple(center)}
    cur = np.asarray(center)
    while len(pts) < n:
        step = rng.integers(-1, 2, size=3)
        cur = cur + step
        pts.add(tuple(cur))
    return np.array(sorted(pts), np.int64)


def test_two_clusters_and_speck():
    a = _blob((0, 0, 0), 50, seed=1)
    b = _blob((100, 0, 0), 20, seed=2)
    speck = np.array([[50, 50, 50]], np.int64)
    coords = np.concatenate([a, b, speck])
    labels, sizes = connected_components(coords)
    assert labels.shape == (len(coords),)
    # the speck is its own component of size 1
    assert sizes[-1] == 1
    # a and b are each fully connected internally
    assert len(set(labels[: len(a)])) == 1
    assert len(set(labels[len(a): len(a) + len(b)])) == 1
    # three distinct components
    assert len(set(labels.tolist())) == 3
    assert sizes[0] == len(a) and sizes[len(a)] == len(b)


def test_diagonal_is_connected():
    # 26-connectivity: corner-touching voxels are one component
    coords = np.array([[0, 0, 0], [1, 1, 1], [2, 2, 2]], np.int64)
    labels, sizes = connected_components(coords)
    assert len(set(labels.tolist())) == 1
    assert (sizes == 3).all()


def test_face_gap_is_disconnected():
    coords = np.array([[0, 0, 0], [0, 0, 2]], np.int64)
    labels, _ = connected_components(coords)
    assert labels[0] != labels[1]


def test_negative_coords():
    coords = np.array([[-5, -5, -5], [-5, -5, -4], [7, 0, -3]], np.int64)
    labels, sizes = connected_components(coords)
    assert labels[0] == labels[1] != labels[2]
    assert sizes[0] == 2 and sizes[2] == 1


def test_numpy_native_parity():
    rng = np.random.default_rng(0)
    blobs = [
        _blob(rng.integers(-40, 40, 3) * 3, int(n), seed=i)
        for i, n in enumerate(rng.integers(1, 60, size=12))
    ]
    coords = np.unique(np.concatenate(blobs), axis=0)
    ln, sn = _components_numpy(coords)
    from surfacenet_tpu.native import native_components

    res = native_components(coords)
    if res is None:
        pytest.skip("native library unavailable")
    lc, sc = res
    # same partition (label ids may differ): compare canonicalized labels
    def canon(lab):
        _, inv = np.unique(lab, return_inverse=True)
        first = {}
        out = np.empty(len(lab), np.int64)
        nxt = 0
        for i, v in enumerate(inv):
            if v not in first:
                first[v] = nxt
                nxt += 1
            out[i] = first[v]
        return out

    np.testing.assert_array_equal(canon(ln), canon(lc))
    np.testing.assert_array_equal(sn, sc)


def test_filter_mask_min_size_and_top():
    a = _blob((0, 0, 0), 40, seed=3)
    b = _blob((90, 0, 0), 10, seed=4)
    speck = np.array([[-50, -50, -50]], np.int64)
    coords = np.concatenate([a, b, speck])
    m = component_filter_mask(coords, min_size=5)
    assert m[: len(a)].all() and m[len(a): len(a) + len(b)].all()
    assert not m[-1]
    m_top = component_filter_mask(coords, min_size=0, keep_top=1)
    assert m_top[: len(a)].all() and not m_top[len(a):].any()
    # no-op settings keep everything
    assert component_filter_mask(coords, min_size=0).all()
    assert component_filter_mask(np.zeros((0, 3), np.int64), 10).shape == (0,)


def test_store_merge_min_component():
    from surfacenet_tpu.pipeline.sparse import CubeResult, SparseCubeStore

    D, stride = 8, 8
    store = SparseCubeStore(
        scene_origin=np.zeros(3), voxel_size_mm=1.0, cube_size=D,
        stride=stride,
    )
    occ = np.zeros((D, D, D), bool)
    occ[2, 2:6, 2:6] = True  # 16-voxel plate
    occ[6, 6, 6] = True  # floating speck
    prob = np.where(occ, 0.9, 0.0).astype(np.float32)
    store.add(CubeResult((0, 0, 0), occ, prob))

    pts_all, _, _ = store.merge()
    pts_dn, _, _ = store.merge(min_component=4)
    assert len(pts_all) == 17
    assert len(pts_dn) == 16
    # the surviving points are the plate (z = 2.5 plane in world coords)
    assert np.allclose(pts_dn[:, 0], 2.5)

    # export path carries the knob too
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "o.ply")
        n = store.export_ply(p, min_component=4)
        assert n == 16


def test_speck_between_cubes_still_denoised():
    """Clusters spanning cube boundaries count as one component."""
    from surfacenet_tpu.pipeline.sparse import CubeResult, SparseCubeStore

    D, stride = 8, 8
    store = SparseCubeStore(
        scene_origin=np.zeros(3), voxel_size_mm=1.0, cube_size=D,
        stride=stride, occupancy_vote=0.0,
    )
    # 3 voxels at the right face of cube 0 + 3 at the left face of cube 1:
    # one 6-voxel component across the boundary
    occ0 = np.zeros((D, D, D), bool)
    occ0[7, 3:6, 3] = True
    occ1 = np.zeros((D, D, D), bool)
    occ1[0, 3:6, 3] = True
    p0 = np.where(occ0, 0.8, 0.0).astype(np.float32)
    p1 = np.where(occ1, 0.8, 0.0).astype(np.float32)
    store.add(CubeResult((0, 0, 0), occ0, p0))
    store.add(CubeResult((1, 0, 0), occ1, p1))
    pts, _, _ = store.merge(min_component=5)
    assert len(pts) == 6  # survives only because the halves connect
