"""Native C++ merge vs the numpy reference implementation."""

import numpy as np
import pytest

from surfacenet_tpu.native import load, native_merge
from surfacenet_tpu.pipeline.sparse import CubeResult, SparseCubeStore


pytestmark = pytest.mark.skipif(
    load() is None, reason="native library unavailable (no g++?)"
)


def _rand_store(seed, ledger=None, native=True):
    rng = np.random.default_rng(seed)
    st = SparseCubeStore(
        scene_origin=np.zeros(3), voxel_size_mm=1.0, cube_size=8, stride=6,
        ledger_path=ledger,
    )
    for g in [(0, 0, 0), (1, 0, 0), (0, 1, 0), (1, 1, 0)]:
        occ = rng.uniform(size=(8, 8, 8)) < 0.15
        prob = rng.uniform(0.5, 1.0, (8, 8, 8)).astype(np.float32)
        color = rng.uniform(0, 1, (8, 8, 8, 3)).astype(np.float32)
        st.add(CubeResult(g, occ, prob, color))
    return st


def test_native_matches_numpy_merge(monkeypatch):
    st = _rand_store(0)

    pts_n, probs_n, colors_n = st.merge(occupancy_vote=0.5)

    # force the numpy path
    import surfacenet_tpu.pipeline.sparse as sparse_mod

    monkeypatch.setattr(
        "surfacenet_tpu.native.native_merge", lambda *a, **k: None
    )
    pts_p, probs_p, colors_p = st.merge(occupancy_vote=0.5)

    assert len(pts_n) == len(pts_p)
    # order-independent comparison
    kn = np.lexsort(pts_n.T)
    kp = np.lexsort(pts_p.T)
    assert np.allclose(pts_n[kn], pts_p[kp], atol=1e-5)
    assert np.allclose(probs_n[kn], probs_p[kp], atol=1e-5)
    assert np.allclose(colors_n[kn], colors_p[kp], atol=1e-5)


def test_native_vote_threshold(monkeypatch):
    st = _rand_store(1)
    lo = st.merge(occupancy_vote=0.3)[0]
    hi = st.merge(occupancy_vote=0.9)[0]
    assert len(hi) <= len(lo)


def test_native_merge_direct():
    coords = np.array([[0, 0, 0], [0, 0, 0], [5, 5, 5]], np.int64)
    probs = np.array([0.4, 0.8, 0.6], np.float32)
    colors = np.tile(np.array([[0.5, 0.5, 0.5]], np.float32), (3, 1))
    done = np.array([[0, 0, 0]], np.int64)
    out = native_merge(coords, probs, colors, done, stride=6, D=8,
                       vote_threshold=0.5)
    assert out is not None
    c, p, col = out
    assert len(c) == 2
    i = int(np.where((c == 0).all(axis=1))[0][0])
    assert abs(p[i] - 0.6) < 1e-6  # averaged duplicate


def test_native_merge_scales():
    """1M-record merge completes fast and matches numpy on counts."""
    import time

    rng = np.random.default_rng(0)
    n = 1_000_000
    coords = rng.integers(0, 200, (n, 3)).astype(np.int64)
    probs = rng.uniform(0.5, 1, n).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    done = np.stack(
        np.meshgrid(*([np.arange(40)] * 3), indexing="ij"), -1
    ).reshape(-1, 3).astype(np.int64)

    t0 = time.perf_counter()
    out = native_merge(coords, probs, colors, done, stride=6, D=8,
                       vote_threshold=0.0)
    dt = time.perf_counter() - t0
    assert out is not None
    c, p, col = out
    # all unique coords survive at vote 0
    assert len(c) == len(np.unique(coords, axis=0))
    assert dt < 30.0, f"native merge too slow: {dt:.1f}s"
