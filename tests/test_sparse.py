"""Sparse cube store: overlap merge, ledger resume, PLY roundtrip."""

import numpy as np

from surfacenet_tpu.pipeline.sparse import CubeResult, SparseCubeStore
from surfacenet_tpu.utils.ply import read_ply, write_ply


def _store(tmp_path=None, ledger=None, D=8, stride=6):
    return SparseCubeStore(
        scene_origin=np.zeros(3),
        voxel_size_mm=1.0,
        cube_size=D,
        stride=stride,
        ledger_path=ledger,
    )


def test_single_cube_merge():
    st = _store()
    occ = np.zeros((8, 8, 8), bool)
    occ[2, 3, 4] = True
    prob = np.zeros((8, 8, 8), np.float32)
    prob[2, 3, 4] = 0.9
    st.add(CubeResult((0, 0, 0), occ, prob))
    pts, probs, colors = st.merge()
    assert pts.shape == (1, 3)
    # world position: origin + s*(coord + 0.5)
    assert np.allclose(pts[0], [2.5, 3.5, 4.5])
    assert abs(probs[0] - 0.9) < 1e-6


def test_overlap_agreement_and_disagreement():
    """Voxel in the overlap of two cubes: both-agree survives the 0.5 vote,
    one-of-two does not."""
    D, stride = 8, 6
    st = _store(D=D, stride=stride)
    # global voxel (6, 0, 0): local (6,0,0) in cube (0,0,0) and local (0,0,0)
    # in cube (1,0,0)
    occ_a = np.zeros((D,) * 3, bool)
    occ_a[6, 0, 0] = True
    prob_a = np.full((D,) * 3, 0.0, np.float32)
    prob_a[6, 0, 0] = 0.8
    occ_b = np.zeros((D,) * 3, bool)
    occ_b[0, 0, 0] = True
    prob_b = np.zeros((D,) * 3, np.float32)
    prob_b[0, 0, 0] = 0.6

    st.add(CubeResult((0, 0, 0), occ_a, prob_a))
    st.add(CubeResult((1, 0, 0), occ_b, prob_b))
    pts, probs, _ = st.merge(occupancy_vote=0.5)
    assert len(pts) == 1
    assert np.allclose(pts[0], [6.5, 0.5, 0.5])
    assert abs(probs[0] - 0.7) < 1e-6  # averaged

    # disagreement: cube b empty -> vote 1/2 -> dropped at 0.6 vote
    st2 = _store(D=D, stride=stride)
    st2.add(CubeResult((0, 0, 0), occ_a, prob_a))
    st2.add(
        CubeResult((1, 0, 0), np.zeros((D,) * 3, bool), np.zeros((D,) * 3,
                   np.float32))
    )
    # the empty cube is recorded as done; voxel (6,0,0) gets 1 vote of 2
    pts2, _, _ = st2.merge(occupancy_vote=0.6)
    assert len(pts2) == 0
    pts3, _, _ = st2.merge(occupancy_vote=0.5)
    assert len(pts3) == 1


def test_ledger_resume(tmp_path):
    ledger = str(tmp_path / "ledger.jsonl")
    st = _store(ledger=ledger)
    occ = np.zeros((8,) * 3, bool)
    occ[1, 1, 1] = True
    prob = np.zeros((8,) * 3, np.float32)
    prob[1, 1, 1] = 0.75
    st.add(CubeResult((0, 0, 0), occ, prob))
    st.add(
        CubeResult((1, 0, 0), np.zeros((8,) * 3, bool),
                   np.zeros((8,) * 3, np.float32))
    )

    # new store resumes from ledger
    st2 = _store(ledger=ledger)
    assert st2.done_set() == {(0, 0, 0), (1, 0, 0)}
    pts, probs, _ = st2.merge()
    assert len(pts) == 1
    assert abs(probs[0] - 0.75) < 1e-3


def test_ply_roundtrip(tmp_path):
    path = str(tmp_path / "x.ply")
    rng = np.random.default_rng(0)
    pts = rng.uniform(-10, 10, (100, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (100, 3)).astype(np.float32)
    write_ply(path, pts, colors)
    rp, rc = read_ply(path)
    assert np.allclose(rp, pts, atol=1e-5)
    assert np.abs(rc.astype(float) / 255.0 - colors).max() < 0.01


def test_export_ply(tmp_path):
    st = _store()
    occ = np.zeros((8,) * 3, bool)
    occ[0, 0, 0] = occ[7, 7, 7] = True
    st.add(CubeResult((0, 0, 0), occ, np.full((8,) * 3, 0.9, np.float32)))
    n = st.export_ply(str(tmp_path / "out.ply"))
    assert n == 2
