"""Fault injection: crash-resilient resume + numerics sanitizers
(SURVEY.md SS5 failure-detection / sanitizer rows)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from surfacenet_tpu.pipeline.sparse import CubeResult, SparseCubeStore
from surfacenet_tpu.utils.debug import assert_all_finite, checked_fn


def _add_cube(st, g, seed=0):
    rng = np.random.default_rng(seed)
    occ = rng.uniform(size=(8, 8, 8)) < 0.1
    occ[0, 0, 0] = True
    st.add(CubeResult(g, occ, rng.uniform(0.5, 1, (8, 8, 8)).astype(
        np.float32)))


def test_resume_after_torn_ledger_write(tmp_path):
    """A process killed mid-append leaves a truncated JSON line; resume must
    skip it and redo only that cube."""
    ledger = str(tmp_path / "ledger.jsonl")
    st = SparseCubeStore(np.zeros(3), 1.0, 8, 6, ledger_path=ledger)
    _add_cube(st, (0, 0, 0), 0)
    _add_cube(st, (1, 0, 0), 1)

    # simulate the crash: truncate the last line mid-record
    raw = open(ledger).read()
    lines = raw.strip().split("\n")
    torn = "\n".join(lines[:-1]) + "\n" + lines[-1][: len(lines[-1]) // 2]
    open(ledger, "w").write(torn)

    st2 = SparseCubeStore(np.zeros(3), 1.0, 8, 6, ledger_path=ledger)
    assert st2.done_set() == {(0, 0, 0)}  # torn cube forgotten -> redo
    # and the store still merges
    pts, _, _ = st2.merge()
    assert len(pts) > 0


def test_resume_after_garbage_line(tmp_path):
    ledger = str(tmp_path / "ledger.jsonl")
    with open(ledger, "w") as f:
        f.write(json.dumps({"grid_idx": [0, 0, 0], "empty": True}) + "\n")
        f.write("not json at all\n")
        f.write(json.dumps({"grid_idx": [1, 0, 0], "empty": True}) + "\n")
    st = SparseCubeStore(np.zeros(3), 1.0, 8, 6, ledger_path=ledger)
    assert st.done_set() == {(0, 0, 0), (1, 0, 0)}


def test_checked_fn_catches_nan():
    def bad(x):
        return jnp.log(x)  # NaN for negative input

    f = checked_fn(jax.jit(bad))
    # fine on valid input
    assert np.isfinite(float(f(jnp.asarray(2.0))))
    from jax.experimental import checkify as ck

    with pytest.raises(Exception):
        f(jnp.asarray(-1.0))


def test_assert_all_finite():
    good = {"a": jnp.ones(3), "b": {"c": jnp.zeros(2)}}
    assert_all_finite(good)
    bad = {"a": jnp.asarray([1.0, float("nan")])}
    with pytest.raises(FloatingPointError, match="non-finite"):
        assert_all_finite(bad, "params")


def test_crash_mid_sweep_then_resume(tmp_path, request):
    """Simulate a host crash part-way through a sharded sweep: the process
    dies after some rounds; a fresh run resumes from the block ledgers and
    produces the complete result without redoing finished cubes."""
    small_scene = request.getfixturevalue("small_scene")
    import surfacenet_tpu.parallel.sweep_sharded as mod
    from surfacenet_tpu.config import (
        Config, FusionConfig, SweepConfig, VoxelConfig,
    )
    from surfacenet_tpu.parallel.mesh import make_mesh
    from surfacenet_tpu.pipeline.sweep import photoconsistency_predictor

    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        fusion=FusionConfig(n_view_pairs=2, tau=0.3, gamma=0.6),
        sweep=SweepConfig(cube_batch=2),
    )
    mesh = make_mesh(n_block=2)
    ledger_dir = str(tmp_path)

    # crash injection: let 3 rounds complete, then die
    real_step = mod.cube_batch_step
    calls = {"n": 0}

    def crashing_step(*a, **k):
        calls["n"] += 1
        if calls["n"] > 3:
            raise RuntimeError("injected host crash")
        return real_step(*a, **k)

    mod.cube_batch_step = crashing_step
    try:
        with pytest.raises(RuntimeError, match="injected"):
            mod.run_sweep_sharded(
                small_scene.images, small_scene.Ps,
                small_scene.bbox_min, small_scene.bbox_max,
                cfg, photoconsistency_predictor, mesh=mesh,
                ledger_dir=ledger_dir,
            )
    finally:
        mod.cube_batch_step = real_step

    # some cubes were persisted before the crash
    import glob

    assert glob.glob(ledger_dir + "/block_*.jsonl")

    # resume completes the sweep; fewer rounds than a fresh run would need
    store, stats = mod.run_sweep_sharded(
        small_scene.images, small_scene.Ps,
        small_scene.bbox_min, small_scene.bbox_max,
        cfg, photoconsistency_predictor, mesh=mesh, ledger_dir=ledger_dir,
    )
    assert len(store.done_set()) == stats.n_cubes_after_prefilter
    pts, _, _ = store.merge()
    assert len(pts) > 0
