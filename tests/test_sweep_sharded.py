"""Mesh-sharded sweep tests on the 8-device CPU mesh."""

import numpy as np

from surfacenet_tpu.config import Config, FusionConfig, SweepConfig, VoxelConfig
from surfacenet_tpu.parallel.mesh import make_mesh
from surfacenet_tpu.parallel.sweep_sharded import (
    partition_cubes,
    run_sweep_sharded,
)
from surfacenet_tpu.pipeline.sweep import photoconsistency_predictor, run_sweep


def _config():
    return Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        fusion=FusionConfig(n_view_pairs=3, tau=0.25, gamma=0.6),
        sweep=SweepConfig(cube_batch=4),
    )


def test_partition_cubes_contiguous_balanced():
    grid = np.stack(
        np.meshgrid(np.arange(4), np.arange(2), np.arange(6), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    parts = partition_cubes(grid, 4)
    assert sum(len(p) for p in parts) == len(grid)
    # balanced within 1 slab
    sizes = [len(p) for p in parts]
    assert max(sizes) - min(sizes) <= 12
    # slabs are contiguous along the longest axis (z here, extent 6)
    for p in parts[:-1]:
        zs = grid[p][:, 2]
        assert zs.max() - zs.min() <= 2


def test_sharded_sweep_matches_unsharded(sphere_scene, tmp_path):
    cfg = _config()
    store_ref, stats_ref = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor,
    )
    mesh = make_mesh(n_block=2)
    store_sh, stats_sh = run_sweep_sharded(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor, mesh=mesh,
        ledger_dir=str(tmp_path),
    )
    assert stats_sh.n_cubes_after_prefilter == stats_ref.n_cubes_after_prefilter
    assert stats_sh.cubes_per_s > 0
    assert sum(stats_sh.per_block_cubes) == stats_sh.n_cubes_after_prefilter

    p_ref, _, _ = store_ref.merge()
    p_sh, _, _ = store_sh.merge()
    # identical voxel sets (order-independent)
    a = set(map(tuple, np.round(p_ref, 3)))
    b = set(map(tuple, np.round(p_sh, 3)))
    jaccard = len(a & b) / max(len(a | b), 1)
    assert jaccard > 0.999, f"sharded result differs: jaccard={jaccard}"


def test_sharded_sweep_block_ledger_resume(sphere_scene, tmp_path):
    cfg = _config()
    mesh = make_mesh(n_block=2)
    store1, stats1 = run_sweep_sharded(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor, mesh=mesh,
        ledger_dir=str(tmp_path),
    )
    # both block ledgers written
    import os

    assert os.path.exists(tmp_path / "block_0.jsonl")
    assert os.path.exists(tmp_path / "block_1.jsonl")

    store2, stats2 = run_sweep_sharded(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor, mesh=mesh,
        ledger_dir=str(tmp_path),
    )
    assert stats2.n_rounds == 0  # everything resumed
    p1, _, _ = store1.merge()
    p2, _, _ = store2.merge()
    assert len(p1) == len(p2)


def test_sharded_truncation_refetch_per_cube(sphere_scene, tmp_path):
    """compact_k truncation in the sharded sweep re-fetches only the
    offending cubes via a process-local dense mini-dispatch; results match
    the unsharded ample-compact_k sweep exactly."""
    import dataclasses

    cfg = _config()
    store_ref, _ = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor,
    )
    cfg_small = dataclasses.replace(
        cfg, sweep=dataclasses.replace(cfg.sweep, compact_k=8)
    )
    mesh = make_mesh(n_block=2)
    store_sh, _ = run_sweep_sharded(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg_small, photoconsistency_predictor, mesh=mesh,
        ledger_dir=str(tmp_path),
    )
    p_ref, _, _ = store_ref.merge()
    p_sh, _, _ = store_sh.merge()
    a = set(map(tuple, np.round(p_ref, 3)))
    b = set(map(tuple, np.round(p_sh, 3)))
    jaccard = len(a & b) / max(len(a | b), 1)
    assert jaccard > 0.999, f"jaccard={jaccard}"


def test_sharded_consensus_fusion_matches_unsharded(sphere_scene, tmp_path):
    """fusion_mode="consensus" (r4) through the sharded path: the
    per-cube LOO-correlation reweight is pure row-wise math, so block
    sharding must reproduce the single-device result exactly."""
    import dataclasses

    cfg = _config()
    cfg = dataclasses.replace(
        cfg, fusion=dataclasses.replace(cfg.fusion, fusion_mode="consensus")
    )
    store_ref, _ = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor,
    )
    mesh = make_mesh(n_block=2)
    store_sh, _ = run_sweep_sharded(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor, mesh=mesh,
        ledger_dir=str(tmp_path),
    )
    p_ref, _, _ = store_ref.merge()
    p_sh, _, _ = store_sh.merge()
    a = set(map(tuple, np.round(p_ref, 3)))
    b = set(map(tuple, np.round(p_sh, 3)))
    jaccard = len(a & b) / max(len(a | b), 1)
    assert jaccard > 0.999, f"consensus sharded differs: jaccard={jaccard}"
