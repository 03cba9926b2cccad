"""End-to-end sweep with the LEARNED pair selector (pairnet -> similarity
matrix -> select_pairs_learned -> run_sweep), closing the C6/C12 loop."""

import functools

import numpy as np
import jax

from surfacenet_tpu.config import (
    Config, FusionConfig, PairNetConfig, SweepConfig, TrainConfig, VoxelConfig,
)
from surfacenet_tpu.models.pairnet import view_similarity_matrix
from surfacenet_tpu.ops.view_pairs import select_pairs_learned
from surfacenet_tpu.pipeline.sweep import photoconsistency_predictor, run_sweep
from surfacenet_tpu.train.train_pair import sample_triplets, train_pairnet


def test_learned_pair_selector_in_sweep(sphere_scene):
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        pairnet=PairNetConfig(channels=(8,), embed_dim=8, patch_size=16),
        fusion=FusionConfig(n_view_pairs=3, tau=0.25, gamma=0.6),
        sweep=SweepConfig(cube_batch=8),
        train=TrainConfig(batch_size=8, seed=0),
    )

    # quick triplet training
    model, variables, losses = train_pairnet(
        sphere_scene, cfg, n_steps=15, lr=3e-3
    )
    assert np.isfinite(losses).all()

    # per-view patches around projected surface points -> similarity matrix
    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    from surfacenet_tpu.geometry.camera import project
    from surfacenet_tpu.train.train_pair import extract_patches

    V = sphere_scene.Ps.shape[0]
    K = 4
    pts = sphere_scene.surface_points(K, seed=3)
    patches = np.zeros((V, K, 16, 16, 3), np.float32)
    for v in range(V):
        uv, w = project(
            jnp.asarray(sphere_scene.Ps[v]), jnp.asarray(pts)
        )
        patches[v] = extract_patches(
            sphere_scene.images, np.full(K, v), np.asarray(uv), 16
        )
    sim = np.asarray(view_similarity_matrix(model, variables, jnp.asarray(patches)))
    assert sim.shape == (V, V)

    selector = functools.partial(
        select_pairs_learned,
        n_pairs=cfg.fusion.n_view_pairs,
        image_hw=sphere_scene.images.shape[1:3],
        extent_mm=cfg.voxel.cube_extent_mm,
        similarity=sim,
    )
    store, stats = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor, pair_selector=selector,
    )
    pts_out, _, _ = store.merge()
    assert stats.n_cubes_nonempty > 0
    assert len(pts_out) > 100
