"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md SS4)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from surfacenet_tpu.parallel.halo import halo_exchange
from surfacenet_tpu.parallel.mesh import (
    block_sharded,
    cube_sharded,
    make_mesh,
    replicated,
)


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.devices.shape == (1, 8)
    m2 = make_mesh(n_block=2)
    assert m2.devices.shape == (2, 4)
    assert m2.axis_names == ("block", "cube")


def test_halo_exchange_correctness():
    m = make_mesh(n_block=4)
    Z = 16  # 4 voxels per block
    vol = jnp.arange(Z * 4 * 4, dtype=jnp.float32).reshape(Z, 4, 4)
    vol = jax.device_put(vol, NamedSharding(m, P("block")))
    out = np.asarray(halo_exchange(m, vol, halo=1))
    ref = np.arange(Z * 4 * 4, dtype=np.float32).reshape(Z, 4, 4)

    # per-block local result: [below slab | local 4 | above slab]
    for b in range(4):
        lo, hi = b * 4, (b + 1) * 4
        below = ref[lo - 1 : lo] if b > 0 else np.zeros((1, 4, 4))
        above = ref[hi : hi + 1] if b < 3 else np.zeros((1, 4, 4))
        expected = np.concatenate([below, ref[lo:hi], above], axis=0)
        got = out[b * 6 : (b + 1) * 6]
        assert np.allclose(got, expected), f"block {b}"


def test_halo_exchange_width2():
    m = make_mesh(n_block=2)
    vol = jnp.arange(8 * 2 * 2, dtype=jnp.float32).reshape(8, 2, 2)
    vol = jax.device_put(vol, NamedSharding(m, P("block")))
    out = np.asarray(halo_exchange(m, vol, halo=2))
    ref = np.asarray(vol)
    exp0 = np.concatenate([np.zeros((2, 2, 2)), ref[0:4], ref[4:6]], axis=0)
    exp1 = np.concatenate([ref[2:4], ref[4:8], np.zeros((2, 2, 2))], axis=0)
    assert np.allclose(out[:8], exp0)
    assert np.allclose(out[8:], exp1)


def test_sharded_cube_batch_matches_single_device(small_scene):
    """The sweep's device program must give identical results when its cube
    batch is sharded across the 8-device mesh."""
    from surfacenet_tpu.config import Config, FusionConfig, VoxelConfig
    from surfacenet_tpu.ops.view_pairs import select_pairs_geometric
    from surfacenet_tpu.pipeline.sweep import (
        cube_batch_step,
        photoconsistency_predictor,
    )

    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        fusion=FusionConfig(n_view_pairs=2, tau=0.3, gamma=0.6),
    )
    hw = small_scene.images.shape[1:3]
    origins = np.stack(
        [
            [-16.0, -16.0, -16.0], [0.0, -16.0, -16.0],
            [-16.0, 0.0, -16.0], [0.0, 0.0, -16.0],
            [-16.0, -16.0, 0.0], [0.0, -16.0, 0.0],
            [-16.0, 0.0, 0.0], [0.0, 0.0, 0.0],
        ],
        axis=0,
    ).astype(np.float32)
    pair_idx, pair_w = select_pairs_geometric(
        small_scene.Ps, origins, 2, hw, extent_mm=32.0
    )

    kw = dict(
        D=16, s=2.0, n_pairs=2, tau=0.3, gamma=0.6, adaptive=False,
        center_colors=True, predict=photoconsistency_predictor,
    )
    images = jnp.asarray(small_scene.images, jnp.float32)
    Ps = jnp.asarray(small_scene.Ps, jnp.float32)

    occ1, fused1, color1 = cube_batch_step(
        images, Ps, jnp.asarray(origins), jnp.asarray(pair_idx),
        jnp.asarray(pair_w), **kw,
    )

    mesh = make_mesh()
    shard = cube_sharded(mesh)
    rep = replicated(mesh)
    occ2, fused2, color2 = cube_batch_step(
        jax.device_put(images, rep),
        jax.device_put(Ps, rep),
        jax.device_put(jnp.asarray(origins), shard),
        jax.device_put(jnp.asarray(pair_idx), shard),
        jax.device_put(jnp.asarray(pair_w), shard),
        **kw,
    )
    assert np.array_equal(np.asarray(occ1), np.asarray(occ2))
    assert np.allclose(np.asarray(fused1), np.asarray(fused2), atol=1e-5)


def test_sharded_train_step_matches_single_device(small_scene):
    """DP-sharded training step: same loss and params as unsharded."""
    from surfacenet_tpu.config import (
        Config, ModelConfig, TrainConfig, VoxelConfig,
    )
    from surfacenet_tpu.train.train_surface import (
        create_train_state,
        sample_training_batch,
        train_step,
    )

    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        model=ModelConfig.tiny(),
        train=TrainConfig(batch_size=8, lr=1e-2, seed=0),
    )
    rng = np.random.default_rng(0)
    origins, pair_idx, labels = sample_training_batch(small_scene, cfg, rng)
    images = jnp.asarray(small_scene.images, jnp.float32)
    Ps = jnp.asarray(small_scene.Ps, jnp.float32)
    kw = dict(D=16, s=2.0, balanced=True, center_colors=True)

    _, state1 = create_train_state(cfg, jax.random.PRNGKey(0))
    s1, loss1 = train_step(
        state1, images, Ps, jnp.asarray(origins), jnp.asarray(pair_idx),
        jnp.asarray(labels), **kw,
    )

    mesh = make_mesh()
    shard = cube_sharded(mesh)
    rep = replicated(mesh)
    _, state2 = create_train_state(cfg, jax.random.PRNGKey(0))
    state2 = jax.device_put(state2, rep)
    s2, loss2 = train_step(
        state2,
        jax.device_put(images, rep),
        jax.device_put(Ps, rep),
        jax.device_put(jnp.asarray(origins), shard),
        jax.device_put(jnp.asarray(pair_idx), shard),
        jax.device_put(jnp.asarray(labels), shard),
        **kw,
    )
    # cross-shard reduction order differs; allow float noise
    assert abs(float(loss1) - float(loss2)) < 1e-3
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_train_steps_scan_sharded_matches_unsharded(small_scene):
    """Scan-chained training with the minibatch dp-sharded over the mesh
    reproduces the unsharded run (same PRNG key -> same sampled batches;
    XLA inserts the grad all-reduce from the sharding constraint)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from surfacenet_tpu.config import Config, ModelConfig, TrainConfig, VoxelConfig
    from surfacenet_tpu.parallel.mesh import cube_sharded, make_mesh, replicated
    from surfacenet_tpu.train.train_surface import (
        create_train_state, make_device_sampler, train_steps_scan,
    )

    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        model=ModelConfig.tiny(),
        train=TrainConfig(batch_size=8, lr=1e-2, seed=0),
    )
    cand_pts, cand_pairs, surf_fn, surf_params = make_device_sampler(
        small_scene, cfg, n_candidates=64
    )
    images = jnp.asarray(small_scene.images, jnp.float32)
    Ps = jnp.asarray(small_scene.Ps, jnp.float32)
    kw = dict(
        surf_fn=surf_fn, K=3, batch=8, D=16, s=2.0,
        balanced=True, center_colors=True,
    )
    key = jax.random.PRNGKey(5)

    _, state1 = create_train_state(cfg, jax.random.PRNGKey(0))
    s1, l1 = train_steps_scan(
        state1, images, Ps, cand_pts, cand_pairs, surf_params, key, **kw
    )

    mesh = make_mesh()
    rep = replicated(mesh)
    _, state2 = create_train_state(cfg, jax.random.PRNGKey(0))
    s2, l2 = train_steps_scan(
        jax.device_put(state2, rep),
        jax.device_put(images, rep),
        jax.device_put(Ps, rep),
        jax.device_put(cand_pts, rep),
        jax.device_put(cand_pairs, rep),
        jax.device_put(surf_params, rep),
        key,
        batch_sharding=cube_sharded(mesh),
        **kw,
    )
    assert np.allclose(np.asarray(l1), np.asarray(l2), atol=1e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_train_surfacenet_mesh_driver(small_scene):
    """train_surfacenet(mesh=...) reproduces the single-device run."""
    import jax
    import numpy as np

    from surfacenet_tpu.config import Config, ModelConfig, TrainConfig, VoxelConfig
    from surfacenet_tpu.parallel.mesh import make_mesh
    from surfacenet_tpu.train.train_surface import train_surfacenet

    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        model=ModelConfig.tiny(),
        train=TrainConfig(batch_size=8, lr=1e-2, n_steps=6, seed=0,
                          scan_chunk=3),
    )
    s1, log1 = train_surfacenet(small_scene, cfg, log_every=1)
    s2, log2 = train_surfacenet(small_scene, cfg, log_every=1,
                                mesh=make_mesh())
    assert np.allclose(log1.losses, log2.losses, atol=1e-3)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_train_surfacenet_mesh_driver_validates():
    import pytest

    from surfacenet_tpu.config import Config, ModelConfig, TrainConfig, VoxelConfig
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.parallel.mesh import make_mesh
    from surfacenet_tpu.train.train_surface import train_surfacenet

    scene = make_sphere_scene(n_views=4, hw=(60, 80))
    base = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        model=ModelConfig.tiny(),
    )
    mesh = make_mesh()
    with pytest.raises(ValueError, match="multiple"):
        train_surfacenet(
            scene,
            Config(voxel=base.voxel, model=base.model,
                   train=TrainConfig(batch_size=3, scan_chunk=2)),
            n_steps=2, mesh=mesh,
        )
    with pytest.raises(ValueError, match="scan path"):
        train_surfacenet(
            scene,
            Config(voxel=base.voxel, model=base.model,
                   train=TrainConfig(batch_size=8, scan_chunk=0)),
            n_steps=2, mesh=mesh,
        )


def test_train_surfacenet_mesh_multi_scene(small_scene):
    """mesh + multi-scene union pool: dp training over stacked views."""
    import numpy as np

    from surfacenet_tpu.config import Config, ModelConfig, TrainConfig, VoxelConfig
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.parallel.mesh import make_mesh
    from surfacenet_tpu.train.train_surface import train_surfacenet

    scene2 = make_sphere_scene(n_views=4, hw=(90, 120), radius=22.0, seed=5)
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        model=ModelConfig.tiny(),
        train=TrainConfig(batch_size=8, lr=1e-2, n_steps=4, seed=0,
                          scan_chunk=2),
    )
    state, log = train_surfacenet(
        [small_scene, scene2], cfg, log_every=1, mesh=make_mesh()
    )
    assert len(log.losses) == 4
    assert np.all(np.isfinite(log.losses))
