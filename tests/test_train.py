"""Training-loop tests: loss decreases, checkpoints roundtrip, losses math."""

import numpy as np
import jax
import jax.numpy as jnp

from surfacenet_tpu.config import (
    Config,
    ModelConfig,
    PairNetConfig,
    TrainConfig,
    VoxelConfig,
)
from surfacenet_tpu.train.losses import class_balanced_bce
from surfacenet_tpu.train.train_pair import sample_triplets, train_pairnet
from surfacenet_tpu.train.train_surface import (
    create_train_state,
    restore_checkpoint,
    sample_training_batch,
    save_checkpoint,
    train_surfacenet,
)


def _cfg():
    return Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        model=ModelConfig.tiny(),
        pairnet=PairNetConfig(channels=(8,), embed_dim=8, patch_size=16),
        # scan_chunk=0: keep the host-sampled path covered here; the scan
        # path has its own tests below.
        train=TrainConfig(batch_size=4, lr=1e-2, n_steps=30, seed=0,
                          scan_chunk=0),
    )


def test_class_balanced_bce_weighting():
    # all-negative labels, confident-negative logits -> near-zero loss
    logits = jnp.full((1, 4, 4, 4), -10.0)
    labels = jnp.zeros((1, 4, 4, 4))
    loss = float(class_balanced_bce(logits, labels, balanced=False))
    assert loss < 1e-3
    # balanced loss with a rare positive penalizes missing it heavily
    labels2 = labels.at[0, 0, 0, 0].set(1.0)
    l_bal = float(class_balanced_bce(logits, labels2, balanced=True))
    l_unbal = float(class_balanced_bce(logits, labels2, balanced=False))
    assert l_bal > l_unbal


def test_class_balanced_bce_valid_mask():
    logits = jnp.zeros((1, 2, 2, 2))
    labels = jnp.ones((1, 2, 2, 2))
    valid = jnp.zeros((1, 2, 2, 2), bool).at[0, 0, 0, 0].set(True)
    # only one voxel counts; balanced weights degenerate gracefully
    loss = float(class_balanced_bce(logits, labels, valid, balanced=False))
    assert abs(loss - float(jnp.log(2.0))) < 1e-5


def test_sample_training_batch_near_surface(small_scene):
    cfg = _cfg()
    rng = np.random.default_rng(0)
    origins, pair_idx, labels = sample_training_batch(small_scene, cfg, rng)
    assert origins.shape == (4, 3)
    assert pair_idx.shape == (4, 2)
    assert labels.shape == (4, 16, 16, 16)
    # every sampled cube contains some surface
    assert (labels.reshape(4, -1).sum(axis=1) > 0).all()
    # positives are rare
    assert labels.mean() < 0.2
    assert (pair_idx[:, 0] != pair_idx[:, 1]).all()


def test_training_reduces_loss(small_scene):
    cfg = _cfg()
    state, log = train_surfacenet(small_scene, cfg, n_steps=30, log_every=1)
    first = np.mean(log.losses[:5])
    last = np.mean(log.losses[-5:])
    assert last < first, f"loss did not decrease: {first:.4f} -> {last:.4f}"


def test_device_sampler_labels_match_host_rule(small_scene):
    """Device-side SDF labels reproduce the host occupancy voxelization."""
    from surfacenet_tpu.train.train_surface import make_device_sampler

    cfg = _cfg()
    sampler = make_device_sampler(small_scene, cfg, n_candidates=64)
    assert sampler is not None
    cand_pts, cand_pairs, surf_fn, surf_params = sampler
    assert cand_pts.shape == (64, 3)
    assert cand_pairs.shape[0] == 64 and cand_pairs.shape[2] == 2

    D, s = cfg.voxel.cube_size, cfg.voxel.voxel_size_mm
    origins = np.asarray(cand_pts)[:8] - D * s / 2.0
    r = (np.arange(D) + 0.5) * s
    gi, gj, gk = np.meshgrid(r, r, r, indexing="ij")
    centers = origins[:, None, None, None, :] + np.stack(
        [gi, gj, gk], axis=-1
    )
    host = small_scene.occupancy(centers, s)
    dev = np.asarray(
        surf_fn(surf_params, jnp.asarray(centers, jnp.float32))
        <= s * np.sqrt(3) / 2
    )
    assert (host == dev).mean() > 0.999  # f32 boundary ties only


def test_device_sampler_tori():
    from surfacenet_tpu.data.synthetic import make_tori_scene
    from surfacenet_tpu.train.train_surface import make_device_sampler

    scene = make_tori_scene(n_views=6, hw=(60, 80))
    cfg = _cfg()
    sampler = make_device_sampler(scene, cfg, n_candidates=32)
    assert sampler is not None
    cand_pts, _, surf_fn, surf_params = sampler
    # candidate points lie on the analytic surface
    d = np.asarray(surf_fn(surf_params, cand_pts))
    assert d.max() < 1e-3


def test_train_steps_scan_deterministic_and_converges(small_scene):
    from surfacenet_tpu.train.train_surface import (
        make_device_sampler, train_steps_scan,
    )

    cfg = _cfg()
    sampler = make_device_sampler(small_scene, cfg, n_candidates=128)
    cand_pts, cand_pairs, surf_fn, surf_params = sampler
    _, state = create_train_state(cfg, jax.random.PRNGKey(0))
    images = jnp.asarray(small_scene.images, jnp.float32)
    Ps = jnp.asarray(small_scene.Ps, jnp.float32)
    kw = dict(
        surf_fn=surf_fn, K=8, batch=cfg.train.batch_size,
        D=cfg.voxel.cube_size, s=cfg.voxel.voxel_size_mm,
        balanced=True, center_colors=True,
    )
    key = jax.random.PRNGKey(7)
    s1, l1 = train_steps_scan(
        state, images, Ps, cand_pts, cand_pairs, surf_params, key, **kw
    )
    _, l2 = train_steps_scan(
        state, images, Ps, cand_pts, cand_pairs, surf_params, key, **kw
    )
    assert l1.shape == (8,)
    assert np.all(np.isfinite(np.asarray(l1)))
    assert np.allclose(np.asarray(l1), np.asarray(l2))  # same key → same run
    # chaining: second chunk continues from updated state and keeps learning
    s2, l3 = train_steps_scan(
        s1, images, Ps, cand_pts, cand_pairs, surf_params,
        jax.random.PRNGKey(8), **kw
    )
    assert int(s2.step) == int(state.step) + 16
    assert np.asarray(l3).mean() < np.asarray(l1).mean()


def test_calib_augmentation_seeded_and_effective(small_scene):
    """train.aug_calib_sigma_px (the one brittle axis of the r4
    robustness curves): per-step on-device P perturbation must be
    deterministic under the key, change the training trajectory, and
    shift projections by ~sigma pixels."""
    from surfacenet_tpu.train.train_surface import (
        make_device_sampler, perturb_calibration, train_steps_scan,
    )

    # unit: projection shift is sigma-class pixels and key-deterministic
    Ps = jnp.asarray(small_scene.Ps, jnp.float32)
    k = jax.random.PRNGKey(3)
    Pp = perturb_calibration(Ps, k, 2.0)
    assert np.allclose(
        np.asarray(perturb_calibration(Ps, k, 2.0)), np.asarray(Pp)
    )
    pts = small_scene.surface_points(100, seed=1)
    ph = np.concatenate([pts, np.ones((len(pts), 1))], axis=1)
    a = ph @ np.asarray(Ps[0]).T
    b = ph @ np.asarray(Pp[0]).T
    shift = np.linalg.norm(
        a[:, :2] / a[:, 2:3] - b[:, :2] / b[:, 2:3], axis=1
    ).mean()
    assert 0.05 * 2.0 < shift < 10.0 * 2.0  # Rayleigh(sigma)-class

    # integration: the scan path trains, stays finite, and the aug
    # actually changes the losses (same key, sigma on vs off)
    cfg = _cfg()
    sampler = make_device_sampler(small_scene, cfg, n_candidates=64)
    cand_pts, cand_pairs, surf_fn, surf_params = sampler
    _, state = create_train_state(cfg, jax.random.PRNGKey(0))
    images = jnp.asarray(small_scene.images, jnp.float32)
    kw = dict(
        surf_fn=surf_fn, K=3, batch=cfg.train.batch_size,
        D=cfg.voxel.cube_size, s=cfg.voxel.voxel_size_mm,
        balanced=True, center_colors=True,
    )
    key = jax.random.PRNGKey(7)
    _, l_off = train_steps_scan(
        state, images, Ps, cand_pts, cand_pairs, surf_params, key, **kw
    )
    _, l_on = train_steps_scan(
        state, images, Ps, cand_pts, cand_pairs, surf_params, key,
        aug_sigma_px=1.0, **kw,
    )
    _, l_on2 = train_steps_scan(
        state, images, Ps, cand_pts, cand_pairs, surf_params, key,
        aug_sigma_px=1.0, **kw,
    )
    assert np.all(np.isfinite(np.asarray(l_on)))
    assert not np.allclose(np.asarray(l_on), np.asarray(l_off))
    assert np.allclose(np.asarray(l_on), np.asarray(l_on2))


def _pc_scene(small_scene, n=4000):
    """PointCloudScene wrapping the sphere's GT samples (the DTU shape)."""
    from surfacenet_tpu.data.scene import PointCloudScene

    return PointCloudScene(
        images=small_scene.images, Ps=small_scene.Ps,
        gt_points=small_scene.surface_points(n, seed=3),
    )


def test_pool_sampler_labels_match_host_rule(small_scene):
    """Bit-packed pool labels reproduce the host occupancy voxelization."""
    from surfacenet_tpu.train.train_surface import make_pool_sampler

    cfg = _cfg()
    pc = _pc_scene(small_scene)
    origins, pairs, packed = make_pool_sampler(pc, cfg, n_pool=16)
    D, s = cfg.voxel.cube_size, cfg.voxel.voxel_size_mm
    assert origins.shape == (16, 3)
    assert packed.shape == (16, D**3 // 8)

    unpacked = np.unpackbits(
        np.asarray(packed), axis=1, bitorder="little"
    ).reshape(16, D, D, D).astype(bool)
    r = (np.arange(D) + 0.5) * s
    gi, gj, gk = np.meshgrid(r, r, r, indexing="ij")
    centers = np.asarray(origins)[:, None, None, None, :] + np.stack(
        [gi, gj, gk], axis=-1
    )
    host = pc.occupancy(centers, s)
    assert (host == unpacked).all()
    # cubes sampled near the surface actually contain labels
    assert unpacked.reshape(16, -1).sum(axis=1).min() > 0


def test_train_surfacenet_pool_path_reduces_loss(small_scene):
    """PointCloudScene routes through the pooled scan path and learns."""
    from surfacenet_tpu.data.scene import PointCloudScene

    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        model=ModelConfig.tiny(),
        train=TrainConfig(batch_size=4, lr=1e-2, n_steps=30, seed=0,
                          scan_chunk=10),
    )
    state, log = train_surfacenet(
        _pc_scene(small_scene), cfg, n_steps=30, log_every=1
    )
    assert len(log.losses) == 30
    assert np.mean(log.losses[-5:]) < np.mean(log.losses[:5])


def test_multi_scene_pool_sampler_and_training(small_scene):
    """Multi-scene scan training: union pool over stacked views, pair
    indices stay within each scene's view block (SURVEY.md C11 multi-scan
    training, now on the fast scan path)."""
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.train.train_surface import make_pool_sampler_multi

    scene2 = make_sphere_scene(n_views=4, hw=(90, 120), radius=22.0, seed=5)
    cfg = _cfg()
    images, Ps, (origins, pairs, labels) = make_pool_sampler_multi(
        [small_scene, scene2], cfg, n_pool=32
    )
    V = small_scene.images.shape[0]
    assert images.shape[0] == 2 * V and Ps.shape[0] == 2 * V
    p = np.asarray(pairs)
    n1 = p.shape[0] // 2
    assert (p[:n1] < V).all()  # scene-1 pairs index scene-1 views
    assert (p[n1:] >= V).all() and (p[n1:] < 2 * V).all()

    cfg_scan = Config(
        voxel=cfg.voxel, model=cfg.model,
        train=TrainConfig(batch_size=4, lr=1e-2, n_steps=30, seed=0,
                          scan_chunk=10),
    )
    state, log = train_surfacenet(
        [small_scene, scene2], cfg_scan, n_steps=30, log_every=1
    )
    assert len(log.losses) == 30
    assert np.mean(log.losses[-5:]) < np.mean(log.losses[:5])


def test_train_surfacenet_scan_path_reduces_loss(small_scene):
    """Driver routes through the scan path (scan_chunk>0) and still learns."""
    cfg = _cfg()
    cfg = Config(
        voxel=cfg.voxel, model=cfg.model, pairnet=cfg.pairnet,
        train=TrainConfig(batch_size=4, lr=1e-2, n_steps=30, seed=0,
                          scan_chunk=10),
    )
    state, log = train_surfacenet(small_scene, cfg, n_steps=30, log_every=1)
    assert len(log.losses) == 30
    first = np.mean(log.losses[:5])
    last = np.mean(log.losses[-5:])
    assert last < first, f"loss did not decrease: {first:.4f} -> {last:.4f}"


def test_eval_step_iou_improves_with_training(small_scene):
    """eval_step reports loss + IoU@0.5; training must improve both on a
    held-out batch."""
    from surfacenet_tpu.train.train_surface import eval_step

    cfg = _cfg()
    rng = np.random.default_rng(99)
    origins, pair_idx, labels = sample_training_batch(
        small_scene, cfg, rng, batch=8
    )
    images = jnp.asarray(small_scene.images, jnp.float32)
    Ps = jnp.asarray(small_scene.Ps, jnp.float32)
    kw = dict(D=16, s=2.0, center_colors=True)

    _, state0 = create_train_state(cfg, jax.random.PRNGKey(0))
    loss0, iou0 = eval_step(
        state0, images, Ps, jnp.asarray(origins), jnp.asarray(pair_idx),
        jnp.asarray(labels), **kw,
    )
    state1, _ = train_surfacenet(small_scene, cfg, n_steps=40, log_every=10)
    loss1, iou1 = eval_step(
        state1, images, Ps, jnp.asarray(origins), jnp.asarray(pair_idx),
        jnp.asarray(labels), **kw,
    )
    assert np.isfinite(float(loss1)) and float(loss1) < float(loss0)
    assert float(iou1) >= float(iou0)


def test_lr_decay_cosine():
    import pytest

    cfg = _cfg()
    cfg = Config(
        voxel=cfg.voxel, model=cfg.model,
        train=TrainConfig(lr=1e-2, n_steps=100, lr_decay="cosine"),
    )
    _, state = create_train_state(cfg, jax.random.PRNGKey(0))
    assert state is not None
    bad = Config(
        voxel=cfg.voxel, model=cfg.model,
        train=TrainConfig(lr_decay="linear"),
    )
    with pytest.raises(ValueError):
        create_train_state(bad, jax.random.PRNGKey(0))


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg()
    _, state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state.replace(step=7)
    save_checkpoint(str(tmp_path), state, 7)
    restored, step = restore_checkpoint(str(tmp_path), cfg)
    assert step == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_train_resume_continues(tmp_path, small_scene):
    """Kill-and-resume (SURVEY.md SS5 checkpoint/resume; VERDICT r3 next
    #5): a run killed mid-way resumes from its checkpoint with continued
    step numbering, optimizer state, checkpoint filenames, and a loss
    curve that CONTINUES (the resumed losses sit in the trained regime,
    not back at the fresh-init level)."""
    import os

    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        model=ModelConfig.tiny(),
        train=TrainConfig(
            batch_size=4, lr=1e-2, n_steps=40, seed=0, scan_chunk=5,
            checkpoint_every=10,
        ),
    )
    ck = str(tmp_path / "ck")

    # phase 1: "preempted" after 20 of 40 steps
    _, log1 = train_surfacenet(
        small_scene, cfg, n_steps=20, checkpoint_dir=ck, log_every=1
    )
    assert os.path.isdir(os.path.join(ck, "step_20"))

    # phase 2: resume to 40
    restored, step0 = restore_checkpoint(ck, cfg)
    assert step0 == 20
    state2, log2 = train_surfacenet(
        small_scene, cfg, n_steps=40, state=restored,
        checkpoint_dir=ck, log_every=1, start_step=step0,
    )
    assert log2.steps[0] == 20 and log2.steps[-1] == 39
    assert int(state2.step) == 40  # optimizer step count continued
    assert os.path.isdir(os.path.join(ck, "step_40"))
    # curve continues: first resumed losses beat the fresh-start losses
    assert np.mean(log2.losses[:5]) < np.mean(log1.losses[:5]), (
        f"resume restarted the curve: {np.mean(log2.losses[:5]):.4f} vs "
        f"fresh-start {np.mean(log1.losses[:5]):.4f}"
    )


def test_triplet_sampling_and_training(small_scene):
    cfg = _cfg()
    rng = np.random.default_rng(0)
    anc, pos, neg = sample_triplets(small_scene, cfg, rng, batch=8)
    assert anc.shape == (8, 16, 16, 3)
    assert pos.shape == neg.shape == anc.shape
    # anchors should not be blank
    assert anc.std() > 0.01

    model, variables, losses = train_pairnet(
        small_scene, cfg, n_steps=20, lr=3e-3
    )
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_pairnet_checkpoint_roundtrip(tmp_path, small_scene):
    import jax
    import numpy as np

    from surfacenet_tpu.models.pairnet import init_pairnet
    from surfacenet_tpu.train.train_pair import restore_pairnet, save_pairnet

    cfg = _cfg()
    model, variables = init_pairnet(cfg.pairnet, jax.random.PRNGKey(42))
    save_pairnet(str(tmp_path), variables, step=3)
    model2, restored = restore_pairnet(str(tmp_path), cfg, step=3)
    for a, b in zip(
        jax.tree_util.tree_leaves(variables["params"]),
        jax.tree_util.tree_leaves(restored["params"]),
    ):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_load_pretrained_shipped_weights():
    """The repo-shipped golden-sphere weights load and run."""
    import os

    import jax
    import jax.numpy as jnp

    from surfacenet_tpu.config import Config, ModelConfig, VoxelConfig
    from surfacenet_tpu.train.train_surface import load_pretrained

    path = os.path.join(os.path.dirname(__file__), "..", "weights",
                        "golden_sphere_30k")
    if not os.path.isdir(path):
        import pytest

        pytest.skip("shipped weights not present")
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=0.5, cube_size=32, overlap=8),
        model=ModelConfig(),
    )
    model, variables = load_pretrained(path, cfg)
    x = jnp.zeros((1, 32, 32, 32, 6))
    p = model.apply(variables, x, train=False)
    assert p.shape == (1, 32, 32, 32)


def test_pool_refresh_and_eval_split(small_scene, monkeypatch):
    """pool_refresh_steps rebuilds the pool mid-run (fresh cube sampling,
    SURVEY.md C11 — a fixed pool overfits long runs) and eval_every logs a
    held-out-split loss the train pool never saw (VERDICT-r2 weak #4)."""
    import surfacenet_tpu.train.train_surface as ts

    calls = []
    orig = ts.make_pool_sampler

    def counting(scene, cfg, n_pool=2048, seed=0):
        calls.append((n_pool, seed))
        return orig(scene, cfg, n_pool=n_pool, seed=seed)

    monkeypatch.setattr(ts, "make_pool_sampler", counting)

    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        model=ModelConfig.tiny(),
        train=TrainConfig(batch_size=4, lr=1e-2, n_steps=12, seed=0,
                          scan_chunk=4, pool_size=32,
                          pool_refresh_steps=8, eval_every=6),
    )
    state, log = train_surfacenet(
        _pc_scene(small_scene), cfg, n_steps=12, log_every=1
    )
    seeds = [s for _, s in calls]
    # initial train pool + held-out eval pool + >=1 mid-run refresh,
    # each from a distinct seed stream (eval split stays disjoint)
    assert len(seeds) >= 3 and len(set(seeds)) == len(seeds), seeds
    assert log.eval_steps and len(log.eval_steps) == len(log.eval_losses)
    assert all(np.isfinite(v) for v in log.eval_losses), log.eval_losses
    assert len(log.losses) == 12
