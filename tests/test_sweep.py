"""Golden end-to-end sweep on the synthetic sphere (SURVEY.md SS4).

Uses the model-free photo-consistency predictor so the geometry + fusion +
thinning + merge pipeline is validated independently of training.
"""

import dataclasses

import numpy as np

from surfacenet_tpu.config import Config, FusionConfig, SweepConfig, VoxelConfig
from surfacenet_tpu.pipeline.sweep import (
    enumerate_cubes,
    photoconsistency_predictor,
    prefilter_cubes,
    run_sweep,
)
from surfacenet_tpu.utils.metrics import accuracy_completeness


def _config():
    return Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        fusion=FusionConfig(n_view_pairs=3, tau=0.25, gamma=0.6),
        sweep=SweepConfig(cube_batch=8),
    )


def test_enumerate_cubes_covers_bbox():
    cfg = _config()
    grid, origins = enumerate_cubes(
        np.array([-40.0, -40.0, -40.0]), np.array([40.0, 40.0, 40.0]), cfg
    )
    assert len(grid) == len(origins)
    # cubes cover the whole bbox: last cube must reach past bbox_max
    D_mm = cfg.voxel.cube_size * cfg.voxel.voxel_size_mm
    assert (origins.max(axis=0) + D_mm >= 40.0).all()
    assert (origins.min(axis=0) <= -40.0).all()


def test_prefilter_drops_out_of_frustum(sphere_scene):
    cfg = _config()
    origins = np.array(
        [[-16.0, -16.0, -16.0], [5000.0, 5000.0, 5000.0]]
    )
    keep = prefilter_cubes(
        sphere_scene.Ps, origins, sphere_scene.images.shape[1:3], cfg
    )
    assert keep.tolist() == [True, False]


def _analytic_predictor(scene, cfg):
    """Oracle with access to the true surface: p = exp(-(d/s)^2).

    Validates everything downstream of the CVC gather — fusion, thresholds,
    ray pooling, overlap merge, coordinate bookkeeping — with tight bounds.
    """
    import jax
    import jax.numpy as jnp

    from surfacenet_tpu.geometry.camera import voxel_centers

    center = jnp.asarray(scene.center, jnp.float32)
    radius = scene.radius
    D = cfg.voxel.cube_size
    s = cfg.voxel.voxel_size_mm

    def predict(x, origins):
        def one(origin):
            c = voxel_centers(origin, D, s)
            d = jnp.abs(jnp.linalg.norm(c - center, axis=-1) - radius)
            return jnp.exp(-((d / s) ** 2))

        return jax.vmap(one)(origins)

    return predict


def test_golden_sphere_analytic_oracle(sphere_scene):
    """Sweep with the analytic oracle: reconstruction must be voxel-accurate.

    This is the tight pipeline-correctness gate (geometry, fusion, thinning,
    merge); the photoconsistency test below checks the realistic signal path
    more loosely.
    """
    cfg = _config()
    store, stats = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, predictor=_analytic_predictor(sphere_scene, cfg),
    )
    pts, probs, colors = store.merge()
    assert len(pts) > 500, "reconstruction too sparse"
    gt = sphere_scene.surface_points(4000)
    acc, comp = accuracy_completeness(pts, gt)
    s = cfg.voxel.voxel_size_mm
    assert acc < 1.5 * s, f"accuracy {acc:.2f}mm (s={s})"
    assert comp < 2.0 * s, f"completeness {comp:.2f}mm (s={s})"


def test_golden_sphere_reconstruction(sphere_scene):
    """Full sweep with the photoconsistency oracle: the true surface must be
    covered (completeness), and a solid core of points must be on-surface.
    Accuracy is NOT tightly bounded here: a model-free pairwise oracle keeps
    silhouette-edge ghosts that the learned net exists to suppress."""
    cfg = _config()
    store, stats = run_sweep(
        sphere_scene.images,
        sphere_scene.Ps,
        sphere_scene.bbox_min,
        sphere_scene.bbox_max,
        cfg,
        predictor=photoconsistency_predictor,
    )
    assert stats.n_cubes_after_prefilter > 0
    assert stats.n_cubes_nonempty > 0

    pts, probs, colors = store.merge()
    assert len(pts) > 200, "reconstruction too sparse"

    gt = sphere_scene.surface_points(4000)
    acc, comp = accuracy_completeness(pts, gt)
    s = cfg.voxel.voxel_size_mm
    assert comp < 4.0 * s, f"completeness {comp:.2f}mm too poor"
    d = sphere_scene.surface_distance(pts)
    # ~0.19 observed with the current oracle; gate well below the ~0.02
    # that a broken geometry path would produce.
    assert (d < 2 * s).mean() > 0.10, "too few on-surface points"


def test_sweep_resume(sphere_scene, tmp_path):
    """Killing and restarting the sweep must not redo finished cubes."""
    cfg = _config()
    ledger = str(tmp_path / "ledger.jsonl")
    store1, stats1 = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor, ledger_path=ledger,
    )
    n1 = len(store1.done_set())
    assert n1 == stats1.n_cubes_after_prefilter

    # resume: everything already done -> no new batches
    store2, stats2 = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor, ledger_path=ledger,
    )
    assert stats2.n_batches == 0
    # merged result identical
    p1, _, _ = store1.merge()
    p2, _, _ = store2.merge()
    assert len(p1) == len(p2)

    # a fully-resumed (zero-cube) run still flushes a metrics record
    from surfacenet_tpu.utils.observability import Metrics

    mpath = str(tmp_path / "m.jsonl")
    run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max,
        cfg, photoconsistency_predictor, ledger_path=ledger,
        metrics=Metrics(mpath),
    )
    import json

    rec = json.loads(open(mpath).read().splitlines()[-1])
    assert rec["cubes_per_s"] == 0.0
    assert rec["n_cubes_after_prefilter"] == stats1.n_cubes_after_prefilter


def test_compact_truncation_refetches_dense(sphere_scene):
    """A compact_k too small for a cube's occupancy must not lose voxels.

    The harvest path checks the true occupied counts against compact_k and
    re-fetches the offending batch densely (VERDICT r1: silent-truncation
    hazard at 64^3), so results are identical to an ample compact_k run.
    """
    cfg = _config()
    pred = _analytic_predictor(sphere_scene, cfg)

    store_ref, _ = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max, cfg, pred,
    )
    # compact_k far below the per-cube occupied counts of the sphere shell
    cfg_small = dataclasses.replace(
        cfg, sweep=dataclasses.replace(cfg.sweep, compact_k=8)
    )
    store_small, _ = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max, cfg_small, pred,
    )
    pts_ref, probs_ref, _ = store_ref.merge()
    pts_small, probs_small, _ = store_small.merge()
    assert len(pts_ref) == len(pts_small)
    ref_sorted = pts_ref[np.lexsort(pts_ref.T)]
    small_sorted = pts_small[np.lexsort(pts_small.T)]
    np.testing.assert_allclose(ref_sorted, small_sorted, atol=1e-5)


def test_compact_color_matches_dense_path(sphere_scene):
    """Compact records carry the same colors as the dense path.

    r3 restructure: compact mode gathers the best pair's raw CVC voxels
    per selected record instead of materializing the full (Nc, D^3, 3)
    color volume — occ/fused/color must stay identical at occupied
    voxels (color within u8 quantization).
    """
    import jax.numpy as jnp

    from surfacenet_tpu.ops.view_pairs import select_pairs_geometric
    from surfacenet_tpu.pipeline.sweep import (
        cube_batch_step, unpack_compact,
    )

    cfg = _config()
    D, s = cfg.voxel.cube_size, cfg.voxel.voxel_size_mm
    hw = sphere_scene.images.shape[1:3]
    origins = np.array(
        [[-16.0, -16.0, -16.0], [0.0, -16.0, 0.0], [-16.0, 0.0, 0.0]],
        np.float32,
    )
    pair_idx, pair_w = select_pairs_geometric(
        sphere_scene.Ps, origins, 3, hw, extent_mm=D * s
    )
    from surfacenet_tpu.ops.view_pairs import dedup_view_slots

    uniq, slots = dedup_view_slots(pair_idx)
    for use_dedup in (True, False):
        args = (
            jnp.asarray(sphere_scene.images, jnp.float32),
            jnp.asarray(sphere_scene.Ps, jnp.float32),
            jnp.asarray(origins),
            jnp.asarray(pair_idx),
            jnp.asarray(pair_w),
            None,
            jnp.asarray(uniq) if use_dedup else None,
            jnp.asarray(slots) if use_dedup else None,
        )
        kw = dict(
            D=D, s=s, n_pairs=3, tau=0.25, gamma=0.6, adaptive=False,
            center_colors=True, predict=photoconsistency_predictor,
            n_pool_views=4, ray_pool_mode="affine", pool_window=2,
        )
        occ_d, fused_d, color_d = cube_batch_step(
            *args, compact_output=False, **kw
        )
        rec, counts = cube_batch_step(*args, compact_output=True, **kw)
        occ_c, fused_c, color_c = unpack_compact(
            np.asarray(rec), np.asarray(counts), D
        )
        occ_d = np.asarray(occ_d)
        np.testing.assert_array_equal(occ_c, occ_d)
        m = occ_d
        assert m.sum() > 50, "test scene produced too few occupied voxels"
        np.testing.assert_allclose(  # prob quantized to u8 in records
            fused_c[m], np.asarray(fused_d)[m], atol=1.0 / 255.0 + 1e-6
        )
        np.testing.assert_allclose(
            color_c[m], np.clip(np.asarray(color_d)[m], 0.0, 1.0),
            atol=1.0 / 255.0 + 1e-6,
            err_msg=f"dedup={use_dedup}",
        )


def test_compact_k_auto_scales_with_cube_size():
    from surfacenet_tpu.pipeline.sweep import _resolve_compact_k

    assert _resolve_compact_k(0, 32) == 4096
    assert _resolve_compact_k(0, 64) == 16384
    assert _resolve_compact_k(0, 8) == 512  # capped at D^3
    assert _resolve_compact_k(100, 64) == 100  # explicit wins


def test_gamma_vote_counts_unique_views_once(sphere_scene):
    """Duplicate views across selected pairs must not double-vote.

    Pairs [(0,1),(0,1),(2,3)] pool over unique views {0,1,2,3}; with a
    predictor that ignores the CVCs, occupancy must match pairs
    [(0,1),(2,3)] exactly (ADVICE r1: padded slots multiply counted the
    fill view's ray-max votes).
    """
    import jax.numpy as jnp

    from surfacenet_tpu.pipeline.sweep import cube_batch_step

    cfg = _config()
    pred = _analytic_predictor(sphere_scene, cfg)
    D, s = cfg.voxel.cube_size, cfg.voxel.voxel_size_mm
    surf = np.asarray(sphere_scene.center, np.float32) + np.array(
        [sphere_scene.radius, 0.0, 0.0], np.float32
    )
    origin = surf - D * s / 2.0
    origins = jnp.asarray(origin[None].repeat(2, 0))
    images = jnp.asarray(sphere_scene.images, jnp.float32)
    Ps = jnp.asarray(sphere_scene.Ps, jnp.float32)

    kw = dict(
        D=D, s=s, tau=0.25, gamma=0.5, adaptive=False, center_colors=True,
        predict=lambda x, o: pred(x, o), n_pool_views=6,
        ray_pool_mode="affine",
    )
    occ_dup, _, _ = cube_batch_step(
        images, Ps, origins,
        jnp.asarray([[[0, 1], [0, 1], [2, 3]]] * 2, jnp.int32),
        jnp.ones((2, 3), jnp.float32), n_pairs=3, **kw,
    )
    occ_ref, _, _ = cube_batch_step(
        images, Ps, origins,
        jnp.asarray([[[0, 1], [2, 3]]] * 2, jnp.int32),
        jnp.ones((2, 2), jnp.float32), n_pairs=2, **kw,
    )
    assert bool(jnp.any(occ_ref)), "test scene produced no occupancy"
    np.testing.assert_array_equal(np.asarray(occ_dup), np.asarray(occ_ref))


def test_core_bounds_extend_to_absent_neighbors():
    """Claims extend to faces whose neighbor was dropped by the prefilter.

    Without the extension the overlap strip owned by a dropped neighbor is
    claimed by no cube at all: holes along prefilter boundaries.
    """
    from surfacenet_tpu.pipeline.sweep import core_bounds_for

    D, overlap = 16, 4
    m_lo, m_hi = overlap // 2, overlap - overlap // 2
    # 3x1x1 lattice with the middle cube dropped
    present = np.array([[0, 0, 0], [2, 0, 0]])
    b = core_bounds_for(
        present, np.array([2, 0, 0]), D, overlap, present=present
    )
    # cube (0,0,0): +x neighbor (1,0,0) absent -> claim extends to its face
    assert b[0, 0, 1] == D
    # cube (2,0,0): -x neighbor absent -> claim extends down to 0
    assert b[1, 0, 0] == 0
    # no neighbors along y/z at all -> full claims there
    assert (b[:, 1:, 0] == 0).all() and (b[:, 1:, 1] == D).all()

    # with the middle cube present, interior faces stay trimmed
    full = np.array([[0, 0, 0], [1, 0, 0], [2, 0, 0]])
    b = core_bounds_for(full, np.array([2, 0, 0]), D, overlap, present=full)
    assert b[0, 0, 1] == D - m_hi and b[1, 0, 0] == m_lo
    assert b[1, 0, 1] == D - m_hi and b[2, 0, 0] == m_lo


def test_core_bounds_present_matches_lattice_edge_rule():
    """With every enumerated cube present, presence-aware bounds reduce to
    the legacy lattice-edge rule."""
    from surfacenet_tpu.pipeline.sweep import core_bounds_for

    D, overlap = 16, 4
    ax = np.arange(3)
    grid = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    lmax = np.array([2, 2, 2])
    legacy = core_bounds_for(grid, lmax, D, overlap)
    aware = core_bounds_for(grid, lmax, D, overlap, present=grid)
    assert (legacy == aware).all()


def test_resolve_pool_window_auto_respects_overlap():
    """Auto window is min(2, overlap//2): tiny overlaps cannot satisfy the
    overlap >= 2*window exactness bound and must fall back to segment mode."""
    from surfacenet_tpu.pipeline.sweep import resolve_pool_window

    def cfg_with(overlap):
        return Config(
            voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=overlap)
        )

    assert resolve_pool_window(cfg_with(8)) == 2
    assert resolve_pool_window(cfg_with(4)) == 2
    assert resolve_pool_window(cfg_with(2)) == 1
    assert resolve_pool_window(cfg_with(1)) == 0
    assert resolve_pool_window(cfg_with(0)) == 0
    explicit = dataclasses.replace(
        cfg_with(8), fusion=FusionConfig(pool_window_vox=3)
    )
    assert resolve_pool_window(explicit) == 3


def test_truncation_refetch_is_per_cube(sphere_scene, monkeypatch):
    """Only the offending cubes are re-fetched dense (VERDICT r2 weak #5:
    whole-round dense re-dispatch moved ~256MB at 64^3 for one bad cube).

    Intercepts cube_batch_step: dense (compact_output=False) dispatches
    must come in _REFETCH_PAD-row mini-batches covering exactly the
    truncated cubes, never the full cube_batch."""
    import surfacenet_tpu.pipeline.sweep as sweep_mod
    from surfacenet_tpu.pipeline.sweep import _REFETCH_PAD

    cfg = _config()
    pred = _analytic_predictor(sphere_scene, cfg)

    # reference run: per-cube occupied counts
    store_ref, _ = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max, cfg, pred,
    )
    counts = sorted(
        (int(r.occupancy.sum()) for r in store_ref._cubes.values()),
        reverse=True,
    )
    assert counts[0] > counts[-1], "need unequal cube occupancies"
    # threshold so that only SOME cubes truncate (at least 1, not all)
    k = max(counts[-1] + 1, counts[len(counts) // 2])
    n_truncated = sum(1 for c in counts if c > k)
    assert 1 <= n_truncated < len(counts)

    real_step = sweep_mod.cube_batch_step
    dense_batches = []

    def spy(*args, **kw):
        if not kw.get("compact_output", True):
            dense_batches.append(int(args[2].shape[0]))
        return real_step(*args, **kw)

    monkeypatch.setattr(sweep_mod, "cube_batch_step", spy)
    cfg_small = dataclasses.replace(
        cfg, sweep=dataclasses.replace(cfg.sweep, compact_k=k)
    )
    store_small, _ = run_sweep(
        sphere_scene.images, sphere_scene.Ps,
        sphere_scene.bbox_min, sphere_scene.bbox_max, cfg_small, pred,
    )
    pad = min(cfg.sweep.cube_batch, _REFETCH_PAD)
    assert dense_batches, "expected truncation re-fetches"
    assert all(b == pad for b in dense_batches), dense_batches
    # total dense rows stay within one padding of the true offender count
    assert sum(dense_batches) < n_truncated + pad * len(dense_batches)
    assert sum(dense_batches) <= n_truncated + (pad - 1) * len(dense_batches)

    # and the result is still exact
    pts_ref, _, _ = store_ref.merge()
    pts_small, _, _ = store_small.merge()
    assert len(pts_ref) == len(pts_small)
    ref_sorted = pts_ref[np.lexsort(pts_ref.T)]
    small_sorted = pts_small[np.lexsort(pts_small.T)]
    np.testing.assert_allclose(ref_sorted, small_sorted, atol=1e-5)
