"""The anti-geometric golden scene: occluder + specularity (SURVEY.md C6).

VERDICT r2 missing #3: learned pair weighting must be shown to MATTER —
these tests pin (a) the scene construction (the occluder corrupts ~1/3 of
views in a way no frustum/baseline geometry can detect), (b) the learned
similarity structure (pairnet separates occluded from clean views), and
(c) the end-to-end gap (learned selection beats geometric selection on the
occluded scene, and does not regress on the clean sphere).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from surfacenet_tpu.config import Config, FusionConfig, SweepConfig, VoxelConfig
from surfacenet_tpu.data.synthetic import make_occluded_scene, make_sphere_scene
from surfacenet_tpu.pipeline.sweep import photoconsistency_predictor, run_sweep
from surfacenet_tpu.utils.metrics import accuracy_completeness


@pytest.fixture(scope="module")
def occluded_scene():
    return make_occluded_scene(n_views=12, hw=(120, 160))


def _occluded_views(scene):
    return scene.occluded_views()


def test_occluder_blocks_target_in_some_views(occluded_scene):
    scene = occluded_scene
    occ = _occluded_views(scene)
    assert 2 <= len(occ) <= 6, occ
    # the occluder tile texture has a constant blue channel of 0.25;
    # occluded views are dominated by it at the image center, clean views
    # never show it.
    H, W = scene.images.shape[1:3]
    cy, cx = H // 2, W // 2
    frac_disk = np.isclose(
        scene.images[:, cy - 20 : cy + 20, cx - 20 : cx + 20, 2], 0.25
    ).mean(axis=(1, 2))
    for v in range(scene.images.shape[0]):
        if v in occ:
            assert frac_disk[v] > 0.9, (v, frac_disk[v])
        else:
            assert frac_disk[v] < 0.05, (v, frac_disk[v])
    # the occluder sits OUTSIDE the sweep bbox: no GT occupancy there
    assert scene.bbox_max[0] < scene.occ_center[0]


def test_pairnet_separates_occluded_views(occluded_scene):
    """Triplet training on the occluded scene yields a similarity matrix
    where clean-clean view pairs score higher than occluded-clean pairs."""
    from surfacenet_tpu.ops.view_pairs import view_similarity_from_scene
    from surfacenet_tpu.train.train_pair import train_pairnet

    scene = occluded_scene
    cfg = Config()
    model, variables, losses = train_pairnet(scene, cfg, n_steps=250)
    assert losses[-1] < losses[0]
    sim = np.asarray(
        view_similarity_from_scene(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            model, variables, cfg.pairnet.patch_size, n_points=32,
        )
    )
    occ = set(_occluded_views(scene).tolist())
    V = sim.shape[0]
    cross, clean = [], []
    for a in range(V):
        for b in range(a + 1, V):
            if (a in occ) != (b in occ):
                cross.append(sim[a, b])
            elif a not in occ:
                clean.append(sim[a, b])
    assert np.mean(clean) > np.mean(cross) + 0.02, (
        f"clean {np.mean(clean):.3f} vs cross {np.mean(cross):.3f}"
    )


def test_learned_selection_beats_geometric_under_occlusion(occluded_scene):
    """End-to-end: with the photoconsistency predictor, geometric pair
    selection keeps fusing occluder-corrupted pairs; cube-LOCAL learned
    consensus gating (select_pairs_learned_local) excludes an occluded
    view from fusion and from the pooling votes for exactly the cubes it
    corrupts, and must reconstruct the sphere markedly better.  The
    pairnet is trained on a CLEAN scene — training triplets on the
    occluded scene itself would teach the embedding that occluder-texture
    patches are positives of sphere patches (measured: TPU r3, local
    selection is 23% better full-scene, 29% on the occluded hemisphere;
    global similarity was a tie)."""
    import functools

    from surfacenet_tpu.ops.view_pairs import select_pairs_learned_local
    from surfacenet_tpu.train.train_pair import train_pairnet

    scene = occluded_scene
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        fusion=FusionConfig(n_view_pairs=4, tau=0.25, gamma=0.6),
        sweep=SweepConfig(cube_batch=8),
    )
    gt = scene.surface_points(4000)

    def overall(pair_selector):
        store, _ = run_sweep(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            cfg, photoconsistency_predictor, pair_selector=pair_selector,
        )
        pts, _, _ = store.merge()
        assert len(pts) > 100
        acc, comp = accuracy_completeness(pts, gt)
        return (acc + comp) / 2

    geo = overall(None)

    clean = make_sphere_scene(n_views=10, hw=(120, 160))
    model, variables, _ = train_pairnet(clean, Config(), n_steps=600)
    learned = overall(functools.partial(
        select_pairs_learned_local,
        n_pairs=cfg.fusion.n_view_pairs,
        image_hw=scene.images.shape[1:3],
        extent_mm=cfg.voxel.cube_extent_mm,
        images=scene.images,
        model=model,
        variables=variables,
        patch_size=Config().pairnet.patch_size,
    ))
    assert learned < geo * 0.9, (
        f"learned {learned:.3f}mm vs geometric {geo:.3f}mm"
    )


def test_learned_selection_no_regression_on_clean_scene():
    """On the clean sphere the learned consensus gates must not hurt:
    with the r4 one-sided deadband gate every majority view gets the
    same near-1 gate, so pair ranking collapses to pure geometry when no
    outliers exist.  VERDICT r3 next #4 tightened this bound from the
    r3 sigmoid's 1.15 (measured regression 1.06-1.09) to 1.02."""
    import functools

    from surfacenet_tpu.ops.view_pairs import select_pairs_learned_local
    from surfacenet_tpu.train.train_pair import train_pairnet

    scene = make_sphere_scene(n_views=8, hw=(120, 160))
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        fusion=FusionConfig(n_view_pairs=3, tau=0.25, gamma=0.6),
        sweep=SweepConfig(cube_batch=8),
    )
    gt = scene.surface_points(4000)

    def overall(pair_selector):
        store, _ = run_sweep(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            cfg, photoconsistency_predictor, pair_selector=pair_selector,
        )
        pts, _, _ = store.merge()
        acc, comp = accuracy_completeness(pts, gt)
        return (acc + comp) / 2

    geo = overall(None)
    model, variables, _ = train_pairnet(scene, Config(), n_steps=150)
    learned = overall(functools.partial(
        select_pairs_learned_local,
        n_pairs=cfg.fusion.n_view_pairs,
        image_hw=scene.images.shape[1:3],
        extent_mm=cfg.voxel.cube_extent_mm,
        images=scene.images,
        model=model,
        variables=variables,
        patch_size=Config().pairnet.patch_size,
    ))
    assert learned < geo * 1.02, (
        f"learned {learned:.3f}mm regressed vs geometric {geo:.3f}mm"
    )
