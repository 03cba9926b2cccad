"""Observability utils tests."""

import json

from surfacenet_tpu.config import ModelConfig
from surfacenet_tpu.utils.observability import (
    FlopModel,
    Metrics,
    scaling_efficiency,
)


def test_flop_model_counts():
    fm = FlopModel(ModelConfig(), D=32)
    fl = fm.conv_stack_flops()
    # block1: 3 convs at 32^3: 2*27*(6*32+32*32+32*32)*32768
    b1 = 2 * 27 * (6 * 32 + 32 * 32 + 32 * 32) * 32**3
    assert fl > b1
    assert fm.side_flops() > 0
    # utilization monotone in throughput
    assert fm.utilization(200.0) > fm.utilization(100.0)


def test_mxu_lane_ceiling():
    # paper widths: FLOP-weighted lane ceiling sits strictly between the
    # worst (25% for 32ch) and best (78.1% for 300ch) per-shape lids
    fm = FlopModel(ModelConfig(), D=32)
    c = fm.mxu_ceiling()
    assert 0.25 < c < 0.781
    assert abs(c - 0.593) < 0.01  # the ROOFLINE.md headline number
    # lane-aligned preset: every block a multiple of 128 -> ceiling 1.0
    fa = FlopModel(ModelConfig.mxu_aligned(), D=32)
    assert fa.mxu_ceiling() == 1.0


def test_metrics_counters_and_timer(tmp_path):
    m = Metrics(path=str(tmp_path / "metrics.jsonl"))
    m.count("cubes", 5)
    m.count("cubes", 3)
    m.gauge("occupancy", 0.12)
    with m.timer("stage"):
        pass
    snap = m.snapshot()
    assert snap["cubes"] == 8
    assert snap["occupancy"] == 0.12
    assert snap["stage_n"] == 1
    m.flush(extra={"round": 1})
    rec = json.loads(open(tmp_path / "metrics.jsonl").read().strip())
    assert rec["cubes"] == 8 and rec["round"] == 1


def test_scaling_efficiency():
    eff = scaling_efficiency({1: 100.0, 2: 180.0, 4: 320.0})
    assert abs(eff[1] - 1.0) < 1e-9
    assert abs(eff[2] - 0.9) < 1e-9
    assert abs(eff[4] - 0.8) < 1e-9


def test_metrics_wired_into_sweep(tmp_path, request):
    small_scene = request.getfixturevalue("small_scene")
    from surfacenet_tpu.config import (
        Config, FusionConfig, SweepConfig, VoxelConfig,
    )
    from surfacenet_tpu.pipeline.sweep import (
        photoconsistency_predictor, run_sweep,
    )

    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        fusion=FusionConfig(n_view_pairs=2, tau=0.3, gamma=0.6),
        sweep=SweepConfig(cube_batch=8),
    )
    m = Metrics(path=str(tmp_path / "m.jsonl"))
    store, stats = run_sweep(
        small_scene.images, small_scene.Ps,
        small_scene.bbox_min, small_scene.bbox_max,
        cfg, photoconsistency_predictor, metrics=m,
    )
    snap = m.snapshot()
    assert snap["cubes_processed"] == stats.n_cubes_after_prefilter
    assert snap["cubes_per_s"] > 0
    assert (tmp_path / "m.jsonl").exists()


def test_profiler_trace_hook(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from surfacenet_tpu.utils.observability import trace

    monkeypatch.setenv("JAX_PROFILER_DIR", str(tmp_path / "prof"))
    with trace("test"):
        float(jnp.sum(jnp.ones((8, 8))))
    import os

    assert os.path.isdir(tmp_path / "prof")


def test_viz_splat(tmp_path, request):
    small_scene = request.getfixturevalue("small_scene")
    import numpy as np

    from surfacenet_tpu.utils.viz import save_turntable, splat_orthographic

    pts = small_scene.surface_points(2000)
    img = splat_orthographic(pts)
    assert img.shape == (512, 512, 3)
    assert img.any()  # something rendered
    paths = save_turntable(str(tmp_path / "view"), pts)
    import os

    assert all(os.path.exists(p) for p in paths)
    # empty cloud doesn't crash
    assert splat_orthographic(np.zeros((0, 3))).sum() == 0
