"""CLI smoke tests (CPU)."""

import numpy as np
import pytest

from surfacenet_tpu.cli import _apply_overrides, _load_config, main
from surfacenet_tpu.config import Config


def test_apply_overrides():
    cfg = Config()
    cfg2 = _apply_overrides(
        cfg, ["voxel.cube_size=64", "fusion.tau=0.5", "model.dtype=float32"]
    )
    assert cfg2.voxel.cube_size == 64
    assert cfg2.fusion.tau == 0.5
    assert cfg2.model.dtype == "float32"
    # untouched fields preserved
    assert cfg2.voxel.overlap == cfg.voxel.overlap


def test_config_json_roundtrip(tmp_path):
    cfg = Config()
    p = tmp_path / "cfg.json"
    p.write_text(cfg.to_json())
    cfg2 = Config.from_json(p.read_text())
    assert cfg2 == cfg


def test_reconstruct_cli(tmp_path, small_scene):
    from surfacenet_tpu.data.dtu import write_scan

    scan_dir = str(tmp_path / "scan")
    write_scan(
        scan_dir, small_scene.images, small_scene.Ps,
        small_scene.bbox_min, small_scene.bbox_max,
    )
    out = str(tmp_path / "out.ply")
    main(
        [
            "reconstruct", "--scan", scan_dir, "--out", out,
            "--set", "voxel.cube_size=16",
            "--set", "voxel.voxel_size_mm=2.0",
            "--set", "voxel.overlap=4",
            "--set", "fusion.n_view_pairs=2",
            "--set", "fusion.tau=0.25",
            "--set", "sweep.cube_batch=8",
        ]
    )
    from surfacenet_tpu.utils.ply import read_ply

    pts, colors = read_ply(out)
    assert len(pts) > 50


def test_baseline_preset_files_load():
    """The BASELINE operating points (+ the r3 MXU-aligned point) ship as
    config files that round-trip against baseline_config()."""
    import glob
    import os

    from surfacenet_tpu.config import Config, baseline_config

    files = sorted(glob.glob("configs/*.json"))
    assert files, "no shipped configs found"
    for f in files:
        name = os.path.splitext(os.path.basename(f))[0]
        cfg = Config.from_json(open(f).read())
        assert cfg == baseline_config(name), name


def test_reconstruct_all_cli(tmp_path, small_scene):
    from surfacenet_tpu.data.dtu import write_scan

    for name in ["scan1", "scan2"]:
        write_scan(
            str(tmp_path / name), small_scene.images, small_scene.Ps,
            small_scene.bbox_min, small_scene.bbox_max,
        )
    out_dir = str(tmp_path / "out")
    main(
        [
            "reconstruct-all", "--root", str(tmp_path), "--out-dir", out_dir,
            "--set", "voxel.cube_size=16",
            "--set", "voxel.voxel_size_mm=2.0",
            "--set", "voxel.overlap=4",
            "--set", "fusion.n_view_pairs=2",
            "--set", "fusion.tau=0.25",
            "--set", "sweep.cube_batch=8",
        ]
    )
    import json
    import os

    rep = json.load(open(os.path.join(out_dir, "report.json")))
    assert set(rep) == {"scan1", "scan2"}
    for name in rep:
        assert os.path.exists(os.path.join(out_dir, f"{name}.ply"))
        assert rep[name]["points"] > 0


def test_reconstruct_all_cli_gt_metrics(tmp_path, small_scene):
    """--gt-dir adds per-scan acc/comp and split means to report.json."""
    import json
    import os

    from surfacenet_tpu.data.dtu import write_scan
    from surfacenet_tpu.utils.ply import write_ply

    write_scan(
        str(tmp_path / "scan1"), small_scene.images, small_scene.Ps,
        small_scene.bbox_min, small_scene.bbox_max,
    )
    gt_dir = tmp_path / "gt"
    gt_dir.mkdir()
    write_ply(str(gt_dir / "scan1.ply"), small_scene.surface_points(2000))
    out_dir = str(tmp_path / "out")
    main(
        [
            "reconstruct-all", "--scans", str(tmp_path / "scan1"),
            "--out-dir", out_dir, "--gt-dir", str(gt_dir),
            "--set", "voxel.cube_size=16",
            "--set", "voxel.voxel_size_mm=2.0",
            "--set", "voxel.overlap=4",
            "--set", "fusion.n_view_pairs=2",
            "--set", "fusion.tau=0.25",
            "--set", "sweep.cube_batch=8",
        ]
    )
    rep = json.load(open(os.path.join(out_dir, "report.json")))
    assert 0 < rep["scan1"]["acc_mm"] <= 20.0
    assert 0 < rep["scan1"]["comp_mm"] <= 20.0
    assert rep["_mean"]["overall_mm"] == rep["scan1"]["overall_mm"]


def test_train_cli_with_scan_and_gt(tmp_path, small_scene):
    from surfacenet_tpu.data.dtu import write_scan
    from surfacenet_tpu.utils.ply import write_ply

    scan_dir = str(tmp_path / "scanT")
    write_scan(scan_dir, small_scene.images, small_scene.Ps,
               small_scene.bbox_min, small_scene.bbox_max)
    gt = str(tmp_path / "gt.ply")
    write_ply(gt, small_scene.surface_points(2000))
    main(
        [
            "train", "--scan", scan_dir, "--gt", gt, "--steps", "3",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--set", "voxel.cube_size=16",
            "--set", "voxel.voxel_size_mm=2.0",
            "--set", "voxel.overlap=4",
            "--set", 'model.block_channels=[8,12,16,16]',
            "--set", 'model.convs_per_block=[1,1,1,1]',
            "--set", "model.side_channels=4",
            "--set", 'model.dtype="float32"',
            "--set", "train.batch_size=4",
        ]
    )


def test_train_cli_synthetic_tori(tmp_path):
    """--synthetic tori trains on the hard-geometry golden scene (scan
    path: SDF labels on device)."""
    main(
        [
            "train", "--synthetic", "tori", "--steps", "2",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--set", "voxel.cube_size=16",
            "--set", "voxel.voxel_size_mm=2.0",
            "--set", "voxel.overlap=4",
            "--set", 'model.block_channels=[8,12,16,16]',
            "--set", 'model.convs_per_block=[1,1,1,1]',
            "--set", "model.side_channels=4",
            "--set", 'model.dtype="float32"',
            "--set", "train.batch_size=4",
            "--set", "train.scan_chunk=2",
        ]
    )


def test_train_cli_resume(tmp_path, capsys):
    """cli train --resume continues from the latest checkpoint (VERDICT
    r3 next #5: preemption-safe training at the CLI surface)."""
    common = [
        "train", "--synthetic", "sphere",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--set", "voxel.cube_size=16",
        "--set", "voxel.voxel_size_mm=2.0",
        "--set", "voxel.overlap=4",
        "--set", 'model.block_channels=[8,12,16,16]',
        "--set", 'model.convs_per_block=[1,1,1,1]',
        "--set", "model.side_channels=4",
        "--set", 'model.dtype="float32"',
        "--set", "train.batch_size=4",
        "--set", "train.scan_chunk=2",
        "--set", "train.checkpoint_every=2",
    ]
    # --resume on a fresh dir is a no-op (preemption loops always pass it)
    main(common + ["--steps", "2", "--resume"])
    out = capsys.readouterr().out
    assert "starting fresh" in out
    main(common + ["--steps", "4", "--resume"])
    out = capsys.readouterr().out
    assert "resuming from step 2" in out
    assert "trained steps 2..4" in out
    import os

    assert os.path.isdir(str(tmp_path / "ckpt" / "step_4"))


def test_reconstruct_cli_sharded(tmp_path, small_scene):
    """--sharded routes through run_sweep_sharded on the 8-device mesh."""
    from surfacenet_tpu.data.dtu import write_scan

    scan_dir = str(tmp_path / "scan")
    write_scan(
        scan_dir, small_scene.images, small_scene.Ps,
        small_scene.bbox_min, small_scene.bbox_max,
    )
    out = str(tmp_path / "out.ply")
    main(
        [
            "reconstruct", "--scan", scan_dir, "--out", out, "--sharded",
            "--ledger", str(tmp_path / "ledgers"),
            "--set", "voxel.cube_size=16",
            "--set", "voxel.voxel_size_mm=2.0",
            "--set", "voxel.overlap=4",
            "--set", "fusion.n_view_pairs=2",
            "--set", "fusion.tau=0.25",
            "--set", "sweep.cube_batch=2",
            "--set", "mesh.block_axis=2",
        ]
    )
    from surfacenet_tpu.utils.ply import read_ply

    pts, colors = read_ply(out)
    assert len(pts) > 50


def test_train_pairnet_cli_then_reconstruct(tmp_path, small_scene):
    """train-pairnet saves a checkpoint reconstruct --pairnet can consume."""
    from surfacenet_tpu.data.dtu import write_scan

    ckpt_dir = str(tmp_path / "ckpts")
    main(
        [
            "train-pairnet", "--steps", "2",
            "--checkpoint-dir", ckpt_dir,
            "--set", "pairnet.channels=[8]",
            "--set", "pairnet.embed_dim=8",
            "--set", "pairnet.patch_size=16",
            "--set", "train.batch_size=4",
        ]
    )
    scan_dir = str(tmp_path / "scan")
    write_scan(
        scan_dir, small_scene.images, small_scene.Ps,
        small_scene.bbox_min, small_scene.bbox_max,
    )
    out = str(tmp_path / "out.ply")
    main(
        [
            "reconstruct", "--scan", scan_dir, "--out", out,
            "--pairnet", ckpt_dir,
            "--set", "pairnet.channels=[8]",
            "--set", "pairnet.embed_dim=8",
            "--set", "pairnet.patch_size=16",
            "--set", "voxel.cube_size=16",
            "--set", "voxel.voxel_size_mm=2.0",
            "--set", "voxel.overlap=4",
            "--set", "fusion.n_view_pairs=2",
            "--set", "fusion.tau=0.25",
            "--set", "sweep.cube_batch=8",
        ]
    )
    from surfacenet_tpu.utils.ply import read_ply

    pts, _ = read_ply(out)
    assert len(pts) > 50


def test_reconstruct_all_cli_sampleset(tmp_path, small_scene):
    """reconstruct-all drives the real DTU SampleSet layout end-to-end
    (rect_* naming, 1-indexed pos files, Calibration/cal18 discovery)."""
    import json
    import os

    from surfacenet_tpu.data.dtu import write_scan_sampleset

    scan_dir = write_scan_sampleset(
        str(tmp_path), "scan6", small_scene.images, small_scene.Ps
    )
    out_dir = str(tmp_path / "out")
    main(
        [
            "reconstruct-all", "--scans", scan_dir, "--out-dir", out_dir,
            "--set", "voxel.cube_size=16",
            "--set", "voxel.voxel_size_mm=2.0",
            "--set", "voxel.overlap=4",
            "--set", "fusion.n_view_pairs=2",
            "--set", "fusion.tau=0.25",
            "--set", "sweep.cube_batch=8",
        ]
    )
    rep = json.load(open(os.path.join(out_dir, "report.json")))
    assert rep["scan6"]["points"] > 0
    assert os.path.exists(os.path.join(out_dir, "scan6.ply"))


def test_reconstruct_cli_colmap(tmp_path, small_scene):
    """reconstruct --colmap drives a COLMAP sparse model end-to-end."""
    import numpy as np

    from surfacenet_tpu.data.colmap import write_colmap_model
    from tests.test_colmap import _decompose_P

    model_dir = str(tmp_path / "sparse")
    Ks, Rs, ts = [], [], []
    for P in small_scene.Ps:
        K, R, t = _decompose_P(P)
        Ks.append(K)
        Rs.append(R)
        ts.append(t)
    write_colmap_model(
        model_dir, small_scene.images, np.stack(Ks), np.stack(Rs),
        np.stack(ts), points3d=small_scene.surface_points(200),
        image_dir=str(tmp_path / "images"),
    )
    out = str(tmp_path / "out.ply")
    main(
        [
            "reconstruct", "--scan", model_dir, "--colmap", "--out", out,
            "--set", "voxel.cube_size=16",
            "--set", "voxel.voxel_size_mm=2.0",
            "--set", "voxel.overlap=4",
            "--set", "fusion.n_view_pairs=2",
            "--set", "fusion.tau=0.25",
            "--set", "sweep.cube_batch=8",
        ]
    )
    import os

    from surfacenet_tpu.utils.ply import read_ply

    assert os.path.exists(out)
    pts, _ = read_ply(out)
    assert len(pts) > 50


def test_sharded_requests_fail_loudly(tmp_path, small_scene):
    """An unusable --sharded layout exits non-zero instead of silently
    degrading; --allow-unsharded opts back into the fallback (VERDICT r2
    weak #6)."""
    from surfacenet_tpu.data.dtu import write_scan
    from surfacenet_tpu.utils.ply import write_ply

    scan_dir = str(tmp_path / "scan")
    write_scan(
        scan_dir, small_scene.images, small_scene.Ps,
        small_scene.bbox_min, small_scene.bbox_max,
    )
    tiny = [
        "--set", "voxel.cube_size=16",
        "--set", "voxel.voxel_size_mm=2.0",
        "--set", "voxel.overlap=4",
        "--set", "fusion.n_view_pairs=2",
        "--set", "sweep.cube_batch=2",
    ]
    # block_axis=3 does not divide the 8-device mesh -> hard error
    with pytest.raises(SystemExit) as ei:
        main(["reconstruct", "--scan", scan_dir, "--sharded",
              "--out", str(tmp_path / "o.ply"),
              "--set", "mesh.block_axis=3", *tiny])
    assert "block_axis=3" in str(ei.value)

    # train --sharded with batch_size not divisible by 8 devices
    train_tiny = [
        "--set", "voxel.cube_size=16",
        "--set", "voxel.voxel_size_mm=2.0",
        "--set", "voxel.overlap=4",
        "--set", 'model.block_channels=[8,12,16,16]',
        "--set", 'model.convs_per_block=[1,1,1,1]',
        "--set", "model.side_channels=4",
        "--set", 'model.dtype="float32"',
        "--set", "train.batch_size=6",
        "--set", "train.scan_chunk=2",
    ]
    with pytest.raises(SystemExit) as ei:
        main(["train", "--synthetic", "sphere", "--steps", "2",
              "--checkpoint-dir", str(tmp_path / "ckpt"), "--sharded",
              *train_tiny])
    assert "batch_size=6" in str(ei.value)

    # --allow-unsharded restores the old degrade-and-continue behavior
    main(["train", "--synthetic", "sphere", "--steps", "2",
          "--checkpoint-dir", str(tmp_path / "ckpt"), "--sharded",
          "--allow-unsharded", *train_tiny])
