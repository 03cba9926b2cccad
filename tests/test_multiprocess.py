"""Real 2-process JAX CPU cluster tests (SURVEY.md SS7 step 8; VERDICT r2
missing #1).

These launch two fresh python processes that join via
jax.distributed.initialize (4 virtual CPU devices each -> one 8-device
cluster) and drive the production multi-process paths:

  * run_sweep_sharded with block_axis=2: each process feeds addressable
    shards, harvests only its own block rows, writes only its own block
    ledgers; process 0 merges every block from the shared ledger dir and
    exports — asserted equal to the unsharded single-process sweep.
  * train_surfacenet over a (1, 8) dp mesh spanning both processes:
    loss curves must match the single-process 8-device mesh run exactly
    (same global RNG -> same global batches -> same replicated state).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch_cluster(role: str, workdir: str, timeout: int = 420):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # children configure their own JAX env; scrub the parent's test setup
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, role, coord, str(i), "2", workdir],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"worker {i} rc={p.returncode}\n--- output ---\n{out[-4000:]}"
        )
    return outs


def test_two_process_sweep_matches_unsharded(tmp_path):
    from surfacenet_tpu.pipeline.sweep import (
        photoconsistency_predictor, run_sweep,
    )
    from surfacenet_tpu.utils.ply import read_ply
    from tests.mp_worker import build_scene, sweep_config

    _launch_cluster("sweep", str(tmp_path))

    stats = json.load(open(tmp_path / "stats0.json"))
    assert stats["n_points"] > 50
    assert len(stats["per_block_cubes"]) == 2
    assert sum(stats["per_block_cubes"]) == stats["n_cubes_after_prefilter"]
    # both processes wrote only their own block ledger files
    assert (tmp_path / "ledgers" / "block_0.jsonl").exists()
    assert (tmp_path / "ledgers" / "block_1.jsonl").exists()

    # reference: unsharded single-process sweep of the same scene
    scene = build_scene()
    cfg = sweep_config()
    store_ref, _ = run_sweep(
        scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
        cfg, photoconsistency_predictor,
    )
    p_ref, _, _ = store_ref.merge()
    p_mp, _ = read_ply(str(tmp_path / "mp.ply"))
    a = set(map(tuple, np.round(p_ref, 3)))
    b = set(map(tuple, np.round(p_mp, 3)))
    jaccard = len(a & b) / max(len(a | b), 1)
    assert jaccard > 0.999, f"2-process result differs: jaccard={jaccard}"


def test_two_process_train_matches_single_process(tmp_path):
    import jax

    from surfacenet_tpu.parallel.mesh import make_mesh
    from surfacenet_tpu.train.train_surface import train_surfacenet
    from tests.mp_worker import build_scene, train_config

    _launch_cluster("train", str(tmp_path))

    mp_losses = [
        json.load(open(tmp_path / f"train{i}.json"))["losses"]
        for i in range(2)
    ]
    # both processes observed the identical replicated loss curve
    np.testing.assert_allclose(mp_losses[0], mp_losses[1], rtol=0, atol=0)

    # reference: same config on the single-process 8-device mesh
    scene = build_scene()
    cfg = train_config()
    state, log = train_surfacenet(
        scene, cfg, n_steps=4,
        checkpoint_dir=str(tmp_path / "ckpt_ref"), mesh=make_mesh(),
    )
    np.testing.assert_allclose(
        mp_losses[0], log.losses, rtol=1e-5, atol=1e-6
    )
    # the collective Orbax save landed on the shared filesystem
    assert (tmp_path / "ckpt" / "step_4").exists()


def test_two_process_cli_reconstruct(tmp_path):
    """The CLI end of the multi-process path: two `cli reconstruct --sharded`
    processes joined via the COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID
    environment (parallel.distributed.init_distributed); process 0 exports,
    process 1 reports local cubes and writes nothing."""
    from surfacenet_tpu.data.dtu import write_scan
    from surfacenet_tpu.utils.ply import read_ply
    from tests.mp_worker import build_scene

    scene = build_scene()
    scan_dir = str(tmp_path / "scan")
    write_scan(scan_dir, scene.images, scene.Ps,
               scene.bbox_min, scene.bbox_max)
    out = str(tmp_path / "out.ply")
    coord = f"127.0.0.1:{_free_port()}"
    base_env = dict(os.environ)
    base_env.pop("XLA_FLAGS", None)
    base_env.pop("PALLAS_AXON_POOL_IPS", None)
    base_env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        COORDINATOR_ADDRESS=coord, NUM_PROCESSES="2",
    )
    argv = [
        sys.executable, "-m", "surfacenet_tpu.cli", "reconstruct",
        "--scan", scan_dir, "--out", out, "--sharded",
        "--ledger", str(tmp_path / "ledgers"),
        "--set", "voxel.cube_size=16",
        "--set", "voxel.voxel_size_mm=2.0",
        "--set", "voxel.overlap=4",
        "--set", "fusion.n_view_pairs=3",
        "--set", "fusion.tau=0.25",
        "--set", "sweep.cube_batch=4",
        "--set", "mesh.block_axis=2",
    ]
    procs = [
        subprocess.Popen(
            argv, env={**base_env, "PROCESS_ID": str(i)}, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            o, _ = p.communicate(timeout=420)
            outs.append(o)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"cli proc {i}\n{o[-4000:]}"
    assert "wrote" in outs[0]
    assert "export is on process 0" in outs[1]
    pts, _ = read_ply(out)
    assert len(pts) > 50
