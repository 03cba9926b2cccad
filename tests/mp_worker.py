"""One process of a real N-process JAX CPU cluster (tests/test_multiprocess.py).

Launched as:  python tests/mp_worker.py ROLE COORD PROC_ID NPROC WORKDIR

Each process gets 4 virtual CPU devices; jax.distributed.initialize joins
them into one 8-device cluster, after which the production code paths
(run_sweep_sharded / train_surfacenet) run exactly as they would on a
2-host TPU slice: global arrays assembled from addressable shards,
process-local harvest + ledger IO, merge/export gated on process 0.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_scene():
    from surfacenet_tpu.data.synthetic import make_sphere_scene

    return make_sphere_scene(n_views=8, hw=(120, 160))


def sweep_config():
    from surfacenet_tpu.config import (
        Config, FusionConfig, MeshConfig, SweepConfig, VoxelConfig,
    )

    return Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        fusion=FusionConfig(n_view_pairs=3, tau=0.25, gamma=0.6),
        sweep=SweepConfig(cube_batch=4),
        mesh=MeshConfig(block_axis=2),
    )


def train_config():
    from surfacenet_tpu.config import (
        Config, ModelConfig, TrainConfig, VoxelConfig,
    )

    return Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        model=ModelConfig.tiny(),
        train=TrainConfig(
            batch_size=8, lr=1e-3, seed=0, n_steps=4, scan_chunk=2,
        ),
    )


def main():
    role, coord, pid, nproc, workdir = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
        sys.argv[5],
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    import jax

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    scene = build_scene()

    if role == "sweep":
        from surfacenet_tpu.parallel.sweep_sharded import run_sweep_sharded
        from surfacenet_tpu.pipeline.sweep import photoconsistency_predictor

        cfg = sweep_config()
        store, stats = run_sweep_sharded(
            scene.images, scene.Ps, scene.bbox_min, scene.bbox_max,
            cfg, photoconsistency_predictor,
            ledger_dir=os.path.join(workdir, "ledgers"),
        )
        if jax.process_index() == 0:
            pts, probs, colors = store.merge()
            n = store.export_ply(os.path.join(workdir, "mp.ply"))
            with open(os.path.join(workdir, "stats0.json"), "w") as f:
                json.dump(
                    {
                        "n_points": int(n),
                        "n_cubes_after_prefilter": int(
                            stats.n_cubes_after_prefilter
                        ),
                        "per_block_cubes": list(stats.per_block_cubes),
                    },
                    f,
                )
        else:
            # non-zero processes own only their blocks
            with open(
                os.path.join(workdir, f"stats{jax.process_index()}.json"),
                "w",
            ) as f:
                json.dump({"n_local_cubes": len(store)}, f)
    elif role == "train":
        from surfacenet_tpu.parallel.mesh import make_mesh
        from surfacenet_tpu.train.train_surface import train_surfacenet

        cfg = train_config()
        mesh = make_mesh()  # (1, 8): pure dp across both processes
        state, log = train_surfacenet(
            scene, cfg, n_steps=4,
            checkpoint_dir=os.path.join(workdir, "ckpt"),
            mesh=mesh,
        )
        with open(
            os.path.join(workdir, f"train{jax.process_index()}.json"), "w"
        ) as f:
            json.dump({"losses": [float(l) for l in log.losses]}, f)
    else:
        raise SystemExit(f"unknown role {role}")

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
