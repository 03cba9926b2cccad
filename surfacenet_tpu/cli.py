"""Command-line entry points (the reference's `main.py` / `train.py` role).

    python -m surfacenet_tpu.cli reconstruct --scan DIR --out out.ply ...
    python -m surfacenet_tpu.cli train --scan DIR --steps N ...
    python -m surfacenet_tpu.cli selftest          # synthetic golden run
    python -m surfacenet_tpu.cli bench             # cubes/s on this chip

Config handling: --config loads a JSON config tree; --preset picks one of
the 5 BASELINE operating points (config.baseline_config); individual
--set voxel.cube_size=64 overrides follow.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np



def _apply_overrides(cfg, sets):
    for item in sets or []:
        path, _, raw = item.partition("=")
        keys = path.split(".")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        if isinstance(val, list):
            val = tuple(val)  # config fields are hashable tuples
        node = cfg
        parents = []
        for k in keys[:-1]:
            parents.append((node, k))
            node = getattr(node, k)
        node = dataclasses.replace(node, **{keys[-1]: val})
        for parent, k in reversed(parents):
            node = dataclasses.replace(parent, **{k: node})
        cfg = node
    return cfg


def _load_config(args):
    from surfacenet_tpu.config import Config, baseline_config

    if getattr(args, "preset", None):
        cfg = baseline_config(args.preset)
    elif getattr(args, "config", None):
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    else:
        cfg = Config()
    return _apply_overrides(cfg, getattr(args, "set", None))


def _load_model_variables(checkpoint, cfg):
    """(model, variables) from a checkpoint path: accepts both params-only
    inference weights (e.g. the shipped ``weights/``) and full
    training-state checkpoint dirs."""
    from surfacenet_tpu.models.surfacenet import SurfaceNet
    from surfacenet_tpu.train.train_surface import (
        load_pretrained, restore_checkpoint,
    )

    if os.path.isdir(
        os.path.join(checkpoint, "params")
    ) or os.path.exists(os.path.join(checkpoint, "_CHECKPOINT_METADATA")):
        model, variables = load_pretrained(checkpoint, cfg)
        print(f"using pretrained weights {checkpoint}")
    else:
        state, step = restore_checkpoint(checkpoint, cfg)
        model = SurfaceNet(cfg.model)
        variables = {
            "params": state.params,
            "batch_stats": state.batch_stats,
        }
        print(f"using checkpoint step {step}")
    # host copies: the predictor closes over these, and numpy consts are
    # safe to bake into jitted programs on any mesh — including N-process
    # meshes, where captured single-device jax.Arrays would be rejected.
    import jax

    variables = jax.tree_util.tree_map(np.asarray, variables)
    return model, variables


def _load_predictor(checkpoint, cfg):
    """Predictor from a checkpoint path; falls back to the
    photoconsistency oracle when None."""
    from surfacenet_tpu.pipeline.sweep import photoconsistency_predictor

    if not checkpoint:
        print("no checkpoint: using photoconsistency predictor")
        return photoconsistency_predictor

    from surfacenet_tpu.models.surfacenet import make_predictor

    model, variables = _load_model_variables(checkpoint, cfg)
    return make_predictor(model, variables, cfg.model)


def _make_pair_selector(pairnet_dir, cfg, scan):
    """Learned pair selector from a trained pairnet checkpoint, or None.

    Uses the cube-LOCAL consensus selector: per-cube view gates from the
    triplet embedding exclude occluded/specular views for exactly the
    cubes they corrupt (measured on the occluded golden scene: 23% better
    overall than geometric selection; the scene-global similarity matrix
    was a tie — results/occlusion_r03.json)."""
    if not pairnet_dir:
        return None
    import functools

    from surfacenet_tpu.ops.view_pairs import select_pairs_learned_local
    from surfacenet_tpu.train.train_pair import restore_pairnet

    model, variables = restore_pairnet(pairnet_dir, cfg)
    print(f"using learned pair weights from {pairnet_dir}")
    return functools.partial(
        select_pairs_learned_local,
        n_pairs=cfg.fusion.n_view_pairs,
        image_hw=scan.images.shape[1:3],
        extent_mm=cfg.voxel.cube_extent_mm,
        images=scan.images,
        model=model,
        variables=variables,
        patch_size=cfg.pairnet.patch_size,
    )


def _degrade_or_die(args, why: str) -> None:
    """An explicitly requested parallel layout that cannot be honored is a
    hard error (on a real N-chip job a silent fallback is a silent N-x
    slowdown); --allow-unsharded opts back into the old print-and-continue
    behavior (VERDICT r2 weak #6)."""
    if getattr(args, "allow_unsharded", False):
        print(f"{why}; running unsharded (--allow-unsharded)")
        return
    raise SystemExit(
        f"error: {why}. Fix the mesh/batch request, or pass "
        f"--allow-unsharded to accept the unsharded fallback."
    )


def cmd_reconstruct(args):
    from surfacenet_tpu.data.dtu import load_scan

    cfg = _load_config(args)
    if args.colmap:
        from surfacenet_tpu.data.colmap import load_colmap_scan

        scan = load_colmap_scan(args.scan, downsample=args.downsample)
    else:
        scan = load_scan(args.scan, downsample=args.downsample)
    if args.bbox:
        vals = [float(v) for v in args.bbox.split(",")]
        if len(vals) != 6:
            raise SystemExit(
                f"--bbox needs 6 comma-separated numbers "
                f"(x0,y0,z0,x1,y1,z1), got {len(vals)}"
            )
        scan.bbox_min = np.asarray(vals[:3])
        scan.bbox_max = np.asarray(vals[3:])
    if scan.bbox_min is None:
        from surfacenet_tpu.geometry.camera import estimate_bbox_from_cameras

        scan.bbox_min, scan.bbox_max = estimate_bbox_from_cameras(scan.Ps)
        print(
            f"no bbox given; estimated from cameras: "
            f"{np.round(scan.bbox_min, 1)} .. {np.round(scan.bbox_max, 1)}"
        )

    predictor = _load_predictor(args.checkpoint, cfg)
    pair_selector = _make_pair_selector(
        getattr(args, "pairnet", None), cfg, scan
    )

    sharded = args.sharded or cfg.mesh.block_axis > 1
    if sharded:
        # init the distributed runtime BEFORE the first backend touch
        # (jax.devices()), or multi-host discovery cannot happen.
        from surfacenet_tpu.parallel.distributed import init_distributed

        init_distributed()
        import jax

        n_dev = len(jax.devices())
        n_block = max(cfg.mesh.block_axis, 1)
        if n_dev < 2 or n_dev % n_block != 0:
            _degrade_or_die(
                args,
                f"sharded sweep needs block_axis={n_block} to divide the "
                f"{n_dev} available device(s)",
            )
            sharded = False
    metrics = None
    if getattr(args, "metrics_out", None):
        from surfacenet_tpu.utils.observability import Metrics

        metrics = Metrics(args.metrics_out)
    if sharded:
        from surfacenet_tpu.parallel.sweep_sharded import run_sweep_sharded
        store, stats = run_sweep_sharded(
            scan.images, scan.Ps, scan.bbox_min, scan.bbox_max, cfg,
            predictor, pair_selector=pair_selector,
            ledger_dir=args.ledger, metrics=metrics,
        )
        print(
            f"sharded sweep: {stats.n_rounds} rounds, "
            f"{stats.cubes_per_s:.1f} cubes/s, "
            f"per-block cubes {stats.per_block_cubes}"
        )
    else:
        from surfacenet_tpu.pipeline.sweep import run_sweep

        store, stats = run_sweep(
            scan.images, scan.Ps, scan.bbox_min, scan.bbox_max, cfg,
            predictor, pair_selector=pair_selector,
            ledger_path=args.ledger, metrics=metrics,
        )
    import jax

    if jax.process_count() > 1 and jax.process_index() != 0:
        # non-zero processes hold only their own blocks; process 0 merged
        # every block ledger and owns the export.
        print(
            f"process {jax.process_index()}: swept "
            f"{len(store)} local cube(s); export is on process 0"
        )
        return
    min_comp = (
        args.min_component if args.min_component is not None
        else cfg.fusion.min_component
    )
    n = store.export_ply(
        args.out, min_component=min_comp,
        keep_top_components=args.keep_top_components,
    )
    print(
        f"wrote {n} points to {args.out}; "
        f"{stats.n_cubes_nonempty}/{stats.n_cubes_after_prefilter} cubes "
        f"non-empty"
    )


def cmd_train(args):
    import jax

    from surfacenet_tpu.data.dtu import load_scan
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.train.train_surface import train_surfacenet

    cfg = _load_config(args)
    if args.scan:
        if not args.gt:
            raise SystemExit(
                "--scan training needs --gt pointing at the GT point-cloud "
                ".ply (DTU reference scan)"
            )
        from surfacenet_tpu.data.scene import PointCloudScene

        scan = load_scan(args.scan, downsample=args.downsample)
        scene = PointCloudScene.from_scan(scan, args.gt)
    elif args.synthetic == "tori":
        from surfacenet_tpu.data.synthetic import make_tori_scene

        scene = make_tori_scene(n_views=8, hw=(240, 320))
    else:
        scene = make_sphere_scene(n_views=8, hw=(240, 320))
    mesh = None
    if args.sharded:
        from surfacenet_tpu.parallel.distributed import init_distributed
        from surfacenet_tpu.parallel.mesh import make_mesh

        init_distributed()
        n_dev = len(jax.devices())
        if cfg.train.batch_size % n_dev:
            _degrade_or_die(
                args,
                f"train --sharded needs batch_size="
                f"{cfg.train.batch_size} to be a multiple of the {n_dev} "
                f"device(s)",
            )
        else:
            mesh = make_mesh()
    state = None
    start_step = 0
    if args.resume:
        from surfacenet_tpu.train.train_surface import restore_checkpoint

        steps = []
        if os.path.isdir(args.checkpoint_dir):
            steps = [
                int(d.split("_")[1])
                for d in os.listdir(args.checkpoint_dir)
                if d.startswith("step_")
            ]
        if steps:
            state, start_step = restore_checkpoint(
                args.checkpoint_dir, cfg
            )
            print(f"resuming from step {start_step}")
            if start_step >= args.steps:
                print(
                    f"checkpoint step {start_step} >= --steps "
                    f"{args.steps}; nothing to do"
                )
                return
        else:
            print(
                f"--resume: no step_* checkpoints in "
                f"{args.checkpoint_dir}; starting fresh"
            )
    state, log = train_surfacenet(
        scene, cfg, n_steps=args.steps, state=state,
        checkpoint_dir=args.checkpoint_dir, log_every=args.log_every,
        mesh=mesh, start_step=start_step,
    )
    print(
        f"trained steps {start_step}..{args.steps}; loss "
        f"{log.losses[0]:.4f} -> {log.losses[-1]:.4f}"
    )


def cmd_train_pairnet(args):
    """Triplet training of the view-pair weighting net (SURVEY.md C12)."""
    from surfacenet_tpu.data.synthetic import make_sphere_scene
    from surfacenet_tpu.train.train_pair import save_pairnet, train_pairnet

    cfg = _load_config(args)
    if args.scan:
        if not args.gt:
            raise SystemExit(
                "--scan training needs --gt pointing at the GT point-cloud"
            )
        from surfacenet_tpu.data.dtu import load_scan
        from surfacenet_tpu.data.scene import PointCloudScene

        scan = load_scan(args.scan, downsample=args.downsample)
        scene = PointCloudScene.from_scan(scan, args.gt)
    else:
        scene = make_sphere_scene(n_views=8, hw=(240, 320))
    model, variables, losses = train_pairnet(
        scene, cfg, n_steps=args.steps, lr=args.lr
    )
    save_pairnet(args.checkpoint_dir, variables, step=args.steps)
    print(
        f"trained pairnet {args.steps} steps; loss {losses[0]:.4f} -> "
        f"{losses[-1]:.4f}; saved to "
        f"{args.checkpoint_dir}/pairnet_{args.steps}"
    )


def cmd_selftest(args):
    from surfacenet_tpu.config import Config, FusionConfig, SweepConfig, VoxelConfig
    from surfacenet_tpu.data.synthetic import make_sphere_scene, make_tori_scene
    from surfacenet_tpu.pipeline.sweep import (
        photoconsistency_predictor,
        run_sweep,
    )
    from surfacenet_tpu.utils.metrics import accuracy_completeness

    hard = getattr(args, "scene", "sphere") == "tori"
    cfg = Config(
        voxel=VoxelConfig(voxel_size_mm=2.0, cube_size=16, overlap=4),
        fusion=FusionConfig(
            n_view_pairs=3, tau=0.25, gamma=0.6,
            # the 10mm tube is 5 voxels at s=2: window must stay 1 voxel
            # (see tests/test_golden_tori.py)
            **({"pool_window_vox": 1, "ray_pool_mode": "affine"}
               if hard else {}),
        ),
        sweep=SweepConfig(cube_batch=8),
    )
    scene = (
        make_tori_scene(n_views=8, hw=(120, 160))
        if hard
        else make_sphere_scene(n_views=8, hw=(120, 160))
    )
    store, stats = run_sweep(
        scene.images, scene.Ps, scene.bbox_min, scene.bbox_max, cfg,
        photoconsistency_predictor,
    )
    pts, _, _ = store.merge()
    acc, comp = accuracy_completeness(pts, scene.surface_points(4000))
    print(
        f"selftest: {len(pts)} points, accuracy {acc:.2f}mm, "
        f"completeness {comp:.2f}mm "
        f"({stats.n_cubes_nonempty}/{stats.n_cubes_after_prefilter} cubes)"
    )


def cmd_reconstruct_all(args):
    """Batch reconstruction over an eval split (BASELINE config 3).

    Each scan directory under --root (or listed via --scans) is swept with
    the shared config/checkpoint; per-scan .ply + metrics land in --out-dir
    (per-scan ledger files make the whole split restartable).
    """
    import glob
    import json as _json
    import time

    cfg = _load_config(args)
    scan_dirs = (
        args.scans if args.scans
        else sorted(glob.glob(os.path.join(args.root, "scan*")))
    )
    if not scan_dirs:
        raise SystemExit("no scans found")
    os.makedirs(args.out_dir, exist_ok=True)

    from surfacenet_tpu.data.dtu import load_scan
    from surfacenet_tpu.geometry.camera import estimate_bbox_from_cameras
    from surfacenet_tpu.pipeline.sweep import run_sweep

    predictor = _load_predictor(args.checkpoint, cfg)

    sharded = getattr(args, "sharded", False) or cfg.mesh.block_axis > 1
    if sharded:
        from surfacenet_tpu.parallel.distributed import init_distributed

        init_distributed()
        import jax

        n_dev = len(jax.devices())
        n_block = max(cfg.mesh.block_axis, 1)
        if n_dev < 2 or n_dev % n_block != 0:
            _degrade_or_die(
                args,
                f"sharded sweep needs block_axis={n_block} to divide the "
                f"{n_dev} available device(s)",
            )
            sharded = False

    report = {}
    for sd in scan_dirs:
        name = os.path.basename(os.path.normpath(sd))
        scan = load_scan(sd, downsample=args.downsample)
        if scan.bbox_min is None:
            scan.bbox_min, scan.bbox_max = estimate_bbox_from_cameras(
                scan.Ps
            )
        t0 = time.perf_counter()
        pair_selector = _make_pair_selector(
            getattr(args, "pairnet", None), cfg, scan
        )
        if sharded:
            from surfacenet_tpu.parallel.sweep_sharded import (
                run_sweep_sharded,
            )

            store, stats = run_sweep_sharded(
                scan.images, scan.Ps, scan.bbox_min, scan.bbox_max, cfg,
                predictor, pair_selector=pair_selector,
                ledger_dir=os.path.join(args.out_dir, f"{name}.ledgers"),
            )
        else:
            store, stats = run_sweep(
                scan.images, scan.Ps, scan.bbox_min, scan.bbox_max, cfg,
                predictor, pair_selector=pair_selector,
                ledger_path=os.path.join(
                    args.out_dir, f"{name}.ledger.jsonl"
                ),
            )
        out_ply = os.path.join(args.out_dir, f"{name}.ply")
        min_comp = (
            args.min_component if args.min_component is not None
            else cfg.fusion.min_component
        )
        n = store.export_ply(out_ply, min_component=min_comp)
        dt = time.perf_counter() - t0
        report[name] = {
            "points": n,
            "cubes": stats.n_cubes_after_prefilter,
            "seconds": round(dt, 2),
        }
        line = (f"{name}: {n} points, "
                f"{stats.n_cubes_after_prefilter} cubes, {dt:.1f}s")
        if getattr(args, "gt_dir", None):
            gt_ply = os.path.join(args.gt_dir, f"{name}.ply")
            if os.path.exists(gt_ply) and n:
                from surfacenet_tpu.utils.metrics import (
                    accuracy_completeness,
                )
                from surfacenet_tpu.utils.ply import read_ply

                pts, _, _ = store.merge(min_component=min_comp)
                gt, _ = read_ply(gt_ply)
                # same 20mm DTU-protocol truncation as `cli eval`
                acc, comp = accuracy_completeness(pts, gt, max_dist=20.0)
                report[name].update(
                    acc_mm=round(float(acc), 4),
                    comp_mm=round(float(comp), 4),
                    overall_mm=round(float(acc + comp) / 2, 4),
                )
                line += (f", acc {acc:.3f}mm comp {comp:.3f}mm")
                if getattr(args, "protocol", "clamp") == "dtu":
                    # official semantics: accuracy masked to the region
                    # >= 2 camera frusta observe (the structured-light
                    # analog for camera-only data), outliers dropped,
                    # medians alongside (utils.metrics.dtu_eval)
                    from surfacenet_tpu.utils.metrics import (
                        ObsMask, dtu_eval,
                    )

                    mask = ObsMask.from_cameras(
                        scan.Ps, scan.images.shape[1:3],
                        scan.bbox_min, scan.bbox_max,
                        res_mm=4.0 * cfg.voxel.voxel_size_mm,
                    )
                    r = dtu_eval(pts, gt, max_dist=20.0, obs_mask=mask)
                    report[name]["dtu"] = {
                        k: (round(v, 4) if isinstance(v, float) else v)
                        for k, v in r.items()
                    }
                    line += (
                        f" | dtu acc {r['acc_mean_mm']:.3f} "
                        f"comp {r['comp_mean_mm']:.3f}"
                    )
            elif not os.path.exists(gt_ply):
                print(f"{name}: no GT at {gt_ply}; skipping metrics")
            else:
                print(f"{name}: empty prediction; skipping metrics")
        print(f"{line} -> {out_ply}")
    # split-level means over scans that have metrics (the DTU protocol's
    # per-split mean acc/comp table)
    scored = [r for r in report.values() if "acc_mm" in r]
    if scored:
        report["_mean"] = {
            k: round(sum(r[k] for r in scored) / len(scored), 4)
            for k in ("acc_mm", "comp_mm", "overall_mm")
        }
        print(f"split mean: {report['_mean']}")
        dtu_scored = [r["dtu"] for r in scored if "dtu" in r]
        if dtu_scored:
            report["_mean_dtu"] = {
                k: round(
                    sum(d[k] for d in dtu_scored) / len(dtu_scored), 4
                )
                for k in ("acc_mean_mm", "comp_mean_mm", "overall_mm")
            }
            print(f"split mean (dtu protocol): {report['_mean_dtu']}")
    with open(os.path.join(args.out_dir, "report.json"), "w") as f:
        _json.dump(report, f, indent=2)


def cmd_eval(args):
    """DTU-style evaluation: predicted .ply vs GT points .ply.

    Default: clamped means over all points (accuracy_completeness — the
    golden tests' conservative metric).  --protocol dtu switches to the
    official DTU semantics (dtu_eval): outliers dropped, medians reported,
    and optional --obs-mask (.npz from ObsMask.save) / --plane a,b,c,d
    masking of accuracy / completeness respectively.
    """
    from surfacenet_tpu.utils.metrics import (
        ObsMask, accuracy_completeness, dtu_eval,
    )
    from surfacenet_tpu.utils.ply import read_ply

    pred, _ = read_ply(args.pred)
    gt, _ = read_ply(args.gt)
    if args.protocol == "dtu":
        mask = ObsMask.load(args.obs_mask) if args.obs_mask else None
        plane = (
            [float(x) for x in args.plane.split(",")] if args.plane
            else None
        )
        r = dtu_eval(
            pred, gt, max_dist=args.max_dist, obs_mask=mask, plane=plane,
        )
        print(
            f"accuracy {r['acc_mean_mm']:.4f}mm "
            f"(median {r['acc_median_mm']:.4f})  "
            f"completeness {r['comp_mean_mm']:.4f}mm "
            f"(median {r['comp_median_mm']:.4f})  "
            f"overall {r['overall_mm']:.4f}mm  "
            f"({r['n_pred_eval']}/{r['n_pred_total']} pred, "
            f"{r['n_gt_eval']}/{r['n_gt_total']} gt scored; outliers "
            f"dropped: {r['acc_outlier_frac']:.1%} acc, "
            f"{r['comp_outlier_frac']:.1%} comp)"
        )
        return
    acc, comp = accuracy_completeness(pred, gt, max_dist=args.max_dist)
    overall = 0.5 * (acc + comp)
    print(
        f"accuracy {acc:.4f}mm  completeness {comp:.4f}mm  "
        f"overall {overall:.4f}mm  ({len(pred)} pred / {len(gt)} gt points)"
    )


def cmd_export(args):
    """Serialize the trained forward for serving (jax.export / StableHLO).

    The artifact bakes the checkpoint's params in as constants and has a
    fixed ``(batch, D, D, D, 6) -> (batch, D, D, D)`` signature; a serving
    process loads it with ``jax.export.deserialize(path.read_bytes())``
    and calls ``.call(x)`` — no model definitions or flax needed.  Export
    cross-platform with ``--platforms tpu,cpu`` (the reference shipped
    Lasagne .pkl weights usable only inside Theano; this is the TPU-native
    deployment analog, SURVEY.md C13).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    cfg = _load_config(args)
    if not args.checkpoint:
        raise SystemExit("export needs --checkpoint")
    from surfacenet_tpu.models.surfacenet import make_predictor

    model, variables = _load_model_variables(args.checkpoint, cfg)
    predict = make_predictor(model, variables, cfg.model)
    fn = jax.jit(lambda x: predict(x, None))
    D = cfg.voxel.cube_size
    spec = jax.ShapeDtypeStruct(
        (args.batch, D, D, D, cfg.model.in_channels), jnp.float32
    )
    platforms = args.platforms.split(",") if args.platforms else None
    exp = jexport.export(fn, platforms=platforms)(spec)
    data = exp.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    print(
        f"exported forward {spec.shape} -> {args.out} "
        f"({len(data) / 1e6:.1f} MB, platforms="
        f"{platforms or [jax.default_backend()]})"
    )
    if args.selfcheck:
        rt = jexport.deserialize(bytearray(data))
        x = jax.random.uniform(jax.random.PRNGKey(0), spec.shape) - 0.5
        got = np.asarray(rt.call(x))
        want = np.asarray(fn(x))
        err = float(np.abs(got - want).max())
        print(f"selfcheck: max |deserialized - direct| = {err:.2e}")
        if err > 1e-5:
            raise SystemExit("selfcheck FAILED")


def cmd_bench(args):
    import bench

    bench.main()


def main(argv=None):
    p = argparse.ArgumentParser(prog="surfacenet_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("reconstruct", help="sweep a scan -> .ply")
    pr.add_argument("--scan", required=True)
    pr.add_argument("--colmap", action="store_true",
                    help="scan dir is a COLMAP sparse model")
    pr.add_argument("--out", default="out.ply")
    pr.add_argument("--bbox", help="x0,y0,z0,x1,y1,z1 (mm); default: estimate from cameras")
    pr.add_argument("--checkpoint")
    pr.add_argument("--pairnet",
                    help="trained pairnet checkpoint dir -> learned pair "
                         "weights (default: geometric selector)")
    pr.add_argument("--sharded", action="store_true",
                    help="mesh-sharded sweep (auto when mesh.block_axis>1); "
                         "--ledger is then a directory of per-block ledgers")
    pr.add_argument("--allow-unsharded", action="store_true",
                    help="accept an unsharded fallback instead of "
                         "erroring when the requested mesh/batch "
                         "layout is unusable")
    pr.add_argument("--ledger")
    pr.add_argument("--metrics-out",
                    help="append a JSONL record of sweep counters/gauges "
                         "(cubes, occupancy, truncation re-fetches) here")
    pr.add_argument("--min-component", type=int, default=None,
                    help="denoise: drop merged-voxel clusters smaller than "
                         "this (default: fusion.min_component from config)")
    pr.add_argument("--keep-top-components", type=int, default=None,
                    help="denoise: keep only the N largest clusters")
    pr.add_argument("--downsample", type=int, default=1)
    pr.add_argument("--preset")
    pr.add_argument("--config")
    pr.add_argument("--set", action="append")
    pr.set_defaults(fn=cmd_reconstruct)

    pt = sub.add_parser("train", help="train SurfaceNet")
    pt.add_argument("--scan")
    pt.add_argument("--gt", help="GT point-cloud .ply for --scan training")
    pt.add_argument(
        "--synthetic", choices=("sphere", "tori"), default="sphere",
        help="golden scene to train on when no --scan is given",
    )
    pt.add_argument(
        "--sharded", action="store_true",
        help="data-parallel training over all devices (mesh dp; "
        "batch_size must be a multiple of the device count)",
    )
    pt.add_argument("--allow-unsharded", action="store_true",
                    help="accept an unsharded fallback instead of "
                         "erroring when the requested mesh/batch "
                         "layout is unusable")
    pt.add_argument("--downsample", type=int, default=1)
    pt.add_argument("--steps", type=int, default=1000)
    pt.add_argument("--checkpoint-dir", default="checkpoints")
    pt.add_argument("--log-every", type=int, default=50)
    pt.add_argument(
        "--resume", action="store_true",
        help="continue from the latest step_* checkpoint in "
        "--checkpoint-dir (params + optimizer state + step; the LR "
        "schedule and checkpoint numbering continue).  No-op when the "
        "directory has no checkpoints yet, so preemption-safe loops can "
        "always pass it.",
    )
    pt.add_argument("--preset")
    pt.add_argument("--config")
    pt.add_argument("--set", action="append")
    pt.set_defaults(fn=cmd_train)

    pp = sub.add_parser(
        "train-pairnet", help="triplet-train the view-pair weighting net"
    )
    pp.add_argument("--scan")
    pp.add_argument("--gt", help="GT point-cloud .ply for --scan training")
    pp.add_argument("--downsample", type=int, default=1)
    pp.add_argument("--steps", type=int, default=2000)
    pp.add_argument("--lr", type=float, default=1e-3)
    pp.add_argument("--checkpoint-dir", default="checkpoints")
    pp.add_argument("--preset")
    pp.add_argument("--config")
    pp.add_argument("--set", action="append")
    pp.set_defaults(fn=cmd_train_pairnet)

    pa = sub.add_parser(
        "reconstruct-all", help="sweep every scan of an eval split"
    )
    pa.add_argument("--root", help="directory containing scan*/ dirs")
    pa.add_argument("--scans", nargs="*", help="explicit scan dirs")
    pa.add_argument("--out-dir", default="results")
    pa.add_argument("--gt-dir",
                    help="directory of <scanname>.ply GT clouds; when given, "
                         "per-scan acc/comp + split means go into report.json")
    pa.add_argument("--checkpoint")
    pa.add_argument("--pairnet",
                    help="trained pairnet checkpoint dir -> learned pair "
                         "weights (default: geometric selector)")
    pa.add_argument("--sharded", action="store_true",
                    help="mesh-sharded sweeps (auto when mesh.block_axis>1); "
                         "per-scan ledgers become directories")
    pa.add_argument("--allow-unsharded", action="store_true",
                    help="accept an unsharded fallback instead of "
                         "erroring when the requested mesh/batch "
                         "layout is unusable")
    pa.add_argument("--min-component", type=int, default=None,
                    help="denoise: drop merged-voxel clusters smaller than "
                         "this (default: fusion.min_component from config)")
    pa.add_argument("--protocol", choices=("clamp", "dtu"),
                    default="clamp",
                    help="dtu: add official-protocol metrics per scan "
                         "(camera-derived obs mask, dropped outliers, "
                         "medians) alongside the clamped defaults")
    pa.add_argument("--downsample", type=int, default=1)
    pa.add_argument("--preset")
    pa.add_argument("--config")
    pa.add_argument("--set", action="append")
    pa.set_defaults(fn=cmd_reconstruct_all)

    ps = sub.add_parser("selftest", help="synthetic golden-scene run")
    ps.add_argument(
        "--scene", choices=("sphere", "tori"), default="sphere",
        help="golden scene (tori = occlusions/concavities stress)",
    )
    ps.set_defaults(fn=cmd_selftest)

    pe = sub.add_parser("eval", help="evaluate predicted .ply vs GT .ply")
    pe.add_argument("--pred", required=True)
    pe.add_argument("--gt", required=True)
    pe.add_argument("--max-dist", type=float, default=20.0,
                    help="distance truncation (DTU protocol), mm")
    pe.add_argument("--protocol", choices=("clamp", "dtu"),
                    default="clamp",
                    help="clamp: clamped means over all points; dtu: "
                         "official semantics (drop outliers, medians, "
                         "obs-mask/plane filtering)")
    pe.add_argument("--obs-mask",
                    help=".npz observability mask (ObsMask.save / "
                         "ObsMask.from_cameras); dtu protocol only")
    pe.add_argument("--plane",
                    help="a,b,c,d — keep GT points with ax+by+cz+d>0 "
                         "for completeness; dtu protocol only")
    pe.set_defaults(fn=cmd_eval)

    px = sub.add_parser(
        "export", help="serialize the trained forward for serving"
    )
    px.add_argument("--checkpoint", required=True)
    px.add_argument("--out", default="surfacenet_fwd.stablehlo")
    px.add_argument("--batch", type=int, default=160,
                    help="items (cube x view-pair) per serving call")
    px.add_argument("--platforms",
                    help="comma list of target platforms (tpu,cpu,cuda); "
                         "default: current backend")
    px.add_argument("--selfcheck", action="store_true",
                    help="deserialize and compare against the direct apply")
    px.add_argument("--preset")
    px.add_argument("--config")
    px.add_argument("--set", action="append")
    px.set_defaults(fn=cmd_export)

    pb = sub.add_parser("bench", help="throughput benchmark")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
