"""Mesh-sharded scene sweep (SURVEY.md SS7 step 8, BASELINE configs 3-4).

Parallel structure over a (block, cube) mesh:

  * ``block`` axis: the scene's cube lattice is partitioned into contiguous
    slabs along its longest axis; each block shard owns its cubes' work
    items and its slice of the restartable ledger.  This is the spatial
    (context-parallel) axis — on a multi-host slice each host owns blocks,
    so result accumulation and ledger IO are host-local, and only the small
    boundary-overlap records cross hosts at merge time.
  * ``cube`` axis: data parallel over cube work items within a block.

Each round runs ONE jitted device program (pipeline.sweep.cube_batch_step)
on a global batch sharded over both mesh axes; the host then scatters
results into per-block sparse stores.  Per-round scaling metrics
(cubes/s, per-block occupancy) feed the BASELINE scaling-efficiency report.

Multi-process: call jax.distributed.initialize() (or
parallel.distributed.init_distributed) before building the mesh.  Every
process runs the identical deterministic host loop (enumerate, prefilter,
partition, pair selection), so all processes hold the same global batch
bytes; global device arrays are then assembled shard-by-addressable-shard
(parallel.mesh.global_put), each round's results are harvested only for
the blocks whose mesh row lives on this process (parallel.mesh.fetch_rows),
and each process appends only its own blocks' ledgers.  The shared
filesystem (the TPU-pod norm: NFS/GCS) is the cross-process result channel:
after a device barrier, process 0 rehydrates every block ledger into the
merged store — export/report is gated on process 0 (ledger_dir is therefore
REQUIRED when process_count > 1, and block_axis must be a multiple of the
process count so block rows are host-local).  Single-process multi-device
(including the CPU-emulated 8-device test mesh) follows the same code path
with global_put degenerating to device_put.  Tested with a real 2-process
CPU cluster in tests/test_multiprocess.py.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from surfacenet_tpu.config import Config
from surfacenet_tpu.parallel.mesh import (
    cube_sharded, fetch_rows, global_put, make_mesh, replicated,
)
from surfacenet_tpu.pipeline.sparse import CubeResult, SparseCubeStore
from surfacenet_tpu.pipeline.sweep import (
    Predictor,
    SweepStats,
    _resolve_compact_k,
    core_bounds_for,
    cube_batch_step,
    enumerate_cubes,
    prefilter_cubes,
    resolve_fusion_mode,
    resolve_pool_window,
)


def partition_cubes(grid: np.ndarray, n_block: int) -> List[np.ndarray]:
    """Split cube grid indices into n_block contiguous slabs.

    Slabs are cut along the axis with the largest extent so blocks are as
    chunky as possible (minimizes boundary surface / halo volume).
    Returns a list of index arrays into ``grid``.
    """
    if len(grid) == 0:
        return [np.zeros((0,), int) for _ in range(n_block)]
    extents = grid.max(axis=0) - grid.min(axis=0) + 1
    axis = int(np.argmax(extents))
    order = np.argsort(grid[:, axis], kind="stable")
    return [np.array_split(order, n_block)[b] for b in range(n_block)]


@dataclasses.dataclass
class ShardedSweepStats(SweepStats):
    n_rounds: int = 0
    wall_s: float = 0.0
    cubes_per_s: float = 0.0
    per_block_cubes: Optional[List[int]] = None
    # only populated under measure_device_time: per-round dispatch->ready
    # seconds summed over rounds (device execute + H2D transfer, no host
    # harvest/assembly).  Separates real device scaling from host-side
    # contention on emulated CPU meshes (VERDICT-r2 weak #3).
    device_s: float = 0.0


def run_sweep_sharded(
    images: np.ndarray,
    Ps: np.ndarray,
    bbox_min: np.ndarray,
    bbox_max: np.ndarray,
    cfg: Config,
    predictor: Predictor,
    mesh=None,
    pair_selector: Optional[Callable] = None,
    ledger_dir: Optional[str] = None,
    metrics=None,
    measure_device_time: bool = False,
) -> Tuple[SparseCubeStore, ShardedSweepStats]:
    """Sharded sweep over the mesh; returns a merged store + scaling stats.

    measure_device_time runs rounds sequentially (no double-buffer overlap)
    and accumulates dispatch->block_until_ready seconds into
    ``stats.device_s`` — a measurement mode for scaling reports, slower
    than production by the forfeited harvest/compute overlap.
    """
    from surfacenet_tpu.ops.view_pairs import (
        dedup_view_slots,
        select_pairs_geometric,
    )
    from surfacenet_tpu.pipeline.sweep import resolve_backend_config

    cfg = resolve_backend_config(cfg)

    if cfg.sweep.refine_calib:
        # same self-calibration prepass as the single-host run_sweep
        # (geometry/refine.py).  Runs identically on every process (pure
        # function of replicated inputs), so the refined matrices agree
        # across the cluster without a broadcast.
        from surfacenet_tpu.geometry.refine import refine_calibration_auto

        Ps, rinfo = refine_calibration_auto(
            images, Ps, bbox_min, bbox_max,
            steps_per_level=cfg.sweep.refine_calib_steps,
            n_probes=cfg.sweep.refine_calib_probes,
        )
        if metrics is not None:
            metrics.gauge("refine_calib_max_shift_px", rinfo["max_shift_px"])
            metrics.gauge("refine_calib_passes", rinfo["passes"])

    if mesh is None:
        mesh = make_mesh(
            n_block=cfg.mesh.block_axis,
            axis_names=cfg.mesh.axis_names,
        )
    n_block, n_cube = mesh.devices.shape
    per_round = cfg.sweep.cube_batch * n_block * n_cube

    pi, pc = jax.process_index(), jax.process_count()
    if pc > 1:
        if ledger_dir is None:
            raise ValueError(
                "multi-process sweeps need ledger_dir (a shared directory: "
                "the per-block ledgers are the cross-process result channel)"
            )
        if n_block % pc:
            raise ValueError(
                f"block_axis={n_block} must be a multiple of the "
                f"{pc}-process cluster so block rows are host-local"
            )
    # blocks whose mesh row lives on this process: their batch rows are
    # addressable here, so this process harvests and stores them.
    mine = [
        b for b in range(n_block)
        if all(d.process_index == pi for d in mesh.devices[b].flat)
    ]
    if pc > 1 and len(mine) != n_block // pc:
        raise ValueError(
            f"mesh rows are not process-aligned (process {pi} owns rows "
            f"{mine}); build the mesh with parallel.mesh.make_mesh"
        )
    if metrics is not None and pi != 0:
        metrics = None  # one metrics writer per job

    stats = ShardedSweepStats()
    D = cfg.voxel.cube_size
    s = cfg.voxel.voxel_size_mm
    hw = images.shape[1:3]

    grid, origins = enumerate_cubes(
        np.asarray(bbox_min, np.float64), np.asarray(bbox_max, np.float64),
        cfg,
    )
    stats.n_cubes_total = len(origins)
    lattice_max = grid.max(axis=0) if len(grid) else np.zeros(3, int)
    pool_window = resolve_pool_window(cfg)
    keep = prefilter_cubes(Ps, origins, hw, cfg)
    grid, origins = grid[keep], origins[keep]
    stats.n_cubes_after_prefilter = len(origins)

    # block-partition the surviving cubes
    blocks = partition_cubes(grid, n_block)
    stats.per_block_cubes = [len(b) for b in blocks]

    # per-block stores share one scene frame; block ledgers are separate
    # files so each host owns its slice of restart state.  All processes
    # must read the SAME done-sets (the round schedule is derived from
    # them and must be identical everywhere), so barrier before reading —
    # no process may still be appending from a previous incarnation.
    if pc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("surfacenet_sweep_start")
    stores = []
    todo_blocks = []
    for b, idxs in enumerate(blocks):
        ledger = f"{ledger_dir}/block_{b}.jsonl" if ledger_dir else None
        st = SparseCubeStore(
            scene_origin=np.asarray(bbox_min, np.float64),
            voxel_size_mm=s,
            cube_size=D,
            stride=cfg.voxel.stride,
            ledger_path=ledger,
            occupancy_vote=0.0 if pool_window > 0 else 0.5,
        )
        stores.append(st)
        done = st.done_set()
        mask = np.array([tuple(g) not in done for g in grid[idxs]], bool)
        todo_blocks.append(idxs[mask] if len(idxs) else idxs)

    if pair_selector is None:
        pair_selector = functools.partial(
            select_pairs_geometric, n_pairs=cfg.fusion.n_view_pairs,
            image_hw=hw, extent_mm=cfg.voxel.cube_extent_mm,
            dist_sigma_frac=cfg.fusion.pair_dist_sigma_frac,
        )

    images_d = global_put(np.asarray(images, np.float32), replicated(mesh))
    Ps_d = global_put(np.asarray(Ps, np.float32), replicated(mesh))
    shard = cube_sharded(mesh)

    # mirror run_sweep: the Pallas gather streams fixed-size image crops, so
    # the crop window must be sized from the scene geometry once up front.
    crop_hw = (192, 256)
    chunk_hw = (0, 0)
    if cfg.sweep.use_pallas_gather:
        from surfacenet_tpu.ops.pallas.warp_gather import (
            auto_chunk_hw, auto_crop_hw, gather_tile_d,
        )

        td = gather_tile_d(D)
        crop_hw = auto_crop_hw(Ps, bbox_min, bbox_max, td, s, hw)
        if cfg.sweep.gather_chunk_windows:
            chunk_hw = auto_chunk_hw(
                Ps, bbox_min, bbox_max, td, s, hw, PC=min(td**3, 8192)
            )

    # round-robin: each round takes cube_batch*n_cube items from each block
    cursors = [0] * n_block
    per_block_round = cfg.sweep.cube_batch * n_cube

    # gather-dedup table width: must be compile-stable across rounds (pair
    # selection is per-round here).  Start from the first round's max and
    # widen (one recompile) only if a later round needs more slots.
    ku_state = [0]

    t0 = time.perf_counter()
    n_processed = 0

    def next_round():
        """Assemble + dispatch one round (async); None when work is done."""
        if not any(
            cursors[b] < len(todo_blocks[b]) for b in range(n_block)
        ):
            return None
        # any real cube serves as padding filler (padded results discarded)
        filler = next(
            int(t[0]) for t in todo_blocks if len(t)
        )
        round_items = []
        valid_counts = []
        for b in range(n_block):
            sel = todo_blocks[b][
                cursors[b] : cursors[b] + per_block_round
            ]
            cursors[b] += per_block_round
            valid_counts.append(len(sel))
            n_pad = per_block_round - len(sel)
            if n_pad:
                pad_val = int(sel[0]) if len(sel) else filler
                sel = np.concatenate(
                    [sel, np.full((n_pad,), pad_val, int)]
                )
            round_items.append(sel)

        flat = np.concatenate(round_items)  # (per_round,)
        r_grid = grid[flat]
        r_origins = origins[flat].astype(np.float32)
        pair_idx, pair_w = pair_selector(Ps, r_origins)
        uniq_views, slot_idx = dedup_view_slots(pair_idx)
        if uniq_views.shape[1] > ku_state[0]:
            ku_state[0] = uniq_views.shape[1]
        if uniq_views.shape[1] < ku_state[0]:
            uniq_views, slot_idx = dedup_view_slots(
                pair_idx, k=ku_state[0]
            )
        core_bounds = (
            core_bounds_for(
                r_grid, lattice_max, D, cfg.voxel.overlap, present=grid
            )
            if pool_window > 0
            else None
        )

        def launch(compact: bool = True):
            return cube_batch_step(
                images_d,
                Ps_d,
                global_put(np.asarray(r_origins, np.float32), shard),
                global_put(np.asarray(pair_idx, np.int32), shard),
                global_put(np.asarray(pair_w, np.float32), shard),
                None
                if core_bounds is None
                else global_put(np.asarray(core_bounds, np.int32), shard),
                global_put(np.asarray(uniq_views, np.int32), shard),
                global_put(np.asarray(slot_idx, np.int32), shard),
                D=D,
                s=s,
                n_pairs=cfg.fusion.n_view_pairs,
                tau=cfg.fusion.tau,
                gamma=cfg.fusion.gamma,
                adaptive=cfg.fusion.adaptive_threshold,
                center_colors=cfg.voxel.center_colors,
                predict=predictor,
                use_pallas=cfg.sweep.use_pallas_gather,
                n_pool_views=cfg.fusion.n_pool_views,
                ray_pool_mode=cfg.fusion.ray_pool_mode,
                fusion_mode=resolve_fusion_mode(cfg),
                crop_hw=crop_hw,
                adaptive_taus=cfg.fusion.adaptive_taus,
                adaptive_target_density=cfg.fusion.adaptive_target_density,
                compact_output=compact,
                compact_k=cfg.sweep.compact_k,
                gather_dtype=cfg.sweep.gather_dtype,
                pool_window=pool_window,
                chunk_hw=chunk_hw,
                # pin the compact top_k's rows to the cube axis — without
                # this the partitioner all-gathers the (Nc, D^3) keys and
                # sorts redundantly on every device (r4 HLO audit)
                compact_row_sharding=shard,
            )

        host = dict(
            origins=r_origins, pair_idx=pair_idx, pair_w=pair_w,
            core_bounds=core_bounds, uniq_views=uniq_views,
            slot_idx=slot_idx,
        )
        return r_grid, valid_counts, launch(), host

    compact_K = _resolve_compact_k(cfg.sweep.compact_k, D)
    local_frames = []  # lazy process-local (images, Ps) for re-fetches

    def dispatch_rows_local(host, rows: np.ndarray):
        """Dense truncation re-fetch of selected rows as a PROCESS-LOCAL
        dispatch: the offending rows belong to this process's blocks, so no
        global program (and no cross-process agreement on whether to
        re-fetch) is needed — each process re-fetches its own offenders.
        Rows are padded to a fixed mini-batch so the dense program compiles
        once (see pipeline.sweep._REFETCH_PAD)."""
        from surfacenet_tpu.pipeline.sweep import _REFETCH_PAD

        PAD = min(cfg.sweep.cube_batch, _REFETCH_PAD)
        n_pad = (-len(rows)) % PAD
        rr = (
            np.concatenate([rows, rows[:1].repeat(n_pad)]) if n_pad
            else rows
        )
        if not local_frames:  # lazy: uploaded once, only if ever needed
            local_frames.append(jnp.asarray(images, jnp.float32))
            local_frames.append(jnp.asarray(Ps, jnp.float32))
        images_l, Ps_l = local_frames
        outs = []
        for c0 in range(0, len(rr), PAD):
            sel = rr[c0 : c0 + PAD]
            out = cube_batch_step(
                images_l,
                Ps_l,
                jnp.asarray(host["origins"][sel], jnp.float32),
                jnp.asarray(host["pair_idx"][sel], jnp.int32),
                jnp.asarray(host["pair_w"][sel], jnp.float32),
                None
                if host["core_bounds"] is None
                else jnp.asarray(host["core_bounds"][sel], jnp.int32),
                jnp.asarray(host["uniq_views"][sel], jnp.int32),
                jnp.asarray(host["slot_idx"][sel], jnp.int32),
                D=D,
                s=s,
                n_pairs=cfg.fusion.n_view_pairs,
                tau=cfg.fusion.tau,
                gamma=cfg.fusion.gamma,
                adaptive=cfg.fusion.adaptive_threshold,
                center_colors=cfg.voxel.center_colors,
                predict=predictor,
                use_pallas=cfg.sweep.use_pallas_gather,
                n_pool_views=cfg.fusion.n_pool_views,
                ray_pool_mode=cfg.fusion.ray_pool_mode,
                fusion_mode=resolve_fusion_mode(cfg),
                crop_hw=crop_hw,
                adaptive_taus=cfg.fusion.adaptive_taus,
                adaptive_target_density=cfg.fusion.adaptive_target_density,
                compact_output=False,
                compact_k=cfg.sweep.compact_k,
                gather_dtype=cfg.sweep.gather_dtype,
                pool_window=pool_window,
                chunk_hw=chunk_hw,
            )
            outs.append(tuple(np.asarray(x) for x in out))
        take = len(rows)
        return (
            np.concatenate([o[0] for o in outs])[:take],
            np.concatenate([o[1] for o in outs])[:take],
            np.concatenate([o[2] for o in outs])[:take],
        )

    def harvest(r_grid, valid_counts, out, host):
        nonlocal n_processed
        from surfacenet_tpu.pipeline.sweep import unpack_compact

        rec_g, counts_g = out[0], out[1]
        stats.n_batches += 1
        stats.n_rounds += 1
        for b in mine:
            base = b * per_block_round
            vb = valid_counts[b]
            if vb == 0:
                continue
            rec_b = fetch_rows(rec_g, base, base + per_block_round)
            counts_b = fetch_rows(counts_g, base, base + per_block_round)
            occ, fused, color = unpack_compact(rec_b, counts_b, D)
            # exactness check (see run_sweep.harvest): catches compact_k
            # truncation AND approx_max_k recall misses.  Only valid slots
            # count: padding duplicates a real cube, whose (possibly
            # truncated) result is harvested from its own slot.
            got = (rec_b[:vb, :, 3] > 0).sum(axis=1)
            short = np.flatnonzero(got < counts_b[:vb])
            if len(short):
                print(
                    f"sharded sweep: block {b}: {len(short)} cube(s) short "
                    f"of their occupied count (compact_k={compact_K}); "
                    f"re-fetching them dense"
                )
                if metrics is not None:
                    metrics.count(
                        "compact_truncation_refetches", len(short)
                    )
                d_occ, d_fused, d_color = dispatch_rows_local(
                    host, base + short
                )
                occ[short] = d_occ
                fused[short] = d_fused
                color[short] = d_color
            for i in range(vb):
                gi = tuple(r_grid[base + i])
                if occ[i].any():
                    stats.n_cubes_nonempty += 1
                stores[b].add(
                    CubeResult(gi, occ[i], fused[i], color[i])
                )
                n_processed += 1

    # double-buffered: host-side harvest of round k overlaps the device
    # compute of round k+1 (same pattern as pipeline/sweep.py).
    from surfacenet_tpu.utils.observability import trace

    with trace("run_sweep_sharded"):
        if measure_device_time:
            # sequential: quiesce around each round so dispatch->ready is
            # pure device pipeline time for THIS round only.
            pending = next_round()
            while pending is not None:
                td = time.perf_counter()
                jax.block_until_ready(pending[2])
                stats.device_s += time.perf_counter() - td
                harvest(*pending)
                pending = next_round()
        else:
            pending = next_round()
            while pending is not None:
                nxt = next_round()
                harvest(*pending)
                pending = nxt

    stats.wall_s = time.perf_counter() - t0
    stats.cubes_per_s = (
        n_processed / stats.wall_s if stats.wall_s > 0 else 0.0
    )
    if metrics is not None:
        metrics.count("cubes_processed", n_processed)
        metrics.gauge("sweep_wall_s", stats.wall_s)
        metrics.gauge("cubes_per_s", stats.cubes_per_s)
        metrics.gauge("n_rounds", stats.n_rounds)
        metrics.flush(
            extra={
                "n_cubes_total": stats.n_cubes_total,
                "n_cubes_after_prefilter": stats.n_cubes_after_prefilter,
                "per_block_cubes": list(stats.per_block_cubes or []),
            }
        )

    # merge blocks: block stores share the scene frame, so their cube
    # records concatenate into one global store (boundary-overlap voxels get
    # votes from both owning blocks' cubes).
    #
    # Multi-process: barrier, then process 0 rehydrates the other
    # processes' block ledgers from the shared directory into the merged
    # store (export/report is gated on process 0 — non-zero processes
    # return only their own blocks' results).
    if pc > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("surfacenet_sweep_rounds_done")
    merged = SparseCubeStore(
        scene_origin=np.asarray(bbox_min, np.float64),
        voxel_size_mm=s,
        cube_size=D,
        stride=cfg.voxel.stride,
        occupancy_vote=0.0 if pool_window > 0 else 0.5,
    )
    merge_blocks = range(n_block) if pi == 0 else mine
    for b in merge_blocks:
        st = stores[b]
        if pc > 1 and b not in mine:
            # another process's block: rehydrate its completed ledger
            st = SparseCubeStore(
                scene_origin=np.asarray(bbox_min, np.float64),
                voxel_size_mm=s,
                cube_size=D,
                stride=cfg.voxel.stride,
                ledger_path=f"{ledger_dir}/block_{b}.jsonl",
                occupancy_vote=0.0 if pool_window > 0 else 0.5,
            )
        for g, res in st._cubes.items():
            merged.add(res)
        merged._done |= st.done_set()
    return merged, stats
