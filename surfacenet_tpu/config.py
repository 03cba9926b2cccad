"""Typed configuration tree for surfacenet-tpu.

The reference keeps all hyperparameters as module-level globals in a
``params.py``-style module (SURVEY.md C1).  Here they are typed, immutable
dataclasses so that configs can be passed through ``jax.jit`` static args,
serialized per-experiment (the 5 BASELINE configs), and overridden from the
CLI without global mutable state.

All dataclasses are frozen and hashable so a config object can be a static
argument to a jitted function.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class VoxelConfig:
    """Scene discretization (reference: voxel size `s`, cube side, overlap)."""

    voxel_size_mm: float = 0.4  # `s`: edge length of one voxel in mm
    cube_size: int = 32  # D: voxels per cube edge (32 train / 64 inference)
    overlap: int = 8  # voxels of overlap between adjacent cubes
    # Colors are mean-centered per-CVC before entering the net.
    center_colors: bool = True

    @property
    def stride(self) -> int:
        """Cube-to-cube stride in voxels along each axis."""
        return self.cube_size - self.overlap

    @property
    def cube_extent_mm(self) -> float:
        return self.voxel_size_mm * self.cube_size


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """SurfaceNet 3D-CNN architecture (SURVEY.md C5, paper Fig. 3).

    Channel widths follow the paper recollection (32 -> 80 -> 160 -> 300 with
    the deepest block dilated); marked re-verify in SURVEY.md SS3.4 but are
    config-tunable here, so parity fixes are one-line.
    """

    block_channels: Tuple[int, ...] = (32, 80, 160, 300)
    convs_per_block: Tuple[int, ...] = (3, 3, 3, 3)
    dilations: Tuple[int, ...] = (1, 1, 1, 2)  # deepest block uses dilated convs
    pool_after_block: Tuple[bool, ...] = (True, True, False, False)
    side_channels: int = 16  # HED-style side layers, upsampled to cube res
    in_channels: int = 6  # CVC pair: 2 x RGB
    use_batchnorm: bool = True
    dtype: str = "bfloat16"  # compute dtype on TPU (params stay f32)
    # Side-layer upsampling: "deconv" = learned ConvTranspose (reference
    # behavior, paper Fig.3) — but the k=2*stride transposed 3D convs are
    # ~half the network's FLOPs; "resize" = trilinear resize (cheap,
    # equivalent receptive field, trains from scratch equally well).
    upsample_mode: str = "resize"
    # Inference: fold BatchNorm into conv weights and run the Pallas
    # implicit-GEMM conv3d kernel (TPU only; models/surfacenet.py
    # fused_infer_apply).  Ignored on CPU backends.  Default OFF: measured
    # on v5e (scripts/conv_kernel_bench.py + A/B in ARCHITECTURE.md), the
    # per-block Pallas kernel is at parity with XLA's conv, but the whole-
    # network XLA program wins end-to-end (36.5 ms vs 102.8 ms per
    # 160-item 32^3 batch) — the in-kernel im2col VPU copies don't amortize
    # at SurfaceNet's small per-block resolutions.  Opt in per-config.
    fused_inference: bool = False

    @staticmethod
    def mxu_aligned() -> "ModelConfig":
        """Lane-aligned channel widths: the TPU-native operating point.

        The paper widths (32/80/160/300) waste MXU output lanes — the
        FLOP-weighted lane ceiling is 59.3% of peak (ROOFLINE.md).  This
        variant pins every block to a multiple of 128 lanes (ceiling
        100%); measured per-block utilization on v5e rises from 11-40%
        to 42-47% (results/conv_kernel_bench_r02.json, A_* rows).  More
        capacity per FLOP-dollar when training from scratch on TPU;
        paper-parity experiments should keep the default widths.
        """
        return ModelConfig(
            block_channels=(128, 128, 256, 256),
            convs_per_block=(2, 2, 2, 2),
            side_channels=16,
        )

    @staticmethod
    def fast() -> "ModelConfig":
        """FLOP-lean lane-aligned widths: the throughput operating point.

        Keeps every block on a 128-lane multiple (100% MXU lane ceiling,
        like ``mxu_aligned``) but spends the FLOPs where resolution is
        cheap: ONE conv at full 32^3 resolution, deep blocks at 128/256
        lanes.  12.4 GF/item vs the paper model's 15.5 and the aligned
        model's 44.1; measured forward 6203 items/s on v5e vs paper's
        4382 (1.42x) — results/fast_model_bench_r03.json ("fastE").
        Quality qualified with the 30k-step golden recipe in
        results/quality_r03_fastE.json.
        """
        return ModelConfig(
            block_channels=(128, 128, 128, 256),
            convs_per_block=(1, 2, 2, 2),
            side_channels=16,
        )

    @staticmethod
    def fast64() -> "ModelConfig":
        """64^3-shaped throughput point: narrow first block, aligned deep.

        At 64^3 the full-volume first block is HBM-bound, not MXU-bound:
        ``fast()``'s 128-ch first conv emits a 67 MB/item bf16 activation
        and eats its FLOP cut (only +8% e2e at 64^3).  Keeping the first
        block at the paper's 32 ch (17 MB/item) and lane-aligning only
        the pooled deep blocks wins decisively at the production 64^3
        batch (120 items): 1311.7 items/s vs fast's 925.0 (1.42x) vs
        paper's ~707 — results/fast64_bench_r04_b120.json ("n64C").
        At 32^3 the same shape loses to ``fast()`` (small volumes are
        MXU-bound, where 32 output lanes waste 75% of the MXU), so this
        is specifically the 64^3 apply-point model.
        """
        return ModelConfig(
            block_channels=(32, 128, 128, 256),
            convs_per_block=(1, 2, 2, 2),
            side_channels=16,
        )

    @staticmethod
    def tiny() -> "ModelConfig":
        """Small config for tests / CPU (fast compile, same topology)."""
        return ModelConfig(
            block_channels=(8, 12, 16, 16),
            convs_per_block=(1, 1, 1, 1),
            side_channels=4,
            dtype="float32",
        )


@dataclasses.dataclass(frozen=True)
class PairNetConfig:
    """2D patch-embedding net trained with triplet loss (SURVEY.md C6/C12)."""

    patch_size: int = 32
    channels: Tuple[int, ...] = (32, 64, 128)
    embed_dim: int = 64
    margin: float = 0.5  # triplet margin
    # Geometric features appended to the learned similarity when scoring a
    # view pair: [cos(baseline angle), |similarity|].
    n_geom_features: int = 2


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """View-pair fusion + binarization + thinning (SURVEY.md C7/C8)."""

    n_view_pairs: int = 5  # Nv: number of fused view pairs per cube
    tau: float = 0.7  # binarization threshold on fused probability
    gamma: float = 0.8  # ray-pooling retention fraction
    adaptive_threshold: bool = False  # per-region tuned tau (baseline config 2)
    adaptive_taus: Tuple[float, ...] = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
    adaptive_target_density: float = 0.02  # occupancy the adaptive tau aims at
    # ray pooling implementation: "exact" (pixel-ray scatter-max raster) or
    # "affine" (sheared-slab approximation; ~100x cheaper on TPU, error
    # O(cube_extent / camera_distance) in ray assignment).
    ray_pool_mode: str = "exact"
    # pair fusion: "mean" (paper SS5.1 weighted average) or "consensus"
    # (two-pass consensus-reweighted fusion — pairs whose predicted
    # volume disagrees with the cube's preliminary fusion are
    # downweighted before the final fuse; the r4 occlusion-robust path,
    # ops/fusion.py::fuse_pairs_consensus, results/occlusion_r04.json).
    fusion_mode: str = "mean"
    # Proximity term in geometric pair scoring (_select_scored_jit):
    # > 0 prefers pairs among the nearest visible cameras (Gaussian with
    # sigma = frac * nearest-camera distance); 0 = angle-only.  Default
    # 0 because pair-selection geometry is part of the TRAINING
    # distribution: the shipped weights were trained with angle-only
    # selection, and applying them with proximity selection collapses
    # quality 13x (results/occlusion_r04.json angle_only vs prox rows).
    # Train and apply MUST use the same value; the selection A/B
    # (results/selection_ab_r04.json) measures prox-trained vs
    # angle-trained end to end.
    pair_dist_sigma_frac: float = 0.0
    # consensus-fusion shape: pairs within `deadband` correlation of the
    # cube's best pair keep full weight; below it weight decays
    # exp(beta * deficit).  Trained-model deadband scan (r4, production
    # 600x800): db 0.1/0.2/0.3 -> clean ratio 1.12/1.11/1.06 with the
    # occluded win stable at 0.62-0.66x — the residual clean cost is
    # structural (removing a legitimately-low grazing pair raises the
    # fused mean near the shell), hence consensus stays opt-in and 0.3
    # ships as the best measured tradeoff.
    consensus_beta: float = 8.0
    consensus_deadband: float = 0.3
    n_pool_views: int = 6  # deduped views used for the thinning vote
    # Ray-max window in voxels: -1 = auto (min(2, overlap//2)); 0 = legacy
    # per-cube segment max (rays chopped at cube faces — boundary
    # artifacts); > 0 = windowed max, combined with core claiming so cube
    # boundaries do not distort thinning (SURVEY.md SS7 hard part).
    pool_window_vox: int = -1
    # Post-merge denoising (SURVEY.md C8, the reference denoising.py analog):
    # drop 26-connected components of merged voxels smaller than this many
    # voxels (floating specks from a single bad view pair). 0 = off.
    min_component: int = 0


@dataclasses.dataclass(frozen=True)
class SweepConfig:
    """Scene sweep / batched cube scheduler (SURVEY.md C9)."""

    # Cubes per device per step (static shape).  32 is the measured v5e
    # throughput optimum at D=32 x 5 pairs (444 cubes/s; 64 drops to ~285:
    # the gather auto-chunks at 320 items for SMEM, and pooling/compaction
    # scale superlinearly past it).  Larger values compile and run.
    cube_batch: int = 16
    prefilter: bool = True  # frustum/content prefilter before batching
    min_views_visible: int = 2  # cube must fall inside >= this many frusta
    # Pallas warp-gather kernel for CVC construction (TPU only; the XLA
    # gather path is the oracle and the CPU/test default).  Sweeps downgrade
    # this automatically when the backend is CPU.
    use_pallas_gather: bool = False
    # Sparse device->host records per cube; <= 0 means auto-scale with the
    # cube size (max(4096, 4*D^2)).  Harvest re-fetches dense when a cube's
    # true occupied count exceeds this, so no setting loses voxels.
    compact_k: int = 0
    # Pallas-gather crop/matmul dtype: "bfloat16" (default), "int8" (7-bit
    # crops + hat weights on the 2x-rate int8 MXU; same ~1%-of-full-scale
    # error class as bf16 on 8-bit image sources), or "float32"
    # (oracle-exact).  Ignored by the XLA gather path.
    gather_dtype: str = "bfloat16"
    # Per-point-chunk crop sub-windows in the Pallas gather (r4): each
    # kernel grid step's points are a thin voxel slab whose projected
    # footprint is a fraction of the cube's; restricting the interpolation
    # to a slab-sized window cuts the kernel's per-point MXU+VPU cost by
    # the area ratio (measured on v5e: see scripts/gather_chunk_bench.py
    # + ARCHITECTURE.md stage table).  At D>32 it also replaces the
    # 8-dispatch sub-cube tiling with ONE dispatch.  Sub-window sizes come
    # from auto_chunk_hw per scene.  Ignored by the XLA gather path.
    gather_chunk_windows: bool = True
    # Self-calibration refinement prepass (geometry/refine.py; VERDICT r4
    # next #4): photometric bundle adjustment of per-view image-space
    # shifts against cross-view consistency before the sweep.
    # Calibration error is the ONE brittle robustness axis
    # (results/robustness_r04.json: sigma=1 px triples error); the
    # prepass recovers most of it and is clean-safe (finds ~0 shift on
    # clean scenes) — measured in results/robustness_r05.json.  A second
    # pass runs automatically when the first detects shifts > 1 px.
    refine_calib: bool = False
    refine_calib_steps: int = 80  # Adam steps per pyramid level/phase
    refine_calib_probes: int = 2048  # photometric probe points


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for the sharded sweep / training.

    Axes: ``block`` shards the scene volume into voxel-cube blocks (the
    sequence-parallel analog, SURVEY.md SS2) and ``cube`` is data-parallel
    over cubes/minibatch within a block.
    """

    block_axis: int = 1
    cube_axis: int = -1  # -1: all remaining devices
    axis_names: Tuple[str, ...] = ("block", "cube")


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training loop (SURVEY.md C11/C12)."""

    batch_size: int = 32
    lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 1e-4
    n_steps: int = 10000
    # class-balanced BCE: surface voxels are rare; alpha weights positives.
    class_balance: bool = True
    # steps fused per device dispatch (lax.scan) when the scene supports
    # device-side sampling (analytic surface); 0 = one dispatch per step.
    scan_chunk: int = 25
    # "none" (reference-faithful fixed SGD) or "cosine" (decay to 5% of lr
    # over n_steps — long runs keep less update noise in the final weights).
    lr_decay: str = "none"
    checkpoint_every: int = 500
    checkpoint_dir: str = "checkpoints"
    seed: int = 0
    # pooled-sampler size (cubes precomputed per pool for scenes without
    # an analytic surface; bit-packed labels keep even 64^3 pools small).
    pool_size: int = 2048
    # pooled-sampler freshness (SURVEY.md C11: the reference samples fresh
    # cubes continually; a fixed 2048-cube pool overfits a 30k-step run).
    # Every pool_refresh_steps steps the host rebuilds the pool with a new
    # seed while the device trains the current scan chunk; 0 = fixed pool.
    # Analytic-SDF scenes resample per-step on device and ignore this.
    pool_refresh_steps: int = 0
    # held-out eval-split loss cadence: every eval_every steps, measure
    # class-balanced BCE on a fixed pool the train pool never sees
    # (exposes pool overfit); 0 = off.
    eval_every: int = 0
    # train-time calibration augmentation: per-view principal-point shift
    # of N(0, sigma_px) pixels re-drawn every step ON DEVICE (the
    # first-order imperfect-calibration model, matching
    # data/synthetic.degrade_scene's calib_sigma_px).  The r4 robustness
    # curves (results/robustness_r04.json) show calibration error is the
    # ONE brittle imaging axis of clean-trained weights (sigma=1 px
    # triples overall mm); photometric axes are flat, so only this aug
    # exists.  0 = off (the shipped-weights default) — and the measured
    # A/B (results/robustness_aug_r04.json, 6k-step arms) says keep it
    # off unless calibration error exceeds ~1.5 px: sigma=0.7 training
    # flattens the degradation curve (2.92 vs 3.16 mm at 2 px) but
    # costs 2.3x on well-calibrated data (2.14 vs 0.94 mm clean) — the
    # blur is paid everywhere, the tolerance only helps past the
    # crossover.
    aug_calib_sigma_px: float = 0.0
    # Linear anneal horizon for the calibration augmentation: sigma decays
    # from aug_calib_sigma_px at global step 0 to zero at this step
    # (0 = constant sigma).  The r5 fine-tune recipe — clean 30k + a short
    # annealed tail — buys the robustness without the 2.3x always-on
    # clean cost measured in results/robustness_aug_r04.json.
    aug_calib_anneal_steps: int = 0


@dataclasses.dataclass(frozen=True)
class Config:
    """Root config."""

    voxel: VoxelConfig = VoxelConfig()
    model: ModelConfig = ModelConfig()
    pairnet: PairNetConfig = PairNetConfig()
    fusion: FusionConfig = FusionConfig()
    sweep: SweepConfig = SweepConfig()
    mesh: MeshConfig = MeshConfig()
    train: TrainConfig = TrainConfig()

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @staticmethod
    def from_json(s: str) -> "Config":
        raw = json.loads(s)

        def _mk(cls, d):
            fields = {f.name: f for f in dataclasses.fields(cls)}
            kw = {}
            for k, v in d.items():
                if k not in fields:
                    continue
                ft = fields[k].type
                if isinstance(v, list):
                    v = tuple(v)
                kw[k] = v
            return cls(**kw)

        return Config(
            voxel=_mk(VoxelConfig, raw.get("voxel", {})),
            model=_mk(ModelConfig, raw.get("model", {})),
            pairnet=_mk(PairNetConfig, raw.get("pairnet", {})),
            fusion=_mk(FusionConfig, raw.get("fusion", {})),
            sweep=_mk(SweepConfig, raw.get("sweep", {})),
            mesh=_mk(MeshConfig, raw.get("mesh", {})),
            train=_mk(TrainConfig, raw.get("train", {})),
        )


# The five BASELINE.json operating points, as named presets.  All presets
# enable the flagship TPU kernels (Pallas warp gather + Pallas affine ray
# pooling); sweeps downgrade them automatically on CPU backends
# (pipeline.sweep.resolve_backend_config), so the same files drive both.
def baseline_config(name: str) -> Config:
    base = Config()
    base = base.replace(
        sweep=dataclasses.replace(
            base.sweep,
            use_pallas_gather=True,
            # r5: self-calibration prepass ships ON in every production
            # preset — measured (results/robustness_r05.json): clean
            # scenes are unharmed (0.599 vs 0.605 mm, the detected shift
            # is ~0.2 px) and the one brittle axis is repaired (sigma=1 px
            # overall 1.937 -> 0.889 mm = 1.47x clean, vs the 3.2x cliff
            # unrefined).  Cost: seconds of prepass per scene.
            refine_calib=True,
        ),
        fusion=dataclasses.replace(
            base.fusion, ray_pool_mode="affine_pallas"
        ),
    )
    # cube_batch sweet spots measured on 1x v5e (ARCHITECTURE.md): 32 at
    # D=32 (441 cubes/s), 24 at D=64 (70.3 vs 56.8 @16 / 57.6 @32).
    b32 = dataclasses.replace(base.sweep, cube_batch=32)
    b64 = dataclasses.replace(base.sweep, cube_batch=24)
    if name == "dtu9_single":  # config 1: 2-view CVC, 32^3, single threshold
        return base.replace(
            voxel=dataclasses.replace(base.voxel, cube_size=32),
            fusion=dataclasses.replace(
                base.fusion, n_view_pairs=1, adaptive_threshold=False
            ),
            sweep=b32,
        )
    if name == "dtu9_full":  # config 2: multi-pair fusion, 64^3.
        # adaptive_threshold measured OFF in r3: the per-cube density
        # target degrades accuracy 3-6x on both golden scenes at flat
        # completeness (results/adaptive_r03.json); fixed tau wins.
        # r5 (VERDICT r4 next #1): the flagship preset now ships the
        # PROVEN 64^3 operating point — ModelConfig.fast64(), +32%
        # cubes/s over paper widths at 64^3 (results/fast64_step_r04)
        # and qualified at the 64^3 apply point in
        # results/op_point_r05.json (within 3% of paper quality at
        # matched voxel size on both golden scenes; paper widths
        # actually degrade WORST under voxel-size shift).  Training at
        # the preset's voxel size is part of the recipe (ADVICE r3).
        # Paper-parity experiments: preset "dtu9_paper".
        return base.replace(
            voxel=dataclasses.replace(base.voxel, cube_size=64),
            model=ModelConfig.fast64(),
            fusion=dataclasses.replace(
                base.fusion, n_view_pairs=5, adaptive_threshold=False
            ),
            sweep=b64,
        )
    if name == "dtu9_paper":  # paper-width variant of config 2 (the
        # pre-r5 dtu9_full): for reference-parity experiments where the
        # exact paper channel widths matter more than throughput.
        return base.replace(
            voxel=dataclasses.replace(base.voxel, cube_size=64),
            fusion=dataclasses.replace(
                base.fusion, n_view_pairs=5, adaptive_threshold=False
            ),
            sweep=b64,
        )
    if name == "dtu_eval_split":  # config 3: full eval split, 1 host
        return base.replace(
            voxel=dataclasses.replace(base.voxel, cube_size=64),
            sweep=b64,
        )
    if name == "highres_sharded":  # config 4: s=0.2mm multi-host sweep —
        # block_axis=2 shards the scene spatially; reconstruct routes it
        # through run_sweep_sharded (cli auto-detects block_axis > 1).
        return base.replace(
            voxel=dataclasses.replace(
                base.voxel, voxel_size_mm=0.2, cube_size=64
            ),
            mesh=dataclasses.replace(base.mesh, block_axis=2),
            sweep=b64,
        )
    if name == "tanks_temples":  # config 5: stretch, COLMAP poses
        return base.replace(
            voxel=dataclasses.replace(base.voxel, voxel_size_mm=2.0, cube_size=64),
            sweep=b64,
        )
    if name == "golden_aligned":  # r3: the MXU-aligned operating point —
        # 100% lane ceiling, quality BEATS paper width on both golden
        # scenes (results/quality_r03_aligned.json; ROOFLINE.md SS4).
        # voxel_size_mm matches the 30k-step qualification runs (s=0.5,
        # scripts/aligned_train_eval.py) — ADVICE r3: the preset must
        # ship the voxel size its weights were qualified at.
        c = baseline_config("dtu9_single")
        return c.replace(
            voxel=dataclasses.replace(c.voxel, voxel_size_mm=0.5),
            model=ModelConfig.mxu_aligned(),
            fusion=dataclasses.replace(c.fusion, n_view_pairs=5),
            train=dataclasses.replace(
                c.train, n_steps=30000, lr=3e-3, lr_decay="cosine",
                batch_size=16,
            ),
        )
    if name == "golden_fast":  # r3: the throughput operating point —
        # lane-aligned but FLOP-lean (ModelConfig.fast); 1.42x the paper
        # model's forward items/s at 100% lane ceiling
        # (results/fast_model_bench_r03.json, quality_r03_fastE.json)
        c = baseline_config("golden_aligned")
        return c.replace(model=ModelConfig.fast())
    raise ValueError(f"unknown baseline config: {name}")
