"""SurfaceNet 3D CNN: per-voxel surface-probability regressor (SURVEY.md C5).

Behavior contract (paper Fig. 3 / SURVEY.md SS3.4): a fully-convolutional 3D
network over a CVC pair (D, D, D, 6) ->

    block1 (32ch, 3 convs) -> pool
    block2 (80ch, 3 convs) -> pool
    block3 (160ch, 3 convs)
    block4 (300ch, 3 convs, dilation 2)
    side layers (16ch each, one per block) upsampled back to D^3
    concat sides -> 1x1x1 conv -> sigmoid -> p in [0,1]^{D^3}

with BatchNorm throughout.  Fully convolutional: trained at 32^3, applied at
64^3 without change.

TPU-first notes:
  * 3D convs lower to MXU matmuls via XLA's conv_general_dilated; channels
    are the minor (lane) dimension in NDHWC layout.  Compute dtype is
    bfloat16, params float32 (config.model.dtype).
  * No data-dependent control flow anywhere; the whole forward is one fused
    XLA program.  A Pallas path for the conv stack can be swapped in per-op
    where XLA is below the 70% MXU-utilization target (BASELINE north star).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from surfacenet_tpu.config import ModelConfig


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class ConvBlock(nn.Module):
    """N x (conv3d -> [BN] -> relu), optionally dilated."""

    features: int
    n_convs: int
    dilation: int = 1
    use_bn: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.n_convs):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3, 3),
                kernel_dilation=(self.dilation,) * 3,
                padding="SAME",
                use_bias=not self.use_bn,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    axis_name=None,
                )(x)
            x = nn.relu(x)
        return x


class SideLayer(nn.Module):
    """HED-style side output: 1^3 conv to `features`, upsample to full res.

    upsample_mode "deconv" matches the reference's learned transposed-conv
    side layers; "resize" (default on TPU) uses trilinear resize — the
    k=(2*stride)^3 transposed 3D convs are ~half the network's FLOPs for no
    accuracy benefit when training from scratch (ModelConfig.upsample_mode).
    """

    features: int
    upsample: int  # 1, 2 or 4
    use_bn: bool = True
    dtype: Any = jnp.bfloat16
    upsample_mode: str = "resize"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            kernel_size=(1, 1, 1),
            use_bias=not self.use_bn,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(x)
        x = nn.relu(x)
        if self.upsample > 1:
            if self.upsample_mode == "deconv":
                x = nn.ConvTranspose(
                    self.features,
                    kernel_size=(self.upsample * 2,) * 3,
                    strides=(self.upsample,) * 3,
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                )(x)
            else:
                b, d1, d2, d3, c = x.shape
                u = self.upsample
                x = jax.image.resize(
                    x, (b, d1 * u, d2 * u, d3 * u, c), method="trilinear"
                )
        return x


class SurfaceNet(nn.Module):
    """The full surface-probability network.

    Input: (B, D, D, D, in_channels) CVC pair, channels-last (NDHWC).
    Output: (B, D, D, D) surface probability in [0, 1].
    """

    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x, train: bool = False, return_logits: bool = False):
        cfg = self.cfg
        dt = _dtype(cfg.dtype)
        x = x.astype(dt)

        sides = []
        scale = 1
        for bi, (ch, nconv, dil, do_pool) in enumerate(
            zip(
                cfg.block_channels,
                cfg.convs_per_block,
                cfg.dilations,
                cfg.pool_after_block,
            )
        ):
            x = ConvBlock(
                ch, nconv, dilation=dil, use_bn=cfg.use_batchnorm, dtype=dt
            )(x, train)
            sides.append(
                SideLayer(
                    cfg.side_channels,
                    upsample=scale,
                    use_bn=cfg.use_batchnorm,
                    dtype=dt,
                    upsample_mode=cfg.upsample_mode,
                )(x, train)
            )
            if do_pool:
                x = nn.max_pool(
                    x, window_shape=(2, 2, 2), strides=(2, 2, 2)
                )
                scale *= 2

        h = jnp.concatenate(sides, axis=-1)
        logits = nn.Conv(
            1,
            kernel_size=(1, 1, 1),
            dtype=dt,
            param_dtype=jnp.float32,
        )(h)
        # Return in float32: probabilities feed fusion / thresholds.
        logits = logits[..., 0].astype(jnp.float32)
        if return_logits:
            return logits
        return jax.nn.sigmoid(logits)


def init_surfacenet(
    cfg: ModelConfig, rng: jax.Array, D: int = 32
) -> Tuple[SurfaceNet, Any]:
    """Initialize params (+ batch stats) with a dummy cube."""
    model = SurfaceNet(cfg)
    dummy = jnp.zeros((1, D, D, D, cfg.in_channels), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return model, variables


def make_predictor(model, variables, cfg: ModelConfig):
    """Sweep predictor for a trained model.

    Default: plain model.apply — one whole-network XLA program (measured
    fastest on v5e, see ModelConfig.fused_inference).  Opt-in
    fused_infer_apply (BN-folded Pallas conv3d) when the model config asks
    for it (TPU, resize side layers).  The returned callable has the
    pipeline.sweep.Predictor signature.
    """
    use_fused = (
        cfg.fused_inference
        and jax.default_backend() != "cpu"
        and cfg.upsample_mode == "resize"
    )
    if use_fused:

        def predictor(x, origins):
            return fused_infer_apply(cfg, variables, x)

    else:

        def predictor(x, origins):
            return model.apply(variables, x, train=False)

    # the sweep reads this to build the CVC input batch directly in the
    # model's compute dtype: SurfaceNet casts x at entry (x.astype(dt)),
    # and astype commutes with the slot-select take/concat/reshape, so
    # pre-casting is bit-identical while halving the (B, D^3, 6) input
    # assembly traffic for bf16 models.
    predictor.in_dtype = cfg.dtype
    return predictor


def fold_bn(
    kernel: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    mean: jnp.ndarray,
    var: jnp.ndarray,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold inference BatchNorm into the preceding conv's weights.

    y = gamma * (conv(x) - mu) / sqrt(var + eps) + beta
      = conv(x; W * gamma/sigma) + (beta - mu * gamma/sigma)
    """
    inv = scale / jnp.sqrt(var + eps)
    return kernel * inv, bias - mean * inv


def fused_infer_apply(
    cfg: ModelConfig,
    variables: Any,
    x: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Inference forward with conv+BN+relu fused into the Pallas
    implicit-GEMM conv3d kernel (ops/pallas/conv3d.py).

    Semantically equal to SurfaceNet.apply(train=False) (parity-tested):
    BatchNorm running stats are folded into each conv's weights/bias, so a
    whole conv+BN+relu is one kernel launch — one HBM read and write per
    conv instead of XLA's conv + BN + relu chain, and the MXU contracts
    over the full 27*Cin im2col depth.  Blocks whose volume exceeds the
    VMEM budget fall back to XLA inside conv3d_fused.
    """
    from surfacenet_tpu.ops.pallas.conv3d import conv3d_fused

    if cfg.upsample_mode == "deconv":
        raise NotImplementedError(
            "fused inference supports upsample_mode='resize'; use "
            "SurfaceNet.apply for deconv side layers"
        )
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    dt = _dtype(cfg.dtype)
    x = x.astype(dt)

    def conv_params(scope, stat_scope, name, bn_name):
        k = scope[name]["kernel"]
        if cfg.use_batchnorm:
            bn = scope[bn_name]
            st = stat_scope[bn_name]
            return fold_bn(
                k, bn["scale"], bn["bias"], st["mean"], st["var"]
            )
        return k, scope[name].get(
            "bias", jnp.zeros((k.shape[-1],), jnp.float32)
        )

    sides = []
    scale = 1
    for b, (ch, nconv, dil, do_pool) in enumerate(
        zip(
            cfg.block_channels,
            cfg.convs_per_block,
            cfg.dilations,
            cfg.pool_after_block,
        )
    ):
        bp = params[f"ConvBlock_{b}"]
        bs = stats.get(f"ConvBlock_{b}", {})
        for i in range(nconv):
            w, bias = conv_params(bp, bs, f"Conv_{i}", f"BatchNorm_{i}")
            x = conv3d_fused(
                x, w, bias, dil=dil, relu=True, interpret=interpret
            ).astype(dt)

        # side layer: 1^3 conv (a matmul) + folded BN + relu + resize
        sp = params[f"SideLayer_{b}"]
        ss = stats.get(f"SideLayer_{b}", {})
        sw, sb = conv_params(sp, ss, "Conv_0", "BatchNorm_0")
        side = (
            jnp.einsum(
                "bdhwc,co->bdhwo", x, sw[0, 0, 0].astype(dt)
            )
            + sb.astype(dt)
        )
        side = jnp.maximum(side, 0)
        if scale > 1:
            bsz, d1, d2, d3, c = side.shape
            side = jax.image.resize(
                side,
                (bsz, d1 * scale, d2 * scale, d3 * scale, c),
                method="trilinear",
            )
        sides.append(side)

        if do_pool:
            x = nn.max_pool(x, window_shape=(2, 2, 2), strides=(2, 2, 2))
            scale *= 2

    h = jnp.concatenate(sides, axis=-1)
    fw = params["Conv_0"]["kernel"]
    fb = params["Conv_0"]["bias"]
    logits = (
        jnp.einsum("bdhwc,co->bdhwo", h, fw[0, 0, 0].astype(dt))
        + fb.astype(dt)
    )
    logits = logits[..., 0].astype(jnp.float32)
    return jax.nn.sigmoid(logits)
