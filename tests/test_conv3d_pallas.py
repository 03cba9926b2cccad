"""Pallas implicit-GEMM conv3d vs XLA oracle + fused inference parity.

CPU interpret mode; the on-TPU performance claims live in
scripts/conv_profile.py and tests/test_tpu_only.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from surfacenet_tpu.config import ModelConfig
from surfacenet_tpu.models.surfacenet import (
    SurfaceNet,
    fused_infer_apply,
    init_surfacenet,
)
from surfacenet_tpu.ops.pallas.conv3d import conv3d_pallas, vmem_estimate


def _xla_conv(x, w, b, dil, relu):
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        window_strides=(1, 1, 1),
        padding="SAME",
        rhs_dilation=(dil,) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    ) + b.astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    return y


@pytest.mark.parametrize("dil", [1, 2])
@pytest.mark.parametrize("cin,cout", [(6, 8), (8, 12)])
def test_conv3d_pallas_matches_xla(dil, cin, cout):
    rng = np.random.default_rng(dil * 100 + cin)
    B, R = 2, 8
    x = jnp.asarray(rng.standard_normal((B, R, R, R, cin)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((3, 3, 3, cin, cout)) * 0.1, jnp.float32
    )
    b = jnp.asarray(rng.standard_normal(cout) * 0.1, jnp.float32)

    got = np.asarray(
        conv3d_pallas(x, w, b, dil=dil, relu=True, interpret=True),
        np.float32,
    )
    ref = np.asarray(_xla_conv(x, w, b, dil, relu=True))
    # both paths compute in bf16; compare with bf16-scale tolerance
    assert np.abs(got - ref).max() < 0.05, np.abs(got - ref).max()


def test_fused_infer_apply_matches_model():
    cfg = ModelConfig.tiny()
    D = 8
    model, variables = init_surfacenet(cfg, jax.random.PRNGKey(0), D=D)
    # non-trivial batch stats (fresh init has mean 0 / var 1)
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, D, D, D, 6)),
        jnp.float32,
    )
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(fused_infer_apply(cfg, variables, x, interpret=True))
    assert got.shape == ref.shape
    # tiny cfg runs float32 through the model but bf16 in the kernel;
    # probabilities should agree to bf16 tolerance
    assert np.abs(got - ref).max() < 0.03, np.abs(got - ref).max()


def test_fused_infer_apply_trained_stats():
    """Parity must hold with non-identity BN running stats."""
    cfg = ModelConfig.tiny()
    D = 8
    model, variables = init_surfacenet(cfg, jax.random.PRNGKey(0), D=D)
    rng = np.random.default_rng(2)
    stats = jax.tree_util.tree_map(
        lambda v: jnp.asarray(
            np.abs(rng.standard_normal(v.shape)) * 0.5 + 0.5, v.dtype
        ),
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": stats}
    x = jnp.asarray(rng.standard_normal((1, D, D, D, 6)), jnp.float32)
    ref = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(fused_infer_apply(cfg, variables, x, interpret=True))
    assert np.abs(got - ref).max() < 0.03, np.abs(got - ref).max()


def test_vmem_estimate_gates_fallback():
    # 32^3 full-model blocks fit; the 64^3 first block must not
    assert vmem_estimate(16, 32, 80) <= 12 * 1024 * 1024
    assert vmem_estimate(8, 160, 300) <= 12 * 1024 * 1024
    assert vmem_estimate(32, 32, 80) > 12 * 1024 * 1024
