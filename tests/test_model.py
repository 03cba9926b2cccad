"""SurfaceNet model shape/semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from surfacenet_tpu.config import ModelConfig, PairNetConfig
from surfacenet_tpu.models.pairnet import (
    embedding_similarity,
    init_pairnet,
    triplet_loss,
    view_similarity_matrix,
)
from surfacenet_tpu.models.surfacenet import init_surfacenet


def test_forward_shapes_and_range():
    cfg = ModelConfig.tiny()
    model, variables = init_surfacenet(cfg, jax.random.PRNGKey(0), D=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 16, 6))
    p = model.apply(variables, x, train=False)
    assert p.shape == (2, 16, 16, 16)
    assert float(p.min()) >= 0.0 and float(p.max()) <= 1.0


def test_fully_convolutional():
    """Trained at 32^3, applied at 64^3: same params must work at any D
    divisible by 4 (two pools)."""
    cfg = ModelConfig.tiny()
    model, variables = init_surfacenet(cfg, jax.random.PRNGKey(0), D=16)
    x = jnp.zeros((1, 24, 24, 24, 6))
    p = model.apply(variables, x, train=False)
    assert p.shape == (1, 24, 24, 24)


def test_named_presets_forward():
    """Every named operating point (paper / aligned / fast / fast64)
    initializes and runs forward; fast64 keeps its HBM-lean narrow first
    block (the 64^3 win in results/fast64_bench_r04_b120.json depends on
    it -- guard against accidental widening)."""
    presets = {
        "paper": ModelConfig(),
        "aligned": ModelConfig.mxu_aligned(),
        "fast": ModelConfig.fast(),
        "fast64": ModelConfig.fast64(),
    }
    assert presets["fast64"].block_channels[0] == 32
    for name, cfg in presets.items():
        model, variables = init_surfacenet(cfg, jax.random.PRNGKey(0), D=8)
        x = jnp.zeros((1, 8, 8, 8, cfg.in_channels))
        p = model.apply(variables, x, train=False)
        assert p.shape == (1, 8, 8, 8), name


def test_logits_match_probabilities():
    cfg = ModelConfig.tiny()
    model, variables = init_surfacenet(cfg, jax.random.PRNGKey(0), D=16)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 16, 6))
    p = model.apply(variables, x, train=False)
    lg = model.apply(variables, x, train=False, return_logits=True)
    assert np.allclose(np.asarray(jax.nn.sigmoid(lg)), np.asarray(p), atol=1e-6)


def test_batchnorm_updates_in_train_mode():
    cfg = ModelConfig.tiny()
    model, variables = init_surfacenet(cfg, jax.random.PRNGKey(0), D=16)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 16, 6)) * 3.0
    _, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a))
        for b, a in zip(before, after)
    )


def test_pairnet_embedding_normalized():
    cfg = PairNetConfig(channels=(8, 16), embed_dim=16)
    model, variables = init_pairnet(cfg, jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    e = model.apply(variables, x)
    assert e.shape == (4, 16)
    assert np.allclose(np.linalg.norm(np.asarray(e), axis=1), 1.0, atol=1e-4)


def test_triplet_loss_zero_when_separated():
    a = jnp.array([[1.0, 0.0]])
    p = jnp.array([[1.0, 0.0]])
    n = jnp.array([[-1.0, 0.0]])
    assert float(triplet_loss(a, p, n, margin=0.5)) == 0.0
    # positive loss when negative is closer than positive
    assert float(triplet_loss(a, n, p, margin=0.5)) > 0.0


def test_view_similarity_matrix():
    cfg = PairNetConfig(channels=(8,), embed_dim=8)
    model, variables = init_pairnet(cfg, jax.random.PRNGKey(0))
    patches = jax.random.uniform(jax.random.PRNGKey(1), (3, 2, 32, 32, 3))
    S = view_similarity_matrix(model, variables, patches)
    S = np.asarray(S)
    assert S.shape == (3, 3)
    assert np.allclose(np.diag(S), 1.0, atol=1e-4)
    assert np.allclose(S, S.T, atol=1e-5)
    assert (S >= -1e-5).all() and (S <= 1 + 1e-5).all()
