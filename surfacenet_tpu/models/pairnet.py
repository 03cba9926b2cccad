"""2D patch-embedding network for view-pair weighting (SURVEY.md C6/C12).

The reference trains a small 2D CNN with a triplet loss so that patches of
the same surface point seen from different views embed close together; the
embedding similarity (combined with geometric features) weights view pairs
during fusion (paper SS5.1).

TPU-first notes: the patch batch is NHWC, convs are MXU matmuls; the
embedding is L2-normalized so similarity is a single (B, E) @ (E, B) matmul.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from surfacenet_tpu.config import PairNetConfig


class PairNet(nn.Module):
    """Patch -> L2-normalized embedding."""

    cfg: PairNetConfig = PairNetConfig()

    @nn.compact
    def __call__(self, x):
        # x: (B, P, P, 3) float in [0, 1]
        for ch in self.cfg.channels:
            x = nn.Conv(ch, (3, 3), dtype=jnp.float32)(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape((x.shape[0], -1))
        x = nn.Dense(self.cfg.embed_dim)(x)
        return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-8)


def init_pairnet(cfg: PairNetConfig, rng: jax.Array) -> Tuple[PairNet, Any]:
    model = PairNet(cfg)
    dummy = jnp.zeros((1, cfg.patch_size, cfg.patch_size, 3), jnp.float32)
    return model, model.init(rng, dummy)


def triplet_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    margin: float,
) -> jnp.ndarray:
    """Standard margin triplet loss on L2-normalized embeddings."""
    d_pos = jnp.sum((anchor - positive) ** 2, axis=-1)
    d_neg = jnp.sum((anchor - negative) ** 2, axis=-1)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))


def embedding_similarity(ea: jnp.ndarray, eb: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity mapped to [0, 1]. ea, eb: (..., E) normalized."""
    return 0.5 * (1.0 + jnp.sum(ea * eb, axis=-1))


def view_similarity_matrix(
    model: PairNet,
    variables: Any,
    patches: jnp.ndarray,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Learned pairwise view-similarity matrix.

    Per-PROBE similarity, aggregated over probes.  Probe k is one 3D scene
    point; ``patches[v, k]`` is its patch in view v, so
    ``<emb[a,k], emb[b,k]>`` asks "do views a and b photograph probe k the
    same way?" — the triplet net's training question.  (An earlier version
    mean-pooled embeddings over probes per view before one cosine per pair,
    which destroys exactly that correspondence and compressed all scene
    similarities into a ~0.95-0.99 band, too flat for selection to act on.)

    Args:
      patches: (V, K, P, P, 3) K sampled probe patches per view.
      valid: optional (V, K) bool — probe k projects on-image in view v.
        A pair's aggregate uses only probes valid in BOTH views (an
        off-image probe yields an all-zero patch whose constant embedding
        would otherwise count as perfect agreement).

    Returns:
      (V, V) similarity in [0, 1]; pairs with no shared valid probe
      (and the diagonal) report 1.0 (neutral: selection falls back to
      geometry).
    """
    V, K = patches.shape[:2]
    emb = model.apply(variables, patches.reshape((V * K,) + patches.shape[2:]))
    emb = emb.reshape(V, K, -1)
    sims = 0.5 * (1.0 + jnp.einsum(
        "ake,bke->abk", emb, emb,
        precision=jax.lax.Precision.HIGHEST,
    ))
    if valid is None:
        return sims.mean(axis=-1)
    w = (valid[:, None, :] & valid[None, :, :]).astype(jnp.float32)
    denom = w.sum(axis=-1)
    sim = jnp.where(denom > 0, (sims * w).sum(axis=-1) / jnp.maximum(denom, 1.0), 1.0)
    return sim
