"""Training losses (SURVEY.md C11/C12, paper SS6.1)."""

from __future__ import annotations

import jax.numpy as jnp
import optax


def class_balanced_bce(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    valid: jnp.ndarray | None = None,
    balanced: bool = True,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Class-balanced binary cross-entropy over voxels.

    Surface voxels are rare (~1-3% of a cube): the positive class is weighted
    by alpha = N_neg / N, the negative by 1 - alpha = N_pos / N, per batch —
    the balancing rule the reference uses for its per-voxel loss.

    Args:
      logits: (B, D, D, D) pre-sigmoid.
      labels: (B, D, D, D) in {0, 1}.
      valid: optional bool mask; invalid voxels excluded.
    """
    labels = labels.astype(jnp.float32)
    per_vox = optax.sigmoid_binary_cross_entropy(logits, labels)
    if valid is None:
        valid_f = jnp.ones_like(labels)
    else:
        valid_f = valid.astype(jnp.float32)

    n = jnp.maximum(jnp.sum(valid_f), 1.0)
    if balanced:
        n_pos = jnp.sum(labels * valid_f)
        alpha_pos = (n - n_pos) / n  # weight on positives
        alpha_neg = n_pos / n
        w = jnp.where(labels > 0.5, alpha_pos, alpha_neg) * valid_f
    else:
        w = valid_f
    return jnp.sum(per_vox * w) / jnp.maximum(jnp.sum(w), eps)
