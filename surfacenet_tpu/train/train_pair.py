"""Triplet training of the view-pair weighting net (SURVEY.md C12, SS3.3).

Anchor/positive: patches of the *same* surface point seen from two views;
negative: a patch of a *different* surface point.  The embedding net
(models/pairnet.py) is trained with a margin triplet loss.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state

from surfacenet_tpu.config import Config
from surfacenet_tpu.data.synthetic import SyntheticScene
from surfacenet_tpu.geometry.camera import project
from surfacenet_tpu.models.pairnet import PairNet, init_pairnet, triplet_loss


def extract_patches(
    images: np.ndarray, view_idx: np.ndarray, uv: np.ndarray, size: int
) -> np.ndarray:
    """Host-side integer patch crops with zero padding.

    Args:
      images: (V, H, W, 3); view_idx: (B,); uv: (B, 2) pixel centers.
    Returns:
      (B, size, size, 3).
    """
    V, H, W, C = images.shape
    B = len(view_idx)
    out = np.zeros((B, size, size, C), np.float32)
    half = size // 2
    u0 = np.round(uv[:, 0]).astype(int) - half
    v0 = np.round(uv[:, 1]).astype(int) - half
    for i in range(B):
        y0, y1 = max(v0[i], 0), min(v0[i] + size, H)
        x0, x1 = max(u0[i], 0), min(u0[i] + size, W)
        if y1 <= y0 or x1 <= x0:
            continue  # patch entirely off-image: stays zero
        crop = images[view_idx[i], y0:y1, x0:x1]
        oy = y0 - v0[i]
        ox = x0 - u0[i]
        out[i, oy : oy + crop.shape[0], ox : ox + crop.shape[1]] = crop
    return out


def sample_triplets(
    scene: SyntheticScene,
    cfg: Config,
    rng: np.random.Generator,
    batch: Optional[int] = None,
    hard_negative_frac: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sample (anchor, positive, negative) patch batches.

    Points/views are resampled until the surface point is inside both the
    anchor and positive frusta (rejection on host; fixed output shape).

    ``hard_negative_frac`` (r5, SURVEY C6/C12): on scenes with an analytic
    occluder (OccludedScene.point_occlusion_matrix), that fraction of
    negatives is the SAME 3D point seen through the occluder — the patch
    shows the disk's texture at exactly the image location a naive
    selector would sample, which is the discrimination the production
    cube-local gates need (results/occlusion_r04/r05.json).  Anchors and
    positives are always unoccluded views of their point.
    """
    B = batch or cfg.train.batch_size
    P = cfg.pairnet.patch_size
    V = scene.Ps.shape[0]
    hw = scene.images.shape[1:3]

    anchors = np.zeros((B, P, P, 3), np.float32)
    positives = np.zeros((B, P, P, 3), np.float32)
    negatives = np.zeros((B, P, P, 3), np.float32)

    occ_aware = hard_negative_frac > 0.0 and hasattr(
        scene, "point_occlusion_matrix"
    )

    def in_patch_bounds(uv):
        return (
            (uv > P // 2).all(-1)
            & (uv < [hw[1] - P // 2, hw[0] - P // 2]).all(-1)
        )

    Ps = scene.Ps
    filled = 0
    while filled < B:
        n = (B - filled) * 2
        pts = scene.surface_points(n, seed=int(rng.integers(1 << 31)))
        va = rng.integers(0, V, n)
        vb = (va + rng.integers(1, max(V // 3, 2), n)) % V
        uv_a, wa = project(jnp.asarray(Ps[va]), jnp.asarray(pts[:, None]))
        uv_b, wb = project(jnp.asarray(Ps[vb]), jnp.asarray(pts[:, None]))
        uv_a = np.asarray(uv_a)[:, 0]
        uv_b = np.asarray(uv_b)[:, 0]
        ok = (
            (np.asarray(wa)[:, 0] > 0)
            & (np.asarray(wb)[:, 0] > 0)
            & in_patch_bounds(uv_a)
            & in_patch_bounds(uv_b)
        )
        occ_mat = None
        if occ_aware:
            occ_mat = scene.point_occlusion_matrix(pts)  # (n, V)
            # anchor/positive must be clean sightlines of the point
            ok &= ~occ_mat[np.arange(n), va] & ~occ_mat[np.arange(n), vb]
        idx = np.nonzero(ok)[0][: B - filled]
        if len(idx) == 0:
            continue
        k = len(idx)
        anchors[filled : filled + k] = extract_patches(
            scene.images, va[idx], uv_a[idx], P
        )
        positives[filled : filled + k] = extract_patches(
            scene.images, vb[idx], uv_b[idx], P
        )
        # negatives: positive patches of a shuffled other point.  A
        # one-candidate fill round would make np.roll a no-op (negative
        # == positive, a degenerate zero-gradient triplet); borrow the
        # previous filled row's positive instead, or resample.
        if k == 1 and filled == 0:
            continue
        perm = np.roll(idx, 1)
        neg = extract_patches(scene.images, vb[perm], uv_b[perm], P)
        if k == 1:
            neg[0] = positives[filled - 1]
        if occ_aware:
            # hard negatives: same point, occluded view (where one exists
            # with the projection inside patch bounds)
            want_hard = rng.random(k) < hard_negative_frac
            for j in np.nonzero(want_hard)[0]:
                pi = idx[j]
                cand = np.nonzero(occ_mat[pi])[0]
                if not len(cand):
                    continue
                vc = int(rng.choice(cand))
                uv_c, wc = project(
                    jnp.asarray(Ps[vc]), jnp.asarray(pts[pi][None])
                )
                uv_c = np.asarray(uv_c)[0]
                if float(np.asarray(wc)[0]) <= 0 or not in_patch_bounds(
                    uv_c[None]
                )[0]:
                    continue
                neg[j] = extract_patches(
                    scene.images, np.asarray([vc]), uv_c[None], P
                )[0]
        negatives[filled : filled + k] = neg
        filled += k
    return anchors, positives, negatives


@functools.partial(jax.jit, static_argnames=("margin",))
def pair_train_step(state, anc, pos, neg, *, margin: float):
    def loss_fn(params):
        ea = state.apply_fn({"params": params}, anc)
        ep = state.apply_fn({"params": params}, pos)
        en = state.apply_fn({"params": params}, neg)
        return triplet_loss(ea, ep, en, margin)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    return state.apply_gradients(grads=grads), loss


def save_pairnet(ckpt_dir: str, variables, step: int = 0) -> None:
    """Orbax checkpoint of the pair-weight net (SURVEY.md C13)."""
    import os

    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, f"pairnet_{step}"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": variables["params"]}, force=True)
    ckptr.wait_until_finished()


def restore_pairnet(ckpt_dir: str, cfg: Config, step: Optional[int] = None):
    """Restore a pairnet checkpoint.

    ``ckpt_dir`` may point directly at a ``pairnet_<step>`` dir, or at a
    parent dir (then ``step`` selects; default = highest step present).
    """
    import os

    import orbax.checkpoint as ocp

    model, variables = init_pairnet(cfg.pairnet, jax.random.PRNGKey(0))
    if os.path.basename(os.path.normpath(ckpt_dir)).startswith("pairnet_"):
        path = os.path.abspath(ckpt_dir)
    else:
        if step is None:
            steps = sorted(
                int(d.split("_", 1)[1])
                for d in os.listdir(ckpt_dir)
                if d.startswith("pairnet_") and d.split("_", 1)[1].isdigit()
            )
            if not steps:
                raise FileNotFoundError(
                    f"no pairnet_<step> checkpoints under {ckpt_dir}"
                )
            step = steps[-1]
        path = os.path.abspath(os.path.join(ckpt_dir, f"pairnet_{step}"))
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, {"params": variables["params"]})
    return model, {"params": restored["params"]}


def train_pairnet(
    scene,
    cfg: Config,
    n_steps: int = 200,
    lr: float = 1e-3,
    hard_negative_frac: float = 0.0,
) -> Tuple[PairNet, Any, list]:
    """Train the pair net; returns (model, variables, loss log).

    ``scene`` may be a single scene or a LIST of scenes (r5, SURVEY C12:
    the embedding must generalize across surface/texture families, not
    memorize one sphere) — each step samples its triplet batch from a
    uniformly-drawn scene.  ``hard_negative_frac`` enables occluded-view
    hard negatives on scenes that support them (see sample_triplets).
    """
    scenes = scene if isinstance(scene, (list, tuple)) else [scene]
    rng = np.random.default_rng(cfg.train.seed)
    model, variables = init_pairnet(
        cfg.pairnet, jax.random.PRNGKey(cfg.train.seed)
    )
    state = train_state.TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        tx=optax.adam(lr),
    )
    losses = []
    for step in range(n_steps):
        sc = scenes[int(rng.integers(len(scenes)))]
        anc, pos, neg = sample_triplets(
            sc, cfg, rng, hard_negative_frac=hard_negative_frac
        )
        state, loss = pair_train_step(
            state,
            jnp.asarray(anc), jnp.asarray(pos), jnp.asarray(neg),
            margin=cfg.pairnet.margin,
        )
        losses.append(float(loss))
    return model, {"params": state.params}, losses
