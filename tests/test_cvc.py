"""CVC gather vs a naive numpy reference (SURVEY.md SS4)."""

import numpy as np
import jax.numpy as jnp

from surfacenet_tpu.geometry.camera import look_at_projection
from surfacenet_tpu.ops.cvc import (
    bilinear_sample,
    build_cvc,
    build_cvc_batch,
    build_cvc_pair,
)


def naive_cvc(image, P, origin, D, s):
    """Reference implementation: pure python loops, nearest math."""
    H, W, C = image.shape
    out = np.zeros((D, D, D, C), np.float64)
    valid = np.zeros((D, D, D), bool)
    for i in range(D):
        for j in range(D):
            for k in range(D):
                X = origin + s * (np.array([i, j, k]) + 0.5)
                ph = P @ np.append(X, 1.0)
                w = ph[2]
                u, v = ph[0] / (w + 1e-8), ph[1] / (w + 1e-8)
                if w <= 0 or u < 0 or u > W - 1 or v < 0 or v > H - 1:
                    continue
                u0, v0 = int(np.floor(u)), int(np.floor(v))
                du, dv = u - u0, v - v0
                u1, v1 = min(u0 + 1, W - 1), min(v0 + 1, H - 1)
                c = (
                    image[v0, u0] * (1 - du) * (1 - dv)
                    + image[v0, u1] * du * (1 - dv)
                    + image[v1, u0] * (1 - du) * dv
                    + image[v1, u1] * du * dv
                )
                out[i, j, k] = c
                valid[i, j, k] = True
    return out, valid


def test_bilinear_sample_exact_centers():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(6, 7, 3)).astype(np.float32)
    # sampling exactly at integer pixel coords returns the pixel value
    uv = jnp.array([[2.0, 3.0], [0.0, 0.0], [6.0, 5.0]])
    out, valid = bilinear_sample(jnp.asarray(img), uv)
    assert np.asarray(valid).all()
    assert np.allclose(np.asarray(out)[0], img[3, 2], atol=1e-6)
    assert np.allclose(np.asarray(out)[1], img[0, 0], atol=1e-6)
    assert np.allclose(np.asarray(out)[2], img[5, 6], atol=1e-6)


def test_bilinear_sample_interpolates():
    img = np.zeros((2, 2, 1), np.float32)
    img[0, 0] = 0.0
    img[0, 1] = 1.0
    img[1, 0] = 2.0
    img[1, 1] = 3.0
    out, _ = bilinear_sample(jnp.asarray(img), jnp.array([[0.5, 0.5]]))
    assert abs(float(out[0, 0]) - 1.5) < 1e-6


def test_cvc_matches_naive(small_scene):
    D, s = 6, 4.0
    origin = np.array([-12.0, -12.0, -12.0])
    img = small_scene.images[0]
    P = small_scene.Ps[0]
    ref, ref_valid = naive_cvc(img, P, origin, D, s)

    got, got_valid = build_cvc(
        jnp.asarray(img),
        jnp.asarray(P, jnp.float32),
        jnp.asarray(origin, jnp.float32),
        D,
        s,
        center_colors=False,
    )
    got = np.asarray(got)
    got_valid = np.asarray(got_valid)
    assert (got_valid == ref_valid).mean() > 0.99  # border-pixel ties only
    both = got_valid & ref_valid
    assert both.sum() > 0
    assert np.allclose(got[both], ref[both], atol=2e-3)


def test_cvc_centering(small_scene):
    D, s = 6, 4.0
    origin = jnp.array([-12.0, -12.0, -12.0])
    cvc, valid = build_cvc(
        jnp.asarray(small_scene.images[0]),
        jnp.asarray(small_scene.Ps[0], jnp.float32),
        origin, D, s, center_colors=True,
    )
    v = np.asarray(valid)
    c = np.asarray(cvc)
    # mean over valid voxels should be ~0 per channel
    assert np.allclose(c[v].mean(axis=0), 0.0, atol=1e-5)
    # invalid voxels are exactly 0
    assert np.allclose(c[~v], 0.0)


def test_cvc_pair_and_batch_shapes(small_scene):
    D, s = 8, 3.0
    imgs = jnp.asarray(small_scene.images)
    Ps = jnp.asarray(small_scene.Ps, jnp.float32)
    x, valid = build_cvc_pair(
        imgs[0], imgs[1], Ps[0], Ps[1],
        jnp.array([-12.0, -12.0, -12.0]), D, s,
    )
    assert x.shape == (D, D, D, 6)
    assert valid.shape == (D, D, D)

    pair_idx = jnp.array([[0, 1], [1, 2], [2, 3]], jnp.int32)
    origins = jnp.array(
        [[-12.0, -12.0, -12.0], [0.0, 0.0, 0.0], [-24.0, 0.0, -12.0]]
    )
    xb, vb = build_cvc_batch(imgs, Ps, pair_idx, origins, D, s)
    assert xb.shape == (3, D, D, D, 6)
    # batch entry 0 must equal the single-pair build
    assert np.allclose(np.asarray(xb[0]), np.asarray(x), atol=1e-6)
