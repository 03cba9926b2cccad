"""Ray-pool implementation bench: affine oracle vs Pallas rotate kernel vs
one-hot matmul (MXU) form, at the sweep's operating point.

ADVICE r2 found the matmul form's einsums ran at default TPU precision
(bf16 truncation of the f32 probabilities -> mask flips vs the oracle);
they now run at Precision.HIGHEST, which costs extra MXU passes — this
bench re-measures whether the documented ~4x win over the rotate kernel
survives the fix.

Usage: python scripts/pool_mode_bench.py [D] [N_items] [window]
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from surfacenet_tpu.geometry.camera import look_at_projection
from surfacenet_tpu.ops.ray_pooling import (
    ray_max_mask_affine, ray_max_mask_affine_matmul,
)

P = functools.partial(print, flush=True)


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def main(D=32, N=192, window=2):
    rng = np.random.default_rng(0)
    s = 0.5
    probs = rng.uniform(size=(N, D, D, D)).astype(np.float32)
    origins = np.tile(np.float32([-D * s / 2] * 3), (N, 1))
    eyes = rng.normal(size=(N, 3))
    eyes = 2000.0 * eyes / np.linalg.norm(eyes, axis=1, keepdims=True)
    Ps = np.stack([
        look_at_projection(e, np.zeros(3), np.array([0, 0, 1.0]),
                           1000.0, (300.0, 400.0))
        for e in eyes
    ]).astype(np.float32)

    probs_j = jnp.asarray(probs)
    origins_j = jnp.asarray(origins)
    Ps_j = jnp.asarray(Ps)

    oracle = jax.jit(jax.vmap(
        lambda p, o, Pm: ray_max_mask_affine(p, o, s, Pm, window=window)
    ))
    matmul = jax.jit(functools.partial(
        ray_max_mask_affine_matmul, s=s, window=window
    ))

    t_o, m_o = timeit(oracle, probs_j, origins_j, Ps_j)
    t_m, m_m = timeit(lambda p, o, Pm: matmul(p, origins=o, Ps=Pm),
                      probs_j, origins_j, Ps_j)
    agree = float((np.asarray(m_o) == np.asarray(m_m)).mean())
    P(f"D={D} N={N} window={window} backend={jax.default_backend()}")
    P(f"affine oracle (vmap shear):   {t_o*1e3:8.2f} ms")
    P(f"affine matmul (HIGHEST prec): {t_m*1e3:8.2f} ms   "
      f"agree={agree:.4f}   speedup={t_o/t_m:.2f}x")

    if jax.default_backend() != "cpu":
        from surfacenet_tpu.ops.pallas.affine_pool import (
            ray_max_mask_affine_pallas,
        )
        pallas = jax.jit(functools.partial(
            ray_max_mask_affine_pallas, s=s, window=window
        ))
        t_p, m_p = timeit(lambda p, o, Pm: pallas(p, origins=o, Ps=Pm),
                          probs_j, origins_j, Ps_j)
        agree_p = float((np.asarray(m_o) == np.asarray(m_p)).mean())
        P(f"affine Pallas rotate kernel: {t_p*1e3:8.2f} ms   "
          f"agree={agree_p:.4f}   matmul/pallas={t_p/t_m:.2f}x")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:4]))
