"""Pallas implicit-GEMM conv3d vs XLA on the live TPU, per block shape.

Run:  PYTHONPATH=/root/.axon_site:/root/repo nohup python \
        scripts/conv_kernel_bench.py > /tmp/conv_kernel_bench.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from surfacenet_tpu.ops.pallas.conv3d import (
    conv3d_pallas, vmem_estimate, VMEM_BUDGET_BYTES,
)
from surfacenet_tpu.utils.observability import detect_peak_tflops


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [jnp.sum(fn(*args).astype(jnp.float32)) for _ in range(iters)]
        float(sum(outs))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def xla_conv(dil):
    @jax.jit
    def f(x, w, b):
        y = jax.lax.conv_general_dilated(
            x, w,
            window_strides=(1, 1, 1),
            padding="SAME",
            rhs_dilation=(dil,) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        ) + b
        return jnp.maximum(y, 0.0).astype(jnp.bfloat16)

    return f


def main():
    print(f"devices={jax.devices()}")
    peak = detect_peak_tflops()
    report = {}
    # (label, B, R, cin, cout, dil)
    shapes = [
        ("D32_b1", 160, 16, 32, 80, 1),
        ("D32_b1b", 160, 16, 80, 80, 1),
        ("D32_b2", 160, 8, 80, 160, 1),
        ("D32_b2b", 160, 8, 160, 160, 1),
        ("D32_b3", 160, 8, 160, 300, 2),
        ("D32_b3b", 160, 8, 300, 300, 2),
        ("D64_b2", 20, 16, 80, 160, 1),
        ("D64_b3b", 20, 16, 300, 300, 2),
        # MXU-aligned widths (ModelConfig.mxu_aligned): lane-aligned im2col
        # column offsets AND full output lanes — the TPU-native operating
        # point (see ROOFLINE.md).
        ("A_b1", 160, 16, 128, 128, 1),
        ("A_b2", 160, 8, 128, 256, 1),
        ("A_b2b", 160, 8, 256, 256, 1),
        ("A_b3", 160, 8, 256, 256, 2),
    ]
    for label, B, R, cin, cout, dil in shapes:
        need = vmem_estimate(R, cin, cout)
        if need > VMEM_BUDGET_BYTES:
            print(f"{label}: skipped (vmem {need>>20}MiB)", flush=True)
            continue
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, R, R, R, cin), jnp.bfloat16)
        w = jax.random.normal(
            jax.random.fold_in(key, 1), (3, 3, 3, cin, cout), jnp.bfloat16
        ) * 0.05
        b = jnp.zeros((cout,), jnp.float32)

        # parity on-device first
        got = conv3d_pallas(x, w, b, dil=dil, relu=True)
        ref = xla_conv(dil)(x, w, b)
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)))
        )

        pal = lambda x, w, b: conv3d_pallas(x, w, b, dil=dil, relu=True)
        dt_p = timeit(pal, x, w, b)
        dt_x = timeit(xla_conv(dil), x, w, b)
        flops = 2 * 27 * cin * cout * R**3 * B
        tp = flops / dt_p / 1e12
        tx = flops / dt_x / 1e12
        row = dict(
            pallas_ms=round(dt_p * 1e3, 2), xla_ms=round(dt_x * 1e3, 2),
            pallas_tflops=round(tp, 1), xla_tflops=round(tx, 1),
            pallas_pct=round(100 * tp / peak, 1),
            xla_pct=round(100 * tx / peak, 1),
            max_err=err,
        )
        report[label] = row
        print(f"{label} B{B} R{R} {cin}->{cout} d{dil}: "
              f"pallas {dt_p*1e3:.2f}ms {tp:.0f}TF ({100*tp/peak:.0f}%)  "
              f"xla {dt_x*1e3:.2f}ms {tx:.0f}TF ({100*tx/peak:.0f}%)  "
              f"err {err:.3f}", flush=True)

    with open("/tmp/conv_kernel_bench.json", "w") as f:
        json.dump(report, f, indent=2)
    print("wrote /tmp/conv_kernel_bench.json")


if __name__ == "__main__":
    main()
