"""Per-block 3D-conv roofline profile on the live TPU (VERDICT r1 item 1).

Times each SurfaceNet conv block in isolation (XLA conv_general_dilated,
bf16, NDHWC) plus the full model forward, and reports achieved TFLOP/s and
%-of-peak per block.  This is the measurement that decides where a Pallas
conv kernel pays and what the per-block MXU ceilings allow.

Run on TPU:  nohup python scripts/conv_profile.py > /tmp/conv_profile.log &
(never timeout-kill a TPU-attached process — the axon claim wedges).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from surfacenet_tpu.config import ModelConfig
from surfacenet_tpu.models.surfacenet import init_surfacenet
from surfacenet_tpu.utils.observability import FlopModel, detect_peak_tflops


def timeit(fn, *args, iters=20):
    """Pipelined timing: dispatch all iters, one host sync at the end."""
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out))  # host readback: the real sync on axon
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [jnp.sum(fn(*args)) for _ in range(iters)]
        float(sum(outs))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv_block_fn(cin, cout, n_convs, dilation, dtype=jnp.bfloat16):
    @jax.jit
    def f(x, ws):
        for i in range(n_convs):
            x = jax.lax.conv_general_dilated(
                x, ws[i],
                window_strides=(1, 1, 1),
                padding="SAME",
                rhs_dilation=(dilation,) * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=dtype,
            )
            x = jax.nn.relu(x)
        return x.astype(jnp.float32)

    return f


def main():
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    peak = detect_peak_tflops()
    print(f"peak bf16 TFLOP/s assumed: {peak}")

    cfg = ModelConfig()
    report = {}

    for D, B in [(32, 160), (64, 20)]:
        res = D
        cin = cfg.in_channels
        rows = []
        for bi, (ch, nc, dil, pool) in enumerate(
            zip(cfg.block_channels, cfg.convs_per_block, cfg.dilations,
                cfg.pool_after_block)
        ):
            key = jax.random.PRNGKey(bi)
            x = jax.random.normal(
                key, (B, res, res, res, cin), jnp.bfloat16
            )
            ws = []
            c_in = cin
            for i in range(nc):
                ws.append(
                    jax.random.normal(
                        jax.random.fold_in(key, i), (3, 3, 3, c_in, ch),
                        jnp.bfloat16,
                    )
                    * 0.05
                )
                c_in = ch
            f = conv_block_fn(cin, ch, nc, dil)
            dt = timeit(f, x, ws)
            flops = 0
            c_in = cin
            for i in range(nc):
                flops += 2 * 27 * c_in * ch * res**3 * B
                c_in = ch
            tfs = flops / dt / 1e12
            rows.append(
                dict(block=bi, res=res, cin=cin, cout=ch, n_convs=nc,
                     dil=dil, ms=round(dt * 1e3, 2),
                     tflops=round(tfs, 1), pct_peak=round(100 * tfs / peak, 1))
            )
            print(f"D={D} block{bi} res={res} {cin}->{ch}x{nc} dil={dil}: "
                  f"{dt*1e3:.2f} ms  {tfs:.1f} TF/s  "
                  f"{100*tfs/peak:.1f}% peak", flush=True)
            cin = ch
            if pool:
                res //= 2

        # full model forward
        model, variables = init_surfacenet(cfg, jax.random.PRNGKey(0), D=D)

        @jax.jit
        def fwd(x):
            return model.apply(variables, x, train=False)

        x = jax.random.normal(
            jax.random.PRNGKey(9), (B, D, D, D, cfg.in_channels), jnp.float32
        )
        dt = timeit(fwd, x)
        fm = FlopModel(cfg, D)
        flops = (fm.conv_stack_flops() + fm.side_flops()) * B
        tfs = flops / dt / 1e12
        print(f"D={D} FULL model B={B}: {dt*1e3:.2f} ms  "
              f"{tfs:.1f} TF/s  {100*tfs/peak:.1f}% peak "
              f"({dt/B*1e6:.0f} us/item)", flush=True)
        report[f"D{D}"] = dict(
            blocks=rows, full_ms=round(dt * 1e3, 2),
            full_tflops=round(tfs, 1),
            full_pct_peak=round(100 * tfs / peak, 1), batch=B,
        )

    with open("/tmp/conv_profile.json", "w") as f:
        json.dump(report, f, indent=2)
    print("wrote /tmp/conv_profile.json")


if __name__ == "__main__":
    main()
