"""Forward-throughput shootout for 64^3-shaped model candidates.

ARCHITECTURE.md's r4 stage table shows the model forward is 68% of the
64^3 step and the fast (fastE) model only wins +8% there: its wide
128-ch first block emits a 64^3 x 128 x bf16 activation (67 MB/item)
and the full-volume block goes HBM-bound, eating the FLOP cut.  The
documented remaining lever is a 64^3-shaped model whose FIRST block
stays narrow (paper's 32 ch: 17 MB/item) while only the later, smaller
feature volumes are lane-aligned.  This script measures real whole-
forward items/s + MFU at D=64, B=24 (the measured batch sweet spot)
for those candidates; a winner gets the 30k-step quality recipe before
shipping as a preset.

Run on the TPU chip: python scripts/fast64_model_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from surfacenet_tpu.config import ModelConfig
from surfacenet_tpu.models.surfacenet import init_surfacenet, make_predictor
from surfacenet_tpu.utils.observability import FlopModel, detect_peak_tflops

CANDIDATES = {
    "paper": ModelConfig(),
    "fastE": ModelConfig.fast(),
    # Narrow-first-block family: first block at paper width (or half-lane),
    # deep blocks on 128-lane multiples.
    "n64A": ModelConfig(
        block_channels=(32, 128, 256, 256), convs_per_block=(1, 2, 2, 2)
    ),
    "n64B": ModelConfig(
        block_channels=(32, 128, 256, 256), convs_per_block=(2, 2, 2, 2)
    ),
    "n64C": ModelConfig(
        block_channels=(32, 128, 128, 256), convs_per_block=(1, 2, 2, 2)
    ),
    "n64D": ModelConfig(
        block_channels=(64, 128, 256, 256), convs_per_block=(1, 2, 2, 2)
    ),
}


def measure(cfg: ModelConfig, D: int = 64, n_items: int = 24,
            n_iters: int = 5) -> dict:
    model, variables = init_surfacenet(cfg, jax.random.PRNGKey(0), D=D)
    predict = make_predictor(model, variables, cfg)
    fwd = jax.jit(lambda x: predict(x, None))
    x = jnp.zeros((n_items, D, D, D, cfg.in_channels), jnp.float32)
    float(jnp.sum(fwd(x)))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        sums = [jnp.sum(fwd(x)) for _ in range(n_iters)]
        float(sum(sums))
        best = min(best, time.perf_counter() - t0)
    items_per_s = n_items * n_iters / best
    fm = FlopModel(cfg, D)
    peak = detect_peak_tflops()
    return {
        "gflops_per_item": round(
            (fm.conv_stack_flops() + fm.side_flops()) / 1e9, 2
        ),
        "lane_ceiling_pct": round(100 * fm.mxu_ceiling(), 1),
        "items_per_s": round(items_per_s, 1),
        "mfu_pct": round(100 * fm.utilization(items_per_s, peak), 1),
        "ms_per_batch24": round(24e3 / items_per_s, 2),
    }


def main():
    out = {}
    for name, cfg in CANDIDATES.items():
        out[name] = measure(cfg)
        print(name, json.dumps(out[name]), flush=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "results", "fast64_bench_r04.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
