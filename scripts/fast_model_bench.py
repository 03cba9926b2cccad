"""Forward-throughput shootout for fast lane-aligned model candidates.

ROOFLINE.md SS4 showed the aligned model (128/128/256/256 x2) reaches the
70% MFU north star but at 44.1 GF/item it is SLOWER per item than paper
width (3127 vs 4429 items/s).  The remaining TPU-first lever is a model
that is BOTH lane-aligned and FLOP-lean: thin the full-resolution block-1
(where aligned spends 30 of its 44 GF) and keep the deep blocks at
128/256 lanes.  This script measures real whole-forward items/s + MFU for
the candidates; the winner gets the 30k-step quality run
(scripts/aligned_train_eval.py --model fast).

Run on the TPU chip: python scripts/fast_model_bench.py
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
    "aligned": ModelConfig.mxu_aligned(),
    "fastA": ModelConfig(
        block_channels=(128, 128, 256, 256), convs_per_block=(1, 2, 2, 2)
    ),
    "fastE": ModelConfig(
        block_channels=(128, 128, 128, 256), convs_per_block=(1, 2, 2, 2)
    ),
    "fastF": ModelConfig(
        block_channels=(128, 128, 256, 256), convs_per_block=(1, 1, 2, 3)
    ),
}


def measure(cfg: ModelConfig, D: int = 32, n_items: int = 160,
            n_iters: int = 10) -> dict:
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
        "ms_per_160": round(160e3 / items_per_s, 2),
    }


def main():
    out = {}
    for name, cfg in CANDIDATES.items():
        out[name] = measure(cfg)
        print(name, json.dumps(out[name]), flush=True)
    with open("results/fast_model_bench_r03.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
