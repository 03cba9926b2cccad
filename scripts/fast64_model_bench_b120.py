"""64^3 shootout at the PRODUCTION batch (120 items = 24 cubes x 5 pairs).

scripts/fast64_model_bench.py measured at B=24 and under-amortized the
batch: at B=120 the narrow-first-block candidates separate decisively
(results/fast64_bench_r04_b120.json): n64C 1311.7 items/s vs fastE 925.0
(1.42x) vs paper ~707 — the 64^3 full-volume first block is HBM-bound,
so keeping it at the paper's 32 ch (17 MB/item activation vs 67 MB at
128 ch) beats lane alignment there, while the pooled deep blocks stay
on 128-lane multiples.  Winner ships as ModelConfig.fast64().

Run on the TPU chip: python scripts/fast64_model_bench_b120.py
"""

import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from surfacenet_tpu.config import ModelConfig
from surfacenet_tpu.models.surfacenet import init_surfacenet, make_predictor
from surfacenet_tpu.utils.observability import FlopModel, detect_peak_tflops
CANDS = {
    "fastE": ModelConfig.fast(),
    "n64A": ModelConfig(block_channels=(32,128,256,256), convs_per_block=(1,2,2,2)),
    "n64C": ModelConfig(block_channels=(32,128,128,256), convs_per_block=(1,2,2,2)),
    "n64D": ModelConfig(block_channels=(64,128,256,256), convs_per_block=(1,2,2,2)),
}
out = {}
for name, cfg in CANDS.items():
    D, n_items, n_iters = 64, 120, 5
    model, variables = init_surfacenet(cfg, jax.random.PRNGKey(0), D=D)
    predict = make_predictor(model, variables, cfg)
    fwd = jax.jit(lambda x: predict(x, None))
    x = jnp.zeros((n_items, D, D, D, cfg.in_channels), jnp.float32)
    float(jnp.sum(fwd(x)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = [jnp.sum(fwd(x)) for _ in range(n_iters)]
        float(sum(s)); best = min(best, time.perf_counter() - t0)
    ips = n_items * n_iters / best
    fm = FlopModel(cfg, D); peak = detect_peak_tflops()
    out[name] = {
        "items_per_s": round(ips, 1),
        "ms_per_120": round(120e3 / ips, 2),
        "mfu_pct": round(100 * fm.utilization(ips, peak), 1),
    }
    print(name, json.dumps(out[name]), flush=True)
with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "results/fast64_bench_r04_b120.json"), "w") as f:
    json.dump(out, f, indent=2); f.write("\n")
