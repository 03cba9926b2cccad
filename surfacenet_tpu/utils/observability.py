"""Observability: structured metrics, FLOP accounting, profiler hooks
(SURVEY.md SS5 — absent in the reference; first-class here).

Three pieces:
  * ``FlopModel`` — analytic FLOP/byte accounting for the conv stack and the
    CVC gather, used to report achieved-vs-peak utilization (the BASELINE
    ">= 70% per-chip 3D-conv FLOP utilization" target needs a denominator).
  * ``Metrics`` — structured per-stage counters/timers serializable to JSON
    lines (cubes/s/chip, occupancy rate, scaling efficiency).
  * ``trace`` — context manager around jax.profiler for Perfetto/XProf
    traces when JAX_PROFILER_DIR is set.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import time
from typing import Dict, Optional

from surfacenet_tpu.config import ModelConfig

# bf16 peak TFLOP/s per chip by TPU generation (public figures).
PEAK_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def detect_peak_tflops(default: float = 197.0) -> float:
    env = os.environ.get("PALLAS_AXON_TPU_GEN", "").lower()
    for k, v in PEAK_TFLOPS.items():
        if k in env:
            return v
    return default


@dataclasses.dataclass
class FlopModel:
    """Analytic cost model of the per-cube inference program."""

    cfg: ModelConfig
    D: int

    def conv_stack_flops(self) -> float:
        """MACs*2 of all 3x3x3 (dilated) convs at their block resolutions."""
        total = 0.0
        res = self.D
        cin = self.cfg.in_channels
        for ch, nc, dil, pool in zip(
            self.cfg.block_channels,
            self.cfg.convs_per_block,
            self.cfg.dilations,
            self.cfg.pool_after_block,
        ):
            for _ in range(nc):
                total += 2 * 27 * cin * ch * res**3
                cin = ch
            if pool:
                res //= 2
        return total

    def side_flops(self) -> float:
        total = 0.0
        res = self.D
        for ch, pool in zip(
            self.cfg.block_channels, self.cfg.pool_after_block
        ):
            total += 2 * ch * self.cfg.side_channels * res**3  # 1^3 conv
            if pool:
                res //= 2
        # final 1^3 conv over concatenated sides
        total += (
            2 * len(self.cfg.block_channels) * self.cfg.side_channels
            * self.D**3
        )
        return total

    def cvc_gather_bytes(self, n_views: int = 2) -> float:
        """HBM traffic of the gather: 4 corner pixels x 3ch x D^3 x views."""
        return n_views * 4 * 3 * 4 * self.D**3

    def utilization(self, items_per_s: float, peak_tflops=None) -> float:
        peak = peak_tflops or detect_peak_tflops()
        return (
            (self.conv_stack_flops() + self.side_flops())
            * items_per_s / 1e12 / peak
        )

    def mxu_ceiling(self, lane: int = 128) -> float:
        """Achievable fraction of peak given MXU lane padding (roofline).

        The MXU contracts onto ``lane`` output lanes per pass; a conv with
        cout output channels can use at most cout / (ceil(cout/lane)*lane)
        of them — e.g. 32ch -> 25%, 80ch -> 62.5%, 300ch -> 78%.  The
        FLOP-weighted average over the conv stack is the hard ceiling any
        implementation (XLA or Pallas) faces at these channel widths; use
        it as the denominator when judging kernel quality, and as the
        motivation for the MXU-aligned model preset.
        """
        total = 0.0
        weighted = 0.0
        res = self.D
        cin = self.cfg.in_channels
        for ch, nc, dil, pool in zip(
            self.cfg.block_channels,
            self.cfg.convs_per_block,
            self.cfg.dilations,
            self.cfg.pool_after_block,
        ):
            eff = ch / (-(-ch // lane) * lane)
            for _ in range(nc):
                f = 2 * 27 * cin * ch * res**3
                total += f
                weighted += f * eff
                cin = ch
            if pool:
                res //= 2
        return weighted / total if total else 0.0


class Metrics:
    """Structured metrics sink: counters, gauges, stage timers."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.data: Dict[str, float] = {}
        self._t0: Dict[str, float] = {}

    def count(self, key: str, delta: float = 1.0) -> None:
        self.data[key] = self.data.get(key, 0.0) + delta

    def gauge(self, key: str, value: float) -> None:
        self.data[key] = float(value)

    @contextlib.contextmanager
    def timer(self, key: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.count(f"{key}_s", time.perf_counter() - t0)
            self.count(f"{key}_n", 1)

    def snapshot(self) -> Dict[str, float]:
        return dict(self.data)

    def flush(self, extra: Optional[Dict] = None) -> None:
        if not self.path:
            return
        rec = {"ts": time.time(), **self.data, **(extra or {})}
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")


@contextlib.contextmanager
def trace(name: str = "surfacenet"):
    """jax.profiler trace if JAX_PROFILER_DIR is set, else no-op."""
    out = os.environ.get("JAX_PROFILER_DIR")
    if not out:
        yield
        return
    import jax

    jax.profiler.start_trace(out)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def scaling_efficiency(
    cubes_per_s: Dict[int, float], base_n: Optional[int] = None
) -> Dict[int, float]:
    """Weak-scaling efficiency: throughput(n) / (n/base * throughput(base))."""
    if not cubes_per_s:
        return {}
    base_n = base_n or min(cubes_per_s)
    base = cubes_per_s[base_n]
    return {
        n: v / (base * n / base_n) for n, v in cubes_per_s.items()
    }
