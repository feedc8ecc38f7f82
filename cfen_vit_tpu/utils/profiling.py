"""Profiling / step-timing — the TPU-native observability layer.

The reference's only instrumentation is wall-clock deltas printed every
print_freq iters (train.py:40-56; SURVEY.md section 5.1).  Here:

  * `trace(logdir)` context manager wraps steps in a jax.profiler trace
    viewable in TensorBoard/XProf (device timelines, fusion-level view);
  * `StepTimer` reproduces the reference's console t/t_data numbers and
    keeps a rolling summary (mean/p50/p95) for throughput reporting;
  * `annotate(name)` adds named TraceAnnotations inside jitted code.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace when logdir is set; no-op otherwise."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self, window: int = 200):
        self.window = window
        self.times: List[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {"mean_s": sum(ts) / n,
                "p50_s": ts[n // 2],
                "p95_s": ts[min(n - 1, int(n * 0.95))],
                "steps": n}


# bf16 peak FLOP/s per chip by device_kind substring (public spec sheets);
# used for MFU accounting in bench.py / bench_train.py (VERDICT r1 #2/#6)
_PEAKS = {"TPU v5 lite": 197e12, "TPU v5e": 197e12, "TPU v4": 275e12,
          "TPU v5p": 459e12, "TPU v6": 918e12}


def device_peak_flops(device=None) -> Optional[float]:
    dev = device or jax.devices()[0]
    kind = getattr(dev, "device_kind", "")
    return next((v for k, v in _PEAKS.items() if k in kind), None)


def model_flops_lookup(key: str) -> Optional[float]:
    """GFLOPs/img for the dense (useful-model) basis, from model_flops.json.

    Dual-basis MFU (VERDICT r4 #2): the compiled program's cost_analysis
    FLOPs include the phase formulation's structural zeros; the honest
    utilization number also needs the dense-path basis.  That basis is a
    constant of the model geometry, precomputed by scripts/model_flops.py
    (compiled cost_analysis of the CFEN_PHASE_*=0 / CFEN_PALLAS_MRF=0
    program) and committed, so bench runs pay no extra compile."""
    import json
    import os
    import re
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "model_flops.json")
    try:
        with open(path) as fh:
            table = json.load(fh)
        entry = table.get(key)
        if entry is None:
            # GFLOPs/img is batch-linear, so a basis computed at any batch
            # serves every batch of the same geometry (the dense-path b8
            # train program doesn't even fit HBM; its basis is committed
            # at b4).  Fall back to a key differing only in the _bN_ field.
            pat = re.compile("^" + re.sub(r"_b\d+_", r"_b\\d+_",
                                          re.escape(key)) + "$")
            for k, v in sorted(table.items()):
                if pat.match(k):
                    entry = v
                    break
        return float(entry["gflops_per_img"]) if entry else None
    except Exception:
        return None


def mfu_line(flops_per_step: float, sec_per_step: float) -> str:
    """'achieved=XX.XTF/s MFU=YY.Y%' (MFU omitted off-TPU)."""
    tf = flops_per_step / sec_per_step / 1e12
    peak = device_peak_flops()
    s = f"achieved={tf:.1f}TF/s"
    if peak:
        s += f" MFU={tf * 1e12 / peak * 100:.1f}%"
    return s
