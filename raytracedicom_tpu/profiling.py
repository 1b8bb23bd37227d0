"""Per-stage timing — the TPU equivalent of the reference's
FINE_GRAINED_TIMING instrumentation (kernel_wrapper.cu:390-416,1299-1352).

Each stage is jitted separately and timed with block_until_ready, giving the
same per-stage breakdown the reference prints (trace / conv / fill / superp /
transfer). For deeper analysis use ``jax.profiler.trace`` around
``DoseEngine.compute_dose`` and inspect in TensorBoard/XProf.
"""
from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import numpy as np


def sync(out):
    """Force completion of everything queued before ``out``: on the axon
    platform block_until_ready returns early, so fetch one element to host
    (device queues are in-order, so this fences all prior work)."""
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "ravel")]
    if leaves:
        np.asarray(leaves[0].ravel()[:1])
    return out


class StageTimer:
    def __init__(self):
        self.times_ms: Dict[str, float] = {}

    def time(self, name: str, fn: Callable, *args, warmup: int = 1, reps: int = 3):
        fn_jit = jax.jit(fn)
        for _ in range(warmup):
            out = sync(fn_jit(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn_jit(*args)
        sync(out)
        self.times_ms[name] = (time.perf_counter() - t0) / reps * 1000.0
        return out

    def report(self, stream=None) -> str:
        lines = [f"    {k}: {v:.2f} ms" for k, v in self.times_ms.items()]
        total = sum(self.times_ms.values())
        lines.append(f"    total (sum of stages): {total:.2f} ms")
        out = "\n".join(lines)
        if stream is not None:
            print(out, file=stream)
        return out
