#!/usr/bin/env python
"""Probe: bf16x3 (Precision.HIGH) vs fp32 (HIGHEST) for the MXU banded-matmul
superposition — timing and accuracy at watercube shapes. TPU-only diagnostic
feeding the `mxu_precision` decision (see PERF.md)."""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracedicom_tpu.ops import superposition as sp


def timeit(fn, n=7):
    fn(); fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    W, Y, X = 264, 128, 128
    radius, pad = 16, 32
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    idd = jax.random.uniform(k1, (W, Y, X), jnp.float32)
    rs_slice = 0.2 + jax.random.uniform(k2, (W,), jnp.float32)
    rs_full = jnp.broadcast_to(rs_slice[:, None, None], (W, Y, X))
    rad_steps = jnp.full((W,), radius, jnp.int32)
    g = jax.random.uniform(k3, (W, Y + 2 * pad, X + 2 * pad), jnp.float32)

    results = {}
    for prec in ("HIGHEST", "HIGH", "DEFAULT"):
        sp.MXU_PRECISION = getattr(jax.lax.Precision, prec)
        f = jax.jit(lambda a, r, rd: sp.superpose_uniform_mxu(
            a, r, rd, radius, pad))
        b = jax.jit(lambda a, rf, r, gg, rd: sp.superpose_bwd_uniform_mxu(
            a, rf, r, gg, rd, radius, pad))
        out = np.asarray(f(idd, rs_slice, rad_steps))
        gi, gr = b(idd, rs_full, rs_slice, g, rad_steps)
        gi, gr = np.asarray(gi), np.asarray(gr)
        t_f = timeit(lambda: f(idd, rs_slice, rad_steps))
        t_b = timeit(lambda: b(idd, rs_full, rs_slice, g, rad_steps))
        results[prec] = (out, gi, gr, t_f, t_b)
        print(f"{prec:8s} fwd {t_f:6.2f} ms/layer  bwd {t_b:6.2f} ms/layer",
              flush=True)

    ref_out, ref_gi, ref_gr, _, _ = results["HIGHEST"]

    def relerr(a, b):
        return float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-30))

    for prec in ("HIGH", "DEFAULT"):
        out, gi, gr, _, _ = results[prec]
        print(f"{prec:8s} vs HIGHEST: out {relerr(out, ref_out):.2e}  "
              f"g_idd {relerr(gi, ref_gi):.2e}  g_rs {relerr(gr, ref_gr):.2e}",
              flush=True)


if __name__ == "__main__":
    main()
