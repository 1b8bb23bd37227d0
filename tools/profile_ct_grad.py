#!/usr/bin/env python
"""d-dose/d-CT (HU-grid gradient) timing through the full engine.

BASELINE.json lists HU-grid differentiability as a first-class target; the
fused K1 tail ships an analytic TPU-native adjoint (pallas_trace._ftt_bwd:
reverse cumsum + Pallas LUT slopes + banded tent transpose). This reports
the dispatch-corrected device time of value_and_grad w.r.t. the CT volume
for the watercube workload, next to the forward, for PERF.md.

Usage: python tools/profile_ct_grad.py [steps]
"""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import numpy as np
import jax
import jax.numpy as jnp

from raytracedicom_tpu import plan
from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import BeamInputs, DoseEngine, compute_beam_dose
from raytracedicom_tpu.physics.tables import load_physics_tables


def device_ms(fn, arg, n_trials=3):
    def timed(n):
        @jax.jit
        def rep(a):
            def body(acc, k):
                return acc + fn(a + 1e-12 * k.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
            return acc
        v = float(rep(arg))
        assert np.isfinite(v), v
        ts = []
        for _ in range(n_trials):
            t0 = time.perf_counter()
            float(rep(arg))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.median(ts))
    return max((timed(4) - timed(1)) / 3.0, 0.0)


def main():
    tables = load_physics_tables(water_cube=True)
    ct_np, _ = plan.watercube_ct()
    beam = plan.watercube_beam(tables)
    cfg = EngineConfig()
    eng = DoseEngine(tables, cfg)
    static = eng.beam_static(beam, ct_np.shape, ct_shape=ct_np.shape)
    ct = jnp.asarray(ct_np)
    inputs = BeamInputs(jnp.asarray(beam.spot_weights),
                        jnp.asarray(beam.energies),
                        jnp.asarray(beam.spot_sigmas))

    # target from perturbed weights so the residual (and the CT gradient)
    # is nonzero at the measured point
    tgt_inputs = BeamInputs(0.9 * inputs.spot_weights, inputs.energies,
                            inputs.spot_sigmas)
    target = compute_beam_dose(ct, jnp.zeros(static.dose_shape, jnp.float32),
                               tgt_inputs, eng.table_arrays, static, cfg)
    target = jax.block_until_ready(target)

    def fwd(c):
        dose0 = jnp.zeros(static.dose_shape, jnp.float32)
        return jnp.max(compute_beam_dose(c, dose0, inputs, eng.table_arrays,
                                         static, cfg))

    def ct_loss_grad(c):
        def loss(cc):
            dose0 = jnp.zeros(static.dose_shape, jnp.float32)
            dose = compute_beam_dose(cc, dose0, inputs, eng.table_arrays,
                                     static, cfg)
            return jnp.mean((dose - target) ** 2)
        val, g = jax.value_and_grad(loss)(c)
        return val + jnp.sum(jnp.abs(g))

    t0 = time.time()
    v = float(jax.jit(ct_loss_grad)(ct))
    print(f"ct-grad compile+run {time.time() - t0:.1f}s, value {v:.3e}")
    assert np.isfinite(v) and v > 0, "zero/NaN CT gradient"

    f_ms = device_ms(fwd, ct)
    g_ms = device_ms(ct_loss_grad, ct)
    print(f"watercube forward device ms: {f_ms:.2f}")
    print(f"watercube d-dose/d-CT value_and_grad device ms: {g_ms:.2f} "
          f"(ratio {g_ms / max(f_ms, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
