#!/usr/bin/env python
"""A/B the remat knobs against the measured-residual-bound fill adjoint.

profile_grad_marginal shows the fill adjoint dominates the backward
(52.8 of 70.5 ms on the watercube). If that cost is residual traffic,
jax.checkpoint on the fill should trade it for recompute. The r3 rejection
of remat predates two kernel generations; re-measure at HEAD.

Usage: python tools/remat_ab.py [--workload watercube|hetero]
"""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import argparse
import dataclasses
import time

import numpy as np
import jax
import jax.numpy as jnp

from raytracedicom_tpu import plan
from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import BeamInputs, DoseEngine, compute_beam_dose
from raytracedicom_tpu.physics.tables import load_physics_tables


def device_ms(fn, arg, n=4, trials=4):
    def timed(reps):
        @jax.jit
        def rep(a):
            def body(acc, k):
                return acc + fn(a + 1e-12 * k.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc
        v = float(rep(arg))
        assert np.isfinite(v), v
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(rep(arg))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.min(ts))
    return max((timed(n) - timed(1)) / (n - 1), 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="watercube",
                    choices=["watercube", "hetero"])
    args = ap.parse_args()
    wc = args.workload == "watercube"

    tables = load_physics_tables(water_cube=wc)
    ct_np = plan.watercube_ct()[0] if wc else plan.patient_ct()[0]
    beam = plan.watercube_beam(tables)
    ct = jnp.asarray(ct_np)
    inputs = BeamInputs(jnp.asarray(beam.spot_weights),
                        jnp.asarray(beam.energies),
                        jnp.asarray(beam.spot_sigmas))

    for name, kw in [("baseline", {}),
                     ("remat_fill", dict(remat_fill=True)),
                     ("remat_layers", dict(remat_layers=True))]:
        cfg = EngineConfig(**kw)
        eng = DoseEngine(tables, cfg)
        static = eng.beam_static(beam, ct_np.shape, ct_shape=ct_np.shape)
        target = jax.block_until_ready(compute_beam_dose(
            ct, jnp.zeros(static.dose_shape, jnp.float32),
            BeamInputs(0.9 * inputs.spot_weights, inputs.energies,
                       inputs.spot_sigmas),
            eng.table_arrays, static, cfg))

        def grad_scalar(w, static=static, cfg=cfg, eng=eng, target=target):
            def loss(wi, e):
                inp = BeamInputs(wi, e, inputs.spot_sigmas)
                dose0 = jnp.zeros(static.dose_shape, jnp.float32)
                dose = compute_beam_dose(ct, dose0, inp, eng.table_arrays,
                                         static, cfg)
                return jnp.mean((dose - target) ** 2)
            val, (gw, ge) = jax.value_and_grad(loss, argnums=(0, 1))(
                w, inputs.energies)
            return val + jnp.sum(gw) + jnp.sum(ge)

        def fwd_scalar(w, static=static, cfg=cfg, eng=eng):
            dose0 = jnp.zeros(static.dose_shape, jnp.float32)
            inp = BeamInputs(w, inputs.energies, inputs.spot_sigmas)
            return jnp.max(compute_beam_dose(ct, dose0, inp,
                                             eng.table_arrays, static, cfg))

        f = device_ms(fwd_scalar, inputs.spot_weights)
        g = device_ms(grad_scalar, 0.9 * inputs.spot_weights)
        print(f"{args.workload} [{name}]: fwd {f:.2f} ms, grad {g:.2f} ms "
              f"(bwd-only {g - f:.2f}, ratio {g / max(f, 1e-9):.3f})",
              flush=True)


if __name__ == "__main__":
    main()
