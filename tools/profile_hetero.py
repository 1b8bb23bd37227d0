"""Patient-like heterogeneous benchmark probe: forward + grad ms/beam on the
general (per-source) superposition branch, plus the per-stage split for the
deepest layer. Companion to profile_stages.py (which runs the homogeneous
watercube)."""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import numpy as np, jax, jax.numpy as jnp

from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import BeamInputs, DoseEngine, compute_beam_dose
from raytracedicom_tpu.physics.tables import load_physics_tables
from raytracedicom_tpu import plan


def med_ms(fn, n=5):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)), [round(t, 1) for t in ts]


def main():
    tables = load_physics_tables(water_cube=False)
    ct_np, _ = plan.patient_ct()
    beam = plan.watercube_beam(tables)
    cfg = EngineConfig()
    eng = DoseEngine(tables, cfg)
    static = eng.beam_static(beam, ct_np.shape)
    print(f"ray dims {static.grid.ray_dims}, window {static.z_window}, "
          f"max radius {static.max_radius}, pad {static.pad}")

    ct = jnp.asarray(ct_np)
    inputs = BeamInputs(spot_weights=jnp.asarray(beam.spot_weights),
                        energies=jnp.asarray(beam.energies),
                        spot_sigmas=jnp.asarray(beam.spot_sigmas))
    kernel = eng._kernel(static)

    def forward():
        dose = jnp.zeros(static.dose_shape, jnp.float32)
        return float(jnp.max(kernel(ct, dose, inputs, eng.table_arrays)))

    mx = forward()
    print(f"dose max {mx:.4g}")
    assert np.isfinite(mx) and mx > 0
    fwd, ts = med_ms(forward)
    print(f"hetero forward: {fwd:.1f} ms  trials {ts}")

    target = kernel(ct, jnp.zeros(static.dose_shape, jnp.float32),
                    inputs, eng.table_arrays)
    target = jax.block_until_ready(target)

    @jax.jit
    def loss_and_grad(weights, energies, sigmas):
        def loss(w, e):
            inp = BeamInputs(w, e, sigmas)
            dose = compute_beam_dose(ct, jnp.zeros(static.dose_shape, ct.dtype),
                                     inp, eng.table_arrays, static, cfg)
            return jnp.mean((dose - target) ** 2) / jnp.mean(target ** 2)
        return jax.value_and_grad(loss, argnums=(0, 1))(weights, energies)

    def grad_pass():
        val, (gw, ge) = loss_and_grad(0.9 * inputs.spot_weights,
                                      inputs.energies, inputs.spot_sigmas)
        return float(val) + float(jnp.sum(gw)) + float(jnp.sum(ge))

    gv = grad_pass()
    assert np.isfinite(gv)
    gms, ts = med_ms(grad_pass, n=3)
    print(f"hetero grad: {gms:.1f} ms  trials {ts}  ratio {gms / fwd:.2f}")


if __name__ == "__main__":
    main()
