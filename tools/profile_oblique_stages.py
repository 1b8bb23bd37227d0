#!/usr/bin/env python
"""Stage attribution of the oblique (G30/C15) watercube beam: ablate the
two band-walk gathers inside the real compiled program (constant
substitution; the layer pipeline keeps running on the substituted values)
with the dispatch-corrected methodology.
"""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import time

import numpy as np
import jax
import jax.numpy as jnp

from raytracedicom_tpu import plan
from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import BeamInputs, DoseEngine, compute_beam_dose
from raytracedicom_tpu.ops import trace as trace_mod
from raytracedicom_tpu.ops import transfer as xfer_mod
from raytracedicom_tpu.physics.tables import load_physics_tables

ORIG_TRACE = trace_mod.trace_density_and_sp
ORIG_XFER = xfer_mod.transfer_vals


def device_ms(fn, arg, trials=4):
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
        for _ in range(trials):
            t0 = time.perf_counter()
            float(rep(arg))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.min(ts))
    return max((timed(4) - timed(1)) / 3.0, 0.0)


def main():
    tables = load_physics_tables(water_cube=True)
    ct_np, i2w = plan.watercube_ct()
    beam = plan.rotate_beam(plan.watercube_beam(tables), 30.0, 15.0, i2w,
                            ct_np.shape, steps=512)
    cfg = EngineConfig()
    eng = DoseEngine(tables, cfg)
    static = eng.beam_static(beam, ct_np.shape, ct_shape=ct_np.shape)
    ct = jnp.asarray(ct_np)
    inputs = BeamInputs(jnp.asarray(beam.spot_weights),
                        jnp.asarray(beam.energies),
                        jnp.asarray(beam.spot_sigmas))

    def stub_trace(ct_vol, t, ray_dims, steps, dl, ds, sl, ss, **kw):
        full = ORIG_TRACE(ct_vol, t, ray_dims, steps, dl, ds, sl, ss, **kw)
        nx, ny = ray_dims
        z = ct_vol.ravel()[0] * 0
        const = jax.tree_util.tree_map(
            lambda a: jnp.asarray(np.asarray(a) * 0 + (np.asarray(a) * 0 + 1))
            if False else a, full)
        # constant-shaped replacement that still depends on ct (keeps the
        # program structure; drops the gather work)
        dens = jnp.full((steps, ny, nx), 1.0, jnp.float32) + z
        csp = jnp.cumsum(jnp.full((steps, ny, nx), 1.0, jnp.float32), 0) + z
        fi = jnp.full((ny, nx), 10, jnp.int32)
        fo = jnp.full((ny, nx), steps - 5, jnp.int32)
        return type(full)(dens, csp, fi, fo, full.step_len)

    def stub_xfer(bev, t, bbox_min, bbox_max, z_shift=None, y_shift=None,
                  shift_span=(0, 0)):
        (x0, y0, z0), (x1, y1, z1) = bbox_min, bbox_max
        s = jnp.sum(bev) * 0
        return jnp.full((z1 - z0 + 1, y1 - y0 + 1, x1 - x0 + 1), 1e-9,
                        jnp.float32) + s + 0 * (jnp.zeros(()) if z_shift is None else z_shift)

    def run(name, patch_trace, patch_xfer):
        trace_mod.trace_density_and_sp = stub_trace if patch_trace else ORIG_TRACE
        xfer_mod.transfer_vals = stub_xfer if patch_xfer else ORIG_XFER
        try:
            def f(w):
                inp = BeamInputs(w, inputs.energies, inputs.spot_sigmas)
                dose0 = jnp.zeros(static.dose_shape, jnp.float32)
                return jnp.max(compute_beam_dose(ct, dose0, inp,
                                                 eng.table_arrays, static,
                                                 cfg))
            t = device_ms(f, inputs.spot_weights)
            print(f"{name}: {t:.1f} ms", flush=True)
            return t
        finally:
            trace_mod.trace_density_and_sp = ORIG_TRACE
            xfer_mod.transfer_vals = ORIG_XFER

    base = run("full oblique beam", False, False)
    no_tr = run("trace gather -> constants", True, False)
    no_xf = run("transfer gather -> constants", False, True)
    neither = run("both -> constants", True, True)
    print(f"K1 gather ~= {base - no_tr:.1f} ms, K6 gather ~= "
          f"{base - no_xf:.1f} ms, residual pipeline ~= {neither:.1f} ms")


if __name__ == "__main__":
    main()
