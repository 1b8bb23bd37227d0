#!/usr/bin/env python
"""Run the full watercube benchmark workload (256^3 CT, 33x33 spots x 20
layers, 512 tracer steps) end to end and report per-stage timings."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import DoseEngine
from raytracedicom_tpu.physics.tables import load_physics_tables
from raytracedicom_tpu import plan

def main():
    print("devices:", jax.devices())
    tables = load_physics_tables(water_cube=True)
    ct, _ = plan.watercube_ct()
    beam = plan.watercube_beam(tables)
    eng = DoseEngine(tables, EngineConfig())
    static = eng.beam_static(beam, ct.shape)
    print("ray dims", static.grid.ray_dims, "z_window", static.z_window,
          "max radius", static.max_radius, "bbox", static.bbox_min, static.bbox_max)
    ct_d = jnp.asarray(ct)

    t0 = time.time()
    dose = eng.compute_dose(ct_d, [beam])
    dose.block_until_ready()
    t_first = time.time() - t0
    print(f"first call (compile+run): {t_first:.2f}s")

    for trial in range(3):
        t0 = time.time()
        dose = eng.compute_dose(ct_d, [beam])
        dose.block_until_ready()
        print(f"steady run {trial}: {(time.time()-t0)*1000:.1f} ms")

    d = np.asarray(dose)
    print("dose max", d.max(), "sum", d.sum())
    axis = d[:, 128, 128]
    k = int(np.argmax(axis))
    print("central axis peak at k =", k, "world z =", k - 106,
          "(deepest layer peak depth", float(np.interp(beam.energies.max(),
           tables.energies, tables.peak_depths)), "mm; entry at z=149)")
    nz = np.nonzero(axis)[0]
    print("axis nonzero range", nz.min(), nz.max())
    np.save("/tmp/watercube_dose.npy", d)

if __name__ == "__main__":
    main()
