#!/usr/bin/env python
"""Break down the watercube gradient pass: which inputs and which stages
dominate the backward time. Run on TPU."""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracedicom_tpu import plan
from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import BeamInputs, DoseEngine, compute_beam_dose
from raytracedicom_tpu.physics.tables import load_physics_tables


def timeit(fn, n=3):
    fn()
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    tables = load_physics_tables(water_cube=True)
    ct_np, _ = plan.watercube_ct()
    beam = plan.watercube_beam(tables)

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--remat", type=int, default=1)
    ap.add_argument("--cases", default="w,e,we")
    args = ap.parse_args()
    for remat in ([bool(args.remat)]):
        cfg = EngineConfig(remat_layers=remat)
        eng = DoseEngine(tables, cfg)
        static = eng.beam_static(beam, ct_np.shape)
        ct = jnp.asarray(ct_np)
        inputs = BeamInputs(
            spot_weights=jnp.asarray(beam.spot_weights),
            energies=jnp.asarray(beam.energies),
            spot_sigmas=jnp.asarray(beam.spot_sigmas),
        )
        kernel = eng._kernel(static)

        def forward():
            dose = jnp.zeros(static.dose_shape, jnp.float32)
            out = kernel(ct, dose, inputs, eng.table_arrays)
            return float(jnp.max(out))

        target = kernel(ct, jnp.zeros(static.dose_shape, jnp.float32),
                        inputs, eng.table_arrays)
        target = jax.block_until_ready(target)

        def make_grad(argnums):
            @jax.jit
            def lg(weights, energies, sigmas):
                def loss(w, e, s):
                    inp = BeamInputs(spot_weights=w, energies=e, spot_sigmas=s)
                    dose0 = jnp.zeros(static.dose_shape, ct.dtype)
                    dose = compute_beam_dose(ct, dose0, inp, eng.table_arrays,
                                             static, cfg)
                    return jnp.mean((dose - target) ** 2) / jnp.mean(target ** 2)
                return jax.value_and_grad(loss, argnums=argnums)(
                    weights, energies, sigmas)
            def run():
                val, g = lg(0.9 * inputs.spot_weights, inputs.energies,
                            inputs.spot_sigmas)
                return float(val) + sum(float(jnp.sum(x)) for x in jax.tree_util.tree_leaves(g))
            return run

        fwd = timeit(forward)
        print(f"remat={remat}: fwd {fwd:.1f} ms", flush=True)
        argmap = {"w": (0,), "e": (1,), "s": (2,), "we": (0, 1)}
        for case in args.cases.split(","):
            t = timeit(make_grad(argmap[case]))
            print(f"  grad({case}) {t:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
