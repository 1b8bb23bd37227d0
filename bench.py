#!/usr/bin/env python
"""Headline benchmark: watercube forward dose, ms per beam.

Workload = the reference's benchmark config (SURVEY.md §6): 256^3 CT,
33x33 spots x 20 energy layers (118.12..172.51 MeV), 512 tracer steps,
3 mm fan spacing. Baseline = the reference's headline claim of sub-second
per field on GPU (README.md:2), taken as 1000 ms.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline > 1 means faster than the baseline claim.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_MS = 1000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracedicom_tpu import plan
    from raytracedicom_tpu.config import EngineConfig
    from raytracedicom_tpu.engine import BeamInputs, DoseEngine
    from raytracedicom_tpu.physics.tables import load_physics_tables

    tables = load_physics_tables(water_cube=True)
    ct_np, _ = plan.watercube_ct()
    beam = plan.watercube_beam(tables)
    eng = DoseEngine(tables, EngineConfig())
    static = eng.beam_static(beam, ct_np.shape)

    ct = jnp.asarray(ct_np)
    inputs = BeamInputs(
        spot_weights=jnp.asarray(beam.spot_weights),
        energies=jnp.asarray(beam.energies),
        spot_sigmas=jnp.asarray(beam.spot_sigmas),
    )
    kernel = eng._kernel(static)

    def run():
        dose = jnp.zeros(static.dose_shape, jnp.float32)
        out = kernel(ct, dose, inputs, eng.table_arrays)
        # force a host roundtrip: on the experimental axon platform
        # block_until_ready returns before execution finishes
        return float(jnp.max(out))

    mx = run()  # compile + warm-up
    assert np.isfinite(mx) and mx > 0, f"bad dose max {mx}"
    run()

    n_trials = 5
    times = []
    for _ in range(n_trials):
        t0 = time.perf_counter()
        run()
        times.append((time.perf_counter() - t0) * 1000.0)
    ms = float(np.median(times))
    print(f"# trials: {[round(t, 2) for t in times]}, dose max {mx:.4g}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "watercube_forward_ms_per_beam",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
