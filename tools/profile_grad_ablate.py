#!/usr/bin/env python
"""Ablate the energy-gradient path: stop_gradient individual stage inputs to
see which adjoint dominates the backward time. TPU-only diagnostic."""
import sys
import os
import time
import argparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracedicom_tpu import plan, engine as eng_mod
from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import BeamInputs, DoseEngine, compute_beam_dose
from raytracedicom_tpu.ops import spot_conv, idd_sigma as isig
from raytracedicom_tpu.physics.tables import load_physics_tables

sg = jax.lax.stop_gradient


def timeit(fn, n=3):
    fn()
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


ORIG_SUP = eng_mod.superpose_adaptive
ORIG_FILL = isig.fill_idd_and_sigma
ORIG_CONV = spot_conv.spot_to_ray_weights
from raytracedicom_tpu.ops import transfer as _xfer_mod
ORIG_XFER = _xfer_mod.transfer_bev_to_dose


def patch(name):
    """Install one ablation; returns a restore fn."""
    from raytracedicom_tpu.ops import transfer as xfer
    eng_mod.superpose_adaptive = ORIG_SUP
    isig.fill_idd_and_sigma = ORIG_FILL
    spot_conv.spot_to_ray_weights = ORIG_CONV
    xfer.transfer_bev_to_dose = ORIG_XFER
    if name == "no_rs_adj":
        # kill d(superposition)/d(rs): rs enters superposition detached
        eng_mod.superpose_adaptive = (
            lambda idd, rs, rads, r, p: ORIG_SUP(idd, sg(rs), rads, r, p))
    elif name == "no_sup_adj":
        # kill both superposition adjoints (idd passthrough only measures
        # nothing; instead detach rs AND route idd grad via identity-cost path)
        eng_mod.superpose_adaptive = (
            lambda idd, rs, rads, r, p: ORIG_SUP(sg(idd), sg(rs), rads, r, p)
            + 0.0 * jnp.sum(idd))
    elif name == "no_fill_e":
        # fill sees detached layer scalars: no energy grad through K2
        def fill(*a, **k):
            a = list(a)
            a[6] = jax.tree_util.tree_map(sg, a[6])  # LayerScalars
            return ORIG_FILL(*a, **k)
        isig.fill_idd_and_sigma = fill
    elif name == "no_fill_rs_chain":
        # superposition's g_rs is still computed but stops at the fill
        # boundary: isolates the fill sigma-recurrence adjoint
        def fill(*a, **k):
            out = ORIG_FILL(*a, **k)
            return out._replace(r_sigma_eff=sg(out.r_sigma_eff))
        isig.fill_idd_and_sigma = fill
    elif name == "no_transfer_adj":
        # kill the BEV->dose transfer adjoint (tent transpose)
        from raytracedicom_tpu.ops import transfer as xfer
        orig = xfer.transfer_bev_to_dose

        def tr(dose, bev, *a, **k):
            return orig(dose, sg(bev), *a, **k) + 0.0 * jnp.sum(bev)
        xfer.transfer_bev_to_dose = tr
    elif name == "no_conv_e":
        # spot conv sees detached sigmas: no energy grad through K3 weights
        def conv(spot_w, entry_sigmas, *a, **k):
            return ORIG_CONV(spot_w, sg(entry_sigmas), *a, **k)
        spot_conv.spot_to_ray_weights = conv
    elif name != "base":
        raise ValueError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="base,no_rs_adj,no_fill_e,no_conv_e")
    args = ap.parse_args()

    tables = load_physics_tables(water_cube=True)
    ct_np, _ = plan.watercube_ct()
    beam = plan.watercube_beam(tables)
    cfg = EngineConfig()
    eng = DoseEngine(tables, cfg)
    static = eng.beam_static(beam, ct_np.shape)
    ct = jnp.asarray(ct_np)
    inputs = BeamInputs(
        spot_weights=jnp.asarray(beam.spot_weights),
        energies=jnp.asarray(beam.energies),
        spot_sigmas=jnp.asarray(beam.spot_sigmas),
    )
    kernel = eng._kernel(static)
    target = kernel(ct, jnp.zeros(static.dose_shape, jnp.float32),
                    inputs, eng.table_arrays)
    target = jax.block_until_ready(target)

    for case in args.cases.split(","):
        patch(case)

        @jax.jit
        def lg(weights, energies, sigmas):
            def loss(e):
                inp = BeamInputs(spot_weights=weights, energies=e,
                                 spot_sigmas=sigmas)
                dose0 = jnp.zeros(static.dose_shape, ct.dtype)
                dose = compute_beam_dose(ct, dose0, inp, eng.table_arrays,
                                         static, cfg)
                return jnp.mean((dose - target) ** 2) / jnp.mean(target ** 2)
            return jax.value_and_grad(loss)(energies)

        def run():
            val, ge = lg(0.9 * inputs.spot_weights, inputs.energies,
                         inputs.spot_sigmas)
            return float(val) + float(jnp.sum(ge))

        t = timeit(run)
        print(f"grad(e) [{case}]: {t:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
