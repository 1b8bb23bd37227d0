#!/usr/bin/env python
"""Backward-pass attribution inside the REAL whole-beam grad program:
stop_gradient ablations of individual adjoint paths, each timed with the
dispatch-corrected in-graph-repetition methodology (PERF.md). Unlike
profile_bwd_stages (isolated ops), the deltas here include residual-save
traffic and fusion effects of the full scan-over-layers program.

Usage: python tools/profile_grad_marginal.py [--workload watercube|hetero]
"""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import argparse
import time

import numpy as np, jax, jax.numpy as jnp

from raytracedicom_tpu import plan, engine as eng_mod
from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import BeamInputs, DoseEngine, compute_beam_dose
from raytracedicom_tpu.ops import idd_sigma as isig, spot_conv
from raytracedicom_tpu.ops import transfer as xfer_mod
from raytracedicom_tpu.physics.tables import load_physics_tables

sg = jax.lax.stop_gradient

ORIG_SUP = eng_mod.superpose_adaptive
ORIG_FILL = isig.fill_idd_and_sigma
ORIG_CONV = spot_conv.spot_to_ray_weights
ORIG_XFER = xfer_mod.transfer_bev_to_dose


def patch(name):
    eng_mod.superpose_adaptive = ORIG_SUP
    isig.fill_idd_and_sigma = ORIG_FILL
    spot_conv.spot_to_ray_weights = ORIG_CONV
    xfer_mod.transfer_bev_to_dose = ORIG_XFER
    if name == "no_rs_adj":
        eng_mod.superpose_adaptive = (
            lambda idd, rs, rads, r, p: ORIG_SUP(idd, sg(rs), rads, r, p))
    elif name == "no_idd_adj":
        eng_mod.superpose_adaptive = (
            lambda idd, rs, rads, r, p: ORIG_SUP(sg(idd), rs, rads, r, p))
    elif name == "no_sup_adj":
        eng_mod.superpose_adaptive = (
            lambda idd, rs, rads, r, p: ORIG_SUP(sg(idd), sg(rs), rads, r, p)
            + 0.0 * jnp.sum(idd))
    elif name == "no_fill_rs_chain":
        def fill(*a, **k):
            out = ORIG_FILL(*a, **k)
            return out._replace(r_sigma_eff=sg(out.r_sigma_eff))
        isig.fill_idd_and_sigma = fill
    elif name == "no_fill_adj":
        def fill(*a, **k):
            out = ORIG_FILL(*a, **k)
            return jax.tree_util.tree_map(sg, out)._replace(
                idd=sg(out.idd) + 0.0 * jnp.sum(a[2]))
        isig.fill_idd_and_sigma = fill
    elif name == "no_transfer_adj":
        def tr(dose, bev, *a, **k):
            return ORIG_XFER(dose, sg(bev), *a, **k) + 0.0 * jnp.sum(bev)
        xfer_mod.transfer_bev_to_dose = tr
    elif name == "no_conv_e":
        def conv(spot_w, entry_sigmas, *a, **k):
            return ORIG_CONV(spot_w, sg(entry_sigmas), *a, **k)
        spot_conv.spot_to_ray_weights = conv
    elif name != "base":
        raise ValueError(name)


def marginal_ms(fn, args, n=4, trials=4):
    def timed(reps):
        @jax.jit
        def rep(*args):
            def body(acc, k):
                eps = 1e-12 * k.astype(jnp.float32)
                out = fn(*((args[0] + eps,) + args[1:]))
                leaf = [x for x in jax.tree_util.tree_leaves(out)
                        if hasattr(x, "ravel")][0]
                return acc + leaf.ravel()[0].astype(jnp.float32), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(reps))
            return acc

        float(rep(*args))
        ts = []
        for _ in range(trials):
            t0 = time.perf_counter()
            float(rep(*args))
            ts.append((time.perf_counter() - t0) * 1e3)
        return float(np.min(ts))

    return max((timed(n) - timed(1)) / (n - 1), 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="watercube",
                    choices=["watercube", "hetero"])
    ap.add_argument("--cases", default="base,no_rs_adj,no_idd_adj,"
                    "no_fill_rs_chain,no_fill_adj,no_sup_adj,"
                    "no_transfer_adj,no_conv_e")
    ap.add_argument("--remat", default="", choices=["", "fill", "layers"])
    args = ap.parse_args()
    wc = args.workload == "watercube"

    tables = load_physics_tables(water_cube=wc)
    ct_np = plan.watercube_ct()[0] if wc else plan.patient_ct()[0]
    beam = plan.watercube_beam(tables)
    cfg = EngineConfig(remat_fill=args.remat == "fill",
                       remat_layers=args.remat == "layers")
    eng = DoseEngine(tables, cfg)
    static = eng.beam_static(beam, ct_np.shape)
    ct = jnp.asarray(ct_np)
    inputs = BeamInputs(
        spot_weights=jnp.asarray(beam.spot_weights),
        energies=jnp.asarray(beam.energies),
        spot_sigmas=jnp.asarray(beam.spot_sigmas),
    )
    target = jax.jit(
        lambda w: compute_beam_dose(ct, jnp.zeros(static.dose_shape, ct.dtype),
                                    inputs, eng.table_arrays, static, cfg)
    )(inputs.spot_weights)
    target = jax.block_until_ready(target)

    def fwd_scalar(w):
        inp = BeamInputs(spot_weights=w, energies=inputs.energies,
                         spot_sigmas=inputs.spot_sigmas)
        return jnp.max(compute_beam_dose(
            ct, jnp.zeros(static.dose_shape, ct.dtype), inp,
            eng.table_arrays, static, cfg))
    t_fwd = marginal_ms(fwd_scalar, (inputs.spot_weights,))
    print(f"forward: {t_fwd:.2f} ms", flush=True)

    base = None
    for case in args.cases.split(","):
        patch(case)

        def grad_scalar(w):
            def loss(wi, e):
                inp = BeamInputs(spot_weights=wi, energies=e,
                                 spot_sigmas=inputs.spot_sigmas)
                d = compute_beam_dose(ct, jnp.zeros(static.dose_shape, ct.dtype),
                                      inp, eng.table_arrays, static, cfg)
                return jnp.mean((d - target) ** 2) / jnp.mean(target ** 2)
            val, (gw, ge) = jax.value_and_grad(loss, argnums=(0, 1))(
                w, inputs.energies)
            return val + jnp.sum(gw) + jnp.sum(ge)

        t = marginal_ms(grad_scalar, (0.9 * inputs.spot_weights,))
        extra = ""
        if case == "base":
            base = t
        elif base is not None:
            extra = f"  (saves {base - t:+.2f} ms)"
        print(f"grad [{case}]: {t:.2f} ms  bwd-only {t - t_fwd:.2f}{extra}",
              flush=True)
    patch("base")


if __name__ == "__main__":
    main()
