"""Marginal per-stage costs via in-graph repetition (lax.scan of N
applications with CSE-defeating perturbations), on both benchmark fields.
The axon tunnel adds ~12 ms per dispatch, so standalone per-op timings
overstate small stages; these numbers are the ones PERF.md cites.

Usage: python tools/profile_marginal.py [--workload hetero|watercube]
"""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import argparse
import time

import numpy as np, jax, jax.numpy as jnp

from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import DoseEngine, first_larger_ordered
from raytracedicom_tpu.physics.tables import load_physics_tables
from raytracedicom_tpu.physics.interp import interp_at_index, interp_decimal_index
from raytracedicom_tpu.ops import idd_sigma as isig
from raytracedicom_tpu.ops import spot_conv, trace, transfer
from raytracedicom_tpu.ops.pallas_superposition import (
    effective_sem_radii, superpose_adaptive, superpose_pallas,
)
from raytracedicom_tpu import plan


def marginal_ms(fn, args, n=10, trials=5, probe=lambda out: out):
    """Pure device ms per application: (T(n) - T(1)) / (n - 1) with both T
    from in-jit lax.scan repetition (per-step input perturbation defeats
    CSE). The ~24 ms/dispatch tunnel cost cancels exactly; min-of-trials
    suppresses the tunnel's several-ms dispatch jitter (needed for sub-ms
    stages)."""
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
    ap.add_argument("--workload", default="hetero",
                    choices=["hetero", "watercube"])
    args = ap.parse_args()
    wc = args.workload == "watercube"

    tables = load_physics_tables(water_cube=wc)
    ct_np = plan.watercube_ct()[0] if wc else plan.patient_ct()[0]
    beam = plan.watercube_beam(tables)
    cfg = EngineConfig()
    eng = DoseEngine(tables, cfg)
    st = eng.beam_static(beam, ct_np.shape)
    tabs = eng.table_arrays
    ct = jnp.asarray(ct_np)
    grid = st.grid
    S, W = beam.steps, st.z_window
    nrx, nry = grid.ray_dims
    max_r, pad = st.max_radius, st.pad
    print(f"workload={args.workload} rays=({nrx},{nry}) W={W} max_r={max_r}")

    # ---- stage inputs (built once, off the clock) ----
    tr = jax.jit(lambda c: trace.trace_density_and_sp(
        c, st.ray_to_im, grid.ray_dims, S, tabs.density, tabs.density_scale,
        tabs.sp, tabs.sp_scale))(ct)
    geom = isig.step_geometry(grid.ray_res, grid.ray_offset,
                              st.ray_to_im.source_dist, S)
    bfi = jnp.min(tr.first_inside)
    wepl_min = jnp.min(tr.cumul_sp, axis=(1, 2))
    eidx = interp_decimal_index(tabs.energies, jnp.asarray(beam.energies))
    scalef = interp_at_index(tabs.scale_facts, eidx)
    peaks = interp_at_index(tabs.peak_depths, eidx)
    a, b = isig.sigma_sq_air_coefs(peaks, True)
    entry_z = (bfi.astype(jnp.float32) * jnp.float32(grid.ray_res[2])
               + jnp.float32(grid.ray_offset[2]))
    es = jnp.sqrt((a * entry_z ** 2 + b * entry_z)[:, None]
                  + jnp.asarray(beam.spot_sigmas) ** 2)
    after = jnp.minimum(first_larger_ordered(wepl_min, 1.05 * peaks),
                        jnp.max(tr.first_outside)).astype(jnp.int32)
    z0 = jnp.clip(bfi, 0, S - W).astype(jnp.int32)
    dens_w = jax.lax.dynamic_slice(tr.density, (z0, 0, 0), (W, nry, nrx))
    csp_w = jax.lax.dynamic_slice(tr.cumul_sp, (z0, 0, 0), (W, nry, nrx))
    geom_w = geom._replace(
        half_vw_sum=jax.lax.dynamic_slice(geom.half_vw_sum, (z0,), (W,)),
        step_vol=jax.lax.dynamic_slice(geom.step_vol, (z0,), (W,)))
    r_rl = dens_w * isig.lut1d_fast(tabs.rrl, dens_w * tabs.rrl_scale)
    li = 10
    layer = isig.LayerScalars(
        eidx[li], scalef[li], peaks[li],
        jnp.clip(after[li] - z0, 0, W).astype(jnp.int32),
        2.0 * a[li] * geom.delta_z * geom.corner_z + b[li] * geom.delta_z,
        a[li] * geom.delta_z ** 2, es[li, 0] ** 2)
    rw_all = jax.jit(lambda w: spot_conv.spot_to_ray_weights(
        w, es, grid.ray_dims, st.spot_delta, st.spot_offset,
        (grid.ray_res[0], grid.ray_res[1]),
        (grid.ray_offset[0], grid.ray_offset[1]),
        jnp.asarray([1.0, 1.0]), 3.0))(jnp.asarray(beam.spot_weights))

    def fill_fn(d, c):
        return isig.fill_idd_and_sigma(
            d, c, rw_all[li], tr.first_inside - z0, tr.first_outside - z0,
            bfi - z0, layer, geom_w, tabs.cidd, tabs.rrl, tabs.rrl_scale,
            r_rl=r_rl, first_step_abs=bfi)
    fill = jax.jit(fill_fn)(dens_w, csp_w)
    rads = effective_sem_radii(fill.r_sigma_eff, cfg.ks_sigma_cutoff, max_r)
    bev = jax.jit(lambda i_, r_: superpose_pallas(i_, r_, rads, max_r, pad))(
        fill.idd, fill.r_sigma_eff)
    dose0 = jnp.zeros(st.dose_shape, jnp.float32)
    g_slab = jnp.ones_like(bev)
    g_fill = (jnp.ones_like(fill.idd), jnp.ones_like(fill.r_sigma_eff))
    g_dose = jnp.ones_like(dose0)

    # ---- forward marginals ----
    t = marginal_ms(lambda c: trace.trace_density_and_sp(
        c, st.ray_to_im, grid.ray_dims, S, tabs.density, tabs.density_scale,
        tabs.sp, tabs.sp_scale), (ct,), n=4)
    print(f"trace fwd (full beam): {t:.2f} ms")

    t = marginal_ms(lambda w: spot_conv.spot_to_ray_weights(
        w, es, grid.ray_dims, st.spot_delta, st.spot_offset,
        (grid.ray_res[0], grid.ray_res[1]),
        (grid.ray_offset[0], grid.ray_offset[1]),
        jnp.asarray([1.0, 1.0]), 3.0),
        (jnp.asarray(beam.spot_weights),), n=10)
    print(f"spot conv fwd (all 20 layers): {t:.2f} ms")

    t = marginal_ms(fill_fn, (dens_w, csp_w), n=10)
    print(f"fill fwd (1 layer): {t:.2f} ms")

    def fill_bwd_fn(d, c, gi, gr):
        def f(dd, rw):
            o = isig.fill_idd_and_sigma(
                dd, c, rw, tr.first_inside - z0, tr.first_outside - z0,
                bfi - z0, layer, geom_w, tabs.cidd, tabs.rrl, tabs.rrl_scale,
                r_rl=r_rl, first_step_abs=bfi)
            return o.idd, o.r_sigma_eff
        _, vjp = jax.vjp(f, d, rw_all[li])
        return vjp((gi, gr))
    t = marginal_ms(fill_bwd_fn, (dens_w, csp_w) + g_fill, n=6)
    print(f"fill fwd+vjp (1 layer): {t:.2f} ms")

    t = marginal_ms(lambda i_, r_: superpose_adaptive(i_, r_, rads, max_r, pad),
                    (fill.idd, fill.r_sigma_eff), n=10)
    print(f"superpose fwd (1 layer, adaptive dispatch): {t:.2f} ms")

    def sup_bwd(i_, r_, g):
        _, vjp = jax.vjp(
            lambda a, bb: superpose_pallas(a, bb, rads, max_r, pad), i_, r_)
        return vjp(g)
    t = marginal_ms(sup_bwd, (fill.idd, fill.r_sigma_eff, g_slab), n=6)
    print(f"superpose fwd+vjp (1 layer): {t:.2f} ms")

    t = marginal_ms(lambda b_: transfer.transfer_bev_to_dose(
        dose0, b_, st.d2f, st.bbox_min, st.bbox_max,
        z_shift=jnp.float32(0.0)), (bev,), n=6)
    print(f"transfer fwd (full beam): {t:.2f} ms")

    def tf_bwd(b_, g):
        _, vjp = jax.vjp(lambda x: transfer.transfer_bev_to_dose(
            dose0, x, st.d2f, st.bbox_min, st.bbox_max,
            z_shift=jnp.float32(0.0)), b_)
        return vjp(g)
    t = marginal_ms(tf_bwd, (bev, g_dose), n=4)
    print(f"transfer fwd+vjp (full beam): {t:.2f} ms")

    def conv_bwd(w, g):
        _, vjp = jax.vjp(lambda ww: spot_conv.spot_to_ray_weights(
            ww, es, grid.ray_dims, st.spot_delta, st.spot_offset,
            (grid.ray_res[0], grid.ray_res[1]),
            (grid.ray_offset[0], grid.ray_offset[1]),
            jnp.asarray([1.0, 1.0]), 3.0), w)
        return vjp(g)
    t = marginal_ms(conv_bwd, (jnp.asarray(beam.spot_weights),
                               jnp.ones_like(rw_all)), n=6)
    print(f"spot conv fwd+vjp (all 20 layers): {t:.2f} ms")

    # ---- whole-beam reconciliation anchors (same program bench.py times) ----
    from raytracedicom_tpu.engine import BeamInputs, compute_beam_dose
    inputs = BeamInputs(spot_weights=jnp.asarray(beam.spot_weights),
                        energies=jnp.asarray(beam.energies),
                        spot_sigmas=jnp.asarray(beam.spot_sigmas))

    def whole_fwd(w):
        inp = BeamInputs(spot_weights=w, energies=inputs.energies,
                         spot_sigmas=inputs.spot_sigmas)
        return jnp.max(compute_beam_dose(
            ct, jnp.zeros(st.dose_shape, jnp.float32), inp, tabs, st, cfg))
    t_fwd = marginal_ms(whole_fwd, (inputs.spot_weights,), n=4)
    print(f"WHOLE beam fwd: {t_fwd:.2f} ms")

    target = jax.jit(whole_fwd)(inputs.spot_weights)  # scalar target is fine

    def whole_grad(w):
        def loss(wi, e):
            inp = BeamInputs(spot_weights=wi, energies=e,
                             spot_sigmas=inputs.spot_sigmas)
            d = compute_beam_dose(ct, jnp.zeros(st.dose_shape, jnp.float32),
                                  inp, tabs, st, cfg)
            return jnp.mean((d - target) ** 2)
        val, (gw, ge) = jax.value_and_grad(loss, argnums=(0, 1))(
            w, inputs.energies)
        return val + jnp.sum(gw) + jnp.sum(ge)
    t_grad = marginal_ms(whole_grad, (0.9 * inputs.spot_weights,), n=4)
    print(f"WHOLE beam fwd+grad: {t_grad:.2f} ms (backward-only "
          f"{t_grad - t_fwd:.2f} ms)")


if __name__ == "__main__":
    main()
