#!/usr/bin/env python
"""Per-stage forward/backward microtimings at watercube shapes (TPU)."""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracedicom_tpu import plan
from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import BeamInputs, DoseEngine
from raytracedicom_tpu.physics.tables import load_physics_tables


def timeit(fn, n=5):
    fn()
    fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    tables = load_physics_tables(water_cube=True)
    ct_np, _ = plan.watercube_ct()
    beam = plan.watercube_beam(tables)
    cfg = EngineConfig()
    eng = DoseEngine(tables, cfg)
    static = eng.beam_static(beam, ct_np.shape)
    grid = static.grid
    nrx, nry = grid.ray_dims
    W = static.z_window
    L = static.n_layers
    pad = static.pad
    max_r = static.max_radius
    print(f"ray_dims=({nrx},{nry}) W={W} L={L} pad={pad} max_r={max_r} "
          f"dose_shape={static.dose_shape} "
          f"bbox={static.bbox_min}..{static.bbox_max}")

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    idd = jax.random.uniform(k1, (W, nry, nrx), jnp.float32)
    rs = 0.2 + jax.random.uniform(k2, (W, nry, nrx), jnp.float32)
    g_slab = jax.random.uniform(k3, (W, nry + 2 * pad, nrx + 2 * pad), jnp.float32)

    from raytracedicom_tpu.ops.pallas_superposition import (
        effective_sem_radii, superpose_pallas_raw, superpose_bwd_pallas,
    )
    rads = effective_sem_radii(rs, cfg.ks_sigma_cutoff, max_r)

    f_fwd = jax.jit(lambda a, b, r: superpose_pallas_raw(a, b, r, max_r, pad))
    f_bwd = jax.jit(lambda a, b, g, r: superpose_bwd_pallas(a, b, g, r, max_r, pad))
    t_fwd = timeit(lambda: jax.block_until_ready(f_fwd(idd, rs, rads)))
    t_bwd = timeit(lambda: jax.block_until_ready(f_bwd(idd, rs, g_slab, rads)))
    print(f"superpose fwd {t_fwd:.2f} ms/layer ({L}x = {L*t_fwd:.0f}), "
          f"bwd {t_bwd:.2f} ms/layer ({L}x = {L*t_bwd:.0f})")

    # transfer fwd + adjoint
    from raytracedicom_tpu.ops import transfer
    bev = jax.random.uniform(key, (W, nry + 2 * pad, nrx + 2 * pad), jnp.float32)
    dose0 = jnp.zeros(static.dose_shape, jnp.float32)

    def tf(b):
        return transfer.transfer_bev_to_dose(
            dose0, b, static.d2f, static.bbox_min, static.bbox_max,
            z_shift=jnp.float32(0.0))
    tf_j = jax.jit(tf)
    t_tf = timeit(lambda: jax.block_until_ready(tf_j(bev)))
    tf_vjp = jax.jit(lambda b, g: jax.vjp(tf, b)[1](g)[0])
    gd = jax.random.uniform(key, static.dose_shape, jnp.float32)
    t_tfb = timeit(lambda: jax.block_until_ready(tf_vjp(bev, gd)))
    print(f"transfer fwd {t_tf:.2f} ms, bwd {t_tfb:.2f} ms")

    # fill fwd + vjp wrt (ray_weights, layer scalars)
    from raytracedicom_tpu.ops import idd_sigma as isig
    dens = jnp.full((W, nry, nrx), 1.0, jnp.float32)
    csp = jnp.cumsum(jnp.full((W, nry, nrx), 0.94, jnp.float32), axis=0)
    rw = jax.random.uniform(key, (nry, nrx), jnp.float32) * 100.0
    fi = jnp.zeros((nry, nrx), jnp.int32)
    fo = jnp.full((nry, nrx), W, jnp.int32)
    fs = jnp.int32(0)
    geom = isig.step_geometry(grid.ray_res, grid.ray_offset,
                              static.ray_to_im.source_dist, W)
    ta = eng.table_arrays
    r_rl = dens * 0.01

    def fill_fn(rw_, scal):
        eidx, escale, peak = scal
        layer = isig.LayerScalars(
            energy_idx=eidx, energy_scale=escale, peak_depth=peak,
            after_last=jnp.int32(W), air_lin=jnp.float32(1e-4),
            air_quad=jnp.float32(1e-6), entry_sigma_sq=jnp.float32(0.0))
        fill = isig.fill_idd_and_sigma(
            dens, csp, rw_, fi, fo, fs, layer, geom,
            ta.cidd, ta.rrl, ta.rrl_scale, dose_to_water=True,
            nuclear_mode=None, r_rl=r_rl, first_step_abs=fs)
        return fill.idd, fill.r_sigma_eff

    scal = (jnp.float32(100.0), jnp.float32(5.0), jnp.float32(150.0))
    fill_j = jax.jit(fill_fn)
    t_fill = timeit(lambda: jax.block_until_ready(fill_j(rw, scal)))

    gi = jax.random.uniform(key, (W, nry, nrx), jnp.float32)
    gr = jax.random.uniform(key, (W, nry, nrx), jnp.float32)

    @jax.jit
    def fill_vjp(rw_, scal, gi, gr):
        _, vjp = jax.vjp(fill_fn, rw_, scal)
        return vjp((gi, gr))
    t_fillb = timeit(lambda: jax.block_until_ready(fill_vjp(rw, scal, gi, gr)))
    print(f"fill fwd {t_fill:.2f} ms/layer ({L}x = {L*t_fill:.0f}), "
          f"vjp(fwd+bwd) {t_fillb:.2f} ms/layer ({L}x = {L*t_fillb:.0f})")

    # trace fwd (for reference)
    from raytracedicom_tpu.ops import trace as trc
    ct = jnp.asarray(ct_np)
    tr_j = jax.jit(lambda c: trc.trace_density_and_sp(
        c, static.ray_to_im, grid.ray_dims, static.steps,
        ta.density, ta.density_scale, ta.sp, ta.sp_scale))
    t_tr = timeit(lambda: jax.block_until_ready(tr_j(ct)))
    print(f"trace fwd {t_tr:.2f} ms")

    # spot conv fwd+bwd
    from raytracedicom_tpu.ops import spot_conv
    inputs = BeamInputs(
        spot_weights=jnp.asarray(beam.spot_weights),
        energies=jnp.asarray(beam.energies),
        spot_sigmas=jnp.asarray(beam.spot_sigmas))
    entry_sigmas = jnp.asarray(beam.spot_sigmas)
    pxm = jnp.ones((L, 2), jnp.float32)

    def conv_fn(w, es):
        return spot_conv.spot_to_ray_weights(
            w, es, grid.ray_dims, static.spot_delta, static.spot_offset,
            (grid.ray_res[0], grid.ray_res[1]),
            (grid.ray_offset[0], grid.ray_offset[1]),
            pxm, cfg.conv_sigma_cutoff)
    conv_j = jax.jit(conv_fn)
    t_cv = timeit(lambda: jax.block_until_ready(conv_j(inputs.spot_weights, entry_sigmas)))
    gcv = jnp.ones((L, nry, nrx), jnp.float32)

    @jax.jit
    def conv_vjp(w, es, g):
        _, vjp = jax.vjp(conv_fn, w, es)
        return vjp(g)
    t_cvb = timeit(lambda: jax.block_until_ready(conv_vjp(inputs.spot_weights, entry_sigmas, gcv)))
    print(f"spot_conv fwd {t_cv:.2f} ms, vjp {t_cvb:.2f} ms")


if __name__ == "__main__":
    main()
