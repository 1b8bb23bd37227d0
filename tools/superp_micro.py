"""Superposition kernel micro-benchmark: marginal ms/layer via in-graph
repetition (the axon tunnel adds ~12 ms per dispatch, so standalone timings
lie). Builds real heterogeneous fill data (patient_ct layer), then times
N in-jit applications of kernel variants."""
import os, sys; sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import functools
import time

import numpy as np, jax, jax.numpy as jnp

from raytracedicom_tpu.config import EngineConfig
from raytracedicom_tpu.engine import DoseEngine, first_larger_ordered
from raytracedicom_tpu.physics.tables import load_physics_tables
from raytracedicom_tpu.physics.interp import interp_at_index, interp_decimal_index
from raytracedicom_tpu.ops import idd_sigma as isig
from raytracedicom_tpu.ops import trace
from raytracedicom_tpu.ops.pallas_superposition import effective_sem_radii
from raytracedicom_tpu import plan


def build_fill(li=10):
    tables = load_physics_tables(water_cube=False)
    ct_np, _ = plan.patient_ct()
    beam = plan.watercube_beam(tables)
    cfg = EngineConfig()
    eng = DoseEngine(tables, cfg)
    st = eng.beam_static(beam, ct_np.shape)
    tabs = eng.table_arrays
    grid = st.grid
    S, W = beam.steps, st.z_window
    nrx, nry = grid.ray_dims
    tr = jax.jit(lambda c: trace.trace_density_and_sp(
        c, st.ray_to_im, grid.ray_dims, S, tabs.density, tabs.density_scale,
        tabs.sp, tabs.sp_scale))(jnp.asarray(ct_np))
    geom = isig.step_geometry(grid.ray_res, grid.ray_offset, st.ray_to_im.source_dist, S)
    bfi = jnp.min(tr.first_inside)
    wepl_min = jnp.min(tr.cumul_sp, axis=(1, 2))
    eidx = interp_decimal_index(tabs.energies, jnp.asarray(beam.energies))
    scalef = interp_at_index(tabs.scale_facts, eidx)
    peaks = interp_at_index(tabs.peak_depths, eidx)
    a, b = isig.sigma_sq_air_coefs(peaks, True)
    entry_z = bfi.astype(jnp.float32) * jnp.float32(grid.ray_res[2]) + jnp.float32(grid.ray_offset[2])
    es = jnp.sqrt((a * entry_z ** 2 + b * entry_z)[:, None] + jnp.asarray(beam.spot_sigmas) ** 2)
    after = jnp.minimum(first_larger_ordered(wepl_min, 1.05 * peaks),
                        jnp.max(tr.first_outside)).astype(jnp.int32)
    from raytracedicom_tpu.ops import spot_conv
    rw = jax.jit(lambda w: spot_conv.spot_to_ray_weights(
        w, es, grid.ray_dims, st.spot_delta, st.spot_offset,
        (grid.ray_res[0], grid.ray_res[1]), (grid.ray_offset[0], grid.ray_offset[1]),
        jnp.asarray([1.0, 1.0]), 3.0))(jnp.asarray(beam.spot_weights))
    z0 = jnp.clip(bfi, 0, S - W).astype(jnp.int32)
    dens_w = jax.lax.dynamic_slice(tr.density, (z0, 0, 0), (W, nry, nrx))
    csp_w = jax.lax.dynamic_slice(tr.cumul_sp, (z0, 0, 0), (W, nry, nrx))
    geom_w = geom._replace(
        half_vw_sum=jax.lax.dynamic_slice(geom.half_vw_sum, (z0,), (W,)),
        step_vol=jax.lax.dynamic_slice(geom.step_vol, (z0,), (W,)))
    r_rl = dens_w * isig.lut1d_fast(tabs.rrl, dens_w * tabs.rrl_scale)
    layer = isig.LayerScalars(
        eidx[li], scalef[li], peaks[li],
        jnp.clip(after[li] - z0, 0, W).astype(jnp.int32),
        2.0 * a[li] * geom.delta_z * geom.corner_z + b[li] * geom.delta_z,
        a[li] * geom.delta_z ** 2, es[li, 0] ** 2)
    fill = jax.jit(lambda d, c: isig.fill_idd_and_sigma(
        d, c, rw[li], tr.first_inside - z0, tr.first_outside - z0, bfi - z0,
        layer, geom_w, tabs.cidd, tabs.rrl, tabs.rrl_scale,
        r_rl=r_rl, first_step_abs=bfi))(dens_w, csp_w)
    return fill.idd, fill.r_sigma_eff, st.max_radius, st.pad


def marginal_ms(fn, idd, rs, rads, n=20, trials=3):
    """Time an in-jit scan of n applications, with data perturbed per step to
    defeat CSE; returns (total/n) marginal ms."""
    @jax.jit
    def rep(idd, rs, rads):
        def body(acc, k):
            out = fn(idd + 1e-12 * k.astype(idd.dtype), rs, rads)
            return acc + out[0, 0, 0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(n))
        return acc

    float(rep(idd, rs, rads))  # compile
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        float(rep(idd, rs, rads))
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts)) / n


def main():
    idd, rs, max_r, pad = build_fill()
    print(f"shape {idd.shape}, max_r {max_r}, pad {pad}")
    import raytracedicom_tpu.ops.pallas_superposition as ps
    rads = effective_sem_radii(rs, 3.0, max_r)
    orig_pick = ps._pick_chunk

    for cz in (1, 2, 4, 8):
        ps._pick_chunk = lambda *a, cz=cz, **k: cz
        ms = marginal_ms(lambda a, b, r: ps.superpose_pallas_raw(a, b, r, max_r, pad),
                         idd, rs, rads)
        print(f"fwd cz={cz}: {ms:.2f} ms/layer", flush=True)

    # backward kernel
    g = jnp.ones((idd.shape[0], idd.shape[1] + 2 * pad, idd.shape[2] + 2 * pad),
                 jnp.float32)
    for cz in (1, 4, 8):
        ps._pick_chunk = lambda *a, cz=cz, **k: cz
        ms = marginal_ms(lambda a, b, r: ps.superpose_bwd_pallas(a, b, g, r, max_r, pad)[0],
                         idd, rs, rads)
        print(f"bwd cz={cz}: {ms:.2f} ms/layer", flush=True)
    ps._pick_chunk = orig_pick


if __name__ == "__main__":
    main()
